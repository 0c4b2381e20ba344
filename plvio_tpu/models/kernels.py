"""Jitted device kernels for the tracking / mapping pipeline.

Each factory returns a jit-compiled closure with static capacities; the
host state machine (models/tracking.py, models/local_mapping.py) only
gathers index slices and calls these.  This is the split SURVEY §7.0
prescribes: branchy control on host, everything per-feature/per-residual
on device.

Kernels:
* pose_optimizer      — 4x10 IRLS pose-only optimization with chi2 gating
                        (reference: Optimizer::PoseOptimization,
                        src/Optimizer.cc:2399, incl. WithLine variant :2736)
* projection_matcher  — project local map points, window+scale gate,
                        Hamming-matmul NN (reference:
                        ORBmatcher::SearchByProjection, src/ORBmatcher.cc:44)
* epipolar_matcher    — descriptor matching gated by the epipolar line
                        (reference: SearchForTriangulation,
                        src/ORBmatcher.cc:1399)
* triangulator        — batched DLT between two keyframes with
                        depth/parallax/reprojection checks (reference:
                        LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:724)
* local_ba            — windowed BA over poses + Schur-eliminated points
                        (+ optional line endpoints) (reference:
                        LocalBundleAdjustment(withLine), src/Optimizer.cc:4851/:4385)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import matching as M
from ..ops import twoview as TV
from ..solver import engine as E
from ..solver import residuals as RES
from ..solver.residuals import PinholeK
from ..utils import lie

CHI2_MONO = 5.991


class TrackResult(NamedTuple):
    pose: jnp.ndarray        # [3,4] refined T_cw
    feat_pt: jnp.ndarray     # [F] map-point slot per feature (-1 none)
    pt_feat: jnp.ndarray     # [P] feature idx per local point (-1)
    inlier: jnp.ndarray      # [P] bool: matched AND survived chi2
    n_matched: jnp.ndarray   # int32
    n_inliers: jnp.ndarray   # int32


def make_pose_optimizer(K: PinholeK, cap: int, rounds: int = 4,
                        iters: int = 10):
    """Pose-only IRLS: (pose0, uv [cap,2], X [cap,3], valid, inv_sigma2)
    -> (pose, inlier_mask, n_inliers)."""

    @jax.jit
    def run(pose0, uv, X, valid, inv_sigma2):
        mask = valid
        states = {"pose": pose0[None]}
        chi2 = jnp.zeros(cap, jnp.float32)
        for _ in range(rounds):
            prob = E.Problem()
            prob.add_dense("pose", 1, 6, RES.retract_pose_cw)
            prob.add_term(E.Term(
                name="reproj", res_fn=RES.make_point_reproj_fixed(K), rdim=2,
                dense_refs=[("pose", jnp.zeros(cap, jnp.int32))],
                const={"uv": uv, "X": X}, mask=mask, info=inv_sigma2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(prob, states, iters=iters)
            chi2 = chi2s["reproj"]
            mask = valid & (chi2 < CHI2_MONO)
        return states["pose"][0], mask, jnp.sum(mask)

    return run


def make_pose_optimizer_pl(K: PinholeK, cap_pt: int, cap_ln: int,
                           rounds: int = 4, iters: int = 10,
                           chi2_line: float = CHI2_MONO):
    """Point+line pose-only IRLS (reference PoseOptimizationWithLine,
    src/Optimizer.cc:2736): adds per-line endpoint-to-line residuals.

    (pose0, uv, X, valid_pt, is2_pt, l_obs [cap_ln,3], Xs, Xe, valid_ln,
     is2_ln) -> (pose, inlier_pt, inlier_ln, n_inliers)."""

    @jax.jit
    def run(pose0, uv, X, valid_pt, is2_pt, l_obs, Xs, Xe, valid_ln, is2_ln):
        mask_p = valid_pt
        mask_l = valid_ln
        states = {"pose": pose0[None]}
        for _ in range(rounds):
            prob = E.Problem()
            prob.add_dense("pose", 1, 6, RES.retract_pose_cw)
            prob.add_term(E.Term(
                name="reproj", res_fn=RES.make_point_reproj_fixed(K), rdim=2,
                dense_refs=[("pose", jnp.zeros(cap_pt, jnp.int32))],
                const={"uv": uv, "X": X}, mask=mask_p, info=is2_pt,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            prob.add_term(E.Term(
                name="line", res_fn=RES.make_line_reproj_fixed(K), rdim=2,
                dense_refs=[("pose", jnp.zeros(cap_ln, jnp.int32))],
                const={"l": l_obs, "Xs": Xs, "Xe": Xe}, mask=mask_l,
                info=is2_ln, robust_delta=float(np.sqrt(chi2_line))))
            states, _, chi2s = E.optimize(prob, states, iters=iters)
            mask_p = valid_pt & (chi2s["reproj"] < CHI2_MONO)
            mask_l = valid_ln & (chi2s["line"] < chi2_line)
        return states["pose"][0], mask_p, mask_l, jnp.sum(mask_p) + jnp.sum(mask_l)

    return run


def make_projection_matcher(K: PinholeK, n_feat: int, cap_pts: int):
    """Project map points into the frame under a predicted pose and match
    to features by windowed Hamming NN.

    (pose [3,4], pt_xyz [P,3], pt_desc [P,8]u32, pt_valid, feat_uv [F,2],
     feat_desc [F,8]u32, feat_octave [F], feat_valid, radius)
    -> (uv_matched [P,2], pt_feat [P], matched [P] bool, feat_pt [F])
    """

    @jax.jit
    def run(pose, pt_xyz, pt_desc, pt_valid, feat_uv, feat_desc,
            feat_octave, feat_valid, radius):
        R, t = pose[:, :3], pose[:, 3]
        pc = (R @ pt_xyz.T).T + t
        z = pc[:, 2]
        uv_proj = jnp.stack([K.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + K.cx,
                             K.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + K.cy], -1)
        in_img = (z > 0.05) & (uv_proj[:, 0] >= 0) & (uv_proj[:, 0] < 2 * K.cx) \
            & (uv_proj[:, 1] >= 0) & (uv_proj[:, 1] < 2 * K.cy)
        proj_ok = pt_valid & in_img

        d_pt = M.unpack_u32_to_pm1(pt_desc)
        d_ft = M.unpack_u32_to_pm1(feat_desc)
        dist = M.hamming_matrix(d_pt, d_ft)
        # window scaled by feature octave (coarser levels -> wider window,
        # reference: radius *= mvScaleFactors[nPredictedLevel])
        scale = 1.2 ** feat_octave.astype(jnp.float32)
        d2 = jnp.sum((uv_proj[:, None, :] - feat_uv[None, :, :]) ** 2, -1)
        gate = d2 <= (radius * scale[None, :]) ** 2
        idx, ok = M.match_nn_ratio(dist, proj_ok, feat_valid, gate,
                                   max_dist=80.0, ratio=0.9, mutual=True)
        uv_m = feat_uv[idx]
        # per-feature back map
        feat_pt = jnp.full((n_feat,), -1, jnp.int32)
        safe_idx = jnp.where(ok, idx, 0)
        feat_pt = feat_pt.at[safe_idx].set(
            jnp.where(ok, jnp.arange(cap_pts, dtype=jnp.int32), -1), mode="drop")
        return uv_m, idx.astype(jnp.int32), ok, feat_pt

    return run


def make_epipolar_matcher(K: PinholeK, n_feat: int):
    """Match unmatched features between two KFs gated by the epipolar
    constraint from their relative pose.

    (pose1, pose2, uv1 [F,2], d1 [F,8], ok1, uv2 [F,2], d2 [F,8], ok2)
    -> (idx2 [F], ok [F])  matches feature i in KF1 -> idx2[i] in KF2.
    """
    Km = jnp.array([[K.fx, 0, K.cx], [0, K.fy, K.cy], [0, 0, 1.0]], jnp.float32)
    Kinv = jnp.linalg.inv(Km)

    @jax.jit
    def run(pose1, pose2, uv1, d1, ok1, uv2, d2, ok2, th_epi=2.0):
        R1, t1 = pose1[:, :3], pose1[:, 3]
        R2, t2 = pose2[:, :3], pose2[:, 3]
        # relative: T_21 = T2 * T1^{-1}
        R21 = R2 @ R1.T
        t21 = t2 - R21 @ t1
        E_ = lie.hat(t21) @ R21
        F_ = Kinv.T @ E_ @ Kinv
        x1 = jnp.concatenate([uv1, jnp.ones((n_feat, 1))], -1)
        x2 = jnp.concatenate([uv2, jnp.ones((n_feat, 1))], -1)
        lines2 = x1 @ F_.T                       # [F,3] epi line of uv1 in img2
        num = jnp.abs(jnp.einsum("ik,jk->ij", lines2, x2))
        den = jnp.sqrt(lines2[:, 0] ** 2 + lines2[:, 1] ** 2)[:, None]
        d_epi = num / jnp.maximum(den, 1e-9)
        gate = d_epi < th_epi
        dist = M.hamming_matrix(M.unpack_u32_to_pm1(d1), M.unpack_u32_to_pm1(d2))
        idx, ok = M.match_nn_ratio(dist, ok1, ok2, gate, max_dist=60.0,
                                   ratio=0.8, mutual=True)
        return idx.astype(jnp.int32), ok

    return run


def make_triangulator(K: PinholeK, cap: int):
    """Triangulate matched feature pairs between two KFs.

    (pose1, pose2, uv1 [cap,2], uv2 [cap,2], valid)
    -> (X_world [cap,3], good [cap])
    """

    @jax.jit
    def run(pose1, pose2, uv1, uv2, valid, min_parallax_cos=0.99995,
            max_reproj_err=5.991):
        R1, t1 = pose1[:, :3], pose1[:, 3]
        R2, t2 = pose2[:, :3], pose2[:, 3]
        R21 = R2 @ R1.T
        t21 = t2 - R21 @ t1
        x1n = jnp.stack([(uv1[:, 0] - K.cx) / K.fx, (uv1[:, 1] - K.cy) / K.fy], -1)
        x2n = jnp.stack([(uv2[:, 0] - K.cx) / K.fx, (uv2[:, 1] - K.cy) / K.fy], -1)
        X1 = TV.triangulate_dlt(R21, t21, x1n, x2n)   # in KF1 camera frame
        z1 = X1[:, 2]
        X2 = (R21 @ X1.T).T + t21
        z2 = X2[:, 2]
        # parallax
        C2_in1 = -R21.T @ t21
        r1 = X1 / jnp.maximum(jnp.linalg.norm(X1, axis=-1, keepdims=True), 1e-9)
        d2v = X1 - C2_in1
        r2 = d2v / jnp.maximum(jnp.linalg.norm(d2v, axis=-1, keepdims=True), 1e-9)
        cosp = jnp.sum(r1 * r2, -1)
        e1 = jnp.sum((jnp.stack([K.fx * X1[:, 0] / jnp.maximum(z1, 1e-9) + K.cx,
                                 K.fy * X1[:, 1] / jnp.maximum(z1, 1e-9) + K.cy],
                                -1) - uv1) ** 2, -1)
        e2 = jnp.sum((jnp.stack([K.fx * X2[:, 0] / jnp.maximum(z2, 1e-9) + K.cx,
                                 K.fy * X2[:, 1] / jnp.maximum(z2, 1e-9) + K.cy],
                                -1) - uv2) ** 2, -1)
        good = valid & (z1 > 0.02) & (z2 > 0.02) & (cosp < min_parallax_cos) \
            & (e1 < max_reproj_err) & (e2 < max_reproj_err) \
            & jnp.all(jnp.isfinite(X1), -1)
        # to world: X_w = R1^T (X1 - t1)
        Xw = (R1.T @ (X1 - t1).T).T
        return Xw, good

    return run


def make_local_ba(K: PinholeK, n_kf: int, n_pt: int, n_obs: int,
                  rounds: int = 2, iters: int = 8):
    """Windowed local BA (reference LocalBundleAdjustment,
    src/Optimizer.cc:4851): optimizable + fixed KFs, Schur-eliminated
    points, two rounds with chi2 re-gating between them.

    (kf_poses [n_kf,3,4], kf_free [n_kf] bool, pt_xyz [n_pt,3],
     pt_free [n_pt], obs_kf [n_obs], obs_pt [n_obs], obs_uv [n_obs,2],
     obs_valid [n_obs], obs_is2 [n_obs])
    -> (kf_poses, pt_xyz, obs_inlier)
    """

    @jax.jit
    def run(kf_poses, kf_free, pt_xyz, pt_free, obs_kf, obs_pt, obs_uv,
            obs_valid, obs_is2):
        states = {"pose": kf_poses, "pt": pt_xyz}
        mask = obs_valid
        for _ in range(rounds):
            prob = E.Problem()
            prob.add_dense("pose", n_kf, 6, RES.retract_pose_cw)
            prob.add_landmarks("pt", n_pt, 3, RES.retract_additive)
            prob.add_term(E.Term(
                name="reproj", res_fn=RES.make_point_reproj(K), rdim=2,
                dense_refs=[("pose", obs_kf)], lm_ref=("pt", obs_pt),
                const={"uv": obs_uv}, mask=mask, info=obs_is2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(
                prob, states, iters=iters,
                dense_free_mask={"pose": kf_free},
                lm_free_mask={"pt": pt_free})
            mask = obs_valid & (chi2s["reproj"] < CHI2_MONO)
        return states["pose"], states["pt"], mask

    return run
