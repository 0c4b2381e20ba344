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
CHI2_STEREO = 7.815           # 3-DoF 95% gate (reference chi2 7.815)


class TrackResult(NamedTuple):
    pose: jnp.ndarray        # [3,4] refined T_cw
    feat_pt: jnp.ndarray     # [F] map-point slot per feature (-1 none)
    pt_feat: jnp.ndarray     # [P] feature idx per local point (-1)
    inlier: jnp.ndarray      # [P] bool: matched AND survived chi2
    n_matched: jnp.ndarray   # int32
    n_inliers: jnp.ndarray   # int32



def solve_spd_cg(H: jnp.ndarray, g: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Solve H x = g for small SPD H with fixed-iteration conjugate
    gradients — pure arithmetic, exact for 6x6 within <=6 Krylov steps.

    Used instead of cho_solve inside fori_loop bodies: LAPACK-style
    factorizations in device loops compile pathologically (20+ min /
    miscompile) on the experimental axon TPU backend, while CG is plain
    VPU math everywhere.
    """
    x = jnp.zeros_like(g)
    r = g
    pvec = r
    rs = jnp.dot(r, r)

    def body(_, carry):
        x, r, pvec, rs = carry
        Hp = H @ pvec
        alpha = rs / jnp.maximum(jnp.dot(pvec, Hp), 1e-20)
        x = x + alpha * pvec
        r = r - alpha * Hp
        rs_new = jnp.dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        pvec = r + beta * pvec
        return x, r, pvec, rs_new

    def scan_body(carry, _):
        return body(0, carry), None

    (x, _, _, _), _ = jax.lax.scan(scan_body, (x, r, pvec, rs),
                                   None, length=iters)
    return x

def make_pose_optimizer(K: PinholeK, cap: int, rounds: int = 4,
                        iters: int = 3):
    """Pose-only IRLS with closed-form Jacobians, fully fused.

    This is THE per-frame hot call (reference PoseOptimization,
    src/Optimizer.cc:2399, 4 rounds of g2o LM with chi2 re-gating), so it
    is hand-rolled instead of going through the generic engine: one
    fori_loop of GN steps — residual, analytic [2,6] Jacobian, 6x6
    normal equations, Cholesky, retract — with Huber IRLS weights every
    iteration and chi2 outlier re-gating between rounds.  ~15 XLA ops per
    iteration vs hundreds for the generic engine (37 ms -> ~1 ms on TPU).

    (pose0 [3,4], uv [cap,2], X [cap,3], valid, inv_sigma2)
    -> (pose, inlier_mask, n_inliers)
    """
    @jax.jit
    def run(pose0, uv, X, valid, inv_sigma2):
        return fast_pose_opt(K, pose0, uv, X, valid, inv_sigma2,
                             rounds, iters)

    return run


def fast_pose_opt(K: PinholeK, pose0, uv, X, valid, inv_sigma2,
                  rounds: int = 4, iters: int = 3):
    """Traceable core of the fused pose-only IRLS (see make_pose_optimizer).
    Returns (pose [3,4], inlier [N], n_inliers)."""
    delta = float(np.sqrt(CHI2_MONO))
    total_iters = rounds * iters

    def compute_chi2(Rt):
        R, t = Rt[:, :3], Rt[:, 3]
        pc = X @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-4)
        pred = jnp.stack([K.fx * pc[:, 0] / z + K.cx,
                          K.fy * pc[:, 1] / z + K.cy], -1)
        r = pred - uv
        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        return r, pc, chi2

    def body(i, carry):
        Rt, gate = carry
        r, pc, chi2 = compute_chi2(Rt)
        # re-gate at round boundaries (fixed schedule, branchless).
        # NOTE: gate is carried as float32 — a bool array in a fori_loop
        # carry miscompiles on the experimental axon TPU backend (the
        # loop silently returns its initial carry).
        round_start = ((i % iters) == 0) & (i > 0)
        fresh = (valid & (chi2 < CHI2_MONO)).astype(jnp.float32)
        new_gate = jnp.where(round_start, fresh, gate)
        w_h = jnp.minimum(1.0, delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
        w = new_gate * (pc[:, 2] > 0.05).astype(jnp.float32) \
            * w_h * inv_sigma2
        z = jnp.maximum(pc[:, 2], 1e-4)
        inv_z = 1.0 / z
        x_, y_ = pc[:, 0], pc[:, 1]
        zero = jnp.zeros_like(z)
        ju = jnp.stack([K.fx * inv_z, zero, -K.fx * x_ * inv_z ** 2], -1)
        jv = jnp.stack([zero, K.fy * inv_z, -K.fy * y_ * inv_z ** 2], -1)
        Jp = jnp.stack([ju, jv], 1)                  # [N,2,3]
        # left-mult se3: dpc = drho - hat(pc) dphi
        hx = jnp.stack([
            jnp.stack([zero, -pc[:, 2], pc[:, 1]], -1),
            jnp.stack([pc[:, 2], zero, -pc[:, 0]], -1),
            jnp.stack([-pc[:, 1], pc[:, 0], zero], -1)], 1)  # [N,3,3]
        Jphi = -jnp.einsum("nij,njk->nik", Jp, hx)
        J = jnp.concatenate([Jp, Jphi], -1)          # [N,2,6]
        Jw = J * w[:, None, None]
        H = jnp.einsum("ndi,ndj->ij", Jw, J)
        g = jnp.einsum("ndi,nd->i", Jw, r)
        H = H + jnp.diag(jnp.diagonal(H)) * 1e-3 + jnp.eye(6) * 1e-6
        dx = -solve_spd_cg(H, g)
        Rn, tn = lie.se3_exp(dx)
        R_new = lie.so3_normalize(Rn @ Rt[:, :3])
        t_new = Rn @ Rt[:, 3] + tn
        return jnp.concatenate([R_new, t_new[:, None]], 1), new_gate

    # lax.scan, NOT fori_loop: fori_loop miscompiles this body on the
    # experimental axon TPU backend (loop returns wrong/initial state for
    # some shapes); scan lowers correctly and costs the same.
    def scan_body(carry, i):
        return body(i, carry), None

    (Rt, gate), _ = jax.lax.scan(
        scan_body, (pose0, valid.astype(jnp.float32)),
        jnp.arange(total_iters))
    _, _, chi2 = compute_chi2(Rt)
    inlier = valid & (chi2 < CHI2_MONO)
    return Rt, inlier, jnp.sum(inlier)


def fast_pose_opt_pl(K: PinholeK, pose0, uv, X, valid, inv_sigma2,
                     l_obs, Xs, Xe, valid_l, is2_l,
                     rounds: int = 4, iters: int = 3,
                     w_line: float = 1.0, ur=None, bf: float = 0.0):
    """Fused point+line pose-only IRLS with closed-form Jacobians
    (reference PoseOptimizationWithLine, src/Optimizer.cc:2736: point
    reprojection edges + per-line two endpoint-to-line residuals).

    l_obs: [L,3] observed normalized line equations; Xs/Xe: [L,3] map-line
    3D endpoints.  When `ur` [N] is given (stereo/RGB-D, bf > 0), points
    with ur > 0 gain the third stereo residual u_R = u - bf/z (reference
    EdgeStereoSE3ProjectXYZOnlyPose alongside the line edges in
    PoseOptimizationWithLine's stereo branch, src/Optimizer.cc:2736ff);
    ur <= 0 stays mono.  Returns (pose, inlier_pt, inlier_ln, n_inliers).
    """
    delta = float(np.sqrt(CHI2_MONO))
    total_iters = rounds * iters
    stereo = ur is not None
    if stereo:
        has_r = (ur > 0).astype(jnp.float32)
        chi2_pt_th = jnp.where(ur > 0, CHI2_STEREO, CHI2_MONO)
    else:
        chi2_pt_th = CHI2_MONO

    def point_part(Rt):
        R, t = Rt[:, :3], Rt[:, 3]
        pc = X @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-4)
        u_p = K.fx * pc[:, 0] / z + K.cx
        v_p = K.fy * pc[:, 1] / z + K.cy
        if stereo:
            r = jnp.stack([u_p - uv[:, 0], v_p - uv[:, 1],
                           (u_p - bf / z - ur) * has_r], -1)
        else:
            r = jnp.stack([u_p - uv[:, 0], v_p - uv[:, 1]], -1)
        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        return r, pc, chi2

    def line_endpoint(Rt, Xep):
        """Residual + [N,6] Jacobian of l . pi(R Xep + t)."""
        R, t = Rt[:, :3], Rt[:, 3]
        pc = Xep @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-4)
        u = K.fx * pc[:, 0] / z + K.cx
        v = K.fy * pc[:, 1] / z + K.cy
        r = l_obs[:, 0] * u + l_obs[:, 1] * v + l_obs[:, 2]
        inv_z = 1.0 / z
        zero = jnp.zeros_like(z)
        ju = jnp.stack([K.fx * inv_z, zero, -K.fx * pc[:, 0] * inv_z ** 2], -1)
        jv = jnp.stack([zero, K.fy * inv_z, -K.fy * pc[:, 1] * inv_z ** 2], -1)
        jp = l_obs[:, 0:1] * ju + l_obs[:, 1:2] * jv          # [L,3]
        hx = jnp.stack([
            jnp.stack([zero, -pc[:, 2], pc[:, 1]], -1),
            jnp.stack([pc[:, 2], zero, -pc[:, 0]], -1),
            jnp.stack([-pc[:, 1], pc[:, 0], zero], -1)], 1)
        jphi = -jnp.einsum("ni,nik->nk", jp, hx)
        J = jnp.concatenate([jp, jphi], -1)                    # [L,6]
        return r, J, pc[:, 2]

    def line_chi2(Rt):
        rs, _, zs = line_endpoint(Rt, Xs)
        re, _, ze = line_endpoint(Rt, Xe)
        chi2 = (rs * rs + re * re) * is2_l
        return chi2, (zs > 0.05) & (ze > 0.05)

    def body(i, carry):
        Rt, gate_p, gate_l = carry
        r, pc, chi2 = point_part(Rt)
        chi2_l, depth_ok = line_chi2(Rt)
        # float gates in the carry (see fast_pose_opt: bool carries
        # miscompile on axon)
        round_start = ((i % iters) == 0) & (i > 0)
        new_gate_p = jnp.where(round_start,
                               (valid & (chi2 < chi2_pt_th)).astype(jnp.float32),
                               gate_p)
        new_gate_l = jnp.where(round_start,
                               (valid_l & (chi2_l < CHI2_MONO)).astype(jnp.float32),
                               gate_l)
        # points
        w_h = jnp.minimum(1.0, delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
        w = new_gate_p * (pc[:, 2] > 0.05).astype(jnp.float32) * w_h * inv_sigma2
        z = jnp.maximum(pc[:, 2], 1e-4)
        inv_z = 1.0 / z
        zero = jnp.zeros_like(z)
        ju = jnp.stack([K.fx * inv_z, zero, -K.fx * pc[:, 0] * inv_z ** 2], -1)
        jv = jnp.stack([zero, K.fy * inv_z, -K.fy * pc[:, 1] * inv_z ** 2], -1)
        if stereo:
            # d(u - bf/z)/dpc = ju + bf/z^2 * e_z, masked to stereo rows
            jur = jnp.stack([K.fx * inv_z, zero,
                             (-K.fx * pc[:, 0] + bf) * inv_z ** 2], -1) \
                * has_r[:, None]
            Jp = jnp.stack([ju, jv, jur], 1)
        else:
            Jp = jnp.stack([ju, jv], 1)
        hx = jnp.stack([
            jnp.stack([zero, -pc[:, 2], pc[:, 1]], -1),
            jnp.stack([pc[:, 2], zero, -pc[:, 0]], -1),
            jnp.stack([-pc[:, 1], pc[:, 0], zero], -1)], 1)
        Jphi = -jnp.einsum("nij,njk->nik", Jp, hx)
        J = jnp.concatenate([Jp, Jphi], -1)
        Jw = J * w[:, None, None]
        H = jnp.einsum("ndi,ndj->ij", Jw, J)
        g = jnp.einsum("ndi,nd->i", Jw, r)
        # lines (both endpoints)
        wl_h = jnp.minimum(1.0, delta / jnp.sqrt(jnp.maximum(chi2_l, 1e-12)))
        wl = new_gate_l * depth_ok.astype(jnp.float32) * wl_h * is2_l * w_line
        for Xep in (Xs, Xe):
            rl, Jl, _ = line_endpoint(Rt, Xep)
            Jlw = Jl * wl[:, None]
            H = H + jnp.einsum("ni,nj->ij", Jlw, Jl)
            g = g + jnp.einsum("ni,n->i", Jlw, rl)
        H = H + jnp.diag(jnp.diagonal(H)) * 1e-3 + jnp.eye(6) * 1e-6
        dx = -solve_spd_cg(H, g)
        Rn, tn = lie.se3_exp(dx)
        R_new = lie.so3_normalize(Rn @ Rt[:, :3])
        t_new = Rn @ Rt[:, 3] + tn
        return (jnp.concatenate([R_new, t_new[:, None]], 1),
                new_gate_p, new_gate_l)

    def scan_body(carry, i):
        return body(i, carry), None

    (Rt, gp, gl), _ = jax.lax.scan(
        scan_body,
        (pose0, valid.astype(jnp.float32), valid_l.astype(jnp.float32)),
        jnp.arange(total_iters))
    _, _, chi2 = point_part(Rt)
    chi2_l, _ = line_chi2(Rt)
    inl_p = valid & (chi2 < chi2_pt_th)
    inl_l = valid_l & (chi2_l < CHI2_MONO)
    return Rt, inl_p, inl_l, jnp.sum(inl_p) + jnp.sum(inl_l)


def make_fast_pose_optimizer_pl(K: PinholeK, cap_pt: int, cap_ln: int,
                                rounds: int = 4, iters: int = 3,
                                bf: float = 0.0):
    """bf > 0 builds the stereo/RGB-D variant: run() gains a trailing
    `ur` [cap_pt] argument (u_right; <= 0 marks mono points)."""
    if bf > 0:
        @jax.jit
        def run(pose0, uv, X, valid, is2, l_obs, Xs, Xe, valid_l, is2_l,
                ur):
            return fast_pose_opt_pl(K, pose0, uv, X, valid, is2,
                                    l_obs, Xs, Xe, valid_l, is2_l,
                                    rounds, iters, ur=ur, bf=bf)
        return run

    @jax.jit
    def run(pose0, uv, X, valid, is2, l_obs, Xs, Xe, valid_l, is2_l):
        return fast_pose_opt_pl(K, pose0, uv, X, valid, is2,
                                l_obs, Xs, Xe, valid_l, is2_l,
                                rounds, iters)
    return run


def make_line_projection_matcher(K: PinholeK, n_line_feat: int, cap_ln: int):
    """Project map-line endpoints into the frame, gate candidate observed
    segments by midpoint distance + angle, NN on LBD descriptors
    (reference LineMatcher::SearchByProjection src/LineMatcher.cpp:274 +
    the angle/position gates of Tracking src/Tracking.cc:3988-4061).

    (pose [3,4], ln_ep [cap,6], ln_desc [cap,8]u32, ln_valid,
     obs_ep [F,4], obs_desc [F,8]u32, obs_angle [F], obs_valid, radius)
    -> (ln_feat [cap], matched [cap], l_obs_eq [cap,3])
    """

    @jax.jit
    def run(pose, ln_ep, ln_desc, ln_valid, obs_ep, obs_desc, obs_angle,
            obs_valid, obs_lineq, radius=40.0, angle_tol=0.25):
        return line_proj_match_core(K, pose, ln_ep, ln_desc, ln_valid,
                                    obs_ep, obs_desc, obs_angle,
                                    obs_valid, obs_lineq, radius, angle_tol)

    return run


def line_proj_match_core(K: PinholeK, pose, ln_ep, ln_desc, ln_valid,
                         obs_ep, obs_desc, obs_angle, obs_valid,
                         obs_lineq, radius=40.0, angle_tol=0.25):
    """Traceable body of the line projection matcher (shared by the
    jitted factory and fused pipelines like the bench step)."""
    R, t = pose[:, :3], pose[:, 3]
    Xs = ln_ep[:, :3]
    Xe = ln_ep[:, 3:]
    pcs = Xs @ R.T + t
    pce = Xe @ R.T + t
    zok = (pcs[:, 2] > 0.05) & (pce[:, 2] > 0.05)

    def proj(pc):
        z = jnp.maximum(pc[:, 2], 1e-4)
        return jnp.stack([K.fx * pc[:, 0] / z + K.cx,
                          K.fy * pc[:, 1] / z + K.cy], -1)

    us = proj(pcs)
    ue = proj(pce)
    mid_pred = (us + ue) / 2
    ang_pred = jnp.arctan2(ue[:, 1] - us[:, 1], ue[:, 0] - us[:, 0]) % jnp.pi
    mid_obs = (obs_ep[:, :2] + obs_ep[:, 2:]) / 2
    d2 = jnp.sum((mid_pred[:, None] - mid_obs[None, :]) ** 2, -1)
    dang = jnp.abs(ang_pred[:, None] - obs_angle[None, :]) % jnp.pi
    dang = jnp.minimum(dang, jnp.pi - dang)
    gate = (d2 < radius ** 2) & (dang < angle_tol)
    dist = M.hamming_matrix(M.unpack_u32_to_pm1(ln_desc),
                            M.unpack_u32_to_pm1(obs_desc))
    idx, ok = M.match_nn_ratio(dist, ln_valid & zok, obs_valid, gate,
                               max_dist=110.0, ratio=0.95, mutual=True)
    l_eq = obs_lineq[idx]
    return idx.astype(jnp.int32), ok, l_eq


def make_line_triangulator(K: PinholeK, cap: int):
    """Triangulate matched segments between two KFs by interpretation-
    plane intersection: endpoint rays of the segment in KF1 intersected
    with the plane of the matched segment in KF2 (reference
    LocalMapping::CreateNewMapLines endpoint back-projection,
    src/LocalMapping.cc:1157-1280).

    (pose1, pose2, ep1 [cap,4], ep2 [cap,4], valid)
    -> (Xs_w [cap,3], Xe_w [cap,3], good [cap])
    """

    @jax.jit
    def run(pose1, pose2, ep1, ep2, valid, max_depth=40.0):
        R1, t1 = pose1[:, :3], pose1[:, 3]
        R2, t2 = pose2[:, :3], pose2[:, 3]
        C1 = -R1.T @ t1
        C2 = -R2.T @ t2

        def rays_w(Rc, uv):
            xn = jnp.stack([(uv[:, 0] - K.cx) / K.fx,
                            (uv[:, 1] - K.cy) / K.fy,
                            jnp.ones(uv.shape[0])], -1)
            return xn @ Rc  # R^T @ xn per row

        def plane_n(Rc, ep):
            rs = jnp.stack([(ep[:, 0] - K.cx) / K.fx,
                            (ep[:, 1] - K.cy) / K.fy,
                            jnp.ones(cap)], -1)
            re = jnp.stack([(ep[:, 2] - K.cx) / K.fx,
                            (ep[:, 3] - K.cy) / K.fy,
                            jnp.ones(cap)], -1)
            return jnp.cross(rs, re) @ Rc  # world normal, plane through C

        def intersect(C_from, d, n_w, C_on):
            denom = jnp.sum(n_w * d, -1)
            tt = jnp.sum(n_w * (C_on - C_from), -1) / \
                jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
            return C_from + tt[:, None] * d

        # direction A: endpoint rays of view 1 hit the plane of segment 2
        n2_w = plane_n(R2, ep2)
        XsA = intersect(C1, rays_w(R1, ep1[:, :2]), n2_w, C2)
        XeA = intersect(C1, rays_w(R1, ep1[:, 2:]), n2_w, C2)
        # direction B: endpoint rays of view 2 hit the plane of segment 1
        n1_w = plane_n(R1, ep1)
        XsB = intersect(C2, rays_w(R2, ep2[:, :2]), n1_w, C1)
        XeB = intersect(C2, rays_w(R2, ep2[:, 2:]), n1_w, C1)

        def depth_in(Rc, tc, Xw):
            return (Xw @ Rc.T + tc)[:, 2]

        def z_ok(Xw):
            za = depth_in(R1, t1, Xw)
            zb = depth_in(R2, t2, Xw)
            return (za > 0.05) & (zb > 0.05) & (za < max_depth) \
                & (zb < max_depth)

        good = valid & z_ok(XsA) & z_ok(XeA) & z_ok(XsB) & z_ok(XeB)
        for Xw in (XsA, XeA, XsB, XeB):
            good = good & jnp.all(jnp.isfinite(Xw), -1)

        # conditioning: the two interpretation planes must not be
        # near-parallel — their intersection (the 3D line) is unstable
        # below ~1 deg (the line analog of the point parallax gate,
        # reference CreateNewMapPoints cosParallaxRays check)
        n1_hat = n1_w / jnp.maximum(
            jnp.linalg.norm(n1_w, axis=-1, keepdims=True), 1e-9)
        n2_hat = n2_w / jnp.maximum(
            jnp.linalg.norm(n2_w, axis=-1, keepdims=True), 1e-9)
        cos_planes = jnp.abs(jnp.sum(n1_hat * n2_hat, -1))
        good = good & (cos_planes < 0.99995)   # > ~0.57 deg apart

        # the two independent reconstructions must agree on the same 3D
        # infinite line (replaces a raw plane/ray-angle degeneracy gate,
        # which scales with baseline/depth and rejects valid small-
        # baseline pairs; ill-conditioned or mismatched pairs disagree)
        uA = XeA - XsA
        uA = uA / jnp.maximum(jnp.linalg.norm(uA, axis=-1, keepdims=True), 1e-9)
        uB = XeB - XsB
        uB = uB / jnp.maximum(jnp.linalg.norm(uB, axis=-1, keepdims=True), 1e-9)
        good = good & (jnp.abs(jnp.sum(uA * uB, -1)) > 0.996)   # < ~5 deg

        def perp_to_A(X):
            v = X - XsA
            along = jnp.sum(v * uA, -1, keepdims=True) * uA
            return jnp.linalg.norm(v - along, axis=-1)

        depth_scale = jnp.maximum(depth_in(R1, t1, (XsA + XeA) / 2), 0.1)
        tol = 0.02 * depth_scale
        good = good & (perp_to_A(XsB) < tol) & (perp_to_A(XeB) < tol)

        # 3D length sanity
        seg_len = jnp.linalg.norm(XeA - XsA, axis=-1)
        good = good & (seg_len > 0.05) & (seg_len < 20.0)
        return XsA, XeA, good

    return run


def make_pose_graph_optimizer(n_kf: int, n_edges: int, iters: int = 15,
                              four_dof: bool = False):
    """Essential-graph Sim3 optimization (reference
    Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:6952): per-KF
    Sim3 states S_iw, edges measuring relative similarities (spanning
    tree + covisibility + loop edges), loop-side and fixed KFs held.
    With `four_dof=True` vertex updates are restricted to world
    translation + yaw with scale pinned — the inertial pose graph
    (reference OptimizeEssentialGraph4DoF, src/Optimizer.cc:14411),
    since gravity observability pins roll/pitch and IMU init pins scale.

    run(sim3_states [n_kf,13], kf_free [n_kf], edge_i [n_edges],
        edge_j [n_edges], edge_Rji [n_edges,3,3], edge_tji [n_edges,3],
        edge_sji [n_edges], edge_valid [n_edges], edge_info [n_edges])
    -> sim3_states
    """
    retract = RES.retract_sim3_4dof if four_dof else RES.retract_sim3
    edge_fn = RES.sim3_edge_4dof if four_dof else RES.sim3_edge

    @jax.jit
    def run(states13, kf_free, edge_i, edge_j, Rji, tji, sji,
            edge_valid, edge_info):
        prob = E.Problem()
        prob.add_dense("sim3", n_kf, 7, retract)
        prob.add_term(E.Term(
            name="sim3", res_fn=edge_fn, rdim=7,
            dense_refs=[("sim3", edge_i), ("sim3", edge_j)],
            const={"Rji": Rji, "tji": tji, "sji": sji},
            mask=edge_valid, info=edge_info))
        out, _, _ = E.optimize(prob, {"sim3": states13}, iters=iters,
                               dense_free_mask={"sim3": kf_free})
        return out["sim3"]

    return run


def make_sim3_reproj_optimizer(K: PinholeK, cap: int, rounds: int = 3,
                               iters: int = 8, fix_scale: bool = False):
    """Reprojection-based refinement of a welding similarity (reference
    Optimizer::OptimizeSim3, src/Optimizer.cc:8462): the Sim3 S (world of
    the current map -> world of the loop side, X2 ~ s R X1 + t) is
    optimized on 2D reprojection residuals in BOTH images with chi2
    gating — stronger than 3D-3D alignment when the geometry on one side
    is poorly triangulated (the 2D observation is always exact).

    Forward edges: current-side points X1 projected into the loop-side
    keyframe under T_cand . S.  Backward edges: loop-side points X2
    projected into the current keyframe under T_kf . S^{-1} (reference
    builds EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ pairs).

    run(S13 [13] (R9, t3, s), X1 [cap,3], uv2 [cap,2], valid_f,
        is2_f [cap], X2 [cap,3], uv1 [cap,2], valid_b, is2_b [cap],
        pose_kf [3,4], pose_cand [3,4])
      -> (S13, inlier_f, inlier_b, n_inliers)
    """
    CHI2_SIM3 = 9.21      # reference th2=10 on huber'd edges; 2-DoF 99%
    dof_mask = np.ones(7, np.float32)
    if fix_scale:
        dof_mask[6] = 0.0
    dmask = jnp.asarray(dof_mask)

    def retract(S, d):
        return RES.retract_sim3(S, d * dmask[None])

    def fwd(blocks, deltas, const):
        (S,) = blocks
        (d,) = deltas
        Rw, tw, sw = RES.retract_sim3_single(S, d * dmask)
        X2p = sw * (Rw @ const["X"]) + tw
        pc = const["P"][:, :3] @ X2p + const["P"][:, 3]
        return _project_pinhole(pc) - const["uv"]

    def bwd(blocks, deltas, const):
        (S,) = blocks
        (d,) = deltas
        Rw, tw, sw = RES.retract_sim3_single(S, d * dmask)
        X1p = (Rw.T @ (const["X"] - tw)) / jnp.maximum(sw, 1e-9)
        pc = const["P"][:, :3] @ X1p + const["P"][:, 3]
        return _project_pinhole(pc) - const["uv"]

    def _project_pinhole(pc):
        z = jnp.maximum(pc[2], 1e-4)
        return jnp.stack([K.fx * pc[0] / z + K.cx,
                          K.fy * pc[1] / z + K.cy])

    @jax.jit
    def run(S13, X1, uv2, valid_f, is2_f, X2, uv1, valid_b, is2_b,
            pose_kf, pose_cand):
        Pk = jnp.broadcast_to(pose_kf, (cap, 3, 4))
        Pc = jnp.broadcast_to(pose_cand, (cap, 3, 4))
        mask_f, mask_b = valid_f, valid_b
        states = {"sim3": S13[None]}
        z_idx = jnp.zeros(cap, jnp.int32)
        for _ in range(rounds):
            prob = E.Problem()
            prob.add_dense("sim3", 1, 7, retract)
            prob.add_term(E.Term(
                name="fwd", res_fn=fwd, rdim=2,
                dense_refs=[("sim3", z_idx)],
                const={"X": X1, "uv": uv2, "P": Pc},
                mask=mask_f, info=is2_f,
                robust_delta=float(np.sqrt(CHI2_SIM3))))
            prob.add_term(E.Term(
                name="bwd", res_fn=bwd, rdim=2,
                dense_refs=[("sim3", z_idx)],
                const={"X": X2, "uv": uv1, "P": Pk},
                mask=mask_b, info=is2_b,
                robust_delta=float(np.sqrt(CHI2_SIM3))))
            states, _, chi2s = E.optimize(prob, states, iters=iters)
            mask_f = valid_f & (chi2s["fwd"] < CHI2_SIM3)
            mask_b = valid_b & (chi2s["bwd"] < CHI2_SIM3)
        return (states["sim3"][0], mask_f, mask_b,
                jnp.sum(mask_f) + jnp.sum(mask_b))

    return run


def make_line_pair_matcher(n_line_feat: int):
    """Match line observations between two keyframes: LBD Hamming NN
    gated by angle consistency + midpoint window (reference
    LineMatcher::SearchForTriangulation src/LineMatcher.cpp:142 +
    matchGrid :191).

    (ep1 [F,4], d1 [F,8], ang1, ok1, ep2 [F,4], d2 [F,8], ang2, ok2)
    -> (idx2 [F], ok [F])
    """

    @jax.jit
    def run(ep1, d1, ang1, ok1, ep2, d2, ang2, ok2,
            radius=80.0, angle_tol=0.25):
        mid1 = (ep1[:, :2] + ep1[:, 2:]) / 2
        mid2 = (ep2[:, :2] + ep2[:, 2:]) / 2
        d2m = jnp.sum((mid1[:, None] - mid2[None, :]) ** 2, -1)
        dang = jnp.abs(ang1[:, None] - ang2[None, :]) % jnp.pi
        dang = jnp.minimum(dang, jnp.pi - dang)
        # length gates: ratio consistency, and an absolute minimum —
        # a short fragment's 2-point direction is too noisy to define a
        # usable interpretation plane (sub-0.3 deg needs ~40+ px span)
        len1 = jnp.linalg.norm(ep1[:, 2:] - ep1[:, :2], axis=-1)
        len2 = jnp.linalg.norm(ep2[:, 2:] - ep2[:, :2], axis=-1)
        lr = len1[:, None] / jnp.maximum(len2[None, :], 1e-6)
        gate = (d2m < radius ** 2) & (dang < angle_tol) \
            & (lr > 0.5) & (lr < 2.0) \
            & (len1[:, None] > 40.0) & (len2[None, :] > 40.0)
        dist = M.hamming_matrix(M.unpack_u32_to_pm1(d1),
                                M.unpack_u32_to_pm1(d2))
        idx, ok = M.match_nn_ratio(dist, ok1, ok2, gate, max_dist=110.0,
                                   ratio=0.95, mutual=True)
        return idx.astype(jnp.int32), ok

    return run


def make_local_ba_pl(K: PinholeK, n_kf: int, n_pt: int, n_obs: int,
                     n_ln: int, n_lobs: int, rounds: int = 2,
                     iters: int = 8, early_tol: float = 1e-2):
    """Local BA over points AND line-endpoint landmarks (reference
    LocalBundleAdjustmentwithLine, src/Optimizer.cc:4385): adds a 6-DoF
    line family with endpoint-to-line residuals, Schur-eliminated like
    points.

    Extra inputs vs make_local_ba:
      ln_ep [n_ln,6], ln_free, lobs_kf [n_lobs], lobs_ln [n_lobs],
      lobs_eq [n_lobs,3], lobs_valid, lobs_is2
    """

    @jax.jit
    def run(kf_poses, kf_free, pt_xyz, pt_free, obs_kf, obs_pt, obs_uv,
            obs_valid, obs_is2, ln_ep, ln_free, lobs_kf, lobs_ln,
            lobs_eq, lobs_valid, lobs_is2):
        states = {"pose": kf_poses, "pt": pt_xyz, "ln": ln_ep}
        mask = obs_valid
        mask_l = lobs_valid
        for _ in range(rounds):
            prob = E.Problem(linear_solver="cg")
            prob.add_dense("pose", n_kf, 6, RES.retract_pose_cw)
            prob.add_landmarks("pt", n_pt, 3, RES.retract_additive)
            prob.add_landmarks("ln", n_ln, 6, RES.retract_additive)
            prob.add_term(E.Term(
                name="reproj", res_fn=RES.point_reproj_ba_for(K), rdim=2,
                dense_refs=[("pose", obs_kf)], lm_ref=("pt", obs_pt),
                const={"uv": obs_uv}, mask=mask, info=obs_is2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            prob.add_term(E.Term(
                name="line", res_fn=RES.make_line_reproj(K), rdim=2,
                dense_refs=[("pose", lobs_kf)], lm_ref=("ln", lobs_ln),
                const={"l": lobs_eq}, mask=mask_l, info=lobs_is2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(
                prob, states, iters=iters, early_tol=early_tol,
                dense_free_mask={"pose": kf_free},
                lm_free_mask={"pt": pt_free, "ln": ln_free})
            mask = obs_valid & (chi2s["reproj"] < CHI2_MONO)
            mask_l = lobs_valid & (chi2s["line"] < CHI2_MONO)
        return (states["pose"], states["pt"], states["ln"], mask, mask_l)

    return run


def make_pose_optimizer_stereo(K: PinholeK, bf: float, cap: int,
                               rounds: int = 4, iters: int = 10):
    """Pose-only IRLS with STEREO (u, v, u_R) residuals for features
    that have a right-eye match and mono residuals for the rest
    (reference PoseOptimization's EdgeStereoSE3ProjectXYZOnlyPose branch
    for mvuRight>=0 features, src/Optimizer.cc:2399 + g2o
    types_six_dof_expmap.h): the third residual u_R = u - bf/z pins
    depth per observation, which conditions translation along the
    optical axis far better than mono edges.

    (pose0 [3,4], uvr [cap,3] (u, v, u_right; u_right<0 marks mono),
     X [cap,3], valid [cap], is2 [cap]) -> (pose, inlier, n_inliers)
    """
    res_st = RES.make_stereo_reproj_fixed(K, bf)
    res_mono = RES.make_point_reproj_fixed(K)

    @jax.jit
    def run(pose0, uvr, X, valid, is2):
        has_r = uvr[:, 2] > 0
        states = {"pose": pose0[None]}
        zero = jnp.zeros(cap, jnp.int32)
        mask_s = valid & has_r
        mask_m = valid & ~has_r
        for _ in range(rounds):
            prob = E.Problem()
            prob.add_dense("pose", 1, 6, RES.retract_pose_cw)
            prob.add_term(E.Term(
                name="stereo", res_fn=res_st, rdim=3,
                dense_refs=[("pose", zero)],
                const={"uvr": uvr, "X": X}, mask=mask_s, info=is2,
                robust_delta=float(np.sqrt(CHI2_STEREO))))
            prob.add_term(E.Term(
                name="mono", res_fn=res_mono, rdim=2,
                dense_refs=[("pose", zero)],
                const={"uv": uvr[:, :2], "X": X}, mask=mask_m, info=is2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(prob, states, iters=iters)
            mask_s = valid & has_r & (chi2s["stereo"] < CHI2_STEREO)
            mask_m = valid & ~has_r & (chi2s["mono"] < CHI2_MONO)
        inlier = mask_s | mask_m
        return states["pose"][0], inlier, jnp.sum(inlier)

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
            feat_octave, feat_valid, radius, max_dist=80.0,
            pt_normal=None, pt_min_dist=None, pt_max_dist=None):
        R, t = pose[:, :3], pose[:, 3]
        pc = (R @ pt_xyz.T).T + t
        z = pc[:, 2]
        uv_proj = jnp.stack([K.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + K.cx,
                             K.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + K.cy], -1)
        in_img = (z > 0.05) & (uv_proj[:, 0] >= 0) & (uv_proj[:, 0] < 2 * K.cx) \
            & (uv_proj[:, 1] >= 0) & (uv_proj[:, 1] < 2 * K.cy)
        proj_ok = pt_valid & in_img
        # scale-invariance distance + viewing-angle gates (reference
        # SearchByProjection's isInFrustum: mfMinDistance/mfMaxDistance
        # range and normal.dot(view) >= 0.5, src/Frame.cc isInFrustum +
        # MapPoint::PredictScale)
        if pt_min_dist is not None:
            C1 = -R.T @ t
            view = pt_xyz - C1
            d_cam = jnp.linalg.norm(view, axis=-1)
            has_range = pt_max_dist > 1e-6
            range_ok = (~has_range) | ((d_cam > 0.8 * pt_min_dist)
                                       & (d_cam < 1.2 * pt_max_dist))
            proj_ok = proj_ok & range_ok
            if pt_normal is not None:
                nn = jnp.linalg.norm(pt_normal, axis=-1)
                has_n = nn > 1e-6
                cos_v = jnp.sum(view * pt_normal, -1) / \
                    jnp.maximum(d_cam * nn, 1e-9)
                proj_ok = proj_ok & ((~has_n) | (cos_v > 0.5))

        d_pt = M.unpack_u32_to_pm1(pt_desc)
        d_ft = M.unpack_u32_to_pm1(feat_desc)
        dist = M.hamming_matrix(d_pt, d_ft)
        # window scaled by feature octave (coarser levels -> wider window,
        # reference: radius *= mvScaleFactors[nPredictedLevel])
        scale = 1.2 ** feat_octave.astype(jnp.float32)
        d2 = jnp.sum((uv_proj[:, None, :] - feat_uv[None, :, :]) ** 2, -1)
        gate = d2 <= (radius * scale[None, :]) ** 2
        idx, ok = M.match_nn_ratio(dist, proj_ok, feat_valid, gate,
                                   max_dist=max_dist, ratio=0.9, mutual=True)
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

    (pose1, pose2, uv1 [F,2], d1 [F,8], ok1, uv2 [F,2], d2 [F,8], ok2
     [, ang1 [F], ang2 [F]])
    -> (idx2 [F], ok [F])  matches feature i in KF1 -> idx2[i] in KF2.
    With angles given, matches outside the 3 dominant orientation-
    difference bins are dropped (reference SearchForTriangulation
    rotation histogram, src/ORBmatcher.cc:1399 + :1365-1397).
    """
    Km = jnp.array([[K.fx, 0, K.cx], [0, K.fy, K.cy], [0, 0, 1.0]], jnp.float32)
    Kinv = jnp.linalg.inv(Km)

    @jax.jit
    def run(pose1, pose2, uv1, d1, ok1, uv2, d2, ok2,
            ang1=None, ang2=None, th_epi=2.0, oct2=None):
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
        # octave-scaled gate (reference CheckDistEpipolarLine,
        # src/ORBmatcher.cc: dsqr < 3.84*sigma2(octave of kp2), i.e.
        # ~1.96*1.2^oct px): a flat pixel gate starves triangulation of
        # coarse-octave features — and of everything once the window
        # poses carry a little drift
        if oct2 is not None:
            th = th_epi * 1.2 ** oct2.astype(jnp.float32)
            gate = d_epi < th[None, :]
        else:
            gate = d_epi < th_epi
        dist = M.hamming_matrix(M.unpack_u32_to_pm1(d1), M.unpack_u32_to_pm1(d2))
        idx, ok = M.match_nn_ratio(dist, ok1, ok2, gate, max_dist=60.0,
                                   ratio=0.8, mutual=True)
        if ang1 is not None and ang2 is not None:
            ok = M.rotation_histogram_filter(ang1, ang2, idx, ok)
        return idx.astype(jnp.int32), ok

    return run


def make_triangulator(K: PinholeK, cap: int):
    """Triangulate matched feature pairs between two KFs.

    (pose1, pose2, uv1 [cap,2], uv2 [cap,2], valid)
    -> (X_world [cap,3], good [cap])
    """

    @jax.jit
    def run(pose1, pose2, uv1, uv2, valid, min_parallax_cos=0.99995,
            max_reproj_err=5.991, oct1=None, oct2=None):
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
        # octave-scaled reprojection gate (reference CreateNewMapPoints,
        # src/LocalMapping.cc:724: 5.991*sigma2(octave)).  Unlike the
        # epipolar MATCH gate, loosening this cannot admit wrong
        # correspondences (candidates already passed the descriptor +
        # tight epipolar gates) — it only tolerates the window pose
        # drift that otherwise starves triangulation mid-run (measured
        # on the hall circuit: 482 epipolar matches -> 28 survivors
        # under drift, 375/376 with exact poses).
        th1 = max_reproj_err * (1.2 ** (2.0 * oct1.astype(jnp.float32))
                                if oct1 is not None else 1.0)
        th2 = max_reproj_err * (1.2 ** (2.0 * oct2.astype(jnp.float32))
                                if oct2 is not None else 1.0)
        good = valid & (z1 > 0.02) & (z2 > 0.02) & (cosp < min_parallax_cos) \
            & (e1 < th1) & (e2 < th2) \
            & jnp.all(jnp.isfinite(X1), -1)
        # to world: X_w = R1^T (X1 - t1)
        Xw = (R1.T @ (X1 - t1).T).T
        return Xw, good

    return run


def make_vi_pose_optimizer(K: PinholeK, cap: int, Rcb, tcb, gravity: float,
                           rounds: int = 3, iters: int = 6, bf: float = 0.0):
    # rounds/iters trimmed from 4x8: with the early-exit warm start the
    # extra budget never fired on converged frames but still paid 2
    # mandatory linearizations per round — measured 46.8 -> ~60 fps on
    # the production VI frame with replay-regression accuracy unchanged
    """Visual-inertial pose-only optimization of the current frame's
    (pose_wb, v, bg, ba) against the previous frame's state (reference
    PoseInertialOptimizationLastFrame / LastKeyFrame,
    src/Optimizer.cc:13980 / :13585): reprojection edges through the
    body extrinsic + one 9-dim inertial edge + bias random-walk pulls.

    Two flavors in one kernel, switched by `have_prior`:
      * have_prior=True  — LastFrame: the previous state is FREE and held
        by a 15-DoF marginalization prior (reference ConstraintPoseImu +
        EdgePriorPoseImu, include/G2oTypes.h:848/893) carried from its own
        solve; after optimizing, the previous state is marginalized out of
        the joint 30x30 Hessian (reference Optimizer.cc:14399
        `Marginalize(H,0,14)`) to produce the NEXT frame's 15x15 prior.
      * have_prior=False — LastKeyFrame: the previous state is hard-fixed;
        the returned prior is the current frame's own Hessian block
        (reference :13931-13977 sums the frame-side edge Hessians).

    When bf > 0, features with uvr[:,2] >= 0 use the 3-dim stereo residual
    (reference EdgeStereoOnlyPose joins the inertial pose opt for
    mvuRight>=0, src/Optimizer.cc:13659ff); uvr[:,2] < 0 stays mono.

    run(pose_wb0 [3,4], v0, bg0, ba0, uvr [cap,3], X [cap,3], valid, is2,
        prev_pose_wb, prev_v, pre_const dict, imu_info [9,9],
        bias_rw_info [6], prior_const {R0,p0,v0,bg0,ba0},
        prior_info [15,15], have_prior bool)
      -> (pose_wb, v, bg, ba, inlier, n_inliers, H15 [15,15])
    """
    Rcb = jnp.asarray(Rcb, jnp.float32)
    tcb = jnp.asarray(tcb, jnp.float32)
    reproj_fn = RES.make_point_reproj_body(K, Rcb, tcb)
    stereo_fn = (RES.make_stereo_reproj_body(K, bf, Rcb, tcb)
                 if bf > 0 else None)
    inertial_fn = RES.make_inertial(gravity)
    prior_fn = RES.make_prior15()
    eye15 = jnp.eye(15, dtype=jnp.float32)

    def build(states, mask_m, mask_s, consts):
        (uvr, X, is2, pre_const, imu_info, bias_rw_info,
         prior_const, prior_info_safe, have_prior) = consts
        z1 = jnp.zeros(1, jnp.int32)
        o1 = jnp.ones(1, jnp.int32)
        prob = E.Problem()
        prob.add_dense("pose", 2, 6, RES.retract_pose_wb)
        prob.add_dense("vel", 2, 3, RES.retract_additive)
        prob.add_dense("bg", 2, 3, RES.retract_additive)
        prob.add_dense("ba", 2, 3, RES.retract_additive)
        prob.add_term(E.Term(
            name="reproj", res_fn=reproj_fn, rdim=2,
            dense_refs=[("pose", jnp.ones(cap, jnp.int32))],
            const={"uv": uvr[:, :2], "X": X}, mask=mask_m, info=is2,
            robust_delta=float(np.sqrt(CHI2_MONO))))
        if stereo_fn is not None:
            prob.add_term(E.Term(
                name="stereo", res_fn=stereo_fn, rdim=3,
                dense_refs=[("pose", jnp.ones(cap, jnp.int32))],
                const={"uvr": uvr, "X": X}, mask=mask_s, info=is2,
                robust_delta=float(np.sqrt(CHI2_STEREO))))
        prob.add_term(E.Term(
            name="inertial", res_fn=inertial_fn, rdim=9,
            dense_refs=[("pose", z1), ("vel", z1), ("bg", o1),
                        ("ba", o1), ("pose", o1), ("vel", o1)],
            const=jax.tree_util.tree_map(lambda x: x[None], pre_const),
            mask=jnp.ones(1, bool), info=imu_info[None]))
        prob.add_term(E.Term(
            name="bg_rw", res_fn=RES.bias_rw, rdim=3,
            dense_refs=[("bg", z1), ("bg", o1)], const=None,
            mask=jnp.ones(1, bool), info=bias_rw_info[None, :3]))
        prob.add_term(E.Term(
            name="ba_rw", res_fn=RES.bias_rw, rdim=3,
            dense_refs=[("ba", z1), ("ba", o1)], const=None,
            mask=jnp.ones(1, bool), info=bias_rw_info[None, 3:]))
        prob.add_term(E.Term(
            name="prior", res_fn=prior_fn, rdim=15,
            dense_refs=[("pose", z1), ("vel", z1), ("bg", z1), ("ba", z1)],
            const=jax.tree_util.tree_map(lambda x: x[None], prior_const),
            mask=have_prior[None], info=prior_info_safe[None]))
        return prob

    # dense layout (declaration order above): pose [0:12), vel [12:18),
    # bg [18:24), ba [24:30); per-state 15-vector order = (pose6, vel3,
    # bg3, ba3) — matching make_prior15's residual ordering
    IDX_PREV = np.concatenate([np.arange(0, 6), np.arange(12, 15),
                               np.arange(18, 21), np.arange(24, 27)])
    IDX_CUR = np.concatenate([np.arange(6, 12), np.arange(15, 18),
                              np.arange(21, 24), np.arange(27, 30)])

    @jax.jit
    def run(pose_wb0, v0, bg0, ba0, uvr, X, valid, is2,
            prev_pose_wb, prev_v, pre_const, imu_info, bias_rw_info,
            prior_const, prior_info, have_prior):
        """bias_rw_info: [6] information (1/cov) anchoring (bg, ba) to the
        previous state's biases via random-walk edges (reference
        EdgeGyroRW/EdgeAccRW in PoseInertialOptimization*,
        src/Optimizer.cc:13585 — without this the per-frame biases are
        observable only through one inertial edge and drift freely)."""
        have_prior = jnp.asarray(have_prior, bool)
        # a garbage prior_info under have_prior=False must not poison the
        # whitening cholesky (0*NaN = NaN kills the whole cost)
        prior_info_safe = jnp.where(have_prior, prior_info, eye15)
        has_r = uvr[:, 2] > 0 if stereo_fn is not None \
            else jnp.zeros(cap, bool)
        mask_m = valid & ~has_r
        mask_s = valid & has_r
        states = {"pose": jnp.stack([prev_pose_wb, pose_wb0]),
                  "vel": jnp.stack([prev_v, v0]),
                  "bg": jnp.stack([bg0, bg0]), "ba": jnp.stack([ba0, ba0])}
        free = {"pose": jnp.stack([have_prior, jnp.asarray(True)]),
                "vel": jnp.stack([have_prior, jnp.asarray(True)]),
                "bg": jnp.stack([have_prior, jnp.asarray(True)]),
                "ba": jnp.stack([have_prior, jnp.asarray(True)])}
        consts = (uvr, X, is2, pre_const, imu_info, bias_rw_info,
                  prior_const, prior_info_safe, have_prior)
        chi2s = None
        for _ in range(rounds):
            prob = build(states, mask_m, mask_s, consts)
            # early_tol: the frame-over-frame warm start leaves the
            # solve 2-3 accepted steps from convergence — the same
            # g2o-terminate-action analog the window BA kernels use
            states, _, chi2s = E.optimize(prob, states, iters=iters,
                                          dense_free_mask=free,
                                          early_tol=1e-2)
            mask_m = valid & ~has_r & (chi2s["reproj"] < CHI2_MONO)
            if stereo_fn is not None:
                mask_s = valid & has_r & (chi2s["stereo"] < CHI2_STEREO)
        inlier = mask_m | mask_s

        # ---- next frame's 15-DoF prior (information-form recursion) ----
        # one extra linearization at the solution; no damping is added by
        # build_normal_equations, so H is the exact GN information
        prob = build(states, mask_m, mask_s, consts)
        _, H, _, _, _, _ = prob.build_normal_equations(states)
        Hpp = H[jnp.ix_(IDX_PREV, IDX_PREV)]
        Hpc = H[jnp.ix_(IDX_PREV, IDX_CUR)]
        Hcc = H[jnp.ix_(IDX_CUR, IDX_CUR)]
        # marginalize the previous state: Hcc - Hcp Hpp^+ Hpc (pinv via
        # eigh — reference Optimizer::Marginalize uses the same SVD-
        # thresholded pseudo-inverse, src/Optimizer.cc:14399)
        Hs = 0.5 * (Hpp + Hpp.T)
        w, V = jnp.linalg.eigh(Hs)
        w_inv = jnp.where(w > 1e-6 * jnp.maximum(jnp.max(jnp.abs(w)), 1e-12),
                          1.0 / w, 0.0)
        Hpp_inv = (V * w_inv[None, :]) @ V.T
        H15_marg = Hcc - Hpc.T @ Hpp_inv @ Hpc
        # have_prior=False: previous state was fixed — conditioning, not
        # marginalization (reference LastKeyFrame sums frame-side edge
        # Hessians only, src/Optimizer.cc:13931)
        H15 = jnp.where(have_prior, H15_marg, Hcc)
        H15 = 0.5 * (H15 + H15.T)
        return (states["pose"][1], states["vel"][1], states["bg"][1],
                states["ba"][1], inlier, jnp.sum(inlier), H15)

    return run


def make_scale_refine(gravity: float, n_kf: int, iters: int = 12):
    """Periodic scale/gravity refinement: same inertial-GS edges but ONLY
    (Rwg, s) free — biases and velocities fixed (reference
    Optimizer::InertialOptimization scale+gravity overload called from
    LocalMapping::ScaleRefinement, src/LocalMapping.cc:2534).

    run(Rwg0, vel [n_kf,3], bg [3], ba [3], pre_const, pose_R, pose_p,
        imu_info, edge_valid) -> (Rwg, scale)
    """
    gs_fn = RES.make_inertial_gs(gravity)

    @jax.jit
    def run(Rwg0, vel, bg, ba, pre_const, pose_R, pose_p, imu_info,
            edge_valid):
        n_e = n_kf - 1
        idx1 = jnp.arange(n_e, dtype=jnp.int32)
        z = jnp.zeros(n_e, jnp.int32)
        const = dict(pre_const)
        const["R1"] = pose_R[:-1]
        const["p1"] = pose_p[:-1]
        const["R2"] = pose_R[1:]
        const["p2"] = pose_p[1:]
        prob = E.Problem()
        prob.add_dense("gdir", 1, 2, RES.retract_gdir)
        prob.add_dense("scale", 1, 1, RES.retract_scale)
        prob.add_dense("bg", 1, 3, RES.retract_additive)
        prob.add_dense("ba", 1, 3, RES.retract_additive)
        prob.add_dense("vel", n_kf, 3, RES.retract_additive)
        prob.add_term(E.Term(
            name="gs", res_fn=gs_fn, rdim=9,
            dense_refs=[("gdir", z), ("scale", z), ("bg", z), ("ba", z),
                        ("vel", idx1), ("vel", idx1 + 1)],
            const=const, mask=edge_valid, info=imu_info))
        states = {"gdir": Rwg0[None], "scale": jnp.ones((1, 1), jnp.float32),
                  "bg": bg[None], "ba": ba[None], "vel": vel}
        free = {"gdir": jnp.asarray([True]), "scale": jnp.asarray([True]),
                "bg": jnp.asarray([False]), "ba": jnp.asarray([False]),
                "vel": jnp.zeros(n_kf, bool)}
        states, _, _ = E.optimize(prob, states, iters=iters,
                                  dense_free_mask=free)
        return states["gdir"][0], states["scale"][0, 0]

    return run


def make_inertial_init(gravity: float, n_kf: int, iters: int = 20,
                       prior_g: float = 1e2, prior_a: float = 1e10):
    """IMU initialization: optimize gravity direction, scale, shared
    biases and per-KF velocities with poses fixed (reference
    Optimizer::InertialOptimization, src/Optimizer.cc:9914, called from
    LocalMapping::InitializeIMU :2143).

    run(Rwg0 [3,3], vel0 [n_kf,3], pre_const (stacked [n_kf-1,...]),
        pose_R [n_kf,3,3], pose_p [n_kf,3], imu_info [n_kf-1,9,9],
        edge_valid [n_kf-1])
    -> (Rwg, scale, bg, ba, vel)
    """
    gs_fn = RES.make_inertial_gs(gravity)

    @jax.jit
    def run(Rwg0, vel0, pre_const, pose_R, pose_p, imu_info, edge_valid):
        n_e = n_kf - 1
        idx1 = jnp.arange(n_e, dtype=jnp.int32)
        z = jnp.zeros(n_e, jnp.int32)
        const = dict(pre_const)
        const["R1"] = pose_R[:-1]
        const["p1"] = pose_p[:-1]
        const["R2"] = pose_R[1:]
        const["p2"] = pose_p[1:]

        prob = E.Problem()
        prob.add_dense("gdir", 1, 2, RES.retract_gdir)
        prob.add_dense("scale", 1, 1, RES.retract_scale)
        prob.add_dense("bg", 1, 3, RES.retract_additive)
        prob.add_dense("ba", 1, 3, RES.retract_additive)
        prob.add_dense("vel", n_kf, 3, RES.retract_additive)
        prob.add_term(E.Term(
            name="gs", res_fn=gs_fn, rdim=9,
            dense_refs=[("gdir", z), ("scale", z), ("bg", z), ("ba", z),
                        ("vel", idx1), ("vel", idx1 + 1)],
            const=const, mask=edge_valid, info=imu_info))
        # bias priors: the quiet-start init problem is degenerate in
        # (scale, ba, gravity) — without the reference's strong priors
        # (priorG=1e2, priorA=1e10: first-init arguments of
        # InitializeIMU, src/LocalMapping.cc:2143, applied as
        # EdgePriorGyro/EdgePriorAcc in InertialOptimization
        # src/Optimizer.cc:9914) the solver can trade a ~10x scale for a
        # multi-m/s^2 fake accelerometer bias (observed on the MH
        # replay).  The acc prior effectively pins ba~0 for the first
        # init; the windowed VI-BA re-estimates biases with RW edges
        # once motion makes them observable.
        z1 = jnp.zeros(1, jnp.int32)
        prob.add_term(E.Term(
            name="prior_bg", res_fn=RES.state_prior, rdim=3,
            dense_refs=[("bg", z1)],
            const={"x0": jnp.zeros((1, 3), jnp.float32)},
            mask=jnp.ones(1, bool),
            info=jnp.full((1,), prior_g, jnp.float32)))
        prob.add_term(E.Term(
            name="prior_ba", res_fn=RES.state_prior, rdim=3,
            dense_refs=[("ba", z1)],
            const={"x0": jnp.zeros((1, 3), jnp.float32)},
            mask=jnp.ones(1, bool),
            info=jnp.full((1,), prior_a, jnp.float32)))
        states = {"gdir": Rwg0[None], "scale": jnp.ones((1, 1), jnp.float32),
                  "bg": jnp.zeros((1, 3), jnp.float32),
                  "ba": jnp.zeros((1, 3), jnp.float32), "vel": vel0}
        states, _, _ = E.optimize(prob, states, iters=iters)
        return (states["gdir"][0], states["scale"][0, 0], states["bg"][0],
                states["ba"][0], states["vel"])

    return run


def make_local_inertial_ba(K: PinholeK, n_kf: int, n_pt: int, n_obs: int,
                           Rcb, tcb, gravity: float,
                           rounds: int = 2, iters: int = 8,
                           n_ln: int = 0, n_lobs: int = 0,
                           early_tol: float = 1e-2):
    """Sliding-window visual-inertial BA (reference LocalInertialBA,
    src/Optimizer.cc:9185): per-KF 15-DoF states (pose_wb, vel, bg, ba),
    inertial + bias-RW edges along the temporal chain, visual edges to
    Schur-eliminated points, fixed anchor.  With n_ln/n_lobs > 0 a
    Schur-eliminated line-endpoint family joins the problem (reference
    FullInertialBAwithLine, src/Optimizer.cc:1374).

    run(kf_pose_wb [W,3,4], kf_vel, kf_bg, kf_ba, kf_free [W],
        pt_xyz [P,3], pt_free, obs_kf [O], obs_pt [O], obs_uv [O,2],
        obs_valid, obs_is2, pre_const (stacked [W-1]), imu_info [W-1,9,9],
        edge_valid [W-1], rw_info_g [W-1], rw_info_a [W-1]
        [, ln_ep [Ln,6], ln_free, lobs_kf [Lo], lobs_ln, lobs_eq [Lo,3],
           lobs_valid])
    -> (pose_wb, vel, bg, ba, pt_xyz, obs_inlier[, ln_ep])
    """
    Rcb = jnp.asarray(Rcb, jnp.float32)
    tcb = jnp.asarray(tcb, jnp.float32)
    reproj_fn = RES.point_reproj_body_ba_for(K, Rcb, tcb)
    line_fn = RES.make_line_reproj_body_ba(K, Rcb, tcb)
    inertial_fn = RES.make_inertial(gravity)
    with_lines = n_ln > 0 and n_lobs > 0

    @jax.jit
    def run(kf_pose_wb, kf_vel, kf_bg, kf_ba, kf_free, kf_free_bias,
            pt_xyz, pt_free,
            obs_kf, obs_pt, obs_uv, obs_valid, obs_is2,
            pre_const, imu_info, edge_valid, rw_info_g, rw_info_a,
            ln_ep=None, ln_free=None, lobs_kf=None, lobs_ln=None,
            lobs_eq=None, lobs_valid=None):
        """kf_free_bias frees the bias states independently of the
        pose/velocity mask: the full-map VIBA pulses free EVERY bias
        (including the gauge anchor's) so a mis-estimated init bias can
        be corrected — the tight bias random-walk edges otherwise chain
        the whole map to the frozen anchor value forever (reference
        FullInertialBA with bInit re-estimates a shared bias under soft
        priors, src/Optimizer.cc:1921)."""
        mask = obs_valid
        states = {"pose": kf_pose_wb, "vel": kf_vel,
                  "bg": kf_bg, "ba": kf_ba, "pt": pt_xyz}
        lm_free = {"pt": pt_free}
        mask_l = lobs_valid
        if with_lines:
            states["ln"] = ln_ep
            lm_free["ln"] = ln_free
        free = {"pose": kf_free, "vel": kf_free, "bg": kf_free_bias,
                "ba": kf_free_bias}
        idx1 = jnp.arange(n_kf - 1, dtype=jnp.int32)
        idx2 = idx1 + 1
        for _ in range(rounds):
            prob = E.Problem(linear_solver="cg")
            prob.add_dense("pose", n_kf, 6, RES.retract_pose_wb)
            prob.add_dense("vel", n_kf, 3, RES.retract_additive)
            prob.add_dense("bg", n_kf, 3, RES.retract_additive)
            prob.add_dense("ba", n_kf, 3, RES.retract_additive)
            prob.add_landmarks("pt", n_pt, 3, RES.retract_additive)
            prob.add_term(E.Term(
                name="reproj", res_fn=reproj_fn, rdim=2,
                dense_refs=[("pose", obs_kf)], lm_ref=("pt", obs_pt),
                const={"uv": obs_uv}, mask=mask, info=obs_is2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            if with_lines:
                prob.add_landmarks("ln", n_ln, 6, RES.retract_additive)
                prob.add_term(E.Term(
                    name="line", res_fn=line_fn, rdim=2,
                    dense_refs=[("pose", lobs_kf)], lm_ref=("ln", lobs_ln),
                    const={"l": lobs_eq}, mask=mask_l,
                    info=jnp.ones(n_lobs, jnp.float32),
                    robust_delta=float(np.sqrt(CHI2_MONO))))
            prob.add_term(E.Term(
                name="inertial", res_fn=inertial_fn, rdim=9,
                dense_refs=[("pose", idx1), ("vel", idx1), ("bg", idx1),
                            ("ba", idx1), ("pose", idx2), ("vel", idx2)],
                const=pre_const, mask=edge_valid, info=imu_info))
            prob.add_term(E.Term(
                name="bg_rw", res_fn=RES.bias_rw, rdim=3,
                dense_refs=[("bg", idx1), ("bg", idx2)],
                const=None, mask=edge_valid, info=rw_info_g))
            prob.add_term(E.Term(
                name="ba_rw", res_fn=RES.bias_rw, rdim=3,
                dense_refs=[("ba", idx1), ("ba", idx2)],
                const=None, mask=edge_valid, info=rw_info_a))
            states, _, chi2s = E.optimize(
                prob, states, iters=iters, early_tol=early_tol,
                dense_free_mask=free, lm_free_mask=lm_free)
            mask = obs_valid & (chi2s["reproj"] < CHI2_MONO)
            if with_lines:
                mask_l = lobs_valid & (chi2s["line"] < CHI2_MONO)
        out = (states["pose"], states["vel"], states["bg"], states["ba"],
               states["pt"], mask)
        if with_lines:
            out = out + (states["ln"],)
        return out

    return run


def make_local_ba(K: PinholeK, n_kf: int, n_pt: int, n_obs: int,
                  rounds: int = 2, iters: int = 8,
                  early_tol: float = 1e-2):
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
            prob = E.Problem(linear_solver="cg")
            prob.add_dense("pose", n_kf, 6, RES.retract_pose_cw)
            prob.add_landmarks("pt", n_pt, 3, RES.retract_additive)
            prob.add_term(E.Term(
                name="reproj", res_fn=RES.point_reproj_ba_for(K), rdim=2,
                dense_refs=[("pose", obs_kf)], lm_ref=("pt", obs_pt),
                const={"uv": obs_uv}, mask=mask, info=obs_is2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(
                prob, states, iters=iters, early_tol=early_tol,
                dense_free_mask={"pose": kf_free},
                lm_free_mask={"pt": pt_free})
            mask = obs_valid & (chi2s["reproj"] < CHI2_MONO)
        return states["pose"], states["pt"], mask

    return run


def make_pose_opt_line_only(K: PinholeK, cap_ln: int, mode: int,
                            rounds: int = 3, iters: int = 6):
    """Line-only pose optimization for `SLAM` modes 1-3 (reference
    PoseOptimizationOnlyLine / OnlyLineAngles / OnlyLineWithAngles,
    src/Optimizer.cc:3406,3546,3688): mode 1 = two endpoint-to-line
    residuals per line (EdgeLineSE3ProjectXYZOnlyPose), mode 2 =
    direction-alignment residual (EdgeLineAngleSE3ProjectXYZOnlyPose),
    mode 3 = both (EdgeLineWithAngleSE3ProjectXYZOnlyPose,
    include/OptimizableTypes.h:305,346,390).

    run(pose0 [3,4], l_obs [L,3], dir_obs [L,2], Xs [L,3], Xe [L,3],
        valid_l, is2_l) -> (pose, inlier_l, n_inliers)
    """
    assert mode in (1, 2, 3)
    res_ep = RES.make_line_reproj_fixed(K)
    res_ang = RES.make_line_angle_fixed(K)
    # angle residual is sin(angle); weight so the chi2 gate corresponds
    # to ~7 deg at chi2=CHI2_MONO
    ANG_INFO = 400.0

    @jax.jit
    def run(pose0, l_obs, dir_obs, Xs, Xe, valid_l, is2_l):
        states = {"pose": pose0[None]}
        mask = valid_l
        zero = jnp.zeros(cap_ln, jnp.int32)
        gate_key = "ep" if mode in (1, 3) else "ang"
        for _ in range(rounds):
            prob = E.Problem()
            prob.add_dense("pose", 1, 6, RES.retract_pose_cw)
            if mode in (1, 3):
                prob.add_term(E.Term(
                    name="ep", res_fn=res_ep, rdim=2,
                    dense_refs=[("pose", zero)],
                    const={"l": l_obs, "Xs": Xs, "Xe": Xe},
                    mask=mask, info=is2_l,
                    robust_delta=float(np.sqrt(CHI2_MONO))))
            if mode in (2, 3):
                prob.add_term(E.Term(
                    name="ang", res_fn=res_ang, rdim=1,
                    dense_refs=[("pose", zero)],
                    const={"dir": dir_obs, "Xs": Xs, "Xe": Xe},
                    mask=mask, info=is2_l * ANG_INFO,
                    robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(prob, states, iters=iters)
            mask = valid_l & (chi2s[gate_key] < CHI2_MONO)
        return states["pose"][0], mask, jnp.sum(mask)

    return run


def make_local_ba_lines_only(K: PinholeK, n_kf: int, n_ln: int,
                             n_lobs: int, mode: int,
                             rounds: int = 2, iters: int = 8):
    """Line-only local BA for `SLAM` modes 1-3 (reference
    LocalBundleAdjustmentOnlyLines / ...Angle / ...WithAngle,
    src/Optimizer.cc:6181,6433,6689): poses + Schur-eliminated 6-DoF
    line-endpoint landmarks, residual flavor per mode.

    run(kf_poses [n_kf,3,4], kf_free, ln_ep [n_ln,6], ln_free,
        lobs_kf [n_lobs], lobs_ln, lobs_eq [n_lobs,3],
        lobs_dir [n_lobs,2], lobs_valid, lobs_is2)
    -> (kf_poses, ln_ep, lobs_inlier)
    """
    assert mode in (1, 2, 3)
    ANG_INFO = 400.0

    @jax.jit
    def run(kf_poses, kf_free, ln_ep, ln_free, lobs_kf, lobs_ln,
            lobs_eq, lobs_dir, lobs_valid, lobs_is2):
        states = {"pose": kf_poses, "ln": ln_ep}
        mask = lobs_valid
        gate_key = "line" if mode in (1, 3) else "ang"
        for _ in range(rounds):
            prob = E.Problem(linear_solver="cg")
            prob.add_dense("pose", n_kf, 6, RES.retract_pose_cw)
            prob.add_landmarks("ln", n_ln, 6, RES.retract_additive)
            if mode in (1, 3):
                prob.add_term(E.Term(
                    name="line", res_fn=RES.make_line_reproj(K), rdim=2,
                    dense_refs=[("pose", lobs_kf)], lm_ref=("ln", lobs_ln),
                    const={"l": lobs_eq}, mask=mask, info=lobs_is2,
                    robust_delta=float(np.sqrt(CHI2_MONO))))
            if mode in (2, 3):
                prob.add_term(E.Term(
                    name="ang", res_fn=RES.make_line_angle(K), rdim=1,
                    dense_refs=[("pose", lobs_kf)], lm_ref=("ln", lobs_ln),
                    const={"dir": lobs_dir}, mask=mask,
                    info=lobs_is2 * ANG_INFO,
                    robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(
                prob, states, iters=iters,
                dense_free_mask={"pose": kf_free},
                lm_free_mask={"ln": ln_free})
            mask = lobs_valid & (chi2s[gate_key] < CHI2_MONO)
        return states["pose"], states["ln"], mask

    return run


def make_projection_matcher_kb8(K8, n_feat: int, cap_pts: int):
    """KB8-native projection matcher: map points project through the
    equidistant model onto RAW (distorted) pixels — fisheye frames match
    without a pinhole proxy (reference KannalaBrandt8::project used by
    SearchByProjection via the GeometricCamera interface,
    src/CameraModels/KannalaBrandt8.cpp).

    Same contract as make_projection_matcher but feat_uv are RAW pixels.
    """
    proj = jax.vmap(lambda pc: RES.kb8_project_single(K8, pc))

    @jax.jit
    def run(pose, pt_xyz, pt_desc, pt_valid, feat_uv, feat_desc,
            feat_octave, feat_valid, radius, max_dist=80.0,
            pt_normal=None, pt_min_dist=None, pt_max_dist=None):
        R, t = pose[:, :3], pose[:, 3]
        pc = (R @ pt_xyz.T).T + t
        z = pc[:, 2]
        uv_proj = proj(pc)
        in_img = (z > 0.05) \
            & (uv_proj[:, 0] >= 0) & (uv_proj[:, 0] < 2 * K8.cx) \
            & (uv_proj[:, 1] >= 0) & (uv_proj[:, 1] < 2 * K8.cy)
        proj_ok = pt_valid & in_img
        if pt_min_dist is not None:
            C1 = -R.T @ t
            view = pt_xyz - C1
            d_cam = jnp.linalg.norm(view, axis=-1)
            has_range = pt_max_dist > 1e-6
            range_ok = (~has_range) | ((d_cam > 0.8 * pt_min_dist)
                                       & (d_cam < 1.2 * pt_max_dist))
            proj_ok = proj_ok & range_ok
        d_pt = M.unpack_u32_to_pm1(pt_desc)
        d_ft = M.unpack_u32_to_pm1(feat_desc)
        dist = M.hamming_matrix(d_pt, d_ft)
        scale = 1.2 ** feat_octave.astype(jnp.float32)
        d2 = jnp.sum((uv_proj[:, None, :] - feat_uv[None, :, :]) ** 2, -1)
        gate = d2 <= (radius * scale[None, :]) ** 2
        idx, ok = M.match_nn_ratio(dist, proj_ok, feat_valid, gate,
                                   max_dist=max_dist, ratio=0.9, mutual=True)
        uv_m = feat_uv[idx]
        feat_pt = jnp.full((n_feat,), -1, jnp.int32)
        safe_idx = jnp.where(ok, idx, 0)
        feat_pt = feat_pt.at[safe_idx].set(
            jnp.where(ok, jnp.arange(cap_pts, dtype=jnp.int32), -1),
            mode="drop")
        return uv_m, idx.astype(jnp.int32), ok, feat_pt

    return run


def make_pose_optimizer_kb8(K8, cap: int, rounds: int = 3, iters: int = 6):
    """Pose-only IRLS with NATIVE KB8 reprojection residuals against raw
    pixels (reference PoseOptimization with KannalaBrandt8 camera —
    the fisheye Jacobian comes from jacfwd through the theta-poly).

    (pose0 [3,4], uv [cap,2] RAW pixels, X [cap,3], valid, inv_sigma2)
    -> (pose, inlier, n_inliers)
    """
    res_fn = RES.make_point_reproj_kb8_fixed(K8)

    @jax.jit
    def run(pose0, uv, X, valid, inv_sigma2):
        states = {"pose": pose0[None]}
        mask = valid
        zero = jnp.zeros(cap, jnp.int32)
        for _ in range(rounds):
            prob = E.Problem()
            prob.add_dense("pose", 1, 6, RES.retract_pose_cw)
            prob.add_term(E.Term(
                name="reproj", res_fn=res_fn, rdim=2,
                dense_refs=[("pose", zero)],
                const={"uv": uv, "X": X},
                mask=mask, info=inv_sigma2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            states, _, chi2s = E.optimize(prob, states, iters=iters)
            mask = valid & (chi2s["reproj"] < CHI2_MONO)
        return states["pose"][0], mask, jnp.sum(mask)

    return run
