"""Prior-map relocalization: align the live session to a prior RGB-D
keyframe set and export the trajectory in the prior frame.

Re-design of the fork-new `Relocalization` thread (reference:
src/Relocalization/Relocalization.cpp:16-424 + R_Frame.cpp +
R_ORBmatcher.cpp): at startup a prior keyframe set (color/i.png,
depth/i.pgm, pose.txt TUM-style) is loaded, ORB+BoW extracted per prior
frame; once the live map matures (reference gate: inertial BA2,
Relocalization.cpp:116), the current keyframe is scored against all prior
frames (top-3), matched, and a live->prior world transform is computed;
every subsequent keyframe pose is then re-expressed in the prior world
(UpdatePose3 :298-313) and exported via
SaveKeyFrameTrajectoryByRelocalization (src/System.cc:959).

One deliberate improvement over the reference: with depth available for
the prior frames, the camera-in-prior-world pose comes from PnP RANSAC on
depth-backprojected 3D points (metrically correct), instead of the
reference's essential-matrix recoverPose whose translation is scale-free
(R_ORBmatcher.cpp:150-199).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import frontend as FE
from ..ops import matching as M
from ..ops import pnp as PNP
from ..solver.residuals import PinholeK
from ..utils import lie
from . import vocabulary as V
from .mapstore import Atlas


@dataclass
class PriorFrame:
    """One prior keyframe (reference R_Frame)."""
    T_wc: np.ndarray          # [3,4] prior-world-from-camera
    uv: np.ndarray            # [N,2] keypoints
    desc_packed: np.ndarray   # [N,8]
    valid: np.ndarray         # [N]
    xyz_w: np.ndarray         # [N,3] depth-backprojected 3D (prior world)
    has_depth: np.ndarray     # [N]
    bow: np.ndarray           # [W]


class PriorMapRelocalizer:
    def __init__(self, cfg: SystemConfig, atlas: Atlas,
                 voc: V.Vocabulary, n_feat: int):
        self.cfg = cfg
        self.atlas = atlas
        self.voc = voc
        self.n_feat = n_feat
        cam = cfg.camera
        self.K = PinholeK(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        # the prior set was captured by its own camera; the reference
        # hardcodes it (Relocalization.cpp:8: 518, 519, 325.5, 253.5)
        self.prior_K = PinholeK(fx=518.0, fy=519.0, cx=325.5, cy=253.5)
        self.prior_frames: List[PriorFrame] = []
        self._bow_pipeline = V.make_bow_pipeline(voc, n_feat)
        self._extract = None
        # live->prior world transform, set on first successful alignment
        # (reference m_R_T21, Relocalization.cpp:144-151)
        self.T_prior_from_live: Optional[np.ndarray] = None   # [3,4]
        # time -> pose in the prior world (reference UpdatePose3 output)
        self.relocalized_poses: Dict[float, np.ndarray] = {}
        self._key = jax.random.PRNGKey(cfg.seed + 13)

    # ------------------------------------------------------------------
    def add_prior_frame(self, img: np.ndarray, depth: np.ndarray,
                        T_wc: np.ndarray) -> None:
        """Register a prior RGB-D keyframe (reference R_Frame ctor +
        inverted-file add, Relocalization.cpp:320)."""
        if self._extract is None:
            self._extract, _ = FE.make_extractor(
                img.shape[0], img.shape[1], self.cfg.orb.n_features)
        f = self._extract(jnp.asarray(img, jnp.float32))
        uv = np.asarray(f.uv)
        valid = np.asarray(f.valid)
        desc = np.asarray(M.pack_bits_u32(f.desc))
        _, bow = self._bow_pipeline(jnp.asarray(desc), jnp.asarray(valid))
        # depth back-projection (reference R_Frame::GetMapPoints)
        ui = np.clip(uv[:, 0].astype(int), 0, depth.shape[1] - 1)
        vi = np.clip(uv[:, 1].astype(int), 0, depth.shape[0] - 1)
        z = depth[vi, ui]
        has_depth = valid & (z > 0.05) & np.isfinite(z)
        xn = (uv[:, 0] - self.prior_K.cx) / self.prior_K.fx
        yn = (uv[:, 1] - self.prior_K.cy) / self.prior_K.fy
        pc = np.stack([xn * z, yn * z, z], -1)
        xyz_w = pc @ T_wc[:, :3].T + T_wc[:, 3]
        self.prior_frames.append(PriorFrame(
            T_wc=np.asarray(T_wc, np.float32), uv=uv, desc_packed=desc,
            valid=valid, xyz_w=xyz_w.astype(np.float32),
            has_depth=has_depth, bow=np.asarray(bow)))

    def load_prior_dir(self, data_dir: str) -> int:
        """Load the reference's on-disk prior format: color/<i+1>.png,
        depth/<i+1>.pgm paired with row i of pose.txt — rows are either
        `x y z qx qy qz qw` (the shipped data/, data2/ sets) or TUM
        `t x y z qx qy qz qw` (reference LoadImages,
        Relocalization.cpp:16-62 pairs image i+1 with pose row i)."""
        from ..io.euroc import load_image_gray
        pose_path = os.path.join(data_dir, "pose.txt")
        rows = np.loadtxt(pose_path, ndmin=2)
        off = 1 if rows.shape[1] >= 8 else 0   # skip timestamp column
        n = 0
        for i, row in enumerate(rows):
            cpath = os.path.join(data_dir, "color", f"{i + 1}.png")
            dpath = os.path.join(data_dir, "depth", f"{i + 1}.pgm")
            if not (os.path.exists(cpath) and os.path.exists(dpath)):
                continue
            img = load_image_gray(cpath)
            from PIL import Image
            depth = np.asarray(Image.open(dpath), np.float32) / 5000.0
            q = row[off + 3:off + 7]
            R = np.asarray(lie.quat_to_rot(jnp.asarray(q, jnp.float32)))
            t = row[off:off + 3]
            T_wc = np.concatenate([R, t[:, None]], 1)
            self.add_prior_frame(img, depth, T_wc)
            n += 1
        return n

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, timestamp: float) -> None:
        """Buffer/align (reference Relocalization::Run :100-170)."""
        m = self.atlas.current
        if self.T_prior_from_live is None:
            mature = m.imu_ba2 or m.n_kf >= 10   # reference gates on BA2
            if mature and self.prior_frames:
                self._try_align(kf)
        if self.T_prior_from_live is not None:
            T = self.T_prior_from_live
            # pose of the KF camera in the prior world
            R_cw = m.kf_pose_cw[kf, :, :3]
            t_cw = m.kf_pose_cw[kf, :, 3]
            R_wc = R_cw.T
            p_wc = -R_wc @ t_cw
            R_p = T[:, :3] @ R_wc
            p_p = T[:, :3] @ p_wc + T[:, 3]
            self.relocalized_poses[float(timestamp)] = np.concatenate(
                [R_p, p_p[:, None]], 1)

    def _try_align(self, kf: int) -> None:
        m = self.atlas.current
        _, bow = self._bow_pipeline(jnp.asarray(m.kf_feat_desc[kf]),
                                    jnp.asarray(m.kf_feat_valid[kf]))
        bow = np.asarray(bow)
        scores = np.array([1.0 - 0.5 * np.abs(bow - p.bow).sum()
                           for p in self.prior_frames])
        top = np.argsort(-scores)[:3]    # reference keeps top-3 :117-127
        for pi in top:
            prior = self.prior_frames[pi]
            d_live = M.unpack_u32_to_pm1(jnp.asarray(m.kf_feat_desc[kf]))
            d_prior = M.unpack_u32_to_pm1(jnp.asarray(prior.desc_packed))
            dist = M.hamming_matrix(d_live, d_prior)
            idx, ok = M.match_nn_ratio(
                dist, jnp.asarray(m.kf_feat_valid[kf]),
                jnp.asarray(prior.valid & prior.has_depth), None,
                max_dist=60.0, ratio=0.75)   # reference ratio 0.75
            ok_np = np.asarray(ok)
            if ok_np.sum() < 15:
                continue
            idx_np = np.asarray(idx)
            fsel = np.nonzero(ok_np)[0]
            cap = 512
            uv_p = np.zeros((cap, 2), np.float32)
            X_p = np.zeros((cap, 3), np.float32)
            vmask = np.zeros(cap, bool)
            nv = min(len(fsel), cap)
            uv_p[:nv] = m.kf_feat_uv[kf][fsel[:nv]]
            X_p[:nv] = prior.xyz_w[idx_np[fsel[:nv]]]
            vmask[:nv] = True
            self._key, sub = jax.random.split(self._key)
            R, t, inl, n = PNP.pnp_ransac(self.K, jnp.asarray(uv_p),
                                          jnp.asarray(X_p),
                                          jnp.asarray(vmask), sub)
            if int(n) < 12:
                continue
            # bearing-vector GN refine of the alignment pose (the
            # reference scaffolds this as R_Optimizer::R_PoseOptimization,
            # src/Relocalization/R_Optimizer.cpp:9-88, call commented at
            # Relocalization.cpp:143 — enabled here)
            R, t, inl, n = PNP.mlpnp_refine(self.K, jnp.asarray(uv_p),
                                            jnp.asarray(X_p), inl, R, t)
            if int(n) < 12:
                continue
            # camera pose in prior world
            R_cw_p = np.asarray(R)
            t_cw_p = np.asarray(t)
            R_wc_p = R_cw_p.T
            p_wc_p = -R_wc_p @ t_cw_p
            # live camera pose
            R_cw_l = m.kf_pose_cw[kf, :, :3]
            t_cw_l = m.kf_pose_cw[kf, :, 3]
            R_wc_l = R_cw_l.T
            p_wc_l = -R_wc_l @ t_cw_l
            # T_prior_from_live = T_wc_prior o T_cw_live
            R_T = R_wc_p @ R_cw_l
            t_T = R_wc_p @ t_cw_l + p_wc_p
            self.T_prior_from_live = np.concatenate(
                [R_T, t_T[:, None]], 1).astype(np.float32)
            return

    # ------------------------------------------------------------------
    def save_trajectory(self, path: str) -> None:
        """reference System::SaveKeyFrameTrajectoryByRelocalization
        (src/System.cc:959)."""
        from ..io import trajectory as TIO
        ts = np.asarray(sorted(self.relocalized_poses.keys()))
        pos, quat = [], []
        for t in ts:
            T = self.relocalized_poses[float(t)]
            pos.append(T[:, 3])
            quat.append(np.asarray(lie.rot_to_quat(
                jnp.asarray(T[:, :3], jnp.float32))))
        TIO.write_tum(path, TIO.Trajectory(
            ts, np.asarray(pos), np.asarray(quat)))
