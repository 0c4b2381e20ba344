"""Local mapping back-end (host orchestration over jitted kernels).

Re-design of `LocalMapping` (reference: src/LocalMapping.cc, 2627 LoC):
per new keyframe — point culling, new-point triangulation against the
best covisible keyframes, duplicate fusion, windowed local BA, keyframe
culling.  The reference runs this on its own thread; here it is a
`process_keyframe` step the executor calls (synchronously in tests,
overlapped via the host executor in models/system.py).

Call parity (reference file:line):
  cull_points         <- MapPointCulling        src/LocalMapping.cc:645
  create_new_points   <- CreateNewMapPoints     :724
  local_ba            <- BA dispatch in Run_Lines :346-388
  cull_keyframes      <- KeyFrameCullingWithLines :1720
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..config import SystemConfig
from ..solver.residuals import PinholeK
from . import kernels as KN
from .mapstore import MapStore, Atlas, INVALID


class LocalMapper:
    def __init__(self, cfg: SystemConfig, atlas: Atlas, n_feat: int,
                 ba_kf_cap: int = 16, ba_pt_cap: int = 4096,
                 ba_obs_cap: int = 8192, tri_cap: Optional[int] = None):
        self.cfg = cfg
        self.atlas = atlas
        self.n_feat = n_feat
        cam = cfg.camera
        self.K = PinholeK(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        self.ba_kf_cap = ba_kf_cap
        self.ba_pt_cap = ba_pt_cap
        self.ba_obs_cap = ba_obs_cap
        tri_cap = tri_cap or n_feat
        self.epi_match = KN.make_epipolar_matcher(self.K, n_feat)
        self.triangulate = KN.make_triangulator(self.K, tri_cap)
        self.local_ba_kernel = KN.make_local_ba(
            self.K, ba_kf_cap, ba_pt_cap, ba_obs_cap)
        self.recent_pts: List[np.ndarray] = []  # per-KF batches for culling

    @property
    def map(self) -> MapStore:
        return self.atlas.current

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int) -> None:
        self.cull_points()
        self.create_new_points(kf)
        self.local_ba(kf)
        self.map.change_index += 1

    # ------------------------------------------------------------------
    def cull_points(self) -> None:
        """found/visible ratio < 0.25 or too few observations after a few
        KFs (reference MapPointCulling, src/LocalMapping.cc:645)."""
        m = self.map
        if len(self.recent_pts) < 3:
            return
        batch = self.recent_pts.pop(0)
        batch = batch[m.pt_valid[batch]]
        if len(batch) == 0:
            return
        ratio = m.pt_found[batch] / np.maximum(m.pt_visible[batch], 1)
        bad = (ratio < 0.25) | (m.pt_n_obs[batch] < 2)
        if bad.any():
            m.remove_point(batch[bad])

    # ------------------------------------------------------------------
    def create_new_points(self, kf: int) -> None:
        """Triangulate unmatched features of `kf` against its best
        covisible keyframes (reference CreateNewMapPoints,
        src/LocalMapping.cc:724: 10 best neighbors, baseline/median-depth
        gate, epipolar search, DLT)."""
        m = self.map
        neighbors = m.covisible_kfs(kf, n=10, min_weight=5)
        pose2 = jnp.asarray(m.kf_pose_cw[kf])
        uv2 = jnp.asarray(m.kf_feat_uv[kf])
        d2 = jnp.asarray(m.kf_feat_desc[kf])
        free2 = m.kf_feat_valid[kf] & (m.kf_match_pt[kf] == INVALID)
        created = []
        C2 = -m.kf_pose_cw[kf, :, :3].T @ m.kf_pose_cw[kf, :, 3]

        for nb in neighbors:
            if not m.kf_valid[nb]:
                continue
            # baseline / median depth gate
            C1 = -m.kf_pose_cw[nb, :, :3].T @ m.kf_pose_cw[nb, :, 3]
            baseline = np.linalg.norm(C2 - C1)
            med_depth = self._median_depth(nb)
            if med_depth <= 0 or baseline / med_depth < 0.01:
                continue
            free1 = m.kf_feat_valid[nb] & (m.kf_match_pt[nb] == INVALID)
            idx2, ok = self.epi_match(
                jnp.asarray(m.kf_pose_cw[nb]), pose2,
                jnp.asarray(m.kf_feat_uv[nb]), jnp.asarray(m.kf_feat_desc[nb]),
                jnp.asarray(free1), uv2, d2, jnp.asarray(free2))
            ok_np = np.asarray(ok)
            if ok_np.sum() == 0:
                continue
            idx2_np = np.asarray(idx2)
            uv_a = m.kf_feat_uv[nb]
            uv_b = m.kf_feat_uv[kf][idx2_np]
            Xw, good = self.triangulate(
                jnp.asarray(m.kf_pose_cw[nb]), pose2,
                jnp.asarray(uv_a), jnp.asarray(uv_b), ok)
            good_np = np.asarray(good)
            if good_np.sum() == 0:
                continue
            f1_ids = np.nonzero(good_np)[0]
            f2_ids = idx2_np[good_np]
            # avoid double-binding a feature in kf
            fresh = m.kf_match_pt[kf][f2_ids] == INVALID
            f1_ids, f2_ids = f1_ids[fresh], f2_ids[fresh]
            if len(f1_ids) == 0:
                continue
            pts = m.alloc_points(len(f1_ids))
            n_new = len(pts)
            f1_ids, f2_ids = f1_ids[:n_new], f2_ids[:n_new]
            m.pt_xyz[pts] = np.asarray(Xw)[f1_ids[:n_new]]
            m.pt_desc[pts] = m.kf_feat_desc[kf][f2_ids]
            m.pt_first_kf[pts] = kf
            m.pt_n_obs[pts] = 2
            m.pt_found[pts] = 2
            m.pt_visible[pts] = 2
            m.kf_match_pt[nb, f1_ids] = pts
            m.kf_match_pt[kf, f2_ids] = pts
            free2 = m.kf_feat_valid[kf] & (m.kf_match_pt[kf] == INVALID)
            created.append(pts)
        if created:
            self.recent_pts.append(np.concatenate(created))
            m.update_covisibility(kf)

    def _median_depth(self, kf: int) -> float:
        m = self.map
        pts = m.kf_match_pt[kf]
        pts = pts[pts >= 0]
        if len(pts) == 0:
            return -1.0
        X = m.pt_xyz[pts]
        R, t = m.kf_pose_cw[kf, :, :3], m.kf_pose_cw[kf, :, 3]
        z = (R @ X.T).T[:, 2] + t[2]
        return float(np.median(z))

    # ------------------------------------------------------------------
    def local_ba(self, kf: int) -> None:
        """Windowed BA: covisible KFs free, their observers fixed, points
        Schur-eliminated (reference LocalBundleAdjustment,
        src/Optimizer.cc:4851)."""
        m = self.map
        window = m.covisible_kfs(kf, n=self.ba_kf_cap - 6, min_weight=5)
        window = np.concatenate([[kf], window[m.kf_valid[window]]])
        window = window[:self.ba_kf_cap]
        in_window = np.zeros(m.max_kf, bool)
        in_window[window] = True

        # points seen by the window
        pt_ids = np.unique(m.kf_match_pt[window])
        pt_ids = pt_ids[pt_ids >= 0]
        pt_ids = pt_ids[m.pt_valid[pt_ids]][:self.ba_pt_cap]
        pt_slot = np.full(m.max_pts, -1, np.int32)
        pt_slot[pt_ids] = np.arange(len(pt_ids))

        # fixed KFs: observers of those points outside the window
        obs_rows = []
        fixed = []
        kf_slot = np.full(m.max_kf, -1, np.int32)
        slots = list(window)
        for i, w in enumerate(window):
            kf_slot[w] = i
        for other in m.valid_kf_indices():
            if in_window[other]:
                continue
            shared = np.isin(m.kf_match_pt[other], pt_ids) \
                & (m.kf_match_pt[other] >= 0)
            if shared.sum() > 0 and len(slots) < self.ba_kf_cap:
                kf_slot[other] = len(slots)
                slots.append(other)
                fixed.append(other)
        slots = np.asarray(slots)

        # gauge: always fix at least the oldest KF in the system
        free_mask = np.zeros(self.ba_kf_cap, bool)
        free_mask[:len(window)] = True
        if len(fixed) == 0:
            # fix the oldest window KF for gauge
            oldest = np.argmin(m.kf_timestamp[window])
            free_mask[oldest] = False

        # observation table
        obs_kf, obs_pt, obs_uv, obs_is2 = [], [], [], []
        for s, kfi in enumerate(slots):
            match = m.kf_match_pt[kfi]
            feat = np.nonzero((match >= 0) & np.isin(match, pt_ids))[0]
            obs_kf.append(np.full(len(feat), s, np.int32))
            obs_pt.append(pt_slot[match[feat]])
            obs_uv.append(m.kf_feat_uv[kfi, feat])
            obs_is2.append(1.0 / 1.2 ** (2.0 * m.kf_feat_octave[kfi, feat]))
        obs_kf = np.concatenate(obs_kf)[:self.ba_obs_cap]
        obs_pt = np.concatenate(obs_pt)[:self.ba_obs_cap]
        obs_uv = np.concatenate(obs_uv)[:self.ba_obs_cap]
        obs_is2 = np.concatenate(obs_is2)[:self.ba_obs_cap]
        n_obs = len(obs_kf)

        def pad(a, cap, fill=0):
            out = np.full((cap,) + a.shape[1:], fill, a.dtype)
            out[:len(a)] = a
            return out

        kf_poses = np.tile(np.eye(3, 4, dtype=np.float32), (self.ba_kf_cap, 1, 1))
        kf_poses[:len(slots)] = m.kf_pose_cw[slots]
        pt_xyz = np.zeros((self.ba_pt_cap, 3), np.float32)
        pt_xyz[:len(pt_ids)] = m.pt_xyz[pt_ids]
        pt_free = np.zeros(self.ba_pt_cap, bool)
        pt_free[:len(pt_ids)] = True

        new_poses, new_pts, inlier = self.local_ba_kernel(
            jnp.asarray(kf_poses), jnp.asarray(free_mask),
            jnp.asarray(pt_xyz), jnp.asarray(pt_free),
            jnp.asarray(pad(obs_kf, self.ba_obs_cap)),
            jnp.asarray(pad(obs_pt, self.ba_obs_cap)),
            jnp.asarray(pad(obs_uv, self.ba_obs_cap)),
            jnp.asarray(pad(np.ones(n_obs, bool), self.ba_obs_cap, False)),
            jnp.asarray(pad(obs_is2.astype(np.float32), self.ba_obs_cap)))

        new_poses = np.asarray(new_poses)
        new_pts = np.asarray(new_pts)
        m.kf_pose_cw[slots[free_mask[:len(slots)]]] = \
            new_poses[:len(slots)][free_mask[:len(slots)]]
        m.pt_xyz[pt_ids] = new_pts[:len(pt_ids)]

        # drop observations judged outliers by the BA
        inlier_np = np.asarray(inlier)[:n_obs]
        bad = ~inlier_np
        if bad.any():
            for s, kfi in enumerate(slots):
                sel = (obs_kf == s) & bad
                if sel.any():
                    # find features bound to these points and unbind
                    bad_pts = pt_ids[obs_pt[sel]]
                    match = m.kf_match_pt[kfi]
                    unbind = np.isin(match, bad_pts)
                    m.kf_match_pt[kfi, unbind] = INVALID
                    m.pt_n_obs[bad_pts] -= 1
        # points left with <2 obs are bad
        orphan = pt_ids[m.pt_n_obs[pt_ids] < 2]
        if len(orphan):
            m.remove_point(orphan)

    # ------------------------------------------------------------------
    def cull_keyframes(self, kf: int) -> None:
        """Remove window KFs whose points are ≥90% seen by ≥3 other KFs
        (reference KeyFrameCullingWithLines, src/LocalMapping.cc:1720)."""
        m = self.map
        for cand in m.covisible_kfs(kf, n=10, min_weight=5):
            if not m.kf_valid[cand] or cand == kf:
                continue
            pts = m.kf_match_pt[cand]
            pts = pts[pts >= 0]
            if len(pts) < 10:
                continue
            redundant = (m.pt_n_obs[pts] >= 4).mean()
            if redundant > 0.9:
                m.remove_keyframe(cand)
