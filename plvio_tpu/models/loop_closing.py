"""Loop closing: detection, Sim3 verification, correction, pose graph.

Re-design of `LoopClosing` (reference: src/LoopClosing.cc, 4246 LoC):
per new keyframe — BoW candidate retrieval excluding the covisible group,
temporal consistency voting, Sim3 RANSAC verification on matched map
points, then CorrectLoop: propagate the correcting similarity over the
current covisible window, fuse duplicated points, optimize the essential
graph (Sim3 pose graph over spanning-tree + covisibility + loop edges),
and run a global BA (reference: NewDetectCommonRegions :460,
DetectCommonRegionsFromBoW :756, CorrectLoopWithLines :1212,
RunGlobalBundleAdjustmentWithLines :3685).

Atlas map MERGE (reference MergeLocal :2448) reuses the same machinery:
when the candidate lives in another map, the correcting Sim3 re-expresses
the current (smaller) map into the candidate map's frame and the two
stores are concatenated.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import matching as M
from ..ops import pnp as PNP
from ..solver.residuals import PinholeK
from ..utils import lie
from . import kernels as KN
from .kfdb import KeyFrameDatabase
from .mapstore import Atlas, MapStore, INVALID


class LoopCloser:
    def __init__(self, cfg: SystemConfig, atlas: Atlas,
                 kfdb: KeyFrameDatabase, n_feat: int,
                 pg_kf_cap: int = 512, pg_edge_cap: int = 4096,
                 gba_obs_cap: int = 32768):
        self.cfg = cfg
        self.atlas = atlas
        self.kfdb = kfdb
        self.n_feat = n_feat
        cam = cfg.camera
        self.K = PinholeK(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        # KB8: global BA also runs the native lens on raw pixels (same
        # dispatch as LocalMapper; reference projects every optimizer
        # edge through GeometricCamera)
        self.kb8 = None
        self.ba_K = self.K
        if cam.model == "kb8":
            from ..solver.residuals import KB8K
            d = tuple(cam.dist) + (0.0,) * 4
            self.kb8 = KB8K(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                            k1=d[0], k2=d[1], k3=d[2], k4=d[3])
            self.ba_K = self.kb8
        self.pg_kf_cap = pg_kf_cap
        self.pg_edge_cap = pg_edge_cap
        self.pose_graph = KN.make_pose_graph_optimizer(pg_kf_cap, pg_edge_cap)
        self.pose_graph_4dof = KN.make_pose_graph_optimizer(
            pg_kf_cap, pg_edge_cap, four_dof=True)
        # GBA reuses the local-BA kernel at global capacities
        self.gba_kernel = None  # built lazily (big compile)
        self.gba_pl_kernel = None  # point+line GBA, lazily built
        self._gba_caps = (128, 8192, gba_obs_cap)
        self.mapper = None      # wired by System for inertial full BA
        self.consistency: List[tuple] = []   # (candidate_group, votes)
        self.merge_votes = {}                # map_id -> consecutive hits
        self.pending_merge = None            # set after a merge, popped by System
        self._key = jax.random.PRNGKey(cfg.seed + 7)
        self.n_loops_closed = 0
        self.n_maps_merged = 0
        # candidates that recently failed Sim3 verification:
        # {kf_id: remaining_ttl_inserts}
        self._failed_cands: dict = {}
        # accumulated loop edges per map (reference sLoopEdges via
        # KeyFrame::AddLoopEdge, kept in every later essential graph —
        # src/Optimizer.cc:7049 inserts them ahead of covis edges)
        self._loop_edges: dict = {}     # map_id -> list[(kf, cand)]

    @property
    def map(self) -> MapStore:
        return self.atlas.current

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int) -> bool:
        """Returns True if a loop was closed or a map merge performed."""
        m = self.map
        # merge detection against other Atlas maps runs even on a young
        # active map (that is exactly the post-loss recovery situation,
        # reference NewDetectCommonRegions merge branch :94-133)
        if m.n_kf >= 5 and self._try_merge(kf):
            return True
        if m.n_kf < 12:   # reference guard (src/LoopClosing.cc:473)
            return False
        cand = self._detect(kf)
        if cand is None:
            return False
        ok, s, R, t = self._verify_sim3(kf, cand)
        if not ok:
            # a candidate whose covisibility group failed geometric
            # verification goes on COOLDOWN for a few keyframes (the
            # reference discards failed candidates per round while the
            # consistency groups keep accumulating,
            # src/LoopClosing.cc:640): without it, a self-similar hall
            # keeps re-running Sim3 RANSAC on the same aliased area
            # EVERY keyframe — measured 4.7 s/KF, half the whole
            # circuit's runtime.  Votes are NOT reset, so a genuine
            # revisit that follows a false alarm still fires.
            self._cooldown_group(cand)
            return False
        ok, s, R, t = self._inertial_gate(s, R, t, m)
        if not ok:
            self._cooldown_group(cand)
            return False
        self._correct_loop(kf, cand, s, R, t)
        self.n_loops_closed += 1
        return True

    # ------------------------------------------------------------------
    def _try_merge(self, kf: int) -> bool:
        """Cross-map candidate sweep + 2-vote consistency + Sim3 verify +
        merge (reference merge branch of Run_Lines, src/LoopClosing.cc:
        94-133 -> MergeLocalWithLines :1714 / MergeLocal :2448)."""
        if not hasattr(self.kfdb, "query_other_maps"):
            return False
        m = self.map
        if len(self.atlas.maps) < 2:
            return False
        cands = self.kfdb.query_other_maps(
            m.kf_feat_desc[kf], m.kf_feat_valid[kf], m.map_id, top_n=3)
        hit_maps = {mid for mid, _, _ in cands}
        self.merge_votes = {mid: self.merge_votes.get(mid, 0) + 1
                            for mid in hit_maps}
        if os.environ.get("PLVIO_TRACE") and cands:
            cc = [f"m{mid}/kf{c}:{s:.3f}" for mid, c, s in cands]
            print(f"[merge] kf={kf} cands={cc} "
                  f"votes={dict(self.merge_votes)}", flush=True)
        for mid, cand, score in cands:
            if self.merge_votes.get(mid, 0) < 2:
                continue
            m_old = next(mm for mm in self.atlas.maps if mm.map_id == mid)
            ok, s, R, t = self._verify_sim3(kf, cand, m2=m_old)
            if os.environ.get("PLVIO_TRACE"):
                print(f"[merge] kf={kf} verify vs m{mid}/kf{cand}: "
                      f"{'OK' if ok else 'REJECT'}", flush=True)
            if not ok:
                continue
            if m.imu_initialized and m_old.imu_initialized:
                ok, s, R, t = self._inertial_gate(s, R, t, m)
                if not ok:
                    continue
            self._merge_maps(kf, cand, m_old, s, R, t)
            self.merge_votes = {}
            self.n_maps_merged += 1
            return True
        return False

    def _cooldown_group(self, cand: int) -> None:
        # candidate-level (NOT whole-covis-group) cooldown: on small
        # dense maps neighbouring groups overlap heavily and a group
        # ban can suppress the genuine revisit right after one false
        # alarm
        self._failed_cands[int(cand)] = 8

    # ------------------------------------------------------------------
    def _detect(self, kf: int) -> Optional[int]:
        """BoW retrieval excluding the covisible group + 3-vote temporal
        consistency (reference NewDetectCommonRegions:499-564)."""
        m = self.map
        exclude = np.zeros(m.max_kf, bool)
        exclude[kf] = True
        covis_group = np.nonzero(m.covis[kf] >= 15)[0]
        exclude[covis_group] = True
        # also exclude the temporal neighborhood
        chain = m.kf_chain()
        pos = np.nonzero(chain == kf)[0]
        if len(pos):
            lo = max(0, int(pos[0]) - 10)
            exclude[chain[lo:]] = True
        cands, scores = self.kfdb.query_grouped(
            m.kf_feat_desc[kf], m.kf_feat_valid[kf], m.covis, m.kf_valid,
            exclude=exclude, top_n=3,
            line_desc=m.kf_line_desc[kf] if self.cfg.use_lines else None,
            line_valid=m.kf_line_valid[kf] if self.cfg.use_lines else None)
        if os.environ.get("PLVIO_TRACE"):
            cc = [f"{int(c)}:{s:.3f}" for c, s in zip(cands, scores)]
            nv = max((v for _, v in self.consistency), default=0)
            print(f"[loop] kf={kf} n_excl={int(exclude.sum())} "
                  f"cands={cc} votes={nv}", flush=True)
        if len(cands) == 0:
            self.consistency = []
            return None
        # temporal consistency: the same covisibility group must be
        # retrieved for 3 consecutive KFs
        # age out verification cooldowns (one tick per detector call)
        self._failed_cands = {c: ttl - 1
                              for c, ttl in self._failed_cands.items()
                              if ttl > 1}
        new_consistency = []
        fired = None
        for c in cands:
            group = set(np.nonzero(m.covis[c] >= 15)[0].tolist()) | {int(c)}
            votes = 1
            for prev_group, prev_votes in self.consistency:
                if group & prev_group:
                    votes = prev_votes + 1
                    break
            new_consistency.append((group, votes))
            cooled = int(c) in self._failed_cands
            if votes >= 3 and fired is None and not cooled:
                fired = int(c)
        self.consistency = new_consistency
        return fired

    # ------------------------------------------------------------------
    @staticmethod
    def _vtrace(kf, cand, why):
        if os.environ.get("PLVIO_TRACE"):
            print(f"[sim3] kf={kf} cand={cand} REJECT {why}", flush=True)

    def _verify_sim3(self, kf: int, cand: int, m2: MapStore = None):
        """Match map points of kf (current map) vs cand (same map, or m2
        for merge) by descriptor, robust Sim3 (reference: Sim3Solver
        RANSAC + SearchBySim3).  Returned (s, R, t) maps current-map
        coords into cand's map: X2 ~ s R X1 + t."""
        m = self.map
        if m2 is None:
            m2 = m
        def kf_points(store, k):
            match = store.kf_match_pt[k]
            feat = np.nonzero(match >= 0)[0]
            return feat, match[feat]
        f1, p1 = kf_points(m, kf)
        f2, p2 = kf_points(m2, cand)
        if len(f1) < 20 or len(f2) < 20:
            self._vtrace(kf, cand, f"few-bound {len(f1)}/{len(f2)}")
            return False, None, None, None
        d1 = M.unpack_u32_to_pm1(jnp.asarray(m.kf_feat_desc[kf][f1]))
        d2 = M.unpack_u32_to_pm1(jnp.asarray(m2.kf_feat_desc[cand][f2]))
        dist = M.hamming_matrix(d1, d2)
        idx, ok = M.match_nn_ratio(dist, jnp.ones(len(f1), bool),
                                   jnp.ones(len(f2), bool), None,
                                   max_dist=60.0, ratio=0.85)
        ok_np = np.asarray(ok)
        if ok_np.sum() < 15:
            self._vtrace(kf, cand, f"few-matches {int(ok_np.sum())}")
            return False, None, None, None
        idx_np = np.asarray(idx)
        X1 = m.pt_xyz[p1[ok_np]]                      # drifted (current)
        X2 = m2.pt_xyz[p2[idx_np[ok_np]]]             # old (loop side)
        pad = 256
        Xp1 = np.zeros((pad, 3), np.float32)
        Xp2 = np.zeros((pad, 3), np.float32)
        nv = min(len(X1), pad)
        Xp1[:nv] = X1[:nv]
        Xp2[:nv] = X2[:nv]
        valid = np.zeros(pad, bool)
        valid[:nv] = True
        self._key, sub = jax.random.split(self._key)
        fix_scale = self.cfg.sensor in (1, 2, 4) or m.imu_initialized
        s, R, t, inl, n = PNP.sim3_ransac(
            jnp.asarray(Xp1), jnp.asarray(Xp2), jnp.asarray(valid), sub,
            th=0.08, fix_scale=fix_scale)
        if int(n) < 12:
            self._vtrace(kf, cand, f"ransac-inliers {int(n)}")
            return False, None, None, None
        s = float(s)
        if not (0.5 < s < 2.0):   # scale sanity (reference :96-106)
            self._vtrace(kf, cand, f"scale {s:.2f}")
            return False, None, None, None
        # guided refinement: grow correspondences under the RANSAC
        # similarity and refit (reference iterates SearchBySim3
        # src/ORBmatcher.cc:1962 + OptimizeSim3 src/Optimizer.cc:8462
        # before accepting a loop/merge)
        s, R, t, n_ref = self._refine_sim3_guided(
            kf, cand, m2, s, np.asarray(R), np.asarray(t), fix_scale)
        if n_ref < 20:
            self._vtrace(kf, cand, f"refine-inliers {n_ref}")
            return False, None, None, None
        if not (0.5 < s < 2.0):
            self._vtrace(kf, cand, f"refine-scale {s:.2f}")
            return False, None, None, None
        # final polish on 2D reprojections in both frames (reference
        # OptimizeSim3, src/Optimizer.cc:8462) — falls back to the 3D-3D
        # estimate when the image-space matching is too thin, so it
        # cannot reject a loop the 3D verification accepted
        s, R, t = self._refine_sim3_reproj(kf, cand, m2, s,
                                           np.asarray(R), np.asarray(t),
                                           fix_scale)
        if not (0.5 < s < 2.0):
            return False, None, None, None
        return True, s, np.asarray(R), np.asarray(t)

    def _refine_sim3_reproj(self, kf: int, cand: int, m2: MapStore,
                            s: float, R: np.ndarray, t: np.ndarray,
                            fix_scale: bool, cap: int = 256):
        """Optimize the welding Sim3 on 2D reprojection residuals in both
        keyframes (reference OptimizeSim3 src/Optimizer.cc:8462:
        EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ pairs with chi2
        gating).  Pairs are the descriptor-matched bound points of the
        two KFs, 3D-gated under the current (already 3D-refined)
        similarity.  Returns the refined (s, R, t), or the inputs when
        matching is too thin or the optimization rejects too much."""
        m = self.map

        def side(store, k):
            match = store.kf_match_pt[k]
            feat = np.nonzero(match >= 0)[0]
            pts = match[feat]
            keep = store.pt_valid[pts]
            return feat[keep], pts[keep]

        f1, p1 = side(m, kf)
        f2, p2 = side(m2, cand)
        if len(f1) < 15 or len(f2) < 15:
            return s, R, t
        d1 = M.unpack_u32_to_pm1(jnp.asarray(m.kf_feat_desc[kf][f1]))
        d2 = M.unpack_u32_to_pm1(jnp.asarray(m2.kf_feat_desc[cand][f2]))
        ham = np.asarray(M.hamming_matrix(d1, d2))
        X1_all = m.pt_xyz[p1].astype(np.float64)
        X2_all = m2.pt_xyz[p2].astype(np.float64)
        # scene-scaled 3D gate under the current similarity (S is good
        # after the guided refit; the gate only prunes gross mismatches)
        Y = s * X1_all @ R.T + t
        dist2 = ((Y ** 2).sum(1)[:, None] + (X2_all ** 2).sum(1)[None]
                 - 2.0 * Y @ X2_all.T)
        R_cw = m.kf_pose_cw[kf, :, :3]
        c_w = -R_cw.T @ m.kf_pose_cw[kf, :, 3]
        scene = float(np.median(np.linalg.norm(X1_all - c_w, axis=1)))
        if not np.isfinite(scene) or scene <= 0:
            scene = 5.0
        gate = (0.05 * scene) ** 2
        cost = np.where((dist2 < gate) & (ham <= 60.0), ham + dist2, np.inf)
        j = cost.argmin(1)
        ok = np.isfinite(cost[np.arange(len(f1)), j])
        i_back = cost.argmin(0)
        ok &= i_back[j] == np.arange(len(f1))
        n_pairs = int(ok.sum())
        if n_pairs < 15:
            return s, R, t
        sel1 = np.nonzero(ok)[0][:cap]
        sel2 = j[sel1]

        key = (bool(fix_scale),)
        if not hasattr(self, "_sim3_reproj_kernels"):
            self._sim3_reproj_kernels = {}
        if key not in self._sim3_reproj_kernels:
            self._sim3_reproj_kernels[key] = KN.make_sim3_reproj_optimizer(
                self.K, cap, fix_scale=fix_scale)
        opt = self._sim3_reproj_kernels[key]

        def padded(a, dim):
            out = np.zeros((cap, dim), np.float32)
            out[:len(a)] = a
            return jnp.asarray(out)

        nv = len(sel1)
        valid = jnp.asarray(np.arange(cap) < nv)
        # octave-scaled information, like every reprojection term
        is1 = 1.0 / (1.2 ** (2.0 * m.kf_feat_octave[kf][f1[sel1]])) \
            if hasattr(m, "kf_feat_octave") else np.ones(nv)
        is2_ = 1.0 / (1.2 ** (2.0 * m2.kf_feat_octave[cand][f2[sel2]])) \
            if hasattr(m2, "kf_feat_octave") else np.ones(nv)
        S13 = jnp.asarray(np.concatenate(
            [R.reshape(-1), t, [s]]).astype(np.float32))
        S13_out, inl_f, inl_b, n_inl = opt(
            S13,
            padded(X1_all[sel1], 3), padded(m2.kf_feat_uv[cand][f2[sel2]], 2),
            valid, padded(np.asarray(is1)[:, None], 1)[:, 0],
            padded(X2_all[sel2], 3), padded(m.kf_feat_uv[kf][f1[sel1]], 2),
            valid, padded(np.asarray(is2_)[:, None], 1)[:, 0],
            jnp.asarray(m.kf_pose_cw[kf]), jnp.asarray(m2.kf_pose_cw[cand]))
        if int(n_inl) < 20:
            return s, R, t
        out = np.asarray(S13_out)
        R_new = out[:9].reshape(3, 3)
        # re-orthonormalize (7 DoF retraction keeps R in SO(3) only to
        # first order across many steps)
        U, _, Vt = np.linalg.svd(R_new)
        R_new = U @ Vt
        s_new = float(out[12])
        if not np.isfinite(s_new) or not np.isfinite(out).all():
            return s, R, t
        return s_new, R_new.astype(np.float64), out[9:12].astype(np.float64)

    @staticmethod
    def _umeyama(X1: np.ndarray, X2: np.ndarray,
                 fix_scale: bool = False):
        """Horn/Umeyama closed-form similarity X2 ~ s R X1 + t — the
        alignment core that OptimizeSim3 (src/Optimizer.cc:8462) reaches
        iteratively on reprojection residuals."""
        mu1, mu2 = X1.mean(0), X2.mean(0)
        A = (X2 - mu2).T @ (X1 - mu1) / len(X1)
        U, D, Vt = np.linalg.svd(A)
        Sg = np.eye(3)
        if np.linalg.det(U) * np.linalg.det(Vt) < 0:
            Sg[2, 2] = -1
        R = U @ Sg @ Vt
        if fix_scale:
            s = 1.0
        else:
            var1 = np.mean(np.sum((X1 - mu1) ** 2, -1))
            s = float((D * Sg.diagonal()).sum() / max(var1, 1e-12))
        t = mu2 - s * R @ mu1
        return s, R, t

    def _refine_sim3_guided(self, kf: int, cand: int, m2: MapStore,
                            s: float, R: np.ndarray, t: np.ndarray,
                            fix_scale: bool, cap: int = 1024):
        """Grow 3D-3D map-point correspondences between the two sides
        under the current similarity (guided search: 3D gate that
        shrinks each round — the projection-window analog of
        SearchBySim3) and refit the similarity on the grown inlier set.
        Returns (s, R, t, n_inliers)."""
        m = self.map

        def side_points(store, k):
            win = np.unique(np.concatenate(
                [[k], store.covisible_kfs(k, n=5, min_weight=5)]))
            win = win[store.kf_valid[win]]
            ids = np.unique(store.kf_match_pt[win])
            ids = ids[ids >= 0]
            ids = ids[store.pt_valid[ids]]
            return ids[:cap]

        p1 = side_points(m, kf)
        p2 = side_points(m2, cand)
        if len(p1) < 10 or len(p2) < 10:
            return s, R, t, 0
        # fixed-shape pad (one compiled Hamming matmul for every loop
        # candidate); padded rows sit at 1e6 so the 3D gate kills them
        d1p = np.zeros((cap, 8), np.uint32)
        d2p = np.full((cap, 8), 0xFFFFFFFF, np.uint32)
        d1p[:len(p1)] = m.pt_desc[p1]
        d2p[:len(p2)] = m2.pt_desc[p2]
        X1 = np.full((cap, 3), 1e6, np.float64)
        X2 = np.full((cap, 3), -1e6, np.float64)
        X1[:len(p1)] = m.pt_xyz[p1]
        X2[:len(p2)] = m2.pt_xyz[p2]
        ham = np.asarray(M.hamming_matrix(
            M.unpack_u32_to_pm1(jnp.asarray(d1p)),
            M.unpack_u32_to_pm1(jnp.asarray(d2p))))[:len(p1), :len(p2)]
        X1, X2 = X1[:len(p1)], X2[:len(p2)]
        n_inl = 0
        # Gate radii are fractions of the scene scale (median landmark
        # distance from the query KF), not absolute map units: a
        # monocular map before IMU init has arbitrary scale, and fixed
        # metric radii would reject loops the Sim3 RANSAC already
        # verified.  10%/5%/2.4% of a typical 5 m indoor scene depth
        # reproduces the old 0.5/0.25/0.12 m gates (the reference's
        # SearchBySim3 gates in image space with octave-scaled windows,
        # src/ORBmatcher.cc, which is likewise scale-free).
        R_cw = m.kf_pose_cw[kf, :, :3]
        t_cw = m.kf_pose_cw[kf, :, 3]
        c_w = -R_cw.T @ t_cw
        scene = float(np.median(np.linalg.norm(X1 - c_w, axis=1)))
        if not np.isfinite(scene) or scene <= 0:
            scene = 5.0
        for frac in (0.10, 0.05, 0.024):
            radius = frac * scene
            Y = s * X1 @ R.T + t
            d2 = ((Y ** 2).sum(1)[:, None] + (X2 ** 2).sum(1)[None]
                  - 2.0 * Y @ X2.T)
            cost = np.where((d2 < radius * radius) & (ham <= 60.0),
                            ham + d2, np.inf)
            j = cost.argmin(1)
            ok = np.isfinite(cost[np.arange(len(p1)), j])
            # mutual consistency
            i_back = cost.argmin(0)
            ok &= i_back[j] == np.arange(len(p1))
            if ok.sum() < 10:
                return s, R, t, int(ok.sum())
            sel1, sel2 = np.nonzero(ok)[0], j[ok]
            s, R, t = self._umeyama(X1[sel1], X2[sel2], fix_scale)
            n_inl = int(ok.sum())
        return float(s), R, t, n_inl

    # ------------------------------------------------------------------
    def _inertial_gate(self, s, R, t, m: MapStore):
        """Inertial loop/merge corrections must be gravity-consistent:
        the world-to-world correction may only rotate about gravity
        (yaw); roll/pitch drift would contradict the IMU.  Reject
        corrections with roll/pitch >= 0.008 rad or yaw >= 0.349 rad,
        then — once VIBA2 has pinned scale — force yaw-only with unit
        scale (reference src/LoopClosing.cc:173-198)."""
        if not m.imu_initialized:
            return True, s, R, t
        phi = np.asarray(lie.so3_log(jnp.asarray(R, jnp.float32)))
        if (abs(phi[0]) >= 0.008 or abs(phi[1]) >= 0.008
                or abs(phi[2]) >= 0.349):
            return False, s, R, t
        if m.imu_ba2:
            Ryaw = np.asarray(lie.so3_exp(
                jnp.asarray([0.0, 0.0, float(phi[2])], jnp.float32)))
            return True, 1.0, Ryaw, t
        return True, s, R, t

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, cand: int, s, R, t) -> None:
        """CorrectLoop (reference :1212): apply the correcting similarity
        to the current covisible window (+its points), then optimize the
        full essential graph with the loop edge, then GBA."""
        m = self.map
        # pre-correction poses of EVERY chain KF: the essential graph
        # measures its non-loop edges from these (reference
        # NonCorrectedSim3, src/LoopClosing.cc:1212 + Optimizer.cc:7007 —
        # measuring from post-correction poses would make every edge
        # zero-residual and the pose graph a no-op)
        chain_pre = m.kf_chain()
        pre_poses = {int(k): (m.kf_pose_cw[k, :, :3].copy(),
                              m.kf_pose_cw[k, :, 3].copy())
                     for k in chain_pre}
        # S maps current-frame coords -> loop-frame coords (world drift fix)
        # correct the window around kf: X' = s R X + t
        window = m.covisible_kfs(kf, n=15, min_weight=10)
        window = np.unique(np.concatenate([[kf], window]))
        corr_pts = np.unique(m.kf_match_pt[window])
        corr_pts = corr_pts[corr_pts >= 0]
        corr_pts = corr_pts[m.pt_valid[corr_pts]]
        m.pt_xyz[corr_pts] = (s * (m.pt_xyz[corr_pts] @ R.T) + t).astype(np.float32)
        if m.ln_valid.any():
            corr_lns = np.unique(m.kf_match_ln[window])
            corr_lns = corr_lns[corr_lns >= 0]
            if len(corr_lns):
                ep = m.ln_ep[corr_lns].reshape(-1, 3)
                m.ln_ep[corr_lns] = (s * (ep @ R.T) + t).reshape(-1, 6).astype(np.float32)
        # KF poses re-expressed under the similarity: with X' = sRX + t,
        # T_cw' = [R_cw R^T | s t_cw - R_cw R^T t] keeps every projection
        # fixed (pc' = s pc, projectively identical)
        for k in window:
            R_cw = m.kf_pose_cw[k, :, :3].copy()
            t_cw = m.kf_pose_cw[k, :, 3].copy()
            R_new = R_cw @ R.T
            m.kf_pose_cw[k, :, :3] = R_new
            m.kf_pose_cw[k, :, 3] = s * t_cw - R_new @ t

        # essential graph over all KFs
        self._essential_graph(kf, cand, s, R, t, pre_poses,
                              set(int(k) for k in window))
        self._loop_edges.setdefault(m.map_id, []).append((int(kf),
                                                          int(cand)))
        # global BA from the pose-graph-corrected state (reference
        # RunGlobalBundleAdjustment(WithLines), src/LoopClosing.cc:3685,
        # launched as a transient thread there; synchronous device
        # program here).  Inertial maps use FullInertialBA via the
        # mapper's inertial window kernel instead (src/Optimizer.cc:1921).
        if m.imu_initialized and self.mapper is not None:
            self.mapper.full_inertial_ba()
        else:
            self.run_global_ba(fixed_kf=cand)
        m.change_index += 1

    def _essential_graph(self, kf: int, cand: int, s, R, t,
                         pre_poses: dict, window: set) -> None:
        """Essential-graph optimization after the window weld (reference
        OptimizeEssentialGraph / 4DoF, src/Optimizer.cc:6952 / :14411).

        Measurement semantics (the part that makes the graph DO work):
        spanning-tree/covis/past-loop edges measure relative poses from
        the PRE-correction poses (reference NonCorrectedSim3); the
        corrected window keyframes start at their welded Sim3
        S_pre . S_weld^{-1} (scale 1/s); only the loop-side keyframe is
        fixed.  Within-window and far-field edges are then zero-residual
        while the window-boundary edges carry the accumulated drift,
        which the solve distributes around the loop cycle.

        Maps beyond pg_kf_cap are SUBSAMPLED (every stride-th chain KF +
        the window + loop-edge endpoints); skipped keyframes are
        propagated rigidly from their nearest preceding anchor — the
        pose-graph analog of the reference's spanning-tree propagation
        of corrected poses (src/LoopClosing.cc:1369ff)."""
        m = self.map
        chain_full = m.kf_chain()
        if len(chain_full) < 3:
            return
        s = float(s)
        R_w = np.asarray(R, np.float64)
        t_w = np.asarray(t, np.float64)
        inv_s = 1.0 / max(s, 1e-9)
        past_loops = [e for e in self._loop_edges.get(m.map_id, [])
                      if m.kf_valid[e[0]] and m.kf_valid[e[1]]]

        required = {int(kf), int(cand), int(chain_full[0])} | \
            {int(k) for k in window}
        for a, b in past_loops:
            required |= {a, b}
        required &= {int(k) for k in chain_full}
        if len(chain_full) > self.pg_kf_cap:
            budget = max(self.pg_kf_cap - len(required), 2)
            stride = int(np.ceil(len(chain_full) / budget))
            keep = set(int(k) for k in chain_full[::stride]) | required
            chain = np.asarray([k for k in chain_full if int(k) in keep])
            if len(chain) > self.pg_kf_cap:   # required overlap overflow
                chain = chain[:self.pg_kf_cap]
            print(f"[loop] essential graph subsampled: {len(chain_full)} "
                  f"KFs -> {len(chain)} anchors (cap {self.pg_kf_cap})")
        else:
            chain = chain_full
        n = len(chain)
        slot = {int(k): i for i, k in enumerate(chain)}

        def sim3_state(k):
            Rp, tp = pre_poses[int(k)]
            if int(k) in window:
                Rn = Rp @ R_w.T
                return Rn, tp - inv_s * (Rn @ t_w), inv_s
            return Rp.astype(np.float64), tp.astype(np.float64), 1.0

        states = np.zeros((self.pg_kf_cap, 13), np.float32)
        states[:, :9] = np.eye(3).reshape(-1)
        states[:, 12] = 1.0
        st_cache = {}
        for i, k in enumerate(chain):
            Rk, tk, sk = sim3_state(k)
            st_cache[int(k)] = (Rk, tk, sk)
            states[i] = np.concatenate(
                [np.asarray(Rk).reshape(-1), tk, [sk]]).astype(np.float32)

        edge_i, edge_j, Rjis, tjis, sjis, infos = [], [], [], [], [], []

        def add_edge_pre(a, b, info=1.0):
            """edge (a,b): measurement S_b S_a^{-1} from PRE-correction
            poses (scale 1) — reference computes Sji from
            NonCorrectedSim3 where available, src/Optimizer.cc:7030."""
            Ra, ta = pre_poses[int(a)]
            Rb, tb = pre_poses[int(b)]
            Rba = Rb @ Ra.T
            edge_i.append(slot[int(a)])
            edge_j.append(slot[int(b)])
            Rjis.append(Rba)
            tjis.append(tb - Rba @ ta)
            sjis.append(1.0)
            infos.append(info)

        # temporal chain over the (possibly subsampled) anchors — the
        # spanning-tree backbone
        for i in range(1, n):
            add_edge_pre(chain[i], chain[i - 1])
        # accumulated past loop edges (reference inserts sLoopEdges
        # ahead of covisibility edges, src/Optimizer.cc:7049)
        for a, b in past_loops:
            if a in slot and b in slot:
                add_edge_pre(a, b, info=1.0)
        # covisibility edges, information scaled by covisibility weight
        # (more shared points -> more trustworthy relative pose)
        for i, k in enumerate(chain):
            for other in np.nonzero(m.covis[k] >= 30)[0]:
                if int(other) in slot and slot[int(other)] > i + 1:
                    w_cov = float(m.covis[k, other])
                    add_edge_pre(k, other,
                                 info=float(np.clip(w_cov / 100.0,
                                                    0.3, 1.0)))
                    if len(edge_i) >= self.pg_edge_cap - 1:
                        break
            if len(edge_i) >= self.pg_edge_cap - 1:
                break
        # the current loop edge: S_cand . S_kf'^{-1} between the INITIAL
        # states (zero residual at init — it anchors the corrected
        # window to the fixed loop side while the boundary drift is
        # distributed; reference adds LoopConnections edges from
        # CorrectedSim3, src/Optimizer.cc:7013)
        Rk_, tk_, sk_ = st_cache[int(kf)]
        Rc_, tc_, sc_ = st_cache[int(cand)]
        Ri_ = Rk_.T
        si_ = 1.0 / sk_
        ti_ = -si_ * (Ri_ @ tk_)
        edge_i.append(slot[int(kf)])
        edge_j.append(slot[int(cand)])
        Rjis.append(Rc_ @ Ri_)
        tjis.append(sc_ * (Rc_ @ ti_) + tc_)
        sjis.append(sc_ * si_)
        infos.append(1.0)

        ne = len(edge_i)
        cap_e = self.pg_edge_cap

        def pad(a, fill=0):
            a = np.asarray(a)
            out = np.full((cap_e,) + a.shape[1:], fill, a.dtype)
            out[:len(a)] = a
            return out

        # only the loop-side KF fixed (reference fixes pLoopKF alone,
        # src/Optimizer.cc:6985)
        kf_free = np.zeros(self.pg_kf_cap, bool)
        kf_free[:n] = True
        kf_free[slot[int(cand)]] = False

        # inertial maps: gravity pins roll/pitch and IMU init pins
        # scale, so the graph correction is yaw+translation only
        # (reference OptimizeEssentialGraph4DoF, src/Optimizer.cc:14411,
        # dispatched for inertial loops in CorrectLoop)
        pg = self.pose_graph_4dof if m.imu_initialized else self.pose_graph
        out = pg(
            jnp.asarray(states), jnp.asarray(kf_free),
            jnp.asarray(pad(np.asarray(edge_i, np.int32))),
            jnp.asarray(pad(np.asarray(edge_j, np.int32))),
            jnp.asarray(pad(np.stack(Rjis).astype(np.float32))),
            jnp.asarray(pad(np.stack(tjis).astype(np.float32))),
            jnp.asarray(pad(np.asarray(sjis, np.float32), 1.0)),
            jnp.asarray(np.arange(cap_e) < ne),
            jnp.asarray(pad(np.asarray(infos, np.float32))))
        out = np.asarray(out)

        # ---- apply: anchors from the solve, skipped KFs propagated ----
        old_poses = {int(k): (m.kf_pose_cw[k, :, :3].copy(),
                              m.kf_pose_cw[k, :, 3].copy())
                     for k in chain_full}
        new_sim3 = {}
        for i, k in enumerate(chain):
            Rn = np.asarray(lie.so3_normalize(jnp.asarray(
                out[i, :9].reshape(3, 3)[None], jnp.float32)))[0]
            new_sim3[int(k)] = (Rn.astype(np.float64),
                                out[i, 9:12].astype(np.float64),
                                max(float(out[i, 12]), 1e-6))
        # rigid Sim3 propagation S_new_k = (S_pre_k S_pre_a^{-1}) S_new_a
        # from the nearest PRECEDING anchor (chain_full[0] is always an
        # anchor, so the forward pass covers everything)
        anchor = None
        for k in chain_full:
            ik = int(k)
            if ik in new_sim3:
                anchor = ik
                continue
            Rka, tka = pre_poses[ik]
            Raa, taa = pre_poses[anchor]
            Rrel = Rka @ Raa.T
            trel = tka - Rrel @ taa
            Rna, tna, sna = new_sim3[anchor]
            new_sim3[ik] = (Rrel @ Rna, Rrel @ tna + trel * sna, sna)
        # write SE3 poses T_cw = [R | t/s]; rotate inertial velocities by
        # the per-KF world-frame rotation change (reference 4DoF graph
        # corrects velocities, src/Optimizer.cc:14411 tail)
        for k in chain_full:
            Rn, tn, sn = new_sim3[int(k)]
            R_oldk = old_poses[int(k)][0]
            m.kf_pose_cw[k, :, :3] = Rn.astype(np.float32)
            m.kf_pose_cw[k, :, 3] = (tn / sn).astype(np.float32)
            if m.imu_initialized and np.isfinite(m.kf_vel[k]).all():
                R_corr = Rn.T @ R_oldk
                m.kf_vel[k] = (R_corr @ m.kf_vel[k]).astype(np.float32)

        # transform landmarks by their reference KF's similarity change
        # (reference :3900 spanning-tree propagation of corrected poses)
        pt_ref = np.full(m.max_pts, -1, np.int32)
        ln_ref = np.full(m.max_lines, -1, np.int32)
        for k in chain_full:
            pts = m.kf_match_pt[k]
            pts = pts[pts >= 0]
            fresh = pt_ref[pts] < 0
            pt_ref[pts[fresh]] = k
            lns = m.kf_match_ln[k]
            lns = lns[lns >= 0]
            freshl = ln_ref[lns] < 0
            ln_ref[lns[freshl]] = k
        for k in chain_full:
            R_old, t_old = old_poses[int(k)]
            R_new = m.kf_pose_cw[k, :, :3]
            t_new = m.kf_pose_cw[k, :, 3]
            pts = np.nonzero((pt_ref == k) & m.pt_valid)[0]
            if len(pts):
                # X' = T_new^{-1} T_old X
                Xc = m.pt_xyz[pts] @ R_old.T + t_old
                m.pt_xyz[pts] = ((Xc - t_new) @ R_new).astype(np.float32)
            lns = np.nonzero((ln_ref == k) & m.ln_valid)[0]
            if len(lns):
                ep = m.ln_ep[lns].reshape(-1, 3)
                epc = ep @ R_old.T + t_old
                m.ln_ep[lns] = ((epc - t_new) @ R_new).reshape(
                    -1, 6).astype(np.float32)

    # ------------------------------------------------------------------
    def run_global_ba(self, fixed_kf: int, iters: int = 10) -> None:
        """Global bundle adjustment over the whole map (reference
        BundleAdjustment(WithLines), src/Optimizer.cc:78/:903, launched
        from RunGlobalBundleAdjustment(WithLines) :3685/:3948): every KF
        free except the gauge anchor, every point a Schur-eliminated
        landmark.  Maps larger than the single-kernel capacity run the
        chain-partitioned block-Schwarz schedule instead (every KF still
        moves — no truncation)."""
        m = self.map
        kf_cap, _, _ = self._gba_caps
        chain = m.kf_chain()
        if len(chain) < 3:
            return
        if len(chain) > kf_cap:
            self._run_gba_chained(chain, fixed_kf)
        else:
            self._gba_block(chain, {int(fixed_kf)})
        m.change_index += 1

    def _run_gba_chained(self, chain: np.ndarray, fixed_kf: int,
                         halo: int = 2, sweeps: int = 2) -> None:
        """Chain-partitioned GBA for maps beyond the single-kernel KF
        capacity: contiguous temporal-chain blocks with `halo`
        boundary keyframes frozen per block, swept block-Gauss-Seidel —
        the schedule of parallel/chain_ba.py run shard-sequentially on
        one chip (the multichip path shards the identical partition
        over the mesh; see parallel/chain_ba.make_chain_ba).  Every KF
        in the map is optimized, unlike the previous newest-128
        truncation (reference runs its GBA over ALL keyframes,
        src/Optimizer.cc:78)."""
        kf_cap, _, _ = self._gba_caps
        W = kf_cap - 2 * halo
        n_blocks = -(-len(chain) // W)
        print(f"[gba] map has {len(chain)} KFs > cap {kf_cap}: "
              f"chain-partitioned GBA, {n_blocks} blocks x {sweeps} sweeps")
        for _ in range(sweeps):
            for b0 in range(0, len(chain), W):
                block = chain[max(0, b0 - halo):b0 + W + halo]
                own = set(int(k) for k in chain[b0:b0 + W])
                fixed = {int(k) for k in block if int(k) not in own}
                if int(fixed_kf) in own:
                    fixed.add(int(fixed_kf))
                if not fixed:            # gauge for the very first block
                    fixed.add(int(block[0]))
                self._gba_block(block, fixed)

    def _gba_block(self, chain: np.ndarray, fixed_ids: set,
                   iters: int = 10) -> None:
        """One global-BA solve over `chain` (<= kf_cap KFs) with the KFs
        in `fixed_ids` held."""
        m = self.map
        kf_cap, pt_cap, obs_cap = self._gba_caps
        kf_slot = np.full(m.max_kf, -1, np.int32)
        kf_slot[chain] = np.arange(len(chain))

        pt_ids = np.unique(m.kf_match_pt[chain])
        pt_ids = pt_ids[pt_ids >= 0]
        pt_ids = pt_ids[m.pt_valid[pt_ids]]
        if len(pt_ids) > pt_cap:
            print(f"[gba] {len(pt_ids)} points > cap {pt_cap}: keeping "
                  f"the most-observed {pt_cap}")
            order = np.argsort(-m.pt_n_obs[pt_ids])
            pt_ids = np.sort(pt_ids[order[:pt_cap]])
        if len(pt_ids) < 8:
            return
        pt_slot = np.full(m.max_pts, -1, np.int32)
        pt_slot[pt_ids] = np.arange(len(pt_ids))

        # observation table, fully vectorized over [K, F]
        match = m.kf_match_pt[chain]                        # [K,F]
        ks, fs = np.nonzero((match >= 0) & (pt_slot[np.maximum(match, 0)] >= 0))
        pts = match[ks, fs]
        if len(ks) > obs_cap:
            # STRATIFIED per-KF cap: a uniform draw can starve whole
            # keyframes of observations on big maps, silently weakening
            # the one global pass loop correction relies on — capping
            # each KF's quota keeps every keyframe constrained
            per_kf = max(obs_cap // max(len(chain), 1), 8)
            print(f"[gba] {len(ks)} observations > cap {obs_cap}: "
                  f"stratified to <= {per_kf}/KF")
            r = np.random.default_rng(0)
            keep = np.zeros(len(ks), bool)
            for slot_k in np.unique(ks):
                rows = np.nonzero(ks == slot_k)[0]
                if len(rows) > per_kf:
                    rows = r.choice(rows, per_kf, replace=False)
                keep[rows] = True
            sel = np.nonzero(keep)[0]
            # spend any leftover budget uniformly on the remainder
            spare = obs_cap - len(sel)
            if spare > 0:
                rest = np.nonzero(~keep)[0]
                sel = np.concatenate(
                    [sel, r.choice(rest, min(spare, len(rest)),
                                   replace=False)])
            sel = np.sort(sel[:obs_cap])
            ks, fs, pts = ks[sel], fs[sel], pts[sel]
        obs_kf = ks.astype(np.int32)
        obs_pt = pt_slot[pts]
        uv_src = (m.kf_feat_uv_raw if self.kb8 is not None
                  else m.kf_feat_uv)
        obs_uv = uv_src[chain[ks], fs]
        obs_is2 = (1.0 / 1.2 ** (2.0 * m.kf_feat_octave[chain[ks], fs])
                   ).astype(np.float32)

        def pad(a, cap, fill=0):
            out = np.full((cap,) + a.shape[1:], fill, a.dtype)
            out[:len(a)] = a
            return out

        kf_poses = np.tile(np.eye(3, 4, dtype=np.float32), (kf_cap, 1, 1))
        kf_poses[:len(chain)] = m.kf_pose_cw[chain]
        kf_free = np.zeros(kf_cap, bool)
        kf_free[:len(chain)] = True
        for f in fixed_ids:
            if kf_slot[f] >= 0:
                kf_free[kf_slot[f]] = False
        pt_xyz = np.zeros((pt_cap, 3), np.float32)
        pt_xyz[:len(pt_ids)] = m.pt_xyz[pt_ids]
        pt_free = np.zeros(pt_cap, bool)
        pt_free[:len(pt_ids)] = True

        # map lines join the global adjustment (reference
        # BundleAdjustmentWithLines, src/Optimizer.cc:903)
        ln_cap, lobs_cap = 1024, 4096
        ln_ids = np.zeros(0, np.int32)
        if self.cfg.use_lines:
            ln_ids = np.unique(m.kf_match_ln[chain])
            ln_ids = ln_ids[ln_ids >= 0]
            ln_ids = ln_ids[m.ln_valid[ln_ids]]
            if len(ln_ids) > ln_cap:
                print(f"[gba] {len(ln_ids)} lines > cap {ln_cap}: keeping "
                      f"the most-observed {ln_cap}")
                order = np.argsort(-m.ln_n_obs[ln_ids])
                ln_ids = np.sort(ln_ids[order[:ln_cap]])
        use_pl = len(ln_ids) >= 8

        if use_pl:
            ln_slot = np.full(m.max_lines, -1, np.int32)
            ln_slot[ln_ids] = np.arange(len(ln_ids))
            lmatch = m.kf_match_ln[chain]                   # [K,Fl]
            lks, lfs = np.nonzero(
                (lmatch >= 0) & (ln_slot[np.maximum(lmatch, 0)] >= 0))
            if len(lks) > lobs_cap:
                print(f"[gba] {len(lks)} line obs > cap {lobs_cap}: "
                      f"uniform subsample")
                sel = np.sort(np.random.default_rng(0).choice(
                    len(lks), lobs_cap, replace=False))
                lks, lfs = lks[sel], lfs[sel]
            lobs_kf = lks.astype(np.int32)
            lobs_ln = ln_slot[lmatch[lks, lfs]]
            ep = m.kf_line_ep[chain[lks], lfs]
            sp = np.concatenate([ep[:, :2], np.ones((len(ep), 1))], 1)
            e_ = np.concatenate([ep[:, 2:], np.ones((len(ep), 1))], 1)
            leq = np.cross(sp, e_)
            leq /= np.maximum(
                np.linalg.norm(leq[:, :2], axis=1, keepdims=True), 1e-9)
            lobs_eq = leq.astype(np.float32)
            ln_ep6 = np.zeros((ln_cap, 6), np.float32)
            ln_ep6[:len(ln_ids)] = m.ln_ep[ln_ids]
            ln_free = np.zeros(ln_cap, bool)
            ln_free[:len(ln_ids)] = True
            if self.gba_pl_kernel is None:
                self.gba_pl_kernel = KN.make_local_ba_pl(
                    self.ba_K, kf_cap, pt_cap, obs_cap, ln_cap, lobs_cap,
                    rounds=2, iters=5)
            (poses_out, pts_out, lns_out, inl, _) = self.gba_pl_kernel(
                jnp.asarray(kf_poses), jnp.asarray(kf_free),
                jnp.asarray(pt_xyz), jnp.asarray(pt_free),
                jnp.asarray(pad(obs_kf, obs_cap)),
                jnp.asarray(pad(obs_pt, obs_cap)),
                jnp.asarray(pad(obs_uv, obs_cap)),
                jnp.asarray(np.arange(obs_cap) < len(obs_kf)),
                jnp.asarray(pad(obs_is2, obs_cap, 1.0)),
                jnp.asarray(ln_ep6), jnp.asarray(ln_free),
                jnp.asarray(pad(lobs_kf, lobs_cap)),
                jnp.asarray(pad(lobs_ln, lobs_cap)),
                jnp.asarray(pad(lobs_eq, lobs_cap)),
                jnp.asarray(np.arange(lobs_cap) < len(lobs_kf)),
                jnp.asarray(pad(np.ones(len(lobs_kf), np.float32),
                                lobs_cap)))
            lns_out = np.asarray(lns_out)
            okl = np.all(np.isfinite(lns_out[:len(ln_ids)]), axis=1)
            m.ln_ep[ln_ids[okl]] = lns_out[:len(ln_ids)][okl]
        else:
            if self.gba_kernel is None:
                self.gba_kernel = KN.make_local_ba(
                    self.ba_K, kf_cap, pt_cap, obs_cap, rounds=2, iters=5)
            poses_out, pts_out, inl = self.gba_kernel(
                jnp.asarray(kf_poses), jnp.asarray(kf_free),
                jnp.asarray(pt_xyz), jnp.asarray(pt_free),
                jnp.asarray(pad(obs_kf, obs_cap)),
                jnp.asarray(pad(obs_pt, obs_cap)),
                jnp.asarray(pad(obs_uv, obs_cap)),
                jnp.asarray(np.arange(obs_cap) < len(obs_kf)),
                jnp.asarray(pad(obs_is2, obs_cap, 1.0)))
        poses_out = np.asarray(poses_out)
        pts_out = np.asarray(pts_out)
        ok = np.all(np.isfinite(poses_out[:len(chain)]), axis=(1, 2))
        m.kf_pose_cw[chain[ok]] = poses_out[:len(chain)][ok]
        okp = np.all(np.isfinite(pts_out[:len(pt_ids)]), axis=1)
        m.pt_xyz[pt_ids[okp]] = pts_out[:len(pt_ids)][okp]

    # ------------------------------------------------------------------
    def _merge_maps(self, kf: int, cand: int, m_old: MapStore,
                    s, R, t) -> None:
        """Merge the active map into `m_old` (reference MergeLocal,
        src/LoopClosing.cc:2448 / inertial MergeLocal2 :3142): re-express
        the active map under the verified similarity, concatenate the
        stores, fuse duplicated landmarks around the weld, then weld BA
        anchored on the old side.  The old map becomes active; the
        transform + slot remaps are left in `pending_merge` for the
        tracker to rebind its transient state."""
        m_cur = self.map
        cur_id = m_cur.map_id
        Tbc = None
        if self.cfg.sensor in (3, 4):
            Tbc = self.cfg.imu.Tbc_matrix()
        m_cur.apply_sim3(float(s), R, t, Tbc)
        kf_map, pt_map, ln_map = m_old.absorb(m_cur)
        if hasattr(self.kfdb, "merge_maps"):
            self.kfdb.merge_maps(cur_id, m_old.map_id, kf_map)
        # atlas bookkeeping: drop the merged-away store, activate m_old
        merged_index = self.atlas.active
        self.atlas.maps = [mm for mm in self.atlas.maps
                           if mm.map_id != cur_id]
        self.atlas.active = self.atlas.maps.index(m_old)
        # inherit IMU maturity from the larger parent map
        m_old.imu_initialized = m_old.imu_initialized or m_cur.imu_initialized
        m_old.imu_ba1 = m_old.imu_ba1 or m_cur.imu_ba1
        m_old.imu_ba2 = m_old.imu_ba2 or m_cur.imu_ba2

        kf_new = int(kf_map[kf])
        self._fuse_duplicates(m_old, kf_new, cand)
        for k in (kf_new, cand):
            m_old.update_covisibility(int(k))
        # weld BA anchored at the old-side candidate.  Inertial merges
        # run the MergeInertialBA analog (reference src/Optimizer.cc:
        # 12344, called from MergeLocal2 src/LoopClosing.cc:3142): a
        # visual-inertial window across the weld with poses, velocities
        # and biases free and preintegration + bias-RW edges along the
        # temporal chain — the fused duplicate landmarks tie the two
        # sides visually while the IMU terms keep velocity/bias
        # continuity through the weld.  Visual-only merges keep the
        # global BA (reference MergeLocal -> welding visual BA).
        if (m_old.imu_initialized and m_cur.imu_initialized
                and self.mapper is not None):
            n_new = int((kf_map >= 0).sum())
            # conservative outlier erasure for the weld solve: it
            # starts ~0.1-0.3 m from the optimum and the plain chi2
            # gate would erase good cross-seam constraints
            self.mapper._erase_chi2_mult = 3.0
            try:
                self.mapper.local_inertial_ba(
                    kf_new, window=min(n_new + 6, self.mapper.ba_kf_cap))
            finally:
                self.mapper._erase_chi2_mult = 1.0
        else:
            self.run_global_ba(fixed_kf=cand)
        self.pending_merge = dict(
            s=float(s), R=np.asarray(R), t=np.asarray(t),
            kf_map=kf_map, pt_map=pt_map, ln_map=ln_map,
            merged_atlas_index=merged_index,
            new_atlas_index=self.atlas.active)
        m_old.change_index += 1

    def _fuse_duplicates(self, m: MapStore, kf_new: int, cand: int,
                         radius: float = 0.15) -> None:
        """SearchAndFuse analog (reference src/LoopClosing.cc:3497): map
        points triangulated on the merged-in side that coincide (3D
        distance + descriptor) with old-side points are replaced by the
        old ones; observations rebind through a lookup table."""
        win_new = np.unique(np.concatenate(
            [[kf_new], m.covisible_kfs(kf_new, n=10, min_weight=5)]))
        win_old = np.unique(np.concatenate(
            [[cand], m.covisible_kfs(cand, n=10, min_weight=5)]))
        win_old = np.setdiff1d(win_old, win_new)
        pts_new = np.unique(m.kf_match_pt[win_new])
        pts_new = pts_new[pts_new >= 0]
        pts_new = pts_new[m.pt_valid[pts_new]]
        pts_old = np.unique(m.kf_match_pt[win_old])
        pts_old = pts_old[pts_old >= 0]
        pts_old = pts_old[m.pt_valid[pts_old]]
        pts_old = np.setdiff1d(pts_old, pts_new)
        if len(pts_new) == 0 or len(pts_old) == 0:
            return
        d2 = np.sum((m.pt_xyz[pts_new][:, None] -
                     m.pt_xyz[pts_old][None]) ** 2, -1)
        dist = np.array(M.hamming_matrix(
            M.unpack_u32_to_pm1(jnp.asarray(m.pt_desc[pts_new])),
            M.unpack_u32_to_pm1(jnp.asarray(m.pt_desc[pts_old]))))
        dist[d2 > radius * radius] = 1e9
        j = dist.argmin(1)
        dup = dist[np.arange(len(pts_new)), j] <= 60.0
        if not dup.any():
            return
        lut = np.arange(m.max_pts, dtype=np.int32)
        lut[pts_new[dup]] = pts_old[j[dup]]
        mp = m.kf_match_pt
        m.kf_match_pt = np.where(mp >= 0, lut[np.maximum(mp, 0)],
                                 INVALID).astype(np.int32)
        m.pt_n_obs[pts_old[j[dup]]] += m.pt_n_obs[pts_new[dup]]
        m.pt_valid[pts_new[dup]] = False
        m.n_pt -= int(dup.sum())
