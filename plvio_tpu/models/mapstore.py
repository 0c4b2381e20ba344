"""Struct-of-arrays map store: the Atlas/Map/KeyFrame/MapPoint/MapLine
data model re-designed for fixed-shape device compute.

Replaces the reference's mutex-guarded object graph (reference:
src/Atlas.cc, src/Map.cc, src/KeyFrame.cc:1704 LoC, src/MapPoint.cc,
src/MapLine.cc, ~30 mutexes) with plain numpy arrays of fixed capacity and
validity masks, mutated only by the host orchestration thread.  Device
kernels receive read-only slices; "deleting" is mask-clearing; culling is
masking (SURVEY §7.0).  Covisibility is a dense [K,K] count matrix updated
by scatter — at MAX_KF=512 that is 0.5 MB, cheaper than any graph
structure.

One MapStore == one reference `Map`; the `Atlas` (multi-map container,
reference include/Atlas.h:83-146) holds several and an active index.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

INVALID = -1


class MapStore:
    def __init__(self, max_kf: int = 512, max_pts: int = 16384,
                 max_lines: int = 2048, n_feat: int = 1024,
                 n_line_feat: int = 256, map_id: int = 0):
        self.map_id = map_id
        self.max_kf = max_kf
        self.max_pts = max_pts
        self.max_lines = max_lines
        self.n_feat = n_feat
        self.n_line_feat = n_line_feat

        # ---- keyframes -------------------------------------------------
        self.kf_valid = np.zeros(max_kf, bool)
        self.kf_timestamp = np.zeros(max_kf, np.float64)
        self.kf_pose_cw = np.tile(np.eye(3, 4, dtype=np.float32), (max_kf, 1, 1))
        # inertial state (body frame): pose_wb, velocity, biases
        self.kf_pose_wb = np.tile(np.eye(3, 4, dtype=np.float32), (max_kf, 1, 1))
        self.kf_vel = np.zeros((max_kf, 3), np.float32)
        self.kf_bias_g = np.zeros((max_kf, 3), np.float32)
        self.kf_bias_a = np.zeros((max_kf, 3), np.float32)
        # features (undistorted pixel coords)
        self.kf_feat_uv = np.zeros((max_kf, n_feat, 2), np.float32)
        # RAW pixel coords (== kf_feat_uv for pinhole; differs for KB8
        # fisheye, whose native BA edges project the true lens against
        # raw pixels — reference KannalaBrandt8::projectJac used by
        # every optimizer edge, src/CameraModels/KannalaBrandt8.cpp)
        self.kf_feat_uv_raw = np.zeros((max_kf, n_feat, 2), np.float32)
        self.kf_feat_octave = np.zeros((max_kf, n_feat), np.int32)
        self.kf_feat_angle = np.zeros((max_kf, n_feat), np.float32)
        self.kf_feat_desc = np.zeros((max_kf, n_feat, 8), np.uint32)  # packed
        self.kf_feat_valid = np.zeros((max_kf, n_feat), bool)
        self.kf_match_pt = np.full((max_kf, n_feat), INVALID, np.int32)
        # line features: endpoints (undistorted) + packed LBD + map-line id
        self.kf_line_ep = np.zeros((max_kf, n_line_feat, 4), np.float32)
        self.kf_line_desc = np.zeros((max_kf, n_line_feat, 8), np.uint32)
        self.kf_line_valid = np.zeros((max_kf, n_line_feat), bool)
        self.kf_match_ln = np.full((max_kf, n_line_feat), INVALID, np.int32)
        # temporal chain for inertial (reference mPrevKF/mNextKF)
        self.kf_prev = np.full(max_kf, INVALID, np.int32)
        self.kf_next = np.full(max_kf, INVALID, np.int32)
        self.n_kf = 0

        # ---- map points ------------------------------------------------
        self.pt_valid = np.zeros(max_pts, bool)
        self.pt_xyz = np.zeros((max_pts, 3), np.float32)
        self.pt_desc = np.zeros((max_pts, 8), np.uint32)
        self.pt_normal = np.zeros((max_pts, 3), np.float32)
        self.pt_min_dist = np.zeros(max_pts, np.float32)
        self.pt_max_dist = np.zeros(max_pts, np.float32)
        self.pt_first_kf = np.full(max_pts, INVALID, np.int32)
        self.pt_n_obs = np.zeros(max_pts, np.int32)
        self.pt_found = np.zeros(max_pts, np.int32)    # matched-after-predicted
        self.pt_visible = np.zeros(max_pts, np.int32)  # predicted-visible
        self.n_pt = 0

        # ---- map lines (3D endpoints, reference MapLine) ---------------
        self.ln_valid = np.zeros(max_lines, bool)
        self.ln_ep = np.zeros((max_lines, 6), np.float32)
        self.ln_desc = np.zeros((max_lines, 8), np.uint32)
        self.ln_first_kf = np.full(max_lines, INVALID, np.int32)
        self.ln_n_obs = np.zeros(max_lines, np.int32)
        self.ln_found = np.zeros(max_lines, np.int32)
        self.ln_visible = np.zeros(max_lines, np.int32)
        self.n_ln = 0

        # ---- covisibility (shared point observations) ------------------
        self.covis = np.zeros((max_kf, max_kf), np.int32)

        # map-change counter (reference Map::GetMapChangeIndex)
        self.change_index = 0
        # IMU initialization stages (reference Map::isImuInitialized /
        # GetIniertialBA1/BA2 flags)
        self.imu_initialized = False
        self.imu_ba1 = False
        self.imu_ba2 = False
        # preintegrated IMU from the previous KF in the temporal chain,
        # plus the raw samples for exact reintegration at new biases
        # (reference KeyFrame::mpImuPreintegrated + Reintegrate)
        self.kf_preint = {}       # kf -> ops.imu.Preintegrated
        self.kf_imu_raw = {}      # kf -> (gyro [K,3], acc [K,3], dt [K])

    # ------------------------------------------------------------------
    def alloc_kf(self) -> int:
        free = np.nonzero(~self.kf_valid)[0]
        if len(free) == 0:
            raise RuntimeError("keyframe capacity exhausted")
        i = int(free[0])
        self.kf_valid[i] = True
        self.n_kf += 1
        return i

    def alloc_points(self, n: int) -> np.ndarray:
        free = np.nonzero(~self.pt_valid)[0][:n]
        self.pt_valid[free] = True
        self.n_pt += len(free)
        return free

    def alloc_lines(self, n: int) -> np.ndarray:
        free = np.nonzero(~self.ln_valid)[0][:n]
        self.ln_valid[free] = True
        self.n_ln += len(free)
        return free

    # ------------------------------------------------------------------
    def add_observations(self, kf: int, feat_idx: np.ndarray,
                         pt_idx: np.ndarray) -> None:
        """Bind features of keyframe `kf` to map points and update
        covisibility (reference KeyFrame::AddMapPoint +
        UpdateConnections, src/KeyFrame.cc:624)."""
        self.kf_match_pt[kf, feat_idx] = pt_idx
        self.pt_n_obs[pt_idx] += 1
        self.update_covisibility(kf)
        self.change_index += 1

    def update_covisibility(self, kf: int) -> None:
        """Recompute covisibility row of `kf` from shared point (and line)
        observations (reference KeyFrame::UpdateConnectionsWithLines,
        src/KeyFrame.cc:624 — counts point AND line co-observations).
        Fully vectorized: one membership test over the whole KF bank
        (native C++ fast path in plvio_tpu.native when built)."""
        from .. import native
        if native.available():
            counts = native.covis_row(
                self.kf_match_pt, self.kf_match_ln,
                self.kf_valid.astype(np.uint8), kf,
                self.max_pts, self.max_lines)
            self.covis[kf] = counts
            self.covis[:, kf] = counts
            return
        counts = np.zeros(self.max_kf, np.int32)
        pts = self.kf_match_pt[kf]
        pts = pts[pts >= 0]
        if len(pts):
            member = np.zeros(self.max_pts, bool)
            member[pts] = True
            all_m = self.kf_match_pt          # [K,F]
            hit = (all_m >= 0) & member[np.clip(all_m, 0, self.max_pts - 1)]
            counts += hit.sum(axis=1, dtype=np.int32)
        lns = self.kf_match_ln[kf]
        lns = lns[lns >= 0]
        if len(lns):
            member = np.zeros(self.max_lines, bool)
            member[lns] = True
            all_l = self.kf_match_ln
            hit = (all_l >= 0) & member[np.clip(all_l, 0, self.max_lines - 1)]
            counts += hit.sum(axis=1, dtype=np.int32)
        counts[~self.kf_valid] = 0
        counts[kf] = 0
        self.covis[kf] = counts
        self.covis[:, kf] = counts

    def covisible_kfs(self, kf: int, n: int = 10, min_weight: int = 15) -> np.ndarray:
        """Best covisible keyframes (reference
        KeyFrame::GetBestCovisibilityKeyFrames)."""
        w = self.covis[kf].copy()
        w[~self.kf_valid] = 0
        w[kf] = 0
        order = np.argsort(-w)
        out = order[w[order] >= min_weight][:n]
        if len(out) == 0:  # fall back to any connection
            out = order[w[order] > 0][:n]
        return out

    def local_map_points(self, kfs: np.ndarray, cap: int) -> np.ndarray:
        """Union of points observed by `kfs`, as a fixed-size index array
        (INVALID-padded) — the UpdateLocalPoints analog."""
        ids = np.unique(self.kf_match_pt[kfs])
        ids = ids[(ids >= 0) & self.pt_valid[np.clip(ids, 0, self.max_pts - 1)]]
        out = np.full(cap, INVALID, np.int32)
        out[:min(len(ids), cap)] = ids[:cap]
        return out

    def local_map_lines(self, kfs: np.ndarray, cap: int) -> np.ndarray:
        ids = np.unique(self.kf_match_ln[kfs])
        ids = ids[(ids >= 0) & self.ln_valid[np.clip(ids, 0, self.max_lines - 1)]]
        out = np.full(cap, INVALID, np.int32)
        out[:min(len(ids), cap)] = ids[:cap]
        return out

    # ------------------------------------------------------------------
    def remove_point(self, ids: np.ndarray) -> None:
        """SetBadFlag analog: clear validity and back-pointers."""
        ids = np.atleast_1d(ids)
        self.pt_valid[ids] = False
        mask = np.isin(self.kf_match_pt, ids)
        self.kf_match_pt[mask] = INVALID
        self.n_pt -= len(ids)
        self.change_index += 1

    def remove_line(self, ids: np.ndarray) -> None:
        ids = np.atleast_1d(ids)
        self.ln_valid[ids] = False
        mask = np.isin(self.kf_match_ln, ids)
        self.kf_match_ln[mask] = INVALID
        self.n_ln -= len(ids)
        self.change_index += 1

    def remove_keyframe(self, kf: int) -> None:
        """KeyFrame culling (reference SetBadFlag + spanning-tree rewire;
        our temporal chain rewires prev<->next)."""
        pts = self.kf_match_pt[kf]
        good = pts >= 0
        self.pt_n_obs[pts[good]] -= 1
        lns = self.kf_match_ln[kf]
        self.ln_n_obs[lns[lns >= 0]] -= 1
        self.kf_match_pt[kf] = INVALID
        self.kf_match_ln[kf] = INVALID
        self.kf_valid[kf] = False
        self.kf_feat_valid[kf] = False
        self.covis[kf] = 0
        self.covis[:, kf] = 0
        p, n = self.kf_prev[kf], self.kf_next[kf]
        if p >= 0:
            self.kf_next[p] = n
        if n >= 0:
            self.kf_prev[n] = p
        self.n_kf -= 1
        self.change_index += 1

    def valid_kf_indices(self) -> np.ndarray:
        return np.nonzero(self.kf_valid)[0]

    def kf_chain(self) -> np.ndarray:
        """Temporal keyframe chain oldest->newest via kf_prev/kf_next."""
        kfs = self.valid_kf_indices()
        return kfs[np.argsort(self.kf_timestamp[kfs])]

    def apply_scaled_rotation(self, R_gw: np.ndarray, scale: float,
                              Tbc: Optional[np.ndarray] = None) -> None:
        """Re-express the whole map in a gravity-aligned, metric frame:
        X' = s * R_gw X (reference Map::ApplyScaledRotation,
        include/Map.h:129-130, called from LocalMapping::InitializeIMU
        src/LocalMapping.cc:2258).

        Camera poses update as T_cw' = [R_cw R_gw^T | s t_cw]; body poses
        and velocities are recomputed from the camera poses + Tbc.
        """
        R_gw = np.asarray(R_gw, np.float32)
        kfs = self.valid_kf_indices()
        R_cw = self.kf_pose_cw[kfs, :, :3]
        t_cw = self.kf_pose_cw[kfs, :, 3]
        self.kf_pose_cw[kfs, :, :3] = np.einsum("kij,lj->kil", R_cw, R_gw)
        self.kf_pose_cw[kfs, :, 3] = scale * t_cw
        self.pt_xyz[self.pt_valid] = scale * np.einsum(
            "ij,kj->ki", R_gw, self.pt_xyz[self.pt_valid])
        if self.ln_valid.any():
            ep = self.ln_ep[self.ln_valid].reshape(-1, 3)
            self.ln_ep[self.ln_valid] = (scale * np.einsum(
                "ij,kj->ki", R_gw, ep)).reshape(-1, 6)
        self.kf_vel[kfs] = scale * np.einsum("ij,kj->ki", R_gw, self.kf_vel[kfs])
        if Tbc is not None:
            self.recompute_body_poses(Tbc)
        self.change_index += 1

    def recompute_body_poses(self, Tbc: np.ndarray) -> None:
        """kf_pose_wb from kf_pose_cw: T_wb = T_wc * T_cb with
        T_cb = Tbc^{-1} (Tbc maps camera->body)."""
        R_bc = np.asarray(Tbc[:3, :3], np.float32)
        t_bc = np.asarray(Tbc[:3, 3], np.float32)
        R_cb = R_bc.T
        t_cb = -R_cb @ t_bc
        kfs = self.valid_kf_indices()
        R_cw = self.kf_pose_cw[kfs, :, :3]
        t_cw = self.kf_pose_cw[kfs, :, 3]
        R_wc = R_cw.transpose(0, 2, 1)
        p_wc = -np.einsum("kij,kj->ki", R_wc, t_cw)
        R_wb = np.einsum("kij,jl->kil", R_wc, R_cb)
        p_wb = np.einsum("kij,j->ki", R_wc, t_cb) + p_wc
        self.kf_pose_wb[kfs, :, :3] = R_wb
        self.kf_pose_wb[kfs, :, 3] = p_wb

    def set_cam_poses_from_body(self, kfs: np.ndarray, Tbc: np.ndarray) -> None:
        """Inverse of recompute_body_poses for the given KFs."""
        R_bc = np.asarray(Tbc[:3, :3], np.float32)
        t_bc = np.asarray(Tbc[:3, 3], np.float32)
        R_wb = self.kf_pose_wb[kfs, :, :3]
        p_wb = self.kf_pose_wb[kfs, :, 3]
        R_wc = np.einsum("kij,jl->kil", R_wb, R_bc)
        p_wc = np.einsum("kij,j->ki", R_wb, t_bc) + p_wb
        R_cw = R_wc.transpose(0, 2, 1)
        t_cw = -np.einsum("kij,kj->ki", R_cw, p_wc)
        self.kf_pose_cw[kfs, :, :3] = R_cw
        self.kf_pose_cw[kfs, :, 3] = t_cw

    def apply_sim3(self, s: float, R: np.ndarray, t: np.ndarray,
                   Tbc: Optional[np.ndarray] = None) -> None:
        """Re-express the whole map under the similarity X' = s R X + t
        (used by map merge, reference MergeLocal's welding transform,
        src/LoopClosing.cc:2448).  Camera poses update as
        T_cw' = [R_cw R^T | s t_cw - R_cw R^T t] (projectively identical:
        pc' = s pc); velocities scale-rotate."""
        R = np.asarray(R, np.float32)
        t = np.asarray(t, np.float32)
        kfs = self.valid_kf_indices()
        self.pt_xyz[self.pt_valid] = (
            s * self.pt_xyz[self.pt_valid] @ R.T + t).astype(np.float32)
        if self.ln_valid.any():
            ep = self.ln_ep[self.ln_valid].reshape(-1, 3)
            self.ln_ep[self.ln_valid] = (
                s * ep @ R.T + t).reshape(-1, 6).astype(np.float32)
        R_cw = self.kf_pose_cw[kfs, :, :3]
        t_cw = self.kf_pose_cw[kfs, :, 3]
        R_new = np.einsum("kij,lj->kil", R_cw, R)       # R_cw R^T
        self.kf_pose_cw[kfs, :, :3] = R_new
        self.kf_pose_cw[kfs, :, 3] = s * t_cw - np.einsum(
            "kij,j->ki", R_new, t)
        self.kf_vel[kfs] = s * self.kf_vel[kfs] @ R.T
        if Tbc is not None:
            self.recompute_body_poses(Tbc)
        self.change_index += 1

    def absorb(self, other: "MapStore"):
        """Concatenate `other`'s keyframes/points/lines into this store
        (the array-native core of a map MERGE, reference
        LoopClosing::MergeLocal src/LoopClosing.cc:2448 — `other` must
        already be expressed in this map's world frame via apply_sim3).

        Returns (kf_map, pt_map, ln_map): old-slot -> new-slot index
        arrays (INVALID where the old slot was not valid)."""
        kfs = np.nonzero(other.kf_valid)[0]
        pts = np.nonzero(other.pt_valid)[0]
        lns = np.nonzero(other.ln_valid)[0]
        new_kf = np.nonzero(~self.kf_valid)[0][:len(kfs)]
        if len(new_kf) < len(kfs):
            raise RuntimeError("keyframe capacity exhausted in merge")
        new_pt = self.alloc_points(len(pts))
        new_ln = self.alloc_lines(len(lns))
        if len(new_pt) < len(pts) or len(new_ln) < len(lns):
            raise RuntimeError("landmark capacity exhausted in merge")
        self.kf_valid[new_kf] = True
        self.n_kf += len(new_kf)

        kf_map = np.full(other.max_kf, INVALID, np.int32)
        pt_map = np.full(other.max_pts, INVALID, np.int32)
        ln_map = np.full(other.max_lines, INVALID, np.int32)
        kf_map[kfs] = new_kf
        pt_map[pts] = new_pt
        ln_map[lns] = new_ln

        for f in ("kf_timestamp", "kf_pose_cw", "kf_pose_wb", "kf_vel",
                  "kf_bias_g", "kf_bias_a", "kf_feat_uv", "kf_feat_uv_raw",
                  "kf_feat_octave", "kf_feat_angle", "kf_feat_desc",
                  "kf_feat_valid", "kf_line_ep", "kf_line_desc",
                  "kf_line_valid"):
            getattr(self, f)[new_kf] = getattr(other, f)[kfs]
        mp = other.kf_match_pt[kfs]
        self.kf_match_pt[new_kf] = np.where(
            mp >= 0, pt_map[np.maximum(mp, 0)], INVALID)
        ml = other.kf_match_ln[kfs]
        self.kf_match_ln[new_kf] = np.where(
            ml >= 0, ln_map[np.maximum(ml, 0)], INVALID)
        prev = other.kf_prev[kfs]
        self.kf_prev[new_kf] = np.where(prev >= 0,
                                        kf_map[np.maximum(prev, 0)], INVALID)
        nxt = other.kf_next[kfs]
        self.kf_next[new_kf] = np.where(nxt >= 0,
                                        kf_map[np.maximum(nxt, 0)], INVALID)

        for f in ("pt_xyz", "pt_desc", "pt_normal", "pt_min_dist",
                  "pt_max_dist", "pt_n_obs", "pt_found", "pt_visible"):
            getattr(self, f)[new_pt] = getattr(other, f)[pts]
        fk = other.pt_first_kf[pts]
        self.pt_first_kf[new_pt] = np.where(fk >= 0,
                                            kf_map[np.maximum(fk, 0)], INVALID)
        for f in ("ln_ep", "ln_desc", "ln_n_obs", "ln_found", "ln_visible"):
            getattr(self, f)[new_ln] = getattr(other, f)[lns]
        fk = other.ln_first_kf[lns]
        self.ln_first_kf[new_ln] = np.where(fk >= 0,
                                            kf_map[np.maximum(fk, 0)], INVALID)

        self.covis[np.ix_(new_kf, new_kf)] = other.covis[np.ix_(kfs, kfs)]
        for kf_old, kf_new in zip(kfs, new_kf):
            if kf_old in other.kf_preint:
                self.kf_preint[int(kf_new)] = other.kf_preint[kf_old]
            if kf_old in other.kf_imu_raw:
                self.kf_imu_raw[int(kf_new)] = other.kf_imu_raw[kf_old]
        self.change_index += 1
        return kf_map, pt_map, ln_map

    def kf_centers(self) -> np.ndarray:
        """Camera centers of all KFs: C = -R^T t."""
        R = self.kf_pose_cw[:, :, :3]
        t = self.kf_pose_cw[:, :, 3]
        return -np.einsum("kji,kj->ki", R, t)


@dataclass
class Atlas:
    """Multi-map container (reference include/Atlas.h:83-146): the active
    map receives new data; on tracking loss a fresh map is started and
    merged back later by loop closing."""
    maps: List[MapStore] = field(default_factory=list)
    active: int = 0
    next_map_id: int = 1

    def __post_init__(self):
        if not self.maps:
            self.maps = [MapStore(map_id=0)]
        self.next_map_id = max([m.map_id for m in self.maps] + [0]) + 1

    @property
    def current(self) -> MapStore:
        return self.maps[self.active]

    def create_new_map(self, **kw) -> MapStore:
        m = MapStore(map_id=self.next_map_id, **kw)
        self.next_map_id += 1
        self.maps.append(m)
        self.active = len(self.maps) - 1
        return m
