"""Tracking front-end driver (host state machine).

Re-design of `Tracking` (reference: src/Tracking.cc, 6640 LoC): the same
state machine — NOT_INITIALIZED -> monocular two-view bootstrap; OK ->
motion-model prediction, projection matching, pose-only IRLS, local-map
tracking, keyframe decision; RECENTLY_LOST/LOST handling — but all
per-feature work happens in the jitted kernels of models/kernels.py; this
module is pure orchestration over numpy/jnp arrays.

Key call-graph parity (reference file:line):
  process_frame           <- Tracking::TrackWithLines  src/Tracking.cc:2186
  _initialize_mono        <- MonocularInitializationWithLines :3064 +
                             CreateInitialMapMonocular :3167
  _track_with_model       <- TrackWithMotionModelWithLines :3926
  _track_local_map        <- TrackLocalMapWithLines :4261
  _need_keyframe          <- NeedNewKeyFrameWithLines :4552
  _create_keyframe        <- CreateNewKeyFrameWithLines :4850
"""
from __future__ import annotations

import dataclasses
import os
from enum import IntEnum
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import matching as M
from ..ops.frontend import Features
from ..ops import twoview as TV
from ..solver.residuals import PinholeK
from ..utils import lie
from . import kernels as KN
from .mapstore import Atlas, MapStore, INVALID


class TrackState(IntEnum):
    """reference: include/Tracking.h:140-148 eTrackingState."""
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    RECENTLY_LOST = 3
    LOST = 4


@dataclasses.dataclass
class FrameRecord:
    """Per-frame trajectory bookkeeping (reference stores relative pose to
    the reference KF, src/Tracking.cc:2705-2725, so that later KF
    optimization corrects the full-frame trajectory)."""
    timestamp: float
    ref_kf: int
    T_cr: np.ndarray  # [3,4] frame-from-refKF
    map_id: int = 0   # Atlas map the ref KF lives in


class Tracker:
    def __init__(self, cfg: SystemConfig, atlas: Atlas, n_feat: int,
                 local_pts_cap: int = 2048, imu_cap: int = 64):
        self.cfg = cfg
        self.atlas = atlas
        self.n_feat = n_feat
        self.local_cap = local_pts_cap
        self.imu_cap = imu_cap
        cam = cfg.camera
        self.K = PinholeK(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)

        # stage profiler; System replaces this with its shared instance
        from ..utils.metrics import Metrics
        self.metrics = Metrics()

        self.pose_opt = KN.make_pose_optimizer(self.K, local_pts_cap)
        self.proj_match = KN.make_projection_matcher(self.K, n_feat, local_pts_cap)
        # KB8 fisheye: NATIVE equidistant projection in the hot path —
        # the local-map matcher and pose optimizer run against RAW
        # pixels (reference projects through the GeometricCamera
        # virtual interface, src/CameraModels/KannalaBrandt8.cpp);
        # matching/optimizing a fisheye frame through a pinhole proxy
        # discards the lens model at the image periphery
        self.kb8 = None
        if cam.model == "kb8":
            d = tuple(cam.dist) + (0.0,) * 4
            from ..solver.residuals import KB8K
            self.kb8 = KB8K(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                            k1=d[0], k2=d[1], k3=d[2], k4=d[3])
            self.proj_match = KN.make_projection_matcher_kb8(
                self.kb8, n_feat, local_pts_cap)
            self.pose_opt = KN.make_pose_optimizer_kb8(
                self.kb8, local_pts_cap)

        # line machinery (SLAM modes with lines, reference TrackWithLines)
        self.use_lines = cfg.use_lines
        self.local_ln_cap = 256
        self.n_line_feat = cfg.line.max_raw_segments if hasattr(cfg.line, 'max_raw_segments') else 256
        _bf = cfg.camera.baseline * cfg.camera.fx
        self.pl_stereo = (cfg.sensor in (1, 2, 4) and _bf > 0
                          and cam.model != "kb8")
        if self.use_lines:
            self.n_line_feat = 256
            self.line_proj_match = KN.make_line_projection_matcher(
                self.K, self.n_line_feat, self.local_ln_cap)
            # stereo/RGB-D with lines: the u_R depth residual joins the
            # point+line pose optimization (reference builds EdgeStereo*
            # alongside the line edges in PoseOptimizationWithLine's
            # stereo branch, src/Optimizer.cc:2736ff) — previously the
            # depth edges only took effect in point-only configs
            self.pose_opt_pl = KN.make_fast_pose_optimizer_pl(
                self.K, local_pts_cap, self.local_ln_cap,
                bf=_bf if self.pl_stereo else 0.0)
        # stereo/RGB-D: right-eye residual u_R = u - bf/z joins the
        # pose-only optimization for features with a stereo depth
        # (reference EdgeStereoSE3ProjectXYZOnlyPose for mvuRight>=0,
        # src/Optimizer.cc:2399; RGB-D synthesizes u_R from depth)
        self.pose_opt_stereo = None
        self.bf = cfg.camera.baseline * cfg.camera.fx
        if cfg.sensor in (1, 2) and self.bf > 0 and self.kb8 is None:
            self.pose_opt_stereo = KN.make_pose_optimizer_stereo(
                self.K, self.bf, local_pts_cap)

        # `SLAM` modes 1-3: line-only pose optimization flavors
        # (reference src/Tracking.cc:4287-4291 dispatch)
        self.pose_opt_line_only = None
        if self.use_lines and int(cfg.slam_mode) in (1, 2, 3):
            self.pose_opt_line_only = KN.make_pose_opt_line_only(
                self.K, self.local_ln_cap, int(cfg.slam_mode))
        self.last_line_feats = None
        self.last_feat_ln = None

        # inertial machinery (used when sensor has IMU)
        self.use_imu = cfg.sensor in (3, 4)  # IMU_MONOCULAR / IMU_STEREO
        from ..ops import imu as IMUOPS
        self._imu_ops = IMUOPS
        self.calib = IMUOPS.make_calib(cfg.imu)
        Tbc = cfg.imu.Tbc_matrix()
        self.Tbc = Tbc.astype(np.float32)
        R_bc, t_bc = Tbc[:3, :3], Tbc[:3, 3]
        self.R_cb = np.asarray(R_bc.T, np.float32)
        self.t_cb = np.asarray(-R_bc.T @ t_bc, np.float32)
        self.gravity_w = np.array([0, 0, -cfg.imu.gravity], np.float32)
        # IMU_STEREO: the right-eye residual joins the inertial pose opt
        # (reference EdgeStereoOnlyPose in PoseInertialOptimization*,
        # src/Optimizer.cc:13659ff)
        self.vi_pose_opt = KN.make_vi_pose_optimizer(
            self.K, local_pts_cap, self.R_cb, self.t_cb, cfg.imu.gravity,
            bf=self.bf if (cfg.sensor == 4 and self.bf > 0
                           and self.kb8 is None) else 0.0)
        # frame-to-frame marginalization prior carried between VI solves
        # (reference ConstraintPoseImu, include/G2oTypes.h:848-929;
        # produced/consumed by PoseInertialOptimizationLastFrame,
        # src/Optimizer.cc:13980).  Invalidated whenever the frame state
        # is rewritten externally (map transform, BA resync, reloc, loss).
        self.prior_H15: Optional[np.ndarray] = None
        self._prior_frame_idx = -10
        # raw IMU buffered since the last keyframe (for exact
        # reintegration; reference Tracking::mlQueueImuData)
        self.imu_since_kf: list = []
        self.last_frame_time: Optional[float] = None
        # frame inertial state (body)
        self.frame_vel = np.zeros(3, np.float32)
        self.frame_bg = np.zeros(3, np.float32)
        self.frame_ba = np.zeros(3, np.float32)

        # localization-only mode: track against the frozen map, never
        # insert keyframes or new landmarks (reference mbOnlyTracking,
        # System::ActivateLocalizationMode include/System.h:126-128,
        # src/Tracking.cc "pure localization" branches)
        self.only_tracking = False

        self.state = TrackState.NO_IMAGES_YET
        self.last_feats: Optional[Features] = None
        self.last_pose_cw: Optional[np.ndarray] = None       # [3,4]
        self.last_feat_pt: Optional[np.ndarray] = None       # [F] map-pt per feat
        self.velocity: Optional[np.ndarray] = None           # [3,4] T_cl (cur-from-last)
        self.ref_kf: int = INVALID
        self.init_feats: Optional[Features] = None
        self.init_timestamp: float = 0.0
        self.last_kf_frame_idx = 0
        self.last_kf_time = -1e18   # timestamp of the last CREATED KF
        # the temporal-chain predecessor: the last CREATED keyframe
        # (reference mpLastKeyFrame) — DISTINCT from ref_kf, which is
        # re-selected per frame for the local-map gather (reference
        # mpReferenceKF); linking kf_prev to the re-selected ref would
        # corrupt the inertial preintegration chain
        self.last_created_kf: int = INVALID
        self.frame_idx = 0
        self.frames: List[FrameRecord] = []
        self.new_kf_queue: List[int] = []
        self.lost_count = 0
        self._key = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------
    @property
    def map(self) -> MapStore:
        return self.atlas.current

    def grab_imu(self, gyro: np.ndarray, acc: np.ndarray,
                 dts: np.ndarray) -> None:
        """Buffer IMU samples arriving before the next frame (reference
        Tracking::GrabImuData src/Tracking.cc:1388)."""
        if len(gyro):
            self.imu_since_kf.append(
                (np.asarray(gyro, np.float32), np.asarray(acc, np.float32),
                 np.asarray(dts, np.float32)))

    def _preintegrate_batches(self, batches, bg, ba):
        """Preintegrate a list of (gyro, acc, dt) batches, padded to a
        static capacity."""
        from ..ops import imu as IMUOPS
        if batches:
            g = np.concatenate([b[0] for b in batches])
            a = np.concatenate([b[1] for b in batches])
            d = np.concatenate([b[2] for b in batches])
        else:
            g = np.zeros((0, 3), np.float32)
            a = np.zeros((0, 3), np.float32)
            d = np.zeros((0,), np.float32)
        cap = self.imu_cap
        while cap < len(g):
            cap *= 2
        gg = np.zeros((cap, 3), np.float32)
        aa = np.zeros((cap, 3), np.float32)
        dd = np.zeros((cap,), np.float32)
        mm = np.zeros((cap,), bool)
        gg[:len(g)] = g
        aa[:len(a)] = a
        dd[:len(d)] = d
        mm[:len(d)] = True
        return IMUOPS.preintegrate(
            jnp.asarray(gg), jnp.asarray(aa), jnp.asarray(dd),
            jnp.asarray(mm), self.calib,
            jnp.asarray(bg, jnp.float32), jnp.asarray(ba, jnp.float32))

    def process_frame(self, feats: Features, timestamp: float,
                      imu: Optional[tuple] = None,
                      line_feats=None,
                      depth: Optional[np.ndarray] = None,
                      line_depth: Optional[tuple] = None) -> Optional[np.ndarray]:
        """Returns T_cw [3,4] or None while not tracking.  `imu` is an
        optional (gyro [k,3], acc [k,3], dt [k]) batch since last frame;
        `line_feats` an optional ops.lines.LineFeatures; `depth` an
        optional per-feature depth array [F] (stereo/RGB-D modes; <=0
        marks no depth)."""
        self.frame_idx += 1
        self._frame_imu = None
        self._pred_wb = None
        self._frame_lines = line_feats
        self._frame_depth = depth
        self._frame_line_depth = line_depth
        # timestamp-jump guards (reference src/Tracking.cc:2226-2252):
        # an out-of-order frame is dropped; a large forward gap cannot
        # be bridged by the motion model or preintegration, so the
        # session continues in a FRESH Atlas map (merged back later by
        # loop closing — the elastic-recovery path)
        if self.last_frame_time is not None \
                and self.state in (TrackState.OK, TrackState.RECENTLY_LOST):
            dt_frame = timestamp - self.last_frame_time
            if dt_frame < 0:
                return None
            if dt_frame > 3.0:
                self.state = TrackState.LOST
                self._handle_lost()
                self.last_frame_time = timestamp
                return None
        self.last_frame_time = timestamp
        if self.use_imu and imu is not None:
            with self.metrics.stage("track/preintegrate"):
                self.grab_imu(*imu)
            self._frame_imu = imu
        if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
            if depth is not None:
                self._initialize_with_depth(feats, timestamp)
            else:
                self._initialize_mono(feats, timestamp)
            if self.state == TrackState.OK:
                return self.last_pose_cw
            return None

        if self.state == TrackState.LOST and (self.only_tracking
                                              or self.last_pose_cw is None):
            # pure localization re-entry, or re-entry into a loaded atlas
            # with no prior pose (System.load_atlas): relocalize against
            # the map — _track_frame needs last_pose_cw and must not run
            ok = self._relocalize(feats)
        else:
            ok = self._track_frame(feats)
        vi_mode = self.use_imu and self.map.imu_initialized
        if not ok and self.state == TrackState.RECENTLY_LOST:
            if not vi_mode:
                # visual-only in-map relocalization: BoW candidates + PnP
                # RANSAC (reference Tracking::Relocalization
                # src/Tracking.cc:5744; the inertial path instead
                # dead-reckons below, :2373-2402)
                ok = self._relocalize(feats)
            elif self.lost_count >= int(0.5 * self.cfg.camera.fps):
                # VI bridge: the reference only dead-reckons while
                # RECENTLY_LOST and gives up into a new map after 5 s
                # (src/Tracking.cc:2404).  Here, once dead-reckoning has
                # had 0.5 s to self-recover, ALSO try an in-map BoW
                # relocalization each frame: PnP against the whole map
                # escapes a locally-corrupted covisible window that
                # projection search from the dead-reckoned pose cannot
                # (the geometry that caused the loss keeps rejecting it).
                # The dead-reckoned IMU state is kept: on success only
                # the pose is snapped, velocity/biases carry over.
                snap = (None if self.last_pose_cw is None
                        else self.last_pose_cw.copy(),
                        self.ref_kf, self.velocity,
                        self.frame_vel.copy())
                imu_save = self._frame_imu
                self._frame_imu = None   # reloc pose is already at t
                ok = self._relocalize(feats)
                self._frame_imu = imu_save
                if ok:
                    self.frame_vel = snap[3]  # keep dead-reckoned vel
                    # the lost-period IMU buffer spans the pose
                    # discontinuity the snap just introduced (the
                    # reference sidesteps this by never relocalizing
                    # in-map while inertial, src/Tracking.cc:2404):
                    # drop it and skip the next inter-KF IMU factor so
                    # LIBA never integrates across the snap — missing
                    # preints are masked edges in every chain consumer.
                    self.imu_since_kf = []
                    self._skip_next_kf_imu = True
                else:
                    (self.last_pose_cw, self.ref_kf,
                     self.velocity, self.frame_vel) = snap
        if ok:
            self.lost_count = 0
            self.state = TrackState.OK
            self.metrics.add("track/inliers", self.last_n_inliers)
            if self._need_keyframe():
                with self.metrics.stage("track/kf_create"):
                    self._create_keyframe(feats, timestamp)
            self.frames.append(self._make_record(timestamp))
            return self.last_pose_cw
        else:
            self.lost_count += 1
            if self.lost_count > int(self.cfg.tracking.recently_lost_s
                                     * self.cfg.camera.fps):
                self.state = TrackState.LOST
                self._handle_lost()
                return None
            self.state = TrackState.RECENTLY_LOST
            if vi_mode and self._pred_wb is not None:
                # PRIMARY recently-lost pose source with IMU: hold the
                # dead-reckoned state (reference PredictStateIMU during
                # RECENTLY_LOST, src/Tracking.cc:2373-2388) so the next
                # frame's local-map projection search starts from a live
                # prior instead of a pose frozen at the loss frame; the
                # reference keeps emitting these poses into the
                # trajectory (motion-model update runs for
                # bOK||RECENTLY_LOST, src/Tracking.cc:2592-2604)
                prev_pose = self.last_pose_cw
                self.last_pose_cw = self._wb_to_cw(self._pred_wb)
                self.frame_vel = self._pred_vel.astype(np.float32)
                R_c, t_c = self.last_pose_cw[:, :3], self.last_pose_cw[:, 3]
                R_l, t_l = prev_pose[:, :3], prev_pose[:, 3]
                R_cl = R_c @ R_l.T
                self.velocity = np.concatenate(
                    [R_cl, (t_c - R_cl @ t_l)[:, None]], 1)
                self.frames.append(self._make_record(timestamp))
                return self.last_pose_cw
            return None

    # ------------------------------------------------------------------
    def _make_record(self, timestamp: float) -> FrameRecord:
        m = self.map
        T_rw = m.kf_pose_cw[self.ref_kf]
        R_rw, t_rw = T_rw[:, :3], T_rw[:, 3]
        R_cw, t_cw = self.last_pose_cw[:, :3], self.last_pose_cw[:, 3]
        # T_cr = T_cw * T_rw^{-1}
        R_cr = R_cw @ R_rw.T
        t_cr = t_cw - R_cr @ t_rw
        return FrameRecord(timestamp, self.ref_kf,
                           np.concatenate([R_cr, t_cr[:, None]], 1),
                           map_id=self.atlas.active)

    # ------------------------------------------------------------------
    # Monocular initialization
    # ------------------------------------------------------------------
    def _initialize_mono(self, feats: Features, timestamp: float) -> None:
        if self.init_feats is None or (timestamp - self.init_timestamp) > 1.0:
            n_valid = int(np.asarray(feats.valid).sum())
            if n_valid > 100:
                self.init_feats = feats
                self.init_line_feats = self._frame_lines
                self.init_timestamp = timestamp
                self.state = TrackState.NOT_INITIALIZED
                self.imu_since_kf = []  # IMU window starts at the init frame
            return

        f0, f1 = self.init_feats, feats
        dist = M.hamming_matrix(f0.desc, f1.desc)
        gate = M.window_gate(f0.uv_und, f1.uv_und, 100.0)
        idx, ok = M.match_nn_ratio(dist, f0.valid, f1.valid, gate,
                                   max_dist=60.0, ratio=0.9)
        # rotation-consistency: keep only the 3 dominant orientation-
        # difference bins (reference SearchForInitialization histogram,
        # src/ORBmatcher.cc:706 + ComputeThreeMaxima :1365-1397)
        ok = M.rotation_histogram_filter(f0.angle, f1.angle, idx, ok)
        n_matches = int(ok.sum())
        if n_matches < 80:
            self.init_feats = feats  # slide the window forward
            self.init_line_feats = self._frame_lines
            self.init_timestamp = timestamp
            self.imu_since_kf = []
            return

        uv0 = f0.uv_und
        uv1 = f1.uv_und[idx]
        self._key, sub = jax.random.split(self._key)
        res = TV.reconstruct_two_views(self.K, uv0, uv1, ok, sub)
        if not bool(res.success) or int(res.is_triangulated.sum()) < 60:
            return

        self._create_initial_map(f0, f1, idx, res, timestamp)

    def _create_initial_map(self, f0: Features, f1: Features,
                            idx: jnp.ndarray, res: TV.TwoViewResult,
                            timestamp: float) -> None:
        """reference: CreateInitialMapMonocular src/Tracking.cc:3167 —
        two KFs, scale by inverse median depth, init BA."""
        m = self.map
        tri = np.asarray(res.is_triangulated)
        X = np.asarray(res.points3d)[tri]          # camera-1 frame == world
        depth = X[:, 2]
        med = np.median(depth)
        X = X / med                                 # normalize scale
        t10 = np.asarray(res.t) / med

        kf0 = m.alloc_kf()
        kf1 = m.alloc_kf()
        m.kf_timestamp[kf0] = self.init_timestamp
        m.kf_timestamp[kf1] = timestamp
        m.kf_pose_cw[kf0] = np.eye(3, 4, dtype=np.float32)
        m.kf_pose_cw[kf1] = np.concatenate(
            [np.asarray(res.R), t10[:, None]], 1).astype(np.float32)
        m.kf_prev[kf1] = kf0
        m.kf_next[kf0] = kf1
        self._store_kf_features(kf0, f0, getattr(self, "init_line_feats", None))
        self._store_kf_features(kf1, f1, self._frame_lines)

        pts = m.alloc_points(tri.sum())
        m.pt_xyz[pts] = X.astype(np.float32)
        feat0_ids = np.nonzero(tri)[0]
        feat1_ids = np.asarray(idx)[tri]
        packed0 = np.asarray(M.pack_bits_u32(f0.desc))
        m.pt_desc[pts] = packed0[feat0_ids]
        m.pt_first_kf[pts] = kf0
        m.kf_match_pt[kf0, feat0_ids] = pts
        m.kf_match_pt[kf1, feat1_ids] = pts
        m.pt_n_obs[pts] = 2
        m.pt_found[pts] = 2
        m.pt_visible[pts] = 2
        m.update_covisibility(kf1)

        # line triangulation at initialization (reference
        # ReconstructwithLine, include/TwoViewReconstruction.h:55 +
        # Tracking::LineTriangulate src/Tracking.cc:6589): match the two
        # init frames' segments and intersect interpretation planes so
        # the initial map starts with lines, not just points
        lf0 = getattr(self, "init_line_feats", None)
        lf1 = self._frame_lines
        if self.use_lines and lf0 is not None and lf1 is not None:
            self._triangulate_init_lines(kf0, kf1, lf0, lf1)

        if self.use_imu:
            self.frame_vel = np.zeros(3, np.float32)
            self.frame_bg = np.zeros(3, np.float32)
            self.frame_ba = np.zeros(3, np.float32)
            m.kf_pose_wb[kf0] = self._cw_to_wb(m.kf_pose_cw[kf0])
            self._store_kf_inertial(kf1)

        self.ref_kf = kf1
        self.last_created_kf = kf1
        self.last_feats = f1
        self.last_pose_cw = np.asarray(m.kf_pose_cw[kf1])
        feat_pt = np.full(self.n_feat, INVALID, np.int32)
        feat_pt[feat1_ids] = pts
        self.last_feat_pt = feat_pt
        self.velocity = None
        self.state = TrackState.OK
        self.last_kf_frame_idx = self.frame_idx
        self.last_kf_time = timestamp
        self.new_kf_queue += [kf0, kf1]
        self.frames.append(self._make_record(timestamp))

    def _triangulate_init_lines(self, kf0: int, kf1: int, lf0, lf1) -> None:
        """Two-view line bootstrap between the init keyframes (reference
        Pinhole::ReconstructWithTwoViewswithLine -> LineTriangulate,
        src/Tracking.cc:6589)."""
        m = self.map
        if not hasattr(self, "_init_line_pair"):
            self._init_line_pair = KN.make_line_pair_matcher(self.n_line_feat)
            self._init_line_tri = KN.make_line_triangulator(
                self.K, self.n_line_feat)
        ang0 = np.arctan2(np.asarray(lf0.ep)[:, 3] - np.asarray(lf0.ep)[:, 1],
                          np.asarray(lf0.ep)[:, 2] - np.asarray(lf0.ep)[:, 0]) % np.pi
        ang1 = np.arctan2(np.asarray(lf1.ep)[:, 3] - np.asarray(lf1.ep)[:, 1],
                          np.asarray(lf1.ep)[:, 2] - np.asarray(lf1.ep)[:, 0]) % np.pi
        d0 = np.asarray(M.pack_bits_u32(lf0.desc))
        d1 = np.asarray(M.pack_bits_u32(lf1.desc))
        idx1, ok = self._init_line_pair(
            lf0.ep, jnp.asarray(d0), jnp.asarray(ang0, jnp.float32),
            lf0.valid, lf1.ep, jnp.asarray(d1),
            jnp.asarray(ang1, jnp.float32), lf1.valid)
        if int(np.asarray(ok).sum()) == 0:
            return
        ep1 = np.asarray(lf1.ep)[np.asarray(idx1)]
        Xs, Xe, good = self._init_line_tri(
            jnp.asarray(m.kf_pose_cw[kf0]), jnp.asarray(m.kf_pose_cw[kf1]),
            lf0.ep, jnp.asarray(ep1), ok)
        good_np = np.asarray(good)
        f0_ids = np.nonzero(good_np)[0]
        if len(f0_ids) == 0:
            return
        f1_ids = np.asarray(idx1)[f0_ids]
        lns = m.alloc_lines(len(f0_ids))
        n = len(lns)
        f0_ids, f1_ids = f0_ids[:n], f1_ids[:n]
        m.ln_ep[lns] = np.concatenate(
            [np.asarray(Xs)[f0_ids], np.asarray(Xe)[f0_ids]], -1)
        m.ln_desc[lns] = d0[f0_ids]
        m.ln_first_kf[lns] = kf0
        m.ln_n_obs[lns] = 2
        m.ln_found[lns] = 2
        m.ln_visible[lns] = 2
        m.kf_match_ln[kf0, f0_ids] = lns
        m.kf_match_ln[kf1, f1_ids] = lns

    def _initialize_with_depth(self, feats: Features, timestamp: float) -> None:
        """Stereo/RGB-D bootstrap: one keyframe, map points straight from
        depth (reference Tracking::StereoInitialization)."""
        depth = self._frame_depth
        good = np.asarray(feats.valid) & (depth > 0.1) & (depth < 60.0)
        if good.sum() < 100:
            return
        m = self.map
        kf = m.alloc_kf()
        m.kf_timestamp[kf] = timestamp
        m.kf_pose_cw[kf] = np.eye(3, 4, dtype=np.float32)
        self._store_kf_features(kf, feats, self._frame_lines)
        uv = np.asarray(feats.uv_und)
        ids = np.nonzero(good)[0]
        pts = m.alloc_points(len(ids))
        ids = ids[:len(pts)]
        z = depth[ids]
        X = np.stack([(uv[ids, 0] - self.K.cx) / self.K.fx * z,
                      (uv[ids, 1] - self.K.cy) / self.K.fy * z, z], -1)
        m.pt_xyz[pts] = X.astype(np.float32)
        m.pt_desc[pts] = np.asarray(M.pack_bits_u32(feats.desc))[ids]
        m.pt_first_kf[pts] = kf
        m.kf_match_pt[kf, ids] = pts
        m.pt_n_obs[pts] = 1
        m.pt_found[pts] = 1
        m.pt_visible[pts] = 1
        if self._frame_line_depth is not None:
            self._create_depth_lines(kf)
        self.ref_kf = kf
        self.last_created_kf = kf
        self.last_feats = feats
        self.last_pose_cw = np.eye(3, 4, dtype=np.float32)
        feat_pt = np.full(self.n_feat, INVALID, np.int32)
        feat_pt[ids] = pts
        self.last_feat_pt = feat_pt
        self.velocity = None
        self.state = TrackState.OK
        self.last_kf_frame_idx = self.frame_idx
        self.last_kf_time = timestamp
        self.new_kf_queue.append(kf)
        if self.use_imu:
            m.kf_pose_wb[kf] = self._cw_to_wb(m.kf_pose_cw[kf])
            self.imu_since_kf = []
        self.frames.append(self._make_record(timestamp))

    def _create_depth_points(self, kf: int, feats: Features) -> None:
        """Close-point creation from depth at KF insertion (reference
        CreateNewKeyFrame's stereo close-point seeding)."""
        depth = self._frame_depth
        if depth is None:
            return
        m = self.map
        unbound = (m.kf_match_pt[kf] == INVALID) & m.kf_feat_valid[kf]
        good = unbound[:len(depth)] & (depth > 0.1) & (depth < 40.0)
        ids = np.nonzero(good)[0][:300]
        if len(ids) == 0:
            return
        pts = m.alloc_points(len(ids))
        ids = ids[:len(pts)]
        uv = m.kf_feat_uv[kf]
        z = depth[ids]
        Xc = np.stack([(uv[ids, 0] - self.K.cx) / self.K.fx * z,
                       (uv[ids, 1] - self.K.cy) / self.K.fy * z, z], -1)
        R_cw = m.kf_pose_cw[kf, :, :3]
        t_cw = m.kf_pose_cw[kf, :, 3]
        Xw = (Xc - t_cw) @ R_cw
        m.pt_xyz[pts] = Xw.astype(np.float32)
        m.pt_desc[pts] = m.kf_feat_desc[kf][ids]
        m.pt_first_kf[pts] = kf
        m.kf_match_pt[kf, ids] = pts
        m.pt_n_obs[pts] = 1
        m.pt_found[pts] = 1
        m.pt_visible[pts] = 1

    def _create_depth_lines(self, kf: int) -> None:
        """Stereo/RGB-D map-line seeding: the rectified stereo line match
        gives both endpoint depths, so the 3D line lands directly without
        two-view triangulation (reference: ComputeStereoMatches_Lines
        src/Frame.cc:1408 feeding stereo KF line creation)."""
        lf = self._frame_lines
        if lf is None or self._frame_line_depth is None:
            return
        m = self.map
        ds, de, has = self._frame_line_depth
        nl = min(m.n_line_feat, lf.ep.shape[0])
        unbound = (m.kf_match_ln[kf, :nl] == INVALID) & m.kf_line_valid[kf, :nl]
        zok = lambda z: (z[:nl] > 0.1) & (z[:nl] < 40.0)
        good = unbound & has[:nl] & zok(ds) & zok(de)
        ids = np.nonzero(good)[0][:128]
        if len(ids) == 0:
            return
        lns = m.alloc_lines(len(ids))
        ids = ids[:len(lns)]
        ep = np.asarray(lf.ep)[:nl]     # undistorted (x0,y0,x1,y1)

        def backproj(uv, z):
            return np.stack([(uv[:, 0] - self.K.cx) / self.K.fx * z,
                             (uv[:, 1] - self.K.cy) / self.K.fy * z, z], -1)
        Xs = backproj(ep[ids, :2], ds[ids])
        Xe = backproj(ep[ids, 2:], de[ids])
        R_cw = m.kf_pose_cw[kf, :, :3]
        t_cw = m.kf_pose_cw[kf, :, 3]
        to_w = lambda Xc: (Xc - t_cw) @ R_cw
        m.ln_ep[lns] = np.concatenate(
            [to_w(Xs), to_w(Xe)], -1).astype(np.float32)
        m.ln_desc[lns] = m.kf_line_desc[kf][ids]
        m.ln_first_kf[lns] = kf
        m.kf_match_ln[kf, ids] = lns
        m.ln_n_obs[lns] = 1
        m.ln_found[lns] = 1
        m.ln_visible[lns] = 1

    def _store_kf_features(self, kf: int, f: Features,
                           lf=None) -> None:
        m = self.map
        n = min(self.n_feat, f.uv.shape[0])
        m.kf_feat_uv[kf, :n] = np.asarray(f.uv_und)[:n]
        m.kf_feat_uv_raw[kf, :n] = np.asarray(f.uv)[:n]
        m.kf_feat_octave[kf, :n] = np.asarray(f.octave)[:n]
        m.kf_feat_angle[kf, :n] = np.asarray(f.angle)[:n]
        m.kf_feat_desc[kf, :n] = np.asarray(M.pack_bits_u32(f.desc))[:n]
        m.kf_feat_valid[kf, :n] = np.asarray(f.valid)[:n]
        if lf is not None:
            nl = min(m.n_line_feat, lf.ep.shape[0])
            m.kf_line_ep[kf, :nl] = np.asarray(lf.ep)[:nl]
            m.kf_line_desc[kf, :nl] = np.asarray(M.pack_bits_u32(lf.desc))[:nl]
            m.kf_line_valid[kf, :nl] = np.asarray(lf.valid)[:nl]

    # ------------------------------------------------------------------
    # Body <-> camera pose conversion (Tbc maps camera->body)
    # ------------------------------------------------------------------
    def _cw_to_wb(self, pose_cw: np.ndarray) -> np.ndarray:
        """T_wb = T_wc o T_cb  (T_cb = camera-from-body = Tbc^{-1})."""
        R_cw, t_cw = pose_cw[:, :3], pose_cw[:, 3]
        R_wc = R_cw.T
        p_wc = -R_wc @ t_cw
        R_wb = R_wc @ self.R_cb
        p_wb = R_wc @ self.t_cb + p_wc
        return np.concatenate([R_wb, p_wb[:, None]], 1).astype(np.float32)

    def _wb_to_cw(self, pose_wb: np.ndarray) -> np.ndarray:
        R_wb, p_wb = pose_wb[:, :3], pose_wb[:, 3]
        R_bc = self.Tbc[:3, :3]
        t_bc = self.Tbc[:3, 3]
        R_wc = R_wb @ R_bc
        p_wc = R_wb @ t_bc + p_wb
        R_cw = R_wc.T
        t_cw = -R_cw @ p_wc
        return np.concatenate([R_cw, t_cw[:, None]], 1).astype(np.float32)

    def invalidate_vi_prior(self) -> None:
        """Drop the frame-to-frame marginalization prior: the carried
        linearization no longer matches the frame state (map transform,
        BA resync, merge, relocalization, loss) — the reference deletes
        mpcpi on the same events (src/Optimizer.cc:14401,
        src/Tracking.cc map-update branches switch to LastKeyFrame)."""
        self.prior_H15 = None
        self._prior_frame_idx = -10

    def apply_map_transform(self, R_gw: np.ndarray, scale: float) -> None:
        """Bring the tracker's frame state into the new gravity-aligned
        metric frame after IMU init (reference Tracking::UpdateFrameIMU,
        src/Tracking.cc:6117)."""
        self.invalidate_vi_prior()
        R_gw = np.asarray(R_gw, np.float32)
        R_cw, t_cw = self.last_pose_cw[:, :3], self.last_pose_cw[:, 3]
        self.last_pose_cw = np.concatenate(
            [R_cw @ R_gw.T, (scale * t_cw)[:, None]], 1).astype(np.float32)
        self.frame_vel = scale * (R_gw @ self.frame_vel)
        # stored frame records hold T_cr relative to their ref KF; under a
        # similarity the rotation is invariant but the translation scales
        # (reference scales mlRelativeFramePoses in UpdateFrameIMU).
        # Only records anchored in the ACTIVE map are affected.
        for rec in self.frames:
            if rec.map_id != self.atlas.active:
                continue
            rec.T_cr = rec.T_cr.copy()
            rec.T_cr[:, 3] *= scale
        m = self.map
        kfs = m.kf_chain()
        if len(kfs):
            newest = kfs[-1]
            self.frame_bg = m.kf_bias_g[newest].copy()
            self.frame_ba = m.kf_bias_a[newest].copy()
            self.frame_vel = m.kf_vel[newest].copy()
        self.velocity = None  # motion model invalid across the jump

    # ------------------------------------------------------------------
    def on_map_merged(self, s: float, R: np.ndarray, t: np.ndarray,
                      kf_map: np.ndarray, pt_map: np.ndarray,
                      ln_map: np.ndarray, merged_atlas_index: int,
                      new_atlas_index: int) -> None:
        """Rebind transient tracking state after loop closing merged the
        active map into an older Atlas map (reference: after MergeLocal
        the Tracking thread continues in the merged map,
        src/LoopClosing.cc:2448ff).  The merged-in map was re-expressed
        as X' = s R X + t and its slots remapped by kf_map/pt_map."""
        self.invalidate_vi_prior()
        R = np.asarray(R, np.float32)
        t = np.asarray(t, np.float32)
        if self.last_pose_cw is not None:
            R_cw, t_cw = self.last_pose_cw[:, :3], self.last_pose_cw[:, 3]
            R_new = R_cw @ R.T
            self.last_pose_cw = np.concatenate(
                [R_new, (s * t_cw - R_new @ t)[:, None]], 1).astype(np.float32)
        if self.velocity is not None:
            vel = self.velocity.copy()
            vel[:, 3] *= s
            self.velocity = vel
        self.frame_vel = s * (R @ self.frame_vel)
        if self.last_feat_pt is not None:
            fp = self.last_feat_pt
            self.last_feat_pt = np.where(
                fp >= 0, pt_map[np.maximum(fp, 0)], INVALID).astype(np.int32)
        if self.last_feat_ln is not None:
            fl = self.last_feat_ln
            self.last_feat_ln = np.where(
                fl >= 0, ln_map[np.maximum(fl, 0)], INVALID).astype(np.int32)
        if self.ref_kf != INVALID and kf_map[self.ref_kf] >= 0:
            self.ref_kf = int(kf_map[self.ref_kf])
        if self.last_created_kf != INVALID \
                and kf_map[self.last_created_kf] >= 0:
            self.last_created_kf = int(kf_map[self.last_created_kf])
        # trajectory records: merged-map records follow their ref KF into
        # the surviving map (relative translations scale by s); records
        # in maps behind the removed Atlas slot shift down one index
        for rec in self.frames:
            if rec.map_id == merged_atlas_index:
                rec.map_id = new_atlas_index
                if kf_map[rec.ref_kf] >= 0:
                    rec.ref_kf = int(kf_map[rec.ref_kf])
                rec.T_cr = rec.T_cr.copy()
                rec.T_cr[:, 3] *= s
            elif rec.map_id > merged_atlas_index:
                rec.map_id -= 1

    # ------------------------------------------------------------------
    # Frame tracking
    # ------------------------------------------------------------------
    def _predict_pose(self) -> np.ndarray:
        if self.velocity is None:
            return self.last_pose_cw
        R_v, t_v = self.velocity[:, :3], self.velocity[:, 3]
        R_l, t_l = self.last_pose_cw[:, :3], self.last_pose_cw[:, 3]
        R = R_v @ R_l
        t = R_v @ t_l + t_v
        return np.concatenate([R, t[:, None]], 1)

    def _track_reference_kf(self, feats: Features, pose_pred):
        """Descriptor-only matching of the frame against the reference
        keyframe's bound map points (reference
        TrackReferenceKeyFrameWithLines src/Tracking.cc:3503: BoW-bucket
        matching vs the ref KF + pose opt from the last pose; the dense
        Hamming matmul subsumes the buckets).  Returns the same tuple
        layout as proj_match plus the gathered slots, or None."""
        m = self.map
        kf = self.ref_kf
        if kf < 0 or not m.kf_valid[kf]:
            return None
        bound = np.nonzero(m.kf_match_pt[kf] >= 0)[0]
        if len(bound) < 15:
            return None
        cap = self.local_cap
        n = min(len(bound), cap)
        bound = bound[:n]
        pts = m.kf_match_pt[kf, bound]
        ids = np.full(cap, -1, np.int64)
        ids[:n] = pts
        safe = np.clip(ids, 0, m.max_pts - 1)
        live = (ids >= 0) & m.pt_valid[safe]
        xyz = m.pt_xyz[safe]
        desc = np.zeros((cap, 8), np.uint32)
        desc[:n] = m.kf_feat_desc[kf, bound]
        dist = M.hamming_matrix(
            M.unpack_u32_to_pm1(jnp.asarray(desc)), feats.desc)
        idx, ok = M.match_nn_ratio(
            dist, jnp.asarray(live), feats.valid, None,
            max_dist=60.0, ratio=0.75, mutual=True)
        uv_m = (feats.uv if self.kb8 is not None else feats.uv_und)[idx]
        ok_np = np.asarray(ok)
        idx_np = np.asarray(idx)
        feat_pt = np.full(self.n_feat, -1, np.int32)
        slots = np.nonzero(ok_np)[0]
        feat_pt[idx_np[slots]] = slots
        return (uv_m, idx.astype(jnp.int32), ok, jnp.asarray(feat_pt),
                ids, live, jnp.asarray(xyz))

    def _match_and_record_lines(self, pose) -> int:
        """Match local map lines against this frame's detected segments
        at a given (already-optimized) pose and record the observation
        bindings + found/visible stats — the bookkeeping half of the
        line branch, used in VI mode where the pose itself comes from
        the inertial optimizer (reference Tracking.cc:3988-4061)."""
        m = self.map
        lf = self._frame_lines
        ln_ids, ln_live, (ln_ep6, ln_desc) = self._gather_local_lines()
        obs_desc = M.pack_bits_u32(lf.desc)
        ln_feat_idx, ln_matched, _ = self.line_proj_match(
            jnp.asarray(pose), jnp.asarray(ln_ep6),
            jnp.asarray(ln_desc), jnp.asarray(ln_live),
            lf.ep, obs_desc, lf.angle, lf.valid, lf.lineq)
        matched_np = np.asarray(ln_matched)
        ln_feat_np = np.asarray(ln_feat_idx)
        feat_ln = np.full(self.n_line_feat, INVALID, np.int32)
        good_l = np.nonzero(matched_np)[0]
        feat_ln[ln_feat_np[good_l]] = ln_ids[good_l]
        self.last_feat_ln = feat_ln
        self.last_line_feats = lf
        m.ln_visible[ln_ids[ln_live]] += 1
        m.ln_found[ln_ids[good_l]] += 1
        return len(good_l)

    def _gather_local_lines(self):
        """Local map lines from the covisibility neighborhood (reference
        UpdateLocalPointsAndLines, src/Tracking.cc:5354)."""
        m = self.map
        kfs = m.covisible_kfs(self.ref_kf, n=10, min_weight=5)
        kfs = np.concatenate([[self.ref_kf], kfs])
        ids = m.local_map_lines(kfs, self.local_ln_cap)
        live = ids >= 0
        safe = np.clip(ids, 0, m.max_lines - 1)
        return ids, live & m.ln_valid[safe], (m.ln_ep[safe], m.ln_desc[safe])

    def _gather_local_points(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Local map = points of ref KF's covisibility neighborhood
        (reference UpdateLocalPointsAndLines, src/Tracking.cc:5354)."""
        m = self.map
        kfs = m.covisible_kfs(self.ref_kf, n=10, min_weight=5)
        kfs = np.concatenate([[self.ref_kf], kfs])
        ids = m.local_map_points(kfs, self.local_cap)
        live = ids >= 0
        safe = np.clip(ids, 0, m.max_pts - 1)
        xyz = m.pt_xyz[safe]
        desc = m.pt_desc[safe]
        stats = (m.pt_normal[safe], m.pt_min_dist[safe],
                 m.pt_max_dist[safe])
        return ids, live & m.pt_valid[safe], (xyz, desc), stats

    def _track_frame(self, feats: Features) -> bool:
        m = self.map
        vi_mode = self.use_imu and m.imu_initialized
        # snapshot the inertial frame state: the VI pose optimizer below
        # mutates vel/bias before the inlier check, and a failed fit
        # must not poison the dead-reckoning state used while
        # RECENTLY_LOST
        bg_in, ba_in = self.frame_bg.copy(), self.frame_ba.copy()
        vel_in = self.frame_vel.copy()
        preint_frame = None
        if vi_mode and self._frame_imu is not None:
            # IMU state prediction from the last frame (reference
            # PredictStateIMU, src/Tracking.cc:1507)
            preint_frame = self._preintegrate_batches(
                [self._frame_imu], self.frame_bg, self.frame_ba)
            last_wb = self._cw_to_wb(self.last_pose_cw)
            R2, v2, p2 = self._imu_ops.predict_state(
                preint_frame, jnp.asarray(last_wb[:, :3]),
                jnp.asarray(self.frame_vel), jnp.asarray(last_wb[:, 3]),
                jnp.asarray(self.gravity_w))
            pred_wb = np.concatenate(
                [np.asarray(R2), np.asarray(p2)[:, None]], 1).astype(np.float32)
            pose_pred = self._wb_to_cw(pred_wb)
            self._pred_wb = pred_wb
            self._pred_vel = np.asarray(v2)
        else:
            pose_pred = self._predict_pose()
        ids, live, (xyz, desc), (nrm, dmin, dmax) = \
            self._gather_local_points()

        # search-window radius: the reference's SearchByProjection uses
        # 2.5-4 px (octave-scaled) around the predicted projection
        # (src/ORBmatcher.cc:~160 th=1 branch); the IMU prediction is
        # sub-pixel over one frame, so VI mode gets a tight 6 px gate —
        # the flat 15 px window held ~6x the area and in dense texture
        # admitted aliased descriptor matches that drowned the true
        # inliers (observed 412 matched / 53 consistent before the
        # t~10 s circuit loss).  The widen-retry below still recovers
        # when the prediction is genuinely off.
        if vi_mode:
            radius = 6.0
        elif self.velocity is not None:
            radius = 15.0
        else:
            radius = 40.0
        # KB8-native mode matches/optimizes against RAW pixels
        obs_uv = feats.uv if self.kb8 is not None else feats.uv_und
        uv_m, pt_feat, matched, feat_pt = self.proj_match(
            jnp.asarray(pose_pred), jnp.asarray(xyz), jnp.asarray(desc),
            jnp.asarray(live), obs_uv,
            M.pack_bits_u32(feats.desc), feats.octave, feats.valid,
            jnp.float32(radius), pt_normal=jnp.asarray(nrm),
            pt_min_dist=jnp.asarray(dmin), pt_max_dist=jnp.asarray(dmax))
        n_matched = int(matched.sum())
        if n_matched < self.cfg.tracking.min_matches_track:
            # widen the search once (reference doubles the window),
            # dropping the scale/angle gates too
            uv_m, pt_feat, matched, feat_pt = self.proj_match(
                jnp.asarray(pose_pred), jnp.asarray(xyz), jnp.asarray(desc),
                jnp.asarray(live), obs_uv,
                M.pack_bits_u32(feats.desc), feats.octave, feats.valid,
                jnp.float32(radius * 3))
            n_matched = int(matched.sum())
            if n_matched < self.cfg.tracking.min_matches_track:
                # last resort: descriptor-only matching against the
                # reference KF's bound features, no projection window
                # (reference TrackReferenceKeyFrameWithLines,
                # src/Tracking.cc:3503 — BoW-bucketed there; the dense
                # Hamming matmul covers all buckets at once here)
                ok_ref = self._track_reference_kf(feats, pose_pred)
                if not ok_ref:
                    if os.environ.get("PLVIO_TRACE"):
                        print(f"[trace] f={self.frame_idx} st={self.state.name} "
                              f"ref={self.ref_kf} nm={n_matched} FAIL "
                              f"no-ref-kf-fallback", flush=True)
                    return False
                uv_m, pt_feat, matched, feat_pt, ids, live, xyz = ok_ref
                n_matched = int(matched.sum())
                if n_matched < self.cfg.tracking.min_matches_track:
                    return False

        inv_sigma2 = 1.0 / (1.2 ** (2.0 * np.asarray(
            feats.octave, np.float32)))
        is2 = jnp.asarray(inv_sigma2)[pt_feat]
        if vi_mode and preint_frame is not None:
            last_wb = self._cw_to_wb(self.last_pose_cw)
            pre_const = {
                "dT": preint_frame.dT, "dR": preint_frame.dR,
                "dV": preint_frame.dV, "dP": preint_frame.dP,
                "JRg": preint_frame.JRg, "JVg": preint_frame.JVg,
                "JVa": preint_frame.JVa, "JPg": preint_frame.JPg,
                "JPa": preint_frame.JPa,
                "bg0": preint_frame.bias_gyro, "ba0": preint_frame.bias_acc}
            C9 = np.asarray(preint_frame.C)[:9, :9] + np.eye(9) * 1e-8
            imu_info = jnp.asarray(np.linalg.inv(C9), jnp.float32)
            # random-walk information over this frame interval
            dT = max(float(preint_frame.dT), 1e-3)
            n_samp = dT * self.cfg.imu.frequency
            rw_info = np.concatenate([
                np.full(3, 1.0 / (self.cfg.imu.gyro_walk ** 2 * n_samp)),
                np.full(3, 1.0 / (self.cfg.imu.acc_walk ** 2 * n_samp))])
            # stereo/RGB-D depth -> u_R third residual where available
            uv_np = np.asarray(uv_m)
            ur_col = np.full(len(uv_np), -1.0, np.float32)
            if self.bf > 0 and self._frame_depth is not None:
                depth = self._frame_depth
                pf = np.asarray(pt_feat)
                safe_f = np.clip(pf, 0, len(depth) - 1)
                z_f = np.where((pf >= 0) & (pf < len(depth)),
                               depth[safe_f], -1.0)
                ur_col = np.where(z_f > 0.1,
                                  uv_np[:, 0] - self.bf / np.maximum(z_f, 0.1),
                                  -1.0).astype(np.float32)
            uvr = jnp.asarray(
                np.concatenate([uv_np, ur_col[:, None]], 1), jnp.float32)
            # LastFrame flavor when the previous frame's marginalization
            # prior is live; LastKeyFrame (fixed-prev) otherwise
            have_prior = (self.prior_H15 is not None
                          and self._prior_frame_idx == self.frame_idx - 1)
            self._last_have_prior = have_prior
            if have_prior:
                prior_info = jnp.asarray(self.prior_H15, jnp.float32)
            else:
                prior_info = jnp.eye(15, dtype=jnp.float32)
            prior_const = {
                "R0": jnp.asarray(last_wb[:, :3], jnp.float32),
                "p0": jnp.asarray(last_wb[:, 3], jnp.float32),
                "v0": jnp.asarray(self.frame_vel, jnp.float32),
                "bg0": jnp.asarray(self.frame_bg, jnp.float32),
                "ba0": jnp.asarray(self.frame_ba, jnp.float32)}
            pose_wb, vel, bg, ba, inlier, n_inl, H15 = self.vi_pose_opt(
                jnp.asarray(self._pred_wb), jnp.asarray(self._pred_vel),
                jnp.asarray(self.frame_bg), jnp.asarray(self.frame_ba),
                uvr, jnp.asarray(xyz), matched, is2,
                jnp.asarray(last_wb), jnp.asarray(self.frame_vel),
                pre_const, imu_info,
                jnp.asarray(rw_info, jnp.float32),
                prior_const, prior_info, have_prior)
            pose = self._wb_to_cw(np.asarray(pose_wb))
            self.frame_vel = np.asarray(vel)
            self.frame_bg = np.asarray(bg)
            self.frame_ba = np.asarray(ba)
            H15 = np.asarray(H15)
            if np.isfinite(H15).all():
                # jitter keeps the whitening cholesky of the carried
                # information PD (reference adds none: g2o's solver
                # tolerates PSD; our sqrt-info whitening does not)
                self.prior_H15 = H15 + np.eye(15, dtype=np.float32) * 1e-4
                self._prior_frame_idx = self.frame_idx
            else:
                self.prior_H15 = None
            pose = jnp.asarray(pose)
            # line matching still runs in VI mode (reference
            # src/Tracking.cc:3988-4061 matches lines regardless of IMU;
            # only the pose optimizer dispatch differs, :4282-4315) —
            # observations feed map-line creation/culling and the PL
            # local BA even though the inertial pose-only opt is
            # point+IMU (parity with PoseInertialOptimizationLastFrame)
            if self.use_lines and self._frame_lines is not None:
                self._match_and_record_lines(pose)
        elif self.use_lines and self._frame_lines is not None:
            lf = self._frame_lines
            ln_ids, ln_live, (ln_ep6, ln_desc) = self._gather_local_lines()
            obs_desc = M.pack_bits_u32(lf.desc)
            ln_feat_idx, ln_matched, l_eq = self.line_proj_match(
                jnp.asarray(pose_pred), jnp.asarray(ln_ep6),
                jnp.asarray(ln_desc), jnp.asarray(ln_live),
                lf.ep, obs_desc, lf.angle, lf.valid, lf.lineq)
            if self.pose_opt_line_only is not None \
                    and int(jnp.sum(ln_matched)) >= 8:
                # SLAM modes 1-3: pose from lines alone (reference
                # PoseOptimizationOnlyLine(+Angles), src/Optimizer.cc:3406)
                ep_obs = np.asarray(lf.ep)[np.asarray(ln_feat_idx)]
                dirs = ep_obs[:, 2:] - ep_obs[:, :2]
                dirs = dirs / np.maximum(
                    np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-6)
                pose, inl_l, n_inl_l = self.pose_opt_line_only(
                    jnp.asarray(pose_pred), l_eq,
                    jnp.asarray(dirs, jnp.float32),
                    jnp.asarray(ln_ep6[:, :3]), jnp.asarray(ln_ep6[:, 3:]),
                    ln_matched, jnp.ones(self.local_ln_cap, jnp.float32))
                # point inliers at the line-only pose (bookkeeping only)
                pose_np = np.asarray(pose)
                pc = np.asarray(xyz) @ pose_np[:, :3].T + pose_np[:, 3]
                z_ = np.maximum(pc[:, 2], 1e-4)
                pred = np.stack([
                    self.K.fx * pc[:, 0] / z_ + self.K.cx,
                    self.K.fy * pc[:, 1] / z_ + self.K.cy], -1)
                r2 = np.sum((pred - np.asarray(uv_m)) ** 2, -1)
                chi2 = r2 * np.asarray(is2)
                inlier = jnp.asarray(np.asarray(matched) & (chi2 < 5.991)
                                     & (pc[:, 2] > 0.05))
                n_inl = int(n_inl_l) + int(jnp.sum(inlier))
            else:
                args = (jnp.asarray(pose_pred), uv_m, jnp.asarray(xyz),
                        matched, is2, l_eq,
                        jnp.asarray(ln_ep6[:, :3]), jnp.asarray(ln_ep6[:, 3:]),
                        ln_matched, jnp.ones(self.local_ln_cap, jnp.float32))
                if self.pl_stereo:
                    # u_R depth residual for features with stereo depth
                    ur_col = np.full(self.local_cap, -1.0, np.float32)
                    if self._frame_depth is not None:
                        depth = self._frame_depth
                        pf = np.asarray(pt_feat)
                        safe_f = np.clip(pf, 0, len(depth) - 1)
                        z_f = np.where((pf >= 0) & (pf < len(depth)),
                                       depth[safe_f], -1.0)
                        uv_np = np.asarray(uv_m)
                        ur_col = np.where(
                            z_f > 0.1,
                            uv_np[:, 0] - self.bf / np.maximum(z_f, 0.1),
                            -1.0).astype(np.float32)
                    args = args + (jnp.asarray(ur_col),)
                pose, inlier, inl_l, n_inl = self.pose_opt_pl(*args)
            # line bookkeeping: map observed line feature -> map line id
            inl_l_np = np.asarray(inl_l)
            ln_feat_np = np.asarray(ln_feat_idx)
            feat_ln = np.full(self.n_line_feat, INVALID, np.int32)
            good_l = np.nonzero(inl_l_np)[0]
            feat_ln[ln_feat_np[good_l]] = ln_ids[good_l]
            self.last_feat_ln = feat_ln
            self.last_line_feats = lf
            m.ln_visible[ln_ids[ln_live]] += 1
            m.ln_found[ln_ids[good_l]] += 1
        elif self.pose_opt_stereo is not None \
                and self._frame_depth is not None:
            # stereo/RGB-D: attach u_R where the matched feature carries
            # a stereo depth (u_R < 0 keeps the edge mono)
            depth = self._frame_depth
            pf = np.asarray(pt_feat)
            safe_f = np.clip(pf, 0, len(depth) - 1)
            z_f = np.where((pf >= 0) & (pf < len(depth)),
                           depth[safe_f], -1.0)
            uv_np = np.asarray(uv_m)
            ur = np.where(z_f > 0.1,
                          uv_np[:, 0] - self.bf / np.maximum(z_f, 0.1),
                          -1.0)
            uvr = jnp.asarray(
                np.concatenate([uv_np, ur[:, None]], 1), jnp.float32)
            pose, inlier, n_inl = self.pose_opt_stereo(
                jnp.asarray(pose_pred), uvr, jnp.asarray(xyz), matched, is2)
        else:
            pose, inlier, n_inl = self.pose_opt(
                jnp.asarray(pose_pred), uv_m, jnp.asarray(xyz), matched, is2)
        n_inliers = int(n_inl)
        if os.environ.get("PLVIO_TRACE"):
            # ni_pred: inliers AT the prediction — separates "prediction/
            # matching wrong" (ni_pred low) from "optimizer diverged"
            # (ni_pred high, ni low)
            pp = np.asarray(pose_pred)
            pc_ = np.asarray(xyz) @ pp[:, :3].T + pp[:, 3]
            zz = np.maximum(pc_[:, 2], 1e-4)
            prj = np.stack([self.K.fx * pc_[:, 0] / zz + self.K.cx,
                            self.K.fy * pc_[:, 1] / zz + self.K.cy], -1)
            c2p = np.sum((prj - np.asarray(uv_m)) ** 2, -1) \
                * np.asarray(is2)
            nip = int((np.asarray(matched) & (c2p < 5.991)
                       & (pc_[:, 2] > 0.05)).sum())
            po = np.asarray(pose)
            dtp = float(np.linalg.norm(po[:, 3] - pp[:, 3]))
            hp = int(getattr(self, "_last_have_prior", False))
            nf = int(np.asarray(feats.valid).sum())
            nloc = int(np.asarray(live).sum())
            print(f"[trace] f={self.frame_idx} st={self.state.name} "
                  f"ref={self.ref_kf} nf={nf} nloc={nloc} "
                  f"nm={n_matched} ni={n_inliers} "
                  f"nip={nip} dtp={dtp:.3f} pr={hp} "
                  f"vi={vi_mode} |v|={np.linalg.norm(self.frame_vel):.2f} "
                  f"|bg|={np.linalg.norm(self.frame_bg):.4f} "
                  f"|ba|={np.linalg.norm(self.frame_ba):.3f}", flush=True)
        if vi_mode and n_inliers < self.cfg.tracking.min_inliers_track:
            # visual-inertial divergence guard: the optimizer rejected
            # nearly everything, but if the raw IMU PREDICTION still
            # explains the matches, the failure is the solve (a bad
            # prior/linearization after a large map update — observed
            # once on the 28 s circuit: ni collapsed 158 -> 2 right
            # after a 2k-landmark capacity cull while the matches stayed
            # valid), not the prediction.  Keep the predicted state for
            # this frame instead of dropping to RECENTLY_LOST (the
            # dead-reckon bridge in _handle_lost remains the fallback
            # when even the prediction fails).
            pp = np.asarray(pose_pred)
            pc_ = np.asarray(xyz) @ pp[:, :3].T + pp[:, 3]
            zz = np.maximum(pc_[:, 2], 1e-4)
            prj = np.stack([self.K.fx * pc_[:, 0] / zz + self.K.cx,
                            self.K.fy * pc_[:, 1] / zz + self.K.cy], -1)
            c2p = np.sum((prj - np.asarray(uv_m)) ** 2, -1) \
                * np.asarray(is2)
            inl_pred = np.asarray(matched) & (c2p < 5.991) \
                & (pc_[:, 2] > 0.05)
            nip = int(inl_pred.sum())
            if nip >= max(self.cfg.tracking.min_inliers_track, 15):
                print(f"[track] f={self.frame_idx}: pose opt diverged "
                      f"(ni={n_inliers}) but prediction holds "
                      f"(nip={nip}) — keeping predicted state",
                      flush=True)
                pose = jnp.asarray(pp)
                inlier = jnp.asarray(inl_pred)
                n_inliers = nip
                self.frame_vel = np.asarray(self._pred_vel)
                self.frame_bg, self.frame_ba = bg_in, ba_in
                self.invalidate_vi_prior()
        if n_inliers < self.cfg.tracking.min_inliers_track:
            self.frame_bg, self.frame_ba = bg_in, ba_in
            self.frame_vel = vel_in
            return False

        # bookkeeping
        pose = np.asarray(pose)
        inlier_np = np.asarray(inlier)
        pt_feat_np = np.asarray(pt_feat)
        feat_pt_np = np.full(self.n_feat, INVALID, np.int32)
        good_slots = np.nonzero(inlier_np)[0]
        feat_pt_np[pt_feat_np[good_slots]] = ids[good_slots]
        # found/visible statistics for culling
        m.pt_visible[ids[live]] += 1
        m.pt_found[ids[good_slots]] += 1

        # velocity (T_cl = T_cw * T_lw^{-1})
        R_c, t_c = pose[:, :3], pose[:, 3]
        R_l, t_l = self.last_pose_cw[:, :3], self.last_pose_cw[:, 3]
        R_cl = R_c @ R_l.T
        t_cl = t_c - R_cl @ t_l
        self.velocity = np.concatenate([R_cl, t_cl[:, None]], 1)
        self.last_pose_cw = pose
        self.last_feats = feats
        self.last_feat_pt = feat_pt_np
        self.last_n_inliers = n_inliers
        self._reselect_ref_kf(ids[good_slots])
        return True

    def _reselect_ref_kf(self, tracked_ids: np.ndarray) -> None:
        """Re-pick the reference KF every frame as the covisible KF
        sharing the most currently-tracked points (reference
        UpdateLocalKeyFramesWithLines, src/Tracking.cc:5553) so the
        local-map gather follows the camera through fast motion instead
        of staying centred on the KF it was assigned at creation."""
        if len(tracked_ids) == 0:
            return
        m = self.map
        cands = m.covisible_kfs(self.ref_kf, n=10, min_weight=5)
        chain = m.kf_chain()
        recent = chain[-4:] if len(chain) else np.empty(0, np.int64)
        cands = np.unique(np.concatenate(
            [[self.ref_kf], cands, recent]).astype(np.int64))
        cands = cands[(cands >= 0)
                      & m.kf_valid[np.clip(cands, 0, m.max_kf - 1)]]
        tracked = np.unique(tracked_ids[tracked_ids >= 0])
        best_kf, best_n = self.ref_kf, -1
        for kf in cands:
            match = m.kf_match_pt[kf]
            n = int(np.isin(match[match >= 0], tracked).sum())
            if n > best_n:
                best_kf, best_n = int(kf), n
        self.ref_kf = best_kf

    # ------------------------------------------------------------------
    def _handle_lost(self) -> None:
        """Elastic recovery (reference: src/Tracking.cc:2404-2421): a
        mature map is kept and a fresh one started in the Atlas
        (CreateMapInAtlas :3350) — to be merged back by loop closing; a
        small young map is simply reset."""
        self.invalidate_vi_prior()
        m = self.map
        if self.only_tracking:
            # pure localization: never touch the map — stay LOST and keep
            # trying to relocalize against the frozen map (reference
            # src/Tracking.cc localization-mode loss branch)
            self.state = TrackState.LOST
            self.velocity = None
            self.lost_count = 0
            return
        if m.n_kf > 10:
            self.atlas.create_new_map(
                max_kf=m.max_kf, max_pts=m.max_pts, max_lines=m.max_lines,
                n_feat=self.n_feat)
        else:
            # reset the active map in place
            fresh = type(m)(max_kf=m.max_kf, max_pts=m.max_pts,
                            max_lines=m.max_lines, n_feat=self.n_feat,
                            map_id=m.map_id)
            self.atlas.maps[self.atlas.active] = fresh
        self.state = TrackState.NO_IMAGES_YET
        self.init_feats = None
        self.last_created_kf = INVALID
        self.last_feat_pt = None
        self.velocity = None
        self.lost_count = 0
        self.imu_since_kf = []

    # ------------------------------------------------------------------
    def _relocalize(self, feats: Features) -> bool:
        """BoW candidate retrieval + descriptor matching to candidate map
        points + PnP RANSAC + pose refinement (reference
        Tracking::Relocalization src/Tracking.cc:5744 with MLPnPsolver)."""
        self.invalidate_vi_prior()
        kfdb = getattr(self, "kfdb", None)
        if kfdb is None:
            return False
        m = self.map
        desc_packed = np.asarray(M.pack_bits_u32(feats.desc))
        cands, scores = kfdb.query(desc_packed, np.asarray(feats.valid),
                                   top_n=3)
        from ..ops import pnp as PNP
        for cand in cands:
            if not m.kf_valid[cand]:
                continue
            match = m.kf_match_pt[cand]
            cf = np.nonzero(match >= 0)[0]
            if len(cf) < 15:
                continue
            d_frame = feats.desc
            d_cand = M.unpack_u32_to_pm1(jnp.asarray(m.kf_feat_desc[cand][cf]))
            dist = M.hamming_matrix(d_frame, d_cand)
            idx, ok = M.match_nn_ratio(dist, feats.valid,
                                       jnp.ones(len(cf), bool), None,
                                       max_dist=60.0, ratio=0.8)
            ok_np = np.asarray(ok)
            if ok_np.sum() < 12:
                continue
            idx_np = np.asarray(idx)
            fsel = np.nonzero(ok_np)[0]
            pts = match[cf[idx_np[fsel]]]
            cap = 512
            uv_p = np.zeros((cap, 2), np.float32)
            X_p = np.zeros((cap, 3), np.float32)
            valid = np.zeros(cap, bool)
            nv = min(len(fsel), cap)
            uv_p[:nv] = np.asarray(feats.uv_und)[fsel[:nv]]
            X_p[:nv] = m.pt_xyz[pts[:nv]]
            valid[:nv] = True
            self._key, sub = jax.random.split(self._key)
            R, t, inl, n = PNP.pnp_ransac(self.K, jnp.asarray(uv_p),
                                          jnp.asarray(X_p),
                                          jnp.asarray(valid), sub)
            if int(n) < 10:
                continue
            # ML refinement on the inlier set (reference refines the
            # MLPnP pose with PoseOptimization, src/Tracking.cc:5850)
            R, t, inl, n = PNP.mlpnp_refine(self.K, jnp.asarray(uv_p),
                                            jnp.asarray(X_p), inl, R, t)
            if int(n) < 10:
                continue
            pose = np.concatenate([np.asarray(R), np.asarray(t)[:, None]],
                                  1).astype(np.float32)
            # refine with the local map around the candidate
            self.last_pose_cw = pose
            self.ref_kf = int(cand)
            self.velocity = None
            # refinement against the local map around the candidate
            # (any KF created from this frame happens afterwards in
            # process_frame with the live timestamp)
            ok2 = self._track_frame(feats)
            if ok2:
                return True
        return False

    # ------------------------------------------------------------------
    def _need_keyframe(self) -> bool:
        """NeedNewKeyFrame (reference src/Tracking.cc:4552).  Conditions
        mirrored: c1a frame-gap >= max interval; inertial cadence (a KF
        at least every 0.5 s once the IMU is initialized, reference
        :4622); c2 tracked inliers below a sensor-dependent fraction of
        the reference KF's matches (thRefRatio 0.9 mono / 0.75 stereo /
        0.65 inertial, :4676-4684) while still above the minimum."""
        if self.only_tracking:   # pure localization never maps
            return False
        m = self.map
        # reference KF's tracked map points with >=3 observations
        # (reference mpReferenceKF->TrackedMapPoints(nMinObs=3),
        # src/Tracking.cc:4569-4580 — counting ALL bound features
        # instead inflates the ratio base and spams keyframes)
        b = m.kf_match_pt[self.ref_kf]
        b = b[b >= 0]
        if m.n_kf > 2 and not (self.use_imu and m.imu_initialized):
            ref_matches = int((m.pt_n_obs[b] >= 3).sum())
        else:
            # VI mode keeps the full bound count as the ratio base: the
            # fast-growing inertial map is mostly young (<3 obs) points,
            # and the min-obs base starves KF insertion exactly when
            # dense coverage matters (measured +35% replay ATE)
            ref_matches = len(b)
        gap = self.frame_idx - self.last_kf_frame_idx
        if gap < max(self.cfg.tracking.kf_min_interval, 1):
            return False
        if gap >= self.cfg.tracking.kf_max_interval:
            return True
        # inertial cadence: temporal chain must stay dense enough for
        # preintegration (reference inserts every 0.5 s since the LAST
        # CREATED KF, mpLastKeyFrame — NOT the per-frame re-selected
        # reference KF, which may be an older covisible and would make
        # this fire every frame)
        if self.use_imu and m.imu_initialized \
                and self.last_frame_time is not None \
                and self.last_frame_time - self.last_kf_time >= 0.5:
            return True
        # (the reference couples c2 with a mapper-idle check c1b; in its
        # threaded system a busy mapper throttles insertion to every few
        # frames.  Our mapper runs synchronously, so the throttle is
        # explicit: while tracking is healthy, at most one KF per 3
        # frames — only an inlier collapse overrides it)
        if self.use_imu and m.imu_initialized:
            ratio = 0.65
            # inertial stress response (reference c1c + the inertial
            # 15..75-inlier band, src/Tracking.cc:4676-4698): when the
            # inlier count itself is low, insert immediately so
            # triangulation densifies the map ahead of fast motion —
            # waiting for the ratio test here is how tracking starves
            if self.last_n_inliers < 75:
                return self.last_n_inliers > 12
        else:
            ratio = 0.75 if m.n_kf > 2 else 0.6
        weak = self.last_n_inliers < ratio * max(ref_matches, 1)
        healthy = self.last_n_inliers > 60
        if weak and healthy and gap < 3:
            return False
        return weak and self.last_n_inliers > 15

    def _create_keyframe(self, feats: Features, timestamp: float) -> None:
        m = self.map
        kf = m.alloc_kf()
        m.kf_timestamp[kf] = timestamp
        m.kf_pose_cw[kf] = self.last_pose_cw.astype(np.float32)
        self._store_kf_features(kf, feats, self._frame_lines)
        prev = self.last_created_kf
        if prev == INVALID or not m.kf_valid[prev]:
            prev = self.ref_kf
        m.kf_prev[kf] = prev
        m.kf_next[prev] = kf
        matched = self.last_feat_pt >= 0
        m.kf_match_pt[kf] = np.where(matched, self.last_feat_pt, INVALID)
        m.pt_n_obs[self.last_feat_pt[matched]] += 1
        if self.use_lines and self.last_feat_ln is not None \
                and self.last_line_feats is self._frame_lines:
            lm = self.last_feat_ln >= 0
            m.kf_match_ln[kf] = np.where(lm, self.last_feat_ln, INVALID)
            m.ln_n_obs[self.last_feat_ln[lm]] += 1
        m.update_covisibility(kf)
        if self.use_imu:
            self._store_kf_inertial(kf)
        if self._frame_depth is not None:
            self._create_depth_points(kf, feats)
            m.update_covisibility(kf)
        if self._frame_line_depth is not None:
            self._create_depth_lines(kf)
        self.ref_kf = kf
        self.last_created_kf = kf
        self.last_kf_frame_idx = self.frame_idx
        self.last_kf_time = timestamp
        self.new_kf_queue.append(kf)
        m.change_index += 1

    def _store_kf_inertial(self, kf: int) -> None:
        """Preintegrate the buffered IMU window since the previous KF and
        attach it + the raw samples (reference CreateNewKeyFrame sets
        mpImuPreintegratedFromLastKF, src/Tracking.cc:4850)."""
        m = self.map
        if getattr(self, "_skip_next_kf_imu", False):
            # first KF after a bridge relocalization: the IMU window was
            # invalidated by the pose snap — leave kf_preint unset so the
            # inter-KF inertial edge is masked out of LIBA/init chains
            self._skip_next_kf_imu = False
        else:
            pre = self._preintegrate_batches(self.imu_since_kf,
                                             self.frame_bg, self.frame_ba)
            m.kf_preint[kf] = pre
            if self.imu_since_kf:
                m.kf_imu_raw[kf] = (
                    np.concatenate([b[0] for b in self.imu_since_kf]),
                    np.concatenate([b[1] for b in self.imu_since_kf]),
                    np.concatenate([b[2] for b in self.imu_since_kf]))
        self.imu_since_kf = []
        m.kf_pose_wb[kf] = self._cw_to_wb(m.kf_pose_cw[kf])
        m.kf_vel[kf] = self.frame_vel
        m.kf_bias_g[kf] = self.frame_bg
        m.kf_bias_a[kf] = self.frame_ba

    # ------------------------------------------------------------------
    def reanchor_records(self, culled) -> None:
        """Re-express frame records whose reference KF was culled
        relative to a surviving keyframe, using the culled KF's last
        pose (the reference walks mlpReferences up the spanning tree in
        SaveTrajectoryEuRoC when a ref KF is bad, src/System.cc:785)."""
        m = self.map
        chain = m.kf_chain()
        if len(chain) == 0:
            return
        for ckf, pose_cw, ts in culled:
            # nearest surviving chain KF in time
            new_ref = int(chain[np.argmin(np.abs(m.kf_timestamp[chain] - ts))])
            T_nw = m.kf_pose_cw[new_ref]
            # T_r_new = T_rw_old o T_wn = pose_cw o inv(T_nw)
            R_rn = pose_cw[:, :3] @ T_nw[:, :3].T
            t_rn = pose_cw[:, 3] - R_rn @ T_nw[:, 3]
            for rec in self.frames:
                if rec.ref_kf != ckf or rec.map_id != self.atlas.active:
                    continue
                R_cr, t_cr = rec.T_cr[:, :3], rec.T_cr[:, 3]
                R_cn = R_cr @ R_rn
                t_cn = R_cr @ t_rn + t_cr
                rec.T_cr = np.concatenate([R_cn, t_cn[:, None]], 1)
                rec.ref_kf = new_ref
            if self.ref_kf == ckf:
                self.ref_kf = new_ref

    # ------------------------------------------------------------------
    def full_trajectory(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(timestamps, positions, quaternions) of every tracked frame,
        re-expressed through the *current* (optimized) KF poses
        (reference: System::SaveTrajectoryEuRoC src/System.cc:785)."""
        ts, pos, quat = [], [], []
        for rec in self.frames:
            m = self.atlas.maps[rec.map_id]
            if not m.kf_valid[rec.ref_kf]:
                continue
            T_rw = m.kf_pose_cw[rec.ref_kf]
            R_cw = rec.T_cr[:, :3] @ T_rw[:, :3]
            t_cw = rec.T_cr[:, :3] @ T_rw[:, 3] + rec.T_cr[:, 3]
            R_wc = R_cw.T
            p_wc = -R_wc @ t_cw
            ts.append(rec.timestamp)
            pos.append(p_wc)
            quat.append(np.asarray(lie.rot_to_quat(
                jnp.asarray(R_wc, jnp.float32))))
        return np.asarray(ts), np.asarray(pos), np.asarray(quat)
