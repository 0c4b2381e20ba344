"""Public SLAM system API.

Re-design of `System` (reference: src/System.cc:42-252): constructs the
Atlas, tracker, local mapper (and, as they land, loop closer +
relocalization), wires them together, and exposes the per-frame entry
points and trajectory savers.

The reference spawns LocalMapping/LoopClosing/Relocalization as
std::threads consuming mutex-guarded queues (src/System.cc:196-232).
Here the same pipeline runs either synchronously (deterministic, used in
tests) or overlapped via a host thread executor — JAX dispatch is already
async, so the host threads only orchestrate.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..config import SystemConfig, Sensor
from ..io import trajectory as TIO
from ..ops import frontend as FE
from ..ops import cameras as CAM
from ..utils import lie
from .local_mapping import LocalMapper
from .mapstore import Atlas, INVALID
from .tracking import Tracker, TrackState


class System:
    """Usage:
        sys = System(cfg)
        for img, t in frames:
            pose = sys.track_monocular(img, t)
        sys.save_trajectory("CameraTrajectory.txt")
    """

    def __init__(self, cfg: SystemConfig, async_mapping: bool = False):
        self.cfg = cfg
        cam = cfg.camera
        self.camera = CAM.make_camera(cam)
        # jitted once: per-call tracing of the iterative undistortion was
        # ~0.3 s/frame of pure host overhead (zero-distortion cameras
        # short-circuit to identity inside)
        import jax as _jax
        self._undistort = _jax.jit(
            lambda uv: CAM.undistort_pixels(self.camera, uv))
        self.extract, self.level_specs = FE.make_extractor(
            cam.height, cam.width, cfg.orb.n_features,
            cfg.orb.n_levels, cfg.orb.scale_factor,
            cfg.orb.ini_th_fast, cfg.orb.min_th_fast)
        # total feature capacity = sum of per-level keeps
        self.n_feat = sum(s.n_keep for s in self.level_specs)

        self.atlas = Atlas([ ])
        self.atlas.maps[0].n_feat = self.n_feat
        # rebuild map store with the right feature capacity
        from .mapstore import MapStore
        self.atlas.maps[0] = MapStore(
            max_kf=cfg.map.max_keyframes, max_pts=cfg.map.max_points,
            max_lines=cfg.map.max_lines, n_feat=self.n_feat)

        self.extract_lines = None
        if cfg.use_lines:
            from ..ops import lines as LN
            self.extract_lines = LN.make_line_extractor(
                cam.height, cam.width, max_lines=256,
                detector=cfg.line.detector, levels=cfg.line.levels)

        # BoW vocabulary + keyframe database (reference: ORBVocabulary +
        # KeyFrameDatabase built in System::System src/System.cc:83-108)
        from . import vocabulary as V
        from .kfdb import AtlasKeyFrameDatabase
        # two trained vocabularies (reference loads ORBvoc + LSvoc,
        # src/System.cc:83-105); assets shipped by scripts/train_vocab.py,
        # deterministic-random fallback when absent
        self.vocabulary = V.default_vocabulary("orb", seed=cfg.seed)
        self.line_vocabulary = \
            V.default_vocabulary("lbd", seed=cfg.seed + 1) \
            if cfg.use_lines else None
        self.kfdb = AtlasKeyFrameDatabase(
            self.vocabulary, cfg.map.max_keyframes, self.n_feat, self.atlas,
            line_voc=self.line_vocabulary,
            n_line_feat=self.atlas.current.n_line_feat)

        # always-on stage profiler (the reference's SAVE_TIMES analog,
        # include/System.h:24, src/Tracking.cc:1246-1254 — but queryable
        # at runtime instead of compile-time CSV emitters)
        from ..utils.metrics import Metrics
        self.metrics = Metrics()

        self.tracker = Tracker(cfg, self.atlas, self.n_feat)
        self.tracker.kfdb = self.kfdb
        self.tracker.metrics = self.metrics
        self.mapper = LocalMapper(cfg, self.atlas, self.n_feat)
        self.mapper.kfdb = self.kfdb
        self.mapper.metrics = self.metrics

        self.loop_closer = None
        if cfg.use_loop_closing:
            from .loop_closing import LoopCloser
            self.loop_closer = LoopCloser(cfg, self.atlas, self.kfdb,
                                          self.n_feat)
            self.loop_closer.mapper = self.mapper

        # prior-map relocalization thread analog (reference: spawned when
        # bRelocalization==1, src/System.cc:216-222)
        self.relocalizer = None
        if cfg.reloc.enabled:
            from .relocalization import PriorMapRelocalizer
            self.relocalizer = PriorMapRelocalizer(
                cfg, self.atlas, self.vocabulary, self.n_feat)
            if cfg.reloc.prior_data_dir:
                self.relocalizer.load_prior_dir(cfg.reloc.prior_data_dir)

        self.async_mapping = async_mapping
        self._kf_queue: "queue.Queue[int]" = queue.Queue()
        self._stop = threading.Event()
        self._mapper_thread: Optional[threading.Thread] = None
        # THE map mutex (reference Map::mMutexMapUpdate discipline,
        # include/Map.h:153): the tracker holds it for the map-touching
        # back half of each frame (the reference holds it for the whole
        # back half of TrackWithLines, src/Tracking.cc:2283), the async
        # mapper holds it for each process_keyframe.  Front-end
        # extraction runs OUTSIDE the lock — that is where the overlap
        # (and the reference's parallelism) lives.
        self.map_lock = threading.RLock()
        # long-run host hygiene (CPU backend): lift vm.max_map_count if
        # privileged so accumulated XLA JIT modules cannot exhaust it;
        # otherwise fall back to periodic cache clearing (utils/hostmem)
        from ..utils import hostmem as HM
        HM.raise_map_count_limit()
        self._frame_counter = 0
        # live map viewer (reference Pangolin Viewer thread analog,
        # src/Viewer.cc:58): PLVIO_VIEWER_PORT=<port> serves the map at
        # http://host:port/ with 1 Hz auto-refresh
        self.live_viewer = None
        vp = os.environ.get("PLVIO_VIEWER_PORT")
        if vp:
            from .live_viewer import LiveViewer
            self.live_viewer = LiveViewer(self, int(vp))
            self.live_viewer.start()
        if async_mapping:
            self._mapper_thread = threading.Thread(
                target=self._mapping_loop, daemon=True)
            self._mapper_thread.start()

    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, timestamp: float,
                        imu: Optional[Sequence] = None) -> Optional[np.ndarray]:
        """Per-frame entry (reference System::TrackMonocular,
        src/System.cc:560).  img: [H,W] grayscale float32/uint8;
        imu: optional (gyro [k,3], acc [k,3], dt [k]) batch of samples
        since the previous frame."""
        self._host_hygiene()
        met = self.metrics
        img_dev = jnp.asarray(img, jnp.float32)
        with met.stage("extract_orb"):
            feats = self.extract(img_dev)
            # undistort keypoint coordinates once per frame
            und = self._undistort(feats.uv)
            feats = feats._replace(uv_und=und)
        with met.stage("extract_lines"):
            line_feats = self._extract_frame_lines(img_dev)
        with self.map_lock, met.stage("track"):
            pose = self.tracker.process_frame(feats, timestamp, imu=imu,
                                              line_feats=line_feats)
        self._drain_keyframes()
        # IMU init re-expressed the map: bring the tracker's frame state
        # into the new gravity-aligned metric frame
        with self.map_lock:
            self._apply_pending_transform()
        self._maybe_dump_overlay(img)
        return pose

    def track_stereo(self, img_left: np.ndarray, img_right: np.ndarray,
                     timestamp: float,
                     imu: Optional[Sequence] = None) -> Optional[np.ndarray]:
        """Rectified stereo entry (reference System::TrackStereo,
        src/System.cc:434): extract both views, row-gated stereo match ->
        per-feature depth, then the common tracking flow with
        depth-seeded map points."""
        from ..ops import stereo as ST
        from ..ops import matching as M2
        self._host_hygiene()
        met = self.metrics
        imgL = jnp.asarray(img_left, jnp.float32)
        imgR = jnp.asarray(img_right, jnp.float32)
        with met.stage("extract_orb"):
            fL = self.extract(imgL)
            fR = self.extract(imgR)
            und = self._undistort(fL.uv)
            fL = fL._replace(uv_und=und)
        bf = self.cfg.camera.baseline * self.cfg.camera.fx
        with met.stage("stereo_match"):
            _, depth, has = ST.match_stereo(
                fL.uv, fL.desc, fL.octave, fL.valid,
                fR.uv, fR.desc, fR.octave, fR.valid, bf)
            depth_np = np.where(np.asarray(has), np.asarray(depth), -1.0)
        line_feats, line_depth = None, None
        if self.extract_lines is not None:
            # stereo line matching on RAW (rectified) coords of both views
            # (reference Frame::ComputeStereoMatches_Lines src/Frame.cc:1408)
            lfL = self.extract_lines(imgL)
            lfR = self.extract_lines(imgR)
            ds, de, lhas = ST.match_stereo_lines(
                lfL.ep, lfL.desc, lfL.angle, lfL.valid,
                lfR.ep, lfR.desc, lfR.angle, lfR.valid, bf)
            line_depth = (np.asarray(ds), np.asarray(de), np.asarray(lhas))
            from ..ops import lines as LN
            sp = self._undistort(lfL.ep[:, :2])
            ep = self._undistort(lfL.ep[:, 2:])
            ep4 = jnp.concatenate([sp, ep], -1)
            line_feats = lfL._replace(ep=ep4, lineq=LN.line_equation(ep4))
        with self.map_lock, met.stage("track"):
            pose = self.tracker.process_frame(fL, timestamp, imu=imu,
                                              line_feats=line_feats,
                                              depth=depth_np,
                                              line_depth=line_depth)
        self._drain_keyframes()
        with self.map_lock:
            self._apply_pending_transform()
        self._maybe_dump_overlay(img_left)
        return pose

    def track_rgbd(self, img: np.ndarray, depth_img: np.ndarray,
                   timestamp: float,
                   imu: Optional[Sequence] = None) -> Optional[np.ndarray]:
        """RGB-D entry (reference System::TrackRGBD, src/System.cc:502):
        per-feature depth sampled from the depth image."""
        self._host_hygiene()
        met = self.metrics
        with met.stage("extract_orb"):
            feats = self.extract(jnp.asarray(img, jnp.float32))
            und = self._undistort(feats.uv)
            feats = feats._replace(uv_und=und)
        img_dev = jnp.asarray(img, jnp.float32)
        uv = np.asarray(feats.uv)
        ui = np.clip(uv[:, 0].astype(int), 0, depth_img.shape[1] - 1)
        vi = np.clip(uv[:, 1].astype(int), 0, depth_img.shape[0] - 1)
        depth_np = depth_img[vi, ui].astype(np.float32)
        with met.stage("extract_lines"):
            line_feats = self._extract_frame_lines(img_dev)
        with self.map_lock, met.stage("track"):
            pose = self.tracker.process_frame(feats, timestamp, imu=imu,
                                              line_feats=line_feats,
                                              depth=depth_np)
        self._drain_keyframes()
        with self.map_lock:
            self._apply_pending_transform()
        self._maybe_dump_overlay(img)
        return pose

    def _host_hygiene(self):
        """Every 100 frames, clear the XLA JIT caches if the process is
        about to exhaust vm.max_map_count (see utils/hostmem).

        Serialized with the async mapping thread via map_lock:
        jax.clear_caches() while another thread is executing/compiling a
        jitted program is not guaranteed thread-safe."""
        self._frame_counter += 1
        if self._frame_counter % 100 == 0:
            from ..utils import hostmem as HM
            with self.map_lock:
                cleared = HM.maybe_clear_jit_caches()
            if cleared:
                print("[hostmem] mapping count near vm.max_map_count: "
                      "cleared XLA JIT caches", flush=True)

    def _maybe_dump_overlay(self, img) -> None:
        """PLVIO_OVERLAY_DIR=<dir> [PLVIO_OVERLAY_EVERY=N]: per-frame
        tracking overlay PNGs (the FrameDrawer analog — reference
        src/FrameDrawer.cc; see models/viewer.dump_overlay)."""
        out_dir = os.environ.get("PLVIO_OVERLAY_DIR")
        if not out_dir:
            return
        every = int(os.environ.get("PLVIO_OVERLAY_EVERY", "1"))
        t = self.tracker
        if t.frame_idx % every or t.last_feats is None:
            return
        from . import viewer as VW
        uv = np.asarray(t.last_feats.uv)
        fp = t.last_feat_pt
        matched = (fp >= 0) if fp is not None else np.zeros(len(uv), bool)
        line_ep = line_m = None
        if t.last_line_feats is not None and t.last_feat_ln is not None:
            line_ep = np.asarray(t.last_line_feats.ep)
            line_m = t.last_feat_ln >= 0
        VW.dump_overlay(np.asarray(img), uv, matched[:len(uv)],
                        t.state.name, t.frame_idx, out_dir,
                        line_ep=line_ep, line_matched=line_m)

    def _maybe_snapshot(self) -> None:
        """PLVIO_SNAPSHOT_DIR=<dir> [PLVIO_SNAPSHOT_EVERY=K]: export an
        html+ply map snapshot every K processed keyframes (the MapDrawer
        refresh analog — reference src/MapDrawer.cc)."""
        out_dir = os.environ.get("PLVIO_SNAPSHOT_DIR")
        if not out_dir:
            return
        every = int(os.environ.get("PLVIO_SNAPSHOT_EVERY", "10"))
        self._snapshot_counter = getattr(self, "_snapshot_counter", 0) + 1
        if self._snapshot_counter % every:
            return
        from . import viewer as VW
        os.makedirs(out_dir, exist_ok=True)
        m = self.atlas.current
        tag = f"kf{self._snapshot_counter:04d}"
        VW.export_html(m, os.path.join(out_dir, f"map_{tag}.html"))
        VW.export_ply(m, os.path.join(out_dir, f"map_{tag}.ply"))

    def _extract_frame_lines(self, img_dev):
        if self.extract_lines is None:
            return None
        from ..ops import lines as LN
        lf = self.extract_lines(img_dev)
        sp = self._undistort(lf.ep[:, :2])
        ep = self._undistort(lf.ep[:, 2:])
        ep4 = jnp.concatenate([sp, ep], -1)
        return lf._replace(ep=ep4, lineq=LN.line_equation(ep4))

    def _apply_pending_transform(self):
        if self.mapper.pending_transform is not None:
            R_gw, scale = self.mapper.pending_transform
            self.mapper.pending_transform = None
            self.tracker.apply_map_transform(R_gw, scale)

    def _drain_keyframes(self):
        while self.tracker.new_kf_queue:
            kf = self.tracker.new_kf_queue.pop(0)
            if self.async_mapping:
                self._kf_queue.put(kf)
            else:
                self._process_kf(kf)

    def _process_kf(self, kf: int):
        met = self.metrics
        with self.map_lock, met.stage("mapping"):
            m = self.atlas.current
            self.kfdb.add_keyframe(kf, m.kf_feat_desc[kf],
                                   m.kf_feat_valid[kf],
                                   line_desc=m.kf_line_desc[kf],
                                   line_valid=m.kf_line_valid[kf])
            culled = self.mapper.process_keyframe(
                kf, protect=(self.tracker.ref_kf,))
            if culled:
                self.tracker.reanchor_records(culled)
            # resync the tracker's frame state to the BA-optimized KF:
            # this KF IS the current frame, and the window BA just moved
            # it — tracking against the stale pre-BA pose makes the
            # inertial prior fight the visual term harder every insert
            # (reference re-poses the last frame on map change and
            # resyncs inertial state in UpdateFrameIMU,
            # src/Tracking.cc:2287-2294, :6117).  Skipped when an IMU-init
            # transform is pending: apply_map_transform performs the
            # equivalent resync in the new frame.
            t = self.tracker
            if kf == t.last_created_kf and m.kf_valid[kf] \
                    and t.last_kf_frame_idx == t.frame_idx \
                    and self.mapper.pending_transform is None \
                    and np.isfinite(m.kf_pose_cw[kf]).all():
                if os.environ.get("PLVIO_TRACE"):
                    d = np.linalg.norm(m.kf_pose_cw[kf][:, 3]
                                       - t.last_pose_cw[:, 3])
                    if d > 0.02:
                        print(f"[trace] resync kf={kf} moved pose by "
                              f"{d:.3f}", flush=True)
                t.last_pose_cw = m.kf_pose_cw[kf].copy()
                # the carried VI marginalization prior linearized the
                # pre-BA state — drop it (reference switches to the
                # LastKeyFrame flavor when the map updated)
                t.invalidate_vi_prior()
                if t.use_imu and m.imu_initialized \
                        and np.isfinite(m.kf_vel[kf]).all():
                    t.frame_vel = m.kf_vel[kf].copy()
                    t.frame_bg = m.kf_bias_g[kf].copy()
                    t.frame_ba = m.kf_bias_a[kf].copy()
            if self.loop_closer is not None:
                with met.stage("loop_closing"):
                    self.loop_closer.process_keyframe(kf)
                merge = self.loop_closer.pending_merge
                if merge is not None:
                    self.loop_closer.pending_merge = None
                    self.tracker.on_map_merged(**merge)
            if self.relocalizer is not None:
                self.relocalizer.process_keyframe(kf, m.kf_timestamp[kf])
        self._maybe_snapshot()
        if self.live_viewer is not None:
            self.live_viewer.refresh()

    def _mapping_loop(self):
        while not self._stop.is_set():
            try:
                kf = self._kf_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            self._process_kf(kf)

    # ------------------------------------------------------------------
    def activate_localization_mode(self) -> None:
        """Freeze the map and run tracking-only (reference
        System::ActivateLocalizationMode include/System.h:126,
        src/System.cc — pauses LocalMapping and sets mbOnlyTracking)."""
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self) -> None:
        """Resume full SLAM (reference System::DeactivateLocalizationMode
        include/System.h:128)."""
        self.tracker.only_tracking = False

    def reset_active_map(self) -> None:
        """reference System::ResetActiveMap src/System.cc — restart the
        active map in place (tracker loss path does this implicitly)."""
        was = self.tracker.only_tracking
        self.tracker.only_tracking = False
        try:
            self.tracker._handle_lost()
        finally:
            self.tracker.only_tracking = was

    def change_dataset(self) -> None:
        """Multi-session boundary (reference System::ChangeDataset, used
        by the multi-sequence example mains): keep the Atlas, drop the
        motion model and IMU buffer, and start a fresh map for the next
        sequence — loop closing later welds the sessions via map merge."""
        t = self.tracker
        m = t.map
        if m.n_kf >= 2:       # explicit boundary: keep any real session
            self.atlas.create_new_map(
                max_kf=m.max_kf, max_pts=m.max_pts, max_lines=m.max_lines,
                n_feat=self.n_feat)
        else:
            # a partially-initialized young map is reset in place rather
            # than carried into the next sequence (reference ChangeDataset
            # resets an immature active map before the next sequence)
            from .mapstore import MapStore
            self.atlas.maps[self.atlas.active] = MapStore(
                max_kf=m.max_kf, max_pts=m.max_pts, max_lines=m.max_lines,
                n_feat=self.n_feat, map_id=m.map_id)
        from .tracking import TrackState
        t.state = TrackState.NO_IMAGES_YET
        t.init_feats = None
        t.last_created_kf = INVALID
        t.last_feat_pt = None
        t.velocity = None
        t.lost_count = 0
        t.imu_since_kf = []

    def save_atlas(self, directory: str) -> None:
        """Persist every map in the Atlas (the reference scaffolds this
        as boost-serialized SaveAtlas, commented out in
        src/System.cc:115-179 — here it is live: one npz per map)."""
        from . import serialization as SER
        SER.save_atlas(self.atlas, directory)

    def load_atlas(self, directory: str) -> None:
        """Restore a saved Atlas and re-enter it via relocalization:
        tracking starts LOST against the loaded map (reference LoadAtlas
        scaffolding src/System.cc:185-191)."""
        from . import serialization as SER
        from .tracking import TrackState
        atlas = SER.load_atlas(directory)
        self.atlas.maps = atlas.maps
        self.atlas.active = atlas.active
        self.atlas.next_map_id = atlas.next_map_id
        self.kfdb.rebuild()
        # rebuild preintegrations from the saved raw IMU windows at the
        # stored per-KF biases — a resumed VI session must have its
        # inertial edges immediately, not after the next re-integration
        # (reference Preintegrated serialization, include/ImuTypes.h:184)
        if self.cfg.sensor in (3, 4):
            for m in self.atlas.maps:
                for kf, (g_, a_, d_) in m.kf_imu_raw.items():
                    if len(d_):
                        m.kf_preint[kf] = self.mapper._reintegrate(
                            g_, a_, d_, m.kf_bias_g[kf], m.kf_bias_a[kf])
        t = self.tracker
        t.state = TrackState.LOST
        t.init_feats = None
        t.last_feats = None
        t.last_pose_cw = None      # forces re-entry via _relocalize
        t.last_feat_pt = None
        t.last_feat_ln = None
        t.ref_kf = INVALID
        t.last_created_kf = INVALID
        t.velocity = None
        t.lost_count = 0
        t.imu_since_kf = []

    def global_refine(self) -> None:
        """One full-map refinement pass: full inertial BA for VI maps
        (the reference reaches the equivalent state through its VIBA2 +
        loop-closure GBA stages; exposed as an explicit API so offline
        runs can consolidate before export), visual global BA
        otherwise."""
        with self.map_lock:
            m = self.atlas.current
            if self.cfg.sensor in (3, 4) and m.imu_initialized:
                self.mapper.full_inertial_ba()
            elif self.loop_closer is not None and m.n_kf >= 3:
                chain = m.kf_chain()
                self.loop_closer.run_global_ba(fixed_kf=int(chain[0]))

    def metrics_summary(self) -> dict:
        """Per-stage timing/counter breakdown (reference SAVE_TIMES CSV,
        src/Tracking.cc:1246-1254, queryable live instead)."""
        return self.metrics.summary()

    def shutdown(self):
        """reference System::Shutdown src/System.cc:660."""
        self._stop.set()
        if self._mapper_thread:
            self._mapper_thread.join(timeout=5.0)
        if self.live_viewer is not None:
            self.live_viewer.stop()
        # PLVIO_METRICS=<path>: dump the per-stage summary on shutdown
        path = os.environ.get("PLVIO_METRICS")
        if path:
            self.metrics.dump(path)

    @property
    def state(self) -> TrackState:
        return self.tracker.state

    def trajectory(self) -> TIO.Trajectory:
        ts, pos, quat = self.tracker.full_trajectory()
        return TIO.Trajectory(ts, pos, quat)

    def save_trajectory(self, path: str) -> None:
        """TUM-format full-frame trajectory (reference
        System::SaveTrajectoryEuRoC src/System.cc:785)."""
        TIO.write_tum(path, self.trajectory())

    def export_map(self, path_prefix: str, fmt: str = "all") -> None:
        """Offline viewer export (reference Viewer/MapDrawer render the
        live map in Pangolin, src/Viewer.cc; TPU-side observability is
        file-based: .ply point/line cloud for any 3D viewer, .html
        self-contained three.js scene, .json raw snapshot)."""
        from . import viewer as VIS
        m = self.atlas.current
        traj = self.trajectory()
        if fmt in ("all", "ply"):
            VIS.export_ply(m, path_prefix + ".ply", traj)
        if fmt in ("all", "html"):
            VIS.export_html(m, path_prefix + ".html", traj)
        if fmt in ("all", "json"):
            VIS.export_json(m, path_prefix + ".json", traj)

    def save_relocalized_trajectory(self, path: str) -> None:
        """KF trajectory in the prior-map frame (reference
        SaveKeyFrameTrajectoryByRelocalization src/System.cc:959)."""
        assert self.relocalizer is not None, "bRelocalization not enabled"
        self.relocalizer.save_trajectory(path)

    def save_keyframe_trajectory(self, path: str) -> None:
        """reference System::SaveKeyFrameTrajectoryEuRoC src/System.cc:907."""
        m = self.atlas.current
        kfs = m.valid_kf_indices()
        order = np.argsort(m.kf_timestamp[kfs])
        kfs = kfs[order]
        R_cw = m.kf_pose_cw[kfs, :, :3]
        t_cw = m.kf_pose_cw[kfs, :, 3]
        R_wc = R_cw.transpose(0, 2, 1)
        p = -np.einsum("kij,kj->ki", R_wc, t_cw)
        q = np.asarray(lie.rot_to_quat(jnp.asarray(R_wc, jnp.float32)))
        TIO.write_tum(path, TIO.Trajectory(m.kf_timestamp[kfs], p, q))
