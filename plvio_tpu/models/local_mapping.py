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

import os
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
                 ba_obs_cap: int = 8192, tri_cap: Optional[int] = None,
                 imu_init_cap: int = 32):
        self.cfg = cfg
        self.atlas = atlas
        self.n_feat = n_feat
        # stage profiler; System replaces this with its shared instance
        from ..utils.metrics import Metrics
        self.metrics = Metrics()
        cam = cfg.camera
        self.K = PinholeK(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        # KB8 fisheye runs the NATIVE lens through the back end too:
        # LBA/LIBA point edges project the equidistant model against RAW
        # pixels (reference KannalaBrandt8::projectJac feeds every
        # optimizer edge via GeometricCamera,
        # src/CameraModels/KannalaBrandt8.cpp).  The epipolar matcher and
        # triangulator stay on UNDISTORTED coordinates by design: for
        # KB8 the iterative unprojection makes those exact pinhole rays,
        # so two-view geometry there is not a proxy (equivalent to the
        # reference's unprojectEig + Triangulate path).
        self.kb8 = None
        self.ba_K = self.K
        if cam.model == "kb8":
            from ..solver.residuals import KB8K
            d = tuple(cam.dist) + (0.0,) * 4
            self.kb8 = KB8K(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                            k1=d[0], k2=d[1], k3=d[2], k4=d[3])
            self.ba_K = self.kb8
        self.ba_kf_cap = ba_kf_cap
        self.ba_pt_cap = ba_pt_cap
        self.ba_obs_cap = ba_obs_cap
        tri_cap = tri_cap or n_feat
        self.epi_match = KN.make_epipolar_matcher(self.K, n_feat)
        self.triangulate = KN.make_triangulator(self.K, tri_cap)
        self.local_ba_kernel = KN.make_local_ba(
            self.ba_K, ba_kf_cap, ba_pt_cap, ba_obs_cap)
        self.recent_pts: List[np.ndarray] = []  # per-KF batches for culling
        # duplicate-landmark fusion (reference ORBmatcher::Fuse,
        # src/ORBmatcher.cc:823, driven by SearchInNeighbors)
        self.fuse_cap = 2048
        if self.kb8 is not None:
            self.fuse_match = KN.make_projection_matcher_kb8(
                self.kb8, n_feat, self.fuse_cap)
        else:
            self.fuse_match = KN.make_projection_matcher(
                self.K, n_feat, self.fuse_cap)
        # KeyFrameDatabase hook (wired by System) so culled KFs leave the
        # BoW bank too (the reference erases from mpKeyFrameDB on SetBadFlag)
        self.kfdb = None
        self.n_culled = 0
        self.n_fused = 0

        # line machinery
        self.use_lines = cfg.use_lines
        if self.use_lines:
            nl = 256
            self.n_line_feat = nl
            self.ba_ln_cap = 512
            self.ba_lobs_cap = 1024
            self.line_pair_match = KN.make_line_pair_matcher(nl)
            self.line_triangulate = KN.make_line_triangulator(self.K, nl)
            self.local_ba_pl_kernel = KN.make_local_ba_pl(
                self.ba_K, ba_kf_cap, ba_pt_cap, ba_obs_cap,
                self.ba_ln_cap, self.ba_lobs_cap)
            self.recent_lns: List[np.ndarray] = []
            # `SLAM` modes 1-3: line-only LBA flavor (reference
            # LocalBundleAdjustmentOnlyLines(+Angle), src/Optimizer.cc:6181)
            self.local_ba_lines_kernel = None
            if int(cfg.slam_mode) in (1, 2, 3):
                self.local_ba_lines_kernel = KN.make_local_ba_lines_only(
                    self.K, ba_kf_cap, self.ba_ln_cap, self.ba_lobs_cap,
                    int(cfg.slam_mode))

        # inertial machinery
        self.use_imu = cfg.sensor in (3, 4)
        self.imu_init_cap = imu_init_cap
        self.pending_transform = None  # (R_gw, scale) for the tracker
        if self.use_imu:
            from ..ops import imu as IMUOPS
            self._imu_ops = IMUOPS
            self.calib = IMUOPS.make_calib(cfg.imu)
            self.Tbc = cfg.imu.Tbc_matrix().astype(np.float32)
            R_bc, t_bc = self.Tbc[:3, :3], self.Tbc[:3, 3]
            self.R_cb = np.asarray(R_bc.T, np.float32)
            self.t_cb = np.asarray(-R_bc.T @ t_bc, np.float32)
            self.imu_init_kernel = KN.make_inertial_init(
                cfg.imu.gravity, imu_init_cap)
            self.scale_refine_kernel = KN.make_scale_refine(
                cfg.imu.gravity, imu_init_cap)
            # lines join the inertial window BA when enabled (reference
            # FullInertialBAwithLine, src/Optimizer.cc:1374)
            self.liba_ln_cap = 256 if self.use_lines else 0
            self.liba_lobs_cap = 512 if self.use_lines else 0
            self.liba_kernel = KN.make_local_inertial_ba(
                self.ba_K, ba_kf_cap, ba_pt_cap, ba_obs_cap,
                self.R_cb, self.t_cb, cfg.imu.gravity,
                n_ln=self.liba_ln_cap, n_lobs=self.liba_lobs_cap)
            self._liba_kernel_half = None    # lazy half-cap bucket
            self._kf_since_init = 0
            self._viba = {}   # map_id -> VIBA pulse state
            # wide VIBA kernel (lazy: big compile, used for the 5 s
            # full-map pulses + loop/merge inertial BA)
            self.viba_kf_cap = 64
            self.viba_pt_cap = 8192
            self.viba_obs_cap = 16384
            self.viba_ln_cap = 512 if self.use_lines else 0
            self.viba_lobs_cap = 1024 if self.use_lines else 0
            self.viba_kernel = None
        # multi-chip production back end: when the runtime exposes >1
        # device, every LIBA / VIBA / FIBA window solve routes through
        # the EXACT landmark-sharded distributed solver
        # (parallel/dist_liba — one psum of the reduced camera system
        # per GN iteration).  Auto-on for real accelerator meshes;
        # PLVIO_DIST=1 forces it on the virtual CPU mesh (tests/dryrun),
        # PLVIO_DIST=0 forces single-device.  KB8 maps keep the
        # single-device kernel (the dist reprojection term is pinhole).
        self._dist_runner = None
        if self.use_imu and self.kb8 is None:
            import jax as _jax
            flag = os.environ.get("PLVIO_DIST", "")
            n_dev = len(_jax.devices())
            auto = n_dev > 1 and _jax.default_backend() not in ("cpu",)
            if flag == "1" or (auto and flag != "0"):
                from ..parallel.dist_liba import DistLIBARunner
                self._dist_runner = DistLIBARunner(
                    self.K, self.R_cb, self.t_cb, cfg.imu.gravity)

    @property
    def map(self) -> MapStore:
        return self.atlas.current

    def _ba_uv(self, m: MapStore):
        """Observation pixels for BA edges: RAW pixels when the native
        KB8 lens is the BA camera, undistorted otherwise."""
        return m.kf_feat_uv_raw if self.kb8 is not None else m.kf_feat_uv

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, protect=()) -> list:
        """Full mapping step for one new keyframe (reference Run_Lines
        body, src/LocalMapping.cc:286-454: process, cull landmarks,
        triangulate, fuse neighbors, BA, cull keyframes).

        `protect`: extra KF ids never culled (e.g. the tracker's ref KF).
        Returns the list of (culled_kf, pose_cw, timestamp) so the caller
        can re-anchor any state pointing at removed keyframes."""
        met = self.metrics
        with met.stage("mapping/cull"):
            self.cull_points()
            self.cull_points_pressure(kf)
        with met.stage("mapping/triangulate"):
            self.create_new_points(kf)
        if self.use_lines:
            with met.stage("mapping/lines"):
                self.cull_lines()
                self.cull_lines_pressure(kf)
                self.create_new_lines(kf)
        with met.stage("mapping/fuse"):
            self.search_in_neighbors(kf)
            self.update_point_stats(kf)
        if self.use_imu and not self.map.imu_initialized:
            self.maybe_initialize_imu()
        if self.use_imu and self.map.imu_initialized:
            with met.stage("mapping/liba"):
                self.local_inertial_ba(kf)
            self._kf_since_init += 1
            # periodic scale/gravity refinement pulses until the scale has
            # converged (reference ScaleRefinement schedule,
            # src/LocalMapping.cc:404-449)
            if (not self.map.imu_ba2 and self._kf_since_init % 3 == 0) \
                    or self._kf_since_init % 10 == 0:
                # pulses CONTINUE after convergence at a slower cadence:
                # monocular scale creeps as new regions triangulate
                # (observed |v| inflating 7x over the hall circuit once
                # the pulses stopped; reference keeps ScaleRefinement
                # firing at 25/50/75 s, src/LocalMapping.cc:404-449)
                self.refine_scale()
            # VIBA maturity pulses: full-map inertial BA at ~5 s and
            # ~15 s after IMU init (reference VIBA1/VIBA2 stages of
            # Run_Lines, src/LocalMapping.cc:404-449 — FullInertialBA
            # over ALL keyframes, not just the sliding window; without
            # them drift outside the window is never re-optimized)
            st = self._viba.get(self.map.map_id)
            if st is not None:
                ts = float(self.map.kf_timestamp[kf])
                if ts - st["last"] > 5.0:
                    # periodic full-map pulse: the reference stops at
                    # VIBA1/VIBA2 because FullInertialBA is expensive on
                    # CPU (src/LocalMapping.cc:404-449); the TPU window
                    # kernel makes a sweep cheap enough to repeat, which
                    # keeps drift outside the sliding window bounded.
                    # Past viba_kf_cap the pulse is AMORTIZED — one
                    # chain block per process_keyframe call, round-robin
                    # — so the mapping step never stalls for a burst
                    # that grows with map size (and async mode never
                    # backs up the KF queue behind a sweeps*blocks run)
                    if self._viba_pulse_step(st):
                        st["last"] = ts
                if not st["v2"] and ts - st["t0"] > 15.0:
                    st["v2"] = True
                    self.map.imu_ba2 = True
        else:
            with met.stage("mapping/lba"):
                self.local_ba(kf)
        with met.stage("mapping/kf_cull"):
            culled = self.cull_keyframes(kf, protect=protect)
        self.map.change_index += 1
        return culled

    # ------------------------------------------------------------------
    # Duplicate-landmark fusion (reference SearchInNeighbors,
    # src/LocalMapping.cc:1325 + ORBmatcher::Fuse src/ORBmatcher.cc:823)
    # ------------------------------------------------------------------
    def _replace_point(self, drop: int, keep: int) -> None:
        """MapPoint::Replace analog: rebind every observation of `drop`
        to `keep` (skipping keyframes that already observe `keep`) and
        absorb the found/visible statistics."""
        m = self.map
        kfs = m.valid_kf_indices()
        rl, cols = np.nonzero(m.kf_match_pt[kfs] == drop)
        rows = kfs[rl]
        for r, c in zip(rows, cols):
            if (m.kf_match_pt[r] == keep).any():
                m.kf_match_pt[r, c] = INVALID
            else:
                m.kf_match_pt[r, c] = keep
                m.pt_n_obs[keep] += 1
        m.pt_found[keep] += m.pt_found[drop]
        m.pt_visible[keep] += m.pt_visible[drop]
        m.pt_valid[drop] = False
        m.n_pt -= 1

    def _fuse_into(self, target_kf: int, pt_ids: np.ndarray) -> int:
        """Project candidate map points into `target_kf`; bind unbound
        feature matches as new observations, and when a matched feature
        is already bound to a DIFFERENT point, merge the two landmarks
        (keep the better-observed one)."""
        m = self.map
        cap = self.fuse_cap
        ids = pt_ids[:cap]
        n = len(ids)
        if n == 0:
            return 0
        xyz = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        live = np.zeros(cap, bool)
        xyz[:n] = m.pt_xyz[ids]
        desc[:n] = m.pt_desc[ids]
        live[:n] = m.pt_valid[ids]
        # strict gates for fusion (reference Fuse: TH_LOW=50 descriptor
        # bound + chi2-5.99 reprojection check, src/ORBmatcher.cc:823 —
        # looser tracking-style gates here corrupt geometry via aliased
        # bindings, measured as a 6x ATE regression on the synthetic run)
        _, pt_feat, matched, _ = self.fuse_match(
            jnp.asarray(m.kf_pose_cw[target_kf]), jnp.asarray(xyz),
            jnp.asarray(desc), jnp.asarray(live),
            jnp.asarray(self._ba_uv(m)[target_kf]),
            jnp.asarray(m.kf_feat_desc[target_kf]),
            jnp.asarray(m.kf_feat_octave[target_kf]),
            jnp.asarray(m.kf_feat_valid[target_kf]), jnp.float32(2.0),
            jnp.float32(50.0))
        matched = np.asarray(matched)
        pt_feat = np.asarray(pt_feat)
        row = m.kf_match_pt[target_kf]
        bound = np.zeros(m.max_pts, bool)
        bound[row[row >= 0]] = True
        R_t = m.kf_pose_cw[target_kf, :, :3]
        t_t = m.kf_pose_cw[target_kf, :, 3]
        n_fused = 0
        for slot in np.nonzero(matched[:n])[0]:
            p = int(ids[slot])
            f = int(pt_feat[slot])
            if not m.pt_valid[p]:
                continue            # merged away earlier in this loop
            cur = int(m.kf_match_pt[target_kf, f])
            if cur == p:
                continue
            if cur == INVALID:
                if bound[p]:
                    continue        # p already observed on another feature
                m.kf_match_pt[target_kf, f] = p
                m.pt_n_obs[p] += 1
                bound[p] = True
                n_fused += 1
            elif m.pt_valid[cur]:
                # merge only when the two landmarks coincide in 3D
                # (relative to depth) — descriptor aliasing otherwise
                # welds distinct points and BA drags both wrong
                z = float(R_t[2] @ m.pt_xyz[p] + t_t[2])
                if np.linalg.norm(m.pt_xyz[p] - m.pt_xyz[cur]) \
                        > 0.02 * max(z, 0.5):
                    continue
                keep, drop = ((cur, p) if m.pt_n_obs[cur] >= m.pt_n_obs[p]
                              else (p, cur))
                self._replace_point(drop, keep)
                n_fused += 1
        return n_fused

    def search_in_neighbors(self, kf: int) -> None:
        """Two-hop duplicate fusion around the new keyframe (reference
        SearchInNeighbors, src/LocalMapping.cc:1325: best covisible KFs +
        their neighbors; Fuse target points into them and their points
        into the target)."""
        m = self.map
        n1 = [int(x) for x in m.covisible_kfs(kf, n=10, min_weight=5)
              if m.kf_valid[x]]
        ext = list(n1)
        for nb in n1:
            for y in m.covisible_kfs(nb, n=5, min_weight=5):
                y = int(y)
                if y != kf and m.kf_valid[y] and y not in ext:
                    ext.append(y)
        if not ext:
            return
        # forward: neighborhood points into the new KF
        cand = np.unique(m.kf_match_pt[ext])
        cand = cand[cand >= 0]
        cand = cand[m.pt_valid[cand]]
        fused = self._fuse_into(kf, cand)
        # backward: the new KF's points into each neighbor
        own = m.kf_match_pt[kf]
        own_ids = own[own >= 0]
        own_ids = own_ids[m.pt_valid[own_ids]]
        for nb in ext[:10]:
            fused += self._fuse_into(nb, own_ids)
        self.n_fused += fused
        if fused:
            m.update_covisibility(kf)

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

    def cull_points_pressure(self, kf: int) -> None:
        """Capacity-pressure landmark culling: the fixed-shape point
        store must never fill — alloc_points silently returns fewer
        slots and triangulation starves, which loses tracking as the
        camera enters unmapped territory (observed on the 28 s circuit
        at 16384/16384).  Mirrors the keyframe capacity sweep: when the
        store nears capacity, remove the weakest landmarks (fewest
        observations, worst found/visible ratio) outside the current
        covisibility window."""
        m = self.map
        if m.n_pt <= 0.92 * m.max_pts:
            return
        target = int(0.8 * m.max_pts)
        win = np.unique(np.concatenate(
            [[kf], m.covisible_kfs(kf, n=12, min_weight=5)]))
        prot = np.unique(m.kf_match_pt[win])
        prot = prot[prot >= 0]
        protected = np.zeros(m.max_pts, bool)
        protected[prot] = True
        ids = np.nonzero(m.pt_valid & ~protected)[0]
        if len(ids) == 0:
            return
        ratio = m.pt_found[ids] / np.maximum(m.pt_visible[ids], 1)
        weakness = m.pt_n_obs[ids].astype(np.float64) + ratio
        order = np.argsort(weakness)
        n_remove = min(m.n_pt - target, len(ids))
        if n_remove > 0:
            print(f"[map] point store at {m.n_pt}/{m.max_pts}: culling "
                  f"{n_remove} weakest landmarks", flush=True)
            m.remove_point(ids[order[:n_remove]])

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
        n_epi_total = 0
        n_tri_total = 0
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
                jnp.asarray(free1), uv2, d2, jnp.asarray(free2),
                jnp.asarray(m.kf_feat_angle[nb]),
                jnp.asarray(m.kf_feat_angle[kf]))
            # NOTE: the octave-scaled epipolar gate (oct2=...) was
            # measured to DEGRADE the hall-circuit replay: the dense
            # matcher (unlike the reference's BoW-bucketed
            # SearchForTriangulation) offers many epipolar-consistent
            # wrong candidates at coarse octaves, and triangulation
            # cannot reject matches that slide along the epipolar line.
            # The flat 2 px gate keeps candidate quality high.
            ok_np = np.asarray(ok)
            n_epi_total += int(ok_np.sum())
            if ok_np.sum() == 0:
                continue
            idx2_np = np.asarray(idx2)
            uv_a = m.kf_feat_uv[nb]
            uv_b = m.kf_feat_uv[kf][idx2_np]
            # min_parallax_cos 0.9998 (~1.15 deg) matches the reference
            # CreateNewMapPoints cosParallaxRays gate
            # (src/LocalMapping.cc:795).  The looser 0.99995 (~0.57 deg)
            # admitted near-wall points triangulated from ~2 cm
            # stress-cadence KF baselines whose 20-40% depth noise is
            # mutually inconsistent under camera motion: on the hall
            # circuit they dragged VI pose opt until |v| read 0.20 m/s
            # against 0.60 m/s ground truth and pose inliers hit zero
            # at t~9 s (150 matches, 0 consistent).
            Xw, good = self.triangulate(
                jnp.asarray(m.kf_pose_cw[nb]), pose2,
                jnp.asarray(uv_a), jnp.asarray(uv_b), ok,
                min_parallax_cos=0.9998,
                oct1=jnp.asarray(m.kf_feat_octave[nb]),
                oct2=jnp.asarray(m.kf_feat_octave[kf][idx2_np]))
            good_np = np.asarray(good)
            n_tri_total += int(good_np.sum())
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
        if os.environ.get("PLVIO_TRACE"):
            n_new = sum(len(c) for c in created)
            n_free = int((m.kf_feat_valid[kf]
                          & (m.kf_match_pt[kf] == INVALID)).sum())
            print(f"[map] kf={kf} tri={n_new} unbound={n_free} "
                  f"nbrs={len(neighbors)} epi={n_epi_total} "
                  f"tri_ok={n_tri_total}", flush=True)

    def cull_lines(self) -> None:
        """Map-line culling (reference MapLineCulling,
        src/LocalMapping.cc:687 — same found-ratio rule as points)."""
        m = self.map
        if len(self.recent_lns) < 3:
            return
        batch = self.recent_lns.pop(0)
        batch = batch[m.ln_valid[batch]]
        if len(batch) == 0:
            return
        ratio = m.ln_found[batch] / np.maximum(m.ln_visible[batch], 1)
        bad = (ratio < 0.25) | (m.ln_n_obs[batch] < 2)
        if bad.any():
            m.remove_line(batch[bad])

    def cull_lines_pressure(self, kf: int) -> None:
        """Line-store twin of cull_points_pressure."""
        m = self.map
        if m.n_ln <= 0.92 * m.max_lines:
            return
        target = int(0.8 * m.max_lines)
        win = np.unique(np.concatenate(
            [[kf], m.covisible_kfs(kf, n=12, min_weight=5)]))
        prot = np.unique(m.kf_match_ln[win])
        prot = prot[prot >= 0]
        protected = np.zeros(m.max_lines, bool)
        protected[prot] = True
        ids = np.nonzero(m.ln_valid & ~protected)[0]
        if len(ids) == 0:
            return
        ratio = m.ln_found[ids] / np.maximum(m.ln_visible[ids], 1)
        weakness = m.ln_n_obs[ids].astype(np.float64) + ratio
        order = np.argsort(weakness)
        n_remove = min(m.n_ln - target, len(ids))
        if n_remove > 0:
            m.remove_line(ids[order[:n_remove]])

    def create_new_lines(self, kf: int) -> None:
        """Triangulate unmatched line observations of `kf` against the
        best covisible KFs via interpretation-plane intersection
        (reference CreateNewMapLines, src/LocalMapping.cc:1069)."""
        m = self.map
        neighbors = m.covisible_kfs(kf, n=10, min_weight=5)
        created = []

        def angles(ep):
            return np.arctan2(ep[:, 3] - ep[:, 1],
                              ep[:, 2] - ep[:, 0]) % np.pi

        ep_k = m.kf_line_ep[kf]
        ang_k = angles(ep_k)
        C_k = -m.kf_pose_cw[kf, :, :3].T @ m.kf_pose_cw[kf, :, 3]
        for nb in neighbors:
            if not m.kf_valid[nb]:
                continue
            # baseline / median-depth gate (reference CreateNewMapLines
            # skips near-zero-parallax neighbors the same way points do)
            C_n = -m.kf_pose_cw[nb, :, :3].T @ m.kf_pose_cw[nb, :, 3]
            med_depth = self._median_depth(nb)
            if med_depth <= 0 or np.linalg.norm(C_k - C_n) / med_depth < 0.01:
                continue
            free_k = m.kf_line_valid[kf] & (m.kf_match_ln[kf] == INVALID)
            free_n = m.kf_line_valid[nb] & (m.kf_match_ln[nb] == INVALID)
            if free_k.sum() == 0 or free_n.sum() == 0:
                continue
            ep_n = m.kf_line_ep[nb]
            idx_k, ok = self.line_pair_match(
                jnp.asarray(ep_n), jnp.asarray(m.kf_line_desc[nb]),
                jnp.asarray(angles(ep_n), jnp.float32), jnp.asarray(free_n),
                jnp.asarray(ep_k), jnp.asarray(m.kf_line_desc[kf]),
                jnp.asarray(ang_k, jnp.float32), jnp.asarray(free_k))
            ok_np = np.asarray(ok)
            if ok_np.sum() == 0:
                continue
            idx_np = np.asarray(idx_k)
            ep2 = ep_k[idx_np]
            Xs_w, Xe_w, good = self.line_triangulate(
                jnp.asarray(m.kf_pose_cw[nb]), jnp.asarray(m.kf_pose_cw[kf]),
                jnp.asarray(ep_n), jnp.asarray(ep2), ok)
            good_np = np.asarray(good)
            if good_np.sum() == 0:
                continue
            f1 = np.nonzero(good_np)[0]
            f2 = idx_np[good_np]
            fresh = m.kf_match_ln[kf][f2] == INVALID
            f1, f2 = f1[fresh], f2[fresh]
            if len(f1) == 0:
                continue
            lns = m.alloc_lines(len(f1))
            nn = len(lns)
            f1, f2 = f1[:nn], f2[:nn]
            Xs_np = np.asarray(Xs_w)
            Xe_np = np.asarray(Xe_w)
            m.ln_ep[lns] = np.concatenate([Xs_np[f1], Xe_np[f1]], -1)
            m.ln_desc[lns] = m.kf_line_desc[kf][f2]
            m.ln_first_kf[lns] = kf
            m.ln_n_obs[lns] = 2
            m.ln_found[lns] = 2
            m.ln_visible[lns] = 2
            m.kf_match_ln[nb, f1] = lns
            m.kf_match_ln[kf, f2] = lns
            created.append(lns)
        if created:
            self.recent_lns.append(np.concatenate(created))

    def update_point_stats(self, kf: int) -> None:
        """MapPoint statistics for the points bound in keyframe `kf`:
        distinctive descriptor (the observation minimizing median
        Hamming distance to the others, reference
        MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc), mean
        viewing normal and scale-invariance distance range
        (UpdateNormalAndDepth) — consumed by the projection matcher's
        frustum gates (Frame::isInFrustum + MapPoint::PredictScale)."""
        m = self.map
        pt_ids = np.unique(m.kf_match_pt[kf])
        pt_ids = pt_ids[pt_ids >= 0]
        pt_ids = pt_ids[m.pt_valid[pt_ids]]
        if len(pt_ids) == 0:
            return
        kfs = m.valid_kf_indices()
        match = m.kf_match_pt[kfs]                            # [K,F]
        sel = np.isin(match, pt_ids)
        ks, fs = np.nonzero(sel)
        pts = match[ks, fs]
        order = np.argsort(pts, kind="stable")
        ks, fs, pts = ks[order], fs[order], pts[order]
        starts = np.searchsorted(pts, pt_ids, side="left")
        ends = np.searchsorted(pts, pt_ids, side="right")

        C_all = np.einsum("kji,kj->ki",
                          m.kf_pose_cw[kfs][:, :, :3],
                          -m.kf_pose_cw[kfs][:, :, 3])        # centers
        scale = 1.2
        n_levels = 8
        # vectorized over all points with padded observation groups of
        # up to G (a python per-point loop here costs seconds per KF)
        G = 8
        n_obs_pt = ends - starts
        use = n_obs_pt >= 2
        if not use.any():
            return
        pt_sel = pt_ids[use]
        s0 = starts[use]
        cnt = np.minimum(n_obs_pt[use], G)
        gidx = s0[:, None] + np.arange(G)[None, :]            # [N,G]
        gmask = np.arange(G)[None, :] < cnt[:, None]
        gidx = np.minimum(gidx, len(ks) - 1)
        okf = ks[gidx]                                        # [N,G]
        ofe = fs[gidx]
        X = m.pt_xyz[pt_sel]                                  # [N,3]
        v = X[:, None, :] - C_all[okf]                        # [N,G,3]
        d = np.linalg.norm(v, axis=-1)
        v = v / np.maximum(d[..., None], 1e-9)
        v = np.where(gmask[..., None], v, 0.0)
        nrm = v.sum(1)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                          1e-9)
        m.pt_normal[pt_sel] = nrm.astype(np.float32)
        # distance range from the newest observation's octave
        ts = np.where(gmask, m.kf_timestamp[kfs[okf]], -np.inf)
        j = np.argmax(ts, axis=1)
        ar = np.arange(len(pt_sel))
        lvl = m.kf_feat_octave[kfs[okf[ar, j]], ofe[ar, j]]
        dist_ref = d[ar, j]
        m.pt_max_dist[pt_sel] = (dist_ref * scale ** lvl).astype(np.float32)
        m.pt_min_dist[pt_sel] = (m.pt_max_dist[pt_sel]
                                 / scale ** (n_levels - 1))
        # distinctive descriptor: min median Hamming to the others
        descs = m.kf_feat_desc[kfs[okf], ofe]                 # [N,G,8] u32
        bits = np.unpackbits(
            descs.view(np.uint8).reshape(len(pt_sel), G, 32), axis=-1)
        ham = (bits[:, :, None, :] != bits[:, None, :, :]).sum(-1)
        pair_ok = gmask[:, :, None] & gmask[:, None, :]
        ham = np.where(pair_ok, ham, 0)
        # median over the valid row entries (pad-safe: use sum as a
        # robust proxy when groups are small)
        med = ham.sum(-1) / np.maximum(cnt[:, None] - 1, 1)
        med = np.where(gmask, med, 1e9)
        best = np.argmin(med, axis=1)
        m.pt_desc[pt_sel] = descs[ar, best]

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
            obs_uv.append(self._ba_uv(m)[kfi, feat])
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

        ln_ids = np.zeros(0, np.int32)
        use_pl = False
        if self.use_lines:
            ln_ids = np.unique(m.kf_match_ln[window])
            ln_ids = ln_ids[ln_ids >= 0]
            ln_ids = ln_ids[m.ln_valid[ln_ids]]
            # only multi-view-confirmed lines optimize poses: a 2-view
            # line sits exactly on its two interpretation planes (zero
            # residual by construction) yet its depth can be badly
            # conditioned — letting it pull poses degrades VI accuracy
            # ~8x on the synthetic orbit (measured)
            ln_ids = ln_ids[m.ln_n_obs[ln_ids] >= 3][:self.ba_ln_cap]
            use_pl = len(ln_ids) >= 8
        if use_pl:
            ln_slot = np.full(m.max_lines, -1, np.int32)
            ln_slot[ln_ids] = np.arange(len(ln_ids))
            lobs_kf, lobs_ln, lobs_eq, lobs_dir = [], [], [], []
            for s, kfi in enumerate(slots):
                match = m.kf_match_ln[kfi]
                feat = np.nonzero((match >= 0) & np.isin(match, ln_ids))[0]
                if len(feat) == 0:
                    continue
                lobs_kf.append(np.full(len(feat), s, np.int32))
                lobs_ln.append(ln_slot[match[feat]])
                ep = m.kf_line_ep[kfi, feat]
                sp = np.concatenate([ep[:, :2], np.ones((len(ep), 1))], 1)
                e_ = np.concatenate([ep[:, 2:], np.ones((len(ep), 1))], 1)
                l = np.cross(sp, e_)
                l /= np.maximum(np.linalg.norm(l[:, :2], axis=1,
                                               keepdims=True), 1e-9)
                lobs_eq.append(l.astype(np.float32))
                d = ep[:, 2:] - ep[:, :2]
                d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True),
                                1e-6)
                lobs_dir.append(d.astype(np.float32))
            lobs_kf = np.concatenate(lobs_kf)[:self.ba_lobs_cap]
            lobs_ln = np.concatenate(lobs_ln)[:self.ba_lobs_cap]
            lobs_eq = np.concatenate(lobs_eq)[:self.ba_lobs_cap]
            lobs_dir = np.concatenate(lobs_dir)[:self.ba_lobs_cap]
            n_lobs = len(lobs_kf)
            ln_ep6 = np.zeros((self.ba_ln_cap, 6), np.float32)
            ln_ep6[:len(ln_ids)] = m.ln_ep[ln_ids]
            ln_free = np.zeros(self.ba_ln_cap, bool)
            ln_free[:len(ln_ids)] = True
        if use_pl and self.local_ba_lines_kernel is not None:
            # `SLAM` modes 1-3: poses from line observations alone
            # (reference LocalBundleAdjustmentOnlyLines(+Angle),
            # src/Optimizer.cc:6181,6433,6689); points stay fixed
            new_poses, new_lns, inlier_l = self.local_ba_lines_kernel(
                jnp.asarray(kf_poses), jnp.asarray(free_mask),
                jnp.asarray(ln_ep6), jnp.asarray(ln_free),
                jnp.asarray(pad(lobs_kf, self.ba_lobs_cap)),
                jnp.asarray(pad(lobs_ln, self.ba_lobs_cap)),
                jnp.asarray(pad(lobs_eq, self.ba_lobs_cap)),
                jnp.asarray(pad(lobs_dir, self.ba_lobs_cap)),
                jnp.asarray(pad(np.ones(n_lobs, bool), self.ba_lobs_cap,
                                False)),
                jnp.asarray(pad(np.ones(n_lobs, np.float32),
                                self.ba_lobs_cap)))
            m.ln_ep[ln_ids] = np.asarray(new_lns)[:len(ln_ids)]
            new_pts = pt_xyz
            inlier = jnp.ones(self.ba_obs_cap, bool)
        elif use_pl:
            (new_poses, new_pts, new_lns, inlier, inlier_l) = \
                self.local_ba_pl_kernel(
                    jnp.asarray(kf_poses), jnp.asarray(free_mask),
                    jnp.asarray(pt_xyz), jnp.asarray(pt_free),
                    jnp.asarray(pad(obs_kf, self.ba_obs_cap)),
                    jnp.asarray(pad(obs_pt, self.ba_obs_cap)),
                    jnp.asarray(pad(obs_uv, self.ba_obs_cap)),
                    jnp.asarray(pad(np.ones(n_obs, bool), self.ba_obs_cap,
                                    False)),
                    jnp.asarray(pad(obs_is2.astype(np.float32),
                                    self.ba_obs_cap)),
                    jnp.asarray(ln_ep6), jnp.asarray(ln_free),
                    jnp.asarray(pad(lobs_kf, self.ba_lobs_cap)),
                    jnp.asarray(pad(lobs_ln, self.ba_lobs_cap)),
                    jnp.asarray(pad(lobs_eq, self.ba_lobs_cap)),
                    jnp.asarray(pad(np.ones(n_lobs, bool), self.ba_lobs_cap,
                                    False)),
                    jnp.asarray(pad(np.ones(n_lobs, np.float32),
                                    self.ba_lobs_cap)))
            m.ln_ep[ln_ids] = np.asarray(new_lns)[:len(ln_ids)]
        else:
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
        wr = free_mask[:len(slots)] \
            & np.isfinite(new_poses[:len(slots)]).all((1, 2))
        m.kf_pose_cw[slots[wr]] = new_poses[:len(slots)][wr]
        okp = np.isfinite(new_pts[:len(pt_ids)]).all(1)
        m.pt_xyz[pt_ids[okp]] = new_pts[:len(pt_ids)][okp]

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
        # points that lost all observations are bad (single-obs points
        # are legitimate for depth-seeded stereo/RGB-D landmarks)
        orphan = pt_ids[m.pt_n_obs[pt_ids] < 1]
        if len(orphan):
            m.remove_point(orphan)

    # ------------------------------------------------------------------
    # Inertial: initialization + windowed VI-BA
    # ------------------------------------------------------------------
    @staticmethod
    def _pre_const(p):
        return {"dT": p.dT, "dR": p.dR, "dV": p.dV, "dP": p.dP,
                "JRg": p.JRg, "JVg": p.JVg, "JVa": p.JVa,
                "JPg": p.JPg, "JPa": p.JPa,
                "bg0": p.bias_gyro, "ba0": p.bias_acc}

    def _chain_preints(self, chain):
        """Preintegrations between consecutive chain KFs (stored at the
        later KF).  Returns list parallel to chain[1:], None where raw
        data is missing."""
        m = self.map
        return [m.kf_preint.get(int(k)) for k in chain[1:]]

    def _push_transform(self, R_gw, s):
        """Compose map transforms if several fire before the tracker
        consumes them."""
        if self.pending_transform is None:
            self.pending_transform = (R_gw, s)
        else:
            R0, s0 = self.pending_transform
            self.pending_transform = (R_gw @ R0, s * s0)

    def _chain_gs_inputs(self, chain, cap):
        """Build padded (pose_R, pose_p, stacked preint consts, infos,
        edge_valid) for the gravity/scale problems over a KF chain."""
        import jax.numpy as jnp
        m = self.map
        n = len(chain)
        preints = self._chain_preints(chain)
        m.recompute_body_poses(self.Tbc)
        pose_R = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
        pose_p = np.zeros((cap, 3), np.float32)
        pose_R[:n] = m.kf_pose_wb[chain, :, :3]
        pose_p[:n] = m.kf_pose_wb[chain, :, 3]
        ident = self._imu_ops.identity_preintegrated()
        stack = {}
        for key in self._pre_const(ident):
            vals = []
            for i in range(cap - 1):
                p = preints[i] if i < len(preints) and preints[i] is not None \
                    else ident
                vals.append(self._pre_const(p)[key])
            stack[key] = jnp.stack(vals)
        infos = []
        edge_valid = np.zeros(cap - 1, bool)
        for i in range(cap - 1):
            p = preints[i] if i < len(preints) else None
            if p is not None and float(p.dT) > 1e-4:
                C9 = np.asarray(p.C)[:9, :9] + np.eye(9) * 1e-8
                infos.append(np.linalg.inv(C9))
                edge_valid[i] = True
            else:
                infos.append(np.eye(9))
        infos = jnp.asarray(np.stack(infos), jnp.float32)
        return pose_R, pose_p, stack, infos, edge_valid

    def refine_scale(self) -> None:
        """One gravity/scale refinement pulse over the recent chain."""
        import jax.numpy as jnp
        m = self.map
        chain = m.kf_chain()[-self.imu_init_cap:]
        if len(chain) < 4:
            return
        n = len(chain)
        cap = self.imu_init_cap
        pose_R, pose_p, stack, infos, edge_valid = self._chain_gs_inputs(
            chain, cap)
        vel = np.zeros((cap, 3), np.float32)
        vel[:n] = m.kf_vel[chain]
        newest = chain[-1]
        Rwg, s = self.scale_refine_kernel(
            jnp.eye(3, dtype=jnp.float32), jnp.asarray(vel),
            jnp.asarray(m.kf_bias_g[newest], jnp.float32),
            jnp.asarray(m.kf_bias_a[newest], jnp.float32),
            stack, jnp.asarray(pose_R), jnp.asarray(pose_p), infos,
            jnp.asarray(edge_valid))
        s = float(s)
        Rwg_np = np.asarray(Rwg)
        from ..utils import lie as _lie
        g_ang = float(np.linalg.norm(np.asarray(_lie.so3_log(
            jnp.asarray(Rwg_np, jnp.float32)))))
        import os as _os
        if _os.environ.get("PLVIO_TRACE"):
            print(f"[trace] refine_scale s={s:.4f} "
                  f"g_ang={np.degrees(g_ang):.3f}deg", flush=True)
        if not np.isfinite(s) or s < 0.3 or s > 3.0 \
                or not np.isfinite(g_ang):
            return
        if abs(s - 1.0) < 1e-3:
            self.map.imu_ba2 = True   # scale converged
        # gravity-DIRECTION correction applies INDEPENDENTLY of scale
        # (reference ScaleRefinement re-estimates Rwg at every pulse and
        # always applies it, src/LocalMapping.cc:2270): a residual ~0.5-1
        # deg world-gravity tilt is invisible to the scale estimate but
        # on a yawing circuit shows up as a ROTATING body-frame accel
        # bias the random-walk-limited estimator chases with lag —
        # measured |ba| 7x the true bias and a ~30% velocity deficit in
        # the fast-yaw arcs before the t~11 s tracking loss.
        scale_off = (not self.map.imu_ba2 and abs(s - 1.0) >= 1e-3) \
            or abs(s - 1.0) >= 0.05
        grav_off = g_ang > np.radians(0.15)
        if grav_off and not scale_off:
            # rate-limit pure-gravity corrections: under stress cadence
            # the 10-KF pulse period shrinks below a second and
            # correction-vs-LIBA oscillation replaces convergence
            ts_new = float(m.kf_timestamp[newest])
            last = getattr(self, "_last_gfix", {}).get(m.map_id, -1e18)
            if ts_new - last < 2.5:
                grav_off = False
            else:
                if not hasattr(self, "_last_gfix"):
                    self._last_gfix = {}
                self._last_gfix[m.map_id] = ts_new
        if not scale_off and not grav_off:
            return
        s_apply = s if scale_off else 1.0
        R_gw = Rwg_np.T
        m.apply_scaled_rotation(R_gw, s_apply, self.Tbc)
        self._push_transform(R_gw, s_apply)

    def maybe_initialize_imu(self, min_kfs: int = 8,
                             min_span: float = 1.9) -> None:
        """reference LocalMapping::InitializeIMU src/LocalMapping.cc:2143:
        once enough KFs/time, solve gravity dir + scale + biases +
        velocities with poses fixed, then rotate/scale the map and run a
        full inertial BA."""
        m = self.map
        chain = m.kf_chain()
        if len(chain) < min_kfs:
            return
        span = m.kf_timestamp[chain[-1]] - m.kf_timestamp[chain[0]]
        if span < min_span:
            return
        chain = chain[-self.imu_init_cap:]
        preints = self._chain_preints(chain)
        ok_edges = [p is not None and float(p.dT) > 1e-4 for p in preints]
        if sum(ok_edges) < min_kfs - 1:
            return

        cap = self.imu_init_cap
        n = len(chain)
        m.recompute_body_poses(self.Tbc)
        pose_R = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
        pose_p = np.zeros((cap, 3), np.float32)
        pose_R[:n] = m.kf_pose_wb[chain, :, :3]
        pose_p[:n] = m.kf_pose_wb[chain, :, 3]

        # stacked constants, identity-filled where missing
        import jax.numpy as jnp
        from ..ops import imu as IMUOPS
        ident = IMUOPS.identity_preintegrated()
        stack = {}
        for key in self._pre_const(ident):
            vals = []
            for i in range(cap - 1):
                p = preints[i] if i < len(preints) and preints[i] is not None \
                    else ident
                vals.append(self._pre_const(p)[key])
            stack[key] = jnp.stack(vals)
        infos = []
        edge_valid = np.zeros(cap - 1, bool)
        for i in range(cap - 1):
            if i < len(preints) and preints[i] is not None and ok_edges[i]:
                C9 = np.asarray(preints[i].C)[:9, :9] + np.eye(9) * 1e-8
                infos.append(np.linalg.inv(C9))
                edge_valid[i] = True
            else:
                infos.append(np.eye(9))
        infos = jnp.asarray(np.stack(infos), jnp.float32)

        # initial velocities: position differences over the chain
        vel0 = np.zeros((cap, 3), np.float32)
        dts = np.diff(m.kf_timestamp[chain])
        dp = np.diff(pose_p[:n], axis=0)
        v = dp / np.maximum(dts[:, None], 1e-3)
        vel0[:n - 1] = v
        vel0[n - 1] = v[-1]

        # initial gravity direction: average accelerometer in world
        dirG = np.zeros(3)
        for i, p in enumerate(preints):
            if p is not None:
                dirG -= pose_R[i + 1] @ np.asarray(p.avg_a)
        nrm = np.linalg.norm(dirG)
        if nrm < 1e-6:
            return
        dirG /= nrm
        gI = np.array([0.0, 0.0, -1.0])
        vx = np.cross(gI, dirG)
        s_ = np.linalg.norm(vx)
        ang = np.arctan2(s_, float(gI @ dirG))
        from ..utils import lie
        Rwg0 = np.asarray(lie.so3_exp(
            jnp.asarray(vx / max(s_, 1e-9) * ang, jnp.float32)))

        Rwg, scale, bg, ba, vel = self.imu_init_kernel(
            jnp.asarray(Rwg0, jnp.float32), jnp.asarray(vel0),
            stack, jnp.asarray(pose_R), jnp.asarray(pose_p), infos,
            jnp.asarray(edge_valid))
        scale = float(scale)
        import os as _os
        if _os.environ.get("PLVIO_TRACE"):
            print(f"[trace] imu_init scale={scale:.4f} "
                  f"bg={np.asarray(bg)} ba={np.asarray(ba)}", flush=True)
        if scale < 1e-2:   # degenerate (reference aborts if scale<0.02)
            return
        bg = np.asarray(bg)
        ba = np.asarray(ba)

        # write velocities/biases (SLAM frame), then re-express the map in
        # the gravity-aligned metric frame
        m.kf_vel[chain] = np.asarray(vel)[:n]
        kfs = m.valid_kf_indices()
        m.kf_bias_g[kfs] = bg
        m.kf_bias_a[kfs] = ba
        R_gw = np.asarray(Rwg).T
        m.apply_scaled_rotation(R_gw, scale, self.Tbc)

        # reintegrate stored KF windows at the solved biases
        for k in list(m.kf_imu_raw.keys()):
            g_, a_, d_ = m.kf_imu_raw[k]
            m.kf_preint[k] = self._reintegrate(g_, a_, d_, bg, ba)

        m.imu_initialized = True
        t0_init = float(m.kf_timestamp[chain[-1]])
        self._viba[m.map_id] = {"t0": t0_init, "last": t0_init,
                                "v2": False}
        self._push_transform(R_gw, scale)
        # full inertial BA over the recent chain (reference FullInertialBA)
        self.local_inertial_ba(int(chain[-1]), window=min(len(chain),
                                                          self.ba_kf_cap))
        m.imu_ba1 = True

    def _reintegrate(self, g, a, d, bg, ba):
        import jax.numpy as jnp
        cap = 64
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
        return self._imu_ops.preintegrate(
            jnp.asarray(gg), jnp.asarray(aa), jnp.asarray(dd),
            jnp.asarray(mm), self.calib,
            jnp.asarray(bg, jnp.float32), jnp.asarray(ba, jnp.float32))

    def local_inertial_ba(self, kf: int, window: Optional[int] = None) -> None:
        """Sliding-window VI-BA over the temporal chain (reference
        LocalInertialBA src/Optimizer.cc:9185: window Nd, fixed anchor)."""
        m = self.map
        W = min(window or min(self.cfg.tracking.lba_window + 1,
                              self.ba_kf_cap), self.ba_kf_cap)
        chain = m.kf_chain()
        if len(chain) < 3:
            return
        win = chain[-W:]
        free = np.zeros(len(win), bool)
        free[1:] = True         # anchor = oldest window KF
        # FIXED visual observers (reference LocalInertialBA's
        # lFixedKeyFrames, src/Optimizer.cc:9284: up to 200 fixed KFs
        # observing the window's points join with reprojection edges
        # only).  Without them the window solve can re-scale shared
        # landmarks every keyframe and monocular scale random-walks on
        # exploration trajectories (observed on the hall orbit: |v|
        # inflating 5x over 8 s while every in-window residual stayed
        # consistent).  The spare kernel slots take the most-covisible
        # older KFs; their inertial edges are masked off in
        # _liba_window (non-consecutive chain entries).
        rest = chain[:-W]
        spare = self.ba_kf_cap - len(win)
        if len(rest) and spare > 0:
            wts = m.covis[np.ix_(rest, win)].sum(1)
            order = np.argsort(-wts)[:spare]
            extra = rest[order][wts[order] > 0]
            if len(extra):
                extra = extra[np.argsort(m.kf_timestamp[extra])]
                win = np.concatenate([extra, win])
                free = np.concatenate(
                    [np.zeros(len(extra), bool), free])
        self._liba_window(win, free)

    def _viba_pulse_step(self, st: dict, sweeps: int = 2,
                         halo: int = 2) -> bool:
        """One amortized slice of the periodic full-map VIBA pulse.

        Small maps (chain <= viba_kf_cap) run the single full solve and
        finish immediately.  Big maps enqueue the sweeps x blocks
        schedule of full_inertial_ba once and run ONE block solve per
        call; returns True when the pulse (all queued blocks) completed.
        """
        m = self.map
        chain = m.kf_chain()
        if len(chain) <= self.viba_kf_cap:
            self.full_inertial_ba(sweeps=sweeps, halo=halo)
            return True
        pending = st.get("pulse_blocks")
        if pending is None:
            # enqueue block START positions only — keyframes may be
            # culled between slices, so each slice re-derives its window
            # from the CURRENT chain
            W = self.viba_kf_cap - 2 * halo
            pending = [b0 for _ in range(sweeps)
                       for b0 in range(0, len(chain), W)]
            st["pulse_blocks"] = pending
        W = self.viba_kf_cap - 2 * halo
        while pending:
            b0 = pending.pop(0)
            if b0 >= len(chain):
                continue
            pos_of = {int(k): i for i, k in enumerate(chain)}
            block = chain[max(0, b0 - halo):b0 + W + halo]
            free = np.array([b0 <= pos_of[int(k)] < b0 + W
                             for k in block])
            free[block == chain[0]] = False
            if free.all():
                free[0] = False
            if free.any():
                self._liba_window(block, free, big=True)
                break
        if not pending:
            st["pulse_blocks"] = None
            return True
        return False

    def full_inertial_ba(self, sweeps: int = 2, halo: int = 2) -> None:
        """Full-map visual-inertial BA (reference FullInertialBA over
        ALL keyframes, src/Optimizer.cc:1921, run at the VIBA1/VIBA2
        maturity pulses of LocalMapping Run_Lines :404-449 and as the
        inertial global BA after loop closing): maps beyond the window
        kernel's capacity run contiguous temporal-chain blocks with
        frozen halo keyframes, block-Gauss-Seidel swept — the same
        partition schedule as the chained visual GBA, so one compiled
        window kernel serves any map size."""
        m = self.map
        chain = m.kf_chain()
        if len(chain) < 3:
            return
        if len(chain) <= self.viba_kf_cap:
            free = np.zeros(len(chain), bool)
            free[1:] = True
            # NOTE: free_all_biases=True would let a mis-estimated
            # init bias be corrected (FullInertialBA-bInit analog;
            # it rescued the hall-circuit run's 0.018 rad/s bias) but
            # measured as destabilizing when the init bias is GOOD
            # (25 s sweep lost tracking at t~14.5 s) — the reference
            # stages this with priorG/priorA soft priors that relax
            # across VIBA1/VIBA2, which is the right next step.  Until
            # that staging exists, keep biases anchored by default.
            self._liba_window(chain, free,
                              big=len(chain) > self.ba_kf_cap)
            return
        W = self.viba_kf_cap - 2 * halo
        pos_of = {int(k): i for i, k in enumerate(chain)}
        for _ in range(sweeps):
            for b0 in range(0, len(chain), W):
                block = chain[max(0, b0 - halo):b0 + W + halo]
                free = np.array([b0 <= pos_of[int(k)] < b0 + W
                                 for k in block])
                free[block == chain[0]] = False   # global gauge anchor
                if not free.any():
                    continue
                if free.all():
                    free[0] = False
                self._liba_window(block, free, big=True)

    def _window_line_obs(self, win: np.ndarray, ln_cap: int,
                         lobs_cap: int):
        """Line landmarks + endpoint-to-line observations of `win`
        (FullInertialBAwithLine parity, src/Optimizer.cc:1374); only
        multi-view-confirmed lines (see local_ba)."""
        m = self.map
        ln_ids = np.unique(m.kf_match_ln[win])
        ln_ids = ln_ids[ln_ids >= 0]
        ln_ids = ln_ids[m.ln_valid[ln_ids]]
        ln_ids = ln_ids[m.ln_n_obs[ln_ids] >= 3][:ln_cap]
        ln_slot = np.full(m.max_lines, -1, np.int32)
        ln_slot[ln_ids] = np.arange(len(ln_ids))
        lobs_kf, lobs_ln, lobs_eq = [], [], []
        for s, kfi in enumerate(win):
            match = m.kf_match_ln[kfi]
            feat = np.nonzero((match >= 0) & np.isin(match, ln_ids))[0]
            if len(feat) == 0:
                continue
            lobs_kf.append(np.full(len(feat), s, np.int32))
            lobs_ln.append(ln_slot[match[feat]])
            ep = m.kf_line_ep[kfi, feat]
            sp = np.concatenate([ep[:, :2], np.ones((len(ep), 1))], 1)
            e_ = np.concatenate([ep[:, 2:], np.ones((len(ep), 1))], 1)
            leq = np.cross(sp, e_)
            leq /= np.maximum(np.linalg.norm(leq[:, :2], axis=1,
                                             keepdims=True), 1e-9)
            lobs_eq.append(leq.astype(np.float32))
        if lobs_kf:
            lobs_kf = np.concatenate(lobs_kf)[:lobs_cap]
            lobs_ln = np.concatenate(lobs_ln)[:lobs_cap]
            lobs_eq = np.concatenate(lobs_eq)[:lobs_cap]
        else:
            lobs_kf = np.zeros(0, np.int32)
            lobs_ln = np.zeros(0, np.int32)
            lobs_eq = np.zeros((0, 3), np.float32)
        return ln_ids, lobs_kf, lobs_ln, lobs_eq

    def _erase_window_outliers(self, win: np.ndarray,
                               pt_ids: np.ndarray, obs_kf: np.ndarray,
                               obs_pt: np.ndarray, obs_uv: np.ndarray,
                               obs_is2: np.ndarray) -> None:
        """Erase observations the window solve left chi2-inconsistent
        (reference LocalInertialBA's vToErase pass,
        src/Optimizer.cc:9408: obs with chi2Mono2 > 5.991 are removed
        from both KeyFrame and MapPoint after the optimization).
        Without this the stress-cadence triangulations that BA rejects
        every solve stay BOUND in the covisible window forever — they
        keep matching by descriptor while their 3D positions agree with
        no pose, which is exactly the matched-but-inconsistent collapse
        (450 matches / 30 inliers) observed before the t~10 s circuit
        loss.  Recomputed host-side from the POST-solve states so the
        same pass covers the single-device kernel and the distributed
        back end."""
        m = self.map
        if len(obs_kf) == 0 or self.kb8 is not None:
            return
        T_cw = m.kf_pose_cw[win[obs_kf]]
        X = m.pt_xyz[pt_ids[obs_pt]]
        pc = np.einsum("oij,oj->oi", T_cw[:, :, :3], X) + T_cw[:, :, 3]
        z = pc[:, 2]
        K = self.K
        u = K.fx * pc[:, 0] / np.maximum(z, 1e-6) + K.cx
        v = K.fy * pc[:, 1] / np.maximum(z, 1e-6) + K.cy
        err2 = (u - obs_uv[:, 0]) ** 2 + (v - obs_uv[:, 1]) ** 2
        # _erase_chi2_mult (default 1 = reference gate) is raised to 3
        # around merge welds: those solves START far from convergence
        # and erasing at the plain gate removes good constraints
        # permanently; the circuit validation ran at 1x
        mult = getattr(self, "_erase_chi2_mult", 1.0)
        bad = (err2 * obs_is2 > mult * 5.991) | (z < 0.05)
        if not bad.any():
            return
        for s_loc in np.unique(obs_kf[bad]):
            kfi = int(win[s_loc])
            bad_pts = pt_ids[obs_pt[bad & (obs_kf == s_loc)]]
            match = m.kf_match_pt[kfi]
            unbind = np.isin(match, bad_pts)
            m.kf_match_pt[kfi, unbind] = INVALID
            m.pt_n_obs[bad_pts] -= 1
        # a mono point below 2 observations can no longer be
        # re-triangulated or constrained — remove it (depth-seeded
        # stereo/RGB-D landmarks are legitimate at 1)
        min_obs = 1 if self.cfg.sensor in (1, 2, 4) else 2
        dead = pt_ids[m.pt_n_obs[pt_ids] < min_obs]
        if len(dead):
            m.remove_point(dead)

    def _liba_window(self, win: np.ndarray, free_np: np.ndarray,
                     big: bool = False,
                     free_all_biases: bool = False) -> None:
        """One VI-BA solve over the chain-consecutive keyframes `win`
        with `free_np` marking the optimizable ones.  `big` selects the
        wide VIBA kernel (viba_kf_cap keyframes — full-map inertial BA
        with every KF free, the shape FullInertialBA needs; the block
        fallback with frozen halos cannot remove global drift)."""
        import jax.numpy as jnp
        m = self.map
        n = len(win)
        if big:
            cap = self.viba_kf_cap
            pt_cap, obs_cap = self.viba_pt_cap, self.viba_obs_cap
            ln_cap, lobs_cap = self.viba_ln_cap, self.viba_lobs_cap
            if self.viba_kernel is None:
                self.viba_kernel = KN.make_local_inertial_ba(
                    self.ba_K, cap, pt_cap, obs_cap,
                    self.R_cb, self.t_cb, self.cfg.imu.gravity,
                    n_ln=ln_cap, n_lobs=lobs_cap)
            kernel = self.viba_kernel
        else:
            cap = self.ba_kf_cap
            pt_cap, obs_cap = self.ba_pt_cap, self.ba_obs_cap
            ln_cap, lobs_cap = self.liba_ln_cap, self.liba_lobs_cap
            kernel = self.liba_kernel
        m.recompute_body_poses(self.Tbc)

        kf_pose_wb = np.tile(np.eye(3, 4, dtype=np.float32), (cap, 1, 1))
        kf_pose_wb[:n] = m.kf_pose_wb[win]
        kf_vel = np.zeros((cap, 3), np.float32)
        kf_vel[:n] = m.kf_vel[win]
        kf_bg = np.zeros((cap, 3), np.float32)
        kf_bg[:n] = m.kf_bias_g[win]
        kf_ba = np.zeros((cap, 3), np.float32)
        kf_ba[:n] = m.kf_bias_a[win]
        kf_free = np.zeros(cap, bool)
        kf_free[:n] = free_np
        # bias states: the VIBA pulses free every bias (incl. the
        # anchor's) so the init bias estimate stays correctable — see
        # the kernel docstring
        kf_free_bias = np.zeros(cap, bool)
        kf_free_bias[:n] = True if free_all_biases else free_np

        # preintegration chain
        preints = self._chain_preints(win)
        ident = self._imu_ops.identity_preintegrated()
        stack = {}
        for key in self._pre_const(ident):
            vals = []
            for i in range(cap - 1):
                p = preints[i] if i < len(preints) and preints[i] is not None \
                    else ident
                vals.append(self._pre_const(p)[key])
            stack[key] = jnp.stack(vals)
        infos = []
        edge_valid = np.zeros(cap - 1, bool)
        rw_g = np.zeros(cap - 1, np.float32)
        rw_a = np.zeros(cap - 1, np.float32)
        for i in range(cap - 1):
            p = preints[i] if i < len(preints) else None
            # an inertial edge is only valid between CHAIN-CONSECUTIVE
            # window entries: the preint stored at win[i+1] spans from
            # its true temporal predecessor, so fixed visual observers
            # spliced into the window (local_inertial_ba) or culled-KF
            # gaps must not get a bogus edge
            consec = i + 1 < n and int(m.kf_prev[win[i + 1]]) == int(win[i])
            if p is not None and float(p.dT) > 1e-4 and consec:
                C9 = np.asarray(p.C)[:9, :9] + np.eye(9) * 1e-8
                infos.append(np.linalg.inv(C9))
                edge_valid[i] = True
                Cb = np.asarray(p.C)
                rw_g[i] = 1.0 / max(Cb[9:12, 9:12].trace() / 3, 1e-12)
                rw_a[i] = 1.0 / max(Cb[12:15, 12:15].trace() / 3, 1e-12)
            else:
                infos.append(np.eye(9))
        infos = jnp.asarray(np.stack(infos), jnp.float32)

        # visual observations of window KFs
        pt_ids = np.unique(m.kf_match_pt[win])
        pt_ids = pt_ids[pt_ids >= 0]
        pt_ids = pt_ids[m.pt_valid[pt_ids]][:pt_cap]
        pt_slot = np.full(m.max_pts, -1, np.int32)
        pt_slot[pt_ids] = np.arange(len(pt_ids))
        obs_kf, obs_pt, obs_uv, obs_is2 = [], [], [], []
        for s, kfi in enumerate(win):
            match = m.kf_match_pt[kfi]
            feat = np.nonzero((match >= 0) & np.isin(match, pt_ids))[0]
            obs_kf.append(np.full(len(feat), s, np.int32))
            obs_pt.append(pt_slot[match[feat]])
            obs_uv.append(self._ba_uv(m)[kfi, feat])
            obs_is2.append(1.0 / 1.2 ** (2.0 * m.kf_feat_octave[kfi, feat]))
        obs_kf = np.concatenate(obs_kf)[:obs_cap]
        obs_pt = np.concatenate(obs_pt)[:obs_cap]
        obs_uv = np.concatenate(obs_uv)[:obs_cap]
        obs_is2 = np.concatenate(obs_is2)[:obs_cap]
        n_obs = len(obs_kf)

        # multi-device production dispatch (SURVEY §2.3): route the full
        # VI window problem through the EXACT landmark-sharded solver
        # (parallel/dist_liba) whenever the runtime exposes >1 device —
        # the same terms (inertial chain, bias RW, point AND line
        # landmarks), one psum of the reduced camera system per GN
        # iteration riding ICI
        if self._dist_runner is not None:
            ln_ids, lobs_kf, lobs_ln, lobs_eq = (
                self._window_line_obs(win, ln_cap, lobs_cap)
                if ln_cap > 0 else
                (np.zeros(0, np.int32), np.zeros(0, np.int32),
                 np.zeros(0, np.int32), np.zeros((0, 3), np.float32)))
            stack_np = {k: np.asarray(v)[:n - 1]
                        for k, v in stack.items()}
            (pose_o, vel_o, bg_o, ba_o, pts_o, lns_o) = \
                self._dist_runner.solve(
                    m.kf_pose_wb[win], m.kf_vel[win], m.kf_bias_g[win],
                    m.kf_bias_a[win], kf_free[:n], kf_free_bias[:n],
                    obs_kf, obs_pt, obs_uv,
                    obs_is2.astype(np.float32), m.pt_xyz[pt_ids],
                    stack_np, np.asarray(infos)[:n - 1],
                    edge_valid[:n - 1], np.asarray(rw_g)[:n - 1],
                    np.asarray(rw_a)[:n - 1],
                    lobs_kf=lobs_kf, lobs_ln=lobs_ln, lobs_eq=lobs_eq,
                    ln_ep=m.ln_ep[ln_ids] if len(ln_ids) else None)
            okf = (np.isfinite(pose_o).all((1, 2))
                   & np.isfinite(vel_o).all(1) & np.isfinite(bg_o).all(1)
                   & np.isfinite(ba_o).all(1))
            fr = kf_free[:n] & okf
            m.kf_pose_wb[win[fr]] = pose_o[fr]
            m.kf_vel[win[fr]] = vel_o[fr]
            frb = kf_free_bias[:n] & okf
            m.kf_bias_g[win[frb]] = bg_o[frb]
            m.kf_bias_a[win[frb]] = ba_o[frb]
            m.set_cam_poses_from_body(win[fr], self.Tbc)
            okp = np.isfinite(pts_o).all(1)
            m.pt_xyz[pt_ids[okp]] = pts_o[okp]
            if lns_o is not None and len(ln_ids):
                okl = np.all(np.isfinite(lns_o), axis=1)
                m.ln_ep[ln_ids[okl]] = lns_o[okl]
            self._erase_window_outliers(win, pt_ids, obs_kf, obs_pt,
                                        obs_uv, obs_is2)
            return

        # size bucketing: the windowed solve cost is obs/landmark-linear
        # (B-matrix assembly + Schur einsums scale with the PADDED caps),
        # and a typical sliding window fills well under half the
        # worst-case caps — dispatch a half-cap compile when it fits
        if not big and len(pt_ids) <= pt_cap // 2 \
                and n_obs <= obs_cap // 2:
            pt_cap, obs_cap = pt_cap // 2, obs_cap // 2
            if self._liba_kernel_half is None:
                self._liba_kernel_half = KN.make_local_inertial_ba(
                    self.ba_K, cap, pt_cap, obs_cap,
                    self.R_cb, self.t_cb, self.cfg.imu.gravity,
                    n_ln=ln_cap, n_lobs=lobs_cap)
            kernel = self._liba_kernel_half

        def pad(a, capn, fill=0):
            out = np.full((capn,) + a.shape[1:], fill, a.dtype)
            out[:len(a)] = a
            return out

        pt_xyz = np.zeros((pt_cap, 3), np.float32)
        pt_xyz[:len(pt_ids)] = m.pt_xyz[pt_ids]
        pt_free = np.zeros(pt_cap, bool)
        pt_free[:len(pt_ids)] = True

        base_args = (
            jnp.asarray(kf_pose_wb), jnp.asarray(kf_vel), jnp.asarray(kf_bg),
            jnp.asarray(kf_ba), jnp.asarray(kf_free),
            jnp.asarray(kf_free_bias),
            jnp.asarray(pt_xyz), jnp.asarray(pt_free),
            jnp.asarray(pad(obs_kf, obs_cap)),
            jnp.asarray(pad(obs_pt, obs_cap)),
            jnp.asarray(pad(obs_uv, obs_cap)),
            jnp.asarray(pad(np.ones(n_obs, bool), obs_cap, False)),
            jnp.asarray(pad(obs_is2.astype(np.float32), obs_cap)),
            stack, infos, jnp.asarray(edge_valid),
            jnp.asarray(rw_g), jnp.asarray(rw_a))
        ln_ids = np.zeros(0, np.int32)
        if ln_cap > 0:
            ln_ids, lobs_kf, lobs_ln, lobs_eq = \
                self._window_line_obs(win, ln_cap, lobs_cap)
            ln_ep6 = np.zeros((ln_cap, 6), np.float32)
            ln_ep6[:len(ln_ids)] = m.ln_ep[ln_ids]
            ln_free = np.zeros(ln_cap, bool)
            ln_free[:len(ln_ids)] = True
            (pose_out, vel_out, bg_out, ba_out, pt_out, inlier,
             ln_out) = kernel(
                *base_args,
                jnp.asarray(ln_ep6), jnp.asarray(ln_free),
                jnp.asarray(pad(lobs_kf, lobs_cap)),
                jnp.asarray(pad(lobs_ln, lobs_cap)),
                jnp.asarray(pad(lobs_eq, lobs_cap)),
                jnp.asarray(pad(np.ones(len(lobs_kf), bool),
                                lobs_cap, False)))
        else:
            (pose_out, vel_out, bg_out, ba_out, pt_out,
             inlier) = kernel(*base_args)

        # finite guards: a degenerate window (few inliers after chi2
        # masking) can blow up the solve; never write non-finite state
        # into the map — it would poison the tracker via the post-BA
        # resync and every later preintegration
        pose_np = np.asarray(pose_out)[:n]
        vel_np = np.asarray(vel_out)[:n]
        bg_np = np.asarray(bg_out)[:n]
        ba_np = np.asarray(ba_out)[:n]
        okf = (np.isfinite(pose_np).all((1, 2)) & np.isfinite(vel_np).all(1)
               & np.isfinite(bg_np).all(1) & np.isfinite(ba_np).all(1))
        free = kf_free[:n] & okf
        m.kf_pose_wb[win[free]] = pose_np[free]
        m.kf_vel[win[free]] = vel_np[free]
        free_b = kf_free_bias[:n] & okf
        m.kf_bias_g[win[free_b]] = bg_np[free_b]
        m.kf_bias_a[win[free_b]] = ba_np[free_b]
        m.set_cam_poses_from_body(win[free], self.Tbc)
        pt_np = np.asarray(pt_out)[:len(pt_ids)]
        okp = np.isfinite(pt_np).all(1)
        m.pt_xyz[pt_ids[okp]] = pt_np[okp]
        if ln_cap > 0 and len(ln_ids):
            ln_new = np.asarray(ln_out)[:len(ln_ids)]
            okl = np.all(np.isfinite(ln_new), axis=1)
            m.ln_ep[ln_ids[okl]] = ln_new[okl]
        self._erase_window_outliers(win, pt_ids, obs_kf, obs_pt,
                                    obs_uv, obs_is2)

    # ------------------------------------------------------------------
    def _merge_imu_into_next(self, cand: int, nxt: int) -> None:
        """Keep the temporal IMU chain exact across a cull: concatenate
        the culled KF's raw window into its successor's and reintegrate
        at the successor's bias (reference Preintegrated::MergePrevious,
        src/ImuTypes.cc:312, called from KeyFrameCulling)."""
        m = self.map
        empty = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                 np.zeros((0,), np.float32))
        g1, a1, d1 = m.kf_imu_raw.get(cand, empty)
        g2, a2, d2 = m.kf_imu_raw.get(nxt, empty)
        g = np.concatenate([g1, g2])
        a = np.concatenate([a1, a2])
        d = np.concatenate([d1, d2])
        if len(g):
            m.kf_imu_raw[nxt] = (g, a, d)
            m.kf_preint[nxt] = self._reintegrate(
                g, a, d, m.kf_bias_g[nxt], m.kf_bias_a[nxt])
        m.kf_imu_raw.pop(cand, None)
        m.kf_preint.pop(cand, None)

    def cull_keyframes(self, kf: int, protect=()) -> list:
        """Remove covisible KFs ≥90% of whose bound points are observed
        by ≥3 other KFs at the same or finer octave (reference
        KeyFrameCullingWithLines, src/LocalMapping.cc:1720).  Inertial
        mode additionally keeps the temporal chain intact: only culls
        KFs with both neighbors within 3 s and merges their
        preintegration windows (reference :1726 inertial branch).

        Returns [(kf_id, pose_cw, timestamp), ...] of removed KFs."""
        m = self.map
        chain = m.kf_chain()
        if len(chain) < 4:
            return []
        keep = set(int(x) for x in protect)
        keep.add(int(chain[0]))          # the map origin anchors the gauge
        keep.update(int(x) for x in chain[-2:])   # newest KFs still binding
        keep.add(int(kf))
        removed = []
        for cand in m.covisible_kfs(kf, n=12, min_weight=5):
            cand = int(cand)
            if self._cullable(cand, keep) and self._redundancy(cand) > 0.9:
                removed.append(self._do_cull(cand))
        # capacity pressure: the fixed-shape store must NEVER overflow, so
        # when the map nears capacity sweep the whole chain and cull the
        # most redundant KFs down to a working level (elastic analog of
        # the reference growing its std::set unboundedly)
        if m.n_kf > 0.85 * m.max_kf:
            target = int(0.75 * m.max_kf)
            cands = [(self._redundancy(int(c)), int(c))
                     for c in m.kf_chain()
                     if self._cullable(int(c), keep, max_gap=10.0)]
            cands.sort(reverse=True)
            for red, cand in cands:
                if m.n_kf <= target or red < 0.5:
                    break
                if m.kf_valid[cand]:
                    removed.append(self._do_cull(cand))
        return removed

    def _cullable(self, cand: int, keep, max_gap: float = 3.0) -> bool:
        m = self.map
        if not m.kf_valid[cand] or cand in keep:
            return False
        if (m.kf_match_pt[cand] >= 0).sum() < 10:
            return False
        if self.use_imu:
            prev, nxt = int(m.kf_prev[cand]), int(m.kf_next[cand])
            if prev < 0 or nxt < 0 or not m.kf_valid[nxt]:
                return False
            if m.kf_timestamp[nxt] - m.kf_timestamp[prev] > max_gap:
                return False             # reference keeps sparse chains
        return True

    def _redundancy(self, cand: int) -> float:
        """Fraction of `cand`'s bound points observed by >=3 other KFs at
        the same or finer octave (reference KeyFrameCullingWithLines
        redundancy rule, src/LocalMapping.cc:1720)."""
        m = self.map
        feat = np.nonzero(m.kf_match_pt[cand] >= 0)[0]
        if len(feat) == 0:
            return 0.0
        pid = m.kf_match_pt[cand, feat]
        oct_c = m.kf_feat_octave[cand, feat]
        n_good = np.zeros(len(pid), np.int32)
        for o in np.nonzero((m.covis[cand] > 0) & m.kf_valid)[0]:
            if o == cand:
                continue
            fo = np.nonzero(m.kf_match_pt[o] >= 0)[0]
            po = m.kf_match_pt[o, fo]
            oct_map = np.full(m.max_pts, 127, np.int32)
            oct_map[po] = m.kf_feat_octave[o, fo]
            n_good += oct_map[pid] <= oct_c + 1
        return float((n_good >= 3).mean())

    def _do_cull(self, cand: int):
        m = self.map
        pose = m.kf_pose_cw[cand].copy()
        ts = float(m.kf_timestamp[cand])
        if self.use_imu:
            self._merge_imu_into_next(cand, int(m.kf_next[cand]))
        m.remove_keyframe(cand)
        if self.kfdb is not None:
            self.kfdb.remove_keyframe(cand)
        self.n_culled += 1
        return (cand, pose, ts)
