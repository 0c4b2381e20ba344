"""Benchmark: tracking frames/s per chip on the fused per-frame pipeline.

Headline metric = the FLAGSHIP hot path (mono-inertial point+line
tracking): full ORB extraction (8-level pyramid, dense FAST, grid-ANMS,
orientation, 256-bit descriptors) + full line extraction (cell detector,
collinear merge, sub-pixel refit, LBD) + projection matching of points
(Hamming matmul) and lines + fused point+line IRLS pose optimization —
on EuRoC-geometry frames (752x480, 1000 pts / 256-line cap, ~1.5k-point
local map, oracle map lines).  A second (reported, non-headline) number
covers the point-only step for continuity with round-1 results, plus an
XLA FLOP count so fps translates to MFU.

Baseline: the reference's implied real-time budget is the 20 fps EuRoC
feed it sleeps to (BASELINE.md: <=50 ms/frame tracking on desktop CPU,
Examples/Monocular-Inertial/mono_inertial_euroc.cc:190-199), so
vs_baseline = fps / 20.  The north-star target is >=3x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# v5e peak: ~197 TFLOP/s bf16, ~98 TFLOP/s fp32 on the MXU.  The pipeline
# is fp32-dominated, so MFU is quoted against the fp32 peak.
PEAK_FLOPS_F32 = 98e12


def build_inputs(n_frames=16, cap_pts=2048, cap_lns=128,
                 height=480, width=752, seed=0):
    """Synthetic-room frames + an oracle-built local map (points AND
    lines) with real descriptors extracted from frame 0."""
    from plvio_tpu.io import synthetic as syn
    from plvio_tpu.ops import frontend as FE
    from plvio_tpu.ops import lines as LN
    from plvio_tpu.ops import matching as M

    rng = np.random.default_rng(seed)
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=200)
    traj = syn.make_orbit_trajectory(duration=n_frames / 20.0 + 0.5,
                                     fps=20.0, radius=0.6)
    frames = [syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
              for i in range(n_frames)]

    # local map: scene points visible ANYWHERE in the benched window,
    # descriptors stolen from the nearest detection of the first frame
    # that sees them (<3 px).  Sampling only frame 0 froze the map at
    # its visible set and the inlier count decayed 130 -> 37 across the
    # window (late frames timed a lighter problem); production refreshes
    # the local map every frame (VERDICT r4 weak #9).
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    run, specs = FE.make_extractor(height, width, n_features=1000)
    taken = np.zeros(len(scene.points), bool)
    X, D = [], []
    for fi in range(0, n_frames, 4):
        uv0, z0, vis0, uv_l0, vis_l0 = syn.project_scene(
            scene, traj.R_wb[fi], traj.p_wb[fi], fx, fy, cx, cy,
            width, height)
        f0 = run(jnp.asarray(frames[fi]))
        det_uv = np.asarray(f0.uv)
        det_desc = np.asarray(M.pack_bits_u32(f0.desc))
        det_ok = np.asarray(f0.valid)
        for i in np.nonzero(vis0 & ~taken)[0]:
            d = np.linalg.norm(det_uv - uv0[i], axis=-1)
            d[~det_ok] = 1e9
            j = d.argmin()
            if d[j] < 3.0:
                X.append(scene.points[i])
                D.append(det_desc[j])
                taken[i] = True
    uv0, z0, vis0, uv_l0, vis_l0 = syn.project_scene(
        scene, traj.R_wb[0], traj.p_wb[0], fx, fy, cx, cy, width, height)
    f0 = run(jnp.asarray(frames[0]))
    X = np.asarray(X, np.float32)
    D = np.asarray(D, np.uint32)
    n = min(len(X), cap_pts)
    pt_xyz = np.zeros((cap_pts, 3), np.float32)
    pt_desc = np.zeros((cap_pts, 8), np.uint32)
    pt_valid = np.zeros(cap_pts, bool)
    pt_xyz[:n] = X[:n]
    pt_desc[:n] = D[:n]
    pt_valid[:n] = True

    # oracle map lines: scene lines drawn in frame 0, LBD stolen from the
    # nearest frame-0 detection (by midpoint distance)
    lf0 = LN.extract_lines(jnp.asarray(frames[0], jnp.float32), 256)
    lep = np.asarray(lf0.ep)
    lok = np.asarray(lf0.valid)
    ldesc = np.asarray(M.pack_bits_u32(lf0.desc))
    ln_ep6 = np.zeros((cap_lns, 6), np.float32)
    ln_desc = np.zeros((cap_lns, 8), np.uint32)
    ln_valid = np.zeros(cap_lns, bool)
    k = 0
    for i in np.nonzero(vis_l0)[0]:
        if k >= cap_lns:
            break
        mid_gt = (uv_l0[i, 0] + uv_l0[i, 1]) / 2
        mids = (lep[:, :2] + lep[:, 2:]) / 2
        d = np.linalg.norm(mids - mid_gt, axis=-1)
        d[~lok] = 1e9
        j = d.argmin()
        if d[j] < 30.0:
            ln_ep6[k, :3] = scene.lines[i, 0]
            ln_ep6[k, 3:] = scene.lines[i, 1]
            ln_desc[k] = ldesc[j]
            ln_valid[k] = True
            k += 1

    poses = []
    for i in range(n_frames):
        R_cw = traj.R_wb[i].T
        t_cw = -R_cw @ traj.p_wb[i]
        poses.append(np.concatenate([R_cw, t_cw[:, None]], 1).astype(np.float32))
    return (frames, poses, pt_xyz, pt_desc, pt_valid,
            ln_ep6, ln_desc, ln_valid, traj)


def _sequence_fps(fn, frames_dev, pose0, extra, n_frames, reps=16):
    """Time a jitted lax.scan over the frame stack (the production
    streaming shape; amortizes the dev-tunnel's ~50 ms/dispatch).

    Every rep perturbs the frame stack by a tiny rep-dependent bias so
    no dispatch repeats byte-identically — the dev-tunnel relay caches
    identical dispatches and would otherwise return in ~0 time."""
    @jax.jit
    def track_sequence(frames_dev, eps, pose0, *extra):
        def body(pose, img):
            new_pose, n_inl = fn(img + eps, pose, *extra)
            return new_pose, n_inl
        pose_fin, n_inls = jax.lax.scan(body, pose0, frames_dev)
        return pose_fin, n_inls

    pose, n_inls = track_sequence(frames_dev, jnp.float32(0.0), pose0,
                                  *extra)
    jax.block_until_ready(pose)
    t0 = time.perf_counter()
    for rep in range(reps):
        pose, _ = track_sequence(frames_dev, jnp.float32(1e-4 * (rep + 1)),
                                 pose0, *extra)
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0
    fps = reps * n_frames / dt

    flops = -1.0
    try:
        lowered = track_sequence.lower(frames_dev, jnp.float32(0.0),
                                       pose0, *extra)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0)) / n_frames
    except Exception:
        pass
    return fps, np.asarray(n_inls), flops


def _sequence_fps_vi(step, frames_dev, imu_xs, carry0, map_args,
                     n_frames, reps=16):
    """Time the PRODUCTION mono-inertial frame (15-DoF VI pose opt with
    preintegration + carried prior) scanned over the frame stack."""
    @jax.jit
    def track_sequence(frames_dev, gyro, acc, dts, eps, carry0, *map_args):
        def body(carry, xs):
            img, g, a, d = xs
            carry, out = step(carry, (img + eps, g, a, d), *map_args)
            return carry, out
        carry, outs = jax.lax.scan(body, carry0,
                                   (frames_dev, gyro, acc, dts))
        return carry, outs

    gyro, acc, dts = imu_xs
    carry, outs = track_sequence(frames_dev, gyro, acc, dts,
                                 jnp.float32(0.0), carry0, *map_args)
    jax.block_until_ready(carry[0])
    t0 = time.perf_counter()
    for rep in range(reps):
        carry, outs = track_sequence(frames_dev, gyro, acc, dts,
                                     jnp.float32(1e-4 * (rep + 1)),
                                     carry0, *map_args)
    jax.block_until_ready(carry[0])
    dt = time.perf_counter() - t0
    fps = reps * n_frames / dt
    flops = -1.0
    try:
        lowered = track_sequence.lower(frames_dev, gyro, acc, dts,
                                       jnp.float32(0.0), carry0,
                                       *map_args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0)) / n_frames
    except Exception:
        pass
    return fps, np.asarray(outs[0]), flops


def build_mapping_step(n_kf: int = 16, n_pt: int = 4096,
                       n_obs: int = 8192, n_feat: int = 1024,
                       n_ln: int = 512, n_lobs: int = 1024):
    """Build the process_keyframe-equivalent device step at the given
    capacities: epipolar matching of the new KF against a neighbor +
    DLT triangulation + the point+line windowed local BA (the dominant
    mapping-thread cost; reference CreateNewMapPoints + SearchInNeighbors
    + LocalBundleAdjustmentwithLine inside its 50 ms budget,
    src/LocalMapping.cc:286-454).  Returns (step_fn, args)."""
    from plvio_tpu.models import kernels as KN
    from plvio_tpu.solver.residuals import PinholeK
    from plvio_tpu.utils import lie

    K = PinholeK(fx=458.654, fy=457.296, cx=367.215, cy=248.375)
    rng = np.random.default_rng(1)

    # synthetic consistent window geometry
    X = rng.uniform([-6, -4, 3], [6, 4, 12], (n_pt, 3)).astype(np.float32)
    kf_poses = []
    for c in range(n_kf):
        Rm = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3), jnp.float32)))
        t = np.array([0.25 * c, 0.02 * c, 0.0], np.float32)
        kf_poses.append(np.concatenate([Rm, t[:, None]], 1))
    kf_poses = np.stack(kf_poses).astype(np.float32)
    obs_kf = rng.integers(0, n_kf, n_obs).astype(np.int32)
    obs_pt = rng.integers(0, n_pt, n_obs).astype(np.int32)
    pc = np.einsum("oij,oj->oi", kf_poses[obs_kf, :, :3], X[obs_pt]) \
        + kf_poses[obs_kf, :, 3]
    z = np.maximum(pc[:, 2], 1e-3)
    obs_uv = np.stack([K.fx * pc[:, 0] / z + K.cx,
                       K.fy * pc[:, 1] / z + K.cy], -1).astype(np.float32)
    obs_uv += rng.normal(0, 0.5, obs_uv.shape).astype(np.float32)

    # epipolar-pair features for the triangulation stage
    fa = rng.integers(0, n_pt, n_feat)
    pca = X[fa] @ kf_poses[0, :, :3].T + kf_poses[0, :, 3]
    pcb = X[fa] @ kf_poses[1, :, :3].T + kf_poses[1, :, 3]
    uv_a = np.stack([K.fx * pca[:, 0] / pca[:, 2] + K.cx,
                     K.fy * pca[:, 1] / pca[:, 2] + K.cy], -1)
    uv_b = np.stack([K.fx * pcb[:, 0] / pcb[:, 2] + K.cx,
                     K.fy * pcb[:, 1] / pcb[:, 2] + K.cy], -1)
    desc = rng.integers(0, 2 ** 32, (n_feat, 8), dtype=np.uint32)
    ang = rng.uniform(0, 2 * np.pi, n_feat).astype(np.float32)

    # line landmarks for the PL window — observations must be
    # geometrically CONSISTENT (projections of the 3D endpoints, like a
    # real window): random line equations make the solve pathological
    # (NaN/overshoot LM churn) and time a problem production never sees
    ln_ep6 = np.concatenate(
        [X[:n_ln], X[:n_ln] + rng.normal(0, 0.5, (n_ln, 3))],
        -1).astype(np.float32)
    lobs_kf = rng.integers(0, n_kf, n_lobs).astype(np.int32)
    lobs_ln = rng.integers(0, n_ln, n_lobs).astype(np.int32)
    Rl = kf_poses[lobs_kf, :, :3]
    tl = kf_poses[lobs_kf, :, 3]
    pa = np.einsum("oij,oj->oi", Rl, ln_ep6[lobs_ln, :3]) + tl
    pb = np.einsum("oij,oj->oi", Rl, ln_ep6[lobs_ln, 3:]) + tl
    za = np.maximum(pa[:, 2], 1e-3)
    zb = np.maximum(pb[:, 2], 1e-3)
    uva = np.stack([K.fx * pa[:, 0] / za + K.cx,
                    K.fy * pa[:, 1] / za + K.cy], -1)
    uvb = np.stack([K.fx * pb[:, 0] / zb + K.cx,
                    K.fy * pb[:, 1] / zb + K.cy], -1)
    uva += rng.normal(0, 0.5, uva.shape)
    uvb += rng.normal(0, 0.5, uvb.shape)
    ha = np.concatenate([uva, np.ones((n_lobs, 1))], 1)
    hb = np.concatenate([uvb, np.ones((n_lobs, 1))], 1)
    leq = np.cross(ha, hb).astype(np.float32)
    leq /= np.maximum(
        np.linalg.norm(leq[:, :2], axis=1, keepdims=True), 1e-6)

    epi = KN.make_epipolar_matcher(K, n_feat)
    tri = KN.make_triangulator(K, n_feat)
    lba = KN.make_local_ba_pl(K, n_kf, n_pt, n_obs, n_ln, n_lobs)

    A = dict(
        pose_a=jnp.asarray(kf_poses[0]), pose_b=jnp.asarray(kf_poses[1]),
        uv_a=jnp.asarray(uv_a, jnp.float32),
        uv_b=jnp.asarray(uv_b, jnp.float32),
        desc=jnp.asarray(desc), ang=jnp.asarray(ang),
        ok=jnp.ones(n_feat, bool),
        kf_poses=jnp.asarray(kf_poses),
        kf_free=jnp.asarray(np.arange(n_kf) > 0),
        pt_xyz=jnp.asarray(X), pt_free=jnp.ones(n_pt, bool),
        obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.ones(n_obs, bool),
        obs_is2=jnp.ones(n_obs, jnp.float32),
        ln_ep6=jnp.asarray(ln_ep6), ln_free=jnp.ones(n_ln, bool),
        lobs_kf=jnp.asarray(lobs_kf), lobs_ln=jnp.asarray(lobs_ln),
        lobs_eq=jnp.asarray(leq), lobs_valid=jnp.ones(n_lobs, bool),
        lobs_is2=jnp.ones(n_lobs, jnp.float32))

    def step(eps, A):
        # triangulation path of the new KF against its best neighbor
        idx2, ok2 = epi(A["pose_a"], A["pose_b"], A["uv_a"] + eps,
                        A["desc"], A["ok"], A["uv_b"], A["desc"],
                        A["ok"], A["ang"], A["ang"])
        Xw, good = tri(A["pose_a"], A["pose_b"], A["uv_a"] + eps,
                       A["uv_b"][idx2], ok2)
        # windowed point+line BA (obs perturbed so no dispatch repeats)
        poses, pts, lns, inl, inl_l = lba(
            A["kf_poses"], A["kf_free"], A["pt_xyz"], A["pt_free"],
            A["obs_kf"], A["obs_pt"], A["obs_uv"] + eps, A["obs_valid"],
            A["obs_is2"], A["ln_ep6"], A["ln_free"], A["lobs_kf"],
            A["lobs_ln"], A["lobs_eq"], A["lobs_valid"], A["lobs_is2"])
        return poses, pts, jnp.sum(good), jnp.sum(inl)

    return step, A


def bench_mapping(reps: int = 8, **shapes):
    """Time the process_keyframe-equivalent device step (see
    build_mapping_step).  Returns (ms_per_step, flops)."""
    step_fn, A = build_mapping_step(**shapes)
    step = jax.jit(step_fn)
    out = step(jnp.float32(0.0), A)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for rep in range(reps):
        out = step(jnp.float32(1e-4 * (rep + 1)), A)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3

    flops = -1.0
    try:
        cost = step.lower(jnp.float32(0.0), A).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
    except Exception:
        pass
    return ms, flops


def bench_sustained(fn_pl, frames_dev, pose0, extra, kf_every: int = 3,
                    reps: int = 12, **map_shapes):
    """Measure the SUSTAINED pipeline on one chip: `kf_every` tracking
    steps PLUS one mapping step (typical-bucket capacities) fused into
    one device program, timed end to end.  The reference overlaps
    tracking and mapping on separate CPU threads
    (src/System.cc:196-197); on a single TPU chip both share the device,
    so the sustainable frame rate is set by the SERIAL device time of
    the interleave — this measures exactly that (no analytic
    track+map/3 addition; XLA schedules the fused program).  Returns
    per-frame ms."""
    map_step, A = build_mapping_step(**map_shapes)
    n3 = kf_every

    @jax.jit
    def burst(frames3, eps, pose0, extra, A):
        def body(pose, img):
            new_pose, n_inl = fn_pl(img + eps, pose, *extra)
            return new_pose, n_inl
        pose_fin, n_inls = jax.lax.scan(body, pose0, frames3)
        poses, pts, ngood, ninl = map_step(eps, A)
        return pose_fin, n_inls, poses[0, 0, 0], ninl

    frames3 = frames_dev[:n3]
    out = burst(frames3, jnp.float32(0.0), pose0, extra, A)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for rep in range(reps):
        out = burst(frames3, jnp.float32(1e-4 * (rep + 1)), pose0,
                    extra, A)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / (reps * n3) * 1e3


def main():
    import __graft_entry__ as g

    n_frames = 16
    cap_pts, cap_lns = 2048, 128
    (frames, poses, pt_xyz, pt_desc, pt_valid,
     ln_ep6, ln_desc, ln_valid, traj) = build_inputs(n_frames, cap_pts,
                                                     cap_lns)

    frames_dev = jax.device_put(jnp.asarray(np.stack(frames), jnp.float32))
    pose0 = jax.device_put(jnp.asarray(poses[0]))
    xyz = jax.device_put(jnp.asarray(pt_xyz))
    desc = jax.device_put(jnp.asarray(pt_desc))
    valid = jax.device_put(jnp.asarray(pt_valid))
    lep = jax.device_put(jnp.asarray(ln_ep6))
    ldesc = jax.device_put(jnp.asarray(ln_desc))
    lvalid = jax.device_put(jnp.asarray(ln_valid))

    # flagship: point+line step
    fn_pl, _ = g._tracking_step_pl_fn(480, 752, n_features=1000,
                                      cap_pts=cap_pts, cap_lns=cap_lns)
    fps_pl, inls_pl, flops_pl = _sequence_fps(
        fn_pl, frames_dev, pose0, (xyz, desc, valid, lep, ldesc, lvalid),
        n_frames)

    # continuity: point-only step (round-1 metric)
    fn_pt, _ = g._tracking_step_fn(480, 752, n_features=1000,
                                   cap_pts=cap_pts)
    fps_pt, inls_pt, flops_pt = _sequence_fps(
        fn_pt, frames_dev, pose0, (xyz, desc, valid), n_frames)

    # TRUE production VI frame: 15-DoF VI pose opt w/ preintegration of
    # the 10-sample inter-frame IMU window + carried marginalization
    # prior + line matching (reference PoseInertialOptimizationLastFrame
    # src/Optimizer.cc:13980) — the mono-inertial hot path the System
    # actually runs per frame (VERDICT r4 missing #3)
    from plvio_tpu.io import synthetic as syn
    rngv = np.random.default_rng(3)
    # radius must match build_inputs' orbit (0.6) — the IMU must be
    # consistent with the rendered trajectory or prediction diverges
    imu = syn.synthesize_imu(rngv, n_frames / 20.0 + 0.4, radius=0.6,
                             bias_gyro_mag=0.0, bias_acc_mag=0.0)
    # carry = state at frame 0; the scan covers frames 1..N-1, each
    # with the IMU window (t_{i-1}, t_i] (feeding frame i's own window
    # to the frame-0 state predicts one frame AHEAD of the image)
    nv = n_frames - 1
    gyro_b = np.zeros((nv, 10, 3), np.float32)
    acc_b = np.zeros((nv, 10, 3), np.float32)
    dts_b = np.full((nv, 10), 1.0 / 200.0, np.float32)
    for j in range(nv):
        t0 = traj.timestamps[j]
        t1 = traj.timestamps[j + 1]
        m = (imu.timestamps > t0) & (imu.timestamps <= t1)
        gg, aa = imu.gyro[m][:10], imu.acc[m][:10]
        gyro_b[j, :len(gg)] = gg
        acc_b[j, :len(aa)] = aa
    step_vi = g._tracking_step_vi_fn(480, 752, n_features=1000,
                                     cap_pts=cap_pts, cap_lns=cap_lns)
    pose_wb0 = jnp.asarray(np.concatenate(
        [traj.R_wb[0], traj.p_wb[0][:, None]], 1), jnp.float32)
    carry0 = (pose_wb0, jnp.asarray(traj.v_wb[0], jnp.float32),
              jnp.zeros(3), jnp.zeros(3),
              jnp.eye(15, dtype=jnp.float32))
    fps_vi, inls_vi, flops_vi = _sequence_fps_vi(
        step_vi, frames_dev[1:],
        (jnp.asarray(gyro_b), jnp.asarray(acc_b), jnp.asarray(dts_b)),
        carry0, (xyz, desc, valid, lep, ldesc, lvalid), nv)
    print(f"# VI production-frame inliers: {inls_vi.tolist()}",
          file=sys.stderr)

    print(f"# point+line inliers per frame: {inls_pl.tolist()}",
          file=sys.stderr)
    print(f"# point-only  inliers per frame: {inls_pt.tolist()}",
          file=sys.stderr)
    print(f"# map lines in oracle map: {int(np.asarray(ln_valid).sum())}",
          file=sys.stderr)
    # the inlier decay across the window is visibility, not drift: the
    # local map is frozen at frame 0's visible set while the camera
    # orbits away (production updates the local map per frame)
    mfu = flops_pl * fps_pl / PEAK_FLOPS_F32 if flops_pl > 0 else -1.0

    # mapping step (process_keyframe-equivalent) at worst-case capacities
    # AND at the half-cap bucket local mapping dispatches when the
    # sliding window fits (models/local_mapping._liba_window size
    # bucketing — a typical 16-KF window holds well under 2048 points /
    # 4096 observations)
    map_ms, map_flops = bench_mapping()
    map_ms_typ, _ = bench_mapping(n_pt=2048, n_obs=4096, n_ln=256,
                                  n_lobs=512)
    print(f"# mapping step: worst-case {map_ms:.1f} ms "
          f"({map_flops/1e9:.2f} GFLOP), typical bucket "
          f"{map_ms_typ:.1f} ms", file=sys.stderr)
    # sustained pipeline: 3 tracked frames + 1 typical-bucket mapping
    # step per burst (the KF cadence the tracker throttles to), fused
    # and MEASURED on device — the single-chip analog of the
    # reference's track/map thread overlap
    sus_ms = bench_sustained(fn_pl, frames_dev, pose0,
                             (xyz, desc, valid, lep, ldesc, lvalid),
                             n_pt=2048, n_obs=4096, n_ln=256,
                             n_lobs=512)
    print(f"# sustained (3 track + 1 mapping)/3: {sus_ms:.2f} ms/frame",
          file=sys.stderr)
    # analytic serial budget kept for continuity with BENCH_r03
    frame_ms = 1e3 / fps_pl + map_ms_typ / 3.0
    print(json.dumps({
        "metric": "tracking_pl_fps_per_chip",
        "value": round(fps_pl, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_pl / 20.0, 3),
        "point_only_fps": round(fps_pt, 2),
        "vi_tracking_fps": round(fps_vi, 2),
        "vi_vs_baseline": round(fps_vi / 20.0, 3),
        "vi_flops_per_frame": flops_vi,
        "flops_per_frame": flops_pl,
        "mfu_vs_f32_peak": round(mfu, 5) if mfu > 0 else None,
        "mapping_step_ms": round(map_ms, 2),
        "mapping_step_ms_typical": round(map_ms_typ, 2),
        "mapping_step_gflop": round(map_flops / 1e9, 3) if map_flops > 0 else None,
        "frame_budget_ms_incl_mapping": round(frame_ms, 2),
        "frame_budget_fps_incl_mapping": round(1e3 / frame_ms, 2),
        "sustained_ms_per_frame_incl_mapping": round(sus_ms, 2),
        "sustained_fps_incl_mapping": round(1e3 / sus_ms, 2),
        "sustained_vs_baseline": round(1e3 / sus_ms / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
