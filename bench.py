"""Benchmark: tracking frames/s per chip on the fused per-frame pipeline.

Measures the flagship hot path — full ORB extraction (8-level pyramid,
dense FAST, grid-ANMS, orientation, 256-bit descriptors) + local-map
projection matching (Hamming matmul) + 2x8 IRLS pose optimization — on
EuRoC-geometry frames (752x480, 1000 features, ~1.5k-point local map).

Baseline: the reference's implied real-time budget is the 20 fps EuRoC
feed it sleeps to (BASELINE.md: <=50 ms/frame tracking on desktop CPU,
Examples/Monocular-Inertial/mono_inertial_euroc.cc:190-199), so
vs_baseline = fps / 20.  The north-star target is >=3x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def build_inputs(n_frames=16, cap_pts=2048, height=480, width=752, seed=0):
    """Synthetic-room frames + an oracle-built local map with real
    descriptors extracted from frame 0."""
    from plvio_tpu.io import synthetic as syn
    from plvio_tpu.ops import frontend as FE
    from plvio_tpu.ops import matching as M

    rng = np.random.default_rng(seed)
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=n_frames / 20.0 + 0.5,
                                     fps=20.0, radius=0.6)
    frames = [syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
              for i in range(n_frames)]

    # local map: visible scene points w/ descriptors stolen from frame-0
    # detections (nearest projection within 3 px)
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    uv0, z0, vis0, _, _ = syn.project_scene(
        scene, traj.R_wb[0], traj.p_wb[0], fx, fy, cx, cy, width, height)
    run, specs = FE.make_extractor(height, width, n_features=1000)
    f0 = run(jnp.asarray(frames[0]))
    det_uv = np.asarray(f0.uv)
    det_desc = np.asarray(M.pack_bits_u32(f0.desc))
    det_ok = np.asarray(f0.valid)

    ids = np.nonzero(vis0)[0]
    X, D = [], []
    for i in ids:
        d = np.linalg.norm(det_uv - uv0[i], axis=-1)
        d[~det_ok] = 1e9
        j = d.argmin()
        if d[j] < 3.0:
            X.append(scene.points[i])
            D.append(det_desc[j])
    X = np.asarray(X, np.float32)
    D = np.asarray(D, np.uint32)
    n = min(len(X), cap_pts)
    pt_xyz = np.zeros((cap_pts, 3), np.float32)
    pt_desc = np.zeros((cap_pts, 8), np.uint32)
    pt_valid = np.zeros(cap_pts, bool)
    pt_xyz[:n] = X[:n]
    pt_desc[:n] = D[:n]
    pt_valid[:n] = True

    # poses (world->camera): R_cw = R_wb^T, t = -R_cw p
    poses = []
    for i in range(n_frames):
        R_cw = traj.R_wb[i].T
        t_cw = -R_cw @ traj.p_wb[i]
        poses.append(np.concatenate([R_cw, t_cw[:, None]], 1).astype(np.float32))
    return frames, poses, pt_xyz, pt_desc, pt_valid, specs


def main():
    import __graft_entry__ as g

    n_frames = 16
    cap_pts = 2048
    frames, poses, pt_xyz, pt_desc, pt_valid, _ = build_inputs(
        n_frames, cap_pts)

    fn, _ = g._tracking_step_fn(480, 752, n_features=1000, cap_pts=cap_pts)
    step = jax.jit(fn)

    # all inputs staged on device ONCE as stacked arrays; each step
    # receives an on-device slice (a production loader double-buffers
    # uploads; host->device transfer through the dev-tunnel relay is
    # ~37 MB/s and must not be measured as tracking compute)
    frames_dev = jax.device_put(jnp.asarray(np.stack(frames), jnp.float32))
    poses_dev = jax.device_put(jnp.asarray(np.stack(poses)))
    xyz = jax.device_put(jnp.asarray(pt_xyz))
    desc = jax.device_put(jnp.asarray(pt_desc))
    valid = jax.device_put(jnp.asarray(pt_valid))

    @jax.jit
    def track_sequence(frames_dev, pose0, xyz, desc, valid):
        """Sequential tracking over the whole window in ONE device
        program: each frame is tracked from the previous frame's
        OPTIMIZED pose (the real motion-model feedback loop), so this is
        the production streaming shape — and it amortizes the dev-tunnel's
        per-dispatch overhead, which on this relay is ~50 ms/call vs the
        ~0.1 ms/frame of actual compute."""
        def body(pose, img):
            new_pose, n_inl = fn(img, pose, xyz, desc, valid)
            return new_pose, n_inl
        pose_fin, n_inls = jax.lax.scan(body, pose0, frames_dev)
        return pose_fin, n_inls

    # warmup / compile
    pose, n_inls = track_sequence(frames_dev, poses_dev[0], xyz, desc, valid)
    jax.block_until_ready(pose)

    reps = 16
    t0 = time.perf_counter()
    for _ in range(reps):
        pose, n_inls = track_sequence(frames_dev, poses_dev[0], xyz, desc,
                                      valid)
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0
    fps = reps * n_frames / dt

    import sys
    print(f"# inliers per frame: {np.asarray(n_inls).tolist()}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
