"""Scale-out efficiency of the distributed BA partitions on a virtual
device mesh (BASELINE.md target: >=80% frames/s efficiency at 2 hosts;
real multi-chip hardware is not reachable from this image, so the
measurement runs on the CPU backend with forced virtual devices — it
validates the PARTITION's communication/compute structure, not ICI
bandwidth).

Weak scaling: each device gets a fixed landmark/observation shard, so
ideal scaling solves a D-times-larger problem in constant time.  Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python scripts/bench_scaling.py

Appends a section to RESULTS.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from plvio_tpu.parallel import dist_ba as D
from plvio_tpu.parallel import chain_ba as CB
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie

K = PinholeK(fx=200.0, fy=200.0, cx=128.0, cy=96.0)


def chain_problem(rng, C, pts_per_kf=40, obs_window=2):
    poses, pts, okf, opt, ouv = [], [], [], [], []
    for c in range(C):
        R = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3), jnp.float32)))
        t = np.array([0.4 * c, 0, 0], np.float32)
        poses.append(np.concatenate([R, t[:, None]], 1).astype(np.float32))
    poses = np.stack(poses)
    for c in range(C):
        C1 = -poses[c, :, :3].T @ poses[c, :, 3]
        for _ in range(pts_per_kf):
            X = C1 + np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                               rng.uniform(2, 5)])
            pid = len(pts)
            pts.append(X)
            for c2 in range(max(0, c - obs_window),
                            min(C, c + obs_window + 1)):
                pc = poses[c2, :, :3] @ X + poses[c2, :, 3]
                if pc[2] < 0.2:
                    continue
                okf.append(c2)
                opt.append(pid)
                ouv.append([K.fx * pc[0] / pc[2] + K.cx,
                            K.fy * pc[1] / pc[2] + K.cy])
    return (poses, np.asarray(pts, np.float32), np.asarray(okf),
            np.asarray(opt), np.asarray(ouv, np.float32))


def time_chain(n_dev, reps=4):
    """Weak scaling: 4 KFs + their landmarks per device."""
    rng = np.random.default_rng(0)
    C = 4 * n_dev
    poses, pts, okf, opt, ouv = chain_problem(rng, C)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("kf",))
    data, layout = CB.partition_chain(
        n_dev, 2, np.arange(C), poses, okf, opt, ouv,
        np.ones(len(okf), np.float32), pts, fixed_kf=np.array([0, 1]))
    run = CB.make_chain_ba(K, mesh, "kf", layout["Wh"],
                           data.pt_xyz.shape[1], data.obs_kf.shape[1],
                           outer_iters=6, halo=2)
    out = run(data)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(data)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, C, len(pts), len(okf)


def time_dist(n_dev, reps=4):
    """Weak scaling for the landmark-sharded psum partition: fixed
    cameras, landmarks proportional to devices."""
    rng = np.random.default_rng(0)
    n_cams = 8
    n_pts = 512 * n_dev
    X = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 4.0
    poses = []
    for c in range(n_cams):
        Rm = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.01, 3), jnp.float32)))
        t = np.array([0.2 * c, 0, 0], np.float32)
        poses.append(np.concatenate([Rm, t[:, None]], 1).astype(np.float32))
    poses = np.stack(poses)
    obs_kf = np.repeat(np.arange(n_cams, dtype=np.int32), n_pts)
    obs_pt = np.tile(np.arange(n_pts, dtype=np.int32), n_cams)
    uv = []
    for c in range(n_cams):
        pc = (poses[c, :, :3] @ X.T).T + poses[c, :, 3]
        uv.append(np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                            K.fy * pc[:, 1] / pc[:, 2] + K.cy],
                           -1).astype(np.float32))
    obs_uv = np.concatenate(uv)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("lm",))
    _, _, opt_l, ovalid, (okf_b, ouv_b), (X_b, free_b) = \
        D.bucket_observations(n_dev, n_pts, obs_pt, (obs_kf, obs_uv),
                              (X, np.ones(n_pts, bool)))
    data = D.DistBAData(
        kf_poses=jnp.asarray(poses),
        kf_free=jnp.asarray([False] + [True] * (n_cams - 1)),
        pt_xyz=jnp.asarray(X_b), pt_free=jnp.asarray(free_b),
        obs_kf=jnp.asarray(okf_b), obs_pt=jnp.asarray(opt_l),
        obs_uv=jnp.asarray(ouv_b), obs_valid=jnp.asarray(ovalid),
        obs_is2=jnp.ones(len(ovalid), jnp.float32))
    run = D.make_dist_ba(K, mesh, "lm", n_cams, iters=6)
    out = run(data)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(data)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, n_pts


def time_dist_liba(n_dev, reps=3):
    """Weak scaling for the PRODUCTION VI partition (dist_liba): 32-KF
    15-DoF chain with inertial + bias-RW edges, point landmarks
    proportional to devices, exact landmark-sharded Schur + one psum."""
    from plvio_tpu.parallel import dist_liba as DL
    rng = np.random.default_rng(0)
    n_kf = 32
    n_pts = 1024 * n_dev
    # simple consistent geometry: identity-rotation chain, points ahead
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (n_kf, 1, 1))
    poses[:, 0, 3] = 0.25 * np.arange(n_kf)
    vel = np.tile(np.array([5.0, 0, 0], np.float32) / 20.0, (n_kf, 1))
    own = rng.integers(0, n_kf - 3, n_pts)
    X = np.stack([poses[own, 0, 3] + rng.uniform(-1, 1, n_pts),
                  rng.uniform(-1, 1, n_pts),
                  rng.uniform(2, 5, n_pts)], -1).astype(np.float32)
    okf, opt, ouv = [], [], []
    for j in range(3):
        k = own + j
        pc = X - poses[k, :, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        uv = np.stack([K.fx * pc[:, 0] / z + K.cx,
                       K.fy * pc[:, 1] / z + K.cy], -1)
        okf.append(k.astype(np.int32))
        opt.append(np.arange(n_pts, dtype=np.int32))
        ouv.append(uv.astype(np.float32))
    okf = np.concatenate(okf); opt = np.concatenate(opt)
    ouv = np.concatenate(ouv)
    # identity preintegrations with moderate information (structure
    # benchmark — the edge cost is shape-, not value-, dependent)
    e9 = np.eye(3, dtype=np.float32)
    pre = {"dT": np.full(n_kf - 1, 0.25, np.float32),
           "dR": np.tile(e9, (n_kf - 1, 1, 1)),
           "dV": np.zeros((n_kf - 1, 3), np.float32),
           "dP": np.tile(np.array([0.25, 0, 0], np.float32),
                         (n_kf - 1, 1)),
           "JRg": np.zeros((n_kf - 1, 3, 3), np.float32),
           "JVg": np.zeros((n_kf - 1, 3, 3), np.float32),
           "JVa": np.zeros((n_kf - 1, 3, 3), np.float32),
           "JPg": np.zeros((n_kf - 1, 3, 3), np.float32),
           "JPa": np.zeros((n_kf - 1, 3, 3), np.float32),
           "bg0": np.zeros((n_kf - 1, 3), np.float32),
           "ba0": np.zeros((n_kf - 1, 3), np.float32)}
    infos = np.tile(np.eye(9, dtype=np.float32) * 1e4, (n_kf - 1, 1, 1))
    ev = np.ones(n_kf - 1, bool)
    rw = np.full(n_kf - 1, 1e5, np.float32)
    free = np.ones(n_kf, bool); free[0] = False
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("lm",))
    runner = DL.DistLIBARunner(K, np.eye(3, dtype=np.float32),
                               np.zeros(3, np.float32), 9.81,
                               mesh=mesh, axis="lm")
    args = (poses, vel, np.zeros((n_kf, 3), np.float32),
            np.zeros((n_kf, 3), np.float32), free, free,
            okf, opt, ouv, np.ones(len(okf), np.float32), X,
            pre, infos, ev, rw, rw)
    out = runner.solve(*args, rounds=1, iters=4)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = runner.solve(*args, rounds=1, iters=4)
    return (time.perf_counter() - t0) / reps, n_pts, len(okf)


def main():
    # PLVIO_PIN=1 (run under `taskset -c 0`): SERIALIZED weak scaling.
    # This host exposes only 2 physical cores, so the default mode's
    # D>=2 rows measure core starvation (the D=1 baseline already
    # saturates both cores), not partition overhead.  Pinning the whole
    # process to ONE core makes the D virtual devices time-share it
    # equally: a perfect partition then takes exactly D x T1, so
    #   eff_pinned = D * T1 / T_D
    # isolates the partition + collective overhead from the core count.
    pinned = bool(int(os.environ.get("PLVIO_PIN", "0")))
    if pinned:
        print("PINNED mode: eff = D*T1/T_D (partition overhead only; "
              "run under `taskset -c 0`)")
    rows = []
    base_t = None
    for n_dev in (1, 2, 4, 8):
        t, P, O = time_dist_liba(n_dev)
        if n_dev == 1:
            base_liba = t
        eff = (n_dev * base_liba / t) if pinned else (base_liba / t)
        rows.append(("dist_liba(VI)", n_dev, 32, P, O, t * 1e3, eff))
        print(f"dist_liba D={n_dev}: C=32 P={P} O={O}  {t*1e3:.1f} ms  "
              f"weak-scaling eff {eff*100:.0f}%")
    base_t = None
    for n_dev in (1, 2, 4, 8):
        t, C, P, O = time_chain(n_dev)
        if base_t is None:
            base_t = t
        eff = (n_dev * base_t / t) if pinned else (base_t / t)
        rows.append(("chain_ba", n_dev, C, P, O, t * 1e3, eff))
        print(f"chain_ba D={n_dev}: C={C} P={P} O={O}  {t*1e3:.1f} ms  "
              f"weak-scaling eff {eff*100:.0f}%")
    base_t = None
    for n_dev in (1, 2, 4, 8):
        t, P = time_dist(n_dev)
        if base_t is None:
            base_t = t
        eff = (n_dev * base_t / t) if pinned else (base_t / t)
        rows.append(("dist_ba", n_dev, 8, P, 8 * P, t * 1e3, eff))
        print(f"dist_ba  D={n_dev}: P={P}  {t*1e3:.1f} ms  "
              f"weak-scaling eff {eff*100:.0f}%")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "RESULTS.md")
    with open(path, "a") as f:
        if pinned:
            f.write("\n## Distributed BA weak scaling — PINNED "
                    "methodology (one core, serialized devices)\n\n"
                    "The 2-core host confound is removed by pinning the "
                    "process to ONE core (`taskset -c 0`): the D virtual "
                    "devices time-share it, a perfect partition costs "
                    "exactly D x T1, and eff = D*T1/T_D measures "
                    "partition + collective overhead alone.\n\n")
        else:
            f.write("\n## Distributed BA weak scaling (virtual CPU "
                    "mesh)\n\n"
                    "Per-device work held constant; ideal = flat time "
                    "as devices double.  Validates the partition "
                    "structure (local Schur + one psum for dist_ba; "
                    "halo ppermute, no global collective for chain_ba) "
                    "— virtual CPU devices, so no ICI bandwidth is "
                    "measured.\n\n")
        f.write("| partition | devices | KFs | landmarks | obs | "
                "ms/solve | weak-scaling eff |\n|---|---|---|---|---|---|---|\n")
        for name, d, C, P, O, ms, eff in rows:
            f.write(f"| {name} | {d} | {C} | {P} | {O} | {ms:.1f} | "
                    f"{eff*100:.0f}% |\n")
    print("appended scaling section to RESULTS.md")


if __name__ == "__main__":
    main()
