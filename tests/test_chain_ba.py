"""KF-chain partitioned BA with halo exchange (parallel/chain_ba.py) —
validated on the virtual 8-device CPU mesh against the single-device
engine (the CP-analog scale-out of SURVEY §2.3: poses sharded along the
temporal chain, ppermute halo refresh, no global psum)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from plvio_tpu.parallel import chain_ba as CB
from plvio_tpu.solver import engine as E
from plvio_tpu.solver import residuals as RES
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie

K = PinholeK(fx=200.0, fy=200.0, cx=128.0, cy=96.0)


def _chain_problem(rng, C=16, pts_per_kf=30, obs_window=2):
    """A camera sweeping along x, landmarks seen by +-obs_window chain
    neighbours (covisibility locality — the structure the partition
    exploits)."""
    poses_gt, pts, obs_kf, obs_pt, obs_uv = [], [], [], [], []
    for c in range(C):
        R = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3), jnp.float32)))
        t = np.array([0.4 * c, 0, 0], np.float32) \
            + rng.normal(0, 0.05, 3).astype(np.float32)
        poses_gt.append(np.concatenate([R, t[:, None]], 1).astype(np.float32))
    poses_gt = np.stack(poses_gt)
    for c in range(C):
        C1 = -poses_gt[c, :, :3].T @ poses_gt[c, :, 3]
        for _ in range(pts_per_kf):
            X = C1 + np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                               rng.uniform(2.0, 5.0)])
            pid = len(pts)
            pts.append(X)
            for c2 in range(max(0, c - obs_window),
                            min(C, c + obs_window + 1)):
                pc = poses_gt[c2, :, :3] @ X + poses_gt[c2, :, 3]
                if pc[2] < 0.2:
                    continue
                uv = np.array([K.fx * pc[0] / pc[2] + K.cx,
                               K.fy * pc[1] / pc[2] + K.cy])
                if not (0 <= uv[0] < 256 and 0 <= uv[1] < 192):
                    continue
                obs_kf.append(c2)
                obs_pt.append(pid)
                obs_uv.append(uv + rng.normal(0, 0.3, 2))
    return (poses_gt, np.asarray(pts, np.float32),
            np.asarray(obs_kf, np.int64), np.asarray(obs_pt, np.int64),
            np.asarray(obs_uv, np.float32))


def _cost(poses, pts, obs_kf, obs_pt, obs_uv):
    P34 = poses[obs_kf]
    X = pts[obs_pt]
    pc = np.einsum("kij,kj->ki", P34[:, :, :3], X) + P34[:, :, 3]
    z = np.maximum(pc[:, 2], 1e-6)
    uv = np.stack([K.fx * pc[:, 0] / z + K.cx,
                   K.fy * pc[:, 1] / z + K.cy], -1)
    return float(np.sum((uv - obs_uv) ** 2))


def test_chain_ba_converges_to_engine_quality():
    rng = np.random.default_rng(0)
    C = 16
    poses_gt, pts_gt, obs_kf, obs_pt, obs_uv = _chain_problem(rng, C=C)

    # perturb everything except the first two KFs (rigid gauge + the
    # scale-pinning baseline — monocular BA has a 7-DoF gauge)
    poses0 = poses_gt.copy()
    for c in range(2, C):
        dx = rng.normal(0, 0.01, 6).astype(np.float32)
        Rp, tp = lie.se3_exp(jnp.asarray(dx))
        poses0[c, :, :3] = np.asarray(Rp) @ poses0[c, :, :3]
        poses0[c, :, 3] = np.asarray(Rp) @ poses0[c, :, 3] + np.asarray(tp)
    pts0 = pts_gt + rng.normal(0, 0.05, pts_gt.shape).astype(np.float32)

    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides the virtual 8-CPU mesh"
    mesh = Mesh(np.array(devs[:8]), ("kf",))
    halo = 2
    data, layout = CB.partition_chain(
        8, halo, np.arange(C), poses0, obs_kf, obs_pt, obs_uv,
        np.ones(len(obs_kf), np.float32), pts0, fixed_kf=np.array([0, 1]))
    assert layout["n_dropped_obs"] == 0   # obs_window <= halo

    run = CB.make_chain_ba(K, mesh, "kf", layout["Wh"],
                           data.pt_xyz.shape[1], data.obs_kf.shape[1],
                           outer_iters=16, halo=halo)
    poses_out, pts_out = run(data)
    chain_poses, pts_new = CB.gather_results(
        layout, np.asarray(poses_out), np.asarray(pts_out), len(pts_gt))

    # the centralized engine on the same problem (the quality target)
    from plvio_tpu.models import kernels as KN
    n_pt, n_obs = len(pts_gt), len(obs_kf)
    ba = KN.make_local_ba(K, C, n_pt, n_obs, rounds=2, iters=10)
    kf_free = np.ones(C, bool)
    kf_free[:2] = False
    p_ref, x_ref, _ = ba(
        jnp.asarray(poses0), jnp.asarray(kf_free), jnp.asarray(pts0),
        jnp.ones(n_pt, bool), jnp.asarray(obs_kf.astype(np.int32)),
        jnp.asarray(obs_pt.astype(np.int32)), jnp.asarray(obs_uv),
        jnp.ones(n_obs, bool), jnp.ones(n_obs, jnp.float32))
    c_ref = _cost(np.asarray(p_ref), np.asarray(x_ref),
                  obs_kf, obs_pt, obs_uv)

    c0 = _cost(poses0, pts0, obs_kf, obs_pt, obs_uv)
    c1 = _cost(chain_poses, pts_new, obs_kf, obs_pt, obs_uv)
    assert np.isfinite(c1)
    # overlapping block relaxation kills the stiff (local) error modes
    # fast; long-wavelength soft modes converge one block per sweep, so
    # at 16 sweeps we ask for: >=97% of the initial cost removed and
    # within an order of magnitude of the centralized GN fixed point
    assert c1 < 0.03 * c0, f"chain BA barely converged: {c0:.1f}->{c1:.1f}"
    assert c1 < 10.0 * c_ref, (c1, c_ref)

    # pose accuracy vs the centralized solution after SE3 alignment
    # (removes the residual soft-mode drift, which alignment absorbs)
    from plvio_tpu.io import trajectory as TIO
    s_, R_, t_ = TIO.umeyama(chain_poses[:, :, 3],
                             np.asarray(p_ref)[:, :, 3], with_scale=False)
    aligned = (s_ * (R_ @ chain_poses[:, :, 3].T)).T + t_
    err = np.linalg.norm(aligned - np.asarray(p_ref)[:, :, 3], axis=-1)
    assert err.max() < 0.06, err.max()


def test_partition_respects_halo_and_ownership():
    rng = np.random.default_rng(1)
    C = 16
    poses_gt, pts_gt, obs_kf, obs_pt, obs_uv = _chain_problem(
        rng, C=C, pts_per_kf=5)
    data, layout = CB.partition_chain(
        8, 2, np.arange(C), poses_gt, obs_kf, obs_pt, obs_uv,
        np.ones(len(obs_kf), np.float32), pts_gt)
    free = np.asarray(data.kf_free)
    # each shard frees exactly its owned (non-halo) KFs
    W, halo = layout["W"], layout["halo"]
    for d in range(8):
        own = free[d, halo:halo + W]
        assert own.all()
        assert not free[d, :halo].any()
        assert not free[d, halo + W:].any()
    # every observation's local KF index stays inside the window
    okf = np.asarray(data.obs_kf)
    ov = np.asarray(data.obs_valid)
    assert (okf[ov] >= 0).all() and (okf[ov] < layout["Wh"]).all()
