"""Distributed BA on the virtual 8-device CPU mesh vs single-device
engine: same problem, same solution."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from plvio_tpu.parallel import dist_ba as D
from plvio_tpu.solver import engine as E
from plvio_tpu.solver import residuals as R
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie

K = PinholeK(fx=458.654, fy=457.296, cx=367.215, cy=248.375)


def _problem(rng, n_cams=4, n_pts=96):
    X_gt = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    X_gt[:, 2] += 6.0
    poses_gt = []
    for c in range(n_cams):
        w = rng.normal(0, 0.02, 3)
        t = np.array([0.4 * c, 0.0, 0.0]) + rng.normal(0, 0.02, 3)
        Rm = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        poses_gt.append(np.concatenate([Rm, t[:, None]], 1).astype(np.float32))
    poses_gt = np.stack(poses_gt)

    obs_kf, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        pc = (poses_gt[c, :, :3] @ X_gt.T).T + poses_gt[c, :, 3]
        uv = np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                       K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)
        uv += rng.normal(0, 0.3, uv.shape)
        obs_kf.append(np.full(n_pts, c, np.int32))
        obs_pt.append(np.arange(n_pts, dtype=np.int32))
        obs_uv.append(uv.astype(np.float32))
    obs_kf = np.concatenate(obs_kf)
    obs_pt = np.concatenate(obs_pt)
    obs_uv = np.concatenate(obs_uv)

    poses0 = poses_gt.copy()
    for c in range(1, n_cams):
        w = rng.normal(0, 0.008, 3)
        dR = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        poses0[c, :, :3] = dR @ poses0[c, :, :3]
        poses0[c, :, 3] += rng.normal(0, 0.03, 3)
    X0 = X_gt + rng.normal(0, 0.04, X_gt.shape).astype(np.float32)
    return poses_gt, X_gt, poses0.astype(np.float32), X0.astype(np.float32), \
        obs_kf, obs_pt, obs_uv


def test_dist_ba_matches_truth(rng, cpu_devices):
    n_cams, n_pts = 4, 96
    poses_gt, X_gt, poses0, X0, obs_kf, obs_pt, obs_uv = _problem(
        rng, n_cams, n_pts)

    mesh = Mesh(np.array(cpu_devices), ("lm",))
    n_shards = 8
    pts_per, obs_per, obs_pt_local, valid, (obs_kf_b, obs_uv_b), (X0_b, free_b) = \
        D.bucket_observations(
            n_shards, n_pts, obs_pt,
            (obs_kf, obs_uv),
            (X0, np.ones(n_pts, bool)))

    data = D.DistBAData(
        kf_poses=jnp.asarray(poses0),
        kf_free=jnp.asarray([False] + [True] * (n_cams - 1)),
        pt_xyz=jnp.asarray(X0_b),
        pt_free=jnp.asarray(free_b),
        obs_kf=jnp.asarray(obs_kf_b),
        obs_pt=jnp.asarray(obs_pt_local),
        obs_uv=jnp.asarray(obs_uv_b),
        obs_valid=jnp.asarray(valid),
        obs_is2=jnp.ones(len(valid), jnp.float32))

    run = D.make_dist_ba(K, mesh, "lm", n_cams, iters=12)
    poses_out, pts_out = run(data)
    poses_out = np.asarray(poses_out)
    pts_out = np.asarray(pts_out)[:n_pts]

    err_t = np.abs(poses_out[:, :, 3] - poses_gt[:, :, 3])
    assert err_t.max() < 2e-2, err_t.max()
    err_X = np.linalg.norm(pts_out - X_gt, axis=-1)
    assert np.median(err_X) < 2e-2, np.median(err_X)


def test_dist_ba_agrees_with_engine(rng, cpu_devices):
    """Distributed result == single-device engine result (same damping
    semantics up to iteration path; compare against ground truth-ish
    converged states)."""
    n_cams, n_pts = 3, 64
    poses_gt, X_gt, poses0, X0, obs_kf, obs_pt, obs_uv = _problem(
        rng, n_cams, n_pts)

    # single-device engine
    prob = E.Problem()
    prob.add_dense("pose", n_cams, 6, R.retract_pose_cw)
    prob.add_landmarks("pt", n_pts, 3, R.retract_additive)
    nobs = len(obs_kf)
    prob.add_term(E.Term(
        name="reproj", res_fn=R.make_point_reproj(K), rdim=2,
        dense_refs=[("pose", jnp.asarray(obs_kf))],
        lm_ref=("pt", jnp.asarray(obs_pt)),
        const={"uv": jnp.asarray(obs_uv)}, mask=jnp.ones(nobs, bool),
        info=jnp.ones(nobs, jnp.float32),
        robust_delta=float(np.sqrt(5.991))))
    states = {"pose": jnp.asarray(poses0), "pt": jnp.asarray(X0)}
    free = {"pose": jnp.asarray([False] + [True] * (n_cams - 1))}
    states, _, _ = E.optimize(prob, states, iters=12, dense_free_mask=free,
                              lm_free_mask={"pt": jnp.ones(n_pts, bool)})

    # distributed
    mesh = Mesh(np.array(cpu_devices), ("lm",))
    pts_per, obs_per, obs_pt_local, valid, (obs_kf_b, obs_uv_b), (X0_b, free_b) = \
        D.bucket_observations(8, n_pts, obs_pt, (obs_kf, obs_uv),
                              (X0, np.ones(n_pts, bool)))
    data = D.DistBAData(
        kf_poses=jnp.asarray(poses0),
        kf_free=jnp.asarray([False] + [True] * (n_cams - 1)),
        pt_xyz=jnp.asarray(X0_b), pt_free=jnp.asarray(free_b),
        obs_kf=jnp.asarray(obs_kf_b), obs_pt=jnp.asarray(obs_pt_local),
        obs_uv=jnp.asarray(obs_uv_b), obs_valid=jnp.asarray(valid),
        obs_is2=jnp.ones(len(valid), jnp.float32))
    run = D.make_dist_ba(K, mesh, "lm", n_cams, iters=12)
    poses_d, pts_d = run(data)

    np.testing.assert_allclose(np.asarray(poses_d),
                               np.asarray(states["pose"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pts_d)[:n_pts],
                               np.asarray(states["pt"]), atol=5e-3)
