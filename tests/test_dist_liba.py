"""Exact distributed VI-BA (parallel/dist_liba): landmark-sharded
Schur + one psum of the reduced 15-DoF camera system through the
engine's psum_axis.  The step is exact (no Schwarz lag), so the sharded
result must match the single-device solve and recover ground truth
(reference problem: LocalInertialBA src/Optimizer.cc:9185)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from plvio_tpu.io import synthetic as syn
from plvio_tpu.parallel import dist_liba as DL
from plvio_tpu.utils import lie

from test_chain_liba import _build_problem, K


def _perturb(rng, pose_gt, vel_gt, X, ln_ep, n_kf):
    pose0 = pose_gt.copy()
    vel0 = vel_gt.copy()
    X0 = X + rng.normal(0, 0.02, X.shape).astype(np.float32)
    ln0 = ln_ep + rng.normal(0, 0.02, ln_ep.shape).astype(np.float32)
    for i in range(1, n_kf):
        w = rng.normal(0, 0.01, 3)
        dR = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        pose0[i, :, :3] = pose0[i, :, :3] @ dR
        pose0[i, :, 3] += rng.normal(0, 0.03, 3)
        vel0[i] += rng.normal(0, 0.05, 3)
    return pose0, vel0, X0, ln0


def _solve(D, devs, pose0, vel0, X0, ln0, prob, n_kf):
    (pose_gt, vel_gt, X, ln_ep, obs_kf, obs_pt, obs_uv,
     lobs_kf, lobs_ln, lobs_eq, pre_stack, infos, ev, rwg, rwa) = prob
    bgba = np.zeros((n_kf, 3), np.float32)
    kf_free = np.ones(n_kf, bool)
    kf_free[0] = False
    data, layout = DL.build_dist_liba(
        D, pose0, vel0, bgba, bgba, kf_free, kf_free,
        obs_kf, obs_pt, obs_uv, np.ones(len(obs_kf), np.float32), X0,
        pre_stack, infos, ev, rwg, rwa,
        lobs_kf=lobs_kf, lobs_ln=lobs_ln, lobs_eq=lobs_eq, ln_ep=ln0)
    mesh = Mesh(np.array(devs[:D]), ("lm",))
    run = DL.make_dist_liba(
        K, mesh, "lm", n_kf,
        data.pt_xyz.shape[1], data.obs_kf.shape[1],
        data.ln_ep.shape[1], data.lobs_kf.shape[1],
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        syn.GRAVITY, rounds=2, iters=8)
    pose_o, vel_o, bg_o, ba_o, pt_o, ln_o = run(data)
    pts, lns = DL.gather_landmarks(layout, np.asarray(pt_o),
                                   np.asarray(ln_o),
                                   n_pts=len(X), n_lns=len(ln_ep))
    return (np.asarray(pose_o), np.asarray(vel_o), pts, lns)


@pytest.mark.slow
def test_dist_liba_recovers_and_matches(rng, cpu_devices):
    n_kf = 16
    prob = _build_problem(rng, n_kf=n_kf, n_pts=300, n_lns=16)
    pose_gt, vel_gt, X, ln_ep = prob[0], prob[1], prob[2], prob[3]
    pose0, vel0, X0, ln0 = _perturb(rng, pose_gt, vel_gt, X, ln_ep, n_kf)

    outs = {}
    for D in (1, 4):
        outs[D] = _solve(D, cpu_devices, pose0.copy(), vel0.copy(),
                         X0.copy(), ln0.copy(), prob, n_kf)

    pose1, vel1, pts1, lns1 = outs[1]
    pose4, vel4, pts4, lns4 = outs[4]
    assert np.isfinite(pose4).all() and np.isfinite(pts4).all()

    # exactness: the sharded solve equals the single-device solve
    d_pose = np.abs(pose1[:, :, 3] - pose4[:, :, 3]).max()
    assert d_pose < 2e-3, d_pose

    # accuracy: perturbation pulled back toward ground truth
    err0 = np.linalg.norm(pose0[:, :, 3] - pose_gt[:, :, 3], axis=1)
    err4 = np.linalg.norm(pose4[:, :, 3] - pose_gt[:, :, 3], axis=1)
    assert err4.max() < 0.35 * max(err0.max(), 1e-9), \
        (err0.max(), err4.max())
    assert np.abs(vel4 - vel_gt).max() < 5e-2
    assert lns4 is not None and np.isfinite(lns4).all()
