"""Visual-inertial solver tests: inertial residual chain on synthetic IMU
(the VI-BA families of reference src/Optimizer.cc:9185 LocalInertialBA /
:13585 PoseInertialOptimization*)."""
import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import ImuConfig
from plvio_tpu.ops import imu as IMU
from plvio_tpu.io import synthetic as syn
from plvio_tpu.solver import engine as E
from plvio_tpu.solver import residuals as R
from plvio_tpu.utils import lie


def _preintegrate_window(imu_data, t0, t1, bg, ba):
    m = (imu_data.timestamps > t0) & (imu_data.timestamps <= t1)
    ts = imu_data.timestamps[m]
    dts = np.diff(np.concatenate([[t0], ts]))
    return IMU.preintegrate(
        jnp.asarray(imu_data.gyro[m], jnp.float32),
        jnp.asarray(imu_data.acc[m], jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.ones(len(ts), bool),
        IMU.make_calib(ImuConfig()), bg, ba)


def _inertial_const(p: IMU.Preintegrated):
    return {"dT": p.dT, "dR": p.dR, "dV": p.dV, "dP": p.dP,
            "JRg": p.JRg, "JVg": p.JVg, "JVa": p.JVa,
            "JPg": p.JPg, "JPa": p.JPa, "bg0": p.bias_gyro, "ba0": p.bias_acc}


def test_inertial_chain_recovers_states(rng):
    """5 keyframes on the synthetic orbit; first KF fixed at ground truth;
    others start perturbed; inertial edges alone must pull velocities and
    poses to the truth (noise-free IMU, zero bias)."""
    dur, fps = 3.0, 10.0
    traj = syn.make_orbit_trajectory(duration=dur, fps=fps)
    imu = syn.synthesize_imu(rng, dur, noise_gyro=0, noise_acc=0,
                             bias_gyro_mag=0, bias_acc_mag=0)
    kf_ids = [2, 7, 12, 17, 22]
    n_kf = len(kf_ids)
    bg0 = jnp.zeros(3); ba0 = jnp.zeros(3)

    preints = []
    for a, b in zip(kf_ids[:-1], kf_ids[1:]):
        preints.append(_preintegrate_window(
            imu, traj.timestamps[a], traj.timestamps[b], bg0, ba0))

    # states: pose_wb [N,3,4], vel [N,3], shared biases [1,3]
    poses_gt = np.concatenate([traj.R_wb[kf_ids], traj.p_wb[kf_ids][..., None]], -1)
    vels_gt = traj.v_wb[kf_ids]
    poses0 = poses_gt.copy()
    vels0 = vels_gt.copy()
    for i in range(1, n_kf):
        w = rng.normal(0, 0.02, 3)
        dR = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        poses0[i, :, :3] = poses0[i, :, :3] @ dR
        poses0[i, :, 3] += rng.normal(0, 0.05, 3)
        vels0[i] += rng.normal(0, 0.1, 3)

    prob = E.Problem()
    prob.add_dense("pose", n_kf, 6, R.retract_pose_wb)
    prob.add_dense("vel", n_kf, 3, R.retract_additive)
    prob.add_dense("bg", 1, 3, R.retract_additive)
    prob.add_dense("ba", 1, 3, R.retract_additive)

    # stack the preintegration constants into a batch of K-1 edges
    const = {}
    for key in _inertial_const(preints[0]):
        const[key] = jnp.stack([_inertial_const(p)[key] for p in preints])
    idx1 = jnp.arange(n_kf - 1, dtype=jnp.int32)
    idx2 = idx1 + 1
    z = jnp.zeros(n_kf - 1, jnp.int32)
    # information from preintegration covariance (9x9 block)
    infos = jnp.stack([jnp.linalg.inv(
        np.asarray(p.C)[:9, :9] + np.eye(9) * 1e-8) for p in preints])
    prob.add_term(E.Term(
        name="inertial", res_fn=R.make_inertial(syn.GRAVITY), rdim=9,
        dense_refs=[("pose", idx1), ("vel", idx1), ("bg", z), ("ba", z),
                    ("pose", idx2), ("vel", idx2)],
        const=const, mask=jnp.ones(n_kf - 1, bool),
        info=infos.astype(jnp.float32)))

    states = {"pose": jnp.asarray(poses0, jnp.float32),
              "vel": jnp.asarray(vels0, jnp.float32),
              "bg": bg0[None], "ba": ba0[None]}
    free = {"pose": jnp.asarray([False] + [True] * (n_kf - 1)),
            "vel": jnp.asarray([False] + [True] * (n_kf - 1)),
            "bg": jnp.asarray([False]), "ba": jnp.asarray([False])}
    states, cost, chi2 = E.optimize(prob, states, iters=20, dense_free_mask=free)

    err_p = np.abs(np.asarray(states["pose"])[:, :, 3] - poses_gt[:, :, 3])
    err_v = np.abs(np.asarray(states["vel"]) - vels_gt)
    assert err_p.max() < 2.5e-2, err_p.max()
    assert err_v.max() < 5e-2, err_v.max()


def test_prior15_holds_state(rng):
    """A strong 15-DoF prior keeps the state at the prior mean against a
    weak pull (marginalization prior, reference G2oTypes.h:848)."""
    R0 = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1], jnp.float32)))
    p0 = np.array([1.0, -0.5, 0.3], np.float32)
    v0 = np.array([0.2, 0.0, -0.1], np.float32)
    prob = E.Problem()
    prob.add_dense("pose", 1, 6, R.retract_pose_wb)
    prob.add_dense("vel", 1, 3, R.retract_additive)
    prob.add_dense("bg", 1, 3, R.retract_additive)
    prob.add_dense("ba", 1, 3, R.retract_additive)
    z1 = jnp.zeros(1, jnp.int32)
    prob.add_term(E.Term(
        name="prior", res_fn=R.make_prior15(), rdim=15,
        dense_refs=[("pose", z1), ("vel", z1), ("bg", z1), ("ba", z1)],
        const={"R0": jnp.asarray(R0, jnp.float32)[None],
               "p0": jnp.asarray(p0)[None], "v0": jnp.asarray(v0)[None],
               "bg0": jnp.zeros((1, 3)), "ba0": jnp.zeros((1, 3))},
        mask=jnp.ones(1, bool),
        info=jnp.tile(jnp.eye(15, dtype=jnp.float32)[None] * 1e4, (1, 1, 1))))

    pose_init = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)[None]
    states = {"pose": jnp.asarray(pose_init, jnp.float32),
              "vel": jnp.zeros((1, 3)), "bg": jnp.zeros((1, 3)),
              "ba": jnp.zeros((1, 3))}
    states, cost, _ = E.optimize(prob, states, iters=15)
    np.testing.assert_allclose(np.asarray(states["pose"][0, :, :3]), R0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(states["pose"][0, :, 3]), p0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(states["vel"][0]), v0, atol=1e-3)


def test_bias_random_walk_smooths(rng):
    """Bias RW edges pull consecutive biases together (EdgeGyroRW)."""
    n = 4
    prob = E.Problem()
    prob.add_dense("bg", n, 3, R.retract_additive)
    idx1 = jnp.arange(n - 1, dtype=jnp.int32)
    prob.add_term(E.Term(
        name="rw", res_fn=R.bias_rw, rdim=3,
        dense_refs=[("bg", idx1), ("bg", idx1 + 1)],
        const=None, mask=jnp.ones(n - 1, bool),
        info=jnp.full((n - 1,), 100.0, jnp.float32)))
    # anchor first bias
    bg0 = jnp.asarray(rng.normal(0, 0.05, (n, 3)), jnp.float32)
    states, cost, _ = E.optimize(
        prob, {"bg": bg0}, iters=10,
        dense_free_mask={"bg": jnp.asarray([False, True, True, True])})
    out = np.asarray(states["bg"])
    np.testing.assert_allclose(out, np.tile(out[:1], (n, 1)), atol=1e-3)
