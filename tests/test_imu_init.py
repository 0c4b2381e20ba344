"""IMU initialization kernel: recover metric scale, gravity direction and
gyro bias from scale-ambiguous 'mono SLAM' poses + preintegrated IMU
(reference Optimizer::InertialOptimization, src/Optimizer.cc:9914)."""
import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import ImuConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.models import kernels as KN
from plvio_tpu.ops import imu as IMU
from plvio_tpu.utils import lie


def _inertial_const(p):
    return {"dT": p.dT, "dR": p.dR, "dV": p.dV, "dP": p.dP,
            "JRg": p.JRg, "JVg": p.JVg, "JVa": p.JVa,
            "JPg": p.JPg, "JPa": p.JPa, "bg0": p.bias_gyro, "ba0": p.bias_acc}


def test_imu_init_recovers_scale_gravity_bias(rng):
    dur = 4.0
    traj = syn.make_orbit_trajectory(duration=dur, fps=10.0)
    imu = syn.synthesize_imu(rng, dur, noise_gyro=1e-5, noise_acc=1e-4,
                             bias_gyro_mag=0.003, bias_acc_mag=0.0)
    kf_ids = np.arange(2, 38, 4)
    n_kf = len(kf_ids)

    # "mono SLAM" frame: rotated + scaled version of the true world
    lam = 0.5
    R_pert = np.asarray(lie.so3_exp(jnp.asarray([0.4, -0.2, 0.7], jnp.float32)),
                        np.float64)
    pose_R = np.einsum("ij,kjl->kil", R_pert, traj.R_wb[kf_ids])
    pose_p = lam * np.einsum("ij,kj->ki", R_pert, traj.p_wb[kf_ids])

    calib = IMU.make_calib(ImuConfig())
    preints = []
    for a, b in zip(kf_ids[:-1], kf_ids[1:]):
        t0, t1 = traj.timestamps[a], traj.timestamps[b]
        m = (imu.timestamps > t0) & (imu.timestamps <= t1)
        ts = imu.timestamps[m]
        dts = np.diff(np.concatenate([[t0], ts]))
        preints.append(IMU.preintegrate(
            jnp.asarray(imu.gyro[m], jnp.float32),
            jnp.asarray(imu.acc[m], jnp.float32),
            jnp.asarray(dts, jnp.float32), jnp.ones(len(ts), bool),
            calib, jnp.zeros(3), jnp.zeros(3)))

    # stack constants
    const = {}
    for key in _inertial_const(preints[0]):
        const[key] = jnp.stack([_inertial_const(p)[key] for p in preints])
    infos = jnp.stack([jnp.linalg.inv(np.asarray(p.C)[:9, :9]
                                      + np.eye(9) * 1e-8) for p in preints])

    # initial velocities: finite differences of SLAM positions
    dt_kf = np.diff(traj.timestamps[kf_ids]).mean()
    vel0 = np.gradient(pose_p, axis=0) / dt_kf

    # initial gravity dir: world accel average of -R_wb a_avg
    dirG = np.zeros(3)
    for i, p in enumerate(preints):
        dirG -= pose_R[i] @ np.asarray(p.avg_a)
    dirG /= np.linalg.norm(dirG)
    gI = np.array([0.0, 0.0, -1.0])
    v = np.cross(gI, dirG)
    s = np.linalg.norm(v)
    c = float(gI @ dirG)
    ang = np.arctan2(s, c)
    Rwg0 = np.asarray(lie.so3_exp(jnp.asarray(v / max(s, 1e-9) * ang,
                                              jnp.float32)))

    run = KN.make_inertial_init(syn.GRAVITY, n_kf)
    Rwg, scale, bg, ba, vel = run(
        jnp.asarray(Rwg0, jnp.float32), jnp.asarray(vel0, jnp.float32),
        const, jnp.asarray(pose_R, jnp.float32),
        jnp.asarray(pose_p, jnp.float32), infos.astype(jnp.float32),
        jnp.ones(n_kf - 1, bool))

    # scale: SLAM->metric should be 1/lam = 2
    assert abs(float(scale) - 1.0 / lam) < 0.06, float(scale)
    # gravity direction in SLAM frame: R_pert @ (0,0,-1)
    g_est = np.asarray(Rwg) @ np.array([0, 0, -1.0])
    g_true = R_pert @ np.array([0, 0, -1.0])
    assert np.degrees(np.arccos(np.clip(g_est @ g_true, -1, 1))) < 2.0
    # gyro bias recovered
    np.testing.assert_allclose(np.asarray(bg), imu.bias_gyro, atol=1e-3)
