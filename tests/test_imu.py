import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import ImuConfig
from plvio_tpu.ops import imu as IMU
from plvio_tpu.io import synthetic as syn
from plvio_tpu.utils import lie


def _calib():
    return IMU.make_calib(ImuConfig())


def _preint(gyro, acc, dt, bg=None, ba=None):
    k = len(dt)
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg, jnp.float32)
    ba = jnp.zeros(3) if ba is None else jnp.asarray(ba, jnp.float32)
    return IMU.preintegrate(
        jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.asarray(dt, jnp.float32), jnp.ones(k, bool), _calib(), bg, ba)


def test_static_preintegration():
    """Static IMU measuring only gravity: dP = 0.5 g t^2 upward in body."""
    n, dt = 100, 0.005
    gyro = np.zeros((n, 3))
    acc = np.tile([0, 0, syn.GRAVITY], (n, 1))  # specific force upward
    p = _preint(gyro, acc, np.full(n, dt))
    T = n * dt
    np.testing.assert_allclose(np.asarray(p.dR), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.dV), [0, 0, syn.GRAVITY * T], rtol=1e-5)
    # forward-Euler sum: 0.5*g*dt^2*sum(2i+1) = 0.5 g T^2 exactly for uniform dt
    np.testing.assert_allclose(np.asarray(p.dP), [0, 0, 0.5 * syn.GRAVITY * T * T],
                               rtol=1e-4)


def test_constant_rotation():
    n, dt = 200, 0.005
    w = np.array([0.1, -0.3, 0.5])
    gyro = np.tile(w, (n, 1))
    acc = np.zeros((n, 3))
    p = _preint(gyro, acc, np.full(n, dt))
    R_ref = np.asarray(lie.so3_exp(jnp.asarray(w * n * dt, jnp.float32)))
    np.testing.assert_allclose(np.asarray(p.dR), R_ref, atol=1e-4)


def test_padding_mask():
    """Padded (masked) samples must not change the result."""
    n, dt = 50, 0.005
    rng = np.random.default_rng(1)
    gyro = rng.normal(0, 0.3, (n, 3))
    acc = rng.normal(0, 1.0, (n, 3))
    p1 = _preint(gyro, acc, np.full(n, dt))
    pad = 30
    gyro_p = np.concatenate([gyro, rng.normal(0, 10, (pad, 3))])
    acc_p = np.concatenate([acc, rng.normal(0, 10, (pad, 3))])
    dt_p = np.concatenate([np.full(n, dt), np.full(pad, dt)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    p2 = IMU.preintegrate(
        jnp.asarray(gyro_p, jnp.float32), jnp.asarray(acc_p, jnp.float32),
        jnp.asarray(dt_p, jnp.float32), jnp.asarray(mask), _calib(),
        jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(p2.dR), np.asarray(p1.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.dV), np.asarray(p1.dV), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.dP), np.asarray(p1.dP), atol=1e-6)
    np.testing.assert_allclose(float(p2.dT), float(p1.dT), atol=1e-6)


def test_bias_jacobians_fd():
    """First-order bias correction (getters) vs re-integration at new bias."""
    n, dt = 100, 0.005
    rng = np.random.default_rng(2)
    gyro = rng.normal(0, 0.4, (n, 3))
    acc = rng.normal(0, 2.0, (n, 3)) + np.array([0, 0, 9.81])
    p0 = _preint(gyro, acc, np.full(n, dt))
    dbg = np.array([0.002, -0.001, 0.0015], np.float32)
    dba = np.array([-0.01, 0.02, 0.005], np.float32)
    p1 = _preint(gyro, acc, np.full(n, dt), bg=dbg, ba=dba)
    dR_corr = np.asarray(IMU.delta_rotation(p0, jnp.asarray(dbg)))
    dV_corr = np.asarray(IMU.delta_velocity(p0, jnp.asarray(dbg), jnp.asarray(dba)))
    dP_corr = np.asarray(IMU.delta_position(p0, jnp.asarray(dbg), jnp.asarray(dba)))
    np.testing.assert_allclose(dR_corr, np.asarray(p1.dR), atol=5e-5)
    np.testing.assert_allclose(dV_corr, np.asarray(p1.dV), atol=2e-3)
    np.testing.assert_allclose(dP_corr, np.asarray(p1.dP), atol=2e-3)


def test_predict_state_on_synthetic_orbit():
    """Integrating noise-free synthetic IMU between two frames reproduces
    the ground-truth state (the PredictStateIMU contract)."""
    rng = np.random.default_rng(3)
    dur, fps = 2.0, 20.0
    traj = syn.make_orbit_trajectory(duration=dur, fps=fps)
    imu = syn.synthesize_imu(rng, dur, noise_gyro=0, noise_acc=0,
                             bias_gyro_mag=0, bias_acc_mag=0)
    i0, i1 = 5, 15
    t0, t1 = traj.timestamps[i0], traj.timestamps[i1]
    m = (imu.timestamps > t0) & (imu.timestamps <= t1)
    g, a, ts = imu.gyro[m], imu.acc[m], imu.timestamps[m]
    dts = np.diff(np.concatenate([[t0], ts]))
    p = _preint(g, a, dts)
    g_w = jnp.asarray([0, 0, -syn.GRAVITY], jnp.float32)
    R2, v2, p2 = IMU.predict_state(
        p, jnp.asarray(traj.R_wb[i0], jnp.float32),
        jnp.asarray(traj.v_wb[i0], jnp.float32),
        jnp.asarray(traj.p_wb[i0], jnp.float32), g_w)
    np.testing.assert_allclose(np.asarray(p2), traj.p_wb[i1], atol=2e-3)
    np.testing.assert_allclose(np.asarray(v2), traj.v_wb[i1], atol=5e-3)
    ang = np.asarray(lie.so3_log(
        jnp.asarray(traj.R_wb[i1].T, jnp.float32) @ R2))
    assert np.linalg.norm(ang) < 2e-3


def test_covariance_psd_and_growth():
    n, dt = 200, 0.005
    rng = np.random.default_rng(4)
    gyro = rng.normal(0, 0.3, (n, 3))
    acc = rng.normal(0, 1.0, (n, 3))
    p = _preint(gyro, acc, np.full(n, dt))
    C = np.asarray(p.C, np.float64)
    C = 0.5 * (C + C.T)
    eig = np.linalg.eigvalsh(C)
    assert eig.min() > -1e-12
    assert np.trace(C[:9, :9]) > 0
