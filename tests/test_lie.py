import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsp

from plvio_tpu.utils import lie


def random_w(rng, n=32, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, jnp.float32)


def test_exp_log_roundtrip(rng):
    w = random_w(rng, scale=0.8)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)


def test_exp_matches_scipy(rng):
    w = np.asarray(random_w(rng, scale=2.0), np.float64)
    R_ref = Rsp.from_rotvec(w).as_matrix()
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_small_angle(rng):
    w = random_w(rng, scale=1e-8)
    R = lie.so3_exp(w)
    assert np.all(np.isfinite(np.asarray(R)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(32, 0), atol=1e-6)


def test_log_near_pi():
    axis = np.array([0.3, -0.5, 0.8])
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-4, np.pi - 1e-2]:
        w = jnp.asarray((axis * theta)[None], jnp.float32)
        R = lie.so3_exp(w)
        w2 = np.asarray(lie.so3_log(R))[0]
        np.testing.assert_allclose(w2, axis * theta, atol=5e-3)


def test_right_jacobian_fd(rng):
    """Jr: exp(w + dw) ~= exp(w) exp(Jr(w) dw)."""
    w = np.asarray(rng.normal(size=3), np.float32) * 0.7
    dw = np.asarray(rng.normal(size=3), np.float32) * 1e-4
    R1 = np.asarray(lie.so3_exp(jnp.asarray(w + dw)))
    Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w))) @ np.asarray(lie.so3_exp(jnp.asarray(Jr @ dw)))
    np.testing.assert_allclose(R1, R2, atol=1e-6)


def test_right_jacobian_inv(rng):
    w = random_w(rng, scale=0.9)
    Jr = lie.so3_right_jacobian(w)
    Jri = lie.so3_right_jacobian_inv(w)
    prod = np.asarray(Jr @ Jri)
    np.testing.assert_allclose(prod, np.eye(3)[None].repeat(32, 0), atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32) * 0.5
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-5)


def test_se3_inv_mul(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32) * 0.5
    R, t = lie.se3_exp(xi)
    Ri, ti = lie.se3_inv(R, t)
    Rc, tc = lie.se3_mul(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3)[None].repeat(8, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_w(rng, scale=2.5)
    R = lie.so3_exp(w)
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # matches scipy convention (x,y,z,w up to sign)
    q_ref = Rsp.from_matrix(np.asarray(R, np.float64)).as_quat()
    q_np = np.asarray(q)
    sign = np.sign(np.sum(q_np * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_np, q_ref * sign, atol=1e-5)


def test_sim3_exp_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(8, 7)), jnp.float32) * 0.4
    R, t, s = lie.sim3_exp(xi)
    Ri, ti, si = lie.sim3_inv(R, t, s)
    Rc, tc, sc = lie.sim3_mul(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3)[None].repeat(8, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)


def test_sim3_exp_reduces_to_se3(rng):
    """sigma=0 => sim3 translation equals se3 translation."""
    xi6 = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32) * 0.5
    xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1), jnp.float32)], axis=-1)
    R7, t7, s7 = lie.sim3_exp(xi7)
    R6, t6 = lie.se3_exp(xi6)
    np.testing.assert_allclose(np.asarray(s7), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R7), np.asarray(R6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-4)


def test_so3_normalize(rng):
    w = random_w(rng, 8, scale=1.0)
    R = np.asarray(lie.so3_exp(w)) + rng.normal(size=(8, 3, 3)) * 1e-3
    Rn = np.asarray(lie.so3_normalize(jnp.asarray(R, jnp.float32)))
    for i in range(8):
        np.testing.assert_allclose(Rn[i] @ Rn[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(Rn[i]) > 0.99
