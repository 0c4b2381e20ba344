import numpy as np
import jax
import jax.numpy as jnp

from plvio_tpu.ops import twoview as TV
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie

K = PinholeK(fx=458.654, fy=457.296, cx=367.215, cy=248.375)


def _project(R, t, X):
    pc = (R @ X.T).T + t
    return np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                     K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1), pc[:, 2]


def _general_scene(rng, n=200):
    X = rng.uniform(-2, 2, (n, 3))
    X[:, 2] = rng.uniform(3, 8, n)
    return X


def _planar_scene(rng, n=200):
    X = rng.uniform(-2, 2, (n, 3))
    X[:, 2] = 5.0 + 0.3 * X[:, 0]  # a tilted plane
    return X


def _make_pair(rng, X, baseline=(0.3, 0.05, 0.0), rot=(0.02, -0.03, 0.01),
               noise=0.3):
    R2 = np.asarray(lie.so3_exp(jnp.asarray(rot, jnp.float32)), np.float64)
    t2 = np.asarray(baseline)
    uv1, z1 = _project(np.eye(3), np.zeros(3), X)
    uv2, z2 = _project(R2, t2, X)
    ok = (z1 > 0.1) & (z2 > 0.1)
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    return (jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(ok), R2, t2)


def _check_result(res, R2, t2, X, tol_rot=0.01, tol_t=0.06, min_tri=0.5):
    assert bool(res.success)
    R_est = np.asarray(res.R, np.float64)
    ang = np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(R_est.T @ R2, jnp.float32))))
    assert ang < tol_rot, ang
    t_est = np.asarray(res.t, np.float64)
    t_dir = t2 / np.linalg.norm(t2)
    assert np.linalg.norm(t_est / np.linalg.norm(t_est) - t_dir) < tol_t
    tri = np.asarray(res.is_triangulated)
    assert tri.mean() > min_tri, tri.mean()
    # triangulated points match gt up to the global scale
    Xe = np.asarray(res.points3d)[tri]
    Xg = X[tri]
    scale = np.median(Xg[:, 2] / Xe[:, 2])
    err = np.linalg.norm(Xe * scale - Xg, axis=-1)
    assert np.median(err) < 0.1, np.median(err)


def test_general_scene_reconstruction(rng):
    X = _general_scene(rng)
    uv1, uv2, ok, R2, t2 = _make_pair(rng, X)
    res = TV.reconstruct_two_views(K, uv1, uv2, ok, jax.random.PRNGKey(0))
    assert not bool(res.used_homography)
    _check_result(res, R2, t2, X)


def test_planar_scene_uses_homography(rng):
    X = _planar_scene(rng)
    uv1, uv2, ok, R2, t2 = _make_pair(rng, X)
    res = TV.reconstruct_two_views(K, uv1, uv2, ok, jax.random.PRNGKey(1))
    assert bool(res.used_homography)
    _check_result(res, R2, t2, X, tol_rot=0.02, tol_t=0.06)


def test_outliers_rejected(rng):
    X = _general_scene(rng)
    uv1, uv2, ok, R2, t2 = _make_pair(rng, X)
    uv2 = np.array(uv2)
    bad = rng.choice(len(uv2), 40, replace=False)
    uv2[bad] += rng.uniform(20, 80, (40, 2)) * rng.choice([-1, 1], (40, 2))
    res = TV.reconstruct_two_views(K, uv1, jnp.asarray(uv2), ok,
                                   jax.random.PRNGKey(2))
    _check_result(res, R2, t2, X, min_tri=0.4)
    # outliers not triangulated
    tri = np.asarray(res.is_triangulated)
    assert tri[bad].mean() < 0.2


def test_pure_rotation_fails(rng):
    """No baseline -> must not report success (no parallax)."""
    X = _general_scene(rng)
    uv1, uv2, ok, R2, t2 = _make_pair(rng, X, baseline=(0.0, 0.0, 0.0),
                                      rot=(0.05, 0.02, 0.0), noise=0.2)
    res = TV.reconstruct_two_views(K, uv1, uv2, ok, jax.random.PRNGKey(3))
    assert not bool(res.success)
