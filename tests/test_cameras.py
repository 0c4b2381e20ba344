import numpy as np
import jax.numpy as jnp
import cv2

from plvio_tpu.config import CameraConfig
from plvio_tpu.ops import cameras as C


def euroc_cam():
    return C.make_camera(CameraConfig())


def test_project_unproject_pinhole(rng):
    cam = euroc_cam()
    pc = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)), jnp.float32)
    pc = pc.at[:, 2].set(jnp.abs(pc[:, 2]) + 1.0)
    uv = C.project_pinhole(cam, pc)
    rays = C.unproject_pinhole(cam, uv)
    np.testing.assert_allclose(
        np.asarray(rays * pc[:, 2:3]), np.asarray(pc), rtol=1e-4, atol=1e-4)


def test_project_jac_fd(rng):
    cam = euroc_cam()
    pc = jnp.asarray([[0.3, -0.2, 2.0]], jnp.float32)
    J = np.asarray(C.project_jac_pinhole(cam, pc))[0]
    eps = 1e-3
    for k in range(3):
        d = np.zeros(3, np.float32)
        d[k] = eps
        up = np.asarray(C.project_pinhole(cam, pc + d[None]))[0]
        dn = np.asarray(C.project_pinhole(cam, pc - d[None]))[0]
        np.testing.assert_allclose((up - dn) / (2 * eps), J[:, k], rtol=1e-3, atol=1e-2)


def test_undistort_matches_opencv(rng):
    """Central region matches cv2.undistortPoints tightly; at extreme
    corners OpenCV's default 5 fixed-point iterations have not converged
    (its own distort-roundtrip error is ~0.24 px there vs our Newton
    solver's ~6e-5 px), so corners only get a loose bound."""
    cfg = CameraConfig()
    cam = C.make_camera(cfg)
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]], np.float32)
    D = np.asarray(cfg.dist, np.float32)

    uv_c = rng.uniform([200, 150], [550, 330], size=(100, 2)).astype(np.float32)
    ref = cv2.undistortPoints(uv_c[:, None, :], K, D, P=K).reshape(-1, 2)
    out = np.asarray(C.undistort_pixels(cam, jnp.asarray(uv_c)))
    np.testing.assert_allclose(out, ref, atol=0.02)

    uv_all = rng.uniform([50, 50], [700, 430], size=(100, 2)).astype(np.float32)
    ref = cv2.undistortPoints(uv_all[:, None, :], K, D, P=K).reshape(-1, 2)
    out = np.asarray(C.undistort_pixels(cam, jnp.asarray(uv_all)))
    np.testing.assert_allclose(out, ref, atol=0.5)
    # and our inversion is exact under the forward model
    back = np.asarray(C.distort_pixels(cam, jnp.asarray(out)))
    np.testing.assert_allclose(back, uv_all, atol=1e-3)


def test_distort_undistort_roundtrip(rng):
    cam = euroc_cam()
    uv = jnp.asarray(rng.uniform([100, 100], [650, 380], size=(64, 2)), jnp.float32)
    und = C.undistort_pixels(cam, uv)
    back = C.distort_pixels(cam, und)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=0.05)


def test_kb8_project_unproject(rng):
    cfg = CameraConfig(model="kb8", fx=190.9, fy=190.9, cx=254.9, cy=256.8,
                       width=512, height=512,
                       dist=(0.00348, 0.000715, -0.0020532, 0.000202))
    cam = C.make_camera(cfg)
    pc = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)), jnp.float32)
    pc = pc.at[:, 2].set(jnp.abs(pc[:, 2]) + 0.8)
    uv = C.kb8_project(cam, pc)
    rays = np.asarray(C.kb8_unproject(cam, uv))
    ref = np.asarray(pc) / np.asarray(pc)[:, 2:3]
    np.testing.assert_allclose(rays, ref, rtol=1e-3, atol=1e-3)


def test_kb8_matches_opencv_fisheye(rng):
    cfg = CameraConfig(model="kb8", fx=190.9, fy=190.9, cx=254.9, cy=256.8,
                       width=512, height=512,
                       dist=(0.00348, 0.000715, -0.0020532, 0.000202))
    cam = C.make_camera(cfg)
    pts = rng.uniform(-0.8, 0.8, size=(50, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 1.0
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]], np.float64)
    D = np.asarray(cfg.dist, np.float64)
    ref, _ = cv2.fisheye.projectPoints(
        pts.reshape(-1, 1, 3).astype(np.float64), np.zeros(3), np.zeros(3), K, D)
    out = np.asarray(C.kb8_project(cam, jnp.asarray(pts)))
    np.testing.assert_allclose(out, ref.reshape(-1, 2), atol=0.05)
