"""Camera models: pinhole (rad-tan) and Kannala-Brandt-8 fisheye.

Batched jnp re-design of the reference's `GeometricCamera` virtual
interface (reference: include/CameraModels/GeometricCamera.h:57-88,
src/CameraModels/Pinhole.cpp, src/CameraModels/KannalaBrandt8.cpp).
Instead of virtual dispatch, a camera is a small pytree of intrinsics plus
a static model tag; every function maps over arbitrary leading batch dims.

The tracking pipeline follows the reference's convention of undistorting
keypoints once at extraction time and using the *undistorted* pinhole
projection thereafter (reference: src/Frame.cc:567 UndistortKeyPoints), so
the hot reprojection path in the optimizer is pure pinhole.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray      # [4] k1,k2,p1,p2 (pinhole) or k1..k4 (kb8)
    width: int
    height: int
    model: str = "pinhole"  # static


def make_camera(cfg) -> Camera:
    """Build from a CameraConfig."""
    return Camera(
        fx=jnp.float32(cfg.fx), fy=jnp.float32(cfg.fy),
        cx=jnp.float32(cfg.cx), cy=jnp.float32(cfg.cy),
        dist=jnp.asarray(cfg.dist, jnp.float32),
        width=cfg.width, height=cfg.height, model=cfg.model,
    )


# --------------------------------------------------------------------------
# Pinhole  (reference: src/CameraModels/Pinhole.cpp project/unproject)
# --------------------------------------------------------------------------

def project_pinhole(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [...,3] -> pixels [...,2] (no distortion)."""
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[..., 0] * inv_z + cam.cx
    v = cam.fy * pc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject_pinhole(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels [...,2] -> unit-depth rays [...,3] (no distortion)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def project_jac_pinhole(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    """d(u,v)/d(pc): [...,2,3] (reference: Pinhole::projectJac)."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def distort_radtan(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    """Normalised coords [...,2] -> distorted normalised coords [...,2]."""
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_radtan(cam: Camera, xd: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert the rad-tan model by Newton iteration with the analytic 2x2
    Jacobian (fixed trip count; equivalent of cv::undistortPoints used at
    reference src/Frame.cc:700 — Newton converges at image corners where
    plain fixed-point does not under EuRoC's k1=-0.28)."""
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        fx_ = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) - xd[..., 0]
        fy_ = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y - xd[..., 1]
        dr_dr2 = k1 + 2.0 * k2 * r2
        j00 = radial + x * dr_dr2 * 2.0 * x + 2.0 * p1 * y + 6.0 * p2 * x
        j01 = x * dr_dr2 * 2.0 * y + 2.0 * p1 * x + 2.0 * p2 * y
        j10 = y * dr_dr2 * 2.0 * x + 2.0 * p1 * x + 2.0 * p2 * y
        j11 = radial + y * dr_dr2 * 2.0 * y + 6.0 * p1 * y + 2.0 * p2 * x
        det = j00 * j11 - j01 * j10
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        dx = (j11 * fx_ - j01 * fy_) / det
        dy = (-j10 * fx_ + j00 * fy_) / det
        return jnp.stack([x - dx, y - dy], axis=-1)

    def scan_body(carry, _):
        return body(0, carry), None

    xn, _ = jax.lax.scan(scan_body, xd, None, length=iters)
    return xn


def undistort_pixels(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels -> undistorted pixels (pinhole rad-tan).

    A zero-distortion pinhole short-circuits to identity (no 8-iteration
    Newton scan for already-rectified inputs)."""
    if cam.model == "kb8":
        return kb8_undistort_pixels(cam, uv)
    if not np.any(np.asarray(cam.dist)):
        return uv
    xn_d = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                      (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    xn = undistort_radtan(cam, xn_d)
    return jnp.stack([cam.fx * xn[..., 0] + cam.cx,
                      cam.fy * xn[..., 1] + cam.cy], axis=-1)


def distort_pixels(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixels -> raw (distorted) pixels."""
    xn = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                    (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    if cam.model == "kb8":
        xd = kb8_distort_norm(cam, xn)
    else:
        xd = distort_radtan(cam, xn)
    return jnp.stack([cam.fx * xd[..., 0] + cam.cx,
                      cam.fy * xd[..., 1] + cam.cy], axis=-1)


# --------------------------------------------------------------------------
# Kannala-Brandt 8 (fisheye)
# (reference: src/CameraModels/KannalaBrandt8.cpp project/unproject)
# --------------------------------------------------------------------------

def kb8_project(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [...,3] -> pixels [...,2] (equidistant model)."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    k = cam.dist
    theta_d = theta * (1.0 + k[0] * t2 + k[1] * t2**2 + k[2] * t2**3 + k[3] * t2**4)
    scale = theta_d / r
    return jnp.stack([cam.fx * x * scale + cam.cx,
                      cam.fy * y * scale + cam.cy], axis=-1)


def kb8_distort_norm(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    p = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    uv = kb8_project(cam, p)
    return jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                      (uv[..., 1] - cam.cy) / cam.fy], axis=-1)


def kb8_unproject(cam: Camera, uv: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Pixels -> unit-depth rays, Newton solve of theta_d(theta)
    (reference: KannalaBrandt8::unproject Newton iteration)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    theta_d = jnp.sqrt(jnp.maximum(mx * mx + my * my, 1e-18))
    k = cam.dist

    def body(_, theta):
        t2 = theta * theta
        f = theta * (1 + k[0] * t2 + k[1] * t2**2 + k[2] * t2**3 + k[3] * t2**4) - theta_d
        df = 1 + 3 * k[0] * t2 + 5 * k[1] * t2**2 + 7 * k[2] * t2**3 + 9 * k[3] * t2**4
        return theta - f / jnp.maximum(df, 1e-6)

    def scan_body(carry, _):
        return body(0, carry), None

    theta, _ = jax.lax.scan(scan_body, theta_d, None, length=iters)
    scale = jnp.tan(theta) / theta_d
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_undistort_pixels(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    ray = kb8_unproject(cam, uv)
    return jnp.stack([cam.fx * ray[..., 0] / ray[..., 2] + cam.cx,
                      cam.fy * ray[..., 1] / ray[..., 2] + cam.cy], axis=-1)


# --------------------------------------------------------------------------
# Generic dispatch (static on model tag)
# --------------------------------------------------------------------------

def project(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    return kb8_project(cam, pc) if cam.model == "kb8" else project_pinhole(cam, pc)


def unproject(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    return kb8_unproject(cam, uv) if cam.model == "kb8" else unproject_pinhole(cam, uv)


def in_image(cam: Camera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    return ((uv[..., 0] >= margin) & (uv[..., 0] < cam.width - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < cam.height - margin))
