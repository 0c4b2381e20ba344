"""Batched Lie-group operations: SO(3), SE(3), Sim(3).

Mirrors the numerical conventions of the reference's hand-rolled SO3
helpers (reference: src/ImuTypes.cc:48-140 `ExpSO3/LogSO3/RightJacobianSO3/
InverseRightJacobianSO3`) and g2o's SE3Quat/Sim3 types
(reference: Thirdparty/g2o/g2o/types/se3quat.h, sim3.h), but implemented as
pure batched jnp functions: every op accepts arbitrary leading batch
dimensions and is safe under jit/vmap/grad.

Conventions
-----------
* Rotations are 3x3 matrices `R` (world-from-body unless noted).
* SE(3) is carried as a (R, t) pair or a 4x4 homogeneous matrix; tangent
  vectors are ordered (rho, phi) = (translation, rotation), matching g2o's
  se3quat ordering used throughout the reference optimizer.
* Sim(3) is (R, t, s).
* All trig is guarded with Taylor expansions below `_EPS` so gradients are
  finite at the identity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


# --------------------------------------------------------------------------
# SO(3)
# --------------------------------------------------------------------------

def hat(w: jnp.ndarray) -> jnp.ndarray:
    """[...,3] -> [...,3,3] skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """[...,3,3] skew -> [...,3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, [...,3] -> [...,3,3]. (ref ImuTypes.cc:48 ExpSO3)"""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    # sin(t)/t and (1-cos t)/t^2 with Taylor guards
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[...,3,3] -> [...,3].  (ref ImuTypes.cc:75 LogSO3)

    DIFFERENTIABLE AT THE IDENTITY: implemented via atan2(|w|, cos)
    with double-where guards so jacfwd/jacrev give the exact Jacobian
    (J -> I as theta -> 0).  A naive arccos(trace) formulation has a
    singular derivative at theta=0, which silently poisons every
    residual that logs a near-identity rotation (all inertial edges).
    Values are also correct near theta == pi via the symmetric-part
    branch (gradients there are not needed by the pipeline).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    w2 = jnp.sum(w * w, axis=-1)                # = sin(theta)^2
    small = w2 < 1e-12
    w2_safe = jnp.where(small, 1.0, w2)         # keeps sqrt grad finite
    sin_t = jnp.sqrt(w2_safe)
    theta = jnp.arctan2(sin_t, cos_t)
    # smooth small-angle surrogate: theta^2/6 ~= (1 - cos)/3 (no sqrt)
    scale = jnp.where(small, 1.0 + (1.0 - cos_t) / 3.0, theta / sin_t)
    generic = w * scale[..., None]
    # Near pi: axis from diagonal of (R + I)/2 = aa^T(1-cos)+..., use largest diag.
    near_pi = theta > (jnp.pi - 1e-3)
    Rp = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(Rp, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), 1e-12)
    # fix sign to agree with w
    sgn = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    pi_branch = axis * sgn * theta[..., None]
    return jnp.where(near_pi[..., None], pi_branch, generic)


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Jr(w): [...,3] -> [...,3,3]. (ref ImuTypes.cc:105 RightJacobianSO3)"""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - B[..., None, None] * W + C[..., None, None] * W2


def so3_right_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Jr^{-1}(w). (ref ImuTypes.cc:123 InverseRightJacobianSO3)"""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    # 1/theta^2 - (1+cos)/(2 theta sin)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / theta2 - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.maximum(jnp.sin(theta), 1e-12)),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + 0.5 * W + cot_term[..., None, None] * W2


def so3_normalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project to the closest rotation (Gram-Schmidt via cross products).

    Cheap re-orthonormalisation applied after long chains of f32 products
    (the reference re-normalises via NormalizeRotation, src/ImuTypes.cc:141).
    """
    r0 = R[..., 0, :]
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0, axis=-1, keepdims=True), 1e-12)
    r1 = R[..., 1, :] - jnp.sum(R[..., 1, :] * r0, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-12)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """[...,4] (x,y,z,w) -> [...,3,3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """[...,3,3] -> [...,4] (x,y,z,w), w >= 0.  Branch-free Shepperd method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four candidate quaternions, pick numerically best
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    trace_vals = jnp.stack([1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
                            1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    best = jnp.argmax(trace_vals, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [...,4,4] in (w,x,y,z) comp order
    q_wxyz = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = jnp.stack([q_wxyz[..., 1], q_wxyz[..., 2], q_wxyz[..., 3], q_wxyz[..., 0]], -1)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


# --------------------------------------------------------------------------
# SE(3):  tangent ordering (rho, phi)
# --------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray):
    """[...,6] (rho,phi) -> (R [...,3,3], t [...,3])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_V(phi)
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R,t) -> [...,6] (rho,phi)."""
    phi = so3_log(R)
    Vinv = _so3_left_V_inv(phi)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def _so3_left_V(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = hat(phi)
    W2 = W @ W
    small = theta2 < _EPS
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def _so3_left_V_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = hat(phi)
    W2 = W @ W
    small = theta2 < _EPS
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / theta2 - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.maximum(jnp.sin(theta), 1e-12)),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I - 0.5 * W + cot_term[..., None, None] * W2


def se3_inv(R: jnp.ndarray, t: jnp.ndarray):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_mul(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_apply(R, t, p):
    """Transform points p [...,3] by (R,t)."""
    return (R @ p[..., None])[..., 0] + t


def se3_matrix(R, t):
    """(R,t) -> [...,4,4]."""
    batch = R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    M = M.at[..., 3, 3].set(1.0)
    return M


# --------------------------------------------------------------------------
# Sim(3): (R, t, s) — used by loop closing / essential graph
# (reference: Thirdparty/g2o/g2o/types/sim3.h, src/Optimizer.cc:6952)
# tangent ordering (rho, phi, sigma), sigma = log s.
# --------------------------------------------------------------------------

def _sim3_W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) translation mixing matrix W = int_0^1 e^{sigma u}
    Exp(u phi) du = a0 I + a1 phi^ + a2 phi^^2 (Strasdat; g2o sim3.h),
    with Taylor guards at sigma -> 0 and theta -> 0."""
    eps = 1e-4
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    s = jnp.exp(sigma)
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    sig_safe = jnp.where(sig_small, 1.0, sigma)
    th_safe = jnp.where(th_small, 1.0, theta)
    denom = jnp.maximum(sigma * sigma + theta2, 1e-24)

    # a0 = (e^s - 1)/s
    a0 = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                   (s - 1.0) / sig_safe)
    # int e^{su} sin(tu) du, int e^{su} cos(tu) du
    int_sin = (s * (sigma * jnp.sin(theta) - theta * jnp.cos(theta)) + theta) / denom
    int_cos = (s * (sigma * jnp.cos(theta) + theta * jnp.sin(theta)) - sigma) / denom
    # a1 = int_sin / theta; theta->0 limit: int e^{su} u du
    int_u = jnp.where(sig_small, 0.5 + sigma / 3.0,
                      (s * (sigma - 1.0) + 1.0) / (sig_safe * sig_safe))
    a1 = jnp.where(th_small, int_u, int_sin / th_safe)
    # a2 = (a0 - int_cos)/theta^2; theta->0 limit: int e^{su} u^2/2 du
    int_u2h = jnp.where(
        sig_small, 1.0 / 6.0 + sigma / 8.0,
        (s * (sigma * sigma - 2.0 * sigma + 2.0) - 2.0)
        / (2.0 * sig_safe ** 3))
    a2 = jnp.where(th_small, int_u2h,
                   (a0 - int_cos) / jnp.maximum(theta2, 1e-24))

    Wh = hat(phi)
    Wh2 = Wh @ Wh
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Wh.shape)
    return a0[..., None, None] * I + a1[..., None, None] * Wh \
        + a2[..., None, None] * Wh2


def sim3_exp(xi: jnp.ndarray):
    """[...,7] (rho,phi,sigma) -> (R, t, s)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    Wm = _sim3_W(phi, sigma)
    t = (Wm @ rho[..., None])[..., 0]
    return R, t, s


def sim3_log(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """(R, t, s) -> [...,7] (rho, phi, sigma).  Inverse of sim3_exp."""
    sigma = jnp.log(jnp.maximum(s, 1e-12))
    phi = so3_log(R)
    Wm = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0], s_inv


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    return Ra @ Rb, sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta, sa * sb


def sim3_apply(R, t, s, p):
    return s[..., None] * (R @ p[..., None])[..., 0] + t
