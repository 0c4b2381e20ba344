"""On-manifold IMU preintegration as a `lax.scan` device op.

Re-design of `IMU::Preintegrated` (reference: include/ImuTypes.h:155-235,
src/ImuTypes.cc:255-310 `IntegrateNewMeasurement`): the same midpoint /
forward-Euler integration of delta rotation/velocity/position between two
frames, bias Jacobians (JRg, JVg, JVa, JPg, JPa) and 15x15 covariance
propagation — but over a fixed-capacity padded batch of IMU samples in a
single scan instead of per-sample C++ calls, so a whole frame's worth of
IMU (and, batched, a whole window's) integrates in one fused XLA program.

State ordering in the covariance: [dR(3), dV(3), dP(3), bg(3), ba(3)],
matching the reference's `C` block layout (src/ImuTypes.cc:286-300).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


class ImuCalib(NamedTuple):
    """Noise densities already scaled to per-sample sigmas at construction
    (reference: IMU::Calib ctor multiplies by sqrt(freq),
    include/ImuTypes.h:130-152)."""
    sigma_gyro: jnp.ndarray   # rad/s/sample noise
    sigma_acc: jnp.ndarray
    walk_gyro: jnp.ndarray
    walk_acc: jnp.ndarray
    Rbc: jnp.ndarray          # [3,3] body-from-camera rotation
    tbc: jnp.ndarray          # [3]
    gravity: jnp.ndarray      # scalar g magnitude


def make_calib(cfg) -> ImuCalib:
    """From an ImuConfig."""
    import numpy as np

    sf = float(np.sqrt(cfg.frequency))
    Tbc = cfg.Tbc_matrix()
    return ImuCalib(
        sigma_gyro=jnp.float32(cfg.noise_gyro * sf),
        sigma_acc=jnp.float32(cfg.noise_acc * sf),
        walk_gyro=jnp.float32(cfg.gyro_walk / sf),
        walk_acc=jnp.float32(cfg.acc_walk / sf),
        Rbc=jnp.asarray(Tbc[:3, :3], jnp.float32),
        tbc=jnp.asarray(Tbc[:3, 3], jnp.float32),
        gravity=jnp.float32(cfg.gravity),
    )


class Preintegrated(NamedTuple):
    """Preintegrated measurement between two frames/keyframes."""
    dT: jnp.ndarray      # total time
    dR: jnp.ndarray      # [3,3]
    dV: jnp.ndarray      # [3]
    dP: jnp.ndarray      # [3]
    JRg: jnp.ndarray     # [3,3] d(dR)/d(bg)
    JVg: jnp.ndarray     # [3,3]
    JVa: jnp.ndarray     # [3,3]
    JPg: jnp.ndarray     # [3,3]
    JPa: jnp.ndarray     # [3,3]
    C: jnp.ndarray       # [15,15] covariance [dR dV dP bg ba]
    bias_gyro: jnp.ndarray  # [3] linearization-point bias
    bias_acc: jnp.ndarray   # [3]
    avg_a: jnp.ndarray   # [3] mean raw accel (for IMU-init gravity guess,
    #                      reference: src/LocalMapping.cc:2196)
    avg_w: jnp.ndarray   # [3]


def identity_preintegrated(bias_gyro=None, bias_acc=None) -> Preintegrated:
    z3 = jnp.zeros(3, jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)
    return Preintegrated(
        dT=jnp.float32(0), dR=I3, dV=z3, dP=z3,
        JRg=jnp.zeros((3, 3), jnp.float32), JVg=jnp.zeros((3, 3), jnp.float32),
        JVa=jnp.zeros((3, 3), jnp.float32), JPg=jnp.zeros((3, 3), jnp.float32),
        JPa=jnp.zeros((3, 3), jnp.float32),
        C=jnp.zeros((15, 15), jnp.float32),
        bias_gyro=z3 if bias_gyro is None else bias_gyro,
        bias_acc=z3 if bias_acc is None else bias_acc,
        avg_a=z3, avg_w=z3)


def preintegrate(gyro: jnp.ndarray, acc: jnp.ndarray, dt: jnp.ndarray,
                 mask: jnp.ndarray, calib: ImuCalib,
                 bias_gyro: jnp.ndarray, bias_acc: jnp.ndarray) -> Preintegrated:
    """Integrate a padded batch of IMU samples.

    gyro/acc: [K,3] measurements, dt: [K] per-sample intervals, mask: [K]
    validity.  Follows reference src/ImuTypes.cc:255-310 exactly:

      acc_hat = a - ba;  w_hat = w - bg
      dP += dV*dt + 0.5*dR*acc_hat*dt^2       (uses *old* dR, dV)
      dV += dR*acc_hat*dt
      A/B noise propagation on [dR dV dP], then dR_next = dR * Exp(w_hat dt)
      JPa -= JVa? (see reference ordering); bias Jacobians updated with old dR.
    """
    Nga = jnp.diag(jnp.concatenate([
        jnp.full(3, calib.sigma_gyro ** 2), jnp.full(3, calib.sigma_acc ** 2)]))
    NgaWalk = jnp.diag(jnp.concatenate([
        jnp.full(3, calib.walk_gyro ** 2), jnp.full(3, calib.walk_acc ** 2)]))

    def step(carry, inp):
        (dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, T, sum_a, sum_w, n) = carry
        w, a, dti, m = inp
        dti = jnp.where(m, dti, 0.0)
        a_hat = a - bias_acc
        w_hat = w - bias_gyro

        dt2 = dti * dti
        # position & velocity with OLD dR (reference :262-265)
        dP_new = dP + dV * dti + 0.5 * (dR @ a_hat) * dt2
        dV_new = dV + (dR @ a_hat) * dti

        # noise propagation blocks (reference :267-284)
        Wa = lie.hat(a_hat)
        A = jnp.eye(9, dtype=jnp.float32)
        B = jnp.zeros((9, 6), jnp.float32)
        A = A.at[3:6, 0:3].set(-dti * (dR @ Wa))
        A = A.at[6:9, 0:3].set(-0.5 * dt2 * (dR @ Wa))
        A = A.at[6:9, 3:6].set(dti * jnp.eye(3))
        B = B.at[3:6, 3:6].set(dti * dR)
        B = B.at[6:9, 3:6].set(0.5 * dt2 * dR)

        # bias jacobians with OLD dR (reference :287-291)
        JPa_new = JPa + JVa * dti - 0.5 * dt2 * dR
        JPg_new = JPg + JVg * dti - 0.5 * dt2 * (dR @ Wa) @ JRg
        JVa_new = JVa - dti * dR
        JVg_new = JVg - dti * (dR @ Wa) @ JRg

        # rotation update (reference :294-300)
        phi = w_hat * dti
        dRi = lie.so3_exp(phi)
        rightJ = lie.so3_right_jacobian(phi)
        A = A.at[0:3, 0:3].set(dRi.T)
        B = B.at[0:3, 0:3].set(rightJ * dti)
        dR_new = lie.so3_normalize(dR @ dRi)
        JRg_new = dRi.T @ JRg - rightJ * dti

        # covariance (reference :302-306)
        C9 = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
        Cb = C[9:, 9:] + NgaWalk
        C_new = C.at[:9, :9].set(C9).at[9:, 9:].set(Cb)

        # skip padded samples entirely
        keep = lambda new, old: jnp.where(m, new, old)
        carry_new = (
            keep(dR_new, dR), keep(dV_new, dV), keep(dP_new, dP),
            keep(JRg_new, JRg), keep(JVg_new, JVg), keep(JVa_new, JVa),
            keep(JPg_new, JPg), keep(JPa_new, JPa), keep(C_new, C),
            T + dti, sum_a + jnp.where(m, a, 0.0), sum_w + jnp.where(m, w, 0.0),
            n + m.astype(jnp.float32))
        return carry_new, None

    I3 = jnp.eye(3, dtype=jnp.float32)
    z33 = jnp.zeros((3, 3), jnp.float32)
    init = (I3, jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            z33, z33, z33, z33, z33, jnp.zeros((15, 15), jnp.float32),
            jnp.float32(0), jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.float32(0))
    (dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, T, sum_a, sum_w, n), _ = jax.lax.scan(
        step, init, (gyro.astype(jnp.float32), acc.astype(jnp.float32),
                     dt.astype(jnp.float32), mask))
    n = jnp.maximum(n, 1.0)
    return Preintegrated(dT=T, dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa,
                         JPg=JPg, JPa=JPa, C=C,
                         bias_gyro=bias_gyro, bias_acc=bias_acc,
                         avg_a=sum_a / n, avg_w=sum_w / n)


def merge(a: Preintegrated, b: Preintegrated) -> Preintegrated:
    """Concatenate two preintegrated segments sharing the same bias
    (reference: src/ImuTypes.cc:312 MergePrevious — used when a frame is
    dropped/KF chain rewires).  Covariance composed to first order."""
    dR = lie.so3_normalize(a.dR @ b.dR)
    dV = a.dV + a.dR @ b.dV
    dP = a.dP + a.dV * b.dT + a.dR @ b.dP
    JRg = b.dR.T @ a.JRg + b.JRg
    JVg = a.JVg + a.dR @ b.JVg  # approximate chain (sufficient: reference
    # reintegrates from raw measurements for exactness; we keep raw samples
    # upstream and call preintegrate() again when exactness matters)
    JVa = a.JVa + a.dR @ b.JVa
    JPg = a.JPg + a.JVg * b.dT + a.dR @ b.JPg
    JPa = a.JPa + a.JVa * b.dT + a.dR @ b.JPa
    C = a.C + b.C
    w = a.dT / jnp.maximum(a.dT + b.dT, 1e-9)
    return Preintegrated(
        dT=a.dT + b.dT, dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa,
        JPg=JPg, JPa=JPa, C=C, bias_gyro=a.bias_gyro, bias_acc=a.bias_acc,
        avg_a=w * a.avg_a + (1 - w) * b.avg_a,
        avg_w=w * a.avg_w + (1 - w) * b.avg_w)


# Bias-corrected getters (reference: include/ImuTypes.h:188-199
# GetDeltaRotation/Velocity/Position(Bias)).

def delta_rotation(p: Preintegrated, bias_gyro: jnp.ndarray) -> jnp.ndarray:
    dbg = bias_gyro - p.bias_gyro
    return lie.so3_normalize(p.dR @ lie.so3_exp(p.JRg @ dbg))


def delta_velocity(p: Preintegrated, bias_gyro, bias_acc) -> jnp.ndarray:
    dbg, dba = bias_gyro - p.bias_gyro, bias_acc - p.bias_acc
    return p.dV + p.JVg @ dbg + p.JVa @ dba


def delta_position(p: Preintegrated, bias_gyro, bias_acc) -> jnp.ndarray:
    dbg, dba = bias_gyro - p.bias_gyro, bias_acc - p.bias_acc
    return p.dP + p.JPg @ dbg + p.JPa @ dba


def predict_state(p: Preintegrated, R1, v1, p1, gravity_w):
    """Forward state prediction from preintegration (reference:
    src/Tracking.cc:1507 PredictStateIMU).  Inputs are body pose/velocity
    in world; returns predicted (R2, v2, p2)."""
    dT = p.dT
    R2 = lie.so3_normalize(R1 @ delta_rotation(p, p.bias_gyro))
    v2 = v1 + gravity_w * dT + R1 @ delta_velocity(p, p.bias_gyro, p.bias_acc)
    p2 = p1 + v1 * dT + 0.5 * gravity_w * dT * dT \
        + R1 @ delta_position(p, p.bias_gyro, p.bias_acc)
    return R2, v2, p2
