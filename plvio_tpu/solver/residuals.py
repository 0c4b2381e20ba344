"""Residual ("edge") library for the GN/LM engine.

Each function here is the TPU-native equivalent of one g2o edge family in
the reference (reference: include/G2oTypes.h, include/OptimizableTypes.h,
Thirdparty/g2o/g2o/types/types_six_dof_expmap.h).  A residual is a pure
function  res(blocks, deltas, const) -> r  that applies its own retraction
to each referenced state block; the engine differentiates it with jacfwd,
so there are no hand-written `linearizeOplus` Jacobians to get wrong.

State block storage conventions
-------------------------------
pose_cw  [3,4]  (R_cw | t_cw), world->camera.  Left-multiplicative se3
                retract  T <- Exp(d) T, delta = (rho, phi)
                (g2o VertexSE3Expmap convention used by all visual edges).
pose_wb  [3,4]  (R_wb | p_wb), body->world.  Retract R <- R Exp(dphi),
                p <- p + dp, delta = (dp, dphi)
                (reference VertexPose/ImuCamPose, include/G2oTypes.h:127).
vel/bias [3]    additive.
point    [3]    additive (g2o VertexSBAPointXYZ).
line     [6]    two stacked 3D endpoints, additive
                (fork-added g2o VertexSBALineXYZ, types_sba.h:61; MapLine
                stores endpoints, include/MapLine.h:110-111).
gdir     [3,3]  R_wg gravity rotation, 2-DoF retract R <- R Exp(dx,dy,0)
                (reference VertexGDir, include/G2oTypes.h:271).
scale    [1]    s <- s * exp(d) (reference VertexScale, G2oTypes.h:293).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


# --------------------------------------------------------------------------
# Retractions (shared by residuals and by the engine's state update)
# --------------------------------------------------------------------------

def retract_pose_cw_single(P: jnp.ndarray, d: jnp.ndarray):
    R, t = P[:, :3], P[:, 3]
    dR, dt = lie.se3_exp(d)
    return dR @ R, dR @ t + dt


def retract_pose_cw(P: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Batched engine retract: [N,3,4], [N,6] -> [N,3,4]."""
    R, t = P[..., :3], P[..., 3]
    dR, dt = lie.se3_exp(d)
    Rn = dR @ R
    tn = (dR @ t[..., None])[..., 0] + dt
    return jnp.concatenate([lie.so3_normalize(Rn), tn[..., None]], axis=-1)


def retract_pose_wb_single(P: jnp.ndarray, d: jnp.ndarray):
    R, p = P[:, :3], P[:, 3]
    return R @ lie.so3_exp(d[3:]), p + d[:3]


def retract_pose_wb(P: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    R, p = P[..., :3], P[..., 3]
    Rn = lie.so3_normalize(R @ lie.so3_exp(d[..., 3:]))
    pn = p + d[..., :3]
    return jnp.concatenate([Rn, pn[..., None]], axis=-1)


def retract_additive(x: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    return x + d


def retract_gdir(R: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3], [N,2] -> [N,3,3]."""
    d3 = jnp.concatenate([d, jnp.zeros_like(d[..., :1])], axis=-1)
    return lie.so3_normalize(R @ lie.so3_exp(d3))


def retract_scale(s: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    return s * jnp.exp(d)


def pose34(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([R, t[..., None]], axis=-1)


# --------------------------------------------------------------------------
# Camera closure
# --------------------------------------------------------------------------

class PinholeK(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float


def _project(K: PinholeK, pc: jnp.ndarray) -> jnp.ndarray:
    z = jnp.maximum(pc[2], 1e-4)  # soft guard; behind-camera points are
    # rejected by chi2 masks between rounds (replacing g2o isDepthPositive)
    return jnp.stack([K.fx * pc[0] / z + K.cx, K.fy * pc[1] / z + K.cy])


# --------------------------------------------------------------------------
# Visual point residuals
# --------------------------------------------------------------------------

def make_point_reproj(K: PinholeK):
    """Full BA edge: (pose_cw, point) (reference g2o EdgeSE3ProjectXYZ /
    OptimizableTypes.h:177).  const = {'uv': [2]} measured pixel."""
    def res(blocks, deltas, const):
        P, X = blocks
        dp, dX = deltas
        R, t = retract_pose_cw_single(P, dp)
        pc = R @ (X + dX) + t
        return _project(K, pc) - const["uv"]
    return res


def make_point_reproj_fixed(K: PinholeK):
    """Pose-only edge: landmark is a constant (reference
    EdgeSE3ProjectXYZOnlyPose, OptimizableTypes.h:32).
    const = {'uv': [2], 'X': [3]}."""
    def res(blocks, deltas, const):
        (P,) = blocks
        (dp,) = deltas
        R, t = retract_pose_cw_single(P, dp)
        pc = R @ const["X"] + t
        return _project(K, pc) - const["uv"]
    return res


def make_stereo_reproj_fixed(K: PinholeK, bf: float):
    """Pose-only stereo edge with 3rd residual u_R = u - bf/z (reference
    g2o EdgeStereoSE3ProjectXYZOnlyPose).  const = {'uvr': [3], 'X': [3]}."""
    def res(blocks, deltas, const):
        (P,) = blocks
        (dp,) = deltas
        R, t = retract_pose_cw_single(P, dp)
        pc = R @ const["X"] + t
        z = jnp.maximum(pc[2], 1e-4)
        u = K.fx * pc[0] / z + K.cx
        v = K.fy * pc[1] / z + K.cy
        ur = u - bf / z
        return jnp.stack([u, v, ur]) - const["uvr"]
    return res


# --------------------------------------------------------------------------
# Line residuals: both projected endpoints against the observed 2D
# normalized line equation l=(a,b,c), |(a,b)|=1 (reference
# EdgeLineSE3ProjectXYZOnlyPose, OptimizableTypes.h:305; binary version
# :435 with VertexSBALineXYZ)
# --------------------------------------------------------------------------

def make_line_reproj(K: PinholeK):
    """(pose_cw, line6) -> r[2]: signed point-line distance of each
    projected endpoint.  const = {'l': [3]} observed normalized line eq."""
    def res(blocks, deltas, const):
        P, L = blocks
        dp, dL = deltas
        R, t = retract_pose_cw_single(P, dp)
        Ln = L + dL
        l = const["l"]
        r = []
        for k in range(2):
            pc = R @ Ln[3 * k:3 * k + 3] + t
            uv = _project(K, pc)
            r.append(l[0] * uv[0] + l[1] * uv[1] + l[2])
        return jnp.stack(r)
    return res


def make_line_reproj_fixed(K: PinholeK):
    """Pose-only line edge.  const = {'l': [3], 'Xs': [3], 'Xe': [3]}."""
    def res(blocks, deltas, const):
        (P,) = blocks
        (dp,) = deltas
        R, t = retract_pose_cw_single(P, dp)
        l = const["l"]
        out = []
        for key in ("Xs", "Xe"):
            uv = _project(K, R @ const[key] + t)
            out.append(l[0] * uv[0] + l[1] * uv[1] + l[2])
        return jnp.stack(out)
    return res


def make_line_angle_fixed(K: PinholeK):
    """Optional angle-consistency residual between projected segment
    direction and observed direction (reference
    EdgeLineSE3ProjectXYZOnlyPoseangle, OptimizableTypes.h:346);
    const = {'dir': [2] observed unit direction, 'Xs','Xe'}."""
    def res(blocks, deltas, const):
        (P,) = blocks
        (dp,) = deltas
        R, t = retract_pose_cw_single(P, dp)
        uv_s = _project(K, R @ const["Xs"] + t)
        uv_e = _project(K, R @ const["Xe"] + t)
        d = uv_e - uv_s
        # rsqrt-normalization: differentiable at d=0 (padded entries),
        # where plain norm() has a NaN gradient that poisons the Hessian
        d = d * jax.lax.rsqrt(jnp.sum(d * d) + 1e-12)
        # sin of angle between directions (sign-free via cross product)
        return jnp.stack([d[0] * const["dir"][1] - d[1] * const["dir"][0]])
    return res


def make_line_angle(K: PinholeK):
    """BA version of the angle-consistency residual: (pose, line6) both
    free (reference binary line-angle edges with VertexSBALineXYZ,
    include/OptimizableTypes.h:476).  const = {'dir': [2] observed unit
    direction}."""
    def res(blocks, deltas, const):
        P, L6 = blocks
        dp, dl = deltas
        R, t = retract_pose_cw_single(P, dp)
        L6 = L6 + dl
        uv_s = _project(K, R @ L6[:3] + t)
        uv_e = _project(K, R @ L6[3:] + t)
        d = uv_e - uv_s
        d = d * jax.lax.rsqrt(jnp.sum(d * d) + 1e-12)
        return jnp.stack([d[0] * const["dir"][1] - d[1] * const["dir"][0]])
    return res


def make_line_reproj_body_ba(K: PinholeK, Rcb: jnp.ndarray,
                             tcb: jnp.ndarray):
    """Line endpoint-to-line residual with the pose on the BODY frame,
    (pose_wb, line6) both free — the line edge used inside inertial BAs
    (reference FullInertialBAwithLine, src/Optimizer.cc:1374, projecting
    through the ImuCamPose extrinsic).  const = {'l': [3]}."""
    def res(blocks, deltas, const):
        P, L6 = blocks
        dp, dl = deltas
        R_wb, p_wb = retract_pose_wb_single(P, dp)
        L6n = L6 + dl
        l = const["l"]
        out = []
        for k in range(2):
            X = L6n[3 * k:3 * k + 3]
            pc = Rcb @ (R_wb.T @ (X - p_wb)) + tcb
            uv = _project(K, pc)
            out.append(l[0] * uv[0] + l[1] * uv[1] + l[2])
        return jnp.stack(out)
    return res


def make_point_reproj_body(K: PinholeK, Rcb: jnp.ndarray, tcb: jnp.ndarray):
    """Pose-only reprojection with the state on the BODY (IMU) frame and a
    fixed camera-from-body extrinsic (reference EdgeMonoOnlyPose with
    ImuCamPose, include/G2oTypes.h:532: visual edges during VI tracking
    optimize T_wb, projecting through Tcb).

    blocks = (pose_wb,), const = {'uv': [2], 'X': [3] world point}.
    """
    def res(blocks, deltas, const):
        (P,) = blocks
        (d,) = deltas
        R_wb, p_wb = retract_pose_wb_single(P, d)
        Xb = R_wb.T @ (const["X"] - p_wb)
        pc = Rcb @ Xb + tcb
        return _project(K, pc) - const["uv"]
    return res


def make_stereo_reproj_body(K: PinholeK, bf: float,
                            Rcb: jnp.ndarray, tcb: jnp.ndarray):
    """Pose-only STEREO edge with the state on the BODY frame (reference
    EdgeStereoOnlyPose, include/G2oTypes.h:596: the stereo (u, v, u_R)
    residual joins the inertial pose-only optimization for mvuRight>=0
    features — src/Optimizer.cc:13585ff builds these alongside the mono
    edges in PoseInertialOptimization*).

    blocks = (pose_wb,), const = {'uvr': [3], 'X': [3] world point}.
    """
    def res(blocks, deltas, const):
        (P,) = blocks
        (d,) = deltas
        R_wb, p_wb = retract_pose_wb_single(P, d)
        Xb = R_wb.T @ (const["X"] - p_wb)
        pc = Rcb @ Xb + tcb
        z = jnp.maximum(pc[2], 1e-4)
        u = K.fx * pc[0] / z + K.cx
        v = K.fy * pc[1] / z + K.cy
        ur = u - bf / z
        return jnp.stack([u, v, ur]) - const["uvr"]
    return res


def make_point_reproj_body_ba(K: PinholeK, Rcb: jnp.ndarray, tcb: jnp.ndarray):
    """BA version: (pose_wb, point) both free (reference EdgeMono,
    include/G2oTypes.h:484)."""
    def res(blocks, deltas, const):
        P, X = blocks
        d, dX = deltas
        R_wb, p_wb = retract_pose_wb_single(P, d)
        Xb = R_wb.T @ (X + dX - p_wb)
        pc = Rcb @ Xb + tcb
        return _project(K, pc) - const["uv"]
    return res


# --------------------------------------------------------------------------
# Inertial residuals (reference EdgeInertial, include/G2oTypes.h:637:
# 9-dim preintegration residual across (pose1, v1, bg, ba, pose2, v2))
# --------------------------------------------------------------------------

def state_prior(blocks, deltas, const):
    """Absolute prior on an additive state block: r = x - x0 (reference
    EdgePriorGyro / EdgePriorAcc pinning the first-init biases,
    include/G2oTypes.h:929,953, weighted priorG/priorA in
    InertialOptimization src/Optimizer.cc:9914)."""
    (x,) = blocks
    (dx,) = deltas
    return x + dx - const["x0"]


def make_inertial(gravity: float = 9.81):
    """blocks = (pose_wb1, vel1, bias_g, bias_a, pose_wb2, vel2).

    const = {'dT','dR','dV','dP','JRg','JVg','JVa','JPg','JPa',
             'bg0','ba0'} from the Preintegrated between the two states.
    """
    g_w = jnp.array([0.0, 0.0, -gravity], jnp.float32)

    def res(blocks, deltas, const):
        P1, v1, bg, ba, P2, v2 = blocks
        dP1, dv1, dbg_, dba_, dP2, dv2 = deltas
        R1, p1 = retract_pose_wb_single(P1, dP1)
        R2, p2 = retract_pose_wb_single(P2, dP2)
        v1 = v1 + dv1
        v2 = v2 + dv2
        bg_ = bg + dbg_
        ba_ = ba + dba_
        dbg = bg_ - const["bg0"]
        dba = ba_ - const["ba0"]
        dT = const["dT"]
        dR_corr = const["dR"] @ lie.so3_exp(const["JRg"] @ dbg)
        dV_corr = const["dV"] + const["JVg"] @ dbg + const["JVa"] @ dba
        dP_corr = const["dP"] + const["JPg"] @ dbg + const["JPa"] @ dba
        er = lie.so3_log(dR_corr.T @ R1.T @ R2)
        ev = R1.T @ (v2 - v1 - g_w * dT) - dV_corr
        ep = R1.T @ (p2 - p1 - v1 * dT - 0.5 * g_w * dT * dT) - dP_corr
        return jnp.concatenate([er, ev, ep])
    return res


def make_inertial_gs(gravity: float = 9.81):
    """IMU-initialization edge with free gravity direction and scale,
    poses fixed (reference EdgeInertialGS, include/G2oTypes.h:690).

    blocks = (gdir R_wg, scale[1], bias_g, bias_a, vel1, vel2)
    const  = preintegration fields + fixed poses {'R1','p1','R2','p2'}.
    """
    g0 = jnp.array([0.0, 0.0, -gravity], jnp.float32)

    def res(blocks, deltas, const):
        Rwg, s, bg, ba, v1, v2 = blocks
        dg, ds, dbg_, dba_, dv1, dv2 = deltas
        Rwg = retract_gdir(Rwg, dg)
        s = (s * jnp.exp(ds))[0]
        bg_ = bg + dbg_
        ba_ = ba + dba_
        v1 = v1 + dv1
        v2 = v2 + dv2
        dbg = bg_ - const["bg0"]
        dba = ba_ - const["ba0"]
        g_w = Rwg @ g0
        dT = const["dT"]
        R1, p1, R2, p2 = const["R1"], const["p1"], const["R2"], const["p2"]
        dR_corr = const["dR"] @ lie.so3_exp(const["JRg"] @ dbg)
        dV_corr = const["dV"] + const["JVg"] @ dbg + const["JVa"] @ dba
        dP_corr = const["dP"] + const["JPg"] @ dbg + const["JPa"] @ dba
        er = lie.so3_log(dR_corr.T @ R1.T @ R2)
        ev = R1.T @ (s * (v2 - v1) - g_w * dT) - dV_corr
        ep = R1.T @ (s * (p2 - p1 - v1 * dT) - 0.5 * g_w * dT * dT) - dP_corr
        return jnp.concatenate([er, ev, ep])
    return res


# --------------------------------------------------------------------------
# Sim3 pose-graph residual (reference g2o EdgeSim3 used by
# Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:6952; vertices are
# S_iw world->kf similarities)
# --------------------------------------------------------------------------

def sim3_from_flat(S: jnp.ndarray):
    """State storage [13] = R(9 row-major) + t(3) + s(1)."""
    return S[:9].reshape(3, 3), S[9:12], S[12]


def sim3_to_flat(R, t, s):
    return jnp.concatenate([R.reshape(-1), t, jnp.atleast_1d(s)])


def retract_sim3_single(S: jnp.ndarray, d: jnp.ndarray):
    R, t, s = sim3_from_flat(S)
    dR, dt, ds = lie.sim3_exp(d)
    return dR @ R, ds * (dR @ t) + dt, ds * s


def retract_sim3(S: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Batched engine retract [N,13],[N,7] -> [N,13] (left-mult exp)."""
    def one(Si, di):
        R, t, s = retract_sim3_single(Si, di)
        return sim3_to_flat(lie.so3_normalize(R), t, s)
    return jax.vmap(one)(S, d)


_SIM3_4DOF_MASK = (1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 0.0)  # rho free, yaw free


def retract_sim3_4dof_single(S: jnp.ndarray, d: jnp.ndarray):
    """World-frame (right) 4-DoF perturbation of S_iw: translation plus
    yaw about the world z (gravity) axis; roll/pitch/scale frozen.
    Used for inertial pose graphs where gravity pins roll/pitch and IMU
    init pins scale (reference Optimizer::OptimizeEssentialGraph4DoF,
    src/Optimizer.cc:14411; g2o VertexPose4DoF include/G2oTypes.h:152)."""
    R, t, s = sim3_from_flat(S)
    dm = d * jnp.asarray(_SIM3_4DOF_MASK, d.dtype)
    dR, dt, _ = lie.sim3_exp(dm)
    # S' = S ∘ dS_w (perturbation applied to world points first):
    # X_i = s R (dR X_w + dt) + t
    return R @ dR, s * (R @ dt) + t, s


def retract_sim3_4dof(S: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    def one(Si, di):
        R, t, s = retract_sim3_4dof_single(Si, di)
        return sim3_to_flat(lie.so3_normalize(R), t, s)
    return jax.vmap(one)(S, d)


def sim3_edge(blocks, deltas, const):
    """r[7] = log( S_ji_meas * S_i * S_j^{-1} ).
    const = {'Rji','tji','sji'} the measured relative similarity."""
    Si_, Sj_ = blocks
    di, dj = deltas
    Ri, ti, si = retract_sim3_single(Si_, di)
    Rj, tj, sj = retract_sim3_single(Sj_, dj)
    # S_j^{-1}
    Rj_inv, tj_inv, sj_inv = lie.sim3_inv(Rj, tj, sj)
    # S_i * S_j^{-1}
    R1, t1, s1 = lie.sim3_mul(Ri, ti, si, Rj_inv, tj_inv, sj_inv)
    # S_ji * (S_i S_j^{-1})
    R2, t2, s2 = lie.sim3_mul(const["Rji"], const["tji"], const["sji"],
                              R1, t1, s1)
    return lie.sim3_log(R2, t2, s2)


def sim3_edge_4dof(blocks, deltas, const):
    """4-DoF variant of `sim3_edge`: both vertex perturbations restricted
    to world translation + yaw, scale pinned (reference Edge4DoF
    include/G2oTypes.h:978 used by OptimizeEssentialGraph4DoF)."""
    Si_, Sj_ = blocks
    di, dj = deltas
    Ri, ti, si = retract_sim3_4dof_single(Si_, di)
    Rj, tj, sj = retract_sim3_4dof_single(Sj_, dj)
    Rj_inv, tj_inv, sj_inv = lie.sim3_inv(Rj, tj, sj)
    R1, t1, s1 = lie.sim3_mul(Ri, ti, si, Rj_inv, tj_inv, sj_inv)
    R2, t2, s2 = lie.sim3_mul(const["Rji"], const["tji"], const["sji"],
                              R1, t1, s1)
    return lie.sim3_log(R2, t2, s2)


def bias_rw(blocks, deltas, const):
    """Random-walk residual between consecutive biases (reference
    EdgeGyroRW/EdgeAccRW, include/G2oTypes.h:777/813)."""
    b1, b2 = blocks
    d1, d2 = deltas
    return (b2 + d2) - (b1 + d1)


def make_prior15():
    """Marginalization prior on (pose_wb, vel, bg, ba) (reference
    ConstraintPoseImu + EdgePriorPoseImu, include/G2oTypes.h:848/893).
    const = {'R0','p0','v0','bg0','ba0'}; info is the 15x15 prior H."""
    def res(blocks, deltas, const):
        P, v, bg, ba = blocks
        dP, dv, dbg, dba = deltas
        R, p = retract_pose_wb_single(P, dP)
        er = lie.so3_log(const["R0"].T @ R)
        return jnp.concatenate([
            er,
            p - const["p0"],
            (v + dv) - const["v0"],
            (bg + dbg) - const["bg0"],
            (ba + dba) - const["ba0"],
        ])
    return res


# --------------------------------------------------------------------------
# Kannala-Brandt 8 (fisheye) — NATIVE projection in the hot path
# (reference: src/CameraModels/KannalaBrandt8.cpp project/projectJac; the
# reference's BA edges project through the GeometricCamera virtual call,
# so fisheye sequences optimize against RAW pixels, not a pinhole proxy)
# --------------------------------------------------------------------------

class KB8K(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    k1: float
    k2: float
    k3: float
    k4: float


def kb8_project_single(K: "KB8K", pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame point [3] -> raw pixel [2] (equidistant theta-poly)."""
    x, y, z = pc[0], pc[1], pc[2]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan2(r, jnp.maximum(z, 1e-6))
    t2 = theta * theta
    theta_d = theta * (1.0 + K.k1 * t2 + K.k2 * t2 ** 2
                       + K.k3 * t2 ** 3 + K.k4 * t2 ** 4)
    s = theta_d / r
    return jnp.stack([K.fx * x * s + K.cx, K.fy * y * s + K.cy])


def make_point_reproj_kb8_fixed(K: "KB8K"):
    """Pose-only KB8 reprojection edge against RAW pixels.
    const = {'uv': [2], 'X': [3]}."""
    def res(blocks, deltas, const):
        (P,) = blocks
        (dp,) = deltas
        R, t = retract_pose_cw_single(P, dp)
        return kb8_project_single(K, R @ const["X"] + t) - const["uv"]
    return res


def make_point_reproj_kb8(K: "KB8K"):
    """Full BA KB8 edge: (pose_cw, point).  const = {'uv': [2]}."""
    def res(blocks, deltas, const):
        P, X = blocks
        dp, dX = deltas
        R, t = retract_pose_cw_single(P, dp)
        return kb8_project_single(K, R @ (X + dX) + t) - const["uv"]
    return res


def make_point_reproj_body_ba_kb8(K: "KB8K", Rcb: jnp.ndarray,
                                  tcb: jnp.ndarray):
    """Inertial-window BA edge (pose_wb, point) through the native KB8
    lens against RAW pixels (reference EdgeMono projects through the
    rig's GeometricCamera — KannalaBrandt8::projectJac for fisheye,
    include/G2oTypes.h:484 + src/CameraModels/KannalaBrandt8.cpp)."""
    def res(blocks, deltas, const):
        P, X = blocks
        d, dX = deltas
        R_wb, p_wb = retract_pose_wb_single(P, d)
        Xb = R_wb.T @ (X + dX - p_wb)
        return kb8_project_single(K, Rcb @ Xb + tcb) - const["uv"]
    return res


def point_reproj_ba_for(K):
    """Camera-model dispatch for the full-BA point edge: KB8K cameras
    optimize the true equidistant lens against raw pixels; PinholeK
    cameras the undistorted proxy (exact for pinhole)."""
    return (make_point_reproj_kb8(K) if isinstance(K, KB8K)
            else make_point_reproj(K))


def point_reproj_body_ba_for(K, Rcb, tcb):
    """Same dispatch for the body-frame (inertial window) BA edge."""
    return (make_point_reproj_body_ba_kb8(K, Rcb, tcb)
            if isinstance(K, KB8K)
            else make_point_reproj_body_ba(K, Rcb, tcb))
