"""PnP and Sim3 RANSAC solvers as vmapped-hypothesis device ops.

Replaces the reference's iterative RANSAC loops (reference:
src/MLPnPsolver.cpp used by Tracking::Relocalization src/Tracking.cc:5744,
src/PnPsolver.cc EPnP, src/Sim3Solver.cc Horn 3-point) with fixed-count
batched hypothesis evaluation: all minimal sets are solved by one batched
SVD and scored against all correspondences as one dense residual matrix.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..solver.residuals import PinholeK
from ..utils import lie


def _dlt_pose(xn: jnp.ndarray, X: jnp.ndarray):
    """6+ point DLT on normalized image coords: returns (R, t).

    Solves P [3,4] s.t. xn ~ P [X;1], then projects M onto SO(3)
    (orthogonal Procrustes) and rescales t accordingly.
    """
    n = xn.shape[0]
    ones = jnp.ones((n, 1))
    Xh = jnp.concatenate([X, ones], -1)            # [n,4]
    z = jnp.zeros((n, 4))
    r1 = jnp.concatenate([Xh, z, -xn[:, 0:1] * Xh], -1)
    r2 = jnp.concatenate([z, Xh, -xn[:, 1:2] * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)               # [2n,12]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    # fix the projective sign so that det(M) > 0 (proper rotation), then
    # polar-decompose M = scale * R
    M = P[:, :3]
    P = jnp.where(jnp.linalg.det(M) < 0, -P, P)
    M = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    R = U @ Vt2                       # det=+1 because det(M)>0
    scale = jnp.mean(S)
    t = P[:, 3] / jnp.maximum(scale, 1e-9)
    return R, t


def pnp_ransac(K: PinholeK, uv: jnp.ndarray, X: jnp.ndarray,
               valid: jnp.ndarray, key, iters: int = 128,
               chi2_th: float = 5.991):
    """Robust pose from 2D-3D matches.

    uv [N,2] pixels, X [N,3] world points.  Returns (R, t, inliers [N],
    n_inliers) with T_cw = (R, t).
    """
    N = uv.shape[0]
    xn = jnp.stack([(uv[:, 0] - K.cx) / K.fx, (uv[:, 1] - K.cy) / K.fy], -1)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    keys = jax.random.split(key, iters)
    samples = jax.vmap(lambda k: jax.random.choice(k, N, shape=(6,),
                                                   replace=False, p=p))(keys)

    def hypo(idx):
        return _dlt_pose(xn[idx], X[idx])

    Rs, ts = jax.vmap(hypo)(samples)               # [it,3,3], [it,3]

    def score(R, t):
        pc = X @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        pred = jnp.stack([K.fx * pc[:, 0] / z + K.cx,
                          K.fy * pc[:, 1] / z + K.cy], -1)
        chi2 = jnp.sum((pred - uv) ** 2, -1)
        inl = valid & (chi2 < chi2_th) & (pc[:, 2] > 0.05)
        return jnp.sum(inl), inl

    def score_loose(R, t):
        pc = X @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        pred = jnp.stack([K.fx * pc[:, 0] / z + K.cx,
                          K.fy * pc[:, 1] / z + K.cy], -1)
        chi2 = jnp.sum((pred - uv) ** 2, -1)
        inl = valid & (chi2 < 4 * chi2_th) & (pc[:, 2] > 0.05)
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(score_loose)(Rs, ts)
    best = jnp.argmax(counts)
    # refit on the loose inliers of the best hypothesis (weighted rows —
    # a 6-point minimal DLT amplifies pixel noise too much to score with
    # the strict chi2 directly), then strict re-score
    w_in = inls[best].astype(jnp.float32)

    def _dlt_weighted(xn, X, w):
        n = xn.shape[0]
        ones = jnp.ones((n, 1))
        Xh = jnp.concatenate([X, ones], -1)
        z = jnp.zeros((n, 4))
        r1 = jnp.concatenate([Xh, z, -xn[:, 0:1] * Xh], -1) * w[:, None]
        r2 = jnp.concatenate([z, Xh, -xn[:, 1:2] * Xh], -1) * w[:, None]
        A = jnp.concatenate([r1, r2], 0)
        _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
        P = Vt[-1].reshape(3, 4)
        M = P[:, :3]
        P = jnp.where(jnp.linalg.det(M) < 0, -P, P)
        M = P[:, :3]
        U, S, Vt2 = jnp.linalg.svd(M)
        return U @ Vt2, P[:, 3] / jnp.maximum(jnp.mean(S), 1e-9)

    R_ref, t_ref = _dlt_weighted(xn, X, w_in)
    # IRLS polish: re-weight by Huber'd reprojection error and refit
    # (unrolled fixed rounds — keeps the solve robust in high-outlier
    # relocalization regimes where the single loose-inlier refit can be
    # dragged by borderline outliers; SVDs stay OUT of lax.scan, which
    # compiles pathologically on the axon backend)
    for _ in range(2):
        pc = X @ R_ref.T + t_ref
        z = jnp.maximum(pc[:, 2], 1e-6)
        pred = jnp.stack([K.fx * pc[:, 0] / z + K.cx,
                          K.fy * pc[:, 1] / z + K.cy], -1)
        chi2 = jnp.sum((pred - uv) ** 2, -1)
        w_h = jnp.minimum(1.0, jnp.sqrt(
            chi2_th / jnp.maximum(chi2, 1e-9)))
        w_irls = valid.astype(jnp.float32) * (pc[:, 2] > 0.05) * w_h \
            * (chi2 < 4 * chi2_th)
        R_i, t_i = _dlt_weighted(xn, X, w_irls)
        n_i, _ = score(R_i, t_i)
        n_cur, _ = score(R_ref, t_ref)
        keep = n_i >= n_cur
        R_ref = jnp.where(keep, R_i, R_ref)
        t_ref = jnp.where(keep, t_i, t_ref)
    n_ref, inl_ref = score(R_ref, t_ref)
    # fall back to the raw hypothesis if the refit somehow got worse
    n_raw, inl_raw = score(Rs[best], ts[best])
    better = n_ref >= n_raw
    R_out = jnp.where(better, R_ref, Rs[best])
    t_out = jnp.where(better, t_ref, ts[best])
    return (R_out, t_out, jnp.where(better, inl_ref, inl_raw),
            jnp.maximum(n_ref, n_raw))


def sim3_horn(X1: jnp.ndarray, X2: jnp.ndarray, fix_scale: bool = False):
    """Closed-form Horn alignment of 3+ point sets: returns (s, R, t)
    with X2 ~ s R X1 + t (reference Sim3Solver::ComputeSim3,
    src/Sim3Solver.cc — same Horn quaternion method, done via SVD)."""
    mu1 = X1.mean(0)
    mu2 = X2.mean(0)
    x1 = X1 - mu1
    x2 = X2 - mu2
    cov = x2.T @ x1 / X1.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3) * jnp.array([1, 1, jnp.sign(jnp.linalg.det(U) *
                                               jnp.linalg.det(Vt))])
    R = U @ S @ Vt
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        var1 = jnp.mean(jnp.sum(x1 * x1, -1))
        s = jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var1, 1e-12)
    t = mu2 - s * R @ mu1
    return s, R, t


def sim3_ransac(X1: jnp.ndarray, X2: jnp.ndarray, valid: jnp.ndarray,
                key, iters: int = 64, th: float = 0.05,
                fix_scale: bool = False):
    """Robust Sim3 between matched 3D point sets (loop/merge detection;
    reference Sim3Solver::iterate).  Threshold `th` is a relative 3D
    distance (fraction of scene scale).  Returns (s, R, t, inliers, n)."""
    N = X1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    keys = jax.random.split(key, iters)
    samples = jax.vmap(lambda k: jax.random.choice(k, N, shape=(3,),
                                                   replace=False, p=p))(keys)

    scale_ref = jnp.sqrt(jnp.maximum(jnp.sum(
        (X2 - X2.mean(0)) ** 2, -1), 1e-9)).mean()

    def hypo(idx):
        return sim3_horn(X1[idx], X2[idx], fix_scale)

    ss, Rs, ts = jax.vmap(hypo)(samples)

    def score(s, R, t):
        pred = s * (X1 @ R.T) + t
        d = jnp.linalg.norm(pred - X2, axis=-1)
        inl = valid & (d < th * scale_ref) & (s > 0.1) & (s < 10.0)
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(score)(ss, Rs, ts)
    best = jnp.argmax(counts)
    # refit on the inliers of the best hypothesis (weighted by mask)
    inl = inls[best]
    w = inl.astype(jnp.float32)[:, None]
    nw = jnp.maximum(w.sum(), 1.0)
    mu1 = (X1 * w).sum(0) / nw
    mu2 = (X2 * w).sum(0) / nw
    x1 = (X1 - mu1) * w
    x2 = (X2 - mu2) * w
    cov = x2.T @ x1 / nw
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3) * jnp.array([1, 1, jnp.sign(jnp.linalg.det(U) *
                                               jnp.linalg.det(Vt))])
    R = U @ S @ Vt
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        var1 = (jnp.sum(x1 * x1, -1)).sum() / nw
        s = jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var1, 1e-12)
    t = mu2 - s * R @ mu1
    return s, R, t, inl, counts[best]


@functools.partial(jax.jit, static_argnames=("iters", "chi2_th"))
def mlpnp_refine(K: PinholeK, uv: jnp.ndarray, X: jnp.ndarray,
                 inliers: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray,
                 iters: int = 8, chi2_th: float = 5.991):
    """Maximum-likelihood PnP refinement on bearing vectors.

    The reference relocalizes with MLPnPsolver (src/MLPnPsolver.cpp, used
    by Tracking::Relocalization src/Tracking.cc:5744): residuals live in
    the 2D null space of each observed bearing vector, which is the ML
    formulation for central cameras.  Here that refinement is a fixed
    -iteration Gauss-Newton over se(3), run after `pnp_ransac` on its
    inlier set — batched, jittable, no data-dependent trip counts.

    uv [N,2] pixels, X [N,3] world, inliers [N] bool, (R0,t0) initial
    T_cw.  Returns (R, t, inl, n_inl) with a strict-chi2 re-score.
    """
    # observed bearings and their tangent-plane (null space) bases
    xn = jnp.stack([(uv[:, 0] - K.cx) / K.fx,
                    (uv[:, 1] - K.cy) / K.fy,
                    jnp.ones_like(uv[:, 0])], -1)
    v = xn / jnp.linalg.norm(xn, axis=-1, keepdims=True)       # [N,3]
    # r = normalize(v x e), s = v x r  with e chosen away from v
    e = jnp.where(jnp.abs(v[:, 2:3]) < 0.9,
                  jnp.tile(jnp.array([0.0, 0.0, 1.0]), (v.shape[0], 1)),
                  jnp.tile(jnp.array([1.0, 0.0, 0.0]), (v.shape[0], 1)))
    r = jnp.cross(v, e)
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-9)
    s = jnp.cross(v, r)                                         # [N,3]
    w = inliers.astype(jnp.float32)

    def residual(xi, R, t):
        dR = lie.so3_exp(xi[:3])
        pc = (X @ (dR @ R).T) + (t + xi[3:])
        mu = pc / jnp.maximum(jnp.linalg.norm(pc, axis=-1, keepdims=True),
                              1e-9)
        return jnp.stack([jnp.sum(r * mu, -1), jnp.sum(s * mu, -1)], -1)

    def step(carry, _):
        R, t = carry
        z = jnp.zeros(6)
        res = residual(z, R, t)                                 # [N,2]
        J = jax.jacfwd(residual)(z, R, t)                       # [N,2,6]
        # Huber IRLS on the tangent residual (scaled to ~pixel units)
        rn2 = jnp.sum(res ** 2, -1) * (K.fx * K.fx)
        hub = jnp.where(rn2 > chi2_th,
                        jnp.sqrt(chi2_th / jnp.maximum(rn2, 1e-12)), 1.0)
        ww = (w * hub)[:, None]
        Jf = (J * ww[..., None]).reshape(-1, 6)
        rf = (res * ww).reshape(-1)
        H = Jf.T @ Jf + 1e-8 * jnp.eye(6)
        g = Jf.T @ rf
        xi = -jnp.linalg.solve(H, g)
        dR = lie.so3_exp(xi[:3])
        return (dR @ R, t + xi[3:]), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    pc = X @ R.T + t
    z = jnp.maximum(pc[:, 2], 1e-6)
    pred = jnp.stack([K.fx * pc[:, 0] / z + K.cx,
                      K.fy * pc[:, 1] / z + K.cy], -1)
    chi2 = jnp.sum((pred - uv) ** 2, -1)
    inl = inliers & (chi2 < chi2_th) & (pc[:, 2] > 0.05)
    return R, t, inl, jnp.sum(inl)
