"""Two-view reconstruction: vmapped RANSAC H/F, motion recovery, DLT.

Re-design of `TwoViewReconstruction` (reference:
src/TwoViewReconstruction.cc — threaded H & F RANSAC, model selection by
score ratio, 8-motion-hypothesis check) with fixed-iteration vmapped
hypothesis evaluation: all minimal sets are solved and scored as one
batched SVD + one dense residual matrix, so the "parallel threads" of the
reference become array axes.

All functions take undistorted pixel coordinates and a PinholeK.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..solver.residuals import PinholeK
from ..utils import lie


class TwoViewResult(NamedTuple):
    success: jnp.ndarray      # bool
    R: jnp.ndarray            # [3,3] camera2-from-camera1
    t: jnp.ndarray            # [3] unit norm
    points3d: jnp.ndarray     # [N,3] in camera1 frame
    is_triangulated: jnp.ndarray  # [N] bool
    used_homography: jnp.ndarray  # bool


def _normalize_pixels(K: PinholeK, uv: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([(uv[..., 0] - K.cx) / K.fx,
                      (uv[..., 1] - K.cy) / K.fy], axis=-1)


def _sample_indices(key, valid: jnp.ndarray, iters: int, k: int) -> jnp.ndarray:
    """[iters,k] indices drawn (approximately without replacement) from the
    valid set, fixed shape."""
    n = valid.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    keys = jax.random.split(key, iters)
    def draw(k_):
        return jax.random.choice(k_, n, shape=(k,), replace=False, p=p)
    return jax.vmap(draw)(keys)


def _dlt_homography(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """4-point DLT: x1,x2 [4,2] -> H [3,3] with x2 ~ H x1."""
    def rows(p, q):
        x, y = p
        u, v = q
        r1 = jnp.array([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        r2 = jnp.array([0, 0, 0, -x, -y, -1, v * x, v * y, v])
        return jnp.stack([r1, r2])
    A = jnp.concatenate([rows(x1[i], x2[i]) for i in range(4)])
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[-1].reshape(3, 3)


def _eight_point_F(x1: jnp.ndarray, x2: jnp.ndarray,
                   w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized 8-point algorithm: [M,2]x2 -> F [3,3], rank-2 enforced.
    Optional per-row weights (0 rows are ignored) allow least-squares
    refit over all RANSAC inliers with static shapes."""
    if w is None:
        w = jnp.ones(x1.shape[0], x1.dtype)
    wn = w / jnp.maximum(w.sum(), 1e-9)

    def hartley(x):
        mu = (x * wn[:, None]).sum(0)
        d = (jnp.sqrt(jnp.sum((x - mu) ** 2, -1)) * wn).sum()
        s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
        T = jnp.array([[s, 0, -s * mu[0]], [0, s, -s * mu[1]], [0, 0, 1.0]])
        xn = (x - mu) * s
        return xn, T
    x1n, T1 = hartley(x1)
    x2n, T2 = hartley(x2)
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1,
                   jnp.ones_like(u1)], axis=1) * w[:, None]
    _, _, Vt = jnp.linalg.svd(A)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    F = U @ jnp.diag(S.at[2].set(0.0)) @ Vt2
    return T2.T @ F @ T1


def _dlt_homography_w(x1: jnp.ndarray, x2: jnp.ndarray,
                      w: jnp.ndarray) -> jnp.ndarray:
    """Weighted DLT homography over all inliers (refit), [M,2] inputs."""
    x, y = x1[:, 0], x1[:, 1]
    u, v = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], 1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], 1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[-1].reshape(3, 3)


def _homog(uv):
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)


def score_F(F: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray,
            valid: jnp.ndarray, sigma: float = 1.0):
    """Symmetric epipolar scoring (reference CheckFundamental,
    src/TwoViewReconstruction.cc): robust score sum + inlier mask."""
    th, th_score = 3.841, 5.991
    x1, x2 = _homog(uv1), _homog(uv2)
    l2 = x1 @ F.T                       # epipolar line in image 2
    l1 = x2 @ F
    d2 = jnp.sum(l2 * x2, -1) ** 2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = jnp.sum(l1 * x1, -1) ** 2 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    inv_s2 = 1.0 / sigma ** 2
    c1, c2 = d1 * inv_s2, d2 * inv_s2
    ok = (c1 < th) & (c2 < th) & valid
    score = jnp.sum(jnp.where(valid & (c1 < th), th_score - c1, 0.0)
                    + jnp.where(valid & (c2 < th), th_score - c2, 0.0))
    return score, ok


def score_H(H: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray,
            valid: jnp.ndarray, sigma: float = 1.0):
    """Symmetric transfer scoring (reference CheckHomography)."""
    th = 5.991
    Hinv = jnp.linalg.inv(H)
    x1, x2 = _homog(uv1), _homog(uv2)
    p2 = x1 @ H.T
    p2 = p2[:, :2] / jnp.where(jnp.abs(p2[:, 2:3]) < 1e-9, 1e-9, p2[:, 2:3])
    p1 = x2 @ Hinv.T
    p1 = p1[:, :2] / jnp.where(jnp.abs(p1[:, 2:3]) < 1e-9, 1e-9, p1[:, 2:3])
    inv_s2 = 1.0 / sigma ** 2
    c1 = jnp.sum((p1 - uv1) ** 2, -1) * inv_s2
    c2 = jnp.sum((p2 - uv2) ** 2, -1) * inv_s2
    ok = (c1 < th) & (c2 < th) & valid
    score = jnp.sum(jnp.where(valid & (c1 < th), th - c1, 0.0)
                    + jnp.where(valid & (c2 < th), th - c2, 0.0))
    return score, ok


def triangulate_dlt(R: jnp.ndarray, t: jnp.ndarray, x1n: jnp.ndarray,
                    x2n: jnp.ndarray) -> jnp.ndarray:
    """Batched DLT with P1=[I|0], P2=[R|t] on normalized coords [N,2]
    (reference Triangulate, src/TwoViewReconstruction.cc)."""
    P2 = jnp.concatenate([R, t[:, None]], axis=1)    # [3,4]
    I0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def one(a, b):
        A = jnp.stack([
            a[0] * I0[2] - I0[0],
            a[1] * I0[2] - I0[1],
            b[0] * P2[2] - P2[0],
            b[1] * P2[2] - P2[1]])
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(x1n, x2n)


def _check_rt(R, t, x1n, x2n, inliers, min_parallax_cos=0.99998):
    """Count points with positive depth in both views and decent parallax;
    returns (count, good mask, points3d)."""
    X = triangulate_dlt(R, t, x1n, x2n)
    z1 = X[:, 2]
    X2 = (R @ X.T).T + t
    z2 = X2[:, 2]
    # parallax between rays
    r1 = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-12)
    C2 = -R.T @ t
    d2 = X - C2
    r2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=-1, keepdims=True), 1e-12)
    cosp = jnp.sum(r1 * r2, -1)
    finite = jnp.all(jnp.isfinite(X), -1)
    good = inliers & finite & (z1 > 0) & (z2 > 0) & (cosp < min_parallax_cos)
    # reprojection sanity on normalized coords
    e1 = jnp.sum((X[:, :2] / jnp.maximum(z1[:, None], 1e-9) - x1n) ** 2, -1)
    e2 = jnp.sum((X2[:, :2] / jnp.maximum(z2[:, None], 1e-9) - x2n) ** 2, -1)
    good = good & (e1 < 1e-4) & (e2 < 1e-4)
    return jnp.sum(good), good, X


def recover_from_E(E, x1n, x2n, inliers):
    """4-hypothesis cheirality test (reference ReconstructF -> CheckRT)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0., -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tt = U[:, 2]
    cands = [(R1, tt), (R1, -tt), (R2, tt), (R2, -tt)]
    counts, goods, Xs = [], [], []
    for R, t in cands:
        c, g, X = _check_rt(R, t, x1n, x2n, inliers)
        counts.append(c)
        goods.append(g)
        Xs.append(X)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    n_best = counts[best]
    # require a clear winner (reference: nsimilar<=1 && best>0.9*total)
    second = jnp.sort(counts)[-2]
    ok = (n_best > 0.75 * jnp.maximum(jnp.sum(inliers), 1)) & \
         (second < 0.7 * n_best) & (n_best >= 8)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    Xb = jnp.stack(Xs)[best]
    gb = jnp.stack(goods)[best]
    return ok, Rb, tb, Xb, gb


def recover_from_H(Hn, x1n, x2n, inliers):
    """Faugeras SVD decomposition of a calibrated homography -> 8 motion
    hypotheses -> cheirality test (reference ReconstructH,
    src/TwoViewReconstruction.cc)."""
    U, S, Vt = jnp.linalg.svd(Hn)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = S[0], S[1], S[2]
    # x1/x3 terms
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cands = []
    for i in range(4):
        st = jnp.where(x1s[i] * x3s[i] >= 0, sin_t, -sin_t) * jnp.sign(x1s[i] * x3s[i] + 1e-30)
        # epsilon signs: st has sign eps1*eps3
        eps13 = jnp.sign(x1s[i]) * jnp.sign(x3s[i])
        st = eps13 * sin_t
        Rp = jnp.array([[cos_t, 0., -st], [0., 1., 0.], [st, 0., cos_t]])
        R = s * U @ Rp @ Vt
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        t = U @ tp
        cands.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))
    # case d' < 0
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        eps13 = jnp.sign(x1s[i]) * jnp.sign(x3s[i])
        sp = eps13 * sin_p
        Rp = jnp.array([[cos_p, 0., sp], [0., -1., 0.], [sp, 0., -cos_p]])
        R = s * U @ Rp @ Vt
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        t = U @ tp
        cands.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))

    counts, goods, Xs = [], [], []
    for R, t in cands:
        c, g, X = _check_rt(R, t, x1n, x2n, inliers)
        counts.append(c)
        goods.append(g)
        Xs.append(X)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    n_best = counts[best]
    second = jnp.sort(counts)[-2]
    ok = (n_best > 0.75 * jnp.maximum(jnp.sum(inliers), 1)) & \
         (second < 0.75 * n_best) & (n_best >= 8)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    return ok, Rb, tb, jnp.stack(Xs)[best], jnp.stack(goods)[best]


def reconstruct_two_views(K: PinholeK, uv1: jnp.ndarray, uv2: jnp.ndarray,
                          valid: jnp.ndarray, key,
                          iters: int = 200) -> TwoViewResult:
    """Full two-view bootstrap (reference:
    Pinhole::ReconstructWithTwoViews -> TwoViewReconstruction::Reconstruct).

    uv1/uv2: [N,2] undistorted pixel matches; valid: [N].
    """
    kH, kF = jax.random.split(key)
    idxH = _sample_indices(kH, valid, iters, 4)
    idxF = _sample_indices(kF, valid, iters, 8)

    Hs = jax.vmap(lambda i: _dlt_homography(uv1[i], uv2[i]))(idxH)
    Fs = jax.vmap(lambda i: _eight_point_F(uv1[i], uv2[i]))(idxF)

    sH, okH = jax.vmap(lambda H: score_H(H, uv1, uv2, valid))(Hs)
    sF, okF = jax.vmap(lambda F: score_F(F, uv1, uv2, valid))(Fs)

    bH = jnp.argmax(sH)
    bF = jnp.argmax(sF)
    Hbest, Fbest = Hs[bH], Fs[bF]
    inlH, inlF = okH[bH], okF[bF]

    # least-squares refit on all inliers (masked rows), then re-score —
    # minimal-set models have a few degrees of direction error at 0.3 px
    # noise; the refit recovers it (reference refines via the init GBA)
    Fbest = _eight_point_F(uv1, uv2, inlF.astype(jnp.float32))
    Hbest = _dlt_homography_w(uv1, uv2, inlH.astype(jnp.float32))
    SF, inlF = score_F(Fbest, uv1, uv2, valid)
    SH, inlH = score_H(Hbest, uv1, uv2, valid)

    ratio = SH / jnp.maximum(SH + SF, 1e-9)
    # On an exact plane both models fit and the ratio sits just under 0.5
    # (line-distance residuals are smaller than transfer residuals at equal
    # noise), so bias ties toward H; general scenes give ratio << 0.45.
    # (reference: RH>0.50, src/TwoViewReconstruction.cc Reconstruct)
    use_H = ratio > 0.45

    x1n = _normalize_pixels(K, uv1)
    x2n = _normalize_pixels(K, uv2)
    Km = jnp.array([[K.fx, 0, K.cx], [0, K.fy, K.cy], [0, 0, 1.0]])
    E = Km.T @ Fbest @ Km
    Hn = jnp.linalg.inv(Km) @ Hbest @ Km

    okE, RE, tE, XE, gE = recover_from_E(E, x1n, x2n, inlF)
    okHm, RH, tH, XH, gH = recover_from_H(Hn, x1n, x2n, inlH)

    ok = jnp.where(use_H, okHm, okE)
    R = jnp.where(use_H, RH, RE)
    t = jnp.where(use_H, tH, tE)
    X = jnp.where(use_H, XH, XE)
    g = jnp.where(use_H, gH, gE)
    return TwoViewResult(success=ok, R=R, t=t, points3d=X,
                         is_triangulated=g, used_homography=use_H)
