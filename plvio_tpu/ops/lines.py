"""Line-segment detection + LBD descriptors as batched device ops.

Re-design of the reference's line front end (reference:
src/LineExtractor.cc wrapping Thirdparty/line_descriptor LSDDetectorC /
EDLines + BinaryDescriptor LBD, SURVEY §2.2): LSD's sequential
region-growing cannot map to the TPU, so detection is reformulated as a
fully parallel fixed-iteration algorithm:

1. gradient field (Scharr), magnitude + orientation;
2. CELL_PX x CELL_PX cell structure tensors -> per-cell dominant edge
   orientation, centroid, anisotropy (a cell is a "line atom" if enough
   edge mass and strongly anisotropic);
3. link neighbouring atoms with consistent orientation AND mutual
   collinearity -> union-find via pointer-jumping label propagation
   (log-depth, fixed iteration budget);
4. per-component weighted least-squares line fit + endpoint extraction by
   scatter-min/max of the projection along the direction;
5. top-K segments by length (static output shape).

The LBD descriptor is a banded gradient-statistics binary code like the
reference's (BinaryDescriptor::compute): sample a rotated grid of
gradients in the line support region, band-pool mean/std of the
projections, compare band-pair statistics with a fixed pattern -> 256
bits, matched with the same Hamming-matmul as ORB.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

CELL_PX = 4


class LineFeatures(NamedTuple):
    ep: jnp.ndarray        # [L,4] (x1,y1,x2,y2) endpoints, image coords
    angle: jnp.ndarray     # [L] direction in [0, pi)
    length: jnp.ndarray    # [L]
    lineq: jnp.ndarray     # [L,3] normalized 2D line equation (a,b,c)
    desc: jnp.ndarray      # [L,256] bfloat16 {-1,+1} LBD
    valid: jnp.ndarray     # [L]


def _gradients(img: jnp.ndarray):
    """Scharr gradients [H,W] -> gx, gy (same shape, zero border)."""
    kx = jnp.array([[-3., 0., 3.], [-10., 0., 10.], [-3., 0., 3.]]) / 32.0
    ky = kx.T
    img4 = img[None, None]
    gx = jax.lax.conv_general_dilated(img4, kx[None, None], (1, 1), "SAME")[0, 0]
    gy = jax.lax.conv_general_dilated(img4, ky[None, None], (1, 1), "SAME")[0, 0]
    return gx, gy


def detect_lines(img: jnp.ndarray, max_lines: int = 256,
                 grad_th: float = 12.0, min_cells: int = 3,
                 aniso_th: float = 4.0, angle_tol: float = 0.12,
                 dist_tol: float = 1.5, min_length: float = 12.0,
                 jump_iters: int = 12):
    """Detect up to `max_lines` segments.  Returns (ep [L,4], angle [L],
    length [L], valid [L]) plus the gradient field for the descriptor.
    """
    H, W = img.shape
    Hc, Wc = H // CELL_PX, W // CELL_PX
    C = Hc * Wc
    gx, gy = _gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # zero-padded conv creates phantom edges at the border — mask it
    ys = jnp.arange(H)[:, None]
    xs_ = jnp.arange(W)[None, :]
    interior = (ys >= 3) & (ys < H - 3) & (xs_ >= 3) & (xs_ < W - 3)
    mag = jnp.where(interior, mag, 0.0)
    edge = mag > grad_th
    w = jnp.where(edge, mag, 0.0)

    def cellify(a):
        return a[:Hc * CELL_PX, :Wc * CELL_PX] \
            .reshape(Hc, CELL_PX, Wc, CELL_PX).transpose(0, 2, 1, 3) \
            .reshape(C, CELL_PX * CELL_PX)

    wc_ = cellify(w)
    gxc = cellify(gx)
    gyc = cellify(gy)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    xc = cellify(xs)
    yc = cellify(ys)

    wsum = wc_.sum(-1)
    cnt = (wc_ > 0).sum(-1)
    cx = (wc_ * xc).sum(-1) / jnp.maximum(wsum, 1e-6)
    cy = (wc_ * yc).sum(-1) / jnp.maximum(wsum, 1e-6)
    # structure tensor of gradients (weighted)
    sxx = (wc_ * gxc * gxc).sum(-1)
    sxy = (wc_ * gxc * gyc).sum(-1)
    syy = (wc_ * gyc * gyc).sum(-1)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    l1 = tr / 2 + disc
    l2 = tr / 2 - disc
    aniso = l1 / jnp.maximum(l2, 1e-6)
    # gradient dominant direction (normal of the line) -> line direction
    # is perpendicular: theta = angle of eigenvector of l1, rotated 90deg
    nx = sxy
    ny = l1 - sxx
    nn = jnp.sqrt(nx * nx + ny * ny)
    nx = jnp.where(nn > 1e-6, nx / nn, 1.0)
    ny = jnp.where(nn > 1e-6, ny / nn, 0.0)
    dx, dy = -ny, nx                       # line direction (unit)
    theta = jnp.arctan2(dy, dx) % jnp.pi

    atom = (cnt >= min_cells) & (aniso > aniso_th) & (wsum > grad_th * min_cells)

    # ---- adjacency + pointer-jumping union find -----------------------
    def ang_close(t1, t2):
        d = jnp.abs(t1 - t2) % jnp.pi
        return jnp.minimum(d, jnp.pi - d) < angle_tol

    idx = jnp.arange(C)
    row = idx // Wc
    col = idx % Wc
    labels = jnp.where(atom, idx, C)       # C = dead label

    neigh_offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                     (0, 1), (1, -1), (1, 0), (1, 1)]

    def neighbor_label(labels, dr, dc):
        r2 = row + dr
        c2 = col + dc
        ok = (r2 >= 0) & (r2 < Hc) & (c2 >= 0) & (c2 < Wc)
        j = jnp.clip(r2 * Wc + c2, 0, C - 1)
        link = ok & atom & atom[j] & ang_close(theta, theta[j])
        # mutual collinearity: each centroid near the other's line
        ddx = cx[j] - cx
        ddy = cy[j] - cy
        perp_ij = jnp.abs(-dy * ddx + dx * ddy)          # dist to i's line
        perp_ji = jnp.abs(-dy[j] * ddx + dx[j] * ddy)
        link = link & (perp_ij < dist_tol) & (perp_ji < dist_tol)
        return jnp.where(link, labels[j], C)

    def propagate(_, labels):
        best = labels
        for dr, dc in neigh_offsets:
            best = jnp.minimum(best, neighbor_label(labels, dr, dc))
        # pointer jumping
        best = jnp.minimum(best, jnp.where(best < C, labels[jnp.clip(best, 0, C - 1)], C))
        return best

    def scan_body(carry, _):
        return propagate(0, carry), None

    labels, _ = jax.lax.scan(scan_body, labels, None, length=jump_iters)

    # ---- per-component aggregation ------------------------------------
    lbl = jnp.clip(labels, 0, C)           # component id in [0,C]
    wgt = jnp.where(atom & (labels < C), wsum, 0.0)
    seg = jnp.zeros(C + 1, jnp.float32)
    s_w = seg.at[lbl].add(wgt)
    s_x = seg.at[lbl].add(wgt * cx)
    s_y = seg.at[lbl].add(wgt * cy)
    s_n = seg.at[lbl].add(jnp.where(wgt > 0, 1.0, 0.0))
    mx = s_x / jnp.maximum(s_w, 1e-6)
    my = s_y / jnp.maximum(s_w, 1e-6)
    # direction from aggregated structure tensors of member cells
    s_xx = seg.at[lbl].add(jnp.where(wgt > 0, wgt * (cx - mx[lbl]) ** 2, 0.0))
    s_xy = seg.at[lbl].add(jnp.where(wgt > 0, wgt * (cx - mx[lbl]) * (cy - my[lbl]), 0.0))
    s_yy = seg.at[lbl].add(jnp.where(wgt > 0, wgt * (cy - my[lbl]) ** 2, 0.0))
    tr2 = s_xx + s_yy
    disc2 = jnp.sqrt(jnp.maximum(tr2 * tr2 / 4 - (s_xx * s_yy - s_xy ** 2), 0.0))
    lam1 = tr2 / 2 + disc2
    vx = s_xy
    vy = lam1 - s_xx
    vn = jnp.sqrt(vx * vx + vy * vy)
    vx = jnp.where(vn > 1e-6, vx / vn, 1.0)
    vy = jnp.where(vn > 1e-6, vy / vn, 0.0)

    # endpoints: min/max projection of member centroids on the direction
    proj = (cx - mx[lbl]) * vx[lbl] + (cy - my[lbl]) * vy[lbl]
    proj = jnp.where(wgt > 0, proj, 0.0)
    big = jnp.full(C + 1, 1e9, jnp.float32)
    pmin = big.at[lbl].min(jnp.where(wgt > 0, proj, 1e9))
    pmax = (-big).at[lbl].max(jnp.where(wgt > 0, proj, -1e9))

    # collect component roots
    is_root = (labels == idx) & atom
    length = jnp.where(is_root, (pmax[idx] - pmin[idx]), 0.0)
    good_root = is_root & (s_n[idx] >= min_cells) & (length >= min_length)

    score = jnp.where(good_root, length, 0.0)
    top_score, top_idx = jax.lax.top_k(score, max_lines)
    valid = top_score > 0.0
    r = top_idx
    x1 = mx[r] + pmin[r] * vx[r]
    y1 = my[r] + pmin[r] * vy[r]
    x2 = mx[r] + pmax[r] * vx[r]
    y2 = my[r] + pmax[r] * vy[r]
    ep = jnp.stack([x1, y1, x2, y2], -1)
    ang = jnp.arctan2(y2 - y1, x2 - x1) % jnp.pi
    return ep, ang, top_score, valid, (gx, gy)


# --------------------------------------------------------------------------
# LBD-style banded descriptor
# --------------------------------------------------------------------------

N_BANDS = 9
BAND_W = 3          # rows per band (perpendicular direction)
N_ALONG = 24        # samples along the line


@functools.lru_cache()
def _band_pair_pattern(seed: int = 11, bits: int = 256) -> np.ndarray:
    """[bits, 2, 2]: pairs of (band, stat) indices to compare.  stats are
    the 8 per-band values (mean/std of 4 gradient projections)."""
    rng = np.random.default_rng(seed)
    pat = np.stack([rng.integers(0, N_BANDS, (bits, 2)),
                    rng.integers(0, 8, (bits, 2))], axis=-1)
    # ensure the two sides differ
    same = (pat[:, 0, 0] == pat[:, 1, 0]) & (pat[:, 0, 1] == pat[:, 1, 1])
    pat[same, 1, 0] = (pat[same, 1, 0] + 1) % N_BANDS
    return pat.astype(np.int32)


def lbd_descriptors(gx: jnp.ndarray, gy: jnp.ndarray, ep: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """[L,4] endpoints -> [L,256] bfloat16 {-1,+1} descriptors."""
    H, W = gx.shape
    x1, y1, x2, y2 = ep[:, 0], ep[:, 1], ep[:, 2], ep[:, 3]
    mxm = (x1 + x2) / 2
    mym = (y1 + y2) / 2
    dx = x2 - x1
    dy = y2 - y1
    length = jnp.sqrt(dx * dx + dy * dy)
    ux = dx / jnp.maximum(length, 1e-6)
    uy = dy / jnp.maximum(length, 1e-6)
    # normal
    nx_, ny_ = -uy, ux

    t_along = jnp.linspace(-0.5, 0.5, N_ALONG)
    half = (N_BANDS * BAND_W - 1) / 2.0
    t_perp = jnp.arange(N_BANDS * BAND_W, dtype=jnp.float32) - half

    # sample grid [L, n_perp, n_along]
    sx = (mxm[:, None, None]
          + ux[:, None, None] * (t_along[None, None, :] * length[:, None, None])
          + nx_[:, None, None] * t_perp[None, :, None])
    sy = (mym[:, None, None]
          + uy[:, None, None] * (t_along[None, None, :] * length[:, None, None])
          + ny_[:, None, None] * t_perp[None, :, None])
    xi = jnp.clip(sx, 0, W - 2)
    yi = jnp.clip(sy, 0, H - 2)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    fx = xi - x0
    fy = yi - y0

    def samp(img):
        v00 = img[y0, x0]
        v01 = img[y0, x0 + 1]
        v10 = img[y0 + 1, x0]
        v11 = img[y0 + 1, x0 + 1]
        return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
                + v10 * (1 - fx) * fy + v11 * fx * fy)

    gxs = samp(gx)
    gys = samp(gy)
    # gradient projections in the line frame
    g_par = gxs * ux[:, None, None] + gys * uy[:, None, None]
    g_perp = gxs * nx_[:, None, None] + gys * ny_[:, None, None]
    gp_pos = jnp.maximum(g_perp, 0.0)
    gp_neg = jnp.maximum(-g_perp, 0.0)
    gl_pos = jnp.maximum(g_par, 0.0)
    gl_neg = jnp.maximum(-g_par, 0.0)
    feats = jnp.stack([gp_pos, gp_neg, gl_pos, gl_neg], -1)  # [L,P,A,4]
    L = ep.shape[0]
    bands = feats.reshape(L, N_BANDS, BAND_W, N_ALONG, 4)
    mean = bands.mean(axis=(2, 3))                            # [L,9,4]
    std = bands.std(axis=(2, 3))
    stats = jnp.concatenate([mean, std], -1)                  # [L,9,8]

    pat = jnp.asarray(_band_pair_pattern())
    a = stats[:, pat[:, 0, 0], pat[:, 0, 1]]
    b = stats[:, pat[:, 1, 0], pat[:, 1, 1]]
    bits = a > b
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)


def line_equation(ep: jnp.ndarray) -> jnp.ndarray:
    """[L,4] -> normalized homogeneous line eq (a,b,c), |(a,b)|=1
    (reference: per-line `l = sp x ep / ||n||`, src/LineExtractor.cc:140)."""
    sp = jnp.concatenate([ep[:, :2], jnp.ones_like(ep[:, :1])], -1)
    e = jnp.concatenate([ep[:, 2:], jnp.ones_like(ep[:, :1])], -1)
    l = jnp.cross(sp, e)
    n = jnp.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2)
    return l / jnp.maximum(n, 1e-9)[:, None]


def extract_lines(img: jnp.ndarray, max_lines: int = 256,
                  **kw) -> LineFeatures:
    """Full line front end: detect + LBD + line equations."""
    ep, ang, length, valid, (gx, gy) = detect_lines(img, max_lines, **kw)
    desc = lbd_descriptors(gx, gy, ep, valid)
    return LineFeatures(ep=ep, angle=ang, length=length,
                        lineq=line_equation(ep), desc=desc, valid=valid)


def make_line_extractor(height: int, width: int, max_lines: int = 256):
    @jax.jit
    def run(img):
        return extract_lines(img, max_lines)
    return run
