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


def _gradients(img: jnp.ndarray, dtype=jnp.bfloat16):
    """Scharr gradients [H,W] -> gx, gy (same shape, zero border).

    ONE conv with 2 output channels instead of two convs, computed in
    bfloat16: the whole image path is HBM-bound, so halving the bytes
    halves the wall time; bf16's ~3 significant digits are plenty for
    gradient thresholds, structure-tensor directions, LBD band
    statistics, and snap centroids (all ratios of like-scaled sums).
    Downstream math that mixes in f32 operands promotes automatically."""
    kx = jnp.array([[-3., 0., 3.], [-10., 0., 10.], [-3., 0., 3.]]) / 32.0
    k2 = jnp.stack([kx, kx.T])[:, None].astype(dtype)    # [2,1,3,3]
    g = jax.lax.conv_general_dilated(
        img.astype(dtype)[None, None], k2, (1, 1), "SAME")[0]
    return g[0], g[1]


def detect_lines(img: jnp.ndarray, max_lines: int = 256,
                 grad_th: float = 12.0, min_cells: int = 3,
                 aniso_th: float = 4.0, angle_tol: float = 0.12,
                 dist_tol: float = 1.5, min_length: float = 12.0,
                 jump_iters: int = 7):
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

    # ONE stacked transpose for the three image-sized fields (three
    # separate cellify passes re-read the image each time), and ANALYTIC
    # per-cell pixel coordinates (an iota needs no [H,W] materialization)
    g3 = jnp.stack([w, gx, gy])
    cell3 = g3[:, :Hc * CELL_PX, :Wc * CELL_PX] \
        .reshape(3, Hc, CELL_PX, Wc, CELL_PX).transpose(0, 1, 3, 2, 4) \
        .reshape(3, C, CELL_PX * CELL_PX)
    # transposes ran at bf16 bytes; the [C,16] cell statistics upcast to
    # f32 so the structure-tensor moments stay exact
    cell3 = cell3.astype(jnp.float32)
    wc_, gxc, gyc = cell3[0], cell3[1], cell3[2]
    cid = jnp.arange(C)
    sub = jnp.arange(CELL_PX * CELL_PX)
    xc = ((cid % Wc)[:, None] * CELL_PX
          + (sub % CELL_PX)[None, :]).astype(jnp.float32)
    yc = ((cid // Wc)[:, None] * CELL_PX
          + (sub // CELL_PX)[None, :]).astype(jnp.float32)

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
    labels = jnp.where(atom, idx, C)       # C = dead label

    neigh_offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                     (0, 1), (1, -1), (1, 0), (1, 1)]

    # the 8-neighbour link predicates are STATIC per frame — precompute
    # them once as 2D rolls (regular shifts vectorize on the VPU; the
    # original per-iteration flat gathers cost ~9 ms/sweep on a v5e,
    # dominating the whole front end)
    def to2d(a):
        return a.reshape(Hc, Wc)

    atom2 = to2d(atom)
    th2 = to2d(theta)
    cx2 = to2d(cx)
    cy2 = to2d(cy)
    dx2 = to2d(dx)
    dy2 = to2d(dy)
    rr = jnp.arange(Hc)[:, None]
    cc = jnp.arange(Wc)[None, :]
    links = []
    for dr, dc in neigh_offsets:
        ok = (rr + dr >= 0) & (rr + dr < Hc) & (cc + dc >= 0) \
            & (cc + dc < Wc)

        def sh(a):
            return jnp.roll(a, (-dr, -dc), (0, 1))

        dth = jnp.abs(th2 - sh(th2)) % jnp.pi
        link = ok & atom2 & sh(atom2) \
            & (jnp.minimum(dth, jnp.pi - dth) < angle_tol)
        ddx = sh(cx2) - cx2
        ddy = sh(cy2) - cy2
        perp_ij = jnp.abs(-dy2 * ddx + dx2 * ddy)
        perp_ji = jnp.abs(-sh(dy2) * ddx + sh(dx2) * ddy)
        links.append(link & (perp_ij < dist_tol) & (perp_ji < dist_tol))

    def propagate(labels):
        lab2 = to2d(labels)
        best = lab2
        for (dr, dc), link in zip(neigh_offsets, links):
            cand = jnp.where(link, jnp.roll(lab2, (-dr, -dc), (0, 1)), C)
            best = jnp.minimum(best, cand)
        best = best.reshape(C)
        # pointer jumping, twice per sweep (label[i] <- label[label[i]]
        # applied to the updated array doubles path compression, so the
        # scan needs ~log2(longest line in cells) sweeps, not O(length))
        best = jnp.minimum(best, jnp.where(
            best < C, labels[jnp.clip(best, 0, C - 1)], C))
        best = jnp.minimum(best, jnp.where(
            best < C, best[jnp.clip(best, 0, C - 1)], C))
        return best

    def scan_body(carry, _):
        return propagate(carry), None

    labels, _ = jax.lax.scan(scan_body, labels, None, length=jump_iters)

    # ---- per-component aggregation ------------------------------------
    # ONE row-scatter for all first-moment sums and one for the central
    # second moments (separate scalar scatter-adds serialize on TPU and
    # were the second-largest cost of the detector after the sweeps)
    lbl = jnp.clip(labels, 0, C)           # component id in [0,C]
    wgt = jnp.where(atom & (labels < C), wsum, 0.0)
    occ = jnp.where(wgt > 0, 1.0, 0.0)
    pay1 = jnp.stack([wgt, wgt * cx, wgt * cy, occ], -1)       # [C,4]
    agg1 = jnp.zeros((C + 1, 4), jnp.float32).at[lbl].add(pay1)
    s_w, s_x, s_y, s_n = agg1[:, 0], agg1[:, 1], agg1[:, 2], agg1[:, 3]
    mx = s_x / jnp.maximum(s_w, 1e-6)
    my = s_y / jnp.maximum(s_w, 1e-6)
    # direction from aggregated structure tensors of member cells
    ex = cx - mx[lbl]
    ey = cy - my[lbl]
    pay2 = jnp.stack([wgt * ex * ex, wgt * ex * ey, wgt * ey * ey],
                     -1) * occ[:, None]                        # [C,3]
    agg2 = jnp.zeros((C + 1, 3), jnp.float32).at[lbl].add(pay2)
    s_xx, s_xy, s_yy = agg2[:, 0], agg2[:, 1], agg2[:, 2]
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
    # exact top_k: measured FASTER than lax.approx_max_k on the axon
    # backend for this shape (8.7 vs 11.0 ms/frame whole-detector)
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
# ED-style detector (reference `extractor==1`: EDLines,
# Thirdparty/line_descriptor/src/ED_Lib/EDLines.cpp): anchors = gradient
# local maxima across the edge normal, then fixed-budget walks along the
# edge direction from each anchor (Edge-Drawing's "smart routing" as a
# vmapped lax.scan), then a total-least-squares line fit over the walked
# points with an RMS-deviation validation gate (the NFA-style line-fit
# check), then overlap NMS.  Pixel-level walks, unlike the cell-cluster
# LSD-like path above — recovers short/curved-adjacent structure the
# cell detector merges away.
# --------------------------------------------------------------------------

def _bilinear(a: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear sample of [H,W] image at float (x, y) batches."""
    H, W = a.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = a[y0, x0]
    v01 = a[y0, x0 + 1]
    v10 = a[y0 + 1, x0]
    v11 = a[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def detect_lines_ed(img: jnp.ndarray, max_lines: int = 256,
                    grad_th: float = 12.0, anchor_th: float = 4.0,
                    n_anchors: int = 512, walk_steps: int = 48,
                    turn_tol: float = 0.45, fit_tol: float = 1.4,
                    min_length: float = 12.0):
    """EDLines-analog detector.  Same return contract as `detect_lines`:
    (ep [L,4], angle [L], length [L], valid [L], (gx, gy))."""
    H, W = img.shape
    gx, gy = _gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = (ys >= 4) & (ys < H - 4) & (xs >= 4) & (xs < W - 4)
    mag = jnp.where(interior, mag, 0.0)

    # ---- anchors: local maxima across the edge normal ------------------
    horiz = jnp.abs(gx) >= jnp.abs(gy)      # vertical-ish edge
    shl = jnp.pad(mag, ((0, 0), (1, 0)))[:, :-1]
    shr = jnp.pad(mag, ((0, 0), (0, 1)))[:, 1:]
    shu = jnp.pad(mag, ((1, 0), (0, 0)))[:-1]
    shd = jnp.pad(mag, ((0, 1), (0, 0)))[1:]
    nms = jnp.where(horiz, (mag > shl) & (mag >= shr),
                    (mag > shu) & (mag >= shd))
    anchor_score = jnp.where(nms & (mag > grad_th + anchor_th), mag, 0.0)
    # spatial spread: one candidate anchor per 8x8 cell, then global top-K
    CB = 8
    Hc, Wc = H // CB, W // CB
    cells = anchor_score[:Hc * CB, :Wc * CB] \
        .reshape(Hc, CB, Wc, CB).transpose(0, 2, 1, 3).reshape(Hc * Wc, CB * CB)
    cell_best = cells.argmax(-1)
    cell_score = jnp.take_along_axis(cells, cell_best[:, None], -1)[:, 0]
    crow = jnp.arange(Hc * Wc) // Wc
    ccol = jnp.arange(Hc * Wc) % Wc
    ax = (ccol * CB + cell_best % CB).astype(jnp.float32)
    ay = (crow * CB + cell_best // CB).astype(jnp.float32)
    top_s, top_i = jax.lax.top_k(cell_score, n_anchors)
    ax = ax[top_i]
    ay = ay[top_i]
    alive0 = top_s > 0.0

    # ---- walks: from each anchor, ±walk_steps along the edge ----------
    def edge_dir(x, y):
        """Unit edge direction (perp to gradient) at float positions."""
        gxx = _bilinear(gx, x, y)
        gyy = _bilinear(gy, x, y)
        n = jnp.sqrt(gxx * gxx + gyy * gyy)
        return jnp.where(n > 1e-6, -gyy / jnp.maximum(n, 1e-6), 1.0), \
            jnp.where(n > 1e-6, gxx / jnp.maximum(n, 1e-6), 0.0)

    dx0, dy0 = edge_dir(ax, ay)

    def walk(sign):
        def step(carry, _):
            x, y, dx, dy, live = carry
            # smart routing: probe straight and ±~25 deg
            c, s = 0.906, 0.423
            cands = [(dx, dy),
                     (c * dx - s * dy, s * dx + c * dy),
                     (c * dx + s * dy, -s * dx + c * dy)]
            mags = jnp.stack([_bilinear(mag, x + cdx, y + cdy)
                              for cdx, cdy in cands])     # [3,A]
            best = mags.argmax(0)
            cdx = jnp.stack([cd[0] for cd in cands])[best, jnp.arange(x.shape[0])]
            cdy = jnp.stack([cd[1] for cd in cands])[best, jnp.arange(x.shape[0])]
            nx_, ny_ = x + cdx, y + cdy
            # realign to the local edge direction (sign-matched)
            ex, ey = edge_dir(nx_, ny_)
            flip = (ex * cdx + ey * cdy) < 0
            ex = jnp.where(flip, -ex, ex)
            ey = jnp.where(flip, -ey, ey)
            # stop on weak gradient or a sharp turn
            m = _bilinear(mag, nx_, ny_)
            turn = ex * dx + ey * dy
            live = live & (m > grad_th) & (turn > jnp.cos(turn_tol + 0.5))
            x = jnp.where(live, nx_, x)
            y = jnp.where(live, ny_, y)
            dx = jnp.where(live, ex, dx)
            dy = jnp.where(live, ey, dy)
            return (x, y, dx, dy, live), (x, y, live)

        init = (ax, ay, sign * dx0, sign * dy0, alive0)
        _, (xs_, ys_, lv) = jax.lax.scan(step, init, None, length=walk_steps)
        return xs_.T, ys_.T, lv.T                     # [A, steps]

    fx, fy, flv = walk(1.0)
    bx, by, blv = walk(-1.0)
    px = jnp.concatenate([bx[:, ::-1], ax[:, None], fx], 1)   # [A, P]
    py = jnp.concatenate([by[:, ::-1], ay[:, None], fy], 1)
    w = jnp.concatenate([blv[:, ::-1], alive0[:, None], flv], 1
                        ).astype(jnp.float32)

    # ---- weighted TLS line fit + validation ----------------------------
    wsum = jnp.maximum(w.sum(1), 1e-6)
    mx = (w * px).sum(1) / wsum
    my = (w * py).sum(1) / wsum
    ux = px - mx[:, None]
    uy = py - my[:, None]
    sxx = (w * ux * ux).sum(1)
    sxy = (w * ux * uy).sum(1)
    syy = (w * uy * uy).sum(1)
    tr = sxx + syy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - (sxx * syy - sxy * sxy), 0.0))
    l1 = tr / 2 + disc
    vx = sxy
    vy = l1 - sxx
    vn = jnp.sqrt(vx * vx + vy * vy)
    vx = jnp.where(vn > 1e-6, vx / jnp.maximum(vn, 1e-6), 1.0)
    vy = jnp.where(vn > 1e-6, vy / jnp.maximum(vn, 1e-6), 0.0)
    proj = ux * vx[:, None] + uy * vy[:, None]
    perp = -ux * vy[:, None] + uy * vx[:, None]
    rms = jnp.sqrt((w * perp * perp).sum(1) / wsum)
    pmin = jnp.where(w > 0, proj, 1e9).min(1)
    pmax = jnp.where(w > 0, proj, -1e9).max(1)
    length = pmax - pmin
    ok = alive0 & (rms < fit_tol) & (length >= min_length) & (wsum >= 8)

    x1 = mx + pmin * vx
    y1 = my + pmin * vy
    x2 = mx + pmax * vx
    y2 = my + pmax * vy
    ang = jnp.arctan2(y2 - y1, x2 - x1) % jnp.pi

    # ---- overlap NMS: suppress shorter near-duplicate segments ---------
    midx = (x1 + x2) / 2
    midy = (y1 + y2) / 2
    dang = jnp.abs(ang[:, None] - ang[None, :]) % jnp.pi
    dang = jnp.minimum(dang, jnp.pi - dang)
    # midpoint of i near the (infinite) line of j AND along j's span
    rx = midx[:, None] - midx[None, :]
    ry = midy[:, None] - midy[None, :]
    perp_ij = jnp.abs(-rx * vy[None, :] + ry * vx[None, :])
    along_ij = jnp.abs(rx * vx[None, :] + ry * vy[None, :])
    dup = (dang < 0.1) & (perp_ij < 2.5) \
        & (along_ij < (length[None, :] + length[:, None]) / 2)
    better = (length[None, :] > length[:, None]) \
        | ((length[None, :] == length[:, None])
           & (jnp.arange(n_anchors)[None, :] < jnp.arange(n_anchors)[:, None]))
    suppressed = (dup & better & ok[None, :]).any(1)
    ok = ok & ~suppressed

    score = jnp.where(ok, length, 0.0)
    top_score, r = jax.lax.top_k(score, max_lines)
    valid = top_score > 0.0
    ep = jnp.stack([x1[r], y1[r], x2[r], y2[r]], -1)
    return ep, ang[r], top_score, valid, (gx, gy)


# --------------------------------------------------------------------------
# LBD-style banded descriptor
# --------------------------------------------------------------------------

N_BANDS = 9
BAND_W = 3          # rows per band (perpendicular direction)
N_ALONG = 16        # samples along the line


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
    # nearest-neighbour sampling: band STATISTICS (mean/std pooled over
    # BAND_W x N_ALONG samples) are insensitive to sub-pixel placement,
    # and bilinear costs 4x the gathers (the front end's hot spot)
    x0 = jnp.clip(jnp.round(sx), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.round(sy), 0, H - 1).astype(jnp.int32)

    # one vector gather of (gx, gy) — half the gather ops of two scalar
    # gathers (gathers are the front end's bottleneck on TPU)
    G = jnp.stack([gx, gy], -1)                           # [H,W,2]
    gs = G[y0, x0]
    gxs = gs[..., 0]
    gys = gs[..., 1]
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


def merge_collinear(ep: jnp.ndarray, valid: jnp.ndarray,
                    angle_tol: float = 0.20, perp_tol: float = 2.5,
                    gap_tol: float = 30.0, iters: int = 8):
    """Merge collinear segment fragments into long segments.

    Detectors fragment long image lines into short pieces whose 2-point
    direction is noisy (a ±1 px endpoint wobble on a 25 px fragment is a
    ~5 deg direction error, which wrecks the interpretation-plane
    triangulation geometry).  Fragments that agree in angle, mutual
    perpendicular offset, and are adjacent along the line (projection
    gap < gap_tol) are unioned (pointer-jumping min-label over the small
    [L,L] adjacency) and refit: direction from the length-weighted
    fragment directions, endpoints = extreme member-endpoint projections.
    The reference gets long segments from LSD's region-grow over the full
    support (src/LSD/lsd.cpp); this is the fixed-shape equivalent.

    Returns (ep, length, valid) with merged children invalidated.
    """
    L = ep.shape[0]
    d = ep[:, 2:] - ep[:, :2]
    seg_len = jnp.sqrt(jnp.sum(d * d, -1))
    dn = d / jnp.maximum(seg_len, 1e-6)[:, None]
    mid = (ep[:, :2] + ep[:, 2:]) / 2
    theta = jnp.arctan2(dn[:, 1], dn[:, 0]) % jnp.pi

    dth = jnp.abs(theta[:, None] - theta[None, :]) % jnp.pi
    dth = jnp.minimum(dth, jnp.pi - dth)
    dm = mid[None, :, :] - mid[:, None, :]                 # [i,j,2]
    # mutual perpendicular offsets of j's midpoint from i's line
    perp_ij = jnp.abs(-dn[:, None, 1] * dm[..., 0]
                      + dn[:, None, 0] * dm[..., 1])
    perp_ji = jnp.abs(-dn[None, :, 1] * dm[..., 0]
                      + dn[None, :, 0] * dm[..., 1])
    # gap along i's direction between the two projection intervals
    along = jnp.abs(dn[:, None, 0] * dm[..., 0]
                    + dn[:, None, 1] * dm[..., 1])
    gap = along - (seg_len[:, None] + seg_len[None, :]) / 2
    # perpendicular tolerance grows with separation: a short fragment's
    # own direction noise (~+-5 deg) displaces a distant neighbour's
    # midpoint off its fitted line even when truly collinear
    ptol = jnp.minimum(perp_tol + 0.09 * along, 6.0)
    link = (dth < angle_tol) & (perp_ij < ptol) & (perp_ji < ptol) \
        & (gap < gap_tol) & valid[:, None] & valid[None, :]

    idx = jnp.arange(L)
    labels = jnp.where(valid, idx, L)

    def step(labels, _):
        cand = jnp.where(link, labels[None, :].repeat(L, 0), L)
        best = jnp.minimum(labels, cand.min(-1))
        best = jnp.minimum(best, jnp.where(
            best < L, labels[jnp.clip(best, 0, L - 1)], L))
        return best, None

    labels, _ = jax.lax.scan(step, labels, None, length=iters)
    lbl = jnp.clip(labels, 0, L)

    # refit per component from the member ENDPOINT scatter: the merged
    # baseline is long, so the principal axis of the endpoint cloud is
    # far more accurate than any fragment's own 2-point direction
    w = jnp.where(valid & (labels < L), seg_len, 0.0)
    acc = jnp.zeros(L + 1, jnp.float32)
    wsum = acc.at[lbl].add(w)
    exs = jnp.stack([ep[:, 0], ep[:, 2]], -1)       # [L,2] endpoint xs
    eys = jnp.stack([ep[:, 1], ep[:, 3]], -1)
    we = (w / 2)[:, None].repeat(2, 1)
    sx = acc.at[lbl].add((we * exs).sum(-1))
    sy = acc.at[lbl].add((we * eys).sum(-1))
    mx = sx / jnp.maximum(wsum, 1e-6)
    my = sy / jnp.maximum(wsum, 1e-6)
    dxs = exs - mx[lbl][:, None]
    dys = eys - my[lbl][:, None]
    sxx = acc.at[lbl].add((we * dxs * dxs).sum(-1))
    sxy = acc.at[lbl].add((we * dxs * dys).sum(-1))
    syy = acc.at[lbl].add((we * dys * dys).sum(-1))
    tr = sxx + syy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - (sxx * syy - sxy ** 2), 0.0))
    lam1 = tr / 2 + disc
    vx = sxy
    vy = lam1 - sxx
    vn = jnp.sqrt(vx * vx + vy * vy)
    # degenerate scatter (single fragment): fall back to its own direction
    own = jnp.concatenate([dn, jnp.zeros((1, 2), dn.dtype)], 0)
    vx = jnp.where(vn > 1e-6, vx / jnp.maximum(vn, 1e-9), own[:, 0])
    vy = jnp.where(vn > 1e-6, vy / jnp.maximum(vn, 1e-9), own[:, 1])
    # extremes of member endpoints projected on the merged direction
    proj_s = (ep[:, 0] - mx[lbl]) * vx[lbl] + (ep[:, 1] - my[lbl]) * vy[lbl]
    proj_e = (ep[:, 2] - mx[lbl]) * vx[lbl] + (ep[:, 3] - my[lbl]) * vy[lbl]
    pmin_c = jnp.minimum(proj_s, proj_e)
    pmax_c = jnp.maximum(proj_s, proj_e)
    big = jnp.full(L + 1, 1e9, jnp.float32)
    pmin = big.at[lbl].min(jnp.where(w > 0, pmin_c, 1e9))
    pmax = (-big).at[lbl].max(jnp.where(w > 0, pmax_c, -1e9))

    is_root = valid & (labels == idx)
    x1 = (mx + pmin * vx)[:L]
    y1 = (my + pmin * vy)[:L]
    x2 = (mx + pmax * vx)[:L]
    y2 = (my + pmax * vy)[:L]
    ep_out = jnp.where(is_root[:, None],
                       jnp.stack([x1, y1, x2, y2], -1), ep)
    len_out = jnp.where(is_root, (pmax - pmin)[:L], 0.0)
    return ep_out, len_out, is_root


def refine_segments(gx: jnp.ndarray, gy: jnp.ndarray, ep: jnp.ndarray,
                    valid: jnp.ndarray, n_samples: int = 32,
                    search_r: float = 2.5, n_search: int = 7):
    """Sub-pixel line refinement: snap sample points along each segment
    to the gradient-magnitude centroid along the segment normal, then
    total-least-squares refit the line through the snapped points.

    This is what buys line triangulation its accuracy: a 2-point segment
    direction needs ~0.2 deg to be usable at SLAM baselines, which only
    a fit over the full edge support can deliver (the reference gets
    this from LSD's region refinement, src/LSD/lsd.cpp `refine`).
    """
    H, W = gx.shape
    L = ep.shape[0]
    d = ep[:, 2:] - ep[:, :2]
    seg_len = jnp.sqrt(jnp.sum(d * d, -1))
    dn = d / jnp.maximum(seg_len, 1e-6)[:, None]
    nrm = jnp.stack([-dn[:, 1], dn[:, 0]], -1)            # unit normal

    t = jnp.linspace(0.05, 0.95, n_samples)               # [S]
    base = ep[:, None, :2] + t[None, :, None] * d[:, None, :]   # [L,S,2]
    off = jnp.linspace(-search_r, search_r, n_search)     # [O]
    pts = base[:, :, None, :] + off[None, None, :, None] * nrm[:, None, None, :]

    # ONE nearest-neighbour gather of (gx, gy) serves both the magnitude
    # weight and the alignment gate (the magnitude feeds a CENTROID over
    # a +-2.5 px window — sub-pixel interpolation of the weight moves
    # the centroid by far less than the snap resolution, while bilinear
    # costs 4 gathers per sample on TPU and was the stage's hot spot)
    xr = jnp.clip(jnp.round(pts[..., 0]), 0, W - 1).astype(jnp.int32)
    yr = jnp.clip(jnp.round(pts[..., 1]), 0, H - 1).astype(jnp.int32)
    G = jnp.stack([gx, gy], -1)
    gs = G[yr, xr]
    gxs = gs[..., 0]
    gys = gs[..., 1]
    gnorm = jnp.sqrt(gxs * gxs + gys * gys)
    m = gnorm                                             # [L,S,O]
    gdot = jnp.abs(gxs * nrm[:, None, None, 0] + gys * nrm[:, None, None, 1])
    align = gdot / jnp.maximum(gnorm, 1e-6)
    w = m * jnp.where(align > 0.85, 1.0, 0.0)
    wsum = w.sum(-1)                                      # [L,S]
    snap = (w * off[None, None, :]).sum(-1) / jnp.maximum(wsum, 1e-6)
    good_s = wsum > 1.0                                   # sample has edge mass
    pref = base + snap[..., None] * nrm[:, None, :]       # snapped points

    # weighted TLS fit over snapped points, two passes: the second
    # rejects samples >1 px off the first fit (texture drawn across the
    # line corrupts individual snaps; a trimmed refit removes them)
    ws0 = jnp.where(good_s, wsum, 0.0)

    def tls(ws):
        W_ = ws.sum(-1)
        mx = (ws * pref[..., 0]).sum(-1) / jnp.maximum(W_, 1e-6)
        my = (ws * pref[..., 1]).sum(-1) / jnp.maximum(W_, 1e-6)
        ux = pref[..., 0] - mx[:, None]
        uy = pref[..., 1] - my[:, None]
        sxx = (ws * ux * ux).sum(-1)
        sxy = (ws * ux * uy).sum(-1)
        syy = (ws * uy * uy).sum(-1)
        tr = sxx + syy
        disc = jnp.sqrt(jnp.maximum(
            tr * tr / 4 - (sxx * syy - sxy ** 2), 0.0))
        lam1 = tr / 2 + disc
        vx = sxy
        vy = lam1 - sxx
        vn = jnp.sqrt(vx * vx + vy * vy)
        vx = jnp.where(vn > 1e-6, vx / jnp.maximum(vn, 1e-9), dn[:, 0])
        vy = jnp.where(vn > 1e-6, vy / jnp.maximum(vn, 1e-9), dn[:, 1])
        return mx, my, vx, vy

    mx, my, vx, vy = tls(ws0)
    resid = jnp.abs(-(vy[:, None]) * (pref[..., 0] - mx[:, None])
                    + vx[:, None] * (pref[..., 1] - my[:, None]))
    ws1 = jnp.where(resid < 1.0, ws0, 0.0)
    enough = ws1.sum(-1) > 0.5 * jnp.maximum(ws0.sum(-1), 1e-6)
    mx, my, vx, vy = tls(jnp.where(enough[:, None], ws1, ws0))
    # project original endpoints on the refit line
    p_s = (ep[:, 0] - mx) * vx + (ep[:, 1] - my) * vy
    p_e = (ep[:, 2] - mx) * vx + (ep[:, 3] - my) * vy
    ep_ref = jnp.stack([mx + p_s * vx, my + p_s * vy,
                        mx + p_e * vx, my + p_e * vy], -1)
    # only trust the refit when most samples found edge support
    n_good = good_s.sum(-1)
    ok = valid & (n_good >= n_samples // 2)
    return jnp.where(ok[:, None], ep_ref, ep)


def extract_lines(img: jnp.ndarray, max_lines: int = 256,
                  detector: int = 0, **kw) -> LineFeatures:
    """Full line front end: detect + merge collinear fragments +
    gradient-snap sub-pixel refit + LBD + line equations.  `detector`
    selects the LSD-like cell detector (0) or the EDLines-like
    anchor-walk detector (1) — the reference's `extractor` YAML flag
    (src/LineExtractor.cc:45-60)."""
    det = detect_lines_ed if detector == 1 else detect_lines
    ep, ang, length, valid, (gx, gy) = det(img, max_lines, **kw)
    ep, length, valid = merge_collinear(ep, valid)
    ep = refine_segments(gx, gy, ep, valid)
    ang = jnp.arctan2(ep[:, 3] - ep[:, 1], ep[:, 2] - ep[:, 0]) % jnp.pi
    desc = lbd_descriptors(gx, gy, ep, valid)
    return LineFeatures(ep=ep, angle=ang, length=length,
                        lineq=line_equation(ep), desc=desc, valid=valid)


def extract_lines_pyramid(img: jnp.ndarray, max_lines: int = 256,
                          detector: int = 0, **kw) -> LineFeatures:
    """2-level line pyramid (reference Lineextractor builds a 2-level
    Gaussian pyramid at scale 2.0 and detects + computes LBD per level,
    src/LineExtractor.cc:45-154): level 1 detects on a 2x-downsampled
    image, catching long / motion-blurred structures whose gradients
    fragment at full resolution, and its LBD samples the coarse
    gradients (scale-robust re-observation under ~1.5-2x zoom).  Level-1
    segments are mapped back to level-0 pixel coords and deduplicated
    against level-0 detections so the mutual-NN ratio tests downstream
    are not poisoned by near-identical duplicates."""
    n1 = max_lines // 4
    n0 = max_lines - n1
    f0 = extract_lines(img, n0, detector, **kw)
    h2 = (img.shape[0] // 2) * 2
    w2 = (img.shape[1] // 2) * 2
    img1 = img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    f1 = extract_lines(img1, n1, detector, **kw)
    # pixel-center mapping: level-1 pixel x covers level-0 [2x, 2x+1]
    ep1 = f1.ep * 2.0 + 0.5
    # dedupe: kill a level-1 segment whose endpoints both lie on some
    # valid level-0 segment's line within 4 px at a matching angle
    a1 = jnp.arctan2(ep1[:, 3] - ep1[:, 1], ep1[:, 2] - ep1[:, 0]) % jnp.pi
    dang = jnp.abs(a1[:, None] - f0.angle[None, :]) % jnp.pi
    dang = jnp.minimum(dang, jnp.pi - dang)
    l0 = f0.lineq                                         # [n0,3]
    d_s = jnp.abs(ep1[:, None, 0] * l0[None, :, 0]
                  + ep1[:, None, 1] * l0[None, :, 1] + l0[None, :, 2])
    d_e = jnp.abs(ep1[:, None, 2] * l0[None, :, 0]
                  + ep1[:, None, 3] * l0[None, :, 1] + l0[None, :, 2])
    dup = (dang < 0.1) & (d_s < 4.0) & (d_e < 4.0) & f0.valid[None, :]
    keep1 = f1.valid & ~jnp.any(dup, axis=1)
    ep = jnp.concatenate([f0.ep, ep1])
    return LineFeatures(
        ep=ep,
        angle=jnp.concatenate([f0.angle, a1]),
        length=jnp.concatenate([f0.length, f1.length * 2.0]),
        lineq=line_equation(ep),
        desc=jnp.concatenate([f0.desc, f1.desc]),
        valid=jnp.concatenate([f0.valid, keep1]))


def make_line_extractor(height: int, width: int, max_lines: int = 256,
                        detector: int = 0, levels: int = 2):
    if levels >= 2:
        @jax.jit
        def run(img):
            return extract_lines_pyramid(img, max_lines, detector=detector)
    else:
        @jax.jit
        def run(img):
            return extract_lines(img, max_lines, detector=detector)
    return run
