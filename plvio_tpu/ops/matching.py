"""Descriptor matching as batched device ops.

Replaces the reference's per-pair popcount loops
(reference: src/ORBmatcher.cc:2350 DescriptorDistance, the 6
SearchByProjection overloads, SearchByBoW, SearchForInitialization at
src/ORBmatcher.cc:44-2348, and LineMatcher::matchNNR at
src/LineMatcher.cpp:41) with one idea: binary descriptors stored as
{-1,+1} bfloat16 vectors make Hamming distance a matmul —

    dot(a, b) = D - 2 * hamming(a, b)   for D-bit descriptors

so an entire N x M candidate matrix is a single MXU contraction, and all
gating (search windows, scale levels, rotation histogram, ratio tests)
becomes masking on that matrix.  At ORB sizes (1000 x 1000 x 256) this is
~0.5 GFLOP — microseconds on the MXU vs the reference's pointer-chasing
grid walk.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Descriptor width in bits (rBRIEF / LBD are both 256-bit = 32 bytes).
DESC_BITS = 256


def pack_to_pm1(bits: jnp.ndarray) -> jnp.ndarray:
    """{0,1} bit arrays [...,256] -> {-1,+1} bfloat16 for MXU matching."""
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)


def pack_bits_u32(pm1_or_bits: jnp.ndarray) -> jnp.ndarray:
    """[...,256] descriptor ({-1,+1} or {0,1}) -> [...,8] uint32 packed
    (32-byte storage, the reference's cv::Mat descriptor rows)."""
    bits = (pm1_or_bits > 0).astype(jnp.uint32)
    b = bits.reshape(bits.shape[:-1] + (8, 32))
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def unpack_u32_to_pm1(packed: jnp.ndarray) -> jnp.ndarray:
    """[...,8] uint32 -> [...,256] bfloat16 {-1,+1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(packed.shape[:-1] + (256,))
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances via MXU.

    desc_*: [N,256] / [M,256] in {-1,+1} (bfloat16).  Returns [N,M] float32
    distances in [0, 256].
    """
    dot = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    return 0.5 * (DESC_BITS - dot)


def match_nn_ratio(dist: jnp.ndarray, valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                   gate: jnp.ndarray | None = None,
                   max_dist: float = 50.0, ratio: float = 0.9,
                   mutual: bool = True):
    """Nearest-neighbour matching with Lowe ratio test and optional mutual
    cross-check on a precomputed distance matrix.

    dist: [N,M]; gate: optional [N,M] bool of geometrically admissible
    pairs (search windows).  Returns (idx_b [N] int32, ok [N] bool).

    Mirrors the reference's TH_LOW/ratio discipline
    (src/ORBmatcher.cc: bestDist <= TH_LOW && bestDist < ratio*bestDist2)
    and LineMatcher::matchNNR's nnr test (src/LineMatcher.cpp:41).
    """
    BIG = jnp.float32(1e9)
    mask = valid_a[:, None] & valid_b[None, :]
    if gate is not None:
        mask = mask & gate
    d = jnp.where(mask, dist, BIG)

    # NOTE: argmin + masked re-min beats lax.top_k(k=2) ~2x on the axon
    # TPU backend (measured in scripts/profile_scan.py)
    idx1 = jnp.argmin(d, axis=1)
    best1 = jnp.take_along_axis(d, idx1[:, None], axis=1)[:, 0]
    cols = jnp.arange(d.shape[1], dtype=jnp.int32)
    d2 = jnp.where(cols[None, :] == idx1[:, None], BIG, d)
    best2 = jnp.min(d2, axis=1)

    ok = (best1 <= max_dist) & (best1 < ratio * best2)
    if mutual:
        # b's best a must be this a
        idx_back = jnp.argmin(d, axis=0)       # [M]
        ok = ok & (idx_back[idx1] == jnp.arange(d.shape[0]))
    return idx1.astype(jnp.int32), ok


def window_gate(uv_a: jnp.ndarray, uv_b: jnp.ndarray, radius) -> jnp.ndarray:
    """[N,2] predicted positions x [M,2] candidate positions -> bool [N,M]
    of pairs within `radius` (scalar or per-a [N]).  The dense-mask
    equivalent of the reference's 64x48 grid search
    (Frame::GetFeaturesInArea, src/Frame.cc:644-675): at N,M ~ 1000 the
    full matrix is cheaper on TPU than any bucket structure."""
    d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    r = jnp.asarray(radius, jnp.float32)
    r2 = (r ** 2) if r.ndim == 0 else (r[:, None] ** 2)
    return d2 <= r2


def scale_gate(level_a: jnp.ndarray, level_b: jnp.ndarray,
               lo: int = -1, hi: int = 1) -> jnp.ndarray:
    """Octave-compatibility gate: b's level within [a+lo, a+hi]
    (reference: SearchByProjection's nPredictedLevel window)."""
    diff = level_b[None, :] - level_a[:, None]
    return (diff >= lo) & (diff <= hi)


def rotation_histogram_filter(angles_a: jnp.ndarray, angles_b: jnp.ndarray,
                              idx_b: jnp.ndarray, ok: jnp.ndarray,
                              n_bins: int = 30, keep_top: int = 3) -> jnp.ndarray:
    """Keep only matches whose orientation difference falls in the 3 most
    popular histogram bins (reference: ORBmatcher HISTO_LENGTH=30 and
    ComputeThreeMaxima, src/ORBmatcher.cc:1365-1397).

    angles in degrees [0,360).  Returns updated ok mask.
    """
    rot = angles_a - angles_b[idx_b]
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    binw = 360.0 / n_bins
    bins = jnp.clip((rot / binw).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros(n_bins, jnp.int32).at[bins].add(ok.astype(jnp.int32))
    top_vals, top_idx = jax.lax.top_k(hist, keep_top)
    # reference drops bins below 10% of the max bin
    thresh = 0.1 * top_vals[0]
    keep_bin = jnp.zeros(n_bins, bool)
    for k in range(keep_top):
        keep_bin = keep_bin.at[top_idx[k]].set(top_vals[k] >= thresh)
    return ok & keep_bin[bins]


def search_by_projection(uv_pred: jnp.ndarray, valid_pred: jnp.ndarray,
                         desc_pred: jnp.ndarray, level_pred: jnp.ndarray,
                         uv_obs: jnp.ndarray, valid_obs: jnp.ndarray,
                         desc_obs: jnp.ndarray, level_obs: jnp.ndarray,
                         radius: jnp.ndarray, max_dist: float = 50.0,
                         ratio: float = 0.9, mutual: bool = True):
    """The fused projection-search: window gate x scale gate x Hamming NN.

    One call covers the roles of the reference's SearchByProjection
    overloads (frame-vs-lastframe src/ORBmatcher.cc:1962, frame-vs-localmap
    :44, relocalization :2180): callers differ only in how uv_pred/radius
    are produced.  Returns (idx_obs [N], ok [N]).
    """
    dist = hamming_matrix(desc_pred, desc_obs)
    gate = window_gate(uv_pred, uv_obs, radius) & scale_gate(level_pred, level_obs)
    return match_nn_ratio(dist, valid_pred, valid_obs, gate, max_dist, ratio,
                          mutual=mutual)
