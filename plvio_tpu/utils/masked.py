"""Helpers for the fixed-shape/masked-array discipline.

The whole engine keeps dynamic collections (keypoints, matches, map
points, keyframes) in fixed-capacity arrays with validity masks.  These
helpers centralise the common padding / top-k / compaction patterns so
downstream code stays readable and shape-static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel index used for "no entry" slots in index tables.  Gathers with
# this index are valid (clipped) but must be masked out by the caller.
INVALID = -1


def topk_mask(scores: jnp.ndarray, k: int, valid: jnp.ndarray | None = None):
    """Return (indices [k], mask [k]) of the top-k scoring valid entries.

    Invalid entries are pushed to -inf; if fewer than k are valid the tail
    of the result is masked out.
    """
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(scores, k)
    return idx, jnp.isfinite(vals)


def compact_indices(mask: jnp.ndarray, capacity: int):
    """Pack the indices of True entries to the front of a length-`capacity`
    int32 array (INVALID-padded), with a mask of which outputs are live.

    Static-shape analog of `np.nonzero`.
    """
    n = mask.shape[0]
    order = jnp.argsort(~mask, stable=True)  # True (0) entries first
    count = jnp.sum(mask)
    take = order[:capacity]
    out_mask = jnp.arange(capacity) < count
    return jnp.where(out_mask, take, INVALID), out_mask


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-9):
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), eps)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray):
    """Median of valid entries of a 1-D array (static shape)."""
    n = x.shape[0]
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big)
    cnt = jnp.sum(mask)
    lo = jnp.maximum((cnt - 1) // 2, 0)
    hi = jnp.maximum(cnt // 2, 0)
    return 0.5 * (s[lo] + s[hi])


def scatter_min_index(target_size: int, idx: jnp.ndarray, scores: jnp.ndarray,
                      payload: jnp.ndarray, valid: jnp.ndarray):
    """For each bucket b in [0, target_size): payload of the min-score valid
    entry with idx==b, plus a hit mask.  Used for mutual-NN / grid binning.

    Returns (best_payload [target_size], best_score [target_size], hit [target_size]).
    """
    INF = jnp.inf
    init = jnp.full((target_size,), INF, dtype=scores.dtype)
    safe_idx = jnp.where(valid, idx, 0)
    sc = jnp.where(valid, scores, INF)
    best = init.at[safe_idx].min(sc, mode="drop")
    hit = best < INF
    # second pass: find which entry achieved the min (first match wins)
    is_best = valid & (sc == best[safe_idx])
    pay = jnp.full((target_size,), INVALID, dtype=payload.dtype)
    pay = pay.at[safe_idx].max(jnp.where(is_best, payload, INVALID), mode="drop")
    return pay, best, hit
