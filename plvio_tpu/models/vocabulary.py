"""Binary bag-of-words vocabulary as dense centroid tensors.

Re-design of DBoW2's TemplatedVocabulary (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — a pointer-chasing k-ary
tree walked per descriptor) for the MXU: level l of the tree is one dense
{-1,+1} centroid matrix [k^(l+1), 256]; `transform` descends all N
descriptors through all L levels with batched gathers + dot products
(argmax dot == argmin Hamming for +-1 vectors).  The BowVector is a dense
L1-normalized [n_words] histogram; similarity is the DBoW2 L1 score
s = 1 - 0.5*|v-w|_1 (reference: DBoW2/ScoringObject.cpp:23-65), computed
for ALL stored keyframes at once — the inverted file becomes one masked
matrix reduction.

Both the ORB vocabulary and the line (LBD) vocabulary are instances
(reference: include/ORBVocabulary.h:29-34 — LineVocabulary reuses FORB).

The reference ships pre-trained ORBvoc/LSvoc text files (absent from the
mount); vocabularies here are either trained with on-device binary
k-means (`train`) or deterministic random (`random_vocabulary`) — for
retrieval, a random binary tree still quantizes consistently.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Vocabulary(NamedTuple):
    centroids: tuple      # per level: [k^(l+1), 256] bf16 {-1,+1}
    k: int
    depth: int

    @property
    def n_words(self) -> int:
        return self.k ** self.depth


def random_vocabulary(seed: int = 0, k: int = 10, depth: int = 4) -> Vocabulary:
    rng = np.random.default_rng(seed)
    cents = []
    for l in range(depth):
        n = k ** (l + 1)
        c = rng.choice([-1.0, 1.0], size=(n, 256)).astype(np.float32)
        cents.append(jnp.asarray(c, jnp.bfloat16))
    return Vocabulary(centroids=tuple(cents), k=k, depth=depth)


def train(descs: jnp.ndarray, seed: int = 0, k: int = 10, depth: int = 4,
          iters: int = 6) -> Vocabulary:
    """Hierarchical binary k-means (k-majority) on {-1,+1} descriptors.

    Flat-per-level training: level l clusters all descriptors into k^(l+1)
    cells, constrained to refine the parent assignment (descriptors only
    compete among their parent's k children) — the DBoW2 build recipe,
    vectorized.
    """
    rng = np.random.default_rng(seed)
    N = descs.shape[0]
    descs_f = descs.astype(jnp.float32)
    assign = jnp.zeros(N, jnp.int32)      # parent cell per descriptor
    cents = []
    for l in range(depth):
        n_cells = k ** (l + 1)
        init_idx = rng.choice(N, n_cells, replace=N < n_cells)
        C = descs_f[init_idx]
        for _ in range(iters):
            # children of the descriptor's parent: parent*k .. parent*k+k-1
            child_base = assign * k
            cand = child_base[:, None] + jnp.arange(k)[None, :]
            cand = jnp.clip(cand, 0, n_cells - 1)
            dots = jnp.einsum("nd,nkd->nk", descs_f, C[cand])
            best = jnp.argmax(dots, axis=1)
            new_assign = child_base + best
            # recompute centroids: sign of the mean
            sums = jnp.zeros((n_cells, 256), jnp.float32).at[new_assign].add(descs_f)
            cnt = jnp.zeros(n_cells, jnp.float32).at[new_assign].add(1.0)
            C_new = jnp.where(cnt[:, None] > 0, jnp.sign(sums), C)
            C_new = jnp.where(C_new == 0, 1.0, C_new)
            C = C_new
        assign = new_assign
        cents.append(C.astype(jnp.bfloat16))
    return Vocabulary(centroids=tuple(cents), k=k, depth=depth)


def transform(voc: Vocabulary, descs: jnp.ndarray, valid: jnp.ndarray
              ) -> jnp.ndarray:
    """Descriptors [N,256] {-1,+1} -> word ids [N] int32 (invalid -> -1).

    (reference: TemplatedVocabulary::transform, TemplatedVocabulary.h)
    """
    d = descs.astype(jnp.bfloat16)
    node = jnp.zeros(descs.shape[0], jnp.int32)
    for l in range(voc.depth):
        C = voc.centroids[l]
        n_cells = C.shape[0]
        cand = jnp.clip(node[:, None] * voc.k + jnp.arange(voc.k)[None, :],
                        0, n_cells - 1)
        dots = jnp.einsum("nd,nkd->nk", d.astype(jnp.float32),
                          C[cand].astype(jnp.float32))
        node = jnp.clip(node * voc.k + jnp.argmax(dots, axis=1), 0, n_cells - 1)
    return jnp.where(valid, node, -1).astype(jnp.int32)


def bow_vector(voc: Vocabulary, word_ids: jnp.ndarray) -> jnp.ndarray:
    """Word ids [N] -> L1-normalized dense histogram [n_words]."""
    W = voc.n_words
    ok = word_ids >= 0
    safe = jnp.clip(word_ids, 0, W - 1)
    h = jnp.zeros(W, jnp.float32).at[safe].add(ok.astype(jnp.float32))
    return h / jnp.maximum(h.sum(), 1e-9)


def l1_score(v: jnp.ndarray, ws: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score of query v [W] against a bank ws [K,W]:
    s = 1 - 0.5 |v - w|_1  in [0,1] (reference ScoringObject.cpp:23)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v[None, :] - ws), axis=-1)


def make_bow_pipeline(voc: Vocabulary, n_feat: int):
    """Jitted (descs_packed [N,8]u32, valid [N]) -> (word_ids [N], bow [W])."""
    from ..ops import matching as M

    @jax.jit
    def run(desc_packed, valid):
        d = M.unpack_u32_to_pm1(desc_packed)
        wid = transform(voc, d, valid)
        return wid, bow_vector(voc, wid)

    return run


def save(voc: Vocabulary, path: str) -> None:
    """Persist a vocabulary as packed sign bits (the 11k x 256 {-1,+1}
    centroid tensors compress 32x; analog of the reference's ORBvoc.txt /
    LSvoc.txt files loaded at src/System.cc:83-105)."""
    arrays = {}
    for l, C in enumerate(voc.centroids):
        bits = (np.asarray(C, np.float32) > 0).astype(np.uint8)
        arrays[f"level_{l}"] = np.packbits(bits, axis=-1)
    np.savez_compressed(path, k=voc.k, depth=voc.depth, **arrays)


def load(path: str) -> Vocabulary:
    z = np.load(path)
    k = int(z["k"])
    depth = int(z["depth"])
    cents = []
    for l in range(depth):
        bits = np.unpackbits(z[f"level_{l}"], axis=-1)[:, :256]
        cents.append(jnp.asarray(bits.astype(np.float32) * 2.0 - 1.0,
                                 jnp.bfloat16))
    return Vocabulary(centroids=tuple(cents), k=k, depth=depth)


def default_vocabulary(kind: str = "orb", seed: int = 0) -> Vocabulary:
    """The shipped trained vocabulary (assets/{orb,lbd}voc.npz, built by
    scripts/train_vocab.py) with a deterministic random fallback when the
    asset is absent — mirroring System::System's two-vocabulary load
    (reference src/System.cc:83-105: ORBvoc + LSvoc)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        f"{kind}voc.npz")
    if os.path.exists(path):
        return load(path)
    return random_vocabulary(seed=seed, k=10, depth=4)
