"""Keyframe database: BoW retrieval for relocalization and loop closing.

Re-design of `KeyFrameDatabase` (reference: src/KeyFrameDatabase.cc —
a word->list<KF> inverted file walked per query word, with shared-word
counting, min-score filtering and covisibility-group accumulation in
DetectNBestCandidates :619 / DetectRelocalizationCandidates).  Here the
whole bank of keyframe BoW vectors is one dense [K_cap, W] matrix and a
query is one masked L1-score reduction over all keyframes at once,
followed by the same covisibility-group accumulation on host.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import vocabulary as V


class KeyFrameDatabase:
    def __init__(self, voc: V.Vocabulary, max_kf: int, n_feat: int):
        self.voc = voc
        self.max_kf = max_kf
        self.bows = np.zeros((max_kf, voc.n_words), np.float32)
        self.word_ids = np.full((max_kf, n_feat), -1, np.int32)
        self.present = np.zeros(max_kf, bool)
        self._pipeline = V.make_bow_pipeline(voc, n_feat)
        self._score = jax.jit(lambda v, ws, mask: jnp.where(
            mask, V.l1_score(v, ws), -1.0))

    def add_keyframe(self, kf: int, desc_packed: np.ndarray,
                     valid: np.ndarray) -> np.ndarray:
        """Compute + store the KF's BoW; returns per-feature word ids
        (used for BoW-accelerated matching)."""
        wid, bow = self._pipeline(jnp.asarray(desc_packed), jnp.asarray(valid))
        self.bows[kf] = np.asarray(bow)
        self.word_ids[kf] = np.asarray(wid)
        self.present[kf] = True
        return self.word_ids[kf]

    def remove_keyframe(self, kf: int) -> None:
        self.present[kf] = False
        self.bows[kf] = 0

    def query(self, desc_packed: np.ndarray, valid: np.ndarray,
              exclude: np.ndarray = None, top_n: int = 3,
              min_rel_score: float = 0.75) -> Tuple[np.ndarray, np.ndarray]:
        """Best-matching keyframes for a query frame.

        exclude: bool [max_kf] (e.g. covisible KFs for loop detection —
        reference excludes the connected group).  Returns (kf_ids, scores)
        of up to top_n candidates above min_rel_score * best_score.
        """
        _, bow = self._pipeline(jnp.asarray(desc_packed), jnp.asarray(valid))
        mask = self.present.copy()
        if exclude is not None:
            mask &= ~exclude
        scores = np.asarray(self._score(bow, jnp.asarray(self.bows),
                                        jnp.asarray(mask)))
        order = np.argsort(-scores)[:top_n * 3]
        order = order[scores[order] > 0]
        if len(order) == 0:
            return np.zeros(0, np.int64), np.zeros(0)
        best = scores[order[0]]
        keep = order[scores[order] >= min_rel_score * best][:top_n]
        return keep, scores[keep]

    def query_grouped(self, desc_packed: np.ndarray, valid: np.ndarray,
                      covis: np.ndarray, kf_valid: np.ndarray,
                      exclude: np.ndarray = None, top_n: int = 3):
        """Covisibility-group accumulated scoring (reference
        DetectNBestCandidates: each candidate's score is summed over its
        covisibility group, the best group member is returned)."""
        _, bow = self._pipeline(jnp.asarray(desc_packed), jnp.asarray(valid))
        mask = self.present & kf_valid
        if exclude is not None:
            mask = mask & ~exclude
        scores = np.asarray(self._score(bow, jnp.asarray(self.bows),
                                        jnp.asarray(mask)))
        cands = np.nonzero(scores > 0)[0]
        if len(cands) == 0:
            return np.zeros(0, np.int64), np.zeros(0)
        group_scores = []
        for c in cands:
            group = np.nonzero((covis[c] >= 15) & mask)[0]
            gs = scores[c] + scores[group].sum()
            group_scores.append(gs)
        group_scores = np.asarray(group_scores)
        order = np.argsort(-group_scores)[:top_n]
        return cands[order], group_scores[order]
