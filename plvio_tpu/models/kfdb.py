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
    """With `line_voc` given, a second LBD-word bank is kept and query
    scores mix the two modalities, s = s_orb + LINE_W * s_lbd — the
    fork's LSvoc line vocabulary actually contributing to retrieval
    (reference include/ORBVocabulary.h:29-34, loaded src/System.cc:97)."""

    LINE_W = 0.3

    def __init__(self, voc: V.Vocabulary, max_kf: int, n_feat: int,
                 line_voc: V.Vocabulary = None, n_line_feat: int = 0):
        self.voc = voc
        self.max_kf = max_kf
        self.bows = np.zeros((max_kf, voc.n_words), np.float32)
        self.word_ids = np.full((max_kf, n_feat), -1, np.int32)
        self.present = np.zeros(max_kf, bool)
        self._pipeline = V.make_bow_pipeline(voc, n_feat)
        self._score = jax.jit(lambda v, ws, mask: jnp.where(
            mask, V.l1_score(v, ws), -1.0))
        self.line_voc = line_voc
        if line_voc is not None:
            self.bows_l = np.zeros((max_kf, line_voc.n_words), np.float32)
            self.has_lines = np.zeros(max_kf, bool)
            self._pipeline_l = V.make_bow_pipeline(line_voc, n_line_feat)

    def add_keyframe(self, kf: int, desc_packed: np.ndarray,
                     valid: np.ndarray, line_desc: np.ndarray = None,
                     line_valid: np.ndarray = None) -> np.ndarray:
        """Compute + store the KF's BoW; returns per-feature word ids
        (used for BoW-accelerated matching)."""
        wid, bow = self._pipeline(jnp.asarray(desc_packed), jnp.asarray(valid))
        self.bows[kf] = np.asarray(bow)
        self.word_ids[kf] = np.asarray(wid)
        self.present[kf] = True
        if self.line_voc is not None and line_desc is not None \
                and line_valid is not None and line_valid.sum() >= 5:
            _, bow_l = self._pipeline_l(jnp.asarray(line_desc),
                                        jnp.asarray(line_valid))
            self.bows_l[kf] = np.asarray(bow_l)
            self.has_lines[kf] = True
        return self.word_ids[kf]

    def remove_keyframe(self, kf: int) -> None:
        self.present[kf] = False
        self.bows[kf] = 0
        if self.line_voc is not None:
            self.bows_l[kf] = 0
            self.has_lines[kf] = False

    def _combined_scores(self, desc_packed, valid, mask,
                         line_desc=None, line_valid=None) -> np.ndarray:
        """Masked L1 scores of a query against the whole bank, line-word
        augmented when both sides carry line data."""
        _, bow = self._pipeline(jnp.asarray(desc_packed), jnp.asarray(valid))
        scores = np.asarray(self._score(bow, jnp.asarray(self.bows),
                                        jnp.asarray(mask)))
        if self.line_voc is not None and line_desc is not None \
                and line_valid is not None and line_valid.sum() >= 5:
            _, bow_l = self._pipeline_l(jnp.asarray(line_desc),
                                        jnp.asarray(line_valid))
            s_l = np.asarray(self._score(
                bow_l, jnp.asarray(self.bows_l),
                jnp.asarray(mask & self.has_lines)))
            scores = scores + self.LINE_W * np.maximum(s_l, 0.0)
        return scores

    def query(self, desc_packed: np.ndarray, valid: np.ndarray,
              exclude: np.ndarray = None, top_n: int = 3,
              min_rel_score: float = 0.75, line_desc: np.ndarray = None,
              line_valid: np.ndarray = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        """Best-matching keyframes for a query frame.

        exclude: bool [max_kf] (e.g. covisible KFs for loop detection —
        reference excludes the connected group).  Returns (kf_ids, scores)
        of up to top_n candidates above min_rel_score * best_score.
        """
        mask = self.present.copy()
        if exclude is not None:
            mask &= ~exclude
        scores = self._combined_scores(desc_packed, valid, mask,
                                       line_desc, line_valid)
        order = np.argsort(-scores)[:top_n * 3]
        order = order[scores[order] > 0]
        if len(order) == 0:
            return np.zeros(0, np.int64), np.zeros(0)
        best = scores[order[0]]
        keep = order[scores[order] >= min_rel_score * best][:top_n]
        return keep, scores[keep]

    def copy_row_from(self, other: "KeyFrameDatabase", old_kf: int,
                      new_kf: int) -> None:
        self.bows[new_kf] = other.bows[old_kf]
        self.word_ids[new_kf] = other.word_ids[old_kf]
        self.present[new_kf] = True
        if self.line_voc is not None and other.line_voc is not None:
            self.bows_l[new_kf] = other.bows_l[old_kf]
            self.has_lines[new_kf] = other.has_lines[old_kf]

    def query_grouped(self, desc_packed: np.ndarray, valid: np.ndarray,
                      covis: np.ndarray, kf_valid: np.ndarray,
                      exclude: np.ndarray = None, top_n: int = 3,
                      line_desc: np.ndarray = None,
                      line_valid: np.ndarray = None):
        """Covisibility-group accumulated scoring (reference
        DetectNBestCandidates: each candidate's score is summed over its
        covisibility group, the best group member is returned)."""
        mask = self.present & kf_valid
        if exclude is not None:
            mask = mask & ~exclude
        scores = self._combined_scores(desc_packed, valid, mask,
                                       line_desc, line_valid)
        cands = np.nonzero(scores > 0)[0]
        if len(cands) == 0:
            return np.zeros(0, np.int64), np.zeros(0)
        # one masked matvec instead of a per-candidate host walk: the
        # group sum over covisible members is ((covis>=15)&mask) @ scores
        group_mat = (covis[cands] >= 15) & mask[None, :]
        group_scores = scores[cands] + group_mat @ scores
        order = np.argsort(-group_scores)[:top_n]
        return cands[order], group_scores[order]


class AtlasKeyFrameDatabase:
    """Per-map inverted files over an Atlas.

    The reference keeps ONE KeyFrameDatabase whose entries carry their
    Map pointer (include/KeyFrameDatabase.h, queried per-map in loop vs
    merge detection, src/LoopClosing.cc:460-756).  Here keyframe slots
    are per-MapStore, so each map gets its own dense BoW bank; same-map
    queries hit one bank, merge detection sweeps the others.  All
    methods default to the Atlas' active map so single-map call sites
    stay unchanged.
    """

    def __init__(self, voc: V.Vocabulary, max_kf: int, n_feat: int, atlas,
                 line_voc: V.Vocabulary = None, n_line_feat: int = 0):
        self.voc = voc
        self.max_kf = max_kf
        self.n_feat = n_feat
        self.atlas = atlas
        self.line_voc = line_voc
        self.n_line_feat = n_line_feat
        self._dbs = {}

    def db(self, map_id: int = None) -> KeyFrameDatabase:
        if map_id is None:
            map_id = self.atlas.current.map_id
        if map_id not in self._dbs:
            self._dbs[map_id] = KeyFrameDatabase(
                self.voc, self.max_kf, self.n_feat,
                line_voc=self.line_voc, n_line_feat=self.n_line_feat)
        return self._dbs[map_id]

    def add_keyframe(self, kf, desc_packed, valid, map_id=None,
                     line_desc=None, line_valid=None):
        return self.db(map_id).add_keyframe(kf, desc_packed, valid,
                                            line_desc, line_valid)

    def rebuild(self):
        """Recompute every map's BoW bank from the Atlas' stored KF
        descriptors — used after System.load_atlas (the inverted file is
        derived state and is not serialized)."""
        self._dbs = {}
        for m in self.atlas.maps:
            db = self.db(m.map_id)
            for kf in m.valid_kf_indices():
                ld = lv = None
                if self.line_voc is not None \
                        and hasattr(m, "kf_line_desc"):
                    ld = m.kf_line_desc[kf]
                    lv = m.kf_line_valid[kf]
                db.add_keyframe(int(kf), m.kf_feat_desc[kf],
                                m.kf_feat_valid[kf], ld, lv)

    def remove_keyframe(self, kf, map_id=None):
        self.db(map_id).remove_keyframe(kf)

    def query(self, desc_packed, valid, exclude=None, top_n=3,
              min_rel_score=0.75, map_id=None, line_desc=None,
              line_valid=None):
        return self.db(map_id).query(desc_packed, valid, exclude, top_n,
                                     min_rel_score, line_desc, line_valid)

    def query_grouped(self, desc_packed, valid, covis, kf_valid,
                      exclude=None, top_n=3, map_id=None,
                      line_desc=None, line_valid=None):
        return self.db(map_id).query_grouped(desc_packed, valid, covis,
                                             kf_valid, exclude, top_n,
                                             line_desc, line_valid)

    def query_other_maps(self, desc_packed, valid, cur_map_id, top_n=3):
        """Best candidates from every non-active map, globally ranked
        (the merge-detection sweep).  Returns [(map_id, kf, score), ...]."""
        out = []
        for m in self.atlas.maps:
            mid = m.map_id
            if mid == cur_map_id or mid not in self._dbs:
                continue
            kfs, scores = self._dbs[mid].query(desc_packed, valid,
                                               top_n=top_n)
            out.extend((mid, int(k), float(s))
                       for k, s in zip(kfs, scores) if m.kf_valid[int(k)])
        out.sort(key=lambda x: -x[2])
        return out[:top_n]

    def merge_maps(self, from_id: int, to_id: int,
                   kf_map: np.ndarray) -> None:
        """Move `from_id`'s rows into `to_id` under the absorb slot remap."""
        if from_id not in self._dbs:
            return
        src = self._dbs.pop(from_id)
        dst = self.db(to_id)
        for old in np.nonzero(src.present)[0]:
            new = int(kf_map[old])
            if new >= 0:
                dst.copy_row_from(src, int(old), new)
