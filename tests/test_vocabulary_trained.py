"""Trained vocabulary assets + line-word retrieval mixing
(reference: two pre-trained vocabularies ORBvoc + LSvoc loaded at
src/System.cc:83-105; KeyFrameDatabase retrieval src/KeyFrameDatabase.cc:619).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.io import synthetic as syn
from plvio_tpu.models import vocabulary as V
from plvio_tpu.models.kfdb import KeyFrameDatabase
from plvio_tpu.ops import frontend as FE
from plvio_tpu.ops import matching as M

ASSETS = os.path.join(os.path.dirname(__file__), "..", "plvio_tpu", "assets")


def test_save_load_roundtrip(tmp_path):
    voc = V.random_vocabulary(seed=3, k=4, depth=3)
    path = str(tmp_path / "voc.npz")
    V.save(voc, path)
    voc2 = V.load(path)
    assert voc2.k == 4 and voc2.depth == 3
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.choice([-1.0, 1.0], (64, 256)), jnp.float32)
    v = jnp.ones(64, bool)
    w1 = np.asarray(V.transform(voc, d, v))
    w2 = np.asarray(V.transform(voc2, d, v))
    assert (w1 == w2).all()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "orbvoc.npz")),
    reason="trained vocabulary assets not built")
def test_trained_vocab_beats_random_retrieval():
    """Frame-retrieval precision on held-out synthetic views: the bank
    holds frames around an orbit; each query is a nearby view and must
    retrieve its nearest-pose bank frame top-1.  The trained vocabulary
    must be at least as precise as the random one."""
    rng = np.random.default_rng(42)   # unseen during training (seed 0..)
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    n_bank, n_query = 16, 8
    traj = syn.make_orbit_trajectory(duration=n_bank / 2.0, fps=2.0,
                                     radius=0.6)
    extract, specs = FE.make_extractor(480, 752, n_features=1000)
    n_feat = sum(s.n_keep for s in specs)

    def feats_of(i, jitter=0.0):
        R = traj.R_wb[i]
        p = traj.p_wb[i] + jitter * rng.standard_normal(3) * 0.02
        img = syn.render_frame(scene, R, p, rng=rng)
        f = extract(jnp.asarray(img, jnp.float32))
        return (np.asarray(M.pack_bits_u32(f.desc)), np.asarray(f.valid))

    bank = [feats_of(i) for i in range(n_bank)]
    queries = [(i, feats_of(i, jitter=1.0))
               for i in rng.choice(n_bank, n_query, replace=False)]

    def precision(voc):
        db = KeyFrameDatabase(voc, n_bank, n_feat)
        for i, (d, v) in enumerate(bank):
            db.add_keyframe(i, d, v)
        hits = 0
        for true_i, (d, v) in queries:
            kfs, scores = db.query(d, v, top_n=1)
            # adjacent orbit frames overlap heavily; retrieving an
            # immediate neighbour is a correct localization
            hits += len(kfs) > 0 and abs(int(kfs[0]) - int(true_i)) <= 1
        return hits / len(queries)

    p_trained = precision(V.load(os.path.join(ASSETS, "orbvoc.npz")))
    p_random = precision(V.random_vocabulary(seed=0, k=10, depth=4))
    assert p_trained >= p_random, (p_trained, p_random)
    assert p_trained >= 0.7, f"trained retrieval precision {p_trained}"


def test_line_bank_mixes_into_scores():
    """A KFDB with a line vocabulary stores LBD words and mixes them into
    query scores; keyframes sharing BOTH point and line words outrank
    point-only ties."""
    rng = np.random.default_rng(5)
    voc = V.random_vocabulary(seed=0, k=6, depth=3)
    lvoc = V.random_vocabulary(seed=1, k=6, depth=2)
    n_feat, n_lf = 128, 32
    db = KeyFrameDatabase(voc, 8, n_feat, line_voc=lvoc, n_line_feat=n_lf)

    def rand_desc(n):
        return (rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32),
                np.ones(n, bool))

    d0, v0 = rand_desc(n_feat)
    ld0, lv0 = rand_desc(n_lf)
    # kf0: same points AND same lines as the query
    db.add_keyframe(0, d0, v0, ld0, lv0)
    # kf1: same points, different lines
    ld1, lv1 = rand_desc(n_lf)
    db.add_keyframe(1, d0, v0, ld1, lv1)
    assert db.has_lines[:2].all()

    kfs, scores = db.query(d0, v0, top_n=2, line_desc=ld0, line_valid=lv0)
    assert int(kfs[0]) == 0
    s = dict(zip(kfs.tolist(), scores.tolist()))
    assert s[0] > s.get(1, 0.0)

    # removing the KF clears its line row
    db.remove_keyframe(0)
    assert not db.has_lines[0]
