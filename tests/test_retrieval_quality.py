"""Place-recognition retrieval quality on REALISTIC imagery (VERDICT r4
weak #5): render revisit pairs around the machine-hall orbit with
independent photometric noise (motion blur, exposure jitter, vignette),
index one view of each pair in the KeyFrameDatabase with the TRAINED
vocabulary, and measure top-3 recall of the other view against the
whole bank of distractors.  Reference scoring: DBoW2
TemplatedVocabulary.h:1338 L1 score + KeyFrameDatabase.cc candidate
accumulation."""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.io import synthetic as syn
from plvio_tpu.models import vocabulary as V
from plvio_tpu.models.kfdb import KeyFrameDatabase
from plvio_tpu.ops import frontend as FE
from plvio_tpu.ops import matching as M


def _views(n_db: int, rng):
    """n_db database poses around the hall orbit + a revisit view of
    each (same pose, independent render noise)."""
    scene = syn.make_hall_scene(rng, n_points=6000, n_lines=300)
    # poses spread over the full circuit (t in [5, 26] s avoids the
    # init wiggle)
    ts = np.linspace(5.0, 26.0, n_db)
    db_imgs, q_imgs = [], []
    for t in ts:
        db_imgs.append(syn.render_frame_realistic(
            scene, syn._eval_mh_loop, float(t), rng))
        # the revisit render re-rolls exposure/noise; tiny time offset
        # models an imperfect revisit
        q_imgs.append(syn.render_frame_realistic(
            scene, syn._eval_mh_loop, float(t) + 0.012, rng))
    return db_imgs, q_imgs


@pytest.mark.slow
def test_kfdb_top3_recall_realistic(rng):
    n_db = 14
    db_imgs, q_imgs = _views(n_db, rng)
    extract, specs = FE.make_extractor(480, 752, n_features=1000)
    n_feat = sum(s.n_keep for s in specs)

    voc = V.default_vocabulary("orb", seed=0)
    db = KeyFrameDatabase(voc, max_kf=n_db, n_feat=n_feat)
    q_feats = []
    for k in range(n_db):
        f = extract(jnp.asarray(db_imgs[k], jnp.float32))
        db.add_keyframe(k, np.asarray(M.pack_bits_u32(f.desc)),
                        np.asarray(f.valid))
        q_feats.append(extract(jnp.asarray(q_imgs[k], jnp.float32)))

    hits_kfdb = 0
    hits_top1 = 0
    for k in range(n_db):
        f = q_feats[k]
        cands, scores = db.query(np.asarray(M.pack_bits_u32(f.desc)),
                                 np.asarray(f.valid), top_n=3,
                                 min_rel_score=0.0)
        hits_kfdb += int(k in set(int(c) for c in cands))
        hits_top1 += int(len(cands) > 0 and int(cands[0]) == k)

    recall3 = hits_kfdb / n_db
    recall1 = hits_top1 / n_db
    print(f"KFDB top-3 recall {recall3:.2f}, top-1 {recall1:.2f}")
    # floor: the revisit must be retrievable for loop closing to have a
    # chance (reference achieves ~1.0 on same-pose re-renders)
    assert recall3 >= 0.9, f"top-3 recall {recall3:.2f} < 0.9"
    assert recall1 >= 0.75, f"top-1 recall {recall1:.2f} < 0.75"


@pytest.mark.slow
def test_kfdb_recall_viewpoint_offset(rng):
    """Loop-closure-realistic retrieval: the revisit view is OFFSET from
    the database view (the circuit never re-crosses its own poses
    exactly).  0.25 s along the orbit ~ 14 cm travel + ~4 deg yaw at
    2 m depth; the KFDB must still put the right place in its top-3 for
    the detector's 3-vote consistency to ever accumulate."""
    n_db = 12
    scene = syn.make_hall_scene(rng, n_points=6000, n_lines=300)
    ts = np.linspace(6.0, 25.0, n_db)
    extract, specs = FE.make_extractor(480, 752, n_features=1000)
    n_feat = sum(s.n_keep for s in specs)
    voc = V.default_vocabulary("orb", seed=0)
    db = KeyFrameDatabase(voc, max_kf=n_db, n_feat=n_feat)
    qs = []
    for k, t in enumerate(ts):
        img = syn.render_frame_realistic(scene, syn._eval_mh_loop,
                                         float(t), rng)
        f = extract(jnp.asarray(img, jnp.float32))
        db.add_keyframe(k, np.asarray(M.pack_bits_u32(f.desc)),
                        np.asarray(f.valid))
        qimg = syn.render_frame_realistic(scene, syn._eval_mh_loop,
                                          float(t) + 0.25, rng)
        qs.append(extract(jnp.asarray(qimg, jnp.float32)))
    hits = 0
    for k in range(n_db):
        f = qs[k]
        cands, _ = db.query(np.asarray(M.pack_bits_u32(f.desc)),
                            np.asarray(f.valid), top_n=3,
                            min_rel_score=0.0)
        hits += int(k in set(int(c) for c in cands))
    recall = hits / n_db
    print(f"offset-revisit top-3 recall {recall:.2f}")
    assert recall >= 0.8, f"offset recall {recall:.2f} < 0.8"
