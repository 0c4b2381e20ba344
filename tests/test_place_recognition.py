"""Vocabulary / keyframe database / PnP / Sim3 tests (the DBoW2 +
MLPnPsolver + Sim3Solver replacements)."""
import numpy as np
import jax
import jax.numpy as jnp

from plvio_tpu.models import vocabulary as V
from plvio_tpu.models.kfdb import KeyFrameDatabase
from plvio_tpu.ops import pnp as PNP
from plvio_tpu.ops import matching as M
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie

K = PinholeK(fx=458.654, fy=457.296, cx=367.215, cy=248.375)


def _random_descs(rng, n):
    return jnp.asarray(rng.choice([-1.0, 1.0], (n, 256)), jnp.bfloat16)


def _perturb_descs(rng, d, bits):
    """Flip `bits` random bits per descriptor."""
    d = np.asarray(d, np.float32)
    for i in range(len(d)):
        j = rng.choice(256, bits, replace=False)
        d[i, j] *= -1
    return jnp.asarray(d, jnp.bfloat16)


def test_vocabulary_transform_consistency(rng):
    voc = V.random_vocabulary(seed=0)
    d = _random_descs(rng, 500)
    w1 = V.transform(voc, d, jnp.ones(500, bool))
    w2 = V.transform(voc, d, jnp.ones(500, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert np.asarray(w1).min() >= 0
    assert np.asarray(w1).max() < voc.n_words
    # similar descriptors mostly quantize to the same word
    d2 = _perturb_descs(rng, d, 8)
    w3 = V.transform(voc, d2, jnp.ones(500, bool))
    agree = (np.asarray(w1) == np.asarray(w3)).mean()
    assert agree > 0.2, agree  # random vocab margins are thin; retrieval
    # robustness comes from aggregating hundreds of features (see kfdb test)


def test_kfdb_retrieval(rng):
    """A re-observation of KF i's descriptors must retrieve KF i."""
    voc = V.random_vocabulary(seed=0)
    n_feat = 300
    db = KeyFrameDatabase(voc, max_kf=32, n_feat=n_feat)
    banks = []
    for k in range(8):
        d = _random_descs(rng, n_feat)
        banks.append(d)
        db.add_keyframe(k, np.asarray(M.pack_bits_u32(d)),
                        np.ones(n_feat, bool))
    # query = noisy copy of KF 5
    q = _perturb_descs(rng, banks[5], 12)
    cands, scores = db.query(np.asarray(M.pack_bits_u32(q)),
                             np.ones(n_feat, bool), top_n=3)
    assert len(cands) > 0
    assert cands[0] == 5, (cands, scores)


def test_pnp_ransac(rng):
    n = 200
    X = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    X[:, 2] += 6
    w = rng.normal(0, 0.3, 3)
    t = rng.normal(0, 0.5, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    pc = X @ R.T + t
    uv = np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                   K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)
    uv += rng.normal(0, 0.5, uv.shape)
    # 25% outliers
    bad = rng.choice(n, n // 4, replace=False)
    uv[bad] += rng.uniform(40, 150, (len(bad), 2))
    R_est, t_est, inl, n_inl = PNP.pnp_ransac(
        K, jnp.asarray(uv, jnp.float32), jnp.asarray(X),
        jnp.ones(n, bool), jax.random.PRNGKey(0))
    assert int(n_inl) > 0.6 * (n - len(bad)), int(n_inl)
    ang = np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(np.asarray(R_est).T @ R, jnp.float32))))
    assert ang < 0.02, ang
    np.testing.assert_allclose(np.asarray(t_est), t, atol=0.1)


def test_sim3_ransac(rng):
    n = 150
    X1 = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    w = rng.normal(0, 0.4, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    s, t = 1.4, np.array([0.5, -1.0, 2.0])
    X2 = (s * (X1 @ R.T) + t).astype(np.float32)
    X2 += rng.normal(0, 0.01, X2.shape).astype(np.float32)
    bad = rng.choice(n, n // 5, replace=False)
    X2[bad] += rng.uniform(1, 3, (len(bad), 3)).astype(np.float32)
    s_e, R_e, t_e, inl, n_inl = PNP.sim3_ransac(
        jnp.asarray(X1), jnp.asarray(X2), jnp.ones(n, bool),
        jax.random.PRNGKey(1), th=0.05)
    assert abs(float(s_e) - s) < 0.05
    ang = np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(np.asarray(R_e).T @ R, jnp.float32))))
    assert ang < 0.03
    np.testing.assert_allclose(np.asarray(t_e), t, atol=0.1)
    assert (~np.asarray(inl)[bad]).mean() > 0.8


def test_vocabulary_training(rng):
    """Trained vocabulary separates structured descriptor clusters better
    than chance: same-cluster descriptors share words."""
    # 20 cluster centers, 30 noisy members each
    centers = np.asarray(rng.choice([-1.0, 1.0], (20, 256)), np.float32)
    members = np.repeat(centers, 30, axis=0)
    flip = rng.random(members.shape) < 0.04
    members = np.where(flip, -members, members)
    voc = V.train(jnp.asarray(members, jnp.float32), seed=1, k=5, depth=3,
                  iters=4)
    w = np.asarray(V.transform(voc, jnp.asarray(members, jnp.bfloat16),
                               jnp.ones(len(members), bool)))
    # purity: most common word per cluster covers most members
    purity = []
    for c in range(20):
        ws = w[c * 30:(c + 1) * 30]
        _, counts = np.unique(ws, return_counts=True)
        purity.append(counts.max() / 30)
    assert np.mean(purity) > 0.8, np.mean(purity)


def test_mlpnp_refine(rng):
    """ML bearing-vector refinement tightens a coarse RANSAC pose
    (reference Tracking::Relocalization uses MLPnPsolver then pose
    optimization, src/Tracking.cc:5744-5850)."""
    n = 200
    X = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    X[:, 2] += 6
    w = rng.normal(0, 0.3, 3)
    t = rng.normal(0, 0.5, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    pc = X @ R.T + t
    uv = np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                   K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)
    uv += rng.normal(0, 0.5, uv.shape)
    bad = rng.choice(n, n // 5, replace=False)
    uv[bad] += rng.uniform(40, 150, (len(bad), 2))
    inliers = np.ones(n, bool)
    inliers[bad] = False
    # perturbed start: ~3 deg, ~15 cm off
    R0 = np.asarray(lie.so3_exp(jnp.asarray(w + [0.03, -0.03, 0.02],
                                            jnp.float32)))
    t0 = t + [0.1, -0.05, 0.1]
    R_est, t_est, inl, n_inl = PNP.mlpnp_refine(
        K, jnp.asarray(uv, jnp.float32), jnp.asarray(X),
        jnp.asarray(inliers), jnp.asarray(R0, jnp.float32),
        jnp.asarray(t0, jnp.float32))
    ang = np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(np.asarray(R_est).T @ R, jnp.float32))))
    assert ang < 5e-3, ang
    np.testing.assert_allclose(np.asarray(t_est), t, atol=0.02)
    assert int(n_inl) > 0.9 * (n - len(bad))
