"""Essential-graph fidelity: correction actually applied, including for
chains far beyond the pose-graph kernel capacity (reference
OptimizeEssentialGraph src/Optimizer.cc:6952 runs over ALL keyframes;
here maps past pg_kf_cap are subsampled and skipped KFs rigidly
propagated), and the reprojection-based Sim3 refinement (reference
OptimizeSim3 src/Optimizer.cc:8462)."""
import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.models.mapstore import Atlas, MapStore
from plvio_tpu.models.kfdb import KeyFrameDatabase
from plvio_tpu.models.loop_closing import LoopCloser
from plvio_tpu.models import kernels as KN
from plvio_tpu.models import vocabulary as V
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie


def _circle_pose(a, radius=1.2):
    c, s = np.cos(a), np.sin(a)
    p = np.array([radius * c, radius * s, 0.0])
    look = np.array([c, s, 0.0])
    x = np.cross([0, 0, -1.0], look)
    x /= np.linalg.norm(x)
    y = np.cross(look, x)
    R_wc = np.stack([x, y, look], -1)
    R_cw = R_wc.T
    return R_cw, -R_cw @ p


def _big_drifted_chain(n_kf=600, drift=0.8):
    """600 KFs around a circle; estimated poses accumulate translation
    drift linearly; last KF revisits the first view."""
    m = MapStore(max_kf=640, max_pts=64, max_lines=8, n_feat=8)
    angles = np.linspace(0, 2 * np.pi, n_kf, endpoint=False)
    angles = np.concatenate([angles, [0.0]])
    kfs, gt = [], []
    prev = None
    for i, a in enumerate(angles):
        R_cw, t_cw_true = _circle_pose(a)
        d = drift * i / len(angles)
        p_true = -R_cw.T @ t_cw_true
        p_est = p_true + np.array([d, -0.6 * d, 0.3 * d])
        t_cw = -R_cw @ p_est
        kf = m.alloc_kf()
        m.kf_timestamp[kf] = 0.5 * i
        m.kf_pose_cw[kf] = np.concatenate(
            [R_cw, t_cw[:, None]], 1).astype(np.float32)
        gt.append((R_cw.copy(), t_cw_true.copy()))
        if prev is not None:
            m.kf_prev[kf] = prev
            m.kf_next[prev] = kf
            m.covis[kf, prev] = m.covis[prev, kf] = 80
            if i >= 2:
                m.covis[kf, kfs[-2]] = m.covis[kfs[-2], kf] = 45
        prev = kf
        kfs.append(kf)
    return m, np.asarray(kfs), gt


def test_essential_graph_beyond_cap_applies_correction(rng):
    """600-KF chain with a 64-KF pose-graph kernel: the subsampled graph
    + rigid propagation must still distribute the loop correction (no
    silent skip past pg_kf_cap)."""
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False)
    m, kfs, gt = _big_drifted_chain()
    atlas = Atlas(maps=[m], active=0)
    voc = V.random_vocabulary(seed=0)
    kfdb = KeyFrameDatabase(voc, m.max_kf, m.n_feat)
    lc = LoopCloser(cfg, atlas, kfdb, m.n_feat, pg_kf_cap=64,
                    pg_edge_cap=2048)
    chain = m.kf_chain()
    assert len(chain) == 601
    pre_poses = {int(k): (m.kf_pose_cw[k, :, :3].copy(),
                          m.kf_pose_cw[k, :, 3].copy()) for k in chain}

    def t_err():
        errs = [np.linalg.norm(-m.kf_pose_cw[k, :, :3].T
                               @ m.kf_pose_cw[k, :, 3]
                               - (-gt[i][0].T @ gt[i][1]))
                for i, k in enumerate(kfs)]
        return np.asarray(errs)

    err_before = t_err()
    assert err_before.max() > 0.5     # real drift to correct

    kf, cand = int(kfs[-1]), int(kfs[0])
    # weld similarity that puts kf exactly on its ground-truth pose:
    # S_weld = S_gt^{-1} . S_pre  (SE3, scale 1)
    R_gt, t_gt = gt[-1]
    R_pre, t_pre = pre_poses[kf]
    R_w = R_gt.T @ R_pre
    t_w = R_gt.T @ (t_pre - t_gt)
    # apply the weld to the "window" (just kf), as _correct_loop does
    R_cw = m.kf_pose_cw[kf, :, :3].copy()
    t_cw = m.kf_pose_cw[kf, :, 3].copy()
    Rn = R_cw @ R_w.T
    m.kf_pose_cw[kf, :, :3] = Rn
    m.kf_pose_cw[kf, :, 3] = t_cw - Rn @ t_w
    lc._essential_graph(kf, cand, 1.0, R_w, t_w, pre_poses, {kf})

    err_after = t_err()
    # the loop correction must be distributed: large improvement in both
    # worst-case and mean error; the revisiting end pinned near GT
    assert err_after.max() < 0.4 * err_before.max(), \
        f"max {err_before.max():.3f} -> {err_after.max():.3f}"
    assert err_after.mean() < 0.5 * err_before.mean(), \
        f"mean {err_before.mean():.3f} -> {err_after.mean():.3f}"
    assert err_after[-1] < 0.1


def test_sim3_reproj_optimizer_converges(rng):
    """The OptimizeSim3 analog recovers a known similarity from noisy
    2D observations in both frames, starting from a perturbed seed."""
    K = PinholeK(fx=400., fy=400., cx=376., cy=240.)
    cap = 256
    s_gt = 1.1
    Rg = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.2],
                                            jnp.float32)))
    tg = np.array([0.5, -0.3, 0.2])
    P1 = np.eye(3, 4, dtype=np.float32)
    R2 = np.asarray(lie.so3_exp(jnp.asarray([0., 0.25, 0.], jnp.float32)))
    P2 = np.concatenate([R2, np.array([[0.1], [0.], [0.3]], np.float32)], 1)
    X1 = rng.uniform(-2, 2, (cap, 3))
    X1[:, 2] = rng.uniform(3, 7, cap)
    X2 = s_gt * X1 @ Rg.T + tg

    def proj(P, X):
        pc = X @ P[:, :3].T + P[:, 3]
        return np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                         K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)

    uv2 = proj(P2, X2) + rng.normal(0, 0.3, (cap, 2))
    uv1 = proj(P1, X1) + rng.normal(0, 0.3, (cap, 2))
    R0 = np.asarray(lie.so3_exp(jnp.asarray([0.01, 0.01, 0.25],
                                            jnp.float32)))
    S13 = np.concatenate([R0.reshape(-1), tg + [0.1, -0.1, 0.05],
                          [1.0]]).astype(np.float32)
    opt = KN.make_sim3_reproj_optimizer(K, cap)
    valid = jnp.ones(cap, bool)
    ones = jnp.ones(cap)
    out, mf, mb, n = opt(
        jnp.asarray(S13), jnp.asarray(X1, jnp.float32),
        jnp.asarray(uv2, jnp.float32), valid, ones,
        jnp.asarray(X2, jnp.float32), jnp.asarray(uv1, jnp.float32),
        valid, ones, jnp.asarray(P1), jnp.asarray(P2))
    out = np.asarray(out)
    Rn = out[:9].reshape(3, 3)
    tn = out[9:12]
    sn = out[12]
    assert int(n) > 400
    assert abs(sn - s_gt) < 0.01
    assert np.linalg.norm(tn - tg) < 0.05
    assert np.linalg.norm(Rn - Rg) < 0.01


def test_sim3_reproj_fix_scale(rng):
    """fix_scale=True pins the scale DOF (stereo/inertial welds)."""
    K = PinholeK(fx=400., fy=400., cx=376., cy=240.)
    cap = 128
    Rg = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.15],
                                            jnp.float32)))
    tg = np.array([0.3, -0.2, 0.1])
    P1 = np.eye(3, 4, dtype=np.float32)
    P2 = np.eye(3, 4, dtype=np.float32)
    X1 = rng.uniform(-2, 2, (cap, 3))
    X1[:, 2] = rng.uniform(3, 7, cap)
    X2 = X1 @ Rg.T + tg

    def proj(P, X):
        pc = X @ P[:, :3].T + P[:, 3]
        return np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                         K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)

    uv2 = proj(P2, X2)
    uv1 = proj(P1, X1)
    S13 = np.concatenate([np.eye(3).reshape(-1),
                          [0.2, -0.1, 0.0], [1.0]]).astype(np.float32)
    opt = KN.make_sim3_reproj_optimizer(K, cap, fix_scale=True)
    valid = jnp.ones(cap, bool)
    ones = jnp.ones(cap)
    out, _, _, n = opt(
        jnp.asarray(S13), jnp.asarray(X1, jnp.float32),
        jnp.asarray(uv2, jnp.float32), valid, ones,
        jnp.asarray(X2, jnp.float32), jnp.asarray(uv1, jnp.float32),
        valid, ones, jnp.asarray(P1), jnp.asarray(P2))
    out = np.asarray(out)
    assert abs(out[12] - 1.0) < 1e-5          # scale pinned exactly
    assert np.linalg.norm(out[9:12] - tg) < 0.02
