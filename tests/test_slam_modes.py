"""`SLAM` mode 1-3 line-only optimizers (reference: the SLAM YAML flag
parsed at src/Tracking.cc:933 gates pose optimization
(PoseOptimizationOnlyLine/-Angles/-WithAngles, src/Optimizer.cc:3406,
3546,3688) and local BA (LocalBundleAdjustmentOnlyLines(+Angle),
src/Optimizer.cc:6181,6433,6689))."""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.models import kernels as KN
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie

K = PinholeK(fx=458.0, fy=457.0, cx=367.0, cy=248.0)
CAP = 64


def _scene(rng, n=40):
    """3D segments + their projections in a reference camera."""
    Xs = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                   rng.uniform(1.5, 4.0, n)], -1).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Xe = Xs + 0.6 * d
    return Xs, Xe


def _project(pose, X):
    pc = X @ pose[:, :3].T + pose[:, 3]
    z = pc[:, 2]
    return np.stack([K.fx * pc[:, 0] / z + K.cx,
                     K.fy * pc[:, 1] / z + K.cy], -1)


def _line_obs(pose, Xs, Xe):
    us = _project(pose, Xs)
    ue = _project(pose, Xe)
    sp = np.concatenate([us, np.ones((len(us), 1))], 1)
    ep = np.concatenate([ue, np.ones((len(ue), 1))], 1)
    l = np.cross(sp, ep)
    l /= np.maximum(np.linalg.norm(l[:, :2], axis=1, keepdims=True), 1e-9)
    d = ue - us
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-6)
    return l.astype(np.float32), d.astype(np.float32)


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_pose_opt_line_only_recovers_pose(mode):
    rng = np.random.default_rng(4 + mode)
    Xs, Xe = _scene(rng)
    n = len(Xs)
    pose_true = np.concatenate(
        [np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02]))),
         np.array([[0.1], [-0.05], [0.2]], np.float32)], 1).astype(np.float32)
    l_obs, dirs = _line_obs(pose_true, Xs, Xe)

    # mode 2 (pure angle alignment) observes only directions — it cannot
    # fix translation from parallel information alone, so perturb less
    mag = 0.02 if mode == 2 else 0.08
    dx = rng.normal(0, mag, 6).astype(np.float32)
    Rp, tp = lie.se3_exp(jnp.asarray(dx))
    pose0 = np.concatenate(
        [np.asarray(Rp @ pose_true[:, :3]),
         (np.asarray(Rp) @ pose_true[:, 3] + np.asarray(tp))[:, None]],
        1).astype(np.float32)

    def pad(a, fill=0.0):
        out = np.full((CAP,) + a.shape[1:], fill, a.dtype)
        out[:len(a)] = a
        return out

    valid = np.zeros(CAP, bool)
    valid[:n] = True
    opt = KN.make_pose_opt_line_only(K, CAP, mode)
    pose, inl, n_inl = opt(jnp.asarray(pose0), jnp.asarray(pad(l_obs)),
                           jnp.asarray(pad(dirs)), jnp.asarray(pad(Xs)),
                           jnp.asarray(pad(Xe)), jnp.asarray(valid),
                           jnp.ones(CAP, jnp.float32))
    pose = np.asarray(pose)
    assert int(n_inl) >= n - 2
    ang = np.arccos(np.clip(
        (np.trace(pose[:, :3] @ pose_true[:, :3].T) - 1) / 2, -1, 1))
    assert ang < 5e-3, f"mode {mode}: rot err {ang}"
    if mode != 2:   # translation unobservable from angles alone
        assert np.linalg.norm(pose[:, 3] - pose_true[:, 3]) < 2e-2


@pytest.mark.parametrize("mode", [1, 3])
def test_local_ba_lines_only_converges(mode):
    """Two noisy poses + noisy line landmarks: line-only LBA reduces the
    endpoint-to-line reprojection residual."""
    rng = np.random.default_rng(11)
    Xs, Xe = _scene(rng, n=30)
    n = len(Xs)
    n_kf = 4
    poses = []
    for i in range(n_kf):
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.03 * i, 0.0])))
        t = np.array([0.15 * i, 0.0, 0.0], np.float32)
        poses.append(np.concatenate([R, t[:, None]], 1).astype(np.float32))

    lobs_kf, lobs_ln, lobs_eq, lobs_dir = [], [], [], []
    for s, p in enumerate(poses):
        l, d = _line_obs(p, Xs, Xe)
        lobs_kf.append(np.full(n, s, np.int32))
        lobs_ln.append(np.arange(n, dtype=np.int32))
        lobs_eq.append(l)
        lobs_dir.append(d)
    lobs_kf = np.concatenate(lobs_kf)
    lobs_ln = np.concatenate(lobs_ln)
    lobs_eq = np.concatenate(lobs_eq)
    lobs_dir = np.concatenate(lobs_dir)

    KF_CAP, LN_CAP, LOBS_CAP = 8, 64, 256

    def pad(a, cap, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, a.dtype)
        out[:len(a)] = a
        return out

    kf_poses = np.tile(np.eye(3, 4, dtype=np.float32), (KF_CAP, 1, 1))
    kf_poses[:n_kf] = np.stack(poses)
    # perturb non-anchor poses and the landmarks
    for i in range(1, n_kf):
        dxi = rng.normal(0, 0.02, 6).astype(np.float32)
        Rp, tp = lie.se3_exp(jnp.asarray(dxi))
        kf_poses[i, :, :3] = np.asarray(Rp) @ kf_poses[i, :, :3]
        kf_poses[i, :, 3] = np.asarray(Rp) @ kf_poses[i, :, 3] + np.asarray(tp)
    ln_ep = np.zeros((LN_CAP, 6), np.float32)
    ln_ep[:n] = np.concatenate([Xs, Xe], 1) \
        + rng.normal(0, 0.03, (n, 6)).astype(np.float32)
    kf_free = np.zeros(KF_CAP, bool)
    kf_free[1:n_kf] = True
    ln_free = np.zeros(LN_CAP, bool)
    ln_free[:n] = True
    lv = np.zeros(LOBS_CAP, bool)
    lv[:len(lobs_kf)] = True

    ba = KN.make_local_ba_lines_only(K, KF_CAP, LN_CAP, LOBS_CAP, mode)
    out_poses, out_lns, inl = ba(
        jnp.asarray(kf_poses), jnp.asarray(kf_free),
        jnp.asarray(ln_ep), jnp.asarray(ln_free),
        jnp.asarray(pad(lobs_kf, LOBS_CAP)),
        jnp.asarray(pad(lobs_ln, LOBS_CAP)),
        jnp.asarray(pad(lobs_eq, LOBS_CAP)),
        jnp.asarray(pad(lobs_dir, LOBS_CAP)),
        jnp.asarray(lv), jnp.ones(LOBS_CAP, jnp.float32))
    out_poses = np.asarray(out_poses)
    out_lns = np.asarray(out_lns)

    def resid(poses_arr, lns_arr):
        tot = 0.0
        for k in range(len(lobs_kf)):
            p = poses_arr[lobs_kf[k]]
            L6 = lns_arr[lobs_ln[k]]
            us = _project(p, L6[None, :3])[0]
            ue = _project(p, L6[None, 3:])[0]
            l = lobs_eq[k]
            tot += (l[0] * us[0] + l[1] * us[1] + l[2]) ** 2 \
                + (l[0] * ue[0] + l[1] * ue[1] + l[2]) ** 2
        return tot

    before = resid(kf_poses, ln_ep)
    after = resid(out_poses, out_lns)
    assert after < 0.2 * before, f"mode {mode}: {before:.3f} -> {after:.3f}"
    assert int(np.asarray(inl).sum()) >= len(lobs_kf) * 3 // 4
