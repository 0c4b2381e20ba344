"""Engine verification against known least-squares ground truth
(the unit tests the reference never had — SURVEY §4 implication)."""
import numpy as np
import jax
import jax.numpy as jnp

from plvio_tpu.solver import engine as E
from plvio_tpu.solver import residuals as R
from plvio_tpu.utils import lie

K = R.PinholeK(fx=458.654, fy=457.296, cx=367.215, cy=248.375)


def _make_world(rng, n_pts=120):
    X = rng.uniform(-2, 2, (n_pts, 3))
    X[:, 2] += 6.0
    return jnp.asarray(X, jnp.float32)


def _observe(P, X):
    Rm, t = P[:, :3], P[:, 3]
    pc = (Rm @ X.T).T + t
    uv = jnp.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                    K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)
    return uv


def _perturbed_pose(rng, scale_rot=0.05, scale_t=0.2):
    w = rng.normal(0, scale_rot, 3)
    t = rng.normal(0, scale_t, 3)
    Rm = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    return jnp.asarray(np.concatenate([Rm, t[:, None]], 1), jnp.float32)


def test_pose_only_convergence(rng):
    """PoseOptimization analog (reference: src/Optimizer.cc:2399):
    converge to ground-truth camera pose from a perturbed start."""
    X = _make_world(rng)
    P_gt = jnp.asarray(np.eye(3, 4), jnp.float32)
    uv = _observe(P_gt, X)

    P0 = _perturbed_pose(rng)
    prob = E.Problem()
    prob.add_dense("pose", 1, 6, R.retract_pose_cw)
    n = X.shape[0]
    prob.add_term(E.Term(
        name="reproj", res_fn=R.make_point_reproj_fixed(K), rdim=2,
        dense_refs=[("pose", jnp.zeros(n, jnp.int32))],
        const={"uv": uv, "X": X},
        mask=jnp.ones(n, bool), info=jnp.ones(n, jnp.float32),
        robust_delta=float(np.sqrt(5.991))))
    states = {"pose": P0[None]}
    states, cost, chi2 = E.optimize(prob, states, iters=10)
    P_est = np.asarray(states["pose"][0])
    np.testing.assert_allclose(P_est, np.asarray(P_gt), atol=1e-4)


def test_pose_only_with_outliers(rng):
    """Huber + chi2 masking recovers the pose despite 20% gross outliers
    (the reference's 4-round outlier gating, src/Optimizer.cc:2963-3075)."""
    X = _make_world(rng, 150)
    P_gt = jnp.asarray(np.eye(3, 4), jnp.float32)
    uv = np.array(_observe(P_gt, X))
    n = len(uv)
    n_out = n // 5
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    uv = jnp.asarray(uv, jnp.float32)

    P0 = _perturbed_pose(rng, 0.03, 0.1)
    mask = jnp.ones(n, bool)
    states = {"pose": P0[None]}
    for rnd in range(4):  # 4 rounds x 10 iters with chi2 re-gating
        prob = E.Problem()
        prob.add_dense("pose", 1, 6, R.retract_pose_cw)
        prob.add_term(E.Term(
            name="reproj", res_fn=R.make_point_reproj_fixed(K), rdim=2,
            dense_refs=[("pose", jnp.zeros(n, jnp.int32))],
            const={"uv": uv, "X": X}, mask=mask,
            info=jnp.ones(n, jnp.float32), robust_delta=float(np.sqrt(5.991))))
        states, cost, chi2s = E.optimize(prob, states, iters=10)
        mask = chi2s["reproj"] < 5.991

    P_est = np.asarray(states["pose"][0])
    np.testing.assert_allclose(P_est, np.asarray(P_gt), atol=2e-3)
    # inlier classification should find the outliers
    inl = np.asarray(mask)
    assert inl[~np.isin(np.arange(n), out_idx)].mean() > 0.95
    assert inl[out_idx].mean() < 0.1


def test_small_ba_schur(rng):
    """Full BA with Schur-eliminated points vs ground truth: 4 cameras,
    80 points, first camera fixed for gauge (LocalBundleAdjustment analog,
    reference: src/Optimizer.cc:4851)."""
    n_cams, n_pts = 4, 80
    X_gt = _make_world(rng, n_pts)
    poses_gt = []
    for c in range(n_cams):
        w = rng.normal(0, 0.03, 3)
        t = np.array([0.4 * c, 0.02 * c, 0.0]) + rng.normal(0, 0.02, 3)
        Rm = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        poses_gt.append(np.concatenate([Rm, t[:, None]], 1))
    poses_gt = jnp.asarray(np.stack(poses_gt), jnp.float32)

    # observations: every camera sees every point
    cam_idx = jnp.repeat(jnp.arange(n_cams), n_pts).astype(jnp.int32)
    pt_idx = jnp.tile(jnp.arange(n_pts), n_cams).astype(jnp.int32)
    uv_all = jnp.concatenate([_observe(poses_gt[c], X_gt) for c in range(n_cams)])
    uv_all = uv_all + jnp.asarray(rng.normal(0, 0.3, uv_all.shape), jnp.float32)

    # perturbed initialization (keep camera 0 at gt = gauge anchor)
    poses0 = np.asarray(poses_gt).copy()
    for c in range(1, n_cams):
        w = rng.normal(0, 0.01, 3)
        dR = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        poses0[c, :, :3] = dR @ poses0[c, :, :3]
        poses0[c, :, 3] += rng.normal(0, 0.05, 3)
    X0 = np.asarray(X_gt) + rng.normal(0, 0.05, (n_pts, 3))

    prob = E.Problem()
    prob.add_dense("pose", n_cams, 6, R.retract_pose_cw)
    prob.add_landmarks("pt", n_pts, 3, R.retract_additive)
    nobs = len(cam_idx)
    prob.add_term(E.Term(
        name="reproj", res_fn=R.make_point_reproj(K), rdim=2,
        dense_refs=[("pose", cam_idx)], lm_ref=("pt", pt_idx),
        const={"uv": uv_all}, mask=jnp.ones(nobs, bool),
        info=jnp.ones(nobs, jnp.float32), robust_delta=float(np.sqrt(5.991))))

    states = {"pose": jnp.asarray(poses0, jnp.float32),
              "pt": jnp.asarray(X0, jnp.float32)}
    free = {"pose": jnp.asarray([False, True, True, True])}
    states, cost, _ = E.optimize(prob, states, iters=15,
                                 dense_free_mask=free,
                                 lm_free_mask={"pt": jnp.ones(n_pts, bool)})

    # poses recovered to sub-mm / sub-0.1px noise floor
    err_t = np.abs(np.asarray(states["pose"])[:, :, 3] - np.asarray(poses_gt)[:, :, 3])
    assert err_t.max() < 1.5e-2, err_t.max()
    err_X = np.abs(np.asarray(states["pt"]) - np.asarray(X_gt))
    assert np.median(err_X) < 1e-2


def test_ba_padded_landmarks_ignored(rng):
    """Padded (invalid) landmark slots must not perturb the solve."""
    n_pts, cap = 40, 64
    X_gt = _make_world(rng, n_pts)
    P_gt = jnp.asarray(np.eye(3, 4), jnp.float32)
    uv = _observe(P_gt, X_gt)

    prob = E.Problem()
    prob.add_dense("pose", 2, 6, R.retract_pose_cw)
    prob.add_landmarks("pt", cap, 3, R.retract_additive)
    # second camera slightly offset, sees same points
    P2 = jnp.asarray(np.concatenate([np.eye(3), [[0.3], [0.0], [0.0]]], 1), jnp.float32)
    uv2 = _observe(P2, X_gt)
    cam_idx = jnp.concatenate([jnp.zeros(n_pts, jnp.int32), jnp.ones(n_pts, jnp.int32)])
    pt_idx = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32), 2)
    uv_all = jnp.concatenate([uv, uv2])
    X0 = jnp.zeros((cap, 3), jnp.float32).at[:n_pts].set(
        X_gt + jnp.asarray(rng.normal(0, 0.03, (n_pts, 3)), jnp.float32))

    prob.add_term(E.Term(
        name="reproj", res_fn=R.make_point_reproj(K), rdim=2,
        dense_refs=[("pose", cam_idx)], lm_ref=("pt", pt_idx),
        const={"uv": uv_all}, mask=jnp.ones(2 * n_pts, bool),
        info=jnp.ones(2 * n_pts, jnp.float32)))
    states = {"pose": jnp.stack([P_gt, P2]), "pt": X0}
    lm_free = jnp.arange(cap) < n_pts
    states, cost, _ = E.optimize(
        prob, states, iters=8,
        dense_free_mask={"pose": jnp.asarray([False, False])},
        lm_free_mask={"pt": lm_free})
    assert np.all(np.isfinite(np.asarray(states["pt"])))
    np.testing.assert_allclose(np.asarray(states["pt"][:n_pts]),
                               np.asarray(X_gt), atol=1e-3)
    # padded slots untouched
    np.testing.assert_allclose(np.asarray(states["pt"][n_pts:]), 0.0, atol=1e-8)


def test_line_residual_convergence(rng):
    """Pose from line observations only (PoseOptimization line-only analog,
    reference: src/Optimizer.cc:3406)."""
    n_lines = 60
    Xs = rng.uniform(-2, 2, (n_lines, 3)); Xs[:, 2] += 5
    Xe = Xs + rng.uniform(-1, 1, (n_lines, 3))
    P_gt = jnp.asarray(np.eye(3, 4), jnp.float32)

    def line_eq(P, Xs, Xe):
        uv_s = np.asarray(_observe(P, jnp.asarray(Xs, jnp.float32)))
        uv_e = np.asarray(_observe(P, jnp.asarray(Xe, jnp.float32)))
        sp = np.concatenate([uv_s, np.ones((len(uv_s), 1))], 1)
        ep = np.concatenate([uv_e, np.ones((len(uv_e), 1))], 1)
        l = np.cross(sp, ep)
        return l / np.linalg.norm(l[:, :2], axis=1, keepdims=True)

    l_obs = jnp.asarray(line_eq(P_gt, Xs, Xe), jnp.float32)
    P0 = _perturbed_pose(rng, 0.03, 0.1)
    prob = E.Problem()
    prob.add_dense("pose", 1, 6, R.retract_pose_cw)
    prob.add_term(E.Term(
        name="line", res_fn=R.make_line_reproj_fixed(K), rdim=2,
        dense_refs=[("pose", jnp.zeros(n_lines, jnp.int32))],
        const={"l": l_obs, "Xs": jnp.asarray(Xs, jnp.float32),
               "Xe": jnp.asarray(Xe, jnp.float32)},
        mask=jnp.ones(n_lines, bool), info=jnp.ones(n_lines, jnp.float32),
        robust_delta=float(np.sqrt(5.991))))
    states, cost, _ = E.optimize(prob, {"pose": P0[None]}, iters=12)
    np.testing.assert_allclose(np.asarray(states["pose"][0]),
                               np.asarray(P_gt), atol=5e-4)


def test_marginalize_condition_sparsify():
    """Marginalization = Schur complement: solving the reduced system must
    give the same kept-variable solution as solving the full system."""
    import numpy as np
    import jax.numpy as jnp
    from plvio_tpu.solver import engine as E

    rng = np.random.default_rng(3)
    n, m = 6, 4
    A = rng.normal(size=(n + m, n + m))
    H = A @ A.T + (n + m) * np.eye(n + m)
    b = rng.normal(size=n + m)
    x_full = np.linalg.solve(H, b)

    # marginalize the TAIL block [n, n+m)
    H_r, b_r = E.marginalize(jnp.asarray(H, jnp.float32),
                             jnp.asarray(b, jnp.float32), n, n + m)
    x_kept = np.linalg.solve(np.asarray(H_r, np.float64),
                             np.asarray(b_r, np.float64))
    assert np.allclose(x_kept, x_full[:n], atol=1e-4), (x_kept, x_full[:n])

    # conditioning just drops the block
    H_c, b_c = E.condition(jnp.asarray(H, jnp.float32),
                           jnp.asarray(b, jnp.float32), n, n + m)
    assert np.allclose(np.asarray(H_c), H[:n, :n], atol=1e-5)
    assert np.allclose(np.asarray(b_c), b[:n], atol=1e-6)

    # sparsify keeps 3x3 diagonal blocks only
    Hs = np.asarray(E.sparsify(jnp.asarray(H, jnp.float32), 5))
    assert np.allclose(Hs[:5, :5], H[:5, :5], atol=1e-5)
    assert np.all(Hs[:5, 5:] == 0)
