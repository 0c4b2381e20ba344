"""Frame-to-frame 15-DoF marginalization prior in VI pose-only tracking
(reference PoseInertialOptimizationLastFrame, src/Optimizer.cc:13980 +
ConstraintPoseImu/EdgePriorPoseImu, include/G2oTypes.h:848-929):
the kernel carries the information-form recursion — solve, marginalize
the previous state, feed the 15x15 prior into the next solve."""
import jax
import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import ImuConfig
from plvio_tpu.ops import imu as IMU
from plvio_tpu.io import synthetic as syn
from plvio_tpu.models import kernels as KN
from plvio_tpu.solver import engine as E
from plvio_tpu.solver import residuals as R
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie

CAP = 64
K = PinholeK(fx=400.0, fy=400.0, cx=376.0, cy=240.0)
Rcb = np.eye(3, dtype=np.float32)
tcb = np.zeros(3, dtype=np.float32)


def _preint(imu_data, t0, t1):
    m = (imu_data.timestamps > t0) & (imu_data.timestamps <= t1)
    ts = imu_data.timestamps[m]
    dts = np.diff(np.concatenate([[t0], ts]))
    return IMU.preintegrate(
        jnp.asarray(imu_data.gyro[m], jnp.float32),
        jnp.asarray(imu_data.acc[m], jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.ones(len(ts), bool),
        IMU.make_calib(ImuConfig()), jnp.zeros(3), jnp.zeros(3))


def _const(p):
    return {"dT": p.dT, "dR": p.dR, "dV": p.dV, "dP": p.dP,
            "JRg": p.JRg, "JVg": p.JVg, "JVa": p.JVa,
            "JPg": p.JPg, "JPa": p.JPa,
            "bg0": p.bias_gyro, "ba0": p.bias_acc}


def _imu_info(p):
    C9 = np.asarray(p.C)[:9, :9] + np.eye(9) * 1e-8
    return jnp.asarray(np.linalg.inv(C9), jnp.float32)


def _project_obs(rng, X_w, pose_wb, noise=0.3):
    """World points -> (uvr [CAP,3] with ur=-1, valid) under pose_wb
    (camera == body here)."""
    R_wb, p_wb = pose_wb[:, :3], pose_wb[:, 3]
    Xc = (X_w - p_wb) @ R_wb            # R_wb^T (X - p)
    z = Xc[:, 2]
    uv = np.stack([K.fx * Xc[:, 0] / z + K.cx,
                   K.fy * Xc[:, 1] / z + K.cy], -1)
    uv += rng.normal(0, noise, uv.shape)
    valid = (z > 0.3) & (np.abs(uv[:, 0] - K.cx) < 370) \
        & (np.abs(uv[:, 1] - K.cy) < 235)
    uvr = np.concatenate([uv, np.full((len(uv), 1), -1.0)], -1)
    return jnp.asarray(uvr, jnp.float32), jnp.asarray(valid)


def _setup(rng, n_pts=CAP):
    dur, fps = 2.0, 10.0
    traj = syn.make_orbit_trajectory(duration=dur, fps=fps)
    imu = syn.synthesize_imu(rng, dur, noise_gyro=0, noise_acc=0,
                             bias_gyro_mag=0, bias_acc_mag=0)
    i_kf, i_a, i_b = 4, 5, 6
    # wall points in front of the outward-looking camera at i_kf..i_b
    center = traj.p_wb[i_a]
    look = traj.R_wb[i_a][:, 2]
    X = center + look * rng.uniform(2.5, 5.0, (n_pts, 1)) \
        + rng.normal(0, 1.2, (n_pts, 3))
    gt = {}
    for name, i in (("kf", i_kf), ("a", i_a), ("b", i_b)):
        gt[name] = {
            "pose": np.concatenate(
                [traj.R_wb[i], traj.p_wb[i][:, None]], -1).astype(np.float32),
            "vel": traj.v_wb[i].astype(np.float32),
            "t": traj.timestamps[i]}
    pre_a = _preint(imu, gt["kf"]["t"], gt["a"]["t"])
    pre_b = _preint(imu, gt["a"]["t"], gt["b"]["t"])
    return X, gt, pre_a, pre_b


def _perturb(rng, pose, dr=0.01, dp=0.03):
    dR = np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(0, dr, 3), jnp.float32)))
    out = pose.copy()
    out[:, :3] = out[:, :3] @ dR
    out[:, 3] += rng.normal(0, dp, 3)
    return out


def _run_two_frames(rng, opt, X, gt, pre_a, pre_b, use_prior):
    """Solve frame A (fixed prev, LastKeyFrame flavor) then frame B
    (optionally with A's marginalization prior)."""
    rw_info = jnp.asarray(np.full(6, 1e8), jnp.float32)
    no_prior_const = {
        "R0": jnp.eye(3), "p0": jnp.zeros(3), "v0": jnp.zeros(3),
        "bg0": jnp.zeros(3), "ba0": jnp.zeros(3)}
    uvr_a, valid_a = _project_obs(rng, X, gt["a"]["pose"])
    is2 = jnp.ones(CAP, jnp.float32)
    pose_a, v_a, bg_a, ba_a, _, n_a, H15_a = opt(
        jnp.asarray(_perturb(rng, gt["a"]["pose"])),
        jnp.asarray(gt["a"]["vel"] + rng.normal(0, 0.05, 3), jnp.float32),
        jnp.zeros(3), jnp.zeros(3), uvr_a, jnp.asarray(X, jnp.float32),
        valid_a, is2,
        jnp.asarray(gt["kf"]["pose"]), jnp.asarray(gt["kf"]["vel"]),
        _const(pre_a), _imu_info(pre_a), rw_info,
        no_prior_const, jnp.eye(15), False)

    uvr_b, valid_b = _project_obs(rng, X, gt["b"]["pose"])
    prior_const = {"R0": pose_a[:, :3], "p0": pose_a[:, 3], "v0": v_a,
                   "bg0": bg_a, "ba0": ba_a}
    H15_a_j = jnp.asarray(np.asarray(H15_a) + np.eye(15) * 1e-4,
                          jnp.float32)
    pose_b, v_b, bg_b, ba_b, _, n_b, H15_b = opt(
        jnp.asarray(_perturb(rng, gt["b"]["pose"])),
        jnp.asarray(gt["b"]["vel"] + rng.normal(0, 0.05, 3), jnp.float32),
        bg_a, ba_a, uvr_b, jnp.asarray(X, jnp.float32), valid_b, is2,
        pose_a, v_a, _const(pre_b), _imu_info(pre_b), rw_info,
        prior_const if use_prior else no_prior_const,
        H15_a_j if use_prior else jnp.eye(15),
        bool(use_prior))
    return (np.asarray(pose_a), np.asarray(v_a), np.asarray(H15_a),
            np.asarray(pose_b), np.asarray(v_b), np.asarray(H15_b),
            int(n_a), int(n_b))


def _pose_err(p, q):
    dR = p[:, :3].T @ q[:, :3]
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return ang, np.linalg.norm(p[:, 3] - q[:, 3])


def test_vi_prior_recursion_converges_and_H15_sane(rng):
    X, gt, pre_a, pre_b = _setup(rng)
    opt = KN.make_vi_pose_optimizer(K, CAP, Rcb, tcb, syn.GRAVITY)
    (pose_a, v_a, H15_a, pose_b, v_b, H15_b, n_a, n_b) = _run_two_frames(
        rng, opt, X, gt, pre_a, pre_b, use_prior=True)
    assert n_a > 20 and n_b > 20
    ang_a, dt_a = _pose_err(pose_a, gt["a"]["pose"])
    ang_b, dt_b = _pose_err(pose_b, gt["b"]["pose"])
    assert ang_a < 5e-3 and dt_a < 2e-2
    assert ang_b < 5e-3 and dt_b < 2e-2
    # H15: finite, symmetric, PSD (it is carried as an information
    # matrix through a cholesky whitening next frame)
    for H in (H15_a, H15_b):
        assert np.isfinite(H).all()
        assert np.allclose(H, H.T, atol=1e-2)
        w = np.linalg.eigvalsh(0.5 * (H + H.T))
        assert w.min() > -1e-2 * max(1.0, w.max())
    # the marginalized prior must carry pose information (hundreds of
    # pixels' worth), not be vacuous
    assert np.linalg.eigvalsh(H15_b)[0] >= -1e-2
    assert np.trace(H15_b[:6, :6]) > 10.0


def test_vi_prior_matches_batch_solve(rng):
    """Recursion (solve A -> marginalize -> prior -> solve B) vs the
    joint batch MAP over (KF fixed, A, B): for this mildly nonlinear
    problem the two must agree closely (they are identical in the
    linear limit — the reference relies on the same equivalence)."""
    X, gt, pre_a, pre_b = _setup(rng)
    opt = KN.make_vi_pose_optimizer(K, CAP, Rcb, tcb, syn.GRAVITY)
    (_, _, _, pose_b_rec, v_b_rec, _, _, _) = _run_two_frames(
        rng, opt, X, gt, pre_a, pre_b, use_prior=True)

    # batch: 3 pose states, KF fixed at GT; reprojections on A and B
    uvr_a, valid_a = _project_obs(rng, X, gt["a"]["pose"])
    uvr_b, valid_b = _project_obs(rng, X, gt["b"]["pose"])
    reproj = R.make_point_reproj_body(K, jnp.asarray(Rcb), jnp.asarray(tcb))
    states = {
        "pose": jnp.asarray(np.stack([
            gt["kf"]["pose"], _perturb(rng, gt["a"]["pose"]),
            _perturb(rng, gt["b"]["pose"])])),
        "vel": jnp.asarray(np.stack([
            gt["kf"]["vel"], gt["a"]["vel"] + rng.normal(0, 0.05, 3),
            gt["b"]["vel"] + rng.normal(0, 0.05, 3)]), jnp.float32),
        "bg": jnp.zeros((2, 3)), "ba": jnp.zeros((2, 3))}
    free = {"pose": jnp.asarray([False, True, True]),
            "vel": jnp.asarray([False, True, True]),
            "bg": jnp.asarray([True, True]),
            "ba": jnp.asarray([True, True])}
    mask_a, mask_b = valid_a, valid_b
    for _ in range(3):
        prob = E.Problem()
        prob.add_dense("pose", 3, 6, R.retract_pose_wb)
        prob.add_dense("vel", 3, 3, R.retract_additive)
        prob.add_dense("bg", 2, 3, R.retract_additive)
        prob.add_dense("ba", 2, 3, R.retract_additive)
        ones = jnp.ones(CAP, jnp.int32)
        prob.add_term(E.Term(
            name="reproj_a", res_fn=reproj, rdim=2,
            dense_refs=[("pose", ones)],
            const={"uv": uvr_a[:, :2], "X": jnp.asarray(X, jnp.float32)},
            mask=mask_a, info=jnp.ones(CAP),
            robust_delta=float(np.sqrt(5.991))))
        prob.add_term(E.Term(
            name="reproj_b", res_fn=reproj, rdim=2,
            dense_refs=[("pose", 2 * ones)],
            const={"uv": uvr_b[:, :2], "X": jnp.asarray(X, jnp.float32)},
            mask=mask_b, info=jnp.ones(CAP),
            robust_delta=float(np.sqrt(5.991))))
        for nm, pre, i1, i2, bi in (("in_a", pre_a, 0, 1, 0),
                                    ("in_b", pre_b, 1, 2, 1)):
            prob.add_term(E.Term(
                name=nm, res_fn=R.make_inertial(syn.GRAVITY), rdim=9,
                dense_refs=[("pose", jnp.asarray([i1])),
                            ("vel", jnp.asarray([i1])),
                            ("bg", jnp.asarray([bi])),
                            ("ba", jnp.asarray([bi])),
                            ("pose", jnp.asarray([i2])),
                            ("vel", jnp.asarray([i2]))],
                const=jax.tree_util.tree_map(lambda x: x[None], _const(pre)),
                mask=jnp.ones(1, bool), info=_imu_info(pre)[None]))
        prob.add_term(E.Term(
            name="bgrw", res_fn=R.bias_rw, rdim=3,
            dense_refs=[("bg", jnp.asarray([0])), ("bg", jnp.asarray([1]))],
            const=None, mask=jnp.ones(1, bool),
            info=jnp.full((1, 3), 1e8)))
        prob.add_term(E.Term(
            name="barw", res_fn=R.bias_rw, rdim=3,
            dense_refs=[("ba", jnp.asarray([0])), ("ba", jnp.asarray([1]))],
            const=None, mask=jnp.ones(1, bool),
            info=jnp.full((1, 3), 1e8)))
        states, _, chi2s = E.optimize(prob, states, iters=8,
                                      dense_free_mask=free)
        mask_a = valid_a & (chi2s["reproj_a"] < 5.991)
        mask_b = valid_b & (chi2s["reproj_b"] < 5.991)

    pose_b_batch = np.asarray(states["pose"][2])
    ang, dt = _pose_err(pose_b_rec, pose_b_batch)
    assert ang < 1e-2, f"rotation mismatch {ang}"
    assert dt < 3e-2, f"translation mismatch {dt}"


def test_vi_prior_stereo_variant(rng):
    """bf>0 kernel: stereo u_R rows join the inertial pose opt
    (reference EdgeStereoOnlyPose, src/Optimizer.cc:13659ff)."""
    bf = 0.05 * K.fx
    X, gt, pre_a, pre_b = _setup(rng)
    opt = KN.make_vi_pose_optimizer(K, CAP, Rcb, tcb, syn.GRAVITY, bf=bf)

    def add_ur(uvr, pose_wb):
        u = np.array(uvr)
        R_wb, p_wb = pose_wb[:, :3], pose_wb[:, 3]
        z = ((X - p_wb) @ R_wb)[:, 2]
        u[:, 2] = np.where(z > 0.3, u[:, 0] - bf / np.maximum(z, 0.3), -1.0)
        return jnp.asarray(u, jnp.float32)

    rw_info = jnp.asarray(np.full(6, 1e8), jnp.float32)
    no_prior = {"R0": jnp.eye(3), "p0": jnp.zeros(3), "v0": jnp.zeros(3),
                "bg0": jnp.zeros(3), "ba0": jnp.zeros(3)}
    uvr_a, valid_a = _project_obs(rng, X, gt["a"]["pose"])
    uvr_a = add_ur(uvr_a, gt["a"]["pose"])
    pose_a, v_a, bg_a, ba_a, inl, n_a, H15_a = opt(
        jnp.asarray(_perturb(rng, gt["a"]["pose"])),
        jnp.asarray(gt["a"]["vel"], jnp.float32),
        jnp.zeros(3), jnp.zeros(3), uvr_a, jnp.asarray(X, jnp.float32),
        valid_a, jnp.ones(CAP),
        jnp.asarray(gt["kf"]["pose"]), jnp.asarray(gt["kf"]["vel"]),
        _const(pre_a), _imu_info(pre_a), rw_info,
        no_prior, jnp.eye(15), False)
    assert int(n_a) > 20
    ang, dt = _pose_err(np.asarray(pose_a), gt["a"]["pose"])
    assert ang < 5e-3 and dt < 2e-2
    assert np.isfinite(np.asarray(H15_a)).all()
