"""Front-end tests: FAST/ORB extraction quality on synthetic imagery,
detector parity vs OpenCV FAST on the same image, descriptor matching
repeatability across viewpoint change."""
import numpy as np
import jax.numpy as jnp
import cv2

from plvio_tpu.ops import frontend as FE
from plvio_tpu.ops import matching as M
from plvio_tpu.io import synthetic as syn


def _render_pair(rng, baseline=0.06):
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=2.0, radius=0.6)
    i0, i1 = 0, 4
    img0 = syn.render_frame(scene, traj.R_wb[i0], traj.p_wb[i0], rng=rng)
    img1 = syn.render_frame(scene, traj.R_wb[i1], traj.p_wb[i1], rng=rng)
    return scene, traj, i0, i1, img0, img1


def test_fast_detects_opencv_corners(rng):
    """Our dense FAST should fire on (a superset of) OpenCV FAST corners."""
    scene = syn.make_room_scene(rng, n_points=3000, n_lines=0)
    traj = syn.make_orbit_trajectory(duration=1.0, radius=0.6)
    img = syn.render_frame(scene, traj.R_wb[0], traj.p_wb[0], rng=None, noise=0)

    resp = np.asarray(FE.nms3x3(FE.fast_response(jnp.asarray(img), 20.0)))
    ours = np.stack(np.nonzero(resp > 0), -1)  # (y,x)

    fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = fast.detect(img.astype(np.uint8), None)
    cv_pts = np.array([[kp.pt[1], kp.pt[0]] for kp in kps]) if kps else np.zeros((0, 2))
    cv_pts = cv_pts[(cv_pts[:, 0] > 10) & (cv_pts[:, 0] < img.shape[0] - 10)
                    & (cv_pts[:, 1] > 10) & (cv_pts[:, 1] < img.shape[1] - 10)]

    assert len(ours) > 50
    assert len(cv_pts) > 50
    # each OpenCV corner has one of ours within 2 px
    d = np.linalg.norm(cv_pts[:, None, :] - ours[None, :, :], axis=-1).min(1)
    assert (d <= 2.0).mean() > 0.9, (d <= 2.0).mean()


def test_extractor_shapes_and_validity(rng):
    scene = syn.make_room_scene(rng, n_points=4000)
    traj = syn.make_orbit_trajectory(duration=1.0, radius=0.6)
    img = syn.render_frame(scene, traj.R_wb[0], traj.p_wb[0], rng=rng)
    run, specs = FE.make_extractor(480, 752, n_features=500)
    feats = run(jnp.asarray(img))
    n = feats.uv.shape[0]
    assert feats.desc.shape == (n, 256)
    assert int(feats.valid.sum()) > 100
    uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 752
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() < 480
    # spatial spread: keypoints cover a decent area
    assert uv[:, 0].std() > 80 and uv[:, 1].std() > 50


def test_descriptor_matching_across_viewpoint(rng):
    """Features matched between two nearby rendered frames must agree with
    the oracle geometry (projection of the same 3D points)."""
    scene, traj, i0, i1, img0, img1 = _render_pair(rng)
    run, _ = FE.make_extractor(480, 752, n_features=800)
    f0 = run(jnp.asarray(img0))
    f1 = run(jnp.asarray(img1))

    dist = M.hamming_matrix(f0.desc, f1.desc)
    gate = M.window_gate(f0.uv, f1.uv, 60.0)
    idx, ok = M.match_nn_ratio(dist, f0.valid, f1.valid, gate,
                               max_dist=80.0, ratio=0.85)
    ok_n = int(ok.sum())
    assert ok_n > 60, ok_n

    # verify against oracle: matched pixels correspond to same 3D point
    K = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375, width=752, height=480)
    uv0, _, vis0, _, _ = syn.project_scene(scene, traj.R_wb[i0], traj.p_wb[i0], **K)
    uv1, _, vis1, _, _ = syn.project_scene(scene, traj.R_wb[i1], traj.p_wb[i1], **K)
    p0 = np.asarray(f0.uv)[np.asarray(ok)]
    p1 = np.asarray(f1.uv)[np.asarray(idx)[np.asarray(ok)]]
    # nearest scene point to each detection in frame0
    d0 = np.linalg.norm(p0[:, None] - uv0[None, vis0 & vis1], axis=-1)
    j = d0.argmin(1)
    near_pts = d0[np.arange(len(p0)), j] < 4.0
    pred1 = uv1[vis0 & vis1][j]
    err = np.linalg.norm(p1 - pred1, axis=-1)
    good = (err < 4.0)[near_pts]
    assert good.mean() > 0.75, good.mean()


def test_rotation_invariance(rng):
    """Descriptors survive in-plane rotation (the point of steered BRIEF)."""
    scene = syn.make_room_scene(rng, n_points=3000, n_lines=0)
    traj = syn.make_orbit_trajectory(duration=1.0, radius=0.6)
    img0 = syn.render_frame(scene, traj.R_wb[0], traj.p_wb[0], rng=None, noise=0)
    center = (376, 240)
    Mrot = cv2.getRotationMatrix2D(center, 20.0, 1.0)
    img1 = cv2.warpAffine(img0, Mrot, (752, 480), borderValue=128.0)

    run, _ = FE.make_extractor(480, 752, n_features=500)
    f0 = run(jnp.asarray(img0))
    f1 = run(jnp.asarray(img1))
    # predicted location of f0 keypoints in rotated image
    uv0 = np.asarray(f0.uv)
    uv0h = np.concatenate([uv0, np.ones((len(uv0), 1))], 1)
    uv_pred = (Mrot @ uv0h.T).T

    dist = M.hamming_matrix(f0.desc, f1.desc)
    gate = M.window_gate(jnp.asarray(uv_pred, jnp.float32), f1.uv, 4.0)
    idx, ok = M.match_nn_ratio(dist, f0.valid, f1.valid, gate,
                               max_dist=80.0, ratio=0.9)
    assert int(ok.sum()) > 50, int(ok.sum())
