"""Line detector unit tests: both the LSD-like cell detector and the
EDLines-like anchor-walk detector (reference `extractor` flag 0/1,
src/LineExtractor.cc:45-60) must recover drawn segments."""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.ops import lines as LN


def _draw_segments(H=240, W=320, segs=(), width=2.0, contrast=80.0):
    """Render bright anti-aliased segments on a mid-gray noisy background."""
    img = np.full((H, W), 100.0, np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for (x0, y0, x1, y1) in segs:
        dx, dy = x1 - x0, y1 - y0
        L = np.hypot(dx, dy)
        ux, uy = dx / L, dy / L
        t = (xx - x0) * ux + (yy - y0) * uy
        d = np.abs(-(xx - x0) * uy + (yy - y0) * ux)
        on = (t >= 0) & (t <= L) & (d <= width)
        img[on] += contrast * np.maximum(0.0, 1.0 - d[on] / width)
    return img


SEGS = [(40.0, 50.0, 260.0, 60.0),     # near-horizontal
        (80.0, 200.0, 90.0, 40.0),     # near-vertical
        (150.0, 80.0, 280.0, 200.0)]   # diagonal


def _recall(ep, valid, segs, tol_px=6.0, tol_ang=0.12):
    ep = np.asarray(ep)[np.asarray(valid)]
    found = 0
    for (x0, y0, x1, y1) in segs:
        ga = np.arctan2(y1 - y0, x1 - x0) % np.pi
        gm = np.array([(x0 + x1) / 2, (y0 + y1) / 2])
        for e in ep:
            a = np.arctan2(e[3] - e[1], e[2] - e[0]) % np.pi
            da = min(abs(a - ga), np.pi - abs(a - ga))
            m = np.array([(e[0] + e[2]) / 2, (e[1] + e[3]) / 2])
            # midpoint of GT near the detected infinite line
            u = np.array([np.cos(a), np.sin(a)])
            perp = abs(-(gm[0] - m[0]) * u[1] + (gm[1] - m[1]) * u[0])
            if da < tol_ang and perp < tol_px:
                found += 1
                break
    return found


@pytest.mark.parametrize("detector", [0, 1])
def test_detects_drawn_segments(rng, detector):
    img = _draw_segments(segs=SEGS)
    img += rng.normal(0, 2.0, img.shape).astype(np.float32)
    det = LN.detect_lines_ed if detector == 1 else LN.detect_lines
    ep, ang, length, valid, _ = det(jnp.asarray(img), max_lines=64)
    assert _recall(ep, valid, SEGS) == len(SEGS), \
        f"detector={detector} missed segments"


@pytest.mark.parametrize("detector", [0, 1])
def test_degenerate_images(detector):
    det = LN.detect_lines_ed if detector == 1 else LN.detect_lines
    for img in (np.zeros((240, 320), np.float32),
                np.full((240, 320), 255.0, np.float32)):
        ep, ang, length, valid, _ = det(jnp.asarray(img), max_lines=64)
        assert not np.asarray(valid).any()
        assert np.isfinite(np.asarray(ep)).all()


def test_ed_full_frontend(rng):
    """extract_lines(detector=1) produces descriptors with the same
    contract as the default path."""
    img = _draw_segments(segs=SEGS)
    img += rng.normal(0, 2.0, img.shape).astype(np.float32)
    lf = LN.extract_lines(jnp.asarray(img), max_lines=64, detector=1)
    v = np.asarray(lf.valid)
    assert v.sum() >= 3
    assert np.isfinite(np.asarray(lf.lineq)).all()
    d = np.asarray(lf.desc, np.float32)
    assert set(np.unique(d[v])) <= {-1.0, 1.0}


def test_line_triangulator_two_view():
    """Interpretation-plane line triangulation: exact recovery, noise
    robustness at a usable baseline, and rejection of mismatched pairs
    (reference CreateNewMapLines endpoint back-projection,
    src/LocalMapping.cc:1157-1280)."""
    import jax.numpy as jnp
    from plvio_tpu.models.kernels import make_line_triangulator
    from plvio_tpu.solver.residuals import PinholeK

    K = PinholeK(fx=458.0, fy=457.0, cx=367.0, cy=248.0)
    cap = 8
    rng = np.random.default_rng(0)
    Xs = np.array([[0.3, 0.2, 1.5], [-0.5, 0.1, 2.0],
                   [0.0, -0.3, 1.2], [0.4, 0.4, 3.0]] * 2, np.float32)
    Xe = Xs + np.array([[0.5, 0.1, 0.2], [0.0, 0.6, 0.1],
                        [0.4, 0.0, 0.3], [0.2, 0.5, 0.0]] * 2, np.float32)
    R = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    t2 = np.array([-0.3, 0.05, 0.0], np.float32)

    def proj(t, X):
        pc = X + t
        return np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                         K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)

    ep1 = np.concatenate([proj(t1, Xs), proj(t1, Xe)], -1).astype(np.float32)
    ep2 = np.concatenate([proj(t2, Xs), proj(t2, Xe)], -1).astype(np.float32)
    pose1 = np.concatenate([R, t1[:, None]], 1)
    pose2 = np.concatenate([R, t2[:, None]], 1)
    tri = make_line_triangulator(K, cap)
    valid = np.ones(cap, bool)

    # exact observations: all pass, endpoints recovered to float precision
    XsA, XeA, good = tri(jnp.asarray(pose1), jnp.asarray(pose2),
                         jnp.asarray(ep1), jnp.asarray(ep2),
                         jnp.asarray(valid))
    assert np.asarray(good).all()
    assert np.linalg.norm(np.asarray(XsA) - Xs, axis=1).max() < 1e-3
    assert np.linalg.norm(np.asarray(XeA) - Xe, axis=1).max() < 1e-3

    # 0.5 px observation noise: all pass, error stays small at 0.3 m base
    ep1n = ep1 + rng.normal(0, 0.5, ep1.shape).astype(np.float32)
    ep2n = ep2 + rng.normal(0, 0.5, ep2.shape).astype(np.float32)
    XsA, XeA, good = tri(jnp.asarray(pose1), jnp.asarray(pose2),
                         jnp.asarray(ep1n), jnp.asarray(ep2n),
                         jnp.asarray(valid))
    assert np.asarray(good).all()
    assert np.linalg.norm(np.asarray(XsA) - Xs, axis=1).max() < 0.1

    # a zero-baseline pair is always degenerate
    _, _, good = tri(jnp.asarray(pose1), jnp.asarray(pose1),
                     jnp.asarray(ep1), jnp.asarray(ep1), jnp.asarray(valid))
    assert not np.asarray(good).any()

    # mismatched correspondences: most must be rejected
    perm = np.roll(np.arange(cap), 1)
    _, _, good = tri(jnp.asarray(pose1), jnp.asarray(pose2),
                     jnp.asarray(ep1n), jnp.asarray(ep2n[perm]),
                     jnp.asarray(valid))
    assert np.asarray(good).sum() <= cap // 2


def test_line_pyramid_zoom_reobservation(rng):
    """2-level line pyramid (reference builds a 2-level Gaussian pyramid
    at scale 2.0, src/LineExtractor.cc:45-154): LBD descriptors of the
    same physical segments must match across a 1.6x zoom — the coarse
    level keeps long structures detectable and their band statistics
    stable under scale change."""
    from plvio_tpu.ops import matching as M

    segs = [(30, 40, 280, 55), (60, 190, 75, 30), (130, 70, 290, 210),
            (20, 120, 300, 135)]
    img0 = _draw_segments(segs=segs)
    img0 += rng.normal(0, 2.0, img0.shape).astype(np.float32)
    # zoomed view: scale around the image center by 1.6
    H, W = img0.shape
    s = 1.6
    cx, cy = W / 2, H / 2
    zsegs = [((x0 - cx) * s + cx, (y0 - cy) * s + cy,
              (x1 - cx) * s + cx, (y1 - cy) * s + cy)
             for (x0, y0, x1, y1) in segs]
    img1 = _draw_segments(segs=zsegs)
    img1 += rng.normal(0, 2.0, img1.shape).astype(np.float32)

    f0 = LN.extract_lines_pyramid(jnp.asarray(img0), 128)
    f1 = LN.extract_lines_pyramid(jnp.asarray(img1), 128)
    assert int(f0.valid.sum()) >= 3 and int(f1.valid.sum()) >= 3

    dist = np.array(M.hamming_matrix(f0.desc, f1.desc))
    dist[~np.asarray(f0.valid)] = 1e9
    dist[:, ~np.asarray(f1.valid)] = 1e9
    # per true segment: some detection pair across the zoom must agree
    # in descriptor (Hamming < 90/256) and geometry (angle)
    ep0, ep1 = np.asarray(f0.ep), np.asarray(f1.ep)
    n_reobs = 0
    for (x0, y0, x1, y1) in segs:
        ga = np.arctan2(y1 - y0, x1 - x0) % np.pi
        def near(ep, a_ref, tol=0.1):
            a = np.arctan2(ep[:, 3] - ep[:, 1], ep[:, 2] - ep[:, 0]) % np.pi
            da = np.minimum(np.abs(a - a_ref), np.pi - np.abs(a - a_ref))
            return da < tol
        i0 = np.nonzero(near(ep0, ga) & np.asarray(f0.valid))[0]
        i1 = np.nonzero(near(ep1, ga) & np.asarray(f1.valid))[0]
        if len(i0) and len(i1) and dist[np.ix_(i0, i1)].min() < 90:
            n_reobs += 1
    assert n_reobs >= 3, f"only {n_reobs}/4 segments re-observed under zoom"
