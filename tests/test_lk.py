import numpy as np
import cv2
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import lk, pyramid

RNG = np.random.default_rng(3)


def textured_image(h=160, w=224):
    img = (RNG.random((h, w)) * 255).astype(np.float32)
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    return img


def shift_image(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def grid_points(h, w, margin=30, step=24):
    pts = [(x, y) for y in range(margin, h - margin, step)
           for x in range(margin, w - margin, step)]
    return np.array(pts, np.float32)


def test_lk_recovers_known_shift():
    img0 = textured_image()
    dx, dy = 3.3, -2.1
    img1 = shift_image(img0, dx, dy)
    pts = grid_points(*img0.shape)
    p0 = tuple(jnp.asarray(p) for p in pyramid.build_pyramid(jnp.asarray(img0), 4))
    p1 = tuple(jnp.asarray(p) for p in pyramid.build_pyramid(jnp.asarray(img1), 4))
    nxt, ok = lk.track(p0, p1, jnp.asarray(pts), levels=3)
    nxt, ok = np.asarray(nxt), np.asarray(ok)
    assert ok.mean() > 0.9
    err = nxt[ok] - (pts[ok] + [dx, dy])
    assert np.median(np.linalg.norm(err, axis=1)) < 0.15


def test_lk_large_shift_needs_pyramid():
    img0 = textured_image()
    dx, dy = 14.0, 9.0
    img1 = shift_image(img0, dx, dy)
    pts = grid_points(*img0.shape, margin=40)
    p0 = tuple(pyramid.build_pyramid(jnp.asarray(img0), 4))
    p1 = tuple(pyramid.build_pyramid(jnp.asarray(img1), 4))
    nxt, ok = lk.track(p0, p1, jnp.asarray(pts), levels=4)
    nxt, ok = np.asarray(nxt), np.asarray(ok)
    err = np.linalg.norm(nxt[ok] - (pts[ok] + [dx, dy]), axis=1)
    assert np.median(err) < 0.5


def test_lk_matches_cv2():
    img0 = textured_image()
    img1 = shift_image(img0, 4.7, 1.9)
    pts = grid_points(*img0.shape)
    p0 = tuple(pyramid.build_pyramid(jnp.asarray(img0), 4))
    p1 = tuple(pyramid.build_pyramid(jnp.asarray(img1), 4))
    ours, ok = lk.track(p0, p1, jnp.asarray(pts), levels=3)
    cv_pts, st, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8), pts.reshape(-1, 1, 2), None,
        winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01))
    cv_pts = cv_pts.reshape(-1, 2)
    st = st.reshape(-1).astype(bool)
    both = np.asarray(ok) & st
    assert both.mean() > 0.8
    d = np.linalg.norm(np.asarray(ours)[both] - cv_pts[both], axis=1)
    assert np.median(d) < 0.3


def test_circular_track_consistency():
    # Synthetic "stereo+temporal" quad: pure horizontal disparity between
    # L and R, small motion between t1 and t2.
    base = textured_image()
    disp = 6.0
    t1l = base
    t1r = shift_image(base, -disp, 0.0)
    t2l = shift_image(base, 2.0, 0.5)
    t2r = shift_image(t1r, 2.0, 0.5)
    pts = grid_points(*base.shape, margin=40)
    pyrs = tuple(tuple(pyramid.build_pyramid(jnp.asarray(im), 4))
                 for im in (t1l, t1r, t2r, t2l))
    out = lk.circular_track(pyrs, jnp.asarray(pts), jnp.ones(len(pts), bool),
                            feature_match_error=1.0, cycle_error=1.0)
    valid = np.asarray(out["valid"])
    assert valid.mean() > 0.7
    # Disparity recovered.
    d = np.asarray(out["t1l"])[valid, 0] - np.asarray(out["t1r"])[valid, 0]
    assert np.abs(np.median(d) - disp) < 0.2
    # Temporal flow recovered.
    fl = np.asarray(out["t2l"])[valid] - np.asarray(out["t1l"])[valid]
    assert np.abs(np.median(fl[:, 0]) - 2.0) < 0.2
    assert np.abs(np.median(fl[:, 1]) - 0.5) < 0.2


def test_circular_track_rejects_epipolar_violation():
    base = textured_image()
    t1l = base
    t1r = shift_image(base, -5.0, 4.0)  # vertical offset: epipolar violation
    pts = grid_points(*base.shape, margin=40)
    pyrs = tuple(tuple(pyramid.build_pyramid(jnp.asarray(im), 4))
                 for im in (t1l, t1r, t1r, t1l))
    out = lk.circular_track(pyrs, jnp.asarray(pts), jnp.ones(len(pts), bool),
                            feature_match_error=1.0)
    assert np.asarray(out["valid"]).mean() < 0.1


def test_disparity_sweep_recovers_shift():
    """Plane-sweep prior: known-disparity rectified pair at a coarse level."""
    import numpy as np
    import cv2
    import jax.numpy as jnp
    from stereo_visual_odometry_tpu.ops import stereo_sweep

    rng = np.random.default_rng(5)
    h, w, d_true = 96, 320, 11
    right = cv2.GaussianBlur((rng.random((h, w)) * 255).astype(np.float32),
                             (7, 7), 1.5)
    # left = right shifted right by d_true (so disparity = d_true)
    left = np.roll(right, d_true, axis=1)
    dmap = np.asarray(stereo_sweep.disparity_sweep(
        jnp.asarray(left), jnp.asarray(right), d_max=32))
    inner = dmap[10:-10, d_true + 10:-10]
    assert np.median(np.abs(inner - d_true)) <= 1.0, np.median(inner)
    # sample_map scales back to level-0 coords
    xy = jnp.asarray([[80.0, 40.0], [200.0, 80.0]]) * 4.0
    d0 = np.asarray(stereo_sweep.sample_map(jnp.asarray(dmap), xy, 4.0))
    assert np.all(np.abs(d0 - 4 * d_true) <= 4.0)
