"""Pallas LK kernel parity vs the XLA formulation (interpret mode on CPU)."""
import numpy as np
import cv2
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import lk, lk_pallas, pyramid

RNG = np.random.default_rng(11)


def textured(h=128, w=192):
    img = (RNG.random((h, w)) * 255).astype(np.float32)
    return cv2.GaussianBlur(img, (7, 7), 2.0)


def shift(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def test_pallas_level_matches_xla_level():
    img0 = textured()
    img1 = shift(img0, 2.7, -1.4)
    pts = np.array([(x, y) for y in range(30, 100, 16) for x in range(30, 160, 16)],
                   np.float32)
    n = len(pts) - len(pts) % lk_pallas.BLK
    pts = jnp.asarray(pts[:n])
    guess = jnp.zeros_like(pts)

    f_x, ok_x = lk._level_track(jnp.asarray(img0), jnp.asarray(img1), pts, guess,
                                21, 30, 0.01, 1e-4, 6)
    pad = 12
    ip = jnp.pad(jnp.asarray(img0), pad, mode="edge")
    inx = jnp.pad(jnp.asarray(img1), pad, mode="edge")
    f_p, ok_p = lk_pallas.level_track_pallas(ip, inx, pts, guess, win=21,
                                             iters=30, search_radius=6, pad=pad,
                                             interpret=True)
    ok_both = np.asarray(ok_x) & np.asarray(ok_p)
    assert ok_both.mean() > 0.8
    d = np.linalg.norm(np.asarray(f_x)[ok_both] - np.asarray(f_p)[ok_both], axis=1)
    assert np.max(d) < 0.05, d.max()
    # And both recover the true shift.
    err = np.linalg.norm(np.asarray(f_p)[ok_both] - [2.7, -1.4], axis=1)
    assert np.median(err) < 0.1


def test_pallas_full_track_parity():
    img0 = textured(160, 224)
    img1 = shift(img0, 6.0, 3.5)
    pts = np.array([(x, y) for y in range(40, 120, 24) for x in range(40, 180, 24)],
                   np.float32)
    p0 = tuple(pyramid.build_pyramid(jnp.asarray(img0), 4))
    p1 = tuple(pyramid.build_pyramid(jnp.asarray(img1), 4))
    # interpret-mode pallas via monkeypatched call path
    import stereo_visual_odometry_tpu.ops.lk_pallas as lp
    orig = lp.level_track_pallas

    def interp_version(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    lp.level_track_pallas = interp_version
    try:
        n_p, ok_p = lk.track(p0, p1, jnp.asarray(pts), levels=3, use_pallas=True,
                             pallas_kernel="v1")
    finally:
        lp.level_track_pallas = orig
    n_x, ok_x = lk.track(p0, p1, jnp.asarray(pts), levels=3, use_pallas=False)
    both = np.asarray(ok_p) & np.asarray(ok_x)
    assert both.mean() > 0.8
    d = np.linalg.norm(np.asarray(n_p)[both] - np.asarray(n_x)[both], axis=1)
    assert np.max(d) < 0.1, d.max()
    err = np.linalg.norm(np.asarray(n_p)[both] - (pts[both] + [6.0, 3.5]), axis=1)
    assert np.median(err) < 0.2


def test_cell_full_track_parity():
    """lk.track with the cell kernel (default) vs XLA, interpret mode."""
    import stereo_visual_odometry_tpu.ops.lk_pallas_cell as lpc

    img0 = textured(160, 224)
    img1 = shift(img0, 6.0, 3.5)
    pts = np.array([(x, y) for y in range(40, 120, 24) for x in range(40, 180, 24)],
                   np.float32)
    p0 = tuple(pyramid.build_pyramid(jnp.asarray(img0), 4))
    p1 = tuple(pyramid.build_pyramid(jnp.asarray(img1), 4))
    orig = lpc.level_track_pallas_cell

    def interp_version(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    lpc.level_track_pallas_cell = interp_version
    try:
        n_p, ok_p = lk.track(p0, p1, jnp.asarray(pts), levels=3, use_pallas=True,
                             pallas_kernel="cell")
    finally:
        lpc.level_track_pallas_cell = orig
    n_x, ok_x = lk.track(p0, p1, jnp.asarray(pts), levels=3, use_pallas=False)
    both = np.asarray(ok_p) & np.asarray(ok_x)
    assert both.mean() > 0.8
    d = np.linalg.norm(np.asarray(n_p)[both] - np.asarray(n_x)[both], axis=1)
    assert np.max(d) < 0.1, d.max()
    err = np.linalg.norm(np.asarray(n_p)[both] - (pts[both] + [6.0, 3.5]), axis=1)
    assert np.median(err) < 0.2


def test_cell_kernel_matches_xla_level():
    """Cell-blend kernel (the production TPU kernel): parity vs XLA LK."""
    from stereo_visual_odometry_tpu.ops import lk_pallas_cell

    img0 = textured()
    img1 = shift(img0, 2.7, -1.4)
    pts = np.array([(x, y) for y in range(30, 100, 16) for x in range(30, 160, 16)],
                   np.float32)
    n = len(pts) - len(pts) % lk_pallas_cell.BLK
    pts = jnp.asarray(pts[:n])
    guess = jnp.zeros_like(pts)
    f_x, ok_x = lk._level_track(jnp.asarray(img0), jnp.asarray(img1), pts, guess,
                                21, 30, 0.01, 1e-4, 6)
    pad = 12
    ip = jnp.pad(jnp.asarray(img0), pad, mode="edge")
    inx = jnp.pad(jnp.asarray(img1), pad, mode="edge")
    f_p, ok_p = lk_pallas_cell.level_track_pallas_cell(
        ip, inx, pts, guess, win=21, iters=30, search_radius=6, pad=pad,
        interpret=True)
    ok_both = np.asarray(ok_x) & np.asarray(ok_p)
    assert ok_both.mean() > 0.8
    d = np.linalg.norm(np.asarray(f_x)[ok_both] - np.asarray(f_p)[ok_both], axis=1)
    # The bilinear-RHS expansion reassociates float sums; tolerance is wider
    # than v1's bit-level agreement but still far below matching thresholds.
    assert np.max(d) < 0.05, d.max()
    err = np.linalg.norm(np.asarray(f_p)[ok_both] - [2.7, -1.4], axis=1)
    assert np.median(err) < 0.1


def test_cell_kernel_nonzero_guess():
    """Cell kernel with an incoming guess (the pyramid hand-off path)."""
    from stereo_visual_odometry_tpu.ops import lk_pallas_cell

    img0 = textured(160, 224)
    img1 = shift(img0, 3.4, 1.9)
    pts = np.array([(x, y) for y in range(40, 120, 24) for x in range(40, 180, 24)],
                   np.float32)
    n = len(pts) - len(pts) % lk_pallas_cell.BLK
    pts = jnp.asarray(pts[:n])
    guess = jnp.full_like(pts, 1.5)  # deliberately offset start
    pad = 12
    ip = jnp.pad(jnp.asarray(img0), pad, mode="edge")
    inx = jnp.pad(jnp.asarray(img1), pad, mode="edge")
    f_c, ok_c = lk_pallas_cell.level_track_pallas_cell(
        ip, inx, pts, guess, win=21, iters=30, search_radius=6, pad=pad,
        interpret=True)
    f_1, ok_1 = lk_pallas.level_track_pallas(
        ip, inx, pts, guess, win=21, iters=30, search_radius=6, pad=pad,
        interpret=True)
    both = np.asarray(ok_c) & np.asarray(ok_1)
    assert both.mean() > 0.8
    d = np.linalg.norm(np.asarray(f_c)[both] - np.asarray(f_1)[both], axis=1)
    assert np.max(d) < 0.05, d.max()


def test_cell_kernel_custom_vmap_batch_rule():
    """vmapped cell kernel == per-sequence calls (stacked-image batch rule)."""
    import jax
    from stereo_visual_odometry_tpu.ops import lk_pallas_cell

    img0a = textured(128, 192)
    img0b = textured(128, 192) + 3.0
    img1a = shift(img0a, 2.0, -1.0)
    img1b = shift(img0b, -1.5, 2.5)
    pts = np.array([(x, y) for y in range(30, 100, 16) for x in range(30, 160, 16)],
                   np.float32)
    n = len(pts) - len(pts) % lk_pallas_cell.BLK
    pts = jnp.asarray(pts[:n])
    guess = jnp.zeros_like(pts)
    pad = 12
    ih, iw = 128 + 2 * pad, 192 + 2 * pad
    pads = ((pad, pad + (-ih) % 8), (pad, pad + (-iw) % 128))
    prep = lambda im: jnp.pad(jnp.asarray(im), pads, mode="edge")
    ips = jnp.stack([prep(img0a), prep(img0b)])
    inxs = jnp.stack([prep(img1a), prep(img1b)])

    fn = lambda ip, inx: lk_pallas_cell.level_track_pallas_cell(
        ip, inx, pts, guess, win=21, iters=30, search_radius=6, pad=pad,
        interpret=True)
    f_b, ok_b = jax.vmap(fn)(ips, inxs)
    for s in range(2):
        f_s, ok_s = fn(ips[s], inxs[s])
        both = np.asarray(ok_s) & np.asarray(ok_b[s])
        assert both.mean() > 0.8
        d = np.linalg.norm(np.asarray(f_s)[both] - np.asarray(f_b[s])[both], axis=1)
        assert d.max() < 1e-2, d.max()
