import numpy as np
import cv2
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import orb, match

RNG = np.random.default_rng(5)


def textured_image(h=192, w=256):
    img = (RNG.random((h, w)) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    return img


def shift_image(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def rotate_image(img, deg):
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    return cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


def test_popcount():
    x = np.array([0, 1, 0xFFFFFFFF, 0x0F0F0F0F, 0x12345678], dtype=np.uint32)
    expected = np.array([bin(int(v)).count("1") for v in x])
    got = np.asarray(match.popcount_u32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, expected)


def test_hamming_matrix_brute_force():
    a = RNG.integers(0, 2**32, size=(17, 8), dtype=np.uint32)
    b = RNG.integers(0, 2**32, size=(23, 8), dtype=np.uint32)
    d = np.asarray(match.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(17):
        for j in range(0, 23, 5):
            expected = sum(bin(int(a[i, k] ^ b[j, k])).count("1") for k in range(8))
            assert d[i, j] == expected


def test_orb_detects_and_fills_budget():
    img = textured_image()
    out = orb.detect_and_describe(jnp.asarray(img), n_features=500, levels=4)
    valid = np.asarray(out["valid"])
    assert out["xy"].shape == (500, 2)
    assert out["desc"].shape == (500, 8)
    assert valid.mean() > 0.5
    xy = np.asarray(out["xy"])[valid]
    assert xy[:, 0].max() < img.shape[1] and xy[:, 1].max() < img.shape[0]


def test_orb_descriptors_match_under_translation():
    img0 = textured_image()
    img1 = shift_image(img0, 7.0, 3.0)
    f0 = orb.detect_and_describe(jnp.asarray(img0), n_features=300, levels=4)
    f1 = orb.detect_and_describe(jnp.asarray(img1), n_features=300, levels=4)
    d = match.hamming_matrix(f0["desc"], f1["desc"], f0["valid"], f1["valid"])
    idx, best = match.match_best(d)
    mut = match.mutual_mask(d, idx)
    good = np.asarray(mut) & np.asarray(f0["valid"]) & (np.asarray(best) < 50)
    assert good.mean() > 0.3, good.mean()
    # Matched displacement must equal the shift.
    xy0 = np.asarray(f0["xy"])[good]
    xy1 = np.asarray(f1["xy"])[np.asarray(idx)[good]]
    disp = xy1 - xy0
    med = np.median(disp, axis=0)
    assert np.allclose(med, [7.0, 3.0], atol=1.0), med


def test_orb_rotation_invariance():
    img0 = textured_image(256, 256)
    img1 = rotate_image(img0, 30.0)
    f0 = orb.detect_and_describe(jnp.asarray(img0), n_features=300, levels=4)
    f1 = orb.detect_and_describe(jnp.asarray(img1), n_features=300, levels=4)
    d = match.hamming_matrix(f0["desc"], f1["desc"], f0["valid"], f1["valid"])
    idx, best = match.match_best(d)
    mut = np.asarray(match.mutual_mask(d, idx))
    good = mut & np.asarray(f0["valid"]) & (np.asarray(best) < 60)
    # Verify matches actually correspond via the known rotation:
    # warpAffine maps p_dst = M @ [p_src, 1].
    h, w = 256, 256
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 30.0, 1.0)
    xy0 = np.asarray(f0["xy"])[good]
    pred = xy0 @ M[:, :2].T + M[:, 2]
    xy1 = np.asarray(f1["xy"])[np.asarray(idx)[good]]
    err = np.linalg.norm(pred - xy1, axis=1)
    frac_correct = (err < 3.0).mean() if len(err) else 0.0
    assert frac_correct > 0.5, (good.mean(), frac_correct)


def test_stereo_temporal_match_pipeline():
    base = textured_image(192, 256)
    disp = 9.0
    t1l = base
    t1r = shift_image(base, -disp, 0.0)
    t2l = shift_image(base, 3.0, 0.0)
    f_t1l = orb.detect_and_describe(jnp.asarray(t1l), n_features=300, levels=4)
    f_t1r = orb.detect_and_describe(jnp.asarray(t1r), n_features=300, levels=4)
    f_t2l = orb.detect_and_describe(jnp.asarray(t2l), n_features=300, levels=4)
    out = match.stereo_temporal_match(f_t1l, f_t1r, f_t2l,
                                      feature_match_error=2.0)
    v = np.asarray(out["valid"])
    assert v.sum() > 20, v.sum()
    xy_l = np.asarray(f_t1l["xy"])[v]
    xy_r = np.asarray(f_t1r["xy"])[np.asarray(out["idx_r"])[v]]
    d = xy_l[:, 0] - xy_r[:, 0]
    assert np.abs(np.median(d) - disp) < 1.0
    # Epipolar gate enforced.
    assert np.all(np.abs(xy_l[:, 1] - xy_r[:, 1]) < 2.0)


def test_pair_extraction_matches_single():
    """detect_and_describe_pair == two detect_and_describe calls."""
    import numpy as np
    import jax.numpy as jnp
    from stereo_visual_odometry_tpu.ops import orb

    rng = np.random.default_rng(3)
    img_l = (rng.random((160, 256)) * 255).astype(np.float32)
    img_r = np.roll(img_l, 7, axis=1)
    kw = dict(n_features=128, levels=4, cell=32, k_per_cell=4)
    fl, fr = orb.detect_and_describe_pair(jnp.asarray(img_l), jnp.asarray(img_r), **kw)
    sl = orb.detect_and_describe(jnp.asarray(img_l), **kw)
    sr = orb.detect_and_describe(jnp.asarray(img_r), **kw)
    for pair, single in ((fl, sl), (fr, sr)):
        assert np.array_equal(np.asarray(pair["valid"]), np.asarray(single["valid"]))
        v = np.asarray(single["valid"])
        assert np.allclose(np.asarray(pair["xy"])[v], np.asarray(single["xy"])[v],
                           atol=1e-4)
        assert np.array_equal(np.asarray(pair["level"]), np.asarray(single["level"]))
        # descriptors bit-identical on valid slots
        assert np.array_equal(np.asarray(pair["desc"])[v], np.asarray(single["desc"])[v])
