"""ORB hardware parity (VERDICT r4 next #5).

The r4 f32-precision episode (CPU fine, hardware broken — commit 697de2c)
is why this suite exists: the ORB path's hardware-specific numerics —
MXU BRIEF contraction (``orb.py brief_bits_from_patches``), 39x39
Pallas patch extraction — get on-chip checks against independent
formulations (XLA gathers, numpy f64 contraction), plus one full
``detect_and_describe_pair`` step driven end-to-end on the chip.
"""
import numpy as np
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import fast, interp, match, orb, \
    patch_pallas, pyramid, select
from stereo_visual_odometry_tpu.utils import synthetic

H, W = 384, 1280


def _pair():
    seq = synthetic.render_sequence(n_frames=1, h=H, w=W, fx=718.856,
                                    baseline=0.537, n_points=6000, seed=9)
    return (jnp.asarray(seq["images_l"][0], jnp.float32),
            jnp.asarray(seq["images_r"][0], jnp.float32))


def test_patch39_extraction_parity():
    """39x39 descriptor patches: Pallas window reads vs XLA bilinear."""
    img, _ = _pair()
    score = fast.detect(img, 20.0)
    xy, _, valid = select.grid_top_k(score, 512, cell=32, k_per_cell=8)
    got = patch_pallas.extract_patches(img, xy, orb.DESC_PATCH)
    want = interp.sample_patches(img, xy, orb.DESC_PATCH)
    err = np.abs(np.asarray(got) - np.asarray(want))[np.asarray(valid)]
    assert err.max() < 2e-3, err.max()


def test_brief_bit_stability_vs_f64():
    """The MXU pair-difference contraction must flip essentially no bits
    against an independent f64 numpy evaluation of the same patches.

    BRIEF bits compare sample differences against 0. The original bf16
    contraction flipped a median of 3 bits per descriptor (up to ~70 on
    low-contrast patches) on v5e — the r5 f32/HIGHEST contraction is the
    fix; this test keeps it honest: mean Hamming < 2 bits of 256, median 0.
    """
    img, _ = _pair()
    blur = pyramid.gaussian_blur(img)
    score = fast.detect(img, 20.0)
    xy, _, valid = select.grid_top_k(score, 512, cell=32, k_per_cell=8)
    patches = patch_pallas.extract_patches(blur, xy, orb.DESC_PATCH)
    ang = orb.ic_angle_from_patches(orb._ic_crop(patches))
    bits_tpu = np.asarray(orb.brief_bits_from_patches(patches, ang))

    # Independent host-side reference: f64 contraction, same bins.
    p_np = np.asarray(patches, np.float64).reshape(patches.shape[0], -1)
    a_np = np.asarray(ang, np.float64)
    D = orb._bin_diff_weights()
    D_np = np.asarray(D, np.float64)  # (B, 256, P*P)
    bins = np.round(np.mod(a_np, 2 * np.pi) / (2 * np.pi) * orb.N_ANGLE_BINS)
    bins = np.mod(bins, orb.N_ANGLE_BINS).astype(int)
    diffs = np.einsum("np,nkp->nk", p_np, D_np[bins])
    bits_ref = (diffs > 0).astype(np.uint32)

    v = np.asarray(valid)
    ham = np.sum(bits_tpu[v] != bits_ref[v], axis=1)
    assert np.median(ham) == 0, np.median(ham)
    # Bits whose pair difference is essentially zero (flat patches) have no
    # defined sign — any float format may flip them. Bits with a MEANINGFUL
    # difference (>1 intensity unit over a 39x39 bilinear sum) must be
    # stable to f64.
    meaningful = np.abs(diffs[v]) > 1.0
    flips = (bits_tpu[v] != bits_ref[v]) & meaningful
    assert flips.sum() <= 1e-4 * meaningful.sum(), (
        flips.sum(), meaningful.sum())


def test_detect_describe_pair_on_chip():
    """One full fused extraction step on hardware: the stereo pair of the
    SAME scene must produce descriptors that match left<->right with
    sub-pixel epipolar consistency (the property the VO step relies on)."""
    img_l, img_r = _pair()
    fl, fr = orb.detect_and_describe_pair(img_l, img_r, n_features=2048,
                                          levels=8, scale_factor=1.2,
                                          ini_th=20.0, min_th=7.0,
                                          cell=32, k_per_cell=8, upright=True)
    assert int(fl["valid"].sum()) > 500
    assert int(fr["valid"].sum()) > 500
    xy = np.asarray(fl["xy"])[np.asarray(fl["valid"])]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < W).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < H).all()
    st = match.stereo_match(fl, fr, feature_match_error=2.0, dist_floor=50.0,
                            max_level_diff=1, stereo_premask=True)
    v = np.asarray(st["valid"])
    assert v.sum() > 200, v.sum()
    dy = np.abs(np.asarray(fl["xy"])[:, 1] -
                np.asarray(fr["xy"])[np.asarray(st["idx_r"]), 1])[v]
    assert np.median(dy) < 1.0, np.median(dy)
    # Matched descriptors are close in Hamming distance (the upright
    # learned-BRIEF operating point: median well under the gate floor).
    assert np.median(np.asarray(st["dist"])[v]) < 40
