"""Patch-extraction kernel parity (interpret mode) vs the XLA sampler."""
import numpy as np
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import interp, patch_pallas

RNG = np.random.default_rng(13)


def test_extract_patches_matches_xla():
    img = jnp.asarray((RNG.random((96, 160)) * 255).astype(np.float32))
    centers = jnp.asarray(np.stack([
        RNG.uniform(18, 140, 24), RNG.uniform(18, 78, 24)], -1).astype(np.float32))
    want = interp.sample_patches(img, centers, 31)
    got = patch_pallas.extract_patches(img, centers, 31, use_pallas=True,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.01)


def test_extract_patches_border_replicate():
    img = jnp.asarray((RNG.random((64, 192)) * 255).astype(np.float32))
    centers = jnp.asarray(np.array([[2.0, 3.0], [190.0, 62.0]], np.float32))
    want = interp.sample_patches(img, centers, 21)
    got = patch_pallas.extract_patches(img, centers, 21, use_pallas=True,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.01)
