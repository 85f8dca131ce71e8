"""Locate which keypoints break the S=39 Pallas patch extraction on TPU."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import interp, patch_pallas

H, W = 384, 1280
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255)

# Dense grid of centers covering the image incl. borders.
xs = np.linspace(1.0, W - 2.0, 64)
ys = np.linspace(1.0, H - 2.0, 32)
gx, gy = np.meshgrid(xs, ys)
xy = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
xy += rng.rand(*xy.shape).astype(np.float32) * 0.9  # subpixel

for P in (21, 31, 39):
    got = patch_pallas.extract_patches(img, jnp.asarray(xy), P, use_pallas=True)
    want = interp.sample_patches(img, jnp.asarray(xy), P)
    err = np.abs(np.asarray(got) - np.asarray(want)).max(axis=(1, 2))
    bad = err > 1e-2
    print(f"P={P}: bad={bad.sum()}/{len(xy)} max_err={err.max():.3f}")
    if bad.any():
        bx, by = xy[bad, 0], xy[bad, 1]
        print(f"  bad x range [{bx.min():.1f}, {bx.max():.1f}] "
              f"y range [{by.min():.1f}, {by.max():.1f}]")
        # alignment classes of the bad points
        pad = P // 2 + 2
        iyc = np.floor(by + pad - (P - 1) / 2).astype(int)
        ixc = np.floor(bx + pad - (P - 1) / 2).astype(int)
        print(f"  iy%8 classes: {sorted(set(iyc % 8))}")
        print(f"  ix%128 classes: {sorted(set(ixc % 128))[:12]}")
        print(f"  ix min/max: {ixc.min()} {ixc.max()}  iy min/max: {iyc.min()} {iyc.max()}")
