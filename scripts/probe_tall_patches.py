import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import patch_pallas

rng = np.random.default_rng(0)
h, w = 320, 1067  # an ORB level-1 shape (odd width!)
img_l = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
img_r = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
tall = jnp.concatenate([img_l, img_r], axis=0)
xy = jnp.asarray(np.stack([rng.uniform(25, w - 25, 64),
                           rng.uniform(25, h - 25, 64)], -1).astype(np.float32))
p_single = np.asarray(patch_pallas.extract_patches(img_r, xy, 31))
p_tall = np.asarray(patch_pallas.extract_patches(
    tall, xy + jnp.asarray([0.0, float(h)]), 31))
d = np.abs(p_single - p_tall)
print("max diff:", d.max(), "mean:", d.mean())
bad = d.max(axis=(1, 2)) > 1e-3
print("bad patches:", bad.sum(), "of", len(xy))
if bad.any():
    i = int(np.argmax(bad))
    print("example xy:", np.asarray(xy)[i])
    # is it a shift?
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            a = p_single[i, 2:-2, 2:-2]
            b = p_tall[i, 2 + dy:31 - 2 + dy, 2 + dx:31 - 2 + dx]
            if a.shape == b.shape and np.abs(a - b).max() < 1e-3:
                print("tall is single shifted by", dy, dx)
