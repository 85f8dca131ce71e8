"""Characterize the float patch-kernel hardware failures: which alignment
class fails, and is the wrong output a shifted window?"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import interp, patch_pallas

H, W = 384, 1280
rng = np.random.RandomState(0)
img_np = rng.rand(H, W).astype(np.float32) * 255
img = jnp.asarray(img_np)

xs = np.linspace(40.0, W - 40.0, 48)
ys = np.linspace(40.0, H - 40.0, 24)
gx, gy = np.meshgrid(xs, ys)
xy = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
xy += rng.rand(*xy.shape).astype(np.float32) * 0.9

P = 31
got = np.asarray(patch_pallas.extract_patches(img, jnp.asarray(xy), P,
                                              use_pallas=True))
want = np.asarray(interp.sample_patches(img, jnp.asarray(xy), P))
err = np.abs(got - want).max(axis=(1, 2))
bad = err > 1e-2
print(f"P={P}: bad={bad.sum()}/{len(xy)}")

pad = P // 2 + 2
r = (P - 1) / 2.0
tly = xy[:, 1] + pad - r
tlx = xy[:, 0] + pad - r
iy = np.floor(tly).astype(int)
ix = np.floor(tlx).astype(int)

# Alignment classes of good vs bad.
for name, cls in [("iy%8", iy % 8), ("ix%128//8", (ix % 128) // 8)]:
    gb = [(c, int((~bad)[cls == c].sum()), int(bad[cls == c].sum()))
          for c in sorted(set(cls))]
    print(name, "->", gb[:20])

# For a few bad points: find the integer shift that best explains `got`.
idx = np.nonzero(bad)[0][:6]
for i in idx:
    best = None
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            p2 = np.asarray(interp.sample_patches(
                img, jnp.asarray(xy[i:i + 1] + np.array([dx, dy],
                                                        np.float32)), P))[0]
            e = np.abs(got[i] - p2).max()
            if best is None or e < best[0]:
                best = (e, dy, dx)
    print(f"pt {i}: xy=({xy[i,0]:.2f},{xy[i,1]:.2f}) iy%8={iy[i]%8} "
          f"ix%128={ix[i]%128} err={err[i]:.1f} best_shift dy={best[1]} "
          f"dx={best[2]} resid={best[0]:.3f}")
