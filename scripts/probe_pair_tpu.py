"""Pair vs single ORB extraction parity ON TPU."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import orb
from stereo_visual_odometry_tpu.utils import synthetic

H, W = 384, 1280
seq = synthetic.render_sequence(n_frames=2, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il = jnp.asarray(padf(seq["images_l"])[0], jnp.float32)
ir = jnp.asarray(padf(seq["images_r"])[0], jnp.float32)
kw = dict(n_features=2048, levels=8, cell=32, k_per_cell=8)
fl, fr = orb.detect_and_describe_pair(il, ir, **kw)
sl = orb.detect_and_describe(il, **kw)
sr = orb.detect_and_describe(ir, **kw)
for tag, pair, single in (("L", fl, sl), ("R", fr, sr)):
    pv, sv = np.asarray(pair["valid"]), np.asarray(single["valid"])
    same_valid = np.array_equal(pv, sv)
    both = pv & sv
    dxy = np.abs(np.asarray(pair["xy"])[both] - np.asarray(single["xy"])[both]).max() if both.any() else -1
    ddesc = (np.asarray(pair["desc"])[both] != np.asarray(single["desc"])[both])
    # per-keypoint hamming difference between pair and single descriptors
    x = np.asarray(pair["desc"])[both] ^ np.asarray(single["desc"])[both]
    ham = np.unpackbits(x.view(np.uint8), axis=1).sum(1)
    print(f"[{tag}] valid equal={same_valid} n={both.sum()} max|dxy|={dxy:.4f} "
          f"desc hamming mean={ham.mean():.2f} max={ham.max()}", flush=True)
