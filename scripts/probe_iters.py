"""How many LK iterations/cells do points actually use on bench-like data?"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import fast, lk, pyramid, select, interp
from stereo_visual_odometry_tpu.utils import synthetic

H, W = 384, 1280
N = 1024
seq = synthetic.render_sequence(n_frames=3, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il = jnp.asarray(padf(seq["images_l"]), jnp.float32)
ir = jnp.asarray(padf(seq["images_r"]), jnp.float32)

score = fast.detect(il[1], 20.0)
xy, sc, valid = select.grid_top_k(score, N, cell=32, k_per_cell=8)
xy = select.subpixel_refine(score, xy, valid)
print("valid:", int(valid.sum()))

def level_track_stats(img_prev, img_next, pts, guess, win=21, iters=30,
                      eps=0.01, min_eig=1e-4, search_radius=20):
    h, w = img_next.shape
    r = (win - 1) // 2
    grid = interp.patch_grid(win, dtype=pts.dtype)
    base = pts[:, None, None, :] + grid[None]
    T = interp.bilinear(img_prev, base)
    dx = jnp.array([1.0, 0.0], dtype=pts.dtype); dy = jnp.array([0.0, 1.0], dtype=pts.dtype)
    Ix = (interp.bilinear(img_prev, base + dx) - interp.bilinear(img_prev, base - dx)) * 0.5
    Iy = (interp.bilinear(img_prev, base + dy) - interp.bilinear(img_prev, base - dy)) * 0.5
    g00 = jnp.sum(Ix*Ix, axis=(1,2)); g01 = jnp.sum(Ix*Iy, axis=(1,2)); g11 = jnp.sum(Iy*Iy, axis=(1,2))
    det = g00*g11 - g01*g01
    tr = g00 + g11
    mev = (tr - jnp.sqrt(jnp.maximum(tr*tr - 4*det, 0.0))) * 0.5 / (win*win)
    ok = mev > min_eig
    sd = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv00, inv01, inv11 = g11/sd, -g01/sd, g00/sd
    def body(_, carry):
        v, active, n_it, n_cell, corner = carry
        pos = pts + v
        warped = interp.bilinear(img_next, pos[:, None, None, :] + grid[None])
        rdiff = T - warped
        b0 = jnp.sum(rdiff*Ix, axis=(1,2)); b1 = jnp.sum(rdiff*Iy, axis=(1,2))
        d0 = inv00*b0 + inv01*b1; d1 = inv01*b0 + inv11*b1
        step = jnp.stack([d0, d1], -1)
        v = v + step * active[:, None]
        n_it = n_it + active
        newc = jnp.floor(pts + v)
        n_cell = n_cell + active * jnp.any(newc != corner, axis=-1)
        corner = jnp.where(active[:, None] > 0, newc, corner)
        active = active * (jnp.sum(step*step, -1) > eps*eps)
        return v, active, n_it, n_cell, corner
    v0 = guess
    a0 = ok.astype(pts.dtype)
    corner0 = jnp.floor(pts + v0)
    v, a, n_it, n_cell, _ = jax.lax.fori_loop(0, iters, body, (v0, a0, jnp.zeros(len(pts)), jnp.zeros(len(pts)), corner0))
    return v, ok, n_it, n_cell, a

p_l1 = tuple(pyramid.build_pyramid(il[1], 4))
p_r1 = tuple(pyramid.build_pyramid(ir[1], 4))
pts = xy
# leg1 stereo, with prior 24px constant
for tag, g0 in (("zero-guess", jnp.zeros_like(pts)),
                ("const-24px", jnp.stack([-jnp.full(N, 24.0), jnp.zeros(N)], -1))):
    flow = g0 * (0.5 ** 2)
    tot_it = np.zeros(N); tot_cell = np.zeros(N)
    for lvl in (2, 1, 0):
        s = 2.0 ** lvl
        v, ok, n_it, n_cell, still = level_track_stats(p_l1[lvl], p_r1[lvl], pts / s, flow)
        tot_it += np.asarray(n_it); tot_cell += np.asarray(n_cell)
        if lvl: flow = v * 2.0
    vmask = np.asarray(valid)
    print(f"[leg1 {tag}] iters/pt mean={tot_it[vmask].mean():.1f} p90={np.percentile(tot_it[vmask], 90):.0f} "
          f"cells/pt mean={tot_cell[vmask].mean():.1f} p90={np.percentile(tot_cell[vmask], 90):.0f} "
          f"still-active@end={still.sum():.0f}", flush=True)
