"""Where does an LK level-call's time go? Template vs reload vs iteration.

Hacks the block kernel into three variants: template-only, template+N
forced reload rounds (no inner iterations), and full. Times each on
hardware at the production operating point.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import lk_pallas_block as B  # archived kernel, lives in scripts/

H, W = 384, 1280
N = 1024
R = 30
rng = np.random.default_rng(7)
base = rng.random((H + 64, W + 64)).astype(np.float32) * 255
for _ in range(3):
    base = (base + np.roll(base, 1, 0) + np.roll(base, -1, 0)) / 3
    base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 3
img0 = base[32:32 + H, 32:32 + W]
img1 = base[30:30 + H, 29:29 + W]
pts = np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], -1).astype(np.float32)
pad = 12
eh = (-(H + 2 * pad)) % 8
ew = (-(W + 2 * pad)) % 128
pads = ((pad, pad + eh), (pad, pad + ew))
ip = jnp.pad(jnp.asarray(img0), pads, mode="edge")
inx = jnp.pad(jnp.asarray(img1), pads, mode="edge")
ptsj = jnp.asarray(pts)
guess = jnp.zeros_like(ptsj)
hp, wp = ip.shape
win, iters, eps, min_eig = 21, 30, 0.01, 1e-4
P = 24
BLK = B.BLK

def variant_kernel(mode, rounds=3):
    """mode: 'tmpl' | 'reload' | 'full'"""
    full = B._make_kernel(win, hp, wp, iters, eps, min_eig, P)
    if mode == "full":
        return full
    r = (win - 1) // 2
    def aligned_canvas(ref, row_i, col_i):
        R8 = min(P + 8, hp)
        row8 = pl.multiple_of(jnp.minimum((row_i // 8) * 8, hp - R8), 8)
        rrem = row_i - row8
        col128 = pl.multiple_of(jnp.minimum((col_i // 128) * 128, wp - 256), 128)
        crem = col_i - col128
        block = ref[pl.ds(row8, R8), pl.ds(col128, 256)]
        block = pltpu.roll(block, -rrem, axis=0)
        block = pltpu.roll(block, -crem, axis=1)
        return block[:P, :128]
    lroll1 = lambda x: pltpu.roll(x, 127, axis=1)
    def kernel(prow_ref, pcol_ref, grow_ref, gcol_ref, prev_ref, next_ref,
               flow_ref, ok_ref, ixs_ref, iys_ref, sdots_ref):
        rowi = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
        fmask = ((rowi < win) & (coli < win)).astype(jnp.float32)
        acc_l = []
        for j in range(BLK):
            py = prow_ref[j, 0]; px = pcol_ref[j, 0]
            tbr = py - r - 1.0; tbc = px - r - 1.0
            tr0 = jnp.clip(jnp.floor(tbr).astype(jnp.int32), 0, hp - win - 3)
            tc0 = jnp.clip(jnp.floor(tbc).astype(jnp.int32), 0, wp - win - 3)
            tfy = tbr - tr0.astype(jnp.float32); tfx = tbc - tc0.astype(jnp.float32)
            X = aligned_canvas(prev_ref, tr0, tc0)
            Xr = lroll1(X); Xd = pltpu.roll(X, P - 1, axis=0); Xdr = lroll1(Xd)
            field = ((1-tfy)*(1-tfx)*X + (1-tfy)*tfx*Xr + tfy*(1-tfx)*Xd + tfy*tfx*Xdr)
            Fr1 = pltpu.roll(field, P - 1, axis=0)
            Fr2 = pltpu.roll(field, P - 2, axis=0)
            T = lroll1(Fr1)
            Ix = (pltpu.roll(Fr1, 126, axis=1) - Fr1) * 0.5
            Iy = (lroll1(Fr2) - lroll1(field)) * 0.5
            Ixm = Ix * fmask; Iym = Iy * fmask
            g00 = jnp.sum(Ixm*Ixm); g01 = jnp.sum(Ixm*Iym); g11 = jnp.sum(Iym*Iym)
            tIx = jnp.sum(T*Ixm); tIy = jnp.sum(T*Iym)
            acc_l.append(g00+g01+g11+tIx+tIy)
            ixs_ref[j*P:(j+1)*P, :] = Ixm
            iys_ref[j*P:(j+1)*P, :] = Iym
        if mode == "reload":
            for rd in range(rounds):
                for j in range(BLK):
                    py = prow_ref[j, 0]; px = pcol_ref[j, 0]
                    br = py - r + jnp.float32(rd); bc = px - r + jnp.float32(rd)
                    iyf = jnp.clip(jnp.floor(br), 0.0, float(hp-win-1))
                    ixf = jnp.clip(jnp.floor(bc), 0.0, float(wp-win-1))
                    A = aligned_canvas(next_ref, iyf.astype(jnp.int32), ixf.astype(jnp.int32))
                    Bm = lroll1(A); C = pltpu.roll(A, P-1, axis=0); D = lroll1(C)
                    Ixm = ixs_ref[j*P:(j+1)*P, :]; Iym = iys_ref[j*P:(j+1)*P, :]
                    sdots_ref[j,0] = jnp.sum(A*Ixm); sdots_ref[j,1] = jnp.sum(Bm*Ixm)
                    sdots_ref[j,2] = jnp.sum(C*Ixm); sdots_ref[j,3] = jnp.sum(D*Ixm)
                    sdots_ref[j,4] = jnp.sum(A*Iym); sdots_ref[j,5] = jnp.sum(Bm*Iym)
                    sdots_ref[j,6] = jnp.sum(C*Iym); sdots_ref[j,7] = jnp.sum(D*Iym)
        for j in range(BLK):
            extra = sdots_ref[j, 0] if mode == "reload" else jnp.float32(0.0)
            flow_ref[j, 0] = acc_l[j] + extra
            flow_ref[j, 1] = acc_l[j]
            ok_ref[j, 0] = acc_l[j]
    return kernel

def run_variant(mode, rounds=3):
    kernel = variant_kernel(mode, rounds)
    blk1 = lambda: pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    @jax.jit
    def once(prow, pcol, grow, gcol, a, b):
        return pl.pallas_call(
            kernel, grid=(N // BLK,),
            in_specs=[blk1(), blk1(), blk1(), blk1(),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((BLK, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
                       pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((N, 2), jnp.float32),
                       jax.ShapeDtypeStruct((N, 1), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((BLK * P, 128), jnp.float32),
                            pltpu.VMEM((BLK * P, 128), jnp.float32),
                            pltpu.SMEM((BLK, 16), jnp.float32)],
        )(prow, pcol, grow, gcol, a, b)
    @jax.jit
    def chain(prow, pcol, grow, gcol, a, b):
        def body(i, acc):
            # acc feeds the guess inputs so the call can't be hoisted out.
            f, o = once(prow, pcol, grow + 1e-30 * acc[:, :1],
                        gcol + 1e-30 * acc[:, 1:2], a, b)
            return acc + f
        return jax.lax.fori_loop(0, R, body, jnp.zeros((N, 2), jnp.float32))
    args = ((ptsj[:, 1:2] + pad), (ptsj[:, 0:1] + pad), guess[:, 1:2], guess[:, 0:1],
            ip, inx)
    out = jax.block_until_ready(chain(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(chain(*args))
    dt = time.perf_counter() - t0
    print(f"[{mode:7s}] {dt/R*1e3:.3f} ms/call", flush=True)

run_variant("full")
run_variant("tmpl")
run_variant("reload", rounds=1)
run_variant("reload", rounds=3)
