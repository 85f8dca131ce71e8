"""Map the Mosaic sublane dynamic-roll correctness envelope on this chip."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(rows, cols, axis):
    def kernel(amt_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], -amt_ref[0, 0], axis=axis)

    @jax.jit
    def run(x, amt):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )(amt, x)
    return run


rng = np.random.RandomState(0)
for axis in (0, 1):
    for rows in (16, 24, 32, 40, 48, 56, 64, 128):
        cols = 256
        x = rng.rand(rows, cols).astype(np.float32)
        try:
            run = make(rows, cols, axis)
            ok = True
            worst = 0.0
            for amt in (0, 1, 3, 7, 9 if axis == 0 else 100):
                got = np.asarray(run(jnp.asarray(x),
                                     jnp.asarray([[amt]], jnp.int32)))
                want = np.roll(x, -amt, axis=axis)
                worst = max(worst, float(np.abs(got - want).max()))
            print(f"axis={axis} rows={rows}: max_err={worst:.4f}")
        except Exception as e:
            print(f"axis={axis} rows={rows}: FAIL {str(e)[:90]}")
