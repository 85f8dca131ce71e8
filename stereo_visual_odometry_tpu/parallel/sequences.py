"""Multi-sequence VO: batches of independent sequences sharded across chips.

BASELINE.json config 4: "Full KITTI 00-10 batched multi-sequence VO,
sequences sharded across chips on one host". The per-frame step is
``vmap``-ed over a leading sequence axis and the whole batch is laid out
with a ``NamedSharding`` over the ``seq`` mesh axis — XLA partitions the
computation with zero collectives (embarrassingly parallel), so scaling
efficiency is bounded only by load balance.

Also provides a fully on-device scan over a frame chunk
(``run_chunk_scan``): frames advance under ``lax.scan`` while sequences
stay vmapped/sharded — the pose chain is serial per sequence (SURVEY.md
§7) but S sequences advance in lockstep.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import frontend as frontend_mod
from ..ops.camera import StereoRig
from .mesh import shard_leading, replicated


def make_batched_frontend(cfg: frontend_mod.VOConfig, rig: StereoRig,
                          mesh: Mesh, axis: str = "seq"):
    """(init_fn, step_fn) vmapped over a leading sequence axis and jitted
    with ``seq``-sharded inputs/outputs.

    init_fn: (imgs_l (S, H, W), imgs_r (S, H, W), keys (S, 2)) -> state
    step_fn: (state, imgs_l, imgs_r) -> (state, metrics)
    """
    init_one, step_one = frontend_mod.make_frontend(cfg, rig)
    data_sh = shard_leading(mesh, axis)

    # Every leaf of the state/batch carries a leading S axis -> shard it.
    vinit = jax.vmap(init_one)
    vstep = jax.vmap(step_one)

    shard_all = lambda tree: jax.tree_util.tree_map(lambda _: data_sh, tree)

    @partial(jax.jit, out_shardings=None)
    def init_fn(imgs_l, imgs_r, keys):
        return vinit(imgs_l, imgs_r, keys)

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, imgs_l, imgs_r):
        return vstep(state, imgs_l, imgs_r)

    def place(imgs):
        return jax.device_put(imgs, data_sh)

    return init_fn, step_fn, place


@partial(jax.jit, static_argnums=(0,))
def run_chunk_scan(step_one, state, imgs_l: jax.Array, imgs_r: jax.Array):
    """Advance a batch of sequences over a chunk of T frames on device.

    Jitted with the step function static (callers build it once per config):
    un-jitted, the scan dispatches op-by-op — through the remote-TPU tunnel
    that measured ~500x slower than the compiled program.

    Args:
      step_one: un-vmapped per-frame step (from ``make_frontend``).
      state: batched state pytree (leading S axis).
      imgs_l / imgs_r: (S, T, H, W) frame chunks.

    Returns (state, metrics-pytree with leading (T, S) axes).
    """
    vstep = jax.vmap(step_one)

    def body(carry, xs):
        il, ir = xs
        carry, m = vstep(carry, il, ir)
        return carry, m

    # scan over the frame axis: move T in front.
    xs = (jnp.swapaxes(imgs_l, 0, 1), jnp.swapaxes(imgs_r, 0, 1))
    return jax.lax.scan(body, state, xs)
