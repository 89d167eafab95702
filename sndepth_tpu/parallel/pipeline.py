"""Pipeline parallelism (GPipe schedule) via shard_map + ppermute.

The reference has no pipeline axis (its largest trainable stack is a
single-GPU transformer); this provides the TPU-native one for the deep
uniform-layer models (the pose-denoiser's 8-layer transformer encoder,
`/root/reference/models/denoiser.py` lineage): layers are split into S
contiguous stages sharded over a 'stage' mesh axis, microbatches stream
through with ``lax.ppermute`` passing activations stage-to-stage over ICI.

Single-controller SPMD: every device runs the same scan over
``n_micro + S - 1`` ticks; stage s is busy on ticks [s, s + n_micro); the
bubble fraction is (S-1)/(n_micro + S - 1).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def make_stage_mesh(devices=None, n_stages: int | None = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = n_stages or len(devices)
    return Mesh(np.asarray(devices[:n]), (STAGE_AXIS,))


def stack_layer_params(layer_params: list, n_stages: int) -> Any:
    """Stack per-layer param trees -> leaves (S, L/S, ...)."""
    n_layers = len(layer_params)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible into "
                         f"{n_stages} stages")
    per = n_layers // n_stages
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls).reshape((n_stages, per) + ls[0].shape),
        *layer_params)
    return stacked


def pipeline_apply(layer_fn: Callable[[Any, jax.Array], jax.Array],
                   stacked_params: Any, x: jax.Array, mesh: Mesh,
                   n_micro: int) -> jax.Array:
    """Run ``layer_fn`` (one layer: (params, h) -> h) over all S * L/S
    layers in pipeline across the 'stage' mesh axis.

    x: (batch, ...) with batch divisible by n_micro. Returns the same
    shape, numerically equal to applying the layers sequentially.
    """
    n_stages = mesh.shape[STAGE_AXIS]
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    xm = x.reshape((n_micro, b // n_micro) + x.shape[1:])
    n_ticks = n_micro + n_stages - 1

    def stage_block(params_local, xm_local):
        # params_local: (1, L/S, ...); xm_local: full (n_micro, mb, ...)
        params_me = jax.tree_util.tree_map(lambda p: p[0], params_local)
        stage = jax.lax.axis_index(STAGE_AXIS)

        def run_layers(h):
            def body(h, p):
                return layer_fn(p, h), None
            h, _ = jax.lax.scan(body, h, params_me)
            return h

        def tick(carry, t):
            recv, ys = carry
            # stage 0 injects microbatch t (clamped; masked out later)
            inj = jax.lax.dynamic_index_in_dim(
                xm_local, jnp.clip(t, 0, n_micro - 1), axis=0,
                keepdims=False)
            h_in = jnp.where(stage == 0, inj, recv)
            h_out = run_layers(h_in)
            # pass to the next stage (ring; the wraparound value is junk
            # and gets masked by the tick window on the receiving side)
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            sent = jax.lax.ppermute(h_out, STAGE_AXIS, perm)
            # last stage owns microbatch m = t - (S-1) at tick t
            m = t - (n_stages - 1)
            midx = jnp.clip(m, 0, n_micro - 1)
            valid = jnp.logical_and(stage == n_stages - 1,
                                    jnp.logical_and(m >= 0, m < n_micro))
            prev = jax.lax.dynamic_index_in_dim(ys, midx, axis=0,
                                                keepdims=False)
            ys = jax.lax.dynamic_update_index_in_dim(
                ys, jnp.where(valid, h_out.astype(ys.dtype), prev), midx,
                axis=0)
            return (sent, ys), None

        # initial carries must be typed 'varying' over the stage axis (the
        # ppermute/axis_index results inside the scan body are varying)
        recv0 = jax.lax.pcast(jnp.zeros_like(xm_local[0]), (STAGE_AXIS,),
                              to="varying")
        ys0 = jax.lax.pcast(jnp.zeros_like(xm_local), (STAGE_AXIS,),
                            to="varying")
        (last, ys), _ = jax.lax.scan(tick, (recv0, ys0),
                                     jnp.arange(n_ticks))
        # only the last stage holds real outputs; psum broadcasts them
        # (every other stage contributes zeros)
        ys = jnp.where(stage == n_stages - 1, ys, 0.0)
        ys = jax.lax.psum(ys, STAGE_AXIS)
        return ys

    spec_params = jax.tree_util.tree_map(
        lambda p: P(STAGE_AXIS, *([None] * (p.ndim - 1))), stacked_params)
    out = jax.shard_map(
        stage_block, mesh=mesh,
        in_specs=(spec_params, P()), out_specs=P())(stacked_params, xm)
    return out.reshape(x.shape)


def run_pipeline_denoiser(devices, n_stages: int = 4, n_micro: int = 4,
                          batch: int = 8):
    """Build a Denoiser-layer stack, run it pipelined over a stage mesh,
    and return (pipelined, sequential) outputs for comparison."""
    import flax.linen as nn

    from sndepth_tpu.models.denoiser import TransformerEncoderLayer

    d_model, seq = 64, 6
    n_layers = 8
    layer = TransformerEncoderLayer(d_model=d_model, nhead=4,
                                    dim_feedforward=128)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, seq, d_model))
    layer_params = [
        layer.init(jax.random.fold_in(rng, i), x[:1])["params"]
        for i in range(n_layers)]

    def layer_fn(params, h):
        return layer.apply({"params": params}, h)

    h = x
    for p in layer_params:
        h = layer_fn(p, h)
    seq_out = h

    mesh = make_stage_mesh(devices, n_stages)
    stacked = stack_layer_params(layer_params, n_stages)
    pipe_out = jax.jit(functools.partial(
        pipeline_apply, layer_fn, mesh=mesh, n_micro=n_micro))(stacked, x)
    return pipe_out, seq_out
