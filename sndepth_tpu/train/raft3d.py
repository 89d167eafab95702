"""RAFT3D training: per-iteration sequence loss + jitted step.

The reference repo ships RAFT3D inference only (its Logger/arg helpers in
`/root/reference/utils/utils_raft3d.py` imply the upstream training recipe);
this implements the standard RAFT-family sequence loss over the KITTI /
FlyingThings readers in `sndepth_tpu.data.raft3d_datasets`:

    L = sum_i gamma^{N-1-i} * mean_valid |flow_est_i - flow_gt|_1

over the (u, v, inverse-depth-change) induced flow of each iteration's
upsampled SE(3) field, plus the same weighting on the revision flow.
"""

from __future__ import annotations

import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from sndepth_tpu.models.raft3d import RAFT3D

Array = jax.Array


@flax.struct.dataclass
class RAFT3DTrainState:
    step: Array
    params: dict
    batch_stats: dict
    opt_state: Any


def make_optimizer(lr: float = 2e-4, weight_decay: float = 1e-5,
                   total_steps: int = 200_000):
    schedule = optax.linear_onecycle_schedule(total_steps, lr)
    return optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adamw(schedule, weight_decay=weight_decay))


def sequence_loss(flow_est: Array, flow_rev: Array, flow_gt: Array,
                  valid: Array, gamma: float = 0.9) -> tuple[Array, dict]:
    """flow_est/flow_rev: (iters, B, H, W, 3/2); flow_gt: (B, H, W, 3);
    valid: (B, H, W)."""
    n = flow_est.shape[0]
    mask = valid[None, ..., None]
    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)

    err_est = jnp.abs(flow_est - flow_gt[None]) * mask
    per_iter_est = jnp.sum(err_est, axis=(1, 2, 3, 4)) / (
        jnp.sum(mask) * flow_est.shape[-1] + 1e-8)
    err_rev = jnp.abs(flow_rev - flow_gt[None, ..., :2]) * mask
    per_iter_rev = jnp.sum(err_rev, axis=(1, 2, 3, 4)) / (
        jnp.sum(mask) * 2 + 1e-8)

    loss = jnp.sum(weights * (per_iter_est + per_iter_rev))
    epe = jnp.sum(jnp.linalg.norm(
        (flow_est[-1][..., :2] - flow_gt[..., :2]), axis=-1) * valid
    ) / (jnp.sum(valid) + 1e-8)
    return loss, {"loss": loss, "epe2d": epe}


def create_train_state(rng: Array, model: RAFT3D, sample_shape=(1, 64, 96)
                       ) -> RAFT3DTrainState:
    b, h, w = sample_shape
    dummy_img = jnp.zeros((b, h, w, 3))
    dummy_d = jnp.ones((b, h, w))
    dummy_k = jnp.ones((b, 4))
    variables = model.init(jax.random.PRNGKey(0), dummy_img, dummy_img,
                           dummy_d, dummy_d, dummy_k, iters=1)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return RAFT3DTrainState(step=jnp.zeros((), jnp.int32), params=params,
                            batch_stats=batch_stats,
                            opt_state=make_optimizer().init(params))


def train_step(state: RAFT3DTrainState, batch: dict, model: RAFT3D,
               iters: int = 12, gamma: float = 0.9):
    def loss_fn(params):
        flow_est, flow_rev, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image1"], batch["image2"],
            batch["depth1"], batch["depth2"], batch["intrinsics"],
            iters=iters, train_mode=True)
        return sequence_loss(flow_est, flow_rev, batch["flow"],
                             batch["valid"], gamma)

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = make_optimizer().update(grads, state.opt_state,
                                                 state.params)
    params = optax.apply_updates(state.params, updates)
    return (RAFT3DTrainState(step=state.step + 1, params=params,
                             batch_stats=state.batch_stats,
                             opt_state=opt_state), metrics)


def make_train_step(model: RAFT3D, iters: int = 12, gamma: float = 0.9):
    return jax.jit(functools.partial(train_step, model=model, iters=iters,
                                     gamma=gamma), donate_argnums=(0,))
