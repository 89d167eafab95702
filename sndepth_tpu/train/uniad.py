"""UniAD tracker training (TPU-native).

Functional equivalent of the reference's clip-level tracker training
(`/root/reference/models/track_uniad.py:499-586` ``forward_track_train``
with the ClipMatcher criterion from
`models/register_module/track_loss.py`): the whole T-frame clip forward —
BEV encoding per frame with carried prev-BEV, DETR decoding over the
track-query carry, per-decoder-layer Hungarian matching and focal/L1/
past-traj losses, memory bank + train-mode QIM — plus the AdamW update is
one jitted ``train_step``.
"""

from __future__ import annotations

import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from sndepth_tpu.models.uniad_track import UniADTrack

Array = jax.Array


@flax.struct.dataclass
class UniADTrainState:
    step: Array
    params: dict
    opt_state: Any
    rng: Array


def synthetic_clip(model: UniADTrack, t_frames: int = 3, ng: int = 4,
                   img_hw: tuple[int, int] = (64, 64), steps: int = 8,
                   seed: int = 0) -> dict:
    """A tiny self-consistent training clip: persistent GT instances with
    slowly drifting boxes, for smoke/descent tests and dryruns."""
    import numpy as np
    rng = np.random.RandomState(seed)
    h, w = img_hw
    imgs = rng.rand(t_frames, model.num_cams, 1, h, w, 3).astype("float32")
    lidar2img = np.tile(np.eye(4, dtype="float32")[None, None],
                        (1, model.num_cams, 1, 1))
    boxes = rng.randn(t_frames, ng, 10).astype("float32") * 0.5
    labels = rng.randint(0, model.num_classes, (t_frames, ng))
    gt = {
        "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.ones((t_frames, ng), bool),
        "instance_ids": jnp.tile(jnp.arange(ng)[None], (t_frames, 1)),
        "past_traj": jnp.asarray(
            rng.randn(t_frames, ng, steps, 2).astype("float32")),
        "past_traj_mask": jnp.ones((t_frames, ng, steps, 2), "float32"),
        "sdc_label": jnp.zeros((t_frames,), jnp.int32),
        "sdc_box": jnp.asarray(
            rng.randn(t_frames, 10).astype("float32") * 0.1),
    }
    return {"imgs_seq": jnp.asarray(imgs),
            "lidar2img": jnp.asarray(lidar2img),
            "gt": gt,
            "timestamps": jnp.arange(t_frames, dtype=jnp.float32) * 0.5}


def init_uniad_variables(model: UniADTrack, clip: dict, rng: Array):
    rng_p, rng_q = jax.random.split(rng)
    return jax.jit(functools.partial(model.init, method=model.train_clip)
                   )({"params": rng_p, "qim": rng_q},
                     clip["imgs_seq"], clip["lidar2img"], clip["gt"],
                     clip["timestamps"])


def make_optimizer(learning_rate: float = 2e-4,
                   weight_decay: float = 0.01):
    """AdamW w/ grad clip (the reference trains UniAD with AdamW + norm
    clip 35 in its lineage configs); wrapped in apply_if_finite like the
    other trainers."""
    opt = optax.chain(optax.clip_by_global_norm(35.0),
                      optax.adamw(learning_rate,
                                  weight_decay=weight_decay))
    return optax.apply_if_finite(opt, max_consecutive_errors=100)


def create_train_state(model: UniADTrack, clip: dict,
                       rng: Array | None = None,
                       learning_rate: float = 2e-4) -> UniADTrainState:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    variables = init_uniad_variables(model, clip, init_rng)
    params = variables["params"]
    opt_state = make_optimizer(learning_rate).init(params)
    return UniADTrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt_state, rng=rng)


def train_step(state: UniADTrainState, clip: dict, model: UniADTrack,
               learning_rate: float = 2e-4
               ) -> tuple[UniADTrainState, dict]:
    """One AdamW step on a clip batch. Pure; jit me."""
    rng, qim_rng = jax.random.split(state.rng)

    def loss_fn(params):
        loss, aux = model.apply(
            {"params": params}, clip["imgs_seq"], clip["lidar2img"],
            clip["gt"], clip["timestamps"], method=model.train_clip,
            rngs={"qim": qim_rng})
        return loss, aux

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = make_optimizer(learning_rate).update(
        grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params,
                         opt_state=opt_state, rng=rng), metrics


def make_train_step(model: UniADTrack, learning_rate: float = 2e-4):
    return jax.jit(functools.partial(train_step, model=model,
                                     learning_rate=learning_rate),
                   donate_argnums=(0,))
