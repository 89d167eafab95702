"""Motion-segmentation training: jitted step with BatchNorm state threading.

Reference loop: `/root/reference/train.py` (Adam lr 0.01, StepLR(3000, 0.9),
CE loss, per-epoch checkpoints). Here the LR schedule is the same exponential
staircase via optax, and the step is one compiled program.
"""

from __future__ import annotations

import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from sndepth_tpu.losses.segmentation import cross_entropy
from sndepth_tpu.models.motionseg import MotionFusionNet
from sndepth_tpu.utils.metrics import mean_iou

Array = jax.Array


@flax.struct.dataclass
class MotionTrainState:
    step: Array
    params: dict
    batch_stats: dict
    opt_state: Any


def make_optimizer(lr: float = 0.01, decay_steps: int = 3000,
                   decay_rate: float = 0.9) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(lr, decay_steps, decay_rate,
                                       staircase=True)
    return optax.adam(schedule)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def init_motion_state(rng: Array, height: int = 64, width: int = 128,
                      dtype=jnp.float32) -> MotionTrainState:
    model = MotionFusionNet(dtype=dtype)
    variables = model.init(rng, jnp.zeros((1, height, width, 3)),
                           jnp.zeros((1, height, width, 3)), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer().init(params)
    return MotionTrainState(step=jnp.zeros((), jnp.int32), params=params,
                            batch_stats=batch_stats, opt_state=opt_state)


def motion_loss(params: dict, batch_stats: dict, batch: dict,
                dtype=jnp.float32, train: bool = True):
    model = MotionFusionNet(dtype=dtype)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        logits, mutated = model.apply(
            variables, batch["image"], batch["flow"], train=True,
            mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        logits = model.apply(variables, batch["image"], batch["flow"],
                             train=False)
        new_stats = batch_stats
    loss = cross_entropy(logits, batch["label"])
    return loss, (logits, new_stats)


def train_step(state: MotionTrainState, batch: dict, dtype=jnp.float32
               ) -> tuple[MotionTrainState, dict]:
    grad_fn = jax.value_and_grad(motion_loss, has_aux=True)
    (loss, (logits, new_stats)), grads = grad_fn(
        state.params, state.batch_stats, batch, dtype)
    updates, opt_state = make_optimizer().update(grads, state.opt_state,
                                                 state.params)
    params = optax.apply_updates(state.params, updates)
    acc = jnp.mean(jnp.argmax(logits, -1) == batch["label"])
    new_state = MotionTrainState(step=state.step + 1, params=params,
                                 batch_stats=new_stats, opt_state=opt_state)
    return new_state, {"loss": loss, "pixel_acc": acc}


def make_train_step(dtype=jnp.float32):
    return jax.jit(functools.partial(train_step, dtype=dtype),
                   donate_argnums=(0,))


def eval_step(state: MotionTrainState, batch: dict, dtype=jnp.float32
              ) -> dict:
    _, (logits, _) = motion_loss(state.params, state.batch_stats, batch,
                                 dtype, train=False)
    pred = jnp.argmax(logits, -1)
    return {"miou": mean_iou(pred, batch["label"], logits.shape[-1]),
            "pred": pred}


def make_eval_step(dtype=jnp.float32):
    return jax.jit(functools.partial(eval_step, dtype=dtype))
