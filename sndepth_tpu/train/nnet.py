"""Surface-normal network training (encoder + uncertainty decoder).

The reference consumes pretrained ``nyu.pt`` weights
(`/root/reference/models/baseline.py:291-299`) and ships no normal training
loop; this provides one so the framework can (re)train the stack: the
decoder's train-mode uncertainty-guided point sampling drives the
multi-scale angular-NLL loss in `sndepth_tpu.losses.normal_loss`.
"""

from __future__ import annotations

import functools
from typing import Any

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from sndepth_tpu.losses.normal_loss import decoder_multi_scale_loss
from sndepth_tpu.models.efficientnet import EfficientNetEncoder
from sndepth_tpu.models.nnet import bgr_preprocess
from sndepth_tpu.models.normal_decoder import NormalDecoder

Array = jax.Array


class NormalNet(nn.Module):
    """Encoder + decoder; the trainable normal-estimation stack."""
    sampling_ratio: float = 0.4
    importance_ratio: float = 0.7
    architecture: str = "GN"
    dense_refine: bool = True
    dtype: Any = jnp.float32
    shift_depthwise: bool = False

    @nn.compact
    def __call__(self, rgb: Array, *, mode: str = "test",
                 gt_norm_mask: Array | None = None,
                 rng: Array | None = None, train: bool = False):
        feats = EfficientNetEncoder(dtype=self.dtype,
                                    shift_depthwise=self.shift_depthwise)(
            bgr_preprocess(rgb) / 255.0, train=train)
        return NormalDecoder(
            sampling_ratio=self.sampling_ratio,
            importance_ratio=self.importance_ratio,
            architecture=self.architecture,
            dense_refine=self.dense_refine, dtype=self.dtype)(
                feats, gt_norm_mask=gt_norm_mask, mode=mode, rng=rng,
                train_norm=train)


@flax.struct.dataclass
class NormalTrainState:
    step: Array
    params: dict
    batch_stats: dict
    opt_state: Any
    rng: Array


def make_optimizer(lr: float = 3.57e-4):
    return optax.adamw(lr, weight_decay=1e-3)


def create_train_state(rng: Array, sample_shape=(1, 64, 96),
                       dtype=jnp.float32) -> NormalTrainState:
    model = NormalNet(dtype=dtype)
    b, h, w = sample_shape
    rng, init_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(init_rng, jnp.zeros((b, h, w, 3)), mode="test")
    params = variables["params"]
    return NormalTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=make_optimizer().init(params), rng=state_rng)


def train_step(state: NormalTrainState, batch: dict, dtype=jnp.float32,
               shift_depthwise: bool = False, dense_refine: bool = True):
    """batch: rgb (B,H,W,3) in [0,1]-ish, normals (B,H,W,3), mask (B,H,W)."""
    model = NormalNet(dtype=dtype, shift_depthwise=shift_depthwise,
                      dense_refine=dense_refine)
    rng, sample_rng = jax.random.split(state.rng)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (outs, sampled, idx), mutated = model.apply(
            variables, batch["rgb"], mode="train",
            gt_norm_mask=batch["mask"][..., None], rng=sample_rng,
            train=True, mutable=["batch_stats"])
        loss = decoder_multi_scale_loss(outs, sampled, idx,
                                        batch["normals"], batch["mask"])
        return loss, mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = make_optimizer().update(grads, state.opt_state,
                                                 state.params)
    params = optax.apply_updates(state.params, updates)
    return (NormalTrainState(step=state.step + 1, params=params,
                             batch_stats=new_stats, opt_state=opt_state,
                             rng=rng),
            {"loss": loss})


def make_train_step(dtype=jnp.float32, shift_depthwise: bool = False,
                    dense_refine: bool = True):
    return jax.jit(functools.partial(train_step, dtype=dtype,
                                     shift_depthwise=shift_depthwise,
                                     dense_refine=dense_refine),
                   donate_argnums=(0,))
