"""GeoNet self-supervised depth+pose training (TPU-native).

Functional re-design of the reference train loop
(`/root/reference/models/baseline.py:746-1278`): the whole per-iteration body
— pyramids, DispNetS, PoseNet, rigid warps, SSIM+L1, smoothness, Adam update
— is one jitted (optionally pjit-sharded) ``train_step``.

Loss parity map (reference -> here):
* ``iter_data_preparation`` (`baseline.py:746-792`)  -> :func:`preprocess_batch`
  + the pyramid construction inside :func:`geonet_loss`.
* ``build_dispnet`` (`baseline.py:800`)   -> DispNetS over [tgt; src0; src1]
  stacked along batch, depth = 1/disp.
* ``build_posenet`` (`baseline.py:859`)   -> PoseNet over channel-concat.
* ``build_rigid_warp_flow`` (`baseline.py:867`) -> vectorized over the source
  dimension: the reference's per-src python loop + ``torch.cat`` is replaced
  by a flattened (num_source*B) batch, same element order.
* ``build_losses`` (`baseline.py:1061-1161`).
"""

from __future__ import annotations

import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.losses.photometric import smooth_loss
from sndepth_tpu.models.dispnet import DispNetS
from sndepth_tpu.models.posenet import PoseNet
from sndepth_tpu.ops.camera import (compute_multi_scale_intrinsics,
                                    compute_rigid_flow)
from sndepth_tpu.ops.pyramid import scale_pyramid
from sndepth_tpu.ops.ssim import image_similarity
from sndepth_tpu.ops.warp import flow_warp

Array = jax.Array


def build_models(config: GeoNetConfig) -> tuple[DispNetS, PoseNet]:
    disp_net = DispNetS(dtype=config.compute_dtype)
    pose_net = PoseNet(num_source=config.num_source,
                       dtype=config.compute_dtype)
    return disp_net, pose_net


@functools.partial(jax.jit, static_argnums=1)
def init_params(rng: Array, config: GeoNetConfig) -> dict:
    """Initialize both nets. Jitted: flax eager init issues hundreds of tiny
    ops, which is pathological over a remote-device tunnel; one compiled
    program initializes everything in a single dispatch."""
    disp_net, pose_net = build_models(config)
    h, w = config.img_height, config.img_width
    rng_d, rng_p = jax.random.split(rng)
    disp_vars = disp_net.init(rng_d, jnp.zeros((1, h, w, 3), jnp.float32))
    pose_vars = pose_net.init(
        rng_p, jnp.zeros((1, h, w, 3 * (1 + config.num_source)), jnp.float32))
    return {"disp": disp_vars["params"], "pose": pose_vars["params"]}


def preprocess_batch(batch: dict) -> dict:
    """uint8 [0,255] images -> float32 [-1, 1] (`baseline.py:761-767`)."""
    def to_unit(x):
        return x.astype(jnp.float32) * (1.0 / 255.0) * 2.0 - 1.0
    out = dict(batch)
    out["tgt"] = to_unit(batch["tgt"])
    out["src"] = to_unit(batch["src"])
    out["intrinsics"] = batch["intrinsics"].astype(jnp.float32)
    return out


def geonet_forward(params: dict, batch: dict, config: GeoNetConfig):
    """Run DispNetS + PoseNet. Batch images must already be in [-1, 1].

    Returns (disparities, depths, poses) where disparities/depths are lists
    over scales of (num_views*B, h_s, w_s) and poses is (B, num_source, 6).
    """
    disp_net, pose_net = build_models(config)
    b = batch["tgt"].shape[0]
    ns = config.num_source

    # [tgt; src_0; ...; src_{ns-1}] along batch (`baseline.py:808-811`).
    views = [batch["tgt"]] + [
        batch["src"][..., 3 * s:3 * (s + 1)] for s in range(ns)]
    dispnet_in = jnp.concatenate(views, axis=0)
    disparities = disp_net.apply({"params": params["disp"]}, dispnet_in)
    depths = [1.0 / d[..., 0] for d in disparities]     # (ns+1)*B, h, w

    pose_in = jnp.concatenate([batch["tgt"], batch["src"]], axis=-1)
    poses = pose_net.apply({"params": params["pose"]}, pose_in)
    del b
    return disparities, depths, poses


def geonet_loss(params: dict, batch: dict, config: GeoNetConfig
                ) -> tuple[Array, dict]:
    """Total GeoNet loss for one preprocessed batch."""
    cfg = config
    b = batch["tgt"].shape[0]
    ns = cfg.num_source

    _, depths, poses = geonet_forward(params, batch, cfg)

    tgt_pyr = scale_pyramid(batch["tgt"], cfg.num_scales)
    src_concat = jnp.concatenate(
        [batch["src"][..., 3 * s:3 * (s + 1)] for s in range(ns)], axis=0)
    src_pyr = scale_pyramid(src_concat, cfg.num_scales)
    tgt_tile_pyr = [jnp.tile(t, (ns, 1, 1, 1)) for t in tgt_pyr]

    ms_intrinsics = compute_multi_scale_intrinsics(
        batch["intrinsics"], cfg.num_scales)

    # Flatten the source dimension into batch: order matches the reference's
    # per-src concat (`baseline.py:895-927`): [src0 batch ; src1 batch ; ...].
    poses_flat = jnp.concatenate([poses[:, s] for s in range(ns)], axis=0)

    loss_rigid_warp = 0.0
    loss_disp_smooth = 0.0
    for s in range(cfg.num_scales):
        k_s = jnp.tile(ms_intrinsics[:, s], (ns, 1, 1))
        tgt_depth = jnp.tile(depths[s][:b], (ns, 1, 1))
        src_depth = depths[s][b:]

        fwd_flow = compute_rigid_flow(poses_flat, tgt_depth, k_s, False)
        bwd_flow = compute_rigid_flow(poses_flat, src_depth, k_s, True)

        fwd_warp = flow_warp(src_pyr[s], fwd_flow)
        bwd_warp = flow_warp(tgt_tile_pyr[s], bwd_flow)

        fwd_err = image_similarity(cfg.simi_alpha, tgt_tile_pyr[s], fwd_warp)
        bwd_err = image_similarity(cfg.simi_alpha, src_pyr[s], bwd_warp)

        loss_rigid_warp += (cfg.loss_weight_rigid_warp * ns / 2.0 *
                            (jnp.mean(fwd_err) + jnp.mean(bwd_err)))

        all_views = jnp.concatenate([tgt_pyr[s], src_pyr[s]], axis=0)
        loss_disp_smooth += (cfg.loss_weight_disparity_smooth / (2 ** s) *
                             smooth_loss(depths[s][..., None], all_views))

    total = loss_rigid_warp + loss_disp_smooth
    aux = {"loss_total": total,
           "loss_rigid_warp": loss_rigid_warp,
           "loss_disp_smooth": loss_disp_smooth}
    return total, aux


def make_optimizer(config: GeoNetConfig) -> optax.GradientTransformation:
    """Adam(lr=2e-4, betas=(0.9, 0.999)) — `baseline.py:1269`."""
    return optax.adam(config.learning_rate, b1=config.adam_beta1,
                      b2=config.adam_beta2)


@flax.struct.dataclass
class TrainState:
    step: Array
    params: dict
    opt_state: Any
    rng: Array


def create_train_state(config: GeoNetConfig, rng: Array | None = None
                       ) -> TrainState:
    if rng is None:
        rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    params = init_params(init_rng, config)
    opt_state = make_optimizer(config).init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, rng=rng)


def train_step(state: TrainState, batch: dict, config: GeoNetConfig
               ) -> tuple[TrainState, dict]:
    """One optimizer step on a raw (uint8-image) batch. Pure; jit me."""
    batch = preprocess_batch(batch)
    grad_fn = jax.value_and_grad(geonet_loss, has_aux=True)
    (_, metrics), grads = grad_fn(state.params, batch, config)
    updates, opt_state = make_optimizer(config).update(
        grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state)
    return new_state, metrics


def make_train_step(config: GeoNetConfig):
    """Jitted single-device train step."""
    return jax.jit(functools.partial(train_step, config=config),
                   donate_argnums=(0,))
