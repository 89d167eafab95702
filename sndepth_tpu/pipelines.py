"""Fused inference pipelines.

The reference chains its models through standalone scripts
(`/root/reference/predict.py`, `predict_raft3d.py`, `predict_vae.py`,
`predict_vae_uniad.py`); here each stage is a jitted function built once
and composed functionally, with all cross-stage tensors staying on device.

Stage map (reference -> here):
* GeoNet depth+pose inference (`predict.py:43-56`) -> :class:`GeoNetStage`;
* NNET refinement (`predict.py:57`) -> :class:`NNETStage` (Canny edges are
  computed in-graph, not via a cv2 round-trip);
* optical flow for motion fusion (`predict.py:61` uses a hub-downloaded
  torchvision RAFT-Large) -> the rigid 2-D flow induced by the predicted
  pose + refined depth (documented divergence: same role, no torch hub);
* MotionFusionNet segmentation (`predict.py:65-77`) -> :class:`MotionStage`;
* RAFT3D scene flow (`predict_raft3d.py:36-58`) -> :class:`RAFT3DStage`;
* AutoencoderKL RGBD encode (`predict_vae.py:54-57`) -> :class:`VAEStage`;
* UniAD track + DINO features + Denoiser (`predict_vae_uniad.py:57-68`)
  -> :class:`TrackStage`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.train import geonet as geonet_lib

Array = jax.Array


class GeoNetStage:
    """Depth (finest disparity) + pose from a 3-view batch."""

    def __init__(self, config: GeoNetConfig, params: dict | None = None,
                 rng: Array | None = None):
        self.config = config
        if params is None:
            params = geonet_lib.init_params(
                rng if rng is not None else jax.random.PRNGKey(0), config)
        self.params = params

        @jax.jit
        def _run(params, batch):
            batch = geonet_lib.preprocess_batch(batch)
            disparities, depths, poses = geonet_lib.geonet_forward(
                params, batch, config)
            # View axis is inner: (B, V, h, w[, 1]); index 0 = target.
            return {"disp": disparities[0][:, 0, ..., 0],
                    "depth": depths[0][:, 0],
                    "poses": poses,
                    "tgt_norm": batch["tgt"],
                    "src_norm": batch["src"]}

        self._run = _run

    def __call__(self, batch: dict) -> dict:
        return self._run(self.params, batch)


class NNETStage:
    """Normal + refined depth from (pre_depth, rgb) (`baseline.py:274`).

    ``dtype=bfloat16`` runs the conv stacks in bf16 (normal/depth heads and
    the D2N/N2D solves stay f32); checked finite with unit normals. Pass
    ``jnp.float32`` for bit-conservative inference."""

    def __init__(self, variables=None, rng: Array | None = None,
                 sample_shape=(1, 128, 416), dtype=jnp.bfloat16):
        from sndepth_tpu.models.nnet import NNET, bgr_preprocess
        from sndepth_tpu.ops.edges import edge_model_inputs
        self.model = NNET(dtype=dtype)
        if variables is None:
            b, h, w = sample_shape
            # jitted init: eager flax init dispatches thousands of tiny ops,
            # which is pathological over a remote-device tunnel (~100 ms/op).
            # Batch-1 sample: params are batch-independent and the smaller
            # program stays under the remote compile-upload limit.
            variables = jax.jit(self.model.init)(
                rng if rng is not None else jax.random.PRNGKey(0),
                jnp.zeros((1, h, w)), jnp.zeros((1, h, w, 3)),
                jnp.zeros((1, h, w, 4)), jnp.zeros((1, h, w, 1)))
        self.variables = variables

        @jax.jit
        def _run(variables, pre_depth, rgb):
            model_in = bgr_preprocess(rgb)
            edge_in = edge_model_inputs(model_in)
            canny = edge_in[..., :1]
            norm, depth, _ = self.model.apply(variables, pre_depth, rgb,
                                              edge_in, canny)
            return {"normals": norm, "depth": depth}

        self._run = _run

    def __call__(self, pre_depth: Array, rgb: Array) -> dict:
        return self._run(self.variables, pre_depth, rgb)


class MotionStage:
    def __init__(self, state=None, sample_shape=(1, 128, 416)):
        from sndepth_tpu.train import motion
        if state is None:
            state = motion.init_motion_state(
                jax.random.PRNGKey(0), sample_shape[1], sample_shape[2])
        self.state = state
        self._eval = motion.make_eval_step()

    def __call__(self, image01: Array, flow_rgb: Array) -> Array:
        batch = {"image": image01, "flow": flow_rgb,
                 "label": jnp.zeros(image01.shape[:3], jnp.int32)}
        return self._eval(self.state, batch)["pred"]


class RAFT3DStage:
    def __init__(self, variables=None, iters: int = 16,
                 sample_shape=(1, 128, 416), dtype=jnp.float32):
        from sndepth_tpu.models.raft3d import RAFT3D
        # dtype covers the encoders/GRU only; correlation, Gauss-Newton
        # and SE3 math stay f32 inside the model regardless.
        self.model = RAFT3D(dtype=dtype)
        self.iters = iters
        b, h, w = sample_shape
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((b, h, w, 3)),
                jnp.zeros((b, h, w, 3)), jnp.ones((b, h, w)),
                jnp.ones((b, h, w)), jnp.ones((b, 4)), iters=1)
        self.variables = variables

        @functools.partial(jax.jit, static_argnums=0)
        def _run(iters, variables, img1, img2, d1, d2, k):
            from sndepth_tpu.ops import se3
            Ts = self.model.apply(variables, img1, img2, d1, d2, k,
                                  iters=iters)
            return Ts, se3.log(Ts)

        self._run = _run

    def __call__(self, img1, img2, depth1, depth2, intrinsics):
        return self._run(self.iters, self.variables, img1, img2, depth1,
                         depth2, intrinsics)


class Raft2DFlowStage:
    """Dense 2-D optical flow for the motion input (`predict.py:61`'s
    torchvision RAFT-Large role).

    ``arch="large"`` is the torchvision-``raft_large``-compatible
    :class:`~sndepth_tpu.models.raft2d.RAFT2DLarge` — pass ``variables``
    from ``convert_raft2d_checkpoint`` to reproduce the reference's
    pretrained flow; ``arch="native"`` is the lighter RAFT2D."""

    def __init__(self, variables=None, iters: int = 12,
                 sample_shape=(1, 128, 416), arch: str = "native"):
        from sndepth_tpu.models.raft2d import RAFT2D, RAFT2DLarge
        self.model = RAFT2DLarge() if arch == "large" else RAFT2D()
        self.iters = iters
        b, h, w = sample_shape
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((b, h, w, 3)),
                jnp.zeros((b, h, w, 3)), iters=1)
        self.variables = variables

        @functools.partial(jax.jit, static_argnums=0)
        def _run(iters, variables, img1, img2):
            return self.model.apply(variables, img1, img2, iters=iters)

        self._run = _run

    def __call__(self, img1: Array, img2: Array) -> Array:
        return self._run(self.iters, self.variables, img1, img2)


class VAEStage:
    def __init__(self, variables=None, sample_shape=(1, 128, 416)):
        from sndepth_tpu.models.vae import get_autoencoder
        self.model = get_autoencoder(dtype=jnp.float32)
        b, h, w = sample_shape
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((b, h, w, 4)),
                rng=jax.random.PRNGKey(1))
        self.variables = variables

        @jax.jit
        def _encode(variables, rgbd):
            posterior = self.model.apply(variables, rgbd,
                                         method=self.model.encode)
            return posterior.mean, posterior.var

        self._encode = _encode

    def __call__(self, rgb01: Array, depth: Array) -> tuple[Array, Array]:
        rgbd = jnp.concatenate([rgb01, depth[..., None]], axis=-1)
        return self._encode(self.variables, rgbd)


class TrackStage:
    """UniAD track + DINO features + pose Denoiser
    (`predict_vae_uniad.py:57-68`)."""

    def __init__(self, num_cams: int = 1, image_hw=(64, 64),
                 vit_depth: int = 4):
        """``vit_depth`` < 12 shrinks the DINO-style extractor for smoke
        runs; the full-scale extractor is ``ViT()`` defaults."""
        from sndepth_tpu.models.uniad_track import UniADTrack
        from sndepth_tpu.models.vit import (MultiScaleImageFeatureExtractor,
                                            ViT)
        from sndepth_tpu.models.denoiser import get_opt_model

        self.track_model = UniADTrack(
            num_query=32, num_classes=10, embed_dims=64, bev_h=8, bev_w=8,
            num_cams=num_cams, encoder_layers=2, decoder_layers=2,
            backbone_blocks=(1, 1, 1, 1), mem_len=2)
        h, w = image_hw
        imgs = jnp.zeros((num_cams, 1, h, w, 3))
        l2i = jnp.tile(jnp.eye(4)[None, None], (1, num_cams, 1, 1))

        def _mk_state():
            from sndepth_tpu.models.uniad_track import TrackState
            from sndepth_tpu.models.track_runtime import empty_tracks
            return TrackState(
                prev_bev=jnp.zeros((1, 64, 64)),
                tracks=empty_tracks(32, 64, 10, 2),
                next_obj_id=jnp.zeros((), jnp.int32),
                timestamp=jnp.zeros(()),
                has_prev=jnp.zeros((), bool))

        self._mk_state = _mk_state
        self.track_vars = self.track_model.init(
            jax.random.PRNGKey(0), imgs, l2i, _mk_state())

        class _SmallExtractor(MultiScaleImageFeatureExtractor):
            def setup(self):
                self.net = ViT(depth=vit_depth)

        self.feat_model = _SmallExtractor(scale_factors=(1.0, 0.5))
        self.feat_vars = self.feat_model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)))

        self.denoiser = get_opt_model()
        self.denoiser_vars = self.denoiser.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 32, 9)), jnp.zeros((1,)),
            jnp.zeros((1, 32, 384)))

        self._track = jax.jit(
            lambda v, imgs, l2i, st: self.track_model.apply(v, imgs, l2i,
                                                            st))
        self._feats = jax.jit(
            lambda v, img: self.feat_model.apply(v, img))
        self._denoise = jax.jit(
            lambda v, x, t, z: self.denoiser.apply(v, x, t, z))

    def init_state(self):
        return self._mk_state()

    def __call__(self, imgs: Array, lidar2img: Array, state,
                 rgb_for_features: Array):
        state, results = self._track(self.track_vars, imgs, lidar2img,
                                     state)
        feats = self._feats(self.feat_vars, rgb_for_features)   # (B, 384)
        n = 32
        z = jnp.broadcast_to(feats[:, None, :], (feats.shape[0], n, 384))
        x = jnp.zeros((feats.shape[0], n, 9))
        t = jnp.zeros((feats.shape[0],))
        poses = self._denoise(self.denoiser_vars, x, t, z)
        return state, results, poses
