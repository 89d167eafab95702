"""Typed configuration tree for the framework.

The reference scatters configuration across per-script argparse parsers and
inline dicts (survey §5); here every workload has one frozen dataclass whose
defaults reproduce the reference's (`/root/reference/models/baseline.py:43-123`
for GeoNet).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GeoNetConfig:
    """Self-supervised depth+pose training config (reference defaults)."""

    # Workload shape (`baseline.py:51-66`)
    sequence_length: int = 3
    batch_size: int = 4
    img_height: int = 128
    img_width: int = 416
    num_scales: int = 4
    seed: int = 8964
    epochs: int = 30

    # Loss hyperparameters (`baseline.py:95-100`)
    simi_alpha: float = 0.85
    loss_weight_rigid_warp: float = 1.0
    loss_weight_disparity_smooth: float = 0.5

    # Full-flow training mode (`baseline.py:49` train_flow + the GeoNet
    # stage-2 loss constants preserved at `baseline.py:110-116`)
    train_flow: bool = False
    flow_scale_factor: float = 0.1
    geometric_consistency_alpha: float = 3.0
    geometric_consistency_beta: float = 0.05
    loss_weight_full_warp: float = 1.0
    loss_weight_full_smooth: float = 0.2
    loss_weight_geometrical_consistency: float = 0.2

    # Optimizer (`baseline.py:101-108`)
    learning_rate: float = 2e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    weight_decay: float = 0.0

    # TPU-specific knobs (no reference counterpart)
    compute_dtype: Any = jnp.bfloat16
    # DispNetS encoder levels whose stride-1 conv runs in exact
    # space-to-depth form (see models/dispnet._S2DConv).
    dispnet_s2d_levels: tuple = (0,)
    # DispNetS decoder iconv indices evaluated in s2d form with packed
    # gradients (4 -> i3, 5 -> i2, 6 -> i1; see models/dispnet._IConv).
    dispnet_s2d_iconv_levels: tuple = ()
    # DispNetS encoder levels whose stride-2 conv computes its data-grad
    # lane-packed (see models/dispnet._PackedDGradDownConv).
    dispnet_packed_dgrad_levels: tuple = ()
    # DispNetS decoder up-conv indices evaluated in s2d (2x2-conv +
    # depth-to-space) form (see models/dispnet._S2DUpConv2x).
    dispnet_s2d_up_levels: tuple = ()
    # DispNetS decoder iconv indices whose WEIGHT grad only is folded
    # (see models/dispnet._WgradS2DConv).
    dispnet_wgrad_s2d_iconv_levels: tuple = ()
    # Disparity heads in s2d form (see models/dispnet.DispNetS.s2d_heads).
    dispnet_s2d_heads: bool = False
    # Disparity heads as tap-stacked matmul + shift-add (takes precedence
    # over s2d_heads; see models/dispnet._TapStackHeadConv).
    dispnet_mat_heads: bool = False
    # Same knobs for the stage-2 FlowNet (identical encoder shapes).
    flownet_s2d_levels: tuple = (0,)
    flownet_s2d_iconv_levels: tuple = ()
    flownet_packed_dgrad_levels: tuple = ()
    # Rematerialize DispNetS encoder blocks in backward. Round-1 remat won
    # 339->308 ms when the direct 7x7 conv dominated; with the s2d conv the
    # recompute (2 extra conv passes) costs more than storing: measured
    # 225.6 (off) vs 242.6 (on) ms/step at batch 128 on v5e.
    dispnet_remat: bool = False
    # Pallas fused-DSSIM kernel: measured at parity with XLA's own fusion
    # (see kernels/dssim.py), so off by default in the train path.
    use_fused_warp_ssim_kernel: bool = False

    @property
    def num_source(self) -> int:
        return self.sequence_length - 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for pjit sharding (survey §2.9).

    The reference is single-node ``DataParallel``; here data-parallel is the
    primary axis, with an optional model axis reserved for sharding wide
    attention/conv channels in the VAE / BEVFormer stacks.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1      # -1 = all remaining devices
    model_parallel: int = 1
