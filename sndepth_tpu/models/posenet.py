"""PoseNet: 6-DoF relative camera pose regressor (TPU-native, NHWC).

Same topology as the reference (`/root/reference/models/PoseNet.py:17-52`):
seven stride-2 convs (kernels 7, 5, then 3s; channels 16..256) over the
channel-concatenated [target, sources] frames, a 1x1 conv to
``6 * num_source`` channels, a global spatial mean, and a 0.01 output scale.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_xavier = nn.initializers.xavier_uniform()


class PoseNet(nn.Module):
    """Input: (B, H, W, 3*(1+num_source)) in [-1, 1].
    Output: (B, num_source, 6) pose vectors [tx ty tz rx ry rz]."""

    num_source: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        plan = ((16, 7), (32, 5), (64, 3), (128, 3), (256, 3), (256, 3),
                (256, 3))
        for features, k in plan:
            p = (k - 1) // 2   # torch-symmetric padding (see dispnet.py)
            x = nn.Conv(features, (k, k), strides=(2, 2),
                        padding=((p, p), (p, p)), dtype=self.dtype,
                        kernel_init=_xavier)(x)
            x = nn.relu(x)
        x = nn.Conv(6 * self.num_source, (1, 1), dtype=jnp.float32,
                    kernel_init=_xavier)(x.astype(jnp.float32))
        pose = jnp.mean(x, axis=(1, 2))
        return 0.01 * pose.reshape(pose.shape[0], self.num_source, 6)
