"""Layout-friendly GroupNorm for NHWC TPU activations.

``flax.linen.GroupNorm`` reshapes the activation itself to
(N, ..., groups, C//groups) before reducing. Whenever C//groups is not a
lane multiple (e.g. the NNET decoder's 128-channel level with 8 groups:
C//g = 16) that view forces a relayout copy of the FULL activation in
both directions plus 16-lane reduces — measured as the largest single
block of the NNET train step (~48 ms of 195 at batch 4x480x640,
normalization.py:57/114/205/216/223/226 rows in the line attribution).

:class:`BlockedGroupNorm` computes the same statistics without ever
materializing the 5D view: per-channel sums over the spatial axes (C
stays on lanes), a tiny (N, g, C//g) reduce of the per-channel partials,
and one fused elementwise normalize. Same parameter tree as
``nn.GroupNorm`` ("scale"/"bias", shape (C,)) so converted checkpoints
load unchanged; exactness (fwd + grads, f32 and bf16) is tested against
``nn.GroupNorm`` in tests/test_norm.py.

Matches flax semantics: stats in f32 (mean / mean-of-squares), epsilon
inside the rsqrt, scale/bias applied then cast to ``dtype``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class BlockedGroupNorm(nn.Module):
    num_groups: int | None = 32
    group_size: int | None = None
    epsilon: float = 1e-6
    dtype: Any = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        if self.group_size is not None:
            if c % self.group_size:
                raise ValueError(f"channels {c} % group_size "
                                 f"{self.group_size} != 0")
            g = c // self.group_size
        else:
            g = self.num_groups
        if c % g:
            raise ValueError(f"channels {c} % num_groups {g} != 0")
        cs = c // g
        red = tuple(range(1, x.ndim - 1))
        n_red = float(np.prod([x.shape[a] for a in red]) * cs)

        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, red)                    # (N, C) — C stays lanes
        s2 = jnp.sum(xf * xf, red)
        s1g = jnp.sum(s1.reshape(-1, g, cs), -1)
        s2g = jnp.sum(s2.reshape(-1, g, cs), -1)
        mean_g = s1g / n_red
        var_g = jnp.maximum(s2g / n_red - mean_g * mean_g, 0.0)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)

        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        mean = jnp.repeat(mean_g, cs, axis=-1).reshape(bshape)
        inv = jnp.repeat(inv_g, cs, axis=-1).reshape(bshape)

        y = (xf - mean) * inv
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (c,),
                               jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,),
                              jnp.float32)
            y = y + bias
        return y.astype(self.dtype or x.dtype)
