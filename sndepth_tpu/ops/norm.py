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

import os
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


# ---------------------------------------------------------------------------
# Lane-folded BatchNorm
# ---------------------------------------------------------------------------

def _bn_fold_factor(shape: tuple, max_f: int = 16) -> int:
    """Largest-utilization fold of the trailing spatial axis into lanes.

    NHWC BatchNorm ops put C on lanes; EfficientNet-B5's narrow stages
    (C = 24/40/48/64) run every stats reduce and normalize at C/128 lane
    utilization, and the mid channels (144, 240, ...) waste most of a
    second tile. Folding W into the channel axis — ``(..., W, C) ->
    (..., W/f, f*C)``, a FREE reshape in row-major NHWC — lifts
    utilization to ``f*C / (128 * ceil(f*C/128))``. Returns the smallest
    f (dividing W, f <= max_f) that maximizes that utilization; 1 when
    folding is disabled (SNDEPTH_BN_FOLD, default off until A/B'd on
    hardware) or never helps.
    """
    if os.environ.get("SNDEPTH_BN_FOLD", "0") == "0":
        return 1
    if len(shape) < 3:
        return 1
    c, w = shape[-1], shape[-2]

    def util(f):
        return (f * c) / (128.0 * -(-(f * c) // 128))

    best, best_u = 1, util(1)
    for f in range(2, max_f + 1):
        if w % f == 0 and util(f) > best_u + 1e-9:
            best, best_u = f, util(f)
    return best


class BatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` drop-in with lane-folded stats/normalize.

    The class is deliberately named ``BatchNorm`` so flax auto-naming
    produces the same ``BatchNorm_i`` parameter paths as the stock
    module — converted checkpoints and existing param trees load
    unchanged. Semantics match ``nn.BatchNorm`` (fast-variance f32
    stats, momentum EMA skipped at init, result dtype promotion); the
    only difference is the free ``(..., W, C) -> (..., W/f, f*C)``
    reshape around the reduces and the elementwise normalize, chosen by
    :func:`_bn_fold_factor` (identity unless SNDEPTH_BN_FOLD=1).
    Parity (fwd train/eval, grads, EMA) is tested against
    ``nn.BatchNorm`` in tests/test_norm.py.
    """

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool | None = None,
                 *, mask: Array | None = None) -> Array:
        if (mask is not None or self.axis != -1
                or self.axis_name is not None
                or not self.use_fast_variance
                or not self.force_float32_reductions):
            raise NotImplementedError(
                "lane-folded BatchNorm supports the default axis=-1 "
                "fast-variance configuration only")
        use_ra = nn.module.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        c = x.shape[-1]
        f = _bn_fold_factor(x.shape)
        fold = x.shape[:-2] + (x.shape[-2] // f, f * c)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32),
            (c,))
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32),
            (c,))

        xf = x.reshape(fold).astype(jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(xf.ndim - 1))
            mu_f = jnp.mean(xf, red)                        # (f*C,)
            mu2_f = jnp.mean(xf * xf, red)
            mean = jnp.mean(mu_f.reshape(f, c), 0)
            mu2 = jnp.mean(mu2_f.reshape(f, c), 0)
            var = jnp.maximum(0.0, mu2 - mean * mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        mul = jax.lax.rsqrt(var + self.epsilon)
        args = [x]
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (c,),
                               self.param_dtype)
            mul = mul * scale
            args.append(scale)
        y = (xf - jnp.tile(mean, f)) * jnp.tile(mul, f)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (c,),
                              self.param_dtype)
            y = y + jnp.tile(bias, f)
            args.append(bias)
        from flax.linen import dtypes as _dtypes
        dtype = _dtypes.canonicalize_dtype(*args, dtype=self.dtype)
        return y.reshape(x.shape).astype(dtype)
