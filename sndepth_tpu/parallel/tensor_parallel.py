"""Tensor-parallel sharding rules.

The reference has no model parallelism (survey §2.9); the transformer
stacks here (Denoiser, VAE attention, BEVFormer) are the components wide
enough to shard. Rule: every ``Dense`` kernel (in, out) is sharded
``P(None, 'model')`` (its bias ``P('model')``), everything else replicated;
pjit's SPMD partitioner then splits the matmuls across the model axis and
inserts the activation all-gathers/reduce-scatters over ICI.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sndepth_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


def dense_tp_shardings(params, mesh: Mesh):
    """Sharding pytree: Dense kernels split on the output (model) axis."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        # Shard only when the output dim divides the model axis; ragged
        # heads (e.g. the 9-dim pose output, LayerNorm vectors) replicate.
        if (names and names[-1] == "kernel" and leaf.ndim == 2
                and leaf.shape[1] % model_size == 0):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if (names and names[-1] == "bias" and leaf.ndim == 1
                and leaf.shape[0] % model_size == 0
                and any("Dense" in str(n) for n in names)):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def run_tensor_parallel_denoiser(devices: Sequence[jax.Device],
                                 model_parallel: int = 2):
    """Build the pose Denoiser with its Dense layers sharded over the model
    axis and run one forward pass. Returns the (replicated) output."""
    from sndepth_tpu.models.denoiser import Denoiser

    mesh = make_mesh(devices, model_parallel=model_parallel)
    model = Denoiser(num_layers=2, d_model=64, dim_feedforward=128)

    batch = mesh.shape[DATA_AXIS]
    x = jnp.zeros((batch, 4, 9))
    t = jnp.zeros((batch,))
    z = jnp.zeros((batch, 4, 384))
    variables = model.init(jax.random.PRNGKey(0), x, t, z)
    params = variables["params"]

    param_shardings = dense_tp_shardings(params, mesh)
    params = jax.device_put(params, param_shardings)
    replicated = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, P(DATA_AXIS))

    fwd = jax.jit(
        lambda p, x, t, z: model.apply({"params": p}, x, t, z),
        in_shardings=(param_shardings, data_sharding, data_sharding,
                      data_sharding),
        out_shardings=replicated)
    return fwd(params, jax.device_put(x, data_sharding),
               jax.device_put(t, data_sharding),
               jax.device_put(z, data_sharding))
