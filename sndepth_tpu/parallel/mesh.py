"""Device mesh construction and sharded train-step factories.

The reference scales out via single-process ``torch.nn.DataParallel``
(survey §2.9, e.g. `/root/reference/kitti_submission.py:196`); here the
equivalent is a ``jax.sharding.Mesh`` with a primary data axis and a reserved
model axis, with pjit/XLA inserting the gradient ``psum`` over ICI
automatically because the loss is a mean over the batch-sharded inputs.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.train import geonet

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Sequence[jax.Device] | None = None,
              data_parallel: int | None = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None or data_parallel <= 0:
        data_parallel = n // model_parallel
    if data_parallel < 1:
        raise ValueError(
            f"{n} device(s) cannot support model_parallel={model_parallel}")
    used = data_parallel * model_parallel
    grid = np.asarray(devices[:used]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def make_parallel_train_step(config: GeoNetConfig, mesh: Mesh):
    """pjit-sharded GeoNet train step: params/opt replicated, batch sharded.

    The per-device batch shard must be >= 1, i.e. global batch size must be a
    multiple of the data-axis size.
    """
    step = functools.partial(geonet.train_step, config=config)
    return jax.jit(
        step,
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))
