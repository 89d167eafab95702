"""Training-loop driver: data -> sharded step -> logging -> checkpoints.

Replaces the reference's ``GeoNetModel.train`` epoch loop
(`/root/reference/models/baseline.py:1236-1278`): same cadence contract
(scalars every 100 iters, checkpoint every 5000 iters by default) but with a
device-resident step, host prefetch, full-state checkpoints, and optional
multi-chip data parallelism.
"""

from __future__ import annotations

import time
from typing import Iterator

import jax

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.data.prefetch import device_prefetch
from sndepth_tpu.parallel import mesh as pmesh
from sndepth_tpu.parallel.multihost import sync_hosts
from sndepth_tpu.train import checkpoint as ckpt_lib
from sndepth_tpu.train import geonet
from sndepth_tpu.utils.logging import MetricLogger


def train_geonet(config: GeoNetConfig, batches: Iterator[dict],
                 max_steps: int, *, ckpt_dir: str | None = None,
                 log_dir: str | None = None, log_every: int = 100,
                 ckpt_every: int = 5000, resume: bool = False,
                 use_mesh: bool = True,
                 profile_at: int | None = None) -> geonet.TrainState:
    """Run ``max_steps`` train steps over ``batches``; returns final state."""
    devices = jax.devices()
    mesh = pmesh.make_mesh(devices) if (use_mesh and len(devices) > 1) else None

    state = geonet.create_train_state(config)
    start_step = 0
    if resume and ckpt_dir is not None:
        step = ckpt_lib.latest_step(ckpt_dir)
        if step is not None:
            state = ckpt_lib.restore_checkpoint(ckpt_dir, state, step)
            start_step = int(state.step)
            print(f"resumed from {ckpt_dir}/{step}")

    if mesh is not None:
        state = pmesh.replicate_state(state, mesh)
        step_fn = pmesh.make_parallel_train_step(config, mesh)
        if jax.process_count() > 1:
            # Each host feeds only its local slice of the global batch;
            # stitch the local shards into globally-sharded arrays.
            from sndepth_tpu.parallel.multihost import make_global_batch
            batches = (make_global_batch(b, mesh) for b in batches)
        else:
            batches = device_prefetch(
                batches, sharding=pmesh.batch_sharding(mesh))
    else:
        step_fn = geonet.make_train_step(config)
        batches = device_prefetch(batches)

    logger = MetricLogger(log_dir)
    writer = (ckpt_lib.AsyncCheckpointWriter(ckpt_dir)
              if ckpt_dir is not None else None)
    t0 = time.perf_counter()
    metrics = {}
    for i in range(start_step, max_steps):
        try:
            batch = next(batches)
        except StopIteration:
            print("data stream exhausted")
            break
        if profile_at is not None and i + 1 == profile_at:
            # capture one steady-state step as an XProf device trace
            from sndepth_tpu.utils.profiling import capture_trace
            trace_dir = (log_dir or "logs") + "/trace"
            with capture_trace(trace_dir):
                state, metrics = step_fn(state, batch)
                # force execution inside the trace window: on the remote
                # runtime block_until_ready returns early (CLAUDE.md) —
                # only a host fetch of the result is an honest barrier
                jax.device_get(metrics)
            print(f"XProf trace (step {i + 1}) -> {trace_dir}")
        else:
            state, metrics = step_fn(state, batch)
        step = i + 1
        if step % log_every == 0 or step == max_steps:
            logger.log(step, jax.device_get(metrics))
        if writer is not None and (step % ckpt_every == 0
                                   or step == max_steps):
            # async: serialization overlaps subsequent train steps; the
            # next save (or the final close) joins the in-flight write
            sync_hosts("pre-checkpoint")
            path = writer.save(state, step)
            sync_hosts("post-checkpoint")
            print(f"checkpoint (async) -> {path}")
    if writer is not None:
        writer.close()
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    done = max(int(jax.device_get(state.step)) - start_step, 1)
    fps = done * config.batch_size * config.sequence_length / dt
    print(f"trained {done} steps in {dt:.1f}s "
          f"({fps:.0f} frames/sec)")
    logger.close()
    return state
