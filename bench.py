"""Benchmark: self-supervised GeoNet train-step throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the canonical KITTI 128x416 self-supervised step (DispNetS +
PoseNet + 4-scale rigid-warp photometric loss + Adam), per
`/root/reference/models/baseline.py:51-108`. "frames" counts every image a
step consumes (batch x 3-frame snippet). vs_baseline is against the
north-star target of 5000 frames/sec/chip (BASELINE.json).

Measurement protocol: on this environment's remote-TPU runtime,
``jax.block_until_ready`` returns before execution completes and identical
(executable, input) pairs are memoized, so the timed chain keeps the same
batch (the train state changes every step — each step is distinct work)
and is forced by fetching the final loss scalar to host. Honest profile
(see BASELINE.md): 339 ms/step at batch 128 with the Pallas warp kernel
(`kernels/warp.py`; was 2.18 s with XLA's row-gather warp). Conv nets are
~36 ms of that; the rest is the multi-scale warp+DSSIM loss.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

NORTH_STAR_FPS = 5000.0


def _measure(config, batch_data, iters: int = 10) -> float:
    """Frames/sec for one config under the forced-chain protocol."""
    import time as _time

    from sndepth_tpu.train import geonet

    state = geonet.create_train_state(config)
    step = geonet.make_train_step(config)
    # Warmup: compile + force all transfers/executions to really happen.
    state, metrics = step(state, batch_data)
    _ = float(metrics["loss_total"])
    state, metrics = step(state, batch_data)
    _ = float(metrics["loss_total"])
    t0 = _time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data)
    final_loss = float(metrics["loss_total"])   # forces the whole chain
    dt = _time.perf_counter() - t0
    assert np.isfinite(final_loss)
    return config.batch_size * config.sequence_length * iters / dt


def _measure_dp(config, batch_data, iters: int = 10) -> float:
    """Mesh-sharded (data-parallel over all visible devices) variant:
    ``bench.py --data_parallel``. On the single-chip axon slot this is a
    1-device mesh (a plumbing no-op); on a real multi-chip slot it is the
    one-liner that produces the scaled number."""
    import time as _time

    from sndepth_tpu.parallel import mesh as pmesh
    from sndepth_tpu.train import geonet

    mesh = pmesh.make_mesh()
    state = pmesh.replicate_state(geonet.create_train_state(config), mesh)
    data = pmesh.shard_batch(batch_data, mesh)
    step = pmesh.make_parallel_train_step(config, mesh)
    state, metrics = step(state, data)
    _ = float(metrics["loss_total"])
    state, metrics = step(state, data)
    _ = float(metrics["loss_total"])
    t0 = _time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data)
    final_loss = float(metrics["loss_total"])
    dt = _time.perf_counter() - t0
    assert np.isfinite(final_loss)
    return config.batch_size * config.sequence_length * iters / dt


def main() -> None:
    import sys

    import jax.numpy as jnp
    from sndepth_tpu.core.config import GeoNetConfig

    data_parallel = "--data_parallel" in sys.argv
    batch = int(os.environ.get("SNDEPTH_BENCH_BATCH", "128"))
    rng = np.random.RandomState(0)
    base = GeoNetConfig(batch_size=batch, compute_dtype=jnp.bfloat16)
    h, w = base.img_height, base.img_width
    batch_data = {
        "tgt": jnp.asarray(
            rng.randint(0, 256, (batch, h, w, 3), dtype=np.uint8)),
        "src": jnp.asarray(
            rng.randint(0, 256, (batch, h, w, 6), dtype=np.uint8)),
        "intrinsics": jnp.asarray(np.tile(
            np.array([[[241.0, 0, 208.0], [0, 246.0, 64.0], [0, 0, 1]]],
                     np.float32), (batch, 1, 1))),
    }

    # One measured-optimal configuration. The round-2 on-TPU A/B sweep
    # (2026-08-18) showed every extra lane-packing knob loses vs the
    # default: iconv s2d 1915 f/s, packed dgrad 1972, s2d heads 1880,
    # default 2002; disabling the level-0 s2d conv costs 57 ms/step
    # (1542 f/s). The knobs stay available in GeoNetConfig but default
    # off; bench measures the winner only.
    candidates = {"default": base}
    results = {}
    measure = _measure_dp if data_parallel else _measure
    for name, cfg in candidates.items():
        results[name] = measure(cfg, batch_data)
        print(f"[bench] {name}: {results[name]:.1f} frames/sec",
              file=sys.stderr, flush=True)
    fps = max(results.values())
    if data_parallel:
        import jax
        n = jax.device_count()
        print(json.dumps({
            "metric": "geonet_selfsup_train_throughput_128x416_dp",
            "value": round(fps, 1),
            "unit": f"frames/sec/{n}-device-mesh",
            "vs_baseline": round(fps / n / NORTH_STAR_FPS, 3),
        }))
        return
    print(json.dumps({
        "metric": "geonet_selfsup_train_throughput_128x416",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 3),
    }))


if __name__ == "__main__":
    main()
