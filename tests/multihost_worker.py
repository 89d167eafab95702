"""Worker for the real 2-process multi-host test (spawned by
tests/test_parallel.py::test_multihost_two_process_dp_step).

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh, load only their per-host slice of the global batch, stitch it
with make_global_batch, and run one pjit DP GeoNet train step. Both
processes must observe the identical global loss (printed for the parent
to compare).
"""

import os
import sys


def main() -> None:
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sndepth_tpu.parallel.multihost import (broadcast_from_host0,
                                                initialize_multihost,
                                                make_global_batch,
                                                per_host_batch_slice,
                                                sync_hosts)
    info = initialize_multihost(coordinator, n_proc, pid)
    assert info["global_devices"] == 4 * n_proc, info

    import numpy as np
    import jax.numpy as jnp

    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.parallel import mesh as pmesh
    from sndepth_tpu.train import geonet

    gb = 8
    cfg = GeoNetConfig(batch_size=gb, img_height=32, img_width=64,
                       compute_dtype=jnp.float32)
    # every host materializes the same deterministic global batch, then
    # keeps only its own slice (the host-side input-parallel contract)
    rng = np.random.RandomState(0)
    h, w = cfg.img_height, cfg.img_width
    full = {
        "tgt": rng.randint(0, 256, (gb, h, w, 3)).astype(np.uint8),
        "src": rng.randint(0, 256, (gb, h, w, 6)).astype(np.uint8),
        "intrinsics": np.tile(np.array(
            [[[32.0, 0, 32.0], [0, 32.0, 16.0], [0, 0, 1]]], np.float32),
            (gb, 1, 1)),
    }
    per, off = per_host_batch_slice(gb)
    local = {k: v[off:off + per] for k, v in full.items()}

    mesh = pmesh.make_mesh()
    state = geonet.create_train_state(cfg)
    state = pmesh.replicate_state(state, mesh)
    batch = make_global_batch(local, mesh)
    step = pmesh.make_parallel_train_step(cfg, mesh)
    state, metrics = step(state, batch)
    sync_hosts("post-step")
    loss = float(jax.device_get(metrics["loss_total"]))
    tree = broadcast_from_host0({"seed": 123})
    assert tree["seed"] == 123
    print(f"MHLOSS {pid} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
