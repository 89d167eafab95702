"""Multi-host initialization (ICI within a slice, DCN across slices).

The reference is single-node with no distributed backend (survey §2.9);
here multi-host SPMD needs only ``jax.distributed.initialize`` before first
device use — pjit handles everything else through the global mesh.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> dict:
    """Initialize the JAX distributed runtime (no-op on a single host).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters. Returns a summary dict.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def per_host_batch_slice(global_batch: int) -> tuple[int, int]:
    """(host batch size, host offset) for per-host sharded input loading."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    return per, per * jax.process_index()


def make_global_batch(batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble per-host *local* batch arrays into globally-sharded
    ``jax.Array``s over ``mesh``.

    Each host loads only its ``per_host_batch_slice`` of the global batch
    (host-side input parallelism, survey §2.9); this stitches those local
    shards into global arrays whose leading axis is sharded over ``axis``
    without any cross-host data movement. Works unchanged single-process
    (where it is equivalent to ``device_put`` with a batch sharding).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier (no-op single-process). Use around checkpoint
    save/restore boundaries so hosts do not race the filesystem."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def broadcast_from_host0(tree):
    """Broadcast host-0's pytree values to every host (single-process:
    identity). For seeding RNG/config decisions consistently across hosts."""
    if jax.process_count() <= 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)
