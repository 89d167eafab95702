"""UniAD train step at the REFERENCE config, sharded on a virtual mesh.

VERDICT r3 #3: execute one clip-train step of the full reference
configuration (200x200 BEV, 901 queries, 6+6 layers, R101, 6 cams, T=2 —
`/root/reference/models/track_uniad.py:877-1122`) under FSDP sharding +
sublayer remat + bf16 on an 8-device virtual CPU mesh, and record the
per-device memory demand and step wall time.

On one chip the unremat f32 backward demands 2.19 TB of HBM (BASELINE.md);
this run proves the designed multi-chip path (FSDP param/opt sharding +
nn.remat over every encoder/decoder sublayer + bf16 activations) compiles
AND executes.

Usage: python tools/uniad_refscale_mesh.py [--img H W] [--devices N]
       [--t_frames T] [--f32] [--no_remat]
"""
import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", nargs=2, type=int, default=(224, 416))
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--t_frames", type=int, default=2)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--bev", type=int, default=0,
                    help="override BEV size (smoke tests only)")
    ap.add_argument("--compile_only", action="store_true",
                    help="stop after compile + memory_analysis")
    args = ap.parse_args()

    # On one physical core the N virtual devices timeshare, so XLA:CPU's
    # default 40 s collective rendezvous deadline fires mid-step at
    # reference scale — raise it (observed: collective-permute rendezvous
    # termination with 3/8 arrivals).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=28800"
        + " --xla_cpu_collective_timeout_seconds=28800")
    import jax
    jax.config.update("jax_platforms", "cpu")   # env override is latched
    import functools
    import jax.numpy as jnp

    from sndepth_tpu.models.uniad_track import uniad_reference_config
    from sndepth_tpu.parallel.fsdp import (fsdp_shardings,
                                           sharded_param_bytes_per_device)
    from sndepth_tpu.parallel.mesh import make_mesh, replicated
    from sndepth_tpu.train import uniad as tu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    over = {}
    if args.bev:
        over = dict(bev_h=args.bev, bev_w=args.bev)
    model = uniad_reference_config(dtype=dtype, remat=not args.no_remat,
                                   **over)
    print(f"[refscale-mesh] devices={jax.device_count()} dtype={dtype} "
          f"remat={not args.no_remat} img={tuple(args.img)} "
          f"T={args.t_frames}", flush=True)

    t0 = time.time()
    clip = tu.synthetic_clip(model, t_frames=args.t_frames, ng=8,
                             img_hw=tuple(args.img))
    state = tu.create_train_state(model, clip)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"[refscale-mesh] init done in {time.time() - t0:.1f}s, "
          f"{nparams / 1e6:.1f}M params", flush=True)

    mesh = make_mesh(data_parallel=jax.device_count())
    st_sh = fsdp_shardings(state, mesh)
    state = jax.device_put(state, st_sh)
    per_dev = sharded_param_bytes_per_device(state, mesh)
    print(f"[refscale-mesh] FSDP state: {per_dev / 2**30:.2f} GiB/device",
          flush=True)

    step = jax.jit(functools.partial(tu.train_step, model=model),
                   in_shardings=(st_sh, replicated(mesh)),
                   out_shardings=(st_sh, replicated(mesh)),
                   donate_argnums=(0,))

    t0 = time.time()
    lowered = step.lower(state, clip)
    print(f"[refscale-mesh] lowered in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[refscale-mesh] compiled in {time.time() - t0:.1f}s", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"[refscale-mesh] memory_analysis (per device): "
              f"temp {ma.temp_size_in_bytes / 2**30:.2f} GiB, "
              f"args {ma.argument_size_in_bytes / 2**30:.2f} GiB, "
              f"out {ma.output_size_in_bytes / 2**30:.2f} GiB", flush=True)
    except Exception as exc:                       # CPU may not implement
        print(f"[refscale-mesh] memory_analysis unavailable: {exc}",
              flush=True)
    if args.compile_only:
        return

    t0 = time.time()
    state, metrics = compiled(state, clip)
    loss = float(metrics["loss_total"])            # force execution
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    print(f"[refscale-mesh] ONE STEP OK: loss={loss:.4f} "
          f"wall={dt:.1f}s (1-core virtual mesh; wall is not a TPU "
          f"number) peak_rss={rss:.1f} GiB", flush=True)
    for k, v in sorted(metrics.items()):
        print(f"    {k} = {float(v):.5f}", flush=True)


if __name__ == "__main__":
    main()
