"""CLI: UniAD tracker clip training.

Reference: `/root/reference/models/track_uniad.py:363-624`
(`_forward_single_frame_train` / `forward_train`) — per-frame tracking
over a clip with track-instance carry, QIM train behavior, and the
ClipMatcher loss (labels + boxes + past-traj + per-aux-layer terms).
Without a nuScenes-style dataset in the image the default stream is the
synthetic drifting-boxes clip used by the descent tests; a dataset hook
can replace it by yielding dicts with the same keys.
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="UniAD tracker clip training")
    p.add_argument("--ckpt_dir", default="checkpoints/uniad")
    p.add_argument("--max_steps", default=50, type=int)
    p.add_argument("--log_every", default=5, type=int)
    p.add_argument("--t_frames", default=3, type=int)
    p.add_argument("--num_gt", default=4, type=int)
    p.add_argument("--img_size", default=64, type=int)
    p.add_argument("--lr", default=2e-4, type=float)
    p.add_argument("--small", action="store_true",
                   help="small model config (for smoke runs)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder/decoder sublayers "
                        "(reference-scale memory; see "
                        "tools/uniad_refscale_mesh.py)")
    args = p.parse_args(argv)

    from sndepth_tpu.models.uniad_track import (UniADTrack,
                                                uniad_reference_config)
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.train import uniad as tu

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.small:
        model = UniADTrack(
            num_query=12, num_classes=3, embed_dims=32, bev_h=4, bev_w=4,
            num_cams=2, encoder_layers=1, decoder_layers=2,
            backbone_blocks=(1, 1, 1, 1), mem_len=2, dtype=dtype,
            remat=args.remat)
    else:
        model = uniad_reference_config(dtype=dtype, remat=args.remat)
    clip = tu.synthetic_clip(model, t_frames=args.t_frames, ng=args.num_gt,
                             img_hw=(args.img_size, args.img_size))
    state = tu.create_train_state(model, clip, learning_rate=args.lr)
    step_fn = tu.make_train_step(model, learning_rate=args.lr)

    metrics = {}
    for i in range(args.max_steps):
        state, metrics = step_fn(state, clip)
        if (i + 1) % args.log_every == 0 or i + 1 == args.max_steps:
            m = jax.device_get(metrics)
            parts = " ".join(f"{k}={float(v):.4f}" for k, v in
                             sorted(m.items()))
            print(f"step {i + 1}/{args.max_steps} {parts}", flush=True)
    ckpt_lib.save_checkpoint(args.ckpt_dir, state, int(state.step))
    print(f"checkpoint -> {args.ckpt_dir}/{int(state.step)}")


if __name__ == "__main__":
    main()
