"""CLI: RAFT3D scene-flow training.

The reference ships RAFT3D inference only; this trains with the sequence
loss in `sndepth_tpu.train.raft3d` over the KITTI scene-flow reader
(`data/raft3d_datasets.py`), falling back to a synthetic stream without
data so the loop is exercisable anywhere.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def _synthetic_batches(b, h, w, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield {
            "image1": rng.rand(b, h, w, 3).astype(np.float32),
            "image2": rng.rand(b, h, w, 3).astype(np.float32),
            "depth1": (2 + rng.rand(b, h, w)).astype(np.float32),
            "depth2": (2 + rng.rand(b, h, w)).astype(np.float32),
            "flow": np.zeros((b, h, w, 3), np.float32),
            "valid": np.ones((b, h, w), np.float32),
            "intrinsics": np.tile(
                np.array([w * 0.6, w * 0.6, w / 2, h / 2], np.float32),
                (b, 1)),
        }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="RAFT3D training")
    p.add_argument("--root", default="data/raft_datasets")
    p.add_argument("--ckpt_dir", default="checkpoints/raft3d")
    p.add_argument("--batch_size", default=2, type=int)
    p.add_argument("--img_height", default=256, type=int)
    p.add_argument("--img_width", default=832, type=int)
    p.add_argument("--iters", default=12, type=int)
    p.add_argument("--max_steps", default=0, type=int)
    p.add_argument("--corr_levels", default=4, type=int)
    p.add_argument("--log_every", default=10, type=int)
    args = p.parse_args(argv)

    from sndepth_tpu.data.kitti_sequence import batch_iterator
    from sndepth_tpu.data.raft3d_datasets import KITTISceneFlowDataset
    from sndepth_tpu.models.raft3d import RAFT3D
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.train import raft3d as rt

    h, w = args.img_height, args.img_width
    try:
        ds = KITTISceneFlowDataset(args.root,
                                   image_size=(h, w))
        if len(ds) == 0:
            raise FileNotFoundError
        batches = batch_iterator(ds, args.batch_size, shuffle=True,
                                 loop=True)
        max_steps = args.max_steps or 50_000
        print(f"training on {len(ds)} KITTI scene-flow pairs")
    except (FileNotFoundError, ValueError):
        batches = _synthetic_batches(args.batch_size, h, w)
        max_steps = args.max_steps or 100
        print("no dataset found; training on synthetic stream")

    model = RAFT3D(corr_levels=args.corr_levels, dtype=jnp.bfloat16)
    state = rt.create_train_state(jax.random.PRNGKey(0), model,
                                  (args.batch_size, h, w))
    step = rt.make_train_step(model, iters=args.iters)
    metrics = {}
    for i in range(max_steps):
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        state, metrics = step(state, batch)
        if (i + 1) % args.log_every == 0 or i + 1 == max_steps:
            m = jax.device_get(metrics)
            print(f"step {i + 1}/{max_steps} loss={float(m['loss']):.4f} "
                  f"epe2d={float(m['epe2d']):.3f}", flush=True)
    ckpt_lib.save_checkpoint(args.ckpt_dir, state, int(state.step))
    print(f"checkpoint -> {args.ckpt_dir}/{int(state.step)}")


if __name__ == "__main__":
    main()
