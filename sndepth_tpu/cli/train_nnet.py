"""CLI: surface-normal network training (NYUv2-format data or synthetic).

The reference consumes pretrained normal weights; this trains the
encoder+decoder stack with the uncertainty-weighted angular NLL
(`sndepth_tpu/train/nnet.py`).
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
        n = rng.randn(b, h, w, 3).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-8
        yield {"rgb": rng.rand(b, h, w, 3).astype(np.float32),
               "normals": n,
               "mask": np.ones((b, h, w), bool)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="normal-net training")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--ckpt_dir", default="checkpoints/nnet")
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--max_steps", default=0, type=int)
    p.add_argument("--log_every", default=10, type=int)
    args = p.parse_args(argv)

    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.train import nnet as nt

    h, w = args.img_height, args.img_width
    if args.data_dir and os.path.isdir(args.data_dir):
        from sndepth_tpu.data.nyu import NYUv2Dataset
        from sndepth_tpu.data.kitti_sequence import batch_iterator
        ds = NYUv2Dataset(args.data_dir, args.split, h, w)

        def to_batch(raw):
            return {"rgb": raw["rgb"], "normals": raw["normals"],
                    "mask": raw["mask"]}

        base = batch_iterator(ds, args.batch_size, shuffle=True, loop=True)
        batches = (b for b in base)
        max_steps = args.max_steps or 10_000
        print(f"training on {len(ds)} NYUv2 samples")
    else:
        batches = _synthetic_batches(args.batch_size, h, w)
        max_steps = args.max_steps or 100
        print("no dataset found; training on synthetic stream")

    state = nt.create_train_state(jax.random.PRNGKey(0),
                                  (args.batch_size, h, w))
    step = nt.make_train_step()
    for i in range(max_steps):
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        state, metrics = step(state, batch)
        if (i + 1) % args.log_every == 0 or i + 1 == max_steps:
            print(f"step {i + 1}/{max_steps} "
                  f"loss={float(jax.device_get(metrics)['loss']):.4f}",
                  flush=True)
    ckpt_lib.save_checkpoint(args.ckpt_dir, state, int(state.step))
    print(f"checkpoint -> {args.ckpt_dir}/{int(state.step)}")


if __name__ == "__main__":
    main()
