"""CLI: RAFT3D demo on an image pair — displays/saves tau/phi fields.

Parity with `/root/reference/demo.py:52-92`; accepts two images + two depth
maps (png/pfm) or generates a synthetic pair.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="RAFT3D demo")
    p.add_argument("--image1", default=None)
    p.add_argument("--image2", default=None)
    p.add_argument("--depth1", default=None)
    p.add_argument("--depth2", default=None)
    p.add_argument("--iters", default=16, type=int)
    p.add_argument("--out", default="demo_output_raft3d.png")
    args = p.parse_args(argv)

    from sndepth_tpu.pipelines import RAFT3DStage
    from sndepth_tpu.utils.visualize import normalize01
    from sndepth_tpu.data.frame_codecs import read_gen

    if args.image1 and args.image2:
        img1 = np.asarray(read_gen(args.image1), np.float32) / 255.0
        img2 = np.asarray(read_gen(args.image2), np.float32) / 255.0
        d1 = (np.asarray(read_gen(args.depth1), np.float32)
              if args.depth1 else np.full(img1.shape[:2], 4.0, np.float32))
        d2 = (np.asarray(read_gen(args.depth2), np.float32)
              if args.depth2 else d1)
        # pad to /8
        h, w = img1.shape[:2]
        ph, pw = -h % 8, -w % 8
        img1 = np.pad(img1, ((0, ph), (0, pw), (0, 0)), mode="edge")
        img2 = np.pad(img2, ((0, ph), (0, pw), (0, 0)), mode="edge")
        d1 = np.pad(d1, ((0, ph), (0, pw)), mode="edge")
        d2 = np.pad(d2, ((0, ph), (0, pw)), mode="edge")
    else:
        rng = np.random.RandomState(0)
        img1 = rng.rand(64, 96, 3).astype(np.float32)
        img2 = np.roll(img1, 3, axis=1)
        d1 = np.full((64, 96), 4.0, np.float32)
        d2 = d1

    hh, ww = img1.shape[:2]
    k = jnp.asarray([[ww * 0.6, ww * 0.6, ww / 2.0, hh / 2.0]])
    stage = RAFT3DStage(iters=args.iters, sample_shape=(1, hh, ww))
    Ts, tau_phi = stage(jnp.asarray(img1)[None], jnp.asarray(img2)[None],
                        jnp.asarray(d1)[None], jnp.asarray(d2)[None], k)
    tau = normalize01(np.asarray(tau_phi[0, ..., :3]))
    phi = normalize01(np.asarray(tau_phi[0, ..., 3:]))
    panel = np.concatenate([tau, phi], axis=1)
    from PIL import Image
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    Image.fromarray((panel * 255).astype(np.uint8)).save(args.out)
    print(f"saved {args.out}; tau range "
          f"[{float(tau_phi[..., :3].min()):.4f}, "
          f"{float(tau_phi[..., :3].max()):.4f}]")


if __name__ == "__main__":
    main()
