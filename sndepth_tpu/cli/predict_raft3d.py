"""CLI: GeoNet+NNET depth, then frame-pair RAFT3D scene flow.

Parity with `/root/reference/predict_raft3d.py:36-58`.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="GeoNet+NNET+RAFT3D pipeline")
    p.add_argument("--root", default="data/raft_datasets")
    p.add_argument("--out_dir", default="outputs/predict_raft3d")
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--iters", default=16, type=int)
    p.add_argument("--max_batches", default=1, type=int)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="RAFT3D encoder/GRU compute dtype (corr/GN/SE3 "
                        "stay f32)")
    args = p.parse_args(argv)

    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.pipelines import GeoNetStage, NNETStage, RAFT3DStage
    from sndepth_tpu.utils.visualize import save_image
    from sndepth_tpu.data.prefetch import synthetic_batches

    b, h, w = 1, args.img_height, args.img_width
    config = GeoNetConfig(batch_size=b, img_height=h, img_width=w,
                          compute_dtype=jnp.float32)
    geonet = GeoNetStage(config)
    nnet = NNETStage(sample_shape=(b, h, w))
    raft3d = RAFT3DStage(iters=args.iters, sample_shape=(b, h, w),
                         dtype=jnp.bfloat16 if args.dtype == "bf16"
                         else jnp.float32)

    it = synthetic_batches(b, h, w)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.max_batches):
        batch = next(it)
        g = geonet(batch)
        refined = nnet(g["depth"], (g["tgt_norm"] + 1.0) * 0.5)
        depth1 = jnp.clip(refined["depth"][..., 0], 0.1, 80.0)
        # consecutive frame = first source view
        img1 = (g["tgt_norm"] + 1.0) * 0.5
        img2 = (g["src_norm"][..., :3] + 1.0) * 0.5
        k = jnp.asarray([[w * 0.58, h * 1.92, w / 2.0, h / 2.0]])
        Ts, tau_phi = raft3d(img1, img2, depth1, depth1, k)
        save_image(f"{args.out_dir}/tau_{i}.png",
                   np.asarray(tau_phi[0, ..., :3]))
        save_image(f"{args.out_dir}/phi_{i}.png",
                   np.asarray(tau_phi[0, ..., 3:]))
        save_image(f"{args.out_dir}/depth_{i}.png", np.asarray(depth1[0]))
        print(f"frame {i}: Ts field {Ts.shape}, tau/phi saved", flush=True)


if __name__ == "__main__":
    main()
