"""CLI: GeoNet+NNET depth + AutoencoderKL RGBD latent encode.

Parity with `/root/reference/predict_vae.py:54-63`.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="GeoNet+NNET+VAE pipeline")
    p.add_argument("--out_dir", default="outputs/predict_vae")
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--max_batches", default=1, type=int)
    args = p.parse_args(argv)

    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.pipelines import GeoNetStage, NNETStage, VAEStage
    from sndepth_tpu.data.prefetch import synthetic_batches

    b, h, w = 1, args.img_height, args.img_width
    config = GeoNetConfig(batch_size=b, img_height=h, img_width=w,
                          compute_dtype=jnp.float32)
    geonet = GeoNetStage(config)
    nnet = NNETStage(sample_shape=(b, h, w))
    vae = VAEStage(sample_shape=(b, h, w))

    it = synthetic_batches(b, h, w)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.max_batches):
        batch = next(it)
        g = geonet(batch)
        refined = nnet(g["depth"], (g["tgt_norm"] + 1.0) * 0.5)
        rgb01 = (g["tgt_norm"] + 1.0) * 0.5
        mean, var = vae(rgb01, refined["depth"][..., 0])
        np.save(os.path.join(args.out_dir, f"latent_mean_{i}.npy"),
                np.asarray(mean))
        print(f"frame {i}: latent {mean.shape}", flush=True)


if __name__ == "__main__":
    main()
