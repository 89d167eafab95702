"""CLI: full perception pipeline — GeoNet+NNET + VAE + UniAD track + DINO
features + pose Denoiser.

Parity with `/root/reference/predict_vae_uniad.py:24-86` (small default
track model; the full 200x200-BEV config is constructable via
``UniADTrack()`` defaults).
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="GeoNet+VAE+UniAD pipeline")
    p.add_argument("--out_dir", default="outputs/predict_vae_uniad")
    p.add_argument("--img_height", default=64, type=int)
    p.add_argument("--img_width", default=64, type=int)
    p.add_argument("--frames", default=2, type=int)
    args = p.parse_args(argv)

    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.pipelines import (GeoNetStage, NNETStage, TrackStage,
                                       VAEStage)
    from sndepth_tpu.data.prefetch import synthetic_batches

    b, h, w = 1, args.img_height, args.img_width
    config = GeoNetConfig(batch_size=b, img_height=h, img_width=w,
                          compute_dtype=jnp.float32)
    geonet = GeoNetStage(config)
    nnet = NNETStage(sample_shape=(b, h, w))
    vae = VAEStage(sample_shape=(b, h, w))
    track = TrackStage(num_cams=1, image_hw=(h, w))

    it = synthetic_batches(b, h, w)
    os.makedirs(args.out_dir, exist_ok=True)
    state = track.init_state()
    l2i = jnp.tile(jnp.eye(4)[None, None], (1, 1, 1, 1))
    for t in range(args.frames):
        batch = next(it)
        g = geonet(batch)
        refined = nnet(g["depth"], (g["tgt_norm"] + 1.0) * 0.5)
        rgb01 = (g["tgt_norm"] + 1.0) * 0.5
        mean, _ = vae(rgb01, refined["depth"][..., 0])
        state, results, poses = track(rgb01[None], l2i, state, rgb01)
        n_active = int(np.sum(np.asarray(state.tracks.obj_idxes) >= 0))
        print(f"frame {t}: latent {mean.shape}, "
              f"{n_active} active tracks, denoised poses {poses.shape}",
              flush=True)
        np.save(os.path.join(args.out_dir, f"track_boxes_{t}.npy"),
                np.asarray(results["bboxes"]))
    print("done")


if __name__ == "__main__":
    main()
