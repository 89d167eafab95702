"""CLI: VAE smoke test (reference `testvae.py:162-166` parity).

Encodes a random 4-channel 128x416 RGBD batch with an uninitialized-weights
AutoencoderKL and prints the posterior moment shapes.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="AutoencoderKL smoke test")
    p.add_argument("--batch", default=4, type=int)
    p.add_argument("--height", default=128, type=int)
    p.add_argument("--width", default=416, type=int)
    args = p.parse_args(argv)

    from sndepth_tpu.models.vae import get_autoencoder

    model = get_autoencoder(dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch, 4, args.height, args.width))
    x = jnp.transpose(x, (0, 2, 3, 1))   # reference uses NCHW random input

    variables = model.init(jax.random.PRNGKey(1), x,
                           rng=jax.random.PRNGKey(2))

    @jax.jit
    def encode(v, x):
        posterior = model.apply(v, x, method=model.encode)
        return posterior.mean, posterior.var

    mean, var = encode(variables, x)
    print("posterior mean:", mean.shape)
    print("posterior var:", var.shape)


if __name__ == "__main__":
    main()
