"""CLI: export an inference model as a serving artifact (StableHLO +
params + meta; see sndepth_tpu/serving/export.py).

No reference counterpart — the reference serves from pickled
state_dicts + source; this produces a self-contained artifact a server
loads without model code. Export for TPU from any host with
``--platform tpu``.
"""

from __future__ import annotations

import argparse
import functools


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Export a serving artifact")
    p.add_argument("--model", choices=["dispnet", "nnet", "raft3d"],
                   default="dispnet")
    p.add_argument("--iters", default=16, type=int,
                   help="RAFT3D refinement iterations (raft3d export)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--batch", default=1, type=int)
    p.add_argument("--platform", default=None,
                   help="lowering target, e.g. 'tpu' (default: this host)")
    p.add_argument("--ckpt_dir", default=None,
                   help="restore params from a training checkpoint dir "
                        "(cli/train_geonet for dispnet, cli/train_nnet "
                        "for nnet; default: fresh init)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from sndepth_tpu.serving import export as sx

    b, h, w = args.batch, args.img_height, args.img_width
    platforms = [args.platform] if args.platform else None

    if args.model == "dispnet":
        from sndepth_tpu.models.dispnet import DispNetS
        net = DispNetS(dtype=jnp.bfloat16)
        x = jnp.zeros((b, h, w, 3), jnp.float32)
        variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)

        def forward(params, img):
            return net.apply(params, img)[0]   # finest disparity
    elif args.model == "raft3d":
        from sndepth_tpu.models.raft3d import RAFT3D
        net = RAFT3D()
        img = jnp.zeros((b, h, w, 3), jnp.float32)
        d = jnp.ones((b, h, w), jnp.float32)
        kvec = jnp.ones((b, 4), jnp.float32)
        variables = jax.jit(functools.partial(net.init, iters=1))(
            jax.random.PRNGKey(0), img, img, d, d, kvec)
        inputs = [img, img, d, d, kvec]

        def forward(params, i1, i2, d1, d2, k):
            return net.apply(params, i1, i2, d1, d2, k, iters=args.iters)

        if args.ckpt_dir:
            from sndepth_tpu.train import checkpoint as ckpt_lib
            from sndepth_tpu.train.raft3d import create_train_state as rts
            state = ckpt_lib.restore_checkpoint(
                args.ckpt_dir, rts(jax.random.PRNGKey(0), net))
            variables = {"params": jax.tree_util.tree_map(
                jnp.asarray, state["params"] if isinstance(state, dict)
                else state.params)}
        out = sx.save_artifact(args.out_dir, forward, variables, inputs,
                               platforms=platforms)
        print(f"exported raft3d ({b}x{h}x{w}, {args.iters} iters) -> {out}")
        return
    else:
        from sndepth_tpu.train.nnet import NormalNet
        net = NormalNet(dtype=jnp.bfloat16)
        x = jnp.zeros((b, h, w, 3), jnp.float32)
        variables = jax.jit(
            lambda r, xx: net.init(r, xx, mode="test"))(
                jax.random.PRNGKey(0), x)

        def forward(params, img):
            return net.apply(params, img, mode="test")[0][-1]

    if args.ckpt_dir:
        # Checkpoints hold full train states (params + opt + step + rng);
        # restore into the matching state template and take the params.
        from sndepth_tpu.train import checkpoint as ckpt_lib
        if args.model == "dispnet":
            from sndepth_tpu.core.config import GeoNetConfig
            from sndepth_tpu.train.geonet import create_train_state
            cfg = GeoNetConfig(img_height=h, img_width=w)
            state = ckpt_lib.restore_checkpoint(args.ckpt_dir,
                                                create_train_state(cfg))
            params = (state["params"] if isinstance(state, dict)
                      else state.params)
            variables = {"params": jax.tree_util.tree_map(
                jnp.asarray, params["disp"])}
        else:
            from sndepth_tpu.train.nnet import create_train_state as cts
            state = ckpt_lib.restore_checkpoint(
                args.ckpt_dir, cts(jax.random.PRNGKey(0)))
            params = (state["params"] if isinstance(state, dict)
                      else state.params)
            variables = {"params": jax.tree_util.tree_map(
                jnp.asarray, params),
                "batch_stats": jax.tree_util.tree_map(
                    jnp.asarray, state["batch_stats"]
                    if isinstance(state, dict) else state.batch_stats)}

    out = sx.save_artifact(args.out_dir, forward, variables, [x],
                           platforms=platforms)
    print(f"exported {args.model} ({b}x{h}x{w}) -> {out}")


if __name__ == "__main__":
    main()
