"""Capture an XProf device trace for one model family and print per-op time.

Usage:  python tools/trace_family.py {geonet,flow,nnet,motion,vae,raft3d}
        [--batch N] [--img_height H] [--img_width W] [--iters K]
        [--trace_dir DIR] [--top N]

Builds the same workloads as ``sndepth_tpu.cli.benchmark``.  Protocol
(CLAUDE.md "Benchmark traps"): the remote runtime memoizes identical
(executable, inputs) executions and ``block_until_ready`` returns early, so
warmup and the traced region must be ONE chain of distinct steps in one
process — state threads through every call and a scalar fetch forces each
segment.  The traced region covers steps [warmup, warmup+iters) of that
chain; per-op totals are printed from the XPlane device line.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _build(fam, batch, h, w):
    """Return (carry, advance) where advance(carry, n) runs n distinct
    forced steps and returns the new carry."""
    import jax
    import jax.numpy as jnp

    if fam in ("geonet", "flow"):
        from sndepth_tpu.core.config import GeoNetConfig
        from sndepth_tpu.train import geonet

        cfg = GeoNetConfig(batch_size=batch, img_height=h, img_width=w,
                           compute_dtype=jnp.bfloat16,
                           train_flow=(fam == "flow"))
        rng = np.random.RandomState(0)
        data = {
            "tgt": jnp.asarray(
                rng.randint(0, 256, (batch, h, w, 3), np.uint8)),
            "src": jnp.asarray(
                rng.randint(0, 256, (batch, h, w, 6), np.uint8)),
            "intrinsics": jnp.asarray(np.tile(np.array(
                [[[w * 0.58, 0, w / 2], [0, h * 1.92, h / 2], [0, 0, 1]]],
                np.float32), (batch, 1, 1))),
        }
        state = geonet.create_train_state(cfg)
        step = geonet.make_train_step(cfg)

        def advance(state, n):
            for _ in range(n):
                state, m = step(state, data)
            assert np.isfinite(float(m["loss_total"]))
            return state
        advance.lower1 = lambda: jax.jit(step).lower(state, data)
        return state, advance

    if fam == "nnet":
        from sndepth_tpu.train import nnet as tn
        rng = np.random.RandomState(0)
        data = {"rgb": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
                "normals": jnp.asarray(
                    rng.rand(batch, h, w, 3), jnp.float32) * 2 - 1,
                "mask": jnp.ones((batch, h, w), jnp.bool_)}
        state = tn.create_train_state(jax.random.PRNGKey(0))
        step = tn.make_train_step(dtype=jnp.bfloat16)

        def advance(state, n):
            for _ in range(n):
                state, m = step(state, data)
            assert np.isfinite(float(m["loss"]))
            return state
        advance.lower1 = lambda: jax.jit(step).lower(state, data)
        return state, advance

    if fam == "motion":
        from sndepth_tpu.train import motion
        rng = np.random.RandomState(0)
        data = {"image": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
                "flow": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
                "label": jnp.asarray(rng.randint(0, 3, (batch, h, w)),
                                     jnp.int32)}
        state = motion.init_motion_state(jax.random.PRNGKey(0), h, w,
                                         dtype=jnp.bfloat16)
        step = motion.make_train_step(dtype=jnp.bfloat16)

        def advance(state, n):
            for _ in range(n):
                state, m = step(state, data)
            assert np.isfinite(float(m["loss"]))
            return state
        advance.lower1 = lambda: jax.jit(step).lower(state, data)
        return state, advance

    if fam == "vae":
        from sndepth_tpu.models.vae import AutoencoderKL
        model = AutoencoderKL()
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.rand(batch, h, w, 4), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                        jax.random.PRNGKey(1))

        @jax.jit
        def run(x):
            recon, post = model.apply(variables, x, jax.random.PRNGKey(1))
            return recon[..., :4], jnp.sum(post.mean)

        def advance(x, n):
            for _ in range(n):
                x, s = run(x)
            assert np.isfinite(float(s))
            return x
        advance.lower1 = lambda: run.lower(x0)
        return x0, advance

    if fam == "raft3d_train":
        from sndepth_tpu.models.raft3d import RAFT3D
        from sndepth_tpu.train import raft3d as tr

        model = RAFT3D()
        rng = np.random.RandomState(0)
        b = max(batch, 1)
        state = tr.create_train_state(jax.random.PRNGKey(0), model,
                                      (b, h, w))
        step = tr.make_train_step(model, iters=12)
        data = {
            "image1": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
            "image2": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
            "depth1": jnp.asarray(2 + rng.rand(b, h, w), jnp.float32),
            "depth2": jnp.asarray(2 + rng.rand(b, h, w), jnp.float32),
            "intrinsics": jnp.asarray(
                np.tile([[w * 0.58, h * 1.92, w / 2, h / 2]], (b, 1)),
                jnp.float32),
            "flow": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
            "valid": jnp.ones((b, h, w), jnp.float32),
        }

        def advance(state, n):
            for _ in range(n):
                state, m = step(state, data)
            assert np.isfinite(float(m["loss"]))
            return state
        advance.lower1 = lambda: step.lower(state, data)
        return state, advance

    if fam == "raft3d":
        from sndepth_tpu.pipelines import RAFT3DStage
        stage = RAFT3DStage(iters=16, sample_shape=(1, h, w))
        rng = np.random.RandomState(0)
        img1 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
        d = jnp.asarray(2 + rng.rand(1, h, w), jnp.float32)
        k = jnp.asarray([[w * 0.58, h * 1.92, w / 2, h / 2]])

        def advance(cur, n):
            for _ in range(n):
                Ts, tp = stage(img1, cur, d, d, k)
                cur = img1 + tp[..., :3] * 0.001
            assert np.isfinite(float(tp.sum()))
            return cur
        x0 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
        return x0, advance

    raise ValueError(fam)


def _grouped(rows, top, denom_steps):
    total = sum(us for _, us, _ in rows)
    print(f"-- device total: {total / 1e3:.1f} ms over {denom_steps} steps"
          f" = {total / 1e3 / denom_steps:.1f} ms/step --")
    for name, us, cnt in rows[:top]:
        print(f"{us / 1e3:9.2f} ms  x{cnt:<4d} {name[:110]}")
    groups = {}
    for name, us, _ in rows:
        n = name.lower()
        if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
            key = "pallas"
        elif "conv" in n or "dot" in n or "einsum" in n:
            key = "conv/dot"
        elif "scatter" in n:
            key = "scatter"
        elif "gather" in n or "take" in n:
            key = "gather"
        elif "sort" in n or "top-k" in n or "topk" in n:
            key = "sort"
        elif "reduce-window" in n:
            key = "reduce-window"
        elif "all-reduce" in n or "collective" in n:
            key = "collective"
        elif "copy" in n or "transpose" in n or "reshape" in n \
                or "bitcast" in n:
            key = "data-movement"
        elif "fusion" in n:
            key = "fusion(elementwise)"
        else:
            key = "other"
        groups[key] = groups.get(key, 0.0) + us
    print("-- grouped --")
    for k, us in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{us / 1e3:9.2f} ms  {k}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("family", choices=["geonet", "flow", "nnet", "motion",
                                      "raft3d_train",
                                      "vae", "raft3d"])
    p.add_argument("--batch", default=0, type=int)
    p.add_argument("--img_height", default=0, type=int)
    p.add_argument("--img_width", default=0, type=int)
    p.add_argument("--iters", default=3, type=int)
    p.add_argument("--warmup", default=2, type=int)
    p.add_argument("--trace_dir", default="")
    p.add_argument("--top", default=40, type=int)
    args = p.parse_args(argv)

    from sndepth_tpu.utils.profiling import capture_trace
    from sndepth_tpu.utils.xplane import summarize_trace

    defaults = {"geonet": (128, 128, 416), "flow": (32, 128, 416),
                "nnet": (4, 480, 640), "motion": (16, 384, 768),
                "vae": (8, 128, 416), "raft3d": (1, 128, 416),
                "raft3d_train": (2, 128, 416)}
    db, dh, dw = defaults[args.family]
    batch = args.batch or db
    h = args.img_height or dh
    w = args.img_width or dw

    carry, advance = _build(args.family, batch, h, w)
    carry = advance(carry, args.warmup)      # compile + real warm execution
    t0 = time.perf_counter()
    carry = advance(carry, args.iters)       # honest pre-trace timing
    dt = (time.perf_counter() - t0) / args.iters
    print(f"[timing] {dt * 1e3:.1f} ms/step pre-trace", file=sys.stderr)

    tdir = args.trace_dir or tempfile.mkdtemp(prefix=f"trace_{args.family}_")
    with capture_trace(tdir):
        carry = advance(carry, args.iters)
    print(f"[trace] {tdir}", file=sys.stderr)
    rows = summarize_trace(tdir)
    _grouped(rows, args.top, args.iters)


if __name__ == "__main__":
    main()
