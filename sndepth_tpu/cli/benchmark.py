"""CLI: per-family throughput benchmarks (honest forced-execution protocol).

One JSON line per family. Protocol notes (BASELINE.md): on the remote-TPU
runtime ``block_until_ready`` returns early and identical (executable,
inputs) pairs are memoized, so every timed loop chains *distinct* work
through a donated/updated state and is forced by fetching a final scalar.

Families:
  geonet   — flagship self-supervised train step (DispNetS+PoseNet+loss)
  flow     — stage-2 full-flow train step (FlowNet + geometric consistency)
  nnet     — normal-net train step (EfficientNet-B5 + decoder)
  motion   — MotionFusionNet train step
  vae      — AutoencoderKL encode+decode
  raft3d   — RAFT3D inference (16 GN iterations)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _result(family: str, ms: float, value: float, unit: str) -> None:
    print(json.dumps({"family": family, "ms_per_step": round(ms, 1),
                      "value": round(value, 1), "unit": unit}), flush=True)


def _geonet_like(train_flow: bool, batch: int, h: int, w: int, iters: int):
    import jax.numpy as jnp

    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.train import geonet

    cfg = GeoNetConfig(batch_size=batch, img_height=h, img_width=w,
                       compute_dtype=jnp.bfloat16, train_flow=train_flow)
    rng = np.random.RandomState(0)
    data = {
        "tgt": jnp.asarray(rng.randint(0, 256, (batch, h, w, 3), np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (batch, h, w, 6), np.uint8)),
        "intrinsics": jnp.asarray(np.tile(np.array(
            [[[w * 0.58, 0, w / 2], [0, h * 1.92, h / 2], [0, 0, 1]]],
            np.float32), (batch, 1, 1))),
    }
    state = geonet.create_train_state(cfg)
    step = geonet.make_train_step(cfg)
    state, m = step(state, data)
    _ = float(m["loss_total"])
    state, m = step(state, data)
    _ = float(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data)
    _ = float(m["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    fam = "flow" if train_flow else "geonet"
    _result(fam, dt * 1e3, batch * 3 / dt, "frames/sec")


def _nnet(batch: int, h: int, w: int, iters: int):
    import jax
    import jax.numpy as jnp

    from sndepth_tpu.train import nnet as tn

    rng = np.random.RandomState(0)
    data = {"rgb": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
            "normals": jnp.asarray(
                rng.rand(batch, h, w, 3), jnp.float32) * 2 - 1,
            "mask": jnp.ones((batch, h, w), jnp.bool_)}
    state = tn.create_train_state(jax.random.PRNGKey(0))
    step = tn.make_train_step(dtype=jnp.bfloat16)
    state, m = step(state, data)
    _ = float(m["loss"])
    state, m = step(state, data)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    _result("nnet", dt * 1e3, batch / dt, "img/sec")


def _motion(batch: int, h: int, w: int, iters: int):
    import jax
    import jax.numpy as jnp

    from sndepth_tpu.train import motion

    rng = np.random.RandomState(0)
    data = {"image": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
            "flow": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
            "label": jnp.asarray(rng.randint(0, 3, (batch, h, w)),
                                 jnp.int32)}
    state = motion.init_motion_state(jax.random.PRNGKey(0), h, w,
                                     dtype=jnp.bfloat16)
    step = motion.make_train_step(dtype=jnp.bfloat16)
    state, m = step(state, data)
    _ = float(m["loss"])
    state, m = step(state, data)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    _result("motion", dt * 1e3, batch / dt, "img/sec")


def _vae(batch: int, h: int, w: int, iters: int):
    import jax
    import jax.numpy as jnp

    from sndepth_tpu.models.vae import AutoencoderKL

    model = AutoencoderKL()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(batch, h, w, 4), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                    jax.random.PRNGKey(1))

    @jax.jit
    def run(v, x):
        recon, post = model.apply(v, x, jax.random.PRNGKey(1))
        # feed reconstruction back so every iteration is distinct work
        return recon[..., :4], jnp.sum(post.mean)

    x, s = run(variables, x0)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, s = run(variables, x)
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters
    _result("vae", dt * 1e3, batch / dt, "img/sec")


def _raft3d(h: int, w: int, iters: int):
    import jax
    import jax.numpy as jnp

    from sndepth_tpu.pipelines import RAFT3DStage

    stage = RAFT3DStage(iters=16, sample_shape=(1, h, w))
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    d = jnp.asarray(2 + rng.rand(1, h, w), jnp.float32)
    k = jnp.asarray([[w * 0.58, h * 1.92, w / 2, h / 2]])
    Ts, tp = stage(img1, img2, d, d, k)
    _ = float(tp.sum())
    t0 = time.perf_counter()
    cur = img2
    for _ in range(iters):
        Ts, tp = stage(img1, cur, d, d, k)
        cur = img1 + tp[..., :3] * 0.001   # distinct work each iteration
    _ = float(tp.sum())
    dt = (time.perf_counter() - t0) / iters
    _result("raft3d", dt * 1e3, 1.0 / dt, "frames/sec")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Family benchmarks")
    p.add_argument("--family", default="all",
                   choices=["all", "geonet", "flow", "nnet", "motion",
                            "vae", "raft3d"])
    p.add_argument("--iters", default=10, type=int)
    p.add_argument("--batch", default=0, type=int,
                   help="override the family's default batch")
    p.add_argument("--img_height", default=0, type=int)
    p.add_argument("--img_width", default=0, type=int)
    args = p.parse_args(argv)

    def dims(dh, dw):
        return args.img_height or dh, args.img_width or dw

    fam = args.family
    if fam in ("all", "geonet"):
        h, w = dims(128, 416)
        _geonet_like(False, args.batch or 128, h, w, args.iters)
    if fam in ("all", "flow"):
        h, w = dims(128, 416)
        _geonet_like(True, args.batch or 32, h, w, args.iters)
    if fam in ("all", "nnet"):
        h, w = dims(480, 640)
        _nnet(args.batch or 4, h, w, args.iters)
    if fam in ("all", "motion"):
        h, w = dims(384, 768)
        _motion(args.batch or 16, h, w, args.iters)
    if fam in ("all", "vae"):
        h, w = dims(128, 416)
        _vae(args.batch or 8, h, w, args.iters)
    if fam in ("all", "raft3d"):
        h, w = dims(128, 416)
        _raft3d(h, w, args.iters)


if __name__ == "__main__":
    main()
