"""Whole-step floor ledger for the GeoNet flagship step (VERDICT r4 #2).

Applies the chain-diff isolation method (tools/wgrad_bench.py) to every
block of the canonical batch-128 train step, so "how much of the step is
real work vs recoverable" is measured rather than inferred from trace
rows (which attribute DMA waits to consumers — metrology trap 3):

  full         the production jitted train step (bench.py's unit)
  nets_fwd     DispNetS + PoseNet forward
  nets_fwdbwd  forward + d/d params of a weighted output sum
  tail_fwd     loss tail (pyramids, camera chain, photo+smooth) forward
  tail_fwdbwd  loss tail forward + d/d (depths, poses)
  adam         optimizer update alone on the real param tree

glue = full - nets_fwdbwd - tail_fwdbwd - adam: the scheduling/layout
residual that no isolated block accounts for.

Protocol: K=1 vs K=5 chained calls inside ONE jit (inputs perturbed per
iteration, forced by a scalar fetch); the difference removes the ~50 ms
tunnel dispatch floor. Inputs are built on device.

Usage: python tools/step_ledger.py [--batch 128] [--blocks a,b,...]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.train import geonet

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--blocks", default="full,nets_fwd,nets_fwdbwd,tail_fwd,"
                                    "tail_fwdbwd,adam")
ap.add_argument("--klong", type=int, default=5)
a = ap.parse_args()

cfg = GeoNetConfig(batch_size=a.batch, compute_dtype=jnp.bfloat16)
h, w, b, ns = cfg.img_height, cfg.img_width, a.batch, cfg.num_source
rng = np.random.RandomState(0)

batch_np = {
    "tgt": jnp.asarray(
        rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8)),
    "src": jnp.asarray(
        rng.randint(0, 256, (b, h, w, 6), dtype=np.uint8)),
    "intrinsics": jnp.asarray(np.tile(
        np.array([[[241.0, 0, 208.0], [0, 246.0, 64.0], [0, 0, 1]]],
                 np.float32), (b, 1, 1))),
}

state = geonet.create_train_state(cfg)
params = state.params
pre = geonet.preprocess_batch(batch_np)
pre = jax.tree_util.tree_map(jnp.asarray, pre)

# Fixed network outputs for the tail blocks (built once, on device).
_, depths0, poses0 = jax.jit(
    lambda p, bt: geonet.geonet_forward(p, bt, cfg))(params, pre)
depths0 = [jax.device_put(d) for d in depths0]


def chain(body, K):
    """Sum body(i) for K chained, input-perturbed iterations."""
    def run(*args):
        def f(c, j):
            return c + body(j, *args), None
        return jax.lax.scan(f, 0.0, jnp.arange(K, dtype=jnp.float32))[0]
    return jax.jit(run)


def measure(name, body, *args):
    fs = chain(body, 1)
    fl = chain(body, a.klong)
    float(fs(*args))
    float(fl(*args))
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        float(fs(*args))
        t1 = time.perf_counter()
        float(fl(*args))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (a.klong - 1)
        best = dt if best is None else min(best, dt)
    print(f"  {name:12s} {best*1e3:8.2f} ms", flush=True)
    return best


blocks = a.blocks.split(",")
res = {}

if "full" in blocks:
    step = geonet.make_train_step(cfg)
    # Own state: the step donates its argument, which would delete the
    # shared params the other blocks read.
    st = geonet.create_train_state(cfg)
    st, m = step(st, batch_np)
    _ = float(m["loss_total"])
    st, m = step(st, batch_np)
    _ = float(m["loss_total"])
    best = None
    for rep in range(3):
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = step(st, batch_np)
        _ = float(m["loss_total"])
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    res["full"] = best
    print(f"  {'full':12s} {best*1e3:8.2f} ms "
          f"({b * cfg.sequence_length / best:.0f} f/s)", flush=True)

if "nets_fwd" in blocks:
    def nets_fwd(j, params, pre):
        bt = dict(pre, tgt=pre["tgt"] + j * 1e-6)
        disp, _, poses = geonet.geonet_forward(params, bt, cfg)
        return (sum(jnp.sum(d.astype(jnp.float32)) for d in disp)
                + jnp.sum(poses.astype(jnp.float32)))
    res["nets_fwd"] = measure("nets_fwd", nets_fwd, params, pre)

if "nets_fwdbwd" in blocks:
    def nets_loss(params, bt):
        disp, _, poses = geonet.geonet_forward(params, bt, cfg)
        return (sum(jnp.sum(jnp.sin(d.astype(jnp.float32))) for d in disp)
                + jnp.sum(jnp.sin(poses.astype(jnp.float32))))

    def nets_fwdbwd(j, params, pre):
        bt = dict(pre, tgt=pre["tgt"] + j * 1e-6)
        g = jax.grad(nets_loss)(params, bt)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g))
    res["nets_fwdbwd"] = measure("nets_fwdbwd", nets_fwdbwd, params, pre)

if "tail_fwd" in blocks:
    def tail_fwd(j, params, pre, depths, poses):
        d2 = [d + j * 1e-7 for d in depths]
        total, _ = geonet.geonet_loss_tail(params, d2, poses, pre, cfg)
        return total
    res["tail_fwd"] = measure("tail_fwd", tail_fwd, params, pre,
                              depths0, poses0)

if "tail_fwdbwd" in blocks:
    def tail_loss(depths, poses, params, pre):
        total, _ = geonet.geonet_loss_tail(params, depths, poses, pre,
                                           cfg)
        return total

    def tail_fwdbwd(j, params, pre, depths, poses):
        d2 = [d + j * 1e-7 for d in depths]
        gd, gp = jax.grad(tail_loss, argnums=(0, 1))(d2, poses, params,
                                                     pre)
        return (sum(jnp.sum(x.astype(jnp.float32)) for x in gd)
                + jnp.sum(gp.astype(jnp.float32)))
    res["tail_fwdbwd"] = measure("tail_fwdbwd", tail_fwdbwd, params, pre,
                                 depths0, poses0)

if "adam" in blocks:
    tx = geonet.make_optimizer(cfg)
    opt_state = tx.init(params)
    gr = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    def adam(j, params, opt_state, gr):
        g2 = jax.tree_util.tree_map(lambda g: g + j * 1e-9, gr)
        import optax
        upd, _ = tx.update(g2, opt_state, params)
        newp = optax.apply_updates(params, upd)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(newp))
    res["adam"] = measure("adam", adam, params, opt_state, gr)

if all(k in res for k in ("full", "nets_fwdbwd", "tail_fwdbwd", "adam")):
    glue = res["full"] - res["nets_fwdbwd"] - res["tail_fwdbwd"] - res["adam"]
    print(f"  {'glue':12s} {glue*1e3:8.2f} ms  "
          f"(full - nets_fwdbwd - tail_fwdbwd - adam)", flush=True)
