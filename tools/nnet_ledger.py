"""Isolated-floor ledger for the NNET normal-train step (VERDICT r4 #6).

Chain-diff isolation (tools/step_ledger.py method) of the batch-8
480x640 bf16 train step's blocks:

  full     the production jitted step (trace_family nnet unit)
  enc_fwd / enc_fwdbwd   EfficientNet-B5 encoder (train-mode BN)
  dec_fwd / dec_fwdbwd   NormalDecoder train path (sampled MLPs)
  adamw    optimizer update alone

glue = full - enc_fwdbwd - dec_fwdbwd - adamw.

Usage: python tools/nnet_ledger.py [--batch 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.models.efficientnet import EfficientNetEncoder
from sndepth_tpu.models.normal_decoder import NormalDecoder
from sndepth_tpu.models.nnet import bgr_preprocess
from sndepth_tpu.train import nnet as tn

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=8)
ap.add_argument("--klong", type=int, default=4)
a = ap.parse_args()
b, h, w = a.batch, 480, 640
dtype = jnp.bfloat16

state = tn.create_train_state(jax.random.PRNGKey(0), dtype=dtype)
params, stats = state.params, state.batch_stats

enc = EfficientNetEncoder(dtype=dtype)
dec = NormalDecoder(sampling_ratio=0.4, importance_ratio=0.7,
                    architecture="GN", dense_refine=True, dtype=dtype)
enc_key = [k for k in params if k.startswith("EfficientNetEncoder")][0]
dec_key = [k for k in params if k.startswith("NormalDecoder")][0]


@jax.jit
def make_batch(key):
    ks = jax.random.split(key, 3)
    return {
        "rgb": jax.random.uniform(ks[0], (b, h, w, 3)),
        "normals": jax.random.normal(ks[1], (b, h, w, 3)),
        "mask": (jax.random.uniform(ks[2], (b, h, w)) > 0.1
                 ).astype(jnp.float32),
    }


batch = make_batch(jax.random.PRNGKey(1))

feats0 = jax.jit(lambda p, s, rgb: enc.apply(
    {"params": p, "batch_stats": s},
    bgr_preprocess(rgb) / 255.0, train=True,
    mutable=["batch_stats"])[0])(params[enc_key], stats.get(enc_key, {}),
                                 batch["rgb"])


def chain(body, K):
    def run(*args):
        def f(c, j):
            return c + body(j, *args), None
        return jax.lax.scan(f, 0.0, jnp.arange(K, dtype=jnp.float32))[0]
    return jax.jit(run)


def measure(name, body, *args):
    fs, fl = chain(body, 1), chain(body, a.klong)
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


res = {}

# full production step
step = tn.make_train_step(dtype=dtype)
st = tn.create_train_state(jax.random.PRNGKey(2), dtype=dtype)
st, m = step(st, batch)
_ = float(m["loss"])
st, m = step(st, batch)
_ = float(m["loss"])
best = None
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(4):
        st, m = step(st, make_batch(jax.random.PRNGKey(10 + rep * 4 + i)))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 4
    best = dt if best is None else min(best, dt)
res["full"] = best
print(f"  {'full':12s} {best*1e3:8.2f} ms ({b / best:.1f} img/s)",
      flush=True)


def enc_apply(p, rgb):
    feats, _ = enc.apply({"params": p, "batch_stats": stats.get(enc_key, {})},
                         bgr_preprocess(rgb) / 255.0, train=True,
                         mutable=["batch_stats"])
    return feats


def enc_fwd(j, p, rgb):
    feats = enc_apply(p, rgb + j * 1e-6)
    return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values())
res["enc_fwd"] = measure("enc_fwd", enc_fwd, params[enc_key], batch["rgb"])


def enc_loss(p, rgb):
    feats = enc_apply(p, rgb)
    return sum(jnp.sum(jnp.sin(f.astype(jnp.float32)))
               for f in feats.values())


def enc_fwdbwd(j, p, rgb):
    g = jax.grad(enc_loss)(p, rgb + j * 1e-6)
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(g))
res["enc_fwdbwd"] = measure("enc_fwdbwd", enc_fwdbwd, params[enc_key],
                            batch["rgb"])


def dec_apply(p, feats, key):
    return dec.apply({"params": p}, feats,
                     gt_norm_mask=batch["mask"][..., None], mode="train",
                     rng=key, train_norm=True)


def dec_fwd(j, p, feats):
    f2 = {k: v + j * 1e-6 for k, v in feats.items()}
    outs, sampled, idx = dec_apply(p, f2, jax.random.PRNGKey(3))
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
res["dec_fwd"] = measure("dec_fwd", dec_fwd, params[dec_key], feats0)


def dec_loss(p, feats):
    outs, sampled, idx = dec_apply(p, feats, jax.random.PRNGKey(3))
    from sndepth_tpu.losses.normal_loss import decoder_multi_scale_loss
    return decoder_multi_scale_loss(outs, sampled, idx, batch["normals"],
                                    batch["mask"])


def dec_fwdbwd(j, p, feats):
    f2 = {k: v + j * 1e-6 for k, v in feats.items()}
    g = jax.grad(dec_loss)(p, f2)
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(g))
res["dec_fwdbwd"] = measure("dec_fwdbwd", dec_fwdbwd, params[dec_key],
                            feats0)

tx = tn.make_optimizer()
opt_state = tx.init(params)
gr = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)


def adamw(j, params, opt_state, gr):
    import optax
    g2 = jax.tree_util.tree_map(lambda g: g + j * 1e-9, gr)
    upd, _ = tx.update(g2, opt_state, params)
    newp = optax.apply_updates(params, upd)
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(newp))
res["adamw"] = measure("adamw", adamw, params, opt_state, gr)

glue = res["full"] - res["enc_fwdbwd"] - res["dec_fwdbwd"] - res["adamw"]
print(f"  {'glue':12s} {glue*1e3:8.2f} ms  "
      f"(full - enc_fwdbwd - dec_fwdbwd - adamw)", flush=True)
