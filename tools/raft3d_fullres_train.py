"""Full-resolution RAFT3D TRAIN step probe (VERDICT r4 #5 closure).

The r4 Pallas gn_build kernel was forward-only: full-res (376x1248,
1/8-res GN field = 47x156 = 7332 pixels > the 2048 hybrid threshold)
training would re-derive the backward through the XLA accumulate —
the exact ~540 MB-Jacobian / 0.2%-MXU path the kernel was built to
kill. r5 gave the kernel a real fused backward (SNDEPTH_GN_BWD=pallas,
default); this probe measures a full-res train step under each.

Usage: python tools/raft3d_fullres_train.py [--iters 12] [--steps 3]
       [--img 376 1248] [--bwd pallas|xla]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=12)
ap.add_argument("--steps", type=int, default=3)
ap.add_argument("--img", type=int, nargs=2, default=(376, 1248))
ap.add_argument("--bwd", default="")
a = ap.parse_args()
if a.bwd:
    os.environ["SNDEPTH_GN_BWD"] = a.bwd

import jax
import jax.numpy as jnp

from sndepth_tpu.models.raft3d import RAFT3D
from sndepth_tpu.train import raft3d as tr

H, W = a.img
model = RAFT3D(remat_iters=True)
print(f"[raft3d-fullres-train] {H}x{W}, iters={a.iters}, "
      f"bwd={os.environ.get('SNDEPTH_GN_BWD', 'pallas')}", flush=True)

t0 = time.time()
state = tr.create_train_state(jax.random.PRNGKey(0), model)
step = tr.make_train_step(model, iters=a.iters)
print(f"  init done in {time.time()-t0:.1f}s", flush=True)


@jax.jit
def make_batch(key):
    ks = jax.random.split(key, 6)
    return {
        "image1": jax.random.uniform(ks[0], (1, H, W, 3)) * 255.0,
        "image2": jax.random.uniform(ks[1], (1, H, W, 3)) * 255.0,
        "depth1": jax.random.uniform(ks[2], (1, H, W)) * 40.0 + 2.0,
        "depth2": jax.random.uniform(ks[3], (1, H, W)) * 40.0 + 2.0,
        "intrinsics": jnp.tile(
            jnp.asarray([[721.5, 721.5, 609.6, 172.8]]), (1, 1)),
        "flow": jax.random.normal(ks[4], (1, H, W, 3)) * 0.5,
        "valid": (jax.random.uniform(ks[5], (1, H, W)) > 0.2
                  ).astype(jnp.float32),
    }


batch = make_batch(jax.random.PRNGKey(1))
t0 = time.time()
state, m = step(state, batch)
loss = float(m["loss"])
print(f"  first step (compile+run): {time.time()-t0:.1f}s, "
      f"loss={loss:.3f}", flush=True)
assert loss == loss, "NaN loss"

t0 = time.time()
for i in range(a.steps):
    state, m = step(state, make_batch(jax.random.PRNGKey(2 + i)))
loss = float(m["loss"])
dt = (time.time() - t0) / a.steps
print(f"  steady: {dt*1e3:.1f} ms/step (loss {loss:.3f})", flush=True)
