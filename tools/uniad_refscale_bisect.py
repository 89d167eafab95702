"""Bisect the UniAD reference-scale inference anomaly (VERDICT r4 #1).

6x640x1152 bf16 single-frame inference measured 134.7 s/frame (r4) and
85.3 s/frame (r5 re-run) vs 0.6 ms/frame at the 100x100-BEV config.
This tool times the frame's stages separately with the honest protocol
(chained distinct work, forced by a scalar fetch):

  backbone   extract_img_feat on (6, 1, H, W, 3)
  bev        get_bevs (backbone + BEVFormer encoder)  -> encoder = bev - backbone
  detections head.get_detections on a fixed BEV       (decoder + heads)
  frame      full __call__                            -> tail = frame - bev - det

Usage: python tools/uniad_refscale_bisect.py [--img H W] [--iters N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.models.uniad_track import (TrackState,
                                            uniad_reference_config)
from sndepth_tpu.models.track_runtime import empty_tracks

ap = argparse.ArgumentParser()
ap.add_argument("--img", type=int, nargs=2, default=(640, 1152))
ap.add_argument("--iters", type=int, default=3)
ap.add_argument("--stages", default="backbone,bev,det,frame")
a = ap.parse_args()
H, W = a.img

model = uniad_reference_config(dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.rand(6, 1, H, W, 3), jnp.float32)
lidar2img = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))

dummy = TrackState(
    prev_bev=jnp.zeros((1, model.bev_h * model.bev_w, model.embed_dims)),
    tracks=empty_tracks(model.num_query, model.embed_dims,
                        model.num_classes, model.mem_len),
    next_obj_id=jnp.zeros((), jnp.int32),
    timestamp=jnp.zeros(()),
    has_prev=jnp.zeros((), bool))

print(f"[bisect] init at {H}x{W} ...", flush=True)
t0 = time.time()
variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, lidar2img,
                                dummy)
state = model.apply(variables, method="init_state")
print(f"  init done in {time.time()-t0:.1f}s", flush=True)


def bench(name, fn, *args):
    t0 = time.time()
    s = fn(*args, 0)
    _ = float(s)
    print(f"  {name}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(1, a.iters + 1):
        s = fn(*args, i)
    _ = float(s)
    dt = (time.time() - t0) / a.iters
    print(f"  {name}: {dt*1e3:.1f} ms/iter", flush=True)
    return dt


stages = a.stages.split(",")

if "backbone" in stages:
    @jax.jit
    def run_backbone(variables, imgs, i):
        feats = model.apply(variables, imgs + i * 1e-6,
                            method="extract_img_feat")
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
    bench("backbone", run_backbone, variables, imgs)

if "bev" in stages:
    @jax.jit
    def run_bev(variables, imgs, i):
        bev = model.apply(variables, imgs + i * 1e-6, lidar2img,
                          method="get_bevs")
        return jnp.sum(bev.astype(jnp.float32))
    bench("bev (backbone+encoder)", run_bev, variables, imgs)

if "det" in stages:
    bev0 = jnp.asarray(rng.rand(1, model.bev_h * model.bev_w,
                                model.embed_dims), jnp.float32)
    q0 = jnp.asarray(rng.rand(1, model.num_query, 2 * model.embed_dims),
                     jnp.float32)
    r0 = jnp.asarray(rng.rand(1, model.num_query, 3), jnp.float32)

    def _det(mdl, bev, q, r):
        return mdl.head.get_detections(bev, q, r)

    @jax.jit
    def run_det(variables, bev, q, r, i):
        det = model.apply(variables, bev + i * 1e-6, q, r, method=_det)
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree_util.tree_leaves(det))
    bench("detections", run_det, variables, bev0, q0, r0)

if "frame" in stages:
    @jax.jit
    def run_frame(variables, state, imgs, i):
        new_state, out = model.apply(variables, imgs + i * 1e-6,
                                     lidar2img, state)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree_util.tree_leaves(out))
    bench("full frame", run_frame, variables, state, imgs)
