"""Trace / A-B the UniAD reference-scale BEV encoder (the 48 s stage).

Bisect (tools/uniad_refscale_bisect.py) pinned the 85 s/frame refscale
inference anomaly to the BEV encoder: backbone 270 ms, encoder ~48 s,
detections 18 ms. This tool runs JUST the encoder stage with knob
overrides and (optionally) captures an XProf trace of one execution.

Usage:
  python tools/uniad_bev_trace.py [--img H W] [--iters N] [--trace DIR]
                                  [--layers N]
Env knobs of interest:
  SNDEPTH_WARP_BACKEND=xla|pallas  force the sampler backend
  SNDEPTH_MSDA_CHUNK_MIN / SNDEPTH_MSDA_CHUNK  query chunking
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--img", type=int, nargs=2, default=(640, 1152))
ap.add_argument("--iters", type=int, default=2)
ap.add_argument("--trace", default="")
ap.add_argument("--layers", type=int, default=0,
                help="override encoder layers (0 = reference 6)")
ap.add_argument("--top", type=int, default=25)
a = ap.parse_args()
H, W = a.img

from sndepth_tpu.models.uniad_track import uniad_reference_config

kw = {"dtype": jnp.bfloat16}
if a.layers:
    kw["encoder_layers"] = a.layers
model = uniad_reference_config(**kw)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.rand(6, 1, H, W, 3), jnp.float32)
lidar2img = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))

print(f"[bev-trace] init at {H}x{W} "
      f"(layers={a.layers or model.encoder_layers}, "
      f"warp={os.environ.get('SNDEPTH_WARP_BACKEND', 'auto')}, "
      f"chunk_min={os.environ.get('SNDEPTH_MSDA_CHUNK_MIN', 'dflt')}, "
      f"chunk={os.environ.get('SNDEPTH_MSDA_CHUNK', 'dflt')}) ...",
      flush=True)
t0 = time.time()


def bev_only(mdl, imgs, lidar2img):
    return mdl.get_bevs(imgs, lidar2img)


variables = jax.jit(
    lambda r, i, l: model.init(r, i, l, method=bev_only)
)(jax.random.PRNGKey(0), imgs, lidar2img)
print(f"  init done in {time.time()-t0:.1f}s", flush=True)


@jax.jit
def run(variables, imgs, i):
    bev = model.apply(variables, imgs + i * 1e-6, lidar2img,
                      method=bev_only)
    return jnp.sum(bev.astype(jnp.float32))

t0 = time.time()
s = run(variables, imgs, 0)
_ = float(s)
print(f"  compile+first {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for i in range(1, a.iters + 1):
    s = run(variables, imgs, i)
_ = float(s)
print(f"  bev: {(time.time()-t0)/a.iters*1e3:.1f} ms/iter", flush=True)

if a.trace:
    from sndepth_tpu.utils.profiling import capture_trace
    with capture_trace(a.trace):
        s = run(variables, imgs, a.iters + 1)
        _ = float(s)
    print(f"  trace written to {a.trace}", flush=True)
    from sndepth_tpu.utils.xplane import print_summary
    print_summary(a.trace, top=a.top)
