"""Microbench: pair photo-loss kernel variants at GeoNet scale-0 shapes.

Honest protocol (CLAUDE.md): chain distinct inputs through the kernel,
force with one scalar fetch. Variants isolate the warp-tile loop vs the
plane-loss computation:
  full        _pair_run need_grad=True  (what the train step calls)
  nograd      _pair_run need_grad=False (drops adjoint pools + tangents)
  stubwarp    _warp_tile replaced with a copy of x coords -> measures
              everything EXCEPT the gather work
  stubloss    _photo_channel replaced by masked L1 only -> measures
              everything EXCEPT the DSSIM pool work
"""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import sndepth_tpu.kernels.photo_loss as PL

B, NS, H, W, C = 128, 2, 128, 416, 3

# Synthesize inputs ON DEVICE: eager host->device of the ~460MB f32 set
# takes >10 min over the tunnel (measured ~0.5MB/s effective) and looks
# like a hang. One jitted builder costs one small compile instead.
@jax.jit
def _build_inputs():
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    tgt = jax.random.uniform(k1, (B, H, W, C), jnp.float32)
    srcs = jax.random.uniform(k2, (B, NS, H, W, C), jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    base = jnp.stack([xx, yy], -1)[None, None]
    flow = jnp.stack([jnp.sin(yy / 17.0) * 3 + 2.0,
                      jnp.cos(xx / 23.0) * 2], -1)[None, None]
    cf = jnp.broadcast_to(base + flow, (B, NS, H, W, 2))
    cb = jnp.broadcast_to(base - flow, (B, NS, H, W, 2))
    return tgt, srcs, cf, cb

tgt, srcs, cf, cb = _build_inputs()
jax.block_until_ready((tgt, srcs, cf, cb))

def timeit(name, fn, iters=8):
    """Per-call device cost by chain differencing: one jit runs the
    kernel K times back-to-back (lax.scan chaining through the inputs so
    nothing memoizes/overlaps), timed for K=2 and K=2+iters; the delta
    isolates the kernel+prep from the ~50 ms/call tunnel dispatch floor
    that swamped the per-call form of this bench."""
    def chain(x, s, f_, b_, i, K):
        def body(c, k):
            out = fn(x + (i + k) * 1e-6, s, f_, b_, 0)
            return c + out, None
        return jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))[0]

    fs = jax.jit(functools.partial(chain, K=2))
    fl = jax.jit(functools.partial(chain, K=2 + iters))
    float(fs(tgt, srcs, cf, cb, 999.0))      # compile + program load
    float(fl(tgt, srcs, cf, cb, 999.0))
    best = None
    for rep in range(2):
        t0 = time.perf_counter()
        float(fs(tgt, srcs, cf, cb, float(rep)))
        t1 = time.perf_counter()
        float(fl(tgt, srcs, cf, cb, float(rep)))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / iters * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:10s} {best:8.2f} ms/call", flush=True)
    return best

def run_full(x, s, f_, b_, i):
    return PL._pair_run(x + i * 1e-6, s, f_, b_, 0.85, "edge_zero",
                        need_grad=True)[1].sum()

def run_nograd(x, s, f_, b_, i):
    return PL._pair_run(x + i * 1e-6, s, f_, b_, 0.85, "edge_zero",
                        need_grad=False)[0]

which = sys.argv[1:] or ["full", "nograd", "stubwarp", "stubloss"]
if "full" in which:
    timeit("full", run_full)
if "nograd" in which:
    timeit("nograd", run_nograd)
if "stubwarp" in which:
    real_warp = PL._warp_tile
    def stub_warp(x, y, img_ref, h, w, nch, mode, save_tangents, store,
                  meta=None, img_at=(0,)):
        accs = [x * 0.5 for _ in range(nch)]
        store(accs, accs, accs)
    PL._warp_tile = stub_warp
    timeit("stubwarp", run_full)
    PL._warp_tile = real_warp
if "stubloss" in which:
    real_ch = PL._photo_channel
    def stub_channel(pbuf, x, y, mu_x, sigma_x, mask, htp, wtp, alpha,
                     need_grad):
        diff = x - y
        err = (1.0 - alpha) * jnp.abs(diff) * mask
        return err, (-jnp.sign(diff) * mask if need_grad else None)
    PL._photo_channel = stub_channel
    timeit("stubloss", run_full)
    PL._photo_channel = real_ch
