"""A/B GeoNet train-step DispNetS knob variants on real TPU.

Honest protocol (CLAUDE.md): chained distinct steps through donated
state, forced by one final scalar fetch. Usage:
    python _scratch_knob_ab.py [variant ...]
Default: all variants. Each variant is measured in its own process run
ideally; within one process each gets its own jit program + state.
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.train import geonet

BATCH = 128
H, W = 128, 416

VARIANTS = {
    "default": {},
    "up456": {"dispnet_s2d_up_levels": (4, 5, 6)},
    "up23456": {"dispnet_s2d_up_levels": (2, 3, 4, 5, 6)},
    "up456_mat_heads": {"dispnet_s2d_up_levels": (4, 5, 6),
                        "dispnet_mat_heads": True},
    "mat_heads": {"dispnet_mat_heads": True},
    "pdg12": {"dispnet_packed_dgrad_levels": (1, 2)},
    "wg56": {"dispnet_wgrad_s2d_iconv_levels": (5, 6)},
    "wg456": {"dispnet_wgrad_s2d_iconv_levels": (4, 5, 6)},
}


def measure(name, overrides, iters=10):
    cfg = GeoNetConfig(batch_size=BATCH, img_height=H, img_width=W,
                       compute_dtype=jnp.bfloat16, **overrides)
    rng = np.random.RandomState(0)
    data = {
        "tgt": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 6), np.uint8)),
        "intrinsics": jnp.asarray(np.tile(np.array(
            [[[W * 0.58, 0, W / 2], [0, H * 1.92, H / 2], [0, 0, 1]]],
            np.float32), (BATCH, 1, 1))),
    }
    state = geonet.create_train_state(cfg)
    step = geonet.make_train_step(cfg)
    state, m = step(state, data)
    assert np.isfinite(float(m["loss_total"]))      # force compile+run
    state, m = step(state, data)
    _ = float(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data)
    final = float(m["loss_total"])                  # force the chain
    dt = (time.perf_counter() - t0) / iters
    fps = BATCH * 3 / dt
    print(f"{name:18s} {dt * 1e3:7.1f} ms/step  {fps:7.1f} f/s  "
          f"(loss={final:.4f})", flush=True)
    del state, step, data
    return fps


if __name__ == "__main__":
    which = sys.argv[1:] or list(VARIANTS)
    for name in which:
        measure(name, VARIANTS[name])
