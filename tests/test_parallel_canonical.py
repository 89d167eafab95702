"""Canonical-shape multi-chip rehearsal (VERDICT r2 #8).

The 8-device dryrun gate runs tiny 32x64 shapes; sharding-induced layout
or recompile surprises at the REAL benchmark shape (batch 128, 128x416,
bf16) would only surface on hardware. These tests compile the DP and
FSDP GeoNet train steps at the canonical shape on the 8-device CPU mesh
(catching sharding/layout issues at trace/compile time) and execute one
smaller-batch — but still sharded, still full-resolution — step to prove
the compiled artifacts actually run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.parallel import mesh as pmesh
from sndepth_tpu.train import geonet


def _batch(batch, h, w):
    rng = np.random.RandomState(0)
    return {
        "tgt": jnp.asarray(rng.randint(0, 256, (batch, h, w, 3), np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (batch, h, w, 6), np.uint8)),
        "intrinsics": jnp.asarray(np.tile(np.array(
            [[[241.0, 0, 208.0], [0, 246.0, 64.0], [0, 0, 1]]],
            np.float32), (batch, 1, 1))),
    }


@pytest.mark.slow
def test_dp_canonical_shape_compiles_and_small_step_runs():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    mesh = pmesh.make_mesh()

    # Compile (AOT) at the canonical bench shape: batch 128, 128x416, bf16.
    cfg = GeoNetConfig(batch_size=128, compute_dtype=jnp.bfloat16)
    h, w = cfg.img_height, cfg.img_width
    state = jax.eval_shape(lambda: geonet.create_train_state(cfg))
    step = pmesh.make_parallel_train_step(cfg, mesh)
    compiled = step.lower(state, _spec_tree(_batch(128, h, w))).compile()
    assert compiled is not None
    text = compiled.as_text()
    assert "all-reduce" in text or "all_reduce" in text, \
        "DP step compiled without gradient all-reduce collectives"

    # Execute one step at batch 16 (2 per device), same full resolution.
    cfg_s = GeoNetConfig(batch_size=16, compute_dtype=jnp.bfloat16)
    state = pmesh.replicate_state(geonet.create_train_state(cfg_s), mesh)
    data = pmesh.shard_batch(_batch(16, h, w), mesh)
    step_s = pmesh.make_parallel_train_step(cfg_s, mesh)
    state, metrics = step_s(state, data)
    assert np.isfinite(float(metrics["loss_total"]))


def _spec_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


@pytest.mark.slow
def test_fsdp_canonical_shape_compiles():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    from sndepth_tpu.parallel import fsdp

    mesh = pmesh.make_mesh()
    cfg = GeoNetConfig(batch_size=128, compute_dtype=jnp.bfloat16)
    h, w = cfg.img_height, cfg.img_width

    state = geonet.create_train_state(cfg)
    fstate = fsdp.shard_state(state, mesh)
    fstep = fsdp.make_fsdp_train_step(
        lambda s, b: geonet.train_step(s, b, config=cfg), fstate, mesh)
    compiled = fstep.lower(_spec_tree(fstate),
                           _spec_tree(_batch(128, h, w))).compile()
    text = compiled.as_text()
    assert "all-gather" in text or "all_gather" in text, \
        "FSDP step compiled without parameter all-gathers"
