"""Checkpoint round-trip and resume-equivalence tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.core.config import GeoNetConfig
from sndepth_tpu.train import checkpoint as ckpt_lib
from sndepth_tpu.train import geonet

CFG = GeoNetConfig(batch_size=1, img_height=32, img_width=64,
                   compute_dtype=jnp.float32)


def _tiny_batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "tgt": jnp.asarray(rng.randint(0, 256, (1, 32, 64, 3), np.uint8)),
        "src": jnp.asarray(rng.randint(0, 256, (1, 32, 64, 6), np.uint8)),
        "intrinsics": jnp.asarray(
            np.array([[[30.0, 0, 32], [0, 30, 16], [0, 0, 1]]], np.float32)),
    }


def test_save_restore_roundtrip(tmp_path):
    state = geonet.create_train_state(CFG)
    path = ckpt_lib.save_checkpoint(str(tmp_path), state, 7)
    assert path.endswith("/7")
    restored = ckpt_lib.restore_checkpoint(str(tmp_path), state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(state), restored)


def test_resume_is_bit_exact(tmp_path):
    step = geonet.make_train_step(CFG)
    batch = _tiny_batch()

    # Run 3 steps, checkpoint, run 2 more.
    s = geonet.create_train_state(CFG)
    for _ in range(3):
        s, _ = step(s, batch)
    ckpt_lib.save_checkpoint(str(tmp_path), s, int(s.step))
    cont = s
    for _ in range(2):
        cont, _ = step(cont, batch)

    # Restore at step 3 and run the same 2 steps.
    template = geonet.create_train_state(CFG)
    restored = ckpt_lib.restore_checkpoint(str(tmp_path), template)
    resumed = jax.tree_util.tree_map(jnp.asarray, restored)
    for _ in range(2):
        resumed, _ = step(resumed, batch)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(cont.params), jax.device_get(resumed.params))
    assert int(resumed.step) == 5


def test_latest_step_and_prune(tmp_path):
    state = geonet.create_train_state(CFG)
    for s in (1, 2, 3):
        ckpt_lib.save_checkpoint(str(tmp_path), state, s, keep=2)
    assert ckpt_lib.latest_step(str(tmp_path)) == 3
    import os
    remaining = sorted(d for d in os.listdir(tmp_path) if d.isdigit())
    assert remaining == ["2", "3"]


def test_async_checkpoint_writer_roundtrip(tmp_path):
    """AsyncCheckpointWriter: non-blocking saves land complete and restore
    bit-exact after close()."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sndepth_tpu.train import checkpoint as ckpt_lib

    state = {"params": {"w": jnp.arange(12.0).reshape(3, 4)},
             "step": jnp.asarray(7, jnp.int32)}
    d = str(tmp_path / "ck")
    with ckpt_lib.AsyncCheckpointWriter(d, keep=2) as w:
        w.save(state, 100)
        w.save(jax.tree_util.tree_map(lambda x: x + 1, state), 200)
    assert ckpt_lib.latest_step(d) == 200
    out = ckpt_lib.restore_checkpoint(d, state, 200)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(state["params"]["w"]) + 1)
    out100 = ckpt_lib.restore_checkpoint(d, state, 100)
    np.testing.assert_array_equal(np.asarray(out100["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
