"""Full-train-state checkpointing (Orbax).

The reference saves bare module state_dicts every 5000 iters
(`/root/reference/models/baseline.py:1218-1232`) and cannot truly resume
(no optimizer state or RNG — survey §5). Here a checkpoint is the complete
train-state pytree: params + optimizer state + step + RNG key, so resume is
bit-exact.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    keep: int = 5) -> str:
    """Save ``state`` under ``ckpt_dir/<step>``. Returns the path."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, str(step))
    ckptr = ocp.StandardCheckpointer()
    state = jax.device_get(state)
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    _prune(ckpt_dir, keep)
    return path


class AsyncCheckpointWriter:
    """Non-blocking checkpoint saves: the device->host fetch happens on
    the caller, serialization runs on Orbax's background threads, and the
    train loop keeps stepping. ``wait()`` (or the next ``save``) joins the
    in-flight write; call ``close()`` (or use as a context manager) before
    reading the directory.

    The reference blocks training on every torch.save
    (`baseline.py:1218-1232`); on TPU the step cadence is ms-scale so a
    blocking multi-second save is a real throughput tax.
    """

    def __init__(self, ckpt_dir: str, keep: int = 5):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.keep = keep
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, state: Any, step: int) -> str:
        # join the previous in-flight write, then prune to the keep policy
        # before starting the next one (disk holds <= keep + 1 transiently)
        self._ckptr.wait_until_finished()
        _prune(self.ckpt_dir, self.keep)
        path = os.path.join(self.ckpt_dir, str(step))
        state = jax.device_get(state)
        self._ckptr.save(path, args=ocp.args.StandardSave(state),
                         force=True)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()
        _prune(self.ckpt_dir, self.keep)

    def close(self) -> None:
        self.wait()
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any, step: int | None = None
                       ) -> Any:
    """Restore into the structure of ``target`` (a template train state)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(np.asarray, jax.device_get(target))
    return ckptr.restore(path, template)


def restore_params_or_state(ckpt_dir: str, state: Any,
                            step: int | None = None) -> Any:
    """Restore either a full saved train state OR a converted params-only
    checkpoint (what ``cli/convert_weights`` writes) into ``state``.

    Converted reference checkpoints carry no optimizer/step/rng, so a
    straight :func:`restore_checkpoint` against a train-state template
    fails on structure mismatch; this falls back to restoring against
    ``state.params`` (or ``state["params"]``) and grafting the result
    onto the template's params. Eval/predict CLIs use this so the SAME
    ``--ckpt_dir`` flag accepts both our training output and a converted
    reference ``.pth``."""
    try:
        return restore_checkpoint(ckpt_dir, state, step)
    except FileNotFoundError:
        raise
    except Exception as exc:  # orbax raises ValueError/KeyError families
        full_state_err = exc
        logging.info("full-state restore failed (%s: %s); trying "
                     "params-only fallback", type(exc).__name__, exc)

    is_obj = hasattr(state, "params")
    params_tpl = state.params if is_obj else state["params"]
    bs_tpl = (getattr(state, "batch_stats", None) if is_obj
              else state.get("batch_stats"))

    def graft(params, batch_stats=None):
        kw = {"params": params}
        if batch_stats is not None:
            kw["batch_stats"] = batch_stats
        if hasattr(state, "replace"):
            return state.replace(**kw)
        out = dict(state)
        out.update(kw)
        return out

    if bs_tpl is not None:
        try:
            both = restore_checkpoint(
                ckpt_dir, {"params": params_tpl, "batch_stats": bs_tpl},
                step)
            return graft(both["params"], both["batch_stats"])
        except Exception as exc:
            logging.info("params+batch_stats restore failed (%s: %s); "
                         "trying params-only", type(exc).__name__, exc)
    try:
        params = restore_checkpoint(ckpt_dir, params_tpl, step)
    except Exception as exc:
        # Surface the ORIGINAL full-state failure too — a genuinely
        # corrupt training checkpoint otherwise shows up as a confusing
        # params-template structure mismatch.
        raise RuntimeError(
            f"checkpoint at {ckpt_dir!r} matched neither the train-state "
            f"template (first error: {type(full_state_err).__name__}: "
            f"{full_state_err}) nor a params-only layout") from exc
    return graft(params)


def _prune(ckpt_dir: str, keep: int) -> None:
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    for s in steps[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, str(s)), ignore_errors=True)
