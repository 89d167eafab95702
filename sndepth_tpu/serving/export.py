"""Model export for serving: serialized StableHLO artifacts.

The reference has no deployment story beyond pickled state_dicts; here
the inference path of any model family exports to a self-contained
artifact directory:

    model.stablehlo   — jax.export serialization of the jitted forward
                        (lowered for an explicit target platform, e.g.
                        'tpu', regardless of the exporting host)
    params.ckpt/      — Orbax checkpoint of the parameter pytree
    meta.json         — input shapes/dtypes + target platform

A server rehydrates with :func:`load_artifact` and calls the returned
function — no model code, flax, or Python source needed at serving time
beyond this module.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax import export as jexport


def export_fn(fn: Callable, example_args: Sequence[Any],
              platforms: Sequence[str] | None = None) -> bytes:
    """Serialize ``jit(fn)`` traced at the example args' shapes/dtypes."""
    exp = jexport.export(jax.jit(fn),
                         platforms=platforms)(*example_args)
    return exp.serialize()


def save_artifact(out_dir: str, fn: Callable, params: Any,
                  example_inputs: Sequence[Any],
                  platforms: Sequence[str] | None = None) -> str:
    """Export ``fn(params, *inputs)`` + params into ``out_dir``."""
    import orbax.checkpoint as ocp

    os.makedirs(out_dir, exist_ok=True)
    blob = export_fn(fn, (params,) + tuple(example_inputs), platforms)
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(out_dir), "params.ckpt"),
               jax.device_get(params), force=True)
    ckptr.wait_until_finished()
    meta = {
        "platforms": list(platforms) if platforms else
                     [jexport.default_export_platform()],
        "inputs": [{"shape": list(np.shape(x)),
                    "dtype": str(np.asarray(x).dtype)}
                   for x in example_inputs],
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_artifact(art_dir: str) -> tuple[Callable, Any, dict]:
    """(callable, params, meta): call as ``fn(params, *inputs)``."""
    import orbax.checkpoint as ocp

    with open(os.path.join(art_dir, "model.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(art_dir, "meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(
        os.path.join(os.path.abspath(art_dir), "params.ckpt"))
    return exp.call, params, meta
