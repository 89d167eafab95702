"""Microbench: weight-grad forms for the tiny-cout decoder convs.

The DispNetS backward's lane-starved wgrads are the last sized lever in
docs/PERF.md. Before building a Pallas kernel, measure on real TPU
(honest chain-diff protocol) what XLA does with each algebraic form:

  xla     : d/dW of conv_general_dilated (what the train step does)
  tapstack: dW[(t,ci),co] = X_im2col^T @ dY — one matmul, M=9ci, N=co
            (pays 9x X materialization in HBM)
  fold2   : wgrad through the f=2 space-to-depth folded conv
            (the existing _wgrad_s2d_conv path, 4x lanes)

Shapes: the decoder convs of the canonical batch-128 GeoNet step
(3 views -> conv batch 384, bf16).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

SHAPES = [
    ("iconv1", 384, 128, 416, 17, 16),
    ("iconv2", 384, 64, 208, 65, 32),
    ("iconv3", 384, 32, 104, 129, 64),
    ("head1", 384, 128, 416, 16, 1),
]


def conv(x, w):
    # bf16 in/out like the train-step convs (MXU accumulates f32
    # internally); no explicit cast so the vjp cotangent stays bf16.
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def wgrad_xla(x, dy, ci, co):
    w0 = jnp.zeros((3, 3, ci, co), jnp.bfloat16)
    return jax.vjp(lambda w: conv(x, w), w0)[1](dy)[0]


def wgrad_tapstack(x, dy, ci, co):
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, r:r + h, c:c + w, :] for r in range(3) for c in range(3)]
    xim = jnp.concatenate(cols, axis=-1)               # (B,H,W,9ci)
    dw = jnp.einsum("bhwk,bhwc->kc", xim, dy,
                    preferred_element_type=jnp.float32)
    return dw.reshape(3, 3, ci, co)


def wgrad_fold2(x, dy, ci, co):
    from sndepth_tpu.models.dispnet import _fold_conv, _s2d_f
    w0 = jnp.zeros((3, 3, ci, co), jnp.float32)
    dy_p = _s2d_f(dy, 2)
    return jax.vjp(lambda wv: _fold_conv(x, wv, jnp.bfloat16, 2),
                   w0)[1](dy_p.astype(jnp.bfloat16))[0]


FORMS = dict(xla=wgrad_xla, tapstack=wgrad_tapstack, fold2=wgrad_fold2)


def main():
    which = sys.argv[1:] or list(FORMS)
    for name, b, h, w, ci, co in SHAPES:
        k = jax.random.PRNGKey(0)

        @jax.jit
        def build(k, b=b, h=h, w=w, ci=ci, co=co):
            k1, k2 = jax.random.split(k)
            x = jax.random.normal(k1, (b, h, w, ci), jnp.bfloat16)
            dy = jax.random.normal(k2, (b, h, w, co), jnp.bfloat16)
            return x, dy

        x, dy = build(k)
        gf = 2 * b * h * w * ci * co * 9 / 1e9
        for form in which:
            fn = FORMS[form]

            def chain(x, dy, i, K, fn=fn, ci=ci, co=co):
                def body(c, j):
                    eps = ((i + j) * 1e-6).astype(x.dtype)
                    dw = fn(x + eps, dy, ci, co)
                    return c + jnp.sum(dw.astype(jnp.float32)), None
                return jax.lax.scan(
                    body, 0.0, jnp.arange(K, dtype=jnp.float32))[0]

            try:
                fs = jax.jit(functools.partial(chain, K=1))
                fl = jax.jit(functools.partial(chain, K=5))
                float(fs(x, dy, 999.0))
                float(fl(x, dy, 999.0))
                best = None
                for rep in range(2):
                    t0 = time.perf_counter()
                    float(fs(x, dy, float(rep)))
                    t1 = time.perf_counter()
                    float(fl(x, dy, float(rep)))
                    t2 = time.perf_counter()
                    dt = ((t2 - t1) - (t1 - t0)) / 4
                    best = dt if best is None else min(best, dt)
                print(f"{name:8s} {form:9s} {best * 1e3:8.2f} ms  "
                      f"({gf / best / 1e3:6.1f} TF/s)", flush=True)
            except Exception as e:
                print(f"{name:8s} {form:9s} FAILED {type(e).__name__}: "
                      f"{e}"[:200], flush=True)


if __name__ == "__main__":
    main()
