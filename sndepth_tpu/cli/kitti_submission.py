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
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="RAFT3D encoder/GRU compute dtype")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard frame batches across all devices (the "
                        "reference wraps the model in torch.nn.DataParallel "
                        "here, `kitti_submission.py:196`)")
    args = p.parse_args(argv)

    from sndepth_tpu.data.raft3d_kitti import KITTIEvalDataset, write_prediction
    from sndepth_tpu.models.raft3d import RAFT3D
    from sndepth_tpu.ops import se3
    from sndepth_tpu.train import checkpoint as ckpt_lib

    ds = KITTIEvalDataset(args.root, args.img_width, args.img_height)
    if len(ds) == 0:
        print(f"no frames under {args.root}/testing/seq — nothing to do")
        return

    model = RAFT3D(dtype=jnp.bfloat16 if args.dtype == "bf16"
                   else jnp.float32)
    h, w = args.img_height, args.img_width
    dummy = jnp.zeros((1, h, w, 3))
    dummy_d = jnp.full((1, h, w), 4.0)
    dummy_k = jnp.array([[w * 0.58, w * 0.58, w / 2, h / 2]])
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, dummy_d,
                           dummy_d, dummy_k, iters=1)
    if args.ckpt_dir:
        # Converted reference checkpoints (cli/convert_weights raft3d)
        # carry {"params", "batch_stats"} — restore both; dropping the
        # FPN BN running stats would silently change the context net.
        variables = dict(ckpt_lib.restore_checkpoint(
            args.ckpt_dir, {"params": variables["params"],
                            "batch_stats": variables["batch_stats"]}))

    from sndepth_tpu.ops.projective import induced_flow

    def run_impl(img1, img2, d1, d2, k):
        Ts = model.apply(variables, img1, img2, d1, d2, k,
                         iters=args.iters)
        tau_phi = se3.log(Ts)
        flow2d, _, _ = induced_flow(Ts, d1, k)
        return Ts, tau_phi, flow2d

    nb = 1
    if args.data_parallel and len(jax.devices()) > 1:
        # TPU equivalent of the reference's torch DataParallel wrap:
        # a frame batch sharded over the data mesh axis, XLA moving
        # nothing but the inputs/outputs (the model is replicated).
        from sndepth_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh()
        nb = mesh.shape[pmesh.DATA_AXIS]
        bs = pmesh.batch_sharding(mesh)
        run = jax.jit(run_impl, in_shardings=(bs,) * 5,
                      out_shardings=(bs, bs, bs))
        print(f"data-parallel over {nb} devices")
    else:
        run = jax.jit(run_impl)

    n = min(len(ds), args.max_frames) if args.max_frames else len(ds)
    for start in range(0, n, nb):
        idx = list(range(start, min(start + nb, n)))
        pad = idx + [idx[-1]] * (nb - len(idx))   # repeat-pad last chunk
        samples = [ds[i] for i in pad]
        img1 = jnp.asarray(np.stack(
            [s["tgt"] for s in samples]), jnp.float32) / 255.0
        img2 = jnp.asarray(np.stack(
            [s["src"][..., 3:] for s in samples]), jnp.float32) / 255.0
        d1 = jnp.full((nb, h, w), 4.0)
        d2 = jnp.full((nb, h, w), 4.0)
        k = jnp.asarray(np.stack([s["intrinsics"] for s in samples]))
        Ts, tau_phi, flow2d = run(img1, img2, d1, d2, k)
        Ts, tau_phi, flow2d = jax.device_get((Ts, tau_phi, flow2d))
        for j, i in enumerate(idx):
            write_prediction(
                args.out_dir, i, np.asarray(flow2d[j, :, :, :2]),
                np.asarray(Ts[j]), np.asarray(tau_phi[j, ..., :3]),
                np.asarray(tau_phi[j, ..., 3:]))
        print(f"[{idx[-1] + 1}/{n}] wrote prediction", flush=True)


if __name__ == "__main__":
    main()
