"""CLI: full fused pipeline — GeoNet depth/pose -> NNET normals/depth ->
rigid optical flow -> MotionFusionNet segmentation.

Parity with `/root/reference/predict.py:40-85` (flow source divergence
documented in `sndepth_tpu/pipelines.py`). Works on a RAFT3D-style test
directory (``{root}/testing/seq/*.png``) or, with ``--synthetic``, on a
random stream so the pipeline is exercisable anywhere.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def _batches(args):
    if not args.synthetic and os.path.isdir(
            os.path.join(args.root, "testing", "seq")):
        from sndepth_tpu.data.raft3d_kitti import KITTIEvalDataset
        from sndepth_tpu.data.kitti_sequence import batch_iterator
        ds = KITTIEvalDataset(args.root, args.img_width, args.img_height)
        for b in batch_iterator(ds, args.batch_size, shuffle=False,
                                drop_last=False):
            if "intrinsics" not in b:
                break
            yield b
    else:
        from sndepth_tpu.data.prefetch import synthetic_batches
        it = synthetic_batches(args.batch_size, args.img_height,
                               args.img_width)
        for _ in range(args.max_batches or 1):
            b = next(it)
            yield b


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="fused predict pipeline")
    p.add_argument("--root", default="data/raft_datasets")
    p.add_argument("--out_dir", default="outputs/predict")
    p.add_argument("--geonet_ckpt", default=None)
    p.add_argument("--motion_ckpt", default=None)
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--max_batches", default=0, type=int)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--flow_source", default="rigid",
                   choices=["rigid", "raft2d", "raft2d_large"],
                   help="dense flow for motion fusion: pose-induced rigid "
                        "flow, the native RAFT2D, or the torchvision-"
                        "raft_large-compatible RAFT2DLarge (the reference "
                        "uses hub RAFT-Large here, `predict.py:8-9,24`)")
    p.add_argument("--raft2d_iters", default=12, type=int)
    p.add_argument("--raft2d_ckpt", default=None,
                   help="torchvision raft_large .pth for --flow_source "
                        "raft2d_large (convert_raft2d_checkpoint)")
    args = p.parse_args(argv)

    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.ops.camera import compute_rigid_flow
    from sndepth_tpu.pipelines import GeoNetStage, MotionStage, NNETStage
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.utils.visualize import pose_to_csv, save_image

    config = GeoNetConfig(batch_size=args.batch_size,
                          img_height=args.img_height,
                          img_width=args.img_width,
                          compute_dtype=jnp.float32)
    params = None
    if args.geonet_ckpt:
        from sndepth_tpu.train.geonet import create_train_state
        state = ckpt_lib.restore_checkpoint(args.geonet_ckpt,
                                            create_train_state(config))
        params = jax.tree_util.tree_map(jnp.asarray, state["params"]
                                        if isinstance(state, dict)
                                        else state.params)

    shape = (args.batch_size, args.img_height, args.img_width)
    geonet = GeoNetStage(config, params=params)
    nnet = NNETStage(sample_shape=shape)
    motion = MotionStage(sample_shape=shape)
    raft2d = None
    if args.flow_source in ("raft2d", "raft2d_large"):
        from sndepth_tpu.pipelines import Raft2DFlowStage
        variables = None
        if args.raft2d_ckpt:
            from sndepth_tpu.utils.convert_weights import (
                convert_raft2d_checkpoint)
            variables = jax.tree_util.tree_map(
                jnp.asarray, convert_raft2d_checkpoint(args.raft2d_ckpt))
        raft2d = Raft2DFlowStage(
            variables=variables, iters=args.raft2d_iters,
            sample_shape=shape,
            arch="large" if args.flow_source == "raft2d_large" else
            "native")
    if args.motion_ckpt:
        motion.state = ckpt_lib.restore_checkpoint(args.motion_ckpt,
                                                   motion.state)

    os.makedirs(args.out_dir, exist_ok=True)
    all_poses = []
    for i, batch in enumerate(_batches(args)):
        if args.max_batches and i >= args.max_batches:
            break
        g = geonet(batch)
        n = nnet(g["depth"], (g["tgt_norm"] + 1.0) * 0.5)

        k = batch.get("intrinsics")
        if k is None or k.shape[-1] == 4:
            w, h = args.img_width, args.img_height
            kmat = np.tile(np.array([[[w * 0.58, 0, w / 2],
                                      [0, h * 1.92, h / 2],
                                      [0, 0, 1]]], np.float32),
                           (args.batch_size, 1, 1))
        else:
            kmat = np.asarray(k)
        if raft2d is not None:
            img1 = (g["tgt_norm"] + 1.0) * 0.5
            img2 = (g["src_norm"][..., 3:] + 1.0) * 0.5
            flow = raft2d(img1, img2)
        else:
            flow = compute_rigid_flow(g["poses"][:, 0], n["depth"][..., 0],
                                      jnp.asarray(kmat), False)

        from sndepth_tpu.utils.visualize import flow_to_rgb
        flow_rgb = jnp.asarray(np.stack(
            [flow_to_rgb(f) for f in np.asarray(flow)]))
        rgb01 = (g["tgt_norm"] + 1.0) * 0.5
        seg = motion(rgb01, flow_rgb)

        for j in range(args.batch_size):
            idx = i * args.batch_size + j
            save_image(f"{args.out_dir}/depth_{idx}.png",
                       np.asarray(n["depth"][j]))
            save_image(f"{args.out_dir}/norm_{idx}.png",
                       np.asarray(n["normals"][j]))
            save_image(f"{args.out_dir}/flow_{idx}.png",
                       np.asarray(flow[j]))
            save_image(f"{args.out_dir}/seg_{idx}.png",
                       np.asarray(seg[j]).astype(np.float32))
        all_poses.append(np.asarray(g["poses"]).reshape(
            -1, g["poses"].shape[-1])[None] if g["poses"].ndim == 3
            else np.asarray(g["poses"]))
        print(f"batch {i}: wrote depth/norm/flow/seg", flush=True)

    if all_poses:
        pose_to_csv(np.concatenate(
            [np.asarray(g["poses"])], axis=0),
            os.path.join(args.out_dir, "poses.csv"))
    print("done")


if __name__ == "__main__":
    main()
