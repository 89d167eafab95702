"""CLI: convert reference PyTorch checkpoints to framework params.

All six reference checkpoint families are supported:

    # GeoNet pair (rigid_depth_*.pth + rigid_pose_*.pth,
    # `baseline.py:1218-1232`)
    python -m sndepth_tpu.cli.convert_weights geonet \
        --depth rigid_depth_35000.pth --pose rigid_pose_35000.pth \
        --out converted/geonet

    # NNET normal net (nyu.pt: EfficientNet-B5 encoder + decoder,
    # `baseline.py:288-299`)
    python -m sndepth_tpu.cli.convert_weights nnet \
        --ckpt checkpoints/nyu.pt --out converted/nnet

    # RAFT3D (`kitti_submission.py:196-197`)
    python -m sndepth_tpu.cli.convert_weights raft3d \
        --ckpt raft3d.pth --out converted/raft3d

    # AutoencoderKL (`AutoencoderKL.py:55-87`, strips first_stage_model.)
    python -m sndepth_tpu.cli.convert_weights vae \
        --ckpt VAE_ckpt/nd-laion_ema.ckpt --out converted/vae

    # MotionFusionNet (`predict.py:19-22`)
    python -m sndepth_tpu.cli.convert_weights motion \
        --ckpt best.pt --out converted/motion

    # DINO ViT-S/16 (`models/image_f_extract.py:39-43`)
    python -m sndepth_tpu.cli.convert_weights dino \
        --ckpt dino_deitsmall16_pretrain.pth --out converted/dino

    # UniAD track model (R101-DCN + BEVFormer head + QIM + memory bank,
    # `track_uniad.py` module tree; motion/occ/planner heads of full
    # UniAD checkpoints are ignored)
    python -m sndepth_tpu.cli.convert_weights uniad \
        --ckpt uniad_base_track_map.pth --out converted/uniad
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="torch -> jax weight converter")
    sub = p.add_subparsers(dest="kind", required=True)

    g = sub.add_parser("geonet", help="DispNetS + PoseNet pair")
    g.add_argument("--depth", required=True, help="rigid_depth_*.pth")
    g.add_argument("--pose", required=True, help="rigid_pose_*.pth")
    g.add_argument("--flow", default=None,
                   help="optional stage-2 flow_*.pth (FlowNet)")
    g.add_argument("--out", required=True, help="output checkpoint dir")

    n = sub.add_parser("nnet", help="normal net (nyu.pt)")
    n.add_argument("--ckpt", required=True, help="nyu.pt path")
    n.add_argument("--architecture", default="GN", choices=["GN", "BN"])
    n.add_argument("--out", required=True, help="output checkpoint dir")

    for kind, helptext in (
            ("raft3d", "RAFT3D scene-flow .pth"),
            ("vae", "AutoencoderKL ckpt (first_stage_model. stripped)"),
            ("motion", "MotionFusionNet best.pt"),
            ("dino", "DINO ViT-S/16 checkpoint"),
            ("uniad", "UniAD track .pth (R101+BEVFormer+QIM+membank)")):
        s = sub.add_parser(kind, help=helptext)
        s.add_argument("--ckpt", required=True)
        s.add_argument("--out", required=True, help="output checkpoint dir")

    args = p.parse_args(argv)
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.utils import convert_weights as cw

    if args.kind == "geonet":
        params = cw.convert_geonet_checkpoint(args.depth, args.pose,
                                              args.flow)
    elif args.kind == "nnet":
        params = cw.convert_nnet_checkpoint(args.ckpt, args.architecture)
    elif args.kind == "raft3d":
        params = cw.convert_raft3d_checkpoint(args.ckpt)
    elif args.kind == "vae":
        params = cw.convert_vae_checkpoint(args.ckpt)
    elif args.kind == "motion":
        params = cw.convert_motionfusion_checkpoint(args.ckpt)
    elif args.kind == "uniad":
        params = cw.convert_uniad_checkpoint(args.ckpt)
    else:
        params = cw.convert_dino_checkpoint(args.ckpt)
    path = ckpt_lib.save_checkpoint(args.out, params, 0)
    print(f"converted params -> {path}")


if __name__ == "__main__":
    main()
