"""CLI: convert reference PyTorch checkpoints to framework params.

Usage:
    # GeoNet pair (rigid_depth_*.pth + rigid_pose_*.pth)
    python -m sndepth_tpu.cli.convert_weights geonet \
        --depth rigid_depth_35000.pth --pose rigid_pose_35000.pth \
        --out converted/geonet

    # NNET normal net (nyu.pt: EfficientNet-B5 encoder + decoder)
    python -m sndepth_tpu.cli.convert_weights nnet \
        --ckpt checkpoints/nyu.pt --out converted/nnet
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="torch -> jax weight converter")
    sub = p.add_subparsers(dest="kind", required=True)

    g = sub.add_parser("geonet", help="DispNetS + PoseNet pair")
    g.add_argument("--depth", required=True, help="rigid_depth_*.pth")
    g.add_argument("--pose", required=True, help="rigid_pose_*.pth")
    g.add_argument("--out", required=True, help="output checkpoint dir")

    n = sub.add_parser("nnet", help="normal net (nyu.pt)")
    n.add_argument("--ckpt", required=True, help="nyu.pt path")
    n.add_argument("--architecture", default="GN", choices=["GN", "BN"])
    n.add_argument("--out", required=True, help="output checkpoint dir")

    args = p.parse_args(argv)
    from sndepth_tpu.train import checkpoint as ckpt_lib

    if args.kind == "geonet":
        from sndepth_tpu.utils.convert_weights import (
            convert_geonet_checkpoint)
        params = convert_geonet_checkpoint(args.depth, args.pose)
    else:
        from sndepth_tpu.utils.convert_weights import convert_nnet_checkpoint
        params = convert_nnet_checkpoint(args.ckpt, args.architecture)
    path = ckpt_lib.save_checkpoint(args.out, params, 0)
    print(f"converted params -> {path}")


if __name__ == "__main__":
    main()
