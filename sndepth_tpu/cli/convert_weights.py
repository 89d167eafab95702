"""CLI: convert reference PyTorch GeoNet checkpoints to framework params.

Usage:
    python -m sndepth_tpu.cli.convert_weights \
        --depth rigid_depth_35000.pth --pose rigid_pose_35000.pth \
        --out converted/geonet
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="torch -> jax weight converter")
    p.add_argument("--depth", required=True, help="rigid_depth_*.pth")
    p.add_argument("--pose", required=True, help="rigid_pose_*.pth")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    args = p.parse_args(argv)

    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.utils.convert_weights import convert_geonet_checkpoint

    params = convert_geonet_checkpoint(args.depth, args.pose)
    path = ckpt_lib.save_checkpoint(args.out, params, 0)
    print(f"converted params -> {path}")


if __name__ == "__main__":
    main()
