"""CLI: MotionFusionNet mIoU evaluation (reference `evaluate.py` parity).

Computes per-batch 3-class mIoU over the val split and averages, matching
`/root/reference/evaluate.py:29-44` (nan batches skipped).
"""

from __future__ import annotations

import argparse
import math

import jax
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Motion segmentation eval")
    p.add_argument("--data_dir", default="data/imgs")
    p.add_argument("--ckpt_dir", default="checkpoints/motion")
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--metrics_json", default=None,
                   help="also dump the metrics as JSON (one object)")
    args = p.parse_args(argv)

    from sndepth_tpu.data.kitti_motion import KITTIMotionDataset
    from sndepth_tpu.data.kitti_sequence import batch_iterator
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.train import motion

    ds = KITTIMotionDataset(args.data_dir, train=False)
    sample = ds[0]
    h, w = sample["image"].shape[:2]
    state = motion.init_motion_state(jax.random.PRNGKey(0), h, w)
    state = ckpt_lib.restore_params_or_state(args.ckpt_dir, state)
    eval_fn = motion.make_eval_step()

    total, count = 0.0, 0
    for batch in batch_iterator(ds, args.batch_size, shuffle=False,
                                drop_last=False):
        out = jax.device_get(eval_fn(state, batch))
        miou = float(out["miou"])
        if not math.isnan(miou):
            total += miou
        count += 1
    miou_mean = total / max(count, 1)
    print(f"mIoU:{miou_mean}")
    if args.metrics_json:
        import json
        with open(args.metrics_json, "w") as f:
            json.dump({"miou": miou_mean}, f, indent=2)


if __name__ == "__main__":
    main()
