"""CLI: single-image motion segmentation demo.

Reference: `/root/reference/predict_motion.py:13-34` — load one image + flow
png, run MotionFusionNet, save the class map blended over the input.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

CLASS_COLORS = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Motion segmentation demo")
    p.add_argument("image")
    p.add_argument("flow")
    p.add_argument("--ckpt_dir", default="checkpoints/motion")
    p.add_argument("--out", default="motion_pred.png")
    args = p.parse_args(argv)

    from PIL import Image
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.train import motion

    img = np.asarray(Image.open(args.image).convert("RGB"),
                     np.float32) / 255.0
    flow = np.asarray(Image.open(args.flow).convert("RGB"),
                      np.float32) / 255.0
    h, w = img.shape[:2]
    # Pad to a multiple of 16 for the ConvTranspose-16 head.
    ph, pw = -h % 16, -w % 16
    img_p = np.pad(img, ((0, ph), (0, pw), (0, 0)))
    flow_p = np.pad(flow, ((0, ph), (0, pw), (0, 0)))

    state = motion.init_motion_state(jax.random.PRNGKey(0), img_p.shape[0],
                                     img_p.shape[1])
    try:
        state = ckpt_lib.restore_checkpoint(args.ckpt_dir, state)
    except FileNotFoundError:
        print("warning: no checkpoint found, using random init")

    out = motion.make_eval_step()(state, {
        "image": img_p[None], "flow": flow_p[None],
        "label": np.zeros(img_p.shape[:2], np.int32)[None]})
    pred = np.asarray(out["pred"])[0, :h, :w]
    overlay = (0.5 * img * 255 + 0.5 * CLASS_COLORS[pred]).astype(np.uint8)
    Image.fromarray(overlay).save(args.out)
    classes, counts = np.unique(pred, return_counts=True)
    print(f"saved {args.out}; class histogram: "
          f"{dict(zip(classes.tolist(), counts.tolist()))}")


if __name__ == "__main__":
    main()
