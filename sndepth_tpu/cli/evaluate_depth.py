"""CLI: Eigen-style depth evaluation (reference `models/test_disp.py`
parity).

Runs DispNetS over test frames, zooms predictions to GT resolution, applies
the GT-median scaling + [min_depth, max_depth] clipping protocol, and prints
the 9-metric table in the reference's format (`test_disp.py:118-123`).

GT format: an ``.npz``/``.npy`` file with arrays ``gt_depths`` (list/array
of HxW depth maps) and optional ``masks``; predictions come either from a
GeoNet checkpoint run over ``--img_list`` images or a precomputed
``predictions.npy``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

ERROR_NAMES = ("abs_diff", "abs_rel", "sq_rel", "rms", "log_rms",
               "abs_log", "a1", "a2", "a3")


def predict_disparities(ckpt_dir: str | None, image_paths: list[str],
                        img_height: int, img_width: int) -> np.ndarray:
    from sndepth_tpu.core.config import GeoNetConfig
    from sndepth_tpu.data.kitti_sequence import EvalSequenceDataset
    from sndepth_tpu.models.dispnet import DispNetS
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.train import geonet

    config = GeoNetConfig(img_height=img_height, img_width=img_width,
                          compute_dtype=jnp.float32)
    state = geonet.create_train_state(config)
    if ckpt_dir:
        state = ckpt_lib.restore_params_or_state(ckpt_dir, state)
        params = jax.tree_util.tree_map(jnp.asarray, state.params
                                        if hasattr(state, "params")
                                        else state["params"])
    else:
        print("warning: no checkpoint; evaluating random weights")
        params = state.params

    net = DispNetS(dtype=jnp.float32)

    @jax.jit
    def run(params, img):
        disp = net.apply({"params": params["disp"]}, img)[0]
        return disp[..., 0]

    ds = EvalSequenceDataset(image_paths, img_width, img_height)
    disps = []
    for i in range(len(ds)):
        tgt = ds[i]["tgt"].astype(np.float32) / 255.0 * 2.0 - 1.0
        disps.append(np.asarray(run(params, jnp.asarray(tgt)[None]))[0])
    return np.stack(disps)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="KITTI Eigen depth evaluation")
    p.add_argument("--gt_file", required=True,
                   help=".npz with gt_depths (and optional masks)")
    p.add_argument("--pred_file", default=None,
                   help="precomputed disparities .npy (else run the net)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--img_list", default=None,
                   help="txt file of test image paths")
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--min_depth", default=1e-3, type=float)
    p.add_argument("--max_depth", default=80.0, type=float)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--metrics_json", default=None,
                   help="also dump the mean metrics as JSON (one object)")
    args = p.parse_args(argv)

    from scipy.ndimage import zoom
    from sndepth_tpu.utils.metrics import compute_depth_errors

    gt_data = np.load(args.gt_file, allow_pickle=True)
    gt_depths = gt_data["gt_depths"]
    masks = gt_data["masks"] if "masks" in gt_data else None

    if args.pred_file:
        pred_disps = np.load(args.pred_file)
    else:
        with open(args.img_list) as f:
            paths = [line.strip() for line in f if line.strip()]
        pred_disps = predict_disparities(args.ckpt_dir, paths,
                                         args.img_height, args.img_width)

    errors = []
    for i, gt in enumerate(gt_depths):
        gt = np.asarray(gt, np.float32)
        pred_depth = 1.0 / np.maximum(pred_disps[i], 1e-12)
        zoomed = zoom(pred_depth, (gt.shape[0] / pred_depth.shape[0],
                                   gt.shape[1] / pred_depth.shape[1]))
        zoomed = zoomed.clip(args.min_depth, args.max_depth)
        if masks is not None:
            m = np.asarray(masks[i], bool)
            gt_v, pred_v = gt[m], zoomed[m]
        else:
            valid = gt > args.min_depth
            gt_v, pred_v = gt[valid], zoomed[valid]
        scale = np.median(gt_v) / np.median(pred_v)
        e = compute_depth_errors(gt_v, pred_v * scale)
        errors.append([float(e[k]) for k in ERROR_NAMES])

    mean_errors = np.mean(errors, axis=0)
    print("Results with scale factor determined by GT/prediction ratio "
          "(like the original paper) : ")
    print(("{:>10}, " * 9).format(*ERROR_NAMES).rstrip(", "))
    print(("{:10.4f}, " * 9).format(*mean_errors).rstrip(", "))
    if args.metrics_json:
        import json
        with open(args.metrics_json, "w") as f:
            json.dump({k: float(v) for k, v in
                       zip(ERROR_NAMES, mean_errors)}, f, indent=2)

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        np.save(os.path.join(args.output_dir, "predictions.npy"),
                pred_disps)


if __name__ == "__main__":
    main()
