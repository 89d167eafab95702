"""CLI: surface-normal evaluation on NYUv2-format data.

Prints the reference's metric line (`utils/utils_coders.py:88-100`):
``mean median rmse 5 7.5 11.25 22.5 30``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="NYUv2 normal evaluation")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--pred_file", default=None,
                   help="precomputed normals .npy (N, H, W, 3); else run "
                        "the NNET decoder with (random or loaded) weights")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--log_file", default="normal_eval.txt")
    p.add_argument("--metrics_json", default=None,
                   help="also dump the metrics as JSON (one object)")
    args = p.parse_args(argv)

    from sndepth_tpu.data.nyu import NYUv2Dataset
    from sndepth_tpu.utils.metrics import (compute_normal_errors,
                                           normal_angular_errors)

    ds = NYUv2Dataset(args.data_dir, args.split, args.img_height,
                      args.img_width)

    if args.pred_file:
        preds = np.load(args.pred_file)
    else:
        from sndepth_tpu.models.efficientnet import EfficientNetEncoder
        from sndepth_tpu.models.normal_decoder import NormalDecoder
        from sndepth_tpu.models.nnet import bgr_preprocess
        from sndepth_tpu.train import checkpoint as ckpt_lib

        class _Net:
            def __init__(self):
                import flax.linen as nn

                class Full(nn.Module):
                    @nn.compact
                    def __call__(self, rgb):
                        feats = EfficientNetEncoder()(
                            bgr_preprocess(rgb) / 255.0)
                        outs, _, _ = NormalDecoder()(feats, mode="test")
                        return outs[-1][..., :3]

                self.model = Full()
                sample = jnp.zeros((1, args.img_height, args.img_width, 3))
                self.variables = self.model.init(jax.random.PRNGKey(0),
                                                 sample)
                if args.ckpt_dir:
                    # Converted nyu.pt layout ({"encoder": {...},
                    # "decoder": {...}}, cli/convert_weights nnet) grafted
                    # onto this module's variable tree.
                    v = self.variables
                    tpl = {
                        "encoder": {
                            "params":
                                v["params"]["EfficientNetEncoder_0"],
                            "batch_stats":
                                v["batch_stats"]["EfficientNetEncoder_0"],
                        },
                        "decoder": {
                            "params": v["params"]["NormalDecoder_0"]},
                    }
                    conv = ckpt_lib.restore_checkpoint(args.ckpt_dir, tpl)
                    self.variables = {
                        "params": {
                            "EfficientNetEncoder_0":
                                conv["encoder"]["params"],
                            "NormalDecoder_0": conv["decoder"]["params"],
                        },
                        "batch_stats": {
                            "EfficientNetEncoder_0":
                                conv["encoder"]["batch_stats"]},
                    }
                else:
                    print("warning: no checkpoint; random weights")
                self.run = jax.jit(
                    lambda v, x: self.model.apply(v, x))

        net = _Net()
        preds = np.stack([
            np.asarray(net.run(net.variables,
                               jnp.asarray(ds[i]["rgb"])[None]))[0]
            for i in range(len(ds))])

    all_errors = []
    for i in range(len(ds)):
        sample = ds[i]
        err = normal_angular_errors(preds[i], sample["normals"],
                                    mask=sample["mask"].ravel())
        all_errors.append(np.asarray(err))
    errors = np.concatenate(all_errors)
    metrics = {k: float(v) for k, v in
               compute_normal_errors(jnp.asarray(errors)).items()}

    line = ("%.3f %.3f %.3f %.3f %.3f %.3f %.3f %.3f" % (
        metrics["mean"], metrics["median"], metrics["rmse"],
        metrics["a1"], metrics["a2"], metrics["a3"], metrics["a4"],
        metrics["a5"]))
    print("mean median rmse 5 7.5 11.25 22.5 30")
    print(line)
    with open(args.log_file, "a") as f:
        f.write("mean median rmse 5 7.5 11.25 22.5 30\n%s\n\n" % line)
    if args.metrics_json:
        import json
        with open(args.metrics_json, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
