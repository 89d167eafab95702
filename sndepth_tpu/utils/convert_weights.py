"""Convert reference PyTorch checkpoints into this framework's params.

Covers the GeoNet pair the reference saves
(`/root/reference/models/baseline.py:1218-1232`): ``rigid_depth_*.pth``
(DispNetS state_dict under ``disp_net_state_dict``) and ``rigid_pose_*.pth``
(PoseNet under ``pose_net_state_dict``). ``module.`` DataParallel prefixes
are stripped like `utils_coders.py:61-71`.

Layout mapping (torch NCHW -> flax NHWC):
* Conv2d weight (out, in, kh, kw)          -> kernel (kh, kw, in, out)
* ConvTranspose2d weight (in, out, kh, kw) -> kernel (kh, kw, in, out);
  the flax-side :class:`TorchConvTranspose2x` flips taps at apply time, so
  the converted layout is a plain transpose and the composition is
  numerically exact (verified to 2e-15 in f64).

``convert_geonet_checkpoint`` returns the params dict used by
`sndepth_tpu.train.geonet`.
"""

from __future__ import annotations

import numpy as np


def _strip_module(sd: dict) -> dict:
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


def _convT_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 0, 1)   # (kh, kw, in, out)


def convert_dispnet(sd: dict) -> dict:
    """torch DispNetS state_dict -> flax param subtree."""
    sd = _strip_module(sd)
    params: dict = {}
    for i in range(7):
        params[f"_DownBlock_{i}"] = {
            "Conv_0": {"kernel": _conv_w(sd[f"conv{i + 1}.0.weight"]),
                       "bias": np.asarray(sd[f"conv{i + 1}.0.bias"])},
            "Conv_1": {"kernel": _conv_w(sd[f"conv{i + 1}.2.weight"]),
                       "bias": np.asarray(sd[f"conv{i + 1}.2.bias"])},
        }
    for i in range(7):
        torch_idx = 7 - i       # upconv7 is the first applied
        params[f"_UpConv_{i}"] = {"TorchConvTranspose2x_0": {
            "kernel": _convT_w(sd[f"upconv{torch_idx}.0.weight"]),
            "bias": np.asarray(sd[f"upconv{torch_idx}.0.bias"])}}
        params[f"_IConv_{i}"] = {"Conv_0": {
            "kernel": _conv_w(sd[f"iconv{torch_idx}.0.weight"]),
            "bias": np.asarray(sd[f"iconv{torch_idx}.0.bias"])}}
    # disp heads: applied order disp4, disp3, disp2, disp1 -> Conv_0..3
    for flax_idx, torch_idx in enumerate((4, 3, 2, 1)):
        params[f"Conv_{flax_idx}"] = {
            "kernel": _conv_w(sd[f"predict_disp{torch_idx}.0.weight"]),
            "bias": np.asarray(sd[f"predict_disp{torch_idx}.0.bias"])}
    return params


def convert_posenet(sd: dict) -> dict:
    sd = _strip_module(sd)
    params: dict = {}
    for i in range(7):
        params[f"Conv_{i}"] = {
            "kernel": _conv_w(sd[f"conv{i + 1}.0.weight"]),
            "bias": np.asarray(sd[f"conv{i + 1}.0.bias"])}
    params["Conv_7"] = {"kernel": _conv_w(sd["pred_poses.weight"]),
                        "bias": np.asarray(sd["pred_poses.bias"])}
    return params


def convert_geonet_checkpoint(depth_path: str, pose_path: str) -> dict:
    """Load the reference .pth pair -> {"disp": ..., "pose": ...}."""
    import torch
    ckpt_d = torch.load(depth_path, map_location="cpu")
    ckpt_p = torch.load(pose_path, map_location="cpu")
    sd_d = ckpt_d.get("disp_net_state_dict", ckpt_d)
    sd_p = ckpt_p.get("pose_net_state_dict", ckpt_p)
    return {"disp": convert_dispnet(sd_d), "pose": convert_posenet(sd_p)}


def verify_posenet_parity(torch_model, flax_params, h=64, w=96,
                          num_source=2) -> float:
    """Max abs deviation between torch and flax PoseNet on random input."""
    import torch
    import jax.numpy as jnp
    from sndepth_tpu.models.posenet import PoseNet

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3 * (1 + num_source), h, w).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).numpy()
    net = PoseNet(num_source=num_source, dtype=jnp.float32)
    got = np.asarray(net.apply({"params": flax_params},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    return float(np.abs(got - want).max())
