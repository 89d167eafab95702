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


# ---------------------------------------------------------------------------
# NNET (surface-normal net) — EfficientNet-B5 encoder + decoder (nyu.pt)
# ---------------------------------------------------------------------------

def _bn(sd: dict, prefix: str) -> tuple[dict, dict]:
    """timm BatchNorm -> (flax params, flax batch_stats)."""
    return ({"scale": np.asarray(sd[f"{prefix}.weight"]),
             "bias": np.asarray(sd[f"{prefix}.bias"])},
            {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])})


def _conv1x1_b(sd: dict, prefix: str) -> dict:
    return {"kernel": _conv_w(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _dw_w(t) -> np.ndarray:
    """torch depthwise (ch, 1, kh, kw) -> flax grouped kernel (kh, kw, 1, ch)."""
    return np.asarray(t).transpose(2, 3, 1, 0)


def convert_efficientnet(sd: dict, blocks=None) -> dict:
    """timm ``tf_efficientnet_b5_ap`` state_dict (keys ``conv_stem.*``,
    ``bn1.*``, ``blocks.{stage}.{i}.*``, ``conv_head.*``, ``bn2.*``; the
    reference strips the classifier, `submodules/encoder.py:10-13`) ->
    ``{"params": ..., "batch_stats": ...}`` for
    :class:`sndepth_tpu.models.efficientnet.EfficientNetEncoder`.

    timm block layouts: stage 0 is DepthwiseSeparableConv
    (conv_dw/bn1/se/conv_pw/bn2); stages 1+ are InvertedResidual
    (conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3).
    """
    from sndepth_tpu.models.efficientnet import b5_blocks
    blocks = blocks or b5_blocks()
    sd = _strip_module(sd)
    params: dict = {}
    stats: dict = {}

    params["Conv_0"] = {"kernel": _conv_w(sd["conv_stem.weight"])}
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "bn1")

    for si, spec in enumerate(blocks):
        for ri in range(spec.repeats):
            t = f"blocks.{si}.{ri}"
            name = f"stage{si}_block{ri}"
            p: dict = {}
            s: dict = {}
            se = {"Conv_0": _conv1x1_b(sd, f"{t}.se.conv_reduce"),
                  "Conv_1": _conv1x1_b(sd, f"{t}.se.conv_expand")}
            if spec.expand == 1:
                p["Conv_0"] = {"kernel": _dw_w(sd[f"{t}.conv_dw.weight"])}
                p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
                p["SqueezeExcite_0"] = se
                p["Conv_1"] = {"kernel": _conv_w(sd[f"{t}.conv_pw.weight"])}
                p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
            else:
                p["Conv_0"] = {"kernel": _conv_w(sd[f"{t}.conv_pw.weight"])}
                p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{t}.bn1")
                p["Conv_1"] = {"kernel": _dw_w(sd[f"{t}.conv_dw.weight"])}
                p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{t}.bn2")
                p["SqueezeExcite_0"] = se
                p["Conv_2"] = {"kernel": _conv_w(sd[f"{t}.conv_pwl.weight"])}
                p["BatchNorm_2"], s["BatchNorm_2"] = _bn(sd, f"{t}.bn3")
            params[name] = p
            stats[name] = s

    params["Conv_1"] = {"kernel": _conv_w(sd["conv_head.weight"])}
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "bn2")
    return {"params": params, "batch_stats": stats}


def _dense_from_conv1d(sd: dict, prefix: str) -> dict:
    """torch Conv1d(k=1) weight (out, in, 1) -> flax Dense (in, out)."""
    w = np.asarray(sd[f"{prefix}.weight"])[:, :, 0].T
    return {"kernel": w, "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_normal_decoder(sd: dict, architecture: str = "GN") -> dict:
    """Reference NNET decoder state_dict (`submodules/decoder.py:7-57`) ->
    ``{"params": ...}`` (+ ``batch_stats`` for the BN architecture) for
    :class:`sndepth_tpu.models.normal_decoder.NormalDecoder`."""
    sd = _strip_module(sd)
    params: dict = {}
    stats: dict = {}

    params["Conv_0"] = _conv1x1_b(sd, "conv2")

    for bi in range(4):
        t = f"up{bi + 1}._net"
        name = f"UpSampleBlock_{bi}"
        p: dict = {}
        s: dict = {}
        if architecture == "GN":
            # Sequential: 0 WSConv2d, 1 GroupNorm, 3 WSConv2d, 4 GroupNorm
            p["WSConv_0"] = _conv1x1_b(sd, f"{t}.0")
            p["GroupNorm_0"] = {"scale": np.asarray(sd[f"{t}.1.weight"]),
                                "bias": np.asarray(sd[f"{t}.1.bias"])}
            p["WSConv_1"] = _conv1x1_b(sd, f"{t}.3")
            p["GroupNorm_1"] = {"scale": np.asarray(sd[f"{t}.4.weight"]),
                                "bias": np.asarray(sd[f"{t}.4.bias"])}
        else:
            p["Conv_0"] = _conv1x1_b(sd, f"{t}.0")
            p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{t}.1")
            p["Conv_1"] = _conv1x1_b(sd, f"{t}.3")
            p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{t}.4")
        params[name] = p
        if s:
            stats[name] = s

    params["Conv_1"] = _conv1x1_b(sd, "out_conv_res8")
    for r in (4, 2, 1):
        t = f"out_conv_res{r}"
        params[t] = {f"Dense_{j}": _dense_from_conv1d(sd, f"{t}.{i}")
                     for j, i in enumerate((0, 2, 4, 6))}
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_nnet_checkpoint(path: str, architecture: str = "GN") -> dict:
    """Load the reference ``nyu.pt`` (keys ``encoder.original_model.*`` /
    ``decoder.*``, loaded with ``module.`` stripping like
    `baseline.py:288-299` + `utils_coders.py:61-71`) -> variable dicts for
    the encoder and decoder."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = _strip_module(sd)
    enc = {k[len("encoder.original_model."):]: v for k, v in sd.items()
           if k.startswith("encoder.original_model.")}
    dec = {k[len("decoder."):]: v for k, v in sd.items()
           if k.startswith("decoder.")}
    return {"encoder": convert_efficientnet(enc),
            "decoder": convert_normal_decoder(dec, architecture)}
