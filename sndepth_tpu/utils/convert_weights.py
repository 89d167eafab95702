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


def convert_flownet(sd: dict) -> dict:
    """torch FlowNet state_dict (`models/FlowNet.py:41-78`) -> flax param
    subtree for `models/flownet.py:FlowNet` (stage-2 ``flow_*.pth``
    checkpoints, saved by `baseline.py:1218-1232`)."""
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
    # flow heads: applied order flow4, flow3, flow2, flow1 -> Conv_0..3
    for flax_idx, torch_idx in enumerate((4, 3, 2, 1)):
        params[f"Conv_{flax_idx}"] = {
            "kernel": _conv_w(sd[f"flow{torch_idx}.weight"]),
            "bias": np.asarray(sd[f"flow{torch_idx}.bias"])}
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


def convert_geonet_checkpoint(depth_path: str, pose_path: str,
                              flow_path: str | None = None) -> dict:
    """Load the reference .pth set -> {"disp": ..., "pose": ...[, "flow"]}
    (stage-2 runs also save ``flow_<iter>.pth``, `baseline.py:1218-1232`)."""
    import torch
    ckpt_d = torch.load(depth_path, map_location="cpu")
    ckpt_p = torch.load(pose_path, map_location="cpu")
    sd_d = ckpt_d.get("disp_net_state_dict", ckpt_d)
    sd_p = ckpt_p.get("pose_net_state_dict", ckpt_p)
    out = {"disp": convert_dispnet(sd_d), "pose": convert_posenet(sd_p)}
    if flow_path is not None:
        ckpt_f = torch.load(flow_path, map_location="cpu")
        sd_f = ckpt_f.get("flow_net_state_dict", ckpt_f)
        out["flow"] = convert_flownet(sd_f)
    return out


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


# ---------------------------------------------------------------------------
# RAFT3D (`.pth`, `/root/reference/kitti_submission.py:196-197`)
# ---------------------------------------------------------------------------

def _convP(sd: dict, prefix: str) -> dict:
    """Conv2d with bias -> flax Conv params."""
    out = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _convert_basic_encoder(sd: dict, prefix: str = "fnet") -> dict:
    """RAFT BasicEncoder(norm='instance') (`blocks/extractor.py:119-200`):
    InstanceNorm2d(affine=False) carries no weights, so only convs map.
    Residual blocks: layer{1,2,3}.{0,1} -> _ResBlock_{0..5} in order;
    stride-2 blocks have a downsample Sequential(conv1x1, norm)."""
    p: dict = {"Conv_0": _convP(sd, f"{prefix}.conv1"),
               "Conv_1": _convP(sd, f"{prefix}.conv2")}
    bi = 0
    for layer in (1, 2, 3):
        for i in (0, 1):
            t = f"{prefix}.layer{layer}.{i}"
            blk = {"Conv_0": _convP(sd, f"{t}.conv1"),
                   "Conv_1": _convP(sd, f"{t}.conv2")}
            if f"{t}.downsample.0.weight" in sd:
                blk["Conv_2"] = _convP(sd, f"{t}.downsample.0")
            p[f"_ResBlock_{bi}"] = blk
            bi += 1
    return p


def _convert_fpn_context(sd: dict, prefix: str = "cnet"
                         ) -> tuple[dict, dict]:
    """torchvision ResNet-50 trunk + FPN tail (`blocks/resnet.py:15-53`)
    -> (params, batch_stats) for FPNContext. The unused reference
    ``norm1``/``norm2`` BNs and the classifier ``fc`` are skipped."""
    p: dict = {"Conv_0": {"kernel": _conv_w(sd[f"{prefix}.conv1.weight"])}}
    s: dict = {}
    p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{prefix}.bn1")
    bi = 0
    for layer, blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for i in range(blocks):
            t = f"{prefix}.layer{layer}.{i}"
            bp: dict = {}
            bs: dict = {}
            for ci in range(3):
                bp[f"Conv_{ci}"] = {
                    "kernel": _conv_w(sd[f"{t}.conv{ci + 1}.weight"])}
                bp[f"BatchNorm_{ci}"], bs[f"BatchNorm_{ci}"] = _bn(
                    sd, f"{t}.bn{ci + 1}")
            if f"{t}.downsample.0.weight" in sd:
                bp["Conv_3"] = {
                    "kernel": _conv_w(sd[f"{t}.downsample.0.weight"])}
                bp["BatchNorm_3"], bs["BatchNorm_3"] = _bn(
                    sd, f"{t}.downsample.1")
            p[f"_Bottleneck_{bi}"] = bp
            s[f"_Bottleneck_{bi}"] = bs
            bi += 1
    p["Conv_1"] = _convP(sd, f"{prefix}.uconv1")
    p["Conv_2"] = _convP(sd, f"{prefix}.uconv2")
    p["Conv_3"] = _convP(sd, f"{prefix}.uconv3")
    return p, s


def _convert_update_block(sd: dict, prefix: str = "update_block") -> dict:
    """BasicUpdateBlock (`raft3d.py:40-98`): corr/flow encoders, dual-
    dilation ConvGRU, ae/mask/delta/weight heads."""
    p: dict = {
        "Conv_0": _convP(sd, f"{prefix}.corr_enc.0"),
        "Conv_1": _convP(sd, f"{prefix}.corr_enc.2"),
        "Conv_2": _convP(sd, f"{prefix}.corr_enc.4"),
        "Conv_3": _convP(sd, f"{prefix}.flow_enc.0"),
        "Conv_4": _convP(sd, f"{prefix}.flow_enc.2"),
        "ConvGRU_0": {
            f"conv{g}_{i}": _convP(sd, f"{prefix}.gru.conv{g}{i}")
            for g in ("z", "r", "q") for i in (1, 2)},
    }
    for head in ("ae", "mask", "delta", "weight"):
        p[f"{head}_0"] = _convP(sd, f"{prefix}.{head}.0")
        p[f"{head}_1"] = _convP(sd, f"{prefix}.{head}.2")
    return p


def convert_raft3d(sd: dict) -> dict:
    """Reference RAFT3D state_dict (``module.`` prefixes from the
    DataParallel save at `kitti_submission.py:196-197` are stripped) ->
    {"params": ..., "batch_stats": ...} for
    :class:`sndepth_tpu.models.raft3d.RAFT3D`."""
    sd = _strip_module(sd)
    cnet_p, cnet_s = _convert_fpn_context(sd)
    params = {
        "BasicEncoder_0": _convert_basic_encoder(sd),
        "FPNContext_0": cnet_p,
        "Scan_RAFTIteration_0": {
            "BasicUpdateBlock_0": _convert_update_block(sd)},
    }
    return {"params": params, "batch_stats": {"FPNContext_0": cnet_s}}


def convert_raft3d_checkpoint(path: str) -> dict:
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return convert_raft3d(sd)


# ---------------------------------------------------------------------------
# MotionFusionNet (`best.pt`, `/root/reference/predict.py:19-22`)
# ---------------------------------------------------------------------------

def _cbn(sd: dict, conv_key: str, bn_key: str, p: dict, s: dict, idx: int,
         transpose: bool = False) -> None:
    w = np.asarray(sd[f"{conv_key}.weight"])
    if transpose:
        # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out)
        # with spatially flipped taps (verified exact for k=s=16).
        k = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    else:
        k = w.transpose(2, 3, 1, 0)
    name = ("ConvTranspose" if transpose else "Conv") + f"_{idx}"
    p[name] = {"kernel": k}
    if f"{conv_key}.bias" in sd:
        p[name]["bias"] = np.asarray(sd[f"{conv_key}.bias"])
    p[f"BatchNorm_{idx}"], s[f"BatchNorm_{idx}"] = _bn(sd, bn_key)


def _convert_residual_unit(sd: dict, t: str, spec) -> tuple[dict, dict]:
    """One reference ResNet1-4 unit (`build_unit.py`) -> ResidualUnit
    params. Layout per unit type:
    ResNet1/2: layer_1.{0,3,6} convs (+ layer_2.{0} projection);
    ResNet3/4: initial_conv/branch1/branch2/final_conv (+ down_conv)."""
    p: dict = {}
    s: dict = {}
    if spec.branch_dilations is None:
        for i, seq in enumerate((0, 3, 6)):
            _cbn(sd, f"{t}.layer_1.{seq}", f"{t}.layer_1.{seq + 1}", p, s, i)
        if spec.project:
            _cbn(sd, f"{t}.layer_2.0", f"{t}.layer_2.1", p, s, 3)
    else:
        _cbn(sd, f"{t}.initial_conv.0", f"{t}.initial_conv.1", p, s, 0)
        _cbn(sd, f"{t}.branch1.0", f"{t}.branch1.1", p, s, 1)
        _cbn(sd, f"{t}.branch2.0", f"{t}.branch2.1", p, s, 2)
        _cbn(sd, f"{t}.final_conv.0", f"{t}.final_conv.1", p, s, 3)
        if spec.project:
            _cbn(sd, f"{t}.down_conv.0", f"{t}.down_conv.1", p, s, 4)
    return p, s


def convert_motionfusion(sd: dict) -> dict:
    """Reference MotionFusionNet state_dict (`models/MotionFusionNet.py` +
    `MotionFeatureNet.py` + `SemanticFeatureNet.py`) -> variables for
    :class:`sndepth_tpu.models.motionseg.MotionFusionNet`."""
    from sndepth_tpu.models.motionseg import (FUSION_UNITS, MOTION_UNITS,
                                              SEMANTIC_UNITS)
    sd = _strip_module(sd)
    params: dict = {}
    stats: dict = {}

    mp: dict = {}
    ms: dict = {}
    _cbn(sd, "motionFeatureNet.layer1.0", "motionFeatureNet.layer1.1",
         mp, ms, 0)
    for i, spec in enumerate(MOTION_UNITS):
        up, us = _convert_residual_unit(
            sd, f"motionFeatureNet.layer3.{i}", spec)
        mp[f"ResidualUnit_{i}"] = up
        ms[f"ResidualUnit_{i}"] = us
    params["MotionFeatureNet_0"] = mp
    stats["MotionFeatureNet_0"] = ms

    sp: dict = {}
    ss: dict = {}
    _cbn(sd, "semanticFeatureNet.layer1.0", "semanticFeatureNet.layer1.1",
         sp, ss, 0)
    _cbn(sd, "semanticFeatureNet.layer1.3", "semanticFeatureNet.layer1.4",
         sp, ss, 1)
    for i, spec in enumerate(SEMANTIC_UNITS):
        up, us = _convert_residual_unit(
            sd, f"semanticFeatureNet.layer3.{i}", spec)
        sp[f"ResidualUnit_{i}"] = up
        ss[f"ResidualUnit_{i}"] = us
    params["SemanticFeatureNet_0"] = sp
    stats["SemanticFeatureNet_0"] = ss

    for i, spec in enumerate(FUSION_UNITS):
        up, us = _convert_residual_unit(sd, f"layer1.{i}", spec)
        params[f"ResidualUnit_{i}"] = up
        stats[f"ResidualUnit_{i}"] = us
    _cbn(sd, "layer2.0", "layer2.1", params, stats, 0)
    # layer3: ConvTranspose (no index clash: flax names it ConvTranspose_0)
    # followed by the output BatchNorm_1.
    p3: dict = {}
    s3: dict = {}
    _cbn(sd, "layer3.0", "layer3.1", p3, s3, 0, transpose=True)
    params["ConvTranspose_0"] = p3["ConvTranspose_0"]
    params["BatchNorm_1"], stats["BatchNorm_1"] = (
        p3["BatchNorm_0"], s3["BatchNorm_0"])
    return {"params": params, "batch_stats": stats}


def convert_motionfusion_checkpoint(path: str) -> dict:
    """Load the reference ``best.pt`` (a pickled module or a state_dict,
    `predict.py:19-22`) and convert."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return convert_motionfusion(sd)


# ---------------------------------------------------------------------------
# DINO ViT-S/16 (`/root/reference/models/image_f_extract.py:39-43`)
# ---------------------------------------------------------------------------

def _attn_from_qkv(sd: dict, prefix: str, heads: int) -> dict:
    """torch fused qkv (3*dim, dim) -> flax MultiHeadDotProductAttention
    {query,key,value,out} with kernels (in, heads, head_dim) /
    (heads, head_dim, out)."""
    w = np.asarray(sd[f"{prefix}.qkv.weight"])          # (3*dim, dim)
    b = np.asarray(sd[f"{prefix}.qkv.bias"])
    dim = w.shape[1]
    hd = dim // heads
    out: dict = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * dim:(i + 1) * dim]                   # (dim, dim)
        out[name] = {"kernel": wi.T.reshape(dim, heads, hd),
                     "bias": b[i * dim:(i + 1) * dim].reshape(heads, hd)}
    pw = np.asarray(sd[f"{prefix}.proj.weight"])        # (dim, dim)
    out["out"] = {"kernel": pw.T.reshape(heads, hd, dim),
                  "bias": np.asarray(sd[f"{prefix}.proj.bias"])}
    return out


def _ln(sd: dict, prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_dino_vit(sd: dict, depth: int = 12, heads: int = 6) -> dict:
    """DINO/timm ViT-S/16 state_dict (keys ``cls_token``, ``pos_embed``,
    ``patch_embed.proj.*``, ``blocks.{i}.{norm1,attn,norm2,mlp}``,
    ``norm.*``) -> params for :class:`sndepth_tpu.models.vit.ViT`."""
    sd = _strip_module(sd)
    params: dict = {
        "cls": np.asarray(sd["cls_token"]),
        "pos_embed": np.asarray(sd["pos_embed"]),
        "Conv_0": {"kernel": _conv_w(sd["patch_embed.proj.weight"]),
                   "bias": np.asarray(sd["patch_embed.proj.bias"])},
        "LayerNorm_0": _ln(sd, "norm"),
    }
    for i in range(depth):
        t = f"blocks.{i}"
        params[f"_Block_{i}"] = {
            "LayerNorm_0": _ln(sd, f"{t}.norm1"),
            "MultiHeadDotProductAttention_0": _attn_from_qkv(
                sd, f"{t}.attn", heads),
            "LayerNorm_1": _ln(sd, f"{t}.norm2"),
            "Dense_0": {"kernel": np.asarray(sd[f"{t}.mlp.fc1.weight"]).T,
                        "bias": np.asarray(sd[f"{t}.mlp.fc1.bias"])},
            "Dense_1": {"kernel": np.asarray(sd[f"{t}.mlp.fc2.weight"]).T,
                        "bias": np.asarray(sd[f"{t}.mlp.fc2.bias"])},
        }
    return params


def convert_dino_checkpoint(path: str) -> dict:
    """dino_deitsmall16 checkpoint -> {"net": <ViT params>} for
    :class:`MultiScaleImageFeatureExtractor` (its ViT submodule is named
    ``net``)."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt.get("teacher", ckpt))
    sd = {k[len("backbone."):] if k.startswith("backbone.") else k: v
          for k, v in sd.items()}
    return {"net": convert_dino_vit(sd)}


# ---------------------------------------------------------------------------
# AutoencoderKL (`/root/reference/models/AutoencoderKL.py:55-87`)
# ---------------------------------------------------------------------------

def _gn_(sd: dict, prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _conv_(sd: dict, prefix: str) -> dict:
    return {"kernel": _conv_w(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _resnet_block(sd: dict, t: str, has_shortcut: bool) -> dict:
    p = {"GroupNorm_0": _gn_(sd, f"{t}.norm1"),
         "Conv_0": _conv_(sd, f"{t}.conv1"),
         "GroupNorm_1": _gn_(sd, f"{t}.norm2"),
         "Conv_1": _conv_(sd, f"{t}.conv2")}
    if has_shortcut:
        p["Conv_2"] = _conv_(sd, f"{t}.nin_shortcut")
    return p


def _attn_block(sd: dict, t: str) -> dict:
    return {"GroupNorm_0": _gn_(sd, f"{t}.norm"),
            "Conv_0": _conv_(sd, f"{t}.q"),
            "Conv_1": _conv_(sd, f"{t}.k"),
            "Conv_2": _conv_(sd, f"{t}.v"),
            "Conv_3": _conv_(sd, f"{t}.proj_out")}


def convert_vae(sd: dict, config=None) -> dict:
    """LDM AutoencoderKL state_dict (keys ``encoder.*`` / ``decoder.*`` /
    ``quant_conv`` / ``post_quant_conv``; `submodules/vae/vae_model.py`) ->
    params for :class:`sndepth_tpu.models.vae.AutoencoderKL`."""
    from sndepth_tpu.models.vae import VAEConfig
    cfg = config or VAEConfig()
    sd = _strip_module(sd)
    nlv = len(cfg.ch_mult)

    enc: dict = {"Conv_0": _conv_(sd, "encoder.conv_in")}
    rb = 0
    dc = 1
    ch = cfg.base_ch
    for i, mult in enumerate(cfg.ch_mult):
        out_ch = cfg.base_ch * mult
        for j in range(cfg.num_res_blocks):
            enc[f"ResnetBlock_{rb}"] = _resnet_block(
                sd, f"encoder.down.{i}.block.{j}", ch != out_ch)
            ch = out_ch
            rb += 1
        if i != nlv - 1:
            enc[f"Conv_{dc}"] = _conv_(
                sd, f"encoder.down.{i}.downsample.conv")
            dc += 1
    enc[f"ResnetBlock_{rb}"] = _resnet_block(sd, "encoder.mid.block_1",
                                             False)
    enc["AttnBlock_0"] = _attn_block(sd, "encoder.mid.attn_1")
    enc[f"ResnetBlock_{rb + 1}"] = _resnet_block(sd, "encoder.mid.block_2",
                                                 False)
    enc["GroupNorm_0"] = _gn_(sd, "encoder.norm_out")
    enc[f"Conv_{dc}"] = _conv_(sd, "encoder.conv_out")

    dec: dict = {"Conv_0": _conv_(sd, "decoder.conv_in")}
    dec["ResnetBlock_0"] = _resnet_block(sd, "decoder.mid.block_1", False)
    dec["AttnBlock_0"] = _attn_block(sd, "decoder.mid.attn_1")
    dec["ResnetBlock_1"] = _resnet_block(sd, "decoder.mid.block_2", False)
    rb = 2
    dc = 1
    ch = cfg.base_ch * cfg.ch_mult[-1]
    for i in reversed(range(nlv)):
        out_ch = cfg.base_ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            dec[f"ResnetBlock_{rb}"] = _resnet_block(
                sd, f"decoder.up.{i}.block.{j}", ch != out_ch)
            ch = out_ch
            rb += 1
        if i != 0:
            dec[f"Conv_{dc}"] = _conv_(sd, f"decoder.up.{i}.upsample.conv")
            dc += 1
    dec["GroupNorm_0"] = _gn_(sd, "decoder.norm_out")
    dec[f"Conv_{dc}"] = _conv_(sd, "decoder.conv_out")

    return {"encoder": enc, "decoder": dec,
            "quant_conv": _conv_(sd, "quant_conv"),
            "post_quant_conv": _conv_(sd, "post_quant_conv")}


def convert_vae_checkpoint(path: str, config=None) -> dict:
    """Load the reference VAE ckpt (state_dict possibly nested under
    ``state_dict`` with ``first_stage_model.`` prefixes —
    `AutoencoderKL.py:55-87`) and convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    fs = {k[len("first_stage_model."):]: v for k, v in sd.items()
          if k.startswith("first_stage_model.")}
    return convert_vae(fs or sd, config)


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


# ---------------------------------------------------------------------------
# UniAD track model (`/root/reference/models/track_uniad.py` +
# `track_head.py` + `track_head_plugin/modules.py` +
# `register_module/transformer_modules/*`). Checkpoint layout is the mmcv
# module tree: img_backbone (caffe R101, frozen BN, DCNv2 stages 3-4),
# img_neck (FPN), pts_bbox_head (BEVFormer encoder/decoder + branch
# clones), query_interact (QIM), memory_bank, query_embedding,
# reference_points.
# ---------------------------------------------------------------------------


def _dense(sd: dict, prefix: str) -> dict:
    """torch Linear -> flax Dense (kernel = weight.T)."""
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _attn_from_inproj(sd: dict, prefix: str, heads: int) -> dict:
    """torch nn.MultiheadAttention (packed ``in_proj_weight``) -> flax
    MultiHeadDotProductAttention params."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])      # (3*dim, dim)
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    dim = w.shape[1]
    hd = dim // heads
    out: dict = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * dim:(i + 1) * dim]
        out[name] = {"kernel": wi.T.reshape(dim, heads, hd),
                     "bias": b[i * dim:(i + 1) * dim].reshape(heads, hd)}
    pw = np.asarray(sd[f"{prefix}.out_proj.weight"])
    out["out"] = {"kernel": pw.T.reshape(heads, hd, dim),
                  "bias": np.asarray(sd[f"{prefix}.out_proj.bias"])}
    return out


def _bn_affine(sd: dict, prefix: str, eps: float = 1e-5) -> dict:
    """Frozen (eval-mode) BatchNorm2d -> per-channel affine
    (`models/uniad_track.py:_ChannelAffine`): scale = gamma/sqrt(var+eps),
    bias = beta - mean*scale."""
    g = np.asarray(sd[f"{prefix}.weight"], np.float64)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float64)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float64)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float64)
    scale = g / np.sqrt(var + eps)
    return {"scale": scale.astype(np.float32),
            "bias": (beta - mean * scale).astype(np.float32)}


def _dcn_w(t) -> np.ndarray:
    """mmcv ModulatedDeformConv2d weight (out, in, kh, kw) ->
    DeformConv2d kernel (kh*kw, in, out) (row-major tap order matches the
    meshgrid('ij') base grid)."""
    w = np.asarray(t)
    co, ci, kh, kw = w.shape
    return w.transpose(2, 3, 1, 0).reshape(kh * kw, ci, co)


def convert_uniad_backbone(sd: dict, blocks=(3, 4, 23, 3),
                           stage_with_dcn=(False, False, True, True),
                           embed_dims: int = 256) -> dict:
    """``img_backbone.*`` + ``img_neck.*`` ->
    :class:`sndepth_tpu.models.uniad_track.ResNetFPN` params
    (caffe style, frozen-BN channel affine; `track_uniad.py:953-980`)."""
    p: dict = {"Conv_0": {"kernel": _conv_w(sd["img_backbone.conv1.weight"])},
               "_ChannelAffine_0": _bn_affine(sd, "img_backbone.bn1")}
    n = 0
    for si, nb in enumerate(blocks):
        for bi in range(nb):
            t = f"img_backbone.layer{si + 1}.{bi}"
            blk: dict = {"Conv_0": {
                "kernel": _conv_w(sd[f"{t}.conv1.weight"])}}
            ai = [_bn_affine(sd, f"{t}.bn1"), _bn_affine(sd, f"{t}.bn2"),
                  _bn_affine(sd, f"{t}.bn3")]
            if stage_with_dcn[si]:
                blk["DeformConv2d_0"] = {
                    "kernel": _dcn_w(sd[f"{t}.conv2.weight"]),
                    "conv_offset": {
                        "kernel": _conv_w(
                            sd[f"{t}.conv2.conv_offset.weight"]),
                        "bias": np.asarray(
                            sd[f"{t}.conv2.conv_offset.bias"])}}
                ci = 1
            else:
                blk["Conv_1"] = {"kernel": _conv_w(sd[f"{t}.conv2.weight"])}
                ci = 2
            blk[f"Conv_{ci}"] = {"kernel": _conv_w(sd[f"{t}.conv3.weight"])}
            if f"{t}.downsample.0.weight" in sd:
                blk[f"Conv_{ci + 1}"] = {
                    "kernel": _conv_w(sd[f"{t}.downsample.0.weight"])}
                ai.append(_bn_affine(sd, f"{t}.downsample.1"))
            for j, a in enumerate(ai):
                blk[f"_ChannelAffine_{j}"] = a
            p[f"_Bottleneck_{n}"] = blk
            n += 1
    # FPN: 3 laterals (c3..c5) then 3 output convs + 1 extra
    # (`track_uniad.py:967-975`: in [512,1024,2048], num_outs 4).
    for i in range(3):
        p[f"Conv_{i + 1}"] = {
            "kernel": _conv_w(sd[f"img_neck.lateral_convs.{i}.conv.weight"]),
            "bias": np.asarray(sd[f"img_neck.lateral_convs.{i}.conv.bias"])}
    for i in range(4):
        p[f"Conv_{i + 4}"] = {
            "kernel": _conv_w(sd[f"img_neck.fpn_convs.{i}.conv.weight"]),
            "bias": np.asarray(sd[f"img_neck.fpn_convs.{i}.conv.bias"])}
    return p


def _deform_attn(sd: dict, prefix: str, with_out: bool = True) -> dict:
    out = {"sampling_offsets": _dense(sd, f"{prefix}.sampling_offsets"),
           "attention_weights": _dense(sd, f"{prefix}.attention_weights"),
           "value_proj": _dense(sd, f"{prefix}.value_proj")}
    if with_out:
        out["output_proj"] = _dense(sd, f"{prefix}.output_proj")
    return out


def _branch(sd: dict, prefix: str, with_ln: bool) -> dict:
    """Sequential branch clone (`track_head.py:84-107`): cls interleaves
    LayerNorms (indices 0,1,3,4,6), reg/past-traj are 0,2,4."""
    if with_ln:
        return {"Dense_0": _dense(sd, f"{prefix}.0"),
                "LayerNorm_0": _ln(sd, f"{prefix}.1"),
                "Dense_1": _dense(sd, f"{prefix}.3"),
                "LayerNorm_1": _ln(sd, f"{prefix}.4"),
                "Dense_2": _dense(sd, f"{prefix}.6")}
    return {"Dense_0": _dense(sd, f"{prefix}.0"),
            "Dense_1": _dense(sd, f"{prefix}.2"),
            "Dense_2": _dense(sd, f"{prefix}.4")}


def convert_uniad_head(sd: dict, encoder_layers: int = 6,
                       decoder_layers: int = 6) -> dict:
    """``pts_bbox_head.*`` ->
    :class:`sndepth_tpu.models.track_head.BEVFormerTrackHead` params."""
    h = "pts_bbox_head"
    t = f"{h}.transformer"
    p: dict = {
        "bev_embedding": np.asarray(sd[f"{h}.bev_embedding.weight"]),
        "level_embeds": np.asarray(sd[f"{t}.level_embeds"]),
        "cams_embeds": np.asarray(sd[f"{t}.cams_embeds"]),
        "can_bus_mlp1": _dense(sd, f"{t}.can_bus_mlp.0"),
        "can_bus_mlp2": _dense(sd, f"{t}.can_bus_mlp.2"),
        "can_bus_norm": _ln(sd, f"{t}.can_bus_mlp.norm"),
    }
    enc: dict = {}
    for i in range(encoder_layers):
        q = f"{t}.encoder.layers.{i}"
        enc[f"TemporalSelfAttention_{i}"] = _deform_attn(
            sd, f"{q}.attentions.0")
        enc[f"SpatialCrossAttention_{i}"] = {
            "deformable_attention": _deform_attn(
                sd, f"{q}.attentions.1.deformable_attention",
                with_out=False),
            "output_proj": _dense(sd, f"{q}.attentions.1.output_proj")}
        enc[f"FFN_{i}"] = {"Dense_0": _dense(sd, f"{q}.ffns.0.layers.0.0"),
                           "Dense_1": _dense(sd, f"{q}.ffns.0.layers.1")}
        for j in range(3):
            enc[f"LayerNorm_{3 * i + j}"] = _ln(sd, f"{q}.norms.{j}")
    p["encoder"] = enc
    dec: dict = {}
    for i in range(decoder_layers):
        q = f"{t}.decoder.layers.{i}"
        dec[f"MultiHeadDotProductAttention_{i}"] = _attn_from_inproj(
            sd, f"{q}.attentions.0.attn", heads=8)
        dec[f"CustomMSDeformableAttention_{i}"] = _deform_attn(
            sd, f"{q}.attentions.1")
        dec[f"FFN_{i}"] = {"Dense_0": _dense(sd, f"{q}.ffns.0.layers.0.0"),
                           "Dense_1": _dense(sd, f"{q}.ffns.0.layers.1")}
        for j in range(3):
            dec[f"LayerNorm_{3 * i + j}"] = _ln(sd, f"{q}.norms.{j}")
    p["decoder"] = dec
    for i in range(decoder_layers):
        p[f"cls_branches_{i}"] = _branch(sd, f"{h}.cls_branches.{i}", True)
        p[f"reg_branches_{i}"] = _branch(sd, f"{h}.reg_branches.{i}", False)
        p[f"past_traj_branches_{i}"] = _branch(
            sd, f"{h}.past_traj_reg_branches.{i}", False)
    return p


def convert_uniad_memory_bank(sd: dict) -> dict:
    """``memory_bank.*`` -> :class:`~track_runtime.MemoryBank` params."""
    return {
        "save_proj": _dense(sd, "memory_bank.save_proj"),
        "temporal_attn": _attn_from_inproj(
            sd, "memory_bank.temporal_attn", heads=8),
        "temporal_fc1": _dense(sd, "memory_bank.temporal_fc1"),
        "temporal_fc2": _dense(sd, "memory_bank.temporal_fc2"),
        "temporal_norm1": _ln(sd, "memory_bank.temporal_norm1"),
        "temporal_norm2": _ln(sd, "memory_bank.temporal_norm2"),
    }


def convert_uniad_qim(sd: dict) -> dict:
    """``query_interact.*`` -> :class:`~track_runtime.QueryInteractionModule`
    params (update_query_pos=True layout)."""
    return {
        "MultiHeadDotProductAttention_0": _attn_from_inproj(
            sd, "query_interact.self_attn", heads=8),
        "Dense_0": _dense(sd, "query_interact.linear1"),
        "Dense_1": _dense(sd, "query_interact.linear2"),
        "LayerNorm_0": _ln(sd, "query_interact.norm1"),
        "LayerNorm_1": _ln(sd, "query_interact.norm2"),
        "pos_ffn1": _dense(sd, "query_interact.linear_pos1"),
        "pos_ffn2": _dense(sd, "query_interact.linear_pos2"),
        "pos_norm": _ln(sd, "query_interact.norm_pos"),
        "feat_ffn1": _dense(sd, "query_interact.linear_feat1"),
        "feat_ffn2": _dense(sd, "query_interact.linear_feat2"),
        "feat_norm": _ln(sd, "query_interact.norm_feat"),
    }


def convert_uniad(sd: dict, blocks=(3, 4, 23, 3),
                  stage_with_dcn=(False, False, True, True),
                  encoder_layers: int = 6, decoder_layers: int = 6) -> dict:
    """Full UniAD track checkpoint state_dict -> params for
    :class:`sndepth_tpu.models.uniad_track.UniADTrack` (built with
    ``uniad_reference_config()``: caffe backbone, frozen-BN affine).

    ``query_embedding`` keeps the reference's num_query+1 rows (the last
    is the ego query, `track_uniad.py:119`); our ``num_query`` counts it.
    Extra checkpoint keys (motion/occ/planner heads of full UniAD) are
    ignored."""
    sd = _strip_module(sd)
    p: dict = {
        "backbone": convert_uniad_backbone(sd, blocks, stage_with_dcn),
        "head": convert_uniad_head(sd, encoder_layers, decoder_layers),
        "query_embedding": np.asarray(sd["query_embedding.weight"]),
        "reference_points": _dense(sd, "reference_points"),
        "memory_bank": convert_uniad_memory_bank(sd),
        "qim": convert_uniad_qim(sd),
    }
    return p


def convert_uniad_checkpoint(path: str, **kw) -> dict:
    """Load a UniAD track ``.pth`` (state_dict possibly nested under
    ``state_dict``) and convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    return convert_uniad(sd, **kw)


# ---------------------------------------------------------------------------
# torchvision raft_large (`/root/reference/predict.py:8-9,24`)
# ---------------------------------------------------------------------------

def _tv_cna(sd: dict, prefix: str, norm: str | None
            ) -> tuple[dict, dict | None]:
    """torchvision Conv2dNormActivation -> (_TVConvNormAct params,
    batch_stats-or-None). Conv bias exists only when norm is None;
    InstanceNorm2d(affine=False) carries no parameters at all."""
    p: dict = {"conv": {"kernel": _conv_w(sd[f"{prefix}.0.weight"])}}
    stats = None
    if norm is None:
        p["conv"]["bias"] = np.asarray(sd[f"{prefix}.0.bias"])
    elif norm == "batch":
        p["norm"] = {"scale": np.asarray(sd[f"{prefix}.1.weight"]),
                     "bias": np.asarray(sd[f"{prefix}.1.bias"])}
        stats = {"norm": {"mean": np.asarray(sd[f"{prefix}.1.running_mean"]),
                          "var": np.asarray(sd[f"{prefix}.1.running_var"])}}
    return p, stats


def _tv_encoder(sd: dict, t: str, norm: str | None) -> tuple[dict, dict]:
    """torchvision FeatureEncoder subtree -> (params, batch_stats)."""
    p: dict = {}
    s: dict = {}

    def put(flax_name, torch_prefix):
        pp, ss = _tv_cna(sd, torch_prefix, norm)
        p[flax_name] = pp
        if ss:
            s[flax_name] = ss

    def put_block(flax_name, torch_prefix, has_down):
        blk_p: dict = {}
        blk_s: dict = {}
        for sub in ("convnormrelu1", "convnormrelu2") + (
                ("downsample",) if has_down else ()):
            pp, ss = _tv_cna(sd, f"{torch_prefix}.{sub}", norm)
            blk_p[sub] = pp
            if ss:
                blk_s[sub] = ss
        p[flax_name] = blk_p
        if blk_s:
            s[flax_name] = blk_s

    put("convnormrelu", f"{t}.convnormrelu")
    for lvl, first_has_down in ((1, False), (2, True), (3, True)):
        put_block(f"layer{lvl}_0", f"{t}.layer{lvl}.0", first_has_down)
        put_block(f"layer{lvl}_1", f"{t}.layer{lvl}.1", False)
    p["conv"] = {"kernel": _conv_w(sd[f"{t}.conv.weight"]),
                 "bias": np.asarray(sd[f"{t}.conv.bias"])}
    return p, s


def convert_raft2d_large(sd: dict) -> dict:
    """torchvision ``raft_large`` state_dict -> RAFT2DLarge variables
    (dict with ``params`` and ``batch_stats``)."""
    sd = _strip_module(sd)
    fe_p, _ = _tv_encoder(sd, "feature_encoder", "instance")
    ce_p, ce_s = _tv_encoder(sd, "context_encoder", "batch")

    def cna(prefix):
        return _tv_cna(sd, prefix, None)[0]

    def conv_b(prefix):
        return {"kernel": _conv_w(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    upd = {
        "motion_encoder": {
            "convcorr1": cna("update_block.motion_encoder.convcorr1"),
            "convcorr2": cna("update_block.motion_encoder.convcorr2"),
            "convflow1": cna("update_block.motion_encoder.convflow1"),
            "convflow2": cna("update_block.motion_encoder.convflow2"),
            "conv": cna("update_block.motion_encoder.conv"),
        },
        "convgru1": {
            k: conv_b(f"update_block.recurrent_block.convgru1.{k}")
            for k in ("convz", "convr", "convq")},
        "convgru2": {
            k: conv_b(f"update_block.recurrent_block.convgru2.{k}")
            for k in ("convz", "convr", "convq")},
        "flow_head_1": {"conv": conv_b("update_block.flow_head.conv1")},
        "flow_head_2": conv_b("update_block.flow_head.conv2"),
        "mask_conv1": {"conv": cna("mask_predictor.convrelu")["conv"]},
        "mask_conv2": conv_b("mask_predictor.conv"),
    }
    params = {"feature_encoder": fe_p, "context_encoder": ce_p,
              "update": upd}
    return {"params": params,
            "batch_stats": {"context_encoder": ce_s}}


def convert_raft2d_checkpoint(path: str) -> dict:
    """Load a torchvision raft_large ``.pth`` and convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return convert_raft2d_large(sd)
