"""UniAD track weight-converter parity tests.

Strategy mirrors tests/test_convert_weights.py: build torch replicas whose
``state_dict()`` keys exactly match the reference module tree
(`/root/reference/models/track_uniad.py` + `track_head.py` +
`track_head_plugin/modules.py` + `register_module/transformer_modules/*`),
convert with ``convert_uniad*``, and check (a) the converted tree matches
the flax init tree path-for-path and shape-for-shape, and (b) replica and
flax outputs agree numerically on random inputs (frozen-BN eval mode, no
dropout) — including a hand-rolled DCNv2 oracle for the backbone stages
the reference configures with deformable convs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from sndepth_tpu.utils import convert_weights as cw

torch.manual_seed(0)


def _t2n(x):
    return np.asarray(x.detach().numpy())


# ---------------------------------------------------------------------------
# torch replicas (reference module names -> state_dict key parity)
# ---------------------------------------------------------------------------


class DCNv2Replica(tnn.Module):
    """mmcv ModulatedDeformConv2dPack: ``.weight`` + ``.conv_offset``
    producing 27 = 9*(dy,dx) interleaved + 9 mask channels."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(cout, cin, 3, 3) * 0.1)
        self.conv_offset = tnn.Conv2d(cin, 27, 3, stride=stride, padding=1)
        with torch.no_grad():
            self.conv_offset.weight *= 0.1
        self.stride = stride

    def forward(self, x):
        om = self.conv_offset(x)
        off, mask = om[:, :18], torch.sigmoid(om[:, 18:])
        b, cin, h, w = x.shape
        ho, wo = off.shape[2], off.shape[3]
        cols = []
        for k in range(9):
            r, c = divmod(k, 3)
            dy = off[:, 2 * k]
            dx = off[:, 2 * k + 1]
            iy = (torch.arange(ho).float()[None, :, None] * self.stride
                  + (r - 1) + dy)
            ix = (torch.arange(wo).float()[None, None, :] * self.stride
                  + (c - 1) + dx)
            # zero-pad bilinear gather
            y0 = torch.floor(iy)
            x0 = torch.floor(ix)
            wy = (iy - y0)[:, None]
            wx = (ix - x0)[:, None]

            def tap(yy, xx):
                inb = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))
                yc = yy.clamp(0, h - 1).long()
                xc = xx.clamp(0, w - 1).long()
                flat = x.reshape(b, cin, h * w)
                idx = (yc * w + xc).reshape(b, 1, -1).expand(-1, cin, -1)
                v = torch.gather(flat, 2, idx).reshape(b, cin, ho, wo)
                return v * inb[:, None].float()

            s = ((1 - wy) * (1 - wx) * tap(y0, x0)
                 + (1 - wy) * wx * tap(y0, x0 + 1)
                 + wy * (1 - wx) * tap(y0 + 1, x0)
                 + wy * wx * tap(y0 + 1, x0 + 1))
            cols.append(s * mask[:, k][:, None])
        out = torch.zeros(b, self.weight.shape[0], ho, wo)
        for k in range(9):
            r, c = divmod(k, 3)
            out = out + torch.einsum(
                "bchw,oc->bohw", cols[k], self.weight[:, :, r, c])
        return out


class BottleneckReplica(tnn.Module):
    """mmcv caffe-style Bottleneck, frozen (eval) BN."""

    def __init__(self, cin, width, stride, dcn=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        if dcn:
            self.conv2 = DCNv2Replica(width, width)
        else:
            self.conv2 = tnn.Conv2d(width, width, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, 4 * width, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(4 * width)
        if stride != 1 or cin != 4 * width:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, 4 * width, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(4 * width))
        else:
            self.downsample = None

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(sc + h)


class BackboneNeckReplica(tnn.Module):
    """img_backbone (R-tiny caffe) + img_neck (FPN, num_outs=4,
    relu_before_extra_convs)."""

    def __init__(self, blocks=(1, 1, 1, 1), dcn=(False, False, True, True),
                 embed=32):
        super().__init__()

        class Backbone(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                        bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                cin = 64
                for si, nb in enumerate(blocks):
                    width = (64, 128, 256, 512)[si]
                    layer = []
                    for bi in range(nb):
                        stride = 2 if (bi == 0 and si > 0) else 1
                        layer.append(BottleneckReplica(
                            cin, width, stride, dcn=dcn[si]))
                        cin = 4 * width
                    setattr(self, f"layer{si + 1}", tnn.Sequential(*layer))

            def forward(self, x):
                h = F.relu(self.bn1(self.conv1(x)))
                h = F.max_pool2d(h, 3, stride=2, padding=1)
                feats = []
                for i in range(4):
                    h = getattr(self, f"layer{i + 1}")(h)
                    feats.append(h)
                return feats

        class ConvModule(tnn.Module):
            def __init__(self, cin, cout, k, stride=1, pad=0):
                super().__init__()
                self.conv = tnn.Conv2d(cin, cout, k, stride=stride,
                                       padding=pad)

            def forward(self, x):
                return self.conv(x)

        class Neck(tnn.Module):
            def __init__(self):
                super().__init__()
                chans = [4 * w for w in (128, 256, 512)]
                self.lateral_convs = tnn.ModuleList(
                    [ConvModule(c, embed, 1) for c in chans])
                self.fpn_convs = tnn.ModuleList(
                    [ConvModule(embed, embed, 3, pad=1) for _ in range(3)]
                    + [ConvModule(embed, embed, 3, stride=2, pad=1)])

            def forward(self, feats):
                lats = [l(f) for l, f in
                        zip(self.lateral_convs, feats[1:])]
                for i in (1, 0):
                    lats[i] = lats[i] + F.interpolate(
                        lats[i + 1], size=lats[i].shape[-2:],
                        mode="nearest")
                outs = [self.fpn_convs[i](lats[i]) for i in range(3)]
                outs.append(self.fpn_convs[3](F.relu(outs[-1])))
                return outs

        self.img_backbone = Backbone()
        self.img_neck = Neck()

    def forward(self, x):
        return self.img_neck(self.img_backbone(x))


class QIMReplica(tnn.Module):
    """`modules.py:115-196` QueryInteractionModule, eval (no dropout),
    hidden_dim = embed_dims (`track_uniad.py:129-133`)."""

    def __init__(self, c):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(c, 8, dropout=0.0)
        self.linear1 = tnn.Linear(c, c)
        self.linear2 = tnn.Linear(c, c)
        self.norm1 = tnn.LayerNorm(c)
        self.norm2 = tnn.LayerNorm(c)
        self.linear_pos1 = tnn.Linear(c, c)
        self.linear_pos2 = tnn.Linear(c, c)
        self.norm_pos = tnn.LayerNorm(c)
        self.linear_feat1 = tnn.Linear(c, c)
        self.linear_feat2 = tnn.Linear(c, c)
        self.norm_feat = tnn.LayerNorm(c)

    def forward(self, query, out_embed):
        c = out_embed.shape[1]
        query_pos, query_feat = query[:, :c], query[:, c:]
        q = k = query_pos + out_embed
        tgt = out_embed
        tgt2 = self.self_attn(q[:, None], k[:, None], tgt[:, None])[0][:, 0]
        tgt = self.norm1(tgt + tgt2)
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        tgt = self.norm2(tgt + tgt2)
        pos2 = self.linear_pos2(F.relu(self.linear_pos1(tgt)))
        query_pos = self.norm_pos(query_pos + pos2)
        feat2 = self.linear_feat2(F.relu(self.linear_feat1(tgt)))
        query_feat = self.norm_feat(query_feat + feat2)
        return torch.cat([query_pos, query_feat], dim=1)


class MemoryBankReplica(tnn.Module):
    """`modules.py:7-92`, eval mode."""

    def __init__(self, c):
        super().__init__()
        self.save_proj = tnn.Linear(c, c)
        self.temporal_attn = tnn.MultiheadAttention(c, 8, dropout=0.0)
        self.temporal_fc1 = tnn.Linear(c, c)
        self.temporal_fc2 = tnn.Linear(c, c)
        self.temporal_norm1 = tnn.LayerNorm(c)
        self.temporal_norm2 = tnn.LayerNorm(c)

    def forward(self, emb, bank, pad_mask, scores, save_period,
                save_thresh=0.0):
        valid_idxes = pad_mask[:, -1] == 0
        e = emb[valid_idxes]
        if len(e) > 0:
            prev = bank[valid_idxes]
            e2 = self.temporal_attn(
                e[None], prev.transpose(0, 1), prev.transpose(0, 1),
                key_padding_mask=pad_mask[valid_idxes])[0][0]
            e = self.temporal_norm1(e + e2)
            e2 = self.temporal_fc2(F.relu(self.temporal_fc1(e)))
            e = self.temporal_norm2(e + e2)
            emb = emb.clone()
            emb[valid_idxes] = e
        saved_idxes = (save_period == 0) & (scores > save_thresh)
        save_period = save_period.clone()
        save_period[save_period > 0] -= 1
        save_period[saved_idxes] = 3
        saved = self.save_proj(emb[saved_idxes])
        bank = bank.clone()
        pad_mask = pad_mask.clone()
        bank[saved_idxes] = torch.cat(
            [bank[saved_idxes, 1:], saved[:, None]], dim=1)
        pad_mask[saved_idxes] = torch.cat(
            [pad_mask[saved_idxes, 1:],
             torch.zeros(int(saved_idxes.sum()), 1, dtype=torch.bool)],
            dim=1)
        return emb, bank, pad_mask, save_period


def _branch_replica(c, out, with_ln):
    if with_ln:
        return tnn.Sequential(
            tnn.Linear(c, 256), tnn.LayerNorm(256), tnn.ReLU(),
            tnn.Linear(256, 256), tnn.LayerNorm(256), tnn.ReLU(),
            tnn.Linear(256, out))
    return tnn.Sequential(
        tnn.Linear(c, 256), tnn.ReLU(),
        tnn.Linear(256, 256), tnn.ReLU(),
        tnn.Linear(256, out))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _randomize_bn(mod):
    """Non-trivial running stats so frozen-BN folding is actually tested."""
    g = torch.Generator().manual_seed(3)
    for m in mod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0, 0.2, generator=g)


def test_convert_uniad_backbone_parity():
    torch.manual_seed(1)
    rep = BackboneNeckReplica().eval()
    _randomize_bn(rep)
    sd = {k: v for k, v in rep.state_dict().items()}
    params = cw.convert_uniad_backbone(sd, blocks=(1, 1, 1, 1),
                                       embed_dims=32)

    from sndepth_tpu.models.uniad_track import ResNetFPN
    net = ResNetFPN(stage_blocks=(1, 1, 1, 1), embed_dims=32,
                    style="caffe", norm="affine")
    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = rep(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = net.apply({"params": params}, jnp.asarray(x))
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), _t2n(w).transpose(0, 2, 3, 1),
            rtol=1e-4, atol=2e-4)


def test_convert_uniad_qim_parity():
    torch.manual_seed(2)
    c, n = 32, 9
    rep = QIMReplica(c).eval()
    sd = {f"query_interact.{k}": v for k, v in rep.state_dict().items()}
    qim_params = cw.convert_uniad_qim(sd)

    rng = np.random.RandomState(1)
    query = rng.randn(n, 2 * c).astype(np.float32)
    emb = rng.randn(n, c).astype(np.float32)
    with torch.no_grad():
        want = rep(torch.from_numpy(query), torch.from_numpy(emb))

    from sndepth_tpu.models.track_runtime import (QueryInteractionModule,
                                                  empty_tracks)
    tracks = empty_tracks(n, c).replace(
        query=jnp.asarray(query), output_embedding=jnp.asarray(emb),
        obj_idxes=jnp.zeros((n,), jnp.int32))
    m = QueryInteractionModule(embed_dims=c, update_query_pos=True)
    out = m.apply({"params": qim_params}, tracks)
    np.testing.assert_allclose(np.asarray(out.query), _t2n(want),
                               rtol=1e-4, atol=1e-4)


def test_convert_uniad_memory_bank_parity():
    torch.manual_seed(4)
    c, n, mlen = 32, 7, 4
    rep = MemoryBankReplica(c).eval()
    sd = {f"memory_bank.{k}": v for k, v in rep.state_dict().items()}
    mb_params = cw.convert_uniad_memory_bank(sd)

    rng = np.random.RandomState(2)
    emb = rng.randn(n, c).astype(np.float32)
    bank = rng.randn(n, mlen, c).astype(np.float32)
    # slots 0-2 have full history, 3 empty, rest partial (newest invalid)
    pad = np.ones((n, mlen), bool)
    pad[:3] = False
    pad[4, :2] = False          # oldest two valid, newest invalid
    scores = rng.rand(n).astype(np.float32)
    period = np.zeros((n,), np.int64)
    period[1] = 2               # cooldown: no save
    with torch.no_grad():
        w_emb, w_bank, w_pad, w_per = rep(
            torch.from_numpy(emb), torch.from_numpy(bank),
            torch.from_numpy(pad), torch.from_numpy(scores),
            torch.from_numpy(period), save_thresh=0.3)

    from sndepth_tpu.models.track_runtime import MemoryBank, empty_tracks
    tracks = empty_tracks(n, c, mem_len=mlen).replace(
        output_embedding=jnp.asarray(emb), mem_bank=jnp.asarray(bank),
        mem_valid=jnp.asarray(~pad), scores=jnp.asarray(scores),
        save_period=jnp.asarray(period, jnp.int32))
    m = MemoryBank(embed_dims=c, mem_len=mlen, save_thresh=0.3)
    out = m.apply({"params": mb_params}, tracks)
    # reference valid slots (pad[:, -1]==0) get fused; ours identical.
    # NOTE: the reference fuses with the key_padding_mask over history;
    # ours masks attention by mem_valid — same thing.
    np.testing.assert_allclose(np.asarray(out.output_embedding),
                               _t2n(w_emb), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.mem_bank), _t2n(w_bank),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.mem_valid),
                                  ~_t2n(w_pad).astype(bool))
    np.testing.assert_array_equal(np.asarray(out.save_period),
                                  _t2n(w_per).astype(np.int32))


def test_convert_uniad_branches_parity():
    torch.manual_seed(5)
    c = 32
    cls = _branch_replica(c, 3, True).eval()
    reg = _branch_replica(c, 10, False).eval()
    sd = {}
    sd.update({f"pts_bbox_head.cls_branches.0.{k}": v
               for k, v in cls.state_dict().items()})
    sd.update({f"pts_bbox_head.reg_branches.0.{k}": v
               for k, v in reg.state_dict().items()})
    p_cls = cw._branch(sd, "pts_bbox_head.cls_branches.0", True)
    p_reg = cw._branch(sd, "pts_bbox_head.reg_branches.0", False)

    from sndepth_tpu.models.track_head import _Branch
    x = np.random.RandomState(3).randn(5, c).astype(np.float32)
    with torch.no_grad():
        want_cls = cls(torch.from_numpy(x))
        want_reg = reg(torch.from_numpy(x))
    got_cls = _Branch(3, use_ln=True).apply({"params": p_cls},
                                            jnp.asarray(x))
    got_reg = _Branch(10).apply({"params": p_reg}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_cls), _t2n(want_cls),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_reg), _t2n(want_reg),
                               rtol=1e-4, atol=1e-4)


def test_convert_uniad_mha_parity():
    """torch nn.MultiheadAttention -> flax MHDPA via _attn_from_inproj."""
    torch.manual_seed(6)
    c, n = 32, 6
    attn = tnn.MultiheadAttention(c, 8, dropout=0.0).eval()
    sd = {f"a.{k}": v for k, v in attn.state_dict().items()}
    params = cw._attn_from_inproj(sd, "a", heads=8)

    rng = np.random.RandomState(4)
    q = rng.randn(n, c).astype(np.float32)
    k = rng.randn(n, c).astype(np.float32)
    v = rng.randn(n, c).astype(np.float32)
    with torch.no_grad():
        want = attn(torch.from_numpy(q)[:, None],
                    torch.from_numpy(k)[:, None],
                    torch.from_numpy(v)[:, None])[0][:, 0]

    import flax.linen as nn
    m = nn.MultiHeadDotProductAttention(num_heads=8)
    got = m.apply({"params": params}, jnp.asarray(q)[None],
                  jnp.asarray(k)[None], jnp.asarray(v)[None])[0]
    np.testing.assert_allclose(np.asarray(got), _t2n(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_convert_uniad_full_tree_and_forward():
    """Full-model conversion: every path/shape in the converted tree must
    match the flax init tree, and one tracked frame must run finitely."""
    torch.manual_seed(7)
    c = 32

    sd = {}
    bb = BackboneNeckReplica().eval()
    _randomize_bn(bb)
    sd.update(bb.state_dict())

    # --- pts_bbox_head ---
    h = "pts_bbox_head"
    t = f"{h}.transformer"
    g = torch.Generator().manual_seed(8)

    def lin(prefix, cin, cout):
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, generator=g) * 0.1
        sd[f"{prefix}.bias"] = torch.randn(cout, generator=g) * 0.1

    def ln(prefix, dim):
        sd[f"{prefix}.weight"] = 1 + 0.1 * torch.randn(dim, generator=g)
        sd[f"{prefix}.bias"] = 0.1 * torch.randn(dim, generator=g)

    def mha(prefix, dim):
        sd[f"{prefix}.in_proj_weight"] = torch.randn(
            3 * dim, dim, generator=g) * 0.1
        sd[f"{prefix}.in_proj_bias"] = torch.randn(
            3 * dim, generator=g) * 0.1
        lin(f"{prefix}.out_proj", dim, dim)

    sd[f"{h}.bev_embedding.weight"] = torch.randn(16, c, generator=g)
    sd[f"{t}.level_embeds"] = torch.randn(4, c, generator=g)
    sd[f"{t}.cams_embeds"] = torch.randn(2, c, generator=g)
    lin(f"{t}.can_bus_mlp.0", 18, c // 2)
    lin(f"{t}.can_bus_mlp.2", c // 2, c)
    ln(f"{t}.can_bus_mlp.norm", c)
    for i in range(2):
        q = f"{t}.encoder.layers.{i}"
        lin(f"{q}.attentions.0.sampling_offsets", 2 * c, 64)
        lin(f"{q}.attentions.0.attention_weights", 2 * c, 32)
        lin(f"{q}.attentions.0.value_proj", c, c)
        lin(f"{q}.attentions.0.output_proj", c, c)
        d = f"{q}.attentions.1.deformable_attention"
        lin(f"{d}.sampling_offsets", c, 512)
        lin(f"{d}.attention_weights", c, 256)
        lin(f"{d}.value_proj", c, c)
        lin(f"{q}.attentions.1.output_proj", c, c)
        lin(f"{q}.ffns.0.layers.0.0", c, 512)
        lin(f"{q}.ffns.0.layers.1", 512, c)
        for j in range(3):
            ln(f"{q}.norms.{j}", c)
        q = f"{t}.decoder.layers.{i}"
        mha(f"{q}.attentions.0.attn", c)
        lin(f"{q}.attentions.1.sampling_offsets", c, 64)
        lin(f"{q}.attentions.1.attention_weights", c, 32)
        lin(f"{q}.attentions.1.value_proj", c, c)
        lin(f"{q}.attentions.1.output_proj", c, c)
        lin(f"{q}.ffns.0.layers.0.0", c, 512)
        lin(f"{q}.ffns.0.layers.1", 512, c)
        for j in range(3):
            ln(f"{q}.norms.{j}", c)
        for br, out, steps in (("cls_branches", 3, None),
                               ("reg_branches", 10, None),
                               ("past_traj_reg_branches", 16, None)):
            mod = _branch_replica(c, out, br == "cls_branches")
            sd.update({f"{h}.{br}.{i}.{k}": v
                       for k, v in mod.state_dict().items()})

    # --- top level + QIM + memory bank ---
    sd["query_embedding.weight"] = torch.randn(12, 2 * c, generator=g)
    lin("reference_points", c, 3)
    sd.update({f"query_interact.{k}": v
               for k, v in QIMReplica(c).state_dict().items()})
    sd.update({f"memory_bank.{k}": v
               for k, v in MemoryBankReplica(c).state_dict().items()})

    params = cw.convert_uniad(sd, blocks=(1, 1, 1, 1),
                              encoder_layers=2, decoder_layers=2)

    from sndepth_tpu.models.track_runtime import empty_tracks
    from sndepth_tpu.models.uniad_track import TrackState, UniADTrack
    model = UniADTrack(
        num_query=12, num_classes=3, embed_dims=c, bev_h=4, bev_w=4,
        num_cams=2, encoder_layers=2, decoder_layers=2,
        backbone_blocks=(1, 1, 1, 1), mem_len=4,
        backbone_style="caffe", backbone_norm="affine")
    imgs = jnp.asarray(
        np.random.RandomState(5).rand(2, 1, 64, 64, 3), jnp.float32)
    lidar2img = jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1))
    state = TrackState(
        prev_bev=jnp.zeros((1, 16, c)),
        tracks=empty_tracks(12, c, 3, 4),
        next_obj_id=jnp.zeros((), jnp.int32),
        timestamp=jnp.zeros(()), has_prev=jnp.zeros((), bool))
    ref = model.init(jax.random.PRNGKey(0), imgs, lidar2img, state)

    import flax
    want = flax.traverse_util.flatten_dict(ref["params"], sep="/")
    got = flax.traverse_util.flatten_dict(params, sep="/")
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converted tree missing: {missing[:10]}"
    assert not extra, f"converted tree extra: {extra[:10]}"
    for k in want:
        assert want[k].shape == np.asarray(got[k]).shape, \
            (k, want[k].shape, np.asarray(got[k]).shape)

    new_state, results = model.apply({"params": params}, imgs, lidar2img,
                                     state)
    assert np.isfinite(np.asarray(results["scores"])).all()
    assert np.isfinite(np.asarray(new_state.prev_bev)).all()
