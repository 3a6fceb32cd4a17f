"""Import reference PyTorch weights into sodt_tpu param pytrees.

The reference checkpoints pickle whole nn.Modules (Train.py:531-532), whose
state_dicts use the module names of /root/reference/basics/models/*.py. This
maps those names onto our flax trees so reference-trained weights can be
evaluated here (parity checks, BASELINE.md bit-comparability).

Layout rules:
  torch Linear  (out, in)        -> Dense kernel (in, out)          [transpose]
  torch Conv2d  (out, in, kh, kw)-> Conv kernel (kh, kw, in, out)
  torch LayerNorm weight/bias    -> scale/bias
  torch BatchNorm w/b/mean/var   -> params.scale/bias + batch_stats.mean/var
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _lin(w):
    return np.asarray(w).T


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def set_in(tree: dict, path: list[str], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value if isinstance(value, dict) else np.asarray(value)


def import_image_encoder(state_dict: dict[str, Any], mono: bool = False):
    """Reference ImageEncoderViT state_dict -> params for our
    models.backbone.ImageEncoderViT (name mapping documented inline).
    mono=True maps the backbone_vit_mono variant (no channel attention)."""
    params: dict = {}
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}

    def put(path, value):
        set_in(params, path.split("/"), value)

    if not mono:
        for ch in ("r", "g", "b", "i"):
            put(f"channel_embed_{ch}/proj/kernel",
                _conv(sd[f"channel_embed_{ch}.proj.weight"]))
            put(f"channel_embed_{ch}/proj/bias",
                sd[f"channel_embed_{ch}.proj.bias"])

        for i in range(1, 5):
            put(f"chan_block/norm{i}/scale", sd[f"chan_block.norm{i}.weight"])
            put(f"chan_block/norm{i}/bias", sd[f"chan_block.norm{i}.bias"])

    put("patch_embed/proj/kernel", _conv(sd["patch_embed.proj.weight"]))
    put("patch_embed/proj/bias", sd["patch_embed.proj.bias"])
    if "pos_embed" in sd:
        put("pos_embed", sd["pos_embed"])

    def swin_block(src: str, dst: str, conv_mlp: bool):
        put(f"{dst}/norm1/scale", sd[f"{src}.norm1.weight"])
        put(f"{dst}/norm1/bias", sd[f"{src}.norm1.bias"])
        put(f"{dst}/norm2/scale", sd[f"{src}.norm2.weight"])
        put(f"{dst}/norm2/bias", sd[f"{src}.norm2.bias"])
        put(f"{dst}/attn/relative_position_bias_table",
            sd[f"{src}.attn.relative_position_bias_table"])
        put(f"{dst}/attn/qkv/kernel", _lin(sd[f"{src}.attn.qkv.weight"]))
        put(f"{dst}/attn/qkv/bias", sd[f"{src}.attn.qkv.bias"])
        put(f"{dst}/attn/proj/kernel", _lin(sd[f"{src}.attn.proj.weight"]))
        put(f"{dst}/attn/proj/bias", sd[f"{src}.attn.proj.bias"])
        put(f"{dst}/mlp/fc1/kernel", _lin(sd[f"{src}.mlp.fc1.weight"]))
        put(f"{dst}/mlp/fc1/bias", sd[f"{src}.mlp.fc1.bias"])
        put(f"{dst}/mlp/fc2/kernel", _lin(sd[f"{src}.mlp.fc2.weight"]))
        put(f"{dst}/mlp/fc2/bias", sd[f"{src}.mlp.fc2.bias"])
        if conv_mlp:
            put(f"{dst}/mlp/conv1/kernel", _conv(sd[f"{src}.mlp.conv1.weight"]))
            put(f"{dst}/mlp/conv1/bias", sd[f"{src}.mlp.conv1.bias"])

    shifts = (0, 2, 0, 2, 0, 2)
    for i in range(6):
        swin_block(f"stage1.{i}", f"stage1_{i}", conv_mlp=shifts[i] != 0)
    for i in range(4):
        swin_block(f"stage2.{i}", f"stage2_{i}", conv_mlp=shifts[i] != 0)
    swin_block("stage3.0", "stage3_0", conv_mlp=False)

    for pm in ("pmerging1", "pmerging2"):
        put(f"{pm}/reduction/kernel", _lin(sd[f"{pm}.reduction.weight"]))
        put(f"{pm}/norm/scale", sd[f"{pm}.norm.weight"])
        put(f"{pm}/norm/bias", sd[f"{pm}.norm.bias"])

    for neck in ("neck1", "neck2", "neck3"):
        put(f"{neck}/kernel", _conv(sd[f"{neck}.weight"]))

    return params


def import_conv_bn(sd: dict, src: str, params: dict, stats: dict, dst: str):
    """Reference `Conv` (conv+bn) -> our ConvBnAct params + batch_stats."""
    set_in(params, f"{dst}/conv/kernel".split("/"), _conv(sd[f"{src}.conv.weight"]))
    set_in(params, f"{dst}/bn/scale".split("/"), sd[f"{src}.bn.weight"])
    set_in(params, f"{dst}/bn/bias".split("/"), sd[f"{src}.bn.bias"])
    set_in(stats, f"{dst}/bn/mean".split("/"), sd[f"{src}.bn.running_mean"])
    set_in(stats, f"{dst}/bn/var".split("/"), sd[f"{src}.bn.running_var"])


def _import_c3(sd, src, params, stats, dst, n_bottleneck):
    for cv in ("cv1", "cv2", "cv3"):
        p, s = {}, {}
        import_conv_bn(sd, f"{src}.{cv}", p, s, cv)
        set_in(params, [dst, cv], p[cv])
        set_in(stats, [dst, cv], s[cv])
    for i in range(n_bottleneck):
        for cv in ("cv1", "cv2"):
            p, s = {}, {}
            import_conv_bn(sd, f"{src}.m.{i}.{cv}", p, s, cv)
            set_in(params, [dst, f"m{i}", cv], p[cv])
            set_in(stats, [dst, f"m{i}", cv], s[cv])


def import_flagship_model(state_dict: dict[str, Any], spec):
    """Full reference Model (split mode) -> our DetectionModel variables.

    Reference layout: image_encoder.* (ImageEncoderViT), detect.{k}.* for
    head layers (nn.Sequential indices), detect.{last}.m.{i} for the Detect
    convs. Our names: l0 (encoder), l{3+k} head layers, detect.m{i}.
    """
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}
    enc_sd = {k[len("image_encoder."):]: v for k, v in sd.items()
              if k.startswith("image_encoder.")}
    params: dict = {"l0": import_image_encoder(enc_sd)}
    stats: dict = {}

    for ld in spec.head:
        if ld.name == "Detect":
            na = len(spec.anchors[0]) // 2
            k = ld.i - 3
            for mi in range(len(spec.detect_from)):
                w = sd[f"detect.{k}.m.{mi}.weight"]
                b = sd[f"detect.{k}.m.{mi}.bias"]
                set_in(params, ["detect", f"m{mi}", "kernel"], _conv(w))
                set_in(params, ["detect", f"m{mi}", "bias"], b)
            continue
        src = f"detect.{ld.i - 3}"
        dst = f"l{ld.i}"
        if ld.name == "Conv":
            import_conv_bn(sd, src, params, stats, dst)
        elif ld.name == "C3":
            _import_c3(sd, src, params, stats, dst, ld.args[1])
        # Upsample / Concat carry no parameters
    return {"params": params, "batch_stats": stats}


def _import_spp(sd, src, params, stats, dst):
    for cv in ("cv1", "cv2"):
        p, s = {}, {}
        import_conv_bn(sd, f"{src}.{cv}", p, s, cv)
        set_in(params, [dst, cv], p[cv])
        set_in(stats, [dst, cv], s[cv])


def import_unified_model(state_dict: dict[str, Any], spec,
                         src_prefix: str = "model."):
    """Generic reference CNN Model (unified backbone+head graph, e.g.
    SRyolo_PF / yolo5m) -> our DetectionModel variables.

    Reference layout: `model.{i}.*` per parse_model index (model.py:350+);
    ours: `l{i}` with identical submodule names (cv1/cv2/m{k}/conv/bn) and
    `detect.m{k}` for the Detect convs. Depth-scaled repeat counts come
    from LayerDef.n (already resolved by the compiler)."""
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    for ld in (*spec.backbone, *spec.head):
        src = f"{src_prefix}{ld.i}"
        dst = f"l{ld.i}"
        if ld.name == "Conv":
            import_conv_bn(sd, src, params, stats, dst)
        elif ld.name == "Focus":
            p, s = {}, {}
            import_conv_bn(sd, f"{src}.conv", p, s, "conv")
            set_in(params, [dst, "conv"], p["conv"])
            set_in(stats, [dst, "conv"], s["conv"])
        elif ld.name == "C3":
            # depth-scaled bottleneck count lives in args[1] (the compiler
            # folds the yaml 'number' column into the ctor args; ld.n is
            # the module repeat count, always 1 for C3)
            _import_c3(sd, src, params, stats, dst, ld.args[1])
        elif ld.name == "SPP":
            _import_spp(sd, src, params, stats, dst)
        elif ld.name == "Detect":
            for mi in range(len(spec.detect_from)):
                set_in(params, ["detect", f"m{mi}", "kernel"],
                       _conv(sd[f"{src}.m.{mi}.weight"]))
                set_in(params, ["detect", f"m{mi}", "bias"],
                       sd[f"{src}.m.{mi}.bias"])
        elif ld.name in ("Upsample", "Concat"):
            continue  # parameter-free
        else:
            raise NotImplementedError(
                f"no importer for module {ld.name} (layer {ld.i})")
    return {"params": params, "batch_stats": stats}


def import_swinv2_encoder(state_dict: dict[str, Any]):
    """Reference backbone_swinv2 ImageEncoderViT -> our ImageEncoderSwinV2
    params. Layers: channel embeds (24d), chan_block norms, 1x1 patch embed,
    4 BasicLayers of V2 blocks (logit_scale, cpb_mlp, split q/v bias,
    post-norms), PatchMerging downsamples, necks."""
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}
    params: dict = {}

    def put(path, value):
        set_in(params, path.split("/"), value)

    for ch in ("r", "g", "b", "i"):
        put(f"channel_embed_{ch}/proj/kernel",
            _conv(sd[f"channel_embed_{ch}.proj.weight"]))
        put(f"channel_embed_{ch}/proj/bias",
            sd[f"channel_embed_{ch}.proj.bias"])
    for i in range(1, 5):
        put(f"chan_block/norm{i}/scale", sd[f"chan_block.norm{i}.weight"])
        put(f"chan_block/norm{i}/bias", sd[f"chan_block.norm{i}.bias"])
    put("patch_embed/proj/kernel", _conv(sd["patch_embed.proj.weight"]))
    put("patch_embed/proj/bias", sd["patch_embed.proj.bias"])

    depths = (2, 2, 6, 2)
    for li, depth in enumerate(depths):
        for bi in range(depth):
            src = f"layers.{li}.blocks.{bi}"
            dst = f"layer{li}_blk{bi}"
            put(f"{dst}/norm1/scale", sd[f"{src}.norm1.weight"])
            put(f"{dst}/norm1/bias", sd[f"{src}.norm1.bias"])
            put(f"{dst}/norm2/scale", sd[f"{src}.norm2.weight"])
            put(f"{dst}/norm2/bias", sd[f"{src}.norm2.bias"])
            put(f"{dst}/attn/logit_scale", sd[f"{src}.attn.logit_scale"])
            put(f"{dst}/attn/cpb_mlp0/kernel",
                _lin(sd[f"{src}.attn.cpb_mlp.0.weight"]))
            put(f"{dst}/attn/cpb_mlp0/bias",
                sd[f"{src}.attn.cpb_mlp.0.bias"])
            put(f"{dst}/attn/cpb_mlp1/kernel",
                _lin(sd[f"{src}.attn.cpb_mlp.2.weight"]))
            put(f"{dst}/attn/qkv/kernel", _lin(sd[f"{src}.attn.qkv.weight"]))
            put(f"{dst}/attn/q_bias", sd[f"{src}.attn.q_bias"])
            put(f"{dst}/attn/v_bias", sd[f"{src}.attn.v_bias"])
            put(f"{dst}/attn/proj/kernel",
                _lin(sd[f"{src}.attn.proj.weight"]))
            put(f"{dst}/attn/proj/bias", sd[f"{src}.attn.proj.bias"])
            put(f"{dst}/mlp_fc1/kernel", _lin(sd[f"{src}.mlp.fc1.weight"]))
            put(f"{dst}/mlp_fc1/bias", sd[f"{src}.mlp.fc1.bias"])
            put(f"{dst}/mlp_fc2/kernel", _lin(sd[f"{src}.mlp.fc2.weight"]))
            put(f"{dst}/mlp_fc2/bias", sd[f"{src}.mlp.fc2.bias"])
        if li < len(depths) - 1:
            src = f"layers.{li}.downsample"
            put(f"downsample{li}/reduction/kernel",
                _lin(sd[f"{src}.reduction.weight"]))
            put(f"downsample{li}/norm/scale", sd[f"{src}.norm.weight"])
            put(f"downsample{li}/norm/bias", sd[f"{src}.norm.bias"])

    for neck in ("neck1", "neck2", "neck3"):
        put(f"{neck}/kernel", _conv(sd[f"{neck}.weight"]))
    return params
