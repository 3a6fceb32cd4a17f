"""YAML model compiler: config -> static layer graph -> flax model.

Replaces the reference `parse_model` (/root/reference/basics/models/
model.py:350-435) with an explicit registry (the reference resolves module
names with `eval()`; SURVEY.md §5.6 flags that as a rebuild fix). The same
YAML surface is kept: `nc`, `depth_multiple`, `width_multiple`, `anchors`,
optional `steam`, `backbone`, `head` lists of [from, number, module, args],
plus SR taps l1/l2/c1/c2.

Two graph modes cover the reference's config families:

  * split  — backbone is a single `ImageEncoderViT` entry producing
    [P3, P4, P5]; head `from` indices address y = [P3, P4, P5, head...]
    and head channels seed (out_chans, out_chans, 2*out_chans)
    (reference model.py:367-370,422-423). Used by model.yaml /
    SRyolo_resnet50.yaml.
  * unified — classic YOLOv5 walk over backbone+head as one layer list;
    `from` indices address layer outputs directly. Used by yolo5m.yaml,
    SRyolo_MF.yaml, SRyolo_PF.yaml. (In the reference these CNN configs are
    a SuperYOLO inheritance that its current split-parse cannot actually
    run — see SURVEY.md §2.2; we implement their intended semantics.)

Channel arithmetic matches parse_model: width multiple + make_divisible(8)
on conv-family outputs, depth multiple on repeat counts, Concat summing,
Detect collecting input channels. Strides are tracked statically through
the graph so Detect needs no dummy forward (the reference hardcodes
stride [4.] for the ViT config, model.py:130 — split mode reproduces that).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import yaml

from . import layers as L
from .backbone import ImageEncoderViT
from .swinv2 import ImageEncoderSwinV2

# modules whose first arg is the output channel count and take width scaling
_CONV_FAMILY = {
    "Conv", "Bottleneck", "SPP", "DWConv", "MixConv2d", "Focus", "CrossConv",
    "BottleneckCSP", "BottleneckCSP2", "SPPCSP", "C3", "AttentionModel",
    "GhostConv", "GhostBottleneck", "ACmix",
}
# modules that consume a list of inputs
MULTI_INPUT = {"Concat", "MF", "Detect"}


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


@dataclass(frozen=True)
class LayerDef:
    i: int                 # index of this layer's output in y
    f: tuple[int, ...]     # resolved absolute input indices into y
    name: str              # registry key
    args: tuple            # resolved constructor args
    n: int                 # resolved repeat count
    c2: int                # output channels
    stride: float          # output stride relative to network input


@dataclass(frozen=True)
class ModelSpec:
    mode: str                       # "split" | "unified"
    nc: int
    anchors: tuple                  # per-level flat (w,h,...) tuples
    backbone: tuple                 # LayerDefs (split: the single encoder)
    head: tuple                     # LayerDefs, Detect last
    steam: tuple                    # LayerDefs for RGB+IR+fusion stem
    detect_from: tuple              # y indices feeding Detect
    detect_ch: tuple                # channels of those features
    detect_strides: tuple           # stride per detect level
    save: tuple                     # y indices that must be kept
    sr_taps: tuple                  # (l1, l2) or ()
    sr_ch: tuple                    # (c1, c2) or ()
    ch_in: int


def load_yaml(cfg) -> dict:
    if isinstance(cfg, dict):
        return dict(cfg)
    from ..utils.general import resolve_config_path
    with open(resolve_config_path(cfg)) as f:
        return yaml.safe_load(f)


def _round_n(n: int, gd: float) -> int:
    return max(round(n * gd), 1) if n > 1 else n


def _parse_section(defs, ch: list[int], strides: list[float], gd: float,
                   gw: float, no: int, start: int = 0):
    """Walk one [from, number, module, args] list -> (LayerDefs, detect info).

    `ch[j]` / `strides[j]` hold the channel count / stride of y[j]; entries
    are appended as layers are parsed. `start` is the y index of the first
    parsed layer.
    """
    out: list[LayerDef] = []
    save: set[int] = set()
    detect = None
    for k, (f, n, mname, args) in enumerate(defs):
        i = start + k
        fs = tuple(f) if isinstance(f, (list, tuple)) else (f,)
        fs = tuple(i - 1 if x == -1 else x for x in fs)
        n = _round_n(n, gd)
        args = list(args)
        name = mname.replace("nn.", "")

        c1 = ch[fs[0]] if ch else 0
        s_in = strides[fs[0]] if strides else 1.0
        s_out = s_in

        if name in _CONV_FAMILY:
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            args = [c2, *args[1:]]
            s = 1
            if name in ("Conv", "DWConv"):
                s = args[2] if len(args) > 2 else 1
            elif name == "ACmix":
                s = args[4] if len(args) > 4 else 1
            elif name == "Focus":
                s = 2  # space-to-depth halves resolution
            elif name == "MixConv2d" and len(args) > 2:
                s = args[2]
            s_out = s_in * (2 if name == "Focus" else s)
            rep = n
            if name in ("BottleneckCSP", "BottleneckCSP2", "SPPCSP", "C3"):
                args = [args[0], n, *args[1:]]
                rep = 1
            out.append(LayerDef(i, fs, name, tuple(args), rep, c2, s_out))
        elif name == "Upsample":
            scale = args[1] if len(args) > 1 else 2
            method = args[2] if len(args) > 2 else "nearest"
            c2 = c1
            s_out = s_in / scale
            out.append(LayerDef(i, fs, "Upsample", (scale, method), 1, c2, s_out))
        elif name == "Concat":
            c2 = sum(ch[x] for x in fs)
            out.append(LayerDef(i, fs, "Concat", (), 1, c2, s_in))
        elif name == "MF":
            c2 = 64  # MF emits 48+16 fused channels (common.py:183-212)
            out.append(LayerDef(i, fs, "MF", tuple(args), 1, c2, s_in))
        elif name == "Detect":
            det_ch = tuple(ch[x] for x in fs)
            det_s = tuple(strides[x] for x in fs)
            detect = (fs, det_ch, det_s)
            c2 = no
            out.append(LayerDef(i, fs, "Detect", (), 1, c2, s_in))
        elif name == "ImageEncoderViT":
            raise ValueError("ImageEncoderViT only valid as a split backbone")
        elif name == "Sum":
            c2 = c1
            out.append(LayerDef(i, fs, "Sum", tuple(args), 1, c2, s_in))
        elif name == "Contract":
            c2 = c1 * args[0] ** 2
            s_out = s_in * args[0]
            out.append(LayerDef(i, fs, "Contract", tuple(args), 1, c2, s_out))
        elif name == "Expand":
            c2 = c1 // args[0] ** 2
            s_out = s_in / args[0]
            out.append(LayerDef(i, fs, "Expand", tuple(args), 1, c2, s_out))
        else:
            raise KeyError(f"unknown module {mname!r} in config")

        for x in fs:
            if x != i - 1:
                save.add(x)
        ch.append(c2)
        strides.append(s_out)
    return out, save, detect


def parse_config(cfg, ch_in: int = 3, nc: int | None = None,
                 anchors=None) -> ModelSpec:
    """Parse a model YAML (path or dict) into a static ModelSpec."""
    d = load_yaml(cfg)
    if nc is not None:
        d["nc"] = nc
    if anchors is not None:
        d["anchors"] = anchors
    nc = int(d["nc"])
    gd, gw = float(d["depth_multiple"]), float(d["width_multiple"])
    anchors = tuple(tuple(a) for a in d["anchors"])
    na = len(anchors[0]) // 2
    no = na * (nc + 5)

    backbone_defs = d["backbone"]
    head_defs = d["head"]
    steam_defs = d.get("steam", [])

    SPLIT_BACKBONES = ("ImageEncoderViT", "ImageEncoderViTMono",
                       "ImageEncoderSwinV2")
    split = (len(backbone_defs) == 1
             and backbone_defs[0][2] in SPLIT_BACKBONES)

    steam_layers: tuple = ()
    if steam_defs:
        sch, sst = [ch_in], [1.0]
        steam_list, _, _ = _parse_section(steam_defs, sch, sst, gd, gw, no)
        # shift indices so steam module names (l1000+) stay disjoint from
        # the backbone/head namespace inside the flax module; the steam walk
        # is purely sequential so the `from` refs are only informational
        steam_layers = tuple(
            LayerDef(ld.i + 1000, tuple(x + 1000 for x in ld.f), ld.name,
                     ld.args, ld.n, ld.c2, ld.stride)
            for ld in steam_list)

    if split:
        enc_name = backbone_defs[0][2]
        args = list(backbone_defs[0][3])
        if len(args) == 6:
            # [img_size, ?, embed_dim, in_chans, out_chans, window_size]
            # (reference ctor call model.py:422-423, patch_size forced to 4)
            enc_args = dict(img_size=args[0], patch_size=4,
                            embed_dim=args[2], in_chans=args[3],
                            out_chans=args[4], window_size=args[5])
        elif len(args) == 5:
            # SRyolo_resnet50.yaml comment order:
            # [img_size, patch_size, in_chans, out_chans, window_size]
            enc_args = dict(img_size=args[0], patch_size=4,
                            embed_dim=192, in_chans=args[2],
                            out_chans=args[3], window_size=args[4])
        else:
            raise ValueError(f"bad {enc_name} args {args}")
        oc = enc_args["out_chans"]
        if enc_name == "ImageEncoderSwinV2":
            # fixed necks + tap strides of the V2 variant
            # (backbone_swinv2.py:161-179,210-224)
            enc_args["embed_dim"] = 96
            ch = [128, 256, 512]
            strides = [4.0, 16.0, 32.0]
        else:
            # y seeds: P3, P4, P5 with strides 4/8/16 (reference stride [4.]
            # hardcode covers P3, model.py:130; P4/P5 follow the pyramid)
            ch = [oc, oc, 2 * oc]
            strides = [4.0, 8.0, 16.0]
        backbone = (LayerDef(0, (-1,), enc_name,
                             tuple(sorted(enc_args.items())), 1, ch[0],
                             strides[0]),)
        head, save, detect = _parse_section(head_defs, ch, strides, gd, gw,
                                            no, start=3)
        save |= {0, 1, 2}
    else:
        ch = [ch_in]
        strides = [1.0]
        all_defs = list(backbone_defs) + list(head_defs)
        # unified graphs index layer outputs; y[j] = layer j output, so the
        # walker sees ch offset by the input seed — rebase indices by +1
        # inside by tracking input at position 0 then shifting at the end.
        parsed, save, detect = _parse_section(
            [(f if isinstance(f, int) and f == -1
              else ([x + 1 if x != -1 else -1 for x in f]
                    if isinstance(f, (list, tuple))
                    else f + 1), n, m, a) for (f, n, m, a) in all_defs],
            ch, strides, gd, gw, no, start=1)
        # shift everything back so y[0] is layer 0's output
        def shift(ld: LayerDef) -> LayerDef:
            return LayerDef(ld.i - 1, tuple(x - 1 for x in ld.f), ld.name,
                            ld.args, ld.n, ld.c2, ld.stride)
        parsed = [shift(ld) for ld in parsed]
        save = {x - 1 for x in save if x >= 1}
        detect = ((tuple(x - 1 for x in detect[0]),) + detect[1:]) if detect else None
        nb = len(backbone_defs)
        backbone = tuple(parsed[:nb])
        head = tuple(parsed[nb:])

    if detect is None:
        raise ValueError("config has no Detect layer")
    det_f, det_ch, det_s = detect

    sr_taps = ()
    sr_ch = ()
    if "l1" in d and "l2" in d:
        sr_taps = (int(d["l1"]), int(d["l2"]))
        sr_ch = (int(d.get("c1", 128)), int(d.get("c2", 512)))

    save |= set(sr_taps)

    return ModelSpec(
        mode="split" if split else "unified",
        nc=nc, anchors=anchors,
        backbone=backbone, head=head, steam=steam_layers,
        detect_from=det_f, detect_ch=det_ch,
        detect_strides=tuple(float(s) for s in det_s),
        save=tuple(sorted(save)),
        sr_taps=sr_taps, sr_ch=sr_ch, ch_in=ch_in,
    )


def build_module(ld: LayerDef, dtype, remat: bool = False) -> Any:
    """Instantiate the flax module for one LayerDef (registry dispatch)."""
    if ld.name in ("ImageEncoderViT", "ImageEncoderViTMono") and remat:
        return MODULE_REGISTRY[ld.name](ld, dtype, remat=True)
    return MODULE_REGISTRY[ld.name](ld, dtype)


def _conv(ld, dt):
    c2, *rest = ld.args
    k = rest[0] if len(rest) > 0 else 1
    s = rest[1] if len(rest) > 1 else 1
    return L.ConvBnAct(c2, k, s, dtype=dt, name=f"l{ld.i}")


def _c3(ld, dt):
    c2, n, *rest = ld.args
    shortcut = rest[0] if rest else True
    return L.C3(c2, n=n, shortcut=shortcut, dtype=dt, name=f"l{ld.i}")


def _bottleneck(ld, dt):
    c2, *rest = ld.args
    shortcut = rest[0] if rest else True
    return L.Bottleneck(c2, shortcut=shortcut, dtype=dt, name=f"l{ld.i}")


def _bcsp(cls):
    def b(ld, dt):
        c2, n, *rest = ld.args
        shortcut = rest[0] if rest else cls is not L.BottleneckCSP2
        return cls(c2, n=n, shortcut=shortcut, dtype=dt, name=f"l{ld.i}")
    return b


def _spp(ld, dt):
    c2, *rest = ld.args
    k = tuple(rest[0]) if rest else (5, 9, 13)
    return L.SPP(c2, k=k, dtype=dt, name=f"l{ld.i}")


def _sppcsp(ld, dt):
    c2, n, *rest = ld.args
    return L.SPPCSP(c2, n=n, dtype=dt, name=f"l{ld.i}")


def _focus(ld, dt):
    c2, *rest = ld.args
    k = rest[0] if rest else 1
    return L.Focus(c2, k=k, dtype=dt, name=f"l{ld.i}")


def _upsample(ld, dt):
    scale, method = ld.args
    return L.Upsample(scale=int(scale), method=str(method), name=f"l{ld.i}")


def _mf(ld, dt):
    return L.MF(channels=ld.args[0] if ld.args else 3, dtype=dt,
                name=f"l{ld.i}")


def _encoder(ld, dt, remat=False):
    kw = dict(ld.args)
    return ImageEncoderViT(dtype=dt, remat=remat, name=f"l{ld.i}", **kw)


def _encoder_mono(ld, dt, remat=False):
    kw = dict(ld.args)
    return ImageEncoderViT(dtype=dt, mono=True, remat=remat,
                           name=f"l{ld.i}", **kw)


def _encoder_swinv2(ld, dt):
    kw = dict(ld.args)
    kw.pop("out_chans", None)  # necks are fixed in the V2 variant
    return ImageEncoderSwinV2(dtype=dt, name=f"l{ld.i}", **kw)


def _contract(ld, dt):
    return L.Contract(gain=ld.args[0], name=f"l{ld.i}")


def _expand(ld, dt):
    return L.Expand(gain=ld.args[0], name=f"l{ld.i}")


def _attention_model(ld, dt):
    return L.AttentionModel(ld.args[0], dtype=dt, name=f"l{ld.i}")


def _ghostconv(ld, dt):
    c2, *rest = ld.args
    k = rest[0] if rest else 1
    s = rest[1] if len(rest) > 1 else 1
    return L.GhostConv(c2, k=k, s=s, dtype=dt, name=f"l{ld.i}")


def _ghostbottleneck(ld, dt):
    c2, *rest = ld.args
    return L.GhostBottleneck(c2, dtype=dt, name=f"l{ld.i}")


def _crossconv(ld, dt):
    c2, *rest = ld.args
    return L.CrossConv(c2, dtype=dt, name=f"l{ld.i}")


def _mixconv(ld, dt):
    c2, *rest = ld.args
    return L.MixConv2d(c2, dtype=dt, name=f"l{ld.i}")


def _acmix(ld, dt):
    # reference signature: ACmix(in, out, kernel_att=7, head=4,
    # kernel_conv=3, stride=1) -> yaml args after c2: [kernel_att, head,
    # kernel_conv, stride]
    c2, *rest = ld.args
    ka = rest[0] if len(rest) > 0 else 7
    head = rest[1] if len(rest) > 1 else 4
    kc = rest[2] if len(rest) > 2 else 3
    s = rest[3] if len(rest) > 3 else 1
    return L.ACmix(c2, kernel_att=ka, head=head, kernel_conv=kc, s=s,
                   dtype=dt, name=f"l{ld.i}")


def _concat(ld, dt):
    return L.Concat(name=f"l{ld.i}")


MODULE_REGISTRY = {
    "Concat": _concat,
    "Conv": _conv,
    "DWConv": _conv,
    "C3": _c3,
    "Bottleneck": _bottleneck,
    "BottleneckCSP": _bcsp(L.BottleneckCSP),
    "BottleneckCSP2": _bcsp(L.BottleneckCSP2),
    "SPP": _spp,
    "SPPCSP": _sppcsp,
    "Focus": _focus,
    "Upsample": _upsample,
    "MF": _mf,
    "ImageEncoderViT": _encoder,
    "ImageEncoderViTMono": _encoder_mono,
    "ImageEncoderSwinV2": _encoder_swinv2,
    "Contract": _contract,
    "Expand": _expand,
    "AttentionModel": _attention_model,
    "GhostConv": _ghostconv,
    "GhostBottleneck": _ghostbottleneck,
    "CrossConv": _crossconv,
    "MixConv2d": _mixconv,
    "ACmix": _acmix,
    "Sum": lambda ld, dt: L.Sum(n=ld.args[0] if ld.args else 2,
                                weight=(ld.args[1] if len(ld.args) > 1
                                        else False), name=f"l{ld.i}"),
}


def build_model(cfg, *, ch_in: int = 3, nc: int | None = None, anchors=None,
                sr: bool = False, factor: int = 2, dtype=None,
                input_mode: str = "RGB+IR", remat: bool = False):
    """Config -> DetectionModel (flax). See model.DetectionModel."""
    from .model import DetectionModel
    import jax.numpy as jnp

    spec = parse_config(cfg, ch_in=ch_in, nc=nc, anchors=anchors)
    return DetectionModel(spec=spec, sr=sr, sr_factor=factor,
                          input_mode=input_mode, remat=remat,
                          dtype=dtype or jnp.float32)
