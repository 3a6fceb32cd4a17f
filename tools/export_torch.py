#!/usr/bin/env python
"""Export a sodt_tpu flagship checkpoint to a reference-format .pt.

The inverse of tools/import_torch.py for the flagship graph
(configs/model.yaml): our orbax EMA/params tree -> the reference
Model's state_dict names (basics/models/{model,backbone_vit}.py) -> a
checkpoint dict {'model': nn.Module} that the reference's own
attempt_load (experimental.py:113-135) and basics/test.py consume.

Why: the strongest eval-protocol parity check available without VEDAI —
score OUR trained weights with the REFERENCE'S OWN evaluator and
compare to val.py on the same images (tools/ab_eval_parity below /
PARITY.md "Training/eval parity A/B").

Usage:
    python tools/export_torch.py --ckpt runs/.../best_stripped \
        --cfg configs/model.yaml --out /tmp/ours_as_ref.pt

Layout inversions (import_torch docstring, reversed):
  Dense kernel (in, out)   -> Linear weight (out, in)      [transpose]
  Conv kernel (kh,kw,in,out)-> Conv2d weight (out,in,kh,kw)
  scale/bias               -> LayerNorm/BatchNorm weight/bias
  batch_stats mean/var     -> running_mean/running_var
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _lin(w):
    return np.asarray(w).T


def _conv(w):
    return np.asarray(w).transpose(3, 2, 0, 1)


def get_in(tree, path: str):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return np.asarray(node)


def export_image_encoder(enc: dict, sd: dict, prefix: str = "image_encoder."):
    def put(name, value):
        sd[prefix + name] = np.ascontiguousarray(value)

    for ch in ("r", "g", "b", "i"):
        put(f"channel_embed_{ch}.proj.weight",
            _conv(get_in(enc, f"channel_embed_{ch}/proj/kernel")))
        put(f"channel_embed_{ch}.proj.bias",
            get_in(enc, f"channel_embed_{ch}/proj/bias"))
    for i in range(1, 5):
        put(f"chan_block.norm{i}.weight", get_in(enc, f"chan_block/norm{i}/scale"))
        put(f"chan_block.norm{i}.bias", get_in(enc, f"chan_block/norm{i}/bias"))
    put("patch_embed.proj.weight", _conv(get_in(enc, "patch_embed/proj/kernel")))
    put("patch_embed.proj.bias", get_in(enc, "patch_embed/proj/bias"))
    put("pos_embed", get_in(enc, "pos_embed"))

    def swin_block(dst: str, src: str, conv_mlp: bool):
        put(f"{dst}.norm1.weight", get_in(enc, f"{src}/norm1/scale"))
        put(f"{dst}.norm1.bias", get_in(enc, f"{src}/norm1/bias"))
        put(f"{dst}.norm2.weight", get_in(enc, f"{src}/norm2/scale"))
        put(f"{dst}.norm2.bias", get_in(enc, f"{src}/norm2/bias"))
        put(f"{dst}.attn.relative_position_bias_table",
            get_in(enc, f"{src}/attn/relative_position_bias_table"))
        put(f"{dst}.attn.qkv.weight", _lin(get_in(enc, f"{src}/attn/qkv/kernel")))
        put(f"{dst}.attn.qkv.bias", get_in(enc, f"{src}/attn/qkv/bias"))
        put(f"{dst}.attn.proj.weight",
            _lin(get_in(enc, f"{src}/attn/proj/kernel")))
        put(f"{dst}.attn.proj.bias", get_in(enc, f"{src}/attn/proj/bias"))
        put(f"{dst}.mlp.fc1.weight", _lin(get_in(enc, f"{src}/mlp/fc1/kernel")))
        put(f"{dst}.mlp.fc1.bias", get_in(enc, f"{src}/mlp/fc1/bias"))
        put(f"{dst}.mlp.fc2.weight", _lin(get_in(enc, f"{src}/mlp/fc2/kernel")))
        put(f"{dst}.mlp.fc2.bias", get_in(enc, f"{src}/mlp/fc2/bias"))
        if conv_mlp:
            put(f"{dst}.mlp.conv1.weight",
                _conv(get_in(enc, f"{src}/mlp/conv1/kernel")))
            put(f"{dst}.mlp.conv1.bias", get_in(enc, f"{src}/mlp/conv1/bias"))

    shifts = (0, 2, 0, 2, 0, 2)
    for i in range(6):
        swin_block(f"stage1.{i}", f"stage1_{i}", conv_mlp=shifts[i] != 0)
    for i in range(4):
        swin_block(f"stage2.{i}", f"stage2_{i}", conv_mlp=shifts[i] != 0)
    swin_block("stage3.0", "stage3_0", conv_mlp=False)

    for pm in ("pmerging1", "pmerging2"):
        put(f"{pm}.reduction.weight", _lin(get_in(enc, f"{pm}/reduction/kernel")))
        put(f"{pm}.norm.weight", get_in(enc, f"{pm}/norm/scale"))
        put(f"{pm}.norm.bias", get_in(enc, f"{pm}/norm/bias"))
    for neck in ("neck1", "neck2", "neck3"):
        put(f"{neck}.weight", _conv(get_in(enc, f"{neck}/kernel")))


def _export_conv_bn(params, stats, src: str, sd: dict, dst: str):
    sd[f"{dst}.conv.weight"] = _conv(get_in(params, f"{src}/conv/kernel"))
    sd[f"{dst}.bn.weight"] = get_in(params, f"{src}/bn/scale")
    sd[f"{dst}.bn.bias"] = get_in(params, f"{src}/bn/bias")
    sd[f"{dst}.bn.running_mean"] = get_in(stats, f"{src}/bn/mean")
    sd[f"{dst}.bn.running_var"] = get_in(stats, f"{src}/bn/var")
    sd[f"{dst}.bn.num_batches_tracked"] = np.asarray(0, np.int64)


def export_flagship_state_dict(variables: dict, spec) -> dict:
    """Our DetectionModel variables -> reference Model state_dict
    (numpy values; caller tensors them)."""
    params, stats = variables["params"], variables.get("batch_stats", {})
    sd: dict = {}
    export_image_encoder(params["l0"], sd)
    for ld in spec.head:
        if ld.name == "Detect":
            k = ld.i - 3
            for mi in range(len(spec.detect_from)):
                sd[f"detect.{k}.m.{mi}.weight"] = _conv(
                    get_in(params, f"detect/m{mi}/kernel"))
                sd[f"detect.{k}.m.{mi}.bias"] = get_in(
                    params, f"detect/m{mi}/bias")
            continue
        src, dst = f"l{ld.i}", f"detect.{ld.i - 3}"
        if ld.name == "Conv":
            _export_conv_bn(params, stats, src, sd, dst)
        elif ld.name == "C3":
            for cv in ("cv1", "cv2", "cv3"):
                _export_conv_bn(params, stats, f"{src}/{cv}", sd,
                                f"{dst}.{cv}")
            for i in range(ld.args[1]):
                for cv in ("cv1", "cv2"):
                    _export_conv_bn(params, stats, f"{src}/m{i}/{cv}", sd,
                                    f"{dst}.m.{i}.{cv}")
        # Upsample / Concat: parameter-free
    return sd


def roundtrip_check(sd: dict, spec) -> None:
    """export -> import must reproduce the original tree exactly."""
    import jax
    from sodt_tpu.utils.torch_import import import_flagship_model

    back = import_flagship_model(sd, spec)
    return back  # caller compares


def build_reference_module(sd: dict, cfg_path: str, ref_path: str):
    """Instantiate the actual reference Model and load our weights
    (strict on everything except the anchor buffers the reference
    computes in its own __init__)."""
    import torch
    sys.path.insert(0, ref_path)
    sys.path.insert(0, str(Path(__file__).resolve().parent / "ref_shims"))
    from basics.models.model import Model  # noqa: E402

    model = Model(cfg_path, input_mode="RGB+IR", ch_steam=3, ch=4, nc=8)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    # buffers the reference derives deterministically in __init__ (not
    # learned): anchor grids, window relative-position index tables, and
    # shifted-window attention masks
    missing = [m for m in missing
               if not m.endswith(("anchors", "anchor_grid",
                                  "relative_position_index",
                                  "attn_mask"))]
    assert not missing, f"unmapped reference params: {missing[:8]}"
    assert not unexpected, f"extra exported keys: {unexpected[:8]}"
    return model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (last/best/best_stripped)")
    ap.add_argument("--cfg", default="configs/model.yaml")
    ap.add_argument("--out", required=True, help="output .pt path")
    ap.add_argument("--ref-path", default="/root/reference")
    ap.add_argument("--no-module", action="store_true",
                    help="save a plain state_dict .pt instead of the "
                         "reference's whole-module checkpoint dict")
    a = ap.parse_args(argv)

    import torch
    from sodt_tpu.models import build_model
    from sodt_tpu.train.checkpoint import load_checkpoint, eval_variables

    model = build_model(a.cfg, ch_in=4, input_mode="RGB+IR")
    ckpt = load_checkpoint(a.ckpt)
    variables = eval_variables(ckpt)
    sd = export_flagship_state_dict(variables, model.spec)

    # round-trip: import the exported dict and diff against the source
    from sodt_tpu.utils.torch_import import import_flagship_model
    back = import_flagship_model(sd, model.spec)
    import jax
    src_leaves = jax.tree.leaves(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    back_leaves = jax.tree.leaves(back)
    assert len(src_leaves) == len(back_leaves), (
        len(src_leaves), len(back_leaves))
    for s, b in zip(src_leaves, back_leaves):
        np.testing.assert_array_equal(np.asarray(s, np.float32),
                                      np.asarray(b, np.float32))
    print(f"round-trip exact over {len(src_leaves)} arrays")

    if a.no_module:
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, a.out)
    else:
        module = build_reference_module(sd, a.cfg, a.ref_path)
        # attributes the reference trainer attaches before saving
        # (Train.py:272-276) and test() reads (test.py:117)
        module.names = ["car", "pickup", "camping", "truck", "other",
                        "tractor", "boat", "van"][:model.spec.nc]
        module.nc = model.spec.nc
        torch.save({"model": module, "epoch": -1,
                    "best_fitness": None, "optimizer": None}, a.out)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
