"""Golden parity vs the actual reference torch modules.

Loads /root/reference/basics/models/backbone_vit.py (with a minimal `timm`
shim, since timm isn't installed), copies identical weights into our flax
modules, and compares forward outputs numerically. This pins the math of
the rebuild to the reference implementation rather than to our reading of
it.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _install_timm_shim():
    if "timm.models.layers" in sys.modules:
        return
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm.models = models
    models.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


@pytest.fixture(scope="module")
def ref():
    _install_timm_shim()
    sys.path.insert(0, "/root/reference")
    import importlib
    mod = importlib.import_module("basics.models.backbone_vit")
    return mod


def t2j(t):
    import jax.numpy as jnp
    return jnp.asarray(t.detach().numpy())


def lin_w(t):  # torch Linear weight -> flax Dense kernel
    return t2j(t.t())


def conv_w(t):  # torch Conv2d weight -> flax Conv kernel (HWIO)
    return t2j(t.permute(2, 3, 1, 0))


def test_window_attention_parity(ref):
    import jax
    from sodt_tpu.models.swin import WindowAttention

    torch.manual_seed(0)
    dim, ws, nh = 32, 4, 4
    ta = ref.WindowAttention(dim, (ws, ws), nh).eval()
    x = torch.randn(6, ws * ws, dim)
    with torch.no_grad():
        ref_out = ta(x).numpy()

    ours = WindowAttention(dim=dim, window_size=ws, num_heads=nh)
    params = {
        "relative_position_bias_table": t2j(ta.relative_position_bias_table),
        "qkv": {"kernel": lin_w(ta.qkv.weight), "bias": t2j(ta.qkv.bias)},
        "proj": {"kernel": lin_w(ta.proj.weight), "bias": t2j(ta.proj.bias)},
    }
    out = ours.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_window_attention_parity_with_mask(ref):
    from sodt_tpu.models.swin import WindowAttention, shift_attn_mask

    torch.manual_seed(1)
    dim, ws, nh = 16, 4, 2
    h = w = 8
    ta = ref.WindowAttention(dim, (ws, ws), nh).eval()
    # build the reference mask via its own block-mask recipe
    mask_np = shift_attn_mask(h, w, ws, 2)
    nw = mask_np.shape[0]
    x = torch.randn(2 * nw, ws * ws, dim)
    with torch.no_grad():
        ref_out = ta(x, mask=torch.tensor(mask_np)).numpy()

    ours = WindowAttention(dim=dim, window_size=ws, num_heads=nh)
    params = {
        "relative_position_bias_table": t2j(ta.relative_position_bias_table),
        "qkv": {"kernel": lin_w(ta.qkv.weight), "bias": t2j(ta.qkv.bias)},
        "proj": {"kernel": lin_w(ta.proj.weight), "bias": t2j(ta.proj.bias)},
    }
    out = ours.apply({"params": params}, t2j(x), mask_np)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def _swin_block_params(tb):
    p = {
        "norm1": {"scale": t2j(tb.norm1.weight), "bias": t2j(tb.norm1.bias)},
        "norm2": {"scale": t2j(tb.norm2.weight), "bias": t2j(tb.norm2.bias)},
        "attn": {
            "relative_position_bias_table":
                t2j(tb.attn.relative_position_bias_table),
            "qkv": {"kernel": lin_w(tb.attn.qkv.weight),
                    "bias": t2j(tb.attn.qkv.bias)},
            "proj": {"kernel": lin_w(tb.attn.proj.weight),
                     "bias": t2j(tb.attn.proj.bias)},
        },
        "mlp": {
            "fc1": {"kernel": lin_w(tb.mlp.fc1.weight),
                    "bias": t2j(tb.mlp.fc1.bias)},
            "fc2": {"kernel": lin_w(tb.mlp.fc2.weight),
                    "bias": t2j(tb.mlp.fc2.bias)},
        },
    }
    if hasattr(tb.mlp, "conv1"):
        p["mlp"]["conv1"] = {"kernel": conv_w(tb.mlp.conv1.weight),
                             "bias": t2j(tb.mlp.conv1.bias)}
    return p


@pytest.mark.parametrize("shift,linear_mlp", [(0, True), (2, False),
                                              (0, False), (2, True)])
def test_swin_block_parity(ref, shift, linear_mlp):
    from sodt_tpu.models.swin import SwinBlock

    torch.manual_seed(2 + shift)
    dim, nh, hres = 32, 4, 16
    tb = ref.SwinTransformerBlock(
        dim=dim, input_resolution=(hres, hres), num_heads=nh, window_size=8,
        shift_size=shift, linear_mlp=linear_mlp).eval()
    x = torch.randn(2, hres * hres, dim)
    with torch.no_grad():
        ref_out = tb(x).numpy()

    ours = SwinBlock(dim=dim, input_resolution=(hres, hres), num_heads=nh,
                     window_size=8, shift_size=shift, linear_mlp=linear_mlp)
    out = ours.apply({"params": _swin_block_params(tb)}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5)


def test_patch_merging_parity(ref):
    from sodt_tpu.models.swin import PatchMerging

    torch.manual_seed(4)
    dim, hres = 16, 8
    tm = ref.PatchMerging((hres, hres), dim).eval()
    x = torch.randn(2, hres * hres, dim)
    with torch.no_grad():
        ref_out = tm(x, (hres, hres)).numpy()

    ours = PatchMerging(dim=dim)
    params = {
        "reduction": {"kernel": lin_w(tm.reduction.weight)},
        "norm": {"scale": t2j(tm.norm.weight), "bias": t2j(tm.norm.bias)},
    }
    out = ours.apply({"params": params}, t2j(x), (hres, hres))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_cattention_block_parity(ref):
    from sodt_tpu.models.cattention import CAttentionBlock

    torch.manual_seed(5)
    dim, nh = 48, 12
    tb = ref.CAttentionBlock(embedding_dim=dim, num_heads=nh).eval()
    r, g, b, ir = (torch.randn(2, 8, 8, dim) for _ in range(4))
    with torch.no_grad():
        ref_outs = [o.numpy() for o in tb(r, g, b, ir)]

    ours = CAttentionBlock(embedding_dim=dim, num_heads=nh)
    params = {}
    for i, name in enumerate(["norm1", "norm2", "norm3", "norm4"], 1):
        tn = getattr(tb, name)
        params[name] = {"scale": t2j(tn.weight), "bias": t2j(tn.bias)}
    outs = ours.apply({"params": params}, t2j(r), t2j(g), t2j(b), t2j(ir))
    for o, ro in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o), ro, atol=2e-5)


def test_patch_embed_parity(ref):
    from sodt_tpu.models.swin import PatchEmbed

    torch.manual_seed(6)
    te = ref.PatchEmbed(kernel_size=(4, 4), stride=(4, 4), padding=(1, 1),
                        in_chans=1, embed_dim=8).eval()
    x = torch.randn(2, 1, 32, 32)
    with torch.no_grad():
        ref_out = te(x).numpy()  # BHWC

    ours = PatchEmbed(embed_dim=8, kernel=(4, 4), stride=(4, 4),
                      padding=(1, 1))
    params = {"proj": {"kernel": conv_w(te.proj.weight),
                       "bias": t2j(te.proj.bias)}}
    out = ours.apply({"params": params}, t2j(x.permute(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_swinv2_window_attention_parity(ref):
    import importlib
    refv2 = importlib.import_module("basics.models.backbone_swinv2")
    from sodt_tpu.models.swinv2 import WindowAttentionV2

    torch.manual_seed(7)
    dim, ws, nh = 24, 4, 4
    ta = refv2.WindowAttention(dim, (ws, ws), nh,
                               pretrained_window_size=[8, 8]).eval()
    x = torch.randn(6, ws * ws, dim)
    with torch.no_grad():
        ref_out = ta(x).numpy()

    ours = WindowAttentionV2(dim=dim, window_size=ws, num_heads=nh,
                             pretrained_window_size=8)
    params = {
        "logit_scale": t2j(ta.logit_scale),
        "cpb_mlp0": {"kernel": lin_w(ta.cpb_mlp[0].weight),
                     "bias": t2j(ta.cpb_mlp[0].bias)},
        "cpb_mlp1": {"kernel": lin_w(ta.cpb_mlp[2].weight)},
        "qkv": {"kernel": lin_w(ta.qkv.weight)},
        "q_bias": t2j(ta.q_bias),
        "v_bias": t2j(ta.v_bias),
        "proj": {"kernel": lin_w(ta.proj.weight), "bias": t2j(ta.proj.bias)},
    }
    out = ours.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5)


def test_full_encoder_parity(ref):
    """End-to-end ImageEncoderViT parity: reference weights imported into
    our flax encoder, same input, compare all three pyramid outputs.

    Runs at img_size=512 (the reference hardcodes its stage resolutions to
    128^2/64^2/32^2, backbone_vit.py:114-161, so no smaller size exists)."""
    import jax
    import jax.numpy as jnp
    from sodt_tpu.models.backbone import ImageEncoderViT as OurEncoder
    from sodt_tpu.utils.torch_import import import_image_encoder

    torch.manual_seed(11)
    tenc = ref.ImageEncoderViT(img_size=512, patch_size=4, embed_dim=192,
                               in_chans=4, out_chans=256,
                               window_size=4).eval()
    x = torch.randn(1, 4, 512, 512)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in tenc(x)]  # NCHW each

    params = import_image_encoder(tenc.state_dict())
    ours = OurEncoder(img_size=512, patch_size=4, embed_dim=192, in_chans=4,
                      out_chans=256, window_size=4)
    outs = ours.apply({"params": params}, t2j(x.permute(0, 2, 3, 1)))
    for o, ro in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2), ro,
                                   atol=5e-4)


_FLAGSHIP_CACHE: dict = {}


def _build_flagship_pair():
    """Reference Model + our DetectionModel with imported weights, plus a
    fixed 512px input forwarded through both. Cached: several tests chain
    off the same expensive build."""
    if _FLAGSHIP_CACHE:
        return _FLAGSHIP_CACHE["pair"]
    import types
    for name in ["torchvision", "torchvision.ops", "seaborn", "xlsxwriter",
                 "pafy", "wandb", "thop", "numba"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].nms = None
    sys.modules["numba"].jit = lambda *a, **k: (
        a[0] if a and callable(a[0]) else (lambda f: f))

    import importlib
    rmodel = importlib.import_module("basics.models.model")
    from sodt_tpu.models import build_model
    from sodt_tpu.utils.torch_import import import_flagship_model

    torch.manual_seed(42)
    tm = rmodel.Model("/root/reference/models/model.yaml",
                      input_mode="RGB+IR", ch_steam=4, ch=4, nc=8).eval()
    # randomize BN stats (fresh init has mean 0 var 1 — too easy)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.8, 1.2)
            m.eps = 1e-3  # runtime convention (initialize_weights)

    rgb = torch.randn(1, 3, 512, 512)
    ir = torch.randn(1, 3, 512, 512)
    with torch.no_grad():
        dec_ref, raw_ref, _ = tm(rgb, ir, input_mode="RGB+IR")
    dec_ref = dec_ref.numpy()

    ours = build_model("/root/repo/configs/model.yaml", ch_in=4, nc=8,
                       input_mode="RGB+IR")
    variables = import_flagship_model(tm.state_dict(), ours.spec)
    out = ours.apply(variables, t2j(rgb.permute(0, 2, 3, 1)),
                     t2j(ir.permute(0, 2, 3, 1)), train=False)
    pair = dict(tm=tm, ours=ours, variables=variables, rgb=rgb, ir=ir,
                dec_ref=dec_ref, raw_ref=raw_ref, out=out)
    _FLAGSHIP_CACHE["pair"] = pair
    return pair


def test_full_model_parity(ref):
    """THE golden test: the complete reference Model (encoder + FPN head +
    Detect) built from /root/reference/models/model.yaml, weights imported
    into our DetectionModel, same 512px input — raw Detect outputs and the
    decoded predictions must match."""
    from sodt_tpu.models.detect import decode_detections

    p = _build_flagship_pair()
    dec_ref, raw_ref, out, ours = (p["dec_ref"], p["raw_ref"], p["out"],
                                   p["ours"])
    raw = out["raw"][0]  # (1, 128, 128, 3, 13)

    # reference raw layout: (1, na, ny, nx, no)
    want_raw = raw_ref[0].numpy().transpose(0, 2, 3, 1, 4)
    np.testing.assert_allclose(np.asarray(raw), want_raw, atol=2e-3,
                               rtol=1e-2)

    anchors = np.asarray(ours.spec.anchors, np.float32).reshape(1, 3, 2)
    dec = np.asarray(decode_detections(out["raw"], anchors,
                                       ours.spec.detect_strides))
    # candidate orders differ ((ny,nx,na) vs (na,ny,nx)); compare as sets
    # via sorted flattened boxes+scores
    a = np.sort(dec.reshape(-1, 13), axis=0)
    b = np.sort(dec_ref.reshape(-1, 13), axis=0)
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-2)


def test_full_pipeline_boxes_parity(ref):
    """Closes the loop to 'bit-comparable boxes' (BASELINE.md): imported
    reference weights -> our jitted forward + decode + on-device merge-NMS
    must return the same final boxes/scores/classes as the reference Model
    forward + its non_max_suppression (numpy oracle port, tests/ref_nms.py
    == general.py:425-512) on the same input, under the eval protocol
    (iou 0.6, multi-label, merge — basics/test.py:135-152)."""
    import jax.numpy as jnp
    from ref_nms import ref_nms_numpy
    from sodt_tpu.models.detect import decode_detections
    from sodt_tpu.ops.nms import single_image_nms

    p = _build_flagship_pair()
    dec_ref, out, ours = p["dec_ref"], p["out"], p["ours"]

    # pick conf so a few hundred multi-label candidates pass (random-weight
    # scores cluster; a fixed 0.001 would light up every cell) and the
    # n < 3000 merge gate is open — the full merged path gets exercised
    obj = dec_ref[0][:, 4:5]
    pair_scores = (obj * dec_ref[0][:, 5:]).ravel()
    conf = float(np.sort(pair_scores)[-600])

    ref_out = ref_nms_numpy(dec_ref, conf_thres=conf, iou_thres=0.6,
                            multi_label=True, merge=True)[0]
    assert 1 < ref_out.shape[0] <= 300

    anchors = np.asarray(ours.spec.anchors, np.float32).reshape(1, 3, 2)
    dec = decode_detections(out["raw"], anchors, ours.spec.detect_strides)
    dets, valid = single_image_nms(dec[0], conf_thres=conf, iou_thres=0.6,
                                   multi_label=True, merge=True, top_k=4096)
    mine = np.asarray(dets)[np.asarray(valid)]

    assert mine.shape[0] == ref_out.shape[0], (mine.shape, ref_out.shape)
    np.testing.assert_allclose(mine[:, 4], ref_out[:, 4], atol=1e-3)
    np.testing.assert_array_equal(mine[:, 5].astype(int),
                                  ref_out[:, 5].astype(int))
    np.testing.assert_allclose(mine[:, :4], ref_out[:, :4], atol=0.05)


def test_mono_encoder_parity(ref):  # ref fixture installs shims/path
    """backbone_vit_mono's live path (plain RGB patch embed, same stages)
    vs our mono=True encoder with imported weights, at 512px."""
    import importlib
    refm = importlib.import_module("basics.models.backbone_vit_mono")
    from sodt_tpu.models.backbone import ImageEncoderViT as OurEncoder
    from sodt_tpu.utils.torch_import import import_image_encoder

    torch.manual_seed(13)
    tenc = refm.ImageEncoderViT(img_size=512, patch_size=4, embed_dim=192,
                                in_chans=3, out_chans=256,
                                window_size=4).eval()
    x = torch.randn(1, 3, 512, 512)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in tenc(x)]

    sd = tenc.state_dict()
    params = import_image_encoder(sd, mono=True)
    ours = OurEncoder(img_size=512, patch_size=4, embed_dim=192, in_chans=3,
                      out_chans=256, window_size=4, mono=True)
    outs = ours.apply({"params": params}, t2j(x.permute(0, 2, 3, 1)))
    for o, ro in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2), ro,
                                   atol=5e-4)


def test_swinv2_full_encoder_parity(ref):
    """Full SwinV2 variant encoder golden at 512px (cosine attention +
    cpb-MLP bias + post-norm stack, backbone_swinv2.py:13-232)."""
    import importlib
    refv2 = importlib.import_module("basics.models.backbone_swinv2")
    from sodt_tpu.models.swinv2 import ImageEncoderSwinV2
    from sodt_tpu.utils.torch_import import import_swinv2_encoder

    torch.manual_seed(17)
    tenc = refv2.ImageEncoderViT(img_size=512, patch_size=4, in_chans=4,
                                 embed_dim=96, out_chans=256,
                                 window_size=8).eval()
    x = torch.randn(1, 4, 512, 512)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in tenc(x)]

    params = import_swinv2_encoder(tenc.state_dict())
    ours = ImageEncoderSwinV2(img_size=512, patch_size=4, in_chans=4)
    outs = ours.apply({"params": params}, t2j(x.permute(0, 2, 3, 1)))
    for o, ro in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2), ro,
                                   atol=1e-3, rtol=1e-2)


def test_scale_img_parity(ref):
    """tta.scale_img vs the reference torch_utils.scale_img
    (torch_utils.py:249-259): same resize, same ceil-to-gs pad, same
    0.447 fill. Full-model TTA golden is impossible on the flagship: the
    reference's own augment branch (model.py:156-184) feeds scale-0.83
    images into a backbone hardcoded to the 512 grid
    (backbone_vit.py:215-217) and shape-errors; TTA is only runnable on
    the CNN configs. The de-scale/de-flip algebra is covered by
    test_aux.test_tta_equivariance."""
    import importlib
    import types
    for name in ["torchvision", "torchvision.ops"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].nms = None
    tu = importlib.import_module("basics.utils.torch_utils")
    from sodt_tpu.train.tta import scale_img

    torch.manual_seed(0)
    x = torch.rand(2, 3, 96, 128)
    for ratio, gs in ((0.83, 32), (0.67, 32), (0.83, 4), (1.0, 32)):
        want = tu.scale_img(x, ratio, gs=gs)
        got = scale_img(t2j(x.permute(0, 2, 3, 1)), ratio, gs=gs)
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            atol=2e-6, rtol=1e-5,
            err_msg=f"ratio={ratio} gs={gs}")


def test_pf_full_model_and_tta_parity(ref):
    """Full-CNN golden (SRyolo_PF) + TTA golden.

    The reference's CURRENT Model class cannot build its own CNN yamls
    (model.py:108 parses 'backbone' as the ViT encoder ctor and
    IndexErrors on SRyolo_PF.yaml), so the torch side is assembled from
    the reference's own modules (common.Conv/C3/SPP, model.Detect) walking
    OUR parsed spec, with the reference ctor quirks applied (stride [4.],
    model.py:130; anchors /= stride, :131; BN eps 1e-3). Weights go
    through the generic import_unified_model; the decoded forward and the
    reference TTA recipe (model.py:156-184, scales 1/0.83/0.67, lr-flip,
    de-scale/de-flip, gs = stride.max()) must match end to end."""
    import types
    for name in ["torchvision", "torchvision.ops", "seaborn", "xlsxwriter",
                 "pafy", "wandb", "thop", "numba"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].nms = None
    sys.modules["numba"].jit = lambda *a, **k: (
        a[0] if a and callable(a[0]) else (lambda f: f))
    import importlib
    import torch.nn as nn
    rmodel = importlib.import_module("basics.models.model")
    common = importlib.import_module("basics.models.common")
    tu = importlib.import_module("basics.utils.torch_utils")
    from sodt_tpu.models import build_model
    from sodt_tpu.models.detect import decode_detections
    from sodt_tpu.utils.torch_import import import_unified_model
    from sodt_tpu.train.tta import tta_forward

    ours = build_model("/root/repo/configs/SRyolo_PF.yaml", ch_in=4, nc=8,
                       input_mode="RGB+IR")
    spec = ours.spec
    defs = (*spec.backbone, *spec.head)

    torch.manual_seed(7)
    chs = {}
    mods = []
    for ld in defs:
        c1 = 4 if ld.f[0] == -1 else chs[ld.f[0]]
        if ld.name == "Conv":
            k = ld.args[1] if len(ld.args) > 1 else 1
            st = ld.args[2] if len(ld.args) > 2 else 1
            m = common.Conv(c1, ld.args[0], k, st)
        elif ld.name == "C3":
            sc = ld.args[2] if len(ld.args) > 2 else True
            m = common.C3(c1, ld.args[0], ld.args[1], sc)
        elif ld.name == "SPP":
            m = common.SPP(c1, ld.args[0], tuple(ld.args[1]))
        elif ld.name == "Upsample":
            m = nn.Upsample(scale_factor=ld.args[0], mode=ld.args[1])
        elif ld.name == "Concat":
            m = common.Concat(1)
        elif ld.name == "Detect":
            m = rmodel.Detect(spec.nc,
                              [list(a) for a in spec.anchors],
                              [chs[j] for j in ld.f])
            m.stride = torch.tensor([float(s_)
                                     for s_ in spec.detect_strides])
            m.anchors /= m.stride.view(-1, 1, 1)
        else:
            raise AssertionError(ld.name)
        chs[ld.i] = ld.c2
        mods.append(m)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.ModuleList(mods)

    net = Net().eval()
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.8, 1.2)
            m.eps = 1e-3

    def fwd(x4):
        y = {}
        for ld, m in zip(defs, net.model):
            if ld.name == "Concat":
                cur = torch.cat([x4 if j == -1 else y[j]
                                 for j in ld.f], 1)
            elif ld.name == "Detect":
                return m([y[j] for j in ld.f])
            else:
                cur = m(x4 if ld.f[0] == -1 else y[ld.f[0]])
            y[ld.i] = cur

    rgb = torch.rand(1, 3, 256, 256)
    ir = torch.rand(1, 3, 256, 256)
    steam = torch.cat([rgb, ir[:, 0:1]], 1)
    with torch.no_grad():
        dec_ref, _ = fwd(steam)

    variables = import_unified_model(net.state_dict(), spec)
    out = ours.apply(variables, t2j(rgb.permute(0, 2, 3, 1)),
                     t2j(ir.permute(0, 2, 3, 1)), train=False)
    anchors = np.asarray(spec.anchors, np.float32).reshape(1, 3, 2)
    dec = np.asarray(decode_detections(out["raw"], anchors,
                                       spec.detect_strides))
    no = dec.shape[-1]
    a = np.sort(dec.reshape(-1, no), axis=0)
    b = np.sort(dec_ref.numpy().reshape(-1, no), axis=0)
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-2)

    # reference TTA recipe (model.py:156-184) on the torch graph.
    # gs=32 (scale_img's own default): the reference's gs=stride.max()=4
    # crashes its own /16 trunk at scale 0.83 (216 px -> fractional grid)
    gs = 32
    outs = []
    with torch.no_grad():
        for si, fi in zip([1, 0.83, 0.67], [None, 3, None]):
            xi = tu.scale_img(rgb.flip(fi) if fi else rgb, si, gs=gs)
            iri = tu.scale_img(ir.flip(fi) if fi else ir, si, gs=gs)
            yi = fwd(torch.cat([xi, iri[:, 0:1]], 1))[0]
            yi[..., :4] /= si
            if fi == 3:
                yi[..., 0] = rgb.shape[-1] - yi[..., 0]
            outs.append(yi)
    tta_ref = torch.cat(outs, 1)

    y = tta_forward(ours, variables, t2j(rgb.permute(0, 2, 3, 1)),
                    t2j(ir.permute(0, 2, 3, 1)), gs=gs)
    assert y.shape[1] == tta_ref.shape[1], (y.shape, tta_ref.shape)
    a = np.sort(np.asarray(y).reshape(-1, no), axis=0)
    b = np.sort(tta_ref.numpy().reshape(-1, no), axis=0)
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-2)


def test_export_import_roundtrip_exact():
    """tools/export_torch.py inverse check without torch: our randomly
    initialized flagship variables -> reference state_dict names ->
    import_flagship_model must reproduce every array exactly."""
    import sys as _sys
    from pathlib import Path as _P
    _sys.path.insert(0, str(_P(__file__).resolve().parent.parent / "tools"))
    import jax
    import numpy as np
    from export_torch import export_flagship_state_dict
    from sodt_tpu.models import build_model
    from sodt_tpu.utils.torch_import import import_flagship_model

    import jax.numpy as jnp
    model = build_model("configs/model.yaml", ch_in=4, input_mode="RGB+IR")
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x0, x0, train=False)
    src = {"params": variables["params"],
           "batch_stats": variables.get("batch_stats", {})}
    sd = export_flagship_state_dict(variables, model.spec)
    back = import_flagship_model(sd, model.spec)
    sl, bl = jax.tree.leaves(src), jax.tree.leaves(back)
    assert len(sl) == len(bl)
    for s, b in zip(sl, bl):
        np.testing.assert_array_equal(np.asarray(s, np.float32),
                                      np.asarray(b, np.float32))
