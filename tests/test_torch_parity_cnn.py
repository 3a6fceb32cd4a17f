"""Golden parity for the YOLO CNN blocks vs reference common.py modules.

Imports /root/reference/basics/models/common.py under dependency shims
(timm/torchvision/numba/... are not installed), copies weights into our
flax NHWC modules, compares eval-mode outputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import _install_timm_shim, t2j, lin_w, conv_w


@pytest.fixture(scope="module")
def refc():
    _install_timm_shim()
    for name in ["torchvision", "torchvision.ops", "seaborn", "xlsxwriter",
                 "pafy", "wandb", "thop", "numba"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].nms = None
    sys.modules["numba"].jit = lambda *a, **k: (
        a[0] if a and callable(a[0]) else (lambda f: f))
    sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module("basics.models.common")


def conv_params(tc):
    """Reference Conv (conv+bn) -> our ConvBnAct params + batch_stats."""
    p = {"conv": {"kernel": conv_w(tc.conv.weight)},
         "bn": {"scale": t2j(tc.bn.weight), "bias": t2j(tc.bn.bias)}}
    s = {"bn": {"mean": t2j(tc.bn.running_mean),
                "var": t2j(tc.bn.running_var)}}
    return p, s


def nhwc(t):
    return t2j(t.permute(0, 2, 3, 1))


def nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def _run(ref_mod, our_mod, params, stats, x, atol=2e-4):
    # the reference runtime patches every BN to eps=1e-3/momentum=0.03
    # (torch_utils.initialize_weights); mirror that before comparing
    for m in ref_mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
    with torch.no_grad():
        want = ref_mod.eval()(x).numpy()
    got = our_mod.apply({"params": params, "batch_stats": stats}, nhwc(x),
                        train=False)
    np.testing.assert_allclose(nchw(got), want, atol=atol, rtol=1e-3)


def test_conv_parity(refc):
    from sodt_tpu.models.layers import ConvBnAct
    torch.manual_seed(0)
    tc = refc.Conv(8, 16, 3, 2)
    # randomize BN stats so the test is non-trivial
    tc.bn.running_mean.normal_(0, 0.5)
    tc.bn.running_var.uniform_(0.5, 2.0)
    p, s = conv_params(tc)
    x = torch.randn(2, 8, 16, 16)
    _run(tc, ConvBnAct(16, 3, 2), p, s, x)


def test_focus_parity(refc):
    from sodt_tpu.models.layers import Focus
    torch.manual_seed(1)
    tf = refc.Focus(3, 16, 3)
    p, s = conv_params(tf.conv)
    x = torch.randn(2, 3, 16, 16)
    _run(tf, Focus(16, 3), {"conv": p}, {"conv": s}, x)


def test_bottleneck_parity(refc):
    from sodt_tpu.models.layers import Bottleneck
    torch.manual_seed(2)
    tb = refc.Bottleneck(16, 16)
    p1, s1 = conv_params(tb.cv1)
    p2, s2 = conv_params(tb.cv2)
    x = torch.randn(2, 16, 8, 8)
    _run(tb, Bottleneck(16), {"cv1": p1, "cv2": p2},
         {"cv1": s1, "cv2": s2}, x)


def test_c3_parity(refc):
    from sodt_tpu.models.layers import C3
    torch.manual_seed(3)
    tc = refc.C3(16, 16, n=2)
    params, stats = {}, {}
    for name in ("cv1", "cv2", "cv3"):
        params[name], stats[name] = conv_params(getattr(tc, name))
    for i, m in enumerate(tc.m):
        p1, s1 = conv_params(m.cv1)
        p2, s2 = conv_params(m.cv2)
        params[f"m{i}"] = {"cv1": p1, "cv2": p2}
        stats[f"m{i}"] = {"cv1": s1, "cv2": s2}
    x = torch.randn(2, 16, 8, 8)
    _run(tc, C3(16, n=2), params, stats, x)


def test_spp_parity(refc):
    from sodt_tpu.models.layers import SPP
    torch.manual_seed(4)
    ts = refc.SPP(16, 16)
    p1, s1 = conv_params(ts.cv1)
    p2, s2 = conv_params(ts.cv2)
    x = torch.randn(2, 16, 16, 16)
    _run(ts, SPP(16, c1=16), {"cv1": p1, "cv2": p2},
         {"cv1": s1, "cv2": s2}, x)


def test_mf_parity(refc):
    from sodt_tpu.models.layers import MF
    torch.manual_seed(5)
    tm = refc.MF(3).eval()
    rgb = torch.randn(2, 3, 16, 16)
    ir = torch.randn(2, 1, 16, 16)
    with torch.no_grad():
        want = tm([rgb, ir]).numpy()

    def se_params(se):
        return {"fc1": {"kernel": lin_w(se.fc[0].weight)},
                "fc2": {"kernel": lin_w(se.fc[2].weight)}}

    params = {
        "se_r": se_params(tm.se_r),
        "se_i": se_params(tm.se_i),
        "se": se_params(tm.se),
        "mask_map_r": {"kernel": conv_w(tm.mask_map_r.weight),
                       "bias": t2j(tm.mask_map_r.bias)},
        "mask_map_i": {"kernel": conv_w(tm.mask_map_i.weight),
                       "bias": t2j(tm.mask_map_i.bias)},
        "bottleneck1": {"kernel": conv_w(tm.bottleneck1.weight)},
        "bottleneck2": {"kernel": conv_w(tm.bottleneck2.weight)},
    }
    ours = MF(channels=3)
    got = ours.apply({"params": params},
                     [nhwc(rgb), nhwc(ir)], train=False)
    np.testing.assert_allclose(nchw(got), want, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Round 2: parity for the remaining CNN / attention / experimental modules
# (reference common.py:78-162,214-244,448-561; experimental.py:11-95)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def refe(refc):
    """Reference experimental.py (imports common + google_utils)."""
    import importlib
    return importlib.import_module("basics.models.experimental")


def _randomize_bn(mod):
    for m in mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)


def raw_conv(tc):
    p = {"kernel": conv_w(tc.weight)}
    if tc.bias is not None:
        p["bias"] = t2j(tc.bias)
    return p


def bn_params(bn):
    return ({"scale": t2j(bn.weight), "bias": t2j(bn.bias)},
            {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)})


def bottleneck_params(m):
    p1, s1 = conv_params(m.cv1)
    p2, s2 = conv_params(m.cv2)
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def test_bottleneck_csp_parity(refc):
    from sodt_tpu.models.layers import BottleneckCSP
    torch.manual_seed(6)
    tb = refc.BottleneckCSP(16, 16, n=2)
    _randomize_bn(tb)
    params, stats = {}, {}
    params["cv1"], stats["cv1"] = conv_params(tb.cv1)
    params["cv4"], stats["cv4"] = conv_params(tb.cv4)
    params["cv2"] = raw_conv(tb.cv2)
    params["cv3"] = raw_conv(tb.cv3)
    params["bn"], stats["bn"] = bn_params(tb.bn)
    for i, m in enumerate(tb.m):
        params[f"m{i}"], stats[f"m{i}"] = bottleneck_params(m)
    x = torch.randn(2, 16, 8, 8)
    _run(tb, BottleneckCSP(16, n=2), params, stats, x)


def test_bottleneck_csp2_parity(refc):
    from sodt_tpu.models.layers import BottleneckCSP2
    torch.manual_seed(7)
    tb = refc.BottleneckCSP2(16, 16, n=2)
    _randomize_bn(tb)
    params, stats = {}, {}
    params["cv1"], stats["cv1"] = conv_params(tb.cv1)
    params["cv3"], stats["cv3"] = conv_params(tb.cv3)
    params["cv2"] = raw_conv(tb.cv2)
    params["bn"], stats["bn"] = bn_params(tb.bn)
    for i, m in enumerate(tb.m):
        params[f"m{i}"], stats[f"m{i}"] = bottleneck_params(m)
    x = torch.randn(2, 16, 8, 8)
    _run(tb, BottleneckCSP2(16, n=2), params, stats, x)


def test_sppcsp_parity(refc):
    from sodt_tpu.models.layers import SPPCSP
    torch.manual_seed(8)
    ts = refc.SPPCSP(16, 16)
    _randomize_bn(ts)
    params, stats = {}, {}
    for name in ("cv1", "cv3", "cv4", "cv5", "cv6", "cv7"):
        params[name], stats[name] = conv_params(getattr(ts, name))
    params["cv2"] = raw_conv(ts.cv2)
    params["bn"], stats["bn"] = bn_params(ts.bn)
    x = torch.randn(2, 16, 16, 16)
    _run(ts, SPPCSP(16), params, stats, x)


def test_crossconv_parity(refe):
    from sodt_tpu.models.layers import CrossConv
    torch.manual_seed(9)
    tc = refe.CrossConv(16, 16, k=3, s=1, shortcut=True)
    _randomize_bn(tc)
    params, stats = {}, {}
    params["cv1"], stats["cv1"] = conv_params(tc.cv1)
    params["cv2"], stats["cv2"] = conv_params(tc.cv2)
    x = torch.randn(2, 16, 8, 8)
    _run(tc, CrossConv(16, shortcut=True), params, stats, x)


def test_ghostconv_parity(refe):
    from sodt_tpu.models.layers import GhostConv
    torch.manual_seed(10)
    tg = refe.GhostConv(8, 16)
    _randomize_bn(tg)
    params, stats = {}, {}
    params["cv1"], stats["cv1"] = conv_params(tg.cv1)
    params["cv2"], stats["cv2"] = conv_params(tg.cv2)
    x = torch.randn(2, 8, 8, 8)
    _run(tg, GhostConv(16), params, stats, x)


@pytest.mark.parametrize("s", [1, 2])
def test_ghostbottleneck_parity(refe, s):
    from sodt_tpu.models.layers import GhostBottleneck
    torch.manual_seed(11 + s)
    tg = refe.GhostBottleneck(16, 16, k=3, s=s)
    _randomize_bn(tg)

    def ghost_params(g):
        p1, s1 = conv_params(g.cv1)
        p2, s2 = conv_params(g.cv2)
        return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}

    params, stats = {}, {}
    params["g1"], stats["g1"] = ghost_params(tg.conv[0])
    params["g2"], stats["g2"] = ghost_params(tg.conv[2])
    if s == 2:
        params["dw"], stats["dw"] = conv_params(tg.conv[1])
        params["sc_dw"], stats["sc_dw"] = conv_params(tg.shortcut[0])
        params["sc_pw"], stats["sc_pw"] = conv_params(tg.shortcut[1])
    x = torch.randn(2, 16, 8, 8)
    _run(tg, GhostBottleneck(16, s=s), params, stats, x)


def test_mixconv2d_parity(refe):
    from sodt_tpu.models.layers import MixConv2d
    torch.manual_seed(13)
    tm = refe.MixConv2d(16, 16, k=(1, 3))
    _randomize_bn(tm)
    params, stats = {}, {}
    for i, m in enumerate(tm.m):
        params[f"m{i}"] = raw_conv(m)
    params["bn"], stats["bn"] = bn_params(tm.bn)
    x = torch.randn(2, 16, 8, 8)
    _run(tm, MixConv2d(16), params, stats, x)


def test_sum_parity(refe):
    from sodt_tpu.models.layers import Sum
    torch.manual_seed(14)
    ts = refe.Sum(3, weight=True)
    with torch.no_grad():
        ts.w.normal_(0, 1.0)
    xs = [torch.randn(2, 8, 4, 4) for _ in range(3)]
    with torch.no_grad():
        want = ts(xs).numpy()
    got = Sum(n=3, weight=True).apply(
        {"params": {"w": t2j(ts.w)}}, [nhwc(t) for t in xs], train=False)
    np.testing.assert_allclose(nchw(got), want, atol=2e-5, rtol=1e-4)


def test_contract_expand_parity(refc):
    from sodt_tpu.models.layers import Contract, Expand
    x = torch.randn(2, 16, 8, 8)
    with torch.no_grad():
        want_c = refc.Contract(gain=2)(x).numpy()
        want_e = refc.Expand(gain=2)(x).numpy()
    got_c = Contract(gain=2).apply({}, nhwc(x), train=False)
    got_e = Expand(gain=2).apply({}, nhwc(x), train=False)
    np.testing.assert_allclose(nchw(got_c), want_c, atol=1e-6)
    np.testing.assert_allclose(nchw(got_e), want_e, atol=1e-6)


def test_attention_model_parity(refc):
    from sodt_tpu.models.layers import AttentionModel
    torch.manual_seed(15)
    ta = refc.AttentionModel(8).eval()
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        _, want = ta(x)  # reference returns (map, output)
    params = {"conv": raw_conv(ta.conv)}
    got = AttentionModel(8).apply({"params": params}, nhwc(x), train=False)
    np.testing.assert_allclose(nchw(got), want.numpy(), atol=2e-5, rtol=1e-4)


def test_sdpa_only_parity(refc):
    from sodt_tpu.models.layers import ScaledDotProductAttentionOnly
    torch.manual_seed(16)
    temp = 8.0 ** 0.5
    ts = refc.ScaledDotProductAttentionOnly(temp)
    v = torch.randn(2, 8, 6, 6)
    k = torch.randn(2, 8, 6, 6)
    q = torch.randn(2, 8, 6, 6)
    with torch.no_grad():
        want = ts(v, k, q).numpy()
    got = ScaledDotProductAttentionOnly(temperature=temp).apply(
        {}, [nhwc(v), nhwc(k), nhwc(q)], train=False)
    np.testing.assert_allclose(nchw(got), want, atol=1e-4, rtol=1e-4)


def test_classify_parity(refc):
    from sodt_tpu.models.layers import Classify
    torch.manual_seed(17)
    tc = refc.Classify(16, 5).eval()
    x = torch.randn(2, 16, 8, 8)
    with torch.no_grad():
        want = tc(x).numpy()
    got = Classify(5).apply({"params": {"conv": raw_conv(tc.conv)}},
                            nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_acmix_parity(refc):
    """The most intricate port in layers.py: unfold local attention with
    positional encoding + shared-projection depthwise-conv branch
    (common.py:485-561)."""
    from sodt_tpu.models.layers import ACmix
    torch.manual_seed(18)
    tm = refc.ACmix(8, 16, kernel_att=5, head=4, kernel_conv=3, stride=1)
    # reset_parameters leaves dep_conv with bias=None (init_rate_0 returns
    # None); randomize the structured kernel + rates so the test is strict
    assert tm.dep_conv.bias is None
    with torch.no_grad():
        tm.dep_conv.weight.normal_(0, 0.2)
        tm.rate1.normal_(0.5, 0.2)
        tm.rate2.normal_(0.5, 0.2)
    tm = tm.eval()
    x = torch.randn(2, 8, 12, 12)
    with torch.no_grad():
        want = tm(x).numpy()

    params = {
        "conv1": raw_conv(tm.conv1), "conv2": raw_conv(tm.conv2),
        "conv3": raw_conv(tm.conv3), "conv_p": raw_conv(tm.conv_p),
        "fc": {"kernel": lin_w(tm.fc.weight[:, :, 0, 0])},
        "dep_conv": raw_conv(tm.dep_conv),
        "rate1": t2j(tm.rate1), "rate2": t2j(tm.rate2),
    }
    got = ACmix(16, kernel_att=5, head=4, kernel_conv=3, s=1).apply(
        {"params": params}, nhwc(x), train=False)
    np.testing.assert_allclose(nchw(got), want, atol=5e-4, rtol=1e-3)


def test_import_torch_cli_roundtrip(refc, tmp_path):
    """tools/import_torch.py: a reference-layout state_dict .pt converts
    into an orbax checkpoint whose forward matches the torch net."""
    import importlib
    from pathlib import Path
    import numpy as np
    common = refc
    rmodel = importlib.import_module("basics.models.model")

    from sodt_tpu.models import build_model
    ours = build_model(str(Path(__file__).parent / "tiny.yaml"), ch_in=3,
                       input_mode="RGB")
    spec = ours.spec

    torch.manual_seed(3)
    mods = [common.Conv(3, 16, 3, 2), common.Conv(16, 32, 3, 2),
            common.C3(32, 32, 1), common.Conv(32, 32, 1, 1)]
    det = rmodel.Detect(spec.nc, [list(a) for a in spec.anchors], [32])
    det.stride = torch.tensor([float(s) for s in spec.detect_strides])
    det.anchors /= det.stride.view(-1, 1, 1)

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.ModuleList(mods + [det])

    net = Net().eval()
    _randomize_bn(net)
    sd_path = tmp_path / "ref.pt"
    torch.save({"model": net.state_dict(), "ema": None}, sd_path)

    sys.path.insert(0, "/root/repo/tools")
    from import_torch import convert
    out_dir = tmp_path / "imported"
    info = convert(str(sd_path), str(Path(__file__).parent / "tiny.yaml"),
                   str(out_dir), input_mode="RGB", nc=spec.nc)
    assert info["torch_keys"] > 0

    from sodt_tpu.train.checkpoint import load_checkpoint, eval_variables
    variables = eval_variables(load_checkpoint(out_dir))

    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        y = x
        for m in net.model[:-1]:
            y = m(y)
        dec_ref, _ = det([y])
    out = ours.apply(variables, nhwc(x), nhwc(x), train=False)
    from sodt_tpu.models.detect import decode_detections
    anchors = np.asarray(spec.anchors, np.float32).reshape(1, 3, 2)
    dec = np.asarray(decode_detections(out["raw"], anchors,
                                       spec.detect_strides))
    # ours flattens (y, x, anchor); the reference flattens (anchor, y, x)
    # — NMS is order-invariant, reorder for the elementwise compare
    dec = dec.reshape(1, 16 * 16, 3, 8).transpose(0, 2, 1, 3).reshape(
        1, -1, 8)
    # randomized BN running stats amplify f32 accumulation-order noise;
    # exact-math parity is pinned by the module goldens above
    np.testing.assert_allclose(dec, dec_ref.numpy(), atol=5e-3, rtol=1e-3)


def test_parity_check_synthetic_smoke(refc, tmp_path):
    """tools/parity_check.py one-command recipe: torch .pt -> orbax ->
    mAP protocol, end-to-end on the synthetic fixture (the real-VEDAI
    invocation is the same command with --data pointing at the dataset
    and --ref-map50 at the reference number)."""
    import importlib
    from pathlib import Path
    common = refc
    rmodel = importlib.import_module("basics.models.model")

    from sodt_tpu.models import build_model
    cfg = str(Path(__file__).parent / "tiny.yaml")
    spec = build_model(cfg, ch_in=3, input_mode="RGB").spec

    torch.manual_seed(4)
    mods = [common.Conv(3, 16, 3, 2), common.Conv(16, 32, 3, 2),
            common.C3(32, 32, 1), common.Conv(32, 32, 1, 1)]
    det = rmodel.Detect(spec.nc, [list(a) for a in spec.anchors], [32])
    det.stride = torch.tensor([float(s) for s in spec.detect_strides])
    det.anchors /= det.stride.view(-1, 1, 1)

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.ModuleList(mods + [det])

    sd_path = tmp_path / "ref.pt"
    torch.save({"model": Net().eval().state_dict(), "ema": None}, sd_path)
    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(f"nc: {spec.nc}\nnames: [a, b, c]\nval: unused\n")

    sys.path.insert(0, "/root/repo/tools")
    from parity_check import run
    res = run(str(sd_path), cfg, str(data_yaml),
              out=str(tmp_path / "imported"), input_mode="RGB",
              nc=spec.nc, img_size=64, batch_size=2, synthetic=True,
              synthetic_n=4, bf16=False, ref_map50=50.0,
              save_dir=str(tmp_path / "parity"))
    assert set(res) >= {"map50", "map", "ref_map50", "delta_pts", "pass"}
    assert res["ref_map50"] == 0.5
    assert isinstance(res["pass"], bool)
