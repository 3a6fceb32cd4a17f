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
