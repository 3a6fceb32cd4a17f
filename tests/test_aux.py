"""Auxiliary subsystems: TTA, WBF, loggers, plots, checkpointing."""

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sodt_tpu.models import build_model
from sodt_tpu.train.tta import scale_img, tta_forward
from sodt_tpu.ops.wbf import weighted_boxes_fusion, weighted_boxes

TINY = str(Path(__file__).parent / "tiny.yaml")


def test_scale_img_pads_to_stride():
    x = jnp.zeros((1, 64, 64, 3))
    y = scale_img(x, 0.83, gs=32)
    assert y.shape[1] % 32 == 0 and y.shape[2] % 32 == 0
    assert y.shape[1] >= int(64 * 0.83)
    # identity fast path
    assert scale_img(x, 1.0).shape == x.shape


def test_tta_forward_shapes():
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    y = tta_forward(model, variables, x, x, gs=4)
    assert y.ndim == 3 and y.shape[0] == 1 and y.shape[2] == 8
    assert bool(jnp.isfinite(y).all())


def test_wbf_merges_overlapping():
    boxes = np.array([[0.1, 0.1, 0.3, 0.3],
                      [0.11, 0.1, 0.31, 0.3],
                      [0.6, 0.6, 0.8, 0.8]])
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([0.0, 0.0, 0.0])
    b, s, l = weighted_boxes_fusion(boxes, scores, labels, iou_thr=0.5)
    assert b.shape[0] == 2
    # fused box is the confidence-weighted mean of the pair
    expect = (boxes[0] * 0.9 + boxes[1] * 0.8) / 1.7
    np.testing.assert_allclose(b[0], expect, atol=1e-6)


def test_wbf_classes_separate():
    boxes = np.tile(np.array([[0.1, 0.1, 0.3, 0.3]]), (2, 1))
    b, s, l = weighted_boxes_fusion(boxes, np.array([0.9, 0.8]),
                                    np.array([0.0, 1.0]), iou_thr=0.5)
    assert b.shape[0] == 2


def test_weighted_boxes_pixel_interface():
    dets = np.array([[10, 10, 30, 30, 0.9, 0],
                     [11, 10, 31, 30, 0.8, 0]], float)
    out = weighted_boxes(dets, image_size=512)
    assert out.shape == (1, 6)


def test_run_logger_jsonl(tmp_path):
    from sodt_tpu.utils.loggers import RunLogger
    lg = RunLogger(tmp_path, use_tb=False)
    lg.log_epoch(0, {"box": 0.1, "obj": 0.2, "cls": 0.3},
                 {"mp": 0.5, "mr": 0.6, "map50": 0.7, "map": 0.4},
                 lrs=(0.01, 0.01, 0.1))
    lg.close()
    rows = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert rows[0]["metrics/mAP_0.5"] == 0.7
    assert rows[0]["x/lr2"] == 0.1


def test_plots_smoke(tmp_path):
    from sodt_tpu.utils.plots import (plot_images, plot_confusion_matrix,
                                      plot_labels, plot_results)
    imgs = np.random.default_rng(0).uniform(size=(2, 32, 32, 3))
    targets = np.zeros((2, 3, 5), np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.2, 0.2]
    masks = np.zeros((2, 3), bool)
    masks[:, 0] = True
    plot_images(imgs, targets, masks, tmp_path / "batch.png",
                names=["a", "b", "c"])
    assert (tmp_path / "batch.png").exists()

    plot_confusion_matrix(np.random.default_rng(0).uniform(size=(4, 4)),
                          tmp_path / "cm.png", names=["a", "b", "c"])
    assert (tmp_path / "cm.png").exists()

    labels = np.concatenate([targets[0], targets[1]])
    plot_labels(labels, tmp_path, nc=3)
    assert (tmp_path / "labels.png").exists()

    with open(tmp_path / "ev.jsonl", "w") as f:
        f.write(json.dumps({"t": 0, "step": 0, "a": 1.0, "b": 2.0}) + "\n")
        f.write(json.dumps({"t": 1, "step": 1, "a": 0.5, "b": 1.0}) + "\n")
    plot_results(tmp_path / "ev.jsonl", tmp_path / "res.png")
    assert (tmp_path / "res.png").exists()


def test_checkpoint_roundtrip(tmp_path):
    from sodt_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                           eval_variables, strip_checkpoint)
    from sodt_tpu.train.state import TrainState
    from sodt_tpu.train.optim import make_optimizer

    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=True)
    hyp = {"lr0": 0.01, "lrf": 0.2, "momentum": 0.9}
    tx = make_optimizer(hyp, variables["params"], epochs=2, nb=1)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    save_checkpoint(tmp_path / "last", state, epoch=3, best_fitness=0.5)
    ckpt = load_checkpoint(tmp_path / "last")
    assert int(ckpt["epoch"]) == 3
    assert float(ckpt["best_fitness"]) == 0.5
    ev = eval_variables(ckpt)
    leaves_a = jax.tree.leaves(ev["params"])
    leaves_b = jax.tree.leaves(state.ema_params)
    np.testing.assert_allclose(np.asarray(leaves_a[0]),
                               np.asarray(leaves_b[0]))
    strip_checkpoint(tmp_path / "last", tmp_path / "final")
    final = load_checkpoint(tmp_path / "final")
    assert "params" in final and "batch_stats" in final
    assert "ema_params" not in final


def test_sam_optimizer_steps():
    from sodt_tpu.train.sam import make_sam_optimizer
    import optax
    hyp = {"lr0": 0.01, "lrf": 0.2, "momentum": 0.9, "warmup_iters": 1}
    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    tx = make_sam_optimizer(hyp, params, epochs=2, nb=1)
    state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["bias"] ** 2)

    # SAM opaque mode needs grad_fn in update; optax contract: pass obj fn
    grads = jax.grad(loss)(params)
    try:
        updates, state = tx.update(grads, state, params,
                                   grad_fn=jax.grad(lambda p, _: loss(p)))
    except TypeError:
        updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(new["w"])).all()


def test_predictor_api():
    from pathlib import Path
    from sodt_tpu.models.infer import Predictor
    from sodt_tpu.models import build_model
    TINY = str(Path(__file__).parent / "tiny.yaml")
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
    pred = Predictor(model, variables, img_size=64, names=["a", "b", "c"])
    img = (np.random.default_rng(0).uniform(0, 255, (80, 100, 3))
           .astype(np.uint8))
    res = pred([img, img])
    assert len(res) == 2
    for d in res.dets:
        assert d.shape[1] == 6
    res.print()


def test_tta_equivariance():
    """De-scale/de-flip algebra (reference model.py:178-183): the identity
    pass must equal the plain decoded forward, and the lr-flip pass must
    equal decode(forward(flip(img))) with x mapped to w - x."""
    from sodt_tpu.models.detect import decode_detections
    from sodt_tpu.train.tta import TTA_SCALES, TTA_FLIPS

    model = build_model(TINY, ch_in=3, input_mode="RGB")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    y = tta_forward(model, variables, x, x, gs=4)

    anchors = np.asarray(model.spec.anchors, np.float32).reshape(
        len(model.spec.anchors), -1, 2)
    strides = model.spec.detect_strides
    direct = decode_detections(
        model.apply(variables, x, x, train=False)["raw"], anchors, strides)
    n1 = direct.shape[1]
    assert TTA_SCALES[0] == 1.0 and TTA_FLIPS[0] is None
    np.testing.assert_allclose(np.asarray(y[:, :n1]), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)

    # pass 2: lr-flip at 0.83 — de-flipped x must match w - x of the
    # flipped-forward decode (de-scaled by 0.83)
    from sodt_tpu.train.tta import scale_img
    xf = scale_img(jnp.flip(x, axis=2), 0.83, 4)
    dec2 = decode_detections(
        model.apply(variables, xf, xf, train=False)["raw"], anchors,
        strides)
    n2 = dec2.shape[1]
    want_x = 64 - np.asarray(dec2[..., 0]) / 0.83
    np.testing.assert_allclose(np.asarray(y[:, n1:n1 + n2, 0]), want_x,
                               rtol=1e-4, atol=1e-4)
    want_y = np.asarray(dec2[..., 1]) / 0.83
    np.testing.assert_allclose(np.asarray(y[:, n1:n1 + n2, 1]), want_y,
                               rtol=1e-4, atol=1e-4)


def test_plot_evolution_and_study_and_lr(tmp_path):
    """Round-3 plot parity: evolve scatter grid, study curve, LR curves."""
    import numpy as np
    from sodt_tpu.utils.plots import (plot_evolution, plot_study,
                                      plot_lr_schedule)
    from sodt_tpu.train.evolve import META
    rows = np.random.default_rng(0).uniform(
        0.0, 1.0, (5, 1 + len(META)))
    ef = tmp_path / "evolve.txt"
    np.savetxt(ef, rows)
    plot_evolution(ef, tmp_path / "evolve.png")
    assert (tmp_path / "evolve.png").stat().st_size > 0
    plot_study([{"img_size": 256, "map50": 0.3, "map": 0.1,
                 "speed_ms": 3.0},
                {"img_size": 512, "map50": 0.5, "map": 0.2,
                 "speed_ms": 7.0}], tmp_path / "study.png")
    assert (tmp_path / "study.png").stat().st_size > 0
    plot_lr_schedule((lambda s: 0.01 * (1 - s / 100),
                      lambda s: 0.1 / (s + 1)), 100, tmp_path / "lr.png")
    assert (tmp_path / "lr.png").stat().st_size > 0


def test_attempt_download_local_and_file_url(tmp_path, monkeypatch):
    from sodt_tpu.utils.downloads import attempt_download

    # existing local path: returned untouched
    payload = b"x" * 150_000  # above the default min_bytes weight-size gate
    src = tmp_path / "weights.pt"
    src.write_bytes(payload)
    assert attempt_download(str(src)) == str(src)

    # missing path + SODT_WEIGHTS_BASE: fetched from the base (file:// URL
    # keeps the test offline, mirroring google_utils.py:16-58 semantics)
    monkeypatch.setenv("SODT_WEIGHTS_BASE", tmp_path.as_uri())
    dst = tmp_path / "sub" / "weights.pt"
    out = attempt_download(str(dst))
    assert out == str(dst) and dst.read_bytes() == payload

    # missing path, no source: passthrough (loader raises its own error)
    monkeypatch.delenv("SODT_WEIGHTS_BASE")
    assert attempt_download(str(tmp_path / "nope.pt")) == str(
        tmp_path / "nope.pt")

    # too-small download is rejected and no partial file is left
    tiny = tmp_path / "tiny.bin"
    tiny.write_bytes(b"z")
    import pytest

    with pytest.raises(OSError):
        attempt_download(str(tmp_path / "d" / "tiny.bin"),
                         url=tiny.as_uri(), min_bytes=32)
    assert not (tmp_path / "d" / "tiny.bin").exists()
    assert not (tmp_path / "d" / "tiny.bin.part").exists()

    # a cached URL entry below the size gate (poisoned fetch, e.g. an HTML
    # error page saved by an older laxer gate) is dropped and refetched
    monkeypatch.setenv("SODT_WEIGHTS_CACHE", str(tmp_path / "cache"))
    url = src.as_uri()
    cached = Path(attempt_download(url))
    assert cached.read_bytes() == payload
    cached.write_bytes(b"<html>error</html>")  # poison the cache entry
    assert Path(attempt_download(url)).read_bytes() == payload


def test_per_class_csv(tmp_path):
    from sodt_tpu.utils.metrics import write_per_class_csv

    m = dict(mp=0.5, mr=0.25, map50=0.75, map=0.3,
             per_class={1: dict(p=0.4, r=0.2, ap50=0.7, ap=0.28)})
    path = tmp_path / "per_class.csv"
    write_per_class_csv(m, ["car", "truck"], path)
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "class,name,P,R,mAP50,mAP"
    assert lines[1].startswith("all,all,0.5,0.25,0.75,0.3")
    assert lines[2] == "1,truck,0.4,0.2,0.7,0.28"


def test_resume_config_reloads_opt_yaml(tmp_path):
    import yaml

    import train as train_cli
    from sodt_tpu.train.trainer import TrainConfig

    run = tmp_path / "runs" / "exp"
    ckpt = run / "last"
    ckpt.mkdir(parents=True)
    opt = {k: (list(v) if isinstance(v, tuple) else v)
           for k, v in TrainConfig(epochs=7, seed=3, img_size=256,
                                   freeze=("backbone",)).__dict__.items()}
    (run / "opt.yaml").write_text(yaml.dump(opt))

    tc = train_cli.parse_args(["--resume", str(ckpt), "--epochs", "999"])
    # opt.yaml wins over other CLI flags (reference Train.py resume flow)
    assert tc.epochs == 7 and tc.seed == 3 and tc.img_size == 256
    assert tc.freeze == ("backbone",)
    assert tc.resume == str(ckpt)

    # no opt.yaml next to the checkpoint: plain CLI flags apply
    lone = tmp_path / "lone"
    lone.mkdir()
    tc2 = train_cli.parse_args(["--resume", str(lone / "last"),
                                "--epochs", "5"])
    assert tc2.epochs == 5 and tc2.resume == str(lone / "last")
