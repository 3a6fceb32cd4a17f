"""Data pipeline tests: path derivation, synthetic dataset, device
augmentation geometry, loaders, autoanchor, dataset prep."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sodt_tpu.data.vedai import derive_ir_path, derive_label_path
from sodt_tpu.data.synthetic import SyntheticVedai
from sodt_tpu.data.loader import (pad_labels, make_train_batches,
                                  make_eval_batches)
from sodt_tpu.data.augment import (affine_sample, box_candidates,
                                   warp_labels, hsv_augment, mosaic4,
                                   flips)
from sodt_tpu.data.prepare import update_annotation_row, CLASS_REMAP
from sodt_tpu.utils.autoanchor import (anchor_metric, kmean_anchors,
                                       check_anchors)


def test_path_derivation():
    # reference rules: datasets.py:368-376
    p = "/data/VEDAI/images/00000001_co.png"
    assert derive_ir_path(p) == "/data/VEDAI/images/00000001_ir.png"
    assert derive_label_path(p) == "/data/VEDAI/labels/00000001.txt"


def test_synthetic_dataset_shapes():
    ds = SyntheticVedai(n=4, img_size=64, nc=8)
    rgb, ir, labels = ds[0]
    assert rgb.shape == (64, 64, 3) and rgb.dtype == np.uint8
    assert ir.shape == (64, 64, 3)
    assert labels.shape[1] == 5
    assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()
    # deterministic
    rgb2, _, labels2 = ds[0]
    np.testing.assert_array_equal(rgb, rgb2)
    np.testing.assert_array_equal(labels, labels2)


def test_pad_labels():
    out, mask = pad_labels(np.ones((3, 5), np.float32), 8)
    assert out.shape == (8, 5) and mask.sum() == 3
    out, mask = pad_labels(np.ones((12, 5), np.float32), 8)
    assert mask.sum() == 8  # truncates


def test_affine_sample_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (16, 16, 3)).astype(np.float32))
    out = affine_sample(img, jnp.eye(3), (16, 16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_affine_sample_translation_pads():
    img = jnp.ones((8, 8, 1), jnp.float32) * 50
    # inverse maps output (x,y) -> input (x-4, y): right half comes from the
    # image, left half out-of-bounds -> 114
    minv = jnp.asarray([[1, 0, -4], [0, 1, 0], [0, 0, 1]], jnp.float32)
    out = np.asarray(affine_sample(img, minv, (8, 8)))
    assert (out[:, 4:] == 50).all()
    assert (out[:, :3] == 114).all()


def test_box_candidates():
    b1 = jnp.asarray([[0, 0, 100, 100], [0, 0, 100, 100],
                      [0, 0, 100, 100]], jnp.float32)
    b2 = jnp.asarray([
        [0, 0, 50, 50],      # ok: area ratio 0.25
        [0, 0, 1, 50],       # too thin (w < 2)
        [0, 0, 9, 9],        # area ratio 0.0081 < 0.1
    ], jnp.float32)
    keep = np.asarray(box_candidates(b1, b2))
    assert keep.tolist() == [True, False, False]


def test_warp_labels_identity():
    labels = jnp.asarray([[10, 10, 30, 30]], jnp.float32)
    mask = jnp.asarray([True])
    new, keep = warp_labels(labels, mask, jnp.eye(3), (64, 64))
    np.testing.assert_allclose(np.asarray(new), [[10, 10, 30, 30]], atol=1e-4)
    assert bool(keep[0])


def test_hsv_augment_zero_gain_is_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (8, 8, 3)).astype(np.float32))
    out = hsv_augment(img, jax.random.PRNGKey(0), 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.5)


def test_hsv_preserves_range():
    img = jnp.asarray(np.random.default_rng(1).uniform(
        0, 255, (8, 8, 3)).astype(np.float32))
    out = np.asarray(hsv_augment(img, jax.random.PRNGKey(1)))
    assert out.min() >= -1e-3 and out.max() <= 255.001


def test_mosaic4_labels_inside_canvas():
    s = 32
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (4, s, s, 3)).astype(np.float32))
    irs = imgs
    labels = jnp.asarray(
        np.tile(np.array([[4, 4, 12, 12]], np.float32), (4, 1))[:, None])
    masks = jnp.ones((4, 1), bool)
    canvas, canvas_ir, out, mask = mosaic4(imgs, irs, labels, masks,
                                           jax.random.PRNGKey(0), s)
    assert canvas.shape == (2 * s, 2 * s, 3)
    out = np.asarray(out)
    assert (out >= 0).all() and (out <= 2 * s).all()
    assert np.asarray(mask).all()


def test_flips_lr():
    img = jnp.arange(4 * 4 * 1, dtype=jnp.float32).reshape(4, 4, 1)
    labels = jnp.asarray([[0, 0.25, 0.5, 0.1, 0.1]], jnp.float32)
    mask = jnp.asarray([True])
    # fliplr_p=1.0 forces the flip
    img2, _, lab2, _ = flips(img, img, labels, mask, jax.random.PRNGKey(0),
                             flipud_p=0.0, fliplr_p=1.0)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img[:, ::-1]))
    assert float(lab2[0, 1]) == pytest.approx(0.75)
    assert float(lab2[0, 2]) == pytest.approx(0.5)


def test_train_batches_shapes_and_determinism():
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = {"translate": 0.1, "scale": 0.5, "fliplr": 0.5, "mixup": 0.0}
    b1 = next(make_train_batches(ds, 2, 64, hyp, seed=7))
    b2 = next(make_train_batches(ds, 2, 64, hyp, seed=7))
    np.testing.assert_allclose(np.asarray(b1["img"]), np.asarray(b2["img"]))
    assert b1["img"].shape == (2, 64, 64, 3)
    assert float(b1["img"].max()) <= 1.0


def test_eval_batches_padding():
    ds = SyntheticVedai(n=5, img_size=64, nc=8)
    batches = list(make_eval_batches(ds, 2, 64))
    assert len(batches) == 3
    assert batches[-1]["valid"] == 1
    assert batches[-1]["img"].shape == (2, 64, 64, 3)
    # images ride the host->device wire as uint8 (the eval step casts)
    assert batches[0]["img"].dtype == jnp.uint8


def test_device_bank_matches_streaming():
    """The device-bank feed regime (tiles resident in HBM, per-step
    transfer = indices + keys) must produce bit-identical batches to the
    streaming regime at the same seed."""
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = {"mosaic": 1.0, "fliplr": 0.5, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "translate": 0.1, "scale": 0.5}
    stream = make_train_batches(ds, 2, 64, hyp, seed=3, device_bank=False)
    bank = make_train_batches(ds, 2, 64, hyp, seed=3, device_bank=True)
    for _ in range(5):
        bs, bb = next(stream), next(bank)
        np.testing.assert_allclose(np.asarray(bs["img"]),
                                   np.asarray(bb["img"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bs["targets"]),
                                   np.asarray(bb["targets"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(bs["tmask"]),
                                      np.asarray(bb["tmask"]))


def test_device_bank_mixup_and_mosaic_p():
    """Bank regime composes with mixup and per-sample mosaic gating."""
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = {"mosaic": 0.5, "mixup": 0.5, "fliplr": 0.5, "translate": 0.1,
           "scale": 0.5}
    stream = make_train_batches(ds, 2, 64, hyp, seed=5, device_bank=False)
    bank = make_train_batches(ds, 2, 64, hyp, seed=5, device_bank=True)
    for _ in range(3):
        bs, bb = next(stream), next(bank)
        np.testing.assert_allclose(np.asarray(bs["img"]),
                                   np.asarray(bb["img"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(bs["tmask"]),
                                      np.asarray(bb["tmask"]))


def test_eval_step_accepts_uint8():
    """u8 eval batches score identically to pre-scaled f32 ones."""
    from pathlib import Path as _P
    from sodt_tpu.models import build_model
    from sodt_tpu.train.evaluate import make_eval_step
    model = build_model(str(_P(__file__).parent / "tiny.yaml"), ch_in=3,
                        input_mode="RGB")
    ds = SyntheticVedai(n=2, img_size=64, nc=8)
    b = next(make_eval_batches(ds, 2, 64))
    xf = b["img"].astype(jnp.float32) / 255.0
    irf = b["ir"].astype(jnp.float32) / 255.0
    variables = model.init(jax.random.PRNGKey(0), xf, irf, train=False)
    step = make_eval_step(model, top_k=64, max_det=10)
    d_u8, v_u8, _ = step(variables, b["img"], b["ir"])
    d_f32, v_f32, _ = step(variables, xf, irf)
    np.testing.assert_allclose(np.asarray(d_u8), np.asarray(d_f32),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(v_u8), np.asarray(v_f32))


def test_anchor_metric_perfect():
    wh = np.array([[10.0, 13.0], [33, 23]])
    k = np.array([[10.0, 13], [16, 30], [33, 23]])
    bpr, aat = anchor_metric(wh, k, thr=4.0)
    assert bpr == 1.0


def test_kmeans_anchors_recovers_clusters():
    rng = np.random.default_rng(0)
    truth = np.array([[10, 10], [40, 40], [100, 60]])
    labels, shapes = [], []
    for _ in range(50):
        wh = truth[rng.integers(0, 3, 8)] * rng.uniform(0.95, 1.05, (8, 2))
        lab = np.zeros((8, 5), np.float32)
        lab[:, 3:5] = wh / 640
        labels.append(lab)
        shapes.append([640, 640])
    k = kmean_anchors(labels, np.asarray(shapes, float), n=3, img_size=640,
                      gen=100, seed=0)
    k = k[np.argsort(k.prod(1))]
    assert np.abs(k - truth).max() / truth.max() < 0.15


def test_check_anchors_keeps_good():
    labels = [np.array([[0, 0.5, 0.5, 10 / 640, 13 / 640]], np.float32)]
    shapes = np.array([[640.0, 640]])
    anchors = np.array([[[10.0, 13], [16, 30], [33, 23]]])
    out, changed, bpr = check_anchors(labels, shapes, anchors,
                                      img_size=640)
    assert not changed and bpr == 1.0


def test_update_annotation_row():
    # 14-column raw VEDAI record (data_transform.py:12): centers,
    # orientation, class, flags, 4 corner xs, 4 corner ys
    row = [125, 125, 0.3, 1, 0, 0, 100, 150, 150, 100, 100, 100, 150, 150]
    out = update_annotation_row(row, 512, 512)
    cls, cx, cy, w, h = out
    assert cls == CLASS_REMAP[1] == 0
    assert cx == pytest.approx(125 / 512)  # from the center COLUMN
    assert w == pytest.approx(50 / 512)    # from the corner extent
    # final class > 7 is dropped (raw 8 = buses, data_transform.py:27)
    dropped = list(row)
    dropped[3] = 8
    assert update_annotation_row(dropped, 512, 512) is None
    # raw 7 (motorcycles) is never remapped and survives as class 7,
    # aliasing vans — the reference's sequential-replace quirk
    moto = list(row)
    moto[3] = 7
    assert update_annotation_row(moto, 512, 512)[0] == 7


def test_prepare_pipeline_reference_format(tmp_path):
    """L0 end-to-end on the reference's on-disk format: per-image raw
    annotation txts -> YOLO labels + fold rewrite (data_transform.py)."""
    from sodt_tpu.data.prepare import makelabels, changepath

    ann = tmp_path / "Annotations512"
    ann.mkdir()
    ann.joinpath("00000001.txt").write_text(
        "125 125 0.3 1 0 0 100 150 150 100 100 100 150 150\n"
        "300 300 0.0 31 0 0 280 320 320 280 280 280 320 320\n")  # 31 dropped
    ann.joinpath("00000002.txt").write_text(
        "60 80 0.0 9 0 0 50 70 70 50 70 70 90 90\n")
    n = makelabels(str(ann), str(tmp_path / "labels"), 512.0)
    assert n == 2
    l1 = np.loadtxt(tmp_path / "labels" / "00000001.txt", ndmin=2)
    assert l1.shape == (1, 5) and l1[0, 0] == 0
    l2 = np.loadtxt(tmp_path / "labels" / "00000002.txt", ndmin=2)
    assert l2[0, 0] == 7  # van (raw 9 -> 7)

    fold = tmp_path / "fold01.txt"
    fold.write_text("00000001\n00000002\n")
    changepath(str(fold), str(tmp_path / "fold01_write.txt"),
               str(tmp_path / "images"), suffix="_co.png")
    lines = (tmp_path / "fold01_write.txt").read_text().splitlines()
    assert lines[0].endswith("images/00000001_co.png")


def test_label_cache_invalidates_on_same_size_edit(tmp_path):
    """Editing label contents without changing total byte size must bust the
    .labels.npz cache (round-1 ADVICE: size-sum key served stale labels)."""
    import cv2
    from sodt_tpu.data.vedai import VedaiDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = np.zeros((16, 16, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a_co.png"), img)
    cv2.imwrite(str(tmp_path / "images" / "a_ir.png"), img[..., 0])
    lf = tmp_path / "labels" / "a.txt"
    lf.write_text("0 0.5 0.5 0.2 0.2\n")
    lst = tmp_path / "fold.txt"
    lst.write_text(str(tmp_path / "images" / "a_co.png") + "\n")

    ds1 = VedaiDataset(str(lst), img_size=16)
    assert ds1.labels[0][0, 0] == 0
    # same byte length, different class; force a different mtime
    import os
    lf.write_text("3 0.5 0.5 0.2 0.2\n")
    st = lf.stat()
    os.utime(lf, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    ds2 = VedaiDataset(str(lst), img_size=16)
    assert ds2.labels[0][0, 0] == 3


def test_train_batches_no_mixup_skips_secondary_block():
    """With mixup off the schedule submits only the primary 4-tile block
    (half the decode/H2D traffic) and target capacity stays M."""
    from sodt_tpu.data.loader import _step_indices
    rng = np.random.default_rng(0)
    prim, sec = _step_indices(rng, np.arange(8), 0, 2, 8, use_mixup=False)
    assert sec is None and prim.shape == (2, 4)
    prim, sec = _step_indices(rng, np.arange(8), 0, 2, 8, use_mixup=True)
    assert sec.shape == (2, 4)

    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = {"mixup": 0.0, "fliplr": 0.5}
    it = make_train_batches(ds, 2, 64, hyp, seed=0, prefer_native=False,
                            max_labels_per_image=10)
    b = next(it)
    assert b["targets"].shape == (2, 40, 5)  # 4 tiles x M
    hyp2 = {"mixup": 1.0, "fliplr": 0.5}
    it2 = make_train_batches(ds, 2, 64, hyp2, seed=0, prefer_native=False,
                             max_labels_per_image=10)
    b2 = next(it2)
    assert b2["targets"].shape == (2, 80, 5)  # concat of both mosaics


def test_stream_source_threaded(tmp_path):
    """LoadStreams-equivalent: threaded latest-frame reader over a video
    'stream' (datasets.py:238-365 semantics)."""
    import time
    cv2 = pytest.importorskip("cv2")
    from sodt_tpu.data.streams import StreamSource, is_stream_source

    assert is_stream_source("0")
    assert is_stream_source("rtsp://cam/1")
    assert is_stream_source("list.streams")
    assert not is_stream_source("images/img_co.png")

    vid = tmp_path / "s.avi"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 30,
                         (32, 24))
    for i in range(30):
        frame = np.full((24, 32, 3), i * 8 % 255, np.uint8)
        wr.write(frame)
    wr.release()

    lst = tmp_path / "cams.streams"
    lst.write_text(f"{vid}\n")
    with StreamSource(str(lst), max_fps=120) as src:
        assert len(src) == 1
        names, frames = next(src)
        assert names == [str(vid)]
        assert frames[0].shape == (24, 32, 3)
        time.sleep(0.1)
        _, frames2 = next(src)
        assert frames2[0].shape == (24, 32, 3)
    # after close, iteration stops
    with pytest.raises(StopIteration):
        next(src)


def test_mosaic_probability_gates_per_sample():
    """hyp['mosaic'] gates mosaic per sample (reference datasets.py:541):
    0.0 must yield the letterbox-only branch (datasets.py:580-607) whose
    geometry, with augmentation zeroed, is the identity on tile 0."""
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    noaug = {"mixup": 0.0, "fliplr": 0.0, "flipud": 0.0, "translate": 0.0,
             "scale": 0.0, "degrees": 0.0, "shear": 0.0, "hsv_h": 0.0,
             "hsv_s": 0.0, "hsv_v": 0.0}
    b = next(make_train_batches(ds, 2, 64, {**noaug, "mosaic": 0.0},
                                seed=3, prefer_native=False,
                                max_labels_per_image=10))
    # letterbox-only: capacity stays M (no 4-tile concat)
    assert b["targets"].shape == (2, 10, 5)
    # identity geometry: the image IS the first scheduled tile
    order = np.random.default_rng(3).permutation(8)
    rgb0, _, lab0 = ds[int(order[0])]
    np.testing.assert_allclose(np.asarray(b["img"][0]),
                               rgb0.astype(np.float32) / 255.0, atol=1e-5)
    # labels match the dataset's xywhn rows for that tile
    got = np.asarray(b["targets"][0][np.asarray(b["tmask"][0])])
    np.testing.assert_allclose(np.sort(got[:, 1]), np.sort(lab0[:, 1]),
                               atol=1e-5)

    # mosaic: 1.0 keeps the mosaic capacity and differs from the tile
    bm = next(make_train_batches(ds, 2, 64, {**noaug, "mosaic": 1.0},
                                 seed=3, prefer_native=False,
                                 max_labels_per_image=10))
    assert bm["targets"].shape == (2, 40, 5)

    # intermediate probability compiles and yields both capacities padded
    bp = next(make_train_batches(ds, 2, 64, {**noaug, "mosaic": 0.5},
                                 seed=3, prefer_native=False,
                                 max_labels_per_image=10))
    assert bp["targets"].shape == (2, 40, 5)


def test_make_train_batches_mosaic_flag_not_dead():
    """The mosaic= parameter must force the non-mosaic path (round-2
    verdict: it was accepted and ignored)."""
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = {"mixup": 0.0, "mosaic": 1.0}
    b = next(make_train_batches(ds, 2, 64, hyp, seed=0, mosaic=False,
                                prefer_native=False,
                                max_labels_per_image=10))
    assert b["targets"].shape == (2, 10, 5)


def test_integrity_scan_excludes_corrupt(tmp_path):
    """Cache-time integrity scan (reference datasets.py:768-795): a corrupt
    png and a duplicate-row label file are excluded at construction, not
    surfaced as a mid-epoch decode exception."""
    from PIL import Image as PILImage
    from sodt_tpu.data.vedai import VedaiDataset
    co = tmp_path / "images"; co.mkdir()
    lb = tmp_path / "labels"; lb.mkdir()
    names = ["a", "b", "c"]
    for n in names:
        PILImage.new("RGB", (32, 32)).save(co / f"{n}_co.png")
        PILImage.new("RGB", (32, 32)).save(co / f"{n}_ir.png")
        (lb / f"{n}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    # corrupt b's rgb png; duplicate rows in c's label
    (co / "b_co.png").write_bytes(b"\x89PNG\r\n\x1a\nnot a real png")
    (lb / "c.txt").write_text("0 0.5 0.5 0.2 0.2\n0 0.5 0.5 0.2 0.2\n")
    lst = tmp_path / "train.txt"
    lst.write_text("".join(f"{co}/{n}_co.png\n" for n in names))
    ds = VedaiDataset(str(lst), img_size=32)
    assert len(ds) == 1
    assert ds.img_files[0].endswith("a_co.png")
    # cache hit preserves the exclusion
    ds2 = VedaiDataset(str(lst), img_size=32)
    assert len(ds2) == 1


def test_dataset_tools(tmp_path):
    """flatten_recursive / extract_boxes / autosplit (datasets.py:1334-1392)."""
    from PIL import Image as PILImage
    from sodt_tpu.data.tools import (flatten_recursive, extract_boxes,
                                     autosplit)
    images = tmp_path / "images"
    (images / "sub").mkdir(parents=True)
    lb = tmp_path / "labels"; lb.mkdir()
    PILImage.new("RGB", (64, 64), (200, 30, 30)).save(images / "x_co.png")
    PILImage.new("RGB", (64, 64)).save(images / "sub" / "y_co.png")
    (lb / "x.txt").write_text("2 0.5 0.5 0.5 0.5\n0 0.25 0.25 0.2 0.2\n")

    flat = flatten_recursive(str(images))
    assert sorted(p.name for p in flat.iterdir()) == ["x_co.png",
                                                      "y_co.png"]

    txts = autosplit(str(images), weights=(0.5, 0.5, 0.0), seed=0)
    listed = sum(len(t.read_text().splitlines())
                 for t in txts if t.exists())
    assert listed == 2  # both images assigned to some split

    out = extract_boxes(str(images))
    crops = sorted(str(p.relative_to(out)) for p in out.rglob("*.jpg"))
    assert any(c.startswith("2/") for c in crops)
    assert any(c.startswith("0/") for c in crops)


class _RectDS:
    """Non-square toy dataset for rect batching tests."""

    def __init__(self):
        # (h, w) pairs: two wide, two tall
        self.shapes = [(64, 128), (60, 128), (128, 64), (128, 56)]
        self.labels = [np.array([[0, 0.5, 0.5, 0.25, 0.25]], np.float32)
                       for _ in self.shapes]

    def __len__(self):
        return len(self.shapes)

    def __getitem__(self, i):
        h, w = self.shapes[i]
        rgb = np.full((h, w, 3), 100, np.uint8)
        return rgb, rgb.copy(), self.labels[i].copy()


def test_rect_eval_batches():
    """Rect batching (datasets.py:724-747): aspect-sorted groups, per-batch
    ceil-to-stride shapes with pad 0.5, labels remapped into the
    letterboxed frame, net_shape carried for evaluation."""
    ds = _RectDS()
    batches = list(make_eval_batches(ds, 2, 64, rect=True, stride=32))
    assert len(batches) == 2
    for b in batches:
        bh, bw = b["net_shape"]
        assert bh % 32 == 0 and bw % 32 == 0
        assert b["img"].shape[1:3] == (bh, bw)
    # wide images (ar < 1) batch together with bh < bw; tall the reverse
    shapes = sorted(tuple(b["net_shape"]) for b in batches)
    assert shapes[0][0] < shapes[0][1]   # wide batch
    assert shapes[1][0] > shapes[1][1]   # tall batch
    # a centered box stays centered after letterboxing
    for b in batches:
        t = np.asarray(b["targets"])[0]
        m = np.asarray(b["tmask"])[0]
        row = t[m][0]
        np.testing.assert_allclose(row[1:3], [0.5, 0.5], atol=0.02)


def test_rect_eval_end_to_end():
    """evaluate() consumes rect batches (net_shape flows into GT and
    export geometry) without shape errors."""
    from pathlib import Path as _P
    from sodt_tpu.models import build_model
    from sodt_tpu.train.evaluate import evaluate
    model = build_model(str(_P(__file__).parent / "tiny.yaml"), ch_in=3,
                        input_mode="RGB")
    ds = _RectDS()
    b0 = next(make_eval_batches(ds, 2, 64, rect=True, stride=32))
    # eval batches ride uint8; the eval step casts — init casts here
    x0 = b0["img"].astype(jnp.float32) / 255.0
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
    m = evaluate(model, variables,
                 make_eval_batches(ds, 2, 64, rect=True, stride=32),
                 nc=8, img_size=64)
    assert m["seen"] == 4


def test_rect_export_ratio_pad_roundtrip():
    """--rect export must invert the ACTUAL letterbox (scaleup=False clamps
    gain to 1.0 with padding); recomputing gain from shapes would shrink
    every exported box. The batch carries ratio_pads for scale_coords."""
    from sodt_tpu.ops.boxes import scale_coords, xywhn2xyxy
    ds = SyntheticVedai(n=4, img_size=512, nc=8)
    b = next(make_eval_batches(ds, 2, 512, rect=True, stride=32))
    assert "ratio_pads" in b
    bh, bw = b["img"].shape[1:3]
    assert (bh, bw) == (544, 544)  # ceil(512*1.0/32 + 0.5)*32
    (r,), (dw, dh) = b["ratio_pads"][0]
    assert r == 1.0 and dw == 16.0 and dh == 16.0
    # targets were letterboxed into net space; exporting back with the
    # carried ratio_pad must recover the native-frame GT exactly
    tm = np.asarray(b["tmask"][0])
    t_net = np.asarray(xywhn2xyxy(b["targets"][0][..., 1:5], bw, bh))[tm]
    back = np.asarray(scale_coords((bh, bw), jnp.asarray(t_net),
                                   (512, 512), ratio_pad=((r,), (dw, dh))))
    gt = np.asarray(xywhn2xyxy(
        jnp.asarray(ds.labels[int(b["indices"][0])][:, 1:5]), 512, 512))
    np.testing.assert_allclose(back[:, :4], gt, atol=0.6)


class _RectDs:
    """Tiny mixed-aspect dataset for rect-training tests: (rgb, ir, lab)
    with labels cls+xywhn, like VedaiDataset."""

    def __init__(self, shapes, seed=0):
        self.shapes = shapes
        rng = np.random.default_rng(seed)
        self.labels = [np.array([[1, 0.5, 0.5, 0.2, 0.3],
                                 [0, 0.3, 0.6, 0.1, 0.1]], np.float32)
                       for _ in shapes]
        self._rng = rng

    def __len__(self):
        return len(self.shapes)

    def __getitem__(self, i):
        h, w = self.shapes[i]
        rng = np.random.default_rng(100 + i)
        rgb = rng.integers(0, 255, (h, w, 3), np.uint8)
        return rgb, rgb.copy(), self.labels[i].copy()


def test_rect_train_batches_mixed_aspect():
    """Rect training: AR-grouped batches each get their own static
    stride-multiple shape; labels stay normalized; wide and tall images
    land in different batches (reference datasets.py:724-747)."""
    from sodt_tpu.data.loader import make_rect_train_batches
    shapes = [(64, 128)] * 4 + [(128, 64)] * 4        # wide + tall
    ds = _RectDs(shapes)
    hyp = {"degrees": 0.0, "translate": 0.05, "scale": 0.2, "shear": 0.0,
           "perspective": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
           "flipud": 0.0, "fliplr": 0.5}
    seen_shapes = set()
    it = make_rect_train_batches(ds, 4, 128, hyp, seed=0, epochs=2,
                                 max_labels_per_image=8)
    nb = 0
    for b in it:
        nb += 1
        bh, bw = b["net_shape"]
        assert bh % 32 == 0 and bw % 32 == 0
        assert b["img"].shape == (4, bh, bw, 3)
        assert b["img"].dtype == jnp.float32
        assert float(b["img"].min()) >= 0 and float(b["img"].max()) <= 1
        t = np.asarray(b["targets"])
        m = np.asarray(b["tmask"])
        assert t.shape == (4, 8, 5) and m.shape == (4, 8)
        assert (t[m][:, 1:] >= -1e-6).all() and (t[m][:, 1:] <= 1 + 1e-6).all()
        seen_shapes.add((bh, bw))
    assert nb == 4  # 2 groups x 2 epochs
    # wide (ar=0.5) -> (64, 128); tall (ar=2.0) -> (128, 64)
    assert seen_shapes == {(64, 128), (128, 64)}


def test_rect_train_batches_square_dataset_is_one_shape():
    """On a square dataset (VEDAI: uniformly 1024x1024) rect training
    degenerates to exactly ONE square shape == img_size — the measured
    no-op that justified not porting it earlier; now it simply holds."""
    from sodt_tpu.data.loader import make_rect_train_batches
    from sodt_tpu.data.synthetic import SyntheticVedai
    ds = SyntheticVedai(n=8, img_size=96)
    hyp = {"translate": 0.05, "scale": 0.2, "fliplr": 0.5}
    shapes = {b["net_shape"]
              for b in make_rect_train_batches(ds, 4, 96, hyp, seed=0,
                                               epochs=1)}
    assert shapes == {(96, 96)}


def test_rect_train_batches_remainder_images_are_seen():
    """n % batch_size != 0: the tail AR-group is padded to batch_size by
    cycling its own members, so EVERY image is yielded each epoch (the
    reference keeps a smaller last batch, datasets.py:735; a fixed-shape
    feed pads instead of dropping the highest-AR tail forever)."""
    from sodt_tpu.data.loader import make_rect_train_batches

    seen: set[int] = set()

    class _Tracking(_RectDs):
        def __getitem__(self, i):
            seen.add(int(i))
            return super().__getitem__(i)

    shapes = [(64, 128)] * 4 + [(128, 64)] * 6        # n=10, bs=4 -> rem 2
    ds = _Tracking(shapes)
    hyp = {"translate": 0.05, "scale": 0.2, "fliplr": 0.5}
    nb = sum(1 for _ in make_rect_train_batches(
        ds, 4, 128, hyp, seed=0, epochs=1, max_labels_per_image=8))
    assert nb == 3                                    # ceil(10 / 4)
    assert seen == set(range(10))                     # nothing dropped


def test_multi_scale_shape_stream_syncs_across_processes():
    """The per-step scale-bucket stream is governed by scale_seed ALONE:
    even loaders with different sample seeds must draw identical per-step
    buckets when sharing a scale_seed, or the global batch shape would
    disagree across hosts mid-step (SPMD shape mismatch). (The trainer
    itself now shares one seed and partitions rows — see
    test_multi_host_partition_assembles_single_host_stream — but the
    shape stream must be robust independently.)"""
    from sodt_tpu.data.synthetic import SyntheticVedai
    from sodt_tpu.data.loader import make_train_batches

    ds = SyntheticVedai(n=8, img_size=64, nc=3)
    hyp = {"mosaic": 0.0, "translate": 0.1, "scale": 0.5, "fliplr": 0.5}

    def shapes_and_checksums(seed, scale_seed):
        # wide buckets: at 64px the default +/-25% rounds back to 64
        it = make_train_batches(ds, 2, 64, hyp, seed=seed, epochs=2,
                                multi_scale=True, scale_seed=scale_seed,
                                multi_scale_buckets=(0.5, 1.0, 1.5),
                                device_bank=False, prefer_native=False)
        shp, chk = [], []
        for b in it:
            shp.append(tuple(b["img"].shape))
            chk.append(float(jnp.sum(b["img"])))
        return shp, chk

    s0, c0 = shapes_and_checksums(seed=3, scale_seed=3)
    s1, c1 = shapes_and_checksums(seed=3 + 1_000_003, scale_seed=3)
    assert s0 == s1                       # shape streams identical
    assert c0 != c1                       # sample streams differ
    assert len({s[1] for s in s0}) > 1    # multi-scale actually varies


@pytest.mark.parametrize("device_bank", [False, True])
def test_multi_host_partition_assembles_single_host_stream(device_bank):
    """DistributedSampler-equivalent multi-host feed (datasets.py:107):
    every process computes the global schedule from the shared seed and
    consumes a disjoint row slice; concatenating the process slices must
    reproduce the single-process global batches bit-for-bit, for both the
    streaming and the device-bank feed regimes."""
    from sodt_tpu.data.synthetic import SyntheticVedai
    from sodt_tpu.data.loader import make_train_batches

    ds = SyntheticVedai(n=8, img_size=64, nc=3)
    hyp = {"mosaic": 1.0, "translate": 0.1, "scale": 0.5, "fliplr": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "mixup": 0.5}

    def run(pi, pc):
        return list(make_train_batches(
            ds, 4, 64, hyp, seed=7, epochs=2, device_bank=device_bank,
            prefer_native=False, process_index=pi, process_count=pc))

    glob = run(0, 1)
    p0, p1 = run(0, 2), run(1, 2)
    assert len(glob) == len(p0) == len(p1) == 4
    for g, a, b in zip(glob, p0, p1):
        assert a["img"].shape[0] == b["img"].shape[0] == 2
        for k in ("img", "ir", "targets", "tmask"):
            merged = np.concatenate([np.asarray(a[k]), np.asarray(b[k])])
            np.testing.assert_array_equal(merged, np.asarray(g[k]))
