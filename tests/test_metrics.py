"""AP / matching / confusion-matrix math checks."""

import numpy as np
import pytest

from sodt_tpu.utils.metrics import (
    fitness, compute_ap, ap_per_class, match_predictions, ConfusionMatrix,
)


def test_fitness_weights():
    x = np.array([[0.5, 0.5, 0.8, 0.4]])
    assert fitness(x)[0] == pytest.approx(0.9 * 0.8 + 0.1 * 0.4)


def test_compute_ap_perfect_detector():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    ap, _, _ = compute_ap(recall, precision)
    assert ap == pytest.approx(1.0, abs=0.02)  # 101-pt interp edge effects


def test_compute_ap_zero_precision():
    # single-point degenerate curve: the (recall 0, precision 1) sentinel
    # makes the interpolated area 0.5 — same as the reference math
    ap, _, _ = compute_ap(np.array([1.0]), np.array([0.0]))
    assert ap == pytest.approx(0.5, abs=0.02)
    # a longer all-zero-precision curve tends to 0
    ap, _, _ = compute_ap(np.linspace(0.01, 1, 100), np.zeros(100))
    assert ap == pytest.approx(0.0, abs=0.02)


def test_ap_per_class_simple():
    # 2 detections of class 0: one TP, one FP; 1 GT
    tp = np.array([[1], [0]], dtype=bool)
    conf = np.array([0.9, 0.8])
    pred_cls = np.array([0.0, 0.0])
    target_cls = np.array([0.0])
    p, r, ap, f1, cls = ap_per_class(tp, conf, pred_cls, target_cls)
    assert cls.tolist() == [0]
    assert ap[0, 0] == pytest.approx(1.0, abs=0.02)  # TP ranked first


def test_match_predictions_basic():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([
        [0, 0, 10, 10, 0.9, 0],     # perfect match to GT0
        [100, 100, 110, 110, 0.8, 0],  # no GT
    ], dtype=float)
    labels = np.array([[0, 0, 0, 10, 10]], dtype=float)
    correct = match_predictions(det, labels, iouv)
    assert correct[0].all()       # IoU 1.0 beats every threshold
    assert not correct[1].any()


def test_match_predictions_one_gt_per_det():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([
        [0, 0, 10, 10, 0.9, 0],
        [0, 0, 10, 10, 0.8, 0],   # duplicate: must NOT match same GT
    ], dtype=float)
    labels = np.array([[0, 0, 0, 10, 10]], dtype=float)
    correct = match_predictions(det, labels, iouv)
    assert correct[0, 0] and not correct[1, 0]


def test_match_predictions_class_must_agree():
    iouv = np.array([0.5])
    det = np.array([[0, 0, 10, 10, 0.9, 1]], dtype=float)
    labels = np.array([[0, 0, 0, 10, 10]], dtype=float)
    correct = match_predictions(det, labels, iouv)
    assert not correct.any()


def test_confusion_matrix_tp_and_background():
    cm = ConfusionMatrix(nc=2, conf=0.25, iou_thres=0.45)
    det = np.array([
        [0, 0, 10, 10, 0.9, 0],       # TP class 0
        [50, 50, 60, 60, 0.9, 1],     # FP (no GT there)
    ], dtype=float)
    labels = np.array([
        [0, 0, 0, 10, 10],
        [1, 100, 100, 110, 110],      # missed GT class 1
    ], dtype=float)
    cm.process_batch(det, labels)
    assert cm.matrix[0, 0] == 1          # correct class 0
    assert cm.matrix[2, 1] == 1          # background FP for missed GT cls 1
    assert cm.matrix[1, 2] == 1          # unmatched detection cls 1


def test_end_to_end_map_is_one_for_perfect_predictions():
    iouv = np.linspace(0.5, 0.95, 10)
    rng = np.random.default_rng(0)
    stats = []
    for _ in range(10):
        n = rng.integers(1, 6)
        boxes = rng.uniform(0, 400, (n, 2))
        wh = rng.uniform(10, 50, (n, 2))
        xyxy = np.concatenate([boxes, boxes + wh], 1)
        cls = rng.integers(0, 3, n).astype(float)
        det = np.concatenate([xyxy, np.full((n, 1), 0.9), cls[:, None]], 1)
        labels = np.concatenate([cls[:, None], xyxy], 1)
        correct = match_predictions(det, labels, iouv)
        stats.append((correct, det[:, 4], det[:, 5], cls))
    tp = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pc = np.concatenate([s[2] for s in stats])
    tc = np.concatenate([s[3] for s in stats])
    _, _, ap, _, _ = ap_per_class(tp, conf, pc, tc)
    assert ap[:, 0].mean() == pytest.approx(1.0, abs=0.02)


def test_write_per_class_xlsx_roundtrip(tmp_path):
    """The stdlib xlsx writer must produce a valid OOXML workbook whose
    sheet carries the reference's table (test.py:271-297): 'all' row then
    one row per class, percentages *100, numeric cells numeric."""
    import zipfile
    import xml.etree.ElementTree as ET
    from sodt_tpu.utils.xlsx import write_per_class_xlsx

    m = {"seen": 40, "nt": [3, 7], "mp": 0.5, "mr": 0.25,
         "map50": 0.75, "map": 0.4,
         "per_class": {0: dict(p=0.6, r=0.3, ap50=0.8, ap=0.45),
                       1: dict(p=0.4, r=0.2, ap50=0.7, ap=0.35)}}
    path = tmp_path / "per_class.xlsx"
    write_per_class_xlsx(m, ["car", "truck"], path)

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        assert set(z.namelist()) >= {"[Content_Types].xml", "_rels/.rels",
                                     "xl/workbook.xml",
                                     "xl/worksheets/sheet1.xml"}
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = root.findall(f"{ns}sheetData/{ns}row")
    assert len(rows) == 3                       # all + 2 classes

    def vals(row):
        out = []
        for c in row.findall(f"{ns}c"):
            if c.get("t") == "inlineStr":
                out.append(c.find(f"{ns}is/{ns}t").text)
            else:
                out.append(float(c.find(f"{ns}v").text))
        return out
    assert vals(rows[0]) == ["all", 40.0, 10.0, 50.0, 25.0, 75.0, 40.0]
    assert vals(rows[1]) == ["car", 40.0, 3.0, 60.0, 30.0, 80.0, 45.0]
    assert vals(rows[2])[0] == "truck" and vals(rows[2])[2] == 7.0
