"""Full-pipeline CI run on a REAL-format VEDAI miniature fixture.

VERDICT r4 item 7: no VEDAI data exists on this rig, so this fixture
commits the reference's actual on-disk contract end-to-end — raw
14-column annotation txts (data_transform.py:12 layout) and 1024 px
paired `*_co.png`/`*_ir.png` images — and drives L0 (prepare) -> L1
(fold lists, VedaiDataset incl. the 1024->train-size resize) -> L2-L4
(build + train) -> L5 (per-epoch eval) on it.
"""

import numpy as np
import pytest
import yaml


def _write_fixture(root, n=8, raw_size=1024, nc=3):
    """Raw-format miniature: images at 1024 px (the real VEDAI_1024
    layout) + per-image 14-col annotations in pixel coords."""
    import cv2
    from sodt_tpu.data.synthetic import SyntheticVedai

    (root / "Annotations1024").mkdir(parents=True)
    (root / "images").mkdir()
    ds = SyntheticVedai(n=n, img_size=raw_size, nc=nc, seed=11)
    stems = []
    for i in range(n):
        rgb, ir, labels = ds[i]
        stem = f"{i + 1:08d}"
        cv2.imwrite(str(root / "images" / f"{stem}_co.png"),
                    rgb[..., ::-1])
        cv2.imwrite(str(root / "images" / f"{stem}_ir.png"), ir[..., 0])
        rows = []
        for cls, cx, cy, w, h in labels:
            # raw record: cx cy angle cls flag1 flag2 x1..x4 y1..y4 (px).
            # prepare remaps REFERENCE classes {1,11,2,5,4,10,23,9}; use
            # the raw ids that land on 0..nc-1 after remap (1->0, 11->1,
            # 5->2)
            raw_cls = {0: 1, 1: 11, 2: 5}[int(cls)]
            x1, x2 = (cx - w / 2) * raw_size, (cx + w / 2) * raw_size
            y1, y2 = (cy - h / 2) * raw_size, (cy + h / 2) * raw_size
            rows.append(
                f"{cx * raw_size:.1f} {cy * raw_size:.1f} 0.0 {raw_cls} "
                f"0 0 {x1:.1f} {x2:.1f} {x2:.1f} {x1:.1f} "
                f"{y1:.1f} {y1:.1f} {y2:.1f} {y2:.1f}")
        (root / "Annotations1024" / f"{stem}.txt").write_text(
            "\n".join(rows) + "\n")
        stems.append(stem)
    (root / "fold01.txt").write_text("\n".join(stems) + "\n")
    return stems


@pytest.mark.slow
def test_l0_to_l5_on_real_format_fixture(tmp_path):
    from sodt_tpu.data.prepare import makelabels, changepath
    from sodt_tpu.data.vedai import VedaiDataset
    from sodt_tpu.train.trainer import TrainConfig, train

    nc = 3
    stems = _write_fixture(tmp_path, n=8, raw_size=1024, nc=nc)

    # L0: raw annotations -> YOLO labels; fold stems -> image paths
    n = makelabels(str(tmp_path / "Annotations1024"),
                   str(tmp_path / "labels"), img_size=1024.0)
    assert n == len(stems)
    changepath(str(tmp_path / "fold01.txt"),
               str(tmp_path / "fold01_write.txt"),
               str(tmp_path / "images"), suffix="_co.png")

    # L1: the real-format loader (1024 px pairs resized to train size,
    # label-path derivation images->labels + strip _co)
    ds = VedaiDataset(str(tmp_path / "fold01_write.txt"), img_size=128)
    assert len(ds) == len(stems)
    rgb, ir, labels = ds[0]
    assert rgb.shape == (128, 128, 3) and ir.shape == (128, 128, 3)
    assert labels.shape[1] == 5 and labels[:, 1:].max() <= 1.0

    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(yaml.safe_dump(
        {"train": str(tmp_path / "fold01_write.txt"),
         "val": str(tmp_path / "fold01_write.txt"),
         "nc": nc, "names": ["car", "pickup", "tractor"]}))

    # L2-L5: build from yaml, train 2 epochs, per-epoch eval, checkpoint
    m = train(TrainConfig(
        cfg="tests/tiny.yaml", data=str(data_yaml), epochs=2,
        batch_size=8, img_size=128, input_mode="RGB", autoanchor=False,
        eval_every=1, bf16=False, seed=0,
        save_dir=str(tmp_path / "run")))
    assert np.isfinite(m["best_fitness"])
    assert "map50" in m and np.isfinite(m["map50"])
    assert (tmp_path / "run" / "last").exists()
    assert (tmp_path / "run" / "results.txt").exists()
