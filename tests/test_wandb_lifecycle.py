"""W&B lifecycle helpers against a stub wandb module (the real package is
not installed here; the reference's surface is wandb_utils.py:44-54,
181-222 and test.py:182-192)."""

import sys
import types

import numpy as np
import pytest


class _StubArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata
        self.files, self.dirs = [], []

    def add_file(self, p, name=None):
        self.files.append((p, name))

    def add_dir(self, p):
        self.dirs.append(p)


class _StubImage:
    def __init__(self, data, boxes=None):
        self.data, self.boxes = data, boxes


class _StubRun:
    id = "stubrun1"

    def __init__(self):
        self.artifacts, self.logged = [], []

    def log_artifact(self, art, aliases=None):
        self.artifacts.append((art, aliases))

    def log(self, payload, step=None):
        self.logged.append((payload, step))


@pytest.fixture
def wl(monkeypatch, tmp_path):
    stub = types.ModuleType("wandb")
    stub.Artifact = _StubArtifact
    stub.Image = _StubImage
    monkeypatch.setitem(sys.modules, "wandb", stub)
    import importlib
    import sodt_tpu.utils.wandb_utils as wu
    importlib.reload(wu)
    run = _StubRun()
    yield wu, wu.WandbLifecycle(run), run, tmp_path
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    importlib.reload(wu)


def test_resume_detection(wl):
    wu, _, _, _ = wl
    assert wu.is_wandb_artifact("wandb-artifact://ent/proj/run_x_model")
    assert not wu.is_wandb_artifact("runs/train/exp/last")
    assert not wu.is_wandb_artifact("")


def test_model_artifact_aliases(wl):
    wu, lc, run, tmp = wl
    ckpt = tmp / "last"
    ckpt.mkdir()
    (ckpt / "d").write_text("x")
    lc.log_model(ckpt, epoch=3, fitness=0.42, best=True)
    (art, aliases), = run.artifacts
    assert art.name == "run_stubrun1_model" and art.type == "model"
    assert art.metadata == {"epoch": 3, "fitness": 0.42}
    assert art.dirs == [str(ckpt)]
    assert aliases == ["latest", "epoch3", "best"]


def test_dataset_artifact(wl):
    wu, lc, run, tmp = wl
    train_lst = tmp / "fold01.txt"
    train_lst.write_text("a_co.png\n")
    lc.log_dataset({"train": str(train_lst), "val": str(tmp / "nope.txt"),
                    "nc": 8})
    (art, _), = run.artifacts
    assert art.type == "dataset"
    assert art.files == [(str(train_lst), "train.txt")]


def test_bbox_media_panels(wl):
    wu, lc, run, _ = wl
    imgs = np.zeros((2, 64, 64, 3), np.uint8)
    dets = np.zeros((2, 4, 6), np.float32)
    dets[0, 0] = [8, 16, 24, 32, 0.9, 2]
    valid = np.zeros((2, 4), bool)
    valid[0, 0] = True
    media = lc.bbox_images(imgs, dets, valid, names=list("abcd"))
    assert len(media) == 2
    box = media[0].boxes["predictions"]["box_data"][0]
    assert box["position"] == {"minX": 0.125, "minY": 0.25,
                               "maxX": 0.375, "maxY": 0.5}
    assert box["class_id"] == 2 and "c 0.900" in box["box_caption"]
    assert media[1].boxes["predictions"]["box_data"] == []
    lc.log_media("val/bboxes", media, step=1)
    assert run.logged and run.logged[0][1] == 1


def test_inert_without_run(wl):
    wu, _, _, _ = wl
    lc = wu.WandbLifecycle(None)
    assert not lc.active
    assert lc.log_model("x", epoch=0, fitness=0.0) is None
    assert lc.bbox_images(np.zeros((1, 8, 8, 3), np.uint8), None, None,
                          []) == []
