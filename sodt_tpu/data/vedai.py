"""VEDAI paired RGB+IR dataset: host-side decode, device-side everything else.

Re-design of LoadImagesAndLabels_sr (/root/reference/basics/utils/
datasets.py:667-944). The reference does all augmentation in cv2 on CPU
workers; on this machine (1 host core feeding a TPU) that would starve the
chip, so the host path is reduced to: read png pairs, decode to uint8,
resize to the target square, and parse label txts — everything geometric /
photometric happens batched on device (see augment.py).

Path derivation parity (datasets.py:368-376, 684-685):
  * fold txt lists RGB paths ending `_co.png`
  * IR path:    .../x_co.png  -> .../x_ir.png
  * label path: .../images/x_co.png -> .../labels/x.txt
Label format: class cx cy w h (normalized), one object per line.
Label caching: parsed labels are stored in a sibling `.labels.npz` keyed by
a sha256 over per-file (path, size, mtime) — the reference's .cache is keyed
by summed file size only (datasets.py:40-42,762-807).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np

try:
    import cv2  # noqa: F401
    _HAS_CV2 = True
except Exception:
    _HAS_CV2 = False
from PIL import Image


def derive_ir_path(p: str) -> str:
    name = Path(p).name.replace("_co", "_ir")
    return str(Path(p).parent / name)


def derive_label_path(p: str) -> str:
    sa, sb = os.sep + "images" + os.sep, os.sep + "labels" + os.sep
    q = sb.join(p.rsplit(sa, 1)).rsplit(".", 1)[0]
    if q.endswith("_co"):
        q = q[: -len("_co")]
    return q + ".txt"


def _read_image(path: str) -> np.ndarray:
    """Decode to uint8 HWC RGB (or HW1 for single-channel)."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 2:
            return img[..., None]
        return img[..., ::-1].copy()  # BGR -> RGB
    img = np.asarray(Image.open(path))
    if img.ndim == 2:
        return img[..., None]
    return img[..., :3]


def _resize_longest(img: np.ndarray, size: int) -> np.ndarray:
    """Resize so the longest side == size (reference load_image,
    datasets.py:947-960)."""
    h, w = img.shape[:2]
    r = size / max(h, w)
    if r == 1.0:
        return img
    if _HAS_CV2:
        interp = cv2.INTER_AREA if r < 1 else cv2.INTER_LINEAR
        out = cv2.resize(img, (int(w * r), int(h * r)),
                         interpolation=interp)
        # cv2.resize drops a trailing 1-channel dim (real VEDAI _ir.png
        # is grayscale) — restore it or __getitem__'s channel checks
        # misread width as channels
        return out[..., None] if out.ndim == 2 else out
    pil = Image.fromarray(img.squeeze() if img.shape[-1] == 1 else img)
    pil = pil.resize((int(w * r), int(h * r)), Image.BILINEAR)
    out = np.asarray(pil)
    return out[..., None] if out.ndim == 2 else out


class VedaiDataset:
    """Index-addressable paired dataset: (rgb u8, ir u8, labels (n,5))."""

    def __init__(self, list_file: str, img_size: int = 512,
                 prefix: str | None = None):
        self.img_size = img_size
        root = Path(list_file).parent
        with open(list_file) as f:
            files = [ln.strip() for ln in f if ln.strip()]
        if prefix:
            files = [str(Path(prefix) / p) for p in files]
        # resolve relative entries against the list file's directory
        self.img_files = [
            p if os.path.isabs(p) and os.path.exists(p)
            else (p if os.path.exists(p) else str(root / Path(p).name))
            for p in files
        ]
        self.ir_files = [derive_ir_path(p) for p in self.img_files]
        self.label_files = [derive_label_path(p) for p in self.img_files]
        labels, bad = self._load_labels(list_file)
        if bad.any():
            keep = [i for i in range(len(labels)) if not bad[i]]
            self.img_files = [self.img_files[i] for i in keep]
            self.ir_files = [self.ir_files[i] for i in keep]
            self.label_files = [self.label_files[i] for i in keep]
            labels = [labels[i] for i in keep]
        self.labels = labels

    def _load_labels(self, list_file: str):
        """Label cache build WITH the reference's integrity scan
        (datasets.py:768-795): PIL-verify both modalities, >=10 px sides,
        label shape/range/duplicate checks. Corrupt entries are excluded
        from the dataset at scan time (instead of surfacing as a
        mid-epoch decode exception) and counted in the summary line."""
        cache = Path(list_file).with_suffix(".labels.npz")
        # key = hash of per-file (path, size, mtime) over labels AND both
        # image modalities so edits that keep the total byte count can't
        # serve stale results (reference get_hash is size-sum only,
        # datasets.py:40-42 — deliberately stronger here)
        h = hashlib.sha256()
        for p in (*self.label_files, *self.img_files, *self.ir_files):
            st = os.stat(p) if os.path.exists(p) else None
            h.update(f"{p}:{st.st_size if st else -1}:"
                     f"{st.st_mtime_ns if st else 0};".encode())
        key = np.frombuffer(h.digest(), np.uint8)
        if cache.exists():
            data = np.load(cache, allow_pickle=True)
            if np.array_equal(data["key"], key) and "bad" in data:
                return list(data["labels"]), np.asarray(data["bad"], bool)
        labels, bad = [], []
        nf = nm = ne = nc = 0  # found, missing, empty, corrupt
        for im, irf, lf in zip(self.img_files, self.ir_files,
                               self.label_files):
            ok = True
            for f in (im, irf):
                if not os.path.exists(f):
                    continue  # decoded lazily; missing pairs error there
                try:
                    with Image.open(f) as img:
                        img.verify()
                        w, hh = img.size
                        assert w > 9 and hh > 9, "image size <10 pixels"
                except Exception as e:
                    print(f"WARNING: corrupt image {f}: {e}")
                    ok = False
            arr = np.zeros((0, 5), np.float32)
            if not os.path.exists(lf):
                nm += 1
            else:
                try:
                    arr = np.loadtxt(lf, ndmin=2, dtype=np.float32)
                    if arr.size == 0:
                        arr = np.zeros((0, 5), np.float32)
                        ne += 1
                    else:
                        assert arr.shape[1] == 5, "labels require 5 columns"
                        assert (arr >= 0).all(), "negative labels"
                        assert (arr[:, 1:] <= 1.00001).all(), \
                            "non-normalized or out of bounds coordinates"
                        assert np.unique(arr, axis=0).shape[0] == \
                            arr.shape[0], "duplicate labels"
                        nf += 1
                except Exception as e:
                    print(f"WARNING: corrupt label {lf}: {e}")
                    arr = np.zeros((0, 5), np.float32)
                    ok = False
            if not ok:
                nc += 1
            labels.append(arr)
            bad.append(not ok)
        bad = np.asarray(bad, bool)
        if nm or ne or nc:
            print(f"Scanned {len(labels)} items: {nf} labels found, "
                  f"{nm} missing, {ne} empty, {nc} corrupt")
        try:
            np.savez(cache, key=key,
                     labels=np.asarray(labels, dtype=object), bad=bad)
        except OSError:
            pass
        return labels, bad

    def __len__(self):
        return len(self.img_files)

    def __getitem__(self, i: int):
        rgb = _resize_longest(_read_image(self.img_files[i]), self.img_size)
        ir = _resize_longest(_read_image(self.ir_files[i]), self.img_size)
        if ir.shape[-1] == 1:
            ir = np.repeat(ir, 3, axis=-1)  # loader parity: IR png is RGB-ish
        elif ir.shape[-1] > 3:
            ir = ir[..., :3]
        if rgb.shape[-1] == 1:
            rgb = np.repeat(rgb, 3, axis=-1)
        return rgb, ir[..., :3], self.labels[i].copy()


def apply_single_cls(ds):
    """--single-cls: collapse every label to class 0 in place (reference
    datasets.py:786 `if single_cls: l[:, 0] = 0`). Works on any dataset
    exposing a `.labels` list of (n, 5) [cls, cx, cy, w, h] arrays."""
    ds.labels = [
        (np.concatenate([np.zeros((len(l), 1), np.float32),
                         np.asarray(l, np.float32)[:, 1:]], axis=1)
         if len(l) else l)
        for l in ds.labels]
    return ds
