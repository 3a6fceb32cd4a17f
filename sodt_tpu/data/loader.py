"""Host->device input pipeline: padded batches + jitted device augmentation.

Replaces the reference's DataLoader/worker stack (InfiniteDataLoader +
DistributedSampler + cv2 worker augmentation, /root/reference/basics/utils/
datasets.py:60-147,818-944) with a TPU-shaped design:

  host (1 core): decode pngs -> uint8 arrays (optionally RAM-cached),
                 pad labels to fixed capacity
  device (jit):  mosaic-4 -> random_perspective -> HSV -> flips -> mixup,
                 all batched; one compile, zero per-sample python

Batches are dicts ready for `train_step`:
  img/ir (B, S, S, 3) float [0,1], targets (B, M, 5) xywhn, tmask (B, M).
"""

from __future__ import annotations

import functools
from typing import Iterator

import numpy as np
import jax
import jax.numpy as jnp

from .augment import (PerspectiveParams, mosaic4, random_perspective,
                      hsv_augment, flips, mixup)
from ..ops.boxes import xywhn2xyxy


def pad_labels(labels: np.ndarray, m: int):
    """(n,5) -> ((m,5), (m,) mask), truncating beyond capacity."""
    out = np.zeros((m, 5), np.float32)
    mask = np.zeros((m,), bool)
    n = min(len(labels), m)
    if n:
        out[:n] = labels[:n]
        mask[:n] = True
    return out, mask


class RamCache:
    """Decode-once RAM cache (reference caches via ThreadPool,
    datasets.py:749-760; here a plain dict — the dataset fits easily)."""

    def __init__(self, dataset):
        self.dataset = dataset
        self._cache: dict[int, tuple] = {}

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        if i not in self._cache:
            self._cache[i] = self.dataset[i]
        return self._cache[i]

    @property
    def labels(self):
        return self.dataset.labels


def _augment_one(rgb4, ir4, lab4, msk4, rgb4b, ir4b, lab4b, msk4b, key, *,
                 s: int, hyp: dict, use_mixup: bool):
    """Full train augmentation for ONE output sample (vmapped over batch).

    rgb4/ir4: (4, s, s, 3) float tiles; lab4: (4, M, 5) xywhn + mask.
    The *b variants feed mixup's second mosaic.
    """
    k_m, k_p, k_h, k_f, k_x, k_m2, k_p2 = jax.random.split(key, 7)
    p = PerspectiveParams(degrees=hyp.get("degrees", 0.0),
                          translate=hyp.get("translate", 0.1),
                          scale=hyp.get("scale", 0.5),
                          shear=hyp.get("shear", 0.0),
                          perspective=hyp.get("perspective", 0.0))

    def one_mosaic(rgb4, ir4, lab4, msk4, km, kp):
        lab_px = jax.vmap(lambda l: xywhn2xyxy(l[:, 1:5], s, s))(lab4)
        cls4 = lab4[..., 0]
        canvas, canvas_ir, labels, mask = mosaic4(rgb4, ir4, lab_px, msk4,
                                                  km, s)
        img, ir, labels, mask = random_perspective(
            canvas, canvas_ir, labels, mask, kp, p, (s, s))
        cls_flat = cls4.reshape(-1)
        return img, ir, labels, mask, cls_flat

    img, ir, labels, mask, cls = one_mosaic(rgb4, ir4, lab4, msk4, k_m, k_p)
    if use_mixup:
        img2, ir2, lab2, msk2, cls2 = one_mosaic(rgb4b, ir4b, lab4b, msk4b,
                                                 k_m2, k_p2)
        do = jax.random.uniform(k_x) < hyp.get("mixup", 0.0)
        lam = jax.random.beta(jax.random.fold_in(k_x, 1), 32.0, 32.0)
        img = jnp.where(do, img * lam + img2 * (1 - lam), img)
        ir = jnp.where(do, ir * lam + ir2 * (1 - lam), ir)
        # second sample's labels switch on only under mixup
        labels = jnp.concatenate([labels, lab2], 0)
        mask = jnp.concatenate([mask, msk2 & do], 0)
        cls = jnp.concatenate([cls, cls2], 0)

    # HSV on RGB only (datasets.py:869-871)
    img = hsv_augment(img, k_h, hyp.get("hsv_h", 0.015),
                      hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4))

    # xyxy pixels -> normalized xywh
    cx = (labels[:, 0] + labels[:, 2]) / 2 / s
    cy = (labels[:, 1] + labels[:, 3]) / 2 / s
    ww = (labels[:, 2] - labels[:, 0]) / s
    hh = (labels[:, 3] - labels[:, 1]) / s
    lab_n = jnp.stack([cx, cy, ww, hh], axis=-1)

    img, ir, lab_n4, mask = flips(
        img, ir, jnp.concatenate([cls[:, None], lab_n], -1) * 1.0, mask,
        k_f, hyp.get("flipud", 0.0), hyp.get("fliplr", 0.5))
    # flips() expects [cls, x, y, w, h] layout with x at col 1
    targets = lab_n4
    return img / 255.0, ir / 255.0, targets, mask


def make_augment_fn(s: int, hyp: dict, use_mixup: bool):
    fn = functools.partial(_augment_one, s=s, hyp=hyp, use_mixup=use_mixup)
    batched = jax.vmap(fn)
    return jax.jit(batched)


def make_train_batches(dataset, batch_size: int, img_size: int, hyp: dict,
                       *, seed: int = 0, max_labels_per_image: int = 30,
                       epochs: int | None = None, cache: bool = True,
                       mosaic: bool = True) -> Iterator[dict]:
    """Infinite (or epochs-bounded) iterator of augmented device batches."""
    ds = RamCache(dataset) if cache else dataset
    n = len(ds)
    rng = np.random.default_rng(seed)
    use_mixup = hyp.get("mixup", 0.0) > 0
    aug = make_augment_fn(img_size, hyp, use_mixup)
    m0 = max_labels_per_image

    epoch = 0
    step = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            tiles, irs, labs, msks = [], [], [], []
            tiles2, irs2, labs2, msks2 = [], [], [], []
            for i in idx:
                def draw4(first_i=None):
                    sel = [first_i if first_i is not None
                           else int(rng.integers(n))]
                    sel += [int(rng.integers(n)) for _ in range(3)]
                    r4, i4, l4, m4 = [], [], [], []
                    for j in sel:
                        rgb, ir, lab = ds[j]
                        pl, pm = pad_labels(lab, m0)
                        r4.append(rgb)
                        i4.append(ir)
                        l4.append(pl)
                        m4.append(pm)
                    return (np.stack(r4), np.stack(i4), np.stack(l4),
                            np.stack(m4))
                a = draw4(int(i))
                tiles.append(a[0]); irs.append(a[1])
                labs.append(a[2]); msks.append(a[3])
                if use_mixup:
                    b = draw4()
                    tiles2.append(b[0]); irs2.append(b[1])
                    labs2.append(b[2]); msks2.append(b[3])
                else:
                    tiles2.append(a[0]); irs2.append(a[1])
                    labs2.append(a[2]); msks2.append(a[3])
            key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
            keys = jax.random.split(key, batch_size)
            img, ir, targets, tmask = aug(
                jnp.asarray(np.stack(tiles), jnp.float32),
                jnp.asarray(np.stack(irs), jnp.float32),
                jnp.asarray(np.stack(labs)), jnp.asarray(np.stack(msks)),
                jnp.asarray(np.stack(tiles2), jnp.float32),
                jnp.asarray(np.stack(irs2), jnp.float32),
                jnp.asarray(np.stack(labs2)), jnp.asarray(np.stack(msks2)),
                keys)
            yield {"img": img, "ir": ir, "targets": targets, "tmask": tmask,
                   "epoch": epoch}
            step += 1
        epoch += 1


def make_eval_batches(dataset, batch_size: int, img_size: int,
                      max_labels_per_image: int = 60) -> Iterator[dict]:
    """Deterministic eval batches: plain resize (VEDAI is square), /255."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        # pad the last batch by repeating the final sample; extra entries
        # are flagged so eval can drop them
        valid = len(idx)
        while len(idx) < batch_size:
            idx.append(idx[-1])
        rgbs, irs, labs, msks, shapes = [], [], [], [], []
        for i in idx:
            rgb, ir, lab = dataset[i]
            pl, pm = pad_labels(lab, max_labels_per_image)
            rgbs.append(rgb)
            irs.append(ir)
            labs.append(pl)
            msks.append(pm)
            shapes.append(rgb.shape[:2])
        yield {
            "img": jnp.asarray(np.stack(rgbs), jnp.float32) / 255.0,
            "ir": jnp.asarray(np.stack(irs), jnp.float32) / 255.0,
            "targets": jnp.asarray(np.stack(labs)),
            "tmask": jnp.asarray(np.stack(msks)),
            "indices": idx, "valid": valid, "shapes": shapes,
        }
