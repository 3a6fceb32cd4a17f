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
                 s: int, hyp: dict, use_mixup: bool, mosaic_p: float = 1.0):
    """Full train augmentation for ONE output sample (vmapped over batch).

    rgb4/ir4: (4, s, s, 3) float tiles; lab4: (4, M, 5) xywhn + mask.
    The *b variants feed mixup's second mosaic. `mosaic_p` gates mosaic
    per sample like the reference's `random.random() < hyp['mosaic']`
    (datasets.py:541); non-mosaic samples take the letterbox branch
    (datasets.py:580-607 — on square VEDAI letterbox == the resize the
    tiles already had) followed by the same random_perspective.
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

    def one_single(kp):
        """Non-mosaic branch: tile 0 + perspective (no mosaic border)."""
        lab_px = xywhn2xyxy(lab4[0][:, 1:5], s, s)
        img, ir, labels, mask = random_perspective(
            rgb4[0], ir4[0], lab_px, msk4[0], kp, p, (s, s))
        return img, ir, labels, mask, lab4[0][:, 0]

    if mosaic_p > 0.0:
        img, ir, labels, mask, cls = one_mosaic(rgb4, ir4, lab4, msk4,
                                                k_m, k_p)
        if use_mixup:
            # mixup only composes with mosaic (reference datasets.py:548)
            img2, ir2, lab2, msk2, cls2 = one_mosaic(
                rgb4b, ir4b, lab4b, msk4b, k_m2, k_p2)
            do = jax.random.uniform(k_x) < hyp.get("mixup", 0.0)
            lam = jax.random.beta(jax.random.fold_in(k_x, 1), 32.0, 32.0)
            img = jnp.where(do, img * lam + img2 * (1 - lam), img)
            ir = jnp.where(do, ir * lam + ir2 * (1 - lam), ir)
            # second sample's labels switch on only under mixup
            labels = jnp.concatenate([labels, lab2], 0)
            mask = jnp.concatenate([mask, msk2 & do], 0)
            cls = jnp.concatenate([cls, cls2], 0)
    if mosaic_p < 1.0:
        imgS, irS, labS, mskS, clsS = one_single(
            jax.random.fold_in(k_p, 99))
        if mosaic_p <= 0.0:
            img, ir, labels, mask, cls = imgS, irS, labS, mskS, clsS
        else:
            # pad the single-tile labels to the mosaic capacity, then
            # select per sample
            extra = labels.shape[0] - labS.shape[0]
            labS = jnp.concatenate(
                [labS, jnp.zeros((extra, 4), labS.dtype)], 0)
            mskS = jnp.concatenate(
                [mskS, jnp.zeros((extra,), bool)], 0)
            clsS = jnp.concatenate(
                [clsS, jnp.zeros((extra,), clsS.dtype)], 0)
            do_m = jax.random.uniform(
                jax.random.fold_in(k_m, 99)) < mosaic_p
            img = jnp.where(do_m, img, imgS)
            ir = jnp.where(do_m, ir, irS)
            labels = jnp.where(do_m, labels, labS)
            mask = jnp.where(do_m, mask, mskS)
            cls = jnp.where(do_m, cls, clsS)

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


def make_augment_fn(s: int, hyp: dict, use_mixup: bool,
                    mosaic_p: float = 1.0):
    fn = functools.partial(_augment_one, s=s, hyp=hyp, use_mixup=use_mixup,
                           mosaic_p=mosaic_p)
    # tiles stay uint8 into the mosaic paste; the warp sampler casts
    # (see make_bank_augment_fn — same bandwidth argument)
    if not use_mixup:
        # drop the secondary-mosaic operands from the jit signature so the
        # loader never decodes or transfers them (hyp mixup: 0.0 default)
        def primary_only(rgb4, ir4, lab4, msk4, key):
            return fn(rgb4, ir4, lab4, msk4, rgb4, ir4, lab4, msk4, key)
        return jax.jit(jax.vmap(primary_only))

    def full(rgb4, ir4, lab4, msk4, rgb4b, ir4b, lab4b, msk4b, key):
        return fn(rgb4, ir4, lab4, msk4, rgb4b, ir4b, lab4b, msk4b, key)
    return jax.jit(jax.vmap(full))


def make_bank_augment_fn(s: int, hyp: dict, use_mixup: bool,
                         mosaic_p: float = 1.0, jit: bool = True):
    """Augment straight out of a device-resident uint8 tile bank.

    The per-step host->device transfer is just the (B, 4) tile indices and
    the RNG keys — the tile gather, u8->f32 cast and all augmentation
    geometry run in one jitted program. This is the TPU answer to the
    reference's cv2 worker pool (datasets.py:118-147): instead of hiding
    decode latency behind processes, a dataset that fits in HBM is decoded
    once and never crosses the host boundary again.

    jit=False returns the raw callable for embedding in a larger program
    (the trainer's epoch-scan path).
    """
    fn = functools.partial(_augment_one, s=s, hyp=hyp, use_mixup=use_mixup,
                           mosaic_p=mosaic_p)

    def bank_fn(bank_rgb, bank_ir, bank_lab, bank_msk, prim, sec, keys):
        # tiles stay uint8 through the gather AND the mosaic paste —
        # pasting is pure copy (pad 114 is exact in u8), so deferring the
        # f32 cast to the warp sampler quarters the gather + mosaic
        # scratch HBM traffic (the augment dispatch is bandwidth-bound)
        r1 = bank_rgb[prim]                # (B, 4, s, s, 3)
        i1 = bank_ir[prim]
        l1, k1 = bank_lab[prim], bank_msk[prim]
        if use_mixup:
            r2, i2 = bank_rgb[sec], bank_ir[sec]
            l2, k2 = bank_lab[sec], bank_msk[sec]
        else:
            r2, i2, l2, k2 = r1, i1, l1, k1
        return jax.vmap(fn)(r1, i1, l1, k1, r2, i2, l2, k2, keys)

    return jax.jit(bank_fn) if jit else bank_fn


class BankFeed:
    """Device-resident tile bank + host-side index scheduler.

    Serves two consumption protocols:
      * per-step iterator (`_bank_train_batches`): one aug dispatch per
        batch, drop-in for the streaming regime;
      * whole-epoch scan (`trainer.py` fast path): `epoch_schedule()`
        returns the full epoch's (K, B, 4) index tensor + (K, B) RNG keys
        so gather -> augment -> train-step can run K steps inside ONE
        jitted `lax.scan` dispatch — on a tunnel-attached dev rig this is
        the difference between ~15 and ~50 img/s trainer throughput.
    """

    def __init__(self, dataset, batch_size: int, img_size: int, hyp: dict,
                 *, seed: int = 0, m0: int = 30, mosaic: bool = True,
                 sample_weights_fn=None, prefer_native: bool = True,
                 process_index: int = 0, process_count: int = 1):
        n = len(dataset)
        if n < batch_size:
            raise ValueError(f"dataset {n} < batch_size {batch_size}")
        self.n = n
        self.batch_size = batch_size
        self.img_size = img_size
        self.mosaic_p = float(hyp.get("mosaic", 1.0)) if mosaic else 0.0
        self.use_mixup = hyp.get("mixup", 0.0) > 0 and self.mosaic_p > 0
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.sample_weights_fn = sample_weights_fn
        # multi-host: the GLOBAL schedule is computed from the shared seed
        # on every process (identical streams); each process consumes only
        # its row slice of every step — a disjoint partition per step, the
        # DistributedSampler-equivalent (reference datasets.py:107)
        if batch_size % process_count:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"process_count {process_count}")
        self.process_index = process_index
        self.process_count = process_count
        self.local_bs = batch_size // process_count
        self.steps_per_epoch = max(n // batch_size, 1)
        self.step = 0
        self.aug = make_bank_augment_fn(img_size, hyp, self.use_mixup,
                                        self.mosaic_p, jit=True)
        self.aug_raw = make_bank_augment_fn(img_size, hyp, self.use_mixup,
                                            self.mosaic_p, jit=False)

        src = _make_tile_source(dataset, img_size, prefer_native,
                                cache=False)
        rgb_all, ir_all = src.wait(src.submit(np.arange(n)))
        labs = np.empty((n, m0, 5), np.float32)
        msks = np.empty((n, m0), bool)
        for i in range(n):
            labs[i], msks[i] = pad_labels(dataset.labels[i], m0)
        self.banks = (jax.device_put(np.ascontiguousarray(rgb_all)),
                      jax.device_put(np.ascontiguousarray(ir_all)),
                      jax.device_put(labs), jax.device_put(msks))

    def _order(self):
        if self.sample_weights_fn is not None:
            w = np.asarray(self.sample_weights_fn(), float)
            return self.rng.choice(self.n, size=self.n, p=w / w.sum())
        return self.rng.permutation(self.n)

    def step_schedule(self):
        """Indices + keys for ONE step (iterator protocol)."""
        if self.step % self.steps_per_epoch == 0:
            self._epoch_order = self._order()
        start = (self.step % self.steps_per_epoch) * self.batch_size
        prim, sec = _step_indices(self.rng, self._epoch_order, start,
                                  self.batch_size, self.n, self.use_mixup)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self.step)
        keys = jax.random.split(key, self.batch_size)
        self.step += 1
        return prim, sec, keys

    def epoch_schedule(self):
        """Indices + keys for a WHOLE epoch: (K, B, 4), (K, B, 4)|None,
        (K, B, 2). RNG consumption matches step_schedule exactly, so the
        two protocols produce identical sample streams at the same seed."""
        k = self.steps_per_epoch
        prims, secs, keys = [], [], []
        for _ in range(k):
            p, s, kk = self.step_schedule()
            prims.append(p)
            secs.append(s)
            keys.append(kk)
        prim = np.stack(prims)
        sec = None if secs[0] is None else np.stack(secs)
        return prim, sec, jnp.stack(keys)

    def augment_step(self):
        """One augmented batch (iterator protocol). Multi-host processes
        produce only their local row slice of the global batch."""
        prim, sec, keys = self.step_schedule()
        p, lb = self.process_index, self.local_bs
        sl = slice(p * lb, (p + 1) * lb)
        prim, keys = prim[sl], keys[sl]
        sec = None if sec is None else sec[sl]
        img, irr, targets, tmask = self.aug(
            *self.banks, jnp.asarray(prim),
            None if sec is None else jnp.asarray(sec), keys)
        return {"img": img, "ir": irr, "targets": targets, "tmask": tmask,
                "epoch": (self.step - 1) // self.steps_per_epoch}


def make_bank_feed(dataset, batch_size: int, img_size: int, hyp: dict,
                   *, seed: int = 0, m0: int = 30, mosaic: bool = True,
                   sample_weights_fn=None, prefer_native: bool = True,
                   device_bank: bool | None = None,
                   process_index: int = 0,
                   process_count: int = 1) -> BankFeed | None:
    """BankFeed when the dataset fits the HBM budget, else None."""
    if device_bank is None:
        bank_bytes = 2 * len(dataset) * img_size * img_size * 3
        device_bank = bank_bytes <= DEVICE_BANK_MAX_GB * 2**30
    if not device_bank:
        return None
    return BankFeed(dataset, batch_size, img_size, hyp, seed=seed, m0=m0,
                    mosaic=mosaic, sample_weights_fn=sample_weights_fn,
                    prefer_native=prefer_native,
                    process_index=process_index,
                    process_count=process_count)


def _step_indices(rng, order, start, batch_size, n, use_mixup):
    """Tile index schedule for one step: (B, 4) primary [+ (B, 4) mixup]."""
    prim = np.empty((batch_size, 4), np.int64)
    for bi in range(batch_size):
        prim[bi, 0] = order[start + bi]
        prim[bi, 1:] = rng.integers(n, size=3)
    if not use_mixup:
        return prim, None
    sec = rng.integers(n, size=(batch_size, 4))
    return prim, sec


class PyTileSource:
    """Fetch stacked uint8 tiles via the python dataset (RAM-cached)."""

    def __init__(self, ds):
        self.ds = ds

    def submit(self, flat_idx):
        return flat_idx

    def wait(self, flat_idx):
        rgbs, irs = [], []
        for j in flat_idx:
            rgb, ir, _ = self.ds[int(j)]
            rgbs.append(rgb)
            irs.append(ir)
        return np.stack(rgbs), np.stack(irs)


class NativeTileSource:
    """Fetch tiles through the C++ prefetch loader (GIL-free decode that
    overlaps device compute)."""

    def __init__(self, ds, img_size):
        from .native_loader import NativeTileLoader
        self.loader = NativeTileLoader(ds.img_files, ds.ir_files, img_size)

    def submit(self, flat_idx):
        return self.loader.submit(np.asarray(flat_idx, np.int32))

    def wait(self, job):
        return self.loader.wait(job)


def _make_tile_source(dataset, img_size, prefer_native=True, cache=True):
    if prefer_native and hasattr(dataset, "img_files"):
        try:
            from .native_loader import available
            if available():
                src = NativeTileSource(dataset, img_size)
                if not cache:
                    src.loader.close()  # rebuild without the decode cache
                    from .native_loader import NativeTileLoader
                    src.loader = NativeTileLoader(
                        dataset.img_files, dataset.ir_files, img_size,
                        cache_gb=0.0)
                return src
        except Exception:
            pass
    base = dataset.dataset if isinstance(dataset, RamCache) else dataset
    return PyTileSource(RamCache(base) if cache else base)


DEVICE_BANK_MAX_GB = 1.5  # auto device-bank gate: rgb+ir u8 tiles must fit


def make_train_batches(dataset, batch_size: int, img_size: int, hyp: dict,
                       *, seed: int = 0, max_labels_per_image: int = 30,
                       epochs: int | None = None, cache: bool = True,
                       mosaic: bool = True, prefer_native: bool = True,
                       sample_weights_fn=None,
                       multi_scale: bool = False,
                       multi_scale_buckets=(0.75, 1.0, 1.25),
                       scale_seed: int | None = None,
                       device_bank: bool | None = None,
                       process_index: int = 0,
                       process_count: int = 1) -> Iterator[dict]:
    """Infinite (or epochs-bounded) iterator of augmented device batches.

    Two feed regimes, chosen automatically (`device_bank=None`):

    - **device bank** (dataset's u8 tiles fit in ~1.5 GB HBM): every tile is
      uploaded once; per-step transfer is the (B, 4) index schedule + RNG
      keys, and gather/cast/augment run in one jitted program.
    - **streaming**: tiles decode on host (C++ prefetch loader when built),
      travel as uint8, and are cast/augmented on device. Pipelined: step
      s+1's decode is submitted before step s is yielded.

    Multi-host (`process_count > 1`): `batch_size` stays GLOBAL and every
    process computes the identical global schedule from the shared seed,
    then decodes/augments only its `batch_size/process_count` row slice of
    each step — a disjoint per-step partition, matching the reference's
    DistributedSampler semantics (datasets.py:107) instead of decorrelated
    independent sampling. Assembling all processes' slices reproduces the
    single-process batch bit-for-bit.
    """
    n = len(dataset)
    labels = dataset.labels
    rng = np.random.default_rng(seed)
    # bucket draws come from their OWN stream so multi-host runs (which
    # decorrelate `seed` per process) can keep the per-step batch SHAPE
    # identical across processes by passing one shared scale_seed
    scale_rng = np.random.default_rng(seed if scale_seed is None
                                      else scale_seed)
    # per-sample mosaic probability (reference datasets.py:541); the
    # mosaic= flag forces the letterbox-only path regardless of hyp
    mosaic_p = float(hyp.get("mosaic", 1.0)) if mosaic else 0.0
    use_mixup = hyp.get("mixup", 0.0) > 0 and mosaic_p > 0
    m0 = max_labels_per_image
    if n < batch_size:
        raise ValueError(
            f"dataset has {n} images < batch_size {batch_size}; "
            "the epoch schedule would never yield a batch")
    if batch_size % process_count:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"process_count {process_count}")
    lb = batch_size // process_count
    row_slice = slice(process_index * lb, (process_index + 1) * lb)
    feed = make_bank_feed(dataset, batch_size, img_size, hyp, seed=seed,
                          m0=m0, mosaic=mosaic,
                          sample_weights_fn=sample_weights_fn,
                          prefer_native=prefer_native,
                          device_bank=device_bank,
                          process_index=process_index,
                          process_count=process_count)
    if feed is not None:
        yield from _bank_train_batches(feed, img_size, epochs,
                                       multi_scale, multi_scale_buckets,
                                       scale_rng)
        return
    aug = make_augment_fn(img_size, hyp, use_mixup, mosaic_p)
    src = _make_tile_source(dataset, img_size, prefer_native, cache)

    def schedule():
        """yield (prim, sec) index blocks forever (epoch-shuffled, or
        class-weighted when sample_weights_fn is set — the reference's
        --image-weights resampling, Train.py:336-347)."""
        while True:
            if sample_weights_fn is not None:
                w = np.asarray(sample_weights_fn(), float)
                w = w / w.sum()
                order = rng.choice(n, size=n, p=w)
            else:
                order = rng.permutation(n)
            for start in range(0, n - batch_size + 1, batch_size):
                yield _step_indices(rng, order, start, batch_size, n,
                                    use_mixup)

    def pack_labels(flat_idx):
        labs = np.empty((len(flat_idx), m0, 5), np.float32)
        msks = np.empty((len(flat_idx), m0), bool)
        for i, j in enumerate(flat_idx):
            labs[i], msks[i] = pad_labels(labels[int(j)], m0)
        return labs, msks

    sched = schedule()
    steps_per_epoch = max(n // batch_size, 1)
    total_steps = None if epochs is None else epochs * steps_per_epoch

    def flatten(prim, sec):
        # local row slice only: this process never decodes other hosts'
        # rows (the schedule itself is global and shared)
        p, s = prim[row_slice], None if sec is None else sec[row_slice]
        return (p.ravel() if s is None
                else np.concatenate([p.ravel(), s.ravel()]))

    prim, sec = next(sched)
    flat = flatten(prim, sec)
    job = src.submit(flat)
    step = 0
    while total_steps is None or step < total_steps:
        cur_flat = flat
        rgb, ir = src.wait(job)
        # pipeline: kick off the next step's decode immediately
        prim_n, sec_n = next(sched)
        flat = flatten(prim_n, sec_n)
        job = src.submit(flat)

        labs, msks = pack_labels(cur_flat)
        half = lb * 4
        shape4 = (lb, 4, img_size, img_size, 3)
        r1 = rgb[:half].reshape(shape4)      # uint8 on the wire
        i1 = ir[:half].reshape(shape4)
        l1 = labs[:half].reshape(lb, 4, m0, 5)
        k1 = msks[:half].reshape(lb, 4, m0)

        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        keys = jax.random.split(key, batch_size)[row_slice]
        if use_mixup:
            r2 = rgb[half:].reshape(shape4)
            i2 = ir[half:].reshape(shape4)
            l2 = labs[half:].reshape(lb, 4, m0, 5)
            k2 = msks[half:].reshape(lb, 4, m0)
            img, irr, targets, tmask = aug(
                jnp.asarray(r1), jnp.asarray(i1), jnp.asarray(l1),
                jnp.asarray(k1), jnp.asarray(r2), jnp.asarray(i2),
                jnp.asarray(l2), jnp.asarray(k2), keys)
        else:
            img, irr, targets, tmask = aug(
                jnp.asarray(r1), jnp.asarray(i1), jnp.asarray(l1),
                jnp.asarray(k1), keys)
        if multi_scale:
            # bucketed multi-scale (reference resizes every batch to a
            # random /32-multiple in +/-50%, Train.py:396-402; fixed-shape
            # jit wants a small static set instead)
            f = multi_scale_buckets[
                int(scale_rng.integers(len(multi_scale_buckets)))]
            ns = int(round(img_size * f / 32) * 32)
            if ns != img_size:
                img = jax.image.resize(
                    img, (img.shape[0], ns, ns, img.shape[-1]), "bilinear")
                irr = jax.image.resize(
                    irr, (irr.shape[0], ns, ns, irr.shape[-1]), "bilinear")
        yield {"img": img, "ir": irr, "targets": targets, "tmask": tmask,
               "epoch": step // steps_per_epoch}
        step += 1


def _bank_train_batches(feed: BankFeed, img_size: int,
                        epochs: int | None, multi_scale: bool,
                        multi_scale_buckets, scale_rng) -> Iterator[dict]:
    """Device-bank feed regime (see make_train_batches docstring): a thin
    iterator over BankFeed, so the per-step and epoch-scan protocols share
    one scheduler/augment implementation (and one HBM-budget gate, in
    make_bank_feed). The multi-scale bucket draw uses the dedicated
    scale_rng at the same sequence point as the streaming regime, keeping
    the sample AND shape streams identical at the same seeds."""
    total = None if epochs is None else epochs * feed.steps_per_epoch
    while total is None or feed.step < total:
        b = feed.augment_step()
        if multi_scale:
            f = multi_scale_buckets[int(scale_rng.integers(
                len(multi_scale_buckets)))]
            ns = int(round(img_size * f / 32) * 32)
            if ns != img_size:
                for k in ("img", "ir"):
                    v = b[k]
                    b[k] = jax.image.resize(
                        v, (v.shape[0], ns, ns, v.shape[-1]), "bilinear")
        yield b


def make_eval_batches(dataset, batch_size: int, img_size: int,
                      max_labels_per_image: int = 60, rect: bool = False,
                      stride: int = 32, pad: float = 0.5) -> Iterator[dict]:
    """Deterministic eval batches: plain resize (VEDAI is square), /255.

    Emits per-image "stems" (file stems when the dataset has img_files,
    else dataset indices) so the COCO-format export joins on real image
    ids like the reference (test.py:197 uses Path(p).stem).

    rect=True reproduces the reference's rectangular batching
    (datasets.py:724-747, eval pad 0.5 via test.py:112): images sorted by
    aspect ratio, each batch letterboxed to its own ceil-to-stride shape
    — one compile per distinct batch shape (a handful on real datasets).
    Batches then carry "net_shape" so evaluation/export use the right
    network-pixel space.
    """
    if rect:
        yield from _rect_eval_batches(dataset, batch_size, img_size,
                                      max_labels_per_image, stride, pad)
        return
    from pathlib import Path
    n = len(dataset)
    files = getattr(dataset, "img_files", None)
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
            # uint8 on the wire; the jitted eval step casts and scales
            "img": jnp.asarray(np.stack(rgbs)),
            "ir": jnp.asarray(np.stack(irs)),
            "targets": jnp.asarray(np.stack(labs)),
            "tmask": jnp.asarray(np.stack(msks)),
            "indices": idx, "valid": valid, "shapes": shapes,
            "stems": [(Path(files[i]).stem if files is not None else str(i))
                      for i in idx],
        }


def _rect_eval_batches(dataset, batch_size: int, img_size: int,
                       m0: int, stride: int, pad: float) -> Iterator[dict]:
    """Rectangular eval batching (reference datasets.py:724-747)."""
    from pathlib import Path
    from ..ops.letterbox import letterbox_image_np, letterbox_params

    n = len(dataset)
    files = getattr(dataset, "img_files", None)
    if files is not None:
        from PIL import Image
        whs = []
        for f in files:
            with Image.open(f) as im:
                whs.append(im.size)  # (w, h), header only
        shapes0 = np.asarray([(h, w) for w, h in whs], np.float64)
    else:
        shapes0 = np.asarray([dataset[i][0].shape[:2] for i in range(n)],
                             np.float64)
    ar = shapes0[:, 0] / shapes0[:, 1]                  # h / w
    order = np.argsort(ar)

    for start in range(0, n, batch_size):
        idx = [int(order[j]) for j in
               range(start, min(start + batch_size, n))]
        valid = len(idx)
        while len(idx) < batch_size:
            idx.append(idx[-1])
        ari = ar[idx[:valid]]
        shape = [1.0, 1.0]
        if ari.max() < 1:
            shape = [float(ari.max()), 1.0]
        elif ari.min() > 1:
            shape = [1.0, float(1.0 / ari.min())]
        bh, bw = (np.ceil(np.asarray(shape) * img_size / stride
                          + pad).astype(int) * stride).tolist()

        rgbs, irs, labs, msks, shps, stems, rps = ([], [], [], [], [],
                                                   [], [])
        for i in idx:
            rgb, ir, lab = dataset[i]
            h1, w1 = rgb.shape[:2]
            # host-side u8 letterbox (the reference letterboxes u8 via
            # cv2, datasets.py:1151); keeps the wire to ONE u8 batch
            # upload instead of per-image f32 round trips
            rgbs.append(letterbox_image_np(rgb, (bh, bw), scaleup=False))
            irs.append(letterbox_image_np(ir, (bh, bw), scaleup=False))
            (r, _), _, (dw, dh) = letterbox_params(
                (h1, w1), (bh, bw), scaleup=False)
            # actual letterbox gain/pad, carried so the export path can
            # invert the SAME transform (scaleup=False clamps r to 1.0;
            # recomputing gain from shapes would shrink every box ~6%
            # at 512->544)
            rps.append(((r,), (dw, dh)))
            # xywhn in the original frame -> xywhn in the letterboxed frame
            lab = lab.copy()
            if len(lab):
                lab[:, 1] = (lab[:, 1] * w1 * r + dw) / bw
                lab[:, 2] = (lab[:, 2] * h1 * r + dh) / bh
                lab[:, 3] = lab[:, 3] * w1 * r / bw
                lab[:, 4] = lab[:, 4] * h1 * r / bh
            pl_, pm = pad_labels(lab, m0)
            labs.append(pl_)
            msks.append(pm)
            shps.append((h1, w1))
            stems.append(Path(files[i]).stem if files is not None
                         else str(i))
        yield {
            "img": jnp.asarray(np.stack(rgbs)),
            "ir": jnp.asarray(np.stack(irs)),
            "targets": jnp.asarray(np.stack(labs)),
            "tmask": jnp.asarray(np.stack(msks)),
            "indices": idx, "valid": valid, "shapes": shps,
            "ratio_pads": rps,
            "stems": stems, "net_shape": (bh, bw),
        }


# ----------------------------------------------- rect TRAINING (round 4)

def _rect_augment_one(img, ir, lab, msk, key, *, hw, hyp):
    """Non-mosaic rect-branch augmentation for ONE letterboxed sample
    (reference datasets.py:580-607,869-887: letterbox to the batch shape
    -> random_perspective -> HSV -> flips; mosaic and rect are mutually
    exclusive in the reference, datasets.py:538).

    img/ir: (bh, bw, 3) f32 0-255 already letterboxed on host;
    lab: (M, 5) cls+xywhn in the letterboxed frame."""
    bh, bw = hw
    k_p, k_h, k_f = jax.random.split(key, 3)
    p = PerspectiveParams(degrees=hyp.get("degrees", 0.0),
                          translate=hyp.get("translate", 0.1),
                          scale=hyp.get("scale", 0.5),
                          shear=hyp.get("shear", 0.0),
                          perspective=hyp.get("perspective", 0.0))
    lab_px = xywhn2xyxy(lab[:, 1:5], bw, bh)
    img, ir, labels, mask = random_perspective(img, ir, lab_px, msk, k_p,
                                               p, (bh, bw))
    img = hsv_augment(img, k_h, hyp.get("hsv_h", 0.015),
                      hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4))
    cx = (labels[:, 0] + labels[:, 2]) / 2 / bw
    cy = (labels[:, 1] + labels[:, 3]) / 2 / bh
    ww = (labels[:, 2] - labels[:, 0]) / bw
    hh = (labels[:, 3] - labels[:, 1]) / bh
    lab_n = jnp.stack([cx, cy, ww, hh], axis=-1)
    img, ir, targets, mask = flips(
        img, ir, jnp.concatenate([lab[:, :1], lab_n], -1) * 1.0, mask,
        k_f, hyp.get("flipud", 0.0), hyp.get("fliplr", 0.5))
    return img / 255.0, ir / 255.0, targets, mask


def make_rect_train_batches(dataset, batch_size: int, img_size: int,
                            hyp: dict, *, seed: int = 0,
                            max_labels_per_image: int = 30,
                            stride: int = 32, pad: float = 0.0,
                            epochs: int | None = None) -> Iterator[dict]:
    """Rect TRAINING (reference Train.py --rect + datasets.py:724-747).

    Images are grouped by aspect ratio into fixed batches, each batch
    letterboxed to its own ceil-to-stride shape; augmentation is the
    reference's non-mosaic branch at that shape. Under jit each DISTINCT
    batch shape compiles the augment and train step once — a handful of
    shapes on real datasets, exactly one (square) on VEDAI whose images
    are uniformly 1024x1024.

    Deviation (documented in PARITY.md): batch MEMBERSHIP is fixed by
    the aspect-ratio sort as in the reference; batch order and the
    within-batch sample order reshuffle per epoch (the reference's rect
    path iterates sequentially, giving zero shuffling — strictly less
    stochastic than this).
    """
    from pathlib import Path  # noqa: F401 — parity with _rect_eval_batches
    from ..ops.letterbox import letterbox_image_np, letterbox_params

    n = len(dataset)
    if n < batch_size:
        raise ValueError(f"dataset has {n} images < batch {batch_size}")
    m0 = max_labels_per_image
    files = getattr(dataset, "img_files", None)
    if files is not None:
        from PIL import Image
        whs = []
        for f in files:
            with Image.open(f) as im:
                whs.append(im.size)
        shapes0 = np.asarray([(h, w) for w, h in whs], np.float64)
    else:
        shapes0 = np.asarray([dataset[i][0].shape[:2] for i in range(n)],
                             np.float64)
    ar = shapes0[:, 0] / shapes0[:, 1]                  # h / w
    order = np.argsort(ar)

    # fixed batch membership + per-batch static shapes (datasets.py:735-747).
    # The reference keeps a SMALLER final batch for the n % bs remainder;
    # static shapes can't, so the tail group is padded to batch_size by
    # cycling its own members — every image is still seen each epoch (the
    # padded duplicates oversample the highest-AR tail slightly).
    groups, shapes = [], []
    nb = n // batch_size
    starts = [gi * batch_size for gi in range(nb)]
    if n % batch_size:
        starts.append(n - (n % batch_size))             # tail group
        nb += 1
    for start in starts:
        idx = order[start:start + batch_size]
        if len(idx) < batch_size:
            idx = np.resize(idx, batch_size)            # cycle the tail
        ari = ar[idx]
        shape = [1.0, 1.0]
        if ari.max() < 1:
            shape = [float(ari.max()), 1.0]
        elif ari.min() > 1:
            shape = [1.0, float(1.0 / ari.min())]
        bh, bw = (np.ceil(np.asarray(shape) * img_size / stride
                          + pad).astype(int) * stride).tolist()
        groups.append(idx)
        shapes.append((bh, bw))

    rng = np.random.default_rng(seed)
    aug_cache: dict[tuple, object] = {}

    def aug_for(hw):
        if hw not in aug_cache:
            fn = functools.partial(_rect_augment_one, hw=hw, hyp=hyp)

            def one(img_u8, ir_u8, lab, msk, key):
                return fn(img_u8.astype(jnp.float32),
                          ir_u8.astype(jnp.float32), lab, msk, key)

            aug_cache[hw] = jax.jit(jax.vmap(one))
        return aug_cache[hw]

    epoch = 0
    while epochs is None or epoch < epochs:
        for gi in rng.permutation(nb):
            idx = groups[gi].copy()
            rng.shuffle(idx)
            bh, bw = shapes[gi]
            rgbs, irs, labs, msks = [], [], [], []
            for i in idx:
                rgb, ir, lab = dataset[int(i)]
                h1, w1 = rgb.shape[:2]
                rgbs.append(letterbox_image_np(rgb, (bh, bw),
                                               scaleup=True))
                irs.append(letterbox_image_np(ir, (bh, bw), scaleup=True))
                (r, _), _, (dw, dh) = letterbox_params(
                    (h1, w1), (bh, bw), scaleup=True)
                lab = lab.copy()
                if len(lab):
                    lab[:, 1] = (lab[:, 1] * w1 * r + dw) / bw
                    lab[:, 2] = (lab[:, 2] * h1 * r + dh) / bh
                    lab[:, 3] = lab[:, 3] * w1 * r / bw
                    lab[:, 4] = lab[:, 4] * h1 * r / bh
                pl_, pm = pad_labels(lab, m0)
                labs.append(pl_)
                msks.append(pm)
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(seed),
                                   epoch * nb + int(gi)), batch_size)
            img, irb, targets, tmask = aug_for((bh, bw))(
                jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(irs)),
                jnp.asarray(np.stack(labs)), jnp.asarray(np.stack(msks)),
                keys)
            yield {"img": img, "ir": irb, "targets": targets,
                   "tmask": tmask, "epoch": epoch,
                   "net_shape": (bh, bw)}
        epoch += 1
