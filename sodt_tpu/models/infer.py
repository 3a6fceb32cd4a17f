"""High-level predictor API (reference autoShape/Detections/NMS wrappers,
/root/reference/basics/models/common.py:285-444).

`Predictor` is input-robust: numpy arrays, file paths, or lists thereof go
in; a `Detections` result object with per-image boxes in native pixel space
comes out, with save/print helpers — the reference's autoShape+Detections
surface without PIL/pandas dependencies.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.letterbox import letterbox_image
from ..ops.boxes import scale_coords
from ..train.evaluate import make_eval_step


class Detections:
    """Per-image detection results in native pixel space
    (reference common.py:353-430)."""

    def __init__(self, dets: list[np.ndarray], shapes, names):
        self.dets = dets          # list of (n, 6) xyxy+conf+cls
        self.shapes = shapes
        self.names = names
        self.n = len(dets)

    def __len__(self):
        return self.n

    def pandas(self):
        import pandas as pd
        frames = []
        for d in self.dets:
            frames.append(pd.DataFrame(
                d, columns=["xmin", "ymin", "xmax", "ymax",
                            "confidence", "class"]))
        return frames

    def print(self):
        for i, d in enumerate(self.dets):
            counts = {}
            for cls in d[:, 5].astype(int):
                name = (self.names[cls] if cls < len(self.names)
                        else str(cls))
                counts[name] = counts.get(name, 0) + 1
            desc = ", ".join(f"{v} {k}" for k, v in counts.items()) or "none"
            print(f"image {i}: {desc}")

    def save(self, save_dir="runs/detect/exp"):
        from ..utils.plots import plot_images
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        for i, (d, img) in enumerate(zip(self.dets, self._imgs)):
            h, w = img.shape[:2]
            t = np.zeros((1, max(len(d), 1), 5), np.float32)
            m = np.zeros((1, max(len(d), 1)), bool)
            for j, (x1, y1, x2, y2, conf, cls) in enumerate(d):
                t[0, j] = [cls, (x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
                           (x2 - x1) / w, (y2 - y1) / h]
                m[0, j] = True
            plot_images(img[None].astype(np.float32) / 255.0, t, m,
                        Path(save_dir) / f"image{i}.png", self.names)


class Predictor:
    """Input-robust inference wrapper (reference autoShape,
    common.py:304-350)."""

    conf = 0.25
    iou = 0.45
    max_det = 300

    def __init__(self, model, variables, img_size: int = 512, names=None):
        self.model = model
        self.variables = variables
        self.img_size = img_size
        self.names = names or [str(i) for i in range(model.spec.nc)]
        # serving settings (autoShape parity is conf 0.25): approx top-k
        # is exact whenever the conf survivors fit in top_k
        self._step = make_eval_step(model, conf_thres=self.conf,
                                    iou_thres=self.iou,
                                    max_det=self.max_det,
                                    multi_label=False,
                                    top_k=512, approx_topk=True)

    def _to_array(self, item):
        if isinstance(item, (str, Path)):
            from ..data.vedai import _read_image
            img = _read_image(str(item))
            return np.repeat(img, 3, -1) if img.shape[-1] == 1 else img
        return np.asarray(item)

    def __call__(self, inputs, ir=None):
        items = inputs if isinstance(inputs, (list, tuple)) else [inputs]
        irs = (ir if isinstance(ir, (list, tuple))
               else [ir] * len(items))
        imgs = [self._to_array(x) for x in items]
        ir_imgs = [self._to_array(x) if x is not None else im
                   for x, im in zip(irs, imgs)]
        shapes = [im.shape[:2] for im in imgs]

        lb = [letterbox_image(jnp.asarray(im, jnp.float32), self.img_size)
              / 255.0 for im in imgs]
        lb_ir = [letterbox_image(jnp.asarray(im, jnp.float32), self.img_size)
                 / 255.0 for im in ir_imgs]
        batch = jnp.stack(lb)
        batch_ir = jnp.stack(lb_ir)
        dets, valid, _ = self._step(self.variables, batch, batch_ir)
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        out = []
        for i, (h0, w0) in enumerate(shapes):
            d = dets[i][valid[i]].copy()
            if len(d):
                d[:, :4] = np.asarray(scale_coords(
                    (self.img_size, self.img_size), jnp.asarray(d[:, :4]),
                    (h0, w0)))
            out.append(d)
        res = Detections(out, shapes, self.names)
        res._imgs = imgs
        return res
