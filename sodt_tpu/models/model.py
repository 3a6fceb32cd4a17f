"""DetectionModel: the assembled detector as one flax module.

Functional redesign of the reference `Model` container
(/root/reference/basics/models/model.py:73-348): input-mode routing
(RGB / IR / RGB+IR / RGB+IR+fusion / RGB+IR+MF, model.py:186-198), the
graph walk with `from`-index gathers (model.py:217-296), the optional
super-resolution branch taps (model.py:109-117,291), and Detect — but as a
pure function of (params, batch): no mutable buffers, no training flags on
the module, one jitted graph per (shape, train) combination.

The inference decode (grid + anchor transform) lives in
`sodt_tpu.models.detect.decode_detections` and composes outside this module
so the train graph carries no dead code. TTA-augmented inference
(model.py:156-184) is provided by `sodt_tpu.train.evaluate.tta_forward`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .compiler import ModelSpec, build_module
from .detect import Detect
from .sr import DeepLabSR

INPUT_MODES = ("RGB", "IR", "RGB+IR", "RGB+IR+fusion", "RGB+IR+MF")


class DetectionModel(nn.Module):
    spec: ModelSpec
    sr: bool = False
    sr_factor: int = 2
    input_mode: str = "RGB+IR"
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_mods = [build_module(ld, self.dtype, remat=self.remat)
                              for ld in self.spec.backbone
                              if ld.name != "Detect"]
        self.head_mods = [build_module(ld, self.dtype)
                          for ld in self.spec.head if ld.name != "Detect"]
        if self.spec.steam:
            self.steam_mods = [build_module(ld, self.dtype)
                               for ld in self.spec.steam]
        self.detect = Detect(nc=self.spec.nc, anchors=self.spec.anchors,
                             strides=self.spec.detect_strides,
                             dtype=self.dtype, name="detect")
        if self.sr:
            c1, c2 = self.spec.sr_ch
            sr_in = 3 if self.input_mode in ("RGB", "IR") else 4
            self.model_up = DeepLabSR(out_ch=sr_in, c1=c1, c2=c2,
                                      factor=self.sr_factor,
                                      dtype=self.dtype, name="model_up")

    def _route(self, x, ir, train):
        """Fuse the two modalities per input_mode (model.py:186-198)."""
        mode = self.input_mode
        if mode == "RGB":
            return x
        if mode == "IR":
            return ir if ir is not None else x
        if mode == "RGB+IR":
            return jnp.concatenate([x, ir[..., 0:1]], axis=-1)
        if mode == "RGB+IR+fusion":
            s1 = self._walk_steam(x, train)
            s2 = self._walk_steam(ir, train)
            return jnp.concatenate([s1, s2], axis=-1)
        if mode == "RGB+IR+MF":
            return [x, ir[..., 0:1]]
        raise ValueError(f"unknown input_mode {mode!r}")

    def _walk_steam(self, x, train):
        for mod, ld in zip(self.steam_mods, self.spec.steam):
            x = mod(x, train)
        return x

    def __call__(self, x, ir=None, train: bool = False):
        """Returns dict with raw per-scale Detect outputs and features.

        x, ir: NHWC uint8-scaled-to-[0,1] float inputs (RGB 3ch, IR 3ch; the
        IR png triplicates its single channel like the reference loader).
        """
        steam = self._route(x, ir, train)

        y: dict[int, jax.Array] = {}
        save = set(self.spec.save) | set(self.spec.detect_from)

        if self.spec.mode == "split":
            encoder = self.backbone_mods[0]
            feats = encoder(steam if not isinstance(steam, list) else steam,
                            train)
            for j, fmap in enumerate(feats):
                y[j] = fmap
            x_cur = feats[-1]
            offset = len(feats)
            head_iter = zip(self.head_mods,
                            [ld for ld in self.spec.head
                             if ld.name != "Detect"])
        else:
            x_cur = steam
            offset = 0
            head_iter = zip(
                self.backbone_mods + self.head_mods,
                [ld for ld in
                 list(self.spec.backbone) + list(self.spec.head)
                 if ld.name != "Detect"])

        for mod, ld in head_iter:
            if ld.f != (ld.i - 1,):
                inputs = [x_cur if j == -1 or j == ld.i - 1 else y[j]
                          for j in ld.f]
                x_in = inputs if len(inputs) > 1 else inputs[0]
            else:
                x_in = x_cur
            x_cur = mod(x_in, train)
            if ld.i in save or self.sr:
                y[ld.i] = x_cur

        det_in = [y[j] if j in y else x_cur for j in self.spec.detect_from]
        raw = self.detect(det_in, train)

        out = {"raw": raw}
        if self.sr and self.spec.sr_taps:
            l1, l2 = self.spec.sr_taps
            out["sr"] = self.model_up(y[l1], y[l2], train)
        return out

    # convenience re-exports for callers
    @property
    def anchors_per_level(self):
        import numpy as np
        a = np.asarray(self.spec.anchors, dtype=np.float32)
        return a.reshape(len(self.spec.anchors), -1, 2)

    @property
    def strides(self):
        return self.spec.detect_strides
