#!/usr/bin/env python
"""Inference CLI: run a detector over images / folders / videos / streams.

Covers the reference inference-source surface — LoadImages for files and
video (/root/reference/basics/utils/datasets.py:150-237) plus the threaded
LoadWebcam/LoadStreams live sources (datasets.py:238-365, via
sodt_tpu.data.streams) — with device-side letterbox + jitted forward +
on-device NMS, drawing results or emitting YOLO-format txts.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

IMG_EXT = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp"}
VID_EXT = {".mp4", ".avi", ".mov", ".mkv"}


def iter_sources(source: str, want_ir: bool = False):
    """Yield (name, rgb uint8 HWC, ir-or-None) frames from file/folder/video.

    For VEDAI-style pairs, *_co.png images pick up their *_ir.png sibling
    when present (path derivation parity with the dataset loader)."""
    from sodt_tpu.data.vedai import _read_image, derive_ir_path
    p = Path(source)
    files = sorted(p.glob("*")) if p.is_dir() else [p]
    for f in files:
        if f.suffix.lower() in IMG_EXT:
            if "_ir" in f.stem and want_ir:
                continue  # consumed as a pair partner
            ir = None
            if want_ir:
                irp = Path(derive_ir_path(str(f)))
                if irp.exists() and irp != f:
                    ir = _read_image(str(irp))
            yield str(f), _read_image(str(f)), ir
        elif f.suffix.lower() in VID_EXT:
            import cv2
            cap = cv2.VideoCapture(str(f))
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield f"{f}#{i}", frame[..., ::-1].copy(), None
                i += 1
            cap.release()


def iter_stream_frames(source: str, max_frames: int):
    """Yield (name, rgb, None) from live sources until max_frames."""
    from sodt_tpu.data.streams import StreamSource
    n = 0
    with StreamSource(source) as src:
        for names, frames in src:
            for name, frame in zip(names, frames):
                yield f"{name}#{n}", frame, None
                n += 1
                if n >= max_frames:
                    return


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True,
                    help="image / folder / video path, webcam index, "
                         "rtsp/http URL, or .streams list file")
    ap.add_argument("--max-frames", type=int, default=1000,
                    help="stop live streams after N frames")
    ap.add_argument("--cfg", default="configs/model.yaml")
    ap.add_argument("--weights", default="")
    ap.add_argument("--data", default="configs/data_vedai.yaml")
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--input_mode", default="RGB",
                    choices=["RGB", "IR", "RGB+IR"])
    ap.add_argument("--save-dir", default="runs/detect/exp")
    ap.add_argument("--save-txt", action="store_true")
    ap.add_argument("--save-img", action="store_true")
    ap.add_argument("--platform", default="")
    ap.add_argument("--no-bf16", action="store_false", dest="bf16")
    a = ap.parse_args(argv)

    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    from sodt_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import yaml
    from sodt_tpu.models import build_model
    from sodt_tpu.ops.letterbox import letterbox_image, letterbox_params
    from sodt_tpu.ops.boxes import scale_coords
    from sodt_tpu.train.evaluate import make_eval_step
    from sodt_tpu.train.checkpoint import load_checkpoint, eval_variables

    from sodt_tpu.utils.general import resolve_config_path
    with open(resolve_config_path(a.data)) as f:
        data_cfg = yaml.safe_load(f)
    nc = int(data_cfg.get("nc", 8))
    names = data_cfg.get("names", [str(i) for i in range(nc)])
    ch_in = {"RGB": 3, "IR": 3, "RGB+IR": 4}[a.input_mode]
    dtype = jnp.bfloat16 if a.bf16 else jnp.float32
    model = build_model(a.cfg, ch_in=ch_in, nc=nc, dtype=dtype,
                        input_mode=a.input_mode)
    if a.weights:
        from sodt_tpu.utils.downloads import attempt_download
        variables = eval_variables(load_checkpoint(attempt_download(a.weights)))
    else:
        x0 = jnp.zeros((1, a.img_size, a.img_size, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)

    # serving settings: approx top-k is exact whenever the candidates
    # clearing conf_thres fit in top_k (the detect-CLI conf regime).
    # Below the serving regime (conf < 0.1, mAP-style sweeps) far more
    # candidates clear the threshold, so the 512 cap + ~0.95-recall
    # approx_max_k would silently drop boxes vs the reference detect
    # path — widen to the eval-protocol cap with the exact sort there.
    serving = a.conf_thres >= 0.1
    step = make_eval_step(model, conf_thres=a.conf_thres,
                          iou_thres=a.iou_thres, multi_label=False,
                          top_k=512 if serving else 4096,
                          approx_topk=serving)
    save_dir = Path(a.save_dir)
    (save_dir / "labels").mkdir(parents=True, exist_ok=True)

    results = []
    want_ir = "IR" in a.input_mode
    from sodt_tpu.data.streams import is_stream_source
    frames = (iter_stream_frames(a.source, a.max_frames)
              if is_stream_source(a.source)
              else iter_sources(a.source, want_ir=want_ir))
    for name, rgb, ir_img in frames:
        h0, w0 = rgb.shape[:2]
        img = letterbox_image(jnp.asarray(rgb, jnp.float32), a.img_size,
                              scaleup=True) / 255.0
        if ir_img is not None:
            if ir_img.shape[-1] == 1:
                ir_img = np.repeat(ir_img, 3, -1)
            ir = letterbox_image(jnp.asarray(ir_img, jnp.float32),
                                 a.img_size, scaleup=True) / 255.0
        else:
            ir = img
        dets, valid, _ = step(variables, img[None], ir[None])
        d = np.asarray(dets[0])[np.asarray(valid[0])]
        if d.shape[0]:
            d[:, :4] = np.asarray(scale_coords(
                (a.img_size, a.img_size), jnp.asarray(d[:, :4]), (h0, w0)))
        results.append({"source": name, "n": int(d.shape[0])})
        print(f"{name}: {d.shape[0]} detections")
        stem = Path(name.split('#')[0]).stem + (
            "_" + name.split('#')[1] if "#" in name else "")
        if a.save_txt:
            with open(save_dir / "labels" / f"{stem}.txt", "w") as f:
                for x1, y1, x2, y2, conf, cls in d:
                    cx, cy = (x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0
                    bw, bh = (x2 - x1) / w0, (y2 - y1) / h0
                    f.write(f"{int(cls)} {cx:.6f} {cy:.6f} {bw:.6f} "
                            f"{bh:.6f} {conf:.4f}\n")
        if a.save_img:
            from sodt_tpu.utils.plots import plot_images
            t = np.zeros((1, max(d.shape[0], 1), 5), np.float32)
            m = np.zeros((1, max(d.shape[0], 1)), bool)
            for i, (x1, y1, x2, y2, conf, cls) in enumerate(d):
                t[0, i] = [cls, (x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0,
                           (x2 - x1) / w0, (y2 - y1) / h0]
                m[0, i] = True
            plot_images(rgb[None].astype(np.float32) / 255.0, t, m,
                        save_dir / f"{stem}.png", names)
    print(json.dumps({"images": len(results),
                      "detections": sum(r["n"] for r in results)}))


if __name__ == "__main__":
    main()
