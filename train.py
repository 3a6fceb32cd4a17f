#!/usr/bin/env python
"""Training CLI — the reference `python Train.py ...` surface
(/root/reference/Train.py:599-642), TPU-native.

Example:
  python train.py --cfg configs/model.yaml --data configs/data_vedai.yaml \
      --hyp configs/hyp.scratch.yaml --input_mode RGB+IR --batch-size 16
  python train.py --cfg configs/yolo5m.yaml --synthetic --epochs 3 \
      --img-size 256 --batch-size 4        # smoke run, no dataset needed
"""

from __future__ import annotations

import argparse

from sodt_tpu.train.trainer import TrainConfig, train


def _resume_config(resume: str):
    """Rebuild the full TrainConfig from the run's saved opt.yaml.

    Mirrors the reference resume flow (/root/reference/Train.py:600-610:
    `--resume` replaces the argparse namespace with the run's opt.yaml), so
    `python train.py --resume runs/X/last` needs no other flag. Returns None
    when no opt.yaml exists next to the checkpoint (e.g. a W&B artifact
    string) — the caller then falls back to the explicit CLI flags.
    """
    import dataclasses
    from pathlib import Path

    import yaml

    opt_path = Path(resume).resolve().parent / "opt.yaml"
    if not opt_path.is_file():
        return None
    class _OptLoader(yaml.SafeLoader):
        # older runs serialized tuples as !!python/tuple; accept that one
        # tag on an otherwise-safe loader rather than falling back to
        # unsafe_load (which executes arbitrary constructors from an
        # untrusted run directory)
        pass

    _OptLoader.add_constructor(
        "tag:yaml.org,2002:python/tuple",
        lambda loader, node: tuple(loader.construct_sequence(node)))
    opt = yaml.load(opt_path.read_text(), Loader=_OptLoader)
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    kw = {k: v for k, v in opt.items() if k in fields}
    if "freeze" in kw and kw["freeze"] is not None:
        kw["freeze"] = tuple(kw["freeze"])
    kw["resume"] = resume
    print(f"Resuming from {resume} with {opt_path}")
    return TrainConfig(**kw)


def parse_args(argv=None, return_evolve: bool = False):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default="",
                   help="initial weights checkpoint: shape-matched "
                        "non-strict load, fresh optimizer "
                        "(Train.py:150-160); use --resume for full-state")
    p.add_argument("--single-cls", action="store_true",
                   help="train multi-class data as single-class")
    p.add_argument("--nosave", action="store_true",
                   help="only save the final checkpoint")
    p.add_argument("--notest", action="store_true",
                   help="only evaluate the final epoch")
    p.add_argument("--cfg", default="configs/model.yaml",
                   help="model yaml")
    p.add_argument("--data", default="configs/data_vedai.yaml")
    p.add_argument("--hyp", default="configs/hyp.scratch.yaml")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", "--train_img_size", type=int, default=512,
                   dest="img_size")
    p.add_argument("--input_mode", default="RGB+IR",
                   choices=["RGB", "IR", "RGB+IR", "RGB+IR+fusion",
                            "RGB+IR+MF"])
    p.add_argument("--super", action="store_true", dest="sr",
                   help="train the super-resolution auxiliary branch")
    p.add_argument("--factor", type=int, default=1, dest="sr_factor")
    p.add_argument("--down-factor", type=int, default=1,
                   help="model input = img-size / down-factor (SR regime)")
    p.add_argument("--adam", action="store_true")
    p.add_argument("--linear-lr", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic VEDAI-like dataset")
    p.add_argument("--synthetic-n", type=int, default=64)
    p.add_argument("--save-dir", "--project", default="runs/train/exp",
                   dest="save_dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--no-bf16", action="store_false", dest="bf16")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder blocks (fit bigger batches)")
    p.add_argument("--resume", default="",
                   help="checkpoint to resume from (full optimizer/EMA/step "
                        "restore). The run's opt.yaml is reloaded so no "
                        "other flag is needed (reference Train.py resume "
                        "re-reads opt.yaml the same way)")
    p.add_argument("--noautoanchor", action="store_false", dest="autoanchor")
    p.add_argument("--image-weights", action="store_true")
    p.add_argument("--multi-scale", action="store_true")
    p.add_argument("--rect", action="store_true",
                   help="rectangular training (reference Train.py --rect):"
                        " aspect-ratio-grouped static batch shapes, "
                        "non-mosaic augmentation")
    p.add_argument("--nbs", type=int, default=64,
                   help="nominal batch size for gradient accumulation")
    p.add_argument("--save-period", type=int, default=-1,
                   help="save an epoch checkpoint every N epochs "
                        "(Train.py:549); -1 disables")
    p.add_argument("--freeze", default="",
                   help="comma-separated parameter-path substrings to "
                        "freeze (reference Train.py:116-121)")
    p.add_argument("--scan-epoch", default=None,
                   choices=["auto", "on", "off"],
                   help="epoch-scan feed: whole epochs as one jitted "
                        "dispatch over a device-resident tile bank "
                        "(auto: on when the tiles fit ~1.5 GB HBM and "
                        "the mesh is one device)")
    p.add_argument("--platform", default="", help="force jax platform (e.g. cpu)")
    p.add_argument("--evolve", type=int, default=0, metavar="GENERATIONS",
                   help="evolve hyperparameters for N generations")
    p.add_argument("--wandb", action="store_true",
                   help="W&B scalars + artifact lifecycle (needs wandb)")
    a = p.parse_args(argv)
    if a.platform:
        import jax
        jax.config.update("jax_platforms", a.platform)
    from sodt_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    if a.resume:
        tc = _resume_config(a.resume)
        if tc is not None:
            return (tc, a.evolve) if return_evolve else tc
    tc = TrainConfig(cfg=a.cfg, data=a.data, hyp=a.hyp, epochs=a.epochs,
                       batch_size=a.batch_size, img_size=a.img_size,
                       input_mode=a.input_mode, sr=a.sr,
                       sr_factor=a.sr_factor, adam=a.adam,
                       linear_lr=a.linear_lr, synthetic=a.synthetic,
                       synthetic_n=a.synthetic_n, save_dir=a.save_dir,
                       seed=a.seed, eval_every=a.eval_every, bf16=a.bf16,
                       remat=a.remat,
                       resume=a.resume, down_factor=a.down_factor,
                       autoanchor=a.autoanchor,
                       image_weights=a.image_weights,
                       multi_scale=a.multi_scale, rect=a.rect,
                       nbs=a.nbs,
                       wandb=a.wandb, save_period=a.save_period,
                       freeze=tuple(s for s in a.freeze.split(",") if s),
                       scan_epoch={None: None, "auto": None, "on": True,
                                   "off": False}[a.scan_epoch],
                       weights=a.weights, single_cls=a.single_cls,
                       nosave=a.nosave, notest=a.notest)
    if return_evolve:
        return tc, a.evolve
    return tc


def _main():
    tc, gens = parse_args(return_evolve=True)
    if gens > 0:
        from sodt_tpu.train.evolve import evolve
        best_hyp, best_fit = evolve(tc, generations=gens, seed=tc.seed)
        print({"best_fitness": best_fit})
        return
    metrics = train(tc)
    print({k: v for k, v in metrics.items()
           if not isinstance(v, dict) or k == "val_loss"})


if __name__ == "__main__":
    _main()
