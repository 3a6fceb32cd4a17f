#!/usr/bin/env python
"""Benchmark: VEDAI end-to-end images/sec/chip at 512 px (BASELINE.json).

Measures the full inference path on the flagship config (model.yaml:
cross-channel attention + enhanced SWIN + YOLO head): normalize (/255)
from uint8 -> forward -> Detect decode -> on-device NMS, bf16 compute.
Also measures training-step throughput (forward + loss + backward +
optimizer + EMA) and reports MFU from XLA's own HLO cost analysis against
the chip's bf16 peak.

Two input regimes are timed:
  * primary metric: device-resident uint8 batches, `iters` batches
    processed inside ONE jitted lax.scan per timed dispatch (each scan
    step consumes a different batch and feeds a checksum, so every image
    is processed; one dispatch == a pipelined serving host keeping the
    chip busy). On this rig the TPU hangs off a remote tunnel with
    hundreds of ms of per-dispatch latency — scanning amortizes the
    tunnel so the number measures the machine;
  * `e2e_host_ips`: one dispatch per uint8 host batch including
    host->device transfer through the tunnel (~0.5 GB/s, no overlap) —
    measures this dev rig's feed path, reported for honesty.

Prints ONE JSON line. Primary fields keep the round-over-round contract
{"metric", "value", "unit", "vs_baseline"}; supplementary fields:
inference_ips, e2e_host_ips, train_ips, inference_mfu, train_mfu,
gflops_per_img, train_feed_ips (per-step loader -> train dispatch),
train_scan_feed_ips (epoch-scan feed: the production trainer path),
int8_ips (--int8 quantized serving), topk_path (present only when the
approx top-k compile fell back to the exact sort), and e2e_feed_mbps
(the host->device byte rate the e2e path sustains, MB/s — states how
much of the number is this rig's tunnel link rather than the
framework; production PCIe hosts move GB/s and feed at device rate).

`vs_baseline` divides by an estimated PyTorch-GPU end-to-end throughput for
the same model at 512 px. The reference repo publishes no numbers
(BASELINE.md), so the denominator is an engineering estimate for a single
modern datacenter GPU running the reference eval loop (fp16, batched, CUDA
NMS); treat it as a stable yardstick across rounds rather than a measured
opponent. The MFU fields are the honest hardware evidence.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

ESTIMATED_REFERENCE_GPU_IPS = 120.0  # see module docstring
V5E_BF16_PEAK_FLOPS = 197e12         # TPU v5e peak, bf16


def _timed_window(run_iter, iters: int, repeats: int = 3) -> float:
    """Best-of-N timed windows; every iteration feeds a checksum fetched at
    the window end so async dispatch can't fake completion."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(iters):
            acc = acc + run_iter(i)
        assert np.isfinite(float(acc))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="small shapes for CPU verification")
    p.add_argument("--batch-size", type=int, default=0, help="0 = auto")
    p.add_argument("--train-batch-size", type=int, default=0)
    p.add_argument("--img-size", type=int, default=0)
    p.add_argument("--cfg", default="configs/model.yaml")
    p.add_argument("--iters", type=int, default=0)
    p.add_argument("--top-k", type=int, default=0, help="NMS candidate cap")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="ALSO time the int8 serving path (quantized "
                        "megakernel GEMMs); reported as int8_ips")
    p.add_argument("--platform", default="",
                   help="force jax platform (e.g. cpu)")
    a = p.parse_args()

    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    from sodt_tpu.utils.general import enable_compile_cache
    enable_compile_cache()

    # Backend init is the one step that depends on external hardware (on
    # this rig a tunnel relay). Round 3 lost its entire measurement to an
    # unwrapped jax.default_backend() (rc=1); worse, with the relay dead
    # the axon PJRT client does NOT raise — it blocks forever inside
    # make_c_api_client retrying the connection. So init runs on a
    # watchdog thread with a timeout, with one retry, and on failure the
    # script emits a parseable degraded record and exits 0 instead of a
    # stack trace / infinite hang.
    import threading

    def _init_backend_once(timeout_s: float):
        box: dict = {}

        def work():
            try:
                box["backend"] = jax.default_backend()
            except Exception as e:  # noqa: BLE001
                box["err"] = f"{type(e).__name__}: {e}"

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            return None, f"backend init hung > {timeout_s:.0f}s"
        return box.get("backend"), box.get("err")

    backend, err = _init_backend_once(120.0)
    attempts = 1
    while backend is None and attempts < 4:
        # the relay can flap; this script is the round's one measurement
        # shot, so retry for a few minutes before emitting the degraded
        # record (a hung init thread leaks — bounded by the attempt cap)
        time.sleep(30.0)
        backend, err = _init_backend_once(120.0)
        attempts += 1
    if backend is None:
        print(json.dumps({
            "metric": "VEDAI end-to-end images/sec/chip at 512px",
            "value": None, "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": f"jax backend init failed: {err}",
        }), flush=True)
        import os as _os
        _os._exit(0)  # a hung init thread cannot be joined; exit hard

    import jax.numpy as jnp
    from sodt_tpu.models import build_model
    from sodt_tpu.train.evaluate import make_eval_step
    from sodt_tpu.utils.profiler import flops_estimate

    img_size = a.img_size or (128 if a.quick else 512)
    batch = a.batch_size or (2 if a.quick else 128)
    iters = a.iters or (3 if a.quick else 8)
    on_cpu = (a.platform == "cpu") or backend == "cpu"
    peak = None if on_cpu else V5E_BF16_PEAK_FLOPS

    model = build_model(a.cfg, ch_in=4, dtype=jnp.bfloat16,
                        input_mode="RGB+IR")
    x0 = jnp.zeros((batch, img_size, img_size, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))

    # production inference settings: conf 0.25, best-class only (the
    # reference's detect-path defaults; multi_label stays an eval-protocol
    # feature for mAP runs). top_k 512 >> the candidates that clear
    # conf 0.25 on VEDAI (max_det is 300); the mAP protocol (conf 0.001)
    # keeps its own top_k=4096 in evaluate() — this cap is the serving
    # path. Round 2 benched top_k=2048; the (K, K) IoU matrix is 16x
    # smaller at 512.
    def build_steps(approx):
        step = make_eval_step(model, conf_thres=0.25, iou_thres=0.45,
                              multi_label=False, approx_topk=approx,
                              top_k=a.top_k or (1024 if a.quick else 512))

        @jax.jit
        def step_u8(variables, img_u8, ir_u8):
            img = img_u8.astype(jnp.float32) / 255.0
            ir = ir_u8.astype(jnp.float32) / 255.0
            dets, valid, _ = step(variables, img, ir)
            return dets

        @jax.jit
        def run_scan(variables, imgs_stack, irs_stack, idx):
            def body(acc, i):
                img = imgs_stack[i].astype(jnp.float32) / 255.0
                ir = irs_stack[i].astype(jnp.float32) / 255.0
                dets, valid, _ = step(variables, img, ir)
                return acc + dets.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
            return acc

        return step_u8, run_scan

    rng = np.random.default_rng(0)
    n_inputs = 4  # rotate inputs so no runtime memoization can hide work
    u8 = lambda: rng.integers(0, 256, x0.shape, np.uint8)
    imgs = [u8() for _ in range(n_inputs)]
    irs = [u8() for _ in range(n_inputs)]
    imgs_d = jnp.stack([jnp.asarray(x) for x in imgs])  # (4, B, H, W, 3) u8
    irs_d = jnp.stack([jnp.asarray(x) for x in irs])

    idx = jnp.arange(iters, dtype=jnp.int32) % n_inputs
    topk_path = "approx"
    try:
        step_u8, run_scan = build_steps(True)
        float(run_scan(variables, imgs_d, irs_d, idx))  # compile
    except Exception as e:
        # approx_max_k unavailable on this lowering path: exact top_k.
        # Recorded in the output so a silent fallback can't masquerade
        # as the intended configuration.
        print(f"approx top-k unavailable ({type(e).__name__}); "
              "falling back to exact sort", flush=True)
        topk_path = "exact"
        step_u8, run_scan = build_steps(False)
        float(run_scan(variables, imgs_d, irs_d, idx))

    dt = _timed_window(
        lambda _i: run_scan(variables, imgs_d, irs_d, idx), 1)
    n_chips = jax.device_count()
    ips = batch * iters / dt / n_chips

    def infer_iter_host(i):
        dets = step_u8(variables, jnp.asarray(imgs[i % n_inputs]),
                       jnp.asarray(irs[i % n_inputs]))
        return dets.sum()

    dt_host = _timed_window(infer_iter_host, iters, repeats=2)
    e2e_host_ips = batch * iters / dt_host / n_chips

    # the achieved host->device byte rate of the e2e path, as a plain
    # fact: e2e_host_ips is transfer-bound on this tunnel-attached dev
    # rig, and this states the link rate the pipeline actually sustains
    # (serial upload probes mismeasure a pipelined high-latency link by
    # 10-50x — each blocking sync costs seconds of round-trip latency).
    bytes_img = 2 * 3 * img_size * img_size  # u8 RGB + IR replica
    e2e_feed_mbps = e2e_host_ips * n_chips * bytes_img / 1e6

    # analytical FLOPs of the full inference program (fwd+decode+NMS).
    # XLA's cost analysis cannot see inside Pallas custom calls — lowering
    # the pure-XLA composition (no_kernels) counts the real model FLOPs;
    # with kernels on, the round-2/3 numbers undercounted (118.5 -> 67
    # GF/img as more GEMMs moved into Pallas) and MFU looked worse as the
    # program got faster.
    from sodt_tpu.pallas import no_kernels
    gflops_img = inf_mfu = None
    if peak:  # MFU evidence only matters on real hardware; skip the
        # extra full compile this costs on CPU verification runs
        with no_kernels():
            # FRESH jit wrappers: the gate is read at trace time, and the
            # already-used `step` wrapper would serve its cached (Pallas)
            # jaxpr instead of re-tracing
            step_x = make_eval_step(model, conf_thres=0.25, iou_thres=0.45,
                                    multi_label=False,
                                    top_k=a.top_k
                                    or (1024 if a.quick else 512))

            def step_u8_xla(variables, img_u8, ir_u8):
                return step_x(variables, img_u8, ir_u8)[0]

            fl = flops_estimate(step_u8_xla, variables,
                                jnp.asarray(imgs[0]), jnp.asarray(irs[0]))
        gflops_img = (fl / batch / 1e9) if fl else None
        inf_mfu = (fl / batch * ips / peak) if (fl and peak) else None

    int8_ips = None
    if a.int8:
        from sodt_tpu.pallas import int8_serving
        with int8_serving():
            # trace-time gate: fresh step + compile inside the context
            step_q = make_eval_step(model, conf_thres=0.25, iou_thres=0.45,
                                    multi_label=False, approx_topk=True,
                                    top_k=a.top_k
                                    or (1024 if a.quick else 512))

            @jax.jit
            def run_scan_q(variables, imgs_stack, irs_stack, idx):
                def body(acc, i):
                    img = imgs_stack[i].astype(jnp.float32) / 255.0
                    ir = irs_stack[i].astype(jnp.float32) / 255.0
                    dets, valid, _ = step_q(variables, img, ir)
                    return acc + dets.sum(), None
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                      idx)
                return acc

            float(run_scan_q(variables, imgs_d, irs_d, idx))  # compile
        dt_q = _timed_window(
            lambda _i: run_scan_q(variables, imgs_d, irs_d, idx), 1)
        int8_ips = batch * iters / dt_q / n_chips

    out = {
        "metric": "VEDAI end-to-end images/sec/chip at 512px",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / ESTIMATED_REFERENCE_GPU_IPS, 3),
        "inference_ips": round(ips, 2),
        "e2e_host_ips": round(e2e_host_ips, 2),
        "e2e_feed_mbps": round(e2e_feed_mbps, 1),
    }
    if int8_ips is not None:
        out["int8_ips"] = round(int8_ips, 2)
    if topk_path != "approx":
        out["topk_path"] = topk_path
    if gflops_img:
        out["gflops_per_img"] = round(gflops_img, 1)
    if inf_mfu is not None:
        out["inference_mfu"] = round(inf_mfu, 4)

    if not a.skip_train:
        from sodt_tpu.train.loss import LossConfig
        from sodt_tpu.train.optim import make_optimizer
        from sodt_tpu.train.state import TrainState, make_train_step

        tbatch = a.train_batch_size or (2 if a.quick else 32)
        tmodel = build_model(a.cfg, ch_in=4, dtype=jnp.bfloat16,
                             input_mode="RGB+IR", remat=not a.quick)
        xt = jnp.zeros((tbatch, img_size, img_size, 3), jnp.float32)
        tvars = jax.jit(lambda k: tmodel.init(k, xt, xt, train=True))(
            jax.random.PRNGKey(0))
        hyp = {"lr0": 0.01, "lrf": 0.2, "momentum": 0.937,
               "warmup_iters": 1, "warmup_momentum": 0.8,
               "warmup_bias_lr": 0.1, "box": 0.05, "cls": 0.5,
               "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0, "anchor_t": 4.0,
               "fl_gamma": 0.0}
        cfg = LossConfig(nc=tmodel.spec.nc, anchors=tmodel.spec.anchors,
                         strides=tmodel.spec.detect_strides)
        tx = make_optimizer(hyp, tvars["params"], epochs=10, nb=100)
        state = TrainState.create(tvars["params"], tvars["batch_stats"], tx)
        tstep_raw = make_train_step(tmodel, tx, cfg)
        tstep = jax.jit(tstep_raw)

        targets = np.zeros((tbatch, 30, 5), np.float32)
        targets[:, 0] = [1, 0.5, 0.5, 0.2, 0.2]
        tmask = np.zeros((tbatch, 30), bool)
        tmask[:, 0] = True
        timgs = [u8() if tbatch == batch else
                 rng.integers(0, 256, xt.shape, np.uint8)
                 for _ in range(n_inputs)]
        tj = jnp.asarray(targets)
        tm = jnp.asarray(tmask)

        # normalize from uint8 INSIDE jit; device-resident inputs; scan
        # K steps per dispatch like the inference path (training loops
        # naturally amortize dispatch — the real trainer keeps the device
        # fed the same way)
        def tstep_u8(state, img_u8, targets, tmask):
            img = img_u8.astype(jnp.float32) / 255.0
            return tstep(state, {"img": img, "ir": img,
                                 "targets": targets, "tmask": tmask})

        timgs_d = jnp.stack([jnp.asarray(x) for x in timgs])

        @jax.jit
        def run_train_scan(state, imgs_stack, targets, tmask, idx):
            def body(st, i):
                s, m = tstep_u8(st, imgs_stack[i], targets, tmask)
                return s, m["loss"]
            state, losses = jax.lax.scan(body, state, idx)
            return state, losses.sum()

        titers = max(iters // 2, 2)
        tidx = jnp.arange(titers, dtype=jnp.int32) % n_inputs
        state, l0 = run_train_scan(state, timgs_d, tj, tm, tidx)
        jax.block_until_ready(l0)  # compile
        state_box = [state]

        def train_iter(_i):
            s, loss = run_train_scan(state_box[0], timgs_d, tj, tm, tidx)
            state_box[0] = s
            return loss

        tdt = _timed_window(train_iter, 1, repeats=2)
        tips = tbatch * titers / tdt / n_chips
        out["train_ips"] = round(tips, 2)
        if peak:
            with no_kernels():
                tstep_x = jax.jit(make_train_step(tmodel, tx, cfg))

                def tstep_u8_xla(state, img_u8, targets, tmask):
                    img = img_u8.astype(jnp.float32) / 255.0
                    return tstep_x(state, {"img": img, "ir": img,
                                           "targets": targets,
                                           "tmask": tmask})

                tfl = flops_estimate(tstep_u8_xla, state_box[0],
                                     timgs_d[0], tj, tm)
            if tfl:
                out["train_mfu"] = round(tfl / tbatch * tips / peak, 4)

        # the REAL trainer feed path (feed proof): device-bank loader ->
        # jitted augmentation -> per-step train dispatch, exactly the
        # trainer.py cadence. Compare against train_ips (scan-amortized
        # device ceiling) to see what the input pipeline costs.
        from sodt_tpu.data.synthetic import SyntheticVedai
        from sodt_tpu.data.loader import make_train_batches
        ds = SyntheticVedai(n=max(2 * tbatch, 64), img_size=img_size)
        hyp_aug = dict(hyp, mosaic=1.0, hsv_h=0.015, hsv_s=0.7,
                       hsv_v=0.4, translate=0.1, scale=0.5, fliplr=0.5)
        feed = make_train_batches(ds, tbatch, img_size, hyp_aug, seed=0)
        pick = lambda b: {k: b[k] for k in
                          ("img", "ir", "targets", "tmask")}
        st = state_box[0]
        st, m0 = tstep(st, pick(next(feed)))
        assert np.isfinite(float(m0["loss"]))  # compile + sync
        wsteps = max(titers, 4)
        t0 = time.perf_counter()
        for _ in range(wsteps):
            st, m = tstep(st, pick(next(feed)))
        assert np.isfinite(float(m["loss"]))   # sync the window
        out["train_feed_ips"] = round(
            tbatch * wsteps / (time.perf_counter() - t0) / n_chips, 2)

        # the trainer's epoch-scan fast path (trainer.py feed=BankFeed):
        # gather -> augment -> train-step for a WHOLE epoch inside one
        # jitted lax.scan — the steady-state production feed. This is the
        # feed-proof number to put against train_ips.
        from sodt_tpu.data.loader import make_bank_feed
        from sodt_tpu.train.state import make_epoch_scan
        # epoch length = wsteps so the compiled scan stays small
        ds_bank = SyntheticVedai(n=tbatch * wsteps, img_size=img_size)
        bfeed = make_bank_feed(ds_bank, tbatch, img_size, hyp_aug, seed=0,
                               device_bank=True)
        epoch_fn = make_epoch_scan(tstep_raw, bfeed.aug_raw)

        def run_epoch():
            prim, sec, keys = bfeed.epoch_schedule()
            sec_in = prim if sec is None else sec
            s, ms = epoch_fn(state_box[0], bfeed.banks, jnp.asarray(prim),
                             jnp.asarray(sec_in), keys)
            state_box[0] = s
            return float(np.asarray(ms["loss"]).sum())

        assert np.isfinite(run_epoch())  # compile + sync
        n_epochs = max(2, (2 * wsteps) // bfeed.steps_per_epoch)
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n_epochs):
            acc += run_epoch()
        assert np.isfinite(acc)
        out["train_scan_feed_ips"] = round(
            tbatch * bfeed.steps_per_epoch * n_epochs
            / (time.perf_counter() - t0) / n_chips, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
