"""Train-step integration: loss decreases when overfitting one batch, EMA
moves, and the step runs sharded over the 8-device CPU mesh."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sodt_tpu.models import build_model
from sodt_tpu.train.loss import LossConfig
from sodt_tpu.train.optim import make_optimizer
from sodt_tpu.train.state import TrainState, make_train_step
from sodt_tpu.parallel import make_mesh, shard_batch, replicate_tree

TINY = str(Path(__file__).parent / "tiny.yaml")
HYP = {"lr0": 0.01, "lrf": 0.2, "momentum": 0.937, "weight_decay": 0.0005,
       "warmup_epochs": 0.0, "warmup_iters": 1,
       "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
       "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "fl_gamma": 0.0}


def _setup(batch=2, img=64, mode="RGB"):
    model = build_model(TINY, ch_in=3, input_mode=mode)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(batch, img, img, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=True)
    targets = np.zeros((batch, 8, 5), np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    targets[:, 1] = [0, 0.25, 0.25, 0.12, 0.12]
    tmask = np.zeros((batch, 8), bool)
    tmask[:, :2] = True
    batch_d = {"img": x, "ir": x, "targets": jnp.asarray(targets),
               "tmask": jnp.asarray(tmask)}
    cfg = LossConfig(nc=model.spec.nc, anchors=model.spec.anchors,
                     strides=model.spec.detect_strides,
                     hyp_box=HYP["box"], hyp_obj=HYP["obj"],
                     hyp_cls=HYP["cls"], anchor_t=HYP["anchor_t"])
    tx = make_optimizer(HYP, variables["params"], epochs=50, nb=1)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = make_train_step(model, tx, cfg)
    return model, state, step, batch_d


def test_overfit_single_batch():
    model, state, step, batch = _setup()
    jstep = jax.jit(step)
    state, m0 = jstep(state, batch)
    first = float(m0["loss"])
    for _ in range(30):
        state, m = jstep(state, batch)
    last = float(m["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < 0.7 * first, (first, last)


def test_ema_moves_toward_params():
    model, state, step, batch = _setup()
    jstep = jax.jit(step)
    for _ in range(3):
        state, _ = jstep(state, batch)
    # EMA must differ from both init and current params but stay finite
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    assert np.isfinite(np.asarray(e)).all()
    assert not np.allclose(np.asarray(p), np.asarray(e))
    assert int(state.ema_updates) == 3


def test_train_step_on_mesh():
    model, state, step, batch = _setup(batch=8)
    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8
    state = replicate_tree(state, mesh)
    sbatch = shard_batch(batch, mesh)
    jstep = jax.jit(step)
    state2, m = jstep(state, sbatch)
    assert np.isfinite(float(m["loss"]))
    # params stay replicated after the update
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_batchnorm_stats_update():
    model, state, step, batch = _setup()
    bs0 = jax.tree.leaves(state.batch_stats)[0].copy()
    state, _ = jax.jit(step)(state, batch)
    bs1 = jax.tree.leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs0), np.asarray(bs1))


def test_checkpoint_resume_bit_identical(tmp_path):
    """Train 4 steps, checkpoint, resume into a FRESH optimizer, train 4
    more; params/opt_state must match an uninterrupted 8-step run bitwise.
    Uses accumulate=2 so the reference_accumulate counters/accumulator are
    exercised (the reference restores the full optimizer.state_dict,
    Train.py:171-195)."""
    from sodt_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                           restore_opt_state)

    def fresh():
        model = build_model(TINY, ch_in=3, input_mode="RGB")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, x, train=True)
        targets = np.zeros((2, 8, 5), np.float32)
        targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.25]
        tmask = np.zeros((2, 8), bool)
        tmask[:, 0] = True
        batch = {"img": x, "ir": x, "targets": jnp.asarray(targets),
                 "tmask": jnp.asarray(tmask)}
        cfg = LossConfig(nc=model.spec.nc, anchors=model.spec.anchors,
                         strides=model.spec.detect_strides,
                         hyp_box=HYP["box"], hyp_obj=HYP["obj"],
                         hyp_cls=HYP["cls"], anchor_t=HYP["anchor_t"])
        tx = make_optimizer(HYP, variables["params"], epochs=50, nb=4,
                            accumulate=2)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        step = jax.jit(make_train_step(model, tx, cfg, accumulate=2))
        return state, step, batch

    # uninterrupted run: 8 steps
    state_a, step_a, batch = fresh()
    for _ in range(8):
        state_a, _ = step_a(state_a, batch)

    # interrupted run: 4 steps -> checkpoint -> fresh state -> resume -> 4
    state_b, step_b, _ = fresh()
    for _ in range(4):
        state_b, _ = step_b(state_b, batch)
    save_checkpoint(tmp_path / "ckpt", state_b, epoch=0, best_fitness=0.0)

    state_c, step_c, _ = fresh()  # fresh tx.init(), as a real resume does
    ckpt = load_checkpoint(tmp_path / "ckpt")
    state_c = state_c.replace(
        step=jnp.asarray(ckpt["step"]), params=ckpt["params"],
        batch_stats=ckpt["batch_stats"],
        opt_state=restore_opt_state(state_c.opt_state, ckpt),
        ema_params=ckpt["ema_params"],
        ema_batch_stats=ckpt["ema_batch_stats"],
        ema_updates=jnp.asarray(ckpt["ema_updates"]))
    for _ in range(4):
        state_c, _ = step_c(state_c, batch)

    assert int(state_a.step) == int(state_c.step) == 8
    for pa, pc in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))
    for ea, ec in zip(jax.tree.leaves(state_a.ema_params),
                      jax.tree.leaves(state_c.ema_params)):
        np.testing.assert_array_equal(np.asarray(ea), np.asarray(ec))
    for oa, oc in zip(jax.tree.leaves(state_a.opt_state),
                      jax.tree.leaves(state_c.opt_state)):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(oc))


def test_sr_training_step():
    """SR branch end to end: tiny CNN config + DeepLabSR taps, loss finite
    and sr component present."""
    import yaml
    cfg = {
        "nc": 3, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "l1": 2, "l2": 4, "c1": 32, "c2": 64,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "C3", [32]],          # 2: l1 tap (32ch @ /4)
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "C3", [64]],          # 4: l2 tap (64ch @ /8)
        ],
        "head": [
            [-1, 1, "Conv", [32, 1, 1]],
            [[5], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    model = build_model(cfg, ch_in=3, input_mode="RGB", sr=True, factor=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=True)
    out = model.apply(variables, x, x, train=True,
                      mutable=["batch_stats"])[0]
    assert "sr" in out
    # SR reconstructs 2x the model input (decoder x1 at /4 tap, EDSR x8 from
    # the /8-equivalent): 64 -> 128
    assert out["sr"].shape == (2, 128, 128, 3)

    cfgl = LossConfig(nc=3, anchors=model.spec.anchors,
                      strides=model.spec.detect_strides)
    tx = make_optimizer(HYP, variables["params"], epochs=2, nb=1)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    # SR regime: full-res batch 128, model input downsampled /2 to 64,
    # SR branch reconstructs 128 == original (Train.py:364-427)
    step = jax.jit(make_train_step(model, tx, cfgl, sr=True, down_factor=2))
    xf = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)).astype(np.float32))
    targets = np.zeros((2, 4, 5), np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    tmask = np.zeros((2, 4), bool)
    tmask[:, 0] = True
    batch = {"img": xf, "ir": xf, "targets": jnp.asarray(targets),
             "tmask": jnp.asarray(tmask)}
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"])) and "sr" in m
    assert float(m["sr"]) > 0


def test_warmup_accumulate_plan_matches_reference_formula():
    """gate_fn / ni_of_step vs a literal replay of Train.py:387,448-453."""
    from sodt_tpu.train.optim import warmup_accumulate_plan
    k_final, nw = 4, 37
    gate_fn, ni_of_step = warmup_accumulate_plan(k_final, nw)
    steps = []
    for ni in range(120):
        if ni <= nw:
            k = max(1, int(round(np.interp(ni, [0, nw],
                                           [1.0, float(k_final)]))))
        else:
            k = k_final
        fire = ni % k == 0
        assert bool(gate_fn(ni)) == fire, ni
        if fire:
            steps.append(ni)
    for g, ni in enumerate(steps):
        assert int(ni_of_step(g)) == ni, (g, ni)


def test_reference_accumulate_sums_gradients():
    """The wrapper must SUM grads between fires (backward() semantics), not
    average like optax.MultiSteps, and fire on the ni%k==0 cadence."""
    import optax
    from sodt_tpu.train.optim import reference_accumulate

    inner = optax.scale(-0.1)
    gate = lambda ni: ni % 2 == 0  # fixed k=2 cadence
    tx = reference_accumulate(inner, gate)
    p = {"w": jnp.ones(3)}
    st = tx.init(p)
    g = {"w": jnp.full(3, 2.0)}

    ups, st = tx.update(g, st, p)   # ni=0 fires with just g
    np.testing.assert_allclose(np.asarray(ups["w"]), -0.2)
    assert bool(st.just_stepped)
    ups, st = tx.update(g, st, p)   # ni=1 skips
    np.testing.assert_allclose(np.asarray(ups["w"]), 0.0)
    assert not bool(st.just_stepped)
    ups, st = tx.update(g, st, p)   # ni=2 fires with 2 accumulated grads
    np.testing.assert_allclose(np.asarray(ups["w"]), -0.4)
    assert bool(st.just_stepped)


def test_freeze_substring_pins_params():
    """freeze=('stem',) must leave matching params bit-identical across
    steps (grads AND updates masked — weight decay must not move them
    either), while everything else trains (Train.py:116-121)."""
    from sodt_tpu.train.loss import LossConfig
    model, state, _, batch = _setup()
    cfg = LossConfig(nc=model.spec.nc, anchors=model.spec.anchors,
                     strides=model.spec.detect_strides,
                     hyp_box=HYP["box"], hyp_obj=HYP["obj"],
                     hyp_cls=HYP["cls"], anchor_t=HYP["anchor_t"])
    tx = make_optimizer(HYP, state.params, epochs=50, nb=1)
    # pick a real param subtree name from the tiny model
    names = list(state.params.keys())
    frozen_key = names[0]
    step = jax.jit(make_train_step(model, tx, cfg, freeze=(frozen_key,)))
    before = jax.tree.map(np.asarray, state.params[frozen_key])
    s = state
    for _ in range(3):
        s, _m = step(s, batch)
    after = jax.tree.map(np.asarray, s.params[frozen_key])
    jax.tree.map(np.testing.assert_array_equal, before, after)
    # other params moved
    other = names[-1]
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()),
        state.params[other], s.params[other]))
    assert max(moved) > 0, f"{other} did not train"


def test_epoch_scan_matches_per_step():
    """The epoch-scan feed (ONE jitted dispatch per epoch over the device
    tile bank) must train identically to the per-step dispatch at the
    same seed: same sample stream, same parameter trajectory."""
    from sodt_tpu.data.synthetic import SyntheticVedai
    from sodt_tpu.data.loader import make_bank_feed, make_train_batches
    from sodt_tpu.train.state import make_epoch_scan

    model = build_model(TINY, ch_in=3, input_mode="RGB", nc=8)
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = dict(HYP, mosaic=1.0, fliplr=0.5, translate=0.1, scale=0.5)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=True)
    cfg = LossConfig(nc=8, anchors=model.spec.anchors,
                     strides=model.spec.detect_strides,
                     hyp_box=HYP["box"], hyp_obj=HYP["obj"],
                     hyp_cls=HYP["cls"], anchor_t=HYP["anchor_t"])
    tx = make_optimizer(HYP, variables["params"], epochs=4, nb=4)
    step_raw = make_train_step(model, tx, cfg)

    def fresh_state():
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], tx)

    # per-step trajectory (device-bank iterator regime)
    s_a = fresh_state()
    jstep = jax.jit(step_raw)
    batches = make_train_batches(ds, 2, 64, hyp, seed=7, device_bank=True)
    losses_a = []
    for _ in range(8):  # 2 epochs of nb=4
        b = next(batches)
        s_a, m = jstep(s_a, {k: b[k] for k in
                             ("img", "ir", "targets", "tmask")})
        losses_a.append(float(m["loss"]))

    # epoch-scan trajectory
    feed = make_bank_feed(ds, 2, 64, hyp, seed=7, device_bank=True)
    epoch_fn = make_epoch_scan(step_raw, feed.aug_raw)
    s_b = fresh_state()
    losses_b = []
    for _ in range(2):
        prim, sec, keys = feed.epoch_schedule()
        sec_in = prim if sec is None else sec
        s_b, ms = epoch_fn(s_b, feed.banks, jnp.asarray(prim),
                           jnp.asarray(sec_in), keys)
        losses_b.extend(np.asarray(ms["loss"]).tolist())

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        s_a.params, s_b.params)
    assert int(s_b.step) == 8


def test_load_pretrained_variables(tmp_path):
    """Initial-weights load (Train.py:150-160 parity): shape-matched
    leaves copy over, anchors and mismatched heads keep fresh init."""
    from sodt_tpu.train.checkpoint import (save_checkpoint,
                                           load_pretrained_variables)
    model, state, step, batch = _setup()
    jstep = jax.jit(step)
    s, _ = jstep(state, batch)
    save_checkpoint(tmp_path / "ck", s, epoch=0, best_fitness=0.0)

    model2 = build_model(TINY, ch_in=3, input_mode="RGB")
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = model2.init(jax.random.PRNGKey(7), x, x, train=True)
    v2, hit, total = load_pretrained_variables(v, tmp_path / "ck")
    assert 0 < hit <= total
    # at least one loaded leaf equals the checkpoint's EMA value
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        v2["params"], s.ema_params))
    assert min(diffs) == 0.0


def test_apply_single_cls():
    from sodt_tpu.data.synthetic import SyntheticVedai
    from sodt_tpu.data.vedai import apply_single_cls
    ds = SyntheticVedai(n=4, img_size=64, nc=8)
    assert any(len(l) and l[:, 0].max() > 0 for l in ds.labels)
    apply_single_cls(ds)
    for l in ds.labels:
        if len(l):
            assert (l[:, 0] == 0).all()


def test_epoch_scan_with_accumulation():
    """Epoch scan must thread MultiSteps/accumulation state correctly:
    same trajectory as per-step dispatch at accumulate=2."""
    from sodt_tpu.data.synthetic import SyntheticVedai
    from sodt_tpu.data.loader import make_bank_feed, make_train_batches
    from sodt_tpu.train.state import make_epoch_scan

    model = build_model(TINY, ch_in=3, input_mode="RGB", nc=8)
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = dict(HYP, mosaic=1.0, fliplr=0.5, translate=0.1, scale=0.5)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=True)
    cfg = LossConfig(nc=8, anchors=model.spec.anchors,
                     strides=model.spec.detect_strides,
                     hyp_box=HYP["box"], hyp_obj=HYP["obj"],
                     hyp_cls=HYP["cls"], anchor_t=HYP["anchor_t"])
    tx = make_optimizer(HYP, variables["params"], epochs=2, nb=4,
                        accumulate=2)
    step_raw = make_train_step(model, tx, cfg, accumulate=2)

    s_a = TrainState.create(variables["params"], variables["batch_stats"],
                            tx)
    jstep = jax.jit(step_raw)
    batches = make_train_batches(ds, 2, 64, hyp, seed=11, device_bank=True)
    for _ in range(4):
        b = next(batches)
        s_a, _ = jstep(s_a, {k: b[k] for k in
                             ("img", "ir", "targets", "tmask")})

    feed = make_bank_feed(ds, 2, 64, hyp, seed=11, device_bank=True)
    epoch_fn = make_epoch_scan(step_raw, feed.aug_raw)
    s_b = TrainState.create(variables["params"], variables["batch_stats"],
                            tx)
    prim, sec, keys = feed.epoch_schedule()
    s_b, _ = epoch_fn(s_b, feed.banks, jnp.asarray(prim),
                      jnp.asarray(prim if sec is None else sec), keys)
    assert int(s_b.step) == 4
    assert int(s_a.ema_updates) == int(s_b.ema_updates) == 2  # 4 steps / 2
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        s_a.params, s_b.params)


def test_epoch_chunk_scan_matches_sequential_epochs():
    """Trainer epoch chunking: ONE scan over two epochs' concatenated
    schedules must produce the same parameter trajectory and per-step
    losses as two sequential per-epoch scan dispatches (epoch_schedule
    is RNG-exact under repeated calls, so concatenation preserves the
    sample stream)."""
    from sodt_tpu.data.synthetic import SyntheticVedai
    from sodt_tpu.data.loader import make_bank_feed
    from sodt_tpu.train.state import make_epoch_scan

    model = build_model(TINY, ch_in=3, input_mode="RGB", nc=8)
    ds = SyntheticVedai(n=8, img_size=64, nc=8)
    hyp = dict(HYP, mosaic=1.0, fliplr=0.5, translate=0.1, scale=0.5)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=True)
    cfg = LossConfig(nc=8, anchors=model.spec.anchors,
                     strides=model.spec.detect_strides,
                     hyp_box=HYP["box"], hyp_obj=HYP["obj"],
                     hyp_cls=HYP["cls"], anchor_t=HYP["anchor_t"])
    tx = make_optimizer(HYP, variables["params"], epochs=4, nb=4)
    step_raw = make_train_step(model, tx, cfg)

    def fresh_state():
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], tx)

    # two sequential per-epoch dispatches
    feed_a = make_bank_feed(ds, 2, 64, hyp, seed=7, device_bank=True)
    epoch_fn = make_epoch_scan(step_raw, feed_a.aug_raw)
    s_a = fresh_state()
    losses_a = []
    for _ in range(2):
        prim, sec, keys = feed_a.epoch_schedule()
        sec_in = prim if sec is None else sec
        s_a, ms = epoch_fn(s_a, feed_a.banks, jnp.asarray(prim),
                           jnp.asarray(sec_in), keys)
        losses_a.extend(np.asarray(ms["loss"]).tolist())

    # one chunked dispatch over the concatenated schedules
    feed_b = make_bank_feed(ds, 2, 64, hyp, seed=7, device_bank=True)
    scheds = [feed_b.epoch_schedule() for _ in range(2)]
    prim = np.concatenate([s[0] for s in scheds])
    sec = (None if scheds[0][1] is None
           else np.concatenate([s[1] for s in scheds]))
    keys = jnp.concatenate([s[2] for s in scheds])
    sec_in = prim if sec is None else sec
    s_b, ms = epoch_fn(fresh_state(), feed_b.banks, jnp.asarray(prim),
                       jnp.asarray(sec_in), keys)
    losses_b = np.asarray(ms["loss"]).tolist()

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        s_a.params, s_b.params)


def test_trainer_end_to_end_async_ckpt(tmp_path):
    """Full trainer loop e2e (tiny config, 2 epochs): the epoch-scan bank
    feed + per-eval async checkpoint pipeline must leave valid last/best
    checkpoints, results.txt, and finite metrics behind."""
    from sodt_tpu.train.trainer import TrainConfig, train
    from sodt_tpu.train.checkpoint import load_checkpoint

    tc = TrainConfig(cfg="tests/tiny.yaml", synthetic=True, synthetic_n=8,
                     epochs=2, batch_size=8, img_size=96, input_mode="RGB",
                     save_dir=str(tmp_path / "run"), eval_every=1,
                     bf16=False, autoanchor=False, seed=0, max_labels=8)
    m = train(tc)
    assert np.isfinite(m["best_fitness"])
    run = tmp_path / "run"
    assert (run / "results.txt").exists()
    lines = (run / "results.txt").read_text().splitlines()
    assert len(lines) == 2 and "mAP50=" in lines[-1]
    ckpt = load_checkpoint(run / "last")
    assert int(ckpt["epoch"]) == 1
    assert (run / "best").exists()
