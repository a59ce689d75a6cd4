"""End-to-end runs of the five non-flagship methods on the synthetic dataset
with tiny towers (the Adapter method has its own e2e file)."""

import json
import os

import numpy as np
import pytest

from clip_gp_tpu.core.config import Config
from clip_gp_tpu.core.registry import build_trainer
from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.data.pipeline import build_data_manager
import clip_gp_tpu.data.datasets  # noqa: F401
import clip_gp_tpu.methods  # noqa: F401


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def make_config(tmp_path, trainer_name, **adapter_overrides):
    c = Config()
    c.trainer_name = trainer_name
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = 4
    c.model.backbone_name = "TEST-ViT"
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = 8
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.adapter.clip_adapter_epochs = 2
    c.adapter.taskres_epochs = 2
    c.adapter.tip_adapter_epochs = 2
    c.adapter.gp_num_mc_samples_train = 4
    c.adapter.gp_num_mc_samples_eval = 8
    c.adapter.n_ctx = 2
    c.optim.max_epoch = 2
    c.optim.name = "adamw"
    c.optim.lr = 0.01
    c.train.print_freq = 100
    c.output_dir = str(tmp_path / "out")
    c.seed = 1
    for key, val in adapter_overrides.items():
        setattr(c.adapter, key, val)
    return c


def _run(config):
    set_random_seed(config.seed)
    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)
    trainer.train()
    path = os.path.join(config.output_dir, "metrics.json")
    assert os.path.exists(path)
    with open(path) as f:
        payload = json.load(f)
    assert np.isfinite(payload["metrics"]["top1_acc"])
    assert 0 <= payload["metrics"]["top1_acc"] <= 100
    return trainer, payload


def test_clip_adapter(tmp_path):
    trainer, payload = _run(make_config(tmp_path, "CLIP-Adapter"))
    assert payload["method"] == "clip-adapter"
    assert "fc1" in trainer.params


def test_clip_adapter_with_gp_stage(tmp_path):
    _, payload = _run(make_config(tmp_path, "CLIP-Adapter", use_gp=True, gp_pca_dim=8))
    assert payload["method"] == "clip-adapter"


def test_taskres(tmp_path):
    trainer, payload = _run(make_config(tmp_path, "TaskRes"))
    assert payload["method"] == "taskres"
    assert float(np.abs(np.asarray(trainer.params["residuals"])).sum()) > 0


def test_taskres_with_tw_stage(tmp_path):
    _, payload = _run(
        make_config(
            tmp_path, "TaskRes", taskres_use_template_weight_training=True,
            template_tw_l2_lambda=0.1,
        )
    )
    assert payload["method"] == "taskres"


def test_tip_adapter(tmp_path):
    trainer, payload = _run(make_config(tmp_path, "Tip-Adapter"))
    assert payload["method"] == "tipa"
    assert trainer.best_beta in (1.0, 2.0, 5.0)
    assert trainer.best_alpha in (1.0, 5.0, 10.0, 20.0, 50.0)


def test_tip_adapter_f(tmp_path):
    config = make_config(tmp_path, "Tip-Adapter-F")
    trainer, payload = _run(config)
    assert payload["method"] == "tipaf"
    assert config.adapter.tip_adapter_trainable is True
    # regression: the default init beta/alpha of 0.0 used to zero the
    # adapter gradient, NaN the AdamW update (eps=0), and poison every
    # downstream metric (the reference defect, COMPONENTS.md quirk list)
    assert np.isfinite(np.asarray(trainer.adapter_w)).all()
    assert np.isfinite(payload["metrics"]["aece"])
    assert np.isfinite(payload["metrics"]["ece"])


def test_coop(tmp_path):
    trainer, payload = _run(make_config(tmp_path, "Adapter-CoOp"))
    assert payload["method"] == "coop"
    assert trainer.params["ctx"].shape == (2, 64)


def test_coop_csc_and_ctx_init(tmp_path):
    trainer, _ = _run(make_config(tmp_path, "Adapter-CoOp", csc=True))
    assert trainer.params["ctx"].shape == (4, 2, 64)  # per-class contexts
    trainer2, _ = _run(
        make_config(tmp_path, "Adapter-CoOp", ctx_init="a photo of a")
    )
    assert trainer2.params["ctx"].shape == (4, 64)  # 4 words from the phrase


def test_cocoop(tmp_path):
    trainer, payload = _run(make_config(tmp_path, "Adapter-CoCoOp"))
    assert payload["method"] == "cocoop"
    assert "meta_fc1" in trainer.params


def test_taskres_with_gp_stage(tmp_path):
    trainer, payload = _run(
        make_config(tmp_path, "TaskRes", use_gp=True, gp_pca_dim=8)
    )
    assert payload["method"] == "taskres"
    assert trainer.gp_bundle is not None


def test_tip_adapter_with_gp_stage(tmp_path):
    trainer, payload = _run(
        make_config(tmp_path, "Tip-Adapter", use_gp=True, gp_pca_dim=8)
    )
    assert payload["method"] == "tipa"
    assert trainer.gp_bundle is not None


def test_tip_adapter_with_tw_stage(tmp_path):
    _, payload = _run(
        make_config(
            tmp_path, "Tip-Adapter", tip_adapter_use_template_weight_training=True
        )
    )
    assert payload["method"] == "tipa"


def test_adapter_resume(tmp_path):
    """Train 2 epochs with checkpoints, then resume for the final epoch."""
    config = make_config(tmp_path, "Adapter")
    config.adapter.clip_adapter_epochs = 2
    config.train.enable_adapter_checkpoints = True
    _run(config)
    config2 = make_config(tmp_path, "Adapter")
    config2.output_dir = str(tmp_path / "out2")
    config2.adapter.clip_adapter_epochs = 3
    config2.train.enable_adapter_checkpoints = True
    config2.resume = str(tmp_path / "out")  # resume from the first run
    trainer, payload = _run(config2)
    assert trainer.start_epoch == 2  # continued after the saved epoch


def test_adapter_with_muon(tmp_path):
    config = make_config(tmp_path, "Adapter")
    config.optim.name = "muon"
    _, payload = _run(config)
    assert np.isfinite(payload["metrics"]["top1_acc"])


def test_adapter_minmax_template_init(tmp_path):
    _, payload = _run(
        make_config(tmp_path, "Adapter", template_init_method="minmax")
    )
    assert np.isfinite(payload["metrics"]["top1_acc"])


def test_cocoop_batched_vs_chunked_logits_parity(tmp_path, monkeypatch):
    """The single-call batched text encode (PROMPT_BUDGET >= B*K) must produce
    the same logits as the chunked lax.map fallback path."""
    import jax.numpy as jnp

    from clip_gp_tpu.methods import cocoop as cocoop_mod

    config = make_config(tmp_path, "Adapter-CoCoOp")
    set_random_seed(config.seed)
    dm = build_data_manager(config)

    def build(budget):
        monkeypatch.setattr(cocoop_mod, "PROMPT_BUDGET", budget)
        set_random_seed(config.seed)
        trainer = build_trainer(config, dm)
        trainer.build_model()
        return trainer

    trainer_full = build(10_000)  # B*K = 8*4 << budget: single call
    trainer_chunk = build(4)  # chunk = 1 image per call: lax.map path

    rng = np.random.default_rng(0)
    d = int(trainer_full.arch.embed_dim)
    feats = rng.normal(size=(8, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    # identical init (same seed) -> identical params; only chunking differs
    logits_full = np.asarray(
        trainer_full._logits_fn(trainer_full.params, jnp.asarray(feats))
    )
    logits_chunk = np.asarray(
        trainer_chunk._logits_fn(trainer_full.params, jnp.asarray(feats))
    )
    np.testing.assert_allclose(logits_full, logits_chunk, rtol=2e-4, atol=2e-4)


def test_cocoop_subchunked_tower_parity(tmp_path, monkeypatch):
    """k > PROMPT_BUDGET floors the image-axis chunk at one image whose k
    prompts still exceed the budget; the flat-prompt-axis sub-chunk scan
    (remat per slice — the ImageNet-scale OOM fix, 12 rematted fp32 layer
    stashes ~1.8 MB/prompt measured 8.8 GB at T=5 x k=1000) must match the
    single-call path in logits AND gradients."""
    import jax
    import jax.numpy as jnp

    from clip_gp_tpu.methods import cocoop as cocoop_mod

    config = make_config(tmp_path, "Adapter-CoCoOp")
    set_random_seed(config.seed)
    dm = build_data_manager(config)

    def build(budget):
        monkeypatch.setattr(cocoop_mod, "PROMPT_BUDGET", budget)
        set_random_seed(config.seed)
        trainer = build_trainer(config, dm)
        trainer.build_model()
        return trainer

    trainer_full = build(10_000)  # single tower call
    trainer_sub = build(2)  # k=4 > budget=2: chunk=1 image, 2 tower slices

    rng = np.random.default_rng(0)
    d = int(trainer_full.arch.embed_dim)
    feats = rng.normal(size=(8, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    feats = jnp.asarray(feats)
    logits_full = np.asarray(trainer_full._logits_fn(trainer_full.params, feats))
    logits_sub = np.asarray(trainer_sub._logits_fn(trainer_full.params, feats))
    np.testing.assert_allclose(logits_full, logits_sub, rtol=2e-4, atol=2e-4)

    labels = jnp.arange(8) % logits_full.shape[1]

    def make_loss(trainer):
        def loss(p):
            lg = trainer._logits_fn(p, feats)
            lp = jax.nn.log_softmax(lg)
            return -jnp.mean(lp[jnp.arange(8), labels])

        return loss

    g_full = jax.grad(make_loss(trainer_full))(trainer_full.params)
    g_sub = jax.grad(make_loss(trainer_sub))(trainer_full.params)
    for kf, vf in jax.tree_util.tree_leaves_with_path(g_full):
        vs = g_sub
        for part in kf:
            vs = vs[part.key] if hasattr(part, "key") else vs[part.idx]
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vs), rtol=5e-4, atol=5e-4,
            err_msg=str(kf),
        )


def test_final_model_best_val(tmp_path, capfd):
    """final_model=best_val: per-epoch val tracking writes model-best.npz and
    after_train deploys it (the reference defines this deploy path but never
    writes model-best — quirk fixed, documented in COMPONENTS.md)."""
    import os

    config = make_config(tmp_path, "CLIP-Adapter")
    config.final_model = "best_val"
    config.adapter.clip_adapter_epochs = 3
    _run(config)
    out = capfd.readouterr().out
    assert "New best val accuracy" in out
    assert "Deploy the model with the best val performance" in out
    assert os.path.exists(
        os.path.join(config.output_dir, "adapter", "model-best.npz")
    )


def _quiet_vs_eager_params(tmp_path, trainer_name, param_key,
                           **adapter_overrides):
    """Train twice — quiet-scan mode vs forced-eager mode — and return the
    trained parameter from each (the step has no in-step RNG beyond the
    explicit key stream; scanned vs unrolled XLA executables may reassociate
    floats, hence callers assert allclose, not bit-equal).

    Eagerness is forced via CLIP_GP_TPU_FORCE_EAGER_EPOCHS rather than
    enabling TensorBoard: on a host without tensorboardX the writer init
    silently no-ops and a TB-based 'eager' run would quietly take the scan
    path too, making the parity assertion vacuous."""
    cfg_scan = make_config(tmp_path / "scan", trainer_name, **adapter_overrides)
    cfg_scan.adapter.clip_adapter_epochs = 4
    cfg_scan.adapter.taskres_epochs = 4
    cfg_scan.optim.max_epoch = 4
    t_scan, _ = _run(cfg_scan)

    cfg_eager = make_config(tmp_path / "eager", trainer_name,
                            **adapter_overrides)
    cfg_eager.adapter.clip_adapter_epochs = 4
    cfg_eager.adapter.taskres_epochs = 4
    cfg_eager.optim.max_epoch = 4
    os.environ["CLIP_GP_TPU_FORCE_EAGER_EPOCHS"] = "1"
    try:
        t_eager, _ = _run(cfg_eager)
    finally:
        del os.environ["CLIP_GP_TPU_FORCE_EAGER_EPOCHS"]

    return (
        np.asarray(t_scan.params[param_key]),
        np.asarray(t_eager.params[param_key]),
    )


def test_clip_adapter_quiet_scan_matches_eager(tmp_path):
    got, want = _quiet_vs_eager_params(tmp_path, "CLIP-Adapter", "fc1")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_clip_adapter_gp_quiet_scan_matches_eager(tmp_path):
    """The GP classifier path trains through the no-renorm logits via its
    own scanned executable; parity must hold there too."""
    got, want = _quiet_vs_eager_params(
        tmp_path, "CLIP-Adapter", "fc1", use_gp=True, gp_pca_dim=8
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_taskres_quiet_scan_matches_eager(tmp_path):
    got, want = _quiet_vs_eager_params(tmp_path, "TaskRes", "residuals")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_taskres_gp_quiet_scan_matches_eager(tmp_path):
    """The GP path draws one MC key per batch; the quiet scan must consume
    the training key stream in the same order as the eager loop."""
    got, want = _quiet_vs_eager_params(
        tmp_path, "TaskRes", "residuals", use_gp=True, gp_pca_dim=8
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_cocoop_quiet_scan_matches_eager(tmp_path):
    got, want = _quiet_vs_eager_params(tmp_path, "Adapter-CoCoOp", "ctx")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_coop_quiet_scan_matches_eager(tmp_path):
    got, want = _quiet_vs_eager_params(tmp_path, "Adapter-CoOp", "ctx")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_coop_tensorboard_forces_eager(tmp_path):
    """A live TensorBoard writer needs per-batch scalars, so it must force
    the eager loop — and the writer must actually initialize (if
    tensorboardX were missing, init silently no-ops and the run would take
    the scan path, which this test exists to catch)."""
    cfg = make_config(tmp_path, "Adapter-CoOp")
    cfg.adapter.clip_adapter_epochs = 2
    cfg.optim.max_epoch = 2
    cfg.train.enable_tensorboard = True
    _run(cfg)
    # the writer is closed (and nulled) in after_train, so assert on its
    # side effect: per-batch train/loss scalars in the event files
    tb_dir = os.path.join(cfg.output_dir, "tensorboard")
    events = [f for f in os.listdir(tb_dir) if "events" in f]
    assert events, "tensorboardX writer never initialized (no event files)"
    assert any(
        os.path.getsize(os.path.join(tb_dir, f)) > 0 for f in events
    )
