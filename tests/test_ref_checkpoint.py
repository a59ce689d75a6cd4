"""Reference ``model.pth.tar-*`` checkpoint ingestion goldens.

Saves checkpoints in the reference's exact format — the EXECUTED reference
modules' ``state_dict()`` wrapped like ``utils/trainer.py:347-374`` does —
then loads them through ``trainer.load_model`` (which falls back to
``runtime/ref_checkpoint.py`` when no ``.npz`` is present) and requires our
eval logits to match the reference module's own forward on shared features.
Both sides run the SAME tiny CLIP weights, so the only state in play is the
converted checkpoint.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from clip_gp_tpu.gp import svgp  # noqa: E402
from clip_gp_tpu.runtime.ref_checkpoint import (  # noqa: E402
    convert_reference_checkpoint,
    resolve_reference_checkpoint_path,
)

from _reference_harness import build_tiny_torch_clip, reference_env  # noqa: E402
from test_reference_executed_methods import (  # noqa: E402
    _build_our_trainer,
    _ref_config,
    _scaled_allclose,
    _IdentityEncoder,
)


@pytest.fixture(scope="module")
def ref_env():
    with reference_env(
        trainer_modules=(
            "adapter", "clip_adapter", "taskres",
            "adapter_coop", "adapter_cocoop",
        ),
        functional_gp=True,
    ) as env:
        yield env


@pytest.fixture(scope="module")
def tiny_clip(ref_env, tmp_path_factory):
    from clip_gp_tpu.models.clip_loader import (
        convert_torch_state_dict,
        save_params_npz,
    )

    model = build_tiny_torch_clip(ref_env)
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    arch, params = convert_torch_state_dict(sd)
    npz = tmp_path_factory.mktemp("weights") / "tiny_clip.npz"
    save_params_npz(str(npz), arch, params)
    return SimpleNamespace(model=model, arch=arch, params=params,
                           npz=str(npz))


def _save_ref_ckpt(run_dir: Path, module, epoch: int = 7) -> Path:
    """Write the reference's exact artifact (ref: utils/trainer.py:347-374)."""
    adapter_dir = run_dir / "adapter"
    adapter_dir.mkdir(parents=True, exist_ok=True)
    path = adapter_dir / f"model.pth.tar-{epoch}"
    torch.save(
        {
            "state_dict": module.state_dict(),
            "epoch": epoch,
            "optimizer": {"state": {}, "param_groups": []},
        },
        path,
    )
    return path


# ---------------------------------------------------------------------------
# discovery
# ---------------------------------------------------------------------------


def test_resolution_order(tmp_path):
    d = tmp_path / "adapter"
    d.mkdir()
    (d / "model.pth.tar-3").write_bytes(b"x")
    (d / "model.pth.tar-10").write_bytes(b"x")
    assert resolve_reference_checkpoint_path(tmp_path).name == "model.pth.tar-10"
    assert resolve_reference_checkpoint_path(tmp_path, 3).name == "model.pth.tar-3"
    assert resolve_reference_checkpoint_path(tmp_path, 4) is None
    (d / "model-best.pth.tar").write_bytes(b"x")
    assert resolve_reference_checkpoint_path(tmp_path).name == "model-best.pth.tar"


def test_tip_adapter_rejected(tmp_path):
    with pytest.raises(ValueError, match="never saves"):
        convert_reference_checkpoint(tmp_path / "x", "Tip-Adapter")
    with pytest.raises(ValueError, match="no reference-checkpoint converter"):
        convert_reference_checkpoint(tmp_path / "x", "NoSuchTrainer")


# ---------------------------------------------------------------------------
# Adapter (template-logits mode)
# ---------------------------------------------------------------------------


def test_adapter_logits_mode_roundtrip(ref_env, tiny_clip, tmp_path,
                                       monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter", tmp_path, tiny_clip.npz, train_template_weights=True
    )
    classnames = list(trainer.dm.dataset.classnames)

    cfg = _ref_config(ref_env, train_template_weights=True)
    custom = ref_env.adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()
    d = int(custom.text_embeddings.shape[-1])
    rng = np.random.default_rng(3)
    with torch.no_grad():
        custom.visual_proj.weight.copy_(
            torch.tensor(np.eye(d, dtype=np.float32)
                         + rng.normal(scale=0.05, size=(d, d)).astype(np.float32))
        )
        custom.template_weights.copy_(
            torch.tensor(rng.normal(size=custom.template_weights.shape)
                         .astype(np.float32))
        )

    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom, epoch=5)
    assert trainer.load_model(str(run_dir)) == 5

    feats = rng.normal(size=(9, d)).astype(np.float32)
    with torch.no_grad():
        ref_logits = custom.forward_features(torch.tensor(feats)).numpy()
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits, atol=1e-4)


def test_adapter_mode_mismatch_raises(ref_env, tiny_clip, tmp_path,
                                      monkeypatch):
    """A logits-mode checkpoint must not silently load into a uniform-mode
    config (the reference's own reload would crash on missing keys)."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter", tmp_path, tiny_clip.npz, train_template_weights=False
    )
    assert trainer.mode == "uniform"
    classnames = list(trainer.dm.dataset.classnames)
    cfg = _ref_config(ref_env, train_template_weights=True)
    custom = ref_env.adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom)
    with pytest.raises(ValueError, match="template-weight mode"):
        trainer.load_model(str(run_dir))


# ---------------------------------------------------------------------------
# Adapter (GP mode): variational state + buffers in the checkpoint's basis
# ---------------------------------------------------------------------------


def test_adapter_gp_roundtrip(ref_env, tiny_clip, tmp_path, monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter", tmp_path, tiny_clip.npz, use_gp=True, gp_pca_dim=6
    )
    classnames = list(trainer.dm.dataset.classnames)

    cfg = _ref_config(ref_env, use_gp=True, gp_pca_dim=6)
    torch.manual_seed(0)
    custom = ref_env.adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()
    weighter = custom.gp_weighter

    # lazy-init the variational distribution, then perturb every learnable
    torch.manual_seed(41)
    weighter(weighter._templates_red)
    g = torch.Generator().manual_seed(17)
    with torch.no_grad():
        vd = weighter.variational_strategy._variational_distribution
        vd.variational_mean.add_(
            0.3 * torch.randn(vd.variational_mean.shape, generator=g))
        vd.chol_variational_covar.add_(
            0.1 * torch.randn(vd.chol_variational_covar.shape, generator=g))
        m = weighter.num_templates
        pts = weighter.variational_strategy.inducing_points
        pts[:, m:, :].add_(0.1 * torch.randn(pts[:, m:, :].shape, generator=g))
        weighter.mean_module.cls_bias.add_(
            0.2 * torch.randn(weighter.mean_module.cls_bias.shape, generator=g))
        weighter.mean_module.tmp_bias.add_(
            0.2 * torch.randn(weighter.mean_module.tmp_bias.shape, generator=g))
        weighter.covar_module.base_kernel.raw_lengthscale.add_(
            0.1 * torch.randn(
                weighter.covar_module.base_kernel.raw_lengthscale.shape,
                generator=g))
        weighter.covar_module.raw_outputscale.add_(
            0.2 * torch.randn(weighter.covar_module.raw_outputscale.shape,
                              generator=g))
        d = int(custom.text_embeddings.shape[-1])
        custom.visual_proj.weight.copy_(
            torch.eye(d) + 0.05 * torch.randn((d, d), generator=g))

    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom, epoch=9)
    assert trainer.load_model(str(run_dir)) == 9

    # buffers adopted from the checkpoint (torch-SVD basis)
    np.testing.assert_allclose(
        np.asarray(trainer.gp_buffers["templates_red"]),
        weighter._templates_red.numpy(), atol=0,
    )
    # the reconstructed PCA map reproduces the checkpoint's projection
    proj = svgp.pca_project(
        trainer.gp_buffers, trainer.gp_buffers["templates"]
    )
    np.testing.assert_allclose(
        np.asarray(proj), weighter._templates_red.numpy(), atol=1e-5
    )

    # deterministic predictive + KL through the converted state
    qf = weighter(weighter._templates_red)
    mean, cov = svgp.gp_predictive(
        trainer.gp_static, trainer.params["gp"], trainer.gp_buffers,
        trainer.gp_buffers["templates_red"],
    )
    np.testing.assert_allclose(
        np.asarray(mean), qf.mean.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(cov), qf.covariance_matrix.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(svgp.kl_divergence(trainer.params["gp"])),
        weighter.variational_strategy.kl_divergence().detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )

    # visual_proj came through too
    np.testing.assert_allclose(
        np.asarray(trainer.params["visual_proj"]),
        custom.visual_proj.weight.detach().numpy(), atol=0,
    )


def test_adapter_gp_config_mismatch_raises(ref_env, tiny_clip, tmp_path,
                                           monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer("Adapter", tmp_path, tiny_clip.npz)  # no GP
    classnames = list(trainer.dm.dataset.classnames)
    cfg = _ref_config(ref_env, use_gp=True, gp_pca_dim=6)
    torch.manual_seed(0)
    custom = ref_env.adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom)
    with pytest.raises(ValueError, match="USE_GP"):
        trainer.load_model(str(run_dir))


def test_adapter_gp_kernel_mismatch_raises(ref_env, tiny_clip, tmp_path,
                                           monkeypatch):
    """An rbf-trained reference checkpoint under a matern config must be
    rejected: rbf's kernel params ({lengthscale, outputscale}) are a SUPERSET
    of matern's ({lengthscale}), so a missing-keys-only check passes and the
    rbf-fitted lengthscale silently evaluates under Matern-1/2 math."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter", tmp_path, tiny_clip.npz, use_gp=True, gp_pca_dim=6,
        gp_kernel_type="matern",
    )
    classnames = list(trainer.dm.dataset.classnames)
    cfg = _ref_config(ref_env, use_gp=True, gp_pca_dim=6,
                      gp_kernel_type="rbf")
    torch.manual_seed(0)
    custom = ref_env.adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()
    custom.gp_weighter(custom.gp_weighter._templates_red)  # lazy-init
    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom)
    with pytest.raises(ValueError, match="kernel"):
        trainer.load_model(str(run_dir))


# ---------------------------------------------------------------------------
# CLIP-Adapter / TaskRes / CoOp / CoCoOp
# ---------------------------------------------------------------------------


def test_clip_adapter_roundtrip(ref_env, tiny_clip, tmp_path, monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    ratio, reduction = 0.3, 2
    trainer = _build_our_trainer(
        "CLIP-Adapter", tmp_path, tiny_clip.npz,
        clip_adapter_ratio=ratio, clip_adapter_reduction=reduction,
    )
    classnames = list(trainer.dm.dataset.classnames)
    cfg = _ref_config(ref_env, clip_adapter_ratio=ratio,
                      clip_adapter_reduction=reduction)
    custom = ref_env.clip_adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()

    d = int(custom.text_embeddings.shape[-1])
    hidden = d // reduction
    rng = np.random.default_rng(7)
    with torch.no_grad():
        custom.adapter.fc1.weight.copy_(torch.tensor(
            rng.normal(scale=0.2, size=(hidden, d)).astype(np.float32)))
        custom.adapter.fc2.weight.copy_(torch.tensor(
            rng.normal(scale=0.2, size=(d, hidden)).astype(np.float32)))
        # simulate the GP pre-stage's in-place classifier overwrite
        # (ref: clip_adapter.py:286-290) — the converter must carry it
        custom.clip_weights.copy_(torch.tensor(
            rng.normal(size=custom.clip_weights.shape).astype(np.float32)))

    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom, epoch=3)
    assert trainer.load_model(str(run_dir)) == 3

    feats = rng.normal(size=(9, d)).astype(np.float32)
    with torch.no_grad():
        ref_logits = custom.logits_from_features(
            torch.tensor(feats), training=False).numpy()
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits, atol=1e-4)


def test_taskres_roundtrip(ref_env, tiny_clip, tmp_path, monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    alpha = 0.7
    trainer = _build_our_trainer(
        "TaskRes", tmp_path, tiny_clip.npz, taskres_residual_scale=alpha
    )
    classnames = list(trainer.dm.dataset.classnames)
    cfg = _ref_config(ref_env, taskres_residual_scale=alpha)
    custom = ref_env.taskres.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()

    k, d = custom.taskres_learner.base_text_features.shape
    rng = np.random.default_rng(8)
    with torch.no_grad():
        custom.taskres_learner.text_feature_residuals.copy_(torch.tensor(
            rng.normal(scale=0.1, size=(k, d)).astype(np.float32)))

    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom, epoch=4)
    assert trainer.load_model(str(run_dir)) == 4

    custom.image_encoder = _IdentityEncoder()
    feats = rng.normal(size=(8, d)).astype(np.float32)
    with torch.no_grad():
        ref_logits = custom(torch.tensor(feats)).numpy()
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits, atol=1e-4)


def test_coop_roundtrip(ref_env, tiny_clip, tmp_path, monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter-CoOp", tmp_path, tiny_clip.npz, n_ctx=4
    )
    classnames = list(trainer.dm.dataset.classnames)
    cfg = _ref_config(ref_env, n_ctx=4)
    torch.manual_seed(2)
    custom = ref_env.adapter_coop.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()

    rng = np.random.default_rng(9)
    with torch.no_grad():
        custom.prompt_learner.ctx.copy_(torch.tensor(
            rng.normal(scale=0.1, size=custom.prompt_learner.ctx.shape)
            .astype(np.float32)))

    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom, epoch=6)
    assert trainer.load_model(str(run_dir)) == 6

    d = int(tiny_clip.model.visual.output_dim)
    feats = rng.normal(size=(5, d)).astype(np.float32)
    custom.image_encoder = _IdentityEncoder()
    with torch.no_grad():
        ref_logits = custom(torch.tensor(feats)).numpy()
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits, atol=2e-4)


def test_cocoop_roundtrip(ref_env, tiny_clip, tmp_path, monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter-CoCoOp", tmp_path, tiny_clip.npz, n_ctx=4
    )
    classnames = list(trainer.dm.dataset.classnames)
    cfg = _ref_config(ref_env, n_ctx=4)
    torch.manual_seed(2)
    custom = ref_env.adapter_cocoop.CustomCLIP(
        cfg, classnames, tiny_clip.model
    )
    custom.eval()

    rng = np.random.default_rng(10)
    pl = custom.prompt_learner
    with torch.no_grad():
        pl.ctx.copy_(torch.tensor(
            rng.normal(scale=0.1, size=pl.ctx.shape).astype(np.float32)))
        for lin in (pl.meta_net[0], pl.meta_net[2]):
            lin.weight.copy_(torch.tensor(
                rng.normal(scale=0.1, size=lin.weight.shape)
                .astype(np.float32)))
            lin.bias.copy_(torch.tensor(
                rng.normal(scale=0.05, size=lin.bias.shape)
                .astype(np.float32)))

    run_dir = tmp_path / "ref_run"
    _save_ref_ckpt(run_dir, custom, epoch=2)
    assert trainer.load_model(str(run_dir)) == 2

    d = int(tiny_clip.model.visual.output_dim)
    feats = rng.normal(size=(4, d)).astype(np.float32)
    custom.image_encoder = _IdentityEncoder()
    with torch.no_grad():
        ref_logits = custom(torch.tensor(feats)).numpy()
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits, atol=2e-4)
