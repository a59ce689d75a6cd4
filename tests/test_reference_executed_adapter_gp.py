"""Executed-reference goldens for the Adapter trainer's GP mode.

The non-GP Adapter paths are pinned by test_reference_executed_adapter.py;
the GP branches were previously unexecutable (no gpytorch). With the
functional shim (tests/_gpytorch_shim.py) the reference's REAL
``CustomCLIP(use_gp=True)`` + ``Trainer.compute_loss`` GP branch runs here:
MC-averaged CE over sampled prototypes + β·KL + (λ/shots)·‖W−I‖²
(ref: trainers/adapter.py:387-535), plus the MC-mean eval logits of
``forward_features`` (ref:230-252, logits averaged over samples — unlike
the loss, which averages CEs).

Sampling noise is replayed exactly: the shim records the standard-normal
base draws of each ``rsample`` and our side consumes them as constants
(the same reparameterization-trick structure torch differentiates through,
so gradients are comparable too).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clip_gp_tpu.gp import svgp  # noqa: E402
from clip_gp_tpu.methods import common  # noqa: E402

from _gp_golden_utils import (
    gp_cfg,
    latent_with_eps,
    perturb_and_inject,
    prototypes_with_eps,
)
from _reference_harness import build_tiny_torch_clip, reference_env

CLASSNAMES = ["tabby cat", "forest", "airplane", "violin"]
K, M, D = 4, 2, 32
PCA = 6
BETA, L2_LAMBDA, SHOTS = 0.3, 0.1, 4


@pytest.fixture(scope="module")
def ref_env():
    with reference_env(
        trainer_modules=("adapter", "taskres"), functional_gp=True
    ) as env:
        yield env


@pytest.fixture()
def gp_setup(ref_env):
    """Reference CustomCLIP(use_gp=True) + our injected-equivalent state."""
    cfg_ref = ref_env.config.Config()
    cfg_ref.adapter.use_gp = True
    cfg_ref.adapter.num_templates = M
    cfg_ref.adapter.gp_pca_dim = PCA
    cfg_ref.adapter.gp_kernel_type = "rbf"
    cfg_ref.adapter.gp_beta = BETA
    cfg_ref.adapter.l2_lambda = L2_LAMBDA
    cfg_ref.adapter.gp_num_mc_samples_train = 5
    cfg_ref.adapter.gp_num_mc_samples_eval = 6
    cfg_ref.dataset.num_shots = SHOTS

    model = build_tiny_torch_clip(ref_env)
    custom = ref_env.adapter.CustomCLIP(cfg_ref, CLASSNAMES, model)
    assert tuple(custom.text_embeddings.shape) == (K, M, D)

    rng = np.random.default_rng(31)
    w_vis = (np.eye(D) + 0.05 * rng.normal(size=(D, D))).astype(np.float32)
    with torch.no_grad():
        custom.visual_proj.weight.copy_(torch.tensor(w_vis))

    static, params, buffers = perturb_and_inject(
        custom.gp_weighter,
        "rbf",
        custom.text_embeddings.detach().numpy(),
        gp_cfg("rbf", PCA),
        seed=17,
    )
    return cfg_ref, custom, static, params, buffers, w_vis


def _mk_ref_trainer(ref_env, cfg_ref, custom):
    t = ref_env.adapter.Trainer.__new__(ref_env.adapter.Trainer)
    t.config = cfg_ref
    t.model = custom
    return t


def test_gp_compute_loss_components_and_grads(ref_env, gp_setup):
    """The flagship training loss, executed: MC-CE + β·KL + (λ/shots)·L2,
    its [DBG] decomposition, and the gradients of every trainable tensor."""
    import _gpytorch_shim

    cfg_ref, custom, static, params, buffers, w_vis = gp_setup
    rng = np.random.default_rng(32)
    n = 10
    feats = rng.normal(size=(n, D)).astype(np.float32)
    labels = rng.integers(0, K, n)
    scale = float(custom.logit_scale.detach().exp())

    ref_trainer = _mk_ref_trainer(ref_env, cfg_ref, custom)
    custom.train()
    torch.manual_seed(3)
    loss_ref = ref_trainer.compute_loss(
        torch.tensor(feats),
        torch.tensor(labels, dtype=torch.int64),
        num_samples=5,
    )
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (5, K, M)  # no visual context in the loss path
    loss_ref.backward()
    dbg = ref_trainer._dbg_loss_components

    labels_j = jnp.asarray(labels.astype(np.int32))

    def loss_ours(p, w):
        protos, _ = prototypes_with_eps(
            static, p, buffers, buffers["templates_red"], eps
        )
        f_norm = common.l2_normalize(jnp.asarray(feats) @ w.T)
        ce = common.mc_cross_entropy(f_norm, protos, labels_j, scale)
        kl = svgp.kl_divergence(p).sum() * BETA
        l2 = ((w - jnp.eye(D)) ** 2).sum() * (L2_LAMBDA / SHOTS)
        return ce + kl + l2, (ce, kl, l2)

    (ours, (ce, kl, l2)), grads = jax.value_and_grad(
        loss_ours, argnums=(0, 1), has_aux=True
    )(params, jnp.asarray(w_vis))

    np.testing.assert_allclose(float(ours), float(loss_ref.detach()), rtol=1e-5)
    # [DBG] decomposition: in GP mode the kl rebinding breaks the in-place
    # ce/total alias, so ce is the TRUE ce (unlike non-GP mode — quirk
    # pinned in test_reference_executed_adapter.py)
    np.testing.assert_allclose(float(ce), dbg["ce"], rtol=1e-5)
    np.testing.assert_allclose(float(kl), dbg["kl"], rtol=1e-5)
    np.testing.assert_allclose(float(l2), dbg["l2_reg"], rtol=1e-5)
    np.testing.assert_allclose(
        dbg["total"], dbg["ce"] + dbg["kl"] + dbg["l2_reg"], rtol=1e-6
    )

    gp_grads, w_grad = grads
    np.testing.assert_allclose(
        np.asarray(w_grad),
        custom.visual_proj.weight.grad.numpy(),
        rtol=1e-3,
        atol=1e-5,
    )
    gp = custom.gp_weighter
    vd = gp.variational_strategy._variational_distribution
    pairs = [
        (gp_grads["variational_mean"], vd.variational_mean.grad),
        (gp_grads["chol_variational_covar"], vd.chol_variational_covar.grad),
        (gp_grads["cls_bias"], gp.mean_module.cls_bias.grad),
        (gp_grads["tmp_bias"], gp.mean_module.tmp_bias.grad),
        (
            gp_grads["raw_lengthscale"],
            gp.covar_module.base_kernel.raw_lengthscale.grad,
        ),
        (gp_grads["raw_outputscale"], gp.covar_module.raw_outputscale.grad),
    ]
    for ours_g, ref_g in pairs:
        np.testing.assert_allclose(
            np.asarray(ours_g), ref_g.numpy(), rtol=1e-3, atol=1e-5
        )
    ind_grad = gp.variational_strategy.inducing_points.grad.numpy()
    np.testing.assert_allclose(ind_grad[:, :M, :], 0.0, atol=0)  # freeze hook
    np.testing.assert_allclose(
        np.asarray(gp_grads["inducing_token"]),
        ind_grad[:, M:, :],
        rtol=1e-3,
        atol=1e-5,
    )


def test_gp_eval_logits_average_over_samples(ref_env, gp_setup):
    """forward_features in eval: per-sample normalized-prototype logits are
    averaged over S (ref:246-252) — our cosine_logits averages normalized
    prototypes first, which is linear-algebraically identical."""
    import _gpytorch_shim

    cfg_ref, custom, static, params, buffers, w_vis = gp_setup
    rng = np.random.default_rng(33)
    n = 9  # != K ⇒ visual context ignored in sample_prototypes
    feats = rng.normal(size=(n, D)).astype(np.float32)
    scale = float(custom.logit_scale.detach().exp())

    custom.eval()
    torch.manual_seed(5)
    with torch.no_grad():
        logits_ref = custom.forward_features(torch.tensor(feats)).numpy()
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (6, K, M)  # gp_num_mc_samples_eval

    protos, _ = prototypes_with_eps(
        static, params, buffers, buffers["templates_red"], eps
    )
    ours = np.asarray(
        common.cosine_logits(jnp.asarray(feats) @ jnp.asarray(w_vis).T,
                             protos, scale)
    )
    np.testing.assert_allclose(ours, logits_ref, atol=2e-4)


def test_gp_eval_logits_visual_context_when_batch_equals_k(ref_env, gp_setup):
    """A batch of exactly K features activates the per-class visual-context
    input (ref: gp_template_weigher.py:198-203 via forward_features'
    visual_embeddings=projected): the GP is queried at M+1 inputs and only
    the first M latent outputs are kept."""
    import _gpytorch_shim

    cfg_ref, custom, static, params, buffers, w_vis = gp_setup
    rng = np.random.default_rng(34)
    feats = rng.normal(size=(K, D)).astype(np.float32)
    scale = float(custom.logit_scale.detach().exp())

    custom.eval()
    torch.manual_seed(6)
    with torch.no_grad():
        logits_ref = custom.forward_features(torch.tensor(feats)).numpy()
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (6, K, M + 1)  # context appended

    projected = jnp.asarray(feats) @ jnp.asarray(w_vis).T
    x = jnp.concatenate(
        [
            buffers["templates_red"],
            svgp.pca_project(buffers, projected)[:, None, :],
        ],
        axis=1,
    )
    f = latent_with_eps(static, params, buffers, x, eps)
    from clip_gp_tpu.ops.sparsemax import sparsemax

    w = sparsemax(f)
    protos = jnp.einsum("skm,kmd->skd", w, buffers["templates"])
    ours = np.asarray(common.cosine_logits(projected, protos, scale))
    np.testing.assert_allclose(ours, logits_ref, atol=2e-4)


def test_gp_loss_single_sample_falls_back_to_forward(ref_env, gp_setup):
    """num_samples == 1 takes the forward_features branch of compute_loss
    (ref:401,444-453): CE of MC-mean logits with S=gp_num_mc_samples_train,
    NOT a 1-sample MC-CE."""
    import _gpytorch_shim

    cfg_ref, custom, static, params, buffers, w_vis = gp_setup
    rng = np.random.default_rng(35)
    n = 8
    feats = rng.normal(size=(n, D)).astype(np.float32)
    labels = rng.integers(0, K, n)
    scale = float(custom.logit_scale.detach().exp())

    ref_trainer = _mk_ref_trainer(ref_env, cfg_ref, custom)
    custom.train()  # training=True ⇒ forward_features uses S_train=5
    torch.manual_seed(8)
    loss_ref = ref_trainer.compute_loss(
        torch.tensor(feats),
        torch.tensor(labels, dtype=torch.int64),
        num_samples=1,
    )
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (5, K, M)

    protos, _ = prototypes_with_eps(
        static, params, buffers, buffers["templates_red"], eps
    )
    w = jnp.asarray(w_vis)
    logits = common.cosine_logits(jnp.asarray(feats) @ w.T, protos, scale)
    ce = common.cross_entropy(logits, jnp.asarray(labels.astype(np.int32)))
    kl = svgp.kl_divergence(params).sum() * BETA
    l2 = ((w - jnp.eye(D)) ** 2).sum() * (L2_LAMBDA / SHOTS)
    np.testing.assert_allclose(
        float(ce + kl + l2), float(loss_ref.detach()), rtol=1e-5
    )


# ---------------------------------------------------------------------------
# TaskRes with GP: residuals added to each MC prototype sample
# ---------------------------------------------------------------------------


class _IdentityEncoder(torch.nn.Module):
    """Stand-in image tower: forwards injected features unchanged so the
    reference's real ``forward`` runs on controlled inputs."""

    def forward(self, x):
        return x


def test_taskres_gp_forward_matched_noise(ref_env, tmp_path, monkeypatch):
    """TaskRes GP inference, executed (ref: trainers/taskres.py:101-116):
    per-sample NORMALIZED prototypes get the α-scaled residual added, are
    renormalized, and the logits are MC-averaged. Our trainer's real
    ``_gp_logits_raw`` must agree draw-for-draw."""
    import _gpytorch_shim

    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    alpha, s_eval = 0.7, 5

    config = Config()
    config.trainer_name = "TaskRes"
    config.dataset.name = "Synthetic"
    config.dataset.root = str(tmp_path / "data")
    config.dataset.num_shots = 4
    config.model.backbone_name = "TEST-ViT"
    config.input.size = (32, 32)
    config.dataloader.batch_size_train = 8
    config.dataloader.batch_size_test = 8
    config.dataloader.num_workers = 2
    config.adapter.num_templates = M
    config.adapter.taskres_residual_scale = alpha
    config.output_dir = str(tmp_path / "out")
    config.seed = 1
    set_random_seed(config.seed)
    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)
    trainer.build_model()
    classnames = list(dm.dataset.classnames)

    cfg_ref = ref_env.config.Config()
    cfg_ref.adapter.num_templates = M
    cfg_ref.adapter.use_gp = True
    cfg_ref.adapter.taskres_residual_scale = alpha
    cfg_ref.adapter.gp_pca_dim = PCA
    cfg_ref.adapter.gp_kernel_type = "rbf"
    cfg_ref.adapter.gp_num_mc_samples_eval = s_eval
    model = build_tiny_torch_clip(ref_env)
    custom = ref_env.taskres.CustomCLIP(cfg_ref, classnames, model)
    # the reference attaches the weighter during the train() pre-stage
    # (ref: taskres.py:237-238); attach the same class directly here
    rng = np.random.default_rng(41)
    e = rng.normal(size=(K, M, D)).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    torch.manual_seed(0)
    custom.gp_weighter = ref_env.taskres.GaussianProcessTemplateWeighter(
        torch.tensor(e), cfg_ref
    )
    static, params, buffers = perturb_and_inject(
        custom.gp_weighter, "rbf", e, gp_cfg("rbf", PCA), seed=23
    )

    residuals = rng.normal(scale=0.1, size=(K, D)).astype(np.float32)
    with torch.no_grad():
        custom.taskres_learner.text_feature_residuals.copy_(
            torch.tensor(residuals)
        )
    custom.image_encoder = _IdentityEncoder()
    custom.eval()

    feats = rng.normal(size=(7, D)).astype(np.float32)
    torch.manual_seed(11)
    with torch.no_grad():
        ref_logits = custom(torch.tensor(feats)).numpy()
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (s_eval, K, M)

    protos, _ = prototypes_with_eps(
        static, params, buffers, buffers["templates_red"], eps
    )
    ours = np.asarray(
        trainer._gp_logits_raw(
            {"residuals": jnp.asarray(residuals)}, jnp.asarray(feats), protos
        )
    )
    scale = max(np.abs(ref_logits).max(), 1e-12)
    np.testing.assert_allclose(ours / scale, ref_logits / scale, atol=1e-4)
