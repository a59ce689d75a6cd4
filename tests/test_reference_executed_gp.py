"""Executed-reference goldens for the GP template weighter.

Runs the reference's ``trainers/gp_template_weigher.py`` — previously
impossible here because gpytorch/entmax are not installed — on top of the
functional shim in tests/_gpytorch_shim.py, and requires agreement with
clip_gp_tpu/gp/svgp.py. All reference-owned math executes unmodified:
SVD-PCA, inducing-point construction, median-heuristic lengthscale, f0
prior logits, ResidualMeanWithBias (incl. the tail-padding the strategy
slices into the query mean), the template-freeze gradient hook, both
``sample_prototypes`` branches, and the rsample→sparsemax→einsum flow.

PCA sign convention differs between torch and numpy SVD, so cross-impl
comparisons either use sign-invariant quantities (Grams, f0, lengthscale)
or inject the reference's PCA/templates into our buffers first
(ref: trainers/gp_template_weigher.py:26-51).
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
from clip_gp_tpu.ops.sparsemax import sparsemax as our_sparsemax  # noqa: E402

from _gp_golden_utils import gp_cfg, perturb_and_inject, prototypes_with_eps
from _reference_harness import reference_env

K, M, D, PCA = 6, 4, 16, 8
P = M + 1  # inducing count


@pytest.fixture(scope="module")
def ref_env():
    with reference_env(
        trainer_modules=("gp_template_weigher",), functional_gp=True
    ) as env:
        yield env


def _gp_cfg(kernel):
    return gp_cfg(kernel, PCA)


def _templates(seed=0):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(K, M, D)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def _build_ref(ref_env, kernel, E):
    torch.manual_seed(0)
    return ref_env.gp_template_weigher.GaussianProcessTemplateWeighter(
        torch.tensor(E), _gp_cfg(kernel)
    )


def _perturb_and_inject(ref, kernel, E, seed=11):
    return perturb_and_inject(ref, kernel, E, _gp_cfg(kernel), seed)


KERNELS = ["rbf", "matern", "linear"]


# ---------------------------------------------------------------------------
# constructor parity (sign-invariant quantities)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kernel", KERNELS)
def test_constructor_parity(ref_env, kernel):
    E = _templates()
    ref = _build_ref(ref_env, kernel, E)
    static, params, buffers = svgp.create_gp(jnp.asarray(E), _gp_cfg(kernel))

    # f0 prior logits (PCA-independent)
    np.testing.assert_allclose(
        np.asarray(buffers["f0"]), ref.mean_module.f0.numpy(), atol=1e-5
    )
    # PCA subspaces agree up to per-column sign
    overlap = np.abs(np.asarray(buffers["pca_W"]).T @ ref._pca_W.numpy())
    np.testing.assert_allclose(overlap, np.eye(PCA), atol=1e-4)
    # inducing Gram K_zz is PCA-sign-invariant and must match at init
    z_ref = ref.variational_strategy.inducing_points.detach()
    ref_gram = ref.covar_module(z_ref).detach().numpy()
    z_ours = svgp.inducing_points(params, buffers)
    our_gram = np.asarray(svgp._kernel(static, params, z_ours, z_ours))
    np.testing.assert_allclose(our_gram, ref_gram, atol=2e-5)
    if kernel == "rbf":
        np.testing.assert_allclose(
            np.asarray(jax.nn.softplus(params["raw_lengthscale"])),
            ref.covar_module.base_kernel.lengthscale.detach().numpy(),
            rtol=1e-5,
        )


# ---------------------------------------------------------------------------
# whitened predictive + KL at a perturbed parameter point
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kernel", KERNELS)
def test_predictive_and_kl_parity(ref_env, kernel):
    E = _templates(1)
    ref = _build_ref(ref_env, kernel, E)
    static, params, buffers = _perturb_and_inject(ref, kernel, E)

    qf = ref(ref._templates_red)
    mean, cov = svgp.gp_predictive(
        static, params, buffers, buffers["templates_red"]
    )
    # Matérn K_zx has coincident (inducing_i, template_i) pairs whose true
    # distance is 0; the float32 expansion-form d² noise (~1e-6) is
    # sqrt-amplified to ~1e-3 in exp(-d) independently on each side (real
    # gpytorch wobbles identically). RBF/linear are smooth at d=0.
    atol = 2e-3 if kernel == "matern" else 2e-5
    np.testing.assert_allclose(
        np.asarray(mean), qf.mean.detach().numpy(), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(cov), qf.covariance_matrix.detach().numpy(), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(svgp.kl_divergence(params)),
        ref.variational_strategy.kl_divergence().detach().numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# sample_prototypes: identical noise ⇒ identical prototypes
# ---------------------------------------------------------------------------


_our_prototypes_with_eps = prototypes_with_eps


@pytest.mark.parametrize("kernel", KERNELS)
def test_sample_prototypes_matched_noise(ref_env, kernel):
    import _gpytorch_shim

    E = _templates(2)
    ref = _build_ref(ref_env, kernel, E)
    static, params, buffers = _perturb_and_inject(ref, kernel, E)

    torch.manual_seed(7)
    protos_ref = ref.sample_prototypes(num_samples=5)
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (5, K, M)

    protos, w = _our_prototypes_with_eps(
        static, params, buffers, buffers["templates_red"], eps
    )
    # matern: sqrt-at-zero-distance float32 wobble, see
    # test_predictive_and_kl_parity
    atol = 2e-3 if kernel == "matern" else 1e-4
    np.testing.assert_allclose(
        np.asarray(protos), protos_ref.detach().numpy(), atol=atol
    )
    # the reference stashes the sparsemax weights as .scores (ref:219)
    np.testing.assert_allclose(
        np.asarray(w), ref.scores.detach().numpy(), atol=atol
    )
    assert np.allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)


def test_sample_prototypes_visual_context_branch(ref_env):
    """B == K visual context appends one PCA-projected input per class and
    only the first M latent outputs are kept (ref:198-215)."""
    import _gpytorch_shim

    E = _templates(3)
    ref = _build_ref(ref_env, "rbf", E)
    static, params, buffers = _perturb_and_inject(ref, "rbf", E)

    rng = np.random.default_rng(8)
    vis = rng.normal(size=(K, D)).astype(np.float32)

    torch.manual_seed(9)
    protos_ref = ref.sample_prototypes(
        num_samples=3, visual_embeddings=torch.tensor(vis)
    )
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (3, K, M + 1)  # extended input

    x = jnp.concatenate(
        [
            buffers["templates_red"],
            svgp.pca_project(buffers, jnp.asarray(vis))[:, None, :],
        ],
        axis=1,
    )
    protos, _ = _our_prototypes_with_eps(static, params, buffers, x, eps)
    np.testing.assert_allclose(
        np.asarray(protos), protos_ref.detach().numpy(), atol=1e-4
    )


def test_sample_prototypes_batch_mismatch_ignores_context(ref_env):
    """B != K visual context hits the no-context branch (ref:204-210)."""
    import _gpytorch_shim

    E = _templates(4)
    ref = _build_ref(ref_env, "rbf", E)
    static, params, buffers = _perturb_and_inject(ref, "rbf", E)

    vis = torch.randn(K + 3, D)
    torch.manual_seed(13)
    protos_ref = ref.sample_prototypes(num_samples=4, visual_embeddings=vis)
    eps = _gpytorch_shim.MultivariateNormal.last_base_samples.numpy()
    assert eps.shape == (4, K, M)  # context ignored

    protos, _ = _our_prototypes_with_eps(
        static, params, buffers, buffers["templates_red"], eps
    )
    np.testing.assert_allclose(
        np.asarray(protos), protos_ref.detach().numpy(), atol=1e-4
    )


# ---------------------------------------------------------------------------
# initialize_from_weights: reference no-op quirk, executed
# ---------------------------------------------------------------------------


def test_initialize_from_weights_noop_quirk(ref_env):
    """Both reference branches silently fail (SURVEY §2.3.4): no mean_param
    attr, and the [K,M]→[K,M+1] copy raises and is swallowed. Ours actually
    warm-starts (documented divergence, svgp.initialize_from_weights)."""
    E = _templates(5)
    ref = _build_ref(ref_env, "rbf", E)
    vd = ref.variational_strategy._variational_distribution
    before = vd.variational_mean.detach().clone()

    w = torch.full((K, M), 1.0 / M)
    ref.initialize_from_weights(w)
    assert torch.equal(vd.variational_mean.detach(), before)

    static, params, buffers = svgp.create_gp(jnp.asarray(E), _gp_cfg("rbf"))
    params2 = svgp.initialize_from_weights(params, jnp.asarray(w.numpy()))
    np.testing.assert_allclose(
        np.asarray(params2["variational_mean"][:, :M]),
        np.log(np.full((K, M), 1.0 / M)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params2["variational_mean"][:, M:]), 0.0, atol=0
    )


# ---------------------------------------------------------------------------
# gradients: template-freeze hook executed + grad parity with jax
# ---------------------------------------------------------------------------


def test_gradient_parity_and_freeze_hook(ref_env):
    E = _templates(6)
    ref = _build_ref(ref_env, "rbf", E)
    static, params, buffers = _perturb_and_inject(ref, "rbf", E)

    qf = ref(ref._templates_red)
    loss_ref = (
        (qf.mean**2).sum()
        + qf.covariance_matrix.sum()
        + ref.variational_strategy.kl_divergence().sum()
    )
    loss_ref.backward()

    def loss_ours(p):
        mean, cov = svgp.gp_predictive(
            static, p, buffers, buffers["templates_red"]
        )
        return (mean**2).sum() + cov.sum() + svgp.kl_divergence(p).sum()

    grads = jax.grad(loss_ours)(params)

    vd = ref.variational_strategy._variational_distribution
    pairs = [
        (grads["variational_mean"], vd.variational_mean.grad),
        (grads["chol_variational_covar"], vd.chol_variational_covar.grad),
        (grads["cls_bias"], ref.mean_module.cls_bias.grad),
        (grads["tmp_bias"], ref.mean_module.tmp_bias.grad),
        (
            grads["raw_lengthscale"],
            ref.covar_module.base_kernel.raw_lengthscale.grad,
        ),
        (grads["raw_outputscale"], ref.covar_module.raw_outputscale.grad),
    ]
    for ours_g, ref_g in pairs:
        np.testing.assert_allclose(
            np.asarray(ours_g), ref_g.numpy(), rtol=1e-3, atol=2e-4
        )

    # the reference's gradient-mask hook (ref:72-79) zeroes the first M
    # inducing rows; the learnable tail matches our inducing_token grad
    ind_grad = ref.variational_strategy.inducing_points.grad.numpy()
    np.testing.assert_allclose(ind_grad[:, :M, :], 0.0, atol=0)
    np.testing.assert_allclose(
        np.asarray(grads["inducing_token"]),
        ind_grad[:, M:, :],
        rtol=1e-3,
        atol=2e-4,
    )


# ---------------------------------------------------------------------------
# sparsemax cross-implementation check (shim torch vs our jax custom-VJP)
# ---------------------------------------------------------------------------


def test_shim_sparsemax_matches_ours():
    import _gpytorch_shim

    rng = np.random.default_rng(14)
    x = rng.normal(scale=2.0, size=(5, K, M)).astype(np.float32)
    a = _gpytorch_shim.sparsemax(torch.tensor(x), dim=-1).numpy()
    b = np.asarray(our_sparsemax(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=1e-6)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-6)
