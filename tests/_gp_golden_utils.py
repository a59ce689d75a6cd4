"""Shared utilities for executed-reference GP goldens.

Bridges a reference ``GaussianProcessTemplateWeighter`` instance (running on
tests/_gpytorch_shim.py) and our svgp pytree: perturbs every learnable tensor
to a generic parameter point, then injects the reference's exact tensors
(including its torch-SVD PCA, whose column signs differ from our numpy SVD)
into an equivalent (static, params, buffers) triple.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import torch

from clip_gp_tpu.gp import svgp
from clip_gp_tpu.ops.sparsemax import sparsemax as our_sparsemax


def gp_cfg(kernel: str, pca_dim: int, prior_temp: float = 1.0):
    return SimpleNamespace(
        adapter=SimpleNamespace(
            gp_pca_dim=pca_dim,
            gp_kernel_type=kernel,
            gp_prior_temp=prior_temp,
            gp_jitter=1e-4,  # gpytorch float32 variational_cholesky_jitter
        )
    )


def perturb_and_inject(ref, kernel, E, cfg, seed=11):
    """Lazy-init the reference GP, perturb every LEARNABLE tensor, and build
    an equivalent (static, params, buffers) for our side.

    The first M inducing rows stay untouched (the reference freezes them via
    the gradient hook + zero weight decay, so they never move in training
    either); everything else gets seeded noise so comparisons run at a
    generic point of parameter space, not the init.
    """
    m = ref.num_templates
    # first call triggers gpytorch's lazy variational init (mean += 1e-3·eps)
    torch.manual_seed(100 + seed)
    ref(ref._templates_red)

    g = torch.Generator().manual_seed(seed)

    def noise(t, scale=0.1):
        return scale * torch.randn(t.shape, generator=g, dtype=t.dtype)

    vd = ref.variational_strategy._variational_distribution
    with torch.no_grad():
        vd.variational_mean.add_(noise(vd.variational_mean, 0.3))
        vd.chol_variational_covar.add_(noise(vd.chol_variational_covar))
        ref.variational_strategy.inducing_points[:, m:, :].add_(
            noise(ref.variational_strategy.inducing_points[:, m:, :])
        )
        ref.mean_module.cls_bias.add_(noise(ref.mean_module.cls_bias, 0.2))
        ref.mean_module.tmp_bias.add_(noise(ref.mean_module.tmp_bias, 0.2))
        if kernel == "rbf":
            ref.covar_module.base_kernel.raw_lengthscale.add_(
                noise(ref.covar_module.base_kernel.raw_lengthscale)
            )
            ref.covar_module.raw_outputscale.add_(
                noise(ref.covar_module.raw_outputscale, 0.2)
            )
        elif kernel == "matern":
            ref.covar_module.raw_lengthscale.add_(
                noise(ref.covar_module.raw_lengthscale)
            )
        else:
            ref.covar_module.raw_variance.add_(
                noise(ref.covar_module.raw_variance, 0.2)
            )

    static, params, buffers = svgp.create_gp(jnp.asarray(np.asarray(E)), cfg)

    def a(t):
        return jnp.asarray(t.detach().numpy())

    # the reference's PCA (torch SVD) replaces ours (numpy SVD): same
    # subspace, column signs may differ
    buffers = {
        **buffers,
        "templates": a(ref._templates),
        "templates_red": a(ref._templates_red),
        "pca_mean": a(ref._pca_mean),
        "pca_W": a(ref._pca_W),
        "f0": a(ref.mean_module.f0),
    }
    params = {
        **params,
        "inducing_token": a(ref.variational_strategy.inducing_points[:, m:, :]),
        "variational_mean": a(vd.variational_mean),
        "chol_variational_covar": a(vd.chol_variational_covar),
        "cls_bias": a(ref.mean_module.cls_bias),
        "tmp_bias": a(ref.mean_module.tmp_bias),
    }
    if kernel == "rbf":
        params["raw_lengthscale"] = a(
            ref.covar_module.base_kernel.raw_lengthscale
        )
        params["raw_outputscale"] = a(ref.covar_module.raw_outputscale)
    elif kernel == "matern":
        params["raw_lengthscale"] = a(ref.covar_module.raw_lengthscale)
    else:
        params["raw_variance"] = a(ref.covar_module.raw_variance[:, 0])
    return static, params, buffers


def latent_with_eps(static, params, buffers, x, eps):
    """q(f) samples with the RNG draw replaced by recorded base noise
    (differentiable wrt params — eps is a constant, exactly like the torch
    reparameterization)."""
    mean, cov = svgp.gp_predictive(static, params, buffers, x)
    l_f = svgp.safe_cholesky(cov, static.sample_jitter)
    f = mean[None] + jnp.einsum("knm,skm->skn", l_f, jnp.asarray(eps))
    return f[..., : static.num_templates]


def prototypes_with_eps(static, params, buffers, x, eps):
    """Replay the reference's base-normal draws through our math."""
    f = latent_with_eps(static, params, buffers, x, eps)
    w = our_sparsemax(f)
    return jnp.einsum("skm,kmd->skd", w, buffers["templates"]), w
