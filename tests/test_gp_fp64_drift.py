"""Measured fp64-vs-fp32 whitening-solve drift for the SVGP predictive.

Real gpytorch performs the whitening Cholesky + triangular solve in float64
and casts the interpolation term back to float32
(``VariationalStrategy._cholesky_factor`` with
``settings._linalg_dtype_cholesky`` = torch.float64); our JAX side
(clip_gp_tpu/gp/svgp.py) stays float32 throughout — fp64 on TPU is emulated
and slow, and the measured drift below shows fp32 is adequate. These tests
turn that documented divergence into a MEASURED bound:

- run the EXECUTED reference GP (on tests/_gpytorch_shim.py, which now does
  the fp64 solve exactly where gpytorch does) twice — fp64 solve vs fp32
  solve — at identical parameters, and record max |Δ| of predictive
  mean/cov/KL for all three kernels;
- repeat on deliberately ill-conditioned Grams (huge outputscale with both
  tiny and huge lengthscales — the latter drives K_zz toward rank one);
- assert our fp32 svgp predictive sits within the same neighborhood of the
  fp64-accurate shim.

Measured bounds are asserted here and stated in COMPONENTS.md (GP section).
Ref: /root/reference/trainers/gp_template_weigher.py:110-126 (the gpytorch
delegation whose numerics this quantifies).
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

import jax.numpy as jnp  # noqa: E402

from clip_gp_tpu.gp import svgp  # noqa: E402

from _gp_golden_utils import gp_cfg, perturb_and_inject  # noqa: E402
from _reference_harness import reference_env  # noqa: E402

K, M, D, PCA = 6, 4, 16, 8

KERNELS = ["rbf", "matern", "linear"]

# Measured on 2026-08-19 (torch CPU, this fixture): max |Δ| between the
# fp64-solve and fp32-solve shim predictive — rbf: mean 2.4e-7 / cov 1.2e-7;
# matern: 6.0e-8 / 4.5e-8; linear: 6.0e-8 / 6.0e-8; KL = 0 everywhere (it
# never touches the solve). Ill-conditioned RBF: (ls=1e-2, os=1e3) drift
# exactly 0 (diagonal-dominant Gram), ours-vs-fp64 ≤ 2.7e-4 relative;
# (ls=1e2, os=1e3, near-rank-one Gram) drift ≤ 8e-6 relative, ours ≤ 5e-6.
# Bounds below carry ~100× headroom over those measurements while still
# catching a real fp32 instability if one appears.
WELL_COND_BOUND = 2e-5
ILL_COND_REL_BOUND = 1e-2


@pytest.fixture(scope="module")
def ref_env():
    with reference_env(
        trainer_modules=("gp_template_weigher",), functional_gp=True
    ) as env:
        yield env


def _templates(seed=0):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(K, M, D)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def _build(ref_env, kernel, E):
    torch.manual_seed(0)
    return ref_env.gp_template_weigher.GaussianProcessTemplateWeighter(
        torch.tensor(E), gp_cfg(kernel, PCA)
    )


def _qf_at(ref, solve_dtype):
    """Predictive (mean, cov, kl) with the shim's solve forced to dtype."""
    import _gpytorch_shim

    prev = _gpytorch_shim.CHOLESKY_SOLVE_DTYPE
    _gpytorch_shim.CHOLESKY_SOLVE_DTYPE = solve_dtype
    try:
        qf = ref(ref._templates_red)
        kl = ref.variational_strategy.kl_divergence()
    finally:
        _gpytorch_shim.CHOLESKY_SOLVE_DTYPE = prev
    return (
        qf.mean.detach().numpy(),
        qf.covariance_matrix.detach().numpy(),
        kl.detach().numpy(),
    )


@pytest.mark.parametrize("kernel", KERNELS)
def test_fp64_vs_fp32_drift_bound(ref_env, kernel):
    E = _templates(1)
    ref = _build(ref_env, kernel, E)
    static, params, buffers = perturb_and_inject(
        ref, kernel, E, gp_cfg(kernel, PCA)
    )

    m64, c64, kl64 = _qf_at(ref, torch.float64)
    m32, c32, kl32 = _qf_at(ref, torch.float32)

    d_mean = float(np.abs(m64 - m32).max())
    d_cov = float(np.abs(c64 - c32).max())
    d_kl = float(np.abs(kl64 - kl32).max())
    print(
        f"[fp64-drift:{kernel}] mean={d_mean:.3e} cov={d_cov:.3e} kl={d_kl:.3e}"
    )
    assert d_mean <= WELL_COND_BOUND
    assert d_cov <= WELL_COND_BOUND
    assert d_kl == 0.0  # KL is a pure function of the variational params

    # our fp32 svgp must sit within the same neighborhood of the
    # fp64-accurate executed reference (matern self-gram sqrt wobble aside,
    # see test_reference_executed_gp.py)
    mean, cov = svgp.gp_predictive(
        static, params, buffers, buffers["templates_red"]
    )
    atol = 2e-3 if kernel == "matern" else 2e-5
    np.testing.assert_allclose(np.asarray(mean), m64, atol=atol)
    np.testing.assert_allclose(np.asarray(cov), c64, atol=atol)


@pytest.mark.parametrize(
    "lengthscale, outputscale",
    [
        (1e-2, 1e3),  # tiny lengthscale: Gram → outputscale·I, huge scale
        (1e2, 1e3),  # huge lengthscale: Gram → rank-one, genuinely ill
    ],
)
def test_fp64_drift_ill_conditioned(ref_env, lengthscale, outputscale):
    """Ill-conditioned RBF Grams: the regime where an fp32 solve could
    plausibly diverge from gpytorch's fp64 one. Drift is asserted relative
    to the output magnitude (cov scales with outputscale)."""
    import _gpytorch_shim

    E = _templates(2)
    ref = _build(ref_env, "rbf", E)
    static, params, buffers = perturb_and_inject(
        ref, "rbf", E, gp_cfg("rbf", PCA)
    )
    with torch.no_grad():
        ref.covar_module.base_kernel.raw_lengthscale.fill_(
            float(_gpytorch_shim._inv_softplus(torch.tensor(lengthscale)))
        )
        ref.covar_module.raw_outputscale.fill_(
            float(_gpytorch_shim._inv_softplus(torch.tensor(outputscale)))
        )

    m64, c64, _ = _qf_at(ref, torch.float64)
    m32, c32, _ = _qf_at(ref, torch.float32)

    scale = max(float(np.abs(c64).max()), 1.0)
    d_mean = float(np.abs(m64 - m32).max()) / max(
        float(np.abs(m64).max()), 1.0
    )
    d_cov = float(np.abs(c64 - c32).max()) / scale
    print(
        f"[fp64-drift:ill ls={lengthscale} os={outputscale}] "
        f"rel_mean={d_mean:.3e} rel_cov={d_cov:.3e}"
    )
    assert d_mean <= ILL_COND_REL_BOUND
    assert d_cov <= ILL_COND_REL_BOUND

    # our fp32 svgp at the same (injected) hyperparameters, vs the fp64 shim
    params = {
        **params,
        "raw_lengthscale": jnp.asarray(
            ref.covar_module.base_kernel.raw_lengthscale.detach().numpy()
        ),
        "raw_outputscale": jnp.asarray(
            ref.covar_module.raw_outputscale.detach().numpy()
        ),
    }
    mean, cov = svgp.gp_predictive(
        static, params, buffers, buffers["templates_red"]
    )
    rel_mean = float(np.abs(np.asarray(mean) - m64).max()) / max(
        float(np.abs(m64).max()), 1.0
    )
    rel_cov = float(np.abs(np.asarray(cov) - c64).max()) / scale
    print(
        f"[fp64-drift:ill ours] rel_mean={rel_mean:.3e} rel_cov={rel_cov:.3e}"
    )
    assert rel_mean <= ILL_COND_REL_BOUND
    assert rel_cov <= ILL_COND_REL_BOUND
