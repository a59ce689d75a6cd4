"""Functional gpytorch / entmax stand-ins for executed-reference GP goldens.

gpytorch and entmax are not installed in this environment, which previously
made the reference's GP template weighter
(/root/reference/trainers/gp_template_weigher.py) the only major component
whose code had never been EXECUTED against ours. This module implements the
exact library surface that file touches — nothing more — so the reference
class runs unmodified and its outputs can be compared to clip_gp_tpu/gp/svgp.py.

What this golden does and does not prove:

- It DOES execute all reference-owned math: the SVD-PCA + project/lift, the
  inducing-point construction, the median-heuristic lengthscale init, the
  f0 prior logits, ``ResidualMeanWithBias`` (incl. its tail-padding path),
  the template-freeze gradient hook, both ``sample_prototypes`` branches,
  the ``initialize_from_weights`` no-op quirk, and the rsample→sparsemax→
  einsum prototype flow.
- It does NOT re-prove gpytorch's internal numerics: the whitened-SVGP
  predictive/KL here is an independent torch restatement of the same
  textbook math (whitened ``VariationalStrategy`` semantics, documented in
  svgp.py's module docstring); that math is separately validated against an
  independent numpy implementation in tests/test_svgp.py.

gpytorch semantics deliberately reproduced:

- ``VariationalStrategy`` evaluates ``model.forward`` on
  ``cat([inducing_points, x])`` and slices the query block — which is what
  makes the reference's query-point prior mean the constant tail
  ``cls_bias + tmp_bias.mean()`` (f0 never reaches the predictive).
- jitter 1e-4 (float32 ``variational_cholesky_jitter``) added to BOTH the
  inducing Gram and the predictive covariance.
- the variational distribution initializes lazily on the first strategy
  call: mean ← prior mean + ``mean_init_std``·N(0,1) (gpytorch default
  1e-3), chol ← I.
- the whitening Cholesky + triangular solve run in float64 and the
  interpolation term is cast back to the input dtype — gpytorch's
  ``VariationalStrategy._cholesky_factor`` does
  ``psd_safe_cholesky(...type(_linalg_dtype_cholesky.value()))`` and
  ``forward`` does ``L.solve(induc_data_covar.type(...)).to(dtype)``,
  where ``settings._linalg_dtype_cholesky`` defaults to ``torch.float64``.
  ``CHOLESKY_SOLVE_DTYPE`` (module global) lets tests force float32 to
  MEASURE that fp64-vs-fp32 drift (tests/test_gp_fp64_drift.py records the
  bound; COMPONENTS.md states it).
- ``psd_safe_cholesky``: plain factorization first, then escalating jitter
  ``base·10^i``, i = 0..2 (``settings.cholesky_max_tries`` default 3),
  with the dtype-dependent base of ``settings.cholesky_jitter``:
  1e-6 for float32, 1e-8 for float64 — so the fp64 whitening factorization
  escalates from 1e-8, NOT 1e-6 (gpytorch/utils/cholesky.py
  ``_psd_safe_cholesky``).
"""

from __future__ import annotations

import types

import torch
import torch.nn.functional as F
from torch import nn

_VARIATIONAL_JITTER = 1e-4  # gpytorch variational_cholesky_jitter, float32

# gpytorch settings._linalg_dtype_cholesky default (torch.float64): the
# whitening factorization + triangular solve run in this dtype and the
# interpolation term is cast back. Tests flip this to torch.float32 to
# measure the drift the fp64 path removes.
CHOLESKY_SOLVE_DTYPE = torch.float64


def _inv_softplus(y: torch.Tensor) -> torch.Tensor:
    y = torch.as_tensor(y, dtype=torch.float32)
    return torch.where(y > 20, y, torch.log(torch.expm1(y.clamp_min(1e-10))))


# gpytorch settings.cholesky_jitter.value(dtype): float32 → 1e-6,
# float64 → 1e-8 (gpytorch/settings.py). The escalation below multiplies by
# 10^i for i in range(cholesky_max_tries=3), matching
# gpytorch/utils/cholesky.py::_psd_safe_cholesky.
_CHOLESKY_JITTER_BASE = {torch.float32: 1e-6, torch.float64: 1e-8}


def psd_safe_cholesky(a: torch.Tensor) -> torch.Tensor:
    try:
        l = torch.linalg.cholesky(a)
        if torch.isfinite(l).all():
            return l
    except RuntimeError:
        pass
    eye = torch.eye(a.shape[-1], dtype=a.dtype, device=a.device)
    base = _CHOLESKY_JITTER_BASE.get(a.dtype, 1e-6)
    for i in range(3):
        jitter = base * (10.0**i)
        try:
            l = torch.linalg.cholesky(a + jitter * eye)
            if torch.isfinite(l).all():
                return l
        except RuntimeError:
            continue
    raise RuntimeError("cholesky failed even with escalated jitter")


def sparsemax(x: torch.Tensor, dim: int = -1) -> torch.Tensor:
    """Euclidean projection of each slice onto the probability simplex."""
    x = x.movedim(dim, -1)
    srt, _ = torch.sort(x, dim=-1, descending=True)
    cumsum = srt.cumsum(-1) - 1.0
    rho = torch.arange(1, x.shape[-1] + 1, dtype=x.dtype, device=x.device)
    support = srt - cumsum / rho > 0
    k = support.sum(-1, keepdim=True).clamp_min(1)
    tau = cumsum.gather(-1, k - 1) / k.to(x.dtype)
    return torch.clamp(x - tau, min=0.0).movedim(-1, dim)


class MultivariateNormal:
    """Batched N(mean [K,N], cov [K,N,N]) with reparameterized sampling.

    ``last_base_samples`` (class attribute) records the standard-normal
    draws of the most recent ``rsample`` so tests can replay the identical
    noise through the JAX path.
    """

    last_base_samples: torch.Tensor | None = None

    def __init__(self, mean: torch.Tensor, covariance_matrix: torch.Tensor):
        self.mean = mean
        self.covariance_matrix = covariance_matrix

    @property
    def variance(self) -> torch.Tensor:
        return self.covariance_matrix.diagonal(dim1=-2, dim2=-1)

    def rsample(
        self, sample_shape=torch.Size(), base_samples: torch.Tensor | None = None
    ) -> torch.Tensor:
        l = psd_safe_cholesky(self.covariance_matrix)
        shape = tuple(sample_shape) + self.mean.shape
        if base_samples is None:
            base_samples = torch.randn(
                shape, dtype=self.mean.dtype, device=self.mean.device
            )
        MultivariateNormal.last_base_samples = base_samples.detach().clone()
        return self.mean + torch.einsum("...nm,s...m->s...n", l, base_samples)


class Mean(nn.Module):
    pass


class _Kernel(nn.Module):
    def __call__(self, x1: torch.Tensor, x2: torch.Tensor | None = None):
        return self.forward(x1, x1 if x2 is None else x2)


def _scaled_dist(
    x1: torch.Tensor, x2: torch.Tensor, lengthscale: torch.Tensor
) -> torch.Tensor:
    a = x1 / lengthscale
    b = x2 / lengthscale
    d2 = (
        (a**2).sum(-1).unsqueeze(-1)
        + (b**2).sum(-1).unsqueeze(-2)
        - 2 * a @ b.transpose(-1, -2)
    )
    d2 = d2.clamp_min(0.0)
    if x1 is x2:
        # gpytorch zeroes the self-gram diagonal (covar_dist, x1_eq_x2);
        # _Kernel.__call__ passes the same object for single-input grams
        eye = torch.eye(d2.shape[-1], dtype=d2.dtype, device=d2.device)
        d2 = d2 * (1.0 - eye)
    return d2


class RBFKernel(_Kernel):
    def __init__(self, batch_shape=torch.Size(), ard_num_dims: int | None = None):
        super().__init__()
        d = 1 if ard_num_dims is None else ard_num_dims
        self.raw_lengthscale = nn.Parameter(torch.zeros(*batch_shape, 1, d))

    @property
    def lengthscale(self) -> torch.Tensor:
        return F.softplus(self.raw_lengthscale)

    def initialize(self, lengthscale=None):
        if lengthscale is not None:
            with torch.no_grad():
                self.raw_lengthscale.copy_(
                    _inv_softplus(torch.as_tensor(float(lengthscale)))
                )
        return self

    def forward(self, x1, x2):
        return torch.exp(-0.5 * _scaled_dist(x1, x2, self.lengthscale))


class MaternKernel(_Kernel):
    def __init__(
        self, nu: float = 2.5, batch_shape=torch.Size(), ard_num_dims=None
    ):
        super().__init__()
        assert nu == 0.5, "shim implements the exponential kernel only"
        d = 1 if ard_num_dims is None else ard_num_dims
        self.raw_lengthscale = nn.Parameter(torch.zeros(*batch_shape, 1, d))

    @property
    def lengthscale(self) -> torch.Tensor:
        return F.softplus(self.raw_lengthscale)

    def forward(self, x1, x2):
        d2 = _scaled_dist(x1, x2, self.lengthscale)
        return torch.exp(-torch.sqrt(d2 + 1e-20))


class LinearKernel(_Kernel):
    def __init__(self, batch_shape=torch.Size()):
        super().__init__()
        self.raw_variance = nn.Parameter(torch.zeros(*batch_shape, 1))

    @property
    def variance(self) -> torch.Tensor:
        return F.softplus(self.raw_variance)

    def forward(self, x1, x2):
        return self.variance.unsqueeze(-1) * (x1 @ x2.transpose(-1, -2))


class ScaleKernel(_Kernel):
    def __init__(self, base_kernel: _Kernel, batch_shape=torch.Size()):
        super().__init__()
        self.base_kernel = base_kernel
        self.raw_outputscale = nn.Parameter(torch.zeros(*batch_shape))

    @property
    def outputscale(self) -> torch.Tensor:
        return F.softplus(self.raw_outputscale)

    def forward(self, x1, x2):
        return self.outputscale.unsqueeze(-1).unsqueeze(-1) * self.base_kernel(
            x1, x2
        )


class CholeskyVariationalDistribution(nn.Module):
    def __init__(
        self,
        num_inducing_points: int,
        batch_shape=torch.Size(),
        mean_init_std: float = 1e-3,
    ):
        super().__init__()
        p = num_inducing_points
        self.mean_init_std = mean_init_std
        self.variational_mean = nn.Parameter(torch.zeros(*batch_shape, p))
        self.chol_variational_covar = nn.Parameter(
            torch.eye(p).expand(*batch_shape, p, p).contiguous()
        )

    def initialize_variational_distribution(self, prior: MultivariateNormal):
        with torch.no_grad():
            self.variational_mean.copy_(prior.mean)
            self.variational_mean.add_(
                torch.randn_like(prior.mean), alpha=self.mean_init_std
            )
            self.chol_variational_covar.copy_(
                psd_safe_cholesky(prior.covariance_matrix)
            )


class VariationalStrategy(nn.Module):
    """Whitened variational strategy (gpytorch's default)."""

    def __init__(
        self,
        model,
        inducing_points: torch.Tensor,
        variational_distribution: CholeskyVariationalDistribution,
        learn_inducing_locations: bool = True,
    ):
        super().__init__()
        # not a registered submodule: the model owns the strategy, not the
        # other way round (mirrors gpytorch's object.__setattr__ dance)
        object.__setattr__(self, "model", model)
        self._variational_distribution = variational_distribution
        pts = inducing_points.detach().clone()
        if learn_inducing_locations:
            self.inducing_points = nn.Parameter(pts)
        else:
            self.register_buffer("inducing_points", pts)
        self.register_buffer(
            "variational_params_initialized", torch.tensor(False)
        )
        self.jitter_val = _VARIATIONAL_JITTER

    @property
    def prior_distribution(self) -> MultivariateNormal:
        m = self._variational_distribution.variational_mean
        return MultivariateNormal(
            torch.zeros_like(m),
            torch.eye(m.shape[-1], dtype=m.dtype, device=m.device).expand(
                *m.shape, m.shape[-1]
            ),
        )

    def kl_divergence(self) -> torch.Tensor:
        """KL(q(u) ‖ N(0, I)) per batch element (whitened prior)."""
        m = self._variational_distribution.variational_mean
        lq = torch.tril(self._variational_distribution.chol_variational_covar)
        p = m.shape[-1]
        trace = (lq**2).sum((-1, -2))
        quad = (m**2).sum(-1)
        logdet = 2.0 * torch.log(
            lq.diagonal(dim1=-2, dim2=-1).abs() + 1e-20
        ).sum(-1)
        return 0.5 * (trace + quad - p - logdet)

    def __call__(self, x: torch.Tensor) -> MultivariateNormal:
        if not bool(self.variational_params_initialized):
            self._variational_distribution.initialize_variational_distribution(
                self.prior_distribution
            )
            self.variational_params_initialized.fill_(True)

        z = self.inducing_points
        p = z.shape[-2]
        full_inputs = torch.cat([z.expand(*x.shape[:-2], p, z.shape[-1]), x], dim=-2)
        full = self.model.forward(full_inputs)
        full_mean, full_covar = full.mean, full.covariance_matrix

        test_mean = full_mean[..., p:]
        eye_p = torch.eye(p, dtype=x.dtype, device=x.device)
        k_zz = full_covar[..., :p, :p] + self.jitter_val * eye_p
        k_zx = full_covar[..., :p, p:]
        k_xx = full_covar[..., p:, p:]

        # gpytorch runs the whitening factorization + solve in
        # _linalg_dtype_cholesky (default float64) and casts the
        # interpolation term back: VariationalStrategy._cholesky_factor /
        # forward's `L.solve(induc_data_covar.type(...)).to(dtype)`.
        # NOTE the jitter above was added in the INPUT dtype first (gpytorch
        # adds jitter_val before _cholesky_factor casts), so fp32 rounding of
        # k_zz + 1e-4·I is part of the real semantics too.
        solve_dtype = CHOLESKY_SOLVE_DTYPE
        l = psd_safe_cholesky(k_zz.to(solve_dtype))
        interp = torch.linalg.solve_triangular(
            l, k_zx.to(solve_dtype), upper=False
        ).to(x.dtype)  # [K,P,N]

        m = self._variational_distribution.variational_mean
        lq = torch.tril(self._variational_distribution.chol_variational_covar)
        s = lq @ lq.transpose(-1, -2)

        mean = torch.einsum("...pn,...p->...n", interp, m) + test_mean
        n = x.shape[-2]
        eye_n = torch.eye(n, dtype=x.dtype, device=x.device)
        cov = (
            k_xx
            + self.jitter_val * eye_n
            + torch.einsum("...pn,...pq,...qm->...nm", interp, s - eye_p, interp)
        )
        return MultivariateNormal(mean, cov)


class ApproximateGP(nn.Module):
    def __init__(self, variational_strategy: VariationalStrategy):
        super().__init__()
        self.variational_strategy = variational_strategy

    def __call__(self, x: torch.Tensor, **kwargs) -> MultivariateNormal:
        return self.variational_strategy(x)


class GaussianLikelihood(nn.Module):
    def __init__(self, batch_shape=torch.Size()):
        super().__init__()
        self.raw_noise = nn.Parameter(torch.zeros(*batch_shape, 1))


def build_gpytorch_module() -> types.ModuleType:
    gpy = types.ModuleType("gpytorch")
    gpy.models = types.SimpleNamespace(ApproximateGP=ApproximateGP)
    gpy.means = types.SimpleNamespace(Mean=Mean)
    gpy.variational = types.SimpleNamespace(
        CholeskyVariationalDistribution=CholeskyVariationalDistribution,
        VariationalStrategy=VariationalStrategy,
    )
    gpy.kernels = types.SimpleNamespace(
        RBFKernel=RBFKernel,
        MaternKernel=MaternKernel,
        LinearKernel=LinearKernel,
        ScaleKernel=ScaleKernel,
    )
    gpy.likelihoods = types.SimpleNamespace(GaussianLikelihood=GaussianLikelihood)
    gpy.distributions = types.SimpleNamespace(
        MultivariateNormal=MultivariateNormal
    )
    gpy.settings = types.SimpleNamespace()
    return gpy


def build_entmax_module() -> types.ModuleType:
    entmax = types.ModuleType("entmax")
    entmax.sparsemax = sparsemax
    return entmax
