"""Sparsemax forward/backward correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_gp_tpu.ops.sparsemax import sparsemax


def _proj_simplex_np(v):
    """Closed-form simplex projection for a single vector (golden)."""
    u = np.sort(v)[::-1]
    css = np.cumsum(u)
    k = np.arange(1, len(v) + 1)
    cond = u + (1 - css) / k > 0
    rho = k[cond][-1]
    tau = (css[cond][-1] - 1) / rho
    return np.maximum(v - tau, 0)


def test_forward_matches_projection():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(50, 12)).astype(np.float32) * 2
    p = np.asarray(sparsemax(jnp.asarray(z)))
    for i in range(z.shape[0]):
        np.testing.assert_allclose(p[i], _proj_simplex_np(z[i]), atol=1e-5)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    assert (p >= 0).all()


def test_identity_on_simplex_interior():
    z = jnp.array([[0.2, 0.3, 0.5]])
    np.testing.assert_allclose(np.asarray(sparsemax(z)), np.asarray(z), atol=1e-6)


def test_sparsity():
    # one dominant logit -> one-hot output
    z = jnp.array([[10.0, 0.0, 0.0, 0.0]])
    p = np.asarray(sparsemax(z))
    np.testing.assert_allclose(p, [[1.0, 0.0, 0.0, 0.0]], atol=1e-6)


def test_grad_matches_finite_differences():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(7,)).astype(np.float64)

    def loss(z):
        p = sparsemax(z)
        return jnp.sum(p * jnp.arange(1.0, 8.0))

    jax.config.update("jax_enable_x64", True)
    try:
        g = jax.grad(loss)(jnp.asarray(z))
        eps = 1e-6
        for i in range(7):
            zp, zm = z.copy(), z.copy()
            zp[i] += eps
            zm[i] -= eps
            fd = (loss(jnp.asarray(zp)) - loss(jnp.asarray(zm))) / (2 * eps)
            assert float(g[i]) == pytest.approx(float(fd), abs=1e-4)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_grad_analytic_formula():
    # For fixed support S, d(sum c·p)/dz_i = c_i - mean_{S}(c) on S, else 0.
    z = jnp.array([0.35, 0.82, 0.33, -1.30, 0.91, 0.45, -0.54])
    c = jnp.arange(1.0, 8.0)
    g = jax.grad(lambda z: jnp.sum(sparsemax(z) * c))(z)
    p = np.asarray(sparsemax(z))
    support = p > 0
    expected = np.where(support, np.asarray(c) - np.asarray(c)[support].mean(), 0.0)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-5)


def test_batched_and_jittable():
    z = jnp.ones((3, 4, 5))
    p = jax.jit(sparsemax)(z)
    np.testing.assert_allclose(np.asarray(p), np.full((3, 4, 5), 0.2), atol=1e-6)
