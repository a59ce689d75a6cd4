"""SVGP template weighter: whitened predictive math, KL, sampling, warm start.

Validated against an independent per-class numpy implementation of the
whitened sparse-variational predictive equations (gpytorch
``VariationalStrategy`` semantics) since gpytorch itself is not available.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_gp_tpu.gp import svgp

K, M, D = 5, 6, 32


def _cfg(kernel="rbf", pca_dim=8):
    adapter = types.SimpleNamespace(
        gp_pca_dim=pca_dim,
        gp_kernel_type=kernel,
        gp_prior_temp=1.0,
        gp_jitter=1e-4,
    )
    return types.SimpleNamespace(adapter=adapter)


def _embeddings(seed=0):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(K, M, D)).astype(np.float32)
    return E / np.linalg.norm(E, axis=-1, keepdims=True)


@pytest.fixture(params=["rbf", "matern", "linear"])
def gp(request):
    E = _embeddings()
    static, params, buffers = svgp.create_gp(jnp.asarray(E), _cfg(request.param))
    return static, params, buffers


def test_shapes_and_init(gp):
    static, params, buffers = gp
    assert static.num_classes == K and static.num_templates == M
    assert params["variational_mean"].shape == (K, M + 1)
    assert buffers["templates_red"].shape == (K, M, 8)
    # at init q(u)=N(0,I) -> KL = 0
    np.testing.assert_allclose(np.asarray(svgp.kl_divergence(params)), 0.0, atol=1e-6)


def test_predictive_at_init_is_zero_mean(gp):
    # whitened strategy with m=0, S=I: mean = tail(biases)=0, cov = K_xx +
    # jitter I. Reference-exact: gpytorch slices the mean module's output
    # past the M+1 inducing entries, so queries always get the constant
    # tail — f0 NEVER enters the predictive (see svgp._mean_fn).
    static, params, buffers = gp
    x = buffers["templates_red"]
    mean, cov = svgp.gp_predictive(static, params, buffers, x)
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=1e-6)
    k_xx = np.asarray(svgp._kernel(static, params, x, x))
    expected_cov = k_xx + static.jitter * np.eye(M)
    np.testing.assert_allclose(np.asarray(cov), expected_cov, atol=1e-4)


def test_predictive_is_independent_of_f0(gp):
    # pins the reference's executed semantics: perturbing the frozen prior
    # logits must not move the predictive (the prior-injection channel is
    # the variational-mean warm start instead)
    static, params, buffers = gp
    x = buffers["templates_red"]
    mean0, cov0 = svgp.gp_predictive(static, params, buffers, x)
    buffers2 = {**buffers, "f0": buffers["f0"] + 3.7}
    mean1, cov1 = svgp.gp_predictive(static, params, buffers2, x)
    np.testing.assert_array_equal(np.asarray(mean0), np.asarray(mean1))
    np.testing.assert_array_equal(np.asarray(cov0), np.asarray(cov1))


def test_predictive_matches_numpy_whitened_svgp(gp):
    """Golden: dense per-class numpy whitened-SVGP with random q(u)."""
    static, params, buffers = gp
    rng = np.random.default_rng(1)
    params = dict(params)
    params["variational_mean"] = jnp.asarray(
        rng.normal(size=(K, M + 1)).astype(np.float32)
    )
    lq = np.tril(rng.normal(size=(K, M + 1, M + 1)).astype(np.float32) * 0.3)
    lq += np.eye(M + 1)[None]
    params["chol_variational_covar"] = jnp.asarray(lq)
    params["cls_bias"] = jnp.asarray(rng.normal(size=(K, 1)).astype(np.float32) * 0.1)
    params["tmp_bias"] = jnp.asarray(rng.normal(size=(1, M)).astype(np.float32) * 0.1)

    x = buffers["templates_red"]
    mean, cov = svgp.gp_predictive(static, params, buffers, x)

    z = np.asarray(svgp.inducing_points(params, buffers))
    for k in range(K):
        # pass the SAME object for self-grams so _kernel applies its
        # exact-zero self-distance diagonal (x1 is x2), like gp_predictive
        zk = jnp.asarray(z[k : k + 1])
        xk = x[k : k + 1]
        kzz = np.asarray(
            svgp._kernel(static, params, zk, zk)
        )[0] + static.jitter * np.eye(M + 1)
        kzx = np.asarray(svgp._kernel(static, params, zk, xk))[0]
        kxx = np.asarray(svgp._kernel(static, params, xk, xk))[0]
        l = np.linalg.cholesky(kzz)
        a = np.linalg.solve(l, kzx)  # [P, M]
        m_k = np.asarray(params["variational_mean"])[k]
        s_k = np.tril(lq[k]) @ np.tril(lq[k]).T
        # reference-exact query mean: the constant tail (gpytorch evaluates
        # the mean module on cat([inducing, x]) and slices past M+1 entries)
        mu_fn = np.full(
            (M,),
            np.asarray(params["cls_bias"])[k, 0]
            + np.asarray(params["tmp_bias"])[0].mean(),
            dtype=np.float32,
        )
        expected_mean = a.T @ m_k + mu_fn
        expected_cov = (
            kxx + static.jitter * np.eye(M) + a.T @ (s_k - np.eye(M + 1)) @ a
        )
        np.testing.assert_allclose(np.asarray(mean)[k], expected_mean, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cov)[k], expected_cov, atol=2e-4)


def test_kl_closed_form():
    static, params, buffers = svgp.create_gp(jnp.asarray(_embeddings()), _cfg())
    rng = np.random.default_rng(2)
    p = M + 1
    m = rng.normal(size=(K, p)).astype(np.float32)
    lq = np.tril(rng.normal(size=(K, p, p)).astype(np.float32) * 0.2) + np.eye(p)
    params = {
        **params,
        "variational_mean": jnp.asarray(m),
        "chol_variational_covar": jnp.asarray(lq),
    }
    kl = np.asarray(svgp.kl_divergence(params))
    for k in range(K):
        s = np.tril(lq[k]) @ np.tril(lq[k]).T
        sign, logdet = np.linalg.slogdet(s)
        expected = 0.5 * (np.trace(s) + m[k] @ m[k] - p - logdet)
        assert kl[k] == pytest.approx(expected, abs=1e-3)


def test_sampling_statistics():
    static, params, buffers = svgp.create_gp(jnp.asarray(_embeddings()), _cfg())
    key = jax.random.key(0)
    f = svgp.sample_latent(static, params, buffers, key, 4000)
    assert f.shape == (4000, K, M)
    mean, cov = svgp.gp_predictive(static, params, buffers, buffers["templates_red"])
    emp_mean = np.asarray(f).mean(axis=0)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.1)
    # marginal variances
    emp_var = np.asarray(f).var(axis=0)
    pred_var = np.asarray(jnp.diagonal(cov, axis1=-2, axis2=-1))
    np.testing.assert_allclose(emp_var, pred_var, rtol=0.15, atol=0.05)


def test_prototypes_are_convex_combinations():
    static, params, buffers = svgp.create_gp(jnp.asarray(_embeddings()), _cfg())
    protos, w = svgp.sample_prototypes(
        static, params, buffers, jax.random.key(1), 8
    )
    assert protos.shape == (8, K, D)
    assert w.shape == (8, K, M)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(w) >= 0).all()
    expected = np.einsum("skm,kmd->skd", np.asarray(w), np.asarray(buffers["templates"]))
    np.testing.assert_allclose(np.asarray(protos), expected, atol=1e-5)


def test_visual_context_path():
    static, params, buffers = svgp.create_gp(jnp.asarray(_embeddings()), _cfg())
    ctx = jnp.asarray(np.random.default_rng(3).normal(size=(K, D)).astype(np.float32))
    f = svgp.sample_latent(static, params, buffers, jax.random.key(2), 3, ctx)
    assert f.shape == (3, K, M)  # extra context column is dropped


def test_warm_start_changes_mean():
    static, params, buffers = svgp.create_gp(jnp.asarray(_embeddings()), _cfg())
    w = np.full((K, M), 1.0 / M, dtype=np.float32)
    w[:, 0] = 0.9
    w /= w.sum(axis=1, keepdims=True)
    params2 = svgp.initialize_from_weights(params, jnp.asarray(w))
    assert not np.allclose(
        np.asarray(params2["variational_mean"]), np.asarray(params["variational_mean"])
    )
    mean0, _ = svgp.gp_predictive(static, params, buffers, buffers["templates_red"])
    mean1, _ = svgp.gp_predictive(static, params2, buffers, buffers["templates_red"])
    assert not np.allclose(np.asarray(mean0), np.asarray(mean1))


def test_gradients_flow_and_frozen_inducing_stay_frozen():
    static, params, buffers = svgp.create_gp(jnp.asarray(_embeddings()), _cfg())

    def loss(params):
        protos, _ = svgp.sample_prototypes(
            static, params, buffers, jax.random.key(0), 2
        )
        return jnp.sum(protos**2) + svgp.kl_divergence(params).sum()

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["variational_mean"]).sum()) > 0
    assert float(jnp.abs(grads["cls_bias"]).sum()) > 0
    # frozen template inducing locations live in buffers, not params
    assert "inducing_frozen" not in params
    assert grads["inducing_token"].shape == (K, 1, 8)


def test_jit_compiles():
    static, params, buffers = svgp.create_gp(jnp.asarray(_embeddings()), _cfg())
    fn = jax.jit(
        lambda p, key: svgp.sample_prototypes(static, p, buffers, key, 4)[0]
    )
    out = fn(params, jax.random.key(0))
    assert out.shape == (4, K, D)


# ----------------------------------------------------------------------
# psd-safe Cholesky jitter escalation (gpytorch psd_safe_cholesky analog)
# ----------------------------------------------------------------------

def test_safe_cholesky_healthy_path_matches_plain():
    """On a well-conditioned matrix the first (exact base-jitter) try is used,
    so numerics are bit-identical to the round-1 fixed-jitter path."""
    import jax.numpy as jnp
    from clip_gp_tpu.gp.svgp import safe_cholesky

    rng = np.random.default_rng(0)
    b = rng.normal(size=(3, 6, 6)).astype(np.float32)
    a = jnp.asarray(b @ b.transpose(0, 2, 1) + 0.5 * np.eye(6, dtype=np.float32))
    expected = jnp.linalg.cholesky(a + 1e-4 * jnp.eye(6))
    got = safe_cholesky(a, 1e-4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_safe_cholesky_escalates_on_singular_gram():
    """A rank-1 Gram at huge scale (float32 can't absorb the base jitter)
    must factorize finitely via escalation instead of going NaN."""
    import jax.numpy as jnp
    from clip_gp_tpu.gp.svgp import safe_cholesky

    ones = np.ones((2, 8, 8), dtype=np.float32)
    a = jnp.asarray(1e6 * ones)  # rank 1, diag 1e6
    plain = jnp.linalg.cholesky(a + 1e-4 * jnp.eye(8))
    assert not np.isfinite(np.asarray(plain)).all()  # the failure mode
    l = safe_cholesky(a, 1e-4)
    assert np.isfinite(np.asarray(l)).all()
    rec = np.asarray(l @ jnp.swapaxes(l, -1, -2))
    # reconstruction error bounded by the escalated jitter magnitude
    assert np.abs(rec - np.asarray(a)).max() <= 1e-4 * 1e4 * 1e6 * 1.1


def test_safe_cholesky_gradients_finite_through_escalation():
    import jax
    import jax.numpy as jnp
    from clip_gp_tpu.gp.svgp import safe_cholesky

    ones = np.ones((1, 4, 4), dtype=np.float32)

    def loss(scale):
        a = scale * jnp.asarray(ones)  # rank-1: needs escalation
        return jnp.sum(safe_cholesky(a, 1e-4) ** 2)

    g = jax.grad(loss)(jnp.float32(1e6))
    assert np.isfinite(float(g))


def test_gp_survives_extreme_hyperparameters():
    """Near-singular kernel regimes (huge outputscale + huge lengthscale →
    nearly-constant Gram) must not NaN the loss or the gradients
    (ref analog: gpytorch's psd_safe_cholesky keeps the sweep alive)."""
    import types

    import jax
    import jax.numpy as jnp
    from clip_gp_tpu.gp import svgp

    k, m, d = 4, 3, 16
    rng = np.random.default_rng(1)
    e = rng.normal(size=(k, m, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    cfg = types.SimpleNamespace(
        adapter=types.SimpleNamespace(
            gp_pca_dim=8, gp_kernel_type="rbf", gp_prior_temp=1.0,
            gp_jitter=1e-4,
        )
    )
    static, params, buffers = svgp.create_gp(jnp.asarray(e), cfg)
    # extreme regime: outputscale ~ softplus(40) ≈ 40, lengthscale huge
    # (all kernel entries ≈ outputscale → rank-1 Gram)
    params["raw_outputscale"] = jnp.full((k,), 1e6)
    params["raw_lengthscale"] = jnp.full_like(params["raw_lengthscale"], 1e3)

    def loss(params):
        protos, _ = svgp.sample_prototypes(
            static, params, buffers, jax.random.key(0), 4
        )
        return jnp.sum(protos**2) + svgp.kl_divergence(params).sum()

    value, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(value))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
