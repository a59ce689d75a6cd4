"""Property-based tests (hypothesis) for the math core: invariants that must
hold for ANY input, not just the golden cases. Shapes are fixed per test so
jitted functions compile once; only values are randomized."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

import jax.numpy as jnp

from clip_gp_tpu.gp.svgp import kl_divergence, safe_cholesky
from clip_gp_tpu.ops.metrics import (
    compute_accuracy,
    compute_ece,
    compute_macro_f1,
)
from clip_gp_tpu.ops.sparsemax import sparsemax

FLOATS = st.floats(-50.0, 50.0, allow_nan=False, width=32)
COMMON = dict(max_examples=25, deadline=None)


@settings(**COMMON)
@given(z=arrays(np.float32, (4, 6), elements=FLOATS))
def test_sparsemax_on_simplex(z):
    w = np.asarray(sparsemax(jnp.asarray(z)))
    assert (w >= 0).all()
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)


@settings(**COMMON)
@given(
    z=arrays(np.float32, (3, 5), elements=FLOATS),
    c=st.floats(-20.0, 20.0, allow_nan=False, width=32),
)
def test_sparsemax_shift_invariant(z, c):
    # sparsemax(z + c·1) == sparsemax(z): the simplex projection only sees
    # differences (ref behavior of entmax.sparsemax)
    w1 = np.asarray(sparsemax(jnp.asarray(z)))
    w2 = np.asarray(sparsemax(jnp.asarray(z + np.float32(c))))
    np.testing.assert_allclose(w1, w2, atol=2e-4)


@settings(**COMMON)
@given(z=arrays(np.float32, (5,), elements=FLOATS), data=st.data())
def test_sparsemax_permutation_equivariant(z, data):
    perm = data.draw(st.permutations(range(5)))
    perm = np.asarray(perm)
    w = np.asarray(sparsemax(jnp.asarray(z)))
    wp = np.asarray(sparsemax(jnp.asarray(z[perm])))
    np.testing.assert_allclose(wp, w[perm], atol=1e-5)


@settings(**COMMON)
@given(
    m=arrays(np.float32, (3, 4), elements=FLOATS),
    lraw=arrays(
        np.float32, (3, 4, 4),
        elements=st.floats(-2.0, 2.0, allow_nan=False, width=32),
    ),
)
def test_kl_nonnegative(m, lraw):
    # force nonsingular triangular factors (diagonal bounded away from 0)
    l = np.tril(lraw)
    idx = np.arange(4)
    l[:, idx, idx] = np.abs(l[:, idx, idx]) + 0.1
    kl = np.asarray(
        kl_divergence(
            {"variational_mean": jnp.asarray(m),
             "chol_variational_covar": jnp.asarray(l)}
        )
    )
    assert np.isfinite(kl).all()
    assert (kl >= -1e-4).all()  # KL(q ‖ N(0,I)) ≥ 0
    # KL(N(0,I) ‖ N(0,I)) == 0
    kl0 = np.asarray(
        kl_divergence(
            {"variational_mean": jnp.zeros((3, 4)),
             "chol_variational_covar": jnp.broadcast_to(jnp.eye(4), (3, 4, 4))}
        )
    )
    np.testing.assert_allclose(kl0, 0.0, atol=1e-5)


@settings(**COMMON)
@given(
    b=arrays(
        np.float32, (3, 5, 5),
        elements=st.floats(-3.0, 3.0, allow_nan=False, width=32),
    )
)
def test_safe_cholesky_factorizes_any_gram(b):
    # B Bᵀ is PSD (possibly rank-deficient) — the factor must come back
    # finite and reconstruct A up to the added jitter
    a = b @ np.swapaxes(b, -1, -2)
    l = np.asarray(safe_cholesky(jnp.asarray(a), 1e-5))
    assert np.isfinite(l).all()
    recon = l @ np.swapaxes(l, -1, -2)
    # jitter escalates at most to base·10^4·scale; reconstruction error is
    # bounded by what was added to the diagonal
    diag_scale = np.clip(np.mean(np.diagonal(a, axis1=-2, axis2=-1), -1), 1, None)
    bound = 1e-5 * 1e4 * diag_scale.max() + 1e-3
    assert np.abs(recon - a).max() <= bound * 10


@settings(**COMMON)
@given(
    logits=arrays(np.float32, (16, 5), elements=FLOATS),
    labels=arrays(np.int64, (16,), elements=st.integers(0, 4)),
)
def test_metric_ranges(logits, labels):
    (acc,) = compute_accuracy(jnp.asarray(logits), jnp.asarray(labels))
    assert 0.0 <= acc <= 100.0
    ece = compute_ece(logits, labels)
    assert 0.0 <= ece <= 100.0
    f1 = compute_macro_f1(logits, labels)
    assert 0.0 <= f1 <= 100.0


@settings(**COMMON)
@given(labels=arrays(np.int64, (12,), elements=st.integers(0, 3)))
def test_perfect_predictions(labels):
    # one-hot-confident correct logits → 100% acc, 0 ECE (confidence ≈ 1)
    logits = np.full((12, 4), -100.0, dtype=np.float32)
    logits[np.arange(12), labels] = 100.0
    (acc,) = compute_accuracy(jnp.asarray(logits), jnp.asarray(labels))
    assert acc == 100.0
    assert compute_ece(logits, labels) == pytest.approx(0.0, abs=1e-3)


@settings(**COMMON)
@given(z=arrays(np.float32, (3, 6), elements=FLOATS))
def test_sparsemax_fixed_point(z):
    # a point already on the simplex projects to itself
    p = np.asarray(sparsemax(jnp.asarray(z)))
    p2 = np.asarray(sparsemax(jnp.asarray(p)))
    np.testing.assert_allclose(p2, p, atol=1e-5)


@settings(**COMMON)
@given(
    f=arrays(np.float32, (7, 16),
             elements=st.floats(-3, 3, allow_nan=False, width=32)),
    protos=arrays(np.float32, (5, 4, 16),
                  elements=st.floats(-3, 3, allow_nan=False, width=32)),
)
def test_cosine_logits_mc_linearity(f, protos):
    """The eval-path optimization: averaging normalized prototypes first is
    identical to averaging per-sample logits (COMPONENTS.md deliberate
    divergence — this is its correctness certificate)."""
    from clip_gp_tpu.methods.common import cosine_logits

    # keep vectors away from the normalization singularity at 0
    f = f + np.sign(f + 0.5) * 0.1
    protos = protos + np.sign(protos + 0.5) * 0.1
    fast = np.asarray(cosine_logits(jnp.asarray(f), jnp.asarray(protos), 10.0))
    slow = np.mean(
        [
            np.asarray(cosine_logits(jnp.asarray(f), jnp.asarray(protos[s]), 10.0))
            for s in range(protos.shape[0])
        ],
        axis=0,
    )
    np.testing.assert_allclose(fast, slow, atol=5e-4)


@settings(**COMMON)
@given(
    b=arrays(np.float32, (2, 4, 4),
             elements=st.floats(-2, 2, allow_nan=False, width=32))
)
def test_safe_cholesky_gradients_finite(b):
    """Gradients through the jitter-escalating Cholesky stay finite even for
    rank-deficient Grams (the where/NaN-leak trap)."""
    import jax

    def loss(bm):
        a = bm @ jnp.swapaxes(bm, -1, -2)
        return jnp.sum(safe_cholesky(a, 1e-5) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(b)))
    assert np.isfinite(g).all()


@settings(**COMMON)
@given(data=st.data())
def test_config_dict_round_trip(data):
    from clip_gp_tpu.core.config import Config, config_from_dict, config_to_dict

    c = Config()
    c.seed = data.draw(st.integers(-1, 10_000))
    c.optim.lr = data.draw(st.floats(1e-6, 10.0, allow_nan=False))
    c.dataset.num_shots = data.draw(st.integers(-1, 64))
    c.adapter.use_gp = data.draw(st.booleans())
    c.input.size = tuple(
        data.draw(st.lists(st.integers(8, 512), min_size=2, max_size=2))
    )
    c.trainer_name = data.draw(st.text(min_size=0, max_size=12))
    c2 = config_from_dict(config_to_dict(c))
    assert config_to_dict(c2) == config_to_dict(c)
    assert c2.input.size == c.input.size  # tuple restored from JSON list
