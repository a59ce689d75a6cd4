"""Math identities in the shared method helpers."""

import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.methods import common


def test_mc_cosine_logits_equals_explicit_mean():
    """Averaged-prototype fast path == reference's mean-over-S einsum."""
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(17, 32)).astype(np.float32))
    protos = jnp.asarray(rng.normal(size=(9, 5, 32)).astype(np.float32))
    fast = np.asarray(common.cosine_logits(f, protos, 50.0))
    fn = np.asarray(common.l2_normalize(f))
    pn = np.asarray(common.l2_normalize(protos))
    explicit = (50.0 * np.einsum("nd,skd->nsk", fn, pn)).mean(axis=1)
    np.testing.assert_allclose(fast, explicit, rtol=1e-4, atol=1e-4)


def test_mc_cross_entropy_is_mean_of_per_sample_ce():
    rng = np.random.default_rng(1)
    f = common.l2_normalize(jnp.asarray(rng.normal(size=(11, 16)).astype(np.float32)))
    protos = jnp.asarray(rng.normal(size=(4, 3, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=11).astype(np.int32))
    got = float(common.mc_cross_entropy(f, protos, labels, 10.0))
    ces = []
    for s in range(4):
        logits = common.cosine_logits(f, protos[s], 10.0)
        ces.append(float(common.cross_entropy(logits, labels)))
    assert abs(got - np.mean(ces)) < 1e-5
