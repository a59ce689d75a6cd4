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


class _FakeLoader:
    """Minimal loader: fixed batches of deterministic 'images'."""

    def __init__(self, n, batch_size, hw=4):
        self.batch_size = batch_size
        rng = np.random.default_rng(7)
        self._imgs = rng.integers(0, 256, size=(n, hw, hw, 3)).astype(np.uint8)
        self._labels = rng.integers(0, 5, size=n).astype(np.int32)

    def __iter__(self):
        for lo in range(0, len(self._labels), self.batch_size):
            hi = min(lo + self.batch_size, len(self._labels))
            yield {"img": self._imgs[lo:hi], "label": self._labels[lo:hi]}


def _mean_encode(imgs):
    # per-image reduction: batch-size independent like the real encoders
    return jnp.mean(imgs.astype(jnp.float32), axis=(1, 2))


def test_extract_with_super_batching_matches_per_batch(monkeypatch):
    """Device super-batching must not change features or their order."""
    loader = _FakeLoader(n=53, batch_size=8)
    monkeypatch.setenv("CLIP_GP_TPU_EXTRACT_DEVICE_BATCH", "1")  # group=1
    f1, l1 = common.extract_with(_mean_encode, loader)
    monkeypatch.setenv("CLIP_GP_TPU_EXTRACT_DEVICE_BATCH", "512")
    f2, l2 = common.extract_with(_mean_encode, loader)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(f1, f2, rtol=0, atol=0)
    assert f1.shape == (53, 3)


def test_feature_memo_lru_and_roundtrip():
    from clip_gp_tpu.runtime import feature_cache as fc

    fc.memo_clear()
    for i in range(6):
        fc.memo_put(f"k{i}", np.array([i]), np.array([[i]], dtype=np.float32))
    assert fc.memo_get("k0") is None and fc.memo_get("k1") is None  # evicted
    labels, feats = fc.memo_get("k5")
    assert labels[0] == 5 and feats[0, 0] == 5.0
    # get refreshes recency: k2 survives the next insert, k3 does not
    fc.memo_get("k2")
    fc.memo_put("k6", np.array([6]), np.array([[6.0]], dtype=np.float32))
    assert fc.memo_get("k2") is not None and fc.memo_get("k3") is None
    fc.memo_clear()
