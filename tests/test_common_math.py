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


# ---------------------------------------------------------------------------
# quiet-epoch machinery: make_epoch_scan + quiet_epoch_advance


def _toy_step(params, opt_state, f, l, scale):
    """Deterministic GD step matching the (params, opt_state, *streams,
    *consts) -> (params, opt_state, loss, logits) convention."""
    pred = f @ params["w"] * scale
    err = pred - l.astype(jnp.float32)
    loss = jnp.mean(err ** 2)
    grad = 2.0 * scale * f.T @ err / l.shape[0]
    return {"w": params["w"] - 0.1 * grad}, opt_state + 1, loss, pred


def test_make_epoch_scan_matches_eager_steps():
    scan = common.make_epoch_scan(_toy_step)
    rng = np.random.default_rng(0)
    fb = jnp.asarray(rng.normal(size=(5, 8, 3)).astype(np.float32))
    lb = jnp.asarray(rng.integers(0, 4, size=(5, 8)).astype(np.int32))
    params = {"w": jnp.zeros(3)}
    p_scan, st_scan, losses = scan(params, jnp.asarray(0), fb, lb, 2.0)
    p_eag, st_eag = {"w": jnp.zeros(3)}, jnp.asarray(0)
    eager_losses = []
    for i in range(5):
        p_eag, st_eag, loss, _ = _toy_step(p_eag, st_eag, fb[i], lb[i], 2.0)
        eager_losses.append(float(loss))
    np.testing.assert_allclose(np.asarray(p_scan["w"]),
                               np.asarray(p_eag["w"]), rtol=1e-6)
    assert int(st_scan) == 5
    np.testing.assert_allclose(np.asarray(losses), eager_losses, rtol=1e-6)


def test_make_epoch_scan_out_fn_and_extra_stream():
    """n_streams=3 scans a per-batch precomputed array; out_fn sees labels."""
    def step(params, opt_state, f, l, bias, scale):
        pred = f @ params["w"] * scale + bias
        loss = jnp.mean((pred - l.astype(jnp.float32)) ** 2)
        return params, opt_state, loss, pred

    scan = common.make_epoch_scan(
        step,
        out_fn=lambda loss, logits, l: (loss, (logits > l).sum()),
        n_streams=3,
    )
    rng = np.random.default_rng(1)
    fb = jnp.asarray(rng.normal(size=(4, 8, 3)).astype(np.float32))
    lb = jnp.asarray(rng.integers(0, 4, size=(4, 8)).astype(np.int32))
    bb = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    params = {"w": jnp.ones(3)}
    _, _, (losses, counts) = scan(params, jnp.asarray(0), fb, lb, bb, 1.0)
    assert losses.shape == (4,) and counts.shape == (4,)
    expect = [(np.asarray(fb[i]) @ np.ones(3) + np.asarray(bb[i])
               > np.asarray(lb[i])).sum() for i in range(4)]
    np.testing.assert_array_equal(np.asarray(counts), expect)


class _SizedLoader:
    """Fake loader yielding batches of explicit sizes (to probe the
    partial-batch invariant)."""

    def __init__(self, sizes, batch_size, hw=4, seed=0):
        self.batch_size = batch_size
        self._sizes = sizes
        self._rng = np.random.default_rng(seed)
        self._hw = hw

    def __iter__(self):
        for n in self._sizes:
            yield {
                "img": self._rng.integers(
                    0, 256, size=(n, self._hw, self._hw, 3)
                ).astype(np.uint8),
                "label": np.zeros(n, dtype=np.int64),
            }


def _advance(loader, draw_key=None):
    from clip_gp_tpu.ops.metrics import AverageMeter

    state = {"w": jnp.zeros(3), "steps": 0}
    scan = common.make_epoch_scan(_toy_step)
    seen_scan_keys, seen_tail_keys = [], []

    def scan_full(fb, lb, keys_b, _extras):
        state["w"] = scan(
            {"w": state["w"]}, jnp.asarray(0), fb, lb, 2.0
        )[0]["w"]
        state["steps"] += int(fb.shape[0])
        if keys_b is not None:
            seen_scan_keys.extend(np.asarray(keys_b).tolist())
        return jnp.zeros(fb.shape[0])

    def step_one(f, l, key, _extra):
        p, _, loss, _ = _toy_step({"w": state["w"]}, jnp.asarray(0), f, l, 2.0)
        state["w"] = p["w"]
        state["steps"] += 1
        if key is not None:
            seen_tail_keys.append(np.asarray(key).tolist())
        return loss

    meter = AverageMeter()
    n_batches = common.quiet_epoch_advance(
        loader, _mean_encode, scan_full, step_one, meter, draw_key=draw_key
    )
    return state, meter, n_batches, seen_scan_keys, seen_tail_keys


def test_quiet_epoch_advance_scans_prefix_steps_tail():
    loader = _SizedLoader([8, 8, 5], batch_size=8)
    state, meter, n_batches, _, _ = _advance(loader)
    assert n_batches == 3
    assert state["steps"] == 3  # 2 scanned + 1 eager tail
    assert meter.count == 3

    # the same data through a pure eager loop gives the same params
    ref = {"w": jnp.zeros(3)}
    for batch in loader:
        f = _mean_encode(jnp.asarray(common.pad_batch(batch["img"], 8)))
        f = f[: batch["img"].shape[0]]
        l = jnp.asarray(batch["label"].astype(np.int32))
        ref, _, _, _ = _toy_step(ref, jnp.asarray(0), f, l, 2.0)
    np.testing.assert_allclose(np.asarray(state["w"]),
                               np.asarray(ref["w"]), rtol=1e-6)


def test_quiet_epoch_advance_key_order_matches_eager():
    import jax

    keys = list(jax.random.split(jax.random.PRNGKey(0), 3))
    it = iter(keys)
    loader = _SizedLoader([8, 8, 5], batch_size=8)
    _, _, _, scan_keys, tail_keys = _advance(loader, draw_key=lambda: next(it))
    np.testing.assert_array_equal(scan_keys,
                                  [np.asarray(k).tolist() for k in keys[:2]])
    np.testing.assert_array_equal(tail_keys,
                                  [np.asarray(keys[2]).tolist()])


def test_quiet_epoch_advance_rejects_midstream_partial():
    import pytest

    loader = _SizedLoader([8, 5, 8], batch_size=8)
    with pytest.raises(AssertionError, match="partial batch"):
        _advance(loader)
