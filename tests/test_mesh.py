"""Direct unit coverage for parallel/mesh.py on the virtual 8-device mesh:
sharded placement, replicated placement, and DP-sharded encode/train-step
numerical parity with single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_gp_tpu.models import clip_model
from clip_gp_tpu.models.clip_loader import init_clip_params
from clip_gp_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_encode_fn,
    sharded_train_step,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    return make_mesh(8)


def test_shard_and_replicate_placement(mesh):
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    assert not xs.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))

    xr = replicate(mesh, {"w": x})["w"]
    assert xr.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(x))


def test_sharded_encode_matches_single_device(mesh):
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, size=(16, 32, 32, 3), dtype=np.uint8)
    )
    pre = lambda u8: u8.astype(jnp.float32) / 255.0

    encode = sharded_encode_fn(mesh, params, arch, pre)
    sharded = np.asarray(encode(shard_batch(mesh, images)))
    single = np.asarray(clip_model.encode_image(params, arch, pre(images)))
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_sharded_train_step_grad_reduction(mesh):
    """DP step: replicated params, sharded batch — the psum XLA derives from
    the shardings must give the same update as single-device full-batch."""
    d, k, n = 8, 4, 16
    key = jax.random.key(1)
    w0 = jax.random.normal(key, (d, k))
    feats = jax.random.normal(jax.random.key(2), (n, d))
    labels = jnp.asarray(np.arange(n) % k, dtype=jnp.int32)
    lr = 0.1

    def step(params, opt_state, f, l, _key):
        def loss_fn(w):
            logits = f @ w
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, l[:, None], axis=1).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        return params - lr * g, opt_state, loss

    # reference first: the DP step donates its (replicated) params buffer,
    # which on the CPU backend can alias w0 itself
    w_ref, _, loss_ref = step(w0, jnp.zeros(()), feats, labels, None)
    dp_step = sharded_train_step(mesh, step)
    w_dp, _, loss_dp = dp_step(
        replicate(mesh, jnp.array(w0)),
        replicate(mesh, jnp.zeros(())),
        shard_batch(mesh, feats),
        shard_batch(mesh, labels),
        replicate(mesh, jnp.zeros(())),
    )
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w_dp), np.asarray(w_ref), rtol=1e-5, atol=1e-6
    )


def test_maybe_sharded_encode_parity_and_gates(mesh):
    from clip_gp_tpu.parallel.mesh import maybe_sharded_encode

    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(3), arch)

    def encode(p, u8):
        return clip_model.encode_image(p, arch, u8.astype(jnp.float32) / 255.0)

    call = maybe_sharded_encode(encode, params)
    assert call is not None  # 8 virtual devices, no pinning

    rng = np.random.default_rng(4)
    # 13 images: forces the pad-to-device-multiple path (13 -> 16)
    images = jnp.asarray(
        rng.integers(0, 256, size=(13, 32, 32, 3), dtype=np.uint8)
    )
    sharded = np.asarray(call(images))
    single = np.asarray(jax.jit(encode)(params, images))
    assert sharded.shape == single.shape
    # per-image math only — on the CPU mesh this is bit-identical; on real
    # hardware the executables may differ at ULP level, which the feature
    # cache records via the dpN key tag
    np.testing.assert_array_equal(sharded, single)

    # the replicated weight copy is exposed so the trainer can drop its
    # single-device original instead of holding the tower in HBM twice
    assert call.params_rep is not None
    leaf = jax.tree.leaves(call.params_rep)[0]
    assert leaf.sharding.is_fully_replicated

    # inside a pinned worker (group-parallel sweep), sharding must not engage
    with jax.default_device(jax.devices()[0]):
        assert maybe_sharded_encode(encode, params) is None

    # escape hatch
    import os
    os.environ["CLIP_GP_TPU_SHARD_EXTRACTION"] = "0"
    try:
        assert maybe_sharded_encode(encode, params) is None
    finally:
        del os.environ["CLIP_GP_TPU_SHARD_EXTRACTION"]


def test_extraction_shard_devices_gate(mesh):
    """The gate is the single source of truth the feature-cache key relies
    on: it must report the same device count the encode will actually use."""
    import os
    from clip_gp_tpu.parallel.mesh import extraction_shard_devices

    devs = extraction_shard_devices()
    assert devs is not None and len(devs) == len(jax.local_devices())

    with jax.default_device(jax.devices()[0]):
        assert extraction_shard_devices() is None

    os.environ["CLIP_GP_TPU_SHARD_EXTRACTION"] = "0"
    try:
        assert extraction_shard_devices() is None
    finally:
        del os.environ["CLIP_GP_TPU_SHARD_EXTRACTION"]


def test_encode_plan_frozen_until_reload(mesh, monkeypatch):
    """The trainer's extraction plan (int8 / fused / shard width) is a
    one-shot snapshot: env gates flipping mid-run must not make later cache
    keys disagree with the executable that was already built."""
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.runtime.trainer_base import BaseTrainer

    t = object.__new__(BaseTrainer)
    t.config = Config()
    t._encode_plan_cached = None
    plan = t._encode_plan()
    assert plan["shard_devices"] == len(jax.local_devices())

    monkeypatch.setenv("CLIP_GP_TPU_SHARD_EXTRACTION", "0")
    assert t._encode_plan() is plan  # frozen despite the flipped gate

    # a fresh snapshot (what load_clip_model triggers) sees the new gate
    t._encode_plan_cached = None
    assert t._encode_plan()["shard_devices"] == 0


def test_sharded_encode_fn_uneven_batch(mesh):
    """sharded_encode_fn pads batches that do not divide the mesh (shard_map
    would otherwise reject the 13-over-8 split)."""
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(5), arch)
    pre = lambda u8: u8.astype(jnp.float32) / 255.0
    rng = np.random.default_rng(6)
    images = jnp.asarray(
        rng.integers(0, 256, size=(13, 32, 32, 3), dtype=np.uint8)
    )
    encode = sharded_encode_fn(mesh, params, arch, pre)
    out = np.asarray(encode(images))
    single = np.asarray(clip_model.encode_image(params, arch, pre(images)))
    assert out.shape == single.shape
    np.testing.assert_allclose(out, single, rtol=2e-5, atol=2e-5)
