"""Tests for the opt-in int8 inference path (models/quantized.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_gp_tpu.models import clip_model, quantized
from clip_gp_tpu.models.clip_loader import init_clip_params


def test_quantize_weight_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    wq = quantized.quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    assert wq["scale"].shape == (48,)
    deq = wq["q"].astype(np.float32) * wq["scale"][None, :]
    # symmetric uniform quantization: |err| <= scale/2 = absmax/254 per entry
    absmax = np.abs(np.asarray(w)).max(axis=0)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert (err <= absmax[None, :] / 254.0 + 1e-7).all()


def test_quantize_weight_stacked_layer_axis():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
    wq = quantized.quantize_weight(w)
    assert wq["q"].shape == (3, 16, 8)
    assert wq["scale"].shape == (3, 8)
    # per-layer quantization must equal quantizing each layer separately
    solo = quantized.quantize_weight(w[1])
    np.testing.assert_array_equal(np.asarray(wq["q"][1]), np.asarray(solo["q"]))


def test_int8_linear_matches_float_linear():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(5, 33, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    ref = np.asarray(x @ w + b)
    out = np.asarray(
        quantized.int8_linear(x, quantized.quantize_weight(w), b,
                              out_dtype=jnp.float32)
    )
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.02


def test_int8_linear_zero_rows_finite():
    """All-zero activation rows must not divide by zero."""
    w = jnp.ones((8, 4), jnp.float32)
    x = jnp.zeros((2, 8), jnp.float32)
    out = quantized.int8_linear(x, quantized.quantize_weight(w),
                                out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_encode_image_q8_close_to_bf16_path():
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.uniform(-1.5, 1.5, size=(4, 32, 32, 3)).astype(np.float32)
    )
    ref = np.asarray(
        clip_model.encode_image(params, arch, images,
                                compute_dtype=jnp.float32)
    )
    qvisual = quantized.quantize_visual(params, arch)
    out = np.asarray(quantized.encode_image_q8(qvisual, arch, images))
    cos = (ref * out).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert (cos > 0.99).all(), cos


def test_encode_image_q8_jit_compiles_and_matches_eager():
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(1), arch)
    images = jnp.zeros((2, 32, 32, 3), jnp.float32)
    qvisual = quantized.quantize_visual_jit(params, arch)
    eager = np.asarray(quantized.encode_image_q8(qvisual, arch, images))
    jitted = np.asarray(quantized.encode_image_q8_jit(qvisual, arch, images))
    np.testing.assert_allclose(eager, jitted, rtol=2e-2, atol=2e-2)


def test_quantize_visual_rejects_resnet():
    arch = clip_model.ARCHITECTURES["TEST-RN"]
    params = init_clip_params(jax.random.key(2), arch)
    with pytest.raises(AssertionError):
        quantized.quantize_visual(params, arch)


# ----------------------------------------------------------------------
# int8 fused Pallas kernels (ops/int8_block.py, interpret mode on CPU)
# ----------------------------------------------------------------------

def _rand_block_params(rng, d, hidden):
    def w(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05)

    return {
        "ln_1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "ln_2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "attn": {
            "w_qkv": quantized.quantize_weight(w(d, 3 * d)),
            "b_qkv": w(3 * d),
            "w_out": quantized.quantize_weight(w(d, d)),
            "b_out": w(d),
        },
        "mlp": {
            "c_fc": {"w": quantized.quantize_weight(w(d, hidden)),
                     "b": w(hidden)},
            "c_proj": {"w": quantized.quantize_weight(w(hidden, d)),
                       "b": w(d)},
        },
    }


def test_q8_fused_block_matches_xla_q8_block():
    """The Pallas int8 block (interpret mode) must track the XLA int8 block —
    the only numerical difference is per-head vs merged-head dynamic
    quantization of the attention output."""
    rng = np.random.default_rng(7)
    d, hidden, heads = 64, 128, 4
    p = _rand_block_params(rng, d, hidden)
    x = jnp.asarray(rng.normal(size=(2, 9, d)).astype(np.float32))

    ref = np.asarray(quantized._q8_attention_block(p, x, heads))
    out = np.asarray(quantized._q8_fused_block(p, x, heads, interpret=True))
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.02, (
        np.abs(out - ref).mean() / denom
    )


def test_q8_fused_mlp_matches_float():
    from clip_gp_tpu.ops.int8_block import q8_ln_mlp

    rng = np.random.default_rng(8)
    d, hidden = 64, 256
    w_fc = rng.normal(size=(d, hidden)).astype(np.float32) * 0.05
    w_pr = rng.normal(size=(hidden, d)).astype(np.float32) * 0.05
    b_fc = rng.normal(size=(hidden,)).astype(np.float32) * 0.01
    b_pr = rng.normal(size=(d,)).astype(np.float32) * 0.01
    x = jnp.asarray(rng.normal(size=(3, 10, d)).astype(np.float32))
    qfc = quantized.quantize_weight(jnp.asarray(w_fc))
    qpr = quantized.quantize_weight(jnp.asarray(w_pr))

    out = np.asarray(q8_ln_mlp(
        x, jnp.ones((d,)), jnp.zeros((d,)),
        qfc["q"], qfc["scale"], jnp.asarray(b_fc),
        qpr["q"], qpr["scale"], jnp.asarray(b_pr), interpret=True,
    ))

    # float reference of the same block math
    x32 = np.asarray(x, np.float64)
    h = (x32 - x32.mean(-1, keepdims=True)) / np.sqrt(
        x32.var(-1, keepdims=True) + 1e-5
    )
    hid = h @ w_fc + b_fc
    hid = hid / (1 + np.exp(-1.702 * hid))
    ref = x32 + hid @ w_pr + b_pr
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.02


def test_encode_image_q8_fused_matches_unfused():
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(5), arch)
    qvisual = quantized.quantize_visual(params, arch)
    rng = np.random.default_rng(9)
    images = jnp.asarray(
        rng.uniform(-1.5, 1.5, size=(2, 32, 32, 3)).astype(np.float32)
    )
    plain = np.asarray(
        quantized.encode_image_q8(qvisual, arch, images, use_fused=False)
    )
    fused = np.asarray(
        quantized.encode_image_q8(qvisual, arch, images, use_fused=True)
    )
    cos = (plain * fused).sum(-1) / (
        np.linalg.norm(plain, axis=-1) * np.linalg.norm(fused, axis=-1)
    )
    assert (cos > 0.999).all(), cos


# ----------------------------------------------------------------------
# config knob wiring (MODEL.INT8_INFERENCE)
# ----------------------------------------------------------------------

def test_int8_knob_yaml_opts_and_cache_key():
    from clip_gp_tpu.core.config import Config, merge_config_dict, merge_from_opts
    from clip_gp_tpu.runtime.feature_cache import cache_key

    c = Config()
    assert c.model.int8_inference is False
    merge_config_dict(c, {"MODEL": {"INT8_INFERENCE": True}})
    assert c.model.int8_inference is True
    c2 = Config()
    merge_from_opts(c2, ["MODEL.INT8_INFERENCE", "True"])
    assert c2.model.int8_inference is True

    class _Item:
        impath = "/x/a.jpg"
        label = 0

    base = Config()
    k_bf16 = cache_key(base, [_Item()], "w")
    # fused (Pallas, the TPU default) and XLA int8 towers quantize the
    # attention output differently — three mutually distinct labels
    k_int8 = cache_key(c2, [_Item()], "w", int8_fused=True)
    k_int8_xla = cache_key(c2, [_Item()], "w", int8_fused=False)
    assert k_bf16 != k_int8 and k_int8.endswith("int8")
    assert k_int8_xla != k_int8 and k_int8_xla.endswith("int8xla")
    # int8_fused=None resolves via use_flash(), which is False on the CPU
    # test backend — the same default encode_image_q8 applies
    assert cache_key(c2, [_Item()], "w") == k_int8_xla

    # the EFFECTIVE int8 decision wins over the raw flag: an RN backbone
    # falls back to bf16 extraction, so its features must not be stored
    # under an int8-labelled key
    k_fallback = cache_key(c2, [_Item()], "w", int8=False)
    assert k_fallback == k_bf16

    # sharded extraction provenance: dpN-tagged keys never alias the
    # single-device ones (executables may differ at ULP level)
    k_dp = cache_key(base, [_Item()], "w", shard_devices=8)
    assert k_dp != k_bf16 and k_dp.endswith("dp8")
    assert cache_key(base, [_Item()], "w", shard_devices=1) == k_bf16


def test_int8_rn_fallback_warns_at_load_time(tmp_path, monkeypatch, capfd):
    """An int8 request on an RN backbone must warn when the tower LOADS —
    with a warm feature cache the encode build never runs, so an
    encode-time warning would silently drop an explicit int8 request."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager

    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = 2
    c.model.backbone_name = "TEST-RN"
    c.model.int8_inference = True
    c.input.size = (64, 64)
    c.adapter.num_templates = 2
    c.output_dir = str(tmp_path / "out")
    c.seed = 1
    set_random_seed(1)
    dm = build_data_manager(c)
    trainer = build_trainer(c, dm)
    capfd.readouterr()
    trainer.load_clip_model()  # no encode happens
    out = capfd.readouterr().out
    assert "[WARN] MODEL.INT8_INFERENCE covers the ViT towers only" in out
    # and the plan agrees: bf16 extraction, bf16 cache label
    plan = trainer._encode_plan()
    assert plan["int8"] is False and plan["int8_fused"] is False


def test_trainer_int8_knob_routes_encode(tmp_path, monkeypatch):
    """A trainer with MODEL.INT8_INFERENCE=True must extract features through
    the quantized tower, and those features must stay close to bf16's."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.methods.common import extract_with

    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = 2
    c.model.backbone_name = "TEST-ViT"
    c.model.int8_inference = True
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = 8
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.optim.max_epoch = 1
    c.output_dir = str(tmp_path / "out")
    c.seed = 1
    set_random_seed(1)
    dm = build_data_manager(c)
    trainer = build_trainer(c, dm)
    trainer.load_clip_model()
    labels, feats = trainer.encode_images_batched(trainer.test_loader)

    # the quantized tower was actually installed
    wq = trainer._encode_params["transformer"]["blocks"]["attn"]["w_qkv"]
    assert wq["q"].dtype == jnp.int8

    @jax.jit
    def ref_encode(params, images_u8):
        return clip_model.encode_image(
            params, trainer.clip_arch, trainer.preprocess(images_u8)
        )

    ref_feats, ref_labels = extract_with(
        lambda im: ref_encode(trainer.clip_params, im), trainer.test_loader
    )
    np.testing.assert_array_equal(labels, ref_labels)
    cos = (feats * ref_feats).sum(-1) / (
        np.linalg.norm(feats, axis=-1) * np.linalg.norm(ref_feats, axis=-1)
    )
    assert (cos > 0.99).all(), cos.min()
