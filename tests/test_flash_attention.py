"""Pallas attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_gp_tpu.ops.flash_attention import flash_attention


def _xla_attention(q, k, v, mask=None):
    hd = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, dtype=q.dtype)
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize(
    "b,h,n,dh",
    [(2, 2, 197, 64), (1, 8, 77, 64), (2, 1, 50, 32)],
    ids=["vit16", "text", "vit32-small-head"],
)
def test_matches_xla(b, h, n, dh):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, n, dh)).astype(np.float32)) for _ in range(3)
    )
    out = flash_attention(q, k, v, interpret=True)
    expected = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_causal_mask():
    rng = np.random.default_rng(1)
    n = 77
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 2, n, 64)).astype(np.float32))
        for _ in range(3)
    )
    mask = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)
    out = flash_attention(q, k, v, mask, interpret=True)
    expected = _xla_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_padding_does_not_leak():
    # position i of the output must not depend on values beyond seq length
    rng = np.random.default_rng(2)
    n = 100  # pads to 128
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 1, n, 64)).astype(np.float32))
        for _ in range(3)
    )
    out = flash_attention(q, k, v, interpret=True)
    expected = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_model_integration_parity(monkeypatch):
    """encode_image with the Pallas path forced must match the XLA path."""
    import clip_gp_tpu.ops.flash_attention as fa
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    baseline = np.asarray(clip_model.encode_image(params, arch, images))
    monkeypatch.setattr(fa, "use_flash", lambda: True)
    flash_out = np.asarray(clip_model.encode_image(params, arch, images))
    np.testing.assert_allclose(flash_out, baseline, atol=5e-5)


def test_fused_text_tower_parity(monkeypatch):
    """Fused path must match XLA for the causal text tower too."""
    import clip_gp_tpu.ops.flash_attention as fa
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    tokens = jnp.asarray(
        np.concatenate(
            [np.array([[49406, 320, 2368, 49407]]), np.zeros((1, 73))], axis=1
        ).astype(np.int32)
    )
    baseline_txt = np.asarray(clip_model.encode_text(params, arch, tokens))
    monkeypatch.setattr(fa, "use_flash", lambda: True)
    flash_txt = np.asarray(clip_model.encode_text(params, arch, tokens))
    np.testing.assert_allclose(flash_txt, baseline_txt, atol=5e-5)


# ----------------------------------------------------------------------
# differentiability: Pallas forward + XLA-math custom VJP
# ----------------------------------------------------------------------

def test_fused_block_grads_match_xla_reference():
    """grad through fused_attention_block must equal grad of the XLA math
    (the custom VJP differentiates the reference implementation)."""
    from clip_gp_tpu.ops.flash_attention import (
        _xla_attention_block,
        fused_attention_block,
    )

    rng = np.random.default_rng(0)
    b, n, d, heads = 2, 10, 32, 4
    h = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    w_qkv = jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.05)
    b_qkv = jnp.asarray(rng.normal(size=(3 * d,)).astype(np.float32) * 0.05)
    w_out = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05)
    b_out = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.05)
    mask = jnp.triu(jnp.full((n, n), -1e9, dtype=jnp.float32), k=1)

    def loss_fused(args):
        h, wq, bq, wo, bo = args
        out = fused_attention_block(h, wq, bq, wo, bo, heads, mask,
                                    interpret=True)
        return jnp.sum(out**2)

    def loss_ref(args):
        h, wq, bq, wo, bo = args
        out = _xla_attention_block(h, wq, bq, wo, bo, heads, mask)
        return jnp.sum(out**2)

    args = (h, w_qkv, b_qkv, w_out, b_out)
    g_fused = jax.grad(loss_fused)(args)
    g_ref = jax.grad(loss_ref)(args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_text_tower_grads_with_flash_enabled(monkeypatch):
    """CoOp/CoCoOp differentiate through the text tower; with the Pallas path
    forced (the TPU default) grads must exist and be finite — round 1 shipped
    a forward-only kernel that raised under jax.grad."""
    import clip_gp_tpu.ops.flash_attention as fa
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    monkeypatch.setattr(fa, "use_flash", lambda: True)
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    rng = np.random.default_rng(0)
    w = int(arch.transformer_width)
    embeds = jnp.asarray(rng.normal(size=(2, 77, w)).astype(np.float32) * 0.02)
    eot = jnp.asarray(np.array([7, 7], dtype=np.int32))

    def loss(embeds):
        feats = clip_model.text_features_from_embeddings(
            params, arch, embeds, eot
        )
        return jnp.sum(feats**2)

    g = jax.grad(loss)(embeds)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_fused_ln_mlp_parity_and_grads():
    """fused_ln_mlp (interpret mode) must match the XLA reference in both
    values and gradients (custom VJP differentiates the XLA math)."""
    from clip_gp_tpu.ops.flash_attention import _xla_ln_mlp, fused_ln_mlp

    rng = np.random.default_rng(0)
    b, n, d, h = 2, 9, 32, 128
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=(d,)).astype(np.float32))
    w_fc = jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.1)
    b_fc = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1)
    w_pr = jnp.asarray(rng.normal(size=(h, d)).astype(np.float32) * 0.1)
    b_pr = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)

    out = fused_ln_mlp(x, g, bias, w_fc, b_fc, w_pr, b_pr, interpret=True)
    ref = _xla_ln_mlp(x, g, bias, w_fc, b_fc, w_pr, b_pr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(args):
        return jnp.sum(fused_ln_mlp(*args, interpret=True) ** 2)

    def loss_ref(args):
        return jnp.sum(_xla_ln_mlp(*args) ** 2)

    args = (x, g, bias, w_fc, b_fc, w_pr, b_pr)
    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------
# Pallas backward kernels (round 3): recompute-based VJPs
# ----------------------------------------------------------------------

def _attn_inputs(b=3, n=11, d=32, heads=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=(d,)).astype(np.float32))
    w_qkv = jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.1)
    b_qkv = jnp.asarray(rng.normal(size=(3 * d,)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    b_out = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    mask = jnp.triu(jnp.full((n, n), -1e9, dtype=jnp.float32), k=1)
    return x, g, bias, w_qkv, b_qkv, w_out, b_out, mask, heads


@pytest.mark.parametrize("mode", ["pallas", "xla"])
def test_ln_attention_block_grads_pallas_vs_xla(monkeypatch, mode):
    """The Pallas backward kernel (recompute LN/qkv/softmax in VMEM) must
    produce the same gradients as differentiating the XLA reference —
    every input: x, ln scale/bias, w_qkv, b_qkv, w_out, b_out. Odd batch
    (pads to the 2-batch tile) and n=11 (pads to sublane 16) exercise the
    zero-padded-gradient masking."""
    import clip_gp_tpu.ops.flash_attention as fa

    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", mode)
    (x, g, bias, w_qkv, b_qkv, w_out, b_out, mask, heads) = _attn_inputs()

    def loss_fused(args):
        out = fa.fused_ln_attention_block(*args, heads, mask, interpret=True)
        return jnp.sum(out**2) + jnp.sum(out[:, 0] * 0.3)

    def loss_ref(args):
        out = fa._xla_ln_attention_block(*args, heads, mask)
        return jnp.sum(out**2) + jnp.sum(out[:, 0] * 0.3)

    args = (x, g, bias, w_qkv, b_qkv, w_out, b_out)
    vf, gf = jax.value_and_grad(loss_fused)(args)
    vr, gr = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["pallas", "xla"])
def test_ln_mlp_grads_pallas_vs_xla(monkeypatch, mode):
    """Same contract for the LN+MLP backward kernel (the [T,4D] hidden is
    recomputed in VMEM); ragged row count exercises the padded tail."""
    import clip_gp_tpu.ops.flash_attention as fa

    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", mode)
    rng = np.random.default_rng(1)
    b, n, d, h = 3, 9, 32, 128
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=(d,)).astype(np.float32))
    w_fc = jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.1)
    b_fc = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1)
    w_pr = jnp.asarray(rng.normal(size=(h, d)).astype(np.float32) * 0.1)
    b_pr = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)

    def loss_fused(args):
        return jnp.sum(fa.fused_ln_mlp(*args, interpret=True) ** 2)

    def loss_ref(args):
        return jnp.sum(fa._xla_ln_mlp(*args) ** 2)

    args = (x, g, bias, w_fc, b_fc, w_pr, b_pr)
    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_text_tower_grads_pallas_vjp_match_xla_vjp(monkeypatch):
    """End-to-end through the remat'd text tower: grads of a CoOp-shaped
    loss w.r.t. the prompt embeddings AND the tower weights must agree
    between the Pallas VJP kernels and the XLA-math VJP."""
    import clip_gp_tpu.ops.flash_attention as fa
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    monkeypatch.setattr(fa, "use_flash", lambda: True)
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    rng = np.random.default_rng(0)
    w = int(arch.transformer_width)
    embeds = jnp.asarray(rng.normal(size=(2, 77, w)).astype(np.float32) * 0.02)
    eot = jnp.asarray(np.array([7, 7], dtype=np.int32))
    tower = {k: params[k] for k in
             ("pos_embed", "transformer", "ln_final", "text_projection")}

    def loss(embeds, tower):
        feats = clip_model.text_features_from_embeddings(
            tower, arch, embeds, eot
        )
        return jnp.sum(feats**2)

    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", "pallas")
    gp_e, gp_t = jax.grad(loss, argnums=(0, 1))(embeds, tower)
    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", "xla")
    gx_e, gx_t = jax.grad(loss, argnums=(0, 1))(embeds, tower)
    np.testing.assert_allclose(np.asarray(gp_e), np.asarray(gx_e),
                               rtol=1e-4, atol=1e-5)
    for (ka, a), (kb, b_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gp_t), key=lambda e: str(e[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gx_t), key=lambda e: str(e[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=2e-5, err_msg=str(ka))


def test_flash_for_grad_default_and_override(monkeypatch):
    """Differentiated tower paths default to plain XLA (measured fastest:
    159.5 ms vs 181.6 ms/step for both fused VJPs on the CoOp group step —
    bench_fused_vjp.py); CLIP_GP_TPU_FUSED_VJP=pallas|xla opts the fused
    path back in, and the flag is ignored entirely when flash is off."""
    import clip_gp_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "use_flash", lambda: True)
    monkeypatch.delenv("CLIP_GP_TPU_FUSED_VJP", raising=False)
    assert fa.flash_for_grad() is False
    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", "pallas")
    assert fa.flash_for_grad() is True
    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", "xla")
    assert fa.flash_for_grad() is True
    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", "auto")
    assert fa.flash_for_grad() is False
    monkeypatch.setattr(fa, "use_flash", lambda: False)
    monkeypatch.setenv("CLIP_GP_TPU_FUSED_VJP", "pallas")
    assert fa.flash_for_grad() is False


def test_text_tower_flash_flag_parity(monkeypatch):
    """flash=False must route the tower to plain XLA math even when flash is
    globally on, and agree numerically with the fused tower (the two paths
    share fp32 LN/softmax semantics)."""
    import clip_gp_tpu.ops.flash_attention as fa
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    rng = np.random.default_rng(3)
    w = int(arch.transformer_width)
    embeds = jnp.asarray(rng.normal(size=(2, 77, w)).astype(np.float32) * 0.02)
    eot = jnp.asarray(np.array([7, 9], dtype=np.int32))

    monkeypatch.setattr(fa, "use_flash", lambda: False)
    ref = clip_model.text_features_from_embeddings(params, arch, embeds, eot)

    monkeypatch.setattr(fa, "use_flash", lambda: True)
    off = clip_model.text_features_from_embeddings(
        params, arch, embeds, eot, flash=False
    )
    # flash=False under a flash-on default must be EXACTLY the XLA program
    np.testing.assert_array_equal(np.asarray(off), np.asarray(ref))

    on = clip_model.text_features_from_embeddings(
        params, arch, embeds, eot, flash=True
    )
    np.testing.assert_allclose(np.asarray(on), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
