"""Opt-in int8 inference path for the CLIP towers (serving mode).

v5e-class TPUs run int8 matmuls on the MXU at ~2x the bf16 rate. The encoders
are frozen in every CLIP-GP method (ref: trainers/adapter.py:886-926 — features
are extracted once and cached), so inference-time quantization error cannot
compound into training: it only perturbs the cached features. This module
provides post-training quantization with the standard recipe that keeps ViT
accuracy loss negligible:

- **weights**: symmetric per-output-channel int8, quantized once up front;
- **activations**: symmetric per-token dynamic int8 (scales computed on the
  fly from each row's absmax — no calibration data needed);
- **everything else** (LayerNorm, softmax, GELU, residuals, attention core,
  patch embed, pos embed) stays in bf16/fp32 exactly as the bf16 path.

Only the four projection matmuls per transformer block (qkv, out, fc, proj) —
~85% of encode FLOPs on ViT-B/16 — run int8xint8->int32 on the MXU.

This is NOT the default: parity guarantees (BASELINE.md, top-1/ECE within
0.3%) are stated for the bf16 path. Enable per call via
``encode_image_q8`` / the ``MODEL.INT8_INFERENCE`` config knob.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from clip_gp_tpu.models import clip_model
from clip_gp_tpu.models.clip_model import (
    ClipArchitecture,
    layer_norm,
    multi_head_attention,
    quick_gelu,
)

Params = Dict[str, Any]


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of ``w [..., I, O]``.

    The reduction runs over the input (contraction) axis, giving one scale per
    output channel; leading axes (e.g. the stacked-blocks layer axis) are
    preserved so scanned transformer weights quantize in one call.
    """
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale[..., 0, :]}  # scale: [..., O]


def _dynamic_quantize(x: jnp.ndarray):
    """Per-token (last-axis) symmetric int8: x [..., I] -> (int8, f32 scale).

    Single shared recipe with the fused kernels (ops/int8_block.py) — the XLA
    and Pallas towers must quantize activations identically."""
    from clip_gp_tpu.ops.int8_block import quantize_rows

    return quantize_rows(x)


def int8_linear(
    x: jnp.ndarray,
    wq: Dict[str, jnp.ndarray],
    b: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """``x @ w + b`` with int8 MXU matmul and f32 rescale.

    x: [..., I] float; wq: {"q": [I, O] int8, "scale": [O] f32}.
    """
    xq, x_scale = _dynamic_quantize(x)
    acc = jax.lax.dot_general(
        xq,
        wq["q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * wq["scale"]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_visual(params: Params, arch: ClipArchitecture) -> Params:
    """Quantize the ViT visual tower's block matmuls once, up front.

    Returns a params pytree shaped like ``params["visual"]`` but with each
    block matmul replaced by {"q", "scale"}; the non-matmul leaves (conv stem,
    LN, pos/class embeds, final proj) are kept as-is. Jit-safe (pure).
    """
    assert arch.is_vit, "int8 inference path currently covers the ViT towers"
    visual = params["visual"]
    blocks = visual["transformer"]["blocks"]
    qblocks = {
        "ln_1": blocks["ln_1"],
        "ln_2": blocks["ln_2"],
        "attn": {
            "w_qkv": quantize_weight(blocks["attn"]["w_qkv"]),
            "b_qkv": blocks["attn"]["b_qkv"],
            "w_out": quantize_weight(blocks["attn"]["w_out"]),
            "b_out": blocks["attn"]["b_out"],
        },
        "mlp": {
            "c_fc": {
                "w": quantize_weight(blocks["mlp"]["c_fc"]["w"]),
                "b": blocks["mlp"]["c_fc"]["b"],
            },
            "c_proj": {
                "w": quantize_weight(blocks["mlp"]["c_proj"]["w"]),
                "b": blocks["mlp"]["c_proj"]["b"],
            },
        },
    }
    out = dict(visual)
    out["transformer"] = {"blocks": qblocks}
    return out


def _q8_attention_block(
    p: Params, x: jnp.ndarray, num_heads: int
) -> jnp.ndarray:
    """Pre-LN residual block with int8 projection matmuls (bf16 attention core,
    fp32 LayerNorm/softmax — same numerics guards as the bf16 path)."""
    a = p["attn"]
    h = layer_norm(p["ln_1"], x)
    qkv = int8_linear(h, a["w_qkv"], a["b_qkv"], out_dtype=x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = multi_head_attention(q, k, v, num_heads)
    x = x + int8_linear(attn, a["w_out"], a["b_out"], out_dtype=x.dtype)
    h = layer_norm(p["ln_2"], x)
    h = quick_gelu(int8_linear(h, p["mlp"]["c_fc"]["w"], p["mlp"]["c_fc"]["b"],
                               out_dtype=x.dtype))
    x = x + int8_linear(h, p["mlp"]["c_proj"]["w"], p["mlp"]["c_proj"]["b"],
                        out_dtype=x.dtype)
    return x


def _q8_fused_block(
    p: Params, x: jnp.ndarray, num_heads: int, interpret: bool = False
) -> jnp.ndarray:
    """Same math as :func:`_q8_attention_block` but as two Pallas kernels with
    the int8 matmuls on the MXU (ops/int8_block.py) — activations quantize
    in-kernel right after the fp32 LN/GELU and never round-trip HBM."""
    from clip_gp_tpu.ops.int8_block import q8_ln_attention_block, q8_ln_mlp

    a = p["attn"]
    x = q8_ln_attention_block(
        x,
        p["ln_1"]["scale"],
        p["ln_1"]["bias"],
        a["w_qkv"]["q"],
        a["w_qkv"]["scale"],
        a["b_qkv"],
        a["w_out"]["q"],
        a["w_out"]["scale"],
        a["b_out"],
        num_heads,
        interpret=interpret,
    )
    return q8_ln_mlp(
        x,
        p["ln_2"]["scale"],
        p["ln_2"]["bias"],
        p["mlp"]["c_fc"]["w"]["q"],
        p["mlp"]["c_fc"]["w"]["scale"],
        p["mlp"]["c_fc"]["b"],
        p["mlp"]["c_proj"]["w"]["q"],
        p["mlp"]["c_proj"]["w"]["scale"],
        p["mlp"]["c_proj"]["b"],
        interpret=interpret,
    )


def encode_image_q8(
    qvisual: Params,
    arch: ClipArchitecture,
    images: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    use_fused: Optional[bool] = None,
) -> jnp.ndarray:
    """ViT image encode with int8 block matmuls.

    ``qvisual`` comes from :func:`quantize_visual`. The stem/epilogue (conv
    patch embed, class/pos embeds, ln_pre/ln_post, final proj — <2% of FLOPs,
    bf16) is the SHARED ``clip_model.vision_transformer``, with only the
    residual block body overridden — so bf16-tower fixes propagate here by
    construction. ``use_fused=None`` follows ``flash_attention.use_flash()``:
    on TPU the blocks run as int8 Pallas kernels (ops/int8_block.py),
    elsewhere as the XLA int8 path.
    """
    from clip_gp_tpu.ops.flash_attention import use_flash

    if use_fused is None:
        use_fused = use_flash()
    block = _q8_fused_block if use_fused else _q8_attention_block
    x = clip_model.vision_transformer(
        qvisual, arch, images.astype(compute_dtype), block_fn=block
    )
    return x.astype(jnp.float32)


@partial(jax.jit, static_argnames=("arch",))
def quantize_visual_jit(params, arch):
    return quantize_visual(params, arch)


@partial(jax.jit, static_argnames=("arch",))
def encode_image_q8_jit(qvisual, arch, images):
    return encode_image_q8(qvisual, arch, images)
