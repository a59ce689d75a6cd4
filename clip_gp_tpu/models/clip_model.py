"""CLIP encoders as pure JAX functions over parameter pytrees.

Covers both OpenAI CLIP tower families (ref: clip/model.py):
- ``ModifiedResNet`` (RN50/RN101/RN50x4/RN50x16): 3-conv stem, anti-aliased
  strided bottlenecks, attention pooling head;
- ``VisionTransformer`` (ViT-B/32, ViT-B/16) and the causal text transformer.

TPU-native design choices (not a torch translation):
- NHWC layout end-to-end for convolutions (XLA's preferred TPU layout);
- frozen BatchNorm folded into per-channel scale/bias at load time — each
  conv+BN pair becomes one fused multiply-add that XLA merges into the conv;
- attention pooling queries only the mean token instead of materializing full
  (HW+1)² attention (identical output to taking row 0 of full attention);
- LayerNorm/softmax computed in fp32 regardless of ``compute_dtype`` so bf16
  activations stay numerically safe (mirrors the fp16-safe LayerNorm at
  ref: clip/model.py:158-164);
- everything is shape-static and jit-compiled once per (arch, batch) pair.

Params are nested dicts of jnp arrays; see ``clip_loader`` for initialization
and checkpoint ingestion.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ClipArchitecture:
    """Static architecture description (ref: clip/model.py:278-331)."""

    name: str
    embed_dim: int
    image_resolution: int
    vision_layers: Union[Tuple[int, int, int, int], int]
    vision_width: int
    vision_patch_size: Optional[int]
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64


ARCHITECTURES: Dict[str, ClipArchitecture] = {
    "RN50": ClipArchitecture("RN50", 1024, 224, (3, 4, 6, 3), 64, None,
                             transformer_width=512, transformer_heads=8),
    "RN101": ClipArchitecture("RN101", 512, 224, (3, 4, 23, 3), 64, None,
                              transformer_width=512, transformer_heads=8),
    "RN50x4": ClipArchitecture("RN50x4", 640, 288, (4, 6, 10, 6), 80, None,
                               transformer_width=640, transformer_heads=10),
    "RN50x16": ClipArchitecture("RN50x16", 768, 384, (6, 8, 18, 8), 96, None,
                                transformer_width=768, transformer_heads=12),
    "ViT-B/32": ClipArchitecture("ViT-B/32", 512, 224, 12, 768, 32,
                                 transformer_width=512, transformer_heads=8),
    "ViT-B/16": ClipArchitecture("ViT-B/16", 512, 224, 12, 768, 16,
                                 transformer_width=512, transformer_heads=8),
    # tiny towers for CPU tests and CI — not real CLIP checkpoints
    "TEST-ViT": ClipArchitecture("TEST-ViT", 32, 32, 2, 64, 8,
                                 transformer_width=64, transformer_heads=1,
                                 transformer_layers=2),
    "TEST-RN": ClipArchitecture("TEST-RN", 32, 64, (1, 1, 1, 1), 8, None,
                                transformer_width=64, transformer_heads=1,
                                transformer_layers=2),
}


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """fp32 LayerNorm with cast back to the input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """NHWC conv with HWIO kernel; folded scale/bias applied when present."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "scale" in p:  # folded frozen BatchNorm
        y = y * p["scale"].astype(y.dtype) + p["bias"].astype(y.dtype)
    elif "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def avg_pool(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Non-overlapping NHWC average pool."""
    y = jax.lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        jax.lax.add,
        (1, window, window, 1),
        (1, window, window, 1),
        "VALID",
    )
    return y / (window * window)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched MHA core, pure XLA. q: [B,Nq,D], k/v: [B,Nk,D]; fp32 softmax.

    This is the fallback/attention-pool path only: on TPU the transformer
    blocks dispatch at the BLOCK level to the fused Pallas kernels
    (``fused_ln_attention_block`` + ``fused_ln_mlp`` in
    ``residual_attention_block``), which never reach this function.
    """
    b, nq, d = q.shape
    nk = k.shape[1]
    hd = d // num_heads
    q = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)


def attention_block(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Pre-LN residual attention block (ref: clip/model.py:172-193).

    ``p['attn']`` holds the fused in-projection ``w_qkv [D,3D]`` / ``b_qkv``
    and out-projection, matching torch MultiheadAttention packing.
    ``flash=None`` defers to ``use_flash()``; differentiated call sites pass
    ``flash_attention.flash_for_grad()`` (plain XLA + standard AD measured
    fastest for the backward — see that docstring).
    """
    a = p["attn"]
    from clip_gp_tpu.ops.flash_attention import (
        fused_ln_attention_block,
        fused_ln_mlp,
        use_flash,
    )

    if use_flash() if flash is None else flash:
        # whole pre-LN attention sub-block (ln_1 + qkv proj + MHA + out proj
        # + residual) as one Pallas kernel — the pre-LN activation, q/k/v,
        # and the score matrix never leave VMEM
        x = fused_ln_attention_block(
            x,
            p["ln_1"]["scale"],
            p["ln_1"]["bias"],
            a["w_qkv"].astype(x.dtype),
            a["b_qkv"].astype(x.dtype),
            a["w_out"].astype(x.dtype),
            a["b_out"].astype(x.dtype),
            num_heads,
            mask,
        )
        # ln_2 + MLP as one Pallas kernel — the [B·N, 4D] hidden activation
        # stays in VMEM between the two MLP matmuls (measured 3437 vs 3402
        # imgs/s e2e ViT-B/16 with the XLA ln+MLP on v5e)
        return fused_ln_mlp(
            x,
            p["ln_2"]["scale"],
            p["ln_2"]["bias"],
            p["mlp"]["c_fc"]["w"],
            p["mlp"]["c_fc"]["b"],
            p["mlp"]["c_proj"]["w"],
            p["mlp"]["c_proj"]["b"],
        )
    h = layer_norm(p["ln_1"], x)
    qkv = h @ a["w_qkv"].astype(x.dtype) + a["b_qkv"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = multi_head_attention(q, k, v, num_heads, mask)
    x = x + attn @ a["w_out"].astype(x.dtype) + a["b_out"].astype(x.dtype)
    h = layer_norm(p["ln_2"], x)
    h = quick_gelu(linear(p["mlp"]["c_fc"], h))
    x = x + linear(p["mlp"]["c_proj"], h)
    return x


def transformer(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Stack of residual blocks, scanned so XLA compiles the block body once.

    The block body is rematerialized (``jax.checkpoint``): backward through
    the towers (CoOp/CoCoOp prompt grads) saves only per-block inputs instead
    of every in-block activation — without it, a CoCoOp step at B·K=3200
    prompts tries to keep 24 GB of MLP hiddens (measured OOM on a 16 GB v5e).
    Pure-forward paths (frozen feature extraction) are unaffected.
    """
    blocks = p["blocks"]

    def block_fn(block_params, x, mask):
        return attention_block(block_params, x, num_heads, mask, flash=flash)

    block_remat = jax.checkpoint(block_fn)

    def body(x, block_params):
        return block_remat(block_params, x, mask), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


# ---------------------------------------------------------------------------
# vision towers
# ---------------------------------------------------------------------------

def bottleneck(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Anti-aliased bottleneck (ref: clip/model.py:10-53); BN folded into convs."""
    out = jax.nn.relu(conv2d(p["conv1"], x))
    out = jax.nn.relu(conv2d(p["conv2"], out, padding=1))
    if stride > 1:
        out = avg_pool(out, stride)
    out = conv2d(p["conv3"], out)
    if "downsample" in p:
        identity = x if stride == 1 else avg_pool(x, stride)
        identity = conv2d(p["downsample"], identity)
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Attention pooling: mean token queries all spatial tokens
    (ref: clip/model.py:56-90, computing only output row 0)."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean_tok = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + p["pos_embed"].astype(tokens.dtype)
    q = linear(p["q_proj"], tokens[:, :1])
    k = linear(p["k_proj"], tokens)
    v = linear(p["v_proj"], tokens)
    pooled = multi_head_attention(q, k, v, num_heads)
    return linear(p["c_proj"], pooled)[:, 0]


def modified_resnet(p: Params, arch: ClipArchitecture, x: jnp.ndarray) -> jnp.ndarray:
    """ModifiedResNet forward; input NHWC [B,R,R,3] (ref: clip/model.py:93-155)."""
    x = jax.nn.relu(conv2d(p["conv1"], x, stride=2, padding=1))
    x = jax.nn.relu(conv2d(p["conv2"], x, padding=1))
    x = jax.nn.relu(conv2d(p["conv3"], x, padding=1))
    x = avg_pool(x, 2)
    for li, n_blocks in enumerate(arch.vision_layers):
        layer = p[f"layer{li + 1}"]
        stride = 1 if li == 0 else 2
        for bi in range(n_blocks):
            x = bottleneck(layer[bi], x, stride if bi == 0 else 1)
    return attention_pool(p["attnpool"], x, arch.vision_heads)


def vision_transformer(
    p: Params,
    arch: ClipArchitecture,
    x: jnp.ndarray,
    block_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """ViT forward; input NHWC [B,R,R,3] (ref: clip/model.py:207-262).

    ``block_fn(block_params, x, num_heads)`` overrides the residual-block
    body while sharing the stem/epilogue (conv patch embed, class/pos
    embeds, ln_pre/ln_post, projection) — the int8 inference tower
    (models/quantized.py) plugs in here so any fix to the shared parts
    propagates to it by construction. Default: the bf16 ``attention_block``
    stack with per-block remat (see ``transformer``)."""
    ps = arch.vision_patch_size
    x = conv2d(p["conv1"], x, stride=ps)  # [B, grid, grid, W]
    b, gh, gw, w = x.shape
    x = x.reshape(b, gh * gw, w)
    cls = jnp.broadcast_to(p["class_embed"].astype(x.dtype), (b, 1, w))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(x.dtype)
    x = layer_norm(p["ln_pre"], x)
    if block_fn is None:
        x = transformer(p["transformer"], x, arch.vision_heads)
    else:
        def body(carry, block_params):
            return block_fn(block_params, carry, arch.vision_heads), None

        x, _ = jax.lax.scan(body, x, p["transformer"]["blocks"])
    x = layer_norm(p["ln_post"], x[:, 0])
    return x @ p["proj"].astype(x.dtype)


def encode_image(
    params: Params,
    arch: ClipArchitecture,
    images: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """images: NHWC [B,R,R,3] float — returns [B, embed_dim] features."""
    images = images.astype(compute_dtype)
    visual = params["visual"]
    if arch.is_vit:
        feats = vision_transformer(visual, arch, images)
    else:
        feats = modified_resnet(visual, arch, images)
    return feats.astype(jnp.float32)


def encode_image_all_layers(
    params: Params,
    arch: ClipArchitecture,
    images: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Per-layer projected CLS features — the ViT debug mode
    (ref: clip/model.py:225-274, ``all_layer_outputs=True``): after every
    block, ln_post + proj applied to the CLS token. Returns
    [layers, B, embed_dim] (the reference returns a Python list; here the
    block scan's ys give the stacked equivalent in one compiled program)."""
    assert arch.is_vit, "all-layer outputs are defined for the ViT tower"
    p = params["visual"]
    x = images.astype(compute_dtype)
    ps = arch.vision_patch_size
    x = conv2d(p["conv1"], x, stride=ps)
    b, gh, gw, w = x.shape
    x = x.reshape(b, gh * gw, w)
    cls = jnp.broadcast_to(p["class_embed"].astype(x.dtype), (b, 1, w))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(x.dtype)
    x = layer_norm(p["ln_pre"], x)
    num_heads = arch.vision_heads

    def body(x, block_params):
        x = attention_block(block_params, x, num_heads, None)
        out = layer_norm(p["ln_post"], x[:, 0]) @ p["proj"].astype(x.dtype)
        return x, out.astype(jnp.float32)

    _, outs = jax.lax.scan(body, x, p["transformer"]["blocks"])
    return outs


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def causal_mask(n: int) -> jnp.ndarray:
    return jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)


def prompt_tower_dtype():
    """Compute dtype for the DIFFERENTIATED prompt tower (CoOp/CoCoOp
    train+eval text encodes). ``CLIP_GP_TPU_PROMPT_TOWER_DTYPE``:
    ``float32`` (default — reproduces the reference's fp32 tower within the
    executed-golden tolerances) or ``bf16``/``bfloat16`` (MXU-native mixed
    precision: bf16 matmuls with fp32 LN/softmax and fp32 master params —
    the same discipline as every frozen encode path). Read at trace time.
    """
    import os

    v = os.environ.get("CLIP_GP_TPU_PROMPT_TOWER_DTYPE", "float32").lower()
    return jnp.bfloat16 if v in ("bf16", "bfloat16") else jnp.float32


def text_features_from_embeddings(
    params: Params,
    arch: ClipArchitecture,
    token_embeds: jnp.ndarray,
    eot_index: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
    flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Text transformer over precomputed token embeddings [B,L,W].

    Split out from `encode_text` because prompt learners (CoOp/CoCoOp) inject
    learned context vectors at the embedding level (ref: utils/trainer.py:178-194).
    ``eot_index`` [B] selects the end-of-text position for pooling.
    ``flash=None`` defers to ``use_flash()``; prompt learners that
    differentiate through this tower pass ``flash_for_grad()``.
    """
    x = token_embeds.astype(compute_dtype)
    # slice to the (possibly trimmed) sequence length: prompt learners trim
    # positions past every EOT (methods/coop.py trim_prompt_parts) — the
    # causal mask makes the pooled features exact either way
    x = x + params["pos_embed"][: x.shape[1]].astype(x.dtype)
    mask = causal_mask(x.shape[1])
    x = transformer(params["transformer"], x, arch.transformer_heads, mask,
                    flash=flash)
    x = layer_norm(params["ln_final"], x)
    pooled = jnp.take_along_axis(x, eot_index[:, None, None], axis=1)[:, 0]
    return (pooled @ params["text_projection"].astype(pooled.dtype)).astype(jnp.float32)


def encode_text(
    params: Params,
    arch: ClipArchitecture,
    tokens: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """tokens: int [B, context_length] — returns [B, embed_dim] features
    (ref: clip/model.py:378-391)."""
    embeds = params["token_embedding"][tokens]
    eot_index = tokens.argmax(axis=-1)  # EOT has the highest token id
    return text_features_from_embeddings(
        params, arch, embeds, eot_index, compute_dtype
    )


def clip_forward(
    params: Params,
    arch: ClipArchitecture,
    images: jnp.ndarray,
    tokens: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contrastive logits (ref: clip/model.py:408-422)."""
    img = encode_image(params, arch, images, compute_dtype)
    txt = encode_text(params, arch, tokens, compute_dtype)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


@partial(jax.jit, static_argnames=("arch", "compute_dtype"))
def encode_image_jit(params, arch, images, compute_dtype=jnp.float32):
    return encode_image(params, arch, images, compute_dtype)


@partial(jax.jit, static_argnames=("arch", "compute_dtype"))
def encode_text_jit(params, arch, tokens, compute_dtype=jnp.float32):
    return encode_text(params, arch, tokens, compute_dtype)
