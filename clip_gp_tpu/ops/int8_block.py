"""Int8 fused transformer-block Pallas kernels (inference only).

The bf16 fused kernels (ops/flash_attention.py) keep the pre-LN activation,
q/k/v, the score matrix, and the MLP hidden in VMEM; these variants
additionally run the four projection matmuls (qkv, out, c_fc, c_proj) as
int8×int8→int32 on the MXU — measured 1.68× the bf16 matmul rate on this
chip (scripts/bench_mxu_dtypes.py: 247.6 TOPS vs 147.4 TFLOPs at 8192³).
Without fusion the int8 win is eaten by losing the Pallas block kernels
(scripts/bench_int8_encode.py: naive XLA-int8 tower = 0.82× on ViT-B/16);
quantizing *inside* the fused kernel keeps both.

Quantization recipe shares models/quantized.py's scheme (per-output-channel
symmetric int8 weights quantized once up front, per-row dynamic symmetric
int8 activations via `quantize_rows`, fp32 rescale of the int32
accumulator), but the two towers are NOT bit-identical: this kernel
quantizes the attention output per-head (one scale per [N, dh] row-slice)
where the XLA path quantizes the merged [*, D] row, and it quantizes the
fp32 LN/GELU output directly where the XLA path quantizes after the bf16
cast. Features differ at the ~1e-4-cosine level (tests/test_quantized.py),
which is why the feature cache keys the two paths separately (int8 vs
int8xla) — never alias them. Attention core (scores, softmax, probs@v)
stays bf16/fp32.

Inference-only by design: the frozen-tower feature extraction never
differentiates, and the bf16 path keeps the parity guarantees — so there is
no custom VJP here, and `jax.grad` through these kernels is a loud error
rather than silently-wrong numerics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_gp_tpu.ops.flash_attention import _round_up

_EPS = 1e-12


def quantize_rows(x: jnp.ndarray):
    """Per-row (last-axis) symmetric int8 quantization on the VPU:
    float [..., I] -> (int8 [..., I], f32 scale [..., 1]).

    The shared activation-quantization recipe of the int8 path — used
    in-kernel here and by the XLA int8 fallback
    (models/quantized.int8_linear). Note the towers still differ on WHAT
    they feed it (per-head vs merged attention rows, fp32 vs bf16-cast LN
    output — see the module docstring), so sharing this function aligns the
    recipe, not the bits."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, _EPS)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# ln_1 + qkv + MHA + out-proj + residual, int8 projections
# ---------------------------------------------------------------------------

def _q8_ln_block_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                        wout_ref, sout_ref, bout_ref, mask_ref, o_ref, acc):
    x = x_ref[...]                              # [BT, N, D] bf16
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[...] + b_ref[...]

    hq, hs = quantize_rows(h)
    qkv = jax.lax.dot_general(                  # int8 wide qkv matmul, MXU
        hq, wqkv_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = (qkv.astype(jnp.float32) * hs * sqkv_ref[...]
           + bqkv_ref[...]).astype(x.dtype)     # [BT, N, 3D]

    n_heads = wout_ref.shape[0]
    dh = wout_ref.shape[1]
    d = x.shape[-1]
    acc[...] = jnp.zeros_like(acc)
    for head in range(n_heads):
        q = qkv[:, :, head * dh : (head + 1) * dh] * (1.0 / (dh**0.5))
        k = qkv[:, :, d + head * dh : d + (head + 1) * dh]
        v = qkv[:, :, 2 * d + head * dh : 2 * d + (head + 1) * dh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = scores + mask_ref[...][None]
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        weights = jnp.exp(scores)
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
        out_h = jax.lax.dot_general(
            weights.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                       # [BT, N, dh] f32
        # w_out was quantized over its FULL [D] contraction axis (scale is
        # per output channel), so slicing its rows per head keeps the
        # dequantization exact: each head contributes q_h·x_h * scale[col]
        oq, os = quantize_rows(out_h)
        part = jax.lax.dot_general(
            oq, wout_ref[head],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc[...] += part.astype(jnp.float32) * os * sout_ref[...]
    o_ref[...] = (x32 + acc[...] + bout_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def q8_ln_attention_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv_q: jnp.ndarray,      # int8 [D, 3D]
    wqkv_scale: jnp.ndarray,  # f32  [3D]
    b_qkv: jnp.ndarray,
    wout_q: jnp.ndarray,      # int8 [D, D]
    wout_scale: jnp.ndarray,  # f32  [D]
    b_out: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + MHA(LN(x)) with int8 qkv/out projections; layout/padding identical
    to flash_attention._fused_ln_block_pallas."""
    b, n, d = x.shape
    dh = d // num_heads
    interpret = interpret or jax.default_backend() != "tpu"
    n_pad = _round_up(n, 8)  # sublane-only padding (see bf16 kernel notes)

    full_mask = jnp.zeros((n_pad, n_pad), dtype=jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:n, :n].set(mask.astype(jnp.float32))
    if n_pad != n:
        full_mask = full_mask.at[:, n:].set(-jnp.inf)

    wout_hm = wout_q.reshape(num_heads, dh, wout_q.shape[1])  # free view

    bt = 2
    b_pad = _round_up(b, bt)
    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _q8_ln_block_kernel,
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, dh, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, n_pad, d), jnp.float32)],
        interpret=interpret,
    )(
        xp,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        wqkv_q,
        wqkv_scale.astype(jnp.float32),
        b_qkv.astype(jnp.float32),
        wout_hm,
        wout_scale.astype(jnp.float32),
        b_out.astype(jnp.float32),
        full_mask,
    )
    return out[:b, :n]


# ---------------------------------------------------------------------------
# ln_2 + c_fc + QuickGELU + c_proj + residual, int8 matmuls
# ---------------------------------------------------------------------------

def _q8_mlp_kernel(x_ref, g_ref, b_ref, wfc_ref, sfc_ref, bfc_ref,
                   wpr_ref, spr_ref, bpr_ref, o_ref):
    x = x_ref[...]  # [T, D]
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[...] + b_ref[...]

    hq, hs = quantize_rows(h)
    hid = jax.lax.dot_general(
        hq, wfc_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    hid = hid.astype(jnp.float32) * hs * sfc_ref[...] + bfc_ref[...]
    hid = hid * jax.nn.sigmoid(1.702 * hid)  # QuickGELU, fp32 VPU

    gq, gs = quantize_rows(hid)
    out = jax.lax.dot_general(
        gq, wpr_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * gs * spr_ref[...] + bpr_ref[...]
    o_ref[...] = (x32 + out).astype(o_ref.dtype)


# single source of truth: the docstring below promises layout/padding
# identical to the bf16 kernel, so retuning the tile there retunes this too
from clip_gp_tpu.ops.flash_attention import MLP_ROW_TILE  # noqa: E402


@functools.partial(jax.jit, static_argnames=("interpret",))
def q8_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wfc_q: jnp.ndarray,      # int8 [D, H]
    wfc_scale: jnp.ndarray,  # f32  [H]
    b_fc: jnp.ndarray,
    wpr_q: jnp.ndarray,      # int8 [H, D]
    wpr_scale: jnp.ndarray,  # f32  [D]
    b_pr: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + MLP(LN(x)) with int8 matmuls and the hidden resident in VMEM;
    layout/padding identical to flash_attention._fused_ln_mlp_pallas."""
    b, n, d = x.shape
    hidden = wfc_q.shape[1]
    interpret = interpret or jax.default_backend() != "tpu"
    rows = b * n
    t = min(MLP_ROW_TILE, _round_up(rows, 8))
    rows_pad = _round_up(rows, t)
    xr = x.reshape(rows, d)
    if rows_pad != rows:
        xr = jnp.pad(xr, ((0, rows_pad - rows), (0, 0)))
    out = pl.pallas_call(
        _q8_mlp_kernel,
        grid=(rows_pad // t,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), x.dtype),
        interpret=interpret,
    )(
        xr,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        wfc_q,
        wfc_scale.astype(jnp.float32),
        b_fc.astype(jnp.float32),
        wpr_q,
        wpr_scale.astype(jnp.float32),
        b_pr.astype(jnp.float32),
    )
    return out[:rows].reshape(b, n, d)
