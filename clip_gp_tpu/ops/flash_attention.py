"""Pallas TPU attention kernel for the CLIP towers.

CLIP's sequences are short and fixed (197 ViT patches, 77 text tokens — ref:
clip/model.py:216, clip/clip.py:181), so the right TPU kernel is a
single-pass fused attention: each grid step loads one (batch·head)'s padded
Q/K/V tiles into VMEM, runs QKᵀ on the MXU, does a numerically-stable fp32
softmax on the VPU, and applies AV — no HBM round-trip for the [N,N] score
matrix and no online-softmax machinery (which pays off only when N²·4B
outgrows VMEM; 256²·4B = 256 KB does not).

The wrapper pads N to the 128-lane boundary, folds padding into the additive
mask, and slices the result. ``use_flash`` auto-selects: Pallas on TPU, plain
XLA elsewhere (also the fallback under ``CLIP_GP_TPU_DISABLE_FLASH=1``).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    """All heads of one batch element per program: the batched MXU dots
    amortize per-program overhead (measured 28% faster than XLA attention at
    ViT-B/16 shapes vs 4% slower for a 1-head-per-program grid)."""
    q = q_ref[0]  # [H, N, Dh] — pre-scaled by 1/sqrt(head dim) in the wrapper
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, N, N]
    scores = scores + mask_ref[...][None]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.exp(scores)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. q/k/v: [B, H, N, Dh]; optional additive mask [N, N].

    Returns [B, H, N, Dh] in q's dtype (softmax in fp32).

    NOTE: not on the shipped encode path — the product dispatches at the
    block level to ``fused_ln_attention_block``/``fused_ln_mlp`` (measured
    faster end-to-end). This standalone kernel and ``fused_attention_block``
    are retained as tested, simpler building blocks and as the benchmark
    lineage for that decision (tests/test_flash_attention.py covers both).
    """
    b, h, n, dh = q.shape
    # off-TPU (tests, CPU fallbacks) the kernel runs in interpreter mode
    interpret = interpret or jax.default_backend() != "tpu"
    n_pad = _round_up(n, LANE)
    # head dim stays unpadded: Mosaic tolerates sub-128 lane widths, and
    # explicit padding to 128 would double the QK^T contraction work
    dh_pad = dh

    full_mask = jnp.zeros((n_pad, n_pad), dtype=jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:n, :n].set(mask.astype(jnp.float32))
    if n_pad != n:  # padded keys must never receive attention weight
        full_mask = full_mask.at[:, n:].set(-jnp.inf)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, dh_pad - dh)))

    # scale by the TRUE head dim before padding (padding changes shape[-1])
    q = q * (1.0 / (dh**0.5))
    qp, kp, vp = pad(q), pad(k), pad(v)
    spec = pl.BlockSpec((1, h, n_pad, dh_pad), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _attention_kernel,
        grid=(b,),
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, dh_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, full_mask)
    return out[:, :, :n, :dh]


def use_flash() -> bool:
    """Default-ON for TPU: 3,568 vs 2,988 imgs/s ViT-B/16 encode on v5e for
    the full fused path vs XLA (dependency-chain protocol). The round-2
    recipe: ln_1 + wide-qkv + per-head attention + out-proj + residual in one
    kernel (fused_ln_attention_block), ln_2 + MLP in a second
    (fused_ln_mlp), tokens padded to the 8-sublane boundary only (197 -> 200,
    not 256 — 2.23 vs 2.58 ms/layer). Earlier layouts lost —
    per-(batch·head) grids to per-program overhead, per-head qkv tiles to
    MXU under-utilization (history in git). CLIP_GP_TPU_DISABLE_FLASH=1
    opts out."""
    if os.environ.get("CLIP_GP_TPU_DISABLE_FLASH") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

# ---------------------------------------------------------------------------
# fully fused attention sub-block: qkv projection + attention + out projection
# ---------------------------------------------------------------------------

def _qkv_heads_accumulate(h, wqkv_ref, bqkv_ref, wout_ref, mask_ref, acc):
    """Shared in-kernel math of both fused blocks: ONE wide qkv matmul (full
    MXU tiles), then per-head attention + out-projection accumulated into
    ``acc`` — q/k/v and the score matrix never leave VMEM. Plain traced code
    called from both kernels so their numerics cannot drift."""
    n_heads = wout_ref.shape[0]
    dh = wout_ref.shape[1]
    d = h.shape[-1]
    qkv = jax.lax.dot_general(          # [BT, N, 3D] in one wide matmul
        h, wqkv_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype) + bqkv_ref[...].astype(h.dtype)
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
        ).astype(h.dtype)
        acc[...] += jax.lax.dot_general(
            out_h, wout_ref[head],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _fused_block_kernel(h_ref, wqkv_ref, bqkv_ref, wout_ref, mask_ref, o_ref, acc):
    """One batch tile of the fused qkv+attention+out block. Measured 24%
    faster than XLA's fused qkv+attention+out at ViT-B/16 shapes on v5e
    (2.7 vs 3.55 ms per layer at batch 128)."""
    h = h_ref[...]                      # [BT, N, D]
    _qkv_heads_accumulate(h, wqkv_ref, bqkv_ref, wout_ref, mask_ref, acc)
    o_ref[...] = acc[...].astype(o_ref.dtype)


def _xla_attention_block(h, w_qkv, b_qkv, w_out, b_out, num_heads, mask):
    """XLA reference of the fused block (same math; used for parity tests and
    as the differentiated function in the custom VJP)."""
    b, n, d = h.shape
    dh = d // num_heads
    qkv = h @ w_qkv.astype(h.dtype) + b_qkv.astype(h.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(dh).astype(q.dtype)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
    return attn @ w_out.astype(h.dtype) + b_out.astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_block(h, w_qkv, b_qkv, w_out, b_out, mask, num_heads, interpret):
    return _fused_block_pallas(
        h, w_qkv, b_qkv, w_out, b_out, mask, num_heads, interpret
    )


def _fused_block_fwd(h, w_qkv, b_qkv, w_out, b_out, mask, num_heads, interpret):
    # Under differentiation, run the XLA forward instead of Pallas: the
    # backward re-derives the VJP from the XLA math anyway, so a Pallas
    # forward here would be strictly extra work (measured: CoOp-style text
    # tower steps 700 ms XLA-only vs 1025 ms Pallas-forward on v5e).
    # Inference-only paths (frozen feature extraction — the hot loop) never
    # hit this rule and keep the fast kernel.
    out = _xla_attention_block(h, w_qkv, b_qkv, w_out, b_out, num_heads, mask)
    return out, (h, w_qkv, b_qkv, w_out, b_out, mask)


def _fused_block_bwd(num_heads, interpret, residuals, g):
    """Backward through the XLA reference math (Pallas kernels have no JVP
    rule; CoOp/CoCoOp differentiate through the text tower, so the fused
    forward must be paired with an exact XLA VJP). Costs one XLA forward
    recompute — the price of keeping the fast kernel on inference-heavy
    paths without a handwritten backward kernel."""
    h, w_qkv, b_qkv, w_out, b_out, mask = residuals

    def ref(h, w_qkv, b_qkv, w_out, b_out):
        return _xla_attention_block(h, w_qkv, b_qkv, w_out, b_out,
                                    num_heads, mask)

    _, vjp = jax.vjp(ref, h, w_qkv, b_qkv, w_out, b_out)
    dh, dwqkv, dbqkv, dwout, dbout = vjp(g)
    return dh, dwqkv, dbqkv, dwout, dbout, jnp.zeros_like(mask)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_attention_block(
    h: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused qkv-projection + MHA + out-projection (differentiable: Pallas
    forward + XLA-math custom VJP). h: [B, N, D] (post-LN), weights in torch
    packing ([D,3D] / [D,D]).

    Returns attn(h) @ W_out + b_out — the caller adds the residual.
    """
    n = h.shape[1]
    mask_arr = (
        jnp.zeros((n, n), dtype=jnp.float32)
        if mask is None
        else mask.astype(jnp.float32)
    )
    return _fused_block(
        h, w_qkv, b_qkv, w_out, b_out, mask_arr, num_heads, interpret
    )


def _fused_block_pallas(
    h: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """The Pallas forward: one wide [D,3D] qkv matmul per batch tile, per-head
    attention + out-projection accumulation, all in VMEM."""
    b, n, d = h.shape
    dh = d // num_heads
    interpret = interpret or jax.default_backend() != "tpu"
    # pad N to the 8-sublane boundary only (197 -> 200), not the 128-lane
    # boundary (-> 256): Mosaic masks ragged lane tiles internally, and the
    # qkv/out-projection matmuls then run 22% fewer rows — measured 2.23 vs
    # 2.58 ms/layer at ViT-B/16 batch 128 on v5e
    n_pad = _round_up(n, 8)

    full_mask = jnp.zeros((n_pad, n_pad), dtype=jnp.float32)
    full_mask = full_mask.at[:n, :n].set(mask.astype(jnp.float32))
    if n_pad != n:
        full_mask = full_mask.at[:, n:].set(-jnp.inf)

    wout_hm = w_out.reshape(num_heads, dh, w_out.shape[1])  # free view

    bt = 2
    b_pad = _round_up(b, bt)
    hp = jnp.pad(h, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _fused_block_kernel,
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, dh, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, d), h.dtype),
        scratch_shapes=[pltpu.VMEM((bt, n_pad, d), jnp.float32)],
        interpret=interpret,
    )(hp, w_qkv, b_qkv, wout_hm, full_mask)
    return out[:b, :n] + b_out.astype(out.dtype)


# ---------------------------------------------------------------------------
# fused ln_2 + MLP sub-block: LN -> c_fc -> QuickGELU -> c_proj -> +residual
# ---------------------------------------------------------------------------

def _fused_mlp_kernel(x_ref, g_ref, b_ref, wfc_ref, bfc_ref, wpr_ref,
                      bpr_ref, o_ref):
    """One row tile: fp32 LayerNorm on the VPU, two MXU matmuls with the
    [T, 4D] hidden activation resident in VMEM — the hidden tensor
    (B·N·4D ≈ 300 MB/layer at ViT-B/16 batch 128) never touches HBM."""
    x = x_ref[...]  # [T, D]
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = (h * g_ref[...] + b_ref[...]).astype(x.dtype)
    hid = jax.lax.dot_general(
        h, wfc_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[...]
    hid = hid * jax.nn.sigmoid(1.702 * hid)  # QuickGELU, fp32 VPU
    out = jax.lax.dot_general(
        hid.astype(x.dtype), wpr_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bpr_ref[...]
    o_ref[...] = (x32 + out).astype(o_ref.dtype)


def _xla_ln_mlp(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj):
    """XLA reference of the fused LN+MLP block (parity tests + custom VJP)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(
        dtype
    )
    hid = h @ w_fc.astype(dtype) + b_fc.astype(dtype)
    hid = hid * jax.nn.sigmoid(1.702 * hid)
    return x + (hid @ w_proj.astype(dtype) + b_proj.astype(dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_ln_mlp(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                  interpret):
    return _fused_ln_mlp_pallas(
        x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, interpret
    )


def _mlp_vjp_on_pallas(x, w_fc) -> bool:
    """Pallas VJP when the backward working set fits VMEM (round 3); the
    XLA-math VJP remains the fallback + CLIP_GP_TPU_FUSED_VJP=xla opt-out."""
    mode = fused_vjp_mode()
    if mode == "xla":
        return False
    if mode == "pallas":
        return True
    rows = x.shape[0] * x.shape[1]
    t = min(MLP_ROW_TILE, _round_up(rows, 8))
    return _ln_mlp_bwd_fits(t, x.shape[-1], w_fc.shape[1])


def _fused_ln_mlp_fwd(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                      interpret):
    if _mlp_vjp_on_pallas(x, w_fc):
        # Pallas VJP pairs with the Pallas forward — under jax.checkpoint
        # (the towers remat every block) this forward is also the recompute,
        # so the fast kernel runs on the training path too
        out = _fused_ln_mlp_pallas(
            x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, interpret
        )
    else:
        out = _xla_ln_mlp(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj)
    return out, (x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj)


def _fused_ln_mlp_bwd(interpret, residuals, g):
    x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj = residuals
    if _mlp_vjp_on_pallas(x, w_fc):
        dx, dg, db, dwfc, dbfc, dwpr, dbpr = _ln_mlp_bwd_pallas(
            x, ln_scale, ln_bias, w_fc, b_fc, w_proj, g, interpret
        )
        return dx, dg, db, dwfc, dbfc, dwpr, dbpr.astype(b_proj.dtype)
    _, vjp = jax.vjp(_xla_ln_mlp, x, ln_scale, ln_bias, w_fc, b_fc,
                     w_proj, b_proj)
    return vjp(g)


_fused_ln_mlp.defvjp(_fused_ln_mlp_fwd, _fused_ln_mlp_bwd)


# ---------------------------------------------------------------------------
# Pallas backward kernels (round 3): recompute-based VJPs for the two fused
# training-path blocks. CoOp/CoCoOp differentiate through the text tower
# every step; round 2 paired the fast Pallas forward with an XLA-math VJP
# whose backward RE-RAN a full XLA forward (jax.vjp residual build), so the
# differentiated path fell back to XLA entirely. These kernels recompute the
# block from its primal inputs IN VMEM (the [T,4D] MLP hidden and the [N,N]
# attention matrices never touch HBM in either direction) and emit every
# gradient in one pass. Selection: `fused_vjp_mode()` — Pallas when the
# working set fits VMEM, else the XLA-math VJP (env CLIP_GP_TPU_FUSED_VJP
# in {auto, pallas, xla} overrides).
# ---------------------------------------------------------------------------

# conservative per-step VMEM budget for the backward kernels (bytes); v5e
# has ~16 MB/core — leave headroom for Mosaic's own buffers and semaphores
_BWD_VMEM_BUDGET = 13 * 1024 * 1024


def fused_vjp_mode() -> str:
    mode = os.environ.get("CLIP_GP_TPU_FUSED_VJP", "auto")
    return mode if mode in ("auto", "pallas", "xla") else "auto"


def flash_for_grad() -> bool:
    """Whether DIFFERENTIATED tower paths (CoOp/CoCoOp text towers inside a
    training loss) should use the fused Pallas blocks. Measured round 3
    (scripts/bench_fused_vjp.py, 5-trial vmapped CoOp group, 500 prompts/step,
    ViT-B/16 text width, min over interleaved reps): plain XLA standard AD
    159.5 ms/step vs 181.6 ms for BOTH fused custom-VJP variants (Pallas
    backward kernels and the XLA-math fallback alike) — the custom-VJP
    boundary costs XLA more scheduling freedom than in-kernel fusion saves
    once the whole backward is in play. Forward-only encodes keep the fused
    kernels (measured 1.19x there). Default False; set
    CLIP_GP_TPU_FUSED_VJP=pallas|xla to opt the fused differentiated path
    back in (e.g. to re-benchmark on new hardware)."""
    return (
        os.environ.get("CLIP_GP_TPU_FUSED_VJP", "") in ("pallas", "xla")
        and use_flash()
    )


def _ln_mlp_bwd_fits(t: int, d: int, hidden: int) -> bool:
    fp32 = 4
    tiles = 5 * t * d          # x, dout, h, dh, dx
    hid = 3 * t * hidden       # hid_pre, act/sigmoid, dhid
    weights = 2 * (d * hidden) * 2  # wfc/wpr + their grad accumulators
    return fp32 * (tiles + hid + weights) < _BWD_VMEM_BUDGET


def _ln_attn_bwd_fits(bt: int, n: int, d: int) -> bool:
    fp32 = 4
    tiles = 5 * bt * n * d                 # x, dout, h, dh, dx
    qkv = 2 * (bt * n * 3 * d)             # qkv + dqkv scratch
    attn = 4 * bt * n * n                  # scores/A, dA, dS (+slack)
    weights = 2 * (3 * d * d) + 2 * (d * d)  # wqkv/dwqkv + wout/dwout
    return fp32 * (tiles + qkv + attn + weights) < _BWD_VMEM_BUDGET


def _ln_mlp_bwd_kernel(x_ref, g_ref, b_ref, wfc_ref, bfc_ref, wpr_ref,
                       dout_ref, dx_ref, dg_ref, db_ref, dwfc_ref, dbfc_ref,
                       dwpr_ref, dbpr_ref):
    """One row tile of the LN+MLP backward: recompute LN/hidden/QuickGELU
    from the primal inputs (all fp32, resident in VMEM), then every gradient
    of out = x + c_proj(gelu(c_fc(LN(x)))) in one pass. Weight/bias grads
    accumulate across the row-tile grid (constant out index_map)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwfc_ref[...] = jnp.zeros_like(dwfc_ref)
        dbfc_ref[...] = jnp.zeros_like(dbfc_ref)
        dwpr_ref[...] = jnp.zeros_like(dwpr_ref)
        dbpr_ref[...] = jnp.zeros_like(dbpr_ref)

    x32 = x_ref[...].astype(jnp.float32)        # [T, D]
    dout = dout_ref[...].astype(jnp.float32)    # [T, D]
    gvec = g_ref[...]
    # forward recompute (matches _fused_mlp_kernel numerics)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mean) * rstd
    h = xhat * gvec + b_ref[...]
    hid_pre = jax.lax.dot_general(
        h, wfc_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[...]                            # [T, 4D]
    s = jax.nn.sigmoid(1.702 * hid_pre)
    act = hid_pre * s
    # backward
    dbpr_ref[...] += dout.sum(axis=0)
    dact = jax.lax.dot_general(                 # dout @ wprᵀ -> [T, 4D]
        dout, wpr_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwpr_ref[...] += jax.lax.dot_general(       # actᵀ @ dout -> [4D, D]
        act, dout,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhid = dact * (s + 1.702 * hid_pre * s * (1.0 - s))
    dbfc_ref[...] += dhid.sum(axis=0)
    dwfc_ref[...] += jax.lax.dot_general(       # hᵀ @ dhid -> [D, 4D]
        h, dhid,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jax.lax.dot_general(                   # dhid @ wfcᵀ -> [T, D]
        dhid, wfc_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg_ref[...] += (dh * xhat).sum(axis=0)
    db_ref[...] += dh.sum(axis=0)
    dxhat = dh * gvec
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ref[...] = (dout + rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _ln_mlp_bwd_pallas(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, dout,
                       interpret):
    b, n, d = x.shape
    hidden = w_fc.shape[1]
    interpret = interpret or jax.default_backend() != "tpu"
    rows = b * n
    t = min(MLP_ROW_TILE, _round_up(rows, 8))
    rows_pad = _round_up(rows, t)
    xr = x.reshape(rows, d)
    dr = dout.reshape(rows, d)
    if rows_pad != rows:
        # zero-padded dout rows contribute nothing to any gradient
        xr = jnp.pad(xr, ((0, rows_pad - rows), (0, 0)))
        dr = jnp.pad(dr, ((0, rows_pad - rows), (0, 0)))
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    row = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda i: (i,) + (0,) * (len(shp) - 1), memory_space=pltpu.VMEM
    )
    f32 = jnp.float32
    dx, dg, db, dwfc, dbfc, dwpr, dbpr = pl.pallas_call(
        _ln_mlp_bwd_kernel,
        grid=(rows_pad // t,),
        in_specs=[
            row((t, d)), full((d,)), full((d,)), full((d, hidden)),
            full((hidden,)), full((hidden, d)), row((t, d)),
        ],
        out_specs=[
            row((t, d)), full((d,)), full((d,)), full((d, hidden)),
            full((hidden,)), full((hidden, d)), full((d,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d, hidden), f32),
            jax.ShapeDtypeStruct((hidden,), f32),
            jax.ShapeDtypeStruct((hidden, d), f32),
            jax.ShapeDtypeStruct((d,), f32),
        ],
        interpret=interpret,
    )(
        xr,
        ln_scale.astype(f32), ln_bias.astype(f32),
        w_fc.astype(f32), b_fc.astype(f32), w_proj.astype(f32),
        dr,
    )
    cast = lambda v, ref: v.astype(ref.dtype)  # noqa: E731
    return (
        dx[:rows].reshape(b, n, d),
        cast(dg, ln_scale), cast(db, ln_bias),
        cast(dwfc, w_fc), cast(dbfc, b_fc), cast(dwpr, w_proj),
        dbpr,  # b_proj grad cast at the call site
    )


MLP_ROW_TILE = 512


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_fc: jnp.ndarray,
    b_fc: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + MLP(LN(x)) with the hidden activation kept in VMEM.
    x: [B, N, D]; returns [B, N, D] in x's dtype (LN/GELU in fp32)."""
    return _fused_ln_mlp(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                         interpret)


def _fused_ln_mlp_pallas(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                         interpret):
    b, n, d = x.shape
    hidden = w_fc.shape[1]
    interpret = interpret or jax.default_backend() != "tpu"
    rows = b * n
    t = min(MLP_ROW_TILE, _round_up(rows, 8))
    rows_pad = _round_up(rows, t)
    xr = x.reshape(rows, d)
    if rows_pad != rows:
        xr = jnp.pad(xr, ((0, rows_pad - rows), (0, 0)))
    dt = x.dtype
    out = pl.pallas_call(
        _fused_mlp_kernel,
        grid=(rows_pad // t,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), dt),
        interpret=interpret,
    )(
        xr,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        w_fc.astype(dt),
        b_fc.astype(jnp.float32),
        w_proj.astype(dt),
        b_proj.astype(jnp.float32),
    )
    return out[:rows].reshape(b, n, d)


# ---------------------------------------------------------------------------
# LN+attention backward kernel (round 3): recompute LN/qkv/softmax per batch
# tile in VMEM, emit dx + every weight gradient in one pass (the [N,N]
# attention matrices and their gradients never touch HBM).
# ---------------------------------------------------------------------------


def _ln_attn_bwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, bqkv_ref,
                        mask_ref, dout_ref, dx_ref, dg_ref, db_ref,
                        dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                        dqkv_scr):
    """One batch tile of the backward of o = x + out_proj(MHA(LN(x)·Wqkv)).
    All math fp32; weight/bias grads accumulate across the batch-tile grid
    (constant out index_map). wout_ref is the [H, Dh, D] head view."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    n_heads = wout_ref.shape[0]
    dh = wout_ref.shape[1]
    d = x_ref.shape[-1]
    inv = 1.0 / (dh**0.5)

    x32 = x_ref[...].astype(jnp.float32)        # [BT, N, D]
    dout = dout_ref[...].astype(jnp.float32)    # [BT, N, D]
    gvec = g_ref[...]
    # LN recompute (matches _fused_ln_block_kernel numerics)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mean) * rstd
    h = xhat * gvec + b_ref[...]                # [BT, N, D] fp32
    qkv = jax.lax.dot_general(                  # [BT, N, 3D]
        h, wqkv_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...]

    dbout_ref[...] += dout.sum(axis=(0, 1))
    dqkv_scr[...] = jnp.zeros_like(dqkv_scr)
    for head in range(n_heads):
        sl = slice(head * dh, (head + 1) * dh)
        q_s = qkv[:, :, head * dh:(head + 1) * dh] * inv
        k = qkv[:, :, d + head * dh:d + (head + 1) * dh]
        v = qkv[:, :, 2 * d + head * dh:2 * d + (head + 1) * dh]
        scores = jax.lax.dot_general(           # [BT, Nq, Nk]
            q_s, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + mask_ref[...][None]
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores)
        a = w / jnp.sum(w, axis=-1, keepdims=True)
        # forward head output (for dWout) and incoming gradient
        out_h = jax.lax.dot_general(            # [BT, Nq, Dh]
            a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        d_outh = jax.lax.dot_general(           # dout @ Wout[h]ᵀ -> [BT,Nq,Dh]
            dout, wout_ref[head],
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwout_ref[head] += jax.lax.dot_general(  # out_hᵀ @ dout -> [Dh, D]
            out_h.reshape(-1, dh), dout.reshape(-1, d),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(               # d_outh @ vᵀ -> [BT, Nq, Nk]
            d_outh, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(               # aᵀ @ d_outh -> [BT, Nk, Dh]
            a, d_outh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(               # ds @ k -> [BT, Nq, Dh]
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv
        dk = jax.lax.dot_general(               # dsᵀ @ q_s -> [BT, Nk, Dh]
            ds, q_s, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_scr[:, :, sl] = dq
        dqkv_scr[:, :, d + head * dh:d + (head + 1) * dh] = dk
        dqkv_scr[:, :, 2 * d + head * dh:2 * d + (head + 1) * dh] = dv

    dqkv = dqkv_scr[...]
    dbqkv_ref[...] += dqkv.sum(axis=(0, 1))
    dwqkv_ref[...] += jax.lax.dot_general(      # hᵀ @ dqkv -> [D, 3D]
        h.reshape(-1, d), dqkv.reshape(-1, 3 * d),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_all = jax.lax.dot_general(               # dqkv @ Wqkvᵀ -> [BT, N, D]
        dqkv, wqkv_ref[...],
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg_ref[...] += (dh_all * xhat).sum(axis=(0, 1))
    db_ref[...] += dh_all.sum(axis=(0, 1))
    dxhat = dh_all * gvec
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ref[...] = (dout + rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _ln_attn_bwd_pallas(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, mask,
                        num_heads, dout, interpret):
    b, n, d = x.shape
    dh = d // num_heads
    interpret = interpret or jax.default_backend() != "tpu"
    n_pad = _round_up(n, 8)

    full_mask = jnp.zeros((n_pad, n_pad), dtype=jnp.float32)
    full_mask = full_mask.at[:n, :n].set(mask.astype(jnp.float32))
    if n_pad != n:
        full_mask = full_mask.at[:, n:].set(-jnp.inf)

    wout_hm = w_out.reshape(num_heads, dh, w_out.shape[1])
    bt = 2
    b_pad = _round_up(b, bt)
    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    # zero-padded dout rows/batches contribute nothing to any gradient
    dp = jnp.pad(dout, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    tile = pl.BlockSpec((bt, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dx, dg, db, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        _ln_attn_bwd_kernel,
        grid=(b_pad // bt,),
        in_specs=[
            tile, full((d,)), full((d,)), full((d, 3 * d)),
            full((num_heads, dh, d)), full((3 * d,)),
            full((n_pad, n_pad)), tile,
        ],
        out_specs=[
            tile, full((d,)), full((d,)), full((d, 3 * d)),
            full((3 * d,)), full((num_heads, dh, d)), full((d,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d, 3 * d), f32),
            jax.ShapeDtypeStruct((3 * d,), f32),
            jax.ShapeDtypeStruct((num_heads, dh, d), f32),
            jax.ShapeDtypeStruct((d,), f32),
        ],
        scratch_shapes=[pltpu.VMEM((bt, n_pad, 3 * d), jnp.float32)],
        interpret=interpret,
    )(
        xp,
        ln_scale.astype(f32), ln_bias.astype(f32),
        w_qkv.astype(f32), wout_hm.astype(f32), b_qkv.astype(f32),
        full_mask, dp,
    )
    cast = lambda v, ref: v.astype(ref.dtype)  # noqa: E731
    return (
        dx[:b, :n],
        cast(dg, ln_scale), cast(db, ln_bias),
        cast(dwqkv, w_qkv), cast(dbqkv, b_qkv),
        cast(dwout.reshape(num_heads * dh, -1), w_out),
        dbout,  # b_out grad cast at the dispatch site
    )


# ---------------------------------------------------------------------------
# fully fused attention sub-block WITH ln_1 and the residual add in-kernel:
# x -> LN -> qkv -> MHA -> out-proj -> x + out. The pre-LN activation and the
# residual never round-trip HBM separately (measured: see use_flash notes).
# ---------------------------------------------------------------------------

def _fused_ln_block_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                           bout_ref, mask_ref, o_ref, acc):
    x = x_ref[...]                      # [BT, N, D]
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = (h * g_ref[...] + b_ref[...]).astype(x.dtype)
    _qkv_heads_accumulate(h, wqkv_ref, bqkv_ref, wout_ref, mask_ref, acc)
    o_ref[...] = (x32 + acc[...] + bout_ref[...]).astype(o_ref.dtype)


def _xla_ln_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                            num_heads, mask):
    """XLA reference: x + attention(LN(x)) (parity tests + custom VJP)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(
        dtype
    )
    return x + _xla_attention_block(h, w_qkv, b_qkv, w_out, b_out,
                                    num_heads, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_ln_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask,
                    num_heads, interpret):
    return _fused_ln_block_pallas(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask, num_heads,
        interpret,
    )


def _attn_vjp_on_pallas(x) -> bool:
    """Pallas VJP when the backward working set fits VMEM (round 3); the
    XLA-math VJP remains the fallback + CLIP_GP_TPU_FUSED_VJP=xla opt-out."""
    mode = fused_vjp_mode()
    if mode == "xla":
        return False
    if mode == "pallas":
        return True
    return _ln_attn_bwd_fits(2, _round_up(x.shape[1], 8), x.shape[-1])


def _fused_ln_block_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                        mask, num_heads, interpret):
    if _attn_vjp_on_pallas(x):
        # Pallas VJP pairs with the Pallas forward (also the jax.checkpoint
        # recompute on the remat'd tower path)
        out = _fused_ln_block_pallas(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask,
            num_heads, interpret,
        )
    else:
        out = _xla_ln_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                      w_out, b_out, num_heads, mask)
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask)


def _fused_ln_block_bwd(num_heads, interpret, residuals, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask = residuals
    if _attn_vjp_on_pallas(x):
        dx, dg, db, dwqkv, dbqkv, dwout, dbout = _ln_attn_bwd_pallas(
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, mask, num_heads, g,
            interpret,
        )
        return (dx, dg, db, dwqkv, dbqkv, dwout,
                dbout.astype(b_out.dtype), jnp.zeros_like(mask))

    def ref(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out):
        return _xla_ln_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                       w_out, b_out, num_heads, mask)

    _, vjp = jax.vjp(ref, x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)
    grads = vjp(g)
    return grads + (jnp.zeros_like(mask),)


_fused_ln_block.defvjp(_fused_ln_block_fwd, _fused_ln_block_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_ln_attention_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + MHA(LN(x)) — the whole pre-LN attention sub-block incl. ln_1 and
    the residual add as one Pallas kernel. Differentiable (XLA-math VJP)."""
    n = x.shape[1]
    mask_arr = (
        jnp.zeros((n, n), dtype=jnp.float32)
        if mask is None
        else mask.astype(jnp.float32)
    )
    return _fused_ln_block(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask_arr,
        num_heads, interpret,
    )


def _fused_ln_block_pallas(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                           mask, num_heads, interpret):
    b, n, d = x.shape
    dh = d // num_heads
    interpret = interpret or jax.default_backend() != "tpu"
    n_pad = _round_up(n, 8)  # sublane-only padding (see _fused_block_pallas)

    full_mask = jnp.zeros((n_pad, n_pad), dtype=jnp.float32)
    full_mask = full_mask.at[:n, :n].set(mask.astype(jnp.float32))
    if n_pad != n:
        full_mask = full_mask.at[:, n:].set(-jnp.inf)

    wout_hm = w_out.reshape(num_heads, dh, w_out.shape[1])  # free view

    bt = 2
    b_pad = _round_up(b, bt)
    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _fused_ln_block_kernel,
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, dh, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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
        w_qkv.astype(x.dtype),
        b_qkv.astype(x.dtype),
        wout_hm.astype(x.dtype),
        b_out.astype(jnp.float32),
        full_mask,
    )
    return out[:b, :n]
