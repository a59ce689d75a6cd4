"""Sparsemax: Euclidean projection onto the probability simplex.

Replaces the reference's `entmax.sparsemax` call mapping GP function samples to
convex template weights (ref: trainers/gp_template_weigher.py:5,217).

Forward (Martins & Astudillo, 2016): sort-based threshold along the last axis.
Backward is a custom VJP: with support set S = {i : p_i > 0},
  (J v)_i = v_i - mean_{j in S}(v_j)  if i in S else 0.
The sort is O(M log M) on M ≤ ~80 templates — XLA handles it on the VPU; no
Pallas kernel is warranted at this size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sparsemax_fwd_core(z: jnp.ndarray) -> jnp.ndarray:
    m = z.shape[-1]
    # shift by the row max (mathematically a no-op: the projection only sees
    # differences) — without it, inputs at magnitude ~30+ lose enough fp32
    # precision in (z - tau) that the output drifts off the simplex by ~1e-5
    # (hypothesis-found counterexample, tests/test_properties.py)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    z_sorted = jnp.sort(z, axis=-1)[..., ::-1]
    z_cumsum = jnp.cumsum(z_sorted, axis=-1)
    ks = jnp.arange(1, m + 1, dtype=z.dtype)
    # support condition: 1 + k * z_(k) > cumsum_k
    support = 1.0 + ks * z_sorted > z_cumsum
    k_z = jnp.sum(support, axis=-1, keepdims=True).astype(z.dtype)
    # tau = (sum of supported sorted values - 1) / k
    cumsum_at_k = jnp.take_along_axis(
        z_cumsum, jnp.maximum(k_z.astype(jnp.int32) - 1, 0), axis=-1
    )
    tau = (cumsum_at_k - 1.0) / k_z
    return jnp.maximum(z - tau, 0.0)


@jax.custom_vjp
def sparsemax(z: jnp.ndarray) -> jnp.ndarray:
    """Project ``z`` onto the simplex along the last axis."""
    return _sparsemax_fwd_core(z)


def _fwd(z):
    p = _sparsemax_fwd_core(z)
    return p, p


def _bwd(p, g):
    support = (p > 0).astype(g.dtype)
    n_support = jnp.maximum(support.sum(axis=-1, keepdims=True), 1.0)
    g_mean = (g * support).sum(axis=-1, keepdims=True) / n_support
    return ((g - g_mean) * support,)


sparsemax.defvjp(_fwd, _bwd)
