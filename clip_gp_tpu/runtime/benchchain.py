"""Dependency-chain input advance for benchmarks on tunneled backends.

Timing rule (CLAUDE.md): on the tunneled axon backend ``block_until_ready``
returns before remote execution completes, and byte-identical
``(executable, args)`` calls can be served from a remote execution cache. A
valid timing loop must therefore (a) derive each iteration's input from the
previous iteration's *output* — so iterations cannot be reordered or served
concurrently — and (b) present a genuinely NEW input every iteration — so no
timed call repeats an ``(executable, args)`` pair the backend has already
answered.

History of broken constructions (all caught 2026-08-18, the first in review,
the rest by tests/test_benchchain.py while fixing it):

1. ``x ^ (|out|.sum() > -1)`` — the comparison is always true, so every
   iteration XORed by 1 and the inputs alternated with period 2.
2. ``x + scalar_byte(out)`` — one shared additive byte makes each input a
   cumulative-sum walk on Z_256, which birthday-collides onto a previous
   value within ~20 steps.
3. ``x + per_image_odd_byte(out)`` — adding the same byte to every pixel of
   an image reduces that image's state to a single shift c ∈ Z_256, and the
   induced walk c → c + f(c) can enter 2-cycles (observed: deltas 133/123,
   summing to 256, reached within ~30 steps).

:func:`advance_uint8` is the hardened construction, used everywhere a uint8
image chain is timed (bench.py, scripts/bench_backbones.py,
scripts/bench_int8_encode.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def advance_uint8(x: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
    """Next uint8 input derived from this iteration's output.

    Construction: ``x += d_b + P`` where ``d_b`` is a per-image odd byte
    derived from that image's output and ``P`` is the fixed flat-index
    parity pattern (0/1), which varies within every image of >= 2 elements.

    Repeat-freedom proof: after n steps,
    ``x_n = x_0 + S_n(b) + n·P (mod 256)`` with ``S_n(b)`` the cumulative
    per-image delta. ``x_n = x_m`` requires ``S_n ≡ S_m`` at P=0 pixels AND
    ``S_n + n ≡ S_m + m`` at P=1 pixels, hence ``n ≡ m (mod 256)`` — so the
    first 256 inputs of a chain are distinct REGARDLESS of the output values
    (degenerate, constant, or non-finite outputs included), far exceeding
    any timed window. The data-dependent ``d_b`` term is still load-bearing:
    it is what forces iteration k+1's input to wait for iteration k's
    output, serializing genuine execution.
    """
    o = jnp.abs(out.astype(jnp.float32))
    if out.ndim >= 1 and x.ndim >= 1 and out.shape[0] == x.shape[0]:
        s = o.reshape(out.shape[0], -1).sum(axis=1)
        d_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    else:
        s = o.sum().reshape(1)
        d_shape = (1,) * max(x.ndim, 1)
    d = jnp.where(jnp.isfinite(s), jnp.mod(s, 127.0), 0.0)
    delta = (d.astype(jnp.uint8) * 2 + 1).reshape(d_shape)  # odd, in [1,255]
    # flat-index parity: varies WITHIN every image (any per-image slice of
    # >= 2 elements contains both parities). A pattern constant within an
    # image would fold into d_b and resurrect failure mode 3.
    pattern = (
        jnp.arange(x.size, dtype=jnp.uint32).reshape(x.shape) % 2
    ).astype(jnp.uint8)
    return x + delta + pattern
