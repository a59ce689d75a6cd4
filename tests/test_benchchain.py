"""The benchmark dependency-chain advance must present a fresh input every
iteration — the tunneled backend serves byte-identical (executable, args)
pairs from a remote execution cache, so a repeated input invalidates the
timing (CLAUDE.md bench protocol; the pre-fix advance alternated with
period 2, and a shared scalar delta birthday-collides within ~20 steps)."""

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.runtime.benchchain import advance_uint8


def _distinct(seq):
    seen = set()
    for arr in seq:
        key = np.asarray(arr).tobytes()
        assert key not in seen, "chain repeated an input"
        seen.add(key)


def test_advance_uint8_inputs_all_distinct():
    @jax.jit
    def step(x):
        # stand-in for an encoder: per-image features depending on the input
        out = jnp.sin(x.astype(jnp.float32)).reshape(x.shape[0], -1) * 3.7
        return advance_uint8(x, out), out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8))
    inputs = [x]
    for _ in range(80):  # far longer than any timed window in the benches
        x, _ = step(x)
        inputs.append(x)
    _distinct(inputs)


def test_advance_uint8_constant_output_still_advances():
    # worst case: the output (and hence every delta) is identical every
    # step — the odd wrap-around add must still cycle through all 256
    # residues before repeating
    x = jnp.zeros((2, 4), dtype=jnp.uint8)
    out = jnp.full((3,), 17.25, jnp.float32)  # scalar-fallback shape
    inputs = [x]
    for _ in range(255):
        x = advance_uint8(x, out)
        inputs.append(x)
    _distinct(inputs)


def test_advance_uint8_constant_even_sum_per_image():
    # per-image path with a constant delta whose non-odd version (e.g. 128)
    # would cycle with period 2 — oddness forces the full 256-period
    x = jnp.zeros((2, 4), dtype=jnp.uint8)
    out = jnp.full((2, 5), 64.0, jnp.float32)  # per-image sums = 320
    inputs = [x]
    for _ in range(255):
        x = advance_uint8(x, out)
        inputs.append(x)
    _distinct(inputs)


def test_advance_uint8_nonfinite_output_never_freezes():
    x = jnp.full((2, 2), 9, jnp.uint8)
    for bad in (jnp.nan, jnp.inf, -jnp.inf):
        nxt = advance_uint8(x, jnp.full((4,), bad, jnp.float32))
        assert not np.array_equal(np.asarray(nxt), np.asarray(x))
