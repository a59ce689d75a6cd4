"""Learning-dynamics checks: each head must actually fit separable features.

These bypass the image towers: class-separable synthetic CLIP-like features
feed the heads directly, so the tests validate the optimization math (losses,
gradients, optimizer wiring) rather than encoder quality.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clip_gp_tpu.gp import svgp
from clip_gp_tpu.methods import common

K, M, D = 6, 4, 64
N_PER_CLASS = 20


@pytest.fixture(scope="module")
def separable():
    rng = np.random.default_rng(0)
    # class anchors far apart; text templates near anchors; features noisy
    anchors = rng.normal(size=(K, D)).astype(np.float32)
    # templates only loosely aligned with anchors; features heavily noised so
    # zero-shot is imperfect and training has headroom
    text = anchors[:, None, :] + rng.normal(size=(K, M, D)).astype(np.float32) * 1.5
    feats = np.repeat(anchors, N_PER_CLASS, axis=0) + rng.normal(
        size=(K * N_PER_CLASS, D)
    ).astype(np.float32) * 1.2
    labels = np.repeat(np.arange(K), N_PER_CLASS).astype(np.int32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    return (
        jnp.asarray(text),
        jnp.asarray(feats),
        jnp.asarray(labels),
    )


def _acc(logits, labels):
    return float((np.asarray(logits).argmax(1) == np.asarray(labels)).mean())


def test_gp_adapter_improves_accuracy(separable):
    text, feats, labels = separable
    cfg = types.SimpleNamespace(
        adapter=types.SimpleNamespace(
            gp_pca_dim=16, gp_kernel_type="rbf", gp_prior_temp=1.0, gp_jitter=1e-4
        )
    )
    static, params, buffers = svgp.create_gp(text, cfg)
    full = {"visual_proj": jnp.eye(D), "gp": params}
    tx = optax.adamw(3e-3)
    opt_state = tx.init(full)

    def loss_fn(p, key):
        projected = feats @ p["visual_proj"].T
        f_norm = common.l2_normalize(projected)
        protos, _ = svgp.sample_prototypes(static, p["gp"], buffers, key, 8)
        ce = common.mc_cross_entropy(f_norm, protos, labels, 10.0)
        return ce + 0.01 * svgp.kl_divergence(p["gp"]).sum()

    @jax.jit
    def step(full, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(full, key)
        updates, opt_state = tx.update(grads, opt_state, full)
        return optax.apply_updates(full, updates), opt_state, loss

    def eval_acc(full, key):
        protos, _ = svgp.sample_prototypes(static, full["gp"], buffers, key, 32)
        logits = common.cosine_logits(feats @ full["visual_proj"].T, protos, 10.0)
        return _acc(logits, labels)

    key = jax.random.key(0)
    acc0 = eval_acc(full, key)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        full, opt_state, loss = step(full, opt_state, sub)
        losses.append(float(loss))
    acc1 = eval_acc(full, key)
    assert losses[-1] < losses[0], "loss must decrease"
    assert acc1 >= acc0, f"accuracy regressed: {acc0} -> {acc1}"
    assert acc1 > 0.75, f"GP adapter failed to fit separable data: {acc1}"


def test_template_logit_head_fits(separable):
    text, feats, labels = separable
    tw_logits = jnp.zeros((K, M))
    tx = optax.adamw(0.05)
    opt_state = tx.init(tw_logits)
    proj = jnp.eye(D)

    def loss_fn(tw_logits):
        w = jax.nn.softmax(tw_logits, axis=-1)
        protos = jnp.einsum("km,kmd->kd", w, text)
        logits = common.cosine_logits(feats @ proj.T, protos, 10.0)
        return common.cross_entropy(logits, labels)

    @jax.jit
    def step(tw_logits, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(tw_logits)
        updates, opt_state = tx.update(grads, opt_state, tw_logits)
        return optax.apply_updates(tw_logits, updates), opt_state, loss

    l0 = float(loss_fn(tw_logits))
    for _ in range(50):
        tw_logits, opt_state, loss = step(tw_logits, opt_state)
    assert float(loss) < l0
    w = jax.nn.softmax(tw_logits, axis=-1)
    protos = jnp.einsum("km,kmd->kd", w, text)
    logits = common.cosine_logits(feats, protos, 10.0)
    assert _acc(logits, labels) > 0.7


def test_gp_kl_pulls_toward_prior(separable):
    """With a huge KL weight and no data term, q(u) must collapse to N(0,I)."""
    text, _, _ = separable
    cfg = types.SimpleNamespace(
        adapter=types.SimpleNamespace(
            gp_pca_dim=16, gp_kernel_type="linear", gp_prior_temp=1.0,
            gp_jitter=1e-4,
        )
    )
    _, params, _ = svgp.create_gp(text, cfg)
    params = svgp.initialize_from_weights(
        params, jnp.full((K, M), 1.0 / M) + 0.1
    )
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: svgp.kl_divergence(p).sum()
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    kl0 = float(svgp.kl_divergence(params).sum())
    for _ in range(200):
        params, opt_state, _ = step(params, opt_state)
    kl1 = float(svgp.kl_divergence(params).sum())
    assert kl1 < kl0 * 0.1
