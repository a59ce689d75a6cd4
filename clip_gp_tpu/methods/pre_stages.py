"""Standalone classifier pre-stages shared by CLIP-Adapter / TaskRes /
Tip-Adapter.

Both stages operate on cached, L2-normalized few-shot train features at fixed
scale 100 and produce replacement class prototypes [K,D]:

- GP stage (ref: trainers/clip_adapter.py:234-294, taskres.py:209-293,
  tip_adapter.py:476-546): train the variational GP template weighter with
  CE(mean-over-S logits) + β·KL for ``optim.max_epoch`` epochs under
  AdamW(gp_lr) + cosine, then export normalized MC-mean prototypes. Note this
  family's loss averages *logits* over samples before the CE (unlike the
  Adapter method, which averages per-sample CEs).
- Template-weight stage (ref: trainers/clip_adapter.py:296-333 etc.): learn
  [K,M] weight logits by CE on cached features, with an optional
  L2-to-uniform regularizer (TaskRes, ref: taskres.py:339-349).

Each stage is one jitted step scanned over epochs — the entire pre-stage is a
single XLA executable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clip_gp_tpu.gp import svgp
from clip_gp_tpu.methods import common


def train_gp_stage(
    config,
    text_embeddings: jnp.ndarray,
    train_features: jnp.ndarray,
    train_labels: np.ndarray,
    key_seq,
    warm_start_scale: Optional[float] = None,
    init_features: Optional[jnp.ndarray] = None,
    init_labels: Optional[jnp.ndarray] = None,
):
    """Returns (gp bundle (static, params, buffers), mean prototypes [K,D]).

    ``init_features``/``init_labels`` override the warm-start SCORING
    features only (the prefit_on_full_set path — the reference's
    _get_template_weights swaps features internally, ref: adapter.py:71-100,
    while GP training still runs on the few-shot set)."""
    static, params, buffers = svgp.create_gp(text_embeddings, config)
    init_w = common.get_template_weights(
        config,
        text_embeddings,
        init_features if init_features is not None else train_features,
        jnp.asarray(init_labels if init_labels is not None else train_labels),
        warm_start_scale if warm_start_scale is not None else 100.0,
    )
    params = svgp.initialize_from_weights(params, init_w)

    epochs = int(config.optim.max_epoch)
    gp_lr = float(config.adapter.gp_lr)
    wd = float(config.optim.weight_decay)
    s_tr = max(1, int(config.adapter.gp_num_mc_samples_train or 1))
    beta_kl = float(config.adapter.gp_beta)
    feats = common.l2_normalize(jnp.asarray(train_features))
    labels = jnp.asarray(np.asarray(train_labels).astype(np.int32))

    sched = optax.cosine_decay_schedule(gp_lr, max(epochs, 1))
    tx = optax.adamw(sched, weight_decay=wd)
    opt_state = tx.init(params)

    # feats/labels/buffers are explicit jit arguments — cached train features
    # are large arrays and closure leaves become HLO constants (CLAUDE.md)
    @jax.jit
    def fit(params, opt_state, keys, feats, labels, buffers):
        def loss_fn(params, key):
            protos, _ = svgp.sample_prototypes(
                static, params, buffers, key, s_tr
            )
            p = common.l2_normalize(protos)
            logits = 100.0 * jnp.einsum("bd,skd->bsk", feats, p).mean(axis=1)
            ce = common.cross_entropy(logits, labels)
            kl = svgp.kl_divergence(params).sum()
            return ce + beta_kl * kl, (ce, kl, logits)

        def epoch_step(carry, key):
            params, opt_state = carry
            (loss, (ce, kl, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # scalar train acc per epoch: stacking the [N,K] logits as scan
            # outputs would allocate epochs*N*K floats in one buffer
            # (19 GB at ImageNet scale) just for two diagnostic prints
            acc = 100.0 * (jnp.argmax(logits, -1) == labels).mean()
            return (params, opt_state), (loss, ce, kl, acc)

        return jax.lax.scan(epoch_step, (params, opt_state), keys)

    keys = key_seq.next(max(epochs, 1) + 1)[: max(epochs, 1)]
    (params, opt_state), (losses, ces, kls, accs) = fit(
        params, opt_state, keys, feats, labels, buffers
    )
    for ep in (0, epochs - 1):
        if 0 <= ep < epochs:
            print(
                f"[GP] epoch {ep + 1}/{epochs} loss={float(losses[ep]):.4f} "
                f"CE={float(ces[ep]):.4f} KL={float(kls[ep]):.4f} "
                f"acc={float(accs[ep]):.2f}"
            )

    s_eval = max(1, int(config.adapter.gp_num_mc_samples_eval or 1))
    protos, _ = svgp.sample_prototypes(
        static, params, buffers, key_seq.next(), s_eval
    )
    mean_protos = common.l2_normalize(protos.mean(axis=0))
    return (static, params, buffers), mean_protos


def train_template_weight_stage(
    config,
    text_embeddings: jnp.ndarray,
    train_features: jnp.ndarray,
    train_labels: np.ndarray,
    l2_to_uniform_lambda: float = 0.0,
    n_batches: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Learn [K,M] template-weight logits; returns (weights, prototypes [K,D]).

    ``n_batches`` sets the reference's cosine horizon: CosineAnnealingLR is
    built over ``epochs * len(train_loader)`` steps but stepped once per
    EPOCH (ref: taskres.py:327-353, clip_adapter.py:309-323,
    tip_adapter.py:180-206), so the LR stays near-constant — decaying fully
    over ``epochs`` would freeze the logits in late epochs."""
    k, m = int(text_embeddings.shape[0]), int(text_embeddings.shape[1])
    tw_logits = jnp.zeros((k, m))
    epochs = int(config.optim.max_epoch)
    lr = float(config.optim.lr)
    wd = float(config.optim.weight_decay)
    feats = common.l2_normalize(jnp.asarray(train_features))
    labels = jnp.asarray(np.asarray(train_labels).astype(np.int32))
    e = text_embeddings

    sched = optax.cosine_decay_schedule(
        lr, max(1, epochs * max(1, int(n_batches)))
    )
    tx = optax.adamw(sched, weight_decay=wd)
    opt_state = tx.init(tw_logits)

    # feats/labels/e explicit (no large closure constants — CLAUDE.md)
    @jax.jit
    def fit(tw_logits, opt_state, feats, labels, e):
        def loss_fn(tw_logits):
            weights = jax.nn.softmax(tw_logits, axis=-1)
            protos = common.l2_normalize(jnp.einsum("km,kmd->kd", weights, e))
            logits = 100.0 * feats @ protos.T
            ce = common.cross_entropy(logits, labels)
            if l2_to_uniform_lambda > 0 and m > 0:
                reg = ((weights - 1.0 / m) ** 2).mean()
                ce = ce + l2_to_uniform_lambda * reg
            return ce, logits

        def epoch_step(carry, _):
            tw_logits, opt_state = carry
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                tw_logits
            )
            updates, opt_state = tx.update(grads, opt_state, tw_logits)
            # scalar acc per epoch — stacking [N,K] logits per epoch would
            # allocate epochs*N*K floats for one diagnostic print
            acc = 100.0 * (jnp.argmax(logits, -1) == labels).mean()
            return (
                (optax.apply_updates(tw_logits, updates), opt_state),
                (loss, acc),
            )

        return jax.lax.scan(
            epoch_step, (tw_logits, opt_state), None, length=max(epochs, 1)
        )

    (tw_logits, opt_state), (losses, accs) = fit(
        tw_logits, opt_state, feats, labels, e
    )
    print(
        f"[TW] epoch {epochs}/{epochs} loss={float(losses[-1]):.4f} "
        f"acc={float(accs[-1]):.2f}"
    )

    weights = jax.nn.softmax(tw_logits, axis=-1)
    protos = common.l2_normalize(jnp.einsum("km,kmd->kd", weights, e))
    return weights, protos
