"""Shared building blocks for all adaptation methods.

Covers the text side (per-class·template embeddings, zero-shot classifier) and
the few-shot template-weight initialization scan that several methods share
(ref: utils/trainer.py:178-237, trainers/adapter.py:30-142).
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.models import clip_model
from clip_gp_tpu.models.tokenizer import tokenize


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def encode_templates(
    params,
    arch,
    classnames: List[str],
    templates: List[str],
    batch_size: int = 256,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Text embeddings [K, M, D] for every class × template.

    The reference loops one class at a time (ref: trainers/adapter.py:30-45);
    here all K·M prompts tokenize at once and encode in fixed-size jitted
    batches so the text tower compiles exactly once.
    """
    k, m = len(classnames), len(templates)
    prompts = [t.format(name) for name in classnames for t in templates]
    tokens = tokenize(prompts)  # [K*M, 77]
    n = tokens.shape[0]
    pad = (-n) % batch_size
    if pad:
        tokens = np.concatenate([tokens, np.tile(tokens[-1:], (pad, 1))], axis=0)
    chunks = []
    for i in range(0, tokens.shape[0], batch_size):
        chunk = clip_model.encode_text_jit(
            params, arch, jnp.asarray(tokens[i : i + batch_size]), compute_dtype
        )
        chunks.append(chunk)
    feats = jnp.concatenate(chunks, axis=0)[:n]
    return feats.reshape(k, m, -1)


def zero_shot_classifier(text_embeddings: jnp.ndarray) -> jnp.ndarray:
    """[K,M,D] → [D,K] zero-shot weights: per-template L2-normalize, average
    over templates, L2-normalize again (ref: utils/trainer.py:223-237)."""
    e = l2_normalize(text_embeddings)
    mean = e.mean(axis=1)
    return l2_normalize(mean).T


@partial(jax.jit, static_argnames=("num_classes",))
def _template_scores(features, labels, text_embeddings, scale, num_classes):
    """Per-class per-template few-shot accuracy S[k,m]."""
    feats = l2_normalize(features)  # [N,D]
    protos = l2_normalize(text_embeddings)  # [K,M,D]
    logits = scale * jnp.einsum("nd,kmd->nmk", feats, protos)  # [N,M,K]
    preds = logits.argmax(axis=-1)  # [N,M]
    correct = (preds == labels[:, None]).astype(jnp.float32)  # [N,M]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # [N,K]
    sums = jnp.einsum("nk,nm->km", onehot, correct)
    counts = jnp.clip(onehot.sum(axis=0), 1.0, None)[:, None]
    return sums / counts


def prefit_full_set_features(config, trainer):
    """Optional full-train-split features for template-weight scoring.

    The reference's ``prefit_on_full_set`` branch lives INSIDE
    ``_get_template_weights`` (ref: trainers/adapter.py:71-100), so it
    applies to EVERY warm start — the Adapter's own init AND the GP
    pre-stage warm starts of CLIP-Adapter / TaskRes / Tip-Adapter. When the
    flag is set, the scoring features come from the full (num_shots=0)
    train split encoded under the train transform; on failure the caller's
    few-shot features are kept (same warn-and-fall-back contract).

    Returns (features, labels) or None (flag unset / extraction failed).
    """
    if not bool(getattr(config.adapter, "prefit_on_full_set", False)):
        return None
    try:
        import copy as _copy

        from clip_gp_tpu.core.registry import build_dataset
        from clip_gp_tpu.data.pipeline import BatchLoader

        cfg_full = _copy.deepcopy(config)
        cfg_full.dataset.num_shots = 0
        ds_full = build_dataset(cfg_full)
        loader = BatchLoader(
            ds_full.train_x,
            trainer.dm.tfm_train,
            config.dataloader.batch_size_train,
            shuffle=False,
            drop_last=False,
            num_workers=config.dataloader.num_workers,
        )
        labels, feats = trainer.encode_images_batched(loader)
        print(f"[INFO] Prefit on full set: {len(feats)} samples used.")
        return jnp.asarray(feats), jnp.asarray(labels)
    except Exception as e:
        print(
            f"[WARN] prefit_on_full_set failed ({e}); "
            "falling back to few-shot features."
        )
        return None


def get_template_weights(
    config,
    text_embeddings: jnp.ndarray,
    features: Optional[jnp.ndarray],
    labels: Optional[jnp.ndarray],
    logit_scale: float,
) -> jnp.ndarray:
    """Per-class template weights [K,M], rows summing to 1
    (ref: trainers/adapter.py:48-142).

    Methods: uniform | val_weighted | top3 | minmax — all non-uniform methods
    score templates by per-class few-shot accuracy, then map scores through
    softmax(log(S+eps)). NOTE: callers that can reach the
    ``prefit_on_full_set`` path must swap in
    :func:`prefit_full_set_features` first (the reference folds that branch
    into this function; here it is separate because it needs the trainer's
    encoder).
    """
    method = str(getattr(config.adapter, "template_init_method", "uniform")).lower()
    k, m = int(text_embeddings.shape[0]), int(text_embeddings.shape[1])
    if m == 0:
        return jnp.zeros((k, 0))
    if method == "uniform" or features is None or labels is None:
        return jnp.full((k, m), 1.0 / m)

    scores = np.asarray(
        _template_scores(
            features, labels.astype(jnp.int32), text_embeddings, float(logit_scale), k
        )
    )
    if method == "top3":
        top_k = min(3, m)
        top_idx = np.argsort(-scores.mean(axis=0))[:top_k]
        keep = np.zeros(m)
        keep[top_idx] = 1.0
        scores = scores * keep[None]
        zero_rows = scores.sum(axis=1) <= 1e-12
        scores[zero_rows] = keep / top_k
    elif method == "minmax":
        s_min = scores.min(axis=1, keepdims=True)
        s_max = scores.max(axis=1, keepdims=True)
        rng = s_max - s_min
        flat = rng <= 1e-12
        scaled = (scores - s_min) / np.clip(rng, 1e-12, None)
        scores = np.where(flat, 1.0 / m, scaled)
    logits = np.log(np.clip(scores, 1e-12, None))
    w = np.exp(logits - logits.max(axis=1, keepdims=True))
    w = w / w.sum(axis=1, keepdims=True)
    return jnp.asarray(w, dtype=jnp.float32)


def cosine_logits(
    features: jnp.ndarray, prototypes: jnp.ndarray, scale
) -> jnp.ndarray:
    """scale · cos(features, prototypes): [N,D] × [K,D] → [N,K], or with MC
    prototype samples [S,K,D] → mean over S of per-sample logits
    (ref: trainers/adapter.py:246-252).

    The MC mean is linear in the normalized prototypes, so averaging them
    first and doing ONE [N,D]×[D,K] matmul is mathematically identical to the
    reference's S-fold einsum at 1/S the FLOPs (S=300 at eval)."""
    f = l2_normalize(features)
    if prototypes.ndim == 3:
        p_mean = l2_normalize(prototypes).mean(axis=0)  # [K,D]
        return scale * f @ p_mean.T
    return scale * f @ l2_normalize(prototypes).T


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def mc_cross_entropy(
    features_norm: jnp.ndarray,
    prototypes: jnp.ndarray,
    labels: jnp.ndarray,
    scale,
) -> jnp.ndarray:
    """Mean over S of CE(scale · f̂ · p̂_sᵀ, labels) — the MC-averaged loss
    (ref: trainers/adapter.py:401-428). Note: the *loss* averages CEs over
    samples; the *eval* path averages logits."""
    p = l2_normalize(prototypes)  # [S,K,D]
    logits = scale * jnp.einsum("nd,skd->snk", features_norm, p)  # [S,N,K]
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        logp, labels[None, :, None].repeat(logits.shape[0], 0), axis=2
    )
    return -picked.mean()


def pad_batch(imgs: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad a partial batch to the loader batch size (repeat the last image) so
    the encoder compiles one executable per split shape; callers slice [:n]."""
    n = imgs.shape[0]
    if n >= batch_size:
        return imgs
    pad = np.tile(imgs[-1:], (batch_size - n, 1, 1, 1))
    return np.concatenate([imgs, pad], axis=0)


def quiet_epochs_enabled(writer) -> bool:
    """Quiet scanned epochs engage when no per-batch scalar sink needs the
    eager loop (a live TensorBoard writer does). Tests force the eager path
    via ``CLIP_GP_TPU_FORCE_EAGER_EPOCHS=1`` so scan-vs-eager parity never
    silently degrades to scan-vs-scan on hosts without tensorboardX."""
    if writer is not None:
        return False
    return os.environ.get("CLIP_GP_TPU_FORCE_EAGER_EPOCHS", "") != "1"


def make_epoch_scan(step_fn, out_fn=None, n_streams=2, donate=(0, 1)):
    """Build the jitted whole-epoch scan used by quiet training epochs.

    ``step_fn(params, opt_state, *streams, *consts) -> (params, opt_state,
    loss, logits)`` is the trainer's (unjitted) per-batch train step. The
    first ``n_streams`` array arguments after ``(params, opt_state)`` ride
    the scanned axis — by convention ``(feats, labels[, keys or per-batch
    precomputed arrays])`` — and everything after them is constant across
    the epoch (classifier weights, CLIP params, prompt parts: all explicit
    jit arguments, never closure leaves). ``out_fn(loss, logits, labels)``
    maps one step's results to its per-batch output row (default: the loss;
    ``labels`` is stream #1 by the convention above).

    Returns a jitted ``fn(params, opt_state, *stacked_streams, *consts) ->
    (params, opt_state, outs)`` with (params, opt_state) donated.
    """

    def epoch_scan(params, opt_state, *args):
        xs = args[:n_streams]
        consts = args[n_streams:]

        def body(carry, x):
            params, opt_state = carry
            params, opt_state, loss, logits = step_fn(
                params, opt_state, *x, *consts
            )
            out = loss if out_fn is None else out_fn(loss, logits, x[1])
            return (params, opt_state), out

        (params, opt_state), outs = jax.lax.scan(
            body, (params, opt_state), xs
        )
        return params, opt_state, outs

    return jax.jit(epoch_scan, donate_argnums=donate)


def quiet_epoch_advance(loader, encode, scan_full, step_one, losses,
                        draw_key=None, extra_fn=None):
    """Advance one quiet training epoch with a single scanned dispatch.

    Stream-encodes the augmented batches (image encode overlaps the loader's
    host decode), then advances all full-size batches as ONE scanned
    executable — per-batch eager stepping otherwise costs one dispatch
    round-trip each (350 ms over a tunneled backend). Only a trailing
    partial batch steps eagerly, so batch order is preserved; steps draw no
    RNG beyond the explicit ``draw_key`` stream, so the result matches the
    eager loop.

    ``scan_full(feats_b [T,B,*], labels_b [T,B], keys_b [T,2]|None,
    extras_b|None)`` runs the scan and mutates trainer state via its
    closure, returning per-batch device losses. ``step_one(feats, labels,
    key|None, extra|None)`` steps one batch and returns its loss.
    ``draw_key`` (optional) draws one training-stream key per batch,
    consumed in batch order exactly as the eager loop would. ``extra_fn``
    (optional) computes one additional per-batch device array from
    ``(feats, batch)`` — e.g. Tip-Adapter's frozen clip logits — stacked
    onto the scanned axis alongside features and labels.
    """
    bs = loader.batch_size
    feats_list, labels_list, extras_list = [], [], []
    for batch in loader:
        imgs = batch["img"]
        n = imgs.shape[0]
        imgs = pad_batch(imgs, bs)
        f = encode(jnp.asarray(imgs))[:n]
        feats_list.append(f)
        labels_list.append(jnp.asarray(batch["label"].astype(np.int32)))
        if extra_fn is not None:
            extras_list.append(extra_fn(f, batch))
    n_full = sum(1 for f in feats_list if int(f.shape[0]) == bs)
    # the scanned prefix slice assumes partial batches only ever trail
    # (BatchLoader semantics: at most one short final batch). A sampler
    # that interleaves short batches would otherwise scan out of order
    # against the drawn key sequence — fail loudly instead.
    assert all(
        int(f.shape[0]) == bs for f in feats_list[:n_full]
    ), "quiet_epoch_advance: partial batch before the end of the epoch"
    if n_full > 1:
        keys_b = (
            jnp.stack([draw_key() for _ in range(n_full)])
            if draw_key is not None
            else None
        )
        extras_b = (
            jnp.stack(extras_list[:n_full]) if extra_fn is not None else None
        )
        losses_dev = scan_full(
            jnp.stack(feats_list[:n_full]),
            jnp.stack(labels_list[:n_full]),
            keys_b,
            extras_b,
        )
        losses.update(losses_dev.mean(), n_full)
        tail = range(n_full, len(feats_list))
    else:
        tail = range(len(feats_list))
    for i in tail:
        key = draw_key() if draw_key is not None else None
        extra = extras_list[i] if extra_fn is not None else None
        losses.update(step_one(feats_list[i], labels_list[i], key, extra))
    return len(feats_list)


def extract_with(encode_fn, loader) -> Tuple[np.ndarray, np.ndarray]:
    """Run a jitted image-encode function over a loader with batch padding.

    Returns (features [N, ...] float32, labels [N] int). The single shared
    implementation of the pad-encode-slice loop used by every method.

    Loader batches are aggregated into device super-batches (default 512
    images, env ``CLIP_GP_TPU_EXTRACT_DEVICE_BATCH``): image encoding is
    per-image independent, so the device batch size can't change results,
    while fewer+larger executions amortize the per-execution overhead of
    tunneled remote backends (measured ~150-200 ms per call regardless of
    batch) and keep the MXU fed. The loader batch size still controls the
    host decode granularity (reference parity for the augmentation stream).

    Outputs stay device-resident until the end: dispatching super-batch i+1
    before materializing lets host decode overlap device compute (a per-batch
    np.asarray would serialize them with one host round-trip each)."""
    feats_dev, labels = [], []
    bs = loader.batch_size
    target = int(os.environ.get("CLIP_GP_TPU_EXTRACT_DEVICE_BATCH", "512"))
    group = max(1, target // max(bs, 1))
    dev_bs = group * bs
    buf: list = []

    def flush():
        imgs = buf[0] if len(buf) == 1 else np.concatenate(buf)
        n = imgs.shape[0]
        # full super-batches pad to dev_bs (one compiled shape); the final
        # partial one pads to the next power-of-two batch multiple — bounded
        # extra shapes, without encoding a 512-pad for a 24-image tail
        if n >= dev_bs:
            padded = dev_bs
        else:
            g = 1
            while g * bs < n:
                g *= 2
            padded = min(g * bs, dev_bs)
        feats_dev.append(encode_fn(jnp.asarray(pad_batch(imgs, padded)))[:n])
        buf.clear()

    for batch in loader:
        buf.append(batch["img"])
        labels.append(batch["label"])
        if sum(b.shape[0] for b in buf) >= dev_bs:
            flush()
    if buf:
        flush()
    feats = [np.asarray(f) for f in jax.device_get(feats_dev)]
    return np.concatenate(feats).astype(np.float32), np.concatenate(labels)


def batch_slices(n: int, batch_size: int):
    """Full batches like the reference's drop_last loader; one batch when the
    dataset is smaller than batch_size (ref: trainers/adapter.py:722-745)."""
    if n <= batch_size:
        return [(0, n)]
    n_batches = n // batch_size
    return [(b * batch_size, (b + 1) * batch_size) for b in range(n_batches)]
