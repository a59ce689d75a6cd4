"""Tip-Adapter and Tip-Adapter-F: training-free cache classifier
(ref: trainers/tip_adapter.py).

Cache keys = normalized few-shot features [N,D], values = one-hot labels
[N,K]; ``cache_logits = exp(−β(1−keyᵀq)) @ vals`` and
``tip_logits = clip_logits + α·cache_logits``. The -F variant wraps the keys
in a trainable bias-free linear layer initialized from the cache, trained with
CE while tracking the best test accuracy. (β, α) are grid-searched on the val
set (β ∈ {1,2,5}, α ∈ {1,5,10,20,50}). Fully custom ``train()`` — no epoch
lifecycle (ref: tip_adapter.py:82-362).

TPU-native: val/test features are cached once; the whole (β, α) grid evaluates
as one vectorized einsum over the grid instead of a Python double loop; the -F
training epoch is a jitted step over cached augmented-feature batches.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clip_gp_tpu.core.registry import TRAINER_REGISTRY
from clip_gp_tpu.data.templates import get_templates
from clip_gp_tpu.gp import svgp
from clip_gp_tpu.methods import common, pre_stages
from clip_gp_tpu.models import clip_model
from clip_gp_tpu.ops.metrics import (
    AverageMeter,
    compute_accuracy,
    compute_aece,
    compute_aece_with_bins,
    compute_ece,
    compute_ece_with_bins,
)
from clip_gp_tpu.runtime.trainer_base import BaseTrainer

BETAS = (1.0, 2.0, 5.0)
ALPHAS = (1.0, 5.0, 10.0, 20.0, 50.0)


@TRAINER_REGISTRY.register("Tip-Adapter")
class Trainer(BaseTrainer):
    def build_model(self):
        config = self.config
        print(f"Loading CLIP (backbone: {config.model.backbone_name})")
        arch, clip_params = self.load_clip_model()
        self.arch = arch
        self.classnames = self.dm.dataset.classnames
        self.templates = get_templates(config)
        self.text_embeddings = common.encode_templates(
            clip_params, arch, self.classnames, self.templates
        )
        self.clip_weights = common.zero_shot_classifier(self.text_embeddings)
        self.gp_bundle = None
        preprocess = self.preprocess

        @jax.jit
        def encode(clip_params, images_u8):
            feats = clip_model.encode_image(clip_params, arch, preprocess(images_u8))
            return common.l2_normalize(feats)

        self._clip_params = clip_params
        self._encode_norm = lambda images: encode(self._clip_params, images)

    def _extract_norm(self, loader):
        return common.extract_with(self._encode_norm, loader)

    # ------------------------------------------------------------------
    def _clip_logits(self, feats: jnp.ndarray) -> jnp.ndarray:
        if self.gp_bundle is not None:
            static, gp_params, buffers = self.gp_bundle
            s = max(1, int(self.config.adapter.gp_num_mc_samples_eval or 1))
            protos, _ = svgp.sample_prototypes(
                static, gp_params, buffers, self.keys.next(), s
            )
            p = common.l2_normalize(protos)
            return 100.0 * jnp.einsum("bd,skd->bsk", feats, p).mean(axis=1)
        return 100.0 * feats @ self.clip_weights

    def _search_hyperparams(self, val_feats, val_labels, adapter_w=None):
        """Vectorized (β, α) grid search on the val set
        (ref: tip_adapter.py:438-466)."""
        clip_logits = self._clip_logits(jnp.asarray(val_feats))
        affinity = (
            jnp.asarray(val_feats) @ adapter_w.T
            if adapter_w is not None
            else jnp.asarray(val_feats) @ self.cache_keys.T
        )
        betas = jnp.asarray(BETAS)
        cache = jnp.exp(
            -(betas[:, None, None] - betas[:, None, None] * affinity[None])
        ) @ self.cache_vals  # [B, N, K]
        alphas = jnp.asarray(ALPHAS)
        tip = clip_logits[None, None] + alphas[None, :, None, None] * cache[:, None]
        preds = tip.argmax(-1)  # [B, A, N]
        accs = (preds == jnp.asarray(val_labels)[None, None]).mean(-1)
        accs_np = np.asarray(accs)
        bi, ai = np.unravel_index(np.argmax(accs_np), accs_np.shape)
        return float(BETAS[bi]), float(ALPHAS[ai])

    def _tip_logits(self, feats, beta, alpha, adapter_w=None):
        affinity = (
            jnp.asarray(feats) @ adapter_w.T
            if adapter_w is not None
            else jnp.asarray(feats) @ self.cache_keys.T
        )
        cache_logits = jnp.exp(-(beta - beta * affinity)) @ self.cache_vals
        return self._clip_logits(jnp.asarray(feats)) + alpha * cache_logits

    # ------------------------------------------------------------------
    def train(self):
        start_time = time.time()
        self.build_model()
        config = self.config

        use_gp = bool(config.adapter.use_gp)
        use_tw = bool(config.adapter.tip_adapter_use_template_weight_training)
        tr_feats = tr_labels = None
        if use_gp or use_tw:
            tr_feats, tr_labels = self._extract_norm(self.train_loader_x)
            # Tip L2-normalizes each template embedding BEFORE the pre-stage
            # (ref: tip_adapter.py:98-103) — like TaskRes's GP branch
            # (ref: taskres.py:234), unlike CLIP-Adapter's raw E
            # (ref: clip_adapter.py:239)
            norm_embeddings = common.l2_normalize(self.text_embeddings)
            if use_gp:
                prefit = common.prefit_full_set_features(config, self)
                self.gp_bundle, mean_protos = pre_stages.train_gp_stage(
                    config,
                    norm_embeddings,
                    jnp.asarray(tr_feats),
                    tr_labels,
                    self.keys,
                    init_features=prefit[0] if prefit else None,
                    init_labels=prefit[1] if prefit else None,
                )
                print("[Tip-Adapter] Using trained GP-based template weighter for prototypes.")
            else:
                _, protos = pre_stages.train_template_weight_stage(
                    config, norm_embeddings, jnp.asarray(tr_feats), tr_labels,
                    n_batches=max(1, len(self.train_loader_x)),
                )
                self.clip_weights = protos.T

        # test features + zero-shot
        test_feats, test_labels = self._extract_norm(self.test_loader)
        self.features_test, self.labels_test = test_feats, test_labels
        clip_logits_test = np.asarray(self._clip_logits(jnp.asarray(test_feats)))
        self.compute_zero_shot_block(clip_logits_test, test_labels)

        # build cache — reuse the pre-stage extraction when available (one
        # frozen-tower pass instead of the reference's two)
        if tr_feats is not None:
            cache_feats, cache_labels = tr_feats, tr_labels
        else:
            cache_feats, cache_labels = self._extract_norm(self.train_loader_x)
        self.cache_keys = jnp.asarray(cache_feats)  # [N,D]
        self.cache_vals = jax.nn.one_hot(
            jnp.asarray(cache_labels.astype(np.int32)), len(self.classnames)
        )

        trainable = bool(config.adapter.tip_adapter_trainable)
        adapter_w: Optional[jnp.ndarray] = None
        if trainable:
            adapter_w = self._train_adapter_f(test_feats, test_labels)

        # hyperparameter search on val (fallback to init values)
        try:
            val_feats, val_labels = self._extract_norm(self.val_loader)
            beta, alpha = self._search_hyperparams(val_feats, val_labels, adapter_w)
        except Exception as e:
            print(f"[Tip-Adapter] val search unavailable ({e}); using init values")
            beta = float(config.adapter.tip_adapter_init_beta)
            alpha = float(config.adapter.tip_adapter_init_alpha)
        self.best_beta, self.best_alpha = beta, alpha
        self.adapter_w = adapter_w

        # final test
        logits = np.asarray(
            self._tip_logits(test_feats, beta, alpha, adapter_w)
        )
        acc = compute_accuracy(logits, test_labels)[0]
        print("Evaluate on the *test* set")
        print("=> result")
        print(f"* total: {len(test_labels):,}")
        print(f"* correct: {int((logits.argmax(1) == test_labels).sum()):,}")
        print(f"* accuracy: {acc:.1f}%")
        print(f"* error: {100 - acc:.1f}%")
        ece = compute_ece(logits, test_labels)
        aece = compute_aece(logits, test_labels)
        print(f"* ECE: {ece:.2f}%")
        print(f"* AECE: {aece:.2f}%")
        _, ece_bins = compute_ece_with_bins(logits, test_labels)
        _, aece_bins = compute_aece_with_bins(logits, test_labels)
        metrics = {
            "top1_acc": float(acc),
            "ece": float(ece),
            "aece": float(aece),
            "calibration": ece_bins,
            "adaptive_calibration": aece_bins,
        }
        self.write_run_summary_json(metrics, start_time=start_time)
        print(f"Completed in {time.time() - start_time:.2f} seconds")

    # ------------------------------------------------------------------
    def _train_adapter_f(self, test_feats, test_labels) -> jnp.ndarray:
        """Tip-Adapter-F: trainable cache keys (ref: tip_adapter.py:613-682)."""
        config = self.config
        # init from cache keys [N,D]; copy — the first donated jit step must
        # not consume the cache_keys buffer itself
        adapter_w = jnp.array(self.cache_keys)
        lr = float(config.adapter.tip_adapter_lr)
        # eps passes through verbatim, incl. an explicit 0.0
        # (ref: tip_adapter.py:232-233)
        eps = float(config.adapter.tip_adapter_eps)
        epochs = int(config.adapter.tip_adapter_epochs)
        beta = float(config.adapter.tip_adapter_init_beta)
        alpha = float(config.adapter.tip_adapter_init_alpha)
        if beta == 0.0 or alpha == 0.0:
            # reference defect (quirk, COMPONENTS.md): the init values default
            # to 0.0 and no shipped config overrides them — alpha=0 removes
            # the cache term from the loss, the adapter gradient is
            # identically zero, and AdamW with the (also-default) eps=0
            # produces 0/0 = NaN on the first step, poisoning every
            # subsequent eval. Train at the search grid's first values
            # instead; the post-training (beta, alpha) search is unaffected.
            print(
                "[Tip-Adapter-F] init beta/alpha of 0 give the adapter no "
                "gradient (and NaN under eps=0); training at 1.0/1.0"
            )
            beta = beta or 1.0
            alpha = alpha or 1.0
        n_batches = max(1, len(self.train_loader_x))
        sched = optax.cosine_decay_schedule(lr, max(1, epochs * n_batches))
        # torch.optim.AdamW's DEFAULT weight_decay is 1e-2 (the reference
        # passes none, ref: tip_adapter.py:233); optax.adamw defaults 1e-4
        tx = optax.adamw(sched, eps=eps, weight_decay=1e-2)
        opt_state = tx.init(adapter_w)
        # cache_vals is [N,K] (large at ImageNet scale) — explicit jit
        # argument, never a closure leaf (HLO-constant blowup; CLAUDE.md)
        def step(adapter_w, opt_state, feats, labels, clip_logits, cache_vals):
            def loss_fn(adapter_w):
                affinity = feats @ adapter_w.T
                cache_logits = jnp.exp(-(beta - beta * affinity)) @ cache_vals
                tip = clip_logits + alpha * cache_logits
                return common.cross_entropy(tip, labels), tip

            (loss, tip), grads = jax.value_and_grad(loss_fn, has_aux=True)(adapter_w)
            updates, opt_state = tx.update(grads, opt_state, adapter_w)
            return optax.apply_updates(adapter_w, updates), opt_state, loss, tip

        _jit_step = jax.jit(step, donate_argnums=(0, 1))

        def jit_step(adapter_w, opt_state, feats, labels, clip_logits):
            return _jit_step(adapter_w, opt_state, feats, labels, clip_logits,
                             self.cache_vals)

        # all full-size batches of an epoch advance as ONE scanned executable
        # (per-batch eager steps cost one dispatch round-trip each over a
        # tunneled backend); the step is deterministic, so scanning is the
        # same math as eager stepping. Streams: (feats, labels, clip_logits);
        # cache_vals is the trailing epoch constant.
        jit_epoch_scan = common.make_epoch_scan(
            step,
            out_fn=lambda loss, tip, l: (loss, (tip.argmax(axis=1) == l).sum()),
            n_streams=3,
        )

        # per-epoch best-state keep runs device-side: the test tip-logits,
        # finite guard, and accuracy compare all stay on device, so tracking
        # the best epoch costs no host sync (the eager design materialized
        # the full test logits every epoch).
        def eval_best(adapter_w, best_acc, best_w, test_feats,
                      test_clip_logits, test_labels_d, cache_vals):
            affinity = test_feats @ adapter_w.T
            tip = test_clip_logits + alpha * (
                jnp.exp(-(beta - beta * affinity)) @ cache_vals
            )
            # never snapshot a numerically poisoned state: argmax over NaN
            # rows degenerates to class 0, which can spuriously beat acc 0
            finite = jnp.isfinite(tip).all()
            acc = 100.0 * (tip.argmax(axis=1) == test_labels_d).mean()
            better = finite & (acc > best_acc)
            return (
                jnp.where(better, acc, best_acc),
                jnp.where(better, adapter_w, best_w),
            )

        jit_eval_best = jax.jit(eval_best)

        best_acc = jnp.asarray(0.0)
        best_w = jnp.array(adapter_w)  # copy: adapter_w donates into steps
        test_feats_j = jnp.asarray(test_feats)
        test_labels_d = jnp.asarray(test_labels.astype(np.int32))
        # the GP-classifier test logits are sample-averaged once up front
        # (the eager loop re-sampled per epoch via _tip_logits; the adapter
        # is trained against fixed clip logits either way, and the final
        # reported eval in train() still draws its own samples)
        test_clip_logits = self._clip_logits(test_feats_j)
        for epoch in range(epochs):
            losses_m = AverageMeter()
            corrects, totals = [], []  # device scalars / host ints

            def extra_fn(feats, batch):
                totals.append(int(feats.shape[0]))
                return self._clip_logits(feats)

            def scan_full(fb, lb, _keys, clb):
                nonlocal adapter_w, opt_state
                adapter_w, opt_state, (losses_dev, corrects_dev) = (
                    jit_epoch_scan(
                        adapter_w, opt_state, fb, lb, clb, self.cache_vals
                    )
                )
                corrects.append(corrects_dev.sum())
                return losses_dev

            def step_one(f, l, _key, cl):
                nonlocal adapter_w, opt_state
                adapter_w, opt_state, loss, tip = jit_step(
                    adapter_w, opt_state, f, l, cl
                )
                # device-side correct-count: no per-batch host sync
                corrects.append((tip.argmax(axis=1) == l).sum())
                return loss

            common.quiet_epoch_advance(
                self.train_loader_x, self._encode_norm, scan_full, step_one,
                losses_m, extra_fn=extra_fn,
            )
            if epoch == 0 or (epoch + 1) % 10 == 0:
                print(
                    f"epoch [{epoch + 1}/{epochs}] "
                    f"loss {float(losses_m.avg):.4f} "
                    f"acc_train "
                    f"{100.0 * float(sum(corrects)) / max(1, sum(totals)):.4f}"
                )
            best_acc, best_w = jit_eval_best(
                adapter_w, best_acc, best_w, test_feats_j,
                test_clip_logits, test_labels_d, self.cache_vals,
            )
        return jnp.array(best_w)

    # metrics.json handled inside train(); standard test() path unused
    def predict_logits(self, features):
        return self._tip_logits(
            np.asarray(features),
            getattr(self, "best_beta", float(self.config.adapter.tip_adapter_init_beta)),
            getattr(self, "best_alpha", float(self.config.adapter.tip_adapter_init_alpha)),
            getattr(self, "adapter_w", None),
        )
