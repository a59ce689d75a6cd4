"""CLIP-Adapter: bottleneck MLP on visual features blended with the original
(ref: trainers/clip_adapter.py).

Adapter = Linear(D→D/r) → ReLU → Linear(D/r→D) → ReLU (bias-free), blended as
``ratio·adapted + (1−ratio)·orig``; classifier is the zero-shot clip_weights
[D,K] — optionally replaced by GP-mean prototypes or learned template weights
via the shared pre-stages. The adapter trains with CE on augmented images per
epoch under its own optimizer settings (clip_adapter_{optimizer,lr,epochs}).

TPU note: the frozen tower re-encodes augmented few-shot images each epoch
(augmentation is the point of re-encoding); encode + adapter-step compile once
and test features are cached for quick eval.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.core.registry import TRAINER_REGISTRY
from clip_gp_tpu.data.templates import get_templates
from clip_gp_tpu.methods import common, pre_stages
from clip_gp_tpu.models import clip_model
from clip_gp_tpu.ops.metrics import AverageMeter, compute_accuracy
from clip_gp_tpu.runtime.optim import EpochOptimizer, _OverrideLr
from clip_gp_tpu.runtime.trainer_base import BaseTrainer


@TRAINER_REGISTRY.register("CLIP-Adapter")
class Trainer(BaseTrainer):
    def build_model(self):
        config = self.config
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {config.model.backbone_name})")
        arch, clip_params = self.load_clip_model()
        print("Building CLIP-Adapter")
        self.templates = get_templates(config)
        self.text_embeddings = common.encode_templates(
            clip_params, arch, classnames, self.templates
        )
        self.clip_weights = common.zero_shot_classifier(self.text_embeddings)  # [D,K]
        self.logit_scale = float(np.exp(np.asarray(clip_params["logit_scale"])))
        d = int(self.text_embeddings.shape[-1])
        reduction = max(1, int(config.adapter.clip_adapter_reduction))
        hidden = max(1, d // reduction)
        k1, k2 = jax.random.split(self.keys.next())
        # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        self.params: Dict = {
            "fc1": jax.random.uniform(
                k1, (d, hidden), minval=-1 / np.sqrt(d), maxval=1 / np.sqrt(d)
            ),
            "fc2": jax.random.uniform(
                k2,
                (hidden, d),
                minval=-1 / np.sqrt(hidden),
                maxval=1 / np.sqrt(hidden),
            ),
        }
        self.ratio = float(config.adapter.clip_adapter_ratio)
        # GP runs use the no-renorm classifier path; config-derived so
        # --eval-only reloads pick the right path too
        self._gp_classifier = bool(config.adapter.use_gp)

        # adapter-specific optimizer settings (ref: _TmpOptim shim,
        # trainers/clip_adapter.py:152-167)
        opt_cfg = _OverrideLr(config.optim, float(config.adapter.clip_adapter_lr))
        opt_cfg.name = str(config.adapter.clip_adapter_optimizer)
        opt_cfg.max_epoch = int(config.adapter.clip_adapter_epochs)
        self.opt = EpochOptimizer(opt_cfg)
        self.opt_state = self.opt.init(self.params)
        self._build_jitted_fns(arch, clip_params)

    def _build_jitted_fns(self, arch, clip_params):
        scale = self.logit_scale
        ratio = self.ratio
        preprocess = self.preprocess

        def apply_adapter(params, feats):
            adapted = jax.nn.relu(jax.nn.relu(feats @ params["fc1"]) @ params["fc2"])
            return ratio * adapted + (1.0 - ratio) * feats

        def logits_fn(params, feats, clip_weights):
            blended = apply_adapter(params, feats)
            f = common.l2_normalize(blended)
            w = clip_weights / jnp.linalg.norm(clip_weights, axis=0, keepdims=True)
            return scale * f @ w

        self._logits_fn = jax.jit(logits_fn)

        def gp_logits_fn(params, feats, clip_weights):
            # GP path: the classifier is the UNnormalized mean over
            # normalized MC prototype samples — logits are linear in the
            # prototypes, so scale·f@mean(p̂ₛ) equals the reference's
            # mean-over-samples logits (ref: clip_adapter.py:85-97), and the
            # class-dependent ‖mean‖<1 shrinkage (GP uncertainty) must NOT
            # be renormalized away
            blended = apply_adapter(params, feats)
            f = common.l2_normalize(blended)
            return scale * f @ clip_weights

        self._gp_logits_fn = jax.jit(gp_logits_fn)

        @jax.jit
        def encode(clip_params, images_u8):
            return clip_model.encode_image(clip_params, arch, preprocess(images_u8))

        self._clip_params = clip_params
        self._encode = lambda images: encode(self._clip_params, images)

        def make_train_step(lg):
            def train_step(params, opt_state, feats, labels, clip_weights):
                def loss_fn(params):
                    logits = lg(params, feats, clip_weights)
                    return common.cross_entropy(logits, labels), logits

                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return params, opt_state, loss, logits

            return train_step

        plain_step = make_train_step(logits_fn)
        # GP classifier trains through the no-renorm logits (the adapter's CE
        # gradient must see the same per-class shrinkage the reference's
        # MC-mean logits carry)
        gp_step = make_train_step(gp_logits_fn)
        self._train_step = jax.jit(plain_step, donate_argnums=(0, 1))
        self._gp_train_step = jax.jit(gp_step, donate_argnums=(0, 1))

        # quiet epochs advance every full-size batch as ONE scanned
        # executable (common.quiet_epoch_advance); the step is deterministic,
        # so scanning is the same math as the eager loop. clip_weights is the
        # trailing epoch constant.
        self._epoch_scan = common.make_epoch_scan(plain_step)
        self._gp_epoch_scan = common.make_epoch_scan(gp_step)

    # ------------------------------------------------------------------
    def predict_logits(self, features):
        if getattr(self, "_gp_classifier", False):
            return self._gp_logits_fn(self.params, features, self.clip_weights)
        return self._logits_fn(self.params, features, self.clip_weights)

    def eval_logits_labels(self, split: str = "test"):
        if split == "test" and hasattr(self, "features_test"):
            import jax.numpy as jnp
            import numpy as np

            logits = np.asarray(self.predict_logits(jnp.asarray(self.features_test)))
            return logits, self.labels_test
        return super().eval_logits_labels(split)

    def trainable_state(self):
        return {"adapter": self.params, "clip_weights": self.clip_weights}

    def load_trainable_state(self, state):
        self.params = jax.tree.map(jnp.asarray, state["adapter"])
        self.clip_weights = jnp.asarray(state["clip_weights"])

    def remap_trainable_state(self, state, extra, idx):
        # MLP adapter is class-agnostic; the classifier is [D, K] (class axis 1)
        return {
            "adapter": state["adapter"],
            "clip_weights": jnp.asarray(np.asarray(state["clip_weights"])[:, idx]),
        }

    # ------------------------------------------------------------------
    def train(self):
        start_time = time.time()
        self.build_model()

        # cache test features + zero-shot block
        self.labels_test, self.features_test = self.encode_images_batched(
            self.test_loader, cacheable=True
        )
        zs_logits = np.asarray(self.predict_logits(jnp.asarray(self.features_test)))
        self.compute_zero_shot_block(zs_logits, self.labels_test)

        if bool(self.config.adapter.use_gp):
            tr_labels, tr_feats = self.encode_images_batched(self.train_loader_x)
            from clip_gp_tpu.gp import svgp

            prefit = common.prefit_full_set_features(self.config, self)
            self.gp_bundle, _ = pre_stages.train_gp_stage(
                self.config,
                self.text_embeddings,
                common.l2_normalize(jnp.asarray(tr_feats)),
                tr_labels,
                self.keys,
                warm_start_scale=self.logit_scale,
                init_features=prefit[0] if prefit else None,
                init_labels=prefit[1] if prefit else None,
            )
            # classifier = mean over S_eval NORMALIZED samples, kept
            # unnormalized: identical logits to the reference's per-forward
            # MC mean (linear) incl. its per-class uncertainty shrinkage
            static, gp_params, buffers = self.gp_bundle
            s_eval = max(1, int(self.config.adapter.gp_num_mc_samples_eval or 1))
            protos, _ = svgp.sample_prototypes(
                static, gp_params, buffers, self.keys.next(), s_eval
            )
            self.clip_weights = common.l2_normalize(protos).mean(axis=0).T
            print("[CLIP-Adapter] Using trained GP-based template weighter for prototypes.")
        elif bool(self.config.adapter.clip_adapter_use_template_weight_training):
            tr_labels, tr_feats = self.encode_images_batched(self.train_loader_x)
            _, protos = pre_stages.train_template_weight_stage(
                self.config,
                self.text_embeddings,
                common.l2_normalize(jnp.asarray(tr_feats)),
                tr_labels,
                n_batches=max(1, len(self.train_loader_x)),
            )
            self.clip_weights = protos.T

        self.before_train()
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.run_epoch()
            self.after_epoch()
        self.after_train()
        print(f"Training completed in {time.time() - start_time:.2f} seconds")

    def run_epoch(self):
        losses = AverageMeter()
        loader = self.train_loader_x
        self.num_batches = len(loader)
        verbose = self.epoch == 0 or (self.epoch + 1) % 10 == 0
        bs = loader.batch_size
        gp = getattr(self, "_gp_classifier", False)
        if (not verbose and self.num_batches > 1
                and common.quiet_epochs_enabled(self._writer)):
            scan = self._gp_epoch_scan if gp else self._epoch_scan
            step = self._gp_train_step if gp else self._train_step

            def scan_full(fb, lb, _keys, _extras):
                self.params, self.opt_state, losses_dev = scan(
                    self.params, self.opt_state, fb, lb, self.clip_weights
                )
                return losses_dev

            def step_one(f, l, _key, _extra):
                self.params, self.opt_state, loss, _ = step(
                    self.params, self.opt_state, f, l, self.clip_weights
                )
                return loss

            common.quiet_epoch_advance(
                loader, self._encode, scan_full, step_one, losses
            )
            self.batch_idx = self.num_batches - 1
            self.opt_state = self.opt.set_epoch(self.opt_state, self.epoch + 1)
            return losses.avg  # device scalar; callers never materialize it
        for self.batch_idx, batch in enumerate(loader):
            imgs = batch["img"]
            n = imgs.shape[0]
            imgs = common.pad_batch(imgs, bs)
            feats = self._encode(jnp.asarray(imgs))[:n]
            labels = jnp.asarray(batch["label"].astype(np.int32))
            step = (
                self._gp_train_step
                if getattr(self, "_gp_classifier", False)
                else self._train_step
            )
            self.params, self.opt_state, loss, logits = step(
                self.params, self.opt_state, feats, labels, self.clip_weights
            )
            losses.update(loss)  # device array: no per-step host sync
            if verbose:
                acc_train = compute_accuracy(np.asarray(logits), batch["label"])[0]
                logits_test = np.asarray(
                    self.predict_logits(jnp.asarray(self.features_test))
                )
                acc_test = compute_accuracy(logits_test, self.labels_test)[0]
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}] "
                    f"batch [{self.batch_idx + 1}/{self.num_batches}] "
                    f"loss {float(loss):.4f} acc_train {acc_train:.4f} "
                    f"acc_test {acc_test:.4f}"
                )
            if self._writer is not None:  # guard: float(loss) is a host sync
                self.write_scalar(
                    "train/loss", float(loss),
                    self.epoch * self.num_batches + self.batch_idx,
                )
        self.opt_state = self.opt.set_epoch(self.opt_state, self.epoch + 1)
        return float(losses.avg)
