"""CoOp: learnable prompt context vectors (ref: trainers/adapter_coop.py).

n_ctx learnable context embeddings (shared, class-specific with ``csc``, or
initialized from a phrase with ``ctx_init``) are spliced between the SOS
embedding and the class-name suffix, and the assembled prompts re-encode
through the frozen text transformer every step — gradients flow through the
tower to the context vectors only. The image tower output is treated as a
constant (ref: adapter_coop.py:514-522).
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.core.registry import TRAINER_REGISTRY
from clip_gp_tpu.data.templates import get_templates
from clip_gp_tpu.methods import common
from clip_gp_tpu.models import clip_model
from clip_gp_tpu.models.tokenizer import tokenize
from clip_gp_tpu.ops.metrics import AverageMeter, compute_accuracy
from clip_gp_tpu.runtime.optim import EpochOptimizer
from clip_gp_tpu.runtime.trainer_base import BaseTrainer


def build_prompt_parts(config, classnames, clip_params, key, force_shared_ctx=False):
    """(ctx_vectors, token_prefix, token_suffix, tokenized) for prompt
    learning (ref: adapter_coop.py:453-502).

    ``force_shared_ctx`` ignores ``csc`` without mutating the config
    (CoCoOp always uses shared context; the recorded config must still
    reflect the user's setting)."""
    n_ctx = int(config.adapter.n_ctx)
    ctx_init = str(config.adapter.ctx_init or "")
    use_csc = bool(config.adapter.csc) and not force_shared_ctx
    token_embedding = np.asarray(clip_params["token_embedding"])
    ctx_dim = token_embedding.shape[1]

    if ctx_init:
        phrase = ctx_init.replace("_", " ").strip()
        n_ctx = len(phrase.split(" "))
        tok = tokenize(phrase)[0]
        embedding = token_embedding[tok]
        ctx_vectors = jnp.asarray(embedding[1 : 1 + n_ctx])
        prompt_prefix = phrase
    else:
        shape = (
            (len(classnames), n_ctx, ctx_dim) if use_csc else (n_ctx, ctx_dim)
        )
        ctx_vectors = 0.02 * jax.random.normal(key, shape)
        prompt_prefix = " ".join(["X"] * n_ctx)

    prompts = [f"{prompt_prefix} {name}." for name in classnames]
    tokenized = tokenize(prompts)  # [K,77]
    embedding = token_embedding[tokenized]  # [K,77,dim]
    token_prefix = jnp.asarray(embedding[:, :1])
    token_suffix = jnp.asarray(embedding[:, 1 + n_ctx :])
    return ctx_vectors, token_prefix, token_suffix, jnp.asarray(tokenized), n_ctx


def trim_prompt_parts(token_suffix, tokenized, n_ctx):
    """Trim the prompt suffix so assembled prompts cover only the smallest
    8-aligned length containing every EOT position.

    The text transformer is causally masked, so position p depends only on
    positions ≤ p — the pooled feature (taken at EOT) is EXACTLY the
    full-77 computation's (fp reduction order aside) while the
    differentiated tower moves ~77/L′ fewer FLOPs. The reference encodes
    all 77 positions every step (ref: clip/model.py:343-356 via
    trainers/adapter_coop.py:516); this is a pure TPU-side saving applied
    by the prompt-method consumers, NOT inside build_prompt_parts — the
    executed goldens pin that function's untrimmed reference layout.
    Typical prompts put EOT at position ~8-15, so L′ = 16/24 vs 77 ≈ a
    3-5× tower-FLOP cut (measured: scripts/bench_cocoop_profile.py).
    Disable with ``CLIP_GP_TPU_TRIM_PROMPTS=0``.
    """
    lp = trimmed_prompt_len(tokenized, n_ctx, token_suffix.shape[1])
    return token_suffix[:, : max(1, lp - 1 - n_ctx)]


def trimmed_prompt_len(tokenized, n_ctx, token_suffix_width):
    """The assembled-prompt length ``trim_prompt_parts`` produces — also
    the basis for duration-derived dispatch budgets (a trimmed prompt
    costs ~L'/77 of a full-length encode; parallel/trial_vmap.py scales
    the token-position budgets by it)."""
    full_len = 1 + n_ctx + token_suffix_width
    if os.environ.get("CLIP_GP_TPU_TRIM_PROMPTS", "1") == "0":
        return full_len
    max_eot = int(np.asarray(jnp.asarray(tokenized).argmax(axis=-1)).max())
    return min(full_len, -(-(max_eot + 1) // 8) * 8)


def assemble_prompts(ctx, token_prefix, token_suffix, num_classes):
    if ctx.ndim == 2:
        ctx = jnp.broadcast_to(ctx[None], (num_classes,) + ctx.shape)
    return jnp.concatenate([token_prefix, ctx, token_suffix], axis=1)


@TRAINER_REGISTRY.register("Adapter-CoOp")
class Trainer(BaseTrainer):
    def build_model(self):
        config = self.config
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {config.model.backbone_name})")
        arch, clip_params = self.load_clip_model()
        print("Building CoOp adapter")
        self.arch = arch
        self.logit_scale = float(np.exp(np.asarray(clip_params["logit_scale"])))
        (
            ctx_vectors,
            self.token_prefix,
            self.token_suffix,
            self.tokenized,
            self.n_ctx,
        ) = build_prompt_parts(config, classnames, clip_params, self.keys.next())
        self.token_suffix = trim_prompt_parts(
            self.token_suffix, self.tokenized, self.n_ctx
        )
        self.params: Dict = {"ctx": ctx_vectors}
        self.num_classes_k = len(classnames)
        self.opt = EpochOptimizer(config.optim)
        self.opt_state = self.opt.init(self.params)
        self._build_jitted_fns(arch, clip_params)
        # zero-shot classifier for the baseline block
        self.templates = get_templates(config)
        self.text_embeddings = common.encode_templates(
            clip_params, arch, classnames, self.templates
        )

    def _build_jitted_fns(self, arch, clip_params):
        scale = self.logit_scale
        k = self.num_classes_k
        # prefix/suffix are [K, ~72, W] — explicit jit arguments, never
        # closure leaves (HLO-constant blowup crashes remote compile at real
        # class counts; CLAUDE.md hard rule). Same for clip_params.
        self._eot = self.tokenized.argmax(axis=-1)
        preprocess = self.preprocess
        self._clip_params = clip_params

        @jax.jit
        def encode(clip_params, images_u8):
            feats = clip_model.encode_image(clip_params, arch, preprocess(images_u8))
            return common.l2_normalize(feats)

        self._encode_norm = lambda images: encode(self._clip_params, images)

        def text_features(clip_params, params, prefix, suffix, eot):
            from clip_gp_tpu.ops.flash_attention import flash_for_grad

            prompts = assemble_prompts(params["ctx"], prefix, suffix, k)
            # the training loss differentiates through this tower: plain XLA
            # + standard AD measured fastest there (flash_for_grad docstring);
            # eval shares the path so train/eval numerics stay identical
            feats = clip_model.text_features_from_embeddings(
                clip_params, arch, prompts, eot, flash=flash_for_grad(),
                compute_dtype=clip_model.prompt_tower_dtype(),
            )
            return common.l2_normalize(feats)

        text_features_jit = jax.jit(text_features)
        self._text_features = lambda params: text_features_jit(
            self._clip_params, params,
            self.token_prefix, self.token_suffix, self._eot,
        )

        def train_step(clip_params, params, opt_state, img_feats, labels,
                       prefix, suffix, eot):
            def loss_fn(params):
                text = text_features(clip_params, params, prefix, suffix, eot)
                logits = scale * img_feats @ text.T
                return common.cross_entropy(logits, labels), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            return (
                jax.tree.map(lambda p, u: p + u, params, updates),
                opt_state,
                loss,
                logits,
            )

        step_jit = jax.jit(train_step, donate_argnums=(1, 2))
        self._train_step = lambda params, opt_state, feats, labels: step_jit(
            self._clip_params, params, opt_state, feats, labels,
            self.token_prefix, self.token_suffix, self._eot,
        )

        # quiet epochs advance every full-size batch as ONE scanned
        # executable (text-tower fwd/bwd per batch otherwise costs one
        # dispatch round-trip each — 350 ms over a tunneled backend). The
        # step is deterministic (no in-step RNG), so scanning is the same
        # math as the eager loop.
        def step_for_scan(params, opt_state, f, l, clip_params,
                          prefix, suffix, eot):
            return train_step(
                clip_params, params, opt_state, f, l, prefix, suffix, eot
            )

        scan_jit = common.make_epoch_scan(step_for_scan)
        self._epoch_scan = lambda params, opt_state, fb, lb: scan_jit(
            params, opt_state, fb, lb, self._clip_params,
            self.token_prefix, self.token_suffix, self._eot,
        )

    # ------------------------------------------------------------------
    def predict_logits(self, features):
        text = self._text_features(self.params)
        return self.logit_scale * common.l2_normalize(features) @ text.T

    def eval_logits_labels(self, split: str = "test"):
        if split == "test" and hasattr(self, "features_test"):
            logits = np.asarray(self.predict_logits(jnp.asarray(self.features_test)))
            return logits, self.labels_test
        return super().eval_logits_labels(split)

    def trainable_state(self):
        return {"ctx": self.params["ctx"]}

    def load_trainable_state(self, state):
        self.params = {"ctx": jnp.asarray(state["ctx"])}

    def remap_trainable_state(self, state, extra, idx):
        ctx = np.asarray(state["ctx"])
        if ctx.ndim == 3:  # class-specific ctx [K, n_ctx, dim]
            return {"ctx": jnp.asarray(ctx[idx])}
        return state  # unified ctx is class-agnostic

    # ------------------------------------------------------------------
    def train(self):
        start_time = time.time()
        self.build_model()

        # zero-shot baseline + cached normalized test features
        self.features_test, self.labels_test = common.extract_with(
            self._encode_norm, self.test_loader
        )
        zs_w = common.zero_shot_classifier(self.text_embeddings)
        zs_logits = np.asarray(100.0 * jnp.asarray(self.features_test) @ zs_w)
        self.compute_zero_shot_block(zs_logits, self.labels_test)

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
        if (not verbose and self.num_batches > 1
                and common.quiet_epochs_enabled(self._writer)):
            def scan_full(fb, lb, _keys, _extras):
                self.params, self.opt_state, losses_dev = self._epoch_scan(
                    self.params, self.opt_state, fb, lb
                )
                return losses_dev

            def step_one(f, l, _key, _extra):
                self.params, self.opt_state, loss, _ = self._train_step(
                    self.params, self.opt_state, f, l
                )
                return loss

            common.quiet_epoch_advance(
                loader, self._encode_norm, scan_full, step_one, losses
            )
            self.batch_idx = self.num_batches - 1
            self.opt_state = self.opt.set_epoch(self.opt_state, self.epoch + 1)
            return losses.avg  # device scalar; callers never materialize it
        for self.batch_idx, batch in enumerate(loader):
            imgs = batch["img"]
            n = imgs.shape[0]
            imgs = common.pad_batch(imgs, bs)
            img_feats = self._encode_norm(jnp.asarray(imgs))[:n]
            labels = jnp.asarray(batch["label"].astype(np.int32))
            self.params, self.opt_state, loss, logits = self._train_step(
                self.params, self.opt_state, img_feats, labels
            )
            losses.update(loss)  # device array: no per-step host sync
            if verbose:
                acc_train = compute_accuracy(np.asarray(logits), batch["label"])[0]
                acc_test = compute_accuracy(
                    np.asarray(self.predict_logits(jnp.asarray(self.features_test))),
                    self.labels_test,
                )[0]
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
