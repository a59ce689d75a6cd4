"""CoCoOp: conditional prompt learning with a per-image meta-net
(ref: trainers/adapter_cocoop.py).

CoOp's shared context gets an image-conditioned shift: ``meta_net`` =
Linear(vis_dim → vis_dim/16) → ReLU → Linear(→ ctx_dim) maps each normalized
image feature to a context bias; every image re-encodes all K class prompts.
The reference iterates a Python loop over images (ref: cocoop.py:739-745);
here the per-image K-prompt text encode is a ``lax.map`` over the batch —
same memory profile, one compiled program.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.core.registry import TRAINER_REGISTRY
from clip_gp_tpu.methods import common
from clip_gp_tpu.methods.coop import build_prompt_parts
from clip_gp_tpu.models import clip_model
from clip_gp_tpu.ops.metrics import AverageMeter, compute_accuracy
from clip_gp_tpu.runtime.optim import EpochOptimizer
from clip_gp_tpu.runtime.trainer_base import BaseTrainer

# Max conditional prompts (images × classes) in flight per text-tower call.
# Measured on v5e (ViT-B/16 text tower, K=100, B=32, scripts/bench_cocoop.py):
# small chunks win the full train step (backward HBM traffic dominates the
# fully-batched encode), while single-call wins when B·K fits the budget
# outright (small-K datasets). With the round-5 prompt trim (default on)
# each prompt moves ~L'/77 of the data, and the measured optimum moved
# 128 → 256 prompts/chunk (213.0 → 185.0 ms/step; 512 is 204.7, fully
# batched 328.5). Benches/tests may override before build_model().
PROMPT_BUDGET = 256


def conditional_logits(text_params, arch, params, img_feats, prefix, suffix,
                       eot, k, scale):
    """Blocked per-image conditional-prompt logits: [B, D] normalized image
    features → [B, K] (ref: trainers/adapter_cocoop.py:70-82).

    ONE implementation for both backends — the in-process trainer's jitted
    fns and the vmapped ``trial_vmap.CoCoOpSpec`` — so the vmapped-vs-
    in-process bit-parity contract can't drift. C images' K prompts encode
    per text-tower call (the reference encodes one image's prompts at a time
    in a Python loop, ref: cocoop.py:739-745). When the whole batch's B·K
    prompts fit ``PROMPT_BUDGET`` (read at trace time; tests/benches may
    override), everything encodes in ONE tower call — one big MXU matmul —
    otherwise chunks of C·K prompts go through a compiled ``lax.map``.
    ``text_params`` may be the full CLIP param dict or just its text keys.
    """
    b = img_feats.shape[0]
    chunk = max(1, min(b, int(PROMPT_BUDGET) // max(k, 1)))
    h = jax.nn.relu(
        img_feats @ params["meta_fc1"]["w"] + params["meta_fc1"]["b"]
    )
    bias = h @ params["meta_fc2"]["w"] + params["meta_fc2"]["b"]  # [B,ctx_dim]
    ctx = params["ctx"]  # [n_ctx, ctx_dim]
    n_chunks = -(-b // chunk)
    pad = n_chunks * chunk - b
    feats_p = jnp.pad(img_feats, ((0, pad), (0, 0)))
    bias_p = jnp.pad(bias, ((0, pad), (0, 0)))

    def per_chunk(args):
        feats_c, bias_c = args  # [C,D], [C,ctx_dim]
        c = feats_c.shape[0]
        ctx_c = ctx[None, None] + bias_c[:, None, None]  # [C,1,n_ctx,dim]
        ctx_c = jnp.broadcast_to(ctx_c, (c, k) + ctx.shape)
        prompts = jnp.concatenate(
            [
                jnp.broadcast_to(prefix[None], (c,) + prefix.shape),
                ctx_c,
                jnp.broadcast_to(suffix[None], (c,) + suffix.shape),
            ],
            axis=2,
        ).reshape(c * k, -1, ctx.shape[-1])
        eot_ck = jnp.tile(eot, c)
        from clip_gp_tpu.ops.flash_attention import flash_for_grad

        n = c * k
        sub = max(1, int(PROMPT_BUDGET))
        if n > sub:
            # The image-axis chunk floors at ONE image, whose k prompts can
            # alone exceed the budget (k > PROMPT_BUDGET: sun397 k=397,
            # ImageNet k=1000). A single differentiated tower call at that
            # size stashes all 12 rematted layer inputs — fp32
            # [12, n, 77, width] ≈ 1.8 MB/prompt, measured 8.8 GB OOM on a
            # 16 GB chip at T=5 trials x k=1000 (BENCH r4). Enforce the
            # budget on the flat prompt axis too: <=`sub`-prompt slices scan
            # through the tower, remat per slice, so backward holds one
            # slice's stash at a time.
            nsub = -(-n // sub)
            pad_n = nsub * sub - n
            pp = jnp.pad(prompts, ((0, pad_n), (0, 0), (0, 0)))
            ee = jnp.pad(eot_ck, (0, pad_n))

            def tower(args):
                p_s, e_s = args
                return clip_model.text_features_from_embeddings(
                    text_params, arch, p_s, e_s, flash=flash_for_grad(),
                    compute_dtype=clip_model.prompt_tower_dtype(),
                )

            text = jax.lax.map(
                jax.checkpoint(tower),
                (
                    pp.reshape(nsub, sub, *prompts.shape[1:]),
                    ee.reshape(nsub, sub),
                ),
            ).reshape(nsub * sub, -1)[:n].reshape(c, k, -1)
        else:
            # differentiated in the training loss (see coop.py rationale)
            text = clip_model.text_features_from_embeddings(
                text_params, arch, prompts, eot_ck, flash=flash_for_grad(),
                compute_dtype=clip_model.prompt_tower_dtype(),
            ).reshape(c, k, -1)
        text = common.l2_normalize(text)
        return scale * jnp.einsum("cd,ckd->ck", feats_c, text)

    # remat each chunk: the lax.map backward otherwise stacks every chunk's
    # text-tower residuals ([n_chunks, ...] — OOM at real K)
    per_chunk = jax.checkpoint(per_chunk)
    if n_chunks == 1:
        # whole batch in one text-tower call
        return per_chunk((feats_p, bias_p))[:b]
    logits = jax.lax.map(
        per_chunk,
        (
            feats_p.reshape(n_chunks, chunk, -1),
            bias_p.reshape(n_chunks, chunk, -1),
        ),
    )
    return logits.reshape(n_chunks * chunk, k)[:b]


@TRAINER_REGISTRY.register("Adapter-CoCoOp")
class Trainer(BaseTrainer):
    def build_model(self):
        config = self.config
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {config.model.backbone_name})")
        arch, clip_params = self.load_clip_model()
        print("Building CoCoOp adapter")
        self.arch = arch
        self.logit_scale = float(np.exp(np.asarray(clip_params["logit_scale"])))
        (
            ctx_vectors,
            self.token_prefix,
            self.token_suffix,
            self.tokenized,
            self.n_ctx,
        ) = build_prompt_parts(
            config, classnames, clip_params, self.keys.next(),
            # CoCoOp always uses shared context; the reference simply never
            # reads csc here — mutating the config would misrecord the
            # user's setting in metrics.json/config.json
            force_shared_ctx=True,
        )
        from clip_gp_tpu.methods.coop import trim_prompt_parts

        self.token_suffix = trim_prompt_parts(
            self.token_suffix, self.tokenized, self.n_ctx
        )
        vis_dim = int(arch.embed_dim)
        ctx_dim = int(arch.transformer_width)
        hidden = max(1, vis_dim // 16)
        k1, k2 = jax.random.split(self.keys.next())

        def lin_init(key, fan_in, shape):
            bound = 1 / np.sqrt(fan_in)
            return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

        # torch nn.Linear draws BOTH weight and bias from U(±1/sqrt(fan_in))
        # (ref: adapter_cocoop.py:36-40 uses default Linear init)
        k1b, k2b = jax.random.split(self.keys.next())
        self.params: Dict = {
            "ctx": ctx_vectors,
            "meta_fc1": {"w": lin_init(k1, vis_dim, (vis_dim, hidden)),
                         "b": lin_init(k1b, vis_dim, (hidden,))},
            "meta_fc2": {"w": lin_init(k2, hidden, (hidden, ctx_dim)),
                         "b": lin_init(k2b, hidden, (ctx_dim,))},
        }
        self.num_classes_k = len(classnames)
        self.opt = EpochOptimizer(config.optim)
        self.opt_state = self.opt.init(self.params)
        self._build_jitted_fns(arch, clip_params)

    def _build_jitted_fns(self, arch, clip_params):
        scale = self.logit_scale
        k = self.num_classes_k
        # prefix/suffix are [K, ~72, W] — explicit jit arguments, never
        # closure leaves (HLO-constant blowup crashes remote compile at
        # real class counts; CLAUDE.md hard rule)
        self._eot = self.tokenized.argmax(axis=-1)
        preprocess = self.preprocess

        self._clip_params = clip_params

        @jax.jit
        def encode(clip_params, images_u8):
            feats = clip_model.encode_image(clip_params, arch, preprocess(images_u8))
            return common.l2_normalize(feats)

        self._encode_norm = lambda images: encode(self._clip_params, images)

        # Blocked conditional prompts via the shared module-level helper
        # (one implementation for this trainer AND trial_vmap.CoCoOpSpec;
        # identical math whether chunked or single-call —
        # test_methods_e2e parity test).
        def logits_fn(clip_params, params, img_feats, prefix, suffix, eot):
            # img_feats: [B, D] normalized
            return conditional_logits(
                clip_params, arch, params, img_feats, prefix, suffix, eot,
                k, scale,
            )

        logits_jit = jax.jit(logits_fn)
        self._logits_fn = lambda params, feats: logits_jit(
            self._clip_params, params, feats,
            self.token_prefix, self.token_suffix, self._eot,
        )

        def train_step(clip_params, params, opt_state, img_feats, labels,
                       prefix, suffix, eot):
            def loss_fn(params):
                logits = logits_fn(
                    clip_params, params, img_feats, prefix, suffix, eot
                )
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
        # executable (the per-image text tower fwd/bwd otherwise costs one
        # dispatch round-trip per batch over a tunneled backend). Per-batch
        # (loss, top-1) come back as device arrays so the cadenced print
        # lines materialize once per epoch instead of once per printed batch.
        def step_for_scan(params, opt_state, f, l, clip_params,
                          prefix, suffix, eot):
            return train_step(
                clip_params, params, opt_state, f, l, prefix, suffix, eot
            )

        scan_jit = common.make_epoch_scan(
            step_for_scan,
            out_fn=lambda loss, logits, l: (
                loss, 100.0 * (logits.argmax(axis=-1) == l).mean()
            ),
        )
        self._epoch_scan = lambda params, opt_state, fb, lb: scan_jit(
            params, opt_state, fb, lb, self._clip_params,
            self.token_prefix, self.token_suffix, self._eot,
        )

    # ------------------------------------------------------------------
    def predict_logits(self, features):
        return self._logits_fn(self.params, common.l2_normalize(features))

    def trainable_state(self):
        return self.params

    def load_trainable_state(self, state):
        self.params = jax.tree.map(jnp.asarray, state)

    def remap_trainable_state(self, state, extra, idx):
        return state  # ctx + meta-net are class-agnostic

    # ------------------------------------------------------------------
    def train(self):
        start_time = time.time()
        self.build_model()
        self.before_train()
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.run_epoch()
            self.after_epoch()
        self.after_train()
        print(f"Training completed in {time.time() - start_time:.2f} seconds")

    def eval_logits_labels(self, split: str = "test"):
        loader = self.test_loader if split == "test" else self.val_loader
        bs = loader.batch_size
        logits_all, labels_all = [], []
        for batch in loader:
            imgs = batch["img"]
            n = imgs.shape[0]
            imgs = common.pad_batch(imgs, bs)
            feats = self._encode_norm(jnp.asarray(imgs))
            # device array, sliced lazily: dispatch overlaps the loader's
            # host decode; ONE transfer materializes everything at the end
            logits_all.append(self._logits_fn(self.params, feats)[:n])
            labels_all.append(batch["label"])
        return (
            np.asarray(jnp.concatenate(logits_all, axis=0)),
            np.concatenate(labels_all),
        )

    def run_epoch(self):
        losses = AverageMeter()
        loader = self.train_loader_x
        self.num_batches = len(loader)
        print_freq = int(self.config.train.print_freq)
        bs = loader.batch_size
        if self.num_batches > 1 and common.quiet_epochs_enabled(self._writer):
            # per-batch (loss, top-1) chunks in batch order, kept whole —
            # iterating scan outputs element-wise would re-issue O(batches)
            # tiny gather dispatches, negating the scan's dispatch savings
            loss_parts, acc_parts = [], []

            def scan_full(fb, lb, _keys, _extras):
                self.params, self.opt_state, (losses_dev, accs_dev) = (
                    self._epoch_scan(self.params, self.opt_state, fb, lb)
                )
                loss_parts.append(losses_dev)
                acc_parts.append(accs_dev)
                return losses_dev

            def step_one(f, l, _key, _extra):
                self.params, self.opt_state, loss, logits = self._train_step(
                    self.params, self.opt_state, f, l
                )
                acc = 100.0 * (jnp.argmax(logits, axis=-1) == l).mean()
                loss_parts.append(loss.reshape(1))
                acc_parts.append(acc.reshape(1))
                return loss

            common.quiet_epoch_advance(
                loader, self._encode_norm, scan_full, step_one, losses
            )
            printed = [
                i for i in range(self.num_batches)
                if (i + 1) % print_freq == 0 or self.num_batches < print_freq
            ]
            if printed:
                # one gather + one transfer for every printed line
                idx = jnp.asarray(printed)
                vals = np.asarray(jnp.stack([
                    jnp.concatenate(loss_parts)[idx],
                    jnp.concatenate(acc_parts)[idx],
                ], axis=1))
                for (loss_v, acc_v), i in zip(vals, printed):
                    print(
                        f"epoch [{self.epoch + 1}/{self.max_epoch}] "
                        f"batch [{i + 1}/{self.num_batches}] "
                        f"loss {loss_v:.4f} acc_train {acc_v:.4f}"
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
            meet_freq = (self.batch_idx + 1) % print_freq == 0
            if meet_freq or self.num_batches < print_freq:
                acc_train = compute_accuracy(np.asarray(logits), batch["label"])[0]
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}] "
                    f"batch [{self.batch_idx + 1}/{self.num_batches}] "
                    f"loss {float(loss):.4f} acc_train {acc_train:.4f}"
                )
            if self._writer is not None:  # guard: float(loss) is a host sync
                self.write_scalar(
                    "train/loss", float(loss),
                    self.epoch * self.num_batches + self.batch_idx,
                )
        self.opt_state = self.opt.set_epoch(self.opt_state, self.epoch + 1)
        return float(losses.avg)
