"""The Adapter method — baseline and GP-weighted variants (the flagship).

Reference behavior (ref: trainers/adapter.py): a frozen CLIP backbone with
per-class·template text embeddings [K,M,D], an identity-initialized bias-free
visual projection W [D,D], and one of three template-weighting heads:
  - GP weighter (``use_gp``): variational GP samples template weights;
  - trainable per-class weight logits (``train_template_weights``);
  - linear weighting head (``use_linear_template_weighting``).

Training is **feature-cached**: the image tower runs exactly once per split,
then every epoch iterates device-resident features. Loss = MC-averaged CE over
S prototype samples + β·KL + (λ/shots)‖W−I‖² (ref: compute_loss:387-535).
Eval MC-averages logits over ``gp_num_mc_samples_eval`` samples.

TPU-native structure: the whole step (GP sampling → sparsemax → S
cosine-CE → KL → L2 → adamw update) is ONE jitted function; the epoch loop
feeds fixed-size batch slices so XLA compiles a single executable.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.core.registry import TRAINER_REGISTRY
from clip_gp_tpu.data.templates import get_templates
from clip_gp_tpu.gp import svgp
from clip_gp_tpu.methods import common
from clip_gp_tpu.ops.metrics import AverageMeter, compute_accuracy
from clip_gp_tpu.runtime.optim import MultiGroupOptimizer
from clip_gp_tpu.runtime.trainer_base import BaseTrainer


@TRAINER_REGISTRY.register("Adapter")
class Trainer(BaseTrainer):
    def __init__(self, config, dataset_manager):
        if getattr(config.dataset, "full_finetune", False):
            config.dataset.num_shots = 0
        super().__init__(config, dataset_manager)
        self.use_gp = bool(config.adapter.use_gp)
        self.s_train = max(1, int(config.adapter.gp_num_mc_samples_train or 1))
        self.s_eval = max(1, int(config.adapter.gp_num_mc_samples_eval or 1))
        # diagnostics-only RNG stream: verbose quick-accuracy draws must not
        # advance the training/eval stream (print cadence would otherwise
        # change results)
        from clip_gp_tpu.core.seeding import KeySequence

        self._diag_keys = KeySequence(int(config.seed) + 7919)

    # ------------------------------------------------------------------
    def build_model(self):
        config = self.config
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {config.model.backbone_name})")
        arch, clip_params = self.load_clip_model()
        print("Building custom CLIP")
        self.templates = get_templates(config)
        self.text_embeddings = common.encode_templates(
            clip_params, arch, classnames, self.templates
        )  # [K,M,D]
        self.logit_scale = float(np.exp(np.asarray(clip_params["logit_scale"])))
        k, m, d = self.text_embeddings.shape

        self.params: Dict = {"visual_proj": jnp.eye(d)}
        self.gp_static = None
        self.gp_buffers = None
        self.mode = "uniform"
        train_tw = bool(config.adapter.train_template_weights)
        use_linear = bool(config.adapter.use_linear_template_weighting)
        if self.use_gp:
            self.mode = "gp"
            self.gp_static, gp_params, self.gp_buffers = svgp.create_gp(
                self.text_embeddings, config
            )
            self.params["gp"] = gp_params
        elif train_tw and not use_linear:
            self.mode = "logits"
            # always per-class [K,M]: shared_template_weights shares only
            # the INITIALIZATION in the reference (the [1,M] mean row is
            # copy_-broadcast into the always-[K,M] parameter, whose rows
            # then receive per-class gradients and diverge;
            # ref: adapter.py:174-176, 624-634)
            self.params["template_logits"] = jnp.zeros((k, m))
        elif use_linear:
            self.mode = "linear"
            self.params["template_weight_linear"] = 0.01 * jax.random.normal(
                self.keys.next(), (d, 1)
            )

        self._build_optimizer()
        self._build_jitted_fns()

    def _build_optimizer(self):
        config = self.config
        freeze_proj = bool(config.adapter.freeze_visual_proj)

        def label_fn(params):
            labels = {}
            for name in params:
                if name == "visual_proj":
                    labels[name] = "frozen" if freeze_proj else "base"
                elif name == "gp":
                    labels[name] = jax.tree.map(lambda _: "gp", params[name])
                else:
                    labels[name] = "base"
            return labels

        group_lrs = {"base": float(config.optim.lr), "frozen": None}
        if self.use_gp:
            group_lrs["gp"] = float(config.adapter.gp_lr)
        self.opt = MultiGroupOptimizer(config.optim, group_lrs, label_fn)
        self.opt_state = self.opt.init(self.params)

    # ------------------------------------------------------------------
    def _consts(self):
        """Large frozen arrays passed as explicit jit arguments (never closed
        over — closure constants get baked into every executable)."""
        return {"text_embeddings": self.text_embeddings,
                "gp_buffers": self.gp_buffers if self.mode == "gp" else {}}

    def _prototypes(self, params, key, num_samples: int, consts):
        """[S,K,D] (GP) or [K,D] (deterministic heads)."""
        if self.mode == "gp":
            protos, w = svgp.sample_prototypes(
                self.gp_static, params["gp"], consts["gp_buffers"], key, num_samples
            )
            return protos, w
        e = consts["text_embeddings"]
        if self.mode == "logits":
            logits = params["template_logits"]
            if logits.shape[0] == 1 and e.shape[0] > 1:
                logits = jnp.broadcast_to(logits, e.shape[:2])
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("km,kmd->kd", w, e), w
        if self.mode == "linear":
            logits = (e @ params["template_weight_linear"])[..., 0]
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("km,kmd->kd", w, e), w
        return e.mean(axis=1), None

    def _build_jitted_fns(self):
        scale = self.logit_scale
        config = self.config
        shots = int(config.dataset.num_shots)
        l2_lambda = float(config.adapter.l2_lambda)
        gp_beta = float(config.adapter.gp_beta)
        freeze_proj = bool(config.adapter.freeze_visual_proj)

        def loss_fn(params, features, labels, key, consts):
            projected = features @ params["visual_proj"].T
            f_norm = common.l2_normalize(projected)
            protos, _ = self._prototypes(params, key, self.s_train, consts)
            if protos.ndim == 3:
                ce = common.mc_cross_entropy(f_norm, protos, labels, scale)
            else:
                logits = common.cosine_logits(projected, protos, scale)
                ce = common.cross_entropy(logits, labels)
            total = ce
            kl = jnp.zeros(())
            if self.mode == "gp":
                kl = svgp.kl_divergence(params["gp"]).sum()
                total = total + gp_beta * kl
            l2 = jnp.zeros(())
            if not freeze_proj and shots > 0:
                w = params["visual_proj"]
                l2 = ((w - jnp.eye(w.shape[0])) ** 2).sum() * (l2_lambda / shots)
                total = total + l2
            return total, {"ce": ce, "kl": kl, "l2_reg": l2}

        def train_step(params, opt_state, features, labels, key, consts):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, features, labels, key, consts
            )
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            # "base" = every non-GP TRAINABLE (visual_proj + template
            # logits/linear head), matching the reference's two optimizer
            # param groups (ref: trainers/adapter.py:298-311): the reference
            # group holds only requires_grad params, so under
            # freeze_visual_proj its base norm reads 0.0 — a frozen param's
            # raw gradient must not leak into the diagnostic
            base_leaves = [
                leaf
                for name2, sub in grads.items()
                if name2 != "gp" and not (name2 == "visual_proj" and freeze_proj)
                for leaf in jax.tree.leaves(sub)
            ]
            gnorms = {
                "base": jnp.sqrt(sum(jnp.sum(g**2) for g in base_leaves)),
                "gp": jnp.sqrt(
                    sum(jnp.sum(g**2) for g in jax.tree.leaves(grads.get("gp", 0.0)))
                )
                if self.mode == "gp"
                else jnp.zeros(()),
            }
            return params, opt_state, loss, aux, gnorms

        step_jit = jax.jit(train_step, donate_argnums=(0, 1))
        self._train_step = lambda p, o, f, l, k: step_jit(
            p, o, f, l, k, self._consts()
        )

        def epoch_scan(params, opt_state, features_b, labels_b, keys, consts):
            """Whole epoch as one executable: lax.scan over equal-size batches
            [n_batches, B, ...] — one dispatch per epoch instead of one per
            batch (dispatch latency dominates on tunneled backends)."""

            def body(carry, batch):
                params, opt_state = carry
                feats, labels, key = batch
                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, feats, labels, key, consts
                )
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (features_b, labels_b, keys)
            )
            return params, opt_state, losses

        scan_jit = jax.jit(epoch_scan, donate_argnums=(0, 1))
        self._epoch_scan = lambda p, o, f, l, k: scan_jit(
            p, o, f, l, k, self._consts()
        )

        def eval_logits(params, features, key, consts):
            projected = features @ params["visual_proj"].T
            protos, _ = self._prototypes(params, key, self.s_eval, consts)
            return common.cosine_logits(projected, protos, scale)

        eval_jit = jax.jit(eval_logits)
        self._eval_logits = lambda p, f, k: eval_jit(p, f, k, self._consts())

        def train_acc_logits(params, features, key, consts):
            projected = features @ params["visual_proj"].T
            protos, _ = self._prototypes(params, key, self.s_train, consts)
            return common.cosine_logits(projected, protos, scale)

        acc_jit = jax.jit(train_acc_logits)
        self._train_acc_logits = lambda p, f, k: acc_jit(p, f, k, self._consts())

    # ------------------------------------------------------------------
    def predict_logits(self, features):
        return self._eval_logits(self.params, features, self.keys.next())

    def _test_features_dev(self):
        """Device-resident copy of the cached test features, uploaded once
        (re-uploading per diagnostic print costs a full H2D of the test
        matrix each time — 100 MB at ImageNet scale)."""
        if getattr(self, "_features_test_dev", None) is None:
            self._features_test_dev = jnp.asarray(self.features_test)
        return self._features_test_dev

    def eval_logits_labels(self, split: str = "test"):
        if split == "test" and hasattr(self, "features_test"):
            import numpy as np

            logits = np.asarray(self.predict_logits(self._test_features_dev()))
            return logits, self.labels_test
        return super().eval_logits_labels(split)

    def trainable_state(self):
        return self.params

    def load_trainable_state(self, state):
        self.params = jax.tree.map(jnp.asarray, state)

    def adopt_reference_state(self, state, extra):
        """Reference-checkpoint adoption (runtime/ref_checkpoint.py): the
        converted GP state lives in the CHECKPOINT's PCA basis (torch SVD —
        column signs differ from our numpy SVD), so its buffers must replace
        the ones build_model derived, after shape/mode validation."""
        has_gp = "gp" in state
        if has_gp != (self.mode == "gp"):
            raise ValueError(
                "reference checkpoint "
                + ("carries" if has_gp else "lacks")
                + " GP state but this config has USE_GP "
                + ("disabled" if has_gp else "enabled")
                + " — pass the run's own config"
            )
        for name, present in (
            ("template_logits", self.mode == "logits"),
            ("template_weight_linear", self.mode == "linear"),
        ):
            if (name in state) != present:
                raise ValueError(
                    f"reference checkpoint template-weight mode does not "
                    f"match this config (mode={self.mode!r}, checkpoint "
                    f"keys={sorted(state)})"
                )
        bufs = extra.get("gp_buffers")
        if bufs is not None:
            newb = {k: jnp.asarray(v) for k, v in bufs.items()}
            k_ck, m_ck, _ = newb["templates"].shape
            d_ck = int(newb["templates_red"].shape[-1])
            if (k_ck, m_ck, d_ck) != (
                self.gp_static.num_classes,
                self.gp_static.num_templates,
                self.gp_static.red_dim,
            ):
                raise ValueError(
                    f"reference GP checkpoint shape (K={k_ck}, M={m_ck}, "
                    f"d={d_ck}) does not match this config "
                    f"(K={self.gp_static.num_classes}, "
                    f"M={self.gp_static.num_templates}, "
                    f"d={self.gp_static.red_dim})"
                )
            kernel_key_sets = {
                "rbf": {"raw_lengthscale", "raw_outputscale"},
                "matern": {"raw_lengthscale"},
                "linear": {"raw_variance"},
            }
            kernel_keys = kernel_key_sets[self.gp_static.kernel_type]
            # key-SET equality, not just no-missing: an rbf checkpoint's
            # {lengthscale, outputscale} is a superset of matern's
            # {lengthscale}, so a missing-only check would silently evaluate
            # rbf-fitted params under Matern math
            present = set(state["gp"]) & set().union(*kernel_key_sets.values())
            if present != kernel_keys:
                raise ValueError(
                    f"reference GP checkpoint kernel does not match this "
                    f"config's {self.gp_static.kernel_type!r} kernel "
                    f"(checkpoint kernel params {sorted(present)}, "
                    f"expected {sorted(kernel_keys)})"
                )
            self.gp_buffers = newb
        return state

    def extra_checkpoint_state(self):
        # GP buffers (PCA basis + reduced templates + prior mean) are derived
        # from the TRAINING dataset's text; a class-subset reload must reuse
        # them row-selected — rebuilding from the eval dataset would change
        # the PCA basis under the trained params
        if self.mode == "gp":
            return {"gp_buffers": self.gp_buffers}
        return {}

    # per-class GP param leaves (leading dim K); tmp_bias [1,M] and A [d,d]
    # are class-agnostic
    _GP_PER_CLASS = (
        "inducing_token", "variational_mean", "chol_variational_covar",
        "cls_bias", "raw_lengthscale", "raw_outputscale", "raw_variance",
    )
    # "inducing_frozen" stays listed for checkpoints written before the
    # buffer was deduplicated into templates_red (guarded by `in bufs`)
    _GP_BUF_PER_CLASS = ("templates", "templates_red", "inducing_frozen", "f0")

    def remap_trainable_state(self, state, extra, idx):
        take = lambda a: jnp.asarray(np.asarray(a)[idx])  # noqa: E731
        out = dict(state)
        if "template_logits" in out and np.asarray(out["template_logits"]).shape[0] > 1:
            out["template_logits"] = take(out["template_logits"])
        if "gp" in out:
            gp = dict(out["gp"])
            for name in self._GP_PER_CLASS:
                if name in gp:
                    gp[name] = take(gp[name])
            out["gp"] = gp
            bufs = extra.get("gp_buffers")
            if bufs is None:
                raise ValueError(
                    "GP checkpoint predates gp_buffers saving; cannot remap "
                    "across datasets — re-train or evaluate on the full "
                    "class set"
                )
            newb = {k: jnp.asarray(v) for k, v in bufs.items()}
            for name in self._GP_BUF_PER_CLASS:
                if name in bufs:
                    newb[name] = take(bufs[name])
            if int(newb["f0"].shape[1]) != self.gp_static.num_templates:
                raise ValueError(
                    "checkpoint template count "
                    f"{int(newb['f0'].shape[1])} != configured "
                    f"{self.gp_static.num_templates}"
                )
            self.gp_buffers = newb
            self.gp_static = self.gp_static._replace(num_classes=len(idx))
        return out

    # ------------------------------------------------------------------
    def train(self):
        start_time = time.time()
        self.build_model()

        # zero-shot block on pre-extracted test features
        self.labels_test, zs_logits, self.features_test = self.extract_features(
            "test"
        )
        self._features_test_dev = None  # invalidate the device copy
        self.compute_zero_shot_block(zs_logits, self.labels_test)

        self.labels_train, _, self.features_train = self.extract_features("train")

        # score template weights on the full train split when configured
        # (ref: trainers/adapter.py:71-100; shared with the GP pre-stage
        # warm starts of CLIP-Adapter / TaskRes / Tip-Adapter)
        prefit = common.prefit_full_set_features(self.config, self)
        if prefit is not None:
            tw_feats, tw_labels = prefit
        else:
            tw_feats, tw_labels = self.features_train, self.labels_train

        template_weights = common.get_template_weights(
            self.config,
            self.text_embeddings,
            jnp.asarray(tw_feats),
            jnp.asarray(tw_labels),
            self.logit_scale,
        )
        full_template_weights = template_weights
        if self.config.adapter.shared_template_weights:
            template_weights = template_weights.mean(axis=0, keepdims=True)

        if self.mode == "logits":
            logits_init = jnp.log(jnp.clip(template_weights, 1e-12, None))
            if logits_init.shape != self.params["template_logits"].shape:
                logits_init = jnp.broadcast_to(
                    logits_init, self.params["template_logits"].shape
                )
            self.params["template_logits"] = logits_init
        elif self.mode == "uniform":
            # the non-trainable baseline's forward ignores these (reference
            # executed behavior: the plain tensor fails the isinstance
            # nn.Parameter check and forward falls back to the uniform mean,
            # ref: adapter.py:215-226, 636) — kept ONLY for the
            # finetune-on-test promotion (ref: adapter.py:978-981)
            self._baseline_template_weights = template_weights
        elif self.mode == "gp":
            # GP warm start always gets per-class [K,M] weights — a shared
            # [1,M] row would desync variational_mean from the [K,P] optimizer
            # state
            self.params["gp"] = svgp.initialize_from_weights(
                self.params["gp"], full_template_weights
            )
            print("[GP] One-step initialization applied to GP weights.")

        self.before_train()
        from clip_gp_tpu.runtime.profiling import maybe_trace, phase_timer

        # same jax.profiler trace hook as BaseTrainer.train — this override
        # must not silently drop profiling for the flagship trainer
        with maybe_trace("train"), phase_timer("train_epochs"):
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                self.run_epoch()
                self.after_epoch()

        if getattr(self.config.adapter, "finetune_on_test", False):
            self._finetune_on_test()

        self.after_train()
        self._print_weight_stats()
        print(f"Training completed in {time.time() - start_time:.2f} seconds")

    # ------------------------------------------------------------------
    def run_epoch(self):
        losses = AverageMeter()
        batch_time = AverageMeter()
        # features uploaded once; the per-epoch shuffle stays a host-side
        # numpy draw (same construction as the reference,
        # ref: trainers/adapter.py:732-735) but the gather runs on device —
        # no re-upload of the feature cache every epoch
        if not hasattr(self, "_features_train_dev"):
            self._features_train_dev = jnp.asarray(self.features_train)
            self._labels_train_dev = jnp.asarray(
                self.labels_train.astype(np.int32)
            )
        idx = np.random.rand(self.features_train.shape[0]).argsort(axis=0)
        idx_dev = jnp.asarray(idx.astype(np.int32))
        features = self._features_train_dev[idx_dev]
        labels_dev = self._labels_train_dev[idx_dev]
        labels_np = self.labels_train[idx]

        batch_size = self.config.dataloader.batch_size_train
        slices = common.batch_slices(self.features_train.shape[0], batch_size)
        self.num_batches = len(slices)
        print_freq = int(self.config.train.print_freq)
        verbose_epoch = (self.epoch + 1) % 10 == 0 or self.epoch == 0

        # one key draw per epoch, identical in both paths, so quiet-scan and
        # verbose epochs consume the RNG stream the same way (enabling
        # TensorBoard must not change training results)
        if self.num_batches == 1:
            epoch_keys = self.keys.next()[None]
        else:
            # the +1-then-discard is LOAD-BEARING for reproducibility: it is
            # how the stream consumed keys when baselines were recorded, and
            # "simplifying" to next(num_batches) would silently shift every
            # subsequent key (bit-exact same-seed runs are a tested contract)
            epoch_keys = self.keys.next(self.num_batches + 1)[: self.num_batches]

        if (not verbose_epoch and self.num_batches > 1
                and common.quiet_epochs_enabled(self._writer)):
            # quiet epoch: run all batches as ONE scanned executable
            n_full = self.num_batches * batch_size
            feats_b = features[:n_full].reshape(
                self.num_batches, batch_size, -1
            )
            labels_b = labels_dev[:n_full].reshape(self.num_batches, batch_size)
            self.params, self.opt_state, losses_dev = self._epoch_scan(
                self.params, self.opt_state, feats_b, labels_b, epoch_keys
            )
            self.opt_state = self.opt.set_epoch(self.opt_state, self.epoch + 1)
            # lazy device scalar — same contract as the eager path below
            return {"loss": losses_dev.mean()}

        end = time.time()
        for self.batch_idx, (lo, hi) in enumerate(slices):
            self.params, self.opt_state, loss, aux, gnorms = self._train_step(
                self.params,
                self.opt_state,
                features[lo:hi],
                labels_dev[lo:hi],
                epoch_keys[self.batch_idx],
            )
            # loss stays a device array: materializing per step would insert a
            # host sync (full RTT on tunneled backends) into every batch
            losses.update(loss)
            batch_time.update(time.time() - end)

            meet_freq = (self.batch_idx + 1) % print_freq == 0
            few_batches = self.num_batches < print_freq
            if (meet_freq or few_batches) and verbose_epoch:
                loss = float(loss)
                acc_train = compute_accuracy(
                    np.asarray(
                        self._train_acc_logits(
                            self.params, features[lo:hi], self._diag_keys.next()
                        )
                    ),
                    labels_np[lo:hi],
                )[0]
                acc_test = compute_accuracy(
                    np.asarray(
                        self._eval_logits(
                            self.params,
                            self._test_features_dev(),
                            self._diag_keys.next(),
                        )
                    ),
                    self.labels_test,
                )[0]
                nb_remain = (self.num_batches - self.batch_idx - 1) + (
                    self.max_epoch - self.epoch - 1
                ) * self.num_batches
                eta = int(batch_time.avg * nb_remain)
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}] "
                    f"batch [{self.batch_idx + 1}/{self.num_batches}] "
                    f"loss {loss:.4f} acc_train {acc_train:.4f} "
                    f"acc_test {acc_test:.4f} eta {eta}s"
                )
                print(
                    f"  [DBG] loss: CE={float(aux['ce']):.4f} "
                    f"KL={float(aux['kl']):.4f} l2_reg={float(aux['l2_reg']):.4f} "
                    f"Total={loss:.4f}"
                )
                print(
                    f"  [DBG] grad_norms: base={float(gnorms['base']):.6f} "
                    f"gp={float(gnorms['gp']):.6f}"
                )
                if self.mode == "gp":
                    self._print_gp_diagnostics()
            if self._writer is not None:  # TB opt-in accepts the per-step sync
                n_iter = self.epoch * self.num_batches + self.batch_idx
                self.write_scalar("train/loss", float(loss), n_iter)
                self.write_scalar(
                    "train/lr", self.opt.current_lrs.get("base", 0.0), n_iter
                )
            end = time.time()

        self.opt_state = self.opt.set_epoch(self.opt_state, self.epoch + 1)
        # lazy device scalar (uniform with the quiet path); float() if needed
        return {"loss": losses.avg}

    def _print_gp_diagnostics(self):
        gp = self.params["gp"]
        q_m = np.asarray(gp["variational_mean"])
        lq = np.tril(np.asarray(gp["chol_variational_covar"]))
        q_var = np.einsum("kpq,krq->kpr", lq, lq).diagonal(axis1=-2, axis2=-1)
        parts = [
            f"q_m[min={q_m.min():.4f} max={q_m.max():.4f}]",
            f"q_var[min={q_var.min():.4f} max={q_var.max():.4f}]",
        ]
        if "raw_lengthscale" in gp:
            ls = float(np.mean(np.log1p(np.exp(np.asarray(gp["raw_lengthscale"])))))
            parts.append(f"lengthscale={ls:.6f}")
        if "raw_outputscale" in gp:
            os_ = float(np.mean(np.log1p(np.exp(np.asarray(gp["raw_outputscale"])))))
            parts.append(f"outputscale={os_:.6f}")
        print("  [DBG][GP] " + " ".join(parts))
        w = np.asarray(
            svgp.posterior_mean_weights(self.gp_static, gp, self.gp_buffers)
        )
        w0 = ", ".join(f"{v:.3f}" for v in w[0])
        print(f"  [DBG][GP] template_weights[class=0]: [{w0}]")

    def _print_weight_stats(self):
        if self.mode == "gp":
            _, w = svgp.sample_prototypes(
                self.gp_static,
                self.params["gp"],
                self.gp_buffers,
                self.keys.next(),
                self.s_eval,
            )
            w = np.asarray(w)
            mean_vals = w.mean(axis=0)[0]
            std_vals = w.std(axis=0)[0]
            print(
                "Weights: mean = [{}]".format(
                    ", ".join(f"{v:.4f}" for v in mean_vals)
                )
            )
            print(
                "          std = [{}]".format(
                    ", ".join(f"{v:.4f}" for v in std_vals)
                )
            )
        elif self.mode in ("logits", "linear"):
            _, w = self._prototypes(self.params, self.keys.next(), 1, self._consts())
            w = np.asarray(w)
            mean_vals = w.mean(axis=0)
            print(
                "Weights: mean = [{}]".format(
                    ", ".join(f"{v:.4f}" for v in mean_vals)
                )
            )

    # ------------------------------------------------------------------
    def _finetune_on_test(self):
        """Sanity ceiling check: optimize only the weighting head on the test
        set (ref: trainers/adapter.py:968-1065). Not for regular training.

        Mirrors the reference's executed loop: mini-batches of
        ``gp_test_batch_size`` (default test batch size) over the ONCE-shuffled
        test features, 100 epochs, the configured lr scheduler stepped per
        epoch, and a per-epoch test-accuracy print. In 'uniform' mode the
        reference promotes the stored template-WEIGHTS tensor to a trainable
        Parameter whose values the forward then treats as LOGITS
        (ref: adapter.py:978-981 + 215-222) — reproduced here by switching to
        the 'logits' head initialized with the weight VALUES (softmax of a
        constant uniform row is uniform, so the starting point is unchanged).
        """
        if self.mode == "uniform":
            tw = getattr(self, "_baseline_template_weights", None)
            if tw is None:
                k, m = self.text_embeddings.shape[:2]
                tw = jnp.full((k, m), 1.0 / max(m, 1))
            self.params["template_logits"] = jnp.asarray(tw)
            self.mode = "logits"
        freeze = {"visual_proj"}

        def label_fn(params):
            labels = {}
            for name in params:
                if name in freeze:
                    labels[name] = "frozen"
                elif name == "gp":
                    labels[name] = jax.tree.map(lambda _: "base", params[name])
                else:
                    labels[name] = "base"
            return labels

        opt = MultiGroupOptimizer(
            self.config.optim,
            {"base": float(self.config.optim.lr), "frozen": None},
            label_fn,
        )
        opt_state = opt.init(self.params)
        features_all = self._test_features_dev()
        n = int(features_all.shape[0])
        # one shuffle per run from the process-global numpy stream
        # (ref: adapter.py:1020-1022 uses np.random.rand(N).argsort())
        idx = np.random.rand(n).argsort(axis=0)
        features_all = jnp.asarray(np.asarray(features_all)[idx])
        labels_all = jnp.asarray(self.labels_test.astype(np.int32)[idx])
        scale = self.logit_scale
        default_bs = int(self.config.dataloader.batch_size_test)
        bs = max(1, int(
            getattr(self.config.adapter, "gp_test_batch_size", 0) or default_bs
        ))
        num_batches = int(np.ceil(n / float(bs)))
        num_epochs = 100
        print(
            "[SANITY] Template weights fine-tuning on TEST set: "
            f"epochs={num_epochs} bs={bs} lr={float(self.config.optim.lr)}"
        )

        def loss_fn(params, key, consts, features, labels):
            projected = features @ params["visual_proj"].T
            f_norm = common.l2_normalize(projected)
            protos, _ = self._prototypes(params, key, self.s_train, consts)
            if protos.ndim == 3:
                ce = common.mc_cross_entropy(f_norm, protos, labels, scale)
            else:
                ce = common.cross_entropy(
                    common.cosine_logits(projected, protos, scale), labels
                )
            if self.mode == "gp":
                ce = ce + float(self.config.adapter.gp_beta) * svgp.kl_divergence(
                    params["gp"]
                ).sum()
            return ce

        # features/labels are explicit jit arguments — the test set is a
        # large array, and closure leaves become HLO constants (CLAUDE.md)
        @jax.jit
        def step(params, opt_state, key, consts, features, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, key, consts, features, labels
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

        # full-size batch prefix + one ragged tail (each batch shape compiles
        # once; the reference's last short batch is preserved exactly)
        consts = self._consts()
        for ep in range(num_epochs):
            opt_state = opt.set_epoch(opt_state, ep)
            running = jnp.zeros(())
            for b in range(num_batches):
                b0, b1 = b * bs, min((b + 1) * bs, n)
                self.params, opt_state, loss = step(
                    self.params, opt_state, self.keys.next(), consts,
                    features_all[b0:b1], labels_all[b0:b1],
                )
                running = running + loss * (b1 - b0)
            logits = np.asarray(
                self._eval_logits(self.params, features_all, self.keys.next())
            )
            acc = compute_accuracy(logits, self.labels_test[idx])[0]
            print(
                f"[SANITY] Template weights test fine-tune epoch "
                f"{ep + 1}/{num_epochs}: loss={float(running) / n:.4f} "
                f"acc_test={acc:.4f}"
            )
