"""Vmapped multi-seed trial training — the TPU-native replacement for the
reference's process-per-GPU trial scheduling (ref: utils/hparam_search.py:201-281,
SURVEY §2.1).

The canonical sweep axis is seeds {1..5}: identical config, different few-shot
splits and RNG. Per trial, all trainable state is tiny (a [D,D] projection +
GP variational parameters), so trials become a leading ``vmap`` axis:

1. every seed's few-shot split is sampled on host (reference-compatible
   pickle caches), and the **union** of selected images is encoded once —
   the frozen tower runs once for all seeds instead of once per seed;
2. per-seed features are gathers from the union  [T, N, D];
3. one jitted, vmapped train step advances all T trials per batch — the tiny
   per-trial matmuls batch into MXU-sized work;
4. eval MC-averages logits per trial on the shared test features, and each
   trial writes its own reference-schema metrics.json.

On a multi-chip mesh the same [T, ...] arrays shard over a ``trial`` axis
(pure data placement — trials never communicate), which is the whole
multi-chip story for this workload.

Supports the Adapter method (baseline trainable-weights and GP variants) —
the method whose sweeps dominate the reference experiment matrix.
"""

from __future__ import annotations

import copy
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.data.templates import get_templates
from clip_gp_tpu.gp import svgp
from clip_gp_tpu.methods import common
from clip_gp_tpu.ops.metrics import (
    compute_accuracy,
    compute_aece_with_bins,
    compute_ece_with_bins,
)
from clip_gp_tpu.runtime.optim import build_lr_schedule


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


class VmappedAdapterTrials:
    """Train the Adapter method for several seeds simultaneously.

    With ``mesh`` (axis name ``trial``), the stacked [T, ...] trial state and
    per-trial feature gathers shard over devices — trials never communicate,
    so this is pure placement and scales a sweep linearly across chips.
    """

    SUPPORTED_HPARAMS = ("gp_beta", "gp_lr", "lr", "l2_lambda")

    def __init__(self, config, seeds: Sequence[int], mesh=None,
                 trial_overrides: Optional[Sequence[Dict]] = None):
        """``trial_overrides``: optional per-trial dicts of scalar
        hyperparameters (keys among SUPPORTED_HPARAMS) — grid cells join the
        vmap axis alongside seeds."""
        self.config = config
        self.seeds = list(seeds)
        self.mesh = mesh
        self.trial_overrides = (
            [dict(o) for o in trial_overrides]
            if trial_overrides is not None
            else [{} for _ in self.seeds]
        )
        assert len(self.trial_overrides) == len(self.seeds)
        for o in self.trial_overrides:
            unknown = set(o) - set(self.SUPPORTED_HPARAMS)
            assert not unknown, f"unsupported vmapped hparams: {unknown}"
        self.use_gp = bool(config.adapter.use_gp)
        self.s_train = max(1, int(config.adapter.gp_num_mc_samples_train or 1))
        self.s_eval = max(1, int(config.adapter.gp_num_mc_samples_eval or 1))

    def _shard_trials(self, tree):
        """Place [T, ...] arrays with the leading axis over the trial mesh axis."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P("trial"))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    # ------------------------------------------------------------------
    def _build_per_seed_splits(self):
        """Sample every seed's few-shot split; returns (union datums,
        per-seed index arrays [T, N], test dm of the last seed)."""
        from clip_gp_tpu.data.pipeline import build_data_manager

        per_seed_items: List[List] = []
        dm = None
        for seed in self.seeds:
            cfg = copy.deepcopy(self.config)
            cfg.seed = seed
            set_random_seed(seed)
            dm = build_data_manager(cfg)
            per_seed_items.append(list(dm.dataset.train_x))
        counts = {len(items) for items in per_seed_items}
        if len(counts) != 1:
            raise ValueError(
                f"Seeds produced unequal few-shot sizes {counts}; "
                "vmapped trials need a rectangular trial axis"
            )
        union: Dict[str, int] = {}
        union_items = []
        for items in per_seed_items:
            for item in items:
                if item.impath not in union:
                    union[item.impath] = len(union_items)
                    union_items.append(item)
        index = np.asarray(
            [[union[i.impath] for i in items] for items in per_seed_items],
            dtype=np.int32,
        )
        labels = np.asarray(
            [[i.label for i in items] for items in per_seed_items], dtype=np.int32
        )
        return union_items, index, labels, dm

    # ------------------------------------------------------------------
    def run(self, trial_outdirs: Optional[Sequence[str]] = None) -> List[Dict]:
        config = self.config
        t_trials = len(self.seeds)
        start_time = time.time()

        union_items, seed_index, seed_labels, dm = self._build_per_seed_splits()
        self.dm = dm
        classnames = dm.dataset.classnames

        # one shared frozen-tower pass: union of all seeds' few-shot images
        from clip_gp_tpu.data.pipeline import BatchLoader
        from clip_gp_tpu.runtime.trainer_base import BaseTrainer

        base = BaseTrainer(config, dm)
        arch, clip_params = base.load_clip_model()
        templates = get_templates(config)
        text_embeddings = common.encode_templates(
            clip_params, arch, classnames, templates
        )
        logit_scale = float(np.exp(np.asarray(clip_params["logit_scale"])))
        k, m, d = text_embeddings.shape

        union_loader = BatchLoader(
            union_items,
            dm.tfm_train,
            config.dataloader.batch_size_train,
            shuffle=False,
            drop_last=False,
            num_workers=config.dataloader.num_workers,
        )
        _, union_feats = base.encode_images_batched(union_loader)
        labels_test, feats_test = base.encode_images_batched(
            dm.test_loader, cacheable=True
        )

        feats_train = jnp.asarray(union_feats)[jnp.asarray(seed_index)]  # [T,N,D]
        labels_train = jnp.asarray(seed_labels)  # [T,N]
        feats_test_j = jnp.asarray(feats_test)
        feats_train = self._shard_trials(feats_train)
        labels_train = self._shard_trials(labels_train)

        # per-trial params (identical init; divergence comes from RNG/shuffles)
        gp_static = None
        gp_buffers = None
        if self.use_gp:
            gp_static, gp_params0, gp_buffers = svgp.create_gp(
                text_embeddings, config
            )

        def init_trial(seed):
            params: Dict = {"visual_proj": jnp.eye(d)}
            if self.use_gp:
                params["gp"] = gp_params0
            else:
                params["template_logits"] = jnp.zeros((k, m))
            return params

        params = _stack([init_trial(s) for s in self.seeds])
        # shallow copy: the warm start below replaces top-level entries, so
        # this snapshot keeps the pre-warm-start arrays
        zs_params = dict(params)

        # warm start per trial from each seed's template-weight scan
        tw = []
        for t in range(t_trials):
            tw.append(
                common.get_template_weights(
                    config,
                    text_embeddings,
                    feats_train[t],
                    labels_train[t],
                    logit_scale,
                )
            )
        tw = jnp.stack(tw)  # [T,K,M]
        if self.use_gp:
            params["gp"] = jax.vmap(svgp.initialize_from_weights)(params["gp"], tw)
        else:
            params["template_logits"] = jnp.log(jnp.clip(tw, 1e-12, None))

        # one optimizer state per trial (adam moments are elementwise, so
        # stacking trials is exact). The transform carries NO learning rate:
        # per-trial lrs (which may differ across the vmap axis) scale the
        # updates afterwards, with the host-side schedule factor on top.
        import optax

        schedule = build_lr_schedule(config.optim)
        base_lr = float(config.optim.lr)

        def hp(name, default):
            return jnp.asarray(
                [float(o.get(name, default)) for o in self.trial_overrides],
                dtype=jnp.float32,
            )

        lr_t = hp("lr", base_lr)  # [T]
        gp_lr_t = hp("gp_lr", float(config.adapter.gp_lr))
        gp_beta_t = hp("gp_beta", float(config.adapter.gp_beta))
        l2_t = hp("l2_lambda", float(config.adapter.l2_lambda))

        tx = optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(float(config.optim.weight_decay)),
        )
        params = self._shard_trials(params)
        opt_state = tx.init(params)

        shots = int(config.dataset.num_shots)
        scale = logit_scale
        use_gp = self.use_gp

        def trial_loss(p, feats, labels, key, hps):
            projected = feats @ p["visual_proj"].T
            f_norm = common.l2_normalize(projected)
            if use_gp:
                protos, _ = svgp.sample_prototypes(
                    gp_static, p["gp"], gp_buffers, key, self.s_train
                )
                ce = common.mc_cross_entropy(f_norm, protos, labels, scale)
                total = ce + hps["gp_beta"] * svgp.kl_divergence(p["gp"]).sum()
            else:
                w = jax.nn.softmax(p["template_logits"], axis=-1)
                protos = jnp.einsum("km,kmd->kd", w, text_embeddings)
                total = common.cross_entropy(
                    common.cosine_logits(projected, protos, scale), labels
                )
            if shots > 0:
                wp = p["visual_proj"]
                total = total + ((wp - jnp.eye(d)) ** 2).sum() * (
                    hps["l2_lambda"] / shots
                )
            return total

        hp_tree = {"gp_beta": gp_beta_t, "l2_lambda": l2_t}

        def _bc(vec, ndim):
            return vec.reshape((vec.shape[0],) + (1,) * (ndim - 1))

        def step(params, opt_state, feats_b, labels_b, keys, factor):
            losses, grads = jax.vmap(
                jax.value_and_grad(trial_loss), in_axes=(0, 0, 0, 0, 0)
            )(params, feats_b, labels_b, keys, hp_tree)
            updates, opt_state = tx.update(grads, opt_state, params)
            # per-trial, per-group learning rates (schedule factor on top)
            scaled = {}
            for name, u in updates.items():
                vec = gp_lr_t if name == "gp" else lr_t
                scaled[name] = jax.tree.map(
                    lambda x: x * _bc(-(vec * factor), x.ndim), u
                )
            return (
                jax.tree.map(lambda p, u: p + u, params, scaled),
                opt_state,
                losses,
            )

        step_jit = jax.jit(step, donate_argnums=(0, 1))

        def epoch_scan(params, opt_state, feats_e, labels_e, keys_e, factor):
            """One dispatch per epoch: scan the vmapped step over batches.
            feats_e: [n_batches, T, B, D]; keys_e: [n_batches, T]."""

            def body(carry, batch):
                params, opt_state = carry
                f, l, k = batch
                params, opt_state, losses = step(
                    params, opt_state, f, l, k, factor
                )
                return (params, opt_state), losses

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (feats_e, labels_e, keys_e)
            )
            return params, opt_state, losses

        epoch_jit = jax.jit(epoch_scan, donate_argnums=(0, 1))

        def trial_eval_logits(p, key):
            if use_gp:
                protos, _ = svgp.sample_prototypes(
                    gp_static, p["gp"], gp_buffers, key, self.s_eval
                )
            else:
                w = jax.nn.softmax(p["template_logits"], axis=-1)
                protos = jnp.einsum("km,kmd->kd", w, text_embeddings)
            projected = feats_test_j @ p["visual_proj"].T
            return common.cosine_logits(projected, protos, scale)

        eval_jit = jax.jit(jax.vmap(trial_eval_logits))

        # zero-shot block per trial — evaluated with the PRE-warm-start params
        # (the in-process trainer records zero-shot before initialization)
        zs_keys = jax.random.split(jax.random.key(0), t_trials)
        zs_logits = np.asarray(eval_jit(zs_params, zs_keys))

        n = feats_train.shape[1]
        batch_size = config.dataloader.batch_size_train
        slices = common.batch_slices(n, batch_size)
        max_epoch = int(config.adapter.clip_adapter_epochs)
        root_key = jax.random.key(int(self.seeds[0]))

        for epoch in range(max_epoch):
            # schedule factor: per-trial lr × (cosine shape of the base lr)
            factor = jnp.asarray(
                schedule(epoch) / max(base_lr, 1e-12), dtype=jnp.float32
            )
            # per-trial epoch shuffle (seed-deterministic)
            perms = np.stack(
                [
                    np.random.default_rng((seed, epoch)).permutation(n)
                    for seed in self.seeds
                ]
            )
            perm_j = jnp.asarray(perms)
            feats_e = jnp.take_along_axis(feats_train, perm_j[:, :, None], axis=1)
            labels_e = jnp.take_along_axis(labels_train, perm_j, axis=1)
            if len(slices) > 1:
                b_sz = slices[0][1] - slices[0][0]
                n_full = len(slices) * b_sz
                fb = feats_e[:, :n_full].reshape(
                    t_trials, len(slices), b_sz, -1
                ).transpose(1, 0, 2, 3)  # [n_batches, T, B, D]
                lb = labels_e[:, :n_full].reshape(
                    t_trials, len(slices), b_sz
                ).transpose(1, 0, 2)
                root_key, sub = jax.random.split(root_key)
                keys_e = jax.random.split(sub, len(slices) * t_trials).reshape(
                    len(slices), t_trials
                )
                params, opt_state, losses = epoch_jit(
                    params, opt_state, fb, lb, keys_e, factor
                )
                losses = losses[-1]
            else:
                for b, (lo, hi) in enumerate(slices):
                    root_key, sub = jax.random.split(root_key)
                    keys = jax.random.split(sub, t_trials)
                    params, opt_state, losses = step_jit(
                        params, opt_state, feats_e[:, lo:hi], labels_e[:, lo:hi],
                        keys, factor,
                    )
            if (epoch + 1) % 10 == 0 or epoch == 0:
                print(
                    f"[vmap-trials] epoch {epoch + 1}/{max_epoch} "
                    f"loss per trial: "
                    + " ".join(f"{float(v):.4f}" for v in losses)
                )

        # final eval + per-trial metrics.json
        root_key, sub = jax.random.split(root_key)
        eval_keys = jax.random.split(sub, t_trials)
        logits = np.asarray(eval_jit(params, eval_keys))
        results = []
        for t, seed in enumerate(self.seeds):
            acc = compute_accuracy(logits[t], labels_test)[0]
            ece, ece_bins = compute_ece_with_bins(logits[t], labels_test)
            aece, aece_bins = compute_aece_with_bins(logits[t], labels_test)
            zs_acc = compute_accuracy(zs_logits[t], labels_test)[0]
            zs_ece, zs_eb = compute_ece_with_bins(zs_logits[t], labels_test)
            zs_aece, zs_ab = compute_aece_with_bins(zs_logits[t], labels_test)
            metrics = {
                "top1_acc": float(acc),
                "accuracy": float(acc),
                "ece": float(ece),
                "aece": float(aece),
                "calibration": ece_bins,
                "adaptive_calibration": aece_bins,
            }
            result = {
                "seed": seed,
                "metrics": metrics,
                "zero_shot": {
                    "top1_acc": zs_acc,
                    "ece": zs_ece,
                    "aece": zs_aece,
                    "calibration": zs_eb,
                    "adaptive_calibration": zs_ab,
                },
            }
            results.append(result)
            if trial_outdirs is not None:
                cfg = copy.deepcopy(config)
                cfg.seed = seed
                for name, value in self.trial_overrides[t].items():
                    if name == "lr":
                        cfg.optim.lr = float(value)
                    else:
                        setattr(cfg.adapter, name, float(value))
                cfg.output_dir = str(trial_outdirs[t])
                writer = BaseTrainer(cfg, dm)
                writer.zero_shot_metrics = result["zero_shot"]
                writer.write_run_summary_json(metrics, start_time=start_time)
        print(
            f"[vmap-trials] {t_trials} seeds trained in "
            f"{time.time() - start_time:.1f}s"
        )
        return results


def run_seed_vmapped_adapter(config, seeds: Sequence[int], trial_outdirs=None,
                             mesh=None, trial_overrides=None):
    return VmappedAdapterTrials(
        config, seeds, mesh=mesh, trial_overrides=trial_overrides
    ).run(trial_outdirs)
