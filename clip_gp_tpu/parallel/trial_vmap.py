"""Vmapped multi-trial training — the TPU-native replacement for the
reference's process-per-GPU trial scheduling (ref: utils/hparam_search.py:201-281,
SURVEY §2.1).

The canonical sweep axes are seeds {1..5} and scalar hparam grid cells:
identical program, different few-shot splits / RNG / loss scalars. Per trial,
all trainable state is tiny (a [D,D] projection, an MLP bottleneck, a [K,D]
residual, an [N,D] cache adapter, GP variational parameters), so trials become
a leading ``vmap`` axis:

1. every seed's few-shot split is sampled on host (reference-compatible
   pickle caches), and the **union** of selected images is encoded once per
   pass — the frozen tower runs once for all trials instead of once per trial;
2. per-trial features are gathers from the union  [T, N, D];
3. one jitted, vmapped train step advances all T trials per batch — the tiny
   per-trial matmuls batch into MXU-sized work;
4. eval MC-averages / scores logits per trial on the shared test features,
   and each trial writes its own reference-schema metrics.json.

On a multi-chip mesh the same [T, ...] arrays shard over a ``trial`` axis
(pure data placement — trials never communicate), which is the whole
multi-chip story for this workload.

Methods are pluggable ``MethodSpec`` objects; supported heads:

- **Adapter** (baseline trainable-weights and GP variants;
  ref: trainers/adapter.py) — feature-cached, one extraction total.
- **CLIP-Adapter** (bottleneck MLP; ref: trainers/clip_adapter.py) — the
  reference re-encodes augmented few-shot images each epoch, so the runner
  re-encodes the *union* per epoch (one tower pass shared by all trials).
- **TaskRes** (residual on base text features; ref: trainers/taskres.py).
- **Tip-Adapter-F** (trainable cache keys with best-on-test state keeping and
  a per-trial (β, α) val grid search; ref: trainers/tip_adapter.py:225-327).
- **CoOp** (learnable prompt ctx; ref: trainers/adapter_coop.py) — the text
  tower runs inside the vmapped loss, batching T·K prompts into one pass.
- **CoCoOp** (ctx + per-image meta-net; ref: trainers/adapter_cocoop.py) —
  the trainable state is trial-shaped; the per-image conditional prompt
  encodes batch [T·C·K] prompts per chunked tower call.

GP/template-weight *pre-stage* variants of the CLIP-Adapter/TaskRes/Tip heads run on this
backend too: the pre-stage fits train as vmapped per-trial programs
(``vmapped_gp_prestage`` / ``vmapped_tw_prestage``) before the head's own
training, mirroring ``methods/pre_stages.py``.
"""

from __future__ import annotations

import copy
import math
import os
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.parallel import k_bucket
from clip_gp_tpu.runtime import dispatch_budget
from clip_gp_tpu.runtime.profiling import phase_timer
from clip_gp_tpu.data.templates import get_templates
from clip_gp_tpu.gp import svgp
from clip_gp_tpu.methods import common
from clip_gp_tpu.ops.metrics import (
    compute_accuracy,
    compute_aece_with_bins,
    compute_ece_with_bins,
    compute_macro_f1,
)
from clip_gp_tpu.runtime.optim import (
    _OverrideLr,
    _core_transform,
    build_lr_schedule,
)


# serializes the global-RNG few-shot sampling window across the sweep's
# concurrent group workers (sweep.run_trials_vmapped --group-parallel)
_SPLIT_RNG_LOCK = threading.Lock()


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _divisor_le(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= ``cap`` (always >= 1).

    Dispatch-bounding sizes (epoch-scan segments, gradient-accumulation
    micro-slices) are snapped to divisors of their totals so every dispatch
    of the heavy jitted program has ONE shape: a ragged tail would trace and
    compile the program a second time (scan of a different length / slice of
    a different width), and a CoCoOp-scale compile costs far more than the
    extra per-dispatch RTTs of a slightly smaller size (measured: per-K
    compiles ~5x a warm group, BENCH_cocoop_vmap.json; one tunnel RTT
    ~0.35 s). Worst case (prime n) returns 1 — the plain per-step dispatch
    path, which the worker-crash repro proved safe."""
    cap = max(1, min(n, cap))
    for d in range(cap, 0, -1):
        if n % d == 0:
            return d
    return 1


def vmapped_gp_prestage(runner, feats_train, labels_train,
                        text_embeddings=None,
                        mean_mode: str = "norm_of_raw_mean"):
    """Per-trial standalone GP fits as ONE vmapped program — the vmap-axis
    analog of ``pre_stages.train_gp_stage`` (CE of mean-over-S logits at
    scale 100 + β·KL, AdamW(gp_lr) + cosine over optim.max_epoch, per-trial
    template-weight warm start).

    ``text_embeddings`` overrides the runner's (Tip and TaskRes's GP branch
    normalize per template before the stage, ref: tip_adapter.py:98-103,
    taskres.py:234; CLIP-Adapter uses raw embeddings, ref:
    clip_adapter.py:239).

    Returns (static, per-trial gp params [T,...], mean prototypes [T,K,D]
    L2-normalized). Buffers land in ``runner.shared["gp_buffers"]`` (text
    embeddings are identical across trials, so PCA/buffers are shared)."""
    import optax

    config = runner.config
    e = (text_embeddings if text_embeddings is not None
         else runner.text_embeddings)
    static, params0, buffers = svgp.create_gp(e, config)
    runner.shared["gp_buffers"] = buffers
    t_trials = runner.t_trials
    feats_n = common.l2_normalize(feats_train)  # [T,N,D]
    tw = jnp.stack([
        common.get_template_weights(
            config, e, feats_n[t], labels_train[t],
            runner.logit_scale,
        )
        for t in range(t_trials)
    ])
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (t_trials,) + x.shape).copy(),
        params0,
    )
    params = jax.vmap(svgp.initialize_from_weights)(params, tw)

    epochs = max(1, int(config.optim.max_epoch))
    gp_lr = float(config.adapter.gp_lr)
    wd = float(config.optim.weight_decay)
    s_tr = max(1, int(config.adapter.gp_num_mc_samples_train or 1))
    beta = float(config.adapter.gp_beta)
    sched = optax.cosine_decay_schedule(gp_lr, epochs)
    tx = optax.adamw(sched, weight_decay=wd)
    opt_state = tx.init(params)

    # feats/labels/buffers explicit (no large jit closure constants)
    @jax.jit
    def fit(params, opt_state, keys, feats_n, labels, buffers):
        def loss_one(p, f, l, key):
            protos, _ = svgp.sample_prototypes(static, p, buffers, key, s_tr)
            pn = common.l2_normalize(protos)
            logits = 100.0 * jnp.einsum("bd,skd->bsk", f, pn).mean(axis=1)
            ce = common.cross_entropy(logits, l)
            return ce + beta * svgp.kl_divergence(p).sum()

        def epoch_step(carry, key_t):
            params, opt_state = carry
            losses, grads = jax.vmap(jax.value_and_grad(loss_one))(
                params, feats_n, labels, key_t
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), losses

        return jax.lax.scan(epoch_step, (params, opt_state), keys)

    # per-trial key streams folded from the trial seeds (deterministic)
    keys = jnp.stack([
        jax.random.split(jax.random.fold_in(jax.random.key(1000), int(s)),
                         epochs)
        for s in runner.seeds
    ], axis=1)  # [epochs, T]
    (params, _), losses = fit(
        params, opt_state, keys, feats_n, labels_train, buffers
    )
    print(f"[vmap-GP-stage] {t_trials} trials x {epochs} epochs, "
          f"final losses: "
          + " ".join(f"{v:.3f}" for v in np.asarray(losses[-1])))

    s_eval = max(1, int(config.adapter.gp_num_mc_samples_eval or 1))

    def protos_one(p, key, buffers):
        protos, _ = svgp.sample_prototypes(static, p, buffers, key, s_eval)
        if mean_mode == "mean_of_norm":
            # clip_adapter convention: UNnormalized mean over normalized
            # samples — identical logits to the reference's per-forward MC
            # mean incl. per-class uncertainty shrinkage
            # (ref: clip_adapter.py:85-97)
            return common.l2_normalize(protos).mean(axis=0)
        # tip/taskres convention: normalize(mean(raw samples))
        # (ref: tip_adapter.py:151-157, taskres.py:284-290)
        return common.l2_normalize(protos.mean(axis=0))

    keys2 = jnp.stack([
        jax.random.fold_in(jax.random.key(2000), int(s)) for s in runner.seeds
    ])
    mean_protos = jax.jit(jax.vmap(protos_one, in_axes=(0, 0, None)))(
        params, keys2, buffers
    )  # [T,K,D]
    return static, params, mean_protos


def vmapped_tw_prestage(runner, feats_train, labels_train,
                        l2_to_uniform_lambda: float = 0.0,
                        text_embeddings=None):
    """Per-trial template-weight-logits fits as one vmapped program
    (``pre_stages.train_template_weight_stage`` analog).
    ``text_embeddings`` overrides the runner's (Tip pre-normalizes).
    Returns L2-normalized prototypes [T,K,D]."""
    import optax

    config = runner.config
    k, m = runner.k, runner.m
    t_trials = runner.t_trials
    feats_n = common.l2_normalize(feats_train)
    epochs = max(1, int(config.optim.max_epoch))
    lr = float(config.optim.lr)
    wd = float(config.optim.weight_decay)
    # reference horizon: cosine over epochs*len(train_loader), stepped once
    # per EPOCH -> near-constant LR (ref: taskres.py:327-353 et al.);
    # n per trial = few-shot set size, loader len = drop-last batches
    n = int(feats_train.shape[1])
    bs = max(1, int(config.dataloader.batch_size_train))
    n_batches = max(1, n // bs) if n >= bs else 1
    sched = optax.cosine_decay_schedule(lr, max(1, epochs * n_batches))
    tx = optax.adamw(sched, weight_decay=wd)
    tw_logits = jnp.zeros((t_trials, k, m))
    opt_state = tx.init(tw_logits)

    @jax.jit
    def fit(tw_logits, opt_state, feats_n, labels, e):
        def loss_one(tw, f, l):
            weights = jax.nn.softmax(tw, axis=-1)
            protos = common.l2_normalize(jnp.einsum("km,kmd->kd", weights, e))
            ce = common.cross_entropy(100.0 * f @ protos.T, l)
            if l2_to_uniform_lambda > 0 and m > 0:
                ce = ce + l2_to_uniform_lambda * (
                    (weights - 1.0 / m) ** 2
                ).mean()
            return ce

        def epoch_step(carry, _):
            tw_logits, opt_state = carry
            losses, grads = jax.vmap(jax.value_and_grad(loss_one))(
                tw_logits, feats_n, labels
            )
            updates, opt_state = tx.update(grads, opt_state, tw_logits)
            return (optax.apply_updates(tw_logits, updates), opt_state), losses

        (tw_logits, opt_state), _ = jax.lax.scan(
            epoch_step, (tw_logits, opt_state), None, length=epochs
        )
        weights = jax.nn.softmax(tw_logits, axis=-1)
        protos = common.l2_normalize(jnp.einsum("tkm,kmd->tkd", weights, e))
        return protos

    return fit(tw_logits, opt_state, feats_n, labels_train,
               text_embeddings if text_embeddings is not None
               else runner.text_embeddings)


class _SchedView:
    """Config view over ``config.optim`` with per-head lr / epochs / optimizer
    name (the vmapped analog of the in-process ``_OverrideLr`` + ``_TmpOptim``
    shims; ref: trainers/clip_adapter.py:152-167)."""

    def __init__(self, optim, lr: float, max_epoch: int, name: Optional[str] = None):
        object.__setattr__(self, "_optim", optim)
        self.lr = float(lr)
        self.max_epoch = int(max_epoch)
        if name is not None:
            self.name = str(name)

    def __getattr__(self, item):
        return getattr(object.__getattribute__(self, "_optim"), item)


# ======================================================================
# Method specs
# ======================================================================


class MethodSpec:
    """Per-method hooks the generic vmapped runner composes.

    A spec sees the runner (``self.r``) for config / text embeddings / shared
    buffers. All ``loss`` / ``eval_logits`` hooks are traced *per trial* —
    they receive scalar hparams and single-trial pytrees and are vmapped by
    the runner. ``shared`` carries large arrays that must NOT be closed over
    (CLAUDE.md: closure leaves become HLO constants)."""

    name = ""
    # per-trial scalar hyperparameters that may join the vmap axis; names are
    # config attribute names (adapter.* unless noted)
    supported_hparams: tuple = ()
    # sweep-grid OPTS key -> hparam name; the sweep backend derives its
    # vmappable-grid table from this (single source of truth with
    # supported_hparams — see vmappable_config_keys())
    config_keys: Dict[str, str] = {}
    reencode_per_epoch = False  # re-encode augmented union each epoch
    normalize_features = False  # L2-normalize features at extraction
    needs_val = False  # trial-gathered val features (Tip grid search)
    extended_metrics = True  # BaseTrainer.test schema (accuracy+macro_f1)

    def __init__(self, runner):
        self.r = runner

    # -- hyperparameter plumbing ---------------------------------------
    def hp(self, name, default):
        return jnp.asarray(
            [float(o.get(name, default)) for o in self.r.trial_overrides],
            dtype=jnp.float32,
        )

    def lr_vectors(self) -> Dict[str, jnp.ndarray]:
        """group name → per-trial lr [T]."""
        raise NotImplementedError

    def lr_group(self, param_name: str) -> str:
        return "lr"

    def hp_tree(self) -> Dict[str, jnp.ndarray]:
        """Loss scalars, per-trial [T] (vmapped into scalars)."""
        return {}

    # -- optimizer / schedule ------------------------------------------
    def optimizer_tx(self):
        """Lr-free optax transform (per-trial lrs scale updates afterwards)."""
        raise NotImplementedError

    def sched_config(self):
        """Config view whose scheduler family (name, eta_min, horizon …)
        governs this head's lr curve."""
        return self.r.config.optim

    def batches_per_dispatch(self, n_batches: int, batch_size: int) -> int:
        """Max scan steps per dispatched executable in the eager per-epoch
        path. Default: the whole epoch rides one dispatch. Heavy-step
        methods override to bound single-execution length — the tunneled
        TPU worker process dies on very long single executions (measured
        2026-08-20: the CoCoOp K=100 epoch, 50 steps ≈ 350 s in one
        executable, crashed the worker 3/3 while the same 50 steps as
        per-step dispatches pass; see BENCH_sweep_methods.json
        failed_cells)."""
        return n_batches

    def padded_n_batches(self, n_batches: int, batch_size: int) -> int:
        """Epoch step count including no-op padding steps (K-bucketed
        prompt specs override — parallel/k_bucket.py). Default: no
        padding."""
        return n_batches

    def eval_rows_per_dispatch(self, n_rows: int) -> int:
        """Max test rows per final-eval dispatch (same single-execution
        ceiling as batches_per_dispatch; chunking the eval is
        results-identical — logits concatenate along the row axis).
        Default: the whole test set in one dispatch."""
        return n_rows

    def microbatch_images(self, batch_size: int) -> int:
        """Images per gradient dispatch when even ONE train step exceeds
        the single-execution budget (batches_per_dispatch floors at one
        step per dispatch — e.g. a vmapped ImageNet-scale CoCoOp step).
        Default: the whole batch (no accumulation). When an override
        returns mb < batch_size, the runner computes the step's gradient
        as Σ_i (n_i/B)·grad_i over image micro-slices and applies ONE
        optimizer update — exactly the unsplit step's batch-mean gradient
        up to fp reduction order. Only sound for losses that are weighted
        means over the image axis whose `key` draws are not image-shaped
        (the same per-step key is passed to every micro-slice)."""
        return batch_size

    def lr_factors(self, epoch: int, batch: int, n_batches: int):
        """group → per-trial schedule multipliers [T] at this step.

        The vmapped analog of ``MultiGroupOptimizer.set_epoch``: a trial's
        schedule is the scheduler family instantiated at *that trial's own
        base lr* (torch schedulers track per-group ``base_lrs``; ref:
        utils/optimization.py:283-369). One group-wide shape rescaled onto
        every trial is wrong for any schedule that is not proportional in
        the base lr — e.g. cosine with ``eta_min > 0``, where a 10× lr grid
        cell would otherwise finish training 10× above its configured floor.
        """
        curves = self._lr_factor_curves()
        return {g: c[epoch] for g, c in curves.items()}

    def _lr_factor_curves(self):
        """{group: [max_epoch, T] schedule multipliers}, cached per run."""
        cached = getattr(self, "_factor_curves", None)
        if cached is None:
            epochs = max(1, self.max_epoch())
            cfg = self.sched_config()
            cached = {}
            for group, vec in self.lr_vectors().items():
                lrs = np.asarray(vec, dtype=np.float64)
                curve = np.empty((epochs, lrs.shape[0]), dtype=np.float32)
                for t, lr in enumerate(lrs):
                    sched = build_lr_schedule(_OverrideLr(cfg, float(lr)))
                    denom = max(float(lr), 1e-12)
                    curve[:, t] = [sched(e) / denom for e in range(epochs)]
                cached[group] = curve
            self._factor_curves = cached
        return cached

    def max_epoch(self) -> int:
        raise NotImplementedError

    # -- state ----------------------------------------------------------
    def init_params(self, seed: int) -> Dict:
        raise NotImplementedError

    def warm_start(self, params, feats_train, labels_train):
        return params

    def trial_consts(self, feats_train, labels_train) -> Dict:
        """Per-trial non-trainable state [T, ...] (vmapped with params)."""
        return {"_": jnp.zeros((self.r.t_trials,))}

    # -- compute ----------------------------------------------------------
    def loss(self, p, c, feats, labels, key, hps, shared):
        raise NotImplementedError

    def eval_logits(self, p, c, key, shared):
        raise NotImplementedError

    def zero_shot_logits(self, eval_fn, zs_params, consts, shared) -> np.ndarray:
        """[T, Ntest, K]; default = eval with pre-warm-start params."""
        t = self.r.t_trials
        keys = jax.random.split(jax.random.key(0), t)
        return np.asarray(eval_fn(zs_params, consts, keys, shared))

    # -- lifecycle hooks --------------------------------------------------
    def on_epoch_end(self, params, consts, shared, epoch: int) -> None:
        pass

    def finalize(self, params, consts, shared, val_feats, val_labels):
        """Post-training adjustment; returns (params, consts) used at eval."""
        return params, consts

    def export_state(self, params_t: Dict, consts_t: Dict) -> Optional[Dict]:
        """One trial's state in the IN-PROCESS trainer's ``trainable_state``
        layout, so TRAIN.ENABLE_ADAPTER_CHECKPOINTS checkpoints written by
        the vmap backend reload through ``--eval-only --model-dir`` exactly
        like the reference sweep children's (ref: utils/trainer.py:347-374,
        457-467). None = the method writes no checkpoints (Tip-Adapter's
        custom flow, like the reference's)."""
        return None


class AdapterSpec(MethodSpec):
    """Flagship Adapter: visual_proj + {GP weighter | template logits |
    linear weighting head} (ref: trainers/adapter.py:145-535).

    All trainable-head variants vmap, including ``freeze_visual_proj``
    (W is dropped from the trial pytree — frozen at identity, the
    projection is the no-op it is in-process, and the L2 term vanishes
    with it), ``shared_template_weights`` (an INIT-only difference, the
    mean row broadcast in ``warm_start``), and
    ``use_linear_template_weighting`` (a [D,1] head whose random init
    replays the in-process trainer's KeySequence draw, so vmapped and
    in-process runs start from bit-identical parameters)."""

    name = "Adapter"
    supported_hparams = ("gp_beta", "gp_lr", "lr", "l2_lambda")
    config_keys = {
        "TRAINER.ADAPTER.GP_BETA": "gp_beta",
        "TRAINER.ADAPTER.GP_LR": "gp_lr",
        "OPTIM.LR": "lr",
        "TRAINER.ADAPTER.L2_LAMBDA": "l2_lambda",
    }

    def __init__(self, runner):
        super().__init__(runner)
        config = runner.config
        self.use_gp = bool(config.adapter.use_gp)
        self.freeze_proj = bool(config.adapter.freeze_visual_proj)
        # same mode priority as the in-process trainer (methods/adapter.py
        # build_model; ref: trainers/adapter.py:145-198)
        train_tw = bool(config.adapter.train_template_weights)
        use_linear = bool(config.adapter.use_linear_template_weighting)
        if self.use_gp:
            self.mode = "gp"
        elif train_tw and not use_linear:
            self.mode = "logits"
        elif use_linear:
            self.mode = "linear"
        else:
            # the non-trainable uniform baseline has nothing to train on the
            # trial axis; the sweep gate routes it in-process
            raise ValueError(
                "AdapterSpec needs a trainable head (USE_GP, "
                "TRAIN_TEMPLATE_WEIGHTS or USE_LINEAR_TEMPLATE_WEIGHTING)"
            )
        self.s_train = max(1, int(config.adapter.gp_num_mc_samples_train or 1))
        self.s_eval = max(1, int(config.adapter.gp_num_mc_samples_eval or 1))
        self.shots = int(config.dataset.num_shots)
        self.gp_static = None
        if self.use_gp:
            self.gp_static, self.gp_params0, gp_buffers = svgp.create_gp(
                runner.text_embeddings, config
            )
            runner.shared["gp_buffers"] = gp_buffers

    def lr_vectors(self):
        return {
            "lr": self.hp("lr", self.r.config.optim.lr),
            "gp": self.hp("gp_lr", self.r.config.adapter.gp_lr),
        }

    def lr_group(self, param_name):
        return "gp" if param_name == "gp" else "lr"

    def hp_tree(self):
        return {
            "gp_beta": self.hp("gp_beta", self.r.config.adapter.gp_beta),
            "l2_lambda": self.hp("l2_lambda", self.r.config.adapter.l2_lambda),
        }

    def optimizer_tx(self):
        return _core_transform(self.r.config.optim)

    def max_epoch(self):
        # BaseTrainer quirk preserved: every trainer's epoch count comes from
        # clip_adapter_epochs (ref: utils/trainer.py:256)
        return int(self.r.config.adapter.clip_adapter_epochs)

    def init_params(self, seed):
        d = self.r.d
        params: Dict = {}
        if not self.freeze_proj:
            params["visual_proj"] = jnp.eye(d)
        if self.mode == "gp":
            params["gp"] = self.gp_params0
        elif self.mode == "logits":
            params["template_logits"] = jnp.zeros((self.r.k, self.r.m))
        else:  # linear
            # replay the in-process init exactly: the [D,1] head is the
            # FIRST draw from the trainer's KeySequence(seed)
            # (methods/adapter.py build_model)
            from clip_gp_tpu.core.seeding import KeySequence

            params["template_weight_linear"] = 0.01 * jax.random.normal(
                KeySequence(int(seed)).next(), (d, 1)
            )
        return params

    def export_state(self, params_t, consts_t):
        # same layout as methods/adapter.py trainable_state (= self.params);
        # the frozen projection is still a (constant-identity) entry there
        state = dict(params_t)
        if self.freeze_proj:
            state["visual_proj"] = np.eye(self.r.d, dtype=np.float32)
        return state

    def _proj(self, p, feats):
        """feats @ Wᵀ, skipped entirely when W is frozen at identity (the
        in-process identity matmul is exact, so the results agree bitwise)."""
        return feats if self.freeze_proj else feats @ p["visual_proj"].T

    def warm_start(self, params, feats_train, labels_train):
        if self.mode == "linear":
            # the in-process trainer computes-and-ignores template weights in
            # linear mode (train(): no mode branch consumes them); the head
            # keeps its random init
            return params
        tw = []
        for t in range(self.r.t_trials):
            tw.append(
                common.get_template_weights(
                    self.r.config,
                    self.r.text_embeddings,
                    feats_train[t],
                    labels_train[t],
                    self.r.logit_scale,
                )
            )
        tw = jnp.stack(tw)  # [T,K,M]
        if self.use_gp:
            # GP warm start keeps per-class [K,M] weights (methods/adapter.py)
            params["gp"] = jax.vmap(svgp.initialize_from_weights)(params["gp"], tw)
        else:
            if bool(self.r.config.adapter.shared_template_weights):
                # shared only at INIT: the mean row broadcast into the
                # always-[K,M] parameter (ref: adapter.py:624-634)
                tw = jnp.broadcast_to(tw.mean(axis=1, keepdims=True), tw.shape)
            params["template_logits"] = jnp.log(jnp.clip(tw, 1e-12, None))
        return params

    def _det_prototypes(self, p, shared):
        """[K,D] prototypes for the deterministic heads (logits / linear),
        mirroring methods/adapter.py _prototypes."""
        e = shared["text_embeddings"]
        if self.mode == "logits":
            w = jax.nn.softmax(p["template_logits"], axis=-1)
        else:  # linear: per-template score from the [D,1] head
            w = jax.nn.softmax((e @ p["template_weight_linear"])[..., 0], axis=-1)
        return jnp.einsum("km,kmd->kd", w, e)

    def loss(self, p, c, feats, labels, key, hps, shared):
        scale = self.r.logit_scale
        projected = self._proj(p, feats)
        f_norm = common.l2_normalize(projected)
        if self.use_gp:
            protos, _ = svgp.sample_prototypes(
                self.gp_static, p["gp"], shared["gp_buffers"], key, self.s_train
            )
            ce = common.mc_cross_entropy(f_norm, protos, labels, scale)
            total = ce + hps["gp_beta"] * svgp.kl_divergence(p["gp"]).sum()
        else:
            protos = self._det_prototypes(p, shared)
            total = common.cross_entropy(
                common.cosine_logits(projected, protos, scale), labels
            )
        # the L2 pull-to-identity regularizes the projection only — it
        # vanishes when W is frozen (methods/adapter.py loss_fn)
        if self.shots > 0 and not self.freeze_proj:
            wp = p["visual_proj"]
            d = self.r.d
            total = total + ((wp - jnp.eye(d)) ** 2).sum() * (
                hps["l2_lambda"] / self.shots
            )
        return total

    def eval_logits(self, p, c, key, shared):
        if self.use_gp:
            protos, _ = svgp.sample_prototypes(
                self.gp_static, p["gp"], shared["gp_buffers"], key, self.s_eval
            )
        else:
            protos = self._det_prototypes(p, shared)
        projected = self._proj(p, shared["feats_test"])
        return common.cosine_logits(projected, protos, self.r.logit_scale)


class ClipAdapterSpec(MethodSpec):
    """CLIP-Adapter bottleneck MLP, ratio-blended
    (ref: trainers/clip_adapter.py:16-113). The classifier is the zero-shot
    clip_weights [D,K], optionally replaced per trial by GP-mean or learned
    template-weight prototypes (vmapped pre-stages)."""

    name = "CLIP-Adapter"
    supported_hparams = ("clip_adapter_lr", "clip_adapter_ratio")
    config_keys = {
        "TRAINER.ADAPTER.CLIP_ADAPTER_LR": "clip_adapter_lr",
        "TRAINER.ADAPTER.CLIP_ADAPTER_RATIO": "clip_adapter_ratio",
    }
    reencode_per_epoch = True

    def __init__(self, runner):
        super().__init__(runner)
        a = runner.config.adapter
        self.use_gp = bool(a.use_gp)
        self.use_tw = bool(a.clip_adapter_use_template_weight_training)
        self._lr_default = float(a.clip_adapter_lr)
        self._epochs = int(a.clip_adapter_epochs)
        view = _SchedView(
            runner.config.optim, self._lr_default, self._epochs,
            name=a.clip_adapter_optimizer,
        )
        self._view = view
        self._zs_weights = common.zero_shot_classifier(runner.text_embeddings)

    def lr_vectors(self):
        return {"lr": self.hp("clip_adapter_lr", self._lr_default)}

    def hp_tree(self):
        return {
            "ratio": self.hp(
                "clip_adapter_ratio", self.r.config.adapter.clip_adapter_ratio
            )
        }

    def optimizer_tx(self):
        return _core_transform(self._view)

    def sched_config(self):
        return self._view

    def max_epoch(self):
        return self._epochs

    def init_params(self, seed):
        d = self.r.d
        reduction = max(1, int(self.r.config.adapter.clip_adapter_reduction))
        hidden = max(1, d // reduction)
        k1, k2 = jax.random.split(jax.random.key(int(seed)))
        # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        return {
            "fc1": jax.random.uniform(
                k1, (d, hidden), minval=-1 / np.sqrt(d), maxval=1 / np.sqrt(d)
            ),
            "fc2": jax.random.uniform(
                k2, (hidden, d),
                minval=-1 / np.sqrt(hidden), maxval=1 / np.sqrt(hidden),
            ),
        }

    def export_state(self, params_t, consts_t):
        # methods/clip_adapter.py trainable_state layout
        return {
            "adapter": {"fc1": params_t["fc1"], "fc2": params_t["fc2"]},
            "clip_weights": consts_t["clip_weights"],
        }

    def _logits(self, p, feats, ratio, clip_w):
        adapted = jax.nn.relu(jax.nn.relu(feats @ p["fc1"]) @ p["fc2"])
        blended = ratio * adapted + (1.0 - ratio) * feats
        f = common.l2_normalize(blended)
        if self.use_gp:
            # GP classifier = UNnormalized mean of normalized MC samples:
            # renormalizing would discard the per-class uncertainty
            # shrinkage the reference's mean-over-samples logits carry
            # (ref: clip_adapter.py:85-97)
            return self.r.logit_scale * f @ clip_w
        w = clip_w / jnp.linalg.norm(clip_w, axis=0, keepdims=True)
        return self.r.logit_scale * f @ w

    def loss(self, p, c, feats, labels, key, hps, shared):
        return common.cross_entropy(
            self._logits(p, feats, hps["ratio"], c["clip_weights"]), labels
        )

    def eval_logits(self, p, c, key, shared):
        return self._logits(
            p, shared["feats_test"], c["ratio"], c["clip_weights"]
        )

    def trial_consts(self, feats_train, labels_train):
        t = self.r.t_trials
        if self.use_gp:
            _, _, protos = vmapped_gp_prestage(
                self.r, feats_train, labels_train,
                mean_mode="mean_of_norm",
            )
            clip_w = jnp.swapaxes(protos, 1, 2)  # [T,D,K]
        elif self.use_tw:
            protos = vmapped_tw_prestage(self.r, feats_train, labels_train)
            clip_w = jnp.swapaxes(protos, 1, 2)
        else:
            clip_w = jnp.broadcast_to(
                self._zs_weights[None], (t,) + self._zs_weights.shape
            )
        return {
            # eval needs the per-trial ratio (hps only reach the loss)
            "ratio": self.hp(
                "clip_adapter_ratio", self.r.config.adapter.clip_adapter_ratio
            ),
            "clip_weights": clip_w,
        }

    def zero_shot_logits(self, eval_fn, zs_params, consts, shared):
        # in-process order: zero-shot recorded BEFORE the pre-stage replaces
        # the classifier (ref: clip_adapter.py train()) — use plain weights
        t = self.r.t_trials
        zs_consts = dict(consts)
        zs_consts["clip_weights"] = jnp.broadcast_to(
            self._zs_weights[None], (t,) + self._zs_weights.shape
        )
        keys = jax.random.split(jax.random.key(0), t)
        return np.asarray(eval_fn(zs_params, zs_consts, keys, shared))


class TaskResSpec(MethodSpec):
    """TaskRes residual on frozen base text features
    (ref: trainers/taskres.py:35-99); GP / template-weight pre-stages replace
    the base features per trial (vmapped), and the GP variant adds residuals
    to each MC prototype sample at eval (ref: taskres.py:101-116)."""

    name = "TaskRes"
    supported_hparams = ("taskres_lr", "taskres_residual_scale")
    config_keys = {
        "TRAINER.ADAPTER.TASKRES_LR": "taskres_lr",
        "TRAINER.ADAPTER.TASKRES_RESIDUAL_SCALE": "taskres_residual_scale",
    }
    reencode_per_epoch = True

    def __init__(self, runner):
        super().__init__(runner)
        a = runner.config.adapter
        self.use_gp = bool(a.use_gp)
        self.use_tw = bool(a.taskres_use_template_weight_training)
        self.s_eval = max(1, int(a.gp_num_mc_samples_eval or 1))
        self.gp_static = None
        self._lr_default = float(a.taskres_lr)
        self._epochs = int(a.taskres_epochs)
        view = _SchedView(
            runner.config.optim, self._lr_default, self._epochs,
            name=a.taskres_optimizer,
        )
        self._view = view
        runner.shared["zs_weights"] = common.zero_shot_classifier(
            runner.text_embeddings
        )

    def lr_vectors(self):
        return {"lr": self.hp("taskres_lr", self._lr_default)}

    def hp_tree(self):
        return {
            "alpha": self.hp(
                "taskres_residual_scale",
                self.r.config.adapter.taskres_residual_scale,
            )
        }

    def optimizer_tx(self):
        return _core_transform(self._view)

    def sched_config(self):
        return self._view

    def max_epoch(self):
        return self._epochs

    def init_params(self, seed):
        return {"residuals": jnp.zeros((self.r.k, self.r.d))}

    def trial_consts(self, feats_train, labels_train):
        t = self.r.t_trials
        consts = {"alpha": self.hp(
            "taskres_residual_scale",
            self.r.config.adapter.taskres_residual_scale,
        )}
        if self.use_gp:
            # reference TaskRes builds the GP's E with per-template L2
            # normalization (ref: taskres.py:234) — unlike its TW branch
            self.gp_static, gp_params, protos = vmapped_gp_prestage(
                self.r, feats_train, labels_train,
                text_embeddings=common.l2_normalize(self.r.text_embeddings),
            )
            consts["base_text"] = protos  # [T,K,D] GP-mean prototypes
            consts["gp"] = gp_params
        elif self.use_tw:
            consts["base_text"] = vmapped_tw_prestage(
                self.r, feats_train, labels_train,
                l2_to_uniform_lambda=float(
                    self.r.config.adapter.template_tw_l2_lambda
                ),
            )
        else:
            # plain mean over templates (ref: taskres.py:72-94)
            base = self.r.text_embeddings.mean(axis=1)
            consts["base_text"] = jnp.broadcast_to(
                base[None], (t,) + base.shape
            )
        return consts

    def export_state(self, params_t, consts_t):
        # methods/taskres.py trainable_state layout
        return {
            "residuals": params_t["residuals"],
            "base_text_features": consts_t["base_text"],
        }

    def loss(self, p, c, feats, labels, key, hps, shared):
        if self.use_gp:
            # residuals train THROUGH per-step MC prototype samples
            # (normalize(p̂ₛ + α·res) is nonlinear in the samples, so the
            # fixed-mean shortcut optimizes a different objective;
            # ref: taskres.py:96-116 with S_train in training mode)
            s_tr = max(
                1, int(self.r.config.adapter.gp_num_mc_samples_train or 1)
            )
            protos, _ = svgp.sample_prototypes(
                self.gp_static, c["gp"], shared["gp_buffers"], key, s_tr
            )
            text = common.l2_normalize(protos) + (
                hps["alpha"] * p["residuals"]
            )[None]
        else:
            text = c["base_text"] + hps["alpha"] * p["residuals"]
        logits = common.cosine_logits(feats, text, self.r.logit_scale)
        return common.cross_entropy(logits, labels)

    def eval_logits(self, p, c, key, shared):
        if self.use_gp:
            # residuals added to each normalized MC prototype sample
            # (ref: taskres.py:101-116)
            protos, _ = svgp.sample_prototypes(
                self.gp_static, c["gp"], shared["gp_buffers"], key,
                self.s_eval,
            )
            text_s = common.l2_normalize(protos) + (
                c["alpha"] * p["residuals"]
            )[None]
            return common.cosine_logits(
                shared["feats_test"], text_s, self.r.logit_scale
            )
        text = c["base_text"] + c["alpha"] * p["residuals"]
        return common.cosine_logits(
            shared["feats_test"], text, self.r.logit_scale
        )

    def zero_shot_logits(self, eval_fn, zs_params, consts, shared):
        # reference zero-shot: standard zero-shot classifier at scale 100
        # (ref: taskres.py train(): _compute_zeroshot_accuracy)
        f = common.l2_normalize(shared["feats_test"])
        logits = np.asarray(100.0 * f @ shared["zs_weights"])
        return np.broadcast_to(
            logits[None], (self.r.t_trials,) + logits.shape
        )


class TipAdapterFSpec(MethodSpec):
    """Tip-Adapter-F trainable cache keys with best-on-test state keeping and
    per-trial (β, α) val grid search (ref: trainers/tip_adapter.py:225-327).

    Cache keys/vals are per-trial (each seed samples its own few-shot set), so
    they ride the trial axis as non-trainable consts."""

    name = "Tip-Adapter"
    supported_hparams = (
        "tip_adapter_lr", "tip_adapter_init_beta", "tip_adapter_init_alpha"
    )
    config_keys = {
        "TRAINER.ADAPTER.TIP_ADAPTER_LR": "tip_adapter_lr",
        "TRAINER.ADAPTER.TIP_ADAPTER_INIT_BETA": "tip_adapter_init_beta",
        "TRAINER.ADAPTER.TIP_ADAPTER_INIT_ALPHA": "tip_adapter_init_alpha",
    }
    reencode_per_epoch = True
    normalize_features = True
    needs_val = True
    extended_metrics = False  # in-process Tip writes the compact metrics dict

    BETAS = (1.0, 2.0, 5.0)
    ALPHAS = (1.0, 5.0, 10.0, 20.0, 50.0)

    def __init__(self, runner):
        super().__init__(runner)
        a = runner.config.adapter
        self.use_gp = bool(a.use_gp)
        self.use_tw = bool(a.tip_adapter_use_template_weight_training)
        self._lr_default = float(a.tip_adapter_lr)
        self._epochs = int(a.tip_adapter_epochs)
        self._eps = float(a.tip_adapter_eps) or 1e-8
        self._zs_weights = common.zero_shot_classifier(runner.text_embeddings)
        self._best_acc = None  # [T] device array once tracking starts
        self._best_w = None  # [T,N,D] device array (best-on-test keys)
        self._eval_jit = None

    def lr_vectors(self):
        return {"lr": self.hp("tip_adapter_lr", self._lr_default)}

    def optimizer_tx(self):
        import optax

        # in-process uses optax.adamw(sched, eps=eps) with its default
        # weight decay (ref analog: trainers/tip_adapter.py:213-215)
        return optax.chain(
            optax.scale_by_adam(eps=self._eps),
            optax.add_decayed_weights(1e-4),
        )

    def lr_factors(self, epoch, batch, n_batches):
        # per-STEP cosine decay over epochs*n_batches (optax semantics);
        # decays to zero, so the shape is proportional in the base lr and
        # one scalar serves every trial
        total = max(1, self._epochs * n_batches)
        step = min(epoch * n_batches + batch, total)
        f = 0.5 * (1.0 + math.cos(math.pi * step / total))
        return {
            "lr": np.full(self.r.t_trials, f, dtype=np.float32),
        }

    def max_epoch(self):
        return self._epochs

    def init_params(self, seed):
        # placeholder; the real init copies the per-trial cache keys
        return {"adapter_w": jnp.zeros((1,))}

    def trial_consts(self, feats_train, labels_train):
        t = self.r.t_trials
        cache_vals = jax.nn.one_hot(labels_train, self.r.k)  # [T,N,K]
        # Tip normalizes each template embedding before its pre-stages
        # (ref: tip_adapter.py:98-103; clip_adapter/taskres use raw E)
        norm_e = common.l2_normalize(self.r.text_embeddings)
        if self.use_gp:
            # MC-mean GP prototypes replace the zero-shot classifier; the
            # mean over samples of per-sample logits is linear, so mean
            # prototypes give identical clip logits (ref: tip_adapter.py
            # _clip_logits) at 1/S the eval FLOPs
            _, _, protos = vmapped_gp_prestage(
                self.r, feats_train, labels_train, text_embeddings=norm_e
            )
            clip_w = jnp.swapaxes(protos, 1, 2)  # [T,D,K]
        elif self.use_tw:
            protos = vmapped_tw_prestage(
                self.r, feats_train, labels_train, text_embeddings=norm_e
            )
            clip_w = jnp.swapaxes(protos, 1, 2)
        else:
            clip_w = jnp.broadcast_to(
                self._zs_weights[None], (t,) + self._zs_weights.shape
            )
        # zero init values (the shipped defaults) remove the cache term from
        # the -F loss and zero the adapter gradient — same quirk fix as the
        # in-process trainer (methods/tip_adapter.py): train at 1.0 instead.
        # where() keeps this correct for per-trial grid vectors too.
        def _nonzero(v):
            v = jnp.asarray(v, dtype=jnp.float32)
            return jnp.where(v == 0.0, 1.0, v)

        return {
            "cache_vals": cache_vals,
            "clip_w": clip_w,
            "beta": _nonzero(self.hp(
                "tip_adapter_init_beta",
                self.r.config.adapter.tip_adapter_init_beta,
            )),
            "alpha": _nonzero(self.hp(
                "tip_adapter_init_alpha",
                self.r.config.adapter.tip_adapter_init_alpha,
            )),
        }

    def warm_start(self, params, feats_train, labels_train):
        # adapter_w initialized from each trial's cache keys [T,N,D]
        # (features arrive L2-normalized: normalize_features=True)
        return {"adapter_w": jnp.array(feats_train)}

    def _tip_logits(self, p, c, feats, shared):
        affinity = feats @ p["adapter_w"].T
        cache = jnp.exp(-(c["beta"] - c["beta"] * affinity)) @ c["cache_vals"]
        clip = 100.0 * feats @ c["clip_w"]
        return clip + c["alpha"] * cache

    def loss(self, p, c, feats, labels, key, hps, shared):
        return common.cross_entropy(
            self._tip_logits(p, c, feats, shared), labels
        )

    def eval_logits(self, p, c, key, shared):
        return self._tip_logits(p, c, shared["feats_test"], shared)

    def zero_shot_logits(self, eval_fn, zs_params, consts, shared):
        # in-process order: the pre-stage replaces the classifier BEFORE the
        # zero-shot block is recorded (ref: tip_adapter.py train()) — so the
        # zero-shot logits use the per-trial (possibly pre-staged) weights
        def _zs(clip_w, feats):
            return 100.0 * feats @ clip_w

        return np.asarray(
            jax.jit(jax.vmap(_zs, in_axes=(0, None)))(
                consts["clip_w"], shared["feats_test"]
            )
        )

    def on_epoch_end(self, params, consts, shared, epoch):
        """Track each trial's best-on-test adapter state
        (ref: tip_adapter.py:259-267). The comparison and the conditional
        copy run ON DEVICE — per-epoch logits never cross the host boundary
        (a [T,Ntest,K] transfer per epoch costs a full RTT on tunneled
        backends)."""
        if self._eval_jit is None:
            def _update(params, consts, shared, labels, best_acc, best_w):
                def _logits(p, c):
                    return self._tip_logits(p, c, shared["feats_test"], shared)

                logits = jax.vmap(_logits)(params, consts)  # [T,Nt,K]
                accs = (
                    (logits.argmax(-1) == labels[None]).mean(-1) * 100.0
                )  # [T]
                improved = accs > best_acc
                best_acc = jnp.where(improved, accs, best_acc)
                best_w = jnp.where(
                    improved[:, None, None], params["adapter_w"], best_w
                )
                return best_acc, best_w

            self._eval_jit = jax.jit(_update)
        if self._best_acc is None:
            self._best_acc = jnp.full(
                (self.r.t_trials,), -jnp.inf, dtype=jnp.float32
            )
            self._best_w = params["adapter_w"]
        self._best_acc, self._best_w = self._eval_jit(
            params, consts, shared, jnp.asarray(self.r.labels_test),
            self._best_acc, self._best_w,
        )

    def finalize(self, params, consts, shared, val_feats, val_labels):
        if self._best_w is not None:
            params = {"adapter_w": jnp.asarray(self._best_w)}
        if val_feats is None or val_feats.shape[1] == 0:
            print("[Tip-Adapter] val search unavailable; using init values")
            return params, consts
        betas = jnp.asarray(self.BETAS)
        alphas = jnp.asarray(self.ALPHAS)

        def _grid(w, vals, clip_w, vf, vl):
            affinity = vf @ w.T  # [Nv, N]
            cache = jnp.exp(
                betas[:, None, None] * (affinity[None] - 1.0)
            ) @ vals  # [B, Nv, K]
            clip = 100.0 * vf @ clip_w  # [Nv, K]
            tip = clip[None, None] + alphas[None, :, None, None] * cache[:, None]
            preds = tip.argmax(-1)  # [B, A, Nv]
            return (preds == vl[None, None]).mean(-1)  # [B, A]

        accs = np.asarray(
            jax.jit(jax.vmap(_grid))(
                params["adapter_w"], consts["cache_vals"], consts["clip_w"],
                jnp.asarray(val_feats), jnp.asarray(val_labels),
            )
        )  # [T, B, A]
        flat = accs.reshape(self.r.t_trials, -1).argmax(axis=1)
        bi, ai = np.unravel_index(flat, accs.shape[1:])
        beta_t = np.asarray(self.BETAS)[bi]
        alpha_t = np.asarray(self.ALPHAS)[ai]
        print(
            "[Tip-Adapter] per-trial (beta, alpha): "
            + " ".join(f"({b:g},{a:g})" for b, a in zip(beta_t, alpha_t))
        )
        consts = dict(consts)
        consts["beta"] = jnp.asarray(beta_t, dtype=jnp.float32)
        consts["alpha"] = jnp.asarray(alpha_t, dtype=jnp.float32)
        return params, consts


class CoOpSpec(MethodSpec):
    """CoOp learnable prompt context (ref: trainers/adapter_coop.py:453-560).

    The only trainable state is the ctx embedding block ([n_ctx, W], or
    [K, n_ctx, W] with ``csc``) — tiny, so trials vmap like the other heads.
    The expensive part is that every step re-encodes the assembled prompts
    through the frozen text tower; under the trial vmap that one tower pass
    batches T·K prompts into MXU-sized work (vs T sequential passes
    in-process), and the per-block remat in ``clip_model.transformer`` keeps
    backward memory at per-block inputs. Image features are frozen-tower
    encodes of the augmented few-shot images, re-encoded once per epoch as a
    shared union pass (the reference's per-batch encode in
    adapter_coop.py:514-522 with augmentation).

    Memory note: backward keeps ~layers·T·K·L·W block inputs live; for very
    large T·K on a single chip, shard trials over a mesh (the runner's
    ``trial`` axis) or reduce the group size.
    """

    name = "Adapter-CoOp"
    supported_hparams = ("lr",)
    config_keys = {"OPTIM.LR": "lr"}
    reencode_per_epoch = True
    normalize_features = True
    # CoCoOpSpec flips this: CoCoOp always uses shared ctx (the reference
    # never reads csc there)
    force_shared_ctx = False

    def __init__(self, runner):
        super().__init__(runner)
        from clip_gp_tpu.methods.coop import build_prompt_parts

        config = runner.config
        self._base_lr = float(config.optim.lr)
        self._arch = runner.arch
        self._use_csc = bool(config.adapter.csc) and not self.force_shared_ctx
        self._ctx_init = str(config.adapter.ctx_init or "")
        # prefix/suffix/eot are identical across trials (same classnames);
        # they and the text-tower weights ride `shared` — explicit jit
        # arguments, never closure leaves (CLAUDE.md hard rule)
        (ctx0, prefix, suffix, tokenized, self._n_ctx) = build_prompt_parts(
            config, runner.classnames, runner.clip_params,
            jax.random.key(int(runner.seeds[0])),
            force_shared_ctx=self.force_shared_ctx,
        )
        self._ctx0 = ctx0  # phrase-derived when ctx_init, else ignored
        self._ctx_dim = int(ctx0.shape[-1])
        # sequence trim first (exact — see methods/coop.py
        # trim_prompt_parts), then class-axis padding below
        from clip_gp_tpu.methods.coop import trim_prompt_parts

        suffix = trim_prompt_parts(suffix, tokenized, self._n_ctx)
        # assembled-prompt length: duration-derived budgets scale by it
        # (a trimmed prompt costs ~L'/77 of the budget unit)
        self.prompt_len = 1 + self._n_ctx + int(suffix.shape[1])
        # K-bucketing (parallel/k_bucket.py): pad the class axis to the
        # bucket size so the differentiated-tower programs are
        # shape-identical across datasets sharing a bucket — the prompt
        # parts were built from the REAL classnames first (identical key
        # consumption to the in-process trainer), then padded with copies
        # of class 0's rows (values never receive probability or gradient:
        # the loss masks padded logits to −inf and eval slices them off)
        self.k_pad = k_bucket.bucket_k(runner.k)
        eot = tokenized.argmax(axis=-1)
        pad = self.k_pad - runner.k
        if pad:
            rep = lambda a: jnp.concatenate(  # noqa: E731
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
            )
            prefix, suffix, eot = rep(prefix), rep(suffix), rep(eot)
        runner.shared["coop_prefix"] = prefix
        runner.shared["coop_suffix"] = suffix
        runner.shared["coop_eot"] = eot
        # the mask rides `shared` as a traced argument, so the SAME compiled
        # program serves every dataset in the bucket (K_real is data here,
        # not shape). Present whenever bucketing is on — exact-fit datasets
        # (all-True mask) must trace the identical where-masked program as
        # their padded bucket-mates or the sharing breaks
        if k_bucket.enabled():
            runner.shared["coop_class_mask"] = (
                jnp.arange(self.k_pad) < runner.k
            )
        runner.shared["coop_text_params"] = {
            k: runner.clip_params[k]
            for k in ("pos_embed", "transformer", "ln_final", "text_projection")
        }

    def lr_vectors(self):
        return {"lr": self.hp("lr", self._base_lr)}

    def optimizer_tx(self):
        return _core_transform(self.r.config.optim)

    def max_epoch(self):
        return int(self.r.config.adapter.clip_adapter_epochs)

    def init_params(self, seed):
        if self._ctx_init:
            # phrase-initialized ctx is deterministic and shared by all seeds
            # (trials still differ via few-shot splits and batch order)
            return {"ctx": jnp.asarray(self._ctx0)}
        shape = (
            (self.r.k, self._n_ctx, self._ctx_dim)
            if self._use_csc
            else (self._n_ctx, self._ctx_dim)
        )
        ctx = 0.02 * jax.random.normal(jax.random.key(int(seed)), shape)
        if self._use_csc and self.k_pad > self.r.k:
            # draw with the REAL class shape (identical values to the
            # unpadded/in-process init), then pad rows — padded rows never
            # receive gradient (masked logits), so zeros are fine
            ctx = jnp.concatenate([
                ctx,
                jnp.zeros((self.k_pad - self.r.k,) + ctx.shape[1:], ctx.dtype),
            ])
        return {"ctx": ctx}

    def padded_n_batches(self, n_batches: int, batch_size: int) -> int:
        """Bucket-canonical epoch length: datasets sharing a bucket pad
        their epoch to the same step count with no-op (state-passthrough)
        steps so the epoch-scan executable is shared (parallel/k_bucket.py).
        Never below the real count (a dataset whose shot count was capped
        by availability keeps its own length as the floor)."""
        if not k_bucket.enabled():
            return n_batches
        return max(n_batches, k_bucket.padded_batches(
            self.k_pad, int(self.r.config.dataset.num_shots), batch_size
        ))

    def eval_rows_per_dispatch(self, n_rows):
        """Fixed row chunk so the eval executable is also bucket-shared
        (test-set sizes differ per dataset; the runner zero-pads the tail
        row chunk and trims after). 2048 rows × k_pad prompts per dispatch
        is far under the execution budget for a forward-only program."""
        if not k_bucket.enabled():
            return n_rows
        return min(n_rows, 2048)

    def export_state(self, params_t, consts_t):
        # methods/coop.py trainable_state layout
        return {"ctx": params_t["ctx"]}

    def _text_features(self, p, shared):
        from clip_gp_tpu.methods.coop import assemble_prompts
        from clip_gp_tpu.models import clip_model

        from clip_gp_tpu.ops.flash_attention import flash_for_grad

        prompts = assemble_prompts(
            p["ctx"], shared["coop_prefix"], shared["coop_suffix"], self.k_pad
        )
        # differentiated in loss(); eval shares it (see methods/coop.py)
        feats = clip_model.text_features_from_embeddings(
            shared["coop_text_params"], self._arch, prompts,
            shared["coop_eot"], flash=flash_for_grad(),
            compute_dtype=clip_model.prompt_tower_dtype(),
        )
        return common.l2_normalize(feats)

    def _mask_padded(self, logits, shared):
        """−inf on padded classes: zero probability in CE (exp(−inf) = 0
        adds nothing to the softmax denominator) and zero gradient to the
        padded prompt rows (`where` blocks the cotangent). Applied whenever
        bucketing is on (mask present) so exact-fit and padded bucket-mates
        trace the same program."""
        mask = shared.get("coop_class_mask")
        if mask is None:
            return logits
        return jnp.where(mask, logits, -jnp.inf)

    def loss(self, p, c, feats, labels, key, hps, shared):
        text = self._text_features(p, shared)
        logits = self.r.logit_scale * feats @ text.T
        return common.cross_entropy(self._mask_padded(logits, shared), labels)

    def eval_logits(self, p, c, key, shared):
        text = self._text_features(p, shared)
        logits = self.r.logit_scale * shared["feats_test"] @ text.T
        return self._mask_padded(logits, shared)

    def zero_shot_logits(self, eval_fn, zs_params, consts, shared):
        # the reference's zero-shot block uses the template classifier at
        # fixed scale 100, NOT the initial ctx (methods/coop.py train())
        zs_w = common.zero_shot_classifier(self.r.text_embeddings)
        logits = np.asarray(100.0 * shared["feats_test"] @ zs_w)
        return np.broadcast_to(
            logits[None], (self.r.t_trials,) + logits.shape
        )


def _length_scaled_budget(env_name: str, prompt_len: int) -> int:
    """The CoCoOp dispatch budget in prompts, at this prompt length.

    The default/calibrated budgets are denominated in FULL-LENGTH
    (77-position) differentiated prompt encodes — the crash-bisection
    provenance of the constants. Trimmed prompts (methods/coop.py
    trim_prompt_parts) cost ~L'/77 of that, so the same safe duration
    admits proportionally more of them (measured 3.3× at L'=16,
    BENCH_cocoop_profile.json). An EXPLICIT env knob stays raw — it is
    the exact-count override tests and crash triage rely on."""
    budget = dispatch_budget.resolve(
        env_name, dispatch_budget.DEFAULT_DISPATCH_PROMPTS
    )
    if budget <= 0 or os.environ.get(env_name) is not None:
        return budget
    return budget * 77 // max(1, min(77, prompt_len))


def cocoop_microbatch_images(t_trials: int, batch_size: int, k: int,
                             prompt_len: int = 77) -> int:
    """Images per gradient dispatch for a vmapped CoCoOp step: the ONE
    sizing rule for CLIP_GP_TPU_COCOOP_STEP_PROMPTS (<=0 disables), shared
    by ``CoCoOpSpec.microbatch_images`` and the benches that report what
    the runner did (scripts/bench_cocoop_imagenet_scale.py) — so the
    artifact's `microbatch_images` can't drift from the measured run.

    The result is the FULL rule including the divisor snap the runner
    applies (micro-slices must divide the batch so every gradient dispatch
    has one compiled shape — see ``_divisor_le``): at (T=5, B=32, K=1000)
    the budget alone allows 18 images but the runner trains with 16, and
    the artifact must say 16."""
    budget = _length_scaled_budget(
        "CLIP_GP_TPU_COCOOP_STEP_PROMPTS", prompt_len
    )
    if budget <= 0:
        return batch_size
    per_image = t_trials * max(1, k)
    if t_trials * batch_size * max(1, k) <= budget:
        return batch_size  # whole step fits one dispatch: no split
    return _divisor_le(batch_size, max(1, budget // per_image))


class CoCoOpSpec(CoOpSpec):
    """CoCoOp on the trial axis (ref: trainers/adapter_cocoop.py:14-82).

    The trainable state — shared ctx + the 2-layer meta-net — is
    trial-shaped, so T seeds vmap exactly like CoOp. The per-image
    conditional prompts stay image-batch-shaped, but under the trial vmap
    the chunked text encodes batch [T·C·K] prompts per tower call: the
    trial axis JOINS the prompt batching instead of preventing it (the
    round-2 in-process-only closure was asserted without a measurement;
    ``scripts/bench_cocoop_vmap.py`` provides the number either way).

    Init replays the in-process trainer's KeySequence draws
    (methods/cocoop.py build_model: one key to build_prompt_parts, two
    split keys for the meta-net Linears), so vmapped and in-process runs
    start from bit-identical parameters. The chunk size uses the same
    measured PROMPT_BUDGET as the in-process trainer (per trial — the
    lax.map step then moves T× that many prompts, which is the batching
    hypothesis the bench measures).
    """

    name = "Adapter-CoCoOp"
    supported_hparams = ("lr",)
    config_keys = {"OPTIM.LR": "lr"}
    reencode_per_epoch = True
    normalize_features = True
    force_shared_ctx = True

    # prompt work above this in ONE dispatch cannot be bounded even by
    # gradient accumulation (microbatch_images floors at one image per
    # dispatch, i.e. T·K prompt encodes): at the measured ~0.43 ms per
    # differentiated prompt encode (chunk=1 worst case) it alone
    # approaches the tunneled worker's ~60 s single-execution ceiling
    # (see batches_per_dispatch). The class attribute is the tunneled-v5e
    # constant; __init__ rescales it from the per-backend calibration when
    # one exists (runtime/dispatch_budget.py).
    SINGLE_STEP_CEILING = dispatch_budget.DEFAULT_STEP_CEILING

    def __init__(self, runner):
        super().__init__(runner)  # prompt parts + shared text-tower wiring
        self._vis_dim = int(runner.arch.embed_dim)
        # an overridden class attribute (tests, subclasses) wins; otherwise
        # the ceiling rescales from the per-backend calibration
        self.single_step_ceiling = (
            self.SINGLE_STEP_CEILING
            if self.SINGLE_STEP_CEILING != dispatch_budget.DEFAULT_STEP_CEILING
            else dispatch_budget.single_step_ceiling()
        )
        # one image's conditional prompts are the accumulation floor
        # (k_pad: padded prompts are real compute even though masked;
        # trimmed prompts cost ~L'/77 of the ceiling's full-length unit)
        work_floor = (
            runner.t_trials * max(1, self.k_pad) * self.prompt_len / 77.0
        )
        if work_floor > self.single_step_ceiling:
            print(
                f"[vmap-trials:{self.name}] WARNING: ONE image's "
                f"conditional prompts move ~{work_floor:.0f} full-length-equivalent "
                f"encodes (T={runner.t_trials} x K={runner.k} x "
                f"L'={self.prompt_len}/77) — above the "
                f"~{self.single_step_ceiling} single-execution ceiling "
                "measured on tunneled TPU workers, and gradient "
                "accumulation cannot split below one image. This group may "
                "crash the worker; prefer the in-process/subprocess "
                "backend or fewer trials per group."
            )

    def init_params(self, seed):
        from clip_gp_tpu.core.seeding import KeySequence

        ks = KeySequence(int(seed))
        ctx_key = ks.next()  # consumed by build_prompt_parts in-process
        if self._ctx_init:
            ctx = jnp.asarray(self._ctx0)
        else:
            ctx = 0.02 * jax.random.normal(
                ctx_key, (self._n_ctx, self._ctx_dim)
            )
        vis_dim, hidden = self._vis_dim, max(1, self._vis_dim // 16)
        k1, k2 = jax.random.split(ks.next())
        k1b, k2b = jax.random.split(ks.next())

        def lin_init(key, fan_in, shape):
            # torch nn.Linear default init (methods/cocoop.py build_model)
            bound = 1 / np.sqrt(fan_in)
            return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

        return {
            "ctx": ctx,
            "meta_fc1": {"w": lin_init(k1, vis_dim, (vis_dim, hidden)),
                         "b": lin_init(k1b, vis_dim, (hidden,))},
            "meta_fc2": {"w": lin_init(k2, hidden, (hidden, self._ctx_dim)),
                         "b": lin_init(k2b, hidden, (self._ctx_dim,))},
        }

    def export_state(self, params_t, consts_t):
        # methods/cocoop.py trainable_state layout
        return dict(params_t)

    def _cond_logits(self, p, feats, shared):
        """Per-image conditional prompt logits for ONE trial ([B,D] normalized
        features -> [B,K]): the SAME ``cocoop.conditional_logits`` the
        in-process trainer jits (measured PROMPT_BUDGET chunking + per-chunk
        remat), so the two backends cannot drift."""
        from clip_gp_tpu.methods.cocoop import conditional_logits

        return conditional_logits(
            shared["coop_text_params"], self._arch, p, feats,
            shared["coop_prefix"], shared["coop_suffix"], shared["coop_eot"],
            self.k_pad, self.r.logit_scale,
        )

    def loss(self, p, c, feats, labels, key, hps, shared):
        logits = self._mask_padded(self._cond_logits(p, feats, shared), shared)
        return common.cross_entropy(logits, labels)

    def batches_per_dispatch(self, n_batches, batch_size):
        """Bound the per-epoch scan so one dispatched executable stays under
        the tunneled worker's single-execution ceiling. A CoCoOp step moves
        T·B·K differentiated prompt encodes (~0.43 ms each at the
        worst-case chunk=1); the duration ceiling bisected on silicon
        (repro_cocoop_crash.py REPRO_SCAN, 2026-08-20): a 28 s execution
        (4 steps at K=100) passes, a 77 s one (11 steps) crashes the TPU
        worker process — so the trigger is execution DURATION (likely a
        60 s RPC deadline), and the default budget keeps every dispatch at
        ≈35 s worst-case. Semantics are unchanged (same batch order, same
        keys/factors — just more dispatches); override via
        CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS (<=0 disables the bound).
        A SINGLE step over the budget (e.g. vmapped ImageNet-scale K at
        T=5: 160k prompts) cannot be segmented away — microbatch_images
        then bounds it with exact gradient accumulation instead. The
        default scales with the per-backend calibration when one exists
        (runtime/dispatch_budget.py; scripts/calibrate_dispatch.py)."""
        budget = _length_scaled_budget(
            "CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS", self.prompt_len
        )
        if budget <= 0:
            return n_batches
        work = self.r.t_trials * batch_size * max(1, self.k_pad)
        return max(1, budget // work)

    def microbatch_images(self, batch_size):
        """Bound a single over-budget step by gradient accumulation over
        image micro-slices: each dispatch moves T·mb·K differentiated
        prompt encodes ≤ the step budget (its own knob,
        CLIP_GP_TPU_COCOOP_STEP_PROMPTS, <=0 disables — deliberately NOT
        chained to the dispatch budget so segmentation and accumulation
        parity can be tested in isolation). The
        CoCoOp loss is a plain batch-mean CE whose key is unused, so the
        runner's Σ (n_i/B)·grad_i accumulation is the unsplit step's
        gradient exactly (fp reduction order aside) — this is what lets
        ImageNet-scale K (ref: configs/datasets/imagenet.yaml under
        scripts/run_experiment.sh CoCoOp rows) run on the vmap backend at
        all: one full step alone exceeds the worker's single-execution
        ceiling there."""
        return cocoop_microbatch_images(
            self.r.t_trials, batch_size, self.k_pad, self.prompt_len
        )

    def eval_rows_per_dispatch(self, n_rows):
        """The final eval is one [T, n_test, K] conditional-prompt dispatch;
        at real-catalog test sizes (caltech 2465 rows → 1.2M forward prompt
        encodes at K=100) a single execution would blow the same duration
        ceiling the training scan hit. Forward-only prompt encodes measure
        ≈2-3× cheaper than train steps, so twice the train budget stays
        well under it."""
        budget = _length_scaled_budget(
            "CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS", self.prompt_len
        )
        if budget <= 0:
            return n_rows
        return max(1, (2 * budget) // (self.r.t_trials * max(1, self.k_pad)))

    def eval_logits(self, p, c, key, shared):
        return self._mask_padded(
            self._cond_logits(p, shared["feats_test"], shared), shared
        )

    def zero_shot_logits(self, eval_fn, zs_params, consts, shared):
        # the in-process CoCoOp trainer computes NO zero-shot block
        # (methods/cocoop.py train()); metrics.json carries zero_shot: null
        return None


SPECS = {
    "Adapter": AdapterSpec,
    "CLIP-Adapter": ClipAdapterSpec,
    "TaskRes": TaskResSpec,
    "Tip-Adapter": TipAdapterFSpec,
    "Adapter-CoOp": CoOpSpec,
    "Adapter-CoCoOp": CoCoOpSpec,
}


def vmappable_config_keys() -> Dict[str, Dict[str, str]]:
    """Per-method sweep-grid OPTS keys that may join the vmap axis, derived
    from each spec's ``config_keys`` (the sweep backend's table — one source
    of truth with ``supported_hparams``)."""
    out = {}
    for name, cls in SPECS.items():
        unknown = set(cls.config_keys.values()) - set(cls.supported_hparams)
        assert not unknown, f"{name}: config_keys not in supported_hparams: {unknown}"
        out[name] = dict(cls.config_keys)
    return out


# ======================================================================
# Runner
# ======================================================================


class VmappedTrials:
    """Train one method for several trials (seeds × scalar grid cells)
    simultaneously.

    With ``mesh`` (axis name ``trial``), the stacked [T, ...] trial state and
    per-trial feature gathers shard over devices — trials never communicate,
    so this is pure placement and scales a sweep linearly across chips.
    """

    def __init__(self, config, seeds: Sequence[int], mesh=None,
                 trial_overrides: Optional[Sequence[Dict]] = None,
                 method: Optional[str] = None):
        """``trial_overrides``: optional per-trial dicts of scalar
        hyperparameters (keys among the spec's supported_hparams) — grid
        cells join the vmap axis alongside seeds."""
        self.config = config
        self.seeds = list(seeds)
        self.t_trials = len(self.seeds)
        self.mesh = mesh
        self.method = method or str(config.trainer_name)
        if self.method not in SPECS:
            raise ValueError(f"no vmapped spec for method {self.method!r}")
        if bool(getattr(config.adapter, "prefit_on_full_set", False)):
            # the vmapped warm start scores template weights on the per-trial
            # few-shot features only; silently ignoring the flag would
            # diverge from the in-process trainers (which swap in full-split
            # features via common.prefit_full_set_features)
            raise ValueError(
                "not vmap-groupable: ADAPTER.PREFIT_ON_FULL_SET requires the "
                "in-process backend"
            )
        self.trial_overrides = (
            [dict(o) for o in trial_overrides]
            if trial_overrides is not None
            else [{} for _ in self.seeds]
        )
        assert len(self.trial_overrides) == len(self.seeds)
        self.shared: Dict = {}
        # decode-ahead hooks (sweep sequential path): a DecodePrefetcher
        # whose splits/union decode this run adopts, and a callback fired
        # once the remaining work is device-dominated (the sweep uses it to
        # start the NEXT group's host decode)
        self._prefetch = None
        self.on_before_train = None
        # group-private augmentation stream: with --group-parallel several
        # groups iterate loaders concurrently, so drawing item seeds from the
        # process-global `random` would make draws depend on scheduling; a
        # per-group Random seeded from the trial seeds keeps every loader
        # iteration deterministic under any interleaving
        import random as _random

        self._aug_rng = _random.Random(
            "clip-gp-vmap-aug-"
            + "-".join(str(int(s)) for s in self.seeds)
            + f"-{config.dataset.name}-{config.dataset.num_shots}"
        )

    def _shard_trials(self, tree):
        """Place [T, ...] arrays with the leading axis over the trial mesh axis."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P("trial"))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    # ------------------------------------------------------------------
    def _build_per_seed_splits(self, needs_val: bool):
        """Sample every seed's few-shot split; returns (train union datums,
        train index/labels [T,N], val union datums or None, val index/labels,
        data manager of the last seed)."""
        from clip_gp_tpu.data.pipeline import build_data_manager

        per_seed_train: List[List] = []
        per_seed_val: List[List] = []
        dm = None
        # few-shot sampling consumes the process-global seeded RNG stream
        # (reference pickle-cache parity); when the sweep runs groups on
        # concurrent workers, the set_random_seed→sample window must not
        # interleave with another group's, or splits stop being
        # seed-deterministic
        with _SPLIT_RNG_LOCK:
            for seed in self.seeds:
                cfg = copy.deepcopy(self.config)
                cfg.seed = seed
                set_random_seed(seed)
                dm = build_data_manager(cfg)
                per_seed_train.append(list(dm.dataset.train_x))
                per_seed_val.append(list(getattr(dm.dataset, "val", None) or []))

        def _union(per_seed_items):
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
                [[i.label for i in items] for items in per_seed_items],
                dtype=np.int32,
            )
            return union_items, index, labels

        train_union, train_idx, train_lab = _union(per_seed_train)
        val_union = val_idx = val_lab = None
        if needs_val and all(len(v) for v in per_seed_val):
            val_union, val_idx, val_lab = _union(per_seed_val)
        return train_union, train_idx, train_lab, val_union, val_idx, val_lab, dm

    def _encode_union(self, base, union_items, dm, normalize: bool,
                      train: bool = True):
        """Encode a union of datums. ``train=True`` applies the train
        transform (random augmentation, group-private rng); ``train=False``
        the deterministic eval transform — val splits must use the latter
        (the in-process path's val_loader is built with tfm_test,
        pipeline.py; ref: utils/data_manager.py:62-83)."""
        from clip_gp_tpu.data.pipeline import BatchLoader

        loader = BatchLoader(
            union_items,
            dm.tfm_train if train else dm.tfm_test,
            self.config.dataloader.batch_size_train,
            shuffle=False,
            drop_last=False,
            num_workers=self.config.dataloader.num_workers,
            # eval transforms ignore the rng but the loader still draws item
            # seeds — keep those draws on the group stream (off the global)
            rng=self._aug_rng,
        )
        _, feats = base.encode_images_batched(loader)
        feats = jnp.asarray(feats)
        if normalize:
            feats = common.l2_normalize(feats)
        return feats

    # ------------------------------------------------------------------
    def run(self, trial_outdirs: Optional[Sequence[str]] = None) -> List[Dict]:
        config = self.config
        t_trials = self.t_trials
        start_time = time.time()

        from clip_gp_tpu.runtime.trainer_base import BaseTrainer

        spec_cls = SPECS[self.method]
        for o in self.trial_overrides:
            unknown = set(o) - set(spec_cls.supported_hparams)
            assert not unknown, (
                f"unsupported vmapped hparams for {self.method}: {unknown}"
            )

        with phase_timer("vmap.splits"):
            if self._prefetch is not None:
                # sampled (and possibly already decoded) by the prefetcher's
                # thread while the PREVIOUS group's executable ran
                (union_items, seed_index, seed_labels,
                 val_union, val_index, val_labels, dm) = (
                    self._prefetch.wait_splits()
                )
            else:
                (union_items, seed_index, seed_labels,
                 val_union, val_index, val_labels, dm) = (
                    self._build_per_seed_splits(needs_val=spec_cls.needs_val)
                )
        self.dm = dm
        # eval transforms never use the rng, but loader iteration draws item
        # seeds regardless — keep those draws off the global stream too
        if dm.test_loader is not None:
            dm.test_loader.rng = self._aug_rng
        if dm.val_loader is not None:
            dm.val_loader.rng = self._aug_rng
        classnames = dm.dataset.classnames

        base = BaseTrainer(config, dm)
        with phase_timer("vmap.clip_load"):
            arch, clip_params = base.load_clip_model()
        # specs that run a tower inside the loss (CoOp's text encode) need
        # the arch + params at construction time
        self.arch = arch
        self.clip_params = clip_params
        self.classnames = classnames
        templates = get_templates(config)
        with phase_timer("vmap.text_encode"):
            self.text_embeddings = common.encode_templates(
                clip_params, arch, classnames, templates
            )
        self.logit_scale = float(np.exp(np.asarray(clip_params["logit_scale"])))
        self.k, self.m, self.d = self.text_embeddings.shape
        self.shared["text_embeddings"] = self.text_embeddings

        spec = spec_cls(self)

        # one shared frozen-tower pass: union of all trials' few-shot images
        train_idx_j = jnp.asarray(seed_index)
        with phase_timer("vmap.union_encode"):
            if self._prefetch is not None:
                # consume the prefetched decode stream (identical batches —
                # same union order, same group-private augmentation draws)
                union_feats = jnp.asarray(
                    base.encode_images_batched(
                        _PrefetchedLoader(
                            self._prefetch, union_items,
                            config.dataloader.batch_size_train,
                        )
                    )[1]
                )
                if spec.normalize_features:
                    union_feats = common.l2_normalize(union_feats)
                self._prefetch.consumed = True
            else:
                union_feats = self._encode_union(
                    base, union_items, dm, spec.normalize_features
                )
        with phase_timer("vmap.test_encode"):
            labels_test, feats_test = base.encode_images_batched(
                dm.test_loader, cacheable=True
            )
        feats_test_j = jnp.asarray(feats_test)
        if spec.normalize_features:
            feats_test_j = common.l2_normalize(feats_test_j)
        self.labels_test = labels_test
        self.shared["feats_test"] = feats_test_j

        feats_train = union_feats[train_idx_j]  # [T,N,D]
        labels_train = jnp.asarray(seed_labels)  # [T,N]
        feats_train = self._shard_trials(feats_train)
        labels_train = self._shard_trials(labels_train)

        feats_val = labels_val_j = None
        if val_union is not None:
            val_feats_union = self._encode_union(
                base, val_union, dm, spec.normalize_features, train=False
            )
            feats_val = val_feats_union[jnp.asarray(val_index)]
            labels_val_j = jnp.asarray(val_labels)

        if self.on_before_train is not None and not spec.reencode_per_epoch:
            # feature-cached heads do no further host decode: everything from
            # here to the final eval is device-dominated, so the sweep can
            # start the NEXT group's union decode on the idle host now
            # (re-encoding heads keep decoding every epoch — firing early
            # would contend two decode pools for the CPU, the exact failure
            # --group-parallel measured on 1-core hosts)
            self.on_before_train()

        # per-trial params + consts
        params = _stack([spec.init_params(s) for s in self.seeds])
        with phase_timer("vmap.consts_prestage"):
            consts = spec.trial_consts(feats_train, labels_train)
        # shallow copy: warm start replaces top-level entries, so this
        # snapshot keeps the pre-warm-start arrays (the zero-shot state)
        zs_params = dict(params)
        with phase_timer("vmap.warm_start"):
            params = spec.warm_start(params, feats_train, labels_train)

        lr_vecs = spec.lr_vectors()
        hp_tree = spec.hp_tree()
        tx = spec.optimizer_tx()
        params = self._shard_trials(params)
        consts = self._shard_trials(consts)
        opt_state = tx.init(params)

        shared = self.shared
        # TRAIN dispatches get a pruned view without the eval-only entries:
        # jit caches key on EVERY argument's shape, so an unused
        # dataset-sized feats_test riding along would recompile the heavy
        # train program per dataset — defeating K-bucketing's whole point
        # (observed live: the 102-bucket CoCoOp trio re-paid its ~380 s
        # compile per dataset until this split). Specs only read eval-only
        # keys inside eval_logits/zero_shot — every method's e2e test
        # trains through this pruned view, so a loss that reached for one
        # would KeyError there.
        _EVAL_ONLY_SHARED = ("feats_test", "zs_weights")
        shared_train = {
            k: v for k, v in shared.items() if k not in _EVAL_ONLY_SHARED
        }

        def _bc(vec, ndim):
            return vec.reshape((vec.shape[0],) + (1,) * (ndim - 1))

        def step(params, opt_state, consts, feats_b, labels_b, keys, facs,
                 shared):
            def trial_loss(p, c, feats, labels, key, hps):
                return spec.loss(p, c, feats, labels, key, hps, shared)

            losses, grads = jax.vmap(
                jax.value_and_grad(trial_loss), in_axes=(0, 0, 0, 0, 0, 0)
            )(params, consts, feats_b, labels_b, keys, hp_tree)
            updates, opt_state = tx.update(grads, opt_state, params)
            # per-trial, per-group learning rates; facs holds each group's
            # per-trial schedule multiplier [T] for this step
            scaled = {}
            for name, u in updates.items():
                group = spec.lr_group(name)
                vec = lr_vecs[group] * facs[group]
                scaled[name] = jax.tree.map(
                    lambda x: x * _bc(-vec, x.ndim), u
                )
            return (
                jax.tree.map(lambda p, u: p + u, params, scaled),
                opt_state,
                losses,
            )

        step_jit = jax.jit(step, donate_argnums=(0, 1))

        # gradient-accumulation pieces for steps whose single dispatch
        # would exceed the worker's execution budget (microbatch_images):
        # Σ w_i·grad_i over image micro-slices ≡ the unsplit batch-mean
        # gradient (w_i = n_i/B), then ONE optimizer update
        def grad_part(params, consts, feats_mb, labels_mb, keys, w, shared):
            def trial_loss(p, c, feats, labels, key, hps):
                return spec.loss(p, c, feats, labels, key, hps, shared)

            losses, grads = jax.vmap(
                jax.value_and_grad(trial_loss), in_axes=(0, 0, 0, 0, 0, 0)
            )(params, consts, feats_mb, labels_mb, keys, hp_tree)
            return w * losses, jax.tree.map(lambda g: w * g, grads)

        grad_part_jit = jax.jit(grad_part)
        tree_add_jit = jax.jit(
            lambda a, b: jax.tree.map(jnp.add, a, b), donate_argnums=(0,)
        )

        def apply_grads(params, opt_state, grads, losses, facs):
            updates, opt_state = tx.update(grads, opt_state, params)
            scaled = {}
            for name, u in updates.items():
                group = spec.lr_group(name)
                vec = lr_vecs[group] * facs[group]
                scaled[name] = jax.tree.map(
                    lambda x: x * _bc(-vec, x.ndim), u
                )
            return (
                jax.tree.map(lambda p, u: p + u, params, scaled),
                opt_state,
                losses,
            )

        apply_jit = jax.jit(apply_grads, donate_argnums=(0, 1))

        def micro_step(params, opt_state, f_step, l_step, keys, facs_b, mb):
            """One train step as ceil(B/mb) bounded gradient dispatches +
            one update; f_step: [T, B, D] (same per-step keys every
            slice — see MethodSpec.microbatch_images for soundness)."""
            b_full = f_step.shape[1]
            acc = None
            for lo in range(0, b_full, mb):
                hi = min(b_full, lo + mb)
                with phase_timer("vmap.train.dispatch"):
                    part = grad_part_jit(
                        params, consts, f_step[:, lo:hi], l_step[:, lo:hi],
                        keys, (hi - lo) / b_full, shared_train,
                    )
                acc = part if acc is None else tree_add_jit(acc, part)
            with phase_timer("vmap.train.dispatch"):
                return apply_jit(params, opt_state, acc[1], acc[0], facs_b)

        def epoch_scan(params, opt_state, consts, feats_e, labels_e, keys_e,
                       factors, shared):
            """One dispatch per epoch: scan the vmapped step over batches.
            feats_e: [n_batches, T, B, D]; keys_e: [n_batches, T];
            factors: {group: [n_batches, T]} per-step schedule multipliers."""

            def body(carry, batch):
                params, opt_state = carry
                f, l, k, fac = batch
                params, opt_state, losses = step(
                    params, opt_state, consts, f, l, k, fac, shared
                )
                return (params, opt_state), losses

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (feats_e, labels_e, keys_e, factors)
            )
            return params, opt_state, losses

        epoch_jit = jax.jit(epoch_scan, donate_argnums=(0, 1))

        def epoch_scan_valid(params, opt_state, consts, feats_e, labels_e,
                             keys_e, factors, valid, shared):
            """K-bucketed variant of ``epoch_scan``: a per-step ``valid``
            flag makes padding steps state-passthrough no-ops (`where`
            keeps the carried params/opt state), so every dataset sharing
            a class bucket scans identical [seg, ...] shapes and reuses
            ONE compiled epoch program (parallel/k_bucket.py). Real steps
            compute exactly as in ``epoch_scan`` (`where(True, new, old)`
            is the new state)."""

            def body(carry, batch):
                params, opt_state = carry
                f, l, k, fac, v = batch
                p2, o2, losses = step(
                    params, opt_state, consts, f, l, k, fac, shared
                )
                keep = lambda a, b: jnp.where(v, a, b)  # noqa: E731
                return (
                    jax.tree.map(keep, p2, params),
                    jax.tree.map(keep, o2, opt_state),
                ), losses

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state),
                (feats_e, labels_e, keys_e, factors, valid),
            )
            return params, opt_state, losses

        epoch_valid_jit = jax.jit(epoch_scan_valid, donate_argnums=(0, 1))

        def trial_eval(p, c, key, shared):
            return spec.eval_logits(p, c, key, shared)

        eval_jit = jax.jit(jax.vmap(trial_eval, in_axes=(0, 0, 0, None)))

        def eval_fn(params, consts, keys, shared):
            return eval_jit(params, consts, keys, shared)

        # zero-shot block per trial (recorded before training, like the
        # in-process trainers)
        with phase_timer("vmap.zero_shot"):
            zs_logits = spec.zero_shot_logits(eval_fn, zs_params, consts, shared)

        n = feats_train.shape[1]
        batch_size = config.dataloader.batch_size_train
        slices = common.batch_slices(n, batch_size)
        n_batches = len(slices)
        max_epoch = spec.max_epoch()
        root_key = jax.random.key(int(self.seeds[0]))

        # Feature-cached methods (no per-epoch re-encode, no per-epoch host
        # hook) train the WHOLE run as one scanned executable: per-epoch
        # shuffles/keys/schedule factors are precomputed with the exact
        # streams the eager path consumes, so results are identical while the
        # ~max_epoch dispatch round-trips collapse to one (the vmap-axis
        # analog of the in-process Adapter's quiet-scan epochs).
        whole_run = (
            max_epoch > 0
            and not spec.reencode_per_epoch
            and type(spec).on_epoch_end is MethodSpec.on_epoch_end
            and os.environ.get("CLIP_GP_TPU_VMAP_EAGER_EPOCHS") != "1"
        )
        if whole_run:
            b_sz = slices[0][1] - slices[0][0]
            n_full = n_batches * b_sz
            perms_all = jnp.asarray(np.stack([
                np.stack([
                    np.random.default_rng((seed, epoch)).permutation(n)
                    for seed in self.seeds
                ])
                for epoch in range(max_epoch)
            ]))  # [E, T, N]
            fac_eb = [
                [spec.lr_factors(e, b, n_batches) for b in range(n_batches)]
                for e in range(max_epoch)
            ]
            factors_all = {
                g: jnp.asarray(np.asarray(
                    [[fac_eb[e][b][g] for b in range(n_batches)]
                     for e in range(max_epoch)], dtype=np.float32,
                ))
                for g in fac_eb[0][0]
            }  # {group: [E, n_batches, T]}
            keys_all = []
            for _ in range(max_epoch):  # same root_key evolution as eager
                root_key, sub = jax.random.split(root_key)
                keys_all.append(
                    jax.random.split(sub, n_batches * t_trials).reshape(
                        n_batches, t_trials
                    )
                )
            keys_all = jnp.stack(keys_all)  # [E, n_batches, T]

            def whole_train(params, opt_state, consts, feats_train,
                            labels_train, perms, keys, factors, shared):
                def epoch_body(carry, xs):
                    params, opt_state = carry
                    perm, keys_e, fac = xs
                    feats_e = jnp.take_along_axis(
                        feats_train, perm[:, :, None], axis=1
                    )
                    labels_e = jnp.take_along_axis(labels_train, perm, axis=1)
                    fb = feats_e[:, :n_full].reshape(
                        t_trials, n_batches, b_sz, -1
                    ).transpose(1, 0, 2, 3)
                    lb = labels_e[:, :n_full].reshape(
                        t_trials, n_batches, b_sz
                    ).transpose(1, 0, 2)

                    def body(c, batch):
                        p, o = c
                        f, l, k, fc = batch
                        p, o, losses = step(p, o, consts, f, l, k, fc, shared)
                        return (p, o), losses

                    (params, opt_state), losses = jax.lax.scan(
                        body, (params, opt_state), (fb, lb, keys_e, fac)
                    )
                    return (params, opt_state), losses[-1]

                (params, opt_state), losses_hist = jax.lax.scan(
                    epoch_body, (params, opt_state), (perms, keys, factors)
                )
                return params, opt_state, losses_hist

            whole_jit = jax.jit(whole_train, donate_argnums=(0, 1))
            with phase_timer("vmap.train.dispatch"):
                params, opt_state, losses_hist = whole_jit(
                    params, opt_state, consts, feats_train, labels_train,
                    perms_all, keys_all, factors_all, shared_train,
                )
            with phase_timer("vmap.train.epoch_end"):
                losses_np = np.asarray(losses_hist)  # ONE host transfer
                for epoch in range(max_epoch):
                    if (epoch + 1) % 10 == 0 or epoch == 0:
                        print(
                            f"[vmap-trials:{self.method}] epoch {epoch + 1}/"
                            f"{max_epoch} loss per trial: "
                            + " ".join(f"{v:.4f}" for v in losses_np[epoch])
                        )

        for epoch in range(0 if whole_run else max_epoch):
            if spec.reencode_per_epoch and epoch > 0:
                # fresh augmentations: one shared union pass per epoch
                # (ref: the per-epoch image encode in clip_adapter/taskres/
                # tip_adapter run_epoch loops)
                with phase_timer("vmap.train.reencode"):
                    union_feats = self._encode_union(
                        base, union_items, dm, spec.normalize_features
                    )
                feats_train = self._shard_trials(union_feats[train_idx_j])
            fac_b = [
                spec.lr_factors(epoch, b, n_batches) for b in range(n_batches)
            ]
            factors = {
                g: np.asarray([f[g] for f in fac_b], dtype=np.float32)
                for g in fac_b[0]
            }  # {group: [n_batches, T]}
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
            if n_batches > 1:
                b_sz = slices[0][1] - slices[0][0]
                n_full = n_batches * b_sz
                fb = feats_e[:, :n_full].reshape(
                    t_trials, n_batches, b_sz, -1
                ).transpose(1, 0, 2, 3)  # [n_batches, T, B, D]
                lb = labels_e[:, :n_full].reshape(
                    t_trials, n_batches, b_sz
                ).transpose(1, 0, 2)
                root_key, sub = jax.random.split(root_key)
                keys_e = jax.random.split(sub, n_batches * t_trials).reshape(
                    n_batches, t_trials
                )
                facs_j = jax.tree.map(jnp.asarray, factors)
                # heavy-step methods bound single-execution length by
                # splitting the epoch scan into segments (same batch order,
                # keys and factors — dispatch count is the only difference;
                # see MethodSpec.batches_per_dispatch). seg == 1 skips the
                # scan construct entirely (plain per-step dispatches — the
                # path the worker-crash repro proves safe) while consuming
                # the exact key/factor streams the scan would.
                # K-bucketed prompt specs pad the epoch to the bucket's
                # canonical step count S (no-op steps, state passthrough)
                # so the scan executable is shape-shared across datasets in
                # the bucket (parallel/k_bucket.py); everything else keeps
                # S == n_batches and the original paths.
                bucketed = (
                    k_bucket.enabled()
                    and getattr(spec, "k_pad", None) is not None
                )
                S = (
                    max(n_batches, spec.padded_n_batches(n_batches, b_sz))
                    if bucketed else n_batches
                )
                seg = max(1, min(S, spec.batches_per_dispatch(S, b_sz)))
                # snap to a divisor: equal-length segments / equal-width
                # micro-slices keep ONE compiled shape (see _divisor_le)
                seg = _divisor_le(S, seg)
                mb = _divisor_le(
                    b_sz, max(1, min(b_sz, spec.microbatch_images(b_sz)))
                )
                if mb < b_sz:
                    # even one step exceeds the execution budget: bounded
                    # gradient-accumulation dispatches, one update per step
                    # (host loop over real batches — padding never runs)
                    if epoch == 0:
                        print(
                            f"[vmap-trials:{self.method}] gradient "
                            f"accumulation: {mb} images/dispatch "
                            f"(batch {b_sz})"
                        )
                    for b in range(n_batches):
                        params, opt_state, losses = micro_step(
                            params, opt_state, fb[b], lb[b], keys_e[b],
                            {g: v[b] for g, v in facs_j.items()}, mb,
                        )
                elif seg == 1:
                    for b in range(n_batches):
                        with phase_timer("vmap.train.dispatch"):
                            params, opt_state, losses = step_jit(
                                params, opt_state, consts,
                                fb[b], lb[b], keys_e[b],
                                {g: v[b] for g, v in facs_j.items()},
                                shared_train,
                            )
                elif bucketed:
                    pad_steps = S - n_batches
                    if pad_steps:
                        fb = jnp.concatenate([fb, jnp.zeros(
                            (pad_steps,) + fb.shape[1:], fb.dtype)])
                        lb = jnp.concatenate([lb, jnp.zeros(
                            (pad_steps,) + lb.shape[1:], lb.dtype)])
                        keys_e = jnp.concatenate(
                            [keys_e] + [keys_e[:1]] * pad_steps
                        )
                        facs_j = {
                            g: jnp.concatenate([v, jnp.zeros(
                                (pad_steps,) + v.shape[1:], v.dtype)])
                            for g, v in facs_j.items()
                        }
                    valid = jnp.arange(S) < n_batches
                    for lo in range(0, S, seg):
                        if lo >= n_batches:
                            break  # all-padding segments: nothing to run
                        hi = lo + seg
                        with phase_timer("vmap.train.dispatch"):
                            params, opt_state, losses = epoch_valid_jit(
                                params, opt_state, consts,
                                fb[lo:hi], lb[lo:hi], keys_e[lo:hi],
                                {g: v[lo:hi] for g, v in facs_j.items()},
                                valid[lo:hi], shared_train,
                            )
                    # the print cadence wants the last REAL batch's loss
                    losses = losses[(n_batches - 1) % seg]
                else:
                    for lo in range(0, n_batches, seg):
                        hi = min(n_batches, lo + seg)
                        with phase_timer("vmap.train.dispatch"):
                            params, opt_state, losses = epoch_jit(
                                params, opt_state, consts,
                                fb[lo:hi], lb[lo:hi], keys_e[lo:hi],
                                {g: v[lo:hi] for g, v in facs_j.items()},
                                shared_train,
                            )
                    losses = losses[-1]
            else:
                for b, (lo, hi) in enumerate(slices):
                    root_key, sub = jax.random.split(root_key)
                    keys = jax.random.split(sub, t_trials)
                    facs_b = {
                        g: jnp.asarray(v[b]) for g, v in factors.items()
                    }
                    mb = _divisor_le(
                        hi - lo,
                        max(1, min(hi - lo, spec.microbatch_images(hi - lo))),
                    )
                    if mb < hi - lo:
                        if epoch == 0 and b == 0:
                            print(
                                f"[vmap-trials:{self.method}] gradient "
                                f"accumulation: {mb} images/dispatch "
                                f"(batch {hi - lo})"
                            )
                        params, opt_state, losses = micro_step(
                            params, opt_state, feats_e[:, lo:hi],
                            labels_e[:, lo:hi], keys, facs_b, mb,
                        )
                        continue
                    with phase_timer("vmap.train.dispatch"):
                        params, opt_state, losses = step_jit(
                            params, opt_state, consts,
                            feats_e[:, lo:hi], labels_e[:, lo:hi],
                            keys, facs_b, shared_train,
                        )
            with phase_timer("vmap.train.epoch_end"):
                spec.on_epoch_end(params, consts, shared, epoch)
                if (epoch + 1) % 10 == 0 or epoch == 0:
                    # ONE host transfer for all trials (per-value float()
                    # costs a full RTT each on tunneled backends — CLAUDE.md)
                    losses_np = np.asarray(losses)
                    print(
                        f"[vmap-trials:{self.method}] epoch {epoch + 1}/"
                        f"{max_epoch} loss per trial: "
                        + " ".join(f"{v:.4f}" for v in losses_np)
                    )

        # final eval + per-trial metrics.json
        with phase_timer("vmap.finalize"):
            params, eval_consts = spec.finalize(
                params, consts, shared, feats_val, labels_val_j
            )
        root_key, sub = jax.random.split(root_key)
        eval_keys = jax.random.split(sub, t_trials)
        with phase_timer("vmap.final_eval"):
            n_rows = int(shared["feats_test"].shape[0])
            rows = max(1, min(n_rows, spec.eval_rows_per_dispatch(n_rows)))
            if rows < n_rows:
                # bounded-execution eval: identical logits, one dispatch per
                # row chunk (same per-trial keys — eval keys are class-/
                # sample-shaped, never row-shaped, so chunk results equal
                # the unchunked dispatch's). Rows are independent, so the
                # tail pads with zero rows to the chunk shape (trimmed
                # below) — a ragged tail would compile the eval program a
                # second time (see _divisor_le).
                ft = shared["feats_test"]
                pad = (-n_rows) % rows
                if pad:
                    ft = jnp.concatenate(
                        [ft, jnp.zeros((pad,) + ft.shape[1:], ft.dtype)]
                    )
                parts = []
                for lo in range(0, n_rows + pad, rows):
                    sh = dict(shared)
                    sh["feats_test"] = ft[lo:lo + rows]
                    parts.append(
                        np.asarray(eval_fn(params, eval_consts, eval_keys, sh))
                    )
                logits = np.concatenate(parts, axis=1)[:, :n_rows]
            else:
                logits = np.asarray(
                    eval_fn(params, eval_consts, eval_keys, shared)
                )
            # K-bucketed specs emit [T, n, k_pad] logits with -inf padding;
            # slicing back to the real K makes every downstream metric
            # (top-1/ECE/macro-F1 class universe) EXACTLY the unpadded
            # computation. A no-op for everything else (last axis == k).
            logits = logits[..., : self.k]
        results = []
        for t, seed in enumerate(self.seeds):
            acc = compute_accuracy(logits[t], labels_test)[0]
            ece, ece_bins = compute_ece_with_bins(logits[t], labels_test)
            aece, aece_bins = compute_aece_with_bins(logits[t], labels_test)
            zero_shot = None
            if zs_logits is not None:
                zs_acc = compute_accuracy(zs_logits[t], labels_test)[0]
                zs_ece, zs_eb = compute_ece_with_bins(zs_logits[t], labels_test)
                zs_aece, zs_ab = compute_aece_with_bins(
                    zs_logits[t], labels_test
                )
                zero_shot = {
                    "top1_acc": zs_acc,
                    "ece": zs_ece,
                    "aece": zs_aece,
                    "calibration": zs_eb,
                    "adaptive_calibration": zs_ab,
                }
            metrics = {
                "top1_acc": float(acc),
                "ece": float(ece),
                "aece": float(aece),
                "calibration": ece_bins,
                "adaptive_calibration": aece_bins,
            }
            if spec.extended_metrics:
                # BaseTrainer.test writes the superset schema
                metrics["accuracy"] = float(acc)
                metrics["macro_f1"] = float(
                    compute_macro_f1(logits[t], labels_test)
                )
            result = {
                "seed": seed,
                "metrics": metrics,
                "zero_shot": zero_shot,
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
                if getattr(cfg.train, "enable_adapter_checkpoints", False):
                    # per-trial checkpoint in the in-process trainer's
                    # trainable_state layout → reloads via --eval-only
                    # --model-dir like the reference sweep children's
                    state = spec.export_state(
                        jax.tree.map(lambda x: np.asarray(x[t]), params),
                        jax.tree.map(lambda x: np.asarray(x[t]), eval_consts),
                    )
                    if state is not None:
                        writer.trainable_state = lambda s=state: s
                        writer.save_model(
                            spec.max_epoch() - 1, str(trial_outdirs[t])
                        )
        print(
            f"[vmap-trials:{self.method}] {t_trials} trials trained in "
            f"{time.time() - start_time:.1f}s"
        )
        return results


class DecodePrefetcher:
    """Decode-ahead for the sequential sweep path: while group g's device
    executable runs (training is one whole-run dispatch — the host is idle),
    group g+1's few-shot splits are sampled and its train-union images are
    decoded on that otherwise-idle CPU. On the profiled 1-core host the warm
    16-shot group is ~13.4 s host decode + ~8.8 s device train, strictly
    serialized without this — overlapping them bounds group time by
    max(decode, train) instead of their sum. Unlike ``--group-parallel``
    (which contends two decodes for one CPU and measured SLOWER here), this
    is 1-deep and single-producer: exactly one group decodes at a time.

    Bit-identity: splits sampling happens inside the same
    ``_SPLIT_RNG_LOCK``'d ``set_random_seed`` window the runner itself uses,
    and the union loader draws its per-item augmentation seeds from the
    runner's own group-private Random — the real run then adopts this
    prefetcher's runner (data manager, rng and all), so every later loader
    iteration continues the identical stream. Buffering is byte-bounded
    (``CLIP_GP_TPU_PREFETCH_BUDGET_MB``, default 512) so an ImageNet-sized
    union streams instead of materializing.
    """

    def __init__(self, config, seeds, trial_overrides=None, method=None,
                 mesh=None):
        self.runner = VmappedTrials(
            config, seeds, mesh=mesh, trial_overrides=trial_overrides,
            method=method,
        )
        self.runner._prefetch = self
        self._budget = int(
            os.environ.get("CLIP_GP_TPU_PREFETCH_BUDGET_MB", "512")
        ) * (1 << 20)
        self._batches: List[Dict] = []
        self._bytes = 0
        self._cv = threading.Condition()
        self._splits = None
        self._done = False
        self._cancelled = False
        self._error: Optional[BaseException] = None
        self.consumed = False
        self._thread = threading.Thread(
            target=self._produce, name="decode-prefetch", daemon=True
        )

    def start(self) -> "DecodePrefetcher":
        self._thread.start()
        return self

    # -- producer ---------------------------------------------------------
    def _produce(self) -> None:
        try:
            r = self.runner
            splits = r._build_per_seed_splits(
                needs_val=SPECS[r.method].needs_val
            )
            with self._cv:
                self._splits = splits
                self._cv.notify_all()
            union_items, dm = splits[0], splits[6]
            from clip_gp_tpu.data.pipeline import BatchLoader

            loader = BatchLoader(
                union_items,
                dm.tfm_train,
                r.config.dataloader.batch_size_train,
                shuffle=False,
                drop_last=False,
                num_workers=r.config.dataloader.num_workers,
                rng=r._aug_rng,
            )
            for batch in loader:
                nbytes = int(batch["img"].nbytes)
                with self._cv:
                    while (
                        self._batches
                        and self._bytes + nbytes > self._budget
                        and not self._cancelled
                    ):
                        self._cv.wait(0.5)
                    if self._cancelled:
                        return
                    self._batches.append(batch)
                    self._bytes += nbytes
                    self._cv.notify_all()
        except BaseException as e:  # surfaced to the consumer
            with self._cv:
                self._error = e
                self._cv.notify_all()
        finally:
            with self._cv:
                self._done = True
                self._cv.notify_all()

    # -- consumer (VmappedTrials.run) --------------------------------------
    def wait_splits(self):
        with self._cv:
            while self._splits is None and self._error is None:
                self._cv.wait(0.5)
            if self._splits is None:
                raise self._error
            return self._splits

    def batches(self):
        """Yield the union loader's batches in order, streaming from the
        bounded buffer (the producer keeps decoding while we encode)."""
        while True:
            with self._cv:
                while not self._batches and not self._done:
                    self._cv.wait(0.5)
                if self._error is not None:
                    raise self._error
                if not self._batches:
                    return
                batch = self._batches.pop(0)
                self._bytes -= int(batch["img"].nbytes)
                self._cv.notify_all()
            yield batch

    def cancel(self) -> None:
        """Discard an unconsumed prefetch (its group fell back / aborted)."""
        with self._cv:
            self._cancelled = True
            self._batches.clear()
            self._bytes = 0
            self._cv.notify_all()


class _PrefetchedLoader:
    """Loader-shaped view over a DecodePrefetcher's batch stream, so
    ``encode_images_batched`` consumes prefetched decodes unchanged."""

    def __init__(self, prefetcher, data_source, batch_size):
        self._pf = prefetcher
        self.data_source = data_source
        self.batch_size = batch_size

    def __len__(self):
        n = len(self.data_source)
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        return self._pf.batches()


# Backward-compatible aliases (round-1 API)
VmappedAdapterTrials = VmappedTrials


def run_seed_vmapped_adapter(config, seeds: Sequence[int], trial_outdirs=None,
                             mesh=None, trial_overrides=None):
    return VmappedTrials(
        config, seeds, mesh=mesh, trial_overrides=trial_overrides,
        method="Adapter",
    ).run(trial_outdirs)


def run_vmapped_trials(config, seeds: Sequence[int], trial_outdirs=None,
                       mesh=None, trial_overrides=None, method=None,
                       on_before_train=None):
    runner = VmappedTrials(
        config, seeds, mesh=mesh, trial_overrides=trial_overrides,
        method=method,
    )
    runner.on_before_train = on_before_train
    return runner.run(trial_outdirs)
