"""Trainer lifecycle runtime: feature extraction, evaluation, checkpoints,
metrics.json.

Behavioral parity with the reference BaseTrainer (ref: utils/trainer.py:240-663):
same lifecycle hooks (train → before_train → [epoch loop] → after_train →
test), the same ``metrics.json`` schema (timestamp/dataset/shots/seed/method/
backbone/zero_shot/metrics/config/output_dir/train_time_s), the
``<out>/adapter/`` checkpoint directory contract, and the documented quirk
that ``max_epoch`` comes from ``adapter.clip_adapter_epochs`` for every
trainer (ref quirk SURVEY §2.3.3 — the knob the experiment YAMLs actually
tune).

TPU-native differences: models are (arch, params-pytree) pairs, evaluation
batches are padded to a fixed shape so XLA compiles one executable per split,
and checkpoints are torch-free ``.npz`` pytrees.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import time
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.core.seeding import KeySequence
from clip_gp_tpu.runtime.profiling import maybe_trace, phase_timer
from clip_gp_tpu.data.transforms import preprocess_fn
from clip_gp_tpu.models import clip_model
from clip_gp_tpu.models.clip_loader import (
    _flatten,
    _unflatten,
    load_clip_resolved,
)
from clip_gp_tpu.ops.metrics import (
    compute_accuracy,
    compute_aece,
    compute_aece_with_bins,
    compute_ece,
    compute_ece_with_bins,
    compute_macro_f1,
)

CKPT_PREFIX = "model.ckpt-"


def resolve_checkpoint_path(model_dir: str, epoch: Optional[int] = None):
    """<out>/adapter checkpoint discovery: explicit epoch, else model-best,
    else highest-numbered (ref: utils/trainer.py:376-399). None if absent."""
    adapter_dir = Path(model_dir) / "adapter"
    if epoch is not None:
        path = adapter_dir / f"{CKPT_PREFIX}{epoch}.npz"
        return path if path.exists() else None
    best = adapter_dir / "model-best.npz"
    if best.exists():
        return best
    cands = sorted(
        adapter_dir.glob(f"{CKPT_PREFIX}*.npz"),
        key=lambda p: int(re.search(r"(\d+)", p.stem).group(1)),
    )
    return cands[-1] if cands else None


def read_checkpoint_classnames(path) -> Optional[list]:
    """Label-ordered classnames stored in a checkpoint, if present."""
    with np.load(path, allow_pickle=False) as data:
        if "__classnames__" in data.files:
            return [str(c) for c in data["__classnames__"]]
    return None


def infer_method_name(config) -> str:
    """Method tag for metrics.json (ref: utils/trainer.py:604-619).

    Deliberate divergence: the reference's mapping only knows the
    'Adapter-*' spellings, so runs launched under the canonical names
    ('Tip-Adapter', 'CLIP-Adapter', 'TaskRes' — reachable here via the
    registry alias quirk-fix, COMPONENTS.md §2.3.1/2.3.2) would fall
    through to 'gp'/'baseline' and aggregate into the wrong family; the
    canonical spellings are mapped to the same tags as their 'Adapter-*'
    aliases instead."""
    tname = getattr(config, "trainer_name", "")
    mapping = {
        "Adapter-TipA-F": "tipaf",
        "Tip-Adapter-F": "tipaf",
        "Adapter-TipA": "tipa",
        "Tip-Adapter": "tipaf" if config.adapter.tip_adapter_trainable else "tipa",
        "Adapter-CoOp": "coop",
        "Adapter-CoCoOp": "cocoop",
        "Adapter-CLIP-Adapter": "clip-adapter",
        "CLIP-Adapter": "clip-adapter",
        "TaskRes": "taskres",
    }
    if tname in mapping:
        return mapping[tname]
    return "gp" if bool(getattr(config.adapter, "use_gp", False)) else "baseline"


class BaseTrainer:
    def __init__(self, config, dataset_manager):
        self.config = config
        self.dm = dataset_manager
        self.start_epoch = self.epoch = 0
        # parity quirk: every trainer's epoch budget comes from
        # adapter.clip_adapter_epochs (ref: utils/trainer.py:256)
        self.max_epoch = int(config.adapter.clip_adapter_epochs)
        self.output_dir = config.output_dir
        self.train_loader_x = dataset_manager.train_loader_x
        self.val_loader = dataset_manager.val_loader
        self.test_loader = dataset_manager.test_loader
        self.num_classes = dataset_manager.num_classes
        self.lab2cname = dataset_manager.lab2cname
        self.best_result = -np.inf
        self.time_start: Optional[float] = None
        self.keys = KeySequence(int(config.seed))
        self.preprocess = preprocess_fn(config)
        self.zero_shot_metrics: Optional[Dict] = None
        self._best_val_acc = float("-inf")
        self._val_feature_memo: Optional[Tuple] = None
        self._writer = None
        # set by build_model
        self.clip_arch = None
        self.clip_params = None

    # ------------------------------------------------------------------
    # model plumbing provided by subclasses
    # ------------------------------------------------------------------
    def build_model(self):
        raise NotImplementedError

    def predict_logits(self, features: jnp.ndarray) -> jnp.ndarray:
        """Eval-mode logits from CLIP visual features [N,D] → [N,K]."""
        raise NotImplementedError

    def trainable_state(self) -> Dict:
        """Small trainable pytree for checkpointing."""
        return {}

    def load_trainable_state(self, state: Dict) -> None:
        pass

    # ------------------------------------------------------------------
    # CLIP + feature extraction
    # ------------------------------------------------------------------
    def load_clip_model(self):
        allow_random = os.environ.get("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS") == "1"
        # weights_tag identifies the weights ACTUALLY loaded (file identity or
        # random seed) — it keys the disk feature cache, so it must change
        # whenever the resolved checkpoint changes
        self.clip_arch, self.clip_params, self.weights_tag = load_clip_resolved(
            self.config, allow_random=allow_random, seed=int(self.config.seed)
        )
        # drop any encode state built against previously loaded weights —
        # the jitted encode takes params as an argument, but the snapshot in
        # _encode_params (and the sharded replica) would otherwise keep
        # serving the stale tower
        self._encode_jit = None
        self._encode_params = None
        self._encode_sharded = None
        self._encode_plan_cached = None
        if (
            getattr(self.config.model, "int8_inference", False)
            and not self.clip_arch.is_vit
        ):
            # warn at load time, not encode time: with a warm feature cache
            # the encode build never runs and the user would otherwise get
            # silent bf16 results for an explicit int8 request
            print(
                "[WARN] MODEL.INT8_INFERENCE covers the ViT towers only; "
                f"falling back to bf16 for {self.clip_arch.name}"
            )
        return self.clip_arch, self.clip_params

    def _int8_effective(self) -> bool:
        """Whether extraction will actually run the int8 tower: the config
        flag AND an arch the int8 path covers (ViT only). Keying the feature
        cache off the raw flag would store bf16-fallback features under an
        int8 label."""
        return bool(
            getattr(self.config.model, "int8_inference", False)
            and getattr(self, "clip_arch", None) is not None
            and self.clip_arch.is_vit
        )

    def _encode_plan(self) -> dict:
        """Extraction decisions — int8?, fused kernels?, shard width —
        frozen ONCE per loaded tower.

        The cache key must describe the executable that actually encodes;
        the underlying gates (``CLIP_GP_TPU_SHARD_EXTRACTION``,
        ``CLIP_GP_TPU_DISABLE_FLASH``, pinned default device) are re-readable
        environment state that could flip between a trainer's extractions,
        so both the key (``encode_images_batched``) and the executable build
        (``_encode_batched_uncached``) read this one snapshot."""
        plan = getattr(self, "_encode_plan_cached", None)
        if plan is None:
            from clip_gp_tpu.ops.flash_attention import use_flash
            from clip_gp_tpu.parallel.mesh import extraction_shard_devices

            int8 = self._int8_effective()
            devices = extraction_shard_devices()
            plan = {
                "int8": int8,
                "int8_fused": bool(int8 and use_flash()),
                "shard_device_list": devices,
                "shard_devices": len(devices) if devices else 0,
            }
            self._encode_plan_cached = plan
        return plan

    def encode_images_batched(
        self, loader, cacheable: bool = False
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One pass of the frozen image tower over a loader → (labels [N],
        features [N,D]). Batches are padded to the loader batch size so the
        encoder compiles once per split shape.

        ``cacheable=True`` (deterministic eval splits only) consults the disk
        feature cache — a whole sweep then encodes each test set once."""
        from clip_gp_tpu.runtime import feature_cache

        key = None
        if cacheable:
            plan = self._encode_plan()
            key = feature_cache.cache_key(
                self.config, loader.data_source,
                getattr(self, "weights_tag", "default"),
                int8=plan["int8"],
                int8_fused=plan["int8_fused"],
                shard_devices=plan["shard_devices"],
            )
            # in-flight lock: a concurrent sweep worker missing the memo for
            # the same split waits for the winner's encode instead of
            # duplicating it
            with feature_cache.inflight_lock(key):
                hit = feature_cache.memo_get(key)
                if hit is not None:
                    print(f"[feature-cache] memo hit: {key}")
                    return hit
                if feature_cache.cache_dir() is not None:
                    hit = feature_cache.load(key)
                    if hit is not None:
                        print(f"[feature-cache] hit: {key}")
                        feature_cache.memo_put(key, *hit)
                        return hit
                return self._encode_batched_uncached(loader, key)
        return self._encode_batched_uncached(loader, key)

    def _encode_batched_uncached(
        self, loader, key: Optional[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        from clip_gp_tpu.runtime import feature_cache
        arch, params = self.clip_arch, self.clip_params
        preprocess = self.preprocess

        # one jitted encode per trainer: rebuilding the closure per call
        # would re-trace (and re-compile) the whole frozen tower for every
        # split extraction. params is an explicit argument: closing over the
        # weights would bake them into the HLO as constants (huge
        # executables / remote-compile payloads on tunneled TPU backends)
        if getattr(self, "_encode_jit", None) is None:
            plan = self._encode_plan()
            if plan["int8"]:
                from clip_gp_tpu.models import quantized

                # weights quantize once per trainer; the int8 blocks replace
                # the bf16 tower only here (training math is untouched —
                # every method trains on the extracted features)
                self._encode_params = quantized.quantize_visual_jit(
                    params, arch
                )
                int8_fused = plan["int8_fused"]

                @jax.jit
                def encode(qvisual, images_u8):
                    return quantized.encode_image_q8(
                        qvisual, arch, preprocess(images_u8),
                        use_fused=int8_fused,
                    )
            else:
                # visual subtree only: the sharded path below replicates
                # _encode_params to every device, and the text tower /
                # token embedding (~40% of CLIP weights) play no part in
                # image extraction
                self._encode_params = params["visual"]

                @jax.jit
                def encode(visual, images_u8):
                    return clip_model.encode_image(
                        {"visual": visual}, arch, preprocess(images_u8)
                    )

            self._encode_jit = encode
            # on a multi-device host, shard the extraction batch over all
            # local devices (pure DP — per-image math, no collectives; the
            # sharded executable may still differ from single-device at ULP
            # level, which the feature-cache key records as a dpN tag).
            # The device list comes from the SAME plan snapshot the cache
            # key used, so key provenance always matches the executable.
            if plan["shard_devices"] > 1:
                from clip_gp_tpu.parallel.mesh import maybe_sharded_encode

                self._encode_sharded = maybe_sharded_encode(
                    encode, self._encode_params,
                    devices=plan["shard_device_list"],
                )
                # adopt the mesh-replicated visual tower so the extraction
                # path holds one copy (self.clip_params keeps the original
                # full tree for the text tower and the methods)
                self._encode_params = self._encode_sharded.params_rep
            else:
                self._encode_sharded = None

        from clip_gp_tpu.methods.common import extract_with

        encode_call = self._encode_sharded or (
            lambda imgs: self._encode_jit(self._encode_params, imgs)
        )
        with phase_timer("feature_extraction"):
            feats, labels = extract_with(encode_call, loader)
        if key is not None:
            feature_cache.memo_put(key, labels, feats)
            if feature_cache.cache_dir() is not None:
                feature_cache.store(key, labels, feats)
        return labels, feats

    def extract_features(self, partition: str = "train"):
        """(labels, logits, features) for a split, with logits from the
        current model (ref: trainers/adapter.py:886-926)."""
        print(f"Extracting features from: {partition}")
        loader = {
            "train": self.dm.eval_train_loader()
            if hasattr(self.dm, "eval_train_loader")
            else self.train_loader_x,
            "val": self.val_loader,
            "test": self.test_loader,
        }[partition]
        labels, feats = self.encode_images_batched(
            loader, cacheable=partition in ("val", "test")
        )
        logits = np.asarray(self.predict_logits(jnp.asarray(feats)))
        return labels, logits, feats

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    def before_train(self):
        if self.config.resume:
            self.start_epoch = self.load_model(self.config.resume)
        if getattr(self.config.train, "enable_tensorboard", False):
            writer_dir = Path(self.output_dir) / "tensorboard"
            writer_dir.mkdir(parents=True, exist_ok=True)
            self.init_writer(str(writer_dir))
        self.time_start = time.time()

    def init_writer(self, log_dir: str) -> None:
        """TensorBoard scalars via tensorboardX (ref: utils/trainer.py:331-345)."""
        if self._writer is None:
            try:
                from tensorboardX import SummaryWriter
            except ImportError:
                print("tensorboardX unavailable; scalar logging disabled")
                return
            print(f"Initialize tensorboard (log_dir={log_dir})")
            self._writer = SummaryWriter(log_dir=log_dir)

    def write_scalar(self, tag: str, value, global_step=None) -> None:
        if self._writer is not None and isinstance(value, (int, float)):
            self._writer.add_scalar(tag, value, global_step)

    def close_writer(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None

    def after_train(self):
        print("Finish training")
        if not getattr(self.config, "no_test", False):
            if getattr(self.config, "final_model", "last") == "best_val":
                print("Deploy the model with the best val performance")
                self.load_model(self.output_dir)
            else:
                print("Deploy the last-epoch model")
            self.test()
        if self.time_start is not None:
            elapsed = str(datetime.timedelta(seconds=round(time.time() - self.time_start)))
            print(f"Elapsed: {elapsed}")
        self.close_writer()

    def before_epoch(self):
        pass

    def after_epoch(self):
        last = (self.epoch + 1) == self.max_epoch
        freq = int(getattr(self.config.train, "checkpoint_freq", 0))
        meet_freq = freq > 0 and (self.epoch + 1) % freq == 0
        if (meet_freq or last) and getattr(
            self.config.train, "enable_adapter_checkpoints", False
        ):
            self.save_model(self.epoch, self.output_dir)
        # best-val tracking: the reference defines the final_model=best_val
        # deploy path but never writes model-best (quirk — utils/trainer.py
        # save_model(val_result) is never called with one); here the intended
        # behavior is implemented: evaluate val each epoch, keep the best
        if (
            getattr(self.config, "final_model", "last") == "best_val"
            and self.val_loader is not None
            and len(self.dm.dataset.val or []) > 0
        ):
            if self._val_feature_memo is None:
                labels, feats = self.encode_images_batched(
                    self.val_loader, cacheable=True
                )
                # device-resident: this runs every epoch, and re-uploading
                # the val matrix each time costs a full H2D round trip
                self._val_feature_memo = (labels, jnp.asarray(feats))
            labels, feats = self._val_feature_memo
            logits = np.asarray(self.predict_logits(feats))
            acc = compute_accuracy(logits, labels)[0]
            if acc > self._best_val_acc:
                self._best_val_acc = acc
                self.save_model(self.epoch, self.output_dir,
                                model_name="model-best")
                print(f"New best val accuracy: {acc:.2f} "
                      f"(epoch {self.epoch + 1})")

    def train(self):
        with maybe_trace("train"):
            self.build_model()
            self.before_train()
            with phase_timer("train_epochs"):
                for self.epoch in range(self.start_epoch, self.max_epoch):
                    self.before_epoch()
                    self.run_epoch()
                    self.after_epoch()
            self.after_train()

    def run_epoch(self):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # evaluation + metrics.json
    # ------------------------------------------------------------------
    def compute_zero_shot_block(self, logits: np.ndarray, labels: np.ndarray):
        """Zero-shot metrics block recorded before training
        (ref: trainers/adapter.py:589-611)."""
        zs_acc = compute_accuracy(logits, labels)[0]
        zs_ece, zs_bins = compute_ece_with_bins(logits, labels)
        zs_aece, zs_abins = compute_aece_with_bins(logits, labels)
        print("Zero-Shot accuracy on test: " + str(round(zs_acc, 2)))
        print("Zero-Shot ECE on test: " + str(round(zs_ece, 2)))
        print("Zero-Shot AECE on test: " + str(round(zs_aece, 2)))
        self.zero_shot_metrics = {
            "top1_acc": zs_acc,
            "ece": zs_ece,
            "aece": zs_aece,
            "calibration": zs_bins,
            "adaptive_calibration": zs_abins,
        }
        return self.zero_shot_metrics

    def eval_logits_labels(self, split: str = "test"):
        labels, feats = self.encode_images_batched(
            self.test_loader if split == "test" else self.val_loader,
            cacheable=True,
        )
        logits = np.asarray(self.predict_logits(jnp.asarray(feats)))
        return logits, labels

    def test(self, split: Optional[str] = None) -> float:
        split = split or "test"
        print(f"Evaluate on the *{split}* set")
        logits, labels = self.eval_logits_labels(split)
        accuracy = compute_accuracy(logits, labels)[0]
        macro_f1 = compute_macro_f1(logits, labels)
        ece = compute_ece(logits, labels)
        aece = compute_aece(logits, labels)
        _, ece_bins = compute_ece_with_bins(logits, labels)
        _, aece_bins = compute_aece_with_bins(logits, labels)
        # both spellings appear in the reference pipeline ("accuracy" from
        # BaseTrainer.test, "top1_acc" from _compute_final_metrics); the
        # aggregator reads either — write the superset.
        results = {
            "accuracy": accuracy,
            "top1_acc": accuracy,
            "macro_f1": macro_f1,
            "ece": ece,
            "aece": aece,
            "calibration": ece_bins,
            "adaptive_calibration": aece_bins,
        }
        print("=> result")
        print(f"* total: {len(labels):,}")
        print(f"* correct: {int((logits.argmax(1) == labels).sum()):,}")
        print(f"* accuracy: {accuracy:.1f}%")
        print(f"* error: {100 - accuracy:.1f}%")
        print(f"* macro_f1: {macro_f1:.1f}%")
        print(f"* ECE: {ece:.2f}%")
        print(f"* AECE: {aece:.2f}%")
        self.write_run_summary_json(results, start_time=self.time_start or time.time())
        for key, value in results.items():
            self.write_scalar(f"{split}/{key}", value, self.epoch)
        return accuracy

    def compute_final_metrics(self) -> Dict:
        """metrics.json "metrics" block (ref: utils/trainer.py:559-597)."""
        logits, labels = self.eval_logits_labels("test")
        _, ece_bins = compute_ece_with_bins(logits, labels)
        _, aece_bins = compute_aece_with_bins(logits, labels)
        return {
            "top1_acc": float(compute_accuracy(logits, labels)[0]),
            "ece": float(compute_ece(logits, labels)),
            "aece": float(compute_aece(logits, labels)),
            "calibration": ece_bins,
            "adaptive_calibration": aece_bins,
        }

    def write_run_summary_json(self, metrics: Dict, start_time: float) -> None:
        """metrics.json with the reference schema (ref: utils/trainer.py:599-639)."""
        from clip_gp_tpu.core.config import config_to_dict

        out_dir = Path(self.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        payload = {
            "timestamp": datetime.datetime.now().isoformat(),
            "dataset": self.config.dataset.name,
            "shots": int(self.config.dataset.num_shots),
            "seed": int(self.config.seed),
            "method": infer_method_name(self.config),
            "backbone": self.config.model.backbone_name,
            "zero_shot": self.zero_shot_metrics,
            "metrics": metrics,
            "config": config_to_dict(self.config),
            "output_dir": str(out_dir),
            "train_time_s": float(max(0.0, time.time() - start_time)),
        }
        with (out_dir / "metrics.json").open("w") as f:
            json.dump(payload, f, indent=2)

    # ------------------------------------------------------------------
    # checkpoints (torch-free npz of the small trainable pytree)
    # ------------------------------------------------------------------
    def extra_checkpoint_state(self) -> Dict:
        """Non-trainable arrays a cross-dataset reload needs (e.g. GP buffers
        derived from the *training* dataset's templates). Saved under a
        separate namespace; same-dataset loads ignore it."""
        return {}

    def remap_trainable_state(self, state: Dict, extra: Dict, idx) -> Dict:
        """Select the per-class rows ``idx`` (eval-label order → trained-label
        index) out of a checkpoint trained on a superset of classes.

        Enables OOD evaluation on class subsets (BASELINE config #5:
        ImageNet-trained adapters evaluated on ImageNet-A/R's 200 classes).
        The reference's strict ``load_state_dict`` crashes on this shape
        mismatch (ref: utils/trainer.py:408), so subset eval is a documented
        capability extension; full-class OOD sets (V2/Sketch) load unchanged.
        Heads with per-class state override this; class-agnostic heads return
        ``state`` as-is.
        """
        raise ValueError(
            f"{type(self).__name__}: checkpoint was trained on different "
            "classes and this trainer has no cross-dataset remap"
        )

    def save_model(
        self, epoch: int, output_dir: str, model_name: Optional[str] = None
    ) -> None:
        state = self.trainable_state()
        if not state:
            return
        save_dir = Path(output_dir) / "adapter"
        save_dir.mkdir(parents=True, exist_ok=True)
        name = model_name or f"{CKPT_PREFIX}{epoch + 1}"
        extra = self.extra_checkpoint_state()
        if extra and not getattr(self, "_extra_saved", False):
            # constant within a run (e.g. GP buffers, ~tens of MB at ImageNet
            # scale) — written once beside the per-epoch checkpoints instead
            # of duplicated into each
            np.savez_compressed(
                save_dir / "extra_state.npz", **_flatten({"extra": extra})
            )
            self._extra_saved = True
        flat = _flatten({"state": state})
        dataset = getattr(self.dm, "dataset", None)
        classnames = getattr(dataset, "classnames", None)
        if classnames is not None:
            # label-ordered classnames: the key for cross-dataset row remaps
            flat["__classnames__"] = np.asarray(list(classnames), dtype=np.str_)
        class_keys = getattr(dataset, "class_keys", None)
        if class_keys is not None:
            # unique per-class keys (ImageNet wnids) — preferred over
            # classnames for remapping, which repeat ('crane' twice)
            flat["__class_keys__"] = np.asarray(list(class_keys), dtype=np.str_)
        np.savez_compressed(
            save_dir / f"{name}.npz", __epoch__=np.asarray(epoch + 1), **flat
        )
        print(f"Checkpoint saved to {save_dir / name}.npz")

    def adopt_reference_state(self, state: Dict, extra: Dict) -> Dict:
        """Hook for trainer-specific validation/buffer adoption when loading
        a converted reference checkpoint (runtime/ref_checkpoint.py). The
        default accepts class-agnostic state as-is; trainers whose converted
        state carries companion buffers (Adapter's GP) override."""
        if extra:
            raise ValueError(
                f"{type(self).__name__} cannot adopt reference extra state "
                f"{sorted(extra)}"
            )
        return state

    def load_model(self, model_dir: str, epoch: Optional[int] = None) -> int:
        path = resolve_checkpoint_path(model_dir, epoch)
        if path is None:
            from clip_gp_tpu.runtime import ref_checkpoint

            ref_path = ref_checkpoint.resolve_reference_checkpoint_path(
                model_dir, epoch
            )
            if ref_path is not None:
                print(f"Loading reference checkpoint from {ref_path}")
                state, extra, ep = ref_checkpoint.convert_reference_checkpoint(
                    ref_path, getattr(self.config, "trainer_name", "")
                )
                state = self.adopt_reference_state(state, extra)
                self.load_trainable_state(state)
                return ep
            print(f"No checkpoint found under {Path(model_dir) / 'adapter'}")
            return 0
        print(f"Loading checkpoint from {path}")

        def _str_list(data, name):
            return (
                [str(c) for c in data[name]] if name in data.files else None
            )

        with np.load(path, allow_pickle=False) as data:
            epoch_loaded = int(data["__epoch__"])
            saved_classnames = _str_list(data, "__classnames__")
            saved_keys = _str_list(data, "__class_keys__")
            flat = {
                k: data[k]
                for k in data.files
                if k not in ("__epoch__", "__classnames__", "__class_keys__")
            }
        tree = _unflatten(flat)
        state = tree["state"]
        dataset = getattr(self.dm, "dataset", None)
        cur = getattr(dataset, "classnames", None)
        cur_keys = getattr(dataset, "class_keys", None)
        idx = None
        if saved_keys is not None and cur_keys is not None:
            # unique per-class keys (ImageNet wnids) — exact even where
            # classnames repeat ('crane' twice in the 1000-class vocabulary)
            if list(cur_keys) != saved_keys:
                idx = self._remap_index(
                    saved_keys, list(cur_keys), kind="class keys"
                )
        elif (
            saved_classnames is not None
            and cur is not None
            and list(cur) != saved_classnames
        ):
            idx = self._remap_index(
                saved_classnames, list(cur), kind="classnames",
                forbid_duplicates=True,
            )
        if idx is not None:
            print(
                f"Remapping per-class state: {len(saved_classnames or saved_keys)}"
                f" trained -> {len(idx)} eval classes"
            )
            extra = tree.get("extra", {})
            if not extra:
                extra_path = path.parent / "extra_state.npz"
                if extra_path.exists():
                    with np.load(extra_path, allow_pickle=False) as d:
                        extra = _unflatten({k: d[k] for k in d.files}).get(
                            "extra", {}
                        )
            state = self.remap_trainable_state(state, extra, idx)
        self.load_trainable_state(state)
        return epoch_loaded

    @staticmethod
    def _remap_index(saved, cur, kind, forbid_duplicates=False):
        """eval-label-ordered indices into the trained class axis."""
        pos = {}
        dups = set()
        for i, c in enumerate(saved):
            if c in pos:
                dups.add(c)
            pos[c] = i
        missing = [c for c in cur if c not in pos]
        if missing:
            raise ValueError(
                f"checkpoint was trained on {kind} that do not cover this "
                f"dataset; missing {len(missing)}, e.g. {missing[:3]}"
            )
        if forbid_duplicates:
            # name-keyed remap is ambiguous when a needed name repeats in
            # the trained vocabulary — picking either row would silently
            # degrade that class (wnid keys don't have this problem)
            ambiguous = sorted(dups & set(cur))
            if ambiguous:
                raise ValueError(
                    f"cannot remap per-class state: {kind} {ambiguous[:3]} "
                    "appear more than once in the trained vocabulary; "
                    "evaluate on the full class set instead"
                )
        return np.asarray([pos[c] for c in cur], dtype=np.int64)
