#!/usr/bin/env python3
"""Serving entry: classify images with a trained run directory.

The reference stops at ``--eval-only`` on a registered dataset split; this
CLI closes the deployment loop — point it at any trained run's output
directory and either a folder of images or a dataset split, and it writes
top-k predictions with calibrated confidences. The run's exact configuration
is reloaded from its ``config.json`` and the class vocabulary comes from the
checkpoint itself (``__classnames__``), so folder prediction needs neither
the training dataset on disk nor any flag replay.

Usage:
  # arbitrary image folder (recursive), class names from the checkpoint:
  python scripts/predict.py --model-dir output/caltech/gp/seed1 \\
      --images /path/to/photos --topk 5 --output preds.json

  # a registered dataset split (adds accuracy/ECE summary):
  python scripts/predict.py --model-dir output/caltech/gp/seed1 --split test

Works with every checkpointing trainer (Adapter/GP, CLIP-Adapter, TaskRes,
CoOp, CoCoOp). Tip-Adapter has no checkpoint flow (parity with the
reference: its train() is fully custom, ref: trainers/tip_adapter.py:82).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".gif"}


class _PredictDataset:
    """Minimal dataset carrying only the class vocabulary."""

    def __init__(self, classnames):
        self.classnames = list(classnames)
        self.num_classes = len(self.classnames)
        self.lab2cname = dict(enumerate(self.classnames))
        self.train_x = []
        self.val = []
        self.test = []


class _PredictDataManager:
    """Loader-free stand-in for DataManager: trainers only need the class
    vocabulary to rebuild their frozen text side (build_model reads
    ``dm.dataset.classnames``; the loaders stay None for folder serving)."""

    def __init__(self, classnames):
        self.dataset = _PredictDataset(classnames)
        self.train_loader_x = None
        self.val_loader = None
        self.test_loader = None
        self.num_classes = self.dataset.num_classes
        self.lab2cname = self.dataset.lab2cname


def list_images(root: Path):
    files = [
        p for p in sorted(root.rglob("*"))
        if p.is_file() and p.suffix.lower() in IMAGE_EXTS
    ]
    if not files:
        raise SystemExit(f"no images found under {root}")
    return files


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model-dir", required=True,
                    help="trained run output dir (config.json + adapter/)")
    ap.add_argument("--images", default=None,
                    help="folder of images (recursive); mutually exclusive "
                         "with --split")
    ap.add_argument("--split", default=None, choices=["test", "val", "train"],
                    help="registered dataset split from the run's config")
    ap.add_argument("--output", default=None,
                    help="output JSON path (default <model-dir>/predictions.json)")
    def _positive_int(v):
        iv = int(v)
        if iv < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return iv

    ap.add_argument("--topk", type=_positive_int, default=5)
    ap.add_argument("--batch-size", type=_positive_int, default=None)
    ap.add_argument("--load-epoch", type=int, default=None)
    ap.add_argument("--int8", action="store_true",
                    help="serve the frozen ViT image tower with int8 MXU "
                         "matmuls (models/quantized.py; measured 1.27x "
                         "ViT-B/16 / 1.14x ViT-B/32 end-to-end encode rate, "
                         "small feature perturbation)")
    args = ap.parse_args(argv)
    if (args.images is None) == (args.split is None):
        ap.error("exactly one of --images / --split is required")

    from clip_gp_tpu.runtime import compile_cache

    compile_cache.enable()

    import jax.numpy as jnp
    import numpy as np

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401
    from clip_gp_tpu.core.config import config_from_dict
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.datum import Datum
    from clip_gp_tpu.data.pipeline import BatchLoader, build_data_manager
    from clip_gp_tpu.data.transforms import build_transform
    from clip_gp_tpu.runtime.trainer_base import (
        read_checkpoint_classnames,
        resolve_checkpoint_path,
    )

    model_dir = Path(args.model_dir)
    cfg_path = model_dir / "config.json"
    if not cfg_path.exists():
        raise SystemExit(f"missing {cfg_path} — not a run directory?")
    with cfg_path.open() as f:
        config = config_from_dict(json.load(f))
    if args.batch_size:
        config.dataloader.batch_size_test = args.batch_size
        config.dataloader.batch_size_train = args.batch_size  # --split train
    if args.int8:
        config.model.int8_inference = True

    ckpt = resolve_checkpoint_path(str(model_dir), args.load_epoch)
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {model_dir / 'adapter'}")

    set_random_seed(max(int(config.seed), 0))
    t0 = time.time()
    if args.images is not None:
        classnames = read_checkpoint_classnames(ckpt)
        if classnames is None:
            raise SystemExit(
                f"{ckpt} stores no classnames (pre-round-2 checkpoint); "
                "use --split to rebuild the vocabulary from the dataset"
            )
        dm = _PredictDataManager(classnames)
        paths = list_images(Path(args.images))
        datums = [Datum(impath=str(p), label=0) for p in paths]
        loader = BatchLoader(
            datums,
            build_transform(config, is_train=False),
            config.dataloader.batch_size_test,
            num_workers=config.dataloader.num_workers,
        )
        labels = None
    else:
        dm = build_data_manager(config)
        source = {
            "test": dm.dataset.test,
            "val": dm.dataset.val,
            "train": dm.dataset.train_x,
        }[args.split]
        if not source:
            raise SystemExit(f"run has no {args.split} split")
        paths = [Path(d.impath) for d in source]
        labels = np.asarray([d.label for d in source])
        classnames = dm.dataset.classnames
        loader = None

    trainer = build_trainer(config, dm)
    trainer.build_model()
    if trainer.load_model(str(model_dir), epoch=args.load_epoch) == 0:
        raise SystemExit("checkpoint reload failed")

    if loader is not None:
        _, feats = trainer.encode_images_batched(loader)
        logits = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    elif args.split == "train":
        # serving must be deterministic: encode the train images under the
        # EVAL transform. extract_features("train") applies the random
        # training augmentation — right for training-feature parity (ref:
        # trainers/adapter.py:886-926), wrong for predictions about the
        # images themselves.
        train_loader = BatchLoader(
            source,
            build_transform(config, is_train=False),
            config.dataloader.batch_size_test,
            num_workers=config.dataloader.num_workers,
        )
        _, feats = trainer.encode_images_batched(train_loader)
        logits = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    else:
        # extract_features handles the split loaders AND the val/test
        # feature cache (a previously-encoded split is not re-run)
        _, logits, _ = trainer.extract_features(args.split)
        logits = np.asarray(logits)
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    probs = e / e.sum(axis=1, keepdims=True)
    k = min(args.topk, probs.shape[1])
    top_idx = np.argsort(-probs, axis=1)[:, :k]

    predictions = [
        {
            "path": str(p),
            "topk": [
                {
                    "classname": classnames[int(c)],
                    "label": int(c),
                    "prob": round(float(probs[i, c]), 6),
                }
                for c in top_idx[i]
            ],
        }
        for i, p in enumerate(paths)
    ]
    payload = {
        "model_dir": str(model_dir),
        "checkpoint": str(ckpt),
        "backbone": config.model.backbone_name,
        "num_classes": len(classnames),
        "num_images": len(paths),
        "elapsed_s": round(time.time() - t0, 2),
        "predictions": predictions,
    }
    if labels is not None:
        from clip_gp_tpu.ops.metrics import compute_aece, compute_ece

        top1 = float((top_idx[:, 0] == labels).mean() * 100)
        payload["summary"] = {
            "split": args.split,
            "top1_acc": round(top1, 4),
            "ece": round(float(compute_ece(logits, labels)), 4),
            "aece": round(float(compute_aece(logits, labels)), 4),
        }
        print(f"{args.split}: top-1 {top1:.2f}% over {len(paths)} images")

    out = Path(args.output) if args.output else model_dir / "predictions.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w") as f:
        json.dump(payload, f, indent=2)
    print(f"Wrote {len(paths)} predictions to {out}")


if __name__ == "__main__":
    main()
