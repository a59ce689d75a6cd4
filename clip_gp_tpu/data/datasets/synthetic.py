"""Synthetic image-folder dataset for tests and benchmarks.

This environment has no dataset downloads, so end-to-end paths (decode →
augment → encode → adapt → metrics.json) are exercised against a deterministic
generated dataset: each class is a distinct color/frequency pattern with
per-image noise, so features are linearly separable and adapters visibly
learn. Uses the same folder-per-class layout + split JSON + few-shot cache
machinery as the real catalogs.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from clip_gp_tpu.core.registry import DATASET_REGISTRY
from clip_gp_tpu.data.datasets.catalog import _SplitJsonDataset

SYNTH_CLASSNAMES = ["red circle", "green square", "blue stripe", "yellow dot"]


def generate_synthetic_imagefolder(
    root: str,
    num_classes: int = 4,
    images_per_class: int = 20,
    image_size: int = 64,
    seed: int = 0,
    fmt: str = "png",
) -> str:
    """Create <root>/synthetic/images/<class>/img_*.<fmt>; idempotent.

    ``fmt="jpg"`` matches the real catalogs (all 15 are JPEG datasets), which
    also exercises the native fused decode path in benchmarks."""
    image_dir = os.path.join(root, "synthetic", "images")
    marker = os.path.join(
        image_dir,
        f".done_{num_classes}_{images_per_class}_{image_size}"
        + ("" if fmt == "png" else f"_{fmt}"),
    )
    if os.path.exists(marker):
        return image_dir
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:image_size, 0:image_size]
    for c in range(num_classes):
        cname = (
            SYNTH_CLASSNAMES[c]
            if c < len(SYNTH_CLASSNAMES)
            else f"pattern {c}"
        )
        cdir = os.path.join(image_dir, cname.replace(" ", "_"))
        os.makedirs(cdir, exist_ok=True)
        base_color = np.zeros(3)
        base_color[c % 3] = 200
        freq = 1 + c
        for i in range(images_per_class):
            phase = rng.uniform(0, 2 * np.pi)
            pattern = np.sin(2 * np.pi * freq * xx / image_size + phase)
            img = np.zeros((image_size, image_size, 3), dtype=np.float32)
            img += base_color * (0.6 + 0.4 * pattern[..., None])
            img += rng.normal(0, 20, img.shape)
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                os.path.join(cdir, f"img_{i:04d}.{fmt}")
            )
    with open(marker, "w") as f:
        f.write("ok")
    return image_dir


@DATASET_REGISTRY.register("Synthetic")
class Synthetic(_SplitJsonDataset):
    dataset_dir = "synthetic"
    split_json = "split_zhou_Synthetic.json"
    # folder names use underscores; classnames are the spaced originals
    new_cnames = {name.replace(" ", "_"): name for name in SYNTH_CLASSNAMES}

    def _load_splits(self, config):
        import glob
        import shutil

        root = os.path.abspath(os.path.expanduser(config.dataset.root))
        image_dir = os.path.join(root, "synthetic", "images")
        # a completed generation leaves a .done_* marker; benchmarks
        # pre-generate larger variants (more classes / jpg) into the same
        # layout with their own marker, and a default-args regeneration
        # would clobber them — so any marker means the tree is usable
        done = glob.glob(os.path.join(image_dir, ".done_*"))
        if not done:
            if os.path.isdir(image_dir) and os.listdir(image_dir):
                # non-empty but marker-less: an interrupted generation left a
                # partial tree — silently training on it would give a wrong
                # class count; regenerate from scratch (cheap, deterministic)
                print(f"[Synthetic] partial tree at {image_dir}; regenerating")
                shutil.rmtree(image_dir)
            generate_synthetic_imagefolder(root)
        return super()._load_splits(config)
