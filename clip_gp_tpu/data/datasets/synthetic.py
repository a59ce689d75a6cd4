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


def _clear_split_caches(dataset_root: str) -> None:
    """Drop the split JSON + few-shot pickle caches derived from a previous
    image tree — they index impaths a regeneration deletes."""
    import shutil

    p = os.path.join(dataset_root, "split_zhou_Synthetic.json")
    if os.path.exists(p):
        os.remove(p)
    fs = os.path.join(dataset_root, "split_fewshot")
    if os.path.isdir(fs):
        shutil.rmtree(fs)


def generate_synthetic_imagefolder(
    root: str,
    num_classes: int = 4,
    images_per_class: int = 20,
    image_size: int = 64,
    seed: int = 0,
    fmt: str = "png",
) -> str:
    """Create <root>/synthetic/images/<class>/img_*.<fmt>; idempotent per
    parameter set.

    ``fmt="jpg"`` matches the real catalogs (all 15 are JPEG datasets), which
    also exercises the native fused decode path in benchmarks.

    A ``.done_*`` marker names the parameters of the one COMPLETE generation
    occupying the tree. Requesting a different variant replaces the tree
    wholesale — tree, old marker, and the split/few-shot caches built
    against it are all deleted BEFORE any new image is written, so an
    interrupted regeneration can never leave a stale marker vouching for a
    mixed tree."""
    import shutil

    dataset_root = os.path.join(root, "synthetic")
    image_dir = os.path.join(dataset_root, "images")
    # the marker must encode EVERY parameter that shapes the tree — a
    # seed-7 request finding a seed-0 marker must regenerate, not silently
    # hand back someone else's pixels (default-parameter spellings stay
    # suffix-free so pre-existing trees remain valid)
    marker = os.path.join(
        image_dir,
        f".done_{num_classes}_{images_per_class}_{image_size}"
        + ("" if fmt == "png" else f"_{fmt}")
        + ("" if seed == 0 else f"_s{seed}"),
    )
    if os.path.exists(marker):
        return image_dir
    # caches strictly before the tree: if generation is interrupted at any
    # point past this line, what remains is marker-less AND cache-less, so
    # the next load regenerates everything. Clearing even when images/ is
    # already gone matters — a stale split JSON must never outlive the tree
    # it indexed.
    _clear_split_caches(dataset_root)
    if os.path.isdir(image_dir):
        shutil.rmtree(image_dir)
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

        root = os.path.abspath(os.path.expanduser(config.dataset.root))
        image_dir = os.path.join(root, "synthetic", "images")
        # a completed generation leaves exactly one .done_* marker (the
        # generator deletes tree + marker + split caches together before
        # regenerating, so a marker always vouches for the whole tree);
        # benchmarks pre-generate larger variants (more classes / jpg) into
        # the same layout with their own marker, and a default-args
        # regeneration would clobber them — so any marker means usable
        done = glob.glob(os.path.join(image_dir, ".done_*"))
        if not done:
            if os.path.isdir(image_dir) and os.listdir(image_dir):
                # non-empty but marker-less: an interrupted generation left
                # a partial tree — silently training on it would give a
                # wrong class count (the generator rmtrees it first)
                print(f"[Synthetic] partial tree at {image_dir}; regenerating")
            generate_synthetic_imagefolder(root)
        return super()._load_splits(config)
