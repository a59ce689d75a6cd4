"""Class-axis bucketing for the vmapped prompt methods (CoOp / CoCoOp).

Every dataset's class count K is a distinct executable shape for the
differentiated-text-tower programs, so an 11-dataset suite pays ~11 heavy
compiles per prompt method (measured: a cold CoCoOp cell costs ~5× its
warm time, BENCH_cocoop_vmap.json; round-4 verdict "next" #2). Padding K
up to a small ladder of bucket sizes — with the padded classes masked out
of the loss and sliced off before metrics — makes the train/eval programs
shape-identical across datasets sharing a bucket, so the in-process jit
cache and the persistent compile cache actually hit.

The ladder is tuned to the reference's 11-dataset suite
(ref: scripts/run_experiment.sh + configs/*.yaml class counts):

    48   ← OxfordPets 37, DTD 47
    102  ← Caltech101 100, FGVCAircraft 100, Food101 101, UCF101 101,
           OxfordFlowers 102   (5 datasets → ONE compile)
    196  ← StanfordCars 196
    397  ← SUN397 397
    1024 ← ImageNet 1000

A waste cap keeps padding bounded: when the smallest covering rung
exceeds 1.5×K (EuroSAT 10→48 would be 4.8×, K=50→102 would be 2.04×), or
K is above the ladder, K stays EXACT — a lone bucket occupant saves no
compile and only pays padding compute (measured live: a padded lone K=50
CoOp group ran 1.5× slower warm). Worst-case padded work is OxfordPets
(+73% epoch prompt-encodes for DTD's shared compile); the five-way 102
bucket at ≈+5% is the payoff.
``CLIP_GP_TPU_K_BUCKET_LADDER="4,8,..."`` overrides the ladder (tests).

Parity: padded logits are masked to −inf (zero probability, zero gradient
to padded prompt rows), the runner slices eval logits back to the real K
before any metric, and padded dummy train steps pass state through
untouched — top-1 is exact vs unpadded, loss/ECE differ only in fp
reduction order over the wider axis (tests/test_k_bucket.py).

Disable with ``CLIP_GP_TPU_K_BUCKETS=0`` (e.g. to measure the unpadded
baseline); the in-process backend is unaffected either way.
"""

from __future__ import annotations

import os

BUCKETS = (48, 102, 196, 397, 512, 1024)


def enabled() -> bool:
    return os.environ.get("CLIP_GP_TPU_K_BUCKETS", "1") != "0"


def _ladder() -> tuple[int, ...]:
    raw = os.environ.get("CLIP_GP_TPU_K_BUCKET_LADDER")
    if not raw:
        return BUCKETS
    return tuple(sorted(int(x) for x in raw.split(",") if x.strip()))


def bucket_k(k: int) -> int:
    """Smallest bucket ≥ k, unless that bucket exceeds the waste cap
    (1.5×k) or k is above the ladder — then k stays exact.

    The waste cap bounds padded prompt-encode compute at +50% for ANY k:
    a k just above a rung (e.g. 50 → 102 would be 2.04×) stays exact
    instead — measured live: a lone K=50 CoOp group padded to 102 ran
    1.5× SLOWER warm than unpadded (doubled steps × doubled prompts with
    no bucket-mate to share the compile with). Every 11-suite dataset
    still lands where the ladder intends (Pets 37→48 is 1.30×)."""
    if not enabled():
        return int(k)
    for b in _ladder():
        if k <= b:
            return b if 2 * b <= 3 * k else int(k)
    return int(k)


def padded_batches(k_pad: int, shots: int, batch_size: int) -> int:
    """The bucket-canonical full-batch count of a few-shot epoch: what
    ``common.batch_slices`` would yield for a k_pad-class dataset at this
    shot count (drop-last). Datasets sharing a bucket pad their real batch
    count up to this with no-op steps so the epoch-scan executable is
    shape-identical across them."""
    n = k_pad * max(1, shots)
    if n <= batch_size:
        return 1
    return n // batch_size
