"""clip_gp_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
CLIP-GP (calibrated few-shot adaptation of frozen CLIP models with a variational
Gaussian-Process template weighter).

The package is a ground-up redesign of the reference system
(paulmerceur/CLIP-GP, PyTorch/gpytorch) for TPU hardware:

- Frozen CLIP encoders (ModifiedResNet + ViT + text transformer) are pure JAX
  functions over parameter pytrees, compiled once with `jax.jit`, with a Pallas
  flash-attention kernel on the hot path.
- The per-class variational GP template weighter (PCA, RBF/Matérn/Linear
  kernels, whitened SVGP predictive, KL, Monte-Carlo sampling, sparsemax) is
  hand-written batched linear algebra vmapped over classes.
- Few-shot adapter heads (Adapter, CLIP-Adapter, TaskRes, CoOp, CoCoOp,
  Tip-Adapter/-F) are pure train-step functions over a shared frozen-feature
  runtime, each compiled to a single XLA executable.
- Grid experiments map onto `jax.sharding.Mesh` device axes instead of
  per-GPU subprocesses.

Layer map (mirrors reference SURVEY §1):
  core/      config + registries + logging + seeding      (ref: utils/config.py ...)
  ops/       metrics, sparsemax, flash attention, image ops
  models/    BPE tokenizer + CLIP towers + checkpoint ingestion (ref: clip/)
  gp/        batched whitened SVGP template weighter     (ref: trainers/gp_template_weigher.py)
  methods/   the six adaptation methods                  (ref: trainers/)
  data/      dataset catalogs, few-shot splits, transforms (ref: datasets/, utils/dataset_base.py)
  runtime/   trainer lifecycle, optax optimizers, checkpoints, metrics.json
  parallel/  mesh helpers + trial-parallel sweep runner  (ref: utils/hparam_search.py)
  reporting/ results aggregation                         (ref: scripts/aggregate_results.py)
"""

__version__ = "0.1.0"
