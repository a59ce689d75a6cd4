"""Device-mesh helpers and the sharded training step used for multi-chip runs.

The workload's natural parallelism (SURVEY §2.1): the heavy FLOPs are frozen
CLIP feature extraction → shard the batch axis over the mesh (pure DP — the
towers are frozen so there is no gradient sync for them at all); adapter/GP
training over cached features replicates the tiny trainable state and shards
the feature batch, with XLA inserting the psum for grad reduction from the
sharding annotations. Grid trials additionally map onto the same axis
(see parallel/sweep.py).

No NCCL/MPI analog exists or is needed: collectives are derived by XLA from
`jax.sharding` annotations and ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place array(s) with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def _shard_map_encode(mesh: Mesh, encode_fn, axis: str = "data"):
    """jit(shard_map(encode)) with params replicated and the batch sharded.

    shard_map rather than bare jit sharding annotations: the encode lowers
    Pallas kernels on TPU (fused attention / int8 blocks), and Mosaic
    kernels cannot be auto-partitioned by XLA (jax raises
    NotImplementedError when a pallas_call meets a multi-device sharding).
    Under shard_map each shard runs the unmodified single-device program —
    and frozen-tower extraction is pure DP, so no collectives are needed.
    """
    mapped = jax.shard_map(
        encode_fn, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis)
    )
    return jax.jit(mapped)


def _padded_call(encode_jit, params_rep, ndev: int):
    """Wrap a shard_mapped encode so uneven batches work: shard_map requires
    the leading axis to divide the mesh, so pad to a device-count multiple
    and slice the features back."""

    def call(images):
        n = images.shape[0]
        n_pad = -(-n // ndev) * ndev
        if n_pad != n:
            pad = [(0, n_pad - n)] + [(0, 0)] * (images.ndim - 1)
            images = jnp.pad(images, pad)
        return encode_jit(params_rep, images)[:n]

    return call


def sharded_encode_fn(mesh: Mesh, clip_params, arch, preprocess, axis: str = "data"):
    """Batch-sharded frozen feature extraction: images sharded over `axis`,
    params replicated, output features sharded over `axis`. Batches that do
    not divide the mesh are padded and sliced back."""
    from clip_gp_tpu.models import clip_model

    def encode(params, images_u8):
        images = preprocess(images_u8)
        return clip_model.encode_image(params, arch, images)

    encode_jit = _shard_map_encode(mesh, encode, axis)
    params_rep = jax.device_put(clip_params, NamedSharding(mesh, P()))
    return _padded_call(encode_jit, params_rep, mesh.devices.size)


def extraction_shard_devices():
    """The local devices auto-sharded extraction would run over, or ``None``
    when sharding does not apply. Single source of truth for the gate — the
    feature-cache key tags entries with the device count (see
    ``feature_cache.cache_key``), so the decision here must be computable
    before any encode happens. Not applicable when:

    - there is one local device (the common single-chip case);
    - this is a multi-process (multi-host) jax program — the trainer feeds
      host-local loader arrays, which a process-spanning mesh cannot accept;
    - the caller pinned ``jax.default_device`` (the group-parallel sweep
      backend dedicates one whole device per trial-group worker — a
      mesh-wide encode inside a worker would defeat that scheduling);
    - ``CLIP_GP_TPU_SHARD_EXTRACTION=0`` (escape hatch).
    """
    import os

    if os.environ.get("CLIP_GP_TPU_SHARD_EXTRACTION") == "0":
        return None
    if jax.process_count() > 1:
        return None
    devices = jax.local_devices()
    if len(devices) < 2:
        return None
    if jax.config.jax_default_device is not None:
        return None
    return devices


def maybe_sharded_encode(encode_fn, params, axis: str = "data", devices=None):
    """Batch-DP wrapper for a ``(params, images) -> feats`` encode callable
    over all local devices, or ``None`` when sharding does not apply (see
    ``extraction_shard_devices`` for the gate).

    Used by ``BaseTrainer.encode_images_batched`` so a multi-chip host
    shards frozen-tower extraction (the dominant FLOPs of every run) without
    any config. Feature extraction is per-image independent, so there is no
    cross-device reduction at all; XLA only inserts the gather for the
    (already-sharded) output when the host reads it. The batch is padded to
    a device-count multiple and sliced back.

    ``devices``: pass the list a prior ``extraction_shard_devices()`` call
    returned to pin the decision (the trainer snapshots it once so its
    feature-cache keys always describe the executable that encoded); default
    re-evaluates the gate now.

    The returned callable exposes ``.params_rep`` — the mesh-replicated
    weight copy — so the caller can drop its own single-device copy of the
    same subtree rather than keep both resident.
    """
    if devices is None:
        devices = extraction_shard_devices()
    if devices is None:
        return None
    mesh = Mesh(np.array(devices), (axis,))
    encode_jit = _shard_map_encode(mesh, encode_fn, axis)
    params_rep = jax.device_put(params, NamedSharding(mesh, P()))
    call = _padded_call(encode_jit, params_rep, len(devices))
    call.params_rep = params_rep
    return call


def sharded_train_step(mesh: Mesh, step_fn, axis: str = "data"):
    """Wrap a (params, opt_state, features, labels, key) step with DP
    shardings: trainable state replicated, batch sharded. XLA derives the
    gradient all-reduce from the output sharding constraint."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, shard, shard, rep),
        out_shardings=None,
        donate_argnums=(0, 1),
    )
