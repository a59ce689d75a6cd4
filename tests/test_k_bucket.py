"""K-bucketing of the vmapped prompt methods (parallel/k_bucket.py):
padded classes are masked out of the loss, padded epoch steps pass state
through untouched, eval logits slice back to the real K — so bucketed
results match the unpadded run (top-1 exact; loss/ECE differ only in fp
reduction order over the wider axis), while datasets sharing a bucket
present identical program shapes to jit (round-4 verdict "next" #2)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clip_gp_tpu.core.config import Config  # noqa: E402
from clip_gp_tpu.parallel import k_bucket  # noqa: E402
import clip_gp_tpu.data.datasets  # noqa: F401,E402
import clip_gp_tpu.methods  # noqa: F401,E402


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def test_bucket_ladder_mapping(monkeypatch):
    monkeypatch.delenv("CLIP_GP_TPU_K_BUCKETS", raising=False)
    monkeypatch.delenv("CLIP_GP_TPU_K_BUCKET_LADDER", raising=False)
    # the 11-suite mapping the ladder was tuned for
    assert k_bucket.bucket_k(37) == 48    # OxfordPets
    assert k_bucket.bucket_k(47) == 48    # DTD
    for k in (100, 101, 102):             # the five-way 102 bucket
        assert k_bucket.bucket_k(k) == 102
    assert k_bucket.bucket_k(196) == 196  # StanfordCars exact
    assert k_bucket.bucket_k(397) == 397  # SUN397 exact
    assert k_bucket.bucket_k(1000) == 1024  # ImageNet
    # below the ladder: exact (a lone occupant saves no compile)
    assert k_bucket.bucket_k(10) == 10    # EuroSAT
    assert k_bucket.bucket_k(4) == 4
    # above the ladder: exact
    assert k_bucket.bucket_k(5000) == 5000
    # disabled: always exact
    monkeypatch.setenv("CLIP_GP_TPU_K_BUCKETS", "0")
    assert k_bucket.bucket_k(100) == 100
    monkeypatch.delenv("CLIP_GP_TPU_K_BUCKETS", raising=False)
    # the 1.5x waste cap: a covering rung that over-pads stays exact
    assert k_bucket.bucket_k(50) == 50   # 102 would be 2.04x (measured bad)
    assert k_bucket.bucket_k(75) == 102  # 1.36x: bucketed
    # env ladder override (tests use tiny buckets)
    monkeypatch.setenv("CLIP_GP_TPU_K_BUCKET_LADDER", "6,12")
    assert k_bucket.bucket_k(4) == 6    # 1.5x: exactly at the cap
    assert k_bucket.bucket_k(3) == 3    # 6 would be 2x: exact
    assert k_bucket.bucket_k(7) == 7    # 12 would be 1.71x: exact
    assert k_bucket.bucket_k(9) == 12   # 1.33x: bucketed


def test_padded_batches_matches_batch_slices():
    from clip_gp_tpu.methods import common

    for k_pad, shots, bs in [(102, 16, 32), (48, 1, 32), (6, 4, 4)]:
        want = len(common.batch_slices(k_pad * shots, bs))
        assert k_bucket.padded_batches(k_pad, shots, bs) == want


def _prompt_config(tmp_path, method, shots=4, batch=4):
    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = shots
    c.model.backbone_name = "TEST-ViT"
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = batch
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.adapter.use_gp = False
    c.adapter.clip_adapter_epochs = 2
    c.adapter.n_ctx = 2
    c.optim.max_epoch = 2
    c.train.print_freq = 1000
    c.seed = 1
    c.trainer_name = method
    return c


def _run(tmp_path, method, tag, seeds=(1, 2)):
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    config = _prompt_config(tmp_path, method)
    outdirs = [tmp_path / f"{tag}/seed{s}" for s in seeds]
    feature_cache.memo_clear()
    results = run_vmapped_trials(
        config, list(seeds), outdirs, method=method
    )
    payloads = [
        json.loads((d / "metrics.json").read_text()) for d in outdirs
    ]
    return results, payloads


@pytest.mark.parametrize("method", ["Adapter-CoOp", "Adapter-CoCoOp"])
def test_bucketed_output_parity(tmp_path, monkeypatch, method):
    """K=4 padded to bucket 6 (2 padded classes, 2 no-op epoch steps:
    n_batches 4 → S 6) vs the unpadded run: identical top-1, ECE within
    reduction-order noise, identical metrics.json schema."""
    monkeypatch.setenv("CLIP_GP_TPU_K_BUCKET_LADDER", "6")
    monkeypatch.delenv("CLIP_GP_TPU_K_BUCKETS", raising=False)
    _, padded = _run(tmp_path, method, "padded")

    monkeypatch.setenv("CLIP_GP_TPU_K_BUCKETS", "0")
    _, exact = _run(tmp_path, method, "exact")

    for p, e in zip(padded, exact):
        assert p["metrics"]["top1_acc"] == e["metrics"]["top1_acc"]
        assert p["metrics"]["macro_f1"] == e["metrics"]["macro_f1"]
        assert p["metrics"]["ece"] == pytest.approx(
            e["metrics"]["ece"], abs=1e-5
        )
        assert set(p["metrics"]) == set(e["metrics"])
        # eval logits were sliced back to the real K before metrics: the
        # calibration dict has the unpadded structure, and the binned
        # examples are conserved (bin MEMBERSHIP may flip for confidences
        # within fp noise of a bin edge — CoCoOp's prompt chunk size
        # changes with k_pad, shifting reduction order)
        cp, ce_ = p["metrics"]["calibration"], e["metrics"]["calibration"]
        assert set(cp) == set(ce_)
        for field in cp:
            assert len(cp[field]) == len(ce_[field])
        if "bin_counts" in cp:
            assert sum(cp["bin_counts"]) == sum(ce_["bin_counts"])


def _fake_runner(tmp_path, csc=False, k=4):
    """Minimal runner surface CoOpSpec.__init__/init_params touch."""
    from types import SimpleNamespace

    import jax

    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    config = _prompt_config(tmp_path, "Adapter-CoOp")
    config.adapter.csc = csc
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    return SimpleNamespace(
        config=config,
        classnames=[f"class {i}" for i in range(k)],
        clip_params=init_clip_params(jax.random.key(0), arch),
        seeds=[1, 2],
        t_trials=2,
        trial_overrides=[{}, {}],
        shared={},
        arch=arch,
        k=k,
    )


def test_bucketed_padding_internals(tmp_path, monkeypatch):
    """The spec pads prompt parts/epoch length to the bucket and draws the
    REAL-K init values (identical to the unpadded init) before padding."""
    from clip_gp_tpu.parallel import trial_vmap

    monkeypatch.setenv("CLIP_GP_TPU_K_BUCKET_LADDER", "6")
    monkeypatch.delenv("CLIP_GP_TPU_K_BUCKETS", raising=False)
    runner = _fake_runner(tmp_path, csc=True)
    spec = trial_vmap.CoOpSpec(runner)
    assert spec.k_pad == 6 and runner.k == 4
    assert runner.shared["coop_prefix"].shape[0] == 6
    assert runner.shared["coop_suffix"].shape[0] == 6
    assert runner.shared["coop_eot"].shape[0] == 6
    # padded rows replicate class 0's prompt rows
    np.testing.assert_array_equal(
        np.asarray(runner.shared["coop_suffix"][4]),
        np.asarray(runner.shared["coop_suffix"][0]),
    )
    mask = np.asarray(runner.shared["coop_class_mask"])
    assert mask.tolist() == [True] * 4 + [False] * 2
    # csc ctx: rows 0..3 equal the unpadded draw, rows 4..5 zero
    p = spec.init_params(1)
    assert p["ctx"].shape[0] == 6
    monkeypatch.setenv("CLIP_GP_TPU_K_BUCKETS", "0")
    runner_exact = _fake_runner(tmp_path, csc=True)
    spec_exact = trial_vmap.CoOpSpec(runner_exact)
    p_exact = spec_exact.init_params(1)
    np.testing.assert_array_equal(
        np.asarray(p["ctx"][:4]), np.asarray(p_exact["ctx"])
    )
    assert not np.asarray(p["ctx"][4:]).any()
    monkeypatch.delenv("CLIP_GP_TPU_K_BUCKETS", raising=False)
    # epoch padding: 4 real batches pad to the bucket-canonical 6
    assert spec.padded_n_batches(4, 4) == 6
    # shape-sharing: a bucket-mate (k=5, same shots/B) pads identically
    runner5 = _fake_runner(tmp_path, csc=True, k=5)
    spec5 = trial_vmap.CoOpSpec(runner5)
    assert spec5.k_pad == 6
    assert (
        runner5.shared["coop_prefix"].shape
        == runner.shared["coop_prefix"].shape
    )
    assert spec5.padded_n_batches(5, 4) == spec.padded_n_batches(4, 4)


def test_prompt_trim_is_exact(tmp_path, monkeypatch):
    """Sequence-trimmed prompts (methods/coop.py trim_prompt_parts) yield
    the full-77 computation's pooled features exactly (causal mask: EOT
    position never attends past itself) up to fp reduction order."""
    import jax
    import jax.numpy as jnp

    from clip_gp_tpu.methods.coop import (
        assemble_prompts,
        build_prompt_parts,
        trim_prompt_parts,
    )
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    monkeypatch.delenv("CLIP_GP_TPU_TRIM_PROMPTS", raising=False)
    config = _prompt_config(tmp_path, "Adapter-CoOp")
    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    clip_params = init_clip_params(jax.random.key(0), arch)
    names = ["golden retriever", "x", "air conditioner unit thing"]
    ctx, prefix, suffix, tokenized, n_ctx = build_prompt_parts(
        config, names, clip_params, jax.random.key(1)
    )
    eot = tokenized.argmax(axis=-1)
    trimmed = trim_prompt_parts(suffix, tokenized, n_ctx)
    assert trimmed.shape[1] < suffix.shape[1]
    lp = 1 + n_ctx + trimmed.shape[1]
    assert lp % 8 == 0 and lp > int(np.asarray(eot).max())

    full = clip_model.text_features_from_embeddings(
        clip_params, arch,
        assemble_prompts(ctx, prefix, suffix, len(names)), eot,
    )
    cut = clip_model.text_features_from_embeddings(
        clip_params, arch,
        assemble_prompts(ctx, prefix, trimmed, len(names)), eot,
    )
    np.testing.assert_allclose(
        np.asarray(cut), np.asarray(full), rtol=2e-5, atol=2e-6
    )
    # the disable knob restores the untrimmed layout
    monkeypatch.setenv("CLIP_GP_TPU_TRIM_PROMPTS", "0")
    assert trim_prompt_parts(suffix, tokenized, n_ctx).shape == suffix.shape
