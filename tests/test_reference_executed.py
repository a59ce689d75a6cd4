"""Executed-reference goldens.

These tests import and RUN the actual reference implementation (the
read-only checkout at /root/reference, when present) and compare its
outputs against this framework. Unlike the formula-restatement unit tests
(test_optim.py, test_metrics.py, ...), these cannot drift from what the
reference code really does when executed — they pin the behavioral
contracts end to end:

- lr scheduler sequences as stepped per-epoch by the trainer
  (ref: utils/optimization.py:218-369)
- sgd/adam/adamw parameter trajectories on identical gradient streams
  (ref: utils/optimization.py:57-144)
- accuracy/macro-F1/ECE/AECE numerics incl. per-bin arrays
  (ref: utils/metrics.py:9-229)
- the python-`random` few-shot sampling stream
  (ref: utils/dataset_base.py:101-128)
- YAML config merges over every reference trainer + dataset YAML
  (ref: utils/config.py:159-263)
- sweep trial expansion: signatures, outdirs, dataset-name mapping
  (ref: utils/hparam_search.py:39-198)

Deliberate divergences (documented in COMPONENTS.md) are excluded
explicitly where they would fire, with the reason inline.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import random
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
needs_reference = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")


def _load_ref(alias: str, relpath: str):
    """Import a module file from the read-only reference checkout."""
    spec = importlib.util.spec_from_file_location(alias, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_optim():
    return _load_ref("_ref_optimization", "utils/optimization.py")


@pytest.fixture(scope="module")
def ref_metrics():
    return _load_ref("_ref_metrics", "utils/metrics.py")


@pytest.fixture(scope="module")
def ref_dataset_base():
    return _load_ref("_ref_dataset_base", "utils/dataset_base.py")


@pytest.fixture(scope="module")
def ref_config():
    return _load_ref("_ref_config", "utils/config.py")


@pytest.fixture(scope="module")
def ref_hparam():
    return _load_ref("_ref_hparam_search", "utils/hparam_search.py")


# ---------------------------------------------------------------------------
# lr schedules
# ---------------------------------------------------------------------------

SCHED_CASES = [
    # (case id, config attrs beyond lr/max_epoch)
    ("cosine-default", {"lr_scheduler": "cosine"}),
    ("cosine-eta-min", {"lr_scheduler": "cosine", "eta_min": 1e-4}),
    ("step-default", {"lr_scheduler": "step"}),
    ("step-knobs", {"lr_scheduler": "step", "step_size": 3, "gamma": 0.5}),
    ("multistep-default", {"lr_scheduler": "multistep"}),
    (
        "multistep-knobs",
        {"lr_scheduler": "multistep", "milestones": [2, 5, 9], "gamma": 0.3},
    ),
    ("exponential-default", {"lr_scheduler": "exponential"}),
    ("exponential-knobs", {"lr_scheduler": "exponential", "gamma": 0.9}),
    ("constant", {"lr_scheduler": "constant"}),
    ("linear-default", {"lr_scheduler": "linear"}),
    (
        "linear-knobs",
        {
            "lr_scheduler": "linear",
            "start_factor": 0.5,
            "end_factor": 0.1,
            "total_iters": 6,
        },
    ),
    # warmup_epoch=1 is the one warmup width where the executed torch
    # wrapper and our analytic reading agree; >=2 is a documented divergence
    # (the executed wrapper chains the post-warmup scheduler off the warmup
    # lr — see runtime/optim.py:98-118)
    (
        "cosine-warmup1",
        {"lr_scheduler": "cosine", "warmup_epoch": 1, "warmup_cons_lr": 1e-5},
    ),
]


@needs_reference
@pytest.mark.parametrize("case_id,attrs", SCHED_CASES, ids=[c[0] for c in SCHED_CASES])
def test_lr_schedule_matches_executed_reference(ref_optim, case_id, attrs):
    """Per-epoch lr sequence == the executed torch scheduler's, stepped the
    way the trainer steps it (record lr at epoch start, step at epoch end)."""
    from clip_gp_tpu.runtime.optim import build_lr_schedule

    base_lr, max_epoch = 0.02, 12
    cfg = SimpleNamespace(lr=base_lr, max_epoch=max_epoch, **attrs)

    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([param], lr=base_lr)
    sched = ref_optim.build_lr_scheduler_with_warmup(opt, cfg)

    ref_seq = []
    for _ in range(max_epoch):
        ref_seq.append(opt.param_groups[0]["lr"])
        param.grad = torch.zeros_like(param)
        opt.step()
        sched.step()

    ours = build_lr_schedule(cfg, warmup=True)
    our_seq = [ours(e) for e in range(max_epoch)]

    assert our_seq == pytest.approx(ref_seq, rel=1e-6, abs=1e-12), (
        f"{case_id}: ours={our_seq} ref={ref_seq}"
    )


# ---------------------------------------------------------------------------
# optimizer trajectories
# ---------------------------------------------------------------------------

OPT_CASES = [
    ("sgd-plain", {"name": "sgd", "momentum": 0.0}),
    ("sgd-momentum", {"name": "sgd", "momentum": 0.9}),
    ("sgd-nesterov", {"name": "sgd", "momentum": 0.9, "nesterov": True}),
    ("sgd-wd", {"name": "sgd", "momentum": 0.9, "weight_decay": 0.1}),
    ("adam", {"name": "adam"}),
    ("adam-l2", {"name": "adam", "weight_decay": 0.1}),
    ("adamw", {"name": "adamw", "weight_decay": 0.1}),
]


@needs_reference
@pytest.mark.parametrize("case_id,attrs", OPT_CASES, ids=[c[0] for c in OPT_CASES])
def test_optimizer_trajectory_matches_executed_reference(ref_optim, case_id, attrs):
    """Parameter trajectory over a fixed gradient stream == the executed
    torch optimizer's (5 steps, identical grads fed to both)."""
    import jax.numpy as jnp
    import optax

    from clip_gp_tpu.runtime.optim import EpochOptimizer

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    cfg = SimpleNamespace(
        lr=0.05, max_epoch=10, lr_scheduler="constant", **attrs
    )

    # executed reference
    p = torch.nn.Parameter(torch.tensor(w0))
    topt = ref_optim.build_optimizer([p], cfg)
    for g in grads:
        p.grad = torch.tensor(g)
        topt.step()
    ref_w = p.detach().numpy()

    # ours
    opt = EpochOptimizer(cfg)
    params = jnp.asarray(w0)
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), ref_w, rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


@needs_reference
def test_metrics_match_executed_reference(ref_metrics):
    """acc/macro-F1/ECE/AECE (+ per-bin arrays) == the executed reference on
    random logits, including classes absent from the labels (the macro-F1
    class-universe subtlety) and an empty batch."""
    from clip_gp_tpu.ops import metrics as ours

    rng = np.random.default_rng(42)
    logits = rng.standard_normal((257, 9)).astype(np.float32) * 3
    labels = rng.integers(0, 7, size=257)  # classes 7, 8 never appear

    tl, ty = torch.tensor(logits), torch.tensor(labels)

    assert ours.compute_accuracy(logits, labels, (1, 3)) == pytest.approx(
        ref_metrics.compute_accuracy(tl, ty, (1, 3)), abs=1e-5
    )
    assert ours.compute_macro_f1(logits, labels) == pytest.approx(
        ref_metrics.compute_macro_f1(tl, ty), abs=1e-5
    )
    assert ours.compute_ece(logits, labels) == pytest.approx(
        ref_metrics.compute_ece(tl, ty), abs=1e-4
    )
    assert ours.compute_aece(logits, labels) == pytest.approx(
        ref_metrics.compute_aece(tl, ty), abs=1e-4
    )

    our_ece, our_bins = ours.compute_ece_with_bins(logits, labels)
    ref_ece, ref_bins = ref_metrics.compute_ece_with_bins(tl, ty)
    assert our_ece == pytest.approx(ref_ece, abs=1e-4)
    assert our_bins["bin_count"] == ref_bins["bin_count"]
    assert our_bins["bin_acc"] == pytest.approx(ref_bins["bin_acc"], abs=1e-5)
    assert our_bins["bin_conf"] == pytest.approx(ref_bins["bin_conf"], abs=1e-5)

    our_aece, our_abins = ours.compute_aece_with_bins(logits, labels)
    ref_aece, ref_abins = ref_metrics.compute_aece_with_bins(tl, ty)
    assert our_aece == pytest.approx(ref_aece, abs=1e-4)
    assert our_abins["bin_count"] == ref_abins["bin_count"]
    assert our_abins["bin_acc"] == pytest.approx(ref_abins["bin_acc"], abs=1e-5)
    assert our_abins["bin_conf"] == pytest.approx(ref_abins["bin_conf"], abs=1e-5)

    # empty batch: the reference guards and returns zeros
    empty_l, empty_y = np.zeros((0, 9), np.float32), np.zeros((0,), np.int64)
    assert ours.compute_accuracy(empty_l, empty_y, (1, 3)) == (
        ref_metrics.compute_accuracy(torch.tensor(empty_l), torch.tensor(empty_y), (1, 3))
    )


# ---------------------------------------------------------------------------
# few-shot sampling stream
# ---------------------------------------------------------------------------


@needs_reference
@pytest.mark.parametrize("num_shots,repeat", [(2, False), (4, False), (4, True)])
def test_fewshot_sampling_matches_executed_reference(
    ref_dataset_base, num_shots, repeat
):
    """Seeded python-`random` sampling picks the SAME items in the SAME
    order as the executed reference (incl. the short-class no-repeat and
    repeat paths, and insertion-order class grouping)."""
    from clip_gp_tpu.data.datum import DatasetBase, Datum

    # interleaved labels, uneven class sizes: class 0 has 6, 1 has 3, 2 has 2
    spec = [0, 1, 2, 0, 1, 0, 2, 0, 1, 0, 0]
    ref_items = [
        ref_dataset_base.Datum(impath=f"img{i}.jpg", label=lab, classname=f"c{lab}")
        for i, lab in enumerate(spec)
    ]
    our_items = [
        Datum(impath=f"img{i}.jpg", label=lab, classname=f"c{lab}")
        for i, lab in enumerate(spec)
    ]

    random.seed(7)
    ref_out = ref_dataset_base.DatasetBase().generate_fewshot_dataset(
        ref_items, num_shots=num_shots, repeat=repeat
    )
    random.seed(7)
    our_out = DatasetBase().generate_fewshot_dataset(
        our_items, num_shots=num_shots, repeat=repeat
    )

    assert [d.impath for d in our_out] == [d.impath for d in ref_out]
    assert [d.label for d in our_out] == [d.label for d in ref_out]


# ---------------------------------------------------------------------------
# config YAML merges
# ---------------------------------------------------------------------------

# Fields where this framework deliberately diverges (COMPONENTS.md):
# - trainer_name: we honor TRAINER.NAME in YAML; the reference drops it
# - scheduler knobs never reach the reference's OptimConfig at all (its merge
#   hasattr-guards them away), so they are absent there and skipped naturally
_CONFIG_SKIP = {"trainer_name"}


def _walk_compare(ours, ref, path=""):
    """Compare every dataclass field present on BOTH config trees."""
    mismatches = []
    for f in dataclasses.fields(ours):
        if f.name in _CONFIG_SKIP or not hasattr(ref, f.name):
            continue
        ov, rv = getattr(ours, f.name), getattr(ref, f.name)
        if dataclasses.is_dataclass(ov) and dataclasses.is_dataclass(rv):
            mismatches += _walk_compare(ov, rv, f"{path}{f.name}.")
            continue
        if isinstance(ov, (tuple, list)) and isinstance(rv, (tuple, list)):
            ov, rv = list(ov), list(rv)
        if (
            f.name in ("config_file", "dataset_config_file")
            and ov is None
            and rv == ""
        ):
            # deliberate: ours stores None when the flag was absent so the
            # metrics.json config block can reproduce the reference's
            # key-present-only-when-passed behavior (COMPONENTS.md)
            continue
        if ov != rv:
            mismatches.append(f"{path}{f.name}: ours={ov!r} ref={rv!r}")
    return mismatches


@needs_reference
@pytest.mark.parametrize(
    "relpath",
    sorted(
        str(p.relative_to(REFERENCE))
        for pat in ("configs/trainers/*.yaml", "configs/datasets/*.yaml")
        for p in REFERENCE.glob(pat)
    )
    if REFERENCE.exists()
    else [],
)
def test_yaml_merge_matches_executed_reference(ref_config, relpath):
    """Merging each actual reference YAML produces the same field values as
    the executed reference config system (BASE_CONFIG inheritance included),
    for every field both config trees define."""
    from clip_gp_tpu.core import config as ours_config

    ref_cfg = ref_config.get_cfg_default()
    ref_config.merge_config_from_file(ref_cfg, str(REFERENCE / relpath))

    our_cfg = ours_config.get_cfg_default()
    ours_config.merge_config_from_file(our_cfg, str(REFERENCE / relpath))

    mismatches = _walk_compare(our_cfg, ref_cfg)
    assert not mismatches, f"{relpath}:\n" + "\n".join(mismatches)


# ---------------------------------------------------------------------------
# CLI flag surface
# ---------------------------------------------------------------------------

CLI_CASES = [
    ("minimal", []),
    (
        "dataset-model-env",
        [
            "--root", "/tmp/x", "--dataset", "Caltech101", "--shots", "4",
            "--backbone", "RN50", "--seed", "3", "--output-dir", "/tmp/o",
        ],
    ),
    (
        "optim-adapter",
        [
            "--lr", "0.02", "--epochs", "7", "--batch-size", "16",
            "--optimizer", "adamw", "--num-templates", "8",
            "--l2-lambda", "0.25", "--template-init-method", "top3",
            "--train-template-weights", "--shared-template-weights",
        ],
    ),
    (
        "gp",
        [
            "--use-gp", "--gp-kernel-type", "rbf", "--gp-lr", "0.1",
            "--gp-beta", "0.05", "--gp-num-mc-samples-train", "4",
            "--gp-num-mc-samples-eval", "8", "--gp-pca-dim", "16",
            "--learn-token-lambda", "0.3",
        ],
    ),
    (
        "coop-clip-adapter",
        [
            "--n-ctx", "4", "--ctx-init", "a photo of a", "--csc",
            "--clip-adapter-reduction", "8", "--clip-adapter-ratio", "0.3",
        ],
    ),
    (
        "eval-flags",
        [
            "--eval-only", "--model-dir", "/tmp/m", "--load-epoch", "5",
            "--no-train", "--resume", "/tmp/ck",
        ],
    ),
    (
        "yaml-cli-opts-order",
        [
            "--config-file", str(REFERENCE / "configs" / "trainers" / "gp.yaml"),
            "--lr", "0.5",
            "TRAINER.ADAPTER.USE_GP", "False", "OPTIM.WEIGHT_DECAY", "0.01",
        ],
    ),
    (
        "lists",
        ["--transforms", "random_flip", "normalize",
         "--source-domains", "a", "b"],
    ),
]


@needs_reference
@pytest.mark.parametrize("case_id,argv", CLI_CASES, ids=[c[0] for c in CLI_CASES])
def test_cli_parse_matches_executed_reference(
    ref_config, monkeypatch, case_id, argv
):
    """Running the same command line through both argparse surfaces yields
    the same config values for every shared field — flags, YAML+CLI+OPTS
    merge ORDER included (ref: utils/config.py:266-468)."""
    from clip_gp_tpu.core import config as ours_config

    import warnings

    monkeypatch.setattr(sys, "argv", ["train.py"] + list(argv))
    ref_cfg = ref_config.parse_args_to_config()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        our_cfg = ours_config.parse_args_to_config(list(argv))

    mismatches = _walk_compare(our_cfg, ref_cfg)
    assert not mismatches, f"{case_id}:\n" + "\n".join(mismatches)


# ---------------------------------------------------------------------------
# sweep trial expansion
# ---------------------------------------------------------------------------


@needs_reference
def test_trial_expansion_matches_executed_reference(ref_hparam, tmp_path):
    """Trial cartesian product, human-readable signatures, templated outdirs
    and the lowercase→CLI dataset-name map all match the executed reference
    runner."""
    from clip_gp_tpu.parallel.sweep import build_trials

    cfg = {
        "name": "goldexp",
        "datasets": ["caltech101", "dtd"],
        "seeds": [1, 2],
        "shots": [1, 4],
        "output_root": str(tmp_path / "output"),
        "template": "{experiment}/{dataset}/GP_{shots}shots{sig}/seed{seed}",
        # one list key and one scalar key (the reference wraps scalars)
        "grid": {"TRAINER.ADAPTER.GP_BETA": [0.01, 0.1], "OPTIM.LR": 0.02},
        "__config_file__": "configs/trainers/gp.yaml",
    }

    ref_trials, ref_meta = ref_hparam.build_trials(dict(cfg), None)
    our_trials, our_meta = build_trials(dict(cfg))

    assert our_meta["n_trials"] == ref_meta["n_trials"] == len(ref_trials)

    def key(t):
        return (t.dataset, t.seed, t.shots, t.signature())

    ref_by_key = {key(t): t for t in ref_trials}
    assert len(ref_by_key) == len(ref_trials)
    for t in our_trials:
        r = ref_by_key[key(t)]
        assert Path(t.format_outdir()).resolve() == r.format_outdir().resolve()

    # dataset-name mapping parity across every catalog name
    for yaml_name in (
        "caltech101 oxford_pets oxford_flowers fgvc_aircraft dtd eurosat "
        "stanford_cars food101 sun397 ucf101 imagenet imagenet_sketch "
        "imagenetv2 imagenet_a imagenet_r"
    ).split():
        t = build_trials({**cfg, "datasets": [yaml_name], "grid": {}})[0][0]
        argv = t.to_argv()
        assert argv[argv.index("--dataset") + 1] == ref_hparam.Trial.dataset_map(
            yaml_name
        )
