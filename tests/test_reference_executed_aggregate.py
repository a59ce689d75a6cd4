"""Executed-reference aggregator goldens.

Build one fake runs layout, feed copies to the ACTUAL reference
``scripts/aggregate_results.py`` and to this framework's aggregator, and
require identical console summaries (per-dataset and cross-dataset
tables, including the synthesized zero-shot rows) and byte-identical
``_tables/*.csv`` files (ref: scripts/aggregate_results.py:45-229,
537-625).

Plot outputs are NOT compared — the styling divergences are deliberate
and documented in COMPONENTS.md.
"""

from __future__ import annotations

import importlib.util
import json
import shutil
import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_agg():
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location(
        "_ref_aggregate_results", REFERENCE / "scripts" / "aggregate_results.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_aggregate_results"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_run(root, exp, ds, cfg, seed, shots, acc, ece, zs_acc):
    d = root / exp / ds / cfg / f"seed{seed}"
    d.mkdir(parents=True, exist_ok=True)
    payload = {
        "dataset": ds,
        "shots": shots,
        "seed": seed,
        "method": "gp",
        "backbone": "RN50",
        "zero_shot": {"top1_acc": zs_acc, "ece": 10.0 + seed, "aece": 9.0},
        "metrics": {"top1_acc": acc, "ece": ece, "aece": ece + 1.5},
        "config": {"dataset": {"name": ds}},
    }
    (d / "metrics.json").write_text(json.dumps(payload))


def _make_layout(root):
    # two datasets x two config families x shots {1,4} x seeds {1,2},
    # plus one family missing on the second dataset (uneven presence)
    for ds_i, ds in enumerate(("caltech101", "eurosat")):
        for fam_i, fam in enumerate(("GP", "Baseline")):
            if ds == "eurosat" and fam == "Baseline":
                continue
            for shots in (1, 4):
                for seed in (1, 2):
                    _write_run(
                        root,
                        "exp1",
                        ds,
                        f"{fam}_{shots}shots",
                        seed,
                        shots,
                        acc=55.0 + 3 * shots + seed + 7 * fam_i + ds_i,
                        ece=4.0 + 0.5 * seed + fam_i,
                        zs_acc=48.0 + seed + ds_i,
                    )


def test_aggregation_matches_executed_reference(
    ref_agg, tmp_path, capsys, monkeypatch
):
    ref_root = tmp_path / "ref" / "output"
    our_root = tmp_path / "ours" / "output"
    _make_layout(ref_root)
    shutil.copytree(ref_root, our_root)

    from clip_gp_tpu.reporting import aggregate as ours

    # --- reference pass ---
    ref_runs = ref_agg.load_runs(ref_root / "exp1")
    ref_grouped = ref_agg.group_by_dataset_shots_config(ref_runs)
    ref_agg.print_summary(ref_grouped)
    ref_agg.print_average_summary(ref_grouped)
    ref_stdout = capsys.readouterr().out
    # the reference writes to cwd-relative output/<exp>/_tables
    monkeypatch.chdir(tmp_path / "ref")
    ref_agg.write_experiment_tables(ref_grouped, "exp1")

    # --- our pass ---
    our_runs = ours.load_runs(our_root / "exp1")
    our_grouped = ours.group_runs(our_runs)
    ours.print_summary(our_grouped)
    ours.print_average_summary(our_grouped)
    our_stdout = capsys.readouterr().out
    ours.write_experiment_tables(our_grouped, "exp1", output_root=our_root)

    assert our_stdout == ref_stdout

    ref_tables = sorted((ref_root / "exp1" / "_tables").iterdir())
    our_tables = sorted((our_root / "exp1" / "_tables").iterdir())
    assert [p.name for p in our_tables] == [p.name for p in ref_tables]
    for our_p, ref_p in zip(our_tables, ref_tables):
        assert our_p.read_text() == ref_p.read_text(), our_p.name
