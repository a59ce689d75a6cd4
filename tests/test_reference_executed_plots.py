"""Executed-reference PLOT-DATA goldens for --ref-style.

The default plot style deliberately diverges from the reference (symlog
shots axis, shot-ordered acc-vs-ECE lines, group-after-average). With
``--ref-style`` the aggregator must reproduce the reference's plotted DATA
SERIES exactly — these goldens run the ACTUAL reference
``scripts/aggregate_results.py`` plot functions and compare the line/scatter
data captured from the matplotlib figures (not pixels):

- acc-vs-ECE lines sorted by ECE + the average-position star per config
  (ref: scripts/aggregate_results.py:482-540);
- linear shots axis with one tick per shot count (ref: :444-452);
- ``--grouped`` averaging group-within-dataset-first, ungrouped fams
  dropped (ref: :228-261, :346-386).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from test_reference_executed_aggregate import (  # noqa: F401 (fixture)
    REFERENCE,
    _make_layout,
    _write_run,
    ref_agg,
)

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


class FigRecorder:
    """Snapshot every figure's line/scatter data at plt.close() time (both
    the reference's and our plot code close each figure right after
    savefig, so patching pyplot.close captures the final state)."""

    def __init__(self):
        self.figs = []

    def install(self, monkeypatch):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        orig_close = plt.close

        def close(fig=None):
            if fig is not None and hasattr(fig, "axes"):
                self.figs.append(self._snapshot(fig))
            return orig_close(fig)

        monkeypatch.setattr(plt, "close", close)

    @staticmethod
    def _snapshot(fig):
        axes = []
        for ax in fig.axes:
            lines = {
                ln.get_label(): (
                    [float(v) for v in ln.get_xdata()],
                    [float(v) for v in ln.get_ydata()],
                )
                for ln in ax.get_lines()
                if not str(ln.get_label()).startswith("_")
            }
            scatters = sorted(
                tuple(map(float, pt))
                for c in ax.collections
                for pt in np.asarray(c.get_offsets()).reshape(-1, 2)
            )
            axes.append({
                "title": ax.get_title(),
                "xscale": ax.get_xscale(),
                "xticks": sorted(float(t) for t in ax.get_xticks()),
                "lines": lines,
                "scatters": scatters,
            })
        return axes

    def acc_vs_ece(self):
        """title → axis snapshot, for single-axis Accuracy-vs-ECE figures."""
        out = {}
        for axes in self.figs:
            drawn = [a for a in axes if a["lines"] or a["scatters"]]
            if len(drawn) == 1 and not axes[0]["title"].endswith(
                ("Accuracy", "ECE", "AECE")
            ):
                out[axes[0]["title"]] = drawn[0]
        return out

    def perf_panels(self):
        """title-of-first-panel → [acc, ece, aece] axis snapshots."""
        out = {}
        for axes in self.figs:
            drawn = [a for a in axes if a["lines"]]
            if len(drawn) == 3:
                out[drawn[0]["title"]] = drawn
        return out


def _run_reference_plots(ref_agg, layout_root, monkeypatch, recorder,
                         use_grouping=False, show_zero_shot=False):
    monkeypatch.chdir(layout_root.parent)  # ref writes Path("output")/<exp>
    runs = ref_agg.load_runs(layout_root / "exp1")
    grouped = ref_agg.group_by_dataset_shots_config(runs)
    before = len(recorder.figs)
    ref_agg.make_plots(grouped, "exp1", use_grouping=use_grouping,
                       show_zero_shot=show_zero_shot)
    return recorder.figs[before:]


def _run_our_plots(layout_root, recorder, use_grouping=False,
                   show_zero_shot=False):
    from clip_gp_tpu.reporting import aggregate as ours

    runs = ours.load_runs(layout_root / "exp1")
    grouped = ours.group_runs(runs)
    before = len(recorder.figs)
    ours.make_plots(grouped, "exp1", layout_root, use_grouping=use_grouping,
                    show_zero_shot=show_zero_shot, ref_style=True)
    return recorder.figs[before:]


def _index_acc_vs_ece(figs):
    """dataset-key → axis snapshot for the 1-panel acc-vs-ECE figures.
    Reference titles: "<ds>: Accuracy vs ECE"; ours: "<ds>". The Average
    pseudo-dataset is "Average (N datasets)" there and "Average" here."""
    out = {}
    for axes in figs:
        drawn = [a for a in axes if a["lines"]]
        if len(drawn) != 1 or len(axes) != 1:
            continue
        title = drawn[0]["title"].replace(": Accuracy vs ECE", "")
        if title.startswith("Average"):
            title = "Average"
        out[title] = drawn[0]
    return out


def _perf_figs_in_order(figs):
    """[acc, ece, aece] panel triples for the 3-panel figures, in emission
    order. The reference titles panels Accuracy/ECE/AECE without the
    dataset, so alignment is by order: both sides emit per-dataset figures
    in load order (sorted dataset dirs) then the Average figure last."""
    out = []
    for axes in figs:
        panels = [a for a in axes if a["lines"]]
        if len(panels) == 3:
            out.append(panels)
    return out


def _assert_lines_equal(ref_ax, our_ax, where):
    assert set(ref_ax["lines"]) == set(our_ax["lines"]), (
        where, sorted(ref_ax["lines"]), sorted(our_ax["lines"])
    )
    for label, (rx, ry) in ref_ax["lines"].items():
        ox, oy = our_ax["lines"][label]
        np.testing.assert_allclose(ox, rx, rtol=1e-12, atol=0,
                                   err_msg=f"{where}/{label} x")
        np.testing.assert_allclose(oy, ry, rtol=1e-12, atol=0,
                                   err_msg=f"{where}/{label} y")


def test_acc_vs_ece_series_match_reference(ref_agg, tmp_path, monkeypatch):
    """Per-dataset + Average acc-vs-ECE: identical ECE-sorted line series and
    identical star positions (average-position stars + zero-shot stars)."""
    root = tmp_path / "output"
    _make_layout(root)
    rec = FigRecorder()
    rec.install(monkeypatch)
    ref_figs = _run_reference_plots(ref_agg, root, monkeypatch, rec,
                                    show_zero_shot=True)
    our_figs = _run_our_plots(root, rec, show_zero_shot=True)
    ref_ave = _index_acc_vs_ece(ref_figs)
    our_ave = _index_acc_vs_ece(our_figs)
    assert set(ref_ave) == set(our_ave) == {"caltech101", "eurosat", "Average"}
    for ds in ref_ave:
        _assert_lines_equal(ref_ave[ds], our_ave[ds], f"acc_vs_ece/{ds}")
        np.testing.assert_allclose(
            our_ave[ds]["scatters"], ref_ave[ds]["scatters"], rtol=1e-12,
            err_msg=f"acc_vs_ece/{ds} stars",
        )
        # the lines really are ECE-sorted (the divergence --ref-style fixes)
        for label, (xs, _) in our_ave[ds]["lines"].items():
            assert xs == sorted(xs), (ds, label)


def test_perf_per_shots_series_and_linear_axis(ref_agg, tmp_path, monkeypatch):
    """3-panel metric-vs-shots series match; our ref-style axis is linear
    with the reference's explicit shot ticks (not symlog)."""
    root = tmp_path / "output"
    _make_layout(root)
    rec = FigRecorder()
    rec.install(monkeypatch)
    ref_figs = _run_reference_plots(ref_agg, root, monkeypatch, rec,
                                    show_zero_shot=True)
    our_figs = _run_our_plots(root, rec, show_zero_shot=True)
    ref_perf = _perf_figs_in_order(ref_figs)
    our_perf = _perf_figs_in_order(our_figs)
    assert len(ref_perf) == len(our_perf) == 3  # 2 datasets + average
    for k, (ref_panels, our_panels) in enumerate(zip(ref_perf, our_perf)):
        for i, (ref_ax, our_ax) in enumerate(zip(ref_panels, our_panels)):
            _assert_lines_equal(ref_ax, our_ax, f"perf[fig{k}][panel{i}]")
            np.testing.assert_allclose(
                our_ax["scatters"], ref_ax["scatters"], rtol=1e-12,
                err_msg=f"perf[fig{k}][panel{i}] zero-shot stars",
            )
            assert our_ax["xscale"] == "linear"
            assert our_ax["xticks"] == ref_ax["xticks"], (k, i)


def test_grouped_average_matches_reference_order(ref_agg, tmp_path,
                                                 monkeypatch):
    """--grouped: group-within-dataset-first averaging. The layout has one
    family present on only one dataset, so group-after-average (our default
    mode) and the reference's order produce DIFFERENT numbers — the golden
    only passes with the reference's order."""
    root = tmp_path / "output"
    # families matching GROUP_SUBSTRINGS: two _8templates configs on ds1,
    # one on ds2 — per-dataset group means weight them differently than a
    # flat average over all three
    for ds, fams in (
        ("caltech101", ("GP_8templates_a", "GP_8templates_b")),
        ("eurosat", ("GP_8templates_a",)),
    ):
        for fam_i, fam in enumerate(fams):
            for shots in (1, 4):
                for seed in (1, 2):
                    _write_run(
                        root, "exp1", ds, f"{fam}_{shots}shots", seed, shots,
                        acc=50.0 + 5 * shots + seed + 11 * fam_i
                        + (7 if ds == "eurosat" else 0),
                        ece=3.0 + 0.7 * seed + 2 * fam_i,
                        zs_acc=44.0 + seed,
                    )
    rec = FigRecorder()
    rec.install(monkeypatch)
    ref_figs = _run_reference_plots(ref_agg, root, monkeypatch, rec,
                                    use_grouping=True, show_zero_shot=True)
    our_figs = _run_our_plots(root, rec, use_grouping=True,
                              show_zero_shot=True)
    ref_ave = _index_acc_vs_ece(ref_figs)
    our_ave = _index_acc_vs_ece(our_figs)
    assert set(ref_ave) == set(our_ave) == {"caltech101", "eurosat", "Average"}
    # per-dataset labels carry the per-dataset matched count
    assert set(ref_ave["caltech101"]["lines"]) == {"8 Templates (2)"}
    assert set(ref_ave["eurosat"]["lines"]) == {"8 Templates (1)"}
    # the Average label carries the global config count
    assert set(ref_ave["Average"]["lines"]) == {"8 Templates (2 configs)"}
    for ds in ref_ave:
        _assert_lines_equal(ref_ave[ds], our_ave[ds], f"grouped/{ds}")
        np.testing.assert_allclose(
            our_ave[ds]["scatters"], ref_ave[ds]["scatters"], rtol=1e-12,
            err_msg=f"grouped/{ds} stars",
        )


def test_grouped_average_order_actually_differs(tmp_path):
    """Sanity that the golden above has teeth: on the uneven layout the
    group-within-dataset-first Average differs numerically from our default
    group-after-average mode."""
    from clip_gp_tpu.reporting import aggregate as ours

    root = tmp_path / "output"
    for ds, fams in (
        ("caltech101", ("GP_8templates_a", "GP_8templates_b")),
        ("eurosat", ("GP_8templates_a",)),
    ):
        for fam_i, fam in enumerate(fams):
            for shots in (1, 4):
                for seed in (1, 2):
                    _write_run(
                        root, "exp1", ds, f"{fam}_{shots}shots", seed, shots,
                        acc=50.0 + 5 * shots + seed + 11 * fam_i
                        + (7 if ds == "eurosat" else 0),
                        ece=3.0 + 0.7 * seed + 2 * fam_i,
                        zs_acc=44.0 + seed,
                    )
    runs = ours.load_runs(root / "exp1")
    per_ds = ours.per_dataset_fam_means(ours.group_runs(runs))
    _, ref_avg = ours._ref_grouped_average(dict(per_ds))
    default_avg = ours.group_fams(ours.average_across_datasets(dict(per_ds)))
    ref_val = ref_avg["8 Templates (2 configs)"][4]["acc"]
    default_val = default_avg["8 Templates (2)"][4]["acc"]
    assert not math.isclose(ref_val, default_val)


def test_ref_style_cli_flag(tmp_path, capsys):
    """--ref-style is reachable from the CLI and writes the plot files."""
    from clip_gp_tpu.reporting import aggregate as ours

    root = tmp_path / "output"
    _make_layout(root)
    ours.main(["exp1", "--output-root", str(root), "--ref-style",
               "--show-zero-shot"])
    out = capsys.readouterr().out
    assert "Average across datasets" in out
    plots = root / "exp1" / "_plots"
    assert (plots / "acc_vs_ece" / "Average.png").exists()
    assert (plots / "perf_per_shots" / "caltech101.png").exists()
