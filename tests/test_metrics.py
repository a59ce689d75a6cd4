"""Metrics golden tests: parity against torch/sklearn implementations of the
reference formulas (ref: utils/metrics.py)."""

import numpy as np
import pytest

from clip_gp_tpu.ops.metrics import (
    AverageMeter,
    MetricMeter,
    compute_accuracy,
    compute_aece,
    compute_aece_with_bins,
    compute_ece,
    compute_ece_with_bins,
    compute_macro_f1,
)


def _random_case(n=500, k=17, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, k)).astype(np.float32) * 3
    labels = rng.integers(0, k, size=n)
    return logits, labels


def _torch_ece(logits, labels, n_bins=10):
    """Reference ECE formula re-stated in torch for golden comparison."""
    import torch
    import torch.nn.functional as F

    logits = torch.tensor(logits)
    labels = torch.tensor(labels)
    probs = F.softmax(logits, dim=-1)
    conf, preds = probs.max(dim=-1)
    acc = preds.eq(labels).float()
    edges = torch.linspace(0, 1, n_bins + 1)
    ece = torch.zeros(1)
    for i in range(n_bins):
        in_bin = (conf > edges[i]) * (conf <= edges[i + 1])
        prop = in_bin.float().mean()
        if prop.item() > 0:
            ece += torch.abs(conf[in_bin].mean() - acc[in_bin].mean()) * prop
    return float(ece.item() * 100)


def _torch_aece(logits, labels, n_bins=10):
    import torch
    import torch.nn.functional as F

    logits = torch.tensor(logits)
    labels = torch.tensor(labels)
    probs = F.softmax(logits, dim=-1)
    conf, preds = probs.max(dim=-1)
    acc = preds.eq(labels).float()
    n = conf.numel()
    sorted_conf, idx = torch.sort(conf)
    sorted_acc = acc[idx]
    edges = torch.linspace(0, n, n_bins + 1).round().long()
    edges[0], edges[-1] = 0, n
    aece = 0.0
    for i in range(n_bins):
        l, r = int(edges[i]), int(edges[i + 1])
        if r <= l:
            continue
        aece += abs(
            float(sorted_conf[l:r].mean()) - float(sorted_acc[l:r].mean())
        ) * (r - l) / n
    return aece * 100


def test_accuracy_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.4, 0.3, 0.5]])
    labels = np.array([1, 0, 0])
    top1, top2 = compute_accuracy(logits, labels, topk=(1, 2))
    assert top1 == pytest.approx(100 * 2 / 3)
    assert top2 == pytest.approx(100.0)
    assert compute_accuracy(np.zeros((0, 3)), np.zeros(0)) == [0.0]


def test_macro_f1_matches_sklearn():
    from sklearn.metrics import f1_score

    logits, labels = _random_case()
    expected = f1_score(labels, logits.argmax(1), average="macro") * 100
    assert compute_macro_f1(logits, labels) == pytest.approx(expected, abs=1e-6)


def test_macro_f1_predicted_absent_class_counts_as_zero():
    """sklearn averages over the union of true and predicted classes — a
    class predicted but absent from the labels must pull macro-F1 down
    (ref: utils/trainer.py:508-514 delegates to sklearn)."""
    from sklearn.metrics import f1_score

    # labels only use classes {0, 1}; the model also predicts class 2
    labels = np.array([0, 0, 1, 1])
    logits = np.array(
        [[9, 0, 0], [0, 0, 9], [0, 9, 0], [0, 9, 0]], dtype=np.float32
    )
    pred = logits.argmax(1)
    assert 2 in pred and 2 not in labels
    expected = f1_score(labels, pred, average="macro") * 100
    assert compute_macro_f1(logits, labels) == pytest.approx(expected, abs=1e-6)


def test_ece_matches_torch_reference_formula():
    for seed in range(3):
        logits, labels = _random_case(seed=seed)
        assert compute_ece(logits, labels) == pytest.approx(
            _torch_ece(logits, labels), abs=1e-4
        )


def test_aece_matches_torch_reference_formula():
    for seed in range(3):
        logits, labels = _random_case(seed=seed)
        assert compute_aece(logits, labels) == pytest.approx(
            _torch_aece(logits, labels), abs=1e-4
        )


def test_bins_structure():
    logits, labels = _random_case(n=100)
    ece, bins = compute_ece_with_bins(logits, labels)
    assert len(bins["bin_acc"]) == 10
    assert sum(bins["bin_count"]) == 100
    aece, abins = compute_aece_with_bins(logits, labels)
    assert sum(abins["bin_count"]) == 100
    # equal-frequency bins should be balanced
    nonzero = [c for c in abins["bin_count"] if c > 0]
    assert max(nonzero) - min(nonzero) <= 1


def test_meters():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    mm = MetricMeter()
    mm.update(loss=1.0, acc=50.0)
    mm.update(loss=3.0)
    assert mm.loss.avg == 2.0
    assert "loss" in str(mm)
