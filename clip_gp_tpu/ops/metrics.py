"""Evaluation metrics: top-k accuracy, macro-F1, ECE, AECE (+ per-bin arrays).

Formula parity with the reference metrics module (ref: utils/metrics.py):
- accuracy/ECE/AECE are percentages in [0, 100];
- ECE uses 10 equal-width confidence bins with ``(conf > lo) & (conf <= hi)``
  membership (ref: utils/metrics.py:59-83);
- AECE uses equal-frequency bins over confidence-sorted samples with rounded
  integer edges (ref: utils/metrics.py:86-135);
- empty equal-width bins report center confidence and zero count in the
  per-bin arrays (ref: utils/metrics.py:170-175).

Implemented on numpy: these run once per evaluation on host-resident logits;
the hot path (logit computation) stays on device.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _to_numpy(x) -> np.ndarray:
    return np.asarray(x)


def softmax(logits: np.ndarray, axis: int = -1) -> np.ndarray:
    z = logits - logits.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def compute_accuracy(logits, labels, topk: Sequence[int] = (1,)) -> List[float]:
    logits = _to_numpy(logits)
    labels = _to_numpy(labels).astype(np.int64)
    n = labels.shape[0]
    if n == 0:
        return [0.0] * len(topk)
    maxk = max(topk)
    # top-maxk predictions per row, ordered best-first
    pred = np.argsort(-logits, axis=1)[:, :maxk]
    correct = pred == labels[:, None]
    return [float(correct[:, :k].any(axis=1).sum()) * 100.0 / n for k in topk]


def compute_macro_f1(logits, labels) -> float:
    logits = _to_numpy(logits)
    labels = _to_numpy(labels).astype(np.int64)
    pred = logits.argmax(axis=1)
    # sklearn f1_score(average="macro") averages over the UNION of classes
    # seen in y_true and y_pred (a predicted-but-absent class contributes
    # F1=0) — the reference delegates to sklearn (ref: utils/trainer.py:
    # 508-514), so averaging over np.unique(labels) alone would inflate
    # macro-F1 whenever the model predicts a class missing from the split
    classes = np.union1d(np.unique(labels), np.unique(pred))
    f1s = []
    for c in classes:
        tp = float(np.sum((pred == c) & (labels == c)))
        fp = float(np.sum((pred == c) & (labels != c)))
        fn = float(np.sum((pred != c) & (labels == c)))
        denom = 2 * tp + fp + fn
        f1s.append(0.0 if denom == 0 else 2 * tp / denom)
    return float(np.mean(f1s) * 100.0) if f1s else 0.0


def _conf_acc(logits: np.ndarray, labels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    probs = softmax(logits.astype(np.float64))
    conf = probs.max(axis=-1)
    preds = probs.argmax(axis=-1)
    acc = (preds == labels).astype(np.float64)
    return conf, acc


def compute_ece(logits, labels, n_bins: int = 10) -> float:
    return compute_ece_with_bins(logits, labels, n_bins)[0]


def compute_ece_with_bins(
    logits, labels, n_bins: int = 10
) -> Tuple[float, Dict[str, list]]:
    logits = _to_numpy(logits)
    labels = _to_numpy(labels).astype(np.int64)
    conf, acc = _conf_acc(logits, labels)
    n = conf.size
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    bin_acc: List[float] = []
    bin_conf: List[float] = []
    bin_cnt: List[int] = []
    for i in range(n_bins):
        in_bin = (conf > edges[i]) & (conf <= edges[i + 1])
        count = int(in_bin.sum())
        if count > 0:
            a = float(acc[in_bin].mean())
            c = float(conf[in_bin].mean())
            ece += abs(c - a) * count / max(n, 1)
            bin_acc.append(a)
            bin_conf.append(c)
            bin_cnt.append(count)
        else:
            bin_acc.append(0.0)
            bin_conf.append((i + 0.5) / n_bins)
            bin_cnt.append(0)
    return float(ece * 100.0), {
        "bin_acc": bin_acc,
        "bin_conf": bin_conf,
        "bin_count": bin_cnt,
    }


def compute_aece(logits, labels, n_bins: int = 10) -> float:
    return compute_aece_with_bins(logits, labels, n_bins)[0]


def compute_aece_with_bins(
    logits, labels, n_bins: int = 10
) -> Tuple[float, Dict[str, list]]:
    logits = _to_numpy(logits)
    labels = _to_numpy(labels).astype(np.int64)
    if logits.size == 0:
        return 0.0, {"bin_acc": [], "bin_conf": [], "bin_count": []}
    conf, acc = _conf_acc(logits, labels)
    n = conf.size
    n_bins = max(1, min(int(n_bins), n))
    order = np.argsort(conf, kind="stable")
    sorted_conf = conf[order]
    sorted_acc = acc[order]
    # np.round matches torch.Tensor.round (banker's rounding) used for edges.
    edges = np.round(np.linspace(0, n, n_bins + 1)).astype(np.int64)
    edges[0], edges[-1] = 0, n
    aece = 0.0
    bin_acc: List[float] = []
    bin_conf: List[float] = []
    bin_cnt: List[int] = []
    for i in range(n_bins):
        left, right = int(edges[i]), int(edges[i + 1])
        if right <= left:
            bin_acc.append(0.0)
            bin_conf.append((i + 0.5) / n_bins)
            bin_cnt.append(0)
            continue
        a = float(sorted_acc[left:right].mean())
        c = float(sorted_conf[left:right].mean())
        aece += abs(c - a) * (right - left) / n
        bin_acc.append(a)
        bin_conf.append(c)
        bin_cnt.append(right - left)
    return float(aece * 100.0), {
        "bin_acc": bin_acc,
        "bin_conf": bin_conf,
        "bin_count": bin_cnt,
    }


class AverageMeter:
    """Running average tracker (ref: utils/metrics.py:231-257)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count > 0 else 0.0


class MetricMeter:
    """Dict of named AverageMeters (ref: utils/metrics.py:260-295)."""

    def __init__(self, delimiter: str = " "):
        self.meters: Dict[str, AverageMeter] = {}
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters.setdefault(k, AverageMeter()).update(v)

    def __getattr__(self, name: str):
        meters = self.__dict__.get("meters", {})
        if name in meters:
            return meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(
            f"{k}: {m.avg:.4f}" for k, m in self.meters.items()
        )

    def synchronize_between_processes(self):
        """No-op placeholder kept for API parity (ref: utils/metrics.py:293);
        cross-process metric sync has no role in the mesh design."""

