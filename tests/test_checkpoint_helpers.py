"""Unit coverage for the standalone checkpoint helpers
(runtime/checkpoint.py — the reference's utils/checkpoint.py surface)."""

import numpy as np

from clip_gp_tpu.runtime.checkpoint import (
    load_checkpoint,
    load_pretrained_weights,
    resume_from_checkpoint,
    save_checkpoint,
)


def test_roundtrip_suffixless_path(tmp_path):
    state = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "nested": {"b": np.ones(4, dtype=np.float32)},
    }
    # np.savez appends .npz to suffix-less names; load must still find it
    save_checkpoint(state, str(tmp_path / "model.ckpt-5"), epoch=5)
    loaded, epoch = load_checkpoint(str(tmp_path / "model.ckpt-5"))
    assert epoch == 5
    np.testing.assert_array_equal(loaded["a"], state["a"])
    np.testing.assert_array_equal(loaded["nested"]["b"], state["nested"]["b"])


def test_resume_picks_latest_and_tolerates_digitless(tmp_path):
    save_checkpoint({"a": np.zeros(1)}, str(tmp_path / "model.ckpt-2"), epoch=2)
    save_checkpoint({"a": np.ones(1)}, str(tmp_path / "model.ckpt-10"), epoch=10)
    # a hand-named digit-less file must not crash the numeric sort
    save_checkpoint({"a": 2 * np.ones(1)}, str(tmp_path / "model.ckpt-best"))
    state, epoch = resume_from_checkpoint(str(tmp_path))
    assert epoch == 10
    assert float(state["a"][0]) == 1.0


def test_resume_empty_dir(tmp_path):
    assert resume_from_checkpoint(str(tmp_path)) == (None, 0)
    assert resume_from_checkpoint(str(tmp_path / "missing")) == (None, 0)


def test_pretrained_overlay_skips_mismatched(tmp_path, capsys):
    save_checkpoint(
        {"w": np.full((2, 2), 7.0), "extra": np.ones(3)},
        str(tmp_path / "pre.npz"),
    )
    params = {"w": np.zeros((2, 2)), "other": np.zeros(5)}
    out = load_pretrained_weights(params, str(tmp_path / "pre.npz"))
    np.testing.assert_array_equal(out["w"], np.full((2, 2), 7.0))
    np.testing.assert_array_equal(out["other"], np.zeros(5))
    assert "Skipped 1" in capsys.readouterr().out
