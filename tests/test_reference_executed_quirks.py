"""Executed-reference quirk pins.

COMPONENTS.md documents reference quirks this framework deliberately
fixes. Each claim about "what the executed reference does" is pinned
here by actually executing the reference's config machinery — so the
divergence documentation can never silently drift from reality — and the
corresponding fixed behavior is asserted on our side in the same test
(ref: utils/config.py:203-524).
"""

from __future__ import annotations

import importlib.util
import sys
import warnings
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_config():
    spec = importlib.util.spec_from_file_location(
        "_ref_config_quirks", REFERENCE / "utils" / "config.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_config_quirks"] = mod
    spec.loader.exec_module(mod)
    return mod


def _ours():
    from clip_gp_tpu.core import config as c

    return c


def test_yaml_scheduler_knobs_dropped_by_reference(ref_config):
    """[quirk fixed] COMPONENTS L2: the reference's merge hasattr-guards
    every OPTIM key and its OptimConfig lacks the scheduler knobs, so a
    YAML-configured ETA_MIN/STEP_SIZE/GAMMA never reaches the executed
    scheduler builder (ref: utils/config.py:239-241); here they are typed,
    honored fields."""
    ref_cfg = ref_config.get_cfg_default()
    ref_config.merge_config_dict(
        ref_cfg, {"OPTIM": {"ETA_MIN": 0.001, "STEP_SIZE": 7, "GAMMA": 0.5}}
    )
    assert not hasattr(ref_cfg.optim, "eta_min")
    assert not hasattr(ref_cfg.optim, "step_size")

    c = _ours()
    our_cfg = c.get_cfg_default()
    c.merge_config_dict(
        our_cfg, {"OPTIM": {"ETA_MIN": 0.001, "STEP_SIZE": 7, "GAMMA": 0.5}}
    )
    assert our_cfg.optim.eta_min == 0.001
    assert our_cfg.optim.step_size == 7
    assert our_cfg.optim.gamma == 0.5


def test_opts_scientific_notation_stays_string_in_reference(ref_config):
    """[quirk fixed] COMPONENTS L2: the reference's OPTS value parser
    (ref: utils/config.py:480-486) leaves '1e-5' as the STRING '1e-5'
    (``isdigit`` fails on both probes), which breaks downstream float
    arithmetic; here it parses as a float."""
    ref_cfg = ref_config.get_cfg_default()
    ref_config._merge_from_list(ref_cfg, ["OPTIM.LR", "1e-5"])
    assert ref_cfg.optim.lr == "1e-5" and isinstance(ref_cfg.optim.lr, str)

    c = _ours()
    our_cfg = c.get_cfg_default()
    c.merge_from_opts(our_cfg, ["OPTIM.LR", "1e-5"])
    assert our_cfg.optim.lr == pytest.approx(1e-5)
    assert isinstance(our_cfg.optim.lr, float)


def test_opts_negative_int_coerced_to_float_in_reference(ref_config):
    """[quirk fixed] COMPONENTS L2: the reference coerces '-3' to the
    float -3.0 (the '-'-stripped probe matches the float branch first);
    here integer literals stay ints (seed := -3 must remain an int)."""
    ref_cfg = ref_config.get_cfg_default()
    ref_config._merge_from_list(ref_cfg, ["SEED", "-3"])
    assert ref_cfg.seed == -3.0 and isinstance(ref_cfg.seed, float)

    c = _ours()
    our_cfg = c.get_cfg_default()
    c.merge_from_opts(our_cfg, ["SEED", "-3"])
    assert our_cfg.seed == -3 and isinstance(our_cfg.seed, int)


def test_yaml_trainer_name_dropped_by_reference(ref_config):
    """[quirk fixed] COMPONENTS L2: ``TRAINER: {NAME: X}`` in YAML is
    silently dropped by the executed reference (no ADAPTER sub-key, no
    ``trainer`` attribute on Config — only top-level TRAINER_NAME works);
    here it selects the trainer."""
    ref_cfg = ref_config.get_cfg_default()
    before = ref_cfg.trainer_name
    ref_config.merge_config_dict(ref_cfg, {"TRAINER": {"NAME": "CoOp"}})
    assert ref_cfg.trainer_name == before  # silently ignored

    c = _ours()
    our_cfg = c.get_cfg_default()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        c.merge_config_dict(our_cfg, {"TRAINER": {"NAME": "CoOp"}})
    assert our_cfg.trainer_name == "CoOp"


def test_yaml_dataset_string_shorthand_clobbers_in_reference(ref_config):
    """[quirk fixed] COMPONENTS L2: the ``dataset: <name>`` string
    shorthand sets dataset.name but then CLOBBERS the whole dataset
    section with the bare string (lowercase key), and the uppercase
    ``DATASET: <name>`` form crashes outright (`.items()` on a str) —
    here the shorthand sets the name and keeps the section intact."""
    ref_cfg = ref_config.get_cfg_default()
    ref_config.merge_config_dict(ref_cfg, {"dataset": "caltech101"})
    assert ref_cfg.dataset == "caltech101"  # the section object is GONE

    ref_cfg2 = ref_config.get_cfg_default()
    with pytest.raises(AttributeError):
        ref_config.merge_config_dict(ref_cfg2, {"DATASET": "caltech101"})

    c = _ours()
    for key in ("dataset", "DATASET"):
        our_cfg = c.get_cfg_default()
        c.merge_config_dict(our_cfg, {key: "caltech101"})
        assert our_cfg.dataset.name == "caltech101"
        assert our_cfg.dataset.num_shots is not None  # section survives


def test_opts_scheduler_knobs_dropped_by_reference(ref_config):
    """[quirk fixed] COMPONENTS L2: the OPTS path hasattr-guards the
    final key too (ref: utils/config.py:520-522), so
    ``OPTIM.ETA_MIN 0.001`` from the command line is ALSO a silent no-op
    in the executed reference; here it lands as a float field."""
    ref_cfg = ref_config.get_cfg_default()
    ref_config._merge_from_list(ref_cfg, ["OPTIM.ETA_MIN", "0.001"])
    assert not hasattr(ref_cfg.optim, "eta_min")

    c = _ours()
    our_cfg = c.get_cfg_default()
    c.merge_from_opts(our_cfg, ["OPTIM.ETA_MIN", "0.001"])
    assert our_cfg.optim.eta_min == pytest.approx(0.001)
