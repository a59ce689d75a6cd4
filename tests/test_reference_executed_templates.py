"""Template-bank transcription pins.

The prompt template banks are constant DATA lifted from the reference
(80 ImageNet templates + 7 select + per-dataset CUSTOM_TEMPLATES). This
re-extracts them from the reference SOURCE via AST on every test run and
requires exact equality, so transcription drift is impossible
(ref: datasets/imagenet_templates.py:3-96, utils/trainer.py:21-175).
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


def _extract_assign(path: Path, name: str):
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
            if name in targets:
                return ast.literal_eval(node.value)
    raise AssertionError(f"{name} not found in {path}")


def test_imagenet_template_banks_match_reference_source():
    from clip_gp_tpu.data.template_banks import (
        IMAGENET_TEMPLATES,
        IMAGENET_TEMPLATES_SELECT,
    )

    src = REFERENCE / "datasets" / "imagenet_templates.py"
    assert IMAGENET_TEMPLATES == _extract_assign(src, "IMAGENET_TEMPLATES")
    assert IMAGENET_TEMPLATES_SELECT == _extract_assign(
        src, "IMAGENET_TEMPLATES_SELECT"
    )


def test_custom_templates_match_reference_source():
    from clip_gp_tpu.data.template_banks import CUSTOM_TEMPLATES

    ref = _extract_assign(REFERENCE / "utils" / "trainer.py", "CUSTOM_TEMPLATES")
    assert CUSTOM_TEMPLATES == ref


def test_grouped_imagenet_templates_match_reference_literal():
    """Ours derives the 8x10 grouping by slicing; the reference writes it
    out literally (ref: datasets/imagenet_templates.py:96) — they must be
    the same grouping."""
    from clip_gp_tpu.data.template_banks import GROUPED_IMAGENET_TEMPLATES

    src = REFERENCE / "datasets" / "imagenet_templates.py"
    assert GROUPED_IMAGENET_TEMPLATES == _extract_assign(
        src, "GROUPED_IMAGENET_TEMPLATES"
    )


def test_single_templates_match_reference_source():
    """The TaskRes per-dataset single-template dict (ref: trainers/
    taskres.py:16-32) keyed by our registry names."""
    from clip_gp_tpu.data.template_banks import SINGLE_TEMPLATES

    ref = _extract_assign(REFERENCE / "trainers" / "taskres.py", "CUSTOM_TEMPLATES")
    assert set(SINGLE_TEMPLATES) == set(ref)
    assert SINGLE_TEMPLATES == ref
