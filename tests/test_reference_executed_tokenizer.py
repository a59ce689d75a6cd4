"""Executed-reference BPE tokenizer goldens.

Run the reference's actual ``SimpleTokenizer`` (read-only checkout, its
own ``bpe_simple_vocab_16e6.txt.gz``) and require identical token-id
sequences from our tokenizer over the full prompt surface the pipeline
ever feeds it: all 80 ImageNet templates, the 7 select templates, every
CUSTOM_TEMPLATES prompt, formatted classnames with underscores/digits/
punctuation, and assorted whitespace/case edge strings
(ref: clip/simple_tokenizer.py:62-131).

``ftfy`` is not installed here; the reference's ``basic_clean`` calls
``ftfy.fix_text``, which is the identity on well-formed ASCII/UTF-8 text
(it repairs mojibake only), so it is stubbed as identity — every prompt
in the battery is well-formed, making the stub semantics-preserving.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_tokenizer():
    had_ftfy = "ftfy" in sys.modules
    saved = sys.modules.get("ftfy")
    sys.modules["ftfy"] = types.SimpleNamespace(fix_text=lambda s: s)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_simple_tokenizer", REFERENCE / "clip" / "simple_tokenizer.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["_ref_simple_tokenizer"] = mod
        spec.loader.exec_module(mod)
        yield mod.SimpleTokenizer()
    finally:
        if had_ftfy:
            sys.modules["ftfy"] = saved
        else:
            del sys.modules["ftfy"]


def _battery():
    from clip_gp_tpu.data.template_banks import (
        CUSTOM_TEMPLATES,
        IMAGENET_TEMPLATES,
        IMAGENET_TEMPLATES_SELECT,
    )

    classnames = [
        "goldfish",
        "hard-leaved pocket orchid",
        "air_conditioner",
        "747-400",
        "Faces",
        "forest",
        "t-shirt",
        "aquarium fish",
    ]
    prompts = []
    for t in IMAGENET_TEMPLATES + IMAGENET_TEMPLATES_SELECT:
        prompts.append(t.format("goldfish"))
    for entry in CUSTOM_TEMPLATES.values():
        for t in entry if isinstance(entry, list) else [entry]:
            for c in classnames:
                prompts.append(t.format(c.replace("_", " ")))
    prompts += [
        "a photo of a dog.",
        "A PHOTO OF A DOG.",
        "  leading and   internal   whitespace  ",
        "hyphen-ated, punctuated; prompt!",
        "digits 1234567890 mixed w1th l3tters",
        "contraction's and don't",
        "",
    ]
    return prompts


def test_bpe_encoding_matches_executed_reference(ref_tokenizer):
    from clip_gp_tpu.models.tokenizer import get_tokenizer

    ours = get_tokenizer()
    for prompt in _battery():
        assert ours.encode(prompt) == ref_tokenizer.encode(prompt), prompt


def test_bpe_decode_round_trip_matches_executed_reference(ref_tokenizer):
    from clip_gp_tpu.models.tokenizer import get_tokenizer

    ours = get_tokenizer()
    for prompt in ("a photo of a goldfish.", "hyphen-ated, prompt!"):
        ids = ours.encode(prompt)
        assert ours.decode(ids) == ref_tokenizer.decode(ids)
