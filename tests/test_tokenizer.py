"""Tokenizer parity: canonical OpenAI CLIP token ids for known prompts."""

import numpy as np
import pytest

from clip_gp_tpu.models.tokenizer import get_tokenizer, tokenize


def test_vocab_size():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


def test_canonical_prompt_ids():
    # "a photo of a cat." is the canonical CLIP prompt; these ids are the
    # well-known OpenAI tokenizer outputs (a=320, photo=1125, of=539,
    # cat=2368, '.'=269).
    ids = tokenize("a photo of a cat.")[0]
    expected = [49406, 320, 1125, 539, 320, 2368, 269, 49407]
    assert list(ids[: len(expected)]) == expected
    assert (ids[len(expected):] == 0).all()


def test_shape_and_padding():
    out = tokenize(["a photo of a dog.", "hello world"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == 49406
    assert 49407 in out[0]


def test_roundtrip_decode():
    tok = get_tokenizer()
    text = "a blurry photo of a toy airplane, a type of aircraft."
    ids = tok.encode(text)
    # BPE decode puts every word (incl. punctuation) on its own boundary
    assert tok.decode(ids).replace(" ,", ",").replace(" .", ".").strip() == text


def test_truncation():
    long_text = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize(long_text)
    out = tokenize(long_text, truncate=True)[0]
    assert out[-1] == 49407


def test_case_and_whitespace_normalization():
    a = tokenize("A  Photo   of a CAT.")
    b = tokenize("a photo of a cat.")
    np.testing.assert_array_equal(a, b)
