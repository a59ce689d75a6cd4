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


# ----------------------------------------------------------------------
# ftfy-parity surface (ref: clip/simple_tokenizer.py:50-59): the reference
# runs ftfy.fix_text before tokenizing; we only apply it (a deterministic
# lite port) to non-ASCII input. These tests pin that every SHIPPED prompt
# string — template banks and hardcoded classname renames — is printable
# ASCII, for which fix_text is the identity, so dropping it cannot change
# any token id the framework produces on its own vocabulary.
# ----------------------------------------------------------------------

def _is_fix_text_identity_ascii(s: str) -> bool:
    # printable ASCII with no control chars other than whitespace: every
    # default ftfy fixer (mojibake repair, ligatures, width, quotes, NFC)
    # is the identity on such strings
    return s.isascii() and all(c.isprintable() or c in " \t\n" for c in s)


def test_all_template_banks_are_ftfy_identity():
    from clip_gp_tpu.data import template_banks as tb

    all_strings = list(tb.IMAGENET_TEMPLATES)
    all_strings += list(tb.IMAGENET_TEMPLATES_SELECT)
    for bank in tb.CUSTOM_TEMPLATES.values():  # dataset -> list of templates
        all_strings += list(bank)
    all_strings += list(tb.SINGLE_TEMPLATES.values())
    for group in tb.GROUPED_IMAGENET_TEMPLATES:
        all_strings += list(group)
    assert len(all_strings) > 100
    for s in all_strings:
        assert _is_fix_text_identity_ascii(s), s


def test_all_hardcoded_classnames_are_ftfy_identity():
    import clip_gp_tpu.data.datasets  # noqa: F401
    from clip_gp_tpu.data.datasets.catalog import DATASET_REGISTRY

    seen = 0
    for name in DATASET_REGISTRY.names():
        cls = DATASET_REGISTRY.get(name)
        for k, v in (getattr(cls, "new_cnames", None) or {}).items():
            assert _is_fix_text_identity_ascii(k), (name, k)
            assert _is_fix_text_identity_ascii(v), (name, v)
            seen += 1
    assert seen >= 14  # caltech101 renames + eurosat renames


def test_ascii_input_never_warns(capsys):
    import clip_gp_tpu.models.tokenizer as tkn

    tkn._warned_non_ascii = False
    tokenize(["a photo of a dog.", "hello world", "itap of a cat."])
    assert tkn._warned_non_ascii is False
    assert "WARN" not in capsys.readouterr().err


def test_fix_text_lite_normalizations():
    from clip_gp_tpu.models.tokenizer import _fix_text_lite

    # latin ligatures expand (ftfy fix_latin_ligatures)
    assert _fix_text_lite("ﬁsh ﬂy ﬀ") == "fish fly ff"
    # curly quotes uncurl (ftfy uncurl_quotes)
    assert _fix_text_lite("‘a’ “b”") == "'a' \"b\""
    # fullwidth forms narrow (ftfy fix_character_width)
    assert _fix_text_lite("Ａｂｃ") == "Abc"
    # NFC composition (ftfy normalization='NFC')
    assert _fix_text_lite("café") == "café"
    # zero-width/format chars removed (ftfy remove_control_chars)
    assert _fix_text_lite("a​b﻿c") == "abc"
    # terminal escapes removed (ftfy remove_terminal_escapes)
    assert _fix_text_lite("\x1b[31mred\x1b[0m") == "red"
    # line separators normalize (ftfy fix_line_breaks)
    assert _fix_text_lite("a b") == "a\nb"
    # well-formed accented text passes through unchanged
    assert _fix_text_lite("café niño") == "café niño"


def test_non_ascii_warns_once_and_tokenizes_normalized(capsys):
    import clip_gp_tpu.models.tokenizer as tkn

    tkn._warned_non_ascii = False
    a = tokenize("a photo of a ﬁsh.")  # ligature fi
    b = tokenize("a photo of a fish.")
    np.testing.assert_array_equal(a, b)
    err = capsys.readouterr().err
    assert err.count("round-trip mojibake repair") == 1
    tokenize("café")  # second non-ASCII input: no second warning
    assert "mojibake" not in capsys.readouterr().err
    tkn._warned_non_ascii = False


def test_surrogate_handling_matches_ftfy_semantics():
    from clip_gp_tpu.models.tokenizer import _fix_surrogates, _fix_text_lite

    # a surrogate PAIR recombines into its astral character (ftfy
    # fix_surrogates), not '??' (which str.encode(...,'replace') produces)
    assert _fix_surrogates("a\ud83d\ude00b") == "a\U0001f600b"
    # a LONE surrogate becomes U+FFFD, not ASCII '?'
    assert _fix_surrogates("a\ud800b") == "a�b"
    assert _fix_surrogates("x\udfffy\ud800") == "x�y�"
    # and through the full lite pass
    assert _fix_text_lite("a\ud800b") == "a�b"


def test_ascii_html_entities_uncurl_like_reference():
    """ftfy's auto unescape_html runs BEFORE quote uncurling, so pure-ASCII
    input carrying entity-encoded curly quotes must tokenize like the
    literal punctuation (ref: clip/simple_tokenizer.py:50-53)."""
    from clip_gp_tpu.models.tokenizer import _clean

    assert _clean("&ldquo;bird&rdquo;") == '"bird"'
    assert _clean("it&rsquo;s") == "it's"
    # entity-encoded ligature expands too
    assert _clean("&#xfb01;sh") == "fish"
    np.testing.assert_array_equal(
        tokenize("&ldquo;a photo&rdquo;"), tokenize('"a photo"')
    )


def test_clean_unescape_count_matches_reference():
    """basic_clean = fix_text (1 auto unescape) + 2 explicit unescapes = 3
    total; a 4th would over-decode nested '&amp;' escapes."""
    from clip_gp_tpu.models.tokenizer import _clean

    assert _clean("&amp;amp;amp;x") == "&x"
    # '<' present: ftfy's auto heuristic skips ITS unescape (only the 2
    # explicit ones run)
    assert _clean("a < &amp;amp;x") == "a < &x"


def test_unescape_gate_is_per_line_segment():
    """ftfy applies fix_text (and the '<' unescape gate) PER LINE segment:
    markup on one line must not suppress entity unescaping on another
    (round-4 advisor case) — the reference yields ASCII quotes here."""
    from clip_gp_tpu.models.tokenizer import _clean

    assert _clean("foo <b>\n&ldquo;x&rdquo;") == 'foo <b> "x"'
    # the gate still holds within the markup line itself
    assert _clean("a <b> &amp;amp;x\nc&rsquo;d") == "a <b> &x c'd"
    np.testing.assert_array_equal(
        tokenize("foo <b>\n&ldquo;x&rdquo;"), tokenize('foo <b> "x"')
    )


def test_mojibake_repair_high_confidence_subset():
    """The round-trip subset of ftfy.fix_encoding: UTF-8 mangled through
    cp1252/latin-1 re-decodes exactly; ambiguous runs stay untouched
    (ref: clip/simple_tokenizer.py:50-53 → ftfy default chain)."""
    from clip_gp_tpu.models.tokenizer import _clean, _repair_mojibake

    # the classic cp1252-class manglings (known stable ftfy outcomes)
    assert _repair_mojibake("CafÃ©") == "Café"
    assert _repair_mojibake("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    assert _repair_mojibake("donâ€™t") == "don’t"  # € is cp1252-only
    # latin-1-class mangling: raw C1 continuation bytes
    assert _repair_mojibake("caf\xc3\xa9") == "café"
    # doubly-mangled text unwraps one layer per pass to a fixed point
    doubly = "Café".encode("utf-8").decode("cp1252")
    doubly = doubly.encode("utf-8").decode("cp1252")
    assert _repair_mojibake(doubly) == "Café"
    # NOT valid UTF-8 after re-encode: left alone (Ã + space)
    assert _repair_mojibake("Ã la carte") == "Ã la carte"
    # well-formed non-ASCII is untouched (é alone re-encodes to one byte)
    assert _repair_mojibake("café niño ✓") == "café niño ✓"
    # end-to-end: repaired curly apostrophe then uncurls like the reference
    assert _clean("donâ€™t stop") == "don't stop"
    np.testing.assert_array_equal(
        tokenize("a photo of a CafÃ©."), tokenize("a photo of a Café.")
    )


def test_ascii_control_chars_removed_like_ftfy():
    from clip_gp_tpu.models.tokenizer import _clean

    # ftfy remove_control_chars strips C0 controls (except \t, \n) on ASCII
    # input too; \r folds into whitespace like fix_line_breaks + the
    # whitespace collapse
    assert _clean("a\x07b") == "ab"
    assert _clean("a\x1b[31mred") == "ared"
    assert _clean("a\rb") == "a b"
