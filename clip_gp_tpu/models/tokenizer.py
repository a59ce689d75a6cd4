"""Byte-level BPE tokenizer for CLIP text prompts.

Produces token ids identical to OpenAI CLIP's tokenizer (ref:
clip/simple_tokenizer.py, clip/clip.py:181-217) so that text embeddings match
checkpoint semantics. Runs host-side once per class/template set — not a perf
path — so it is pure Python.

The merge table (``assets/clip_bpe_merges.txt.gz``) is the public OpenAI CLIP
vocabulary data asset (16e6-sentence BPE, 49,152 entries + 2 specials).

Note: the original pipeline additionally runs ``ftfy.fix_text`` before
tokenizing (ref: clip/simple_tokenizer.py:50-59). For the shipped prompt
surface — every template bank and every reference dataset classname is
printable ASCII, pinned by ``tests/test_tokenizer.py`` — ``fix_text`` is the
identity, so the fast path only HTML-unescapes + normalizes whitespace.
User-supplied vocabularies (``scripts/predict.py`` accepts arbitrary class
names) may contain non-ASCII text: for those ``_fix_text_lite`` applies the
deterministic subset of ftfy's default pipeline (NFC, latin ligatures,
character width, quote uncurling, line breaks, surrogate/control removal,
terminal escapes) plus the HIGH-CONFIDENCE subset of mojibake repair
(``fix_encoding``): maximal non-ASCII runs that round-trip through
sloppy-windows-1252 or latin-1 back to valid multi-byte UTF-8 are re-decoded
(the classic "CafÃ©"/"â€™" double-encoding class), iterated to a fixed
point. Runs that do not round-trip exactly are left unchanged — ftfy's
badness-heuristic arbitration of genuinely ambiguous bytes is not ported,
and a one-time warning says so.
"""

from __future__ import annotations

import functools
import gzip
import html
import sys
import unicodedata
from pathlib import Path
from typing import List, Union

import numpy as np
import regex as re

ASSET_PATH = Path(__file__).parent / "assets" / "clip_bpe_merges.txt.gz"

CONTEXT_LENGTH = 77
SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte → printable-unicode map (standard byte-level BPE trick:
    the 188 printable latin-1 bytes map to themselves, the rest shift to
    256+offset so no token string contains control characters)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


# Deterministic pieces of ftfy.fix_text's default fixer chain (ref:
# clip/simple_tokenizer.py:50-53). Each table mirrors the corresponding ftfy
# fixer; mojibake repair (fix_encoding and friends) is intentionally absent —
# it is heuristic re-decoding, meaningless without the library, and identity
# on well-formed input.
_LIGATURES = str.maketrans({
    "Ĳ": "IJ", "ĳ": "ij", "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl",
    "ﬃ": "ffi", "ﬄ": "ffl", "ﬅ": "ft", "ﬆ": "st",
})
_CURLY_QUOTES = str.maketrans({
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"',
})
_LINE_BREAKS = str.maketrans({
    "\r": "\n", "\u2028": "\n", "\u2029": "\n", "\x85": "\n",
})
_TERMINAL_ESCAPES = re.compile("\x1b\\[[0-9;]*[mKHJ]")
# C0/C1 control chars ftfy's remove_control_chars strips (keep \t and \n,
# which whitespace_clean collapses anyway), plus zero-width/format chars
_CONTROL_CHARS = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f"
    "\ufeff\u200b\u200c\u200d\u2060]"
)
_WIDTH_CHARS = re.compile("[\uff01-\uffee]")  # full/halfwidth forms block
_SURROGATES = re.compile("[\ud800-\udfff]")

# ftfy's fix_text divides its input at line breaks and runs the fixer chain
# per segment \u2014 the unescape_html="auto" '<' gate included (ADVICE r4:
# markup on one line must not suppress entity unescaping on another).
_SEGMENT_BREAKS = re.compile("([\n\r\x85\u2028\u2029])")

# --- mojibake repair (the high-confidence subset of ftfy.fix_encoding) ---
# UTF-8 text decoded through windows-1252 or latin-1 produces recognizable
# non-ASCII runs ("Caf\u00c3\u00a9", "\u00e2\u20ac\u2122") that re-encode through the same codec to
# VALID multi-byte UTF-8 \u2014 an exact round-trip, so repair is deterministic.
# ftfy's "sloppy-windows-1252" maps the five bytes cp1252 leaves undefined
# (81 8D 8F 90 9D) to their C1 controls so such mangled text still encodes.
_SLOPPY_1252: dict[str, int] = {}
for _b in range(256):
    try:
        _SLOPPY_1252[bytes([_b]).decode("cp1252")] = _b
    except UnicodeDecodeError:
        _SLOPPY_1252[chr(_b)] = _b
del _b
_NON_ASCII_RUN = re.compile("[^\x00-\x7f]+")

_warned_non_ascii = False


def _encode_sloppy_1252(chunk: str) -> bytes | None:
    try:
        return bytes(_SLOPPY_1252[c] for c in chunk)
    except KeyError:
        return None


def _encode_latin_1(chunk: str) -> bytes | None:
    try:
        return chunk.encode("latin-1")
    except UnicodeEncodeError:
        return None


def _repair_chunk(chunk: str) -> str:
    """Re-decode one maximal non-ASCII run iff it round-trips to valid
    multi-byte UTF-8 through sloppy-1252 (cp1252-class mangling, tried
    first \u2014 it covers '\u20ac'/'\u2122'-style chars latin-1 cannot encode) or
    latin-1 (raw C1 controls cp1252 maps elsewhere)."""
    for enc in (_encode_sloppy_1252, _encode_latin_1):
        raw = enc(chunk)
        if raw is None or len(raw) < 2:
            continue
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if fixed != chunk:
            return fixed
    return chunk


def _repair_mojibake(text: str, max_passes: int = 3) -> str:
    """High-confidence subset of ``ftfy.fix_encoding`` (ref:
    clip/simple_tokenizer.py:50-53 \u2192 ftfy default fixer chain): repair
    applies per maximal non-ASCII run, only on an exact codec round-trip,
    iterated because doubly-mangled text unwraps one layer per pass."""
    for _ in range(max_passes):
        new = _NON_ASCII_RUN.sub(lambda m: _repair_chunk(m.group()), text)
        if new == text:
            return text
        text = new
    return text


def _fix_surrogates(text: str) -> str:
    """ftfy ``fix_surrogates`` semantics: a UTF-16 surrogate *pair* (which
    can appear in a Python str via surrogatepass/surrogateescape decoding)
    recombines into its astral character; a *lone* surrogate becomes U+FFFD.
    (``str.encode(..., "replace")`` is NOT equivalent \u2014 it substitutes
    ASCII ``?``.)"""
    if not _SURROGATES.search(text):
        return text
    out = []
    i = 0
    while i < len(text):
        c = text[i]
        if (
            "\ud800" <= c <= "\udbff"
            and i + 1 < len(text)
            and "\udc00" <= text[i + 1] <= "\udfff"
        ):
            out.append(chr(
                0x10000
                + ((ord(c) - 0xD800) << 10)
                + (ord(text[i + 1]) - 0xDC00)
            ))
            i += 2
        elif "\ud800" <= c <= "\udfff":
            out.append("\ufffd")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _fix_text_lite(text: str) -> str:
    """Deterministic subset of ``ftfy.fix_text`` for non-ASCII input (ref:
    clip/simple_tokenizer.py:50-53): line-break + width normalization,
    ligature expansion, quote uncurling, surrogate/control/escape removal,
    NFC. Warns once that mojibake *repair* is not ported."""
    global _warned_non_ascii
    if not _warned_non_ascii:
        _warned_non_ascii = True
        print(
            "[WARN] tokenizer: non-ASCII input; applying the deterministic "
            "subset of ftfy.fix_text (NFC/ligatures/width/quotes) plus "
            "round-trip mojibake repair. Runs that don't round-trip exactly "
            "through cp1252/latin-1 are left as-is — ftfy's badness "
            "heuristics for those are not ported and such text may tokenize "
            "differently from the reference.",
            file=sys.stderr,
        )
    text = text.translate(_LINE_BREAKS)
    text = _TERMINAL_ESCAPES.sub("", text)
    text = _fix_surrogates(text)
    # fix_encoding runs before the character-level fixers in ftfy's chain:
    # "â€™" must become ’ first so the quote uncurling below sees it
    text = _repair_mojibake(text)
    text = text.translate(_LIGATURES).translate(_CURLY_QUOTES)
    text = _WIDTH_CHARS.sub(lambda m: unicodedata.normalize("NFKC", m.group()),
                            text)
    text = _CONTROL_CHARS.sub("", text)
    return unicodedata.normalize("NFC", text)


def _auto_unescape(text: str) -> str:
    # ftfy's unescape_html="auto" is the FIRST fixer in fix_text's chain
    # (ref: clip/simple_tokenizer.py:50-53 → ftfy default config): entities
    # unescape when the text has no '<', BEFORE ligature/quote fixing — so
    # entity-encoded punctuation in pure-ASCII input ('&ldquo;' → '“') must
    # leave the ASCII plane here to be uncurled like literal input. The
    # gate applies PER LINE SEGMENT (fix_text divides its input at line
    # breaks): markup on one line must not suppress unescaping on another.
    # Total unescape count stays 3 (1 here + the reference's explicit 2).
    if "&" not in text:
        return text
    return "".join(
        html.unescape(seg) if "&" in seg and "<" not in seg else seg
        for seg in _SEGMENT_BREAKS.split(text)
    )


def _clean(text: str) -> str:
    text = _auto_unescape(text)
    if text.isascii():
        # the only default ftfy fixers that touch ASCII: terminal escape
        # sequences and control characters are removed (\t and \n survive
        # into the whitespace collapse below, like the reference)
        text = _TERMINAL_ESCAPES.sub("", text)
        text = _CONTROL_CHARS.sub("", text)
    else:
        text = _fix_text_lite(text)
    text = html.unescape(html.unescape(text)).strip()
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class ClipTokenizer:
    def __init__(self, bpe_path: Union[str, Path] = ASSET_PATH):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # line 0 is the header; the vocabulary uses the first 48,894 merges
        # (49,152 total entries − 256 bytes − 2 specials).
        merges = [tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT_TOKEN, EOT_TOKEN]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )
        self.sot_id = self.encoder[SOT_TOKEN]
        self.eot_id = self.encoder[EOT_TOKEN]
        self.vocab_size = len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _clean(text)
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids: List[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


@functools.lru_cache()
def get_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()


def tokenize(
    texts: Union[str, List[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize to fixed-length int32 id matrix ``[len(texts), context_length]``
    with SOS/EOT framing (ref: clip/clip.py:181-217)."""
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [tok.sot_id] + tok.encode(text) + [tok.eot_id]
        if len(ids) > context_length:
            if truncate:
                ids = ids[:context_length]
                ids[-1] = tok.eot_id
            else:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length {context_length}"
                )
        result[i, : len(ids)] = ids
    return result
