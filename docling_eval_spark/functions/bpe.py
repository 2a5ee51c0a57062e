"""From-scratch byte-level BPE encoder (the GPT-2 algorithm; Radford et
al. 2019, public `encoder.py`), for context-window packing and
token-budget selection over a pluggable merges table.

Reference analog: none — the reference (wai25/docling-eval) has no
tokenizer; this is the beyond-reference operator a 100 TB training
pipeline actually runs (whitespace word counts mis-size real context
windows by 20-40%).

Pieces, all reimplemented from the published algorithm — no vendored
code, no model weights:

  bytes_to_unicode: the GPT-2 bijection from the 256 byte values onto
    printable unicode chars (printables map to themselves, the rest
    shift to U+0100+), so merge-table entries are plain strings.
  pre_tokenize: the GPT-2 regex
    's|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+
    |\\s+(?!\\S)|\\s+
    as an explicit scanner (the stdlib re lacks \\p classes;
    unicodedata supplies the L/N categories). Merges can never cross
    pre-token boundaries.
  bpe_encode: iteratively merge the lowest-rank adjacent symbol pair
    until no ranked pair remains (ties in rank are impossible — the
    table is a rank list).

Determinism: pure function of (text, merges); no state, no RNG.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte<->unicode bijection (published construction verbatim:
    visible ASCII + two Latin-1 ranges map to themselves, every other
    byte value b maps to chr(256 + n) in first-gap order)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def _is_letter(c: str) -> bool:
    return unicodedata.category(c).startswith("L")


def _is_number(c: str) -> bool:
    return unicodedata.category(c).startswith("N")


def pre_tokenize(text: str) -> list[str]:
    """GPT-2 pre-tokenizer: contractions, space-prefixed letter / number
    / punctuation runs, and whitespace runs that donate their final
    space to the following token. ''.join(pre_tokenize(t)) == t."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            for suf in _CONTRACTIONS:
                if text.startswith(suf, i):
                    out.append(suf)
                    i += len(suf)
                    break
            else:
                j = i + 1
                while j < n and not (text[j].isspace() or _is_letter(text[j])
                                     or _is_number(text[j])):
                    j += 1
                out.append(text[i:j])
                i = j
            continue
        start = i
        if c == " " and i + 1 < n and not text[i + 1].isspace():
            i += 1
            c = text[i]
        if _is_letter(c):
            j = i
            while j < n and _is_letter(text[j]):
                j += 1
            out.append(text[start:j])
            i = j
        elif _is_number(c):
            j = i
            while j < n and _is_number(text[j]):
                j += 1
            out.append(text[start:j])
            i = j
        elif not c.isspace():
            # ' ?[^\s\p{L}\p{N}]+' — contractions only match at the run
            # start; an apostrophe mid-run stays in the punctuation run
            # (regex alternation is anchored at the match position)
            j = i
            while j < n and not (text[j].isspace() or _is_letter(text[j])
                                 or _is_number(text[j])):
                j += 1
            out.append(text[start:j])
            i = j
        else:
            # whitespace run: '\s+(?!\S)' keeps the last space for the
            # next token when a non-space follows; '\s+' otherwise
            j = i
            while j < n and text[j].isspace():
                j += 1
            if j < n and j - i > 1:
                out.append(text[i:j - 1])
                i = j - 1
            else:
                out.append(text[i:j])
                i = j
    return out


def load_merges(lines) -> list[tuple[str, str]]:
    """Parse a merges table in the public merges.txt format: one
    'left right' pair per line, rank = line order; '#version' header
    and blank lines skipped."""
    merges = []
    for ln in lines:
        ln = ln.rstrip("\n")
        if not ln or ln.startswith("#"):
            continue
        left, right = ln.split(" ")
        merges.append((left, right))
    return merges


def bpe_encode(text: str, merges: list[tuple[str, str]],
               _cache: dict | None = None) -> list[str]:
    """Byte-level BPE: UTF-8 bytes -> unicode symbols -> iterative
    lowest-rank pair merging per pre-token. Returns the token strings
    (in the remapped byte alphabet). Pass a dict as `_cache` to reuse
    per-pre-token results across a batch (web text repeats tokens
    heavily; the cache is the published optimization)."""
    ranks = {pair: r for r, pair in enumerate(merges)}
    b2u = bytes_to_unicode()
    cache = _cache if _cache is not None else {}
    out: list[str] = []
    for tok in pre_tokenize(text):
        hit = cache.get(tok)
        if hit is None:
            hit = _merge_word(
                tuple(b2u[b] for b in tok.encode("utf-8")), ranks)
            cache[tok] = hit
        out.extend(hit)
    return out


def bpe_token_count(text: str, merges: list[tuple[str, str]],
                    _cache: dict | None = None) -> int:
    return len(bpe_encode(text, merges, _cache))


def _merge_word(word: tuple[str, ...],
                ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    if len(word) < 2:
        return word
    while True:
        best, best_rank = None, None
        prev = word[0]
        for sym in word[1:]:
            r = ranks.get((prev, sym))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (prev, sym), r
            prev = sym
        if best is None:
            return word
        merged: list[str] = []
        i = 0
        while i < len(word):
            if (i + 1 < len(word) and word[i] == best[0]
                    and word[i + 1] == best[1]):
                merged.append(word[i] + word[i + 1])
                i += 2
            else:
                merged.append(word[i])
                i += 1
        word = tuple(merged)
        if len(word) < 2:
            return word
