"""Character-span utilities (reference span algebra, SURVEY.md §2.3 T3-T6):

- merge_spans: merge overlapping/adjacent spans
  (/root/reference/experiments/search_highlight.py:69-83 semantics:
  sort by start, merge when start <= prev_end + 1)
- find_spans: exact-match span finder
  (/root/reference/experiments/search_highlight.py:95-112)
- repair_subword_spans: extend matched subword tokens across '##'
  continuations to whole-word token spans
  (/root/reference/experiments/search_highlight.py:133-146)
- tokens_to_char_span: token-index span -> char span via per-token offsets
  (/root/reference/experiments/search_highlight.py:158-163 token_to_chars)
- wordpiece_ish: deterministic stand-in subword tokenizer (fixed-width
  pieces with '##' continuations + char offsets) so the subword kernels
  have a real data path without HF tokenizer weights.

Pure-Python kernels (run inside pandas UDF batches when used at scale);
property-tested in tests/test_properties.py per FIXTURES.md §6.
"""

from __future__ import annotations

import re


def merge_spans(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Merge overlapping or adjacent [start, end) spans."""
    if not spans:
        return []
    out: list[list[int]] = []
    for s, e in sorted(spans):
        if out and s <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def repair_subword_spans(tokens: list[str], matched: list[int]) -> list[tuple[int, int]]:
    """T5: for each matched token index, extend backward/forward across
    '##'-prefixed continuation tokens to cover the whole word, then merge
    adjacent/overlapping token spans — the reference's steps 1+2
    (/root/reference/experiments/search_highlight.py:133-156)."""
    spans: list[tuple[int, int]] = []
    for i in matched:
        start = end = i
        if tokens[start].startswith("##"):
            while start - 1 >= 0 and tokens[start - 1].startswith("##"):
                start -= 1
            start = max(start - 1, 0)
        while end + 1 < len(tokens) and tokens[end + 1].startswith("##"):
            end += 1
        spans.append((start, end))
    return merge_spans(spans)


def tokens_to_char_span(
    offsets: list[tuple[int, int]], span: tuple[int, int]
) -> tuple[int, int]:
    """T6: (start_token, end_token) -> (start_char, end_char) given the
    per-token char offsets (the token_to_chars mapping, reference :158-163)."""
    return offsets[span[0]][0], offsets[span[1]][1]


def wordpiece_ish(text: str, piece: int = 4) -> tuple[list[str], list[tuple[int, int]]]:
    """Deterministic subword tokenizer stand-in: every \\w+ word is chopped
    into fixed-width pieces, continuations '##'-prefixed, and each token
    carries its (start, end) char offsets — the shape a HF fast tokenizer
    exposes, with no model assets."""
    tokens: list[str] = []
    offsets: list[tuple[int, int]] = []
    for m in re.finditer(r"\w+", text):
        word, base = m.group(0), m.start()
        for j in range(0, len(word), piece):
            part = word[j : j + piece]
            tokens.append(part if j == 0 else "##" + part)
            offsets.append((base + j, base + j + len(part)))
    return tokens, offsets


def find_spans(text: str, words: list[str]) -> list[tuple[int, int]]:
    """All case-insensitive exact-match spans of each word in text.

    Matches INCLUDE self-overlapping repeats (lookahead scan): for a
    border-sharing word like 'aba' in 'ababa' both starts 0 and 2 count.
    The reference's plain finditer skips overlapped repeats of the same
    word — a negligible difference for highlighting (the overlapped hits
    merge into one span anyway), chosen deliberately because "every start
    offset where the word matches" is the well-defined set both the SQL
    oracle and this kernel can compute identically."""
    lo = text.lower()
    spans: list[tuple[int, int]] = []
    for w in words:
        if not w:
            continue
        wl = w.lower()
        for m in re.finditer(f"(?={re.escape(wl)})", lo):
            spans.append((m.start(), m.start() + len(wl)))
    return merge_spans(spans)
