"""Character-span utilities (reference span algebra, SURVEY.md §2.3 T3-T6):

- merge_spans: merge overlapping/adjacent spans
  (/root/reference/experiments/search_highlight.py:69-83 semantics:
  sort by start, merge when start <= prev_end + 1)
- find_spans: exact-match span finder
  (/root/reference/experiments/search_highlight.py:95-112)

Pure-Python kernels (run inside pandas UDF batches when used at scale);
property-tested in tests/test_properties.py per FIXTURES.md §6.
"""

from __future__ import annotations


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


def find_spans(text: str, words: list[str]) -> list[tuple[int, int]]:
    """All case-insensitive exact-match spans of each word in text."""
    import re

    lo = text.lower()
    spans: list[tuple[int, int]] = []
    for w in words:
        if not w:
            continue
        for m in re.finditer(re.escape(w.lower()), lo):
            spans.append((m.start(), m.end()))
    return merge_spans(spans)
