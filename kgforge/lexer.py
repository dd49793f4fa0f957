"""Pure-Python lexical mention extractor, shared verbatim by the Spark stage
(stages/mentions.py, inside mapInPandas) and the pandas oracle twin
(oracle/twin.py) so their triple sets cannot drift (SURVEY.md §7.2(c)).

This is the "tree-sitter-style lexical extraction" of the north star: per
language, regex lexers emit (kind, name, line) mentions for modules,
imports, classes, functions, and calls.  It is the code-corpus analog of the
reference's mention detection over paragraphs
(/root/reference/experiments/uaz_documents_comparison.py:153-160).

Implementation: single compiled-regex passes over the full content with
newline-offset bisect for line numbers — ~4x faster than a per-line loop
(this is the dominant per-file CPU of the whole pipeline).  Semantics:
- a name on an import/class/def line is never also a call
- js: require('x') is an import, not a call; a function declared on a line
  is not a call on that same line
- language keywords are never calls
"""

from __future__ import annotations

import re
from bisect import bisect_right

from . import constants

_PY_IMPORT = re.compile(constants.PY_IMPORT_RE, re.MULTILINE)
_PY_CLASS = re.compile(constants.PY_CLASS_RE, re.MULTILINE)
_PY_DEF = re.compile(constants.PY_DEF_RE, re.MULTILINE)
_PY_CALL = re.compile(constants.PY_CALL_RE)

_JS_IMPORT = re.compile(constants.JS_IMPORT_RE)
_JS_CLASS = re.compile(constants.JS_CLASS_RE)
_JS_FUNC = re.compile(constants.JS_FUNC_RE)
_JS_CALL = re.compile(constants.JS_CALL_RE)


def module_name(path: str) -> str:
    """The file's own module identity, derived from its path."""
    base = path.rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[0]


def _newlines(content: str) -> list[int]:
    out: list[int] = []
    i = content.find("\n")
    while i != -1:
        out.append(i)
        i = content.find("\n", i + 1)
    return out


def lex_python(content: str) -> list[tuple[str, str, int]]:
    nl = _newlines(content)

    def line_of(pos: int) -> int:
        return bisect_right(nl, pos) + 1

    out: list[tuple[str, str, int]] = []
    structural_lines: set[int] = set()
    for m in _PY_IMPORT.finditer(content):
        ln = line_of(m.start())
        out.append(("import", m.group(1) or m.group(2), ln))
        structural_lines.add(ln)
    for m in _PY_CLASS.finditer(content):
        ln = line_of(m.start())
        out.append(("class", m.group(1), ln))
        structural_lines.add(ln)
    for m in _PY_DEF.finditer(content):
        ln = line_of(m.start())
        out.append(("function", m.group(1), ln))
        structural_lines.add(ln)
    kw = constants.PY_KEYWORDS
    for m in _PY_CALL.finditer(content):
        name = m.group(1)
        if name in kw:
            continue
        ln = line_of(m.start(1))
        if ln in structural_lines:
            continue
        out.append(("call", name, ln))
    # stable order: by line, structural kinds before calls on the same line
    order = {"import": 0, "class": 1, "function": 2, "call": 3}
    out.sort(key=lambda t: (t[2], order[t[0]], t[1]))
    return out


def lex_javascript(content: str) -> list[tuple[str, str, int]]:
    nl = _newlines(content)

    def line_of(pos: int) -> int:
        return bisect_right(nl, pos) + 1

    out: list[tuple[str, str, int]] = []
    import_spans: list[tuple[int, int]] = []
    func_lines: dict[int, set[str]] = {}
    for m in _JS_IMPORT.finditer(content):
        out.append(("import", m.group(1) or m.group(2), line_of(m.start())))
        import_spans.append(m.span())
    for m in _JS_CLASS.finditer(content):
        out.append(("class", m.group(1), line_of(m.start())))
    for m in _JS_FUNC.finditer(content):
        name = m.group(1) or m.group(2)
        ln = line_of(m.start())
        out.append(("function", name, ln))
        func_lines.setdefault(ln, set()).add(name)
    kw = constants.JS_KEYWORDS
    for m in _JS_CALL.finditer(content):
        name = m.group(1)
        if name in kw:
            continue
        pos = m.start(1)
        if any(s <= pos < e for s, e in import_spans):
            continue  # require('x') is an import, not a call
        ln = line_of(pos)
        if name in func_lines.get(ln, ()):
            continue
        out.append(("call", name, ln))
    order = {"import": 0, "class": 1, "function": 2, "call": 3}
    out.sort(key=lambda t: (t[2], order[t[0]], t[1]))
    return out


_LEXERS = {"python": lex_python, "javascript": lex_javascript}


def lex(lang: str, path: str, content: str) -> list[tuple[str, str, int]]:
    """All mentions for one file, module row first. Unknown langs yield only
    the module row (bad-record tolerance, analog of the reference's
    skip-and-continue scan, /root/reference/data/dart_papers.py:14-27)."""
    rows = [("module", module_name(path), 0)]
    fn = _LEXERS.get(lang)
    if fn is not None and content:
        rows.extend(fn(content))
    return rows
