"""Pure-Python lexical mention extractor, shared verbatim by the Spark stage
(stages/mentions.py, inside mapInPandas) and the pandas oracle twin
(oracle/twin.py) so their triple sets cannot drift (SURVEY.md §7.2(c)).

This is the "tree-sitter-style lexical extraction" of the north star: per
language, regex lexers emit (kind, name, line) mentions for modules,
imports, classes, functions, and calls.  It is the code-corpus analog of the
reference's mention detection over paragraphs
(/root/reference/experiments/uaz_documents_comparison.py:153-160).
"""

from __future__ import annotations

import re

from . import constants

_PY_IMPORT = re.compile(constants.PY_IMPORT_RE)
_PY_CLASS = re.compile(constants.PY_CLASS_RE)
_PY_DEF = re.compile(constants.PY_DEF_RE)
_PY_CALL = re.compile(constants.PY_CALL_RE)

_JS_IMPORT = re.compile(constants.JS_IMPORT_RE)
_JS_CLASS = re.compile(constants.JS_CLASS_RE)
_JS_FUNC = re.compile(constants.JS_FUNC_RE)
_JS_CALL = re.compile(constants.JS_CALL_RE)


def module_name(path: str) -> str:
    """The file's own module identity, derived from its path."""
    base = path.rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[0]


def lex_python(content: str) -> list[tuple[str, str, int]]:
    out: list[tuple[str, str, int]] = []
    defined: set[str] = set()
    for ln, line in enumerate(content.split("\n"), start=1):
        m = _PY_IMPORT.match(line)
        if m:
            out.append(("import", m.group(1) or m.group(2), ln))
            continue
        m = _PY_CLASS.match(line)
        if m:
            out.append(("class", m.group(1), ln))
            defined.add(m.group(1))
            continue
        m = _PY_DEF.match(line)
        if m:
            out.append(("function", m.group(1), ln))
            defined.add(m.group(1))
            continue
        for m in _PY_CALL.finditer(line):
            name = m.group(1)
            if name not in constants.PY_KEYWORDS:
                out.append(("call", name, ln))
    return out


def lex_javascript(content: str) -> list[tuple[str, str, int]]:
    out: list[tuple[str, str, int]] = []
    for ln, line in enumerate(content.split("\n"), start=1):
        consumed_spans: list[tuple[int, int]] = []
        for m in _JS_IMPORT.finditer(line):
            out.append(("import", m.group(1) or m.group(2), ln))
            consumed_spans.append(m.span())
        for m in _JS_CLASS.finditer(line):
            out.append(("class", m.group(1), ln))
        func_names_here: set[str] = set()
        for m in _JS_FUNC.finditer(line):
            name = m.group(1) or m.group(2)
            out.append(("function", name, ln))
            func_names_here.add(name)
        for m in _JS_CALL.finditer(line):
            name = m.group(1)
            if name in constants.JS_KEYWORDS or name in func_names_here:
                continue
            if any(s <= m.start(1) < e for s, e in consumed_spans):
                continue  # require('x') is an import, not a call
            out.append(("call", name, ln))
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
