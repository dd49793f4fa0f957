"""Unit tests for the shared lexical mention extractor (kgforge/lexer.py).

Mirrors the reference's mention-detection semantics at the lexical level
(/root/reference/experiments/uaz_documents_comparison.py:153-160 analog).
"""

from kgforge import lexer

PY = """import os
from utils import helper

class Loader:
    def setup(self):
        pass

def load_data(x):
    y = parse_config(x)
    return y
"""

JS = """const utils = require('utils');
class Loader {}
function loadData(x) {
  return parseConfig(x);
}
"""


def test_python_lexer():
    got = lexer.lex_python(PY)
    assert ("import", "os", 1) in got
    assert ("import", "utils", 2) in got
    assert ("class", "Loader", 4) in got
    assert ("function", "load_data", 8) in got
    assert ("function", "setup", 5) in got
    assert ("call", "parse_config", 9) in got
    # keywords are not calls
    assert not any(k == "call" and n in ("return", "def") for k, n, _ in got)


def test_javascript_lexer():
    got = lexer.lex_javascript(JS)
    assert ("import", "utils", 1) in got
    assert ("class", "Loader", 2) in got
    assert ("function", "loadData", 3) in got
    assert ("call", "parseConfig", 4) in got
    # require() consumed as import, not call
    assert ("call", "require", 1) not in got


def test_module_name_and_unknown_lang():
    assert lexer.module_name("src/pkg/mod_7.py") == "mod_7"
    rows = lexer.lex("rust", "a/b.rs", "fn main() {}")
    assert rows == [("module", "b", 0)]


def test_lex_empty_content():
    assert lexer.lex("python", "x/y.py", "") == [("module", "y", 0)]
