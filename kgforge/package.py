"""Build the ``--py-files`` artifact the cluster run mode ships.

``python -m kgforge.package [out.zip]`` writes a self-contained zip of the
``kgforge`` package (sources + bundled data files, no ``__pycache__``),
import-ready via zipimport on every executor:

    python -m kgforge.package kgforge.zip
    spark-submit --py-files kgforge.zip --master ... kgforge/pipeline.py \\
        --input <table> --run-root <table-prefix>

Zip-safety contract: the cluster surface (``kgforge.pipeline`` and every
stage/operator it reaches) opens no package-relative file, so it imports
and runs from the zip as-is.  The demo JSONL/ontology queries read
``kgforge/data/*`` through ordinary ``open()``/``spark.read`` on the
DRIVER, which runs from a checkout — the data files are still bundled so
unpacking the zip yields a complete package.  ``tests/test_package.py``
pins the executor-side contract by importing from the zip in a clean
subprocess.
"""

from __future__ import annotations

import os
import sys
import zipfile

EXCLUDE_DIRS = {"__pycache__"}


def build_zip(out_path: str) -> int:
    """Zip the installed kgforge package rooted at this file's directory.
    Returns the number of files written.  Deterministic member order
    (sorted walk) so rebuilding an unchanged tree yields a stable listing.
    """
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    count = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
            dirnames[:] = sorted(d for d in dirnames if d not in EXCLUDE_DIRS)
            for name in sorted(filenames):
                if name.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, parent))
                count += 1
    return count


def main(argv: list[str]) -> int:
    out = argv[0] if argv else "kgforge.zip"
    n = build_zip(out)
    print(f"wrote {out}: {n} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
