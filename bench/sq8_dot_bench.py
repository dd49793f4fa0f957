"""SQ8 candidate-phase integer dot, head-to-head at a LARGE query batch
(round-3 judge ask #9).

The registered ``ann_sq8_topk`` runs Q=5 queries, where the interpreted
HOF dot (zip_with+aggregate is CodegenFallback) is harmless.  The hazard
is large batches: N*Q interpreted 64-element dots.  This bench runs SQ8
phase 1 at Q=64 over the sf0.1 embeddings with both implementations
(see operators/similarity._sq8_candidates), asserts they produce the
IDENTICAL candidate set, and reports warm min-of-3 walls.  The winner
becomes the _sq8_candidates default; numbers land in BASELINE.md.

Usage: python bench/sq8_dot_bench.py [--sf-dir DIR] [--queries 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", default="8")
    ap.add_argument(
        "--multiply", type=int, default=1,
        help="union M id-shifted copies of the corpus to stress N (the "
        "2000-vector sf0.1 table is too small to separate the impls)",
    )
    args = ap.parse_args()

    from kgforge.cachectl import release_caches
    from kgforge.operators.similarity import RERANK, _sq8_candidates
    from kgforge.session import build_session

    spark = build_session("sq8-dot-bench", master=f"local[{args.cpus}]")
    e = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    if args.multiply > 1:
        from functools import reduce

        from pyspark.sql import functions as F

        base = e.count()
        copies = [
            e.select((F.col("vec_id") + i * base).alias("vec_id"), "embedding", "label")
            for i in range(args.multiply)
        ]
        e = reduce(lambda a, b: a.unionByName(b), copies)
        e = e.repartition(int(args.cpus) * 3).cache()
    e.count()

    outs = {}
    walls: dict[str, list[float]] = {}
    for impl in ("hof", "posexplode"):
        # warm-up (codegen JIT), excluded
        _sq8_candidates(e, n_queries=args.queries, rerank=RERANK, impl=impl).count()
        release_caches()
        walls[impl] = []
        for _ in range(args.reps):
            t0 = time.time()
            df = _sq8_candidates(e, n_queries=args.queries, rerank=RERANK, impl=impl)
            df.write.mode("overwrite").format("noop").save()
            walls[impl].append(round(time.time() - t0, 3))
            release_caches()
        outs[impl] = {
            (r.qid, r.vec_id)
            for r in _sq8_candidates(
                e, n_queries=args.queries, rerank=RERANK, impl=impl
            ).collect()
        }
        release_caches()

    assert outs["hof"] == outs["posexplode"], (
        f"impl mismatch: only-hof={len(outs['hof'] - outs['posexplode'])} "
        f"only-pos={len(outs['posexplode'] - outs['hof'])}"
    )
    result = {
        "queries": args.queries,
        "rerank": RERANK,
        "n_vectors": e.count(),
        "cpus": int(args.cpus),
        "walls": walls,
        "min_secs": {k: min(v) for k, v in walls.items()},
        "candidates_identical": True,
    }
    result["winner"] = min(result["min_secs"], key=result["min_secs"].get)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
