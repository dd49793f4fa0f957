"""Round-time comparison of the distributed connected-components rounds:
xxhash64 numeric ids (HashAggregate) vs raw string ids (SortAggregate).

Generates a deterministic random graph with string node ids shaped like
the pipeline's entity ids, forces the distributed path
(local_threshold=0), and times both variants on the same cached edge set.
Results recorded in BASELINE.md §Measured.

    python bench/cc_bench.py --nodes 2000000 --edges 3000000 --cpus 16
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
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=3_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--rounds", type=int, default=2, help="timed repetitions per variant")
    args = ap.parse_args()

    if os.path.isdir("/dev/shm") and "KGFORGE_LOCAL_DIR" not in os.environ:
        import tempfile

        os.environ["KGFORGE_LOCAL_DIR"] = tempfile.mkdtemp(prefix="kgcc_", dir="/dev/shm")

    from pyspark.sql import functions as F

    from kgforge.session import build_session
    from kgforge.stages.canonical import connected_components

    spark = build_session("kgforge-cc-bench", master=f"local[{args.cpus}]")

    # Deterministic pseudo-random edges over string ids (distributed gen,
    # no driver data): endpoint indices from xxhash64 of the row id.
    n, m = args.nodes, args.edges
    ids = spark.range(0, m, 1, args.cpus * 4)
    edges = ids.select(
        F.concat(
            F.lit("function:name_"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(args.seed)), F.lit(n)).cast("string"),
        ).alias("a"),
        F.concat(
            F.lit("function:name_"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(args.seed + 1)), F.lit(n)).cast("string"),
        ).alias("b"),
    ).where(F.col("a") != F.col("b"))
    edges = edges.withColumn("score", F.lit(1.0)).withColumn("bucket", F.lit(0).cast("long"))
    edges = edges.localCheckpoint()  # materialize once; both variants read this
    n_edges = edges.count()

    # JIT/codegen warm-up: run BOTH variants on a small slice first so
    # neither timed run absorbs one-time compilation (the first variant
    # otherwise measures ~40% slower regardless of which it is).
    warm = edges.limit(50_000).localCheckpoint()
    for numeric in (True, False):
        connected_components(warm, local_threshold=0, numeric_rounds=numeric).count()

    out = {"nodes": n, "edges": n_edges, "cpus": args.cpus}
    # alternate order across --rounds repetitions; report per-variant min
    reps: dict[str, list[float]] = {"numeric": [], "string": []}
    order = [("numeric", True), ("string", False)]
    for r in range(args.rounds):
        for variant, numeric in (order if r % 2 == 0 else order[::-1]):
            t0 = time.time()
            res = connected_components(edges, local_threshold=0, numeric_rounds=numeric)
            n_mapped = res.count()
            reps[variant].append(round(time.time() - t0, 2))
            out[f"{variant}_mapped"] = n_mapped
    assert out["numeric_mapped"] == out["string_mapped"], "variants disagree!"
    out["numeric_secs"] = min(reps["numeric"])
    out["string_secs"] = min(reps["string"])
    out["numeric_series"] = reps["numeric"]
    out["string_series"] = reps["string"]
    out["speedup_numeric"] = round(out["string_secs"] / out["numeric_secs"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
