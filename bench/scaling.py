"""Scaling-efficiency evidence (north_rule: files/sec throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same pipeline job runs at
two parallelism levels — local[8] (N) and local[32] (4N) — over the SAME
pre-materialized parquet input, each in a fresh JVM (subprocess) so no
cache/JIT state leaks between runs.  Efficiency = (t_N / t_4N) / 4.

Usage:
    python bench/scaling.py --files 20000          # parent: runs both, prints JSON
    python bench/scaling.py --worker 8 IN OUT      # internal per-JVM worker

Results are recorded in BASELINE.md §Measured and BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time


def worker(cpus: int, input_dir: str, run_root: str) -> None:
    from kgforge.pipeline import run_pipeline
    from kgforge.session import build_session

    spark = build_session(f"kgforge-scale-{cpus}", master=f"local[{cpus}]")
    files = spark.read.parquet(input_dir)
    files.count()  # warm the scan metadata; exclude from timing
    t0 = time.time()
    out = run_pipeline(spark, files, run_root)
    n_triples = out["triples"].count()
    secs = time.time() - t0
    print(json.dumps({"cpus": cpus, "secs": round(secs, 3), "n_triples": n_triples}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--worker", type=int, default=0)
    ap.add_argument("rest", nargs="*")
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.rest[0], args.rest[1])
        return

    # materialize the input once (generation excluded from the measurement)
    from kgforge import synth
    from kgforge.session import build_session

    input_dir = tempfile.mkdtemp(prefix="kgscale_in_")
    spark = build_session("kgforge-scale-gen", master="local[32]")
    synth.synth_files_df(spark, args.files).write.mode("overwrite").parquet(input_dir)
    spark.stop()

    results = {}
    for cpus in (8, 32):
        run_root = tempfile.mkdtemp(prefix=f"kgscale_run{cpus}_")
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus), input_dir, run_root],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    t8, t32 = results[8]["secs"], results[32]["secs"]
    assert results[8]["n_triples"] == results[32]["n_triples"], "nondeterministic triples!"
    eff = (t8 / t32) / 4.0
    out = {
        "files": args.files,
        "n_triples": results[8]["n_triples"],
        "local8_secs": t8,
        "local32_secs": t32,
        "local8_files_per_sec": round(args.files / t8, 2),
        "local32_files_per_sec": round(args.files / t32, 2),
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
