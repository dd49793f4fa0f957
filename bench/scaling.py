"""Scaling-efficiency evidence (north_rule: files/sec throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same pipeline job runs at
two parallelism levels — local[4] (N) and local[16] (4N) — over the SAME
pre-materialized parquet input, each in a fresh JVM (subprocess) so no
cache/JIT state leaks between runs.  Efficiency = (t_N / t_4N) / 4.

local[4]/local[16] rather than 8/32: the machine has 32 cores, and a
local[32] run competes with Spark's own shuffle/GC threads and the 32
Python UDF workers for the same cores, understating true 4x scaling;
at 4 vs 16 both runs get their nominal cores.  Override with --cores.

Each worker JVM (and its whole Python-worker tree) is pinned to exactly
its nominal cores with ``taskset -c 0-(n-1)``, and BLAS threading is
forced to 1 (OMP/OPENBLAS/MKL): otherwise the "N-core" run borrows extra
physical cores for GC / shuffle-compression / numpy threads, inflating
its throughput and understating the true N->4N scaling — the sandbox
analog of "two separate cluster sizes" requires hard core budgets.
Disable with --no-pin.

Usage:
    python bench/scaling.py --files 100000         # parent: runs both, prints JSON
    python bench/scaling.py --worker 4 IN OUT      # internal per-JVM worker

Results are recorded in BASELINE.md §Measured and BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


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
    print(
        json.dumps(
            {
                "cpus": cpus,
                "secs": round(secs, 3),
                "n_triples": n_triples,
                "stage_secs": out.get("stage_secs"),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100000)
    ap.add_argument("--cores", default="4,16")
    ap.add_argument(
        "--repeats",
        type=int,
        default=2,
        help="runs per parallelism level; min wall is reported (the sandbox "
        "VM shows intermittent sys-time noise — min is the least-noisy "
        "estimate of true cost)",
    )
    ap.add_argument("--worker", type=int, default=0)
    ap.add_argument(
        "--no-pin",
        action="store_true",
        help="skip taskset CPU pinning of worker JVMs (pinning is the default "
        "when taskset exists: it enforces the nominal core budget on the "
        "whole JVM+Python tree, the honest emulation of two cluster sizes)",
    )
    ap.add_argument("rest", nargs="*")
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.rest[0], args.rest[1])
        return

    # tmpfs for shuffle spill + checkpoint tables: the sandbox analog of
    # executor-local NVMe (measuring one shared virtual disk would report
    # disk contention, not engine scaling).
    if os.path.isdir("/dev/shm") and "KGFORGE_LOCAL_DIR" not in os.environ:
        base = tempfile.mkdtemp(prefix="kgscale_shm_", dir="/dev/shm")
        os.environ["KGFORGE_LOCAL_DIR"] = os.path.join(base, "local")

    # materialize the input once (generation excluded from the measurement)
    from kgforge import synth
    from kgforge.session import build_session

    tmp_base = os.environ.get("KGFORGE_LOCAL_DIR")
    tmp_root = os.path.dirname(tmp_base) if tmp_base else None
    input_dir = tempfile.mkdtemp(prefix="kgscale_in_", dir=tmp_root)
    spark = build_session("kgforge-scale-gen", master="local[32]")
    synth.synth_files_df(spark, args.files).write.mode("overwrite").parquet(input_dir)
    spark.stop()

    lo, hi = (int(c) for c in args.cores.split(","))
    import shutil as _shutil

    pin = (not args.no_pin) and _shutil.which("taskset") is not None
    # Single-threaded BLAS in every worker: numpy/Arrow must not multiply
    # the nominal core budget (on a real cluster each executor core is one
    # task thread; BLAS oversubscription is a local-mode artifact).
    thread_env = {
        "OMP_NUM_THREADS": "1",
        "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
        "ARROW_NUM_THREADS": "1",
    }
    results = {}
    for cpus in (lo, hi):
        best = None
        for rep in range(args.repeats):
            run_root = tempfile.mkdtemp(prefix=f"kgscale_run{cpus}_{rep}_", dir=tmp_root)
            log_path = f"{run_root}.log"
            cmd = [sys.executable, __file__, "--worker", str(cpus), input_dir, run_root]
            if pin:
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            with open(log_path, "w") as log:
                subprocess.run(
                    cmd,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    check=True,
                    env={**os.environ, **thread_env},
                )
            with open(log_path) as log:
                line = [
                    ln for ln in log.read().splitlines() if ln.lstrip().startswith('{"cpus"')
                ][-1]
            got = json.loads(line.lstrip())
            if best is None or got["secs"] < best["secs"]:
                best = got
        results[cpus] = best

    t_lo, t_hi = results[lo]["secs"], results[hi]["secs"]
    assert results[lo]["n_triples"] == results[hi]["n_triples"], "nondeterministic triples!"
    ratio = hi / lo
    eff = (t_lo / t_hi) / ratio
    out = {
        "files": args.files,
        "n_triples": results[lo]["n_triples"],
        f"local{lo}_secs": t_lo,
        f"local{hi}_secs": t_hi,
        f"local{lo}_files_per_sec": round(args.files / t_lo, 2),
        f"local{hi}_files_per_sec": round(args.files / t_hi, 2),
        "cores": [lo, hi],
        "pinned": pin,
        f"speedup_{lo}_to_{hi}": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out))
    with open(os.path.join(_REPO_ROOT, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
