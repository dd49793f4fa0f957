"""End-to-end KG-construction pipeline driver (spark-submit entry).

Stages (each checkpoint-resumable, north_rule):
    files -> mentions -> entity_embeddings -> candidate_links -> entities
          -> triples (+ metrics)

Usage (cluster; ``python -m kgforge.package kgforge.zip`` builds the artifact):
    spark-submit --py-files kgforge.zip -m kgforge.pipeline \
        --input <iceberg-table-or-parquet-path> --run-root <checkpoint root>

Sandbox usage is via ``run_pipeline(spark, files_df, run_root)``.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import catalog, schemas, synth, valvemetrics
from .checkpoint import CheckpointManager
from .stages import canonical, embed, link, materialize, mentions


def run_pipeline(
    spark: SparkSession,
    files: DataFrame,
    run_root: str,
    force: bool = False,
    audit: bool = False,
) -> dict[str, DataFrame]:
    """Run (or resume) all stages; returns the stage tables.

    ``audit=True`` additionally re-hashes the source content and folds the
    per-partition content_sha256 invariant verdicts into the metrics table
    (an extra full input pass — on by default in tests, opt-in in prod).
    """
    ck = CheckpointManager(spark, run_root)
    out: dict[str, DataFrame] = {}
    metrics_parts: list[DataFrame] = []

    # NB: the input corpus is never re-materialized — content_sha256 is
    # computed inline in the mention stage (at 100 TB, a files_hashed
    # checkpoint would rewrite the whole input).
    t0 = time.time()
    files_hashed = mentions.with_content_sha(files)
    out["files"] = files_hashed

    t1 = time.time()
    men_packed = ck.get_or_run(
        "mentions",
        lambda: mentions.extract_mentions_packed(files_hashed),
        force=force,
        schema=mentions.MENTIONS_PACKED,
    )
    men = mentions.explode_mentions(men_packed)
    out["mentions"] = men
    sha_ok = materialize.sha_audit(files_hashed, men) if audit else None
    metrics_parts.append(
        materialize.stage_metrics(
            "mentions",
            files.select("repo"),
            men_packed.select("repo", F.col("n_mentions").alias("_n")),
            int((time.time() - t1) * 1000),
            sha_ok=sha_ok,
            out_weight="_n",
        )
    )

    t2 = time.time()
    emb = ck.get_or_run(
        "entity_embeddings",
        lambda: embed.embed_mentions(men),
        force=force,
        schema=schemas.ENTITY_EMBEDDINGS,
    )
    out["entity_embeddings"] = emb

    t3 = time.time()
    links = ck.get_or_run(
        "candidate_links",
        lambda: link.candidate_links(emb),
        force=force,
        schema=schemas.CANDIDATE_LINKS,
    )
    out["candidate_links"] = links

    t4 = time.time()
    ents = ck.get_or_run(
        "entities",
        lambda: canonical.connected_components(links),
        force=force,
        schema=schemas.ENTITIES,
    )
    out["entities"] = ents

    t5 = time.time()
    tri = ck.get_or_run(
        "triples",
        lambda: materialize.triples_from_packed(men_packed, ents),
        partition_by=["pred"],
        force=force,
        schema=schemas.TRIPLES,
    )
    out["triples"] = tri
    metrics_parts.append(
        materialize.stage_metrics(
            "triples",
            men_packed.select("repo", F.col("n_mentions").alias("_n")),
            tri.withColumn("repo", F.split_part(F.col("subj"), F.lit(":"), F.lit(1))),
            int((time.time() - t5) * 1000),
            in_weight="_n",
        )
    )

    def _metrics():
        df = metrics_parts[0]
        for p in metrics_parts[1:]:
            df = df.unionByName(p)
        # fold in any valve drops observed while the stages above built
        # (e.g. link's oversized-bucket cap) — the cluster audit trail
        # for "no silent caps" lives in the written table, not in logs
        valve_rows = valvemetrics.metrics_rows(spark)
        if valve_rows is not None:
            df = df.unionByName(valve_rows)
        return df

    t6 = time.time()
    out["metrics"] = ck.get_or_run("metrics", _metrics, force=force, schema=schemas.METRICS)
    out["wall_secs"] = time.time() - t0  # type: ignore[assignment]
    out["stage_secs"] = {  # type: ignore[assignment]
        "mentions": round(t2 - t1, 2),
        "embed": round(t3 - t2, 2),
        "links": round(t4 - t3, 2),
        "entities": round(t5 - t4, 2),
        "triples": round(t6 - t5, 2),
        "metrics": round(time.time() - t6, 2),
    }
    return out


def main() -> None:  # pragma: no cover - cluster entry
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="files table (iceberg name or parquet path)")
    ap.add_argument("--synth", type=int, default=0, help="generate N synthetic files instead")
    ap.add_argument("--run-root", required=True)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--audit", action="store_true", help="verify content_sha256 invariant (extra input pass)")
    args = ap.parse_args()

    from .session import build_session

    spark = build_session("kgforge-pipeline")
    if args.synth:
        files = synth.synth_files_df(spark, args.synth)
    else:
        files = catalog.read_table(spark, args.input)
        # schema contract per input_hint
        missing = set(schemas.FILES.fieldNames()) - set(files.columns)
        if missing:
            raise SystemExit(f"input missing columns: {sorted(missing)}")
    out = run_pipeline(spark, files, args.run_root, force=args.force, audit=args.audit)
    n = out["triples"].count()
    print(f"triples={n} wall_secs={out['wall_secs']:.2f}")


if __name__ == "__main__":  # pragma: no cover
    main()
