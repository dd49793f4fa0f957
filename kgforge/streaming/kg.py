"""Streaming KG ingest (beyond the batch-only reference, SURVEY.md §2.9).

New source files arrive continuously on a real corpus; the lexical part of
the KG pipeline is a pure map (lex -> dedup-per-file -> explode), so it
runs UNCHANGED as a Structured Streaming plan:

    readStream(files dir) -> extract_mentions_packed (mapInPandas)
                          -> triples_from_packed(mapping=None)
                          -> writeStream (append)

Entity linking and canonicalization are corpus-global (they need the full
entity universe), so they stay periodic BATCH jobs over the accumulated
lexical output — the standard lambda split for iterative graph algorithms
on streams.  Tests assert batch/stream parity: the streaming plan drained
with trigger(availableNow=True) over a directory written in waves emits
exactly the batch plan's lexical triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..stages import materialize, mentions


def read_files_stream(spark: SparkSession, files_dir: str) -> DataFrame:
    """File-source stream over a files parquet directory (new files appear
    as new parquet parts; maxFilesPerTrigger bounds micro-batch size)."""
    return spark.readStream.schema(schemas.FILES).parquet(files_dir)


def lexical_triples_stream(files: DataFrame) -> DataFrame:
    """files (streaming OR batch) -> lexical triples.  Map-only: the
    canonical mapping is None, so no probe/collect/union touches the
    streaming plan; every operator is a mapInPandas or a projection and the
    sink can run in append mode with exactly-once file-source semantics."""
    packed = mentions.extract_mentions_packed(files)
    return materialize.triples_from_packed(packed, mapping=None)


def start_lexical_ingest(
    spark: SparkSession,
    files_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "kg_lexical_ingest",
):
    """Continuous ingest: append lexical triples as parquet as new file
    batches land; resumable via the streaming checkpoint."""
    stream = lexical_triples_stream(read_files_stream(spark, files_dir))
    return (
        stream.writeStream.format("parquet")
        .queryName(query_name)
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
