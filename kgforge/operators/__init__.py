"""General operator library covering the reference's full operator
inventory (SURVEY.md §2) over the driver-provided tables, each with a
DuckDB oracle where SQL-expressible.

Modules self-register into ``registry`` on import; ``__spark_entry__``
exposes the merged registry to the driver.
"""

from . import registry  # noqa: F401


def load_all() -> None:
    """Import every operator module (triggers registration).

    Import order here is NOT the driver's sampling order anymore:
    ``__spark_entry__.queries()`` re-sorts the registry by evidence
    staleness (never-driver-sampled first, then oldest committed
    CORRECTNESS round), so every query rotates through the driver's
    ~50-query correctness window as rounds accumulate.
    """
    from . import (  # noqa: F401
        sketches,
        eventops,
        wordsearch,
        sqlsurface,
        corpusops,
        trainprep,
        curation,
        spansearch,
        kgdocs,  # (graph imports it, so it registers before graph either way)
        graph,
        similarity,
        dedup,
        text,
        cleaning,
        jsonl_sources,
        multimodal,
        ontology,
        enrichment,
        genparse,
        relational,
        codegraph,
    )
