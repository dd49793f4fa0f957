"""General operator library covering the reference's full operator
inventory (SURVEY.md §2) over the driver-provided tables, each with a
DuckDB oracle where SQL-expressible.

Modules self-register into ``registry`` on import; ``__spark_entry__``
exposes the merged registry to the driver.
"""

from . import registry  # noqa: F401


def load_all() -> None:
    """Import every operator module (triggers registration)."""
    from . import (  # noqa: F401
        cleaning,
        dedup,
        graph,
        jsonl_sources,
        kgdocs,
        multimodal,
        ontology,
        relational,
        similarity,
        spansearch,
        sqlsurface,
        text,
        wordsearch,
    )
