"""DataFrame operator library.

- :mod:`.relational` — the full relational surface the reference exposes
  through SQLite (SURVEY.md §2.B), expressed as DataFrame builders over
  the driver test tables.
- :mod:`.dedup`      — exact and near-duplicate detection at scale.
- :mod:`.similarity` — embedding similarity search (brute-force + LSH).
- :mod:`.textstats`  — language ID, quality scoring, token counting,
  fingerprinting for document pipelines.
- :mod:`.multimodal` — binary-column (image/audio/video) plumbing.
"""

from sqawk_spark.operators.tables import load_tables

__all__ = ["load_tables", "load_all"]


def load_all() -> None:
    """Import every operator module so the registry is fully populated.

    The single place that knows the module list — the entry contract,
    bench harness, and parity tests all call this.
    """
    import sqawk_spark.operators.analytics  # noqa: F401
    import sqawk_spark.operators.dedup  # noqa: F401
    import sqawk_spark.operators.graph  # noqa: F401
    import sqawk_spark.operators.multimodal  # noqa: F401
    import sqawk_spark.operators.packing  # noqa: F401
    import sqawk_spark.operators.relational  # noqa: F401
    import sqawk_spark.operators.sampling  # noqa: F401
    import sqawk_spark.operators.similarity  # noqa: F401
    import sqawk_spark.operators.temporal  # noqa: F401
    import sqawk_spark.operators.textstats  # noqa: F401
    import sqawk_spark.operators.tpch  # noqa: F401
    import sqawk_spark.streaming.windows  # noqa: F401
