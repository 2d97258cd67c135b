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

__all__ = ["load_tables"]
