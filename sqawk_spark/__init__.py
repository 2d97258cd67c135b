"""sqawk_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dbohdan/sqawk (reference at
/root/reference, v0.24.0), re-expressed Spark-first.

The reference is an ETL shell around SQLite: parsers build tables from
text/CSV/JSON, arbitrary SQL runs against them, serializers format the
rows. Here the same surface is a thin layer over Spark SQL / Catalyst:

- :mod:`sqawk_spark.sources`     — loaders that reproduce the reference's
  table shape (``anr``/``anf``/``a0``/fields) as DataFrames.
- :mod:`sqawk_spark.affinity`    — SQLite type-affinity emulation.
- :mod:`sqawk_spark.serializers` — awk/csv/json/tcl/table output.
- :mod:`sqawk_spark.cli`         — the sqawk-compatible command line.
- :mod:`sqawk_spark.functions`   — the reference's registered scalar UDFs.
- :mod:`sqawk_spark.operators`   — DataFrame operator library (relational
  coverage + large-scale pipeline ops: dedup, similarity, text stats).
- :mod:`sqawk_spark.streaming`   — event-time windowing (batch + streams).
"""

__version__ = "0.1.0"
