"""CSV parser: one record per physical line (reference
lib/parsers/csv.tcl — it reads with ``gets``, so embedded newlines in
quoted fields are NOT supported; we preserve that by parsing
line-by-line).

Spark mapping (SURVEY.md §2.A6): the raw line must survive as ``a0``,
so the file is read with ``spark.read.text`` and parsed per line.
Per-FILE dispatch (VERDICT r1 #4 — the all-Python parse was the
ingest wall):

- a JVM-only probe asks whether the file contains the quote char at
  all (``filter(instr > 0).isEmpty()`` — early-exits on the first
  hit, full scan only for quote-free files, and a text scan with no
  Python worker is the cheap kind of scan);
- quote-free files (the bulk of machine-written CSV) split JVM-side
  with ``split(value, sep, -1)`` — provably identical to the csv
  module when no quote char is present, for ANY single-char dialect,
  and measured 2-3× faster than the Python node even at 1M rows
  (at cluster scale the gap is the whole Python-worker round trip);
- files containing quotes keep the Arrow-batched pandas UDF running
  Python's csv module — the exact quoting dialect of the reference
  (including the Excel "alt mode" doubled-quote handling).

Finer-grained variants were measured and rejected: NULLing the UDF
input for quote-free LINES still pays the per-row Python round trip
(~1.5 s/1M rows — the node, not the parse, is the cost), and a
whole-file ``from_csv`` needs a fixed column arity (CSV here is
ragged) and maps empty unquoted fields to NULL where the reference
keeps ``""``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqawk_spark.sources.base import FileSpec


def _make_split_udf(sep: str, quote: str, alt_mode: bool):  # noqa: ARG001
    # alt_mode (csv2/csvalt, tcllib's Excel "alternate mode") needs no
    # separate code path: Python csv with doublequote=True already
    # implements the Excel quoting dialect both modes converge on for
    # line-based input (reference lib/parsers/csv.tcl:9-13; golden
    # format-1.2 passes through this same parser).
    """Closure (pickled by value — executors don't import this repo).

    No type hints on the inner function: this module uses
    ``from __future__ import annotations``, which turns hints into
    strings pyspark's hint resolver can't evaluate — the explicit
    returnType carries the schema instead."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.StringType()))
    def split_csv(lines):
        import csv as _csv
        import io as _io

        def one(line: str):
            if line is None:
                return None
            reader = _csv.reader(
                _io.StringIO(line),
                delimiter=sep,
                quotechar=quote,
                doublequote=True,
                strict=False,
            )
            try:
                return next(reader)
            except StopIteration:
                return [""]

        return lines.map(one)

    return split_csv


def records(spark: SparkSession, spec: FileSpec, path: str, alt: bool = False) -> DataFrame:
    sep = spec.options.get("csvsep", ",")
    quote = spec.options.get("csvquote", '"')
    if len(sep) != 1:
        raise ValueError("csvsep must be a single character")
    if len(quote) != 1:
        raise ValueError("csvquote must be a single character")
    raw = spark.read.text(path)
    if raw.filter(F.instr(F.col("value"), quote) > 0).isEmpty():
        # escape only regex metachars — a \Q...\E wrapper defeats the
        # single-char fast path in Java's split (measured 2× slower)
        pattern = "\\" + sep if sep in "\\^$.|?*+()[]{}" else sep
        fields = F.split(F.col("value"), pattern, -1)
    else:
        split_udf = _make_split_udf(sep, quote, alt)
        fields = split_udf(F.col("value"))
    return raw.select(F.col("value").alias("a0"), fields.alias("fields"))


def parse(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    return records(spark, spec, path, alt=False)


def parse_alt(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    """csv2 / csvalt: the tcllib 'alternate mode' for Excel-style
    files (reference lib/parsers/csv.tcl:9-13)."""
    return records(spark, spec, path, alt=True)
