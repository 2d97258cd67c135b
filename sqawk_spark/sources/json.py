"""JSON parser (reference lib/parsers/json.tcl).

Three input shapes:
- ``kv=1`` (default): array of objects → header row is the union of
  keys, ordered by first-object key order then alphabetically for the
  rest (lib/parsers/json.tcl:76-93); missing keys → empty string.
- ``kv=0``: array of arrays → positional fields.
- ``lines=1``: JSON-Lines — one value per line, blank/whitespace lines
  skipped, CRLF tolerated (tests.tcl:749-757).

All values are flattened to text (booleans → true/false, null → empty,
nested values → their JSON text), matching the reference's
"everything is a string in SQLite" behavior (README.md:302).

Spark mapping: JSON-Lines reads distribute via spark.read.text +
from_json per line; whole-file arrays read via wholetext + explode
(same scale note as regex RS: one document per executor). Key-order
discovery needs the FIRST object's key order, which Spark's
alphabetical schema inference destroys — so the first record is
peeked driver-side (take(1)) and the union of keys is computed with
one distributed aggregation over map_keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqawk_spark.sources.base import FileSpec

_MAP = T.MapType(T.StringType(), T.StringType())
_ARR = T.ArrayType(T.StringType())


def _value_lines(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    """One JSON value per row, as its raw text."""
    lines = bool(int(spec.options.get("lines", "0")))
    if lines:
        raw = spark.read.text(path)
        return raw.select(
            F.regexp_replace(F.col("value"), "\r$", "").alias("v")
        ).filter(~F.col("v").rlike(r"^[\s]*$"))
    whole = spark.read.text(path, wholetext=True)
    # top-level array → one value per element. to_json round-trip
    # preserves element text; explode distributes the elements.
    elems = whole.select(
        F.explode(
            F.from_json(F.col("value"), T.ArrayType(T.StringType()))
        ).alias("v")
    )
    return elems


def _tcl_quote_col(c):
    """Tcl canonical list-element quoting as a column expression:
    empty → {}, whitespace/specials → {braced}, else verbatim. The
    reference's a0 for JSON input is the record converted to a Tcl
    value, so its text is Tcl's list representation (json.tcl via
    huddle → Tcl list), not the raw JSON."""
    return (
        F.when(c == "", F.lit("{}"))
        .when(
            c.rlike(r'[ \t\n{}"\\\[\]$;]'),
            F.concat(F.lit("{"), c, F.lit("}")),
        )
        .otherwise(c)
    )


def _tcl_quote_py(s: str) -> str:
    if s == "":
        return "{}"
    if any(ch in s for ch in ' \t\n{}"\\[]$;'):
        return "{" + s + "}"
    return s


def records(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    kv = bool(int(spec.options.get("kv", "1")))
    vals = _value_lines(spark, spec, path)

    # JSON null → the STRING "null": the reference parses through a
    # Tcl JSON lib with no null concept (format-3.4 expects the field
    # to read "null"). Must happen HERE, before NF padding — padding
    # NULLs for short records still render empty.
    if not kv:
        arr = F.transform(
            F.from_json(F.col("v"), _ARR),
            lambda x: F.coalesce(x, F.lit("null")),
        )
        # a0 = the fields as a Tcl list (whitespace-normalized), not
        # the raw JSON text — format-3.1 expects "1 2 3 4 5"
        parsed = vals.select(arr.alias("fields")).select(
            F.concat_ws(
                " ", F.transform(F.col("fields"), _tcl_quote_col)
            ).alias("a0"),
            "fields",
        )
        return parsed

    # kv mode: compute the ordered key union — first record's order,
    # then the rest alphabetically (lib/parsers/json.tcl:76-93).
    # Null values become the string "null" here too (same Tcl-lib
    # rationale as above).
    maps = vals.select(
        F.col("v"),
        F.transform_values(
            F.from_json(F.col("v"), _MAP),
            lambda k, x: F.coalesce(x, F.lit("null")),
        ).alias("m"),
    )
    first = maps.select("m").first()
    first_keys = list(first["m"].keys()) if first and first["m"] else []
    all_keys_rows = (
        maps.select(F.explode(F.map_keys(F.col("m"))).alias("k")).distinct().collect()
    )
    extra = sorted(
        {r["k"] for r in all_keys_rows} - set(first_keys)
    )
    keys = first_keys + extra

    # header record first (key names), then one record per object with
    # missing keys as empty strings (lib/parsers/json.tcl:99-102).
    # a0 of the header = the key list; a0 of a record = its OWN
    # present pairs flattened "k v ..." in document order (format-3.3)
    header = spark.createDataFrame(
        [(" ".join(_tcl_quote_py(k) for k in keys), keys)],
        schema="a0 string, fields array<string>",
    )
    field_cols = F.array(
        *[
            F.coalesce(F.element_at(F.col("m"), F.lit(k)), F.lit(""))
            for k in keys
        ]
    ) if keys else F.array().cast(_ARR)
    pairs = F.flatten(
        F.transform(
            F.map_entries(F.col("m")),
            lambda e: F.array(e["key"], e["value"]),
        )
    )
    a0 = F.concat_ws(" ", F.transform(pairs, _tcl_quote_col))
    body = maps.select(a0.alias("a0"), field_cols.alias("fields"))
    return header.unionAll(body)


def parse(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    return records(spark, spec, path)
