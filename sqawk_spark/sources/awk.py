"""The default "awk" parser: regex RS record split, regex FS field
split, trim, and sep-preserving field mapping (reference
lib/parsers/awk.tcl).

Spark mapping (SURVEY.md §2.A1/A4/A5):

- RS = literal newline (the default) → ``spark.read.text``: records
  are reader partitions' lines, fully parallel at any input size.
- custom / regex RS → whole-file read + split + explode. This is the
  documented scale limit of regex record separators (one file must fit
  one executor); the reference has the same practical limit (its
  1 MiB chunked scanner is still single-process).
- FS split keeps trailing empty fields (split limit -1), matching the
  reference's sepsplit (lib/parsers/awk.tcl:44-56).
- ``fields=`` ranges merge fields WITH their original separators: the
  separator list is recovered JVM-side with regexp_extract_all(FS),
  then ranges are reassembled with element_at/concat — no Python in
  the path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqawk_spark.sources.base import FileSpec

DEFAULT_FS = r"[ \t]+"
DEFAULT_RS = "\n"

# the -1 flag's match-nothing FS (sqawk-dev.tcl:81-83)
MATCH_NOTHING = "x^"


def _check_not_empty_matching(pattern: str, what: str) -> None:
    """Reject FS/RS regexes that match the empty string — the
    reference's infinite-loop guard (lib/parsers/awk.tcl:27-29)."""
    if re.search(pattern, "") is not None:
        raise ValueError(f"{what} regex {pattern!r} matches an empty string")


def parse_field_map(spec: str) -> list[tuple[int, int | str] | str]:
    """Parse a ``fields=`` spec: ``1,2,3-5,5-end,auto``
    (reference lib/parsers/awk.tcl:111-135)."""
    out: list[tuple[int, int | str] | str] = []
    for part in spec.split(","):
        part = part.strip()
        if part == "auto":
            out.append("auto")
        elif "-" in part:
            lo, hi = part.split("-", 1)
            if hi == "end":
                out.append((int(lo), "end"))
            else:
                out.append((int(lo), int(hi)))
        else:
            n = int(part)
            out.append((n, n))
    return out


def records(
    spark: SparkSession, spec: FileSpec, path: str
) -> DataFrame:
    """File → (a0, fields) records DataFrame."""
    fs = spec.options.get("FS", DEFAULT_FS)
    rs = spec.options.get("RS", DEFAULT_RS)
    trim = spec.options.get("trim", "none")
    fmap = spec.options.get("fields")

    if fs != MATCH_NOTHING:
        _check_not_empty_matching(fs, "FS")

    if rs == DEFAULT_RS:
        raw = spark.read.text(path).withColumnRenamed("value", "rec")
    elif not set(rs) & set("\\^$.|?*+()[]{}"):
        # literal (regex-metachar-free) RS: Spark's custom lineSep
        # reader — splittable like the newline path, no whole-file
        # ceiling. Record semantics verified identical to the regex
        # branch: trailing separator's empty record drops, interior
        # and leading empties survive.
        _check_not_empty_matching(rs, "RS")
        raw = spark.read.text(path, lineSep=rs).withColumnRenamed(
            "value", "rec"
        )
    else:
        _check_not_empty_matching(rs, "RS")
        whole = spark.read.text(path, wholetext=True)
        split_col = F.split(F.col("value"), rs, -1)
        # a trailing record separator yields a final empty record —
        # drop it, like the reference's channel EOF handling
        raw = whole.select(
            F.explode(
                F.when(
                    F.element_at(split_col, -1) == "",
                    F.slice(split_col, 1, F.size(split_col) - 1),
                ).otherwise(split_col)
            ).alias("rec")
        )

    if trim in ("left", "both"):
        raw = raw.withColumn("rec", F.ltrim(F.col("rec")))
    if trim in ("right", "both"):
        raw = raw.withColumn("rec", F.rtrim(F.col("rec")))
    elif trim not in ("none", "left", "both"):
        raise ValueError(f"invalid trim value: {trim!r}")

    if fs == MATCH_NOTHING:
        # -1 / match-nothing FS: the whole record is the only field
        return raw.select(
            F.col("rec").alias("a0"), F.array(F.col("rec")).alias("fields")
        )

    fields = F.split(F.col("rec"), fs, -1)
    if fmap is None:
        return raw.select(F.col("rec").alias("a0"), fields.alias("fields"))

    # fields= mapping with separator preservation
    # (lib/parsers/awk.tcl:19-59,82-107): separators between fields are
    # the FS matches, recovered in order with regexp_extract_all.
    seps = F.expr(f"regexp_extract_all(rec, '{_sql_quote(fs)}', 0)")
    parsed = raw.select(F.col("rec").alias("a0"), fields.alias("f"), seps.alias("s"))
    ranges = parse_field_map(fmap)
    cols = []
    auto_from: int | None = None
    for idx, r in enumerate(ranges):
        if r == "auto":
            # 'auto': every field from the next index onward, one column
            # each (README.md:282) — handled after the fixed ranges
            auto_from = (
                max(
                    (hi for (_, hi) in (x for x in ranges[:idx] if x != "auto")
                     if hi != "end"),
                    default=0,
                )
                + 1
            )
            continue
        lo, hi = r
        if hi == "end":
            # merge from lo through the last field, keeping separators
            merged = F.expr(
                f"concat_ws('', zip_with(slice(f, {lo}, size(f) - {lo} + 1),"
                f" slice(s, {lo}, greatest(size(f) - {lo}, 0)),"
                f" (x, y) -> concat(x, coalesce(y, ''))))"
            )
            cols.append(merged)
        elif lo == hi:
            cols.append(F.element_at(F.col("f"), lo))
        else:
            width = hi - lo + 1
            merged = F.expr(
                f"concat_ws('', zip_with(slice(f, {lo}, {width}),"
                f" concat(slice(s, {lo}, {width - 1}), array('')),"
                f" (x, y) -> concat(x, coalesce(y, ''))))"
            )
            cols.append(merged)
    if auto_from is not None:
        # append each remaining field as its own column
        tail = F.expr(f"slice(f, {auto_from}, greatest(size(f) - {auto_from - 1}, 0))")
        mapped = F.concat(F.array(*cols), tail) if cols else tail
    else:
        mapped = F.array(*cols)
    return parsed.select("a0", mapped.alias("fields"))


def _sql_quote(pattern: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pattern.replace("\\", "\\\\").replace("'", "\\'")


def parse(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    return records(spark, spec, path)
