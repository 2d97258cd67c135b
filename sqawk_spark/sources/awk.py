"""The default "awk" parser: regex RS record split, regex FS field
split, trim, and sep-preserving field mapping (reference
lib/parsers/awk.tcl).

Spark mapping (SURVEY.md §2.A1/A4/A5):

- RS = literal newline (the default) → ``spark.read.text``: records
  are reader partitions' lines, fully parallel at any input size.
- literal (metachar-free) RS → ``spark.read.text(lineSep=...)``:
  splittable like the newline path.
- regex RS → a chunked overlap-read record splitter (the classic
  Hadoop-style custom record reader): the file is planned as
  fixed-size byte ranges, one Spark task each; every task scans its
  range with an overlap of left context, drops the leading partial
  record, owns exactly the records that START inside its range, and
  reads forward past its range end for its final record. A multi-GiB
  regex-RS file therefore runs in N parallel tasks, not one
  2 GiB-bounded wholetext row. Caveats, documented here because they
  are inherent to chunked regex splitting (the reference's own 1 MiB
  chunked scanner is a single process and so never faces them,
  lib/parsers/awk.tcl:139-206): a single separator match — or an
  unbroken chain of adjacent matches — longer than
  ``RS_OVERLAP_BYTES`` back-extends the window in doubling blocks
  until the edge-touching match is disambiguated, and RAISES a loud
  error past ``RS_BACK_MAX`` (the task refuses rather than
  mis-split), and the RS regex is evaluated by
  Python ``re`` over bytes (ASCII class semantics), while
  literal-RS/FS splitting uses the JVM's Java regex; the dialects
  agree on the metachar-free and common-regex cases the reference
  exercises. Local globs and directories expand driver-side and plan
  per-file chunk descriptors into ONE frame (file order → partition
  order, so ``anr`` numbers continuously across files); only
  non-local URIs fall back to wholetext + JVM split.
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

# regex-RS chunked reader geometry: each task owns a CHUNK-sized byte
# range and scans with OVERLAP bytes of left context. Sized so a task
# holds ~33 MiB; separator matches (and adjacent-match chains) must be
# shorter than the overlap (module docstring). Tests shrink these to
# force multi-task splits on small files.
RS_CHUNK_BYTES = 32 << 20
RS_OVERLAP_BYTES = 1 << 20
# ceiling on the left back-extension that disambiguates a separator
# match touching the overlap window's edge; a chain still touching
# after this many bytes raises instead of mis-splitting
RS_BACK_MAX = 64 << 20


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
        local = _expand_local_paths(path)
        uri_info = None if local else _uri_chunk_info(path)
        if local:
            raw = _chunked_regex_records(spark, local, rs)
        elif uri_info is not None:
            # non-local URI (file://, s3a://…): the chunk planner only
            # needs length + range reads, both available through
            # pyarrow.fs — same byte-range task plan as local files
            raw = _chunked_regex_records(
                spark, uri_info[0], rs, sizes=uri_info[1]
            )
        else:
            # genuinely unseekable/unsupported source (no pyarrow
            # filesystem driver, or a remote glob): wholetext fallback
            # (JVM split), bounded by the 2 GiB single-string ceiling
            whole = spark.read.text(path, wholetext=True)
            split_col = F.split(F.col("value"), rs, -1)
            # a trailing record separator yields a final empty record
            # — drop it, like the reference's channel EOF handling
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


def _expand_local_paths(path: str) -> list[str]:
    """Local regular files behind ``path``: the file itself, a
    directory's visible files (lexicographic, skipping the ``_``/``.``
    names Hadoop's input formats hide — parity with what the wholetext
    reader would have listed), or glob matches.  Empty for non-local
    URIs."""
    import glob as _glob
    import os

    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if not n.startswith((".", "_"))
            and os.path.isfile(os.path.join(path, n))
        )
    return sorted(p for p in _glob.glob(path) if os.path.isfile(p))


def _uri_chunk_info(path: str) -> tuple[list[str], list[int]] | None:
    """(paths, sizes) for a scheme-prefixed URI the chunk planner can
    range-read via pyarrow.fs — a single file or a directory of files
    — or None (no scheme, unsupported/driverless filesystem, remote
    glob), keeping the wholetext fallback.  s3a:// maps to pyarrow's
    s3:// driver; hdfs:// needs libhdfs and falls back cleanly when
    absent."""
    if "://" not in path:
        return None
    uri = path.replace("s3a://", "s3://", 1)
    try:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(uri)
        info = filesystem.get_file_info([p])[0]
        if info.type == pafs.FileType.File:
            return [uri], [info.size]
        if info.type == pafs.FileType.Directory:
            files = [
                i
                for i in filesystem.get_file_info(
                    pafs.FileSelector(p, recursive=False)
                )
                if i.type == pafs.FileType.File
                and not i.base_name.startswith((".", "_"))
            ]
            files.sort(key=lambda i: i.base_name)
            # FileInfo.path has no authority component, so rebuilding
            # as f"{scheme}://{i.path}" would drop hdfs://host:port.
            # Keep the ORIGINAL uri (scheme+authority+dir intact) and
            # append each entry's path relative to the directory's fs
            # path — executor-side from_uri then sees the full URI.
            base, stem = uri.rstrip("/"), p.rstrip("/")
            if any(not i.path.startswith(stem) for i in files):
                return None  # unexpected normalization: wholetext path
            return (
                [base + i.path[len(stem):] for i in files],
                [i.size for i in files],
            )
    except Exception:
        return None
    return None


def _chunked_regex_records(
    spark: SparkSession,
    paths: list[str],
    rs: str,
    sizes: list[int] | None = None,
) -> DataFrame:
    """Regex-RS record splitting in N parallel tasks (module
    docstring; the scale fix for VERDICT r07 "What's missing" #2).

    The file is planned driver-side as fixed ``RS_CHUNK_BYTES`` byte
    ranges, one per task, shipped as a tiny chunk-descriptor frame
    whose partition i IS chunk i (``parallelize`` slices in order, so
    downstream ``anr`` numbering — partition order, then row order —
    still equals file order). Each task:

    1. reads ``[start - OVERLAP, end)`` and walks separator matches
       left to right; a record starts at offset 0 and at the end of
       every match; the task OWNS record starts ``p`` with
       ``start <= p < end`` (so every record has exactly one owner);
    2. a match truncated by the window edge, or an owned final record
       with no following match in the window, triggers a forward
       extension: re-read past ``end`` in doubling blocks until the
       next complete match (or EOF) closes the record — records may
       span any number of chunks, but only their owner pays;
    3. the empty record after a separator ending exactly at EOF is
       dropped by construction: its start offset equals the file size
       and no chunk owns it. Interior empties survive.

    Matching runs on bytes (record starts are byte offsets), so
    separator matches always cut on UTF-8 character boundaries when
    the file and pattern are valid UTF-8; records decode
    independently.

    Several files (a glob or directory) plan into the SAME descriptor
    frame, file order first and byte order within each file — so
    partition order is file order and ``anr`` numbers continuously
    across files; records never span files (each file splits exactly
    as it would alone, per-file trailing empty dropped)."""
    import os

    chunk, ov = RS_CHUNK_BYTES, RS_OVERLAP_BYTES
    chunks = []
    for i, p in enumerate(paths):
        sz = sizes[i] if sizes is not None else os.path.getsize(p)
        chunks.extend(
            (p, s, min(s + chunk, sz), sz) for s in range(0, sz, chunk)
        )
    if not chunks:
        chunks = [(paths[0], 0, 0, 0)]
    rs_pattern = rs

    def split_chunks(batches):
        import re as _re

        import pandas as _pd

        rx = _re.compile(rs_pattern.encode("utf-8"))

        def _open_range(fpath: str):
            # scheme-prefixed paths range-read through pyarrow.fs
            # (NativeFile: same seek/read surface as a local file)
            if "://" in fpath:
                from pyarrow import fs as pafs

                filesystem, p = pafs.FileSystem.from_uri(fpath)
                return filesystem.open_input_file(p)
            return open(fpath, "rb")

        def extract(fpath: str, start: int, end: int, size: int) -> list:
            recs: list[bytes] = []
            with _open_range(fpath) as f:
                left = max(0, start - ov)
                f.seek(left)
                buf = f.read(end - left)
                base = left
                # a match flush against the window's left edge may be
                # the TAIL of a longer match (or adjacent-match chain)
                # that began before the window — its end offset, and
                # with it the first owned record start, would be
                # unprovable.  Back-extend in doubling blocks until the
                # window's first match no longer touches its start (or
                # the window reaches the file start); past RS_BACK_MAX
                # refuse LOUDLY rather than mis-split.
                back = max(ov, 1)
                while left > 0 and rx.match(buf) is not None:
                    if back > RS_BACK_MAX:
                        raise RuntimeError(
                            "regex RS: separator match (or adjacent-"
                            f"match chain) at byte {left} of {fpath} "
                            f"still touches the window edge after "
                            f"{back} bytes of back-extension; "
                            "separator chains longer than "
                            "RS_BACK_MAX are unsupported — use a "
                            "literal RS or split the input"
                        )
                    new_left = max(0, left - back)
                    f.seek(new_left)
                    buf = f.read(left - new_left) + buf
                    back *= 2
                    left = new_left
                base = left
                cur = 0 if start == 0 else None  # current record start
                need_extend = True
                for m in rx.finditer(buf):
                    if m.end() == len(buf) and end < size:
                        # window-edge truncation: the true match may be
                        # longer; resolve it in the extension below
                        break
                    s_abs, e_abs = base + m.start(), base + m.end()
                    if cur is not None and start <= cur:
                        recs.append(buf[cur - base : s_abs - base])
                    cur = e_abs
                    if cur >= end:
                        need_extend = False
                        break
                if need_extend:
                    # remaining owned record(s) extend past the
                    # window: read forward in doubling blocks until
                    # the next complete match (or EOF) closes each
                    read_to = end
                    grow = max(ov, 1 << 20)
                    while cur is not None and start <= cur < end:
                        at_eof = read_to >= size
                        m = rx.search(buf, cur - base)
                        if m and (base + m.end() < read_to or at_eof):
                            recs.append(buf[cur - base : m.start()])
                            cur = base + m.end()
                            continue
                        if not m and at_eof:
                            recs.append(buf[cur - base :])
                            break
                        f.seek(read_to)
                        buf += f.read(grow)
                        read_to += grow
                        grow *= 2
            return [r.decode("utf-8", errors="replace") for r in recs]

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                yield _pd.DataFrame(
                    {
                        "rec": extract(
                            row.path, int(row.start), int(row.stop), int(row.size)
                        )
                    },
                    dtype=object,
                )

    rdd = spark.sparkContext.parallelize(chunks, len(chunks))
    cdf = spark.createDataFrame(
        rdd, "path string, start long, stop long, size long"
    )
    return cdf.mapInPandas(split_chunks, schema="rec string")


def _sql_quote(pattern: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pattern.replace("\\", "\\\\").replace("'", "\\'")


def parse(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    return records(spark, spec, path)
