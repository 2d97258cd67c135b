"""Tcl-list parser (reference lib/parsers/tcl.tcl): input is a Tcl
list of lists (kv=0, the default here) or list of dicts (kv=1).

A minimal Tcl-list tokenizer (braces, quotes, backslash escapes)
handles the reference's own test inputs. Parsing happens driver-side
(createDataFrame): Tcl-list files are interop glue, not a bulk format —
the reference itself reads them fully into memory. Scale-sensitive
ingest should use awk/csv/json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sqawk_spark.sources.base import FileSpec


def tokenize_tcl_list(s: str) -> list[str]:
    """Split a Tcl list into its top-level elements."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t\n\r":
            i += 1
        if i >= n:
            break
        if s[i] == "{":
            depth, j = 1, i + 1
            while j < n and depth:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == "{":
                    depth += 1
                elif s[j] == "}":
                    depth -= 1
                j += 1
            out.append(s[i + 1 : j - 1])
            i = j
        elif s[i] == '"':
            j = i + 1
            while j < n and s[j] != '"':
                if s[j] == "\\":
                    j += 1
                j += 1
            out.append(s[i + 1 : j])
            i = j + 1
        else:
            j = i
            while j < n and s[j] not in " \t\n\r":
                j += 1
            out.append(s[i:j])
            i = j
    return out


def records(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    kv = bool(int(spec.options.get("kv", "0")))
    lines = bool(int(spec.options.get("lines", "0")))
    with open(path, encoding="utf-8") as f:
        text = f.read()

    if lines:
        elements = [ln for ln in text.splitlines() if ln.strip()]
    else:
        elements = tokenize_tcl_list(text)

    rows: list[tuple[str, list[str]]] = []
    if not kv:
        for el in elements:
            rows.append((el, tokenize_tcl_list(el)))
    else:
        dicts = []
        for el in elements:
            toks = tokenize_tcl_list(el)
            dicts.append((el, dict(zip(toks[0::2], toks[1::2]))))
        # key union: first-record order, then alphabetical
        # (lib/parsers/tcl.tcl:93-99, same rule as the json parser)
        first_keys = list(dicts[0][1].keys()) if dicts else []
        extra = sorted(
            {k for _, d in dicts for k in d} - set(first_keys)
        )
        keys = first_keys + extra
        rows.append((" ".join(keys), keys))
        for el, d in dicts:
            rows.append((el, [d.get(k, "") for k in keys]))

    return spark.createDataFrame(rows, schema="a0 string, fields array<string>")


def parse(spark: SparkSession, spec: FileSpec, path: str) -> DataFrame:
    return records(spark, spec, path)
