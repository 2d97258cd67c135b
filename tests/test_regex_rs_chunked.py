"""The chunked regex-RS record splitter (sources/awk.py) — the scale
fix for the former wholetext cliff (VERDICT r07 "What's missing" #2).

Semantics reference: ``re.split(rs, text)`` with the trailing empty
record dropped when the file ends in a separator (the reference's
channel-EOF handling, lib/parsers/awk.tcl:139-206). The tests shrink
RS_CHUNK_BYTES so small files plan as many tasks, and pin:

- >1 input task on a multi-chunk file (the point of the fix);
- records identical to the single-process split across chunk
  boundaries in every alignment (separator straddling a boundary,
  record spanning several whole chunks, separator ending exactly on a
  boundary, trailing/leading/interior empties);
- ``anr`` numbering still equals file order (partition i is chunk i);
- a randomized sweep over geometries and separator placements.
"""

from __future__ import annotations

import random
import re

import pytest

import sqawk_spark.sources.awk as awk
from sqawk_spark.sources.awk import records
from sqawk_spark.sources.base import FileSpec, with_record_numbers


def reference_split(rs: str, text: str) -> list[str]:
    parts = re.split(rs, text)
    if parts and parts[-1] == "":
        parts = parts[:-1]
    return parts


def chunked_records(spark, tmp_path, text: str, rs: str, chunk: int, ov: int):
    f = tmp_path / "data.txt"
    f.write_text(text)
    spec = FileSpec(filename=str(f), format="awk", options={"RS": rs})
    old_chunk, old_ov = awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES
    awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = chunk, ov
    try:
        df = records(spark, spec, str(f))
        n_tasks = df.rdd.getNumPartitions()
        recs = [r["a0"] for r in with_record_numbers(df).orderBy("anr").collect()]
    finally:
        awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = old_chunk, old_ov
    return recs, n_tasks


def test_multi_chunk_file_runs_in_many_tasks(spark, tmp_path):
    text = "".join(f"rec{i:04d} val{i}" + ";;" for i in range(200))
    recs, n_tasks = chunked_records(
        spark, tmp_path, text, "[;]+", chunk=256, ov=64
    )
    assert n_tasks > 1, "multi-chunk file must plan more than one task"
    assert recs == reference_split("[;]+", text)


def test_separator_straddles_chunk_boundary(spark, tmp_path):
    # chunk=16: the ';;;' separators land on and across boundaries
    text = "aaaaaaaaaaaaaa;;;bbbbbbbbbbbbb;;;c"
    recs, n_tasks = chunked_records(
        spark, tmp_path, text, ";+", chunk=16, ov=8
    )
    assert n_tasks == 3
    assert recs == ["aaaaaaaaaaaaaa", "bbbbbbbbbbbbb", "c"]


def test_record_spans_multiple_whole_chunks(spark, tmp_path):
    # one record longer than several chunks: only its owner task reads
    # forward; no other task may also emit it
    text = "x" * 100 + "|" + "y" * 5 + "|" + "z" * 100
    recs, _ = chunked_records(spark, tmp_path, text, "[|]", chunk=16, ov=8)
    assert recs == ["x" * 100, "y" * 5, "z" * 100]


def test_separator_ends_exactly_on_chunk_boundary(spark, tmp_path):
    # 'aaaaaaa;' is exactly 8 bytes: the record after the separator
    # starts exactly at offset 8 == chunk boundary → owned by task 1
    text = "aaaaaaa;bbbbbbb;c"
    recs, _ = chunked_records(spark, tmp_path, text, ";", chunk=8, ov=4)
    assert recs == ["aaaaaaa", "bbbbbbb", "c"]


def test_trailing_leading_interior_empties(spark, tmp_path):
    # leading separator → leading empty kept; interior double
    # separator under a non-greedy-chain RS → interior empty kept;
    # trailing separator → trailing empty dropped
    text = ";a;;b;"
    recs, _ = chunked_records(spark, tmp_path, text, ";", chunk=2, ov=2)
    assert recs == ["", "a", "", "b"]


def test_empty_file(spark, tmp_path):
    recs, n_tasks = chunked_records(spark, tmp_path, "", ";", chunk=8, ov=4)
    assert recs == []
    assert n_tasks <= 1


def test_no_separator_at_all(spark, tmp_path):
    text = "abcdefghij" * 5
    recs, _ = chunked_records(spark, tmp_path, text, ";", chunk=8, ov=4)
    assert recs == [text]


def test_regex_quantifier_rs_across_boundaries(spark, tmp_path):
    # the reference's own regex-RS golden shape: '_[+]?_?'
    text = "a b_+_c d_e f__g h_"
    recs, _ = chunked_records(
        spark, tmp_path, text, "_[+]?_?", chunk=4, ov=4
    )
    assert recs == reference_split("_[+]?_?", text)


def test_anr_order_matches_file_order(spark, tmp_path):
    text = "".join(f"r{i}" + ("; " if i % 3 else " ;; ") for i in range(60))
    f = tmp_path / "ordered.txt"
    f.write_text(text)
    spec = FileSpec(filename=str(f), format="awk", options={"RS": "[; ]+"})
    old = awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES
    awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = 32, 16
    try:
        df = with_record_numbers(records(spark, spec, str(f)))
        rows = df.orderBy("anr").collect()
    finally:
        awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = old
    expected = reference_split("[; ]+", text)
    assert [r["a0"] for r in rows] == expected
    assert [r["anr"] for r in rows] == list(range(1, len(expected) + 1))


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_randomized_geometry_sweep(spark, tmp_path, seed):
    """Randomized separators/records over random chunk geometries must
    match the single-process split exactly."""
    rng = random.Random(seed)
    rs = rng.choice([";", ";+", "[;,]", "END[0-9]?"])
    parts = []
    for i in range(rng.randint(20, 60)):
        parts.append(
            "".join(
                rng.choice("abcdef xyz")
                for _ in range(rng.randint(0, 12))
            )
        )
        sep = {
            ";": ";",
            ";+": ";" * rng.randint(1, 3),
            "[;,]": rng.choice(";,"),
            "END[0-9]?": "END" + rng.choice(["", str(rng.randint(0, 9))]),
        }[rs]
        parts.append(sep)
    if rng.random() < 0.5:
        parts.append("tailrec")
    text = "".join(parts)
    chunk = rng.choice([5, 9, 16, 33])
    recs, _ = chunked_records(
        spark, tmp_path, text, rs, chunk=chunk, ov=max(8, chunk)
    )
    assert recs == reference_split(rs, text), (rs, chunk, text)


def test_glob_input_chunks_per_file_with_continuous_anr(spark, tmp_path):
    """Round-9: glob/directory regex-RS inputs plan through the chunked
    splitter — >1 task per file, ``anr`` continuous ACROSS files in
    lexicographic file order, records never spanning files."""
    texts = [
        "".join(f"f0r{i};;" for i in range(30)),
        "".join(f"f1r{i};;" for i in range(25)) + "tail",
        "lonely",
    ]
    for i, t in enumerate(texts):
        (tmp_path / f"part{i}.txt").write_text(t)
    spec = FileSpec(
        filename=str(tmp_path / "part*.txt"),
        format="awk",
        options={"RS": "[;]+"},
    )
    old = awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES
    awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = 64, 32
    try:
        df = records(spark, spec, str(tmp_path / "part*.txt"))
        n_tasks = df.rdd.getNumPartitions()
        rows = with_record_numbers(df).orderBy("anr").collect()
    finally:
        awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = old
    expected = [r for t in texts for r in reference_split("[;]+", t)]
    assert n_tasks > len(texts), "each multi-chunk file needs >1 task"
    assert [r["a0"] for r in rows] == expected
    assert [r["anr"] for r in rows] == list(range(1, len(expected) + 1))


def test_directory_input_skips_hidden_files(spark, tmp_path):
    d = tmp_path / "indir"
    d.mkdir()
    (d / "b.txt").write_text("b1;;b2")
    (d / "a.txt").write_text("a1;;a2;;")
    (d / "_hidden").write_text("nope;;nope")
    (d / ".dot").write_text("nope")
    spec = FileSpec(filename=str(d), format="awk", options={"RS": ";;"})
    df = records(spark, spec, str(d))
    rows = with_record_numbers(df).orderBy("anr").collect()
    assert [r["a0"] for r in rows] == ["a1", "a2", "b1", "b2"]


def test_chain_longer_than_overlap_back_extends_correctly(spark, tmp_path):
    """A separator chain LONGER than the overlap no longer mis-splits:
    the owner back-extends until the edge-touching match resolves."""
    text = "head" + ";" * 200 + "tail"  # one 200-byte separator run
    recs, n_tasks = chunked_records(
        spark, tmp_path, text, "[;]+", chunk=32, ov=8
    )
    assert n_tasks > 1
    assert recs == reference_split("[;]+", text) == ["head", "tail"]


def test_chain_past_back_max_raises_loudly(spark, tmp_path):
    """Past RS_BACK_MAX the task refuses with the documented error
    instead of mis-splitting."""
    text = "head" + ";" * 300 + "tail"
    f = tmp_path / "pathological.txt"
    f.write_text(text)
    spec = FileSpec(filename=str(f), format="awk", options={"RS": "[;]+"})
    old = awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES, awk.RS_BACK_MAX
    awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES, awk.RS_BACK_MAX = 32, 8, 16
    try:
        df = records(spark, spec, str(f))
        with pytest.raises(Exception, match="RS_BACK_MAX|back-extension"):
            df.collect()
    finally:
        (
            awk.RS_CHUNK_BYTES,
            awk.RS_OVERLAP_BYTES,
            awk.RS_BACK_MAX,
        ) = old


def test_file_uri_drives_chunked_path(spark, tmp_path):
    """A file:// URI (round-10 brief #5) plans byte-range tasks
    through pyarrow.fs instead of the 2 GiB-bounded wholetext
    fallback: >1 task, records identical to the reference split."""
    text = "".join(f"rec{i:04d} v{i}" + ";;" for i in range(200))
    f = tmp_path / "uri_data.txt"
    f.write_text(text)
    uri = f"file://{f}"
    spec = FileSpec(filename=uri, format="awk", options={"RS": "[;]+"})
    old_chunk, old_ov = awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES
    awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = 256, 64
    try:
        df = records(spark, spec, uri)
        n_tasks = df.rdd.getNumPartitions()
        recs = [
            r["a0"]
            for r in with_record_numbers(df).orderBy("anr").collect()
        ]
    finally:
        awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = old_chunk, old_ov
    assert n_tasks > 1, "file:// URI must plan byte-range tasks"
    assert recs == reference_split("[;]+", text)


def test_file_uri_directory_chunks_per_file(spark, tmp_path):
    """A file:// directory URI lists files via pyarrow.fs and plans
    per-file byte ranges with continuous anr across files."""
    d = tmp_path / "urid"
    d.mkdir()
    t1 = "".join(f"a{i} x" + "||" for i in range(60))
    t2 = "".join(f"b{i} y" + "||" for i in range(60))
    (d / "f1.txt").write_text(t1)
    (d / "f2.txt").write_text(t2)
    uri = f"file://{d}"
    spec = FileSpec(filename=uri, format="awk", options={"RS": "[|]+"})
    old_chunk, old_ov = awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES
    awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = 128, 32
    try:
        df = records(spark, spec, uri)
        recs = [
            r["a0"]
            for r in with_record_numbers(df).orderBy("anr").collect()
        ]
    finally:
        awk.RS_CHUNK_BYTES, awk.RS_OVERLAP_BYTES = old_chunk, old_ov
    assert recs == reference_split("[|]+", t1) + reference_split(
        "[|]+", t2
    )
