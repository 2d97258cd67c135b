"""-dbfile persistence (reference tests.tcl:1398-1458, functional
analog: parquet-backed tables instead of a SQLite file)."""

from __future__ import annotations

from tests.test_cli import pysqawk, write


def test_dbfile_roundtrip(tmp_path):
    db = str(tmp_path / "db")
    f = write(tmp_path, "f", "1 a\n2 b\n")
    # run 1: load and persist
    assert pysqawk("-dbfile", db, "select a1 from a", f) == "1\n2"
    # run 2: no input files, query the durable table
    got = pysqawk("-dbfile", db, "-noinput", "select anr, a1, a2 from a")
    assert got == "1 1 a\n2 2 b"


def test_dbfile_append_continues_anr(tmp_path):
    db = str(tmp_path / "db")
    f1 = write(tmp_path, "f1", "a\nb\n")
    f2 = write(tmp_path, "f2", "c\nd\n")
    assert pysqawk("-dbfile", db, "select a1 from a", f1) == "a\nb"
    got = pysqawk(
        "-dbfile", db, "select anr, a1 from a order by anr", f2
    )
    assert got == "1 a\n2 b\n3 c\n4 d"


def test_dbfile_scriptless_load(tmp_path):
    """dbfile-2.1 (tests.tcl:1452-1458): flags with no script = empty
    script — files load into the store, nothing runs or prints."""
    db = str(tmp_path / "db")
    got = pysqawk("-dbfile", db, stdin="hello world\n")
    assert got == ""
    got = pysqawk("-dbfile", db, "-noinput", "select a1, a2 from a")
    assert got == "hello world"
