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


# --- SQLite-format dbfile (reference fidelity; tests.tcl:1398-1474) -----


def _dump(path: str) -> str:
    import sqlite3

    con = sqlite3.connect(path)
    try:
        return "\n".join(con.iterdump())
    finally:
        con.close()


def test_sqlite_dbfile_dump_matches_reference(tmp_path):
    """dbfile-1.1: the stored rows and layout match the reference's
    SQLite file byte-for-byte semantics (anr, anf, a0, fields, NULL
    padding)."""
    import re as _re

    db = str(tmp_path / "store.db")
    assert pysqawk("-dbfile", db, "select 0", stdin="a z\n") == "0"
    dump = _dump(db)
    assert _re.search(r"INSERT INTO \"?a\"? VALUES\(1,2,'a z','a','z',NULL", dump)


def test_sqlite_dbfile_append_continues_anr(tmp_path):
    """dbfile-1.3: a second run appends with continuing record
    numbers into the same SQLite table."""
    import re as _re

    db = str(tmp_path / "store.db")
    assert pysqawk("-dbfile", db, "select 0", stdin="?\n") == "0"
    assert pysqawk("-dbfile", db, "select 0", stdin="!\n") == "0"
    dump = _dump(db)
    assert _re.search(r"INSERT INTO \"?a\"? VALUES\(1,1,'\?','\?',NULL", dump)
    assert _re.search(r"INSERT INTO \"?a\"? VALUES\(2,1,'!','!',NULL", dump)


def test_sqlite_dbfile_two_tables(tmp_path):
    """dbfile-1.2: separate runs with different table names coexist."""
    import re as _re

    db = str(tmp_path / "store.db")
    f1 = write(tmp_path, "f1", "?\n")
    f2 = write(tmp_path, "f2", "!\n")
    assert pysqawk("-dbfile", db, "select 0", "table=a", f1) == "0"
    assert pysqawk("-dbfile", db, "select 0", "table=b", f2) == "0"
    dump = _dump(db)
    assert _re.search(r"INSERT INTO \"?a\"? VALUES\(1,1,'\?','\?',NULL", dump)
    assert _re.search(r"INSERT INTO \"?b\"? VALUES\(1,1,'!','!',NULL", dump)


def test_sqlite_dbfile_create_formatting(tmp_path):
    """dbfile-3.1: the CREATE layout (initial columns in the create
    statement, MNF-expanded columns ALTERed in so .dump shows them
    inline) matches the reference's regexp."""
    import re as _re

    db = str(tmp_path / "store.db")
    got = pysqawk(
        "-dbfile", db, "-NF", "2", "select 0",
        stdin="1 foo a\n2 bar b\n3 baz c\n4 qux d e\n5 f g h\n",
    )
    assert got == "0"
    dump = _dump(db)
    pat = (
        r"CREATE TABLE \"?a\"? \(\n    anr INTEGER PRIMARY KEY,\n    "
        r"anf INTEGER,\n    a0 TEXT,\n    a1 INTEGER,\n    a2 TEXT, "
        r"a3 TEXT, a4 TEXT\)"
    )
    assert _re.search(pat, dump), dump[:600]


def test_sqlite_dbfile_noinput_roundtrip(tmp_path):
    """dbfile-2.1 with the SQLite format: a later -noinput run reads
    the persisted table."""
    db = str(tmp_path / "store.db")
    got = pysqawk("-dbfile", db, stdin="hello world\n")
    assert got == ""
    got = pysqawk("-dbfile", db, "-noinput", "select a1, a2 from a")
    assert got == "hello world"
