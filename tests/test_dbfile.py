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


# --- DML mutations persist to the store (ADVICE r03 medium) -------------


def test_dml_mutations_persist_to_parquet_dbfile(tmp_path):
    db = str(tmp_path / "db")
    f = write(tmp_path, "f", "1 10\n2 20\n")
    got = pysqawk(
        "-dbfile",
        db,
        "insert into a (a1, a2) values (3, 30);"
        " update a set a2 = 99 where a1 = 1;"
        " select a1, a2 from a order by a1",
        f,
    )
    assert got == "1 99\n2 20\n3 30"
    # run 2: the mutations survived in the store
    got = pysqawk(
        "-dbfile", db, "-noinput", "select a1, a2 from a order by a1"
    )
    assert got == "1 99\n2 20\n3 30"


def test_dml_mutations_persist_to_sqlite_dbfile(tmp_path):
    import sqlite3

    db = str(tmp_path / "store.db")
    f = write(tmp_path, "f", "1 10\n2 20\n")
    pysqawk(
        "-dbfile",
        db,
        "insert into a (a1, a2) values (3, 30);"
        " delete from a where a1 = 2;"
        " select a1 from a",
        f,
    )
    con = sqlite3.connect(db)
    rows = con.execute("select a1, a2 from a order by a1").fetchall()
    con.close()
    assert rows == [(1, 10), (3, 30)]
    # and the next run sees the same state
    got = pysqawk(
        "-dbfile", db, "-noinput", "select a1, a2 from a order by a1"
    )
    assert got == "1 10\n3 30"


def test_dml_drop_table_removes_from_store(tmp_path):
    import sqlite3

    db = str(tmp_path / "store.db")
    f = write(tmp_path, "f", "1\n")
    pysqawk("-dbfile", db, "drop table a; select 0", f)
    con = sqlite3.connect(db)
    names = [
        r[0]
        for r in con.execute(
            "select name from sqlite_master where type='table'"
        )
    ]
    con.close()
    assert "a" not in names


def test_dml_create_table_as_persists(tmp_path):
    db = str(tmp_path / "db")
    f = write(tmp_path, "f", "1 10\n2 20\n")
    pysqawk(
        "-dbfile",
        db,
        "create table b as select a1, a2 + 1 as a2x from a; select 0",
        f,
    )
    got = pysqawk(
        "-dbfile", db, "-noinput", "select a1, a2x from b order by a1"
    )
    assert got == "1 11\n2 21"


def test_insert_unknown_column_errors(tmp_path):
    """SQLite: 'table a has no column named nope' — previously the
    misnamed column's values vanished silently (ADVICE r03 low)."""
    import pytest

    f = write(tmp_path, "f", "1 10\n")
    with pytest.raises(ValueError, match="no column named"):
        pysqawk(
            "insert into a (a1, nope) values (9, 9); select a1 from a", f
        )
