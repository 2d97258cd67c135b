"""fields= mapping goldens (reference tests.tcl:329-503): ranges merge
fields with their ORIGINAL separators preserved; `auto` appends the
remaining fields as individual columns; out-of-range ranges yield an
empty field."""

from __future__ import annotations

from tests.test_cli import pysqawk, write


def test_merge_fields(tmp_path):
    # field-mapping-3.1
    f = write(tmp_path, "f", "foo 1   foo 2   foo 3\nbar    4 bar    5 bar    6\n")
    got = pysqawk(
        "-OFS", "-", "select a1, a2, a3 from a", "fields=1-2,3-4,5-6", f
    )
    assert got == "foo 1-foo 2-foo 3\nbar    4-bar    5-bar    6"


def test_skip_fields(tmp_path):
    # field-mapping-3.2
    f = write(tmp_path, "f", "foo 1   foo 2   foo 3\nbar    4 bar    5 bar    6\n")
    got = pysqawk("-OFS", "-", "select a1, a2 from a", "fields=3,6", f)
    assert got == "foo-3\nbar-6"


def test_skip_and_merge(tmp_path):
    # field-mapping-3.3
    f = write(tmp_path, "f", "foo 1   foo 2   foo 3\nbar    4 bar    5 bar    6\n")
    got = pysqawk("-OFS", "-", "select a1, a2 from a", "fields=1-2,5-6", f)
    assert got == "foo 1-foo 3\nbar    4-bar    6"


def test_range_open_end(tmp_path):
    # field-mapping-2.1/2.2 {1 end}: merge through the last field,
    # including a record-ending separator (it precedes the trailing
    # empty field that sepsplit produces)
    f = write(tmp_path, "f", "startABfooABbar\nstartABfooABbarAB\n")
    got = pysqawk("-OFS", "|", "select a1 from a", "FS=AB", "fields=1-end", f)
    assert got == "startABfooABbar\nstartABfooABbarAB"


def test_range_out_of_bounds(tmp_path):
    # field-mapping-2.1 {4 5} on a 3-field record → one empty field
    f = write(tmp_path, "f", "startABfooABbar\n")
    got = pysqawk(
        "-OFS", "|", "select a1, a2 from a", "FS=AB", "fields=4-5,1", f
    )
    assert got == "|start"


def test_range_merge_middle(tmp_path):
    # field-mapping-2.1 {{1 1} {2 3} {3 3}} → start, fooABbar, bar
    f = write(tmp_path, "f", "startABfooABbar\n")
    got = pysqawk(
        "-OFS", "|", "select a1, a2, a3 from a", "FS=AB", "fields=1,2-3,3", f
    )
    assert got == "start|fooABbar|bar"


def test_auto_after_ranges(tmp_path):
    # field-mapping-2.3 {{1 1} auto} → each remaining field its own col
    f = write(tmp_path, "f", "startABfooABbar\n")
    got = pysqawk(
        "-OFS", "|", "select a1, a2, a3 from a", "FS=AB", "fields=1,auto", f
    )
    assert got == "start|foo|bar"


def test_auto_only(tmp_path):
    f = write(tmp_path, "f", "startABfooABbar\n")
    got = pysqawk(
        "-OFS", "|", "select a1, a2, a3 from a", "FS=AB", "fields=auto", f
    )
    assert got == "start|foo|bar"
