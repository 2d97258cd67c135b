"""SQLite type-affinity emulation (SURVEY.md §1.3, §7 phase 2).

The reference stores every field in a SQLite column whose declared type
is only an *affinity*; a single column holds mixed runtime types
(`"001"` under INTEGER affinity becomes integer 1, `"c"` in the same
column stays text — reference tests.tcl:1066-1072).

Spark columns are homogeneously typed, so fields are stored as
**canonicalized strings**: the affinity rules are applied at load time
as pure column expressions, producing the display form SQLite would
print. Numeric behavior in queries then comes from Spark's implicit
string→numeric coercion in comparisons/arithmetic.

Known conscious divergence (documented, not silently wrong): SQLite's
cross-type ORDER: NULL < numbers < text < blob. A query like
``'c' > 10000`` is TRUE in SQLite, NULL (row dropped) here. None of
the reference's own tests exercise it.

Affinity canonicalization per SQLite rules:
- INTEGER/NUMERIC: integer-looking text → canonical integer ("001"→"1",
  "+7"→"7"); real-looking text with integral value → integer ("1.0"→"1");
  other real-looking → real; everything else verbatim.
- REAL: numeric text → real display ("001"→"1.0", "1.5"→"1.5");
  everything else verbatim.
- TEXT (and the a0 column): verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INT_RE = r"^[+-]?\d+$"
REAL_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"

AFFINITIES = ("integer", "real", "text", "numeric", "int", "blob")


def normalize_affinity(decl: str) -> str:
    """SQLite's affinity-from-declared-type rule, §3.1 of its docs:
    contains INT → INTEGER; CHAR/CLOB/TEXT → TEXT; BLOB → BLOB;
    REAL/FLOA/DOUB → REAL; else NUMERIC."""
    d = decl.strip().lower()
    # `a1 null` parses as a nullability constraint in SQLite, not a
    # type ⇒ no affinity at all (verbatim storage) — verified against
    # SQLite and the reference's datatypes-1.4 golden
    if d in ("", "null", "none"):
        return "blob"
    if "int" in d:
        return "integer"
    if "char" in d or "clob" in d or "text" in d:
        return "text"
    if "blob" in d:
        return "blob"
    if "real" in d or "floa" in d or "doub" in d:
        return "real"
    return "numeric"


def apply_affinity(col: Column, affinity: str) -> Column:
    """Canonicalize a raw text field per its column affinity."""
    affinity = normalize_affinity(affinity)
    if affinity in ("text", "blob"):
        return col

    # SQLite's "looks like a number" check ignores surrounding ASCII
    # whitespace (' 2 ' under INTEGER affinity stores integer 2);
    # non-numeric text keeps its whitespace verbatim
    t = F.regexp_replace(col, r"^\s+|\s+$", "")
    is_int = t.rlike(INT_RE)
    is_real = t.rlike(REAL_RE)
    d = t.cast("double")

    if affinity == "real":
        integral = (d == F.floor(d)) & (F.abs(d) < 1e15)
        real_str = F.when(
            integral, F.concat(d.cast("long").cast("string"), F.lit(".0"))
        ).otherwise(d.cast("string"))
        return F.when(is_int | is_real, real_str).otherwise(col)

    # integer / numeric: lossless-integral → integer form, else real
    integral = (d == F.floor(d)) & (F.abs(d) < 9.007199254740992e15)
    long_form = t.try_cast("long").cast("string")
    as_int = d.cast("long").cast("string")
    as_real = d.cast("string")
    return (
        # int-looking text that overflows int64 falls through to real,
        # matching SQLite's lossless-only integer conversion
        F.when(is_int & long_form.isNotNull(), long_form)
        .when(is_real & integral, as_int)
        .when(is_real, as_real)
        .when(is_int, as_real)
        .otherwise(col)
    )
