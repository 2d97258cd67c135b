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

SQLite's cross-type ordering (NULL < numbers < text < blob,
datatype3.html §4.1) is reproduced at query time: every loaded column
records its storage treatment in :data:`COLUMN_CLASSES`, and the
dialect layer rewrites comparisons / ORDER BY / min-max over columns
that can hold mixed storage classes onto an order-preserving struct
key (``sqlite_key_sql``) whose Spark struct comparison IS the SQLite
value order. Property-tested against real SQLite in
tests/test_affinity_property.py. Residual divergence: numeric
comparisons go through DOUBLE, so two distinct integers that collapse
to the same double (|v| > 2^53) compare equal cross-class; and
operands the dialect cannot classify (function calls, arithmetic)
keep Spark coercion.

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


# ---------------------------------------------------------------------
# Storage-treatment catalog: how each loaded column's values are held,
# which decides its SQLite comparison behavior (datatype3.html §4).
#
#   'long'    — promoted to LongType; every value is numeric class
#   'dynamic' — numeric-affinity canonicalized string; a value's
#               storage class is numeric iff it looks numeric
#   'text'    — TEXT affinity; every value is text class, and TEXT
#               affinity converts an affinity-less other operand
#   'none'    — no affinity (blob decl / bare NULL decl / a0 raw
#               record); every value is text class, converts nothing
#
# sqawk column names are globally unique (each file gets its own
# prefix: a1.., b1..), so one flat map keyed by lowercase name serves
# every statement; a resident session's next CLI run re-records its
# tables over the old entries.
COLUMN_CLASSES: dict[str, str] = {}


def record_column_class(name: str, cls: str) -> None:
    COLUMN_CLASSES[name.lower()] = cls


def column_class_for(decl: str, promoted: bool) -> str:
    """Storage treatment for a field column declared ``decl``."""
    if promoted:
        return "long"
    aff = normalize_affinity(decl)
    if aff == "text":
        return "text"
    if aff == "blob":
        return "none"
    return "dynamic"


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
        # fixed-point "N.0" for every integral double below 1e16 —
        # the exact window where CPython/SQLite float repr stays
        # fixed-point (repr(9007199254740992.0) = '9007199254740992.0'
        # but repr(1e16) = '1e+16'); long-cast is exact there
        integral = (d == F.floor(d)) & (F.abs(d) < 1e16)
        real_str = F.when(
            integral, F.concat(d.cast("long").cast("string"), F.lit(".0"))
        ).otherwise(d.cast("string"))
        return F.when(is_int | is_real, real_str).otherwise(col)

    # integer / numeric: lossless-integral → integer form, else real.
    # SQLite's rule is a lossless ROUND-TRIP within int64 (not a 2^53
    # window): real-looking text whose double is integral and survives
    # double→int64→double unchanged stores as INTEGER
    li = d.try_cast("long")  # NULL on overflow (ANSI-safe)
    integral = li.isNotNull() & (li.cast("double") == d)
    long_form = t.try_cast("long").cast("string")
    as_int = li.cast("string")
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
