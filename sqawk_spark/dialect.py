"""SQLite-dialect SQL rewrites applied before handing statements to
Spark SQL.

The reference passes scripts verbatim to SQLite (lib/classes/
sqawk.tcl:216), so the whole SQLite grammar is reachable. Almost all
of it is valid Spark SQL too; the gaps this module closes:

- infix ``GLOB``: ``X GLOB Y`` / ``X NOT GLOB Y`` is SQLite-only
  syntax (equivalent to ``glob(Y, X)``, which we register as a UDF in
  functions/__init__.py). Rewritten to the function form.
- two-argument ``group_concat(X, SEP)``: Spark UDF registration is
  fixed-arity, so the one-arg form is registered as ``group_concat``
  and the two-arg form as ``group_concat2``; this rewrite maps call
  sites with two top-level arguments onto the latter.
- double-quoted identifiers: SQLite resolves ``"name"`` as a column
  when it exists, else a string literal (quirks.html#dblquote, relied
  on by reference test header-1.2); with the loaded schemas in hand
  the same fallback is applied here.

Both rewrites are quote-aware (single/double/backtick quoting with
SQL '' escaping) and operate on token boundaries only. The GLOB
operand grammar covers the practical cases — identifiers (dotted,
backtick-quoted), literals, function calls, and parenthesized
expressions — matching how the operator appears in real scripts;
SQLite gives GLOB comparison-level precedence, so its operands are
primaries in practice.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"[A-Za-z_0-9$.]")


def _scan_string(s: str, i: int) -> int:
    """Index one past a quoted token starting at s[i] (quote char at
    s[i]); honors doubled-quote escaping."""
    q = s[i]
    i += 1
    n = len(s)
    while i < n:
        if s[i] == q:
            if i + 1 < n and s[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    return n


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _match_paren_fwd(s: str, i: int) -> int:
    """s[i] == '(' → index one past the balanced close paren."""
    depth = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            i = _scan_string(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return n


def _operand_fwd(s: str, i: int) -> int:
    """End index of one primary expression starting at s[i]."""
    i = _skip_ws(s, i)
    n = len(s)
    if i >= n:
        return i
    c = s[i]
    if c in "'\"`":
        return _scan_string(s, i)
    if c == "(":
        return _match_paren_fwd(s, i)
    if c in "+-":  # signed number
        return _operand_fwd(s, i + 1)
    j = i
    while j < n and _IDENT.match(s[j]):
        j += 1
    # function call?
    k = _skip_ws(s, j)
    if k < n and s[k] == "(" and j > i:
        return _match_paren_fwd(s, k)
    return j


def _operand_back(s: str, i: int) -> int:
    """Start index of one primary expression ending just before s[i]
    (exclusive end). Returns the start index."""
    j = i - 1
    while j >= 0 and s[j].isspace():
        j -= 1
    if j < 0:
        return 0
    c = s[j]
    if c in "'\"`":
        # scan back to the opening quote (no robust reverse handling of
        # doubled quotes; adequate for literal patterns)
        k = j - 1
        while k >= 0 and s[k] != c:
            k -= 1
        return max(k, 0)
    if c == ")":
        depth = 0
        k = j
        while k >= 0:
            if s[k] == ")":
                depth += 1
            elif s[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        # include a function name directly before the open paren —
        # unless it's a keyword (``select (a1)`` is not a call)
        m = k - 1
        while m >= 0 and s[m].isspace():
            m -= 1
        e = m
        while m >= 0 and _IDENT.match(s[m]):
            m -= 1
        if m < e and s[m + 1 : e + 1].lower() not in _KEYWORDS:
            return m + 1
        return max(k, 0)
    k = j
    while k >= 0 and _IDENT.match(s[k]):
        k -= 1
    return k + 1


_GLOB_RE = re.compile(r"\bglob\b", re.IGNORECASE)

# a bare keyword before GLOB means the name is being used as a
# function call (``select glob('p', x)``), not an infix operand
_KEYWORDS = {
    "select", "where", "and", "or", "not", "on", "when", "then",
    "else", "end", "case", "having", "join", "like", "in", "is",
    "from", "as", "all", "distinct", "union", "intersect", "except",
    "limit", "offset", "order", "group", "by", "desc", "asc", "set",
    "values", "between", "exists",
}


def rewrite_glob(stmt: str) -> str:
    """``X GLOB Y`` → ``glob(Y, X)``; ``X NOT GLOB Y`` → ``NOT
    glob(Y, X)`` (SQLite expr grammar; the glob() UDF applies SQLite's
    case-sensitive * ? [...] matching). Infix vs function call is
    decided by the LEFT context: a real operand (identifier, literal,
    closed paren) means infix; a keyword, comma, or nothing means the
    registered glob() function, left alone."""
    while True:
        m = None
        repl_range = None
        for cand in _GLOB_RE.finditer(stmt):
            if _in_quotes(stmt, cand.start()):
                continue
            # NOT between left operand and GLOB belongs to the operator
            lstart = _operand_back(stmt, cand.start())
            inner = stmt[lstart : cand.start()].strip()
            negate = inner.lower() == "not"
            if negate:
                lstart = _operand_back(stmt, lstart)
                inner = re.sub(
                    r"\bnot\s*$", "", stmt[lstart : cand.start()],
                    flags=re.IGNORECASE,
                ).strip()
            if not inner or inner.lower() in _KEYWORDS:
                continue  # function-call position
            m = cand
            repl_range = (lstart, inner, negate)
            break
        if m is None:
            return stmt
        lstart, left, negate = repl_range
        rend = _operand_fwd(stmt, m.end())
        right = stmt[m.end() : rend].strip()
        repl = f"glob({right}, {left})"
        if negate:
            repl = "NOT " + repl
        stmt = stmt[:lstart] + repl + stmt[rend:]


def _in_quotes(s: str, pos: int) -> bool:
    i = 0
    while i < pos:
        if s[i] in "'\"`":
            i = _scan_string(s, i)
            if i > pos:
                return True
            continue
        i += 1
    return False


_GC_RE = re.compile(r"\bgroup_concat\s*\(", re.IGNORECASE)


def rewrite_group_concat(stmt: str) -> str:
    """Two-argument ``group_concat(X, SEP)`` → ``group_concat2(X,
    SEP)`` (fixed-arity UDF registration; SQLite overloads the name)."""
    out = []
    last = 0
    for m in _GC_RE.finditer(stmt):
        if _in_quotes(stmt, m.start()):
            continue
        if m.start() > 0 and _IDENT.match(stmt[m.start() - 1]):
            continue  # suffix of a longer identifier
        open_paren = m.end() - 1
        close = _match_paren_fwd(stmt, open_paren)
        # count top-level commas inside the call
        depth = 0
        commas = 0
        i = open_paren
        while i < close:
            c = stmt[i]
            if c in "'\"`":
                i = _scan_string(stmt, i)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                commas += 1
            i += 1
        if commas == 1:
            out.append(stmt[last : m.start()])
            out.append("group_concat2(")
            last = m.end()
    out.append(stmt[last:])
    return "".join(out)


def rewrite_double_quoted_idents(stmt: str, columns: set[str]) -> str:
    """SQLite's misfeature, reproduced deliberately: a double-quoted
    token is an identifier when it resolves to a column, else a string
    literal (www.sqlite.org/quirks.html#dblquote; the reference's
    header-1.2 test depends on it). Spark with ANSI off always reads
    ``"..."`` as a literal, so rewrite resolvable ones to backtick
    quoting. Only exact matches against loaded-table column names flip
    — anything else stays a literal, same as SQLite."""
    out = []
    i, n = 0, len(stmt)
    while i < n:
        c = stmt[i]
        if c in "'`":
            j = _scan_string(stmt, i)
            out.append(stmt[i:j])
            i = j
            continue
        if c == '"':
            j = _scan_string(stmt, i)
            inner = stmt[i + 1 : j - 1].replace('""', '"')
            if inner in columns:
                out.append("`" + inner + "`")
            else:
                out.append(stmt[i:j])
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def rewrite_statement(stmt: str, columns: set[str] | None = None) -> str:
    stmt = rewrite_group_concat(rewrite_glob(stmt))
    if columns:
        stmt = rewrite_double_quoted_idents(stmt, columns)
    return stmt
