"""tcl serializer (reference lib/serializers/tcl.tcl): a Tcl list of
lists (default) or list of dicts (kv=1); ``pretty`` puts one element
per line."""

from __future__ import annotations

TRUTHY = {"1", "true", "yes", "on"}

_SPECIAL = set(' \t\n\r{}"\\[]$;')


def tcl_quote(s: str) -> str:
    """Quote a string as a Tcl list element (brace form, like Tcl's
    own list command output for strings with special characters)."""
    if s == "":
        return "{}"
    if not any(c in _SPECIAL for c in s):
        return s
    # brace-quotable unless braces are unbalanced or trailing backslash
    depth = 0
    balanced = True
    for c in s:
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth < 0:
                balanced = False
                break
    if balanced and depth == 0 and not s.endswith("\\"):
        return "{" + s + "}"
    out = []
    for c in s:
        if c in _SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def tcl_list(items: list[str]) -> str:
    return " ".join(tcl_quote(i) for i in items)


class TclSerializer:
    VALID_OPTIONS = {"kv", "pretty"}

    def __init__(self, out, options: dict[str, str]):
        unknown = set(options) - self.VALID_OPTIONS
        if unknown:
            raise ValueError(
                f"tcl serializer does not accept options: {sorted(unknown)}"
            )
        self.out = out
        self.kv = options.get("kv", "0").lower() in TRUTHY
        self.pretty = options.get("pretty", "0").lower() in TRUTHY
        self.rows: list[str] = []

    def row(self, names: list[str], values: list[str]) -> None:
        if self.kv:
            flat: list[str] = []
            for n, v in zip(names, values):
                flat.append(n)
                flat.append(v)
            self.rows.append(tcl_list(flat))
        else:
            self.rows.append(tcl_list(values))

    def close(self) -> None:
        # each row is itself a list element of the outer list
        quoted = [tcl_quote_row(r) for r in self.rows]
        if self.pretty:
            self.out.write("\n".join(quoted) + "\n")
        else:
            self.out.write(" ".join(quoted) + "\n")


def tcl_quote_row(row: str) -> str:
    """A row (already a Tcl list string) as an element of the outer
    list: brace it when it contains spaces/specials."""
    return tcl_quote(row) if row else "{}"
