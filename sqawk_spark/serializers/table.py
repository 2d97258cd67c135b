"""table serializer (reference lib/serializers/table.tcl +
lib/tabulate.tcl): buffers all rows, renders a box table at close.

Behavior pinned by the reference goldens (tests.tcl:831-944,
1496-1656):
- a rule line between EVERY pair of rows, not just after a header;
- default alignment: center, extra space to the RIGHT on odd leftover;
- ``align``/``alignments`` (synonyms, error if both) accept
  ``left|center|right`` or ``l|c|r`` per column;
- ``margins=N`` pads cells with N spaces each side;
- ``style=default`` Unicode box drawing, ``style=loFi`` ASCII +/-/|;
- CJK fullwidth/wide characters count as 2 columns.
"""

from __future__ import annotations

import unicodedata

STYLES = {
    "default": {
        "top": ("┌", "┬", "┐"),
        "mid": ("├", "┼", "┤"),
        "bot": ("└", "┴", "┘"),
        "h": "─",
        "v": "│",
    },
    "loFi": {
        "top": ("+", "+", "+"),
        "mid": ("+", "+", "+"),
        "bot": ("+", "+", "+"),
        "h": "-",
        "v": "|",
    },
}

ALIGN_NAMES = {
    "left": "left",
    "l": "left",
    "center": "center",
    "c": "center",
    "centre": "center",
    "right": "right",
    "r": "right",
}


def display_width(s: str) -> int:
    """CJK-aware display width (reference lib/tabulate.tcl:8-158)."""
    return sum(2 if unicodedata.east_asian_width(c) in ("W", "F") else 1 for c in s)


def pad(s: str, width: int, align: str) -> str:
    gap = width - display_width(s)
    if gap <= 0:
        return s
    if align == "left":
        return s + " " * gap
    if align == "right":
        return " " * gap + s
    left = gap // 2
    return " " * left + s + " " * (gap - left)


class TableSerializer:
    VALID_OPTIONS = {"align", "alignments", "margins", "style"}

    def __init__(self, out, options: dict[str, str]):
        unknown = set(options) - self.VALID_OPTIONS
        if unknown:
            raise ValueError(
                f"table serializer does not accept options: {sorted(unknown)}"
            )
        if "align" in options and "alignments" in options:
            # message parity with lib/serializers/table.tcl
            # (reference test output-4.5)
            raise ValueError(
                'can\'t use synonym options "align" and "alignments"'
                " together"
            )
        self.out = out
        align_spec = options.get("align", options.get("alignments", ""))
        self.aligns = [
            ALIGN_NAMES[a] for a in align_spec.split()
        ] if align_spec else []
        self.margins = int(options.get("margins", "0"))
        style = options.get("style", "default")
        if style not in STYLES:
            raise ValueError(f"unknown table style: {style!r}")
        self.style = STYLES[style]
        self.rows: list[list[str]] = []

    def row(self, names: list[str], values: list[str]) -> None:
        self.rows.append(list(values))

    def _align(self, i: int) -> str:
        return self.aligns[i] if i < len(self.aligns) else "center"

    def close(self) -> None:
        if not self.rows:
            return
        ncols = max(len(r) for r in self.rows)
        widths = [0] * ncols
        for r in self.rows:
            for i, v in enumerate(r):
                widths[i] = max(widths[i], display_width(v))
        widths = [w + 2 * self.margins for w in widths]
        st = self.style

        def rule(kind: str) -> str:
            lft, mid, rgt = st[kind]
            return lft + mid.join(st["h"] * w for w in widths) + rgt

        margin = " " * self.margins
        lines = [rule("top")]
        for ri, r in enumerate(self.rows):
            if ri:
                lines.append(rule("mid"))
            cells = []
            for i in range(ncols):
                v = r[i] if i < len(r) else ""
                inner = margin + v + margin
                cells.append(pad(inner, widths[i], self._align(i)))
            lines.append(st["v"] + st["v"].join(cells) + st["v"])
        lines.append(rule("bot"))
        self.out.write("\n".join(lines) + "\n")
