"""csv serializer (reference lib/serializers/csv.tcl): tcllib
csv::join semantics — quote only when needed (separator, quote, or
newline present)."""

from __future__ import annotations


class CsvSerializer:
    VALID_OPTIONS: set[str] = set()

    def __init__(self, out, options: dict[str, str]):
        if options:
            raise ValueError(
                f"csv serializer does not accept options: {sorted(options)}"
            )
        self.out = out

    @staticmethod
    def _field(v: str) -> str:
        if any(c in v for c in (",", '"', "\n", "\r")):
            return '"' + v.replace('"', '""') + '"'
        return v

    def row(self, names: list[str], values: list[str]) -> None:
        self.out.write(",".join(self._field(v) for v in values) + "\n")

    def close(self) -> None:
        pass
