"""awk serializer (default): OFS-joined values, ORS-terminated records
(reference lib/serializers/awk.tcl:16-30)."""

from __future__ import annotations


class AwkSerializer:
    VALID_OPTIONS = {"ofs", "ors"}

    def __init__(self, out, options: dict[str, str]):
        unknown = set(options) - self.VALID_OPTIONS
        if unknown:
            raise ValueError(
                f"awk serializer does not accept options: {sorted(unknown)}"
            )
        self.out = out
        self.ofs = options.get("ofs", " ")
        self.ors = options.get("ors", "\n")

    def row(self, names: list[str], values: list[str]) -> None:
        self.out.write(self.ofs.join(values) + self.ors)

    def close(self) -> None:
        pass
