"""json serializer (reference lib/serializers/json.tcl): one array of
objects (kv=1, default) or arrays (kv=0); all values stringified;
``pretty`` switches to the reference's 4-space ``"k" : "v"`` layout.
Structural output is buffer-free: rows stream out with separators,
and close() writes the closing bracket (the reference does this in
the serializer destructor)."""

from __future__ import annotations

import json as _json

TRUTHY = {"1", "true", "yes", "on"}


class JsonSerializer:
    VALID_OPTIONS = {"kv", "pretty"}

    def __init__(self, out, options: dict[str, str]):
        unknown = set(options) - self.VALID_OPTIONS
        if unknown:
            raise ValueError(
                f"json serializer does not accept options: {sorted(unknown)}"
            )
        self.out = out
        self.kv = options.get("kv", "1").lower() in TRUTHY
        self.pretty = options.get("pretty", "0").lower() in TRUTHY
        self.first = True
        out.write("[")

    def row(self, names: list[str], values: list[str]) -> None:
        if not self.first:
            self.out.write(",")
        self.first = False
        if self.kv:
            if self.pretty:
                body = ",\n".join(
                    f'    {_json.dumps(n)} : {_json.dumps(v)}'
                    for n, v in zip(names, values)
                )
                self.out.write("{\n" + body + "\n}")
            else:
                self.out.write(
                    "{"
                    + ",".join(
                        f"{_json.dumps(n)}:{_json.dumps(v)}"
                        for n, v in zip(names, values)
                    )
                    + "}"
                )
        else:
            self.out.write("[" + ",".join(_json.dumps(v) for v in values) + "]")

    def close(self) -> None:
        self.out.write("]\n")
