"""Attribute / schema name sanitization (Avro compatibility).

Reference behavior:
* attribute names strip chars matching ``^[^a-zA-Z_]|(?<!^)[^a-zA-Z0-9_]``
  and raise if the result is empty (utils/RecordConverter.java:69-75,128-140);
* schema *names* replace invalid chars with ``_``
  (utils/SchemaNameAdjuster.java:229-339).

Our lake columns are a fixed 5-column schema so this is a startup assertion
plus a utility for schema-evolution additions; both pure-python (driver-side,
schema not data) with a Spark column variant for bulk renames.
"""

from __future__ import annotations

import re

# Exact regex from RecordConverter.java:133 (java lookbehind syntax is valid re)
_STRIP_RE = re.compile(r"^[^a-zA-Z_]|(?<!^)[^a-zA-Z0-9_]")


def sanitize_attribute_name(name: str) -> str:
    """Strip invalid chars; raise if nothing is left (RecordConverter.java:69-75)."""
    # Single pass, like Java Matcher.replaceAll: "1234" -> "234" (only the
    # first char matches the ^-anchored alternative), not "".
    out = _STRIP_RE.sub("", name)
    if not out:
        raise ValueError(f"Cannot sanitize attribute name '{name}': empty result")
    return out


def adjust_schema_name(name: str) -> str:
    """Avro fullname adjustment: invalid chars -> '_' (SchemaNameAdjuster.java:274-339)."""
    parts = name.split(".")
    fixed = []
    for p in parts:
        if not p:
            fixed.append("_")
            continue
        head = p[0] if (p[0].isalpha() or p[0] == "_") else "_"
        tail = "".join(c if (c.isalnum() or c == "_") else "_" for c in p[1:])
        fixed.append(head + tail)
    return ".".join(fixed)


def sanitize_columns(df):
    """Bulk-rename DataFrame columns through the attribute sanitizer."""
    return df.toDF(*[sanitize_attribute_name(c) for c in df.columns])
