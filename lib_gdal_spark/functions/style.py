"""OGR feature-style string parsing (the OGR Feature Style Specification
the reference implements in ``core/ogr/ogr_featurestyle.cpp``:
``OGRStyleMgr``/``OGRStyleTool`` — reimplemented from the public spec).

A style string is ``;``-separated tool calls — ``PEN(...)``,
``BRUSH(...)``, ``SYMBOL(...)``, ``LABEL(...)`` — each holding
``,``-separated ``key:value`` params; values may be double-quoted (commas
inside quotes don't split) and may carry a unit suffix
(``px|pt|mm|cm|in|g``, ``OGRStyleTool::GetParam`` unit handling).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

STYLE_TOOLS = ("PEN", "BRUSH", "SYMBOL", "LABEL")
_UNITS = ("px", "pt", "mm", "cm", "in", "g")

_TOOL_RE = re.compile(r"\s*([A-Za-z]+)\s*\(")


def _split_params(body: str) -> list[str]:
    out = []
    depth = 0
    quoted = False
    start = 0
    for i, ch in enumerate(body):
        if ch == '"':
            quoted = not quoted
        elif not quoted:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append(body[start:i])
                start = i + 1
    out.append(body[start:])
    return [p.strip() for p in out if p.strip()]


def split_value_unit(v: str) -> tuple[str, str | None]:
    """'2px' -> ('2', 'px'); quoted strings keep no unit."""
    if v.startswith('"') and v.endswith('"') and len(v) >= 2:
        return v[1:-1], None
    for u in _UNITS:
        if v.endswith(u) and len(v) > len(u):
            head = v[: -len(u)]
            try:
                float(head)
            except ValueError:
                break
            return head, u
    return v, None


def parse_style_string(style: str | None) -> list[dict]:
    """'PEN(c:#FF0000,w:2px);BRUSH(fc:#0000FF)' ->
    [{'tool': 'PEN', 'params': {'c': '#FF0000', 'w': '2'},
      'units': {'w': 'px'}}, ...]. Unknown tools raise (the reference
    warns and skips; loud here so data bugs surface)."""
    if style is None or not style.strip():
        return []
    out = []
    pos = 0
    s = style.strip()
    while pos < len(s):
        m = _TOOL_RE.match(s, pos)
        if not m:
            raise ValueError(f"bad style string at {s[pos:pos + 20]!r}")
        tool = m.group(1).upper()
        if tool not in STYLE_TOOLS:
            raise ValueError(f"unknown style tool {tool!r}")
        # find the matching close paren (quotes can contain parens)
        depth = 1
        quoted = False
        i = m.end()
        while i < len(s) and depth:
            ch = s[i]
            if ch == '"':
                quoted = not quoted
            elif not quoted:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
            i += 1
        body = s[m.end() : i - 1]
        params: dict[str, str] = {}
        units: dict[str, str] = {}
        for p in _split_params(body):
            if ":" not in p:
                raise ValueError(f"bad style param {p!r}")
            k, v = p.split(":", 1)
            val, unit = split_value_unit(v.strip())
            params[k.strip()] = val
            if unit:
                units[k.strip()] = unit
        out.append({"tool": tool, "params": params, "units": units})
        pos = i
        while pos < len(s) and s[pos] in "; \t":
            pos += 1
    return out


_STYLE_SCHEMA = ("array<struct<tool: string, params: map<string, string>, "
                 "units: map<string, string>>>")


def style_tools(col: Column) -> Column:
    """Column form: OGR_STYLE string -> parsed tool array (Arrow-batched)."""

    @F.pandas_udf(_STYLE_SCHEMA)
    def _parse(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else [
                (t["tool"], t["params"], t["units"])
                for t in parse_style_string(v)
            ]
        )

    return _parse(col)
