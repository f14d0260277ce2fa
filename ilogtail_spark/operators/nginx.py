"""nginx stub_status page parsing.

Reference: ``plugins/input/nginx/input_nginx.go:120-170`` — the HTTP
transport collapses to "read a table" per the north star; the PARSE
of the 4-line stub_status page is the liftable semantics:

    Active connections: 291
    server accepts handled requests
     16630948 16630948 31070465
    Reading: 6 Writing: 179 Waiting: 106

All seven fields are emitted as STRINGS (the reference keeps them as
the raw tokens in a ``map[string]string``). Malformed pages yield
NULL fields rather than task failure. One codegen pass, zero
shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACTIVE_RE = r"Active connections:\s*(\d+)"
# the line AFTER the 'server accepts handled requests' header
_AHR_RE = r"server accepts handled requests\s*\n\s*(\d+)\s+(\d+)\s+(\d+)"
_RWW_RE = r"Reading:\s*(\d+)\s+Writing:\s*(\d+)\s+Waiting:\s*(\d+)"


def nginx_status_parse(df: DataFrame, source_col: str = "page") -> DataFrame:
    """Parse a stub_status page column into the reference's seven
    fields (input_nginx.go:160-168): active, accepts, handled,
    requests, reading, writing, waiting — raw numeric tokens as
    strings. Empty extraction (page malformed) -> NULL.

    Each pattern runs ONCE per row: the raw extracts materialize in
    their own projection (branch subexpressions are not deduplicated
    by codegen) and nullif — not a when/otherwise that re-evaluates
    the extract — maps '' to NULL."""
    page = F.col(source_col)
    raw = {
        "_act": F.regexp_extract(page, _ACTIVE_RE, 1),
        "_ahr1": F.regexp_extract(page, _AHR_RE, 1),
        "_ahr2": F.regexp_extract(page, _AHR_RE, 2),
        "_ahr3": F.regexp_extract(page, _AHR_RE, 3),
        "_rww1": F.regexp_extract(page, _RWW_RE, 1),
        "_rww2": F.regexp_extract(page, _RWW_RE, 2),
        "_rww3": F.regexp_extract(page, _RWW_RE, 3),
    }
    out = df.withColumns(raw)
    names = ["active", "accepts", "handled", "requests",
             "reading", "writing", "waiting"]
    return out.withColumns(
        {n: F.nullif(F.col(c), F.lit("")) for n, c in zip(names, raw)}
    ).drop(*raw)
