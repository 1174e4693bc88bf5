"""Standalone URL-column operators (SURVEY.md M1–M4, M11).

The extraction actor applies these inline; the standalone stages exist so
url-shaped tables can be normalized/filtered without re-parsing HTML.
``urllib.parse`` has no Arrow kernel, so the per-value loop runs inside
``map_batches`` on the compiled fast path (the reference does the identical
per-url work, crawler/core.py:39-60).
"""

from __future__ import annotations

import pyarrow as pa

from ..extract import get_base_domain, is_same_domain, normalize_url


def normalize_url_column(ds, col: str = "url", out_col: str | None = None):
    """M1: vectorize ``normalize_url`` over a column."""
    out_col = out_col or col

    def _norm(t: pa.Table) -> pa.Table:
        vals = pa.array([normalize_url(u) if u is not None else None
                         for u in t[col].to_pylist()], pa.string())
        if out_col in t.schema.names:
            return t.set_column(t.schema.get_field_index(out_col), out_col, vals)
        return t.append_column(out_col, vals)

    return ds.map_batches(_norm, batch_format="pyarrow")


def add_base_domain(ds, col: str = "url", out_col: str = "base_domain"):
    """M2 as a column: last-two-label heuristic of the url's host."""
    from urllib.parse import urlparse

    def _bd(t: pa.Table) -> pa.Table:
        vals = pa.array([
            get_base_domain(urlparse(u).netloc.lower()) if u else None
            for u in t[col].to_pylist()], pa.string())
        return t.append_column(out_col, vals)

    return ds.map_batches(_bd, batch_format="pyarrow")


def filter_same_domain(ds, base_domain: str, col: str = "url"):
    """M3: keep rows whose url shares ``base_domain``."""
    def _keep(t: pa.Table) -> pa.Table:
        mask = pa.array([bool(u) and is_same_domain(u, base_domain)
                         for u in t[col].to_pylist()], pa.bool_())
        return t.filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow")


def filter_schemes(ds, col: str = "url",
                   drop_prefixes: tuple = ("mailto:", "javascript:")):
    """M4: drop non-navigable scheme targets."""
    def _keep(t: pa.Table) -> pa.Table:
        mask = pa.array([bool(u) and not u.startswith(drop_prefixes)
                         for u in t[col].to_pylist()], pa.bool_())
        return t.filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow")


def validate_http_urls(ds, col: str = "url"):
    """M11: keep only http(s) urls (api/main.py:234-236)."""
    def _keep(t: pa.Table) -> pa.Table:
        mask = pa.array([bool(u) and (u.startswith("http://")
                                      or u.startswith("https://"))
                         for u in t[col].to_pylist()], pa.bool_())
        return t.filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow")
