"""Page-parsing actor stage (SURVEY.md M5–M8) and the link exploder.

One ``map_batches`` actor pool parses each HTML page exactly once and emits a
combined row: normalized url, detected language, extracted text and the
page's outbound links as an Arrow ``list<string>`` column.  Downstream, the
zero-copy :func:`explode_links` turns the list column into an edge table with
``pyarrow.compute`` kernels — no second parse, no Python loop over links.

Reference behaviour replicated (order matters): parse → detect language
(crawler/core.py:275) → optional language filter (``:277-283``, unknown lang
passes) → extract text, which prunes boilerplate (``:100-158``) → extract
links from the PRUNED tree (``:296-310``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..extract import parse_page

PARSED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),          # normalized
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),         # detected (may be null)
        pa.field("links", pa.list_(pa.string())),
        pa.field("indexed", pa.bool_()),
    ]
)


class ExtractPages:
    """Callable-class UDF for ``map_batches(..., concurrency=N)``.

    Stateful so the compiled regexes / selector machinery in
    :mod:`hackathon_pagerank_ray.extract` are imported once per actor;
    per-batch work is the pure parsing loop (HTML parsing is inherently
    per-document — the batch keeps the Arrow columns zero-copy around it).
    """

    def __init__(self, target_lang: str | None = None,
                 max_html_bytes: int = 2_000_000):
        # >2 MB bodies are skipped, matching the crawl gate
        # (crawler/core.py:267-269).
        self.target_lang = target_lang
        self.max_html_bytes = max_html_bytes
        from ..extract import normalize_url  # warm import per actor
        self._normalize_url = normalize_url

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        ts = batch["warc_ts"]

        out_url, out_text, out_lang, out_links, out_indexed = [], [], [], [], []
        keep_ts = []
        for i, (url, html) in enumerate(zip(urls, htmls)):
            if html is None or len(html) > self.max_html_bytes:
                continue
            try:
                html_str = html.decode("utf-8", errors="replace")
            except Exception:
                continue
            try:
                lang, text, links, indexed = parse_page(
                    html_str, url, target_lang=self.target_lang
                )
            except Exception:
                # the stdlib tokenizer hard-rejects some malformed
                # markup (e.g. unknown marked-section keywords raise
                # AssertionError from _markupbase) — at web scale such
                # pages exist and must be SKIPPED like failed fetches
                # (crawler/core.py:260-261 drops failed pages), never
                # allowed to kill the batch task
                continue
            out_url.append(self._normalize_url(url))
            out_text.append(text)
            out_lang.append(lang)
            out_links.append(links)
            out_indexed.append(indexed)
            keep_ts.append(i)

        return pa.Table.from_arrays(
            [
                pa.array(out_url, pa.string()),
                ts.take(pa.array(keep_ts, pa.int64())).combine_chunks()
                if len(keep_ts) else pa.array([], pa.timestamp("us")),
                pa.array(out_text, pa.string()),
                pa.array(out_lang, pa.string()),
                pa.array(out_links, pa.list_(pa.string())),
                pa.array(out_indexed, pa.bool_()),
            ],
            schema=PARSED_SCHEMA,
        )


from functools import lru_cache


@lru_cache(maxsize=4)
def _cached_extractor(target_lang, max_html_bytes):
    """One ExtractPages instance per worker process (task mode)."""
    return ExtractPages(target_lang, max_html_bytes)


def _parse_batch(batch: pa.Table, target_lang, max_html_bytes) -> pa.Table:
    return _cached_extractor(target_lang, max_html_bytes)(batch)


def parse_pages(pages_ds, target_lang: str | None = None, concurrency=None,
                batch_size: int = 256, num_cpus: float = 1.0,
                mode: str = "tasks"):
    """pages Dataset → parsed Dataset (PARSED_SCHEMA).

    ``batch_size`` is small because html rows can be up to 2 MB each.

    ``mode="tasks"`` (default) runs plain ``map_batches`` tasks with a
    per-worker-process cached parser — no pool spin-up (5–17 s on this
    host, serialized through one raylet) and no pool-starves-the-read
    deadlock class.  ``mode="actors"`` keeps the fixed actor pool
    (``concurrency=None`` sizes it to the cluster minus 2 CPUs of
    read-task headroom; Ray's autoscaling (1, N) pools ramp so slowly
    they parse ~10x slower, measured 130 vs 1360 pages/sec — never use
    one).
    """
    if mode == "tasks":
        return pages_ds.map_batches(
            _parse_batch,
            fn_kwargs=dict(target_lang=target_lang,
                           max_html_bytes=2_000_000),
            batch_format="pyarrow", batch_size=batch_size,
            num_cpus=num_cpus)
    if concurrency is None:
        # Leave >=2 CPUs of headroom for the upstream read tasks: a fixed
        # pool that claims EVERY cluster CPU deadlocks when the actors are
        # placed before the 1-CPU ReadParquet tasks get scheduled (actors
        # starve the reads; reads never feed the actors) — observed as a
        # permanent hang at 8 CPUs in a fresh session.
        import ray
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, min(ncpu - 2, 16))
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  num_cpus=num_cpus, concurrency=concurrency)
    return pages_ds.map_batches(ExtractPages,
                                fn_constructor_kwargs={"target_lang": target_lang},
                                **kwargs)


def indexed_docs(parsed_ds):
    """The document table: indexed pages only (lang filter survivors)."""
    return parsed_ds.map_batches(
        lambda t: t.filter(t["indexed"]).select(["url", "warc_ts", "text", "lang"]),
        batch_format="pyarrow",
    )


def explode_links(parsed_ds):
    """(url, links[list]) → edge rows (src_url, dst_url), vectorized.

    Uses ``list_parent_indices`` + ``take`` — the zero-copy Arrow analogue of
    the reference's per-anchor edge append (crawler/core.py:296-310).  Only
    indexed pages emit edges (the reference never expands skipped pages).
    """
    def _explode(t: pa.Table) -> pa.Table:
        t = t.filter(t["indexed"])
        links = t["links"].combine_chunks()
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        parents = pc.list_parent_indices(links)
        src = t["url"].take(parents)
        dst = pc.list_flatten(links)
        return pa.Table.from_arrays([src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src,
                                     dst],
                                    names=["src_url", "dst_url"])

    return parsed_ds.map_batches(_explode, batch_format="pyarrow")
