"""Deterministic synthetic fixtures (FIXTURES.md F1/F2).

Everything here is seeded and wall-clock-free.  The page corpus matches the
``BASELINE.json`` input hint schema exactly:

    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

and is adversarial on purpose: boilerplate blocks exercising all 18
decompose selectors (crawler/core.py:112-134), rotating main-region layouts
(crawler/core.py:137-153), link soup with relative / absolute / subdomain /
mixed-case / fragment / trailing-slash / off-domain / mailto / javascript
targets (crawler/core.py:296-310), preferential-attachment hubs (skew),
dangling pages, duplicate url variants with shorter bodies (D3 dedup), and
missing-language pages (crawler/core.py:277-283 keeps them).

The ``text`` column is produced by this repo's own oracle extractor
(:mod:`hackathon_pagerank_ray.extract`), so the corpus is self-consistent
with the per-row byte-identity invariant.
"""

from __future__ import annotations

import datetime
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_text, normalize_url
from .html_dom import parse_html

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

EDGES_SCHEMA = pa.schema([pa.field("src", pa.int64()), pa.field("dst", pa.int64())])

_EPOCH = datetime.datetime(2025, 1, 1)

_WORDS = (
    "graph rank vertex edge crawl corpus shard batch arrow stream engine "
    "partition shuffle actor block spill cluster damping residual sweep "
    "convergence lattice beacon harbor meadow quartz ember violet summit "
    "anchor breeze canyon delta ember fjord glacier horizon inlet juniper"
).split()

_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "on", "for")


def _sentence(rng: random.Random, n: int) -> str:
    words = []
    for _ in range(n):
        if rng.random() < 0.3:
            words.append(rng.choice(_STOPWORDS))
        else:
            words.append(rng.choice(_WORDS))
    return " ".join(words).capitalize() + "."


def _paragraphs(rng: random.Random, n_sentences: int) -> str:
    return " ".join(_sentence(rng, rng.randint(5, 14)) for _ in range(n_sentences))


def _page_url(domain_id: int, page_id: int) -> str:
    return f"https://www.example-{domain_id}.org/page/{page_id}"


def _link_variant(rng: random.Random, domain_id: int, page_id: int) -> str:
    """A link target that must collapse to ``_page_url`` under normalize_url."""
    url = _page_url(domain_id, page_id)
    roll = rng.random()
    if roll < 0.15:
        return url + "/"                       # trailing slash
    if roll < 0.30:
        return url + "#section-" + str(rng.randint(1, 9))   # fragment
    if roll < 0.40:
        return f"https://WWW.Example-{domain_id}.ORG/page/{page_id}"  # case
    if roll < 0.50:
        return f"/page/{page_id}"              # relative
    if roll < 0.58:
        # subdomain: same base domain (example-N.org) → passes the filter but
        # is a DIFFERENT normalized url (en.www host ≠ www host)
        return f"https://en.example-{domain_id}.org/page/{page_id}"
    return url


_LANG_MARKUPS = (
    ("en", '<html lang="en-US">', ""),
    ("en", "<html>", '<meta http-equiv="Content-Language" content="en">'),
    ("en", "<html>", '<meta name="language" content="en, fr">'),
    ("de", '<html lang="DE-de">', ""),
    (None, "<html>", ""),
)

_MAIN_LAYOUTS = (
    ("<main>", "</main>"),
    ("<article>", "</article>"),
    ('<div id="main">', "</div>"),
    ('<div class="main-content">', "</div>"),
    ('<div id="content">', "</div>"),
    ("", ""),  # body fallback
)


def make_page_html(rng: random.Random, domain_id: int, page_id: int,
                   n_pages_in_domain: int, hub_k: int, out_deg: int,
                   size_mult: int = 1):
    """Build one page's HTML + its same-domain link targets.

    Returns ``(html, markup_lang, links)`` where ``links`` are raw (pre-
    normalization) anchor targets that point within the base domain.
    ``size_mult`` scales the body paragraph count (1 ≈ 1–2 KB pages;
    20 ≈ 25 KB — the scale-bench knob for a compute-bound parse stage).
    """
    lang, html_open, meta_lang = _LANG_MARKUPS[_pick_lang(rng)]
    main_open, main_close = _MAIN_LAYOUTS[rng.randrange(len(_MAIN_LAYOUTS))]

    links: list[str] = []
    anchors: list[str] = []
    for j in range(out_deg):
        if hub_k and rng.random() < 0.35:
            target_id = rng.randrange(hub_k)           # preferential: hubs
        else:
            target_id = rng.randrange(n_pages_in_domain)
        raw = _link_variant(rng, domain_id, target_id)
        links.append(raw)
        anchors.append(f'<a href="{raw}">{_sentence(rng, 2)}</a>')

    noise_anchors = []
    if rng.random() < 0.5:
        noise_anchors.append('<a href="https://other-site.net/x">off-domain</a>')
    if rng.random() < 0.3:
        noise_anchors.append('<a href="mailto:team@example.org">mail</a>')
    if rng.random() < 0.3:
        noise_anchors.append("<a href=\"javascript:void(0)\">js</a>")
    # nav links would create edges if boilerplate pruning failed:
    nav_anchor = f'<a href="/page/{rng.randrange(n_pages_in_domain)}">navlink</a>'

    body_text = _paragraphs(rng, rng.randint(2, 6) * size_mult)
    aside_cls = rng.choice(("navbar", "nav", "navigation", "site-header",
                            "site-footer", "footer", "cookie", "cookie-banner",
                            "banner"))
    html = f"""<!DOCTYPE html>
{html_open}
<head>{meta_lang}<title>{_sentence(rng, 3)}</title>
<script>var x = {page_id};</script>
<style>.a {{ color: red }}</style>
</head>
<body>
<header><h1>Site header {domain_id}</h1>{nav_anchor}</header>
<nav><ul><li>{nav_anchor}</li></ul></nav>
<div class="{aside_cls}">boilerplate {_sentence(rng, 4)}</div>
{main_open}
<h2>{_sentence(rng, 4)}</h2>
<p>{body_text}</p>
<p>{' '.join(anchors)} {' '.join(noise_anchors)}</p>
<img src="/x.png"><form><input name="q"><button>go</button></form>
{main_close}
<aside>sidebar {_sentence(rng, 3)}</aside>
<footer>copyright {domain_id}</footer>
</body>
</html>"""
    return html, lang, links


def _pick_lang(rng: random.Random) -> int:
    r = rng.random()
    if r < 0.70:
        return rng.randrange(3)    # an en variant
    if r < 0.85:
        return 3                   # de
    return 4                       # no markup


def generate_pages(n_pages: int, seed: int = 42, n_domains: int = 4,
                   hub_frac: float = 0.02, dup_frac: float = 0.05,
                   dangling_frac: float = 0.1, size_mult: int = 1,
                   with_text: bool = True):
    """Deterministic page-corpus pyarrow Table (schema = PAGES_SCHEMA).

    ``with_text=False`` skips the (single-threaded) ground-truth text
    extraction — for big scale-bench corpora where the parse stage
    re-derives text anyway and the column goes unread.
    """
    rng = random.Random(seed)
    per_domain = max(1, n_pages // n_domains)
    hub_k = max(1, int(per_domain * hub_frac))

    urls, tss, htmls, texts, langs = [], [], [], [], []

    def _append(url, idx, html, lang):
        text = extract_text(parse_html(html)) if with_text else ""
        urls.append(url)
        tss.append(_EPOCH + datetime.timedelta(seconds=idx))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)

    idx = 0
    for i in range(n_pages):
        d = i % n_domains
        pid = i // n_domains
        dangling = rng.random() < dangling_frac
        out_deg = 0 if dangling else rng.randint(1, 8)
        html, lang, _ = make_page_html(rng, d, pid, per_domain, hub_k,
                                       out_deg, size_mult)
        _append(_page_url(d, pid), idx, html, lang)
        idx += 1
        if rng.random() < dup_frac:
            # duplicate url variant with a SHORTER body: D3 keeps the longer
            dup_url = _page_url(d, pid) + "/"
            short_html, _, _ = make_page_html(rng, d, pid, per_domain, hub_k, 1)
            short_html = short_html.replace("<p>", "<p>short ", 1)[:len(short_html) // 2]
            _append(dup_url, idx, short_html, lang)
            idx += 1

    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def write_pages_parquet(out_dir: str, n_pages: int, seed: int = 42,
                        n_shards: int = 4, **kw) -> str:
    """Write the corpus as ``n_shards`` parquet files (resumable layout)."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_pages(n_pages, seed=seed, **kw)
    rows = table.num_rows
    per = (rows + n_shards - 1) // n_shards
    for s in range(n_shards):
        chunk = table.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"part-{s:05d}.parquet"))
    return out_dir


# ---------------------------------------------------------------------------
# Graph fixtures (FIXTURES.md F2)
# ---------------------------------------------------------------------------

def gen_random_edges(n: int, m: int, seed: int = 7) -> np.ndarray:
    """Seeded uniform digraph, no self-loops, exact-deduped — the semantics
    of the reference generator (backend/data/gen_random_graph.py:13-23) with
    a pinned seed.  Returns an (m, 2) int64 array sorted for determinism."""
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u = rng.randrange(n)
        v = rng.randrange(n)
        if u == v:
            continue
        edges.add((u, v))
    return np.array(sorted(edges), dtype=np.int64)


def gen_random_edges_fast(n: int, m: int, seed: int = 7,
                          hub_k: int = 0, hub_frac: float = 0.3) -> np.ndarray:
    """Vectorized random digraph generator for bench-scale graphs.

    No self-loops (by construction, no rejection loop); unlike
    :func:`gen_random_edges` duplicates are NOT removed — at bench scales
    the collision rate is ~m/(n·(n-1)) and multi-edges are handled
    identically by engine and oracle (both weight by multiplicity).
    ``hub_k > 0`` routes ``hub_frac`` of destinations to the first
    ``hub_k`` vertices (in-degree skew exercising the partial-combine
    path).
    """
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n, size=m, dtype=np.int64)
    # v = (u + 1 + r) % n with r ∈ [0, n-2] can never equal u → no
    # self-loops without rejection sampling
    v = (u + 1 + rng.randint(0, n - 1, size=m, dtype=np.int64)) % n
    if hub_k:
        hub_mask = rng.random_sample(m) < hub_frac
        hubs = rng.randint(0, hub_k, size=int(hub_mask.sum()), dtype=np.int64)
        v[hub_mask] = np.where(hubs == u[hub_mask],
                               (hubs + 1) % max(hub_k, 2), hubs)
    return np.stack([u, v], axis=1)


def gen_powerlaw_edges(n: int, m: int, alpha: float = 2.0,
                       seed: int = 13) -> np.ndarray:
    """Power-law degree skew on BOTH endpoints: src and dst drawn from a
    zipf(alpha) rank distribution over the vertex set (rank 0 = vid 0,
    the mega-hub — at alpha=2 it carries ~60% of all endpoints).  The
    skew-stress fixture for the north rule's "explicit skew splitting"
    clause: out-skew exercises the src-range shard straddling, in-skew
    the per-shard bincount combiner that caps hub fan-in at ≤E partials."""
    rng = np.random.RandomState(seed)
    u = (rng.zipf(alpha, m).astype(np.int64) - 1) % n
    v = (rng.zipf(alpha, m).astype(np.int64) - 1) % n
    fix = u == v
    v[fix] = (v[fix] + 1) % n
    return np.stack([u, v], axis=1)


def gen_hub_edges(n: int, m: int, hub_k: int = 4, seed: int = 11) -> np.ndarray:
    """Star-heavy graph: ~30% of edges land on ``hub_k`` hub vertices
    (skew-salting fixture, FIXTURES.md F2 ``hubgraph``)."""
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u = rng.randrange(n)
        v = rng.randrange(hub_k) if rng.random() < 0.3 else rng.randrange(n)
        if u == v:
            continue
        edges.add((u, v))
    return np.array(sorted(edges), dtype=np.int64)


def edges_to_table(edges: np.ndarray) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(edges[:, 0], pa.int64()), pa.array(edges[:, 1], pa.int64())],
        schema=EDGES_SCHEMA,
    )


def write_edges_parquet(edges: np.ndarray, out_dir: str, n_shards: int = 4,
                        sort_by_src: bool = False) -> str:
    """Write the edge table as ``n_shards`` parquet files.

    ``sort_by_src=True`` range-partitions by source vertex (one numpy
    argsort at write time): each file then covers a contiguous src
    range, so a graph engine mapping files to edge shards gets gather
    locality for free — each shard's distinct-source subscription is
    ~n/n_shards instead of ~n (the random-layout edge cut).  This is the
    layout the engine's own edge writers produce (ONE partitioning key,
    reused across stages) and the intended input layout at scale.
    """
    os.makedirs(out_dir, exist_ok=True)
    if sort_by_src:
        edges = edges[np.argsort(edges[:, 0], kind="stable")]
    table = edges_to_table(edges)
    per = (table.num_rows + n_shards - 1) // n_shards
    for s in range(n_shards):
        chunk = table.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"part-{s:05d}.parquet"))
    return out_dir


def load_edge_txt(path: str) -> np.ndarray:
    """Read a whitespace ``"src dst"`` edge-list file (the reference CUDA
    input format, backend/cuda/pagerank_gpu.cu:41-57)."""
    return np.loadtxt(path, dtype=np.int64).reshape(-1, 2)
