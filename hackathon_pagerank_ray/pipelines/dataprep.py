"""End-to-end training-data preparation pipeline.

The canonical LLM-corpus prep chain composed from the engine's stages,
each of which is individually SQL-oracle-checked:

    exact dedup (keep min id per text)  →  quality gate (token count +
    stopword ratio)  →  PII redaction  →  per-doc token/quality profile

Every step is a streaming batch transform or one bounded hash exchange —
no driver materialization, no full-corpus shuffle of raw text (the dedup
shuffle moves 8-byte content hashes).  The `dataprep_corpus` driver query
runs this end to end against a single DuckDB CTE oracle, so the
*composition* is oracle-checked, not just the pieces.
"""

from __future__ import annotations


def prep_corpus(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                min_tokens: int = 5, min_stopword_ratio: float = 0.05,
                num_partitions: int = 8,
                broadcast_max_docs: int = 5_000_000):
    """Returns a dataset ``(doc_id, n_tokens, stopword_ratio,
    text_redacted)`` of the documents that survive exact dedup and the
    quality gate, with PII scrubbed from the surviving text.

    Below ``broadcast_max_docs`` survivors the keep-id set is broadcast
    (sorted int64 array built in a worker task — a numpy plasma object,
    zero-copy per batch) and the dedup survivor filter is a local
    binary-search membership test instead of the hash semi-join; the
    join stays as the at-scale plan."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.dedup_near import exact_text_dedup
    from ..stages.relational import semi_join

    base = docs_ds.select_columns([id_col, text_col]).materialize()
    keep = exact_text_dedup(base, id_col, text_col).select_columns(
        ["keep_id"])
    if base.count() <= broadcast_max_docs:
        @ray.remote
        def _keep_ids(*parts):
            arrs = [np.asarray(p["keep_id"], dtype=np.int64)
                    for p in parts if p.num_rows]
            return (np.sort(np.concatenate(arrs)) if arrs
                    else np.empty(0, dtype=np.int64))

        kref = _keep_ids.remote(*keep.materialize().to_arrow_refs())

        def _filter(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            if not len(ks) or not t.num_rows:
                return t.slice(0, 0)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
            return t.filter(pa.array(ks[idx] == ids))

        kept = base.map_batches(_filter, batch_format="pyarrow")
    else:
        kept = semi_join(base, keep, on=id_col, right_on="keep_id",
                         num_partitions=num_partitions)
    return quality_redact(kept, id_col, text_col, min_tokens,
                          min_stopword_ratio)


def quality_redact(kept_ds, id_col: str = "doc_id",
                   text_col: str = "text", min_tokens: int = 5,
                   min_stopword_ratio: float = 0.05):
    """The post-dedup tail of :func:`prep_corpus` — quality gate + PII
    scrub — factored out so the incremental path
    (:mod:`.incremental`) computes delta rows with the IDENTICAL
    kernels (bit-exactness of the patched output depends on it).
    Per-document pure: no shuffle, no cross-doc state."""
    from ..stages.schema_util import drop_empty_blocks
    from ..stages.text_ops import add_quality_scores, add_redaction

    scored = add_quality_scores(kept_ds, text_col)

    def _gate(t):
        # Arrow filter: a pandas batch here would copy the text column
        # just to evaluate two numeric predicates
        import pyarrow as pa
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        sr = t["stopword_ratio"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((nt >= min_tokens)
                                 & (sr >= min_stopword_ratio)))

    gated = drop_empty_blocks(
        scored.map_batches(_gate, batch_format="pyarrow"))
    redacted = add_redaction(gated, text_col)
    return redacted.select_columns(
        [id_col, "n_tokens", "stopword_ratio", "text_redacted"])
