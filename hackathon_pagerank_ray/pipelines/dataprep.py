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
                num_partitions: int = 8):
    """Returns a dataset ``(doc_id, n_tokens, stopword_ratio,
    text_redacted)`` of the documents that survive exact dedup and the
    quality gate, with PII scrubbed from the surviving text."""
    from ..stages.dedup_near import exact_text_dedup
    from ..stages.relational import semi_join
    from ..stages.schema_util import drop_empty_blocks
    from ..stages.text_ops import add_quality_scores, add_redaction

    base = docs_ds.select_columns([id_col, text_col])
    keep = exact_text_dedup(base, id_col, text_col).select_columns(
        ["keep_id"])
    kept = semi_join(base, keep, on=id_col, right_on="keep_id",
                     num_partitions=num_partitions)
    scored = add_quality_scores(kept, text_col)

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
