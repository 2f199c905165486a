"""Composed corpus-cleaning pipeline — the end-to-end filter chain a
training-data user runs before pre-training:

    language ID  ∧  quality thresholds  ∧  exact-dup keep-first
                 ∧  MinHash near-dup keep-lowest-id

expressed as ONE Ray pipeline over the documents table.  Shape (scales):

* language + quality signals come from a single fused actor-pool pass
  over the text (no join between them — same batch, same row order);
* exact-dup keep flags are a hash-sharded groupby on md5 (bounded Ray
  groups, vectorized pandas inside — `dedup._sharded_groupby`);
* signals ⋈ keep-flags is ONE partitioned hash join on doc_id with
  input-scaled P — the pipeline's only shuffle;
* MinHash near-dup losers (doc_b of each verified pair) are a small set
  by construction (only near-duplicates); they broadcast via ``ray.put``
  and filter inside map_batches.  Above ``CLEAN_MAX_BROADCAST_LOSERS``
  (a mostly-duplicate corpus) the pipeline switches to a partitioned
  anti-join against the deduplicated loser table — the same hybrid rule
  as ``catalog._semi_anti`` — so the driver never holds the loser set.

Each stage is individually hash-checked by its own catalog entry; this
entry checks their COMPOSITION against one composed DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..sources.util import actor_pool
from .textpipe import LangId, QualityScore, _docs

CLEAN_MIN_TOKENS = 15
CLEAN_MIN_ALNUM = 0.8
CLEAN_MIN_STOPWORD = 0.03
CLEAN_JACCARD = 0.5
CLEAN_MAX_BROADCAST_LOSERS = 5_000_000


class CleanSignals:
    """Fused per-doc signal stage: one text batch -> language prediction +
    quality features in a single actor (profiles/LUTs built once)."""

    def __init__(self):
        self.lang = LangId()
        self.qual = QualityScore()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import _span_hashes, token_spans

        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # tokenize ONCE; both scorers reuse the spans (the scan is the
        # memory-bandwidth-bound part of either stage)
        mapped, starts, lens, row_idx = token_spans(texts, drop_trailing=False)
        th, _ = _span_hashes(mapped, starts, lens)
        lid = self.lang.score(batch, th, row_idx)
        q = self.qual.score(batch, th, lens, row_idx)
        return pa.table(
            {
                "doc_id": lid["doc_id"],
                "lang_pred": lid["lang_pred"],
                "n_tokens": q["n_tokens"],
                "alnum_ratio": q["alnum_ratio"],
                "stopword_ratio": q["stopword_ratio"],
            }
        )


def _exact_keep_flags(docs: rd.Dataset, n_docs: int) -> rd.Dataset:
    """(doc_id, exact_keep): keep-first over md5(text) groups, sharded."""
    from ..functions.tokenize import _string_buffers
    from .dedup import _sharded_groupby, _shards_for

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        data, offsets = _string_buffers(texts)
        mv = memoryview(data)
        digests = [
            hashlib.md5(mv[offsets[i] : offsets[i + 1]]).digest()
            for i in range(batch.num_rows)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                # int64 key drives the SHARDING; grouping uses the full
                # digest so truncation can't merge distinct texts
                "h": pa.array(
                    np.frombuffer(b"".join(d[:8] for d in digests), np.int64)
                ),
                "text_md5": pa.array([d.hex() for d in digests], pa.string()),
            }
        )

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        keep = g["doc_id"] == g.groupby("text_md5")["doc_id"].transform("min")
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(), "exact_keep": keep.to_numpy()}
        )

    return _sharded_groupby(
        docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True),
        ["h"],
        flags,
        empty_schema=pa.schema([("doc_id", pa.int64()), ("exact_keep", pa.bool_())]),
        num_shards=_shards_for(n_docs),
    )


def corpus_clean(
    sf_dir: str,
    *,
    min_tokens: int = CLEAN_MIN_TOKENS,
    min_alnum: float = CLEAN_MIN_ALNUM,
    min_stopword: float = CLEAN_MIN_STOPWORD,
    jaccard_threshold: float = CLEAN_JACCARD,
    max_broadcast_losers: int = CLEAN_MAX_BROADCAST_LOSERS,
    pairs: rd.Dataset | None = None,
) -> rd.Dataset:
    """(doc_id, lang_pred, n_tokens) of documents that survive the chain.

    ``pairs`` lets a caller supply precomputed near-dup pairs (e.g. the
    ``dedup_minhash`` catalog result); otherwise the memoized
    ``minhash_dedup_pairs_cached`` reuses any pass already run this
    session on the same file — corpus_clean's warm cost is then just its
    non-minhash residue."""
    import pyarrow.compute as pc
    import ray

    from .dedup import (
        _join_partitions, _sharded_groupby, minhash_dedup_pairs_cached,
    )
    from .joins import partitioned_hash_join

    docs = _docs(sf_dir)
    n = docs.count()  # parquet metadata
    signals = docs.map_batches(
        CleanSignals, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=actor_pool(),
    )
    flags = _exact_keep_flags(docs, n)

    # near-dup losers: doc_b of every verified pair — small by construction
    if pairs is None:
        pairs = minhash_dedup_pairs_cached(sf_dir, threshold=jaccard_threshold)
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    broadcast = n_pairs <= max_broadcast_losers
    if broadcast:
        loser_rows = pairs.select_columns(["doc_b"]).take_all()
        losers = np.unique(np.array([r["doc_b"] for r in loser_rows], np.int64))
        lref = ray.put(losers)

    joined = partitioned_hash_join(
        signals, flags, left_on="doc_id", right_on="doc_id",
        num_partitions=_join_partitions(n),
        # declared schemas: skip the join's schema probes, which would
        # otherwise EXECUTE one block of the CleanSignals actor pipeline
        # and one of the sharded exact-dedup exchange just for sampling
        # (~1.2 s of duplicated work per corpus_clean call)
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("lang_pred", pa.string()),
             ("n_tokens", pa.int64()), ("alnum_ratio", pa.float64()),
             ("stopword_ratio", pa.float64())]
        ),
        right_schema=pa.schema(
            [("doc_id", pa.int64()), ("exact_keep", pa.bool_())]
        ),
    )

    def keep(batch: pa.Table) -> pa.Table:
        ok = (
            batch["exact_keep"].to_numpy(zero_copy_only=False)
            & (batch["lang_pred"].to_numpy(zero_copy_only=False) != "und")
            & (batch["n_tokens"].to_numpy(zero_copy_only=False) >= min_tokens)
            & (batch["alnum_ratio"].to_numpy(zero_copy_only=False) >= min_alnum)
            & (batch["stopword_ratio"].to_numpy(zero_copy_only=False) >= min_stopword)
        )
        if broadcast:
            ls = ray.get(lref)
            if len(ls):
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ls, ids)
                hit = (pos < len(ls)) & (ls[np.minimum(pos, len(ls) - 1)] == ids)
                ok &= ~hit
        return batch.filter(pa.array(ok)).select(["doc_id", "lang_pred", "n_tokens"])

    kept = joined.map_batches(keep, batch_format="pyarrow")
    if broadcast:
        return kept

    # mostly-duplicate corpus: distinct losers via sharded groupby, then a
    # partitioned LEFT join + null test — the driver never sees the set
    losers_ds = _sharded_groupby(
        pairs.map_batches(
            lambda t: pa.table({"doc_id": t["doc_b"].cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        ["doc_id"],
        lambda g: g.drop_duplicates(subset=["doc_id"]),
        empty_schema=pa.schema([("doc_id", pa.int64())]),
    ).map_batches(
        lambda t: t.append_column(
            "__dup", pa.array(np.ones(t.num_rows, np.int8), pa.int8())
        ),
        batch_format="pyarrow",
    )
    anti = partitioned_hash_join(
        kept, losers_ds, left_on="doc_id", right_on="doc_id",
        num_partitions=_join_partitions(max(n, n_pairs)), how="left",
    )
    return anti.map_batches(
        lambda t: t.filter(pc.is_null(t["__dup"])).select(
            ["doc_id", "lang_pred", "n_tokens"]
        ),
        batch_format="pyarrow",
    )
