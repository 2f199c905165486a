"""Positional index tier: phrase and proximity queries over token positions.

The reference engine's postings are (doc, tf)-only (it cannot answer
"data AND join *adjacent*"); this module adds the classic positional
layer on top of the same quirk tokenizer:

* ``positional_postings`` — (term, doc_id, tf, first_pos, last_pos),
  the flattened positional posting list;
* ``phrase_match`` — docs containing an n-term phrase with exact
  adjacency (position_i+1 == position_{i+1}) and the occurrence count;
* ``proximity_match`` — docs where two terms co-occur within a +/-w
  position window, with the pair count (the "terms NEAR each other"
  operator).

Position semantics: 1-based ordinal over ALL alnum runs in the document
(a run dropped by the Q2 15-byte cap still *occupies* its position, so
a phrase never falsely matches across a dropped long token; Q1's
trailing run is always the last ordinal, so dropping it leaves earlier
positions intact).  This matches the SQL oracle's
``unnest(range(1, len(tokens)+1))`` with the length filter applied after.

Scale shape: documents never span batches, so every operator here is a
single ``map_batches`` pass — per-batch the match is pure numpy over
composed ``(doc_rank << 32) | pos`` int64 keys (adjacency = key
subtraction, windowing = two searchsorteds against the sorted key
vector).  No shuffle, no driver materialization; 10^12 docs stream
through at tokenizer speed.  For repeated phrase serving the same
per-batch kernels run against the positional postings checkpoint
filtered to the phrase's terms (predicate pushdown on ``term``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.tokenize import tokenize_with_positions
from ..sources.documents import load_documents

_POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("first_pos", pa.int64()),
        ("last_pos", pa.int64()),
    ]
)

_MATCH_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_occurrences", pa.int64())])
_PAIR_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_pairs", pa.int64())])


def _doc_pos_keys(batch: pa.Table):
    """Tokenize a batch -> (terms, uniq_docs, composed int64 keys).

    Keys are ``(doc_rank << 32) | pos`` with doc_rank dense within the
    batch: adjacent positions differ by 1 in key space and distinct docs
    are >= 2^32 apart, so phrase/window arithmetic can never cross a
    document boundary.  Keys ascend in construction order (tokens are
    emitted in batch byte order)."""
    terms, docs, pos = tokenize_with_positions(
        batch["text"], batch["doc_id"].to_numpy(zero_copy_only=False)
    )
    if len(docs) == 0:
        return terms, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), pos
    uniq_docs, ranks = np.unique(docs, return_inverse=True)
    keys = (ranks.astype(np.int64) << np.int64(32)) | pos.astype(np.int64)
    return terms, uniq_docs, keys, pos


def positional_postings(docs: rd.Dataset | str) -> rd.Dataset:
    """Flattened positional postings: (term, doc_id, tf, first_pos, last_pos).

    Docs never span batches, so the per-(term, doc) aggregate is final
    after one per-batch Arrow ``group_by`` — no shuffle."""
    if isinstance(docs, str):
        docs = load_documents(docs)

    def per_batch(batch: pa.Table) -> pa.Table:
        terms, doc_ids, pos = tokenize_with_positions(
            batch["text"], batch["doc_id"].to_numpy(zero_copy_only=False)
        )
        if len(doc_ids) == 0:
            return _POSTINGS_SCHEMA.empty_table()
        t = pa.table(
            {
                "term": terms,
                "doc_id": pa.array(doc_ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )
        g = t.group_by(["term", "doc_id"]).aggregate(
            [("pos", "count"), ("pos", "min"), ("pos", "max")]
        )
        return pa.table(
            {
                "term": g["term"],
                "doc_id": g["doc_id"],
                "tf": g["pos_count"].cast(pa.int64()),
                "first_pos": g["pos_min"],
                "last_pos": g["pos_max"],
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def phrase_match(docs: rd.Dataset | str, phrase: list[str]) -> rd.Dataset:
    """Docs containing ``phrase`` as exactly-adjacent tokens -> (doc_id,
    n_occurrences).  Quirk-tokenizer terms; multi-term phrases chain the
    adjacency constraint (pos_{i+1} == pos_i + 1)."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    if isinstance(docs, str):
        docs = load_documents(docs)
    phrase = [str(w) for w in phrase]

    def per_batch(batch: pa.Table) -> pa.Table:
        terms, uniq_docs, keys, pos = _doc_pos_keys(batch)
        if len(keys) == 0:
            return _MATCH_SCHEMA.empty_table()
        cur = None
        for i, w in enumerate(phrase):
            m = pc.equal(terms, pa.scalar(w)).to_numpy(zero_copy_only=False)
            if i:
                # a token at pos <= i cannot be the i-th phrase element
                # (and key - i would otherwise wrap into the previous doc)
                m &= pos > i
            k = keys[m] - np.int64(i)  # shift back to the phrase-start key
            cur = k if cur is None else np.intersect1d(cur, k, assume_unique=True)
            if len(cur) == 0:
                return _MATCH_SCHEMA.empty_table()
        starts = cur >> np.int64(32)  # doc rank of each occurrence
        cnt = np.bincount(starts, minlength=len(uniq_docs))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "doc_id": pa.array(uniq_docs[nz], pa.int64()),
                "n_occurrences": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def proximity_match(
    docs: rd.Dataset | str, term_a: str, term_b: str, window: int
) -> rd.Dataset:
    """Docs where ``term_a`` and ``term_b`` co-occur within +/-``window``
    positions -> (doc_id, n_pairs) with n_pairs = |{(pa, pb):
    |pa - pb| <= window}|.  Window arithmetic on composed keys cannot
    cross documents (doc ranks are 2^32 apart >> window)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if isinstance(docs, str):
        docs = load_documents(docs)
    w = np.int64(window)

    def per_batch(batch: pa.Table) -> pa.Table:
        terms, uniq_docs, keys, _pos = _doc_pos_keys(batch)
        if len(keys) == 0:
            return _PAIR_SCHEMA.empty_table()
        ka = keys[pc.equal(terms, pa.scalar(term_a)).to_numpy(zero_copy_only=False)]
        kb = keys[pc.equal(terms, pa.scalar(term_b)).to_numpy(zero_copy_only=False)]
        if len(ka) == 0 or len(kb) == 0:
            return _PAIR_SCHEMA.empty_table()
        # kb ascends by construction (batch byte order); count b-positions
        # inside each a-token's [key-w, key+w] via two searchsorteds
        lo = np.searchsorted(kb, ka - w, side="left")
        hi = np.searchsorted(kb, ka + w, side="right")
        per_a = hi - lo
        drank = (ka >> np.int64(32)).astype(np.int64)
        cnt = np.bincount(drank, weights=per_a, minlength=len(uniq_docs))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "doc_id": pa.array(uniq_docs[nz], pa.int64()),
                "n_pairs": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
