"""Bloom-filter membership (seen-set prefilter) with an EXACT integer oracle.

The third sketch in the family (HLL: cardinality, CMS: frequency,
Bloom: membership) and the standard crawl/ingest prefilter at 100 TB:
"definitely new" keys skip the expensive exact-dedup exchange entirely;
only "maybe seen" keys pay it.  Bloom words are OR-ADDITIVE, so
per-block partials merge associatively — the Ray streaming-reduction
shape again: one ``map_batches`` pass sets per-block bits, a sharded
bitwise-OR merges words (key space bounded at the fixed word count),
and only the final word table reaches the driver.

Pure integer math on the engine's FNV-1a token hashes: k multiply-shift
bit positions ``((h * A_i + B_i) mod 2^64) >> (64 - m_bits)`` (the CMS
constants, < 2^62 — HUGEINT-safe), words are 32-BIT so every OR mask
``1 << (bit % 32)`` fits a signed BIGINT exactly on both sides
(``sketch_sql.sql_bloom_probe`` replicates the words and the probe
verdicts bit-for-bit).  One-sided by construction: ``maybe >= actually``
(no false negatives); the false-positive rate is a tested property.

Reference: Bloom, "Space/time trade-offs in hash coding with allowable
errors" (CACM 1970) — public algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .heavyhitters import CMS_A, CMS_B

BLOOM_K = 4
BLOOM_M_BITS = 16  # 2^16 bits -> 2048 32-bit words
BLOOM_M = 1 << BLOOM_M_BITS
BLOOM_SHIFT = 64 - BLOOM_M_BITS
BLOOM_WORDS = BLOOM_M // 32
# sf split: base corpus = docs with doc_id % 5 != 0, probe docs the rest
BLOOM_HOLDOUT_EVERY = 5
# synthetic definite-negatives appended to the probe set (suffix keeps
# them inside the token alphabet; the EXACT side decides truth, so a
# natural collision would just be a true positive on both sides)
BLOOM_NEG_SUFFIX = "qq9"


# the probe vocabulary is broadcast once (ray.put of sorted hashes) and
# held on the driver — bound it loudly, same as DECON_MAX_BENCH_SHINGLES
# (at 100 TB, probe in chunks or shard the probe set instead)
BLOOM_MAX_PROBE_TERMS = 5_000_000


def _bit_positions(h: np.ndarray) -> list[np.ndarray]:
    from .heavyhitters import _buckets

    return [_buckets(h, i, BLOOM_SHIFT) for i in range(BLOOM_K)]


def bloom_term_words(docs: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """(word, bits) Bloom words over the clean-tokenization FNV
    token-hash stream — 32-bit words as int64, OR-merged."""
    from ..functions.sketch import _token_hashes
    from .dedup import _sharded_groupby

    def partial(batch: pa.Table) -> pa.Table:
        h, _row = _token_hashes(batch[text_col])
        words = np.zeros(BLOOM_WORDS, np.int64)
        if len(h):
            bits = np.concatenate(_bit_positions(h))
            np.bitwise_or.at(words, bits // 32, np.int64(1) << (bits % 32))
        nz = np.flatnonzero(words)
        return pa.table(
            {"word": pa.array(nz, pa.int64()), "bits": pa.array(words[nz], pa.int64())}
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["bits"].agg(np.bitwise_or.reduce)

    schema = pa.schema([("word", pa.int64()), ("bits", pa.int64())])
    return _sharded_groupby(partials, ["word"], agg, empty_schema=schema)


def bloom_probe(source: str | rd.Dataset) -> pd.DataFrame:
    """Membership verdicts for the held-out probe vocabulary against a
    Bloom filter built over the base split's tokens.

    Columns: ``term, maybe_in_base, actually_in_base`` (0/1 ints).
    Probe set = distinct terms of held-out docs (doc_id %
    ``BLOOM_HOLDOUT_EVERY`` == 0) plus one synthetic definite-negative
    per probe term (term + ``BLOOM_NEG_SUFFIX``).  ``maybe >= actually``
    always (no false negatives); "definitely new" terms skip the exact
    check at scale.  Exact truth comes from a broadcast hash probe of
    the base split — never a vocabulary groupby.
    """
    from ..functions.hashing import term_hash
    from ..functions.sketch import _token_hashes
    from .dedup import _sharded_groupby
    from .textpipe import _docs

    docs = _docs(source)

    def split(base: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = ids % BLOOM_HOLDOUT_EVERY == 0
            return t.filter(pa.array(~m if base else m))

        return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    base, held = split(True), split(False)

    # ---- probe vocabulary (distinct held-out terms + synthetic negatives)
    def held_terms(t: pa.Table) -> pa.Table:
        from .curation import _batch_tokens

        toks, _td, _ri, _h1, _h2 = _batch_tokens(t)
        return pa.table({"term": pc.unique(toks)})

    probe_terms = sorted(
        {r["term"] for r in held.map_batches(
            held_terms, batch_format="pyarrow").take_all()}
    )
    # synthetic negatives truncated to 16 bytes (pack16's limit; SQL uses
    # substr(term || suffix, 1, 16)); a 16-char result can never be a
    # base token (tokenizer caps at 15), and even if a shorter one
    # collides with a real term the EXACT side decides truth on both
    # sides identically.  SET UNION, not concatenation: a natural held
    # term can EQUAL a truncated negative, and a duplicate probe row
    # would let the final drop_duplicates keep the un-marked copy
    # (mirrors the SQL's UNION dedup)
    probe_terms = sorted(
        set(probe_terms) | {(t + BLOOM_NEG_SUFFIX)[:16] for t in probe_terms}
    )
    if len(probe_terms) > BLOOM_MAX_PROBE_TERMS:
        raise ValueError(
            f"probe vocabulary exceeds {BLOOM_MAX_PROBE_TERMS:,} terms; "
            "a probe set this large should be sharded, not broadcast"
        )
    probe_h = (
        term_hash(pa.array(probe_terms, pa.utf8())).astype(np.uint64)
        if probe_terms
        else np.empty(0, np.uint64)
    )

    # ---- filter words (streaming OR-merge), then a driver-side probe
    words = np.zeros(BLOOM_WORDS, np.int64)
    for r in bloom_term_words(base).take_all():
        words[r["word"]] |= r["bits"]
    maybe = np.ones(len(probe_terms), bool)
    for bits in _bit_positions(probe_h):
        maybe &= (words[bits // 32] >> (bits % 32)) & 1 == 1

    # ---- exact truth: broadcast sorted probe hashes, scan the base split
    order = np.argsort(probe_h)
    sorted_h = probe_h[order]
    href = ray.put(sorted_h)

    def exact_partial(t: pa.Table) -> pa.Table:
        hs = ray.get(href)
        h, _row = _token_hashes(t["text"])
        if not len(h) or not len(hs):
            return pa.table({"pidx": pa.array([], pa.int64())})
        from .heavyhitters import probe_hits

        pos, hit = probe_hits(hs, h)
        return pa.table({"pidx": pa.array(np.unique(pos[hit]), pa.int64())})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    schema = pa.schema([("pidx", pa.int64())])
    seen = _sharded_groupby(
        base.map_batches(exact_partial, batch_format="pyarrow"),
        ["pidx"],
        agg,
        empty_schema=schema,
    ).take_all()
    actually_sorted = np.zeros(len(probe_terms), np.int64)
    for r in seen:
        actually_sorted[r["pidx"]] = 1
    actually = np.zeros(len(probe_terms), np.int64)
    actually[order] = actually_sorted

    df = pd.DataFrame(
        {
            "term": probe_terms,
            "maybe_in_base": maybe.astype(np.int64),
            "actually_in_base": actually,
        }
    )
    # probe_terms is already a sorted set — no duplicates by construction
    return df.sort_values("term").reset_index(drop=True)
