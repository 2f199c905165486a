"""Count-Min-Sketch heavy-hitter counting with an EXACT integer oracle.

Estimating per-term frequencies at 100 TB without shuffling the full
vocabulary: CMS keeps a fixed d x w integer register matrix; registers
are ADDITIVE, so per-block partials merge by sum — associative and
order-independent, the shape a Ray streaming reduction wants.  One
streaming ``map_batches`` pass computes per-block registers (one
``np.bincount`` over d*w flat slots), a 64-group sharded sum merges
them (slot ids are the only key space that moves — bounded at d*w
rows), and only the final d*w-row table reaches the driver.

Everything is PURE INTEGER math on the engine's FNV-1a token hashes
(the same stream the minhash/HLL sketches use): row hashes are
multiply-shift ``bucket_i = ((h * A_i + B_i) mod 2^64) >> (64 - w_bits)``
with odd multipliers A_i < 2^62 (so the DuckDB HUGEINT replication
``(h * A + B) % 2^64 // 2^54`` never overflows int128), replicated
bit-for-bit in ``sketch_sql.sql_cms_estimates``.  The point estimate
``est(t) = min_i reg[i][bucket_i(h(t))]`` is integer too, and CMS
guarantees ``est >= exact`` (one-sided error) — asserted in tests.

Reference: Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications" (J. Algorithms 2005) —
public algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

CMS_D = 4
CMS_W_BITS = 10
CMS_W = 1 << CMS_W_BITS
CMS_SHIFT = 64 - CMS_W_BITS
# odd multipliers < 2^62 (HUGEINT-safe: h*A < 2^126), public constants:
# FNV-1a prime, Mersenne M61, M31, and a 2^30-scale prime
CMS_A = (1099511628211, 2305843009213693951, 2147483647, 1073741789)
# additive constants (first 64 hex digits of pi, split)
CMS_B = (
    0x243F6A8885A308D3,
    0x13198A2E03707344,
    0xA4093822299F31D0,
    0x082EFA98EC4E6C89,
)


def _buckets(h: np.ndarray, i: int, shift: int = CMS_SHIFT) -> np.ndarray:
    """Multiply-shift bucket of hash row ``i`` (shared by CMS and the
    Bloom filter, which passes its own ``shift``)."""
    with np.errstate(over="ignore"):
        return (
            (h * np.uint64(CMS_A[i]) + np.uint64(CMS_B[i]))
            >> np.uint64(shift)
        ).astype(np.int64)


def probe_hits(sorted_h: np.ndarray, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized membership probe of hashes ``h`` against a SORTED,
    DEDUPLICATED hash array: returns ``(pos, hit)`` where ``pos`` is the
    candidate index into ``sorted_h`` and ``hit`` marks true matches.
    Shared by the CMS and Bloom exact-truth passes — the
    searchsorted/clamp subtlety lives in exactly one place.
    ``sorted_h`` MUST be unique (callers build it from a set/unique)."""
    pos = np.searchsorted(sorted_h, h)
    pos = np.minimum(pos, len(sorted_h) - 1)
    return pos, sorted_h[pos] == h


def cms_token_registers(docs: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """(slot, cnt) CMS registers over the clean-tokenization FNV
    token-hash stream, slot = i * w + bucket_i.  One streaming pass;
    the merge key space is bounded at d*w rows."""
    from ..functions.sketch import _token_hashes
    from .dedup import _sharded_groupby

    def partial(batch: pa.Table) -> pa.Table:
        h, _row = _token_hashes(batch[text_col])
        if not len(h):
            return pa.table(
                {"slot": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        slots = np.concatenate(
            [i * CMS_W + _buckets(h, i) for i in range(CMS_D)]
        )
        reg = np.bincount(slots, minlength=CMS_D * CMS_W).astype(np.int64)
        nz = np.flatnonzero(reg)
        return pa.table(
            {"slot": pa.array(nz, pa.int64()), "cnt": pa.array(reg[nz], pa.int64())}
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("slot", as_index=False)["cnt"].sum()

    schema = pa.schema([("slot", pa.int64()), ("cnt", pa.int64())])
    return _sharded_groupby(partials, ["slot"], agg, empty_schema=schema)


def cms_probe_estimates(source: str | rd.Dataset) -> pd.DataFrame:
    """CMS point estimates vs exact counts for a deterministic probe
    set (the distinct terms of the minimum-doc_id document).

    Columns: ``term, est, exact`` — both INTEGER; ``est >= exact``
    always (the CMS one-sided guarantee).  The registers stream+merge
    (never the vocabulary); exact counts touch only the probe terms via
    a broadcast hash probe, not a vocabulary groupby.
    """
    from ..functions.sketch import _token_hashes
    from .dedup import _sharded_groupby
    from .textpipe import _docs

    docs = _docs(source)

    # ---- probe terms: distinct tokens of the min-doc_id document
    min_id = docs.min("doc_id")

    def probe_tokens(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = batch.filter(pa.array(ids == min_id))
        if sel.num_rows == 0:
            return pa.table({"term": pa.array([], pa.utf8())})
        from .curation import _batch_tokens

        toks, _td, _ri, _h1, _h2 = _batch_tokens(sel)
        import pyarrow.compute as pc

        return pa.table({"term": pc.unique(toks)})

    probe_terms = sorted(
        {r["term"] for r in docs.map_batches(
            probe_tokens, batch_format="pyarrow").take_all()}
    )
    from ..functions.hashing import term_hash

    probe_h = (
        term_hash(pa.array(probe_terms, pa.utf8())).astype(np.uint64)
        if probe_terms
        else np.empty(0, np.uint64)
    )

    # ---- registers (streaming sketch)
    regs_rows = cms_token_registers(docs).take_all()
    reg = np.zeros(CMS_D * CMS_W, np.int64)
    for r in regs_rows:
        reg[r["slot"]] = r["cnt"]

    # ---- exact counts for the probe terms only (broadcast hash probe)
    order = np.argsort(probe_h)
    sorted_h = probe_h[order]
    href = ray.put(sorted_h)

    def exact_partial(batch: pa.Table) -> pa.Table:
        hs = ray.get(href)
        h, _row = _token_hashes(batch["text"])
        if not len(h) or not len(hs):
            return pa.table(
                {"pidx": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        pos, hit = probe_hits(hs, h)
        cnt = np.bincount(pos[hit], minlength=len(hs)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"pidx": pa.array(nz, pa.int64()), "cnt": pa.array(cnt[nz], pa.int64())}
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("pidx", as_index=False)["cnt"].sum()

    schema = pa.schema([("pidx", pa.int64()), ("cnt", pa.int64())])
    exact_rows = _sharded_groupby(
        docs.map_batches(exact_partial, batch_format="pyarrow"),
        ["pidx"],
        agg,
        empty_schema=schema,
    ).take_all()
    exact_sorted = np.zeros(len(probe_terms), np.int64)
    for r in exact_rows:
        exact_sorted[r["pidx"]] = r["cnt"]
    # map back from sorted-hash index to term order
    exact = np.zeros(len(probe_terms), np.int64)
    exact[order] = exact_sorted

    est = np.array(
        [
            min(int(reg[i * CMS_W + _buckets(np.array([h], np.uint64), i)[0]])
                for i in range(CMS_D))
            for h in probe_h
        ],
        np.int64,
    )
    return pd.DataFrame({"term": probe_terms, "est": est, "exact": exact})
