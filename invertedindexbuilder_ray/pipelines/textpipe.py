"""Text-analysis operators: language ID, quality scoring, fingerprints.

Per-document heuristics a training-data pipeline runs over the corpus.
All vectorized over Arrow batches; the language profiles live in the
actor (compiled once per worker, not per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import sketch
from ..functions.hashing import _FNV_OFFSET, _FNV_PRIME
from ..functions.rounding import round_half_away
from ..functions.tokenize import token_spans
from ..sources.documents import load_documents
from ..sources.util import actor_pool

STOPWORDS = {
    "en": ["the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con"],
    "de": ["der", "die", "das", "und", "von", "zu", "den", "mit", "ist", "auf", "ein", "nicht"],
}

QUALITY_STOPWORDS = STOPWORDS["en"]


def _word_hashes(words: list[str]) -> np.ndarray:
    packed = np.zeros((len(words), 16), dtype=np.uint8)
    for i, w in enumerate(words):
        b = w.encode("ascii")[:16]
        packed[i, : len(b)] = np.frombuffer(b, np.uint8)
    with np.errstate(over="ignore"):
        h = np.full(len(words), _FNV_OFFSET, dtype=np.uint64)
        for j in range(16):
            h = (h ^ packed[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


def _docs(source: str | rd.Dataset) -> rd.Dataset:
    """Text-analysis stages are compute-heavy: small blocks so the corpus
    fans out across workers (see load_documents)."""
    if isinstance(source, rd.Dataset):
        return source
    from ..sources.documents import HEAVY_BLOCK_BYTES

    return load_documents(source, target_bytes=HEAVY_BLOCK_BYTES, min_blocks=16)


class LangId:
    """Actor-pool stage: stopword-profile language ID (n-gram-free heuristic).

    ``lang_pred`` = argmax over languages of the doc's stopword-hit ratio;
    below ``min_conf`` the prediction is "und".  Deterministic ties break
    by language-name order.
    """

    def __init__(self, min_conf: float = 0.05):
        self.min_conf = min_conf
        self.langs = sorted(STOPWORDS)
        self.hashes = {lang: _word_hashes(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import _span_hashes

        texts = batch["text"]
        mapped, starts, lens, row_idx = token_spans(texts, drop_trailing=False)
        th, _ = _span_hashes(mapped, starts, lens)
        return self.score(batch, th, row_idx)

    def score(self, batch: pa.Table, th: np.ndarray, row_idx: np.ndarray) -> pa.Table:
        """Scoring half, reusable with precomputed token hashes (the fused
        clean-signals stage tokenizes ONCE for langid + quality)."""
        n_rows = batch.num_rows
        counts = np.bincount(row_idx, minlength=n_rows).astype(np.float64)
        ratios = np.zeros((n_rows, len(self.langs)))
        for li, lang in enumerate(self.langs):
            hit = np.isin(th, self.hashes[lang])
            ratios[:, li] = np.bincount(row_idx, weights=hit, minlength=n_rows)
        with np.errstate(invalid="ignore", divide="ignore"):
            ratios = np.where(counts[:, None] > 0, ratios / counts[:, None], 0.0)
        best = np.argmax(ratios, axis=1)
        conf = ratios[np.arange(n_rows), best]
        preds = [
            self.langs[b] if c >= self.min_conf else "und"
            for b, c in zip(best, conf)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "lang_pred": pa.array(preds, pa.string()),
                "confidence": pa.array(round_half_away(conf, 6), pa.float64()),
            }
        )


def langid_ds(source: str | rd.Dataset) -> rd.Dataset:
    return _docs(source).map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=actor_pool(),
    )


class QualityScore:
    """Per-doc quality signals: token counts, length stats, character-class
    and stopword ratios — the usual webtext filtering features."""

    def __init__(self):
        self.stop_hashes = _word_hashes(QUALITY_STOPWORDS)
        lut = np.zeros(256, dtype=bool)
        for c in range(ord("a"), ord("z") + 1):
            lut[c] = True
        for c in range(ord("A"), ord("Z") + 1):
            lut[c] = True
        for c in range(ord("0"), ord("9") + 1):
            lut[c] = True
        self.alnum_lut = lut
        digit = np.zeros(256, dtype=bool)
        for c in range(ord("0"), ord("9") + 1):
            digit[c] = True
        self.digit_lut = digit

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import _span_hashes

        texts = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray
        ) else batch["text"]
        mapped, starts, lens, row_idx = token_spans(texts, drop_trailing=False)
        th, _ = _span_hashes(mapped, starts, lens)
        return self.score(batch, th, lens, row_idx)

    def score(
        self,
        batch: pa.Table,
        th: np.ndarray,
        lens: np.ndarray,
        row_idx: np.ndarray,
    ) -> pa.Table:
        """Scoring half, reusable with precomputed token spans/hashes."""
        from ..functions.tokenize import _string_buffers

        texts = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray
        ) else batch["text"]
        data, offsets = _string_buffers(texts)
        n_rows = batch.num_rows
        byte_counts = np.diff(offsets).astype(np.float64)
        alnum_mask = self.alnum_lut[data] if len(data) else np.zeros(0, bool)
        digit_mask = self.digit_lut[data] if len(data) else np.zeros(0, bool)
        cum_a = np.concatenate([[0], np.cumsum(alnum_mask)])
        cum_d = np.concatenate([[0], np.cumsum(digit_mask)])
        alnum_bytes = (cum_a[offsets[1:]] - cum_a[offsets[:-1]]).astype(np.float64)
        digit_bytes = (cum_d[offsets[1:]] - cum_d[offsets[:-1]]).astype(np.float64)
        n_tokens = np.bincount(row_idx, minlength=n_rows).astype(np.float64)
        tok_len_sum = np.bincount(row_idx, weights=lens, minlength=n_rows)
        stop_hits = np.bincount(
            row_idx, weights=np.isin(th, self.stop_hashes), minlength=n_rows
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_tok = np.where(n_tokens > 0, tok_len_sum / n_tokens, 0.0)
            stop_ratio = np.where(n_tokens > 0, stop_hits / n_tokens, 0.0)
            alnum_ratio = np.where(byte_counts > 0, alnum_bytes / byte_counts, 0.0)
            digit_ratio = np.where(byte_counts > 0, digit_bytes / byte_counts, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
                "mean_token_len": pa.array(round_half_away(mean_tok, 6), pa.float64()),
                "alnum_ratio": pa.array(round_half_away(alnum_ratio, 6), pa.float64()),
                "digit_ratio": pa.array(round_half_away(digit_ratio, 6), pa.float64()),
                "stopword_ratio": pa.array(round_half_away(stop_ratio, 6), pa.float64()),
            }
        )


def quality_ds(source: str | rd.Dataset) -> rd.Dataset:
    return _docs(source).map_batches(
        QualityScore, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=actor_pool(),
    )


# GPT-2-style pre-tokenizer, RE2-safe (no lookahead): contraction tails,
# space-prefixed letter/digit/punct runs, whitespace runs.  Both pyarrow
# (count_substring_regex) and DuckDB (regexp_extract_all) execute this with
# RE2, so the two sides agree by construction.
BPE_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|\s+"


def bpe_token_count_ds(source: str | rd.Dataset) -> rd.Dataset:
    """(doc_id, n_bpe_tokens): BPE-ish pre-tokenizer match counts — the
    training-data "how many tokens is this corpus" estimator.  Fully
    vectorized: one RE2 scan per batch via Arrow's count_substring_regex
    (no Python per-row loop)."""
    import pyarrow.compute as pc

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern=BPE_REGEX)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_bpe_tokens": pc.cast(n, pa.int64()),
            }
        )

    return _docs(source).map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint_ds(source: str | rd.Dataset) -> rd.Dataset:
    """(doc_id, fingerprint): rolling token-stream hash — whitespace /
    punctuation-insensitive exact-dup detector."""

    def compute(batch: pa.Table) -> pa.Table:
        fp = sketch.rolling_fingerprint(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "fingerprint": pa.array(fp.view(np.int64), pa.int64()),
            }
        )

    return _docs(source).map_batches(compute, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint_groups_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc dup-group labels from the rolling fingerprint:
    ``(doc_id, canon_doc_id, n_dups)`` where ``canon_doc_id`` is the
    smallest doc_id sharing the fingerprint.

    This is the SQL-checkable projection of the rolling hash: two docs
    share a fingerprint iff their (clean, <=15-char) token streams are
    identical (mod a ~2^-61 collision chance), so DuckDB can reproduce
    the exact same grouping from the normalized token stream without
    reimplementing the hash — the driver's hash compare then validates
    the rolling-hash op end-to-end.

    Aggregation is hash-sharded (64 Ray groups, vectorized pandas
    transform inside) — fingerprint cardinality ~ n_docs, and per-key
    Ray groupby costs ~ms/key."""
    from .dedup import PAIR_SHARDS, _sharded_groupby, _shards_for

    fp = fingerprint_ds(source)
    # shard count scales with the doc count when it's metadata-cheap
    shards = _shards_for(_docs(source).count()) if isinstance(source, str) else PAIR_SHARDS

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        by = g.groupby("fingerprint")["doc_id"]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "canon_doc_id": by.transform("min").to_numpy(),
                "n_dups": by.transform("size").to_numpy(),
            }
        ).astype("int64")

    return _sharded_groupby(
        fp, ["fingerprint"], grp,
        empty_schema=pa.schema(
            [("doc_id", pa.int64()), ("canon_doc_id", pa.int64()), ("n_dups", pa.int64())]
        ),
        num_shards=shards,
    )


# --------------------------------------------------------------------------
# bigram collocations (top-k adjacent-token pairs)

BIGRAM_TOPK_K = 20


def _token_string_array(
    mapped: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> pa.Array:
    """Zero-copy-ish Arrow utf8 array of the kept tokens: one vectorized
    gather compacts the (non-contiguous) token spans of the lowercased
    byte buffer into an offsets+data pair."""
    n = len(starts)
    total = int(lens.sum())
    ends = np.cumsum(lens)
    outs = ends - lens
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(outs, lens)
        + np.repeat(starts, lens)
    )
    compact = mapped[idx] if total else np.empty(0, np.uint8)
    offsets = np.zeros(n + 1, dtype=np.int32)
    offsets[1:] = ends
    return pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(offsets.tobytes()),
                       pa.py_buffer(compact.tobytes())]
    )


def bigram_topk(docs: rd.Dataset, *, k: int = BIGRAM_TOPK_K,
                text_col: str = "text") -> rd.Dataset:
    """Top-k bigram collocations under the total order (count desc,
    bigram asc) — deterministic, so a SQL row_number() oracle matches.

    Shape: per-batch partial counts (Arrow group_by — the bigram space
    is compressed ~10-100x before anything moves), sharded global sum
    (shard key = FNV pair-hash, so one bigram's rows always co-locate;
    64 Ray groups regardless of bigram cardinality), per-shard top-k
    (safe: the global top-k is a subset of the union of per-shard
    top-ks since each bigram's TOTAL count lives in one shard), then a
    tiny final sort+limit over <= 64*k rows."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.tokenize import _span_hashes
    from .dedup import _sharded_groupby

    def partial(batch: pa.Table) -> pa.Table:
        mapped, starts, lens, row_idx = token_spans(
            batch[text_col], drop_trailing=False
        )
        n = len(starts)
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.utf8()),
                             "bh": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        toks = _token_string_array(mapped, starts, lens)
        h, _h2 = _span_hashes(mapped, starts, lens)
        keep = row_idx[:-1] == row_idx[1:]
        joined = pc.binary_join_element_wise(
            toks.slice(0, n - 1), toks.slice(1, n - 1), " "
        ).filter(pa.array(keep))
        with np.errstate(over="ignore"):
            bh = ((h[:-1] ^ h[1:]) * np.uint64(_FNV_PRIME))[keep]
        t = pa.table({"bigram": joined,
                      "bh": pa.array(bh.view(np.int64), pa.int64())})
        agg = t.group_by("bigram").aggregate([("bh", "min"), ("bigram", "count")])
        return pa.table({"bigram": agg["bigram"],
                         "bh": agg["bh_min"],
                         "n": agg["bigram_count"].cast(pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("bigram", as_index=False)["n"].sum()
        tot = tot.sort_values(["n", "bigram"], ascending=[False, True]).head(k)
        return tot

    schema = pa.schema([("bigram", pa.utf8()), ("n", pa.int64())])
    tops = _sharded_groupby(partials, ["bh"], agg, empty_schema=schema)

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "bigram"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        df["n"] = df["n"].astype("int64")
        return pa.Table.from_pandas(df[["bigram", "n", "rank"]],
                                    preserve_index=False)

    # <= 64*k rows remain: one block, one deterministic re-sort.
    # batch_size=None = whole block (the default 1024 could SPLIT 64*k
    # rows into two finalize calls -> two rank sequences)
    return tops.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# bigram collocations by Dunning log-likelihood ratio (exact fixed point)

LLR_TOP_K = 30
_LLR_SCALE = 1_000_000_000
_LLR_MAX_N = 1 << 26  # keeps every |partial sum| of the signed S-terms < 2^63


def _log2_fp_ext(k: np.ndarray) -> np.ndarray:
    """Deterministic fixed-point log2 over ANY positive int64, built from
    the exhaustively-verified [1, 2^16) table (curation._log2_fp):
    ``L'(k) = L(k >> s) + s * 1e9`` with ``s = max(0, bitlen(k) - 16)``.
    For k < 2^16 this IS the verified table; above it, it is a defined
    quantization (relative error < 2^-16) that DuckDB reproduces exactly
    as ``round(log2(k >> s)*1e9) + s*1e9`` — both sides shift first, so
    the unverified large-k libm domain is never evaluated."""
    from .curation import _log2_fp

    k = k.astype(np.int64)
    out = np.zeros(len(k), np.int64)
    pos = k >= 1
    kp = k[pos]
    # bitlen via frexp (exact: k < 2^26 << 2^53)
    bitlen = np.frexp(kp.astype(np.float64))[1].astype(np.int64)
    s = np.maximum(bitlen - 16, 0)
    out[pos] = _log2_fp(kp >> s) + s * _LLR_SCALE
    return out


def _s_fp(k: np.ndarray) -> np.ndarray:
    """S(k) = k * L'(k) (0 for k <= 1): the k·log2(k) term of Dunning's
    LLR, as an exact int64."""
    k = k.astype(np.int64)
    return np.where(k <= 1, np.int64(0), k * _log2_fp_ext(k))


def bigram_llr(docs: rd.Dataset, *, top_k: int = LLR_TOP_K,
               text_col: str = "text") -> rd.Dataset:
    """Top-k bigram collocations by Dunning's log-likelihood ratio
    (Dunning 1993), with the 2x2 contingency built from the bigram table
    itself (r1 = bigram-start marginal, c1 = bigram-end marginal — they
    differ from raw unigram counts only by doc-final/initial tokens, and
    keep the table exactly consistent).

    Exactness: every S(k) = k*log2(k) term is the exact integer
    ``_s_fp`` fixed point, so ``llr_fp = 2*sum(±S)`` is an exact int64
    on both engines and the RANK key is an integer (llr_fp desc, bigram
    asc); the float ``llr`` is a rounded payload.  Signed terms are
    paired (observed - marginal) so no partial sum can exceed
    ~5*S(n) — guarded by ``n < 2^26`` (raises loudly).

    Shape (100 TB): per-batch Arrow group_by compresses the token stream
    to bigram partials; ONE pair-hash exchange totals each bigram; the
    left/right marginals attach via two term-hash exchanges (a term's
    rows co-locate, the marginal is an in-shard sum — never a broadcast
    of anything vocabulary-sized); the scalar n is one aggregate over
    the materialized (type-compressed) bigram table; the final scoring
    pass is streaming with per-batch partial top-k under the final total
    order."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.tokenize import _span_hashes
    from .dedup import _sharded_groupby

    def partial(batch: pa.Table) -> pa.Table:
        mapped, starts, lens, row_idx = token_spans(
            batch[text_col], drop_trailing=False
        )
        n = len(starts)
        empty = pa.table({
            "left": pa.array([], pa.utf8()), "right": pa.array([], pa.utf8()),
            "lh": pa.array([], pa.int64()), "rh": pa.array([], pa.int64()),
            "bh": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
        })
        if n < 2:
            return empty
        toks = _token_string_array(mapped, starts, lens)
        h, _h2 = _span_hashes(mapped, starts, lens)
        keep = row_idx[:-1] == row_idx[1:]
        if not keep.any():
            return empty
        left = toks.slice(0, n - 1).filter(pa.array(keep))
        right = toks.slice(1, n - 1).filter(pa.array(keep))
        lh = h[:-1][keep].view(np.int64)
        rh = h[1:][keep].view(np.int64)
        with np.errstate(over="ignore"):
            bh = ((h[:-1] ^ h[1:]) * np.uint64(_FNV_PRIME))[keep].view(np.int64)
        t = pa.table({
            "left": left, "right": right,
            "lh": pa.array(lh, pa.int64()), "rh": pa.array(rh, pa.int64()),
            "bh": pa.array(bh, pa.int64()),
        })
        agg = t.group_by(["left", "right"]).aggregate(
            [("lh", "min"), ("rh", "min"), ("bh", "min"), ([], "count_all")]
        )
        return pa.table({
            "left": agg["left"], "right": agg["right"],
            "lh": agg["lh_min"], "rh": agg["rh_min"], "bh": agg["bh_min"],
            "n": agg["count_all"].cast(pa.int64()),
        })

    partials = docs.map_batches(partial, batch_format="pyarrow")

    bschema = pa.schema([
        ("left", pa.utf8()), ("right", pa.utf8()), ("lh", pa.int64()),
        ("rh", pa.int64()), ("bh", pa.int64()), ("n", pa.int64()),
    ])

    def agg_bigram(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["left", "right"], as_index=False).agg(
            lh=("lh", "min"), rh=("rh", "min"), bh=("bh", "min"), n=("n", "sum")
        )

    e1 = _sharded_groupby(partials, ["bh"], agg_bigram, empty_schema=bschema)
    # two consumers (scalar n + marginal chain) over the TYPE-compressed
    # bigram table — materialize the reduced intermediate, not the corpus
    e1 = e1.materialize()
    n_total = int(e1.sum("n") or 0)
    out_cols = pa.schema([
        ("bigram", pa.utf8()), ("n", pa.int64()), ("llr_fp", pa.int64()),
        ("llr", pa.float64()), ("rank", pa.int64()),
    ])
    if n_total == 0:
        return rd.from_arrow(out_cols.empty_table())
    if n_total >= _LLR_MAX_N:
        raise ValueError(
            f"bigram_llr: n={n_total} >= {_LLR_MAX_N} exceeds the int64 "
            "partial-sum envelope of the fixed-point S terms"
        )

    def attach_left(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(r1=g.groupby("left")["n"].transform("sum").astype(np.int64))
        return g

    s2 = pa.schema(list(bschema) + [pa.field("r1", pa.int64())])
    e2 = _sharded_groupby(e1, ["lh"], attach_left, empty_schema=s2)

    def attach_right(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(c1=g.groupby("right")["n"].transform("sum").astype(np.int64))
        return g

    s3 = pa.schema(list(s2) + [pa.field("c1", pa.int64())])
    e3 = _sharded_groupby(e2, ["rh"], attach_right, empty_schema=s3)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_cols.empty_table()
        k11 = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        r1 = batch["r1"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = batch["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.int64(n_total)
        k12, k21 = r1 - k11, c1 - k11
        k22 = n - r1 - c1 + k11
        r2, c2 = n - r1, n - c1
        # paired observed-minus-marginal keeps every cumulative sum small
        half = (
            (_s_fp(k11) - _s_fp(r1))
            + (_s_fp(k12) - _s_fp(c2))
            + (_s_fp(k21) - _s_fp(c1))
            + (_s_fp(k22) - _s_fp(r2))
            + _s_fp(np.full(len(k11), n))
        )
        llr_fp = 2 * half
        bigram = pc.binary_join_element_wise(
            batch["left"].combine_chunks(), batch["right"].combine_chunks(), " "
        )
        from ..functions.rounding import round_half_away

        llr = round_half_away(llr_fp.astype(np.float64) / _LLR_SCALE, 6)
        t = pa.table({
            "bigram": bigram, "n": pa.array(k11, pa.int64()),
            "llr_fp": pa.array(llr_fp, pa.int64()),
            "llr": pa.array(llr, pa.float64()),
        })
        # per-batch partial top-k under the final total order
        df = t.to_pandas().sort_values(
            ["llr_fp", "bigram"], ascending=[False, True], kind="mergesort"
        ).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    tops = e3.map_batches(score, batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["llr_fp", "bigram"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["bigram", "n", "llr_fp", "llr", "rank"]], preserve_index=False
        )

    return tops.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )
