"""Training-data curation operators over the documents table.

Extends the engine's text-analytics tier (tokenizer substrate:
``functions/tokenize.py``; reference anchor for the token semantics is
the quirk scanner it cross-validates, see SURVEY.md §8) with the
operations a 100-TB LLM training-data pipeline runs between crawl and
tokenizer:

- :func:`gopher_repetition_ds` — per-doc repetition/quality signals in
  the style of the Gopher rules (duplicate-word fraction, top-bigram
  mass) with a pass/fail flag.
- :func:`pii_scan_ds` — regex PII detection + redaction (emails, IPv4),
  RE2 on both the Ray side (Arrow ``count_substring_regex`` /
  ``replace_substring_regex``) and the DuckDB oracle, so counts and the
  redacted length are bit-comparable.
- :func:`decontaminate_ds` — benchmark n-gram decontamination: count
  per doc the 8-token shingles that appear in a (small, broadcast)
  benchmark shingle set.
- :func:`tfidf_top_terms_ds` — per-doc top-k terms under the exact
  integer order (tf desc, df asc, term asc) with a rounded tf-idf
  score; df computed via a term-sharded exchange, never a per-key Ray
  groupby.
- :func:`stratified_sample_ds` — per-language deterministic hash
  sampling (rebalancing): same Fibonacci multiply hash as
  ``sample_hash``, with a per-group keep rate.

Scale notes (100 TB): every operator is a streaming ``map_batches``
plan; per-doc aggregates use per-batch Arrow ``group_by`` (a document
never spans batches); corpus-wide state is either a bounded broadcast
(the benchmark shingle set — small BY DESIGN; loudly bounded) or a
hash-sharded exchange (`dedup._sharded_groupby`, shard count fixed,
vectorized pandas inside).  No driver-side row loops, no full
materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.rounding import round_half_away
from ..functions.tokenize import _span_hashes, token_spans
from .textpipe import _docs, _token_string_array

# ---------------------------------------------------------------------------
# shared: clean token stream -> (doc_id-aligned tokens, per-batch)


def _batch_tokens(batch: pa.Table) -> tuple[pa.Array, np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray]:
    """Clean kept tokens (lowercased [a-z0-9]+ runs, len<=15 dropped, NO
    trailing-token quirk) for one batch: returns ``(tokens, token_doc,
    row_idx, h1, h2)`` where ``token_doc[i]`` is the doc_id owning token
    i and (h1, h2) are the dual 64-bit span hashes."""
    mapped, starts, lens, row_idx = token_spans(batch["text"], drop_trailing=False)
    toks = _token_string_array(mapped, starts, lens)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h1, h2 = _span_hashes(mapped, starts, lens)
    return toks, doc_ids[row_idx], row_idx, h1, h2


def _align_to_rows(doc_ids: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Row index of each ``keys`` value in the batch's (unique) doc_id
    array — the vectorized argsort+searchsorted alignment both
    per-doc-aggregate operators share.  PRECONDITION: every key occurs
    in ``doc_ids`` (a per-batch aggregate key always does); a missing
    key would silently map to the wrong row, so don't reuse this for
    cross-batch keys."""
    order = np.argsort(doc_ids, kind="stable")
    return order[np.searchsorted(doc_ids[order], keys)]


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality signals

GOPHER_MIN_TOKENS = 20
GOPHER_MAX_DUP_FRAC = 0.6
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.2


def gopher_repetition_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc repetition signals + Gopher-style pass flag.

    Columns: ``doc_id, n_tokens, n_distinct, top_bigram_n, dup_frac,
    top_bigram_frac, passes``.  ``dup_frac = (n_tokens - n_distinct) /
    n_tokens`` and ``top_bigram_frac = 2 * top_bigram_n / n_tokens``
    (both rounded half-away to 6, matching DuckDB ``round``);
    ``passes`` applies the module thresholds to the ROUNDED values so
    the SQL oracle's comparisons agree bit-for-bit.

    Everything is per-batch Arrow ``group_by`` (documents never span
    batches) — zero cross-batch exchange.
    """

    def per_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, row_idx, _h1, _h2 = _batch_tokens(batch)
        n = len(toks)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

        if n:
            t = pa.table({"doc_id": pa.array(token_doc, pa.int64()), "term": toks})
            tf = t.group_by(["doc_id", "term"]).aggregate([("term", "count")])
            per_doc = tf.group_by("doc_id").aggregate(
                [("term_count", "sum"), ("term_count", "count")]
            )
            pdoc = per_doc["doc_id"].to_numpy(zero_copy_only=False)
            ptok = per_doc["term_count_sum"].to_numpy(zero_copy_only=False)
            pdis = per_doc["term_count_count"].to_numpy(zero_copy_only=False)
        else:
            pdoc = np.empty(0, np.int64)
            ptok = pdis = np.empty(0, np.int64)

        # bigram mass: adjacent kept tokens within one doc
        if n >= 2:
            keep = row_idx[:-1] == row_idx[1:]
            bg = pc.binary_join_element_wise(
                toks.slice(0, n - 1), toks.slice(1, n - 1), " "
            ).filter(pa.array(keep))
            bdoc = token_doc[:-1][keep]
            bt = pa.table({"doc_id": pa.array(bdoc, pa.int64()), "bg": bg})
            bc = bt.group_by(["doc_id", "bg"]).aggregate([("bg", "count")])
            btop = bc.group_by("doc_id").aggregate([("bg_count", "max")])
            bdoc2 = btop["doc_id"].to_numpy(zero_copy_only=False)
            bmax = btop["bg_count_max"].to_numpy(zero_copy_only=False)
        else:
            bdoc2 = np.empty(0, np.int64)
            bmax = np.empty(0, np.int64)

        # align per-doc aggregates back to the batch's doc order
        out_tok = np.zeros(len(doc_ids), np.int64)
        out_dis = np.zeros(len(doc_ids), np.int64)
        out_big = np.zeros(len(doc_ids), np.int64)
        if len(pdoc):
            idx = _align_to_rows(doc_ids, pdoc)
            out_tok[idx] = ptok
            out_dis[idx] = pdis
        if len(bdoc2):
            out_big[_align_to_rows(doc_ids, bdoc2)] = bmax

        safe_n = np.maximum(out_tok, 1).astype(np.float64)
        dup = round_half_away((out_tok - out_dis) / safe_n, 6)
        big = round_half_away(2.0 * out_big / safe_n, 6)
        passes = (
            (out_tok >= GOPHER_MIN_TOKENS)
            & (dup <= GOPHER_MAX_DUP_FRAC)
            & (big <= GOPHER_MAX_TOP_BIGRAM_FRAC)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(out_tok, pa.int64()),
                "n_distinct": pa.array(out_dis, pa.int64()),
                "top_bigram_n": pa.array(out_big, pa.int64()),
                "dup_frac": pa.array(dup, pa.float64()),
                "top_bigram_frac": pa.array(big, pa.float64()),
                "passes": pa.array(passes, pa.int64()),
            }
        )

    return _docs(source).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# PII scan / redaction

# RE2 on both sides: Arrow's count/replace_substring_regex and DuckDB's
# regexp_* are both RE2, so match spans are identical by construction.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# sf augmentation: the synthetic corpus contains no PII, and an
# all-zero-count result would be a weak oracle.  Deterministically
# append a synthetic email to every 7th doc and an IPv4 to every 11th
# (replicated in the SQL oracle) — same pattern as the
# embedding_neardup_srp dup-every-100th CTE.
PII_EMAIL_EVERY = 7
PII_IP_EVERY = 11


def _pii_augment(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    id_str = pc.cast(batch["doc_id"], pa.string())
    email = pc.binary_join_element_wise(
        pa.array([" contact user"] * n, pa.string()),
        id_str,
        pa.array(["@example.com now"] * n, pa.string()),
        "",
    )
    ip = pc.binary_join_element_wise(
        pa.array([" from 10."] * n, pa.string()),
        pc.cast(pa.array(ids % 256, pa.int64()), pa.string()),
        pa.array([".0."] * n, pa.string()),
        pc.cast(pa.array(ids % 100, pa.int64()), pa.string()),
        pa.array([" port"] * n, pa.string()),
        "",
    )
    empty = pa.array([""] * n, pa.string())
    text = pc.binary_join_element_wise(
        pc.cast(batch["text"], pa.string()),
        pc.if_else(pa.array(ids % PII_EMAIL_EVERY == 0), email, empty),
        pc.if_else(pa.array(ids % PII_IP_EVERY == 0), ip, empty),
        "",
    )
    return pa.table({"doc_id": batch["doc_id"], "text": text})


def pii_scan_ds(source: str | rd.Dataset, *, augment: bool = True) -> rd.Dataset:
    """Per-doc PII counts + redacted length.

    Columns: ``doc_id, n_emails, n_ips, redacted_len``.  Redaction
    replaces emails with ``<EMAIL>`` then IPv4s with ``<IP>``;
    ``redacted_len`` is the character length of the redacted text
    (ASCII corpus, so Arrow utf8_length == DuckDB length).

    One RE2 scan per pattern per batch — no per-row Python.  ``augment``
    injects deterministic synthetic PII (sf tables contain none).
    """
    ds = _docs(source)
    if augment:
        ds = ds.map_batches(_pii_augment, batch_format="pyarrow",
                            zero_copy_batch=True)

    def scan(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        n_emails = pc.cast(
            pc.count_substring_regex(text, pattern=PII_EMAIL_RE), pa.int64()
        )
        n_ips = pc.cast(
            pc.count_substring_regex(text, pattern=PII_IPV4_RE), pa.int64()
        )
        red = pc.replace_substring_regex(
            text, pattern=PII_EMAIL_RE, replacement="<EMAIL>"
        )
        red = pc.replace_substring_regex(
            red, pattern=PII_IPV4_RE, replacement="<IP>"
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_emails": n_emails,
                "n_ips": n_ips,
                "redacted_len": pc.cast(pc.utf8_length(red), pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# benchmark decontamination

DECON_WINDOW = 8  # tokens per shingle
DECON_BENCH_EVERY = 50  # sf benchmark set: every 50th doc's shingles
# A benchmark/eval set is small BY DESIGN (the thing you must not train
# on); it is broadcast once per run.  Bound it loudly rather than let a
# mis-pointed "benchmark" silently become a second corpus.
DECON_MAX_BENCH_SHINGLES = 5_000_000


def _shingle_strings(batch: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """All ``DECON_WINDOW``-token shingle strings in the batch and the
    doc_id owning each (tokens joined by a single space)."""
    toks, token_doc, row_idx, _h1, _h2 = _batch_tokens(batch)
    n = len(toks)
    w = DECON_WINDOW
    if n < w:
        return pa.array([], pa.utf8()), np.empty(0, np.int64)
    # row_idx is sorted, so endpoints equal => whole window in one doc
    keep = row_idx[: n - w + 1] == row_idx[w - 1 :]
    pieces = [toks.slice(i, n - w + 1) for i in range(w)]
    joined = pc.binary_join_element_wise(*pieces, " ").filter(pa.array(keep))
    return joined, token_doc[: n - w + 1][keep]


def decontaminate_ds(
    source: str | rd.Dataset,
    benchmark: rd.Dataset | None = None,
) -> rd.Dataset:
    """Per-doc benchmark-overlap counts.

    Columns: ``doc_id, n_shingles, n_contaminated, contaminated``.
    ``n_contaminated`` counts shingle POSITIONS (not distinct shingles)
    whose 8-token window appears in the benchmark shingle set;
    ``contaminated`` is the 0/1 flag a filter stage would key on.

    ``benchmark`` defaults to the sf stand-in: the shingles of every
    ``DECON_BENCH_EVERY``-th document (real pipelines pass the eval-set
    corpus here).  The distinct benchmark shingles are ``ray.put`` once
    and probed with one vectorized ``is_in`` per batch — zero shuffle;
    the scan streams.
    """
    docs = _docs(source)
    if benchmark is None:

        def every_nth(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(ids % DECON_BENCH_EVERY == 0))

        benchmark = docs.map_batches(
            every_nth, batch_format="pyarrow", zero_copy_batch=True
        )

    def bench_shingles(batch: pa.Table) -> pa.Table:
        sh, _doc = _shingle_strings(batch)
        return pa.table({"shingle": pc.unique(sh)})

    bench_tbls = (
        benchmark.map_batches(bench_shingles, batch_format="pyarrow")
        .take_all()
    )
    uniq: set[str] = set()
    for row in bench_tbls:
        uniq.add(row["shingle"])
        if len(uniq) > DECON_MAX_BENCH_SHINGLES:
            raise ValueError(
                f"benchmark shingle set exceeds {DECON_MAX_BENCH_SHINGLES:,}; "
                "a benchmark this large should be hash-joined, not broadcast "
                "— pass a smaller eval set or shard it"
            )
    bench_arr = pa.array(sorted(uniq), pa.utf8())
    bref = ray.put(bench_arr)

    def scan(batch: pa.Table) -> pa.Table:
        bench = ray.get(bref)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh, sh_doc = _shingle_strings(batch)
        n_sh = np.zeros(len(doc_ids), np.int64)
        n_hit = np.zeros(len(doc_ids), np.int64)
        if len(sh):
            idx = _align_to_rows(doc_ids, sh_doc)
            np.add.at(n_sh, idx, 1)
            hit = pc.is_in(sh, value_set=bench).to_numpy(zero_copy_only=False)
            np.add.at(n_hit, idx[hit], 1)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_contaminated": pa.array(n_hit, pa.int64()),
                "contaminated": pa.array((n_hit > 0).astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# per-doc TF-IDF top terms

TFIDF_TOP_K = 3


def tfidf_top_terms_ds(source: str | rd.Dataset, *, k: int = TFIDF_TOP_K) -> rd.Dataset:
    """Top-k terms per document under the EXACT integer order
    (tf desc, df asc, term asc) with a rounded tf-idf score.

    Columns: ``doc_id, term, tf, df, score, rank`` where ``score =
    round(tf * log2((N + 1) / (df + 1)), 6)``.  The RANK is taken on
    integer keys only, so float log differences can never reorder rows
    — the score is a payload, rounded identically to DuckDB.

    Shape: per-batch Arrow group_by -> exact (doc, term, tf) rows
    (documents never span batches); term-sharded exchange computes df
    and joins it in place (`_sharded_groupby`, vectorized pandas — the
    same one-exchange df pattern as the index build's term partitions,
    cf. reference merge stage src/sort.c provenance in build.py);
    doc-sharded exchange takes the per-doc top-k.  Two bounded
    exchanges, no broadcast of the vocabulary.
    """
    from .dedup import _sharded_groupby

    docs = _docs(source)
    n_docs = docs.count()

    def tf_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, _row_idx, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.utf8()),
                    "tf": pa.array([], pa.int64()),
                    "th": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "doc_id": pa.array(token_doc, pa.int64()),
                "term": toks,
                "th": pa.array(h1.view(np.int64), pa.int64()),
            }
        )
        tf = t.group_by(["doc_id", "term"]).aggregate(
            [("term", "count"), ("th", "min")]
        )
        return pa.table(
            {
                "doc_id": tf["doc_id"],
                "term": tf["term"],
                "tf": tf["term_count"].cast(pa.int64()),
                "th": tf["th_min"],
            }
        )

    tf_rows = docs.map_batches(tf_batch, batch_format="pyarrow",
                               zero_copy_batch=True)

    def df_join(g: pd.DataFrame) -> pd.DataFrame:
        # one row per (doc, term): df = row count per term in this shard
        # (a term's rows all land in this shard — the shard key is the
        # term hash)
        g = g.copy()
        g["df"] = g.groupby("term")["term"].transform("size").astype("int64")
        return g[["doc_id", "term", "tf", "df"]]

    tfdf_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.utf8()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
        ]
    )
    tfdf = _sharded_groupby(tf_rows, ["th"], df_join, empty_schema=tfdf_schema)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "tf", "df", "term"],
            ascending=[True, False, True, True],
            kind="mergesort",
        )
        g["rank"] = g.groupby("doc_id").cumcount() + 1
        g = g[g["rank"] <= k].copy()
        idf = np.log2((float(n_docs) + 1.0) / (g["df"].to_numpy() + 1.0))
        g["score"] = round_half_away(g["tf"].to_numpy() * idf, 6)
        g["rank"] = g["rank"].astype("int64")
        return g[["doc_id", "term", "tf", "df", "score", "rank"]]

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.utf8()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score", pa.float64()),
            ("rank", pa.int64()),
        ]
    )
    return _sharded_groupby(tfdf, ["doc_id"], topk, empty_schema=out_schema)


# ---------------------------------------------------------------------------
# stratified per-language sampling

# per-language keep rates in percent (rebalancing: downsample the
# over-represented head, keep the tail) — arbitrary but fixed; the SQL
# oracle carries the same table.
STRATA_RATES: dict[str, int] = {"en": 10, "zh": 80, "es": 50, "de": 50, "fr": 50}
STRATA_DEFAULT_RATE = 25


def stratified_sample_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Deterministic per-language hash sample: keep a doc iff its
    Fibonacci-multiply hash bucket (same hash as ``sample_hash``) falls
    under its language's keep rate.  Columns: ``doc_id, lang, dl``.

    Same rows at ANY parallelism / cluster size — no RNG, no state.
    """
    from .catalog import SAMPLE_MULT

    def filt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            bucket = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(100)
        # rate lookup via dictionary codes: Python touches only the
        # (few) distinct languages, never the rows
        enc = pc.dictionary_encode(batch["lang"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        rate_by_code = np.fromiter(
            (
                STRATA_RATES.get(v, STRATA_DEFAULT_RATE)
                for v in enc.dictionary.to_pylist()
            ),
            np.uint64,
            len(enc.dictionary),
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        keep = bucket < rate_by_code[codes]
        kept = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pc.cast(kept["doc_id"], pa.int64()),
                "lang": pc.cast(kept["lang"], pa.string()),
                "dl": pc.cast(
                    pc.binary_length(pc.cast(kept["text"], pa.binary())), pa.int64()
                ),
            }
        )

    from ..sources.util import read_parquet_sized
    import os

    if isinstance(source, rd.Dataset):
        ds = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        ds = read_parquet_sized(path, columns=["doc_id", "lang", "text"])
    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# cross-doc duplicated-substring spans (exact-substring dedup, shingle
# granularity — the Ray-Data shape of the suffix-array substring dedup
# used on LLM training corpora)

SUBSTR_WINDOW = 20  # tokens per window
SUBSTR_CLONE_EVERY = 100  # sf augmentation: clone every 100th doc
SUBSTR_CLONE_OFFSET = 10_000_000


def _substr_augment(batch: pa.Table) -> pa.Table:
    """Deterministic sf augmentation (mirrored in the SQL oracle): append
    a clone of every ``SUBSTR_CLONE_EVERY``-th doc under a shifted id, so
    the synthetic corpus (whose 20-token windows never repeat naturally)
    exercises the duplicated-span path."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = ids % SUBSTR_CLONE_EVERY == 0
    clones = batch.filter(pa.array(m))
    shifted = pa.table(
        {
            "doc_id": pc.add(clones["doc_id"], SUBSTR_CLONE_OFFSET),
            "text": clones["text"],
        }
    )
    base = pa.table({"doc_id": batch["doc_id"], "text": batch["text"]})
    return pa.concat_tables([base, shifted])


def substring_dup_spans_ds(
    source: str | rd.Dataset, *, augment: bool = True
) -> rd.Dataset:
    """Per-doc duplicated-substring statistics: a window position is
    duplicated iff its ``SUBSTR_WINDOW``-token shingle occurs in >= 2
    DISTINCT documents.  Columns: ``doc_id, n_windows, n_dup_windows,
    dup_frac, has_dup``.

    Shape: one shingle exchange (`_sharded_groupby` keyed on an INTERNAL
    dual-FNV window hash — the key never reaches the output, so the SQL
    oracle needn't replicate it; groups are compared on the exact
    shingle STRING inside the shard), partial per-doc dup counts, then a
    doc-keyed sharded sum merges them with the formula-derived window
    totals.  Exactness note: strings ride the exchange (~6x the hash
    bytes) — the declared cost of EXACT substring semantics; the
    hash-only variant with a verify pass is the 100-TB bandwidth
    optimization, same plan shape.
    """
    from .dedup import _sharded_groupby

    docs = _docs(source)
    if augment:
        docs = docs.map_batches(
            _substr_augment, batch_format="pyarrow", zero_copy_batch=True
        )
    w = SUBSTR_WINDOW

    def windows(batch: pa.Table) -> pa.Table:
        toks, token_doc, row_idx, h1, h2 = _batch_tokens(batch)
        n = len(toks)
        if n < w:
            return pa.table(
                {
                    "wh": pa.array([], pa.int64()),
                    "shingle": pa.array([], pa.utf8()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        keep = row_idx[: n - w + 1] == row_idx[w - 1 :]
        pieces = [toks.slice(i, n - w + 1) for i in range(w)]
        joined = pc.binary_join_element_wise(*pieces, " ").filter(pa.array(keep))
        # internal shard key: XOR-rotate fold of the token dual-hashes
        # (deterministic; collisions only co-locate more strings)
        acc = np.zeros(n - w + 1, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(w):
                hv = h1[i : i + n - w + 1]
                acc = (acc ^ hv) * np.uint64(1099511628211)
        return pa.table(
            {
                "wh": pa.array(acc[keep].view(np.int64), pa.int64()),
                "shingle": joined,
                "doc_id": pa.array(token_doc[: n - w + 1][keep], pa.int64()),
            }
        )

    win = docs.map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)

    def dup_partial(g: pd.DataFrame) -> pd.DataFrame:
        # a shingle's rows ALL land in this shard (shard key = its hash):
        # exact distinct-doc count per shingle string
        ndocs = g.groupby("shingle")["doc_id"].transform("nunique")
        dup = g[ndocs >= 2]
        out = dup.groupby("doc_id", as_index=False).size()
        out.columns = ["doc_id", "n_dup_windows"]
        out["n_windows"] = np.int64(0)
        return out[["doc_id", "n_windows", "n_dup_windows"]]

    part_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_windows", pa.int64()),
            ("n_dup_windows", pa.int64()),
        ]
    )
    dup_parts = _sharded_groupby(win, ["wh"], dup_partial, empty_schema=part_schema)

    def totals(batch: pa.Table) -> pa.Table:
        _toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        n_rows = batch.num_rows
        cnt = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_windows": pa.array(np.maximum(cnt - w + 1, 0), pa.int64()),
                "n_dup_windows": pa.array(np.zeros(n_rows, np.int64), pa.int64()),
            }
        )

    tot = docs.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", as_index=False).sum()
        nw = m["n_windows"].to_numpy(np.int64)
        nd = m["n_dup_windows"].to_numpy(np.int64)
        m["dup_frac"] = round_half_away(nd / np.maximum(nw, 1), 6)
        m["has_dup"] = (nd > 0).astype(np.int64)
        return m[["doc_id", "n_windows", "n_dup_windows", "dup_frac", "has_dup"]]

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_windows", pa.int64()),
            ("n_dup_windows", pa.int64()),
            ("dup_frac", pa.float64()),
            ("has_dup", pa.int64()),
        ]
    )
    return _sharded_groupby(tot.union(dup_parts), ["doc_id"], merge,
                            empty_schema=out_schema)


# ---------------------------------------------------------------------------
# length-outlier filter (quantile-composed)

OUTLIER_LO_Q = 0.05
OUTLIER_HI_Q = 0.95


def length_outlier_filter_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Keep docs whose byte length lies within the corpus's
    [``OUTLIER_LO_Q``, ``OUTLIER_HI_Q``] quantile_disc band — the
    standard "drop truncated fragments and concatenation monsters" pass.
    Columns: ``doc_id, n_chars``.

    Composes the exact-quantile machinery (`quantiles.exact_quantiles_disc`:
    histogram refinement over order-preserving keys; only fixed-size
    histograms reach the driver) with a threshold broadcast and one
    streaming filter scan.
    """
    from .quantiles import exact_quantiles_disc

    docs = _docs(source)

    def lengths(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_chars": pc.cast(
                    pc.binary_length(pc.cast(batch["text"], pa.binary())),
                    pa.float64(),
                ),
            }
        )

    lens = docs.map_batches(lengths, batch_format="pyarrow", zero_copy_batch=True)
    qdf = exact_quantiles_disc(lens, "n_chars", [OUTLIER_LO_Q, OUTLIER_HI_Q])
    lo = float(qdf["value"].iloc[0])
    hi = float(qdf["value"].iloc[1])

    def filt(batch: pa.Table) -> pa.Table:
        nc = (
            pc.binary_length(pc.cast(batch["text"], pa.binary()))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = (nc >= lo) & (nc <= hi)
        kept = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pc.cast(kept["doc_id"], pa.int64()),
                "n_chars": pc.cast(
                    pc.binary_length(pc.cast(kept["text"], pa.binary())), pa.int64()
                ),
            }
        )

    return docs.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# sequence packing (distributed ordered prefix-scan)

SEQ_PACK_LEN = 256  # token budget per training sequence
# bucket width for the two-level scan: bucket count stays <= ~1M at any
# corpus size (driver holds one int64 per bucket); a third scan level is
# the 10^13-doc extension, same shape
SEQ_PACK_MIN_BUCKET = 4096


def sequence_pack_ds(
    source: str | rd.Dataset, *, seq_len: int = SEQ_PACK_LEN
) -> rd.Dataset:
    """Global token offsets + fixed-budget sequence assignment in
    doc_id order.  Columns: ``doc_id, n_tokens, tok_offset, seq_id``
    where ``tok_offset`` is the EXCLUSIVE prefix sum of clean-token
    counts ordered by doc_id and ``seq_id = tok_offset // seq_len`` —
    the deterministic "which training sequence does this doc start in"
    assignment every packing pipeline needs, identical at any
    parallelism.

    Shape — two-level distributed scan: (1) one streaming pass emits
    per-doc counts plus per-BUCKET partial sums (bucket = doc_id //
    width, width sized so bucket count <= ~1M); the driver exclusive-
    cumsums the tiny bucket table and broadcasts it; (2) a bucket-keyed
    sharded exchange computes intra-bucket cumsums (all rows of a
    bucket co-locate) and adds the bucket offset.  Only O(#buckets)
    rows ever reach the driver.
    """
    from .dedup import _sharded_groupby

    docs = _docs(source)
    n_docs = docs.count()
    width = max(SEQ_PACK_MIN_BUCKET, -(-n_docs // 1_000_000))

    def counts(batch: pa.Table) -> pa.Table:
        _toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        n_rows = batch.num_rows
        cnt = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(cnt, pa.int64()),
                "bucket": pa.array(ids // width, pa.int64()),
            }
        )

    per_doc = docs.map_batches(counts, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def bucket_partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("bucket").aggregate([("n_tokens", "sum")])
        return pa.table(
            {"bucket": agg["bucket"], "bsum": agg["n_tokens_sum"].cast(pa.int64())}
        )

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bucket", as_index=False)["bsum"].sum()

    bsch = pa.schema([("bucket", pa.int64()), ("bsum", pa.int64())])
    bucket_rows = _sharded_groupby(
        per_doc.map_batches(bucket_partial, batch_format="pyarrow"),
        ["bucket"],
        bucket_merge,
        empty_schema=bsch,
    ).take_all()
    buckets = np.array([r["bucket"] for r in bucket_rows], np.int64)
    bsums = np.array([r["bsum"] for r in bucket_rows], np.int64)
    order = np.argsort(buckets)
    buckets, bsums = buckets[order], bsums[order]
    offsets = np.concatenate([[0], np.cumsum(bsums)[:-1]]) if len(bsums) else bsums
    bref = ray.put((buckets, offsets))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        bk, off = ray.get(bref)
        g = g.sort_values("doc_id", kind="mergesort").copy()
        local = g.groupby("bucket")["n_tokens"].cumsum() - g["n_tokens"]
        base = off[np.searchsorted(bk, g["bucket"].to_numpy(np.int64))]
        g["tok_offset"] = (base + local.to_numpy(np.int64)).astype("int64")
        g["seq_id"] = (g["tok_offset"] // seq_len).astype("int64")
        return g[["doc_id", "n_tokens", "tok_offset", "seq_id"]]

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("tok_offset", pa.int64()),
            ("seq_id", pa.int64()),
        ]
    )
    return _sharded_groupby(per_doc, ["bucket"], scan, empty_schema=out_schema)


# ---------------------------------------------------------------------------
# fuzzy string join (edit distance <= 1) via deletion signatures

FUZZY_MIN_LEN = 4  # sf typo augmentation: only words long enough to maul


def _ed1_verify(a: np.ndarray, b: np.ndarray, la: np.ndarray,
                lb: np.ndarray) -> np.ndarray:
    """Vectorized exact edit-distance<=1 check over zero-padded (n, 16)
    byte matrices (``hashing.pack16`` layout).  Candidates arrive with
    |len(a) - len(b)| <= 1 and a != b; true iff one substitution (equal
    lengths, exactly one mismatching column) or one deletion (len diff
    1: bytes equal up to the first mismatch, then the longer shifted
    left by one equals the shorter's tail)."""
    n = len(la)
    if n == 0:
        return np.zeros(0, bool)
    mism = a != b  # (n, 16)
    n_mism = mism.sum(axis=1)
    out = np.zeros(n, bool)
    same_len = la == lb
    out[same_len] = n_mism[same_len] == 1
    # deletion case: order so x is the LONGER word
    dl = ~same_len
    if dl.any():
        swap = lb > la
        x = np.where(swap[:, None], b, a)
        y = np.where(swap[:, None], a, b)
        # first mismatching column per row (16 if none — impossible here
        # since x != y)
        first = np.where(mism.any(axis=1), mism.argmax(axis=1), 16)
        # shift x left by one from the mismatch on: x[:, j+1] vs y[:, j]
        xs = np.zeros_like(x)
        xs[:, :-1] = x[:, 1:]
        tail_eq = xs == y
        cols = np.arange(16)[None, :]
        tail_ok = (tail_eq | (cols < first[:, None])).all(axis=1)
        out[dl] = tail_ok[dl]
    return out


def fuzzy_term_pairs_ds(source: str | rd.Dataset, *, augment: bool = True) -> rd.Dataset:
    """All UNORDERED pairs of distinct corpus terms at edit distance
    <= 1 (the spell-variant / fuzzy-string join).  Columns:
    ``term_a, term_b, dist`` with ``term_a < term_b``, dist in {1}.

    Shape — FastSS deletion signatures: every vocab word emits itself
    plus its single-char deletions (<= 16 signatures/word); two words
    within edit distance 1 ALWAYS share a signature (guaranteed recall
    — delete the substituted/inserted position), so candidates are
    signature-bucket pairs, verified EXACTLY by a vectorized byte-matrix
    check — never an all-pairs scan.  One sharded exchange keyed on the
    signature hash; a second dedups pairs (a pair can share several
    signatures).

    ``augment`` adds substr(term, 2) variants of long words (mirrored in
    the SQL oracle) because the sf vocabulary has no natural typos.
    """
    from ..functions.hashing import pack16, term_hash
    from .dedup import _sharded_groupby

    docs = _docs(source)

    def vocab_batch(batch: pa.Table) -> pa.Table:
        toks, _td, _ri, _h1, _h2 = _batch_tokens(batch)
        u = pc.unique(toks)
        if augment and len(u):
            import pyarrow.compute as _pc

            lens = _pc.utf8_length(u)
            longw = u.filter(_pc.greater_equal(lens, FUZZY_MIN_LEN))
            u = pc.unique(
                pa.concat_arrays([u, _pc.utf8_slice_codeunits(longw, 1)])
            )
        return pa.table({"term": u})

    vocab_parts = docs.map_batches(vocab_batch, batch_format="pyarrow")

    # global distinct via term-hash sharding (vectorized inside shards)
    def add_h(t: pa.Table) -> pa.Table:
        h = term_hash(t["term"]).view(np.int64)
        return t.append_column("th", pa.array(h, pa.int64()))

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("term")[["term"]]

    vschema = pa.schema([("term", pa.utf8())])
    vocab = _sharded_groupby(
        vocab_parts.map_batches(add_h, batch_format="pyarrow"),
        ["th"],
        distinct,
        empty_schema=vschema,
    )

    def signatures(t: pa.Table) -> pa.Table:
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        n = len(terms)
        if n == 0:
            return pa.table(
                {"sh": pa.array([], pa.int64()), "term": pa.array([], pa.utf8())}
            )
        packed = pack16(terms)  # (n, 16)
        lens = np.char.str_len(np.asarray(terms.to_pylist(), dtype=object).astype(str))
        sig_terms: list[pa.Array] = [terms]
        sig_bytes: list[np.ndarray] = [packed]
        # deletion variants, one shift per position (byte matrices only)
        maxlen = int(lens.max())
        for i in range(maxlen):
            has = lens > i
            sub = packed[has]
            d = sub.copy()
            d[:, i:-1] = sub[:, i + 1 :]
            d[:, -1] = 0
            sig_bytes.append(d)
            sig_terms.append(terms.filter(pa.array(has)))
        allb = np.vstack(sig_bytes)
        # hash the signature bytes (FNV over the 16 columns)
        with np.errstate(over="ignore"):
            h = np.full(len(allb), np.uint64(1469598103934665603))
            for j in range(16):
                h = (h ^ allb[:, j].astype(np.uint64)) * np.uint64(1099511628211)
        return pa.table(
            {
                "sh": pa.array(h.view(np.int64), pa.int64()),
                "term": pa.concat_arrays(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                     for x in sig_terms]
                ),
            }
        )

    sigs = vocab.map_batches(signatures, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # pairs within each signature bucket; buckets are tiny (a word's
        # deletion neighborhood), so the quadratic is per-bucket bounded
        out_a, out_b = [], []
        for _, grp in g.groupby("sh"):
            ts = sorted(set(grp["term"]))
            if len(ts) < 2:
                continue
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    out_a.append(ts[i])
                    out_b.append(ts[j])
        return pd.DataFrame({"term_a": out_a, "term_b": out_b})

    pschema = pa.schema([("term_a", pa.utf8()), ("term_b", pa.utf8())])
    cand = _sharded_groupby(sigs, ["sh"], bucket_pairs, empty_schema=pschema)

    def add_pair_h(t: pa.Table) -> pa.Table:
        from ..functions.hashing import term_hash as th

        h = th(t["term_a"]).view(np.int64) ^ th(t["term_b"]).view(np.int64)
        return t.append_column("ph", pa.array(h, pa.int64()))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import pack16 as p16

        g = g.drop_duplicates(["term_a", "term_b"])
        if not len(g):
            return pd.DataFrame({"term_a": [], "term_b": [], "dist": []})
        ta = pa.array(g["term_a"].tolist(), pa.utf8())
        tb = pa.array(g["term_b"].tolist(), pa.utf8())
        a, b = p16(ta), p16(tb)
        la = np.fromiter((len(x) for x in g["term_a"]), np.int64, len(g))
        lb = np.fromiter((len(x) for x in g["term_b"]), np.int64, len(g))
        keep = (np.abs(la - lb) <= 1) & _ed1_verify(a, b, la, lb)
        out = g[keep].copy()
        out["dist"] = np.int64(1)
        return out[["term_a", "term_b", "dist"]]

    oschema = pa.schema(
        [("term_a", pa.utf8()), ("term_b", pa.utf8()), ("dist", pa.int64())]
    )
    return _sharded_groupby(
        cand.map_batches(add_pair_h, batch_format="pyarrow"),
        ["ph"],
        verify,
        empty_schema=oschema,
    )


# ---------------------------------------------------------------------------
# term co-occurrence / association strength (lift)

COOC_TOP_VOCAB = 64
COOC_TOP_PAIRS = 50


def top_vocab_df(docs: rd.Dataset, top_vocab: int) -> pd.DataFrame:
    """The ``top_vocab`` most document-frequent terms (df = distinct
    presence) under the deterministic order (df desc, term asc).
    Per-batch distinct presence + a term-sharded exchange that keeps
    only the per-shard top-``top_vocab`` candidates — a shard owns all
    rows of its terms, so the global top-V is always contained in the
    union of per-shard top-Vs and the driver merge is bounded."""
    from .dedup import _sharded_groupby

    def df_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, _r, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return pa.table(
                {
                    "term": pa.array([], pa.utf8()),
                    "th": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "doc_id": pa.array(token_doc, pa.int64()),
                "term": toks,
                "th": pa.array(h1.view(np.int64), pa.int64()),
            }
        )
        d = t.group_by(["doc_id", "term"]).aggregate([("th", "min")])
        g = (
            pa.table({"term": d["term"], "th": d["th_min"]})
            .group_by(["term"])
            .aggregate([("th", "min"), ([], "count_all")])
        )
        return pa.table(
            {
                "term": g["term"],
                "th": g["th_min"],
                "df": g["count_all"].cast(pa.int64()),
            }
        )

    def shard_topv(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", as_index=False)["df"].sum()
        s = s.sort_values(
            ["df", "term"], ascending=[False, True], kind="mergesort"
        ).head(top_vocab)
        s["df"] = s["df"].astype("int64")
        return s[["term", "df"]]

    vschema = pa.schema([("term", pa.utf8()), ("df", pa.int64())])
    cand = _sharded_groupby(
        docs.map_batches(df_batch, batch_format="pyarrow", zero_copy_batch=True),
        ["th"],
        shard_topv,
        empty_schema=vschema,
    ).to_pandas()
    if not len(cand):
        # Ray drops typed empty blocks -> column-less frame on an
        # all-empty corpus; restore the contract
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype="int64")})
    return cand.sort_values(
        ["df", "term"], ascending=[False, True], kind="mergesort"
    ).head(top_vocab)


def term_cooccurrence(
    source: str | rd.Dataset,
    *,
    top_vocab: int = COOC_TOP_VOCAB,
    top_pairs: int = COOC_TOP_PAIRS,
) -> pd.DataFrame:
    """Top co-occurring term pairs (document-level presence) among the
    ``top_vocab`` most frequent terms, with the association ``lift`` =
    P(a,b) / (P(a)·P(b)) = c_ab·N / (df_a·df_b) as a rounded payload.

    Lift is exp(PMI) — the same ranking, chosen over PMI itself so the
    SQL pairing never computes a transcendental (libm ``ln`` can differ
    from DuckDB's in the last ulp; a ratio of exact int64 products is
    IEEE-deterministic on both sides).  The RANK is taken on integer
    keys only (c_ab desc, term_a asc, term_b asc).

    Shape (100 TB): pass 1 computes df per term via per-batch distinct
    presence + a term-sharded exchange and keeps only the per-shard
    top-``top_vocab`` candidates (bounded driver merge).  Pass 2 ships
    the tiny vocabulary to every task and accumulates the V×V
    co-occurrence matrix with ONE boolean-matrix matmul per batch —
    fixed-size partials, no pair explosion, no shuffle.  Columns:
    ``term_a, term_b, c_ab, df_a, df_b, lift, rank``.
    """
    docs = _docs(source)
    n_docs = docs.count()
    cand = top_vocab_df(docs, top_vocab)
    out_cols = ["term_a", "term_b", "c_ab", "df_a", "df_b", "lift", "rank"]
    if len(cand) < 2:
        return pd.DataFrame(columns=out_cols)
    vocab_terms = cand["term"].tolist()
    vocab_df = cand["df"].to_numpy().astype(np.int64)
    vocab_arr = pa.array(vocab_terms, pa.utf8())
    nv = len(vocab_terms)

    def cooc_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, *_ = _batch_tokens(batch)
        empty = pa.table(
            {
                "ia": pa.array([], pa.int64()),
                "ib": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(toks):
            return empty
        idx = pc.index_in(toks, value_set=vocab_arr)
        iv = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = iv >= 0
        if not keep.any():
            return empty
        urows, dinv = np.unique(token_doc[keep], return_inverse=True)
        m = np.zeros((len(urows), nv), np.int64)
        m[dinv, iv[keep]] = 1
        cm = m.T @ m
        ia, ib = np.triu_indices(nv, k=1)
        c = cm[ia, ib]
        nz = c > 0
        return pa.table(
            {
                "ia": pa.array(ia[nz].astype(np.int64)),
                "ib": pa.array(ib[nz].astype(np.int64)),
                "c": pa.array(c[nz]),
            }
        )

    parts = docs.map_batches(
        cooc_batch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame(columns=out_cols)
    agg = parts.groupby(["ia", "ib"], as_index=False)["c"].sum()
    ia = agg["ia"].to_numpy().astype(np.int64)
    ib = agg["ib"].to_numpy().astype(np.int64)
    c_ab = agg["c"].to_numpy().astype(np.int64)
    sa = np.asarray(vocab_terms, dtype=object)[ia]
    sb = np.asarray(vocab_terms, dtype=object)[ib]
    # canonicalize to lexicographic (term_a < term_b) like the SQL join
    swap = sa > sb
    term_a = np.where(swap, sb, sa)
    term_b = np.where(swap, sa, sb)
    df_a = np.where(swap, vocab_df[ib], vocab_df[ia])
    df_b = np.where(swap, vocab_df[ia], vocab_df[ib])
    lift = round_half_away(
        (c_ab * np.int64(n_docs)).astype(np.float64)
        / (df_a * df_b).astype(np.float64),
        6,
    )
    out = pd.DataFrame(
        {
            "term_a": term_a,
            "term_b": term_b,
            "c_ab": c_ab,
            "df_a": df_a.astype("int64"),
            "df_b": df_b.astype("int64"),
            "lift": lift,
        }
    ).sort_values(
        ["c_ab", "term_a", "term_b"],
        ascending=[False, True, True],
        kind="mergesort",
    )
    out = out.head(top_pairs).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[out_cols]


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV-rate quality signal

OOV_TOP_VOCAB = 64


def vocab_coverage_ds(
    source: str | rd.Dataset, *, top_vocab: int = OOV_TOP_VOCAB
) -> rd.Dataset:
    """Per-doc vocabulary coverage against the global top-``top_vocab``
    document-frequency vocabulary: ``n_tokens`` (kept tokens, with
    multiplicity), ``n_in_vocab`` and ``oov_rate = round((n_tokens -
    n_in_vocab) / n_tokens, 6)`` (NULL for token-less docs) — the
    rare-token-rate quality signal (cf. the Gopher "stop word /
    frequent word fraction" family).

    Shape: one bounded vocabulary pass (:func:`top_vocab_df`), then a
    single streaming map_batches with the tiny vocab shipped in the
    closure — integer counts per doc, float only as a rounded payload.
    """
    docs = _docs(source)
    vocab = top_vocab_df(docs, top_vocab)
    vocab_arr = pa.array(vocab["term"].tolist(), pa.utf8())

    def per_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, _row_idx, _h1, _h2 = _batch_tokens(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.zeros(len(doc_ids), np.int64)
        n_in = np.zeros(len(doc_ids), np.int64)
        if len(toks):
            in_vocab = pc.is_in(toks, value_set=vocab_arr).to_numpy(
                zero_copy_only=False
            )
            ud, counts = np.unique(token_doc, return_counts=True)
            idx = _align_to_rows(doc_ids, ud)
            n_tok[idx] = counts
            ud2, counts2 = np.unique(token_doc[in_vocab], return_counts=True)
            if len(ud2):
                n_in[_align_to_rows(doc_ids, ud2)] = counts2
        safe = np.maximum(n_tok, 1).astype(np.float64)
        rate = round_half_away((n_tok - n_in) / safe, 6)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_in_vocab": pa.array(n_in, pa.int64()),
                "oov_rate": pc.if_else(
                    pa.array(n_tok > 0),
                    pa.array(rate, pa.float64()),
                    pa.scalar(None, pa.float64()),
                ),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# per-doc unigram entropy (fixed-point log2 — order-independent float)

ENTROPY_LOG_SCALE = 1_000_000_000
ENTROPY_MAX_TF = 1 << 16


def _log2_fp(k: np.ndarray) -> np.ndarray:
    """Fixed-point log2 table both sides share: ``round(log2(k) * 1e9)``
    (half-away, matching DuckDB ``round``) as int64.

    DuckDB's ``log2`` and numpy's differ by 1 ulp on ~0.8% of integer
    inputs, so raw float log sums are NOT reproducible across the two
    engines.  Quantizing each per-term value to an integer FIRST makes
    every downstream sum order-independent and engine-independent —
    provided the quantization itself agrees.  It does over the whole
    reachable domain: ``tests/test_entropy.py`` exhaustively compares
    this table against DuckDB's ``CAST(round(log2(x)*1e9) AS BIGINT)``
    for every k in [1, 2^16], and the runtime asserts k < 2^16 (a term
    frequency above 65535 would need a >64 KiB single-term document —
    the builder's own doc-size ceilings sit far below that).
    """
    if len(k) and int(k.max()) >= ENTROPY_MAX_TF:
        raise ValueError(
            f"token_entropy: term frequency {int(k.max())} >= {ENTROPY_MAX_TF} "
            "exceeds the exhaustively-verified fixed-point log2 domain"
        )
    return round_half_away(
        np.log2(k.astype(np.float64)) * ENTROPY_LOG_SCALE, 0
    ).astype(np.int64)


def token_entropy_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc unigram (token) entropy in bits — the classic
    quality/diversity signal (low entropy = repetitive/templated text).

    ``H = log2(dl) - (1/dl) * sum_t tf_t * log2(tf_t)`` computed ENTIRELY
    in fixed-point integers: with ``L(k) = round(log2(k)*1e9)``,
    ``entropy = round((L(dl)*dl - sum_t tf_t*L(tf_t)) / (dl*1e9), 6)``.
    The numerator and denominator are exact int64 on both engines, so
    the single float division (and the rounded payload) is bit-identical
    regardless of summation order.  NULL for token-less docs.

    Shape: zero exchanges — documents never span batches, so per-doc
    tf and the entropy reduce inside one streaming ``map_batches``.
    """
    docs = _docs(source)

    def per_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, _row_idx, _h1, _h2 = _batch_tokens(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = np.zeros(len(doc_ids), np.int64)
        s = np.zeros(len(doc_ids), np.int64)
        if len(toks):
            t = pa.table(
                {"doc_id": pa.array(token_doc, pa.int64()), "term": toks}
            )
            tf = t.group_by(["doc_id", "term"]).aggregate([("term", "count")])
            tfn = tf["term_count"].to_numpy(zero_copy_only=False).astype(np.int64)
            contrib = tfn * _log2_fp(tfn)
            per_doc = pa.table(
                {
                    "doc_id": tf["doc_id"],
                    "n": pa.array(tfn, pa.int64()),
                    "c": pa.array(contrib, pa.int64()),
                }
            ).group_by("doc_id").aggregate([("n", "sum"), ("c", "sum")])
            ud = per_doc["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = _align_to_rows(doc_ids, ud)
            dl[idx] = per_doc["n_sum"].to_numpy(zero_copy_only=False)
            s[idx] = per_doc["c_sum"].to_numpy(zero_copy_only=False)
        pos = dl > 0
        ent = np.zeros(len(doc_ids), np.float64)
        if pos.any():
            dlp = dl[pos]
            num = (_log2_fp(dlp) * dlp - s[pos]).astype(np.float64)
            den = (dlp * ENTROPY_LOG_SCALE).astype(np.float64)
            ent[pos] = round_half_away(num / den, 6)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(dl, pa.int64()),
                "entropy": pc.if_else(
                    pa.array(pos),
                    pa.array(ent, pa.float64()),
                    pa.scalar(None, pa.float64()),
                ),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# PageRank over the term co-occurrence graph (fixed-point, SQL-exact)

PR_TOP_VOCAB = 64
PR_ITERS = 5
PR_SCALE = 1_000_000_000_000  # rank fixed-point: 1.0 == 10^12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def cooc_adjacency(docs: rd.Dataset, vocab_terms: list[str]) -> np.ndarray:
    """Symmetric 0/1 co-occurrence adjacency over a BOUNDED vocabulary:
    one streaming pass, per-batch V x V boolean matmul partials (edge
    lists, never raw pairs), bounded driver union.  Shared by the graph
    entries (PageRank, triangle counting)."""
    vocab_arr = pa.array(vocab_terms, pa.utf8())
    nv = len(vocab_terms)

    def cooc_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, *_ = _batch_tokens(batch)
        empty = pa.table(
            {"ia": pa.array([], pa.int64()), "ib": pa.array([], pa.int64())}
        )
        if not len(toks):
            return empty
        idx = pc.index_in(toks, value_set=vocab_arr)
        iv = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = iv >= 0
        if not keep.any():
            return empty
        urows, dinv = np.unique(token_doc[keep], return_inverse=True)
        m = np.zeros((len(urows), nv), np.int64)
        m[dinv, iv[keep]] = 1
        cm = m.T @ m
        ia, ib = np.triu_indices(nv, k=1)
        nz = cm[ia, ib] > 0
        return pa.table(
            {
                "ia": pa.array(ia[nz].astype(np.int64)),
                "ib": pa.array(ib[nz].astype(np.int64)),
            }
        )

    parts = docs.map_batches(
        cooc_batch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    adj = np.zeros((nv, nv), np.int64)
    if len(parts):
        e = parts.drop_duplicates()
        adj[e["ia"].to_numpy(), e["ib"].to_numpy()] = 1
        adj = adj | adj.T  # NOT |=: in-place OR with a transpose view aliases
    return adj


def pagerank_terms(
    source: str | rd.Dataset,
    *,
    top_vocab: int = PR_TOP_VOCAB,
    iters: int = PR_ITERS,
) -> pd.DataFrame:
    """PageRank over the co-occurrence graph of the ``top_vocab`` most
    document-frequent terms — the iterative-algorithm representative of
    the catalog, SQL-paired EXACTLY.

    Float PageRank can never be bit-compared across engines (sum order,
    libm), so the recurrence runs in fixed-point integers with floor
    division, identically on both sides::

        share_k(u) = r_k(u) // deg(u)
        r_{k+1}(v) = (15 * (SCALE // N)) // 100
                     + (85 * sum_{u ~ v} share_k(u)) // 100

    Every quantity is an exact int64 (mass <= SCALE = 10^12, damping in
    integer percent), so ``iters`` rounds of it are deterministic — the
    SQL oracle unrolls the same recurrence through chained CTEs.
    Dangling vocabulary terms (no co-occurrence edge) hold the base
    rank; their mass is not redistributed, by definition of this op.

    Shape (100 TB): two bounded passes — the df/top-vocab pass
    (:func:`top_vocab_df`) and one V x V boolean-matmul co-occurrence
    pass with fixed-size partials (same as :func:`term_cooccurrence`);
    the graph itself is vocabulary-bounded (V <= ``top_vocab``), so the
    5-round solve is a driver-side integer matmul on a tiny matrix.
    Columns: ``term, deg, pr, pr_rank`` (``pr`` is the fixed-point
    int64 rank after ``iters`` rounds).
    """
    docs = _docs(source)
    out_cols = ["term", "deg", "pr", "pr_rank"]
    cand = top_vocab_df(docs, top_vocab)
    if not len(cand):
        return pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                "deg": pd.Series([], dtype="int64"),
                "pr": pd.Series([], dtype="int64"),
                "pr_rank": pd.Series([], dtype="int64"),
            }
        )
    vocab_terms = cand["term"].tolist()
    adj = cooc_adjacency(docs, vocab_terms)
    nv = len(vocab_terms)
    deg = adj.sum(axis=1).astype(np.int64)
    base = (15 * (PR_SCALE // nv)) // PR_DAMP_DEN
    r = np.full(nv, PR_SCALE // nv, np.int64)
    safe_deg = np.maximum(deg, 1)
    for _ in range(iters):
        share = np.where(deg > 0, r // safe_deg, 0)
        r = base + (PR_DAMP_NUM * (adj @ share)) // PR_DAMP_DEN
    out = pd.DataFrame(
        {"term": np.asarray(vocab_terms, dtype=object), "deg": deg, "pr": r}
    ).sort_values(["pr", "term"], ascending=[False, True], kind="mergesort")
    out = out.reset_index(drop=True)
    out["pr_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["deg"] = out["deg"].astype("int64")
    out["pr"] = out["pr"].astype("int64")
    return out[out_cols]


# ---------------------------------------------------------------------------
# unigram language-model scoring (CCNet-style per-doc negative log-likelihood)

UNIGRAM_VOCAB = 4096
UNIGRAM_RGRID = (1 << 16) - 1  # probability grid: r/65536, r in [1, 65535]


def _count_vocab(docs: rd.Dataset, top_vocab: int) -> tuple[pd.DataFrame, int]:
    """Top-``top_vocab`` terms by TOTAL occurrence count (with
    multiplicity) plus the exact corpus token total.  Same bounded
    shape as :func:`top_vocab_df`: per-batch partial counts, one
    term-sharded exchange that keeps per-shard top-V candidates and a
    per-shard total row, bounded driver merge."""
    from .dedup import _sharded_groupby

    def cnt_batch(batch: pa.Table) -> pa.Table:
        toks, _token_doc, _r, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return pa.table(
                {
                    "term": pa.array([], pa.utf8()),
                    "th": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        g = (
            pa.table(
                {"term": toks, "th": pa.array(h1.view(np.int64), pa.int64())}
            )
            .group_by(["term"])
            .aggregate([("th", "min"), ([], "count_all")])
        )
        return pa.table(
            {
                "term": g["term"],
                "th": g["th_min"],
                "c": g["count_all"].cast(pa.int64()),
            }
        )

    def shard_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", as_index=False)["c"].sum()
        total = int(s["c"].sum())
        s = s.sort_values(
            ["c", "term"], ascending=[False, True], kind="mergesort"
        ).head(top_vocab)
        s["c"] = s["c"].astype("int64")
        s["shard_total"] = np.int64(0)
        # one marker row carries this shard's full token total
        marker = pd.DataFrame(
            {"term": [None], "c": [np.int64(0)], "shard_total": [np.int64(total)]}
        )
        return pd.concat([s[["term", "c", "shard_total"]], marker],
                         ignore_index=True)

    vschema = pa.schema(
        [("term", pa.utf8()), ("c", pa.int64()), ("shard_total", pa.int64())]
    )
    cand = _sharded_groupby(
        docs.map_batches(cnt_batch, batch_format="pyarrow", zero_copy_batch=True),
        ["th"],
        shard_top,
        empty_schema=vschema,
    ).to_pandas()
    if not len(cand):
        return (
            pd.DataFrame({"term": pd.Series([], dtype=object),
                          "c": pd.Series([], dtype="int64")}),
            0,
        )
    total = int(cand["shard_total"].sum())
    top = cand[cand["term"].notna()].sort_values(
        ["c", "term"], ascending=[False, True], kind="mergesort"
    ).head(top_vocab)
    return top[["term", "c"]].reset_index(drop=True), total


def unigram_logprob_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc unigram LM score (mean negative log-likelihood in bits)
    — the CCNet-style quality filter: low-NLL docs look like the corpus
    head, high-NLL docs are rare/garbled.  Model: the top
    ``UNIGRAM_VOCAB`` terms by corpus count, each with probability
    quantized onto the 16-bit grid ``r(t) = max(1, c(t)*65535 //
    total)`` (OOV terms get r = 1).  The quantization makes the model
    SQL-exact: ``nll = round(sum(L(65536) - L(r)) / (dl*1e9), 6)``
    where L is the exhaustively-verified fixed-point log2 table
    (`_log2_fp` — r <= 65535 stays inside its domain), so every sum is
    an exact int64 on both engines.

    Shape (100 TB): one bounded vocabulary pass (:func:`_count_vocab`),
    then one streaming map_batches with the <=4096-entry model shipped
    in the closure — per-doc integer sums, zero exchanges.
    """
    docs = _docs(source)
    vocab, total = _count_vocab(docs, UNIGRAM_VOCAB)
    l16 = np.int64(16 * ENTROPY_LOG_SCALE)  # L(65536): log2 is exactly 16
    if total > 0:
        r = np.maximum(
            1,
            (vocab["c"].to_numpy().astype(object) * UNIGRAM_RGRID) // total,
        ).astype(np.int64)
        contrib_vocab = l16 - _log2_fp(r)
    else:
        contrib_vocab = np.zeros(0, np.int64)
    contrib_oov = np.int64(l16)  # L(1) == 0
    vocab_arr = pa.array(vocab["term"].tolist(), pa.utf8())

    def per_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, _row_idx, _h1, _h2 = _batch_tokens(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = np.zeros(len(doc_ids), np.int64)
        s = np.zeros(len(doc_ids), np.int64)
        if len(toks):
            idx = pc.index_in(toks, value_set=vocab_arr)
            iv = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            tok_contrib = np.where(
                iv >= 0, contrib_vocab[np.maximum(iv, 0)], contrib_oov
            )
            per_doc = pa.table(
                {
                    "doc_id": pa.array(token_doc, pa.int64()),
                    "c": pa.array(tok_contrib, pa.int64()),
                }
            ).group_by("doc_id").aggregate([("c", "sum"), ([], "count_all")])
            ud = per_doc["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            at = _align_to_rows(doc_ids, ud)
            dl[at] = per_doc["count_all"].to_numpy(zero_copy_only=False)
            s[at] = per_doc["c_sum"].to_numpy(zero_copy_only=False)
        pos = dl > 0
        nll = np.zeros(len(doc_ids), np.float64)
        if pos.any():
            nll[pos] = round_half_away(
                s[pos].astype(np.float64)
                / (dl[pos] * ENTROPY_LOG_SCALE).astype(np.float64),
                6,
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(dl, pa.int64()),
                "nll_bits": pc.if_else(
                    pa.array(pos),
                    pa.array(nll, pa.float64()),
                    pa.scalar(None, pa.float64()),
                ),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# triangle counting (clustering structure of the co-occurrence graph)

TRI_TOP_VOCAB = 64


def term_triangles(
    source: str | rd.Dataset, *, top_vocab: int = TRI_TOP_VOCAB
) -> pd.DataFrame:
    """Per-node triangle counts + local clustering density over the
    frequent-term co-occurrence graph — the graph-analytics companion to
    :func:`pagerank_terms`, all-integer so the SQL pairing is exact.

    ``tri(v) = diag(A^3)/2`` (pairs of connected neighbours) and the
    clustering coefficient is reported as the exact integer pair
    ``(tri, deg*(deg-1)/2)`` plus a rounded float payload
    ``clustering = round(2*tri / (deg*(deg-1)), 6)`` (NULL when
    deg < 2).  Shape: the bounded adjacency pass
    (:func:`cooc_adjacency`), then a driver-side V x V integer matmul.
    Columns: ``term, deg, tri, clustering``.
    """
    docs = _docs(source)
    cand = top_vocab_df(docs, top_vocab)
    if not len(cand):
        return pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                "deg": pd.Series([], dtype="int64"),
                "tri": pd.Series([], dtype="int64"),
                "clustering": pd.Series([], dtype="float64"),
            }
        )
    vocab_terms = cand["term"].tolist()
    adj = cooc_adjacency(docs, vocab_terms)
    deg = adj.sum(axis=1).astype(np.int64)
    a2 = adj @ adj
    tri = (np.einsum("ij,ij->i", a2, adj) // 2).astype(np.int64)
    possible = deg * (deg - 1)
    cl = np.zeros(len(deg), np.float64)
    ok = possible > 0
    cl[ok] = round_half_away(
        (2 * tri[ok]).astype(np.float64) / possible[ok].astype(np.float64), 6
    )
    out = pd.DataFrame(
        {
            "term": np.asarray(vocab_terms, dtype=object),
            "deg": deg,
            "tri": tri,
            "clustering": np.where(ok, cl, np.nan),
        }
    )
    out["deg"] = out["deg"].astype("int64")
    out["tri"] = out["tri"].astype("int64")
    return out.sort_values("term", kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# bigram language-model scoring (context-conditional NLL, 16-bit grid)

BIGRAM_VOCAB = 4096


def _batch_bigrams(batch: pa.Table):
    """Adjacent kept-token pairs within each doc: returns ``(a, b,
    pair_doc)`` string arrays + owning doc ids (bigrams never span
    docs or batches)."""
    toks, token_doc, _r, _h1, _h2 = _batch_tokens(batch)
    if len(toks) < 2:
        e = pa.array([], pa.utf8())
        return e, e, np.zeros(0, np.int64)
    same = token_doc[:-1] == token_doc[1:]
    idx = np.nonzero(same)[0]
    ia = pa.array(idx, pa.int64())
    ib = pa.array(idx + 1, pa.int64())
    return toks.take(ia), toks.take(ib), token_doc[idx]


def bigram_logprob_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc bigram LM score: mean negative log-likelihood (bits) of
    each doc's adjacent-token transitions under the corpus bigram model
    — the context-sensitive upgrade of :func:`unigram_logprob_ds`
    (templated text scores low, shuffled/garbled text scores high even
    when its unigrams look normal).

    Model: top ``BIGRAM_VOCAB`` bigrams by count; conditional
    probability quantized to ``r = max(1, c(ab)*65535 // ctx(a))``
    (``ctx(a)`` = occurrences of ``a`` as a context); transitions
    outside the model get r = 1.  All sums are int64 via the verified
    fixed-point log table, so the SQL pairing is exact.

    Shape: pass 1 counts bigrams per batch and exchanges ONCE sharded
    by the CONTEXT hash — a shard owns every bigram of its contexts,
    so per-shard top-k candidates AND exact ctx totals come from the
    same exchange; pass 2 streams with the <=4096-row model in the
    closure, per-doc integer sums in-batch.  Columns: ``doc_id,
    n_bigrams, nll_bits`` (NULL for docs with < 2 tokens).
    """
    from .dedup import _sharded_groupby
    from ..functions.tokenize import _span_hashes  # noqa: F401  (hash via term_hash below)

    docs = _docs(source)

    def cnt_batch(batch: pa.Table) -> pa.Table:
        a, b, _pd = _batch_bigrams(batch)
        empty = pa.table(
            {
                "a": pa.array([], pa.utf8()),
                "b": pa.array([], pa.utf8()),
                "ah": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(a):
            return empty
        t = pa.table({"a": a, "b": b})
        g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        ah = pd.util.hash_array(
            np.asarray(g["a"].to_pylist(), dtype=object)
        ).view(np.int64)
        return pa.table(
            {
                "a": g["a"],
                "b": g["b"],
                "ah": pa.array(ah, pa.int64()),
                "c": g["count_all"].cast(pa.int64()),
            }
        )

    def shard_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b"], as_index=False)["c"].sum()
        ctx = s.groupby("a")["c"].sum()
        s["ctx"] = s["a"].map(ctx)
        s = s.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="mergesort"
        ).head(BIGRAM_VOCAB)
        for col in ["c", "ctx"]:
            s[col] = s[col].astype("int64")
        return s[["a", "b", "c", "ctx"]]

    vschema = pa.schema(
        [("a", pa.utf8()), ("b", pa.utf8()), ("c", pa.int64()),
         ("ctx", pa.int64())]
    )
    cand = _sharded_groupby(
        docs.map_batches(cnt_batch, batch_format="pyarrow", zero_copy_batch=True),
        ["ah"],
        shard_top,
        empty_schema=vschema,
    ).to_pandas()
    l16 = np.int64(16 * ENTROPY_LOG_SCALE)
    if len(cand):
        top = cand.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="mergesort"
        ).head(BIGRAM_VOCAB)
        r = np.maximum(
            1,
            (top["c"].to_numpy().astype(object) * UNIGRAM_RGRID)
            // top["ctx"].to_numpy().astype(object),
        ).astype(np.int64)
        model_keys = pa.array(
            [f"{a}\x00{b}" for a, b in zip(top["a"], top["b"])], pa.utf8()
        )
        model_contrib = l16 - _log2_fp(r)
    else:
        model_keys = pa.array([], pa.utf8())
        model_contrib = np.zeros(0, np.int64)
    oov_contrib = np.int64(l16)

    def per_batch(batch: pa.Table) -> pa.Table:
        a, b, pair_doc = _batch_bigrams(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = np.zeros(len(doc_ids), np.int64)
        s = np.zeros(len(doc_ids), np.int64)
        if len(a):
            key = pc.binary_join_element_wise(a, b, "\x00")
            iv = (
                pc.index_in(key, value_set=model_keys)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            contrib = np.where(
                iv >= 0, model_contrib[np.maximum(iv, 0)], oov_contrib
            )
            per_doc = pa.table(
                {
                    "doc_id": pa.array(pair_doc, pa.int64()),
                    "c": pa.array(contrib, pa.int64()),
                }
            ).group_by("doc_id").aggregate([("c", "sum"), ([], "count_all")])
            ud = per_doc["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            at = _align_to_rows(doc_ids, ud)
            nb[at] = per_doc["count_all"].to_numpy(zero_copy_only=False)
            s[at] = per_doc["c_sum"].to_numpy(zero_copy_only=False)
        pos = nb > 0
        nll = np.zeros(len(doc_ids), np.float64)
        if pos.any():
            nll[pos] = round_half_away(
                s[pos].astype(np.float64)
                / (nb[pos] * ENTROPY_LOG_SCALE).astype(np.float64),
                6,
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "nll_bits": pc.if_else(
                    pa.array(pos),
                    pa.array(nll, pa.float64()),
                    pa.scalar(None, pa.float64()),
                ),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al., "Data Selection for Language Models
# via Importance Resampling", NeurIPS 2023): score every document by the
# log importance ratio between a target-domain hashed-unigram LM and the
# raw-corpus LM.  Docs with ratio > 1 look more target-like than average
# and would be kept by an importance-resampling selection pass.

DSIR_BUCKETS = 1024
DSIR_RGRID = (1 << 16) - 1  # probability grid: r/65535, r in [1, 65535]
DSIR_TARGET_LANG = "en"
# sf augmentation: the synthetic corpus shares ONE 31-token vocabulary
# across all langs (no target-specific tokens), so DSIR has no signal to
# find and `selected` would be constant-false.  Append a target-domain
# marker token to every even-doc_id target doc — deterministic, replicated
# in the SQL oracle (same pattern as pii_scan / substring_dup_spans).
DSIR_MARK = "tgtdomainmark"  # 13 chars: survives the len<=15 token filter
DSIR_MARK_REPEAT = 8
DSIR_MARK_EVERY = 2


def _dsir_augment(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_t = (
        pc.fill_null(pc.equal(batch["lang"], DSIR_TARGET_LANG), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    mask = pa.array((ids % DSIR_MARK_EVERY == 0) & is_t)
    suffix = (" " + DSIR_MARK) * DSIR_MARK_REPEAT
    aug = pc.binary_join_element_wise(
        pc.cast(batch["text"], pa.string()),
        pa.array([suffix] * batch.num_rows, pa.string()),
        "",
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": pc.if_else(mask, aug, batch["text"]),
            "lang": batch["lang"],
        }
    )


def dsir_weights_ds(source: str | rd.Dataset, *, augment: bool = True) -> rd.Dataset:
    """Per-doc DSIR importance weight over hashed unigram features.

    Both LMs live on ``DSIR_BUCKETS`` hashed-token buckets (the same
    engine<->SQL token hash as ``feature_hash_vectors``) with add-one
    smoothing; bucket probabilities are quantized to the 16-bit integer
    grid ``r(b) = max(1, (c_b + 1) * 65535 // (total + D))`` so each
    per-token contribution ``L(r_target) - L(r_raw)`` (fixed-point log2
    table :func:`_log2_fp`, exhaustively verified vs DuckDB) is an
    exact int64 on both engines and every downstream sum is
    order-independent.  Output per doc: token count, the per-token-mean
    log ratio in bits (rounded float payload), and ``selected`` =
    (integer ratio sum > 0).

    Shape (100 TB): one histogram pass reduced by ``_sharded_groupby``
    to <= D rows on the driver, then one streaming pass with the
    D-entry int64 delta table shipped in the closure — zero exchanges
    beyond the bounded combine, no driver materialization of rows.
    """
    import os

    from ..functions.sketch import _token_hashes
    from ..sources.util import read_parquet_sized
    from .dedup import _sharded_groupby

    D = DSIR_BUCKETS
    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["doc_id", "text", "lang"])
    if augment:
        docs = docs.map_batches(
            _dsir_augment, batch_format="pyarrow", zero_copy_batch=True
        )

    def hist_batch(batch: pa.Table) -> pa.Table:
        h, row = _token_hashes(batch["text"])
        if not len(h):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "ct": pa.array([], pa.int64()),
                    "cr": pa.array([], pa.int64()),
                }
            )
        is_t = (
            pc.fill_null(pc.equal(batch["lang"], DSIR_TARGET_LANG), False)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        b = (h % np.uint64(D)).astype(np.int64)
        cr = np.bincount(b, minlength=D)
        ct = np.bincount(b[is_t[row]], minlength=D)
        nz = np.flatnonzero(cr)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "ct": pa.array(ct[nz], pa.int64()),
                "cr": pa.array(cr[nz], pa.int64()),
            }
        )

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("bucket", as_index=False)[["ct", "cr"]].sum()
        return s.astype({"bucket": "int64", "ct": "int64", "cr": "int64"})

    hschema = pa.schema(
        [("bucket", pa.int64()), ("ct", pa.int64()), ("cr", pa.int64())]
    )
    hist = _sharded_groupby(
        docs.map_batches(hist_batch, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket"],
        comb,
        empty_schema=hschema,
    ).to_pandas()

    ct = np.zeros(D, np.int64)
    cr = np.zeros(D, np.int64)
    if len(hist) and "bucket" in hist.columns:
        ct[hist["bucket"].to_numpy()] = hist["ct"].to_numpy()
        cr[hist["bucket"].to_numpy()] = hist["cr"].to_numpy()
    tt, tr = int(ct.sum()), int(cr.sum())
    # object dtype: (c+1)*65535 would overflow int64 near 2^47 tokens
    rt = np.maximum(
        1, ((ct.astype(object) + 1) * DSIR_RGRID) // (tt + D)
    ).astype(np.int64)
    rr = np.maximum(
        1, ((cr.astype(object) + 1) * DSIR_RGRID) // (tr + D)
    ).astype(np.int64)
    delta = _log2_fp(rt) - _log2_fp(rr)
    S = ENTROPY_LOG_SCALE

    def per_batch(batch: pa.Table) -> pa.Table:
        h, row = _token_hashes(batch["text"])
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = np.zeros(len(doc_ids), np.int64)
        s = np.zeros(len(doc_ids), np.int64)
        if len(h):
            tok_contrib = delta[(h % np.uint64(D)).astype(np.int64)]
            per_doc = (
                pa.table(
                    {
                        "r": pa.array(row.astype(np.int64), pa.int64()),
                        "c": pa.array(tok_contrib, pa.int64()),
                    }
                )
                .group_by("r")
                .aggregate([("c", "sum"), ([], "count_all")])
            )
            ridx = per_doc["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            dl[ridx] = per_doc["count_all"].to_numpy(zero_copy_only=False)
            s[ridx] = per_doc["c_sum"].to_numpy(zero_copy_only=False)
        pos = dl > 0
        w = np.zeros(len(doc_ids), np.float64)
        if pos.any():
            w[pos] = round_half_away(
                s[pos].astype(np.float64) / (dl[pos] * S).astype(np.float64), 6
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(dl, pa.int64()),
                "logratio_bits": pc.if_else(
                    pa.array(pos),
                    pa.array(w, pa.float64()),
                    pa.scalar(None, pa.float64()),
                ),
                "selected": pa.array(s > 0),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
# MOSS algorithm): per doc, slide a window of WINNOW_W consecutive k-gram
# hashes and keep the window minimum (rightmost on ties).  Guarantees any
# shared run of >= WINNOW_W + WINNOW_K - 1 tokens produces a shared
# fingerprint, at ~2/(w+1) the density of full shingling.

WINNOW_K = 3  # tokens per shingle (shares sketch.shingle_hashes' fold)
WINNOW_W = 4  # shingle hashes per winnowing window
WINNOW_M61 = (1 << 61) - 1  # fingerprint domain: sh % M61 fits BIGINT


def winnow_fingerprints_ds(source: str | rd.Dataset) -> rd.Dataset:
    """(doc_id, pos, fp) — the winnowed fingerprint set per document.

    ``pos`` is the 1-based token position of the selected shingle, ``fp``
    its 61-bit hash (the same mixed FNV shingle fold as minhash, reduced
    mod 2^61-1 so both engines carry it as int64).  Selection is the
    classic rightmost-min rule, expressed on the SQL side as a window
    ``max`` over the packed key ``(M61-1-fp)*2^32 + pos`` — identical
    total order, so parity is hash-exact.

    Shape (100 TB): pure per-batch compute (docs never span batches) —
    a strided sliding-window argmin over the flat shingle array with a
    doc-boundary validity mask; zero exchanges, zero Python loops.
    """
    from ..functions.sketch import shingle_hashes

    docs = _docs(source)
    w = WINNOW_W

    def per_batch(batch: pa.Table) -> pa.Table:
        sh, srow, bounds = shingle_hashes(batch["text"], WINNOW_K)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "fp": pa.array([], pa.int64()),
            }
        )
        n = len(sh)
        if n < w:
            return empty
        fp = sh % np.uint64(WINNOW_M61)
        V = np.lib.stride_tricks.sliding_window_view(fp, w)
        # a window is a real winnowing window only if it stays inside one doc
        valid = srow[: n - w + 1] == srow[w - 1 :]
        if not valid.any():
            return empty
        # rightmost argmin: argmin of the reversed window is the FIRST
        # occurrence of the min in reverse order == rightmost in original
        j = V[:, ::-1].argmin(axis=1)
        starts = np.flatnonzero(valid)
        sel = np.unique(starts + (w - 1 - j[starts]))
        return pa.table(
            {
                "doc_id": pa.array(ids[srow[sel]], pa.int64()),
                "pos": pa.array(sel - bounds[srow[sel]] + 1, pa.int64()),
                "fp": pa.array(fp[sel].astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich, Haddow & Birch, ACL 2016): learn the first
# M byte-pair merges over the corpus word vocabulary.  The corpus-scale
# work — counting words — is the distributed pass (`_count_vocab`); the
# merge recurrence then runs on the bounded <= BPE_MAX_WORDS vocabulary,
# which is the standard BPE formulation (training operates on the word
# vocab with frequencies, never the raw corpus).  Every quantity is an
# integer and both engines use the identical left-to-right non-overlapping
# replace semantics (Python str.replace == DuckDB replace), so the SQL
# pairing (unrolled per-iteration CTEs) is hash-exact.

BPE_MERGES = 6
BPE_MAX_WORDS = 4096


def bpe_merges_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(rank, left, right, pair_count) — the first BPE_MERGES learned merges.

    Words are spelled as sentinel-padded symbol strings (' h e l l o ');
    each iteration counts adjacent symbol pairs weighted by word
    frequency, picks the best under the total order (count desc, left
    asc, right asc — ASCII symbols, so Python and DuckDB string orders
    agree), and rewrites every word with ``replace(' a b ' -> ' ab ')``.
    Words that collide after a merge have their frequencies summed
    (both sides re-group per iteration).
    """
    docs = _docs(source)
    vocab_df, _total = _count_vocab(docs, BPE_MAX_WORDS)
    vocab: dict[str, int] = {}
    for term, c in zip(vocab_df["term"], vocab_df["c"]):
        vocab[" " + " ".join(term) + " "] = int(c)

    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, BPE_MERGES + 1):
        pairs: dict[tuple[str, str], int] = {}
        for word, f in vocab.items():
            syms = word.split()
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + f
        if not pairs:
            break
        best_c = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == best_c)
        merges.append((it, a, b, best_c))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        nxt: dict[str, int] = {}
        for word, f in vocab.items():
            w2 = word.replace(pat, rep)
            nxt[w2] = nxt.get(w2, 0) + f
        vocab = nxt

    return pd.DataFrame(
        merges, columns=["rank", "lhs", "rhs", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})


# ---------------------------------------------------------------------------
# n-gram novelty: how much NEW content each doc adds, attributing every
# cross-doc duplicated shingle to its lowest-doc_id first occurrence —
# the ordered-ingest novelty signal used to down-weight trailing crawl
# snapshots (complement of substring_dup_spans, which is unordered).

NOVELTY_WINDOW = 8  # tokens per shingle


def ngram_novelty_ds(source: str | rd.Dataset, *, augment: bool = True) -> rd.Dataset:
    """Per-doc novelty: ``n_distinct`` distinct ``NOVELTY_WINDOW``-token
    shingles, ``n_novel`` of them whose corpus-wide minimum doc_id is
    this doc (ties in doc order go to the earliest doc), and
    ``novelty_frac = n_novel / max(n_distinct, 1)`` rounded to 6.

    Shape: ONE shingle exchange serves both counts — per batch the
    (shingle, doc) pairs are exactly deduplicated (Arrow ``group_by`` on
    the shingle STRING, so hash collisions cannot merge distinct
    shingles), then `_sharded_groupby` on an internal dual-FNV fold
    co-locates each shingle's pairs; inside the shard the per-shingle
    min-doc and the per-doc distinct-pair counts both reduce to bounded
    per-doc partials.  A doc-keyed sharded sum merges them with a
    zero-row scan so shingle-less docs still appear.  Uses the same
    deterministic clone augmentation as ``substring_dup_spans`` (the
    synthetic corpus has few natural cross-doc 8-gram repeats); clones
    (higher doc_id) score novelty 0 against their originals.
    """
    from .dedup import _sharded_groupby

    docs = _docs(source)
    if augment:
        docs = docs.map_batches(
            _substr_augment, batch_format="pyarrow", zero_copy_batch=True
        )
    w = NOVELTY_WINDOW

    def windows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "wh": pa.array([], pa.int64()),
                "shingle": pa.array([], pa.utf8()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
        toks, token_doc, row_idx, h1, _h2 = _batch_tokens(batch)
        n = len(toks)
        if n < w:
            return empty
        keep = row_idx[: n - w + 1] == row_idx[w - 1 :]
        pieces = [toks.slice(i, n - w + 1) for i in range(w)]
        joined = pc.binary_join_element_wise(*pieces, " ").filter(pa.array(keep))
        acc = np.zeros(n - w + 1, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(w):
                hv = h1[i : i + n - w + 1]
                acc = (acc ^ hv) * np.uint64(1099511628211)
        t = pa.table(
            {
                "wh": pa.array(acc[keep].view(np.int64), pa.int64()),
                "shingle": joined,
                "doc_id": pa.array(token_doc[: n - w + 1][keep], pa.int64()),
            }
        )
        # exact per-batch (shingle, doc) dedup BEFORE the exchange:
        # group on the string itself (collision-proof), keep any wh
        g = t.group_by(["shingle", "doc_id"]).aggregate([("wh", "min")])
        return pa.table(
            {
                "wh": g["wh_min"],
                "shingle": g["shingle"],
                "doc_id": g["doc_id"],
            }
        )

    win = docs.map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)

    def novelty_partial(g: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a shingle land in this shard (shard key =
        # its hash); pairs may still repeat across batches -> dedup
        pairs = g[["shingle", "doc_id"]].drop_duplicates()
        dist = pairs.groupby("doc_id", as_index=False).size()
        dist.columns = ["doc_id", "n_distinct"]
        firsts = pairs.groupby("shingle", as_index=False)["doc_id"].min()
        nov = firsts.groupby("doc_id", as_index=False).size()
        nov.columns = ["doc_id", "n_novel"]
        out = dist.merge(nov, on="doc_id", how="outer").fillna(0)
        out["n_distinct"] = out["n_distinct"].astype("int64")
        out["n_novel"] = out["n_novel"].astype("int64")
        return out[["doc_id", "n_distinct", "n_novel"]]

    part_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_distinct", pa.int64()),
            ("n_novel", pa.int64()),
        ]
    )
    parts = _sharded_groupby(win, ["wh"], novelty_partial, empty_schema=part_schema)

    def zeros(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        z = pa.array(np.zeros(n_rows, np.int64), pa.int64())
        return pa.table(
            {"doc_id": pc.cast(batch["doc_id"], pa.int64()),
             "n_distinct": z, "n_novel": z}
        )

    base = docs.map_batches(zeros, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", as_index=False).sum()
        nd = m["n_distinct"].to_numpy(np.int64)
        nn = m["n_novel"].to_numpy(np.int64)
        m["novelty_frac"] = round_half_away(nn / np.maximum(nd, 1), 6)
        return m[["doc_id", "n_distinct", "n_novel", "novelty_frac"]]

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_distinct", pa.int64()),
            ("n_novel", pa.int64()),
            ("novelty_frac", pa.float64()),
        ]
    )
    return _sharded_groupby(base.union(parts), ["doc_id"], merge,
                            empty_schema=out_schema)


# ---------------------------------------------------------------------------
# Mann-Whitney AUC of a per-doc integer signal: the standard
# "does this quality signal separate the classes" eval run before
# committing a filter threshold.  Entirely integer until the final
# rounded division: with tie-averaged ranks, 2*U is exact int64.

AUC_POS_LANG = "en"


def auc_signal_df(source: str | rd.Dataset) -> pd.DataFrame:
    """One row: ``n_pos, n_neg, u2, auc`` where the signal is the
    per-doc kept-token count, the positive class is ``lang ==
    AUC_POS_LANG``, and ``u2 = 2*U`` (Mann-Whitney U with 0.5 tie
    credit, doubled to stay integer).  ``auc = round(u2 / (2*n_pos*
    n_neg), 6)`` (0.5 when either class is empty, via the max(.,1)
    guard both engines share).

    Shape: per-batch (score, pos) partial counts (one bincount per
    batch), then ONLY the bounded per-score histogram reaches the
    driver (distinct scores <= max doc token count, independent of N);
    the cumulative-rank combine is vectorized int64.
    """
    import os

    from ..sources.util import read_parquet_sized

    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        _toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        score = np.bincount(row_idx, minlength=batch.num_rows).astype(np.int64)
        pos = pc.equal(batch["lang"], AUC_POS_LANG).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df = pd.DataFrame({"score": score, "pos": pos})
        g = df.groupby(["score", "pos"], as_index=False).size()
        g.columns = ["score", "pos", "c"]
        return pa.table(
            {
                "score": pa.array(g["score"].to_numpy(np.int64), pa.int64()),
                "pos": pa.array(g["pos"].to_numpy(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    hist = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    if len(hist):
        hist = hist.groupby(["score", "pos"], as_index=False)["c"].sum()
    else:
        hist = pd.DataFrame({"score": [], "pos": [], "c": []})
    piv = hist.pivot_table(index="score", columns="pos", values="c",
                           aggfunc="sum", fill_value=0)
    p = piv[1].to_numpy(np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
    n = piv[0].to_numpy(np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
    # piv index is sorted ascending by score
    neg_below = np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
    u2 = int(2 * np.sum(p * neg_below) + np.sum(p * n))
    n_pos, n_neg = int(p.sum()), int(n.sum())
    auc = float(round_half_away(
        np.array([u2 / max(2 * n_pos * n_neg, 1)]), 6)[0])
    return pd.DataFrame(
        {"n_pos": [n_pos], "n_neg": [n_neg], "u2": [u2], "auc": [auc]}
    ).astype({"n_pos": "int64", "n_neg": "int64", "u2": "int64"})


# ---------------------------------------------------------------------------
# Zipf slope: OLS fit of log2(count) on log2(rank) over the top
# vocabulary — the classic corpus-health diagnostic (natural text sits
# near slope -1; templated/synthetic corpora drift).  Exact via the
# shared fixed-point log2 (textpipe._log2_fp_ext): all five moments are
# exact big integers (Python ints here, HUGEINT in the oracle), the
# slope/r2 divisions convert to IEEE doubles identically on both sides.

ZIPF_VOCAB = 4096


def zipf_slope_df(source: str | rd.Dataset) -> pd.DataFrame:
    """One row: ``n_terms, slope, r2`` for the rank-frequency OLS fit
    over the top-``ZIPF_VOCAB`` terms (rank order: count desc, term
    asc).  Degenerate fits (n < 2 or zero x-variance / y-variance)
    report 0.0 by convention on both engines.

    Shape: one bounded vocabulary pass (:func:`_count_vocab` — per-shard
    top-V candidates, fixed-size driver merge), then an O(V) driver
    combine over exact integers.
    """
    from .textpipe import _log2_fp_ext

    docs = _docs(source)
    vocab_df, _total = _count_vocab(docs, ZIPF_VOCAB)
    n = len(vocab_df)
    out = {"n_terms": [np.int64(n)], "slope": [0.0], "r2": [0.0]}
    if n:
        ranks = np.arange(1, n + 1, dtype=np.int64)
        cnts = vocab_df["c"].to_numpy().astype(np.int64)
        x = [int(v) for v in _log2_fp_ext(ranks)]
        y = [int(v) for v in _log2_fp_ext(cnts)]
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in y)
        sxy = sum(a * b for a, b in zip(x, y))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        yvar = n * syy - sy * sy
        if n >= 2 and den != 0:
            out["slope"] = [float(round_half_away(
                np.array([float(num) / float(den)]), 6)[0])]
            if yvar != 0:
                out["r2"] = [float(round_half_away(
                    np.array([(float(num) * float(num))
                              / (float(den) * float(yvar))]), 6)[0])]
    return pd.DataFrame(out).astype({"n_terms": "int64"})


# ---------------------------------------------------------------------------
# impact-ordered postings: per-(term, doc) quantized BM25 impact scores
# (Anh & Moffat-style impact precompute — rank the posting list by a
# static integer impact so query time can early-terminate).  k1 = 1.2,
# b = 0.75 as in the query engine; the whole score is exact integer
# arithmetic: idf via the shared fixed-point log2 (quantized to 1e3
# scale), the tf/length normalization as one rational with denominator
# cleared by 10*sumdl.

IMPACT_SCALE = 1_000  # impact_fp = round-ish impact * 1000 (floor rational)


def impact_postings_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Columns: ``term, doc_id, tf, df, impact_fp, impact`` where
    ``impact_fp = idf_q * 22*tf*sumdl // (10*tf*sumdl + 3*sumdl +
    9*dl*N)`` with ``idf_q = (L'(N) - L'(df)) // 1e6`` — i.e. BM25 with
    (k1+1)=2.2, k1(1-b)=0.3, k1*b=0.9 and avdl = sumdl/N, every
    division cleared to a single integer floor.  ``impact`` is the
    rounded float payload ``impact_fp / 1000``.

    Shape: one tiny stats scan (N, sumdl — two scalars), per-batch
    Arrow group_by to (doc, term, tf, dl) rows, then ONE term-sharded
    exchange computes df and the impact in place.  Loud int64-domain
    guard (the HUGEINT SQL oracle is immune; at corpora where
    idf_q*22*tf*sumdl needs >63 bits, widen to object ints).
    """
    from .dedup import _sharded_groupby
    from .textpipe import _log2_fp_ext

    docs = _docs(source)

    def stats(batch: pa.Table) -> pa.Table:
        toks, _td, _ri, _h1, _h2 = _batch_tokens(batch)
        return pa.table(
            {"n": pa.array([batch.num_rows], pa.int64()),
             "s": pa.array([len(toks)], pa.int64())}
        )

    st = docs.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    n_docs = int(st["n"].sum()) if len(st) else 0
    sumdl = int(st["s"].sum()) if len(st) else 0
    ln_fp = int(_log2_fp_ext(np.array([max(n_docs, 1)], np.int64))[0])

    def tf_batch(batch: pa.Table) -> pa.Table:
        toks, token_doc, row_idx, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.utf8()),
                    "tf": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                    "th": pa.array([], pa.int64()),
                }
            )
        dl_row = np.bincount(row_idx, minlength=batch.num_rows).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl_of = dict(zip(ids.tolist(), dl_row.tolist()))
        t = pa.table(
            {
                "doc_id": pa.array(token_doc, pa.int64()),
                "term": toks,
                "th": pa.array(h1.view(np.int64), pa.int64()),
            }
        )
        tf = t.group_by(["doc_id", "term"]).aggregate(
            [("term", "count"), ("th", "min")]
        )
        tdoc = tf["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl_col = np.array([dl_of[int(d)] for d in tdoc], np.int64) \
            if len(tdoc) else np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": tf["doc_id"],
                "term": tf["term"],
                "tf": tf["term_count"].cast(pa.int64()),
                "dl": pa.array(dl_col, pa.int64()),
                "th": tf["th_min"],
            }
        )

    tf_rows = docs.map_batches(tf_batch, batch_format="pyarrow",
                               zero_copy_batch=True)

    def impact_join(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("term")["term"].transform("size").astype("int64")
        dfv = g["df"].to_numpy(np.int64)
        tfv = g["tf"].to_numpy(np.int64)
        dlv = g["dl"].to_numpy(np.int64)
        idf_q = (ln_fp - _log2_fp_ext(dfv)) // 1_000_000
        if len(tfv):
            hi = int(idf_q.max()) * 22 * int(tfv.max()) * sumdl
            hd = 10 * int(tfv.max()) * sumdl + 3 * sumdl \
                + 9 * int(dlv.max()) * n_docs
            if hi >= 2 ** 63 or hd >= 2 ** 63:
                raise ValueError(
                    "impact_postings: int64 domain exceeded "
                    f"(num<{hi}, den<{hd}); widen to object ints"
                )
        num = idf_q * (22 * tfv * sumdl)
        den = 10 * tfv * sumdl + 3 * sumdl + 9 * dlv * n_docs
        g["impact_fp"] = num // np.maximum(den, 1)
        g["impact"] = round_half_away(
            g["impact_fp"].to_numpy(np.int64) / float(IMPACT_SCALE), 6
        )
        return g[["term", "doc_id", "tf", "df", "impact_fp", "impact"]]

    out_schema = pa.schema(
        [
            ("term", pa.utf8()),
            ("doc_id", pa.int64()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("impact_fp", pa.int64()),
            ("impact", pa.float64()),
        ]
    )
    return _sharded_groupby(tf_rows, ["th"], impact_join,
                            empty_schema=out_schema)


# ---------------------------------------------------------------------------
# BPE apply: segment the vocabulary with the learned merges and report
# per-word token fertility (tokens per word) — the "is the tokenizer
# efficient on this corpus" counterpart of bpe_merges.


def bpe_apply_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(term, freq, n_tokens) for every top-``BPE_MAX_WORDS`` vocabulary
    word after applying the ``BPE_MERGES`` merges learned by
    :func:`bpe_merges_df` (identical selection recurrence); ``n_tokens``
    is the word's post-merge symbol count.  Both engines share the exact
    left-to-right non-overlapping ``replace`` semantics, so the spelled
    forms — and hence the counts — are bit-identical.
    """
    docs = _docs(source)
    vocab_df, _total = _count_vocab(docs, BPE_MAX_WORDS)
    terms = list(vocab_df["term"])
    freqs = [int(c) for c in vocab_df["c"]]
    spelled0 = [" " + " ".join(t) + " " for t in terms]
    vocab: dict[str, int] = {}
    for w, c in zip(spelled0, freqs):
        vocab[w] = vocab.get(w, 0) + c
    spell = {w: w for w in vocab}
    for _it in range(BPE_MERGES):
        pairs: dict[tuple[str, str], int] = {}
        for word, f in vocab.items():
            syms = word.split()
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + f
        if not pairs:
            break
        best_c = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == best_c)
        pat, rep = f" {a} {b} ", f" {a}{b} "
        nxt: dict[str, int] = {}
        for word, f in vocab.items():
            w2 = word.replace(pat, rep)
            nxt[w2] = nxt.get(w2, 0) + f
        vocab = nxt
        spell = {w0: s.replace(pat, rep) for w0, s in spell.items()}
    n_tokens = [len(spell[s0].split()) for s0 in spelled0]
    return pd.DataFrame(
        {"term": terms, "freq": freqs, "n_tokens": n_tokens}
    ).astype({"freq": "int64", "n_tokens": "int64"})


# ---------------------------------------------------------------------------
# vocabulary uniqueness per source: how much of each source's vocabulary
# appears NOWHERE else — the data-valuation signal for "does this source
# add anything" decisions.


def vocab_uniqueness_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(source, n_terms, n_exclusive): distinct clean terms per source
    and the subset appearing in no other source.

    Shape: per-batch exact (term, source) dedup (Arrow group_by on the
    strings), ONE term-sharded exchange (a term's rows co-locate, so its
    distinct-source count is exact in-shard), bounded driver combine
    (sources are a small dimension)."""
    import os

    from ..sources.util import read_parquet_sized
    from .dedup import _sharded_groupby

    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["doc_id", "text", "source"])

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "source": pa.array([], pa.utf8()),
             "th": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        src = pc.take(batch["source"], pa.array(row_idx, pa.int64()))
        t = pa.table(
            {"term": toks, "source": src,
             "th": pa.array(h1.view(np.int64), pa.int64())}
        )
        g = t.group_by(["term", "source"]).aggregate([("th", "min")])
        return pa.table(
            {"term": g["term"], "source": g["source"], "th": g["th_min"]}
        )

    pr = docs.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        p = g[["term", "source"]].drop_duplicates()
        ns = p.groupby("term")["source"].transform("nunique")
        out = p.assign(excl=(ns == 1).astype("int64")).groupby(
            "source", as_index=False
        ).agg(n_terms=("term", "size"), n_exclusive=("excl", "sum"))
        return out.astype({"n_terms": "int64", "n_exclusive": "int64"})

    part_schema = pa.schema(
        [("source", pa.utf8()), ("n_terms", pa.int64()),
         ("n_exclusive", pa.int64())]
    )
    parts = _sharded_groupby(pr, ["th"], per_shard,
                             empty_schema=part_schema).to_pandas()

    def srcs(batch: pa.Table) -> pa.Table:
        return pa.table({"source": batch["source"].unique()})

    all_src = sorted(
        set(docs.map_batches(srcs, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()["source"])
    )
    base = pd.DataFrame({"source": all_src})
    if len(parts):
        agg = parts.groupby("source", as_index=False).sum()
        out = base.merge(agg, on="source", how="left").fillna(0)
    else:
        out = base.assign(n_terms=0, n_exclusive=0)
    return out.astype({"n_terms": "int64", "n_exclusive": "int64"})


# ---------------------------------------------------------------------------
# readability: integer Flesch-reading-ease proxy.  Sentences = [.!?]+
# runs, syllable proxy = vowel groups; each fractional term floors
# separately so the score is exact on both engines.


def readability_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc ``doc_id, n_words, n_sents, n_vowel_groups, fre_x1000``
    with ``fre_x1000 = 206835 - 1015*n_words // max(n_sents, 1)
    - 84600*n_vg // max(n_words, 1)`` (Flesch coefficients x1000,
    vowel-group syllable proxy).  One RE2 scan per signal per batch;
    zero exchanges."""
    docs = _docs(source)

    def scan(batch: pa.Table) -> pa.Table:
        _toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        n_words = np.bincount(
            row_idx, minlength=batch.num_rows
        ).astype(np.int64)
        text = pc.cast(batch["text"], pa.string())
        n_sents = pc.count_substring_regex(
            text, pattern=r"[.!?]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        n_vg = pc.count_substring_regex(
            pc.utf8_lower(text), pattern=r"[aeiou]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        fre = (
            np.int64(206835)
            - (1015 * n_words) // np.maximum(n_sents, 1)
            - (84600 * n_vg) // np.maximum(n_words, 1)
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_sents": pa.array(n_sents, pa.int64()),
                "n_vowel_groups": pa.array(n_vg, pa.int64()),
                "fre_x1000": pa.array(fre, pa.int64()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# exact pairwise Jaccard between source vocabularies (the inter-source
# similarity matrix behind mixture design; MinHash is the sketch path,
# this is the exact one — sources are a bounded dimension so the pair
# expansion is |terms| * S^2 at worst, never |docs|^2).


def source_jaccard_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(src_a, src_b, inter, union_n, jaccard_x1e6) for src_a < src_b
    with at least one shared term; ``jaccard_x1e6 = 1e6 * inter //
    union``.  Shape: the same single term-sharded exchange as
    vocab_uniqueness — in-shard per-term source pairs + per-source
    sizes, bounded S^2 driver combine."""
    import os

    from ..sources.util import read_parquet_sized
    from .dedup import _sharded_groupby

    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["doc_id", "text", "source"])

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "source": pa.array([], pa.utf8()),
             "th": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        src = pc.take(batch["source"], pa.array(row_idx, pa.int64()))
        t = pa.table(
            {"term": toks, "source": src,
             "th": pa.array(h1.view(np.int64), pa.int64())}
        )
        g = t.group_by(["term", "source"]).aggregate([("th", "min")])
        return pa.table(
            {"term": g["term"], "source": g["source"], "th": g["th_min"]}
        )

    pr = docs.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        p = g[["term", "source"]].drop_duplicates()
        j = p.merge(p, on="term", suffixes=("_a", "_b"))
        j = j[j["source_a"] < j["source_b"]]
        inter = j.groupby(["source_a", "source_b"], as_index=False).size()
        inter.columns = ["src_a", "src_b", "inter"]
        sz = p.groupby("source", as_index=False).size()
        sz.columns = ["src_a", "inter"]
        sz["src_b"] = ""  # empty src_b marks a per-source size row
        out = pd.concat([inter, sz], ignore_index=True)
        out["inter"] = out["inter"].astype("int64")
        return out[["src_a", "src_b", "inter"]]

    part_schema = pa.schema(
        [("src_a", pa.utf8()), ("src_b", pa.utf8()), ("inter", pa.int64())]
    )
    parts = _sharded_groupby(pr, ["th"], per_shard,
                             empty_schema=part_schema).to_pandas()
    cols = ["src_a", "src_b", "inter", "union_n", "jaccard_x1e6"]
    if not len(parts):
        return pd.DataFrame({c: pd.Series(
            [], dtype="int64" if c not in ("src_a", "src_b") else object)
            for c in cols})
    sizes = parts[parts["src_b"] == ""].groupby("src_a")["inter"].sum()
    inter = parts[parts["src_b"] != ""].groupby(
        ["src_a", "src_b"], as_index=False)["inter"].sum()
    if not len(inter):
        return pd.DataFrame({c: pd.Series(
            [], dtype="int64" if c not in ("src_a", "src_b") else object)
            for c in cols})
    na = inter["src_a"].map(sizes).to_numpy(np.int64)
    nb = inter["src_b"].map(sizes).to_numpy(np.int64)
    iv = inter["inter"].to_numpy(np.int64)
    inter["union_n"] = na + nb - iv
    inter["jaccard_x1e6"] = (1_000_000 * iv) // (na + nb - iv)
    return inter.astype(
        {"inter": "int64", "union_n": "int64", "jaccard_x1e6": "int64"}
    )[cols]


# ---------------------------------------------------------------------------
# vocabulary drift: Dunning G-test per term between the even-doc_id and
# odd-doc_id halves of the corpus — the distribution-shift detector run
# between crawl snapshots / train-validation splits.  Reuses the exact
# integer S(k) = k*log2(k) fixed point from textpipe (bigram_llr), so
# g_fp is an exact int64 rank key on both engines.

DRIFT_TOP_K = 20


def vocab_drift_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Top-``DRIFT_TOP_K`` drifting terms: ``term, n_even, n_odd, g_fp,
    g, rank`` with the 2x2 G-test (term-vs-rest x even-vs-odd), ranked
    by (g_fp desc, term asc).

    Shape: one tiny parity-totals pass (two scalars), per-batch (term,
    parity) Arrow partials, ONE term-sharded exchange computing per-term
    G in-shard (totals closed over) with per-shard top-K candidates,
    bounded driver merge."""
    from .dedup import _sharded_groupby
    from .textpipe import _LLR_MAX_N, _s_fp

    docs = _docs(source)

    def par_tot(batch: pa.Table) -> pa.Table:
        _toks, token_doc, _ri, _h1, _h2 = _batch_tokens(batch)
        par = token_doc % 2
        return pa.table(
            {"te": pa.array([int((par == 0).sum())], pa.int64()),
             "to": pa.array([int((par == 1).sum())], pa.int64())}
        )

    tt = docs.map_batches(par_tot, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    te = int(tt["te"].sum()) if len(tt) else 0
    to = int(tt["to"].sum()) if len(tt) else 0
    n = te + to
    if n >= _LLR_MAX_N:
        raise ValueError(
            f"vocab_drift: corpus token total {n} >= 2^26 exceeds the "
            "int64-safe S(k) partial-sum domain"
        )

    def cnt(batch: pa.Table) -> pa.Table:
        toks, token_doc, _ri, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return pa.table(
                {"term": pa.array([], pa.utf8()),
                 "par": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64()),
                 "th": pa.array([], pa.int64())}
            )
        t = pa.table(
            {"term": toks,
             "par": pa.array((token_doc % 2).astype(np.int64), pa.int64()),
             "th": pa.array(h1.view(np.int64), pa.int64())}
        )
        g = t.group_by(["term", "par"]).aggregate(
            [("th", "min"), ([], "count_all")]
        )
        return pa.table(
            {"term": g["term"], "par": g["par"],
             "c": g["count_all"].cast(pa.int64()), "th": g["th_min"]}
        )

    rows = docs.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["term", "par"], as_index=False)["c"].sum()
        piv = s.pivot_table(index="term", columns="par", values="c",
                            aggfunc="sum", fill_value=0)
        a = piv[0].to_numpy(np.int64) if 0 in piv.columns \
            else np.zeros(len(piv), np.int64)
        b = piv[1].to_numpy(np.int64) if 1 in piv.columns \
            else np.zeros(len(piv), np.int64)
        gv = 2 * (
            _s_fp(a) + _s_fp(b) + _s_fp(te - a) + _s_fp(to - b)
            + _s_fp(np.full(len(a), n, np.int64))
            - _s_fp(a + b) - _s_fp(n - a - b)
            - _s_fp(np.full(len(a), te, np.int64))
            - _s_fp(np.full(len(a), to, np.int64))
        )
        out = pd.DataFrame(
            {"term": piv.index.to_numpy(), "n_even": a, "n_odd": b,
             "g_fp": gv}
        )
        return out.sort_values(
            ["g_fp", "term"], ascending=[False, True], kind="mergesort"
        ).head(DRIFT_TOP_K)

    part_schema = pa.schema(
        [("term", pa.utf8()), ("n_even", pa.int64()),
         ("n_odd", pa.int64()), ("g_fp", pa.int64())]
    )
    cand = _sharded_groupby(rows, ["th"], per_shard,
                            empty_schema=part_schema).to_pandas()
    cols = ["term", "n_even", "n_odd", "g_fp", "g", "rank"]
    if not len(cand):
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "term" else
            ("float64" if c == "g" else "int64")) for c in cols})
    top = cand.sort_values(
        ["g_fp", "term"], ascending=[False, True], kind="mergesort"
    ).head(DRIFT_TOP_K).reset_index(drop=True)
    top["g"] = round_half_away(
        top["g_fp"].to_numpy(np.int64) / 1e9, 6)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top.astype(
        {"n_even": "int64", "n_odd": "int64", "g_fp": "int64",
         "rank": "int64"}
    )[cols]


# ---------------------------------------------------------------------------
# per-source KL divergence vs the corpus unigram distribution — the
# source-mixture quality / domain-shift signal.  All per-term values are
# quantized through the verified fixed-point log2 FIRST (textpipe.
# _log2_fp_ext), so the numerator
#   kl_fp = sum_w c_sw * (L(c_sw) - L(c_w)) + T_s * (L(T) - L(T_s))
# is an exact integer on both engines (KL * T_s * 1e9 up to the defined
# quantization).  Python-int driver combine / HUGEINT SQL, the
# qty_discount_corr overflow pattern.

_KL_SHARD_MAX = 1 << 26  # per-shard token bound keeps c*(L(c)-L(cw)) in int64


def source_kl_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(source, n_tokens, kl_fp, kl): unigram KL(source || corpus) with
    ``kl = kl_fp / (n_tokens * 1e9)`` rounded half-away to 6.

    Shape: per-batch (term, source) Arrow count partials, ONE
    term-sharded exchange (a term's rows co-locate, so its corpus count
    c_w is exact in-shard) emitting per-source integer partial sums,
    bounded driver combine over Python ints (sources are a small
    dimension).  Raises if any shard exceeds the int64-safe token
    bound."""
    import os

    from ..sources.util import read_parquet_sized
    from .dedup import _sharded_groupby
    from .textpipe import _log2_fp_ext

    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["doc_id", "text", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "source": pa.array([], pa.utf8()),
             "c": pa.array([], pa.int64()),
             "th": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        src = pc.take(batch["source"], pa.array(row_idx, pa.int64()))
        t = pa.table(
            {"term": toks, "source": src,
             "th": pa.array(h1.view(np.int64), pa.int64())}
        )
        g = t.group_by(["term", "source"]).aggregate(
            [("th", "min"), ([], "count_all")]
        )
        return pa.table(
            {"term": g["term"], "source": g["source"],
             "c": g["count_all"].cast(pa.int64()), "th": g["th_min"]}
        )

    pr = docs.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["term", "source"], as_index=False)["c"].sum()
        c = s["c"].to_numpy(np.int64)
        if int(c.sum()) >= _KL_SHARD_MAX:
            raise ValueError(
                "source_kl: shard token count exceeds the int64-safe "
                f"bound {_KL_SHARD_MAX}; re-derive the fixed-point "
                "overflow analysis before lifting"
            )
        cw = s.groupby("term")["c"].transform("sum").to_numpy(np.int64)
        part = c * (_log2_fp_ext(c) - _log2_fp_ext(cw))
        out = pd.DataFrame({"source": s["source"], "p": part, "t": c})
        return out.groupby("source", as_index=False).agg(
            p=("p", "sum"), t=("t", "sum"))

    part_schema = pa.schema(
        [("source", pa.utf8()), ("p", pa.int64()), ("t", pa.int64())]
    )
    parts = _sharded_groupby(pr, ["th"], per_shard,
                             empty_schema=part_schema).to_pandas()
    cols = ["source", "n_tokens", "kl_fp", "kl"]
    if not len(parts):
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "source" else
            ("float64" if c == "kl" else "int64")) for c in cols})
    from .textpipe import _log2_fp_ext as _lg

    by_src = {}
    for _, r in parts.iterrows():
        p0, t0 = by_src.get(r["source"], (0, 0))
        by_src[r["source"]] = (p0 + int(r["p"]), t0 + int(r["t"]))
    total = sum(t for _p, t in by_src.values())
    lg_t = int(_lg(np.array([total], np.int64))[0])
    rows = []
    for src in sorted(by_src):
        p, ts = by_src[src]
        lg_ts = int(_lg(np.array([ts], np.int64))[0])
        kl_fp = p + ts * (lg_t - lg_ts)
        kl = float(round_half_away(
            np.array([float(kl_fp) / (float(ts) * 1e9)]), 6)[0])
        rows.append({"source": src, "n_tokens": ts, "kl_fp": kl_fp,
                     "kl": kl})
    return pd.DataFrame(rows).astype(
        {"n_tokens": "int64", "kl_fp": "int64"})[cols]


# ---------------------------------------------------------------------------
# corpus-wide line-level exact dedup (the C4/CCNet paragraph-dedup
# primitive): keep the FIRST occurrence (doc_id asc, line index asc) of
# every distinct non-empty line, report per-doc kept/removed counts.


def line_dedup_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc ``doc_id, n_lines, n_kept, n_removed`` under corpus-wide
    first-occurrence line dedup (lines = ``\\n``-separated, empty lines
    ignored).

    Shape: per-batch vectorized line split (Arrow ``split_pattern`` +
    list-offset arithmetic, span hashes straight off the flat byte
    buffer), ONE line-sharded exchange (equal lines co-locate, so the
    (doc_id, idx)-min winner is exact in-shard) emitting per-doc
    partials, then ONE doc-sharded sum.  No line text ever reaches the
    driver."""
    from ..functions.tokenize import _span_hashes, _string_buffers
    from .dedup import _sharded_groupby

    docs = _docs(source)

    def lines(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"line": pa.array([], pa.utf8()),
             "doc_id": pa.array([], pa.int64()),
             "idx": pa.array([], pa.int64()),
             "lh": pa.array([], pa.int64())}
        )
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if not pa.types.is_string(text.type):
            text = text.cast(pa.string())
        ls = pc.split_pattern(text, pattern="\n")
        counts = pc.list_value_length(ls).to_numpy(
            zero_copy_only=False).astype(np.int64)
        total = int(counts.sum())
        if not total:
            return empty
        flat = ls.flatten()
        cum = np.concatenate(([0], np.cumsum(counts[:-1])))
        idx = np.arange(total, dtype=np.int64) - np.repeat(cum, counts) + 1
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)[np.repeat(np.arange(len(counts)), counts)]
        data, offs = _string_buffers(flat)
        lens = np.diff(offs).astype(np.int64)
        # shard key: capped-span content hash mixed with the length —
        # any deterministic function of the content works (equal lines
        # MUST collide; unequal lines merely share a shard).  The span
        # cap must stay <= 16: _span_hashes' pad fold underflows
        # np.uint64 past 16 bytes and spins ~2^64 iterations.
        h1, _h2 = _span_hashes(
            data, offs[:-1].astype(np.int64), np.minimum(lens, 16))
        with np.errstate(over="ignore"):
            lh = (h1 ^ (lens.view(np.uint64)
                        * np.uint64(0x9E3779B97F4A7C15))).view(np.int64)
        keep = lens > 0
        if not keep.any():
            return empty
        km = pa.array(keep)
        return pa.table(
            {"line": pc.filter(flat, km),
             "doc_id": pa.array(doc_ids[keep], pa.int64()),
             "idx": pa.array(idx[keep], pa.int64()),
             "lh": pa.array(lh[keep], pa.int64())}
        )

    rows = docs.map_batches(lines, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["line", "doc_id", "idx"], kind="mergesort")
        first = ~g["line"].duplicated()
        out = g.assign(k=first.astype("int64")).groupby(
            "doc_id", as_index=False).agg(
            n_lines=("k", "size"), n_kept=("k", "sum"))
        return out.astype({"n_lines": "int64", "n_kept": "int64"})

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_lines", pa.int64()),
         ("n_kept", pa.int64())]
    )
    # NO mid-pipeline typed-empty union (empty_schema=None): a union
    # block between two chained sharded groupbys defeats the sort's
    # schema dedup and costs seconds; the SECOND exchange's union
    # provides the typed schema for the empty-corpus case
    parts = _sharded_groupby(rows, ["lh"], per_shard)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", as_index=False).agg(
            n_lines=("n_lines", "sum"), n_kept=("n_kept", "sum"))

    summed = _sharded_groupby(parts, ["doc_id"], per_doc,
                              empty_schema=part_schema)

    def finish(t: pa.Table) -> pa.Table:
        nl = t["n_lines"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = t["n_kept"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"],
             "n_lines": t["n_lines"],
             "n_kept": t["n_kept"],
             "n_removed": pa.array(nl - nk, pa.int64())}
        )

    return summed.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# crawl-snapshot diff: old corpus vs new corpus by content hash
# (added / removed / changed / unchanged).  The sf tables carry only one
# corpus version, so the NEW side is a deterministic augmentation of the
# same table, replicated verbatim in the SQL oracle (the
# embedding_neardup_srp precedent): doc_id%97==0 dropped, doc_id%89==0
# text-appended ' v2', doc_id%101==0 cloned as doc_id+10_000_000 with
# ' new' appended.  The diff MACHINERY is the real thing: md5 content
# hashes off the Arrow buffer, one doc-sharded exchange classifying each
# doc from its <=2 co-located rows, bounded per-status driver combine.


def snapshot_diff_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(status, n_docs, min_doc_id, max_doc_id) over the old->new corpus
    diff; status in added/removed/changed/unchanged."""
    import hashlib

    from ..functions.tokenize import _string_buffers
    from .dedup import _sharded_groupby

    docs = _docs(source)

    def sides(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "side": pa.array([], pa.int64()),
             "h": pa.array([], pa.utf8())}
        )
        if not batch.num_rows:
            return empty
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        data, offs = _string_buffers(texts)
        mv = memoryview(data)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = batch.num_rows
        ids, sd, hs = [], [], []
        for i in range(n):
            d = int(doc_ids[i])
            span = mv[offs[i]: offs[i + 1]]
            base = hashlib.md5(span).hexdigest()
            ids.append(d)
            sd.append(0)
            hs.append(base)
            if d % 97 != 0:  # survives into the new snapshot
                if d % 89 == 0:
                    m = hashlib.md5(span)
                    m.update(b" v2")
                    hn = m.hexdigest()
                else:
                    hn = base
                ids.append(d)
                sd.append(1)
                hs.append(hn)
            if d % 101 == 0:  # cloned into the new snapshot
                m = hashlib.md5(span)
                m.update(b" new")
                ids.append(d + 10_000_000)
                sd.append(1)
                hs.append(m.hexdigest())
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "side": pa.array(sd, pa.int64()),
             "h": pa.array(hs, pa.utf8())}
        )

    rows = docs.map_batches(sides, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.pivot_table(index="doc_id", columns="side", values="h",
                            aggfunc="first")
        ho = piv[0] if 0 in piv.columns else pd.Series(
            np.nan, index=piv.index)
        hn = piv[1] if 1 in piv.columns else pd.Series(
            np.nan, index=piv.index)
        status = np.where(
            ho.isna(), "added",
            np.where(hn.isna(), "removed",
                     np.where(ho != hn, "changed", "unchanged")))
        f = pd.DataFrame(
            {"status": status,
             "doc_id": piv.index.to_numpy(np.int64)})
        return f.groupby("status", as_index=False).agg(
            n_docs=("doc_id", "size"), min_doc_id=("doc_id", "min"),
            max_doc_id=("doc_id", "max"))

    part_schema = pa.schema(
        [("status", pa.utf8()), ("n_docs", pa.int64()),
         ("min_doc_id", pa.int64()), ("max_doc_id", pa.int64())]
    )
    parts = _sharded_groupby(rows, ["doc_id"], per_shard,
                             empty_schema=part_schema).to_pandas()
    cols = ["status", "n_docs", "min_doc_id", "max_doc_id"]
    if not len(parts):
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "status" else "int64") for c in cols})
    out = parts.groupby("status", as_index=False).agg(
        n_docs=("n_docs", "sum"), min_doc_id=("min_doc_id", "min"),
        max_doc_id=("max_doc_id", "max"))
    return out.astype(
        {"n_docs": "int64", "min_doc_id": "int64", "max_doc_id": "int64"}
    )[cols]


# ---------------------------------------------------------------------------
# Hill tail-index estimator over the term-frequency distribution — the
# heavy-tail diagnostic complementing zipf_slope.  hill_fp =
# sum_{i<k} (L(c_i) - L(c_k)) over the top-TAIL_K counts in fixed-point
# log2 (textpipe._log2_fp_ext), alpha = (k-1)*1e9 / hill_fp as the only
# float (identical int->double casts on both engines).

TAIL_K = 64


def tail_index_df(source: str | rd.Dataset) -> pd.DataFrame:
    """One row: ``n_terms, c_min, hill_fp, alpha`` (alpha = 0.0 when
    n_terms < 2 or hill_fp = 0 by convention on both engines).

    Shape: one bounded vocabulary pass (per-shard top-K candidates,
    fixed-size driver merge), O(K) driver combine over exact ints."""
    from .textpipe import _log2_fp_ext

    docs = _docs(source)
    vocab_df, _total = _count_vocab(docs, TAIL_K)
    k = len(vocab_df)
    out = {"n_terms": [np.int64(k)], "c_min": [np.int64(0)],
           "hill_fp": [np.int64(0)], "alpha": [0.0]}
    if k:
        c = vocab_df["c"].to_numpy(np.int64)
        lg = _log2_fp_ext(c)
        c_min = int(c[-1])
        hill = int(lg[:-1].sum() - (k - 1) * int(lg[-1]))
        out["c_min"] = [np.int64(c_min)]
        out["hill_fp"] = [np.int64(hill)]
        if k >= 2 and hill > 0:
            out["alpha"] = [float(round_half_away(
                np.array([float((k - 1) * 1_000_000_000) / float(hill)]),
                6)[0])]
    return pd.DataFrame(out).astype(
        {"n_terms": "int64", "c_min": "int64", "hill_fp": "int64"})


# ---------------------------------------------------------------------------
# MOSS-style plagiarism pairs (Schleimer/Wilkerson/Aiken winnowing paper's
# stated application): doc pairs sharing >= MOSS_MIN_SHARED distinct
# winnowed fingerprints.  The skew guard is DETERMINISTIC and replicated
# in SQL — per fingerprint only the MOSS_FP_CAP smallest doc_ids pair up
# (row_number() <= CAP), so a boilerplate fingerprint shared by millions
# of docs costs C(CAP,2), not C(df,2), and both engines agree exactly.

MOSS_FP_CAP = 64
MOSS_MIN_SHARED = 2


def moss_pairs_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(doc_a, doc_b, n_shared) for pairs sharing >= MOSS_MIN_SHARED
    winnowed fingerprints (under the per-fp cap).

    Shape: the winnow pass (zero exchanges) -> per-batch distinct
    (doc, fp) -> ONE fp-sharded exchange (a fingerprint's docs co-locate:
    cap + pair generation are exact in-shard) -> ONE pair-sharded sum."""
    from .dedup import _sharded_groupby

    wf = winnow_fingerprints_ds(source)

    def dedup_fp(b: pa.Table) -> pa.Table:
        g = pa.table(
            {"doc_id": b["doc_id"], "fp": b["fp"]}
        ).group_by(["doc_id", "fp"]).aggregate([])
        return g

    dfp = wf.map_batches(dedup_fp, batch_format="pyarrow",
                         zero_copy_batch=True)

    def per_fp(g: pd.DataFrame) -> pd.DataFrame:
        s = g[["doc_id", "fp"]].drop_duplicates()
        s = s.sort_values(["fp", "doc_id"], kind="mergesort")
        s = s.groupby("fp", as_index=False).head(MOSS_FP_CAP)
        j = s.merge(s, on="fp", suffixes=("_a", "_b"))
        j = j[j["doc_id_a"] < j["doc_id_b"]]
        out = j.groupby(["doc_id_a", "doc_id_b"], as_index=False).size()
        out.columns = ["doc_a", "doc_b", "n_shared"]
        return out.astype({"doc_a": "int64", "doc_b": "int64",
                           "n_shared": "int64"})

    parts = _sharded_groupby(dfp, ["fp"], per_fp)

    def per_pair(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False)[
            "n_shared"].sum()
        out = out[out["n_shared"] >= MOSS_MIN_SHARED]
        return out.astype({"doc_a": "int64", "doc_b": "int64",
                           "n_shared": "int64"})

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n_shared", pa.int64())]
    )
    res = _sharded_groupby(parts, ["doc_a", "doc_b"], per_pair,
                           empty_schema=pair_schema).to_pandas()
    cols = ["doc_a", "doc_b", "n_shared"]
    if not len(res):
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return res.astype({c: "int64" for c in cols})[cols]


# ---------------------------------------------------------------------------
# term burstiness (Church & Gale): variance-to-mean ratio of per-doc tf
# over ALL docs (zeros included) for the top-BURST_V terms.  With N docs,
# s1 = sum tf, s2 = sum tf^2:  VMR = (N*s2 - s1^2) / (N*s1) — exact
# integers until the single final x1e6 floor (Python ints / HUGEINT SQL;
# N*s2 can reach 2^68).  VMR >> 1 marks bursty content words, VMR ~ 1
# Poisson-like function words — the classic stopword separator.

BURST_V = 32


def term_burstiness_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Top-``BURST_V`` terms by total count: ``term, df, s1, s2,
    vmr_x1e6`` (ties term asc; vmr floor-scaled by 1e6).

    Shape: per-batch per-(term, doc) Arrow tf partials folded to
    per-term (s1, s2, df) — exact, docs never span batches — ONE
    term-sharded exchange with per-shard top-V candidates, O(V) driver
    combine over Python ints."""
    from .dedup import _sharded_groupby

    docs = _docs(source)

    def n_docs_part(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    nd = docs.map_batches(n_docs_part, batch_format="pyarrow").to_pandas()
    n_docs = int(nd["n"].sum()) if len(nd) else 0
    cols = ["term", "df", "s1", "s2", "vmr_x1e6"]
    if not n_docs:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "term" else "int64") for c in cols})

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "df": pa.array([], pa.int64()),
             "s1": pa.array([], pa.int64()),
             "s2": pa.array([], pa.int64()),
             "th": pa.array([], pa.int64())}
        )
        toks, token_doc, _ri, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        t = pa.table(
            {"term": toks,
             "doc": pa.array(token_doc, pa.int64()),
             "th": pa.array(h1.view(np.int64), pa.int64())}
        )
        tf = t.group_by(["term", "doc"]).aggregate(
            [("th", "min"), ([], "count_all")])
        c = tf["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = pa.table(
            {"term": tf["term"],
             "one": pa.array(np.ones(len(c), np.int64), pa.int64()),
             "c": pa.array(c, pa.int64()),
             "c2": pa.array(c * c, pa.int64()),
             "th": tf["th_min"]}
        )
        g = t2.group_by("term").aggregate(
            [("one", "sum"), ("c", "sum"), ("c2", "sum"), ("th", "min")])
        return pa.table(
            {"term": g["term"],
             "df": g["one_sum"].cast(pa.int64()),
             "s1": g["c_sum"].cast(pa.int64()),
             "s2": g["c2_sum"].cast(pa.int64()),
             "th": g["th_min"]}
        )

    pr = docs.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", as_index=False).agg(
            df=("df", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))
        s = s.sort_values(["s1", "term"], ascending=[False, True],
                          kind="mergesort").head(BURST_V)
        return s.astype({"df": "int64", "s1": "int64", "s2": "int64"})

    part_schema = pa.schema(
        [("term", pa.utf8()), ("df", pa.int64()),
         ("s1", pa.int64()), ("s2", pa.int64())]
    )
    cand = _sharded_groupby(pr, ["th"], per_shard,
                            empty_schema=part_schema).to_pandas()
    if not len(cand):
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "term" else "int64") for c in cols})
    top = cand.sort_values(["s1", "term"], ascending=[False, True],
                           kind="mergesort").head(BURST_V)
    vmr = [
        (1_000_000 * (n_docs * int(r.s2) - int(r.s1) ** 2))
        // (n_docs * int(r.s1))
        for r in top.itertuples()
    ]
    out = top.assign(vmr_x1e6=np.array(vmr, np.int64))
    return out.astype(
        {"df": "int64", "s1": "int64", "s2": "int64", "vmr_x1e6": "int64"}
    )[cols]


# ---------------------------------------------------------------------------
# exact two-sample Kolmogorov-Smirnov on doc length: src0 vs the rest —
# the distribution-shift test complementing vocab_drift (which tests the
# vocabulary; this tests a numeric marginal).  KS in exact integers:
# D * n_a * n_b = max over values v of |n_b*C_a(v) - n_a*C_b(v)|
# (C = cumulative counts), so the statistic is a single int64 (N^2 <
# 2^52) and only the final x1e6 report floors.

KS_MAX_VALUES = 1 << 20  # distinct-value histogram bound (driver combine)
KS_GROUP_SOURCE = "src0"


def length_ks_df(source: str | rd.Dataset) -> pd.DataFrame:
    """One row: ``n_a, n_b, ks_num, ks_x1e6, arg_value`` where
    ks_num = max |n_b*C_a - n_a*C_b|, ks_x1e6 = 1e6*ks_num // (n_a*n_b),
    arg_value = the SMALLEST n_chars attaining the max.  Empty when
    either group is empty.

    Shape: per-batch (value, group) count partials; the distinct-value
    histogram reaches the driver (lengths are a bounded dimension —
    loud KS_MAX_VALUES cap), where the CDF scan is O(V)."""
    import os

    from ..sources.util import read_parquet_sized

    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["n_chars", "source"])

    def partials(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"v": pa.array([], pa.int64()),
             "ca": pa.array([], pa.int64()),
             "cb": pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        v = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = pc.equal(b["source"], KS_GROUP_SOURCE).to_numpy(
            zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        ca = np.bincount(inv[grp], minlength=len(uv)).astype(np.int64)
        cb = np.bincount(inv[~grp], minlength=len(uv)).astype(np.int64)
        return pa.table(
            {"v": pa.array(uv, pa.int64()),
             "ca": pa.array(ca, pa.int64()),
             "cb": pa.array(cb, pa.int64())}
        )

    parts = docs.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    cols = ["n_a", "n_b", "ks_num", "ks_x1e6", "arg_value"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    if not len(parts):
        return _empty()
    h = parts.groupby("v", as_index=False).agg(
        ca=("ca", "sum"), cb=("cb", "sum")).sort_values("v")
    if len(h) > KS_MAX_VALUES:
        raise ValueError(
            f"length_ks: {len(h)} distinct values exceeds the declared "
            f"driver-histogram bound {KS_MAX_VALUES}"
        )
    na = int(h["ca"].sum())
    nb = int(h["cb"].sum())
    if na == 0 or nb == 0:
        return _empty()
    Ca = np.cumsum(h["ca"].to_numpy(np.int64))
    Cb = np.cumsum(h["cb"].to_numpy(np.int64))
    d = np.abs(nb * Ca - na * Cb)
    i = int(np.argmax(d))  # first max == smallest value attaining it
    return pd.DataFrame(
        [{"n_a": na, "n_b": nb, "ks_num": int(d[i]),
          "ks_x1e6": (1_000_000 * int(d[i])) // (na * nb),
          "arg_value": int(h["v"].iloc[i])}]
    ).astype({c: "int64" for c in cols})[cols]


# ---------------------------------------------------------------------------
# supervised feature selection: top G-test terms PER LANGUAGE (the
# one-vs-rest 2x2 presence test used to pick classifier features).
# Same exact fixed-point S(k) = k*log2(k) machinery as vocab_drift, over
# doc-level presence counts, so g_fp is an exact int64 rank key.

FEAT_TOP_K = 5


def lang_feature_terms_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Top-``FEAT_TOP_K`` terms per lang by the one-vs-rest presence
    G-test: ``lang, term, df_in, df_out, g_fp, rank`` (ties term asc).

    Shape: one tiny per-lang doc-count pass (bounded langs, broadcast),
    per-batch (term, lang) df partials (exact — docs never span
    batches), ONE term-sharded exchange computing per-(term, lang) G
    in-shard with per-shard per-lang top-K candidates, bounded driver
    merge."""
    import os

    from ..sources.util import read_parquet_sized
    from .dedup import _sharded_groupby
    from .textpipe import _LLR_MAX_N, _s_fp

    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["doc_id", "text", "lang"])

    def lang_counts(b: pa.Table) -> pa.Table:
        g = pa.table({"lang": b["lang"]}).group_by("lang").aggregate(
            [([], "count_all")])
        return pa.table(
            {"lang": g["lang"], "n": g["count_all"].cast(pa.int64())}
        )

    lc = docs.map_batches(lang_counts, batch_format="pyarrow").to_pandas()
    cols = ["lang", "term", "df_in", "df_out", "g_fp", "rank"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c in ("lang", "term") else "int64")
            for c in cols})

    if not len(lc):
        return _empty()
    lsum = lc.groupby("lang")["n"].sum()
    n_by_lang = {str(k): int(v) for k, v in lsum.items()}
    n_total = int(lsum.sum())
    if n_total >= _LLR_MAX_N:
        raise ValueError(
            f"lang_feature_terms: {n_total} docs >= 2^26 exceeds the "
            "int64-safe S(k) domain"
        )

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "lang": pa.array([], pa.utf8()),
             "df": pa.array([], pa.int64()),
             "th": pa.array([], pa.int64())}
        )
        toks, token_doc, row_idx, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        lg = pc.take(batch["lang"], pa.array(row_idx, pa.int64()))
        t = pa.table(
            {"term": toks,
             "doc": pa.array(token_doc, pa.int64()),
             "lang": lg,
             "th": pa.array(h1.view(np.int64), pa.int64())}
        )
        d = t.group_by(["term", "doc", "lang"]).aggregate([("th", "min")])
        g = d.group_by(["term", "lang"]).aggregate(
            [("doc", "count"), ("th_min", "min")])
        return pa.table(
            {"term": g["term"], "lang": g["lang"],
             "df": g["doc_count"].cast(pa.int64()),
             "th": g["th_min_min"]}
        )

    pr = docs.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["term", "lang"], as_index=False)["df"].sum()
        t_tot = s.groupby("term")["df"].transform("sum").to_numpy(np.int64)
        a = s["df"].to_numpy(np.int64)
        nl = s["lang"].map(n_by_lang).to_numpy(np.int64)
        b = nl - a
        c = t_tot - a
        d = n_total - nl - c
        gv = 2 * (
            _s_fp(a) + _s_fp(b) + _s_fp(c) + _s_fp(d)
            + _s_fp(np.full(len(a), n_total, np.int64))
            - _s_fp(a + b) - _s_fp(c + d) - _s_fp(a + c) - _s_fp(b + d)
        )
        out = pd.DataFrame(
            {"lang": s["lang"], "term": s["term"],
             "df_in": a, "df_out": c, "g_fp": gv}
        )
        out = out.sort_values(["lang", "g_fp", "term"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return out.groupby("lang", as_index=False).head(FEAT_TOP_K).astype(
            {"df_in": "int64", "df_out": "int64", "g_fp": "int64"})

    part_schema = pa.schema(
        [("lang", pa.utf8()), ("term", pa.utf8()), ("df_in", pa.int64()),
         ("df_out", pa.int64()), ("g_fp", pa.int64())]
    )
    cand = _sharded_groupby(pr, ["th"], per_shard,
                            empty_schema=part_schema).to_pandas()
    if not len(cand):
        return _empty()
    top = cand.sort_values(["lang", "g_fp", "term"],
                           ascending=[True, False, True],
                           kind="mergesort").groupby(
        "lang", as_index=False).head(FEAT_TOP_K).reset_index(drop=True)
    top["rank"] = top.groupby("lang").cumcount() + 1
    return top.astype(
        {"df_in": "int64", "df_out": "int64", "g_fp": "int64",
         "rank": "int64"})[cols]


# ---------------------------------------------------------------------------
# lexical richness: vocabulary size and hapax/dis legomena counts (the
# classic corpus-quality diagnostics; a synthetic or template corpus has
# an anomalously low hapax ratio).


def hapax_ratio_df(source: str | rd.Dataset) -> pd.DataFrame:
    """One row: ``n_terms, n_hapax, n_dis, hapax_x1e6`` (cf==1 / cf==2
    term counts; ratio = 1e6*n_hapax // n_terms).

    Shape: per-batch per-term count partials, ONE term-sharded exchange
    emitting three scalars per shard, O(shards) driver sum."""
    from .dedup import _sharded_groupby

    docs = _docs(source)

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "c": pa.array([], pa.int64()),
             "th": pa.array([], pa.int64())}
        )
        toks, _td, _ri, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        g = pa.table(
            {"term": toks, "th": pa.array(h1.view(np.int64), pa.int64())}
        ).group_by("term").aggregate([("th", "min"), ([], "count_all")])
        return pa.table(
            {"term": g["term"], "c": g["count_all"].cast(pa.int64()),
             "th": g["th_min"]}
        )

    pr = docs.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term")["c"].sum()
        return pd.DataFrame(
            [{"n_terms": np.int64(len(s)),
              "n_hapax": np.int64(int((s == 1).sum())),
              "n_dis": np.int64(int((s == 2).sum()))}]
        ).astype({"n_terms": "int64", "n_hapax": "int64", "n_dis": "int64"})

    part_schema = pa.schema(
        [("n_terms", pa.int64()), ("n_hapax", pa.int64()),
         ("n_dis", pa.int64())]
    )
    parts = _sharded_groupby(pr, ["th"], per_shard,
                             empty_schema=part_schema).to_pandas()
    cols = ["n_terms", "n_hapax", "n_dis", "hapax_x1e6"]
    nt = int(parts["n_terms"].sum()) if len(parts) else 0
    nh = int(parts["n_hapax"].sum()) if len(parts) else 0
    ndi = int(parts["n_dis"].sum()) if len(parts) else 0
    return pd.DataFrame(
        [{"n_terms": nt, "n_hapax": nh, "n_dis": ndi,
          "hapax_x1e6": (1_000_000 * nh) // nt if nt else 0}]
    ).astype({c: "int64" for c in cols})[cols]


# ---------------------------------------------------------------------------
# source-mixture concentration: exact Gini coefficient of token mass
# across sources (bounded dimension).  With sources sorted by (mass asc,
# name asc), gini_num = sum_i (2i - n - 1) * x_i and
# gini = gini_num / (n * total).


def source_gini_df(source: str | rd.Dataset) -> pd.DataFrame:
    """One row: ``n_sources, total_tokens, gini_num, gini_x1e6``."""
    import os

    from ..sources.util import read_parquet_sized

    if isinstance(source, rd.Dataset):
        docs = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        docs = read_parquet_sized(path, columns=["doc_id", "text", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"source": pa.array([], pa.utf8()),
             "t": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        src = pc.take(batch["source"], pa.array(row_idx, pa.int64()))
        g = pa.table({"source": src}).group_by("source").aggregate(
            [([], "count_all")])
        return pa.table(
            {"source": g["source"], "t": g["count_all"].cast(pa.int64())}
        )

    parts = docs.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    cols = ["n_sources", "total_tokens", "gini_num", "gini_x1e6"]
    if not len(parts):
        return pd.DataFrame(
            [{"n_sources": 0, "total_tokens": 0, "gini_num": 0,
              "gini_x1e6": 0}]).astype({c: "int64" for c in cols})[cols]
    s = parts.groupby("source", as_index=False)["t"].sum()
    s = s.sort_values(["t", "source"], ascending=[True, True],
                      kind="mergesort").reset_index(drop=True)
    x = s["t"].to_numpy(np.int64)
    n = len(x)
    total = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    gini_num = int(((2 * i - n - 1) * x).sum())
    gini = (1_000_000 * gini_num) // (n * total) if total else 0
    return pd.DataFrame(
        [{"n_sources": n, "total_tokens": total, "gini_num": gini_num,
          "gini_x1e6": gini}]
    ).astype({c: "int64" for c in cols})[cols]


# ---------------------------------------------------------------------------
# HITS hubs/authorities over the df-directed co-occurrence graph

HITS_ITERS = 3
HITS_SCALE = 1_000_000  # max-normalized fixed point: 1.0 == 10^6


def hits_terms(
    source: str | rd.Dataset,
    *,
    top_vocab: int = PR_TOP_VOCAB,
    iters: int = HITS_ITERS,
) -> pd.DataFrame:
    """HITS (Kleinberg 1999 — public algorithm) over the co-occurrence
    graph of the top-df terms, directed low-df → high-df (ties by term
    order) so hubs and authorities genuinely differ on this corpus.

    Exactness: the classic L2 normalization needs sqrt, so each half-
    step normalizes by the MAX instead (v * SCALE // max — pure
    integer, rank-preserving; max-normalized HITS converges to the
    same principal directions).  With V ≤ 4096 and SCALE = 10^6 every
    intermediate fits int64 on the engine side; the SQL unrolls the
    same recurrence in HUGEINT.

    Shape: identical cost class to pagerank_terms — two bounded passes
    (top-vocab df, V×V boolean-matmul co-occurrence) and a driver-side
    integer matmul loop on the tiny adjacency.
    Columns: ``term, outdeg, indeg, auth, hub, hub_rank``."""
    docs = _docs(source)
    out_cols = ["term", "outdeg", "indeg", "auth", "hub", "hub_rank"]
    cand = top_vocab_df(docs, top_vocab)
    if not len(cand):
        return pd.DataFrame({
            "term": pd.Series([], dtype=object),
            "outdeg": pd.Series([], dtype="int64"),
            "indeg": pd.Series([], dtype="int64"),
            "auth": pd.Series([], dtype="int64"),
            "hub": pd.Series([], dtype="int64"),
            "hub_rank": pd.Series([], dtype="int64"),
        })
    vocab_terms = cand["term"].tolist()
    dfv = cand["df"].to_numpy(np.int64)
    adj = cooc_adjacency(docs, vocab_terms)
    tarr = np.array(vocab_terms)
    lt = (dfv[:, None] < dfv[None, :]) | (
        (dfv[:, None] == dfv[None, :]) & (tarr[:, None] < tarr[None, :])
    )
    D = (adj.astype(bool) & lt).astype(np.int64)
    h = np.full(len(vocab_terms), HITS_SCALE, np.int64)
    a = np.zeros(len(vocab_terms), np.int64)
    for _ in range(iters):
        a = D.T @ h
        m = int(a.max()) if len(a) else 0
        if m > 0:
            a = a * HITS_SCALE // m
        h = D @ a
        m = int(h.max()) if len(h) else 0
        if m > 0:
            h = h * HITS_SCALE // m
    out = pd.DataFrame({
        "term": np.asarray(vocab_terms, dtype=object),
        "outdeg": D.sum(axis=1).astype(np.int64),
        "indeg": D.sum(axis=0).astype(np.int64),
        "auth": a.astype(np.int64),
        "hub": h.astype(np.int64),
    }).sort_values(["hub", "term"], ascending=[False, True],
                   kind="mergesort").reset_index(drop=True)
    out["hub_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    for c in ("outdeg", "indeg", "auth", "hub"):
        out[c] = out[c].astype("int64")
    return out[out_cols]


# ---------------------------------------------------------------------------
# S-stemmer vocabulary folding (Harman-style plural stripper)

STEM_TOP_K = 30
# Anchored RE2 rules applied IN ORDER on both engines (Arrow
# replace_substring_regex and DuckDB regexp_replace share RE2 and the
# \1 rewrite syntax), chosen so no rule's output can match a later
# rule: ies->y unless e/a-preceded, es->e unless a/e/o/i-preceded,
# drop trailing s unless u/s/e/i-preceded ("this", "class", "corpus"
# and all es/ies endings stay put for the later rules' exclusions).
STEM_RULES = (
    (r"([^ae])ies$", r"\1y"),
    (r"([^aeoi])es$", r"\1e"),
    (r"([^usei])s$", r"\1"),
)


def _stem(toks: pa.Array) -> pa.Array:
    for pat, rep in STEM_RULES:
        toks = pc.replace_substring_regex(toks, pattern=pat, replacement=rep)
    return toks


# sf augmentation (replicated in the SQL oracle): the synthetic corpus
# has no inflected forms, so append plurals of corpus words to every
# Nth doc — same pattern as the PII / substring-dup augmentations.
STEM_AUG_EVERY = 5
STEM_AUG_TEXT = " scans joins filters merges queries"


def _stem_augment(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    text = pc.binary_join_element_wise(
        pc.cast(batch["text"], pa.string()),
        pc.if_else(
            pa.array(ids % STEM_AUG_EVERY == 0),
            pa.array([STEM_AUG_TEXT] * n, pa.string()),
            pa.array([""] * n, pa.string()),
        ),
        "",
    )
    return pa.table({"doc_id": batch["doc_id"], "text": text})


def stem_terms_df(source: str | rd.Dataset, *, k: int = STEM_TOP_K,
                  augment: bool = True) -> pd.DataFrame:
    """Top-``k`` stems by document frequency after S-stemmer vocabulary
    folding: ``stem, n_tokens, df, n_forms`` (occurrences, distinct
    docs, distinct surface forms), ordered df desc / stem asc.

    Shape: per-batch Arrow group_by gives exact (stem, doc) / (stem,
    term) partials (documents never span batches, so per-batch df
    partials sum exactly); ONE stem-sharded exchange (internal hash
    key, never in the output) merges counts and dedups surface forms;
    a stem lives in exactly one shard, so per-shard top-k -> driver
    top-k is exact at any vocabulary size."""
    from ..functions.hashing import term_hash
    from .dedup import _sharded_groupby

    docs = _docs(source)
    if augment:
        docs = docs.map_batches(_stem_augment, batch_format="pyarrow",
                                zero_copy_batch=True)
    cols = ["stem", "n_tokens", "df", "n_forms"]

    part_schema = pa.schema([
        ("stem", pa.utf8()), ("term", pa.utf8()), ("kind", pa.int64()),
        ("n", pa.int64()), ("sh", pa.int64()),
    ])

    def partial(batch: pa.Table) -> pa.Table:
        empty = part_schema.empty_table()
        toks, token_doc, _ri, _h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        stems = _stem(toks)
        t = pa.table({
            "stem": stems, "term": toks,
            "doc": pa.array(token_doc, pa.int64()),
        })
        # kind 0: per-stem (token count, df partial via (stem,doc) dedup)
        tf = t.group_by(["stem"]).aggregate([("stem", "count")])
        dfp = (
            t.group_by(["stem", "doc"]).aggregate([])
            .group_by(["stem"]).aggregate([("doc", "count")])
        )
        forms = t.group_by(["stem", "term"]).aggregate([])
        out = pa.table({
            "stem": pa.concat_arrays([
                tf["stem"].combine_chunks(), dfp["stem"].combine_chunks(),
                forms["stem"].combine_chunks(),
            ]),
            "term": pa.concat_arrays([
                pa.nulls(tf.num_rows, pa.utf8()).fill_null(""),
                pa.nulls(dfp.num_rows, pa.utf8()).fill_null(""),
                forms["term"].combine_chunks(),
            ]),
            "kind": pa.array(
                [0] * tf.num_rows + [1] * dfp.num_rows + [2] * forms.num_rows,
                pa.int64(),
            ),
            "n": pa.concat_arrays([
                tf["stem_count"].cast(pa.int64()).combine_chunks(),
                dfp["doc_count"].cast(pa.int64()).combine_chunks(),
                pa.nulls(forms.num_rows, pa.int64()).fill_null(0),
            ]),
        })
        sh = term_hash(out["stem"].combine_chunks()).view(np.int64)
        return out.append_column("sh", pa.array(sh, pa.int64()))

    parts = docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        tf = g[g["kind"] == 0].groupby("stem")["n"].sum()
        dfc = g[g["kind"] == 1].groupby("stem")["n"].sum()
        forms = (
            g[g["kind"] == 2].drop_duplicates(["stem", "term"])
            .groupby("stem").size()
        )
        out = pd.DataFrame({
            "stem": tf.index,
            "n_tokens": tf.to_numpy(np.int64),
            "df": dfc.reindex(tf.index).fillna(0).to_numpy(np.int64),
            "n_forms": forms.reindex(tf.index).fillna(0).to_numpy(np.int64),
        })
        return out.sort_values(["df", "stem"], ascending=[False, True],
                               kind="mergesort").head(k)

    out_schema = pa.schema([
        ("stem", pa.utf8()), ("n_tokens", pa.int64()),
        ("df", pa.int64()), ("n_forms", pa.int64()),
    ])
    res = _sharded_groupby(parts, ["sh"], per_shard,
                           empty_schema=out_schema).to_pandas()
    if not len(res):
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "stem" else "int64") for c in cols})
    res = res.sort_values(["df", "stem"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    for c in cols[1:]:
        res[c] = res[c].astype("int64")
    return res[cols]


def sql_stem_terms() -> str:
    reps = "term"
    for pat, rep in STEM_RULES:
        reps = f"regexp_replace({reps}, '{pat}', '{rep}')".replace(
            "\\1", "\\1")
    return f"""
WITH aug AS (
    SELECT doc_id,
           text || CASE WHEN doc_id % {STEM_AUG_EVERY} = 0
                        THEN '{STEM_AUG_TEXT}' ELSE '' END AS text
    FROM documents
),
filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM aug
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
st AS (SELECT doc_id, term, {reps} AS stem FROM tok),
agg AS (
    SELECT stem, count(*)::BIGINT AS n_tokens,
           count(DISTINCT doc_id)::BIGINT AS df,
           count(DISTINCT term)::BIGINT AS n_forms
    FROM st GROUP BY 1
)
SELECT stem, n_tokens, df, n_forms FROM agg
ORDER BY df DESC, stem LIMIT {STEM_TOP_K}
"""


# ---------------------------------------------------------------------------
# asymmetric containment join (quote / sub-document detection): the
# near-dup direction Jaccard misses — a short doc whose shingles are a
# subset of a long doc scores low Jaccard but high containment
# C(A,B) = |sh(A) n sh(B)| / |sh(A)|.

CONT_W = 8            # token-shingle width (same class as NOVELTY_WINDOW)
CONT_MIN_PCT = 80     # keep ordered pairs with 100*ov >= pct*|sh(A)|
CONT_FP_CAP = 64      # per-shingle doc cap (deterministic doc-asc,
                      # replicated in the SQL oracle — the moss_pairs guard)
CONT_QUOTE_EVERY = 50
CONT_QUOTE_OFFSET = 20_000_000
CONT_QUOTE_CHARS = 200


def _quote_augment(batch: pa.Table) -> pa.Table:
    """sf augmentation (mirrored in SQL): every Nth doc spawns a 'quote'
    doc holding its first ``CONT_QUOTE_CHARS`` characters — a genuine
    PARTIAL containment (the cut boundary token breaks a few shingles),
    which the synthetic corpus cannot produce naturally."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = ids % CONT_QUOTE_EVERY == 0
    q = batch.filter(pa.array(m))
    quotes = pa.table({
        "doc_id": pc.add(q["doc_id"], CONT_QUOTE_OFFSET),
        "text": pc.utf8_slice_codeunits(
            pc.cast(q["text"], pa.string()), 0, CONT_QUOTE_CHARS),
    })
    base = pa.table({"doc_id": batch["doc_id"], "text": batch["text"]})
    return pa.concat_tables([base, quotes])


def containment_pairs_df(
    source: str | rd.Dataset, *, augment: bool = True
) -> pd.DataFrame:
    """Ordered containment pairs: ``doc_a, doc_b, n_shared, size_a,
    cont_pct`` for every (A, B) with 100·|sh(A) ∩ sh(B)| >=
    ``CONT_MIN_PCT``·|sh(A)| over distinct ``CONT_W``-token shingles.

    Shape (the moss_pairs pipeline with asymmetric normalization): the
    shingle pass is per-batch exact (group on the shingle STRING, the
    wh hash only routes shards); ONE shingle-sharded exchange generates
    in-bucket pairs under the deterministic ``CONT_FP_CAP`` doc-asc cap;
    ONE pair-sharded sum gives exact overlaps, mirrored to both
    directions; ONE doc-sharded join attaches |sh(A)| and applies the
    integer threshold.  No driver materialization beyond the final
    (threshold-filtered) result."""
    from .dedup import _sharded_groupby

    docs = _docs(source)
    if augment:
        docs = docs.map_batches(_quote_augment, batch_format="pyarrow",
                                zero_copy_batch=True)
    w = CONT_W

    def windows(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "wh": pa.array([], pa.int64()),
            "shingle": pa.array([], pa.utf8()),
            "doc_id": pa.array([], pa.int64()),
        })
        toks, token_doc, row_idx, h1, _h2 = _batch_tokens(batch)
        n = len(toks)
        if n < w:
            return empty
        keep = row_idx[: n - w + 1] == row_idx[w - 1 :]
        pieces = [toks.slice(i, n - w + 1) for i in range(w)]
        joined = pc.binary_join_element_wise(*pieces, " ").filter(
            pa.array(keep))
        acc = np.zeros(n - w + 1, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(w):
                hv = h1[i : i + n - w + 1]
                acc = (acc ^ hv) * np.uint64(1099511628211)
        t = pa.table({
            "wh": pa.array(acc[keep].view(np.int64), pa.int64()),
            "shingle": joined,
            "doc_id": pa.array(token_doc[: n - w + 1][keep], pa.int64()),
        })
        g = t.group_by(["shingle", "doc_id"]).aggregate([("wh", "min")])
        return pa.table({
            "wh": g["wh_min"],
            "shingle": g["shingle"],
            "doc_id": g["doc_id"],
        })

    win = docs.map_batches(windows, batch_format="pyarrow",
                           zero_copy_batch=True)

    # per-doc distinct-shingle sizes: exact per batch (docs never span
    # batches; shingles already deduped per doc)
    def size_part(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_id"]).aggregate([([], "count_all")])
        return pa.table({
            "doc_a": g["doc_id"],
            "doc_b": pa.nulls(g.num_rows, pa.int64()).fill_null(-1),
            "n": g["count_all"].cast(pa.int64()),
            "kind": pa.nulls(g.num_rows, pa.int64()).fill_null(1),
        })

    sizes = win.map_batches(size_part, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_shingle(g: pd.DataFrame) -> pd.DataFrame:
        s = g[["shingle", "doc_id"]].drop_duplicates()
        s = s.sort_values(["shingle", "doc_id"], kind="mergesort")
        s = s.groupby("shingle", as_index=False).head(CONT_FP_CAP)
        j = s.merge(s, on="shingle", suffixes=("_a", "_b"))
        j = j[j["doc_id_a"] < j["doc_id_b"]]
        out = j.groupby(["doc_id_a", "doc_id_b"], as_index=False).size()
        out.columns = ["doc_a", "doc_b", "n"]
        return out.astype({"doc_a": "int64", "doc_b": "int64", "n": "int64"})

    parts = _sharded_groupby(win, ["wh"], per_shingle)

    def per_pair(g: pd.DataFrame) -> pd.DataFrame:
        o = g.groupby(["doc_a", "doc_b"], as_index=False)["n"].sum()
        # mirror: containment is evaluated in BOTH directions
        m = o.rename(columns={"doc_a": "doc_b", "doc_b": "doc_a"})
        out = pd.concat([o, m[["doc_a", "doc_b", "n"]]], ignore_index=True)
        out["kind"] = 0
        return out.astype({"doc_a": "int64", "doc_b": "int64",
                           "n": "int64", "kind": "int64"})

    pair_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("n", pa.int64()), ("kind", pa.int64()),
    ])
    pairs = _sharded_groupby(parts, ["doc_a", "doc_b"], per_pair,
                             empty_schema=None)

    def attach_size(g: pd.DataFrame) -> pd.DataFrame:
        sz = g[g["kind"] == 1].set_index("doc_a")["n"]
        p = g[g["kind"] == 0]
        if not len(p):
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64"),
                "size_a": pd.Series([], dtype="int64"),
                "cont_pct": pd.Series([], dtype="int64"),
            })
        size_a = sz.reindex(p["doc_a"]).to_numpy(np.int64)
        ov = p["n"].to_numpy(np.int64)
        keep = 100 * ov >= CONT_MIN_PCT * size_a
        out = pd.DataFrame({
            "doc_a": p["doc_a"].to_numpy(np.int64)[keep],
            "doc_b": p["doc_b"].to_numpy(np.int64)[keep],
            "n_shared": ov[keep],
            "size_a": size_a[keep],
            "cont_pct": (100 * ov[keep]) // size_a[keep],
        })
        return out.astype({c: "int64" for c in out.columns})

    out_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("n_shared", pa.int64()), ("size_a", pa.int64()),
        ("cont_pct", pa.int64()),
    ])
    res = _sharded_groupby(pairs.union(sizes), ["doc_a"], attach_size,
                           empty_schema=out_schema).to_pandas()
    cols = ["doc_a", "doc_b", "n_shared", "size_a", "cont_pct"]
    if not len(res):
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return res.sort_values(["doc_a", "doc_b"]).reset_index(
        drop=True).astype({c: "int64" for c in cols})[cols]


def sql_containment_pairs() -> str:
    w = CONT_W
    return f"""
WITH aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {CONT_QUOTE_OFFSET},
           substring(text, 1, {CONT_QUOTE_CHARS})
    FROM documents WHERE doc_id % {CONT_QUOTE_EVERY} = 0
),
filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM aug
),
win AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, len(toks) - {w - 2}),
                                 j -> array_to_string(toks[j:j + {w - 1}], ' ')))
               AS sh
    FROM filt
    WHERE len(toks) >= {w}
),
sz AS (SELECT doc_id, count(*)::BIGINT AS size FROM win GROUP BY 1),
capped AS (
    SELECT doc_id, sh FROM (
        SELECT doc_id, sh,
               row_number() OVER (PARTITION BY sh ORDER BY doc_id) AS rk
        FROM win
    ) WHERE rk <= {CONT_FP_CAP}
),
ov AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
    FROM capped a JOIN capped b USING (sh)
    WHERE a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT ov.doc_a, ov.doc_b, ov.n_shared, sz.size AS size_a,
       ((100 * ov.n_shared) // sz.size)::BIGINT AS cont_pct
FROM ov JOIN sz ON sz.doc_id = ov.doc_a
WHERE 100 * ov.n_shared >= {CONT_MIN_PCT} * sz.size
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# content-defined chunking (FastCDC-family, token-level): boundaries
# where the token hash hits a mask, so an insertion only reshapes the
# chunks around the edit — the backup/dedup primitive fixed-size
# chunking lacks.  Per-doc chunk stats + corpus-wide duplicated-chunk
# counts (chunk identity = md5 of the space-joined token run, which
# DuckDB reproduces exactly).

CDC_D = 16  # boundary when md5_u64(term) % CDC_D == 0 (~16-token chunks)


def _md5_batch(texts: pa.Array | pa.ChunkedArray):
    """(hex digests as pa.StringArray, first-8-bytes-LE uint64) per
    string — the u64 word is DuckDB's md5_number_upper (see
    distinct._md5_u64)."""
    import hashlib

    from ..functions.tokenize import _string_buffers

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, offsets = _string_buffers(texts)
    mv = memoryview(data)
    hexes = []
    u64 = np.empty(len(texts), np.uint64)
    for i in range(len(texts)):
        d = hashlib.md5(mv[offsets[i]: offsets[i + 1]]).digest()
        hexes.append(d.hex())
        u64[i] = int.from_bytes(d[:8], "little")
    return pa.array(hexes, pa.utf8()), u64


def cdc_chunks_ds(source: str | rd.Dataset, *, augment: bool = True) -> pd.DataFrame:
    """Per doc: ``doc_id, n_tokens, n_chunks, max_chunk, dup_chunks``
    where chunks are content-defined token runs (boundary AFTER any
    token whose md5 word % ``CDC_D`` == 0) and ``dup_chunks`` counts
    this doc's distinct chunk strings that also occur in >= 1 OTHER doc.

    Shape: chunking is per-batch vectorized (dictionary-encode the
    tokens, md5 only the batch vocabulary, segmented cumsum for chunk
    ids, ListArray + binary_join for chunk strings — no per-token
    Python); ONE chunk-hash exchange marks cross-doc duplicates (md5
    hex is the group identity, the u64 word only routes shards); ONE
    doc-sharded join merges dup counts into the per-doc stats.  Uses
    the substring-dup clone augmentation so the synthetic corpus
    exercises the duplicate path."""
    from .dedup import _sharded_groupby

    docs = _docs(source)
    if augment:
        docs = docs.map_batches(_substr_augment, batch_format="pyarrow",
                                zero_copy_batch=True)

    def per_batch(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        n = len(toks)
        n_tokens = np.bincount(row_idx, minlength=nrows).astype(np.int64) \
            if n else np.zeros(nrows, np.int64)
        if n:
            enc = pc.dictionary_encode(toks)
            _hex, vocab_u64 = _md5_batch(enc.dictionary)
            tok_h = vocab_u64[enc.indices.to_numpy(zero_copy_only=False)]
            b = (tok_h % np.uint64(CDC_D) == 0).astype(np.int64)
            cum = np.cumsum(b)
            before = cum - b  # boundaries strictly before i (global)
            doc_start = np.searchsorted(row_idx, row_idx, "left")
            chunk_id = before - before[doc_start]
            # chunk starts: first token of doc, or token after a boundary
            is_start = np.empty(n, bool)
            is_start[0] = True
            is_start[1:] = (row_idx[1:] != row_idx[:-1]) | (b[:-1] == 1)
            starts = np.flatnonzero(is_start)
            offsets = np.empty(len(starts) + 1, np.int32)
            offsets[:-1] = starts
            offsets[-1] = n
            clen = np.diff(offsets).astype(np.int64)
            chunk_row = row_idx[starts]
            la = pa.ListArray.from_arrays(pa.array(offsets),
                                          toks.combine_chunks()
                                          if isinstance(toks, pa.ChunkedArray)
                                          else toks)
            cs = pc.binary_join(la, " ")
            chex, cu64 = _md5_batch(cs)
            n_chunks = np.bincount(chunk_row, minlength=nrows).astype(
                np.int64)
            max_chunk = np.zeros(nrows, np.int64)
            np.maximum.at(max_chunk, chunk_row, clen)
            # distinct (chunk hex, doc) pairs for the duplicate exchange
            pair = pa.table({
                "chex": chex,
                "doc": pa.array(doc_ids[chunk_row], pa.int64()),
                "ch": pa.array(cu64.view(np.int64), pa.int64()),
            }).group_by(["chex", "doc"]).aggregate([("ch", "min")])
            chunk_rows = pa.table({
                "doc_id": pair["doc"],
                "n_tokens": pa.nulls(pair.num_rows, pa.int64()).fill_null(0),
                "n_chunks": pa.nulls(pair.num_rows, pa.int64()).fill_null(0),
                "max_chunk": pa.nulls(pair.num_rows, pa.int64()).fill_null(0),
                "chex": pair["chex"],
                "ch": pair["ch_min"],
                "kind": pa.nulls(pair.num_rows, pa.int64()).fill_null(1),
            })
        else:
            n_chunks = np.zeros(nrows, np.int64)
            max_chunk = np.zeros(nrows, np.int64)
            chunk_rows = None
        stat_rows = pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_chunks": pa.array(n_chunks, pa.int64()),
            "max_chunk": pa.array(max_chunk, pa.int64()),
            "chex": pa.nulls(nrows, pa.utf8()).fill_null(""),
            "ch": pa.nulls(nrows, pa.int64()).fill_null(0),
            "kind": pa.nulls(nrows, pa.int64()).fill_null(0),
        })
        if chunk_rows is None:
            return stat_rows
        return pa.concat_tables([stat_rows, chunk_rows])

    rows = docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    stats = rows.filter(expr="kind == 0")
    chunks = rows.filter(expr="kind == 1")

    def per_hash(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["chex", "doc_id"])
        nd = g.groupby("chex")["doc_id"].transform("size")
        d = g[nd > 1]
        out = d.groupby("doc_id", as_index=False).size()
        out.columns = ["doc_id", "dup"]
        return out.astype({"doc_id": "int64", "dup": "int64"})

    dup = _sharded_groupby(chunks, ["ch"], per_hash, empty_schema=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["kind"] == 0]
        # a doc's duplicate chunks are spread over many hash shards:
        # SUM the per-shard partials before the per-doc lookup
        d = g[g["kind"] != 0].groupby("doc_id")["dup"].sum()
        out = pd.DataFrame({
            "doc_id": s["doc_id"].to_numpy(np.int64),
            "n_tokens": s["n_tokens"].to_numpy(np.int64),
            "n_chunks": s["n_chunks"].to_numpy(np.int64),
            "max_chunk": s["max_chunk"].to_numpy(np.int64),
            "dup_chunks": d.reindex(s["doc_id"]).fillna(0).to_numpy(
                np.int64),
        })
        return out.astype({c: "int64" for c in out.columns})

    def tag_stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
            "n_chunks": t["n_chunks"], "max_chunk": t["max_chunk"],
            "dup": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
            "kind": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
        })

    def tag_dup(t: pa.Table) -> pa.Table:
        z = pa.nulls(t.num_rows, pa.int64()).fill_null(0)
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": z, "n_chunks": z,
            "max_chunk": z, "dup": t["dup"],
            "kind": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
        })

    u = stats.map_batches(tag_stats, batch_format="pyarrow",
                          zero_copy_batch=True).union(
        dup.map_batches(tag_dup, batch_format="pyarrow",
                        zero_copy_batch=True))
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("n_chunks", pa.int64()), ("max_chunk", pa.int64()),
        ("dup_chunks", pa.int64()),
    ])
    res = _sharded_groupby(u, ["doc_id"], merge,
                           empty_schema=out_schema).to_pandas()
    cols = ["doc_id", "n_tokens", "n_chunks", "max_chunk", "dup_chunks"]
    if not len(res):
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return res.sort_values("doc_id").reset_index(drop=True).astype(
        {c: "int64" for c in cols})[cols]


def sql_cdc_chunks() -> str:
    return f"""
WITH aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {SUBSTR_CLONE_OFFSET}, text FROM documents
    WHERE doc_id % {SUBSTR_CLONE_EVERY} = 0
),
filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM aug
),
tok AS (
    SELECT doc_id, unnest(toks) AS term,
           unnest(range(1, len(toks) + 1)) AS pos
    FROM filt
),
b AS (
    SELECT doc_id, pos, term,
           (CASE WHEN md5_number_upper(term)::HUGEINT % {CDC_D} = 0
                 THEN 1 ELSE 0 END) AS bd
    FROM tok
),
c AS (
    SELECT doc_id, pos, term,
           coalesce(sum(bd) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS chunk_id
    FROM b
),
chunks AS (
    SELECT doc_id, chunk_id,
           array_to_string(list(term ORDER BY pos), ' ') AS cs,
           count(*)::BIGINT AS clen
    FROM c GROUP BY 1, 2
),
st AS (
    SELECT doc_id, count(*)::BIGINT AS n_chunks,
           max(clen)::BIGINT AS max_chunk
    FROM chunks GROUP BY 1
),
ntok AS (SELECT doc_id, count(*)::BIGINT AS n_tokens FROM tok GROUP BY 1),
ch AS (SELECT DISTINCT doc_id, md5(cs) AS h FROM chunks),
nd AS (SELECT h, count(*)::BIGINT AS ndocs FROM ch GROUP BY 1),
dup AS (
    SELECT ch.doc_id, count(*)::BIGINT AS dup_chunks
    FROM ch JOIN nd USING (h) WHERE nd.ndocs > 1 GROUP BY 1
)
SELECT a.doc_id,
       coalesce(ntok.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(st.n_chunks, 0)::BIGINT AS n_chunks,
       coalesce(st.max_chunk, 0)::BIGINT AS max_chunk,
       coalesce(dup.dup_chunks, 0)::BIGINT AS dup_chunks
FROM aug a
LEFT JOIN ntok ON a.doc_id = ntok.doc_id
LEFT JOIN st ON a.doc_id = st.doc_id
LEFT JOIN dup ON a.doc_id = dup.doc_id
"""


# ---------------------------------------------------------------------------
# BFS hop distances from the top-df term over the co-occurrence graph
# (single-source shortest paths, unweighted) — the traversal
# representative of the graph family (PageRank = spectral, triangles =
# local counting, HITS = bipartite, BFS = reachability).

BFS_TOP_VOCAB = PR_TOP_VOCAB


def term_bfs_df(
    source: str | rd.Dataset, *, top_vocab: int = BFS_TOP_VOCAB
) -> pd.DataFrame:
    """``term, deg, dist`` — unweighted hop distance from the top-df
    term (df desc, term asc) to every top-``top_vocab`` vocabulary term
    over the co-occurrence graph; ``dist = -1`` marks unreachable terms.

    Shape: the same two bounded passes as :func:`pagerank_terms` (df
    top-k + V x V boolean-matmul adjacency partials); the BFS itself is
    a <= V-round frontier sweep on the tiny driver-side matrix.  The
    SQL oracle runs a depth-capped recursive CTE and takes min(dist)
    per node."""
    docs = _docs(source)
    out_cols = ["term", "deg", "dist"]
    cand = top_vocab_df(docs, top_vocab)
    if not len(cand):
        return pd.DataFrame({
            "term": pd.Series([], dtype=object),
            "deg": pd.Series([], dtype="int64"),
            "dist": pd.Series([], dtype="int64"),
        })
    vocab_terms = cand["term"].tolist()
    adj = cooc_adjacency(docs, vocab_terms)
    nv = len(vocab_terms)
    deg = adj.sum(axis=1).astype(np.int64)
    dist = np.full(nv, -1, np.int64)
    dist[0] = 0  # source: vocabulary rank 1 (df desc, term asc)
    frontier = np.zeros(nv, bool)
    frontier[0] = True
    d = 0
    while frontier.any():
        d += 1
        nxt = (adj[frontier].any(axis=0)) & (dist < 0)
        dist[nxt] = d
        frontier = nxt
    return pd.DataFrame({
        "term": vocab_terms,
        "deg": deg,
        "dist": dist,
    }).astype({"deg": "int64", "dist": "int64"})[out_cols]


# ---------------------------------------------------------------------------
# Boilerplate line detection — the CCNet/RefinedWeb-style template
# filter: a LINE shared by >= 10% of a source's documents is navigation
# chrome / footer boilerplate, not content.  The synthetic corpus is
# single-line, so (pii_scan pattern) every 3rd doc deterministically
# gains a per-source footer line, replicated in the SQL oracle.

BOILER_EVERY = 3
BOILER_MAX_LINE = 64  # body lines are longer; candidates are bounded
BOILER_MIN_SHARE_PPM = 100_000  # >= 10% of the source's docs


def _boiler_augment(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    footer = pc.binary_join_element_wise(
        pa.array(["\nfooter "] * n, pa.string()),
        pc.cast(batch["source"], pa.string()),
        "",
    )
    empty = pa.array([""] * n, pa.string())
    text = pc.binary_join_element_wise(
        pc.cast(batch["text"], pa.string()),
        pc.if_else(pa.array(ids % BOILER_EVERY == 0), footer, empty),
        "",
    )
    return pa.table({"doc_id": batch["doc_id"], "text": text,
                     "source": batch["source"]})


def boilerplate_lines_df(
    source: str | rd.Dataset, *, augment: bool = True
) -> pd.DataFrame:
    """Rows ``(source, line, n_docs, share_ppm)`` for candidate lines
    (1..BOILER_MAX_LINE chars) present in >= 10% of a source's docs
    (per-doc distinct; floor-ppm threshold on both engines).

    Shape (100 TB): per-source doc counts are a streaming partial sum;
    candidate (line-hash)-sharded counting keeps every (source, line)
    group in ONE shard, and the share threshold is applied INSIDE the
    shard (the bounded source->doc-count map is captured by the shard
    fn), so only actual boilerplate survivors reach the driver."""
    import os

    from ..functions.hashing import term_hash
    from ..sources.util import read_parquet_sized
    from .dedup import _sharded_groupby

    if isinstance(source, rd.Dataset):
        ds = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        ds = read_parquet_sized(path, columns=["doc_id", "text", "source"])
    if augment:
        ds = ds.map_batches(_boiler_augment, batch_format="pyarrow",
                            zero_copy_batch=True)

    def src_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["source"]})
        g = t.group_by("source").aggregate([([], "count_all")])
        return pa.table({"source": g["source"],
                         "nd": pc.cast(g["count_all"], pa.int64())})

    sp = ds.map_batches(src_partial, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    if not len(sp):
        return pd.DataFrame(
            columns=["source", "line", "n_docs", "share_ppm"]
        ).astype({"n_docs": "int64", "share_ppm": "int64"})
    src_docs = sp.groupby("source")["nd"].sum().to_dict()

    def cand_lines(b: pa.Table) -> pa.Table:
        la = pc.split_pattern(pc.cast(b["text"], pa.string()), "\n")
        flat = pc.list_flatten(la)
        lens = pc.list_value_length(la).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(la), dtype=np.int64), lens)
        src = b["source"].to_numpy(zero_copy_only=False)[parent]
        ll = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = (ll >= 1) & (ll <= BOILER_MAX_LINE)
        lines = flat.to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"parent": parent[keep], "source": src[keep],
                           "line": lines}).drop_duplicates()
        kh = term_hash(
            pc.binary_slice(
                pc.cast(pa.array(df["line"].astype(str)), pa.binary()),
                0, 16,
            )
        ).view(np.int64)
        return pa.table(
            {"kh": pa.array(kh),
             "source": pa.array(df["source"].astype(str)),
             "line": pa.array(df["line"].astype(str))}
        )

    def shard_count(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(["source", "line"], as_index=False).size()
        cnt = cnt.rename(columns={"size": "n_docs"})
        nd = cnt["source"].map(src_docs).astype("int64")
        share = (cnt["n_docs"].astype(object) * 1_000_000 // nd.astype(
            object)).astype("int64")
        cnt["share_ppm"] = share
        out = cnt[cnt["share_ppm"] >= BOILER_MIN_SHARE_PPM]
        return out.astype({"n_docs": "int64", "share_ppm": "int64"})

    parts = _sharded_groupby(
        ds.map_batches(cand_lines, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["kh"], shard_count,
        empty_schema=pa.schema(
            [("source", pa.utf8()), ("line", pa.utf8()),
             ("n_docs", pa.int64()), ("share_ppm", pa.int64())]
        ),
    ).to_pandas()
    out = parts.sort_values(["source", "line"]).reset_index(drop=True)
    return out[["source", "line", "n_docs", "share_ppm"]].astype(
        {"n_docs": "int64", "share_ppm": "int64"})


SQL_BOILERPLATE = f"""
WITH aug AS (
    SELECT doc_id, source,
           CASE WHEN doc_id % {BOILER_EVERY} = 0
                THEN text || chr(10) || 'footer ' || source
                ELSE text END AS text
    FROM documents
),
dp AS (SELECT source, count(*)::BIGINT AS nd FROM aug GROUP BY 1),
l1 AS (
    SELECT DISTINCT doc_id, source, line FROM (
        SELECT doc_id, source,
               unnest(string_split(text, chr(10))) AS line
        FROM aug
    )
),
cand AS (
    SELECT source, line FROM l1
    WHERE length(line) BETWEEN 1 AND {BOILER_MAX_LINE}
),
cnt AS (
    SELECT source, line, count(*)::BIGINT AS n_docs
    FROM cand GROUP BY 1, 2
)
SELECT c.source, c.line, c.n_docs,
       (c.n_docs * 1000000 // d.nd)::BIGINT AS share_ppm
FROM cnt c JOIN dp d USING (source)
WHERE c.n_docs * 1000000 // d.nd >= {BOILER_MIN_SHARE_PPM}
ORDER BY c.source, c.line
"""


# ---------------------------------------------------------------------------
# Greedy vocabulary set cover over sources — the data-selection shape
# ("which K sources cover the most distinct vocabulary?", the classic
# submodular-maximization greedy with its 1-1/e guarantee).  The scale
# trick: the greedy never needs per-term data, only the count of terms
# per SOURCE-BITMASK (<= 2^n_sources rows) — one term-sharded bit_or
# exchange, then exact driver arithmetic the SQL replicates with K
# chained argmax CTEs.

SETCOVER_ROUNDS = 4
SETCOVER_MAX_SOURCES = 32  # bitmask must fit int64 (and the SQL unrolls)


def source_set_cover_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Rows ``(round, source, gain, covered)``: the SETCOVER_ROUNDS
    greedy picks (gain = newly covered distinct terms, covered =
    running total), ties to source asc."""
    import os

    from ..functions.hashing import term_hash
    from ..sources.util import read_parquet_sized
    from .dedup import _sharded_groupby

    if isinstance(source, rd.Dataset):
        ds = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source) else source
        )
        ds = read_parquet_sized(path, columns=["doc_id", "text", "source"])

    def src_partial(b: pa.Table) -> pa.Table:
        return pa.table({"source": pc.unique(b["source"])})

    srcs = sorted(
        ds.map_batches(src_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .to_pandas()["source"].unique().tolist()
    )
    if len(srcs) > SETCOVER_MAX_SOURCES:
        raise ValueError(
            f"source_set_cover: {len(srcs)} sources exceeds the bitmask "
            f"bound {SETCOVER_MAX_SOURCES}"
        )
    sid = {s: i for i, s in enumerate(srcs)}

    def term_src(b: pa.Table) -> pa.Table:
        toks, _td, row_idx, h1, _h2 = _batch_tokens(b)
        if not len(toks):
            return pa.table(
                {"kh": pa.array([], pa.int64()),
                 "term": pa.array([], pa.utf8()),
                 "bit": pa.array([], pa.int64())}
            )
        src = b["source"].to_numpy(zero_copy_only=False)[row_idx]
        bits = np.array([1 << sid[s] for s in src], np.int64)
        df = pd.DataFrame(
            {"kh": h1.view(np.int64),
             "term": toks.to_numpy(zero_copy_only=False),
             "bit": bits}
        ).drop_duplicates()
        return pa.table(
            {"kh": pa.array(df["kh"].to_numpy(np.int64)),
             "term": pa.array(df["term"].astype(str)),
             "bit": pa.array(df["bit"].to_numpy(np.int64))}
        )

    def shard_masks(g: pd.DataFrame) -> pd.DataFrame:
        masks = g.groupby("term")["bit"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy(np.int64)))
        )
        out = masks.reset_index(name="mask").groupby(
            "mask", as_index=False).size()
        return out.rename(columns={"size": "n"}).astype(
            {"mask": "int64", "n": "int64"})

    parts = _sharded_groupby(
        ds.map_batches(term_src, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["kh"], shard_masks,
        empty_schema=pa.schema([("mask", pa.int64()), ("n", pa.int64())]),
    ).to_pandas()
    cols = ["round", "source", "gain", "covered"]
    if not srcs:
        return pd.DataFrame(columns=cols).astype(
            {"round": "int64", "gain": "int64", "covered": "int64"})
    if len(parts):
        mc = parts.groupby("mask", as_index=False)["n"].sum()
        masks = mc["mask"].to_numpy(np.int64)
        ns = mc["n"].to_numpy(np.int64)
    else:
        # token-less corpus: the greedy still picks (gain-0) sources,
        # matching the SQL's LEFT JOIN semantics
        masks, ns = np.empty(0, np.int64), np.empty(0, np.int64)
    selected, sel_mask, covered, rows = set(), 0, 0, []
    for rnd in range(1, SETCOVER_ROUNDS + 1):
        best = None
        for s in range(len(srcs)):
            if s in selected:
                continue
            gain = int(ns[((masks >> s) & 1 == 1)
                          & (masks & sel_mask == 0)].sum())
            if best is None or gain > best[1]:
                best = (s, gain)
        if best is None:
            break
        s, gain = best
        selected.add(s)
        sel_mask |= 1 << s
        covered += gain
        rows.append((rnd, srcs[s], gain, covered))
    return pd.DataFrame(rows, columns=cols).astype(
        {"round": "int64", "gain": "int64", "covered": "int64"})


def sql_source_set_cover() -> str:
    toks = ("list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),"
            " x -> len(x) <= 15)")
    head = f"""
WITH sids AS (
    SELECT source, (dense_rank() OVER (ORDER BY source) - 1)::BIGINT
               AS sid
    FROM (SELECT DISTINCT source FROM documents)
),
ts AS (
    SELECT DISTINCT t.term, s.sid
    FROM (SELECT source, unnest({toks}) AS term FROM documents) t
    JOIN sids s USING (source)
),
mc AS (
    SELECT mask, count(*)::BIGINT AS n FROM (
        SELECT term, sum(DISTINCT 1 << sid)::BIGINT AS mask
        FROM ts GROUP BY term
    ) GROUP BY mask
)"""
    parts = [head]
    prev_excl = ""
    sel_expr = "0"
    for k in range(1, SETCOVER_ROUNDS + 1):
        parts.append(f""",
r{k} AS (
    SELECT s.sid, s.source,
           coalesce(sum(CASE WHEN ((m.mask >> s.sid) & 1) = 1
                              AND (m.mask & ({sel_expr})) = 0
                         THEN m.n ELSE 0 END), 0)::BIGINT AS gain
    FROM sids s LEFT JOIN mc m ON TRUE
    WHERE TRUE{prev_excl}
    GROUP BY s.sid, s.source
),
p{k} AS (SELECT * FROM r{k} ORDER BY gain DESC, source ASC LIMIT 1)""")
        prev_excl += f" AND s.sid != (SELECT sid FROM p{k})"
        sel_expr += f" | (1 << (SELECT sid FROM p{k}))"
    sels = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, source, gain FROM p{k}"
        for k in range(1, SETCOVER_ROUNDS + 1)
    )
    return "".join(parts) + f""",
picks AS ({sels})
SELECT round::BIGINT AS round, source, gain,
       sum(gain) OVER (ORDER BY round)::BIGINT AS covered
FROM picks
WHERE round <= (SELECT count(*) FROM sids)
ORDER BY round
"""


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020, public rules): keep a
# line iff it ends in terminal punctuation, has >= C4_MIN_WORDS words and
# does not mention "javascript"; keep the page iff it has >=
# C4_MIN_KEPT_LINES kept lines and contains neither a curly brace nor the
# phrase "lorem ipsum".  The synthetic corpus is single-line with no
# punctuation, so (pii_scan pattern) every doc deterministically gains
# structured extra lines — (doc_id % 4) complete sentences plus rule-
# triggering lines on the 3/5/7/11 residues — replicated in the SQL
# oracle so every rule actually fires at sf scale.

C4_MIN_WORDS = 5
C4_MIN_KEPT_LINES = 3


def _c4_augment(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    id_str = pc.cast(batch["doc_id"], pa.string())
    empty = pa.array([""] * n, pa.string())

    def sentence(word: str) -> pa.Array:
        return pc.binary_join_element_wise(
            pa.array([f"\ncomplete sentence number {word} for document "] * n,
                     pa.string()),
            id_str,
            pa.array([" stands here."] * n, pa.string()),
            "",
        )

    pieces = [pc.cast(batch["text"], pa.string())]
    for j, word in enumerate(["one", "two", "three"], start=1):
        pieces.append(
            pc.if_else(pa.array(ids % 4 >= j), sentence(word), empty))
    fixed = [
        (3, "\nshort line"),
        (5, "\nplease enable javascript to view this page."),
        (7, "\nfunction() { return 0; }"),
        (11, "\nlorem ipsum dolor sit amet."),
    ]
    for mod, line in fixed:
        pieces.append(
            pc.if_else(pa.array(ids % mod == 0),
                       pa.array([line] * n, pa.string()), empty))
    text = pc.binary_join_element_wise(*pieces, "")
    return pa.table({"doc_id": batch["doc_id"], "text": text})


def c4_line_filter_ds(source: str | rd.Dataset, *, augment: bool = True) -> rd.Dataset:
    """Per-doc C4 cleaning signals.

    Columns: ``doc_id, n_lines, kept_lines, kept_chars, has_brace,
    has_lorem, passes`` (all int64 — trivially hash-exact).  RE2 on both
    sides: Arrow ``match_substring_regex`` / ``count_substring_regex``
    vs DuckDB ``regexp_matches`` / ``regexp_extract_all``.

    Shape (100 TB): pure per-batch streaming map (documents never span
    batches); line explode + per-line regex are vectorized Arrow; the
    per-doc reduce is a numpy segment sum over the list offsets.  Zero
    exchange, zero driver state.
    """
    import os

    from ..sources.util import read_parquet_sized

    if isinstance(source, rd.Dataset):
        ds = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        ds = read_parquet_sized(path, columns=["doc_id", "text"])
    if augment:
        ds = ds.map_batches(_c4_augment, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_batch(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        la = pc.split_pattern(text, "\n")
        flat = pc.list_flatten(la)
        nlines = pc.list_value_length(la).to_numpy(zero_copy_only=False)
        nlines = nlines.astype(np.int64)
        parent = np.repeat(np.arange(len(nlines), dtype=np.int64), nlines)

        terminal = pc.match_substring_regex(flat, r"[.!?]$")
        words = pc.count_substring_regex(flat, r"[a-z0-9]+")
        js = pc.match_substring(flat, "javascript")
        kept = (
            terminal.to_numpy(zero_copy_only=False)
            & (words.to_numpy(zero_copy_only=False) >= C4_MIN_WORDS)
            & ~js.to_numpy(zero_copy_only=False)
        )
        ll = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)

        n = len(nlines)
        kept_lines = np.bincount(parent[kept], minlength=n).astype(np.int64)
        kept_chars = np.bincount(
            parent[kept], weights=ll[kept].astype(np.float64), minlength=n
        ).astype(np.int64)
        has_brace = pc.match_substring(text, "{").to_numpy(
            zero_copy_only=False).astype(np.int64)
        has_lorem = pc.match_substring(text, "lorem ipsum").to_numpy(
            zero_copy_only=False).astype(np.int64)
        passes = (
            (kept_lines >= C4_MIN_KEPT_LINES) & (has_brace == 0)
            & (has_lorem == 0)
        ).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(nlines),
            "kept_lines": pa.array(kept_lines),
            "kept_chars": pa.array(kept_chars),
            "has_brace": pa.array(has_brace),
            "has_lorem": pa.array(has_lorem),
            "passes": pa.array(passes),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_C4_AUGMENT = """
c4aug AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 4 >= 1 THEN chr(10) ||
                'complete sentence number one for document ' || doc_id ||
                ' stands here.' ELSE '' END
           || CASE WHEN doc_id % 4 >= 2 THEN chr(10) ||
                'complete sentence number two for document ' || doc_id ||
                ' stands here.' ELSE '' END
           || CASE WHEN doc_id % 4 >= 3 THEN chr(10) ||
                'complete sentence number three for document ' || doc_id ||
                ' stands here.' ELSE '' END
           || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'short line'
              ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
                'please enable javascript to view this page.' ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
                'function() { return 0; }' ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
                'lorem ipsum dolor sit amet.' ELSE '' END
           AS text
    FROM documents
)
"""


def sql_c4_line_filter() -> str:
    return f"""
WITH {SQL_C4_AUGMENT.strip()},
lines AS (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM c4aug
),
sig AS (
    SELECT doc_id,
           (regexp_matches(line, '[.!?]$')
            AND len(regexp_extract_all(line, '[a-z0-9]+')) >= {C4_MIN_WORDS}
            AND NOT contains(line, 'javascript'))::INT AS kept,
           length(line) AS ll
    FROM lines
),
pd AS (
    SELECT doc_id, count(*)::BIGINT AS n_lines,
           sum(kept)::BIGINT AS kept_lines,
           coalesce(sum(CASE WHEN kept = 1 THEN ll END), 0)::BIGINT
               AS kept_chars
    FROM sig GROUP BY 1
),
pg AS (
    SELECT doc_id, contains(text, '{{')::BIGINT AS has_brace,
           contains(text, 'lorem ipsum')::BIGINT AS has_lorem
    FROM c4aug
)
SELECT pd.doc_id, n_lines, kept_lines, kept_chars, has_brace, has_lorem,
       (kept_lines >= {C4_MIN_KEPT_LINES} AND has_brace = 0
        AND has_lorem = 0)::BIGINT AS passes
FROM pd JOIN pg ON pd.doc_id = pg.doc_id
"""


# ---------------------------------------------------------------------------
# Empirical-Bayes shrunk per-source quality: a source with 3 documents
# should not outrank one with 30k on raw mean length.  Hierarchical
# pooling: shrunk = (s + M * global_mean) / (n + M) with prior weight
# M = EB_PRIOR_WEIGHT — kept EXACT as the rational
# (s*N_tot + M*S_tot) / ((n+M)*N_tot) and emitted as a floored milli
# fixed point (all terms non-negative, so DuckDB truncating `//` and
# Python floor agree).

EB_PRIOR_WEIGHT = 20


def source_quality_eb_df(source: str | rd.Dataset) -> "pd.DataFrame":
    """Rows ``(source, n_docs, sum_chars, raw_milli, shrunk_milli)``.

    raw_milli    = s*1000 // n              (per-source mean n_chars)
    shrunk_milli = (s*N_tot + M*S_tot)*1000 // ((n+M)*N_tot)

    Shape (100 TB): per-batch Arrow group_by partials (source, n, s);
    the driver combine is bounded by the number of SOURCES, not rows.
    Exact Python-int arithmetic (HUGEINT in the oracle) — no floats.
    """
    import os

    from ..sources.util import read_parquet_sized

    if isinstance(source, rd.Dataset):
        ds = source
    else:
        path = (
            os.path.join(source, "documents.parquet")
            if os.path.isdir(source)
            else source
        )
        ds = read_parquet_sized(path, columns=["source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({"source": b["source"], "c": b["n_chars"]}).group_by(
            "source").aggregate([("c", "sum"), ([], "count_all")])
        return pa.table({
            "source": g["source"],
            "s": pc.cast(g["c_sum"], pa.int64()),
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    cols = ["source", "n_docs", "sum_chars", "raw_milli", "shrunk_milli"]
    if not len(parts):
        return pd.DataFrame(columns=cols).astype(
            {c: "int64" for c in cols[1:]})
    agg = parts.groupby("source", as_index=False).agg(
        n_docs=("n", "sum"), sum_chars=("s", "sum"))
    n_tot = int(agg["n_docs"].sum())
    s_tot = int(agg["sum_chars"].sum())
    m = EB_PRIOR_WEIGHT
    raw = [int(s) * 1000 // int(n)
           for s, n in zip(agg["sum_chars"], agg["n_docs"])]
    shr = [(int(s) * n_tot + m * s_tot) * 1000 // ((int(n) + m) * n_tot)
           for s, n in zip(agg["sum_chars"], agg["n_docs"])]
    out = agg.assign(raw_milli=raw, shrunk_milli=shr).sort_values(
        "source").reset_index(drop=True)
    return out[cols].astype({c: "int64" for c in cols[1:]})


def sql_source_quality_eb() -> str:
    m = EB_PRIOR_WEIGHT
    return f"""
WITH per AS (
    SELECT source, count(*)::HUGEINT AS n, sum(n_chars)::HUGEINT AS s
    FROM documents GROUP BY 1
),
tot AS (SELECT sum(n)::HUGEINT AS n_tot, sum(s)::HUGEINT AS s_tot FROM per)
SELECT source, n::BIGINT AS n_docs, s::BIGINT AS sum_chars,
       (s * 1000 // n)::BIGINT AS raw_milli,
       ((s * n_tot + {m} * s_tot) * 1000
        // ((n + {m}) * n_tot))::BIGINT AS shrunk_milli
FROM per, tot
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Trigram LM scoring with stupid backoff (Brants et al. 2007 — THE
# web-scale LM trick: no discounting state, just a fixed backoff
# penalty), completing the unigram -> bigram -> trigram family.
# alpha = 1/4 so the penalty -log2(alpha) = 2 bits is an EXACT integer
# in the fixed point; every other term rides the same verified log
# table as bigram_logprob.

TRIGRAM_VOCAB = 4096
BACKOFF_PENALTY_FP = 2 * ENTROPY_LOG_SCALE  # -log2(1/4) bits, exact


def _batch_trigrams(batch: pa.Table):
    """Adjacent kept-token triples within each doc: ``(a, b, c, doc)``."""
    toks, token_doc, _r, _h1, _h2 = _batch_tokens(batch)
    if len(toks) < 3:
        e = pa.array([], pa.utf8())
        return e, e, e, np.zeros(0, np.int64)
    same = (token_doc[:-2] == token_doc[1:-1]) & (
        token_doc[1:-1] == token_doc[2:])
    idx = np.nonzero(same)[0]
    return (
        toks.take(pa.array(idx, pa.int64())),
        toks.take(pa.array(idx + 1, pa.int64())),
        toks.take(pa.array(idx + 2, pa.int64())),
        token_doc[idx],
    )


def trigram_backoff_ds(source: str | rd.Dataset) -> rd.Dataset:
    """Per-doc trigram stupid-backoff score.

    Per trigram (a, b, c): the top-``TRIGRAM_VOCAB`` trigram model
    (r3 = max(1, c(abc)*65535 // t(ab)), t(ab) = trigram-context total)
    if present; else the bigram model (the bigram_logprob construction)
    on (b, c) plus a 2-bit penalty; else the unigram model on c plus a
    4-bit penalty (OOV unigram r = 1).  Columns: ``doc_id, n_trigrams,
    n_hit3, n_hit2, nll_bits`` (nll NULL for docs with < 3 tokens).

    Shape (100 TB): three bounded model passes (context-sharded
    exchanges — a context's trigrams/bigrams live in ONE shard, so
    per-shard ctx totals and top-k candidates are exact; fixed-size
    rows to the driver), then one streaming scoring pass with the three
    <=4096-entry models in the closure.  No unbounded state anywhere.
    """
    from .dedup import _sharded_groupby

    docs = _docs(source)
    l16 = np.int64(16 * ENTROPY_LOG_SCALE)
    pen = np.int64(BACKOFF_PENALTY_FP)

    # -- trigram model (context = (a, b)) --
    def cnt3(batch: pa.Table) -> pa.Table:
        a, b, c3, _td = _batch_trigrams(batch)
        if not len(a):
            return pa.table({
                "a": pa.array([], pa.utf8()), "b": pa.array([], pa.utf8()),
                "c3": pa.array([], pa.utf8()),
                "ctxh": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            })
        g = pa.table({"a": a, "b": b, "c3": c3}).group_by(
            ["a", "b", "c3"]).aggregate([([], "count_all")])
        # hash the context PER COLUMN and mix: pandas' categorize-path
        # string hashing truncates at embedded NUL bytes (a "a\x00b"
        # joined key hashes as just "a", array-dependently!), so a
        # NUL-joined composite key must never reach pd.util.hash_array
        ha = pd.util.hash_array(np.asarray(g["a"].to_pylist(), dtype=object))
        hb = pd.util.hash_array(np.asarray(g["b"].to_pylist(), dtype=object))
        with np.errstate(over="ignore"):
            ch = (ha ^ (hb * np.uint64(0x9E3779B97F4A7C15))).view(np.int64)
        return pa.table({
            "a": g["a"], "b": g["b"], "c3": g["c3"],
            "ctxh": pa.array(ch, pa.int64()),
            "c": g["count_all"].cast(pa.int64()),
        })

    def shard_top3(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b", "c3"], as_index=False)["c"].sum()
        t = s.groupby(["a", "b"], as_index=False)["c"].sum().rename(
            columns={"c": "t"})
        s = s.merge(t, on=["a", "b"])
        s = s.sort_values(
            ["c", "a", "b", "c3"], ascending=[False, True, True, True],
            kind="mergesort",
        ).head(TRIGRAM_VOCAB)
        for col in ("c", "t"):
            s[col] = s[col].astype("int64")
        return s[["a", "b", "c3", "c", "t"]]

    s3 = pa.schema([("a", pa.utf8()), ("b", pa.utf8()), ("c3", pa.utf8()),
                    ("c", pa.int64()), ("t", pa.int64())])
    cand3 = _sharded_groupby(
        docs.map_batches(cnt3, batch_format="pyarrow", zero_copy_batch=True),
        ["ctxh"], shard_top3, empty_schema=s3,
    ).to_pandas()
    if len(cand3):
        top3 = cand3.sort_values(
            ["c", "a", "b", "c3"], ascending=[False, True, True, True],
            kind="mergesort",
        ).head(TRIGRAM_VOCAB)
        r3 = np.maximum(
            1,
            (top3["c"].to_numpy().astype(object) * UNIGRAM_RGRID)
            // top3["t"].to_numpy().astype(object),
        ).astype(np.int64)
        key3 = pa.array(
            [f"{a}\x00{b}\x00{c}" for a, b, c in
             zip(top3["a"], top3["b"], top3["c3"])], pa.utf8())
        contrib3 = l16 - _log2_fp(r3)
    else:
        key3 = pa.array([], pa.utf8())
        contrib3 = np.zeros(0, np.int64)

    # -- bigram model (bigram_logprob construction, +2-bit penalty) --
    def cnt2(batch: pa.Table) -> pa.Table:
        a, b, _pd = _batch_bigrams(batch)
        if not len(a):
            return pa.table({
                "a": pa.array([], pa.utf8()), "b": pa.array([], pa.utf8()),
                "ah": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            })
        g = pa.table({"a": a, "b": b}).group_by(["a", "b"]).aggregate(
            [([], "count_all")])
        ah = pd.util.hash_array(
            np.asarray(g["a"].to_pylist(), dtype=object)).view(np.int64)
        return pa.table({
            "a": g["a"], "b": g["b"], "ah": pa.array(ah, pa.int64()),
            "c": g["count_all"].cast(pa.int64()),
        })

    def shard_top2(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b"], as_index=False)["c"].sum()
        ctx = s.groupby("a")["c"].sum()
        s["ctx"] = s["a"].map(ctx)
        s = s.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="mergesort"
        ).head(BIGRAM_VOCAB)
        for col in ("c", "ctx"):
            s[col] = s[col].astype("int64")
        return s[["a", "b", "c", "ctx"]]

    s2 = pa.schema([("a", pa.utf8()), ("b", pa.utf8()), ("c", pa.int64()),
                    ("ctx", pa.int64())])
    cand2 = _sharded_groupby(
        docs.map_batches(cnt2, batch_format="pyarrow", zero_copy_batch=True),
        ["ah"], shard_top2, empty_schema=s2,
    ).to_pandas()
    if len(cand2):
        top2 = cand2.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="mergesort"
        ).head(BIGRAM_VOCAB)
        r2 = np.maximum(
            1,
            (top2["c"].to_numpy().astype(object) * UNIGRAM_RGRID)
            // top2["ctx"].to_numpy().astype(object),
        ).astype(np.int64)
        key2 = pa.array(
            [f"{a}\x00{b}" for a, b in zip(top2["a"], top2["b"])], pa.utf8())
        contrib2 = l16 - _log2_fp(r2) + pen
    else:
        key2 = pa.array([], pa.utf8())
        contrib2 = np.zeros(0, np.int64)

    # -- unigram model (+4-bit penalty) --
    vocab, total = _count_vocab(docs, UNIGRAM_VOCAB)
    if total > 0 and len(vocab):
        r1 = np.maximum(
            1,
            (vocab["c"].to_numpy().astype(object) * UNIGRAM_RGRID) // total,
        ).astype(np.int64)
        contrib1 = l16 - _log2_fp(r1) + 2 * pen
    else:
        contrib1 = np.zeros(0, np.int64)
    key1 = pa.array(vocab["term"].tolist(), pa.utf8())
    oov = np.int64(l16 + 2 * pen)

    def per_batch(batch: pa.Table) -> pa.Table:
        a, b, c3, tridoc = _batch_trigrams(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = np.zeros(len(doc_ids), np.int64)
        s = np.zeros(len(doc_ids), np.int64)
        h3 = np.zeros(len(doc_ids), np.int64)
        h2 = np.zeros(len(doc_ids), np.int64)
        if len(a):
            k3 = pc.binary_join_element_wise(a, b, c3, "\x00")
            i3 = pc.index_in(k3, value_set=key3).fill_null(-1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            k2 = pc.binary_join_element_wise(b, c3, "\x00")
            i2 = pc.index_in(k2, value_set=key2).fill_null(-1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            i1 = pc.index_in(c3, value_set=key1).fill_null(-1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            uni = np.where(i1 >= 0,
                           contrib1[np.maximum(i1, 0)] if len(contrib1)
                           else oov, oov)
            contrib = np.where(
                i3 >= 0, contrib3[np.maximum(i3, 0)] if len(contrib3) else 0,
                np.where(i2 >= 0,
                         contrib2[np.maximum(i2, 0)] if len(contrib2) else 0,
                         uni),
            )
            hit3 = (i3 >= 0).astype(np.int64)
            hit2 = ((i3 < 0) & (i2 >= 0)).astype(np.int64)
            per_doc = pa.table({
                "doc_id": pa.array(tridoc, pa.int64()),
                "c": pa.array(contrib, pa.int64()),
                "h3": pa.array(hit3, pa.int64()),
                "h2": pa.array(hit2, pa.int64()),
            }).group_by("doc_id").aggregate(
                [("c", "sum"), ("h3", "sum"), ("h2", "sum"),
                 ([], "count_all")])
            ud = per_doc["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            at = _align_to_rows(doc_ids, ud)
            n[at] = per_doc["count_all"].to_numpy(zero_copy_only=False)
            s[at] = per_doc["c_sum"].to_numpy(zero_copy_only=False)
            h3[at] = per_doc["h3_sum"].to_numpy(zero_copy_only=False)
            h2[at] = per_doc["h2_sum"].to_numpy(zero_copy_only=False)
        pos = n > 0
        nll = np.zeros(len(doc_ids), np.float64)
        if pos.any():
            nll[pos] = round_half_away(
                s[pos].astype(np.float64)
                / (n[pos] * ENTROPY_LOG_SCALE).astype(np.float64), 6)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_trigrams": pa.array(n, pa.int64()),
            "n_hit3": pa.array(h3, pa.int64()),
            "n_hit2": pa.array(h2, pa.int64()),
            "nll_bits": pc.if_else(
                pa.array(pos), pa.array(nll, pa.float64()),
                pa.scalar(None, pa.float64())),
        })

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_trigram_backoff() -> str:
    s = ENTROPY_LOG_SCALE
    l16 = 16 * s
    pen = BACKOFF_PENALTY_FP
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tri AS (
    SELECT doc_id,
           unnest(toks[1:len(toks)-2]) AS a,
           unnest(toks[2:len(toks)-1]) AS b,
           unnest(toks[3:len(toks)]) AS c3
    FROM filt WHERE len(toks) >= 3
),
cab3 AS (SELECT a, b, c3, count(*)::BIGINT AS c FROM tri GROUP BY 1, 2, 3),
t3 AS (SELECT a, b, sum(c)::BIGINT AS t FROM cab3 GROUP BY 1, 2),
top3 AS (
    SELECT cab3.a, cab3.b, cab3.c3, cab3.c, t3.t
    FROM cab3 JOIN t3 USING (a, b)
    ORDER BY cab3.c DESC, cab3.a, cab3.b, cab3.c3 LIMIT {TRIGRAM_VOCAB}
),
model3 AS (
    SELECT a, b, c3,
           {l16} - CAST(round(log2(
               greatest(1, (c::HUGEINT * {UNIGRAM_RGRID}) // t)::DOUBLE
           ) * {s}) AS BIGINT) AS contrib
    FROM top3
),
big AS (
    SELECT doc_id,
           unnest(toks[1:len(toks)-1]) AS a,
           unnest(toks[2:len(toks)]) AS b
    FROM filt WHERE len(toks) >= 2
),
cab AS (SELECT a, b, count(*)::BIGINT AS c FROM big GROUP BY 1, 2),
ctx AS (SELECT a, sum(c)::BIGINT AS t FROM cab GROUP BY 1),
topb AS (
    SELECT cab.a, cab.b, cab.c, ctx.t
    FROM cab JOIN ctx USING (a)
    ORDER BY cab.c DESC, cab.a, cab.b LIMIT {BIGRAM_VOCAB}
),
model2 AS (
    SELECT a, b,
           {l16 + pen} - CAST(round(log2(
               greatest(1, (c::HUGEINT * {UNIGRAM_RGRID}) // t)::DOUBLE
           ) * {s}) AS BIGINT) AS contrib
    FROM topb
),
tok AS (SELECT unnest(toks) AS term FROM filt),
uc AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS t FROM uc),
topu AS (
    SELECT term, c FROM uc ORDER BY c DESC, term LIMIT {UNIGRAM_VOCAB}
),
model1 AS (
    SELECT term,
           {l16 + 2 * pen} - CAST(round(log2(
               greatest(1, (c::HUGEINT * {UNIGRAM_RGRID}) // tot.t)::DOUBLE
           ) * {s}) AS BIGINT) AS contrib
    FROM topu, tot
),
scored AS (
    SELECT tri.doc_id,
           CASE WHEN m3.contrib IS NOT NULL THEN m3.contrib
                WHEN m2.contrib IS NOT NULL THEN m2.contrib
                ELSE coalesce(m1.contrib, {l16 + 2 * pen}) END AS contrib,
           (m3.contrib IS NOT NULL)::BIGINT AS hit3,
           (m3.contrib IS NULL AND m2.contrib IS NOT NULL)::BIGINT AS hit2
    FROM tri
    LEFT JOIN model3 m3
           ON m3.a = tri.a AND m3.b = tri.b AND m3.c3 = tri.c3
    LEFT JOIN model2 m2 ON m2.a = tri.b AND m2.b = tri.c3
    LEFT JOIN model1 m1 ON m1.term = tri.c3
),
per AS (
    SELECT doc_id, count(*)::BIGINT AS n, sum(contrib)::BIGINT AS sc,
           sum(hit3)::BIGINT AS h3, sum(hit2)::BIGINT AS h2
    FROM scored GROUP BY 1
)
SELECT d.doc_id,
       coalesce(per.n, 0)::BIGINT AS n_trigrams,
       coalesce(per.h3, 0)::BIGINT AS n_hit3,
       coalesce(per.h2, 0)::BIGINT AS n_hit2,
       CASE WHEN per.n > 0
            THEN round(per.sc::DOUBLE / (per.n * {s})::DOUBLE, 6)
       END AS nll_bits
FROM documents d LEFT JOIN per USING (doc_id)
"""
