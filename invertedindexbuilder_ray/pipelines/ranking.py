"""Reverse search (percolation) and ranking-quality evaluation.

Two capability classes the catalog lacked:

- ``percolate_df`` — stored-query matching against the document stream
  (the Elasticsearch-percolator / alerting primitive; conceptually the
  reference's query loop turned inside out, cf. /root/reference/src/query.c).
  Stored queries are derived deterministically from the corpus (all pairs
  of the top-``PERC_TOP_TERMS`` document-frequency terms) so the DuckDB
  oracle can re-derive them.
- ``ndcg_eval_df`` — NDCG@``NDCG_K`` of an integer length-normalized
  ranking against a graded tf relevance proxy, per query term.  The
  log2 position discount enters as a PRECOMPUTED INTEGER WEIGHT TABLE
  (``_NDCG_W``) inlined literally into the SQL, so both engines share
  the exact same integers and the result is hash-exact.

Shared shape: one term-sharded exchange derives the top-df query terms
(a term lives in exactly one shard, so per-shard top-k -> driver top-k
is exact); the match/candidate pass is per-batch vectorized numpy over
the clean token stream with tiny bounded partials (<= pairs-or-k rows
per batch) reaching the driver.  Documents never span batches, so
per-doc tf / dl partials are exact per batch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .curation import _batch_tokens
from .textpipe import _docs

PERC_TOP_TERMS = 8
NDCG_K = 10
NDCG_QUERIES = 3

# integer DCG position weights: round(1e9 / log2(pos+1)), pos 1-based.
# Computed once HERE and inlined as literals into the SQL oracle — the
# two engines can never disagree on the discount.
_NDCG_W = [round(1_000_000_000 / math.log2(p + 1)) for p in range(1, NDCG_K + 1)]


def _top_df_terms(docs: rd.Dataset, k: int) -> list[tuple[str, int]]:
    """Top-``k`` terms by (document frequency desc, term asc).

    Per-batch exact (term, doc) dedup -> per-term df partials (exact:
    docs never span batches), ONE term-sharded exchange summing df with
    per-shard top-k candidates, bounded driver merge."""
    from .dedup import _sharded_groupby

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "df": pa.array([], pa.int64()),
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
        d = t.group_by(["term", "doc"]).aggregate([("th", "min")])
        g = d.group_by("term").aggregate([("doc", "count"), ("th_min", "min")])
        return pa.table(
            {"term": g["term"],
             "df": g["doc_count"].cast(pa.int64()),
             "th": g["th_min_min"]}
        )

    pr = docs.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", as_index=False)["df"].sum()
        s = s.sort_values(["df", "term"], ascending=[False, True],
                          kind="mergesort")
        return s.head(k).astype({"df": "int64"})

    part_schema = pa.schema([("term", pa.utf8()), ("df", pa.int64())])
    cand = _sharded_groupby(pr, ["th"], per_shard,
                            empty_schema=part_schema).to_pandas()
    if not len(cand):
        return []
    top = cand.sort_values(["df", "term"], ascending=[False, True],
                           kind="mergesort").head(k)
    return list(zip(top["term"].tolist(),
                    top["df"].astype("int64").tolist()))


# ---------------------------------------------------------------------------
# percolation


def percolate_df(source: str | rd.Dataset) -> pd.DataFrame:
    """(term_a, term_b, n_matches, min_doc_id, max_doc_id) for every
    stored conjunctive 2-term query with >=1 matching document.

    Stored queries = all rank-ordered pairs of the top-``PERC_TOP_TERMS``
    df terms (ties term asc).  Match pass: per batch, one vectorized
    equality scan per stored term builds a per-doc membership bitmask;
    each pair's partial (count, min doc, max doc) is closed-form from
    the bitmask — at most C(8,2)=28 partial rows per batch reach the
    driver regardless of corpus size."""
    docs = _docs(source)
    cols = ["term_a", "term_b", "n_matches", "min_doc_id", "max_doc_id"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c in ("term_a", "term_b") else "int64")
            for c in cols})

    terms = [t for t, _df in _top_df_terms(docs, PERC_TOP_TERMS)]
    if len(terms) < 2:
        return _empty()
    nt = len(terms)

    def match(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ra": pa.array([], pa.int64()), "rb": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()), "mn": pa.array([], pa.int64()),
             "mx": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        bits = np.zeros(batch.num_rows, np.int64)
        for i, t in enumerate(terms):
            m = pc.equal(toks, t).to_numpy(zero_copy_only=False)
            # repeated row indices OR the same bit — idempotent, safe
            bits[row_idx[m]] |= np.int64(1 << i)
        ra, rb, ns, mns, mxs = [], [], [], [], []
        for a in range(nt):
            for b in range(a + 1, nt):
                sel = ((bits >> a) & (bits >> b) & 1).astype(bool)
                if sel.any():
                    d = doc_ids[sel]
                    ra.append(a)
                    rb.append(b)
                    ns.append(int(sel.sum()))
                    mns.append(int(d.min()))
                    mxs.append(int(d.max()))
        if not ra:
            return empty
        return pa.table(
            {"ra": pa.array(ra, pa.int64()), "rb": pa.array(rb, pa.int64()),
             "n": pa.array(ns, pa.int64()), "mn": pa.array(mns, pa.int64()),
             "mx": pa.array(mxs, pa.int64())}
        )

    parts = docs.map_batches(match, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if not len(parts):
        return _empty()
    agg = parts.groupby(["ra", "rb"], as_index=False).agg(
        n_matches=("n", "sum"), min_doc_id=("mn", "min"),
        max_doc_id=("mx", "max"))
    agg["term_a"] = agg["ra"].map(lambda i: terms[i])
    agg["term_b"] = agg["rb"].map(lambda i: terms[i])
    return agg.astype(
        {"n_matches": "int64", "min_doc_id": "int64", "max_doc_id": "int64"}
    )[cols]


def sql_percolate() -> str:
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
td AS (SELECT DISTINCT doc_id, term FROM tok),
df AS (SELECT term, count(*)::BIGINT AS df FROM td GROUP BY 1),
top AS (
    SELECT term, rk FROM (
        SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rk
        FROM df
    ) WHERE rk <= {PERC_TOP_TERMS}
),
pairs AS (
    SELECT a.term AS ta, b.term AS tb
    FROM top a JOIN top b ON a.rk < b.rk
),
m AS (
    SELECT p.ta, p.tb, x.doc_id
    FROM pairs p
    JOIN td x ON x.term = p.ta
    JOIN td y ON y.term = p.tb AND y.doc_id = x.doc_id
)
SELECT ta AS term_a, tb AS term_b, count(*)::BIGINT AS n_matches,
       min(doc_id)::BIGINT AS min_doc_id, max(doc_id)::BIGINT AS max_doc_id
FROM m GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# NDCG ranking evaluation


def ndcg_eval_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Per query term: ``term, n_candidates, dcg_fp, idcg_fp,
    ndcg_x1e6`` for NDCG@``NDCG_K``.

    Queries = top-``NDCG_QUERIES`` df terms.  Candidates = docs with
    tf > 0; ranking key ``s = 1000*tf // dl`` (integer length-normalized
    tf, ties doc asc), graded relevance ``rel = min(tf, 3)``; DCG uses
    the ``_NDCG_W`` integer weight table.  ``ndcg_x1e6 =
    1e6 * dcg_fp // idcg_fp``.

    Per batch, each query's TOP-``NDCG_K`` rows under BOTH orders (plus
    a count partial) are emitted — top-k of a union is the top-k of
    per-batch top-k's, so the driver merge over <=2k+1 rows per
    (batch, query) is exact at any corpus size."""
    docs = _docs(source)
    cols = ["term", "n_candidates", "dcg_fp", "idcg_fp", "ndcg_x1e6"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "term" else "int64") for c in cols})

    terms = [t for t, _df in _top_df_terms(docs, NDCG_QUERIES)]
    if not terms:
        return _empty()

    def cand(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"q": pa.array([], pa.int64()), "which": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
             "rel": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        dl = np.bincount(row_idx, minlength=batch.num_rows).astype(np.int64)
        qs, whichs, ds, ss, rels = [], [], [], [], []
        for qi, t in enumerate(terms):
            m = pc.equal(toks, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(row_idx[m], minlength=batch.num_rows).astype(
                np.int64)
            sel = tf > 0
            if not sel.any():
                continue
            tfs = tf[sel]
            s = (1000 * tfs) // dl[sel]
            rel = np.minimum(tfs, 3)
            dsel = doc_ids[sel]
            ranked = np.lexsort((dsel, -s))[:NDCG_K]
            ideal = np.lexsort((dsel, -rel))[:NDCG_K]
            for which, idx in ((0, ranked), (1, ideal)):
                qs.extend([qi] * len(idx))
                whichs.extend([which] * len(idx))
                ds.extend(dsel[idx].tolist())
                ss.extend(s[idx].tolist())
                rels.extend(rel[idx].tolist())
            # count partial rides in `s`
            qs.append(qi)
            whichs.append(2)
            ds.append(-1)
            ss.append(int(sel.sum()))
            rels.append(0)
        if not qs:
            return empty
        return pa.table(
            {"q": pa.array(qs, pa.int64()),
             "which": pa.array(whichs, pa.int64()),
             "doc_id": pa.array(ds, pa.int64()),
             "s": pa.array(ss, pa.int64()),
             "rel": pa.array(rels, pa.int64())}
        )

    parts = docs.map_batches(cand, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if not len(parts):
        return _empty()
    w = np.asarray(_NDCG_W, np.int64)
    rows = []
    for qi, t in enumerate(terms):
        p = parts[parts["q"] == qi]
        if not len(p):
            continue
        r = p[p["which"] == 0].sort_values(
            ["s", "doc_id"], ascending=[False, True],
            kind="mergesort").head(NDCG_K)
        i = p[p["which"] == 1].sort_values(
            ["rel", "doc_id"], ascending=[False, True],
            kind="mergesort").head(NDCG_K)
        dcg = int((r["rel"].to_numpy(np.int64) * w[: len(r)]).sum())
        idcg = int((i["rel"].to_numpy(np.int64) * w[: len(i)]).sum())
        n = int(p.loc[p["which"] == 2, "s"].sum())
        rows.append(
            {"term": t, "n_candidates": n, "dcg_fp": dcg, "idcg_fp": idcg,
             "ndcg_x1e6": (1_000_000 * dcg) // idcg}
        )
    if not rows:
        return _empty()
    return pd.DataFrame(rows).astype(
        {"n_candidates": "int64", "dcg_fp": "int64", "idcg_fp": "int64",
         "ndcg_x1e6": "int64"})[cols]


def sql_ndcg_eval() -> str:
    w_lit = "[" + ", ".join(str(x) for x in _NDCG_W) + "]"
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
top AS (
    SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rk
        FROM df
    ) WHERE rk <= {NDCG_QUERIES}
),
dl AS (SELECT doc_id, count(*)::BIGINT AS n FROM tok GROUP BY 1),
tfq AS (
    SELECT t.term, t.doc_id, count(*)::BIGINT AS tf
    FROM tok t JOIN top USING (term) GROUP BY 1, 2
),
cand AS (
    SELECT tfq.term, tfq.doc_id, (1000 * tfq.tf) // dl.n AS s,
           least(tfq.tf, 3)::BIGINT AS rel
    FROM tfq JOIN dl USING (doc_id)
),
r AS (
    SELECT term, rel,
           row_number() OVER (PARTITION BY term ORDER BY s DESC, doc_id) AS rk
    FROM cand
),
i AS (
    SELECT term, rel,
           row_number() OVER (PARTITION BY term
                              ORDER BY rel DESC, doc_id) AS rk
    FROM cand
),
dcg AS (
    SELECT term, sum(rel * list_extract({w_lit}, rk))::BIGINT AS dcg_fp
    FROM r WHERE rk <= {NDCG_K} GROUP BY 1
),
idcg AS (
    SELECT term, sum(rel * list_extract({w_lit}, rk))::BIGINT AS idcg_fp
    FROM i WHERE rk <= {NDCG_K} GROUP BY 1
),
nc AS (SELECT term, count(*)::BIGINT AS n_candidates FROM cand GROUP BY 1)
SELECT nc.term, nc.n_candidates, dcg.dcg_fp, idcg.idcg_fp,
       ((1000000 * dcg.dcg_fp) // idcg.idcg_fp)::BIGINT AS ndcg_x1e6
FROM nc JOIN dcg USING (term) JOIN idcg USING (term)
"""


# ---------------------------------------------------------------------------
# pseudo-relevance-feedback query expansion (Rocchio/RM3 family)

PRF_FEEDBACK_K = 10
PRF_EXPANSION_K = 10


def prf_expand_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Expansion terms for the top-df query term: ``term, fb_df, corpus_df,
    score_fp, rank``.

    Feedback set = top-``PRF_FEEDBACK_K`` docs under the integer
    length-normalized ranking (s = 1000*tf // dl, ties doc asc) for the
    query term.  Candidate expansion terms are ranked by
    ``score_fp = fb_df * 1_000_000 - corpus_df`` (reward presence in the
    feedback docs, penalize common terms; exact int64 for corpus_df <
    1e6 docs per the asserted bound), query term excluded, ties term
    asc, top ``PRF_EXPANSION_K``.

    Shape: two bounded scans (top-df query derivation; per-batch
    ranking candidates, <=K rows per batch) + ONE term-sharded exchange
    computing fb_df/corpus_df per term with the <=K-doc feedback set
    broadcast in the closure, per-shard top-K candidates, bounded
    driver merge."""
    from .dedup import _sharded_groupby

    docs = _docs(source)
    cols = ["term", "fb_df", "corpus_df", "score_fp", "rank"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "term" else "int64") for c in cols})

    top = _top_df_terms(docs, 1)
    if not top:
        return _empty()
    qterm = top[0][0]

    def cand(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "s": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        dl = np.bincount(row_idx, minlength=batch.num_rows).astype(np.int64)
        m = pc.equal(toks, qterm).to_numpy(zero_copy_only=False)
        tf = np.bincount(row_idx[m], minlength=batch.num_rows).astype(
            np.int64)
        sel = tf > 0
        if not sel.any():
            return empty
        s = (1000 * tf[sel]) // dl[sel]
        dsel = doc_ids[sel]
        k = np.lexsort((dsel, -s))[:PRF_FEEDBACK_K]
        return pa.table(
            {"doc_id": pa.array(dsel[k], pa.int64()),
             "s": pa.array(s[k], pa.int64())}
        )

    cands = docs.map_batches(cand, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if not len(cands):
        return _empty()
    fb = cands.sort_values(["s", "doc_id"], ascending=[False, True],
                           kind="mergesort").head(PRF_FEEDBACK_K)
    fb_ids = np.sort(fb["doc_id"].to_numpy(np.int64))

    def term_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.utf8()),
             "fb": pa.array([], pa.int64()),
             "th": pa.array([], pa.int64())}
        )
        toks, token_doc, _ri, h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        infb = np.isin(token_doc, fb_ids)
        t = pa.table(
            {"term": toks,
             "doc": pa.array(token_doc, pa.int64()),
             "fb": pa.array(infb.astype(np.int64), pa.int64()),
             "th": pa.array(h1.view(np.int64), pa.int64())}
        )
        d = t.group_by(["term", "doc"]).aggregate(
            [("th", "min"), ("fb", "max")])
        g = d.group_by("term").aggregate(
            [("fb_max", "sum"), ("doc", "count"), ("th_min", "min")])
        return pa.table(
            {"term": g["term"],
             "fb": g["fb_max_sum"].cast(pa.int64()),
             "df": g["doc_count"].cast(pa.int64()),
             "th": g["th_min_min"]}
        )

    rows = docs.map_batches(term_rows, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", as_index=False).agg(
            fb_df=("fb", "sum"), corpus_df=("df", "sum"))
        if int(s["corpus_df"].max()) >= 1_000_000:
            raise ValueError(
                "prf_expand: corpus_df >= 1e6 breaks the composite "
                "integer score; widen the score scale first"
            )
        s = s[(s["fb_df"] > 0) & (s["term"] != qterm)]
        s["score_fp"] = s["fb_df"] * 1_000_000 - s["corpus_df"]
        return s.sort_values(["score_fp", "term"],
                             ascending=[False, True],
                             kind="mergesort").head(PRF_EXPANSION_K)

    part_schema = pa.schema(
        [("term", pa.utf8()), ("fb_df", pa.int64()),
         ("corpus_df", pa.int64()), ("score_fp", pa.int64())]
    )
    parts = _sharded_groupby(rows, ["th"], per_shard,
                             empty_schema=part_schema).to_pandas()
    if not len(parts):
        return _empty()
    out = parts.sort_values(["score_fp", "term"], ascending=[False, True],
                            kind="mergesort").head(
        PRF_EXPANSION_K).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.astype(
        {"fb_df": "int64", "corpus_df": "int64", "score_fp": "int64",
         "rank": "int64"})[cols]


def sql_prf_expand() -> str:
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
q AS (
    SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rk
        FROM df
    ) WHERE rk = 1
),
dl AS (SELECT doc_id, count(*)::BIGINT AS n FROM tok GROUP BY 1),
tfq AS (
    SELECT t.doc_id, count(*)::BIGINT AS tf
    FROM tok t JOIN q ON t.term = q.term GROUP BY 1
),
fb AS (
    SELECT doc_id FROM (
        SELECT tfq.doc_id,
               row_number() OVER (
                   ORDER BY (1000 * tfq.tf) // dl.n DESC, tfq.doc_id) AS rk
        FROM tfq JOIN dl USING (doc_id)
    ) WHERE rk <= {PRF_FEEDBACK_K}
),
td AS (SELECT DISTINCT doc_id, term FROM tok),
stats AS (
    SELECT td.term,
           sum((td.doc_id IN (SELECT doc_id FROM fb))::BIGINT)::BIGINT
               AS fb_df,
           count(*)::BIGINT AS corpus_df
    FROM td GROUP BY 1
)
SELECT term, fb_df, corpus_df,
       (fb_df * 1000000 - corpus_df)::BIGINT AS score_fp, rk::BIGINT AS rank
FROM (
    SELECT *, row_number() OVER (
        ORDER BY fb_df * 1000000 - corpus_df DESC, term) AS rk
    FROM stats
    WHERE fb_df > 0 AND term <> (SELECT term FROM q)
)
WHERE rk <= {PRF_EXPANSION_K}
"""


# ---------------------------------------------------------------------------
# did-you-mean query spell suggestion

DYM_PROBES = ("joinn", "datq", "quer", "vektor", "tablee", "zzz")
DYM_TOPK = 3


def did_you_mean_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Spelling suggestions for misspelled query terms: lexicon terms
    within Levenshtein distance ≤ 1 of each probe, ranked by (distance,
    document frequency desc, term) — the search-box "did you mean"
    feature over the index lexicon (cf. the reference's query loop,
    /root/reference/src/query.c, which has no recovery for OOV terms).

    Scale shape: the probe set is tiny and FIXED, so the whole pass is
    one streaming scan — per batch, distance-≤1 classification runs
    vectorized over the batch's UNIQUE padded term matrix against each
    probe (strsim.dist_le1, no FastSS indirection needed for a bounded
    probe set), and only matching (probe, term, batch-df) partials
    reach the pair-sharded sum.  Per-batch df partials are exact
    because documents never span batches.
    """
    from .dedup import _sharded_groupby
    from .strsim import _pad16, dist_le1

    docs = _docs(source)
    pmat, plens = _pad16(list(DYM_PROBES))

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "probe": pa.array([], pa.utf8()),
            "term": pa.array([], pa.utf8()),
            "dist": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "th": pa.array([], pa.int64()),
        })
        toks, token_doc, _row, h1, _h2 = _batch_tokens(batch)
        if len(toks) == 0:
            return empty
        codes, uniq = pd.factorize(toks.to_pandas(), sort=False)
        mat, lens = _pad16(list(uniq))
        probes_out: list[str] = []
        terms_out: list[str] = []
        dists: list[int] = []
        dfs: list[int] = []
        ths: list[int] = []
        for pi, probe in enumerate(DYM_PROBES):
            d = dist_le1(
                mat, lens,
                np.broadcast_to(pmat[pi], mat.shape),
                np.full(len(lens), plens[pi]),
            )
            for ti in np.flatnonzero(d <= 1):
                m = codes == ti
                df = len(np.unique(token_doc[m]))
                probes_out.append(probe)
                terms_out.append(str(uniq[ti]))
                dists.append(int(d[ti]))
                dfs.append(df)
                ths.append(int(h1[m][0]) & ((1 << 62) - 1))
        if not probes_out:
            return empty
        return pa.table({
            "probe": pa.array(probes_out, pa.utf8()),
            "term": pa.array(terms_out, pa.utf8()),
            "dist": pa.array(dists, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "th": pa.array(ths, pa.int64()),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["probe", "term", "dist"], as_index=False)["df"].sum()

    merged = _sharded_groupby(parts, ["th"], agg).to_pandas()
    if not len(merged):
        return pd.DataFrame({
            "probe": pd.Series([], dtype="object"),
            "term": pd.Series([], dtype="object"),
            "df": pd.Series([], dtype="int64"),
            "dist": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64"),
        })
    merged = merged.groupby(["probe", "term", "dist"], as_index=False)["df"].sum()
    out_rows = []
    for probe, grp in merged.groupby("probe"):
        grp = grp.sort_values(
            ["dist", "df", "term"], ascending=[True, False, True]
        ).head(DYM_TOPK)
        for rk, (_, r) in enumerate(grp.iterrows(), start=1):
            out_rows.append((probe, r["term"], int(r["df"]),
                             int(r["dist"]), rk))
    out = pd.DataFrame(
        out_rows, columns=["probe", "term", "df", "dist", "rank"]
    )
    for c in ("df", "dist", "rank"):
        out[c] = out[c].astype("int64")
    return out


def sql_did_you_mean() -> str:
    probe_rows = ", ".join(f"('{p}')" for p in DYM_PROBES)
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
td AS (SELECT DISTINCT doc_id, term FROM tok),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM td GROUP BY 1),
probes(probe) AS (VALUES {probe_rows}),
cand AS (
    SELECT p.probe, d.term, d.df,
           levenshtein(p.probe, d.term)::BIGINT AS dist
    FROM probes p JOIN dfs d ON levenshtein(p.probe, d.term) <= 1
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY probe ORDER BY dist, df DESC, term) AS rk
    FROM cand
)
SELECT probe, term, df, dist, rk::BIGINT AS rank
FROM r WHERE rk <= {DYM_TOPK}
"""


# ---------------------------------------------------------------------------
# rank-biased overlap between two document rankings

RBO_K = 10
RBO_P_NUM, RBO_P_DEN = 9, 10  # persistence p = 0.9
# integer weights round((1-p) * p^(d-1) * 1e9), d = 1..K — computed once
# here and inlined into the SQL (the _NDCG_W pattern)
_RBO_W = [
    round((1 - RBO_P_NUM / RBO_P_DEN) * (RBO_P_NUM / RBO_P_DEN) ** (d - 1)
          * 1_000_000_000)
    for d in range(1, RBO_K + 1)
]


def rbo_rankings_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Rank-biased overlap (Webber et al., TOIS 2010 — public metric)
    between two rankings of the top-df query term's posting list:
    list A orders docs by raw tf, list B by the length-normalized
    integer impact ``tf * 1e6 // dl`` (the impact_postings key).  Both
    orders are total (integer key, doc_id tiebreak), the per-depth
    overlap is an exact integer, and each depth's contribution is
    ``(W[d] * ov_d) // d`` with the geometric weight table inlined into
    the SQL — so the whole metric is integer-exact (a fixed-point lower
    bound of RBO@K).

    Shape: one streaming pass emits per-block partial top-K candidates
    under BOTH orders (docs never span batches, so (tf, dl) per doc is
    exact per block); the driver merges <= 2K rows per block.
    Columns: ``term, d, doc_tf, doc_imp, ov, contrib, rbo_fp``."""
    docs = _docs(source)
    qt = _top_df_terms(docs, 1)
    cols = ["term", "d", "doc_tf", "doc_imp", "ov", "contrib", "rbo_fp"]
    if not len(qt):
        return pd.DataFrame({
            "term": pd.Series([], dtype=object),
            "d": pd.Series([], dtype="int64"),
            "doc_tf": pd.Series([], dtype="int64"),
            "doc_imp": pd.Series([], dtype="int64"),
            "ov": pd.Series([], dtype="int64"),
            "contrib": pd.Series([], dtype="int64"),
            "rbo_fp": pd.Series([], dtype="int64"),
        })
    term = qt[0][0]

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64()),
        })
        toks, token_doc, _row, _h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        is_q = pc.equal(toks, term).to_numpy(zero_copy_only=False)
        hit_docs = token_doc[is_q]
        if not len(hit_docs):
            return empty
        udocs, tf = np.unique(hit_docs, return_counts=True)
        alld, dl_all = np.unique(token_doc, return_counts=True)
        dl = dl_all[np.searchsorted(alld, udocs)]
        imp = tf.astype(np.int64) * 1_000_000 // dl.astype(np.int64)
        # partial top-K under BOTH total orders: global winners are
        # contained in the union of per-block winners
        ka = np.lexsort((udocs, -tf))[:RBO_K]
        kb = np.lexsort((udocs, -imp))[:RBO_K]
        keep = np.unique(np.concatenate([ka, kb]))
        return pa.table({
            "doc_id": pa.array(udocs[keep].astype(np.int64)),
            "tf": pa.array(tf[keep].astype(np.int64)),
            "dl": pa.array(dl[keep].astype(np.int64)),
        })

    cand = docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(cand):
        return pd.DataFrame(columns=cols)
    cand = cand.drop_duplicates("doc_id")
    tf = cand["tf"].to_numpy(np.int64)
    dl = cand["dl"].to_numpy(np.int64)
    ids = cand["doc_id"].to_numpy(np.int64)
    imp = tf * 1_000_000 // dl
    oa = np.lexsort((ids, -tf))[:RBO_K]
    ob = np.lexsort((ids, -imp))[:RBO_K]
    la, lb = ids[oa], ids[ob]
    n_d = min(RBO_K, len(la))
    rows = []
    rbo_fp = 0
    for d in range(1, n_d + 1):
        ov = len(np.intersect1d(la[:d], lb[:d]))
        contrib = (_RBO_W[d - 1] * ov) // d
        rbo_fp += contrib
        rows.append((term, d, int(la[d - 1]), int(lb[d - 1]), ov, contrib))
    out = pd.DataFrame(
        rows, columns=["term", "d", "doc_tf", "doc_imp", "ov", "contrib"]
    )
    out["rbo_fp"] = rbo_fp
    for c in ("d", "doc_tf", "doc_imp", "ov", "contrib", "rbo_fp"):
        out[c] = out[c].astype("int64")
    return out[cols]


def sql_rbo_rankings() -> str:
    w_rows = ", ".join(
        f"({d}, {w})" for d, w in enumerate(_RBO_W, start=1)
    )
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
td AS (SELECT DISTINCT doc_id, term FROM tok),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM td GROUP BY 1),
qt AS (SELECT term FROM dfs ORDER BY df DESC, term LIMIT 1),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
tf AS (
    SELECT doc_id, count(*)::BIGINT AS tf FROM tok
    WHERE term = (SELECT term FROM qt) GROUP BY 1
),
j AS (
    SELECT t.doc_id, t.tf, (t.tf * 1000000 // d.dl)::BIGINT AS imp
    FROM tf t JOIN dl d USING (doc_id)
),
ra AS (SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS rk
       FROM j),
rb AS (SELECT doc_id, row_number() OVER (ORDER BY imp DESC, doc_id) AS rk
       FROM j),
w(d, w) AS (VALUES {w_rows}),
depths AS (
    SELECT d, w FROM w
    WHERE d <= least({RBO_K}, (SELECT count(*) FROM j))
),
per AS (
    SELECT dp.d, dp.w,
           (SELECT doc_id FROM ra WHERE rk = dp.d) AS doc_tf,
           (SELECT doc_id FROM rb WHERE rk = dp.d) AS doc_imp,
           (SELECT count(*) FROM ra a JOIN rb b USING (doc_id)
            WHERE a.rk <= dp.d AND b.rk <= dp.d)::BIGINT AS ov
    FROM depths dp
)
SELECT (SELECT term FROM qt) AS term, d::BIGINT AS d,
       doc_tf::BIGINT AS doc_tf, doc_imp::BIGINT AS doc_imp, ov,
       ((w::HUGEINT * ov) // d)::BIGINT AS contrib,
       (sum((w::HUGEINT * ov) // d) OVER ())::BIGINT AS rbo_fp
FROM per ORDER BY d
"""


# ---------------------------------------------------------------------------
# MAP@K / MRR retrieval evaluation (completes the eval family:
# confusion matrix -> AUC -> NDCG -> kappa -> MAP/MRR)

EVAL_K = 10
EVAL_QUERIES = 3
EVAL_REL_TF = 3  # binary relevance: tf >= EVAL_REL_TF


def map_mrr_eval_df(source: str | rd.Dataset) -> pd.DataFrame:
    """Per query term: ``term, n_candidates, n_relevant, first_rel_rank,
    rr_x1e9, ap_num_x1e9, ap_x1e6`` — MRR and MAP@``EVAL_K`` of the
    integer length-normalized ranking (``s = 1000*tf // dl``, ties doc
    asc; same ranking as ndcg_eval) against binary relevance
    ``tf >= EVAL_REL_TF``.

    Everything is integer fixed point: ``rr_x1e9 = 1e9 //
    first_rel_rank`` (0 when no relevant doc ranks <= K),
    ``ap_num_x1e9 = sum over relevant positions k<=K of
    (1e9 * hits_at_k) // k`` and ``ap_x1e6 = ap_num_x1e9 // (1000 *
    min(n_relevant, K))`` — floor divisions of non-negative ints agree
    between numpy/Python and DuckDB ``//``, so the result is hash-exact.

    Scale shape identical to ndcg_eval_df: per batch each query emits
    its top-``EVAL_K`` rows under the total ranking order plus one count
    partial (top-k of a union is the top-k of per-batch top-k's), so the
    driver merge sees <= (K+1) rows per (batch, query) at any corpus
    size."""
    docs = _docs(source)
    cols = ["term", "n_candidates", "n_relevant", "first_rel_rank",
            "rr_x1e9", "ap_num_x1e9", "ap_x1e6"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "term" else "int64") for c in cols})

    terms = [t for t, _df in _top_df_terms(docs, EVAL_QUERIES)]
    if not terms:
        return _empty()

    def cand(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"q": pa.array([], pa.int64()), "which": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
             "rel": pa.array([], pa.int64())}
        )
        toks, _td, row_idx, _h1, _h2 = _batch_tokens(batch)
        if not len(toks):
            return empty
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        dl = np.bincount(row_idx, minlength=batch.num_rows).astype(np.int64)
        qs, whichs, ds, ss, rels = [], [], [], [], []
        for qi, t in enumerate(terms):
            m = pc.equal(toks, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(row_idx[m], minlength=batch.num_rows).astype(
                np.int64)
            sel = tf > 0
            if not sel.any():
                continue
            tfs = tf[sel]
            s = (1000 * tfs) // dl[sel]
            rel = (tfs >= EVAL_REL_TF).astype(np.int64)
            dsel = doc_ids[sel]
            ranked = np.lexsort((dsel, -s))[:EVAL_K]
            qs.extend([qi] * len(ranked))
            whichs.extend([0] * len(ranked))
            ds.extend(dsel[ranked].tolist())
            ss.extend(s[ranked].tolist())
            rels.extend(rel[ranked].tolist())
            # count partial: n_candidates in `s`, n_relevant in `rel`
            qs.append(qi)
            whichs.append(2)
            ds.append(-1)
            ss.append(int(sel.sum()))
            rels.append(int(rel.sum()))
        if not qs:
            return empty
        return pa.table(
            {"q": pa.array(qs, pa.int64()),
             "which": pa.array(whichs, pa.int64()),
             "doc_id": pa.array(ds, pa.int64()),
             "s": pa.array(ss, pa.int64()),
             "rel": pa.array(rels, pa.int64())}
        )

    parts = docs.map_batches(cand, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if not len(parts):
        return _empty()
    rows = []
    for qi, t in enumerate(terms):
        p = parts[parts["q"] == qi]
        if not len(p):
            continue
        r = p[p["which"] == 0].sort_values(
            ["s", "doc_id"], ascending=[False, True],
            kind="mergesort").head(EVAL_K)
        rel = r["rel"].to_numpy(np.int64)
        hits = np.cumsum(rel)
        ranks = np.arange(1, len(rel) + 1, dtype=np.int64)
        rel_pos = ranks[rel == 1]
        first = int(rel_pos[0]) if len(rel_pos) else 0
        n_cand = int(p.loc[p["which"] == 2, "s"].sum())
        n_rel = int(p.loc[p["which"] == 2, "rel"].sum())
        ap_num = int(
            ((1_000_000_000 * hits[rel == 1]) // rel_pos).sum()
        ) if len(rel_pos) else 0
        denom = 1000 * min(n_rel, EVAL_K)
        rows.append({
            "term": t, "n_candidates": n_cand, "n_relevant": n_rel,
            "first_rel_rank": first,
            "rr_x1e9": 1_000_000_000 // first if first else 0,
            "ap_num_x1e9": ap_num,
            "ap_x1e6": ap_num // denom if denom else 0,
        })
    if not rows:
        return _empty()
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in cols if c != "term"})[cols]


def sql_map_mrr_eval() -> str:
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
top AS (
    SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rk
        FROM df
    ) WHERE rk <= {EVAL_QUERIES}
),
dl AS (SELECT doc_id, count(*)::BIGINT AS n FROM tok GROUP BY 1),
tfq AS (
    SELECT t.term, t.doc_id, count(*)::BIGINT AS tf
    FROM tok t JOIN top USING (term) GROUP BY 1, 2
),
cand AS (
    SELECT tfq.term, tfq.doc_id, (1000 * tfq.tf) // dl.n AS s,
           (CASE WHEN tfq.tf >= {EVAL_REL_TF} THEN 1 ELSE 0 END)::BIGINT
               AS rel
    FROM tfq JOIN dl USING (doc_id)
),
r AS (
    SELECT term, rel,
           row_number() OVER (PARTITION BY term ORDER BY s DESC, doc_id)
               AS rk,
           sum(rel) OVER (PARTITION BY term ORDER BY s DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS hits
    FROM cand
),
agg AS (
    SELECT term, count(*)::BIGINT AS n_candidates,
           sum(rel)::BIGINT AS n_relevant
    FROM cand GROUP BY 1
),
topk AS (SELECT * FROM r WHERE rk <= {EVAL_K}),
firstrel AS (
    SELECT term, coalesce(min(CASE WHEN rel = 1 THEN rk END), 0)::BIGINT
               AS first_rel_rank
    FROM topk GROUP BY 1
),
ap AS (
    SELECT term,
           coalesce(sum(CASE WHEN rel = 1
                             THEN (1000000000 * hits) // rk END),
                    0)::BIGINT AS ap_num_x1e9
    FROM topk GROUP BY 1
)
SELECT agg.term, agg.n_candidates, agg.n_relevant,
       firstrel.first_rel_rank,
       (CASE WHEN firstrel.first_rel_rank > 0
             THEN 1000000000 // firstrel.first_rel_rank ELSE 0 END)::BIGINT
           AS rr_x1e9,
       ap.ap_num_x1e9,
       (CASE WHEN least(agg.n_relevant, {EVAL_K}) > 0
             THEN ap.ap_num_x1e9 // (1000 * least(agg.n_relevant, {EVAL_K}))
             ELSE 0 END)::BIGINT AS ap_x1e6
FROM agg JOIN firstrel USING (term) JOIN ap USING (term)
"""


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (Zhai & Lafferty
# 2001) — the second classical ranking model next to BM25.  Per doc:
#
#   score(q, d) = sum_t log (tf + MU * cf_t / C) / (dl + MU)
#               = sum_t [ L'(tf*C + MU*cf_t) - L'((dl + MU) * C) ]
#
# with L' the shifted fixed-point log2 (textpipe._log2_fp_ext), so the
# score is an exact int64 on both engines.  Probe terms with cf = 0 are
# dropped from the query (standard practice: the smoothed probability is
# undefined); candidates are docs matching >= 1 kept term.

QL_MU = 2000
QL_TOP_K = 20
QL_TERMS = ("data", "table", "query")


def ql_dirichlet_df(source: "str | rd.Dataset") -> pd.DataFrame:
    """Top-``QL_TOP_K`` docs under Dirichlet query likelihood.

    Columns: ``rank, doc_id, n_match, score_fp`` (all int64; rank under
    the total order score_fp desc, doc_id asc).

    Shape (100 TB): pass 1 streams tiny (term, count) partials (probe
    cf + corpus token total C) to a bounded driver combine; pass 2 is a
    per-batch candidate scorer emitting <= K rows per batch (partial
    top-k under the total order), merged on the driver.  No shuffle, no
    driver materialization of candidates.
    """
    from .textpipe import _log2_fp_ext

    ds = _docs(source)
    probe = set(QL_TERMS)

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks, _td, _ri, _h1, _h2 = _batch_tokens(batch)
        tv = toks.to_numpy(zero_copy_only=False)
        terms, counts = ["\x00total"], [len(tv)]
        if len(tv):
            mask = np.isin(tv, list(probe))
            ut, uc = np.unique(tv[mask], return_counts=True)
            terms += list(ut)
            counts += [int(x) for x in uc]
        return pa.table({"term": pa.array(terms, pa.string()),
                         "c": pa.array(counts, pa.int64())})

    sp = ds.map_batches(stats_partial, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    agg = sp.groupby("term")["c"].sum()
    c_tot = int(agg.get("\x00total", 0))
    cf = {t: int(agg[t]) for t in QL_TERMS if t in agg and agg[t] > 0}
    cols = ["rank", "doc_id", "n_match", "score_fp"]
    if not cf or c_tot == 0:
        return pd.DataFrame(columns=cols).astype("int64")
    kept = sorted(cf)
    n_q = len(kept)
    cf_vec = np.array([cf[t] for t in kept], np.int64)

    def score_partial(batch: pa.Table) -> pa.Table:
        toks, token_doc, _ri, _h1, _h2 = _batch_tokens(batch)
        tv = toks.to_numpy(zero_copy_only=False)
        doc_ids = np.unique(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        nd = len(doc_ids)
        if nd == 0 or len(tv) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ["doc_id", "n_match", "score_fp"]})
        # dl per doc (ALL kept tokens), tf per (doc, kept probe term)
        drow = np.searchsorted(doc_ids, token_doc)
        dl = np.bincount(drow, minlength=nd).astype(np.int64)
        tf = np.zeros((nd, n_q), np.int64)
        for j, t in enumerate(kept):
            sel = tv == t
            if sel.any():
                tf[:, j] = np.bincount(drow[sel], minlength=nd)
        n_match = (tf > 0).sum(axis=1).astype(np.int64)
        cand = n_match > 0
        if not cand.any():
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ["doc_id", "n_match", "score_fp"]})
        num = tf[cand] * c_tot + QL_MU * cf_vec[None, :]
        l_num = _log2_fp_ext(num.ravel()).reshape(num.shape)
        l_den = _log2_fp_ext((dl[cand] + QL_MU) * c_tot)
        score = l_num.sum(axis=1) - n_q * l_den
        d = doc_ids[cand]
        order = np.lexsort((d, -score))[:QL_TOP_K]
        return pa.table({
            "doc_id": pa.array(d[order], pa.int64()),
            "n_match": pa.array(n_match[cand][order], pa.int64()),
            "score_fp": pa.array(score[order], pa.int64()),
        })

    parts = ds.map_batches(score_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame(columns=cols).astype("int64")
    top = parts.sort_values(
        ["score_fp", "doc_id"], ascending=[False, True]
    ).head(QL_TOP_K).reset_index(drop=True)
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top[cols].astype("int64")


def sql_ql_dirichlet() -> str:
    terms = ", ".join(f"('{t}')" for t in QL_TERMS)
    lfp = (
        "CAST(round(log2({k} >> greatest(length(bin({k}))::BIGINT - 16, 0))"
        " * 1000000000) AS BIGINT)"
        " + greatest(length(bin({k}))::BIGINT - 16, 0) * 1000000000"
    )
    return f"""
WITH filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
tot AS (SELECT count(*)::BIGINT AS c FROM tok),
qt(term) AS (VALUES {terms}),
cf AS (
    SELECT t.term, count(*)::BIGINT AS cf
    FROM tok t JOIN qt USING (term) GROUP BY 1
),
nq AS (SELECT count(*)::BIGINT AS n FROM cf),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
tfq AS (
    SELECT t.doc_id, t.term, count(*)::BIGINT AS tf
    FROM tok t JOIN cf USING (term) GROUP BY 1, 2
),
cand AS (SELECT doc_id, count(*)::BIGINT AS n_match FROM tfq GROUP BY 1),
grid AS (
    SELECT c.doc_id, c.n_match, f.term, f.cf, coalesce(t.tf, 0) AS tf
    FROM cand c
    CROSS JOIN cf f
    LEFT JOIN tfq t ON t.doc_id = c.doc_id AND t.term = f.term
),
contrib AS (
    SELECT doc_id, n_match,
           {lfp.format(k="(tf * tot.c + " + str(QL_MU) + " * cf)")} AS l_num
    FROM grid, tot
),
den AS (
    SELECT d.doc_id,
           {lfp.format(k="((d.dl + " + str(QL_MU) + ") * tot.c)")} AS l_den
    FROM dl d, tot
),
scored AS (
    SELECT c.doc_id, any_value(c.n_match) AS n_match,
           (sum(c.l_num) - any_value(nq.n) * any_value(de.l_den))::BIGINT
               AS score_fp
    FROM contrib c JOIN den de ON c.doc_id = de.doc_id, nq
    GROUP BY c.doc_id
)
SELECT rank, doc_id, n_match, score_fp FROM (
    SELECT row_number() OVER (ORDER BY score_fp DESC, doc_id)::BIGINT AS rank,
           doc_id, n_match, score_fp
    FROM scored
) WHERE rank <= {QL_TOP_K}
"""


# --------------------------------------------------------------------------
# BM25F: field-boosted ranking (title = first BM25F_TITLE_LEN token
# positions, weight BM25F_W_TITLE; body = the rest).  The classic fielded
# extension the reference's single-field scorer (src/query.c:129-151)
# cannot express: per-field tfs and lengths fold into weighted
# tf' = W*tf_title + tf_body and dl' = W*len_title + len_body, and the
# standard BM25 formula runs on (tf', dl', avgdl') — so an index built
# over weighted postings would serve this with the unmodified engine.
# Position semantics match the positional tier: 1-based ordinal over ALL
# alnum runs (a >15-char dropped run still occupies its position).

BM25F_TERMS = ("data", "join", "merge")
BM25F_TITLE_LEN = 8
BM25F_W_TITLE = 3


def bm25f_df(source: "str | rd.Dataset") -> rd.Dataset:
    """All docs matching any of ``BM25F_TERMS`` with their field-boosted
    BM25F score (columns ``doc_id, score`` — all-matches, tie-proof).

    Shape (100 TB): pass 1 streams ONE tiny stats row per batch
    (n_docs, sum of weighted dl, per-term weighted df) into a driver
    aggregate; pass 2 re-tokenizes per batch and emits scored matches
    with the global constants broadcast in the closure.  Documents never
    span batches, so both passes are exact with ZERO shuffles."""
    from ..functions.rounding import round_half_away
    from ..functions.tokenize import tokenize_with_positions
    from ray.data.aggregate import Sum

    ds = _docs(source)
    q = list(BM25F_TERMS)
    n_q = len(q)
    qarr = pa.array(q, pa.string())

    def _weighted(batch: pa.Table):
        """(uniq_docs, weighted dl per doc, weighted tf matrix nd x n_q)."""
        terms, tdocs, pos = tokenize_with_positions(
            batch["text"], batch["doc_id"].to_numpy(zero_copy_only=False)
        )
        if len(tdocs) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty((0, n_q), np.int64))
        uniq, drow = np.unique(tdocs, return_inverse=True)
        nd = len(uniq)
        w = np.where(pos <= BM25F_TITLE_LEN, BM25F_W_TITLE, 1).astype(np.int64)
        dlf = np.bincount(drow, weights=w, minlength=nd).astype(np.int64)
        tid = pc.index_in(terms, value_set=qarr).fill_null(-1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sel = tid >= 0
        tf = np.bincount(
            drow[sel] * n_q + tid[sel], weights=w[sel], minlength=nd * n_q
        ).astype(np.int64).reshape(nd, n_q)
        return uniq, dlf, tf

    def stats_partial(batch: pa.Table) -> pa.Table:
        _u, dlf, tf = _weighted(batch)
        row = {
            "n_docs": [batch.num_rows],
            "sum_dlf": [int(dlf.sum())],
        }
        dfs = (tf > 0).sum(axis=0)
        for j in range(n_q):
            row[f"df{j}"] = [int(dfs[j])]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in row.items()})

    agg = ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_docs", alias_name="n"),
        Sum("sum_dlf", alias_name="sumdl"),
        *[Sum(f"df{j}", alias_name=f"df{j}") for j in range(n_q)],
    )
    n = float(agg["n"] or 0)
    sumdl = float(agg["sumdl"] or 0)
    empty = pa.schema([("doc_id", pa.int64()), ("score", pa.float64())])
    if n == 0 or sumdl == 0:
        return rd.from_arrow(empty.empty_table())
    avgdl = sumdl / n
    idf = np.array(
        [
            np.log2((n - float(agg[f"df{j}"] or 0) + 0.5)
                    / (float(agg[f"df{j}"] or 0) + 0.5))
            for j in range(n_q)
        ],
        np.float64,
    )
    live = [j for j in range(n_q) if (agg[f"df{j}"] or 0) > 0]

    def score_partial(batch: pa.Table) -> pa.Table:
        uniq, dlf, tf = _weighted(batch)
        if len(uniq) == 0:
            return empty.empty_table()
        cand = tf.sum(axis=1) > 0
        if not cand.any():
            return empty.empty_table()
        dlfc = dlf[cand].astype(np.float64)
        den_norm = 1.2 * (0.25 + 0.75 * dlfc / avgdl)
        score = np.zeros(int(cand.sum()), np.float64)
        for j in live:  # fixed term order; same mult order as the SQL
            tfj = tf[cand, j].astype(np.float64)
            contrib = (idf[j] * 2.2) * tfj / (den_norm + tfj)
            score += np.where(tfj > 0, contrib, 0.0)
        return pa.table(
            {
                "doc_id": pa.array(uniq[cand], pa.int64()),
                "score": pa.array(round_half_away(score, 6), pa.float64()),
            }
        )

    return ds.map_batches(score_partial, batch_format="pyarrow",
                          zero_copy_batch=True)


def sql_bm25f() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25F_TERMS)
    return f"""
WITH tokp AS (
    SELECT doc_id, unnest(tokens2) AS term,
           unnest(range(1, len(tokens2) + 1))::BIGINT AS pos
    FROM (
        SELECT doc_id,
               CASE WHEN ends_alnum
                    THEN tokens[1:len(tokens)-1] ELSE tokens END AS tokens2
        FROM (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS tokens,
                   regexp_matches(text, '[A-Za-z0-9]$') AS ends_alnum
            FROM documents
        )
    )
),
wtok AS (
    SELECT doc_id, term,
           (CASE WHEN pos <= {BM25F_TITLE_LEN}
                 THEN {BM25F_W_TITLE} ELSE 1 END)::BIGINT AS w
    FROM tokp WHERE length(term) BETWEEN 1 AND 15
),
dl AS (SELECT doc_id, sum(w)::DOUBLE AS dlf FROM wtok GROUP BY 1),
st AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
           (SELECT coalesce(sum(w), 0) FROM wtok)::DOUBLE AS sumdl
),
qt(term) AS (VALUES {terms}),
tf AS (
    SELECT doc_id, term, sum(w)::DOUBLE AS tff
    FROM wtok JOIN qt USING (term) GROUP BY 1, 2
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
scores AS (
    SELECT tf.doc_id,
           sum(log2((st.n - df.df + 0.5) / (df.df + 0.5)) * 2.2 * tf.tff
               / (1.2 * (0.25 + 0.75 * dl.dlf / (st.sumdl / st.n)) + tf.tff)
              ) AS raw
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
    GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, 6) AS score FROM scores
"""


# --------------------------------------------------------------------------
# Query clarity score (Cronen-Townsend, Zhou & Croft, SIGIR 2002) — the
# classic query-performance predictor: KL divergence between the language
# model of the retrieved set and the corpus LM.  Retrieved set = the
# ql_dirichlet top-QL_TOP_K docs (same probe terms, same tokenizer), so
# the whole chain is deterministic and integer:
#
#   clarity_fp = sum_w cnt_R(w) * ((L'(cnt_R(w) * C) - L'(T_R * cf(w))) // 1e6)
#
# with cnt_R(w) the term count inside the retrieved set, T_R its token
# total, cf(w) the corpus count, C the corpus token total and L' the
# shifted fixed-point log2 — i.e. T_R * KL(P_R || P_C) in millionths of a
# bit, exactly computable on both engines.  High clarity = the retrieved
# set's vocabulary is far from the corpus background = an easy query.


def query_clarity_df(source: "str | rd.Dataset") -> pd.DataFrame:
    """One row: ``n_rel_docs, vocab_r, tot_r, clarity_fp`` (all int64).

    Shape (100 TB): the ql_dirichlet passes, then one pass collecting
    the retrieved set's term counts (broadcast of <= QL_TOP_K doc ids;
    partials are bounded by the retrieved set's vocabulary) and corpus
    counts for exactly those terms (second bounded partial per batch),
    combined on the driver."""
    from .textpipe import _log2_fp_ext

    ds = _docs(source)
    top = ql_dirichlet_df(ds)
    cols = ["n_rel_docs", "vocab_r", "tot_r", "clarity_fp"]
    if not len(top):
        return pd.DataFrame(columns=cols).astype("int64")
    rel_ids = set(int(d) for d in top["doc_id"])

    def r_counts(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, list(rel_ids))
        empty = pa.table({"term": pa.array([], pa.utf8()),
                          "cnt": pa.array([], pa.int64())})
        if not keep.any():
            return empty
        sub = batch.filter(pa.array(keep))
        toks, _td, _ri, _h1, _h2 = _batch_tokens(sub)
        tv = toks.to_numpy(zero_copy_only=False)
        if not len(tv):
            return empty
        ut, uc = np.unique(tv, return_counts=True)
        return pa.table({"term": pa.array(ut, pa.utf8()),
                         "cnt": pa.array(uc.astype(np.int64), pa.int64())})

    rc = (
        ds.map_batches(r_counts, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    if not len(rc):
        return pd.DataFrame(columns=cols).astype("int64")
    rterm = rc.groupby("term")["cnt"].sum()
    r_vocab = sorted(rterm.index)
    tot_r = int(rterm.sum())

    def c_counts(batch: pa.Table) -> pa.Table:
        toks, _td, _ri, _h1, _h2 = _batch_tokens(batch)
        tv = toks.to_numpy(zero_copy_only=False)
        terms, counts = ["\x00total"], [len(tv)]
        if len(tv):
            mask = np.isin(tv, r_vocab)
            ut, uc = np.unique(tv[mask], return_counts=True)
            terms += list(ut)
            counts += [int(x) for x in uc]
        return pa.table({"term": pa.array(terms, pa.string()),
                         "cnt": pa.array(counts, pa.int64())})

    cc = (
        ds.map_batches(c_counts, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    cagg = cc.groupby("term")["cnt"].sum()
    c_tot = int(cagg.get("\x00total", 0))
    cnt_r = np.array([int(rterm[t]) for t in r_vocab], np.int64)
    cf = np.array([int(cagg[t]) for t in r_vocab], np.int64)
    if int(cnt_r.max()) * c_tot >= 2**63 or tot_r * int(cf.max()) >= 2**63:
        # the HUGEINT SQL oracle is immune; widen to object ints here if a
        # corpus ever exceeds ~10^15 tokens x top-set counts
        raise ValueError("query_clarity: int64 domain exceeded")
    l_num = _log2_fp_ext(cnt_r * c_tot)
    l_den = _log2_fp_ext(tot_r * cf)
    # >> not //: negative per-term KL contributions must floor identically
    # on both engines (DuckDB // truncates; >> floors like numpy)
    clarity = int(np.sum(cnt_r * ((l_num - l_den) >> 20)))
    return pd.DataFrame(
        [{
            "n_rel_docs": len(rel_ids),
            "vocab_r": len(r_vocab),
            "tot_r": tot_r,
            "clarity_fp": clarity,
        }]
    ).astype("int64")


def sql_query_clarity() -> str:
    lfp = (
        "CAST(round(log2({k} >> greatest(length(bin({k}))::BIGINT - 16, 0))"
        " * 1000000000) AS BIGINT)"
        " + greatest(length(bin({k}))::BIGINT - 16, 0) * 1000000000"
    )
    return f"""
WITH topd AS MATERIALIZED (
    SELECT doc_id FROM ({sql_ql_dirichlet()})
),
filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM filt),
tot AS (SELECT count(*)::BIGINT AS c FROM tok),
rterm AS (
    SELECT term, count(*)::BIGINT AS cnt
    FROM tok JOIN topd USING (doc_id) GROUP BY 1
),
totr AS (SELECT sum(cnt)::BIGINT AS t FROM rterm),
cf AS (
    SELECT t.term, count(*)::BIGINT AS cf
    FROM tok t JOIN (SELECT DISTINCT term FROM rterm) r USING (term)
    GROUP BY 1
)
SELECT (SELECT count(*) FROM topd)::BIGINT AS n_rel_docs,
       count(*)::BIGINT AS vocab_r,
       any_value(totr.t) AS tot_r,
       sum(r.cnt * ((({lfp.format(k="(r.cnt * tot.c)")})
                     - ({lfp.format(k="(totr.t * cf.cf)")})) >> 20)
          )::BIGINT AS clarity_fp
FROM rterm r JOIN cf USING (term) CROSS JOIN totr CROSS JOIN tot
HAVING count(*) > 0
"""
