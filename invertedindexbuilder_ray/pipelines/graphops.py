"""Graph-structure operators over the PMI-positive term association
graph: k-core decomposition (degeneracy structure of the vocabulary)
and Adamic-Adar link prediction (which associations are "missing").

Graph definition (shared by both entries, scale-invariant): vertices
are the ``top_vocab`` most document-frequent terms; an undirected edge
(a, b) exists iff the pair is POSITIVELY associated,

    cooc(a, b) * N  >  df(a) * df(b)        (integer PMI > 0)

with cooc = #docs containing both, df = #docs containing the term and
N = total document count.  Raw co-occurrence is degenerate on dense
vocabularies (every frequent pair co-occurs somewhere, the graph goes
complete); the PMI cut is threshold-free and keeps the same semantics
at any corpus size.  The comparison runs in unbounded integers on both
engines (Python ints / HUGEINT) — at 10^10 docs df*df overflows int64.

Exactness: both ops are pure integer graph algorithms on a bounded
(V <= ``top_vocab``) driver-side matrix, so the SQL pairing is exact:
k-core is mirrored by a recursive-CTE peel (one CTE step per peel
round, loudly capped at ``KCORE_STEP_CAP`` on both sides — a peel of a
V-vertex graph needs < 2V+1 rounds); Adamic-Adar weights are the
exhaustively-verified fixed-point log2 table (curation._log2_fp —
a common neighbor always has deg >= 2, so L(deg) >= 1e9 and the
integer weight 1e12 // L(deg) is well-defined).

Shape (100 TB): the same two bounded passes as curation.pagerank_terms
— a df top-k (term-sharded partial top-k) and ONE streaming pass of
per-batch V x V boolean-matmul co-occurrence partials (docs never span
batches, so per-batch pair-presence counts sum to the global cooc
table); the graph algorithms then run on the tiny driver matrix.  No
per-pair exchange ever leaves the bounded V x V space.

Reference anchor: the reference engine has no graph tier; these extend
the catalog's bounded-vocabulary graph family (curation.pagerank_terms,
term_bfs_df, term_triangles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.rounding import round_half_away
from .curation import _batch_tokens, _log2_fp, top_vocab_df
from .textpipe import _docs

GRAPH_TOP_VOCAB = 64
KCORE_STEP_CAP = 4 * GRAPH_TOP_VOCAB
AA_TOP_K = 20
AA_SCALE = 1_000_000_000_000  # weight fixed point: w(z) = 1e12 // L(deg z)

_SQL_PMI_GRAPH = """
filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tok AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM filt),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
dfc AS (SELECT term, count(*)::BIGINT AS df FROM tok GROUP BY 1),
topv AS (SELECT term, df FROM dfc
         ORDER BY df DESC, term LIMIT {top_vocab}),
tv AS (SELECT t.doc_id, t.term FROM tok t JOIN topv USING (term)),
co AS (
    SELECT a.term AS ta, b.term AS tb, count(*)::BIGINT AS w
    FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2
),
epos AS (
    SELECT ta, tb FROM co
    JOIN topv x ON x.term = co.ta
    JOIN topv y ON y.term = co.tb
    WHERE w::HUGEINT * (SELECT n FROM nd)::HUGEINT
          > x.df::HUGEINT * y.df::HUGEINT
),
edges AS (
    SELECT ta AS src, tb AS dst FROM epos
    UNION ALL
    SELECT tb AS src, ta AS dst FROM epos
),
degs AS (
    SELECT t.term, count(e.dst)::BIGINT AS deg
    FROM topv t LEFT JOIN edges e ON e.src = t.term
    GROUP BY 1
)
"""


def pmi_graph(
    docs: rd.Dataset, *, top_vocab: int = GRAPH_TOP_VOCAB
) -> tuple[list[str], np.ndarray]:
    """(vocab_terms, symmetric 0/1 adjacency) of the PMI-positive
    association graph.  One streaming pass of bounded V x V partials:
    each batch contributes pair-presence counts AND the per-term df
    diagonal via a single boolean matmul (documents never span
    batches)."""
    cand = top_vocab_df(docs, top_vocab)
    if not len(cand):
        return [], np.zeros((0, 0), np.int64)
    vocab_terms = cand["term"].tolist()
    vocab_arr = pa.array(vocab_terms, pa.utf8())
    nv = len(vocab_terms)

    def co_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks, token_doc, *_ = _batch_tokens(batch)
        empty = pa.table(
            {
                "ia": pa.array([], pa.int64()),
                "ib": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
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
        cm = m.T @ m  # off-diag: pair doc counts; diag: per-term df
        ia, ib = np.triu_indices(nv, k=0)
        nz = cm[ia, ib] > 0
        return pa.table(
            {
                "ia": pa.array(ia[nz].astype(np.int64)),
                "ib": pa.array(ib[nz].astype(np.int64)),
                "w": pa.array(cm[ia, ib][nz].astype(np.int64)),
            }
        )

    parts = docs.map_batches(
        co_batch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n_docs = int(docs.count())
    cnt = np.zeros((nv, nv), np.int64)
    if len(parts):
        g = parts.groupby(["ia", "ib"], as_index=False)["w"].sum()
        cnt[g["ia"].to_numpy(), g["ib"].to_numpy()] = g["w"].to_numpy()
    df = np.diag(cnt).copy()
    adj = np.zeros((nv, nv), np.int64)
    iu, ivx = np.triu_indices(nv, k=1)
    for a, b in zip(iu, ivx):
        # unbounded-int compare (df*df overflows int64 at ~1e10 docs);
        # V<=64 keeps this loop <= 2016 iterations
        if int(cnt[a, b]) * n_docs > int(df[a]) * int(df[b]):
            adj[a, b] = adj[b, a] = 1
    return vocab_terms, adj


# ---------------------------------------------------------------------------
# k-core decomposition


def kcore_peel(adj: np.ndarray) -> np.ndarray:
    """Core number per vertex of a symmetric 0/1 adjacency, by the same
    round structure the SQL recursive CTE replays: one round either
    deletes every vertex with (surviving) degree < k, or increments k."""
    nv = adj.shape[0]
    core = np.zeros(nv, np.int64)
    alive = np.ones(nv, bool)
    k = 1
    steps = 0
    while alive.any():
        steps += 1
        if steps > KCORE_STEP_CAP:
            raise RuntimeError(
                f"term_kcore: peel exceeded {KCORE_STEP_CAP} rounds "
                f"(V={nv}) — impossible for a well-formed adjacency"
            )
        deg = adj[:, alive].sum(axis=1).astype(np.int64)
        dead = alive & (deg < k)
        if dead.any():
            core[dead] = k - 1
            alive &= ~dead
        else:
            k += 1
    return core


def term_kcore_df(
    source: str | rd.Dataset, *, top_vocab: int = GRAPH_TOP_VOCAB
) -> pd.DataFrame:
    """``term, deg, core`` — the k-core number of every vocabulary term
    in the PMI-positive association graph (core = largest k such that
    the term survives iterated deletion of all vertices with fewer than
    k surviving neighbors).

    The peel mirrors the SQL recursive CTE step-for-step: one round
    either deletes every vertex with deg < k (core := k-1) or, if none
    qualifies, increments k; a V-vertex peel needs < 2V+1 rounds and
    both sides raise loudly at ``KCORE_STEP_CAP``.
    """
    docs = _docs(source)
    out_cols = ["term", "deg", "core"]
    vocab_terms, adj = pmi_graph(docs, top_vocab=top_vocab)
    if not vocab_terms:
        return pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                "deg": pd.Series([], dtype="int64"),
                "core": pd.Series([], dtype="int64"),
            }
        )[out_cols]
    deg0 = adj.sum(axis=1).astype(np.int64)
    core = kcore_peel(adj)
    return pd.DataFrame(
        {"term": vocab_terms, "deg": deg0, "core": core}
    ).astype({"deg": "int64", "core": "int64"})[out_cols]


def sql_term_kcore(*, top_vocab: int = GRAPH_TOP_VOCAB) -> str:
    graph = _SQL_PMI_GRAPH.format(top_vocab=top_vocab)
    return f"""
WITH RECURSIVE {graph},
peel AS (
    SELECT 0 AS step, 1 AS k,
           coalesce((SELECT list(term ORDER BY term) FROM topv),
                    []::VARCHAR[]) AS alive
    UNION ALL
    SELECT p.step + 1,
           CASE WHEN s.ndead = 0 THEN p.k + 1 ELSE p.k END,
           CASE WHEN s.ndead = 0 THEN p.alive
                ELSE coalesce(s.survivors, []::VARCHAR[]) END
    FROM peel p, LATERAL (
        SELECT count(*) FILTER (WHERE d.deg < p.k) AS ndead,
               list(d.term ORDER BY d.term)
                   FILTER (WHERE d.deg >= p.k) AS survivors
        FROM (
            SELECT u.term AS term,
                   (SELECT count(*) FROM edges e
                     WHERE e.src = u.term
                       AND list_contains(p.alive, e.dst))::BIGINT AS deg
            FROM unnest(p.alive) AS u(term)
        ) d
    ) s
    WHERE len(p.alive) > 0 AND p.step < {KCORE_STEP_CAP}
),
trace AS (SELECT k, unnest(alive) AS term FROM peel),
core AS (SELECT term, (max(k) - 1)::BIGINT AS core FROM trace GROUP BY 1)
SELECT d.term, d.deg, c.core
FROM degs d JOIN core c USING (term)
"""


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction


def link_prediction_aa_df(
    source: str | rd.Dataset,
    *,
    top_vocab: int = GRAPH_TOP_VOCAB,
    top_k: int = AA_TOP_K,
) -> pd.DataFrame:
    """``term_a, term_b, cn, aa_fp, aa, rank`` — the ``top_k``
    non-adjacent vocabulary pairs most likely to be "missing" edges by
    Adamic-Adar score  AA(a,b) = sum over common neighbors z of
    1/log2(deg(z)), in exact fixed point: ``aa_fp = sum(1e12 //
    L(deg z))`` with L the verified integer log2 table (a common
    neighbor always has deg >= 2).  Rank key is the integer
    (aa_fp desc, term_a, term_b); ``aa = round(aa_fp/1000, 6)`` is a
    rounded payload.
    """
    docs = _docs(source)
    out_cols = ["term_a", "term_b", "cn", "aa_fp", "aa", "rank"]
    empty = pd.DataFrame(
        {
            "term_a": pd.Series([], dtype=object),
            "term_b": pd.Series([], dtype=object),
            "cn": pd.Series([], dtype="int64"),
            "aa_fp": pd.Series([], dtype="int64"),
            "aa": pd.Series([], dtype="float64"),
            "rank": pd.Series([], dtype="int64"),
        }
    )[out_cols]
    vocab_terms, adj = pmi_graph(docs, top_vocab=top_vocab)
    if not vocab_terms:
        return empty
    nv = len(vocab_terms)
    deg = adj.sum(axis=1).astype(np.int64)
    w = np.zeros(nv, np.int64)
    ge2 = deg >= 2
    if ge2.any():
        w[ge2] = AA_SCALE // _log2_fp(deg[ge2])
    s_mat = adj @ (adj * w[:, None])  # S[u,v] = sum_z adj[u,z] adj[z,v] w[z]
    cn_mat = adj @ adj
    iu, iv = np.triu_indices(nv, k=1)
    cand = (adj[iu, iv] == 0) & (cn_mat[iu, iv] > 0)
    if not cand.any():
        return empty
    ia, ib = iu[cand], iv[cand]
    ta = np.array(vocab_terms, dtype=object)[ia]
    tb = np.array(vocab_terms, dtype=object)[ib]
    # canonical pair order is lexicographic on the term STRINGS (the
    # vocab index order is df-desc, not lexicographic)
    swap = ta > tb
    ta[swap], tb[swap] = tb[swap], ta[swap]
    out = pd.DataFrame(
        {
            "term_a": ta,
            "term_b": tb,
            "cn": cn_mat[iu, iv][cand].astype(np.int64),
            "aa_fp": s_mat[iu, iv][cand].astype(np.int64),
        }
    ).sort_values(
        ["aa_fp", "term_a", "term_b"],
        ascending=[False, True, True],
        kind="mergesort",
    ).head(top_k)
    out["aa"] = round_half_away(out["aa_fp"].to_numpy() / 1000.0, 6)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.reset_index(drop=True)[out_cols]


def sql_link_prediction_aa(
    *, top_vocab: int = GRAPH_TOP_VOCAB, top_k: int = AA_TOP_K
) -> str:
    graph = _SQL_PMI_GRAPH.format(top_vocab=top_vocab)
    return f"""
WITH {graph},
cand AS (
    SELECT least(e1.src, e2.src) AS term_a,
           greatest(e1.src, e2.src) AS term_b,
           count(*)::BIGINT AS cn,
           sum({AA_SCALE} // CAST(round(log2(dz.deg) * 1000000000)
                                  AS BIGINT))::BIGINT AS aa_fp
    FROM edges e1
    JOIN edges e2 ON e1.dst = e2.dst AND e1.src < e2.src
    JOIN degs dz ON dz.term = e1.dst
    WHERE NOT EXISTS (SELECT 1 FROM edges x
                      WHERE x.src = e1.src AND x.dst = e2.src)
    GROUP BY 1, 2
)
SELECT term_a, term_b, cn, aa_fp,
       round(aa_fp / 1000.0, 6) AS aa, rk::BIGINT AS rank
FROM (
    SELECT *, row_number()
              OVER (ORDER BY aa_fp DESC, term_a, term_b) AS rk
    FROM cand
)
WHERE rk <= {top_k}
"""
