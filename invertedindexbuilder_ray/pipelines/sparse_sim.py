"""Sparse tf-idf document similarity ("more like this") over the inverted
postings — the term-partitioned pairwise-similarity shape (cf. Elsayed et
al. 2008, "Pairwise document similarity in large collections with
MapReduce"), re-expressed as two Ray Data exchanges.

Query docs are selected by a deterministic predicate (``doc_id %
query_mod == 0``) so the oracle SQL can reproduce the selection; each
query doc gets its global top-``k`` most-cosine-similar documents over
integer-quantized tf-idf vectors.

Exactness contract (the house fixed-point-table pattern, see
``curation._log2_fp``): idf is quantized to an INTEGER per term first —
``idf_q = round((L(N) - L(df)) / 1e6)`` with ``L(k) = round(log2(k)*1e9)``
(the exhaustively-verified table; both N and df must stay < 2^16, enforced
loudly) — so every weight ``w = tf * idf_q``, dot product and squared norm
is an exact int64 on both engines, order-independent under summation.
Floats appear only in the final ``sim = round(dot / sqrt(nq2*nd2), 6)``
where every operand is an exact int64 → the double conversion, multiply,
sqrt, divide and half-away round are IEEE-deterministic and identical in
DuckDB.

Shape (100 TB): exchange 1 shards postings by term-hash — df, idf and all
dot-product partial contributions for a term are computed entirely inside
its shard (a query doc's postings for term t co-locate with every other
doc's postings for t, so no broadcast of anything vocabulary-sized is ever
needed); exchange 2 shards the (doc, qid, val) partials by doc so each
doc's norm meets its dot rows in one place.  The final per-query top-k
uses the per-batch partial-top-k pattern under the identical total order
(sim desc, doc_id asc) + a low-cardinality (Q groups) Ray groupby.  The
per-query candidate count is bounded by the summed df of the query's
terms — the same inherent cost as an exhaustive disjunctive BM25 query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import term_hash
from ..functions.rounding import round_half_away
from .curation import _log2_fp
from .dedup import _sharded_groupby

MLT_QUERY_MOD = 83
MLT_TOP_K = 10
# idf_q = round((L(N)-L(df))/IDF_DOWNSCALE): at N < 2^16 this caps idf_q at
# ~16000, so w = tf*idf_q stays far inside int64 for any realistic tf.
IDF_DOWNSCALE = 1_000_000
_MAX_COUNT = 1 << 16  # _log2_fp verified domain; tf shares the bound


def more_like_this(
    postings: rd.Dataset,
    n_docs: int,
    *,
    query_mod: int = MLT_QUERY_MOD,
    top_k: int = MLT_TOP_K,
) -> rd.Dataset:
    """Top-``k`` cosine-similar docs per query doc (``doc_id % query_mod
    == 0``) over integer tf-idf vectors.  ``postings`` must have columns
    ``term, doc_id, tf`` (the ``catalog._postings_ds`` contract).
    Returns columns ``qid, doc_id, sim, rank``."""
    if n_docs >= _MAX_COUNT:
        raise ValueError(
            f"more_like_this: n_docs {n_docs} >= {_MAX_COUNT} exceeds the "
            "verified fixed-point log2 domain (curation._log2_fp)"
        )
    lf_n = int(_log2_fp(np.array([n_docs], dtype=np.int64))[0])

    def add_shard_key(t: pa.Table) -> pa.Table:
        th = term_hash(t["term"].combine_chunks()).view(np.int64)
        return t.append_column("th", pa.array(th, pa.int64()))

    def term_shard_agg(g: pd.DataFrame) -> pd.DataFrame:
        # all postings of a term co-locate here: df is an in-shard count
        tf = g["tf"].to_numpy()
        if len(tf) and int(tf.max()) >= _MAX_COUNT:
            raise ValueError(
                f"more_like_this: tf {int(tf.max())} >= {_MAX_COUNT} "
                "exceeds the int64-exactness envelope"
            )
        codes, uniq = pd.factorize(g["term"], sort=False)
        df = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        idf_q = round_half_away(
            (lf_n - _log2_fp(df)).astype(np.float64) / IDF_DOWNSCALE, 0
        ).astype(np.int64)
        w = tf.astype(np.int64) * idf_q[codes]
        doc = g["doc_id"].to_numpy().astype(np.int64)
        # norm^2 partials (qid = -1 marks them through exchange 2)
        nrm = pd.DataFrame({"doc_id": doc, "qid": np.int64(-1), "val": w * w})
        nrm = nrm.groupby(["doc_id", "qid"], as_index=False)["val"].sum()
        # dot partials: query-doc postings x same-term postings, via a
        # vectorized segment cartesian product (repeat/cumsum gather — the
        # band_join explode shape) instead of a pandas hash join: the
        # join key is the term code, whose runs we already know
        qsel = np.flatnonzero(doc % query_mod == 0)
        if len(qsel):
            ordd = np.argsort(codes, kind="stable")
            cnt_d = np.bincount(codes, minlength=len(uniq))
            start_d = np.concatenate(([0], np.cumsum(cnt_d)[:-1]))
            qcodes = codes[qsel]
            rep = cnt_d[qcodes]
            total = int(rep.sum())
            if total:
                q_rep = np.repeat(qsel, rep)
                offs = np.concatenate(([0], np.cumsum(rep)[:-1]))
                within = np.arange(total, dtype=np.int64) - np.repeat(offs, rep)
                d_rows = ordd[np.repeat(start_d[qcodes], rep) + within]
                mask = doc[d_rows] != doc[q_rep]
                dd, qq = doc[d_rows][mask], doc[q_rep][mask]
                val = w[q_rep][mask] * w[d_rows][mask]
                # composite int key: qid slots are few, so pair ids pack
                # into one int64 for a single-key C-speed exact groupby
                uq, qpos = np.unique(qq, return_inverse=True)
                dfac, _duniq = pd.factorize(dd, sort=False)
                key = dfac.astype(np.int64) * len(uq) + qpos
                s = pd.DataFrame({"key": key, "val": val}).groupby(
                    "key", as_index=False, sort=False
                )["val"].sum()
                k = s["key"].to_numpy()
                dots = pd.DataFrame(
                    {
                        "doc_id": _duniq[k // len(uq)],
                        "qid": uq[k % len(uq)],
                        "val": s["val"].to_numpy(),
                    }
                )
                nrm = pd.concat([nrm, dots], ignore_index=True)
        return nrm

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("qid", pa.int64()), ("val", pa.int64())]
    )
    partials = _sharded_groupby(
        postings.map_batches(
            add_shard_key, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["th"],
        term_shard_agg,
        empty_schema=part_schema,
    )

    def doc_shard_agg(g: pd.DataFrame) -> pd.DataFrame:
        # a doc's norm partials and dot partials meet here
        s = g.groupby(["doc_id", "qid"], as_index=False)["val"].sum()
        norms = s[s["qid"] == -1].set_index("doc_id")["val"]
        dots = s[s["qid"] >= 0].rename(columns={"val": "dot"})
        dots = dots.assign(
            norm2=dots["doc_id"].map(norms).fillna(0).astype(np.int64)
        )
        # query docs' own norms ride along for the driver-side tiny lookup
        qn = norms[norms.index % query_mod == 0]
        qrows = pd.DataFrame(
            {
                "doc_id": qn.index.to_numpy(np.int64),
                "qid": np.int64(-1),
                "dot": np.int64(0),
                "norm2": qn.to_numpy(np.int64),
            }
        )
        return pd.concat(
            [dots[["doc_id", "qid", "dot", "norm2"]], qrows], ignore_index=True
        )

    agg_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("qid", pa.int64()),
            ("dot", pa.int64()),
            ("norm2", pa.int64()),
        ]
    )
    agg = _sharded_groupby(
        partials, ["doc_id"], doc_shard_agg, empty_schema=agg_schema
    )
    # the REDUCED candidate set (one row per (doc, qid) + Q norm rows) is
    # consumed twice (query-norm take + sim pass); materialize it so the
    # tokenize/exchange lineage doesn't execute twice.  This is bounded —
    # never the corpus.
    agg = agg.materialize()

    # Q query norms: a tiny filtered take, never the candidate set
    qnorm = {
        r["doc_id"]: r["norm2"]
        for r in agg.filter(expr="qid == -1").take_all()
    }

    def sim_topk(batch: pa.Table) -> pa.Table:
        qid = batch["qid"].to_numpy(zero_copy_only=False)
        keep = qid >= 0
        qid = qid[keep]
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        dot = batch["dot"].to_numpy(zero_copy_only=False)[keep]
        nd2 = batch["norm2"].to_numpy(zero_copy_only=False)[keep]
        nq2 = np.array([qnorm.get(q, 0) for q in qid], dtype=np.int64)
        ok = (nd2 > 0) & (nq2 > 0)
        qid, doc, dot, nd2, nq2 = qid[ok], doc[ok], dot[ok], nd2[ok], nq2[ok]
        sim = round_half_away(
            dot.astype(np.float64)
            / np.sqrt(nq2.astype(np.float64) * nd2.astype(np.float64)),
            6,
        )
        # per-batch partial top-k under the final total order (sim is the
        # exact final value, so the global top-k survives the partials)
        out_q, out_d, out_s = [], [], []
        for q in np.unique(qid):
            sel = np.flatnonzero(qid == q)
            order = np.lexsort((doc[sel], -sim[sel]))[:top_k]
            sel = sel[order]
            out_q.append(qid[sel])
            out_d.append(doc[sel])
            out_s.append(sim[sel])
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        agg.map_batches(sim_topk, batch_format="pyarrow")
        .groupby("qid")  # Q groups: low-cardinality, Ray groupby is fine
        .map_groups(final_topk, batch_format="pandas")
    )
