"""Multinomial Naive Bayes language classifier — the supervised-ML
training representative of the catalog: a model is FIT distributedly on
a deterministic train split, then APPLIED to the held-out split, and
the confusion matrix is SQL-paired hash-exact.

Split: ``doc_id % NB_SPLIT_MOD == NB_TEST_REM`` is test, the rest is
train (deterministic, no RNG).  Model, add-one smoothed::

    score(d, l) = Lx(n_docs_l) - Lx(n_train)              (log prior)
                + sum_t tf_{d,t} * Lx(c_{t,l} + 1)        (likelihood)
                - dl_d * Lx(c_l + V)                      (normalizer)

with Lx the deterministic fixed-point log2 over any positive int64
(textpipe._log2_fp_ext: shift into the exhaustively-verified [1, 2^16)
table first — bit-identical in DuckDB as ``round(log2(k >> s)*1e9) +
s*1e9``).  Every score is an exact int64, so the argmax (ties -> lang
asc) and the confusion matrix are engine-independent.  A term unseen in
a language contributes ``tf * Lx(0 + 1) = 0``, so the scoring pass only
needs the TRAINED vocabulary — out-of-vocabulary tokens are free.

Overflow guard: ``|score| <= dl * max(Lx) < 2^26 * 64e9 < 2^62`` —
enforced by raising when any test doc exceeds ``NB_MAX_DOC_TOKENS``
tokens (the same 2^26 class bound as textpipe's LLR).

Shape (100 TB): model fit is per-batch Arrow ``group_by`` (lang, term)
partials (docs never span batches) -> ONE term-hash-sharded exchange
(`dedup._sharded_groupby`) -> a (vocab x n_langs) integer weight
matrix broadcast once via ``ray.put`` (loudly bounded by
``NB_BROADCAST_LIMIT`` rows — a production-size vocabulary fits: the
matrix is 8 bytes x langs per term); scoring is one streaming
``map_batches`` over the test split emitting fixed-size confusion
partials.  Nothing unbounded ever reaches the driver.

Reference anchor: the reference engine has no ML tier; this extends
the catalog's text-analysis family (textpipe.LangId is the heuristic
counterpart; this is the trained counterpart).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

NB_SPLIT_MOD = 5
NB_TEST_REM = 4
NB_MAX_DOC_TOKENS = 1 << 26
NB_BROADCAST_LIMIT = 5_000_000  # vocab rows; same bound class as clean.py


def _docs_ds(source: str | rd.Dataset) -> rd.Dataset:
    from ..sources.util import read_parquet_sized

    if isinstance(source, rd.Dataset):
        return source
    path = (
        os.path.join(source, "documents.parquet")
        if os.path.isdir(source)
        else source
    )
    return read_parquet_sized(path, columns=["doc_id", "text", "lang"])


def _lx(k: np.ndarray) -> np.ndarray:
    from .textpipe import _log2_fp_ext

    return _log2_fp_ext(np.asarray(k, np.int64))


def nb_lang_confusion_df(source: str | rd.Dataset) -> pd.DataFrame:
    """``lang_true, lang_pred, n_docs`` over the held-out split (lang
    classes = languages present in the train split)."""
    from .curation import _batch_tokens
    from .dedup import _sharded_groupby

    docs = _docs_ds(source)
    out_cols = ["lang_true", "lang_pred", "n_docs"]
    empty = pd.DataFrame(
        {
            "lang_true": pd.Series([], dtype=object),
            "lang_pred": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype="int64"),
        }
    )[out_cols]

    is_test = f"doc_id % {NB_SPLIT_MOD} == {NB_TEST_REM}"

    def split(t: pa.Table, *, test: bool) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (did % NB_SPLIT_MOD) == NB_TEST_REM
        return t.filter(pa.array(m if test else ~m))

    train = docs.map_batches(
        lambda t: split(t, test=False),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    test = docs.map_batches(
        lambda t: split(t, test=True),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # ---- fit: (lang, term) token counts + per-lang doc counts --------
    def fit_partial(t: pa.Table) -> pa.Table:
        toks, token_doc, row_idx, h1, _h2 = _batch_tokens(t)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        if not len(toks):
            return pa.table(
                {
                    "th": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.utf8()),
                    "term": pa.array([], pa.utf8()),
                    "c": pa.array([], pa.int64()),
                }
            )
        g = pa.table(
            {
                "th": pa.array(h1.view(np.int64), pa.int64()),
                "lang": pa.array(langs[row_idx], pa.utf8()),
                "term": toks,
            }
        ).group_by(["th", "lang", "term"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "th": g["th"],
                "lang": g["lang"],
                "term": g["term"],
                "c": g["count_all"].cast(pa.int64()),
            }
        )

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["lang", "term"], as_index=False)["c"].sum()
        s["c"] = s["c"].astype("int64")
        return s[["lang", "term", "c"]]

    cschema = pa.schema(
        [("lang", pa.utf8()), ("term", pa.utf8()), ("c", pa.int64())]
    )
    counts = _sharded_groupby(
        train.map_batches(
            fit_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["th"],
        merge_counts,
        empty_schema=cschema,
    )
    if counts.count() > NB_BROADCAST_LIMIT:
        raise RuntimeError(
            f"nb_lang_classify: trained (lang, term) table exceeds the "
            f"{NB_BROADCAST_LIMIT}-row broadcast bound — shard the model "
            "or cap the vocabulary before broadcasting"
        )
    ctab = counts.to_pandas()

    # per-lang doc counts (the prior): per-batch partials, bounded by
    # n_langs — never the raw lang column on the driver
    def lang_partial(t: pa.Table) -> pa.Table:
        g = t.select(["lang"]).group_by(["lang"]).aggregate([([], "count_all")])
        return pa.table(
            {"lang": g["lang"], "nd": g["count_all"].cast(pa.int64())}
        )

    ndl_parts = train.map_batches(
        lang_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    ndl = (
        ndl_parts.groupby("lang")["nd"].sum().astype("int64")
        if len(ndl_parts)
        else pd.Series([], dtype="int64")
    )
    if not len(ndl):
        return empty
    langs = sorted(ndl.index.tolist())
    n_langs = len(langs)
    n_train = int(ndl.sum())

    if len(ctab):
        vocab = np.sort(ctab["term"].unique().astype(object))
    else:
        vocab = np.array([], dtype=object)
    v_sz = int(len(vocab))
    # weight matrix W[t, l] = Lx(c_{t,l} + 1); lang constant
    # K[l] = Lx(n_docs_l) - Lx(n_train) ... - dl * Lx(c_l + V) at score
    w_mat = np.zeros((v_sz, n_langs), np.int64)
    c_l = np.zeros(n_langs, np.int64)
    lidx = {l: i for i, l in enumerate(langs)}
    if len(ctab):
        ti = np.searchsorted(vocab, ctab["term"].to_numpy(dtype=object))
        li = np.array([lidx[x] for x in ctab["lang"]], np.int64)
        cc = ctab["c"].to_numpy().astype(np.int64)
        w_mat[ti, li] = _lx(cc + 1)
        np.add.at(c_l, li, cc)
    prior = _lx(ndl.reindex(langs).to_numpy()) - int(_lx(np.array([n_train]))[0])
    norm = _lx(c_l + v_sz)  # Lx(c_l + V) per lang
    model_ref = ray.put((vocab, w_mat, prior.astype(np.int64), norm))

    # ---- score the held-out split, emit confusion partials -----------
    lang_arr = np.array(langs, dtype=object)

    def score_partial(t: pa.Table) -> pa.Table:
        voc, w, pri, nrm = ray.get(model_ref)
        toks, token_doc, _r, _h1, _h2 = _batch_tokens(t)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(did)
        scores = np.tile(pri, (n, 1)).astype(np.int64)
        dl = np.zeros(n, np.int64)
        if len(toks):
            # per-doc tf over IN-VOCAB tokens only (OOV contributes 0)
            tt = toks.to_numpy(zero_copy_only=False).astype(object)
            pos = np.searchsorted(voc, tt) if len(voc) else np.zeros(0, np.int64)
            pos = np.minimum(pos, max(len(voc) - 1, 0))
            hit = len(voc) > 0 and voc[pos] == tt
            order = np.argsort(did, kind="stable")
            rows = order[np.searchsorted(did[order], token_doc)]
            np.add.at(dl, rows, 1)  # dl counts ALL kept tokens
            if np.any(hit):
                np.add.at(scores, rows[hit], w[pos[hit]])
        if int(dl.max(initial=0)) >= NB_MAX_DOC_TOKENS:
            raise ValueError(
                f"nb_lang_classify: document exceeds {NB_MAX_DOC_TOKENS} "
                "tokens — int64 score bound would not hold"
            )
        scores -= dl[:, None] * nrm[None, :]
        pred = lang_arr[np.argmax(scores, axis=1)]  # ties -> first = lang asc
        truth = t["lang"].to_numpy(zero_copy_only=False).astype(object)
        g = pd.DataFrame({"lang_true": truth, "lang_pred": pred}).groupby(
            ["lang_true", "lang_pred"], as_index=False
        ).size()
        return pa.table(
            {
                "lang_true": pa.array(g["lang_true"], pa.utf8()),
                "lang_pred": pa.array(g["lang_pred"], pa.utf8()),
                "n_docs": pa.array(g["size"].astype("int64"), pa.int64()),
            }
        )

    parts = test.map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(parts):
        return empty
    out = parts.groupby(["lang_true", "lang_pred"], as_index=False)[
        "n_docs"
    ].sum()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["lang_true", "lang_pred"]).reset_index(drop=True)[
        out_cols
    ]


def _sql_lx_col(e: str) -> str:
    """Inline Lx(e) for a positive BIGINT column expression (must be a
    bare column reference — it is repeated)."""
    s = f"greatest(length(bin({e}))::BIGINT - 16, 0)"
    return (
        f"(CASE WHEN {e} <= 1 THEN 0 ELSE "
        f"CAST(round(log2({e} >> {s}) * 1000000000) AS BIGINT) "
        f"+ {s} * 1000000000 END)"
    )


def sql_nb_lang_confusion() -> str:
    return f"""
WITH filt AS (
    SELECT doc_id, lang,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM documents
),
tr AS (SELECT * FROM filt WHERE doc_id % {NB_SPLIT_MOD} != {NB_TEST_REM}),
te AS (SELECT * FROM filt WHERE doc_id % {NB_SPLIT_MOD} = {NB_TEST_REM}),
trtok AS (SELECT doc_id, lang, unnest(toks) AS term FROM tr),
ctl AS (SELECT lang, term, count(*)::BIGINT AS c FROM trtok GROUP BY 1, 2),
cl AS (
    SELECT n.lang, coalesce(sum(ctl.c), 0)::BIGINT AS ctot
    FROM (SELECT DISTINCT lang FROM tr) n
    LEFT JOIN ctl ON ctl.lang = n.lang
    GROUP BY 1
),
vv AS (SELECT count(DISTINCT term)::BIGINT AS v FROM trtok),
nl AS (SELECT lang, count(*)::BIGINT AS nd FROM tr GROUP BY 1),
ntr AS (SELECT count(*)::BIGINT AS n FROM tr),
tetok AS (
    SELECT doc_id, unnest(toks) AS term FROM te
),
tetf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM tetok GROUP BY 1, 2
),
dl AS (
    SELECT te.doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS dl
    FROM te LEFT JOIN tetf tf USING (doc_id)
    GROUP BY 1
),
wrows AS (
    SELECT lang, term, c + 1 AS c1 FROM ctl
),
contrib AS (
    SELECT tf.doc_id, w.lang,
           sum(tf.tf * {_sql_lx_col('w.c1')})::BIGINT AS s
    FROM tetf tf JOIN wrows w ON w.term = tf.term
    GROUP BY 1, 2
),
lconst AS (
    SELECT nl.lang,
           ({_sql_lx_col('nl.nd')}
            - (SELECT {_sql_lx_col('n')} FROM ntr))::BIGINT AS prior,
           (SELECT {_sql_lx_col('q.k')}
            FROM (SELECT cl.ctot + (SELECT v FROM vv) AS k) q
           )::BIGINT AS nrm
    FROM nl JOIN cl ON cl.lang = nl.lang
),
score AS (
    SELECT d.doc_id, lc.lang,
           (lc.prior + coalesce(co.s, 0) - d.dl * lc.nrm)::BIGINT AS sc
    FROM dl d CROSS JOIN lconst lc
    LEFT JOIN contrib co ON co.doc_id = d.doc_id AND co.lang = lc.lang
),
pred AS (
    SELECT doc_id, lang AS lang_pred
    FROM (
        SELECT *, row_number()
                  OVER (PARTITION BY doc_id ORDER BY sc DESC, lang) AS rn
        FROM score
    )
    WHERE rn = 1
)
SELECT te.lang AS lang_true, p.lang_pred, count(*)::BIGINT AS n_docs
FROM te JOIN pred p USING (doc_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Decision stump (depth-1 CART split) — the simplest trained classifier
# family member: find the l_quantity threshold that best separates
# returned (l_returnflag = 'R') lineitems by weighted Gini impurity.
# With integer class counts, the side impurity n_s - (pos^2 + neg^2)/n_s
# is quantized as score_s = floor((n_s^2 - pos_s^2 - neg_s^2) * SCALE /
# n_s); minimizing score_left + score_right over thresholds is exactly
# minimizing weighted Gini up to the quantization, and the rank key is
# pure int (score asc, threshold asc).  Positive operands: DuckDB's
# truncating // == floor.

STUMP_SCALE = 10**6
STUMP_TOP_K = 5


def decision_stump(lineitem: rd.Dataset) -> "pd.DataFrame":
    """Top-``STUMP_TOP_K`` split thresholds t (predicting on
    ``l_quantity <= t``) by ascending quantized weighted-Gini score.
    Columns: threshold, n_left, pos_left, n_right, pos_right, score.

    Shape (100 TB): one streaming pass of per-batch (quantity, label)
    Arrow group_by partials; only the <=2*|distinct quantities| partial
    rows reach the driver (l_quantity is a bounded integer grid)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        q = pc.cast(batch["l_quantity"], pa.int64())
        is_r = pc.cast(pc.equal(batch["l_returnflag"], "R"), pa.int64())
        t = pa.table({"q": q, "pos": is_r})
        g = t.group_by("q").aggregate([("pos", "sum"), ("pos", "count")])
        return pa.table(
            {
                "q": g["q"],
                "pos": pc.cast(g["pos_sum"], pa.int64()),
                "n": pc.cast(g["pos_count"], pa.int64()),
            }
        )

    parts = lineitem.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cols = ["threshold", "n_left", "pos_left", "n_right", "pos_right",
            "score"]
    if not len(parts):
        return pd.DataFrame(columns=cols).astype(
            {k: "int64" for k in cols}
        )
    agg = parts.groupby("q", as_index=False)[["pos", "n"]].sum()
    agg = agg.sort_values("q").reset_index(drop=True)
    qv = agg["q"].to_numpy(np.int64)
    cpos = np.cumsum(agg["pos"].to_numpy(np.int64).astype(object))
    cn = np.cumsum(agg["n"].to_numpy(np.int64).astype(object))
    n_tot, pos_tot = int(cn[-1]), int(cpos[-1])
    rows = []
    for i in range(len(qv) - 1):  # splitting after the max leaves no right
        nl, pl = int(cn[i]), int(cpos[i])
        nr, pr = n_tot - nl, pos_tot - pl
        score = (
            (nl * nl - pl * pl - (nl - pl) ** 2) * STUMP_SCALE
        ) // nl + ((nr * nr - pr * pr - (nr - pr) ** 2) * STUMP_SCALE) // nr
        rows.append((int(qv[i]), nl, pl, nr, pr, score))
    rows.sort(key=lambda r: (r[5], r[0]))
    rows = rows[:STUMP_TOP_K]
    if rows and max(r[5] for r in rows) >= 2**63:
        raise ValueError("decision_stump: score exceeds int64")
    return pd.DataFrame(rows, columns=cols).astype(
        {k: "int64" for k in cols}
    )


SQL_DECISION_STUMP = f"""
WITH cnt AS (
    SELECT l_quantity::BIGINT AS q,
           sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::HUGEINT
               AS pos,
           count(*)::HUGEINT AS n
    FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(pos) AS pos_tot, sum(n) AS n_tot,
               max(q) AS q_max FROM cnt),
cum AS (
    SELECT q, sum(pos) OVER (ORDER BY q) AS pl,
           sum(n) OVER (ORDER BY q) AS nl
    FROM cnt
),
sc AS (
    SELECT c.q AS threshold, c.nl, c.pl,
           t.n_tot - c.nl AS nr, t.pos_tot - c.pl AS pr
    FROM cum c, tot t WHERE c.q < t.q_max
)
SELECT threshold::BIGINT AS threshold,
       nl::BIGINT AS n_left, pl::BIGINT AS pos_left,
       nr::BIGINT AS n_right, pr::BIGINT AS pos_right,
       (((nl*nl - pl*pl - (nl-pl)*(nl-pl)) * {STUMP_SCALE}) // nl
        + ((nr*nr - pr*pr - (nr-pr)*(nr-pr)) * {STUMP_SCALE}) // nr
       )::BIGINT AS score
FROM sc
ORDER BY score ASC, threshold ASC
LIMIT {STUMP_TOP_K}
"""
