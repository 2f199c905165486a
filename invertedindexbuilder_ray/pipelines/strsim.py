"""Fuzzy string-similarity joins (record linkage tier).

``edit1_pairs``: all pairs of names within Levenshtein distance ≤ 1 via
FastSS deletion-neighborhood blocking (Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007 — public algorithm):

    dist(s, t) ≤ 1  ⇔  D(s) ∩ D(t) ≠ ∅,   D(s) = {s} ∪ {s minus one char}

so exploding each name into its ≤ L+1 deletion variants and pairing
within equal-variant buckets has GUARANTEED recall — the same
recall-guaranteed-prefilter + exact-verify shape as
``dedup.ngram_jaccard_pairs`` (prefix filter) and
``dedup.embedding_dedup_pairs`` (SRP bands).  The verify step is a
closed-form distance-≤1 test (equal / one substitution / one deletion),
fully vectorized over padded byte matrices — no DP, no Python per pair.

Scale shape: explode is ×(L+1) on 16-byte keys (linear, the banding
cost class); bucket pairing and pair dedup run through
``dedup._sharded_groupby``; only true near-pairs survive to the driver.

Names are ≤ 16 ASCII bytes so a padded (n, 16) uint8 matrix views as two
int64 key words — NUL never occurs in text, so the padded bytes encode
the string bijectively (no length column needed in the bucket key).

The synthetic corpus has no natural edit-distance-1 neighbors, so the
name table is a deterministic augmentation replicated in the SQL oracle
(CLAUDE.md rule): every 10th doc contributes its 16-char prefix, every
100th a one-substitution mutant under id+1e9.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..sources.util import read_parquet_sized

EDIT1_PICK_EVERY = 10
EDIT1_MUT_EVERY = 100
EDIT1_MUT_ID_OFFSET = 1_000_000_000
NAME_LEN = 16


def _pad16(strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(n, 16) uint8 right-NUL-padded byte matrix + length vector."""
    n = len(strings)
    mat = np.zeros((n, NAME_LEN), np.uint8)
    lens = np.zeros(n, np.int64)
    for i, s in enumerate(strings):  # construction only; verify is matrix math
        b = s.encode()[:NAME_LEN]
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return mat, lens


def _unpad(mat: np.ndarray, lens: np.ndarray) -> list[str]:
    return [
        bytes(mat[i, : lens[i]]).decode() for i in range(mat.shape[0])
    ]


def _key_words(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    w = np.ascontiguousarray(mat).view(">u8").astype(np.uint64)
    return w[:, 0].view(np.int64), w[:, 1].view(np.int64)


def dist_le1(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Vectorized Levenshtein-≤1 classifier over padded byte matrices:
    0 (equal), 1 (one substitution / one indel), 99 (farther)."""
    same_len = la == lb
    mism = (A != B).sum(1)
    d0 = same_len & (mism == 0)
    d1_sub = same_len & (mism == 1)
    swap = lb > la
    L = np.where(swap[:, None], B, A)
    S = np.where(swap[:, None], A, B)
    adj = np.abs(la - lb) == 1
    p = np.argmax(L != S, axis=1)  # first mismatch (adj ⇒ one exists)
    Lsh = np.zeros_like(L)
    Lsh[:, : NAME_LEN - 1] = L[:, 1:]
    idx = np.arange(NAME_LEN)[None, :]
    # S must equal L-with-position-p-deleted: prefix < p already equal
    # (p is the FIRST mismatch); suffix compares S[j] == L[j+1] ∀ j ≥ p
    okdel = np.where(idx >= p[:, None], Lsh == S, True).all(1)
    d1_del = adj & okdel
    return np.where(d0, 0, np.where(d1_sub | d1_del, 1, 99)).astype(np.int64)


def _names(sf_dir: str) -> rd.Dataset:
    path = (
        os.path.join(sf_dir, "documents.parquet")
        if os.path.isdir(sf_dir) else sf_dir
    )
    docs = read_parquet_sized(path, columns=["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        out_id, out_s = [], []
        for i in np.flatnonzero(ids % EDIT1_PICK_EVERY == 0):
            out_id.append(int(ids[i]))
            out_s.append(texts[i][:NAME_LEN])
        for i in np.flatnonzero(ids % EDIT1_MUT_EVERY == 0):
            out_id.append(int(ids[i]) + EDIT1_MUT_ID_OFFSET)
            out_s.append("z" + texts[i][1:NAME_LEN])
        return pa.table({
            "id": pa.array(out_id, pa.int64()),
            "s": pa.array(out_s, pa.string()),
        })

    return docs.map_batches(build, batch_format="pyarrow",
                            zero_copy_batch=True)


def _explode_variants(t: pa.Table) -> pa.Table:
    """Each (id, s) row → its deletion neighborhood D(s) as padded-byte
    key words.  One (n,16) matrix op per deletion position."""
    ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    strs = t["s"].to_pylist()
    mat, lens = _pad16(strs)
    mats = [mat]
    keep = [np.ones(len(ids), bool)]
    for i in range(NAME_LEN):
        v = np.zeros_like(mat)
        v[:, :i] = mat[:, :i]
        v[:, i:-1] = mat[:, i + 1:]
        mats.append(v)
        keep.append(lens > i)
    big = np.concatenate(mats)
    kp = np.concatenate(keep)
    rep_ids = np.tile(ids, NAME_LEN + 1)[kp]
    rep_pos = np.repeat(np.arange(NAME_LEN + 1, dtype=np.int64), len(ids))[kp]
    k1, k2 = _key_words(big[kp])
    return pa.table({
        "k1": pa.array(k1), "k2": pa.array(k2),
        "id": pa.array(rep_ids),
        # original row payload re-derived at verify; carry s for bucket emit
        "s": pa.array([strs[j] for j in np.tile(
            np.arange(len(ids)), NAME_LEN + 1)[kp]], pa.string()),
        "pos": pa.array(rep_pos),
    })


def _bucket_pairs_2key(df: pd.DataFrame) -> pd.DataFrame:
    """All cross pairs inside equal-(k1,k2) buckets (no cap: bucket size
    is the duplicate-prefix multiplicity, a data property the exact
    semantics must enumerate anyway)."""
    order = np.lexsort((
        df["id"].to_numpy(), df["k2"].to_numpy(), df["k1"].to_numpy()
    ))
    k1 = df["k1"].to_numpy()[order]
    k2 = df["k2"].to_numpy()[order]
    ids = df["id"].to_numpy()[order]
    ss = df["s"].to_numpy()[order]
    bounds = np.flatnonzero(
        np.r_[True, (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1]), True]
    )
    a_out, b_out, sa_out, sb_out = [], [], [], []
    for s0, e0 in zip(bounds[:-1], bounds[1:]):
        n = int(e0 - s0)
        if n < 2:
            continue
        a, b = np.triu_indices(n, k=1)
        a_out.append(ids[s0:e0][a])
        b_out.append(ids[s0:e0][b])
        sa_out.append(ss[s0:e0][a])
        sb_out.append(ss[s0:e0][b])
    if not a_out:
        return pd.DataFrame({
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "s_a": pd.Series(dtype=object),
            "s_b": pd.Series(dtype=object),
        })
    ida = np.concatenate(a_out)
    idb = np.concatenate(b_out)
    sa = np.concatenate(sa_out)
    sb = np.concatenate(sb_out)
    lo = np.minimum(ida, idb)
    hi = np.maximum(ida, idb)
    sw = ida > idb
    keep = lo != hi  # duplicate variants of ONE row (repeated chars)
    return pd.DataFrame({
        "id_a": lo[keep], "id_b": hi[keep],
        "s_a": np.where(sw, sb, sa)[keep],
        "s_b": np.where(sw, sa, sb)[keep],
    })


def edit1_pairs(sf_dir: str) -> pd.DataFrame:
    """All name pairs with Levenshtein distance ≤ 1 (id_a < id_b)."""
    from .dedup import _sharded_groupby

    names = _names(sf_dir)
    exploded = names.map_batches(
        _explode_variants, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = _sharded_groupby(exploded, ["k1", "k2"], _bucket_pairs_2key)
    uniq = _sharded_groupby(
        cand, ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False)
        .agg(s_a=("s_a", "first"), s_b=("s_b", "first")),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(dist=pd.Series(dtype="int64"))
        A, la = _pad16(list(df["s_a"]))
        B, lb = _pad16(list(df["s_b"]))
        d = dist_le1(A, la, B, lb)
        out = df[d <= 1].copy()
        out["dist"] = d[d <= 1]
        return out

    rows = uniq.map_batches(verify, batch_format="pandas").take_all()
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "s_a", "s_b", "dist"])
    for c in ("id_a", "id_b", "dist"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_EDIT1_PAIRS = f"""
WITH names AS (
    SELECT doc_id AS id, substr(text, 1, {NAME_LEN}) AS s
    FROM documents WHERE doc_id % {EDIT1_PICK_EVERY} = 0
    UNION ALL
    SELECT doc_id + {EDIT1_MUT_ID_OFFSET} AS id,
           'z' || substr(text, 2, {NAME_LEN - 1}) AS s
    FROM documents WHERE doc_id % {EDIT1_MUT_EVERY} = 0
)
SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b,
       levenshtein(a.s, b.s)::BIGINT AS dist
FROM names a JOIN names b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 1
"""


# ---------------------------------------------------------------- soundex

# American Soundex letter codes a..z (simplified: no H/W bridge rule —
# adjacent equal codes collapse regardless of the separating letter;
# deterministic and replicated identically in the SQL oracle)
SOUNDEX_CODES = "01230120022455012623010202"


def _soundex_one(s: str) -> str:
    """Simplified Soundex of one string: letters only, first letter +
    three collapsed non-zero codes, zero-padded.  Empty when the string
    has no ASCII letters."""
    letters = [ch for ch in s.lower() if "a" <= ch <= "z"]
    if not letters:
        return ""
    codes = [SOUNDEX_CODES[ord(ch) - 97] for ch in letters]
    kept = [codes[0]]
    for c in codes[1:]:
        if c != kept[-1]:
            kept.append(c)
    digits = "".join(c for c in kept[1:] if c != "0")[:3]
    return letters[0].upper() + digits.ljust(3, "0")


def soundex_blocking_df(sf_dir: str) -> pd.DataFrame:
    """Phonetic blocking of the record-linkage name table: each name's
    simplified Soundex code plus its block size (names sharing a code
    are linkage candidates) — the classic phonetic-key complement to
    the FastSS edit-distance join above.

    The per-name encode is a bounded per-row scan over <= 16 chars on
    the SAME every-10th-doc derived table `_names` builds (its own
    construction is per-row too); block sizes come from one driver
    groupby over the tiny name table.  At corpus scale the name table
    is N/10 rows — the encode stays a streaming map_batches; only
    (code, count) partials would need a sharded sum, same shape as
    term df."""
    def encode(t: pa.Table) -> pa.Table:
        strs = t["s"].to_pylist()
        return pa.table({
            "id": t["id"].cast(pa.int64()),
            "s": t["s"],
            "soundex": pa.array([_soundex_one(s) for s in strs],
                                pa.string()),
        })

    rows = pd.DataFrame(
        _names(sf_dir).map_batches(
            encode, batch_format="pyarrow", zero_copy_batch=True
        ).take_all(),
        columns=["id", "s", "soundex"],
    )
    if not len(rows):
        return pd.DataFrame({
            "id": pd.Series([], dtype="int64"),
            "s": pd.Series([], dtype="object"),
            "soundex": pd.Series([], dtype="object"),
            "block_n": pd.Series([], dtype="int64"),
        })
    sizes = rows.groupby("soundex")["id"].transform("size")
    rows["block_n"] = sizes.astype("int64")
    rows["id"] = rows["id"].astype("int64")
    return rows.sort_values("id").reset_index(drop=True)


SQL_SOUNDEX_BLOCKING = f"""
WITH names AS (
    SELECT doc_id AS id, substr(text, 1, {NAME_LEN}) AS s
    FROM documents WHERE doc_id % {EDIT1_PICK_EVERY} = 0
    UNION ALL
    SELECT doc_id + {EDIT1_MUT_ID_OFFSET} AS id,
           'z' || substr(text, 2, {NAME_LEN - 1}) AS s
    FROM documents WHERE doc_id % {EDIT1_MUT_EVERY} = 0
),
base AS (
    SELECT id, s, regexp_replace(lower(s), '[^a-z]', '', 'g') AS l
    FROM names
),
code AS (
    SELECT id, s, l,
           translate(l, 'abcdefghijklmnopqrstuvwxyz',
                     '{SOUNDEX_CODES}') AS c
    FROM base
),
ch AS (
    SELECT id, unnest(regexp_extract_all(c, '.')) AS d,
           unnest(range(1, length(c) + 1)) AS pos
    FROM code
),
dd AS (
    SELECT id, d, pos,
           lag(d) OVER (PARTITION BY id ORDER BY pos) AS pd
    FROM ch
),
kept AS (
    SELECT id, d, pos,
           row_number() OVER (PARTITION BY id ORDER BY pos) AS rn
    FROM dd WHERE pd IS NULL OR d <> pd
),
digits AS (
    SELECT id,
           coalesce(string_agg(d, '' ORDER BY rn)
                    FILTER (WHERE rn > 1 AND d <> '0'), '') AS ds
    FROM kept GROUP BY id
),
sx AS (
    SELECT c.id, c.s,
           CASE WHEN c.l = '' THEN ''
                ELSE upper(substr(c.l, 1, 1))
                     || rpad(substr(coalesce(g.ds, ''), 1, 3), 3, '0')
           END AS soundex
    FROM code c LEFT JOIN digits g USING (id)
)
SELECT id, s, soundex,
       (count(*) OVER (PARTITION BY soundex))::BIGINT AS block_n
FROM sx ORDER BY id
"""
