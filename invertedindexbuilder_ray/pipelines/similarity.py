"""Similarity search over embedding columns.

* ``knn_bruteforce`` — exact cosine top-k: broadcast query matrix
  (ray.put once), one matmul per batch (catalog.q_knn_cosine).
* ``ann_lsh`` / ``ann_ivf`` — the sublinear scale paths.  Both share one
  execution shape (the ``q_knn_cosine`` pattern, NO shuffle):

    1. the tiny probe set (query vectors + the buckets each query
       probes) is ``ray.put`` ONCE;
    2. one ``map_batches`` pass over the embeddings computes each row's
       bucket, filters to rows in a probed bucket, scores the survivors
       with an exact-cosine matmul, and emits a PER-BATCH partial top-k
       (at most ``top_k`` rows per query per batch);
    3. a final per-query merge (n_queries keys — tiny) takes the global
       top-k under the same total order (rounded sim desc, vec_id asc),
       so the result is exactly the top-k of the candidate set.

  Bucketing constants DERIVE FROM N (round-2 verdict: fixed constants
  stop being sublinear past ~10^7 vectors): LSH bits grow as
  ceil(log2(N / target_bucket_size)) and IVF uses ~sqrt(N) centroids,
  keeping expected bucket/list sizes bounded at any corpus size.  The
  derivations are integer-exact so the DuckDB oracles reproduce them
  bit-for-bit from count(*).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.rounding import round_half_away
from ..sources.util import read_parquet_sized

LSH_SEED = 13
LSH_MIN_BITS = 4
LSH_MAX_BITS = 24
ANN_TARGET_BUCKET = 1024  # expected vectors per LSH bucket
IVF_ASSIGN_PROBE = 3  # super-cells probed per vector/query (two-level IVF)


def lsh_bits_for(n: int, *, target_bucket: int = ANN_TARGET_BUCKET) -> int:
    """bits = clamp(ceil(log2(ceil(n / target_bucket))), MIN, MAX) —
    computed with integer shifts (no float log) so the SQL oracle's
    derivation from count(*) matches exactly."""
    m = max(1, -(-n // target_bucket))
    b = next(
        (b for b in range(1, LSH_MAX_BITS + 1) if (1 << b) >= m), LSH_MAX_BITS
    )
    return min(LSH_MAX_BITS, max(LSH_MIN_BITS, b))


def ivf_centroids_for(n: int) -> int:
    """~sqrt(N) centroids -> expected list size ~sqrt(N).  IEEE sqrt is
    correctly rounded, so ceil(sqrt(n)) is integer-exact for n < 2^52
    and the SQL oracle reproduces it."""
    return max(1, math.ceil(math.sqrt(n)))


def ivf_superstride_for(n_cents: int) -> int:
    """Super-centroid stride for the two-level quantizer: ~sqrt(n_cents)
    supers (~N^(1/4) overall), picked as every ``sstride``-th centroid.
    Same integer-exactness argument as ``ivf_centroids_for``."""
    n_super = max(1, math.ceil(math.sqrt(n_cents)))
    return max(1, n_cents // n_super)


def _embeddings(sf_dir: str) -> rd.Dataset:
    path = os.path.join(sf_dir, "embeddings.parquet") if os.path.isdir(sf_dir) else sf_dir
    return read_parquet_sized(path, columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    emb = batch["embedding"].combine_chunks()
    if hasattr(emb, "values"):  # plain ListArray: flat value buffer, zero-copy
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False), np.float64).reshape(
            batch.num_rows, -1
        )
    else:  # Ray ArrowTensorArray (appears after pandas round-trips)
        m = np.asarray(emb.to_numpy(zero_copy_only=False))
        if m.dtype == object:
            m = np.stack(m)
        m = m.astype(np.float64).reshape(batch.num_rows, -1)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _planes(dim: int, bits: int, seed: int = LSH_SEED) -> np.ndarray:
    """Hyperplanes are a PREFIX property: _planes(dim, b) ==
    _planes(dim, B)[:, :b] for b <= B, so the SQL oracle can inline
    LSH_MAX_BITS literal columns and select the first nbits."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, LSH_MAX_BITS))[:, :bits]


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes) > 0
    return (bits @ (1 << np.arange(planes.shape[1], dtype=np.int64))).astype(np.int64)


def _load_queries(ds: rd.Dataset, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    qrows = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], np.float64) for r in qrows])
    return qids, qmat / np.linalg.norm(qmat, axis=1, keepdims=True)


def _probe_topk(
    ds: rd.Dataset,
    bucket_fn,
    qids: np.ndarray,
    qmat_n: np.ndarray,
    probe_buckets: list[np.ndarray],
    top_k: int,
    *,
    bucket_col: str | None = None,
) -> rd.Dataset:
    """Shared ANN tail: broadcast probe set, one scan, per-batch partial
    top-k, tiny per-query merge.  ``bucket_fn(mat_n) -> int64 buckets``
    runs inside each task; ``probe_buckets[i]`` is the SORTED bucket set
    query i probes.  With ``bucket_col`` set (serving from a persisted
    ANN artifact, ann_store.py), each row's bucket is READ from that
    column instead of recomputed — ``bucket_fn`` is ignored."""
    import ray

    pref = ray.put((qids, qmat_n, probe_buckets))

    def score(batch: pa.Table) -> pa.Table:
        q_ids, q_n, pbs = ray.get(pref)
        out_q, out_v, out_s = [], [], []
        if batch.num_rows:
            mat_n = _emb_matrix(batch)
            vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if bucket_col is not None:
                row_b = (
                    batch[bucket_col]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            else:
                row_b = bucket_fn(mat_n)
            for qi in range(len(q_ids)):
                pb = pbs[qi]
                pos = np.searchsorted(pb, row_b)
                hit = (pos < len(pb)) & (pb[np.minimum(pos, len(pb) - 1)] == row_b)
                hit &= vec_ids != q_ids[qi]  # exclude self-match
                cand = np.flatnonzero(hit)
                if not len(cand):
                    continue
                sims = round_half_away(mat_n[cand] @ q_n[qi], 6)
                order = np.lexsort((vec_ids[cand], -sims))[:top_k]
                sel = cand[order]
                out_q.append(np.full(len(sel), q_ids[qi], np.int64))
                out_v.append(vec_ids[sel])
                out_s.append(sims[order])
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt)  # noqa: E731
        return pa.table(
            {
                "qid": pa.array(cat(out_q, np.int64), pa.int64()),
                "vec_id": pa.array(cat(out_v, np.int64), pa.int64()),
                "sim": pa.array(cat(out_s, np.float64), pa.float64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(top_k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")  # n_queries keys — per-key groupby is fine here
        .map_groups(topk, batch_format="pandas")
    )
    # zero candidates overall -> map_groups never runs -> schemaless empty
    # dataset (Ray trap); union a typed empty block
    empty = pa.schema(
        [
            ("qid", pa.int64()),
            ("vec_id", pa.int64()),
            ("sim", pa.float64()),
            ("rank", pa.int64()),
        ]
    )
    return out.map_batches(lambda t: t, batch_format="pyarrow").union(
        rd.from_arrow(empty.empty_table())
    )


def ann_lsh(
    sf_dir: str,
    *,
    n_queries: int = 5,
    top_k: int = 10,
    bits: int | None = None,
    probe_radius: int = 2,
) -> rd.Dataset:
    """Approximate top-k neighbors for the first ``n_queries`` vectors.

    Multiprobe: each query probes its own bucket plus every bucket within
    ``probe_radius`` bit flips (1 + bits + C(bits,2) probes at radius 2),
    trading scan-side match volume for recall — vectors near a hyperplane
    otherwise land a 2-bit hop away from their neighbors.  ``bits``
    defaults to ``lsh_bits_for(N)``.
    """
    ds = _embeddings(sf_dir)
    if bits is None:
        bits = lsh_bits_for(ds.count())  # parquet metadata, no scan
    qids, qmat_n = _load_queries(ds, n_queries)
    planes = _planes(qmat_n.shape[1], bits)
    probe_buckets = _lsh_probe_sets(
        _bucket_of(qmat_n, planes), bits, probe_radius
    )

    # planes are tiny (dim x bits floats) — safe to ship in the closure
    return _probe_topk(
        ds, lambda m: _bucket_of(m, planes), qids, qmat_n, probe_buckets, top_k
    )


def _lsh_probe_sets(
    qb: np.ndarray, bits: int, probe_radius: int
) -> list[np.ndarray]:
    """Multiprobe bucket sets per query (own bucket + all <=radius bit
    flips), sorted — shared by the inline path and the persisted-artifact
    serving path so both probe identically."""
    probe_buckets = []
    for qi in range(len(qb)):
        buckets = {int(qb[qi])}
        if probe_radius >= 1:
            buckets |= {int(qb[qi]) ^ (1 << b) for b in range(bits)}
        if probe_radius >= 2:
            buckets |= {
                int(qb[qi]) ^ (1 << b1) ^ (1 << b2)
                for b1 in range(bits)
                for b2 in range(b1 + 1, bits)
            }
        probe_buckets.append(np.array(sorted(buckets), np.int64))
    return probe_buckets


def ann_ivf(
    sf_dir: str,
    *,
    n_queries: int = 5,
    top_k: int = 10,
    n_centroids: int | None = None,
    n_probe: int = 4,
) -> rd.Dataset:
    """IVF approximate nearest neighbors — the second scale path.

    TWO-LEVEL coarse quantizer (round-3 verdict item 5): every
    ``stride``-th vector is a centroid (~sqrt(N), k-means-init-style, no
    RNG) and every ``sstride``-th centroid is a SUPER-centroid
    (~N^(1/4)).  Each centroid belongs to its nearest super; a vector is
    assigned by probing its ``IVF_ASSIGN_PROBE`` nearest supers and
    taking the nearest centroid among those supers' members — so the
    per-batch assignment matmul is rows x N^(1/4) plus small per-group
    matmuls against ~IVF_ASSIGN_PROBE * N^(1/4) member centroids,
    instead of rows x sqrt(N).  Queries build their candidate centroid
    set the same way and probe their ``n_probe`` nearest candidates.
    Every step (super pick, membership, assignment, probing, scoring,
    ranking) is deterministic with (score desc, id asc) tie-breaks, so
    the DuckDB oracle (catalog.SQL_ANN_IVF) reproduces it exactly.

    The codebook is streamed into numpy from Arrow batches (no per-row
    Python objects) and broadcast ONCE via ``ray.put``; at ~10^12
    vectors the O(sqrt(N)) codebook bytes live in the object store, and
    only the member lists of probed supers are touched per row group.
    """
    ds = _embeddings(sf_dir)
    n = ds.count()  # parquet metadata
    cb = _ivf_codebook(ds, n, n_centroids=n_centroids)
    qids, qmat_n = _load_queries(ds, n_queries)
    probe_buckets = _ivf_query_probes(cb, qmat_n, n_probe)
    return _probe_topk(
        ds, _ivf_bucket_fn(cb), qids, qmat_n, probe_buckets, top_k
    )


def _ivf_codebook(
    ds: rd.Dataset, n: int, *, n_centroids: int | None = None
) -> dict:
    """Two-level IVF codebook over ``ds``: cids/cents (cid ascending),
    super positions, per-super member lists.  Deterministic (no RNG), so
    a persisted codebook (ann_store.py) reproduces the inline path
    bit-for-bit."""
    if n_centroids is None:
        n_centroids = ivf_centroids_for(n)
    stride = max(1, n // n_centroids)

    def pick_cents(b: pa.Table) -> pa.Table:
        mask = (b["vec_id"].to_numpy(zero_copy_only=False) % stride) == 0
        return b.filter(pa.array(mask))

    cid_parts, emb_parts = [], []
    for b in ds.map_batches(pick_cents, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            cid_parts.append(
                b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            emb_parts.append(_emb_matrix(b))  # normalized rows
    cids = np.concatenate(cid_parts) if cid_parts else np.empty(0, np.int64)
    cents = (
        np.vstack(emb_parts) if emb_parts else np.empty((0, 1), np.float64)
    )
    order = np.argsort(cids, kind="stable")  # centroid order = cid ascending
    cids, cents = cids[order], cents[order]
    n_cents = len(cids)

    sstride = ivf_superstride_for(n_cents)
    sup_pos = np.flatnonzero((cids // stride) % sstride == 0)
    supers = cents[sup_pos]  # scid ascending (cids are sorted)
    ap = min(IVF_ASSIGN_PROBE, len(sup_pos))

    # centroid -> nearest super (sim desc, scid asc via first-max argmax)
    cassign = np.argmax(cents @ supers.T, axis=1)
    members = [
        np.flatnonzero(cassign == s).astype(np.int64)  # cid-asc positions
        for s in range(len(sup_pos))
    ]
    return {
        "cids": cids,
        "cents": cents,
        "sup_pos": sup_pos,
        "supers": supers,
        "members": members,
        "stride": stride,
        "ap": ap,
    }


def _ivf_query_probes(
    cb: dict, qmat_n: np.ndarray, n_probe: int
) -> list[np.ndarray]:
    """Each query's ``n_probe`` nearest candidate centroids (positions,
    sorted) via the two-level probe — shared by inline and serving."""
    cents, supers, members, ap = (
        cb["cents"], cb["supers"], cb["members"], cb["ap"],
    )
    if not len(qmat_n):
        return []
    ssims = qmat_n @ supers.T
    qsup = np.sort(np.argsort(-ssims, axis=1, kind="stable")[:, :ap], axis=1)
    probe_buckets = []
    for qi in range(len(qmat_n)):
        cand = [members[s] for s in qsup[qi]]
        cand = np.unique(np.concatenate(cand)) if cand else np.empty(0, np.int64)
        if not len(cand):
            probe_buckets.append(np.empty(0, np.int64))
            continue
        sims = cents[cand] @ qmat_n[qi]
        # probe order: sim desc, cid asc (cand is cid-ascending positions)
        sel = cand[np.lexsort((cand, -sims))[: min(n_probe, len(cand))]]
        probe_buckets.append(np.array(sorted(int(c) for c in sel), np.int64))
    return probe_buckets


def _ivf_bucket_fn(cb: dict):
    """Row -> assigned centroid position (-1 for empty cells), broadcast
    once via ray.put; identical math to the persisted assignment pass."""
    import ray

    cref = ray.put((cb["cents"], cb["supers"], cb["members"]))
    ap = cb["ap"]

    def bucket_fn(mat_n: np.ndarray) -> np.ndarray:
        c, sup, mem = ray.get(cref)
        ssims = mat_n @ sup.T
        top = np.sort(np.argsort(-ssims, axis=1, kind="stable")[:, :ap], axis=1)
        out = np.full(len(mat_n), -1, np.int64)  # -1 = unassigned (empty cells)
        uniq, inv = np.unique(top, axis=0, return_inverse=True)
        for gi in range(len(uniq)):  # loop over distinct probe SETS, not rows
            rows = np.flatnonzero(inv == gi)
            cand = np.unique(np.concatenate([mem[s] for s in uniq[gi]]))
            if not len(cand):
                continue
            sims = mat_n[rows] @ c[cand].T
            out[rows] = cand[np.argmax(sims, axis=1)]  # first-max -> cid asc
        return out

    return bucket_fn
