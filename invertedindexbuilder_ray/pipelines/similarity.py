"""Similarity search over embedding columns.

* ``knn_bruteforce`` — exact cosine top-k: broadcast query matrix
  (ray.put once), one matmul per batch (catalog.q_knn_cosine).
* ``ann_lsh`` — the scale path: random-hyperplane LSH buckets both the
  index and the (multiprobe-expanded) queries, a hash-partitioned
  ``Dataset.join`` on the bucket key limits scoring to colliding
  vectors.  Approximate by construction; recall is tested against the
  brute-force baseline.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.rounding import round_half_away
from ..sources.util import read_parquet_sized

LSH_BITS = 8
LSH_SEED = 13


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


def _planes(dim: int, bits: int = LSH_BITS, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, bits))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes) > 0
    return (bits @ (1 << np.arange(planes.shape[1], dtype=np.int64))).astype(np.int64)


def ann_lsh(
    sf_dir: str,
    *,
    n_queries: int = 5,
    top_k: int = 10,
    bits: int = LSH_BITS,
    probe_radius: int = 2,
) -> rd.Dataset:
    """Approximate top-k neighbors for the first ``n_queries`` vectors.

    Multiprobe: each query probes its own bucket plus every bucket within
    ``probe_radius`` bit flips (1 + bits + C(bits,2) probes at radius 2),
    trading join fan-out for recall — vectors near a hyperplane otherwise
    land a 2-bit hop away from their neighbors.
    """
    ds = _embeddings(sf_dir)
    qrows = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], np.float64) for r in qrows])
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    dim = qmat.shape[1]
    planes = _planes(dim, bits)

    # index side: (bucket, vec_id, embedding)
    def index_bucket(batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(mat, planes), pa.int64()),
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    indexed = ds.map_batches(index_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # probe side: query rows exploded to every probed bucket
    qb = _bucket_of(qmat, planes)
    probes = []
    for qi in range(len(qids)):
        buckets = {int(qb[qi])}
        if probe_radius >= 1:
            buckets |= {int(qb[qi]) ^ (1 << b) for b in range(bits)}
        if probe_radius >= 2:
            buckets |= {
                int(qb[qi]) ^ (1 << b1) ^ (1 << b2)
                for b1 in range(bits)
                for b2 in range(b1 + 1, bits)
            }
        for b in sorted(buckets):
            probes.append(
                {"bucket": b, "qid": int(qids[qi]), "q_emb": qmat[qi].tolist()}
            )
    # ONE block (from_items makes a block PER item -> hundreds of per-block
    # task overheads through the join; measured 16 s -> ~5 s at sf0.1)
    probe_ds = rd.from_arrow(pa.Table.from_pylist(probes))

    from .joins import partitioned_hash_join

    joined = partitioned_hash_join(
        probe_ds, indexed, left_on="bucket", right_on="bucket"
    )

    return _score_and_topk(joined, top_k)


def _score_and_topk(joined: rd.Dataset, top_k: int) -> rd.Dataset:
    """Shared ANN tail: exact cosine on (candidate row, q_emb) pairs, then
    per-query top-k (dedup across probes, self-match excluded)."""

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        mat = _emb_matrix(batch)
        q = np.asarray(batch["q_emb"].to_pylist(), np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        sims = np.einsum("ij,ij->i", mat, q)
        return pa.table(
            {
                "qid": batch["qid"].cast(pa.int64()),
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "sim": pa.array(round_half_away(sims, 6), pa.float64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.vec_id != g.qid].drop_duplicates(subset=["vec_id"])
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(top_k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(topk, batch_format="pandas")
    )


def ann_ivf(
    sf_dir: str,
    *,
    n_queries: int = 5,
    top_k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> rd.Dataset:
    """IVF approximate nearest neighbors — the second scale path.

    Coarse quantizer: every ``stride``-th vector (``vec_id % stride == 0``
    with ``stride = max(1, N // n_centroids)``) is a centroid — a
    k-means-init-style codebook with NO training pass and no RNG, so the
    whole pipeline (assignment, probing, scoring, ranking) is exactly
    reproducible by the DuckDB oracle.  Every vector is assigned to its
    nearest centroid with ONE broadcast matmul per batch (the centroid
    matrix rides ``ray.put``); queries probe their ``n_probe`` nearest
    centroid lists; exact cosine + top-k inside.  All argmax/probe/rank
    tie-breaks are (score desc, id asc).  Recall/latency trade via
    ``n_centroids`` x ``n_probe``; unlike LSH the partition count is
    explicit, so list sizes stay ~N/n_centroids regardless of the data's
    angular spread."""
    import ray

    ds = _embeddings(sf_dir)
    n = ds.count()  # parquet metadata
    stride = max(1, n // n_centroids)

    def pick_cents(b: pa.Table) -> pa.Table:
        mask = (b["vec_id"].to_numpy(zero_copy_only=False) % stride) == 0
        return b.filter(pa.array(mask))

    crows = ds.map_batches(pick_cents, batch_format="pyarrow").take_all()
    crows.sort(key=lambda r: r["vec_id"])  # centroid order = cid ascending
    cids = np.array([r["vec_id"] for r in crows], dtype=np.int64)
    cents = np.stack([np.asarray(r["embedding"], np.float64) for r in crows])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _emb_matrix(batch)
        bucket = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    indexed = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    qrows = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], np.float64) for r in qrows])
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    qsims = qmat @ cents.T
    probes = []
    for qi in range(len(qids)):
        # probe order: sim desc, cid asc (same total order as the oracle)
        order = np.lexsort((cids, -qsims[qi]))[: min(n_probe, cents.shape[0])]
        for b in sorted(int(c) for c in order):
            probes.append(
                {"bucket": b, "qid": int(qids[qi]), "q_emb": qmat[qi].tolist()}
            )
    probe_ds = rd.from_arrow(pa.Table.from_pylist(probes))  # one block

    from .joins import partitioned_hash_join

    joined = partitioned_hash_join(
        probe_ds, indexed, left_on="bucket", right_on="bucket"
    )
    return _score_and_topk(joined, top_k)
