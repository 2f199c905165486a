"""Index build: the reference's 4-phase external-memory pipeline, Ray-Data-first.

Reference lifecycle (SURVEY.md §3.1): parse -> spill runs -> sort ->
k-way merge -> final compressed build.  Here the spill/sort/merge
machinery disappears into Ray Data's streaming executor and one
term-keyed shuffle:

    source (doc_id, url, text, dl)
      -> map_batches(TokenizePostings, actor pool)   # postings + doc rows
      -> checkpoint parquet (resume: skip the whole parse)
      -> docs parquet + global stats (N, sum_dl)
      -> add partition = fnv(term) % P
      -> groupby(partition).map_groups(build_partition)   # THE one wide shuffle
      -> per-partition posting blob + lexicon parquet + metrics
      -> manifest.json

Every partition's outputs are written atomically; a rerun of the same
build skips completed partitions (and, with the checkpoint intact, never
re-parses the corpus).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..functions import hashing
from ..functions.tokenize import tokenize_to_postings
from ..stages import compress
from ..state import manifest as mf
from ..state.manifest import IndexManifest

CKPT_DIR = "postings_ckpt"
DOCS_DIR = "docs"
LEXICON_DIR = "lexicon"
POSTINGS_DIR = "postings"
PARTS_META_DIR = "parts_meta"


class TokenizePostings:
    """Actor-pool stage: (doc_id, url, text, dl) batches -> combined rows.

    Emits posting rows ``(term, doc_id, tf, dl)`` plus one doc row per
    document with ``term = null`` carrying ``(doc_id, dl, url)`` — a
    single output stream so the corpus is scanned exactly once; the two
    row kinds are split downstream by a null filter on the checkpoint
    (cheap: parquet predicate pushdown).
    """

    def __init__(self, *, drop_trailing: bool = True):
        self.drop_trailing = drop_trailing

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dls = batch["dl"].to_numpy(zero_copy_only=False)
        terms, p_docs, p_tfs = tokenize_to_postings(
            batch["text"], doc_ids, drop_trailing=self.drop_trailing
        )
        n_p = len(p_docs)
        n_d = batch.num_rows
        # per-posting dl: postings are doc-major, so a searchsorted over the
        # batch's doc_ids (ascending within batch by construction) maps back
        pos = np.searchsorted(doc_ids, p_docs)
        p_dls = dls[pos]
        term_col = pa.concat_arrays([terms, pa.nulls(n_d, pa.string())])
        doc_col = pa.array(np.concatenate([p_docs, doc_ids]), pa.int64())
        tf_col = pa.concat_arrays(
            [pa.array(p_tfs, pa.int32()), pa.nulls(n_d, pa.int32())]
        )
        dl_col = pa.array(np.concatenate([p_dls, dls]), pa.int64())
        url_col = pa.concat_arrays(
            [pa.nulls(n_p, pa.string()), batch["url"].combine_chunks()]
        )
        return pa.table(
            {
                "term": term_col,
                "doc_id": doc_col,
                "tf": tf_col,
                "dl": dl_col,
                "url": url_col,
            }
        )


def _add_partition(batch: pa.Table, num_partitions: int) -> pa.Table:
    part = hashing.term_partition(batch["term"], num_partitions)
    return batch.append_column("partition", pa.array(part, pa.int32()))


class BuildPartition:
    """Per-shuffle-partition index builder (runs inside map_groups).

    Sorts the partition's postings by (term, doc_id), encodes every
    term's list (compress.encode_term_lists), writes the posting blob +
    per-partition lexicon parquet atomically, and returns one metrics
    row.  If this partition's outputs already exist (resume), encoding
    is skipped entirely.
    """

    def __init__(self, out_dir: str, n_docs: int, d_avr: float, block_max: bool):
        self.out_dir = out_dir
        self.n_docs = n_docs
        self.d_avr = d_avr
        self.block_max = block_max

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = int(group["partition"][0].as_py())
        blob_path = os.path.join(self.out_dir, POSTINGS_DIR, f"part-{pid:05d}.bin")
        lex_path = os.path.join(self.out_dir, LEXICON_DIR, f"part-{pid:05d}.parquet")
        meta_path = os.path.join(self.out_dir, PARTS_META_DIR, f"part-{pid:05d}.json")
        if os.path.exists(meta_path) and os.path.exists(blob_path) and os.path.exists(lex_path):
            with open(meta_path) as f:
                meta = json.load(f)
            meta["skipped"] = True
            return pa.table({"partition": [pid], "metrics": [json.dumps(meta)]})

        tbl = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        terms = tbl["term"].combine_chunks()
        doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        tfs = tbl["tf"].to_numpy(zero_copy_only=False)
        dls = tbl["dl"].to_numpy(zero_copy_only=False)
        # term run boundaries via dictionary encoding (ids appear in sorted order)
        dict_arr = pc.dictionary_encode(terms)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = np.asarray(dict_arr.indices)
        changes = np.flatnonzero(codes[1:] != codes[:-1]) + 1
        term_starts = np.concatenate([[0], changes, [len(codes)]]).astype(np.int64)
        uniq_terms = dict_arr.dictionary.to_pylist()

        enc = compress.encode_term_lists(
            uniq_terms,
            term_starts,
            doc_ids,
            tfs,
            doc_lens=dls,
            n_docs=self.n_docs,
            d_avr=self.d_avr,
            block_max=self.block_max,
        )
        mf.atomic_write_bytes(blob_path, enc.blob)
        lex_tbl = pa.table(
            {
                "term": pa.array(enc.terms, pa.string()),
                "df": pa.array(enc.dfs, pa.int64()),
                "partition": pa.array(np.full(len(enc.terms), pid), pa.int32()),
                "offset": pa.array(enc.offsets, pa.int64()),
                "nbytes": pa.array(enc.nbytes, pa.int64()),
                "max_score": pa.array(enc.max_scores, pa.float32()),
            }
        )
        import pyarrow.parquet as pq

        os.makedirs(os.path.dirname(lex_path), exist_ok=True)
        tmp = lex_path + ".tmp"
        pq.write_table(lex_tbl, tmp)
        os.replace(tmp, lex_path)
        meta = {
            "partition": pid,
            "rows": int(len(doc_ids)),
            "n_terms": int(len(enc.terms)),
            "blob_bytes": int(len(enc.blob)),
            "wall_s": round(time.perf_counter() - t0, 4),
            "skipped": False,
        }
        mf.atomic_write_json(meta_path, meta)
        return pa.table({"partition": [pid], "metrics": [json.dumps(meta)]})


def _fingerprint(source: str | list[str] | rd.Dataset) -> str:
    if isinstance(source, rd.Dataset):
        return f"dataset:{source.schema()}"
    paths = source if isinstance(source, list) else [source]
    parts = []
    for p in paths:
        try:
            st = os.stat(p)
            parts.append(f"{p}:{st.st_size}:{int(st.st_mtime)}")
        except OSError:
            parts.append(p)
    return ";".join(parts)


def build_index(
    source_ds: rd.Dataset,
    out_dir: str,
    *,
    num_partitions: int = 16,
    block_max: bool = True,
    drop_trailing: bool = True,
    resume: bool = True,
    tokenize_concurrency: int | None = None,
    input_fingerprint: str = "",
) -> IndexManifest:
    """Build a full index at ``out_dir`` from a (doc_id, url, text, dl) Dataset.

    ``source_ds`` comes from ``sources.webpages.load_webpages`` (quirk-
    faithful doc_ids) or ``sources.documents.load_documents``.
    """
    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, CKPT_DIR)

    # ---- Phase 1: parse/tokenize -> checkpoint (skipped wholesale on resume)
    if not (resume and mf.is_complete(ckpt)):
        combined = source_ds.map_batches(
            TokenizePostings(drop_trailing=drop_trailing),
            batch_format="pyarrow",
            zero_copy_batch=True,
            **({"concurrency": tokenize_concurrency} if tokenize_concurrency else {}),
        )
        combined.write_parquet(ckpt)
        mf.mark_complete(ckpt)

    # ---- Phase 2: docs table + global stats (tiny aggregate)
    docs_dir = os.path.join(out_dir, DOCS_DIR)
    docs_ds = rd.read_parquet(
        ckpt, columns=["term", "doc_id", "dl", "url"], filter=pc.field("term").is_null()
    ).select_columns(["doc_id", "dl", "url"])
    if not (resume and mf.is_complete(docs_dir)):
        docs_ds.write_parquet(docs_dir)
        mf.mark_complete(docs_dir)
    stats = (
        rd.read_parquet(docs_dir, columns=["doc_id", "dl"])
        .aggregate(Count(), Sum("dl"), Max("doc_id"))
    )
    n_docs = int(stats["count()"])
    sum_dl = int(stats["sum(dl)"] or 0)
    max_doc_id = int(stats["max(doc_id)"]) + 1 if n_docs else 0
    d_avr = (sum_dl / (n_docs - 1)) if n_docs > 1 else float(sum_dl)  # quirk Q6

    # ---- Phase 3: the one wide shuffle — postings by hash(term) % P
    postings_ds = (
        rd.read_parquet(
            ckpt,
            columns=["term", "doc_id", "tf", "dl"],
            filter=~pc.field("term").is_null(),
        )
        .map_batches(
            lambda b: _add_partition(b, num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    builder = BuildPartition(out_dir, n_docs, d_avr, block_max)

    def build_partition(group: pa.Table) -> pa.Table:
        return builder(group)

    metrics_rows = (
        postings_ds.groupby("partition")
        .map_groups(build_partition, batch_format="pyarrow")
        .take_all()
    )
    partitions = {
        str(r["partition"]): json.loads(r["metrics"]) for r in metrics_rows
    }

    man = IndexManifest(
        n_docs=n_docs,
        sum_dl=sum_dl,
        d_avr=d_avr,
        max_doc_id=max_doc_id,
        num_partitions=num_partitions,
        block_max=block_max,
        input_fingerprint=input_fingerprint,
        partitions=partitions,
        stats={
            "total_postings": sum(p.get("rows", 0) for p in partitions.values()),
            "distinct_terms": sum(p.get("n_terms", 0) for p in partitions.values()),
            "index_bytes": sum(p.get("blob_bytes", 0) for p in partitions.values()),
        },
    )
    man.save(out_dir)
    return man
