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
import shutil
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


DOC_ROWS_PARTITION = -1  # hive partition holding the doc-table rows


class TokenizePostings:
    """Actor-pool stage: (doc_id, url, text, dl) batches -> combined rows.

    Emits posting rows ``(term, doc_id, tf, dl, partition)`` plus one doc
    row per document (``term = null``, ``partition = -1``) carrying
    ``(doc_id, dl, url)`` — a single output stream so the corpus is
    scanned exactly once.  ``partition = fnv(term) % P`` is assigned
    HERE, before the checkpoint, so the checkpoint write doubles as the
    shuffle: it is hive-partitioned on this column and each index
    partition is then built from its own directory with no groupby
    operator at all (a map-side shuffle through the filesystem — the
    same layout a multi-node build would use on shared storage).
    """

    def __init__(self, num_partitions: int, *, drop_trailing: bool = True):
        self.num_partitions = num_partitions
        self.drop_trailing = drop_trailing

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dls = batch["dl"].to_numpy(zero_copy_only=False)
        terms, p_docs, p_tfs, p_rows = tokenize_to_postings(
            batch["text"], doc_ids, drop_trailing=self.drop_trailing, return_rows=True
        )
        n_p = len(p_docs)
        n_d = batch.num_rows
        p_dls = dls[p_rows]  # per-posting dl via row index (no sortedness assumed)
        part = hashing.term_partition(terms, self.num_partitions).astype(np.int32)
        term_col = pa.concat_arrays([terms, pa.nulls(n_d, pa.string())])
        doc_col = pa.array(np.concatenate([p_docs, doc_ids]), pa.int64())
        tf_col = pa.concat_arrays(
            [pa.array(p_tfs, pa.int32()), pa.nulls(n_d, pa.int32())]
        )
        dl_col = pa.array(np.concatenate([p_dls, dls]), pa.int64())
        url_col = pa.concat_arrays(
            [pa.nulls(n_p, pa.string()), batch["url"].combine_chunks()]
        )
        part_col = pa.array(
            np.concatenate(
                [part, np.full(n_d, DOC_ROWS_PARTITION, dtype=np.int32)]
            ),
            pa.int32(),
        )
        return pa.table(
            {
                "term": term_col,
                "doc_id": doc_col,
                "tf": tf_col,
                "dl": dl_col,
                "url": url_col,
                "partition": part_col,
            }
        )


class BuildPartition:
    """Per-shuffle-partition index builder (runs inside map_groups).

    Sorts the partition's postings by (term, doc_id), encodes every
    term's list (compress.encode_term_lists), writes the posting blob +
    per-partition lexicon parquet atomically, and returns one metrics
    row.  If this partition's outputs already exist (resume), encoding
    is skipped entirely.
    """

    def __init__(
        self, out_dir: str, ckpt_dir: str, n_docs: int, d_avr: float,
        block_max: bool, segment_max_postings: int = 1_000_000,
        resume: bool = True, ckpt_token: str = "",
    ):
        self.out_dir = out_dir
        self.ckpt_dir = ckpt_dir
        self.n_docs = n_docs
        self.d_avr = d_avr
        self.block_max = block_max
        self.segment_max_postings = segment_max_postings
        self.resume = resume
        self.ckpt_token = ckpt_token

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._build_one(int(pid)) for pid in batch["pid"].to_pylist()]
        return pa.concat_tables(out)

    def _build_one(self, pid: int) -> pa.Table:
        t0 = time.perf_counter()
        blob_path = os.path.join(self.out_dir, POSTINGS_DIR, f"part-{pid:05d}.bin")
        lex_path = os.path.join(self.out_dir, LEXICON_DIR, f"part-{pid:05d}.parquet")
        meta_path = os.path.join(self.out_dir, PARTS_META_DIR, f"part-{pid:05d}.json")
        # Resume skip: only when asked to resume AND the existing outputs were
        # built from the SAME checkpoint (token = input fingerprint) — a
        # ``resume=False`` build always re-encodes (stale-output fix, ADVICE r1).
        if (
            self.resume
            and os.path.exists(meta_path)
            and os.path.exists(blob_path)
            and os.path.exists(lex_path)
        ):
            with open(meta_path) as f:
                meta = json.load(f)
            # the token gate only binds when this build knows its fingerprint;
            # fingerprint-less resumes keep trusting existing outputs
            if not self.ckpt_token or meta.get("ckpt_token", "") == self.ckpt_token:
                meta["skipped"] = True
                return pa.table({"partition": [pid], "metrics": [json.dumps(meta)]})

        import pyarrow.dataset as pads

        part_dir = os.path.join(self.ckpt_dir, f"partition={pid}")
        if not os.path.isdir(part_dir):
            meta = {"partition": pid, "rows": 0, "n_terms": 0, "blob_bytes": 0,
                    "wall_s": 0.0, "skipped": False, "ckpt_token": self.ckpt_token}
            mf.atomic_write_bytes(blob_path, b"")
            import pyarrow.parquet as pq

            os.makedirs(os.path.dirname(lex_path), exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "term": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64()),
                        "seg": pa.array([], pa.int32()),
                        "seg_df": pa.array([], pa.int64()),
                        "first_doc": pa.array([], pa.int64()),
                        "partition": pa.array([], pa.int32()),
                        "offset": pa.array([], pa.int64()),
                        "nbytes": pa.array([], pa.int64()),
                        "max_score": pa.array([], pa.float32()),
                    }
                ),
                lex_path,
            )
            mf.atomic_write_json(meta_path, meta)
            return pa.table({"partition": [pid], "metrics": [json.dumps(meta)]})

        group = pads.dataset(part_dir).to_table(columns=["term", "doc_id", "tf", "dl"])
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

        # heavy-hitter split: a term with df > segment_max_postings is cut
        # into doc-range segments, each an independent list (its own delta
        # base and skip tables).  The reader stitches segments in doc order,
        # so no worker ever needs a whole hot list in memory; IDF/block-max
        # still use the TERM-TOTAL df via score_dfs.
        seg_terms: list[str] = []
        seg_starts: list[int] = [0]
        seg_no: list[int] = []
        seg_total_df: list[int] = []
        smax = self.segment_max_postings
        for i, t in enumerate(uniq_terms):
            s, e = int(term_starts[i]), int(term_starts[i + 1])
            df_total = e - s
            n_segs = max(1, (df_total + smax - 1) // smax) if smax else 1
            size = (df_total + n_segs - 1) // n_segs
            for j in range(n_segs):
                seg_terms.append(t)
                seg_starts.append(min(s + (j + 1) * size, e))
                seg_no.append(j)
                seg_total_df.append(df_total)
        seg_starts_arr = np.array(seg_starts, dtype=np.int64)

        enc = compress.encode_term_lists(
            seg_terms,
            seg_starts_arr,
            doc_ids,
            tfs,
            doc_lens=dls,
            n_docs=self.n_docs,
            d_avr=self.d_avr,
            block_max=self.block_max,
            score_dfs=np.array(seg_total_df, dtype=np.int64),
        )
        mf.atomic_write_bytes(blob_path, enc.blob)
        first_docs = doc_ids[seg_starts_arr[:-1]] if len(doc_ids) else np.array([], np.int64)
        lex_tbl = pa.table(
            {
                "term": pa.array(enc.terms, pa.string()),
                "df": pa.array(np.array(seg_total_df, np.int64), pa.int64()),
                "seg": pa.array(np.array(seg_no, np.int32), pa.int32()),
                "seg_df": pa.array(enc.dfs, pa.int64()),
                "first_doc": pa.array(first_docs, pa.int64()),
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
            "ckpt_token": self.ckpt_token,
        }
        mf.atomic_write_json(meta_path, meta)
        return pa.table({"partition": [pid], "metrics": [json.dumps(meta)]})


def _fingerprint(source: str | list[str] | rd.Dataset) -> str:
    if isinstance(source, rd.Dataset):
        # Schema alone would let two same-shaped corpora satisfy a stale
        # resume (round-3 verdict).  Fold in row count and an ORDER-
        # INDEPENDENT content hash (wraparound sum of per-row hashes —
        # Ray block arrival order is not deterministic, so an order-
        # sensitive sample would false-alarm on legitimate resumes).
        # This is one streaming pass over the Dataset; path-backed
        # callers use the cheap stat() branch below, and callers that
        # cannot afford a pass may pass their own input_fingerprint.
        import pandas as pd

        def h(batch: pa.Table) -> pa.Table:
            hv = pd.util.hash_pandas_object(
                batch.to_pandas(), index=False
            ).to_numpy()
            with np.errstate(over="ignore"):
                s = np.uint64(hv.view(np.uint64).sum())
            return pa.table(
                {
                    "n": pa.array([batch.num_rows], pa.int64()),
                    "h": pa.array([int(s)], pa.uint64()),
                }
            )

        parts = source.map_batches(h, batch_format="pyarrow").take_all()
        n = sum(p["n"] for p in parts)
        tot = 0
        for p in parts:
            tot = (tot + int(p["h"])) & ((1 << 64) - 1)
        return f"dataset:{source.schema()}:n={n}:h={tot:016x}"
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
    segment_max_postings: int = 1_000_000,
) -> IndexManifest:
    """Build a full index at ``out_dir`` from a (doc_id, url, text, dl) Dataset.

    ``source_ds`` comes from ``sources.webpages.load_webpages`` (quirk-
    faithful doc_ids) or ``sources.documents.load_documents``.
    """
    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, CKPT_DIR)
    phase_s: dict[str, float] = {}
    t_phase = time.perf_counter()

    def _lap(name: str) -> None:
        nonlocal t_phase
        phase_s[name] = round(time.perf_counter() - t_phase, 3)
        t_phase = time.perf_counter()

    # ---- Phase 1: parse/tokenize -> hive-partitioned checkpoint.  The write
    # IS the shuffle: rows land in partition=<fnv(term)%P>/ dirs (doc rows in
    # partition=-1/), so phase 3 builds each partition from its own directory
    # with zero groupby.  Skipped wholesale on resume — but only for the SAME
    # input: resuming over a different corpus must fail loudly, not silently
    # serve a stale index.
    if resume and mf.is_complete(ckpt) and input_fingerprint:
        try:
            prev = json.load(open(mf.marker_path(ckpt))).get("fingerprint", "")
        except (OSError, ValueError):
            prev = ""
        if prev and prev != input_fingerprint:
            raise ValueError(
                f"resume requested at {out_dir} but the checkpoint was built from a "
                f"different input (fingerprint {prev!r} != {input_fingerprint!r}); "
                "use a fresh out_dir or resume=False"
            )
    if not resume:
        # fresh build into a possibly non-empty out_dir: drop every stale
        # artifact so nothing is appended to or served from a previous run
        for sub in (CKPT_DIR, DOCS_DIR, POSTINGS_DIR, LEXICON_DIR, PARTS_META_DIR):
            p = os.path.join(out_dir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p)
    if not (resume and mf.is_complete(ckpt)):
        # write_parquet APPENDS into an existing directory; a checkpoint dir
        # without its _SUCCESS marker is an interrupted phase-1 write — wipe
        # it or a resumed build would index every row twice (ADVICE r1).
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt)
        combined = source_ds.map_batches(
            TokenizePostings(num_partitions, drop_trailing=drop_trailing),
            batch_format="pyarrow",
            zero_copy_batch=True,
            **({"concurrency": tokenize_concurrency} if tokenize_concurrency else {}),
        )
        # The read -> tokenize -> hive-write chain fuses into single tasks, so
        # postings NEVER cross the object store (which is a serial ~160 MB/s
        # resource in this sandbox).  Each task emits one file per partition
        # value; source row groups should therefore be sized so the task
        # count stays a small multiple of the worker count.
        combined.write_parquet(ckpt, partition_cols=["partition"])
        mf.mark_complete(ckpt, {"fingerprint": input_fingerprint})
    _lap("parse_tokenize_ckpt")

    # ---- Phase 2: docs table + global stats (reads only partition=-1)
    docs_dir = os.path.join(out_dir, DOCS_DIR)
    doc_rows_dir = os.path.join(ckpt, f"partition={DOC_ROWS_PARTITION}")
    if not os.path.isdir(doc_rows_dir):
        # every input doc was filtered out (or the corpus was empty): no doc
        # rows were ever written — synthesize an empty docs table
        import pyarrow.parquet as _pq

        os.makedirs(docs_dir, exist_ok=True)
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                    "url": pa.array([], pa.string()),
                }
            ),
            os.path.join(docs_dir, "empty.parquet"),
        )
        mf.mark_complete(docs_dir)
    elif not (resume and mf.is_complete(docs_dir)):
        if os.path.isdir(docs_dir):  # incomplete previous write: never append
            shutil.rmtree(docs_dir)
        rd.read_parquet(doc_rows_dir, columns=["doc_id", "dl", "url"]).write_parquet(
            docs_dir
        )
        mf.mark_complete(docs_dir)
    stats = (
        rd.read_parquet(docs_dir, columns=["doc_id", "dl"])
        .aggregate(Count(), Sum("dl"), Max("doc_id"))
    ) or {}
    n_docs = int(stats.get("count()") or 0)
    sum_dl = int(stats.get("sum(dl)") or 0)
    max_doc_id = int(stats["max(doc_id)"]) + 1 if n_docs else 0
    d_avr = (sum_dl / (n_docs - 1)) if n_docs > 1 else float(sum_dl)  # quirk Q6
    _lap("docs_and_stats")

    # ---- Phase 3: per-partition encode, one task per partition directory
    builder = BuildPartition(
        out_dir, ckpt, n_docs, d_avr, block_max, segment_max_postings,
        resume=resume, ckpt_token=input_fingerprint,
    )
    metrics_rows = (
        rd.from_items([{"pid": p} for p in range(num_partitions)])
        .map_batches(builder, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
    partitions = {
        str(r["partition"]): json.loads(r["metrics"]) for r in metrics_rows
    }
    _lap("shuffle_and_encode")

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
            "phase_seconds": phase_s,
        },
    )
    man.save(out_dir)
    return man
