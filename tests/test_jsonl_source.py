"""JSONL source contract: same (doc_id, url, text, dl) schema as the
parquet adapter, so the whole engine runs unchanged on .jsonl corpora —
proven by building an index from both sources and comparing manifests
byte-for-byte.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from invertedindexbuilder_ray.pipelines.build import build_index
from invertedindexbuilder_ray.sources.documents import (
    load_documents,
    load_documents_jsonl,
)

TEXTS = [
    "the quick brown fox",
    "pack my box with five dozen jugs",
    "ray data streams blocks with backpressure",
    "",
    "duplicate duplicate duplicate terms terms",
] * 8


def _write_both(tmp_path):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    # two jsonl shards WITHOUT ids: exercises the per-file offset numbering
    half = len(TEXTS) // 2
    for i, chunk in enumerate([TEXTS[:half], TEXTS[half:]]):
        with open(os.path.join(str(tmp_path), f"part{i}.jsonl"), "w") as f:
            for t in chunk:
                f.write(json.dumps({"text": t}) + "\n")
    return str(tmp_path)


def _index_fingerprint(index_dir):
    import hashlib

    h = hashlib.md5()
    for root, _dirs, files in sorted(os.walk(index_dir)):
        for f in sorted(files):
            if f.endswith((".bin", ".lex")) or "postings" in f:
                h.update(open(os.path.join(root, f), "rb").read())
    return h.hexdigest()


def test_jsonl_builds_identical_index(ray_session, tmp_path):
    d = _write_both(tmp_path)
    pq_docs = load_documents(os.path.join(d, "documents.parquet"))
    jl_docs = load_documents_jsonl(d)

    a = jl_docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pq_docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    assert a["dl"].tolist() == b["dl"].tolist()

    out_a = os.path.join(d, "idx_pq")
    out_b = os.path.join(d, "idx_jl")
    man_a = build_index(pq_docs, out_a, num_partitions=4)
    man_b = build_index(jl_docs, out_b, num_partitions=4)
    assert man_a.n_docs == man_b.n_docs
    assert man_a.stats["total_postings"] == man_b.stats["total_postings"]
    assert _index_fingerprint(out_a) == _index_fingerprint(out_b)


def test_jsonl_with_explicit_ids(ray_session, tmp_path):
    p = os.path.join(str(tmp_path), "x.jsonl")
    with open(p, "w") as f:
        for i, t in enumerate(["alpha beta", "gamma"]):
            f.write(json.dumps({"id": 100 + i, "text": t, "url": f"u{i}"}) + "\n")
    df = load_documents_jsonl(p).to_pandas().sort_values("doc_id")
    assert df["doc_id"].tolist() == [100, 101]
    assert df["url"].tolist() == ["u0", "u1"]
