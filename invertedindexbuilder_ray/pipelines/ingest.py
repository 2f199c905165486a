"""Composed rolling ingest: dedup the incoming delta against the corpus,
then extend the index with the survivors — one entry point tying the two
incremental tiers together (round-5; builds on round-4 verdict items 1-2).

A production crawl loop ingests batches of new pages forever.  Per batch
it needs exactly this sequence:

1. ``dedup.minhash_pairs_delta`` — near-dup pairs CREATED by the delta
   (delta-vs-corpus via the durable signature checkpoint: the corpus is
   never re-sketched; plus delta-vs-delta);
2. drop the LATER side of every pair (keep-first — corpus docs always
   win over delta docs, earlier delta docs win over later ones);
3. ``merge.extend_index`` over the surviving delta — byte-identical to
   rebuilding over the concatenated deduped corpus (merge contract);
4. extend the signature checkpoint with the survivors' signatures so the
   NEXT delta bands against the updated corpus without re-sketching
   anything but itself.

Contract (the extend_index id discipline): delta doc_ids are globally
unique and numerically AFTER every corpus id — that makes "later side"
simply ``doc_b`` of each (doc_a < doc_b) pair.  Violations raise.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from .dedup import (
    minhash_pairs_delta,
    minhash_signature_ckpt,
    minhash_signature_ds,
)
from .merge import extend_index


def ingest_delta(
    index_dir: str,
    corpus_source: str,
    delta_ds: rd.Dataset,
    out_dir: str,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    dedup: bool = True,
    resume: bool = True,
    ckpt_root: str | None = None,
    corpus_fingerprint: str = "",
) -> dict:
    """Dedup ``delta_ds`` against ``corpus_source`` (and itself), extend
    ``index_dir`` with the survivors into ``out_dir``, roll the signature
    checkpoint forward.  Returns a report dict:
    ``{"manifest", "n_delta", "n_dropped", "dropped_ids", "n_pairs"}``.

    ``dedup=False`` skips straight to ``extend_index`` (still returns the
    same report shape with zero drops).

    Chained ingest: pass the previous report's ``corpus_fingerprint`` so
    the delta bands against the ROLLED signature checkpoint (corpus +
    all prior survivors) instead of re-deriving from the original corpus
    file; the report returns the next fingerprint to chain with."""
    from ..state.manifest import IndexManifest

    base_max = IndexManifest.load(index_dir).max_doc_id
    dropped_ids = np.empty(0, np.int64)
    n_pairs = 0
    if dedup:
        pairs = minhash_pairs_delta(
            corpus_source,
            delta_ds,
            num_perm=num_perm,
            bands=bands,
            k=k,
            threshold=threshold,
            ckpt_root=ckpt_root,
            corpus_fingerprint=corpus_fingerprint,
        ).materialize()  # tiny: near-dup pairs only
        n_pairs = pairs.count()
        if n_pairs:
            parts = [
                b["doc_b"].to_numpy(zero_copy_only=False)
                for b in pairs.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
            dropped_ids = np.unique(np.concatenate(parts)).astype(np.int64)
            if len(dropped_ids) and int(dropped_ids[0]) < base_max:
                raise ValueError(
                    "ingest_delta id discipline violated: delta doc_ids "
                    f"must all be >= the base index's max_doc_id ({base_max}); "
                    f"a near-dup pair's later side is {int(dropped_ids[0])}"
                )

    if len(dropped_ids):
        import ray

        dref = ray.put(dropped_ids)  # broadcast once (tiny: near-dups only)

        def drop(b: pa.Table) -> pa.Table:
            dead = ray.get(dref)
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(dead, ids)
            hit = (pos < len(dead)) & (dead[np.minimum(pos, len(dead) - 1)] == ids)
            return b.filter(pa.array(~hit))

        survivors = delta_ds.map_batches(drop, batch_format="pyarrow")
    else:
        survivors = delta_ds

    man = extend_index(
        index_dir, survivors, out_dir, offset_doc_ids=False, resume=resume
    )

    n_delta = delta_ds.count()
    next_fp = ""
    if dedup:
        # roll the signature checkpoint forward: corpus ckpt + survivor
        # signatures -> ckpt keyed by the UPDATED corpus fingerprint
        # (corpus file + out_dir manifest), so the next delta reuses it
        next_fp = _extend_sig_ckpt(
            corpus_source, survivors, out_dir,
            num_perm=num_perm, k=k, ckpt_root=ckpt_root,
            corpus_fingerprint=corpus_fingerprint,
        )
    return {
        "manifest": man,
        "n_delta": int(n_delta),
        "n_dropped": int(len(dropped_ids)),
        "dropped_ids": [int(d) for d in dropped_ids],
        "n_pairs": int(n_pairs),
        "corpus_fingerprint": next_fp,
    }


def _extend_sig_ckpt(
    corpus_source: str,
    survivors: rd.Dataset,
    out_dir: str,
    *,
    num_perm: int,
    k: int,
    ckpt_root: str | None,
    corpus_fingerprint: str = "",
) -> str:
    """Write corpus-ckpt signatures + survivor signatures under a new
    fingerprint derived from (corpus stat, new index manifest) — sketch
    compute O(|survivors|); the corpus side is a parquet copy-through.
    Returns the NEW fingerprint (chain it into the next ingest_delta)."""
    from ..state.manifest import IndexManifest

    from .build import _fingerprint
    from .dedup import _read_sig_ckpt

    man = IndexManifest.load(out_dir)
    base_fp = corpus_fingerprint or _fingerprint(_corpus_path(corpus_source))
    new_fp = f"{base_fp}+ingest:{man.input_fingerprint}:{man.n_docs}"
    base_ckpt = minhash_signature_ckpt(
        corpus_source, num_perm=num_perm, k=k, ckpt_root=ckpt_root,
        input_fingerprint=corpus_fingerprint,
    )
    merged = _read_sig_ckpt(base_ckpt).union(
        minhash_signature_ds(survivors, num_perm=num_perm, k=k)
    )

    import hashlib

    from ..state import manifest as mf

    root = ckpt_root or os.environ.get(
        "IIB_SIG_CKPT_DIR", f"/tmp/iib_sig_ckpt_{os.getuid()}"
    )
    key = hashlib.md5(
        f"{new_fp}|num_perm={num_perm}|k={k}".encode()
    ).hexdigest()[:20]
    d = os.path.join(root, key)
    if mf.is_complete(d):
        return new_fp
    import shutil

    if os.path.isdir(d):
        shutil.rmtree(d)
    merged.write_parquet(d)
    mf.mark_complete(
        d, {"fingerprint": new_fp, "num_perm": num_perm, "k": k}
    )
    return new_fp


def _corpus_path(source: str) -> str:
    return (
        os.path.join(source, "documents.parquet")
        if os.path.isdir(source)
        else source
    )
