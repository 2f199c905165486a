"""Posting-list block codec: VarByte + delta blocks with skip + block-max.

Per-term on-disk grammar (reference-compatible core, SURVEY.md §9.1,
/root/reference/src/model_support.c:127-270; our addition is the
block-max section, which the reference format lacks):

    list := df(vb)
            ldoc_table_nbytes(vb)
            bsize_table_nbytes(vb)
            [last_doc_id(vb)] * B          # absolute, per block (skip table)
            [block_nbytes(vb)] * B         # per-block byte size
            [block_max_score float32 LE] * B   # extension: block-max BM25 (optional)
            B x ( [doc_delta(vb)] * m  [tf(vb)] * m )   # m <= 128

``B = ceil(df / 128)``.  Doc-id deltas are taken against the previous
posting of the WHOLE list (they carry across block boundaries — verified
reference behavior, SURVEY.md §1.4); the first delta is the absolute
first doc_id.  With ``block_max=False`` the bytes are exactly the
reference's (useful for byte-level conformance checks).

Encoding is batched: callers encode a whole partition's postings with
three vectorized VarByte calls (deltas, tfs, headers) and per-term
assembly is slicing, so the per-term Python overhead is small.  This
runs inside the index-build actor pool.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions import varbyte

BLOCK_SIZE = 128  # reference include/model.h:87
K1 = 1.2
B_PARAM = 0.75


@dataclass
class EncodedPartition:
    """All posting blobs of one partition, concatenated, plus lexicon data."""

    blob: bytes
    terms: list[str]
    dfs: np.ndarray        # int64 per term
    offsets: np.ndarray    # int64 byte offset of each term's list in blob
    nbytes: np.ndarray     # int64 byte length of each term's list
    max_scores: np.ndarray  # float32 per term (max BM25 contribution; 0 if disabled)


def bm25_components(
    tfs: np.ndarray, dls: np.ndarray, df: int, n_docs: int, d_avr: float
) -> np.ndarray:
    """Vectorized reference BM25 (quirk Q7: log2, k1=1.2, b=0.75, idf may be
    negative — src/query.c:80-86)."""
    idf = np.log2((n_docs - df + 0.5) / (df + 0.5))
    tf = tfs.astype(np.float64)
    return idf * (K1 + 1) * tf / (K1 * ((1 - B_PARAM) + B_PARAM * dls / d_avr) + tf)


def encode_term_lists(
    terms: list[str],
    term_starts: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    *,
    doc_lens: np.ndarray | None = None,
    n_docs: int = 0,
    d_avr: float = 0.0,
    block_max: bool = True,
) -> EncodedPartition:
    """Encode many terms' postings at once.

    ``term_starts`` (len = n_terms + 1) delimits each term's slice of the
    sorted ``doc_ids`` / ``tfs`` arrays (ascending doc_id within term).
    ``doc_lens`` aligns with postings (the per-posting document length)
    and is only needed when ``block_max`` is on.
    """
    n_terms = len(terms)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dfs = np.diff(term_starts).astype(np.int64)

    # deltas: within-term diff; first posting of each term keeps its absolute id
    deltas = np.empty_like(doc_ids)
    if len(doc_ids):
        deltas[0] = doc_ids[0]
        deltas[1:] = doc_ids[1:] - doc_ids[:-1]
        deltas[term_starts[:-1][term_starts[:-1] < len(doc_ids)]] = doc_ids[
            term_starts[:-1][term_starts[:-1] < len(doc_ids)]
        ]

    enc_deltas, sz_deltas = varbyte.encode(deltas)
    enc_tfs, sz_tfs = varbyte.encode(tfs)
    dend = np.cumsum(sz_deltas)
    dstart = dend - sz_deltas
    tend = np.cumsum(sz_tfs)
    tstart = tend - sz_tfs

    scores = None
    if block_max:
        if doc_lens is None:
            raise ValueError("block_max=True requires per-posting doc_lens")
        scores = np.zeros(len(doc_ids), dtype=np.float64)
        # idf depends on df -> per-term broadcast
        df_per_posting = np.repeat(dfs, dfs)
        idf = np.log2((n_docs - df_per_posting + 0.5) / (df_per_posting + 0.5))
        tf = tfs.astype(np.float64)
        scores = idf * (K1 + 1) * tf / (
            K1 * ((1 - B_PARAM) + B_PARAM * np.asarray(doc_lens, dtype=np.float64) / d_avr)
            + tf
        )

    pieces: list[bytes] = []
    offsets = np.zeros(n_terms, dtype=np.int64)
    lengths = np.zeros(n_terms, dtype=np.int64)
    max_scores = np.zeros(n_terms, dtype=np.float32)
    pos = 0
    for i in range(n_terms):
        s, e = int(term_starts[i]), int(term_starts[i + 1])
        df = e - s
        n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
        block_bounds = np.arange(s, e + BLOCK_SIZE, BLOCK_SIZE)
        block_bounds[-1] = e
        if block_bounds[-2] >= e:
            block_bounds = block_bounds[:-1]
        last_docs = doc_ids[block_bounds[1:] - 1]
        # per-block payload bytes = sum of delta sizes + tf sizes in the block
        dbytes = dend[block_bounds[1:] - 1] - dstart[block_bounds[:-1]]
        tbytes = tend[block_bounds[1:] - 1] - tstart[block_bounds[:-1]]
        block_nbytes = dbytes + tbytes

        enc_ldoc, _ = varbyte.encode(last_docs)
        enc_bsize, _ = varbyte.encode(block_nbytes)
        header, _ = varbyte.encode(
            np.array([df, len(enc_ldoc), len(enc_bsize)], dtype=np.int64)
        )
        parts = [header.tobytes(), enc_ldoc.tobytes(), enc_bsize.tobytes()]
        if block_max:
            bmax = np.array(
                [scores[b0:b1].max() for b0, b1 in zip(block_bounds[:-1], block_bounds[1:])],
                dtype=np.float32,
            )
            parts.append(bmax.tobytes())
            max_scores[i] = bmax.max()
        for b0, b1 in zip(block_bounds[:-1], block_bounds[1:]):
            parts.append(enc_deltas[dstart[b0] : dend[b1 - 1]].tobytes())
            parts.append(enc_tfs[tstart[b0] : tend[b1 - 1]].tobytes())
        blob_i = b"".join(parts)
        pieces.append(blob_i)
        offsets[i] = pos
        lengths[i] = len(blob_i)
        pos += len(blob_i)

    return EncodedPartition(
        blob=b"".join(pieces),
        terms=list(terms),
        dfs=dfs,
        offsets=offsets,
        nbytes=lengths,
        max_scores=max_scores,
    )


@dataclass
class DecodedList:
    """Parsed metadata of one term's compressed list (blocks decoded lazily)."""

    df: int
    last_docs: np.ndarray       # absolute last doc_id per block
    block_nbytes: np.ndarray
    block_starts: np.ndarray    # byte offset of each block within buf
    block_counts: np.ndarray    # postings per block
    block_max: np.ndarray | None
    buf: np.ndarray             # the full list bytes (uint8)

    @property
    def n_blocks(self) -> int:
        return len(self.last_docs)

    def decode_block(self, b: int, prev_last_doc: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode block ``b`` -> (absolute doc_ids, tfs).

        ``prev_last_doc`` is the last doc_id of block ``b-1`` (0 for the
        first block): deltas carry across blocks.
        """
        m = int(self.block_counts[b])
        start = int(self.block_starts[b])
        chunk = self.buf[start : start + int(self.block_nbytes[b])]
        deltas, used = varbyte.decode(chunk, count=m)
        tfs, _ = varbyte.decode(chunk[used:], count=m)
        docs = np.cumsum(deltas) + prev_last_doc
        return docs, tfs


def open_list(buf: np.ndarray, *, block_max: bool = True) -> DecodedList:
    """Parse one term's list metadata from its byte slice."""
    buf = np.asarray(buf, dtype=np.uint8)
    head, used = varbyte.decode(buf, count=3)
    df, ldoc_nbytes, bsize_nbytes = (int(x) for x in head)
    p = used
    last_docs, _ = varbyte.decode(buf[p : p + ldoc_nbytes])
    p += ldoc_nbytes
    block_nbytes, _ = varbyte.decode(buf[p : p + bsize_nbytes])
    p += bsize_nbytes
    n_blocks = len(last_docs)
    bmax = None
    if block_max:
        bmax = np.frombuffer(buf[p : p + 4 * n_blocks].tobytes(), dtype=np.float32)
        p += 4 * n_blocks
    block_starts = np.zeros(n_blocks, dtype=np.int64)
    if n_blocks:
        block_starts[0] = p
        block_starts[1:] = p + np.cumsum(block_nbytes)[:-1]
    block_counts = np.full(n_blocks, BLOCK_SIZE, dtype=np.int64)
    if n_blocks:
        block_counts[-1] = df - BLOCK_SIZE * (n_blocks - 1)
    return DecodedList(
        df=df,
        last_docs=last_docs,
        block_nbytes=block_nbytes,
        block_starts=block_starts,
        block_counts=block_counts,
        block_max=bmax,
        buf=buf,
    )


def decode_full(buf: np.ndarray, *, block_max: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Decode a whole list -> (doc_ids, tfs). Test / small-list helper."""
    dl = open_list(buf, block_max=block_max)
    docs_all, tfs_all = [], []
    prev = 0
    for b in range(dl.n_blocks):
        docs, tfs = dl.decode_block(b, prev)
        prev = int(dl.last_docs[b])
        docs_all.append(docs)
        tfs_all.append(tfs)
    if not docs_all:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(docs_all), np.concatenate(tfs_all)
