"""Index reader: lexicon + doc table + block-skipping posting cursors.

Query-side equivalent of the reference's ``init_query_database`` +
``openList``/``nextGEQ``/``getFreq`` (/root/reference/src/query.c:62-71,
src/inverted_list.c:15-90).  The lexicon and doc stats load once per
reader (i.e. once per query actor); posting blobs are memory-mapped so
block decodes read straight from the page cache.

The cursor exposes both semantics:

* ``next_geq(k)`` — the reference's DESTRUCTIVE cursor (quirk Q-C): it
  consumes every posting it passes, including the one it returns.
* ``seek_geq(k)`` / ``advance()`` — textbook non-consuming iteration,
  used by the correct-mode engines and block-max WAND.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq

from ..stages import compress
from .manifest import IndexManifest
from .reader_docs import DocTable

EXHAUSTED = -1


class PostingCursor:
    """Forward iterator over one term's compressed posting list."""

    __slots__ = (
        "meta", "max_doc_id", "df", "max_score", "_blk", "_i",
        "_docs", "_tfs", "curr_doc", "curr_freq", "term", "order",
        "_preloaded", "bound_scale", "bound_cap",
    )

    def __init__(self, buf: np.ndarray, *, block_max: bool, max_doc_id: int,
                 max_score: float = 0.0, term: str = ""):
        self.meta = compress.open_list(buf, block_max=block_max)
        self.max_doc_id = max_doc_id
        self.df = self.meta.df
        self.max_score = max_score
        self.term = term
        self._blk = -1          # index of the decoded block (-1: none yet)
        self._i = 0             # position within the decoded block
        self._docs = None
        self._tfs = None
        self.curr_doc = EXHAUSTED   # doc at the cursor (seek semantics)
        self.curr_freq = 0
        self.order = 0              # position in the engine's df-sorted list set
        self._preloaded = False
        # sharded serving: baked block/term bounds use BUILD-time (shard-
        # local) stats; QueryEngine rescales them to stay valid under the
        # injected global triple (see QueryEngine._set_bound_scale)
        self.bound_scale = 1.0
        self.bound_cap: float | None = None

    # -- internals ---------------------------------------------------------
    def preload(self) -> None:
        """Bulk-decode the whole list once; iteration semantics unchanged.

        Worth it when a caller will touch most blocks anyway (dense DAAT
        against a hot list): one vectorized pass replaces thousands of
        per-block decodes.  Only valid before any iteration has started.
        """
        if self._preloaded or self._blk >= 0:
            return
        self._docs, self._tfs = compress.decode_all_blocks(self.meta, 0)
        self._blk = 0
        self._i = 0
        self._preloaded = True

    def _load_block(self, b: int) -> None:
        prev = int(self.meta.last_docs[b - 1]) if b > 0 else 0
        self._docs, self._tfs = self.meta.decode_block(b, prev)
        self._blk = b
        self._i = 0

    def _position_geq(self, k: int) -> bool:
        """Move the (block, i) position to the first remaining posting with
        doc >= k.  Returns False when exhausted."""
        if self._preloaded:
            j = self._i + int(np.searchsorted(self._docs[self._i:], k))
            if j < len(self._docs):
                self._i = j
                return True
            return False
        if self._blk >= 0 and self._i < len(self._docs) and self.meta.last_docs[self._blk] >= k:
            j = self._i + int(np.searchsorted(self._docs[self._i:], k))
            if j < len(self._docs):
                self._i = j
                return True
            nxt = self._blk + 1
        else:
            nxt = self._blk + 1 if self._blk >= 0 else 0
        # skip whole blocks whose last doc < k
        rel = int(np.searchsorted(self.meta.last_docs[nxt:], k))
        b = nxt + rel
        if b >= self.meta.n_blocks:
            return False
        self._load_block(b)
        self._i = int(np.searchsorted(self._docs, k))
        # last_docs[b] >= k guarantees a hit within the block
        return True

    # -- reference-conformance (destructive) API ---------------------------
    def next_geq(self, k: int) -> int:
        """Quirk Q-C: returns first remaining doc >= k and consumes it.
        Returns ``max_doc_id`` when exhausted (intended D2-free bound)."""
        if not self._position_geq(k):
            self.curr_doc = self.max_doc_id
            return self.max_doc_id
        doc = int(self._docs[self._i])
        self.curr_freq = int(self._tfs[self._i])
        self.curr_doc = doc
        self._i += 1
        return doc

    # -- correct (non-consuming) API ---------------------------------------
    def seek_geq(self, k: int) -> int:
        """Position at the first remaining doc >= k without consuming it."""
        if self.curr_doc != EXHAUSTED and self.curr_doc >= k and self._blk >= 0 and self._i < len(self._docs):
            return self.curr_doc
        if not self._position_geq(k):
            self.curr_doc = self.max_doc_id
            self.curr_freq = 0
            return self.max_doc_id
        self.curr_doc = int(self._docs[self._i])
        self.curr_freq = int(self._tfs[self._i])
        return self.curr_doc

    def advance(self) -> int:
        """Step past the current posting and land on the next one."""
        self._i += 1
        return self.seek_geq(0 if self.curr_doc == EXHAUSTED else self.curr_doc + 1)

    # -- block-max support -------------------------------------------------
    def block_max_geq(self, k: int) -> float:
        """Upper-bound score of the block that would contain the first
        doc >= k (0.0 when exhausted or metadata absent)."""
        if self.meta.block_max is None:
            return float(self.max_score)
        start = self._blk if self._blk >= 0 else 0
        rel = int(np.searchsorted(self.meta.last_docs[start:], k))
        b = start + rel
        if b >= self.meta.n_blocks:
            return 0.0
        return float(self.meta.block_max[b])

    def decode_all_remaining(self) -> tuple[np.ndarray, np.ndarray]:
        """Bulk-decode from the current position to the end (vectorized OR path)."""
        if self._preloaded:
            return self._docs[self._i:], self._tfs[self._i:]
        parts_d, parts_t = [], []
        if self._blk >= 0 and self._i < len(self._docs):
            parts_d.append(self._docs[self._i:])
            parts_t.append(self._tfs[self._i:])
            start = self._blk + 1
        else:
            start = max(self._blk + 1, 0)
        d, t = compress.decode_all_blocks(self.meta, start)
        parts_d.append(d)
        parts_t.append(t)
        return np.concatenate(parts_d), np.concatenate(parts_t)


class SegmentedCursor:
    """Stitches a heavy-hitter term's doc-range segments into one logical
    posting list.  Segments are disjoint ascending doc ranges, each an
    independently-decodable list (own delta base), so stitching is pure
    iteration order — no delta rebasing at read time.  Exposes the same
    interface as :class:`PostingCursor`; ``df`` is the term-total df (the
    value BM25's ft needs), not any segment's length.
    """

    __slots__ = ("reader", "term", "df", "max_doc_id", "max_score",
                 "entries", "_si", "_cur", "curr_doc", "curr_freq", "order",
                 "bound_scale", "bound_cap")

    def __init__(self, reader: "IndexReader", term: str, df: int, entries):
        self.reader = reader
        self.term = term
        self.df = df
        self.entries = entries  # sorted by seg number == ascending doc range
        self.max_doc_id = reader.max_doc_id
        self.max_score = max(e[4] for e in entries)
        self._si = 0
        self._cur = reader._open_segment(term, entries[0])
        self.curr_doc = EXHAUSTED
        self.curr_freq = 0
        self.order = 0
        self.bound_scale = 1.0
        self.bound_cap: float | None = None

    def _next_segment(self) -> bool:
        if self._si + 1 >= len(self.entries):
            return False
        self._si += 1
        self._cur = self.reader._open_segment(self.term, self.entries[self._si])
        return True

    def next_geq(self, k: int) -> int:
        while True:
            d = self._cur.next_geq(k)
            if d < self.max_doc_id:
                self.curr_doc = d
                self.curr_freq = self._cur.curr_freq
                return d
            if not self._next_segment():
                self.curr_doc = self.max_doc_id
                return self.max_doc_id

    def seek_geq(self, k: int) -> int:
        while True:
            d = self._cur.seek_geq(k)
            if d < self.max_doc_id:
                self.curr_doc = d
                self.curr_freq = self._cur.curr_freq
                return d
            if not self._next_segment():
                self.curr_doc = self.max_doc_id
                self.curr_freq = 0
                return self.max_doc_id

    def advance(self) -> int:
        d = self._cur.advance()
        if d < self.max_doc_id:
            self.curr_doc = d
            self.curr_freq = self._cur.curr_freq
            return d
        if not self._next_segment():
            self.curr_doc = self.max_doc_id
            self.curr_freq = 0
            return self.max_doc_id
        return self.seek_geq(0)

    def block_max_geq(self, k: int) -> float:
        # valid (slightly loose) bound: current segment's block bound or any
        # later segment's whole-segment max
        bounds = [self._cur.block_max_geq(k)]
        bounds += [e[4] for e in self.entries[self._si + 1 :]]
        return max(bounds) if bounds else 0.0

    def decode_all_remaining(self) -> tuple[np.ndarray, np.ndarray]:
        d0, t0 = self._cur.decode_all_remaining()
        parts_d, parts_t = [d0], [t0]
        for e in self.entries[self._si + 1 :]:
            c = self.reader._open_segment(self.term, e)
            d, t = c.decode_all_remaining()
            parts_d.append(d)
            parts_t.append(t)
        return np.concatenate(parts_d), np.concatenate(parts_t)


class IndexReader:
    """Loads lexicon + doc table + manifest; opens posting cursors.

    The full lexicon lives in one dict per reader — the same design as
    the reference (414 MB for MS MARCO in one process).  At 10^12-doc
    scale a reader would instead hold only its assigned term shard
    (lexicon files are hash-partitioned by the same fnv(term) % P as the
    blobs, so routing is implicit); the sandbox corpus fits comfortably.
    """

    def __init__(self, index_dir: str, *, truncate_lexicon_14: bool = False):
        self.index_dir = index_dir
        self.truncate_lexicon_14 = truncate_lexicon_14
        self.manifest = IndexManifest.load(index_dir)
        self.n_docs = self.manifest.n_docs
        self.d_avr = self.manifest.d_avr
        self.max_doc_id = self.manifest.max_doc_id
        self.block_max = self.manifest.block_max

        # term -> (total_df, [(seg, pid, offset, nbytes, max_score), ...])
        self.lexicon: dict[str, tuple[int, list[tuple[int, int, int, int, float]]]] = {}
        for path in sorted(glob.glob(os.path.join(index_dir, "lexicon", "part-*.parquet"))):
            t = pq.read_table(path)
            terms = t["term"].to_pylist()
            dfs = t["df"].to_numpy()
            segs = t["seg"].to_numpy() if "seg" in t.column_names else np.zeros(len(terms), np.int32)
            pids = t["partition"].to_numpy()
            offs = t["offset"].to_numpy()
            nbs = t["nbytes"].to_numpy()
            ms = t["max_score"].to_numpy()
            for i, term in enumerate(terms):
                ent = (int(segs[i]), int(pids[i]), int(offs[i]), int(nbs[i]), float(ms[i]))
                cur = self.lexicon.get(term)
                if cur is None:
                    self.lexicon[term] = (int(dfs[i]), [ent])
                else:
                    cur[1].append(ent)

        if truncate_lexicon_14:
            # Quirk Q8 conformance (opt-in): the reference loads lexicon keys
            # into a 15-byte field and zeroes byte 14 (src/lexicon.c:56), so
            # 15-char terms collapse onto their 14-char prefix; hashmap_set
            # overwrites, and the file is globally term-sorted, so the
            # lexicographically GREATEST colliding term wins.  Query lookups
            # truncate the same way (src/query.c:251, see open_list).
            trunc: dict[str, tuple[int, list]] = {}
            for term in sorted(self.lexicon):
                trunc[term[:14]] = self.lexicon[term]
            self.lexicon = trunc

        self.docs = DocTable.load(os.path.join(index_dir, "docs"), self.max_doc_id)
        self._mmaps: dict[int, np.memmap] = {}

        # query-time tombstones (merge.mark_deleted): sorted doc_ids that
        # every query mode excludes from results WITHOUT re-encoding the
        # index.  Global stats (N, d_avr, df) intentionally still count
        # tombstoned docs until a delete_docs() compaction — the Lucene
        # live-docs contract.
        tomb_path = os.path.join(index_dir, "tombstones.bin")
        self.tombstones = (
            np.fromfile(tomb_path, dtype=np.int64)
            if os.path.exists(tomb_path)
            else np.empty(0, np.int64)
        )

    def _blob(self, pid: int) -> np.memmap:
        mm = self._mmaps.get(pid)
        if mm is None:
            path = os.path.join(self.index_dir, "postings", f"part-{pid:05d}.bin")
            mm = np.memmap(path, dtype=np.uint8, mode="r")
            self._mmaps[pid] = mm
        return mm

    def open_list(self, term: str):
        if self.truncate_lexicon_14:
            term = term[:14]  # Q8: query-side key truncation (src/query.c:251)
        ent = self.lexicon.get(term)
        if ent is None:
            return None
        df, segments = ent
        if len(segments) == 1:
            return self._open_segment(term, segments[0])
        return SegmentedCursor(self, term, df, sorted(segments))

    def _open_segment(self, term: str, seg: tuple[int, int, int, int, float]) -> PostingCursor:
        _segno, pid, off, nbytes, max_score = seg
        buf = np.asarray(self._blob(pid)[off : off + nbytes])
        return PostingCursor(
            buf,
            block_max=self.block_max,
            max_doc_id=self.max_doc_id,
            max_score=max_score,
            term=term,
        )

    def doc_len(self, doc_id: int) -> int:
        return int(self.docs.dl[doc_id])

    def url(self, doc_id: int) -> str:
        return self.docs.url(doc_id)
