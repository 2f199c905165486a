"""TREC source conformance: framing quirks (Q9) + parity with the parquet
webpages source down to byte-identical index blobs."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from invertedindexbuilder_ray.sources.trec import load_trec, scan_trec_file


def _write(tmp_path, data: bytes, name="c.trec"):
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_basic_framing(ray_session, tmp_path):
    data = (
        b"<DOC>\n<DOCNO>D0</DOCNO>\n<TEXT>\nhttp://a\nhello world\n</TEXT>\n</DOC>\n"
        b"<DOC>\n<DOCNO>D1</DOCNO>\n<TEXT>\nxftp://b\nskip me\n</TEXT>\n</DOC>\n"
        b"<DOC>\n<DOCNO>D2</DOCNO>\n<TEXT>\nhttp://c\nsecond kept\n</TEXT>\n</DOC>\n"
    )
    rows = load_trec(_write(tmp_path, data)).to_pandas().sort_values("doc_id")
    assert list(rows.url) == ["http://a", "http://c"]  # Q4 'h' filter
    assert list(rows.doc_id) == [0, 1]
    assert list(rows.text) == ["hello world", "second kept"]
    # Q5: dl = len(url) + 1 + len(text)
    assert list(rows.dl) == [len("http://a") + 1 + len("hello world"),
                             len("http://c") + 1 + len("second kept")]


def test_q9_back_to_back_text_blocks_lose_next_doc(ray_session, tmp_path):
    """Resume pointer = end-tag + 9 bytes (src/main.c:270): with no <DOC>
    wrapper between TEXT blocks, the opening '<' of the next block is
    consumed and that document is lost — reference-faithful."""
    data = (
        b"<TEXT>\nhttp://a\nfirst\n</TEXT>\n"
        b"<TEXT>\nhttp://b\nlost\n</TEXT>\n"
        b"<TEXT>\nhttp://c\nthird\n</TEXT>\n"
    )
    starts, lens = scan_trec_file(_write(tmp_path, data))
    rows = load_trec(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(rows.url) == ["http://a", "http://c"]
    assert len(starts) == 2


def test_q9_window_straddle_drops_doc(tmp_path):
    """A document straddling the read-window boundary is dropped (no
    carry-over, src/main.c:258-270)."""
    doc = b"<DOC>\n<TEXT>\nhttp://a\nxxxx\n</TEXT>\n</DOC>\n"  # 42 bytes
    data = doc * 3
    # window 60: doc 1 fits; doc 2's open tag is seen but its close tag
    # falls past the window (dropped, no carry); doc 3 fits in window 2
    starts, lens = scan_trec_file(_write(tmp_path, data), window=60)
    assert len(starts) == 2  # docs 1 and 3 survive; the straddler is dropped
    assert list(starts) == [13, 60 + (2 * len(doc) + 13 - 60)]


def test_trec_index_byte_identical_to_parquet(ray_session, webpages_small, tmp_path):
    """Build from TREC == build from the equivalent parquet, bit for bit."""
    import hashlib
    import os

    from invertedindexbuilder_ray.corpus import render_trec
    from invertedindexbuilder_ray.pipelines.build import build_index
    from invertedindexbuilder_ray.sources.webpages import load_webpages

    src = tmp_path / "webpages"
    src.mkdir()
    pq.write_table(webpages_small, src / "part-000.parquet", row_group_size=25)
    trec_path = _write(tmp_path, render_trec(webpages_small))

    a = load_webpages(str(src)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = load_trec(trec_path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    out_a, out_b = str(tmp_path / "idx_pq"), str(tmp_path / "idx_trec")
    build_index(load_webpages(str(src)), out_a, num_partitions=4)
    build_index(load_trec(trec_path), out_b, num_partitions=4)

    def blobs(out):
        d = os.path.join(out, "postings")
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    assert blobs(out_a) == blobs(out_b)


def test_multi_file_doc_id_order(ray_session, tmp_path):
    """doc_ids are dense across files in sorted-path order."""
    _write(tmp_path, b"<TEXT>\nhb\nbeta\n</TEXT>\nx", "b.trec")
    _write(tmp_path, b"<TEXT>\nha\nalpha\n</TEXT>\nx", "a.trec")
    rows = load_trec(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(rows.url) == ["ha", "hb"]
    assert list(rows.doc_id) == [0, 1]
    assert rows.dl.to_numpy().dtype == np.int64


def test_single_file_parallel_window_scan_identical(ray_session, tmp_path):
    """One file spanning MANY windows must load byte-identically to the
    sequential reference scan: per-window tasks + driver prefix-sum keep
    doc_ids dense in file order, straddlers dropped per Q9."""
    doc = b"<DOC>\n<TEXT>\nhttp://u%04d\npayload %04d abc\n</TEXT>\n</DOC>\n"
    data = b"".join(doc % (i, i) for i in range(400))
    p = _write(tmp_path, data)
    window = 997  # prime -> boundaries land mid-doc, forcing Q9 drops
    seq_starts, seq_lens = scan_trec_file(p, window=window)
    rows = (
        load_trec(p, window=window, spans_per_task=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(rows) == len(seq_starts) < 400  # some straddlers dropped
    assert list(rows.doc_id) == list(range(len(seq_starts)))
    assert list(rows.dl) == list(seq_lens)
    # spot-check content against raw bytes at the sequential offsets
    for i in (0, len(rows) // 2, len(rows) - 1):
        s, ln = int(seq_starts[i]), int(seq_lens[i])
        content = data[s : s + ln].decode()
        url, text = content.split("\n", 1)
        assert rows.url[i] == url and rows.text[i] == text
