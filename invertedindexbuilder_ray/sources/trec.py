"""TREC-file source: the reference's only real input format, Ray-Data-first.

Framing replicates the reference parser exactly (quirk Q9,
/root/reference/src/main.c:237-305):

* scan for ``<TEXT>\\n``; content runs to the next ``</TEXT>`` with the
  final newline excluded (``len = e - s - 1``), so a rendered
  ``url\\ntext\\n`` block yields content ``url\\ntext``;
* the resume pointer jumps to ``end-tag + 9`` bytes (one byte PAST
  ``</TEXT>\\n``), so back-to-back ``<TEXT>`` blocks lose the following
  document;
* documents are read through fixed windows of ``INPUT_BUFFER - 1`` bytes
  with NO carry-over: a document straddling a window boundary is
  silently dropped;
* a document is kept only when its first content byte is ``'h'``
  (quirk Q4), and kept documents get dense sequential doc_ids in file
  order.

Execution shape: framing is a per-WINDOW prepass.  The Q9 windows sit at
FIXED file offsets (every ``read(window)`` advances the file position by
exactly ``window`` bytes and the scan state resets per window — no
carry-over), so each window scans independently and the prepass
parallelizes WITHIN a single file, byte-identically to the sequential
reference loop.  This matters because the reference's own flagship
corpus is ONE 22 GB file: at the default 100 MB window that is ~220
parallel scan tasks instead of one.  The driver prefix-sums kept counts
(file order, then window order) into doc_id bases — the same
plan-then-read pattern as ``sources.webpages`` — and span batches are
then read and sliced in parallel tasks.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

INPUT_BUFFER = 100 * 1024 * 1024  # reference src/main.c:14 read-buffer size

_OPEN = b"<TEXT>\n"
_CLOSE = b"</TEXT>"


def scan_trec_window(
    path: str, base: int, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """(absolute content starts, content lengths) of KEPT docs inside the
    fixed window at byte offset ``base``, Q9-faithful.  Windows are
    independent: the reference scan's state resets at each window and a
    doc straddling the boundary is dropped, so scanning window k in
    isolation yields exactly the reference's window-k docs."""
    starts: list[int] = []
    lens: list[int] = []
    with open(path, "rb") as f:
        f.seek(base)
        buf = f.read(window)
    ptr = 0
    while ptr < len(buf):
        s = buf.find(_OPEN, ptr)
        if s == -1:
            break
        s += len(_OPEN)
        e = buf.find(_CLOSE, s)
        if e == -1:
            break  # Q9: no carry-over — a straddling doc is dropped
        ptr = e + len(_CLOSE) + 2  # end tag + "\n" + 1 extra byte
        if buf[s : s + 1] != b"h":  # quirk Q4
            continue
        starts.append(base + s)
        lens.append(e - s - 1)  # strip the newline before </TEXT>
    return np.array(starts, np.int64), np.array(lens, np.int64)


def scan_trec_file(
    path: str, *, window: int = INPUT_BUFFER - 1
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential whole-file scan (the reference loop verbatim) — kept as
    the conformance re-statement the window scan is tested against."""
    size = os.path.getsize(path)
    all_s, all_l = [], []
    for base in range(0, size, window):
        s, ln = scan_trec_window(path, base, window)
        all_s.append(s)
        all_l.append(ln)
    if not all_s:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(all_s), np.concatenate(all_l)


def _scan_batch(batch: pa.Table) -> pa.Table:
    paths, widxs, starts, lens = [], [], [], []
    window = batch["window"][0].as_py()
    for i in range(batch.num_rows):
        p = batch["path"][i].as_py()
        widx = batch["widx"][i].as_py()
        s, ln = scan_trec_window(p, widx * window, window)
        paths.append(p)
        widxs.append(widx)
        starts.append(s.tobytes())
        lens.append(ln.tobytes())
    return pa.table(
        {
            "path": pa.array(paths, pa.string()),
            "widx": pa.array(widxs, pa.int64()),
            "starts": pa.array(starts, pa.binary()),
            "lens": pa.array(lens, pa.binary()),
        }
    )


class ReadTrecSpans:
    """Task: one span-chunk descriptor -> (doc_id, url, text, dl) rows.

    Content is ``url\\ntext``; ``dl`` is its byte length (quirk Q5:
    len(url) + 1 + len(text)), matching the parquet webpages source."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            starts = np.frombuffer(batch["starts"][i].as_py() or b"", np.int64)
            lens = np.frombuffer(batch["lens"][i].as_py() or b"", np.int64)
            base = batch["doc_id_base"][i].as_py()
            urls, texts = [], []
            with open(path, "rb") as f:
                for s, ln in zip(starts, lens):
                    f.seek(s)
                    content = f.read(int(ln))
                    nl = content.find(b"\n")
                    if nl == -1:
                        urls.append(content.decode("utf-8", "replace"))
                        texts.append("")
                    else:
                        urls.append(content[:nl].decode("utf-8", "replace"))
                        texts.append(content[nl + 1 :].decode("utf-8", "replace"))
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(
                            base + np.arange(len(starts), dtype=np.int64), pa.int64()
                        ),
                        "url": pa.array(urls, pa.string()),
                        "text": pa.array(texts, pa.string()),
                        "dl": pa.array(lens, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out) if out else pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "dl": pa.array([], pa.int64()),
            }
        )


SPANS_PER_TASK = 2000


def resolve_trec_paths(path: str | list[str]) -> list[str]:
    """Discover the TREC input file list (shared by load_trec and the CLI's
    content fingerprint — the fingerprint must cover the files actually
    read, not a parquet-only glob; ADVICE r2)."""
    if isinstance(path, list):
        return sorted(path)
    if os.path.isdir(path):
        return sorted(
            glob.glob(os.path.join(path, "**", "*.trec"), recursive=True)
        ) or sorted(
            p
            for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(p)
        )
    return sorted(glob.glob(path)) or [path]


def load_trec(
    path: str | list[str],
    *,
    window: int = INPUT_BUFFER - 1,
    spans_per_task: int = SPANS_PER_TASK,
) -> rd.Dataset:
    """TREC file(s) -> Dataset of (doc_id, url, text, dl), doc_ids dense
    and deterministic in file order (reference parity)."""
    paths = resolve_trec_paths(path)

    # parallel per-WINDOW framing prepass (fixed-offset windows scan
    # independently -> a single huge file fans out across the cluster)
    scan_items = [
        {"path": p, "widx": k, "window": window}
        for p in paths
        for k in range(max(1, -(-os.path.getsize(p) // window)))
    ]
    scanned = (
        rd.from_items(scan_items)  # block per item -> one scan TASK per window
        .map_batches(_scan_batch, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    by_win = {
        (r.path, r.widx): (
            np.frombuffer(r.starts, np.int64),
            np.frombuffer(r.lens, np.int64),
        )
        for r in scanned.itertuples(index=False)
    }
    # driver prefix-sum over kept counts -> per-chunk doc_id bases
    items = []
    base = 0
    for it in scan_items:  # (file, window) order, not scan-completion order
        starts, lens = by_win[(it["path"], it["widx"])]
        p = it["path"]
        for off in range(0, len(starts), spans_per_task):
            chunk_s = starts[off : off + spans_per_task]
            chunk_l = lens[off : off + spans_per_task]
            items.append(
                {
                    "path": p,
                    "starts": chunk_s.tobytes(),
                    "lens": chunk_l.tobytes(),
                    "doc_id_base": base,
                }
            )
            base += len(chunk_s)
    ds = rd.from_items(items)
    return ds.map_batches(ReadTrecSpans(), batch_format="pyarrow", batch_size=1)
