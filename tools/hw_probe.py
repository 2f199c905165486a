#!/usr/bin/env python
"""Ray-free hardware scaling probe for the scaling-efficiency criterion.

Runs the engine's own tokenize kernel (the build hot loop) over identical
row-group tasks with plain ``multiprocessing`` — no Ray, no object store —
at several process counts, and prints per-level wall time + pairwise
efficiency.  This isolates what the MACHINE gives a perfectly-parallel
text pipeline: on this Firecracker VM the shared memory bus saturates at
~9 effective cores, so any 2->8 (or higher) pair is bandwidth-capped
regardless of the execution engine.  A real N->4N node cluster multiplies
memory bandwidth with node count; this box cannot.

    python tools/hw_probe.py [n_docs] [levels...]    # default 400000 1 2 4 8
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _work(args):
    path, rg = args
    import pyarrow.parquet as pq

    from invertedindexbuilder_ray.functions.tokenize import tokenize_to_postings

    tbl = pq.ParquetFile(path).read_row_group(rg, columns=["url", "text"])
    import numpy as np

    doc_ids = np.arange(tbl.num_rows, dtype=np.int64)
    terms, docs, tfs = tokenize_to_postings(tbl["text"], doc_ids)
    return len(docs)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    levels = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8]

    from bench import ensure_bench_corpus

    corpus = ensure_bench_corpus(n_docs)
    import pyarrow.parquet as pq

    tasks = []
    for f in sorted(os.listdir(corpus)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(corpus, f)
        for rg in range(pq.ParquetFile(p).metadata.num_row_groups):
            tasks.append((p, rg))
    for p, rg in tasks:  # warm page cache
        pq.ParquetFile(p).read_row_group(rg, columns=["url", "text"])

    results = {}
    for lvl in levels:
        t0 = time.perf_counter()
        if lvl == 1:
            total = sum(_work(t) for t in tasks)
        else:
            with mp.Pool(lvl) as pool:
                total = sum(pool.map(_work, tasks, chunksize=1))
        results[lvl] = time.perf_counter() - t0
        print(f"procs={lvl:2d}  wall={results[lvl]:7.2f}s  postings={total}")
    for lo, hi in zip(levels, levels[1:]):
        eff = (results[lo] / results[hi]) / (hi / lo)
        print(f"efficiency {lo}->{hi}: {eff:.3f}")
    if 2 in results and 8 in results:
        print(f"efficiency 2->8: {(results[2]/results[8])/4:.3f}")
    if 1 in results and 4 in results:
        print(f"efficiency 1->4: {(results[1]/results[4])/4:.3f}")


if __name__ == "__main__":
    main()
