"""Doc table: dense doc_id -> (dl, url) arrays loaded from the docs parquet.

Equivalent of the reference's heap-resident ``doc_table``
(/root/reference/src/query.c:29-52).  ``dl`` is a dense int64 array
indexed by doc_id (doc_ids are dense for the webpages source; the
documents-table source may leave holes, which stay 0/empty).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq


@dataclass
class DocTable:
    dl: np.ndarray          # int64, indexed by doc_id
    urls: np.ndarray        # object, indexed by doc_id

    @classmethod
    def load(cls, docs_dir: str, max_doc_id: int) -> "DocTable":
        dl = np.zeros(max_doc_id, dtype=np.int64)
        urls = np.full(max_doc_id, "", dtype=object)
        for path in sorted(glob.glob(os.path.join(docs_dir, "**", "*.parquet"), recursive=True)):
            t = pq.read_table(path, columns=["doc_id", "dl", "url"])
            ids = t["doc_id"].to_numpy()
            dl[ids] = t["dl"].to_numpy()
            urls[ids] = np.asarray(t["url"].to_pylist(), dtype=object)
        return cls(dl=dl, urls=urls)

    def url(self, doc_id: int) -> str:
        return str(self.urls[doc_id])
