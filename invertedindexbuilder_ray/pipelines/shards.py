"""Document-partitioned query tier: scatter-gather BM25 over N shard
indexes, rank-identical to one monolithic index.

At 10^12 docs a single ``IndexReader`` is impossible — its doc-length
table alone is terabytes — so production serving document-partitions the
corpus: each shard is a normal index over a corpus slice (exactly what
``build_index`` per slice / ``merge_indexes`` inputs are), queries fan
out to per-shard searcher ACTORS (the one place the engine drops to raw
``@ray.remote``: a shard's warm lexicon + doc table is long-lived
mutable state no Dataset op expresses), and per-shard top-k results
merge on the driver.

Rank identity with the monolithic index is NOT automatic — BM25 scores
depend on corpus-GLOBAL statistics — and is achieved by injecting them:

1. a df prepass sums each query term's document frequency across shards
   (lexicon lookups only, no posting decode);
2. every shard scores with the global (n_docs, d_avr, df) triple, so a
   doc's score is bit-identical to the monolithic computation;
3. a term that exists globally but not in a shard makes that shard
   return nothing for conjunctive queries (the monolithic AND could
   never match its docs) instead of silently AND-ing fewer terms;
4. selection runs under the deterministic TOTAL ORDER (score desc,
   doc_id asc) at every level — per-shard engines are constructed with
   ``total_order_topk=True`` and the merge re-selects under the same
   order.  Exact-top-k-under-a-total-order is a pure function of the
   candidate SET, so local top-k ⊇ the global winners inside each shard
   and the merged result is EXACTLY the total-order top-k of the whole
   corpus.

One DOCUMENTED deviation: the reference heap (quirk Q-T) is NOT a total
order — which member survives among EQUAL scores depends on the heap
array layout, i.e. the full insertion history including evicted docs
(counterexample in ``tests/test_shards.py::test_ref_heap_ties_are_not_
distributable``).  No distributed merge can replay that from per-shard
top-ks, so sharded serving defines its semantics as the total order
above: same scores, deterministic tie membership and order.  The
monolithic engine keeps the quirk heap for reference conformance.

Block-max WAND is available INSIDE each shard for disjunctive queries
(``algorithm="wand"``): the per-block upper bounds baked at build time
use SHARD-local stats, but a valid bound under the injected global
triple is the baked bound scaled by ``(idf_global/idf_local) * max(1,
d_avr_global/d_avr_local)`` (``QueryEngine._set_bound_scale`` — mediant
inequality on the BM25 length normalizer; negative-IDF edges clamp/cap).
Selection uses the total-order threshold (skip only on a STRICT
bound < theta, since a score tie can still win on doc id), so sharded
WAND is identical to sharded exhaustive — asserted by the fuzz tests.

WAND is OPT-IN, not the disjunctive default, on measured evidence
(BASELINE.md round-4): on the 4-shard 100k Zipf bench the vectorized
exhaustive union serves OR queries at p50 10.8 ms vs WAND's 29.5 ms,
and a bound-survival analysis with a PERFECT threshold shows term-level
pruning eliminates 0% of blocks on every multi-term query mix entry
(the rare term's UB swamps theta; hot-list block maxima sit at the
surviving margin) while the only prunable case — a single hot term —
already takes the vectorized single-list path.  Per-posting pivoting is
a win only where block DECODE dominates (native engines, 10^9-posting
lists, cold storage); in this numpy engine decode is vectorized and the
pivot loop is pure overhead.  The bound-rescale math stays, tested, for
deployments where that trade flips.

doc_id contract matches ``merge_indexes``: shard i's local ids shift by
the sum of earlier shards' ``max_doc_id``.
"""

from __future__ import annotations

from ..oracle import tokenize as oracle_tokenize
from ..state.manifest import IndexManifest
from .query import CNF, CONJUNCTIVE, _total_topk


def _make_searcher():
    import ray

    @ray.remote
    class ShardSearcher:
        """One warm engine per corpus shard (lexicon + doc table loaded
        once, reused across queries)."""

        def __init__(self, index_dir: str, doc_id_offset: int, conformance: bool):
            from .query import QueryEngine

            self.engine = QueryEngine(
                index_dir, conformance=conformance, total_order_topk=True
            )
            self.offset = doc_id_offset

        def term_dfs(self, terms: list[str]) -> dict[str, int]:
            out = {}
            for t in set(terms):
                c = self.engine.reader.open_list(t)
                if c is not None:
                    out[t] = int(c.df)
            return out

        def search(
            self,
            terms: list[str],
            k: int,
            mode: int,
            n_docs: int,
            d_avr: float,
            dfs: dict[str, int],
            algorithm: str | None = None,
        ) -> list[tuple[int, float]]:
            eng = self.engine
            flat = (
                [t for g in terms for t in g] if mode == CNF else terms
            )
            local = self.term_dfs(flat)
            if mode == CONJUNCTIVE and any(
                t in dfs and t not in local for t in terms
            ):
                # globally-present term absent from this shard: no local doc
                # can satisfy the monolithic AND
                return []
            r = eng.reader
            saved = (r.n_docs, r.d_avr, eng.df_override)
            r.n_docs, r.d_avr = n_docs, d_avr
            eng.df_override = dfs
            try:
                if mode == CNF:
                    # groups-of-terms payload; per-doc coverage is local,
                    # so a group with no term in this shard correctly
                    # yields [] here (its docs live in other shards)
                    ranked = eng.cnf(terms, k)
                elif mode == CONJUNCTIVE:
                    ranked = eng.conjunctive(terms, k)
                elif algorithm == "wand" and r.block_max:
                    # block-max WAND with globally rescaled bounds —
                    # identical result to the exhaustive union (fuzz-
                    # asserted), fewer DECODED blocks.  Opt-in, not the
                    # default: see module docstring for the measured
                    # reasoning.
                    ranked = eng.wand(terms, k)
                else:
                    ranked = eng.disjunctive(terms, k)
            finally:
                r.n_docs, r.d_avr, eng.df_override = saved
            return [(doc + self.offset, score) for doc, score in ranked]

    return ShardSearcher


class ShardedEngine:
    """Scatter-gather searcher over document-partitioned shard indexes."""

    def __init__(
        self,
        index_dirs: list[str],
        *,
        conformance: bool = False,
        offset_doc_ids: bool = True,
    ):
        """``offset_doc_ids`` follows the ``merge_indexes`` contract: True
        when shards were built from consecutive corpus slices with LOCAL
        dense ids (webpages source); False when the source already carries
        globally unique doc_ids (documents-table source)."""
        mans = [IndexManifest.load(d) for d in index_dirs]
        self.n_docs = sum(m.n_docs for m in mans)
        sum_dl = sum(m.sum_dl for m in mans)
        # quirk Q6 over the UNION — matches the merged index's manifest
        self.d_avr = (
            sum_dl / (self.n_docs - 1) if self.n_docs > 1 else float(sum_dl)
        )
        cls = _make_searcher()
        self.actors = []
        off = 0
        for d, m in zip(index_dirs, mans):
            self.actors.append(cls.remote(d, off if offset_doc_ids else 0, conformance))
            off += m.max_doc_id
        # term dfs are static per index — cache so repeated vocabulary
        # skips the prepass RPC round (0 = globally absent)
        self._df_cache: dict[str, int] = {}

    def search_terms(
        self,
        terms: list[str],
        k: int = 10,
        mode: int = CONJUNCTIVE,
        algorithm: str | None = None,
    ) -> list[tuple[int, float]]:
        """``algorithm`` is a measurement/testing hook: None (default)
        lets each shard pick block-max WAND for disjunctive queries when
        its index carries block-max data; "exhaustive" forces the full
        union scan (identical results, more scored blocks)."""
        import ray

        # CNF mode carries groups-of-terms; everything term-level below
        # (df prepass, overrides) works on the flattened set
        flat = (
            [t for g in terms for t in g] if mode == CNF else list(terms)
        )
        # phase 1: global df per term (lexicon lookups only, cached)
        missing = [t for t in set(flat) if t not in self._df_cache]
        if missing:
            dfs_list = ray.get(
                [a.term_dfs.remote(missing) for a in self.actors]
            )
            for t in missing:
                self._df_cache[t] = sum(d.get(t, 0) for d in dfs_list)
        dfs = {
            t: self._df_cache[t] for t in set(flat) if self._df_cache[t] > 0
        }
        # phase 2: per-shard top-k under the GLOBAL stats triple
        results = ray.get(
            [
                a.search.remote(
                    terms, k, mode, self.n_docs, self.d_avr, dfs, algorithm
                )
                for a in self.actors
            ]
        )
        # merge: exact top-k of the candidate union under the same total
        # order the shards selected with (see module docstring)
        cands = [c for r in results for c in r]
        return _total_topk(
            [c[0] for c in cands], [c[1] for c in cands], k
        )

    def search(
        self,
        query: str,
        k: int = 10,
        mode: int = CONJUNCTIVE,
        algorithm: str | None = None,
    ):
        if mode == CNF:
            groups = [
                toks
                for g in query.split(";")
                if (toks := oracle_tokenize(g + " ", drop_trailing=True))
            ]
            return self.search_terms(groups, k, mode, algorithm)
        return self.search_terms(
            oracle_tokenize(query + " ", drop_trailing=True), k, mode, algorithm
        )
