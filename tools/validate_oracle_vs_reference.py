#!/usr/bin/env python
"""Validate oracle.py against the PATCHED reference binary (SURVEY.md §0 redo).

Builds a scratch copy of /root/reference with the two crash fixes applied
(D1 double-fclose, D2 posting-iterator exhaustion bound — SURVEY.md §8;
/root/reference itself is never touched), renders the deterministic fixture
corpus as a TREC file, runs the binary's build + query REPL, and compares
its top-k (URLs + 6-decimal BM25) against the Python oracle:

* conjunctive queries -> oracle conformance mode (destructive cursor Q-C)
* single-term disjunctive -> oracle disjunctive

Known-defect terms are excluded: the lexicographically last term (D4) and
df==1 lists whose only posting is doc 0 (D3).

Usage: python tools/validate_oracle_vs_reference.py   (prints PASS/FAIL)
       python tools/validate_oracle_vs_reference.py --dump-goldens PATH
           additionally records the binary's per-query output (urls +
           scores) plus the defect-exclusion sets as JSON, so sandboxes
           WITHOUT gcc can still assert oracle-vs-binary conformance
           from the recorded goldens (tests/test_reference_binary.py).
"""

from __future__ import annotations

import json
import re
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = Path("/root/reference")
WORK = Path("/tmp/refcheck")


def build_patched_binary() -> Path:
    binary = WORK / "main"
    if binary.exists():
        return binary
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    shutil.copytree(REF / "src", WORK / "src")
    shutil.copytree(REF / "include", WORK / "include")

    # D1: second fclose(f_in) in b() aborts glibc (double close)
    main_c = WORK / "src" / "main.c"
    lines = main_c.read_text().splitlines(keepends=True)
    assert "fclose(f_in);" in lines[345], lines[345]
    lines[345] = lines[345].replace("fclose(f_in);", "/* D1 patch: already closed */")
    main_c.write_text("".join(lines))

    # D2: exhaustion bound compares against a field that read_block_to_cache
    # mutates -> capture the ldoc-table end once in openList
    model_h = WORK / "include" / "model.h"
    model_h.write_text(
        model_h.read_text().replace(
            "long block_size_table_offset;",
            "long block_size_table_offset;\n    long ldoc_table_end; /* D2 patch */",
            1,
        )
    )
    il_c = WORK / "src" / "inverted_list.c"
    src = il_c.read_text()
    anchor = "iv->block_offset = iv->block_size_table_offset + block_size_table_size;"
    assert anchor in src
    src = src.replace(
        anchor, anchor + "\n    iv->ldoc_table_end = iv->block_size_table_offset; /* D2 */", 1
    )
    cond = "while(lp -> block_ldoc_table_offset < lp -> block_size_table_offset){"
    assert cond in src
    src = src.replace(
        cond, "while(lp -> block_ldoc_table_offset < lp -> ldoc_table_end){ /* D2 */", 1
    )
    il_c.write_text(src)

    subprocess.run(
        ["gcc", "-O2", "-o", str(binary), *map(str, (WORK / "src").glob("*.c")),
         "-I", str(WORK / "include"), "-lm"],
        check=True, capture_output=True,
    )
    return binary


def run_queries(binary: Path, mode: int, k: int, queries: list[str]) -> list[list[tuple[str, float]]]:
    """Run the REPL once; returns per-query [(url, bm25), ...]."""
    stdin = f"{k}\n{mode}\n" + "".join(q + "\n" for q in queries) + "\n"
    proc = subprocess.run(
        [str(binary), "-q"], cwd=WORK, input=stdin,
        capture_output=True, text=True, timeout=300,
    )
    blocks = proc.stdout.split("Showing Top")
    out: list[list[tuple[str, float]]] = []
    for blk in blocks[1:]:
        hits = re.findall(r"\[\d+\]\t(\S+)\nBM25: \t(-?[\d.]+)", blk)
        out.append([(u, float(s)) for u, s in hits])
    assert len(out) == len(queries), (len(out), len(queries), proc.stdout[-2000:])
    return out


def _duplicate_lexicon_terms() -> set[str]:
    """Defect D7 victims: terms with >1 lexicon record.

    The reference's term-map insert (`process_term`, new-entry branch)
    memcpy's the key into a malloc'd struct WITHOUT NUL-terminating the
    remainder, so `strlen`-based hashing sees trailing heap garbage and
    the term later becomes unfindable -> a second term_id is allocated.
    The string-sorted merge keeps both records (ids differ, so
    `merge_same_term` never fires) and the query-time lexicon hashmap
    keeps only the later one — silently dropping the earliest postings.
    Affected set depends on heap state; detected from the built lexicon.
    """
    import struct
    from collections import Counter

    data = (WORK / "output" / "lexicon").read_bytes()
    terms, p = [], 0
    while p < len(data):
        (length,) = struct.unpack_from("<i", data, p)
        p += 4
        terms.append(data[p : p + length].decode())
        p += length + 8
    return {t for t, n in Counter(terms).items() if n > 1}


def main(dump_goldens: str | None = None) -> int:
    from invertedindexbuilder_ray import corpus, oracle

    binary = build_patched_binary()
    rows = corpus.make_webpages(300, seed=4242).to_pylist()
    trec = corpus.render_trec(corpus.make_webpages(300, seed=4242))
    (WORK / "corpus.trec").write_bytes(trec)
    if not (WORK / "output" / "inverted_list").exists():
        r = subprocess.run(
            [str(binary), "-b", "corpus.trec"], cwd=WORK,
            capture_output=True, text=True, timeout=600,
        )
        assert (WORK / "output" / "inverted_list").exists(), r.stdout[-1500:] + r.stderr[-500:]

    ora = oracle.build_index(rows)
    last_term = max(ora.postings)  # defect D4: dropped from the binary's lexicon
    d3_terms = {
        t for t, pl in ora.postings.items() if len(pl) == 1 and pl[0][0] == 0
    }  # defect D3: tf decoded wrongly
    d7_terms = _duplicate_lexicon_terms()  # defect D7: split term ids (see SURVEY §8)
    print(f"excluding defect-affected terms: D4={{{last_term!r}}} D3={sorted(d3_terms)} "
          f"D7={sorted(d7_terms)}")

    def ok_terms(q: str) -> bool:
        toks = oracle.tokenize(q + " ")
        return all(
            t not in d3_terms and t not in d7_terms and t != last_term and len(t) <= 14
            for t in toks
        )

    conj_queries = [
        "hotterm", "the web", "index query search", "hotterm rare003",
        "zz9 2024", "x the", "rare007", "Hello WoRLD", "data engine",
        "everywhere hotterm", "the", "web page data",
    ]
    conj_queries = [q for q in conj_queries if ok_terms(q)]
    disj_single = [q for q in ["hotterm", "rare007", "zz9", "x", "the", "everywhere"] if ok_terms(q)]

    failures = []
    goldens: dict = {
        "corpus": {"n_docs": 300, "seed": 4242},
        "k": 5,
        "excluded": {
            "d3": sorted(d3_terms),
            "d4": [last_term],
            "d7": sorted(d7_terms),
        },
        "conjunctive": {},
        "disjunctive_single": {},
    }
    got_all = run_queries(binary, 0, 5, conj_queries)
    for q, got in zip(conj_queries, got_all):
        goldens["conjunctive"][q] = [[u, round(s, 6)] for u, s in got]
        terms = oracle.tokenize(q + " ")
        want = oracle.conjunctive_topk(ora, terms, 5, mode="conformance")
        want_fmt = [(ora.urls[d], round(s, 6)) for d, s in want]
        got_fmt = [(u, round(s, 6)) for u, s in got]
        if [u for u, _ in got_fmt] != [u for u, _ in want_fmt] or any(
            abs(a - b) > 2e-6 for (_, a), (_, b) in zip(got_fmt, want_fmt)
        ):
            failures.append(("AND", q, got_fmt, want_fmt))

    got_all = run_queries(binary, 1, 5, disj_single)
    for q, got in zip(disj_single, got_all):
        goldens["disjunctive_single"][q] = [[u, round(s, 6)] for u, s in got]
        terms = oracle.tokenize(q + " ")
        want = oracle.disjunctive_topk(ora, terms, 5)
        want_fmt = [(ora.urls[d], round(s, 6)) for d, s in want]
        got_fmt = [(u, round(s, 6)) for u, s in got]
        if [u for u, _ in got_fmt] != [u for u, _ in want_fmt] or any(
            abs(a - b) > 2e-6 for (_, a), (_, b) in zip(got_fmt, want_fmt)
        ):
            failures.append(("OR1", q, got_fmt, want_fmt))

    n = len(conj_queries) + len(disj_single)
    if dump_goldens and not failures:
        Path(dump_goldens).write_text(json.dumps(goldens, indent=1, sort_keys=True))
        print(f"goldens written to {dump_goldens}")
    if failures:
        for f in failures:
            print("MISMATCH:", f[0], f[1])
            print("  binary:", f[2])
            print("  oracle:", f[3])
        print(f"FAIL: {len(failures)}/{n} queries mismatched")
        return 1
    print(f"PASS: oracle matches the patched reference binary on all {n} queries "
          f"({len(conj_queries)} conjunctive, {len(disj_single)} single-term disjunctive)")
    return 0


if __name__ == "__main__":
    dump = None
    if "--dump-goldens" in sys.argv:
        dump = sys.argv[sys.argv.index("--dump-goldens") + 1]
    sys.exit(main(dump_goldens=dump))
