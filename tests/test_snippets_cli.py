from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from invertedindexbuilder_ray import oracle


def test_snippet_quirks():
    # last positive window wins; short docs (no full 512B window) -> ""
    text = ("filler " * 80) + "needle one " + ("pad " * 160) + "needle two " + ("x " * 300)
    snip = oracle.generate_snippet(text, ["needle"])
    assert snip != ""
    # the LAST window containing 'needle' wins (reference max_score quirk)
    data = text.encode()
    wins = [
        data[s : s + 512]
        for s in range(0, len(data), 512)
        if s + 512 < len(data) and b"needle" in data[s : s + 512]
    ]
    # token must be terminated inside the window to count; find last scoring one
    scoring = [
        w for w in wins if "needle" in oracle.tokenize(w)
    ]
    assert snip.encode() == scoring[-1][:511]
    assert oracle.generate_snippet("short text", ["short"]) == ""


def test_attach_snippets_pipeline(ray_session):
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.query import attach_snippets

    docs = [
        {"doc_id": 7, "text": "alpha " * 200 + "beta gamma " + "alpha " * 200},
        {"doc_id": 9, "text": "tiny"},
    ]
    docs_ds = rd.from_arrow(pa.Table.from_pylist(docs))
    results = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {"query_id": 0, "rank": 1, "doc_id": 7, "score": 1.0},
                {"query_id": 1, "rank": 1, "doc_id": 9, "score": 0.5},
            ]
        )
    )
    out = attach_snippets(results, docs_ds, {0: ["beta"], 1: ["tiny"]}).to_pandas()
    out = out.set_index("query_id")
    assert out.loc[0, "snippet"] == oracle.generate_snippet(docs[0]["text"], ["beta"])
    assert "beta" in out.loc[0, "snippet"]
    assert out.loc[1, "snippet"] == ""  # no full window in a 4-byte doc


def test_prefix_sample_fraction(ray_session, webpages_medium, tmp_path):
    from invertedindexbuilder_ray.sources.webpages import load_webpages

    src = tmp_path / "wp"
    src.mkdir()
    pq.write_table(webpages_medium, src / "a.parquet", row_group_size=100)
    full = load_webpages(str(src)).count()
    part = load_webpages(str(src), prefix_fraction=0.3).count()
    assert 0 < part < full
    # deterministic prefix: doc_ids are 0..part-1 and match the full run's prefix
    ids = sorted(r["doc_id"] for r in load_webpages(str(src), prefix_fraction=0.3).take_all())
    assert ids == list(range(part))


def test_cli_build_and_query(ray_session, tmp_path, capsys):
    from invertedindexbuilder_ray.cli import main

    idx = str(tmp_path / "idx")
    rc = main(
        [
            "build", "--input", "/root/testdata/sf0.001", "--out", idx,
            "--format", "documents", "--partitions", "4",
        ]
    )
    assert rc == 0
    rc = main(["query", "--index", idx, "--terms", "data merge", "--k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "BM25" in out and "[1]" in out


def test_cli_run_pipeline(ray_session, tmp_path):
    """`run` executes a catalog pipeline and writes parquet; `--list` shows
    the catalog."""
    import io
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq_

    from invertedindexbuilder_ray.cli import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["run", "--list"]) == 0
    names = buf.getvalue().split()
    assert "corpus_clean" in names and "dedup_minhash" in names

    out = str(tmp_path / "langs")
    with redirect_stdout(io.StringIO()):
        assert main(["run", "--pipeline", "lang_counts",
                     "--input", "/root/testdata/sf0.001", "--out", out]) == 0
    rows = pq_.read_table(out).to_pylist()
    assert sum(r["n_docs"] for r in rows) == 500

    import pytest

    with pytest.raises(SystemExit, match="unknown pipeline"):
        main(["run", "--pipeline", "nope", "--input", "x"])
