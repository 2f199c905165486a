"""Curation-tier semantics: gopher repetition, PII scan, decontamination,
tf-idf top terms, stratified sampling (pipelines/curation.py).

The sf-level SQL-parity gate lives in test_catalog_vs_duckdb.py; these
pin the hand-checkable semantics and the split invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from invertedindexbuilder_ray.pipelines.curation import (
    DECON_MAX_BENCH_SHINGLES,
    decontaminate_ds,
    gopher_repetition_ds,
    pii_scan_ds,
    stratified_sample_ds,
    tfidf_top_terms_ds,
)


def _docs_ds(texts, langs=None, blocks=1):
    import ray.data as rd

    n = len(texts)
    cols = {
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts),
    }
    if langs is not None:
        cols["lang"] = pa.array(langs)
    ds = rd.from_arrow(pa.table(cols))
    return ds.repartition(blocks) if blocks > 1 else ds


# ---------------------------------------------------------------------------
# gopher repetition


def test_gopher_counts_hand_checked(ray_session):
    # doc 0: 6 tokens, 3 distinct, top bigram "a a" (x2)
    df = (
        gopher_repetition_ds(_docs_ds(["a a a b b c", "x y z"]))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[0, "n_tokens"] == 6
    assert df.loc[0, "n_distinct"] == 3
    assert df.loc[0, "top_bigram_n"] == 2
    assert df.loc[0, "dup_frac"] == 0.5
    assert df.loc[0, "top_bigram_frac"] == pytest.approx(2 * 2 / 6, abs=1e-6)
    assert df.loc[1, "n_tokens"] == 3
    assert df.loc[1, "n_distinct"] == 3
    assert df.loc[1, "dup_frac"] == 0.0
    # both fail the n_tokens >= 20 gate
    assert df["passes"].tolist() == [0, 0]


def test_gopher_pass_flag(ray_session):
    # 24 distinct-ish tokens, low repetition -> passes
    good = " ".join(f"w{i}" for i in range(24))
    # 24 tokens of pure repetition -> dup_frac = 23/24 -> fails
    bad = " ".join(["rep"] * 24)
    df = (
        gopher_repetition_ds(_docs_ds([good, bad]))
        .to_pandas()
        .set_index("doc_id")
    )
    assert df.loc[0, "passes"] == 1
    assert df.loc[1, "passes"] == 0
    assert df.loc[1, "top_bigram_n"] == 23


def test_gopher_empty_doc(ray_session):
    df = gopher_repetition_ds(_docs_ds(["", "a b"])).to_pandas()
    row = df.set_index("doc_id").loc[0]
    assert row["n_tokens"] == 0 and row["dup_frac"] == 0.0 and row["passes"] == 0


# ---------------------------------------------------------------------------
# PII scan


def test_pii_counts_and_redaction(ray_session):
    texts = [
        "mail me at jo.doe@corp.io or admin@x.co thanks",
        "server 192.168.0.1 and 10.0.0.255 up",
        "clean text only",
    ]
    df = (
        pii_scan_ds(_docs_ds(texts), augment=False)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[0, "n_emails"] == 2 and df.loc[0, "n_ips"] == 0
    assert df.loc[1, "n_ips"] == 2 and df.loc[1, "n_emails"] == 0
    assert df.loc[2, "n_emails"] == 0 and df.loc[2, "n_ips"] == 0
    # redacted: "mail me at <EMAIL> or <EMAIL> thanks"
    assert df.loc[0, "redacted_len"] == len("mail me at <EMAIL> or <EMAIL> thanks")
    assert df.loc[1, "redacted_len"] == len("server <IP> and <IP> up")
    assert df.loc[2, "redacted_len"] == len(texts[2])


def test_pii_augmentation_deterministic(ray_session):
    # doc 0 gets BOTH suffixes (0 % 7 == 0 % 11 == 0)
    df = pii_scan_ds(_docs_ds(["base"] * 2), augment=True).to_pandas()
    d0 = df.set_index("doc_id").loc[0]
    assert d0["n_emails"] == 1 and d0["n_ips"] == 1
    d1 = df.set_index("doc_id").loc[1]
    assert d1["n_emails"] == 0 and d1["n_ips"] == 0


# ---------------------------------------------------------------------------
# decontamination


def test_decontaminate_explicit_benchmark(ray_session):
    bench_text = " ".join(f"b{i}" for i in range(8))  # exactly one shingle
    docs = [
        bench_text + " tail1 tail2",  # contains the benchmark shingle once
        " ".join(f"c{i}" for i in range(10)),  # clean
        "short doc",  # < 8 tokens -> no shingles
    ]
    bench = _docs_ds([bench_text])
    df = (
        decontaminate_ds(_docs_ds(docs), benchmark=bench)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[0, "n_shingles"] == 3  # 10 tokens -> 3 windows
    assert df.loc[0, "n_contaminated"] == 1
    assert df.loc[0, "contaminated"] == 1
    assert df.loc[1, "n_contaminated"] == 0 and df.loc[1, "contaminated"] == 0
    assert df.loc[2, "n_shingles"] == 0 and df.loc[2, "contaminated"] == 0


def test_decontaminate_split_invariant(ray_session):
    texts = [" ".join(f"t{(i * 7 + j) % 13}" for j in range(20)) for i in range(60)]
    one = (
        decontaminate_ds(_docs_ds(texts, blocks=1)).to_pandas().sort_values("doc_id")
    )
    many = (
        decontaminate_ds(_docs_ds(texts, blocks=7)).to_pandas().sort_values("doc_id")
    )
    assert one.reset_index(drop=True).equals(many.reset_index(drop=True))


def test_decontaminate_bench_bound(ray_session, monkeypatch):
    import invertedindexbuilder_ray.pipelines.curation as cur

    monkeypatch.setattr(cur, "DECON_MAX_BENCH_SHINGLES", 2)
    texts = [" ".join(f"u{i}x{j}" for j in range(12)) for i in range(3)]
    with pytest.raises(ValueError, match="benchmark shingle set exceeds"):
        cur.decontaminate_ds(_docs_ds(texts), benchmark=_docs_ds(texts))


# ---------------------------------------------------------------------------
# tf-idf top terms


def test_tfidf_rank_order(ray_session):
    # "common" appears in all docs (df=3), "rare" only in doc 0 (df=1).
    docs = [
        "common common rare",
        "common other other",
        "common xyz",
    ]
    df = tfidf_top_terms_ds(_docs_ds(docs), k=2).to_pandas()
    d0 = df[df["doc_id"] == 0].sort_values("rank")
    # tf ties at 2 vs 1: "common" tf=2 ranks first (tf desc), then
    # "rare" (tf=1) — df asc breaks ties only at equal tf
    assert d0["term"].tolist() == ["common", "rare"]
    assert d0["tf"].tolist() == [2, 1]
    assert d0["df"].tolist() == [3, 1]
    # idf payload: rare (df=1) scores log2(4/2)=1, common log2(4/4)=0
    s = d0.set_index("term")["score"]
    assert s["rare"] == 1.0
    assert s["common"] == 0.0
    assert (df.groupby("doc_id")["rank"].max() <= 2).all()


def test_tfidf_split_invariant(ray_session):
    texts = [" ".join(f"v{(i + j) % 9}" for j in range(15)) for i in range(80)]
    cols = ["doc_id", "term", "tf", "df", "score", "rank"]
    one = (
        tfidf_top_terms_ds(_docs_ds(texts, blocks=1))
        .to_pandas()[cols]
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    many = (
        tfidf_top_terms_ds(_docs_ds(texts, blocks=9))
        .to_pandas()[cols]
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert one.equals(many)


# ---------------------------------------------------------------------------
# stratified sampling


def test_stratified_rates_and_determinism(ray_session):
    from invertedindexbuilder_ray.pipelines.catalog import SAMPLE_MULT
    from invertedindexbuilder_ray.pipelines.curation import (
        STRATA_DEFAULT_RATE,
        STRATA_RATES,
    )

    n = 4000
    langs = [["en", "zh", "ko"][i % 3] for i in range(n)]
    texts = ["some text"] * n
    ds = _docs_ds(texts, langs=langs)
    got = stratified_sample_ds(ds).to_pandas()
    # recompute expected membership
    ids = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        bucket = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(100)
    rates = np.array(
        [STRATA_RATES.get(l, STRATA_DEFAULT_RATE) for l in langs], np.uint64
    )
    want_ids = np.flatnonzero(bucket < rates)
    assert sorted(got["doc_id"].tolist()) == want_ids.tolist()
    # en kept far less than zh (10% vs 80%)
    kept = got.groupby("lang").size()
    assert kept["en"] < kept["zh"]
    # unknown lang uses the default rate bucket
    assert set(got["lang"]) == {"en", "zh", "ko"}
    again = stratified_sample_ds(_docs_ds(texts, langs=langs)).to_pandas()
    assert sorted(again["doc_id"].tolist()) == want_ids.tolist()


# ---------------------------------------------------------------------------
# substring dup spans


def test_substring_dup_hand_checked(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import substring_dup_spans_ds

    shared = " ".join(f"s{i}" for i in range(20))  # exactly one 20-token window
    docs = [
        shared + " extra1 extra2",  # 22 tokens -> 3 windows, 1 shared
        shared,  # 20 tokens -> 1 window, shared
        " ".join(f"u{i}" for i in range(25)),  # unique -> 6 windows, 0 dup
        "tiny doc",  # < 20 tokens -> 0 windows
    ]
    df = (
        substring_dup_spans_ds(_docs_ds(docs), augment=False)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[0, "n_windows"] == 3 and df.loc[0, "n_dup_windows"] == 1
    assert df.loc[1, "n_windows"] == 1 and df.loc[1, "n_dup_windows"] == 1
    assert df.loc[1, "dup_frac"] == 1.0 and df.loc[1, "has_dup"] == 1
    assert df.loc[2, "n_dup_windows"] == 0 and df.loc[2, "has_dup"] == 0
    assert df.loc[3, "n_windows"] == 0 and df.loc[3, "has_dup"] == 0


def test_substring_dup_within_one_doc_not_counted(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import substring_dup_spans_ds

    # the same window twice in ONE doc is repetition, not cross-doc dup
    block = " ".join(f"r{i}" for i in range(20))
    df = (
        substring_dup_spans_ds(_docs_ds([block + " gap " + block]), augment=False)
        .to_pandas()
    )
    assert df["n_dup_windows"].tolist() == [0]


def test_substring_dup_split_invariant(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import substring_dup_spans_ds

    texts = [" ".join(f"t{(i * 3 + j) % 11}" for j in range(30)) for i in range(50)]
    texts += texts[:5]  # cross-doc dups
    one = (
        substring_dup_spans_ds(_docs_ds(texts, blocks=1), augment=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    many = (
        substring_dup_spans_ds(_docs_ds(texts, blocks=8), augment=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)
    # the 5 cloned docs and their sources are flagged
    assert one[one["has_dup"] == 1].shape[0] >= 10


# ---------------------------------------------------------------------------
# length outlier filter


def test_length_outlier_filter(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import length_outlier_filter_ds

    # 100 docs of length ~5..500; the 5%/95% band must drop both tails
    texts = ["x" * (5 * (i + 1)) for i in range(100)]
    df = length_outlier_filter_ds(_docs_ds(texts)).to_pandas()
    kept = sorted(df["n_chars"].tolist())
    assert len(df) < 100
    # quantile_disc(0.05) of 5,10,...,500 is 25; 0.95 is 475
    assert kept[0] == 25 and kept[-1] == 475
    assert df["doc_id"].is_unique


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix scan)


def test_sequence_pack_hand_checked(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import sequence_pack_ds

    # token counts: 3, 2, 4 -> exclusive offsets 0, 3, 5
    docs = ["a b c", "d e", "f g h i"]
    df = (
        sequence_pack_ds(_docs_ds(docs), seq_len=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df["n_tokens"].tolist() == [3, 2, 4]
    assert df["tok_offset"].tolist() == [0, 3, 5]
    assert df["seq_id"].tolist() == [0, 0, 1]


def test_sequence_pack_multibucket_and_split_invariant(ray_session, monkeypatch):
    import invertedindexbuilder_ray.pipelines.curation as cur

    # force the two-level scan across many buckets (width=8 over 100 docs)
    monkeypatch.setattr(cur, "SEQ_PACK_MIN_BUCKET", 8)
    texts = [" ".join("w" * 1 for _ in range((i * 13) % 7 + 1)) for i in range(100)]
    one = (
        cur.sequence_pack_ds(_docs_ds(texts, blocks=1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    many = (
        cur.sequence_pack_ds(_docs_ds(texts, blocks=9))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)
    # offsets are the serial exclusive cumsum
    want = np.concatenate([[0], np.cumsum(one["n_tokens"].to_numpy())[:-1]])
    assert one["tok_offset"].tolist() == want.tolist()
    assert (one["seq_id"] == one["tok_offset"] // 256).all()


# ---------------------------------------------------------------------------
# fuzzy term join (edit distance <= 1)


def test_fuzzy_pairs_hand_checked(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import fuzzy_term_pairs_ds

    # vocab: substitution (cat/bat), deletion (cat/at), insertion
    # (cat/cart), far word (dog), ed=2 pair (cat/ca_ -> none vs dog)
    df = (
        fuzzy_term_pairs_ds(_docs_ds(["cat bat at cart dog scan"]), augment=False)
        .to_pandas()
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    pairs = set(map(tuple, df[["term_a", "term_b"]].itertuples(index=False)))
    assert ("bat", "cat") in pairs  # substitution
    assert ("at", "cat") in pairs  # deletion
    assert ("cart", "cat") in pairs  # insertion
    assert ("at", "bat") in pairs
    assert not any("dog" in p or "scan" in p for p in pairs)
    assert (df["dist"] == 1).all()
    # canonical order and no self/dup pairs
    assert (df["term_a"] < df["term_b"]).all()
    assert not df.duplicated(["term_a", "term_b"]).any()


def test_fuzzy_pairs_recall_vs_bruteforce(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import fuzzy_term_pairs_ds

    # deterministic vocab with planted neighbors
    words = sorted(
        {f"w{i}xy"[: 3 + i % 4] for i in range(40)}
        | {"alpha", "alpia", "alph", "aalpha", "beta", "betta"}
    )
    text = " ".join(words)

    def ed(a: str, b: str) -> int:
        import numpy as _np

        dp = _np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev = dp.copy()
            dp[0] = i
            for j, cb in enumerate(b, 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (ca != cb))
        return int(dp[-1])

    want = {
        (a, b)
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if ed(a, b) <= 1
    }
    got = set(
        map(
            tuple,
            fuzzy_term_pairs_ds(_docs_ds([text]), augment=False)
            .to_pandas()[["term_a", "term_b"]]
            .itertuples(index=False),
        )
    )
    assert got == want and len(want) > 0


def test_fuzzy_pairs_split_invariant(ray_session):
    from invertedindexbuilder_ray.pipelines.curation import fuzzy_term_pairs_ds

    texts = [f"base{i % 11} base{(i + 1) % 11}x tail{i % 5}" for i in range(60)]
    one = (
        fuzzy_term_pairs_ds(_docs_ds(texts, blocks=1))
        .to_pandas().sort_values(["term_a", "term_b"]).reset_index(drop=True)
    )
    many = (
        fuzzy_term_pairs_ds(_docs_ds(texts, blocks=7))
        .to_pandas().sort_values(["term_a", "term_b"]).reset_index(drop=True)
    )
    assert one.equals(many) and len(one) > 0
