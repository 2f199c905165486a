"""Deterministic synthetic corpus (FIXTURES.md §1-2) — test inputs only.

Generates the ``webpages`` Parquet table with the exact input_hint shape
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` plus a query table.  Seeded; bit-reproducible.  The word
pool is engineered to hit every verified tokenizer quirk (SURVEY.md §8):
15- and 16+-char tokens, mixed case, digits, 1-char tokens, hot terms
(negative IDF, multi-block posting lists at >=1000 rows), rows ending in
alnum (trailing-token drop Q1) and in punctuation, non-'h' urls (doc
filter Q4), UTF-8 separators (Q3).
"""

from __future__ import annotations

import datetime
import random

import pyarrow as pa

SEED = 42

# word pool — see FIXTURES.md §1
_COMMON = [
    "the", "web", "page", "data", "index", "query", "search", "engine",
    "ray", "arrow", "build", "term", "doc", "score", "rank", "text",
    "crawl", "parse", "token", "block",
]
_DIGIT = ["zz9", "2024", "a1b2", "7", "x", "q42"]
_EXACT15 = ["abcdefghijklmno", "fifteencharword"]
_OVER15 = ["abcdefghijklmnop", "averyveryverylongtoken", "sixteencharacter"]
_MIXED = ["Hello", "WoRLD", "RayData", "BM25"]
_RARE = [f"rare{i:03d}" for i in range(40)]
_HOT = ["hotterm", "everywhere"]  # appear in most docs: negative IDF + multi-block
_MAXTERM = ["zzzz"]  # lexicographic max — pins reference defect D4 in cross-checks
_SEPARATORS = [" ", " ", " ", "  ", "\n", "\t", ", ", ". ", " é ", " 中 "]

WORD_POOL = (
    _COMMON * 6 + _DIGIT * 2 + _EXACT15 + _OVER15 + _MIXED * 2 + _RARE + _MAXTERM
)

WEBPAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def make_webpages(n_rows: int, seed: int = SEED) -> pa.Table:
    rng = random.Random(seed)
    base_ts = datetime.datetime(2025, 1, 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_rows):
        if rng.random() < 0.05:
            url = f"ftp://site{i:06d}.example.com/p{i}"  # Q4 skip path
        else:
            url = f"http://site{i:06d}.example.com/p{i}"
        n_words = rng.randint(5, 60)
        words = []
        for _ in range(n_words):
            r = rng.random()
            if r < 0.25:
                words.append(rng.choice(_HOT))
            else:
                words.append(rng.choice(WORD_POOL))
        parts = []
        for w in words:
            parts.append(w)
            parts.append(rng.choice(_SEPARATORS))
        # ~70% of rows end with an alnum word (exercises Q1 on every such row)
        if rng.random() < 0.7:
            text = "".join(parts[:-1])
        else:
            text = "".join(parts[:-1]) + rng.choice([".", "!", " ", "\n"])
        urls.append(url)
        tss.append(base_ts + datetime.timedelta(seconds=i))
        htmls.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        texts.append(text)
        langs.append("en" if rng.random() < 0.9 else rng.choice(["es", "de"]))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=WEBPAGES_SCHEMA,
    )


def make_webpages_bulk(n_rows: int, seed: int = SEED, vocab_size: int = 50_000) -> pa.Table:
    """Vectorized generator for BENCH-scale corpora (same input_hint shape).

    Words follow a Zipf-like distribution over ``vocab_size`` distinct
    terms — the realistic regime (MS MARCO: 3.2M docs, 19.8M terms): a
    hot head (negative IDF, multi-block posting lists) and a long tail,
    so query latency and lexicon size behave like webtext instead of a
    toy vocabulary.  5% non-'h' urls and ~30% punctuation-ending texts
    keep the parser quirks exercised.  The ``html`` ballast is a fixed
    wrapper — the engine never reads it (column pruning).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    pool = np.array(
        [f"w{i}" if i % 7 else f"w{i}x9" for i in range(vocab_size)], dtype=object
    )
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / (ranks + 2.7) ** 1.07
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    n_words = rng.integers(5, 61, size=n_rows)
    total = int(n_words.sum())
    word_ids = np.searchsorted(cdf, rng.random(total))
    words = pool[word_ids]
    bounds = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_words, out=bounds[1:])
    trailing_punct = rng.random(n_rows) >= 0.7
    texts = []
    for i in range(n_rows):
        t = " ".join(words[bounds[i] : bounds[i + 1]])
        texts.append(t + "." if trailing_punct[i] else t)
    is_ftp = rng.random(n_rows) < 0.05
    urls = [
        (f"ftp://site{i:07d}.example.com/p{i}" if is_ftp[i]
         else f"http://site{i:07d}.example.com/p{i}")
        for i in range(n_rows)
    ]
    base = datetime.datetime(2025, 1, 1)
    tss = [base + datetime.timedelta(seconds=int(i)) for i in range(n_rows)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array([b"<html/>"] * n_rows, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_rows, pa.string()),
        },
        schema=WEBPAGES_SCHEMA,
    )


def make_queries(seed: int = SEED) -> list[dict]:
    """The conformance query set (FIXTURES.md §2): mode 0=AND, 1=OR."""
    rng = random.Random(seed + 1)
    fixed = [
        ("hotterm", 0, 10),
        ("hotterm", 1, 10),
        ("rare007", 0, 5),
        ("the web", 0, 10),
        ("the web", 1, 10),
        ("index query search", 0, 10),
        ("index query search", 1, 10),
        ("hotterm rare003", 0, 5),
        ("hotterm rare003", 1, 5),
        ("notinindexterm", 0, 5),
        ("abcdefghijklmnop zzzz", 1, 5),  # >15-char term ignored
        ("Hello WoRLD", 0, 10),  # mixed case -> lowercased
        ("zz9 2024", 1, 10),
        ("x the", 0, 10),
        ("zzzz", 1, 5),
    ]
    out = [
        {"query_id": i, "terms": t, "mode": m, "k": k}
        for i, (t, m, k) in enumerate(fixed)
    ]
    for j in range(10):
        n = rng.randint(1, 5)
        terms = " ".join(rng.choice(_COMMON + _RARE + _HOT) for _ in range(n))
        out.append(
            {
                "query_id": len(fixed) + j,
                "terms": terms,
                "mode": rng.randint(0, 1),
                "k": rng.choice([5, 10]),
            }
        )
    return out


def render_trec(table: pa.Table) -> bytes:
    """Render rows as a TREC file (FIXTURES.md §4) — offline binary cross-checks only."""
    chunks = []
    for i in range(table.num_rows):
        url = table["url"][i].as_py()
        text = table["text"][i].as_py()
        chunks.append(
            f"<DOC>\n<DOCNO>D{i}</DOCNO>\n<TEXT>\n{url}\n{text}\n</TEXT>\n</DOC>\n".encode()
        )
    return b"".join(chunks)
