"""token_entropy determinism contract: the fixed-point log2 table
(`curation._log2_fp`) must agree with DuckDB's ``CAST(round(log2(x)*1e9)
AS BIGINT)`` for EVERY value the entry can feed it.  DuckDB's and
numpy's ``log2`` differ by 1 ulp on ~0.8% of integer inputs, so the
agreement of the *rounded table* is an empirical property of the two
libm builds — this test verifies it exhaustively over the asserted
runtime domain [1, 2^16), turning "hopefully close enough" into a
checked invariant (any toolchain drift fails here, not in the driver).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from invertedindexbuilder_ray.pipelines.curation import (
    ENTROPY_LOG_SCALE,
    ENTROPY_MAX_TF,
    _log2_fp,
)


def test_log2_fp_matches_duckdb_exhaustively():
    k = np.arange(1, ENTROPY_MAX_TF, dtype=np.int64)
    mine = _log2_fp(k)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT CAST(round(log2(x::DOUBLE) * {ENTROPY_LOG_SCALE}) AS BIGINT) "
        f"FROM range(1, {ENTROPY_MAX_TF}) t(x) ORDER BY x"
    ).fetchnumpy()
    theirs = next(iter(got.values())).astype(np.int64)
    mismatch = np.nonzero(mine != theirs)[0]
    assert mismatch.size == 0, (
        f"fixed-point log2 diverges from DuckDB at k={mismatch[:5] + 1}"
    )


def test_log2_fp_domain_guard():
    with pytest.raises(ValueError, match="fixed-point log2 domain"):
        _log2_fp(np.array([ENTROPY_MAX_TF], dtype=np.int64))


def test_entropy_formula_matches_float_reference():
    # the fixed-point pipeline must still BE entropy: compare against a
    # straight float evaluation within quantization tolerance
    rng = np.random.default_rng(7)
    tf = rng.integers(1, 500, size=200).astype(np.int64)
    dl = int(tf.sum())
    h_float = np.log2(dl) - float(np.sum(tf * np.log2(tf))) / dl
    num = float(_log2_fp(np.array([dl]))[0] * dl - int(np.sum(tf * _log2_fp(tf))))
    h_fp = num / (dl * ENTROPY_LOG_SCALE)
    assert abs(h_fp - h_float) < 1e-6


def test_log2_fp_ext_matches_duckdb_formula():
    """_log2_fp_ext's shift-first quantization == the SQL expression
    round(log2(k >> s)*1e9) + s*1e9 (s = bitlen-16) over the large-k
    domain bigram_llr reaches; in-domain it IS the verified table."""
    import duckdb
    import numpy as np

    from invertedindexbuilder_ray.pipelines.textpipe import _log2_fp_ext

    rng = np.random.RandomState(11)
    ks = np.unique(
        np.concatenate(
            [
                rng.randint(1, 1 << 16, 500),
                rng.randint(1 << 16, 1 << 26, 1500),
                np.array([1, 2, 65535, 65536, 65537, (1 << 26) - 1]),
            ]
        )
    ).astype(np.int64)
    got = _log2_fp_ext(ks)
    con = duckdb.connect()
    want = con.execute(
        """
        SELECT CAST(round(log2(k >> s) * 1000000000) AS BIGINT)
               + s * 1000000000
        FROM (
            SELECT k, greatest(length(bin(k))::BIGINT - 16, 0) AS s
            FROM (SELECT unnest(?) AS k)
        )
        """,
        [[int(k) for k in ks]],
    ).fetchnumpy()
    key = next(iter(want))
    assert np.array_equal(got, want[key].astype(np.int64))
