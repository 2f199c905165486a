"""The shared half-away rounding helpers must agree with DuckDB's round()
bit-for-bit — including at exact ties, where numpy/Python/pandas/Arrow
defaults (half-to-even) diverge (round-1 `quality` red cell)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from invertedindexbuilder_ray.functions.rounding import (
    pc_round_half_away,
    round_half_away,
)


@pytest.mark.parametrize("decimals", [0, 2, 6])
def test_matches_duckdb_on_ties_and_fuzz(decimals):
    rng = np.random.RandomState(decimals + 1)
    ints = rng.randint(-(10**6), 10**6, 5000)
    ties = (ints + 0.5) / 10**decimals  # lands exactly on .5 when representable
    # sums of 2-decimal "cents" values: the class where Arrow's reciprocal-
    # multiply round diverges from DuckDB's divide by one ULP (199.42 case)
    cents = rng.randint(0, 10**5, (5000, 8)) / 100.0
    vals = np.concatenate(
        [
            ties,
            rng.uniform(-1e4, 1e4, 5000),
            cents.sum(axis=1),
            np.array([0.8203125, -0.8203125, 0.125, -0.125, 0.0, -0.0]),
        ]
    )
    con = duckdb.connect()
    want = con.execute(
        "SELECT round(x, ?) AS r FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        [decimals, vals.tolist()],
    ).fetchnumpy()["r"]
    con.close()
    np.testing.assert_array_equal(round_half_away(vals, decimals), want)
    np.testing.assert_array_equal(
        pc_round_half_away(pa.array(vals), decimals).to_numpy(), want
    )


def test_known_tie_cases():
    # the exact round-1 failure: 0.8203125 at 6 decimals
    assert round_half_away(0.8203125, 6) == 0.820313
    assert np.round(0.8203125, 6) == 0.820312  # what numpy would have said
    assert round_half_away(-0.8203125, 6) == -0.820313
    assert round_half_away(2.5, 0) == 3.0
    assert round_half_away(-2.5, 0) == -3.0
    assert isinstance(round_half_away(1.2345, 2), float)  # scalar in, scalar out
