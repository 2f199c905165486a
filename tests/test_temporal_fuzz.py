"""Fuzz the temporal/window catalog entries on RANDOM events tables.

Same driver-exact comparison as test_curation_fuzz, but over generated
``events`` parquet: small user sets, timestamps drawn from a coarse grid
(duplicate ts / simultaneous events are the tie cases that matter), all
five event types, 2-decimal values.  Only ORDER-INDEPENDENT entries are
fuzzed (count/min/max/int outputs) — a float sum/avg entry can't be
bit-compared on arbitrary inputs by construction.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

FUZZ_ENTRIES = [
    "events_asof_prior_click",
    "events_window_agg",
    "events_hourly_users",
    "events_band_join",
    "events_rolling_agg",
    "events_funnel",
    "events_props_extract",
    "events_transitions",
    "events_value_histogram",
    "user_mode_event",
    "events_value_mad",
    "user_event_path",
    "event_id_gaps",
    "sliding_distinct_users",
    "events_profile",  # event_type nulls exercise the null-count leg
    "events_retention",
    "decayed_user_score",
    "event_bursts",
    "events_cusum",
    "events_acf",
    "events_ewma",
    "events_seasonality",
    "events_trend_mk",
    "funnel_latency",
    "user_value_outliers",
    "value_sax",
    "conversion_attribution",
    "user_cohorts",
    "hll_set_ops",
]

_TYPES = ["view", "click", "purchase", "signup", "error"]

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=5),  # user_id
    st.integers(min_value=0, max_value=400),  # coarse ts grid slot
    st.integers(min_value=0, max_value=5),  # event type idx (5 = NULL)
    st.integers(min_value=0, max_value=9999),  # value cents
    st.integers(min_value=0, max_value=99),  # props k
)

_BASE_US = 1_700_000_000_000_000  # fixed epoch anchor


def _write_events(tmpdir: str, rows: list[tuple]) -> str:
    n = len(rows)
    tbl = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            # grid step 10 min: collisions + in/out of hour buckets and
            # the 1h/1d join windows
            "ts": pa.array(
                [_BASE_US + r[1] * 600_000_000 for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(
                [_TYPES[r[2]] if r[2] < 5 else None for r in rows], pa.string()
            ),
            "value": pa.array([r[3] / 100.0 for r in rows], pa.float64()),
            # k == 0 -> field-less props: exercises the NULL-extract path
            "props": pa.array(
                ['{"k": %d}' % r[4] if r[4] else '{}' for r in rows], pa.string()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def _run_pair(name: str, sf_dir: str):
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    from test_catalog_vs_duckdb import _compare, _to_df

    fn, sql = QUERIES[name]
    got = _to_df(fn(sf_dir))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    want = con.execute(sql).fetchdf()
    if len(got) == 0 and len(want) == 0:
        return  # emptiness agreement (Ray drops typed empty blocks)
    _compare(name, got, want)


@pytest.mark.parametrize("name", FUZZ_ENTRIES)
@settings(max_examples=5, deadline=None)
@given(rows=st.lists(_EVENT, min_size=1, max_size=50))
def test_temporal_fuzz_vs_duckdb(ray_session, tmp_path_factory, name, rows):
    tmpdir = str(tmp_path_factory.mktemp("fuzzev"))
    _run_pair(name, _write_events(tmpdir, rows))
