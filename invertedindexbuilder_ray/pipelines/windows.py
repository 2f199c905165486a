"""Windowed aggregates over the events stream table.

Ray Data has no event-time windowing, so windows are expressed as batch
transforms (the Ray guide's pattern): tumbling = bucket column + groupby;
sliding = explode each event to its covering windows, then groupby;
session = per-key ``map_groups`` over ts-sorted groups with a gap rule.
Ordering assumption: events within a key fit one group (hash shuffle on
the key); nothing assumes global ts order.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.rounding import pc_round_half_away, round_half_away
from ..sources.util import read_parquet_sized

US_PER_HOUR = 3_600_000_000


def _events(sf_dir: str) -> rd.Dataset:
    path = os.path.join(sf_dir, "events.parquet") if os.path.isdir(sf_dir) else sf_dir
    return read_parquet_sized(path, columns=["ts", "user_id", "event_type", "value"])


def sliding_window(
    sf_dir: str, *, size_hours: int = 2, slide_hours: int = 1
) -> rd.Dataset:
    """Per (event_type, window): count + sum over sliding windows.

    Each event belongs to ``size/slide`` windows; the explode happens
    vectorized inside ``map_batches`` (no per-row flat_map).
    """
    n_windows = size_hours // slide_hours
    slide_us = slide_hours * US_PER_HOUR

    def explode(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = us // slide_us  # latest window whose start <= ts
        types = batch["event_type"].combine_chunks()
        vals = batch["value"].to_numpy(zero_copy_only=False)
        parts = []
        for j in range(n_windows):
            w = base - j
            parts.append(
                pa.table(
                    {
                        "event_type": types,
                        "window_start": pa.array(w * slide_hours, pa.int64()),
                        "value": pa.array(vals, pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    agg = (
        _events(sf_dir)
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_raw"))
    )
    return agg.map_batches(
        lambda b: b.append_column(
            "sum_value", pc_round_half_away(b["sum_raw"], 2)
        ).drop_columns(["sum_raw"]),
        batch_format="pyarrow",
    )


def sql_sliding_window(size_hours: int = 2, slide_hours: int = 1) -> str:
    n = size_hours // slide_hours
    selects = [
        f"""SELECT event_type,
                   ((epoch_us(ts) // {slide_hours * US_PER_HOUR}) - {j}) * {slide_hours}
                       AS window_start,
                   value
            FROM events"""
        for j in range(n)
    ]
    union = " UNION ALL ".join(selects)
    return f"""
WITH exploded AS ({union})
SELECT event_type, window_start::BIGINT AS window_start,
       count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value
FROM exploded GROUP BY event_type, window_start
"""


def session_windows(sf_dir: str, *, gap_minutes: int = 30) -> rd.Dataset:
    """Per-user sessions: a gap > ``gap_minutes`` starts a new session.

    Keyed stream windowing WITHOUT a per-user Ray groupby (Ray walks
    distinct keys in Python, ~1-7 ms each — a scale-killer at 10^8
    users): users are hash-sharded to a bounded number of Ray groups via
    ``dedup._sharded_groupby`` and the sessionization runs vectorized
    over the whole ts-sorted shard, restarting the session counter at
    each user boundary.
    """
    from .dedup import _sharded_groupby

    gap_us = gap_minutes * 60_000_000

    def sessions_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        new_session = np.ones(len(us), dtype=bool)
        same_user = uid[1:] == uid[:-1]
        new_session[1:] = ~same_user | ((us[1:] - us[:-1]) > gap_us)
        sid_global = np.cumsum(new_session) - 1
        user_start = np.ones(len(us), dtype=bool)
        user_start[1:] = ~same_user
        starts = np.flatnonzero(user_start)
        run_len = np.diff(np.append(starts, len(us)))
        sid = sid_global - np.repeat(sid_global[starts], run_len)
        out = (
            pd.DataFrame(
                {
                    "user_id": uid,
                    "session_id": sid,
                    "us": us,
                    "value": g["value"].to_numpy(),
                }
            )
            .groupby(["user_id", "session_id"], as_index=False)
            .agg(
                n_events=("us", "size"),
                start_us=("us", "min"),
                end_us=("us", "max"),
                sum_value=("value", "sum"),
            )
        )
        out["sum_value"] = round_half_away(out["sum_value"].to_numpy(), 2)
        return out

    empty = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
            ("sum_value", pa.float64()),
        ]
    )
    from .dedup import _shards_for

    events = _events(sf_dir)
    return _sharded_groupby(
        events, ["user_id"], sessions_shard, empty_schema=empty,
        num_shards=_shards_for(events.count()),  # parquet metadata, no scan
    )


def sql_session_windows(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH ordered AS (
    SELECT user_id, epoch_us(ts) AS us, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts) > {gap_us}
                OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT user_id, us, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) - 1 AS session_id
    FROM ordered
)
SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       min(us)::BIGINT AS start_us, max(us)::BIGINT AS end_us,
       round(sum(value), 2) AS sum_value
FROM numbered GROUP BY user_id, session_id
"""
