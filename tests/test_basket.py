"""Association rules: engine vs DuckDB on a crafted basket set with
min_support=1 (the sf-scale catalog entry only exercises supports in the
hundreds), plus a hand-checked rule."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def basket_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("basket"))
    # baskets: o1={A,B}, o2={A,B,C}, o3={A}, o4={B,C}, o5={C} (+ a
    # duplicate A line in o1 that dedup must collapse, and a dangling
    # partkey with no part row that the join must drop)
    lines = [
        (1, 101), (1, 201), (1, 102),   # o1: A, A-dup, B
        (2, 101), (2, 102), (2, 103),   # o2: A, B, C
        (3, 101),                       # o3: A
        (4, 102), (4, 103),             # o4: B, C
        (5, 103),                       # o5: C
        (6, 999),                       # dangling partkey -> dropped
    ]
    parts = [(101, "A"), (201, "A"), (102, "B"), (103, "C")]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_partkey": pa.array([r[1] for r in lines], pa.int64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in parts], pa.int64()),
                "p_brand": pa.array([r[1] for r in parts], pa.string()),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    return d


def test_assoc_rules_min_support_one(ray_session, basket_dir):
    from invertedindexbuilder_ray.pipelines.basket import assoc_rules_df
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    got = assoc_rules_df(basket_dir, min_support=1)
    _, sql = QUERIES["assoc_rules"]
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(basket_dir, t)}.parquet')"
        )
    want = con.execute(sql.replace("pair.c >= 20", "pair.c >= 1")).df()
    g = got.sort_values(sorted(got.columns)).reset_index(drop=True)[
        sorted(got.columns)
    ]
    w = want.sort_values(sorted(want.columns)).reset_index(drop=True)[
        sorted(want.columns)
    ]
    pd.testing.assert_frame_equal(g, w.astype(g.dtypes.to_dict()))

    # hand check: baskets {A,B},{A,B,C},{A},{B,C},{C}; n=5
    # A->B: pair=2, ante=3, cons=3 -> conf=666666, lift=1e6*2*5//9=1111111
    r = got.set_index(["antecedent", "consequent"])
    ab = r.loc[("A", "B")]
    assert int(ab["pair_cnt"]) == 2
    assert int(ab["ante_cnt"]) == 3
    assert int(ab["conf_x1e6"]) == 666_666
    assert int(ab["lift_x1e6"]) == 1_111_111
    # the dedup collapsed o1's duplicate A; dangling part dropped: no
    # rule involves an empty brand and basket count is 5
    assert set(got["antecedent"]) <= {"A", "B", "C"}
