"""Explicit partitioned hash join (the portable Ray Data join pattern).

``Dataset.join`` in this Ray release intermittently mis-handles empty
shuffle partitions (ArrowInvalid on re-execution), so the engine carries
its own join operator built from primitives that are stable at any
scale: tag each side, bucket by ``hash(key) % P``, union, group by
bucket, and an Arrow (Acero) hash join inside each group — no pandas
round-trip.  This is exactly the "explicit partitioned hash join" from
the Ray guide; skewed keys are spread by raising ``num_partitions``
(callers derive it from input size, e.g. ``dedup._join_partitions``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _bucket_hash(col: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    with np.errstate(over="ignore"):
        h = (vals.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def partitioned_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    num_partitions: int = 8,
    how: str = "inner",
    right_suffix: str = "_r",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Join two Datasets on int64 key columns.

    Output columns: all left columns, then the right columns minus its
    key (name collisions get ``right_suffix``).  Row order is undefined.

    ``left_schema`` / ``right_schema``: a caller that KNOWS a side's
    output schema can declare it and skip the ``ds.schema()`` probe —
    which otherwise EXECUTES one block of that side's whole upstream
    pipeline (an actor-pool scorer pays ~1 s just to be sampled).  The
    declared schema must match what the side actually produces; the pad
    stage fails loudly if it doesn't.
    """
    def _arrow_schema(
        ds: rd.Dataset, declared: pa.Schema | None
    ) -> tuple[rd.Dataset, pa.Schema]:
        # ALWAYS normalize through an identity map (fuses, zero-copy):
        # pandas-block lineage needs Arrow blocks, and Ray's Project
        # operator (select_columns) can report a stale PRE-projection
        # schema on tiny/empty inputs (observed on a 1-row fuzz table:
        # schema() returned the un-projected columns while execution
        # produced the projected ones, so pad_right KeyError'd).  A
        # terminal MapBatches makes the sampled schema authoritative.
        orig = ds
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow",
                            zero_copy_batch=True)
        if declared is not None:
            return ds, declared
        s = ds.schema()
        if s is None:
            # all-empty dataset: the identity map yields no blocks to
            # sample, so fall back to the lineage schema (fine here —
            # an empty side contributes no pad batches with rows)
            s = orig.schema()
        s = s.base_schema if s is not None else None
        if not isinstance(s, pa.Schema):
            raise TypeError(
                f"partitioned_hash_join: expected an Arrow schema, got {s!r}"
            )
        return ds, s

    left, lschema = _arrow_schema(left, left_schema)
    right, rschema = _arrow_schema(right, right_schema)
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    out_rcols = {
        c: (c + right_suffix if c in lcols else c) for c in rcols if c != right_on
    }
    rtypes = {c: rschema.field(c).type for c in rcols}
    ltypes = {c: lschema.field(c).type for c in lcols}
    out_cols = lcols + list(out_rcols.values())

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            # schema-driven empty block: a 0-row block may carry a
            # stale/foreign column set (Project metadata quirk)
            cols = {c: pa.nulls(0, ltypes[c]) for c in lcols}
            cols["__r_key"] = pa.nulls(0, pa.int64())
            for rc, out in out_rcols.items():
                cols[out] = pa.nulls(0, rtypes[rc])
            cols["__bucket"] = pa.array([], pa.int64())
            cols["__side"] = pa.array([], pa.int8())
            return pa.table(cols)
        cols = {c: batch[c] for c in lcols}
        cols["__r_key"] = pa.nulls(n, pa.int64())
        for rc, out in out_rcols.items():
            cols[out] = pa.nulls(n, rtypes[rc])
        cols["__bucket"] = pa.array(_bucket_hash(batch[left_on], num_partitions), pa.int64())
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def pad_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {c: pa.nulls(0, ltypes[c]) for c in lcols}
            cols["__r_key"] = pa.nulls(0, pa.int64())
            for rc, out in out_rcols.items():
                cols[out] = pa.nulls(0, rtypes[rc])
            cols["__bucket"] = pa.array([], pa.int64())
            cols["__side"] = pa.array([], pa.int8())
            return pa.table(cols)
        cols = {c: pa.nulls(n, ltypes[c]) for c in lcols}
        cols["__r_key"] = batch[right_on].cast(pa.int64())
        for rc, out in out_rcols.items():
            cols[out] = batch[rc]
        cols["__bucket"] = pa.array(_bucket_hash(batch[right_on], num_partitions), pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    unioned = lt.union(rt)
    join_type = {"inner": "inner", "left": "left outer"}[how]
    # Acero rejects nested (list/struct) payload columns; fall back to a
    # pandas merge only when the schema requires it
    nested = any(
        pa.types.is_nested(t) for t in list(ltypes.values()) + list(rtypes.values())
    )

    expected_types = {
        **{c: ltypes[c] for c in lcols},
        "__r_key": pa.int64(),
        **{out_c: rtypes[rc] for rc, out_c in out_rcols.items()},
    }

    def merge_group(g: pa.Table) -> pa.Table:
        # Ray's sort/groupby can strip the type from an ALL-NULL column
        # during block-format conversion (typed nulls arrive as Arrow
        # `null` arrays); Acero rejects null-typed key fields, so restore
        # the declared types first
        for idx, name in enumerate(g.column_names):
            want = expected_types.get(name)
            if want is not None and pa.types.is_null(g.column(idx).type):
                g = g.set_column(idx, name, pa.nulls(g.num_rows, want))
        mask_l = pc.equal(g["__side"], 0)
        lg = g.filter(mask_l).select(lcols)
        rg = g.filter(pc.invert(mask_l)).select(["__r_key"] + list(out_rcols.values()))
        merged = lg.join(
            rg, keys=[left_on], right_keys=["__r_key"], join_type=join_type
        )
        return merged.select(out_cols)

    def merge_group_pandas(g):
        lg = g[g["__side"] == 0]
        rg = g[g["__side"] == 1]
        lpart = lg[lcols]
        rpart = rg[["__r_key"] + list(out_rcols.values())]
        merged = lpart.merge(rpart, left_on=left_on, right_on="__r_key", how=how)
        return merged[out_cols]

    grouped = unioned.groupby("__bucket")
    if nested:
        out = grouped.map_groups(merge_group_pandas, batch_format="pandas")
    else:
        out = grouped.map_groups(merge_group, batch_format="pyarrow")
    # a join whose every group is empty yields a SCHEMALESS dataset (Ray
    # drops empty map_groups outputs), which breaks downstream to_pandas /
    # schema introspection; the join knows its output schema, so append a
    # typed empty block
    empty = pa.table(
        {
            **{c: pa.array([], ltypes[c]) for c in lcols},
            **{out_c: pa.array([], rtypes[rc]) for rc, out_c in out_rcols.items()},
        }
    )
    return out.map_batches(lambda t: t, batch_format="pyarrow").union(
        rd.from_arrow(empty)
    )
