"""Randomized model-based fuzz of the iceberg-lite mutation surface.

A seeded random op sequence (append / add-column append / rename /
drop / equality delete / position delete / dynamic-partition
overwrite) runs against BOTH the real table and a pure-Python model
keyed by FIELD ID (the spec's column identity). After every op the
current read must match the model exactly, and at the end every
recorded snapshot must time-travel back to its saved model state
under the schema stamped on it — so any interaction bug between
evolution, row-level deletes, sequence-number rules and overwrite
rewrites surfaces as a concrete row diff.

reference: n/a (storage layer is a north-rule addition; the mutation
semantics under test are the public Iceberg v2 spec's).
"""

from __future__ import annotations

import random

import pytest

from splink_spark.sources.iceberg_lite import (
    delete_iceberg,
    delete_iceberg_where,
    drop_iceberg_column,
    read_iceberg,
    rename_iceberg_column,
    write_iceberg,
)

PART_VALUES = ["en", "de", "fr"]


class Model:
    """Rows keyed by field id; schema = fid -> current name."""

    def __init__(self):
        # field ids: 1=uid, 2=lang (partition), 3=score
        self.names = {1: "uid", 2: "lang", 3: "score"}
        self.dropped: set[int] = set()
        self.retired_names: set[str] = set()
        self.rows: list[dict] = []  # {fid: value, "__seq": int}
        self.next_fid = 4
        self.next_uid = 0
        self.seq = 0
        self.eq_delete_fids: set[int] = set()
        self.snapshots: dict[int, dict] = {}

    def live_fids(self):
        return [f for f in sorted(self.names) if f not in self.dropped]

    def snapshot_state(self, sid):
        self.snapshots[sid] = {
            "names": dict(self.names),
            "dropped": set(self.dropped),
            "rows": [dict(r) for r in self.rows],
        }

    def as_tuples(self, names=None, dropped=None, rows=None):
        names = names if names is not None else self.names
        dropped = dropped if dropped is not None else self.dropped
        rows = rows if rows is not None else self.rows
        fids = [f for f in sorted(names) if f not in dropped]
        cols = [names[f] for f in fids]
        out = set()
        for r in rows:
            out.add(tuple(r.get(f) for f in fids))
        return cols, out


def _fresh_rows(model: Model, rng: random.Random, n: int, with_new: bool):
    """n new rows; optionally carrying a brand-new column (fresh fid)."""
    new_fid = None
    if with_new:
        new_fid = model.next_fid
        model.next_fid += 1
        model.names[new_fid] = f"extra_{new_fid}"
    rows = []
    for _ in range(n):
        r = {
            1: model.next_uid,
            2: rng.choice(PART_VALUES),
            3: rng.randrange(1000),
        }
        # only fids that exist and are not dropped travel in appends
        for f in model.live_fids():
            if f not in r and f != new_fid:
                r[f] = None
        if new_fid is not None:
            r[new_fid] = rng.randrange(100)
        model.next_uid += 1
        # only fids actually written travel into the model row
        live = set(model.live_fids())
        rows.append({f: v for f, v in r.items() if f in live})
    return rows, new_fid


def _df_from_rows(spark, model: Model, rows: list[dict]):
    fids = model.live_fids()
    cols = [model.names[f] for f in fids]
    data = [tuple(r.get(f) for f in fids) for r in rows]
    schema = ", ".join(
        f"`{model.names[f]}` " + ("string" if f == 2 else "long")
        for f in fids
    )
    return spark.createDataFrame(data, schema=schema).select(*cols)


def _check(spark, loc, model: Model, snapshot_id=None, state=None):
    df = read_iceberg(spark, loc, snapshot_id=snapshot_id)
    if state is None:
        want_cols, want = model.as_tuples()
    else:
        want_cols, want = model.as_tuples(
            state["names"], state["dropped"], state["rows"]
        )
    assert df.columns == want_cols, (df.columns, want_cols)
    got = {tuple(r) for r in df.select(*want_cols).collect()}
    assert got == want, (
        f"snapshot={snapshot_id}: {sorted(got - want)[:5]} extra, "
        f"{sorted(want - got)[:5]} missing of {len(want)}"
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_iceberg_mutation_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    model = Model()
    loc = str(tmp_path / f"fuzz_{seed}")

    rows, _ = _fresh_rows(model, rng, 12, with_new=False)
    sid = write_iceberg(
        _df_from_rows(spark, model, rows), loc, partition_by=["lang"]
    )
    model.seq = sid
    for r in rows:
        model.rows.append({**r, "__seq": sid})
    model.snapshot_state(sid)
    _check(spark, loc, model)

    ops = ["append", "append_new_col", "rename", "drop",
           "eq_delete", "pos_delete", "overwrite"]
    for _step in range(9):
        op = rng.choice(ops)
        if op in ("append", "append_new_col"):
            rows, _ = _fresh_rows(
                model, rng, rng.randrange(3, 8),
                with_new=(op == "append_new_col"),
            )
            sid = write_iceberg(
                _df_from_rows(spark, model, rows), loc, mode="append"
            )
            model.seq = sid
            for r in rows:
                model.rows.append({**r, "__seq": sid})
            model.snapshot_state(sid)
        elif op == "rename":
            # rename a random live non-uid field to a fresh name
            cands = [f for f in model.live_fids() if f != 1]
            fid = rng.choice(cands)
            new = f"col_{fid}_{_step}_{seed}"
            rename_iceberg_column(loc, model.names[fid], new)
            model.retired_names.add(model.names[fid])
            model.names[fid] = new
        elif op == "drop":
            cands = [
                f
                for f in model.live_fids()
                if f not in (1, 2) and f not in model.eq_delete_fids
            ]
            if not cands:
                continue
            fid = rng.choice(cands)
            drop_iceberg_column(loc, model.names[fid])
            model.dropped.add(fid)
        elif op == "eq_delete":
            live_uids = [r[1] for r in model.rows]
            if not live_uids:
                continue
            victims = sorted(rng.sample(
                live_uids, min(3, len(live_uids))
            ))
            vdf = spark.createDataFrame(
                [(u,) for u in victims],
                schema=f"`{model.names[1]}` long",
            )
            sid = delete_iceberg(vdf, loc, equality_cols=[model.names[1]])
            model.eq_delete_fids.add(1)
            # spec rule: applies to data files with seq strictly smaller
            model.rows = [
                r
                for r in model.rows
                if not (r[1] in victims and r["__seq"] < sid)
            ]
            model.seq = sid
            model.snapshot_state(sid)
        elif op == "pos_delete":
            if not model.rows or 3 in model.dropped:
                continue
            cut = rng.randrange(1000)
            sid = delete_iceberg_where(
                spark, loc, f"{model.names[3]} < {cut}"
            )
            # applies to files with seq <= delete seq = every current row
            model.rows = [
                r for r in model.rows
                if not (r.get(3) is not None and r[3] < cut)
            ]
            model.seq = sid
            model.snapshot_state(sid)
        else:  # overwrite one partition
            part = rng.choice(PART_VALUES)
            rows, _ = _fresh_rows(model, rng, rng.randrange(2, 5),
                                  with_new=False)
            for r in rows:
                r[2] = part
            sid = write_iceberg(
                _df_from_rows(spark, model, rows),
                loc,
                mode="overwrite_partitions",
            )
            model.rows = [r for r in model.rows if r[2] != part]
            for r in rows:
                model.rows.append({**r, "__seq": sid})
            model.seq = sid
            model.snapshot_state(sid)
        _check(spark, loc, model)

    # time travel: every recorded snapshot still reads as its saved
    # state, presented under the schema stamped on it
    for sid, state in model.snapshots.items():
        _check(spark, loc, model, snapshot_id=sid, state=state)
