"""iceberg-lite: pure-Python Iceberg v2 layout (metadata JSON + Avro
manifests) — snapshot commits, time travel, identity-partition
pruning, and the avro codec underneath (SURVEY §2.4 storage;
reference: n/a — splink has no storage layer, Iceberg comes from the
north rule)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from splink_spark.sources.avro_lite import read_avro, write_avro
from splink_spark.sources.iceberg_lite import (
    read_iceberg,
    scan_files,
    write_iceberg,
)


# ---------------------------------------------------------------------------
# avro codec
# ---------------------------------------------------------------------------

AVRO_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"], "default": None},
        {"name": "c", "type": {"type": "array", "items": "long"}},
        {"name": "d", "type": {"type": "map", "values": "bytes"}},
        {"name": "e", "type": "double"},
        {"name": "f", "type": "boolean"},
        {
            "name": "g",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "x", "type": ["null", "long"]}],
            },
        },
    ],
}

AVRO_RECORDS = [
    {
        "a": -(2**53),
        "b": "héllo",
        "c": [1, -2, 3],
        "d": {"k": b"\x00\xff"},
        "e": 3.5,
        "f": True,
        "g": {"x": 7},
    },
    {
        "a": 0,
        "b": None,
        "c": [],
        "d": {},
        "e": -1e300,
        "f": False,
        "g": {"x": None},
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_round_trip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    write_avro(p, AVRO_SCHEMA, AVRO_RECORDS, codec=codec)
    schema, records = read_avro(p)
    assert schema == AVRO_SCHEMA
    assert records == AVRO_RECORDS


def test_avro_empty_file(tmp_path):
    p = str(tmp_path / "empty.avro")
    write_avro(p, AVRO_SCHEMA, [])
    _, records = read_avro(p)
    assert records == []


def test_avro_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.avro")
    with open(p, "wb") as f:
        f.write(b"not avro at all")
    with pytest.raises(ValueError):
        read_avro(p)


# ---------------------------------------------------------------------------
# iceberg-lite table layout
# ---------------------------------------------------------------------------

@pytest.fixture()
def table_loc(spark, tmp_path):
    loc = str(tmp_path / "docs_table")
    shutil.rmtree(loc, ignore_errors=True)
    return loc


def _docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )


def test_create_read_round_trip(spark, table_loc):
    docs = _docs(spark).filter("doc_id < 50")
    write_iceberg(docs, table_loc, partition_by=["lang"])
    back = read_iceberg(spark, table_loc)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    # metadata layout is spec-shaped
    meta_dir = os.path.join(table_loc, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read())
    with open(
        os.path.join(meta_dir, f"v{v}.metadata.json")
    ) as f:
        meta = json.load(f)
    assert meta["format-version"] == 2
    assert meta["partition-specs"][0]["fields"][0]["transform"] == (
        "identity"
    )
    assert len(meta["snapshots"]) == 1


def test_append_and_time_travel(spark, table_loc):
    docs = _docs(spark)
    s1 = write_iceberg(
        docs.filter("doc_id < 60"), table_loc, partition_by=["lang"]
    )
    s2 = write_iceberg(
        docs.filter("doc_id >= 60 AND doc_id < 100"),
        table_loc,
        mode="append",
    )
    assert s2 > s1
    assert read_iceberg(spark, table_loc).count() == 100
    assert (
        read_iceberg(spark, table_loc, snapshot_id=s1).count() == 60
    )
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, table_loc, snapshot_id=999)


def test_partition_pruning_cuts_files(spark, table_loc):
    docs = _docs(spark).filter("doc_id < 100")
    write_iceberg(docs, table_loc, partition_by=["lang"])
    files_all, st_all = scan_files(table_loc)
    files_en, st_en = scan_files(table_loc, where={"lang": "en"})
    assert st_en["files_selected"] < st_all["files_selected"]
    assert all("lang=en" in f for f in files_en)
    pruned = read_iceberg(spark, table_loc, where={"lang": "en"})
    want = docs.filter("lang = 'en'").count()
    assert pruned.count() == want
    assert pruned.select("lang").distinct().collect()[0][0] == "en"
    # a non-partition column is rejected, not silently unsupported
    with pytest.raises(ValueError, match="not a partition column"):
        scan_files(table_loc, where={"source": "x"})


def test_scan_stats_are_lineage(spark, table_loc):
    docs = _docs(spark).filter("doc_id < 80")
    write_iceberg(docs, table_loc, partition_by=["lang"])
    _, st = scan_files(table_loc)
    assert st["rows_selected"] == 80
    assert st["manifests_total"] == st["manifests_scanned"] == 1
    assert st["files_selected"] == st["files_total"]


def test_registry_iceberg_lite_round_trip(spark, tmp_path):
    from splink_spark.sources.registry import TableRegistry

    reg = TableRegistry(
        spark, str(tmp_path / "tables"), fmt="iceberg_lite"
    )
    docs = _docs(spark).filter("doc_id < 40")
    reg.write(docs, "documents")
    assert reg.read("documents").count() == 40
    reg.write(
        _docs(spark).filter("doc_id >= 40 AND doc_id < 70"),
        "documents",
        mode="append",
    )
    assert reg.read("documents").count() == 70


# ---------------------------------------------------------------------------
# dynamic-partition overwrite commits
# ---------------------------------------------------------------------------

def test_overwrite_partition_replaces_only_touched(
    spark, table_loc
):
    from pyspark.sql import functions as F

    docs = _docs(spark).filter("doc_id < 100")
    s1 = write_iceberg(docs, table_loc, partition_by=["lang"])
    langs = [
        r[0]
        for r in docs.select("lang").distinct().collect()
    ]
    target = sorted(langs)[0]
    n_target_before = docs.filter(F.col("lang") == target).count()
    n_other = docs.filter(F.col("lang") != target).count()

    # replace the target partition with a 3-row frame (same schema —
    # overwrite_partitions enforces column parity like append does)
    repl = docs.filter(F.col("lang") == target).limit(3)
    s2 = write_iceberg(
        repl, table_loc, mode="overwrite_partitions"
    )
    assert s2 > s1

    cur = read_iceberg(spark, table_loc)
    assert cur.filter(F.col("lang") == target).count() == 3
    assert cur.filter(F.col("lang") != target).count() == n_other
    # time travel still sees the pre-overwrite partition
    old = read_iceberg(spark, table_loc, snapshot_id=s1)
    assert (
        old.filter(F.col("lang") == target).count()
        == n_target_before
    )
    # snapshot summary records the overwrite + its deleted counts
    meta_dir = os.path.join(table_loc, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == s2
    )
    assert snap["summary"]["operation"] == "overwrite"
    assert int(snap["summary"]["deleted-records"]) == (
        n_target_before
    )


def test_overwrite_scan_stats_skip_deleted_files(spark, table_loc):
    from pyspark.sql import functions as F

    docs = _docs(spark).filter("doc_id < 100")
    write_iceberg(docs, table_loc, partition_by=["lang"])
    target = sorted(
        r[0] for r in docs.select("lang").distinct().collect()
    )[0]
    repl = docs.filter(F.col("lang") == target).limit(2)
    write_iceberg(repl, table_loc, mode="overwrite_partitions")
    files, st = scan_files(table_loc)
    # deleted entries are walked (files_total) but never selected
    assert st["files_total"] > st["files_selected"]
    assert not any(f"snap-1" in f and f"lang={target}" in f for f in files)
    # pruning to an untouched partition still works post-rewrite
    other = sorted(
        r[0] for r in docs.select("lang").distinct().collect()
    )[-1]
    if other != target:
        f2, st2 = scan_files(table_loc, where={"lang": other})
        assert all(f"lang={other}" in f for f in f2)
        assert st2["files_selected"] >= 1


def test_overwrite_unpartitioned_replaces_whole_table(
    spark, table_loc
):
    docs = _docs(spark)
    s1 = write_iceberg(docs.filter("doc_id < 50"), table_loc)
    s2 = write_iceberg(
        docs.filter("doc_id >= 90 AND doc_id < 95"),
        table_loc,
        mode="overwrite_partitions",
    )
    assert read_iceberg(spark, table_loc).count() == 5
    assert (
        read_iceberg(spark, table_loc, snapshot_id=s1).count() == 50
    )
    # append after overwrite stacks on the overwritten state
    write_iceberg(
        docs.filter("doc_id >= 95 AND doc_id < 98"),
        table_loc,
        mode="append",
    )
    assert read_iceberg(spark, table_loc).count() == 8


def test_registry_overwrite_partitions_mode(spark, tmp_path):
    from pyspark.sql import functions as F

    from splink_spark.sources.registry import TableRegistry

    reg = TableRegistry(
        spark, str(tmp_path / "tables"), fmt="iceberg_lite"
    )
    docs = _docs(spark).filter("doc_id < 60")
    reg.write(docs, "documents")  # unpartitioned create
    reg.write(
        docs.limit(7), "documents", mode="overwrite_partitions"
    )
    assert reg.read("documents").count() == 7


# ---------------------------------------------------------------------------
# equality deletes (Spec: Row-Level Deletes, content=2)
# ---------------------------------------------------------------------------


def test_equality_delete_removes_keys(spark, table_loc):
    from splink_spark.sources.iceberg_lite import delete_iceberg

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    s1 = write_iceberg(docs, table_loc, partition_by=["lang"])
    n_all = docs.count()
    victims = docs.filter("doc_id % 5 = 0")
    n_victims = victims.count()
    s2 = delete_iceberg(victims, table_loc, equality_cols=["doc_id"])
    cur = read_iceberg(spark, table_loc)
    assert cur.count() == n_all - n_victims
    assert cur.filter("doc_id % 5 = 0").count() == 0
    # time travel: s1 reads the PRE-delete table
    assert read_iceberg(spark, table_loc, snapshot_id=s1).count() == n_all
    # scan stats surface the pending delete
    _, stats = scan_files(table_loc, snapshot_id=s2)
    assert stats["delete_files_selected"] >= 1
    assert stats["delete_rows_selected"] == n_victims


def test_equality_delete_sequence_number_rule(spark, table_loc):
    """A row re-appended AFTER a delete commit survives: deletes
    apply only to data files with strictly smaller sequence numbers."""
    from pyspark.sql import functions as F

    from splink_spark.sources.iceberg_lite import delete_iceberg

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    write_iceberg(docs, table_loc, partition_by=["lang"])
    victims = docs.filter("doc_id % 5 = 0")
    delete_iceberg(victims, table_loc, equality_cols=["doc_id"])
    # re-append a subset of the deleted rows with a sentinel n_chars
    readd = victims.filter("doc_id % 10 = 0").withColumn(
        "n_chars", F.lit(-1)
    )
    n_readd = readd.count()
    write_iceberg(readd, table_loc, mode="append")
    cur = read_iceberg(spark, table_loc)
    survivors = cur.filter("doc_id % 5 = 0")
    assert survivors.count() == n_readd
    # every survivor is the re-appended copy, not the deleted one
    assert survivors.filter("n_chars <> -1").count() == 0


def test_equality_delete_multiple_column_sets(spark, table_loc):
    """Two delete commits with different equality columns compose."""
    from splink_spark.sources.iceberg_lite import delete_iceberg

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    write_iceberg(docs, table_loc, partition_by=["lang"])
    langs = sorted(
        r["lang"]
        for r in docs.select("lang").distinct().collect()
        if r["lang"] is not None
    )
    kill_lang = langs[0]
    delete_iceberg(
        docs.filter("doc_id % 3 = 0"), table_loc,
        equality_cols=["doc_id"],
    )
    delete_iceberg(
        docs.filter(docs.lang == kill_lang).limit(1), table_loc,
        equality_cols=["lang"],
    )
    cur = read_iceberg(spark, table_loc)
    expect = docs.filter(
        f"doc_id % 3 <> 0 AND (lang IS NULL OR lang <> '{kill_lang}')"
    ).count()
    assert cur.count() == expect
    # partition pruning composes with deletes
    other = read_iceberg(spark, table_loc, where={"lang": langs[1]})
    assert other.count() == docs.filter(
        f"lang = '{langs[1]}' AND doc_id % 3 <> 0"
    ).count()


def test_equality_delete_rejects_unknown_column(spark, table_loc):
    from splink_spark.sources.iceberg_lite import delete_iceberg

    docs = _docs(spark).select("doc_id", "lang")
    write_iceberg(docs, table_loc)
    with pytest.raises(ValueError, match="not in table schema"):
        delete_iceberg(docs, table_loc, equality_cols=["nope"])


# ---------------------------------------------------------------------------
# add-column schema evolution (Spec: Schema Evolution)
# ---------------------------------------------------------------------------


def test_schema_evolution_add_column(spark, table_loc):
    docs = _docs(spark).select("doc_id", "lang")
    s1 = write_iceberg(docs, table_loc, partition_by=["lang"])
    n = docs.count()
    # append with a NEW column
    extra = _docs(spark).select("doc_id", "lang", "n_chars").filter(
        "doc_id < 20"
    )
    s2 = write_iceberg(extra, table_loc, mode="append")
    cur = read_iceberg(spark, table_loc)
    assert set(cur.columns) == {"doc_id", "lang", "n_chars"}
    assert cur.count() == n + 20
    # old rows read the new column as null; appended rows carry it
    assert cur.filter("n_chars IS NOT NULL").count() == extra.filter(
        "n_chars IS NOT NULL"
    ).count()
    # time travel presents the PRE-evolution snapshot under ITS schema
    old = read_iceberg(spark, table_loc, snapshot_id=s1)
    assert set(old.columns) == {"doc_id", "lang"}
    assert old.count() == n
    # metadata: two schemas, stable ids for old fields, fresh id for new
    meta_dir = os.path.join(table_loc, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert len(meta["schemas"]) == 2
    assert meta["current-schema-id"] == 1
    ids0 = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    ids1 = {f["name"]: f["id"] for f in meta["schemas"][1]["fields"]}
    for name, i in ids0.items():
        assert ids1[name] == i
    assert ids1["n_chars"] == max(ids0.values()) + 1
    new_field = next(
        f for f in meta["schemas"][1]["fields"] if f["name"] == "n_chars"
    )
    assert new_field["required"] is False
    assert meta["snapshots"][0]["schema-id"] == 0
    assert meta["snapshots"][-1]["schema-id"] == 1
    assert s2 == meta["current-snapshot-id"]


def test_schema_evolution_pruned_read_pre_evolution_partition(
    spark, table_loc
):
    """A pruned read whose selected files ALL predate the evolution
    still presents the current schema (typed nulls)."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "uid long, lang string"
    )
    write_iceberg(base, table_loc, partition_by=["lang"])
    # evolve via an append touching ONLY partition b
    write_iceberg(
        spark.createDataFrame(
            [(3, "b", 7.5)], "uid long, lang string, score double"
        ),
        table_loc,
        mode="append",
    )
    a_only = read_iceberg(spark, table_loc, where={"lang": "a"})
    assert set(a_only.columns) == {"uid", "lang", "score"}
    row = a_only.collect()[0]
    assert row["uid"] == 1 and row["score"] is None
    assert dict(a_only.dtypes)["score"] == "double"


def test_schema_evolution_rejects_dropped_columns(spark, table_loc):
    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    write_iceberg(docs, table_loc)
    with pytest.raises(ValueError, match="missing table columns"):
        write_iceberg(
            docs.select("doc_id", "lang"), table_loc, mode="append"
        )


def test_schema_evolution_composes_with_deletes(spark, table_loc):
    from splink_spark.sources.iceberg_lite import delete_iceberg

    base = spark.createDataFrame(
        [(i, "x") for i in range(10)], "uid long, lang string"
    )
    write_iceberg(base, table_loc, partition_by=["lang"])
    write_iceberg(
        spark.createDataFrame(
            [(100, "x", 1.0), (101, "x", 2.0)],
            "uid long, lang string, score double",
        ),
        table_loc,
        mode="append",
    )
    # delete on a NEW column's key
    delete_iceberg(
        spark.createDataFrame([(100,)], "uid long"), table_loc,
        equality_cols=["uid"],
    )
    cur = read_iceberg(spark, table_loc)
    assert cur.count() == 11
    assert cur.filter("uid = 100").count() == 0
    assert cur.filter("score IS NOT NULL").count() == 1


# ---------------------------------------------------------------------------
# position deletes (Spec: Position Delete Files, content=1)
# ---------------------------------------------------------------------------


def test_position_delete_by_predicate(spark, table_loc):
    from splink_spark.sources.iceberg_lite import delete_iceberg_where

    docs = _docs(spark).select("doc_id", "lang", "n_chars").filter(
        "doc_id < 60"
    )
    n = docs.count()
    s1 = write_iceberg(docs, table_loc, partition_by=["lang"])
    n_kill = docs.filter("n_chars > 400").count()
    assert 0 < n_kill < n
    s2 = delete_iceberg_where(spark, table_loc, "n_chars > 400")
    assert s2 > s1
    cur = read_iceberg(spark, table_loc)
    assert cur.count() == n - n_kill
    assert cur.filter("n_chars > 400").count() == 0
    # prior snapshot time-travels to the undeleted rows
    assert read_iceberg(spark, table_loc, snapshot_id=s1).count() == n
    # the delete file is spec-shaped: (file_path, pos) sorted
    meta_dir = os.path.join(table_loc, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert meta["snapshots"][-1]["summary"][
        "added-position-delete-records"
    ] == str(n_kill)
    import glob

    del_files = glob.glob(
        os.path.join(table_loc, "data", "snap-*-pos-deletes", "*.parquet")
    )
    assert del_files
    import pyarrow.parquet as pq

    t = pq.read_table(del_files[0])
    assert t.column_names == ["file_path", "pos"]


def test_position_delete_spares_later_appends(spark, table_loc):
    """Rows appended AFTER the position delete are untouched even when
    they satisfy the deleted predicate (sequence-number rule)."""
    from splink_spark.sources.iceberg_lite import delete_iceberg_where

    base = spark.createDataFrame(
        [(i, "x", i * 10) for i in range(10)],
        "uid long, lang string, score long",
    )
    write_iceberg(base, table_loc, partition_by=["lang"])
    delete_iceberg_where(spark, table_loc, "score >= 50")
    assert read_iceberg(spark, table_loc).count() == 5
    write_iceberg(
        spark.createDataFrame(
            [(100, "x", 990)], "uid long, lang string, score long"
        ),
        table_loc,
        mode="append",
    )
    cur = read_iceberg(spark, table_loc)
    assert cur.count() == 6
    assert cur.filter("uid = 100").count() == 1


def test_position_delete_composes_with_equality_delete(spark, table_loc):
    from splink_spark.sources.iceberg_lite import (
        delete_iceberg,
        delete_iceberg_where,
    )

    base = spark.createDataFrame(
        [(i, "x", i % 3) for i in range(12)],
        "uid long, lang string, grp long",
    )
    write_iceberg(base, table_loc, partition_by=["lang"])
    delete_iceberg_where(spark, table_loc, "uid >= 9")  # kills 9,10,11
    delete_iceberg(
        spark.createDataFrame([(0,)], "grp long"), table_loc,
        equality_cols=["grp"],
    )  # kills grp=0 among survivors: 0,3,6
    cur = read_iceberg(spark, table_loc)
    got = sorted(r["uid"] for r in cur.collect())
    assert got == [1, 2, 4, 5, 7, 8]


def test_position_delete_pruned_read(spark, table_loc):
    """Partition-pruned reads still apply position deletes."""
    from splink_spark.sources.iceberg_lite import delete_iceberg_where

    base = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)],
        "uid long, lang string",
    )
    write_iceberg(base, table_loc, partition_by=["lang"])
    delete_iceberg_where(spark, table_loc, "uid = 3 OR uid = 4")
    a = read_iceberg(spark, table_loc, where={"lang": "a"})
    assert sorted(r["uid"] for r in a.collect()) == [1, 5, 7, 9]
    b = read_iceberg(spark, table_loc, where={"lang": "b"})
    assert sorted(r["uid"] for r in b.collect()) == [0, 2, 6, 8]


# ---------------------------------------------------------------------------
# rename / drop column evolution (metadata-only commits)
# ---------------------------------------------------------------------------


def test_rename_column_resolves_old_and_new_files(spark, table_loc):
    from splink_spark.sources.iceberg_lite import rename_iceberg_column

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    s1 = write_iceberg(
        docs.filter("doc_id < 40"), table_loc, partition_by=["lang"]
    )
    rename_iceberg_column(table_loc, "n_chars", "char_count")
    # current read: new name, values from files written under the OLD name
    cur = read_iceberg(spark, table_loc)
    assert set(cur.columns) == {"doc_id", "lang", "char_count"}
    assert cur.filter("char_count IS NULL").count() == 0
    # append AFTER the rename (files carry the new name) — one table,
    # mixed physical names, resolved by field-id history
    write_iceberg(
        docs.filter("doc_id >= 40 AND doc_id < 60").withColumnRenamed(
            "n_chars", "char_count"
        ),
        table_loc,
        mode="append",
    )
    mixed = read_iceberg(spark, table_loc)
    assert mixed.count() == 60
    assert mixed.filter("char_count IS NULL").count() == 0
    want = {
        r["doc_id"]: r["n_chars"]
        for r in docs.filter("doc_id < 60").collect()
    }
    got = {r["doc_id"]: r["char_count"] for r in mixed.collect()}
    assert got == want
    # time travel presents the pre-rename snapshot under ITS schema
    old = read_iceberg(spark, table_loc, snapshot_id=s1)
    assert set(old.columns) == {"doc_id", "lang", "n_chars"}
    # rename is metadata-only: no new snapshot was created by it
    meta_dir = os.path.join(table_loc, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert len(meta["snapshots"]) == 2
    fid_old = next(
        f["id"]
        for f in meta["schemas"][0]["fields"]
        if f["name"] == "n_chars"
    )
    fid_new = next(
        f["id"]
        for f in meta["schemas"][meta["current-schema-id"]]["fields"]
        if f["name"] == "char_count"
    )
    assert fid_old == fid_new  # the field id is the identity


def test_rename_partition_column_keeps_pruning(spark, table_loc):
    from splink_spark.sources.iceberg_lite import rename_iceberg_column

    docs = _docs(spark).select("doc_id", "lang")
    write_iceberg(
        docs.filter("doc_id < 80"), table_loc, partition_by=["lang"]
    )
    rename_iceberg_column(table_loc, "lang", "language")
    # append post-rename: manifests now keyed by the new name
    write_iceberg(
        docs.filter("doc_id >= 80 AND doc_id < 120").withColumnRenamed(
            "lang", "language"
        ),
        table_loc,
        mode="append",
    )
    full = read_iceberg(spark, table_loc)
    assert set(full.columns) == {"doc_id", "language"}
    want_en = docs.filter("doc_id < 120 AND lang = 'en'").count()
    pruned = read_iceberg(spark, table_loc, where={"language": "en"})
    assert pruned.count() == want_en
    _, stats = scan_files(table_loc, where={"language": "en"})
    assert 0 < stats["files_selected"] < stats["files_total"]


def test_rename_collision_and_reuse_rejected(spark, table_loc):
    from pyspark.sql import functions as F

    from splink_spark.sources.iceberg_lite import rename_iceberg_column

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    write_iceberg(docs.filter("doc_id < 20"), table_loc)
    with pytest.raises(ValueError, match="used by another field"):
        rename_iceberg_column(table_loc, "n_chars", "lang")
    rename_iceberg_column(table_loc, "n_chars", "char_count")
    # the old name still belongs to that field's history: re-adding it
    # as a NEW column would make file resolution ambiguous
    with pytest.raises(ValueError, match="cannot be reused"):
        write_iceberg(
            docs.filter("doc_id >= 20 AND doc_id < 30")
            .withColumnRenamed("n_chars", "char_count")
            .withColumn("n_chars", F.lit(0)),
            table_loc,
            mode="append",
        )
    # renaming back onto its own old name is fine (same field id)
    rename_iceberg_column(table_loc, "char_count", "n_chars")
    back = read_iceberg(spark, table_loc)
    assert "n_chars" in back.columns


def test_drop_column_time_travel_and_guards(spark, table_loc):
    from splink_spark.sources.iceberg_lite import drop_iceberg_column

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    s1 = write_iceberg(
        docs.filter("doc_id < 30"), table_loc, partition_by=["lang"]
    )
    with pytest.raises(ValueError, match="partition column"):
        drop_iceberg_column(table_loc, "lang")
    drop_iceberg_column(table_loc, "n_chars")
    cur = read_iceberg(spark, table_loc)
    assert set(cur.columns) == {"doc_id", "lang"}
    # time travel: the old snapshot presents the dropped column
    old = read_iceberg(spark, table_loc, snapshot_id=s1)
    assert set(old.columns) == {"doc_id", "lang", "n_chars"}
    # appends after the drop need not carry the dropped column
    write_iceberg(
        docs.filter("doc_id >= 30 AND doc_id < 40").drop("n_chars"),
        table_loc,
        mode="append",
    )
    assert read_iceberg(spark, table_loc).count() == 40
    # the retired name can never come back
    with pytest.raises(ValueError, match="cannot be reused"):
        write_iceberg(
            docs.filter("doc_id >= 40 AND doc_id < 50"),
            table_loc,
            mode="append",
        )


def test_rename_after_equality_delete_still_applies(spark, table_loc):
    from splink_spark.sources.iceberg_lite import (
        delete_iceberg,
        rename_iceberg_column,
    )

    docs = _docs(spark).select("doc_id", "lang")
    write_iceberg(docs.filter("doc_id < 50"), table_loc)
    victims = docs.filter("doc_id IN (3, 7, 11)")
    delete_iceberg(victims, table_loc, equality_cols=["doc_id"])
    rename_iceberg_column(table_loc, "doc_id", "page_id")
    cur = read_iceberg(spark, table_loc)
    assert set(cur.columns) == {"page_id", "lang"}
    assert cur.count() == 47
    assert cur.filter("page_id IN (3, 7, 11)").count() == 0


def test_drop_column_with_live_equality_delete_rejected(
    spark, table_loc
):
    from splink_spark.sources.iceberg_lite import (
        delete_iceberg,
        drop_iceberg_column,
    )

    docs = _docs(spark).select("doc_id", "lang")
    write_iceberg(docs.filter("doc_id < 50"), table_loc)
    delete_iceberg(
        docs.filter("doc_id = 5"), table_loc, equality_cols=["doc_id"]
    )
    with pytest.raises(ValueError, match="equality-delete"):
        drop_iceberg_column(table_loc, "doc_id")


def test_overwrite_partitions_after_partition_rename(spark, table_loc):
    from splink_spark.sources.iceberg_lite import rename_iceberg_column

    docs = _docs(spark).select("doc_id", "lang")
    write_iceberg(
        docs.filter("doc_id < 100"), table_loc, partition_by=["lang"]
    )
    rename_iceberg_column(table_loc, "lang", "language")
    # overwrite ONE partition post-rename: old manifests (keyed by the
    # old name) must still match the replaced partition value
    repl = (
        docs.filter("doc_id >= 100 AND doc_id < 110 AND lang = 'en'")
        .withColumnRenamed("lang", "language")
    )
    n_repl = repl.count()
    assert n_repl > 0
    write_iceberg(repl, table_loc, mode="overwrite_partitions")
    cur = read_iceberg(spark, table_loc)
    n_other = docs.filter("doc_id < 100 AND lang <> 'en'").count()
    assert cur.filter("language = 'en'").count() == n_repl
    assert cur.filter("language <> 'en'").count() == n_other


def test_position_delete_after_rename_hits_old_files(spark, table_loc):
    from splink_spark.sources.iceberg_lite import (
        delete_iceberg_where,
        rename_iceberg_column,
    )

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    write_iceberg(docs.filter("doc_id < 40"), table_loc)
    rename_iceberg_column(table_loc, "n_chars", "char_count")
    # predicate uses the CURRENT name; the only data files on disk
    # carry the OLD physical name — the delete must still hit them
    victims = docs.filter("doc_id < 40 AND n_chars > 500").count()
    assert victims > 0
    delete_iceberg_where(spark, table_loc, "char_count > 500")
    cur = read_iceberg(spark, table_loc)
    assert cur.count() == 40 - victims
    assert cur.filter("char_count > 500").count() == 0


def test_registry_schema_evolution_surface(spark, tmp_path):
    from splink_spark.sources.registry import TableRegistry

    reg = TableRegistry(
        spark, str(tmp_path / "tables"), fmt="iceberg_lite"
    )
    reg.write(_docs(spark).select("doc_id", "lang").limit(25), "docs")
    reg.rename_column("docs", "lang", "language")
    assert set(reg.read("docs").columns) == {"doc_id", "language"}
    reg.drop_column("docs", "language")
    assert reg.read("docs").columns == ["doc_id"]
    # parquet registries reject evolution loudly
    preg = TableRegistry(spark, str(tmp_path / "pq"), fmt="parquet")
    with pytest.raises(ValueError, match="rewrite the table"):
        preg.rename_column("docs", "a", "b")


# ---------------------------------------------------------------------------
# partition transforms (day / bucket / truncate)
# ---------------------------------------------------------------------------


def test_day_transform_partitioning_and_pruning(spark, tmp_path):
    loc = str(tmp_path / "events_by_day")
    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).filter("event_id < 400")
    write_iceberg(ev, loc, partition_by=["day(ts)"])
    # layout: one directory per calendar day, field named ts_day
    files, stats = scan_files(loc)
    assert all("/ts_day=" in f for f in files)
    assert stats["rows_selected"] == 400
    # prune by SOURCE column value (driver-side transform)...
    want_day = "2024-01-01"
    want = ev.filter(f"date_format(ts, 'yyyy-MM-dd') = '{want_day}'")
    pruned = read_iceberg(spark, loc, where={"ts": want_day})
    assert pruned.count() == want.count() > 0
    # ...and by partition field name with the transformed value
    pruned2 = read_iceberg(spark, loc, where={"ts_day": want_day})
    assert pruned2.count() == want.count()
    _, st = scan_files(loc, where={"ts": want_day})
    assert 0 < st["files_selected"] < st["files_total"]
    # source rows come back unchanged (no derived column in files)
    assert set(pruned.columns) == set(ev.columns)


def test_bucket_transform_prunes_and_replays_in_python(spark, tmp_path):
    loc = str(tmp_path / "docs_by_bucket")
    docs = _docs(spark).filter("doc_id < 200")
    write_iceberg(docs, loc, partition_by=["bucket(4, doc_id)"])
    full = read_iceberg(spark, loc)
    assert full.count() == 200
    # the python replica must agree with the Spark-side bucket exactly:
    # a where on the source value selects precisely that row's bucket
    got = read_iceberg(spark, loc, where={"doc_id": 7})
    assert got.filter("doc_id = 7").count() == 1
    _, st = scan_files(loc, where={"doc_id": 7})
    assert 0 < st["files_selected"] < st["files_total"]
    # all four buckets materialised
    files, _ = scan_files(loc)
    buckets = {f.split("doc_id_bucket=")[1].split("/")[0] for f in files}
    assert buckets == {"0", "1", "2", "3"}


def test_truncate_transform_string_and_append(spark, tmp_path):
    loc = str(tmp_path / "docs_by_trunc")
    docs = _docs(spark).filter("doc_id < 120").select(
        "doc_id", "lang", "source"
    )
    write_iceberg(docs, loc, partition_by=["truncate(2, source)"])
    write_iceberg(
        _docs(spark)
        .filter("doc_id >= 120 AND doc_id < 160")
        .select("doc_id", "lang", "source"),
        loc,
        mode="append",
    )
    full = read_iceberg(spark, loc)
    assert full.count() == 160
    sample = docs.select("source").first()[0]
    prefix = sample[:2]
    want = (
        _docs(spark)
        .filter("doc_id < 160")
        .filter(f"substring(source, 1, 2) = '{prefix}'")
        .count()
    )
    got = read_iceberg(spark, loc, where={"source": sample})
    assert got.count() == want
    got2 = read_iceberg(spark, loc, where={"source_trunc": prefix})
    assert got2.count() == want


def test_transform_partition_overwrite_and_time_travel(spark, tmp_path):
    loc = str(tmp_path / "events_ow")
    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).filter("event_id < 300")
    s1 = write_iceberg(ev, loc, partition_by=["day(ts)"])
    day = "2024-01-01"
    n_day = ev.filter(
        f"date_format(ts, 'yyyy-MM-dd') = '{day}'"
    ).count()
    n_other = 300 - n_day
    repl = ev.filter(f"date_format(ts, 'yyyy-MM-dd') = '{day}'").limit(5)
    write_iceberg(repl, loc, mode="overwrite_partitions")
    cur = read_iceberg(spark, loc)
    assert cur.count() == n_other + 5
    assert read_iceberg(spark, loc, where={"ts": day}).count() == 5
    old = read_iceberg(spark, loc, snapshot_id=s1)
    assert old.count() == 300
    # source column of a transform cannot be dropped
    from splink_spark.sources.iceberg_lite import drop_iceberg_column

    with pytest.raises(ValueError, match="partition column"):
        drop_iceberg_column(loc, "ts")


def test_transform_source_rename_keeps_field_and_pruning(
    spark, tmp_path
):
    from splink_spark.sources.iceberg_lite import rename_iceberg_column

    loc = str(tmp_path / "events_rn")
    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).filter("event_id < 200")
    write_iceberg(ev, loc, partition_by=["day(ts)"])
    rename_iceberg_column(loc, "ts", "event_ts")
    day = "2024-01-01"
    want = ev.filter(
        f"date_format(ts, 'yyyy-MM-dd') = '{day}'"
    ).count()
    # the stable field name still prunes, and so does the NEW source name
    assert (
        read_iceberg(spark, loc, where={"ts_day": day}).count() == want
    )
    assert (
        read_iceberg(spark, loc, where={"event_ts": day}).count()
        == want
    )
    cur = read_iceberg(spark, loc)
    assert "event_ts" in cur.columns and "ts" not in cur.columns
    # appends after the rename land in the same day directories
    more = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).filter("event_id >= 200 AND event_id < 240").withColumnRenamed(
        "ts", "event_ts"
    )
    write_iceberg(more, loc, mode="append")
    assert read_iceberg(spark, loc).count() == 240
