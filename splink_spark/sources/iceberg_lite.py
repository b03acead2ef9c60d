"""Pure-Python Iceberg v2 table layout — metadata JSON + Avro
manifest lists + Avro manifests per the public Apache Iceberg table
spec — so the Iceberg path EXECUTES in this sandbox (no
iceberg-spark-runtime jar ships here; `sources/registry.py` gates the
catalog path on a JVM probe and stays the production route).

What this implements (spec sections in parentheses):

- table metadata json + ``version-hint.text`` (Spec: Table Metadata);
- snapshots with manifest lists (Spec: Snapshots), append commits
  creating a new metadata version that reuses prior manifests;
- manifest files with per-entry identity partition values
  (Spec: Manifests), written/read with the from-scratch Avro codec
  in ``avro_lite.py``;
- scan planning: snapshot selection (time travel by snapshot id),
  manifest-list pruning on partition field summaries
  (lower/upper bounds), manifest-entry pruning on identity partition
  values, yielding the parquet file list that `spark.read.parquet`
  loads (Spec: Scan Planning).

- dynamic-partition overwrite commits (Spec: Snapshots, operation
  ``overwrite``): partitions present in the incoming frame are
  replaced at file granularity — affected manifests are rewritten
  with the replaced entries as status=2 DELETED and survivors as
  status=0 EXISTING, untouched manifests are carried forward, and
  prior snapshots still time-travel to the pre-overwrite data.

- equality-delete commits (Spec: Row-Level Deletes, content=2):
  ``delete_iceberg`` writes a parquet key list + a DELETE manifest
  (content=1); the read path applies each delete to data files with
  a strictly smaller sequence number via broadcast anti-joins, so
  GDPR-style delete-by-key works without rewriting data files and
  prior snapshots still time-travel to the undeleted rows.

- position-delete commits (Spec: Position Delete Files, content=1):
  ``delete_iceberg_where`` evaluates a SQL predicate against the
  current snapshot and records matching rows as sorted (file_path,
  pos) pairs, positions taken from Spark's parquet
  ``_metadata.row_index`` hidden column; the read path anti-joins on
  the (file, position) identity for data files with
  less-than-or-equal sequence numbers.

- add-column schema evolution (Spec: Schema Evolution): appending a
  frame with new columns registers a new schema entry — existing
  field ids preserved, fresh ids for new columns (never reused),
  snapshots stamped with their schema-id so time travel presents
  each snapshot under ITS schema; reads across mixed file schemas
  use mergeSchema and project to the snapshot schema (columns absent
  from every selected file become typed nulls).

- rename/drop column evolution (Spec: Schema Evolution): metadata-only
  commits that register a new current schema; the field id is the
  identity — reads resolve files written under older schemas through
  the field's name history (coalesce across historical names in a
  mergeSchema read), time travel presents each snapshot under its
  stamped schema, partition columns can be renamed (manifest pruning
  and overwrite matching follow the name history) but not dropped.
  One lite-specific restriction, enforced at commit time: a column
  name can never move between field ids (real Iceberg resolves by
  parquet field-id metadata; lite files carry only names).

- partition transforms (Spec: Partition Transforms): besides identity,
  ``year/month/day/hour(col)``, ``bucket(N, col)`` and
  ``truncate(W, col)`` — the derived value drives directory layout,
  manifest partition structs and pruning; source rows are written
  unchanged. A ``where`` filter may name the partition field (value
  already transformed) or the SOURCE column (the transform is applied
  driver-side, e.g. ``where={"warc_ts": "2024-01-15"}`` prunes a
  ``day(warc_ts)`` layout). One documented deviation: bucket[N] hashes
  md5-of-string-cast, not murmur3_x86_32 of the serialized value —
  lite tables plan their own scans, so the hash needs determinism and
  driver replicability, not binary interop with other writers.

Not implemented (documented scope): column retypes, format v3.
Write path materialises one partition directory per distinct value
via a filtered Spark write — fine for the fixture scales this
sandbox tests; a production writer would single-pass ``partitionBy``
and commit the emitted files.

reference: n/a (splink has no storage layer; the Iceberg requirement
comes from the north rule).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .avro_lite import read_avro, write_avro

_SPARK_TO_ICEBERG = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamptz",
}


def _iceberg_schema(df: DataFrame) -> dict:
    fields = []
    for i, f in enumerate(df.schema.fields, start=1):
        t = _SPARK_TO_ICEBERG.get(f.dataType.simpleString())
        if t is None:
            # nested/array columns are carried opaquely: readable via
            # the parquet files, but not usable as partition columns
            t = "binary"
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": t,
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


import re as _re


def _parse_partition_spec(s) -> dict:
    """Parse one ``partition_by`` entry into a spec dict
    {name, transform, source[, param]}.

    Accepted forms (Spec: Partition Transforms): a bare column name
    (identity), ``year(col)`` / ``month(col)`` / ``day(col)`` /
    ``hour(col)`` (temporal), ``bucket(N, col)`` and
    ``truncate(W, col)``. Partition field names follow the reference
    implementation's convention: ``col_day``, ``col_bucket``,
    ``col_trunc``."""
    if isinstance(s, dict):
        return s
    s = s.strip()
    m = _re.fullmatch(r"(year|month|day|hour)\s*\(\s*(\w+)\s*\)", s)
    if m:
        t, col = m.group(1), m.group(2)
        return {"name": f"{col}_{t}", "transform": t, "source": col}
    m = _re.fullmatch(
        r"(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)", s
    )
    if m:
        t, param, col = m.group(1), int(m.group(2)), m.group(3)
        suffix = "bucket" if t == "bucket" else "trunc"
        return {
            "name": f"{col}_{suffix}",
            "transform": f"{t}[{param}]",
            "source": col,
            "param": param,
        }
    if not _re.fullmatch(r"\w+", s):
        raise ValueError(f"unsupported partition transform spec {s!r}")
    return {"name": s, "transform": "identity", "source": s}


def _normalize_part_specs(meta: dict) -> list[dict]:
    """Spec dicts for the table's partition fields; tables written
    before transform support carry only the name list (all identity)."""
    specs = meta.get("_iceberg_lite_partition_specs")
    if specs is not None:
        return specs
    return [
        {"name": c, "transform": "identity", "source": c}
        for c in meta["_iceberg_lite_partition_by"]
    ]


def _part_transform_col(spec: dict, F):
    """Spark Column computing the transform's partition value as a
    STRING (lite manifests carry partition values as strings).
    NOTE one documented deviation from the Iceberg spec: bucket[N]
    hashes md5-of-string-cast rather than murmur3_x86_32 of the
    serialized value — lite tables plan their own scans, so the hash
    only needs to be deterministic and driver-replicable, not
    binary-interoperable with other Iceberg writers."""
    c = F.col(spec["source"])
    t = spec["transform"]
    if t == "identity":
        return c.cast("string")
    if t == "year":
        return F.date_format(c, "yyyy")
    if t == "month":
        return F.date_format(c, "yyyy-MM")
    if t == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if t == "hour":
        return F.date_format(c, "yyyy-MM-dd-HH")
    if t.startswith("bucket["):
        n = spec["param"]
        h = F.conv(
            F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
        ).cast("long")
        return F.when(
            c.isNull(), F.lit(None).cast("string")
        ).otherwise(F.pmod(h, F.lit(n)).cast("string"))
    if t.startswith("truncate["):
        w = spec["param"]
        # string → prefix; integral → floor-to-width (Spec semantics)
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            F.substring(c, 1, w)
            if not spec.get("_numeric")
            else (F.floor(c / w) * w).cast("long").cast("string")
        )
    raise ValueError(f"unknown partition transform {t!r}")


def _apply_part_transform(spec: dict, value) -> str | None:
    """Driver-side Python replica of ``_part_transform_col`` so a
    ``where`` filter on the SOURCE column prunes transformed
    partitions. Temporal transforms accept either the source value or
    an already-transformed prefix string."""
    if value is None:
        return None
    t = spec["transform"]
    s = str(value)
    if t == "identity":
        return s
    if t == "year":
        return s[:4]
    if t == "month":
        return s[:7]
    if t == "day":
        return s[:10]
    if t == "hour":
        return s[:13].replace(" ", "-")
    if t.startswith("bucket["):
        import hashlib

        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        return str(h % spec["param"])
    if t.startswith("truncate["):
        w = spec["param"]
        if spec.get("_numeric"):
            return str((int(value) // w) * w)
        return s[:w]
    raise ValueError(f"unknown partition transform {t!r}")


def _translate_where(meta: dict, where: dict) -> dict:
    """Resolve a ``where`` equality filter to partition-field-name →
    transformed-string-value. Keys may be partition field names
    (value already transformed) or SOURCE column names (the transform
    is applied driver-side)."""
    specs = _normalize_part_specs(meta)
    by_name = {sp["name"]: sp for sp in specs}
    by_source = {sp["source"]: sp for sp in specs}
    out = {}
    for k, v in where.items():
        if k in by_name:
            sp = by_name[k]
            out[sp["name"]] = (
                str(v)
                if sp["transform"] != "identity"
                else _apply_part_transform(sp, v)
            )
        elif k in by_source:
            sp = by_source[k]
            out[sp["name"]] = _apply_part_transform(sp, v)
        else:
            raise ValueError(
                f"{k!r} is not a partition column or transform source "
                f"(fields {sorted(by_name)}, sources {sorted(by_source)})"
            )
    return out


def _field_name_history(meta: dict) -> dict[int, list[str]]:
    """Every name each field id has EVER had, in schema order — the
    resolution table for reading files written under older schemas
    (the spec resolves columns by field id; lite tables track the
    id→name history instead of writing field-id parquet metadata)."""
    hist: dict[int, list[str]] = {}
    for sch in meta["schemas"]:
        for f in sch["fields"]:
            names = hist.setdefault(f["id"], [])
            if f["name"] not in names:
                names.append(f["name"])
    return hist


def _name_owner_ids(meta: dict) -> dict[str, set[int]]:
    """Which field id(s) ever owned each column name. Correct file
    resolution requires every physical name to map to exactly ONE
    field id, so rename/add reject names previously owned by another
    field (the spec allows reuse because real parquet carries field
    ids; lite tables cannot)."""
    owners: dict[str, set[int]] = {}
    for sch in meta["schemas"]:
        for f in sch["fields"]:
            owners.setdefault(f["name"], set()).add(f["id"])
    return owners


def _pget(part: dict, names: list[str]):
    """Partition-dict lookup across a column's historical names (old
    manifests key partition values by the name current at write time)."""
    for n in names:
        if n in part:
            return part[n]
    return None


def _partition_name_history(meta: dict) -> dict[str, list[str]]:
    """current partition column name -> all names it has ever had."""
    cur = meta["schemas"][meta["current-schema-id"]]
    name_to_id = {f["name"]: f["id"] for f in cur["fields"]}
    hist = _field_name_history(meta)
    return {
        c: hist.get(name_to_id.get(c, -1), [c])
        for c in meta["_iceberg_lite_partition_by"]
    }


def _partition_struct_schema(partition_by: list[str], schema: dict):
    """Avro schema of the manifest entry's partition struct (identity
    transforms only -> source column types, all nullable strings here:
    partition values travel as strings, the reader casts on attach)."""
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": c, "type": ["null", "string"], "default": None}
            for c in partition_by
        ],
    }


def _manifest_entry_schema(part_schema: dict) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "partition", "type": part_schema},
                        {"name": "record_count", "type": "long"},
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                        },
                        # content=2 (equality deletes) only: field ids
                        # of the equality columns (Spec: Delete Files)
                        {
                            "name": "equality_ids",
                            "type": [
                                "null",
                                {"type": "array", "items": "int"},
                            ],
                            "default": None,
                        },
                    ],
                },
            },
        ],
    }


_FIELD_SUMMARY = {
    "type": "record",
    "name": "field_summary",
    "fields": [
        {"name": "contains_null", "type": "boolean"},
        {
            "name": "contains_nan",
            "type": ["null", "boolean"],
            "default": None,
        },
        {
            "name": "lower_bound",
            "type": ["null", "bytes"],
            "default": None,
        },
        {
            "name": "upper_bound",
            "type": ["null", "bytes"],
            "default": None,
        },
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
        {
            "name": "partitions",
            "type": [
                "null",
                {"type": "array", "items": _FIELD_SUMMARY},
            ],
            "default": None,
        },
    ],
}


def _load_metadata(location: str) -> dict:
    hint = os.path.join(location, "metadata", "version-hint.text")
    with open(hint) as f:
        v = int(f.read().strip())
    with open(
        os.path.join(location, "metadata", f"v{v}.metadata.json")
    ) as f:
        return json.load(f)


def _write_metadata(location: str, meta: dict, version: int) -> None:
    mdir = os.path.join(location, "metadata")
    os.makedirs(mdir, exist_ok=True)
    with open(
        os.path.join(mdir, f"v{version}.metadata.json"), "w"
    ) as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write(str(version))


def _list_parquet_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def _partition_summaries(
    entries: list[dict],
    partition_by: list[str],
    name_history: dict[str, list[str]] | None = None,
) -> list[dict] | None:
    """Per-partition-field lower/upper-bound summaries for
    manifest-list pruning, computed over the LIVE entries of one
    manifest (deleted entries are skipped post-read anyway, so bounds
    over survivors keep pruning exact). ``name_history`` maps each
    current partition name to its historical names so entries written
    before a column rename still resolve."""
    if not partition_by:
        return None
    live = [e for e in entries if e["status"] != 2]
    if not live:
        return None
    hist = name_history or {}
    summaries = []
    for c in partition_by:
        names = hist.get(c, [c])
        vals = [_pget(e["data_file"]["partition"], names) for e in live]
        non_null = sorted(v for v in vals if v is not None)
        summaries.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": None,
                "lower_bound": non_null[0].encode()
                if non_null
                else None,
                "upper_bound": non_null[-1].encode()
                if non_null
                else None,
            }
        )
    return summaries


def write_iceberg(
    df: DataFrame,
    location: str,
    partition_by: list[str] | None = None,
    mode: str = "create",
) -> int:
    """Write ``df`` as an iceberg-lite table; returns the new snapshot
    id. ``mode="create"`` starts v1 metadata; ``mode="append"`` adds a
    snapshot whose manifest list carries all prior manifests plus one
    new manifest (spec-conform append commit);
    ``mode="overwrite_partitions"`` is a dynamic-partition overwrite:
    every partition value present in ``df`` is replaced (on an
    unpartitioned table the whole table is replaced) — prior files in
    those partitions are marked DELETED in rewritten manifests, and
    earlier snapshots still read the pre-overwrite data."""
    import pyarrow.parquet as pq

    partition_by = partition_by or []
    spark = df.sparkSession
    if mode == "create":
        part_specs = [_parse_partition_spec(s) for s in partition_by]
        src_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for sp in part_specs:
            if sp["source"] not in src_types:
                raise ValueError(
                    f"partition source column {sp['source']!r} not in "
                    f"frame columns {sorted(src_types)}"
                )
            if sp["transform"].startswith("truncate[") and src_types[
                sp["source"]
            ] in ("bigint", "int", "long", "integer"):
                sp["_numeric"] = True
        partition_by = [sp["name"] for sp in part_specs]
        meta = {
            "format-version": 2,
            "table-uuid": str(
                uuid.uuid5(uuid.NAMESPACE_URL, location)
            ),
            "location": location,
            "last-sequence-number": 0,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": len(df.schema.fields),
            "current-schema-id": 0,
            "schemas": [_iceberg_schema(df)],
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": sp["name"],
                            "transform": sp["transform"],
                            "source-id": [
                                f.name for f in df.schema.fields
                            ].index(sp["source"])
                            + 1,
                            "field-id": 1000 + i,
                        }
                        for i, sp in enumerate(part_specs)
                    ],
                }
            ],
            "last-partition-id": 1000 + len(partition_by) - 1
            if partition_by
            else 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
            "_iceberg_lite_partition_by": partition_by,
            "_iceberg_lite_partition_specs": part_specs,
        }
        version = 0
        seq = 1
        prior_manifests: list[dict] = []
    elif mode in ("append", "overwrite_partitions"):
        meta = _load_metadata(location)
        partition_by = meta["_iceberg_lite_partition_by"]
        part_specs = _normalize_part_specs(meta)
        hint = os.path.join(
            location, "metadata", "version-hint.text"
        )
        with open(hint) as f:
            version = int(f.read().strip())
        seq = meta["last-sequence-number"] + 1
        # add-column schema evolution (Spec: Schema Evolution):
        # appending a frame with NEW columns registers a new schema
        # entry — existing field ids are preserved, new columns get
        # fresh ids (ids are never reused), and new columns are
        # optional (old files read them as null via mergeSchema).
        # Dropping or retyping columns is not supported.
        cur_schema = meta["schemas"][meta["current-schema-id"]]
        cur_names = [f["name"] for f in cur_schema["fields"]]
        missing_cols = [n for n in cur_names if n not in df.columns]
        if missing_cols:
            raise ValueError(
                f"append is missing table columns {missing_cols}; "
                "only add-column schema evolution is supported"
            )
        new_names = [n for n in df.columns if n not in cur_names]
        if new_names:
            owners = _name_owner_ids(meta)
            reused = [n for n in new_names if n in owners]
            if reused:
                raise ValueError(
                    f"column names {reused} were used by earlier schema "
                    "versions; lite tables resolve files by name history, "
                    "so dropped/renamed-away names cannot be reused"
                )
            fresh = _iceberg_schema(df.select(*new_names))
            last_id = meta["last-column-id"]
            add_fields = [
                {**f, "id": last_id + k, "required": False}
                for k, f in enumerate(fresh["fields"], start=1)
            ]
            meta["schemas"].append(
                {
                    "type": "struct",
                    "schema-id": len(meta["schemas"]),
                    "fields": cur_schema["fields"] + add_fields,
                }
            )
            meta["current-schema-id"] = len(meta["schemas"]) - 1
            meta["last-column-id"] = last_id + len(add_fields)
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, prior_manifests = read_avro(cur["manifest-list"])
    else:
        raise ValueError(f"unknown mode {mode!r}")

    snapshot_id = seq  # deterministic, monotonically increasing
    # data files: one spark write per partition value (identity
    # transform; partition columns stay IN the files, as iceberg's
    # parquet writers also materialise them)
    data_dir = os.path.join(location, "data")
    entries = []
    all_identity = all(
        sp["transform"] == "identity" for sp in part_specs
    )
    if partition_by and all_identity:
        values = [
            tuple(r)
            for r in df.select(*partition_by).distinct().collect()
        ]
    elif partition_by:
        # non-identity transforms: derive the partition value columns
        # (Spec: Partition Transforms), group by the DERIVED values,
        # and write source rows (transformed values live only in the
        # directory layout + manifests, not in the files)
        from pyspark.sql import functions as F

        tmp = {
            sp["name"]: f"__part_{sp['name']}" for sp in part_specs
        }
        dfp = df
        for sp in part_specs:
            dfp = dfp.withColumn(
                tmp[sp["name"]], _part_transform_col(sp, F)
            )
        values = [
            tuple(r)
            for r in dfp.select(
                *[tmp[c] for c in partition_by]
            ).distinct().collect()
        ]
    if partition_by:
        for vals in sorted(values, key=lambda t: tuple(map(str, t))):
            if all_identity:
                sub = df
                for c, v in zip(partition_by, vals):
                    sub = sub.filter(
                        sub[c].isNull()
                        if v is None
                        else sub[c] == v
                    )
            else:
                sub = dfp
                for c, v in zip(partition_by, vals):
                    tc = tmp[c]
                    sub = sub.filter(
                        sub[tc].isNull()
                        if v is None
                        else sub[tc] == v
                    )
                sub = sub.drop(*tmp.values())
            dirname = "/".join(
                f"{c}={'null' if v is None else v}"
                for c, v in zip(partition_by, vals)
            )
            out_dir = os.path.join(
                data_dir, f"snap-{snapshot_id}", dirname
            )
            sub.write.mode("overwrite").parquet(out_dir)
            for path in _list_parquet_files(out_dir):
                pf = pq.ParquetFile(path)
                entries.append(
                    {
                        "status": 1,  # ADDED
                        "snapshot_id": snapshot_id,
                        "sequence_number": seq,
                        "file_sequence_number": seq,
                        "data_file": {
                            "content": 0,
                            "file_path": path,
                            "file_format": "PARQUET",
                            "partition": {
                                c: None if v is None else str(v)
                                for c, v in zip(partition_by, vals)
                            },
                            "record_count": pf.metadata.num_rows,
                            "file_size_in_bytes": os.path.getsize(
                                path
                            ),
                        },
                    }
                )
    else:
        out_dir = os.path.join(data_dir, f"snap-{snapshot_id}")
        df.write.mode("overwrite").parquet(out_dir)
        for path in _list_parquet_files(out_dir):
            pf = pq.ParquetFile(path)
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snapshot_id,
                    "sequence_number": seq,
                    "file_sequence_number": seq,
                    "data_file": {
                        "content": 0,
                        "file_path": path,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": pf.metadata.num_rows,
                        "file_size_in_bytes": os.path.getsize(path),
                    },
                }
            )

    part_schema = _partition_struct_schema(
        partition_by, _iceberg_schema(df)
    )
    manifest_path = os.path.join(
        location, "metadata", f"manifest-{snapshot_id}.avro"
    )
    write_avro(
        manifest_path, _manifest_entry_schema(part_schema), entries
    )

    # dynamic-partition overwrite: rewrite every prior manifest that
    # holds a replaced partition — survivors become status=0 EXISTING
    # (sequence numbers preserved per the spec's inheritance rules),
    # replaced entries become status=2 DELETED stamped with this
    # snapshot. Untouched manifests carry forward byte-identical, so
    # the commit cost scales with the partitions touched, not the
    # table size.
    deleted_files = deleted_rows = 0
    if mode == "overwrite_partitions":
        part_hist = _partition_name_history(meta)
        new_parts = {
            tuple(
                e["data_file"]["partition"].get(c)
                for c in partition_by
            )
            for e in entries
        }
        rewritten: list[dict] = []
        for mi, mf in enumerate(prior_manifests):
            _, old_entries = read_avro(mf["manifest_path"])
            live = [e for e in old_entries if e["status"] != 2]
            def _hit(e):
                if not partition_by:
                    return True  # unpartitioned overwrite = replace all
                return (
                    tuple(
                        _pget(
                            e["data_file"]["partition"],
                            part_hist.get(c, [c]),
                        )
                        for c in partition_by
                    )
                    in new_parts
                )
            if not any(_hit(e) for e in live):
                rewritten.append(mf)
                continue
            out_entries = []
            mf_deleted_files = mf_deleted_rows = 0
            for e in live:
                ne = {**e, "data_file": dict(e["data_file"])}
                if _hit(e):
                    ne["status"] = 2  # DELETED
                    ne["snapshot_id"] = snapshot_id
                    mf_deleted_files += 1
                    mf_deleted_rows += e["data_file"]["record_count"]
                else:
                    ne["status"] = 0  # EXISTING
                out_entries.append(ne)
            deleted_files += mf_deleted_files
            deleted_rows += mf_deleted_rows
            rw_path = os.path.join(
                location,
                "metadata",
                f"manifest-{snapshot_id}-rw{mi}.avro",
            )
            write_avro(
                rw_path,
                _manifest_entry_schema(part_schema),
                out_entries,
            )
            survivors = [
                e for e in out_entries if e["status"] != 2
            ]
            rewritten.append(
                {
                    "manifest_path": rw_path,
                    "manifest_length": os.path.getsize(rw_path),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": seq,
                    "min_sequence_number": min(
                        (
                            e["sequence_number"]
                            for e in out_entries
                            if e["sequence_number"] is not None
                        ),
                        default=seq,
                    ),
                    "added_snapshot_id": snapshot_id,
                    "added_files_count": 0,
                    "existing_files_count": len(survivors),
                    "deleted_files_count": mf_deleted_files,
                    "added_rows_count": 0,
                    "existing_rows_count": sum(
                        e["data_file"]["record_count"]
                        for e in survivors
                    ),
                    "deleted_rows_count": mf_deleted_rows,
                    "partitions": _partition_summaries(
                        out_entries, partition_by, part_hist
                    ),
                }
            )
        prior_manifests = rewritten

    summaries = _partition_summaries(entries, partition_by)
    added_rows = sum(
        e["data_file"]["record_count"] for e in entries
    )
    manifest_rec = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": summaries if partition_by else None,
    }
    mlist_path = os.path.join(
        location, "metadata", f"snap-{snapshot_id}-manifest-list.avro"
    )
    write_avro(
        mlist_path,
        _MANIFEST_FILE_SCHEMA,
        prior_manifests + [manifest_rec],
    )

    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = int(time.time() * 1000)
    meta["current-snapshot-id"] = snapshot_id
    meta["snapshots"].append(
        {
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": int(time.time() * 1000),
            "summary": {
                "operation": "overwrite"
                if mode == "overwrite_partitions"
                else "append",
                "added-data-files": str(len(entries)),
                "added-records": str(added_rows),
                "deleted-data-files": str(deleted_files),
                "deleted-records": str(deleted_rows),
            },
            "manifest-list": mlist_path,
            "schema-id": meta.get("current-schema-id", 0),
        }
    )
    meta["snapshot-log"].append(
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": meta["last-updated-ms"],
        }
    )
    _write_metadata(location, meta, version + 1)
    return snapshot_id


def rename_iceberg_column(location: str, old: str, new: str) -> None:
    """Rename a column (Spec: Schema Evolution — metadata-only commit,
    no new snapshot). The field keeps its id; a new schema entry is
    registered and becomes current. Existing data files are untouched:
    reads resolve them through the field's name history. Time travel
    to snapshots stamped with older schema ids still presents the old
    name. The new name must never have belonged to a different field
    (lite tables resolve by name history, not parquet field ids)."""
    meta = _load_metadata(location)
    hint = os.path.join(location, "metadata", "version-hint.text")
    with open(hint) as f:
        version = int(f.read().strip())
    cur = meta["schemas"][meta["current-schema-id"]]
    field = next((f for f in cur["fields"] if f["name"] == old), None)
    if field is None:
        raise ValueError(
            f"no column {old!r} in current schema "
            f"{[f['name'] for f in cur['fields']]}"
        )
    if new == old:
        return
    owners = _name_owner_ids(meta)
    if new in owners and owners[new] != {field["id"]}:
        raise ValueError(
            f"column name {new!r} was used by another field "
            f"(ids {sorted(owners[new])}); lite tables resolve files "
            "by name history, so names cannot move between fields"
        )
    meta["schemas"].append(
        {
            "type": "struct",
            "schema-id": len(meta["schemas"]),
            "fields": [
                {**f, "name": new} if f["id"] == field["id"] else f
                for f in cur["fields"]
            ],
        }
    )
    meta["current-schema-id"] = len(meta["schemas"]) - 1
    part_specs = _normalize_part_specs(meta)
    if any(sp["source"] == old for sp in part_specs):
        for sp in part_specs:
            if sp["source"] != old:
                continue
            sp["source"] = new
            if sp["transform"] == "identity":
                # identity fields are named after the column; renaming
                # the column renames the field. Transformed fields keep
                # their stable derived name (warc_ts_day etc.).
                sp["name"] = new
        meta["_iceberg_lite_partition_specs"] = part_specs
        meta["_iceberg_lite_partition_by"] = [
            sp["name"] for sp in part_specs
        ]
        for spec in meta["partition-specs"]:
            for pf in spec["fields"]:
                if (
                    pf["source-id"] == field["id"]
                    and pf["transform"] == "identity"
                ):
                    pf["name"] = new
    meta["last-updated-ms"] = int(time.time() * 1000)
    _write_metadata(location, meta, version + 1)


def drop_iceberg_column(location: str, name: str) -> None:
    """Drop a column (Spec: Schema Evolution — metadata-only commit).
    Data files keep the physical column; reads under the new schema no
    longer project it, and time travel to older snapshots presents it
    again. The field id is retired, never reused, and the name cannot
    be re-added later (no-reuse rule). Partition columns cannot be
    dropped, nor can columns referenced by an equality-delete file
    that is still live in the current snapshot (the read path applies
    those deletes on the projected frame)."""
    meta = _load_metadata(location)
    hint = os.path.join(location, "metadata", "version-hint.text")
    with open(hint) as f:
        version = int(f.read().strip())
    cur = meta["schemas"][meta["current-schema-id"]]
    field = next((f for f in cur["fields"] if f["name"] == name), None)
    if field is None:
        raise ValueError(
            f"no column {name!r} in current schema "
            f"{[f['name'] for f in cur['fields']]}"
        )
    if any(
        name in (sp["name"], sp["source"])
        for sp in _normalize_part_specs(meta)
    ):
        raise ValueError(f"cannot drop partition column {name!r}")
    snap = next(
        (
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        ),
        None,
    )
    if snap is not None:
        _, manifests = read_avro(snap["manifest-list"])
        for mf in manifests:
            if mf.get("content", 0) != 1:
                continue
            _, entries = read_avro(mf["manifest_path"])
            for e in entries:
                if e["status"] == 2:
                    continue
                if field["id"] in (
                    e["data_file"].get("equality_ids") or []
                ):
                    raise ValueError(
                        f"column {name!r} is referenced by a live "
                        "equality-delete file; compact or rewrite the "
                        "table before dropping it"
                    )
    meta["schemas"].append(
        {
            "type": "struct",
            "schema-id": len(meta["schemas"]),
            "fields": [
                f for f in cur["fields"] if f["id"] != field["id"]
            ],
        }
    )
    meta["current-schema-id"] = len(meta["schemas"]) - 1
    meta["last-updated-ms"] = int(time.time() * 1000)
    _write_metadata(location, meta, version + 1)


def delete_iceberg(
    df_deletes: DataFrame,
    location: str,
    equality_cols: list[str],
) -> int:
    """Equality-delete commit (Spec: Delete Files, content=2; Row-Level
    Deletes). Writes the DISTINCT values of ``equality_cols`` from
    ``df_deletes`` as a parquet delete file, adds a DELETE manifest
    (manifest content=1, data_file content=2 with ``equality_ids``)
    to a new snapshot, and returns the snapshot id.

    Per the spec's sequence-number rule, the delete applies to data
    files whose sequence number is STRICTLY LESS than the delete's —
    rows appended after the delete are not affected, and prior
    snapshots still time-travel to the undeleted data. Scope is
    table-global (partition field summaries are left null), the
    simplest spec-legal scope.
    """
    import pyarrow.parquet as pq

    meta = _load_metadata(location)
    partition_by = meta["_iceberg_lite_partition_by"]
    schema_fields = meta["schemas"][meta["current-schema-id"]]["fields"]
    name_to_id = {f["name"]: f["id"] for f in schema_fields}
    missing = [c for c in equality_cols if c not in name_to_id]
    if missing:
        raise ValueError(
            f"equality columns {missing} not in table schema "
            f"{sorted(name_to_id)}"
        )
    hint = os.path.join(location, "metadata", "version-hint.text")
    with open(hint) as f:
        version = int(f.read().strip())
    seq = meta["last-sequence-number"] + 1
    snapshot_id = seq
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, prior_manifests = read_avro(cur["manifest-list"])

    out_dir = os.path.join(
        location, "data", f"snap-{snapshot_id}-deletes"
    )
    df_deletes.select(*equality_cols).distinct().write.mode(
        "overwrite"
    ).parquet(out_dir)
    eq_ids = [name_to_id[c] for c in equality_cols]
    entries = []
    deleted_rows = 0
    for path in _list_parquet_files(out_dir):
        pf = pq.ParquetFile(path)
        deleted_rows += pf.metadata.num_rows
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 2,  # EQUALITY_DELETES
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {c: None for c in partition_by},
                    "record_count": pf.metadata.num_rows,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": eq_ids,
                },
            }
        )
    return _commit_delete_snapshot(
        location,
        meta,
        version,
        prior_manifests,
        entries,
        deleted_rows,
        "added-equality-delete-records",
    )


def _commit_delete_snapshot(
    location: str,
    meta: dict,
    version: int,
    prior_manifests: list[dict],
    entries: list[dict],
    deleted_rows: int,
    records_summary_key: str,
) -> int:
    """Shared delete-commit tail: write the DELETE manifest (manifest
    content=1) + manifest list, append the snapshot, bump metadata.
    ``entries`` carry the per-file content (1=position, 2=equality)."""
    partition_by = meta["_iceberg_lite_partition_by"]
    seq = meta["last-sequence-number"] + 1
    snapshot_id = seq
    part_schema = _partition_struct_schema(
        partition_by, meta["schemas"][meta["current-schema-id"]]
    )
    manifest_path = os.path.join(
        location, "metadata", f"manifest-{snapshot_id}-del.avro"
    )
    write_avro(
        manifest_path, _manifest_entry_schema(part_schema), entries
    )
    manifest_rec = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 1,  # DELETES manifest
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": deleted_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": None,  # global scope: no partition summaries
    }
    mlist_path = os.path.join(
        location, "metadata", f"snap-{snapshot_id}-manifest-list.avro"
    )
    write_avro(
        mlist_path,
        _MANIFEST_FILE_SCHEMA,
        prior_manifests + [manifest_rec],
    )
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = int(time.time() * 1000)
    meta["current-snapshot-id"] = snapshot_id
    meta["snapshots"].append(
        {
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": meta["last-updated-ms"],
            "summary": {
                "operation": "delete",
                "added-delete-files": str(len(entries)),
                records_summary_key: str(deleted_rows),
            },
            "manifest-list": mlist_path,
            "schema-id": meta.get("current-schema-id", 0),
        }
    )
    meta["snapshot-log"].append(
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": meta["last-updated-ms"],
        }
    )
    _write_metadata(location, meta, version + 1)
    return snapshot_id


# normalize Spark's _metadata.file_path ("file:///abs/path") to the
# plain filesystem path stored in lite manifests
def _strip_file_scheme(col):
    from pyspark.sql import functions as F

    return F.regexp_replace(col, "^file:(//)?", "")


def delete_iceberg_where(
    spark: SparkSession,
    location: str,
    predicate: str,
) -> int:
    """Position-delete commit (Spec: Delete Files, content=1; Position
    Delete Files). Evaluates ``predicate`` (a SQL boolean expression
    over the table columns) against the current snapshot's data files
    and records the matching rows as (file_path, pos) pairs — the
    spec's position-delete layout, sorted by file_path then pos —
    using Spark's parquet ``_metadata.row_index`` hidden column for
    exact in-file positions (JVM-native, no per-row Python).

    Per the spec's sequence-number rule for position deletes, the
    delete applies to data files whose sequence number is LESS THAN OR
    EQUAL to the delete's — here always strictly less, since the
    commit takes a fresh sequence number. Rows appended later are
    unaffected and prior snapshots time-travel to the undeleted data.
    """
    import pyarrow.parquet as pq

    meta = _load_metadata(location)
    partition_by = meta["_iceberg_lite_partition_by"]
    hint = os.path.join(location, "metadata", "version-hint.text")
    with open(hint) as f:
        version = int(f.read().strip())
    seq = meta["last-sequence-number"] + 1
    snapshot_id = seq
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, prior_manifests = read_avro(cur["manifest-list"])

    data, _deletes, _ = _scan_plan(location)
    if not data:
        raise ValueError(f"{location}: snapshot has no data files")
    from pyspark.sql import functions as F

    scan = spark.read.option("mergeSchema", "true").parquet(
        *[p for p, _ in data]
    )
    # present the CURRENT schema before evaluating the predicate:
    # files written before a column rename carry the old physical
    # name, so resolve each field by its name history (as read_iceberg
    # does) — otherwise the predicate would silently miss their rows
    hist = _field_name_history(meta)
    cur_fields = meta["schemas"][meta["current-schema-id"]]["fields"]
    proj = [
        _strip_file_scheme(F.col("_metadata.file_path")).alias(
            "__file_path"
        ),
        F.col("_metadata.row_index").alias("__pos"),
    ]
    for fld in cur_fields:
        cands = [
            n
            for n in hist.get(fld["id"], [fld["name"]])
            if n in scan.columns
        ]
        if not cands:
            proj.append(F.lit(None).alias(fld["name"]))
        elif len(cands) == 1:
            proj.append(F.col(cands[0]).alias(fld["name"]))
        else:
            proj.append(
                F.coalesce(*[F.col(n) for n in cands]).alias(
                    fld["name"]
                )
            )
    positions = (
        scan.select(*proj)
        .filter(predicate)
        .select(
            F.col("__file_path").alias("file_path"),
            F.col("__pos").alias("pos"),
        )
        .sort("file_path", "pos")
    )
    out_dir = os.path.join(
        location, "data", f"snap-{snapshot_id}-pos-deletes"
    )
    positions.write.mode("overwrite").parquet(out_dir)
    entries = []
    deleted_rows = 0
    for path in _list_parquet_files(out_dir):
        pf = pq.ParquetFile(path)
        deleted_rows += pf.metadata.num_rows
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 1,  # POSITION_DELETES
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {c: None for c in partition_by},
                    "record_count": pf.metadata.num_rows,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": None,
                },
            }
        )
    return _commit_delete_snapshot(
        location,
        meta,
        version,
        prior_manifests,
        entries,
        deleted_rows,
        "added-position-delete-records",
    )


def _scan_plan(
    location: str,
    snapshot_id: int | None = None,
    where: dict[str, str] | None = None,
) -> tuple[list[tuple[str, int]], list[dict], dict]:
    """Core scan planning: (data (path, seq) list, delete-file dicts,
    lineage stats). Partition pruning happens FIRST at the
    manifest-list level (field summaries: lower/upper bounds), then
    per manifest entry. Equality deletes are global-scope, so a
    partition-pruned scan still loads them (they are tiny key lists)."""
    meta = _load_metadata(location)
    partition_by = meta["_iceberg_lite_partition_by"]
    part_hist = _partition_name_history(meta)
    sid = (
        meta["current-snapshot-id"]
        if snapshot_id is None
        else snapshot_id
    )
    snap = next(
        (s for s in meta["snapshots"] if s["snapshot-id"] == sid),
        None,
    )
    # map equality_ids to the PRESENTATION schema's names (current for
    # a current read, the snapshot's stamped schema for time travel) so
    # the delete anti-join columns match what read_iceberg presents
    schema_fields = meta["schemas"][
        meta["current-schema-id"]
        if snapshot_id is None
        else (snap or {}).get("schema-id", meta["current-schema-id"])
    ]["fields"]
    id_to_name = {f["id"]: f["name"] for f in schema_fields}
    if snap is None:
        raise ValueError(
            f"snapshot {sid} not found; have "
            f"{[s['snapshot-id'] for s in meta['snapshots']]}"
        )
    _, manifests = read_avro(snap["manifest-list"])
    stats = {
        "snapshot_id": sid,
        "manifests_total": len(manifests),
        "manifests_scanned": 0,
        "files_total": 0,
        "files_selected": 0,
        "rows_selected": 0,
        "delete_files_selected": 0,
        "delete_rows_selected": 0,
    }
    # resolve where keys (partition field names or SOURCE columns of
    # transformed fields) to field-name → transformed string value
    where = _translate_where(meta, where) if where else {}

    # pruning decisions FIRST (manifest-list field summaries only —
    # no manifest is opened to decide), then all surviving manifests
    # are read concurrently: avro inflate + file IO release the GIL,
    # so planning wall scales with the largest manifest, not the
    # manifest count. Results are folded back in manifest-list order,
    # keeping the plan deterministic.
    to_read: list[tuple[int, dict]] = []
    for mi, mf in enumerate(manifests):
        if mf.get("content", 0) == 1:  # DELETE manifest
            to_read.append((mi, mf))
            continue
        skip = False
        if where and mf["partitions"]:
            for i, c in enumerate(partition_by):
                if c not in where:
                    continue
                s = mf["partitions"][i]
                v = str(where[c]).encode()
                lo, hi = s["lower_bound"], s["upper_bound"]
                if lo is not None and hi is not None and not (
                    lo <= v <= hi
                ):
                    skip = True
                    break
        if skip:
            continue
        stats["manifests_scanned"] += 1
        to_read.append((mi, mf))

    if len(to_read) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(16, len(to_read))
        ) as pool:
            entry_lists = list(
                pool.map(
                    lambda t: read_avro(t[1]["manifest_path"])[1],
                    to_read,
                )
            )
    else:
        entry_lists = [
            read_avro(mf["manifest_path"])[1] for _, mf in to_read
        ]

    data: list[tuple[str, int]] = []
    deletes: list[dict] = []
    for (_, mf), entries in zip(to_read, entry_lists):
        if mf.get("content", 0) == 1:  # DELETE manifest
            for e in entries:
                if e["status"] == 2:
                    continue
                dfile = e["data_file"]
                deletes.append(
                    {
                        "path": dfile["file_path"],
                        "seq": e["sequence_number"],
                        "content": dfile.get("content", 2),
                        "cols": [
                            id_to_name[i]
                            for i in dfile.get("equality_ids") or []
                        ],
                    }
                )
                stats["delete_files_selected"] += 1
                stats["delete_rows_selected"] += dfile["record_count"]
            continue
        for e in entries:
            stats["files_total"] += 1
            if e["status"] == 2:  # DELETED
                continue
            part = e["data_file"]["partition"]
            if any(
                _pget(part, part_hist.get(c, [c])) != str(v)
                for c, v in where.items()
            ):
                continue
            data.append(
                (e["data_file"]["file_path"], e["sequence_number"])
            )
            stats["files_selected"] += 1
            stats["rows_selected"] += e["data_file"]["record_count"]
    return data, deletes, stats


def scan_files(
    location: str,
    snapshot_id: int | None = None,
    where: dict[str, str] | None = None,
) -> tuple[list[str], dict]:
    """Scan planning: (parquet file list, lineage stats). ``where``
    is an identity-partition equality filter {col: value}; pruning
    happens FIRST at the manifest-list level (field summaries:
    lower/upper bounds + contains_null), then per manifest entry.
    The stats record how much each pruning level cut — the
    per-partition lineage the north rule asks every stage to emit.
    NOTE: rows_selected counts PHYSICAL rows in selected data files;
    pending equality deletes (stats['delete_rows_selected'] > 0) are
    applied by ``read_iceberg``, not subtracted here."""
    data, _deletes, stats = _scan_plan(location, snapshot_id, where)
    return [p for p, _ in data], stats


def read_iceberg(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    where: dict[str, str] | None = None,
) -> DataFrame:
    """Load an iceberg-lite table as a DataFrame — current snapshot
    by default, any historical snapshot via ``snapshot_id`` (time
    travel), with identity-partition pruning via ``where`` so pruned
    files are never opened by Spark.

    Row-level deletes are applied per the spec's sequence-number
    rules: an EQUALITY delete with sequence number s removes matching
    rows from data files with sequence number < s; a POSITION delete
    applies to data files with sequence number <= s, matched on the
    (file_path, pos) pairs via the parquet ``_metadata`` hidden
    columns. Data files are grouped by sequence number; each group
    anti-joins (broadcast — delete files are small key/position
    lists) against the applicable deletes."""
    from pyspark.sql import functions as F

    meta = _load_metadata(location)
    sid = (
        meta["current-snapshot-id"]
        if snapshot_id is None
        else snapshot_id
    )
    snap = next(
        (s for s in meta["snapshots"] if s["snapshot-id"] == sid), None
    )
    # presentation schema: a read of the CURRENT table uses the current
    # schema (rename/drop are metadata-only commits that create no
    # snapshot); time travel presents the snapshot under ITS schema
    schema = meta["schemas"][
        meta["current-schema-id"]
        if snapshot_id is None
        else (snap or {}).get("schema-id", meta["current-schema-id"])
    ]
    name_history = _field_name_history(meta)
    multi_schema = len(meta["schemas"]) > 1
    _ICEBERG_TO_SPARK = {
        "long": "long", "int": "int", "string": "string",
        "double": "double", "float": "float", "boolean": "boolean",
        "binary": "binary", "date": "date", "timestamptz": "timestamp",
    }

    def read(paths: list[str], with_pos: bool = False) -> DataFrame:
        r = spark.read
        if multi_schema:
            # heterogeneous file schemas after add-column evolution:
            # old files read the new columns as null
            r = r.option("mergeSchema", "true")
        df = r.parquet(*paths)
        # project to the SNAPSHOT's schema (order + columns absent
        # from every selected file — e.g. a pruned read of pre-
        # evolution partitions — become typed nulls)
        cols = []
        if with_pos:
            # (file, position) identity for applying position deletes
            cols += [
                _strip_file_scheme(
                    F.col("_metadata.file_path")
                ).alias("__file_path"),
                F.col("_metadata.row_index").alias("__pos"),
            ]
        for f in schema["fields"]:
            # resolve by field id: a file written under an older schema
            # carries the name current at ITS write time, so coalesce
            # across the field's name history (names are disjoint per
            # file — exactly one is non-absent — and the no-reuse rule
            # guarantees each physical name maps to one field id)
            cands = [
                n
                for n in name_history.get(f["id"], [f["name"]])
                if n in df.columns
            ]
            if not cands:
                cols.append(
                    F.lit(None)
                    .cast(_ICEBERG_TO_SPARK.get(f["type"], "binary"))
                    .alias(f["name"])
                )
            elif len(cands) == 1:
                cols.append(F.col(cands[0]).alias(f["name"]))
            else:
                cols.append(
                    F.coalesce(*[F.col(n) for n in cands]).alias(
                        f["name"]
                    )
                )
        return df.select(*cols)

    data, deletes, _ = _scan_plan(location, snapshot_id, where)
    if not data:
        # empty selection: preserve schema from any snapshot file,
        # else fail clearly
        all_data, _, _ = _scan_plan(location, snapshot_id)
        if not all_data:
            raise ValueError(f"{location}: snapshot has no data files")
        return read([all_data[0][0]]).limit(0)
    if not deletes:
        return read([p for p, _ in data])

    # group data files by sequence number: all files in a group see
    # the same set of applicable deletes
    by_seq: dict[int, list[str]] = {}
    for path, seq in data:
        by_seq.setdefault(seq, []).append(path)
    out: DataFrame | None = None
    for seq in sorted(by_seq):
        # spec sequence-number rules: equality deletes apply to
        # STRICTLY older data files, position deletes to older-or-same
        eq_applicable = [
            d for d in deletes if d["content"] == 2 and d["seq"] > seq
        ]
        pos_applicable = [
            d for d in deletes if d["content"] == 1 and d["seq"] >= seq
        ]
        part = read(by_seq[seq], with_pos=bool(pos_applicable))
        if pos_applicable:
            pos_keys = (
                spark.read.parquet(
                    *[d["path"] for d in pos_applicable]
                )
                .select(
                    F.col("file_path").alias("__file_path"),
                    F.col("pos").alias("__pos"),
                )
                .distinct()
            )
            part = part.join(
                F.broadcast(pos_keys),
                on=["__file_path", "__pos"],
                how="left_anti",
            ).drop("__file_path", "__pos")
        # one anti-join per distinct equality-column set
        by_cols: dict[tuple[str, ...], list[str]] = {}
        for d in eq_applicable:
            by_cols.setdefault(tuple(d["cols"]), []).append(d["path"])
        for cols, paths in sorted(by_cols.items()):
            # delete files store the equality columns in equality_ids
            # order under the names current at DELETE time; rename by
            # position to the presentation names so the anti-join still
            # matches after a later column rename
            keys = None
            for p in sorted(paths):
                k = spark.read.parquet(p).toDF(*cols)
                keys = k if keys is None else keys.unionByName(k)
            keys = keys.distinct()
            part = part.join(
                F.broadcast(keys), on=list(cols), how="left_anti"
            )
        out = part if out is None else out.unionByName(part)
    return out
