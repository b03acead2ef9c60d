"""Deterministic person-record fixture (FIXTURES.md §1) — analogue of
the reference's bundled synthetic dataset
(reference: splink/datasets.py::splink_datasets.fake_1000,
tests/datasets/fake_1000.csv): ~N entities with 1–4 records each,
corruption ops = char typos (levenshtein exercise), first/surname swap
(columns_reversed), null-outs (null level), dob day/month swap.

``cluster`` is ground truth — never a model input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_FIRST = (
    "james mary john patricia robert jennifer michael linda david susan "
    "william jessica richard sarah joseph karen thomas lisa charles nancy "
    "amelia oliver harry isla george ava noah emily jack sophie"
).split()
_SUR = (
    "smith jones taylor brown williams wilson johnson davies robinson "
    "wright thompson evans walker white roberts green hall wood jackson "
    "clark patel khan lewis james watson harris clarke cooper king lee"
).split()
_CITY = "london leeds york bath hull derby truro ely wells ripon".split()


def _typo(rng: np.random.Generator, s: str) -> str:
    if len(s) < 3:
        return s
    i = int(rng.integers(1, len(s) - 1))
    c = chr(ord("a") + int(rng.integers(0, 26)))
    op = int(rng.integers(0, 3))
    if op == 0:  # substitute
        return s[:i] + c + s[i + 1 :]
    if op == 1:  # delete
        return s[:i] + s[i + 1 :]
    return s[:i] + c + s[i:]  # insert


def _postcode(entity: int, city: str, r: int) -> str | None:
    """Deterministic UK-shaped postcode (AREA DISTRICT space SECTOR UNIT,
    e.g. ``LO3 7KD``) as a pure function of (entity, city, record index)
    — intentionally NOT drawn from the rng stream so adding this column
    left every previously generated value untouched. Record-level
    corruption: same-sector unit change (postcode_comparison's sector
    level), same-area district change (area level), or null-out."""
    area = (city[:2] if city else "zz").upper()
    district = entity % 9 + 1
    sector = (entity * 7) % 9 + 1
    unit = chr(ord("A") + (entity * 3 + 1) % 26) + chr(
        ord("A") + (entity * 5 + 2) % 26
    )
    if r > 0:
        if (entity + r) % 7 == 0:
            return None
        if (entity + r) % 5 == 0:  # unit typo: sector still equal
            unit = chr(ord("A") + (entity * 3 + r) % 26) + unit[1]
        elif (entity + r) % 4 == 0:  # district change: area still equal
            district = district % 9 + 1
    return f"{area}{district} {sector}{unit}"


def generate_persons(
    n_entities: int = 300, seed: int = 42, max_records: int = 4
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    uid = 0
    for e in range(n_entities):
        first = _FIRST[int(rng.integers(0, len(_FIRST)))]
        sur = _SUR[int(rng.integers(0, len(_SUR)))]
        city = _CITY[int(rng.integers(0, len(_CITY)))]
        y = int(rng.integers(1950, 2005))
        m = int(rng.integers(1, 13))
        d = int(rng.integers(1, 28))
        email = f"{first}.{sur}{int(rng.integers(1, 99))}@example.com"
        n_rec = int(rng.integers(1, max_records + 1))
        for r in range(n_rec):
            f, s, c, em = first, sur, city, email
            yy, mm, dd = y, m, d
            if r > 0:
                for _ in range(int(rng.integers(1, 3))):
                    op = int(rng.integers(0, 6))
                    if op == 0:
                        f = _typo(rng, f)
                    elif op == 1:
                        s = _typo(rng, s)
                    elif op == 2:
                        f, s = s, f  # columns reversed
                    elif op == 3:
                        c = None  # null-out
                    elif op == 4 and mm <= 12 and dd <= 12:
                        mm, dd = dd, mm  # dob day/month swap
                    else:
                        em = _typo(rng, em)
            dob = f"{yy:04d}-{mm:02d}-{dd:02d}"
            rows.append((uid, f, s, dob, c, em, _postcode(e, city, r), e))
            uid += 1
    return pd.DataFrame(
        rows,
        columns=[
            "unique_id",
            "first_name",
            "surname",
            "dob",
            "city",
            "email",
            "postcode",
            "cluster",
        ],
    )


def persons_dataframe(
    spark: SparkSession, n_entities: int = 300, seed: int = 42
) -> DataFrame:
    pdf = generate_persons(n_entities=n_entities, seed=seed)
    return spark.createDataFrame(
        pdf,
        schema=(
            "unique_id long, first_name string, surname string, "
            "dob string, city string, email string, postcode string, "
            "cluster long"
        ),
    )


_PERSON_SCHEMA = (
    "unique_id long, first_name string, surname string, dob string, "
    "city string, email string, postcode string, cluster long"
)


def _postcode_wide(entity: int, city: str, r: int) -> str | None:
    """Full-entropy variant of :func:`_postcode` for the 1M-record
    benchmark fixture: `_postcode`'s unit/sector/district all reduce
    to ``entity mod 234`` per city (~2.3k distinct postcodes total),
    which makes the postcode blocking key quadratic at 1M records
    (hundreds of rows per key). Here the digits consume successive
    base-26/9 slices of the entity id, so the space is ~547k values
    and collisions stay realistic (a few households per postcode).
    Same corruption ops as `_postcode`."""
    area = (city[:2] if city else "zz").upper()
    unit = chr(ord("A") + entity % 26) + chr(
        ord("A") + (entity // 26) % 26
    )
    sector = (entity // 676) % 9 + 1
    district = (entity // 6084) % 9 + 1
    if r > 0:
        if (entity + r) % 7 == 0:
            return None
        if (entity + r) % 5 == 0:  # unit typo: sector still equal
            unit = chr(ord("A") + (entity + r * 3) % 26) + unit[1]
        elif (entity + r) % 4 == 0:  # district change: area still equal
            district = district % 9 + 1
    return f"{area}{district} {sector}{unit}"


def _entity_person_rows(
    e: int, seed: int, max_records: int
) -> list[tuple]:
    """All records of one entity from a PER-ENTITY rng — deterministic
    at any partitioning (same device as distributed_corpus in
    webpages.py; values differ from the sequential-stream
    generate_persons, which remains the small-fixture path)."""
    rng = np.random.default_rng((seed, e))
    first = _FIRST[int(rng.integers(0, len(_FIRST)))]
    sur = _SUR[int(rng.integers(0, len(_SUR)))]
    city = _CITY[int(rng.integers(0, len(_CITY)))]
    y = int(rng.integers(1950, 2005))
    m = int(rng.integers(1, 13))
    d = int(rng.integers(1, 28))
    # entity-salted digits: email strings are entity-unique BEFORE
    # corruption (two distinct people almost never share a full
    # address; the sequential-stream generate_persons keeps its small
    # colliding space for collision-handling tests)
    email = f"{first}.{sur}{e}@example.com"
    n_rec = int(rng.integers(1, max_records + 1))
    rows = []
    for r in range(n_rec):
        f, s, c, em = first, sur, city, email
        yy, mm, dd = y, m, d
        if r > 0:
            for _ in range(int(rng.integers(1, 3))):
                op = int(rng.integers(0, 6))
                if op == 0:
                    f = _typo(rng, f)
                elif op == 1:
                    s = _typo(rng, s)
                elif op == 2:
                    f, s = s, f
                elif op == 3:
                    c = None
                elif op == 4 and mm <= 12 and dd <= 12:
                    mm, dd = dd, mm
                else:
                    em = _typo(rng, em)
        dob = f"{yy:04d}-{mm:02d}-{dd:02d}"
        rows.append(
            (
                e * max_records + r,  # globally unique, partition-free
                f, s, dob, c, em, _postcode_wide(e, city, r), e,
            )
        )
    return rows


def distributed_persons(
    spark: SparkSession,
    n_entities: int = 400_000,
    seed: int = 42,
    max_records: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Executor-side person-record generation for the 1M-record
    benchmark: mapInPandas over the entity id range, the driver never
    holds a row. ~(max_records + 1)/2 records per entity, so 400k
    entities ≈ 1M records. ``cluster`` is ground truth."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for e in pdf["id"]:
                rows.extend(
                    _entity_person_rows(int(e), seed, max_records)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "unique_id", "first_name", "surname", "dob",
                    "city", "email", "postcode", "cluster",
                ],
            )

    return spark.range(0, n_entities, 1, parts).mapInPandas(
        gen, _PERSON_SCHEMA
    )
