"""Comparator kernels vs pure-python oracles and DuckDB.

Mirrors the reference's comparator parity testing (SURVEY.md §5); the
batch kernels must agree with per-pair reference implementations, and
jaro/jaro_winkler additionally with DuckDB's built-ins (the oracle
engine the driver uses).
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from splink_spark.functions.kernels import (
    damerau_levenshtein_batch,
    damerau_levenshtein_py,
    jaro_batch,
    jaro_py,
    jaro_winkler_batch,
    jaro_winkler_py,
)


def _random_pairs(n=400, seed=7, alphabet="abcdef", max_len=12):
    rnd = random.Random(seed)
    out = []
    for _ in range(n):
        s1 = "".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, max_len)))
        s2 = "".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, max_len)))
        out.append((s1, s2))
    out += [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("", "abc"),
        ("abc", ""),
        ("", ""),
        ("same", "same"),
        ("ca", "abc"),
        ("ünïcodé", "unicode"),
    ]
    return out


@pytest.fixture(scope="module")
def pairs():
    return _random_pairs()


def test_jaro_matches_reference_impl(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_batch(a, b)
    for i, (s1, s2) in enumerate(pairs):
        assert got[i] == pytest.approx(jaro_py(s1, s2), abs=1e-12), (s1, s2)


def test_jaro_winkler_matches_reference_impl(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_winkler_batch(a, b)
    for i, (s1, s2) in enumerate(pairs):
        assert got[i] == pytest.approx(jaro_winkler_py(s1, s2), abs=1e-12)


def test_damerau_matches_reference_impl(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = damerau_levenshtein_batch(a, b)
    for i, (s1, s2) in enumerate(pairs):
        assert got[i] == damerau_levenshtein_py(s1, s2), (s1, s2)


def test_jaro_winkler_matches_duckdb(pairs):
    con = duckdb.connect()
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    jw = jaro_winkler_batch(a, b)
    j = jaro_batch(a, b)
    for i, (s1, s2) in enumerate(pairs):
        if not s1 or not s2:
            continue
        if not (s1.isascii() and s2.isascii()):
            # DuckDB's jaro runs over UTF-8 bytes; ours over codepoints
            continue
        dj, djw = con.execute(
            "select jaro_similarity(?,?), jaro_winkler_similarity(?,?)",
            [s1, s2, s1, s2],
        ).fetchone()
        assert j[i] == pytest.approx(dj, abs=1e-9)
        assert jw[i] == pytest.approx(djw, abs=1e-9)


def test_null_handling():
    jw = jaro_winkler_batch(["a", None, None], [None, "b", None])
    assert np.isnan(jw).all()
    dl = damerau_levenshtein_batch(["a", None], [None, "b"])
    assert (dl == -1).all()


def test_transposition_cases():
    # OSA: 'ca' -> 'abc' is 3 (no substring edit after transposition)
    assert damerau_levenshtein_batch(["ca"], ["abc"])[0] == 3
    assert damerau_levenshtein_batch(["abcd"], ["abdc"])[0] == 1
