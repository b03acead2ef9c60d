"""Vectorized MinHash/SimHash UDF kernels: determinism, edge cases,
agreement with a per-row reference implementation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from splink_spark.functions.minhash_udf import (
    _flat_shingles,
    make_minhash_udf,
    make_simhash_udf,
)


def _ref_minhash(tokens, num_bands, k):
    """Per-row reference: same shingle + SipHash semantics, naive loop."""
    if tokens is None:
        return None
    toks = list(tokens)
    if not toks:
        return [0] * num_bands
    if len(toks) < k:
        shingles = [" ".join(toks)]
    else:
        shingles = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]
    arr = np.array(shingles, dtype=object)
    out = []
    for b in range(num_bands):
        h = pd.util.hash_array(arr, hash_key=f"minhashband{b:05d}")
        out.append(int(h.min().view(np.int64)))
    return out


def test_flat_shingles_row_spans():
    s = pd.Series([["a", "b", "c", "d"], ["x"], None, [], ["p", "q", "r"]])
    sh, rows, lens, n = _flat_shingles(s, 3)
    assert n == 5
    assert list(lens) == [4, 1, 0, 0, 3]
    by_row = {}
    for v, r in zip(sh, rows):
        by_row.setdefault(int(r), []).append(v)
    assert by_row[0] == ["a b c", "b c d"]
    assert by_row[1] == ["x"]  # short row: whole-row shingle
    assert by_row[4] == ["p q r"]
    assert 2 not in by_row and 3 not in by_row


def test_minhash_udf_matches_reference(spark):
    import random

    rnd = random.Random(3)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    data = []
    for i in range(200):
        ln = rnd.randint(0, 10)
        data.append((i, [rnd.choice(vocab) for _ in range(ln)]))
    data.append((200, None))
    df = spark.createDataFrame(data, "id: long, toks: array<string>")
    udf = make_minhash_udf(num_bands=4, k=3)
    got = {
        r["id"]: r["sig"]
        for r in df.select("id", udf("toks").alias("sig")).collect()
    }
    for i, toks in data:
        assert got[i] == _ref_minhash(toks, 4, 3), (i, toks)


def test_minhash_udf_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(1, ["the", "quick", "brown", "fox", "jumps"])],
        "id: long, toks: array<string>",
    )
    udf = make_minhash_udf(4, 3)
    a = df.select(udf("toks")).collect()[0][0]
    b = df.select(udf("toks")).collect()[0][0]
    assert a == b
    assert len(set(a)) == 4  # bands use distinct hash keys


def test_simhash_udf_properties(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d", "e", "f", "g", "h"]),
            (2, ["a", "b", "c", "d", "e", "f", "g", "h"]),  # identical
            (3, ["z", "y", "x", "w", "v", "u", "t", "s"]),  # disjoint
            (4, None),
        ],
        "id: long, toks: array<string>",
    )
    udf = make_simhash_udf(3)
    got = {r["id"]: r["sh"] for r in df.select("id", udf("toks").alias("sh")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert got[4] is None
    # hamming of identical = 0, of disjoint ~ 32 expected
    ham = bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert 10 <= ham <= 54
