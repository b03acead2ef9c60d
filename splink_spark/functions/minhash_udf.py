"""Vectorized MinHash / SimHash signature UDFs.

The native-expression MinHash (functions/text.py::minhash_band) is kept
for DuckDB-oracle parity on small tables, but Spark evaluates
higher-order-function lambdas interpreted (no whole-stage codegen) at
~2-4 ms/row — unusable at web scale. These pandas UDFs do the same job
~100x faster with a **fully vectorized** kernel: Arrow batches in, then

- flatten the per-row token lists into one flat array + row ids,
- build k-shingles by vectorized string concat of the flat array with
  its shifted selves (mask at row boundaries),
- hash all shingles per band in one call to ``pd.util.hash_array``
  (C-implemented SipHash with a per-band key -> deterministic across
  runs and machines),
- per-row minima via ``np.minimum.reduceat`` over the contiguous row
  spans (MinHash), or per-bit majority via ``np.add.reduceat`` over the
  unpacked bit matrix (SimHash).

No Python executes per row — only per batch (north rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _flat_shingles(
    tok: pd.Series, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(shingle_strings, shingle_row_ids, row_lengths, n_rows).

    Rows with fewer than k tokens contribute ONE shingle = all tokens
    joined (same semantics as functions/text.py::word_shingles).
    """
    n = len(tok)
    lists = tok.tolist()
    lens = np.fromiter(
        (0 if x is None else len(x) for x in lists), dtype=np.int64, count=n
    )
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for x in lists:  # row-boundary bookkeeping only; no per-token work
        if x is not None and len(x):  # Arrow hands us numpy arrays
            flat[pos : pos + len(x)] = x
            pos += len(x)
    row_ids = np.repeat(np.arange(n), lens)

    if total >= k:
        idx = np.arange(total - k + 1)
        same_row = row_ids[idx] == row_ids[idx + k - 1]
        s = pd.Series(flat[idx], dtype=object)
        for j in range(1, k):
            s = s.str.cat(pd.Series(flat[idx + j], dtype=object), sep=" ")
        sh = s.to_numpy()[same_row]
        sh_rows = row_ids[idx][same_row]
    else:
        sh = np.empty(0, dtype=object)
        sh_rows = np.empty(0, dtype=np.int64)

    # short rows (0 < len < k): single whole-row shingle
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        joined = np.array(
            [" ".join(list(lists[i])) for i in short], dtype=object
        )
        sh = np.concatenate([sh, joined])
        sh_rows = np.concatenate([sh_rows, short])
        order = np.argsort(sh_rows, kind="stable")
        sh, sh_rows = sh[order], sh_rows[order]
    return sh, sh_rows, lens, n


def _row_starts(sh_rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    starts = np.flatnonzero(np.r_[True, np.diff(sh_rows) != 0])
    return starts, sh_rows[starts]


def make_minhash_udf(num_bands: int = 4, k: int = 3):
    """tokens: array<string> -> array<long> of per-band min-hashes
    (int64 view of SipHash uint64; None row -> None)."""

    @pandas_udf(ArrayType(LongType()))
    def minhash_udf(tok: pd.Series) -> pd.Series:
        sh, sh_rows, lens, n = _flat_shingles(tok, k)
        out = np.zeros((n, num_bands), dtype=np.int64)
        if len(sh):
            starts, present = _row_starts(sh_rows)
            for b in range(num_bands):
                h = pd.util.hash_array(sh, hash_key=f"minhashband{b:05d}")
                mins = np.minimum.reduceat(h, starts)
                out[present, b] = mins.view(np.int64)
        null_rows = tok.isna().to_numpy()
        result = [None if null_rows[i] else out[i].tolist() for i in range(n)]
        return pd.Series(result, dtype=object)

    return minhash_udf


def make_simhash_udf(k: int = 3):
    """tokens: array<string> -> int64 SimHash (per-bit majority over
    shingle SipHashes)."""

    @pandas_udf(LongType())
    def simhash_udf(tok: pd.Series) -> pd.Series:
        sh, sh_rows, lens, n = _flat_shingles(tok, k)
        out = np.zeros(n, dtype=np.int64)
        if len(sh):
            h = pd.util.hash_array(sh, hash_key="simhash64kernel0")
            bits = (
                np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1)
                .astype(np.int32)
            )  # [n_shingles, 64], little-endian byte order per uint64
            starts, present = _row_starts(sh_rows)
            sums = np.add.reduceat(bits, starts, axis=0)
            counts = np.add.reduceat(
                np.ones(len(sh), dtype=np.int32), starts
            )[:, None]
            maj = (sums * 2 >= counts).astype(np.uint8)
            packed = np.packbits(maj, axis=1).view(np.uint64).ravel()
            out[present] = packed.view(np.int64)
        null_rows = tok.isna().to_numpy()
        s = pd.Series(out)
        return s.where(~null_rows)

    return simhash_udf


def minhash_columns(
    tokens_col: Column, num_bands: int = 4, k: int = 3
) -> Column:
    """Convenience: the signature array column (explode with
    element_at for per-band blocking keys)."""
    return make_minhash_udf(num_bands, k)(tokens_col)
