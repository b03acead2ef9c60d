"""Web-text key generators and text analysis (north-rule additions).

These are NOT in the reference (splink has no text layer); they are the
blocking-key generators BASELINE.json names (url-domain, normalized
title, shingled-text MinHash) plus the training-data-pipeline text
analysis ops (language-ID heuristic, quality scoring, token counting,
document fingerprinting). All are pure native column expressions — no
UDFs — so they stay inside whole-stage codegen and are also expressible
in ANSI SQL for the DuckDB oracle.

MinHash design: the hash family is ``md5(shingle || '#' || i)`` for
band i, and the band value is the *lexicographic minimum* of the hex
digests — a valid uniform min-hash that both Spark and DuckDB compute
identically (md5 and string min agree byte-for-byte), making the whole
signature oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalization + keys
# ---------------------------------------------------------------------------

# Diacritic transliteration table (Latin-1 Supplement + Latin
# Extended-A, lowercase — applied after lower()). Char-for-char so the
# SAME table drives Spark's translate() and DuckDB's translate(): both
# engines produce byte-identical output (unlike NFD-based strip_accents,
# whose handling of non-decomposable chars like 'ł' is engine-specific).
# reference: splink/comparison_level_library.py (case/accent
# normalisation preprocessing conventions).
_ACCENT_SRC = (
    "àáâãäåāăąçćĉċčďđèéêëēĕėęěĝğġģĥħìíîïĩīĭįıĵķĺļľŀłñńņňŉòóôõöøōŏő"
    "ŕŗřśŝşšţťŧùúûüũūŭůűųŵýÿŷźżžðþ"
)
_ACCENT_DST = (
    "aaaaaaaaacccccddeeeeeeeeegggghhiiiiiiiiijklllllnnnnnooooooooo"
    "rrrsssstttuuuuuuuuuuwyyyzzzdt"
)
assert len(_ACCENT_SRC) == len(_ACCENT_DST)
# multi-char expansions translate() can't express (both engines use
# the same replace() calls)
_ACCENT_EXPANSIONS = [("ß", "ss"), ("æ", "ae"), ("œ", "oe")]


def strip_diacritics(col: Column | str) -> Column:
    """Transliterate accented latin chars to ASCII (lowercase input)."""
    c = F.col(col) if isinstance(col, str) else col
    for src, dst in _ACCENT_EXPANSIONS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.translate(c, _ACCENT_SRC, _ACCENT_DST)


def strip_diacritics_sql(col: str) -> str:
    """DuckDB-equivalent of :func:`strip_diacritics`."""
    inner = col
    for src, dst in _ACCENT_EXPANSIONS:
        inner = f"replace({inner}, '{src}', '{dst}')"
    return f"translate({inner}, '{_ACCENT_SRC}', '{_ACCENT_DST}')"


def normalize_text(col: Column | str) -> Column:
    """lowercase, transliterate diacritics, strip punctuation to
    spaces, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = strip_diacritics(F.lower(c))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_text_sql(col: str) -> str:
    """DuckDB-equivalent of :func:`normalize_text`."""
    inner = strip_diacritics_sql(f"lower({col})")
    return (
        f"trim(regexp_replace(regexp_replace({inner}, "
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


def url_domain(col: Column | str) -> Column:
    """Blocking key: host part of a url (native parse_url)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_url(c, F.lit("HOST"))


def url_domain_sql(col: str) -> str:
    return f"regexp_extract({col}, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)"


def tokens(col: Column | str) -> Column:
    """whitespace tokens of normalized text.

    Computed as ONE regex split on separator runs instead of
    materializing normalize_text's intermediate string (two full-string
    regexp_replace passes + trim — measured 7.5s of an 8.2s
    tokenization pass at 125k docs; this form is ~4x faster). Output is
    IDENTICAL to ``split(normalize_text(col), '\\s')`` for every input:
    the replace-then-split separator classes compose to exactly
    ``[^a-z0-9]+``, leading/trailing separator runs produce the ""
    entries array_remove drops, and the all-separator/empty string maps
    to ``[""]`` via the explicit guard (NULL stays NULL because size()
    of NULL is NULL and the when() falls through to the NULL array).
    The DuckDB mirror ``tokens_sql`` is untouched — equivalence is
    pinned by tests against the old formulation.
    """
    c = strip_diacritics(
        F.lower(F.col(col) if isinstance(col, str) else col)
    )
    raw = F.array_remove(F.split(c, "[^a-z0-9]+"), "")
    # single-element transform let-binds `raw` so the split runs once
    return F.element_at(
        F.transform(
            F.array(raw),
            lambda t: F.when(
                F.size(t) == 0, F.array(F.lit(""))
            ).otherwise(t),
        ),
        1,
    )


def tokens_sql(col: str) -> str:
    return f"string_split({normalize_text_sql(col)}, ' ')"


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles of normalized text, as an array of strings.

    The token array is LET-BOUND via a single-element
    ``transform(array(tokens), t -> ...)``: the lambda variable is a
    bound value, so tokenization runs exactly once per row however many
    times the shingle builder references it. (Referencing the tokens
    *expression* inside a higher-order lambda re-evaluates the full
    tokenisation per element — measured ~100x slower; and the previous
    zip_with-shifted-copies construction allocated k sliced array
    copies per row — measured ~5x slower than this element_at form on
    the 125k-page corpus: 50s -> 10s.)
    """

    def build(t: Column) -> Column:
        n = F.size(t)
        full = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(k)]
            ),
        )
        return F.when(n < k, F.array(F.concat_ws(" ", t))).otherwise(full)

    return F.element_at(F.transform(F.array(tokens(col)), build), 1)


def word_shingles_sql(col: str, k: int = 3) -> str:
    t = tokens_sql(col)
    return (
        f"CASE WHEN len({t}) < {k} THEN [array_to_string({t}, ' ')] "
        f"ELSE list_transform(generate_series(1, len({t}) - {k - 1}), "
        f"i -> array_to_string(list_slice({t}, i, i + {k - 1}), ' ')) END"
    )


def word_shingle_hashes(
    col: Column | str, k: int = 3, keep_empty: bool = False
) -> Column:
    """64-bit hashes of the k-word shingles of normalized text — the
    narrow-key twin of :func:`word_shingles` for operators that only
    ever test shingle EQUALITY (census joins, distincts, Jaccard over
    distinct sets). 8-byte longs replace ~10k-char shingle strings in
    every downstream shuffle/aggregate, and the k-token concat_ws string
    build disappears: tokens are xxhash64'd once per row and each full
    gram composes its key from the k token hashes via the
    multi-argument ``xxhash64(h_i, .., h_{i+k-1})``.

    Equality semantics match :func:`word_shingles` exactly: tokens
    cannot contain separators (normalize_text collapses whitespace), so
    string-shingle equality == token-tuple equality == equality of
    these hashes, up to xxhash64 collisions (~n_grams^2 / 2^65 per
    corpus — the same documented trade as webtext's hashed
    text_tokens). Rows shorter than k tokens contribute ONE whole-row
    hash (over the joined string, as word_shingles does); with
    ``keep_empty=False`` the empty-text pseudo-shingle ``""`` is
    dropped here instead of by a downstream ``length(gram) > 0``
    filter. Cross-category collisions (short-row vs full-gram) are
    impossible for strings and 2^-64-unlikely here.
    """

    def build(t: Column) -> Column:
        n = F.size(t)

        # hash every token ONCE, then compose each gram hash from k
        # 8-byte longs: k string hashes per position would re-hash
        # every token k times (measured ~2x slower at k=10). The inner
        # single-element transform let-binds the hashed-token array so
        # it is computed once per row, not once per position.
        def from_hashed(h: Column) -> Column:
            return F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.xxhash64(
                    *[F.element_at(h, i + j) for j in range(k)]
                ),
            )

        full = F.element_at(
            F.transform(
                F.array(F.transform(t, lambda x: F.xxhash64(x))),
                from_hashed,
            ),
            1,
        )
        short_str = F.concat_ws(" ", t)
        short = F.array(F.xxhash64(short_str))
        if not keep_empty:
            short = F.when(F.length(short_str) > 0, short).otherwise(
                F.array().cast("array<bigint>")
            )
        return F.when(n < k, short).otherwise(full)

    return F.element_at(F.transform(F.array(tokens(col)), build), 1)


# ---------------------------------------------------------------------------
# MinHash (md5-based, oracle-checkable)
# ---------------------------------------------------------------------------

def _band_group_suffix(band: int) -> tuple[int, int]:
    """4 bands per md5: (group, hex-slice start). One 128-bit md5 hex
    digest yields four independent 32-bit (8-hex-char) band hashes —
    4x fewer digests than hashing per band; bands >= 4 salt the input
    with the group id for fresh digests."""
    group, slot = divmod(band, 4)
    return group, 1 + 8 * slot


def minhash_band(shingles: Column, band: int) -> Column:
    """One band of the signature: min over an 8-hex-char slice of
    md5(shingle [+ group salt]) across the shingle set."""
    group, start = _band_group_suffix(band)

    def h(s: Column) -> Column:
        x = s if group == 0 else F.concat(s, F.lit(f"#g{group}"))
        return F.substring(F.md5(x), start, 8)

    return F.array_min(F.transform(shingles, h))


def minhash_bands_from_digests(digests: Column, band: int) -> Column:
    """Band key from a PRE-COMPUTED md5-digest array (one digest per
    shingle per 4-band group): min over the band's hex slice. Use with
    a materialized digest column so the md5 pass runs once for every
    4 bands instead of once per band."""
    _, start = _band_group_suffix(band)
    return F.array_min(
        F.transform(digests, lambda d: F.substring(d, start, 8))
    )


def shingle_digests(shingles: Column, group: int) -> Column:
    """md5 digest per shingle for one 4-band group (group 0 unsalted —
    byte-compatible with minhash_band)."""
    def h(s: Column) -> Column:
        x = s if group == 0 else F.concat(s, F.lit(f"#g{group}"))
        return F.md5(x)

    return F.transform(shingles, h)


def minhash_signature(col: Column | str, num_bands: int = 8, k: int = 3) -> list[Column]:
    sh = word_shingles(col, k)
    return [minhash_band(sh, b).alias(f"minhash_{b}") for b in range(num_bands)]


def minhash_band_sql(col: str, band: int, k: int = 3) -> str:
    sh = word_shingles_sql(col, k)
    group, start = _band_group_suffix(band)
    salt = "" if group == 0 else f" || '#g{group}'"
    return (
        f"list_min(list_transform({sh}, "
        f"s -> substr(md5(s{salt}), {start}, 8)))"
    )


# ---------------------------------------------------------------------------
# SimHash (Spark-side only; no clean ANSI expression)
# ---------------------------------------------------------------------------

def simhash64(col: Column | str, k: int = 3) -> Column:
    """64-bit SimHash over word shingles using xxhash64: for each bit,
    majority vote over shingles of that bit.

    Single-pass expression: one aggregate over the shingle-hash array
    with a 64-wide count-array accumulator, so shingles and hashes are
    evaluated exactly once per row (a per-bit formulation would inline
    and re-evaluate the whole shingle pipeline 64 times)."""
    sh = word_shingles(col, k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    bit_idx = F.sequence(F.lit(0), F.lit(63))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                # call_function: the pyspark wrapper only takes int shifts
                lambda b: F.call_function("shiftrightunsigned", h, b)
                .bitwiseAND(F.lit(1))
                .cast("int"),
            ),
            lambda a, x: a + x,
        ),
    )
    n = F.size(sh)
    return F.aggregate(
        F.zip_with(
            counts,
            bit_idx,
            lambda c, b: F.when(
                c * 2 >= n,
                F.call_function("shiftleft", F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count native)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# text analysis (training-data pipeline ops)
# ---------------------------------------------------------------------------

_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "ein"],
}


def langid_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-hit share per language — a cheap n-gram-style heuristic.

    score_lang = (# tokens that are stopwords of lang) / (# tokens).
    """
    t = tokens(col)
    out = {}
    for lang, words in _LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.array_intersect(F.array_distinct(t), arr))
        out[lang] = (hits / F.greatest(F.size(t), F.lit(1))).alias(
            f"score_{lang}"
        )
    return out


def langid_best(col: Column | str) -> Column:
    """argmax language by stopword share ('und' if all zero)."""
    scores = langid_scores(col)
    pairs = [
        F.struct(expr.alias("score"), F.lit(lang).alias("lang"))
        for lang, expr in scores.items()
    ]
    best = F.array_max(F.array(*pairs))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count(col: Column | str) -> Column:
    """Whitespace token count of normalized text."""
    t = tokens(col)
    return F.when(
        (F.col(col) if isinstance(col, str) else col).isNull(), F.lit(None)
    ).otherwise(
        F.when(F.size(t) == 1, (F.length(F.element_at(t, 1)) > 0).cast("int"))
        .otherwise(F.size(t))
    ).cast("long")


def token_count_sql(col: str) -> str:
    t = tokens_sql(col)
    return (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN len({t}) = 1 THEN CASE WHEN length({t}[1]) > 0 THEN 1 ELSE 0 END "
        f"ELSE len({t}) END"
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: split on word boundaries AND digit/
    letter transitions — a cheap proxy for BPE token counts."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(c, r"([a-zA-Z])(\d)|(\d)([a-zA-Z])", r"$1$3 $2$4"),
                r"[^\w]+",
                " ",
            )
        ),
        r"\s+",
    )
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.size(F.filter(pieces, lambda p: F.length(p) > 0))
    ).cast("long")


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token count, mean token length,
    punctuation ratio, stopword ratio (en), uppercase ratio."""
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(col)
    n_chars = F.length(c)
    n_tokens = token_count(col)
    punct = F.length(F.regexp_replace(c, r"[\w\s]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    en = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(t, lambda x: F.array_contains(en, x)))
    return {
        "n_chars": n_chars.cast("long").alias("n_chars"),
        "n_tokens": n_tokens.alias("n_tokens"),
        "mean_token_len": (
            F.length(normalize_text(col)) / F.greatest(n_tokens, F.lit(1))
        ).alias("mean_token_len"),
        "punct_ratio": (punct / F.greatest(n_chars, F.lit(1))).alias(
            "punct_ratio"
        ),
        "upper_ratio": (upper / F.greatest(n_chars, F.lit(1))).alias(
            "upper_ratio"
        ),
        "stopword_ratio": (
            stop_hits / F.greatest(n_tokens, F.lit(1))
        ).alias("stopword_ratio"),
    }


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text —
    identical in DuckDB (exact-dedup key)."""
    return F.md5(normalize_text(col))


def doc_fingerprint_sql(col: str) -> str:
    return f"md5({normalize_text_sql(col)})"


def normalized_title_key(col: Column | str) -> Column:
    """Blocking key for titles: normalized text with spaces removed."""
    return F.regexp_replace(normalize_text(col), r"\s", "")
