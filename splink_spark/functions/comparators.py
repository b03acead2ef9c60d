"""Native comparison-level builders (SURVEY.md §2.2).

Each builder returns a :class:`splink_spark.model.ComparisonLevel` (or a
full :class:`Comparison`) whose condition is a Spark SQL expression over
``<col>_l`` / ``<col>_r`` pair columns, using **built-in JVM functions**
wherever Spark has them (levenshtein, array_intersect, datediff,
haversine via trig, parse_url...) — the UDF path is reserved for
jaro/jaro_winkler/damerau which Spark lacks.

reference: splink/comparison_level_library.py and
splink/comparison_library.py (the *_level / *_at_thresholds builders);
dialect-specific function bindings under splink/duckdb/…, splink/spark/….
"""

from __future__ import annotations

from splink_spark.model import Comparison, ComparisonLevel


def null_level(col: str) -> ComparisonLevel:
    """reference: comparison_level_library.py::null_level."""
    return ComparisonLevel(
        label=f"{col} is null",
        condition=f"{col}_l IS NULL OR {col}_r IS NULL",
        is_null_level=True,
    )


def exact_match_level(
    col: str,
    m: float | None = None,
    u: float | None = None,
    tf_adjustment: bool = False,
    tf_minimum_u_value: float = 0.0,
) -> ComparisonLevel:
    """reference: comparison_level_library.py::exact_match_level."""
    return ComparisonLevel(
        label=f"exact {col}",
        condition=f"{col}_l = {col}_r",
        m_probability=m,
        u_probability=u,
        tf_adjustment_column=col if tf_adjustment else None,
        tf_minimum_u_value=tf_minimum_u_value,
    )


def else_level(m: float | None = None, u: float | None = None) -> ComparisonLevel:
    """reference: comparison_level_library.py::else_level."""
    return ComparisonLevel(
        label="all other comparisons",
        condition="TRUE",
        m_probability=m,
        u_probability=u,
        is_else_level=True,
    )


def levenshtein_level(
    col: str, threshold: int, m: float | None = None, u: float | None = None
) -> ComparisonLevel:
    """Edit distance <= t using Spark's native levenshtein (JVM-side;
    the 3-arg bounded form early-exits at the threshold and returns -1
    when the bound is exceeded — hence BETWEEN, not <=).
    reference: comparison_library.py::levenshtein_at_thresholds."""
    return ComparisonLevel(
        label=f"levenshtein {col} <= {threshold}",
        condition=(
            f"levenshtein({col}_l, {col}_r, {threshold}) "
            f"BETWEEN 0 AND {threshold}"
        ),
        # DuckDB's levenshtein has no bounded form
        sql_condition=f"levenshtein({col}_l, {col}_r) <= {threshold}",
        m_probability=m,
        u_probability=u,
    )


def jaro_winkler_level(
    col: str, threshold: float, m: float | None = None, u: float | None = None
) -> ComparisonLevel:
    """Jaro–Winkler >= t via the registered pandas UDF (Arrow path).
    reference: comparison_level_library.py::jaro_winkler_level (Scala UDF
    on the reference's Spark backend)."""
    return ComparisonLevel(
        label=f"jaro_winkler {col} >= {threshold}",
        condition=f"jaro_winkler({col}_l, {col}_r) >= {threshold}",
        sql_condition=(
            f"jaro_winkler_similarity({col}_l, {col}_r) >= {threshold}"
        ),
        m_probability=m,
        u_probability=u,
    )


def damerau_levenshtein_level(
    col: str, threshold: int, m: float | None = None, u: float | None = None
) -> ComparisonLevel:
    """OSA Damerau–Levenshtein <= t via the registered pandas UDF.
    reference: comparison_library.py::damerau_levenshtein_at_thresholds."""
    return ComparisonLevel(
        label=f"damerau_levenshtein {col} <= {threshold}",
        condition=f"damerau_levenshtein({col}_l, {col}_r) <= {threshold}",
        m_probability=m,
        u_probability=u,
    )


def jaccard_tokens_level(
    col: str,
    threshold: float,
    m: float | None = None,
    u: float | None = None,
    sep: str = r"\\s+",
) -> ComparisonLevel:
    """Token-set Jaccard >= t, fully native:
    size(intersect)/size(union) over split tokens — no UDF, unlike the
    reference's Scala Jaccard UDF.
    reference: comparison_level_library.py::jaccard_level."""
    def sets(side: str, dialect_sep: str) -> str:
        return f"array_distinct(split({col}_{side}, '{dialect_sep}'))"

    spark_expr = (
        f"size(array_intersect({sets('l', sep)}, {sets('r', sep)})) / "
        f"size(array_union({sets('l', sep)}, {sets('r', sep)})) >= {threshold}"
    )
    # DuckDB: list_intersect exists; list_union doesn't -> |A|+|B|-|A∩B|
    d_l = f"list_distinct(string_split_regex({col}_l, '\\s+'))"
    d_r = f"list_distinct(string_split_regex({col}_r, '\\s+'))"
    duck_expr = (
        f"(len(list_intersect({d_l}, {d_r})) * 1.0 / "
        f"(len({d_l}) + len({d_r}) - len(list_intersect({d_l}, {d_r}))))"
        f" >= {threshold}"
    )
    return ComparisonLevel(
        label=f"token jaccard {col} >= {threshold}",
        condition=spark_expr,
        sql_condition=duck_expr,
        m_probability=m,
        u_probability=u,
    )


def array_intersect_level(
    col: str, min_intersection: int = 1, m: float | None = None, u: float | None = None
) -> ComparisonLevel:
    """reference: comparison_level_library.py::array_intersect_level."""
    return ComparisonLevel(
        label=f"array_intersect {col} >= {min_intersection}",
        condition=(
            f"size(array_intersect({col}_l, {col}_r)) >= {min_intersection}"
        ),
        sql_condition=(
            f"len(list_intersect({col}_l, {col}_r)) >= {min_intersection}"
        ),
        m_probability=m,
        u_probability=u,
    )


def columns_reversed_level(
    col1: str, col2: str, m: float | None = None, u: float | None = None
) -> ComparisonLevel:
    """reference: comparison_level_library.py::columns_reversed_level."""
    return ComparisonLevel(
        label=f"{col1}/{col2} reversed",
        condition=(
            f"{col1}_l = {col2}_r AND {col2}_l = {col1}_r"
        ),
        m_probability=m,
        u_probability=u,
    )


def datediff_level(
    col: str,
    days: int,
    m: float | None = None,
    u: float | None = None,
    cast_strings_to_date: bool = False,
) -> ComparisonLevel:
    """|datediff| <= days. reference:
    comparison_level_library.py::datediff_level.
    ``cast_strings_to_date`` wraps both sides in ``try_cast(x AS
    DATE)`` (identical syntax in Spark and DuckDB) for string-typed
    date columns — DuckDB's datediff does not auto-cast VARCHAR."""
    l, r = f"{col}_l", f"{col}_r"
    if cast_strings_to_date:
        l = f"try_cast({l} AS DATE)"
        r = f"try_cast({r} AS DATE)"
    return ComparisonLevel(
        label=f"datediff {col} <= {days}d",
        condition=f"abs(datediff({l}, {r})) <= {days}",
        sql_condition=f"abs(datediff('day', {r}, {l})) <= {days}",
        m_probability=m,
        u_probability=u,
    )


def distance_in_km_level(
    lat_col: str,
    long_col: str,
    km: float,
    m: float | None = None,
    u: float | None = None,
) -> ComparisonLevel:
    """Haversine distance <= km, native trig only.
    reference: comparison_level_library.py::distance_in_km_level."""
    def hav(dialect_radians: str = "radians") -> str:
        la1 = f"{dialect_radians}({lat_col}_l)"
        la2 = f"{dialect_radians}({lat_col}_r)"
        dla = f"{dialect_radians}({lat_col}_r - {lat_col}_l)"
        dlo = f"{dialect_radians}({long_col}_r - {long_col}_l)"
        return (
            f"12742 * asin(sqrt(pow(sin({dla}/2),2) + "
            f"cos({la1})*cos({la2})*pow(sin({dlo}/2),2)))"
        )

    return ComparisonLevel(
        label=f"within {km}km",
        condition=f"{hav()} <= {km}",
        m_probability=m,
        u_probability=u,
    )


def percentage_difference_level(
    col: str, pct: float, m: float | None = None, u: float | None = None
) -> ComparisonLevel:
    """reference: comparison_level_library.py::percentage_difference_level."""
    return ComparisonLevel(
        label=f"pct diff {col} < {pct}",
        condition=(
            f"abs({col}_l - {col}_r) / greatest(abs({col}_l), abs({col}_r))"
            f" < {pct}"
        ),
        m_probability=m,
        u_probability=u,
    )


def cosine_similarity_level(
    col: str, threshold: float, m: float | None = None, u: float | None = None
) -> ComparisonLevel:
    """Cosine over array<float/double> columns, native column math
    (aggregate over zip_with) — replaces the reference jar's
    CosineDistance UDF."""
    def dot(x: str, y: str) -> str:
        return (
            f"aggregate(zip_with({x}, {y}, (a, b) -> cast(a as double) * b),"
            f" 0.0D, (acc, v) -> acc + v)"
        )

    def norm(x: str) -> str:
        return f"sqrt({dot(x, x)})"

    expr = (
        f"{dot(col + '_l', col + '_r')} / "
        f"({norm(col + '_l')} * {norm(col + '_r')}) >= {threshold}"
    )
    duck = (
        f"list_cosine_similarity({col}_l, {col}_r) >= {threshold}"
    )
    return ComparisonLevel(
        label=f"cosine {col} >= {threshold}",
        condition=expr,
        sql_condition=duck,
        m_probability=m,
        u_probability=u,
    )


def phonetic_match_level(
    col: str,
    m: float | None = None,
    u: float | None = None,
    method: str = "dmetaphone",
) -> ComparisonLevel:
    """Phonetic equality. ``method="dmetaphone"`` matches the
    reference's Scala-jar double-metaphone (classes DoubleMetaphone/
    DoubleMetaphoneAlt via distance_function_level): two names agree
    when EITHER code of one equals EITHER code of the other.
    ``method="soundex"`` uses Spark's native soundex (JVM-side, no
    Python boundary) — prefer it in hot paths where the coarser
    encoding is acceptable. Requires register_udfs() for dmetaphone
    (the Linker registers them automatically)."""
    if method == "soundex":
        return ComparisonLevel(
            label=f"soundex {col}",
            condition=f"soundex({col}_l) = soundex({col}_r)",
            m_probability=m,
            u_probability=u,
        )
    cond = (
        f"dmetaphone({col}_l) != '' AND ("
        f"dmetaphone({col}_l) = dmetaphone({col}_r) OR "
        f"dmetaphone({col}_l) = dmetaphone_alt({col}_r) OR "
        f"dmetaphone_alt({col}_l) = dmetaphone({col}_r) OR "
        f"(dmetaphone_alt({col}_l) != '' AND "
        f"dmetaphone_alt({col}_l) = dmetaphone_alt({col}_r)))"
    )
    return ComparisonLevel(
        label=f"dmetaphone {col}",
        condition=cond,
        m_probability=m,
        u_probability=u,
    )


def distance_function_level(
    col: str,
    function_name: str,
    threshold: float,
    higher_is_closer: bool = True,
    m: float | None = None,
    u: float | None = None,
) -> ComparisonLevel:
    """Arbitrary named SQL function vs threshold. reference:
    comparison_level_library.py::distance_function_level."""
    op = ">=" if higher_is_closer else "<="
    return ComparisonLevel(
        label=f"{function_name} {col} {op} {threshold}",
        condition=f"{function_name}({col}_l, {col}_r) {op} {threshold}",
        m_probability=m,
        u_probability=u,
    )


# -- whole-comparison builders (reference: splink/comparison_library.py) ----

def exact_match(
    col: str, tf_adjustment: bool = False
) -> Comparison:
    """reference: comparison_library.py::exact_match."""
    return Comparison(
        output_column_name=col,
        input_columns=[col],
        levels=[
            null_level(col),
            exact_match_level(col, tf_adjustment=tf_adjustment),
            else_level(),
        ],
    )


def levenshtein_at_thresholds(
    col: str, thresholds: list[int] | int = 2, include_exact: bool = True
) -> Comparison:
    """reference: comparison_library.py::levenshtein_at_thresholds."""
    if isinstance(thresholds, (int, float)):
        thresholds = [thresholds]
    levels: list[ComparisonLevel] = [null_level(col)]
    if include_exact:
        levels.append(exact_match_level(col))
    levels += [levenshtein_level(col, t) for t in sorted(thresholds)]
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )


def jaro_winkler_at_thresholds(
    col: str, thresholds: list[float] | float = 0.9, include_exact: bool = True
) -> Comparison:
    """reference: comparison_library.py::jaro_winkler_at_thresholds."""
    if isinstance(thresholds, (int, float)):
        thresholds = [thresholds]
    levels: list[ComparisonLevel] = [null_level(col)]
    if include_exact:
        levels.append(exact_match_level(col))
    levels += [
        jaro_winkler_level(col, t) for t in sorted(thresholds, reverse=True)
    ]
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )


def damerau_levenshtein_at_thresholds(
    col: str, thresholds: list[int] | int = 2, include_exact: bool = True
) -> Comparison:
    """reference: comparison_library.py::damerau_levenshtein_at_thresholds
    (OSA variant; requires register_udfs — the Linker does this)."""
    if isinstance(thresholds, (int, float)):
        thresholds = [thresholds]
    levels: list[ComparisonLevel] = [null_level(col)]
    if include_exact:
        levels.append(exact_match_level(col))
    levels += [
        damerau_levenshtein_level(col, t) for t in sorted(thresholds)
    ]
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )


def jaccard_at_thresholds(
    col: str,
    thresholds: list[float] | float = 0.9,
    include_exact: bool = True,
) -> Comparison:
    """reference: comparison_library.py::jaccard_at_thresholds (token-set
    jaccard, native array ops — the reference needed its Scala jar)."""
    if isinstance(thresholds, (int, float)):
        thresholds = [thresholds]
    levels: list[ComparisonLevel] = [null_level(col)]
    if include_exact:
        levels.append(exact_match_level(col))
    levels += [
        jaccard_tokens_level(col, t)
        for t in sorted(thresholds, reverse=True)
    ]
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )


def array_intersect_at_sizes(
    col: str, sizes: list[int] | int = 1
) -> Comparison:
    """reference: comparison_library.py::array_intersect_at_sizes."""
    if isinstance(sizes, int):
        sizes = [sizes]
    levels: list[ComparisonLevel] = [null_level(col)]
    levels += [
        array_intersect_level(col, min_intersection=s)
        for s in sorted(sizes, reverse=True)
    ]
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )


def datediff_at_thresholds(
    col: str,
    thresholds: list[int] | None = None,
    include_exact: bool = True,
    cast_strings_to_date: bool = False,
) -> Comparison:
    """reference: comparison_library.py::datediff_at_thresholds.
    ``thresholds``: |datediff| day bounds, tightest first,
    e.g. [30, 365]."""
    thresholds = thresholds or [30, 365]
    levels: list[ComparisonLevel] = [null_level(col)]
    if include_exact:
        levels.append(exact_match_level(col))
    levels += [
        datediff_level(
            col, days, cast_strings_to_date=cast_strings_to_date
        )
        for days in sorted(thresholds)
    ]
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )
