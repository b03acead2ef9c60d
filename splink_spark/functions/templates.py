"""Comparison template library — pre-composed multi-level comparisons
for common column types (dates, person names, UK postcodes, emails).

reference: splink/comparison_template_library.py::date_comparison,
name_comparison, forename_surname_comparison, postcode_comparison,
email_comparison. The reference builds these as dialect-specific SQL
strings; here each template composes the existing level builders
(functions/comparators.py) into a Comparison dataclass, with ANSI
``sql_condition`` overrides wherever Spark and DuckDB dialects differ
so every template stays oracle-checkable.

Levels are ordered strongest-agreement first (after the null level),
as the reference requires: first-matching-level-wins.
"""

from __future__ import annotations

from typing import Sequence

from splink_spark.model import Comparison, ComparisonLevel
from splink_spark.functions.comparators import (
    damerau_levenshtein_level,
    else_level,
    exact_match_level,
    jaro_winkler_level,
    null_level,
    phonetic_match_level,
)


def date_comparison(
    col: str,
    cast_strings_to_date: bool = False,
    invalid_dates_as_null: bool = False,
    include_exact_match_level: bool = True,
    damerau_levenshtein_thresholds: Sequence[int] = (1,),
    datediff_thresholds: Sequence[int] = (30, 365, 3650),
) -> Comparison:
    """Date cascade: exact -> string-typo (OSA Damerau-Levenshtein on
    the text form, catching day/month transpositions and digit typos)
    -> widening |datediff| day bands.

    reference: splink/comparison_template_library.py::date_comparison.
    ``cast_strings_to_date`` wraps the column in ``try_cast(x AS DATE)``
    for the datediff levels (identical syntax in Spark and DuckDB);
    with ``invalid_dates_as_null`` an uncastable string lands in the
    null level instead of falling through to else.
    """
    date_l, date_r = f"{col}_l", f"{col}_r"
    if cast_strings_to_date:
        date_l = f"try_cast({col}_l AS DATE)"
        date_r = f"try_cast({col}_r AS DATE)"

    if cast_strings_to_date and invalid_dates_as_null:
        levels: list[ComparisonLevel] = [
            ComparisonLevel(
                label=f"{col} null or invalid date",
                condition=f"{date_l} IS NULL OR {date_r} IS NULL",
                is_null_level=True,
            )
        ]
    else:
        levels = [null_level(col)]

    if include_exact_match_level:
        levels.append(exact_match_level(col))
    for t in sorted(damerau_levenshtein_thresholds):
        lv = damerau_levenshtein_level(col, t)
        lv.condition = (
            f"damerau_levenshtein(CAST({col}_l AS STRING), "
            f"CAST({col}_r AS STRING)) <= {t}"
        )
        lv.sql_condition = (
            f"damerau_levenshtein(CAST({col}_l AS VARCHAR), "
            f"CAST({col}_r AS VARCHAR)) <= {t}"
        )
        levels.append(lv)
    for days in sorted(datediff_thresholds):
        levels.append(
            ComparisonLevel(
                label=f"datediff {col} <= {days}d",
                condition=f"abs(datediff({date_l}, {date_r})) <= {days}",
                sql_condition=(
                    f"abs(datediff('day', {date_r}, {date_l})) <= {days}"
                ),
            )
        )
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )


def name_comparison(
    col: str,
    jaro_winkler_thresholds: Sequence[float] = (0.95, 0.88),
    phonetic_method: str | None = "dmetaphone",
    tf_adjustment: bool = True,
) -> Comparison:
    """Single name column: exact (term-frequency adjusted) -> tightening
    Jaro-Winkler bands -> optional phonetic (double metaphone) match.

    reference: splink/comparison_template_library.py::name_comparison.
    ``phonetic_method=None`` drops the phonetic level, which keeps the
    whole comparison ANSI-expressible (DuckDB has no metaphone).
    """
    levels: list[ComparisonLevel] = [
        null_level(col),
        exact_match_level(col, tf_adjustment=tf_adjustment),
    ]
    for t in sorted(jaro_winkler_thresholds, reverse=True):
        levels.append(jaro_winkler_level(col, t))
    if phonetic_method is not None:
        levels.append(phonetic_match_level(col, method=phonetic_method))
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )


def forename_surname_comparison(
    forename: str = "first_name",
    surname: str = "surname",
    include_columns_reversed: bool = True,
    jaro_winkler_threshold: float = 0.88,
    tf_adjustment: bool = True,
) -> Comparison:
    """Joint forename+surname comparison: exact both -> swapped ->
    both-fuzzy -> surname-only -> forename-only.

    reference:
    splink/comparison_template_library.py::forename_surname_comparison.
    """
    f_l, f_r = f"{forename}_l", f"{forename}_r"
    s_l, s_r = f"{surname}_l", f"{surname}_r"
    t = jaro_winkler_threshold
    name = f"{forename}_{surname}"
    levels: list[ComparisonLevel] = [
        ComparisonLevel(
            label=f"{forename}+{surname} null",
            condition=(
                f"({f_l} IS NULL OR {f_r} IS NULL) AND "
                f"({s_l} IS NULL OR {s_r} IS NULL)"
            ),
            is_null_level=True,
        ),
        ComparisonLevel(
            label="exact forename and surname",
            condition=f"{f_l} = {f_r} AND {s_l} = {s_r}",
            tf_adjustment_column=surname if tf_adjustment else None,
        ),
    ]
    if include_columns_reversed:
        levels.append(
            ComparisonLevel(
                label="forename/surname reversed",
                condition=f"{f_l} = {s_r} AND {s_l} = {f_r}",
            )
        )
    levels += [
        ComparisonLevel(
            label=f"jaro_winkler both >= {t}",
            condition=(
                f"jaro_winkler({f_l}, {f_r}) >= {t} AND "
                f"jaro_winkler({s_l}, {s_r}) >= {t}"
            ),
            sql_condition=(
                f"jaro_winkler_similarity({f_l}, {f_r}) >= {t} AND "
                f"jaro_winkler_similarity({s_l}, {s_r}) >= {t}"
            ),
        ),
        ComparisonLevel(
            label=f"exact {surname}",
            condition=f"{s_l} = {s_r}",
            tf_adjustment_column=surname if tf_adjustment else None,
        ),
        ComparisonLevel(
            label=f"exact {forename}",
            condition=f"{f_l} = {f_r}",
            tf_adjustment_column=forename if tf_adjustment else None,
        ),
        else_level(),
    ]
    return Comparison(
        output_column_name=name,
        input_columns=[forename, surname],
        levels=levels,
    )


# UK postcode anatomy, e.g. "SW1A 1AA": area "SW", district "SW1A",
# sector "SW1A 1", unit "SW1A 1AA". Character classes only — no
# backslash escapes, so the same pattern string is valid in Spark and
# DuckDB (RE2/ICU) regexes alike.
_PC_SECTOR = "^[A-Za-z]{1,2}[0-9][A-Za-z0-9]? ?[0-9]"
_PC_DISTRICT = "^[A-Za-z]{1,2}[0-9][A-Za-z0-9]?"
_PC_AREA = "^[A-Za-z]{1,2}"


def _regex_equal_level(
    col: str, pattern: str, label: str
) -> ComparisonLevel:
    cond = (
        f"regexp_extract({col}_l, '{pattern}', 0) <> '' AND "
        f"regexp_extract({col}_l, '{pattern}', 0) = "
        f"regexp_extract({col}_r, '{pattern}', 0)"
    )
    return ComparisonLevel(label=label, condition=cond)


def postcode_comparison(col: str = "postcode") -> Comparison:
    """UK postcode cascade: exact unit -> same sector -> same district
    -> same area, each via regexp_extract of the standard anatomy.

    reference:
    splink/comparison_template_library.py::postcode_comparison.
    """
    return Comparison(
        output_column_name=col,
        input_columns=[col],
        levels=[
            null_level(col),
            exact_match_level(col),
            _regex_equal_level(col, _PC_SECTOR, f"{col} sector"),
            _regex_equal_level(col, _PC_DISTRICT, f"{col} district"),
            _regex_equal_level(col, _PC_AREA, f"{col} area"),
            else_level(),
        ],
    )


def email_comparison(
    col: str = "email",
    jaro_winkler_threshold: float = 0.88,
    include_domain_level: bool = True,
    tf_adjustment: bool = False,
) -> Comparison:
    """Email cascade: exact -> same username (before @) -> fuzzy
    username -> same domain.

    reference: splink/comparison_template_library.py::email_comparison.
    ``split_part`` has identical semantics in Spark and DuckDB.
    """
    user_l = f"split_part({col}_l, '@', 1)"
    user_r = f"split_part({col}_r, '@', 1)"
    dom_l = f"split_part({col}_l, '@', 2)"
    dom_r = f"split_part({col}_r, '@', 2)"
    t = jaro_winkler_threshold
    levels: list[ComparisonLevel] = [
        null_level(col),
        exact_match_level(col, tf_adjustment=tf_adjustment),
        ComparisonLevel(
            label=f"{col} username exact",
            condition=f"{user_l} <> '' AND {user_l} = {user_r}",
        ),
        ComparisonLevel(
            label=f"{col} username jaro_winkler >= {t}",
            condition=f"jaro_winkler({user_l}, {user_r}) >= {t}",
            sql_condition=(
                f"jaro_winkler_similarity({user_l}, {user_r}) >= {t}"
            ),
        ),
    ]
    if include_domain_level:
        levels.append(
            ComparisonLevel(
                label=f"{col} domain exact",
                condition=f"{dom_l} <> '' AND {dom_l} = {dom_r}",
            )
        )
    levels.append(else_level())
    return Comparison(
        output_column_name=col, input_columns=[col], levels=levels
    )
