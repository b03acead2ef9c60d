"""Model objects: Settings, Comparison, ComparisonLevel, BlockingRule.

Mirrors the semantics of the reference's settings dict
(reference: splink/settings.py::Settings, splink/comparison.py::Comparison,
splink/comparison_level.py::ComparisonLevel, splink/blocking.py::BlockingRule)
but as plain dataclasses serialisable to/from JSON. The model IS the query:
a trained model is the settings tree with m/u probabilities filled in.

Fellegi–Sunter semantics reproduced here (SURVEY.md §1.3):
  - each Comparison has ordered, mutually exclusive ComparisonLevels;
    first-matching-level-wins; a null level short-circuits to gamma = -1
    and contributes Bayes factor 1 (match weight 0).
  - pair posterior odds = prior_odds * prod_c (m / u) over the level each
    comparison lands in; match_weight = log2(odds);
    match_probability = 2^w / (1 + 2^w).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel gamma value for the null level (either side NULL).
# reference: splink/comparison_level.py (null level => comparison vector -1)
NULL_GAMMA = -1


@dataclass
class ComparisonLevel:
    """One level of a comparison: a predicate over `<col>_l` / `<col>_r`
    columns plus its m/u probabilities.

    ``condition`` is a Spark SQL boolean expression string referencing
    suffixed pair columns, e.g. ``"lang_l = lang_r"`` or
    ``"levenshtein(title_l, title_r) <= 2"``. ``sql_condition`` optionally
    overrides it for the DuckDB oracle when dialects differ.
    """

    label: str
    condition: str  # Spark SQL boolean expr over *_l / *_r columns
    m_probability: float | None = None
    u_probability: float | None = None
    is_null_level: bool = False
    is_else_level: bool = False
    tf_adjustment_column: str | None = None
    tf_adjustment_weight: float = 1.0
    tf_minimum_u_value: float = 0.0
    sql_condition: str | None = None  # ANSI/DuckDB override for oracles

    @property
    def oracle_condition(self) -> str:
        return self.sql_condition or self.condition

    def bayes_factor(self) -> float:
        """m/u for this level; 1.0 (weight 0) for null levels.

        reference: splink/comparison_level.py::ComparisonLevel
        (_bayes_factor_expression)
        """
        if self.is_null_level:
            return 1.0
        if self.m_probability is None or self.u_probability is None:
            raise ValueError(f"level {self.label!r} has no m/u probabilities")
        if self.u_probability == 0:
            return float("inf")
        return self.m_probability / self.u_probability

    def to_dict(self) -> dict[str, Any]:
        return {
            "label": self.label,
            "condition": self.condition,
            "m_probability": self.m_probability,
            "u_probability": self.u_probability,
            "is_null_level": self.is_null_level,
            "is_else_level": self.is_else_level,
            "tf_adjustment_column": self.tf_adjustment_column,
            "tf_adjustment_weight": self.tf_adjustment_weight,
            "tf_minimum_u_value": self.tf_minimum_u_value,
            "sql_condition": self.sql_condition,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> ComparisonLevel:
        return cls(**d)


@dataclass
class Comparison:
    """A named comparison: ordered levels over one or more columns.

    ``output_column_name`` determines the gamma column name
    (``gamma_<name>``), matching the reference's naming
    (reference: splink/comparison.py::Comparison._gamma_column_name).
    Levels are ordered highest-agreement first, after the (optional)
    null level; gamma values are assigned descending so the else level
    is gamma 0, as in the reference.
    """

    output_column_name: str
    levels: list[ComparisonLevel]
    input_columns: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        non_null = [lv for lv in self.levels if not lv.is_null_level]
        if not non_null:
            raise ValueError(f"comparison {self.output_column_name!r}: no levels")
        if not non_null[-1].is_else_level:
            raise ValueError(
                f"comparison {self.output_column_name!r}: last level must be else"
            )

    @property
    def gamma_column(self) -> str:
        return f"gamma_{self.output_column_name}"

    @property
    def null_level(self) -> ComparisonLevel | None:
        for lv in self.levels:
            if lv.is_null_level:
                return lv
        return None

    @property
    def scored_levels(self) -> list[ComparisonLevel]:
        """Non-null levels in cascade order (highest gamma first)."""
        return [lv for lv in self.levels if not lv.is_null_level]

    def gamma_of(self, level: ComparisonLevel) -> int:
        """gamma value for a level: descending from n-1 to 0 (else)."""
        if level.is_null_level:
            return NULL_GAMMA
        scored = self.scored_levels
        return len(scored) - 1 - scored.index(level)

    def level_for_gamma(self, gamma: int) -> ComparisonLevel:
        if gamma == NULL_GAMMA:
            lv = self.null_level
            if lv is None:
                raise KeyError("no null level")
            return lv
        scored = self.scored_levels
        return scored[len(scored) - 1 - gamma]

    @property
    def num_scored_levels(self) -> int:
        return len(self.scored_levels)

    def gamma_expr(self) -> Column:
        """The CASE-WHEN cascade producing this comparison's gamma column.

        First-matching-level-wins; null level first
        (reference: splink/comparison_vector_values.py::
        compute_comparison_vector_values_sql).
        """
        expr: Column | None = None
        nl = self.null_level
        if nl is not None:
            expr = F.when(F.expr(nl.condition), F.lit(NULL_GAMMA))
        for lv in self.scored_levels:
            g = self.gamma_of(lv)
            if lv.is_else_level:
                tail = F.lit(g)
                expr = tail if expr is None else expr.otherwise(tail)
                return expr.cast("int")
            cond = F.expr(lv.condition)
            expr = F.when(cond, F.lit(g)) if expr is None else expr.when(cond, F.lit(g))
        raise AssertionError("unreachable: else level guaranteed by __post_init__")

    def gamma_sql(self) -> str:
        """ANSI CASE expression for the DuckDB oracle (same semantics)."""
        parts = ["CASE"]
        nl = self.null_level
        if nl is not None:
            parts.append(f"WHEN {nl.oracle_condition} THEN {NULL_GAMMA}")
        for lv in self.scored_levels:
            g = self.gamma_of(lv)
            if lv.is_else_level:
                parts.append(f"ELSE {g} END")
            else:
                parts.append(f"WHEN {lv.oracle_condition} THEN {g}")
        return " ".join(parts)

    def to_dict(self) -> dict[str, Any]:
        return {
            "output_column_name": self.output_column_name,
            "input_columns": self.input_columns,
            "levels": [lv.to_dict() for lv in self.levels],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Comparison:
        return cls(
            output_column_name=d["output_column_name"],
            input_columns=d.get("input_columns", []),
            levels=[ComparisonLevel.from_dict(x) for x in d["levels"]],
        )


@dataclass
class BlockingRule:
    """A blocking rule: a boolean join condition over ``l.`` / ``r.``
    aliases, e.g. ``"l.source = r.source AND l.lang = r.lang"``.

    reference: splink/blocking.py::BlockingRule. ``salting_partitions``
    mirrors the reference's salted blocking (splink/blocking.py
    salting_partitions), but our salt is deterministic (hash-based) —
    SURVEY.md §7.3(e).
    """

    rule: str
    salting_partitions: int = 1
    sql_rule: str | None = None  # DuckDB-dialect override for oracles
    # Skew governor: blocks whose key count exceeds this take a
    # broadcast join path instead of the shuffle hash join (0 = off).
    # Salting splits a hot block across shuffle keys; this removes the
    # hot block from the shuffle entirely — the north rule's "broadcast
    # threshold on oversized blocks" for popular-domain pathologies.
    broadcast_hot_keys_above: int = 0

    @property
    def oracle_rule(self) -> str:
        return self.sql_rule or self.rule

    def to_dict(self) -> dict[str, Any]:
        return {
            "rule": self.rule,
            "salting_partitions": self.salting_partitions,
            "sql_rule": self.sql_rule,
            "broadcast_hot_keys_above": self.broadcast_hot_keys_above,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> BlockingRule:
        if isinstance(d, str):
            return cls(rule=d)
        return cls(**d)


def block_on(
    *cols: str,
    salting_partitions: int = 1,
    broadcast_hot_keys_above: int = 0,
) -> BlockingRule:
    """The reference's primary blocking-rule constructor: each argument
    is a column name or a SQL expression evaluated on both sides, and
    the rule is the AND of their l/r equalities —
    ``block_on("first_name", "substr(surname, 1, 2)")`` →
    ``l.first_name = r.first_name AND
    substr(l.surname, 1, 2) = substr(r.surname, 1, 2)``.

    Bare column names get the ``l.``/``r.`` alias; expressions have
    every column reference aliased by the same rewrite the blocking
    compiler applies, so the produced rule's equi keys are always
    extractable (governable + salting-compatible).

    reference: splink/blocking_rule_library.py::block_on.
    """
    if not cols:
        raise ValueError("block_on needs at least one column/expression")
    import re

    _KEYWORDS = {
        "and", "or", "not", "case", "when", "then", "else", "end",
        "null", "is", "in", "between", "like", "cast", "as", "true",
        "false", "distinct", "interval",
    }

    def _alias(expr: str, side: str) -> str:
        expr = expr.strip()
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", expr):
            return f"{side}.{expr}"
        # alias bare identifiers inside the expression (not already
        # qualified, not function names, not quoted literals)
        out, i, n = [], 0, len(expr)
        while i < n:
            ch = expr[i]
            if ch == "'":  # skip string literal
                j = i + 1
                while j < n and expr[j] != "'":
                    j += 1
                out.append(expr[i : j + 1])
                i = j + 1
                continue
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", expr[i:])
            if m:
                tok = m.group(0)
                j = i + len(tok)
                rest = expr[j:].lstrip()
                prev = expr[:i].rstrip()
                if rest.startswith("("):  # function call
                    out.append(tok)
                elif prev.endswith("."):  # already qualified
                    out.append(tok)
                elif tok.lower() in _KEYWORDS:
                    out.append(tok)
                else:
                    out.append(f"{side}.{tok}")
                i = j
                continue
            out.append(ch)
            i += 1
        return "".join(out)

    conjuncts = [f"{_alias(c, 'l')} = {_alias(c, 'r')}" for c in cols]
    return BlockingRule(
        rule=" AND ".join(conjuncts),
        salting_partitions=salting_partitions,
        broadcast_hot_keys_above=broadcast_hot_keys_above,
    )


def prior_to_match_weight(prior: float) -> float:
    """log2 prior odds. reference: splink/predict.py (bf_prior term)."""
    if not 0.0 < prior < 1.0:
        raise ValueError(f"prior must be in (0,1), got {prior}")
    return math.log2(prior / (1.0 - prior))


@dataclass
class Settings:
    """The full model: link type, blocking rules, comparisons, prior.

    reference: splink/settings.py::Settings. JSON round-trip provides
    save_model/load_model parity
    (reference: splink/linker.py::Linker.save_model_to_json / load_model).
    """

    comparisons: list[Comparison]
    blocking_rules: list[BlockingRule] = field(default_factory=list)
    link_type: str = "dedupe_only"  # dedupe_only | link_only | link_and_dedupe
    unique_id_column_name: str = "unique_id"
    source_dataset_column_name: str = "source_dataset"
    probability_two_random_records_match: float = 1e-4
    retain_matching_columns: bool = True
    em_convergence: float = 1e-4
    max_iterations: int = 25
    # derived pair columns computed ONCE before the gamma cascade
    # (ordered name -> Spark SQL expr over pair columns; later exprs
    # may reference earlier names). Use for shared sub-expressions
    # that multiple comparison levels need — e.g. a token-Jaccard
    # value two threshold levels test — so the expensive array
    # traversal happens once per pair, not once per level. Names
    # starting with "__" are dropped after the gammas are computed.
    derived_pair_expressions: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # duplicate output names would silently produce colliding
        # gamma_<name> columns (last-write-wins in a DataFrame chain,
        # first-bind in SQL — different answers per engine); fail fast
        names = [c.output_column_name for c in self.comparisons]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(
                "duplicate comparison output_column_name(s): "
                f"{sorted(dupes)} — each comparison needs a distinct "
                "name (set output_column_name explicitly)"
            )

    @property
    def uid(self) -> str:
        return self.unique_id_column_name

    @property
    def gamma_columns(self) -> list[str]:
        return [c.gamma_column for c in self.comparisons]

    @property
    def prior_match_weight(self) -> float:
        return prior_to_match_weight(self.probability_two_random_records_match)

    def comparison(self, name: str) -> Comparison:
        for c in self.comparisons:
            if c.output_column_name == name:
                return c
        raise KeyError(name)

    def to_dict(self) -> dict[str, Any]:
        return {
            "link_type": self.link_type,
            "unique_id_column_name": self.unique_id_column_name,
            "source_dataset_column_name": self.source_dataset_column_name,
            "probability_two_random_records_match": (
                self.probability_two_random_records_match
            ),
            "retain_matching_columns": self.retain_matching_columns,
            "em_convergence": self.em_convergence,
            "max_iterations": self.max_iterations,
            "derived_pair_expressions": dict(self.derived_pair_expressions),
            "blocking_rules": [b.to_dict() for b in self.blocking_rules],
            "comparisons": [c.to_dict() for c in self.comparisons],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Settings:
        return cls(
            link_type=d.get("link_type", "dedupe_only"),
            unique_id_column_name=d.get("unique_id_column_name", "unique_id"),
            source_dataset_column_name=d.get(
                "source_dataset_column_name", "source_dataset"
            ),
            probability_two_random_records_match=d.get(
                "probability_two_random_records_match", 1e-4
            ),
            retain_matching_columns=d.get("retain_matching_columns", True),
            em_convergence=d.get("em_convergence", 1e-4),
            max_iterations=d.get("max_iterations", 25),
            derived_pair_expressions=dict(
                d.get("derived_pair_expressions", {})
            ),
            blocking_rules=[
                BlockingRule.from_dict(b) for b in d.get("blocking_rules", [])
            ],
            comparisons=[Comparison.from_dict(c) for c in d["comparisons"]],
        )

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_json(cls, s: str) -> Settings:
        return cls.from_dict(json.loads(s))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> Settings:
        with open(path) as f:
            return cls.from_json(f.read())
