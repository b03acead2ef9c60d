"""Chart JSON specs + cluster-studio HTML — the rendering layer over
the engine's chart-DATA extraction operators.

The reference ships Vega-Lite JSON templates and fills them with query
output (reference: splink/charts.py::load_chart_definition /
altair_or_json; splink/cluster_studio.py::render_splink_cluster_studio_html).
Here each chart function *builds* a Vega-Lite v5 spec dict directly —
no altair, no bundled template files, no third-party imports — from
the same aggregated data the extraction operators already produce
(match_weight_breakdown, comparison_viewer_data, truth_space_table,
missingness, unlinkables_data, cumulative_comparisons_from_blocking_rules,
EM param_history). Specs are plain JSON-serializable dicts; `to_html`
wraps any spec in a standalone page.

Scale note: every chart renders an AGGREGATE (per-level params, per-
threshold confusion counts, per-pattern counts...). The heavy lifting
stays distributed in the operators; only the final small result is
collected here, capped by ``_MAX_CHART_ROWS`` as a guard against
accidentally pointing a chart at an unaggregated pair table.
"""

from __future__ import annotations

import json
import math
from typing import Any

from .model import Settings

_VL_SCHEMA = "https://vega.github.io/schema/vega-lite/v5.json"
_MAX_CHART_ROWS = 20_000


def _rows(data: Any, cap: int = _MAX_CHART_ROWS) -> list[dict]:
    """Accept a (small, aggregated) DataFrame or an iterable of dicts."""
    if hasattr(data, "limit") and hasattr(data, "collect"):
        collected = data.limit(cap + 1).collect()
        if len(collected) > cap:
            raise ValueError(
                f"chart input exceeds {cap} rows — charts render "
                "aggregates; aggregate before charting"
            )
        return [r.asDict(recursive=True) for r in collected]
    rows = [dict(r) for r in data]
    if len(rows) > cap:
        raise ValueError(f"chart input exceeds {cap} rows")
    return rows


def _spec(
    values: list[dict],
    mark: Any,
    encoding: dict,
    title: str,
    **extra: Any,
) -> dict:
    out = {
        "$schema": _VL_SCHEMA,
        "title": title,
        "data": {"values": values},
        "mark": mark,
        "encoding": encoding,
        **extra,
    }
    json.dumps(out)  # fail fast on non-serializable cells
    return out


def _finite(x: float) -> float | None:
    return None if x is None or not math.isfinite(x) else float(x)


# ---------------------------------------------------------------------------
# parameter charts (from Settings — no query needed)
# ---------------------------------------------------------------------------

def match_weights_chart(settings: Settings) -> dict:
    """Per-level log2 Bayes factor bars, one row facet per comparison.
    reference: splink/charts.py::match_weights_chart."""
    values = []
    for comp in settings.comparisons:
        for lvl in comp.scored_levels:
            try:
                bf = lvl.bayes_factor()
                log2_bf = _finite(math.log2(bf)) if bf > 0 else None
            except ValueError:  # params not estimated yet
                log2_bf = None
            values.append(
                {
                    "comparison": comp.output_column_name,
                    "label": lvl.label,
                    "gamma": comp.gamma_of(lvl),
                    "m_probability": _finite(lvl.m_probability),
                    "u_probability": _finite(lvl.u_probability),
                    "log2_bayes_factor": log2_bf,
                }
            )
    return {
        "$schema": _VL_SCHEMA,
        "title": "Model parameters (match weights)",
        "data": {"values": values},
        "facet": {"row": {"field": "comparison", "type": "nominal"}},
        "spec": {
            "mark": "bar",
            "encoding": {
                "x": {
                    "field": "log2_bayes_factor",
                    "type": "quantitative",
                    "title": "log2(Bayes factor) = match weight",
                },
                "y": {"field": "label", "type": "nominal", "sort": None},
                "color": {
                    "field": "log2_bayes_factor",
                    "type": "quantitative",
                    "scale": {"scheme": "redyellowgreen"},
                },
                "tooltip": [
                    {"field": "label"},
                    {"field": "m_probability"},
                    {"field": "u_probability"},
                    {"field": "log2_bayes_factor"},
                ],
            },
        },
    }


def m_u_parameters_chart(settings: Settings) -> dict:
    """Side-by-side m and u bars per level.
    reference: splink/charts.py::m_u_parameters_chart."""
    values = []
    for comp in settings.comparisons:
        for lvl in comp.scored_levels:
            for kind, p in (
                ("m", lvl.m_probability),
                ("u", lvl.u_probability),
            ):
                values.append(
                    {
                        "comparison": comp.output_column_name,
                        "label": lvl.label,
                        "parameter": kind,
                        "probability": _finite(p),
                    }
                )
    return {
        "$schema": _VL_SCHEMA,
        "title": "m and u probabilities",
        "data": {"values": values},
        "facet": {"row": {"field": "comparison", "type": "nominal"}},
        "spec": {
            "mark": "bar",
            "encoding": {
                "x": {
                    "field": "probability",
                    "type": "quantitative",
                    "scale": {"domain": [0, 1]},
                },
                "y": {"field": "label", "type": "nominal", "sort": None},
                "color": {"field": "parameter", "type": "nominal"},
                "yOffset": {"field": "parameter"},
                "tooltip": [
                    {"field": "label"},
                    {"field": "parameter"},
                    {"field": "probability"},
                ],
            },
        },
    }


def parameter_estimate_comparisons_chart(
    param_history: list[dict],
    settings: Settings | None = None,
) -> dict:
    """EM convergence: per-iteration m/u trajectories per (comparison,
    gamma). Input = EMResult.param_history (one snapshot per iteration:
    {iteration, lam, m: [per-comparison gamma list], u: [...]}).
    reference: splink/charts.py::parameter_estimate_comparisons_chart.
    """
    def comp_name(i: int) -> str:
        if settings is not None and i < len(settings.comparisons):
            return settings.comparisons[i].output_column_name
        return f"comparison_{i}"

    values = []
    for snap in param_history:
        it = snap.get("iteration")
        lam = snap.get("lam", snap.get("lambda"))
        if lam is not None:
            values.append(
                {
                    "iteration": it,
                    "series": "lambda",
                    "probability": _finite(float(lam)),
                }
            )
        for key in ("m", "u"):
            for ci, probs in enumerate(snap.get(key) or []):
                for gamma, p in enumerate(probs):
                    values.append(
                        {
                            "iteration": it,
                            "series": f"{key}:{comp_name(ci)}:g{gamma}",
                            "probability": _finite(float(p)),
                        }
                    )
    return _spec(
        values,
        {"type": "line", "point": True},
        {
            "x": {"field": "iteration", "type": "quantitative"},
            "y": {
                "field": "probability",
                "type": "quantitative",
                "scale": {"type": "log"},
            },
            "color": {"field": "series", "type": "nominal"},
            "tooltip": [
                {"field": "series"},
                {"field": "iteration"},
                {"field": "probability"},
            ],
        },
        "EM parameter convergence",
    )


# ---------------------------------------------------------------------------
# per-pair / distribution charts (from extraction-operator output)
# ---------------------------------------------------------------------------

def waterfall_chart(breakdown: Any) -> dict:
    """Waterfall of one pair's per-comparison log2-BF contributions.
    Input = match_weight_breakdown rows filtered to ONE pair (prior row
    + one row per comparison, bar_sort_order ascending).
    reference: splink/charts.py::waterfall_chart."""
    rows = sorted(_rows(data=breakdown), key=lambda r: r["bar_sort_order"])
    run = 0.0
    values = []
    for r in rows:
        contrib = _finite(r["log2_bayes_factor"]) or 0.0
        values.append(
            {
                "comparison": r["comparison"],
                "gamma_value": r.get("gamma_value"),
                "bar_sort_order": r["bar_sort_order"],
                "log2_bayes_factor": contrib,
                "start": run,
                "end": run + contrib,
            }
        )
        run += contrib
    values.append(
        {
            "comparison": "final match weight",
            "gamma_value": None,
            "bar_sort_order": len(values),
            "log2_bayes_factor": run,
            "start": 0.0,
            "end": run,
        }
    )
    return _spec(
        values,
        "bar",
        {
            "x": {
                "field": "comparison",
                "type": "nominal",
                "sort": {"field": "bar_sort_order"},
            },
            "y": {"field": "start", "type": "quantitative",
                  "title": "log2(Bayes factor)"},
            "y2": {"field": "end"},
            "color": {
                "field": "log2_bayes_factor",
                "type": "quantitative",
                "scale": {"scheme": "redyellowgreen"},
            },
            "tooltip": [
                {"field": "comparison"},
                {"field": "gamma_value"},
                {"field": "log2_bayes_factor"},
            ],
        },
        "Match weight waterfall",
    )


def comparison_viewer_chart(viewer: Any, settings: Settings) -> dict:
    """Pattern-distribution bars: one bar per distinct gamma pattern,
    height = pair count, tooltip = the pattern + example pair ids.
    Input = comparison_viewer_data output.
    reference: splink/comparison_viewer.py."""
    gammas = settings.gamma_columns
    values = []
    for r in _rows(viewer):
        pattern = ",".join(str(r[g]) for g in gammas)
        values.append(
            {
                "pattern": pattern,
                "pattern_count": r["pattern_count"],
                **{g: r[g] for g in gammas},
                "example_l": r.get("example_l_1"),
                "example_r": r.get("example_r_1"),
            }
        )
    values.sort(key=lambda v: -v["pattern_count"])
    return _spec(
        values,
        "bar",
        {
            "x": {
                "field": "pattern",
                "type": "nominal",
                "sort": {"field": "pattern_count", "order": "descending"},
            },
            "y": {
                "field": "pattern_count",
                "type": "quantitative",
                "scale": {"type": "log"},
            },
            "tooltip": [
                {"field": "pattern"},
                {"field": "pattern_count"},
                {"field": "example_l"},
                {"field": "example_r"},
            ],
        },
        "Comparison vector pattern distribution",
    )


def _truth_rows(truth: Any) -> list[dict]:
    """Normalize truth_space_table output (either surface) to chart
    rows with threshold / precision / recall / f1 / tp_rate / fp_rate."""
    out = []
    for r in _rows(truth):
        r = dict(r)
        if "precision_e9" in r:  # as_scaled_ints surface
            for k in ("precision", "recall", "f1"):
                v = r.get(f"{k}_e9")
                r[k] = None if v is None else v / 1e9
            thr = r.get("threshold_weight_e9")
            r["threshold"] = None if thr is None else thr / 1e9
        else:
            r["threshold"] = _finite(r.get("threshold_weight"))
        tp, fp = r.get("tp", 0), r.get("fp", 0)
        fn, tn = r.get("fn", 0), r.get("tn", 0)
        r["tp_rate"] = tp / (tp + fn) if (tp + fn) else None
        r["fp_rate"] = fp / (fp + tn) if (fp + tn) else None
        out.append(r)
    return out


def roc_chart(truth: Any) -> dict:
    """ROC curve (FP rate vs TP rate) from truth_space_table output.
    reference: splink/charts.py::roc_chart."""
    return _spec(
        _truth_rows(truth),
        {"type": "line", "point": True},
        {
            "x": {
                "field": "fp_rate",
                "type": "quantitative",
                "title": "false positive rate",
            },
            "y": {
                "field": "tp_rate",
                "type": "quantitative",
                "title": "true positive rate (recall)",
            },
            "tooltip": [
                {"field": "threshold"},
                {"field": "precision"},
                {"field": "recall"},
                {"field": "f1"},
            ],
        },
        "ROC curve",
    )


def precision_recall_chart(truth: Any) -> dict:
    """Precision vs recall from truth_space_table output.
    reference: splink/charts.py::precision_recall_chart."""
    return _spec(
        _truth_rows(truth),
        {"type": "line", "point": True},
        {
            "x": {"field": "recall", "type": "quantitative"},
            "y": {"field": "precision", "type": "quantitative"},
            "tooltip": [
                {"field": "threshold"},
                {"field": "precision"},
                {"field": "recall"},
                {"field": "f1"},
            ],
        },
        "Precision-recall curve",
    )


def accuracy_chart(truth: Any) -> dict:
    """Accuracy metrics vs match-weight threshold (long format).
    reference: splink/charts.py::accuracy_chart."""
    long_rows = []
    for r in _truth_rows(truth):
        for metric in ("precision", "recall", "f1"):
            if r.get(metric) is not None:
                long_rows.append(
                    {
                        "threshold": r.get("threshold"),
                        "metric": metric,
                        "value": r[metric],
                    }
                )
    return _spec(
        long_rows,
        "line",
        {
            "x": {
                "field": "threshold",
                "type": "quantitative",
                "title": "match weight threshold",
            },
            "y": {"field": "value", "type": "quantitative"},
            "color": {"field": "metric", "type": "nominal"},
        },
        "Accuracy vs threshold",
    )


def unlinkables_chart(unlinkables: Any) -> dict:
    """Cumulative share of records unlinkable below each self-match
    weight. Input = unlinkables_data output.
    reference: splink/charts.py::unlinkables_chart."""
    values = [
        r
        for r in _rows(unlinkables)
        if _finite(r.get("match_weight_rounded")) is not None
    ]
    return _spec(
        values,
        {"type": "line", "interpolate": "step-after"},
        {
            "x": {
                "field": "match_weight_rounded",
                "type": "quantitative",
                "title": "best-match weight threshold",
            },
            "y": {
                "field": "cum_proportion",
                "type": "quantitative",
                "title": "proportion of records unlinkable",
            },
            "tooltip": [
                {"field": "match_weight_rounded"},
                {"field": "cum_proportion"},
            ],
        },
        "Unlinkable records",
    )


def missingness_chart(miss: Any) -> dict:
    """Null share per column. Input = missingness output.
    reference: splink/charts.py::missingness_chart."""
    return _spec(
        _rows(miss),
        "bar",
        {
            "x": {"field": "null_share", "type": "quantitative",
                  "scale": {"domain": [0, 1]}},
            "y": {"field": "column_name", "type": "nominal",
                  "sort": {"field": "null_share", "order": "descending"}},
            "tooltip": [
                {"field": "column_name"},
                {"field": "null_share"},
            ],
        },
        "Column missingness",
    )


def profile_columns_chart(profiles: dict[str, Any]) -> dict:
    """Top-value frequency bars per column (faceted). Input = dict of
    column name -> profile_column_values output for that column.
    reference: splink/profile_data.py::profile_columns."""
    values = []
    for col, prof in profiles.items():
        for r in _rows(prof):
            values.append({"column": col, **r})
    return {
        "$schema": _VL_SCHEMA,
        "title": "Column value distribution",
        "data": {"values": values},
        "facet": {
            "field": "column", "type": "nominal", "columns": 3,
        },
        "spec": {
            "mark": "bar",
            "encoding": {
                "x": {"field": "value", "type": "nominal",
                      "sort": {"field": "value_rank"}},
                "y": {"field": "value_count", "type": "quantitative"},
                "tooltip": [
                    {"field": "value"},
                    {"field": "value_count"},
                    {"field": "share"},
                ],
            },
        },
    }


def cumulative_comparisons_chart(cumulative: Any) -> dict:
    """Pairs contributed per blocking rule (cumulative rollup bars).
    Input = cumulative_comparisons_from_blocking_rules output.
    reference: splink/charts.py::cumulative_blocking_rule_comparisons_generated.
    """
    return _spec(
        _rows(cumulative),
        "bar",
        {
            "x": {"field": "row_count", "type": "quantitative",
                  "title": "pairs generated"},
            "y": {"field": "rule", "type": "nominal", "sort": None},
            "tooltip": [
                {"field": "rule"},
                {"field": "row_count"},
                {"field": "cumulative_rows"},
            ],
        },
        "Comparisons per blocking rule",
    )


# ---------------------------------------------------------------------------
# output helpers
# ---------------------------------------------------------------------------

_HTML_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>
</head><body><div id="vis"></div>
<script>vegaEmbed("#vis", {spec});</script>
</body></html>
"""


def to_html(spec: dict, title: str = "splink_spark chart") -> str:
    """Standalone HTML page for a spec (vega-embed via public CDN —
    renders wherever the page has network; the JSON spec inside is
    inspectable regardless)."""
    return _HTML_PAGE.format(title=title, spec=json.dumps(spec))


def save_chart(spec: dict, path: str) -> None:
    with open(path, "w") as f:
        f.write(
            to_html(spec)
            if path.endswith(".html")
            else json.dumps(spec, indent=2)
        )


# ---------------------------------------------------------------------------
# cluster studio — self-contained HTML, no external dependencies
# ---------------------------------------------------------------------------

_STUDIO_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Cluster studio</title>
<style>
body{font-family:sans-serif;margin:1em}
#graph{border:1px solid #ccc}
table{border-collapse:collapse;font-size:12px;margin-top:.5em}
td,th{border:1px solid #ddd;padding:2px 6px}
</style></head><body>
<h2>Cluster studio</h2>
<label>cluster <select id="sel"></select></label>
<span id="stats"></span>
<br><canvas id="graph" width="640" height="420"></canvas>
<table id="edges"><thead><tr><th>left</th><th>right</th>
<th>match weight</th></tr></thead><tbody></tbody></table>
<script>
const DATA = __DATA__;
const sel = document.getElementById("sel");
const ids = Object.keys(DATA.clusters);
ids.forEach(c => { const o = document.createElement("option");
  o.value = c; o.textContent = c; sel.appendChild(o); });
function draw(cid){
  const cl = DATA.clusters[cid];
  const canvas = document.getElementById("graph");
  const ctx = canvas.getContext("2d");
  ctx.clearRect(0,0,canvas.width,canvas.height);
  const n = cl.nodes.length;
  const cx = canvas.width/2, cy = canvas.height/2,
        R = Math.min(cx,cy)-40;
  const pos = {};
  cl.nodes.forEach((id,i) => {
    const a = 2*Math.PI*i/n;
    pos[id] = [cx+R*Math.cos(a), cy+R*Math.sin(a)];
  });
  ctx.strokeStyle = "#888";
  cl.edges.forEach(e => {
    ctx.lineWidth = Math.max(0.5, Math.min(4, 0.5+e.w/8));
    ctx.beginPath();
    ctx.moveTo(...pos[e.l]); ctx.lineTo(...pos[e.r]); ctx.stroke();
  });
  ctx.fillStyle = "#1f77b4";
  cl.nodes.forEach(id => {
    const [x,y] = pos[id];
    ctx.beginPath(); ctx.arc(x,y,6,0,2*Math.PI); ctx.fill();
    ctx.fillText(String(id), x+8, y+4);
    ctx.fillStyle = "#1f77b4";
  });
  const tb = document.querySelector("#edges tbody");
  tb.innerHTML = "";
  cl.edges.forEach(e => {
    const tr = document.createElement("tr");
    tr.innerHTML = `<td>${e.l}</td><td>${e.r}</td>` +
                   `<td>${e.w.toFixed(3)}</td>`;
    tb.appendChild(tr);
  });
  const m = cl.metrics || {};
  document.getElementById("stats").textContent =
    ` nodes ${cl.nodes.length}, edges ${cl.edges.length}` +
    (m.density != null ? `, density ${m.density.toFixed(3)}` : "");
}
sel.addEventListener("change", () => draw(sel.value));
if (ids.length) draw(ids[0]);
</script></body></html>
"""


def cluster_studio_html(
    clusters: Any,
    edges: Any,
    metrics: Any = None,
    uid: str = "unique_id",
    weight_col: str = "match_weight",
    max_clusters: int = 50,
) -> str:
    """Self-contained interactive cluster-viewer page (vanilla JS, no
    network): dropdown per cluster, canvas edge diagram with weight-
    scaled strokes, per-cluster edge table + metrics.

    Inputs: ``clusters`` = (unique_id, cluster_id) assignment,
    ``edges`` = scored pairs, ``metrics`` = cluster_metrics output
    (optional). Only the ``max_clusters`` largest multi-node clusters
    are embedded — the page is a sample inspector, not a 100-TB dump.
    reference: splink/cluster_studio.py::render_splink_cluster_studio_html.
    """
    assign = _rows(clusters, cap=1_000_000)
    by_cluster: dict[Any, list] = {}
    for r in assign:
        by_cluster.setdefault(r["cluster_id"], []).append(r[uid])
    # largest multi-node clusters first
    keep = sorted(
        (c for c in by_cluster if len(by_cluster[c]) > 1),
        key=lambda c: (-len(by_cluster[c]), str(c)),
    )[:max_clusters]
    keep_set = set(keep)
    node_to_cluster = {
        n: c for c in keep_set for n in by_cluster[c]
    }

    edge_rows = _rows(edges, cap=1_000_000)
    cluster_edges: dict[Any, list] = {c: [] for c in keep}
    for e in edge_rows:
        c = node_to_cluster.get(e[f"{uid}_l"])
        if c is not None and node_to_cluster.get(e[f"{uid}_r"]) == c:
            cluster_edges[c].append(
                {
                    "l": e[f"{uid}_l"],
                    "r": e[f"{uid}_r"],
                    "w": _finite(e.get(weight_col, 0.0)) or 0.0,
                }
            )

    metric_rows = {
        m["cluster_id"]: m for m in _rows(metrics or [], cap=1_000_000)
    }
    payload = {
        "clusters": {
            str(c): {
                "nodes": by_cluster[c],
                "edges": cluster_edges[c],
                "metrics": {
                    k: _finite(v) if isinstance(v, float) else v
                    for k, v in metric_rows.get(c, {}).items()
                    if k != "cluster_id"
                },
            }
            for c in keep
        }
    }
    return _STUDIO_PAGE.replace("__DATA__", json.dumps(payload))
