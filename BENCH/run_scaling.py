"""Two-parallelism scaling protocol (BASELINE.md): run the SAME job at
local[8] and local[32] on identical input and report throughput +
scaling efficiency = (T_8 / T_32) / 4.

The measured job is the scoring engine under load: web corpus key
derivation + blocking + pairwise scoring of the blocked pairs AND of a
deterministic ~2M random-pair sample (u-estimation workload, O8) +
clustering. The corpus (default 80k entities ≈ 200k pages) is large
enough that task overheads don't dominate at 32 cores.

Writes BENCH/BASELINE.md. Run:  python BENCH/run_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from splink_spark.session import get_spark
from splink_spark.fixtures.webpages import distributed_corpus
from splink_spark.operators.webtext import prepare_pages, web_dedupe_settings
from splink_spark.operators.blocking import block_using_rules
from splink_spark.operators.vectors import compute_comparison_vectors
from splink_spark.operators.predict import predict_from_comparison_vectors
from splink_spark.operators.cluster import connected_components
from splink_spark.operators.accuracy import pairwise_f1_from_clusters
from pyspark.sql import functions as F

cores = int(os.environ["CORES"])
n_entities = int(os.environ["ENTITIES"])
spark = get_spark(app_name=f"scaling_{cores}", cores=cores)

timings = {}
# executor-side generation (per-entity rng: same corpus as the driver
# path at any partitioning) — the driver never holds a page. Timed
# since r4 so the median protocol tracks the one stage BENCH_r03
# showed regressing (generate_corpus 9.7 -> 13.5s; suspected host
# noise, now measured with medians).
t0 = time.time()
pages, labels = distributed_corpus(
    spark, n_entities=n_entities, seed=42, partitions=cores * 2
)
pages = pages.persist(); pages.count()
labels = labels.persist(); labels.count()
timings["generate"] = time.time() - t0
settings = web_dedupe_settings()

t0 = time.time()
prepared = prepare_pages(pages).persist(); prepared.count()
timings["derive_keys"] = time.time() - t0

# Fused block->score->project in ONE whole-stage-codegen pass. Never
# materialize the raw pair table: caching array-typed pair rows costs
# more to (de)serialize than recomputing the join inside the pipeline
# (measured 140x per-pair difference). Persist only the narrow scored
# projection (ids + gammas + weight).
t0 = time.time()
pairs = block_using_rules(
    prepared, settings.blocking_rules, uid="unique_id",
    retain_columns=["text_tokens", "bk_title", "bk_domain"],
)
scored = predict_from_comparison_vectors(
    compute_comparison_vectors(pairs, settings), settings
).select(
    "unique_id_l", "unique_id_r", "match_key",
    *settings.gamma_columns, "match_weight", "match_probability",
).persist()
n_pairs = scored.count()
timings["block_and_score"] = time.time() - t0
preds = scored.filter(F.col("match_probability") >= 0.5)

# u-estimation style load: deterministic sampled random pairs, scored
# through the same comparison cascade (dominant scoring volume)
t0 = time.time()
n = prepared.count()
import math
target_pairs = int(os.environ.get("SAMPLE_PAIRS", "10000000"))
frac = min(1.0, math.sqrt(2.0 * target_pairs) / n)
buckets = 1_000_000
keep = int(frac * buckets)
# EAGER checkpoint of the tiny sampled side (~4.5k rows): the cross
# join must read a few MB of materialized rows, NOT drag the full
# 200k-page prepare_pages lineage into every cartesian task (measured
# 35x slower at 199k pages without this — scan amplification of the
# big persisted relation inside the nested-loop join)
samp = prepared.filter(
    F.pmod(F.xxhash64(F.col("unique_id"), F.lit(7)), F.lit(buckets)) < keep
).select(
    "unique_id", "text_tokens", "bk_title", "bk_domain"
).localCheckpoint()
rand_pairs = (
    samp.alias("l").join(samp.alias("r"), F.expr("l.unique_id < r.unique_id"))
    .select(
        F.col("l.unique_id").alias("unique_id_l"),
        F.col("r.unique_id").alias("unique_id_r"),
        F.col("l.text_tokens").alias("text_tokens_l"),
        F.col("r.text_tokens").alias("text_tokens_r"),
        F.col("l.bk_title").alias("bk_title_l"),
        F.col("r.bk_title").alias("bk_title_r"),
        F.col("l.bk_domain").alias("bk_domain_l"),
        F.col("r.bk_domain").alias("bk_domain_r"),
    )
)
scored_sample = predict_from_comparison_vectors(
    compute_comparison_vectors(rand_pairs, settings), settings
)
# aggregate over match_weight, NOT count(): a bare count lets Catalyst
# prune the whole scoring projection and measure only the join
agg = scored_sample.agg(
    F.count(F.lit(1)).alias("n"), F.sum("match_weight").alias("s")
).collect()[0]
n_sampled = int(agg["n"])
timings["score_sampled"] = time.time() - t0

n_edges = preds.count()

t0 = time.time()
comps = connected_components(preds.select("unique_id_l", "unique_id_r"))
# narrow (id, cluster_id) assignment only: caching the html payload
# through this join serializes ~1KB/row nothing downstream reads
clusters = pages.select("unique_id").join(comps, "unique_id", "left").withColumn(
    "cluster_id", F.coalesce("cluster_id", F.col("unique_id"))
).persist()
clusters.count()
timings["cluster"] = time.time() - t0

f1 = pairwise_f1_from_clusters(clusters, labels)

scoring_sec = timings["block_and_score"] + timings["score_sampled"]
total_scored = n_pairs + n_sampled
print("RESULT " + json.dumps({
    "cores": cores,
    "n_pages": pages.count(),
    "pairs_blocked": n_pairs,
    "pairs_sampled": n_sampled,
    "total_scored": total_scored,
    "scoring_sec": round(scoring_sec, 2),
    "scored_pairs_per_sec": round(total_scored / scoring_sec, 1),
    "edges_retained": n_edges,
    "pipeline_sec": round(
        sum(v for k, v in timings.items() if k != "generate"), 2
    ),
    "timings": {k: round(v, 2) for k, v in timings.items()},
    "f1": round(f1["f1"], 5),
}))
"""


def run(cores: int, entities: int) -> dict:
    # 12g, NOT an oversized heap: measured on this box, a 48g driver
    # heap made every JVM-side stage 20-27x slower (GC/page-fault
    # pathology over a huge young gen on a shared VM) — block+score
    # 3.5s@8g vs 94s@48g, sampled scoring 29s@8g vs 554s@48g on the
    # identical 199k-page job. The cached working set is ~1-2 GB.
    env = dict(
        os.environ,
        REPO=REPO,
        CORES=str(cores),
        ENTITIES=str(entities),
        SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "12g"),
    )
    t0 = time.time()
    # CPU-affinity pinning: local[N] bounds TASK slots, not process
    # threads — an unpinned local[2] JVM borrows idle host cores for
    # GC/shuffle/python workers, inflating the small leg's throughput
    # and understating scaling efficiency. taskset bounds the whole
    # process tree to N cores, the honest N-executor proxy.
    cmd = [sys.executable, "-c", WORKER]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True,
        text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["wall_sec"] = round(time.time() - t0, 1)
            return r
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no RESULT line from cores={cores}")


def stats_of(n: int, cores: int, entities: int) -> dict:
    """This sandbox is a shared host (cumulative CPU steal ≈ 50% of
    user time in /proc/stat): single runs vary 3-6x with co-tenant
    load. The HEADLINE is the median of n repeats (r4 protocol — the
    r3 best-of-3 duels produced 0.845 vs 0.775 on identical code);
    best-of is reported alongside as the uncontended-capability
    estimate, plus the min-max spread so the reader sees the noise
    floor."""
    import statistics

    runs = [run(cores, entities) for _ in range(n)]
    for r in runs:
        print(json.dumps(r))
    best = min(runs, key=lambda r: r["scoring_sec"])
    tps = sorted(r["scored_pairs_per_sec"] for r in runs)
    out = dict(best)  # shape/counts from the best run
    out["runs"] = len(runs)
    out["best_scoring_sec"] = best["scoring_sec"]
    out["best_tp"] = best["scored_pairs_per_sec"]
    out["median_tp"] = round(statistics.median(tps), 1)
    out["tp_spread"] = (tps[0], tps[-1])
    out["median_scoring_sec"] = round(
        statistics.median(r["scoring_sec"] for r in runs), 2
    )
    out["median_pipeline_sec"] = round(
        statistics.median(r["pipeline_sec"] for r in runs), 2
    )
    out["median_timings"] = {
        k: round(statistics.median(r["timings"][k] for r in runs), 2)
        for k in best["timings"]
    }
    return out


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2:
        x += 1
    return x


def measure_host_parallel_capacity() -> dict:
    """How much extra CPU the host actually provides from N to 4N
    processes (pure-python burn, no Spark): the ceiling for any Spark
    scaling number on this box (32 'CPUs' are SMT threads on a shared
    host — measured ~2.6x total from 8 to 32 procs)."""
    import multiprocessing as mp

    burn = _burn
    out = {}
    for procs in (CORES_A, CORES_B):
        with mp.Pool(procs) as p:
            out[procs] = sum(p.map(burn, range(procs)))
    return {
        "total_a": out[CORES_A],
        "total_b": out[CORES_B],
        "host_capacity_ratio": round(out[CORES_B] / out[CORES_A], 3),
    }


CORES_A = int(os.environ.get("CORES_A", "8"))
CORES_B = int(os.environ.get("CORES_B", "32"))


RESULTS_BEGIN = "<!-- RESULTS:BEGIN (auto-managed by run_scaling.py) -->"
RESULTS_END = "<!-- RESULTS:END -->"
HISTORY_END = "<!-- HISTORY:END -->"


def _splice(doc: str, begin: str, end: str, payload: str) -> str:
    """Replace the region between two markers, keeping everything
    outside — the hand-maintained analysis appendices survive every
    rerun (r3 lost three appendices to a whole-file rewrite)."""
    i, j = doc.index(begin), doc.index(end)
    return doc[: i + len(begin)] + "\n" + payload + "\n" + doc[j:]


def main() -> None:
    entities = int(os.environ.get("SCALE_ENTITIES", "80000"))
    repeats = int(os.environ.get("SCALE_REPEATS", "5"))
    host = measure_host_parallel_capacity()
    print(json.dumps({"host_capacity": host}))
    ra = stats_of(repeats, CORES_A, entities)
    rb = stats_of(repeats, CORES_B, entities)

    ratio = CORES_B / CORES_A
    # HEADLINE: median-based efficiency (r4 protocol)
    eff_median = (rb["median_tp"] / ra["median_tp"]) / ratio
    eff_best = (rb["best_tp"] / ra["best_tp"]) / ratio
    eff_pipeline = (
        ra["median_pipeline_sec"] / rb["median_pipeline_sec"]
    ) / ratio
    eff_vs_host = (
        rb["median_tp"] / ra["median_tp"]
    ) / host["host_capacity_ratio"]
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())

    results = f"""
Protocol: identical job, identical input (deterministic corpus, seed
42, {entities} entities ≈ {ra['n_pages']} pages), identical JVM heap,
`taskset`-pinned process trees; only parallelism differs
(local[{CORES_A}] vs local[{CORES_B}] — the N vs 4N executor proxy).
**{repeats} repeats per configuration; the headline is the MEDIAN**
(best-of and min-max spread shown so the shared-host noise floor is
visible; cumulative CPU steal ≈ 50% of user time per /proc/stat).

Host parallel-capacity ceiling (pure-python burn, no Spark):
{CORES_A} → {CORES_B} processes deliver
{host['host_capacity_ratio']}x total CPU (nominal {ratio:.0f}x).
Engine scaling must be read against that ceiling.

Job: key derivation (vectorized MinHash UDF) → blocking (5 rules,
one equi self-join each, NOT-prev-rule pair dedup) → pairwise scoring
of blocked pairs AND a deterministic ~10M random-pair sample
(u-estimation load) → large-star/small-star clustering. F1 gate on
planted labels. Run: {stamp}.

| metric | local[{CORES_A}] median | local[{CORES_B}] median | local[{CORES_A}] best | local[{CORES_B}] best |
|---|---|---|---|---|
| scored pairs (blocked + sampled) | {ra['total_scored']} | {rb['total_scored']} | — | — |
| scoring wall (s) | {ra['median_scoring_sec']} | {rb['median_scoring_sec']} | {ra['best_scoring_sec']} | {rb['best_scoring_sec']} |
| **scored-pairs/sec** | **{ra['median_tp']}** | **{rb['median_tp']}** | {ra['best_tp']} | {rb['best_tp']} |
| scored-pairs/sec spread (min-max of {repeats}) | {ra['tp_spread'][0]}-{ra['tp_spread'][1]} | {rb['tp_spread'][0]}-{rb['tp_spread'][1]} | — | — |
| full pipeline (s) | {ra['median_pipeline_sec']} | {rb['median_pipeline_sec']} | {ra['pipeline_sec']} | {rb['pipeline_sec']} |
| generate corpus (s) | {ra['median_timings']['generate']} | {rb['median_timings']['generate']} | {ra['timings']['generate']} | {rb['timings']['generate']} |
| derive_keys (s) | {ra['median_timings']['derive_keys']} | {rb['median_timings']['derive_keys']} | {ra['timings']['derive_keys']} | {rb['timings']['derive_keys']} |
| block+score fused (s) | {ra['median_timings']['block_and_score']} | {rb['median_timings']['block_and_score']} | {ra['timings']['block_and_score']} | {rb['timings']['block_and_score']} |
| score sampled (s) | {ra['median_timings']['score_sampled']} | {rb['median_timings']['score_sampled']} | {ra['timings']['score_sampled']} | {rb['timings']['score_sampled']} |
| cluster (s) | {ra['median_timings']['cluster']} | {rb['median_timings']['cluster']} | {ra['timings']['cluster']} | {rb['timings']['cluster']} |
| pairwise F1 vs labels | {ra['f1']} | {rb['f1']} | — | — |

**Scaling efficiency (median scored-pairs/sec, {CORES_A}→{CORES_B}
cores) = (tp_{CORES_B}/tp_{CORES_A})/{ratio:.0f} = {eff_median:.3f}**
(best-of-{repeats} efficiency {eff_best:.3f}; median full-pipeline
efficiency {eff_pipeline:.3f}; target ≥ 0.8 on the scoring path per
BASELINE.json north rule). Normalised to the host's measured
parallel-capacity ceiling ({host['host_capacity_ratio']}x), engine
efficiency = {eff_vs_host:.3f}.

Stage metrics per north rule: pairs generated = {ra['pairs_blocked']},
pairs scored = {ra['total_scored']}, edges retained =
{ra['edges_retained']} (threshold 0.5); per-partition lineage is
emitted by the stage manager (splink_spark/plans/stages.py) when the
pipeline runs checkpointed.
"""
    history_row = (
        f"| {stamp} | local[{CORES_A}]→local[{CORES_B}], "
        f"median-of-{repeats}, pinned | {ra['median_tp']} | "
        f"{rb['median_tp']} | **{eff_median:.3f}** | {eff_best:.3f} |"
    )

    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path) as f:
        doc = f.read()
    doc = _splice(doc, RESULTS_BEGIN, RESULTS_END, results)
    doc = doc.replace(HISTORY_END, history_row + "\n" + HISTORY_END)
    with open(out_path, "w") as f:
        f.write(doc)
    print(
        f"wrote {out_path}; median efficiency={eff_median:.3f} "
        f"(best {eff_best:.3f})"
    )


if __name__ == "__main__":
    main()
