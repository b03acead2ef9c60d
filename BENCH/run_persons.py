"""Apples-to-apples run against the public claim "~1M person records
end-to-end in ≈1 minute on a DuckDB laptop" (≈16.7k records/s —
BASELINE.md public-claim row; reference: splink README headline).

Same workload SHAPE as the reference demo: ~1M person records (names
/ dob / city / email / postcode with typo + swap + null corruption),
equality-dominated comparisons plus one bounded levenshtein,
lambda from deterministic rules → u from random sampling (max_pairs
1e6, the reference default) → two EM sessions (m trained, u fixed)
→ predict over nine selective blocking rules (incl. swap-invariant
canonical-dob and name-set keys) → threshold + connected components. F1 ≥ 0.99 on labeled pairs (all intra-entity pairs
positive, blocked cross-entity pairs negative) is the quality gate. The fixture is generated executor-side
(distributed_persons) and generation is NOT part of the timed span —
the claim assumes the data already exists.

Writes the PERSONS appendix region of BENCH/BASELINE.md in place
(markers; analysis sections outside are preserved).
Run:  python BENCH/run_persons.py      [CORES=8 ENTITIES=400000]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from splink_spark.session import get_spark
from splink_spark.fixtures.persons import distributed_persons
from splink_spark.model import BlockingRule, Comparison, Settings
from splink_spark.functions.comparators import (
    columns_reversed_level, else_level, exact_match, exact_match_level,
    levenshtein_at_thresholds, levenshtein_level, null_level,
)
from splink_spark.model import Comparison
from splink_spark.plans.linker import Linker
from splink_spark.operators.accuracy import pairwise_f1_from_clusters
from pyspark.sql import functions as F

cores = int(os.environ.get("CORES", "8"))
n_entities = int(os.environ.get("ENTITIES", "400000"))
spark = get_spark(app_name=f"persons_{cores}", cores=cores)


t0 = time.time()
raw = distributed_persons(
    spark, n_entities=n_entities, seed=42, partitions=cores * 2
).persist()
n_records = raw.count()
ids = raw.select("unique_id", "cluster").persist()
ids.count()
gen_sec = time.time() - t0

timings = {}
# derived blocking keys materialized ONCE, as a TIMED pipeline stage:
# dob_canon (year + sorted month/day) is invariant under the
# day/month-swap corruption; name_a/name_b (least/greatest of the two
# names) are invariant under the first/surname swap. Computing them
# here instead of inside each rule's join expression gives Catalyst
# plain attribute join keys and avoids re-evaluating the substrings
# in four separate joins.
t0 = time.time()
persons = raw.selectExpr(
    "*",
    "concat(substr(dob, 1, 4), least(substr(dob, 6, 2), "
    "substr(dob, 9, 2)), greatest(substr(dob, 6, 2), "
    "substr(dob, 9, 2))) AS dob_canon",
    "least(first_name, surname) AS name_a",
    "greatest(first_name, surname) AS name_b",
).persist()
persons.count()
timings["derive_keys"] = time.time() - t0

settings = Settings(
    unique_id_column_name="unique_id",
    probability_two_random_records_match=0.001,  # re-estimated below
    blocking_rules=[
        BlockingRule(rule="l.dob = r.dob AND l.city = r.city"),
        BlockingRule(rule="l.email = r.email"),
        BlockingRule(rule="l.postcode = r.postcode"),
        # name+dob rules catch pairs whose email/city/postcode all
        # got corrupted (measured: the first three rules alone miss
        # 7.9% of positives; a missed pair now needs simultaneous
        # name AND dob damage)
        BlockingRule(rule="l.surname = r.surname AND l.dob = r.dob"),
        BlockingRule(
            rule="l.first_name = r.first_name AND l.dob = r.dob"
        ),
        # canonical-dob rules (r5): year + SORTED month/day is
        # invariant under the fixture's dob day/month swap, so a pair
        # whose email+postcode are also damaged still blocks; the key
        # stays high-cardinality (~11k values), so blocks hold a
        # handful of rows — unlike name-only keys, which are
        # quadratic at this pool size (see EM note below)
        BlockingRule(
            rule="l.dob_canon = r.dob_canon AND l.surname = r.surname"
        ),
        BlockingRule(
            rule="l.dob_canon = r.dob_canon "
                 "AND l.first_name = r.first_name"
        ),
        BlockingRule(
            rule="l.dob_canon = r.dob_canon AND l.city = r.city"
        ),
        # swap-invariant NAME-SET key (r5): the dominant residual miss
        # (measured 2,099 of 2,254 blocking misses at 125k records)
        # was first/surname SWAPPED records with city nulled and
        # email+postcode damaged — least/greatest of the two names is
        # swap-invariant, and with canonical dob the key is selective
        BlockingRule(
            rule="l.name_a = r.name_a AND l.name_b = r.name_b "
                 "AND l.dob_canon = r.dob_canon"
        ),
    ],
    # the public claim's workload shape — equality-dominated plus
    # bounded levenshtein (JVM-native 3-arg levenshtein, no Python on
    # the scoring path): fuzzy bands let corrupted records climb
    # above threshold (dob day/month swap = 2 edits, typos = 1)
    comparisons=[
        # first_name carries a columns_reversed level (the reference's
        # forename/surname-swap treatment): a swapped pair scores as a
        # strong signal instead of two else-levels, which is what let
        # name-swapped records with a nulled city clear the threshold
        Comparison(
            output_column_name="first_name",
            input_columns=["first_name"],
            levels=[
                null_level("first_name"),
                exact_match_level("first_name"),
                columns_reversed_level("first_name", "surname"),
                levenshtein_level("first_name", 2),
                else_level(),
            ],
        ),
        levenshtein_at_thresholds("surname", 2),
        levenshtein_at_thresholds("dob", 2),
        exact_match("city"),
        levenshtein_at_thresholds("email", 2),
    ],
)
linker = Linker(persons.drop("cluster"), settings)

t0 = time.time()
linker.estimate_probability_two_random_records_match(
    ["l.email = r.email"], recall=0.8
)
timings["lambda"] = time.time() - t0

t0 = time.time()
linker.estimate_u_using_random_sampling(max_pairs=1_000_000)
timings["estimate_u"] = time.time() - t0

# two sessions on SELECTIVE blocking rules that fix different
# comparisons (dob+city fixed in session 1, email fixed in session
# 2 — together every comparison trains). Name-blocked training is
# quadratic here (the fixture's 30x30 name pool gives 1.1k rows per
# name pair at 1M records = 555M training pairs; measured 728s).
t0 = time.time()
linker.estimate_parameters_using_expectation_maximisation(
    "l.dob = r.dob AND l.city = r.city", fix_u=True
)
linker.estimate_parameters_using_expectation_maximisation(
    "l.email = r.email", fix_u=True
)
timings["em"] = time.time() - t0

t0 = time.time()
preds = linker.predict().select(
    "unique_id_l", "unique_id_r", "match_probability", "match_weight"
).persist()
# aggregate over match_weight so Catalyst cannot prune the scoring
agg = preds.agg(
    F.count(F.lit(1)).alias("n"), F.sum("match_weight").alias("s")
).collect()[0]
n_pairs = int(agg["n"])
timings["predict"] = time.time() - t0

t0 = time.time()
clusters = linker.cluster_pairwise_predictions_at_threshold(preds, 0.9)
clusters.count()
timings["cluster"] = time.time() - t0

# labeled pairs per the north rule ("F1 on labeled pairs at the same
# blocking keys"): every intra-entity pair is a positive (so blocking
# misses count against recall), every blocked cross-entity pair a
# negative
pos = (
    ids.alias("l")
    .join(
        ids.alias("r"),
        (F.col("l.cluster") == F.col("r.cluster"))
        & (F.col("l.unique_id") < F.col("r.unique_id")),
    )
    .select(
        F.col("l.unique_id").alias("unique_id_l"),
        F.col("r.unique_id").alias("unique_id_r"),
        F.lit(True).alias("is_match"),
    )
)
neg = (
    preds.select("unique_id_l", "unique_id_r")
    .join(
        ids.withColumnRenamed("unique_id", "unique_id_l")
        .withColumnRenamed("cluster", "cluster_l"),
        "unique_id_l",
    )
    .join(
        ids.withColumnRenamed("unique_id", "unique_id_r")
        .withColumnRenamed("cluster", "cluster_r"),
        "unique_id_r",
    )
    .filter(F.col("cluster_l") != F.col("cluster_r"))
    .select(
        "unique_id_l",
        "unique_id_r",
        F.lit(False).alias("is_match"),
    )
)
labels = pos.unionByName(neg)
f1 = pairwise_f1_from_clusters(
    clusters.select("unique_id", "cluster_id"), labels
)

pipeline_sec = sum(timings.values())
print("RESULT " + json.dumps({
    "cores": cores,
    "n_records": n_records,
    "gen_sec": round(gen_sec, 2),
    "pairs_scored": n_pairs,
    "timings": {k: round(v, 2) for k, v in timings.items()},
    "pipeline_sec": round(pipeline_sec, 2),
    "records_per_sec": round(n_records / pipeline_sec, 1),
    "f1": round(f1["f1"], 5),
    "precision": round(f1["precision"], 5),
    "recall": round(f1["recall"], 5),
    "tp": f1["tp"], "fp": f1["fp"], "fn": f1["fn"],
}))
"""

PERSONS_BEGIN = "<!-- PERSONS:BEGIN (auto-managed by run_persons.py) -->"
PERSONS_END = "<!-- PERSONS:END -->"


def run_once(cores: int, entities: int) -> dict:
    env = dict(
        os.environ,
        REPO=REPO,
        CORES=str(cores),
        ENTITIES=str(entities),
        SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "12g"),
    )
    cmd = [sys.executable, "-c", WORKER]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError("no RESULT line")


def main() -> None:
    cores = int(os.environ.get("CORES", "8"))
    entities = int(os.environ.get("ENTITIES", "400000"))
    repeats = int(os.environ.get("REPEATS", "3"))
    runs = []
    for _ in range(repeats):
        r = run_once(cores, entities)
        print(json.dumps(r))
        runs.append(r)
    med_rps = statistics.median(r["records_per_sec"] for r in runs)
    best = max(runs, key=lambda r: r["records_per_sec"])
    med_t = {
        k: round(statistics.median(r["timings"][k] for r in runs), 2)
        for k in best["timings"]
    }
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    claim = 16700.0
    payload = f"""
Run: {stamp}, local[{cores}] taskset-pinned, median of {repeats}
(best shown alongside). {best['n_records']} records
({entities} entities), {best['pairs_scored']} pairs scored across the
nine blocking rules, pairwise F1 vs planted clusters =
{best['f1']}.

| stage | median (s) | best (s) |
|---|---|---|
| derive swap-invariant keys | {med_t['derive_keys']} | {best['timings']['derive_keys']} |
| lambda from deterministic rules | {med_t['lambda']} | {best['timings']['lambda']} |
| estimate u (1e6 random pairs) | {med_t['estimate_u']} | {best['timings']['estimate_u']} |
| EM (2 sessions, m trained, u fixed) | {med_t['em']} | {best['timings']['em']} |
| predict (block + score) | {med_t['predict']} | {best['timings']['predict']} |
| cluster (threshold 0.9 + CC) | {med_t['cluster']} | {best['timings']['cluster']} |

**Median throughput: {med_rps:.0f} records/s — {med_rps / claim:.2f}x
the public claim's ≈16,700 records/s** (best run
{best['records_per_sec']:.0f} rec/s = {best['records_per_sec'] / claim:.2f}x).
Corpus generation ({best['gen_sec']}s) is excluded from the timed
span, as the claim assumes data already on disk.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path) as f:
        doc = f.read()
    i = doc.index(PERSONS_BEGIN) + len(PERSONS_BEGIN)
    j = doc.index(PERSONS_END)
    doc = doc[:i] + "\n" + payload + "\n" + doc[j:]
    with open(out_path, "w") as f:
        f.write(doc)
    print(
        f"wrote {out_path}; median {med_rps:.0f} rec/s "
        f"({med_rps / claim:.2f}x claim)"
    )


if __name__ == "__main__":
    main()
