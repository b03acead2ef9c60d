"""bench.py driver contract: prints exactly ONE JSON line with the
headline metric, stage timings, and the quality gate."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_prints_one_json_line():
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS": "4",
        "SAMPLE_PAIRS": "50000",
        # contract test checks the JSON shape, not scale: tiny legs
        "SPARK_GRAFT_SCALE_X1": "400",
    }
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, proc.stdout[-1000:]
    d = json.loads(json_lines[0])
    assert d["metric"] == "scored_pairs_per_sec"
    assert d["value"] > 0
    assert d["unit"] == "pairs/sec"
    assert 0.99 <= d["f1"] <= 1.0
    for stage in (
        "derive_keys",
        "block_and_score",
        "score_sampled",
        "cluster",
    ):
        assert stage in d["queries"]
    assert d["pairs_scored_total"] == d["pairs_generated"] + d["pairs_sampled"]
    # 10x scale-check leg: both legs present with near-linear evidence
    sc = d["scale_check"]
    assert sc["legs"]["x10"]["n_pages"] > 5 * sc["legs"]["x1"]["n_pages"]
    for stage in ("minhash", "cc", "ivf", "pack", "spans"):
        assert stage in sc["wall_growth_over_data_growth"]
        assert f"{stage}_sec" in sc["legs"]["x1"]
        assert f"{stage}_sec" in sc["legs"]["x10"]
