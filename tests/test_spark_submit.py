"""Real `spark-submit --py-files` deployment run.

The north rule names the exact deployment shape: "run via spark-submit
--py-files on a multi-executor cluster". test_text_functions.py already
drives tools/submit_pipeline.py as `python ...` (repo root on sys.path);
this test runs the REAL thing — `$SPARK_HOME/bin/spark-submit
--py-files splink_spark.zip` from a working directory that does NOT
contain the package, so every `import splink_spark` (driver and
executor side, including the pandas-UDF workers that unpickle
functions) must resolve from the shipped zip.

reference: n/a (splink is a library, not a spark job; the deployment
requirement comes from BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SPARK_SUBMIT = shutil.which("spark-submit") or (
    os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")
    if os.environ.get("SPARK_HOME")
    else None
)


def _build_zip(dest: str) -> str:
    """zip -r splink_spark.zip splink_spark (minus __pycache__)."""
    zpath = os.path.join(dest, "splink_spark.zip")
    pkg = os.path.join(REPO, "splink_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(
    _SPARK_SUBMIT is None or not os.path.exists(_SPARK_SUBMIT),
    reason="spark-submit binary not on PATH/SPARK_HOME",
)
def test_spark_submit_py_files_deploy(spark, tmp_path):
    docs = "/root/testdata/sf0.001/documents.parquet"
    inp = str(tmp_path / "pages.parquet")
    (
        spark.read.parquet(docs)
        .selectExpr(
            "concat('https://example.com/', cast(doc_id as string)) AS url",
            "text",
            "lang",
        )
        .limit(300)
        .write.mode("overwrite")
        .parquet(inp)
    )

    zpath = _build_zip(str(tmp_path))
    # run the script from OUTSIDE the repo: its repo-root sys.path
    # fallback then points at tmp_path (no package there), so the
    # import must come from --py-files.
    script_dir = tmp_path / "tools"
    script_dir.mkdir()
    script = str(script_dir / "submit_pipeline.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_pipeline.py"), script)
    out = str(tmp_path / "clusters.parquet")

    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    env.pop("PYTHONPATH", None)  # nothing but the zip may provide the pkg
    proc = subprocess.run(
        [
            _SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            script,
            "--input", inp,
            "--output", out,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, (proc.stderr or proc.stdout)[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["n_pages"] == 300
    assert 0 < stats["n_clusters"] <= 300
    assert spark.read.parquet(out).count() == 300
