"""The north-rule launch shape: spark-submit --py-files splade_spark.zip
against a multi-executor master (local-cluster = real executor JVMs),
end-to-end synth → build → query through submit.py.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_round_trip(tmp_path):
    pyzip = str(tmp_path / "splade_spark.zip")
    with zipfile.ZipFile(pyzip, "w") as zf:
        pkg = os.path.join(REPO, "splade_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)  # master comes from spark-submit
    env["SPLADE_SPARK_DRIVER_MEM"] = "2g"

    def submit(*args: str) -> None:
        cmd = [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,1536]",
            "--conf", "spark.executor.memory=1g",
            "--conf", "spark.ui.enabled=false",
            "--py-files", pyzip,
            os.path.join(REPO, "submit.py"),
            *args,
        ]
        # cwd=tmp_path so the driver cannot fall back to importing the
        # repo checkout — the zip must carry the package to executors
        r = subprocess.run(
            cmd, cwd=str(tmp_path), env=env,
            capture_output=True, text=True, timeout=420,
        )
        assert r.returncode == 0, r.stderr[-4000:]

    t, idx, runs = str(tmp_path / "t"), str(tmp_path / "i"), str(tmp_path / "r")
    submit("synth", "--out", t, "--conversations", "40")
    submit("build", "--transcripts", t, "--index", idx, "--shards", "4")
    q = tmp_path / "q.tsv"
    q.write_text("q1\tterm0001 term0002\n")
    submit("query", "--index", idx, "--queries", str(q), "--out", runs)

    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM parquet_scan('{runs}/*.parquet')").fetchone()[0]
    assert n > 0
