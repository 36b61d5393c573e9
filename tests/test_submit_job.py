"""End-to-end spark-submit test of the north rule's deploy form: package
the engine with tools/build_pyfiles_zip.py, run jobs/dedup_job.py via
`spark-submit --py-files` in a FRESH JVM against a synthesized corpus,
and check the parquet outputs + resume behavior."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_job(spark, tmp_path):
    from smqtk_indexing_spark.sources.files import synth_files

    files, _ = synth_files(n=400, seed=7)
    inp = str(tmp_path / "files_parquet")
    spark.createDataFrame(files).write.parquet(inp)

    zip_path = str(tmp_path / "smqtk_indexing_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "build_pyfiles_zip.py"), zip_path],
        capture_output=True, text=True, check=True,
    )
    assert os.path.exists(zip_path)

    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--py-files", zip_path,
        os.path.join(ROOT, "jobs", "dedup_job.py"),
        "--input", inp, "--output", outdir, "--checkpoint-dir", ckpt,
        "--pair-mode", "all", "--partition-lineage",
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["clusters_rows"] == 400

    clusters = spark.read.parquet(f"{outdir}/clusters")
    assert clusters.count() == 400
    lineage = spark.read.parquet(f"{outdir}/lineage")
    stages = {row.stage for row in lineage.collect()}
    assert {"member_map", "signatures", "cand_pairs", "dup_pairs", "clusters"} <= stages
    pl = spark.read.parquet(f"{outdir}/partition_lineage")
    assert pl.count() > 0

    # resume: second run must reuse every completed stage from the
    # checkpoint AND still produce a populated per-partition profile (the
    # resumed branch must profile too — it overwrites the output table)
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert r2.returncode == 0, r2.stderr[-3000:]
    lineage2 = spark.read.parquet(f"{outdir}/lineage")
    assert all(row.resumed for row in lineage2.collect())
    assert spark.read.parquet(f"{outdir}/partition_lineage").count() > 0
