"""End-to-end spark-submit --py-files deployment test.

North-rule deployment shape (BASELINE.json): "run via spark-submit
--py-files on a multi-executor cluster". This drives the REAL artifact
path — tools/make_pyfiles.sh -> dist/engine.zip -> spark-submit
--py-files tools/submit_pipeline.py — in a fresh JVM whose python
imports the engine from the zip (tools/ holds no package, so a
checkout leak would fail the import-origin assert in scale_level.py's
sibling path). Asserts the full rollup lands, and that a SECOND run
against the committed output resumes from the checkpoint manifest
with zero partitions rewritten (plans/checkpoint.write_partitioned).

The reference's analogue is the operator rerunning per-day INSERT
OVERWRITE jobs by hand (hadoop/queries/cdr_and_mapping/
insert_consolidate_cdr.sql:1-3); here resume is engine-owned.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


def test_spark_submit_pyfiles_runs_and_resumes(spark, tmp_path):
    sub = _spark_submit()
    if sub is None:
        pytest.skip("pyspark ships no bin/spark-submit here")

    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    img_path = str(tmp_path / "images")
    synthetic.images_df(spark, 300, partitions=4).write.parquet(img_path)

    subprocess.run(
        ["sh", os.path.join(ROOT, "tools", "make_pyfiles.sh")],
        check=True,
        capture_output=True,
    )
    out_path = str(tmp_path / "rollup")

    def run_once() -> dict:
        r = subprocess.run(
            [
                sub,
                "--master",
                "local[2]",
                "--conf",
                "spark.ui.enabled=false",
                "--py-files",
                os.path.join(ROOT, "dist", "engine.zip"),
                os.path.join(ROOT, "tools", "submit_pipeline.py"),
                img_path,
                out_path,
            ],
            capture_output=True,
            text=True,
        )
        assert r.returncode == 0, r.stderr[-4000:]
        line = [
            ln
            for ln in r.stdout.splitlines()
            if ln.startswith("SUBMIT_SUMMARY ")
        ][-1]
        return json.loads(line.split(" ", 1)[1])

    first = run_once()
    assert first["written"] > 0
    assert first["skipped"] == 0
    assert first["rows"] > 0

    manifest = [
        json.loads(ln)
        for ln in open(os.path.join(out_path, "_manifest.jsonl"))
        if ln.strip()
    ]
    assert len(manifest) == first["written"]
    assert all(m["status"] == "committed" for m in manifest)
    assert all("rows_per_sec" in m and "lineage" in m for m in manifest)

    # resume against the same input: every partition already committed
    second = run_once()
    assert second["written"] == 0
    assert second["skipped"] == first["written"]
    # manifest not double-appended
    manifest2 = [
        json.loads(ln)
        for ln in open(os.path.join(out_path, "_manifest.jsonl"))
        if ln.strip()
    ]
    assert len(manifest2) == len(manifest)

    # the landed table itself round-trips with the expected rollup size
    landed = spark.read.parquet(out_path)
    assert landed.count() == sum(m["rows"] for m in manifest)
