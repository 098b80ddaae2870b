"""spark-submit CLI entry: argument plumbing + a real mini-run through
jobs/crawl_job.py main() (same code path spark-submit executes)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")

from jobs.crawl_job import parse_args  # noqa: E402


def test_parse_args():
    a = parse_args([
        "--pages", "/p", "--seeds", "/s", "--state-dir", "/d",
        "--max-rounds", "7", "--per-host-budget", "3", "--no-bloom",
    ])
    assert (a.pages, a.seeds, a.state_dir) == ("/p", "/s", "/d")
    assert a.max_rounds == 7 and a.per_host_budget == 3 and a.no_bloom


@pytest.mark.slow
def test_spark_submit_py_files_run(spark, tmp_path):
    """The north rule's ship path: zip the package, spark-submit --py-files,
    crawl 2 rounds of the smoke corpus, assert the JSON summary.

    Prep uses the SHARED session fixture — getOrCreate() would return (and
    stopping it would kill) the same session regardless of master.
    """
    import shutil

    from newscrawler_spark.contract import _p, ensure_cache
    from newscrawler_spark.sources.fixtures import seeds_df

    ensure_cache(spark, "smoke")
    pages_path = _p("smoke", "pages")
    seeds_path = str(tmp_path / "seeds.parquet")
    seeds_df(spark, "smoke", per_host_budget=10).write.mode("overwrite").parquet(seeds_path)

    zip_path = str(tmp_path / "newscrawler_spark.zip")
    shutil.make_archive(zip_path[:-4], "zip", "/root/repo", "newscrawler_spark")
    state_dir = str(tmp_path / "state")

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--py-files", zip_path,
            "jobs/crawl_job.py",
            "--pages", pages_path, "--seeds", seeds_path,
            "--state-dir", state_dir, "--max-rounds", "2",
            "--per-host-budget", "10",
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["rounds_run"] == 2
    assert summary["urls_fetched"] > 0


def test_ingest_job_parse_args():
    from jobs.ingest_job import parse_args

    a = parse_args([
        "--shards", "/land", "--out", "/corpus",
        "--checkpoint-dir", "/ck", "--max-files-per-trigger", "8",
    ])
    assert (a.shards, a.out, a.checkpoint_dir) == ("/land", "/corpus", "/ck")
    assert a.max_files_per_trigger == 8
    assert not a.continuous and not a.no_provenance


def test_ingest_job_main_runs(spark, smoke_pages_pd, tmp_path):
    """main() end-to-end on a local landing dir (same code path
    spark-submit executes, minus the JVM respawn)."""
    import json as _json

    from newscrawler_spark.sources.warc import write_warc
    from jobs.ingest_job import main

    pages = spark.createDataFrame(smoke_pages_pd.head(25))
    land = str(tmp_path / "land")
    write_warc(pages, land, records_per_file=10).collect()
    out = str(tmp_path / "corpus")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--shards", land, "--out", out,
              "--checkpoint-dir", str(tmp_path / "ck")])
    line = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")][-1]
    assert _json.loads(line)["ingested_rows"] == 25
