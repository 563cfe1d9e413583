"""spark-submit --py-files packaging smoke test (north-rule contract:
the pipeline must run as a packaged cluster job, not only in-process)."""

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        if os.path.exists(cand):
            return cand
    except ImportError:
        pass
    return None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_job(spark):
    # stop the shared fixture session: two local Spark JVMs fight over
    # driver ports/temp dirs and 32+2 threads oversubscribe the box
    tmp = tempfile.mkdtemp(prefix="fw_submit_")
    try:
        rng = np.random.default_rng(4)
        n = 200
        pdf = pd.DataFrame(
            {
                "url": [f"https://site{i % 7}.test/p" for i in range(n)],
                "warc_ts": pd.Timestamp("2024-03-01")
                + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
                "html": [f"<html><title>t{i}</title><p>body {i}</p></html>".encode() for i in range(n)],
                "text": [f"body {i}" for i in range(n)],
                "lang": rng.choice(["en", "de", None], n).tolist(),
            }
        )
        inp = os.path.join(tmp, "pages")
        outp = os.path.join(tmp, "features")
        spark.createDataFrame(pdf).write.parquet(inp)

        subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")], check=True)
        env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
                   PYSPARK_DRIVER_PYTHON=sys.executable)
        r = subprocess.run(
            [
                _spark_submit(),
                "--master", "local[2]",
                "--py-files", os.path.join(REPO, "dist", "featurewiz_spark.zip"),
                "--conf", "spark.ui.enabled=false",
                os.path.join(REPO, "jobs", "pages_pipeline_job.py"),
                "--input", inp,
                "--output", outp,
            ],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        got = spark.read.parquet(outp)
        assert got.count() == n
        cols = set(got.columns)
        assert {"extracted_text", "session_id", "n_chars"} <= cols
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_warc_input(spark):
    """--input-format warc: the packaged job runs straight off a raw
    crawl dump (WARC dir -> canonical pages -> feature vectors)."""
    import gzip

    from tests.test_warc import _http, _record

    tmp = tempfile.mkdtemp(prefix="fw_submit_warc_")
    try:
        landing = os.path.join(tmp, "landing")
        os.makedirs(landing)
        parts = []
        for i in range(40):
            html = (
                f"<html><title>p{i}</title><body><p>body {i} café"
                "</p></body></html>"
            ).encode()
            parts.append(
                gzip.compress(
                    _record(
                        "response",
                        f"http://site{i % 5}.test/p",
                        f"2024-03-{(i % 27) + 1:02d}T10:00:00Z",
                        _http(html),
                    )
                )
            )
        with open(os.path.join(landing, "seg0.warc.gz"), "wb") as f:
            f.write(b"".join(parts))
        outp = os.path.join(tmp, "features")

        subprocess.run(
            ["bash", os.path.join(REPO, "scripts", "package.sh")], check=True
        )
        env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
                   PYSPARK_DRIVER_PYTHON=sys.executable)
        r = subprocess.run(
            [
                _spark_submit(),
                "--master", "local[2]",
                "--py-files", os.path.join(REPO, "dist", "featurewiz_spark.zip"),
                "--conf", "spark.ui.enabled=false",
                os.path.join(REPO, "jobs", "pages_pipeline_job.py"),
                "--input", landing,
                "--input-format", "warc",
                "--charset-aware",
                "--output", outp,
            ],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        got = spark.read.parquet(outp)
        assert got.count() == 40
        cols = set(got.columns)
        assert {"url", "warc_ts", "text", "lang", "session_id", "n_chars"} <= cols
        assert got.where("text like '%café%'").count() == 40
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_packaged_zip_matches_source():
    """The committed --py-files artifact must be byte-identical to the
    source tree. Found stale twice in round 4 (the audio leg was
    missing from the zip while every local test passed — a cluster job
    importing it would die on ImportError); this pins the invariant."""
    import glob
    import zipfile

    z = zipfile.ZipFile(os.path.join(REPO, "dist", "featurewiz_spark.zip"))
    names = set(z.namelist())
    srcs = glob.glob(
        os.path.join(REPO, "featurewiz_spark", "**", "*.py"), recursive=True
    )
    assert srcs
    for f in srcs:
        rel = os.path.relpath(f, REPO)
        assert rel in names, f"{rel} missing from dist zip — run scripts/package.sh"
        with open(f, "rb") as fh:
            assert z.read(rel) == fh.read(), (
                f"{rel} is stale in dist zip — run scripts/package.sh"
            )
