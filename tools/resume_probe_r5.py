"""Round-5 at-scale probe: kill/restart-safe resume of the flagship
pages pipeline through the lineage manifests (plans/lineage.py).

The north rule requires "resumable from checkpoint with per-partition
lineage + metrics". The pytest gate exercises resume at 300 rows with a
SIMULATED partial state; this probe does the real thing:

1. generate a deterministic pages table (default 1,000,000 rows) and
   write it to parquet;
2. launch the resumable pipeline (chunked commits,
   ``chunk_buckets = n_buckets // 8``) as a SEPARATE PROCESS and
   SIGKILL -9 it once the manifest shows at least one committed chunk —
   a hard crash mid-write, not a Python exception;
3. assert the crash left PARTIAL durable progress
   (0 < done buckets < n_buckets) and that ``resume_plan`` names
   exactly the missing ones;
4. rerun to completion and assert the rerun recomputed ONLY the
   missing buckets (worker prints its todo list);
5. deep-validate (``validate_stage`` — stored data re-hashed against
   every manifest row) and compare the resumed output's
   order-insensitive checksum against a CLEAN single-shot run of the
   same pipeline — bit-identical or the probe fails.

Usage: python tools/resume_probe_r5.py [n_rows] [cores]
Appends a row to BENCH/RESUME.md.
"""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BUCKETS = 32
STAGE = "pages_features"


def _worker(input_path: str, resume_dir: str, cores: int) -> None:
    """Subprocess body: run the resumable flagship pipeline with
    chunked commits; print the todo list so the parent can verify the
    rerun recomputed only missing buckets."""
    from featurewiz_spark.plans.lineage import resume_plan, run_resumable
    from featurewiz_spark.plans.pipeline import pages_feature_pipeline
    from featurewiz_spark.session import get_spark

    spark = get_spark("resume-probe-worker", cores=cores, shuffle_partitions=cores)
    pages = spark.read.parquet(input_path)
    todo = resume_plan(spark, resume_dir, STAGE, N_BUCKETS)
    print(f"WORKER_TODO={sorted(todo)}", flush=True)
    run_resumable(
        spark,
        pages,
        lambda df: pages_feature_pipeline(df),
        resume_dir,
        stage=STAGE,
        keys=["url"],
        n_buckets=N_BUCKETS,
        chunk_buckets=N_BUCKETS // 8,
    )
    print("WORKER_DONE", flush=True)
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        _worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from featurewiz_spark.plans.lineage import resume_plan, validate_stage
    from featurewiz_spark.plans.pipeline import pages_feature_pipeline
    from featurewiz_spark.session import get_spark
    from featurewiz_spark.sources.pages import generate_pages

    work = tempfile.mkdtemp(prefix="fw_resume_probe_")
    input_path = os.path.join(work, "pages")
    resume_dir = os.path.join(work, "ckpt")
    man_glob = os.path.join(resume_dir, "_manifest", STAGE, "*.parquet")

    spark = get_spark("resume-probe", cores=cores, shuffle_partitions=cores)
    generate_pages(spark, n_rows).write.mode("overwrite").parquet(input_path)

    def launch():
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             input_path, resume_dir, str(cores)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=REPO, start_new_session=True,
        )

    # --- run 1: SIGKILL after the first committed chunk -------------
    t0 = time.time()
    proc = launch()
    killed = False
    while proc.poll() is None:
        if glob.glob(man_glob):
            time.sleep(0.5)  # land mid-flight in a later chunk
            os.killpg(proc.pid, signal.SIGKILL)
            killed = True
            break
        time.sleep(0.2)
    proc.wait()
    assert killed, (
        "worker finished before the first manifest commit appeared — "
        "raise n_rows so chunks take long enough to interrupt"
    )
    kill_s = time.time() - t0

    todo_after_kill = sorted(resume_plan(spark, resume_dir, STAGE, N_BUCKETS))
    done_after_kill = N_BUCKETS - len(todo_after_kill)
    assert 0 < done_after_kill < N_BUCKETS, (
        f"kill left no PARTIAL progress: {done_after_kill}/{N_BUCKETS} done"
    )

    # --- run 2: resume to completion ---------------------------------
    t0 = time.time()
    proc = launch()
    out_lines, _ = proc.communicate()
    resume_s = time.time() - t0
    assert proc.returncode == 0 and "WORKER_DONE" in out_lines
    todo_line = [l for l in out_lines.splitlines() if l.startswith("WORKER_TODO=")]
    assert todo_line and todo_line[0] == f"WORKER_TODO={todo_after_kill}", (
        "rerun did not recompute exactly the missing buckets"
    )
    assert resume_plan(spark, resume_dir, STAGE, N_BUCKETS) == []

    # --- deep validation + clean-run equality -------------------------
    assert validate_stage(spark, resume_dir, STAGE).count() == 0

    def checksum(df):
        cols = [c for c in sorted(df.columns) if c != "__bucket"]
        return df.select(
            F.sum(
                F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
            ).alias("cs"),
            F.count(F.lit(1)).alias("n"),
        ).first()

    resumed = spark.read.parquet(os.path.join(resume_dir, STAGE))
    clean = pages_feature_pipeline(spark.read.parquet(input_path))
    got, want = checksum(resumed), checksum(clean)
    assert (got["n"], got["cs"]) == (want["n"], want["cs"]), (
        f"resumed output diverges from a clean run: {got} vs {want}"
    )

    line = (
        f"| {n_rows:,} | local[{cores}] | {N_BUCKETS} | {N_BUCKETS // 8} "
        f"| SIGKILL@{kill_s:.1f}s | {done_after_kill}/{N_BUCKETS} "
        f"| {len(todo_after_kill)} | {resume_s:.1f} | {want['n']:,} | identical |"
    )
    print(line)

    path = os.path.join(REPO, "BENCH", "RESUME.md")
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write(
                "# BENCH/RESUME.md — kill/restart resume probes\n\n"
                "Real SIGKILL -9 of a separate worker process mid-pipeline "
                "(tools/resume_probe_r5.py): chunk-committed lineage "
                "manifests must preserve partial progress, the rerun must "
                "recompute exactly the missing buckets (worker-printed todo "
                "list asserted), validate_stage must re-hash clean, and the "
                "resumed output must checksum-match a clean single-shot "
                "run.\n\n"
                "| rows | parallelism | buckets | chunk | kill | durable "
                "after kill | recomputed | resume s | out rows | vs clean |\n"
                "|---|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(line + "\n")
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
