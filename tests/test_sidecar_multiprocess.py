"""CROSS-PROCESS sidecar race fuzz (sources/sidecar.py).

The single-process lifecycle property test randomizes sequences in one
interpreter; the documented races are cross-process: the epoch-CAS
compaction commit racing a concurrent appender, and the grace-0
listdir/meta ordering in _gc_slot. This test spawns real writer
PROCESSES (each with its own SparkSession and its own flock fds)
mixing rewrites, appends, and forced compactions against ONE slot
under grace 0, while the parent continuously validates every
committed read:

  - meta.json always parses (unique-tmp + os.replace: no torn JSON);
  - every referenced data directory exists and its parquet is fully
    readable (a committed pointer never dangles into a swept or
    half-written directory, even with grace 0);
  - no directory is referenced twice in one chain;
  - every directory's row count is a positive multiple of the batch
    size (compaction = union of whole batches, appends = whole
    batches — a torn write or lost delta breaks the multiple);
  - the epoch is strictly monotone across every observation.

Marked slow-ish (~2 min: three JVM starts amortized over the op
loop); the op loop gives ≥20 racing commit sequences per run.
"""

import json
import os
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

BATCH = 10  # rows per committed batch — the consistency modulus
OPS_PER_WRITER = 8
N_WRITERS = 3

_WORKER = r"""
import os, random, sys

seed = int(sys.argv[1])
root = sys.argv[2]
random.seed(seed)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"sidecar-fuzz-{seed}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "1g")
    .getOrCreate()
)
from stac_fastapi_duckdb_spark.sources import sidecar as sc

BATCH = 10
for i in range(int(sys.argv[3])):
    df = spark.range(BATCH).selectExpr(
        "id", f"'{seed}-{i}' as src"
    )
    fp = f"fp-{seed}-{i}"
    try:
        if random.random() < 0.5:
            sc.write_sidecar(df, "fam", "t", fp, root=root)
        else:
            # max_deltas=1 forces a compaction attempt on nearly every
            # append — the CAS path under real cross-process contention
            sc.append_sidecar(df, "fam", "t", fp, root=root, max_deltas=1)
    except FileNotFoundError:
        # another process's rewrite can race the base check; an append
        # with no base is contractually a write
        sc.write_sidecar(df, "fam", "t", fp, root=root)
print("WORKER-DONE", seed)
"""


def _read_meta_raw(slot: str) -> dict | None:
    mp = os.path.join(slot, "meta.json")
    try:
        with open(mp) as fh:
            raw = fh.read()
    except FileNotFoundError:
        return None
    # unique-tmp + os.replace makes torn JSON impossible — a parse
    # error here is a real bug, so let it raise
    return json.loads(raw)


def _validate_pointer(slot: str, meta: dict) -> None:
    """Assert one committed pointer's chain is fully consistent."""
    d = meta["data"]
    names = [d] if isinstance(d, str) else list(d)
    assert len(names) == len(set(names)), f"dir referenced twice: {names}"
    for name in names:
        p = os.path.join(slot, name)
        assert os.path.isdir(p), f"committed pointer dangles: {name}"
        n = 0
        for f in os.listdir(p):
            if f.endswith(".parquet"):
                n += pq.read_table(os.path.join(p, f)).num_rows
        assert n > 0 and n % BATCH == 0, (
            f"dir {name} has {n} rows — not whole batches"
        )


def _check_committed(slot: str, last_epoch: int) -> int:
    """One validation pass; returns the observed epoch (or last_epoch
    when no commit exists yet).

    Grace 0 gives LAZY readers no protection by contract (module
    docstring: "readers that outlive the window must eagerly
    materialize"), so a validation failure only counts as a bug if the
    pointer is STILL the one we validated against — if a newer commit
    superseded it mid-check, the observation is stale and is retried
    against the new pointer."""
    for _ in range(25):
        meta = _read_meta_raw(slot)
        if meta is None:
            return last_epoch
        epoch = meta["epoch"]
        assert epoch >= last_epoch, (
            f"epoch went backwards: {last_epoch}->{epoch}"
        )
        try:
            _validate_pointer(slot, meta)
            return epoch
        except (AssertionError, OSError):
            cur = _read_meta_raw(slot)
            if cur is not None and cur.get("epoch") == epoch:
                raise  # pointer unchanged — the inconsistency is real
            last_epoch = max(last_epoch, epoch)
            continue  # superseded mid-check: stale observation, retry
    raise AssertionError("pointer churned faster than 25 validation tries")


def test_multiprocess_writers_never_publish_inconsistent_state(tmp_path):
    root = str(tmp_path / "artifacts")
    slot = os.path.join(root, "fam", "t")
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    env = dict(
        os.environ,
        PYTHONPATH="/root/repo",
        SPARK_GRAFT_SIDECAR_GC_SECONDS="0",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(s), root, str(OPS_PER_WRITER)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for s in range(1, N_WRITERS + 1)
    ]
    last_epoch = 0
    observations = 0
    try:
        while any(p.poll() is None for p in procs):
            last_epoch = _check_committed(slot, last_epoch)
            if last_epoch:
                observations += 1
            time.sleep(0.05)
    finally:
        for p in procs:
            p.kill()
    outs = [p.stdout.read().decode() for p in procs]
    assert all("WORKER-DONE" in o for o in outs), (
        f"a writer crashed: {outs}"
    )
    # final state is consistent too, and the run really exercised the
    # machinery: every op commits at least once (appends commit the
    # chain and possibly a compaction on top)
    final_epoch = _check_committed(slot, last_epoch)
    assert final_epoch >= N_WRITERS * OPS_PER_WRITER
    assert observations >= 20, (
        f"only {observations} mid-run observations — loop too fast?"
    )
