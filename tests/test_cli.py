"""Reference-parity CLI (python -m parquet_python_spark) end-to-end."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_metadata_limit_col_json():
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            sys.executable, "-m", "parquet_python_spark",
            "--metadata", "--limit", "2",
            "--col", "n_nationkey", "--col", "n_name",
            "--format", "json",
            "/root/testdata/sf0.001/nation.parquet",
        ],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 2  # --limit honored
    row = json.loads(lines[0])
    assert set(row) == {"n_nationkey", "n_name"}  # --col projection
    assert "n_nationkey: int rows=25" in proc.stdout  # --metadata stats


def test_cli_where_filter():
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            sys.executable, "-m", "parquet_python_spark",
            "--where", "n_regionkey = 2 AND n_nationkey < 10",
            "--col", "n_nationkey", "--col", "n_regionkey",
            "--format", "json",
            "/root/testdata/sf0.001/nation.parquet",
        ],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert rows  # nation has region-2 members below key 10
    assert all(r["n_regionkey"] == 2 and r["n_nationkey"] < 10 for r in rows)


def test_cli_where_on_unprojected_column():
    # WHERE sees the full schema even when --col drops the predicate column
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            sys.executable, "-m", "parquet_python_spark",
            "--where", "n_regionkey = 2",
            "--col", "n_name",
            "--format", "json",
            "/root/testdata/sf0.001/nation.parquet",
        ],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert rows and all(set(r) == {"n_name"} for r in rows)
