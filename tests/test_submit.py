"""End-to-end `spark-submit --py-files` launch (the north rule's
literal run mode): the CLI script is COPIED outside the repo and run
with a scrubbed PYTHONPATH from a foreign cwd, so the ONLY way the
driver (and workers) can import ``sparkfeat`` is the zip handed to
``--py-files`` — this pins the actual cluster launch mechanism, not
an in-process simulation. Second invocation of the identical command
must resume from the manifests (zero buckets rewritten, zero jobs)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _submit(zip_path: str, script: str, out_dir: str, cwd: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    cmd = [
        shutil.which("spark-submit"),
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        script,
        "--events", "/root/testdata/sf0.001",
        "--output", out_dir,
        "--num-buckets", "2",
    ]
    r = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=420
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # the CLI prints ONE summary JSON line on stdout
    summary = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert summary, r.stdout[-2000:]
    return json.loads(summary[-1])


def test_spark_submit_py_files_runs_and_resumes(tmp_path):
    sys.path.insert(0, REPO)
    from sparkfeat.shipping import build_zip

    zip_path = build_zip(str(tmp_path / "sparkfeat.zip"))
    script = str(tmp_path / "cli_entry.py")
    shutil.copy(os.path.join(REPO, "sparkfeat", "cli.py"), script)
    out_dir = str(tmp_path / "out")

    first = _submit(zip_path, script, out_dir, cwd=str(tmp_path))
    assert first["written"] == [0, 1] and first["skipped"] == []
    assert first["rows"] > 0 and first["jobs"] >= 1

    # identical command resumes from the manifests: nothing rewritten
    second = _submit(zip_path, script, out_dir, cwd=str(tmp_path))
    assert second["written"] == [] and second["skipped"] == [0, 1]
    assert second["jobs"] == 0
