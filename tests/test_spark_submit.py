"""End-to-end `spark-submit --py-files` smoke (BASELINE.json:6 — the
job must run via spark-submit on a cluster; this drives the EXACT
submit path on local[2]): package the engine zip with
scripts/package.py, submit bench/run_bench.py with ONLY the zip on the
python path, and parse the one-line JSON result."""

import json
import os
import shutil
import subprocess
import sys

import pyspark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_pagerank(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "package.py")],
        capture_output=True, text=True, timeout=120, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("engine.zip") and os.path.exists(zip_path)

    env = dict(os.environ)
    # the submit must resolve the engine from --py-files, not the
    # checkout: run from a neutral cwd with no PYTHONPATH help
    env.pop("PYTHONPATH", None)
    run = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(ROOT, "bench", "run_bench.py"),
            "--algo", "pagerank",
            "--edges", "2000",
            "--max-supersteps", "5",
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert run.returncode == 0, run.stderr[-2000:]
    line = [ln for ln in run.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["algo"] == "pagerank"
    assert res["result_rows"] > 0
    assert res["supersteps"] >= 1
    assert res["master"] == "local[2]"
