"""Real ``spark-submit --py-files engine.zip`` launch (north_rule: run via
spark-submit --py-files on a multi-executor cluster).

The existing CLI test drives ``scripts/run_validation.py`` with the repo
on sys.path; this one proves the CLUSTER packaging: the entrypoint is
staged OUTSIDE the repo, the working directory contains no engine code,
and the subprocess is the real ``spark-submit`` launcher — so the
``anomalydetection_spark`` import can only resolve from the zip shipped
via ``--py-files``, exactly as it would on a 1000-executor deployment.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

from anomalydetection_spark.synth import generate_pandas, to_spark

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    # prefer the launcher shipped with the installed pyspark (guaranteed
    # version-matched to the library under test), fall back to PATH
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    return shutil.which("spark-submit")


@pytest.fixture(scope="module")
def small_image_table(spark, tmp_path_factory):
    pdf, _man = generate_pandas(1200, with_payload=False)
    path = str(tmp_path_factory.mktemp("submit") / "images")
    to_spark(spark, pdf).repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_spark_submit_pyfiles_zip(small_image_table, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit launcher available")

    zip_path = tmp_path / "engine.zip"
    pkg = REPO / "anomalydetection_spark"
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, arcname=str(f.relative_to(REPO)))

    # entrypoint staged outside the repo: its sys.path.insert of
    # "<scripts>/.." now points at an empty temp dir, so the engine can
    # only come from --py-files
    entry = tmp_path / "run_validation.py"
    shutil.copy(REPO / "scripts" / "run_validation.py", entry)

    out = tmp_path / "out"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4",
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)
    cmd = [
        submit, "--master", "local[4]", "--driver-memory", "2g",
        "--py-files", str(zip_path), str(entry),
        "--input", small_image_table, "--output", str(out),
        "--n-buckets", "2", "--no-decode",
    ]
    p = subprocess.run(cmd, env=env, cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=420)
    assert p.returncode == 0, (p.stdout[-1500:], p.stderr[-3000:])

    body = p.stdout[p.stdout.index("{"):]
    summary = json.loads(body[:body.rindex("}") + 1])
    assert summary["units_completed"] == 2
    assert sum(u["rows"] for u in summary["units"]) == 1200
    assert (out / "verdicts").is_dir()
    assert (out / "_ledger").is_dir()
