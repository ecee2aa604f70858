"""The north rule's delivery mechanism: the engine must run via
``spark-submit --py-files <package.zip>`` on a cluster. This test builds
the actual zip artifact, ships it through a real spark-submit, and runs
the flagship extraction in the submitted driver — no reliance on the
repo being importable from the executors' cwd."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

DRIVER = """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("dere_submit_smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# the package must come from the shipped zip (cwd is a scratch dir)
import dere_spark  # noqa: F401
from dere_spark.webtext import extract_triples

n = extract_triples(spark, sys.argv[1]).count()
print("TRIPLES_COUNT=%d" % n)
spark.stop()
"""


@pytest.mark.slow  # subprocess spark-submit: full JVM + session startup
@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files(tmp_path):
    zip_path = str(tmp_path / "dere_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "dere_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith((".py", ".xml")):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", f"spark.pyspark.python={sys.executable}",
            str(driver),
            "/root/testdata/sf0.001",
        ],
        cwd=str(tmp_path),  # NOT the repo: import must resolve via the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    marker = [l for l in proc.stdout.splitlines() if l.startswith("TRIPLES_COUNT=")]
    assert marker, proc.stdout[-2000:]
    assert int(marker[0].split("=")[1]) > 0
