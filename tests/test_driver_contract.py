"""Driver-contract regression: __spark_entry__ must work when the driver
process is launched from OUTSIDE the repo (executor Python workers import
the package via the runtime-shipped zip, not the driver's cwd)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "%s/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
assert len(mod.queries()) == len(mod.oracle_sql()) >= 30
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("driver-contract")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
n = mod.entry(spark).count()
assert n > 0, n
m = mod.queries()["extract_status_counts"](spark, "/root/testdata/sf0.01").count()
assert m >= 2, m
spark.stop()
print("DRIVER_CONTRACT_OK")
""" % REPO


def test_entry_from_foreign_cwd(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", CODE],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "DRIVER_CONTRACT_OK" in out.stdout, out.stderr[-3000:]
