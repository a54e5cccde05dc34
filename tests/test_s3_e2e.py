"""Real-jar S3 end-to-end (SURVEY §2 A13; reference save_service_s3.go:29-88).

Activates only when a genuine ``hadoop-aws`` jar is on the classpath AND an
S3(-compatible) endpoint is configured; otherwise each test skips with the
reason. The env contract (mirrors what a deployment would export anyway):

- ``QPS_S3_E2E=1``             — opt-in switch
- ``QPS_S3_BUCKET``            — bucket to write under (test prefix inside)
- ``QPS_S3_ENDPOINT``          — optional, e.g. a MinIO URL; omit for AWS
- ``AWS_ACCESS_KEY_ID`` / ``AWS_SECRET_ACCESS_KEY`` — or any credential
  chain the hadoop-aws provider list supports (IAM role, env, profile)

The jar is auto-detected in ``$SPARK_HOME/jars`` / pyspark's ``jars`` dir;
point ``QPS_HADOOP_AWS_JARS`` at a colon-separated jar list to add it
per-run without touching the install (the test forwards it via
``spark.driver/executor.extraClassPath`` in a subprocess session, exactly
like ``tests/test_s3_smoke.py`` does for the stub).

This is the honest counterpart to the stub smoke test: same write →
resolve_scan_path → read → checksum assertions, minus the fake
FileSystem. CI in this container always skips (no jar, no network).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def _find_hadoop_aws_jars() -> list[str]:
    explicit = os.environ.get("QPS_HADOOP_AWS_JARS")
    if explicit:
        return [j for j in explicit.split(":") if os.path.exists(j)]
    import pyspark

    candidates = []
    jar_dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        jar_dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for d in jar_dirs:
        if os.path.isdir(d):
            candidates += [
                os.path.join(d, j)
                for j in os.listdir(d)
                if j.startswith("hadoop-aws")
            ]
    return candidates


_JARS = _find_hadoop_aws_jars()
_ENABLED = os.environ.get("QPS_S3_E2E") == "1"
_BUCKET = os.environ.get("QPS_S3_BUCKET", "")

pytestmark = pytest.mark.skipif(
    not (_ENABLED and _JARS and _BUCKET),
    reason=(
        "real-S3 e2e needs QPS_S3_E2E=1, QPS_S3_BUCKET, and a hadoop-aws jar "
        f"(enabled={_ENABLED}, jars={len(_JARS)}, bucket={bool(_BUCKET)}) — "
        "see tests/test_s3_e2e.py docstring for the env contract"
    ),
)

_SUBPROC = """\
import os, sys, uuid
from pyspark.sql import SparkSession

classpath = sys.argv[1]
bucket = sys.argv[2]
endpoint = os.environ.get("QPS_S3_ENDPOINT") or None

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.driver.extraClassPath", classpath)
    .config("spark.executor.extraClassPath", classpath)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from quackpipe_spark.sources.remote import configure_s3, resolve_scan_path

configure_s3(
    spark,
    access_key=os.environ.get("AWS_ACCESS_KEY_ID"),
    secret_key=os.environ.get("AWS_SECRET_ACCESS_KEY"),
    endpoint=endpoint,
    path_style=bool(endpoint),  # MinIO-style endpoints need path addressing
)

prefix = "qps-e2e-" + uuid.uuid4().hex[:12]
url = f"s3a://{bucket}/{prefix}/t"
spark.createDataFrame(
    [(i, "r%d" % i) for i in range(100)], "id long, name string"
).repartition(2).write.mode("overwrite").parquet(url)

back = spark.read.parquet(resolve_scan_path(f"s3://{bucket}/{prefix}/t"))
assert back.count() == 100
assert back.selectExpr("sum(id) AS s").collect()[0]["s"] == 4950
print("S3_E2E_OK")
spark.stop()
"""


def test_s3a_roundtrip_real_stack(tmp_path):
    script = tmp_path / "e2e.py"
    script.write_text(_SUBPROC)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, str(script), ":".join(_JARS), _BUCKET],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "S3_E2E_OK" in proc.stdout
