"""S3 integration smoke (SURVEY §2 A13, reference save_service_s3.go:29-88 /
merge_service_s3.go:99-109).

The container has no hadoop-aws jar (and no network), so the AWS client
itself can't load. What CAN be exercised end-to-end is everything above
it: ``configure_s3``'s fs.s3a.* conf plumbing, ``resolve_scan_path``'s
s3://→s3a:// mapping, and the full Hadoop FileSystem stack a real s3a
write/read goes through — URI resolution via ``fs.s3a.impl``, checkPath
against bucket authority, the parquet output committer's
mkdirs/rename/listStatus, and the read-side file index. We compile a
20-line ``RawLocalFileSystem`` subclass that serves the ``s3a`` scheme
against local disk (bucket authority checked then dropped) and register
it as ``fs.s3a.impl`` — swapping exactly the one layer the missing jar
would provide. Auto-skips if javac is unavailable.

Needs a fresh JVM (driver extraClassPath is boot-time), so the round-trip
runs in a subprocess SparkSession.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

_JAVA_SRC = """\
package qps;

import java.io.File;
import java.io.FileNotFoundException;
import java.io.IOException;
import java.net.URI;
import java.util.ArrayList;
import java.util.List;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/** Serves s3a:// against local disk: authority (bucket) is validated by
 *  checkPath then dropped, the key becomes the local path. Everything
 *  else (committer, rename, open/create) is the stock FileSystem stack.
 *  getFileStatus/listStatus are re-implemented eagerly because the
 *  superclass' lazy permission loader does new File(uri) with the s3a
 *  scheme. */
public class FakeS3FileSystem extends RawLocalFileSystem {
    private URI uri;

    @Override
    public void initialize(URI name, Configuration conf) throws IOException {
        uri = URI.create("s3a://" + name.getAuthority());
        super.initialize(name, conf);
    }

    @Override
    public URI getUri() {
        // the superclass constructor qualifies the initial working dir
        // before initialize() has run
        return uri != null ? uri : URI.create("s3a:///");
    }

    @Override
    public String getScheme() {
        return "s3a";
    }

    @Override
    public FileStatus getFileStatus(Path f) throws IOException {
        File file = pathToFile(f);
        if (!file.exists()) {
            throw new FileNotFoundException("File " + f + " does not exist");
        }
        boolean dir = file.isDirectory();
        return new FileStatus(
            dir ? 0 : file.length(), dir, 1, getDefaultBlockSize(f),
            file.lastModified(), file.lastModified(),
            dir ? FsPermission.getDirDefault() : FsPermission.getFileDefault(),
            "spark", "spark", makeQualified(f));
    }

    @Override
    public FileStatus[] listStatus(Path f) throws IOException {
        File localf = pathToFile(f);
        if (!localf.exists()) {
            throw new FileNotFoundException("File " + f + " does not exist");
        }
        if (localf.isFile()) {
            return new FileStatus[] { getFileStatus(f) };
        }
        String[] names = localf.list();
        List<FileStatus> out = new ArrayList<>();
        if (names != null) {
            for (String n : names) {
                out.add(getFileStatus(new Path(f, n)));
            }
        }
        return out.toArray(new FileStatus[0]);
    }
}
"""

_SUBPROC = """\
import sys
from pyspark.sql import SparkSession

classes, data_dir = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.driver.extraClassPath", classes)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from quackpipe_spark.sources.remote import configure_s3, resolve_scan_path

configure_s3(spark, access_key="ak", secret_key="sk", endpoint="http://minio.local:9000")
hconf = spark.sparkContext._jsc.hadoopConfiguration()
assert hconf.get("fs.s3a.access.key") == "ak"
assert hconf.get("fs.s3a.secret.key") == "sk"
assert hconf.get("fs.s3a.endpoint") == "http://minio.local:9000"
assert hconf.get("fs.s3a.path.style.access") == "true"
hconf.set("fs.s3a.impl", "qps.FakeS3FileSystem")

url = "s3a://test-bucket" + data_dir + "/t"
spark.createDataFrame(
    [(i, "r%d" % i) for i in range(100)], "id long, name string"
).repartition(2).write.mode("overwrite").parquet(url)

# user-facing s3:// spelling resolves through the same mapping the
# /query read_parquet('s3://…') rewrite uses
back = spark.read.parquet(resolve_scan_path("s3://test-bucket" + data_dir + "/t"))
assert back.count() == 100
assert back.selectExpr("sum(id) AS s").collect()[0]["s"] == 4950
print("S3_SMOKE_OK")
spark.stop()
"""


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK for the s3a stub")
def test_s3a_roundtrip_with_stub_filesystem(tmp_path):
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hadoop_api = next(
        (
            os.path.join(jars, j)
            for j in os.listdir(jars)
            if j.startswith("hadoop-client-api")
        ),
        None,
    )
    assert hadoop_api, "pyspark ships hadoop-client-api"

    src = tmp_path / "qps" / "FakeS3FileSystem.java"
    src.parent.mkdir()
    src.write_text(_JAVA_SRC)
    classes = tmp_path / "classes"
    classes.mkdir()
    subprocess.run(
        ["javac", "-cp", hadoop_api, "-d", str(classes), str(src)],
        check=True,
        capture_output=True,
    )

    data_dir = tmp_path / "bucketdata"
    data_dir.mkdir()
    script = tmp_path / "roundtrip.py"
    script.write_text(_SUBPROC)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, str(script), str(classes), str(data_dir)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "S3_SMOKE_OK" in proc.stdout
    # the stub dropped the bucket and landed the parquet on local disk —
    # proof the committer ran through the s3a FileSystem, not file://
    out = data_dir / "t"
    assert any(f.endswith(".parquet") for f in os.listdir(out)), os.listdir(out)
