"""Remote parquet sources: http(s) fetch-and-cache + s3a configuration.

The reference reads parquet straight off HTTPS and S3 through DuckDB's
httpfs (BENCHMARK.md:11 ``read_parquet('https://…')``;
merge_service_s3.go:99-109 ``CREATE SECRET (TYPE S3, …)``). Spark has
native ``s3a://`` support via hadoop-aws; plain http(s) it does not —
those URLs are fetched once to a local cache (driver-side; the files in
question are single benchmark/reference datasets, not table storage) and
read from there. ``rewrite_sql``'s ``read_parquet('https://…')`` rewrite
routes through this cache.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import uuid

# Per-user cache dir, created 0700: a SHARED world-writable /tmp path with
# content-addressed names would let any local user pre-plant a file that
# os.path.exists() then serves forever as the "fetched" dataset.
CACHE_DIR = os.environ.get(
    "QPS_HTTP_CACHE", f"/tmp/quackpipe_spark_http_cache_{os.getuid()}"
)


def _ensure_cache_dir() -> None:
    os.makedirs(CACHE_DIR, mode=0o700, exist_ok=True)
    st = os.stat(CACHE_DIR)
    if st.st_uid != os.getuid():
        raise PermissionError(
            f"http cache dir {CACHE_DIR} is owned by uid {st.st_uid}, not us — "
            "refusing to serve files another user controls (set QPS_HTTP_CACHE)"
        )
    if st.st_mode & 0o022:
        # a pre-existing user-owned but group/world-WRITABLE dir defeats
        # the pre-planting protection just as surely as wrong ownership:
        # anyone could drop the sha256-named file we then serve forever
        raise PermissionError(
            f"http cache dir {CACHE_DIR} is group/world-writable "
            f"(mode {oct(st.st_mode & 0o777)}) — chmod 700 it or set "
            "QPS_HTTP_CACHE to a private directory"
        )


def fetch_to_cache(url: str, timeout: float = 120.0) -> str:
    """Download an http(s) parquet once; return the local path (atomic:
    tmp + rename; concurrent fetchers each write a UNIQUE tmp and the
    last complete download wins the rename — a pid-keyed tmp would let
    two threads in one process truncate each other mid-download and
    publish interleaved bytes)."""
    _ensure_cache_dir()
    name = hashlib.sha256(url.encode()).hexdigest()[:24] + ".parquet"
    dst = os.path.join(CACHE_DIR, name)
    if os.path.exists(dst):
        return dst
    tmp = dst + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(tmp, "wb") as f:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dst)
    except BaseException:
        # a failed/interrupted download must not leave a partial .tmp
        # accumulating in the cache dir (retries use a fresh unique suffix)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return dst


def resolve_scan_path(path: str) -> str:
    """Map a user-facing scan URL to something Spark can read directly.

    http(s) URLs fetch into a DRIVER-LOCAL cache — readable by executors
    only when they share the driver's filesystem (local[*], the
    engine's deployment). On a multi-node master the rewritten path
    would not exist on the workers (or worse, a stale same-named file
    would be silently read as the dataset), so the resolution refuses
    loudly there (review r14); distributed fetch belongs to a shared
    filesystem or the s3a connector."""
    if path.startswith(("http://", "https://")):
        master = ""
        try:
            from pyspark.sql import SparkSession

            sess = SparkSession.getActiveSession()
            if sess is not None:
                master = sess.conf.get("spark.master", "")
        except Exception:
            master = ""  # no session shape to consult → keep local behavior
        if master and not master.startswith("local"):
            raise ValueError(
                f"read_parquet over http(s) uses a driver-local download "
                f"cache, which executors on master {master!r} cannot "
                "read; stage the file on a shared filesystem or use "
                "s3://"
            )
        return fetch_to_cache(path)
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def configure_s3(
    spark,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style: bool = True,
) -> None:
    """Set fs.s3a.* credentials on the session — the Spark analogue of the
    reference's CREATE SECRET (TYPE S3) (merge_service_s3.go:99-109).
    Requires the hadoop-aws jars on the classpath (cluster deployments);
    this helper only sets configuration."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.path.style.access", "true" if path_style else "false")
