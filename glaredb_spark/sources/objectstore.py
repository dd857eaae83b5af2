"""S3 / GCS object-store read support, gated on connector availability.

Reference surface: crates/glaredb_http/src/{s3,gcs,filesystem}.rs — the
reference ships native S3/GCS clients (AWS SigV4 signing, GCS bearer
tokens) and tests them against public buckets (slt/s3/public, slt/gcs).

Spark-side, object stores are Hadoop FileSystem implementations:
``s3a://`` needs the hadoop-aws jar (+ aws-sdk-bundle), ``gs://`` needs
the gcs-connector jar. This container ships neither, so every entry point
probes the classpath first and raises one clear, actionable error instead
of Hadoop's deep "No FileSystem for scheme" stack. ``s3://`` URLs are
rewritten to ``s3a://`` (the maintained Hadoop S3 client — s3:// and
s3n:// are legacy aliases users still write; the reference accepts
``s3://`` directly, s3.rs).

At 100 TB this is the PRIMARY read path: split planning, multipart
parallel reads, and committer semantics all come from the Hadoop
connector, identical to local parquet from the planner's point of view —
every pushdown/pruning property asserted in test_plans.py carries over
unchanged. Anonymous public-bucket access mirrors the reference's
unsigned-request mode (slt/s3/public) via
``fs.s3a.aws.credentials.provider = AnonymousAWSCredentialsProvider``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_S3A_CLASS = "org.apache.hadoop.fs.s3a.S3AFileSystem"
_GCS_CLASS = "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"

_HELP = {
    "s3a": (
        _S3A_CLASS,
        "S3 connector not on the classpath. Add hadoop-aws + the AWS SDK "
        "bundle (e.g. --packages org.apache.hadoop:hadoop-aws:3.4.1) and "
        "configure credentials (fs.s3a.access.key/fs.s3a.secret.key, an "
        "instance profile, or fs.s3a.aws.credentials.provider="
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider for "
        "public buckets) to enable s3:// reads.",
    ),
    "gs": (
        _GCS_CLASS,
        "GCS connector not on the classpath. Add the gcs-connector jar "
        "(e.g. --jars gcs-connector-hadoop3-latest.jar) and configure "
        "google.cloud.auth credentials to enable gs:// reads.",
    ),
}


def _jvm_class_exists(spark: SparkSession, name: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(name)
        return True
    except Exception:
        return False


def s3_available(spark: SparkSession) -> bool:
    return _jvm_class_exists(spark, _S3A_CLASS)


def gcs_available(spark: SparkSession) -> bool:
    return _jvm_class_exists(spark, _GCS_CLASS)


def object_store_scheme(path: str) -> str | None:
    """The object-store scheme of ``path`` normalized to its Hadoop form
    (s3/s3n/s3a → s3a, gs → gs), or None for non-object-store paths."""
    scheme = path.split("://", 1)[0].lower() if "://" in path else ""
    if scheme in ("s3", "s3n", "s3a"):
        return "s3a"
    if scheme == "gs":
        return "gs"
    return None


def normalize_path(path: str) -> str:
    """Rewrite legacy s3://, s3n:// URLs to s3a:// for Hadoop."""
    scheme = path.split("://", 1)[0].lower() if "://" in path else ""
    if scheme in ("s3", "s3n"):
        return "s3a://" + path.split("://", 1)[1]
    return path


_S3_CACHE: dict[str, str] = {}


def _boto3_localize(path: str) -> str:
    """Driver-side S3 fetch via boto3 into a local cache file.

    FALLBACK path only: used when the hadoop-aws jar is absent but boto3
    is importable. Correct for small objects and metadata reads; the s3a
    Hadoop connector (split planning, multipart parallel reads, executor-
    side IO) remains the 100 TB path and is preferred whenever its jar is
    on the classpath. Endpoint/credentials come from the standard AWS env
    (AWS_ENDPOINT_URL for S3-compatible stores like minio/moto)."""
    if path in _S3_CACHE:
        return _S3_CACHE[path]
    import os
    import tempfile

    import boto3

    bucket, key = path.split("://", 1)[1].split("/", 1)
    endpoint = os.environ.get("AWS_ENDPOINT_URL")
    s3 = boto3.client("s3", endpoint_url=endpoint)
    fd, local = tempfile.mkstemp(
        prefix="glaredb_s3_", suffix="_" + os.path.basename(key)
    )
    os.close(fd)
    s3.download_file(bucket, key, local)
    _S3_CACHE[path] = local
    return local


def ensure_object_store(spark: SparkSession, path: str) -> str:
    """Validate connector availability for an object-store path and return
    the normalized (s3a/gs) path — or, for S3 without the hadoop-aws jar
    but with boto3 present, a locally cached copy (driver-side fallback;
    see _boto3_localize). No-op passthrough for other paths."""
    scheme = object_store_scheme(path)
    if scheme is None:
        return path
    cls, help_msg = _HELP[scheme]
    if not _jvm_class_exists(spark, cls):
        if scheme == "s3a":
            try:
                import boto3  # noqa: F401

                return _boto3_localize(path)
            except ImportError:
                pass
        raise RuntimeError(help_msg)
    return normalize_path(path)
