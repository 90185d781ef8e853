"""Object-store configuration (reference S6/S7: MinIO client +
storage-options builder, delta-writer/src/storage/minio_client.py:16-291 and
main.py:19-43).

Spark's Hadoop S3A connector replaces the reference's hand-rolled async
MinIO client entirely — put/get/list/retry/pooling are all inside S3A.
This helper just maps the reference's env-driven storage options onto the
``fs.s3a.*`` configs, including the MinIO specifics (path-style access,
custom endpoint, no SSL for local stacks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def configure_s3(
    spark: SparkSession,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
    ssl: bool | None = None,
) -> dict[str, str]:
    """Apply S3/MinIO connection configs (reference build_storage_options,
    main.py:19-43: AWS_ENDPOINT_URL/ACCESS_KEY/SECRET, allow_http).

    Falls back to the same environment variables the reference reads.
    Returns the applied config map (secrets redacted)."""
    endpoint = endpoint or os.environ.get("AWS_ENDPOINT_URL")
    access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID")
    secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY")
    if ssl is None:
        ssl = not (endpoint or "").startswith("http://")

    conf = {}
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if access_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
    if secret_key:
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
    conf["spark.hadoop.fs.s3a.path.style.access"] = str(path_style).lower()
    conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] = str(ssl).lower()
    # retries/pooling: S3A's built-in equivalents of the reference's
    # adaptive-retry MinIO client defaults
    conf.setdefault("spark.hadoop.fs.s3a.attempts.maximum", "10")
    conf.setdefault("spark.hadoop.fs.s3a.connection.maximum", "64")

    for k, v in conf.items():
        spark.conf.set(k, v)
    redacted = dict(conf)
    if "spark.hadoop.fs.s3a.secret.key" in redacted:
        redacted["spark.hadoop.fs.s3a.secret.key"] = "***"
    return redacted
