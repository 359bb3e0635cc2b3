"""Stdlib S3 seam for the Python-side streaming readers.

The reference reads object-store URIs through fsspec (s3fs/gcsfs/adlfs,
``json_reader.py:42`` via ``fsspec.get_fs_token_paths``). In this
engine the JVM readers (parquet/csv/jsonl/multiLine-json/xml) take the
Hadoop connector path (``s3a://`` + hadoop-aws, see
``pipeline.load_source``); the two Python-side streaming readers
(giant-array ``json_array``, xlsx) need their own object-store client.

This module is that client, stdlib-only, speaking the public S3 REST
API (GET object, path-style addressing) against the endpoint named by
the standard AWS SDK environment variables ``AWS_ENDPOINT_URL_S3`` /
``AWS_ENDPOINT_URL`` — the documented way every AWS SDK since 2023
points at S3-compatible stores (MinIO, localstack, Ceph RGW, on-prem
gateways). Requests are UNSIGNED (anonymous GET): the seam targets
in-VPC S3-compatible endpoints and tests; against real private AWS S3
buckets, use the JVM s3a connector (which carries full SigV4 +
credential-provider support) or install s3fs — if s3fs IS importable
it is preferred automatically, matching the reference's stack.

Scale note: these Python readers stream one object per input
partition with O(read_size) memory (json_array) or one in-memory
workbook (xlsx — bounded by format, not by us). Object-store LISTing
(directory fan-out) is deliberately NOT implemented here: glob
expansion over buckets belongs to the JVM scan (or an explicit
manifest), so ``json_paths`` passes object URIs through verbatim.
"""

from __future__ import annotations

import io
import os
import time
import urllib.error
import urllib.request
from urllib.parse import quote, urlparse

_S3_SCHEMES = {"s3", "s3a", "s3n"}


_S3_ENV_VARS = ("AWS_ENDPOINT_URL_S3", "AWS_ENDPOINT_URL")


def configured_endpoint() -> str | None:
    """The endpoint from the standard AWS SDK env vars, or None.
    Called driver-side so the value can be forwarded into DataSource
    options — planning and reading both run in Python workers forked
    before the driver may have set the vars."""
    for k in _S3_ENV_VARS:
        v = os.environ.get(k)
        if v:
            return v
    return None


def is_s3_uri(path: str) -> bool:
    scheme, sep, _ = path.partition("://")
    return bool(sep) and scheme.lower() in _S3_SCHEMES


def s3_endpoint() -> str:
    """Endpoint from the standard AWS SDK env vars (service-specific
    first, then global), e.g. ``http://minio.internal:9000``."""
    ep = os.environ.get("AWS_ENDPOINT_URL_S3") or os.environ.get(
        "AWS_ENDPOINT_URL"
    )
    if not ep:
        raise OSError(
            "object-store URI but no S3 endpoint configured: set "
            "AWS_ENDPOINT_URL_S3 (or AWS_ENDPOINT_URL) to your "
            "S3-compatible endpoint, install s3fs, or use the JVM "
            "s3a:// connector (hadoop-aws) for private AWS buckets"
        )
    return ep.rstrip("/")


def _bucket_key(uri: str) -> tuple[str, str]:
    p = urlparse(uri)
    return p.netloc, p.path.lstrip("/")


_GET_RETRIES = 3  # bounded like the sink's chunk retry (sink.py)


def open_s3_binary(uri: str):
    """Streaming binary reader for one object. Prefers s3fs when
    importable (full auth); otherwise anonymous path-style GET against
    the configured endpoint, with bounded retry on transient failures
    (5xx / connection resets — at fleet scale some GETs always flake;
    4xx are permanent and raise immediately). Returns a file-like
    (non-seekable on the stdlib path — callers needing random access
    use fetch_bytes)."""
    try:  # the reference's stack, when present
        import s3fs  # type: ignore

        return s3fs.S3FileSystem().open(uri, "rb")
    except ImportError:
        pass
    bucket, key = _bucket_key(uri)
    # Percent-encode per the S3 REST API: keys may contain spaces,
    # '#', '?', '+', … which would otherwise truncate or corrupt the
    # request path ('/' stays — it separates key segments).
    url = f"{s3_endpoint()}/{quote(bucket, safe='')}/{quote(key, safe='/')}"
    last: Exception | None = None
    for attempt in range(_GET_RETRIES):
        try:
            return urllib.request.urlopen(url)
        except urllib.error.HTTPError as e:
            if e.code < 500:
                raise  # permanent: 403/404/…
            last = e
        except urllib.error.URLError as e:
            last = e
        time.sleep(0.05 * (2**attempt))
    raise OSError(f"S3 GET failed after {_GET_RETRIES} attempts: {url}") from last


def fetch_bytes(uri: str) -> bytes:
    """Whole object as bytes — for seekable consumers (zipfile/xlsx)."""
    with open_s3_binary(uri) as f:
        return f.read()


def open_uri_text(path: str, encoding: str = "utf-8"):
    """Text-mode open for local paths, ``file://`` URIs, and s3 URIs —
    the single IO entry the streaming json_array parser uses."""
    if is_s3_uri(path):
        return io.TextIOWrapper(open_s3_binary(path), encoding=encoding)
    from .json_source import local_path

    return open(local_path(path), "r", encoding=encoding)
