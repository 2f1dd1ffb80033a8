"""Remote-URI + storage-configuration surface — the PySpark analog of the
reference's ``tiledb_config`` session variable (mytile/mytile-sysvars.cc:
61-66, a comma-separated ``key=value`` list handed to the TileDB context)
and its accepted URI schemes (mytile/ha_mytile.cc:1178-1182: ``s3://``,
``azure://``, ``gcs://``, ``tiledb://`` bypass local-path resolution).

Spark's equivalent of a VFS config is the Hadoop configuration: TileDB
VFS keys map onto ``fs.s3a.*`` / ``fs.azure.*`` / ``fs.gs.*`` properties,
and anything already namespaced (``fs.*``, ``spark.hadoop.*``) passes
through verbatim.  ``apply_storage_options`` sets them on the session's
Hadoop configuration so every subsequent read/write of the table sees
them — the same session scope the sysvar has.

Secrets are never persisted: ``persistable_options`` strips credential
keys before a map is written into a table sidecar, so re-opened tables
recover endpoints/regions but credentials always arrive at runtime.

The sandbox has no object store, so remote reads cannot execute here —
but the scheme parsing, option mapping, and Hadoop-conf plumbing are the
real production path and are unit-tested against the local filesystem
(``file://``) plus mock config assertions (tests/test_storage_options.py).
"""

from __future__ import annotations

from typing import Optional

# ha_mytile.cc:1178-1182 — URIs the reference refuses to treat as local
# paths; tiledb:// is the REST/cloud scheme.
REMOTE_SCHEMES = ("s3", "s3a", "azure", "abfs", "abfss", "gcs", "gs", "tiledb")

# TileDB VFS config keys (documented public config names) → Hadoop
# connector properties.  use_virtual_addressing is INVERTED into s3a's
# path-style flag.
_TILEDB_TO_HADOOP = {
    "vfs.s3.aws_access_key_id": "fs.s3a.access.key",
    "vfs.s3.aws_secret_access_key": "fs.s3a.secret.key",
    "vfs.s3.aws_session_token": "fs.s3a.session.token",
    "vfs.s3.region": "fs.s3a.endpoint.region",
    "vfs.s3.endpoint_override": "fs.s3a.endpoint",
    "vfs.s3.connect_timeout_ms": "fs.s3a.connection.timeout",
    "vfs.s3.request_timeout_ms": "fs.s3a.connection.request.timeout",
    "vfs.s3.max_parallel_ops": "fs.s3a.connection.maximum",
    "vfs.s3.scheme": "fs.s3a.connection.ssl.enabled",  # https → true
    "vfs.azure.storage_account_name": "fs.azure.account.name",
    "vfs.azure.storage_account_key": "fs.azure.account.key",
    "vfs.gcs.project_id": "fs.gs.project.id",
}

_SECRET_MARKERS = ("secret", "password", "token", "account_key", "key_id")


def parse_uri(uri: str) -> tuple[str, str]:
    """Split a table URI into (scheme, path).  ``file://`` URIs resolve
    to the local path; a bare path has scheme ''."""
    if "://" not in uri:
        return "", uri
    scheme, rest = uri.split("://", 1)
    scheme = scheme.lower()
    if scheme == "file":
        return "", "/" + rest.lstrip("/") if not rest.startswith("/") else rest
    return scheme, uri


def is_remote(uri: str) -> bool:
    return parse_uri(uri)[0] in REMOTE_SCHEMES


def require_local(uri: str) -> str:
    """Refuse a remote-scheme URI LOUDLY at open (never a downstream
    path failure), with a scheme-specific reason.  ``tiledb://`` is the
    TileDB REST/cloud scheme (ha_mytile.cc:1178-1182) — a different
    deployment gap (REST client + auth) than the object-store schemes
    (Hadoop connector + conditional-put commit).  Returns the local
    path for accepted URIs."""
    scheme, path = parse_uri(uri)
    if scheme == "tiledb":
        raise NotImplementedError(
            f"{uri!r}: the tiledb:// REST scheme is not supported — "
            "this build has no TileDB REST client (requires network + "
            "API-token auth); open the array by its storage URI instead"
        )
    if scheme in REMOTE_SCHEMES:
        raise NotImplementedError(
            f"remote scheme {scheme}:// requires an object-store "
            "deployment (Hadoop connector + conditional-put commit); "
            "unavailable in this environment"
        )
    return path


def to_hadoop_options(options: dict) -> dict:
    """Translate a tiledb_config-style map to Hadoop properties.  Keys
    already namespaced (``fs.*`` / ``spark.hadoop.*``) pass through
    (``spark.hadoop.`` prefix stripped); unknown ``vfs.*`` keys raise —
    silently dropping a credential or endpoint is worse than failing."""
    out = {}
    for k, v in options.items():
        if k in _TILEDB_TO_HADOOP:
            if k == "vfs.s3.scheme":
                v = "true" if str(v).lower() == "https" else "false"
            out[_TILEDB_TO_HADOOP[k]] = str(v)
        elif k == "vfs.s3.use_virtual_addressing":
            out["fs.s3a.path.style.access"] = (
                "false" if str(v).lower() == "true" else "true"
            )
        elif k.startswith("fs."):
            out[k] = str(v)
        elif k.startswith("spark.hadoop."):
            out[k[len("spark.hadoop.") :]] = str(v)
        else:
            raise ValueError(f"unknown storage option {k!r}")
    return out


def apply_storage_options(spark, options: Optional[dict]) -> dict:
    """Set the translated properties on the session's Hadoop config
    (session scope — exactly the sysvar's lifetime).  Returns the
    applied map for auditing/tests."""
    if not options:
        return {}
    hadoop = to_hadoop_options(options)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in hadoop.items():
        conf.set(k, v)
    return hadoop


def persistable_options(options: Optional[dict]) -> dict:
    """The subset of a storage-option map safe to write into a table
    sidecar: endpoints, regions, tuning — never credentials."""
    if not options:
        return {}
    return {
        k: v
        for k, v in options.items()
        if not any(m in k.lower() for m in _SECRET_MARKERS)
    }
