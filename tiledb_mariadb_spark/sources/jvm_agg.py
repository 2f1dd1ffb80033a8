"""JVM aggregate-pushdown shim: build + registration.

The one group_by_handler behavior (TileDB-MariaDB
mytile/ha_mytile.cc:607-715) unreachable from plain SQL over the Python
datasource is aggregate pushdown — the Python DataSource API exposes no
``SupportsPushDownAggregates`` hook, so ``SELECT COUNT(*)`` over
``format("tiledb_native")`` full-scans (COVERAGE.md q310 note).  This
module compiles ``java/TileDBAggDataSource.java`` against the installed
pyspark jars (plain ``javac``, no build system) and loads it into the
session with ``ADD JAR``, after which

    spark.read.format("tiledb_agg").option("path", uri)...

answers ungrouped COUNT(*) / MIN / MAX / SUM entirely from fragment
metadata (zero data tiles decoded — the decode-poison test corrupts
every data file and the aggregates still come back), falling back to an
honest bridge row-scan when the metadata trust rules cannot prove the
value.  The fast scan path remains ``format("tiledb_native")``; this
format exists for the aggregate contract.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)
)))
_JAVA_SRC = os.path.join(_REPO, "java", "TileDBAggDataSource.java")
_SERVICE = "org.apache.spark.sql.sources.DataSourceRegister"


def _pyspark_jars() -> str:
    import pyspark  # noqa: PLC0415

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def ensure_agg_jar(build_dir: str | None = None) -> str:
    """Compile the shim into ``build/jvm/tiledb_agg.jar`` (cached by
    source mtime).  Needs a JDK (javac + jar) — raises RuntimeError
    with the compiler output otherwise."""
    build_dir = build_dir or os.path.join(_REPO, "build", "jvm")
    jar_path = os.path.join(build_dir, "tiledb_agg.jar")
    if (
        os.path.isfile(jar_path)
        and os.path.getmtime(jar_path) >= os.path.getmtime(_JAVA_SRC)
    ):
        return jar_path
    classes = os.path.join(build_dir, "classes")
    os.makedirs(classes, exist_ok=True)
    meta = os.path.join(build_dir, "META-INF", "services")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, _SERVICE), "w") as f:
        f.write("TileDBAggDataSource\n")
    cp = os.path.join(_pyspark_jars(), "*")
    tmp_jar = jar_path + f".tmp.{os.getpid()}"
    for argv in (
        ["javac", "-cp", cp, "-d", classes, _JAVA_SRC],
        ["jar", "cf", tmp_jar, "-C", classes, ".",
         "-C", build_dir, "META-INF"],
    ):
        r = subprocess.run(argv, capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(
                f"jvm_agg build failed ({argv[0]}): {r.stderr[:2000]}"
            )
    os.replace(tmp_jar, jar_path)  # concurrent builders: atomic publish
    return jar_path


_REGISTERED: set = set()


def register_tiledb_agg(spark) -> None:
    """Compile if needed and ADD JAR into this session (idempotent)."""
    jar = ensure_agg_jar()
    key = (id(spark.sparkContext), jar)
    if key in _REGISTERED:
        return
    spark.sql(f"ADD JAR 'file://{jar}'")
    _REGISTERED.add(key)


def agg_reader(spark, uri: str, **options):
    """A DataFrameReader for ``format("tiledb_agg")`` preconfigured
    with this interpreter + repo (the Java side subprocesses back into
    the Python decoder)."""
    register_tiledb_agg(spark)
    r = (
        spark.read.format("tiledb_agg")
        .option("path", uri)
        .option("python", sys.executable)
        .option("pythonpath", _REPO)
    )
    for k, v in options.items():
        r = r.option(k, str(v))
    return r
