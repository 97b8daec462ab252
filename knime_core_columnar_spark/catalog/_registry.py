"""Query catalog: every implemented operator exposed as a (spark, sf_dir) →
DataFrame callable plus a DuckDB-equivalent ANSI-SQL oracle.

This is the correctness surface for SURVEY.md §2 — the driver executes each
``QUERIES[name]`` and the matching ``ORACLES[name]`` side by side and
compares row count + schema + order-insensitive value hash.

Determinism rules (doubles are NOT bit-stable under reordered reduction):
- exact sums: cast to decimal before SUM, cast the exact result to double;
- averages: exact-decimal sum cast to double, then IEEE double division;
- per-row double arithmetic is deterministic and fine;
- no double→int casts (Spark truncates, DuckDB rounds), no double→string;
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_PKG_SHIPPED: set[int] = set()


def _ensure_pkg_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor python workers via addPyFile.

    Queries that use pandas UDFs / mapInPandas reference module-level
    kernels; cloudpickle serializes those BY REFERENCE when the module is
    importable on the driver, so executors must be able to import the
    package too. When the harness runs from a foreign cwd (driver-style
    file-path import), workers would otherwise fail with
    ModuleNotFoundError. A zip of the package added per-SparkContext
    fixes this everywhere (local and cluster mode alike)."""
    key = id(spark.sparkContext)
    if key in _PKG_SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    # the TOP-LEVEL package dir (this file lives in the catalog/
    # subpackage since the round-6 split — one more dirname up)
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(tempfile.gettempdir(), "knime_core_columnar_spark_pkg.zip")
    tmp = zpath + f".{os.getpid()}.part"
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    _PKG_SHIPPED.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_pkg_on_executors(spark)
    # Runtime-settable confs forced here instead of relying on session
    # defaults — the harness builds its own SparkSession without our
    # session.py. UTC makes every ntz<->instant cast (unix_micros etc.)
    # timezone-independent, matching the timezone-free DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which vanilla Spark 4
        # refuses (PARQUET_TYPE_ILLEGAL).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as long via nanosAsLong — restore
        # timestamp_ntz at micro precision (what DuckDB reads natively).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    return df


def _parquet_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count from the Parquet footer — a driver-side metadata
    read (no Spark job, no data scan). Used to feed operators whose tier
    or seed selection needs the corpus size (kmeans_lite,
    embedding_near_dup_pairs) so they never spend a counting scan.
    Returns None for non-local paths so callers fall back to count()."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isdir(path):
            import pyarrow.dataset as ds

            return sum(
                f.metadata.num_rows
                for f in ds.dataset(path, format="parquet").get_fragments()
            )
        import pyarrow.parquet as pq

        return pq.read_metadata(path).num_rows
    except Exception:
        return None


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _artifact_tag(sf_dir: str, *tables: str) -> str:
    """Cache tag for derived /tmp artifacts (bucketed tables, CSV
    exports, partitioned copies): hashes the source PATH and the source
    files' MTIMES, so regenerated testdata at the same path gets a fresh
    artifact instead of silently reusing a stale copy."""
    import hashlib
    import os

    parts = [sf_dir]
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        try:
            parts.append(f"{t}:{os.path.getmtime(p)}")
        except OSError:
            parts.append(f"{t}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _publish_dir(tmp: str, final: str) -> None:
    """Atomically publish a staged artifact directory; if a concurrent
    session won the rename race, keep theirs (same content by tag)."""
    import os
    import shutil

    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.isdir(final):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise


