"""Iceberg table posture for the transcript engine.

The north rule targets an **Iceberg table** of conversation transcripts.
The layout that makes the engine shuffle-free is::

    PARTITIONED BY (bucket(N, conv_id))         -- co-locate conversations
    WRITE ORDERED BY (conv_id, ts, turn_idx)    -- sort within data files

With that layout every per-conversation stage (windows, as-of sort-merge,
sessionize, EWMA kernels) reads pre-clustered, pre-sorted splits and the
engine's single ``hash(conv_id)`` exchange disappears
(``flagship_features(pre_partitioned=True)``; asserted shuffle-free in
``tests/test_iceberg.py`` and measured in ``scripts/scaling_bench.py``).

This container ships no Iceberg runtime jar, so the module degrades
explicitly rather than pretending:

* :func:`iceberg_available` probes the JVM for the Iceberg Spark
  extensions class.
* :func:`iceberg_session_conf` returns the spark-submit conf block a
  real cluster passes (``--conf`` / ``spark-defaults``): extensions +
  a Hadoop catalog + warehouse path.
* :func:`transcript_table_ddl` emits the real Iceberg DDL (CREATE +
  ALTER ... WRITE ORDERED BY) **and** the bucketed-sorted parquet
  stand-in DDL (``CLUSTERED BY (conv_id) SORTED BY (conv_id, ts,
  turn_idx)``) — the stand-in gives Spark's planner the same clustering
  + ordering guarantees, which is exactly what the scaling bench runs
  on.
* :func:`create_transcript_table` / :func:`write_transcripts` pick the
  Iceberg path when the runtime is present and the stand-in otherwise,
  so callers write one code path and inherit the real thing on a
  cluster with the jar.

Reference mapping: the reference reads pre-pivoted HDF5/CSV frames into
pandas (tests/helpers.py:28-52, transformation/financial.py:68-101);
its "table layout" is a wide in-memory DataFrame per data source. The
Iceberg spec here is the 10^12-turn replacement for that load step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_EXTENSIONS = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"

TRANSCRIPT_COLS = (
    "conv_id STRING, turn_idx INT, role STRING, text STRING, "
    "tool STRING, ts TIMESTAMP_NTZ"
)
SORT_ORDER = ("conv_id", "ts", "turn_idx")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_EXTENSIONS)  # noqa: SLF001
        return True
    except Exception:
        return False


def iceberg_session_conf(
    catalog: str = "feat", warehouse: str = "/warehouse/feat"
) -> dict[str, str]:
    """The conf block for a real cluster (pass via spark-submit --conf).

    A Hadoop catalog keeps the example self-contained; production swaps
    ``type=hadoop`` for a REST/Glue/Hive catalog without touching any
    engine code (only table identifiers change).
    """
    return {
        "spark.sql.extensions": ICEBERG_EXTENSIONS,
        f"spark.sql.catalog.{catalog}": ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def transcript_table_ddl(
    name: str = "transcripts",
    buckets: int = 256,
    iceberg: bool = True,
    location: str | None = None,
) -> list[str]:
    """DDL statements for the transcript table in the target layout.

    ``iceberg=True``: real Iceberg — hidden bucket partitioning plus a
    table-level write sort order (data files arrive sorted, so scans
    expose the order without a sort).  ``iceberg=False``: the parquet
    stand-in — Spark bucketed table with an explicit SORTED BY; same
    planner guarantees, no Iceberg runtime needed.
    """
    if iceberg:
        return [
            f"CREATE TABLE IF NOT EXISTS {name} ({TRANSCRIPT_COLS}) "
            f"USING iceberg PARTITIONED BY (bucket({buckets}, conv_id)) "
            "TBLPROPERTIES ('write.distribution-mode'='hash', "
            "'format-version'='2')",
            f"ALTER TABLE {name} WRITE ORDERED BY ({', '.join(SORT_ORDER)})",
        ]
    loc = f" LOCATION '{location}'" if location else ""
    return [
        f"CREATE TABLE IF NOT EXISTS {name} ({TRANSCRIPT_COLS}) "
        f"USING parquet CLUSTERED BY (conv_id) "
        f"SORTED BY ({', '.join(SORT_ORDER)}) INTO {buckets} BUCKETS{loc}"
    ]


def create_transcript_table(
    spark: SparkSession,
    name: str = "transcripts",
    buckets: int = 256,
    location: str | None = None,
    force_standin: bool = False,
) -> bool:
    """Create the table; returns True if the real Iceberg path was used."""
    use_iceberg = iceberg_available(spark) and not force_standin
    for stmt in transcript_table_ddl(name, buckets, use_iceberg, location):
        spark.sql(stmt)
    return use_iceberg


def write_transcripts(
    df: DataFrame,
    name: str = "transcripts",
    buckets: int = 256,
    location: str | None = None,
    force_standin: bool = False,
) -> bool:
    """Write transcripts into the clustered+sorted layout (append).

    Iceberg path: ``writeTo(...).append()`` — the table's distribution
    mode + sort order shape the files (one shuffle, done by the writer).
    Stand-in path: explicit ``repartition(conv_id).bucketBy.sortBy`` —
    the same one shuffle, spelled out.  Either way, downstream feature
    jobs run ``pre_partitioned=True`` and plan zero exchanges.
    """
    spark = df.sparkSession
    use_iceberg = iceberg_available(spark) and not force_standin
    if use_iceberg:
        create_transcript_table(spark, name, buckets, location)
        df.writeTo(name).append()
    else:
        # bucketBy/sortBy saveAsTable owns table creation on this path
        # (appends re-check the bucket spec); repartition on the bucket
        # column first so each task writes to one bucket file instead of
        # fanning out a file per (task, bucket).
        w = (
            df.repartition(buckets, "conv_id")
            .write.mode("append")
            .format("parquet")
            .bucketBy(buckets, "conv_id")
            .sortBy(*SORT_ORDER)
        )
        if location:
            w = w.option("path", location)
        w.saveAsTable(name)
    return use_iceberg
