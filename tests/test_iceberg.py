"""Iceberg posture: DDL/conf emission + the bucketed stand-in path.

The container has no Iceberg runtime jar, so the real path is exercised
as emitted DDL/conf (string-level assertions) while the stand-in path —
the one the scaling bench measures — is executed for real: write the
clustered+sorted table, read it back, and prove the flagship feature
plan over it is shuffle-free.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sparkfeat.iceberg import (
    ICEBERG_EXTENSIONS,
    iceberg_available,
    iceberg_session_conf,
    transcript_table_ddl,
    write_transcripts,
)


def test_iceberg_ddl_layout():
    stmts = transcript_table_ddl("cat.db.transcripts", buckets=256)
    assert len(stmts) == 2
    create, order = stmts
    assert "USING iceberg" in create
    assert "PARTITIONED BY (bucket(256, conv_id))" in create
    assert "'write.distribution-mode'='hash'" in create
    assert order == (
        "ALTER TABLE cat.db.transcripts WRITE ORDERED BY (conv_id, ts, turn_idx)"
    )


def test_standin_ddl_layout():
    (stmt,) = transcript_table_ddl("t", buckets=64, iceberg=False, location="/x")
    assert "USING parquet" in stmt
    assert "CLUSTERED BY (conv_id)" in stmt
    assert "SORTED BY (conv_id, ts, turn_idx) INTO 64 BUCKETS" in stmt
    assert stmt.endswith("LOCATION '/x'")


def test_session_conf_block():
    conf = iceberg_session_conf(catalog="c", warehouse="/wh")
    assert conf["spark.sql.extensions"] == ICEBERG_EXTENSIONS
    assert conf["spark.sql.catalog.c.type"] == "hadoop"
    assert conf["spark.sql.catalog.c.warehouse"] == "/wh"


def test_standin_write_read_and_shuffle_free_plan(spark, transcripts, tmp_path):
    """write_transcripts (stand-in) round-trips rows exactly, and the
    flagship feature plan over the bucketed table needs no exchange —
    the property the Iceberg bucket(conv_id)+sort layout buys at 100 TB."""
    from sparkfeat.pipeline import flagship_features

    name = "iceberg_standin_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    used_iceberg = write_transcripts(
        transcripts, name, buckets=8, location=str(tmp_path / "tbl")
    )
    assert used_iceberg is iceberg_available(spark)

    tbl = spark.table(name)
    assert tbl.count() == transcripts.count()
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    # (north-rule invariant: the layout write must not disturb a byte)
    mismatch = (
        tbl.alias("a")
        .join(transcripts.alias("b"), ["conv_id", "turn_idx"])
        .where(F.col("a.text") != F.col("b.text"))
        .count()
    )
    assert mismatch == 0

    from test_plans import plan_of

    plan = plan_of(flagship_features(tbl, pre_partitioned=True))
    assert not re.search(r"Exchange hashpartitioning", plan), plan
    spark.sql(f"DROP TABLE IF EXISTS {name}")
