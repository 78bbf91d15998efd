from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from sparkfeat.session import get_spark

    s = get_spark("sparkfeat-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from sparkfeat.schema import synth_transcripts_pdf

    return synth_transcripts_pdf(n_convs=6, turns_per_conv=[5, 40, 40, 80, 1, 200], seed=11)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_pdf):
    import pandas as pd

    from sparkfeat.schema import TRANSCRIPT_SCHEMA

    pdf = transcripts_pdf.copy()
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True).dt.tz_localize(None)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).cache()


SF_DIR = os.environ.get("SPARKFEAT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
