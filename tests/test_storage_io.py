"""CSV source/sink compatibility paths (SURVEY §2 S2/S3)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ytspark import storage
from ytspark.session import load_tables


def test_csv_roundtrip_inferred(spark, sf_dir):
    nation = load_tables(spark, sf_dir, "nation")["nation"]
    path = tempfile.mkdtemp(prefix="ytspark_csv_") + "/nation"
    storage.write_csv(nation, path)
    back = storage.read_csv(spark, path)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    # schema-on-read inference recovers integer types (the reference's
    # pd.read_csv regime, SURVEY §1.3 regime 1)
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")


def test_csv_explicit_schema(spark, sf_dir):
    nation = load_tables(spark, sf_dir, "nation")["nation"]
    path = tempfile.mkdtemp(prefix="ytspark_csv_") + "/nation"
    storage.write_csv(nation, path)
    back = storage.read_csv(spark, path, schema=nation.schema)
    assert back.schema == nation.schema
    a = sorted(r["n_name"] for r in back.select("n_name").collect())
    b = sorted(r["n_name"] for r in nation.select("n_name").collect())
    assert a == b
