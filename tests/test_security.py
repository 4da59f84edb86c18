"""Row/column-level security views (operators/security)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.operators.security import (mask_bucket, mask_hash,
                                           mask_last, secure_view)


def test_secure_view_masks_and_drops(spark):
    df = spark.createDataFrame(
        [(1, "Alice Smith", 7, 2543.7), (2, "Bo", 3, -120.0),
         (3, "Carol", 15, 999.0)],
        "id long, name string, nation int, bal double")
    v = secure_view(
        df, row_filter=F.col("nation") < 10,
        column_masks={"id": mask_hash(F.col("id"), "s"),
                      "name": mask_last(F.col("name"), 2),
                      "bal": mask_bucket(F.col("bal"), 1000)},
        drop_columns=("nation",))
    rows = {r.name: r for r in v.collect()}
    assert set(v.columns) == {"id", "name", "bal"}   # nation gone
    assert len(rows) == 2                            # nation 15 filtered
    assert rows["*********th"].bal == 2000           # floor bucket
    assert rows["Bo"].bal == -1000                   # negative floors down
    assert len(rows["Bo"].id) == 64                  # sha256 hex token
    # determinism: same plaintext -> same token (joins keep working)
    assert rows["Bo"].id == mask_and_get(spark, 2)


def mask_and_get(spark, key):
    one = spark.createDataFrame([(key,)], "id long")
    return one.select(mask_hash(F.col("id"), "s").alias("t")) \
        .collect()[0].t


def test_secure_view_row_filter_pushed_to_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(0, 1000).selectExpr("id", "id % 20 AS nation") \
        .write.parquet(p)
    base = spark.read.parquet(p)
    v = secure_view(base, F.col("nation") < 3,
                    {"id": mask_hash(F.col("id"))})
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(nation,3)" in plan
