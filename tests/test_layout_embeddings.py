"""Z-order layout keys, embedding centroids, permissive reads."""
import pytest
from pyspark.sql import functions as F


def _morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_morton(spark):
    from vega_spark.operators.layout import zorder_key
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r.x, r.y): r.z for r in
           df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _morton2(x, y), (x, y)


def test_zorder_key_overflow_guard(spark):
    from vega_spark.operators.layout import zorder_key
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_write_zordered_clusters_locality(spark, tmp_path):
    from vega_spark.operators.layout import write_zordered, zorder_key
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"))
    p = str(tmp_path / "z")
    write_zordered(df, p, ["x", "y"], bits=6, n_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 4096
    # within each file rows are sorted by the morton key
    withz = back.select("x", "y",
                        zorder_key(["x", "y"], bits=6).alias("z"),
                        F.input_file_name().alias("f"))
    import collections
    seen = collections.defaultdict(list)
    for r in withz.collect():
        seen[r.f].append(r.z)
    assert len(seen) == 4
    for zs in seen.values():
        assert zs == sorted(zs)


def test_label_centroids_and_distance(spark):
    from vega_spark.functions.embeddings import (
        centroid_distance,
        label_centroids,
    )
    df = spark.createDataFrame(
        [(1, 0, [0.0, 0.0]), (2, 0, [2.0, 2.0]),   # centroid (1,1)
         (3, 1, [4.0, 0.0])],                       # centroid (4,0)
        "vec_id long, label int, embedding array<double>")
    cent = label_centroids(df)
    got = {(r.label, r.idx): r.mean for r in cent.collect()}
    assert got == {(0, 0): 1.0, (0, 1): 1.0, (1, 0): 4.0, (1, 1): 0.0}
    d = {r.vec_id: r.dist for r in
         centroid_distance(df, cent).collect()}
    assert abs(d[1] - 2 ** 0.5) < 1e-12
    assert abs(d[2] - 2 ** 0.5) < 1e-12
    assert d[3] == 0.0


def test_read_json_permissive_quarantines(spark, tmp_path):
    from vega_spark.sources.robust import read_json_permissive, split_corrupt
    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n'
                 'not json at all\n'
                 '{"a": 2, "b": "y"}\n')
    df = read_json_permissive(spark, str(p), "a int, b string")
    good, bad = split_corrupt(df)
    assert sorted((r.a, r.b) for r in good.collect()) == [(1, "x"), (2, "y")]
    assert [r.raw for r in bad.collect()] == ["not json at all"]


def test_parquet_footer_census_multi_rowgroup(spark, tmp_path):
    # write a file with SEVERAL row groups incl. nulls; footer census
    # must aggregate groups and count nulls exactly
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vega_spark.operators.layout import parquet_footer_census

    vals = list(range(100)) + [None, None] + list(range(200, 250))
    t = pa.table({"k": pa.array(vals, type=pa.int64())})
    p = str(tmp_path / "rg.parquet")
    pq.write_table(t, p, row_group_size=40)
    assert pq.ParquetFile(p).metadata.num_row_groups > 2
    row = parquet_footer_census(spark, [p], ["k"]).collect()[0]
    assert (row.col, row.num_values, row.null_count,
            row.min_val, row.max_val) == ("k", 152, 2, 0, 249)


def test_write_size_targeted_file_count_and_sizes(spark, tmp_path):
    import os

    from vega_spark.operators.layout import write_size_targeted

    df = spark.range(0, 200_000).selectExpr(
        "id", "cast(id % 997 as string) as s", "id * 2.5 as v")
    out = str(tmp_path / "sized")
    info = write_size_targeted(df, out, target_file_bytes=64 * 1024)
    files = [os.path.join(out, f) for f in os.listdir(out)
             if f.endswith(".parquet")]
    assert info["n_files"] == len(files) > 3
    sizes = sorted(os.path.getsize(f) for f in files)
    # uniform round-robin -> files within a reasonable band of target
    assert sizes[0] > 16 * 1024 and sizes[-1] < 4 * 64 * 1024
    # data integrity
    assert spark.read.parquet(out).count() == 200_000


def test_parquet_footer_census_non_integer_columns(spark, tmp_path):
    # ADVICE r2: string/double columns must yield NULL min/max stats,
    # not an int() crash inside the executor UDF
    from pyspark.sql import functions as F

    from vega_spark.operators.layout import parquet_footer_census

    p = str(tmp_path / "mixed")
    spark.createDataFrame(
        [(1, "abc", 1.5), (2, "xyz", -2.5)],
        "id long, name string, score double").write.parquet(p)
    import os
    paths = [os.path.join(p, f) for f in os.listdir(p)
             if f.endswith(".parquet")]
    out = parquet_footer_census(spark, paths, ["id", "name", "score"])
    rows = {r.col: r for r in out.collect()}
    assert rows["id"].min_val == 1 and rows["id"].max_val == 2
    assert rows["name"].min_val is None and rows["name"].max_val is None
    assert rows["score"].min_val is None
    assert rows["name"].num_values == 2
