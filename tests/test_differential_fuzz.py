"""Seeded random differential fuzzing: random aggregation shapes run
from the SAME SQL string on Spark and DuckDB must agree exactly
(tools/fuzz_differential.py is the CLI twin; 200 cases swept there —
the pytest leg keeps a fast deterministic sample in CI)."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_differential import (gen_decimal_query,  # noqa: E402
                                     gen_join_query, gen_map_null_query,
                                     gen_nested_query, gen_query,
                                     gen_range_frame_query,
                                     gen_setop_query,
                                     gen_string_date_query,
                                     gen_subquery_query,
                                     gen_three_way_join_query,
                                     gen_tied_rank_query,
                                     gen_window_query, run_case)


def test_random_query_shapes_agree_with_duckdb(spark, sf_dir):
    import duckdb

    from vega_spark.tables import load_table

    load_table(spark, sf_dir, "lineitem") \
        .createOrReplaceTempView("lineitem")
    for t in ("orders", "customer", "documents", "embeddings"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "documents",
              "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(sf_dir, t + '.parquet')}'")
    rng = random.Random(1234)
    gens = [gen_query, gen_join_query, gen_window_query,
            gen_setop_query, gen_three_way_join_query,
            gen_tied_rank_query, gen_decimal_query,
            gen_string_date_query, gen_subquery_query,
            gen_nested_query, gen_map_null_query,
            gen_range_frame_query]
    for i in range(48):
        sql = gens[i % len(gens)](rng)
        ok, why = run_case(spark, con, sql)
        assert ok, f"{sql}: {why}"
