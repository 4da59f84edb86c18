"""Unit tests for the density-adaptive co-presence grid
(functions/geo.py adaptive_cell_deg) — VERDICT r6 item #3.

The formula must (a) keep every test SF on the base grid so the
r6-green driver contract is bit-identical, (b) subdivide so cell
count tracks point count (occupancy ~constant), and (c) be exactly
replayable by the DuckDB oracle's grid CTE (power-of-two divisors,
libm log2/ceil)."""

from __future__ import annotations

import math

from vega_spark.functions.geo import adaptive_cell_deg


def test_base_grid_at_test_sfs():
    # sf0.001 / 0.01 / 0.1 event counts (1k / 10k / 100k) and the
    # n0 boundary itself all stay on the 45-degree base grid
    for n in (0, 1, 1000, 10_000, 100_000, 200_000):
        assert adaptive_cell_deg(n) == 45.0


def test_sqrt_scaling_halves_every_4x():
    # k = ceil(0.5*log2(n/n0)): one halving per 4x points
    assert adaptive_cell_deg(200_001) == 22.5          # k=1
    assert adaptive_cell_deg(800_000) == 22.5          # 4x -> still k=1
    assert adaptive_cell_deg(800_001) == 11.25         # k=2
    assert adaptive_cell_deg(30_000_000) == 45.0 / 16  # 300x smoke: k=4


def test_clamped_at_max_k():
    assert adaptive_cell_deg(10**15) == 45.0 / 256     # k=8 cap


def test_divisor_is_exact_power_of_two():
    # the oracle replays 45.0 / POWER(2, k): division by 2^k is
    # exact in IEEE doubles, so equality (not approx) must hold
    for n in (200_001, 10**6, 10**7, 3 * 10**7, 10**9):
        deg = adaptive_cell_deg(n)
        k = round(math.log2(45.0 / deg))
        assert deg * (1 << k) == 45.0


def test_driver_datasets_stay_on_base_grid():
    # r8 (ADVICE): the bit-identical-to-r6 claim rests on the DRIVER
    # datasets having n <= n0 (k=0, base grid). The hardcoded counts
    # above assert the formula; this pins the ACTUAL parquet row
    # counts, so a regenerated/larger testdata drop fails loudly here
    # instead of silently changing the contract's grid.
    import os

    import pyarrow.parquet as pq
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):  # container without testdata
            continue
        n = pq.ParquetFile(path).metadata.num_rows
        assert n <= 200_000, (sf, n)
        assert adaptive_cell_deg(n) == 45.0


def test_matches_duckdb_formula():
    import duckdb
    for n in (1000, 200_000, 200_001, 999_999, 3_200_000, 30_000_000,
              200_000 * 4**3, 10**9):
        got = duckdb.sql(
            f"SELECT 45.0 / CAST(POWER(2, LEAST(8, GREATEST(0, "
            f"CAST(CEIL(0.5 * LOG2({n} / 200000.0)) AS BIGINT)))) "
            f"AS DOUBLE)").fetchone()[0]
        assert got == adaptive_cell_deg(n), n
