"""Geospatial grid operators: cell binning, bucketed radius joins,
nearest-hub assignment. Capability superset: the reference has no
spatial surface (SURVEY.md §2.11); these are the patterns a corpus
with lat/lon metadata needs at 100 TB — every op buckets points into
fixed-degree grid cells so candidate generation is a narrow equi-join
on cell ids, NEVER an all-pairs distance computation.

Coordinates here are synthesized deterministically from a key column
(md5-derived, 1e-4-degree grid) so any engine — including the DuckDB
oracle — replays them bit-for-bit; swap :func:`synthetic_coords` for
real lat/lon columns in production use.

Distances are squared-degree (planar) — correct for the small radii
grid joins target, and exactly replayable (no trig whose libm ulps
could differ across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthetic_coords(df: DataFrame, key_col: str) -> DataFrame:
    """Attach deterministic (lat, lon) derived from md5(key): two
    independent 8-hex-digit fields mapped onto a 1e-4-degree grid.
    Engine-replayable (md5 + hex-to-int + one division each) and
    uniform over the globe — the fixture every geo op here tests
    against."""
    h = F.md5(F.col(key_col).cast("string"))
    lat = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
           % 1_800_000) / 10000.0 - 90.0
    lon = (F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
           % 3_600_000) / 10000.0 - 180.0
    return df.withColumn("lat", lat).withColumn("lon", lon)


def cell_id(lat: F.Column, lon: F.Column, cell_deg: float
            ) -> tuple[F.Column, F.Column]:
    """Fixed-degree grid cell of a point: (floor(lat/c), floor(lon/c)).
    The geohash-equivalent bucketing every op below joins on."""
    return (F.floor(lat / cell_deg).cast("long"),
            F.floor(lon / cell_deg).cast("long"))


def adaptive_cell_deg(n_points: int, base_deg: float = 45.0,
                      n0: int = 200_000, max_k: int = 8) -> float:
    """Density-adaptive grid size: halve the cell edge ``k`` times
    where ``k = ceil(0.5 * log2(n/n0))`` (clamped to [0, max_k]), so
    cell COUNT grows linearly with ``n`` and expected bucket
    occupancy stays ~constant — the layout-level fix for the
    quadratic within-bucket pairing that a FIXED grid develops as
    density grows (same adaptive-parameter shape as the embedding
    blocker's ``num_planes``, similarity.py).

    One cheap ``df.count()`` feeds this (parquet metadata count —
    no scan); the formula is engine-replayable BIT-FOR-BIT: ``k``
    uses one libm ``log2`` + ``ceil`` (DuckDB spells it
    ``CEIL(0.5*LOG2(n/n0))``), and ``base_deg / 2**k`` is exact
    because the divisor is a power of two. ``n0`` is the point count
    at which the base grid's expected occupancy is still cheap to
    pair exhaustively; sqrt scaling (0.5 factor) because pairing
    cost per bucket is quadratic in occupancy. Truncation caps
    (``max_bucket``) remain the backstop for hot spots — this moves
    the COMMON case off the cap so safety no longer rests on
    truncation."""
    import math
    if n_points <= 0:
        return base_deg
    k = min(max_k, max(0, math.ceil(0.5 * math.log2(n_points / float(n0)))))
    return base_deg / float(1 << k)


def cell_density(points: DataFrame, lat_col: str = "lat",
                 lon_col: str = "lon", cell_deg: float = 1.0,
                 top: int = 20) -> DataFrame:
    """Point density per grid cell, densest ``top`` cells first
    (deterministic (count desc, cell) order). One keyed count onto
    the bounded cell grid; the head plans as TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    cx, cy = cell_id(F.col(lat_col), F.col(lon_col), cell_deg)
    return (points.groupBy(cx.alias("cell_x"), cy.alias("cell_y"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "cell_x", "cell_y").limit(top))


def neighbor_pairs(points: DataFrame, id_col: str,
                   lat_col: str = "lat", lon_col: str = "lon",
                   radius_deg: float = 0.5, top: int = 20
                   ) -> DataFrame:
    """Closest point pairs within ``radius_deg``: bucket points into
    radius-sized cells, join each point against the 3×3 neighborhood
    of cells (the only cells that can hold a match — candidate count
    is 9×density×|points|, linear, NOT all-pairs), filter by exact
    squared-degree distance, keep each unordered pair once (id_a <
    id_b), return the ``top`` closest (distance, then ids — a
    TakeOrderedAndProject head).

    This is THE scale shape for spatial self-joins: at 100 TB the
    cell equi-join shuffles on (cell_x, cell_y) with partial
    pre-bucketing, and a hot cell is a data-skew problem (salt it),
    never a quadratic one."""
    cx, cy = cell_id(F.col(lat_col), F.col(lon_col), radius_deg)
    base = points.select(F.col(id_col).alias("id"),
                         F.col(lat_col).alias("la"),
                         F.col(lon_col).alias("lo"),
                         cx.alias("cx"), cy.alias("cy"))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("o")
    probe = (base.select("id", "la", "lo", "cx", "cy", off)
             .select(F.col("id").alias("id2"), F.col("la").alias("la2"),
                     F.col("lo").alias("lo2"),
                     (F.col("cx") + F.col("o.dx")).alias("cx"),
                     (F.col("cy") + F.col("o.dy")).alias("cy")))
    d2 = ((F.col("la") - F.col("la2")) * (F.col("la") - F.col("la2"))
          + (F.col("lo") - F.col("lo2")) * (F.col("lo") - F.col("lo2")))
    r2 = float(radius_deg) * float(radius_deg)
    return (base.join(probe, ["cx", "cy"])
            .filter(F.col("id") < F.col("id2"))
            .withColumn("d2", d2)
            .filter(F.col("d2") <= r2)
            .select(F.col("id").alias("id_a"), F.col("id2").alias("id_b"),
                    F.round(F.col("d2"), 10).alias("dist2"))
            .orderBy("dist2", "id_a", "id_b").limit(top))


def nearest_hub(points: DataFrame, hubs: DataFrame, id_col: str,
                hub_col: str, lat_col: str = "lat", lon_col: str = "lon"
                ) -> DataFrame:
    """Assign every point to its nearest hub (squared-degree
    distance, hub-id tiebreak) and count assignments per hub — the
    broadcast-side spatial classify (region tagging, shard-by-geo).
    Hubs must be small: they broadcast, each point scans |hubs|
    candidates map-side, and the per-point argmin is one keyed
    ``min(struct(d2, hub))`` aggregate (a single data-sized
    exchange); the per-hub rollup reuses the tiny result."""
    h = hubs.select(F.col(hub_col).alias("hub"),
                    F.col(lat_col).alias("hla"),
                    F.col(lon_col).alias("hlo"))
    d2 = ((F.col("la") - F.col("hla")) * (F.col("la") - F.col("hla"))
          + (F.col("lo") - F.col("hlo")) * (F.col("lo") - F.col("hlo")))
    best = (points.select(F.col(id_col).alias("id"),
                          F.col(lat_col).alias("la"),
                          F.col(lon_col).alias("lo"))
            .crossJoin(F.broadcast(h))
            .groupBy("id")
            .agg(F.min(F.struct(d2.alias("d2"), F.col("hub").alias("hub")))
                 .alias("b")))
    return (best.groupBy(F.col("b.hub").alias("hub"))
            .agg(F.count(F.lit(1)).alias("n_points"))
            .orderBy("hub"))


def trajectory_length(points: DataFrame, key_col: str, ts_col: str,
                      id_col: str, lat_col: str = "lat",
                      lon_col: str = "lon",
                      round_dp: int = 6) -> DataFrame:
    """Per-entity trajectory length: the sum of consecutive-point
    planar distances (degrees) along each key's time-ordered path —
    the movement metric behind travel-distance, delivery-route and
    bot-teleportation screens.

    One hash exchange on the key (the ordering window and the fold
    share it); (ts, id) ordering pins the step sequence under
    timestamp ties. Each step distance is quantized to a 1e-6 grid
    BEFORE summing, so the per-key totals are exact integer sums any
    engine replays."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy("ts", "i")
    p = points.select(F.col(key_col).alias("k"),
                      F.col(ts_col).alias("ts"),
                      F.col(id_col).alias("i"),
                      F.col(lat_col).alias("la"),
                      F.col(lon_col).alias("lo"))
    stepped = (p.withColumn("pla", F.lag("la").over(w))
               .withColumn("plo", F.lag("lo").over(w)))
    d = F.sqrt((F.col("la") - F.col("pla")) * (F.col("la") - F.col("pla"))
               + (F.col("lo") - F.col("plo"))
               * (F.col("lo") - F.col("plo")))
    dq = F.round(d * 1e6, 0).cast("long")
    return (stepped.filter(F.col("pla").isNotNull())
            .groupBy(F.col("k").alias(key_col))
            .agg(F.count(F.lit(1)).alias("n_steps"),
                 F.round(F.sum(dq).cast("double") / 1e6, round_dp)
                 .alias("path_deg"))
            .orderBy(key_col))


def copresence_pairs(points: DataFrame, key_col: str, ts_col: str,
                     lat_col: str = "lat", lon_col: str = "lon",
                     cell_deg: float = 1.0, top: int = 20,
                     max_bucket: int | None = None) -> DataFrame:
    """Co-presence: pairs of entities observed in the SAME grid cell
    during the SAME hour, ranked by number of shared (hour, cell)
    buckets — the contact-graph / companion-detection primitive.

    Scale shape: presence collapses to DISTINCT (key, hour, cell)
    first (one keyed exchange, bounded by active buckets), and the
    pair join is an equi-join ON (hour, cell) — candidates are
    generated per bucket, never across the whole population. But
    within-bucket pairing is QUADRATIC in bucket occupancy (a
    stadium cell-hour with 100k entities is 5e9 pairs — salting
    cannot help: pairs must meet), the same failure shape as the
    minhash/simhash/embedding blockers, and the 10× smoke measured
    it at 4.6×. ``max_bucket`` keeps the first ``max_bucket``
    entities per (hour, cell) by key order — densely shared buckets
    carry little companion signal anyway (everyone co-occurs with
    everyone at the stadium).

    The LIBRARY default is ``None`` (exact exhaustive pairs — a
    library call must not silently truncate results); production
    entry points opt into the cap explicitly (the registry passes
    ``max_bucket=200``, mirrored in its oracle — sized so the
    per-bucket C(cap,2) plateau stays cheap on a FIXED grid, see the
    registry docstring; shrink ``cell_deg`` with population density
    before leaning on the cap). Set it on any unbounded corpus."""
    hour = (F.unix_timestamp(F.col(ts_col)).cast("long") / 3600) \
        .cast("long")
    cx, cy = cell_id(F.col(lat_col), F.col(lon_col), cell_deg)
    # Physical shape note (r7): an alternative single-exchange form
    # (groupBy bucket + sort_array(collect_set) + slice cap + array-
    # lambda pair generation) was A/B'd at the 300x smoke and LOST —
    # 147s vs 113s — because object-hash aggregation of set buffers
    # and nested higher-order lambdas fall out of whole-stage
    # codegen, while this distinct/window/join pipeline stays fully
    # codegen'd; keep the join form.
    pres = (points.select(F.col(key_col).alias("k"), hour.alias("h"),
                          cx.alias("cx"), cy.alias("cy"))
            .distinct())
    if max_bucket is not None:
        from pyspark.sql.window import Window
        w = Window.partitionBy("h", "cx", "cy").orderBy("k")
        pres = (pres.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= max_bucket).drop("__rn"))
    a = pres.select(F.col("k").alias("k1"), "h", "cx", "cy")
    b = pres.select(F.col("k").alias("k2"), "h", "cx", "cy")
    return (a.join(b, ["h", "cx", "cy"])
            .filter(F.col("k1") < F.col("k2"))
            .groupBy("k1", "k2")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .orderBy(F.desc("n_shared"), "k1", "k2").limit(top))
