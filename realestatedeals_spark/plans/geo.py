"""Geospatial queries: grid-blocked radius join and spatial hotspot
aggregation over deterministic point coordinates.

The canonical real-estate query is "comparable listings within X of this
one" — the reference carries the address/city fields for exactly that
(listing.py:9 ``address``/``cityState``; search URLs are city-scoped,
hunter.py:15) but can only filter by city string. These plans give the
engine a real spatial radius join.

Coordinates are micro-degrees inside a ~1°×1° city box, derived
deterministically from ``md5(c_custkey)`` so BOTH engines compute
identical integer positions (the portable-hash trick used by the
sampling plans); all distance math stays in BIGINT micro-degrees², so
the oracle is hash-exact with zero float tolerance.

Scale design (100 TB): the radius join NEVER goes all-pairs. Points are
bucketed into r-sized grid cells; the left side explodes to its 3×3
neighborhood and the pair candidates come from an equi-join on the cell
id — a plain hash-shuffle join whose fan-in per cell is bounded by local
point density, the textbook spatial-blocking formulation (PostGIS/Sedona
grid partitioning). Expected work is O(N · density), and skewed cells
(downtown) are exactly the AQE skew-join case. The exact squared
distance then filters candidates, so blocking changes cost, never the
answer: every true pair shares at least one 3×3 neighborhood when the
cell edge equals the radius.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_BOX = 1_000_000  # 1° city box, micro-degrees
_RADIUS = 10_000  # ~1.1 km in micro-degrees


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point cloud: one point per customer, md5-placed."""
    h = F.md5(F.col("c_custkey").cast("string"))
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % _BOX).alias("lat"),
        (F.conv(F.substring(h, 13, 12), 16, 10).cast("long") % _BOX).alias("lon"),
    )


_GEO_PTS_SQL = f"""
  SELECT c_custkey AS k,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT % {_BOX} AS lat,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 13, 12))::BIGINT % {_BOX} AS lon
  FROM customer
"""

_RADIUS_ORACLE = f"""
WITH pts AS ({_GEO_PTS_SQL})
SELECT a.k AS a_key, b.k AS b_key,
       CAST((a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS dist_sq
FROM pts a JOIN pts b ON a.k < b.k
WHERE (a.lat - b.lat) * (a.lat - b.lat)
    + (a.lon - b.lon) * (a.lon - b.lon) <= {_RADIUS} * {_RADIUS}
"""


@register("geo_radius_join", oracle=_RADIUS_ORACLE, tags=("geo", "join"))
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within _RADIUS, via 3×3 grid-cell blocking.

    The oracle is the O(N²) self-join statement of the same predicate, so
    a hash match proves the blocking loses no pair: each unordered pair
    surfaces exactly once because only the smaller key's exploded
    neighborhood row survives the ``a.k < b.k`` filter.
    """
    pts = _points(spark, sf_dir)
    cx = F.expr(f"lat div {_RADIUS}")
    cy = F.expr(f"lon div {_RADIUS}")
    right = pts.select(
        F.col("k").alias("b_key"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    left = pts.select(
        F.col("k").alias("a_key"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        cx.alias("acx"),
        cy.alias("acy"),
        off.alias("o"),
    ).select(
        "a_key", "a_lat", "a_lon",
        (F.col("acx") + F.col("o.dx")).alias("cx"),
        (F.col("acy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("a_lat") - F.col("b_lat")) * (F.col("a_lat") - F.col("b_lat"))
        + (F.col("a_lon") - F.col("b_lon")) * (F.col("a_lon") - F.col("b_lon"))
    )
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("a_key") < F.col("b_key"))
        .select(
            "a_key",
            "b_key",
            d2.cast("long").alias("dist_sq"),
        )
        .filter(F.col("dist_sq") <= _RADIUS * _RADIUS)
    )


_HOTSPOT_ORACLE = f"""
WITH pts AS ({_GEO_PTS_SQL})
SELECT CAST(lat // 100000 AS BIGINT) AS cell_x,
       CAST(lon // 100000 AS BIGINT) AS cell_y,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(k) AS BIGINT) AS min_key,
       CAST(sum(lat + lon) AS BIGINT) AS coord_sum
FROM pts
GROUP BY 1, 2
"""


@register("geo_cell_hotspots", oracle=_HOTSPOT_ORACLE, tags=("geo", "agg"))
def geo_cell_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density surface: point counts per coarse (0.1°) grid cell —
    the map-reduce side of spatial indexing (one partial-agg shuffle;
    cells are the partition key a heatmap tile server would consume)."""
    pts = _points(spark, sf_dir)
    # integer division on both engines (DuckDB //, Spark div): CAST of a
    # double quotient would round in DuckDB but truncate in Spark
    return pts.groupBy(
        F.expr("lat div 100000").alias("cell_x"),
        F.expr("lon div 100000").alias("cell_y"),
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("k").alias("min_key"),
        F.sum(F.col("lat") + F.col("lon")).alias("coord_sum"),
    )
