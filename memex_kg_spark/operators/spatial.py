"""Grid-bucketed spatial joins (no native spatial join in Spark).

The reference's ``link_neighboring_places`` is an all-pairs Cypher scan
with ``distance(p1, p2) < 150`` (db/db_connection.py:59-72) — O(n^2).
Here: hash each point to a lat/lon grid cell sized >= the radius, join
each point to its 3x3 neighboring cells, and apply the exact haversine
predicate only within cells. At uniform density this is O(n * k); the
cell key is an equi-join key, so Catalyst plans a plain hash join and
AQE splits any dense-city skew cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_km


def _with_cell(df: DataFrame, lat: str, lon: str, cell_deg: float,
               prefix: str) -> DataFrame:
    """Grid cell indexes; the longitude index is modular so cells wrap at
    the +-180 antimeridian (a pair at lon -175 / +177 is ~560 km apart,
    not half the world — the brute-force oracle caught exactly this)."""
    ncx = max(1, int(-(-360.0 // cell_deg)))  # ceil
    return (df.withColumn(f"{prefix}cy",
                          F.floor(F.col(lat) / cell_deg).cast("long"))
            .withColumn(f"{prefix}cx",
                        F.pmod(F.floor((F.col(lon) + 180.0) / cell_deg),
                               F.lit(ncx)).cast("long")))


def neighbors_within(points: DataFrame, radius_km: float,
                     id_col: str = "id", lat: str = "lat",
                     lon: str = "lon") -> DataFrame:
    """All unordered pairs (a, b) with haversine(a, b) < radius_km.

    cell_deg is one radius in latitude degrees (111.195 km/deg); each
    left row fans out to its 9 candidate cells via a 3x3 offset explode,
    then equi-joins the right side on the exact cell."""
    cell_deg = max(radius_km / 111.195, 1e-6)
    a = _with_cell(
        points.select(F.col(id_col).alias("a_id"),
                      F.col(lat).alias("a_lat"),
                      F.col(lon).alias("a_lon")),
        "a_lat", "a_lon", cell_deg, "a")
    # longitude degrees shrink with latitude: the lon probe width must grow
    # by 1/cos(lat) or high-latitude neighbors are silently missed (the
    # brute-force oracle catches this). Capped at 64 cells -> exact up to
    # |lat| ~88.6 deg for a 1-cell radius; beyond that pairs may be missed
    # (documented polar limitation).
    kx = F.least(
        F.ceil(F.lit(1.0) / F.greatest(F.cos(F.radians(F.col("a_lat"))),
                                       F.lit(1e-6))),
        F.lit(64)).cast("int")
    ncx = max(1, int(-(-360.0 // cell_deg)))
    a = (a.withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0),
                                              F.lit(1))))
         .withColumn("dx", F.explode(F.sequence(-kx, kx)))
         .select("a_id", "a_lat", "a_lon",
                 (F.col("acy") + F.col("dy")).alias("cy"),
                 F.pmod(F.col("acx") + F.col("dx"),
                        F.lit(ncx)).alias("cx")))
    b = (_with_cell(
        points.select(F.col(id_col).alias("b_id"),
                      F.col(lat).alias("b_lat"),
                      F.col(lon).alias("b_lon")),
        "b_lat", "b_lon", cell_deg, "b")
        .withColumnRenamed("bcy", "cy").withColumnRenamed("bcx", "cx"))
    pairs = (a.join(b, ["cy", "cx"])
             .filter(F.col("a_id") < F.col("b_id"))
             .withColumn("dist_km", F.round(haversine_km(
                 F.col("a_lat"), F.col("a_lon"),
                 F.col("b_lat"), F.col("b_lon")), 4))
             .filter(F.col("dist_km") < radius_km))
    # a row can meet the same partner through several probe cells -> dedup
    return pairs.select("a_id", "b_id", "dist_km").dropDuplicates(
        ["a_id", "b_id"])
