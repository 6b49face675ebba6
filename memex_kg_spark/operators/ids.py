"""Scale-safe deterministic global id assignment.

The reference assigns Manual ids with MAX(existing)+running counter
(ingestion/csv_reader.py:41-66) — inherently sequential. The naive Spark
translation (``Window.orderBy`` with no partitionBy) funnels every row
through ONE reducer; at 100 TB that single task is the job.

``assign_global_ids`` is the DataFrame-native zipWithIndex: range-
repartition on the order key (so partition index itself follows the
global order), count rows per partition (one metadata-sized job — the
same extra pass RDD.zipWithIndex performs), then row_number within each
partition plus the broadcast cumulative offset. Every step is
deterministic provided ``order_cols`` is a total order (include a unique
tie-break column); parallelism is ``n_parts`` tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_global_ids(df: DataFrame, order_cols: list[str],
                      out: str = "rid", n_parts: int = 32,
                      start: int = 1) -> DataFrame:
    """Dense global row numbers ``start..start+N-1`` in ``order_cols``
    order, without a single-partition window.

    RangePartitioner keys equal values to the same partition and its
    bounds are a deterministic function of the input, so the numbering is
    reproducible at any parallelism as long as ``order_cols`` is unique
    per row."""
    ranged = (df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id()))
    counts = ranged.groupBy("_pid").count().collect()  # metadata-sized
    offs, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offs.append((r["_pid"], acc))
        acc += r["count"]
    off_df = df.sparkSession.createDataFrame(
        offs or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (ranged.join(F.broadcast(off_df), "_pid")
            .withColumn(out, (F.row_number().over(w) + F.col("_off")
                              + F.lit(start - 1)).cast("long"))
            .drop("_pid", "_off"))
