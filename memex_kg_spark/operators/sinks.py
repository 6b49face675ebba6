"""Side-effect sinks (SURVEY §2 S10).

The reference downloads every Place image with a driver-side loop over
``wget.download`` (db/extract_images.py:24-75) — one node, one HTTP GET,
sequential. The Spark-native form is a ``foreachPartition`` sink: each
partition opens its own writer and streams its rows, so the side effect
parallelizes with the data and re-partitioning scales the download fan-out.

The actual HTTP fetch is environment-gated (no network in this sandbox):
``_fetch`` is a deterministic stub producing ``IMGDATA:<url>`` bytes, and
is the single seam to swap for a real client. Idempotent by construction
(content-addressed filename, atomic rename), so Spark task retries or a
resume re-run cannot corrupt or duplicate files — the property the
reference's try/except loop lacks.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fetch(url: str) -> bytes:
    """Stub image fetch — deterministic bytes derived from the URL.
    Swap for requests/wget when the environment has network access."""
    return f"IMGDATA:{url}".encode()


def download_images(df: DataFrame, dest_dir: str,
                    url_col: str = "url") -> None:
    """foreachPartition side-effect sink: write one content-addressed
    file per row (md5(url).img). Atomic tmp+rename per file; existing
    files are skipped, so the sink is idempotent under retries."""
    os.makedirs(dest_dir, exist_ok=True)

    def write_partition(rows):
        for r in rows:
            url = r[url_col]
            name = hashlib.md5(url.encode()).hexdigest() + ".img"
            path = os.path.join(dest_dir, name)
            if os.path.exists(path):
                continue
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(_fetch(url))
            os.replace(tmp, path)

    df.foreachPartition(write_partition)


def image_sink_manifest(docs: DataFrame, dest_dir: str,
                        id_col: str = "doc_id",
                        url_col: str = "url") -> DataFrame:
    """Run the sink, then verify it from the OUTSIDE: read the written
    files back through the binaryFile source and join on the
    content-addressed filename — n_bytes comes from the file system, not
    from the writer's bookkeeping, so a silently-failed write surfaces
    as a missing row."""
    download_images(docs, dest_dir, url_col)
    spark = docs.sparkSession
    files = (spark.read.format("binaryFile").load(dest_dir)
             .select(F.element_at(F.split(F.col("path"), "/"), -1)
                     .alias("filename"),
                     F.col("length").cast("long").alias("n_bytes")))
    expect = docs.select(
        id_col,
        F.concat(F.md5(F.col(url_col)), F.lit(".img")).alias("filename"))
    return expect.join(files, "filename").select(
        id_col, "filename", "n_bytes")
