"""Catalog lifecycle demo: the chunk snapshot store as a mini table
format — append, merge, delete, time travel, compact, expire, vacuum.

The reference persists documents transactionally per DocumentNumber
(delete+insert inside one SQL transaction, Horus.Functions/
HorusSql.cs:210-311) and keeps no history. The Spark-native catalog
generalizes that to set-oriented DML over immutable chunk snapshots:
every mutation is a copy-on-write chunk swap published by one CAS
manifest commit (serializable against concurrent writers), every
snapshot stays time-travel readable until expired, and maintenance
(compaction / expiry / vacuum) follows the Iceberg contracts.

    python examples/table_maintenance.py          # ~30 s on local[*]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import horus_spark as h  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from horus_spark.sources.sink import (
        append_chunk,
        compact_chunks,
        delete_rows,
        expire_snapshots,
        list_snapshots,
        merge_upsert,
        read_output,
        vacuum_chunks,
    )

    spark = h.get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="horus_catalog_")

    # INSERT — four small append batches (any table shape works)
    base = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        (F.col("id") * 1.5).alias("score"),
    )
    for i in range(4):
        append_chunk(out, {"events": base.filter(F.col("k") % 4 == i)}, f"seed{i}")
    s0 = list_snapshots(out)[-1]
    print("after 4 appends    :", read_output(spark, out, "events").count(), "rows,",
          "snapshot", s0)

    # MERGE — update one group, insert two fresh rows
    upd = base.filter(F.col("grp") == 2).withColumn("score", F.col("score") + 100.0)
    ins = spark.createDataFrame([(-1, 9, 1.0), (-2, 9, 2.0)],
                                "k long, grp long, score double")
    res = merge_upsert(spark, out, "events", upd.unionByName(ins), ["k"])
    print("merge              : matched", res["matched"], "inserted",
          res["inserted"], "rewrote", len(res["affected"]), "chunks")

    # DELETE — drop a group
    res = delete_rows(
        spark, out, "events", base.filter(F.col("grp") == 4).select("k"), ["k"]
    )
    print("delete             : removed", res["deleted"], "rows from",
          len(res["affected"]), "chunks")

    # TIME TRAVEL — the pre-DML snapshot still reads
    old = read_output(spark, out, "events", snapshot=s0)
    now = read_output(spark, out, "events")
    print("time travel        :", old.count(), "rows at snapshot", s0,
          "->", now.count(), "rows now")

    # COMPACT — many small chunks into one, readers never see a mixture
    res = compact_chunks(spark, out)
    print("compact            :", res)

    # EXPIRE + VACUUM — reclaim unreferenced chunk dirs
    expired = expire_snapshots(out, keep_last=1)
    removed = vacuum_chunks(out, grace_s=0.0)
    print("expire+vacuum      :", len(expired), "snapshots expired,",
          len(removed), "chunk dirs reclaimed")
    print("final row count    :", read_output(spark, out, "events").count())

    spark.stop()


if __name__ == "__main__":
    main()
