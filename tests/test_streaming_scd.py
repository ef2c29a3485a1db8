"""Streaming CDC → SCD2 compaction: closed intervals ≡ batch q90, with
transitions that span micro-batch (file-slice) boundaries."""

from pyspark.sql import functions as F

from img2table_spark import queries as Q
from img2table_spark.streaming.scd import stream_scd2

_SF = "/root/testdata/sf0.001"


def test_stream_scd2_matches_batch_closed_intervals(spark, tmp_path):
    docs = spark.read.parquet(f"{_SF}/documents.parquet")
    log = Q.scd_changelog(docs)
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # two sequential version slices: any doc whose value changes at ver 2
    # or 3 closes an interval opened in the FIRST slice — the cross-batch
    # state the operator exists for. Sequential writes give distinct
    # mtimes, so the file source replays them in order.
    log.filter(F.col("ver") <= 1).write.parquet(inp)
    log.filter(F.col("ver") >= 2).write.mode("append").parquet(inp)

    q = stream_scd2(spark, inp, out, ckpt)
    q.awaitTermination(300)

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("doc_id", "val", "valid_from", "valid_to", "is_current")
        .collect()
    }
    batch = Q.QUERIES["q90_scd2_intervals"](spark, _SF)
    want_closed = {
        tuple(r)
        for r in batch.filter(F.col("is_current") == 0).collect()
    }
    assert got == want_closed
    assert len(got) > 0

    # the open (current) interval per doc is exactly the per-key state:
    # batch's is_current rows must all START at or after the last closed
    # valid_to + 1 of their doc, and every doc has exactly one
    cur = batch.filter(F.col("is_current") == 1)
    assert cur.count() == docs.count()
    merged = (
        cur.alias("c")
        .join(
            batch.filter(F.col("is_current") == 0)
            .groupBy("doc_id")
            .agg(F.max("valid_to").alias("last_to"))
            .alias("z"),
            "doc_id",
            "left",
        )
        .filter(
            F.col("valid_from") != F.coalesce(F.col("last_to") + 1, F.lit(0))
        )
    )
    assert merged.count() == 0


def test_stream_scd2_restart_is_idempotent(spark, tmp_path):
    docs = spark.read.parquet(f"{_SF}/documents.parquet").limit(50)
    log = Q.scd_changelog(docs)
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    log.filter(F.col("ver") <= 2).write.parquet(inp)
    q = stream_scd2(spark, inp, out, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # restart against the checkpoint with the final version appended:
    # only the ver-3 closings are new; nothing is re-emitted
    log.filter(F.col("ver") == 3).write.mode("append").parquet(inp)
    q2 = stream_scd2(spark, inp, out, ckpt)
    q2.awaitTermination(300)
    got = spark.read.parquet(out)
    n2 = got.count()
    assert n2 >= n1
    # no duplicate closed intervals after the restart
    assert (
        got.groupBy("doc_id", "valid_from").count().filter("count > 1").count()
        == 0
    )
