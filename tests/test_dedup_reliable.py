"""q16/q23 label propagation, pipeline-scale path: reliable checkpoint()
(survives executor loss at cluster scale, unlike localCheckpoint) must
produce the same clusters as the interactive path."""

from img2table_spark.queries import q16_dedup_clusters

SF_DIR = "/root/testdata/sf0.001"


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    local = {tuple(r) for r in q16_dedup_clusters(spark, SF_DIR).collect()}
    reliable = {
        tuple(r) for r in q16_dedup_clusters(spark, SF_DIR, reliable=True).collect()
    }
    assert reliable == local and len(local) > 0
