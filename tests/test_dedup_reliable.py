"""q16/q23 label propagation, pipeline-scale path: reliable checkpoint()
(survives executor loss at cluster scale, unlike localCheckpoint) must
produce the same clusters as the interactive path."""

from img2table_spark.queries import q16_dedup_clusters

SF_DIR = "/root/testdata/sf0.001"


def test_reliable_requires_checkpoint_dir(spark):
    """reliable=True without a checkpoint dir must fail fast with guidance,
    not with Spark's late 'Checkpoint directory has not been set' (ADVICE r2)."""
    import pytest

    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set in this session")
    with pytest.raises(RuntimeError, match="reliable-checkpoint-dir"):
        q16_dedup_clusters(spark, SF_DIR, reliable=True)


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    local = {tuple(r) for r in q16_dedup_clusters(spark, SF_DIR).collect()}
    reliable = {
        tuple(r) for r in q16_dedup_clusters(spark, SF_DIR, reliable=True).collect()
    }
    assert reliable == local and len(local) > 0
