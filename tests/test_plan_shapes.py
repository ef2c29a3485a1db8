"""Physical-plan regression pins for the scale-sensitive oracle queries.

Each entry pins the properties PLANS.md documents for 100-TB readiness:
no CartesianProduct / BroadcastNestedLoopJoin anywhere (except where a
bounded 1-row-agg combine is documented — q73's audit folds), and the
data-scale exchange count must not grow past the audited number (a new
exchange means a new corpus-wide shuffle slipped into the plan — the
regression these tests exist to catch). Counts are upper bounds: AQE may
legally REMOVE an exchange, never add one silently.

Counting notes: the plan STRING duplicates subtrees when an unpersisted
DataFrame feeds several plan arms (Spark's runtime exchange reuse dedupes
the actual shuffles), so the big-pipeline bounds (q08/q48/q73) are string
counts, not shuffle counts — still a tight tripwire for shape blow-ups.
Broadcast exchanges (HashedRelationBroadcastMode) are intentionally NOT
counted: they ship dimension-sized tables, not corpus-scale data.
"""

import pytest

from img2table_spark import queries as Q

_SF = "/root/testdata/sf0.001"

# (query, max total exchanges, max single-partition exchanges, allow_bnlj)
# single-partition exchanges are only legal when the table feeding them is
# bounded by construction (bucket offsets, 256-bucket distributions, final
# top-k folds) — documented per query in PLANS.md. allow_bnlj is only for
# queries whose BroadcastNestedLoopJoins are 1-row-agg combines (bounded by
# construction, the q73 audit-fold class).
_PINS = [
    ("q25_pii_redact", 0, 0, False),  # the 0-exchange pure map
    ("q53_merge_turns", 1, 0, False),  # window shuffle reused by the groupBy
    ("q55_cms_heavy_hitters", 6, 0, False),
    ("q57_value_percentiles", 2, 0, False),
    ("q59_histogram_quantiles", 2, 0, False),
    ("q62_url_canonical_dedup", 1, 0, False),
    ("q63_line_dedup", 3, 0, False),
    ("q64_bigram_lm_score", 3, 0, False),
    ("q65_source_gini", 2, 1, False),
    # 4 audited + up to 2 extra when the memoized band index is already
    # cached by an earlier test: both InMemoryTableScan arms of the
    # self-join re-shuffle on (band, sig) instead of reusing the build's
    # partitioning — cache-state noise, not a corpus-scale regression.
    ("q66_split_leakage", 6, 0, False),
    ("q67_token_blocks", 4, 1, False),
    ("q68_dsir_weights", 3, 1, False),
    ("q69_block_loss_mask", 4, 1, False),
    ("q70_epoch_shuffle", 1, 0, False),
    ("q71_quality_filter", 0, 0, False),  # the second 0-exchange pure map
    ("q72_snapshot_diff", 3, 0, False),
    # ---- heavy pipelines (VERDICT r4 #8). Bounds measured warm (memoized
    # band/IVF indexes cached — the worst case; cold plans are smaller).
    # String duplication of unpersisted arms inflates these counts; the pin
    # still catches a new corpus-scale shuffle (each adds >=1 per arm).
    ("q08_minhash_lsh", 52, 0, False),  # cold 39 / warm 48
    ("q14_image_extract", 1, 0, False),  # the single balance repartition
    ("q16_dedup_clusters", 2, 0, False),  # LP labels checkpointed upstream
    ("q42_semdedup", 3, 0, False),
    ("q48_conv_neardup", 20, 0, False),  # cold 11 / warm 17
    ("q73_dedup_audit", 132, 4, True),  # warm 121+3; BNLJ = 1-row combines
]


@pytest.mark.parametrize(
    "name,max_ex,max_single,allow_bnlj", _PINS, ids=[p[0] for p in _PINS]
)
def test_plan_shape(spark, name, max_ex, max_single, allow_bnlj):
    plan = (
        Q.QUERIES[name](spark, _SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, name
    if not allow_bnlj:
        assert "BroadcastNestedLoopJoin" not in plan, name
    single = plan.count("Exchange SinglePartition")
    total = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        # Spark prints round-robin exchanges in CamelCase — the lowercase
        # pattern used before round 5 never matched, silently uncounting
        # the q14 balance repartition.
        + plan.count("Exchange RoundRobinPartitioning")
        + single
    )
    assert total <= max_ex, f"{name}: {total} exchanges (pinned ≤ {max_ex})"
    assert single <= max_single, (
        f"{name}: {single} single-partition exchanges (pinned ≤ {max_single})"
    )
