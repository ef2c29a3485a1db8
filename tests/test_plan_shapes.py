"""Physical-plan regression pins for the scale-sensitive oracle queries.

Each entry pins the properties PLANS.md documents for 100-TB readiness:
no CartesianProduct / BroadcastNestedLoopJoin anywhere, and the data-scale
exchange count must not grow past the audited number (a new exchange means
a new corpus-wide shuffle slipped into the plan — the regression these
tests exist to catch). Counts are upper bounds: AQE may legally REMOVE an
exchange, never add one silently.
"""

import pytest

from img2table_spark import queries as Q

_SF = "/root/testdata/sf0.001"

# (query, max total exchanges, max single-partition exchanges)
# single-partition exchanges are only legal when the table feeding them is
# bounded by construction (bucket offsets, 256-bucket distributions, final
# top-k folds) — documented per query in PLANS.md.
_PINS = [
    ("q25_pii_redact", 0, 0),  # the 0-exchange pure map
    ("q53_merge_turns", 1, 0),  # window shuffle reused by the groupBy
    ("q55_cms_heavy_hitters", 6, 0),
    ("q57_value_percentiles", 2, 0),
    ("q59_histogram_quantiles", 2, 0),
    ("q62_url_canonical_dedup", 1, 0),
    ("q63_line_dedup", 3, 0),
    ("q64_bigram_lm_score", 3, 0),
    ("q65_source_gini", 2, 1),
    # 4 audited + up to 2 extra when the memoized band index is already
    # cached by an earlier test: both InMemoryTableScan arms of the
    # self-join re-shuffle on (band, sig) instead of reusing the build's
    # partitioning — cache-state noise, not a corpus-scale regression.
    ("q66_split_leakage", 6, 0),
    ("q67_token_blocks", 4, 1),
    ("q68_dsir_weights", 3, 1),
    ("q69_block_loss_mask", 4, 1),
    ("q70_epoch_shuffle", 1, 0),
    ("q71_quality_filter", 0, 0),  # the second 0-exchange pure map (q25's class)
    ("q72_snapshot_diff", 3, 0),
]


@pytest.mark.parametrize("name,max_ex,max_single", _PINS, ids=[p[0] for p in _PINS])
def test_plan_shape(spark, name, max_ex, max_single):
    plan = (
        Q.QUERIES[name](spark, _SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
    single = plan.count("Exchange SinglePartition")
    total = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange roundrobin")
        + single
    )
    assert total <= max_ex, f"{name}: {total} exchanges (pinned ≤ {max_ex})"
    assert single <= max_single, (
        f"{name}: {single} single-partition exchanges (pinned ≤ {max_single})"
    )
