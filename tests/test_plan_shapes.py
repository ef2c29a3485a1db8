"""Physical-plan regression pins for the scale-sensitive oracle queries.

Each entry pins the properties PLANS.md documents for 100-TB readiness:
no CartesianProduct / BroadcastNestedLoopJoin anywhere (except where a
bounded 1-row-agg combine is documented — q73's audit folds), and the
LIVE data-scale exchange count must not grow past the audited number (a
new exchange means a new corpus-wide shuffle slipped into the plan — the
regression these tests exist to catch). Bounds are upper bounds: AQE may
legally REMOVE an exchange, never add one silently.

Counting is a py4j walk of the physical-plan TREE (AdaptiveSparkPlan →
initialPlan), not a plan-string scan: InMemoryTableScan nodes have no
children, so the already-materialized internals of cached/memoized tables
(band index, candidate pairs, IVF assignment) are excluded — only the
shuffles THIS plan will execute count. String scans double-counted every
cached subtree per scan and flapped with memo warmth. BroadcastExchange
is intentionally not counted: it ships dimension-sized tables, not
corpus-scale data.
"""

import pytest

from img2table_spark import queries as Q

_SF = "/root/testdata/sf0.001"

# (query, max live exchanges, max single-partition exchanges, allow_bnlj)
# single-partition exchanges are only legal when the table feeding them is
# bounded by construction (bucket offsets, 256-bucket distributions, final
# top-k folds) — documented per query in PLANS.md. allow_bnlj is only for
# queries whose BroadcastNestedLoopJoins are 1-row-agg combines (bounded
# by construction, the q73 audit-fold class).
_PINS = [
    ("q25_pii_redact", 0, 0, False),  # the 0-exchange pure map
    ("q53_merge_turns", 1, 0, False),  # window shuffle reused by the groupBy
    ("q55_cms_heavy_hitters", 4, 0, False),
    ("q57_value_percentiles", 1, 0, False),
    ("q59_histogram_quantiles", 2, 0, False),
    ("q62_url_canonical_dedup", 1, 0, False),
    ("q63_line_dedup", 2, 0, False),
    ("q64_bigram_lm_score", 3, 0, False),
    ("q65_source_gini", 2, 1, False),
    ("q66_split_leakage", 2, 0, False),
    ("q67_token_blocks", 4, 1, False),
    ("q68_dsir_weights", 3, 1, False),
    ("q69_block_loss_mask", 4, 1, False),
    ("q70_epoch_shuffle", 1, 0, False),
    ("q71_quality_filter", 0, 0, False),  # the second 0-exchange pure map
    ("q72_snapshot_diff", 3, 0, False),
    # ---- heavy pipelines (r4 verdict #8), measured cold AND warm — the
    # tree walk makes the two agree to within AQE's legal removals.
    ("q08_minhash_lsh", 13, 0, False),
    ("q14_image_extract", 1, 0, False),  # the single balance repartition
    ("q16_dedup_clusters", 1, 0, False),  # LP labels checkpointed upstream
    ("q42_semdedup", 2, 0, False),
    ("q48_conv_neardup", 5, 0, False),
    ("q73_dedup_audit", 16, 3, True),  # BNLJ = bounded 1-row combines
    # ---- round-5 additions
    ("q75_pagerank", 10, 0, False),  # K=5 bounded iterations, 2 per iter
    ("q76_snippet_containment", 4, 0, False),
    ("q77_k_anonymity", 2, 0, False),  # 2nd exchange over tiny group table
    ("q78_bucketed_join", 1, 0, False),  # only the final per-label agg
    ("q79_novelty_score", 2, 0, False),  # s-agg shuffle reused by the join
    ("q80_rollup_stats", 1, 0, False),  # ROLLUP = ONE Expand + hash agg
    ("q81_rrf_fusion", 3, 0, False),  # tf persist + agg + shared window
    # q82: the persisted vocab generations root each branch at an
    # InMemoryTableScan, so the walk sees only the live per-level work:
    # 3 mass aggs + 3 limit(1) top-pair folds (the single-partition
    # exchanges, ≤ n_partitions rows in); BNLJs are the documented 1-row
    # merge/mass combines.
    ("q82_bpe_merges", 6, 3, True),
    ("q83_weighted_sample", 2, 0, False),  # two-level top-k: bucketed + tiny
    ("q84_sq8_quantize", 2, 0, False),  # min/max agg + vec_id re-agg
    ("q85_bpe_encode", 1, 0, False),  # encode = broadcast-vocab map + agg
    ("q86_bloom_prefilter", 1, 0, False),  # shuffle-free probe, 1 lang agg
    # q87: the K iteration aggs run eagerly during centroid training (each
    # ONE map-side-combinable groupBy(cid, dim) over the persisted emb);
    # the live plan is the final per-cid agg + broadcast checksum join.
    ("q87_kmeans", 1, 0, False),
    # q88: wedge join + closing probe on the persisted oriented edges
    # (2 exchanges); the single-partition exchange is the 1-row total_tri
    # fold, whose BNLJ combine is the documented q73 bounded class.
    ("q88_triangles", 2, 1, True),
    ("q89_dup_span_coverage", 2, 0, False),  # h-count agg + doc_id window
    ("q90_scd2_intervals", 1, 0, False),  # both windows ride one exchange
    ("q91_threshold_sweep", 2, 1, False),  # score agg + ≤101-row window
    # q92: doc_id window+rebuild ride one exchange; chunk-hash count agg
    # is the second (the persisted chunk table roots the claim join)
    ("q92_cdc_chunk_dedup", 2, 0, False),
    # q93: (cid,label) agg over the memoized q87 assignment + a window
    # over the bounded k·|labels| cell table
    ("q93_cluster_purity", 2, 0, False),
    # q94: per-round vote agg + anti-join over the persisted label table;
    # edges root at the memoized candidate-pair InMemoryTableScan
    ("q94_label_spreading", 3, 0, False),
    # q95: the BNLJ is the DELIBERATE bounded audit arm — broadcast
    # brute-force of the 1/50 query sample (q12's oracle-twin class);
    # the single-partition exchange is the ≤ k+1-row histogram window
    ("q95_ann_recall", 8, 1, True),
    # q96/q97: same audit frame as q95 — the multi-probe / SQ8-ADC arms
    # add only broadcast probe joins and pure column maps (not counted),
    # so the live shape is identical
    ("q96_ann_multiprobe", 8, 1, True),
    ("q97_sq8_recall", 8, 1, True),
    # q98: distinct-offset start agg (countDistinct = 2 exchanges on the
    # phrase-filtered postings) + the per-doc re-agg over occurrence rows
    ("q98_phrase_search", 3, 0, False),
    # q99: q59's bounded bin agg + the CDF window over the tiny bin table
    ("q99_range_split_points", 2, 0, False),
    # q100: ONE corpus-scale (lang, hb) histogram agg + the selected-
    # subset window; everything else (apportionment windows, CDF walk,
    # final folds) replays over the persisted ≤65536·langs-row histogram.
    # The 3 single-partition exchanges are the bounded ≤n_langs-row
    # apportionment windows (q65's class).
    ("q100_quota_split", 10, 3, False),
    # q101: trigram explode → ≤256-row profile agg (its ppm window is the
    # single-partition exchange over that bounded table), broadcast
    # profile join, ONE (doc_id) score agg + the docs left join; the
    # confusion matrix folds map-side.
    ("q101_lang_id", 4, 1, False),
    # q102: identical audit frame to q95/q96/q97 — PQ training runs
    # eagerly (bounded d·k collects); the live plan adds only the
    # broadcast-codebook reconstruction map over the memoized index.
    ("q102_pq_adc_recall", 8, 1, True),
    # q103: ONE corpus fold to the bounded (event_type, hour) table;
    # median/MAD windows partition by event_type over that table only.
    ("q103_rate_anomaly", 3, 0, False),
    # q104: cluster sizes + weights over the memoized LP label table
    # (graph nodes only), docs left join on doc_id + ONE lang rollup.
    ("q104_dedup_weights", 5, 0, False),
    # q108: TWO map-side-combinable corpus folds to ≤256 rows each (the
    # full-outer join reuses their bkt hashing); the single-partition
    # exchange is the TVD fold over the bounded 256-row table.
    ("q108_token_drift", 3, 1, False),
    # q107: the composed training-prep DAG — live work is the filter
    # scan + keeper window + BPE-vocab tokenize join + shard window;
    # the 4 single-partition exchanges are the bounded ≤16-row
    # cross-shard offset window and the three 1-row funnel aggs, whose
    # combines are the documented bounded-BNLJ class.
    ("q107_training_prep", 8, 4, True),
    # q106: q102's audit frame + the refine stage, at the SAME exchange
    # count — the bounded (|queries|·4k-row) shortlist joins ride
    # broadcasts (memoized index on one side, tiny query table on the
    # other); refine adds zero corpus-scale shuffles.
    ("q106_pq_rerank", 8, 1, True),
    # q105: q85's encode shape with a LEFT join (OOV must survive), so the
    # cold initial plan can't build-left: SMJ on word (2 exchanges — the
    # intended 100-TB shape; AQE swaps in the vocab broadcast at runtime
    # once the InMemoryRelation materializes) + ONE (split, lang) agg.
    ("q105_tokenizer_equity", 3, 0, False),
]


def live_shape(df):
    """(total_exchanges, single_partition_exchanges, cartesian, bnlj) of
    the shuffles this plan will actually execute."""
    p = df._jdf.queryExecution().executedPlan()
    if p.nodeName() == "AdaptiveSparkPlan":
        p = p.initialPlan()
    total = single = 0
    cart = bnlj = False
    stack = [p]
    while stack:
        n = stack.pop()
        nm = n.nodeName()
        if nm == "Exchange":
            total += 1
            if n.outputPartitioning().toString() == "SinglePartition":
                single += 1
        elif nm == "BroadcastNestedLoopJoin":
            bnlj = True
        elif nm == "CartesianProduct":
            cart = True
        c = n.children()
        for i in range(c.size()):
            stack.append(c.apply(i))
    return total, single, cart, bnlj


@pytest.mark.parametrize(
    "name,max_ex,max_single,allow_bnlj", _PINS, ids=[p[0] for p in _PINS]
)
def test_plan_shape(spark, name, max_ex, max_single, allow_bnlj):
    total, single, cart, bnlj = live_shape(Q.QUERIES[name](spark, _SF))
    assert not cart, name
    if not allow_bnlj:
        assert not bnlj, name
    assert total <= max_ex, f"{name}: {total} exchanges (pinned ≤ {max_ex})"
    assert single <= max_single, (
        f"{name}: {single} single-partition exchanges (pinned ≤ {max_single})"
    )


def test_q78_bucketed_join_is_colocated(spark):
    """The whole point of q78: both bucketed scans feed the sort-merge join
    with NO exchange and NO sort — the layout pays for the join. The single
    pinned exchange (test above) is the final per-label aggregation."""
    df = Q.QUERIES["q78_bucketed_join"](spark, _SF)
    p = df._jdf.queryExecution().executedPlan()
    if p.nodeName() == "AdaptiveSparkPlan":
        p = p.initialPlan()
    names = []
    stack = [p]
    while stack:
        n = stack.pop()
        names.append(n.nodeName())
        c = n.children()
        for i in range(c.size()):
            stack.append(c.apply(i))
    assert "SortMergeJoin" in names
    assert "Sort" not in names, names
