"""Streaming sequential-funnel state machine — the custom stateful operator
showcase (``applyInPandasWithState``), streaming twin of batch q36.

Keyed by user_id; state = the earliest (view, click-after-view,
purchase-after-click) transition times in integer microseconds (the same
anchor arithmetic as queries._EV_US_SPARK — events.ts is TIMESTAMP_NTZ, so
epoch extraction is banned and an anchored timestampdiff is the portable
form). A user's row is emitted EXACTLY ONCE, in the micro-batch where the
purchase transition completes; transitions may span any number of
micro-batches (that is the point of keeping state).

In-order contract: each batch's rows replay sorted by event time, and
cross-batch arrival is assumed per-user in-order — the standard incremental
funnel semantics (a view arriving after a later click was consumed cannot
retroactively reorder committed transitions). The equality-vs-batch test
feeds time-ordered files, matching a production time-partitioned ingest.

Bounded state: EventTimeTimeout + the stream watermark — every update arms
a timeout at (user's last event time + horizon); once the watermark passes
it the user's state is evicted, complete or not. Incomplete users therefore
occupy state only for `horizon` of event time, never forever.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

EVENTS_STREAM_SCHEMA = (
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)

# same anchor as queries._EV_US_SPARK (duplicated to keep streaming modules
# import-light; pinned equal in tests/test_streaming_funnel.py)
_EV_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
_ANCHOR_EPOCH_MS = 1_704_067_200_000  # 2024-01-01 00:00:00 UTC

_FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t_view", LongType()),
        StructField("t_click", LongType()),
        StructField("t_purchase", LongType()),
    ]
)
# (t_view, t_click, t_purchase, emitted) — -1 = transition not reached
_FUNNEL_STATE = StructType(
    [
        StructField("v", LongType()),
        StructField("c", LongType()),
        StructField("p", LongType()),
        StructField("emitted", LongType()),
    ]
)

_HORIZON_US = 24 * 3_600 * 1_000_000  # state eviction horizon (1 day)


def _funnel_fn(
    key: Tuple[int], batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    v, c, p, emitted = state.get if state.exists else (-1, -1, -1, 0)
    last_us = max(v, c, p)
    for pdf in batches:
        pdf = pdf.sort_values("us")
        for et, us in zip(pdf["event_type"], pdf["us"]):
            us = int(us)
            last_us = max(last_us, us)
            if v < 0:
                if et == "view":
                    v = us
            elif c < 0:
                if et == "click" and us > v:
                    c = us
            elif p < 0:
                if et == "purchase" and us > c:
                    p = us
    if p >= 0 and not emitted:
        emitted = 1
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "t_view": [v],
                "t_click": [c],
                "t_purchase": [p],
            }
        )
    state.update((v, c, p, emitted))
    # evict once the watermark passes the user's last activity + horizon
    state.setTimeoutTimestamp(
        _ANCHOR_EPOCH_MS + (last_us + _HORIZON_US) // 1000
    )


def stream_funnel(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """view → click → purchase funnel over an event stream; one output row
    per user, at completion time. See module docstring for semantics."""
    # events.ts is TIMESTAMP_NTZ, which Spark refuses as an event-time
    # column; rebuild a real TIMESTAMP tz-free from the anchored integer
    # micros (timestamp_micros is epoch-defined — no session-timezone
    # dependence, unlike a cast).
    ev = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .parquet(input_dir)
        .select(
            "user_id",
            "event_type",
            F.expr(_EV_US).alias("us"),
        )
        .withColumn(
            "wm_ts",
            F.expr(f"timestamp_micros(us + {_ANCHOR_EPOCH_MS} * 1000)"),
        )
        .withWatermark("wm_ts", watermark)
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    )
    completed = ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        completed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
