"""Custom stateful streaming operator: per-source incremental cursor
via ``applyInPandasWithState``.

The batch engine's incremental scan (streaming/incremental.py, the
Figshare date-cursor pattern — crawler/spiders/incremental.py behavior)
reads its cursor from the catalog between runs. The streaming variant
here keeps that cursor in Structured Streaming's STATE STORE instead:
each micro-batch emits only records strictly newer than the stored
per-source cursor, then advances it — so late or replayed records are
suppressed exactly once-per-content, and a killed query restarted on
the same checkpoint resumes with its cursors intact (the state store is
part of the checkpoint). This is the ``applyInPandasWithState``
custom-stateful-operator surface (SURVEY §2.11), Arrow-batched like
every other Python stage in the engine.

Scale note: state is partitioned by the group key (source) — a few
hundred sources means trivial state; for per-host cursors at 10^7
hosts the same operator shape holds because the state store shards by
key across executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

RECORD_SCHEMA = "source string, rec_id string, ts long"
_STATE_SCHEMA = "cursor long"
_MIN_CURSOR = -(1 << 62)


def incremental_cursor_stream(records: DataFrame) -> DataFrame:
    """records (streaming; source, rec_id, ts) -> only records with
    ts greater than the per-source cursor persisted in stream state;
    the cursor then advances to the max emitted ts."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def step(key, pdfs, state: GroupState):
        cursor = state.get[0] if state.exists else _MIN_CURSOR
        new_cursor = cursor
        out = []
        for pdf in pdfs:
            fresh = pdf[pdf["ts"] > cursor]
            if len(fresh):
                out.append(fresh[["source", "rec_id", "ts"]])
                new_cursor = max(new_cursor, int(fresh["ts"].max()))
        state.update((new_cursor,))
        for f in out:
            yield f

    return records.groupBy("source").applyInPandasWithState(
        step, RECORD_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )


REQUEST_SCHEMA = "host string, url string, priority long"
ADMITTED_SCHEMA = "host string, url string, priority long, batch_rank long"
_BUCKET_STATE_SCHEMA = "tokens long"


def token_bucket_stream(
    requests: DataFrame,
    refill_per_batch: int = 2,
    burst: int = 5,
) -> DataFrame:
    """Streaming politeness admission: a per-HOST token bucket in the
    state store.  Each micro-batch a host's bucket refills by
    ``refill_per_batch`` (capped at ``burst``), the batch's requests
    are ordered deterministically (priority desc, url asc), and only
    as many as there are tokens pass — the streaming twin of the batch
    plane's ``select_politely`` quota window, with the budget CARRIED
    ACROSS batches: a host idle for three batches earns a burst, a
    hammered host stays pinned at the refill rate.  Unadmitted
    requests are dropped here (in the crawl loop they remain in the
    frontier and re-enter next round — same contract as the batch
    ``defer_unselected``).

    Admitted rows carry ``batch_rank`` (1-based admission order within
    the batch) so downstream fetchers preserve the politeness order.
    State = one BIGINT per host, sharded by group key across
    executors; restart resumes buckets from the checkpointed state
    store (pytest-verified).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cap = int(burst)
    refill = int(refill_per_batch)

    def step(key, pdfs, state: GroupState):
        tokens = state.get[0] if state.exists else cap
        tokens = min(cap, tokens + (refill if state.exists else 0))
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(
            ["priority", "url"], ascending=[False, True], kind="mergesort"
        )
        n = min(tokens, len(batch))
        out = batch.iloc[:n][["host", "url", "priority"]].copy()
        out["batch_rank"] = range(1, n + 1)
        state.update((tokens - n,))
        yield out

    return requests.groupBy("host").applyInPandasWithState(
        step, ADMITTED_SCHEMA, _BUCKET_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
