"""Streaming CUSUM drift alarms — the live twin of the batch
operator (operators/temporal.cusum_drift, Page 1954): per-host
one-sided CUSUM over fetch latencies, updated every micro-batch, so a
host whose latency distribution shifts (overload, throttling, a CDN
path change) raises an alarm DURING the crawl round rather than in
the post-hoc report.

The batch form computes the max(0, s + d) recurrence with a
prefix-sum closed form over windows; the recurrence itself is
trivially incremental, so stream state per host is just the pair
(current stat s, observation count) — O(1) per host, no history, and
the state store checkpoints it so kill/restart resumes mid-series
with bit-identical stats (the pytest drives exactly that, and pins
stream-final stats to the batch operator's last row per host).

Rows inside a micro-batch are folded in (ts, seq) order; hosts are
independent keys, so the operator shards to any executor count with
no cross-key coordination — the same state-never-leaves-its-key
argument as the trending and token-bucket streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = "host string, n_obs long, stat long, alarm boolean"
STATE_SCHEMA = "s long, n long"


def cusum_step(s: int, latencies, k: int):
    """Pure-Python recurrence (also the pytest reference):
    s <- max(0, s + (x - k)) per observation; returns final s."""
    for x in latencies:
        s = max(0, s + (int(x) - k))
    return s


def cusum_drift_stream(
    fetches: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    seq_col: str = "seq",
    latency_col: str = "latency_us",
    k: int = 650_000,
    h: int = 5_000_000,
) -> DataFrame:
    """Streaming (host, ts, seq, latency_us) rows -> per-host CUSUM
    state after every micro-batch: ``(host, n_obs, stat, alarm)`` in
    update mode, ``alarm = stat >= h``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    kk, hh = int(k), int(h)

    def step(key, pdfs, state: GroupState):
        import pandas as pd

        s, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, seq_col])
            s = cusum_step(int(s), list(pdf[latency_col]), kk)
            n = int(n) + len(pdf)
        state.update((int(s), int(n)))
        yield pd.DataFrame(
            {"host": [key[0]], "n_obs": [int(n)], "stat": [int(s)],
             "alarm": [bool(s >= hh)]}
        )

    return fetches.groupBy(host_col).applyInPandasWithState(
        step, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout,
    )
