"""Streaming heavy hitters — which hosts are trending in the fetch
stream RIGHT NOW, in bounded memory.

A 10^10-URL crawl cannot keep an exact per-host counter table in
stream state (hosts are unbounded: parked-domain farms mint them
faster than they can be counted).  SpaceSaving (Metwally, Agrawal &
El Abbadi, "Efficient computation of frequent and top-k elements in
data streams", ICDT 2005) keeps a FIXED table of m (host, count,
error) entries: a known host increments; an unknown host EVICTS the
current minimum and inherits its count as its error bound.
Guarantees: every true heavy hitter with frequency > n/m is in the
table, and each reported count overestimates the truth by at most its
recorded error (<= n/m).

Distribution shape: the stream is sharded by ``xxhash64(host) % n_shards``
— each shard runs an independent SpaceSaving table inside
``applyInPandasWithState`` (state = three parallel lists, checkpointed
by the state store, so kill/restart resumes the summary exactly).
Because a host maps to exactly ONE shard, the union of shard tables is
itself a valid SpaceSaving summary of the whole stream with per-shard
error bounds — merging at read time is a plain hash aggregate, no
cross-shard coordination.  That is the property that lets the operator
run at 1000 executors: state never leaves its shard.

The reference has no streaming analytics at all (Scrapy logs counters
per process); this is engine-new surface, verified against exact batch
counts at fixture scale plus the SpaceSaving bound properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "shard int, host string, cnt long, err long"
STATE_SCHEMA = "hosts array<string>, cnts array<long>, errs array<long>"


def spacesaving_update(hosts, cnts, errs, batch_hosts, m: int):
    """Pure-Python SpaceSaving table update (also the pytest
    reference): returns the three parallel lists after feeding
    ``batch_hosts`` through a capacity-``m`` table."""
    idx = {h: i for i, h in enumerate(hosts)}
    for h in batch_hosts:
        i = idx.get(h)
        if i is not None:
            cnts[i] += 1
        elif len(hosts) < m:
            idx[h] = len(hosts)
            hosts.append(h)
            cnts.append(1)
            errs.append(0)
        else:
            j = min(range(len(hosts)), key=lambda k: (cnts[k], hosts[k]))
            del idx[hosts[j]]
            idx[h] = j
            hosts[j] = h
            errs[j] = cnts[j]
            cnts[j] = cnts[j] + 1
    return hosts, cnts, errs


def trending_hosts_stream(
    fetches: DataFrame,
    host_col: str = "host",
    n_shards: int = 8,
    m: int = 16,
) -> DataFrame:
    """Streaming (host) rows -> per-shard SpaceSaving summaries,
    emitted in update mode after every micro-batch: ``(shard, host,
    cnt, err)``.  Read-side top-k = ORDER BY cnt over the union of the
    latest shard tables (each host lives in exactly one shard)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def step(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            hosts, cnts, errs = state.get
            hosts, cnts, errs = list(hosts), list(cnts), list(errs)
        else:
            hosts, cnts, errs = [], [], []
        for pdf in pdfs:
            hosts, cnts, errs = spacesaving_update(
                hosts, cnts, errs, list(pdf[host_col]), m)
        state.update((hosts, cnts, errs))
        yield pd.DataFrame({
            "shard": [int(key[0])] * len(hosts),
            "host": hosts,
            "cnt": [int(c) for c in cnts],
            "err": [int(e) for e in errs],
        })

    sharded = fetches.withColumn(
        "shard",
        (F.abs(F.xxhash64(F.col(host_col))) % n_shards).cast("int"))
    return sharded.groupBy("shard").applyInPandasWithState(
        step, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


def merge_summaries(tables: DataFrame, k: int = 10) -> DataFrame:
    """Top-k over the union of per-shard SpaceSaving tables: since a
    host lives in exactly one shard, the union IS the global summary —
    one hash-agg (latest row per host) + one ORDER BY cnt LIMIT k."""
    latest = tables.groupBy("host").agg(
        F.max(F.struct("cnt", "err")).alias("s"))
    return (latest.select(
        "host", F.col("s")["cnt"].alias("cnt"),
        F.col("s")["err"].alias("err"))
        .orderBy(F.desc("cnt"), "host").limit(k))
