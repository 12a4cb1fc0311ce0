"""Streaming feed poller — the Structured Streaming twin of the batch
polling step (sources/feed.parse_feed + feed_new_entries).

A production poller fetches feed XML on a schedule and appends the raw
bodies to a landing table; this job tails that table as a stream,
parses entries (the batch operator's expression chain runs unchanged
on a streaming DataFrame — it is pure projections + one explode), and
emits each entry id exactly once across restarts via
``dropDuplicates`` on entry_id with the streaming state store keeping
the seen set.

Exactly-once contract: entry ids already emitted in a previous run are
suppressed after a restart on the same checkpoint (state-store-backed
dedup), and ids repeated WITHIN a batch or across batches dedup too —
the property the pytest drives with two AvailableNow rounds over
overlapping feed snapshots on one checkpoint.

Scale note: dedup state is sharded by entry_id across executors.
Feeds re-advertise a bounded window of recent entries (the last N
items), so the id set a poller must remember is bounded per feed by
that window times the poll overlap — not by history; for unbounded
retention pair this with the batch anti-join against the persisted
entry table (sources/feed.feed_new_entries) instead, or add a
watermark on a poll-time column to age state out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from biothings_crawler_spark.sources.feed import parse_feed


def feed_entry_stream(feed_bodies: DataFrame) -> DataFrame:
    """Streaming (feed_url, body) -> new-entry rows, exactly once per
    entry_id.  ``feed_bodies`` is a streaming DataFrame (readStream on
    the landing table); the result is written with ``writeStream`` in
    append mode."""
    return parse_feed(feed_bodies).dropDuplicates(["entry_id"])
