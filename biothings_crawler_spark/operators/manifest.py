"""Release integrity manifests — a Merkle-style two-level digest for
corpus handoff (the missing trust piece beside delta_storage's change
tracking and url_history's provenance: when a 100 TB release ships to
a training run, both sides need a cheap proof that every shard arrived
bit-identical, and a way to localize a mismatch to one bucket instead
of re-hashing the world).

Two levels:

* leaf:   ``md5(id || ':' || md5(payload))`` per document,
* bucket: documents hash-bucket by ``md5(id)`` (content-independent,
  so re-partitioning or re-sorting the physical files never changes
  the manifest), and each bucket digests its leaves in id order:
  ``md5(concat(leaf_hash ORDER BY id))``,
* root:   ``md5(concat(bucket_hash ORDER BY bucket))`` over the
  BOUNDED bucket table.

A consumer re-verifies any single bucket with one scan of that
bucket's rows; the root pins the whole release.  Everything is exact
string md5 so the DuckDB oracle reproduces it byte-for-byte.

Scale shape: one hash agg per level.  The per-bucket digest
concatenates 32-byte leaf hashes — size ``32 * n/n_buckets``, bounded
by choosing n_buckets ~ n/10^4 (a config knob, not a sort); the root
digest runs over n_buckets rows.  No windows, no corpus sort, no
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def release_manifest(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """(bucket, n_docs, digest) per bucket plus one (-1, total, root)
    row.  Bucket assignment depends only on the id, digests only on
    (id, payload) — physical layout never leaks into the manifest."""
    leaves = df.select(
        F.col(id_col).alias("id"),
        (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10).cast("long") % n_buckets).alias("bucket"),
        F.md5(F.concat(
            F.col(id_col).cast("string"), F.lit(":"),
            F.md5(F.coalesce(F.col(payload_col), F.lit(""))),
        )).alias("leaf"),
    )
    buckets = leaves.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.md5(F.concat_ws(
            "", F.array_sort(F.collect_list(F.struct("id", "leaf"))).leaf,
        )).alias("digest"),
    )
    root = buckets.groupBy().agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.md5(F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct("bucket", "digest")))
            .digest,
        )).alias("digest"),
    ).select(F.lit(-1).cast("long").alias("bucket"), "n_docs", "digest")
    return buckets.select("bucket", "n_docs", "digest").unionByName(root)


def manifest_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Compare two release manifests (same n_buckets): rows only for
    buckets whose digest differs — the localization step of the
    verification workflow (a consumer re-scans ONLY these buckets,
    never the release).  Root rows (bucket = -1) participate like any
    bucket, so 'anything changed at all' is the presence of the -1
    row.  Full-outer on the bounded bucket key; NULL digest means the
    bucket exists on one side only."""
    aa = a.select(
        F.col("bucket"), F.col("n_docs").alias("n_docs_a"),
        F.col("digest").alias("digest_a"))
    bb = b.select(
        F.col("bucket"), F.col("n_docs").alias("n_docs_b"),
        F.col("digest").alias("digest_b"))
    return (
        aa.join(bb, "bucket", "full_outer")
        .filter(
            F.col("digest_a").isNull() | F.col("digest_b").isNull()
            | (F.col("digest_a") != F.col("digest_b")))
        .select("bucket", "n_docs_a", "n_docs_b", "digest_a", "digest_b")
    )
