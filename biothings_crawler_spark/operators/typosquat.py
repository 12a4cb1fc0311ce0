"""Typosquat / host-spoof candidate detection: every pair of hostnames
at edit distance exactly 1, without an all-pairs comparison.

Phishing mirrors and parked typo-farms sit one edit from a legitimate
host (``examp1e.org``, ``exmaple.org``); a crawler feeding an LLM
corpus wants them flagged before their boilerplate pollutes the host
reputation planes.  All-pairs Levenshtein is O(n^2) — dead at 10^8
hosts.  FastSS (Bocek et al., "Fast similarity search in large
dictionaries", U. Zurich TR 2007) turns edit-distance-1 into an
EQUI-JOIN: two strings are within one edit iff their 1-deletion
neighborhoods (each string plus every single-character deletion of it)
intersect — a substitution meets at the shared deletion position, an
insertion/deletion meets at the shorter string itself.

Shape: one row-local ``transform``/``posexplode`` builds the (host,
variant) index — |host|+1 rows per host — then a self equi-join on
``variant`` (plain shuffle join on a short key), pair dedup, and an
exact ``levenshtein(a, b) = 1`` verification on the candidate sliver.
No crossJoin anywhere; candidate volume is bounded by true near-pairs
plus hash-bucket noise, the same banding argument as MinHash LSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood_col(s: Column) -> Column:
    """Array of ``s`` itself plus every single-character deletion of
    ``s`` (index 0 = the string itself), all JVM expressions."""
    return F.transform(
        F.sequence(F.lit(0), F.length(s)),
        lambda i: F.when(i == 0, s).otherwise(
            F.concat(F.substring(s, F.lit(1), i - 1),
                     F.substring(s, i + 1, F.length(s)))))


def typosquat_pairs(df: DataFrame, host_col: str) -> DataFrame:
    """Distinct host pairs ``(host_a < host_b)`` at edit distance
    exactly 1, via the deletion-neighborhood equi-join."""
    hosts = df.select(F.col(host_col).alias("h")).distinct()
    idx = hosts.select(
        "h", F.explode(deletion_neighborhood_col(F.col("h")))
        .alias("variant"))
    a = idx.alias("a")
    b = idx.alias("b")
    cand = (a.join(b, "variant")
            .select(F.col("a.h").alias("host_a"),
                    F.col("b.h").alias("host_b"))
            .filter(F.col("host_a") < F.col("host_b"))
            .distinct())
    return (cand
            .filter(F.levenshtein("host_a", "host_b") == 1)
            .select("host_a", "host_b"))
