"""IDN homograph detection — the zero-edit-distance spoof class the
typosquat detector (deletion neighborhoods, operators/typosquat.py)
cannot see: a hostname that renders pixel-identical to another because
Cyrillic/Greek codepoints or digit lookalikes replaced Latin letters.
A crawler admitting ``sіtе.example.org`` (Cyrillic і/е) alongside
``site.example.org`` is one phishing mirror away from poisoning the
corpus; the skeleton census surfaces every such collision.

The skeleton follows UTS #39 §4's idea restricted to single-codepoint
confusables expressible as a ``translate()`` map (multi-char
confusables like rn->m are documented out of scope — they need a
regexp chain, not a map).  The map is shared verbatim with the DuckDB
oracle, both engines' translate() being codepoint-wise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOMOGRAPH_FROM = "аеорсхуіѕј01"
HOMOGRAPH_TO = "aeopcxyisjol"


def homograph_skeleton(host: Column) -> Column:
    """Confusable skeleton: Cyrillic lookalikes and 0/1 fold onto
    their Latin targets after lowercasing."""
    return F.translate(F.lower(host), HOMOGRAPH_FROM, HOMOGRAPH_TO)


def homograph_groups(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """One row per member host of a colliding skeleton:
    (skeleton, host, canonical, n_hosts), canonical = smallest member
    (in practice the all-Latin registrant).

    Scale shape: skeleton is a row-local translate; ONE skeleton hash
    agg over DISTINCT hosts — a bounded host table, never the page
    corpus — exploded back by a skeleton-keyed join.  No windows, no
    self-join."""
    h = hosts.select(F.col(host_col).alias("host")).distinct()
    sk = h.select("host", homograph_skeleton(F.col("host")).alias("skeleton"))
    grp = sk.groupBy("skeleton").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.min("host").alias("canonical"),
    ).filter(F.col("n_hosts") > 1)
    return sk.join(grp, "skeleton").select(
        "skeleton", "host", "canonical", "n_hosts")
