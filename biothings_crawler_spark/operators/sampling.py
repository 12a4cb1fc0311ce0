"""Deterministic mixture sampling for training-data composition: keep
each document with a per-stratum probability (the "data mixing" step
that turns a raw web corpus into a weighted pretraining mix — e.g.
upsample curated sources, downsample generic crawl).

Two deliberate design points for 100 TB:

* **Zero shuffle.** The keep/drop decision is a pure row-local
  predicate — a 60-bit md5 hash of (seed, id) compared against a
  per-stratum integer threshold. No sort, no window, no exchange;
  the filter rides the scan. (Count-exact per-stratum top-k, when
  needed, is already the politeness operator: select_politely's
  two-phase salted window IS a stratified-k sampler.)
* **Cross-engine exact.** Engine RNGs aren't portable; md5 is.
  u = int(md5(seed:id)[:15], 16) is uniform on [0, 2^60) and
  byte-identical in Spark and DuckDB, so sampling decisions — not
  just sample sizes — are oracle-verifiable (q_mixture_sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

U60_MAX = 1 << 60


def hash_u60_col(id_col: Column, seed: str) -> Column:
    """Deterministic uniform BIGINT on [0, 2^60): the first 15 hex
    chars of md5(seed:id). Matches DuckDB's
    ('0x' || substr(md5(seed || ':' || id), 1, 15))::BIGINT — including
    for NULL ids: concat (not concat_ws) propagates the NULL, so a
    null-id row hashes to NULL, fails every threshold comparison, and
    is dropped on both engines (concat_ws would silently collapse all
    null ids onto the single hash md5(seed), keeping or dropping them
    en masse)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def rate_threshold(rate: float) -> int:
    """Integer keep-threshold for a [0,1] rate — compare u60 < this."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * U60_MAX)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    seed: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability rates[s]
    (deterministic in (seed, id); strata missing from ``rates`` use
    ``default_rate``). Returns the surviving rows unchanged."""
    u = hash_u60_col(F.col(id_col), seed)
    thr: Column = F.lit(rate_threshold(default_rate))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == s, F.lit(rate_threshold(r))).otherwise(thr)
    return df.filter(u < thr)
