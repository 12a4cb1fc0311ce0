"""Integer-arithmetic HyperLogLog — a distinct-count sketch whose
ESTIMATE (not just its registers) is cross-engine exact.

Spark's approx_count_distinct and DuckDB's approx HLLs use different
hashes and float harmonic means, so they can never be oracle-paired.
This HLL derives everything from md5 (byte-identical in both engines)
and keeps the harmonic mean in integers:

  * bucket  = first 2 hex chars of md5(value)      (m = 256 registers)
  * rho     = 53 - bitlength(next 13 hex chars)    (leading-zeros+1 of
              a 52-bit suffix; 0 suffix -> capped)
  * register[bucket] = max(rho), capped at RHO_CAP = 30
  * Z       = Σ_buckets 2^(RHO_CAP - register)     -- every term an
              exact power-of-two BIGINT, so the sum COMMUTES (a float
              Σ2^-r rounds order-dependently once exponents spread
              past the 53-bit mantissa)
  * raw     = m * m * 2^RHO_CAP // Z
  * estimate = ALPHA_PPM * raw // 10^6             (α_256 ≈ 0.7123)

Every step is integer floor arithmetic — partial aggregation order
cannot change the answer, and the DuckDB twin (q_hll_distinct)
reproduces it bit for bit. Standard error ~1.04/√256 ≈ 6.5%.

Scale shape: one groupBy(bucket) max-agg (256 groups, map-side
combine does almost all the work) + a 256-row final fold — the
classic sketch shape that turns count-distinct's full shuffle into a
constant-size aggregate. No small-range/bias correction: this is the
raw LogLog-β-free estimator, fine for corpus-scale cardinalities
(pytest asserts <8% error at n=4000 and documents the regime).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 256
RHO_CAP = 30
ALPHA_PPM = 712300  # alpha_256 = 0.7213/(1 + 1.079/256) ≈ 0.71230


def hll_register_cols(value: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one value, from md5 — deterministic and
    identical in DuckDB (see SQL twin)."""
    h = F.md5(value.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    suffix = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    # bitlength via bin(): '0' -> length 1, so rho caps naturally
    rho = F.least(
        F.when(suffix > 0, F.lit(53) - F.length(F.bin(suffix))).otherwise(F.lit(RHO_CAP)),
        F.lit(RHO_CAP),
    )
    return bucket, rho


def hll_distinct(df: DataFrame, value_col: str) -> DataFrame:
    """One-row DataFrame (estimate BIGINT): the integer-HLL distinct
    count of ``value_col``."""
    bucket, rho = hll_register_cols(F.col(value_col))
    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    # empty buckets contribute the max term 2^RHO_CAP
    z = regs.agg(
        (
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {RHO_CAP} - r)"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(2**RHO_CAP)
        ).alias("z")
    )
    return z.select(
        F.expr(
            f"{ALPHA_PPM} * ({HLL_M * HLL_M} * cast({2**RHO_CAP} as bigint) div z)"
            " div 1000000"
        ).cast("long").alias("estimate")
    )
