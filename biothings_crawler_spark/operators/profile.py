"""Column profiling + snapshot drift — the data-contract gate between
crawl rounds: profile every column of a round's output (row count,
null rate, distinct cardinality), diff against the previous round's
profile, and flag the columns whose shape moved — the cheap tripwire
that catches a broken extractor (nulls spike), an exploded enum (a
parser starts emitting raw strings), or a collapsed join (rows crater)
BEFORE the round is promoted.  snapshot_diff answers "which pages
changed"; this answers "did the TABLE's contract change".

Exactness: counts only — no floats, no min/max string casts (numeric
formatting differs across engines); every rate is integer ppm.

Scale shape: one aggregate per profiled column, unioned — on a
columnar source each agg prunes to its single column, so the table is
read once per column with no Expand blow-up, and each agg is a
map-side-combinable count. The profile output is |columns| rows; the
drift join is trivially broadcast.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """``(column, n_rows, n_null, n_distinct, null_ppm)`` per profiled
    column — n_distinct counts non-null values exactly."""
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).cast("long")
                .alias("n_null"),
                F.countDistinct(F.col(c)).cast("long").alias("n_distinct"),
            ).select(F.lit(c).alias("column"), "n_rows", "n_null",
                     "n_distinct")
        )
    prof = reduce(lambda a, b: a.unionByName(b), parts)
    return prof.withColumn(
        "null_ppm",
        F.expr("CASE WHEN n_rows = 0 THEN 0L "
               "ELSE n_null * 1000000 div n_rows END"),
    )


def profile_drift(
    old: DataFrame, new: DataFrame, null_tol_ppm: int = 10_000,
    distinct_tol_ppm: int = 200_000,
) -> DataFrame:
    """Diff two column profiles: ``(column, rows_old, rows_new,
    null_ppm_old, null_ppm_new, distinct_old, distinct_new,
    distinct_delta_ppm, flag)`` — ``flag`` is 'null_spike' when the
    null rate grew more than ``null_tol_ppm``, 'cardinality' when
    distinct count moved more than ``distinct_tol_ppm`` relative to
    old, else 'ok'. Absolute-value deltas are computed with integer
    arithmetic only."""
    o = old.select(
        "column",
        F.col("n_rows").alias("rows_old"),
        F.col("null_ppm").alias("null_ppm_old"),
        F.col("n_distinct").alias("distinct_old"),
    )
    n = new.select(
        "column",
        F.col("n_rows").alias("rows_new"),
        F.col("null_ppm").alias("null_ppm_new"),
        F.col("n_distinct").alias("distinct_new"),
    )
    j = o.join(n, "column")
    delta = F.expr(
        "CASE WHEN distinct_old = 0 THEN 1000000 "
        "ELSE abs(distinct_new - distinct_old) * 1000000 div distinct_old "
        "END"
    )
    return j.select(
        "column", "rows_old", "rows_new", "null_ppm_old", "null_ppm_new",
        "distinct_old", "distinct_new",
        delta.cast("long").alias("distinct_delta_ppm"),
        F.when(
            F.col("null_ppm_new") - F.col("null_ppm_old") > null_tol_ppm,
            F.lit("null_spike"),
        )
        .when(delta > distinct_tol_ppm, F.lit("cardinality"))
        .otherwise(F.lit("ok")).alias("flag"),
    )


def census_share_rank(
    cells: DataFrame,
    group_cols: list,
    n_col: str,
    tiebreak_cols: list,
) -> DataFrame:
    """Shared census rollup: append exact ``share_ppm`` (n·10⁶ div the
    group total) and ``rank`` (row_number by n desc, then the given
    tie-breaks asc) to a (group..., item..., n) cell table — the
    group-total join + window shape three census operators
    (schema_signatures, event_transitions, url_path_templates) share;
    one definition keeps the ppm/tie-break semantics from drifting
    apart (review finding)."""
    from pyspark.sql import Window as W

    tot = cells.groupBy(*group_cols).agg(F.sum(n_col).alias("_t"))
    w = W.partitionBy(*group_cols).orderBy(
        F.desc(n_col), *tiebreak_cols)
    return cells.join(tot, group_cols).select(
        *cells.columns,
        F.expr(f"{n_col} * 1000000 div _t").cast("long")
        .alias("share_ppm"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def schema_signatures(
    df: DataFrame,
    group_col: str = "grp",
    json_col: str = "payload",
) -> DataFrame:
    """JSON payload schema census per group — the semi-structured
    companion of the column-profile drift gate: producers evolve
    event payloads silently (new keys, reordered keys, truncated
    writes), and a 100-TB ingest wants "event_type X has 3 payload
    schemas this week, the dominant one at 94%, plus 0.2% malformed"
    BEFORE a downstream extractor starts returning NULLs.

    The signature is the comma-joined SORTED top-level key set, so
    key ORDER changes (serializer swaps — the classic false alarm)
    collapse to one schema while genuine key additions/removals
    split. Malformed payloads get the '<invalid>' signature instead
    of killing the stage (decode_err policy).

    Shape: row-local key extraction + sort (codegen JSON path), one
    hash agg to (group, signature) cells, share/rank over the
    bounded cell census. Output: (group, signature, n, share_ppm,
    rank).
    """
    # three-way signature (review finding): json_object_keys is NULL
    # for BOTH malformed payloads and valid non-objects, while the
    # DuckDB twin's json_keys returns [] for valid arrays/scalars --
    # a '<non-object>' lane keeps the engines exact and the monitor
    # honest (an array-typed producer is drift, not corruption)
    keys = F.json_object_keys(F.col(json_col))
    valid = F.get_json_object(F.col(json_col), "$").isNotNull()
    sig = (
        F.when(keys.isNotNull(), F.array_join(F.array_sort(keys), ","))
        .when(valid, F.lit("<non-object>"))
        .otherwise(F.lit("<invalid>"))
    )
    cells = df.select(
        F.col(group_col).alias("grp"), sig.alias("signature")
    ).groupBy("grp", "signature").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    return census_share_rank(cells, ["grp"], "n", ["signature"]).select(
        F.col("grp").alias("group"), "signature", "n",
        "share_ppm", "rank",
    )


def mad_outliers(
    df: DataFrame,
    group_col: str = "grp",
    value_fx_col: str = "x",
    k_num: int = 3,
) -> DataFrame:
    """Robust per-group outlier census: median + MAD (median absolute
    deviation) with a ``|x − med| > k·MAD`` flag — the monitoring
    gate mean/σ profiling gets WRONG on crawl-shaped data, where the
    outliers themselves inflate σ until nothing is flagged (masking).
    MAD has a 50% breakdown point; ±3·MAD is the textbook robust
    fence (Leys et al. 2013).

    Exactness: values arrive as fixed-point integers; both medians
    are the LOWER median (rank ``(n+1) div 2`` in ascending order —
    rank-based selection is deterministic under duplicate values, and
    avoids the even-count averaging whose halving DuckDB and Spark
    round differently).  The degenerate MAD == 0 case (over half the
    group identical) flags every off-median value — the standard MAD
    caveat, documented rather than patched.

    Shape: two group-keyed window passes (rank within group) + bounded
    per-group aggregates. For groups too large to window, the exact
    distributed-selection quantile plane (operators/quantiles.py) is
    the drop-in replacement for the median steps; this operator is
    the bounded-group formulation.

    Output: (group, n, med_fx, mad_fx, n_outliers, outlier_ppm).
    """
    from pyspark.sql import Window as W

    x = F.col(value_fx_col)
    n_w = W.partitionBy(group_col)
    r_w = W.partitionBy(group_col).orderBy(value_fx_col)
    med = df.select(
        F.col(group_col).alias("grp"), x.alias("x"),
        F.row_number().over(r_w).alias("_r"),
        F.count(F.lit(1)).over(n_w).alias("_n"),
    ).filter(F.col("_r") == F.expr("(_n + 1) div 2")) \
        .select("grp", F.col("x").alias("med_fx"),
                F.col("_n").cast("long").alias("n"))
    dev = df.select(F.col(group_col).alias("grp"), x.alias("x")) \
        .join(med, "grp") \
        .withColumn("d", F.abs(F.col("x") - F.col("med_fx")))
    mad_w = W.partitionBy("grp").orderBy("d")
    mad = dev.select(
        "grp", "d", F.row_number().over(mad_w).alias("_r"),
        F.col("n"),
    ).filter(F.col("_r") == F.expr("(n + 1) div 2")) \
        .select("grp", F.col("d").alias("mad_fx"))
    flagged = dev.join(mad, "grp").select(
        "grp", "n", "med_fx", "mad_fx",
        (F.col("d") > k_num * F.col("mad_fx")).cast("long").alias("_o"),
    )
    return flagged.groupBy("grp", "n", "med_fx", "mad_fx").agg(
        F.sum("_o").cast("long").alias("n_outliers"),
        F.expr("sum(_o) * 1000000 div count(1)").cast("long")
        .alias("outlier_ppm"),
    ).select(F.col("grp").alias("group"), "n", "med_fx", "mad_fx",
             "n_outliers", "outlier_ppm")
