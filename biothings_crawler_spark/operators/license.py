"""License detection for training-data compliance — The-Stack-style
(Kocetkov et al. 2022) permissive-license gating beside the AI/TDM
opt-out census (operators/robots ai_optout) and the domain blocklist.

A code/webtext corpus build must route documents by license BEFORE
mixing: SPDX identifier lines are authoritative when present
(machine-readable, the REUSE spec), else a bounded phrase scan over
the header window classifies the common families (MIT / Apache-2.0 /
BSD-3-Clause / GPL / Unlicense).  ``permissive`` implements The
Stack's inclusion rule: MIT, Apache-2.0, BSD-3-Clause, Unlicense keep;
copyleft (GPL) and unknown drop.

Scale shape: ONE whole-stage-codegen projection — the scan window is
``substring(text, 1, header_chars)`` so the regex cost is bounded per
row regardless of document length, there is no shuffle, and predicates
on the result column push into the corpus scan.  Detection and
redaction idioms (literal phrases, RE2-compatible classes) are shared
verbatim with the DuckDB oracle, the operators/pii.py discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# literal header phrases, one per license family — chosen from the
# canonical license texts' first distinctive sentence so RE2 and Java
# regex agree trivially (no classes beyond the SPDX id charset)
SPDX_RE = r"SPDX-License-Identifier: ([A-Za-z0-9.\-]+)"
PHRASES = [
    ("MIT", "Permission is hereby granted, free of charge"),
    ("Apache-2.0", "Licensed under the Apache License, Version 2.0"),
    ("BSD-3-Clause", "Redistribution and use in source and binary forms"),
    ("Unlicense", "This is free and unencumbered software"),
    ("GPL-3.0-only", "GNU General Public License"),
]
PERMISSIVE = ("MIT", "Apache-2.0", "BSD-3-Clause", "Unlicense")


def _detect(win: Column) -> tuple[Column, Column]:
    spdx = F.regexp_extract(win, SPDX_RE, 1)
    phrase = None
    for lic, p in reversed(PHRASES):
        cond = F.when(win.contains(F.lit(p)), F.lit(lic))
        phrase = cond.otherwise(phrase) if phrase is not None else cond
    lic_col = F.when(spdx != "", spdx).otherwise(
        F.coalesce(phrase, F.lit("unknown")))
    det_col = (
        F.when(spdx != "", F.lit("spdx"))
        .when(phrase.isNotNull(), F.lit("phrase"))
        .otherwise(F.lit("none"))
    )
    return lic_col, det_col


def detect_licenses(docs: DataFrame, text_col: str = "text",
                    header_chars: int = 600) -> DataFrame:
    """Append (license, detector, permissive) to a corpus: SPDX id wins
    over phrase heuristics wins over 'unknown'; the scan is bounded to
    the first ``header_chars`` characters (real headers lead the file;
    a 100 MB document costs the same as a 1 KB one).  The detection
    runs EXACTLY ONCE per row (``once_col`` barrier): without it,
    ``.filter(permissive = 1 OR license = 'unknown')`` pushes the
    predicate below the projection, substituting the whole detection
    chain — with the caller's text extraction inside ``win`` — into
    the filter once per disjunct, and FilterExec does no common-
    subexpression elimination, so each of win's ~7 references re-runs
    the full html->text regex chain (measured 6.4 s vs 1.3 s on the
    20k-page release-pipeline input)."""
    from biothings_crawler_spark.operators.text import once_col

    win = F.substring(F.col(text_col), 1, header_chars)
    lic, det = _detect(win)
    st = once_col(F.struct(lic.alias("l"), det.alias("d")))
    return docs.withColumn("_lic_st", st).select(
        *docs.columns,
        F.col("_lic_st.l").alias("license"),
        F.col("_lic_st.d").alias("detector"),
    ).withColumn(
        "permissive",
        F.when(F.col("license").isin(*PERMISSIVE), F.lit(1))
        .otherwise(F.lit(0)).cast("long"),
    )
