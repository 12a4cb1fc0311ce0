"""Content-defined chunking (gear-hash CDC) for snapshot/storage
dedup.

Recrawls re-store mostly-unchanged pages; fixed-size blocks lose all
dedup after a single-byte insertion shifts every later block.
Content-defined boundaries (cut where a rolling hash of the recent
window hits a mask — Muthitacharoen et al., LBFS, SOSP'01; gear hash
and the min/max clamps after Xia et al., FastCDC, ATC'16) realign
after an edit within one average chunk, so the recrawl archive stores
each unchanged region once regardless of where edits land.  The
reference stores every crawl snapshot whole (Scrapy + ES, no delta
layer); at 100 TB with weekly recrawls the delta layer IS the storage
bill.

Execution shape: the boundary scan is ONE bounded expression fold
(``aggregate`` over ``sequence(1, length(text))``) — a JVM-side loop
per row, zero Python, zero exchange; chunk slicing + hashing is a
second row-local projection (``transform`` + ``posexplode`` + md5).
Dedup across documents is then a plain hash aggregate on
``chunk_md5`` — the scale-safe shape.  The boundary array is
materialized behind a plan cut (eager ``localCheckpoint``, the
repo-standard fix) before slicing: CollapseProject re-inlines a
``withColumn`` expression once per downstream reference, and the
slicing stage indexes into the cut array once per CHUNK — without the
cut the per-row fold re-runs per chunk (measured 96 s -> single-digit
seconds at sf0.01).  State is (cuts, last, h) with
the gear register updated LAST, so the DuckDB ``list_reduce`` twin
(which materializes struct fields in literal order, earlier fields
visible updated to later expressions) computes every field from the
pre-update register.

Gear table: 256 pseudo-random 48-bit constants generated from a fixed
affine formula at import — shared verbatim with the SQL twin (the
shared-LUT pattern: tables shared, LOGIC re-derived).  The hash is
``h = (2h + G[c mod 256]) mod 2^48``: the doubling ages a byte out of
the register after 48 steps, giving the sliding-window property
without an explicit subtract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MOD48 = 1 << 48

GEAR: tuple[int, ...] = tuple(
    (2654435761 * (b + 1) + 0x9E3779B97F4A7C15 * (b * b + 7)) % MOD48
    for b in range(256)
)


def cdc_boundaries_col(
    text: Column,
    mask: int = 0x1F,
    min_size: int = 8,
    max_size: int = 128,
) -> Column:
    """Array of cut END positions (1-based, inclusive) for ``text``,
    always terminated by ``length(text)``; empty/null text -> empty
    array.  A position i is a cut when the chunk would be at least
    ``min_size`` chars and the gear register masks to zero, or when it
    reaches ``max_size`` (the FastCDC forced cut that bounds chunk
    size for storage layout)."""
    gear = F.array(*[F.lit(v).cast("long") for v in GEAR])

    def step(acc: Column, i: Column) -> Column:
        c = F.ascii(F.substring(text, i, 1))
        h2 = (acc["h"] * 2 + F.element_at(gear, (c % 256) + 1)) % MOD48
        cut = (
            ((i - acc["last"] >= min_size) & (h2.bitwiseAND(F.lit(mask)) == 0))
            | (i - acc["last"] >= max_size))
        return F.struct(
            F.when(cut, F.concat(acc["cuts"], F.array(i.cast("int"))))
             .otherwise(acc["cuts"]).alias("cuts"),
            F.when(cut, i.cast("int")).otherwise(acc["last"]).alias("last"),
            h2.alias("h"),
        )

    def finish(acc: Column) -> Column:
        n = F.length(text).cast("int")
        return F.when(
            acc["last"] == n, acc["cuts"]
        ).otherwise(F.concat(acc["cuts"], F.array(n)))

    init = F.struct(
        F.array().cast("array<int>").alias("cuts"),
        F.lit(0).cast("int").alias("last"),
        F.lit(0).cast("long").alias("h"))
    out = F.aggregate(
        F.sequence(F.lit(1), F.length(text)), init, step, finish)
    return F.when(
        text.isNotNull() & (F.length(text) > 0), out
    ).otherwise(F.array().cast("array<int>"))


_GEAR_NP = np.asarray(GEAR, dtype=np.uint64)


def make_cdc_cuts_udf(mask: int = 0x1F, min_size: int = 8, max_size: int = 128):
    """Arrow-vectorized twin of :func:`cdc_boundaries_col` — the same
    cut array, computed by numpy instead of the interpreted per-char
    expression fold (the fold walks ``aggregate(sequence(1, n))`` in
    the expression evaluator: ~2 s per corpus pass at sf0.1, the whole
    cost of the delta-storage plane).

    Exactness (pinned by ``test_cdc_udf_matches_expression_fold``):

    * the gear register at position i is ``h_i = sum_{d=0}^{47}
      2^d * G[c_{i-d}] mod 2^48`` — terms with d >= 48 vanish because
      ``2^d ≡ 0 (mod 2^48)`` — so one batch-wide pass of 48 shifted
      adds in uint64 (wraparound is exact mod 2^64, and
      ``x mod 2^64 mod 2^48 = x mod 2^48`` since 2^48 | 2^64)
      reproduces the recurrence ``h = (2h + G[c]) mod 2^48`` bit for
      bit; docs are concatenated with 48 zero-contribution gap slots so
      the register never leaks across documents;
    * cut selection from the mask-candidate positions replays the
      fold's sequential rule exactly: from the previous cut ``last``
      the next cut is ``min(first candidate >= last+min_size,
      last+max_size)``, because the forced max-size cut is the first
      position where the second disjunct holds;
    * codepoints come from UTF-32 (``ascii(substring(text, i, 1))`` is
      the Unicode codepoint of the i-th character), NULL/empty text ->
      empty array, matching the expression's outer ``when``.
    """
    m_np = np.uint64(mask)
    mask48 = np.uint64(MOD48 - 1)
    mn, mx = int(min_size), int(max_size)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cuts_udf(text: pd.Series) -> pd.Series:
        cps: list = []
        lens: list = []
        for t in text:
            if t is None or not t:
                cps.append(None)
                lens.append(0)
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            cps.append(cp.astype(np.intp) % 256)
            lens.append(len(cp))
        # one concatenated gear-contribution array for the whole batch,
        # 48 zero slots between docs (a zero contribution is invisible
        # to the 48-term window, so registers never cross documents)
        gap = np.zeros(48, dtype=np.uint64)
        parts: list = []
        offs: list = []
        pos = 0
        for cp, n in zip(cps, lens):
            offs.append(pos)
            if n:
                parts.append(_GEAR_NP[cp])
                parts.append(gap)
                pos += n + 48
        if parts:
            g = np.concatenate(parts)
            h = np.zeros(len(g), dtype=np.uint64)
            for d in range(48):
                h[d:] += g[: len(g) - d] << np.uint64(d)
            hit = (h & mask48 & m_np) == 0
        out: list = []
        for cp, n, off in zip(cps, lens, offs):
            if cp is None:
                out.append([])
                continue
            cand = np.flatnonzero(hit[off:off + n]) + 1  # 1-based
            limit = len(cand)
            cuts: list = []
            last = 0
            while True:
                j = int(np.searchsorted(cand, last + mn))
                forced = last + mx
                nxt = int(cand[j]) if j < limit and cand[j] <= forced else forced
                if nxt >= n:
                    break
                cuts.append(nxt)
                last = nxt
            cuts.append(n)
            out.append(cuts)
        return pd.Series(out)

    return cuts_udf


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mask: int = 0x1F,
    min_size: int = 8,
    max_size: int = 128,
    impl: str = "pandas",
) -> DataFrame:
    """Explode each document into its content-defined chunks:
    ``(id, chunk_no, start, chunk_len, chunk_md5)``.  Boundary scan
    and slicing are row-local projections (the fold result is staged
    through a named column so downstream references stay leaf
    attributes); global dedup is whatever hash aggregate the caller
    runs on ``chunk_md5``."""
    if impl == "pandas":
        cuts = make_cdc_cuts_udf(
            mask=mask, min_size=min_size, max_size=max_size)(F.col(text_col))
    else:
        cuts = cdc_boundaries_col(
            F.col(text_col), mask=mask, min_size=min_size, max_size=max_size)
    staged = df.withColumn("_cuts", cuts).localCheckpoint(eager=True)
    spans = F.transform(
        F.col("_cuts"),
        lambda end, k: F.struct(
            (F.when(k == 0, F.lit(0))
              .otherwise(F.element_at(F.col("_cuts"), k)) + 1
             ).cast("int").alias("start"),
            end.alias("end")))
    exploded = (
        staged.withColumn("_spans", spans)
        .select(id_col, text_col,
                F.posexplode("_spans").alias("chunk_no", "_s")))
    start = F.col("_s")["start"]
    clen = (F.col("_s")["end"] - start + 1).cast("int")
    chunk = F.substring(F.col(text_col), start, clen)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_no").cast("int").alias("chunk_no"),
        start.alias("start"),
        clen.alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )
