"""Shared helpers replicating the external driver's correctness gate:
order-insensitive value digest over a pandas frame (columns sorted by
name, floats via repr, None/NaN unified)."""

from __future__ import annotations

import hashlib

import pandas as pd


def norm_cell(v) -> str:
    if v is None or v != v:  # None / NaN
        return "␀"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def frame_digest(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "\x1f".join(norm_cell(r[c]) for c in cols)
        for r in pdf.to_dict("records")
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]
