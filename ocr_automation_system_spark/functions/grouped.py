"""Grouped-map operators (``applyInPandas``): whole-group pandas/NumPy
computation per key — the API tier between column expressions (JVM) and
``mapInPandas`` (per-batch, no grouping).

Use when the per-group computation genuinely needs the whole group as a
frame (order statistics, normalization against group aggregates). Each
group must fit one worker's memory — fine for per-host/per-source keys,
NOT for a power-law key with a mega-group (salt first, see
functions/util.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

PROFILE_SCHEMA = ("source string, n_docs long, mean_chars double, "
                  "median_chars double, max_chars long")


def source_length_profile(documents: DataFrame) -> DataFrame:
    """Per-source document-length profile (count / mean / exact median /
    max of n_chars) computed group-at-a-time in pandas.

    The median is the reason this is a grouped map: exact order statistics
    need the whole group (Spark's JVM `median` matches, but downstream
    profiles add trimmed means / MAD where no builtin exists — this is the
    extension point). One shuffle on the group key."""

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        chars = pdf["n_chars"].to_numpy(dtype=np.int64)
        return pd.DataFrame([{
            "source": pdf["source"].iloc[0],
            "n_docs": len(chars),
            "mean_chars": round(float(chars.mean()), 6),
            "median_chars": float(np.median(chars)),
            "max_chars": int(chars.max()),
        }])

    return (
        documents.select("source", "n_chars")
        .groupBy("source")
        .applyInPandas(profile, PROFILE_SCHEMA)
    )
