"""Shared plan helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin rebalance IFF the plan has fewer partitions than cores.

    CPU-bound row-wise operators (shingling, hashing, extraction UDFs) are
    throttled to the scan's split count; a small parquet file is one
    non-splittable row group, so on local[32] it would run on 1 core. At
    production scale the Iceberg scan yields >> cores splits and this is a
    no-op — the repartition only fires on split-starved inputs, costing one
    narrow-input shuffle that the downstream stages amortize immediately.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
