"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator (SURVEY.md §2 + the
corpus-curation extensions) as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives the DuckDB-runnable ANSI-SQL twin for each
SQL-expressible one. The implementations live in
``ocr_automation_system_spark/queries.py``; this file is the thin contract
shim so the package stays importable on executors via --py-files.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_automation_system_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the corpus-curation document profile over sf0.001 —
    usability gate + language ID + quality scoring + token counting +
    dedup fingerprint in one narrow whole-stage-codegen pass."""
    from pyspark.sql import functions as F

    from ocr_automation_system_spark.functions import text as T

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    txt = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        T.is_text_usable(txt).alias("usable"),
        T.lang_id(txt).alias("lang_pred"),
        F.round(T.quality_score(txt), 2).alias("quality"),
        T.ws_token_count(txt).alias("ws_tokens"),
        T.bpe_token_count(txt).alias("bpe_tokens"),
        T.content_hash(txt).alias("content_hash"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 checklist)."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every query. The pipeline/multimodal queries run
    against precomputed twin parquet artifacts (see
    ``ocr_automation_system_spark/oracle/twin.py``): the extraction stage is
    recomputed serially with the pure-Python oracle, and the SQL implements
    the relational stages (adapters/join/rules/report/checks) independently.
    Rendering materializes the artifacts for the driver's sf0.01 corpus."""
    from ocr_automation_system_spark.queries import rendered_oracle_sql

    return rendered_oracle_sql("/root/testdata/sf0.01")
