"""Text-file article source — the reference's native input shape.

The reference reads a directory of article text files plus a stop-word file
with batched fread (/root/reference/README.md:13,:21). The Spark-first
equivalent: ``spark.read.text(..., wholetext=True)`` (one row per file, the
vectorized file source with its own batching) with the file name as the
document id, and the stop-word file as a driver-side frozenset (it is a
dimension-table-sized side input — the engine's tokenizer consumes it
broadcast, SURVEY.md O2).
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_articles(spark: SparkSession, path: str) -> DataFrame:
    """Directory of *.txt article files -> (doc_id, text); doc_id = file
    name without extension (the reference's article identity)."""
    return (
        spark.read.text(f"{path}/*.txt", wholetext=True)
        .select(
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.txt$", 1).alias("doc_id"),
            F.col("value").alias("text"),
        )
    )


def read_stopword_file(path: str | pathlib.Path) -> frozenset[str]:
    """Stop-word file (one word per line, blank lines ignored) -> frozenset
    for broadcast into the tokenizer (README.md:21's stop-word stage)."""
    words = pathlib.Path(path).read_text(encoding="utf-8").split()
    return frozenset(w.strip().lower() for w in words if w.strip())
