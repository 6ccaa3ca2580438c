"""Python UDTF surface (Spark 4) — table functions the reference has no
concept of (SURVEY §2.10: "No UDTF concept"). Provided as beyond-reference
API breadth; the hot-path guidance still applies (prefer native
explode/split compositions — see sentence_split_native below for the
expression twin used in production paths).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf


@udtf(returnType="sentence: string, n_tokens: int, idx: int")
class SentenceSplit:
    """Split a document into sentences (naive '.'/'!'/'?' boundaries),
    one output row per sentence with its token count and position."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text) if p.strip()]
        for i, p in enumerate(parts):
            yield p, len(p.split()), i


def sentence_split_native(text: Column) -> Column:
    """Expression-only twin of SentenceSplit for the hot path: an array of
    trimmed sentence structs, explodable with posexplode — whole-stage
    codegen, no Python workers."""
    parts = F.split(text, r"[.!?]+")
    return F.filter(
        F.transform(parts, lambda p: F.trim(p)), lambda p: F.length(p) > 0
    )


__all__ = ["SentenceSplit", "sentence_split_native", "lit"]
