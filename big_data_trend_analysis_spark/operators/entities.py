"""Entity-extraction operators (reference N2/F3 capability).

The reference runs spaCy NER producer-side and ships entity lists in
the message payload (``fake_producer.py:48-51``,
``twitter_producer.py:37-39``); here extraction is engine-side via the
Arrow-batched pandas UDF ``functions.nlp.extract_entities`` and the
aggregation over entities is an ordinary distributed explode+groupBy.

Scale posture: the pandas UDF is the enrich stage (one Arrow pass over
the text column); everything after it is JVM-side. The top-k is a
TakeOrdered over the tiny (entity, freq) relation, never a global sort
of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_trend_analysis_spark.functions.nlp import extract_entities


def entity_extract(documents: DataFrame) -> DataFrame:
    """Per-document entity list: (doc_id, entities array<string>)."""
    return documents.select(
        "doc_id", extract_entities(F.col("text")).alias("entities")
    )


def entity_counts(documents: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-wide entity frequencies, top-k with deterministic ties.

    extract_entities (pandas UDF) → explode → groupBy(entity) → count →
    order by (freq DESC, entity ASC) LIMIT k. The global ordering is
    total (entity is unique after the groupBy), so the limited result
    is deterministic and oracle-matchable; Spark executes it as
    TakeOrdered (per-partition heaps, no global sort).
    """
    return (
        entity_extract(documents)
        .select(F.explode("entities").alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("entity"))
        .limit(k)
    )
