"""Materialized inverted index — the engine-side analogue of the Solr/
Lucene index the reference delegates query-time work to (reference
README.md:9-10, pom.xml:87-109).

On-the-fly tokenization (search.tokenize) answers ad-hoc queries; this
module materializes ``(term, id, tf)`` postings once so repeated
full-text queries become posting joins instead of corpus scans — the
classic build-once/query-many trade Solr makes.

Layout at 100 TB: postings written ``repartitionByRange('term')`` (or
bucketed by term) so a term lookup is a partition-pruned read of one
range; document frequency is a second tiny table derivable from the
first. Query = broadcast the query terms against the postings, then
semi-join doc ids back to the store — the corpus itself is never
re-tokenized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_increment_index_spark.search.tokenize import posting_list


def build_inverted_index(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, id, tf) postings — one explode + one map-side-combined
    groupBy over the corpus."""
    return (
        posting_list(corpus, id_col, text_col)
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def write_inverted_index(postings: DataFrame, path: str, n_ranges: int = 32) -> None:
    """Persist postings range-partitioned by term (term lookups become
    partition-pruned range reads)."""
    postings.repartitionByRange(n_ranges, "term").write.mode("overwrite").parquet(path)


def term_match_ids(postings: DataFrame, id_col: str, terms: list[str], op: str = "and") -> DataFrame:
    """Doc ids matching the term set via the materialized index.

    AND = ids whose distinct matched-term count equals |terms|;
    OR = any posting hit. No corpus scan, no tokenization at query time.
    """
    terms_norm = sorted({t.lower() for t in terms})
    spark = postings.sparkSession
    tdf = spark.createDataFrame([(t,) for t in terms_norm], ["term"])
    hits = postings.join(F.broadcast(tdf), "term")
    if op == "or":
        return hits.select(id_col).distinct()
    matched = hits.groupBy(id_col).agg(F.countDistinct("term").alias("_nt"))
    return matched.filter(F.col("_nt") == len(terms_norm)).select(id_col)


def search_with_index(
    corpus: DataFrame, postings: DataFrame, id_col: str, terms: list[str], op: str = "and"
) -> DataFrame:
    """Full-text match through the inverted index: posting lookup →
    semi-join back to the document store (projection/filters on the
    store still push down — the semi-join only constrains ids)."""
    ids = term_match_ids(postings, id_col, terms, op)
    return corpus.join(ids, id_col, "left_semi")
