"""Unit tests on hand-built fixtures for the round-2 additions:
join parsers, temperature resampling, unigram-LM scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.pipeline.sampling import temperature_resample
from hbase_increment_index_spark.pipeline.text import unigram_logprob
from hbase_increment_index_spark.search.join_parsers import (
    child_block_join,
    cross_collection_join,
    parent_block_join,
)


@pytest.fixture(scope="module")
def parents(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "pk long, pname string"
    )


@pytest.fixture(scope="module")
def children(spark):
    # parent 1 has TWO matching children (semi join must not duplicate);
    # parent 3 has only non-matching children
    return spark.createDataFrame(
        [(1, 10, "hit"), (1, 11, "hit"), (2, 20, "miss"), (3, 30, "miss")],
        "fk long, ck long, tag string",
    )


def test_parent_block_join_no_fanout(parents, children):
    out = parent_block_join(parents, children, "pk", "fk", F.col("tag") == "hit")
    rows = out.collect()
    assert {r["pk"] for r in rows} == {1}
    assert len(rows) == 1  # two matching children, parent emitted once


def test_child_block_join(parents, children):
    out = child_block_join(parents, children, "pk", "fk", F.col("pname") != "c")
    assert {r["ck"] for r in out.collect()} == {10, 11, 20}


def test_cross_collection_join(parents, children):
    out = cross_collection_join(
        parents, "pk", children, "fk", F.col("tag") == "miss"
    )
    assert {r["pk"] for r in out.collect()} == {2, 3}
    assert set(out.columns) == {"pk", "pname"}  # to-side schema unchanged


@pytest.fixture(scope="module")
def corpus(spark):
    # heavy source: 80 docs of 100 tokens; light source: 5 docs of 100
    rows = [(i, "heavy" if i < 80 else "light", 100) for i in range(85)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_toks long")


def test_temperature_resample_rates(corpus):
    out = temperature_resample(corpus, "doc_id", "n_toks", "source", alpha=0.5)
    rates = {
        r["source"]: r["keep_rate"]
        for r in out.select("source", "keep_rate").distinct().collect()
    }
    # light source keeps everything; heavy source is downsampled toward
    # the tempered share sqrt(8000)/(sqrt(8000)+sqrt(500)) of 8500 toks
    assert rates["light"] == 1.0
    expected_heavy = (
        math.sqrt(8000) / (math.sqrt(8000) + math.sqrt(500)) * 8500 / 8000
    )
    assert rates["heavy"] == pytest.approx(expected_heavy, abs=1e-4)
    kept = out.groupBy("source").count().collect()
    kept = {r["source"]: r["count"] for r in kept}
    assert kept["light"] == 5
    # hash-bucket keep is near the rate (binomial-ish tolerance)
    assert 0.6 * 80 * expected_heavy < kept["heavy"] < 1.3 * 80 * expected_heavy


def test_temperature_alpha_one_keeps_everything(corpus):
    # alpha=1 is the natural mixture: every source rate is exactly 1
    out = temperature_resample(corpus, "doc_id", "n_toks", "source", alpha=1.0)
    assert out.count() == 85
    assert out.filter(F.col("keep_rate") < 1.0).count() == 0


def test_unigram_logprob_known_answer(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    # corpus: a×2, b×1, c×1, N=4
    nll1 = -(2 * math.log(2 / 4) + 1 * math.log(1 / 4)) / 3
    nll2 = -math.log(1 / 4)
    assert out[1]["n_tokens"] == 3
    assert out[1]["nll"] == pytest.approx(nll1, abs=1e-5)
    assert out[2]["nll"] == pytest.approx(nll2, abs=1e-5)
    # the all-rare-token doc is the improbable one
    assert out[2]["nll"] > out[1]["nll"]
