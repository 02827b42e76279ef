"""Round-5 operators: full-pipeline property tests.

The fixture-based DuckDB oracles prove cross-engine parity on the
driver's data; these tests re-derive the same answers with independent
python folds on HYPOTHESIS-generated corpora (ties, negatives, empty
texts, single-type groups) written as real parquet — the exact path
the registry queries read."""

from __future__ import annotations

import datetime as dt
import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TOKEN = re.compile(r"[^a-z0-9]+")


def _toks(text: str) -> list[str]:
    return [t for t in TOKEN.split(text.lower()) if t]


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["view", "click", "error"]),
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_cdc_merge_percentiles_matches_python(spark, tmp_path_factory, rows):
    """merged sketch == python percentile pick on the final corpus,
    under the query's own CDC semantics (inserts %10==0, value-halving
    updates %10==1, deletes %10==2)."""
    from hbase_increment_index_spark.queries import cdc_merge_percentiles

    sf_dir = str(tmp_path_factory.mktemp("pctl"))
    data = [
        (i, dt.datetime(2024, 1, 1), i, et, v, "{}")
        for i, (et, v) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {
        r["event_type"]: (r["n_total"], r["p50_bin"], r["p95_bin"])
        for r in cdc_merge_percentiles(spark, sf_dir).collect()
    }

    final: dict[str, list[float]] = {}
    for i, (et, v) in enumerate(rows):
        if i % 10 == 2:
            continue
        final.setdefault(et, []).append(math.floor(v / 5) * 5.0)

    def pick(bins: list[float], q: float) -> float:
        srt = sorted(bins)
        n = len(srt)
        # first bin whose cumulative count crosses q*n — over unique
        # bins, cum(b) = #values <= b, so this is the ceil(q*n)-th
        # smallest binned value
        k = math.ceil(q * n) - 1
        return srt[max(k, 0)]

    want = {
        et: (len(b), pick(b, 0.5), pick(b, 0.95)) for et, b in final.items()
    }
    assert got == want


docs_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abc xy.", min_size=0, max_size=30),
        st.sampled_from(["web", "book"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_cdc_merge_idf_matches_python(spark, tmp_path_factory, rows):
    """merged df/N stats == python recount on the final corpus, under
    the query's CDC semantics (inserts %10==0, truncating updates
    %10==1, deletes %10==2)."""
    from hbase_increment_index_spark.queries import cdc_merge_idf

    sf_dir = str(tmp_path_factory.mktemp("idf"))
    data = [
        (i, text, "en", src, len(text)) for i, (text, src) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = [(r["term"], r["df"], r["idf"]) for r in cdc_merge_idf(spark, sf_dir).collect()]

    final_texts = [t for i, (t, _s) in enumerate(rows) if i % 10 != 2]
    n_docs = len(final_texts)
    df: dict[str, int] = {}
    for t in final_texts:
        for term in set(_toks(t)):
            df[term] = df.get(term, 0) + 1
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [
        (term, c, round(math.log((n_docs + 1) / (c + 1)), 6)) for term, c in ranked
    ]
    assert got == want


def test_e2m_bands_partition_the_pairs(spark, sf_dir):
    """Histogram sanity on the fixture: band totals == pair count at
    the lowered floor, every band within [floor, 1.0], min<=max."""
    from hbase_increment_index_spark.pipeline.dedup import minhash_lsh_pairs
    from hbase_increment_index_spark.queries import _t, e2m_jaccard_histogram

    hist = e2m_jaccard_histogram(spark, sf_dir).collect()
    n_pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        num_perm=64, bands=16, threshold=0.15, impl="pandas", hash_fn="md5",
    ).count()
    assert sum(r["n_pairs"] for r in hist) == n_pairs
    for r in hist:
        assert 0.1 <= r["band_lo"] <= 1.0
        assert r["band_lo"] <= r["min_jaccard"] <= r["max_jaccard"] < r["band_lo"] + 0.1 or (
            r["band_lo"] == 1.0 and r["max_jaccard"] == 1.0
        )


def test_e17_allocation_sums_to_budget_exactly(spark, sf_dir):
    """Largest-remainder invariants: Σ alloc == 10000 EXACTLY, every
    allocation non-negative, weights sum to ~1."""
    from hbase_increment_index_spark.queries import e17_token_budget_allocation

    rows = e17_token_budget_allocation(spark, sf_dir).collect()
    assert sum(r["alloc_tokens"] for r in rows) == 10_000
    assert all(r["alloc_tokens"] >= 0 for r in rows)
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4


def test_e15_funnel_is_monotone_nonincreasing(spark, sf_dir):
    """Each curation stage can only shed documents and tokens; the
    stage labels sort in pipeline order so adjacent-row comparison is
    the invariant."""
    from hbase_increment_index_spark.queries import e15_curation_funnel

    rows = e15_curation_funnel(spark, sf_dir).collect()
    assert [r["stage"] for r in rows] == [
        "0_raw_pool", "1_gopher_gate", "2_exact_dedup",
        "3_near_dup_removal", "4_decontaminated", "5_quality_floor",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs"] <= prev["docs"]
        assert cur["tokens"] <= prev["tokens"]
    assert rows[-1]["docs"] > 0  # the pipeline keeps something
