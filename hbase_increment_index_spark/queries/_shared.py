"""Shared substrate for the query registry: fixture loader, tokenizer SQL twins, and cross-domain helper constants.

Split out of the former single-file queries.py (r5 task 6) — every
module re-exports through queries/__init__ so the public surface
(`from hbase_increment_index_spark.queries import ...`) is unchanged."""
from __future__ import annotations
from hbase_increment_index_spark.catalog import load_table
from hbase_increment_index_spark.pipeline.text import STOPWORDS
from pyspark.sql import DataFrame, SparkSession, functions as F


# SQL fragment: DuckDB tokenizer identical to search.tokenize.tokens()
_SQL_TOKS = "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), t -> t <> '')"
# NOTE (BM25 oracle idiom): the SQL avgdl CTEs derive doc length from the
# exploded toks, which drops zero-token documents, while the Spark side's
# size(tokens(text)) counts them with dl=0. The fixtures contain no
# zero-token docs (verified — every text tokenizes non-empty), so the two
# agree; a corpus with empty documents would need the SQL dl CTE switched
# to len(toks) over all rows.
# SQL fragment: md5 fingerprint identical to pipeline.text.fingerprint()
_SQL_FP = "md5(regexp_replace(trim(lower({c})), '\\s+', ' ', 'g'))"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q6 — relevance ranking
# --------------------------------------------------------------------------

_TFIDF_TERMS = ["spark", "join", "query"]


_SAVED_QUERIES = [
    (1, ["data", "stream"]),
    (2, ["query", "window"]),
    (3, ["spark", "fast"]),
    (4, ["hash", "join"]),
    (5, ["slow", "error"]),
]


_SWEEP_THRESHOLDS = [0.3, 0.4, 0.5, 0.6, 0.7, 0.8]


# PII-enrichment expression shared by the Spark query and its oracle:
# the fixture corpus carries no PII, so both sides append deterministic
# synthetic PII derived from doc_id before scrubbing.
_PII_SUFFIX_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com via 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.7 tel 555-123-' || "
    "CAST(1000 + doc_id % 9000 AS VARCHAR)"
)


def _minhash_sql_ctes(threshold: float = 0.30, source: str = "documents") -> str:
    """Shared CTE chain rebuilding minhash_lsh_pairs(hash_fn='md5')
    in DuckDB, ending in a ``pairs(id_a, id_b, jaccard)`` CTE
    (``threshold`` applied, default 0.30). ``source`` is the relation
    scanned for (doc_id, text) — a prior CTE name for pipeline-stage
    composition (e15). Used by the e2b, e2d, e1f, e2m, e15 oracles."""
    from hbase_increment_index_spark.pipeline.dedup import (
        _MERSENNE,
        _perm_params,
        PORTABLE_HASH60_SQL,
    )

    params = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_perm_params(64))
    )
    toks = _SQL_TOKS.format(c="text")
    h = PORTABLE_HASH60_SQL.format(c="sh")
    return f"""base AS (
  SELECT doc_id AS doc,
         list_transform(
           generate_series(1, greatest(len({toks}) - 2, 0)),
           i -> array_to_string(list_slice({toks}, i, i + 2), ' ')
         ) AS grams
  FROM {source}
),
sh AS (SELECT DISTINCT doc, unnest(grams) AS sh FROM base WHERE len(grams) > 0),
hs AS (SELECT doc, {h} % {_MERSENNE} AS hv FROM sh),
params(lane, a, b) AS (VALUES {params}),
lanes AS (
  SELECT doc, lane, MIN((a * hv + b) % {_MERSENNE}) AS m
  FROM hs CROSS JOIN params GROUP BY doc, lane
),
bandkeys AS (
  SELECT doc, lane // 4 AS band,
         string_agg(CAST(m AS VARCHAR), ',' ORDER BY lane) AS bk
  FROM lanes GROUP BY doc, lane // 4
),
cand AS (
  SELECT DISTINCT x.doc AS id_a, y.doc AS id_b
  FROM bandkeys x JOIN bandkeys y USING (band, bk)
  WHERE x.doc < y.doc
),
sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS common
  FROM cand c
  JOIN sh a ON a.doc = c.id_a
  JOIN sh b ON b.doc = c.id_b AND b.sh = a.sh
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT id_a, id_b,
         ROUND(common / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc = id_a
  JOIN sizes sb ON sb.doc = id_b
  WHERE ROUND(common / (sa.n_sh + sb.n_sh - common), 6) >= {threshold}
)"""


def _z_sql_terms(c1: str, c2: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({c1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({c2} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _langid_sql() -> str:
    toks = _SQL_TOKS.format(c="text")
    hit_cols = []
    for lang in sorted(STOPWORDS):
        lst = "['" + "', '".join(STOPWORDS[lang]) + "']"
        hit_cols.append(
            f"len(list_filter(toks, t -> list_contains({lst}, t))) AS h_{lang}"
        )
    langs = sorted(STOPWORDS)
    g = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + g + " = 0 THEN 'und' " + " ".join(
        f"WHEN h_{lang} = {g} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH t AS (SELECT doc_id, lang, {toks} AS toks FROM documents),
s AS (SELECT doc_id, lang, {', '.join(hit_cols)} FROM t)
SELECT doc_id, lang, {case} AS lang_pred, {g} AS lang_pred_hits
FROM s
"""


# --------------------------------------------------------------------------
# E6 — dataset sampling / splitting / packing (training-pipeline ops)
# --------------------------------------------------------------------------

# DuckDB twin of sampling._unit_bucket: hash('salt:id') mod 1e6
_SQL_BUCKET = "((('0x' || substr(md5('{salt}:' || CAST({c} AS VARCHAR)), 1, 15))::BIGINT) % 1000000)"


def _geo_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with deterministic derived coordinates — the fixture
    corpus has no geo columns, so (like the CDC cell log derived from
    events, FIXTURES.md) a pure projection assigns each customer a
    lat/lon; every spatial query stays DuckDB-expressible."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 17000) / F.lit(100.0) - F.lit(85.0)).alias("lat"),
        ((F.col("c_custkey") * 91 % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
    )


_GEO_SQL_BASE = """
SELECT c_custkey,
       (c_custkey * 37 % 17000) / CAST(100 AS DOUBLE) - 85.0 AS lat,
       (c_custkey * 91 % 36000) / CAST(100 AS DOUBLE) - 180.0 AS lon
FROM customer
"""

_GEO_DIST = """ROUND(2.0 * 6371.0088 * asin(sqrt(
  sin(radians({la} - lat) / 2) * sin(radians({la} - lat) / 2)
  + cos(radians(lat)) * cos(radians({la}))
    * sin(radians({lo} - lon) / 2) * sin(radians({lo} - lon) / 2))), 6)"""


_TIMERANGE_CUT = "2024-01-15 00:00:00"


def _pq_cb_sql(n_seeds: int = 8) -> str:
    """Parameterized twin of _PQ_CB_SQL: the PQ codebook/encode CTE
    chain with ``n_seeds`` corpus-sampled codewords per subspace
    (pipeline.similarity.pq_codebooks(seed_ids=range(n_seeds)) +
    pq_encode). The q78b served-{!knn} oracle uses 16 codewords; the
    e3i/e3j oracles keep the original 8-seed constant."""
    return _PQ_CB_SQL.replace("WHERE vec_id < 8", f"WHERE vec_id < {n_seeds}")


_PQ_CB_SQL = """
seeds AS (
  SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < 8
),
ss AS (SELECT unnest(generate_series(0, 3)) AS s),
cb AS (
  SELECT s, row_number() OVER (PARTITION BY s ORDER BY sid) AS j,
         list_slice(v, s * 16 + 1, s * 16 + 16) AS cw
  FROM seeds, ss
),
subs AS (
  SELECT vec_id, s,
         list_slice(CAST(embedding AS DOUBLE[]), s * 16 + 1, s * 16 + 16) AS sv
  FROM embeddings, ss
),
dists AS (
  SELECT vec_id, subs.s AS s, cb.j,
         ROUND(list_sum(list_transform(generate_series(1, 16),
               i -> (sv[i] - cw[i]) * (sv[i] - cw[i]))), 9) AS d
  FROM subs JOIN cb ON subs.s = cb.s
),
codes AS (
  SELECT vec_id, s, j AS code FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) = 1
)
"""


# DuckDB twin of the deterministic IVF coarse index: per-label
# exact-decimal centroids (label_cell_centroids — E3K proved the cents
# arithmetic) + nearest-cell assignment with rounded distances and
# low-cid tie-breaks (assign_cells). Ends in CTEs ``centarr(cid, c)``
# and ``cellassign(vec_id, cid)``; list_sum/list_transform mirror the
# sequential zip_with fold of similarity._assign. Shared by the
# q78b served-{!knn} and e3n ivf-recall oracles.
_IVF_SQL = """
ivf_x0 AS (
  SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
),
ivf_cents AS (
  SELECT label, pos,
         ROUND(CAST(SUM(CAST(v AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS mean_v
  FROM ivf_x0 GROUP BY label, pos
),
centarr AS (
  SELECT CAST(label AS BIGINT) AS cid, list(mean_v ORDER BY pos) AS c
  FROM ivf_cents GROUP BY label
),
ivf_v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
ivf_adist AS (
  SELECT ivf_v.vec_id, ca.cid,
         ROUND(list_sum(list_transform(generate_series(1, 64),
               i -> (e[i] - c[i]) * (e[i] - c[i]))), 6) AS d
  FROM ivf_v CROSS JOIN centarr ca
),
cellassign AS (
  SELECT vec_id, cid FROM ivf_adist
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) = 1
)
"""


# --------------------------------------------------------------------------
# Solr streaming expressions (the /stream handler of the solrj 9.x the
# reference builds against, pom.xml:22) — expression text compiled to
# DataFrame plans by search.streaming_expr. Each query below is the
# literal expression a Solr user would POST to /stream.
# --------------------------------------------------------------------------


def _stream(spark: SparkSession, sf_dir: str, expression: str) -> DataFrame:
    from hbase_increment_index_spark.catalog import load_all
    from hbase_increment_index_spark.search.streaming_expr import run_stream_expr

    return run_stream_expr(spark, load_all(spark, sf_dir), expression)
