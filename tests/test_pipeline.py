"""Unit tests for dedup / similarity / text / multimodal operators on
hand-built fixtures with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from hbase_increment_index_spark.pipeline.multimodal import (
    extract_features,
    sample_frames,
    synth_media,
)
from hbase_increment_index_spark.pipeline.similarity import (
    build_ivf,
    build_lsh_buckets,
    knn_brute_force,
    knn_ivf,
)
from hbase_increment_index_spark.pipeline.text import language_id, token_count


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base, "en"),
        (2, base, "en"),  # exact dup of 1
        (3, base.replace("today", "tomorrow"), "en"),  # near dup
        (4, "der hund ist nicht ein fuchs und das ist gut so oder nicht", "de"),
        (5, "completely different content about spark query engines and shuffles", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs):
    kept = exact_dedup(docs, "doc_id", "text")
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 3, 4, 5}  # 2 collapsed into 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, "doc_id", "text", num_perm=32, bands=8, threshold=0.3).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 5) not in pairs


def test_incremental_near_dups_bipartite_only(spark):
    """Only new×old pairs come back: an incoming doc near-duplicating
    the corpus is flagged; duplicate pairs wholly inside either side
    are NOT (that is e2's job, not the delta check's)."""
    from hbase_increment_index_spark.pipeline.dedup import incremental_near_dups

    existing = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # old×old dup
            (3, "completely different text about spark query engines"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1,2
            (11, "novel content sharing nothing with the existing corpus"),
            (12, "novel content sharing nothing with the existing corpus"),  # new×new dup
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_new"], r["id_old"]): r["jaccard"]
        for r in incremental_near_dups(
            existing, incoming, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert set(pairs) == {(10, 1), (10, 2)}
    assert all(j == 1.0 for j in pairs.values())


def test_minhash_impl_lanes_bit_identical(docs):
    """The numpy signature kernel and the pure-expression lane must
    produce identical verified pairs for both hash kernels — the perf
    choice (pandas is ~3× faster at 64 perms) can never change
    results."""
    from hbase_increment_index_spark.pipeline.dedup import minhash_lsh_pairs

    for hash_fn in ("xxhash64", "md5"):
        out = {}
        for impl in ("expr", "pandas"):
            out[impl] = {
                tuple(r)
                for r in minhash_lsh_pairs(
                    docs, "doc_id", "text",
                    num_perm=32, bands=8, threshold=0.3,
                    impl=impl, hash_fn=hash_fn,
                ).collect()
            }
        assert out["expr"] == out["pandas"], hash_fn
        assert out["expr"]  # non-vacuous: the fixture has near-dups


def test_connected_components_and_clusters(spark, docs):
    from hbase_increment_index_spark.pipeline.dedup import connected_components, near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )  # chain 1-2-3 and pair 7-8
    comp = {r["doc"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    # the distributed label-propagation path (forced) agrees with the
    # size-adaptive driver union-find exactly
    dist = {
        r["doc"]: r["component"]
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert dist == comp

    out = {r["doc_id"]: (r["component"], r["is_canonical"])
           for r in near_dup_clusters(docs, "doc_id", "text", threshold=0.3,
                                      num_perm=32, bands=8).collect()}
    # docs 1,2,3 are one near-dup cluster with canonical 1; 4,5 unique
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[4][1] and out[5][1]


def test_connected_components_string_ids(spark):
    # generic-id contract: string ids converge and label with the
    # LEXICOGRAPHIC min on both paths — the old decimal-sum convergence
    # check was NULL for strings (never early-exited) and non-monotone
    # for numeric-looking strings ('10' < '9')
    from hbase_increment_index_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [("10", "9"), ("9", "2"), ("b", "a")], "id_a string, id_b string"
    )  # chain 10-9-2 (lexicographic min '10') and pair a-b
    expected = {"10": "10", "9": "10", "2": "10", "a": "a", "b": "a"}
    for kw in ({}, {"driver_threshold": 0}):
        got = {
            r["doc"]: r["component"]
            for r in connected_components(pairs, **kw).collect()
        }
        assert got == expected, kw


def test_simhash_exact_dup_distance_zero(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0


def test_knn_brute_force_self_nearest(spark):
    vecs = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    vecs.append((9, [0.9, 0.1, 0.0, 0.0]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    top = knn_brute_force(emb, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert top[0]["vec_id"] == 0 and top[0]["score"] == 1.0
    assert top[1]["vec_id"] == 9


def test_knn_join_topk_per_query(spark):
    from hbase_increment_index_spark.pipeline.similarity import knn_join_brute_force

    corpus = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0, 0.0])],
        "q_id long, q_vec array<double>",
    )
    out = knn_join_brute_force(corpus, queries, k=1)
    got = {r["q_id"]: r["vec_id"] for r in out.collect()}
    assert got == {100: 0, 200: 1}


def test_ivf_probes_subset(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids, assign = build_ivf(emb, n_centroids=4, iters=1)
    assert centroids.count() == 4
    assert assign.count() == emb.count()
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    top = knn_ivf(emb, centroids, assign, q, k=5, n_probe=2)
    assert top.count() == 5


def test_lsh_buckets_partition_corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = build_lsh_buckets(emb, n_planes=4, dim=64)
    n_buckets = b.select("bucket").distinct().count()
    assert 2 <= n_buckets <= 16


def test_language_id(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert out[1] == "en" and out[4] == "de"


def test_token_count(docs):
    n = docs.select(token_count("text").alias("n")).filter(F.col("n") <= 0).count()
    assert n == 0


def test_resize_images_shapes(docs):
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.pipeline.multimodal import resize_images, synth_media

    media = synth_media(docs.withColumn("n_chars", F.length("text")))
    out = resize_images(media, width=8, height=8).collect()
    assert all(len(r["payload"]) == 64 for r in out)
    assert all(r["width"] == 8 and r["height"] == 8 for r in out)


def test_multimodal_plumbing(docs):
    media = synth_media(
        docs.withColumn("n_chars", F.length("text")), kind="video"
    )
    feats = extract_features(media)
    rows = feats.collect()
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    frames = sample_frames(media, every_ms=100)
    assert frames.count() > docs.count()  # several frames per video


def test_decoder_selection_by_capability():
    """select_decoder: deterministic fake whenever Pillow is absent or
    the mime is not image/*; PIL branch only when both hold. Runs in
    BOTH environments: each half forces one capability state."""
    from hbase_increment_index_spark.pipeline import multimodal as mm

    orig = mm._PIL_IMAGE
    try:
        # without Pillow everything routes to the fake
        mm._PIL_IMAGE = None
        assert mm.select_decoder("image/png") is mm.DeterministicFakeDecoder
        assert mm.select_decoder("application/x-fake") is mm.DeterministicFakeDecoder
        assert mm.select_decoder(None) is mm.DeterministicFakeDecoder

        # with Pillow present, image/* payloads get the real decoder,
        # non-images still the fake
        mm._PIL_IMAGE = orig if orig is not None else object()
        assert mm.select_decoder("image/png") is mm.PILImageDecoder
        assert mm.select_decoder("video/mp4") is mm.DeterministicFakeDecoder
        assert mm.select_decoder(None) is mm.DeterministicFakeDecoder
    finally:
        mm._PIL_IMAGE = orig


def _write_png_gray(pixels: list[int]) -> bytes:
    """Minimal valid grayscale PNG (len(pixels)×1, 8-bit) from pure
    stdlib zlib/struct — no Pillow needed to CREATE the fixture, so the
    real-decode branch is exercisable wherever Pillow exists."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", len(pixels), 1, 8, 0, 0, 0, 0)  # gray, 8-bit
    scanline = b"\x00" + bytes(pixels)  # filter type 0 + row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanline))
        + chunk(b"IEND", b"")
    )


def test_png_fixture_is_structurally_valid():
    """The in-test PNG writer produces spec-shaped bytes (signature,
    chunk framing, CRCs) — checked by hand so the fixture is trusted
    even where Pillow is absent."""
    import struct
    import zlib

    png = _write_png_gray([0, 255, 16, 32])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    off, types = 8, []
    while off < len(png):
        (ln,) = struct.unpack(">I", png[off : off + 4])
        ctype = png[off + 4 : off + 8]
        data = png[off + 8 : off + 8 + ln]
        (crc,) = struct.unpack(">I", png[off + 8 + ln : off + 12 + ln])
        assert crc == zlib.crc32(ctype + data) & 0xFFFFFFFF
        types.append(ctype)
        off += 12 + ln
    assert types == [b"IHDR", b"IDAT", b"IEND"]
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (4, 1)


def test_real_pixel_decode_branch_or_fake_fallback():
    """E5 decode, both capability states with a REAL image payload:
    where Pillow is importable the PILImageDecoder branch must decode
    the actual pixels (8×1 gray PNG → its luminance values verbatim —
    resize to (DIM,1) is the identity here); where it is not, the
    deterministic byte feature serves the same payload. The
    byte-identical PNG fixture makes the branch executable in any
    environment with Pillow, clearing the r3 'real-pixel branch never
    executed' gap."""
    from hbase_increment_index_spark.pipeline import multimodal as mm

    pixels = [0, 32, 64, 96, 128, 160, 192, 255]
    assert len(pixels) == mm.PILImageDecoder.DIM
    png = _write_png_gray(pixels)

    feat = mm.decode_with_fallback("image/png", png)
    if mm._PIL_IMAGE is not None:
        # real decode: luminance profile == source pixels
        assert feat == [float(v) for v in pixels]
    else:
        assert feat == mm.DeterministicFakeDecoder.decode(png)

    # corrupt image bytes fall back to the byte feature in BOTH states
    bad = png[:20]  # truncated mid-IHDR
    if mm._PIL_IMAGE is not None:
        assert mm.decode_with_fallback("image/png", bad) == (
            mm.DeterministicFakeDecoder.decode(bad)
        )


def test_decode_with_fallback_on_corrupt_image():
    """A mime-claimed image whose bytes the codec rejects falls back to
    the deterministic byte feature instead of failing the task; null
    payloads still raise (schema error, not dirty data)."""
    import pytest as _pytest

    from hbase_increment_index_spark.pipeline import multimodal as mm

    class RaisingPIL:
        @staticmethod
        def open(_buf):
            raise OSError("cannot identify image file")

    orig = mm._PIL_IMAGE
    mm._PIL_IMAGE = RaisingPIL
    try:
        feat = mm.decode_with_fallback("image/png", b"not a real png")
        assert feat == mm.DeterministicFakeDecoder.decode(b"not a real png")
        with _pytest.raises(NotImplementedError):
            mm.decode_with_fallback("image/png", None)
    finally:
        mm._PIL_IMAGE = orig


def test_pil_feature_from_image_stub():
    """The pixel→feature step of the real decoder, driven by a stub
    image object exposing the Pillow surface it uses (convert/resize/
    getdata) — the container has no Pillow to test the import itself."""
    from hbase_increment_index_spark.pipeline.multimodal import PILImageDecoder

    class StubImage:
        def __init__(self, data):
            self._data = data

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            assert wh == (PILImageDecoder.DIM, 1)
            return self

        def getdata(self):
            return self._data

    feat = PILImageDecoder.feature_from_image(StubImage(list(range(8))))
    assert feat == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    assert all(isinstance(v, float) for v in feat)


def test_train_val_split_deterministic_and_partitioned(docs):
    from hbase_increment_index_spark.pipeline.sampling import train_val_split

    a = {r["doc_id"]: r["split"] for r in train_val_split(docs, "doc_id", 0.3, 0.2).collect()}
    b = {r["doc_id"]: r["split"] for r in train_val_split(docs, "doc_id", 0.3, 0.2).collect()}
    assert a == b  # content-addressed, rerun-stable
    assert set(a.values()) <= {"train", "val", "test"}


def test_token_budget_head_exact_and_partition_invariant(spark):
    """The head is the exact maximal prefix of the content-hash order
    whose token sum fits the budget, identical at any parallelism."""
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.pipeline.dedup import portable_hash60
    from hbase_increment_index_spark.pipeline.sampling import token_budget_head

    df = spark.createDataFrame([(i, 10 + i % 7) for i in range(200)], "id long, nt int")

    got = {r["id"] for r in token_budget_head(df, "id", "nt", budget=500).collect()}
    # python oracle: same hash order, greedy prefix
    rows = df.withColumn(
        "h", portable_hash60(F.concat(F.lit("head:"), F.col("id").cast("string")))
    ).collect()
    total, want = 0, set()
    for r in sorted(rows, key=lambda r: (r["h"], r["id"])):
        if total + r["nt"] > 500:
            break
        total += r["nt"]
        want.add(r["id"])
    assert got == want and 0 < len(got) < 200

    # parallelism/shard-count invariance
    for nparts, nshards in ((1, 4), (13, 8), (32, 64)):
        again = {
            r["id"]
            for r in token_budget_head(
                df.repartition(nparts), "id", "nt", budget=500, n_shards=nshards
            ).collect()
        }
        assert again == got


def test_stratified_sample_respects_full_and_zero(docs):
    from hbase_increment_index_spark.pipeline.sampling import stratified_sample

    docs2 = docs.withColumn("stratum", F.lit("keep"))
    kept = stratified_sample(docs2, "doc_id", "stratum", {"keep": 1.0})
    assert kept.count() == docs.count()
    dropped = stratified_sample(docs2, "doc_id", "stratum", {"keep": 0.0})
    assert dropped.count() == 0


def test_pack_batches_budget(spark):
    from hbase_increment_index_spark.pipeline.sampling import pack_batches

    rows = [(i, 100) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, tok long")
    out = pack_batches(df, "id", "tok", budget=300, n_shards=2)
    # within a (shard, batch): ordered prefix sums never start past the
    # budget boundary — each batch's exclusive prefix div budget is const
    agg = out.groupBy("shard", "batch_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 3 for r in agg)  # 3 x 100 tokens fills a 300 budget
    # deterministic across repartitioning
    out2 = pack_batches(df.repartition(7), "id", "tok", budget=300, n_shards=2)
    assert sorted(map(tuple, out.select("id", "shard", "batch_id").collect())) == \
        sorted(map(tuple, out2.select("id", "shard", "batch_id").collect()))


def test_scrub_pii(spark):
    from hbase_increment_index_spark.pipeline.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@sub.example.org now"),
            (2, "server at 192.168.0.1 port open"),
            (3, "call 555-123-4567 or 555-12-1234 today"),  # 2nd not phone-shaped
            (4, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in scrub_pii(df, "text").collect()}
    assert rows[1]["n_email"] == 1 and "<EMAIL>" in rows[1]["clean_text"]
    assert "@" not in rows[1]["clean_text"]
    assert rows[2]["n_ip"] == 1 and rows[2]["clean_text"] == "server at <IP> port open"
    assert rows[3]["n_phone"] == 1
    assert rows[3]["clean_text"] == "call <PHONE> or 555-12-1234 today"
    assert rows[4]["clean_text"] == "nothing sensitive here"
    assert rows[4]["n_email"] == rows[4]["n_ip"] == rows[4]["n_phone"] == 0


def test_repetition_features(spark):
    from hbase_increment_index_spark.pipeline.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),             # maximal repetition
            (2, "all four tokens differ"),           # no repetition
            (3, ""),                                 # empty doc
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_features(df, "doc_id").collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["type_token_ratio"] == 0.25
    assert rows[1]["dup_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[2]["type_token_ratio"] == 1.0
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["top_token_frac"] == 0.25
    assert rows[3]["n_tokens"] == 0 and rows[3]["type_token_ratio"] == 0.0


def test_cross_contamination(spark):
    from hbase_increment_index_spark.pipeline.dedup import cross_contamination

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon entirely fresh"),
            (2, "the exact eval phrase appears right here verbatim"),
            (3, "unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "note the exact eval phrase appears in benchmarks")],
        "doc_id long, text string",
    )
    flagged = {
        r["doc_id"]: r["n_collisions"]
        for r in cross_contamination(corpus, eval_set, "doc_id", "text", n=4).collect()
    }
    assert 2 in flagged and flagged[2] >= 1   # shares 'the exact eval phrase' 4-grams
    assert 1 not in flagged and 3 not in flagged


def test_source_quality_rollup(spark):
    from hbase_increment_index_spark.pipeline.text import source_quality_rollup

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog sat on the mat with a hat for a while longer", "web"),
            (2, "xx", "web"),  # short, no stopwords -> low quality
            (3, "this is a perfectly reasonable sentence about the state of things", "books"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in source_quality_rollup(docs).collect()}
    assert rows["web"]["n_docs"] == 2 and rows["books"]["n_docs"] == 1
    assert rows["web"]["n_low_quality"] == 1
    assert rows["web"]["low_quality_share"] == 0.5
    assert rows["books"]["n_low_quality"] == 0
    assert rows["web"]["total_tokens"] == 16 + 1
    # mean over the two per-doc scores, each in [0, 1]
    assert 0.0 < rows["web"]["mean_quality"] < 1.0


def test_lsh_recall_bounds_and_exact_on_full_bucket(spark):
    from hbase_increment_index_spark.pipeline.similarity import lsh_recall

    # 2-D corpus: with 1 plane every vector lands in one of 2 buckets;
    # query 0 points along +x, its 3 same-bucket neighbors are also the
    # 3 exact nearest -> recall@3 = 1.0
    rows = [
        (0, [1.0, 0.05]),
        (1, [1.0, 0.1]),
        (2, [0.9, 0.2]),
        (3, [0.8, 0.15]),
        (4, [-1.0, -0.1]),
        (5, [-0.9, -0.2]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_recall(
        emb, F.col("vec_id") == 0, k=3, n_planes=1, dim=2, plane_fn="md5"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["q_id"] == 0
    assert 0.0 <= r["recall_at_k"] <= 1.0
    assert r["n_hits"] == 3 * r["recall_at_k"]


def test_lsh_recall_zero_when_bucket_empty(spark):
    from hbase_increment_index_spark.pipeline.similarity import lsh_recall

    # only the query in its half-space -> no same-bucket candidates
    rows = [(0, [1.0, 0.0]), (1, [-1.0, -0.1]), (2, [-0.9, -0.3])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_recall(
        emb, F.col("vec_id") == 0, k=2, n_planes=1, dim=2, plane_fn="md5"
    ).collect()
    assert len(out) == 1 and out[0]["recall_at_k"] in (0.0, 1.0)


def test_dim_truncation_recall_full_prefix_is_perfect(spark):
    from hbase_increment_index_spark.pipeline.similarity import dim_truncation_recall

    # 4-D vectors where the discriminating signal lives in dims 3-4:
    # a 2-dim prefix ranking must NOT be perfect (all prefixes tie at
    # [1,0]), while the full 4-dim "truncation" is the exact ranking
    # by construction -> recall exactly 1.0
    rows = [
        (0, [1.0, 0.0, 1.0, 0.0]),
        (1, [1.0, 0.0, 0.9, 0.1]),
        (2, [1.0, 0.0, -0.9, 0.4]),
        (3, [1.0, 0.0, -1.0, 0.2]),
        (4, [1.0, 0.0, 0.8, -0.3]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["dims"]: r
        for r in dim_truncation_recall(
            emb, F.col("vec_id") == 0, dims=[2, 4], k=2
        ).collect()
    }
    assert out[4]["mean_recall"] == 1.0
    assert out[4]["n_queries"] == 1 and out[4]["total_hits"] == 2
    # prefix [1,0] ties every candidate -> rank order falls back to
    # vec_id, picking {1,2}; exact top-2 is {1,4} -> recall 0.5
    assert out[2]["mean_recall"] == 0.5
