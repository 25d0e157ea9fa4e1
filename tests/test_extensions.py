"""Extension-operator tests: text analysis, dedup family, similarity search,
multimodal plumbing (SURVEY.md §7.6 / BASELINE.json north star)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators import dedup as D
from kafka_dead_letter_analyzer_spark.operators import multimodal as MM
from kafka_dead_letter_analyzer_spark.operators import similarity as S
from kafka_dead_letter_analyzer_spark.operators import text as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def embs(spark):
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    return load_table(spark, SF, "embeddings")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("",), ("   ",), ("one",), ("a  b",)], "t: string"
    )
    got = [r[0] for r in df.select(TX.token_count("t")).collect()]
    assert got == [3, 0, 0, 1, 2]


def test_lang_id_known_samples(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house",),
            ("der hund und die katze ist nicht da",),
            ("le chat est dans la maison pour le chien",),
            ("el perro es una mascota que vive con la familia",),
            ("zzz qqq xxx",),
        ],
        "t: string",
    )
    got = [r[0] for r in df.select(TX.lang_id("t")).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("hello world",), ("HELLO  world.",), ("different",)],
        "t: string",
    )
    got = [r[0] for r in df.select(TX.fingerprint("t")).collect()]
    assert got[0] == got[1] == got[2]
    assert got[3] != got[0]


def test_text_stats_runs_on_documents(docs):
    row = TX.text_stats(docs).first()
    assert row["n_tokens"] > 0
    assert 0.0 <= row["stopword_ratio"] <= 1.0
    assert len(row["fingerprint"]) == 32


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


def test_dedup_exact_finds_planted_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Some Text"), (2, "some text"), (3, "SOME, text!"), (4, "other")],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r["n_copies"] for r in D.dedup_exact_normalized(df).collect()}
    assert out == {1: 3, 4: 1}


def test_minhash_finds_planted_near_duplicates(spark, docs):
    """A doc with one word changed out of ~50 must pair with its source at
    high jaccard; unrelated docs must not appear at threshold 0.8."""
    base = docs.limit(3).collect()
    mutated = []
    for i, r in enumerate(base):
        words = r["text"].split()
        words[len(words) // 2] = "MUTATED"
        mutated.append((10_000 + r["doc_id"], " ".join(words)))
    planted = spark.createDataFrame(mutated, "doc_id: long, text: string")
    corpus = docs.select("doc_id", "text").unionByName(planted)
    pairs = D.dedup_near_minhash(corpus, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for r in base:
        assert (r["doc_id"], 10_000 + r["doc_id"]) in found
    for r in pairs:
        # every reported pair is genuinely similar
        assert r["jaccard"] >= 0.5


def test_minhash_agrees_with_exact_jaccard(spark, docs):
    """LSH candidate jaccards must equal exact jaccard on the same shingle
    definition (the verification step IS exact — no approximation there)."""
    sub = docs.filter(F.col("doc_id") < 100)
    pairs = D.dedup_near_minhash(sub, threshold=0.2)
    g = sub.select(
        F.col("doc_id").alias("_id"),
        D.token_shingles(F.col("text"), 3).alias("_g"),
    )
    left = g.select(F.col("_id").alias("id_a"), F.col("_g").alias("g_a"))
    right = g.select(F.col("_id").alias("id_b"), F.col("_g").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size("g_a") + F.size("g_b") - inter
    exact = (
        left.join(right, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= 0.2)
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
    # candidates reported by LSH carry the exact jaccard value
    for k, v in got.items():
        assert want[k] == v
    # recall: 16 bands x 4 rows at j>=0.5 is near-certain; at 0.2 partial
    high = {k for k, v in want.items() if v >= 0.5}
    assert high.issubset(set(got)), "high-similarity pair missed by LSH"


def test_simhash_identical_and_near_texts(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again today"),
        (3, "the quick brown fox jumps over the lazy cat again and again today"),
        (4, "completely unrelated words about spark sql engines and columnar io"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in D.dedup_near_simhash(df, max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0  # identical -> hamming 0
    assert (1, 3) in pairs  # one-word change -> small hamming
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard_exact_integer_semantics(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdef"), (3, "xyzuvw")], "doc_id: long, text: string"
    )
    rows = D.ngram_jaccard_pairs(df, threshold_num=1, threshold_den=2).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["inter_size"] == r["union_size"] == 4  # abcdef -> 4 distinct 3-grams


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def test_cosine_topk_self_is_first(spark, embs):
    [row] = embs.filter(F.col("vec_id") == 7).select("embedding").collect()
    top = S.cosine_topk(embs, list(row["embedding"]), k=5).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["cosine_sim"] == 1.0
    sims = [r["cosine_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall_vs_bruteforce(spark, embs):
    """ANN with multiprobe must recover a decent fraction of the exact
    top-10 (and always contains the query itself)."""
    [row] = embs.filter(F.col("vec_id") == 0).select("embedding").collect()
    q = list(row["embedding"])
    exact = {r["vec_id"] for r in S.cosine_topk(embs, q, k=10).collect()}
    approx = {r["vec_id"] for r in S.cosine_topk_lsh(embs, q, k=10, planes=4, multiprobe=1).collect()}
    assert 0 in approx
    assert len(exact & approx) >= 3  # recall >= 0.3 at 4 planes on randoms


def test_knn_join_rank_bounded(spark, embs):
    out = S.pairwise_topk_join(embs.limit(100), embs.limit(100), k=3, planes=3)
    pdf = out.toPandas()
    assert (pdf.groupby("id_a")["rank"].max() <= 3).all()
    assert (pdf["id_a"] != pdf["id_b"]).all()


def test_knn_join_tie_heavy_matches_bruteforce(spark):
    """Adversarial tie case for the threshold preselect (r13): vectors
    drawn from a 3-word vocabulary so MANY candidates tie exactly at the
    k-th similarity — the preselect must keep the whole tie band and
    break it on ascending right id, bit-identical to brute force."""
    import numpy as np

    vocab = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.6, 0.8, 0.0, 0.0],
    ]
    rows = [(i, vocab[i % 3]) for i in range(60)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    k = 4
    got = sorted(
        tuple(r)
        for r in S.pairwise_topk_join(df, df, k=k, planes=0).collect()
    )
    # brute force under the exact operator order (round-6 sims,
    # sim desc then right id asc, self excluded)
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    expect = []
    for a, va in vecs.items():
        cands = []
        for b, vb in vecs.items():
            if b == a:
                continue
            s = float(
                np.round(
                    va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)), 6
                )
            )
            cands.append((-s, b))
        cands.sort()
        for rank, (negs, b) in enumerate(cands[:k], start=1):
            expect.append((a, b, -negs, rank))
    assert got == sorted(expect)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


def test_media_features_roundtrip(docs):
    media = MM.documents_as_media(docs.limit(50))
    feats = MM.extract_media_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["n_bytes"] > 0
        assert len(r["payload_hash"]) == 32
        assert len(r["feature"]) == 3


def test_media_strict_decoder_is_stubbed(docs):
    media = MM.documents_as_media(docs.limit(1))
    out = MM.extract_media_features(media, decoder=MM.strict_decoder)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)


def test_media_injected_real_decoder_end_to_end(spark):
    """The decoder injection point with a REAL pure-Python decode
    (VERDICT r3 #5): genuine PNG and WAV bytes flow through the
    mapInPandas plumbing and come back with true header-derived features
    — width/height/depth for PNG, sample-rate/channels/duration for WAV;
    a null payload passes through as null."""
    import struct as _s
    import zlib

    def png(w, h, depth=8):
        ihdr = _s.pack(">II", w, h) + bytes([depth, 2, 0, 0, 0])
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + _s.pack(">I", len(ihdr)) + chunk
            + _s.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        )

    def wav(rate, channels, n_samples, bits=16):
        block = channels * bits // 8
        data = b"\x00" * (n_samples * block)
        fmt = _s.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
        body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt \
            + b"data" + _s.pack("<I", len(data)) + data
        return b"RIFF" + _s.pack("<I", len(body)) + body

    rows = [
        (1, png(640, 480), ("image", "png", 640, 480, None)),
        (2, wav(8000, 2, 4000), ("audio", "wav", None, None, 500)),
        (3, None, ("image", "png", None, None, None)),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_COLUMNS)
    feats = {
        r["media_id"]: r
        for r in MM.extract_media_features(
            media, decoder=MM.header_decoder
        ).collect()
    }
    assert feats[1]["feature"] == [640.0, 480.0, 8.0]
    assert feats[1]["n_bytes"] == len(png(640, 480))
    assert feats[2]["feature"] == [8000.0, 2.0, 500.0]
    assert feats[3]["feature"] is None and feats[3]["n_bytes"] is None
    # strictness: a non-PNG/WAV payload fails the task loudly, not silently
    bad = spark.createDataFrame(
        [(9, b"GIF89a...", ("image", "gif", None, None, None))],
        MM.MEDIA_COLUMNS,
    )
    with pytest.raises(Exception) as ei:
        MM.extract_media_features(bad, decoder=MM.header_decoder).collect()
    assert "unsupported container" in str(ei.value)


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, None, ("video", "mp4", None, None, 3500))],
        MM.MEDIA_COLUMNS,
    )
    rows = MM.frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in rows] == [
        (0, 0),
        (1, 1000),
        (2, 2000),
    ]


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_substring(spark):
    """Winnowing guarantee: documents sharing a long substring share at
    least one fingerprint — and here, heavily-overlapping docs share many,
    while unrelated docs share (essentially) none."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, "PREFIX added. " + base),  # same content, shifted
            (3, "completely different words about astronomy and telescopes"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fingerprints"]
        for r in TX.winnow_near_dups(docs, min_shared=1).collect()
    }
    assert pairs.get((1, 2), 0) >= 5  # shifted copy shares most fingerprints
    assert pairs.get((1, 3), 0) <= 1
    assert pairs.get((2, 3), 0) <= 1


def test_winnow_short_document_sketch(spark):
    """Documents shorter than k chars still sketch (whole-text hash)."""
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "ab"), (3, "")], "doc_id bigint, text string"
    )
    sk = docs.select(
        "doc_id", TX.winnow_fingerprints("text").alias("s")
    ).collect()
    by_id = {r["doc_id"]: r["s"] for r in sk}
    assert by_id[1] == by_id[2] and len(by_id[1]) == 1
    assert len(by_id[3]) == 1


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def test_ivf_recall_against_exact(spark, embs):
    [row] = embs.filter(F.col("vec_id") == 7).select("embedding").collect()
    q = list(row["embedding"])
    exact = {r["vec_id"] for r in S.cosine_topk(embs, q, k=10).collect()}
    cents = S.fit_ivf_centroids(embs, n_centroids=8, sample_size=256)
    approx = {
        r["vec_id"]
        for r in S.cosine_topk_ivf(embs, q, cents, k=10, nprobe=4).collect()
    }
    # half the cells probed -> expect solid (not perfect) recall
    assert len(exact & approx) >= 5
    # full probe == exact search
    full = {
        r["vec_id"]
        for r in S.cosine_topk_ivf(embs, q, cents, k=10, nprobe=8).collect()
    }
    assert full == exact


def test_ivf_fit_is_deterministic(spark, embs):
    import numpy as np

    c1 = S.fit_ivf_centroids(embs, n_centroids=8, sample_size=256)
    c2 = S.fit_ivf_centroids(embs, n_centroids=8, sample_size=256)
    assert np.array_equal(c1, c2)


def test_frame_sample_plan_expands_by_duration(spark):
    media = spark.createDataFrame(
        [
            (1, None, ("video", "fake", None, None, 3500)),
            (2, None, ("video", "fake", None, None, 0)),
        ],
        "media_id bigint, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,duration_ms:bigint>",
    )
    rows = MM.frame_sample_plan(media, every_ms=1000).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_id[1]) == [0, 1000, 2000]
    assert by_id[2] == [0]


def test_resize_media_plumbing(spark, docs):
    media = MM.documents_as_media(docs.limit(10))
    resized = MM.resize_media(media, 32, 32)
    rows = resized.collect()
    assert len(rows) == 10
    for r in rows:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
        assert bytes(r["payload"]).startswith(b"resized:32x32:")
    # idempotent: resizing a resized payload does not stack markers
    again = MM.resize_media(resized, 32, 32).collect()
    assert [bytes(r["payload"]) for r in again] == [bytes(r["payload"]) for r in rows]


def test_shingles_null_and_blank_are_empty_sets(spark):
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        char_ngrams,
        token_shingles,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "ab"), (5, "one two")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: (r["sh"], r["ng"])
        for r in df.select(
            "doc_id",
            token_shingles(F.col("text")).alias("sh"),
            char_ngrams(F.col("text")).alias("ng"),
        ).collect()
    }
    assert rows[1] == ([], [])       # NULL -> empty sets, not [""]
    assert rows[2] == ([], [])       # blank -> empty sets
    # token shingles trim (whitespace-only == blank); char n-grams do NOT
    # trim (and the x_ngram_jaccard oracle mirrors that), so 3 spaces is
    # one whitespace gram.
    assert rows[3] == ([], ["   "])
    assert rows[4] == (["ab"], ["ab"])  # sub-k fallback: whole text
    assert rows[5][0] == ["one two"]


def test_minhash_ignores_null_and_blank_docs(spark):
    from kafka_dead_letter_analyzer_spark.operators.dedup import dedup_near_minhash

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, None), (4, "a b c d e"), (5, "a b c d e")],
        "doc_id bigint, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dedup_near_minhash(df).collect()}
    # empty docs never become candidates of each other; the real dup pair is found
    assert pairs == {(4, 5)}


def test_knn_join_two_table_keeps_equal_ids(spark, embs):
    """exclude_self=False: a genuine two-table join must not drop a right
    row merely because its id equals the left id."""
    left = embs.limit(5)
    out = S.pairwise_topk_join(
        left, embs, k=3, planes=0, exclude_self=False
    ).collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r["id_a"], []).append(r)
    for a, rows in by_a.items():
        # rank 1 is the vector itself (cosine 1.0) when ids overlap
        top = min(rows, key=lambda r: r["rank"])
        assert top["id_b"] == a and top["cosine_sim"] == 1.0


def test_lsh_probe_all_equals_bruteforce(spark, embs):
    [row] = embs.filter(F.col("vec_id") == 0).select("embedding").collect()
    q = list(row["embedding"])
    exact = S.cosine_topk(embs, q, k=10).collect()
    full = S.cosine_topk_lsh(embs, q, k=10, planes=6, probe_all=True).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in exact]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_minhash_banding_full_recall_on_gate_corpora(spark, sf_dir):
    """Pin the zero-miss claim of the x_dedup_minhash configuration
    (num_hashes=64, bands=32 => r=2) on BOTH corpora the external gate
    runs (sf0.001 smoke, sf0.01 oracle). Banded-LSH recall is only
    probabilistic (a j~0.5 pair is missed with prob (1-j^2)^32 ~ 1e-4),
    and the oracle is an exact all-pairs set — so a regenerated corpus
    could silently flip the query red on one missed candidate. This test
    computes the exact pair set from the ENGINE's own shingle sets
    (isolating banding recall from tokenizer parity, which the DuckDB
    oracle already covers) and asserts the engine returns every pair.
    x_dup_clusters and x_corpus_dedup_pipeline inherit this pair set."""
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.select(
            "doc_id",
            D.shingle_hashes(D.token_shingles(F.col("text"), 3)).alias("h"),
        )
        .filter(F.size("h") > 0)
        .collect()
    )
    sets = {r["doc_id"]: frozenset(r["h"]) for r in base}
    ids = sorted(sets)
    exact = set()
    for i, a in enumerate(ids):
        sa, la = sets[a], len(sets[a])
        for b in ids[i + 1:]:
            sb, lb = sets[b], len(sets[b])
            # upper bound j <= min/max: prune pairs that cannot reach 0.5
            if 2 * min(la, lb) < max(la, lb):
                continue
            inter = len(sa & sb)
            if round(inter / (la + lb - inter), 6) >= 0.5:
                exact.add((a, b))
    engine = {
        (r["id_a"], r["id_b"])
        for r in D.dedup_near_minhash(
            docs, num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    assert engine == exact


# ---------------------------------------------------------------------------
# embedding quantization
# ---------------------------------------------------------------------------


def test_quantize_embeddings_known_values(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = {
        (r["vec_id"], r["pos"]): r["q"]
        for r in S.quantize_embeddings(df).collect()
    }
    # scale = 1.0: q = floor(v * 127)
    assert out[(1, 1)] == 63      # floor(0.5 * 127) = floor(63.5)
    assert out[(1, 2)] == -127
    assert out[(1, 3)] == 31      # floor(31.75)
    assert out[(1, 4)] == 0
    # zero vector -> all zeros, no division blowup
    assert all(out[(2, p)] == 0 for p in range(1, 5))


def test_quantize_embeddings_bounds(spark, embs):
    rows = S.quantize_embeddings(embs).collect()
    assert rows and all(-127 <= r["q"] <= 127 for r in rows)


# ---------------------------------------------------------------------------
# LM continuation counts
# ---------------------------------------------------------------------------


def test_lm_continuation_counts_known_corpus(spark):
    # trigrams: "a b c" (from doc1 twice via repetition) and "x b c":
    # suffix (b, c) is preceded by {a, x} -> continuation 2, and by
    # occurrence: doc1 has "a b c a b c" -> trigrams (a,b,c),(b,c,a),
    # (c,a,b),(a,b,c) -> (b,c) suffix appears twice from w1=a
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x b c")],
        "doc_id bigint, text string",
    )
    out = {
        (r["w2"], r["w3"]): (r["continuation_count"], r["total_count"])
        for r in TX.lm_continuation_counts(docs).collect()
    }
    assert out[("b", "c")] == (2, 3)  # preceded by a (2x) and x (1x)
    assert out[("c", "a")] == (1, 1)
    assert ("a", "b") in out


def test_lm_continuation_short_docs_yield_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None)], "doc_id bigint, text string"
    )
    assert TX.lm_continuation_counts(docs).count() == 0


def test_quantized_topk_recall_vs_exact(spark, embs):
    # int8 quantization preserves neighborhood structure: the quantized
    # top-10 must share most members with the exact float top-10
    [row] = embs.filter(F.col("vec_id") == 0).select("embedding").collect()
    qv = list(row["embedding"])
    exact = {r["vec_id"] for r in S.cosine_topk(embs, qv, k=10).collect()}
    quant = {r["vec_id"] for r in S.quantized_dot_topk(embs, qv, k=10).collect()}
    assert len(exact & quant) >= 6
    assert 0 in quant  # self-match survives quantization


def test_quantize_vector_matches_column_quantizer(spark):
    vec = [0.5, -1.0, 0.25, 0.125, 0.0]
    df = spark.createDataFrame([(1, vec)], "vec_id bigint, embedding array<float>")
    col_q = [
        r["q"] for r in S.quantize_embeddings(df).orderBy("pos").collect()
    ]
    assert col_q == S.quantize_vector(vec)


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_with_overlap_positions_and_tail(spark):
    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks)], "doc_id bigint, text string")
    out = sorted(
        TX.chunk_with_overlap(df, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 0,3,6,9 -> 4 chunks; last is the 1-token tail
    assert [(r["chunk_idx"], r["start_token"], r["n_chunk_tokens"]) for r in out] == [
        (1, 1, 4), (2, 4, 4), (3, 7, 4), (4, 10, 1)
    ]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[-1]["chunk_text"] == "t9"
    # overlap: chunk 2 starts inside chunk 1
    assert out[1]["chunk_text"].startswith("t3")


def test_chunk_with_overlap_blank_docs_and_reconstruction(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "doc_id bigint, text string"
    )
    out = TX.chunk_with_overlap(df, chunk_tokens=8, stride=8).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "a b c"
    with pytest.raises(ValueError):
        TX.chunk_with_overlap(df, chunk_tokens=0, stride=3)


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------


def _py_bpe(texts, n_merges, min_count=2):
    """From-scratch reference BPE (word-level, non-overlapping
    left-to-right merges, count-then-lexicographic tie-break)."""
    import re
    from collections import Counter

    corpora = []
    for t in texts:
        if t is None:
            continue
        s = t.lower().strip(" ")
        if s == "":
            continue
        corpora.append(re.split(r"\s+", s))
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for syms in corpora:
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += 1
        if not c:
            break
        (l, r), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((l, r, cnt))
        merged = f"{l} {r}"
        nxt = []
        for syms in corpora:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append(out)
        corpora = nxt
    return merges


def test_bpe_train_matches_reference_implementation(spark):
    from kafka_dead_letter_analyzer_spark.operators.bpe import bpe_train

    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and the cat sat",
        "the the the cat",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = bpe_train(df, n_merges=4)
    want = _py_bpe(texts, 4)
    assert got == want
    assert got[0][:2] == ("the", "cat")  # most frequent adjacency


def test_bpe_merge_fold_nonoverlapping(spark):
    from kafka_dead_letter_analyzer_spark.operators.bpe import (
        merge_pair_in_arrays,
    )

    df = spark.createDataFrame(
        [(["a", "a", "a", "a", "a"],), ([],), (["a"],), (["b", "a", "a"],)],
        "syms array<string>",
    )
    out = [
        r["m"]
        for r in df.select(
            merge_pair_in_arrays(F.col("syms"), "a", "a", "aa").alias("m")
        ).collect()
    ]
    assert out == [["aa", "aa", "a"], [], ["a"], ["b", "aa"]]


def test_bpe_train_stops_below_min_count(spark):
    from kafka_dead_letter_analyzer_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "x y"), (2, "p q")], "doc_id bigint, text string"
    )
    # every adjacency occurs once -> below min_count=2 -> no merges
    assert bpe_train(df, n_merges=3) == []


def test_chunk_no_overlap_reconstructs_documents(spark):
    """stride == chunk_tokens partitions the token stream exactly:
    joining the chunk texts back in order must reproduce the normalized
    document, and token counts must sum to the doc's token count."""
    texts = [
        "one two three four five six seven",
        "single",
        "a b c d e f g h i j k l m",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = TX.chunk_with_overlap(df, chunk_tokens=4, stride=4).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = t.split()
        rows = by_doc[i]
        assert " ".join(r["chunk_text"] for r in rows) == " ".join(toks)
        assert sum(r["n_chunk_tokens"] for r in rows) == len(toks)
        assert [r["start_token"] for r in rows] == list(range(1, len(toks) + 1, 4))


def test_bpe_apply_round_trips_with_training(spark):
    """Applying the learned merges must produce exactly the symbol
    arrays the trainer ended with (computed independently by the Python
    reference)."""
    import re

    from kafka_dead_letter_analyzer_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
    )

    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and the cat sat",
        "the the the cat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    merges = bpe_train(df, n_merges=4)
    assert merges  # fixture has repeated adjacencies

    # python reference: replay the same merges
    corpora = {i: re.split(r"\s+", t.lower().strip(" ")) for i, t in enumerate(texts)}
    for l, r, _ in merges:
        merged = f"{l} {r}"
        for i, syms in corpora.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            corpora[i] = out

    got = {r["doc_id"]: r["bpe_syms"] for r in bpe_apply(df, merges).collect()}
    assert got == corpora


def test_bpe_merge_fold_matches_python_property(spark):
    """Property: the aggregate() merge fold equals the reference while-
    loop rewrite for random small-alphabet arrays and a random adjacent
    pair (small alphabet -> dense overlapping-merge cases)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_dead_letter_analyzer_spark.operators.bpe import (
        merge_pair_in_arrays,
    )

    def py_merge(syms, l, r, merged):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["a", "b", "c"]),
    )
    def check(syms, l, r):
        df = spark.createDataFrame([(syms,)], "syms array<string>")
        [row] = df.select(
            merge_pair_in_arrays(F.col("syms"), l, r, f"{l} {r}").alias("m")
        ).collect()
        assert row["m"] == py_merge(syms, l, r, f"{l} {r}"), (syms, l, r)

    check()


def test_zorder_matches_python_morton_property(spark):
    """Property: the mask/shift spread equals a bit-by-bit Python Morton
    interleave across the 31-bit domain (boundaries biased in)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_dead_letter_analyzer_spark.operators import io as IO

    def morton(x, y):
        z = 0
        for i in range(31):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=0x7FFFFFFF),
                st.integers(min_value=0, max_value=0x7FFFFFFF),
            ),
            min_size=1,
            max_size=24,
        )
    )
    def check(pairs):
        df = spark.createDataFrame(pairs, "a bigint, b bigint")
        got = [
            r["z"]
            for r in df.select(
                IO.zorder_value(F.col("a"), F.col("b")).alias("z")
            ).collect()
        ]
        assert got == [morton(a, b) for a, b in pairs]

    check()


def test_chunking_matches_python_chunker_property(spark):
    """Property: chunk boundaries, counts, and texts equal a reference
    Python chunker for random corpora and random (chunk, stride)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def py_chunks(text, chunk, stride):
        t = text.lower().strip(" ")
        if t == "":
            return []
        import re

        toks = re.split(r"\s+", t)
        out = []
        i = 0
        start = 0
        while start < len(toks):
            sub = toks[start : start + chunk]
            out.append((i + 1, start + 1, len(sub), " ".join(sub)))
            i += 1
            start += stride
        return out

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="ab x", min_size=0, max_size=30), min_size=1, max_size=6
        ),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=6),
    )
    def check(texts, chunk, stride):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = {}
        for r in TX.chunk_with_overlap(
            df, chunk_tokens=chunk, stride=stride
        ).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
            )
        for i, t in enumerate(texts):
            want = py_chunks(t, chunk, stride)
            assert sorted(got.get(i, [])) == sorted(want), (t, chunk, stride)

    check()


def test_compression_signal_separates_repetition_from_prose(spark):
    rows = [
        (1, "spam " * 400),                      # templated -> tiny ratio
        (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(400))),  # varied
        (3, ""),                                  # empty -> NULL
        (4, None),                                # null -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in TX.compression_signal(df).collect()}
    assert out[1]["compress_bp"] < 500          # >20x compression
    assert out[2]["compress_bp"] > out[1]["compress_bp"] * 3
    assert out[3]["compress_bp"] is None and out[4]["compress_bp"] is None
    # deterministic: a second run produces identical numbers
    again = {r["doc_id"]: r["compress_bp"]
             for r in TX.compression_signal(df).collect()}
    assert again == {k: v["compress_bp"] for k, v in out.items()}
    # exact python zlib agreement
    import zlib

    b = rows[0][1].encode()
    assert out[1]["n_zlib_bytes"] == len(zlib.compress(b, 6))
    assert out[1]["n_raw_bytes"] == len(b)


def test_minhash_collapse_exact_is_component_equivalent(spark, docs):
    """collapse_exact (the adversarial-corpus armor): on a corpus where
    every doc has k identical copies, the collapsed pair set must be far
    smaller (stars, not cliques) yet yield IDENTICAL connected
    components — the property that makes it safe for dedup pipelines."""
    from pyspark.sql import functions as F

    from kafka_dead_letter_analyzer_spark.operators import graph as G

    base = docs.limit(40).select("doc_id", "text").filter(
        F.trim(F.coalesce(F.col("text"), F.lit(""))) != ""
    )
    k = 5
    corpus = base
    for i in range(1, k):
        corpus = corpus.unionByName(
            base.select(
                (F.col("doc_id") + 100_000 * i).alias("doc_id"), "text"
            )
        )

    full = D.dedup_near_minhash(corpus, threshold=0.5)
    collapsed = D.dedup_near_minhash(corpus, threshold=0.5, collapse_exact=True)
    n_full = full.count()
    n_col = collapsed.count()
    assert n_col < n_full, (n_col, n_full)

    def comps(pairs):
        return {
            (r["id"], r["component"])
            for r in G.connected_components(
                pairs, src="id_a", dst="id_b"
            ).collect()
        }

    assert comps(full) == comps(collapsed)
    # star edges are true pairs: every copy links to its min-id rep at 1.0
    stars = {
        (r["id_a"], r["id_b"])
        for r in collapsed.filter(F.col("jaccard") == 1.0).collect()
    }
    some_id = base.limit(1).collect()[0]["doc_id"]
    assert all(
        (some_id, some_id + 100_000 * i) in stars for i in range(1, k)
    )


def test_kmeans_distributed_matches_local_lloyd(spark):
    """The distributed Lloyd fit must track a from-scratch local numpy
    Lloyd exactly on integer-valued vectors (float64 sums of integers
    are exact, so both paths compute identical centroids and therefore
    identical assignments)."""
    import numpy as np

    rng_free = [
        # two obvious blobs in 2-D, integer coordinates
        (0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0]),
        (4, [20.0, 20.0]), (5, [21.0, 20.0]), (6, [20.0, 21.0]), (7, [21.0, 21.0]),
    ]
    df = spark.createDataFrame(rng_free, "vec_id long, embedding array<double>")
    c, assigned = S.kmeans_fit_distributed(df, n_clusters=2, iters=4)

    x = np.array([v for _, v in rng_free])
    lc = x[:2].copy()  # same deterministic init: first k by id
    for _ in range(4):
        d2 = ((x[:, None, :] - lc[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(2):
            if (a == j).any():
                lc[j] = x[a == j].mean(axis=0)
    assert np.array_equal(c, lc)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    want = ((x[:, None, :] - lc[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    assert got == {i: int(want[i]) for i in range(len(x))}
    # the blobs separate
    assert {got[0], got[4]} == {0, 1} and got[0] != got[4]


def test_incremental_neardup_equals_cross_slice_of_full(spark, docs):
    """The incremental (batch-vs-corpus) pair set must equal the full
    self-join's pairs restricted to cross-partition pairs — and contain
    no corpus x corpus or batch x batch pair by construction."""
    corpus = docs.filter(F.col("doc_id") < 300)
    batch = docs.filter(F.col("doc_id") >= 300)
    inc = {
        (r["corpus_id"], r["new_id"]): r["jaccard"]
        for r in D.dedup_near_minhash_incremental(
            batch, corpus, num_hashes=64, bands=32, threshold=0.3
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.dedup_near_minhash(
            docs, num_hashes=64, bands=32, threshold=0.3
        ).collect()
    }
    cross = {
        k: v for k, v in full.items() if k[0] < 300 <= k[1]
    }
    assert inc == cross
    assert all(c < 300 <= n for c, n in inc)


def test_cache_registry_releases_engine_persists(spark):
    """Operators register their load-bearing mid-plan persists; the
    session owner's release_all() frees the blocks after the consuming
    action without touching caller-owned caches (round-4 advice:
    collapse_exact/q15/q21 persists accumulated across a long session)."""
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        dedup_near_minhash,
    )

    spark.catalog.clearCache()
    cache_registry.release_all()
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different text with other words entirely here")],
        "doc_id long, text string",
    )
    out = dedup_near_minhash(docs, collapse_exact=True)
    out.count()  # consuming action — persists are materialized
    assert cache_registry.tracked_count() >= 2  # grouped + base
    # caller-owned cache must survive release_all
    mine = docs.persist()
    mine.count()
    released = cache_registry.release_all()
    assert released >= 2
    assert cache_registry.tracked_count() == 0
    assert mine.storageLevel.useMemory  # untouched
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    # only the caller's frame remains registered persistent
    mine.unpersist(True)


def test_kmeans_int_matches_from_scratch_integer_lloyd(spark):
    """kmeans_fit_int vs a from-scratch pure-python implementation of
    the same integer spec (floor-scaled vectors, first-min argmin,
    trunc-div recenter, empty keeps previous) on a corpus engineered to
    exercise a tie and a (transiently) small cluster."""
    from kafka_dead_letter_analyzer_spark.operators import similarity as S

    vecs = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [-1.0, 0.0]),
        (3, [-0.9, -0.1]), (4, [0.5, 0.5]), (5, [-0.5, 0.5]),
        (6, [0.0, 0.0]),  # equidistant-ish: tie-break territory
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r["cluster"], r["dim"]): (r["centroid_c"], r["n_members"])
        for r in S.kmeans_fit_int(
            df, n_clusters=2, iters=3, scale=1024
        ).collect()
    }

    # pure-python same spec
    import math

    iv = {i: [math.floor(float(x) * 1024) for x in v] for i, v in vecs}
    c = [iv[0][:], iv[1][:]]
    k, d = 2, 2

    def assign():
        out = {}
        for i, v in iv.items():
            dists = [sum((a - b) ** 2 for a, b in zip(v, cj)) for cj in c]
            out[i] = dists.index(min(dists))  # first min == lowest cluster
        return out

    def tdiv(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    for _ in range(3):
        a = assign()
        for j in range(k):
            members = [iv[i] for i in a if a[i] == j]
            if members:
                c[j] = [
                    tdiv(sum(m[t] for m in members), len(members))
                    for t in range(d)
                ]
    final = assign()
    for j in range(k):
        n = sum(1 for v in final.values() if v == j)
        for t in range(d):
            assert got[(j, t)] == (c[j][t], n), (j, t, got[(j, t)], c[j][t], n)


def test_triangle_counts_match_bruteforce_property(spark):
    """Degree-ordered triangle counting vs from-scratch enumeration on
    seeded random graphs (including duplicate / reversed / self-loop
    input edges, degree ties, and a triangle-free star)."""
    import itertools
    import random

    from kafka_dead_letter_analyzer_spark.operators.graph import triangle_counts

    for seed, n, m in [(1, 12, 30), (2, 20, 60), (3, 8, 28), (4, 10, 9)]:
        rng = random.Random(seed)
        if seed == 4:
            raw = [(0, i) for i in range(1, 10)]  # star: zero triangles
        else:
            raw = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(m)
            ]  # may include self-loops and dup/reversed edges
        edges = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expected: dict = {}
        for u, v, w in itertools.combinations(sorted(adj), 3):
            if v in adj[u] and w in adj[u] and w in adj[v]:
                for x in (u, v, w):
                    expected[x] = expected.get(x, 0) + 1
        df = spark.createDataFrame(
            [(a, b) for a, b in raw if True], "id_a int, id_b int"
        )
        got = {
            r["node"]: r["triangles"]
            for r in triangle_counts(df, "id_a", "id_b").collect()
        }
        assert got == expected, (seed, got, expected)


def test_check_constraints_detects_planted_violations(spark):
    """Each constraint kind must count exactly its planted violations."""
    from kafka_dead_letter_analyzer_spark.operators.profile import (
        check_constraints,
    )

    rows = [
        (1, "alpha", 5.0),
        (2, "beta", -1.0),     # min violation
        (2, "Gamma!", 50.0),   # dup id + pattern violation
        (None, "delta", 999.0),  # null id + max violation (bound 500)
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, v double")
    got = {
        r["check_name"]: (r["observed"], r["bound"], r["passed"])
        for r in check_constraints(
            df,
            [
                ("not_null", "id"),
                ("unique", "id"),
                ("min_at_least", "v", 0),
                ("max_at_most", "v", 500),
                ("matches", "name", "^[a-z]+$"),
                ("row_count_at_least", 10),
            ],
        ).collect()
    }
    assert got == {
        "not_null:id": (1, 0, 0),
        "unique:id": (1, 0, 0),
        "min_at_least:v": (1, 0, 0),
        "max_at_most:v": (1, 0, 0),
        "matches:name": (1, 0, 0),
        "row_count_at_least": (4, 10, 0),
    }, got


def test_check_constraints_all_green_on_clean_frame(spark):
    from kafka_dead_letter_analyzer_spark.operators.profile import (
        check_constraints,
    )

    df = spark.createDataFrame(
        [(i, "ok", float(i)) for i in range(5)], "id bigint, name string, v double"
    )
    res = check_constraints(
        df,
        [
            ("not_null", "id"),
            ("unique", "id"),
            ("min_at_least", "v", 0),
            ("max_at_most", "v", 10),
            ("matches", "name", "^[a-z]+$"),
            ("row_count_at_least", 5),
        ],
    ).collect()
    assert all(r["passed"] == 1 for r in res), res


def test_duplicate_spans_match_bruteforce_property(spark):
    """duplicate_spans vs a from-scratch O(n^2) span finder on seeded
    corpora with planted shared passages, overlaps, and repeats."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        duplicate_spans,
    )

    def brute(docs_tok, k):
        out = set()
        ids = sorted(docs_tok)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                ta, tb = docs_tok[a], docs_tok[b]
                seeds = set()
                grams_b: dict = {}
                for j in range(len(tb) - k + 1):
                    grams_b.setdefault(tuple(tb[j : j + k]), []).append(j)
                for i in range(len(ta) - k + 1):
                    for j in grams_b.get(tuple(ta[i : i + k]), []):
                        seeds.add((i, j))
                # chain diagonals
                by_diag: dict = {}
                for i, j in seeds:
                    by_diag.setdefault(i - j, []).append(i)
                for diag, pos in by_diag.items():
                    pos.sort()
                    run_start = pos[0]
                    prev = pos[0]
                    for p in pos[1:] + [None]:
                        if p is None or p != prev + 1:
                            out.add(
                                (a, b, run_start + 1, run_start - diag + 1,
                                 prev - run_start + k)
                            )
                            if p is not None:
                                run_start = p
                        prev = p if p is not None else prev
        return out

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    passage = [rng.choice(vocab) for _ in range(15)]
    docs = []
    toks = {}
    for d in range(8):
        body = [rng.choice(vocab) for _ in range(rng.randrange(5, 40))]
        if d % 2 == 0:  # plant the passage at a random offset
            at = rng.randrange(0, len(body) + 1)
            body = body[:at] + passage + body[at:]
        toks[d] = body
        docs.append((d, " ".join(body)))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in duplicate_spans(df, k=8).collect()
    }
    assert got == brute(toks, 8), (got ^ brute(toks, 8))


def test_duplicate_spans_df_cap_drops_boilerplate_only(spark):
    """With a df-cap, spans seeded ONLY by over-cap grams disappear while
    rare-gram spans survive — the documented recall trade."""
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        duplicate_spans,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    rare = " ".join(f"r{i}" for i in range(8))
    rows = [(i, f"{boiler} filler{i}") for i in range(10)]
    rows += [(100, f"{rare} endA"), (101, f"{rare} endB")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    full = duplicate_spans(df, k=8).collect()
    capped = duplicate_spans(df, k=8, max_gram_df=5).collect()
    assert any(r["doc_a"] < 100 for r in full)
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(100, 101)}


def test_setsim_prefix_matches_bruteforce_property(spark):
    """Prefix-filtered threshold join vs from-scratch all-pairs Jaccard
    on seeded random token sets, across thresholds (completeness of the
    prefix filter, exactness of verification)."""
    import itertools
    import random

    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        setsim_join_prefix,
    )

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    sets = {}
    for d in range(30):
        s = set(rng.sample(vocab, rng.randrange(3, 15)))
        sets[d] = s
        rows.append((d, " ".join(sorted(s))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for num, den in [(1, 2), (3, 4), (9, 10), (1, 1)]:
        expected = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if den * i >= num * u:
                expected.add((a, b, i, u, 1_000_000 * i // u))
        got = {
            tuple(r)
            for r in setsim_join_prefix(
                df, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == expected, (num, den, got ^ expected)


def test_pagerank_int_matches_scratch_and_properties(spark):
    """pagerank_int vs from-scratch integer power iteration on random
    directed graphs (dangling nodes, multi-edges via duplicate rows,
    self-contained determinism); plus: a hub receiving from everyone
    outranks leaves."""
    import random
    from collections import defaultdict

    from kafka_dead_letter_analyzer_spark.operators.graph import pagerank_int

    for seed, n, m in [(1, 8, 20), (2, 15, 40)]:
        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        df = spark.createDataFrame(edges, "id_a int, id_b int")
        got = {r["node"]: r["rank_int"] for r in pagerank_int(df, iters=3).collect()}
        # r13: the bounded driver path (default) and the distributed
        # iteration must be bit-equal (the connected_components twin)
        dist = {
            r["node"]: r["rank_int"]
            for r in pagerank_int(
                df, iters=3, driver_pair_limit=None
            ).collect()
        }
        assert got == dist, seed
        outd: dict = defaultdict(int)
        nodes = set()
        for u, v in edges:
            outd[u] += 1
            nodes.update((u, v))
        scale, num, den = 1_000_000, 85, 100
        base = (scale * (den - num)) // den
        r = {x: scale for x in nodes}
        for _ in range(3):
            s: dict = defaultdict(int)
            for u, v in edges:
                s[v] += r[u] // outd[u]
            r = {x: base + (num * s.get(x, 0)) // den for x in nodes}
        assert got == r, (seed, got, r)

    star = [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(star, "id_a int, id_b int")
    ranks = {r["node"]: r["rank_int"] for r in pagerank_int(df, iters=2).collect()}
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0)


def test_sorted_neighborhood_matches_bruteforce_property(spark):
    """sorted_neighborhood_pairs vs from-scratch merge/purge on a seeded
    corpus with prefix families, exact dups, and lone records."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(13)
    rows = []
    did = 0
    for fam in range(6):
        stem = f"family{fam:02d} record"
        for v in range(rng.randrange(1, 4)):
            body = f"{stem} alpha beta gamma delta epsilon v{v}"
            rows.append((did, body)); did += 1
    rows.append((did, "")); did += 1  # blank -> excluded (empty set)

    def shingles(text):
        toks = text.strip().lower().split()
        if not toks:
            return frozenset()
        if len(toks) < 3:
            return frozenset([" ".join(toks)])
        return frozenset(" ".join(toks[i:i+3]) for i in range(len(toks)-2))

    pc, w, num, den = 10, 1, 1, 2
    recs = [
        (i, " ".join(t.strip().lower().split())[:pc], shingles(t))
        for i, t in rows if shingles(t)
    ]
    ranks = {k: r + 1 for r, k in enumerate(sorted({k for _, k, _ in recs}))}
    expected = set()
    for i, ka, sa in recs:
        for j, kb, sb in recs:
            if i < j and 0 <= abs(ranks[kb] - ranks[ka]) <= w:
                inter = len(sa & sb); union = len(sa | sb)
                if den * inter >= num * union:
                    expected.add((i, j, abs(ranks[kb] - ranks[ka]),
                                  inter, union, 1_000_000 * inter // union))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        tuple(r)
        for r in sorted_neighborhood_pairs(
            df, prefix_chars=pc, window=w,
            threshold_num=num, threshold_den=den, shingle_k=3,
        ).collect()
    }
    assert got == expected, (got ^ expected)


def test_containment_prefix_matches_bruteforce_property(spark):
    """Asymmetric containment join vs from-scratch all-ordered-pairs
    containment on seeded random token sets, across thresholds
    (completeness of the A-side prefix, exactness of verification) —
    including the geometry Jaccard misses: a small set fully inside a
    large one must surface with containment 1.0."""
    import itertools
    import random

    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        containment_join_prefix,
    )

    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(40)]
    sets = {}
    rows = []
    for d in range(28):
        s = set(rng.sample(vocab, rng.randrange(3, 15)))
        sets[d] = s
        rows.append((d, " ".join(sorted(s))))
    # the quote case: doc 100 is a strict subset of doc 101's tokens
    sets[100] = set(vocab[:4])
    sets[101] = set(vocab[:30])
    rows.append((100, " ".join(sorted(sets[100]))))
    rows.append((101, " ".join(sorted(sets[101]))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for num, den in [(1, 2), (3, 4), (9, 10), (1, 1)]:
        expected = set()
        for a, b in itertools.permutations(sorted(sets), 2):
            i = len(sets[a] & sets[b])
            asz = len(sets[a])
            if den * i >= num * asz:
                expected.add((a, b, i, asz, 1_000_000 * i // asz))
        got = {
            tuple(r)
            for r in containment_join_prefix(
                df, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == expected, (num, den, got ^ expected)
        # the full-quote pair always survives any threshold
        assert any(g[0] == 100 and g[1] == 101 for g in got)


def test_containment_df_cap_matches_filtered_bruteforce(spark):
    """max_df_permille redefines the containment contract over the
    boilerplate-filtered token universe: sizes, intersections, a_sz and
    the threshold all use the FILTERED sets.  Verified against a
    from-scratch brute force that applies the same universe filter —
    and the cap must BIND on this corpus (some token over the cutoff),
    or the test is vacuous."""
    import itertools
    import random

    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        containment_join_prefix,
    )

    rng = random.Random(41)
    vocab = [f"t{i}" for i in range(30)]
    boiler = ["the", "of"]  # in (almost) every doc -> df over any small cap
    sets = {}
    rows = []
    n_docs = 24
    for d in range(n_docs):
        s = set(rng.sample(vocab, rng.randrange(2, 10))) | set(boiler)
        sets[d] = s
        rows.append((d, " ".join(sorted(s))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for permille in (500, 900):
        cap = permille * n_docs / 1000
        dfreq = {}
        for s in sets.values():
            for tk in s:
                dfreq[tk] = dfreq.get(tk, 0) + 1
        assert any(v > cap for v in dfreq.values())  # cap binds
        fsets = {
            d: {tk for tk in s if 1000 * dfreq[tk] <= permille * n_docs}
            for d, s in sets.items()
        }
        expected = set()
        for a, b in itertools.permutations(sorted(fsets), 2):
            if not fsets[a]:
                continue
            i = len(fsets[a] & fsets[b])
            asz = len(fsets[a])
            if 2 * i >= 1 * asz and fsets[b]:
                expected.add((a, b, i, asz, 1_000_000 * i // asz))
        got = {
            tuple(r)
            for r in containment_join_prefix(
                df, threshold_num=1, threshold_den=2,
                max_df_permille=permille,
            ).collect()
        }
        assert got == expected, (permille, got ^ expected)


def test_covariance_stats_matches_numpy(spark):
    """covariance_stats_int's integer sufficient statistics reproduce a
    from-scratch quantized numpy Gram exactly, and the driver estimator
    recovers numpy's sample covariance/mean of the QUANTIZED data (the
    only approximation is the documented floor-quantization)."""
    import math
    import random

    import numpy as np

    from kafka_dead_letter_analyzer_spark.operators.similarity import (
        covariance_from_stats,
        covariance_stats_int,
    )

    rng = random.Random(7)
    d, n, scale = 5, 40, 1 << 14
    vecs = [[rng.uniform(-1, 1) for _ in range(d)] for _ in range(n)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    rows = covariance_stats_int(df, scale=scale).collect()
    assert len(rows) == d * (d + 1) // 2
    # exact check: rebuild the same sums from first principles (float32
    # storage first — createDataFrame round-trips through float32 like
    # the parquet tables do)
    q = np.array(
        [
            [math.floor(float(np.float32(x)) * scale) for x in v]
            for v in vecs
        ],
        dtype=np.int64,
    )
    g = q.T @ q
    s = q.sum(axis=0)
    for r in rows:
        i, j = r["dim_i"] - 1, r["dim_j"] - 1
        assert r["n_rows"] == n
        assert r["sum_qi"] == s[i] and r["sum_qj"] == s[j]
        assert r["sum_qiqj"] == g[i, j], (i, j)
    cov, mean = covariance_from_stats(rows, scale=scale)
    qf = q.astype(np.float64) / scale
    np.testing.assert_allclose(cov, np.cov(qf, rowvar=False, ddof=1), rtol=1e-12)
    np.testing.assert_allclose(mean, qf.mean(axis=0), rtol=1e-12)
    # PCA hook: the estimator output is symmetric PSD up to fp round-off
    evals = np.linalg.eigvalsh(cov)
    assert evals.min() > -1e-12


def test_kcore_matches_bruteforce_peeling(spark):
    """kcore_nodes vs from-scratch simultaneous peeling on structured
    and random graphs: a chain has an empty 2-core, a clique is its own
    core, a star dies for k >= 2, and triangle-plus-tail keeps exactly
    the triangle."""
    import random
    from collections import defaultdict

    from kafka_dead_letter_analyzer_spark.operators.graph import kcore_nodes

    def brute_kcore(edges, k):
        nodes = {x for e in edges for x in e}
        adj = defaultdict(set)
        for u, v in edges:
            if u != v:
                adj[u].add(v)
                adj[v].add(u)
        alive = set(nodes)
        while True:
            deg = {u: len(adj[u] & alive) for u in alive}
            nxt = {u for u in alive if deg[u] >= k}
            if nxt == alive:
                return {u: deg[u] for u in alive}
            alive = nxt

    cases = {
        "chain": [(i, i + 1) for i in range(6)],
        "clique4": [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "star": [(0, i) for i in range(1, 7)],
        "tri_tail": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)],
    }
    rng = random.Random(3)
    cases["rand"] = list(
        {(rng.randrange(12), rng.randrange(12)) for _ in range(25)}
    )
    for name, edges in cases.items():
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        for k in (2, 3):
            want = set(brute_kcore(edges, k).items())
            # both physical strategies against the same brute force:
            # bounded-driver peel (default) and the distributed rounds
            for limit in (1_000_000, None):
                got = {
                    (r["node"], r["core_degree"])
                    for r in kcore_nodes(
                        df, k=k, max_rounds=20, driver_pair_limit=limit
                    ).collect()
                }
                assert got == want, (name, k, limit, got ^ want)


def test_kcore_nonconvergence_raises(spark):
    """A long chain with k=1 converges (every edge endpoint has deg>=1
    immediately), but k=2 peeling from both ends needs ~n/2 rounds — a
    tight max_rounds must RAISE, never return a mid-peel set."""
    import pytest as _pytest

    from kafka_dead_letter_analyzer_spark.operators.graph import kcore_nodes

    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        kcore_nodes(df, k=2, max_rounds=2, driver_pair_limit=None)


def test_fd_profile_semantics(spark):
    """fd_profile on hand-built frames: exact violating group/row
    accounting, NULL rhs never violates, NULL lhs groups like a value,
    empty frames yield zero violations (and NULL max variants)."""
    from kafka_dead_letter_analyzer_spark.operators.profile import fd_profile

    rows = [
        (1, "a", "x"),
        (1, "a", "x"),   # (1,a) consistent -> holds
        (2, "b", "x"),
        (2, "c", "x"),   # lhs=2 has rhs {b,c} -> violating group, 2 rows
        (3, None, "x"),
        (3, "d", "x"),   # NULL rhs ignored -> {d} -> holds
        (None, "e", "x"),
        (None, "f", "x"),  # NULL lhs is a group -> {e,f} violates
    ]
    df = spark.createDataFrame(rows, "k int, v string, w string")
    empty = spark.createDataFrame([], "k int, v string, w string")
    out = {
        r["fd"]: (
            r["lhs_groups"],
            r["violating_groups"],
            r["violating_rows"],
            r["max_rhs_variants"],
        )
        for r in fd_profile(
            {"t": df, "e": empty},
            [
                ("k->v", "t", ["k"], "v"),
                ("k,w->v", "t", ["k", "w"], "v"),
                ("empty", "e", ["k"], "v"),
            ],
        ).collect()
    }
    assert out["k->v"] == (4, 2, 4, 2)
    assert out["k,w->v"] == (4, 2, 4, 2)
    assert out["empty"] == (0, 0, 0, None)


def test_dbscan_grid_matches_bruteforce_property(spark):
    """Grid DBSCAN vs from-scratch all-pairs DBSCAN (Chebyshev metric,
    min-id cluster labels, min-over-cores border assignment) on seeded
    random integer coordinates — negative coords, duplicate points, and
    cell-boundary distances included; eps x min_pts swept so all three
    roles occur."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.similarity import (
        dbscan_grid,
    )

    rng = random.Random(99)
    pts = {}
    for d in range(60):
        pts[d] = (rng.randrange(-20, 21), rng.randrange(-20, 21))
    pts[100] = pts[0]  # exact duplicate coordinates
    pts[101] = (pts[1][0] + 3, pts[1][1])  # exactly eps away at eps=3
    rows = [
        (i, [float(x), float(y)]) for i, (x, y) in sorted(pts.items())
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def brute(eps, min_pts):
        ids = sorted(pts)
        nb = {
            i: [
                j for j in ids
                if j != i
                and abs(pts[i][0] - pts[j][0]) <= eps
                and abs(pts[i][1] - pts[j][1]) <= eps
            ]
            for i in ids
        }
        core = {i for i in ids if len(nb[i]) + 1 >= min_pts}
        parent = {i: i for i in core}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in core:
            for j in nb[i]:
                if j in core:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        # min id per component
        comp_min = {}
        for i in core:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, i), i)
        out = {}
        for i in ids:
            if i in core:
                out[i] = (len(nb[i]), "core", comp_min[find(i)])
            else:
                adj = [comp_min[find(j)] for j in nb[i] if j in core]
                if adj:
                    out[i] = (len(nb[i]), "border", min(adj))
                else:
                    out[i] = (len(nb[i]), "noise", -1)
        return out

    for eps, min_pts in [(3, 4), (7, 6), (1, 2), (12, 10)]:
        got = {
            r["vec_id"]: (r["n_neighbors"], r["role"], r["cluster"])
            for r in dbscan_grid(
                df, scale=1, eps=eps, min_pts=min_pts
            ).collect()
        }
        exp = brute(eps, min_pts)
        assert got == exp, (eps, min_pts,
                            {k: (got.get(k), exp.get(k))
                             for k in set(got) | set(exp)
                             if got.get(k) != exp.get(k)})
        roles = {v[1] for v in exp.values()}
        if (eps, min_pts) == (3, 4):
            assert roles == {"core", "border", "noise"}  # non-vacuous


def test_bfs_hops_matches_bruteforce_both_strategies(spark):
    """bfs_hops vs from-scratch multi-source BFS on seeded random graphs
    plus a long chain — BOTH physical strategies (bounded driver,
    distributed frontier rounds) must produce the identical (node, hop)
    set, and both must RAISE when a reachable node lies beyond
    max_hops."""
    import random

    import pytest as _pytest

    from kafka_dead_letter_analyzer_spark.operators.graph import bfs_hops

    def brute(edges, seeds):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        hops = {s: 0 for s in seeds}
        frontier = set(seeds)
        h = 0
        while frontier:
            h += 1
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in hops:
                        hops[v] = h
                        nxt.add(v)
            frontier = nxt
        return sorted(hops.items())

    rng = random.Random(17)
    edges = {(rng.randrange(40), rng.randrange(40)) for _ in range(45)}
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(100 + i, 101 + i) for i in range(6)]  # 7-node chain
    seeds = [0, 1, 100]
    edf = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    expected = brute(edges, seeds)
    for limit in (1_000_000, None):  # driver path / distributed path
        got = sorted(
            (r["node"], r["hop"])
            for r in bfs_hops(
                edf, sdf, max_hops=10, driver_pair_limit=limit
            ).collect()
        )
        assert got == expected, (limit, got, expected)

    # chain longer than max_hops -> raise, both strategies
    for limit in (1_000_000, None):
        with _pytest.raises(RuntimeError, match="frontier still expanding"):
            bfs_hops(edf, sdf, max_hops=3, driver_pair_limit=limit)


# ---------------------------------------------------------------------------
# Distributed PCA (Gram-matrix accumulation)


def test_pca_matches_direct_numpy_and_is_partition_independent(spark):
    import random

    import numpy as np

    from kafka_dead_letter_analyzer_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    rng = random.Random(0xAC1)
    d, n = 12, 400
    # anisotropic cloud: two dominant directions + noise
    base = np.array([rng.gauss(0, 1) for _ in range(d)])
    rows = []
    for i in range(n):
        v = (
            rng.gauss(0, 5) * np.eye(d)[0]
            + rng.gauss(0, 2) * np.eye(d)[1]
            + np.array([rng.gauss(0, 0.3) for _ in range(d)])
            + base
        )
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    comps, vals, mean, cnt = pca_fit(df, n_components=3)
    assert cnt == n
    # reference: direct numpy on the same matrix
    M = np.array([v for _, v in rows])
    mu = M.mean(axis=0)
    C = (M - mu).T @ (M - mu) / n
    ev, evec = np.linalg.eigh(C)
    order = np.argsort(ev)[::-1][:3]
    ref = evec[:, order].T.copy()
    for i in range(3):
        j = int(np.abs(ref[i]).argmax())
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(vals, ev[order], rtol=1e-9, atol=1e-9)
    assert np.allclose(comps, ref, rtol=1e-7, atol=1e-9)
    assert np.allclose(mean, mu, rtol=1e-12, atol=1e-12)
    # orthonormal components
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-10)
    # partition independence of the accumulation
    comps2, vals2, mean2, cnt2 = pca_fit(df.repartition(13), n_components=3)
    assert cnt2 == n and np.allclose(comps2, comps, atol=1e-9)

    # projection equals (X - mu) @ W^T rowwise
    proj = {
        r["vec_id"]: np.array(r["pc"])
        for r in pca_project(df, comps, mean).collect()
    }
    want = (M - mu) @ comps.T
    for i in range(n):
        assert np.allclose(proj[i], want[i], atol=1e-9), i
    # variance along pc0 ~ eigval0
    P = np.array([proj[i] for i in range(n)])
    assert np.allclose(P.var(axis=0), vals, rtol=1e-6)


def test_pca_guards(spark):
    import pytest as pt

    from kafka_dead_letter_analyzer_spark.operators.similarity import (
        pca_fit,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pt.raises(ValueError, match="n_components"):
        pca_fit(df, n_components=3)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pt.raises(ValueError, match="empty"):
        pca_fit(empty)


def test_pca_mixed_length_vectors_use_majority_dimension(spark):
    import numpy as np

    from kafka_dead_letter_analyzer_spark.operators.similarity import (
        pca_fit,
    )

    rows = [(i, [float(i % 7), 1.0, 2.0, float(i % 3)]) for i in range(50)]
    rows += [(100 + i, [9.9, 9.9]) for i in range(3)]  # corrupt slivers
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps, vals, mean, n = pca_fit(df.repartition(7), n_components=2)
    assert n == 50  # the majority length wins; slivers excluded
    assert comps.shape == (2, 4)
    comps2, _, _, n2 = pca_fit(df.repartition(3), n_components=2)
    assert n2 == 50 and np.allclose(comps, comps2)


def test_prefiltered_contamination_equals_exact(spark):
    """The Bloom prefilter must be output-invisible: byte-identical
    per-doc shared-gram counts vs the plain exact operator, including
    at an aggressively small bitmap (high FP rate — FPs must die in
    the exact join, never inflate a count)."""
    from kafka_dead_letter_analyzer_spark.operators.contamination import (
        ngram_overlap,
        ngram_overlap_prefiltered,
    )

    import random

    rng = random.Random(0xB100)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (f"d{i}", " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(60)
    ]
    bench = [
        (f"b{i}", " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(10)
    ]
    cdf = spark.createDataFrame(docs, "doc_id string, text string")
    bdf = spark.createDataFrame(bench, "doc_id string, text string")
    exact = sorted(
        tuple(r) for r in ngram_overlap(cdf, bdf, n=4).collect()
    )
    # tiny bitmap = FP-heavy (saturation override to prove FPs die in
    # the exact join); big = FP-light; None = auto-sized from the
    # counted benchmark gram set
    for words in (2, 4096, None):
        pre = sorted(
            tuple(r)
            for r in ngram_overlap_prefiltered(
                cdf, bdf, n=4, num_words=words, saturation_bound=1.0
            ).collect()
        )
        assert pre == exact, words


def test_prefiltered_contamination_saturated_bitmap_raises(spark):
    """Round-9 (r8 VERDICT #2): an explicitly-sized bitmap whose
    expected fill exceeds the saturation bound must RAISE with the
    auto-size hint — a saturated prefilter passes ~everything while
    still paying the probe — and the auto path must refuse a gram set
    whose target-fp bitmap would outgrow the broadcast-safety bound."""
    import pytest as pt

    from kafka_dead_letter_analyzer_spark.operators.contamination import (
        ngram_overlap_prefiltered,
    )

    import random

    rng = random.Random(0xB101)
    vocab = [f"w{i}" for i in range(40)]
    cdf = spark.createDataFrame(
        [("d0", " ".join(rng.choice(vocab) for _ in range(30)))],
        "doc_id string, text string",
    )
    bdf = spark.createDataFrame(
        [
            (f"b{i}", " ".join(rng.choice(vocab) for _ in range(30)))
            for i in range(10)
        ],
        "doc_id string, text string",
    )
    with pt.raises(ValueError, match="auto-size|num_words=None"):
        ngram_overlap_prefiltered(cdf, bdf, n=4, num_words=1)
    with pt.raises(ValueError, match="max_words"):
        ngram_overlap_prefiltered(cdf, bdf, n=4, max_words=1)
    # r9 ADVICE opt-out: explicit num_words + saturation_bound=None
    # skips the sizing count AND its validation — the same num_words=1
    # bitmap that raised above now constructs lazily, and the exact
    # join behind the (saturated) prefilter keeps output byte-identical
    from kafka_dead_letter_analyzer_spark.operators.contamination import (
        ngram_overlap,
    )

    lazy = ngram_overlap_prefiltered(
        cdf, bdf, n=4, num_words=1, saturation_bound=None
    )
    exact = ngram_overlap(cdf, bdf, n=4)
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, exact.collect())
    )
    with pt.raises(ValueError, match="saturation_bound"):
        ngram_overlap_prefiltered(cdf, bdf, n=4, saturation_bound=-1.0)


def test_pca_partial_merge_is_distributed_and_partition_independent(spark):
    """Round-9 scale fix (r8 VERDICT #1): the per-task Gram partials
    must merge IN SPARK — the frame pca_fit collects is exactly
    d^2 + d + 1 (pos, val) rows NO MATTER how many scan tasks fed it
    (r8 collected one d^2-wide row PER TASK: tasks x (d^2+d) doubles
    on the driver at 100 TB).  Also pins the merge plan: a hash
    aggregate over the exploded positions, never a single-partition
    collect_list."""
    import numpy as np

    from kafka_dead_letter_analyzer_spark.operators import similarity as S

    d, n = 6, 120
    rows = [(i, [float((i * j) % 11) for j in range(d)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def _partials(batches):
        import numpy as np
        import pandas as pd

        cnt = 0
        sx = np.zeros(d)
        sxx = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cnt += m.shape[0]
            sx += m.sum(axis=0)
            sxx += m.T @ m
        yield pd.DataFrame(
            {"n": [cnt], "sx": [sx.tolist()], "sxx": [sxx.reshape(-1).tolist()]}
        )

    for parts_in in (7, 64):
        vecs = df.repartition(parts_in).select("embedding")
        merged = S._pca_merged_moments(vecs, _partials)
        assert merged.count() == d * d + d + 1, parts_in
    # plan: distributed hash aggregate, no single-partition funnel
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "CollectList" not in plan
    # and the fit itself is unchanged under heavy over-partitioning
    comps_a, vals_a, mean_a, cnt_a = S.pca_fit(df, n_components=2)
    comps_b, vals_b, mean_b, cnt_b = S.pca_fit(
        df.repartition(64), n_components=2
    )
    assert cnt_a == cnt_b == n
    assert np.allclose(comps_a, comps_b, atol=1e-9)
    assert np.allclose(vals_a, vals_b, atol=1e-9)


def test_pca_randomized_matches_exact_on_low_rank(spark):
    """Round-9 (r8 VERDICT #7): method='randomized' must recover the
    exact fit's principal subspace on synthetic low-rank data — the
    d-linear escape hatch for embedding-scale d.  Checked by subspace
    angle (|cos| of each component against the exact one) and
    eigenvalue closeness; also deterministic (seeded probe) and
    partition-independent."""
    import random

    import numpy as np

    from kafka_dead_letter_analyzer_spark.operators.similarity import (
        pca_fit,
    )

    rng = random.Random(0xAC2)
    d, n, r = 16, 500, 3
    # rank-3 signal with well-separated spectrum + small noise
    basis = np.linalg.qr(
        np.array(
            [[rng.gauss(0, 1) for _ in range(r)] for _ in range(d)]
        )
    )[0]
    scales = [9.0, 5.0, 2.5]
    rows = []
    for i in range(n):
        v = basis @ np.array(
            [rng.gauss(0, s) for s in scales]
        ) + 0.01 * np.array([rng.gauss(0, 1) for _ in range(d)])
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    exact_c, exact_v, exact_mu, _ = pca_fit(df, n_components=r)
    rnd_c, rnd_v, rnd_mu, cnt = pca_fit(
        df, n_components=r, method="randomized", n_iter=2
    )
    assert cnt == n
    assert np.allclose(rnd_mu, exact_mu, atol=1e-9)
    for i in range(r):
        cos = abs(float(np.dot(rnd_c[i], exact_c[i])))
        assert cos > 0.999, (i, cos)
    assert np.allclose(rnd_v, exact_v, rtol=0.02)
    # orthonormal output
    assert np.allclose(rnd_c @ rnd_c.T, np.eye(r), atol=1e-8)
    # deterministic + partition-independent (seeded probe; float sums
    # commute to tolerance)
    rnd_c2, _, _, _ = pca_fit(
        df.repartition(13), n_components=r, method="randomized",
        n_iter=2,
    )
    assert np.allclose(np.abs(rnd_c2), np.abs(rnd_c), atol=1e-6)
    import pytest as pt

    with pt.raises(ValueError, match="method"):
        pca_fit(df, n_components=2, method="bogus")
    with pt.raises(ValueError, match="n_iter"):
        pca_fit(df, n_components=2, method="randomized", n_iter=-1)


def test_prefiltered_contamination_validates_target_fp(spark):
    import pytest as pt

    from kafka_dead_letter_analyzer_spark.operators.contamination import (
        ngram_overlap_prefiltered,
    )

    df = spark.createDataFrame(
        [("d0", "a b c d")], "doc_id string, text string"
    )
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pt.raises(ValueError, match="target_fp"):
            ngram_overlap_prefiltered(df, df, n=2, target_fp=bad)
    with pt.raises(ValueError, match="saturation_bound"):
        ngram_overlap_prefiltered(df, df, n=2, saturation_bound=0.0)


def test_bpe_train_collects_exactly_one_row_per_iteration(spark, monkeypatch):
    """r9 VERDICT #8 (driver-memory claims): bpe_train's per-iteration
    driver traffic is the argmax pair ONLY — limit(1) in the plan, so
    every internal collect is exactly <= 1 row regardless of vocab or
    corpus size."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from kafka_dead_letter_analyzer_spark.operators.bpe import bpe_train

    captured = []
    orig = CDF.collect

    def spy(self):
        rows = orig(self)
        captured.append(len(rows))
        return rows

    monkeypatch.setattr(CDF, "collect", spy)
    docs = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ate the cat",)],
        "text string",
    )
    merges = bpe_train(docs, n_merges=5)
    assert len(merges) >= 1
    assert captured and all(n <= 1 for n in captured)


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic dedup
# ---------------------------------------------------------------------------


def _brute_dup_flags(vecs, thr):
    """Pure-Python dominated-by-earlier-id replica: vecs = [(id,
    list)]; returns {id: is_dup} with 6-decimal rounded cosine."""
    import numpy as np

    vecs = sorted(vecs)
    flags = {}
    for j, (jid, vj) in enumerate(vecs):
        vj = np.asarray(vj, dtype=np.float64)
        nj = np.linalg.norm(vj)
        dup = False
        for iid, vi in vecs[:j]:
            vi = np.asarray(vi, dtype=np.float64)
            ni = np.linalg.norm(vi)
            if ni == 0 or nj == 0:
                continue
            if round(float(vi @ vj) / (ni * nj), 6) >= thr:
                dup = True
                break
        flags[jid] = dup
    return flags


def test_semdedup_exhaustive_matches_brute_force(spark):
    """n_clusters=1 flags equal the pure-Python pairwise replica on
    random vectors; zero vectors never match anything; NULL id/vector
    rows are excluded."""
    import random

    rng = random.Random(0x5E3D)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    vecs.append((60, [0.0] * 8))  # zero vector: never a dup
    rows = vecs + [(None, [1.0] * 8), (61, None)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["is_dup"]
        for r in S.semdedup(df, threshold=0.8, n_clusters=1).collect()
    }
    assert None not in got and 61 not in got  # NULLs excluded
    want = _brute_dup_flags(vecs, 0.8)
    assert got == want
    assert got[60] is False  # zero vector
    # at least one planted-style dup exists at this threshold? make one
    planted = vecs + [(100, vecs[3][1])]  # exact copy, higher id
    df2 = spark.createDataFrame(
        planted, "vec_id long, embedding array<double>"
    )
    got2 = {
        r["vec_id"]: r["is_dup"]
        for r in S.semdedup(df2, threshold=0.8, n_clusters=1).collect()
    }
    assert got2[100] is True


def test_semdedup_clustered_subset_and_planted_recall(spark):
    """The clustered scale path may only MISS cross-cell pairs: its
    drop set is a strict subset of the exhaustive drops, and an exact
    planted duplicate (identical vector, higher id) is always caught
    — identical vectors argmax to the same cell."""
    import random

    rng = random.Random(0xC1D0)
    base = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    planted = [(200 + i, base[i][1]) for i in range(10)]
    df = spark.createDataFrame(
        base + planted, "vec_id long, embedding array<double>"
    )
    exh = {
        r["vec_id"]
        for r in S.semdedup(df, threshold=0.9, n_clusters=1).collect()
        if r["is_dup"]
    }
    clu = {
        r["vec_id"]
        for r in S.semdedup(
            df, threshold=0.9, n_clusters=4, sample_size=64
        ).collect()
        if r["is_dup"]
    }
    assert clu <= exh  # clustering only removes candidate pairs
    assert {200 + i for i in range(10)} <= clu  # planted dups caught
    # cells actually split the space (the scale path is real)
    cells = {
        r["cell"]
        for r in S.semdedup(
            df, threshold=0.9, n_clusters=4, sample_size=64
        ).collect()
    }
    assert len(cells) > 1


def test_semdedup_hot_cell_guard_raises_with_hint(spark):
    """r10 VERDICT: a cell lands whole in one applyInPandas task and
    np.stack materializes |cell| x d float64 — the guard must fail
    BEFORE the silent task OOM.  A deliberately tiny max_cell_bytes
    makes the 40-row single cell 'hot'; the raise names the bound and
    suggests a concrete n_clusters; max_cell_bytes=None opts out; the
    default budget passes untouched fixtures."""
    import random

    rng = random.Random(0xB07CE11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # per_row = 16*8 + 8*1024 = 8320 bytes; budget for ~2 rows
    with pytest.raises(ValueError, match="n_clusters"):
        S.semdedup(df, threshold=0.9, n_clusters=1, max_cell_bytes=20_000)
    # guard message carries the sizing hint, not just a refusal
    try:
        S.semdedup(df, threshold=0.9, n_clusters=1, max_cell_bytes=20_000)
    except ValueError as e:
        msg = str(e)
        assert "hottest cell has 40" in msg
        assert "max_cell_bytes=None" in msg
    # explicit opt-out still computes
    n = S.semdedup(
        df, threshold=0.9, n_clusters=1, max_cell_bytes=None
    ).count()
    assert n == 40
    # the default 2 GiB budget clears a small corpus without raising
    assert S.semdedup(df, threshold=0.9, n_clusters=1).count() == 40


def test_semdedup_auto_sizes_the_quantizer(spark):
    """r12 (r11 VERDICT #6): n_clusters='auto' derives k from the
    sizing probe instead of making the caller re-run after the guard
    raise — on a corpus the exhaustive mode would reject under a tiny
    max_cell_bytes, auto picks a k that clears the post-clustering
    bound and completes; on a corpus that fits one task, auto IS the
    exhaustive n_clusters=1 result; the auto-specific validation
    paths raise."""
    import random

    rng = random.Random(0xA07A)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # per_row = 16*8 + 8*1024 = 8320 bytes -> max_rows = 9 under an
    # 80_000-byte budget: exhaustive raises, auto must clear it
    tiny = 80_000
    with pytest.raises(ValueError, match="hottest cell"):
        S.semdedup(df, threshold=0.9, n_clusters=1, max_cell_bytes=tiny)
    out = S.semdedup(
        df, threshold=0.9, n_clusters="auto", max_cell_bytes=tiny
    )
    got = out.collect()
    assert len(got) == 40
    # ceil(40/9) = 5, x4 headroom = 20 cells: the hottest cell stayed
    # under the bound (no raise) and multiple cells were actually used
    assert len({r["cell"] for r in got}) > 1
    # roomy budget: auto collapses to the exhaustive single cell and
    # matches n_clusters=1 bit-for-bit
    auto_roomy = sorted(
        map(
            tuple,
            S.semdedup(df, threshold=0.9, n_clusters="auto").collect(),
        )
    )
    exhaustive = sorted(
        map(tuple, S.semdedup(df, threshold=0.9, n_clusters=1).collect())
    )
    assert auto_roomy == exhaustive
    assert {r[1] for r in auto_roomy} == {0}
    # auto needs a concrete bound, a batch input contract, and sane
    # headroom; non-int non-'auto' is rejected
    with pytest.raises(ValueError, match="max_cell_bytes"):
        S.semdedup(df, n_clusters="auto", max_cell_bytes=None)
    with pytest.raises(ValueError, match="auto_headroom"):
        S.semdedup(df, n_clusters="auto", auto_headroom=0)
    with pytest.raises(ValueError, match="int or"):
        S.semdedup(df, n_clusters="many")


# ---------------------------------------------------------------------------
# N-gram typicality (corpus-frequency LM proxy)
# ---------------------------------------------------------------------------


def _brute_typicality(docs, n):
    """Pure-Python replica: docs = [(id, text)]; returns {id:
    (n_ngrams, sum_freq, min_freq, typicality_ppm)} with the exact
    floor-ppm mean."""
    import re as _re
    from collections import Counter
    from fractions import Fraction

    grams_of = {}
    corpus = Counter()
    for i, t in docs:
        toks = _re.findall(r"[a-z0-9]+", t.lower())
        gs = [
            " ".join(toks[j : j + n])
            for j in range(len(toks) - n + 1)
        ]
        grams_of[i] = gs
        corpus.update(gs)
    out = {}
    for i, gs in grams_of.items():
        if not gs:
            out[i] = (0, 0, None, None)
            continue
        freqs = [corpus[g] for g in gs]
        s = sum(freqs)
        out[i] = (
            len(gs), s, min(freqs),
            int(Fraction(s * 1_000_000, len(gs))),
        )
    return out


def test_ngram_typicality_matches_brute_force(spark):
    """Counts/sum/min/ppm against a pure-Python corpus replica for
    n in {1, 2, 3}, including docs too short to produce any n-gram
    (kept with zero counts — the gate scores everything), mixed case
    and punctuation normalization, NULL id/text exclusion."""
    docs = [
        (1, "the cat sat on the mat"),
        (2, "The CAT sat!"),
        (3, "single"),
        (4, ""),
        (5, "a b a b a"),
        (6, "zq9 unique tokens here"),
    ]
    rows = docs + [(None, "x y"), (7, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 2, 3):
        for method in ("window", "join"):
            got = {
                r["doc_id"]: (
                    r["n_ngrams"], r["sum_freq"], r["min_freq"],
                    r["typicality_ppm"],
                )
                for r in TX.ngram_typicality(
                    df, n=n, method=method
                ).collect()
            }
            assert None not in got and 7 not in got
            assert got == _brute_typicality(docs, n), (n, method)
    with pytest.raises(ValueError, match="n="):
        TX.ngram_typicality(df, n=0)
    with pytest.raises(ValueError, match="method"):
        TX.ngram_typicality(df, method="sort")


def test_ngram_typicality_window_optin_single_scan(spark, docs):
    """The window OPT-IN's plan contract: EXACTLY ONE parquet scan
    (the naive count-table formulation re-explodes the corpus for the
    join probe side — measured 3 scans), corpus counts via a window
    over the gram key (one full-data exchange + the doc contraction,
    nothing else), no Python, no join.  Since round 11 this plan must
    be asked for explicitly — its one-task-per-gram bound makes it a
    small-corpus tool, not the default."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        TX.ngram_typicality(docs, n=2, method="window").explain("formatted")
    s = buf.getvalue()
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1
    assert len(re.findall(r"\(\d+\) Exchange\b", s)) == 2
    assert "Join" not in s
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert node not in s


def test_ngram_typicality_default_is_skew_robust_join(spark, docs):
    """The DEFAULT plan (no method argument) is the skew-robust join
    strategy: no Window node, a gram-keyed join present — the plan
    you'd run at 100x, where any Zipf-head gram breaks the window
    path's single-task bound."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        TX.ngram_typicality(docs, n=2).explain("formatted")
    s = buf.getvalue()
    assert "Window" not in s
    assert "Join" in s


# ---------------------------------------------------------------------------
# BLEU sufficient statistics
# ---------------------------------------------------------------------------


def _brute_bleu(docs, max_n=4):
    """Pure-Python clipped n-gram replica: docs = [(id, cand, ref)];
    returns {id: (cand_len, ref_len, clipped_1.., total_1..)}."""
    import re as _re
    from collections import Counter

    out = {}
    for i, c, r in docs:
        ct = _re.findall(r"[a-z0-9]+", (c or "").lower())
        rt = _re.findall(r"[a-z0-9]+", (r or "").lower())
        clips, tots, rtots = [], [], []
        for n in range(1, max_n + 1):
            cg = Counter(
                " ".join(ct[j : j + n]) for j in range(len(ct) - n + 1)
            )
            rg = Counter(
                " ".join(rt[j : j + n]) for j in range(len(rt) - n + 1)
            )
            clips.append(sum(min(v, rg[g]) for g, v in cg.items()))
            tots.append(max(len(ct) - n + 1, 0))
            rtots.append(max(len(rt) - n + 1, 0))
        out[i] = tuple([len(ct), len(rt)] + clips + tots + rtots)
    return out


def test_bleu_stats_matches_brute_force(spark):
    """Clipped matches / totals against a pure-Python Counter replica:
    the clipping case (candidate repeating a reference word cannot
    farm matches), empty/NULL sides kept as zero-gram rows (an empty
    generation is an eval outcome, not a dropped row), NULL pair ids
    excluded, exact-match pair, and a randomized batch."""
    import random

    rng = random.Random(0xB1E0)
    vocab = ["the", "cat", "sat", "on", "mat", "a", "dog", "ran"]
    docs = [
        (1, "the cat sat on the mat", "the cat sat on a mat"),
        (2, "the the the the", "the cat"),
        (3, "hello world", ""),
        (4, None, "some reference text"),
        (5, "", None),
        (6, "exact match here", "exact match here"),
    ] + [
        (
            10 + k,
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
        )
        for k in range(30)
    ]
    rows = docs + [(None, "x", "x")]
    df = spark.createDataFrame(
        rows, "pair_id long, candidate string, reference string"
    )
    res = TX.bleu_stats(df, max_n=4)
    got = {
        r["pair_id"]: tuple(r[c] for c in res.columns[1:])
        for r in res.collect()
    }
    assert None not in got
    assert got == _brute_bleu(docs, 4)
    with pytest.raises(ValueError, match="max_n"):
        TX.bleu_stats(df, max_n=0)


def _brute_chrf(docs, max_n=6):
    """Pure-Python char-n-gram replica: docs = [(id, cand, ref)]."""
    import re as _re
    from collections import Counter

    out = {}
    for i, c, r in docs:
        cs = _re.sub(r"\s+", "", (c or "").lower())
        rs = _re.sub(r"\s+", "", (r or "").lower())
        clips, ct, rt = [], [], []
        for n in range(1, max_n + 1):
            cg = Counter(cs[j : j + n] for j in range(len(cs) - n + 1))
            rg = Counter(rs[j : j + n] for j in range(len(rs) - n + 1))
            clips.append(sum(min(v, rg[g]) for g, v in cg.items()))
            ct.append(max(len(cs) - n + 1, 0))
            rt.append(max(len(rs) - n + 1, 0))
        out[i] = tuple([len(cs), len(rs)] + clips + ct + rt)
    return out


def test_chrf_stats_matches_brute_force(spark):
    """Char-n-gram clipped matches and both denominators against a
    pure-Python Counter replica: whitespace stripped entirely
    (sacrebleu chrF convention), clipping, empty/NULL sides kept as
    zero-gram rows, NULL ids excluded, randomized batch."""
    import random

    rng = random.Random(0xC4F)
    docs = [
        (1, "the cat sat", "the cat sat"),
        (2, "aaaa", "aa"),
        (3, "hello world", ""),
        (4, None, "ref text"),
        (5, "", None),
    ] + [
        (
            10 + k,
            "".join(rng.choices("abcd efg", k=rng.randint(0, 40))),
            "".join(rng.choices("abcd efg", k=rng.randint(0, 40))),
        )
        for k in range(30)
    ]
    rows = docs + [(None, "x", "x")]
    df = spark.createDataFrame(
        rows, "pair_id long, candidate string, reference string"
    )
    res = TX.chrf_stats(df, max_n=6)
    got = {
        r["pair_id"]: tuple(r[c] for c in res.columns[1:])
        for r in res.collect()
    }
    assert None not in got
    assert got == _brute_chrf(docs, 6)
    with pytest.raises(ValueError, match="max_n"):
        TX.chrf_stats(df, max_n=0)


def test_eval_stats_arrow_matches_expr_impl(spark):
    """The r13 Arrow kernel (declared-query default) is bit-identical
    to the retained expression path — schema (incl. nullability) and
    every int64 count — across bleu and chrf, with and without the
    group_cols passthrough, on edge rows (NULL text, empty text,
    clipping, NULL ids) plus a randomized batch."""
    import random

    rng = random.Random(0xA44)
    vocab = ["the", "cat", "sat", "on", "mat", "a", "dog", "ran"]
    rows = [
        (1, "g1", "the cat sat on the mat", "the cat sat on a mat"),
        (2, "g1", "the the the the", "the cat"),
        (3, "g2", "hello world", ""),
        (4, "g2", None, "some reference text"),
        (5, "g2", "", None),
        (None, "g2", "x", "x"),
    ] + [
        (
            10 + k,
            f"g{k % 3}",
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
        )
        for k in range(40)
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, src string, candidate string, reference string"
    )
    for fn, kw in (
        (TX.bleu_stats, dict(max_n=4)),
        (TX.chrf_stats, dict(max_n=6)),
    ):
        for gc in ((), ("src",)):
            a = fn(df, group_cols=gc, impl="arrow", **kw)
            b = fn(df, group_cols=gc, impl="expr", **kw)
            assert a.schema == b.schema
            assert sorted(map(tuple, a.collect())) == sorted(
                map(tuple, b.collect())
            )
    with pytest.raises(ValueError, match="impl"):
        TX.bleu_stats(df, impl="nope")
    with pytest.raises(ValueError, match="impl"):
        TX.chrf_stats(df, impl="nope")


def test_corpus_eval_rollup_sums_per_pair_stats(spark):
    """The corpus rollup is exactly the column-wise int64 sum of the
    per-pair stats per group plus n_pairs (the corpus/sentence
    distinction: aggregate counts FIRST, float once after — Papineni
    2002 §5), for bleu AND chrf surfaces, grouped and global; the
    group_cols passthrough carries a per-pair-constant column through
    the gram pipeline and validates its input."""
    rows = [
        (1, "g1", "the cat sat on the mat", "the cat sat on a mat"),
        (2, "g1", "the the the the", "the cat"),
        (3, "g2", "hello world", ""),
        (4, "g2", None, "some reference text"),
        (5, "g2", "exact match here", "exact match here"),
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, grp string, candidate string, reference string"
    )
    for fn, kw in ((TX.bleu_stats, {"max_n": 4}), (TX.chrf_stats, {"max_n": 6})):
        stats = fn(df, group_cols=("grp",), **kw)
        per_pair = stats.collect()
        stat_cols = [
            c for c, t in stats.dtypes if t == "bigint" and c != "pair_id"
        ]
        want = {}
        for r in per_pair:
            acc = want.setdefault(r["grp"], [0] * (len(stat_cols) + 1))
            acc[0] += 1
            for i, c in enumerate(stat_cols):
                acc[i + 1] += r[c]
        rolled = TX.corpus_eval_rollup(stats, group_cols=("grp",))
        got = {
            r["grp"]: [r["n_pairs"]] + [r[c] for c in stat_cols]
            for r in rolled.collect()
        }
        assert got == want, fn.__name__
        # global (ungrouped) rollup: one row, sums over everything
        glob = TX.corpus_eval_rollup(stats.drop("grp")).collect()
        assert len(glob) == 1 and glob[0]["n_pairs"] == len(per_pair)
    # validation: unknown column and stat-surface collision both raise
    with pytest.raises(ValueError, match="not a column"):
        TX.bleu_stats(df, group_cols=("nope",))
    with pytest.raises(ValueError, match="collides"):
        TX.bleu_stats(
            df.withColumnRenamed("grp", "cand_len"),
            group_cols=("cand_len",),
        )
    with pytest.raises(ValueError, match="no bigint"):
        TX.corpus_eval_rollup(df.select("pair_id", "grp"), ("grp",))


def _brute_lcs(a, b):
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[n][m]


def test_rouge_l_matches_quadratic_dp(spark):
    """The vectorized prefix-max LCS row update against the textbook
    quadratic DP: randomized token pairs, identical/empty/NULL sides,
    NULL-id exclusion, and the explicit truncation contract (flagged,
    never silent)."""
    import random
    import re as _re

    rng = random.Random(0x70C5)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "a"]
    docs = [
        (1, "the cat sat on the mat", "the dog sat on a mat"),
        (2, "", "x y"),
        (3, None, "x"),
        (4, "a b", None),
        (5, "exact same text", "exact same text"),
    ] + [
        (
            10 + k,
            " ".join(rng.choices(vocab, k=rng.randint(0, 15))),
            " ".join(rng.choices(vocab, k=rng.randint(0, 15))),
        )
        for k in range(40)
    ]
    rows = docs + [(None, "x", "x")]
    df = spark.createDataFrame(
        rows, "pair_id long, candidate string, reference string"
    )
    got = {
        r["pair_id"]: (
            r["cand_len"], r["ref_len"], r["lcs_len"], r["truncated"]
        )
        for r in TX.rouge_l_stats(df).collect()
    }
    assert None not in got
    for i, c, r in docs:
        ct = _re.findall(r"[a-z0-9]+", (c or "").lower())
        rt = _re.findall(r"[a-z0-9]+", (r or "").lower())
        assert got[i] == (len(ct), len(rt), _brute_lcs(ct, rt), False), i
    # truncation: sides beyond max_tokens are cut AND flagged
    long = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(600)), "w5 w6")],
        "pair_id long, candidate string, reference string",
    )
    t = TX.rouge_l_stats(long, max_tokens=512).collect()[0]
    assert t["truncated"] is True and t["cand_len"] == 600
    assert t["lcs_len"] == 2  # w5 w6 are inside the kept prefix
    with pytest.raises(ValueError, match="max_tokens"):
        TX.rouge_l_stats(df, max_tokens=0)


def test_rouge_l_escalation_exact_past_max_tokens(spark):
    """The sharded-exact recipe (r10 VERDICT #5): with escalations=K,
    a pair LONGER than max_tokens still gets its EXACT LCS as long as
    both sides fit max_tokens * 2**K — per-row cap escalates along
    the ladder (pair's own length squared, not the global top cap) —
    while pairs past the TOP rung still truncate there, flagged.
    escalations=0 stays bit-identical to the single-cap behavior."""
    import re as _re

    cand = " ".join(f"w{i}" for i in range(300))
    ref = " ".join(f"w{i}" for i in range(0, 300, 2))  # every other token
    huge = " ".join(f"w{i}" for i in range(5000))
    rows = [
        (1, cand, ref),          # 300 tokens: needs one escalation
        (2, "a b c", "a c"),     # short: base rung, exact either way
        (3, huge, cand),         # 5000 tokens: past top rung at K=2
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, candidate string, reference string"
    )
    got = {
        r["pair_id"]: (r["cand_len"], r["lcs_len"], r["truncated"])
        for r in TX.rouge_l_stats(df, max_tokens=128, escalations=2).collect()
    }
    # pair 1: 300 <= 128*4=512 -> exact, not truncated
    ct = _re.findall(r"[a-z0-9]+", cand.lower())
    rt = _re.findall(r"[a-z0-9]+", ref.lower())
    assert got[1] == (300, _brute_lcs(ct, rt), False)
    assert got[2] == (3, 2, False)
    # pair 3: 5000 > 512 -> truncated at the TOP rung (512), flagged;
    # the kept 512-prefix of huge vs the 300-token cand share w0..w299
    assert got[3] == (5000, 300, True)
    # escalations=0 == today's single-cap behavior, bit-identical
    a = sorted(
        map(tuple, TX.rouge_l_stats(df, max_tokens=128).collect())
    )
    b = sorted(
        map(
            tuple,
            TX.rouge_l_stats(df, max_tokens=128, escalations=0).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="escalations"):
        TX.rouge_l_stats(df, escalations=9)


def test_eval_family_swap_symmetry(spark):
    """Exact structural symmetry: swapping candidate and reference
    leaves the clipped match counts (bleu/chrf) and the LCS length
    (rouge_l) INVARIANT while the two sides' lengths/totals swap —
    min(c_cand, c_ref) and LCS are symmetric by definition, so any
    asymmetry is an implementation bug.  Also pins partition
    independence: ngram_typicality is identical at 1 and 13 input
    partitions."""
    import random

    rng = random.Random(0x5111)
    vocab = ["the", "cat", "sat", "dog", "ran", "a", "mat"]
    docs = [
        (
            k,
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
            " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
        )
        for k in range(30)
    ]
    schema = "pair_id long, candidate string, reference string"
    fwd = spark.createDataFrame(docs, schema)
    rev = spark.createDataFrame(
        [(k, r, c) for k, c, r in docs], schema
    )
    for op, max_n in ((TX.bleu_stats, 4), (TX.chrf_stats, 6)):
        a = {r["pair_id"]: r for r in op(fwd, max_n=max_n).collect()}
        b = {r["pair_id"]: r for r in op(rev, max_n=max_n).collect()}
        for k in a:
            assert a[k]["cand_len"] == b[k]["ref_len"], (op, k)
            assert a[k]["ref_len"] == b[k]["cand_len"], (op, k)
            for n in range(1, max_n + 1):
                assert (
                    a[k][f"clipped_{n}"] == b[k][f"clipped_{n}"]
                ), (op, k, n)
    la = {r["pair_id"]: r for r in TX.rouge_l_stats(fwd).collect()}
    lb = {r["pair_id"]: r for r in TX.rouge_l_stats(rev).collect()}
    for k in la:
        assert la[k]["lcs_len"] == lb[k]["lcs_len"], k
        assert la[k]["cand_len"] == lb[k]["ref_len"], k
    # typicality: partition independence (window keys and contraction
    # keys are data, not layout)
    one = spark.createDataFrame(
        [(k, c) for k, c, _ in docs], "doc_id long, text string"
    )
    r1 = sorted(
        map(tuple, TX.ngram_typicality(one.coalesce(1)).collect())
    )
    r13 = sorted(
        map(tuple, TX.ngram_typicality(one.repartition(13)).collect())
    )
    assert r1 == r13


def test_corpus_eval_rollup_additive_over_concatenation(spark):
    """Corpus additivity (the property that MAKES it corpus-BLEU): the
    rollup of a concatenated pair table equals the column-wise int64
    sum of the parts' rollups, per group — no float, no
    order-sensitivity."""
    a = [(1, "g", "the cat sat", "the cat"), (2, "g", "a b", "b a")]
    b = [(3, "g", "cat cat cat", "cat"), (4, "h", "x y z", "x z")]
    schema = "pair_id long, grp string, candidate string, reference string"

    def roll(rows):
        df = spark.createDataFrame(rows, schema)
        out = TX.corpus_eval_rollup(
            TX.bleu_stats(df, max_n=3, group_cols=("grp",)),
            group_cols=("grp",),
        )
        cols = [c for c in out.columns if c != "grp"]
        return {r["grp"]: [r[c] for c in cols] for r in out.collect()}

    ra, rb, rab = roll(a), roll(b), roll(a + b)
    for g in rab:
        want = [
            x + y
            for x, y in zip(
                ra.get(g, [0] * len(rab[g])), rb.get(g, [0] * len(rab[g]))
            )
        ]
        assert rab[g] == want, g


def test_rouge_l_group_cols_passthrough_and_corpus_rollup(spark):
    """r12 (r11 VERDICT #5): rouge_l_stats carries per-pair-constant
    columns through the Arrow batches like bleu/chrf — per-pair stats
    bit-identical to the passthrough-free run, the group value echoed
    per row — and corpus_eval_rollup over the surface equals the
    column-wise sums per group (with the truncated flag rolled up as
    a count, never silently dropped)."""
    rows = [
        (1, "g1", "the cat sat on the mat", "the cat sat on a mat"),
        (2, "g1", "the the the the", "the cat"),
        (3, "g2", "hello world", ""),
        (4, "g2", None, "some reference text"),
        (5, "g2", "exact match here", "exact match here"),
        (6, "g2", " ".join(f"w{i}" for i in range(600)), "w5 w6"),
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, grp string, candidate string, reference string"
    )
    grp_of = {i: g for i, g, _, _ in rows}
    base = {
        r["pair_id"]: (
            r["cand_len"], r["ref_len"], r["lcs_len"], r["truncated"]
        )
        for r in TX.rouge_l_stats(df).collect()
    }
    stats = TX.rouge_l_stats(df, group_cols=("grp",))
    got = stats.collect()
    assert len(got) == len(base)
    for r in got:
        assert (
            r["cand_len"], r["ref_len"], r["lcs_len"], r["truncated"]
        ) == base[r["pair_id"]], r["pair_id"]
        assert r["grp"] == grp_of[r["pair_id"]]
    # corpus rollup: column-wise sums per group + truncation count
    rolled = {
        r["grp"]: (
            r["n_pairs"], r["cand_len"], r["ref_len"], r["lcs_len"],
            r["n_truncated"],
        )
        for r in TX.corpus_eval_rollup(
            stats.withColumn(
                "n_truncated", F.col("truncated").cast("bigint")
            ).drop("truncated"),
            group_cols=("grp",),
        ).collect()
    }
    want = {}
    for pid, (cl, rl, lcs, tr) in base.items():
        g = grp_of[pid]
        n, c, rr, l, t = want.get(g, (0, 0, 0, 0, 0))
        want[g] = (n + 1, c + cl, rr + rl, l + lcs, t + int(tr))
    assert rolled == want
    # validation mirrors bleu/chrf, including the rouge stat names
    with pytest.raises(ValueError, match="not a column"):
        TX.rouge_l_stats(df, group_cols=("nope",))
    with pytest.raises(ValueError, match="collides"):
        TX.rouge_l_stats(
            df.withColumnRenamed("grp", "lcs_len"),
            group_cols=("lcs_len",),
        )


def test_lsh_tune_s_curve_optimizer():
    """The (bands, rows) tuner (MMDS §3.4): b*r <= num_hashes always;
    the 1/b-root rule of thumb holds (the curve's midpoint
    (1/b)^(1/r) lands near the threshold); higher thresholds pick
    more rows per band; fn-heavy weighting never picks FEWER bands
    than fp-heavy at the same threshold; validation raises.  Pure
    driver-side math — no Spark session needed."""
    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = D.lsh_tune(t, num_hashes=64)
        assert b * r <= 64 and b >= 1 and r >= 1
        midpoint = (1.0 / b) ** (1.0 / r)
        assert abs(midpoint - t) < 0.15, (t, b, r, midpoint)
    b3, r3 = D.lsh_tune(0.3, 128)
    b9, r9 = D.lsh_tune(0.9, 128)
    assert r9 > r3  # high threshold -> longer bands (steeper, righter)
    assert b3 > b9  # low threshold -> more bands (catch weak pairs)
    bfn, _ = D.lsh_tune(0.5, 64, fp_weight=0.1, fn_weight=0.9)
    bfp, _ = D.lsh_tune(0.5, 64, fp_weight=0.9, fn_weight=0.1)
    assert bfn >= bfp  # recall-heavy -> at least as many bands
    import pytest as _pytest

    with _pytest.raises(ValueError, match="threshold"):
        D.lsh_tune(1.0)
    with _pytest.raises(ValueError, match="num_hashes"):
        D.lsh_tune(0.5, 1)
    with _pytest.raises(ValueError, match="weights"):
        D.lsh_tune(0.5, 64, fp_weight=0.0, fn_weight=0.0)


def test_setsim_positional_filter_boundary_pairs(spark):
    """Adversarial corner for the PPJoin POSITIONAL filter in
    setsim_join_prefix: per-pair-disjoint vocabularies make every
    shared token df=2 and every unshared token df=1, so the (df, tk)
    order puts ALL shared tokens at the tail of each doc — the first
    shared token lands at the LAST rank the completeness proof allows
    (rn = sz - inter + 1), where any off-by-one in the integer bound
    (num+den)*(1+min(sza-rna, szb-rnb)) >= num*(sza+szb) would drop a
    true pair.  Overlaps are chosen exactly AT the threshold ceiling
    and one below it, differentially checked against brute force."""
    import itertools

    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        setsim_join_prefix,
    )

    for num, den in [(1, 2), (7, 10)]:
        rows = []
        sets = {}
        doc = 0
        pair_id = 0
        for sza, szb in [(6, 6), (6, 8), (8, 9), (10, 12), (5, 7), (9, 9)]:
            # minimum qualifying overlap: den*i >= num*(sza+szb-i)
            # <=> i >= num*(sza+szb)/(num+den)
            alpha = -(-(num * (sza + szb)) // (num + den))
            for o in (alpha, alpha - 1):
                if o < 1 or o > min(sza, szb):
                    continue
                shared = [f"p{pair_id}s{i}" for i in range(o)]
                a = set(shared + [f"p{pair_id}a{i}" for i in range(sza - o)])
                b = set(shared + [f"p{pair_id}b{i}" for i in range(szb - o)])
                for s in (a, b):
                    sets[doc] = s
                    rows.append((doc, " ".join(sorted(s))))
                    doc += 1
                pair_id += 1
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        expected = set()
        for x, y in itertools.combinations(sorted(sets), 2):
            i = len(sets[x] & sets[y])
            u = len(sets[x] | sets[y])
            if den * i >= num * u:
                expected.add((x, y, i, u, 1_000_000 * i // u))
        got = {
            tuple(r)
            for r in setsim_join_prefix(
                df, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == expected, (num, den, got ^ expected)
        # the at-threshold pairs must actually be present (non-vacuous)
        assert any(den * i == num * u for (_, _, i, u, _) in expected), (
            num, den,
        )


def test_containment_positional_filter_boundary_pairs(spark):
    """Same adversarial geometry for containment_join_prefix: shared
    tokens (df=2) sort after unshared (df=1), the A-side first shared
    token sits at rank sza - inter + 1, and inter is chosen exactly at
    ceil(num*sza/den) and one below; differential vs brute force."""
    import itertools

    from kafka_dead_letter_analyzer_spark.operators import dedup as D

    num, den = 7, 10
    rows = []
    sets = {}
    doc = 0
    pair_id = 0
    for sza, szb in [(5, 9), (10, 10), (6, 14), (10, 30), (7, 8)]:
        alpha = -(-(num * sza) // den)
        for o in (alpha, alpha - 1):
            if o < 1 or o > min(sza, szb):
                continue
            shared = [f"p{pair_id}s{i}" for i in range(o)]
            a = set(shared + [f"p{pair_id}a{i}" for i in range(sza - o)])
            b = set(shared + [f"p{pair_id}b{i}" for i in range(szb - o)])
            for s in (a, b):
                sets[doc] = s
                rows.append((doc, " ".join(sorted(s))))
                doc += 1
            pair_id += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    expected = set()
    for x, y in itertools.permutations(sorted(sets), 2):
        i = len(sets[x] & sets[y])
        a_sz = len(sets[x])
        if den * i >= num * a_sz:
            expected.add((x, y, i, a_sz, 1_000_000 * i // a_sz))
    got = {
        tuple(r)
        for r in D.containment_join_prefix(
            df, threshold_num=num, threshold_den=den
        ).collect()
    }
    assert got == expected, (got ^ expected)
    assert any(den * i == num * a for (_, _, i, a, _) in expected)
