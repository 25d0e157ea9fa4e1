"""Perceptual-hash image near-dup stack (r13): real PNG codec pair,
block-mean grid, dHash/aHash JVM folds, generalized pigeonhole banding.

The declared query (x_phash_near_dups) is oracle-gated end-to-end
through the REAL PNG encode/decode; these tests are the independent
differentials: codec round-trip on all five scanline filters and three
color types, hand-computed grids, hash replicas (incl. the signed bit
63), and the banding recall guarantee vs brute force.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators import dedup as D
from kafka_dead_letter_analyzer_spark.operators import multimodal as MM


def _pixels(w, h, seed=1):
    # deterministic pseudo-pixels, no RNG
    return [((x * 31 + y * 17 + seed * 7) * 13 + seed) % 256
            for y in range(h) for x in range(w)]


def test_png_roundtrip_gray():
    for w, h in ((18, 16), (7, 5), (1, 1), (64, 3)):
        px = _pixels(w, h)
        blob = MM.png_encode_gray(px, w, h)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        gw, gh, gray = MM.png_decode_pixels(blob)
        assert (gw, gh) == (w, h)
        assert gray == px
    with pytest.raises(ValueError, match="pixels"):
        MM.png_encode_gray([1, 2, 3], 2, 2)
    assert MM.png_decode_pixels(None) is None
    with pytest.raises(ValueError, match="not a PNG"):
        MM.png_decode_pixels(b"JUNK" * 4)


def _chunk(tag, data):
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_with_filters(width, height, color, rows_px, filters):
    """Hand-build a PNG whose row r uses filter type filters[r] —
    the from-scratch ENCODER-side filter math (PNG spec §9), so the
    decoder's unfilter path is differentially tested per type."""
    bpp = {0: 1, 2: 3, 6: 4}[color]
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = bytes(rows_px[r * stride:(r + 1) * stride])
        ft = filters[r]
        enc = bytearray(line)
        if ft == 1:
            for i in range(stride - 1, bpp - 1, -1):
                enc[i] = (line[i] - line[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (
                    prev[i] if pb <= pc else c
                )
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_gray():
    w, h = 9, 10
    px = _pixels(w, h, seed=3)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    blob = _png_with_filters(w, h, 0, px, filters)
    gw, gh, gray = MM.png_decode_pixels(blob)
    assert (gw, gh) == (w, h) and gray == px


def test_png_decode_rgb_rgba_luma():
    w, h = 5, 4
    rgb = _pixels(w * 3, h, seed=9)
    blob = _png_with_filters(w, h, 2, rgb, [0, 1, 3, 4])
    _, _, gray = MM.png_decode_pixels(blob)
    want = [
        (299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]) // 1000
        for i in range(0, len(rgb), 3)
    ]
    assert gray == want
    rgba = _pixels(w * 4, h, seed=5)
    blob = _png_with_filters(w, h, 6, rgba, [4, 2, 1, 0])
    _, _, gray = MM.png_decode_pixels(blob)
    want = [
        (299 * rgba[i] + 587 * rgba[i + 1] + 114 * rgba[i + 2]) // 1000
        for i in range(0, len(rgba), 4)
    ]
    assert gray == want
    # unsupported: 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        MM.png_decode_pixels(bad)


def test_gray_block_grid_hand_computed():
    # 4x4 image -> 2x2 grid: each cell the floor mean of a 2x2 block
    img = [0, 10, 20, 30,
           40, 50, 60, 70,
           80, 90, 100, 110,
           120, 130, 140, 150]
    assert MM.gray_block_grid(img, 4, 4, 2, 2) == [
        (0 + 10 + 40 + 50) // 4, (20 + 30 + 60 + 70) // 4,
        (80 + 90 + 120 + 130) // 4, (100 + 110 + 140 + 150) // 4,
    ]
    # uneven split: 5 wide -> cols get 2/3 pixels ([0,2) and [2,5))
    img = [1, 2, 3, 4, 5]
    assert MM.gray_block_grid(img, 5, 1, 2, 1) == [
        (1 + 2) // 2, (3 + 4 + 5) // 3,
    ]
    # grid larger than image: the empty range [0, 1//2) yields 0, the
    # pixel lands in the second block
    assert MM.gray_block_grid([7], 1, 1, 2, 1) == [0, 7]


def _py_dhash(grid, cols=9, rows=8):
    h = 0
    for r in range(rows):
        for c in range(cols - 1):
            if grid[r * cols + c] < grid[r * cols + c + 1]:
                h |= 1 << (r * (cols - 1) + c)
    return h - (1 << 64) if h >= (1 << 63) else h


def _py_ahash(grid):
    m = sum(grid) // len(grid)
    h = 0
    for k, v in enumerate(grid):
        if v > m:
            h |= 1 << k
    return h - (1 << 64) if h >= (1 << 63) else h


def test_dhash_ahash_match_replica(spark):
    rows = []
    for seed in range(6):
        rows.append((seed, [((i * 37 + seed * 101) * 7 + 3) % 256
                            for i in range(72)]))
    # force bit 63 (sign) on dhash: k=63 -> r=7, c=7 -> grid[70] < grid[71]
    asc = list(range(72))
    rows.append((100, asc))
    df = spark.createDataFrame(rows, "media_id long, grid array<int>")
    got = {
        r["media_id"]: r["dh"]
        for r in df.select(
            "media_id", MM.dhash64("grid").alias("dh")
        ).collect()
    }
    for mid, grid in rows:
        assert got[mid] == _py_dhash(grid), mid
    # ahash needs a 64-cell grid; check separately
    rows64 = [(s, g[:64]) for s, g in rows]
    df64 = spark.createDataFrame(rows64, "media_id long, grid array<int>")
    got64 = {
        r["media_id"]: r["ah"]
        for r in df64.select(
            "media_id", MM.ahash64("grid").alias("ah")
        ).collect()
    }
    for mid, grid in rows64:
        assert got64[mid] == _py_ahash(grid), mid
    # ascending grid sets every dhash bit -> -1 (all ones, signed)
    assert _py_dhash(asc) == -1 and got[100] == -1
    with pytest.raises(ValueError, match="dhash64"):
        MM.dhash64("grid", cols=5, rows=5)
    with pytest.raises(ValueError, match="ahash64"):
        MM.ahash64("grid", n=32)


def test_hash64_hamming_pairs_recall_vs_bruteforce(spark):
    """The pigeonhole guarantee, mirroring the x_dedup_simhash recall
    contract: for every (max_hamming, n_bands) config the banded join
    equals BRUTE-FORCE all-pairs filtering — including planted pairs
    at exactly max_hamming and hashes crossing the sign bit."""
    base = -0x7213F9A55AA55AA6  # sign bit set
    hashes = [base]
    for k in (0, 5, 17, 33, 48, 63):          # hamming 1 neighbors
        hashes.append(base ^ (1 << k) - ((base ^ (1 << k)) >> 63 << 64 if False else 0))
    hashes = [h if h < 1 << 63 else h - (1 << 64) for h in
              [base & 0xFFFFFFFFFFFFFFFF]
              + [(base ^ (1 << k)) & 0xFFFFFFFFFFFFFFFF
                 for k in (0, 5, 17, 33, 48, 63)]
              + [(base ^ 0b111 << s) & 0xFFFFFFFFFFFFFFFF
                 for s in (0, 20, 40, 61)]     # hamming 3
              + [(base ^ 0x1F << s) & 0xFFFFFFFFFFFFFFFF
                 for s in (7, 30)]             # hamming 5
              + [((i * 0x9E3779B97F4A7C15) ^ base)
                 & 0xFFFFFFFFFFFFFFFF for i in range(1, 8)]]
    rows = [(i, h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "id long, h long")

    def brute(max_h):
        out = set()
        for i, a in rows:
            for j, b in rows:
                if i < j:
                    d = bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
                    if d <= max_h:
                        out.add((i, j, d))
        return out

    from kafka_dead_letter_analyzer_spark import cache_registry

    for max_h, n_bands in ((0, 1), (1, 2), (3, 4), (3, 8), (4, 5),
                           (5, 6), (6, 16)):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in D.hash64_hamming_pairs(
                df, "id", "h", max_hamming=max_h, n_bands=n_bands
            ).collect()
        }
        assert got == brute(max_h), (max_h, n_bands)
        cache_registry.release_all()
    with pytest.raises(ValueError, match="max_hamming"):
        D.hash64_hamming_pairs(df, "id", "h", max_hamming=-1)
    with pytest.raises(ValueError, match="n_bands"):
        D.hash64_hamming_pairs(df, "id", "h", max_hamming=3, n_bands=3)
    with pytest.raises(ValueError, match="n_bands"):
        D.hash64_hamming_pairs(df, "id", "h", max_hamming=3, n_bands=65)


def test_image_phash_pipeline_matches_pixel_replica(spark):
    """encode (real PNG) -> decode (real unfilter) -> grid -> dhash
    equals the pure-Python pixel-side replica, end to end, for images
    needing uneven block splits."""
    w, h = 19, 17     # deliberately NOT multiples of 9/8
    rows = [(i, _pixels(w, h, seed=i)) for i in range(5)]
    df = spark.createDataFrame(rows, "media_id long, pixels array<int>")
    media = MM.encode_gray_media(df, width=w, height=h)
    grid = MM.image_gray_grid(media, cols=9, rows=8)
    got = {
        r["media_id"]: (r["n_bytes"], list(r["grid"]), r["dh"])
        for r in grid.select(
            "media_id", "n_bytes", "grid",
            MM.dhash64("grid").alias("dh"),
        ).collect()
    }
    for mid, px in rows:
        want_grid = MM.gray_block_grid(px, w, h, 9, 8)
        assert got[mid][1] == want_grid, mid
        assert got[mid][2] == _py_dhash(want_grid), mid
        assert got[mid][0] == len(MM.png_encode_gray(px, w, h))


# ---------------------------------------------------------------------------
# exact_substring_cut (r13): keep-first cut decision, planted spans
# ---------------------------------------------------------------------------


def _brute_cut(rows, k=8):
    """From-scratch keep-first cut replica: every k-gram occurrence
    that is not the lexicographically-first (doc, pos) for its exact
    text contributes [pos, pos+k-1]; per-doc ranges merge when they
    overlap or touch."""
    occ = {}
    grams = {}
    for did, text in rows:
        toks = (text or "").strip().lower().split()
        grams[did] = [
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        ]
    for did in sorted(grams):
        for p0, g in enumerate(grams[did]):
            occ.setdefault(g, []).append((did, p0 + 1))
    marked = {}
    for g, places in occ.items():
        for did, pos in sorted(places)[1:]:
            marked.setdefault(did, set()).add(pos)
    out = set()
    for did, poss in marked.items():
        cur = None
        for pos in sorted(poss):
            lo, hi = pos, pos + k - 1
            if cur and lo <= cur[1] + 1:
                cur = (cur[0], max(cur[1], hi))
            else:
                if cur:
                    out.add((did, cur[0], cur[1]))
                cur = (lo, hi)
        if cur:
            out.add((did, cur[0], cur[1]))
    return out


def test_exact_substring_cut_planted_spans(spark):
    """Planted-span recall (the r12 verdict's done-bar): a span shared
    by three documents survives only at its first (doc, pos); a
    within-document repeat is cut; overlapping plants merge into one
    interval; a unique document emits nothing; and the whole output
    equals the brute-force keep-first replica."""
    span = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    span2 = "one two three four five six seven eight nine ten"
    filler = lambda s, n: " ".join(f"{s}{i}" for i in range(n))
    rows = [
        (1, filler("a", 5) + " " + span + " " + filler("b", 5)),
        # same span later in corpus order -> cut here
        (2, filler("c", 3) + " " + span + " " + filler("d", 4)),
        # two plants in one doc: the corpus-first is in doc 1, so BOTH
        # occurrences here are cut; they are disjoint -> two intervals
        (3, span + " " + filler("e", 6) + " " + span),
        # overlapping duplicated region: span2 twice, shifted by less
        # than its length inside doc 5 -> merged single interval
        (4, filler("f", 2) + " " + span2 + " " + filler("g", 3)),
        (5, span2 + " " + span2),
        (6, filler("unique", 12)),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["cut_start"], r["cut_end"])
        for r in D.exact_substring_cut(df, k=8).collect()
    }
    want = _brute_cut(rows, k=8)
    assert got == want
    # structure spot-checks, independent of the replica
    docs_cut = {d for d, _, _ in got}
    assert 1 not in docs_cut          # first occurrence survives
    assert 6 not in docs_cut and 7 not in docs_cut
    assert len([t for t in got if t[0] == 3]) == 2   # disjoint plants
    assert len([t for t in got if t[0] == 5]) == 1   # merged overlap
    # recall invariant: every non-first duplicated gram occurrence is
    # fully covered by some cut interval of its doc
    k = 8
    grams = {}
    for did, text in rows:
        toks = (text or "").strip().lower().split()
        for i in range(len(toks) - k + 1):
            grams.setdefault(
                " ".join(toks[i:i + k]), []
            ).append((did, i + 1))
    for g, places in grams.items():
        for did, pos in sorted(places)[1:]:
            assert any(
                d == did and s <= pos and pos + k - 1 <= e
                for d, s, e in got
            ), (g, did, pos)
    with pytest.raises(ValueError, match="k="):
        D.exact_substring_cut(df, k=0)


def test_exact_substring_cut_partitioning_invariance(spark):
    """The cut list is a pure function of the corpus — identical under
    any input partitioning (min-(doc,pos) contraction + per-doc
    windows are both layout-independent)."""
    span = "p q r s t u v w x y z"
    rows = [(i, f"head{i} " + span + f" tail{i}") for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        tuple(r) for r in D.exact_substring_cut(df, k=8).collect()
    }
    assert base == _brute_cut(rows, k=8)
    got13 = {
        tuple(r)
        for r in D.exact_substring_cut(df.repartition(13), k=8).collect()
    }
    assert got13 == base


def test_hash64_hamming_join_incremental_vs_bruteforce(spark):
    """Incremental new-vs-corpus Hamming join equals brute-force
    filtering of the cross product (pigeonhole recall), excludes
    re-submitted identical ids, and never pairs corpus with itself."""
    base = 0x0123456789ABCDEF
    mk = lambda h: h - (1 << 64) if h >= 1 << 63 else h
    corpus = [(i, mk((base ^ (1 << (i * 5))) & 0xFFFFFFFFFFFFFFFF))
              for i in range(10)]
    new = (
        [(100 + i, mk((base ^ (0b11 << (i * 7))) & 0xFFFFFFFFFFFFFFFF))
         for i in range(6)]
        # re-submitted item: same id AND hash as corpus row 3
        + [corpus[3]]
    )
    ndf = spark.createDataFrame(new, "id long, h long")
    cdf = spark.createDataFrame(corpus, "id long, h long")

    def brute(max_h):
        out = set()
        for ni, nh in new:
            for ci, ch in corpus:
                if ni == ci:
                    continue
                d = bin((nh ^ ch) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= max_h:
                    out.add((ni, ci, d))
        return out

    from kafka_dead_letter_analyzer_spark import cache_registry

    for max_h, n_bands in ((0, 1), (2, 3), (3, 4), (4, 5), (6, 8)):
        got = {
            (r["new_id"], r["corpus_id"], r["hamming"])
            for r in D.hash64_hamming_join(
                ndf, cdf, "id", "h",
                max_hamming=max_h, n_bands=n_bands,
            ).collect()
        }
        assert got == brute(max_h), (max_h, n_bands)
        cache_registry.release_all()
    # the re-submitted id pairs with NOTHING at hamming 0 but itself,
    # and that self-pair is excluded
    got0 = {
        (r["new_id"], r["corpus_id"])
        for r in D.hash64_hamming_join(
            ndf, cdf, "id", "h", max_hamming=0
        ).collect()
    }
    assert (3, 3) not in got0
    with pytest.raises(ValueError, match="n_bands"):
        D.hash64_hamming_join(ndf, cdf, "id", "h",
                              max_hamming=3, n_bands=2)


def test_apply_substring_cuts_planted(spark):
    """Cut application: hand-checkable expectations — first occurrence
    intact, later occurrences excised, a fully-duplicated doc cleans
    to empty, docs without cuts (and NULL/blank docs) pass through
    whole, and the accounting columns add up."""
    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, span + " tail1 tail2"),
        (2, "head1 head2 " + span),       # cut -> "head1 head2"
        (3, span),                        # fully duplicated -> ""
        (4, "totally unrelated content here"),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cuts = D.exact_substring_cut(df, k=8)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["cut_tokens"], r["kept_tokens"],
            r["cleaned_text"],
        )
        for r in D.apply_substring_cuts(df, cuts).collect()
    }
    assert len(got) == 6
    assert got[1] == (10, 0, 10, span + " tail1 tail2")
    assert got[2] == (10, 8, 2, "head1 head2")
    assert got[3] == (8, 8, 0, "")
    assert got[4] == (4, 0, 4, "totally unrelated content here")
    assert got[5] == (0, 0, 0, "")
    assert got[6] == (0, 0, 0, "")
    for n, c, kk, txt in got.values():
        assert n == c + kk
        assert kk == (len(txt.split()) if txt else 0)


def test_local_relation_df_contract(spark):
    """VALUES-backed local frames: LocalTableScan plan (the whole
    point — no Python-RDD leaf), exact schema, literal escaping,
    NaN/Infinity doubles, empty fallback, complex-type refusal."""
    import contextlib
    import io as _io

    from kafka_dead_letter_analyzer_spark.operators.io import (
        local_relation_df,
    )

    df = local_relation_df(
        spark,
        [(1, "it's", 0.5, None, True),
         (2, "x", float("nan"), 7, False),
         (3, "y", float("inf"), -1, None)],
        "id long, s string, f double, n bigint, b boolean",
    )
    assert df.schema.simpleString() == (
        "struct<id:bigint,s:string,f:double,n:bigint,b:boolean>"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["s"] == "it's" and rows[1]["n"] is None
    assert rows[2]["f"] != rows[2]["f"]          # NaN
    assert rows[3]["f"] == float("inf")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    s = buf.getvalue()
    assert "LocalTableScan" in s and "ExistingRDD" not in s
    assert local_relation_df(spark, [], "a long").count() == 0
    with pytest.raises(ValueError, match="flat scalar"):
        local_relation_df(spark, [(1,)], "a array<int>")
    with pytest.raises(TypeError, match="unsupported literal"):
        local_relation_df(spark, [((1, 2),)], "a string")
