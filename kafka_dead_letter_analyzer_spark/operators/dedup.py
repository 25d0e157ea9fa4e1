"""Deduplication operators for large-scale training-data pipelines
(north-star extensions, BASELINE.json; designed for 100 TB by construction).

Four strategies, strongest-guarantees first:

- exact: hash-groupBy on a normalized fingerprint — one shuffle, map-side
  partial aggregation, no data movement beyond |groups|.
- MinHash + LSH: shingle -> minhash signature -> banded bucket join.
  Only same-bucket candidate pairs are materialized; the full O(n²)
  comparison never happens. Shuffle volume = bands x |docs| small rows.
- SimHash: 64-bit locality-sensitive fingerprint; near-dup = small
  Hamming distance, found via band-equality join + bit_count(xor).
- n-gram Jaccard: exact pairwise similarity on character shingle sets —
  the verification primitive (used to confirm LSH candidates) and, on
  bounded subsets, an oracle-checkable ground truth.

Everything is built from built-in column expressions (higher-order array
functions + xxhash64) — no Python in the hot path, no driver-side loops.
"""


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from kafka_dead_letter_analyzer_spark import cache_registry

from kafka_dead_letter_analyzer_spark.operators.text import fingerprint

# Unresolved-Column / pandas-UDF memo. The shingle->hash trees are deep
# higher-order-function expressions whose CONSTRUCTION costs ~2 s of py4j
# round-trips per call (measured at sf0.1: plan building, not execution,
# dominated dedup_near_minhash's warm time — same finding as the round-2
# topology caches). Unresolved Columns are immutable and bind per-plan at
# select(), so trees that are pure functions of fixed column names are
# built once per process and reused across queries.
_MEMO: dict = {}


def _memo(key, build):
    c = _MEMO.get(key)
    if c is None:
        c = _MEMO[key] = build()
    return c

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup on raw column equality — ``dropDuplicates``: one
    hash-shuffle on the key columns, first-arrival row kept per key."""
    return df.dropDuplicates(cols)


def dedup_exact_normalized(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content dedup on the normalized fingerprint (text.py): keeps the
    min-id representative per content group and reports group size.

    Deterministic (unlike dropDuplicates' arrival order) and
    oracle-checkable; one shuffle with partial min/count aggregation.
    """
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).cast("int").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash signatures
# ---------------------------------------------------------------------------


def _tokens(text: Column) -> Column:
    # NULL text normalizes to the empty token list (never [""]): a NULL/blank
    # doc must have an EMPTY shingle set, or every such doc collides in every
    # minhash band with all other empty docs, inflating the candidate join.
    t = F.trim(F.lower(F.coalesce(text, F.lit(""))))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_grams(text: Column, k: int = 3) -> Column:
    """ALL k-token grams in document order (duplicates preserved, for
    occurrence counting — repetition ratios need multiplicity). Documents
    shorter than k tokens contribute their whole token sequence as one
    gram; NULL/blank documents contribute the EMPTY list."""
    toks = _tokens(text)
    n = F.size(toks)
    # k-grams as the token array zipped with its own k-1 shifts
    # (shifted-slice arrays_zip): shallow vectorized array ops. The
    # per-position formulation (transform over positions with slice +
    # concat_ws) is interpreted per gram — measured 5.7x slower on the
    # bench corpus.
    m = F.greatest(n - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, 1 + i, m) for i in range(k)])
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])
    )
    whole = F.array(F.concat_ws(" ", toks))
    return (
        F.when(n >= k, grams)
        .when(n > 0, whole)
        .otherwise(F.array().cast("array<string>"))
    )


def token_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined). Documents shorter than k
    tokens contribute their whole token sequence as one shingle; NULL/blank
    documents contribute the EMPTY set (no signature bucket collisions)."""
    return F.array_distinct(token_grams(text, k))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the normalized text. Sub-n-char docs
    fall back to the whole text as one gram; NULL -> empty set."""
    t = F.lower(F.coalesce(text, F.lit("")))
    ln = F.length(t)
    # same shifted-slice arrays_zip trick as token_grams: zip the char
    # array with its n-1 shifts instead of substr-per-position (2.9x,
    # unicode-identical — split('') is codepoint-wise like substr)
    chars = F.split(t, "")
    m = F.greatest(ln - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(chars, 1 + i, m) for i in range(n)])
    grams = F.transform(
        z, lambda s: F.concat_ws("", *[s[str(i)] for i in range(n)])
    )
    return F.array_distinct(
        F.when(ln >= n, grams)
        .when(ln > 0, F.array(t))
        .otherwise(F.array().cast("array<string>"))
    )


def shingle_hashes(shingles: Column) -> Column:
    """Hash each shingle string to int64 ONCE (the expensive string pass
    stays JVM-side); all downstream minhash math works on these longs."""
    return F.transform(shingles, lambda x: F.xxhash64(x))


def _minhash_band_udf(num_hashes: int, bands: int):
    """Arrow-vectorized signature+banding: affine permutations of the base
    hashes in uint64 numpy (wrap-around multiply = the classic
    ``h*a+b mod 2^64`` permutation family; constants from splitmix64 so the
    family is deterministic and platform-independent).

    Why a pandas UDF: nested higher-order lambdas are interpreted
    per-element in Spark and re-inlined per band — measured ~100x slower
    than this vectorized path. The string hashing (the actually expensive
    part) already happened JVM-side in :func:`shingle_hashes`.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as SF

    memoized = _MEMO.get(("band_udf", num_hashes, bands))
    if memoized is not None:
        return memoized

    rows_per_band = num_hashes // bands

    def _splitmix(seed: np.uint64, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint64)
        x = np.uint64(seed)
        with np.errstate(over="ignore"):
            for i in range(n):
                x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
                z = x
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                out[i] = z ^ (z >> np.uint64(31))
        return out

    a = (_splitmix(np.uint64(1), num_hashes) | np.uint64(1))  # odd multipliers
    b = _splitmix(np.uint64(2), num_hashes)

    @SF.pandas_udf("array<bigint>")
    def bands_of(hashes: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for hs in hashes:
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                if h.size == 0:
                    out.append([0] * bands)
                    continue
                # (|shingles| x num_hashes) permuted matrix -> column mins
                sig = (h[:, None] * a[None, :] + b[None, :]).min(axis=0)
                # fold each band of the signature into one bucket hash
                bb = sig.reshape(bands, rows_per_band)
                acc = np.zeros(bands, dtype=np.uint64)
                for j in range(rows_per_band):
                    acc = (acc ^ bb[:, j]) * np.uint64(0x100000001B3)
                out.append(acc.astype(np.int64).tolist())
        return pd.Series(out)

    _MEMO[("band_udf", num_hashes, bands)] = bands_of
    return bands_of


def lsh_tune(
    threshold: float,
    num_hashes: int = 64,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Pick ``(bands, rows_per_band)`` for MinHash LSH from the target
    Jaccard ``threshold`` — the classic S-curve optimizer (Leskovec,
    Rajaraman & Ullman, *Mining of Massive Datasets* §3.4; the same
    recipe the public datasketch library ships): a candidate pair with
    similarity ``s`` collides with probability ``1 - (1 - s^r)^b``,
    so the tuner scans every (b, r) with ``b*r <= num_hashes`` and
    minimizes ``fp_weight * integral_0^t P(s) ds + fn_weight *
    integral_t^1 (1 - P(s)) ds`` by deterministic midpoint quadrature
    (1000 points, pure driver-side float math — no RNG, no Spark job).

    Returns the (bands, rows) to pass to :func:`dedup_near_minhash`.
    Raising ``fn_weight`` pushes the S-curve left (catch more true
    pairs, verify more false candidates); raising ``fp_weight`` does
    the reverse.  The verify join makes false positives a COST knob,
    not a correctness one — emitted pairs are always exact-Jaccard
    checked — while false negatives are unrecoverable, so pipelines
    that must not miss near-dups should weight fn higher."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(
            f"lsh_tune: threshold={threshold} must be in (0, 1)"
        )
    if num_hashes < 2:
        raise ValueError(
            f"lsh_tune: num_hashes={num_hashes} must be >= 2"
        )
    if fp_weight < 0 or fn_weight < 0 or fp_weight + fn_weight == 0:
        raise ValueError(
            "lsh_tune: weights must be >= 0 and not both zero"
        )
    n_pts = 1000
    best = None
    # full integer scan: EVERY (b, r) with b*r <= num_hashes, not just
    # the maximal r per b — a non-maximal r can win for some
    # threshold/weight mixes (fewer hash rows steepen nothing, but the
    # S-curve midpoint (1/b)^(1/r) moves, and the error integral with
    # asymmetric weights is not monotone in r at fixed b)
    for b in range(1, num_hashes + 1):
        for r in range(1, num_hashes // b + 1):
            fp = fn = 0.0
            for i in range(n_pts):
                s = (i + 0.5) / n_pts
                p = 1.0 - (1.0 - s**r) ** b
                if s < threshold:
                    fp += p
                else:
                    fn += 1.0 - p
            err = (fp_weight * fp + fn_weight * fn) / n_pts
            # deterministic tiebreak: first (b asc, r asc) win kept —
            # fewer bands = cheaper banding pass
            if best is None or err < best[0] - 1e-12:
                best = (err, b, r)
    return best[1], best[2]


def dedup_near_minhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.

    ``collapse_exact=True`` is the adversarial-corpus armor: exact
    duplicates (identical text) are collapsed to one representative (the
    min id) BEFORE banding, and each group is emitted as a STAR
    (rep -> member, jaccard 1.0) instead of its quadratic clique. An
    exact-dup group of k docs otherwise lands all k members in every
    band bucket, and the candidate join blows up k^2 per bucket —
    measured on a 100-identical-copies corpus (500k docs): 42 GB spill /
    345 s without collapsing vs linear behavior with it. The emitted
    pair set is smaller but COMPONENT-EQUIVALENT: every star edge is a
    true jaccard-1 pair, and any cross-group near-dup pair is
    represented through the reps, so connected components (the dedup
    pipeline's consumer) are identical. Leave off when the caller needs
    the literal all-pairs listing.

    Plan shape (scale path):
    1. narrow: shingle (JVM) -> base hashes (JVM), persisted as the compact
       ``(id, array<int64>)`` signature-input table. Persisting here is the
       cluster-scale design, not a local hack: the table is consumed three
       times (banding + both sides of the verify join) and is far smaller
       than the raw text; recomputing interpreted higher-order shingle
       expressions per consumer dominates the runtime otherwise (measured
       ~13x on the bench corpus).
    2. signature+bands via the vectorized Arrow UDF; explode bands;
       self-join on (band, bucket) carrying ONLY ids — the candidate
       shuffle moves 12-byte rows, never shingle arrays;
    3. distinct candidate id-pairs, re-join the hashed shingle sets by id,
       exact Jaccard over int64 arrays (set semantics preserved by
       xxhash64 modulo a ~2^-64 collision), filter.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    from pyspark import StorageLevel

    bands_of = _minhash_band_udf(num_hashes, bands)
    hashes_col = _memo(
        ("shingle_hashes", text_col, shingle_k),
        lambda: shingle_hashes(token_shingles(F.col(text_col), shingle_k)),
    )
    # NULL/blank docs have the empty shingle set: no signature, no
    # candidacy (they'd otherwise all band-collide on the empty input).
    # The predicate is the CHEAP scan-level equivalent of
    # size(_hashes) > 0 (hashes are empty iff the trimmed text is) — it
    # reaches the parquet scan instead of evaluating the shingle tree.
    # No CPU spread here: measured at sf0.1, the persisted-base consumers
    # (banding UDF + verify joins), not shingle construction, dominate,
    # and the persist already distributes its partitions.
    nonblank = F.trim(F.coalesce(F.col(text_col), F.lit(""))) != ""
    star_edges = None
    src = docs.filter(nonblank)
    if collapse_exact:
        from pyspark.sql import Window

        # one md5-keyed shuffle assigns each doc its group representative;
        # the md5 (not raw text) is the shuffle key, so text never moves
        grouped = src.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias(text_col),
            F.min(id_col)
            .over(Window.partitionBy(F.md5(F.coalesce(F.col(text_col), F.lit("")))))
            .alias("_rep"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.track(grouped)
        star_edges = (
            grouped.filter(F.col("_id") != F.col("_rep"))
            .select(
                F.col("_rep").alias("id_a"),
                F.col("_id").alias("id_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        src = grouped.filter(F.col("_id") == F.col("_rep")).select(
            F.col("_id").alias(id_col), text_col
        )
    base = (
        src.select(
            F.col(id_col).alias("_id"),
            hashes_col.alias("_hashes"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cache_registry.track(base)
    banded = base.select("_id", bands_of("_hashes").alias("_bands"))
    ex = banded.select("_id", F.posexplode("_bands").alias("band", "bucket"))

    # Candidate pairs via ONE (band, bucket) grouping instead of the
    # banded frame self-joined on the bucket key: the self-join evaluated
    # the banding-UDF subtree twice (both join branches) and shuffled the
    # id/band/bucket rows twice; grouping shuffles them once, runs the
    # UDF once, and expands each bucket's sorted id list to its i<j pairs
    # in-task. Identical pair set (ids sort exactly as the old id_a <
    # id_b filter ordered them; cross-band repeats still collapse in the
    # dropDuplicates). Scale: a degenerate hot bucket is one-task
    # quadratic under EITHER shape — a sort-merge join cannot split a
    # single key any more than the grouped expansion can (guide §2.5),
    # and collapse_exact above is the armor that keeps buckets small on
    # adversarial corpora; per-task memory is O(bucket), same as the
    # join's buffered key group.
    buckets = (
        ex.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
        .filter(F.size("_ids") >= 2)
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda a, i: F.transform(
                F.slice(
                    F.col("_ids"), i + 2, F.size(F.col("_ids")) - i - 1
                ),
                lambda b: F.struct(
                    a.alias("id_a"), b.alias("id_b")
                ),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_expr).alias("_p"))
        .select("_p.id_a", "_p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    pairs = (
        candidates.join(
            base.withColumnsRenamed({"_id": "id_a", "_hashes": "h_a"}), on="id_a"
        ).join(base.withColumnsRenamed({"_id": "id_b", "_hashes": "h_b"}), on="id_b")
    )
    inter = F.size(F.array_intersect("h_a", "h_b"))
    union = F.size("h_a") + F.size("h_b") - inter
    out = (
        pairs.withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if star_edges is not None:
        out = out.unionByName(star_edges)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_udf():
    """Arrow-vectorized SimHash from per-token int64 hashes: unpack bits,
    sum +-1 votes per bit, sign -> 64-bit fingerprint. numpy bit math, no
    per-element lambdas (same rationale as _minhash_band_udf)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as SF

    memoized = _MEMO.get("simhash_udf")
    if memoized is not None:
        return memoized

    @SF.pandas_udf("bigint")
    def simhash_of(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, hs in enumerate(hashes):
            h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                continue
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    _MEMO["simhash_udf"] = simhash_of
    return simhash_of


def md5_token_hash64(token: Column) -> Column:
    """64-bit token hash from the md5 hex prefix, as signed int64.

    Strictly slower than ``xxhash64`` (the scale default) but REPRODUCIBLE
    outside the engine — DuckDB/Python compute the identical value from
    ``md5(token)[:16]`` — which makes simhash built on it oracle-checkable
    end-to-end."""
    u = F.conv(F.substring(F.md5(token), 1, 16), 16, 10).cast("decimal(20,0)")
    half = F.expr("CAST('9223372036854775808' AS DECIMAL(20,0))")
    full = F.expr("CAST('18446744073709551616' AS DECIMAL(21,0))")
    return F.when(u >= half, u - full).otherwise(u).cast("long")


def simhash64_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash=F.xxhash64,
) -> DataFrame:
    """(id, simhash) frame: token hashing JVM-side, bit votes vectorized.
    NULL/blank documents (empty token lists) are dropped — they carry no
    signal and would otherwise all collide on fingerprint 0."""
    simhash_of = _simhash_udf()
    toks = _memo(("tokens", text_col), lambda: _tokens(F.col(text_col)))
    build_hashed = lambda: F.transform(F.col("_toks"), lambda t: token_hash(t))
    if token_hash is F.xxhash64:
        # memo only the default path: a caller-supplied hash callable is
        # a fresh object per call — memoizing on its identity would never
        # hit AND retain one deep Column tree per invocation forever
        hashed = _memo(("token_hashes", "xxhash64"), build_hashed)
    else:
        hashed = build_hashed()
    return (
        docs.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            "_id",
            simhash_of(hashed.alias("_h")).alias("_sh"),
        )
    )


def _hash64_bands(n_bands: int):
    """Band array expression over the ``_sh`` int64 column: n_bands
    near-equal contiguous bit ranges as (band, bits) structs — shared
    by the self-join (:func:`hash64_hamming_pairs`) and the
    incremental join (:func:`hash64_hamming_join`)."""

    def _mask(width: int) -> int:
        # two's-complement int64 literal (width 64 -> all-ones -> -1)
        m = (1 << width) - 1
        return m - (1 << 64) if m >= 1 << 63 else m

    # static band unroll (shift amounts must be python ints)
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.shiftrightunsigned(F.col("_sh"), b * 64 // n_bands)
                .bitwiseAND(
                    F.lit(
                        _mask((b + 1) * 64 // n_bands - b * 64 // n_bands)
                    ).cast("long")
                )
                .alias("bits"),
            )
            for b in range(n_bands)
        ]
    )


def _check_banding(max_hamming: int, n_bands: int | None, who: str) -> int:
    if max_hamming < 0:
        raise ValueError(
            f"{who}: max_hamming={max_hamming} must be >= 0"
        )
    if n_bands is None:
        n_bands = max_hamming + 1
    if not (max_hamming < n_bands <= 64):
        raise ValueError(
            f"{who}: n_bands={n_bands} must satisfy"
            " max_hamming < n_bands <= 64 (pigeonhole recall needs"
            " more bands than flips)"
        )
    return n_bands


def hash64_hamming_pairs(
    frame: DataFrame,
    id_col: str = "_id",
    hash_col: str = "_sh",
    max_hamming: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """All pairs with ``Hamming(hash64) <= max_hamming`` from an
    (id, int64-fingerprint) frame — the banding machinery behind
    :func:`dedup_near_simhash`, factored out (r13) so OTHER 64-bit
    locality hashes (perceptual image dHash/aHash,
    ``multimodal.dhash64``) share it.

    Pigeonhole banding: 64 bits split into ``n_bands`` near-equal
    contiguous bands (band b = bits ``[b*64//n, (b+1)*64//n)``); a
    pair within Hamming ``h < n_bands`` cannot differ in every band,
    so a band-equality self-join has GUARANTEED full recall — the
    all-pairs answer without O(n²).  ``n_bands`` defaults to
    ``max_hamming + 1`` (the minimum guaranteeing recall; more bands
    = fewer bits per band = more candidates).  Returns
    ``(id_a, id_b, hamming INT)`` with ``id_a < id_b``.

    The frame is persisted (MEMORY_AND_DISK, cache_registry-tracked):
    both sides of the self-join consume it at 16 bytes/doc — cheaper
    than re-running the fingerprint lineage twice."""
    n_bands = _check_banding(max_hamming, n_bands, "hash64_hamming_pairs")
    from pyspark import StorageLevel

    sh = cache_registry.track(
        frame.select(
            F.col(id_col).alias("_id"), F.col(hash_col).alias("_sh")
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    banded = sh.select(
        "_id", "_sh", F.explode(_hash64_bands(n_bands)).alias("_b")
    )
    left = banded.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), F.col("_b").alias("b")
    )
    right = banded.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), F.col("_b").alias("b")
    )
    pairs = (
        left.join(right, on="b")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")


def hash64_hamming_join(
    new: DataFrame,
    corpus: DataFrame,
    id_col: str = "_id",
    hash_col: str = "_sh",
    max_hamming: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """INCREMENTAL Hamming join: every (new, corpus) pair within
    ``max_hamming`` of a 64-bit fingerprint — the production arrival
    path for any hash64 surface (simhash text, perceptual image
    dHash/aHash), mirroring :func:`dedup_near_minhash_incremental`:
    a daily batch lands and is checked AGAINST the standing index,
    never re-pairing the corpus with itself.  Returns
    ``(new_id, corpus_id, hamming INT)``.

    Same pigeonhole banding as :func:`hash64_hamming_pairs` (recall
    is guaranteed, so the result equals brute-force filtering of the
    cross product), but the join is new x corpus only: shuffle volume
    is ``n_bands * (|new| + |corpus|)`` 16-byte rows, and the
    corpus-side fingerprint frame is exactly the artifact a standing
    index stores — at 100 TB the corpus side reads a precomputed
    (id, hash) parquet, never re-hashes payloads.  Identical ids on
    both sides are allowed (re-submitted items) and excluded from the
    output (a row is not its own near-dup)."""
    n_bands = _check_banding(max_hamming, n_bands, "hash64_hamming_join")
    from pyspark import StorageLevel

    def _prep(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(hash_col).alias("_sh"),
        ).select(
            f"{side}_id",
            F.col("_sh").alias(f"_sh_{side}"),
            F.explode(_hash64_bands(n_bands)).alias("_b"),
        )

    n = _prep(new, "new")
    c = _prep(corpus, "corpus")
    return (
        n.join(c, n["_b"] == c["_b"])
        .filter(F.col("new_id") != F.col("corpus_id"))
        .dropDuplicates(["new_id", "corpus_id"])
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("_sh_new").bitwiseXOR(F.col("_sh_corpus"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("new_id", "corpus_id", "hamming")
    )


def dedup_near_simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    token_hash=F.xxhash64,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding via :func:`hash64_hamming_pairs` (4 x 16-bit
    bands for the default max_hamming=3; any pair within Hamming <= 3
    agrees exactly on >= 1 band, so the band-equality join finds all
    such pairs without O(n²)).  Returns (id_a, id_b, hamming).
    """
    return hash64_hamming_pairs(
        simhash64_frame(docs, id_col, text_col, token_hash),
        id_col="_id",
        hash_col="_sh",
        max_hamming=max_hamming,
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification primitive / bounded-subset oracle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 4,
    max_id: int | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over character n-gram sets.

    Two physical strategies behind one result contract (strategy picked by
    whether the caller bounded the input):

    - bounded (``max_id`` set — the LSH-verification / oracle use): all
      pairs via a broadcast self-join; gram sets pre-hashed to int64 with
      xxhash64 so the per-pair ``array_intersect`` compares primitive longs
      instead of strings (set sizes are preserved — a size change needs a
      64-bit collision *within one doc's gram set*, ~2^-64).
    - unbounded (the 100 TB path): inverted index — explode distinct grams,
      self-join keyed on the gram, COUNT matches per id-pair (= exact
      intersection size), derive union from per-doc set sizes. No per-pair
      array materialization; map-side partial counting collapses each
      posting block before the pair shuffle. Pairs sharing zero grams are
      (correctly) absent. At real scale add a document-frequency cap on
      ultra-common grams to bound posting fan-out; it is not applied here
      because the operator doubles as an exactness oracle.

    Outputs exact integer set sizes (inter_size, union_size) and filters by
    the rational threshold via integer cross-multiplication
    (``inter*den >= union*num``) — no floating point anywhere, so results
    are bit-identical across engines (oracle-checkable).
    """
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu

    base = docs
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    # gram construction + per-pair set intersection are CPU-per-row heavy;
    # a narrow input otherwise runs them on the single scan partition
    base = spread_for_cpu(base)
    grams_col = _memo(
        ("char_ngrams", text_col, n), lambda: char_ngrams(F.col(text_col), n)
    )
    g = base.select(F.col(id_col).alias("_id"), grams_col.alias("_g"))

    if max_id is not None:
        hashed = g.select(
            "_id",
            _memo(
                "gram_hashes",
                lambda: F.transform(F.col("_g"), lambda x: F.xxhash64(x)),
            ).alias("_h"),
        )
        left = hashed.select(F.col("_id").alias("id_a"), F.col("_h").alias("h_a"))
        right = hashed.select(F.col("_id").alias("id_b"), F.col("_h").alias("h_b"))
        pairs = left.join(F.broadcast(right), F.col("id_a") < F.col("id_b"))
        inter = F.size(F.array_intersect("h_a", "h_b"))
        union = F.size("h_a") + F.size("h_b") - inter
        return pairs.select(
            "id_a",
            "id_b",
            inter.cast("int").alias("inter_size"),
            union.cast("int").alias("union_size"),
        ).filter(
            F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
        )

    sizes = g.select("_id", F.size("_g").alias("_n"))
    postings = g.select("_id", F.explode("_g").alias("gram"))
    inter = (
        postings.alias("a")
        .join(postings.alias("b"), on="gram")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("int").alias("inter_size"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"_id": "id_a", "_n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "_n": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            "inter_size",
            (F.col("n_a") + F.col("n_b") - F.col("inter_size"))
            .cast("int")
            .alias("union_size"),
        )
        .filter(
            F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
        )
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    known_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingest dedup: drop arriving documents whose normalized
    content fingerprint already exists in the historical index, and keep
    at most one representative per fingerprint WITHIN the batch (min id).

    Returns ``(kept, new_fingerprints)`` — append ``new_fingerprints``
    to the index table after the batch commits, and the next batch
    dedups against it: the pattern that keeps a forever-growing corpus
    exactly-deduped with per-batch cost proportional to the batch, not
    the corpus (one fingerprint projection + one anti-join against the
    bucketed/partitioned index + one batch-local groupBy).

    The index side should be stored bucketed on ``fingerprint`` (see
    tests/test_plan_shapes.py's bucketed-join pin) so the anti-join
    co-locates without shuffling the index at every batch.
    """
    # NULL text must fingerprint like empty text (one shared group), not
    # NULL: a NULL join key never matches in the anti-join, which would
    # keep one blank doc per batch and append a NULL index row each time
    fp = fingerprint(F.coalesce(F.col(text_col), F.lit(""))).alias(
        "fingerprint"
    )
    batch = new_docs.select(F.col(id_col), fp)
    batch_canonical = batch.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col)
    )
    fresh = batch_canonical.join(
        known_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
    )
    kept = new_docs.join(fresh.select(id_col), id_col, "left_semi")
    return kept, fresh.select("fingerprint")


def dedup_near_minhash_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Continuous-ingest near-dup check: pairs between the NEW batch and
    the EXISTING corpus only (never corpus x corpus — the batch analogue
    of ``dedup_against_corpus`` for NEAR duplicates). Returns
    ``(new_id, corpus_id, jaccard)``.

    Plan shape: both sides band as usual, but the candidate join is
    new-bands x corpus-bands (no self-join), so candidate volume is
    bounded by the BATCH's bucket hits. At scale the corpus side is the
    persisted banded index written at ingest (band/bucket as layout
    keys -> the join prunes to the batch's buckets); here it derives
    from the corpus frame directly, which is the index-build cost paid
    once. Per-batch cost therefore tracks the batch size, not the
    corpus.
    """
    from pyspark import StorageLevel

    bands_of = _minhash_band_udf(num_hashes, bands)
    hashes = _memo(
        ("shingle_hashes", text_col, shingle_k),
        lambda: shingle_hashes(token_shingles(F.col(text_col), shingle_k)),
    )
    nonblank = F.trim(F.coalesce(F.col(text_col), F.lit(""))) != ""

    def prep(df):
        return cache_registry.track(
            df.filter(nonblank)
            .select(F.col(id_col).alias("_id"), hashes.alias("_hashes"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    nb = prep(new_docs)
    cb = prep(corpus_docs)

    def banded(base, out_id):
        return base.select(
            F.col("_id").alias(out_id), bands_of("_hashes").alias("_bands")
        ).select(out_id, F.posexplode("_bands").alias("band", "bucket"))

    candidates = (
        banded(nb, "new_id")
        .join(banded(cb, "corpus_id"), on=["band", "bucket"])
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    pairs = candidates.join(
        nb.withColumnsRenamed({"_id": "new_id", "_hashes": "h_a"}), on="new_id"
    ).join(
        cb.withColumnsRenamed({"_id": "corpus_id", "_hashes": "h_b"}),
        on="corpus_id",
    )
    inter = F.size(F.array_intersect("h_a", "h_b"))
    union = F.size("h_a") + F.size("h_b") - inter
    return (
        pairs.withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Maximal cross-document duplicated token SPANS of length >= ``k``
    — ``(doc_a, doc_b, start_a, start_b, span_len)``, 1-based token
    positions, ``doc_a < doc_b``.

    The exact-substring dedup primitive (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", the ExactSubstr tool):
    where minhash/simhash flag whole near-dup DOCUMENTS, this finds the
    repeated PASSAGES (boilerplate, licenses, quoted chunks) inside
    otherwise-distinct documents — the spans an LLM pipeline cuts out
    rather than dropping the document.

    Spark-first shape (suffix arrays are a single-machine design; this
    is the equi-join equivalent):

    1. k-gram seed table: one (doc, pos, gram-hash) row per position —
       a JVM ``transform`` over ``sequence(1, L-k+1)``, no explode of
       text bytes (the 60-bit md5 gram hash is 8 bytes/row; the
       cross-engine hash idiom of sketches.py::md5_u60).
    2. cross-doc seed matches: self-equi-join on the hash with
       ``doc_a < doc_b`` — through RENAMED projections (never the raw
       frame twice: Spark's same-lineage equality resolves trivially
       true, see tpch_q2).  A gram occurring in f positions emits
       ~f^2/2 pairs, so ``max_gram_df`` drops grams above a document-
       frequency cap BEFORE the join (the df-cap precedent of the
       inverted-index Jaccard path; None = exact, the oracle config).
    3. diagonal chaining: matches of the same pair on the same diagonal
       ``pa - pb`` with consecutive ``pa`` are one span — the classic
       gaps-and-islands ``pa - row_number()`` grouping, windowed per
       (pair, diagonal) so no global sort; ``span_len = run + k - 1``.

    At 100 TB the seed join is the cost center and shuffles only
    (hash, doc, pos) rows; skewed grams are exactly what ``max_gram_df``
    bounds (a df-capped gram is boilerplate that a thousand documents
    share — its pairs belong to a contamination index, not a span
    table).
    """
    toks = _tokens(F.col(text_col))
    L = F.size(toks)
    # gram strings via token_grams' shifted-slice arrays_zip (vectorized;
    # the per-position slice-inside-transform formulation is interpreted
    # per element — measured 5x slower on the bench corpus, same finding
    # as token_grams' own history). posexplode recovers the position.
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu

    seeds = (
        spread_for_cpu(docs.filter(L >= k))
        .select(
            F.col(id_col).alias("doc"),
            F.posexplode(token_grams(F.col(text_col), k)).alias("p0", "g"),
        )
        .select(
            "doc",
            (F.col("p0") + 1).cast("bigint").alias("pos"),
            F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("g"),
        )
    )
    if max_gram_df is not None:
        capped = (
            seeds.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_gram_df)
            .select("g")
        )
        seeds = seeds.join(capped, "g")
    a = seeds.select(
        F.col("g").alias("ga"), F.col("doc").alias("da"), F.col("pos").alias("pa")
    )
    b = seeds.select(
        F.col("g").alias("gb"), F.col("doc").alias("db"), F.col("pos").alias("pb")
    )
    matches = a.join(
        b, (F.col("ga") == F.col("gb")) & (F.col("da") < F.col("db"))
    ).select("da", "db", "pa", "pb")
    from pyspark.sql import Window

    w = Window.partitionBy("da", "db", F.col("pa") - F.col("pb")).orderBy("pa")
    islands = matches.select(
        "da", "db", "pa", "pb",
        (F.col("pa") - F.col("pb")).alias("diag"),
        (F.col("pa") - F.row_number().over(w)).alias("isl"),
    )
    return (
        islands.groupBy("da", "db", "diag", "isl")
        .agg(
            F.min("pa").cast("bigint").alias("start_a"),
            F.min("pb").cast("bigint").alias("start_b"),
            (F.count(F.lit(1)) + (k - 1)).cast("bigint").alias("span_len"),
        )
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "start_a", "start_b", "span_len",
        )
    )


def exact_substring_cut(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """The exact-substring DEDUP DECISION (Lee et al. 2022 §4, the
    ExactSubstr tool's output side; r12 verdict #5): where
    :func:`duplicate_spans` reports the duplicated passages as PAIRS,
    this returns what the pipeline actually applies — per-document
    merged CUT intervals ``(doc_id, cut_start BIGINT, cut_end BIGINT)``
    (1-based token positions, inclusive) covering every k-token gram
    whose exact text occurs EARLIER in the corpus order
    ``(doc_id, pos)``.  Keep-first-occurrence semantics, corpus-wide
    AND within-document: of all occurrences of a duplicated k-gram,
    exactly the lexicographically-first ``(doc, pos)`` survives; every
    other occurrence contributes its ``[pos, pos + k - 1]`` token
    range, and overlapping/adjacent ranges merge into maximal
    intervals.  Removing the intervals from each document leaves a
    corpus where no cut token was part of a non-canonical duplicated
    k-gram (recall is exact — tested against brute force).

    Plan (NO pair join anywhere — unlike the span-pair surface, the
    cut decision is LINEAR): one scan -> the (doc, pos, gram-hash)
    seed projection (JVM shifted-slice grams, 60-bit md5 idiom shared
    with :func:`duplicate_spans` so the oracle reproduces hashes) ->
    ONE (gram) contraction to the min (doc, pos) struct (map-side
    partial min, so boilerplate grams in millions of documents are
    skew-safe — the heavy key reduces, never fans out) -> broadcast-
    or shuffle-join back (id+hash rows only) -> per-DOC interval
    merge: gaps-and-islands with a running-max-end window partitioned
    by doc — bounded by one document's token count, never corpus-wide.
    """
    if k < 1:
        raise ValueError(f"exact_substring_cut: k={k} must be >= 1")
    from pyspark.sql import Window

    from kafka_dead_letter_analyzer_spark.operators.io import (
        spread_for_cpu,
    )

    toks = _tokens(F.col(text_col))
    L = F.size(toks)
    seeds = (
        spread_for_cpu(docs.filter(L >= k))
        .select(
            F.col(id_col).alias("doc"),
            F.posexplode(token_grams(F.col(text_col), k)).alias(
                "p0", "g"
            ),
        )
        .select(
            "doc",
            (F.col("p0") + 1).cast("bigint").alias("pos"),
            F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("g"),
        )
    )
    first = seeds.groupBy("g").agg(
        F.min(F.struct("doc", "pos")).alias("_f")
    )
    marked = (
        seeds.join(first, "g")
        .filter(
            (F.col("doc") != F.col("_f.doc"))
            | (F.col("pos") != F.col("_f.pos"))
        )
        .select("doc", "pos")
    )
    w_prev = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = marked.select(
        "doc",
        "pos",
        # new island iff this range neither overlaps NOR touches the
        # running max end (adjacent cut ranges merge — one interval)
        F.when(
            F.col("pos")
            > F.coalesce(
                F.max(F.col("pos") + F.lit(k - 1)).over(w_prev),
                F.lit(-2).cast("bigint"),
            )
            + F.lit(1),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    ).select(
        "doc", "pos", F.sum("_new").over(w_run).alias("_isl")
    )
    return (
        flagged.groupBy("doc", "_isl")
        .agg(
            F.min("pos").cast("bigint").alias("cut_start"),
            (F.max("pos") + F.lit(k - 1)).cast("bigint").alias("cut_end"),
        )
        .select(
            F.col("doc").alias(id_col), "cut_start", "cut_end"
        )
    )


def apply_substring_cuts(
    docs: DataFrame,
    cuts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`exact_substring_cut` intervals — the final step of
    the ExactSubstr pipeline: remove the cut token ranges from each
    document and return ``(id_col, n_tokens BIGINT, cut_tokens
    BIGINT, kept_tokens BIGINT, cleaned_text STRING)``.  Documents
    with no cuts pass through whole; cleaning operates on the same
    NORMALIZED token stream the cut positions index (trim + lower +
    whitespace split — the `_tokens` contract), and ``cleaned_text``
    is the kept tokens re-joined with single spaces.  NULL/blank
    documents yield ``n_tokens = 0`` and an empty cleaned_text.

    Plan: the cuts table contracts to one array-of-ranges row per cut
    document (bounded: a doc's cut list is at most its token count),
    ONE left equi-join on the id, and a pure-JVM higher-order filter
    (position NOT inside any range) — no Python, no window, no second
    scan of the text."""
    ranges = cuts.groupBy(F.col(id_col).alias("_cid")).agg(
        F.collect_list(
            F.struct(
                F.col("cut_start").alias("s"),
                F.col("cut_end").alias("e"),
            )
        ).alias("_ranges")
    )
    toks = _tokens(F.col(text_col))
    joined = docs.join(
        ranges, docs[id_col] == ranges["_cid"], "left"
    ).withColumn(
        "_r",
        F.coalesce(
            F.col("_ranges"),
            F.array().cast("array<struct<s:bigint,e:bigint>>"),
        ),
    )
    zipped = F.arrays_zip(
        toks.alias("t"),
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
        .alias("p"),
    )
    # guard the empty doc: sequence(1, 0) would run BACKWARDS (Spark
    # defaults step to -1 when start > stop), so build the zip only
    # for non-empty token lists
    kept = F.when(
        F.size(toks) > 0,
        F.filter(
            zipped,
            lambda x: ~F.exists(
                F.col("_r"),
                lambda r: (x["p"] >= r["s"]) & (x["p"] <= r["e"]),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<t:string,p:int>>"))
    n_tok = F.size(toks).cast("bigint")
    kept_tok = F.size(kept).cast("bigint")
    return joined.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (n_tok - kept_tok).alias("cut_tokens"),
        kept_tok.alias("kept_tokens"),
        F.array_join(
            F.transform(kept, lambda x: x["t"]), " "
        ).alias("cleaned_text"),
    )


def setsim_join_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_k: int | None = None,
) -> DataFrame:
    """Exact Jaccard-threshold self-join over distinct token sets via
    PREFIX FILTERING (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07
    AllPairs; Xiao et al. WWW'08 PPJoin) —
    ``(doc_a, doc_b, inter_sz, union_sz, jaccard_ppm)`` for every pair
    with ``J(a,b) >= threshold_num/threshold_den``, ``doc_a < doc_b``.

    Where :func:`ngram_jaccard_pairs`' inverted index explodes EVERY
    token, prefix filtering explodes only each document's
    ``|s| - ceil(t*|s|) + 1`` RAREST tokens (global-frequency order):
    two sets meeting threshold t must share at least one token in
    either's prefix — a completeness theorem, not a heuristic — so the
    candidate join touches a small, rare slice of the index.  Frequent
    tokens (exactly the ones whose posting lists explode the full
    inverted index at 100 TB) land at the END of the order and mostly
    fall OUT of every prefix: the skew self-defends instead of needing
    a df-cap recall trade.

    Pipeline (all equi-joins, no cartesian): global token df agg ->
    per-doc (df, token)-rank window -> prefix rows (persisted once,
    read by both join branches) -> candidate pairs on shared prefix
    token (renamed projections; size-compatibility filter
    ``t <= |a|/|b| <= 1/t`` and a weak per-row positional filter prune
    in the join, then the ACCUMULATED PPJoin overlap bound prunes
    per-pair inside the same exchange the pair-dedup already pays) ->
    verify by joining back each candidate's full token ARRAY (arrays
    move only for candidates) and computing the exact intersection
    JVM-side.

    Integer-exact surface: threshold test is
    ``den*inter >= num*union``; ``jaccard_ppm = (1e6 * inter) DIV
    union``.  The oracle verifies against from-scratch ALL-pairs
    Jaccard in SQL — the result contract is strategy-independent
    (queries.py x_setsim_join).
    """
    num, den = threshold_num, threshold_den
    if not (0 < num <= den):
        raise ValueError(f"setsim_join_prefix: bad threshold {num}/{den}")
    from pyspark.sql import Window

    # Set elements: raw tokens, or k-token SHINGLES (shingle_k) — the
    # discriminative choice for corpora with small vocabularies, where
    # unigram sets make "90% similar" nearly vacuous (measured on the
    # bench corpus: J>=0.9 holds for 7.7% of ALL doc pairs on unigrams
    # vs exactly the near-dup groups on 3-shingles — a ~4000x smaller,
    # meaningful answer).
    elems = (
        F.array_distinct(_tokens(F.col(text_col)))
        if shingle_k is None
        else token_shingles(F.col(text_col), shingle_k)
    )
    # no spread_for_cpu: the sf0.1 A/B (round 6, both reps) measured the
    # round-robin spread 21% SLOWER here — shingle construction is cheap
    # enough that the extra exchange never pays; real scans are already
    # wide, so local was the only place it could matter
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.array_sort(elems).alias("set"),
    ).filter(F.size("set") > 0)
    # persisted: the shingle-construction subtree feeds the token
    # explode, the df agg, AND both verification sides — without the
    # persist Catalyst re-expands it per consumer (3 extra corpus-wide
    # shingle passes measured; same pattern as the minhash signature
    # base). Registered for deferred release (cache_registry).
    base = base.persist()
    cache_registry.track(base)
    tok = base.select(
        "doc", F.size("set").alias("sz"), F.explode("set").alias("tk")
    )
    df_tbl = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    ranked = tok.join(df_tbl, "tk").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc").orderBy("df", "tk")
        ),
    )
    # prefix length: |s| - ceil(t*|s|) + 1, ceil via (a + b - 1) DIV b
    prefix_len = F.col("sz") - F.expr(
        f"(({num} * sz) + {den} - 1) DIV {den}"
    ) + 1
    # The prefix index feeds BOTH candidate-join branches; without the
    # persist Catalyst re-expands the whole explode -> df-agg -> window
    # subtree per branch (2 shingle passes + 2 df shuffles + 2 windows
    # in the r13 plan).  Persisted + registry-tracked, the subtree runs
    # once and both branches read InMemoryTableScans (r14 probe:
    # interleaved A/B median 0.86 at t=1/2, 0.89 at 7/10).
    prefix = (
        ranked.filter(F.col("rn") <= prefix_len)
        .select("tk", "doc", "sz", "rn")
        .persist()
    )
    cache_registry.track(prefix)
    pa = prefix.select(
        F.col("tk").alias("tka"), F.col("doc").alias("da"),
        F.col("sz").alias("sza"), F.col("rn").alias("rna"),
    )
    pb = prefix.select(
        F.col("tk").alias("tkb"), F.col("doc").alias("db"),
        F.col("sz").alias("szb"), F.col("rn").alias("rnb"),
    )
    # PPJoin POSITIONAL pruning (Xiao et al. WWW'08), r14 ACCUMULATED
    # form — exact, completeness preserved.  Let a pair's candidate
    # rows be its shared prefix tokens t_1 < ... < t_c in global
    # (df, tk) order, at strictly increasing ranks (rna_i, rnb_i).
    # Every shared token ordered BEFORE t_c has both ranks below
    # (rna_c, rnb_c) <= the prefix lengths, so it is itself one of
    # t_1..t_{c-1}; every shared token AFTER t_c sits at ranks
    # > rna_c in a and > rnb_c in b.  Hence
    #
    #     inter <= c + min(sza - rna_c, szb - rnb_c)          (ACC)
    #
    # while J >= num/den needs inter >= ceil(num*(sza+szb)/(num+den));
    # integer form (num+den)*(c + min(...)) >= num*(sza+szb) avoids
    # the ceil.  (ACC) strictly dominates the r13 per-row c=1 bound:
    # i + min(sza-rna_i, szb-rnb_i) is monotone non-increasing in i
    # (both ranks step by >= 1 per row), so the last-row accumulated
    # check is the tightest of the whole running-check family — the
    # relational equivalent of sequential PPJoin's prune-on-first-
    # failure.  Implemented as the same single exchange the old
    # distinct paid: groupBy (da, db, sza, szb) with map-side partial
    # (count, max rank) aggregation, then the (ACC) filter.
    #
    # The join-level WEAK row filter below drops rows that cannot
    # belong to any qualifying pair WITHOUT disturbing (ACC)'s count:
    # row i of a qualifying pair always has i <= min(rna_i, rnb_i),
    # so min(rna,rnb) + min(sza-rna, szb-rnb) >= alpha holds for every
    # row of every qualifying pair — dropped rows only ever belong to
    # non-qualifying pairs, which (ACC) may then prune or pass (both
    # safe: false positives die in the verify join).
    # Measured sf0.1 (r14 probe): verify pairs 124,979 -> 119,908 at
    # t=1/2 and 33,389 -> 32,534 at 7/10 vs the r13 per-row filter;
    # timing flat locally (the candidate set is the quadratic term at
    # scale, the filter is join-local, zero new shuffles).
    weak_positional = (
        F.lit(num + den)
        * (
            F.least(F.col("rna"), F.col("rnb"))
            + F.least(
                F.col("sza") - F.col("rna"), F.col("szb") - F.col("rnb")
            )
        )
        >= F.lit(num) * (F.col("sza") + F.col("szb"))
    )
    cands = (
        pa.join(
            pb,
            (F.col("tka") == F.col("tkb"))
            & (F.col("da") < F.col("db"))
            & (F.lit(num) * F.col("sza") <= F.lit(den) * F.col("szb"))
            & (F.lit(num) * F.col("szb") <= F.lit(den) * F.col("sza"))
            & weak_positional,
        )
        .groupBy("da", "db", "sza", "szb")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.max("rna").alias("_rna_m"),
            F.max("rnb").alias("_rnb_m"),
        )
        .filter(
            F.lit(num + den)
            * (
                F.col("_c")
                + F.least(
                    F.col("sza") - F.col("_rna_m"),
                    F.col("szb") - F.col("_rnb_m"),
                )
            )
            >= F.lit(num) * (F.col("sza") + F.col("szb"))
        )
        .select("da", "db")
    )
    sa = base.select(F.col("doc").alias("da"), F.col("set").alias("set_a"))
    sb = base.select(F.col("doc").alias("db"), F.col("set").alias("set_b"))
    verified = (
        cands.join(sa, "da")
        .join(sb, "db")
        .select(
            "da", "db",
            F.size(F.array_intersect("set_a", "set_b")).alias("i"),
            (F.size("set_a") + F.size("set_b")).alias("s"),
        )
        .select(
            "da", "db", "i", (F.col("s") - F.col("i")).alias("u")
        )
        .filter(F.lit(den) * F.col("i") >= F.lit(num) * F.col("u"))
    )
    return verified.select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.col("i").cast("bigint").alias("inter_sz"),
        F.col("u").cast("bigint").alias("union_sz"),
        F.expr("(1000000 * i) DIV u").cast("bigint").alias("jaccard_ppm"),
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 24,
    window: int = 2,
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo SIGMOD'95
    merge/purge): sort the corpus by a BLOCKING KEY (normalized text
    prefix), compare only records whose keys are within ``window``
    DISTINCT key values of each other, verify candidates by exact
    k-shingle Jaccard — ``(doc_a, doc_b, key_dist, inter_sz, union_sz,
    jaccard_ppm)`` for pairs meeting the threshold.

    The complementary blocking geometry to hash/LSH/prefix schemes:
    those catch near-dups that SHARE something (a bucket, a rare
    token); the sorted window catches near-dups that are lexically
    ADJACENT (common-prefix families, serial-numbered variants) at cost
    O(n * window) candidates, independent of any frequency skew.

    Distributed shape (no global row_number over the data): the
    blocking keys CONTRACT to distinct values (groupBy — at most
    |distinct prefixes| rows), a dense rank orders that contraction
    (single-task window over the contraction, the skyline_2d bound
    argument), and the neighborhood join is an equi-join on
    ``rank DIV (window+1)`` band buckets of the ranked key table —
    adjacent bands joined, exact distance filtered — so candidates
    never materialize beyond the 2-band fan-out.  Verification joins
    each candidate's shingle array (arrays move only for candidates,
    the setsim pattern).
    """
    from pyspark.sql import Window

    num, den = threshold_num, threshold_den
    key = F.substring(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), 1, prefix_chars
    )
    # no spread_for_cpu: sf0.1 A/B (round 6) measured it 33% slower with
    # the spread — the sort-key projection is codegen-cheap
    base = docs.select(
        F.col(id_col).alias("doc"),
        key.alias("bk"),
        F.array_sort(token_shingles(F.col(text_col), shingle_k)).alias("set"),
    ).filter(F.size("set") > 0)
    base = base.persist()
    cache_registry.track(base)
    keys = base.select("bk").distinct()
    # dense rank WITHOUT a single-task global sort: bucket the distinct
    # keys by their 2-char prefix (a bucket boundary can never split
    # equal keys, and lexicographic order = (prefix, rest) order, so
    # per-bucket dense ranks + cumulative bucket offsets compose to the
    # exact global dense rank).  The offsets collect is <= |distinct
    # 2-char prefixes| rows — the bounded-driver-action class
    # (global_order_index precedent).
    bucketed = keys.withColumn("_bx", F.substring("bk", 1, 2))
    counts = sorted(
        (r["_bx"], r["c"])
        for r in bucketed.groupBy("_bx").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = {}, 0
    for bx, c in counts:
        offsets[bx] = acc
        acc += c
    from kafka_dead_letter_analyzer_spark.operators.io import (
        local_relation_df,
    )

    off_df = F.broadcast(
        local_relation_df(
            keys.sparkSession,
            [(bx, int(off)) for bx, off in offsets.items()],
            "_bx string, _off long",
        )
    )
    ranked = (
        bucketed.withColumn(
            "_lr",
            F.dense_rank().over(Window.partitionBy("_bx").orderBy("bk")),
        )
        .join(off_df, "_bx")
        .select("bk", (F.col("_off") + F.col("_lr")).cast("bigint").alias("rk"))
    )
    band = window + 1
    ra = ranked.select(
        F.col("bk").alias("bka"), F.col("rk").alias("rka")
    ).select(
        "bka", "rka",
        F.explode(
            F.array(F.expr(f"rka DIV {band}"), F.expr(f"rka DIV {band} + 1"))
        ).alias("bd"),
    )
    rb = ranked.select(
        F.col("bk").alias("bkb"), F.col("rk").alias("rkb")
    ).select("bkb", "rkb", F.expr(f"rkb DIV {band}").alias("bd"))
    near_keys = (
        ra.join(rb, "bd")
        .filter(
            (F.col("rkb") >= F.col("rka"))
            & (F.col("rkb") - F.col("rka") <= window)
        )
        .select("bka", "bkb", (F.col("rkb") - F.col("rka")).alias("key_dist"))
        .distinct()
    )
    a = base.select(
        F.col("bk").alias("bka"), F.col("doc").alias("da"), F.col("set").alias("set_a")
    )
    b = base.select(
        F.col("bk").alias("bkb"), F.col("doc").alias("db"), F.col("set").alias("set_b")
    )
    pairs = (
        a.join(F.broadcast(near_keys), "bka")
        .join(b, "bkb")
        .filter(F.col("da") < F.col("db"))
        .select(
            "da", "db", "key_dist",
            F.size(F.array_intersect("set_a", "set_b")).alias("i"),
            (F.size("set_a") + F.size("set_b")).alias("s"),
        )
        .select("da", "db", "key_dist", "i", (F.col("s") - F.col("i")).alias("u"))
        .filter(F.lit(den) * F.col("i") >= F.lit(num) * F.col("u"))
    )
    return pairs.select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.col("key_dist").cast("bigint").alias("key_dist"),
        F.col("i").cast("bigint").alias("inter_sz"),
        F.col("u").cast("bigint").alias("union_sz"),
        F.expr("(1000000 * i) DIV u").cast("bigint").alias("jaccard_ppm"),
    )


def containment_join_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_k: int | None = None,
    max_df_permille: int | None = None,
) -> DataFrame:
    """Exact CONTAINMENT-threshold self-join over distinct token sets —
    ``(doc_a, doc_b, inter_sz, a_sz, containment_ppm)`` for every
    ORDERED pair ``a != b`` with ``|A ∩ B| / |A| >= num/den`` — the
    quote/subset-detection geometry Jaccard cannot express (a short
    document fully quoted inside a long one has high containment but
    arbitrarily low Jaccard, so :func:`setsim_join_prefix` never
    surfaces it).  This is the asymmetric cousin of the prefix-filtered
    set-similarity join (Chaudhuri et al. ICDE'06 probe semantics;
    Melnik & Garcia-Molina's set-containment joins are the classical
    framing); the reference app has no text-similarity surface at all
    (its unit is one Kafka record — SURVEY.md §2), so this extends the
    LLM-pipeline family, citing only published structure.

    Prefix theorem (asymmetric form): if ``|A ∩ B| >= ceil(t·|A|)``
    then B intersects the ``|A| - ceil(t·|A|) + 1`` globally RAREST
    tokens of A — so only A-side prefixes explode into the candidate
    join, while the B side indexes every token ONCE.  The B index has
    no prefix (containment puts no upper bound on ``|B|``), but each
    candidate join key is an A-PREFIX token, i.e. drawn from the rare
    end of the df order.  Size pruning keeps only ``den·|B| >=
    num·|A|`` candidates.  Verification joins back the full sorted
    token arrays (arrays move only for candidates) and tests
    ``den·inter >= num·|A|`` in exact integers; ``containment_ppm =
    (1e6 · inter) DIV |A|``.

    ``max_df_permille`` bounds the candidate fan-out, which the prefix
    theorem alone does NOT: a short document's prefix is ~``(1-t)·|A|``
    of its whole set and can carry mid-frequency tokens into the
    candidate join, where per-token fan-out is ``df_prefix(tk) ·
    df_all(tk)`` against the full B index.  When set, shingles present
    in more than ``max_df_permille``/1000 of the (non-empty) documents
    are treated as boilerplate and dropped from the token UNIVERSE
    before anything else — the containment semantics are then defined
    over the filtered sets (sizes, prefixes, intersections, AND the
    reported ``a_sz`` all use the filtered universe), so the prefix
    algorithm remains exact for that contract and an oracle can state
    the same filter declaratively.  With the filter, every join key has
    ``df <= permille·n/1000``, so per-token fan-out is hard-capped at
    ``(permille·n/1000)²`` and total candidate volume at ``n_tokens ·
    permille·n/1000`` — linear in corpus size for fixed permille.
    Recall consequence: a pair whose overlap is PURE boilerplate (every
    shared shingle in > permille/1000 of docs) is not reported; that is
    the intended reading of "quote detection" at corpus scale
    (boilerplate headers/footers are precisely the shared text that is
    not a quote).  The corpus-relative form (permille, not an absolute
    df) keeps the cutoff meaningful at any SF: 0.4% of 5e2 docs and
    0.4% of 5e9 docs both mean "boilerplate".
    """
    num, den = threshold_num, threshold_den
    if not (0 < num <= den):
        raise ValueError(f"containment_join_prefix: bad threshold {num}/{den}")

    elems = (
        F.array_distinct(_tokens(F.col(text_col)))
        if shingle_k is None
        else token_shingles(F.col(text_col), shingle_k)
    )
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.array_sort(elems).alias("set"),
    ).filter(F.size("set") > 0)
    # the set-construction subtree feeds the token explode twice (df agg
    # + universe join); persist it once.
    base = base.persist()
    cache_registry.track(base)
    tok_raw = base.select("doc", F.explode("set").alias("tk"))
    df_tbl = tok_raw.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    if max_df_permille is not None:
        # corpus-relative boilerplate cutoff: df * 1000 <= permille * n,
        # with n = count of non-empty docs as a broadcast 1-row agg (no
        # separate driver job, no collected scalar).
        ndocs = base.agg(F.count(F.lit(1)).alias("n_docs"))
        df_tbl = (
            df_tbl.crossJoin(F.broadcast(ndocs))
            .filter(
                F.lit(1000) * F.col("df")
                <= F.lit(int(max_df_permille)) * F.col("n_docs")
            )
            .select("tk", "df")
        )
    # tokens restricted to the (possibly filtered) universe, tagged with
    # their global df — ONE groupBy by doc yields the df-sorted token
    # list, from which prefix, filtered size, and the verification set
    # all project without further shuffles.
    tok = tok_raw.join(df_tbl, "tk")
    agg = tok.groupBy("doc").agg(
        F.array_sort(F.collect_list(F.struct("df", "tk"))).alias("toks")
    )
    agg = agg.persist()
    cache_registry.track(agg)
    sz = F.size("toks")
    # A-side prefix length: |A| - ceil(t*|A|) + 1, ceil via add-and-div
    prefix_len = sz - F.expr(
        f"(({num} * size(toks)) + {den} - 1) DIV {den}"
    ) + 1
    pa = agg.select(
        F.col("doc").alias("da"),
        sz.alias("sza"),
        F.posexplode(F.slice(F.col("toks"), F.lit(1), prefix_len)).alias(
            "p0", "p"
        ),
    ).select(
        "da", "sza", (F.col("p0") + 1).alias("rna"), F.col("p.tk").alias("tka")
    )
    # B side: the FULL (filtered-universe) token index — one row per
    # (doc, token), linear, never self-joined on the frequent end
    pb = agg.select(
        F.col("doc").alias("db"),
        sz.alias("szb"),
        F.posexplode("toks").alias("p0", "p"),
    ).select(
        "db", "szb", (F.col("p0") + 1).alias("rnb"), F.col("p.tk").alias("tkb")
    )
    # PPJoin positional filter, containment form (exact): a match at
    # ranks (rna, rnb) of the (df, tk)-sorted filtered-universe lists
    # caps the overlap at 1 + min(sza-rna, szb-rnb), while
    # C(A,B) >= num/den needs inter >= ceil(num*sza/den); the pair's
    # FIRST shared token yields a surviving row (it sits within A's
    # prefix because rna* <= sza - inter + 1, and B's side is the full
    # index), so dropping rows below the bound loses nothing.
    positional = (
        F.lit(den)
        * (
            F.lit(1)
            + F.least(
                F.col("sza") - F.col("rna"), F.col("szb") - F.col("rnb")
            )
        )
        >= F.lit(num) * F.col("sza")
    )
    cands = (
        pa.join(
            pb,
            (F.col("tka") == F.col("tkb"))
            & (F.col("da") != F.col("db"))
            # |B| >= ceil(t|A|)  <=>  den*|B| >= num*|A| is necessary
            # (ceil only strengthens); integer form avoids the ceil
            & (F.lit(den) * F.col("szb") >= F.lit(num) * F.col("sza"))
            & positional,
        )
        .select("da", "db")
        .distinct()
    )
    # verification over the FILTERED-universe sets (projected out of the
    # same persisted df-sorted token lists — no extra shuffle): |A| and
    # the intersection must agree with the universe the prefix was
    # computed on, or the threshold test would be against a different
    # denominator than the completeness proof covers.
    sets_f = agg.select(
        "doc",
        F.array_sort(F.transform("toks", lambda s: s.getField("tk"))).alias(
            "set"
        ),
    )
    sa = sets_f.select(F.col("doc").alias("da"), F.col("set").alias("set_a"))
    sb = sets_f.select(F.col("doc").alias("db"), F.col("set").alias("set_b"))
    verified = (
        cands.join(sa, "da")
        .join(sb, "db")
        .select(
            "da", "db",
            F.size(F.array_intersect("set_a", "set_b")).alias("i"),
            F.size("set_a").alias("asz"),
        )
        .filter(F.lit(den) * F.col("i") >= F.lit(num) * F.col("asz"))
    )
    return verified.select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.col("i").cast("bigint").alias("inter_sz"),
        F.col("asz").cast("bigint").alias("a_sz"),
        F.expr("(1000000 * i) DIV asz").cast("bigint").alias("containment_ppm"),
    )
