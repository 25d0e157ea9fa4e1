"""Probe bodies for probe_r14.py — each fn(spark, sf_dir, reps).

Round-14 measurement probes (guide §1: measure first, noop sink,
interleaved A/B).  Each probe asserts result-set equality between the
status-quo operator and every candidate variant BEFORE timing."""

from pyspark.sql import functions as F

from probe_r13 import run_ab


def setsim_accum(spark, sf_dir, reps):
    """VERDICT r13 next-#1: the PPJoin ACCUMULATED overlap bound on top
    of (or instead of) the per-row positional filter.

    Math (exact, completeness preserved): let the candidate rows of a
    pair (a, b) be the shared prefix tokens in global (df, tk) order,
    t_1 < ... < t_c, with ranks (rna_i, rnb_i) strictly increasing.
    Every shared token ordered before t_c has ranks below (rna_c,
    rnb_c) <= prefix lengths, so it IS one of t_1..t_{c-1}; every
    shared token after t_c occupies ranks > rna_c in a and > rnb_c in
    b.  Hence

        inter <= c + min(sza - rna_c, szb - rnb_c)        (ACC)

    and a pair failing (num+den)*(c + min(..)) >= num*(sza+szb) can
    never qualify.  The per-row positional filter is the c=1 instance
    evaluated at each row; since i + min(sza-rna_i, szb-rnb_i) is
    monotone non-increasing in i, (ACC) at the LAST row is the
    tightest of the whole running-check family — i.e. relational
    PPJoin accumulation == one groupBy with (count, max rank) + one
    filter.  CAVEAT measured here: applying the old per-row filter
    FIRST makes (ACC) vacuous (the max surviving row already passes
    the c=1 bound, so c >= 1 makes the accumulated check pass), so the
    row filter must be dropped (B1) or weakened to the
    min(rna,rnb)-slack form (B2: a row of a QUALIFYING pair always has
    i <= min(rna_i, rnb_i), so min(rna,rnb) + min(sza-rna, szb-rnb) >=
    alpha holds for every row of every qualifying pair — safe to drop
    rows failing it before the aggregation)."""
    from pyspark.sql import Window

    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import token_shingles

    def build(docs, num, den, shingle_k, variant, count_only=False,
              persist_prefix=False):
        elems = token_shingles(F.col("text"), shingle_k)
        base = docs.select(
            F.col("doc_id").alias("doc"),
            F.array_sort(elems).alias("set"),
        ).filter(F.size("set") > 0)
        base = base.persist()
        cache_registry.track(base)
        tok = base.select(
            "doc", F.size("set").alias("sz"), F.explode("set").alias("tk")
        )
        df_tbl = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
        ranked = tok.join(df_tbl, "tk").withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc").orderBy("df", "tk")),
        )
        prefix_len = F.col("sz") - F.expr(
            f"(({num} * sz) + {den} - 1) DIV {den}"
        ) + 1
        prefix = ranked.filter(F.col("rn") <= prefix_len).select(
            "tk", "doc", "sz", "rn"
        )
        if persist_prefix:
            prefix = prefix.persist()
            cache_registry.track(prefix)
        pa = prefix.select(
            F.col("tk").alias("tka"), F.col("doc").alias("da"),
            F.col("sz").alias("sza"), F.col("rn").alias("rna"),
        )
        pb = prefix.select(
            F.col("tk").alias("tkb"), F.col("doc").alias("db"),
            F.col("sz").alias("szb"), F.col("rn").alias("rnb"),
        )
        cond = (
            (F.col("tka") == F.col("tkb"))
            & (F.col("da") < F.col("db"))
            & (F.lit(num) * F.col("sza") <= F.lit(den) * F.col("szb"))
            & (F.lit(num) * F.col("szb") <= F.lit(den) * F.col("sza"))
        )
        row_positional = (
            F.lit(num + den)
            * (
                F.lit(1)
                + F.least(
                    F.col("sza") - F.col("rna"),
                    F.col("szb") - F.col("rnb"),
                )
            )
            >= F.lit(num) * (F.col("sza") + F.col("szb"))
        )
        weak_positional = (
            F.lit(num + den)
            * (
                F.least(F.col("rna"), F.col("rnb"))
                + F.least(
                    F.col("sza") - F.col("rna"),
                    F.col("szb") - F.col("rnb"),
                )
            )
            >= F.lit(num) * (F.col("sza") + F.col("szb"))
        )
        if variant == "A":          # status quo: per-row filter + distinct
            raw = pa.join(pb, cond & row_positional).select("da", "db")
            cands = raw.distinct()
        else:                       # accumulated: groupBy + (ACC) filter
            if variant == "B2":
                cond = cond & weak_positional
            raw = pa.join(pb, cond).select("da", "db", "sza", "szb",
                                           "rna", "rnb")
            cands = (
                raw.groupBy("da", "db", "sza", "szb")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.max("rna").alias("rna_m"),
                    F.max("rnb").alias("rnb_m"),
                )
                .filter(
                    F.lit(num + den)
                    * (
                        F.col("c")
                        + F.least(
                            F.col("sza") - F.col("rna_m"),
                            F.col("szb") - F.col("rnb_m"),
                        )
                    )
                    >= F.lit(num) * (F.col("sza") + F.col("szb"))
                )
                .select("da", "db")
            )
        if count_only:
            return cands
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
            .select("da", "db", "i", (F.col("s") - F.col("i")).alias("u"))
            .filter(F.lit(den) * F.col("i") >= F.lit(num) * F.col("u"))
        )
        return verified.select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("i").cast("bigint").alias("inter_sz"),
            F.col("u").cast("bigint").alias("union_sz"),
            F.expr("(1000000 * i) DIV u").cast("bigint").alias("jaccard_ppm"),
        )

    docs = Q.load_table(spark, sf_dir, "documents")

    for num, den in ((1, 2), (7, 10)):
        # candidate pairs INTO VERIFY per variant (the quadratic term)
        n_a = build(docs, num, den, 3, "A", count_only=True).count()
        n_b1 = build(docs, num, den, 3, "B1", count_only=True).count()
        n_b2 = build(docs, num, den, 3, "B2", count_only=True).count()
        cache_registry.release_all()
        spark.catalog.clearCache()
        print(f"t={num}/{den}: verify pairs A={n_a} B1={n_b1} B2={n_b2}")
        cur = {
            tuple(r)
            for r in D.setsim_join_prefix(
                docs, threshold_num=num, threshold_den=den, shingle_k=3
            ).collect()
        }
        for v in ("B1", "B2"):
            new = {tuple(r) for r in build(docs, num, den, 3, v).collect()}
            assert cur == new, f"variant {v} result mismatch"
        cache_registry.release_all()
        spark.catalog.clearCache()
        print(f"t={num}/{den}: result sets equal ({len(cur)} rows)")

        run_ab(
            spark,
            [
                (
                    f"setsim t={num}/{den} A status-quo",
                    lambda num=num, den=den: build(docs, num, den, 3, "A"),
                ),
                (
                    f"setsim t={num}/{den} B2 accum",
                    lambda num=num, den=den: build(docs, num, den, 3, "B2"),
                ),
                (
                    f"setsim t={num}/{den} B2+persist-prefix",
                    lambda num=num, den=den: build(
                        docs, num, den, 3, "B2", persist_prefix=True
                    ),
                ),
            ],
            reps,
        )


def exact_substring_dupjoin(spark, sf_dir, reps):
    """VERDICT r13 next-#4: exact_substring_cut's join-back carries the
    FULL gram table on the build side; only grams with count >= 2 can
    survive the post-join filter (a unique gram's single row IS its min
    struct).  Shrinking the build side to duplicated grams is an exact
    rewrite and lets AQE flip the SMJ to a broadcast join when the dup
    set is small — scale-adaptive, no collected scalar."""
    from kafka_dead_letter_analyzer_spark import queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        _tokens,
        token_grams,
    )
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu
    from pyspark.sql import Window

    k = 8

    def cut_variant(docs, dup_only):
        toks = _tokens(F.col("text"))
        L = F.size(toks)
        seeds = (
            spread_for_cpu(docs.filter(L >= k))
            .select(
                F.col("doc_id").alias("doc"),
                F.posexplode(token_grams(F.col("text"), k)).alias("p0", "g"),
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
            F.min(F.struct("doc", "pos")).alias("_f"),
            F.count(F.lit(1)).alias("_n"),
        )
        if dup_only:
            first = first.filter(F.col("_n") >= 2)
        first = first.select("g", "_f")
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
        ).select("doc", "pos", F.sum("_new").over(w_run).alias("_isl"))
        return (
            flagged.groupBy("doc", "_isl")
            .agg(
                F.min("pos").cast("bigint").alias("cut_start"),
                (F.max("pos") + F.lit(k - 1)).cast("bigint").alias("cut_end"),
            )
            .select(F.col("doc").alias("doc_id"), "cut_start", "cut_end")
        )

    docs = Q.load_table(spark, sf_dir, "documents")

    # gram population: how selective is the count>=2 cut?
    toks = _tokens(F.col("text"))
    seeds_g = (
        docs.filter(F.size(toks) >= k)
        .select(F.explode(token_grams(F.col("text"), k)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = seeds_g.count()
    dups = seeds_g.filter(F.col("n") >= 2).count()
    print(f"grams: {tot} distinct, {dups} duplicated ({100.0*dups/tot:.2f}%)")

    cur = {tuple(r) for r in D.exact_substring_cut(docs, k=k).collect()}
    new = {tuple(r) for r in cut_variant(docs, True).collect()}
    assert cur == new, "dup-only join-back changed the cut set"
    print(f"cut sets equal ({len(cur)} intervals)")

    run_ab(
        spark,
        [
            ("exact_substring A status-quo", lambda: D.exact_substring_cut(docs, k=k)),
            ("exact_substring B dup-only build side", lambda: cut_variant(docs, True)),
        ],
        reps,
    )


def bigram_decomp(spark, sf_dir, reps):
    """x_bigram_memorization decomposition: which stage dominates —
    bigram construction (JVM transform+concat), the (doc,bg) explode,
    the bg window, or the final groupBy?"""
    from kafka_dead_letter_analyzer_spark import queries as Q
    from kafka_dead_letter_analyzer_spark.operators.dedup import _tokens
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu
    from pyspark.sql import Window

    docs0 = Q.load_table(spark, sf_dir, "documents")

    def stages(upto):
        docs = spread_for_cpu(docs0)
        toks = _tokens(F.col("text"))
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        arr = docs.select(F.col("doc_id"), F.array_distinct(bigrams).alias("ba"))
        if upto == "arrays":
            return arr
        db = arr.select("doc_id", F.explode("ba").alias("bg"))
        if upto == "explode":
            return db
        w = Window.partitionBy("bg")
        dfed = db.withColumn("df", F.count(F.lit(1)).over(w))
        if upto == "window":
            return dfed
        return dfed.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) "
                "* 1000000 DIV count(*) AS BIGINT)"
            ).alias("shared_ppm"),
        )

    run_ab(
        spark,
        [
            ("bigram 1 arrays only", lambda: stages("arrays")),
            ("bigram 2 + explode", lambda: stages("explode")),
            ("bigram 3 + window", lambda: stages("window")),
            ("bigram 4 full", lambda: stages("full")),
        ],
        reps,
    )


def pagerank_dist(spark, sf_dir, reps):
    """Distributed (>bound / 100 TB shape) pagerank: r13 unrolled loop
    (re-derives e/outdeg/nodes per iteration per branch) vs r14
    persisted invariants + per-iteration lazy localCheckpoint."""
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators import graph as GR
    from kafka_dead_letter_analyzer_spark.operators import text as TX
    from kafka_dead_letter_analyzer_spark.queries import load_table

    def edges_df():
        pc = TX.cooccurrence_counts(
            load_table(spark, sf_dir, "documents"), text_col="text", window=2
        )
        return pc.filter(
            (F.col("n") >= 2) & (F.col("center") != F.col("context"))
        ).select(F.col("center").alias("id_a"), F.col("context").alias("id_b"))

    def old_distributed():
        """The r13 distributed body, verbatim (no persist, no ckpt)."""
        iters, scale, damping_num, damping_den = 3, 1_000_000, 85, 100
        e = edges_df().select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        nodes = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .distinct()
        )
        outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
        base = (scale * (damping_den - damping_num)) // damping_den
        ranks = nodes.select(
            "node", F.lit(scale).cast("bigint").alias("rank_int")
        )
        for _ in range(iters):
            contribs = (
                ranks.join(e, ranks.node == e.u)
                .join(outdeg, "u")
                .select(
                    F.col("v").alias("node"),
                    F.expr("rank_int DIV od").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("s"))
            )
            ranks = nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(s, 0)) DIV {damping_den}"
                    )
                )
                .cast("bigint")
                .alias("rank_int"),
            )
        return ranks

    a = sorted(tuple(r) for r in old_distributed().collect())
    b = sorted(
        tuple(r)
        for r in GR.pagerank_int(
            edges_df(), "id_a", "id_b", iters=3, driver_pair_limit=None
        ).collect()
    )
    cache_registry.release_all()
    spark.catalog.clearCache()
    assert a == b, "distributed old vs new mismatch"
    print(f"old vs new distributed bit-equal ({len(a)} nodes)")

    run_ab(
        spark,
        [
            ("pagerank dist A r13 unrolled", old_distributed),
            (
                "pagerank dist B persisted+ckpt",
                lambda: GR.pagerank_int(
                    edges_df(), "id_a", "id_b", iters=3,
                    driver_pair_limit=None,
                ),
            ),
        ],
        reps,
    )


def setsim_persist_only(spark, sf_dir, reps):
    """Separate the two setsim effects: status-quo candidates (per-row
    positional + distinct) WITH the prefix persist vs the accumulated
    variant WITH the persist."""
    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from probes_r14 import setsim_accum as _  # noqa: F401 (same build)
    import probes_r14 as P14

    # reuse the build closure by re-declaring via the module-level fn:
    # simplest: inline import of the build from setsim_accum is not
    # possible (closure); re-run with variants A+persist and B2+persist.
    from pyspark.sql import Window
    from kafka_dead_letter_analyzer_spark.operators.dedup import token_shingles

    def build(docs, num, den, shingle_k, variant, persist_prefix):
        elems = token_shingles(F.col("text"), shingle_k)
        base = docs.select(
            F.col("doc_id").alias("doc"),
            F.array_sort(elems).alias("set"),
        ).filter(F.size("set") > 0)
        base = base.persist()
        cache_registry.track(base)
        tok = base.select(
            "doc", F.size("set").alias("sz"), F.explode("set").alias("tk")
        )
        df_tbl = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
        ranked = tok.join(df_tbl, "tk").withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc").orderBy("df", "tk")),
        )
        prefix_len = F.col("sz") - F.expr(
            f"(({num} * sz) + {den} - 1) DIV {den}"
        ) + 1
        prefix = ranked.filter(F.col("rn") <= prefix_len).select(
            "tk", "doc", "sz", "rn"
        )
        if persist_prefix:
            prefix = prefix.persist()
            cache_registry.track(prefix)
        pa = prefix.select(
            F.col("tk").alias("tka"), F.col("doc").alias("da"),
            F.col("sz").alias("sza"), F.col("rn").alias("rna"),
        )
        pb = prefix.select(
            F.col("tk").alias("tkb"), F.col("doc").alias("db"),
            F.col("sz").alias("szb"), F.col("rn").alias("rnb"),
        )
        cond = (
            (F.col("tka") == F.col("tkb"))
            & (F.col("da") < F.col("db"))
            & (F.lit(num) * F.col("sza") <= F.lit(den) * F.col("szb"))
            & (F.lit(num) * F.col("szb") <= F.lit(den) * F.col("sza"))
        )
        row_positional = (
            F.lit(num + den)
            * (
                F.lit(1)
                + F.least(
                    F.col("sza") - F.col("rna"),
                    F.col("szb") - F.col("rnb"),
                )
            )
            >= F.lit(num) * (F.col("sza") + F.col("szb"))
        )
        weak_positional = (
            F.lit(num + den)
            * (
                F.least(F.col("rna"), F.col("rnb"))
                + F.least(
                    F.col("sza") - F.col("rna"),
                    F.col("szb") - F.col("rnb"),
                )
            )
            >= F.lit(num) * (F.col("sza") + F.col("szb"))
        )
        if variant == "A":
            raw = pa.join(pb, cond & row_positional).select("da", "db")
            cands = raw.distinct()
        else:
            cond = cond & weak_positional
            raw = pa.join(pb, cond).select("da", "db", "sza", "szb",
                                           "rna", "rnb")
            cands = (
                raw.groupBy("da", "db", "sza", "szb")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.max("rna").alias("rna_m"),
                    F.max("rnb").alias("rnb_m"),
                )
                .filter(
                    F.lit(num + den)
                    * (
                        F.col("c")
                        + F.least(
                            F.col("sza") - F.col("rna_m"),
                            F.col("szb") - F.col("rnb_m"),
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
            .select("da", "db", "i", (F.col("s") - F.col("i")).alias("u"))
            .filter(F.lit(den) * F.col("i") >= F.lit(num) * F.col("u"))
        )
        return verified.select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("i").cast("bigint").alias("inter_sz"),
            F.col("u").cast("bigint").alias("union_sz"),
            F.expr("(1000000 * i) DIV u").cast("bigint").alias("jaccard_ppm"),
        )

    docs = Q.load_table(spark, sf_dir, "documents")
    for num, den in ((1, 2), (7, 10)):
        run_ab(
            spark,
            [
                (
                    f"setsim t={num}/{den} A+persist",
                    lambda num=num, den=den: build(docs, num, den, 3, "A", True),
                ),
                (
                    f"setsim t={num}/{den} B2+persist",
                    lambda num=num, den=den: build(docs, num, den, 3, "B2", True),
                ),
            ],
            reps,
        )


def containment_accum(spark, sf_dir, reps):
    """Containment accumulated PPJoin bound: per-row positional +
    distinct (status quo) vs weak-row + groupBy accumulate.  alpha =
    ceil(num*sza/den); accumulated bound inter <= c + min(sza-rna_m,
    szb-rnb_m) with c = count of shared A-prefix tokens (B side full
    index, same before-t_c argument as setsim)."""
    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        _tokens,
        token_shingles,
    )

    num, den, shingle_k, permille = 7, 10, 3, 4

    def build(docs, variant, count_only=False):
        elems = token_shingles(F.col("text"), shingle_k)
        base = docs.select(
            F.col("doc_id").alias("doc"),
            F.array_sort(elems).alias("set"),
        ).filter(F.size("set") > 0)
        base = base.persist()
        cache_registry.track(base)
        tok_raw = base.select("doc", F.explode("set").alias("tk"))
        df_tbl = tok_raw.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
        ndocs = base.agg(F.count(F.lit(1)).alias("n_docs"))
        df_tbl = (
            df_tbl.crossJoin(F.broadcast(ndocs))
            .filter(
                F.lit(1000) * F.col("df")
                <= F.lit(int(permille)) * F.col("n_docs")
            )
            .select("tk", "df")
        )
        tok = tok_raw.join(df_tbl, "tk")
        agg = tok.groupBy("doc").agg(
            F.array_sort(F.collect_list(F.struct("df", "tk"))).alias("toks")
        )
        agg = agg.persist()
        cache_registry.track(agg)
        sz = F.size("toks")
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
        pb = agg.select(
            F.col("doc").alias("db"),
            sz.alias("szb"),
            F.posexplode("toks").alias("p0", "p"),
        ).select(
            "db", "szb", (F.col("p0") + 1).alias("rnb"), F.col("p.tk").alias("tkb")
        )
        cond = (
            (F.col("tka") == F.col("tkb"))
            & (F.col("da") != F.col("db"))
            & (F.lit(den) * F.col("szb") >= F.lit(num) * F.col("sza"))
        )
        row_positional = (
            F.lit(den)
            * (
                F.lit(1)
                + F.least(
                    F.col("sza") - F.col("rna"), F.col("szb") - F.col("rnb")
                )
            )
            >= F.lit(num) * F.col("sza")
        )
        weak_positional = (
            F.lit(den)
            * (
                F.least(F.col("rna"), F.col("rnb"))
                + F.least(
                    F.col("sza") - F.col("rna"), F.col("szb") - F.col("rnb")
                )
            )
            >= F.lit(num) * F.col("sza")
        )
        if variant == "A":
            cands = (
                pa.join(pb, cond & row_positional).select("da", "db").distinct()
            )
        else:
            raw = pa.join(pb, cond & weak_positional).select(
                "da", "db", "sza", "szb", "rna", "rnb"
            )
            cands = (
                raw.groupBy("da", "db", "sza", "szb")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.max("rna").alias("rna_m"),
                    F.max("rnb").alias("rnb_m"),
                )
                .filter(
                    F.lit(den)
                    * (
                        F.col("c")
                        + F.least(
                            F.col("sza") - F.col("rna_m"),
                            F.col("szb") - F.col("rnb_m"),
                        )
                    )
                    >= F.lit(num) * F.col("sza")
                )
                .select("da", "db")
            )
        if count_only:
            return cands
        sets_f = agg.select(
            "doc",
            F.array_sort(
                F.transform("toks", lambda s: s.getField("tk"))
            ).alias("fset"),
        )
        verified = (
            cands.join(
                sets_f.select(
                    F.col("doc").alias("da"), F.col("fset").alias("set_a")
                ),
                "da",
            )
            .join(
                sets_f.select(
                    F.col("doc").alias("db"), F.col("fset").alias("set_b")
                ),
                "db",
            )
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
            F.expr("(1000000 * i) DIV asz").cast("bigint").alias(
                "containment_ppm"
            ),
        )

    docs = Q.load_table(spark, sf_dir, "documents")
    n_a = build(docs, "A", count_only=True).count()
    n_b = build(docs, "B2", count_only=True).count()
    cache_registry.release_all()
    spark.catalog.clearCache()
    print(f"containment@{num}/{den}: verify pairs A={n_a} B2={n_b}")
    cur = {
        tuple(r)
        for r in D.containment_join_prefix(
            docs, threshold_num=num, threshold_den=den, shingle_k=shingle_k,
            max_df_permille=permille,
        ).collect()
    }
    new = {tuple(r) for r in build(docs, "B2").collect()}
    assert cur == new, "containment B2 result mismatch"
    cache_registry.release_all()
    spark.catalog.clearCache()
    print(f"result sets equal ({len(cur)} rows)")
    run_ab(
        spark,
        [
            ("containment A status-quo", lambda: D.containment_join_prefix(
                docs, threshold_num=num, threshold_den=den,
                shingle_k=shingle_k, max_df_permille=permille)),
            ("containment B2 accum", lambda: build(docs, "B2")),
        ],
        reps,
    )


def minhash_decomp(spark, sf_dir, reps):
    """dedup_near_minhash stage decomposition at the declared-query
    parameters (num_hashes=64, bands=32, k=3, t=0.5): which stage
    dominates the ~1.0 s exec that 8 query paths pay — base
    materialization (tokenize+shingle+xxhash -> persist), banding UDF +
    bucket groupBy + pair expansion, or the verify join?"""
    from pyspark import StorageLevel

    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        shingle_hashes,
        token_shingles,
        _minhash_band_udf,
    )

    docs0 = Q.load_table(spark, sf_dir, "documents")

    def build(upto):
        docs = docs0
        nonblank = F.trim(F.coalesce(F.col("text"), F.lit(""))) != ""
        base = (
            docs.filter(nonblank)
            .select(
                F.col("doc_id").alias("_id"),
                shingle_hashes(token_shingles(F.col("text"), 3)).alias(
                    "_hashes"
                ),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cache_registry.track(base)
        if upto == "base":
            return base.select("_id")
        bands_of = _minhash_band_udf(64, 32)
        banded = base.select("_id", bands_of("_hashes").alias("_bands"))
        ex = banded.select(
            "_id", F.posexplode("_bands").alias("band", "bucket")
        )
        if upto == "banded":
            return ex.select("band")
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
                    lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                ),
            )
        )
        candidates = (
            buckets.select(F.explode(pair_expr).alias("_p"))
            .select("_p.id_a", "_p.id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        if upto == "cands":
            return candidates
        pairs = candidates.join(
            base.withColumnsRenamed({"_id": "id_a", "_hashes": "h_a"}),
            on="id_a",
        ).join(
            base.withColumnsRenamed({"_id": "id_b", "_hashes": "h_b"}),
            on="id_b",
        )
        inter = F.size(F.array_intersect("h_a", "h_b"))
        union = F.size("h_a") + F.size("h_b") - inter
        return (
            pairs.withColumn(
                "jaccard",
                F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard")
        )

    full = build("full")
    op = D.dedup_near_minhash(
        docs0, num_hashes=64, bands=32, threshold=0.5
    )
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, op.collect()))
    assert a == b, f"probe rebuild diverges from operator: {len(a)} vs {len(b)}"
    print(f"pair set identical to operator: {len(a)} pairs", flush=True)

    run_ab(
        spark,
        [
            ("mh 1 base persist", lambda: build("base")),
            ("mh 2 + banding+explode", lambda: build("banded")),
            ("mh 3 + buckets+cands", lambda: build("cands")),
            ("mh 4 full (verify join)", lambda: build("full")),
        ],
        reps,
    )


def contamination_inline_bloom(spark, sf_dir, reps):
    """x_contamination_prefiltered (guide §3/§6): the current operator
    probes the bloom via bloom_probe (distinct shuffle over corpus gram
    strings + per-gram groupBy) and then SEMI-JOINS the survivors back
    against a SECOND expansion of the corpus gram explode.  Variant:
    probe the broadcast bitmap with num_hashes INLINE left-joins (no
    row fan-out, no distinct, no semi join) and filter gram instances
    map-side — zero corpus-gram shuffles, one explode."""
    import math

    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import contamination as CN
    from kafka_dead_letter_analyzer_spark.operators.dedup import token_shingles
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu
    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        _BLOOM_BITS_PER_WORD,
        bloom_sketch,
        md5_u60,
    )

    docs0 = Q.load_table(spark, sf_dir, "documents")

    def current():
        return CN.ngram_overlap_prefiltered(
            corpus=docs0.filter(F.col("source") != "src0"),
            benchmark=docs0.filter(F.col("source") == "src0"),
            n=8,
        )

    def inline():
        corpus = docs0.filter(F.col("source") != "src0")
        benchmark = docs0.filter(F.col("source") == "src0")
        k, target_fp = 4, 0.01
        c = spread_for_cpu(corpus).select(
            "doc_id", F.explode(token_shingles(F.col("text"), 8)).alias("sh")
        )
        b = (
            benchmark.select(
                F.explode(token_shingles(F.col("text"), 8)).alias("sh")
            )
            .distinct()
            .persist()
        )
        cache_registry.track(b)
        n_grams = b.count()
        if n_grams == 0:
            num_words = 1
        else:
            bits = -k * n_grams / math.log(1.0 - target_fp ** (1.0 / k))
            num_words = max(1, int(math.ceil(bits / _BLOOM_BITS_PER_WORD)))
        sk = bloom_sketch(b, key="sh", num_hashes=k, num_words=num_words)
        # the bitmap feeds num_hashes broadcast lookups below; unpersisted,
        # Catalyst re-expands the sketch build per lookup join
        sk = sk.persist()
        cache_registry.track(sk)
        m = _BLOOM_BITS_PER_WORD * num_words
        pruned = c
        for d in range(k):
            salted = F.concat(
                F.col("sh").cast("string"),
                F.lit("!"),
                F.lit(d).cast("string"),
            )
            pruned = pruned.withColumn(f"_h{d}", md5_u60(salted) % m)
            pruned = pruned.withColumn(
                f"_w{d}", F.expr(f"CAST(_h{d} DIV {_BLOOM_BITS_PER_WORD} AS INT)")
            ).withColumn(
                f"_b{d}", F.expr(f"CAST(_h{d} % {_BLOOM_BITS_PER_WORD} AS INT)")
            )
            skd = sk.select(
                F.col("word").alias(f"_skw{d}"),
                F.col("bits").alias(f"_bits{d}"),
            )
            pruned = pruned.join(
                F.broadcast(skd),
                F.col(f"_w{d}") == F.col(f"_skw{d}"),
                "left",
            )
            # filter IMMEDIATELY: a miss on hash d short-circuits the
            # remaining (k-1-d) md5 evaluations for that gram instance
            pruned = pruned.filter(
                F.expr(
                    f"CAST(shiftright(coalesce(_bits{d}, CAST(0 AS BIGINT)),"
                    f" _b{d}) & 1 AS INT) = 1"
                )
            )
        pruned = pruned.select("doc_id", "sh")
        return (
            pruned.join(F.broadcast(b), "sh")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        )

    def inline_xx():
        """Same shape as inline() but the bloom family is xxhash64
        (codegen, no md5 string digest): build and probe must share the
        family; the exact join downstream makes the bitmap content
        internal (oracle checks only the final counts)."""
        corpus = docs0.filter(F.col("source") != "src0")
        benchmark = docs0.filter(F.col("source") == "src0")
        k, target_fp = 4, 0.01
        c = spread_for_cpu(corpus).select(
            "doc_id", F.explode(token_shingles(F.col("text"), 8)).alias("sh")
        )
        b = (
            benchmark.select(
                F.explode(token_shingles(F.col("text"), 8)).alias("sh")
            )
            .distinct()
            .persist()
        )
        cache_registry.track(b)
        import math
        n_grams = b.count()
        if n_grams == 0:
            num_words = 1
        else:
            bits = -k * n_grams / math.log(1.0 - target_fp ** (1.0 / k))
            num_words = max(1, int(math.ceil(bits / _BLOOM_BITS_PER_WORD)))
        m = _BLOOM_BITS_PER_WORD * num_words
        seeds = F.array(*[F.lit(i) for i in range(k)])
        sk = (
            b.select(F.explode(seeds).alias("d"), "sh")
            .select(F.pmod(F.xxhash64("sh", "d"), F.lit(m)).alias("h"))
            .select(
                F.expr(f"CAST(h DIV {_BLOOM_BITS_PER_WORD} AS INT)").alias("word"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(h % {_BLOOM_BITS_PER_WORD} AS INT))"
                ).alias("bword"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(bword)").cast("bigint").alias("bits"))
            .persist()
        )
        cache_registry.track(sk)
        pruned = c
        for d in range(k):
            pruned = pruned.withColumn(
                f"_h{d}", F.pmod(F.xxhash64("sh", F.lit(d)), F.lit(m))
            )
            pruned = pruned.withColumn(
                f"_w{d}", F.expr(f"CAST(_h{d} DIV {_BLOOM_BITS_PER_WORD} AS INT)")
            ).withColumn(
                f"_b{d}", F.expr(f"CAST(_h{d} % {_BLOOM_BITS_PER_WORD} AS INT)")
            )
            skd = sk.select(
                F.col("word").alias(f"_skw{d}"),
                F.col("bits").alias(f"_bits{d}"),
            )
            pruned = pruned.join(
                F.broadcast(skd),
                F.col(f"_w{d}") == F.col(f"_skw{d}"),
                "left",
            )
            pruned = pruned.filter(
                F.expr(
                    f"CAST(shiftright(coalesce(_bits{d}, CAST(0 AS BIGINT)),"
                    f" _b{d}) & 1 AS INT) = 1"
                )
            )
        pruned = pruned.select("doc_id", "sh")
        return (
            pruned.join(F.broadcast(b), "sh")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        )

    a = sorted(map(tuple, current().collect()))
    cache_registry.release_all(); spark.catalog.clearCache()
    bres = sorted(map(tuple, inline().collect()))
    assert a == bres, f"inline variant diverges: {len(a)} vs {len(bres)}"
    cache_registry.release_all(); spark.catalog.clearCache()
    xres = sorted(map(tuple, inline_xx().collect()))
    assert a == xres, f"inline_xx variant diverges: {len(a)} vs {len(xres)}"
    print(f"results identical: {len(a)} rows", flush=True)

    import io, contextlib
    for label, fn in [("current", current), ("inline", inline)]:
        cache_registry.release_all(); spark.catalog.clearCache()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn().explain("formatted")
        p = buf.getvalue()
        print(
            f"plan {label}: Exchange={p.count('Exchange')}"
            f" BHJ={p.count('BroadcastHashJoin')}"
            f" Generate={p.count('Generate')}",
            flush=True,
        )

    run_ab(
        spark,
        [("ctm current (bloom_probe+semi)", current),
         ("ctm inline bloom", inline),
         ("ctm inline xxhash bloom", inline_xx)],
        reps,
    )


def bigram_zip(spark, sf_dir, reps):
    """x_bigram_memorization: the bigram array build uses the
    per-position transform (element_at per i) — the formulation
    token_grams' own comment measured 5.7x slower than the
    shifted-slice arrays_zip.  Variant: same strings via
    arrays_zip(slice(toks,1,m), slice(toks,2,m)); the n<2 -> [] branch
    is preserved (token_grams itself differs there: whole-seq gram)."""
    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import text as TX
    from kafka_dead_letter_analyzer_spark.operators.dedup import _tokens
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu
    from pyspark.sql import Window

    docs0 = Q.load_table(spark, sf_dir, "documents")

    def current():
        return TX.bigram_memorization_ppm(docs0)

    def zipv():
        docs = spread_for_cpu(docs0)
        toks = _tokens(F.col("text"))
        n = F.size(toks)
        m = F.greatest(n - 1, F.lit(0))
        z = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m))
        grams = F.transform(
            z, lambda s: F.concat_ws(" ", s["0"], s["1"])
        )
        bigrams = F.when(n >= 2, grams).otherwise(
            F.array().cast("array<string>")
        )
        db = docs.select(
            F.col("doc_id"),
            F.explode(F.array_distinct(bigrams)).alias("bg"),
        )
        w = Window.partitionBy("bg")
        dfed = db.withColumn("df", F.count(F.lit(1)).over(w))
        return dfed.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) "
                "* 1000000 DIV count(*) AS BIGINT)"
            ).alias("shared_ppm"),
        )

    a = sorted(map(tuple, current().collect()))
    b = sorted(map(tuple, zipv().collect()))
    assert a == b, f"zip variant diverges: {len(a)} vs {len(b)}"
    print(f"results identical: {len(a)} rows", flush=True)
    run_ab(
        spark,
        [("bigram current (element_at)", current),
         ("bigram arrays_zip", zipv)],
        reps,
    )
