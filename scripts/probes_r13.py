"""Probe bodies for probe_r13.py — each fn(spark, sf_dir, reps)."""

from pyspark.sql import functions as F

from probe_r13 import run_ab


def exact_substring(spark, sf_dir, reps):
    """x_exact_substring_clean: status-quo (seeds tree evaluated twice,
    once per join branch) vs a persisted-seeds variant."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        _tokens,
        token_grams,
    )
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu

    k = 8

    def cut_persisted(docs, id_col="doc_id", text_col="text"):
        toks = _tokens(F.col(text_col))
        L = F.size(toks)
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
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cache_registry.track(seeds)
        first = seeds.groupBy("g").agg(F.min(F.struct("doc", "pos")).alias("_f"))
        marked = (
            seeds.join(first, "g")
            .filter(
                (F.col("doc") != F.col("_f.doc"))
                | (F.col("pos") != F.col("_f.pos"))
            )
            .select("doc", "pos")
        )
        w_prev = (
            Window.partitionBy("doc").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = (
            Window.partitionBy("doc").orderBy("pos")
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
            .select(F.col("doc").alias(id_col), "cut_start", "cut_end")
        )

    docs = Q.load_table(spark, sf_dir, "documents")

    run_ab(
        spark,
        [
            (
                "cut+apply status-quo",
                lambda: D.apply_substring_cuts(
                    docs, D.exact_substring_cut(docs, k=k)
                ),
            ),
            (
                "cut+apply seeds-persist",
                lambda: D.apply_substring_cuts(docs, cut_persisted(docs)),
            ),
        ],
        reps,
    )


def dsir(spark, sf_dir, reps):
    """Decompose x_dsir_weights (md5/256 config): featurization alone,
    featurization+distribution join (no final ordered sum), and the full
    weights — locates the dominant stage."""
    from kafka_dead_letter_analyzer_spark import queries as Q
    from kafka_dead_letter_analyzer_spark.operators import selection as SEL

    docs = Q.load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")

    def feats_only():
        return SEL.hashed_ngram_counts(
            docs, n_max=2, num_buckets=256, bucket_hash="md5"
        )

    def full():
        return SEL.dsir_log_weights(
            docs, target, n_max=2, num_buckets=256, bucket_hash="md5"
        )

    run_ab(
        spark,
        [
            ("feats md5/256", feats_only),
            ("full weights", full),
        ],
        reps,
    )


def dsir2(spark, sf_dir, reps):
    """Finer dsir_log_weights decomposition: raw feats; raw+target
    feats; the per-bucket weighted join (no final sum); the full
    operator (ordered-sum finish)."""
    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import selection as SEL

    docs = Q.load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    kw = dict(n_max=2, num_buckets=256, bucket_hash="md5")

    def feats(d, id_col="doc_id", text_col="text"):
        return SEL.hashed_ngram_counts(
            d, id_col=id_col, text_col=text_col, **kw
        )

    def both():
        a = feats(docs)
        b = feats(
            target.select(
                F.lit(0).cast("bigint").alias("_tid"),
                F.col("text").alias("_ttext"),
            ),
            id_col="_tid",
            text_col="_ttext",
        )
        return a.select("bucket", "cnt").unionByName(
            b.select("bucket", "cnt")
        )

    def per_bucket_no_sum():
        # dsir_log_weights minus the groupBy ordered sum: group and do a
        # cheap unordered float sum instead (prices the collect_list/
        # array_sort/aggregate finish by contrast)
        w = SEL.dsir_log_weights(docs, target, **kw)
        return w  # placeholder, replaced below

    # rebuild the internals to stop before the ordered sum
    def weights_plain_sum():
        from kafka_dead_letter_analyzer_spark.operators.selection import (
            hashed_ngram_counts,
        )

        feats_df = hashed_ngram_counts(docs, **kw).select(
            F.col("doc_id").alias("_id"), "bucket", "cnt"
        )
        feats_df = cache_registry.track(feats_df.persist())
        raw_dist = feats_df.groupBy("bucket").agg(
            F.sum("cnt").cast("bigint").alias("_rc")
        )
        tgt_dist = (
            hashed_ngram_counts(
                target.select(
                    F.lit(0).cast("bigint").alias("_tid"),
                    F.col("text").alias("_ttext"),
                ),
                id_col="_tid",
                text_col="_ttext",
                **kw,
            )
            .groupBy("bucket")
            .agg(F.sum("cnt").cast("bigint").alias("_tc"))
        )
        raw_tot = raw_dist.agg(
            F.coalesce(F.sum("_rc"), F.lit(0)).cast("bigint").alias("_rt")
        )
        tgt_tot = tgt_dist.agg(
            F.coalesce(F.sum("_tc"), F.lit(0)).cast("bigint").alias("_tt")
        )
        a, nb = 1.0, 256
        ab = a * nb
        ratio = (
            raw_dist.join(F.broadcast(tgt_dist), "bucket", "left")
            .crossJoin(F.broadcast(raw_tot))
            .crossJoin(F.broadcast(tgt_tot))
            .select(
                "bucket",
                (
                    F.log(
                        (F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(a))
                        / (F.col("_tt") + F.lit(ab))
                    )
                    - F.log(
                        (F.coalesce(F.col("_rc"), F.lit(0)) + F.lit(a))
                        / (F.col("_rt") + F.lit(ab))
                    )
                ).alias("_lr"),
            )
        )
        per_bucket = feats_df.join(F.broadcast(ratio), "bucket").select(
            "_id", "bucket", "cnt", (F.col("cnt") * F.col("_lr")).alias("_c")
        )
        return per_bucket.groupBy("_id").agg(
            F.sum("cnt").cast("bigint").alias("n_features"),
            F.sum("_c").alias("_w"),  # UNORDERED sum — timing contrast only
        )

    run_ab(
        spark,
        [
            ("raw feats", lambda: feats(docs)),
            ("raw+tgt feats", both),
            ("weights plain-sum", weights_plain_sum),
            (
                "weights full",
                lambda: SEL.dsir_log_weights(docs, target, **kw),
            ),
        ],
        reps,
    )


def avro_spread(spark, sf_dir, reps):
    """s2_avro_wire: the whole Python encode+decode cascade runs in the
    ONE scan task the 30k-row filtered parquet split produces (plan
    read: no exchange below either ArrowEvalPython). Probe: round-robin
    spread before the encode UDF."""
    from kafka_dead_letter_analyzer_spark import queries as Q
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu
    from kafka_dead_letter_analyzer_spark.streaming.kafka import (
        avro_wire_encode_udf,
        decode_kafka_records,
    )

    def build(spread):
        events = Q.load_table(spark, sf_dir, "events").filter(
            F.col("event_id") < 30000
        )
        if spread:
            events = spread_for_cpu(events)
        enc = avro_wire_encode_udf()
        dl_json = F.to_json(
            F.struct(
                F.col("event_type").alias("input_value"),
                (F.col("user_id") % 4).cast("int").alias("partition"),
                F.concat(F.lit("orig-"), F.col("event_type")).alias("topic"),
                F.col("event_id").alias("offset"),
                F.concat(F.lit("Error in "), F.col("event_type")).alias(
                    "description"
                ),
                F.struct(
                    F.lit("java.lang.RuntimeException").alias("error_class"),
                    F.col("props").alias("message"),
                ).alias("cause"),
                F.unix_millis(F.col("ts")).alias("input_timestamp"),
            )
        )
        val = F.when(F.col("event_id") % 3 != 0, enc(dl_json)).otherwise(
            F.encode(F.col("props"), "UTF-8")
        )
        kafka_shaped = events.select(
            F.encode(F.col("event_id").cast("string"), "UTF-8").alias("key"),
            val.alias("value"),
            F.lit(None)
            .cast("array<struct<key:string,value:binary>>")
            .alias("headers"),
            F.lit("events-dead-letters").alias("topic"),
            F.lit(0).cast("int").alias("partition"),
            F.col("event_id").alias("offset"),
            F.col("ts").alias("timestamp"),
        )
        decoded = decode_kafka_records(kafka_shaped, use_avro="python")
        return decoded.select(
            F.col("offset").alias("event_id"),
            F.col("value_deadletter").isNotNull().alias("is_avro"),
            F.col("value_deadletter.description").alias("description"),
        )

    run_ab(
        spark,
        [
            ("s2_avro_wire no-spread", lambda: build(False)),
            ("s2_avro_wire spread", lambda: build(True)),
        ],
        reps,
    )


def setsim(spark, sf_dir, reps):
    """x_setsim_join: status-quo prefix self-join candidates vs grouped
    posting-list expansion (the minhash r13.3 shape)."""
    from pyspark.sql import Window

    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        _tokens,
        token_shingles,
    )

    num, den, shingle_k = 7, 10, 3

    def grouped(docs, id_col="doc_id", text_col="text"):
        elems = token_shingles(F.col(text_col), shingle_k)
        base = docs.select(
            F.col(id_col).alias("doc"),
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
            F.row_number().over(
                Window.partitionBy("doc").orderBy("df", "tk")
            ),
        )
        prefix_len = F.col("sz") - F.expr(
            f"(({num} * sz) + {den} - 1) DIV {den}"
        ) + 1
        prefix = ranked.filter(F.col("rn") <= prefix_len)
        postings = (
            prefix.groupBy("tk")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("doc", "sz"))
                ).alias("_l")
            )
            .filter(F.size("_l") >= 2)
        )
        pair_expr = F.flatten(
            F.transform(
                F.col("_l"),
                lambda a, i: F.transform(
                    F.slice(F.col("_l"), i + 2, F.size(F.col("_l")) - i - 1),
                    lambda b: F.struct(
                        a["doc"].alias("da"),
                        a["sz"].alias("sza"),
                        b["doc"].alias("db"),
                        b["sz"].alias("szb"),
                    ),
                ),
            )
        )
        cands = (
            postings.select(F.explode(pair_expr).alias("_p"))
            .filter(
                (F.lit(num) * F.col("_p.sza") <= F.lit(den) * F.col("_p.szb"))
                & (F.lit(num) * F.col("_p.szb") <= F.lit(den) * F.col("_p.sza"))
            )
            .select("_p.da", "_p.db")
            .distinct()
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

    # correctness first: identical result sets
    cur = {
        tuple(r)
        for r in D.setsim_join_prefix(
            docs, threshold_num=num, threshold_den=den, shingle_k=shingle_k
        ).collect()
    }
    new = {tuple(r) for r in grouped(docs).collect()}
    print(f"result sets equal: {cur == new} ({len(cur)} rows)")
    assert cur == new

    run_ab(
        spark,
        [
            (
                "setsim status-quo",
                lambda: D.setsim_join_prefix(
                    docs,
                    threshold_num=num,
                    threshold_den=den,
                    shingle_k=shingle_k,
                ),
            ),
            ("setsim grouped", lambda: grouped(docs)),
        ],
        reps,
    )


def spearman_persist(spark, sf_dir, reps):
    """status quo vs persist-base0 variant: the construction probe's
    eager scan populates the cache that the three base consumers then
    read — one parquet scan total instead of four."""
    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import ranking as RK

    li0 = Q.load_table(spark, sf_dir, "lineitem")

    def li():
        return li0.select(
            "l_returnflag",
            "l_quantity",
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("price_cents"),
        )

    groups = ["l_returnflag"]

    def persist_variant():
        from pyspark import StorageLevel

        src = li()
        base0 = src.select(
            *[src[g] for g in groups],
            F.col("l_quantity").alias("x0"),
            F.col("price_cents").alias("y0"),
        ).filter(F.col("x0").isNotNull() & F.col("y0").isNotNull())
        base0 = base0.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.track(base0)
        # replicate the operator's probe (fractional check on x0 only:
        # y0 is bigint) — its collect materializes the cache
        checks = {"x0": "x0 != floor(x0)"}
        probe = RK._distinct_probe(base0, groups, ["x0", "y0"], checks)
        assert probe["f_x0"] == 0 and probe["n"] <= RK._SPEARMAN_N_MAX
        # pass the cached base0 on under explicit two_phase so the
        # operator path skips its own probe; spearman_exact re-derives
        # base from base0 — here we just call it on the persisted frame
        return RK.spearman_exact(
            base0.select(*groups, F.col("x0").alias("l_quantity"),
                         F.col("y0").alias("price_cents")),
            x_col="l_quantity",
            y_col="price_cents",
            group_cols=groups,
            two_phase=False,
        )

    cur = {
        tuple(r)
        for r in RK.spearman_exact(
            li(), x_col="l_quantity", y_col="price_cents", group_cols=groups
        ).collect()
    }
    new = {tuple(r) for r in persist_variant().collect()}
    from kafka_dead_letter_analyzer_spark import cache_registry as CR

    CR.release_all()
    spark.catalog.clearCache()
    print(f"result sets equal: {cur == new}")
    assert cur == new

    run_ab(
        spark,
        [
            (
                "spearman status-quo",
                lambda: RK.spearman_exact(
                    li(),
                    x_col="l_quantity",
                    y_col="price_cents",
                    group_cols=groups,
                ),
            ),
            ("spearman persist-base0", persist_variant),
        ],
        reps,
    )


def spearman(spark, sf_dir, reps):
    """x_spearman_qty_price: status quo vs probe-gated broadcast of the
    centered-rank value maps in the join-back (both maps are value
    contractions — the probe already knows their distinct counts)."""
    import functools

    from pyspark.sql import Window

    from kafka_dead_letter_analyzer_spark import queries as Q
    from kafka_dead_letter_analyzer_spark.operators import ranking as RK

    li0 = Q.load_table(spark, sf_dir, "lineitem")
    li = li0.select(
        "l_returnflag",
        "l_quantity",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    groups = ["l_returnflag"]

    def bcast_variant():
        base0 = li.select(
            *[li[g] for g in groups],
            F.col("l_quantity").alias("x0"),
            F.col("price_cents").alias("y0"),
        ).filter(F.col("x0").isNotNull() & F.col("y0").isNotNull())
        base = base0.select(
            *[base0[g] for g in groups],
            F.col("x0").cast("bigint").alias("x"),
            F.col("y0").cast("bigint").alias("y"),
        ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())

        def centered(col, out):
            counts = base.groupBy(*groups, col).agg(
                F.count(F.lit(1)).cast("bigint").alias("c")
            )
            wg = Window.partitionBy(*groups)
            w_lt = wg.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
            w_all = wg.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            return counts.withColumn(
                "cum_lt",
                F.coalesce(F.sum("c").over(w_lt), F.lit(0).cast("bigint")),
            ).withColumn("nn", F.sum("c").over(w_all)).select(
                *groups,
                F.col(col).alias(f"{col}v"),
                F.expr("2 * cum_lt + c - nn").alias(out),
            )

        xm = centered("x", "dx")
        ym = centered("y", "dy")

        def _conj(conds):
            return functools.reduce(lambda a, c: a & c, conds)

        joined = base.alias("b").join(
            F.broadcast(xm.alias("xm")),
            _conj([*(F.col(f"b.{g}").eqNullSafe(F.col(f"xm.{g}"))
                     for g in groups),
                   F.col("b.x") == F.col("xm.xv")]),
            "inner",
        ).join(
            F.broadcast(ym.alias("ym")),
            _conj([*(F.col(f"b.{g}").eqNullSafe(F.col(f"ym.{g}"))
                     for g in groups),
                   F.col("b.y") == F.col("ym.yv")]),
            "inner",
        )
        agg = joined.groupBy(*[F.col(f"b.{g}") for g in groups]).agg(
            F.sum(F.expr("dx * dy")).cast("bigint").alias("num"),
            F.sum(F.expr("dx * dx")).cast("bigint").alias("den_x"),
            F.sum(F.expr("dy * dy")).cast("bigint").alias("den_y"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        return agg.filter(
            (F.col("den_x") > 0) & (F.col("den_y") > 0)
        ).select(
            *groups,
            "num",
            "den_x",
            "den_y",
            "n",
            F.expr(
                "CAST(floor(num * 1000000.0 /"
                " (sqrt(CAST(den_x AS DOUBLE)) * sqrt(CAST(den_y AS"
                " DOUBLE))) + 0.5) AS BIGINT)"
            ).alias("rho_e6"),
        )

    # correctness: identical rows
    cur = {
        tuple(r)
        for r in RK.spearman_exact(
            li, x_col="l_quantity", y_col="price_cents", group_cols=groups
        ).collect()
    }
    new = {tuple(r) for r in bcast_variant().collect()}
    print(f"result sets equal: {cur == new} ({sorted(cur)})")
    assert cur == new

    run_ab(
        spark,
        [
            (
                "spearman status-quo",
                lambda: RK.spearman_exact(
                    li,
                    x_col="l_quantity",
                    y_col="price_cents",
                    group_cols=groups,
                ),
            ),
            (
                # prices the construction probe: same plan as status-quo
                # at this SF (probe chooses the window for both columns)
                # minus the probe scan
                "spearman noprobe-window",
                lambda: RK.spearman_exact(
                    li,
                    x_col="l_quantity",
                    y_col="price_cents",
                    group_cols=groups,
                    two_phase=False,
                ),
            ),
            ("spearman bcast-maps", bcast_variant),
        ],
        reps,
    )


def setsim_ppjoin(spark, sf_dir, reps):
    """x_setsim_join / kcore's setsim@0.5: status-quo prefix candidates
    vs PPJoin POSITIONAL filter (Xiao et al. WWW'08): a candidate row at
    prefix ranks (rna, rnb) can only reach overlap 1 + min(sza-rna,
    szb-rnb); the threshold needs inter >= ceil(num*(sza+szb)/(num+den)),
    so rows below that bound are dropped pre-distinct.  Exact: the pair's
    FIRST shared token (global (df,tk) order) sits in both prefixes and
    satisfies the bound whenever the pair qualifies."""
    from pyspark.sql import Window

    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import token_shingles

    def build(docs, num, den, shingle_k, positional, count_only=False):
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
        prefix = ranked.filter(F.col("rn") <= prefix_len)
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
        if positional:
            cond = cond & (
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
        raw = pa.join(pb, cond).select("da", "db")
        if count_only:
            return raw
        cands = raw.distinct()
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

    for num, den in ((7, 10), (1, 2)):
        n_raw = build(docs, num, den, 3, False, count_only=True).count()
        n_pos = build(docs, num, den, 3, True, count_only=True).count()
        cache_registry.release_all()
        spark.catalog.clearCache()
        print(f"t={num}/{den}: raw cand rows {n_raw} -> positional {n_pos}"
              f" ({100.0 * n_pos / max(n_raw, 1):.1f}%)")
        cur = {
            tuple(r)
            for r in D.setsim_join_prefix(
                docs, threshold_num=num, threshold_den=den, shingle_k=3
            ).collect()
        }
        new = {tuple(r) for r in build(docs, num, den, 3, True).collect()}
        cache_registry.release_all()
        spark.catalog.clearCache()
        print(f"t={num}/{den}: result sets equal: {cur == new} ({len(cur)} rows)")
        assert cur == new

        run_ab(
            spark,
            [
                (
                    f"setsim t={num}/{den} status-quo",
                    lambda num=num, den=den: D.setsim_join_prefix(
                        docs, threshold_num=num, threshold_den=den, shingle_k=3
                    ),
                ),
                (
                    f"setsim t={num}/{den} positional",
                    lambda num=num, den=den: build(docs, num, den, 3, True),
                ),
            ],
            reps,
        )


def containment_ppjoin(spark, sf_dir, reps):
    """x_containment_join: status-quo (no positional filter, inline
    re-implementation) vs the committed positional-filtered operator —
    sf0.1 result-identity check + candidate-count prune ratio + A/B."""
    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    from kafka_dead_letter_analyzer_spark.operators.dedup import token_shingles

    num, den, shingle_k, permille = 7, 10, 3, 4

    def old(docs, count_only=False):
        elems = token_shingles(F.col("text"), shingle_k)
        base = docs.select(
            F.col("doc_id").alias("doc"), F.array_sort(elems).alias("set")
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
            F.col("doc").alias("da"), sz.alias("sza"),
            F.explode(F.slice(F.col("toks"), F.lit(1), prefix_len)).alias("p"),
        ).select("da", "sza", F.col("p.tk").alias("tka"))
        pb = agg.select(
            F.col("doc").alias("db"), sz.alias("szb"),
            F.explode("toks").alias("p"),
        ).select("db", "szb", F.col("p.tk").alias("tkb"))
        raw = pa.join(
            pb,
            (F.col("tka") == F.col("tkb"))
            & (F.col("da") != F.col("db"))
            & (F.lit(den) * F.col("szb") >= F.lit(num) * F.col("sza")),
        ).select("da", "db")
        if count_only:
            return raw
        cands = raw.distinct()
        sets_f = agg.select(
            "doc",
            F.array_sort(
                F.transform("toks", lambda s: s.getField("tk"))
            ).alias("set"),
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
            F.expr("(1000000 * i) DIV asz").cast("bigint").alias(
                "containment_ppm"
            ),
        )

    def new(docs):
        return D.containment_join_prefix(
            docs, threshold_num=num, threshold_den=den, shingle_k=shingle_k,
            max_df_permille=permille,
        )

    docs = Q.load_table(spark, sf_dir, "documents")
    n_old = old(docs, count_only=True).count()
    cache_registry.release_all()
    spark.catalog.clearCache()
    cur = {tuple(r) for r in old(docs).collect()}
    cache_registry.release_all()
    spark.catalog.clearCache()
    upd = {tuple(r) for r in new(docs).collect()}
    cache_registry.release_all()
    spark.catalog.clearCache()
    print(f"old cand rows {n_old}; result sets equal: {cur == upd}"
          f" ({len(cur)} rows)")
    assert cur == upd

    run_ab(
        spark,
        [
            ("containment status-quo", lambda: old(docs)),
            ("containment positional", lambda: new(docs)),
        ],
        reps,
    )


def drift_counts_persist(spark, sf_dir, reps):
    """Standalone theilsen/mk/hampel: status-quo (counts rebuilt for
    the span probe AND re-expanded twice in the final plan) vs counts
    persisted so the probe doubles as the cache fill (the r13.5
    spearman pattern), emulated via bucket_counts + counts_df."""
    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.operators import drift as DR

    ev = Q.load_table(spark, sf_dir, "events")

    def persisted(op, **kw):
        def build():
            c = DR.bucket_counts(
                ev, ts_col="ts", group_cols=["event_type"], bucket="day"
            ).persist()
            cache_registry.track(c)
            return op(
                ev, ts_col="ts", group_cols=["event_type"], bucket="day",
                counts_df=c, **kw
            )
        return build

    def plain(op, **kw):
        return lambda: op(
            ev, ts_col="ts", group_cols=["event_type"], bucket="day", **kw
        )

    for name, op, kw in (
        ("theilsen", DR.theilsen_trend, {}),
        ("mann_kendall", DR.mann_kendall, {}),
        ("hampel", DR.hampel_outliers, {"half_window": 3}),
    ):
        run_ab(
            spark,
            [
                (f"{name} status-quo", plain(op, **kw)),
                (f"{name} persisted-counts", persisted(op, **kw)),
            ],
            reps,
        )


def spearman_restructure(spark, sf_dir, reps):
    """x_spearman_qty_price: status quo (base joined back to BOTH
    centered maps row-level, then one agg) vs the pivot restructure:
    den_x/den_y/n computed join-free from the (group, value) count
    contractions (den = sum c*d^2), and num via ONE row-level join
    (base x ym on the near-continuous column) contracted onto the
    BOUNDED column's domain (50 quantities) then broadcast-joined to
    xm.  Removes one full-width row-level shuffle+join; exact integer
    equality asserted before timing."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from kafka_dead_letter_analyzer_spark import cache_registry, queries as Q
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    def base_df():
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_returnflag").alias("g"),
            F.col("l_quantity").cast("bigint").alias("x"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("y"),
        )
        return li.filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    def centered(base, col):
        counts = base.groupBy("g", col).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        wg = Window.partitionBy("g")
        w_lt = wg.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        w_all = wg.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return (
            counts.withColumn(
                "cum_lt",
                F.coalesce(F.sum("c").over(w_lt), F.lit(0).cast("bigint")),
            )
            .withColumn("nn", F.sum("c").over(w_all))
            .select(
                "g",
                F.col(col).alias(f"{col}v"),
                "c",
                F.expr("2 * cum_lt + c - nn").alias(f"d{col}"),
            )
        )

    def candidate():
        base = base_df().persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.track(base)
        xm = centered(base, "x")
        ym = centered(base, "y")
        denx = xm.groupBy("g").agg(
            F.sum(F.expr("c * dx * dx")).cast("bigint").alias("den_x"),
            F.sum("c").cast("bigint").alias("n"),
        )
        deny = ym.groupBy("g").agg(
            F.sum(F.expr("c * dy * dy")).cast("bigint").alias("den_y"),
        )
        t = (
            base.alias("b")
            .join(
                ym.alias("ym"),
                (F.col("b.g") == F.col("ym.g"))
                & (F.col("b.y") == F.col("ym.yv")),
            )
            .groupBy(F.col("b.g").alias("g"), F.col("b.x").alias("x"))
            .agg(F.sum("dy").cast("bigint").alias("sdy"))
        )
        num = (
            t.alias("t")
            .join(
                F.broadcast(xm.alias("xm")),
                (F.col("t.g") == F.col("xm.g"))
                & (F.col("t.x") == F.col("xm.xv")),
            )
            .groupBy(F.col("t.g").alias("g"))
            .agg(F.sum(F.expr("sdy * dx")).cast("bigint").alias("num"))
        )
        out = (
            num.join(denx, "g").join(deny, "g")
            .filter((F.col("den_x") > 0) & (F.col("den_y") > 0))
            .select(
                F.col("g").alias("l_returnflag"),
                "num",
                "den_x",
                "den_y",
                "n",
                F.expr(
                    "CAST(floor(num * 1000000.0 /"
                    " (sqrt(CAST(den_x AS DOUBLE)) * sqrt(CAST(den_y AS"
                    " DOUBLE))) + 0.5) AS BIGINT)"
                ).alias("rho_e6"),
            )
        )
        return out

    # correctness first: identical rows
    sq = {tuple(r) for r in Q.x_spearman_qty_price(spark, sf_dir).collect()}
    cache_registry.release_all()
    spark.catalog.clearCache()
    ca = {tuple(r) for r in candidate().collect()}
    cache_registry.release_all()
    spark.catalog.clearCache()
    assert sq == ca, (sorted(sq)[:2], sorted(ca)[:2])
    print(f"result sets identical ({len(sq)} rows)")

    run_ab(
        spark,
        [
            ("status_quo", lambda: Q.x_spearman_qty_price(spark, sf_dir)),
            ("pivot_restructure", candidate),
        ],
        reps,
    )


def kendall_kernel(spark, sf_dir, reps):
    """x_kendall_price_quantized: impl='sql' (densified grid windows +
    assembly joins) vs impl='kernel' (one grouped Arrow kernel) on the
    declared config; result equality asserted first."""
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators import ranking as RK
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    def build(impl):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_quantity",
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("price_cents"),
        )
        return RK.kendall_tau_quantized(
            li, x_col="l_quantity", y_col="price_cents",
            group_cols=["l_returnflag"], y_buckets=256, impl=impl,
        )

    a = {tuple(r) for r in build("sql").collect()}
    cache_registry.release_all(); spark.catalog.clearCache()
    b = {tuple(r) for r in build("kernel").collect()}
    cache_registry.release_all(); spark.catalog.clearCache()
    assert a == b, (sorted(a), sorted(b))
    print(f"result sets identical ({len(a)} rows)")
    run_ab(
        spark,
        [
            ("sql_grid", lambda: build("sql")),
            ("kernel", lambda: build("kernel")),
        ],
        reps,
    )


def pagerank_driver(spark, sf_dir, reps):
    """x_pagerank_int: distributed unrolled iteration
    (driver_pair_limit=None) vs the bounded driver power iteration
    (default); result equality asserted first."""
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators import graph as GR
    from kafka_dead_letter_analyzer_spark.operators import text as TX
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    def build(limit):
        pc = TX.cooccurrence_counts(
            load_table(spark, sf_dir, "documents"), text_col="text", window=2
        )
        edges = pc.filter(
            (F.col("n") >= 2) & (F.col("center") != F.col("context"))
        ).select(F.col("center").alias("id_a"), F.col("context").alias("id_b"))
        return GR.pagerank_int(
            edges, "id_a", "id_b", iters=3, driver_pair_limit=limit
        )

    a = {tuple(r) for r in build(None).collect()}
    cache_registry.release_all(); spark.catalog.clearCache()
    b = {tuple(r) for r in build(250_000).collect()}
    cache_registry.release_all(); spark.catalog.clearCache()
    assert a == b, (len(a), len(b))
    print(f"result sets identical ({len(a)} rows)")
    run_ab(
        spark,
        [
            ("distributed", lambda: build(None)),
            ("driver_bounded", lambda: build(250_000)),
        ],
        reps,
    )
