"""Parity-layer tests, mirroring the reference's estimate-tolerance test
style (UpdateHandlerTest.java:74: CPC within 1% of 2000 true uniques) and
its merge semantics (sketch of whole == merge of partition sketches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_server_spark.config import SketchConfig
from datasketches_server_spark.functions.sketches import (
    deserialize_sketch,
    query_distinct,
    query_frequency,
    query_quantiles,
    serialize_sketch,
    sketch_merge,
    sketch_status,
    sketch_update,
    theta_set_ops,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").persist()


def test_theta_distinct_estimate_and_bounds(spark, events):
    state = sketch_update(events, ["event_type"], "user_id", "theta")
    out = {r["event_type"]: r for r in query_distinct(state, "theta").collect()}
    truth = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()
    }
    for et, want in truth.items():
        got = out[et]
        assert got["estimate"] == pytest.approx(want, rel=0.02)
        assert got["lb_2"] <= want <= got["ub_2"]


def test_hll_estimate_tolerance(spark, events):
    state = sketch_update(events, [], "user_id", "hll")
    est = query_distinct(state, "hll").collect()[0]["estimate"]
    truth = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert est == pytest.approx(truth, rel=0.05)


def test_merge_equals_whole(spark, events):
    """The reference's core property (MergeHandler.java:238-369): merging
    per-partition sketches == sketching the whole stream."""
    whole = sketch_update(events, [], "user_id", "theta")
    parts = sketch_update(events, ["event_type"], "user_id", "theta")
    merged = sketch_merge(parts.select("sketch"), "theta")
    e1 = whole.select(F.theta_sketch_estimate("sketch").alias("e")).collect()[0]["e"]
    e2 = merged.select(F.theta_sketch_estimate("sketch").alias("e")).collect()[0]["e"]
    assert e1 == e2


def test_theta_set_operations(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") < 600).alias("in_a"), (F.col("id") >= 400).alias("in_b")
    )
    a = df.where("in_a").agg(F.theta_sketch_agg("id", 12).alias("s")).collect()[0]["s"]
    b = df.where("in_b").agg(F.theta_sketch_agg("id", 12).alias("s")).collect()[0]["s"]
    one = spark.createDataFrame([(bytearray(a), bytearray(b))], "a binary, b binary")
    ops = theta_set_ops(F.col("a"), F.col("b"))
    row = one.select(*[v.alias(k) for k, v in ops.items()]).collect()[0]
    assert row["union"] == 1000
    assert row["intersection"] == 200  # [400, 600)
    assert row["difference"] == 400    # [0, 400)


def test_kll_quantiles_cdf_pmf(spark, events):
    state = sketch_update(events, [], "value", "kll")
    out = query_quantiles(
        state, fractions=(0.5,), split_points=(50.0, 100.0), result_type="pmf"
    ).collect()[0]
    exact_median = events.select(F.expr("percentile(value, 0.5)")).collect()[0][0]
    n = events.count()
    assert out["stream_length"] == n
    # KLL k=200 normalized rank error ~1.65%; allow 5% rank slack via value tolerance
    assert out["quantiles"][0] == pytest.approx(exact_median, rel=0.1)
    assert len(out["cdf"]) == 2 and len(out["pmf"]) == 3
    assert sum(out["pmf"]) == pytest.approx(1.0, abs=1e-6)
    exact_cdf0 = events.where(F.col("value") <= 50.0).count() / n
    assert out["cdf"][0] == pytest.approx(exact_cdf0, abs=0.05)


def test_frequency_exact_topk(spark, events):
    state = sketch_update(events, [], "event_type", "frequency")
    out = query_frequency(state, top_k=3).collect()
    truth = (
        events.groupBy("event_type").count().orderBy(F.desc("count"), "event_type").limit(3).collect()
    )
    assert [(r["event_type"], r["estimate"]) for r in out] == [
        (r["event_type"], float(r["count"])) for r in truth
    ]
    assert all(r["lower_bound"] == r["estimate"] == r["upper_bound"] for r in out)


def test_reservoir_and_varopt_samples(spark, events):
    cfg = SketchConfig(sample_k=16)
    res = sketch_update(events, ["event_type"], "user_id", "reservoir", cfg).collect()
    for r in res:
        assert 1 <= len(r["items"]) <= 16
        assert r["stream_n"] > 0
    vo = sketch_update(events, [], "event_type", "varopt", cfg, weight_col="value").collect()[0]
    assert 1 <= len(vo["items"]) <= 16
    assert vo["stream_weight"] > 0
    # determinism: same input -> same sample
    vo2 = sketch_update(events, [], "event_type", "varopt", cfg, weight_col="value").collect()[0]
    assert [i["item"] for i in vo["items"]] == [i["item"] for i in vo2["items"]]


def test_sample_merge_equals_whole(spark, events):
    """#20/#21: merging per-group bottom-k samples == sampling the whole
    stream (keys give a global total order, so bottom-k is exact)."""
    cfg = SketchConfig(sample_k=16)
    whole = sketch_update(events, [], "user_id", "reservoir", cfg).collect()[0]
    parts = sketch_update(events, ["event_type"], "user_id", "reservoir", cfg)
    merged = sketch_merge(parts.drop("event_type"), "reservoir", (), cfg).collect()[0]
    assert list(merged["items"]) == list(whole["items"])
    assert merged["stream_n"] == whole["stream_n"]

    vwhole = sketch_update(events, [], "event_type", "varopt", cfg, weight_col="value").collect()[0]
    vparts = sketch_update(events, ["user_id"], "event_type", "varopt", cfg, weight_col="value")
    vmerged = sketch_merge(vparts.drop("user_id"), "varopt", (), cfg).collect()[0]
    assert [i["item"] for i in vmerged["items"]] == [i["item"] for i in vwhole["items"]]
    assert vmerged["stream_weight"] == pytest.approx(vwhole["stream_weight"])


def test_occurrence_sampling_multiplicity(spark):
    """Reference semantics (UpdateHandler.java:166-185): reservoir/varopt
    sample stream OCCURRENCES, not distinct items -- a duplicate-heavy
    stream must be able to sample the same item more than once when a
    row identity is provided."""
    rows = [(i, "hot" if i < 900 else f"cold{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "row_id long, item string")
    cfg = SketchConfig(sample_k=16)
    res = sketch_update(df, [], "item", "reservoir", cfg, row_key_col="row_id").collect()[0]
    # 90% of occurrences are 'hot': expected ~14.4 of 16 sampled slots
    n_hot = sum(1 for it in res["items"] if it == "hot")
    assert n_hot >= 8, f"occurrence sampling broken: {n_hot}/16 hot"
    assert res["stream_n"] == 1000
    vo = sketch_update(
        df.withColumn("w", F.lit(1.0)), [], "item", "varopt", cfg,
        weight_col="w", row_key_col="row_id",
    ).collect()[0]
    n_hot_vo = sum(1 for it in vo["items"] if it["item"] == "hot")
    assert n_hot_vo >= 8


def test_varopt_priority_subset_sum(spark):
    """Duffield-Lund-Thorup estimator: sum of adjusted weights
    max(w_i, tau) over the sample estimates the total stream weight
    (near-optimal subset-sum sampling -- the role VarOpt plays in
    DataQueryHandler.java:349-361)."""
    from datasketches_server_spark.functions.sketches import query_sampling

    rows = [(i, f"it{i}", 1.0 + (i * 37 % 100) / 10.0) for i in range(5000)]
    df = spark.createDataFrame(rows, "row_id long, item string, w double")
    k = 64
    state = sketch_update(
        df, [], "item", "varopt", SketchConfig(sample_k=k),
        weight_col="w", row_key_col="row_id",
    )
    out = query_sampling(state, "varopt", k).collect()
    assert len(out) == k
    total = df.agg(F.sum("w")).collect()[0][0]
    est = sum(r["adjusted_weight"] for r in out)
    assert est == pytest.approx(total, rel=0.35)  # k=64: RSE ~ 1/sqrt(k-1)
    assert all(r["adjusted_weight"] >= r["weight"] - 1e-12 for r in out)
    assert all(r["tau"] > 0 for r in out)  # estimation mode (n >> k)
    # exact mode: stream shorter than k+1 -> tau=0, weights unadjusted
    small = sketch_update(
        df.limit(10), [], "item", "varopt", SketchConfig(sample_k=k),
        weight_col="w", row_key_col="row_id",
    )
    sm = query_sampling(small, "varopt", k).collect()
    assert len(sm) == 10
    assert all(r["tau"] == 0.0 and r["adjusted_weight"] == r["weight"] for r in sm)


def test_hll_exact_mode_small_stream(spark):
    """Reference parity (DataQueryHandler.java:144-162): in the exact
    (coupon) regime HLL reports estimation_mode=false and collapsed
    bounds."""
    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    state = sketch_update(df, [], "v", "hll")
    row = query_distinct(state, "hll").collect()[0]
    assert row["estimation_mode"] is False
    assert row["lb_1"] == row["estimate"] == row["ub_3"]
    big = sketch_update(
        spark.range(200_000).select(F.col("id").cast("string").alias("v")), [], "v", "hll"
    )
    brow = query_distinct(big, "hll").collect()[0]
    assert brow["estimation_mode"] is True
    assert brow["lb_1"] < brow["estimate"] < brow["ub_1"]


def test_cms_bounds_and_merge(spark, events):
    """Sketched frequency tier: CMS estimates are upper bounds on exact
    counts (no false negatives), with the classic ~2N/width error band;
    merging partition sketches equals sketching the whole stream."""
    from datasketches_server_spark.functions.cms import (
        cms_estimate,
        cms_merge,
        cms_update,
    )

    depth, width = 4, 128
    cells = cms_update(events, "user_id", depth=depth, width=width)
    exact = events.groupBy("user_id").agg(F.count("*").alias("n"))
    est = cms_estimate(cells, exact.select("user_id"), "user_id", depth, width)
    joined = exact.join(est, "user_id").collect()
    n_total = events.count()
    for r in joined:
        assert r["cms_estimate"] >= r["n"], "CMS must never underestimate"
        assert r["cms_estimate"] <= r["n"] + 2 * n_total / width * 4
    # merge property: per-partition cells summed == whole-stream cells
    parts = cms_update(events, "user_id", depth=depth, width=width, group_cols=["event_type"])
    merged = cms_merge(parts.drop("event_type"))
    assert merged.exceptAll(cells).count() == 0
    assert cells.exceptAll(merged).count() == 0
    # unseen probe estimates 0
    ghost = spark.createDataFrame([(10**12,)], "user_id long")
    g = cms_estimate(cells, ghost, "user_id", depth, width).collect()[0]
    assert g["cms_estimate"] >= 0


def test_serialize_roundtrip(spark, events):
    state = sketch_update(events, ["event_type"], "user_id", "theta")
    img = serialize_sketch(state, "theta")
    back = deserialize_sketch(img)
    a = query_distinct(state, "theta").select("event_type", "estimate")
    b = query_distinct(back.select("event_type", "sketch"), "theta").select("event_type", "estimate")
    assert a.exceptAll(b).count() == 0


def test_status_lists_sketches(spark, events):
    state = sketch_update(events, ["event_type"], "user_id", "theta")
    rows = sketch_status(state, "theta", ["event_type"]).collect()
    assert len(rows) == state.count()
    assert all(r["family"] == "theta" for r in rows)


def test_metric_tables_rollup(spark):
    from datasketches_server_spark.config import DEFAULT_CONFIG
    from datasketches_server_spark.plans.metrics import (
        cluster_metrics,
        global_rollup,
        shingle_metrics,
        simscore_metrics,
    )
    from datasketches_server_spark.plans.pipeline import dedup_pipeline
    from datasketches_server_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=200, seed=5)
    res = dedup_pipeline(t, DEFAULT_CONFIG)
    sh = shingle_metrics(res.conv_state, DEFAULT_CONFIG)
    ss = simscore_metrics(res.edges, DEFAULT_CONFIG)
    cl = cluster_metrics(res.clusters, DEFAULT_CONFIG)
    row = global_rollup(sh, ss, cl, DEFAULT_CONFIG).collect()[0]
    exact_shingles = res.conv_state.select(F.explode("shingles").alias("s")).select(
        F.countDistinct("s")
    ).collect()[0][0]
    exact_clusters = res.clusters.select(F.countDistinct("cluster_id")).collect()[0][0]
    assert row["distinct_shingles"] == pytest.approx(exact_shingles, rel=0.05)
    assert row["approx_clusters"] == pytest.approx(exact_clusters, rel=0.05)
    assert row["n_convs"] == 200
    qs = row["jaccard_quantiles"]
    assert all(0.0 <= q <= 1.0 for q in qs) and qs[0] <= qs[1] <= qs[2]


def test_hll_bounds_coverage_across_boundary(spark):
    """Exact/estimation boundary property (round-3 task #7 + ADVICE):
    sweep n across the coupon-promotion region (k/8 .. 4k for lg_k=8)
    and assert the reported 3-sigma bounds always bracket the truth and
    the exact-mode collapse (lb==ub) only ever fires when the estimate
    really is exact.  The k/8 gate must keep 2x margin below the ~k/4
    HLL_4 promotion point."""
    lg_k = 8
    k = 2**lg_k
    cfg = SketchConfig(hll_lg_k=lg_k)
    for n in (k // 8 - 4, k // 4, k // 2, k, 2 * k, 4 * k):
        df = spark.range(n).select(F.col("id"))
        state = sketch_update(df, [], "id", "hll", cfg)
        row = query_distinct(state, "hll", cfg).collect()[0]
        assert row["lb_3"] - 2 <= n <= row["ub_3"] + 2, (n, dict(row.asDict()))
        if not row["estimation_mode"]:
            # collapsed bounds are only legitimate when truly exact
            assert row["estimate"] == pytest.approx(n, abs=2), (n, row["estimate"])


def test_theta_bounds_coverage_across_boundary(spark):
    lg_k = 8
    k = 2**lg_k
    cfg = SketchConfig(theta_lg_k=lg_k)
    for n in (k // 4, k // 2, k, 2 * k, 4 * k, 16 * k):
        df = spark.range(n).select(F.col("id"))
        state = sketch_update(df, [], "id", "theta", cfg)
        row = query_distinct(state, "theta", cfg).collect()[0]
        assert row["lb_3"] - 2 <= n <= row["ub_3"] + 2, (n, dict(row.asDict()))
        if not row["estimation_mode"]:
            assert row["estimate"] == pytest.approx(n, abs=2)


def test_exactsubstr_metric_table_batch_incremental_parity(spark, tmp_path):
    """The ExactSubstr metric table accepts both the batch coverage
    relation and the incremental window-index read; per-bucket rows are
    mergeable to one global row, and the two paths roll up identically
    (they compute the same coverage relation)."""
    from datasketches_server_spark.config import DEFAULT_CONFIG
    from datasketches_server_spark.operators.dedup import cross_doc_duplicate_coverage
    from datasketches_server_spark.plans import window_index as WI
    from datasketches_server_spark.plans.metrics import (
        exactsubstr_metrics,
        exactsubstr_rollup,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " * 3 + f"tail{i % 4}")
         for i in range(20)],
        "doc_id long, text string",
    )
    batch_cov = cross_doc_duplicate_coverage(docs, window=8, exact=False)

    wd = str(tmp_path / "windex")
    WI.write_window_index(docs.where("doc_id % 4 != 0"), wd)
    WI.absorb_batch(spark, docs.where("doc_id % 4 = 0"), wd, chain=["base"], batch_fp="b1")
    inc_cov = WI.read_coverage(spark, wd, chain=["base", "b1"])

    def roll(cov):
        return exactsubstr_rollup(
            exactsubstr_metrics(cov, DEFAULT_CONFIG), DEFAULT_CONFIG
        ).collect()[0]

    rb, ri = roll(batch_cov), roll(inc_cov)
    assert rb["n_docs"] == ri["n_docs"] == 20
    assert rb["dup_tokens"] == ri["dup_tokens"] > 0
    assert rb["total_tokens"] == ri["total_tokens"]
    assert list(rb["dup_frac_quantiles"]) == list(ri["dup_frac_quantiles"])
    qs = rb["dup_frac_quantiles"]
    assert all(0.0 <= q <= 1.0 for q in qs) and qs[0] <= qs[1] <= qs[2]
