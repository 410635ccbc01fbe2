"""Physical-plan assertions: the plan we'd want at 100 TB, not just the
first one that passes (task brief: explain + iterate).

Checks: parquet filter pushdown + column pruning, broadcast joins for
small dims, exactly one Python (Arrow) evaluation of the signature UDF,
and no cartesian products anywhere in the pipeline."""

from __future__ import annotations

import contextlib
import io

from datasketches_server_spark.plans import queries as Q
from datasketches_server_spark.plans.pipeline import dedup_pipeline
from datasketches_server_spark.sources.synth import synth_transcripts


def plan_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark, sf_dir):
    p = plan_str(Q.q01_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read, "column pruning failed: reading unused columns"
    assert "l_partkey" not in read


def test_q02_broadcasts_small_dims(spark, sf_dir):
    p = plan_str(Q.q02_top_revenue_customers(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p  # dims must not trigger a sort-merge


def test_signature_state_reused_from_cache(spark):
    """verify_pairs references conv_state three times (bucketing + both
    join sides); the default pipeline persists it so the signature UDF
    runs once into cache instead of 3x (InMemoryTableScan in the plan)."""
    t = synth_transcripts(spark, n_convs=50, seed=1)
    res = dedup_pipeline(t)  # cache_state=True default
    p = plan_str(res.edges, "simple")
    assert p.count("InMemoryTableScan") >= 3, "conv_state not cache-reused"
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p  # no row-at-a-time Python anywhere
    res.conv_state.unpersist()

    # uncached composition recomputes the subtree once per state
    # reference (banding/sizes/verify sides) -- documented tradeoff that
    # motivates the cache/persist default
    res2 = dedup_pipeline(t, cache_state=False)
    p2 = plan_str(res2.edges, "simple")
    assert p2.count("ArrowEvalPython") >= 3


def test_clusters_plan_has_no_python(spark):
    """Everything after signatures is native: clusters plan contains no
    Python eval beyond the single signature UDF."""
    t = synth_transcripts(spark, n_convs=50, seed=1)
    res = dedup_pipeline(t, cache_state=False)
    p = plan_str(res.clusters, "simple")
    assert "BatchEvalPython" not in p


def test_cms_plan_partial_aggregation(spark, sf_dir):
    """CMS update must map-side combine (partial HashAggregate before the
    shuffle) and stay fully codegen'd -- the property that makes the
    sketched frequency tier scale."""
    from datasketches_server_spark.functions.cms import cms_update

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = plan_str(cms_update(e, "user_id", depth=4, width=256))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2, "no map-side partial aggregation"
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "props" not in read, "column pruning failed"


def test_ann_candidates_shuffle_narrow_rows(spark, sf_dir):
    """ANN candidate generation must not carry embeddings through the
    bucket join -- only (id, table, code) longs shuffle; vectors rejoin
    at the rerank."""
    from pyspark.sql import functions as F
    from datasketches_server_spark.operators.similarity import ann_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann_topk(e.where(F.col("vec_id") != 0), e.where(F.col("vec_id") == 0), k=10)
    p = plan_str(out)
    assert "CartesianProduct" not in p
    # exactly two code-UDF evaluations (data side + query side -- each
    # node prints twice in formatted mode: tree line + detail header);
    # the rerank joins embeddings natively
    import re

    assert len(re.findall(r"^\(\d+\) ArrowEvalPython", p, re.M)) == 2, p.count("ArrowEvalPython")
    assert "BatchEvalPython" not in p


def test_q24_exact_oracle_plan_no_cartesian(spark, sf_dir):
    """The q24-proven pipeline must never degrade to a cartesian."""
    p = plan_str(Q.q24_dedup_clusters_documents(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_incremental_candidates_plan_broadcasts_touched_probe(spark):
    """Round-4 task #1 plan shape: the old band index must be filtered
    with a BROADCAST semi join on the new batch's touched buckets (one
    scan of the index, no corpus shuffle), no Python, no cartesian."""
    from pyspark.sql import functions as F

    from datasketches_server_spark.config import DEFAULT_CONFIG
    from datasketches_server_spark.operators.lsh import (
        band_buckets,
        incremental_candidate_pairs,
    )
    from datasketches_server_spark.plans.pipeline import conv_signatures

    t = synth_transcripts(spark, n_convs=200, seed=3)
    is_new = F.pmod(F.xxhash64("conv_id"), F.lit(5)) == 0
    old_b = band_buckets(conv_signatures(t.where(~is_new), DEFAULT_CONFIG))
    new_b = band_buckets(conv_signatures(t.where(is_new), DEFAULT_CONFIG))
    cands = incremental_candidate_pairs(old_b, new_b, DEFAULT_CONFIG.lsh)
    p = plan_str(cands)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, "touched-bucket probe not broadcast"
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_incremental_verify_member_filter_pushes_to_scan(spark, tmp_path):
    """Round-4: when the batch's member set is small, the fat-state
    prune must reach the parquet scan as a pushed In filter (row-group
    skipping -> batch-scaled read), not a semi-join that scans the
    whole state."""
    from pyspark.sql import functions as F

    from datasketches_server_spark.config import DEFAULT_CONFIG
    from datasketches_server_spark.plans.pipeline import (
        conv_signatures,
        member_pushdown_state,
    )

    t = synth_transcripts(spark, n_convs=150, seed=3)
    state_path = str(tmp_path / "state")
    conv_signatures(t, DEFAULT_CONFIG).write.parquet(state_path)
    state = spark.read.parquet(state_path)

    pairs = spark.createDataFrame(
        [("c0000001", "c0000002"), ("c0000003", "c0000004")], "a string, b string"
    ).persist()
    pairs.count()
    pruned, pushed = member_pushdown_state(pairs, state, threshold=100)
    assert pushed
    p = plan_str(pruned.select("conv_id", "shingles"))
    pf = next(l for l in p.splitlines() if "PushedFilters" in l)
    assert "In(conv_id" in pf, pf
    pairs.unpersist()

    # above the threshold the caller falls back to the semi-join path
    _, pushed2 = member_pushdown_state(pairs, state, threshold=1)
    assert not pushed2


def test_decontaminate_plan_broadcasts_eval_grams(spark, sf_dir):
    """Curation family plan shape (q39): the eval-gram side is a small
    benchmark suite, so it must reach the training side as a broadcast
    (the training corpus never shuffles text at 100 TB), the per-doc
    rollup must map-side combine, and the scan must prune to the two
    used columns.  All native -- no Python eval anywhere."""
    p = plan_str(Q.q39_decontamination(spark, sf_dir))
    assert "BroadcastHashJoin" in p, "eval grams not broadcast"
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2, "no map-side partial aggregation"
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "embedding" not in read and "lang" not in read, read


def test_stratified_sample_two_phase_bounds_final_sort(spark, sf_dir):
    """q41's two-phase top-k: phase 1 ranks inside (stratum, salt
    bucket), phase 2 over survivors only -- the plan must contain BOTH
    window sorts (the property that bounds any single task's sort input
    to k x partial_buckets rows per stratum at corpus scale)."""
    import re

    p = plan_str(Q.q41_stratified_sample(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Window$", p, re.M)) == 2, "two-phase rank collapsed"
    # Spark additionally pushes a WindowGroupLimit below each phase's
    # sort (partial rank-limit before the exchange) -- keep that too
    assert len(re.findall(r"^\(\d+\) WindowGroupLimit$", p, re.M)) == 4
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_incremental_components_plan_no_python_no_cartesian(spark):
    """Delta CC contraction is pure native joins over narrow label rows."""
    from datasketches_server_spark.operators.components import incremental_components

    old = spark.createDataFrame(
        [(f"c{i}", f"c{i - i % 2}") for i in range(40)],
        "conv_id string, cluster_id string",
    )
    edges = spark.createDataFrame(
        [("c1", "c2"), ("c5", "c9")], "a string, b string"
    )
    labels = incremental_components(old, edges)
    p = plan_str(labels)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed by the same key/count sort-merge-join with
    ZERO shuffle on either side -- the co-located-join contract
    write_bucketed exists for (incremental state re-joined per batch)."""
    from datasketches_server_spark.sources.io import write_bucketed

    old_ab = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 10_000).selectExpr(
            "cast(id as string) conv_id", "id * 2 as v"
        )
        right = spark.range(0, 10_000, 3).selectExpr(
            "cast(id as string) conv_id", "id * 7 as w"
        )
        write_bucketed(left, "bkt_left", ["conv_id"], n_buckets=8)
        write_bucketed(right, "bkt_right", ["conv_id"], n_buckets=8)
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "conv_id")
        plan = plan_str(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 3334
        # control: the same join from plain parquet DOES shuffle
        left.write.mode("overwrite").parquet(str(tmp_path / "pl"))
        right.write.mode("overwrite").parquet(str(tmp_path / "pr"))
        jp = spark.read.parquet(str(tmp_path / "pl")).join(
            spark.read.parquet(str(tmp_path / "pr")), "conv_id"
        )
        assert "Exchange" in plan_str(jp)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_ab)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_containment_plan_shape(spark):
    """q67 family: no cartesian, no Python eval; the df_cap hot-gram
    anti-join broadcasts its (small) hot side."""
    from pyspark.sql import functions as F

    from datasketches_server_spark.operators.dedup import containment_pairs

    df = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("common words"), F.col("id").cast("string")).alias("text"),
    )
    p = plan_str(containment_pairs(df, threshold=0.5, df_cap=10), "simple")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" not in p
    # the anti-join against hot grams must be the broadcast variant
    assert "LeftAnti, BuildRight" in p or "BroadcastHashJoin" in p


def test_token_budget_plan_no_global_doc_window(spark):
    """The per-doc running sum must be PARTITIONED (boundary bucket
    only); the only unpartitioned window runs over quality buckets.
    Concretely: no Window whose child sorts by doc columns globally --
    we assert the doc-level window carries a hash partitioning."""
    from pyspark.sql import functions as F

    from datasketches_server_spark.operators.curation import token_budget_select

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"w{j}"), (F.col("id") % 7).cast("string")) for j in range(12)]
        ).alias("text"),
    )
    p = plan_str(token_budget_select(df, 0.5), "simple")
    assert "BatchEvalPython" not in p
    import re

    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", p)
    # every Window spec string: doc-level cum sum must include a
    # partition spec (quality), i.e. no window both orders by doc_id and
    # lacks a partition column
    for spec in wins:
        if "doc_id" in spec:
            assert "quality" in spec, f"global doc-order window found: {spec}"


def test_retract_plan_broadcast_anti_joins(spark):
    """Retraction's store rewrites must be broadcast anti-joins of the
    (small) removal set -- no shuffled anti-join of the corpus, no
    cartesian, no Python eval.  The affected-cluster semi-joins
    broadcast too."""
    from pyspark.sql import functions as F

    from datasketches_server_spark.plans.retract import retract_convs

    n = 400
    state = spark.range(n).select(F.col("id").cast("string").alias("conv_id"), F.lit(1).alias("sig"))
    edges = spark.range(n - 1).select(
        F.col("id").cast("string").alias("a"), (F.col("id") + 1).cast("string").alias("b")
    ).where(F.col("id") % 3 == 0)
    clusters = state.select("conv_id", F.col("conv_id").alias("cluster_id"))
    rm = spark.range(5).select(F.col("id").cast("string").alias("conv_id"))
    state2, edges2, _ = retract_convs(state, edges, clusters, rm)
    for df in (state2, edges2):
        p = plan_str(df, "simple")
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "BroadcastHashJoin LeftAnti" in p.replace("  ", " ") or (
            "LeftAnti, BuildRight" in p
        ), p
        # a shuffled (SortMerge) anti-join of the corpus would defeat
        # the narrow-scan contract
        assert "SortMergeJoin LeftAnti" not in p, p


def test_transcript_analytics_plans(spark, sf_dir):
    """q90/q91 broadcast the (conv -> source) dim and stay JVM-side;
    q92's dropped-set anti-join broadcasts the small side."""
    for q in (Q.q90_tool_motifs, Q.q91_dialog_balance):
        p = plan_str(q(spark, sf_dir))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p
        assert "ArrowEvalPython" not in p  # fully native, no UDFs at all
    p = plan_str(Q.q92_dedup_shard_manifest(spark, sf_dir))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_corpus_diagnostics_plans(spark, sf_dir):
    """q94-q97 stay JVM-native (the q94 edge list comes from the memoized
    pipeline whose one Arrow UDF is the signature kernel) and never
    cartesian; q97's source-pair join keys on the window, not a cross."""
    for q in (
        Q.q95_turn_position_dup_profile,
        Q.q96_prompt_response_divergence,
        Q.q97_cross_source_substr_leakage,
    ):
        p = plan_str(q(spark, sf_dir))
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p
        assert "ArrowEvalPython" not in p  # fully native, no UDFs at all
    p = plan_str(Q.q94_dup_rate_timeseries(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_allpairs_ssjoin_plan(spark, sf_dir):
    """q111 must stay JVM-side (no Python), never cartesian, and prune
    the documents scan to (doc_id, text)."""
    p = plan_str(Q.q111_allpairs_ssjoin(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "lang" not in read and "n_chars" not in read


def test_winnowing_plan_single_window_partition(spark, sf_dir):
    """q127's running min must run inside the per-doc partition (one
    Window over doc_id, no global window) and stay JVM-side."""
    p = plan_str(Q.q127_winnowing_pairs(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the window spec partitions by id -- a global (unpartitioned)
    # window would serialize the corpus through one task
    assert "Window" in p
    assert "partitionBy=[]" not in p.replace(" ", "")


def test_role_gram_divergence_broadcasts_source_dim(spark, sf_dir):
    p = plan_str(Q.q125_role_gram_divergence(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_mix_weights_broadcasts_totals(spark, sf_dir):
    """q116's normalization total is one row -- it must broadcast, and
    the corpus scan must prune to (source, text)."""
    p = plan_str(Q.q116_source_mix_weights(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "doc_id" not in read and "lang" not in read
