"""Stage-level isolation bench (guide section 1.4): times each expensive
query's sub-stages with the noop sink so the computation, not the sink or
the composition, is measured.  NOT the artifact of record -- bench.py is
frozen; this file exists so OPTIMIZATION_r06.md can cite per-stage
numbers.  Usage: python bench_extra.py [dedup|q111|q127|prefix|incr|docs|substr|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from datasketches_server_spark.config import PipelineConfig, ShingleConfig
from datasketches_server_spark.session import get_spark
from datasketches_server_spark.sources.synth import (
    synth_transcripts,
    transcripts_from_documents,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

timings: dict[str, float] = {}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn):
    spark = get_spark("bench_extra", cores=CORES)
    spark.sparkContext.setJobDescription(name)
    t0 = time.monotonic()
    out = fn()
    timings[name] = round(time.monotonic() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"  {name}: {timings[name]}", file=sys.stderr)
    return out


def bench_dedup_synth():
    spark = get_spark("bench_extra", cores=CORES)
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    transcripts = synth_transcripts(spark, n_convs=n_convs, seed=42).persist()
    transcripts.count()
    cfg = PipelineConfig()

    from datasketches_server_spark.plans.pipeline import conv_signatures, dedup_pipeline
    from datasketches_server_spark.operators.lsh import band_buckets, candidate_pairs, verify_pairs
    from datasketches_server_spark.operators.components import attach_singletons, connected_components

    # stage 1: signatures (assemble + fused UDF), materialized to cache
    state = conv_signatures(transcripts, cfg)
    state = state.persist()
    timed("1_signatures_materialize", lambda: state.count())

    # stage 2: banding + candidate pairs (windows + self-join + distinct)
    resources: list = []
    buckets = band_buckets(state, cfg.lsh)
    cands = candidate_pairs(buckets, cfg.lsh, resources=resources)
    cands = cands.persist()
    timed("2_candidate_pairs", lambda: cands.count())

    # stage 2b: the auto-prune member count
    timed(
        "2b_member_count",
        lambda: cands.select(F.col("a").alias("m"))
        .union(cands.select(F.col("b").alias("m")))
        .agg(F.countDistinct("m").alias("n"))
        .collect(),
    )

    # stage 3: verify join (exact jaccard over shingle arrays)
    edges = verify_pairs(cands, state, cfg.lsh, tier="exact", prune_members=False)
    edges = edges.persist()
    timed("3_verify_edges", lambda: edges.count())

    # stage 4: connected components + attach + distinct count
    labels = timed("4_connected_components", lambda: connected_components(edges))
    clusters = attach_singletons(labels, state)
    timed("5_cluster_count", lambda: clusters.select("cluster_id").distinct().count())

    # full pipeline as the bench runs it, for comparison
    for df in resources:
        df.unpersist()
    edges.unpersist()
    cands.unpersist()
    state.unpersist()

    def full():
        res = dedup_pipeline(transcripts, PipelineConfig())
        res.clusters.select("cluster_id").distinct().count()
        return res

    res = timed("6_full_pipeline_e2e", full)

    from datasketches_server_spark.plans.metrics import (
        cluster_metrics, global_rollup, shingle_metrics, simscore_metrics,
    )

    timed(
        "7_sketch_rollup",
        lambda: global_rollup(
            shingle_metrics(res.conv_state),
            simscore_metrics(res.edges),
            cluster_metrics(res.clusters),
        ).collect(),
    )
    res.unpersist()
    transcripts.unpersist()


def bench_q111():
    spark = get_spark("bench_extra", cores=CORES)
    from datasketches_server_spark.functions.portable import word_grams
    from datasketches_server_spark.functions.text import tokens
    from pyspark.sql import Window

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    g = d.select(
        F.col("doc_id").alias("id"),
        F.explode(word_grams(tokens(F.col("text")), 3)).alias("gram"),
    )
    # cost of ONE tokenize+gram+explode pass
    timed("q111_1_gram_explode_once", lambda: noop(g))
    dfreq = g.groupBy("gram").agg(F.count("*").alias("df"))
    timed("q111_2_dfreq", lambda: noop(dfreq))
    sz = g.groupBy("id").agg(F.count("*").alias("n"))
    wrk = Window.partitionBy("id").orderBy("df", "gram")
    ranked = g.join(dfreq, "gram").withColumn("rnk", F.row_number().over(wrk))
    prefix = (
        ranked.join(sz, "id")
        .where(F.col("rnk") <= F.col("n") - F.expr("(n + 1) div 2") + 1)
        .select("id", "gram")
    )
    timed("q111_3_prefix", lambda: noop(prefix))
    cand = (
        prefix.select(F.col("id").alias("pid"), "gram")
        .join(g.select(F.col("id").alias("qid"), "gram"), "gram")
        .where(F.col("pid") != F.col("qid"))
        .select(F.least("pid", "qid").alias("ida"), F.greatest("pid", "qid").alias("idb"))
        .distinct()
    )
    timed("q111_4_cand", lambda: noop(cand))
    from datasketches_server_spark.plans import queries as Q

    timed("q111_full", lambda: Q.q111_allpairs_ssjoin(spark, SF_DIR).collect())


def bench_q127():
    spark = get_spark("bench_extra", cores=CORES)
    from datasketches_server_spark.functions.portable import md5_long60, word_grams_all
    from datasketches_server_spark.functions.text import tokens
    from pyspark.sql import Window

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    hashed = d.select(
        F.col("doc_id").alias("id"),
        F.posexplode(word_grams_all(tokens(F.col("text")), 3)).alias("pos", "gram"),
    ).select("id", "pos", md5_long60(F.col("gram")).alias("h"))
    timed("q127_1_hashed_once", lambda: noop(hashed))
    m = hashed.groupBy("id").agg(F.max("pos").alias("last_pos"))
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(0, 3)
    fps = (
        hashed.withColumn("wmin", F.min("h").over(w))
        .join(m, "id")
        .where(F.col("pos") <= F.col("last_pos") - 3)
        .select("id", F.col("wmin").alias("fp"))
        .distinct()
    )
    timed("q127_2_fps", lambda: noop(fps))
    from datasketches_server_spark.plans import queries as Q

    timed("q127_full", lambda: Q.q127_winnowing_pairs(spark, SF_DIR).collect())


def bench_prefix():
    spark = get_spark("bench_extra", cores=CORES)
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    transcripts = synth_transcripts(spark, n_convs=n_convs, seed=42).persist()
    transcripts.count()
    from datasketches_server_spark.operators.prefix import (
        turn_prefix_candidates, turn_prefix_pairs, verify_prefix_pairs,
    )

    timed("prefix_1_candidates", lambda: turn_prefix_candidates(transcripts, "index").count())
    cands = turn_prefix_candidates(transcripts, "index")
    timed(
        "prefix_2_verify",
        lambda: verify_prefix_pairs(cands, transcripts, "index").count(),
    )
    timed("prefix_full", lambda: turn_prefix_pairs(transcripts).count())
    transcripts.unpersist()


def bench_docs():
    spark = get_spark("bench_extra", cores=CORES)
    from datasketches_server_spark.plans.pipeline import dedup_pipeline

    def full():
        res = dedup_pipeline(
            transcripts_from_documents(spark, SF_DIR),
            PipelineConfig(shingle=ShingleConfig(k=3)),
        )
        res.clusters.count()
        res.unpersist()

    timed("dedup_documents_full", full)


def bench_substr():
    spark = get_spark("bench_extra", cores=CORES)
    from datasketches_server_spark.operators.dedup import cross_doc_duplicate_coverage

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    timed(
        "exactsubstr_full",
        lambda: cross_doc_duplicate_coverage(d, window=8, exact=False)
        .agg(F.sum("dup_tokens").alias("d"), F.sum("n_tokens").alias("n"))
        .collect(),
    )


def bench_incr():
    import shutil
    import tempfile

    spark = get_spark("bench_extra", cores=CORES)
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    transcripts = synth_transcripts(spark, n_convs=n_convs, seed=42).persist()
    transcripts.count()
    from datasketches_server_spark.plans.band_index import read_band_index, write_band_index
    from datasketches_server_spark.plans.pipeline import dedup_pipeline, incremental_dedup

    cfg = PipelineConfig()
    res = dedup_pipeline(transcripts, cfg)
    res.clusters.select("cluster_id").distinct().count()
    workdir = tempfile.mkdtemp(prefix="bex_bandidx_")
    write_band_index(res.conv_state, workdir, cfg, "bench")

    def run():
        batch = synth_transcripts(
            spark, n_convs=max(50, n_convs // 100), seed=4242
        ).withColumn("conv_id", F.concat(F.lit("inc-"), F.col("conv_id")))
        inc = incremental_dedup(
            res.conv_state, res.edges, batch, cfg,
            old_buckets=read_band_index(spark, workdir, cfg, "bench"),
            old_clusters=res.clusters,
        )
        inc.clusters.select("cluster_id").distinct().count()
        inc.unpersist()

    timed("incremental_full", run)
    shutil.rmtree(workdir, ignore_errors=True)
    res.unpersist()
    transcripts.unpersist()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("bench_extra", cores=CORES)
    spark.range(1000).select(F.xxhash64("id")).count()  # warm
    if which in ("dedup", "all"):
        bench_dedup_synth()
    if which in ("q111", "all"):
        bench_q111()
    if which in ("q127", "all"):
        bench_q127()
    if which in ("prefix", "all"):
        bench_prefix()
    if which in ("incr", "all"):
        bench_incr()
    if which in ("docs", "all"):
        bench_docs()
    if which in ("substr", "all"):
        bench_substr()
    print(json.dumps({"stage_timings": timings, "sf_dir": SF_DIR, "cores": CORES}))


if __name__ == "__main__":
    main()
