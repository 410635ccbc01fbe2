"""Cross-engine agreement: our MinHash/LSH dedup kernel vs Spark MLlib's
independently-authored MinHashLSH on the identical shingle sets.

Every other correctness gate in this repo replays OUR definitions (the
DuckDB oracles re-express the same shingling/banding in SQL), so a
definitional bug that survived translation would pass them.  MLlib's
``pyspark.ml.feature.MinHashLSH`` shares no code or definitions with
this engine -- different permutation family, OR-amplified single-row
hash tables instead of b x r banding, vector features instead of hashed
shingle arrays.  After exact-jaccard re-verification the two engines
must surface the SAME pair set in the high-recall region (J >= 0.75,
where both sides' candidate probability exceeds 0.9999), which makes
this the one gate that would catch a silently-wrong jaccard or a
banding layer that stopped surfacing candidates.

Determinism: fixed corpus seed, fixed MinHashLSH seed, exact-jaccard
post-filters on BOTH sides -- the comparison is between two exact pair
sets, LSH randomness only decides candidate surfacing (overwhelmingly
sure in this region), so the assertion is stable run-to-run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datasketches_server_spark.config import DEFAULT_CONFIG
from datasketches_server_spark.plans.pipeline import dedup_pipeline
from datasketches_server_spark.sources.synth import synth_transcripts

# comfortably above the pipeline's 0.7 threshold: candidate probability
# at J=0.75 is 1-(1-0.75^4)^32 ~ 0.99999 for our b=32 x r=4 banding and
# 1-0.25^12 ~ 1-6e-8 for MLlib's 12 OR-ed tables
AGREE_J = 0.75
EPS = 1e-9


def test_mllib_minhashlsh_agrees_on_verified_pairs(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=300, seed=11)
    result = dedup_pipeline(transcripts, cfg)

    ours = {
        (r["a"], r["b"])
        for r in result.edges.where(F.col("jaccard") >= AGREE_J - EPS).collect()
    }

    # identical shingle sets, re-expressed as exact-vocabulary binary
    # vectors (CountVectorizer, not HashingTF: no index collisions, so
    # MLlib's jaccard distance is exact on the same sets we verify)
    docs = (
        result.conv_state.where(F.size("shingles") > 0)
        .select(
            "conv_id",
            F.transform("shingles", lambda x: x.cast("string")).alias("toks"),
        )
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="features", binary=True, minDF=1.0
    ).fit(docs)
    feats = cv.transform(docs).select("conv_id", "features")

    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=12, seed=77
    ).fit(feats)
    # join wide enough for BOTH tiers (native threshold 0.7 => jd <= 0.3)
    joined = mh.approxSimilarityJoin(
        feats, feats, threshold=1.0 - cfg.lsh.jaccard_threshold + 1e-6, distCol="jd"
    ).persist()
    theirs = {
        (r["a"], r["b"])
        for r in joined.select(
            F.col("datasetA.conv_id").alias("a"),
            F.col("datasetB.conv_id").alias("b"),
            "jd",
        )
        .where((F.col("a") < F.col("b")) & (F.col("jd") <= 1.0 - AGREE_J + EPS))
        .collect()
    }

    assert ours == theirs, (
        f"engines disagree at J>={AGREE_J}: "
        f"ours-only={sorted(ours - theirs)[:5]} "
        f"mllib-only={sorted(theirs - ours)[:5]} "
        f"(|ours|={len(ours)}, |mllib|={len(theirs)})"
    )
    # the region must be non-trivial for the agreement to mean anything
    assert len(ours) >= 20, f"only {len(ours)} pairs at J>={AGREE_J}"

    # tier 2: cluster partitions at the NATIVE 0.7 threshold -- the
    # BASELINE contract unit ("matching cluster assignments").  MLlib's
    # exact-verified pairs at J>=0.7 are union-found driver-side and the
    # multi-member families must equal ours.
    from datasketches_server_spark.plans.oracle import union_find_clusters

    thr = cfg.lsh.jaccard_threshold
    ml_pairs = [
        (r["a"], r["b"])
        for r in joined.select(
            F.col("datasetA.conv_id").alias("a"),
            F.col("datasetB.conv_id").alias("b"),
            "jd",
        )
        .where((F.col("a") < F.col("b")) & (F.col("jd") <= 1.0 - thr + EPS))
        .collect()
    ]
    ml_label = union_find_clusters(ml_pairs)
    ml_fams: dict[str, set[str]] = {}
    for conv, root in ml_label.items():
        ml_fams.setdefault(root, set()).add(conv)
    our_fams: dict[str, set[str]] = {}
    for r in result.clusters.collect():
        our_fams.setdefault(r["cluster_id"], set()).add(r["conv_id"])
    want = {frozenset(m) for m in ml_fams.values() if len(m) >= 2}
    got = {frozenset(m) for m in our_fams.values() if len(m) >= 2}
    assert got == want, (
        f"cluster partitions diverge: ours-only={len(got - want)} "
        f"mllib-only={len(want - got)} families"
    )
