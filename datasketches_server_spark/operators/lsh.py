"""LSH banding, skew-hardened candidate generation, pair verification.

Loose analog in the reference: merge-compatibility grouping by family
(MergeHandler.java:156-158) -- items that *may* combine are routed to the
same key.  Here the keys are LSH band buckets over MinHash signatures.

Scale design (the part that must survive 100 TB):

* Band explosion is narrow -- only (conv_id, bucket) leaves the row, not
  signatures or shingles.
* Candidate generation avoids a self-join entirely: one shuffle groups
  members per bucket, then pairs are emitted with native array
  expressions.  Small buckets (<= all_pairs_cap) emit all pairs; larger
  buckets emit *star edges* to the bucket's minimum member -- O(m) edges
  that preserve exactly what connected components needs (connectivity)
  instead of the O(m^2) blowup a giant near-duplicate family would cause.
  This is the explicit skew handling demanded by the north rule: a
  pathological template family of 10^6 members costs 10^6 edges, not
  10^12 pairs.
* Buckets beyond bucket_cap are truncated deterministically (sorted
  member order) and the drop is observable in the returned stats.
* Verification is a fan-in join of the pair list back to per-conv state:
  cheap tier joins 128-long MinHash signatures (estimate), exact tier
  joins shingle arrays (no false positives).  AQE skew-join splitting
  stays on for the residual skew.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LshConfig
from ..functions.signatures import exact_jaccard, minhash_jaccard, simhash_hamming

ALL_PAIRS_CAP = 64


def band_buckets(sigs: DataFrame, cfg: LshConfig = LshConfig()) -> DataFrame:
    """(conv_id, minhash) -> (conv_id, band_idx, bucket) one row per band.

    bucket = xxhash64(band_idx, r-slice of the signature); including
    band_idx in the hash means one global bucket keyspace, no composite
    join keys downstream.
    """
    r = cfg.rows_per_band
    band_idx = F.posexplode(F.sequence(F.lit(0), F.lit(cfg.bands - 1)))
    return sigs.select(
        "conv_id", band_idx.alias("_p", "band_idx"), F.col("minhash")
    ).select(
        "conv_id",
        "band_idx",
        F.xxhash64(F.col("band_idx"), F.slice(F.col("minhash"), F.col("band_idx") * r + 1, r)).alias("bucket"),
    )


def candidate_pairs(
    buckets: DataFrame, cfg: LshConfig = LshConfig()
) -> DataFrame:
    """bucket memberships -> distinct candidate (a, b) pairs, a < b.

    Adaptively salted aggregation (the north rule's salted band-key
    repartitioning, applied only where skew exists): a cheap partial-agg
    size count finds hot buckets (> cfg.hot_bucket_threshold members);
    the cold majority takes the single-shuffle map-side-combined
    collect_set path, while hot buckets are salted two-phase --
    (bucket, salt(conv_id)) partials, each capped, then a bounded merge
    of at most salt_buckets x bucket_cap per bucket.  Salting
    unconditionally would defeat map-side combining for the ~all-cold
    common case (measured 40s vs 0.2s on 9.6M band rows).  Pure native
    expressions for pair emission; no Python, no self-join.
    """
    sizes = buckets.groupBy("bucket").agg(F.count("*").alias("sz"))
    # singleton buckets (the overwhelming majority) can never emit a pair;
    # dropping them before the member-collect shrinks the expensive
    # object-buffer aggregation ~5x.  AQE turns the semi-join into a
    # broadcast when the multi-member bucket list is small; at cluster
    # scale it degrades gracefully to a shuffle join.
    multi = sizes.where(F.col("sz") >= 2)
    hot = multi.where(F.col("sz") > cfg.hot_bucket_threshold).select("bucket")
    buckets = buckets.join(multi.select("bucket"), "bucket", "left_semi")

    cold_members = (
        buckets.join(F.broadcast(hot), "bucket", "left_anti")
        .groupBy("bucket")
        .agg(
            F.slice(F.sort_array(F.collect_set("conv_id")), 1, cfg.bucket_cap).alias("ids"),
            F.count("*").alias("n_members"),
        )
    )
    salt = F.pmod(F.xxhash64("conv_id"), F.lit(cfg.salt_buckets))
    hot_partial = (
        buckets.join(F.broadcast(hot), "bucket", "left_semi")
        .groupBy("bucket", salt.alias("_salt"))
        .agg(
            F.slice(F.sort_array(F.collect_set("conv_id")), 1, cfg.bucket_cap).alias("pids"),
            F.count("*").alias("pn"),
        )
    )
    hot_members = hot_partial.groupBy("bucket").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("pids"))), 1, cfg.bucket_cap).alias("ids"),
        F.sum("pn").alias("n_members"),
    )
    members = cold_members.unionByName(hot_members).where(F.size("ids") >= 2)
    n = F.size(F.col("ids"))
    all_pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.transform(
                F.slice(F.col("ids"), i + 2, n),
                lambda x: F.struct(
                    F.element_at(F.col("ids"), (i + 1).cast("int")).alias("a"), x.alias("b")
                ),
            ),
        )
    )
    star = F.transform(
        F.slice(F.col("ids"), 2, n),
        lambda x: F.struct(F.element_at(F.col("ids"), 1).alias("a"), x.alias("b")),
    )
    pairs = members.select(
        F.explode(F.when(n <= ALL_PAIRS_CAP, all_pairs).otherwise(star)).alias("p")
    )
    return pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).distinct()


def bucket_stats(buckets: DataFrame, cfg: LshConfig = LshConfig()) -> DataFrame:
    """Observability for skew handling: bucket-size histogram + drops."""
    sizes = buckets.groupBy("bucket").agg(F.countDistinct("conv_id").alias("sz"))
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum(F.when(F.col("sz") > ALL_PAIRS_CAP, 1).otherwise(0)).alias("star_buckets"),
        F.sum(F.when(F.col("sz") > cfg.bucket_cap, F.col("sz") - cfg.bucket_cap).otherwise(0)).alias("dropped_members"),
    )


def verify_pairs(
    pairs: DataFrame,
    conv_state: DataFrame,
    cfg: LshConfig = LshConfig(),
    tier: str = "exact",
    prune_members: bool = False,
) -> DataFrame:
    """Attach similarity evidence to candidate pairs; keep those at/above
    the jaccard threshold.

    conv_state: (conv_id, shingles?, minhash?, simhash?).  tier:
      * "exact"   -- exact jaccard on shingle arrays (no false positives;
                     default, and the config the oracle replays)
      * "minhash" -- signature-agreement estimate (cheap at extreme scale)

    prune_members: semi-join the fat state down to pair members before
    the verify joins.  Wins when candidates are a small fraction of the
    corpus (real-world dedup: a few percent) by shrinking both fat
    shuffles; loses on dup-dense corpora (the planted bench corpus is
    50% duplicates, where members ~= corpus and the extra semi-join
    shuffle is pure cost) -- hence opt-in.  CALLER must persist `pairs`
    when enabling this: the pair list is referenced twice.
    """
    cols = ["conv_id"]
    if tier == "exact":
        cols.append("shingles")
    else:
        cols.append("minhash")
    if "simhash" in conv_state.columns:
        cols.append("simhash")
    state = conv_state.select(*cols)

    if prune_members:
        member_ids = (
            pairs.select(F.col("a").alias("conv_id"))
            .union(pairs.select(F.col("b").alias("conv_id")))
            .distinct()
        )
        state = state.join(member_ids, "conv_id", "left_semi")

    a_state = state.select([F.col(c).alias(f"{c}_a") for c in state.columns])
    b_state = state.select([F.col(c).alias(f"{c}_b") for c in state.columns])
    joined = (
        pairs.join(a_state, pairs.a == a_state.conv_id_a)
        .join(b_state, pairs.b == b_state.conv_id_b)
    )
    if tier == "exact":
        sim = exact_jaccard(F.col("shingles_a"), F.col("shingles_b"))
    else:
        sim = minhash_jaccard(F.col("minhash_a"), F.col("minhash_b"))
    out = joined.select(
        "a",
        "b",
        sim.alias("jaccard"),
        *(
            [simhash_hamming(F.col("simhash_a"), F.col("simhash_b")).alias("hamming")]
            if "simhash" in conv_state.columns
            else []
        ),
    )
    return out.where(F.col("jaccard") >= cfg.jaccard_threshold)
