"""Session-scoped dedup-pipeline memo (plans/queries.py).

Seven registered diagnostics (q24/q26/q37/q38/q55/q56/q61/q62) read the
same signatures->LSH->verify->CC pass; the memo guarantees ONE pipeline
execution per (application, corpus, subset, config) key per session, so
a correctness sweep no longer pays the pipeline ~7x.  The counter is the
proof: it increments only on a real build.
"""

from __future__ import annotations

from datasketches_server_spark.plans import queries as Q


def test_memo_one_build_across_q24_family(spark, sf_dir):
    Q.clear_dedup_memo()
    start = Q._DEDUP_MEMO_BUILDS

    r1 = Q.q24_dedup_clusters_documents(spark, sf_dir)
    n1 = r1.count()
    assert Q._DEDUP_MEMO_BUILDS == start + 1

    # four more family members: zero additional pipeline builds
    Q.q38_cluster_keeper_policy(spark, sf_dir).count()
    Q.q55_jaccard_threshold_sweep(spark, sf_dir).count()
    Q.q56_cross_source_leakage(spark, sf_dir).count()
    Q.q61_cluster_cohesion(spark, sf_dir).count()
    assert Q._DEDUP_MEMO_BUILDS == start + 1

    # identical result object on a repeat call (not merely equal)
    res_a = Q.documents_dedup_result(spark, sf_dir)
    res_b = Q.documents_dedup_result(spark, sf_dir)
    assert res_a is res_b

    # q37's 80% bootstrap is a DIFFERENT key: exactly one more build
    Q.documents_dedup_result(spark, sf_dir, subset="old80")
    assert Q._DEDUP_MEMO_BUILDS == start + 2

    # results stay correct through the memo (same clusters as a repeat)
    assert Q.q24_dedup_clusters_documents(spark, sf_dir).count() == n1

    Q.clear_dedup_memo()
    assert not Q._DEDUP_MEMO


def test_memo_clear_releases_persisted_state(spark, sf_dir):
    Q.clear_dedup_memo()
    res = Q.documents_dedup_result(spark, sf_dir)
    assert res.resources, "pipeline should persist its reused relations"
    persisted = list(res.resources)
    Q.clear_dedup_memo()
    for df in persisted:
        assert df.storageLevel.useMemory is False  # unpersisted
    assert not Q._DEDUP_MEMO
