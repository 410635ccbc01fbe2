"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dedup query; ``queries()`` registers
one callable per implemented operator (SURVEY.md section 2);
``oracle_sql()`` gives the DuckDB-replayable ANSI SQL for every
registered query.  Library-approximate families (HLL q15, KLL q16/q34,
theta-Jaccard q36) are registered as WITHIN-BOUNDS CONTRACTS: Spark
emits exact values plus "estimate inside its published bounds"
booleans, DuckDB replays the exact side and the expected TRUE -- so
even the approximate families are hash-checked, not rows-only, and the
contracts survive the estimation regime.  The incremental dedup path
(q37) and the keeper-removal policy (q38) are checked against the same
full-corpus exact transitive closure as the batch pipeline (q24).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datasketches_server_spark.plans import queries as Q

_STOPWORDS_SQL = "['" + "','".join(
    __import__("datasketches_server_spark.functions.text", fromlist=["STOPWORDS"]).STOPWORDS
) + "']"

_NORM_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-duplicate clusters over sf0.001 transcripts."""
    from datasketches_server_spark.config import PipelineConfig, ShingleConfig
    from datasketches_server_spark.plans.pipeline import cluster_summary, dedup_pipeline
    from datasketches_server_spark.sources.synth import transcripts_from_documents

    t = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    res = dedup_pipeline(t, PipelineConfig(shingle=ShingleConfig(k=3)))
    return cluster_summary(res.clusters)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational OLAP
        "q01_pricing_summary": Q.q01_pricing_summary,
        "q02_top_revenue_customers": Q.q02_top_revenue_customers,
        "q03_region_rollup": Q.q03_region_rollup,
        "q04_window_running_revenue": Q.q04_window_running_revenue,
        "q05_events_hourly": Q.q05_events_hourly,
        "q06_sessionize": Q.q06_sessionize,
        # sketch parity (reference ops #2-18)
        "q10_theta_distinct_parts": Q.q10_theta_distinct_parts,
        "q11_theta_union_global": Q.q11_theta_union_global,
        "q12_theta_setops_custsegments": Q.q12_theta_setops_custsegments,
        "q13_frequency_topk_events": Q.q13_frequency_topk_events,
        "q14_exact_percentiles": Q.q14_exact_percentiles,
        "q15_hll_distinct_users": Q.q15_hll_distinct_users,
        "q16_kll_value_quantiles": Q.q16_kll_value_quantiles,
        "q34_kll_cdf_pmf_contract": Q.q34_kll_cdf_pmf_contract,
        "q35_theta_jaccard_segments": Q.q35_theta_jaccard_segments,
        "q36_theta_jaccard_contract": Q.q36_theta_jaccard_contract,
        "q63_theta_setops_contract": Q.q63_theta_setops_contract,
        "q17_reservoir_sample": Q.q17_reservoir_sample,
        "q18_varopt_sample": Q.q18_varopt_sample,
        "q19_cms_heavy_hitters": Q.q19_cms_heavy_hitters,
        # text analysis / dedup family
        "q20_token_stats": Q.q20_token_stats,
        "q21_exact_dedup_fingerprint": Q.q21_exact_dedup_fingerprint,
        "q22_ngram_jaccard_pairs": Q.q22_ngram_jaccard_pairs,
        "q23_lang_quality": Q.q23_lang_quality,
        "q24_dedup_clusters_documents": Q.q24_dedup_clusters_documents,
        "q37_incremental_dedup_documents": Q.q37_incremental_dedup_documents,
        "q38_cluster_keeper_policy": Q.q38_cluster_keeper_policy,
        "q25_simhash_near_dups": Q.q25_simhash_near_dups,
        "q26_dup_spans": Q.q26_dup_spans,
        "q27_transcript_turn_equality": Q.q27_transcript_turn_equality,
        "q28_exact_dedup_assignments": Q.q28_exact_dedup_assignments,
        "q29_multimodal_features": Q.q29_multimodal_features,
        # similarity search
        "q30_cosine_topk": Q.q30_cosine_topk,
        "q31_ann_lsh_cosine": Q.q31_ann_lsh_cosine,
        "q64_ivf_recall_contract": Q.q64_ivf_recall_contract,
        "q65_lsh_band_planner": Q.q65_lsh_band_planner,
        "q32_bow_cosine_near_dups": Q.q32_bow_cosine_near_dups,
        "q33_embedding_lsh_near_dups": Q.q33_embedding_lsh_near_dups,
        # curation family (operators/curation.py)
        "q39_decontamination": Q.q39_decontamination,
        "q40_repetition_scores": Q.q40_repetition_scores,
        "q41_stratified_sample": Q.q41_stratified_sample,
        "q42_sequence_packing": Q.q42_sequence_packing,
        "q43_curation_funnel": Q.q43_curation_funnel,
        # transcript-specific prefix dedup + semantic dedup clusters
        "q44_prefix_containment_pairs": Q.q44_prefix_containment_pairs,
        "q45_semantic_dedup_clusters": Q.q45_semantic_dedup_clusters,
        "q46_prefix_dedup_assignments": Q.q46_prefix_dedup_assignments,
        # ExactSubstr cross-document duplicate coverage + removal
        "q47_exactsubstr_coverage": Q.q47_exactsubstr_coverage,
        "q48_exactsubstr_removal": Q.q48_exactsubstr_removal,
        "q49_exactsubstr_spans": Q.q49_exactsubstr_spans,
        # turn-level template dedup over the transcript shape
        "q50_turn_template_dedup": Q.q50_turn_template_dedup,
        "q51_turn_template_contamination": Q.q51_turn_template_contamination,
        # incremental ExactSubstr (persisted window index) vs q47's oracle
        "q52_incremental_exactsubstr_coverage": Q.q52_incremental_exactsubstr_coverage,
        # Gopher heuristic quality gates + PII scan/redaction
        "q53_gopher_quality": Q.q53_gopher_quality,
        "q54_pii_scan": Q.q54_pii_scan,
        # threshold sensitivity + cross-source leakage over verified pairs
        "q55_jaccard_threshold_sweep": Q.q55_jaccard_threshold_sweep,
        "q56_cross_source_leakage": Q.q56_cross_source_leakage,
        # transcript-native gates: agent-loop runs + structural audit
        "q57_agent_loop_detection": Q.q57_agent_loop_detection,
        "q58_transcript_structure_audit": Q.q58_transcript_structure_audit,
        # tool/ts analytics over the contract transcript schema
        "q59_tool_latency": Q.q59_tool_latency,
        # temperature-based source mixing (pre-training mix allocation)
        "q60_temperature_mix": Q.q60_temperature_mix,
        # per-cluster cohesion diagnostics (chain-link detector)
        "q61_cluster_cohesion": Q.q61_cluster_cohesion,
        # temporal near-dup leakage (dedup-window policy evidence)
        "q62_temporal_leakage": Q.q62_temporal_leakage,
        # leakage-safe split: near-dup clusters are atomic split units
        "q66_cluster_safe_split": Q.q66_cluster_safe_split,
        # asymmetric containment (near-superset) dedup
        "q67_containment_dedup": Q.q67_containment_dedup,
        # quality-greedy selection under a global token budget
        "q68_token_budget_select": Q.q68_token_budget_select,
        # overlapping fixed-token chunking (embedding/RAG prep)
        "q69_chunk_documents": Q.q69_chunk_documents,
        # retraction: remove docs from accumulated dedup state
        "q70_retract_dedup": Q.q70_retract_dedup,
        # signature-level train/eval decontamination (near-dup, cross-corpus)
        "q71_cross_corpus_decontam": Q.q71_cross_corpus_decontam,
        # per-source dedup impact rollup (docs/tokens kept vs dropped)
        "q72_dedup_impact_by_source": Q.q72_dedup_impact_by_source,
        # train docs to remove over eval contamination, with evidence
        "q73_decontam_removal_verdict": Q.q73_decontam_removal_verdict,
        # corpus-level boilerplate: 8-grams shared by the most documents
        "q74_boilerplate_ngrams": Q.q74_boilerplate_ngrams,
        # embedding-space train/eval decontamination (semantic leaks)
        "q75_semantic_cross_decontam": Q.q75_semantic_cross_decontam,
        # C4 web-text cleaning rules (line keeps + page drops) per source
        "q76_c4_filters": Q.q76_c4_filters,
        # chunk-level dedup: 64-token chunks recurring across documents
        "q77_duplicate_chunks": Q.q77_duplicate_chunks,
        # encoding hygiene: replacement chars + control bytes per source
        "q78_encoding_hygiene": Q.q78_encoding_hygiene,
        # per-source vocabulary profile (vocab size, TTR, hapax rate)
        "q79_vocabulary_profile": Q.q79_vocabulary_profile,
        # incremental semantic dedup via the persisted embedding-LSH index
        "q80_incremental_semantic_dedup": Q.q80_incremental_semantic_dedup,
        # semantic retraction: delete half of the embedding accumulator
        "q81_retract_semantic_dedup": Q.q81_retract_semantic_dedup,
        # Bloom-gated exact-dedup membership (seen-before, verify-exact)
        "q82_bloom_seen_filter": Q.q82_bloom_seen_filter,
        # cluster-drift report after a daily absorb (new/grown/merged)
        "q83_absorb_impact_report": Q.q83_absorb_impact_report,
        # cluster purity: exact jaccard over ALL intra-cluster pairs
        "q84_cluster_diameter_audit": Q.q84_cluster_diameter_audit,
        # sessionization: split conversations at >30min inactivity gaps
        "q85_sessionize": Q.q85_sessionize,
        # role-transition matrix per source (chat vs agent-loop shapes)
        "q86_role_transitions": Q.q86_role_transitions,
        # deterministic token-balanced shard export manifest
        "q87_shard_manifest": Q.q87_shard_manifest,
        # inter-source vocabulary overlap (mixing-table companion to q56)
        "q88_source_overlap_matrix": Q.q88_source_overlap_matrix,
        # vocabulary-growth / novelty curve over ingest batches
        "q89_vocab_growth": Q.q89_vocab_growth,
        # tool-call trigram motifs per source (agent-behavior fingerprint)
        "q90_tool_motifs": Q.q90_tool_motifs,
        # per-source assistant token-share distribution (mixing signal)
        "q91_dialog_balance": Q.q91_dialog_balance,
        # detection -> keeper removal -> shard export, end to end
        "q92_dedup_shard_manifest": Q.q92_dedup_shard_manifest,
        # embedding-hygiene gate: dims / non-finite / zero-norm / norm quantiles
        "q93_embedding_hygiene": Q.q93_embedding_hygiene,
        # per-day near-dup ingest rate (recrawl/retry-storm trend)
        "q94_dup_rate_timeseries": Q.q94_dup_rate_timeseries,
        # template-turn rate by relative position inside conversations
        "q95_turn_position_dup_profile": Q.q95_turn_position_dup_profile,
        # repeated user prompts bucketed by assistant-response consistency
        "q96_prompt_response_divergence": Q.q96_prompt_response_divergence,
        # verbatim 8-token-window leakage matrix between sources
        "q97_cross_source_substr_leakage": Q.q97_cross_source_substr_leakage,
        # CCNet-style unigram perplexity filter (log10-bucketed, libm-free)
        "q98_unigram_surprisal": Q.q98_unigram_surprisal,
        # DSIR importance weights toward a target domain (log10-bucketed)
        "q99_dsir_importance": Q.q99_dsir_importance,
        # BPE-ish pieces / whitespace tokens / chars per source (budget planning)
        "q100_tokenizer_fertility": Q.q100_tokenizer_fertility,
        # which dialog side leaks PII (role-aware planted scan)
        "q101_role_pii_exposure": Q.q101_role_pii_exposure,
        # per-source duplicate-mass concentration (few mega-families vs spread)
        "q102_source_cluster_concentration": Q.q102_source_cluster_concentration,
        # 3-gram count-of-counts spectrum (Good-Turing head + Zipf tail)
        "q103_gram_frequency_spectrum": Q.q103_gram_frequency_spectrum,
        # within-conversation assistant echo rate (quote-back / parrot signal)
        "q104_conv_echo_rate": Q.q104_conv_echo_rate,
        # asymmetric full-containment dedup (snippet-inside-page pairs)
        "q105_containment_dedup": Q.q105_containment_dedup,
        # near-dup pair age quantiles (band-index retention-horizon sizing)
        "q106_dup_pair_age": Q.q106_dup_pair_age,
        # pairwise cosine between per-label embedding centroids (mix design)
        "q107_source_centroid_similarity": Q.q107_source_centroid_similarity,
        # distinct opening prompts per source (instruction diversity)
        "q108_prompt_diversity": Q.q108_prompt_diversity,
        # 16-lane portable MinHash estimate vs exact jaccard, by decile band
        "q109_minhash_calibration": Q.q109_minhash_calibration,
        # dropped-member -> keeper jaccard floor per family-size bucket
        "q110_keeper_similarity_floor": Q.q110_keeper_similarity_floor,
        # exact all-pairs similarity self-join via prefix filtering (recall 1.0)
        "q111_allpairs_ssjoin": Q.q111_allpairs_ssjoin,
        # weighted (multiset) jaccard pairs over 3-gram term frequencies
        "q112_weighted_jaccard_dedup": Q.q112_weighted_jaccard_dedup,
        # per-source gram frequency head decay (log-free Zipf profile)
        "q113_gram_rank_decay": Q.q113_gram_rank_decay,
        # levenshtein audit of verified near-dup pairs
        "q114_edit_distance_audit": Q.q114_edit_distance_audit,
        # 1-bit MinHash accuracy contract vs q109's full-width lanes
        "q115_bbit_minhash_contract": Q.q115_bbit_minhash_contract,
        # temperature-scaled source mixing weights + effective epochs
        "q116_source_mix_weights": Q.q116_source_mix_weights,
        # near-dup turns across convs (shifted-boundary templates), per role
        "q117_turn_near_dup": Q.q117_turn_near_dup,
        # continuation length/variety spread under repeated opening prompts
        "q118_template_continuation_spread": Q.q118_template_continuation_spread,
        # template turns explained by conv-level clusters vs spanning them
        "q119_template_cluster_overlap": Q.q119_template_cluster_overlap,
        # per-conv language-switch profile (q23 LID gate per turn)
        "q120_conv_code_switch": Q.q120_conv_code_switch,
        # quality-decile x near-dup-family cross-tab (gate orthogonality)
        "q121_quality_dup_correlation": Q.q121_quality_dup_correlation,
        # dup-mass Lorenz head: top-1/top-10 family share (giant-component risk)
        "q122_dup_mass_concentration": Q.q122_dup_mass_concentration,
        # shingle-width ablation: verified pairs + mean jaccard at k=2/3/5
        "q123_shingle_k_ablation": Q.q123_shingle_k_ablation,
        # empirical LSH S-curve at the b=4 x r=4 band shape, per jaccard decile
        "q124_band_collision_profile": Q.q124_band_collision_profile,
        # user-vs-assistant vocabulary split per source (echo at corpus scale)
        "q125_role_gram_divergence": Q.q125_role_gram_divergence,
        # dup rate by conversation turn-count bucket (length-stratified budgets)
        "q126_conv_dup_by_length": Q.q126_conv_dup_by_length,
        # winnowing (MOSS) fingerprint pairs: position-robust dup detection
        "q127_winnowing_pairs": Q.q127_winnowing_pairs,
        # IDF-weighted jaccard pairs: rare-mass similarity, boilerplate-blind
        "q128_idf_weighted_pairs": Q.q128_idf_weighted_pairs,
        # MinHash signature-width error ablation (k = 4/8/16 lanes, shared seeds)
        "q129_minhash_k_error": Q.q129_minhash_k_error,
        # token mass recoverable by turn-level dedup, per role
        "q130_turn_dedup_savings": Q.q130_turn_dedup_savings,
    }


def oracle_sql() -> dict[str, str]:
    from datasketches_server_spark.functions.cms import cms_hash_sql as _cms_hash_sql
    from datasketches_server_spark.functions.portable import (
        md5_long60_sql,
        u01_sql,
        word_grams_all_sql,
        word_grams_sql,
    )
    from datasketches_server_spark.sources.synth import transcripts_from_documents_sql

    res_key = u01_sql("event_id", salt="res|")
    vo_key = u01_sql("event_id", salt="vo|")
    grams3 = word_grams_sql(_NORM_TOKS, 3)
    simhash_bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(48)
    )

    # ANN oracle scaffolding (q31/q33): replay the sign-projection LSH
    # exactly -- planes as literals, power-of-2 quantization, integer
    # code bits, capped buckets, hamming<=1 multi-probe, cosine rerank.
    from datasketches_server_spark.operators.similarity import (
        cap_order_sql,
        sign_planes_sql_values,
    )

    ANN_T, ANN_B, ANN_CAP = 24, 6, 128
    plane_rows = sign_planes_sql_values(64, ANN_T, ANN_B, 42)
    probe_list = "[code, " + ", ".join(f"xor(code, {1 << b})" for b in range(ANN_B)) + "]"
    ann_codes = f"""
        planes AS (SELECT * FROM (VALUES {plane_rows}) p(pid, vec)),
        qv AS (
            SELECT vec_id,
                   [CAST(floor(CAST(x AS DOUBLE) * 512) AS DOUBLE) FOR x IN embedding] AS q
            FROM embeddings
        ),
        bits AS (
            SELECT vec_id, pid // {ANN_B} AS tbl, pid % {ANN_B} AS bit,
                   CASE WHEN list_dot_product(q, vec) > 0 THEN 1 ELSE 0 END AS b
            FROM qv, planes
        ),
        codes AS (
            SELECT vec_id, tbl, CAST(sum(b * (1 << bit)) AS BIGINT) AS code
            FROM bits GROUP BY 1, 2
        )
    """

    oracles = {
        "q17_reservoir_sample": f"""
            WITH keyed AS (
                SELECT event_type, user_id, {res_key} AS key FROM events
            ), ranked AS (
                SELECT event_type, user_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY key, user_id) AS rn
                FROM keyed
            ), totals AS (
                SELECT event_type, count(*) AS stream_n FROM events GROUP BY 1
            )
            SELECT r.event_type, r.user_id AS sampled_user, t.stream_n
            FROM ranked r JOIN totals t USING (event_type)
            WHERE rn <= 8 ORDER BY 1, 2
        """,
        "q18_varopt_sample": f"""
            WITH keyed AS (
                SELECT event_type, value, ({vo_key}) / value AS key FROM events
            ), ranked AS (
                SELECT event_type, value, key,
                       row_number() OVER (ORDER BY key, event_type) AS rn
                FROM keyed
            ), totals AS (
                SELECT round(sum(value), 2) AS stream_weight,
                       count(*) AS stream_n
                FROM events
            ), tau AS (
                SELECT 1.0 / key AS tau FROM ranked WHERE rn = 9
            )
            SELECT r.event_type, round(r.value, 2) AS weight,
                   round(greatest(r.value, tau.tau), 4) AS adjusted_weight,
                   round(tau.tau, 4) AS tau,
                   t.stream_weight, t.stream_n
            FROM ranked r, totals t, tau
            WHERE r.rn <= 8 ORDER BY 1, 2
        """,
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q02_top_revenue_customers": """
            SELECT c_custkey, c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "q03_region_rollup": """
            SELECT r_name, count(*) AS n_customers,
                   round(avg(c_acctbal), 4) AS avg_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1 ORDER BY 1
        """,
        "q04_window_running_revenue": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
                   AS running_total
            FROM orders WHERE o_custkey <= 50
            ORDER BY o_custkey, o_orderkey
        """,
        "q05_events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                   event_type, count(*) AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q06_sessionize": """
            WITH marked AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM marked GROUP BY user_id ORDER BY user_id
        """,
        "q10_theta_distinct_parts": """
            SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "q11_theta_union_global": """
            SELECT count(DISTINCT l_partkey) AS distinct_parts_global FROM lineitem
        """,
        "q12_theta_setops_custsegments": """
            WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
                 b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
            SELECT (SELECT count(*) FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)) AS n_union,
                   (SELECT count(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)) AS n_both,
                   (SELECT count(*) FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)) AS n_urgent_only
        """,
        "q13_frequency_topk_events": """
            SELECT event_type, estimate, rank FROM (
                SELECT event_type, count(*) AS estimate,
                       row_number() OVER (ORDER BY count(*) DESC, event_type) AS rank
                FROM events GROUP BY event_type
            ) WHERE rank <= 5 ORDER BY rank
        """,
        "q19_cms_heavy_hitters": """
            WITH u AS (
                {cell_union}
            ), cells AS (
                SELECT r, cell, count(*) AS cnt FROM u GROUP BY 1, 2
            ), exact AS (
                SELECT user_id, count(*) AS exact_n FROM events
                GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 10
            ), probes AS (
                SELECT DISTINCT u.user_id, u.r, u.cell
                FROM u JOIN exact USING (user_id)
            ), est AS (
                SELECT p.user_id, min(c.cnt) AS cms_estimate
                FROM probes p JOIN cells c USING (r, cell) GROUP BY 1
            )
            SELECT e.user_id, e.exact_n, est.cms_estimate
            FROM exact e JOIN est USING (user_id)
            ORDER BY e.exact_n DESC, e.user_id
        """.format(cell_union=" UNION ALL ".join(
            f"SELECT user_id, {j} AS r, {_cms_hash_sql('user_id', j, 256)} AS cell FROM events"
            for j in range(4)
        )),
        # q15/q16: within-bounds contracts for the library-approximate
        # families -- Spark emits exact values + "estimate inside its own
        # published bounds" booleans; DuckDB replays the exact side and
        # the expected TRUE (see plans/queries.py docstrings).
        "q15_hll_distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_users,
                   TRUE AS within_3sigma
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q16_kll_value_quantiles": """
            SELECT count(*) AS stream_length,
                   round(CAST(CAST(min(value) AS REAL) AS DOUBLE), 2) AS min_value,
                   round(CAST(CAST(max(value) AS REAL) AS DOUBLE), 2) AS max_value,
                   TRUE AS rank50_ok,
                   TRUE AS rank90_ok
            FROM events
        """,
        "q34_kll_cdf_pmf_contract": """
            SELECT count(*) AS n,
                   round(sum(CASE WHEN value <= 50.0  THEN 1 ELSE 0 END) / count(*)::DOUBLE, 4) AS cdf_exact_0,
                   TRUE AS cdf_ok_0,
                   round(sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) / count(*)::DOUBLE, 4) AS cdf_exact_1,
                   TRUE AS cdf_ok_1,
                   round(sum(CASE WHEN value <= 200.0 THEN 1 ELSE 0 END) / count(*)::DOUBLE, 4) AS cdf_exact_2,
                   TRUE AS cdf_ok_2,
                   TRUE AS pmf_tail_ok
            FROM events
        """,
        "q35_theta_jaccard_segments": """
            WITH s AS (
                SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders
            ), pairs AS (
                SELECT DISTINCT a.p AS pa, b.p AS pb FROM s a JOIN s b ON a.p < b.p
            ), inter AS (
                SELECT x.p AS pa, y.p AS pb, count(*) AS n_both
                FROM s x JOIN s y ON x.c = y.c AND x.p < y.p
                GROUP BY 1, 2
            ), sizes AS (
                SELECT p, count(*) AS n FROM s GROUP BY 1
            )
            SELECT pr.pa, pr.pb,
                   coalesce(i.n_both, 0) AS n_both,
                   sa.n + sb.n - coalesce(i.n_both, 0) AS n_either,
                   round(coalesce(i.n_both, 0)::DOUBLE
                         / (sa.n + sb.n - coalesce(i.n_both, 0)), 4) AS jaccard
            FROM pairs pr
            LEFT JOIN inter i ON pr.pa = i.pa AND pr.pb = i.pb
            JOIN sizes sa ON pr.pa = sa.p
            JOIN sizes sb ON pr.pb = sb.p
            ORDER BY 1, 2
        """,
        "q36_theta_jaccard_contract": """
            WITH s AS (
                SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders
            ), pairs AS (
                SELECT a.p AS pa, a.n AS na, b.p AS pb, b.n AS nb
                FROM (SELECT p, count(*) AS n FROM s GROUP BY 1) a
                JOIN (SELECT p, count(*) AS n FROM s GROUP BY 1) b ON a.p < b.p
            ), inter AS (
                SELECT x.p AS pa, y.p AS pb, count(*) AS n_both
                FROM s x JOIN s y ON x.c = y.c AND x.p < y.p
                GROUP BY 1, 2
            )
            SELECT pr.pa, pr.pb,
                   coalesce(i.n_both, 0) AS n_both,
                   pr.na + pr.nb - coalesce(i.n_both, 0) AS n_either,
                   TRUE AS both_ok,
                   TRUE AS either_ok
            FROM pairs pr
            LEFT JOIN inter i ON pr.pa = i.pa AND pr.pb = i.pb
            ORDER BY 1, 2
        """,
        "q63_theta_setops_contract": """
            WITH s AS (
                SELECT DISTINCT o_orderpriority AS p, o_custkey AS c
                FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            )
            SELECT count(*) FILTER (p = '1-URGENT') AS n_urgent,
                   count(*) FILTER (p = '5-LOW') AS n_low,
                   count(*) - count(DISTINCT c) AS n_both,
                   count(DISTINCT c) AS n_union,
                   count(*) FILTER (p = '1-URGENT')
                     - (count(*) - count(DISTINCT c)) AS n_urgent_only,
                   TRUE AS union_ok,
                   TRUE AS both_ok,
                   TRUE AS diff_ok
            FROM s
        """,
        "q14_exact_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q20_token_stats": f"""
            SELECT doc_id,
                   CAST(len({_NORM_TOKS}) AS BIGINT) AS n_tokens,
                   CAST(len({_NORM_TOKS})
                      + len(list_filter(string_split_regex(lower(text), '[a-z0-9\\s]+'), x -> x <> ''))
                     AS BIGINT) AS n_pieces,
                   round(len(list_filter({_NORM_TOKS}, x -> list_contains({_STOPWORDS_SQL}, x)))
                         / greatest(len({_NORM_TOKS}), 1)::DOUBLE, 4) AS stop_ratio
            FROM documents ORDER BY doc_id
        """,
        "q21_exact_dedup_fingerprint": f"""
            SELECT count(*) AS n_unique_docs,
                   CAST(sum(n_docs - 1) AS BIGINT) AS n_exact_dupes
            FROM (
                SELECT md5(array_to_string({_NORM_TOKS}, ' ')) AS fp,
                       count(*) AS n_docs
                FROM documents GROUP BY 1
            )
        """,
        "q22_ngram_jaccard_pairs": """
            WITH g AS (
                SELECT doc_id,
                       list_distinct([array_to_string(toks[i+1:i+3], ' ')
                                      FOR i IN range(0, greatest(len(toks)-3, 0)+1)]) AS grams
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(len(list_intersect(a.grams, b.grams))
                         / len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE, 4) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.grams, b.grams))
                  / len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE >= 0.8
            ORDER BY a, b
        """,
        # q24: the full LSH+CC pipeline vs an exact-SQL reference: DuckDB
        # computes ALL >=0.7-jaccard pairs (inverted gram index, same
        # [a-z0-9]+/k=3 shingle semantics as the signature UDF) and their
        # transitive closure via a recursive CTE.  The pipeline's exact-
        # jaccard verify has no false positives, so hash-equality here
        # PROVES dup-pair recall = 1.0 on this corpus (the north rule's
        # cluster-match criterion, checked by the driver every round).
        "q24_dedup_clusters_documents": f"""
            WITH RECURSIVE g AS (
                SELECT CAST(doc_id AS VARCHAR) AS id,
                       {grams3} AS grams FROM documents
            ), x AS (
                SELECT id, unnest(grams) AS gram FROM g
            ), inter AS (
                SELECT l.id AS a, r.id AS b, count(*) AS i
                FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
                GROUP BY 1, 2
            ), sz AS (
                SELECT id, len(grams) AS n FROM g
            ), edges AS (
                SELECT a, b FROM inter
                JOIN sz sa ON inter.a = sa.id
                JOIN sz sb ON inter.b = sb.id
                WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
            ), sym AS (
                SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
            ), cc(id, lbl) AS (
                SELECT DISTINCT a, a FROM sym
                UNION
                SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
            ), labels AS (
                SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
            )
            SELECT cluster_id, count(*) AS cluster_size FROM labels
            GROUP BY 1 ORDER BY cluster_size DESC, cluster_id
        """,
        "q29_multimodal_features": """
            SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                                   WHEN 1 THEN 'audio'
                                   ELSE 'video' END AS kind,
                   count(*) AS n,
                   round(avg(CAST(concat('0x', substr(md5(text), 1, 2)) AS BIGINT)
                             / 255.0), 4) AS mean_f0,
                   round(avg(octet_length(encode(text))), 2) AS avg_bytes
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "q26_dup_spans": f"""
            WITH g AS (
                SELECT CAST(doc_id AS VARCHAR) AS id, {_NORM_TOKS} AS toks,
                       {grams3} AS grams FROM documents
            ), x AS (
                SELECT id, unnest(grams) AS gram FROM g
            ), inter AS (
                SELECT l.id AS a, r.id AS b, count(*) AS i
                FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
                GROUP BY 1, 2
            ), sz AS (
                SELECT id, len(grams) AS n FROM g
            ), edges AS (
                SELECT a, b, i / CAST(sa.n + sb.n - i AS DOUBLE) AS j
                FROM inter
                JOIN sz sa ON inter.a = sa.id
                JOIN sz sb ON inter.b = sb.id
                WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
            ), pd AS (
                SELECT DISTINCT a AS id FROM edges
                UNION SELECT DISTINCT b FROM edges
            ), tokd AS (
                SELECT g.id, g.toks FROM g JOIN pd USING (id)
            ), starts AS (
                SELECT id, toks, unnest(range(0, len(toks))) AS s FROM tokd
            ), runs AS (
                SELECT id, s, unnest(range(1, len(toks) - s + 1)) AS l, toks
                FROM starts
            ), runs2 AS (
                SELECT DISTINCT id, l, array_to_string(toks[s+1:s+l], ' ') AS run
                FROM runs
            ), spans AS (
                SELECT e.a, e.b, max(ra.l) AS span_len
                FROM edges e
                JOIN runs2 ra ON ra.id = e.a
                JOIN runs2 rb ON rb.id = e.b AND rb.l = ra.l AND rb.run = ra.run
                GROUP BY 1, 2
            ), ntok AS (
                SELECT id, len(toks) AS n FROM tokd
            )
            SELECT e.a, e.b, round(e.j, 4) AS jaccard,
                   coalesce(s.span_len, 0) AS span_len,
                   round(coalesce(s.span_len, 0)
                         / CAST(greatest(least(na.n, nb.n), 1) AS DOUBLE), 4) AS span_frac
            FROM edges e
            LEFT JOIN spans s ON e.a = s.a AND e.b = s.b
            JOIN ntok na ON e.a = na.id
            JOIN ntok nb ON e.b = nb.id
            ORDER BY 1, 2
        """,
        "q25_simhash_near_dups": f"""
            WITH g AS (
                SELECT doc_id, {grams3} AS grams FROM documents
            ), gh AS (
                SELECT doc_id, {md5_long60_sql("gram")} AS h
                FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
            ), fp AS (
                SELECT doc_id, {simhash_bits} AS f FROM gh GROUP BY doc_id
            )
            SELECT l.doc_id AS a, r.doc_id AS b,
                   bit_count(xor(l.f, r.f)) AS hamming
            FROM fp l JOIN fp r ON l.doc_id < r.doc_id
            WHERE bit_count(xor(l.f, r.f)) <= 6
            ORDER BY 1, 2
        """,
        "q23_lang_quality": f"""
            WITH scored AS (
                SELECT source,
                       CASE WHEN len(list_filter({_NORM_TOKS}, x -> list_contains({_STOPWORDS_SQL}, x)))
                                 / greatest(len({_NORM_TOKS}), 1)::DOUBLE >= 0.08
                            THEN 'en' ELSE 'und' END AS lang,
                       (CASE WHEN len({_NORM_TOKS}) BETWEEN 10 AND 5000 THEN 1.0
                             WHEN len({_NORM_TOKS}) < 10 THEN len({_NORM_TOKS}) / 10.0
                             ELSE 5000.0 / len({_NORM_TOKS}) END
                        + CASE WHEN length(text) / greatest(len({_NORM_TOKS}), 1)::DOUBLE BETWEEN 3 AND 12
                               THEN 1.0 ELSE 0.5 END
                        + 1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
                                      / greatest(length(text), 1)::DOUBLE * 4, 1.0)
                       ) / 3 AS q
                FROM documents
            )
            SELECT source, lang, count(*) AS n_docs, round(avg(q), 4) AS avg_quality
            FROM scored GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q28_exact_dedup_assignments": f"""
            WITH fp AS (
                SELECT doc_id, md5(array_to_string({_NORM_TOKS}, ' ')) AS fp
                FROM documents
            ), keep AS (
                SELECT fp, min(doc_id) AS keeper_doc FROM fp GROUP BY fp
            )
            SELECT doc_id, keeper_doc, (doc_id <> keeper_doc) AS is_duplicate
            FROM fp JOIN keep USING (fp) ORDER BY doc_id
        """,
        "q27_transcript_turn_equality": f"""
            WITH tr AS ({transcripts_from_documents_sql()}),
                 asm AS (
                    SELECT conv_id, count(*) AS n_turns,
                           string_agg(text, ' ' ORDER BY turn_idx) AS full_text
                    FROM tr GROUP BY conv_id
                 )
            SELECT a.conv_id, a.n_turns, (a.full_text = d.text) AS text_equal
            FROM asm a
            JOIN (SELECT CAST(doc_id AS VARCHAR) AS conv_id, text FROM documents) d
              USING (conv_id)
            ORDER BY CAST(a.conv_id AS BIGINT)
        """,
        "q30_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qe), 4) AS cosine
            FROM embeddings, q WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "q64_ivf_recall_contract": """
            SELECT count(*) AS n_queries, 10 AS k,
                   TRUE AS mean_recall_ok, TRUE AS min_recall_ok
            FROM embeddings WHERE vec_id % 25 = 0
        """,
        "q65_lsh_band_planner": """
            WITH f(bands, nrows) AS (VALUES (128,1),(64,2),(32,4),(16,8),
                                            (8,16),(4,32),(2,64),(1,128)),
            t(threshold) AS (VALUES (0.5),(0.6),(0.7),(0.8),(0.9)),
            g AS (
                SELECT bands, nrows, threshold,
                       pow(1.0/bands, 1.0/nrows) AS s50,
                       1.0 - pow(1.0 - pow(threshold, nrows), bands) AS p_catch
                FROM f CROSS JOIN t
            ),
            bal AS (
                SELECT threshold, CAST(bands AS BIGINT) AS bal_bands,
                       CAST(nrows AS BIGINT) AS bal_rows,
                       CAST(round(s50*10000) AS BIGINT) AS bal_s50_e4
                FROM (SELECT *, row_number() OVER (PARTITION BY threshold
                          ORDER BY abs(s50-threshold), nrows) AS rn FROM g)
                WHERE rn = 1
            ),
            rec AS (
                SELECT threshold, CAST(bands AS BIGINT) AS rec_bands,
                       CAST(nrows AS BIGINT) AS rec_rows,
                       CAST(round(p_catch*10000) AS BIGINT) AS rec_catch_e4
                FROM (SELECT *, row_number() OVER (PARTITION BY threshold
                          ORDER BY nrows DESC) AS rn FROM g WHERE p_catch >= 0.99)
                WHERE rn = 1
            )
            SELECT CAST(round(bal.threshold*100) AS BIGINT) AS threshold_e2,
                   bal_bands, bal_rows, bal_s50_e4,
                   rec_bands, rec_rows, rec_catch_e4
            FROM bal JOIN rec USING (threshold)
            ORDER BY threshold_e2
        """,
        "q31_ann_lsh_cosine": f"""
            WITH {ann_codes},
            capped AS (
                SELECT vec_id, tbl, code FROM (
                    SELECT vec_id, tbl, code,
                           row_number() OVER (
                               PARTITION BY tbl, code
                               ORDER BY {cap_order_sql("vec_id")}, vec_id) AS rn
                    FROM codes WHERE vec_id <> 0
                ) WHERE rn <= {ANN_CAP}
            ), probes AS (
                SELECT tbl, unnest({probe_list}) AS code
                FROM codes WHERE vec_id = 0
            ), cands AS (
                SELECT DISTINCT c.vec_id
                FROM capped c JOIN probes p ON c.tbl = p.tbl AND c.code = p.code
            ), scored AS (
                SELECT e.vec_id,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS cos
                FROM embeddings e
                JOIN cands USING (vec_id),
                     (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                      WHERE vec_id = 0) q
            )
            SELECT 0 AS query_id, vec_id, round(cos, 4) AS cosine
            FROM scored ORDER BY cos DESC, vec_id LIMIT 10
        """,
        "q33_embedding_lsh_near_dups": f"""
            WITH {ann_codes},
            capped AS (
                SELECT vec_id, tbl, code FROM (
                    SELECT vec_id, tbl, code,
                           row_number() OVER (
                               PARTITION BY tbl, code
                               ORDER BY {cap_order_sql("vec_id")}, vec_id) AS rn
                    FROM codes
                ) WHERE rn <= {ANN_CAP}
            ), probes AS (
                SELECT vec_id, tbl, unnest({probe_list}) AS code FROM codes
            ), cands AS (
                SELECT DISTINCT least(p.vec_id, c.vec_id) AS a,
                                greatest(p.vec_id, c.vec_id) AS b
                FROM probes p
                JOIN capped c ON p.tbl = c.tbl AND p.code = c.code
                                 AND p.vec_id <> c.vec_id
            )
            SELECT cands.a, cands.b,
                   round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                                eb.embedding::DOUBLE[]), 4) AS cosine
            FROM cands
            JOIN embeddings ea ON cands.a = ea.vec_id
            JOIN embeddings eb ON cands.b = eb.vec_id
            WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                         eb.embedding::DOUBLE[]) >= 0.4
            ORDER BY 1, 2
        """,
        "q32_bow_cosine_near_dups": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_NORM_TOKS}) AS tok FROM documents
            ), dims AS (
                SELECT doc_id,
                       (ascii(substr(tok, 1, 1)) * 97
                        + ascii(substr(tok || '~', 2, 1)) * 31
                        + length(tok) * 7) % 64 AS dim,
                       count(*) AS w
                FROM tok GROUP BY 1, 2
            ), norms AS (
                SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM dims GROUP BY 1
            ), dots AS (
                SELECT l.doc_id AS a, r.doc_id AS b, sum(l.w * r.w) AS dot
                FROM dims l JOIN dims r ON l.dim = r.dim AND l.doc_id < r.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b, round(dot / (na.nrm * nb.nrm), 4) AS cosine
            FROM dots
            JOIN norms na ON dots.a = na.doc_id
            JOIN norms nb ON dots.b = nb.doc_id
            WHERE dot / (na.nrm * nb.nrm) >= 0.9
            ORDER BY a, b
        """,
    }
    # q37 folds a 20% batch into the 80% corpus incrementally; the exact
    # ground truth is the SAME full-corpus recursive closure as q24
    oracles["q37_incremental_dedup_documents"] = oracles["q24_dedup_clusters_documents"]
    # q38: removal policy = q24's exact closure + q23's quality formula
    # + argmax(quality, min id) per cluster
    oracles["q38_cluster_keeper_policy"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), qual AS (
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   round((CASE WHEN len({_NORM_TOKS}) BETWEEN 10 AND 5000 THEN 1.0
                               WHEN len({_NORM_TOKS}) < 10 THEN len({_NORM_TOKS}) / 10.0
                               ELSE 5000.0 / len({_NORM_TOKS}) END
                          + CASE WHEN length(text) / greatest(len({_NORM_TOKS}), 1)::DOUBLE BETWEEN 3 AND 12
                                 THEN 1.0 ELSE 0.5 END
                          + 1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
                                        / greatest(length(text), 1)::DOUBLE * 4, 1.0)
                         ) / 3, 4) AS quality
            FROM documents
        ), members AS (
            SELECT l.id, l.cluster_id, q.quality
            FROM labels l JOIN qual q ON l.id = q.id
        ), rk AS (
            SELECT cluster_id, id, quality,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY quality DESC, id) AS rk
            FROM members
        ), kp AS (
            SELECT cluster_id, id AS keeper_id FROM rk WHERE rk = 1
        )
        SELECT m.cluster_id, m.id AS conv_id, m.quality, kp.keeper_id,
               (m.id <> kp.keeper_id) AS dropped
        FROM members m JOIN kp USING (cluster_id)
        ORDER BY cluster_id, conv_id
    """
    # q39-q42: curation family (operators/curation.py).  Same normalized
    # tokens as q20-q23; the sampling hash is the portable u01.
    from datasketches_server_spark.functions.portable import word_grams_all_sql

    grams4 = word_grams_sql(_NORM_TOKS, 4)
    grams3_all = word_grams_all_sql(_NORM_TOKS, 3)
    oracles["q39_decontamination"] = f"""
        WITH g AS (
            SELECT doc_id, {grams4} AS grams FROM documents
        ), eg AS (
            SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 17 = 3
        ), train AS (
            SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                   unnest(grams) AS gram
            FROM g WHERE doc_id % 17 <> 3
        )
        SELECT doc_id, n_grams,
               CAST(count(*) AS BIGINT) AS n_contaminated,
               round(count(*) / greatest(n_grams, 1)::DOUBLE, 4) AS contamination
        FROM train JOIN eg USING (gram)
        GROUP BY doc_id, n_grams
        ORDER BY doc_id
    """
    oracles["q40_repetition_scores"] = f"""
        WITH x AS (
            SELECT doc_id, unnest({grams3_all}) AS gram FROM documents
        ), c AS (
            SELECT doc_id, gram, count(*) AS n FROM x GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_grams,
               CAST(count(*) AS BIGINT) AS n_distinct,
               round(1 - count(*) / sum(n)::DOUBLE, 4) AS rep_ratio,
               CAST(max(n) AS BIGINT) AS max_repeat
        FROM c GROUP BY doc_id ORDER BY doc_id
    """
    strat_key = u01_sql("doc_id", salt="strat")
    oracles["q41_stratified_sample"] = f"""
        WITH keyed AS (
            SELECT lang, doc_id, {strat_key} AS k FROM documents
        ), r AS (
            SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang ORDER BY k, doc_id) AS rk
            FROM keyed
        )
        SELECT lang, doc_id, CAST(rk AS INT) AS rk
        FROM r WHERE rk <= 5 ORDER BY lang, rk
    """
    oracles["q42_sequence_packing"] = f"""
        WITH t AS (
            SELECT source, doc_id,
                   CAST(len({_NORM_TOKS}) AS BIGINT) AS n_tok
            FROM documents
        ), c AS (
            SELECT source, n_tok,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
            FROM t
        )
        SELECT source, CAST((cum - n_tok) // 256 AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
               round(sum(n_tok) / 256.0, 4) AS fill
        FROM c GROUP BY source, bin ORDER BY source, bin
    """
    # q43: the whole curation funnel -- q24's exact closure (train docs
    # only) + q38's keeper argmax + q39 contamination + q40 repetition +
    # q23 quality, folded into one verdict per training doc with the
    # same precedence as the Spark plan
    oracles["q43_curation_funnel"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams
            FROM documents WHERE doc_id % 17 <> 3
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), szs AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN szs sa ON inter.a = sa.id
            JOIN szs sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), alllab AS (
            SELECT g.id, coalesce(labels.cluster_id, g.id) AS cluster_id
            FROM g LEFT JOIN labels ON g.id = labels.id
        ), qual AS (
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   round((CASE WHEN len({_NORM_TOKS}) BETWEEN 10 AND 5000 THEN 1.0
                               WHEN len({_NORM_TOKS}) < 10 THEN len({_NORM_TOKS}) / 10.0
                               ELSE 5000.0 / len({_NORM_TOKS}) END
                          + CASE WHEN length(text) / greatest(len({_NORM_TOKS}), 1)::DOUBLE BETWEEN 3 AND 12
                                 THEN 1.0 ELSE 0.5 END
                          + 1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
                                        / greatest(length(text), 1)::DOUBLE * 4, 1.0)
                         ) / 3, 4) AS quality
            FROM documents WHERE doc_id % 17 <> 3
        ), rk AS (
            SELECT a.id, q.quality,
                   row_number() OVER (PARTITION BY a.cluster_id
                                      ORDER BY q.quality DESC, a.id) AS rk,
                   count(*) OVER (PARTITION BY a.cluster_id) AS sz
            FROM alllab a JOIN qual q ON a.id = q.id
        ), g4 AS (
            SELECT doc_id, {grams4} AS grams FROM documents
        ), eg AS (
            SELECT DISTINCT unnest(grams) AS gram FROM g4 WHERE doc_id % 17 = 3
        ), train4 AS (
            SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
            FROM g4 WHERE doc_id % 17 <> 3
        ), cont AS (
            SELECT doc_id, count(*) / greatest(n_grams, 1)::DOUBLE AS contamination
            FROM train4 JOIN eg USING (gram) GROUP BY doc_id, n_grams
        ), rx AS (
            SELECT doc_id, unnest({grams3_all}) AS gram
            FROM documents WHERE doc_id % 17 <> 3
        ), rc AS (
            SELECT doc_id, gram, count(*) AS n FROM rx GROUP BY 1, 2
        ), rep AS (
            SELECT doc_id, round(1 - count(*) / sum(n)::DOUBLE, 4) AS rep_ratio
            FROM rc GROUP BY doc_id
        )
        SELECT d.doc_id,
               CASE WHEN r.sz > 1 AND r.rk > 1 THEN 'dup'
                    WHEN round(coalesce(c.contamination, 0), 4) >= 0.5 THEN 'contaminated'
                    WHEN rep.rep_ratio >= 0.05 THEN 'repetitive'
                    WHEN r.quality < 0.9 THEN 'low_quality'
                    ELSE 'kept' END AS verdict
        FROM documents d
        JOIN rk r ON CAST(d.doc_id AS VARCHAR) = r.id
        JOIN rep ON d.doc_id = rep.doc_id
        LEFT JOIN cont c ON d.doc_id = c.doc_id
        WHERE d.doc_id % 17 <> 3
        ORDER BY d.doc_id
    """
    # q44: turn-aligned prefix/containment dedup.  The Spark side joins
    # on running 60-bit prefix hashes then re-verifies texts; the oracle
    # recomputes the SAME pair set the direct way (ordered turn-list
    # slice equality), so a hash-collision false positive or a missed
    # pair on either side breaks the match.
    oracles["q44_prefix_containment_pairs"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
             arr AS (
                SELECT conv_id, list(text ORDER BY turn_idx) AS turns
                FROM tr GROUP BY conv_id
             )
        SELECT a.conv_id AS prefix_conv_id, b.conv_id AS super_conv_id,
               CAST(len(a.turns) AS INT) AS prefix_turns,
               CAST(len(b.turns) AS INT) AS super_turns,
               CASE WHEN len(a.turns) = len(b.turns)
                    THEN 'exact' ELSE 'prefix' END AS relation
        FROM arr a JOIN arr b
          ON a.turns[1] = b.turns[1]
         AND a.conv_id <> b.conv_id
         AND len(a.turns) <= len(b.turns)
         AND (len(a.turns) < len(b.turns) OR a.conv_id < b.conv_id)
         AND a.turns = b.turns[1:len(a.turns)]
        ORDER BY prefix_conv_id, super_conv_id
    """
    # q46: the removal step of q44 -- same direct pair recomputation,
    # then drops = prefix side of 'prefix' pairs + super side of
    # 'exact' pairs, precedence prefix_dup > exact_dup, left-joined
    # back onto the full conv list.
    oracles["q46_prefix_dedup_assignments"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
             arr AS (
                SELECT conv_id, list(text ORDER BY turn_idx) AS turns
                FROM tr GROUP BY conv_id
             ),
             pairs AS (
                SELECT a.conv_id AS prefix_conv_id, b.conv_id AS super_conv_id,
                       CASE WHEN len(a.turns) = len(b.turns)
                            THEN 'exact' ELSE 'prefix' END AS relation
                FROM arr a JOIN arr b
                  ON a.turns[1] = b.turns[1]
                 AND a.conv_id <> b.conv_id
                 AND len(a.turns) <= len(b.turns)
                 AND (len(a.turns) < len(b.turns) OR a.conv_id < b.conv_id)
                 AND a.turns = b.turns[1:len(a.turns)]
             ),
             drops AS (
                SELECT CASE WHEN relation = 'prefix' THEN prefix_conv_id
                            ELSE super_conv_id END AS conv_id,
                       bool_or(relation = 'prefix') AS is_prefix_drop
                FROM pairs GROUP BY 1
             )
        SELECT c.conv_id, CAST(len(c.turns) AS INT) AS n_turns,
               CASE WHEN d.is_prefix_drop THEN 'prefix_dup'
                    WHEN d.is_prefix_drop = FALSE THEN 'exact_dup'
                    ELSE 'kept' END AS verdict
        FROM arr c LEFT JOIN drops d USING (conv_id)
        ORDER BY CAST(c.conv_id AS BIGINT)
    """
    # q45: semantic dedup clusters = q33's exact LSH edge replay closed
    # with the same recursive min-label CTE as q24; keeper = min vec_id
    # (= the component label).
    oracles["q45_semantic_dedup_clusters"] = f"""
        WITH RECURSIVE {ann_codes},
        capped AS (
            SELECT vec_id, tbl, code FROM (
                SELECT vec_id, tbl, code,
                       row_number() OVER (
                           PARTITION BY tbl, code
                           ORDER BY {cap_order_sql("vec_id")}, vec_id) AS rn
                FROM codes
            ) WHERE rn <= {ANN_CAP}
        ), probes AS (
            SELECT vec_id, tbl, unnest({probe_list}) AS code FROM codes
        ), pcands AS (
            SELECT DISTINCT least(p.vec_id, c.vec_id) AS a,
                            greatest(p.vec_id, c.vec_id) AS b
            FROM probes p
            JOIN capped c ON p.tbl = c.tbl AND p.code = c.code
                             AND p.vec_id <> c.vec_id
        ), edges AS (
            SELECT a, b FROM pcands
            JOIN embeddings ea ON pcands.a = ea.vec_id
            JOIN embeddings eb ON pcands.b = eb.vec_id
            WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                         eb.embedding::DOUBLE[]) >= 0.4
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id AS vec_id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), sizes AS (
            SELECT cluster_id, count(*) AS cluster_size
            FROM labels GROUP BY cluster_id
        )
        SELECT l.vec_id, l.cluster_id, s.cluster_size,
               (l.vec_id = l.cluster_id) AS is_keeper
        FROM labels l JOIN sizes s USING (cluster_id)
        ORDER BY l.cluster_id, l.vec_id
    """
    # q47/q48: ExactSubstr cross-document duplicate coverage + removal.
    # Shared scaffolding: every 8-token sliding window per document
    # (same [a-z0-9]+ normalization), windows appearing in >=2 distinct
    # docs are flagged, and covered token mass is the interval union of
    # flagged [pos, pos+8) spans (gaps-and-islands over a running max).
    _XS_WINS = f"""
        tok AS (
            SELECT doc_id, {_NORM_TOKS} AS toks FROM documents
        ), base AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks
            FROM tok WHERE len(toks) >= 8
        ), wins AS (
            SELECT doc_id, n_tokens,
                   unnest(range(0, n_tokens - 8 + 1)) AS pos, toks
            FROM base
        ), wins2 AS (
            SELECT doc_id, n_tokens, pos,
                   array_to_string(toks[pos+1:pos+8], ' ') AS win
            FROM wins
        ), flagged AS (
            SELECT win FROM (SELECT DISTINCT win, doc_id FROM wins2)
            GROUP BY win HAVING count(*) >= 2
        )
    """
    _XS_ISLANDS = """
        marked AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(max(pos + 8) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                        THEN 1 ELSE 0 END AS new_isl
            FROM occ
        ), isl AS (
            SELECT doc_id, pos,
                   sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM marked
        ), agg AS (
            SELECT doc_id, island, max(pos) + 8 - min(pos) AS ilen
            FROM isl GROUP BY 1, 2
        ), cov AS (
            SELECT doc_id, CAST(sum(ilen) AS BIGINT) AS covered FROM agg GROUP BY 1
        )
    """
    oracles["q47_exactsubstr_coverage"] = f"""
        WITH {_XS_WINS}, occ AS (
            SELECT w.doc_id, w.pos FROM wins2 w JOIN flagged USING (win)
        ), {_XS_ISLANDS}
        SELECT b.doc_id, b.n_tokens,
               coalesce(c.covered, 0) AS dup_tokens,
               round(coalesce(c.covered, 0) / CAST(b.n_tokens AS DOUBLE), 4) AS dup_frac
        FROM base b LEFT JOIN cov c USING (doc_id)
        ORDER BY b.doc_id
    """
    oracles["q49_exactsubstr_spans"] = f"""
        WITH {_XS_WINS}, occ AS (
            SELECT w.doc_id, w.pos FROM wins2 w JOIN flagged USING (win)
        ), marked AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(max(pos + 8) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                        THEN 1 ELSE 0 END AS new_isl
            FROM occ
        ), isl AS (
            SELECT doc_id, pos,
                   sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM marked
        )
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 8 AS BIGINT) AS span_end,
               CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens
        FROM isl GROUP BY doc_id, island
        ORDER BY doc_id, span_start
    """
    oracles["q48_exactsubstr_removal"] = f"""
        WITH {_XS_WINS}, occ0 AS (
            SELECT w.doc_id, w.pos, w.win FROM wins2 w JOIN flagged USING (win)
        ), k1 AS (
            SELECT win, min(doc_id) AS kid FROM occ0 GROUP BY win
        ), k2 AS (
            SELECT o.win, k1.kid, min(o.pos) AS kpos
            FROM occ0 o JOIN k1 ON o.win = k1.win AND o.doc_id = k1.kid
            GROUP BY o.win, k1.kid
        ), occ AS (
            SELECT o.doc_id, o.pos FROM occ0 o JOIN k2 ON o.win = k2.win
            WHERE NOT (o.doc_id = k2.kid AND o.pos = k2.kpos)
        ), {_XS_ISLANDS}
        SELECT b.doc_id, b.n_tokens,
               coalesce(c.covered, 0) AS removed_tokens,
               b.n_tokens - coalesce(c.covered, 0) AS kept_tokens
        FROM base b LEFT JOIN cov c USING (doc_id)
        ORDER BY b.doc_id
    """
    # q52 proves the persisted-window-index incremental path against the
    # same full-corpus window replay that checks the batch operator (q47)
    oracles["q52_incremental_exactsubstr_coverage"] = oracles["q47_exactsubstr_coverage"]
    # q50/q51: turn-level template dedup over the derived transcript
    # shape.  md5 is the shared engine-portable fingerprint (q21's
    # convention); a template turn = exact text recurring in >= 2
    # DISTINCT conversations (within-conv repeats don't count).
    oracles["q50_turn_template_dedup"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()})
        SELECT md5(text) AS fp,
               count(DISTINCT conv_id) AS n_convs,
               count(*) AS n_occurrences,
               min(conv_id) AS exemplar_conv,
               min(role) AS role
        FROM tr
        GROUP BY 1
        HAVING count(DISTINCT conv_id) >= 2
    """
    oracles["q51_turn_template_contamination"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
             turns AS (SELECT conv_id, md5(text) AS fp FROM tr),
             tmpl AS (
                SELECT fp, 1 AS _t FROM turns
                GROUP BY fp HAVING count(DISTINCT conv_id) >= 2
             )
        SELECT u.conv_id,
               count(*) AS n_turns,
               CAST(count(t._t) AS BIGINT) AS n_template_turns,
               round(count(t._t) * 1.0 / count(*), 4) AS template_frac
        FROM turns u LEFT JOIN tmpl t USING (fp)
        GROUP BY u.conv_id
    """
    # q53: Gopher quality rules (Rae et al. 2021 A1.1).  Every rule is
    # replayed measurement-for-measurement; per-doc ratios are rounded
    # to 4dp on BOTH sides before the per-source average (mirrors the
    # struct in functions/text.py:gopher_flags).
    from datasketches_server_spark.functions.text import GOPHER_STOPS

    gopher_stops_sql = "['" + "','".join(GOPHER_STOPS) + "']"
    oracles["q53_gopher_quality"] = f"""
        WITH w AS (
            SELECT source, text,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS words,
                   list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) <> '') AS lines
            FROM documents
        ), m AS (
            SELECT source,
                   len(words) AS n_words,
                   round(coalesce(list_sum(list_transform(words, x -> length(x))), 0)
                         / greatest(len(words), 1)::DOUBLE, 4) AS mean_word_len,
                   round(((length(text) - length(replace(text, '#', '')))
                          + (length(text) - length(replace(text, '...', ''))) / 3.0)
                         / greatest(len(words), 1)::DOUBLE, 4) AS symbol_ratio,
                   round(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
                         / greatest(len(words), 1)::DOUBLE, 4) AS alpha_word_frac,
                   len(list_filter({gopher_stops_sql}, s -> list_contains(words, s))) AS stop_hits,
                   round(len(list_filter(lines, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))
                         / greatest(len(lines), 1)::DOUBLE, 4) AS bullet_line_frac,
                   round(len(list_filter(lines, l -> ends_with(rtrim(l), '...')))
                         / greatest(len(lines), 1)::DOUBLE, 4) AS ellipsis_line_frac
            FROM w
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN n_words BETWEEN 50 AND 100000
                              AND mean_word_len BETWEEN 3.0 AND 10.0
                              AND symbol_ratio <= 0.1
                              AND bullet_line_frac <= 0.9
                              AND ellipsis_line_frac <= 0.3
                              AND alpha_word_frac >= 0.8
                              AND stop_hits >= 2
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(sum(CASE WHEN n_words NOT BETWEEN 50 AND 100000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_words,
               CAST(sum(CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stops,
               round(avg(n_words), 4) AS avg_words,
               round(avg(mean_word_len), 4) AS avg_word_len,
               round(avg(alpha_word_frac), 4) AS avg_alpha_frac,
               round(avg(stop_hits), 4) AS avg_stop_hits
        FROM m GROUP BY source ORDER BY source
    """
    # q54: PII scan + redaction proof.  The oracle plants the SAME
    # deterministic matches (doc_id % 7 == 0 gets an email/phone/IP
    # derived from the row's own columns), runs the SAME patterns
    # (RE2-and-Java common subset), and hashes the redacted text --
    # redaction_proof matching means the rewrite is byte-identical.
    _pii_email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    _pii_phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    _pii_ipv4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    oracles["q54_pii_scan"] = f"""
        WITH planted AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact ' || source
                             || '@example.com or 555-867-5309 from 10.0.0.'
                             || (doc_id % 200)::VARCHAR
                        ELSE text END AS text
            FROM documents
        ), scanned AS (
            SELECT source,
                   len(regexp_extract_all(text, '{_pii_email}')) AS n_email,
                   len(regexp_extract_all(text, '{_pii_phone}')) AS n_phone,
                   len(regexp_extract_all(text, '{_pii_ipv4}')) AS n_ipv4,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                        '{_pii_email}', '<EMAIL>', 'g'),
                        '{_pii_phone}', '<PHONE>', 'g'),
                        '{_pii_ipv4}', '<IPV4>', 'g')) AS redacted_fp
            FROM planted
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_email) AS BIGINT) AS n_email,
               CAST(sum(n_phone) AS BIGINT) AS n_phone,
               CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
               md5(string_agg(redacted_fp, '|' ORDER BY redacted_fp)) AS redaction_proof
        FROM scanned GROUP BY source ORDER BY source
    """
    # q55/q56: both replay the exact all->=0.7-jaccard pair set (the
    # same inverted-gram-index CTE the q24 closure oracle uses).  Green
    # hashes re-prove candidate recall 1.0 at the design threshold --
    # the sweep only looks ABOVE it, so higher cutoffs are subsets of
    # the verified edge set on both engines.
    _scored_pairs = f"""
        WITH g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), scored AS (
            SELECT a, b, i / CAST(sa.n + sb.n - i AS DOUBLE) AS j
            FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        )"""
    oracles["q55_jaccard_threshold_sweep"] = f"""
        {_scored_pairs}, th AS (
            SELECT unnest([0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS threshold
        ), e AS (
            SELECT th.threshold, s.a, s.b, s.j
            FROM th JOIN scored s ON s.j >= th.threshold
        ), pairs AS (
            SELECT threshold, count(*) AS n_pairs,
                   CAST(sum(CAST(round(j * 10000) AS BIGINT)) AS BIGINT) AS sum_j_e4
            FROM e GROUP BY threshold
        ), docs AS (
            SELECT threshold, count(DISTINCT id) AS n_dup_docs FROM (
                SELECT threshold, a AS id FROM e
                UNION ALL SELECT threshold, b FROM e
            ) GROUP BY threshold
        )
        SELECT CAST(p.threshold AS DOUBLE) AS threshold, n_pairs, n_dup_docs, sum_j_e4
        FROM pairs p JOIN docs USING (threshold) ORDER BY threshold
    """
    oracles["q56_cross_source_leakage"] = f"""
        {_scored_pairs}
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               count(*) AS n_pairs
        FROM scored e
        JOIN documents da ON CAST(da.doc_id AS VARCHAR) = e.a
        JOIN documents db ON CAST(db.doc_id AS VARCHAR) = e.b
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # q57: replay the planted loop (convs % 11 get turns 2..5 rewritten
    # to one constant assistant line), then the same gaps-and-islands:
    # row_number difference is constant within one consecutive run.
    oracles["q57_agent_loop_detection"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        p AS (
            SELECT conv_id, turn_idx,
                   coalesce(CASE WHEN CAST(conv_id AS BIGINT) % 11 = 0
                                      AND turn_idx BETWEEN 2 AND 5
                                 THEN 'assistant' ELSE role END, '<norole>')
                   || '|' ||
                   coalesce(md5(CASE WHEN CAST(conv_id AS BIGINT) % 11 = 0
                                          AND turn_idx BETWEEN 2 AND 5
                                     THEN 'i will retry the same action now'
                                     ELSE text END), '<notext>') AS sig
            FROM tr
        ), m AS (
            SELECT conv_id, sig,
                   CASE WHEN lag(sig) OVER w = sig THEN 1 ELSE 0 END AS is_repeat,
                   row_number() OVER w
                   - row_number() OVER (PARTITION BY conv_id, sig ORDER BY turn_idx) AS run_id
            FROM p WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ), runs AS (
            SELECT conv_id, count(*) AS run_len FROM m GROUP BY conv_id, sig, run_id
        ), per_run AS (
            SELECT conv_id, max(run_len) AS max_run FROM runs GROUP BY conv_id
        )
        SELECT m.conv_id,
               count(*) AS n_turns,
               CAST(sum(is_repeat) AS BIGINT) AS n_repeat_turns,
               CAST(any_value(max_run) AS BIGINT) AS max_run,
               any_value(max_run) >= 3 AS loop_flag
        FROM m JOIN per_run ON m.conv_id = per_run.conv_id
        GROUP BY m.conv_id ORDER BY m.conv_id
    """
    # q58: replay the planted corruption (dropped turns -> gaps, forced
    # roles -> alternation violations, blanked texts -> empty turns).
    oracles["q58_transcript_structure_audit"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        p AS (
            SELECT conv_id, turn_idx,
                   CASE WHEN (CAST(conv_id AS BIGINT) + turn_idx) % 17 = 0
                        THEN 'user' ELSE role END AS role,
                   CASE WHEN (CAST(conv_id AS BIGINT) + turn_idx) % 19 = 0
                        THEN '' ELSE text END AS text
            FROM tr
            WHERE (CAST(conv_id AS BIGINT) * 31 + turn_idx) % 13 <> 0
        ), m AS (
            SELECT conv_id, turn_idx,
                   CASE WHEN trim(coalesce(text, '')) = '' THEN 1 ELSE 0 END AS is_empty,
                   CASE WHEN lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) = role
                        THEN 1 ELSE 0 END AS same_role
            FROM p
        )
        SELECT conv_id,
               count(*) AS n_turns,
               (min(turn_idx) <> 0 OR max(turn_idx) <> count(*) - 1
                OR count(DISTINCT turn_idx) <> count(*)) AS has_gap,
               CAST(sum(same_role) AS BIGINT) AS n_role_violations,
               CAST(sum(is_empty) AS BIGINT) AS n_empty_turns
        FROM m GROUP BY conv_id ORDER BY conv_id
    """
    # q59: replay the planted tool names + timestamp jitter, lead() over
    # ALL turns (latency = next turn's ts - this turn's), then exact
    # interpolated quantiles (Spark percentile == DuckDB quantile_cont).
    oracles["q59_tool_latency"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        p AS (
            SELECT conv_id, turn_idx,
                   CASE WHEN role = 'assistant'
                             AND (CAST(conv_id AS BIGINT) + turn_idx) % 5 = 0
                        THEN (['search', 'python', 'browser'])
                             [(CAST(conv_id AS BIGINT) + turn_idx) % 3 + 1]
                        ELSE NULL END AS tool,
                   ts + ((CAST(conv_id AS BIGINT) * 31 + turn_idx) % 9)
                        * INTERVAL 1 SECOND AS ts
            FROM tr
        ), lat AS (
            SELECT tool, conv_id,
                   epoch(lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx))
                   - epoch(ts) AS latency_s
            FROM p
        )
        SELECT tool,
               count(*) AS n_calls,
               count(DISTINCT conv_id) AS n_convs,
               round(quantile_cont(latency_s, 0.5), 4) AS p50_latency_s,
               round(quantile_cont(latency_s, 0.95), 4) AS p95_latency_s,
               round(avg(latency_s), 4) AS avg_latency_s
        FROM lat
        WHERE tool IS NOT NULL AND latency_s IS NOT NULL
        GROUP BY tool ORDER BY tool
    """
    # q60: replay the n^0.5 allocation (rates rounded to 6dp on both
    # sides BEFORE the accept gate) and the portable u01 draw.
    _mix_u01 = u01_sql("CAST(doc_id AS VARCHAR)", salt="mix|")
    oracles["q60_temperature_mix"] = f"""
        WITH w AS (
            SELECT source, count(*) AS n_docs,
                   pow(count(*)::DOUBLE, 0.5) AS wgt
            FROM documents GROUP BY source
        ), tot AS (
            SELECT sum(wgt) AS wgt_sum, sum(n_docs)::DOUBLE AS n_tot FROM w
        ), rates AS (
            SELECT source, n_docs,
                   round(least(1.0::DOUBLE,
                               0.2 * n_tot * wgt / (wgt_sum * n_docs::DOUBLE)), 6) AS rate
            FROM w CROSS JOIN tot
        ), acc AS (
            SELECT d.source, count(*) AS n_sampled
            FROM documents d JOIN rates r ON d.source = r.source
            WHERE {_mix_u01} <= r.rate
            GROUP BY d.source
        )
        SELECT r.source, r.n_docs, r.rate,
               CAST(coalesce(a.n_sampled, 0) AS BIGINT) AS n_sampled
        FROM rates r LEFT JOIN acc a ON r.source = a.source
        ORDER BY r.source
    """
    # q61: the q24 closure replayed WITH its edge scores -- per-cluster
    # cohesion (weakest/total edge jaccard as integer e4, density).
    oracles["q61_cluster_cohesion"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), scored AS (
            SELECT a, b, i / CAST(sa.n + sb.n - i AS DOUBLE) AS j
            FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM scored UNION ALL SELECT b AS a, a AS b FROM scored
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), e AS (
            SELECT l.cluster_id, CAST(round(s.j * 10000) AS BIGINT) AS j_e4
            FROM scored s JOIN labels l ON s.a = l.id
        ), per_edge AS (
            SELECT cluster_id, count(*) AS n_edges,
                   min(j_e4) AS min_j_e4,
                   CAST(sum(j_e4) AS BIGINT) AS sum_j_e4
            FROM e GROUP BY cluster_id
        ), sizes AS (
            SELECT cluster_id, count(*) AS cluster_size
            FROM labels GROUP BY cluster_id HAVING count(*) > 1
        )
        SELECT s.cluster_id, s.cluster_size, p.n_edges,
               round(p.n_edges / (s.cluster_size * (s.cluster_size - 1) / 2.0), 4)
                   AS edge_density,
               p.min_j_e4, p.sum_j_e4
        FROM sizes s JOIN per_edge p USING (cluster_id)
        ORDER BY s.cluster_id
    """
    # q62: the exact pair set + conv start days (min ts per conv from
    # the same transcript derivation), bucketed by day distance.
    oracles["q62_temporal_leakage"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        days AS (
            SELECT conv_id, CAST(min(ts) AS DATE) AS day FROM tr GROUP BY conv_id
        ), g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), scored AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), e AS (
            SELECT abs(date_diff('day', db.day, da.day)) AS day_diff
            FROM scored s
            JOIN days da ON s.a = da.conv_id
            JOIN days db ON s.b = db.conv_id
        )
        SELECT CASE WHEN day_diff = 0 THEN 'same_day'
                    WHEN day_diff <= 7 THEN 'within_week'
                    ELSE 'later' END AS window,
               count(*) AS n_pairs,
               CAST(sum(day_diff) AS BIGINT) AS sum_day_diff,
               CAST(max(day_diff) AS BIGINT) AS max_day_diff
        FROM e GROUP BY 1 ORDER BY 1
    """
    # q66: the q24 exact closure gives cluster labels; every doc's split
    # unit is its cluster (own id when unlabeled), and the split draw is
    # the portable u01 of the unit -- identical arithmetic to the Spark
    # plan, so assignments hash-match bit-for-bit.
    _split_u01 = u01_sql("split_unit", salt="split|")
    oracles["q66_cluster_safe_split"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), u AS (
            SELECT CAST(d.doc_id AS VARCHAR) AS conv_id,
                   coalesce(l.cluster_id, CAST(d.doc_id AS VARCHAR)) AS split_unit
            FROM documents d
            LEFT JOIN labels l ON CAST(d.doc_id AS VARCHAR) = l.id
        )
        SELECT conv_id, split_unit,
               CASE WHEN {_split_u01} <= 0.1 THEN 'eval' ELSE 'train' END AS split
        FROM u ORDER BY conv_id
    """
    # q67: the identical container plant (doc_id % 23 == 0 concatenated
    # with the next doc's text, shadow id + 10^6), then exact containment
    # over distinct word 3-grams via the same inverted-index join.
    oracles["q67_containment_dedup"] = f"""
        WITH planted AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT a.doc_id + 1000000 AS doc_id, a.text || ' ' || b.text AS text
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id % 23 = 0
        ), g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM planted
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), scored AS (
            SELECT CASE WHEN sb.n < sa.n THEN b ELSE a END AS contained,
                   CASE WHEN sb.n < sa.n THEN a ELSE b END AS container,
                   CAST(i AS BIGINT) AS n_inter,
                   round(i / CAST(least(sa.n, sb.n) AS DOUBLE), 4) AS containment,
                   round(i / CAST(sa.n + sb.n - i AS DOUBLE), 4) AS jaccard
            FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
        )
        SELECT * FROM scored WHERE containment >= 0.9
        ORDER BY contained, container
    """
    # q68: the naive formulation -- ONE global-order running sum (fine
    # in DuckDB at oracle scale); the Spark plan's bucket decomposition
    # must match it doc for doc.
    _qual4 = f"""round((CASE WHEN len({_NORM_TOKS}) BETWEEN 10 AND 5000 THEN 1.0
                             WHEN len({_NORM_TOKS}) < 10 THEN len({_NORM_TOKS}) / 10.0
                             ELSE 5000.0 / len({_NORM_TOKS}) END
                        + CASE WHEN length(text) / greatest(len({_NORM_TOKS}), 1)::DOUBLE BETWEEN 3 AND 12
                               THEN 1.0 ELSE 0.5 END
                        + 1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
                                      / greatest(length(text), 1)::DOUBLE * 4, 1.0)
                       ) / 3, 4)"""
    oracles["q68_token_budget_select"] = f"""
        WITH t AS (
            SELECT doc_id, {_qual4} AS quality,
                   CAST(len({_NORM_TOKS}) AS BIGINT) AS n_tok
            FROM documents
        ), b AS (
            SELECT CAST(floor(sum(n_tok) * 0.25) AS BIGINT) AS budget FROM t
        ), c AS (
            SELECT doc_id, quality, n_tok,
                   sum(n_tok) OVER (ORDER BY quality DESC, doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
            FROM t
        )
        SELECT doc_id, quality, n_tok FROM c, b WHERE cum <= budget
        ORDER BY quality DESC, doc_id
    """
    # q69: identical stride arithmetic and 1-based inclusive list slice.
    oracles["q69_chunk_documents"] = f"""
        WITH t AS (
            SELECT doc_id, {_NORM_TOKS} AS toks FROM documents
        ), k AS (
            SELECT doc_id, toks, len(toks) AS n,
                   (greatest(len(toks) - 64, 0) + 47) // 48 AS klast
            FROM t
        ), e AS (
            SELECT doc_id, toks, n, unnest(range(0, klast + 1)) AS i FROM k
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * 48 AS BIGINT) AS start_tok,
               CAST(least(64, n - i * 48) AS BIGINT) AS chunk_len,
               array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk_text
        FROM e ORDER BY doc_id, chunk_idx
    """
    # q70: retraction == full recompute -- the exact closure over the
    # FILTERED corpus (doc_id % 13 <> 0 survivors), every surviving doc
    # labeled (own id when unclustered), the same >=0.7 jaccard + CC
    # arithmetic as q24.
    oracles["q70_retract_dedup"] = f"""
        WITH RECURSIVE d AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0
        ), g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM d
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        )
        SELECT CAST(d.doc_id AS VARCHAR) AS conv_id,
               coalesce(l.cluster_id, CAST(d.doc_id AS VARCHAR)) AS cluster_id
        FROM d LEFT JOIN labels l ON CAST(d.doc_id AS VARCHAR) = l.id
        ORDER BY conv_id
    """
    # q71: ALL exact >=0.7-jaccard pairs BETWEEN the train side
    # (doc_id % 17 <> 0) and the eval side (doc_id % 17 = 0) -- the
    # cross-corpus replay of the q24 pair arithmetic.
    oracles["q71_cross_corpus_decontam"] = f"""
        WITH t AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams
            FROM documents WHERE doc_id % 17 <> 0
        ), e AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams
            FROM documents WHERE doc_id % 17 = 0
        ), xt AS (
            SELECT id, unnest(grams) AS gram FROM t
        ), xe AS (
            SELECT id, unnest(grams) AS gram FROM e
        ), inter AS (
            SELECT xt.id AS a, xe.id AS b, count(*) AS i
            FROM xt JOIN xe ON xt.gram = xe.gram GROUP BY 1, 2
        ), szt AS (
            SELECT id, len(grams) AS n FROM t
        ), sze AS (
            SELECT id, len(grams) AS n FROM e
        )
        SELECT a AS train_conv_id, b AS eval_conv_id,
               round(i / CAST(st.n + se.n - i AS DOUBLE), 4) AS jaccard
        FROM inter
        JOIN szt st ON inter.a = st.id
        JOIN sze se ON inter.b = se.id
        WHERE i / CAST(st.n + se.n - i AS DOUBLE) >= 0.7
        ORDER BY train_conv_id, eval_conv_id
    """
    # q72: q38's exact closure + keeper argmax, rolled up per source
    # (docs/tokens kept vs dropped).  Docs with no near-dup edge are
    # singletons -> kept.
    oracles["q72_dedup_impact_by_source"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), qual AS (
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   round((CASE WHEN len({_NORM_TOKS}) BETWEEN 10 AND 5000 THEN 1.0
                               WHEN len({_NORM_TOKS}) < 10 THEN len({_NORM_TOKS}) / 10.0
                               ELSE 5000.0 / len({_NORM_TOKS}) END
                      + CASE WHEN length(text) / greatest(len({_NORM_TOKS}), 1)::DOUBLE BETWEEN 3 AND 12
                             THEN 1.0 ELSE 0.5 END
                      + 1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
                                    / greatest(length(text), 1)::DOUBLE * 4, 1.0)
                     ) / 3, 4) AS quality
            FROM documents
        ), rk AS (
            SELECT l.id,
                   row_number() OVER (PARTITION BY l.cluster_id
                                      ORDER BY q.quality DESC, l.id) AS rk
            FROM labels l JOIN qual q ON l.id = q.id
        ), verdict AS (
            SELECT CAST(d.doc_id AS VARCHAR) AS id, d.source,
                   CAST(len({_NORM_TOKS}) AS BIGINT) AS n_tokens,
                   coalesce(rk.rk > 1, FALSE) AS dropped
            FROM documents d LEFT JOIN rk ON CAST(d.doc_id AS VARCHAR) = rk.id
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
               CAST(sum(CASE WHEN dropped THEN 0 ELSE n_tokens END) AS BIGINT) AS tokens_kept,
               round(sum(CASE WHEN dropped THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS drop_rate
        FROM verdict
        GROUP BY source ORDER BY source
    """
    # q73: the per-train-doc removal verdict over q71's exact pair set --
    # match count, strongest jaccard, and the argmax eval conv (ties by
    # smallest eval id, mirroring Spark's min-struct argmax).
    oracles["q73_decontam_removal_verdict"] = f"""
        WITH t AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams
            FROM documents WHERE doc_id % 17 <> 0
        ), e AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams
            FROM documents WHERE doc_id % 17 = 0
        ), xt AS (
            SELECT id, unnest(grams) AS gram FROM t
        ), xe AS (
            SELECT id, unnest(grams) AS gram FROM e
        ), inter AS (
            SELECT xt.id AS a, xe.id AS b, count(*) AS i
            FROM xt JOIN xe ON xt.gram = xe.gram GROUP BY 1, 2
        ), szt AS (
            SELECT id, len(grams) AS n FROM t
        ), sze AS (
            SELECT id, len(grams) AS n FROM e
        ), pairs AS (
            SELECT a AS train_conv_id, b AS eval_conv_id,
                   round(i / CAST(st.n + se.n - i AS DOUBLE), 4) AS jaccard
            FROM inter
            JOIN szt st ON inter.a = st.id
            JOIN sze se ON inter.b = se.id
            WHERE i / CAST(st.n + se.n - i AS DOUBLE) >= 0.7
        ), best AS (
            SELECT train_conv_id, eval_conv_id,
                   row_number() OVER (PARTITION BY train_conv_id
                                      ORDER BY jaccard DESC, eval_conv_id) AS rk
            FROM pairs
        )
        SELECT p.train_conv_id,
               count(*) AS n_eval_matches,
               round(max(p.jaccard), 4) AS max_jaccard,
               min(b.eval_conv_id) AS worst_eval_conv
        FROM pairs p
        JOIN best b ON p.train_conv_id = b.train_conv_id AND b.rk = 1
        GROUP BY p.train_conv_id
        ORDER BY p.train_conv_id
    """
    # q74: corpus boilerplate -- 8-grams by distinct-doc spread, total
    # occurrences as the tiebreak, gram as the deterministic last key.
    grams8_all = word_grams_all_sql(_NORM_TOKS, 8)
    oracles["q74_boilerplate_ngrams"] = f"""
        WITH allg AS (
            SELECT doc_id, unnest({grams8_all}) AS gram FROM documents
        )
        SELECT gram,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM allg
        GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 3
        ORDER BY n_docs DESC, n_occurrences DESC, gram
        LIMIT 20
    """
    # q75: q33's exact LSH replay restricted per side -- caps rank within
    # the TRAIN side only, probes come from the EVAL side only, pairs
    # stay side-typed (no least/greatest).
    oracles["q75_semantic_cross_decontam"] = f"""
        WITH {ann_codes},
        capped AS (
            SELECT vec_id, tbl, code FROM (
                SELECT vec_id, tbl, code,
                       row_number() OVER (
                           PARTITION BY tbl, code
                           ORDER BY {cap_order_sql("vec_id")}, vec_id) AS rn
                FROM codes WHERE vec_id % 7 <> 0
            ) WHERE rn <= {ANN_CAP}
        ), probes AS (
            SELECT vec_id, tbl, unnest({probe_list}) AS code
            FROM codes WHERE vec_id % 7 = 0
        ), cands AS (
            SELECT DISTINCT c.vec_id AS a, p.vec_id AS b
            FROM probes p
            JOIN capped c ON p.tbl = c.tbl AND p.code = c.code
        )
        SELECT cands.a AS train_vec_id, cands.b AS eval_vec_id,
               round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                            eb.embedding::DOUBLE[]), 4) AS cosine
        FROM cands
        JOIN embeddings ea ON cands.a = ea.vec_id
        JOIN embeddings eb ON cands.b = eb.vec_id
        WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                     eb.embedding::DOUBLE[]) >= 0.4
        ORDER BY train_vec_id, eval_vec_id
    """
    # q76: C4 cleaning rules (Raffel et al. 2020 SS2.2).  The planted
    # page is rebuilt byte-identically (doc_id-arithmetic schedule), then
    # every line keep (terminal punct, >= 5 words, javascript, policy
    # phrases) and page drop (< 3 sentences, lorem ipsum, curly brace)
    # is replayed measurement-for-measurement.  Plain string: the page
    # plant contains literal braces.
    oracles["q76_c4_filters"] = """
        WITH planted AS (
            SELECT source,
                   'The quick brown fox jumps over the lazy dog near ' || source || '.'
                   || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'enable javascript to view this content properly today.' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'too short line.' ELSE '' END
                   || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'this website uses cookies and has a privacy policy.' ELSE '' END
                   || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet consectetur adipiscing elit.' ELSE '' END
                   || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'function f() { return 1; }' ELSE '' END
                   || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'Here is another well formed sentence for the corpus.' ELSE '' END
                   || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'And a third complete sentence closes the page nicely.' ELSE '' END
                   || chr(10) || substr(text, 1, 100) AS text
            FROM documents
        ), lns AS (
            SELECT source, text,
                   list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
            FROM planted
        ), kept AS (
            SELECT source, text, lines,
                   list_filter(lines, l ->
                       right(rtrim(l), 1) IN ('.', '!', '?', '"')
                       AND len(list_filter(regexp_split_to_array(trim(lower(l)), '\\s+'), w -> w <> '')) >= 5
                       AND NOT contains(lower(l), 'javascript')
                       AND NOT contains(lower(l), 'terms of use')
                       AND NOT contains(lower(l), 'privacy policy')
                       AND NOT contains(lower(l), 'cookie policy')
                       AND NOT contains(lower(l), 'uses cookies')
                   ) AS keep
            FROM lns
        ), m AS (
            SELECT source,
                   len(lines) AS n_lines,
                   len(keep) AS n_kept,
                   round(len(keep) / greatest(len(lines), 1)::DOUBLE, 4) AS kept_line_frac,
                   CAST(coalesce(list_sum(list_transform(keep, l ->
                       (length(l) - length(replace(l, '.', '')))
                       + (length(l) - length(replace(l, '!', '')))
                       + (length(l) - length(replace(l, '?', ''))))), 0) AS BIGINT) AS n_sentences,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(text, '{') AS has_brace
            FROM kept
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(sum(CASE WHEN n_sentences < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_sentences,
               CAST(sum(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS BIGINT) AS n_lorem,
               CAST(sum(CASE WHEN has_brace THEN 1 ELSE 0 END) AS BIGINT) AS n_brace,
               CAST(sum(n_lines) AS BIGINT) AS sum_lines,
               CAST(sum(n_kept) AS BIGINT) AS sum_kept_lines,
               round(avg(kept_line_frac), 4) AS avg_kept_frac,
               round(avg(n_sentences), 4) AS avg_sentences
        FROM m GROUP BY source ORDER BY source
    """
    # q77: chunk-level dedup.  Same chunk arithmetic as q69; the oracle
    # groups by chunk_text itself (the engine keys on md5(chunk_text) --
    # identical equivalence classes, narrower shuffle).
    oracles["q77_duplicate_chunks"] = f"""
        WITH t AS (
            SELECT doc_id, {_NORM_TOKS} AS toks FROM documents
        ), k AS (
            SELECT doc_id, toks, len(toks) AS n,
                   (greatest(len(toks) - 64, 0) + 47) // 48 AS klast
            FROM t
        ), e AS (
            SELECT doc_id, toks, n, unnest(range(0, klast + 1)) AS i FROM k
        ), chunks AS (
            SELECT doc_id,
                   array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk_text
            FROM e
        ), spread AS (
            SELECT chunk_text, count(DISTINCT doc_id) AS nd
            FROM chunks GROUP BY chunk_text
        )
        SELECT c.doc_id,
               count(*) AS n_chunks,
               CAST(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
               round(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
                   AS dup_chunk_frac
        FROM chunks c JOIN spread s USING (chunk_text)
        GROUP BY c.doc_id ORDER BY c.doc_id
    """
    # q78: encoding hygiene.  Same planted corruption (chr(65533) is
    # U+FFFD, chr(7) is BEL), same regex classes (RE2-and-Java common
    # subset), same 4dp rounding before the gate.
    oracles["q78_encoding_hygiene"] = """
        WITH planted AS (
            SELECT source,
                   text
                   || CASE WHEN doc_id % 9 = 0
                           THEN chr(65533) || chr(65533) || ' broken decode ' || chr(65533)
                           ELSE '' END
                   || CASE WHEN doc_id % 10 = 0
                           THEN chr(7) || chr(7) || ' raw control bytes'
                           ELSE '' END AS text
            FROM documents
        ), m AS (
            SELECT source,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, chr(65533))) AS n_repl,
                   len(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS n_ctrl,
                   round(len(regexp_extract_all(text, chr(65533)))
                         / greatest(length(text), 1)::DOUBLE, 4) AS repl_frac,
                   round(len(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]'))
                         / greatest(length(text), 1)::DOUBLE, 4) AS ctrl_frac
            FROM planted
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN repl_frac > 0.0005 OR ctrl_frac > 0.0005
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
               CAST(sum(n_repl) AS BIGINT) AS sum_replacement,
               CAST(sum(n_ctrl) AS BIGINT) AS sum_control,
               round(avg(repl_frac), 4) AS avg_repl_frac,
               round(avg(ctrl_frac), 4) AS avg_ctrl_frac
        FROM m GROUP BY source ORDER BY source
    """
    # q79: vocabulary profile.  Same normalized tokenizer as the engine
    # ([a-z0-9]+ matches == splitting on non-alphanumeric runs).
    oracles["q79_vocabulary_profile"] = f"""
        WITH tok AS (
            SELECT source, unnest({_NORM_TOKS}) AS tok FROM documents
        ), tc AS (
            SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok
        ), prof AS (
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS total_tokens,
                   count(*) AS vocab_size,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count
            FROM tc GROUP BY source
        ), nd AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        )
        SELECT p.source, nd.n_docs, p.total_tokens, p.vocab_size, p.hapax_count,
               round(p.vocab_size * 1.0 / p.total_tokens, 4) AS ttr,
               round(p.hapax_count * 1.0 / p.vocab_size, 4) AS hapax_frac
        FROM prof p JOIN nd USING (source) ORDER BY source
    """
    # q80: incremental semantic dedup must equal the FULL-corpus
    # recompute -- q45's oracle verbatim (same config, whole table).
    oracles["q80_incremental_semantic_dedup"] = oracles["q45_semantic_dedup_clusters"]
    # q81: semantic retraction == full recompute over survivors -- q45's
    # oracle with the removal filter injected at the codes CTE (the
    # rerank joins gather by candidate id, so filtering the code source
    # filters the whole replay).
    oracles["q81_retract_semantic_dedup"] = oracles["q45_semantic_dedup_clusters"].replace(
        "FROM embeddings",
        "FROM (SELECT * FROM embeddings WHERE vec_id % 13 <> 0) embeddings",
    )

    # q82: Bloom prefilter + exact verify is EXACT by construction, so
    # the oracle is the plain semi-join the Bloom index exists to avoid
    # at corpus scale.  Same fp as q21 (md5 over normalized tokens);
    # the re-crawl plant (base docs with doc_id % 10 == 1 re-arriving
    # under fresh ids) is replayed verbatim.
    oracles["q82_bloom_seen_filter"] = f"""
        WITH n AS (
            SELECT doc_id, md5(array_to_string({_NORM_TOKS}, ' ')) AS fp
            FROM documents
        ), base AS (
            SELECT DISTINCT fp FROM n WHERE doc_id % 5 <> 0
        ), batch AS (
            SELECT doc_id, fp FROM n WHERE doc_id % 5 = 0
            UNION ALL
            SELECT doc_id + 1000000, fp FROM n WHERE doc_id % 10 = 1
        )
        SELECT doc_id, fp IN (SELECT fp FROM base) AS seen_before
        FROM batch ORDER BY doc_id
    """

    # q83: cluster-drift after an absorb.  Final labels = q24's exact
    # whole-corpus closure; OLD labels = the same closure restricted to
    # both-endpoints-in-base edges (exact pair existence depends only on
    # the two docs, so the base subgraph IS the base-only closure).
    # Singleton old docs are their own part (label = id).
    oracles["q83_absorb_impact_report"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), alldocs AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, doc_id % 5 = 0 AS is_new
            FROM documents
        ), fin AS (
            SELECT a.id, COALESCE(l.cluster_id, a.id) AS cluster_id, a.is_new
            FROM alldocs a LEFT JOIN labels l ON a.id = l.id
        ), bedges AS (
            SELECT a, b FROM edges
            WHERE CAST(a AS BIGINT) % 5 <> 0 AND CAST(b AS BIGINT) % 5 <> 0
        ), bsym AS (
            SELECT a, b FROM bedges UNION ALL SELECT b AS a, a AS b FROM bedges
        ), bcc(id, lbl) AS (
            SELECT DISTINCT a, a FROM bsym
            UNION
            SELECT s.b, bcc.lbl FROM bcc JOIN bsym s ON bcc.id = s.a
        ), blabels AS (
            SELECT id, min(lbl) AS old_cluster FROM bcc GROUP BY id
        ), oldlab AS (
            SELECT f.id, f.cluster_id, COALESCE(b.old_cluster, f.id) AS old_cluster
            FROM fin f LEFT JOIN blabels b ON f.id = b.id
            WHERE NOT f.is_new
        ), szt AS (
            SELECT cluster_id, count(*) AS n_docs,
                   CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new
            FROM fin GROUP BY 1 HAVING count(*) > 1
        ), parts AS (
            SELECT cluster_id, CAST(count(DISTINCT old_cluster) AS BIGINT) AS n_old_parts
            FROM oldlab GROUP BY 1
        )
        SELECT s.cluster_id, s.n_docs, s.n_new,
               COALESCE(p.n_old_parts, 0) AS n_old_parts,
               CASE WHEN s.n_new = s.n_docs THEN 'new'
                    WHEN COALESCE(p.n_old_parts, 0) > 1 THEN 'merged'
                    WHEN s.n_new > 0 THEN 'grown'
                    ELSE 'stable' END AS verdict
        FROM szt s LEFT JOIN parts p ON s.cluster_id = p.cluster_id
        ORDER BY s.cluster_id
    """

    # q84: q24's exact closure, then exact 3-gram jaccard over every
    # intra-cluster pair (clusters of size 2..64 -- the engine's
    # DIAMETER_CAP replayed).  j_e4 integerized exactly as q55.
    oracles["q84_cluster_diameter_audit"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), mem AS (
            SELECT COALESCE(l.cluster_id, g.id) AS cluster_id, g.id, g.grams
            FROM g LEFT JOIN labels l ON g.id = l.id
        ), sized AS (
            SELECT cluster_id, count(*) AS n_members FROM mem
            GROUP BY 1 HAVING count(*) BETWEEN 2 AND 64
        ), m AS (
            SELECT mem.*, sized.n_members FROM mem JOIN sized USING (cluster_id)
        ), p AS (
            SELECT xx.cluster_id, xx.n_members,
                   CAST(round(
                       len(list_intersect(xx.grams, yy.grams))
                       / CAST(len(xx.grams) + len(yy.grams)
                              - len(list_intersect(xx.grams, yy.grams)) AS DOUBLE)
                       * 10000) AS BIGINT) AS j_e4
            FROM m xx JOIN m yy
              ON xx.cluster_id = yy.cluster_id AND xx.id < yy.id
        )
        SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
               count(*) AS n_pairs, min(j_e4) AS min_j_e4,
               CAST(sum(j_e4) AS BIGINT) AS sum_j_e4
        FROM p GROUP BY 1, 2 ORDER BY cluster_id
    """

    # q85: replay the planted 45-min pauses (cumulative shift keeps ts
    # monotone), the 30-min boundary rule, and the per-session rollup.
    oracles["q85_sessionize"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        sh AS (
            SELECT conv_id, turn_idx,
                   epoch(ts) + 2700.0 * sum(
                       CASE WHEN (CAST(conv_id AS BIGINT) * 17 + turn_idx) % 7 = 0
                                 AND turn_idx > 0 THEN 1 ELSE 0 END
                   ) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS ts2
            FROM tr
        ), b AS (
            SELECT conv_id, turn_idx, ts2,
                   CASE WHEN ts2 - lag(ts2) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                             > 1800.0 THEN 1 ELSE NULL END AS new_sess
            FROM sh
        ), s AS (
            SELECT conv_id,
                   COALESCE(sum(new_sess) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0)
                   + 1 AS session_id
            FROM b
        ), sess AS (
            SELECT conv_id, session_id, count(*) AS n_turns
            FROM s GROUP BY 1, 2
        )
        SELECT conv_id,
               sum(n_turns) AS total_turns,
               CAST(max(session_id) AS BIGINT) AS n_sessions,
               max(n_turns) AS max_session_turns,
               round(avg(n_turns), 4) AS avg_session_turns
        FROM sess GROUP BY conv_id
        ORDER BY CAST(conv_id AS BIGINT)
    """

    # q86: replay the planted tool turns, the lead() transition pairs,
    # and the per-source share (integer e4).
    oracles["q86_role_transitions"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        p AS (
            SELECT conv_id, turn_idx,
                   CASE WHEN role = 'assistant'
                             AND (CAST(conv_id AS BIGINT) + turn_idx) % 11 = 0
                        THEN 'tool' ELSE role END AS from_role
            FROM tr
        ), steps AS (
            SELECT p.conv_id, p.from_role,
                   lead(p.from_role) OVER (PARTITION BY p.conv_id ORDER BY p.turn_idx)
                   AS to_role
            FROM p
        ), j AS (
            SELECT d.source, s.from_role, s.to_role
            FROM steps s JOIN documents d ON s.conv_id = CAST(d.doc_id AS VARCHAR)
            WHERE s.to_role IS NOT NULL
        ), c AS (
            SELECT source, from_role, to_role, count(*) AS n FROM j GROUP BY 1, 2, 3
        )
        SELECT source, from_role, to_role, n,
               CAST(round(n / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE)
                          * 10000) AS BIGINT) AS share_e4
        FROM c ORDER BY source, from_role, to_role
    """

    # q87: the naive global-order window (the engine's bucket-decomposed
    # two-level cumsum must equal it doc for doc), integer // division.
    oracles["q87_shard_manifest"] = f"""
        WITH t AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(len({_NORM_TOKS}) AS BIGINT) AS n_tok
            FROM documents
        ), c AS (
            SELECT doc_id, n_tok,
                   sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS tok_before
            FROM t
        ), a AS (
            SELECT doc_id, n_tok,
                   CAST(tok_before // 20000 AS BIGINT) AS shard_id
            FROM c
        )
        SELECT shard_id, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM a GROUP BY shard_id ORDER BY shard_id
    """

    # q88: exact inter-source trigram Jaccard -- same normalized-token +
    # distinct-gram semantics as the Spark side (portable.word_grams).
    oracles["q88_source_overlap_matrix"] = f"""
        WITH g AS (
            SELECT DISTINCT source, gram FROM (
                SELECT source, unnest({grams3}) AS gram FROM documents)
        ), sz AS (
            SELECT source, count(*) AS n FROM g GROUP BY 1
        ), inter AS (
            SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
            FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, n_common,
               round(n_common / CAST(sa.n + sb.n - n_common AS DOUBLE), 4)
                   AS jaccard
        FROM inter
        JOIN sz sa ON src_a = sa.source
        JOIN sz sb ON src_b = sb.source
        ORDER BY src_a, src_b
    """

    # q89: per-batch distinct grams + first-seen novelty; running vocab
    # sum over the tiny per-batch aggregate.
    oracles["q89_vocab_growth"] = f"""
        WITH e AS (
            SELECT DISTINCT batch, gram FROM (
                SELECT CAST(floor(doc_id / 100) AS BIGINT) AS batch,
                       unnest({grams3}) AS gram
                FROM documents)
        ), pb AS (
            SELECT batch, count(*) AS n_grams FROM e GROUP BY 1
        ), nw AS (
            SELECT batch, count(*) AS n_new FROM (
                SELECT gram, min(batch) AS batch FROM e GROUP BY 1)
            GROUP BY 1
        )
        SELECT pb.batch, n_grams,
               CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
               CAST(sum(COALESCE(n_new, 0)) OVER (ORDER BY pb.batch)
                    AS BIGINT) AS cum_vocab,
               CAST(round(COALESCE(n_new, 0) / CAST(n_grams AS DOUBLE)
                          * 10000) AS BIGINT) AS novelty_e4
        FROM pb LEFT JOIN nw ON pb.batch = nw.batch
        ORDER BY pb.batch
    """

    # q90: tool-call trigram motifs -- every assistant turn acts as one
    # tool step (dense enough that short transcripts yield trigrams),
    # names planted by (cid*7+idx) % 5 over the sorted name list.
    oracles["q90_tool_motifs"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        c AS (
            SELECT conv_id, turn_idx,
                   (['browser','calc','python','search','sql'])[
                       CAST((CAST(conv_id AS BIGINT)*7 + turn_idx) % 5
                            AS INTEGER) + 1] AS tool
            FROM tr
            WHERE role = 'assistant'
        ), tri AS (
            SELECT conv_id,
                   tool || '>' || lead(tool, 1) OVER w || '>'
                        || lead(tool, 2) OVER w AS motif,
                   lead(tool, 2) OVER w AS t3
            FROM c WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ), j AS (
            SELECT d.source, t.conv_id, t.motif
            FROM tri t JOIN documents d ON t.conv_id = CAST(d.doc_id AS VARCHAR)
            WHERE t.t3 IS NOT NULL
        ), g AS (
            SELECT source, motif, count(*) AS n,
                   count(DISTINCT conv_id) AS n_convs
            FROM j GROUP BY 1, 2
        )
        SELECT source, motif, n, n_convs,
               CAST(round(n / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE)
                          * 10000) AS BIGINT) AS share_e4
        FROM g ORDER BY source, motif
    """

    # q91: assistant token-share distribution per source; percentile ==
    # quantile_cont (q59's exact-interpolation contract), whitespace
    # token counts on BOTH sides (split(' ') == string_split(' ')).
    oracles["q91_dialog_balance"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        pc AS (
            SELECT conv_id,
                   sum(CASE WHEN role = 'assistant'
                            THEN len(string_split(text, ' ')) ELSE 0 END)
                       AS asst_toks,
                   sum(len(string_split(text, ' '))) AS all_toks,
                   count(*) AS n_turns
            FROM tr GROUP BY conv_id
        ), sh AS (
            SELECT d.source,
                   pc.asst_toks / CAST(pc.all_toks AS DOUBLE) AS asst_share,
                   pc.n_turns
            FROM pc JOIN documents d ON pc.conv_id = CAST(d.doc_id AS VARCHAR)
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_convs,
               round(quantile_cont(asst_share, 0.05), 4) AS p05_asst_share,
               round(quantile_cont(asst_share, 0.5), 4) AS p50_asst_share,
               round(quantile_cont(asst_share, 0.95), 4) AS p95_asst_share,
               round(avg(n_turns), 4) AS avg_turns
        FROM sh GROUP BY source ORDER BY source
    """

    # q92: dedup-aware shard export -- the q38 oracle (exact closure +
    # keeper argmax) feeds the q87 naive-global-window shard math over
    # the surviving corpus only.
    oracles["q92_dedup_shard_manifest"] = f"""
        WITH dropped AS (
            SELECT conv_id FROM ({oracles["q38_cluster_keeper_policy"]})
            WHERE dropped
        ), surv AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(len({_NORM_TOKS}) AS BIGINT) AS n_tok
            FROM documents
            WHERE CAST(doc_id AS VARCHAR) NOT IN (SELECT conv_id FROM dropped)
        ), c AS (
            SELECT doc_id, n_tok,
                   sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS tok_before
            FROM surv
        ), a AS (
            SELECT doc_id, n_tok,
                   CAST(tok_before // 20000 AS BIGINT) AS shard_id
            FROM c
        )
        SELECT shard_id, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM a GROUP BY shard_id ORDER BY shard_id
    """

    # q93: embedding hygiene -- list_reduce left-fold over per-element
    # double casts mirrors Spark's F.aggregate fold exactly (0.0 + x0^2
    # is exact, so the fold orders are bit-identical); norms round to
    # 6dp before quantile_cont so both engines interpolate the same
    # multiset, then 4dp on the way out (q30's cast contract).
    oracles["q93_embedding_hygiene"] = """
        WITH v AS (
            SELECT label,
                   len(embedding) AS dim,
                   round(sqrt(list_reduce(
                       list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b)), 6) AS norm,
                   list_bool_or(list_transform(embedding,
                       x -> isnan(CAST(x AS DOUBLE))
                            OR isinf(CAST(x AS DOUBLE)))) AS bad
            FROM embeddings
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(count(DISTINCT dim) AS BIGINT) AS n_dims,
               min(dim) AS dim_min, max(dim) AS dim_max,
               CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonfinite,
               CAST(sum(CASE WHEN norm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_norm,
               round(quantile_cont(norm, 0.05), 4) AS p05_norm,
               round(quantile_cont(norm, 0.5), 4) AS p50_norm,
               round(quantile_cont(norm, 0.95), 4) AS p95_norm
        FROM v GROUP BY label ORDER BY label
    """

    # q94: per-day near-dup ingest rate.  Exact >=0.7-jaccard edges (the
    # q24 closure's edge set); a pair's LATER side is the numerically
    # greater conv id (ts is monotone in doc_id by construction); days
    # with zero dups still appear via the left join; running sum over
    # O(#days) rows.
    oracles["q94_dup_rate_timeseries"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        days AS (
            SELECT conv_id, CAST(min(ts) AS DATE) AS day FROM tr GROUP BY conv_id
        ), g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), dup AS (
            SELECT DISTINCT CAST(greatest(CAST(a AS BIGINT), CAST(b AS BIGINT))
                                 AS VARCHAR) AS conv_id
            FROM edges
        ), pd AS (
            SELECT day, count(*) AS n_convs FROM days GROUP BY 1
        ), dd AS (
            SELECT d.day, count(*) AS n_dup
            FROM dup JOIN days d USING (conv_id) GROUP BY 1
        )
        SELECT CAST(pd.day AS VARCHAR) AS day,
               pd.n_convs,
               coalesce(dd.n_dup, 0) AS n_dup_ingested,
               CAST(round(coalesce(dd.n_dup, 0) / CAST(pd.n_convs AS DOUBLE)
                          * 10000) AS BIGINT) AS dup_rate_e4,
               CAST(sum(coalesce(dd.n_dup, 0)) OVER (
                    ORDER BY pd.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_dup
        FROM pd LEFT JOIN dd ON pd.day = dd.day
        ORDER BY day
    """

    # q95: template-turn rate by relative position decile; md5-exact
    # template convention shared with q50 (>= 2 distinct convs).
    oracles["q95_turn_position_dup_profile"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        t2 AS (
            SELECT conv_id, turn_idx, md5(text) AS fp,
                   count(*) OVER (PARTITION BY conv_id) AS n_turns
            FROM tr
        ), tpl AS (
            SELECT fp, count(DISTINCT conv_id) AS n_convs_fp FROM t2 GROUP BY 1
        )
        SELECT CAST(floor(t2.turn_idx * 10 / CAST(t2.n_turns AS DOUBLE))
                    AS BIGINT) AS pos_decile,
               count(*) AS n_turns,
               CAST(sum(CASE WHEN tpl.n_convs_fp >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_template_turns,
               CAST(round(sum(CASE WHEN tpl.n_convs_fp >= 2 THEN 1 ELSE 0 END)
                          / CAST(count(*) AS DOUBLE) * 10000) AS BIGINT)
                   AS template_rate_e4
        FROM t2 JOIN tpl USING (fp)
        GROUP BY 1 ORDER BY 1
    """

    # q96: repeated user prompts bucketed by response consistency; the
    # lead() pairing and the >= 2-distinct-conv gate replay the Spark
    # window exactly.
    oracles["q96_prompt_response_divergence"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        p AS (
            SELECT conv_id, role, md5(text) AS pfp,
                   md5(lead(text, 1) OVER w) AS rfp,
                   lead(role, 1) OVER w AS resp_role
            FROM tr WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ), g AS (
            SELECT pfp, count(*) AS n_uses,
                   count(DISTINCT conv_id) AS n_convs,
                   count(DISTINCT rfp) AS n_resps
            FROM p WHERE role = 'user' AND resp_role = 'assistant'
            GROUP BY 1 HAVING count(DISTINCT conv_id) >= 2
        )
        SELECT CASE WHEN n_resps = 1 THEN 'consistent'
                    WHEN n_resps < n_uses THEN 'partial'
                    ELSE 'all_distinct' END AS divergence,
               count(*) AS n_prompts,
               CAST(sum(n_uses) AS BIGINT) AS n_uses,
               CAST(max(n_resps) AS BIGINT) AS max_distinct_resps
        FROM g GROUP BY 1 ORDER BY 1
    """

    # q97: verbatim 8-token-window leakage between sources; same
    # normalization + window unit as the ExactSubstr family (q47), same
    # dedup-before-pair-join bound as q88.
    oracles["q97_cross_source_substr_leakage"] = f"""
        WITH tok AS (
            SELECT doc_id, {_NORM_TOKS} AS toks FROM documents
        ), base AS (
            SELECT doc_id, toks FROM tok WHERE len(toks) >= 8
        ), wins AS (
            SELECT DISTINCT doc_id, array_to_string(toks[pos+1:pos+8], ' ') AS win
            FROM (SELECT doc_id, toks,
                         unnest(range(0, len(toks) - 8 + 1)) AS pos
                  FROM base)
        ), sw AS (
            SELECT DISTINCT d.source, w.win
            FROM wins w JOIN documents d USING (doc_id)
        ), tot AS (
            SELECT source, count(*) AS n_wins FROM sw GROUP BY 1
        ), p AS (
            SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared_wins
            FROM sw a JOIN sw b ON a.win = b.win AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT p.src_a, p.src_b, p.n_shared_wins,
               ta.n_wins AS wins_a, tb.n_wins AS wins_b,
               CAST(round(p.n_shared_wins
                          / CAST(least(ta.n_wins, tb.n_wins) AS DOUBLE)
                          * 10000) AS BIGINT) AS containment_e4
        FROM p JOIN tot ta ON p.src_a = ta.source
               JOIN tot tb ON p.src_b = tb.source
        ORDER BY 1, 2
    """
    # q98: self-trained unigram perplexity filter, log10-bucketed so no
    # libm ln enters either engine (surprisal = digits(N) - digits(cnt),
    # an exact integer; one IEEE divide per doc / per corpus mean).
    oracles["q98_unigram_surprisal"] = f"""
        WITH tok AS (
            SELECT doc_id, unnest({_NORM_TOKS}) AS tok FROM documents
        ), vocab AS (
            SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
        ), tot AS (
            SELECT length(CAST(sum(cnt) AS VARCHAR)) AS n_digits FROM vocab
        ), doc AS (
            SELECT t.doc_id, count(*) AS n_toks,
                   sum(tot.n_digits - length(CAST(v.cnt AS VARCHAR))) AS s
            FROM tok t JOIN vocab v USING (tok), tot
            GROUP BY t.doc_id
        ), scored AS (
            SELECT doc_id, n_toks,
                   CAST(round(s / n_toks * 10000) AS BIGINT) AS ppl_bucket_e4
            FROM doc
        ), corp AS (
            SELECT CAST(round(sum(ppl_bucket_e4 * n_toks) / sum(n_toks))
                        AS BIGINT) AS corp_e4
            FROM scored
        )
        SELECT d.source,
               count(*) AS n_docs,
               CAST(sum(sc.n_toks) AS BIGINT) AS n_toks,
               CAST(round(avg(sc.ppl_bucket_e4)) AS BIGINT) AS avg_ppl_e4,
               max(sc.ppl_bucket_e4) AS max_ppl_e4,
               CAST(count(*) FILTER (sc.ppl_bucket_e4 > corp.corp_e4 + 500)
                    AS BIGINT) AS n_flagged
        FROM scored sc JOIN documents d USING (doc_id), corp
        GROUP BY d.source, corp.corp_e4
        ORDER BY d.source
    """
    # q99: DSIR importance resampling toward target domain src0 over
    # distinct word bigrams, digit-bucketed count ratios with Laplace
    # add-one and a 1-row size-imbalance shift -- all integer until the
    # final per-doc divide.
    _G2 = word_grams_sql(_NORM_TOKS, 2)
    oracles["q99_dsir_importance"] = f"""
        WITH g AS (
            SELECT doc_id, source, unnest({_G2}) AS gram
            FROM documents WHERE source IS NOT NULL
        ), tgt AS (
            SELECT gram, count(*) AS cnt_t FROM g WHERE source = 'src0' GROUP BY gram
        ), raw AS (
            SELECT gram, count(*) AS cnt_r FROM g WHERE source <> 'src0' GROUP BY gram
        ), tot AS (
            SELECT (SELECT length(CAST(sum(cnt_r) + 1 AS VARCHAR)) FROM raw)
                 - (SELECT length(CAST(sum(cnt_t) + 1 AS VARCHAR)) FROM tgt) AS shift
        ), w AS (
            SELECT g.doc_id, g.source, count(*) AS n_grams,
                   sum(length(CAST(coalesce(t.cnt_t, 0) + 1 AS VARCHAR))
                       - length(CAST(r.cnt_r + 1 AS VARCHAR))
                       + tot.shift) AS wt
            FROM g JOIN raw r USING (gram) LEFT JOIN tgt t USING (gram), tot
            WHERE g.source <> 'src0'
            GROUP BY g.doc_id, g.source
        ), n AS (
            SELECT *, CAST(round(wt / n_grams * 10000) AS BIGINT) AS wpg FROM w
        )
        SELECT source, count(*) AS n_docs,
               CAST(round(avg(wpg)) AS BIGINT) AS avg_wpg_e4,
               max(wpg) AS max_wpg_e4,
               CAST(count(*) FILTER (wpg > 0) AS BIGINT) AS n_selected
        FROM n GROUP BY source ORDER BY source
    """
    # q100: tokenizer fertility -- q20's per-doc units (whitespace-ish
    # tokens, BPE-ish pieces) aggregated per source; exact integer sums,
    # one IEEE divide per ratio.
    oracles["q100_tokenizer_fertility"] = f"""
        WITH per_doc AS (
            SELECT source,
                   len({_NORM_TOKS}) AS n_toks,
                   len({_NORM_TOKS})
                     + len(list_filter(string_split_regex(lower(text), '[a-z0-9\\s]+'),
                           x -> x <> '')) AS n_pieces,
                   length(text) AS n_chars
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS n_toks,
               CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               CAST(round(sum(n_pieces) / sum(n_toks) * 10000) AS BIGINT) AS fertility_e4,
               CAST(round(sum(n_chars) / sum(n_toks) * 10000) AS BIGINT) AS chars_per_tok_e4
        FROM per_doc GROUP BY source ORDER BY source
    """
    # q101: role-conditional PII exposure -- q54's planted-from-driver-
    # data derivation made role-aware over the transcript view.
    oracles["q101_role_pii_exposure"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        planted AS (
            SELECT role,
                   CASE
                     WHEN role = 'user' AND CAST(conv_id AS BIGINT) % 5 = 0
                       THEN text || ' reach me at user' || conv_id || '@mail.test'
                     WHEN role = 'assistant' AND CAST(conv_id AS BIGINT) % 11 = 0
                       THEN text || ' noted 555-000-'
                            || lpad((CAST(conv_id AS BIGINT) % 10000)::VARCHAR, 4, '0')
                            || ' at 192.168.0.' || (CAST(conv_id AS BIGINT) % 200)::VARCHAR
                     ELSE text END AS text
            FROM tr
        ), scanned AS (
            SELECT role,
                   len(regexp_extract_all(text, '{_pii_email}')) AS n_email,
                   len(regexp_extract_all(text, '{_pii_phone}')) AS n_phone,
                   len(regexp_extract_all(text, '{_pii_ipv4}')) AS n_ipv4
            FROM planted
        )
        SELECT role,
               count(*) AS n_turns,
               CAST(sum(n_email) AS BIGINT) AS n_email,
               CAST(sum(n_phone) AS BIGINT) AS n_phone,
               CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
               CAST(count(*) FILTER (n_email + n_phone + n_ipv4 > 0) AS BIGINT) AS n_pii_turns,
               CAST(round(count(*) FILTER (n_email + n_phone + n_ipv4 > 0)
                          / count(*) * 10000) AS BIGINT) AS pii_turn_rate_e4
        FROM scanned GROUP BY role ORDER BY role
    """
    # q102: per-source dup concentration over the exact >=0.7-jaccard
    # closure (q24's oracle CTE); every reported statistic is
    # label-invariant so min-id closure labels match Spark's hash labels.
    oracles["q102_source_cluster_concentration"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), all_labels AS (
            SELECT CAST(d.doc_id AS VARCHAR) AS id, d.source,
                   coalesce(l.cluster_id, CAST(d.doc_id AS VARCHAR)) AS cluster_id
            FROM documents d LEFT JOIN labels l ON CAST(d.doc_id AS VARCHAR) = l.id
        ), sizes AS (
            SELECT cluster_id, count(*) AS csize FROM all_labels GROUP BY cluster_id
        ), m AS (
            SELECT a.source, a.cluster_id, s.csize
            FROM all_labels a JOIN sizes s USING (cluster_id)
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(count(*) FILTER (csize >= 2) AS BIGINT) AS n_dup_docs,
               CAST(round(count(*) FILTER (csize >= 2) / count(*) * 10000)
                    AS BIGINT) AS dup_share_e4,
               CAST(count(DISTINCT CASE WHEN csize >= 2 THEN cluster_id END)
                    AS BIGINT) AS n_families,
               max(csize) AS max_family
        FROM m GROUP BY source ORDER BY source
    """
    # q103: 3-gram count-of-counts spectrum; exact classes 1-4 then
    # digit buckets, all integer arithmetic.
    _G3ALL = word_grams_all_sql(_NORM_TOKS, 3)
    oracles["q103_gram_frequency_spectrum"] = f"""
        WITH grams AS (
            SELECT unnest({_G3ALL}) AS gram FROM documents
        ), counts AS (
            SELECT gram, count(*) AS c FROM grams GROUP BY gram
        ), tot AS (
            SELECT count(*) AS tot_grams, sum(c) AS tot_occ FROM counts
        )
        SELECT CASE WHEN c <= 4 THEN lpad(c::VARCHAR, 2, '0')
                    ELSE 'd' || length(c::VARCHAR) END AS freq_class,
               count(*) AS n_grams,
               CAST(sum(c) AS BIGINT) AS n_occurrences,
               CAST(round(count(*) / tot.tot_grams * 10000) AS BIGINT) AS gram_share_e4,
               CAST(round(sum(c) / tot.tot_occ * 10000) AS BIGINT) AS occ_share_e4
        FROM counts, tot
        GROUP BY freq_class, tot.tot_grams, tot.tot_occ
        ORDER BY freq_class
    """
    # q104: within-conversation assistant echo -- distinct 3-grams of each
    # assistant turn already present in an earlier turn of the same conv.
    # Grams here are raw single-space splits of the turn text (the turn IS
    # a token slice), mirroring the Spark side exactly.
    _G3TURN = word_grams_sql("string_split(text, ' ')", 3)
    oracles["q104_conv_echo_rate"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        g AS (
            SELECT conv_id, turn_idx, role, unnest({_G3TURN}) AS gram FROM tr
        ),
        probe AS (
            SELECT conv_id, turn_idx, gram FROM g WHERE role = 'assistant'
        ),
        echoed AS (
            SELECT DISTINCT p.conv_id, p.turn_idx, p.gram
            FROM probe p
            JOIN g r ON p.conv_id = r.conv_id AND p.gram = r.gram
                    AND r.turn_idx < p.turn_idx
        ),
        e_cnt AS (
            SELECT conv_id, turn_idx, count(*) AS n_echoed
            FROM echoed GROUP BY 1, 2
        ),
        per_turn AS (
            SELECT conv_id, turn_idx, count(*) AS n_grams
            FROM probe GROUP BY 1, 2
        ),
        pt AS (
            SELECT p.conv_id, p.turn_idx, p.n_grams,
                   coalesce(e.n_echoed, 0) AS n_echoed
            FROM per_turn p LEFT JOIN e_cnt e USING (conv_id, turn_idx)
        )
        SELECT d.source,
               count(*) AS n_ast_turns,
               CAST(sum(n_grams) AS BIGINT) AS n_grams,
               CAST(sum(n_echoed) AS BIGINT) AS n_echoed,
               CAST(round(sum(n_echoed) / sum(n_grams) * 10000) AS BIGINT)
                 AS echo_share_e4,
               CAST(count(*) FILTER (n_echoed * 2 >= n_grams) AS BIGINT)
                 AS n_heavy_turns
        FROM pt JOIN documents d ON CAST(d.doc_id AS VARCHAR) = pt.conv_id
        GROUP BY d.source ORDER BY d.source
    """
    # q105: asymmetric full-containment dedup over normalized 3-gram sets
    # (the q102 closure's gram relation, directional: i >= 0.95*|A| and
    # the container is strictly larger, ties broken by smaller id).
    oracles["q105_containment_dedup"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), inter AS (
            SELECT a.id AS ida, b.id AS idb, count(*) AS i
            FROM x a JOIN x b ON a.gram = b.gram AND a.id <> b.id
            GROUP BY 1, 2
        ), cont AS (
            SELECT ida, idb FROM inter
            JOIN sz sa ON inter.ida = sa.id
            JOIN sz sb ON inter.idb = sb.id
            WHERE i >= 0.95 * sa.n
              AND (sb.n > sa.n OR (sb.n = sa.n AND idb < ida))
        ), contained AS (
            SELECT ida AS id,
                   max(CASE WHEN db.source <> da.source THEN 1 ELSE 0 END)
                     AS x_src
            FROM cont
            JOIN documents da ON da.doc_id = cont.ida
            JOIN documents db ON db.doc_id = cont.idb
            GROUP BY ida
        )
        SELECT d.source,
               count(*) AS n_docs,
               CAST(count(c.id) AS BIGINT) AS n_contained,
               CAST(round(count(c.id) / count(*) * 10000) AS BIGINT)
                 AS contained_share_e4,
               CAST(coalesce(sum(c.x_src), 0) AS BIGINT) AS n_cross_source
        FROM documents d LEFT JOIN contained c ON d.doc_id = c.id
        GROUP BY d.source ORDER BY d.source
    """

    # q106: verified-pair age quantiles per later-member source.  Exact
    # >=0.7-jaccard edges (the q24 closure's edge set, same CTE shape as
    # q94); pair orientation by numeric id (ts monotone in doc_id);
    # gap_min is exact integer minutes because conv start ts is
    # doc_id*60 seconds past a fixed epoch.  percentile == quantile_cont
    # (q59's contract), 4dp round.
    oracles["q106_dup_pair_age"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        starts AS (
            SELECT conv_id, min(ts) AS t0 FROM tr GROUP BY conv_id
        ), g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), p AS (
            SELECT least(CAST(a AS BIGINT), CAST(b AS BIGINT)) AS early,
                   greatest(CAST(a AS BIGINT), CAST(b AS BIGINT)) AS late
            FROM edges
        ), gaps AS (
            SELECT p.late,
                   CAST(floor((epoch(sl.t0) - epoch(se.t0)) / 60) AS BIGINT)
                       AS gap_min
            FROM p
            JOIN starts se ON CAST(se.conv_id AS BIGINT) = p.early
            JOIN starts sl ON CAST(sl.conv_id AS BIGINT) = p.late
        ), j AS (
            SELECT gaps.gap_min, d.source
            FROM gaps JOIN documents d ON d.doc_id = gaps.late
        )
        SELECT source,
               count(*) AS n_pairs,
               round(quantile_cont(gap_min, 0.5), 4) AS p50_gap_min,
               round(quantile_cont(gap_min, 0.9), 4) AS p90_gap_min,
               max(gap_min) AS max_gap_min,
               CAST(sum(CASE WHEN gap_min > 60 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_beyond_1h,
               CAST(round(sum(CASE WHEN gap_min > 60 THEN 1 ELSE 0 END)
                          / CAST(count(*) AS DOUBLE) * 10000) AS BIGINT)
                   AS miss_share_e4
        FROM j GROUP BY source ORDER BY source
    """

    # q107: pairwise cosine between per-label embedding centroids.
    # Centroid components round to 6dp on BOTH engines before the
    # cosine (q93's convention), so the only residual noise is the
    # 64-term sum association order, killed by the 5dp output round.
    oracles["q107_source_centroid_similarity"] = """
        WITH e AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ), c AS (
            SELECT label, pos, round(avg(v), 6) AS c FROM e GROUP BY 1, 2
        ), n AS (
            SELECT label, count(*) AS n FROM embeddings GROUP BY 1
        ), p AS (
            SELECT a.label AS label_a, b.label AS label_b,
                   sum(a.c * b.c) AS dot,
                   sqrt(sum(a.c * a.c)) AS na,
                   sqrt(sum(b.c * b.c)) AS nb
            FROM c a JOIN c b USING (pos)
            WHERE a.label < b.label
            GROUP BY 1, 2
        )
        SELECT CAST(p.label_a AS BIGINT) AS label_a,
               CAST(p.label_b AS BIGINT) AS label_b,
               CAST(nx.n AS BIGINT) AS n_a,
               CAST(ny.n AS BIGINT) AS n_b,
               round(dot / (na * nb), 5) AS cosine
        FROM p
        JOIN n nx ON nx.label = p.label_a
        JOIN n ny ON ny.label = p.label_b
        ORDER BY label_a, label_b
    """

    # q108: opening-prompt diversity per source (turn-0 text, md5 fp).
    oracles["q108_prompt_diversity"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        first AS (
            SELECT conv_id, md5(text) AS fp FROM tr WHERE turn_idx = 0
        ), j AS (
            SELECT d.source, f.fp
            FROM first f
            JOIN (SELECT CAST(doc_id AS VARCHAR) AS conv_id, source
                  FROM documents) d USING (conv_id)
        ), per_fp AS (
            SELECT source, fp, count(*) AS n FROM j GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(n) AS BIGINT) AS n_convs,
               CAST(count(*) AS BIGINT) AS n_prompts,
               CAST(round(count(*) / CAST(sum(n) AS DOUBLE) * 10000) AS BIGINT)
                   AS diversity_e4,
               CAST(round(max(n) / CAST(sum(n) AS DOUBLE) * 10000) AS BIGINT)
                   AS top_prompt_share_e4
        FROM per_fp GROUP BY source ORDER BY source
    """

    # q109: 16-lane portable-MinHash calibration.  Lane hash is the
    # md5_long60 of gram||'|'||p -- bit-identical on both engines; every
    # mean is integer-summed (est_e4 = matches*625 exact, exact_e4
    # rounded per pair) so association order cannot touch the hash;
    # percentile == quantile_cont over the integer abs-err multiset.
    _lane_h = md5_long60_sql("concat(gram, '|', CAST(p AS VARCHAR))")
    oracles["q109_minhash_calibration"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), lanes AS (
            SELECT id, p, min({_lane_h}) AS h
            FROM x, (SELECT unnest(range(16)) AS p) perms
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), inter AS (
            SELECT l.id AS ida, r.id AS idb, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT ida, idb,
                   i / CAST(sa.n + sb.n - i AS DOUBLE) AS exact_j
            FROM inter
            JOIN sz sa ON inter.ida = sa.id
            JOIN sz sb ON inter.idb = sb.id
        ), est AS (
            SELECT p.ida, p.idb,
                   sum(CASE WHEN la.h = lb.h THEN 1 ELSE 0 END) AS m
            FROM pairs p
            JOIN lanes la ON la.id = p.ida
            JOIN lanes lb ON lb.id = p.idb AND lb.p = la.p
            GROUP BY 1, 2
        ), scored AS (
            SELECT CAST(floor(exact_j * 10) AS BIGINT) AS band,
                   m * 625 AS est_e4,
                   CAST(round(exact_j * 10000) AS BIGINT) AS exact_e4
            FROM pairs JOIN est USING (ida, idb)
        ), s2 AS (
            SELECT band, est_e4, exact_e4,
                   abs(est_e4 - exact_e4) AS abs_err_e4
            FROM scored
        )
        SELECT band,
               count(*) AS n_pairs,
               CAST(round(avg(exact_e4)) AS BIGINT) AS mean_exact_e4,
               CAST(round(avg(est_e4)) AS BIGINT) AS mean_est_e4,
               CAST(round(avg(abs_err_e4)) AS BIGINT) AS mean_abs_err_e4,
               round(quantile_cont(abs_err_e4, 0.9), 4) AS p90_abs_err_e4
        FROM s2 GROUP BY band ORDER BY band
    """

    # q110: dropped-member -> keeper direct-edge jaccard floor per
    # family-size bucket.  Reuses q38's closure/quality/keeper CTEs;
    # keeper_j is the exact i/union double (identical on both engines),
    # NULL when the dropped member has no direct keeper edge.
    oracles["q110_keeper_similarity_floor"] = f"""
        WITH RECURSIVE g AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), inter AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), edges AS (
            SELECT a, b, i / CAST(sa.n + sb.n - i AS DOUBLE) AS j
            FROM inter
            JOIN sz sa ON inter.a = sa.id
            JOIN sz sb ON inter.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b, j FROM edges
            UNION ALL SELECT b AS a, a AS b, j FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), qual AS (
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   round((CASE WHEN len({_NORM_TOKS}) BETWEEN 10 AND 5000 THEN 1.0
                               WHEN len({_NORM_TOKS}) < 10 THEN len({_NORM_TOKS}) / 10.0
                               ELSE 5000.0 / len({_NORM_TOKS}) END
                          + CASE WHEN length(text) / greatest(len({_NORM_TOKS}), 1)::DOUBLE BETWEEN 3 AND 12
                                 THEN 1.0 ELSE 0.5 END
                          + 1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
                                        / greatest(length(text), 1)::DOUBLE * 4, 1.0)
                         ) / 3, 4) AS quality
            FROM documents
        ), members AS (
            SELECT l.id, l.cluster_id, q.quality,
                   count(*) OVER (PARTITION BY l.cluster_id) AS sz2
            FROM labels l JOIN qual q ON l.id = q.id
        ), rk AS (
            SELECT cluster_id, id, sz2,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY quality DESC, id) AS rk
            FROM members
        ), kp AS (
            SELECT cluster_id, id AS keeper_id FROM rk WHERE rk = 1
        ), dropped AS (
            SELECT r.cluster_id, r.id AS conv_id, r.sz2, kp.keeper_id
            FROM rk r JOIN kp USING (cluster_id) WHERE r.rk > 1
        ), scored AS (
            SELECT d.*, s.j AS keeper_j
            FROM dropped d
            LEFT JOIN sym s ON s.a = d.conv_id AND s.b = d.keeper_id
        )
        SELECT least(sz2, 5) AS size_bucket,
               CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
               count(*) AS n_dropped,
               CAST(sum(CASE WHEN keeper_j IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unscored,
               round(quantile_cont(keeper_j, 0.5), 4) AS p50_keeper_j,
               round(min(keeper_j), 4) AS min_keeper_j
        FROM scored GROUP BY 1 ORDER BY 1
    """

    oracles["q111_allpairs_ssjoin"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), inter AS (
            SELECT a.id AS ida, b.id AS idb, count(*) AS i
            FROM x a JOIN x b ON a.gram = b.gram AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT ida, idb,
               CAST((20000 * i + (sa.n + sb.n - i))
                    // (2 * (sa.n + sb.n - i)) AS BIGINT) AS jacc_e4
        FROM inter
        JOIN sz sa ON ida = sa.id
        JOIN sz sb ON idb = sb.id
        WHERE 3 * i >= sa.n + sb.n
        ORDER BY ida, idb
    """

    oracles["q112_weighted_jaccard_dedup"] = f"""
        WITH x AS (
            SELECT doc_id AS id, unnest({_G3ALL}) AS gram FROM documents
        ), tf AS (
            SELECT id, gram, count(*) AS w FROM x GROUP BY 1, 2
        ), tot AS (
            SELECT id, sum(w) AS t FROM tf GROUP BY 1
        ), mn AS (
            SELECT a.id AS ida, b.id AS idb, sum(least(a.w, b.w)) AS m
            FROM tf a JOIN tf b ON a.gram = b.gram AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT ida, idb,
               CAST((20000 * m + (ta.t + tb.t - m))
                    // (2 * (ta.t + tb.t - m)) AS BIGINT) AS wj_e4
        FROM mn
        JOIN tot ta ON ida = ta.id
        JOIN tot tb ON idb = tb.id
        WHERE 3 * m >= ta.t + tb.t
        ORDER BY ida, idb
    """

    oracles["q113_gram_rank_decay"] = f"""
        WITH x AS (
            SELECT source, unnest({_G3ALL}) AS gram FROM documents
        ), counts AS (
            SELECT source, gram, count(*) AS c FROM x GROUP BY 1, 2
        ), rk AS (
            SELECT source, c,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY c DESC, gram) AS rnk
            FROM counts
        ), picked AS (
            SELECT source,
                   max(CASE WHEN rnk = 1 THEN c END) AS c1,
                   max(CASE WHEN rnk = 10 THEN c END) AS c10,
                   max(CASE WHEN rnk = 100 THEN c END) AS c100
            FROM rk WHERE rnk IN (1, 10, 100) GROUP BY source
        )
        SELECT source,
               CAST(c1 AS BIGINT) AS c1,
               CAST(c10 AS BIGINT) AS c10,
               CAST(c100 AS BIGINT) AS c100,
               CAST((20000 * c10 + c1) // (2 * c1) AS BIGINT) AS decay_1_10_e4,
               CAST((20000 * c100 + c10) // (2 * c10) AS BIGINT) AS decay_10_100_e4
        FROM picked ORDER BY source
    """

    oracles["q114_edit_distance_audit"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), inter AS (
            SELECT a.id AS ida, b.id AS idb, count(*) AS i
            FROM x a JOIN x b ON a.gram = b.gram AND a.id < b.id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT ida, idb FROM inter
            JOIN sz sa ON ida = sa.id
            JOIN sz sb ON idb = sb.id
            WHERE 10 * i >= 7 * (sa.n + sb.n - i)
        ), scored AS (
            SELECT levenshtein(da.text, db.text) AS lev,
                   greatest(length(da.text), length(db.text), 1) AS mx
            FROM pairs
            JOIN documents da ON da.doc_id = ida
            JOIN documents db ON db.doc_id = idb
        ), cls AS (
            SELECT lev, (20000 * lev + mx) // (2 * mx) AS nld_e4 FROM scored
        ), cls2 AS (
            SELECT lev, nld_e4,
                   CASE WHEN lev = 0 THEN 'exact'
                        WHEN nld_e4 <= 500 THEN 'near'
                        WHEN nld_e4 <= 2000 THEN 'moderate'
                        ELSE 'far' END AS edit_class
            FROM cls
        )
        SELECT edit_class,
               count(*) AS n_pairs,
               CAST((2 * sum(lev) + count(*)) // (2 * count(*)) AS BIGINT) AS mean_lev,
               CAST((2 * sum(nld_e4) + count(*)) // (2 * count(*)) AS BIGINT) AS mean_nld_e4,
               CAST(max(lev) AS BIGINT) AS max_lev
        FROM cls2 GROUP BY edit_class ORDER BY edit_class
    """

    oracles["q115_bbit_minhash_contract"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), lanes AS (
            SELECT id, p, min({_lane_h}) AS h
            FROM x, (SELECT unnest(range(16)) AS p) perms
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), inter AS (
            SELECT l.id AS ida, r.id AS idb, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT ida, idb, i, sa.n + sb.n - i AS u
            FROM inter
            JOIN sz sa ON inter.ida = sa.id
            JOIN sz sb ON inter.idb = sb.id
        ), est AS (
            SELECT p.ida, p.idb,
                   sum(CASE WHEN la.h % 2 = lb.h % 2 THEN 1 ELSE 0 END) AS m
            FROM pairs p
            JOIN lanes la ON la.id = p.ida
            JOIN lanes lb ON lb.id = p.idb AND lb.p = la.p
            GROUP BY 1, 2
        ), scored AS (
            SELECT (10 * i) // u AS band,
                   greatest((m - 8) * 1250, 0) AS est_e4,
                   (20000 * i + u) // (2 * u) AS exact_e4
            FROM pairs JOIN est USING (ida, idb)
        ), s2 AS (
            SELECT band, est_e4, exact_e4,
                   abs(est_e4 - exact_e4) AS abs_err_e4
            FROM scored
        )
        SELECT CAST(band AS BIGINT) AS band,
               count(*) AS n_pairs,
               CAST((2 * sum(exact_e4) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS mean_exact_e4,
               CAST((2 * sum(est_e4) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS mean_est_e4,
               CAST((2 * sum(abs_err_e4) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS mean_abs_err_e4
        FROM s2 GROUP BY band ORDER BY band
    """

    oracles["q116_source_mix_weights"] = f"""
        WITH per AS (
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(len({_NORM_TOKS})) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ), per2 AS (
            SELECT source, n_docs, n_tokens,
                   CAST(round(sqrt(n_tokens) * 100) AS BIGINT) AS s_e2
            FROM per
        ), tot AS (
            SELECT sum(n_tokens) AS tot_tokens, sum(s_e2) AS tot_s FROM per2
        )
        SELECT source, n_docs, n_tokens,
               CAST((20000 * n_tokens + tot_tokens)
                    // (2 * tot_tokens) AS BIGINT) AS raw_share_e4,
               CAST((20000 * s_e2 + tot_s) // (2 * tot_s) AS BIGINT)
                   AS temp_share_e4,
               CAST((2 * ((20000 * s_e2 + tot_s) // (2 * tot_s)) * 1000000000
                     + n_tokens) // (2 * n_tokens) AS BIGINT) AS epochs_e4
        FROM per2, tot ORDER BY source
    """


    oracles["q117_turn_near_dup"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        g AS (
            SELECT conv_id, turn_idx, role, unnest({_G3TURN}) AS gram FROM tr
        ), sz AS (
            SELECT conv_id, turn_idx, role, count(*) AS n
            FROM g GROUP BY 1, 2, 3
        ), inter AS (
            SELECT a.conv_id AS ca, a.turn_idx AS ta,
                   b.conv_id AS cb, b.turn_idx AS tb, count(*) AS i
            FROM g a JOIN g b ON a.gram = b.gram AND a.conv_id < b.conv_id
            GROUP BY 1, 2, 3, 4
        ), pairs AS (
            SELECT ca, ta, sa.role AS ra, cb, tb, sb.role AS rb
            FROM inter
            JOIN sz sa ON sa.conv_id = ca AND sa.turn_idx = ta
            JOIN sz sb ON sb.conv_id = cb AND sb.turn_idx = tb
            WHERE 17 * i >= 7 * (sa.n + sb.n)
        ), dup_turns AS (
            SELECT role, count(*) AS n_dup_turns FROM (
                SELECT DISTINCT conv_id, turn_idx, role FROM (
                    SELECT ca AS conv_id, ta AS turn_idx, ra AS role FROM pairs
                    UNION ALL
                    SELECT cb, tb, rb FROM pairs
                )
            ) GROUP BY role
        ), np AS (
            SELECT ra AS role, count(*) AS n_pairs FROM pairs GROUP BY ra
        ), tot AS (
            SELECT role, count(*) AS n_turns FROM sz GROUP BY role
        )
        SELECT t.role,
               CAST(t.n_turns AS BIGINT) AS n_turns,
               CAST(coalesce(d.n_dup_turns, 0) AS BIGINT) AS n_dup_turns,
               CAST((20000 * coalesce(d.n_dup_turns, 0) + t.n_turns)
                    // (2 * t.n_turns) AS BIGINT) AS dup_rate_e4,
               CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs
        FROM tot t
        LEFT JOIN dup_turns d ON d.role = t.role
        LEFT JOIN np ON np.role = t.role
        ORDER BY t.role
    """

    oracles["q118_template_continuation_spread"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        prompts AS (
            SELECT conv_id, text AS prompt FROM tr WHERE turn_idx = 0
        ), cont AS (
            SELECT conv_id, sum(len(string_split(text, ' '))) AS n_cont_toks
            FROM tr WHERE turn_idx >= 1 GROUP BY conv_id
        ), nxt AS (
            SELECT conv_id, text AS resp FROM tr WHERE turn_idx = 1
        ), j AS (
            SELECT p.prompt, c.n_cont_toks, x.resp
            FROM prompts p JOIN cont c USING (conv_id) JOIN nxt x USING (conv_id)
        )
        SELECT prompt,
               count(*) AS n_uses,
               CAST(count(DISTINCT resp) AS BIGINT) AS n_distinct_next,
               CAST(min(n_cont_toks) AS BIGINT) AS min_cont_toks,
               round(quantile_cont(n_cont_toks, 0.5), 4) AS p50_cont_toks,
               CAST(max(n_cont_toks) AS BIGINT) AS max_cont_toks
        FROM j GROUP BY prompt HAVING count(*) >= 3
        ORDER BY prompt
    """

    oracles["q119_template_cluster_overlap"] = f"""
        WITH RECURSIVE gd AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), xd AS (
            SELECT id, unnest(grams) AS gram FROM gd
        ), interd AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM xd l JOIN xd r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), szd AS (
            SELECT id, len(grams) AS n FROM gd
        ), edges AS (
            SELECT a, b FROM interd
            JOIN szd sa ON interd.a = sa.id
            JOIN szd sb ON interd.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        ), tr AS ({transcripts_from_documents_sql()}),
        tt AS (
            SELECT DISTINCT text, conv_id FROM tr
        ), lab AS (
            SELECT tt.text, tt.conv_id,
                   coalesce(l.cluster_id, tt.conv_id) AS eff
            FROM tt LEFT JOIN labels l ON l.id = tt.conv_id
        ), per AS (
            SELECT text,
                   count(DISTINCT conv_id) AS n_convs,
                   count(DISTINCT eff) AS n_eff
            FROM lab GROUP BY text
            HAVING count(DISTINCT conv_id) >= 2
        )
        SELECT least(n_convs, 5) AS conv_bucket,
               count(*) AS n_templates,
               CAST(sum(CASE WHEN n_eff = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_explained,
               CAST(sum(CASE WHEN n_eff > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_spanning,
               CAST((20000 * sum(CASE WHEN n_eff > 1 THEN 1 ELSE 0 END)
                     + count(*)) // (2 * count(*)) AS BIGINT)
                   AS spanning_rate_e4
        FROM per GROUP BY 1 ORDER BY 1
    """

    oracles["q120_conv_code_switch"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        lng AS (
            SELECT conv_id, turn_idx,
                   CASE WHEN len(list_filter({_NORM_TOKS},
                                             x -> list_contains({_STOPWORDS_SQL}, x)))
                             / greatest(len({_NORM_TOKS}), 1)::DOUBLE >= 0.08
                        THEN 'en' ELSE 'und' END AS lang
            FROM tr
        ), flps AS (
            SELECT conv_id, turn_idx, lang,
                   lag(lang) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
            FROM lng
        ), per AS (
            SELECT conv_id,
                   sum(CASE WHEN prev IS NOT NULL AND lang <> prev
                            THEN 1 ELSE 0 END) AS n_flips,
                   count(*) AS n_turns
            FROM flps GROUP BY conv_id
        )
        SELECT d.source,
               count(*) AS n_convs,
               CAST(sum(CASE WHEN n_flips > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_switching,
               CAST(sum(n_flips) AS BIGINT) AS n_flips,
               CAST(sum(n_turns) AS BIGINT) AS n_turns,
               CAST((20000 * sum(CASE WHEN n_flips > 0 THEN 1 ELSE 0 END)
                     + count(*)) // (2 * count(*)) AS BIGINT) AS switch_rate_e4
        FROM per JOIN documents d ON CAST(d.doc_id AS VARCHAR) = per.conv_id
        GROUP BY d.source ORDER BY d.source
    """


    _CLOSURE_CTES = f"""
        gd AS (
            SELECT CAST(doc_id AS VARCHAR) AS id, {grams3} AS grams FROM documents
        ), xd AS (
            SELECT id, unnest(grams) AS gram FROM gd
        ), interd AS (
            SELECT l.id AS a, r.id AS b, count(*) AS i
            FROM xd l JOIN xd r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), szd AS (
            SELECT id, len(grams) AS n FROM gd
        ), edges AS (
            SELECT a, b FROM interd
            JOIN szd sa ON interd.a = sa.id
            JOIN szd sb ON interd.b = sb.id
            WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7
        ), sym AS (
            SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
        ), cc(id, lbl) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, cc.lbl FROM cc JOIN sym s ON cc.id = s.a
        ), labels AS (
            SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
        )"""

    oracles["q121_quality_dup_correlation"] = f"""
        WITH RECURSIVE {_CLOSURE_CTES},
        fam AS (
            SELECT cluster_id FROM labels GROUP BY cluster_id
            HAVING count(*) >= 2
        ), dup AS (
            SELECT DISTINCT l.id FROM labels l JOIN fam USING (cluster_id)
        ), q AS (
            SELECT CAST(doc_id AS VARCHAR) AS id,
                   round((CASE WHEN len({_NORM_TOKS}) BETWEEN 10 AND 5000 THEN 1.0
                               WHEN len({_NORM_TOKS}) < 10 THEN len({_NORM_TOKS}) / 10.0
                               ELSE 5000.0 / len({_NORM_TOKS}) END
                          + CASE WHEN length(text) / greatest(len({_NORM_TOKS}), 1)::DOUBLE BETWEEN 3 AND 12
                                 THEN 1.0 ELSE 0.5 END
                          + 1.0 - least(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))
                                        / greatest(length(text), 1)::DOUBLE * 4, 1.0)
                         ) / 3, 4) AS quality
            FROM documents
        ), flag AS (
            SELECT q.id, q.quality,
                   CASE WHEN dup.id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
            FROM q LEFT JOIN dup ON dup.id = q.id
        )
        SELECT CAST(least(floor(quality * 10), 9) AS BIGINT) AS quality_decile,
               count(*) AS n_docs,
               CAST(sum(is_dup) AS BIGINT) AS n_dup,
               CAST((20000 * sum(is_dup) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS dup_rate_e4
        FROM flag GROUP BY 1 ORDER BY 1
    """

    oracles["q122_dup_mass_concentration"] = f"""
        WITH RECURSIVE {_CLOSURE_CTES},
        fam AS (
            SELECT cluster_id, count(*) AS sz FROM labels GROUP BY cluster_id
            HAVING count(*) >= 2
        ), rk AS (
            SELECT sz, row_number() OVER (ORDER BY sz DESC, cluster_id) AS rk
            FROM fam
        )
        SELECT count(*) AS n_families,
               CAST(sum(sz) AS BIGINT) AS n_dup_docs,
               CAST(max(sz) AS BIGINT) AS max_family,
               round(quantile_cont(sz, 0.5), 4) AS p50_family,
               CAST((20000 * sum(CASE WHEN rk <= 1 THEN sz ELSE 0 END) + sum(sz))
                    // (2 * sum(sz)) AS BIGINT) AS top1_share_e4,
               CAST((20000 * sum(CASE WHEN rk <= 10 THEN sz ELSE 0 END) + sum(sz))
                    // (2 * sum(sz)) AS BIGINT) AS top10_share_e4
        FROM rk
    """


    def _abl_tier(k: int) -> str:
        gk = word_grams_sql(_NORM_TOKS, k)
        return f"""
        SELECT {k} AS k, count(*) AS n_pairs,
               CAST(CASE WHEN count(*) = 0 THEN 0
                    ELSE (2 * sum(j_e4) + count(*)) // (2 * count(*)) END
                    AS BIGINT) AS mean_jacc_e4
        FROM (
            SELECT (20000 * i + (sa.n + sb.n - i))
                   // (2 * (sa.n + sb.n - i)) AS j_e4
            FROM (
                SELECT a.id AS ida, b.id AS idb, count(*) AS i
                FROM (SELECT doc_id AS id, unnest({gk}) AS gram FROM documents) a
                JOIN (SELECT doc_id AS id, unnest({gk}) AS gram FROM documents) b
                  ON a.gram = b.gram AND a.id < b.id
                GROUP BY 1, 2
            ) inter
            JOIN (SELECT doc_id AS id, len({gk}) AS n FROM documents) sa
              ON ida = sa.id
            JOIN (SELECT doc_id AS id, len({gk}) AS n FROM documents) sb
              ON idb = sb.id
            WHERE 17 * i >= 7 * (sa.n + sb.n)
        )"""

    oracles["q123_shingle_k_ablation"] = (
        _abl_tier(2) + " UNION ALL " + _abl_tier(3) + " UNION ALL "
        + _abl_tier(5) + " ORDER BY k"
    )

    oracles["q124_band_collision_profile"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), lanes AS (
            SELECT id, p, min({_lane_h}) AS h
            FROM x, (SELECT unnest(range(16)) AS p) perms
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), inter AS (
            SELECT l.id AS ida, r.id AS idb, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT ida, idb, i, sa.n + sb.n - i AS u
            FROM inter
            JOIN sz sa ON inter.ida = sa.id
            JOIN sz sb ON inter.idb = sb.id
        ), perband AS (
            SELECT p.ida, p.idb, la.p // 4 AS band,
                   sum(CASE WHEN la.h = lb.h THEN 1 ELSE 0 END) AS meq
            FROM pairs p
            JOIN lanes la ON la.id = p.ida
            JOIN lanes lb ON lb.id = p.idb AND lb.p = la.p
            GROUP BY 1, 2, 3
        ), perpair AS (
            SELECT ida, idb,
                   sum(CASE WHEN meq = 4 THEN 1 ELSE 0 END) AS cb
            FROM perband GROUP BY 1, 2
        ), scored AS (
            SELECT (10 * i) // u AS decile, cb,
                   CASE WHEN cb >= 1 THEN 1 ELSE 0 END AS hit,
                   (20000 * i + u) // (2 * u) AS exact_e4
            FROM pairs JOIN perpair USING (ida, idb)
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               count(*) AS n_pairs,
               CAST((2 * sum(exact_e4) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS mean_exact_e4,
               CAST((2 * sum(cb * 2500) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS mean_collide_e4,
               CAST((20000 * sum(hit) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS hit_rate_e4
        FROM scored GROUP BY decile ORDER BY decile
    """

    oracles["q125_role_gram_divergence"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        t AS (
            SELECT conv_id, role, text FROM tr
        ), dd AS (
            SELECT CAST(doc_id AS VARCHAR) AS cid, source FROM documents
        ), g AS (
            SELECT dd.source, t.role, unnest({_G3TURN}) AS gram
            FROM t JOIN dd ON dd.cid = t.conv_id
        ), flags AS (
            SELECT source, gram,
                   max(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS in_user,
                   max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS in_ast
            FROM g GROUP BY 1, 2
        ), per AS (
            SELECT source,
                   sum(in_user) AS nu,
                   sum(in_ast) AS nast,
                   sum(in_user * in_ast) AS ns
            FROM flags GROUP BY source
        )
        SELECT source,
               CAST(nu AS BIGINT) AS n_user_grams,
               CAST(nast AS BIGINT) AS n_ast_grams,
               CAST(ns AS BIGINT) AS n_shared,
               CAST((20000 * ns + (nu + nast - ns)) // (2 * (nu + nast - ns))
                    AS BIGINT) AS jaccard_e4,
               CAST((20000 * (nu - ns) + nu) // (2 * nu) AS BIGINT)
                   AS user_excl_share_e4
        FROM per ORDER BY source
    """

    oracles["q126_conv_dup_by_length"] = f"""
        WITH RECURSIVE {_CLOSURE_CTES},
        fam AS (
            SELECT cluster_id FROM labels GROUP BY cluster_id
            HAVING count(*) >= 2
        ), dup AS (
            SELECT DISTINCT l.id FROM labels l JOIN fam USING (cluster_id)
        ), tr AS ({transcripts_from_documents_sql()}),
        lens AS (
            SELECT conv_id, count(*) AS n_turns FROM tr GROUP BY conv_id
        )
        SELECT CAST(least(n_turns, 6) AS BIGINT) AS turn_bucket,
               count(*) AS n_convs,
               CAST(sum(CASE WHEN dup.id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup,
               CAST((20000 * sum(CASE WHEN dup.id IS NOT NULL THEN 1 ELSE 0 END)
                     + count(*)) // (2 * count(*)) AS BIGINT) AS dup_rate_e4
        FROM lens LEFT JOIN dup ON dup.id = lens.conv_id
        GROUP BY 1 ORDER BY 1
    """


    _gram_h = md5_long60_sql("gram")
    oracles["q127_winnowing_pairs"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {_G3ALL} AS grams FROM documents
        ), hashed AS (
            SELECT id,
                   generate_subscripts(grams, 1) - 1 AS pos,
                   {_gram_h.replace('gram', 'unnest(grams)')} AS h
            FROM g
        ), wm AS (
            SELECT id, pos,
                   min(h) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                       AS wmin,
                   max(pos) OVER (PARTITION BY id) AS last_pos
            FROM hashed
        ), fps AS (
            SELECT DISTINCT id, wmin AS fp FROM wm WHERE pos <= last_pos - 3
        ), sz AS (
            SELECT id, count(*) AS n FROM fps GROUP BY id
        ), inter AS (
            SELECT a.id AS ida, b.id AS idb, count(*) AS i
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT ida, idb,
               CAST((20000 * i + (sa.n + sb.n - i))
                    // (2 * (sa.n + sb.n - i)) AS BIGINT) AS fp_jacc_e4
        FROM inter
        JOIN sz sa ON ida = sa.id
        JOIN sz sb ON idb = sb.id
        WHERE 3 * i >= sa.n + sb.n
        ORDER BY ida, idb
    """

    oracles["q128_idf_weighted_pairs"] = f"""
        WITH x AS (
            SELECT doc_id AS id, unnest({grams3}) AS gram FROM documents
        ), wts AS (
            SELECT gram, 1000000 // count(*) AS wt FROM x GROUP BY gram
        ), gw AS (
            SELECT x.id, x.gram, wts.wt FROM x JOIN wts USING (gram)
        ), docw AS (
            SELECT id, sum(wt) AS tw FROM gw GROUP BY id
        ), inter AS (
            SELECT a.id AS ida, b.id AS idb, sum(a.wt) AS iw
            FROM gw a JOIN gw b ON a.gram = b.gram AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT ida, idb,
               CAST((20000 * iw + (wa.tw + wb.tw - iw))
                    // (2 * (wa.tw + wb.tw - iw)) AS BIGINT) AS idf_jacc_e4
        FROM inter
        JOIN docw wa ON ida = wa.id
        JOIN docw wb ON idb = wb.id
        WHERE 3 * iw >= wa.tw + wb.tw
        ORDER BY ida, idb
    """


    oracles["q129_minhash_k_error"] = f"""
        WITH g AS (
            SELECT doc_id AS id, {grams3} AS grams FROM documents
        ), x AS (
            SELECT id, unnest(grams) AS gram FROM g
        ), lanes AS (
            SELECT id, p, min({_lane_h}) AS h
            FROM x, (SELECT unnest(range(16)) AS p) perms
            GROUP BY 1, 2
        ), sz AS (
            SELECT id, len(grams) AS n FROM g
        ), inter AS (
            SELECT l.id AS ida, r.id AS idb, count(*) AS i
            FROM x l JOIN x r ON l.gram = r.gram AND l.id < r.id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT ida, idb, i, sa.n + sb.n - i AS u
            FROM inter
            JOIN sz sa ON inter.ida = sa.id
            JOIN sz sb ON inter.idb = sb.id
            WHERE 17 * i >= 7 * (sa.n + sb.n)
        ), perpair AS (
            SELECT p.ida, p.idb,
                   (20000 * p.i + p.u) // (2 * p.u) AS exact_e4,
                   sum(CASE WHEN la.h = lb.h AND la.p < 4 THEN 1 ELSE 0 END) AS m4,
                   sum(CASE WHEN la.h = lb.h AND la.p < 8 THEN 1 ELSE 0 END) AS m8,
                   sum(CASE WHEN la.h = lb.h THEN 1 ELSE 0 END) AS m16
            FROM pairs p
            JOIN lanes la ON la.id = p.ida
            JOIN lanes lb ON lb.id = p.idb AND lb.p = la.p
            GROUP BY 1, 2, 3
        ), stats AS (
            SELECT count(*) AS np,
                   coalesce(sum(abs(m4 * 2500 - exact_e4)), 0) AS s4,
                   coalesce(max(abs(m4 * 2500 - exact_e4)), 0) AS x4,
                   coalesce(sum(abs(m8 * 1250 - exact_e4)), 0) AS s8,
                   coalesce(max(abs(m8 * 1250 - exact_e4)), 0) AS x8,
                   coalesce(sum(abs(m16 * 625 - exact_e4)), 0) AS s16,
                   coalesce(max(abs(m16 * 625 - exact_e4)), 0) AS x16
            FROM perpair
        )
        SELECT CAST(t.k AS BIGINT) AS k,
               CAST(stats.np AS BIGINT) AS n_pairs,
               CAST(CASE WHEN stats.np = 0 THEN 0
                    ELSE (2 * t.s + stats.np) // (2 * stats.np) END AS BIGINT)
                   AS mean_abs_err_e4,
               CAST(t.x AS BIGINT) AS max_abs_err_e4
        FROM stats, (
            SELECT 4 AS k, s4 AS s, x4 AS x FROM stats
            UNION ALL SELECT 8, s8, x8 FROM stats
            UNION ALL SELECT 16, s16, x16 FROM stats
        ) t
        ORDER BY k
    """

    oracles["q130_turn_dedup_savings"] = f"""
        WITH tr AS ({transcripts_from_documents_sql()}),
        base AS (
            SELECT conv_id, turn_idx, role,
                   len(string_split(text, ' ')) AS n_toks
            FROM tr
        ), g AS (
            SELECT conv_id, turn_idx, unnest({_G3TURN}) AS gram FROM tr
        ), sz AS (
            SELECT conv_id, turn_idx, count(*) AS n FROM g GROUP BY 1, 2
        ), inter AS (
            SELECT a.conv_id AS ca, a.turn_idx AS ta,
                   b.conv_id AS cb, b.turn_idx AS tb, count(*) AS i
            FROM g a JOIN g b ON a.gram = b.gram AND a.conv_id < b.conv_id
            GROUP BY 1, 2, 3, 4
        ), qual AS (
            SELECT ca, ta, cb, tb FROM inter
            JOIN sz sa ON sa.conv_id = ca AND sa.turn_idx = ta
            JOIN sz sb ON sb.conv_id = cb AND sb.turn_idx = tb
            WHERE 17 * i >= 7 * (sa.n + sb.n)
        ), dup_turns AS (
            SELECT DISTINCT conv_id, turn_idx FROM (
                SELECT ca AS conv_id, ta AS turn_idx FROM qual
                UNION ALL SELECT cb, tb FROM qual
            )
        )
        SELECT b.role,
               CAST(sum(b.n_toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(sum(CASE WHEN d.conv_id IS NOT NULL
                                      THEN b.n_toks ELSE 0 END), 0) AS BIGINT)
                   AS n_dup_tokens,
               CAST((20000 * coalesce(sum(CASE WHEN d.conv_id IS NOT NULL
                                               THEN b.n_toks ELSE 0 END), 0)
                     + sum(b.n_toks)) // (2 * sum(b.n_toks)) AS BIGINT)
                   AS dup_token_share_e4
        FROM base b
        LEFT JOIN dup_turns d
          ON d.conv_id = b.conv_id AND d.turn_idx = b.turn_idx
        GROUP BY b.role ORDER BY b.role
    """

    return oracles
