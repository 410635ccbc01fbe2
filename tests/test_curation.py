"""Curation operators (operators/curation.py): decontamination,
repetition scoring, stratified sampling, sequence packing."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datasketches_server_spark.functions.portable import u01
from datasketches_server_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    repetition_scores,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_counts_and_zero_hit_rows(spark):
    train = _docs(
        spark,
        [
            # shares the eval 4-gram "a b c d" (and "b c d e")
            (1, "a b c d e"),
            # no overlap at 4-gram granularity
            (2, "x y z w v"),
            # shorter than n=4: one clamped gram, no overlap
            (3, "a b"),
        ],
    )
    ev = _docs(spark, [(100, "a b c d e f")])
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, ev, n=4).collect()
    }
    assert set(out) == {1, 2, 3}  # zero-hit docs are kept
    assert out[1]["n_grams"] == 2 and out[1]["n_contaminated"] == 2
    assert out[1]["contamination"] == 1.0
    assert out[2]["n_contaminated"] == 0 and out[2]["contamination"] == 0.0
    assert out[3]["n_grams"] == 1 and out[3]["n_contaminated"] == 0


def test_decontaminate_plan_broadcasts_eval_no_python(spark):
    train = _docs(spark, [(i, f"tok{i} a b c") for i in range(20)])
    ev = _docs(spark, [(99, "a b c d")])
    p = decontaminate(train, ev, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p  # eval grams never shuffle the train side
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_repetition_scores_handcrafted(spark):
    d = _docs(
        spark,
        [
            # "a b a b a b": trigrams = [a b a, b a b, a b a, b a b] ->
            # 4 total, 2 distinct, max multiplicity 2
            (1, "a b a b a b"),
            # all-distinct trigrams
            (2, "p q r s t"),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_scores(d, n=3).collect()}
    assert out[1]["n_grams"] == 4 and out[1]["n_distinct"] == 2
    assert out[1]["rep_ratio"] == 0.5 and out[1]["max_repeat"] == 2
    assert out[2]["rep_ratio"] == 0.0 and out[2]["max_repeat"] == 1


def test_stratified_sample_two_phase_equals_naive_window(spark):
    rows = [(i, f"body {i}", ["en", "de", "fr"][i % 3]) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = stratified_sample(d, ["lang"], k=7, partial_buckets=5)

    w = Window.partitionBy("lang").orderBy("_k", "doc_id")
    naive = (
        d.select("lang", "doc_id").withColumn("_k", u01(F.col("doc_id"), "strat"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 7)
        .select("lang", "doc_id", "rk")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    sizes = dict(got.groupBy("lang").count().collect())
    assert sizes == {"en": 7, "de": 7, "fr": 7}


def test_stratified_sample_small_stratum_returns_all(spark):
    d = spark.createDataFrame(
        [(1, "x", "en"), (2, "y", "en"), (3, "z", "de")],
        "doc_id long, text string, lang string",
    )
    out = stratified_sample(d, ["lang"], k=10).collect()
    assert len(out) == 3  # k larger than a stratum keeps every member


def test_pack_sequences_matches_greedy_reference(spark):
    # deterministic token counts: doc i has (i % 7) + 1 tokens
    rows = [
        (i, " ".join(f"t{j}" for j in range((i % 7) + 1)), f"s{i % 2}")
        for i in range(50)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cap = 10
    got = {
        (r["source"], r["bin"]): (r["n_docs"], r["bin_tokens"], r["fill"])
        for r in pack_sequences(d, capacity=cap, strata_cols=["source"]).collect()
    }

    # driver-side greedy reference: same rule, per source in doc_id order
    import collections

    ref: dict = collections.defaultdict(lambda: [0, 0])
    for i, text, src in sorted(rows, key=lambda r: r[0]):
        n_tok = len(text.split())
        # cum BEFORE this doc determines its bin
        pre = sum(len(t.split()) for j, t, s in rows if s == src and j < i)
        b = pre // cap
        ref[(src, b)][0] += 1
        ref[(src, b)][1] += n_tok
    assert set(got) == set(ref)
    for k, (n_docs, bin_tokens, fill) in got.items():
        assert [n_docs, bin_tokens] == ref[k]
        assert fill == round(bin_tokens / cap, 4)
    # every doc lands in exactly one bin (documents are never split)
    assert sum(v[0] for v in got.values()) == 50


def test_pack_sequences_plan_no_python_narrow_window(spark):
    rows = [(i, "a b c", "s0") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    p = (
        pack_sequences(d, capacity=8, strata_cols=["source"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the text column is reduced to n_tok before the window shuffle
    # (attribute references render as "text#<id>"; bare "text" would
    # also match unrelated plan words like "context")
    assert "text#" not in p.split("Window")[0].split("Exchange")[-1]


def _turns(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")


def test_turn_templates_cross_conv_only(spark):
    from datasketches_server_spark.operators.curation import turn_templates

    t = _turns(
        spark,
        [
            # "hello" repeats WITHIN conv A only -> not a template
            ("A", 0, "user", "hello"),
            ("A", 1, "assistant", "hello"),
            # "ack" shared by B and C (and twice in B) -> template,
            # n_convs=2, n_occurrences=3, exemplar=min conv id
            ("B", 0, "user", "ack"),
            ("B", 1, "assistant", "ack"),
            ("C", 0, "user", "ack"),
            ("C", 1, "assistant", "unique reply"),
        ],
    )
    out = turn_templates(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_convs"] == 2 and r["n_occurrences"] == 3
    assert r["exemplar_conv"] == "B" and r["role"] == "assistant"


def test_template_contamination_fractions(spark):
    from datasketches_server_spark.operators.curation import template_contamination

    t = _turns(
        spark,
        [
            ("A", 0, "user", "hello"),
            ("A", 1, "assistant", "hello"),   # within-conv repeat: clean
            ("B", 0, "user", "ack"),
            ("B", 1, "assistant", "ack"),
            ("B", 2, "assistant", "fresh"),
            ("C", 0, "user", "ack"),
            ("C", 1, "assistant", "unique reply"),
        ],
    )
    out = {r["conv_id"]: r for r in template_contamination(t).collect()}
    assert out["A"]["n_template_turns"] == 0 and out["A"]["template_frac"] == 0.0
    assert out["B"]["n_turns"] == 3 and out["B"]["n_template_turns"] == 2
    assert out["B"]["template_frac"] == 0.6667
    assert out["C"]["n_template_turns"] == 1 and out["C"]["template_frac"] == 0.5


def test_agent_loop_scores_planted(spark):
    """A planted 3-turn identical run trips loop_flag; alternating-role
    repeats of the same text do NOT count (sig includes the role)."""
    from datasketches_server_spark.operators.curation import agent_loop_scores

    rows = [
        # c1: healthy alternating conversation
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "bye"),
        # c2: assistant stuck repeating the same line 3x
        ("c2", 0, "user", "do it"),
        ("c2", 1, "assistant", "retrying"),
        ("c2", 2, "assistant", "retrying"),
        ("c2", 3, "assistant", "retrying"),
        ("c2", 4, "user", "stop"),
        # c3: same TEXT repeats but roles alternate -> not a loop run
        ("c3", 0, "user", "ok"),
        ("c3", 1, "assistant", "ok"),
        ("c3", 2, "user", "ok"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    got = {r["conv_id"]: r.asDict() for r in agent_loop_scores(df).collect()}
    assert got["c1"]["n_repeat_turns"] == 0 and got["c1"]["max_run"] == 1
    assert not got["c1"]["loop_flag"]
    assert got["c2"]["n_repeat_turns"] == 2 and got["c2"]["max_run"] == 3
    assert got["c2"]["loop_flag"]
    assert got["c3"]["n_repeat_turns"] == 0 and got["c3"]["max_run"] == 1
    assert not got["c3"]["loop_flag"]


def test_structure_audit_planted(spark):
    """Each structural defect is detected on a conv built to have
    exactly it: index gap, duplicate index, role violation, empty."""
    from datasketches_server_spark.operators.curation import structure_audit

    rows = [
        ("ok", 0, "user", "a"), ("ok", 1, "assistant", "b"),
        ("gap", 0, "user", "a"), ("gap", 2, "assistant", "b"),
        ("dupidx", 0, "user", "a"), ("dupidx", 0, "assistant", "b"),
        ("roles", 0, "user", "a"), ("roles", 1, "user", "b"), ("roles", 2, "user", "c"),
        ("empty", 0, "user", "  "), ("empty", 1, "assistant", "x"),
        # ADVICE r4: NULL text is malformed input too -- must count as empty
        ("nulls", 0, "user", None), ("nulls", 1, "assistant", "y"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {r["conv_id"]: r.asDict() for r in structure_audit(df).collect()}
    assert not got["ok"]["has_gap"] and got["ok"]["n_role_violations"] == 0
    assert got["ok"]["n_empty_turns"] == 0
    assert got["gap"]["has_gap"]
    assert got["dupidx"]["has_gap"]  # duplicate turn_idx is a gap too
    assert got["roles"]["n_role_violations"] == 2 and not got["roles"]["has_gap"]
    assert got["empty"]["n_empty_turns"] == 1
    assert got["nulls"]["n_empty_turns"] == 1  # coalesce before trim


def test_temperature_mix_allocation(spark):
    """alpha=0.5 upsamples the small source to rate 1.0 under a 50%
    budget; the big source's rate matches the closed form; realized
    counts equal a direct replay of the same u01 gate."""
    import pyspark.sql.functions as F

    from datasketches_server_spark.functions.portable import u01
    from datasketches_server_spark.operators.curation import temperature_mix

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 90, "big").otherwise("small").alias("source"),
    )
    got = {r["source"]: r.asDict() for r in temperature_mix(docs, 0.5, 0.5).collect()}
    import math

    W = math.sqrt(90) + math.sqrt(10)
    want_big = round(min(1.0, 0.5 * 100 * math.sqrt(90) / (W * 90)), 6)
    assert got["small"]["rate"] == 1.0 and got["small"]["n_sampled"] == 10
    assert got["big"]["rate"] == want_big
    replay = (
        docs.where(F.col("source") == "big")
        .where(u01(F.col("doc_id").cast("string"), salt="mix|") <= F.lit(want_big))
        .count()
    )
    assert got["big"]["n_sampled"] == replay


def test_agent_loop_scores_null_turns(spark):
    """NULL role/text coalesce to sentinels: consecutive NULL-text
    same-role turns ARE a repeat run; a NULL-text turn never matches a
    real one; concat never silently drops a part."""
    from datasketches_server_spark.operators.curation import agent_loop_scores

    rows = [
        ("n1", 0, "assistant", None),
        ("n1", 1, "assistant", None),
        ("n1", 2, "assistant", None),
        ("n2", 0, "assistant", None),
        ("n2", 1, "assistant", "real text"),
        ("n2", 2, "assistant", None),
        ("n3", 0, None, "x"),
        ("n3", 1, None, "x"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {r["conv_id"]: r.asDict() for r in agent_loop_scores(df).collect()}
    assert got["n1"]["max_run"] == 3 and got["n1"]["loop_flag"]
    assert got["n1"]["n_repeat_turns"] == 2
    assert got["n2"]["max_run"] == 1 and got["n2"]["n_repeat_turns"] == 0
    assert got["n3"]["max_run"] == 2 and got["n3"]["n_repeat_turns"] == 1


def test_cluster_safe_split_atomic_and_deterministic(spark):
    """Every member of a cluster lands on the same side; unlabeled docs
    are their own unit; assignment replays the u01 hash exactly."""
    from datasketches_server_spark.operators.curation import cluster_safe_split

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    # two clusters: {0..9} -> "0", {10..14} -> "10"; rest unlabeled
    clusters = spark.createDataFrame(
        [(str(i), "0") for i in range(10)] + [(str(i), "10") for i in range(10, 15)],
        "conv_id string, cluster_id string",
    )
    out = cluster_safe_split(docs, clusters, eval_frac=0.25).collect()
    by_id = {r["conv_id"]: r for r in out}
    assert len(by_id) == 200
    s0 = {by_id[str(i)]["split"] for i in range(10)}
    s1 = {by_id[str(i)]["split"] for i in range(10, 15)}
    assert len(s0) == 1 and len(s1) == 1, "cluster members split apart"
    assert all(by_id[str(i)]["split_unit"] == "0" for i in range(10))
    assert by_id["42"]["split_unit"] == "42"
    # replay: split == eval iff u01('split|' + unit) <= frac
    for cid in ("0", "10", "42", "199"):
        want = "eval" if _u01_py("split|" + by_id[cid]["split_unit"]) <= 0.25 else "train"
        assert by_id[cid]["split"] == want
    # unlabeled ids draw independently: both sides populated at n=185
    splits = {by_id[str(i)]["split"] for i in range(15, 200)}
    assert splits == {"train", "eval"}


def _u01_py(s: str) -> float:
    import hashlib

    h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2147483648
    return (h + 1) / 2147483648.0


def test_cluster_safe_split_no_edge_crosses(spark, sf_dir):
    """The leakage property on real driver data: no verified dup edge
    crosses the train/eval boundary."""
    from datasketches_server_spark.operators.curation import cluster_safe_split
    from datasketches_server_spark.plans.queries import (
        _t,
        documents_dedup_result,
    )

    res = documents_dedup_result(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    assign = cluster_safe_split(d, res.clusters, eval_frac=0.3)
    e = (
        res.edges.select("a", "b")
        .join(assign.select(F.col("conv_id").alias("a"), F.col("split").alias("sa")), "a")
        .join(assign.select(F.col("conv_id").alias("b"), F.col("split").alias("sb")), "b")
    )
    assert e.where(F.col("sa") != F.col("sb")).count() == 0
    n_eval = assign.where(F.col("split") == "eval").count()
    assert 0 < n_eval < assign.count()


def test_token_budget_select_matches_naive(spark):
    """Bucket-decomposed selection == naive global (quality DESC, id)
    running sum, including zero-token docs and a split boundary bucket."""
    from datasketches_server_spark.operators.curation import token_budget_select

    texts = {
        1: "aaaa bbbb cccc dddd " * 10,          # 40 tok, decent quality
        2: "aaaa bbbb cccc dddd " * 10,          # same bucket as 1
        3: "word " * 25,                          # 25 tok
        4: "",                                    # 0 tok
        5: "!!! ??? ;;; ::: " * 12,               # punct-heavy, low quality
        6: "mixed bag of several words here now " * 6,
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in token_budget_select(df, budget_frac=0.5).collect()
    }
    # naive replay on the operator's own (quality, n_tok) scoring
    from datasketches_server_spark.functions.text import quality_score, token_count
    from pyspark.sql import functions as F2

    scored = df.select(
        "doc_id",
        F2.round(quality_score(F2.col("text")), 4).alias("q"),
        token_count(F2.col("text")).alias("n"),
    ).collect()
    budget = int(sum(r["n"] for r in scored) * 0.5)
    cum, want = 0, set()
    for r in sorted(scored, key=lambda r: (-r["q"], r["doc_id"])):
        cum += r["n"]
        if cum <= budget:
            want.add(r["doc_id"])
    assert set(got) == want and want  # non-trivial selection


def test_chunk_documents_stride_arithmetic(spark):
    from datasketches_server_spark.operators.curation import chunk_documents

    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame(
        [(1, mk(100)), (2, mk(64)), (3, mk(65)), (4, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    for v in by.values():
        v.sort(key=lambda r: r["chunk_idx"])
    # 100 tok: starts 0, 48; lens 64, 52; every token covered
    assert [(r["start_tok"], r["chunk_len"]) for r in by[1]] == [(0, 64), (48, 52)]
    assert by[1][1]["chunk_text"].split()[-1] == "t99"
    assert by[1][0]["chunk_text"].split() == [f"t{i}" for i in range(64)]
    # exactly chunk-sized: one chunk
    assert [(r["start_tok"], r["chunk_len"]) for r in by[2]] == [(0, 64)]
    # one over: tail window
    assert [(r["start_tok"], r["chunk_len"]) for r in by[3]] == [(0, 64), (48, 17)]
    # empty doc: one empty chunk (consistent with the oracle's range)
    assert [(r["start_tok"], r["chunk_len"], r["chunk_text"]) for r in by[4]] == [(0, 0, "")]


def test_duplicate_chunks_planted(spark, tmp_path):
    """Exact-twin docs show 100% duplicated chunks; a unique doc shows
    none; a third copy raises spread but not the per-doc fraction."""
    from datasketches_server_spark.plans.queries import q77_duplicate_chunks

    mk = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    import os

    tmp = str(tmp_path)
    spark.createDataFrame(
        [
            (1, mk(150, "a"), "en", "web"),
            (2, mk(150, "a"), "en", "web"),   # twin of 1: every chunk dup
            (3, mk(150, "a"), "en", "web"),   # triplet: still frac 1.0
            (4, mk(150, "b"), "en", "web"),   # unique: frac 0.0
            (5, mk(40, "c"), "en", "web"),    # short unique: one chunk, 0.0
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text")).write.parquet(
        os.path.join(tmp, "documents.parquet")
    )
    got = {r["doc_id"]: r for r in q77_duplicate_chunks(spark, tmp).collect()}
    assert got[1]["n_chunks"] == 3 and got[1]["dup_chunk_frac"] == 1.0
    assert got[2]["dup_chunk_frac"] == 1.0 and got[3]["dup_chunk_frac"] == 1.0
    assert got[4]["n_dup_chunks"] == 0 and got[4]["dup_chunk_frac"] == 0.0
    assert got[5]["n_chunks"] == 1 and got[5]["n_dup_chunks"] == 0


def test_vocabulary_profile_planted(spark, tmp_path):
    """Exact vocab/TTR/hapax arithmetic on a corpus small enough to
    count by hand."""
    from datasketches_server_spark.plans.queries import q79_vocabulary_profile
    import os

    spark.createDataFrame(
        [
            (1, "alpha beta alpha gamma", "en", "s1"),   # s1: 4 tok
            (2, "beta beta delta", "en", "s1"),          # s1: 3 tok
            (3, "solo words only here", "en", "s2"),     # s2: all hapax
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text")).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {r["source"]: r for r in q79_vocabulary_profile(spark, str(tmp_path)).collect()}
    s1 = got["s1"]
    # s1 tokens: alpha x2, beta x3, gamma x1, delta x1 -> 7 total, vocab 4, hapax 2
    assert s1["total_tokens"] == 7 and s1["vocab_size"] == 4 and s1["hapax_count"] == 2
    assert s1["ttr"] == round(4 / 7, 4) and s1["n_docs"] == 2
    s2 = got["s2"]
    assert s2["vocab_size"] == 4 and s2["hapax_frac"] == 1.0


# ------------------------------------------------------------ shard export

def test_shard_assign_matches_naive_global_window(spark):
    """The bucket-decomposed two-level cumsum equals the naive global
    window doc for doc, including ids with mixed lengths (lexicographic
    order: '10' < '9') and zero-token docs on a shard boundary."""
    from pyspark.sql import Window

    from datasketches_server_spark.operators.export import shard_assign

    rows = [(str(i), "tok " * ((i * 7) % 13)) for i in range(200)] + [("999z", "")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["tok_before"], r["shard_id"])
        for r in shard_assign(df, target_tokens=50, prefix_len=1).collect()
    }
    naive = (
        shard_assign(df, target_tokens=50, prefix_len=1)
        .select("doc_id", "n_tok")
        .withColumn(
            "tok_before",
            F.sum("n_tok").over(
                Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .fillna({"tok_before": 0})
        .collect()
    )
    assert len(got) == 201
    for r in naive:
        assert got[r["doc_id"]] == (r["tok_before"], r["tok_before"] // 50)


def test_write_shards_roundtrip(spark, tmp_path):
    """Export writes shard-partitioned parquet + a manifest; reading a
    single shard directory returns exactly the manifest's contiguous id
    range, and every shard but the last holds >= target tokens."""
    from datasketches_server_spark.operators.export import write_shards

    rows = [(str(i), "w " * (5 + i % 11)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = str(tmp_path / "export")
    manifest = write_shards(df, out, target_tokens=400).collect()
    assert len(manifest) >= 3
    # greedy-cut invariant: cumulative tokens through shard k cross
    # (k+1)*target for every non-final shard (a straddling doc charges
    # its tokens to the shard where it STARTS, so an individual shard
    # may undershoot target by up to one doc -- but the running total
    # can't)
    cum = 0
    for m in manifest[:-1]:
        cum += m["n_tokens"]
        assert cum >= (m["shard_id"] + 1) * 400
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == 300
    one = manifest[1]
    shard_docs = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/shards/shard_id={one['shard_id']}").collect()
    )
    assert len(shard_docs) == one["n_docs"]
    assert shard_docs[0] == one["first_doc"] and shard_docs[-1] == one["last_doc"]


def test_cli_export_mode(spark, tmp_path):
    """--export writes shard-partitioned parquet + manifest through the
    ops entry point; doc totals survive the round trip."""
    from datasketches_server_spark.__main__ import main

    rows = [(str(i), "w " * (5 + i % 7)) for i in range(120)]
    docs_p = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(docs_p)
    wd = str(tmp_path / "wd")
    assert (
        main(
            ["--workdir", wd, "--export", docs_p, "--export-target-tokens", "300"],
            spark=spark,
        )
        == 0
    )
    back = spark.read.parquet(f"{wd}/export/shards")
    manifest = spark.read.parquet(f"{wd}/export/_manifest")
    assert back.count() == 120
    assert manifest.agg(F.sum("n_docs")).collect()[0][0] == 120


def test_unigram_surprisal_planted(spark):
    from datasketches_server_spark.operators.curation import unigram_surprisal

    # corpus: "the" x 12 occurrences (2 digits), "zyx" x 1 (1 digit);
    # total 13 tokens -> N digits = 2.  surprisal(the) = 2-2 = 0,
    # surprisal(zyx) = 2-1 = 1.
    docs = _docs(
        spark,
        [
            (1, "the the the the the the"),          # mean 0 -> 0
            (2, "the the the the the zyx"),          # mean 1/6 -> 1667
            (3, "the"),                              # mean 0 -> 0
        ],
    )
    got = {
        r["doc_id"]: (r["n_toks"], r["ppl_bucket_e4"])
        for r in unigram_surprisal(docs).collect()
    }
    assert got == {1: (6, 0), 2: (6, 1667), 3: (1, 0)}


def test_unigram_surprisal_plan_no_python(spark):
    from datasketches_server_spark.operators.curation import unigram_surprisal

    docs = _docs(spark, [(1, "a b c"), (2, "a b d")])
    plan = unigram_surprisal(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dsir_importance_target_like_scores_higher(spark):
    from datasketches_server_spark.operators.curation import dsir_importance

    rows = []
    # target domain: 10 docs of "alpha beta gamma delta"
    for i in range(10):
        rows.append((100 + i, "tgt", "alpha beta gamma delta"))
    # raw doc 1: verbatim target-style text; raw docs 2..9: unrelated,
    # all sharing their own common bigrams so the raw LM knows them.
    rows.append((1, "raw", "alpha beta gamma delta"))
    for i in range(2, 10):
        rows.append((i, "raw", "red green blue cyan"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = {
        r["doc_id"]: r["wt_per_gram_e4"]
        for r in dsir_importance(docs, target_source="tgt").collect()
    }
    assert set(w) == set(range(1, 10))  # target docs excluded
    assert w[1] > w[2], w
    # unrelated docs all share the same score (identical gram profile)
    assert len({w[i] for i in range(2, 10)}) == 1


def test_dsir_importance_integer_buckets_and_shift(spark):
    from datasketches_server_spark.operators.curation import dsir_importance

    # hand-check one doc: target = 1 doc "a b", raw = 1 doc "a b".
    # grams(doc) distinct bigrams of ["a","b"] = ["a b"].
    # cnt_t(a b)=1, cnt_r(a b)=1; N_t=1, N_r=1 -> shift = digits(2)-digits(2)=0
    # w = digits(2)-digits(2)+0 = 0 -> wt=0, wpg=0
    docs = spark.createDataFrame(
        [(1, "tgt", "a b"), (2, "raw", "a b")],
        "doc_id long, source string, text string",
    )
    rows = dsir_importance(docs, target_source="tgt").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["source"], r["n_grams"], r["wt"], r["wt_per_gram_e4"]) == (
        2, "raw", 1, 0, 0
    )
