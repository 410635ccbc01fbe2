"""Per-partition lineage checkpointing + resume.

The reference has none of this (server state is volatile; SURVEY.md
section 2.3 'must exceed').  Contract (BASELINE.json north_star): every
stage checkpoints per-partition lineage (partition id, input snapshot,
signature config hash, row counts) so a killed job resumes without
recomputation.

Design:

* Work units: hash buckets of conv_id (``pmod(xxhash64(conv_id), B)``)
  for the per-conversation stage (signatures -- the expensive one);
  band-bucket ranges (``pmod(bucket_hash, edge_units)``) for the edge
  stage -- an LSH band bucket lies wholly inside one unit, so per-unit
  candidate generation + verify is complete, and a kill mid-verify
  recomputes only pending units (the same pair surfacing in buckets of
  two units is deduplicated at read time); single ALL units for the CC
  label fixpoint and the singleton attach (checkpointed separately so a
  kill between them resumes from the labeled-edges output).
* Stage outputs land under ``{workdir}/{stage}/{config_hash}_{input_fp}/
  _bucket=<i>`` -- the output path is KEYED by config hash and input
  fingerprint, so two configs (or two input snapshots) can never serve
  each other's outputs (a config change writes to a fresh keyspace and
  the old outputs stay valid for the old config).
* Stage 1 writes ALL pending buckets in ONE ``partitionBy("_bucket")``
  job (dynamic partition overwrite: re-running a crashed subset replaces
  only those buckets) followed by ONE bulk manifest append -- at 10^4-
  10^5 buckets a per-bucket write loop would be a driver-side bottleneck
  (one Spark job per bucket).
* The manifest (``{workdir}/_lineage`` parquet) gains one row per
  completed unit: (stage, partition_id, config_hash, input_fingerprint,
  row_count, finished_at).  It is append-only; the newest row per key
  wins.  Resume = anti-join of the unit list against manifest rows whose
  (config_hash, input_fingerprint) match -- a config change or new input
  snapshot invalidates exactly the affected stages.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.components import attach_singletons, connected_components
from ..operators.lsh import (
    band_buckets,
    bucket_stats,
    bucket_stats_from_ranked,
    candidate_pairs,
    verify_pairs,
)
from .pipeline import conv_signatures

MANIFEST = "_lineage"


@dataclass
class RunStats:
    computed: dict[str, int] = field(default_factory=dict)  # stage -> units computed
    skipped: dict[str, int] = field(default_factory=dict)
    # skew observability (no-silent-caps rule): band-bucket histogram
    # from operators.lsh.bucket_stats, filled whenever the edge stage
    # actually computes -- n_buckets / max_bucket / star_buckets /
    # dropped_members, so capped-bucket drops are visible in the run
    # summary instead of silently shaping recall.
    bucket_stats: dict[str, int] = field(default_factory=dict)


class LineageRunner:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        cfg: PipelineConfig = DEFAULT_CONFIG,
        edge_units: int = 8,
    ):
        """edge_units: resume granularity for the edge stage -- band
        buckets are range-partitioned into this many units (pmod of the
        bucket hash), each checkpointed independently, so a kill during
        verify recomputes only pending units instead of the whole stage.
        An execution knob like cc_driver_threshold (NOT part of
        PipelineConfig: tuning it must not invalidate lineage); at 100 TB
        size it so one unit's verify fits a re-run budget (10^2-10^3)."""
        self.spark = spark
        self.workdir = workdir
        self.cfg = cfg
        self.edge_units = edge_units
        self.config_hash = cfg.config_hash()
        os.makedirs(workdir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.workdir, MANIFEST)

    def manifest(self) -> DataFrame:
        p = self._manifest_path()
        schema = "stage string, partition_id int, config_hash string, input_fingerprint string, row_count long, finished_at double"
        if not os.path.isdir(p):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(p)

    def _record_bulk(self, stage: str, counts: dict[int, int], input_fp: str) -> None:
        """ONE manifest append for any number of completed units."""
        now = time.time()
        rows = [
            (stage, int(pid), self.config_hash, input_fp, int(n), now)
            for pid, n in counts.items()
        ]
        df = self.spark.createDataFrame(
            rows,
            "stage string, partition_id int, config_hash string, input_fingerprint string, row_count long, finished_at double",
        )
        df.coalesce(1).write.mode("append").parquet(self._manifest_path())

    def done_units(self, stage: str, input_fp: str) -> set[int]:
        m = self.manifest()
        rows = (
            m.where(
                (F.col("stage") == stage)
                & (F.col("config_hash") == self.config_hash)
                & (F.col("input_fingerprint") == input_fp)
            )
            .select("partition_id")
            .distinct()
            .collect()
        )
        done = set()
        for r in rows:
            # trust manifest only if the output dir actually exists
            if os.path.isdir(self._unit_path(stage, r["partition_id"], input_fp)):
                done.add(r["partition_id"])
        return done

    def _stage_key(self, input_fp: str) -> str:
        return f"{self.config_hash}_{input_fp}"

    def _stage_dir(self, stage: str, input_fp: str) -> str:
        return os.path.join(self.workdir, stage, self._stage_key(input_fp))

    def _unit_path(self, stage: str, partition_id: int, input_fp: str = "static") -> str:
        return os.path.join(self._stage_dir(stage, input_fp), f"_bucket={partition_id}")

    @staticmethod
    def _has_parquet_files(path: str) -> bool:
        """True iff the dir holds COMMITTED parquet data files.  Files
        under in-flight committer dirs (`_temporary`, dot-prefixed
        staging) do not count -- a killed write must read as absent so
        resume/backfill heals it, never as complete (Spark itself
        ignores `_`/`.`-prefixed paths at read; partition dirs like
        `_bucket=3` are NOT filtered because their own path component
        carries the `=`)."""
        for root, dirs, files in os.walk(path):
            dirs[:] = [
                d for d in dirs
                if "=" in d or not (d.startswith("_") or d.startswith("."))
            ]
            if any(f.endswith(".parquet") and not f.startswith(".") for f in files):
                return True
        return False

    def _stage_df(self, stage: str, input_fp: str, fallback: DataFrame) -> DataFrame:
        """Read a stage's output; an all-empty stage (empty corpus, or
        every bucket produced zero rows) leaves only empty `_bucket=`
        dirs with no parquet files, where a bare read would throw --
        fall back to an empty DataFrame with the stage's schema (taken
        from `fallback`, a lazily-built plan: .schema runs no job).

        The fallback is NARROW by design: it applies only when the stage
        dir verifiably holds no parquet data files.  Any other read
        failure (corrupt footer, transient FS error, permissions)
        re-raises -- silently serving an empty stage would let
        downstream stages compute from nothing and record themselves
        done in the manifest, so a later resume would serve wrong
        results with no error."""
        path = self._stage_dir(stage, input_fp)
        if not self._has_parquet_files(path):
            return self.spark.createDataFrame([], fallback.schema)
        return self.spark.read.parquet(path).drop("_bucket")

    # -- pipeline ----------------------------------------------------------
    def _signatures_stage(
        self, transcripts: DataFrame, input_fp: str, stats: RunStats
    ) -> DataFrame:
        """Stage 1, shared by run() and run_incremental(): per-bucket
        signatures, ONE partitioned write for all pending buckets + ONE
        bulk manifest append (see module docstring)."""
        B = self.cfg.num_buckets
        bucket = F.pmod(F.xxhash64("conv_id"), F.lit(B)).cast("int")
        empty_state = conv_signatures(transcripts.limit(0), self.cfg)
        done = self.done_units("signatures", input_fp)
        pending = [i for i in range(B) if i not in done]
        stats.skipped["signatures"] = len(done)
        stats.computed["signatures"] = len(pending)
        if pending:
            src = transcripts.withColumn("_bucket", bucket)
            pend = (
                src.where(F.col("_bucket").isin(pending))
                if len(pending) < B
                else src
            )
            sigs = conv_signatures(pend.drop("_bucket"), self.cfg).withColumn(
                "_bucket", bucket
            )
            (
                sigs.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_bucket")
                .parquet(self._stage_dir("signatures", input_fp))
            )
            counts = {
                r["_bucket"]: r["n"]
                for r in self._stage_counts("signatures", input_fp, pending)
            }
            # buckets that received no conv still count as completed units
            self._record_bulk(
                "signatures", {i: counts.get(i, 0) for i in pending}, input_fp
            )
            # empty buckets produce no directory; materialize an empty one
            # so done_units' existence check passes on resume
            for i in pending:
                os.makedirs(self._unit_path("signatures", i, input_fp), exist_ok=True)
        return self._stage_df("signatures", input_fp, fallback=empty_state)

    def read_clusters(self, fps: list[str], fallback: DataFrame) -> DataFrame:
        """Compose a clusters chain: a full labeling written by run()
        followed by per-batch DELTAS written by run_incremental (old
        convs whose label changed + new convs).  The LATEST fp that
        labels a conv wins -- one narrow window over base + deltas,
        paid only when the composition is materialized (emitting the
        full labeling is inherently O(corpus); STORING it per batch is
        not, which is the point of the deltas)."""
        from pyspark.sql import Window

        parts = [
            self._stage_df("clusters", fp, fallback=fallback).withColumn(
                "_pri", F.lit(i)
            )
            for i, fp in enumerate(fps)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        w = Window.partitionBy("conv_id").orderBy(F.desc("_pri"))
        return (
            out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("conv_id", "cluster_id")
        )

    def ensure_band_index(self, input_fp: str) -> None:
        """Backfill the persisted band-bucket index for a COMPLETED
        signatures stage (plans/band_index.py): one O(|stage|) banding
        write keyed by (config_hash, input_fp), no signature UDF.
        No-op when the index already exists -- the rolling convention is
        one index dir per input snapshot, so incremental chains read the
        union of their ancestors' dirs and each batch is banded exactly
        once, ever."""
        from .band_index import band_index_dir, write_band_index

        path = band_index_dir(self.workdir, self.cfg, input_fp)
        if self._has_parquet_files(path):
            return
        sig_dir = self._stage_dir("signatures", input_fp)
        if not self._has_parquet_files(sig_dir):
            raise ValueError(
                f"no completed signatures stage for input_fp={input_fp!r}; "
                "run() or run_incremental() it first"
            )
        state = self.spark.read.parquet(sig_dir).drop("_bucket")
        write_band_index(state, self.workdir, self.cfg, input_fp)

    def decontam_eval(self, eval_t: DataFrame, fps: list[str]) -> DataFrame:
        """Cross-corpus decontamination against the INDEXED chain: every
        verified near-dup pair between the chain's corpus (train side)
        and ``eval_t`` (an eval-suite transcripts DataFrame), at the
        run's own shingle/signature config.

        Nothing about the indexed corpus recomputes: the train side is
        the persisted signatures stages + band-index dirs (backfilled
        once if a base predates the index convention), probed exactly
        the way run_incremental probes them
        (plans/pipeline.cross_corpus_near_dups indexed path -- eval band
        rows broadcast, candidate members pushed down to the signature
        scan)."""
        from functools import reduce

        from .band_index import read_band_index
        from .pipeline import cross_corpus_near_dups

        if not fps:
            raise ValueError("fps must name the indexed chain to probe")
        sigs = reduce(
            lambda a, b: a.unionByName(b),
            [
                self.spark.read.parquet(self._stage_dir("signatures", fp)).drop("_bucket")
                for fp in fps
            ],
        )
        for fp in fps:
            self.ensure_band_index(fp)
        idx = reduce(
            lambda a, b: a.unionByName(b),
            [read_band_index(self.spark, self.workdir, self.cfg, fp) for fp in fps],
        )
        return cross_corpus_near_dups(
            None, eval_t, self.cfg, train_state=sigs, train_buckets=idx
        )

    def compact_chain(self, fps: list[str], out_fp: str) -> dict:
        """Fold an incremental chain (a run() base + run_incremental
        batches, oldest first) into ONE consolidated snapshot under
        out_fp: signatures, verified edges, the band index, and the
        composed full clusters are each rewritten once.  The dedup
        stores' analog of the metrics append-log compaction: afterwards
        ``run_incremental(..., base_fps=[out_fp])`` reads one stage per
        store instead of len(chain), and read_clusters composes one
        full labeling instead of base + N deltas.

        Deliberately heavyweight (rewrites O(corpus) once) -- periodic
        maintenance, like a table format's rewrite/expire, NOT per
        batch.  Idempotent: every write overwrites out_fp's keyspace.
        Returns row counts per store."""
        sigs, edges, idx, full = self._read_chain_relations(fps)
        return self._write_snapshot(sigs, edges, idx, full, out_fp)

    def _read_chain_relations(self, fps: list[str]):
        """The four dedup stores of an incremental chain, composed:
        (signatures union, deduped verified-edge union, band-index
        union, latest-wins full cluster labeling)."""
        from functools import reduce

        from .band_index import read_band_index

        if not fps:
            raise ValueError("fps must name the chain to fold")
        donor_t = self.spark.createDataFrame(
            [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
        empty_state = conv_signatures(donor_t, self.cfg)
        sigs = reduce(
            lambda a, b: a.unionByName(b),
            [self._stage_df("signatures", fp, fallback=empty_state) for fp in fps],
        )
        # per-batch edge sets are disjoint (old-old pairs are never
        # re-emitted), the dropDuplicates is crash-replay belt-and-braces
        unit_of_bucket = F.pmod(F.col("bucket"), F.lit(self.edge_units)).cast("int")
        empty_edges = verify_pairs(
            candidate_pairs(
                band_buckets(empty_state, self.cfg.lsh).withColumn("_unit", unit_of_bucket),
                self.cfg.lsh, unit_col="_unit",
            ),
            empty_state, self.cfg.lsh, carry_cols=("_unit",),
        ).drop("_unit")
        edges = reduce(
            lambda a, b: a.unionByName(b),
            [
                self._stage_df("edges", fp, fallback=empty_edges).dropDuplicates(["a", "b"])
                for fp in fps
            ],
        ).dropDuplicates(["a", "b"])
        for fp in fps:
            # a base that never took an incremental batch has no band
            # dir yet; backfill is a no-op when it exists
            self.ensure_band_index(fp)
        idx = reduce(
            lambda a, b: a.unionByName(b),
            [read_band_index(self.spark, self.workdir, self.cfg, fp) for fp in fps],
        )
        id_type = dict(empty_edges.dtypes)["a"]
        empty_labels = self.spark.createDataFrame(
            [], f"conv_id {id_type}, cluster_id {id_type}"
        )
        full = self.read_clusters(fps, fallback=empty_labels)
        return sigs, edges, idx, full

    def _write_snapshot(self, sigs, edges, idx, clusters, out_fp: str) -> dict:
        """Write the four stores under ONE snapshot fp in the exact
        layouts run() produces (bucket-partitioned signatures, unit-
        partitioned edges and band index, single full clusters stage),
        recording manifest rows so later runs resume against it."""
        from .band_index import band_index_dir

        B, E = self.cfg.num_buckets, self.edge_units
        bucket = F.pmod(F.xxhash64("conv_id"), F.lit(B)).cast("int")
        (
            sigs.withColumn("_bucket", bucket)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(self._stage_dir("signatures", out_fp))
        )
        for i in range(B):
            os.makedirs(self._unit_path("signatures", i, out_fp), exist_ok=True)
        sig_counts = {
            r["_bucket"]: r["n"]
            for r in self._stage_counts("signatures", out_fp, list(range(B)))
        }
        self._record_bulk(
            "signatures", {i: sig_counts.get(i, 0) for i in range(B)}, out_fp
        )

        (
            edges.withColumn("_bucket", F.pmod(F.xxhash64("a", "b"), F.lit(E)).cast("int"))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(self._stage_dir("edges", out_fp))
        )
        for i in range(E):
            os.makedirs(self._unit_path("edges", i, out_fp), exist_ok=True)
        edge_counts = {
            r["_bucket"]: r["n"]
            for r in self._stage_counts("edges", out_fp, list(range(E)))
        }
        self._record_bulk("edges", {i: edge_counts.get(i, 0) for i in range(E)}, out_fp)

        (
            idx.withColumn("_unit", F.pmod(F.col("bucket"), F.lit(8)).cast("int"))
            .write.mode("overwrite")
            .partitionBy("_unit")
            .parquet(band_index_dir(self.workdir, self.cfg, out_fp))
        )

        clusters.write.mode("overwrite").parquet(self._unit_path("clusters", 0, out_fp))
        n_clusters = self._stage_count_all("clusters", out_fp)
        self._record_bulk("clusters", {0: n_clusters}, out_fp)

        return {
            "signatures": int(sum(sig_counts.values())),
            "edges": int(sum(edge_counts.values())),
            "clusters": n_clusters,
        }

    def retract_chain(self, fps: list[str], removed: DataFrame, out_fp: str) -> dict:
        """Remove conversations from an incremental chain and fold the
        result into ONE snapshot under out_fp -- compaction's delete
        half (plans/retract.py semantics: broadcast anti-joins on the
        stores; affected clusters re-solved from surviving edges so a
        removed bridge conv splits its cluster exactly as a recompute
        would).  Like compact_chain it is periodic maintenance, never
        an in-place rewrite: a crash leaves every chain dir intact and
        the caller flips --base-fps to [out_fp] only on success.
        Returns row counts per store."""
        from .retract import retract_convs

        sigs, edges, idx, full = self._read_chain_relations(fps)
        rm = removed.select("conv_id").distinct()
        sigs2, edges2, clusters2 = retract_convs(sigs, edges, full, rm)
        idx2 = idx.join(F.broadcast(rm), "conv_id", "left_anti")
        return self._write_snapshot(sigs2, edges2, idx2, clusters2, out_fp)

    def run_incremental(
        self,
        new_transcripts: DataFrame,
        input_fp: str,
        base_fps: list[str],
    ) -> tuple[dict[str, DataFrame], RunStats]:
        """Incremental-batch dedup THROUGH the lineage manifest: the
        new batch's signature buckets and edge units checkpoint exactly
        like run()'s, so a batch killed mid-verify resumes recomputing
        only pending units -- and every per-batch stage still scales
        with the batch (plans/pipeline.incremental_dedup semantics:
        persisted band index probe, delta-sized connected components).

        base_fps: the input fingerprints of the COMPLETED runs this
        batch builds on, oldest first -- e.g. ["base"] for the first
        increment, ["base", "day1"] for the next (old state/edges are
        the union of those stages; the labeling is the latest-wins
        COMPOSITION of the chain's clusters stages -- run() writes a
        full labeling, each batch writes only its DELTA of changed/new
        rows, so per-batch cluster storage scales with the batch, not
        the corpus).  Each base fp's band index is backfilled once if
        missing (ensure_band_index); this batch's own index is written
        at the end, making it a valid base for the next batch.
        """
        from functools import reduce

        from ..operators.components import incremental_components_delta
        from ..operators.lsh import incremental_candidate_pairs
        from .band_index import read_band_index

        if not base_fps:
            raise ValueError("base_fps must name at least one completed run")
        stats = RunStats()
        E = self.edge_units
        empty_state = conv_signatures(new_transcripts.limit(0), self.cfg)

        # stage 1: signatures for the NEW batch only (same bucketized
        # path as run(); keyed by this batch's input_fp)
        new_state = self._signatures_stage(new_transcripts, input_fp, stats)
        old_state = reduce(
            lambda a, b: a.unionByName(b),
            [self._stage_df("signatures", fp, fallback=empty_state) for fp in base_fps],
        )
        for fp in base_fps:
            self.ensure_band_index(fp)
        old_buckets = reduce(
            lambda a, b: a.unionByName(b),
            [read_band_index(self.spark, self.workdir, self.cfg, fp) for fp in base_fps],
        )
        state = old_state.unionByName(new_state)

        # stage 2: incremental edges, bucketized by band-bucket unit --
        # identical resume granularity to run()'s edge stage
        unit_of_bucket = F.pmod(F.col("bucket"), F.lit(E)).cast("int")
        empty_edges = verify_pairs(
            candidate_pairs(
                band_buckets(empty_state, self.cfg.lsh).withColumn("_unit", unit_of_bucket),
                self.cfg.lsh, unit_col="_unit",
            ),
            empty_state, self.cfg.lsh, carry_cols=("_unit",),
        ).drop("_unit")
        done_e = self.done_units("edges", input_fp)
        pending_e = [i for i in range(E) if i not in done_e]
        stats.skipped["edges"] = len(done_e)
        stats.computed["edges"] = len(pending_e)
        if pending_e:
            nb = band_buckets(new_state, self.cfg.lsh).withColumn("_unit", unit_of_bucket)
            ob = old_buckets.withColumn("_unit", unit_of_bucket)
            if len(pending_e) < E:
                nb = nb.where(F.col("_unit").isin(pending_e))
                ob = ob.where(F.col("_unit").isin(pending_e))
            resources: list[DataFrame] = []
            ranked_holder: list[DataFrame] = []
            cands = incremental_candidate_pairs(
                ob, nb, self.cfg.lsh,
                resources=resources, ranked_out=ranked_holder, unit_col="_unit",
            )
            # the member prune references the pair list twice
            cands = cands.persist()
            cands.count()
            resources.append(cands)
            # small member sets prune by pushed-down literal filter
            # (row-group skipping on the fat state read); larger ones
            # semi-join -- see pipeline.member_pushdown_state
            from .pipeline import member_pushdown_state

            state_v, pushed = member_pushdown_state(cands, state, 20_000)
            edges_w = verify_pairs(
                cands, state_v, self.cfg.lsh,
                carry_cols=("_unit",), prune_members=not pushed,
            ).withColumnRenamed("_unit", "_bucket")
            (
                edges_w.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_bucket")
                .parquet(self._stage_dir("edges", input_fp))
            )
            stats.bucket_stats = {
                k: int(v if v is not None else 0)
                for k, v in bucket_stats_from_ranked(ranked_holder[0], self.cfg.lsh)
                .collect()[0].asDict().items()
            }
            for df in resources:
                df.unpersist()
            counts = {
                r["_bucket"]: r["n"]
                for r in self._stage_counts("edges", input_fp, pending_e)
            }
            self._record_bulk("edges", {i: counts.get(i, 0) for i in pending_e}, input_fp)
            for i in pending_e:
                os.makedirs(self._unit_path("edges", i, input_fp), exist_ok=True)
        new_edges = self._stage_df("edges", input_fp, fallback=empty_edges).dropDuplicates(["a", "b"])

        # stage 3: DELTA clusters -- write only rows that change: old
        # convs whose cluster label was remapped (merged clusters) plus
        # every new conv.  Writing the full labeling per batch would be
        # O(corpus) bytes per daily ingest (terabytes of unchanged rows
        # at 10^12 convs); the delta scales with the batch.  Readers
        # compose base + deltas latest-wins (read_clusters).
        id_type = dict(empty_edges.dtypes)["a"]
        empty_labels = self.spark.createDataFrame(
            [], f"conv_id {id_type}, cluster_id {id_type}"
        )
        # the base labeling = composition of the whole chain so far
        old_clusters = self.read_clusters(base_fps, fallback=empty_labels)
        if 0 in self.done_units("clusters", input_fp):
            stats.skipped["clusters"] = 1
            stats.computed["clusters"] = 0
        else:
            delta = incremental_components_delta(
                old_clusters, new_edges, new_state.select("conv_id")
            )
            delta.write.mode("overwrite").parquet(self._unit_path("clusters", 0, input_fp))
            n_delta = self._stage_count_all("clusters", input_fp)
            self._record_bulk("clusters", {0: n_delta}, input_fp)
            stats.computed["clusters"] = 1
            # observability: the write scales with the batch, not the
            # corpus -- surfaced so tests/operators can assert it
            stats.computed["clusters_delta_rows"] = n_delta
        clusters = self.read_clusters(base_fps + [input_fp], fallback=empty_labels)

        # absorb: band this batch once so future increments probe it
        self.ensure_band_index(input_fp)

        old_edges = reduce(
            lambda a, b: a.unionByName(b),
            [
                self._stage_df("edges", fp, fallback=empty_edges).dropDuplicates(["a", "b"])
                for fp in base_fps
            ],
        )
        edges = old_edges.unionByName(new_edges)
        return {"conv_state": state, "edges": edges, "clusters": clusters}, stats

    def run(
        self,
        transcripts: DataFrame,
        input_fp: str = "static",
        full_bucket_stats: bool = False,
    ) -> tuple[dict[str, DataFrame], RunStats]:
        """Run (or resume) the full dedup pipeline with checkpointing.

        input_fp identifies the input snapshot (Iceberg snapshot id /
        parquet fingerprint via sources.io.TableIO.snapshot_fingerprint).

        full_bucket_stats: opt into the exact full-scan skew histogram
        (one extra pass over band generation); the default derives the
        same numbers from the pair pass's own persisted post-cap
        relation at zero extra scans (dropped_members then lower-bounds
        drops past the salted pre-cap).
        """
        stats = RunStats()
        E = self.edge_units
        # lazily-built schema donors for empty-stage fallbacks (no jobs)
        empty_state = conv_signatures(transcripts.limit(0), self.cfg)

        # stage 1: per-bucket signatures -- ONE partitioned write for all
        # pending buckets + ONE bulk manifest append (see module docstring)
        state = self._signatures_stage(transcripts, input_fp, stats)

        # stage 2: LSH edges, bucketized by band-bucket range -- band
        # buckets hash into `edge_units` resume units (a bucket lies
        # wholly in one unit, so per-bucket candidate generation is
        # complete per unit); ONE partitioned write covers all pending
        # units, so a kill mid-verify recomputes only what's missing.
        unit_of_bucket = F.pmod(F.col("bucket"), F.lit(E)).cast("int")
        bands_all = band_buckets(state, self.cfg.lsh).withColumn("_unit", unit_of_bucket)
        # schema donor: the same plan over the empty state (lazy)
        empty_edges = verify_pairs(
            candidate_pairs(
                band_buckets(empty_state, self.cfg.lsh).withColumn("_unit", unit_of_bucket),
                self.cfg.lsh, unit_col="_unit",
            ),
            empty_state, self.cfg.lsh, carry_cols=("_unit",),
        ).drop("_unit")
        done_e = self.done_units("edges", input_fp)
        pending_e = [i for i in range(E) if i not in done_e]
        stats.skipped["edges"] = len(done_e)
        stats.computed["edges"] = len(pending_e)
        if pending_e:
            bands = (
                bands_all.where(F.col("_unit").isin(pending_e))
                if len(pending_e) < E
                else bands_all
            )
            if full_bucket_stats:
                # opt-in full scan: one EXTRA pass over band generation
                # (parquet read + explode + two aggs) purely for
                # observability -- exact drop counts even past the
                # salted pre-cap
                stats.bucket_stats = {
                    k: int(v if v is not None else 0)
                    for k, v in bucket_stats(bands, self.cfg.lsh).collect()[0].asDict().items()
                }
            resources: list[DataFrame] = []
            ranked_holder: list[DataFrame] = []
            cands = candidate_pairs(
                bands, self.cfg.lsh, resources=resources, unit_col="_unit",
                ranked_out=ranked_holder,
            )
            edges_w = verify_pairs(
                cands, state, self.cfg.lsh, carry_cols=("_unit",)
            ).withColumnRenamed("_unit", "_bucket")
            (
                edges_w.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_bucket")
                .parquet(self._stage_dir("edges", input_fp))
            )
            if not full_bucket_stats:
                # default: derive the skew histogram from the persisted
                # post-cap `ranked` relation the pair pass already built
                # and the write just materialized -- no extra scan of
                # stage-2 input (dropped_members is a lower bound past
                # the salted pre-cap; see bucket_stats_from_ranked)
                stats.bucket_stats = {
                    k: int(v if v is not None else 0)
                    for k, v in bucket_stats_from_ranked(ranked_holder[0], self.cfg.lsh)
                    .collect()[0].asDict().items()
                }
            for df in resources:  # cache lifetime ends at the write
                df.unpersist()
            counts = {
                r["_bucket"]: r["n"] for r in self._stage_counts("edges", input_fp, pending_e)
            }
            self._record_bulk("edges", {i: counts.get(i, 0) for i in pending_e}, input_fp)
            for i in pending_e:
                os.makedirs(self._unit_path("edges", i, input_fp), exist_ok=True)
        # the same (a, b) pair found in buckets of two units appears once
        # per unit; its jaccard/hamming are identical, so key-dedup here
        edges = self._stage_df("edges", input_fp, fallback=empty_edges).dropDuplicates(["a", "b"])

        # stage 3a: connected-component labels (checkpointed separately
        # from the singleton attach, so a kill between them resumes from
        # the labeled-edges output instead of re-running the CC fixpoint)
        id_type = dict(empty_edges.dtypes)["a"]
        empty_labels = self.spark.createDataFrame(
            [], f"conv_id {id_type}, cluster_id {id_type}"
        )
        if 0 in self.done_units("labels", input_fp):
            stats.skipped["labels"] = 1
            stats.computed["labels"] = 0
        else:
            labels = connected_components(edges)
            labels.write.mode("overwrite").parquet(self._unit_path("labels", 0, input_fp))
            n = self._stage_count_all("labels", input_fp)
            self._record_bulk("labels", {0: n}, input_fp)
            stats.computed["labels"] = 1
        labels = self._stage_df("labels", input_fp, fallback=empty_labels)

        # stage 3b: clusters = labels + singletons
        empty_clusters = empty_labels
        if 0 in self.done_units("clusters", input_fp):
            stats.skipped["clusters"] = 1
            stats.computed["clusters"] = 0
        else:
            clusters = attach_singletons(labels, state)
            clusters.write.mode("overwrite").parquet(self._unit_path("clusters", 0, input_fp))
            n = self._stage_count_all("clusters", input_fp)
            self._record_bulk("clusters", {0: n}, input_fp)
            stats.computed["clusters"] = 1
        clusters = self._stage_df("clusters", input_fp, fallback=empty_clusters)

        return {"conv_state": state, "edges": edges, "clusters": clusters}, stats

    def _stage_counts(self, stage: str, input_fp: str, pending: list[int]):
        """Per-unit row counts of freshly written output (guarded: an
        all-empty write leaves no parquet files; same narrow-fallback
        rule as _stage_df -- anything but a verified-empty dir raises)."""
        path = self._stage_dir(stage, input_fp)
        if not self._has_parquet_files(path):
            return []
        written = self.spark.read.parquet(path)
        return (
            written.where(F.col("_bucket").isin(pending))
            .groupBy("_bucket").agg(F.count("*").alias("n")).collect()
        )

    def _stage_count_all(self, stage: str, input_fp: str) -> int:
        path = self._unit_path(stage, 0, input_fp)
        if not self._has_parquet_files(path):
            return 0
        return self.spark.read.parquet(path).count()

    def reset_stage(self, stage: str) -> None:
        """The /reset analog (ResetHandler.java:43-83): drop a stage's
        outputs + manifest entries; the next run recomputes it (sketch
        state is always recomputable from data -- never mutated)."""
        import shutil

        p = os.path.join(self.workdir, stage)
        if os.path.isdir(p):
            shutil.rmtree(p)
        if not os.path.isdir(self._manifest_path()):
            return  # nothing recorded yet (guarded: reset before any run)
        m = self.manifest().where(F.col("stage") != stage)
        tmp = self._manifest_path() + ".tmp"
        m.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self._manifest_path())
        os.rename(tmp, self._manifest_path())
