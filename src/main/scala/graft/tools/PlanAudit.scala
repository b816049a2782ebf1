package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Emits PLANS.md: `explain("formatted")` of the headline queries with the
  * plan features that matter at 100 TB called out. Regenerate with
  *   sbt "runMain graft.tools.PlanAudit"
  */
object PlanAudit {
  import org.apache.spark.sql.DataFrame
  private def reg(name: String): (SparkSession, String) => DataFrame =
    graft.Registry.queries(name)

  private val headline: Seq[(String, String, (SparkSession, String) => DataFrame)] = Seq(
    ("q01_pricing_summary", "filter pushdown to parquet + partial hash agg",
      reg("q01_pricing_summary")),
    ("q05_revenue_by_nation", "5-way join; nation/region broadcast, big sides shuffle once",
      reg("q05_revenue_by_nation")),
    ("q17_matrix_multiply", "SpGEMM: equi-join on inner dim + hash agg (AQE broadcasts small operand)",
      reg("q17_matrix_multiply")),
    ("q25_ipf_fit_rows", "IPF row fit fused: one agg + one join",
      reg("q25_ipf_fit_rows")),
    ("q26_ipf_converge (one sweep)", "converge inner loop: two fused fits, transposes are pure " +
      "projections; q26 itself checkpoint-truncates lineage every 2 sweeps so its own plan is a LogicalRDD",
      graft.relational.Queries.ipfOneSweepPlan),
    ("q42_jaccard_pairs", "block-pair equi-join (no BNLJ) + exact set jaccard",
      reg("q42_jaccard_pairs")),
    ("q43_minhash_neardup", "MinHash+LSH banded equi-join on persisted features, then exact-Jaccard verify",
      reg("q43_minhash_neardup")),
    ("q48_embedding_neardup", "block-pair equi-join + per-vector norms + codegen graft_dot",
      reg("q48_embedding_neardup")),
    ("q59_asof_join", "as-of via tagged union + one running-last window (single shuffle on user_id)",
      reg("q59_asof_join")),
    ("q63_rollup_revenue", "grouping-set expansion map-side, one shuffle",
      reg("q63_rollup_revenue")),
    ("q76_ipf_two_sweep", "hash-checked reference `step`: two fits, each one agg + one equi-join",
      reg("q76_ipf_two_sweep")),
    ("q77_interval_join", "batch twin of the q64 stream-stream interval join: one equi-join " +
      "shuffle on user_id, range predicates as join residuals",
      reg("q77_interval_join")),
    ("q80_quota_cap", "per-key quota via bounded keep-N typed Aggregator: ObjectHashAggregate " +
      "with constant <=N buffer, map-side partial combine — no per-key Window funnel",
      reg("q80_quota_cap")),
    ("q83_tfidf_topk", "TF-IDF: wordcount tf + vocabulary df join + broadcast 1-row corpus size " +
      "+ per-doc top-k window",
      reg("q83_tfidf_topk")),
    ("q85_contamination", "decontamination: probe filtered before explode, 8-byte hash join keys, " +
      "distinct join inputs -> plain count (no two-phase count_distinct)",
      reg("q85_contamination")),
    ("q102_funnel", "chained stage mins: three aggs + joins all keyed on user_id (one " +
      "partitioning reused; stage frames shrink monotonically)",
      reg("q102_funnel")),
    ("q109_event_paths", "per-user lead window (bounded partitions) -> <=|types|^3-key hash agg " +
      "-> TakeOrdered top-k, never a global sort",
      reg("q109_event_paths")),
    ("q112_value_outliers", "two-pass moments: DECIMAL-sum agg (5 rows) broadcast-joined back " +
      "for the outlier count — both shuffles on event_type",
      reg("q112_value_outliers")),
    ("q118_source_overlap", "source-overlap: distinct (source, shingle-hash) self-equi-join on " +
      "the shingle key — never a source cross product; sizes join the tiny pair frame",
      reg("q118_source_overlap")),
    ("q119_unigram_logprob", "tf pre-agg on (doc_id, term) BEFORE the term join — the " +
      "vocabulary side broadcasts (AQE) and a Zipf-hot term crosses any fallback shuffle " +
      "once per document, not once per occurrence",
      reg("q119_unigram_logprob")),
    ("q122_decode_stats", "PPM decode stats: payload built scan-side (byte arithmetic), " +
      "mapPartitions parse, integer reductions — no shuffle, payload never moves",
      reg("q122_decode_stats")),
    ("q124_minhash_md5_pairs", "full LSH pipeline: signature min-agg (map-side combined over " +
      "the seed-exploded stream), band-key agg, bucket equi-join, exact verify joined back on " +
      "the shingle frame — never an all-pairs product",
      reg("q124_minhash_md5_pairs")),
    ("q125_salted_join", "salted skew join: deterministic fact salt + dim replicated per salt, " +
      "join on (key, salt) splits each hot nation across S reducers; salt dies at the rollup",
      reg("q125_salted_join")),
    ("q126_inverted_cosine", "df-pruned inverted index: rare-postings self-join proposes pairs, " +
      ">=2-shared-rare AND-amplification gates the exact phase, dot joins candidates back on " +
      "the full tf frame (integer-exact)",
      reg("q126_inverted_cosine")),
    ("q129_range_bucket_join", "range join rewritten as equi-join on floor(value/width): " +
      "broadcast hash join instead of the BNLJ the BETWEEN form forces (the oracle runs that " +
      "form to certify equivalence)",
      reg("q129_range_bucket_join")),
    ("q144_token_budget", "two-phase prefix sum over a corpus-wide total order: score-bucketed " +
      "intra-windows (PARTITIONED by bucket — no single-partition frame anywhere) + broadcast " +
      "triangular self-join over the tiny per-bucket offsets",
      reg("q144_token_budget")),
    ("q194_jl_projection", "hash-certified JL projection as ONE narrow codegen'd expression " +
      "(SignedProjection): all k components map-side, zero exchanges in the whole plan — " +
      "no fit, no join, no agg",
      reg("q194_jl_projection")),
    ("q198_dup_spans_rolling", "substring dedup on codegen'd rolling window digests: WindowHashes " +
      "emits all stride-1 window keys in one O(len) pass (8-byte packed keys), then df>1 prune " +
      "semi-join + per-doc islands — 4.7x the md5 digest stage at sf0.1",
      reg("q198_dup_spans_rolling")),
    ("q153_length_drift_ks", "two-sample KS per ingest batch: per-batch cumulative windows over " +
      "the complete batch x length grid; the corpus cumulative is the grid-sum of per-batch " +
      "cumulatives, so no global window exists",
      reg("q153_length_drift_ks")),
    ("q222_scd2_intervals", "SCD2 build: lag (change detect) + lead (interval close) over ONE " +
      "user partitioning — a single exchange feeds both windows",
      reg("q222_scd2_intervals")),
    ("q223_pit_join", "point-in-time join: user equi-join + interval-containment residual — " +
      "intervals tile, so <=1 match per fact and no argmax window over the fact side",
      reg("q223_pit_join")),
    ("q225_ahash_neardup", "perceptual near-dup: one codec pass (materialized 64-bit hash " +
      "table), 4x16-bit band equi-joins (pigeonhole perfect recall), XOR+bit_count verify",
      reg("q225_ahash_neardup")),
    ("q226_attribution", "touch attribution: range-bounded per-user join, BOTH endpoints + " +
      "count from one argmin/argmax-struct hash agg; left join keeps no-touch facts",
      reg("q226_attribution")),
    ("q228_table_checksum", "anti-entropy checksum: per-row md5 hash reduced by XOR and exact " +
      "decimal SUM — both commutative, map-side combinable; one scan per fingerprint",
      reg("q228_table_checksum")),
    ("q231_matryoshka", "matryoshka fidelity: full + every prefix dot/norm as conditional sums " +
      "in ONE hash agg over the exploded grid; per-pair moment frame materialized once",
      reg("q231_matryoshka")),
    ("q245_rule_range_join", "RangeJoinBucketRule in action: the naive |delta|<=T theta join " +
      "(BNLJ) rewritten by the injected optimizer rule into a div-T bucketed equi-join + " +
      "Generate x3 expansion + residual — certified lossless by the unrewritten oracle",
      reg("q245_rule_range_join")),
    ("q266_rule_range_between", "the generalized rule on the TIMESTAMP BETWEEN spelling: " +
      "TimestampAddInterval bounds normalized to signed-difference facts, bucketed on " +
      "unix_micros — same Generate x3 + residual shape, no BNLJ",
      reg("q266_rule_range_between")),
    ("q261_record_linkage", "multi-pass blocking: lev<=1 deletion-neighborhood key join UNION " +
      "(nation, segment, balance) join, distinct, then score — candidates track match density, " +
      "never block^2 (round-13's nation-only pass measured alpha~1.5; now 0.4)",
      reg("q261_record_linkage")),
    ("q275_windowed_funnel", "time-bounded funnel: K sequential per-user argmin agg+join " +
      "rounds, three 1-row stage counts crossed for conversions — no event-sequence sort",
      reg("q275_windowed_funnel")),
    ("q284_glpr_source (filtered, pruned)", "custom DSv2 connector scan: doc_id bounds pushed " +
      "into the record stream (PushedFilters in the scan description), pruned fields " +
      "byte-skipped (ReadSchema), one InputPartition per shard",
      (s: SparkSession, d: String) => graft.io.GlprSource.documentsVia(s, d)
        .filter(org.apache.spark.sql.functions.col("doc_id") >= 100L)
        .select("doc_id", "lang")),
    ("q287_topk_operator", "custom physical operator: one hash exchange (required clustered " +
      "distribution) -> TopKPerGroupExec bounded heaps — no Sort, no Window, no spill path",
      (s: SparkSession, d: String) => graft.plans.TopKPerGroup.topOrdersPerCustomer(s, d)),
    ("q286_rake3_sweep", "3-way IPF raking sweep: per fit one dim hash agg + two equi-joins " +
      "(marginals AQE-broadcast) — three shuffle rounds, never a dense cube",
      reg("q286_rake3_sweep")),
    ("q290_prefix_filter_join", "ppjoin prefix filter: df-ranked prefix equi-join generates " +
      "candidates (285x under all-pairs at sf0.01), exact-overlap verify above — lossless by " +
      "the prefix pigeonhole",
      reg("q290_prefix_filter_join")),
    ("q291_topk_tokens", "TopKPerGroupExec on the text path: one clustered exchange, bounded " +
      "heaps — no Sort, no Window over the exploded vocabulary",
      reg("q291_topk_tokens")),
    ("q293_kmv_sketch", "KMV TypedImperativeAggregate: ObjectHashAggregate partial+final, " +
      "O(k) buffers, k*groups values over the shuffle",
      reg("q293_kmv_sketch")),
    ("q295_glpr_runtime_prune", "DSv2 runtime filtering: dynamicpruningexpression subquery on " +
      "doc_id reuses the broadcast exchange; materialized key set prunes shards by sidecar " +
      "bounds at execution",
      reg("q295_glpr_runtime_prune")),
    ("q296_glpr_agg_pushdown", "COMPLETE aggregate pushdown: PushedAggregates scan, zero data " +
      "shards, no aggregate exec in the plan",
      reg("q296_glpr_agg_pushdown")),
    ("q297_glpr_limit_pushdown", "partial limit pushdown: reader row cap + sidecar shard cap " +
      "(LIMIT over a million-shard corpus opens one file)",
      reg("q297_glpr_limit_pushdown")),
    ("q303_glpr_shard_provenance", "_shard metadata column rollup: provenance served from " +
      "partition file names, grouped without touching payload bytes beyond doc_id",
      reg("q303_glpr_shard_provenance")),
    ("q304_glpr_partitioned (plan view)", "partitioned catalog table: WHERE lang='en' prunes " +
      "non-en shards via sidecar value sets (hive-style partition pruning, flat layout); " +
      "residual row filter stays above the scan",
      graft.io.GlprSource.partitionedSelectPlanFrame),
    ("q306_glpr_partitioned_count (plan view)", "grouped COMPLETE aggregate pushdown: count per " +
      "partition value from sidecar (rows, value-set) pairs — zero shards, no HashAggregate",
      graft.io.GlprSource.partitionedCountPlanFrame),
    ("q307_glpr_bloom_prune", "bloom runtime pruning on hash-distributed (unclustered) staging: " +
      "same DPP subquery as q295, shard skip attributable to sidecar doc_id blooms alone " +
      "(bounds span everything)",
      reg("q307_glpr_bloom_prune")),
    ("q309_glpr_compact", "post-compaction scan: a handful of merged shards (byte-concat, " +
      "sidecars folded) replace the small-file swarm; one InputPartition per merged shard",
      reg("q309_glpr_compact")),
    ("q310_glpr_manifest", "manifest-listed scan: shards come from the _manifest commit log " +
      "(job-commit visibility), a crashed job's task-committed orphan never planned",
      reg("q310_glpr_manifest")),
    ("q311_glpr_time_travel", "version-pinned scan: shards come from the _manifest.v2 " +
      "snapshot (VERSION AS OF) — the third append's shards exist on disk and in the " +
      "live manifest but are never planned",
      reg("q311_glpr_time_travel")),
    ("q312_glpr_changes", "incremental read (append-only CDF): changesFromVersion=1 + " +
      "versionAsOf=2 plans ONLY the second append's shards — the version diff, never " +
      "a corpus rescan; non-append histories refuse loudly",
      reg("q312_glpr_changes")),
    ("q313_glpr_restore", "post-RESTORE live scan: the manifest was rolled back to " +
      "version 2's content (minting version 4), so the third append's on-disk shards " +
      "are never planned; history across the restore stays readable",
      reg("q313_glpr_restore")),
    ("q314_glpr_row_delete", "post-rewrite scan after a copy-on-write row DELETE on a " +
      "hash layout: straddling shards were rewritten under fresh names behind one " +
      "manifest commit, fully-covered shards unlinked metadata-only",
      reg("q314_glpr_row_delete")),
    ("q322_glpr_dv_delete", "merge-on-read DELETE: the scan reads THROUGH per-shard " +
      "delete-vector sidecars (masked ids fail the reader's id gate); aggregate " +
      "pushdown and limit capping decline under masks instead of lying",
      reg("q322_glpr_dv_delete")),
    ("q323_glpr_dv_materialize", "post-materialization scan: masked shards were " +
      "rewritten under fresh names behind one manifest flip, vectors unlinked — " +
      "metadata pushdowns and time travel re-armed",
      reg("q323_glpr_dv_materialize")),
    ("q325_glpr_dynamic_overwrite", "post-dynamic-overwrite scan: INSERT OVERWRITE " +
      "under partitionOverwriteMode=dynamic swapped ONLY the incoming partitions' " +
      "shards behind one manifest flip; other partitions' shards untouched",
      reg("q325_glpr_dynamic_overwrite")),
    ("q324_glpr_redact", "post-redaction scan after a copy-on-write row UPDATE: " +
      "hit-bearing shards were rewritten with blocklist patterns replaced (PII " +
      "removed from storage); untouched shards kept their files — the rewrite cost " +
      "is the matching working set", reg("q324_glpr_redact")),
    ("q321_kmv_set_algebra", "mergeable-sketch corpus overlap: two scans reduce to 1-row " +
      "bottom-k sketch frames, broadcast-crossed; union sketch + inclusion-exclusion " +
      "derive intersection/Jaccard from O(k) values — no join ever materializes",
      reg("q321_kmv_set_algebra")),
    ("q320_blocklist_scan", "multi-pattern blocklist screen: ONE codegen'd Aho-Corasick " +
      "pass per document (graft_multi_pattern_counts inside WholeStageCodegen), " +
      "posexplode against the pinned pattern list, hash agg — no per-pattern rescan, " +
      "no regex, no cross product", reg("q320_blocklist_scan")),
    ("q315_glpr_sql_functions", "FunctionCatalog resolution: the MAGIC_METHOD scalar " +
      "nfc_bytes plans as a codegen'd Invoke and the V2 aggregate bytes_sum as a " +
      "V2Aggregator hash aggregate with map-side partials — no UDF, no session " +
      "registration", reg("q315_glpr_sql_functions")),
    ("q316_glpr_history", "ProcedureCatalog introspection: CALL sys.history renders " +
      "the manifest version log as a LocalScan result set — DESCRIBE HISTORY with " +
      "zero data bytes read", reg("q316_glpr_history")),
    ("q319_glpr_spj", "storage-partitioned join: both lang-partitioned GLPR scans " +
      "report KeyGroupedPartitioning(identity(lang)) with HasPartitionKey shard " +
      "partitions — the corpus-dimension join AND the following per-lang rollup " +
      "plan with ZERO Exchange operators and ZERO Sorts (the ordering report: " +
      "single-valued partitions are trivially sorted by the key) — a pure zipper merge",
      graft.io.GlprSource.spjPlanFrame),
    ("q317_glpr_sql_maintenance", "ProcedureCatalog maintenance: the live scan after " +
      "CALL restore(2) -> compact -> vacuum plans only the merged survivor shards " +
      "of the rolled-back view", reg("q317_glpr_sql_maintenance")),
    ("q289_glpr_stats_join", "statistics-driven planning: the GLPR scan reports sidecar " +
      "sizeInBytes/numRows (SupportsReportStatistics), so the ~500-row dimension plans " +
      "BroadcastHashJoin against the lineitem facts with NO hint",
      reg("q289_glpr_stats_join")),
    ("q328_glpr_cdf", "full CDF scan: changeMode=cdf plans BOTH diff sides — added " +
      "shards as _change_type=insert partitions, retired shards (kept on disk by " +
      "retention) as delete partitions, dv-gen deltas via a two-mask reader gate; " +
      "the diff is a manifest computation, never a corpus rescan",
      reg("q328_glpr_cdf")),
    ("q329_glpr_tt_across_delete", "time travel ACROSS a DELETE: the pinned scan " +
      "plans the pre-delete version's shards — retired by the delete, still owned " +
      "by their version files until expire+vacuum",
      reg("q329_glpr_tt_across_delete")),
    ("q331_glpr_dv_time_travel", "versioned delete vectors: each pinned scan ships " +
      "the EXACT .dv.<gen> mask its manifest version recorded into the input " +
      "partitions — pre-delete pin unmasked, post-delete pin masked, one staging",
      reg("q331_glpr_dv_time_travel")),
    ("q333_glpr_days_partition", "date partitioning: the two-day window read prunes " +
      "non-window shards at plan time via sidecar day sets (days(ts) transform " +
      "values — hive-style date pruning over the sidecar channel)",
      graft.io.GlprSource.daysPartitionPlanFrame),
    ("q336_glpr_recluster", "post-OPTIMIZE scan: the recluster shuffle job rewrote the " +
      "hash-ingested corpus range-clustered behind one manifest flip, so the doc_id " +
      "range read prunes to the window's shards via tight sidecar bounds",
      reg("q336_glpr_recluster")),
    ("q340_glpr_cbo_stats_join", "pushdown-aware statistics drive the broadcast: the " +
      "scan's estimate scales each shard by its bounds overlap with the pushed " +
      "doc_id range, so the selectively-filtered corpus side (~50 rows) plans " +
      "BroadcastHashJoin against the events facts at EVERY SF — a decision a " +
      "corpus-total estimate could never make",
      graft.io.GlprSource.cboStatsJoinPlanFrame),
    ("q341_glpr_months_partition", "month partitioning: the one-month window read " +
      "prunes non-month shards at plan time via sidecar month sets (months(ts) " +
      "prefix-transform values; the write self-clustered via the required " +
      "transform distribution — no manual DISTRIBUTE BY)",
      graft.io.GlprSource.monthsPartitionPlanFrame),
    ("q342_glpr_truncate_partition", "truncate partitioning: raw-column IN probes " +
      "relax to their prefix image ('src1' covers src1/src10..19 — sound " +
      "over-keep) and prune non-matching shards; the residual row filter keeps " +
      "the result exact", graft.io.GlprSource.truncatePartitionPlanFrame),
    ("q344_glpr_value_mor_delete", "post-predicate-MoR-delete scan: every shard " +
      "reads THROUGH the delete-vector generation minted from the matching job's " +
      "ids — zero data moved at delete time, the mask applied at the readers' id " +
      "gate", reg("q344_glpr_value_mor_delete")),
    ("q348_glpr_masked_compact", "rollup after a mask-FOLDING compaction: masked " +
      "members were rewritten (masks applied) into the byte concat and retired " +
      "WITH their dv tokens in one flip — the scan plans mask-free merged shards, " +
      "no residual dv resolution anywhere", reg("q348_glpr_masked_compact")),
    ("q349_glpr_spec_evolution", "partition-spec evolution: ONE straddling window " +
      "prunes BOTH transform eras at plan time — days-era shards compare 10-char " +
      "prefixes, months-era shards 7-char, each under the spec its own sidecar " +
      "recorded", reg("q349_glpr_spec_evolution")),
    ("q350_glpr_zorder_recluster", "full rollup after the z-order recluster: the " +
      "Morton rewrite left every shard a compact (doc_id, lang) rectangle, so " +
      "id-range AND lang probes both prune (the rollup itself scans all shards " +
      "once — the layout win shows in the probe pins)",
      reg("q350_glpr_zorder_recluster")),
    ("q351_glpr_clone", "both sides of a zero-copy clone after divergence: two " +
      "independent manifests over hard-linked immutable bytes — each scan plans " +
      "only its own live lines and masks; no cross-table residue anywhere",
      reg("q351_glpr_clone")),
    ("q352_glpr_value_stats", "automatic per-shard value statistics: the " +
      "two-source probe prunes 3/4 of an UNPARTITIONED per-feed ingest at plan " +
      "time via the writers' vlang/vsource sidecar sets (per-file categorical " +
      "column stats); the residual filter keeps rows exact",
      reg("q352_glpr_value_stats")),
    ("q353_glpr_bucket_spj", "bucket-transform storage-partitioned join: both " +
      "scans report KeyGroupedPartitioning(bucket(8, doc_id)) resolved through " +
      "the catalog's V2 bucket function, so the doc_id equi-join plans ZERO " +
      "join exchanges (required in-pipeline); only the final lang rollup " +
      "shuffles", graft.io.GlprMaintenance.bucketSpjPlanFrame),
    ("q354_glpr_tags", "tagged + live rollups after a COW DELETE and a full " +
      "expire+vacuum cycle: the tag pins its version file, so the snapshot " +
      "scan plans the PRE-delete lines while the live scan plans the " +
      "post-delete ones — two exact plans over one directory",
      reg("q354_glpr_tags")),
    ("q355_glpr_constraints", "corpus rollup under a CHECK constraint: the " +
      "gate is writer-side (compiled once per job, evaluated per row), so " +
      "the READ plan is the plain pruned scan — constraints cost nothing " +
      "at query time; the refused-append contract is pinned in-pipeline",
      reg("q355_glpr_constraints")),
    ("q356_glpr_files", "metadata-derived corpus invariants from sys.files: " +
      "row count and id bounds computed from SIDECARS ONLY (zero data bytes " +
      "opened) — the oracle recomputes them from the data, certifying the " +
      "statistics the planner prunes and estimates with",
      reg("q356_glpr_files")),
    ("q357_seq_packing", "greedy sequence packing: one shuffle clusters each " +
      "lang, a local sort fixes the greedy order, one O(n) pass per group " +
      "assigns bins with O(1) state — groups pack sequentially (inherent), " +
      "distinct groups in parallel", reg("q357_seq_packing")),
    ("q358_glpr_dedup_audit", "zero-shuffle dedup audit: GROUP BY doc_id over " +
      "a bucket-clustered table — the key-grouped report satisfies the " +
      "aggregate's clustered distribution, so partial AND final aggregates " +
      "run in place; no Exchange anywhere (required in-pipeline)",
      graft.io.GlprMaintenance.dedupAuditPlanFrame),
    ("q360_glpr_metadata_tables", "history metadata TABLE from plain SQL: the " +
      "scan is a driver-side LocalScan over sidecar-derived version stats — " +
      "zero data bytes, zero tasks; filters/joins/aggregates compose on top " +
      "like any table", reg("q360_glpr_metadata_tables")),
    ("q361_glpr_mor_update", "merge-on-read UPDATE read-back: the scan unions " +
      "untouched shards, dv-masked shards (victims gated per id) and the " +
      "appended replacement shards — one connector scan, the mask applied " +
      "at the id gate; the update itself moved only the matched rows",
      reg("q361_glpr_mor_update")),
    ("q362_glpr_type_widening", "type-widening read: narrow-era shards parse " +
      "their decimal text straight to the declared BIGINT/DOUBLE inside the " +
      "same connector scan as the wide era — no cast node, no shard rewrite; " +
      "one hash aggregate over the union", reg("q362_glpr_type_widening")),
    ("q363_glpr_add_default", "initial-DEFAULT read: pre-evolution shards " +
      "surface the marker-stored literal as a constant column inside the " +
      "scan (zero per-row parse — the default is pre-boxed per partition); " +
      "three eras, one aggregate, no per-era plan branches",
      reg("q363_glpr_add_default")),
    ("q364_glpr_age_retention", "live + tagged reads after age-based " +
      "expire+vacuum: two connector scans (head manifest, tagged version " +
      "file) unioned — retention changed WHICH versions resolve, never the " +
      "plan shape", reg("q364_glpr_age_retention")),
    ("q365_glpr_mor_merge", "merge-on-read MERGE read-back: matched keys " +
      "masked in place, the whole changeset appended — the scan is the " +
      "same mask-gated union as q361; upsert cost tracked the changeset, " +
      "not the touched shards", reg("q365_glpr_mor_merge")),
    ("q366_glpr_branch_mor_update", "published WAP fix read-back: the " +
      "branch-scoped MoR update's masks were translated to shared dv " +
      "generations at publish and its replacement shards adopted — the " +
      "main scan is the ordinary mask-gated union, with no trace of the " +
      "branch machinery in the plan", reg("q366_glpr_branch_mor_update")))

  private val streamingStateNote: String =
    """
      |## Streaming state bounds (q52/q54/q58/q64/q89/q113)
      |
      |Streaming operators have no `explain formatted` worth printing here (the
      |settled plans are micro-batch internals), so their 100 TB story is pinned
      |by state-bound assertions instead — StreamingSkewSpec drives a 90%-hot-key
      |stream through each state machine and asserts `numRowsTotal` from the
      |query progress:
      |
      |- TTL'd keyed stats (q58's production path): 1,801 hot events + 111 keys
      |  settle to ONE state row once the watermark passes every other key's TTL
      |  horizon — state scales with alive keys, never with a key's event count.
      |- `dropDuplicatesWithinWatermark` (q89): 2,000 rows with a 1,800-row hot
      |  key hold exactly 201 state rows (one per distinct key), and drain to 1
      |  when the watermark retires them.
      |- Stream-stream interval join (q64): state holds exactly the in-horizon
      |  rows of both sides and drains on watermark advance; the watermark is
      |  derived from the join window (windowMs + 5 min disorder slack) so
      |  retained state is what the join can still match, not a fixed guess.
      |  The q64 bench-cost trend (r6-r8) was traced with StreamProbe to shared-
      |  JVM residue from heavy cached queries that sort before it, not to this
      |  plan — see Events.settle's scaladoc for the measured sandwich numbers.
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val sb = new StringBuilder
    sb.append("# PLANS — headline physical plans (`explain formatted`, ")
      .append(sf).append(")\n\n")
    sb.append("Generated by `graft.tools.PlanAudit`; plan-shape regressions are gated by\n")
    sb.append("`PlanLintSpec` (no unintended BNLJ/cartesian, pushdown + pruning checks).\n")
    sb.append("Numbering note: q277/q279 were deduplicated away in round 14 (q277≡q179,\n")
    sb.append("q279≡q63) — older commit messages may reference sections that no longer exist.\n")
    headline.foreach { case (name, note, build) =>
      val df = build(spark, sf)
      sb.append(s"\n## $name\n\n_${note}_\n\n```\n")
      sb.append(df.queryExecution.explainString(FormattedMode).take(6000))
      sb.append("\n```\n")
    }
    sb.append(streamingStateNote)
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("WROTE PLANS.md")
    spark.stop()
  }
}
