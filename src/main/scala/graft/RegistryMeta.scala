package graft

/** Structured metadata over the driver registry — the §2 inventory of
  * SURVEY.md as a programmatic surface (round 12, VERDICT ask #8).
  *
  * `SparkEntry.queries` is deliberately a flat name → builder map (the
  * driver contract); this object is the index a consumer reads to
  * enumerate it by family: each key carries its SURVEY §2 section tag,
  * its oracle mode (`"sql"` = oracled registry entry with a DuckDB
  * twin in `SparkEntry.oracleSql`; `"spec"` = API/streaming surface
  * covered by ScalaTest only), a one-line contract, and — where the
  * operator is an EXACT face with a declared scale tier behind the
  * [[graft.ops.Routing]] dial — the registry key of that scale-tier
  * partner. RegistryMetaSpec pins the three invariants that make this
  * map trustworthy: every `queries` key is described here with oracle
  * mode "sql", every "sql" row IS a `queries`+`oracleSql` key, and
  * every declared partner resolves to a registered entry.
  */
object RegistryMeta {

  /** One registry entry's card: SURVEY §2 section ("2.1".."2.10"),
    * oracle mode ("sql" | "spec"), one-line contract, and the
    * registry key of the declared scale-tier partner (exact faces
    * only — the pairs the Routing dial arbitrates). */
  final case class EntryMeta(section: String, oracle: String,
                             desc: String,
                             scalePartner: Option[String] = None)

  /** SURVEY §2 section tags → titles. */
  val sections: Map[String, String] = Map(
    "2.1"  -> "ETL operators (reference layer 1)",
    "2.2"  -> "SQL analytics (reference layer 2)",
    "2.3"  -> "Time series / feature engineering (reference layer 3+4)",
    "2.4"  -> "Deduplication (LLM-pipeline mandate)",
    "2.5"  -> "Similarity search (LLM-pipeline mandate)",
    "2.6"  -> "Text analysis (LLM-pipeline mandate)",
    "2.7"  -> "Multimodal (LLM-pipeline mandate)",
    "2.8"  -> "Streaming (events)",
    "2.9"  -> "Sources & sinks (reference I/O surface)",
    "2.10" -> "MLlib pipelines",
  )

  val entries: Map[String, EntryMeta] = Map(
    // §2.1 ETL operators (reference layer 1)
    "etl_reference_e2e" ->
      EntryMeta("2.1", "sql",
        "the reference's WHOLE pipeline as ONE composed oracled run (2019reinvent_green.py:19-53 + discovery cell 31)"),
    "etl_apply_mapping" ->
      EntryMeta("2.1", "sql",
        "rename+cast (string↔long, ts parse) over events"),
    "etl_resolve_choice" ->
      EntryMeta("2.1", "sql",
        "cast-with-null-fallback (bad values → null, not crash)"),
    "etl_resolve_struct" ->
      EntryMeta("2.1", "sql",
        "ResolveChoice make_struct"),
    "etl_drop_null_fields" ->
      EntryMeta("2.1", "sql",
        "drop all-null columns (distributed null-count scan)"),
    "etl_canonicalize" ->
      EntryMeta("2.1", "sql",
        "multi-source union + `lit` type tag + schema align"),
    "etl_dedup_rows" ->
      EntryMeta("2.1", "sql",
        "exact duplicate-row removal over lineitem"),
    "etl_expectations" ->
      EntryMeta("2.1", "sql",
        "publish-gate data-quality validation: named boolean rules → (rule, n_violations, rate) in ONE map-side-combinable aggregate pass"),
    "etl_scd2" ->
      EntryMeta("2.1", "sql",
        "SCD2 dimension reconstruction from a change log"),
    "etl_apply_changes" ->
      EntryMeta("2.1", "sql",
        "MERGE/upsert without a table format"),
    "etl_assign_ids" ->
      EntryMeta("2.1", "sql",
        "deterministic dense surrogate keys 0..n−1 in key order"),
    "etl_sample_hash" ->
      EntryMeta("2.1", "sql",
        "deterministic consistent sampling"),
    "etl_hash_split" ->
      EntryMeta("2.1", "sql",
        "leakage-safe train/val/test assignment by key hash (~80/10/10 on 256 buckets)"),
    "etl_impute" ->
      EntryMeta("2.1", "sql",
        "group-mean imputation with an audit flag (silent imputation is how data bugs hide): fill = reproducible 4dp constant per group"),
    "etl_sample_weighted" ->
      EntryMeta("2.1", "sql",
        "deterministic weighted sampling without replacement (Efraimidis-Spirakis exponential keys, samp_key = u^(1/w)) with u derived from md5"),
    "etl_sample_stratified" ->
      EntryMeta("2.1", "sql",
        "stratified deterministic sampling"),
    "etl_diff_snapshots" ->
      EntryMeta("2.1", "sql",
        "snapshot reconciliation — the table diff behind pipeline regression tests and backfill audits"),
    "etl_json_flatten" ->
      EntryMeta("2.1", "sql",
        "nested-JSON flattening"),
    "etl_generalize_k" ->
      EntryMeta("2.1", "sql",
        "k-anonymity GENERALIZATION"),
    "etl_pseudonymize" ->
      EntryMeta("2.1", "sql",
        "GDPR pseudonymization (erasure's keep-the-data sibling): identifying keys → deterministic sha2-256 tokens of pepper:key, row-local (rides the scan)"),
    "etl_mask_format" ->
      EntryMeta("2.1", "sql",
        "FORMAT-PRESERVING masking"),
    "etl_mix_domains" ->
      EntryMeta("2.1", "sql",
        "deterministic dataset MIXING toward a target composition (N parts web, M parts wiki, …)"),
    "etl_incremental_agg" ->
      EntryMeta("2.1", "sql",
        "INCREMENTAL aggregate maintenance"),
    "etl_daily_e2e" ->
      EntryMeta("2.1", "sql",
        "the 2am chain END-TO-END: bookmarked AvailableNow file-stream ingest (ticked twice — the second must drain nothing) -> incremental aggregate merge over the INGESTED read-back -> the persisted incremental dedup fold; one tableChecksum row per stage, each recomputed by the oracle from the RAW tables — hash equality proves the chain lossless across the bookmark and state boundaries"),
    "etl_table_checksum" ->
      EntryMeta("2.1", "sql",
        "order-independent table signature (the \"did anything change\" audit before a 100 TB diff)"),
    // §2.2 SQL analytics (reference layer 2)
    "q1_pricing_summary" ->
      EntryMeta("2.2", "sql",
        "TPC-H-Q1-style multi-agg groupBy on lineitem"),
    "q3_top_unshipped" ->
      EntryMeta("2.2", "sql",
        "3-way join + agg + top-k (c/o/l)"),
    "q5_region_revenue" ->
      EntryMeta("2.2", "sql",
        "6-way star join (r/n/c/o/l/s) + agg"),
    "q10_returned_items" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q10 returned-item reporting"),
    "q6_revenue_change" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q6 forecasting-revenue-change"),
    "q4_priority_late" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q4-flavored late-shipment priority report (this schema carries no commit/receipt dates, so late = any lineitem shipped >90 days after order date)"),
    "q7_nation_volume" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q7 volume shipping"),
    "q8_market_share" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q8 national market share: of one region's PROMO-part sales, the ppm fraction from one supplier nation per order year"),
    "q14_promo_revenue" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q14 promotion effect: PROMO revenue share (ppm) per ship year"),
    "q15_top_supplier" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q15 top supplier: max quarterly per-supplier revenue via a 1-row scalar aggregate broadcast back onto the per-supplier frame"),
    "q17_small_qty_revenue" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q17 small-quantity-order revenue"),
    "q18_large_orders" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q18 large-volume customers"),
    "q13_order_counts" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q13 customer order-count distribution: LEFT OUTER customer⋈orders keeps zero-order customers"),
    "q19_discount_bands" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q19-flavored discounted revenue (no p_container in this schema, so the bands gate on brand × p_size × l_quantity)"),
    "q22_global_sales" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q22-flavored global sales opportunity"),
    "q2_min_cost_supplier" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q2 minimum-cost supplier"),
    "q9_product_profit" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q9 product-type profit by (supplier nation, order year): per-line profit = revenue − cost·qty ALL in exact micro-BIGINT"),
    "q11_value_concentration" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q11 value concentration"),
    "q16_supplier_counts" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q16 supplier counts per (brand, type, size) with brand/type/size exclusions; the blacklist"),
    "q20_qty_threshold" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q20 excess-stock suppliers"),
    "q12_shipmode_priority" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q12 shipping modes vs priority over derived " +
          "commit/receipt offsets + ship modes"),
    "q21_suppliers_waiting" ->
      EntryMeta("2.2", "sql",
        "TPC-H Q21 solo-late suppliers as ONE per-order aggregate " +
          "(no lineitem self-joins)"),
    "q_count_by_type" ->
      EntryMeta("2.2", "sql",
        "group counts (events.event_type)"),
    "q_union_counts" ->
      EntryMeta("2.2", "sql",
        "UNION ALL per-source counts"),
    "q_per_day_type" ->
      EntryMeta("2.2", "sql",
        "date_trunc day × type counts"),
    "q_pivot_per_day" ->
      EntryMeta("2.2", "sql",
        "day × event_type pivot matrix"),
    "q_anomaly_filter" ->
      EntryMeta("2.2", "sql",
        "out-of-range timestamp detection"),
    "q_json_extract" ->
      EntryMeta("2.2", "sql",
        "JSON field extraction from events.props"),
    "q_semi_join" ->
      EntryMeta("2.2", "sql",
        "EXISTS (left_semi)"),
    "q_anti_join" ->
      EntryMeta("2.2", "sql",
        "NOT EXISTS (left_anti)"),
    "q_window_running" ->
      EntryMeta("2.2", "sql",
        "per-user running sum + row_number (window)"),
    "q_topk_per_group" ->
      EntryMeta("2.2", "sql",
        "top-k per group via ranked window"),
    "q_funnel" ->
      EntryMeta("2.2", "sql",
        "ordered-stage funnel conversion (view→click→purchase)"),
    "q_funnel_latency" ->
      EntryMeta("2.2", "sql",
        "conversion latency — the question the funnel counts don't answer"),
    "q_cohort_retention" ->
      EntryMeta("2.2", "sql",
        "day-N cohort retention matrix: cohort = first-ever event day (one min-per-user aggregate), cells = distinct cohort members active at each day offset"),
    "q_dau_wau" ->
      EntryMeta("2.2", "sql",
        "engagement stickiness: per day, distinct users that day (DAU) + in the trailing 7 days (WAU). The window is a 7× SUPPORT EXPLODE",
      Some("q_dau_wau_approx")),
    "q_dau_wau_approx" ->
      EntryMeta("2.2", "sql",
        "the declared 100 TB face as a CHECKED entry"),
    "q_rollup" ->
      EntryMeta("2.2", "sql",
        "hierarchical agg (ROLLUP)"),
    "q_set_ops" ->
      EntryMeta("2.2", "sql",
        "INTERSECT / EXCEPT at (user, day) grain"),
    "q_grouping_sets" ->
      EntryMeta("2.2", "sql",
        "arbitrary GROUPING SETS {(flag,status),(status),()}"),
    "q_cube" ->
      EntryMeta("2.2", "sql",
        "CUBE(flag, status) — all four grouping sets in one shuffle, completing the rollup/grouping-sets/cube family"),
    "q_rank_functions" ->
      EntryMeta("2.2", "sql",
        "the rank family in one window pass"),
    "q_window_time_range" ->
      EntryMeta("2.2", "sql",
        "time-RANGE window frame (trailing 30 min per user) over exact epoch-second bounds"),
    "etl_melt" ->
      EntryMeta("2.2", "sql",
        "unpivot/melt wide→long (inverse of pivot): Spark-native unpivot = zero-shuffle map-side expansion, not a UNION of per-column re-scans"),
    "etl_fk_check" ->
      EntryMeta("2.2", "sql",
        "referential-integrity gate"),
    "stream_sliding_counts" ->
      EntryMeta("2.2", "sql",
        "sliding-window aggregate"),
    "ChangeStreams.applyChangesStream" ->
      EntryMeta("2.2", "spec",
        "streaming CDC apply (\"MERGE INTO that never stops\")"),
    "q_distinct_count" ->
      EntryMeta("2.2", "sql",
        "exact distinct counts",
      Some("q_distinct_approx")),
    "q_distinct_approx" ->
      EntryMeta("2.2", "sql",
        "HLL++ approx distinct (the 100 TB variant: fixed-size mergeable sketch); the entry runs the CHECKED face"),
    "q_distinct_union" ->
      EntryMeta("2.2", "sql",
        "cross-segment audience overlap on MERGEABLE DataSketches HLL (hll_sketch_agg/hll_union, lgK=14)"),
    "q_percentiles" ->
      EntryMeta("2.2", "sql",
        "per-type exact interpolated percentiles (p50/p95/p99)",
      Some("q_percentiles_approx")),
    "q_percentiles_approx" ->
      EntryMeta("2.2", "sql",
        "GK-sketch approx percentiles (bounded-memory, mergeable); the entry runs the CHECKED face"),
    "q_histogram" ->
      EntryMeta("2.2", "sql",
        "fixed-width value histogram per type (broadcast bounds, IEEE-exact arithmetic binning)"),
    "etl_profile" ->
      EntryMeta("2.2", "sql",
        "single-pass per-column profile",
      Some("etl_profile_approx")),
    "etl_suggest_rules" ->
      EntryMeta("2.2", "sql",
        "constraint SUGGESTION from the profile (the Deequ ConstraintSuggestion posture)"),
    "etl_profile_approx" ->
      EntryMeta("2.2", "sql",
        "the 100 TB profiling face: same single-pass profile with HLL++ distinct sketches (fixed-size, mergeable, map-side-combinable); the entry runs the CHECKED face"),
    "q_salted_join" ->
      EntryMeta("2.2", "sql",
        "skew-mitigated equi-join (deterministic salt × replicated small side) + segment aggregate"),
    "q_scalar_subquery" ->
      EntryMeta("2.2", "sql",
        "correlated scalar subqueries (customers above their nation's average balance), written in the correlated form so Catalyst's DECORRELATION is what runs"),
    "q_semi_join_bloom" ->
      EntryMeta("2.2", "sql",
        "the generic runtime-filter shape (huge fact, selective key set)"),
    "q_full_outer" ->
      EntryMeta("2.2", "sql",
        "FULL OUTER reconciliation"),
    "ml_feature_ntile" ->
      EntryMeta("2.2", "sql",
        "NTILE decile binning per series over a DETERMINISTIC total order"),
    "ml_feature_winsorize" ->
      EntryMeta("2.2", "sql",
        "per-series [p05,p95] clipping (robust feature prep)"),
    "q_user_growth" ->
      EntryMeta("2.2", "sql",
        "per-type adoption curve (new + cumulative users per day) via a first-seen fold"),
    "q_chi2" ->
      EntryMeta("2.2", "sql",
        "χ² independence test + Cramér's V between categorical columns"),
    "q_gini" ->
      EntryMeta("2.2", "sql",
        "volume-concentration audit (the INEQUALITY view beside q_skew_profile's heavy-hitter view): exact Gini over per-user counts + top-1%/10% shares"),
    "q_skew_profile" ->
      EntryMeta("2.2", "sql",
        "key-distribution diagnostic run BEFORE choosing a join strategy"),
    "q_markov" ->
      EntryMeta("2.2", "sql",
        "first-order user-journey transition matrix (what follows a click?)"),
    "q_ttest" ->
      EntryMeta("2.2", "sql",
        "Welch's unequal-variance t-test between two series (the A/B gate)"),
    "q_mann_whitney" ->
      EntryMeta("2.2", "sql",
        "Mann-Whitney U"),
    "q_ks_test" ->
      EntryMeta("2.2", "sql",
        "two-sample Kolmogorov-Smirnov distribution-drift test: exact integer D over the shared PrefixSum two-sample CDF pass, fully integer α=0.05 verdict"),
    "q_mutual_info" ->
      EntryMeta("2.2", "sql",
        "mutual information + NMI between two categorical columns — χ²'s how-much face, DECIMAL-quantized p·ln terms over observed cells"),
    "q_benford" ->
      EntryMeta("2.2", "sql",
        "Benford first-digit audit (fraud / synthetic-data smell test): leading digit from the value's fixed 4dp decimal rendering"),
    "q_kanonymity" ->
      EntryMeta("2.2", "sql",
        "k-anonymity privacy gate over a quasi-identifier tuple: group sizes (map-side combinable) then a GROUP-cardinality scalar reduction"),
    "q_ldiversity" ->
      EntryMeta("2.2", "sql",
        "l-diversity privacy gate — the k gate's SECOND axis"),
    "q_tcloseness" ->
      EntryMeta("2.2", "sql",
        "t-closeness (Li-Li-Venkatasubramanian ICDE'07)"),
    "q_entropy" ->
      EntryMeta("2.2", "sql",
        "one-row class-balance diagnostic: Shannon entropy, normalized entropy"),
    "q_session_paths" ->
      EntryMeta("2.2", "sql",
        "session-path mining (journey analytics)"),
    "q_event_ngrams" ->
      EntryMeta("2.2", "sql",
        "sliding event-sequence trigram mining"),
    "ml_feature_scale" ->
      EntryMeta("2.2", "sql",
        "per-series z-score standardization: (mu, sigma) from exact DECIMAL moments, ROUNDED before use (rounded-metric rule), broadcast back, row-local standardize"),
    "q_pagerank" ->
      EntryMeta("2.2", "sql",
        "PageRank over the order↔supplier bipartite graph"),
    "etl_erasure" ->
      EntryMeta("2.2", "sql",
        "GDPR right-to-be-forgotten dry run"),
    "ts_percentiles_daily" ->
      EntryMeta("2.2", "sql",
        "per-day latency bands",
        scalePartner = Some("ts_percentiles_daily_approx")),
    "ts_percentiles_daily_approx" ->
      EntryMeta("2.2", "sql",
        "the daily latency bands' 100 TB tier as a CHECKED entry: GK sketch beside exact with in-plan rank-error verdicts, oracle = exact + literal TRUE"),
    "graph_triangles" ->
      EntryMeta("2.2", "sql",
        "triangle count + global clustering coefficient over the part-co-occurrence graph",
      Some("graph_triangles_sampled")),
    "graph_triangles_sampled" ->
      EntryMeta("2.2", "sql",
        "the exact count's SCALE TIER"),
    "graph_random_walk" ->
      EntryMeta("2.2", "sql",
        "deterministic random walks"),
    "graph_degree_dist" ->
      EntryMeta("2.2", "sql",
        "degree-distribution diagnostic (the scale-free audit behind the triangle faces' degree orientation and caps): per log2-degree bin"),
    "graph_kcore" ->
      EntryMeta("2.2", "sql",
        "k-core peeling — the graph-DENSITY audit beside the triangle faces (clustering) and PageRank (centrality)"),
    "graph_lpa" ->
      EntryMeta("2.2", "sql",
        "label-propagation communities (Raghavan 2007)"),
    "q_market_basket" ->
      EntryMeta("2.2", "sql",
        "brand-pair support/confidence/lift over order baskets"),
    "rec_item_cosine" ->
      EntryMeta("2.2", "sql",
        "item-item collaborative filtering (\"bought X also bought Y\")",
      Some("rec_item_cosine_dimsum")),
    "rec_item_cosine_dimsum" ->
      EntryMeta("2.2", "sql",
        "the DIMSUM sampling tier (Zadeh-Goel JMLR'13, Spark's RowMatrix.columnSimilarities): each co-occurrence instance survives with p=min(1, γ/√(n_i·n_j))"),
    "rec_user_items" ->
      EntryMeta("2.2", "sql",
        "the composed \"customers also bought\""),
    "q_srm_check" ->
      EntryMeta("2.2", "sql",
        "sample-ratio-mismatch gate"),
    "graph_bfs" ->
      EntryMeta("2.2", "sql",
        "fixed-round BFS from the smallest node"),
    "graph_link_predict" ->
      EntryMeta("2.2", "sql",
        "common-neighbor/Jaccard LINK PREDICTION"),
    "q_growth_accounting" ->
      EntryMeta("2.2", "sql",
        "MAU GROWTH ACCOUNTING — the decomposition product teams read before any topline (Social-Capital framework)"),
    "q_psi_drift" ->
      EntryMeta("2.2", "sql",
        "POPULATION-STABILITY drift monitor (PSI)"),
    "q_sequential_test" ->
      EntryMeta("2.2", "sql",
        "GROUP-SEQUENTIAL A/B monitoring with O'Brien-Fleming boundaries"),
    "q_elasticity" ->
      EntryMeta("2.2", "sql",
        "price elasticity per product brand"),
    "q_rfm" ->
      EntryMeta("2.2", "sql",
        "RFM segmentation (recency/frequency/monetary quintiles, 555 = best)"),
    "q_attribution" ->
      EntryMeta("2.2", "sql",
        "last-touch marketing attribution (the credit question funnel counts don't answer)"),
    "q_bootstrap_ci" ->
      EntryMeta("2.2", "sql",
        "Poisson-bootstrap confidence intervals for per-type means"),
    "q_cuped" ->
      EntryMeta("2.2", "sql",
        "CUPED variance-reduced A/B readout"),
    "q_anova" ->
      EntryMeta("2.2", "sql",
        "one-way ANOVA across weekday groups"),
    "q_power_mde" ->
      EntryMeta("2.2", "sql",
        "power / minimum-detectable-effect readout"),
    "q_survival_km" ->
      EntryMeta("2.2", "sql",
        "Kaplan-Meier survival over user lifetimes"),
    "q_did" ->
      EntryMeta("2.2", "sql",
        "difference-in-differences"),
    // §2.3 Time series / feature engineering (reference layer 3+4)
    "ts_resample_daily" ->
      EntryMeta("2.3", "sql",
        "daily gap-fill resample (sequence+explode join)"),
    "ts_interpolate" ->
      EntryMeta("2.3", "sql",
        "linear gap-fill interpolation per series (in-plan spine + one two-frame ignoreNulls window, audit flag)"),
    "ts_rolling" ->
      EntryMeta("2.3", "sql",
        "rolling mean/stddev features per series (rows-frame window)"),
    "ts_lag_features" ->
      EntryMeta("2.3", "sql",
        "lag / delta / percent-change features per series"),
    "ts_pivot_wide" ->
      EntryMeta("2.3", "sql",
        "wide per-type daily matrix + fillna(0) + col combine"),
    "ts_train_test" ->
      EntryMeta("2.3", "sql",
        "time-based train/test split"),
    "ts_asof_join" ->
      EntryMeta("2.3", "sql",
        "as-of join (latest right row ≤ left ts, per key) via tagged union + one window"),
    "ts_range_join" ->
      EntryMeta("2.3", "sql",
        "key-less time-window join via time-cell bucketing"),
    "ts_deepar_export" ->
      EntryMeta("2.3", "sql",
        "per-series {start, target[]} dataset (sorted collect)"),
    "forecast_snaive" ->
      EntryMeta("2.3", "sql",
        "seasonal-naive qtile forecast (lag-7 + residual qtiles)"),
    "forecast_conformal" ->
      EntryMeta("2.3", "sql",
        "split-conformal prediction intervals around seasonal-naive (Vovk; Lei et al. JASA'18)"),
    "forecast_eval" ->
      EntryMeta("2.3", "sql",
        "quantile-loss / MAE evaluation of a forecast"),
    "forecast_hw" ->
      EntryMeta("2.3", "sql",
        "additive Holt-Winters (level/trend/rotating-seasonal recursion) via flatMapGroups"),
    "forecast_ar" ->
      EntryMeta("2.3", "sql",
        "per-series AR(2) by closed-form least squares"),
    "forecast_theta" ->
      EntryMeta("2.3", "sql",
        "theta-lite forecaster"),
    "forecast_compare" ->
      EntryMeta("2.3", "sql",
        "backtest MODEL SELECTION — the per-series routing table before committing to a forecaster"),
    "forecast_ensemble" ->
      EntryMeta("2.3", "sql",
        "equal-weight mean of the three holdout forecasters scored beside its members on the COMMON holdout day set — the Bates-Granger combination as an oracled table"),
    "ts_seasonal_decompose" ->
      EntryMeta("2.3", "sql",
        "additive seasonal decomposition (STL-lite): centered `period`-row moving-average trend"),
    "ts_seasonal_strength" ->
      EntryMeta("2.3", "sql",
        "STL feature pair (Wang-Smith-Hyndman tsfeatures): per series, seasonal strength max(0, 1−var(resid)/var(seasonal+resid)) and trend strength vs (trend+resid)"),
    "ts_acf" ->
      EntryMeta("2.3", "sql",
        "per-series sample autocorrelation at lags 1..7"),
    "ts_changepoint" ->
      EntryMeta("2.3", "sql",
        "per-series changepoint scan (sustained level shifts, the event single-point z-scores structurally miss): two-window mean compare"),
    "ts_anomaly" ->
      EntryMeta("2.3", "sql",
        "per-series online anomaly detection: z-score vs the TRAILING window (no future peeking), warm-up days emit nothing, zero-variance windows pin z = 0 (not NaN)"),
    "ts_outlier_mad" ->
      EntryMeta("2.3", "sql",
        "robust per-series outliers via median/MAD",
        scalePartner = Some("ts_outlier_mad_approx")),
    "ts_outlier_mad_approx" ->
      EntryMeta("2.3", "sql",
        "the MAD thresholds' 100 TB tier as a CHECKED entry: both median stages sketched beside exact (stage-2 bracket from the sketched-deviation distribution), oracle = exact med/MAD + literal TRUE"),
    "ts_theil_sen" ->
      EntryMeta("2.3", "sql",
        "Theil-Sen robust trend per series: median-of-pairwise-slopes line, medians selected and combined as exact integer rationals, published via signed exact half-up division"),
    "ts_forecast_reconcile" ->
      EntryMeta("2.3", "sql",
        "HIERARCHICAL forecast coherence audit"),
    "ts_backtest_rolling" ->
      EntryMeta("2.3", "sql",
        "ROLLING-ORIGIN backtest of seasonal-naive"),
    "forecast_holt_damped" ->
      EntryMeta("2.3", "sql",
        "damped-trend Holt (Gardner-McKenzie)"),
    "ts_intermittency" ->
      EntryMeta("2.3", "sql",
        "INTERMITTENCY CLASSIFICATION (Syntetos-Boylan 2005 quadrants)"),
    "forecast_croston" ->
      EntryMeta("2.3", "sql",
        "Croston intermittent-demand forecaster (1972)"),
    "ts_fourier_features" ->
      EntryMeta("2.3", "sql",
        "Fourier weekly seasonal basis beside the categorical calendar features"),
    "ts_calendar_features" ->
      EntryMeta("2.3", "sql",
        "calendar feature enrichment on the daily series (the first features a demand forecaster earns)"),
    "ts_cross_corr" ->
      EntryMeta("2.3", "sql",
        "lead-lag discovery between series (the multi-series sibling of ts_acf)"),
    "ts_pacf" ->
      EntryMeta("2.3", "sql",
        "partial autocorrelation by Durbin-Levinson"),
    "ts_periodogram" ->
      EntryMeta("2.3", "sql",
        "WHICH period? — the detector every period=7 face (decompose, strength, fourier, snaive) implicitly assumes"),
    "ts_dtw" ->
      EntryMeta("2.3", "sql",
        "dynamic-time-warping distance between every per-type daily series pair",
        Some("ts_dtw_banded")),
    "ts_matrix_profile" ->
      EntryMeta("2.3", "sql",
        "matrix profile per per-type daily series: for every length-7 window the min integer-ED distance to a non-overlapping window (global integer z-codes, exact lattice distances, two-pass min/argmin), motif + discord flags — the all-pairs subsequence index behind motif discovery; series shorter than 3m-1 emit nothing; DECLARED bound: the core is O(P^2*m) per series, fine for calendar-bounded daily input (<=366 points/year ~ 2M integer ops), the banded partner-horizon tier is what a sub-daily series ships on",
      Some("ts_matrix_profile_banded")),
    "ts_matrix_profile_banded" ->
      EntryMeta("2.3", "sql",
        "the matrix profile's long-series knob (the ts_dtw_banded shape): partner search bounded to m <= |i-j| <= band (band = 2m = 14) — O(P*band*m) per series, LINEAR in series length; same integer lattice, same hits->min->argmin oracle via the shared matrixProfileOracleSql(band) builder; band >= P-1 reproduces the unbanded profile cell for cell (spec-pinned)"),
    "ts_dtw_banded" ->
      EntryMeta("2.3", "sql",
        "the DTW long-horizon knob: Sakoe-Chiba band (r = max(7, |n-m|)) masks |i-j|>r cells to the shared sentinel — O(r*(n+m)) cells per pair instead of n*m, same integer DP and wavefront oracle via the shared dtwOracleSql builder"),
    "ts_pit_join" ->
      EntryMeta("2.3", "sql",
        "POINT-IN-TIME join — the feature-store correctness primitive"),
    "ts_ewma" ->
      EntryMeta("2.3", "sql",
        "per-series exponentially weighted moving average (e₁=y₁, eₜ=α·yₜ+(1−α)·eₜ₋₁) as a sorted per-series fold"),
    // §2.4 Deduplication (LLM-pipeline mandate)
    "dedup_exact" ->
      EntryMeta("2.4", "sql",
        "exact text dedup via sha2 hash groupBy"),
    "dedup_minhash" ->
      EntryMeta("2.4", "sql",
        "shingle→MinHash→LSH bands→bucket join→verify",
      Some("dedup_minhash_est")),
    "dedup_minhash_est" ->
      EntryMeta("2.4", "sql",
        "verify-by-signature: banded candidates scored by MinHash component agreement (E[est]=J) — no second corpus pass; checked md5 construction replays bit for bit"),
    "dedup_incremental_index" ->
      EntryMeta("2.4", "sql",
        "incremental near-dup index maintenance: persisted band-signature table + daily delta fold (delta-vs-history via the index, delta-vs-delta self-join, candidate history docs fetched by id) — history never rescanned; UNCAPPED (oracle = full recompute, split-agnostic, unconditionally); the hot-bucket cap is the separately-registered _capped face",
      Some("dedup_incremental_index_capped")),
    "dedup_incremental_index_capped" ->
      EntryMeta("2.4", "sql",
        "the fold with hot-bucket caps (maxBucket=1000, two-way representative overflow): one band signature costs O(cap^2+size), never quadratic; DECLARED contract = equal to the recompute oracle when no bucket exceeds the cap (true of this corpus — checked), strict subset with preserved cluster membership on a hot bucket (DedupSpec-pinned)"),
    "dedup_incremental_index_persisted" ->
      EntryMeta("2.4", "sql",
        "the fold with its state crossing a REAL parquet boundary (round 14): band index written partitioned by band + pair table written, both READ BACK, today's delta folded from the read-back state — the 2am re-run's actual load path; same split-agnostic full-recompute oracle via the shared minhashRecomputeOracleSql builder"),
    "dedup_simhash" ->
      EntryMeta("2.4", "sql",
        "SimHash + multi-index (1-bit probe) candidate pairs; the registry runs the CHECKED face",
      Some("dedup_simhash_wide")),
    "dedup_simhash_wide" ->
      EntryMeta("2.4", "sql",
        "the corpus-scale SimHash band width: 3×20-bit bands (hamming ≤ 5) — 32× fewer random band collisions than 4×15; routed by Routing.simhashAuto"),
    "dedup_ngram_jaccard" ->
      EntryMeta("2.4", "sql",
        "n-gram Jaccard pairs, prefix-filtered exact join"),
    "dedup_fuzzy" ->
      EntryMeta("2.4", "sql",
        "blocked entity resolution"),
    "dedup_substring" ->
      EntryMeta("2.4", "sql",
        "span-level duplication stats"),
    "text_trim_dup_spans" ->
      EntryMeta("2.4", "sql",
        "the ACTION the span stats drive"),
    "dedup_decontaminate" ->
      EntryMeta("2.4", "sql",
        "train/eval cross-corpus contamination check",
      Some("dedup_decontaminate_bloom")),
    "dedup_decontaminate_spans" ->
      EntryMeta("2.4", "sql",
        "span-level decontamination LOCATOR: maximal covered word intervals + the leaked slice per (corpus doc, reference doc) — the face a cleanup job consumes",
        Some("dedup_decontaminate_spans_bcast")),
    "dedup_decontaminate_spans_bcast" ->
      EntryMeta("2.4", "sql",
        "the locator in the tiny-reference production regime: broadcast distinct reference gram keys (map-side candidate probe) + broadcast leak-sized span table into the corpus scan for the slice — the corpus is never exchanged; identical values from the shared island-merge core, one oracle; Routing.decontaminateSpansAuto arbitrates"),
    "dedup_decontaminate_report" ->
      EntryMeta("2.4", "sql",
        "per-reference contamination report: leaked gram fraction + carrier count per eval doc — the 'which benchmark items are burned' view"),
    "dedup_decontaminate_cut" ->
      EntryMeta("2.4", "sql",
        "the CUT face the locator drives: rebuild every corpus doc without words covered by any reference-shared 10-gram — the cross-corpus analog of text_trim_dup_spans, shared rebuild stage"),
    "dedup_decontaminate_bcast" ->
      EntryMeta("2.4", "sql",
        "the tiny-reference production shape: row-local corpus signatures + broadcast reference index/sets"),
    "dedup_decontaminate_bloom" ->
      EntryMeta("2.4", "sql",
        "the middle reference regime (too big to broadcast shingle sets, band-key Bloom filter still fits)"),
    "dedup_containment" ->
      EntryMeta("2.4", "sql",
        "asymmetric n-gram containment \\|A∩R\\|/\\|R\\| ≥ t"),
    "dedup_cdc_chunks" ->
      EntryMeta("2.4", "sql",
        "CONTENT-DEFINED CHUNKING (Rabin/FastCDC family, over tokens)"),
    "dedup_clusters" ->
      EntryMeta("2.4", "sql",
        "pairs → clusters: distributed connected components (min-label propagation) over the verified near-dup graph"),
    "curate_canonical" ->
      EntryMeta("2.4", "sql",
        "keep-BEST per near-dup cluster"),
    "curate_corpus" ->
      EntryMeta("2.4", "sql",
        "composed end-to-end curation"),
    "curate_token_budget" ->
      EntryMeta("2.4", "sql",
        "data-constrained training selection: keep the highest-quality documents until a global token budget is exhausted"),
    "curate_funnel" ->
      EntryMeta("2.4", "sql",
        "the curation FUNNEL report: the curate_corpus chain + the token budget, published as per-stage (docs, tokens) survivors — hash equality proves every stage's survivor set"),
    "curate_web" ->
      EntryMeta("2.4", "sql",
        "the CommonCrawl-shaped FRONT half of curation, composed lazily"),
    "curate_dsir" ->
      EntryMeta("2.4", "sql",
        "DSIR importance resampling (Xie et al. 2023)"),
    "curate_mix_temperature" ->
      EntryMeta("2.4", "sql",
        "temperature-scaled source mixing (the GPT-3/LLaMA data-recipe sampler), pinned at T=2: source quotas ∝ √n_s"),
    "curate_shard_export" ->
      EntryMeta("2.4", "sql",
        "shard export: balanced md5-keyed shards + deterministic within-shard pseudo-random order — the reproducible global shuffle a training run reads"),
    "curate_pack_sequences" ->
      EntryMeta("2.4", "sql",
        "sequence packing at DOCUMENT grain — the same packing text_pack publishes at context grain, from the same token stream through the same shared PrefixSum: per doc the global token interval, first/last sequence, boundary-crossing flag; spec pins the two grains equal (doc's sequence range == its text_pack ctx_ids)"),
    "curate_pack_stats" ->
      EntryMeta("2.4", "sql",
        "the pack map at sequence grain: per budget-token sequence, docs touched, fill tokens (budget everywhere but the final partial), fullness — interval clipping over the exploded per-doc sequence ranges, tiles the corpus token count exactly"),
    "curate_pack_bpe" ->
      EntryMeta("2.4", "sql",
        "sequence packing at the TOKENIZER grain: the held-out half's post-BPE token counts (text_bpe_encode n_after) through the SAME shared packing core (n>0 guard, PrefixSum, budget intervals) — the token stream a training job actually reads; oracle nests the full BPE train-and-apply chain under the cumsum; spec pins rounds=0 == the whitespace map on the same half"),
    "curate_pack_bpe_stats" ->
      EntryMeta("2.4", "sql",
        "the tokenizer-grain pack map at sequence grain: same explode-and-clip integer arithmetic — sequence fills provably tile the held-out half's post-BPE token count"),
    "dedup_embedding" ->
      EntryMeta("2.4", "sql",
        "embedding-cosine pairs: exact all-pairs face (the oracle baseline)",
      Some("dedup_embedding_lsh")),
    "dedup_embedding_lsh" ->
      EntryMeta("2.4", "sql",
        "the 100 TB embedding-dedup path: multi-table random-hyperplane LSH, bucket-capped"),
    "dedup_semantic" ->
      EntryMeta("2.4", "sql",
        "SemDeDup (Abbas et al. 2023): k-means cells confine the cosine quadratic"),
    "DedupStreams.dedupStream" ->
      EntryMeta("2.4", "spec",
        "streaming exact dedup, watermark-bounded state"),
    "DedupStreams.decontaminateStream" ->
      EntryMeta("2.4", "spec",
        "streaming near-dup decontamination vs a static reference index: row-local signatures, stream-static band joins, watermark-bounded state"),
    "DedupStreams.nearDedupStream" ->
      EntryMeta("2.4", "spec",
        "within-stream NEAR-dup dedup"),
    "DedupStreams.nearDedupStreamTws" ->
      EntryMeta("2.4", "spec",
        "the same bucket state machine on Spark 4's arbitrary-state v2 API (transformWithState StatefulProcessor, RocksDB): ListState row per member + per-bucket timers"),
    // §2.5 Similarity search (LLM-pipeline mandate)
    "ann_bruteforce_topk" ->
      EntryMeta("2.5", "sql",
        "exact cosine top-k per query vector",
      Some("ann_ivf_topk")),
    "ann_mmr_rerank" ->
      EntryMeta("2.5", "sql",
        "MMR diversified re-ranking over the retrieval shortlist: greedy argmax lambda*rel − (1−lambda)*max-sim on exact 1e-4 integer similarities",
        Some("ann_mmr_rerank_ivf")),
    "ann_mmr_rerank_ivf" ->
      EntryMeta("2.5", "sql",
        "the MMR dial's Scale face: IVF-probe shortlist (the ann_ivf_topk chain) into the same exact-integer greedy rounds"),
    "emb_centroids" ->
      EntryMeta("2.5", "sql",
        "per-label embedding centroids (class prototypes / mean pooling / IVF coarse-quantizer seed)"),
    "ann_pq_topk" ->
      EntryMeta("2.5", "sql",
        "product quantization — the memory-compression ANN tier"),
    "ann_lsh_topk" ->
      EntryMeta("2.5", "sql",
        "LSH-bucketed (random hyperplane) approximate top-k"),
    "emb_quantize_int8" ->
      EntryMeta("2.5", "sql",
        "int8 scalar quantization with measured per-vector FIDELITY (cosine of original vs dequantized)"),
    "emb_project_rp" ->
      EntryMeta("2.5", "sql",
        "Johnson-Lindenstrauss random projection 64→8"),
    "emb_mrl_recall" ->
      EntryMeta("2.5", "sql",
        "Matryoshka-truncation evaluation: recall@5 of the 16/32-dim PREFIX rankings against the full-dim top-k"),
    "emb_binary_recall" ->
      EntryMeta("2.5", "sql",
        "the 32× extreme of the compression ladder"),
    "ml_eval_ranking" ->
      EntryMeta("2.5", "sql",
        "retrieval scoreboard — MRR, DCG/NDCG@10, hits, recall per query (the readout every search/RAG pipeline reports before shipping an index change)"),
    "ml_logreg_gd" ->
      EntryMeta("2.5", "sql",
        "transparent logistic regression by FIXED-ROUND batch gradient descent"),
    "emb_pca_power" ->
      EntryMeta("2.5", "sql",
        "top principal component by FIXED-POINT power iteration over an in-plan covariance grid"),
    "emb_pca_project" ->
      EntryMeta("2.5", "sql",
        "the probe's ACTION: project every embedding onto the fitted top component"),
    "emb_pca_remove_top" ->
      EntryMeta("2.5", "sql",
        "all-but-the-top common-component removal: centered vectors minus their top-PC projection on the exact integer lattice — the isotropy post-processing the ev_share probe earns"),
    "emb_standardize" ->
      EntryMeta("2.5", "sql",
        "per-dimension z-scoring (diagonal whitening) on the pcaFit lattice restricted to the diagonal: integer mean/var8, z = dx/(100*sqrt(var8)) through one correctly-rounded chain per engine, zero-variance dims publish 0 — the feature-scaling step distance-based downstreams assume; no d^2 grid, two narrow corpus passes"),
    "emb_centroid_drift" ->
      EntryMeta("2.5", "sql",
        "EMBEDDING-space drift monitor"),
    "ann_ivf_topk" ->
      EntryMeta("2.5", "sql",
        "IVF (centroid-partitioned, ~√n cells) approximate top-k — the ANN ladder's second rung (Routing.annTopKAuto routes past the 32 GiB build dial to the linear-build sampled face)",
        Some("ann_ivf_topk_sampled")),
    "ann_ivf_topk_sampled" ->
      EntryMeta("2.5", "sql",
        "the IVF tier's LINEAR-build face (round 16, closing VERDICT r15's one measured superlinear term): centroid fit on an md5-bucket-capped sample, cell count PINNED at √buildMaxVectors past the cap, ONE linear full-corpus assignment — the FAISS train-on-sample posture; identical to ann_ivf_topk below the cap, annTopKAuto's rung between the build and memory dials",
        Some("ann_ivfpq_topk")),
    "ann_ivf_recall" ->
      EntryMeta("2.5", "sql",
        "recall@k of the IVF tier MEASURED against the exact brute-force face — the ANN dial's retrieval quality as a checked number"),
    "ann_ivf_sampled_recall" ->
      EntryMeta("2.5", "sql",
        "recall@k of the bounded-build IVF face measured against the exact face (same audit shape as ann_ivf_recall) — what the sampled fit costs in retrieval quality, as a checked number"),
    "ann_lsh_recall" ->
      EntryMeta("2.5", "sql",
        "recall@k of the bucket-gated LSH tier measured against the exact face (same audit shape as ann_ivf_recall)"),
    "ann_pq_recall" ->
      EntryMeta("2.5", "sql",
        "recall@k of the PQ/ADC tier measured against the exact face (same audit shape as ann_ivf_recall)"),
    "ann_ivfpq_recall" ->
      EntryMeta("2.5", "sql",
        "recall@k of the composed IVF·PQ tier — probe gating and ADC quantization losses measured composed"),
    "emb_diversity_sample" ->
      EntryMeta("2.5", "sql",
        "diversity sampling over embeddings"),
    "ann_ivfpq_topk" ->
      EntryMeta("2.5", "sql",
        "IVF·PQ COMPOSED the way production vector indexes ship (the FAISS IVFPQ shape): IVF decides WHO is a candidate"),
    // §2.6 Text analysis (LLM-pipeline mandate)
    "text_tokens" ->
      EntryMeta("2.6", "sql",
        "token counting (whitespace + BPE-ish regex)"),
    "text_quality" ->
      EntryMeta("2.6", "sql",
        "quality scores (len/punct/stopword ratios)"),
    "text_gopher_gates" ->
      EntryMeta("2.6", "sql",
        "the Gopher document-quality GATE battery (Rae et al. 2021 §A1.1)"),
    "text_langid" ->
      EntryMeta("2.6", "sql",
        "stopword-profile language ID"),
    "text_fingerprint" ->
      EntryMeta("2.6", "sql",
        "winnowing document fingerprint; the registry runs the CHECKED face"),
    "text_novelty" ->
      EntryMeta("2.6", "sql",
        "per-doc k-gram novelty vs a reference corpus — the synthetic-data QA metric: one gram equi-join on uniform keys, exact half-up share"),
    "text_tfidf" ->
      EntryMeta("2.6", "sql",
        "per-doc top-k TF-IDF terms (map-side tf/df, broadcast corpus size, ranked window)"),
    "text_top_terms" ->
      EntryMeta("2.6", "sql",
        "exact corpus top-k term frequencies (map-side-combinable count + TakeOrdered)",
      Some("text_top_terms_sketch")),
    "text_chunk" ->
      EntryMeta("2.6", "sql",
        "overlapping token-window chunking into training-sized pieces"),
    "text_pack" ->
      EntryMeta("2.6", "sql",
        "GPT-style sequence packing (concatenate-and-cut into full `ctxLen` windows) via a DISTRIBUTED prefix sum"),
    "text_count_min" ->
      EntryMeta("2.6", "sql",
        "Count-Min point-query sketch beside the MG heavy-hitter list"),
    "text_top_terms_sketch" ->
      EntryMeta("2.6", "sql",
        "Misra-Gries heavy-hitter sketch (custom typed Aggregator, `capacity` counters, mergeable, est undercounts ≤ n/capacity)"),
    "text_redact" ->
      EntryMeta("2.6", "sql",
        "PII scrub (URLs, emails, IPv4, long digit runs → typed placeholders + audit counts)"),
    "text_repetition" ->
      EntryMeta("2.6", "sql",
        "Gopher-style repetition signals"),
    "text_dedup_lines" ->
      EntryMeta("2.6", "sql",
        "intra-document line dedup (boilerplate removal): keep each line's first occurrence in order"),
    "text_dedup_lines_global" ->
      EntryMeta("2.6", "sql",
        "CORPUS-WIDE line dedup (C4-style): each distinct line keeps only its first occurrence across the whole corpus (smallest (doc_id, idx))"),
    "text_lm_score" ->
      EntryMeta("2.6", "sql",
        "unigram LM quality score (CCNet-style perplexity-filter proxy): add-one-smoothed corpus-trained token log-probs, per-doc mean"),
    "text_ccnet_buckets" ->
      EntryMeta("2.6", "sql",
        "CCNet head/middle/tail perplexity terciles (Wenzek et al. 2020) PER LANGUAGE (LM scores aren't comparable across languages)"),
    "text_lm_bigram" ->
      EntryMeta("2.6", "sql",
        "bigram LM with stupid backoff"),
    "text_collocations" ->
      EntryMeta("2.6", "sql",
        "collocation mining: adjacent-pair PMI (ln p(a,b)/(p(a)p(b)))"),
    "text_sentences" ->
      EntryMeta("2.6", "sql",
        "per-document sentence statistics (segmentation is the unit quality filters and chunkers reason in): terminal-punctuation split WITHOUT lookbehind"),
    "text_rake" ->
      EntryMeta("2.6", "sql",
        "RAKE keyword extraction (corpus-salient PHRASES vs tf-idf's salient terms)"),
    "text_url_canonical" ->
      EntryMeta("2.6", "sql",
        "URL canonicalization (normalize-before-dedup for web curation): lowercase scheme+host, default-port drop"),
    "text_bm25" ->
      EntryMeta("2.6", "sql",
        "BM25 retrieval"),
    "text_bpe_merges" ->
      EntryMeta("2.6", "sql",
        "distributed BPE-style merge training"),
    "text_bpe_encode" ->
      EntryMeta("2.6", "sql",
        "the tokenizer's APPLY face"),
    "ml_feature_hashing" ->
      EntryMeta("2.6", "sql",
        "HASHING-TRICK vectorization (Weinberger 2009)"),
    "ml_naive_bayes" ->
      EntryMeta("2.6", "sql",
        "multinomial naive Bayes language classifier trained and scored ENTIRELY in the plan"),
    "ml_calibration" ->
      EntryMeta("2.6", "sql",
        "reliability-by-confidence over the in-plan NB classifier"),
    "ml_auc" ->
      EntryMeta("2.6", "sql",
        "one-vs-rest ROC AUC per class over the SAME NB scored frame"),
    // §2.7 Multimodal (LLM-pipeline mandate)
    "mm_extract" ->
      EntryMeta("2.7", "sql",
        "binary-column decode→feature-extract with the REAL WAV/BMP header-walking codecs over byte-level payloads synthesized deterministically from doc_id (MmSynth)"),
    "mm_gate" ->
      EntryMeta("2.7", "sql",
        "media QUALITY GATE chaining the codec-closed transforms INTO decode"),
    "mm_video_sample" ->
      EntryMeta("2.7", "sql",
        "video FRAME SAMPLING"),
    "dedup_image_phash" ->
      EntryMeta("2.7", "sql",
        "perceptual image NEAR-dup detection"),
    "dedup_audio_fp" ->
      EntryMeta("2.7", "sql",
        "perceptual AUDIO near-dup"),
    "dedup_video_fp" ->
      EntryMeta("2.7", "sql",
        "perceptual VIDEO near-dup: brightness-shift-invariant " +
          "frame-luma-delta fingerprint over sampled keyframes"),
    "MultimodalOps.decodeWav" ->
      EntryMeta("2.7", "spec",
        "REAL RIFF/WAVE PCM decoder (header walk + RMS energy, no codec lib needed)"),
    "MultimodalOps.decodeBmp" ->
      EntryMeta("2.7", "spec",
        "REAL uncompressed 24-bit BMP decoder (adversarial-size-safe header walk + per-channel means)"),
    "MultimodalOps.clipWav" ->
      EntryMeta("2.7", "spec",
        "REAL audio clip extraction"),
    "MultimodalOps.resizeBmp" ->
      EntryMeta("2.7", "spec",
        "REAL nearest-neighbor image resize (BmpCodec.resize): payload→payload, codec CLOSED under it so resize stages chain with decode"),
    // §2.8 Streaming (events)
    "stream_window_counts" ->
      EntryMeta("2.8", "sql",
        "tumbling-window counts"),
    "stream_sessionize" ->
      EntryMeta("2.8", "sql",
        "session assignment (gap>30min)"),
    "stream_dedup" ->
      EntryMeta("2.8", "sql",
        "first-arrival-per-key dedup"),
    "stream_dedup_near" ->
      EntryMeta("2.8", "sql",
        "later-flags-earlier near-dup pair set"),
    "stream_join" ->
      EntryMeta("2.8", "sql",
        "STREAM-STREAM attribution join"),
    "stream_enrich" ->
      EntryMeta("2.8", "sql",
        "stream-static dimension lookup (attach segment/account/geo to each arriving event)"),
    "EventStreams.enrichStateStream" ->
      EntryMeta("2.8", "spec",
        "the THIRD enrichment regime"),
    "stream_expectations" ->
      EntryMeta("2.8", "sql",
        "windowed data-quality drift monitor: per tumbling window, total rows + per-rule violation counts"),
    "SketchStreams.countMinStream" ->
      EntryMeta("2.8", "spec",
        "streaming Count-Min fold — `text_count_min`'s live face"),
    "SketchStreams.topkStream" ->
      EntryMeta("2.8", "spec",
        "streaming heavy-hitter profile"),
    "EventStreams.funnelStream" ->
      EntryMeta("2.8", "spec",
        "streaming face of q_funnel: per-user stage state; versioned audit oracled as funnel_versions"),
    "SketchStreams.psiStream" ->
      EntryMeta("2.8", "spec",
        "streaming PSI drift monitor"),
    "SketchStreams.hllStream" ->
      EntryMeta("2.8", "spec",
        "streaming DISTINCT-COUNT fold"),
    "EventStreams.attributionStream" ->
      EntryMeta("2.8", "spec",
        "streaming face of q_attribution: the batch keyed-window carry-forward is exactly a greedy fold per user, so state = ONE touch (timestamp + type); versioned audit oracled as attribution_versions"),
    "attribution_versions" ->
      EntryMeta("2.8", "sql",
        "ORACLED versioned audit of the attribution stream (the cdc_snapshot_versions pattern): per retained epoch-prefix version, the published credit table re-derived through the stream's own epoch-major fold order — one keyed window with epoch prepended; StreamingSpec replays the same epochs live and pins cumulative-output equality"),
    "EventStreams.anomalyStream" ->
      EntryMeta("2.8", "spec",
        "streaming face of ts_anomaly; versioned audit oracled as anomaly_versions"),
    "anomaly_versions" ->
      EntryMeta("2.8", "sql",
        "ORACLED versioned audit of the anomaly monitor (the cdc pattern): the day timeline splits into contiguous epochs (arrival order IS day order under the watermark) and per retained version k the cumulative published z-rows re-derive through the batch twin's window chain — the trailing window scores a day on arrival, so version k = rows with day in epochs <= k; StreamingSpec replays the epochs live and pins cumulative-output equality"),
    "EventStreams.changepointStream" ->
      EntryMeta("2.8", "spec",
        "streaming face of ts_changepoint: live regime-shift monitor over watermark-finalized daily counts; versioned audit oracled as changepoint_versions"),
    "stream_conformal" ->
      EntryMeta("2.8", "sql",
        "ORACLED batch face of the conformal monitor's ROLLING band (the stream's own adaptive fold, not forecast_conformal's one-shot split): seasonal-naive lag reference, FIFO calWindow residual frame, q-hat = the ceil(keep(n+1)/100)-th smallest calibration residual by the stream's exact integer rank — pred/lo/hi/covered/n_cal all exact integers, bit-for-bit cross-engine; two bounded per-series windows on one series-key shuffle"),
    "conformal_versions" ->
      EntryMeta("2.8", "sql",
        "ORACLED versioned audit of the conformal monitor — the LAST live face in the promotion series (cdc -> sketches -> attribution -> anomaly/changepoint -> ewma/funnel -> this): bands publish on day arrival and q-hat reads only PRIOR residuals, so version k = the rolling-band rows with day in epochs <= k; shared day-epoch timeline, shared rolling-band oracle core; StreamingSpec replay-pinned"),
    "funnel_versions" ->
      EntryMeta("2.8", "sql",
        "ORACLED versioned audit of the funnel stream (the attribution posture): the greedy stage machine folded in epoch-major arrival order = chained min-tuple selections over (epoch, us, stageIdx, id) with BOTH gates explicit (processed-after tuple > prev advance, event-time us >= prev advance) — an early-epoch event can never advance a stage reached later, the late-data caveat oracled; version k = q_funnel's per-stage counts over advances emitted through epoch k; StreamingSpec replay-pinned"),
    "ewma_versions" ->
      EntryMeta("2.8", "sql",
        "ORACLED versioned audit of the EWMA smoother: e_t folds only days <= t and published values never revise, so version k = the batch twin's rows with day in epochs <= k — the anomaly audit's emission rule on the O(1)-state monitor; shared day-epoch timeline, shared recursive-CTE oracle core with ts_ewma; StreamingSpec replay-pinned"),
    "changepoint_versions" ->
      EntryMeta("2.8", "sql",
        "ORACLED versioned audit of the changepoint monitor: the forward-looking statistic emits day D only once its TRIGGER day (per-series rank(D)+w-1) finalizes, so version k = batch rows whose trigger day sits in epochs <= k — the w-1-day emission lag promoted from a scaladoc disclaimer to an oracled value; same shared day-epoch timeline as anomaly_versions, StreamingSpec replay-pinned"),
    "EventStreams.ewmaStream" ->
      EntryMeta("2.8", "spec",
        "streaming face of ts_ewma: the entire history folds into ONE double per series; versioned audit oracled as ewma_versions"),
    "cdc_snapshot_versions" ->
      EntryMeta("2.8", "sql",
        "ORACLED audit face of the versioned-snapshot contract"),
    "sketch_topk_versions" ->
      EntryMeta("2.8", "sql",
        "versioned-snapshot AUDIT of the streaming MG heavy-hitter fold (round 12, the cdc_snapshot_versions pattern)"),
    "sketch_cm_versions" ->
      EntryMeta("2.8", "sql",
        "versioned audit of the streaming Count-Min fold: CM merges losslessly, so every value"),
    "sketch_hll_versions" ->
      EntryMeta("2.8", "sql",
        "versioned audit of the streaming HLL distinct fold: exact per-(version, type) distincts replay in SQL"),
    "sketch_psi_versions" ->
      EntryMeta("2.8", "sql",
        "versioned audit of the streaming PSI drift monitor: the histogram fold is lossless, so the whole per-version PSI table replays value-for-value"),
    "EventStreams.conformalStream" ->
      EntryMeta("2.8", "spec",
        "streaming face of forecast_conformal; its ROLLING band is oracled as stream_conformal, versioned audit as conformal_versions"),
    // §2.9 Sources & sinks + session surface (API rows; compound
    // SURVEY rows are keyed by their first member)
    "Sources.readCsv" ->
      EntryMeta("2.9", "spec",
        "headered CSV with declared schema (the ETL jobs' input path)"),
    "Sources.readCsvInferred" ->
      EntryMeta("2.9", "spec",
        "header + schema inference (the \"crawler\" path)"),
    "Sources.writePartitioned" ->
      EntryMeta("2.9", "spec",
        "partitioned parquet sink (+maxRecordsPerFile), pruning verified"),
    "Sources.readPartitioned" ->
      EntryMeta("2.9", "spec", "partition-pruned read-back"),
    "Sources.readJsonl" ->
      EntryMeta("2.9", "spec",
        "JSON-Lines in/out (readJsonl / readJsonlInferred / writeJsonl)"),
    "Sources.writeOrc" ->
      EntryMeta("2.9", "spec",
        "ORC faces of the partitioned sink/source pair, same pruning " +
          "contract (writeOrc / readOrc)"),
    "Sources.readBinaryFiles" ->
      EntryMeta("2.9", "spec", "raw-blob ingestion (binaryFile source)"),
    "Sources.readEvolved" ->
      EntryMeta("2.9", "spec",
        "mergeSchema read over a column-accreting dataset"),
    "Sources.schemaDiff" ->
      EntryMeta("2.9", "spec",
        "schema drift audit run BEFORE trusting readEvolved's silent union"),
    "Sources.writeBucketed" ->
      EntryMeta("2.9", "spec", "bucketed+sorted table write on the join key"),
    "Sources.compact" ->
      EntryMeta("2.9", "spec",
        "small-file compaction: byte-sized targets, swap-on-success rewrite"),
    "Sources.writeSorted" ->
      EntryMeta("2.9", "spec",
        "sorted data layout (repartitionByRange + sortWithinPartitions)"),
    "Sources.writeZOrdered" ->
      EntryMeta("2.9", "spec",
        "multi-column skipping: bit-interleaved z-values, range-partition " +
          "+ sort so row groups become compact multi-dim cells"),
    "Sources.writeStatsManifest" ->
      EntryMeta("2.9", "spec",
        "external per-file min/max stats manifest + pruned read " +
          "(writeStatsManifest / readPruned, staleness-guarded)"),
    "Sources.registerTable" ->
      EntryMeta("2.9", "spec", "crawler-to-catalog persistence"),
    "layout_pruned_checksum" ->
      EntryMeta("2.9", "sql",
        "the layout family's ORACLED gate (round 16): range-sorted + manifested lineitem band read through the pruned path AND as a plain filtered scan, both checksummed; the oracle recomputes the band from the raw table knowing nothing of layout/manifest/files — triple hash equality proves pruned read ≡ full-scan filter ≡ raw recompute"),
    "Routing" ->
      EntryMeta("2.9", "spec",
        "the scale-tier dial: routes exact face vs scale tier on " +
          "Catalyst plan-stats bytes for all declared pairs; " +
          "adaptivePermille scales DOULION's keep rate past the dial"),
    "GraftExtensions" ->
      EntryMeta("2.9", "spec",
        "SparkSessionExtensions: simhash64 / cosine_sim / dot_product " +
          "as SQL functions"),
    "RegistryMeta" ->
      EntryMeta("2.9", "spec",
        "this index: section tag + oracle mode + contract + scale " +
          "partner per registry key, sync-pinned by RegistryMetaSpec"),
    "IncrementalIngest.ingestOnce" ->
      EntryMeta("2.9", "spec",
        "scheduled-job bookmarks: checkpointed AvailableNow file-stream " +
          "to a partitioned sink, idempotent re-run"),
    // §2.10 MLlib pipelines
    "ml_cluster" ->
      EntryMeta("2.10", "sql",
        "KMeans clustering of the embedding space (fixed seed); the registry runs the CHECKED face"),
    "ml_kmeans_plan" ->
      EntryMeta("2.10", "sql",
        "Lloyd's k-means trained and scored ENTIRELY in the plan"),
    "ml_knn_classify" ->
      EntryMeta("2.10", "sql",
        "k-NN classification over the embedding space (the non-parametric embedding-quality baseline)",
        scalePartner = Some("ml_knn_classify_ivf")),
    "ml_knn_classify_ivf" ->
      EntryMeta("2.10", "sql",
        "the classifier's 100 TB tier as RUNNABLE code"),
    "ml_classify" ->
      EntryMeta("2.10", "sql",
        "StandardScaler→LogisticRegression Pipeline, deterministic 80/20 split; the registry runs the CHECKED face"),
    "ml_eval_classification" ->
      EntryMeta("2.10", "sql",
        "per-class confusion-matrix metrics (support / predicted / tp / precision / recall / F1) over the kNN predictions"),
    "ml_linreg_trend" ->
      EntryMeta("2.10", "sql",
        "per-series least-squares trend (slope/intercept/R² of daily counts vs day index, per event_type × user cohort) via the ANSI `REGR_*` aggregates"),
    "ml_decision_stump" ->
      EntryMeta("2.10", "sql",
        "depth-1 decision tree trained entirely in the plan"),
    "ml_adaboost_stumps" ->
      EntryMeta("2.10", "sql",
        "AdaBoost over the stump's fixed decile grid: per-round best reweighted stump, weighted error, vote alpha, cumulative ensemble accuracy — the training curve as the table"),
    "ml_gbt_stumps" ->
      EntryMeta("2.10", "sql",
        "L2 gradient boosting (Friedman 2001, squared loss: gradient = residual) with regression stumps on the same decile grid, leaf means = the exact L2 argmin picked by the variance-reduction identity, shrinkage 1/2; per-round split + leaves + post-round MSE (monotone non-increasing, spec-pinned); residuals on the 1e-6 grid with exact DECIMAL sums, MSE via exact integer squares — the adaboost determinism contract"),
    "ml_cv_accuracy" ->
      EntryMeta("2.10", "sql",
        "k-fold CROSS-VALIDATION of the in-plan NB classifier WITHOUT retraining"),
    "ml_linreg_multi" ->
      EntryMeta("2.10", "sql",
        "per-group MULTIVARIATE OLS (two regressors + intercept) by normal equations"),
    "ml_target_encoding" ->
      EntryMeta("2.10", "sql",
        "leakage-safe smoothed TARGET ENCODING of a categorical"),
    "q_corr_matrix" ->
      EntryMeta("2.10", "sql",
        "pairwise Pearson correlation matrix over a measure set in ONE aggregate pass"),
  )
}
