package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Training-set preparation — the data-prep half of the reference's
  * automated training pipeline
  * (/root/reference/ml_platform/training/automated_training_pipeline.py):
  * labeled-set assembly with a derived binary target + deterministic
  * sampling (load_training_data, :137-180), per-column imputation
  * statistics (_preprocess_features, :183-205), and the Pearson
  * correlation matrix that drives interaction-feature selection
  * (_engineer_features, :207-247). The model-fitting half (optuna /
  * sklearn ensembles) is serving infrastructure, out of engine scope.
  *
  * Scale shapes: assembly is one window over the customer key + row-wise
  * expressions; imputation is two global aggregates (exact interpolated
  * median + mode with deterministic tie-break); the correlation matrix is
  * ONE pass computing all moment sums as decimal aggregates (exact,
  * partition-order-independent) — k features cost k(k+1)/2 + k + 1
  * aggregate columns, never a second scan.
  */
object TrainPrep {

  /** Labeled training-set assembly (load_training_data): per-customer
    * average order value via one window, binary target = order 1.5× above
    * the customer's average, deterministic ~25% Bernoulli sample
    * (md5-digit gate — reproducible, unlike SAMPLE), plus the polynomial /
    * log / sqrt / calendar features _engineer_features derives. */
  def trainingAssembly(orders: DataFrame): DataFrame = {
    val wC = Window.partitionBy(col("o_custkey"))
    orders
      .withColumn("cust_avg",
        (sum(col("o_totalprice").cast("decimal(18,4)")).over(wC).cast("double") /
          count(lit(1)).over(wC)))
      .withColumn("target",
        (col("o_totalprice") > col("cust_avg") * 1.5d).cast("int"))
      .filter(hexDigit("o_orderkey", 1) < 4)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        r6(col("cust_avg")).as("cust_avg"), col("target"),
        (col("o_totalprice") * col("o_totalprice")).as("tp_squared"),
        r6(log1p(col("o_totalprice"))).as("tp_log"),
        r6(sqrt(col("o_totalprice"))).as("tp_sqrt"),
        // no hour feature: o_orderdate is date-grained (hour() is the
        // constant 0 — a dead column for any trainer)
        expr("weekday(o_orderdate)").cast("int").as("day_of_week"),
        (expr("weekday(o_orderdate)") >= 5).as("is_weekend"))
      .orderBy("o_orderkey")
  }

  /** Imputation plan (_preprocess_features): numeric columns get the
    * exact interpolated median of the non-missing values, categoricals
    * the mode with a deterministic lexicographic tie-break. Missingness
    * here is injected by an md5 digit gate so the round trip is
    * oracle-checkable on complete synthetic data; on real data the CASE
    * collapses to the column itself. */
  def imputePlan(events: DataFrame): DataFrame = {
    val gated = events
      .withColumn("d", hexDigit("event_id", 1))
      .withColumn("value_n", when(col("d") === 0, lit(null)).otherwise(col("value")))
      .withColumn("type_n", when(col("d") === 1, lit(null)).otherwise(col("event_type")))
    // Median via the distributed exact-percentile device, not the
    // `percentile` aggregate (NDV-sized single-reducer buffer at scale).
    val med = graft.functions.PrefixSum.exactPercentiles(
      gated.select(col("value_n")), "value_n", Nil, Seq("med" -> 0.5)).drop("pct_n")
    val numRow = gated.agg(
        sum(when(col("value_n").isNull, 1L).otherwise(0L)).as("n_missing"))
      .crossJoin(broadcast(med))
      .select(lit("value").as("column"), lit("median").as("strategy"),
        col("n_missing"), r6(col("med")).as("fill_num"),
        lit(null).cast("string").as("fill_cat"))
    val catMissing = gated.agg(
      sum(when(col("type_n").isNull, 1L).otherwise(0L)).as("n_missing"))
    val mode = gated.filter(col("type_n").isNotNull)
      .groupBy(col("type_n")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("type_n")).limit(1)
    val catRow = mode.crossJoin(broadcast(catMissing))
      .select(lit("event_type").as("column"), lit("mode").as("strategy"),
        col("n_missing"), lit(null).cast("double").as("fill_num"),
        col("type_n").as("fill_cat"))
    numRow.unionByName(catRow).orderBy("column")
  }

  /** Balanced class weights over the document language label — the
    * sklearn `class_weight='balanced'` recipe w_c = N / (k · n_c) plus
    * the oversampling factor max(n)/n_c a resampling loader would use
    * to rebalance. One hash aggregation to class grain (k rows — the
    * broadcast-sized artifact a trainer consumes); every output double
    * is a ratio of exact integers, so engine parity is unconditional. */
  def classWeights(documents: DataFrame): DataFrame = {
    val g = documents.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val consts = g.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("k_classes"), max(col("n_docs")).as("max_n"))
    g.crossJoin(broadcast(consts))
      .select(col("lang"), col("n_docs"),
        r6(col("n_docs").cast("double") / col("n_total")).as("share"),
        r6(col("n_total").cast("double") / (col("k_classes") * col("n_docs"))).as("class_weight"),
        r6(col("max_n").cast("double") / col("n_docs")).as("oversample_factor"))
      .orderBy("lang")
  }

  /** Quantile bucketizer — the per-ROW discretization transform
    * (sklearn KBinsDiscretizer / Spark ML QuantileDiscretizer twin, but
    * exact and engine-reproducible): events.value binned into `bins`
    * equi-depth buckets. Edges come from an exact cumulative count over
    * the (value, cnt) aggregate via [[graft.functions.PrefixSum]] — a
    * two-level prefix sum whose serial term is NDV/32, not NDV (a
    * continuous column has NDV ≈ rows, so the old partition-less window
    * was one external-sort task at 100×; never an NDV-sized in-memory
    * percentile buffer either) — then 9
    * edges broadcast and the bin assigned row-locally (bin = number of
    * edges ≤ value), so the transform itself is shuffle-free. Edge k is
    * the smallest value whose cumulative count reaches ⌈k·n/bins⌉;
    * assignment by value comparison is deterministic under ties in both
    * engines, unlike ntile's arbitrary tie order. */
  def quantileBins(events: DataFrame, bins: Int = 10): DataFrame = {
    // NULL values are excluded from the edge computation (and from n):
    // Spark's window sorts NULLs first while DuckDB's sorts them last, so
    // a NULL-bearing column would shift every edge by the null count in
    // one engine only. NULL rows still appear in the output with bin 0
    // (every comparison is false) — identically in both engines.
    val ev = events.filter(col("value").isNotNull)
    // lazy pin: cumulative's eager NDV probe materializes the distinct
    // frame, so the window/subtotal branches (and the bucketed branch's
    // boundary sketch) reuse the RDD instead of re-running the event
    // scan once per consumer
    val dist = ev.groupBy(col("value")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val cum = graft.functions.PrefixSum.cumulative(dist, "value", "c")
    // total row count off the pinned NDV-scale frame — NOT another full
    // event scan (the same cheap form Vocab.bitsPerTokenBuckets uses)
    val n = dist.agg(sum(col("c")).as("n"))
    val ks = (1 until bins).map(lit(_))
    val edges = cum.crossJoin(broadcast(n))
      .select(col("value"), col("cum"), col("n"),
        explode(array(ks: _*)).as("k"))
      .filter(col("cum") >= expr(s"(k * n + ${bins - 1}) div $bins"))
      .groupBy(col("k")).agg(min(col("value")).as("e"))
    val eAggs = (1 until bins).map(k => max(when(col("k") === k, col("e"))).as(s"e$k"))
    val edgeRow = edges.agg(eAggs.head, eAggs.tail: _*)
    val bin = (1 until bins).map(k =>
      when(col("value") >= col(s"e$k"), 1).otherwise(0)).reduce(_ + _)
    events.select(col("event_id"), col("value"))
      .crossJoin(broadcast(edgeRow))
      .select(col("event_id"), col("value"), bin.cast("int").as("bin"))
      .orderBy("event_id")
  }

  /** Leakage-free target encoding of a categorical feature — leave-one-out
    * plus m-estimate smoothing (Micci-Barreca 2001; the CatBoost ordered-TS
    * family's batch ancestor): each order's priority class is encoded by
    * the mean target (o_totalprice) of every OTHER row in its class, so
    * the encoder never sees the row's own label — the leakage a plain
    * category-mean join injects and a downstream trainer can't detect.
    * `te_smooth` shrinks thin classes toward the global prior with weight
    * `m` (a 1-row class yields exactly the prior).
    *
    * Scale shape: ONE partial-aggregated shuffle to class grain (the
    * encoder table is |classes| rows, broadcast back), then a broadcast
    * join + row-local arithmetic over the fact — no window over the fact,
    * no per-row shuffle, so the encoding pass is scan-bound at 100 TB.
    * Class sums are exact DECIMAL and the own-label subtraction happens
    * in decimal too, so LOO numerators are exact integers-of-1e-4 and
    * engine parity is unconditional. */
  def targetEncode(orders: DataFrame, m: Double = 10.0): DataFrame = {
    val cat = orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_cat"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("sum_cat"))
    val glob = cat.agg(sum(col("n_cat")).as("n_all"), sum(col("sum_cat")).as("sum_all"))
    val prior = col("sum_all").cast("double") / col("n_all")
    // exact decimal: Σ_class(target) - own target, then one double division
    val looNum = (col("sum_cat") - col("o_totalprice").cast("decimal(18,4)")).cast("double")
    orders.join(broadcast(cat), "o_orderpriority").crossJoin(broadcast(glob))
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"), col("n_cat"),
        r6(prior).as("prior"),
        r6(when(col("n_cat") > 1, looNum / (col("n_cat") - 1))).as("loo_enc"),
        r6((looNum + lit(m) * prior) / (col("n_cat") - 1 + lit(m))).as("te_smooth"))
      .orderBy("o_orderkey")
  }

  /** Temporal train/test split with an embargo gap — the purged split of
    * time-series cross-validation (Lopez de Prado 2018, ch. 7): the cut
    * sits at `trainFrac` of the [min_ts, max_ts] span, test starts
    * `embargoHours` after it, and rows inside the gap are quarantined as
    * 'embargo' so a label horizon reaching across the cut can't leak
    * future into train. The third split device beside the hash split
    * (q_train_eval_split) and the group split (q_group_split) — this one
    * guards TEMPORAL leakage, which neither of those sees.
    *
    * Scale shape: one tiny min/max aggregate broadcast back; assignment
    * is row-local (the fact is never shuffled), and all boundary
    * arithmetic is integer epoch seconds, so the cut is bit-identical in
    * any engine and under any partitioning. */
  def timeSplitEmbargo(events: DataFrame, trainFrac: Double = 0.7,
                       embargoHours: Int = 24): DataFrame = {
    val span = events.agg(
      min(epochS(col("ts"))).as("mn"), max(epochS(col("ts"))).as("mx"))
    events.crossJoin(broadcast(span))
      .withColumn("ts_s", epochS(col("ts")))
      .withColumn("cut_s",
        col("mn") + floor(lit(trainFrac) * (col("mx") - col("mn"))).cast("long"))
      .select(col("event_id"), col("user_id"), col("ts_s"),
        when(col("ts_s") <= col("cut_s"), lit("train"))
          .when(col("ts_s") >= col("cut_s") + lit(embargoHours * 3600L), lit("test"))
          .otherwise(lit("embargo")).as("split"))
      .orderBy("event_id")
  }

  private val corrFeats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Pearson correlation matrix over the fact's numeric features — the
    * statistic _engineer_features ranks (corr().abs().sum().nlargest) to
    * pick interaction candidates. All moment sums (Σx, Σx², Σxy) are
    * decimal aggregates in ONE scan; r is assembled in double arithmetic
    * mirrored expression-for-expression by the oracle. */
  def featureCorr(lineitem: DataFrame): DataFrame = {
    // Exact order-independent moment sums WITHOUT decimal aggregation
    // (the decimal form allocated a Decimal per term — ~0.2 s per
    // aggregate on a single-row-group scan). Two passes:
    //
    //  1. max|x| per feature (narrow columnar agg), turned into a
    //     POWER-OF-TWO scale 2^-ceil(log2(max|x|)) per feature. Pearson r
    //     is invariant under positive per-feature scaling, and scaling a
    //     double by a power of two is EXACT — this bounds every product
    //     term into (-1, 1] regardless of raw magnitudes.
    //  2. each scaled term T splits into hi = floor(T) (∈ {-1, 0, 1})
    //     and lo = floor(frac(T)·2^20), both summed as primitive longs
    //     (codegen'd adds). Recombined hi + lo/2^20, every double op
    //     mirrored by the oracle.
    //
    // Long capacity: |hi| ≤ N and lo ≤ N·2^20 → exact to ~9e12 rows (a
    // 100 TB fact), with 2^-20 per-term floor granularity — identical in
    // both engines, so cross-engine parity is unconditional.
    val S = "1048576.0" // 2^20
    val maAggs = corrFeats.zipWithIndex.map { case (f, i) =>
      max(abs(col(f).cast("double"))).as(s"ma_$i") }
    val scales = lineitem.agg(maAggs.head, maAggs.tail: _*)
      .select(corrFeats.indices.map(i =>
        expr(s"power(2.0d, -ceil(log2(greatest(ma_$i, 1e-300d))))").as(s"sc_$i")): _*)
    def term(i: Int, j: Int): String =
      s"(cast(${corrFeats(i)} as double) * sc_$i * (cast(${corrFeats(j)} as double) * sc_$j))"
    def hiLo(nm: String, t: String): Seq[Column] = Seq(
      sum(expr(s"cast(floor($t) as bigint)")).as(s"${nm}_hi"),
      sum(expr(s"cast(floor(($t - floor($t)) * $S) as bigint)")).as(s"${nm}_lo"))
    def recomb(nm: String): Column =
      (col(s"${nm}_hi").cast("double") + col(s"${nm}_lo").cast("double") / expr(S)).as(nm)
    val sumAggs =
      Seq(count(lit(1)).as("n0")) ++
      corrFeats.zipWithIndex.flatMap { case (f, i) =>
        hiLo(s"s_$i", s"(cast($f as double) * sc_$i)") } ++
      corrFeats.zipWithIndex.flatMap { case (f, i) => hiLo(s"ss_$i", term(i, i)) } ++
      (for { i <- corrFeats.indices; j <- corrFeats.indices if i < j } yield
        hiLo(s"sp_${i}_$j", term(i, j))).flatten
    val sums = lineitem.crossJoin(broadcast(scales))
      .agg(sumAggs.head, sumAggs.tail: _*)
      .select(
        Seq(col("n0").cast("double").as("n")) ++
        corrFeats.indices.map(i => recomb(s"s_$i")) ++
        corrFeats.indices.map(i => recomb(s"ss_$i")) ++
        (for { i <- corrFeats.indices; j <- corrFeats.indices if i < j }
          yield recomb(s"sp_${i}_$j")): _*)
    // each n²·Var factor clamped at 0 (a constant column can leave it
    // fractionally negative in doubles — DuckDB's sqrt would raise where
    // Spark yields NaN), and try_divide so a degenerate zero denominator
    // is NULL on both engines; bit-identical whenever both factors > 0
    def vfac(i: Int): String =
      s"(CASE WHEN n * ss_$i - s_$i * s_$i < 0 THEN CAST(0 AS DOUBLE) " +
        s"ELSE n * ss_$i - s_$i * s_$i END)"
    def r(i: Int, j: Int): Column = expr(
      s"try_divide(n * sp_${i}_$j - s_$i * s_$j, " +
        s"sqrt(${vfac(i)} * ${vfac(j)}))")
    val idx = for { i <- corrFeats.indices; j <- corrFeats.indices if i < j } yield (i, j)
    // Two-step unpivot: materialize each r as a named scalar COLUMN first,
    // then explode structs that reference only those attributes. Inlining
    // the full r6(r(i,j)) expressions into the explode's array literal
    // made the Generate stage's generated code explode combinatorially —
    // janino spent ~3.5 s compiling it (per fresh plan), dwarfing the
    // actual scan. (No orderBy either: the array order is deterministic.)
    val pairs = idx.map { case (i, j) =>
      struct(lit(corrFeats(i)).as("feature_a"), lit(corrFeats(j)).as("feature_b"),
        col(s"r_${i}_$j").as("pearson_r"))
    }
    sums
      .select(idx.map { case (i, j) => r6(r(i, j)).as(s"r_${i}_$j") }: _*)
      .select(explode(array(pairs: _*)).as("s"))
      .select(col("s.feature_a").as("feature_a"), col("s.feature_b").as("feature_b"),
        col("s.pearson_r").as("pearson_r"))
  }

  /** The (doc_id, y, x1, x2) design frame shared by [[linregFit]] /
    * [[linregScore]]: a document "length model" — predict byte length
    * (`n_chars`) from token count and distinct-token count. The model is
    * a stand-in for any cheap linear fit over corpus features (compute
    * budgeting, quality priors); the OPERATOR is the point: how a linear
    * model trains on 100 TB. */
  private def linregDesign(documents: DataFrame): DataFrame =
    // NULL text must drop, not poison the moments: Spark's size(NULL)
    // is -1 while the oracle's len(NULL) is NULL-skipped by SUM — the
    // cross-engine divergence class the SCD2 oracle hardening closed
    graft.text.TextPrep.withWords(documents.filter(col("text").isNotNull))
      .select(col("doc_id"), col("n_chars").as("y"),
        size(col("words")).cast("long").as("x1"),
        size(array_distinct(col("words"))).cast("long").as("x2"))

  /** One-row sufficient statistics + closed-form OLS solve.
    *
    * This is the canonical distributed-training shape for linear models:
    * ONE partial-aggregated pass computes the normal-equation moments
    * X'X / X'y (10 sums for 2 features + intercept), and the p×p solve is
    * O(p³) on a one-row frame — the corpus is never iterated, shuffled on,
    * or broadcast. Determinism contract: every moment is an EXACT decimal
    * sum of integer row terms (each factor cast to DECIMAL(18,0) before
    * the multiply, so products are exact decimals, overflow-proof, and
    * partition-order-independent); the solve then runs in IEEE double via
    * Cramer's rule written with the identical expression tree the DuckDB
    * oracle uses, so both engines round identically at every step. */
  private def linregBetas(documents: DataFrame): DataFrame = {
    def d0(c: Column) = c.cast("decimal(18,0)")
    def ds(c: Column) = sum(c).cast("double")
    val s = linregDesign(documents).agg(
      count(lit(1)).cast("double").as("n"),
      ds(d0(col("x1"))).as("s1"), ds(d0(col("x2"))).as("s2"),
      ds(d0(col("y"))).as("sy"),
      ds(d0(col("x1")) * d0(col("x1"))).as("s11"),
      ds(d0(col("x1")) * d0(col("x2"))).as("s12"),
      ds(d0(col("x2")) * d0(col("x2"))).as("s22"),
      ds(d0(col("x1")) * d0(col("y"))).as("s1y"),
      ds(d0(col("x2")) * d0(col("y"))).as("s2y"),
      ds(d0(col("y")) * d0(col("y"))).as("syy"))
    // SINGULAR normal equations (degenerate corpus: too few rows or
    // linearly dependent features) must yield NULL coefficients, not an
    // ANSI DIVIDE_BY_ZERO abort: a zero determinant becomes a NULL
    // divisor, which NULL-propagates through every β
    def nz(c: Column) = when(c =!= 0.0, c)
    s.withColumn("det",
        nz(col("n") * (col("s11") * col("s22") - col("s12") * col("s12"))
          - col("s1") * (col("s1") * col("s22") - col("s12") * col("s2"))
          + col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))))
      .withColumn("b0",
        (col("sy") * (col("s11") * col("s22") - col("s12") * col("s12"))
          - col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
          + col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))) / col("det"))
      .withColumn("b1",
        (col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
          - col("sy") * (col("s1") * col("s22") - col("s12") * col("s2"))
          + col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))) / col("det"))
      .withColumn("b2",
        (col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12"))
          - col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
          + col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))) / col("det"))
  }

  /** Distributed OLS fit — one row: n, coefficients, R². R² derives from
    * the same sufficient statistics via the normal-equation identity
    * SSE = y'y − β'X'y, so the fit metric costs zero additional passes. */
  def linregFit(documents: DataFrame): DataFrame =
    linregBetas(documents).select(
      col("n").cast("long").as("n"),
      r6(col("b0")).as("b0"), r6(col("b1")).as("b1"), r6(col("b2")).as("b2"),
      // a zero SST (constant y / single row) NULLs R² the same way a
      // singular det NULLs the betas
      r6(lit(1d) -
        (col("syy") - col("b0") * col("sy") - col("b1") * col("s1y") - col("b2") * col("s2y")) /
          when(col("syy") - col("sy") * col("sy") / col("n") =!= 0.0,
            col("syy") - col("sy") * col("sy") / col("n"))).as("r2_score"))

  /** Model application: the fitted one-row β is BROADCAST onto the corpus
    * and scoring is row-local arithmetic — the train-once/score-everywhere
    * split. At 100 TB the β row is the only thing that moves. */
  def linregScore(documents: DataFrame): DataFrame = {
    val b = linregBetas(documents).select("b0", "b1", "b2")
    linregDesign(documents).crossJoin(broadcast(b))
      .select(col("doc_id"), col("x1"), col("x2"), col("y"),
        r6(col("b0") + col("b1") * col("x1") + col("b2") * col("x2")).as("y_hat"),
        r6(col("y") - (col("b0") + col("b1") * col("x1") + col("b2") * col("x2"))).as("residual"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_linreg_fit" -> ((s, d) => linregFit(Tables.documents(s, d))),
    "q_linreg_score" -> ((s, d) => linregScore(Tables.documents(s, d))),
    "q_train_assembly" -> ((s, d) => trainingAssembly(Tables.orders(s, d))),
    "q_impute" -> ((s, d) => imputePlan(Tables.events(s, d))),
    "q_feature_corr" -> ((s, d) => featureCorr(Tables.lineitem(s, d))),
    "q_class_weights" -> ((s, d) => classWeights(Tables.documents(s, d))),
    "q_quantile_bins" -> ((s, d) => quantileBins(Tables.events(s, d))),
    "q_target_encode" -> ((s, d) => targetEncode(Tables.orders(s, d))),
    "q_time_split_embargo" -> ((s, d) => timeSplitEmbargo(Tables.events(s, d)))
  )

  /** Shared oracle CTE: design frame → exact HUGEINT moments → doubles →
    * Cramer solve, the identical expression tree [[linregBetas]] builds. */
  private val linregB: String =
    """WITH w AS (SELECT doc_id, n_chars,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
         FROM documents WHERE text IS NOT NULL),
       f AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS y,
           CAST(len(words) AS BIGINT) AS x1,
           CAST(len(list_distinct(words)) AS BIGINT) AS x2
         FROM w),
       s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
           CAST(SUM(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
           CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
           CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
           CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
           CAST(SUM(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
           CAST(SUM(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
           CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
         FROM f),
       dt AS (SELECT *,
           n * (s11 * s22 - s12 * s12)
             - s1 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s12 - s11 * s2) AS det
         FROM s),
       b AS (SELECT n, sy, s1y, s2y, syy,
           (sy * (s11 * s22 - s12 * s12)
             - s1 * (s1y * s22 - s12 * s2y)
             + s2 * (s1y * s12 - s11 * s2y)) / NULLIF(det, 0) AS b0,
           (n * (s1y * s22 - s12 * s2y)
             - sy * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s2y - s1y * s2)) / NULLIF(det, 0) AS b1,
           (n * (s11 * s2y - s1y * s12)
             - s1 * (s1 * s2y - s1y * s2)
             + sy * (s1 * s12 - s11 * s2)) / NULLIF(det, 0) AS b2
         FROM dt)"""

  val oracles: Map[String, String] = Map(
    "q_linreg_fit" ->
      s"""$linregB
         SELECT CAST(n AS BIGINT) AS n,
           ${sqlR("b0", 6)} AS b0, ${sqlR("b1", 6)} AS b1, ${sqlR("b2", 6)} AS b2,
           ${sqlR("1 - (syy - b0 * sy - b1 * s1y - b2 * s2y) / NULLIF(syy - sy * sy / n, 0)", 6)} AS r2_score
         FROM b""",
    "q_linreg_score" ->
      s"""$linregB
         SELECT f.doc_id, f.x1, f.x2, f.y,
           ${sqlR("b.b0 + b.b1 * f.x1 + b.b2 * f.x2", 6)} AS y_hat,
           ${sqlR("f.y - (b.b0 + b.b1 * f.x1 + b.b2 * f.x2)", 6)} AS residual
         FROM f, b ORDER BY f.doc_id""",
    "q_train_assembly" ->
      s"""WITH a AS (
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
           FROM orders),
         f AS (SELECT * FROM a
           WHERE instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 < 4)
         SELECT o_orderkey, o_custkey, o_totalprice,
           ${sqlR("cust_avg", 6)} AS cust_avg,
           CAST(o_totalprice > cust_avg * 1.5 AS INT) AS target,
           o_totalprice * o_totalprice AS tp_squared,
           ${sqlR("ln(1 + o_totalprice)", 6)} AS tp_log,
           ${sqlR("sqrt(o_totalprice)", 6)} AS tp_sqrt,
           CAST(isodow(o_orderdate) - 1 AS INT) AS day_of_week,
           isodow(o_orderdate) - 1 >= 5 AS is_weekend
         FROM f ORDER BY o_orderkey""",
    "q_impute" ->
      s"""WITH g AS (
           SELECT *,
             instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1 AS d
           FROM events),
         gg AS (SELECT
             CASE WHEN d = 0 THEN NULL ELSE value END AS value_n,
             CASE WHEN d = 1 THEN NULL ELSE event_type END AS type_n
           FROM g),
         num AS (SELECT 'value' AS "column", 'median' AS strategy,
             CAST(SUM(CASE WHEN value_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
             ${sqlR("median(value_n)", 6)} AS fill_num,
             CAST(NULL AS VARCHAR) AS fill_cat
           FROM gg),
         cm AS (SELECT CAST(SUM(CASE WHEN type_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing FROM gg),
         md AS (SELECT type_n, COUNT(*) AS c FROM gg WHERE type_n IS NOT NULL
           GROUP BY type_n ORDER BY c DESC, type_n LIMIT 1),
         cat AS (SELECT 'event_type' AS "column", 'mode' AS strategy, cm.n_missing,
             CAST(NULL AS DOUBLE) AS fill_num, md.type_n AS fill_cat
           FROM md, cm)
         SELECT * FROM num UNION ALL SELECT * FROM cat ORDER BY "column"""",
    "q_feature_corr" -> {
      val fs = corrFeats
      val S = "1048576.0"
      def hiLoSql(nm: String, t: String): Seq[String] = Seq(
        s"CAST(SUM(CAST(FLOOR($t) AS BIGINT)) AS BIGINT) AS ${nm}_hi",
        s"CAST(SUM(CAST(FLOOR(($t - FLOOR($t)) * $S) AS BIGINT)) AS BIGINT) AS ${nm}_lo")
      def tSql(i: Int, j: Int): String =
        s"(CAST(${fs(i)} AS DOUBLE) * sc_$i * (CAST(${fs(j)} AS DOUBLE) * sc_$j))"
      val scSql = fs.zipWithIndex.map { case (f, i) =>
        s"power(2.0, -ceil(log2(greatest((SELECT MAX(ABS(CAST($f AS DOUBLE))) FROM lineitem), 1e-300)))) AS sc_$i"
      }.mkString(", ")
      val sumsSql =
        Seq("CAST(COUNT(*) AS DOUBLE) AS n") ++
        fs.zipWithIndex.flatMap { case (f, i) =>
          hiLoSql(s"s_$i", s"(CAST($f AS DOUBLE) * sc_$i)") } ++
        fs.indices.flatMap(i => hiLoSql(s"ss_$i", tSql(i, i))) ++
        (for { i <- fs.indices; j <- fs.indices if i < j } yield
          hiLoSql(s"sp_${i}_$j", tSql(i, j))).flatten
      def rc(nm: String): String =
        s"(CAST(${nm}_hi AS DOUBLE) + CAST(${nm}_lo AS DOUBLE) / $S)"
      // same clamped-factor shape as the Spark side's vfac
      def vfacSql(i: Int): String = {
        val f = s"n * ${rc(s"ss_$i")} - ${rc(s"s_$i")} * ${rc(s"s_$i")}"
        s"(CASE WHEN $f < 0 THEN CAST(0 AS DOUBLE) ELSE $f END)"
      }
      def rSql(i: Int, j: Int): String =
        s"(n * ${rc(s"sp_${i}_$j")} - ${rc(s"s_$i")} * ${rc(s"s_$j")}) / " +
          s"sqrt(${vfacSql(i)} * ${vfacSql(j)})"
      val pairRows = (for { i <- fs.indices; j <- fs.indices if i < j } yield
        s"SELECT '${fs(i)}' AS feature_a, '${fs(j)}' AS feature_b, ${sqlR(rSql(i, j), 6)} AS pearson_r FROM m")
        .mkString(" UNION ALL ")
      s"""WITH sc AS (SELECT $scSql),
         m AS (SELECT ${sumsSql.mkString(", ")} FROM lineitem, sc)
         SELECT * FROM ($pairRows) ORDER BY feature_a, feature_b"""
    },
    "q_class_weights" ->
      s"""WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
         k AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS k_classes,
             CAST(MAX(n_docs) AS BIGINT) AS max_n FROM g)
         SELECT lang, n_docs,
           ${sqlR("CAST(n_docs AS DOUBLE) / n_total", 6)} AS share,
           ${sqlR("CAST(n_total AS DOUBLE) / (k_classes * n_docs)", 6)} AS class_weight,
           ${sqlR("CAST(max_n AS DOUBLE) / n_docs", 6)} AS oversample_factor
         FROM g, k ORDER BY lang""",
    "q_target_encode" ->
      s"""WITH cat AS (SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_cat,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_cat
           FROM orders GROUP BY 1),
         g AS (SELECT CAST(SUM(n_cat) AS BIGINT) AS n_all, SUM(sum_cat) AS sum_all FROM cat),
         e AS (SELECT o_orderkey, o.o_orderpriority, o_totalprice, n_cat,
             CAST(sum_all AS DOUBLE) / n_all AS prior,
             CAST(sum_cat - CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS loo_num
           FROM orders o JOIN cat ON o.o_orderpriority = cat.o_orderpriority, g)
         SELECT o_orderkey, o_orderpriority, o_totalprice, n_cat,
           ${sqlR("prior", 6)} AS prior,
           ${sqlR("CASE WHEN n_cat > 1 THEN loo_num / (n_cat - 1) END", 6)} AS loo_enc,
           ${sqlR("(loo_num + 10.0 * prior) / (n_cat - 1 + 10.0)", 6)} AS te_smooth
         FROM e ORDER BY o_orderkey""",
    "q_time_split_embargo" ->
      s"""WITH s AS (SELECT
             MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS mn,
             MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS mx
           FROM events),
         b AS (SELECT mn + CAST(FLOOR(CAST(0.7 AS DOUBLE) * (mx - mn)) AS BIGINT) AS cut_s FROM s),
         e AS (SELECT event_id, user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s, cut_s
           FROM events, b)
         SELECT event_id, user_id, ts_s,
           CASE WHEN ts_s <= cut_s THEN 'train'
                WHEN ts_s >= cut_s + 86400 THEN 'test'
                ELSE 'embargo' END AS split
         FROM e ORDER BY event_id""",
    "q_quantile_bins" -> {
      val binSql = (1 to 9).map(k =>
        s"CASE WHEN value >= e$k THEN 1 ELSE 0 END").mkString(" + ")
      val edgeCols = (1 to 9).map(k =>
        s"MAX(CASE WHEN k = $k THEN e END) AS e$k").mkString(", ")
      s"""WITH vc AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS c FROM events
                WHERE value IS NOT NULL GROUP BY 1),
         cum AS (SELECT value, CAST(SUM(c) OVER (ORDER BY value) AS BIGINT) AS cum FROM vc),
         nn AS (SELECT CAST(COUNT(value) AS BIGINT) AS n FROM events),
         ks AS (SELECT k FROM generate_series(1, 9) t(k)),
         ed AS (SELECT k, MIN(value) AS e FROM cum, ks, nn
                WHERE cum >= (k * n + 9) // 10 GROUP BY k),
         er AS (SELECT $edgeCols FROM ed)
         SELECT event_id, value, CAST($binSql AS INT) AS bin
         FROM events, er ORDER BY event_id"""
    }
  )
}
