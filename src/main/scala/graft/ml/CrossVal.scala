package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Model-evaluation marts the reference's training pipeline computes
  * around its ensemble: k-fold cross-validation scores and
  * robustness-under-perturbation — re-expressed as deterministic
  * Spark scans over the same mock-ensemble twins [[Inference]] scores
  * with.
  *
  * Re-expresses /root/reference/ml_platform/training/
  * automated_training_pipeline.py:
  *   - cvMetrics: `_cross_validate_ensemble` (686-694; StratifiedKFold
  *     `cv_folds`=5, scoring='accuracy', cv mean/std reported) widened
  *     to the per-fold metric row `_calculate_metrics` (696-708)
  *     produces — accuracy + weighted precision/recall/F1.
  *   - modelRobustness: `_test_model_robustness` (822-873) — re-score
  *     under additive feature noise at levels 0.01/0.05/0.1 and report
  *     the accuracy-drop profile per model.
  *
  * Determinism twins: the fold id and the per-feature noise sign come
  * from md5 digits of the order key (the engine's standard replay-safe
  * substitute for `random_state`/`np.random.normal`), so both marts are
  * oracle-checkable in DuckDB.
  *
  * Scale shape — both marts are one full scan plus broadcast-sized
  * artifacts:
  *   - cvMetrics: ONE aggregation to per-fold moment sums (k rows);
  *     each fold's TRAIN scaler is global-minus-own-fold in exact
  *     decimals (no second pass over the data, no per-fold re-scan —
  *     the trick that makes k-fold cost one pass instead of k); scoring
  *     joins the k-row artifact broadcast, confusion counts partial-
  *     aggregate to k rows.
  *   - modelRobustness: the clean one-row scaler broadcast, noise
  *     applied row-locally in z-space (adding u·level·sd to a feature
  *     and re-standardizing IS adding u·level to its z — one algebraic
  *     form, mirrored verbatim in the oracle), all model × level
  *     correctness flags counted in ONE aggregate; the 12-row output
  *     unpivots from that single row.
  */
object CrossVal {

  /** Noise levels and degradation threshold of `_test_model_robustness`
    * (automated_training_pipeline.py:822-873) — the SINGLE source both
    * [[modelRobustness]] and its oracle SQL derive from, so changing a
    * default can never desync query and oracle. */
  val DefaultNoiseLevels: Seq[Double] = Seq(0.01, 0.05, 0.1)
  val DefaultDropThreshold: Double = 0.05

  private def safeDiv(num: Column, den: Column): Column =
    ConfusionMetrics.safeDiv(num, den)

  /** Weighted (accuracy, precision, recall, F1) from confusion counts —
    * the shared [[ConfusionMetrics]] device (sklearn's
    * `average='weighted'`, the shape `_calculate_metrics` reports). */
  private def weightedMetrics(tp0: Column, fp0: Column, tn0: Column, fn0: Column)
      : (Column, Column, Column, Column) =
    ConfusionMetrics.weighted(tp0, fp0, tn0, fn0)

  /** 5-fold CV of the mock ensemble over orders. Fold = md5 digit of the
    * order key mod `folds`; each fold is scored with the scaler fitted
    * on the OTHER folds (train moments = exact global decimals minus the
    * fold's own — leakage-free, one data pass). Label: high-priority
    * order (priority digit ≤ 2, the [[Inference.calibrationBins]]
    * outcome). Emits one row per fold plus the cv mean/std columns the
    * reference logs (np.mean / population np.std over fold accuracies,
    * summed through exact decimals of the rounded per-fold values). */
  def cvMetrics(orders: DataFrame, folds: Int = 5): DataFrame = {
    val feats = Inference.features(orders)
      .withColumn("fold", (hexDigit("o_orderkey", 1) % folds).cast("int"))
      .withColumn("actual", col("f2") <= 2.0d)
    val perFold = feats.groupBy(col("fold")).agg(
      count(lit(1)).as("fn"),
      sum(col("f1").cast("decimal(18,4)")).as("d1_1"),
      sum((col("f1") * col("f1")).cast("decimal(30,8)")).as("d2_1"),
      sum(col("f2").cast("decimal(18,4)")).as("d1_2"),
      sum((col("f2") * col("f2")).cast("decimal(30,8)")).as("d2_2"),
      sum(col("f3").cast("decimal(18,4)")).as("d1_3"),
      sum((col("f3") * col("f3")).cast("decimal(30,8)")).as("d2_3"))
    val glob = perFold.agg(
      sum(col("fn")).as("gn"),
      sum(col("d1_1")).as("g1_1"), sum(col("d2_1")).as("g2_1"),
      sum(col("d1_2")).as("g1_2"), sum(col("d2_2")).as("g2_2"),
      sum(col("d1_3")).as("g1_3"), sum(col("d2_3")).as("g2_3"))
    // TRAIN moments per fold: global minus own fold, all in decimals —
    // exact, so "fit on the other k-1 folds" costs zero extra passes
    val train = Inference.withScaler(perFold.crossJoin(broadcast(glob)).select(
      col("fold"),
      (col("gn") - col("fn")).cast("double").as("n"),
      (col("g1_1") - col("d1_1")).cast("double").as("s1_1"),
      (col("g2_1") - col("d2_1")).cast("double").as("s2_1"),
      (col("g1_2") - col("d1_2")).cast("double").as("s1_2"),
      (col("g2_2") - col("d2_2")).cast("double").as("s2_2"),
      (col("g1_3") - col("d1_3")).cast("double").as("s1_3"),
      (col("g2_3") - col("d2_3")).cast("double").as("s2_3")))
    def z(i: Int): Column = Inference.zMoment(i)
    val scored = feats.join(broadcast(train), "fold")
      .withColumn("p_ens",
        Inference.ensembleProbs(z(1), z(2), z(3))("ens"))
      .withColumn("pred", col("p_ens") > 0.5d)
    val conf = scored.groupBy(col("fold")).agg(
      count(lit(1)).as("n_test"),
      sum(when(col("actual") && col("pred"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("actual") && col("pred"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("actual") && !col("pred"), 1L).otherwise(0L)).as("tn"),
      sum(when(col("actual") && !col("pred"), 1L).otherwise(0L)).as("fn"))
    val (acc, prec, rec, f1) =
      weightedMetrics(col("tp"), col("fp"), col("tn"), col("fn"))
    val folded = conf.select(
      col("fold"), col("n_test"),
      r6(acc).as("accuracy"), r6(prec).as("precision_w"),
      r6(rec).as("recall_w"), r6(f1).as("f1_w"))
    // cv mean/std over the ROUNDED fold accuracies through exact
    // decimals — partition-order-proof in both engines
    val roll = folded.agg(
      count(lit(1)).as("k"),
      sum(col("accuracy").cast("decimal(18,8)")).as("sa"),
      sum((col("accuracy") * col("accuracy")).cast("decimal(30,16)")).as("sa2"))
    val cvMean = col("sa").cast("double") / col("k")
    // Clamp the variance at 0: (near-)identical fold accuracies can make
    // the difference a fractionally negative double, where Spark's sqrt
    // returns NaN but DuckDB's RAISES — the oracle run would crash
    // instead of comparing. Mirrored with GREATEST(0.0, ...) in the SQL.
    val cvStd = sqrt(greatest(lit(0d),
      col("sa2").cast("double") / col("k") - cvMean * cvMean))
    folded.crossJoin(broadcast(roll))
      .select(col("fold"), col("n_test"), col("accuracy"),
        col("precision_w"), col("recall_w"), col("f1_w"),
        r6(cvMean).as("cv_mean_accuracy"), r6(cvStd).as("cv_std_accuracy"))
      .orderBy("fold")
  }

  /** Robustness-under-noise profile of the model twins. Deterministic
    * noise: per-feature md5 digits (positions 1-3) mapped to
    * u ∈ [-1, 1]; a level ℓ perturbs feature i by u_i·ℓ·sd_i, which in
    * z-space is exactly z_i + u_i·ℓ (the scaler is the clean-fit one,
    * as in the reference where the pipeline's scaler was fitted before
    * the perturbation). One scan counts clean + noisy correctness for
    * every model × level; the output unpivots 12 rows from that single
    * aggregate row. `degraded` flags an accuracy drop past
    * `dropThreshold` (0.05 — five accuracy points). */
  def modelRobustness(orders: DataFrame,
                      levels: Seq[Double] = DefaultNoiseLevels,
                      dropThreshold: Double = DefaultDropThreshold): DataFrame = {
    val models = Seq("ens", "nn", "rf", "xgb")
    val feats = Inference.features(orders)
      .withColumn("actual", col("f2") <= 2.0d)
      .withColumn("u1", (hexDigit("o_orderkey", 1) - 7.5d) / 7.5d)
      .withColumn("u2", (hexDigit("o_orderkey", 2) - 7.5d) / 7.5d)
      .withColumn("u3", (hexDigit("o_orderkey", 3) - 7.5d) / 7.5d)
    val j = feats.crossJoin(broadcast(Inference.fitMoments(orders)))
    def z(i: Int): Column = Inference.zMoment(i)
    val clean = Inference.ensembleProbs(z(1), z(2), z(3))
    // Column keys by level INDEX, not a rounded label: two non-default
    // levels that round alike (0.015 and 0.02) must not collide into one
    // duplicate aggregate alias.
    val aggs =
      models.map(m => sum(when((clean(m) > 0.5d) === col("actual"), 1L)
        .otherwise(0L)).as(s"cc_$m")) ++
      levels.zipWithIndex.flatMap { case (l, i) =>
        val noisy = Inference.ensembleProbs(
          z(1) + col("u1") * lit(l), z(2) + col("u2") * lit(l), z(3) + col("u3") * lit(l))
        models.map(m => sum(when((noisy(m) > 0.5d) === col("actual"), 1L)
          .otherwise(0L)).as(s"nc_${m}_l$i"))
      } :+ count(lit(1)).as("n_rows")
    val counts = j.agg(aggs.head, aggs.tail: _*)
    val rows = for (m <- models; (l, i) <- levels.zipWithIndex) yield {
      val base = col(s"cc_$m").cast("double") / col("n_rows")
      val acc = col(s"nc_${m}_l$i").cast("double") / col("n_rows")
      counts.select(
        lit(m).as("model"), lit(l).as("noise_level"), col("n_rows"),
        r6(base).as("baseline_accuracy"), r6(acc).as("accuracy"),
        r6(base - acc).as("accuracy_drop"),
        (base - acc > dropThreshold).as("degraded"))
    }
    rows.reduce(_.unionByName(_)).orderBy("model", "noise_level")
  }

  /** The other half of `_test_model_robustness` (822-851): replace each
    * feature with its (r6-rounded exact) median and re-score every
    * model — the degradation profile that tells an operator which
    * features a model actually leans on. In z-space the replacement is
    * one broadcast constant per feature, z_med_i = (m_i − mean_i)/sd_i,
    * so the whole 4-model × 3-feature grid still costs ONE scan; the
    * three medians come from a single grouped
    * [[graft.functions.PrefixSum.exactPercentiles]] pass over the
    * melted feature stream (never a per-feature percentile buffer). */
  def missingFeatureImpact(orders: DataFrame): DataFrame = {
    val models = Seq("ens", "nn", "rf", "xgb")
    val feats = Inference.features(orders)
      .withColumn("actual", col("f2") <= 2.0d)
    val melted = feats.select(explode(array(
      struct(lit("f1").as("f"), col("f1").as("v")),
      struct(lit("f2").as("f"), col("f2").as("v")),
      struct(lit("f3").as("f"), col("f3").as("v")))).as("s"))
      .select(col("s.f").as("f"), col("s.v").as("v"))
    val meds = graft.functions.PrefixSum.exactPercentiles(
      melted, "v", Seq("f"), Seq("med" -> 0.5))
    // r6 the medians BEFORE use: DuckDB's median() interpolation agrees
    // with Spark's Percentile to well past 1e-6 (q_impute's oracle
    // proves it on this data), and rounding both sides makes every
    // downstream z and prediction bit-identical by construction.
    val medRow = meds.agg(
      max(when(col("f") === "f1", r6(col("med")))).as("m1"),
      max(when(col("f") === "f2", r6(col("med")))).as("m2"),
      max(when(col("f") === "f3", r6(col("med")))).as("m3"))
    val j = feats
      .crossJoin(broadcast(Inference.fitMoments(orders)))
      .crossJoin(broadcast(medRow))
    def z(i: Int): Column = Inference.zMoment(i)
    def zMed(i: Int): Column = Inference.zOf(col(s"m$i"), i)
    val clean = Inference.ensembleProbs(z(1), z(2), z(3))
    val replaced = Map(
      "f1" -> Inference.ensembleProbs(zMed(1), z(2), z(3)),
      "f2" -> Inference.ensembleProbs(z(1), zMed(2), z(3)),
      "f3" -> Inference.ensembleProbs(z(1), z(2), zMed(3)))
    val aggs =
      models.map(m => sum(when((clean(m) > 0.5d) === col("actual"), 1L)
        .otherwise(0L)).as(s"cc_$m")) ++
      replaced.toSeq.sortBy(_._1).flatMap { case (f, ps) =>
        models.map(m => sum(when((ps(m) > 0.5d) === col("actual"), 1L)
          .otherwise(0L)).as(s"mc_${m}_$f"))
      } :+ count(lit(1)).as("n_rows")
    val counts = j.agg(aggs.head, aggs.tail: _*)
    val rows = for (m <- models; f <- Seq("f1", "f2", "f3")) yield {
      val base = col(s"cc_$m").cast("double") / col("n_rows")
      val acc = col(s"mc_${m}_$f").cast("double") / col("n_rows")
      counts.select(
        lit(m).as("model"), lit(f).as("missing_feature"), col("n_rows"),
        r6(base).as("baseline_accuracy"), r6(acc).as("accuracy"),
        r6(base - acc).as("accuracy_drop"))
    }
    rows.reduce(_.unionByName(_)).orderBy("model", "missing_feature")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cv_metrics" -> ((s, d) => cvMetrics(Tables.orders(s, d))),
    "q_model_robustness" -> ((s, d) => modelRobustness(Tables.orders(s, d))),
    "q_missing_feature_impact" -> ((s, d) => missingFeatureImpact(Tables.orders(s, d)))
  )

  /** Shared oracle fragment: features + fold + md5 noise digits. */
  private val featSql: String =
    """raw AS (
         SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS f1,
           CAST(substr(o_orderpriority, 1, 1) AS DOUBLE) AS f2,
           CAST(isodow(o_orderdate) - 1 AS DOUBLE) AS f3,
           CAST(substr(o_orderpriority, 1, 1) AS DOUBLE) <= 2 AS actual,
           (instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) AS h1,
           (instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1) AS h2,
           (instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 1)) - 1) AS h3
         FROM orders)"""

  private def pSql(z1: String, z2: String, z3: String): (String, String, String) = (
    s"1.0/(1.0 + exp(-(0.8*($z1) + 0.4*($z2) - 0.2*($z3))))",
    s"""((CASE WHEN ($z1) > 0 THEN 1.0 ELSE 0.0 END) +
        (CASE WHEN ($z2) > 0.5 THEN 1.0 ELSE 0.0 END) +
        (CASE WHEN ($z3) < 0 THEN 1.0 ELSE 0.0 END)) / 3.0""",
    s"""1.0/(1.0 + exp(-(
         1.5*(1.0/(1.0 + exp(-(($z1) + 0.5*($z2)))) - 0.5) +
         0.8*(1.0/(1.0 + exp(-(($z2) - ($z3))))  - 0.5))))""")

  val oracles: Map[String, String] = Map(
    "q_cv_metrics" -> {
      val (px, pr, pn) = pSql("z1", "z2", "z3")
      s"""WITH $featSql,
         f AS (SELECT raw.*, CAST(h1 % 5 AS INT) AS fold FROM raw),
         pf AS (SELECT fold, CAST(COUNT(*) AS BIGINT) fn,
             SUM(CAST(f1 AS DECIMAL(18,4))) d1_1, SUM(CAST(f1*f1 AS DECIMAL(30,8))) d2_1,
             SUM(CAST(f2 AS DECIMAL(18,4))) d1_2, SUM(CAST(f2*f2 AS DECIMAL(30,8))) d2_2,
             SUM(CAST(f3 AS DECIMAL(18,4))) d1_3, SUM(CAST(f3*f3 AS DECIMAL(30,8))) d2_3
           FROM f GROUP BY fold),
         g AS (SELECT CAST(SUM(fn) AS BIGINT) gn,
             SUM(d1_1) g1_1, SUM(d2_1) g2_1, SUM(d1_2) g1_2,
             SUM(d2_2) g2_2, SUM(d1_3) g1_3, SUM(d2_3) g2_3 FROM pf),
         tr AS (SELECT fold,
             CAST(gn - fn AS DOUBLE) n,
             CAST(g1_1 - d1_1 AS DOUBLE) s1_1, CAST(g2_1 - d2_1 AS DOUBLE) s2_1,
             CAST(g1_2 - d1_2 AS DOUBLE) s1_2, CAST(g2_2 - d2_2 AS DOUBLE) s2_2,
             CAST(g1_3 - d1_3 AS DOUBLE) s1_3, CAST(g2_3 - d2_3 AS DOUBLE) s2_3
           FROM pf CROSS JOIN g),
         z AS (SELECT f.fold, f.actual,
             ${Inference.zSql("f1", 1)} AS z1,
             ${Inference.zSql("f2", 2)} AS z2,
             ${Inference.zSql("f3", 3)} AS z3
           FROM f JOIN tr USING (fold)),
         sc AS (SELECT fold, actual,
             (($px) + ($pr) + ($pn)) / 3.0 > 0.5 AS pred FROM z),
         cf AS (SELECT fold, CAST(COUNT(*) AS BIGINT) n_test,
             CAST(SUM(CASE WHEN actual AND pred THEN 1 ELSE 0 END) AS DOUBLE) tp,
             CAST(SUM(CASE WHEN NOT actual AND pred THEN 1 ELSE 0 END) AS DOUBLE) fp,
             CAST(SUM(CASE WHEN NOT actual AND NOT pred THEN 1 ELSE 0 END) AS DOUBLE) tn,
             CAST(SUM(CASE WHEN actual AND NOT pred THEN 1 ELSE 0 END) AS DOUBLE) fn
           FROM sc GROUP BY fold),
         mt AS (SELECT fold, n_test,
             ${sqlR("(tp + tn) / (tp + fp + tn + fn)", 6)} AS accuracy,
             ${sqlR(
               """((tp + fn) * (CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END)
                 + (tn + fp) * (CASE WHEN tn + fn > 0 THEN tn / (tn + fn) ELSE 0.0 END))
                 / (tp + fp + tn + fn)""", 6)} AS precision_w,
             ${sqlR(
               """((tp + fn) * (CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END)
                 + (tn + fp) * (CASE WHEN tn + fp > 0 THEN tn / (tn + fp) ELSE 0.0 END))
                 / (tp + fp + tn + fn)""", 6)} AS recall_w,
             ${sqlR(
               """((tp + fn) * (CASE WHEN (CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END)
                                        + (CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END) > 0
                   THEN 2.0 * (CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END)
                            * (CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END)
                        / ((CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END)
                         + (CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END)) ELSE 0.0 END)
                 + (tn + fp) * (CASE WHEN (CASE WHEN tn + fn > 0 THEN tn / (tn + fn) ELSE 0.0 END)
                                        + (CASE WHEN tn + fp > 0 THEN tn / (tn + fp) ELSE 0.0 END) > 0
                   THEN 2.0 * (CASE WHEN tn + fn > 0 THEN tn / (tn + fn) ELSE 0.0 END)
                            * (CASE WHEN tn + fp > 0 THEN tn / (tn + fp) ELSE 0.0 END)
                        / ((CASE WHEN tn + fn > 0 THEN tn / (tn + fn) ELSE 0.0 END)
                         + (CASE WHEN tn + fp > 0 THEN tn / (tn + fp) ELSE 0.0 END)) ELSE 0.0 END))
                 / (tp + fp + tn + fn)""", 6)} AS f1_w
           FROM cf),
         rl AS (SELECT CAST(COUNT(*) AS BIGINT) k,
             SUM(CAST(accuracy AS DECIMAL(18,8))) sa,
             SUM(CAST(accuracy*accuracy AS DECIMAL(30,16))) sa2 FROM mt)
         SELECT fold, n_test, accuracy, precision_w, recall_w, f1_w,
           ${sqlR("CAST(sa AS DOUBLE) / k", 6)} AS cv_mean_accuracy,
           ${sqlR(
             """sqrt(GREATEST(0.0, CAST(sa2 AS DOUBLE) / k
               - (CAST(sa AS DOUBLE) / k) * (CAST(sa AS DOUBLE) / k)))""", 6)} AS cv_std_accuracy
         FROM mt CROSS JOIN rl ORDER BY fold"""
    },
    "q_missing_feature_impact" -> {
      def zrep(i: Int): (String, String, String) = {
        val zs = Seq("z1", "z2", "z3")
          .updated(i - 1, s"zm$i")
        (zs(0), zs(1), zs(2))
      }
      def modelSelects: String = {
        val sels = for (m <- Seq("ens", "nn", "rf", "xgb"); f <- Seq("f1", "f2", "f3")) yield {
          val base = s"CAST(cc_$m AS DOUBLE) / n_rows"
          val acc = s"CAST(mc_${m}_$f AS DOUBLE) / n_rows"
          s"""SELECT '$m' AS model, '$f' AS missing_feature, n_rows,
             ${sqlR(base, 6)} AS baseline_accuracy,
             ${sqlR(acc, 6)} AS accuracy,
             ${sqlR(s"$base - ($acc)", 6)} AS accuracy_drop
           FROM counts"""
        }
        sels.mkString("\n UNION ALL \n")
      }
      val (cx, cr, cn) = pSql("z1", "z2", "z3")
      val repCols = (1 to 3).map { i =>
        val (z1, z2, z3) = zrep(i)
        val (px, pr, pn) = pSql(z1, z2, z3)
        s"""CAST(SUM(CASE WHEN ((($px) + ($pr) + ($pn)) / 3.0 > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) mc_ens_f$i,
           CAST(SUM(CASE WHEN (($pn) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) mc_nn_f$i,
           CAST(SUM(CASE WHEN (($pr) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) mc_rf_f$i,
           CAST(SUM(CASE WHEN (($px) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) mc_xgb_f$i"""
      }.mkString(",\n")
      s"""WITH $featSql,
         med AS (SELECT
             ${sqlR("median(f1)", 6)} AS m1,
             ${sqlR("median(f2)", 6)} AS m2,
             ${sqlR("median(f3)", 6)} AS m3 FROM raw),
         m AS (SELECT CAST(COUNT(*) AS BIGINT) n,
             CAST(SUM(CAST(f1 AS DECIMAL(18,4))) AS DOUBLE) s1_1,
             CAST(SUM(CAST(f1*f1 AS DECIMAL(30,8))) AS DOUBLE) s2_1,
             CAST(SUM(CAST(f2 AS DECIMAL(18,4))) AS DOUBLE) s1_2,
             CAST(SUM(CAST(f2*f2 AS DECIMAL(30,8))) AS DOUBLE) s2_2,
             CAST(SUM(CAST(f3 AS DECIMAL(18,4))) AS DOUBLE) s1_3,
             CAST(SUM(CAST(f3*f3 AS DECIMAL(30,8))) AS DOUBLE) s2_3
           FROM raw),
         z AS (SELECT actual,
             ${Inference.zSql("f1", 1)} AS z1,
             ${Inference.zSql("f2", 2)} AS z2,
             ${Inference.zSql("f3", 3)} AS z3,
             ${Inference.zSql("m1", 1)} AS zm1,
             ${Inference.zSql("m2", 2)} AS zm2,
             ${Inference.zSql("m3", 3)} AS zm3
           FROM raw CROSS JOIN m CROSS JOIN med),
         counts AS (SELECT CAST(COUNT(*) AS BIGINT) n_rows,
             CAST(SUM(CASE WHEN ((($cx) + ($cr) + ($cn)) / 3.0 > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_ens,
             CAST(SUM(CASE WHEN (($cn) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_nn,
             CAST(SUM(CASE WHEN (($cr) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_rf,
             CAST(SUM(CASE WHEN (($cx) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_xgb,
             $repCols
           FROM z)
         SELECT * FROM ($modelSelects) AS t ORDER BY model, missing_feature"""
    },
    "q_model_robustness" -> {
      def zs(l: String): (String, String, String) =
        (s"(z1 + u1 * $l)", s"(z2 + u2 * $l)", s"(z3 + u3 * $l)")
      // Levels and threshold come from the SAME constants the Spark mart
      // defaults to — changing DefaultNoiseLevels/DefaultDropThreshold
      // can never desync query and oracle.
      val lvls = DefaultNoiseLevels.zipWithIndex
      def modelSelects: String = {
        val sels = for (m <- Seq("ens", "nn", "rf", "xgb"); (l, i) <- lvls) yield {
          val base = s"CAST(cc_$m AS DOUBLE) / n_rows"
          val acc = s"CAST(nc_${m}_l$i AS DOUBLE) / n_rows"
          s"""SELECT '$m' AS model, CAST($l AS DOUBLE) AS noise_level, n_rows,
             ${sqlR(base, 6)} AS baseline_accuracy,
             ${sqlR(acc, 6)} AS accuracy,
             ${sqlR(s"$base - ($acc)", 6)} AS accuracy_drop,
             $base - ($acc) > $DefaultDropThreshold AS degraded
           FROM counts"""
        }
        sels.mkString("\n UNION ALL \n")
      }
      val (cx, cr, cn) = pSql("z1", "z2", "z3")
      val noisyCols = lvls.map { case (l, i) =>
        val (z1, z2, z3) = zs(l.toString)
        val (px, pr, pn) = pSql(z1, z2, z3)
        s"""CAST(SUM(CASE WHEN ((($px) + ($pr) + ($pn)) / 3.0 > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) nc_ens_l$i,
           CAST(SUM(CASE WHEN (($pn) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) nc_nn_l$i,
           CAST(SUM(CASE WHEN (($pr) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) nc_rf_l$i,
           CAST(SUM(CASE WHEN (($px) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) nc_xgb_l$i"""
      }.mkString(",\n")
      s"""WITH $featSql,
         m AS (SELECT CAST(COUNT(*) AS BIGINT) n,
             CAST(SUM(CAST(f1 AS DECIMAL(18,4))) AS DOUBLE) s1_1,
             CAST(SUM(CAST(f1*f1 AS DECIMAL(30,8))) AS DOUBLE) s2_1,
             CAST(SUM(CAST(f2 AS DECIMAL(18,4))) AS DOUBLE) s1_2,
             CAST(SUM(CAST(f2*f2 AS DECIMAL(30,8))) AS DOUBLE) s2_2,
             CAST(SUM(CAST(f3 AS DECIMAL(18,4))) AS DOUBLE) s1_3,
             CAST(SUM(CAST(f3*f3 AS DECIMAL(30,8))) AS DOUBLE) s2_3
           FROM raw),
         z AS (SELECT actual,
             ${Inference.zSql("f1", 1)} AS z1,
             ${Inference.zSql("f2", 2)} AS z2,
             ${Inference.zSql("f3", 3)} AS z3,
             (h1 - 7.5) / 7.5 AS u1, (h2 - 7.5) / 7.5 AS u2, (h3 - 7.5) / 7.5 AS u3
           FROM raw CROSS JOIN m),
         counts AS (SELECT CAST(COUNT(*) AS BIGINT) n_rows,
             CAST(SUM(CASE WHEN ((($cx) + ($cr) + ($cn)) / 3.0 > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_ens,
             CAST(SUM(CASE WHEN (($cn) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_nn,
             CAST(SUM(CASE WHEN (($cr) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_rf,
             CAST(SUM(CASE WHEN (($cx) > 0.5) = actual THEN 1 ELSE 0 END) AS BIGINT) cc_xgb,
             $noisyCols
           FROM z)
         SELECT * FROM ($modelSelects) AS t ORDER BY model, noise_level"""
    }
  )
}
