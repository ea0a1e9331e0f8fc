package graft.ml

import graft.{Q, Tables, Module}
import graft.Exact._
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{IndexToString, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.C — ML on Spark MLlib, mirroring `notebooks/modeling.py`:
  * cross-validated classifiers vs a DummyClassifier baseline
  * (modeling.py:13,20), model-based imputation (MyImputer train=True,
  * processing.py:138), and the end-to-end FinalModel pipeline
  * (modeling.py:323-336). Training is driver-coordinated MLlib (its
  * distributed L-BFGS/tree aggregation); feature building is plain
  * DataFrame ops. Deterministic: fixed seeds, hash-based splits.
  */
object MlC extends Module {

  /** Feature frame: per-customer behavior + one-hot segment; binary label
    * `DEFAULT_FLAG` analog = negative account balance.
    */
  def customerFeatures(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val byCust = o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
        sumd(col("o_totalprice")).as("total_spend"))
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val oneHots = segs.map(v =>
      when(col("c_mktsegment") === v, 1.0).otherwise(0.0).as(s"seg_$v"))
    c.join(byCust, col("c_custkey") === col("o_custkey"), "left")
      .na.fill(0.0, Seq("n_orders", "total_spend"))
      .select(Seq(col("c_custkey"), col("c_nationkey").cast("double").as("nation"),
        col("n_orders"), col("total_spend"),
        (col("total_spend") / greatest(col("n_orders"), lit(1.0))).as("avg_spend"),
        when(col("c_acctbal") < 0, 1.0).otherwise(0.0).as("label")) ++ oneHots: _*)
  }

  private val featCols = Array("nation", "n_orders", "total_spend", "avg_spend",
    "seg_AUTOMOBILE", "seg_BUILDING", "seg_FURNITURE", "seg_HOUSEHOLD", "seg_MACHINERY")

  private def assembler = new VectorAssembler()
    .setInputCols(featCols).setOutputCol("features")

  /** Deterministic 80/20 hash split (same recipe as q18). */
  private def split(df: DataFrame): (DataFrame, DataFrame) = {
    val bucket = (col("c_custkey") * lit(2654435761L)) % 1000
    (df.filter(bucket < 800), df.filter(bucket >= 800))
  }

  // ml_logreg — LogisticRegression train + test predictions + prob.
  private val mlLogreg = Q(
    "ml_logreg",
    (s, d) => {
      val (train, test) = split(customerFeatures(s, d))
      val lr = new LogisticRegression().setMaxIter(20).setRegParam(0.01)
      val model = new Pipeline().setStages(Array(assembler, lr)).fit(train)
      model.transform(test)
        .select(col("c_custkey"), col("label"), col("prediction"),
          org.apache.spark.ml.functions.vector_to_array(col("probability"))
            .getItem(1).as("prob_1"))
        .orderBy("c_custkey")
    },
    None
  )

  // ml_gbt — gradient-boosted trees (the reference's xgboost optuna target).
  private val mlGbt = Q(
    "ml_gbt",
    (s, d) => {
      val (train, test) = split(customerFeatures(s, d))
      val gbt = new GBTClassifier().setMaxIter(5).setMaxDepth(3).setSeed(42L)
      val model = new Pipeline().setStages(Array(assembler, gbt)).fit(train)
      model.transform(test)
        .select(col("c_custkey"), col("label"), col("prediction"))
        .orderBy("c_custkey")
    },
    None
  )

  // ml_cv — k-fold cross-validation over a small grid, reporting mean AUC
  // per hyper-parameter (my_cross_validate, modeling.py:13).
  private val mlCv = Q(
    "ml_cv",
    (s, d) => {
      val df = assembler.transform(customerFeatures(s, d))
      val lr = new LogisticRegression().setMaxIter(20)
      val grid = new ParamGridBuilder()
        .addGrid(lr.regParam, Array(0.0, 0.1)).build()
      val cv = new CrossValidator()
        .setEstimator(lr)
        .setEvaluator(new BinaryClassificationEvaluator().setMetricName("areaUnderROC"))
        .setEstimatorParamMaps(grid).setNumFolds(3).setSeed(42L)
      val model = cv.fit(df)
      val rows = grid.zip(model.avgMetrics).map { case (pm, m) =>
        (pm.get(lr.regParam).getOrElse(-1.0), m)
      }
      import s.implicits._
      rows.toSeq.toDF("reg_param", "mean_auc").orderBy("reg_param")
    },
    None
  )

  // ml_dummy_metrics — DummyClassifier(most_frequent) + the
  // classification_report numbers (modeling.py:20,316): pure counting, so
  // it gets a bit-exact DuckDB oracle. zero_division=0 semantics.
  private val mlDummy = Q(
    "ml_dummy_metrics",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(when(col("o_totalprice") > 150000.0, 1L).otherwise(0L).as("label"))
      o.agg(count(lit(1)).as("n"), sum(col("label")).as("pos"))
        .select(
          col("n"), col("pos"),
          when(col("pos") > col("n") - col("pos"), 1L).otherwise(0L).as("majority"))
        .select(col("n"), col("pos"), col("majority"),
          when(col("majority") === 1, col("pos").cast("double") / col("n").cast("double"))
            .otherwise((col("n") - col("pos")).cast("double") / col("n").cast("double")).as("accuracy"),
          when(col("majority") === 1, col("pos").cast("double") / col("n").cast("double"))
            .otherwise(lit(0.0)).as("precision_1"),
          when(col("majority") === 1, lit(1.0)).otherwise(lit(0.0)).as("recall_1"))
        .select(col("n"), col("pos"), col("majority"), col("accuracy"),
          col("precision_1"), col("recall_1"),
          when(col("precision_1") + col("recall_1") > 0.0,
            lit(2.0) * col("precision_1") * col("recall_1") / (col("precision_1") + col("recall_1")))
            .otherwise(lit(0.0)).as("f1_1"))
    },
    Some("""WITH l AS (
      |  SELECT CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS label FROM orders),
      |agg AS (
      |  SELECT COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS pos FROM l),
      |mj AS (
      |  SELECT n, pos, CAST(CASE WHEN pos > n - pos THEN 1 ELSE 0 END AS BIGINT) AS majority FROM agg),
      |pr AS (
      |  SELECT n, pos, majority,
      |    CASE WHEN majority = 1 THEN CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
      |         ELSE CAST(n - pos AS DOUBLE) / CAST(n AS DOUBLE) END AS accuracy,
      |    CASE WHEN majority = 1 THEN CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
      |         ELSE CAST(0.0 AS DOUBLE) END AS precision_1,
      |    CASE WHEN majority = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS recall_1
      |  FROM mj)
      |SELECT n, pos, majority, accuracy, precision_1, recall_1,
      |  CASE WHEN precision_1 + recall_1 > 0.0
      |       THEN 2.0 * precision_1 * recall_1 / (precision_1 + recall_1)
      |       ELSE CAST(0.0 AS DOUBLE) END AS f1_1
      |FROM pr""".stripMargin)
  )

  // ml_impute_model — model-based categorical imputation (MyImputer with
  // train=True): fit a multinomial classifier on rows where the target is
  // present, predict it where "missing" (custkey%10==0 sentinel).
  private val mlImputeModel = Q(
    "ml_impute_model",
    (s, d) => {
      val base = customerFeatures(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey").as("ck"), col("c_mktsegment")),
          col("c_custkey") === col("ck"))
        .drop("ck")
      val known = base.filter(col("c_custkey") % 10 =!= 0)
      val missing = base.filter(col("c_custkey") % 10 === 0)
      val idx = new StringIndexer().setInputCol("c_mktsegment")
        .setOutputCol("seg_idx").setStringOrderType("alphabetAsc").fit(known)
      val asm = new VectorAssembler()
        .setInputCols(Array("nation", "n_orders", "total_spend", "avg_spend"))
        .setOutputCol("features")
      val lr = new LogisticRegression().setMaxIter(20)
        .setLabelCol("seg_idx").setFamily("multinomial")
      val model = lr.fit(asm.transform(idx.transform(known)))
      val back = new IndexToString().setInputCol("prediction")
        .setOutputCol("segment_imputed").setLabels(idx.labelsArray(0))
      back.transform(model.transform(asm.transform(missing)))
        .select(col("c_custkey"), col("c_mktsegment").as("segment_true"),
          col("segment_imputed"))
        .orderBy("c_custkey")
    },
    None
  )

  // ml_final_pipeline — FinalModel: preprocess → scale → classify in one
  // fitted Pipeline, end-to-end predict on the held-out split.
  private val mlFinalPipeline = Q(
    "ml_final_pipeline",
    (s, d) => {
      val (train, test) = split(customerFeatures(s, d))
      val scaler = new StandardScaler().setInputCol("features")
        .setOutputCol("scaled").setWithMean(true).setWithStd(true)
      val lr = new LogisticRegression().setMaxIter(20).setFeaturesCol("scaled")
      val model = new Pipeline().setStages(Array(assembler, scaler, lr)).fit(train)
      model.transform(test)
        .select(col("c_custkey"), col("label"), col("prediction"))
        .orderBy("c_custkey")
    },
    None
  )

  // ml_mlp — the reference's Keras binary classifier (modeling.py Keras
  // section) as MLlib's MultilayerPerceptronClassifier: same role, Spark's
  // distributed L-BFGS instead of a single-node TF session.
  private val mlMlp = Q(
    "ml_mlp",
    (s, d) => {
      val (train, test) = split(customerFeatures(s, d))
      val mlp = new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
        .setLayers(Array(featCols.length, 8, 2))
        .setMaxIter(30).setSeed(42L)
      val model = new Pipeline().setStages(Array(assembler, mlp)).fit(train)
      model.transform(test)
        .select(col("c_custkey"), col("label"), col("prediction"))
        .orderBy("c_custkey")
    },
    None
  )

  // ml_attrib — per-feature prediction attribution for the fitted linear
  // model (exact "SHAP" for logreg: contribution_i = coef_i · x_i), the
  // distributed analog of the reference's shap_force_plot.html.
  private val mlAttrib = Q(
    "ml_attrib",
    (s, d) => {
      val (train, test) = split(customerFeatures(s, d))
      val lr = new LogisticRegression().setMaxIter(20).setRegParam(0.01)
      val model = lr.fit(assembler.transform(train))
      val coefs = model.coefficients.toArray
      val intercept = model.intercept
      val contribs = featCols.zip(coefs).map { case (f, w) =>
        struct(lit(f).as("feature"), (col(f) * lit(w)).as("contribution"))
      }
      test.select(col("c_custkey"), lit(intercept).as("intercept"),
          explode(array(contribs: _*)).as("c"))
        .select(col("c_custkey"), col("c.feature"), col("c.contribution"), col("intercept"))
        .orderBy("c_custkey", "feature")
    },
    None
  )

  override val qs: Seq[Q] = Seq(mlLogreg, mlGbt, mlCv, mlDummy, mlImputeModel,
    mlFinalPipeline, mlMlp, mlAttrib)
}
