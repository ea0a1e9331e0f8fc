package graft.operators

import graft.{Q, Tables, Module}
import graft.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2.B — preprocessing / feature engineering.
  *
  * Distributed re-expressions of the reference's sklearn transformers
  * (`notebooks/processing.py`, `notebooks/engineering.py`). Every "fit"
  * stage is a tiny O(columns) aggregate broadcast back into a narrow map
  * stage — no wide shuffle of the fact table anywhere in this section, so
  * each transform is a single scan at any scale.
  */
object PreprocessB extends Module {

  /** 1e-3 integer grid (see RelationalA.q10): makes second-moment sums
    * exact integers, eliminating cross-engine double→decimal rounding.
    */
  private def qz(c: Column): Column = qzl(c, 1000.0).cast(DecimalType(19, 0))
  private def qzSql(e: String) = s"CAST(ROUND(($e)*1000.0) AS DECIMAL(19,0))"

  // q20 — ordinal encoder with preserved level order (EducationEncoder,
  // processing.py:19-43: label -> index / len(map)). Narrow map over a
  // plan-side literal CASE chain; codegen'd, zero shuffle.
  private val prioLevels = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val q20 = Q(
    "q20_ordinal_encode",
    (s, d) => {
      val enc = prioLevels.zipWithIndex.foldLeft(lit(null).cast("double")) {
        case (acc, (v, i)) =>
          when(col("o_orderpriority") === v, lit(i.toDouble / prioLevels.length)).otherwise(acc)
      }
      Tables.orders(s, d)
        .select(col("o_orderkey"), enc.as("priority_ord"))
    },
    Some {
      val cases = prioLevels.zipWithIndex
        .map { case (v, i) => s"WHEN o_orderpriority = '$v' THEN CAST(${i.toDouble / prioLevels.length} AS DOUBLE)" }
        .mkString(" ")
      s"""SELECT o_orderkey, CASE $cases ELSE NULL END AS priority_ord
         |FROM orders""".stripMargin
    }
  )

  // q21 — one-hot over an enumerable domain (OneHotEncoder use in
  // engineering.py:11,44-51): N boolean-to-double projections, no shuffle.
  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val q21 = Q(
    "q21_onehot",
    (s, d) => {
      val oneHots = segments.map(v =>
        when(col("c_mktsegment") === v, 1.0).otherwise(0.0).as(s"seg_$v"))
      Tables.customer(s, d)
        .select(col("c_custkey") +: oneHots: _*)
    },
    Some {
      val cols = segments
        .map(v => s"CASE WHEN c_mktsegment = '$v' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS seg_$v")
        .mkString(",\n  ")
      s"SELECT c_custkey,\n  $cols\nFROM customer"
    }
  )

  // q22 — 0/≠0 → boolean-as-double (create_has_dependents,
  // processing.py:9-15).
  private val q22 = Q(
    "q22_bool_map",
    (s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          when(col("value") === 0.0, 0.0).otherwise(1.0).as("has_value"))
    },
    Some("""SELECT event_id,
      |  CASE WHEN value = 0.0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS has_value
      |FROM events""".stripMargin)
  )

  // q23 — bucket-label → ordinal with an explicit missing sentinel mapped
  // to NULL, original column dropped (EmployeePartialTransformer,
  // processing.py:110-135).
  private val q23 = Q(
    "q23_bucket_map",
    (s, d) => {
      val m = Map("1-URGENT" -> 0, "2-HIGH" -> 1, "3-MEDIUM" -> 2, "5-LOW" -> 3)
      val enc = m.foldLeft(lit(null).cast("long")) { case (acc, (v, i)) =>
        when(col("o_orderpriority") === v, lit(i.toLong)).otherwise(acc)
      }
      Tables.orders(s, d)
        .select(col("o_orderkey"), enc.as("priority_num"))
    },
    Some("""SELECT o_orderkey,
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN 0
      |       WHEN o_orderpriority = '2-HIGH' THEN 1
      |       WHEN o_orderpriority = '3-MEDIUM' THEN 2
      |       WHEN o_orderpriority = '5-LOW' THEN 3
      |       ELSE NULL END AS priority_num
      |FROM orders""".stripMargin)
  )

  // q24 — distributed mean/mode imputation (MyImputer's simple path,
  // processing.py:138-183; sentinel semantics per its missing_val).
  // "Missing" here: negative acctbal (numeric) and custkey%10==0
  // (categorical). Fit = one tiny aggregate; transform = narrow map with
  // the statistics broadcast as a 1-row literal.
  private val q24 = Q(
    "q24_impute",
    (s, d) => {
      val c = Tables.customer(s, d)
      val meanDf = c.filter(col("c_acctbal") >= 0)
        .agg((sumd(col("c_acctbal")) / count(lit(1)).cast("double")).as("mean_bal"))
      val modeDf = c.filter(col("c_custkey") % 10 =!= 0)
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("c_mktsegment"))
        .limit(1)
        .select(col("c_mktsegment").as("mode_seg"))
      c.crossJoin(broadcast(meanDf)).crossJoin(broadcast(modeDf))
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, col("mean_bal")).otherwise(col("c_acctbal")).as("acctbal_imputed"),
          when(col("c_custkey") % 10 === 0, col("mode_seg")).otherwise(col("c_mktsegment")).as("segment_imputed"))
    },
    Some("""WITH m AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_bal
      |  FROM customer WHERE c_acctbal >= 0
      |), md AS (
      |  SELECT c_mktsegment AS mode_seg FROM customer WHERE c_custkey % 10 <> 0
      |  GROUP BY c_mktsegment ORDER BY COUNT(*) DESC, c_mktsegment LIMIT 1
      |)
      |SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN mean_bal ELSE c_acctbal END AS acctbal_imputed,
      |  CASE WHEN c_custkey % 10 = 0 THEN mode_seg ELSE c_mktsegment END AS segment_imputed
      |FROM customer, m, md""".stripMargin)
  )

  /** Shared mean/std(ddof=0) fit for scalers: exact decimal first moment,
    * integer-grid second moment (StandardScaler divides by n, unlike
    * pandas describe's n-1).
    */
  // dec2d readouts: the price Σz² backs ~6e22 at sf1 — past 2^64,
  // where the direct decimal→double cast is engine-divergent (SURVEY §5)
  private def d2sql(e: String) = graft.Exact.sqlDec2d(s"CAST($e AS HUGEINT)")

  private def fitMeanStd(df: DataFrame, c: String): DataFrame =
    df.agg(
      (sumd(col(c)) / count(lit(1)).cast("double")).as("mu"),
      (sqrt(
        (dec2d(sum(qz(col(c)) * qz(col(c)))) -
          (dec2d(sum(qz(col(c)))) * dec2d(sum(qz(col(c))))) / count(lit(1)).cast("double")) /
          count(lit(1)).cast("double")) / lit(1000.0)).as("sigma"))

  private def fitMeanStdSql(table: String, c: String): String =
    s"""SELECT ${sqlSumd(c)} / CAST(COUNT(*) AS DOUBLE) AS mu,
       |  SQRT((${d2sql(s"SUM(${qzSql(c)} * ${qzSql(c)})")} -
       |    (${d2sql(s"SUM(${qzSql(c)})")} * ${d2sql(s"SUM(${qzSql(c)})")}) / CAST(COUNT(*) AS DOUBLE)) /
       |    CAST(COUNT(*) AS DOUBLE)) / 1000.0 AS sigma
       |FROM $table""".stripMargin

  // q25 — z-score scaling (StandardScaler in engineering.py:6,121;
  // population std, ddof=0). Two-phase: 1-row fit broadcast, narrow map.
  private val q25 = Q(
    "q25_standard_scale",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      l.crossJoin(broadcast(fitMeanStd(l, "l_extendedprice")))
        .select(col("l_orderkey"), col("l_linenumber"),
          ((col("l_extendedprice") - col("mu")) / col("sigma")).as("price_z"))
    },
    Some(s"""WITH f AS (${fitMeanStdSql("lineitem", "l_extendedprice")})
      |SELECT l_orderkey, l_linenumber,
      |  (l_extendedprice - mu) / sigma AS price_z
      |FROM lineitem, f""".stripMargin)
  )

  // q26 — derived ratio features (CreateAdditionalFeatures,
  // engineering.py:57-77): pure row-level IEEE arithmetic, NULL-guarded
  // denominators, zero shuffle.
  private val q26 = Q(
    "q26_ratio_features",
    (s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / col("l_quantity")).as("price_per_unit"),
          (col("l_discount") / when(col("l_tax") === 0.0, lit(null)).otherwise(col("l_tax"))).as("discount_to_tax"),
          ((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))) / col("l_quantity")).as("net_per_unit"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
      |  l_extendedprice / l_quantity AS price_per_unit,
      |  l_discount / NULLIF(l_tax, 0.0) AS discount_to_tax,
      |  (l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax)) / l_quantity AS net_per_unit
      |FROM lineitem""".stripMargin)
  )

  // q27 — conditional 3-way label + one-hot (CreateHasCurrentAccountColumn,
  // engineering.py:9-55, including its quirk: debit-card-without-account
  // rows keep the raw boolean, which we label 'false').
  private val q27 = Q(
    "q27_derive_categorical",
    (s, d) => {
      val dc = col("c_acctbal") > 0
      val ca = col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
      val label = when(dc && ca, "with debit card")
        .when(!dc && !ca, "no")
        .when(!dc && ca, "without debit card")
        .otherwise("false")
      val labels = Seq("false", "no", "with debit card", "without debit card")
      val oneHots = labels.zipWithIndex.map { case (v, i) =>
        when(label === v, 1.0).otherwise(0.0).as(s"acct_$i")
      }
      Tables.customer(s, d)
        .select(col("c_custkey") +: oneHots: _*)
    },
    Some("""WITH lab AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_acctbal > 0 AND c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'with debit card'
      |         WHEN NOT (c_acctbal > 0) AND c_mktsegment NOT IN ('BUILDING','AUTOMOBILE') THEN 'no'
      |         WHEN NOT (c_acctbal > 0) AND c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'without debit card'
      |         ELSE 'false' END AS label
      |  FROM customer)
      |SELECT c_custkey,
      |  CASE WHEN label = 'false' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS acct_0,
      |  CASE WHEN label = 'no' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS acct_1,
      |  CASE WHEN label = 'with debit card' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS acct_2,
      |  CASE WHEN label = 'without debit card' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS acct_3
      |FROM lab""".stripMargin)
  )

  // q28 — correlation-maximizing weighted feature combination
  // (FeatureCorrelationEngineer, engineering.py:106-144). The reference
  // runs Nelder-Mead over |corr(Xw, y)|; the maximizer has the closed form
  // w ∝ Cxx⁻¹·cxy, so we compute the exact covariance moments in one
  // integer-grid pass, solve the 2×2 system as a fixed IEEE expression,
  // and standard-scale the combined column (StandardScaler, ddof=0) —
  // fit is O(1) rows, transform is a narrow map. x=(l_quantity,
  // l_discount), y=l_extendedprice.
  private val q28 = Q(
    "q28_feature_combine",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val (x1, x2, y) = ("l_quantity", "l_discount", "l_extendedprice")
      // dec2d readouts: s1y/s2y back ~3e19 at sf1 — past 2^64 (SURVEY §5)
      val mom = l.agg(
        count(lit(1)).cast("double").as("n"),
        dec2d(sum(qz(col(x1)))).as("s1"),
        dec2d(sum(qz(col(x2)))).as("s2"),
        dec2d(sum(qz(col(y)))).as("sy"),
        dec2d(sum(qz(col(x1)) * qz(col(x1)))).as("s11"),
        dec2d(sum(qz(col(x2)) * qz(col(x2)))).as("s22"),
        dec2d(sum(qz(col(x1)) * qz(col(x2)))).as("s12"),
        dec2d(sum(qz(col(x1)) * qz(col(y)))).as("s1y"),
        dec2d(sum(qz(col(x2)) * qz(col(y)))).as("s2y"))
      val fit = mom.select(
        // central moments on the grid (scale cancels in the weights)
        ((col("s11") - col("s1") * col("s1") / col("n")) / col("n")).as("v11"),
        ((col("s22") - col("s2") * col("s2") / col("n")) / col("n")).as("v22"),
        ((col("s12") - col("s1") * col("s2") / col("n")) / col("n")).as("v12"),
        ((col("s1y") - col("s1") * col("sy") / col("n")) / col("n")).as("c1"),
        ((col("s2y") - col("s2") * col("sy") / col("n")) / col("n")).as("c2"),
        col("n"), col("s1"), col("s2"))
        .select(
          (col("v22") * col("c1") - col("v12") * col("c2")).as("w1"),
          (col("v11") * col("c2") - col("v12") * col("c1")).as("w2"),
          col("v11"), col("v22"), col("v12"), col("n"), col("s1"), col("s2"))
        .select(col("w1"), col("w2"),
          // mean/std of combined = w·x in raw units (grid /1000 at the end)
          ((col("w1") * col("s1") + col("w2") * col("s2")) / col("n") / lit(1000.0)).as("mu_c"),
          (sqrt(col("w1") * col("w1") * col("v11") + lit(2.0) * col("w1") * col("w2") * col("v12") +
            col("w2") * col("w2") * col("v22")) / lit(1000.0)).as("sigma_c"))
      l.crossJoin(broadcast(fit))
        .select(col("l_orderkey"), col("l_linenumber"),
          (((col("w1") * col(x1) + col("w2") * col(x2)) - col("mu_c")) / col("sigma_c")).as("combined_z"))
    },
    Some {
      val (x1, x2, y) = ("l_quantity", "l_discount", "l_extendedprice")
      s"""WITH mom AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${d2sql(s"SUM(${qzSql(x1)})")} AS s1,
         |    ${d2sql(s"SUM(${qzSql(x2)})")} AS s2,
         |    ${d2sql(s"SUM(${qzSql(y)})")} AS sy,
         |    ${d2sql(s"SUM(${qzSql(x1)} * ${qzSql(x1)})")} AS s11,
         |    ${d2sql(s"SUM(${qzSql(x2)} * ${qzSql(x2)})")} AS s22,
         |    ${d2sql(s"SUM(${qzSql(x1)} * ${qzSql(x2)})")} AS s12,
         |    ${d2sql(s"SUM(${qzSql(x1)} * ${qzSql(y)})")} AS s1y,
         |    ${d2sql(s"SUM(${qzSql(x2)} * ${qzSql(y)})")} AS s2y
         |  FROM lineitem),
         |cv AS (
         |  SELECT n, s1, s2,
         |    (s11 - s1 * s1 / n) / n AS v11,
         |    (s22 - s2 * s2 / n) / n AS v22,
         |    (s12 - s1 * s2 / n) / n AS v12,
         |    (s1y - s1 * sy / n) / n AS c1,
         |    (s2y - s2 * sy / n) / n AS c2
         |  FROM mom),
         |w AS (
         |  SELECT n, s1, s2, v11, v22, v12,
         |    v22 * c1 - v12 * c2 AS w1,
         |    v11 * c2 - v12 * c1 AS w2
         |  FROM cv),
         |fit AS (
         |  SELECT w1, w2,
         |    (w1 * s1 + w2 * s2) / n / 1000.0 AS mu_c,
         |    SQRT(w1 * w1 * v11 + 2.0 * w1 * w2 * v12 + w2 * w2 * v22) / 1000.0 AS sigma_c
         |  FROM w)
         |SELECT l_orderkey, l_linenumber,
         |  ((w1 * $x1 + w2 * $x2) - mu_c) / sigma_c AS combined_z
         |FROM lineitem, fit""".stripMargin
    }
  )

  // q29 — column rename + chained transforms (RenameColumn /
  // ProcessingTransformer, processing.py:66-107): projection-only plan.
  private val q29 = Q(
    "q29_rename_chain",
    (s, d) => {
      Tables.orders(s, d)
        .withColumnRenamed("o_totalprice", "TOTAL_PRICE")
        .withColumn("PRICE_BUCKET",
          when(col("TOTAL_PRICE") < 50000.0, "low")
            .when(col("TOTAL_PRICE") < 150000.0, "mid")
            .otherwise("high"))
        .withColumnRenamed("o_orderkey", "ORDER_KEY")
        .select(col("ORDER_KEY"), col("TOTAL_PRICE"), col("PRICE_BUCKET"))
    },
    Some("""SELECT o_orderkey AS ORDER_KEY, o_totalprice AS TOTAL_PRICE,
      |  CASE WHEN o_totalprice < 50000.0 THEN 'low'
      |       WHEN o_totalprice < 150000.0 THEN 'mid'
      |       ELSE 'high' END AS PRICE_BUCKET
      |FROM orders""".stripMargin)
  )

  // q30 — min-max scaling: min/max are exact parquet doubles, transform is
  // a broadcast 1-row fit + narrow map.
  private val q30 = Q(
    "q30_minmax_scale",
    (s, d) => {
      val o = Tables.orders(s, d)
      val f = o.agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(f))
        .select(col("o_orderkey"),
          ((col("o_totalprice") - col("lo")) / (col("hi") - col("lo"))).as("price_mm"))
    },
    Some("""WITH f AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
      |SELECT o_orderkey, (o_totalprice - lo) / (hi - lo) AS price_mm
      |FROM orders, f""".stripMargin)
  )

  // q54 — Mahalanobis outlier scoring over (l_quantity, l_discount): the
  // MULTIVARIATE step past q08's per-column IQR clipping — a point can
  // be unremarkable per column yet far outside the joint distribution.
  // Same two-phase shape as q28: one exact grid-moment aggregate,
  // central moments + the 2×2 precision matrix in fixed IEEE arithmetic,
  // broadcast into a narrow per-row quadratic form. Mahalanobis distance
  // is invariant under per-column linear scaling, so the whole
  // computation stays in grid units — no rescale anywhere. Flag at the
  // χ²(2, 0.999) ≈ 13.82 contour.
  private val q54 = Q(
    "q54_mahalanobis",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val (x1, x2) = ("l_quantity", "l_discount")
      // dec2d readouts — uniform with q28's moment surface (SURVEY §5)
      val mom = l.agg(
        count(lit(1)).cast("double").as("n"),
        dec2d(sum(qz(col(x1)))).as("s1"),
        dec2d(sum(qz(col(x2)))).as("s2"),
        dec2d(sum(qz(col(x1)) * qz(col(x1)))).as("s11"),
        dec2d(sum(qz(col(x2)) * qz(col(x2)))).as("s22"),
        dec2d(sum(qz(col(x1)) * qz(col(x2)))).as("s12"))
      val fit = mom.select(
          (col("s1") / col("n")).as("mu1"),
          (col("s2") / col("n")).as("mu2"),
          ((col("s11") - col("s1") * col("s1") / col("n")) / col("n")).as("v11"),
          ((col("s22") - col("s2") * col("s2") / col("n")) / col("n")).as("v22"),
          ((col("s12") - col("s1") * col("s2") / col("n")) / col("n")).as("v12"))
        .select(col("mu1"), col("mu2"), col("v11"), col("v22"), col("v12"),
          (col("v11") * col("v22") - col("v12") * col("v12")).as("det"))
      l.crossJoin(broadcast(fit))
        .select(col("l_orderkey"), col("l_linenumber"),
          ((qz(col(x1)).cast("double") - col("mu1")).as("a1")),
          ((qz(col(x2)).cast("double") - col("mu2")).as("a2")),
          col("v11"), col("v22"), col("v12"), col("det"))
        .select(col("l_orderkey"), col("l_linenumber"),
          ((col("a1") * col("a1") * col("v22") -
            lit(2.0) * col("a1") * col("a2") * col("v12") +
            col("a2") * col("a2") * col("v11")) / col("det")).as("md2"))
        .withColumn("is_outlier", col("md2") > 13.82)
    },
    Some {
      val (x1, x2) = ("l_quantity", "l_discount")
      s"""WITH mom AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${d2sql(s"SUM(${qzSql(x1)})")} AS s1,
         |    ${d2sql(s"SUM(${qzSql(x2)})")} AS s2,
         |    ${d2sql(s"SUM(${qzSql(x1)} * ${qzSql(x1)})")} AS s11,
         |    ${d2sql(s"SUM(${qzSql(x2)} * ${qzSql(x2)})")} AS s22,
         |    ${d2sql(s"SUM(${qzSql(x1)} * ${qzSql(x2)})")} AS s12
         |  FROM lineitem),
         |fit AS (
         |  SELECT s1 / n AS mu1, s2 / n AS mu2,
         |    (s11 - s1 * s1 / n) / n AS v11,
         |    (s22 - s2 * s2 / n) / n AS v22,
         |    (s12 - s1 * s2 / n) / n AS v12
         |  FROM mom),
         |fit2 AS (
         |  SELECT mu1, mu2, v11, v22, v12,
         |    v11 * v22 - v12 * v12 AS det
         |  FROM fit),
         |a AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(${qzSql(x1)} AS DOUBLE) - mu1 AS a1,
         |    CAST(${qzSql(x2)} AS DOUBLE) - mu2 AS a2,
         |    v11, v22, v12, det
         |  FROM lineitem, fit2)
         |SELECT l_orderkey, l_linenumber,
         |  (a1 * a1 * v22 - 2.0 * a1 * a2 * v12 + a2 * a2 * v11) / det AS md2,
         |  (a1 * a1 * v22 - 2.0 * a1 * a2 * v12 + a2 * a2 * v11) / det > 13.82 AS is_outlier
         |FROM a""".stripMargin
    }
  )

  override val qs: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q54)
}
