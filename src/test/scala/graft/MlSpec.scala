package graft

import graft.ml.MlC
import org.apache.spark.sql.functions._

/** Ground truth for the rows-only ML operators added in round 2: the
  * driver can't oracle model-dependent outputs, so these specs pin
  * determinism, internal consistency, and reconciliation against the
  * ml_logreg dump.
  */
class MlSpec extends SparkSpec {

  test("ml_report counts reconcile with the ml_logreg prediction dump") {
    val pred = SparkEntry.queries("ml_logreg")(spark, sf)
    val rep = SparkEntry.queries("ml_report")(spark, sf).head
    val n = pred.count()
    val tp = pred.filter(col("label") === 1.0 && col("prediction") === 1.0).count()
    val tn = pred.filter(col("label") === 0.0 && col("prediction") === 0.0).count()
    assert(rep.getAs[Long]("n") === n)
    assert(rep.getAs[Long]("tp") === tp)
    assert(rep.getAs[Long]("tn") === tn)
    assert(rep.getAs[Long]("tp") + rep.getAs[Long]("fp") +
      rep.getAs[Long]("fn") + rep.getAs[Long]("tn") === n)
    assert(rep.getAs[Double]("accuracy") === (tp + tn).toDouble / n)
    // the reference's roc_auc_score-on-binarized-predictions quirk
    assert(rep.getAs[Double]("roc_auc") ===
      (rep.getAs[Double]("recall_1") + rep.getAs[Double]("recall_0")) / 2.0)
  }

  test("ml_search reports every trial deterministically under the fixed seed") {
    val a = SparkEntry.queries("ml_search")(spark, sf).collect()
    assert(a.length === 10)
    // 6 seeded logreg draws + 4 gbt depths, params within their ranges
    val lrRows = a.filter(_.getAs[String]("model") == "logreg")
    assert(lrRows.length === 6)
    assert(lrRows.forall { r =>
      val reg = r.getAs[Double]("reg_param")
      reg >= 1e-4 && reg <= 1.0
    })
    assert(a.filter(_.getAs[String]("model") == "gbt")
      .map(_.getAs[Long]("max_depth")).sorted.toSeq === Seq(2L, 3L, 4L, 5L))
    // ranks are a permutation of 1..10 ordered by mean_auc
    val byRank = a.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to 10L))
    val aucs = byRank.map(_.getAs[Double]("mean_auc"))
    assert(aucs.zip(aucs.tail).forall { case (x, y) => x >= y })
    // determinism: a second run draws the same params and scores
    val b = SparkEntry.queries("ml_search")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("ml_impute_eval scores the masked hold-out consistently and above chance") {
    val r = SparkEntry.queries("ml_impute_eval")(spark, sf).head
    val nEval = r.getAs[Long]("n_eval")
    val nCorrect = r.getAs[Long]("n_correct")
    val f1 = r.getAs[Double]("micro_f1")
    assert(nEval > 0)
    assert(f1 === nCorrect.toDouble / nEval)
    // 5 roughly-balanced segments: anything at or above ~chance passes;
    // this is a floor against regressions, not a model-quality claim
    assert(f1 >= 0.10, f"micro_f1 $f1%.3f below floor")
    // the hold-out slice is exactly the custkey%10==5 customers
    val expected = MlC.customerFeatures(spark, sf)
      .filter(col("c_custkey") % 10 === 5).count()
    assert(nEval === expected)
  }
}
