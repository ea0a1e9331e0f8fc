package graft

import graft.text.TextF
import org.apache.spark.sql.functions._

/** The parquet corpus carries no emails/phones/IPs, so tx_pii_redact's
  * oracle only exercises the digit-run rule on customer ids; the planted
  * strings here drive every rule, including rule ORDER (emails and
  * dotted IPs must be rewritten before the bare digit-run rule can eat
  * their digits).
  */
class TextSpec extends SparkSpec {

  test("graft_nfc composes decomposed unicode; normalize collapses whitespace") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // "Cafe" + combining acute accent (NFD) must compose to é (U+00E9),
    // then the cleaning pipeline lowercases and collapses mixed whitespace
    val decomposed = "Cafe\u0301  du\tMonde\r\n" // 'e' + combining acute (NFD)
    val out = Seq((1L, decomposed), (2L, "already clean"), (3L, null: String))
      .toDF("id", "text")
      .select(col("id"),
        trim(regexp_replace(
          lower(expr("graft_nfc(text)")), "[ \\t\\n\\r]+", " ")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("café du monde"))
    assert(out(2L) === Some("already clean"))
    assert(out(3L) === None)
  }

  test("piiRedact scrubs planted emails, IPs, phones, and id runs") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact john.doe+x@example.com or jane@sub.domain.org now"),
      (2L, "server at 192.168.0.1 rebooted; port 8080"),
      (3L, "call +4915123456789 today"),
      (4L, "order 123456789 shipped to slot 42"),
      (5L, "clean text with no pii at all"),
      (6L, "user9876543@host.io from 10.0.0.254 ordered 55555555"))
    val out = rows.toDF("id", "text")
      .select(col("id"), TextF.piiRedact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "contact <EMAIL> or <EMAIL> now")
    // short digit runs (port, slot) survive; dotted quads don't
    assert(out(2L) === "server at <IP> rebooted; port 8080")
    assert(out(3L) === "call <PHONE> today")
    assert(out(4L) === "order <NUM> shipped to slot 42")
    assert(out(5L) === "clean text with no pii at all")
    // an email whose local part is digit-heavy is an email, not a <NUM>
    assert(out(6L) === "<EMAIL> from <IP> ordered <NUM>")
  }

  test("tx_lm_buckets: tertiles partition the corpus, scores respect bucket order") {
    val out = SparkEntry.queries("tx_lm_buckets")(spark, sf)
      .collect().map(r => (r.getDouble(1), r.getString(2)))
    val n = out.length
    val byB = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byB.keySet === Set("head", "middle", "tail"))
    // interpolated tertile fences put ~n/3 in each bucket
    assert(byB.values.forall(c => math.abs(c - n / 3.0) <= 2),
      s"tertile buckets must be balanced: $byB")
    val maxHead = out.filter(_._2 == "head").map(_._1).max
    val mid = out.filter(_._2 == "middle").map(_._1)
    val minTail = out.filter(_._2 == "tail").map(_._1).min
    assert(mid.forall(s => s > maxHead - 1e-12 && s < minTail + 1e-12) || mid.isEmpty)
    assert(maxHead <= minTail)
  }

  test("tx_lang_confusion: cells partition the corpus, label shares sum to 1") {
    val cells = SparkEntry.queries("tx_lang_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val total = cells.map(_._3).sum
    assert(total === Tables.documents(spark, sf).count(), "cells cover every doc")
    cells.groupBy(_._1).foreach { case (lang, rs) =>
      val share = rs.map(_._4).sum
      assert(math.abs(share - 1.0) < 1e-12, s"$lang shares sum $share")
    }
    cells.foreach { case (l, p, _, _, c) => assert(c === (l == p)) }
    // the detector must beat random guessing overall (5 languages)
    val acc = cells.filter(_._5).map(_._3).sum.toDouble / total
    assert(acc > 0.2, f"lang-id accuracy $acc%.2f at chance level")
  }

  test("tx_hash_features: per-doc counts total the token count, dims bounded") {
    val feats = SparkEntry.queries("tx_hash_features")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(feats.forall(f => f._2 >= 0 && f._2 < 64), "dims in [0, 64)")
    val perDoc = feats.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val tokenCounts = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), " "), t => length(t) > 0)).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tokenCounts.foreach { case (doc, n) =>
      assert(perDoc.getOrElse(doc, 0L) === n, s"doc $doc mass")
    }
    // same token always lands in the same dim: determinism across runs
    val again = SparkEntry.queries("tx_hash_features")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet === feats.toSet)
  }
  test("tx_bm25: scores match a naive local Okapi computation, top-3 ranked") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
    }.toMap
    val nDocs = docs.length.toDouble
    val nToks = toks.values.map(_.size.toLong).sum.toDouble
    val avgdl = nToks / nDocs
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, o) => t -> o.size.toDouble }
    def score(tf: Double, df: Double, dl: Double): Double =
      ((nDocs - df + 0.5) / (df + 0.5)) *
        ((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))
    val got = SparkEntry.queries("tx_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(got.nonEmpty)
    got.foreach { case (id, term, tf, df, dl, sc, rnk) =>
      assert(toks(id).count(_ == term).toLong === tf, s"tf of $term in $id")
      assert(dfm(term) === df.toDouble)
      assert(toks(id).size.toLong === dl)
      assert(math.abs(sc - score(tf.toDouble, df.toDouble, dl.toDouble)) < 1e-12)
      assert(rnk >= 1 && rnk <= 3)
    }
    // per doc: exactly the 3 best-scoring terms, ranked descending
    got.groupBy(_._1).foreach { case (id, rows) =>
      val byRank = rows.sortBy(_._7).map(_._6)
      assert(byRank.sameElements(byRank.sorted.reverse), s"doc $id ranks not descending")
      val all = toks(id).distinct.map(t =>
        score(toks(id).count(_ == t).toDouble, dfm(t), toks(id).size.toDouble))
      val floor = byRank.last
      assert(all.count(_ > floor) < 3, s"doc $id missed a better term")
    }
  }
  test("tx_kappa: chance-corrected agreement reconciles with the confusion matrix") {
    val r = SparkEntry.queries("tx_kappa")(spark, sf).head()
    val (n, agree, po, pe, kappa) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    // recompute from the raw scored surface
    val scored = SparkEntry.queries("tx_lang_id")(spark, sf)
      .select("doc_id", "pred_lang").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val labels = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val pairs = labels.toSeq.map { case (id, l) => (l, scored(id)) }
    assert(n === pairs.size.toLong)
    assert(agree === pairs.count(p => p._1 == p._2).toLong)
    val nn = pairs.size.toDouble
    val rowM = pairs.groupBy(_._1).map { case (l, v) => l -> v.size.toDouble }
    val colM = pairs.groupBy(_._2).map { case (l, v) => l -> v.size.toDouble }
    val peWant = rowM.keySet.intersect(colM.keySet)
      .map(l => rowM(l) * colM(l)).sum / (nn * nn)
    assert(math.abs(po - agree / nn) < 1e-15)
    assert(math.abs(pe - peWant) < 1e-12)
    assert(math.abs(kappa - (po - pe) / (1.0 - pe)) < 1e-12)
    assert(kappa <= po + 1e-12 && kappa >= -1.0 && kappa <= 1.0)
  }

  test("tx_pack: a one-counter-per-shard stateful fold reproduces the batch packs") {
    val packs = SparkEntry.queries("tx_pack")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // replay: the exact state a streaming packer would hold is ONE
    // running token counter per shard; fold docs in doc_id order and
    // rebuild every (shard, pack) row from that counter alone
    val p = 1000000007L
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long").as("n_w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val cum = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val want = scala.collection.mutable.Map[(Long, Long), (Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L))
    for ((id, nw) <- docs) {
      val shard = id % p * 654435747L % p % 8
      val before = cum(shard)
      val packId = before / 512
      val straddle = if ((before + nw - 1) / 512 != packId) 1L else 0L
      val (d0, t0, s0) = want((shard, packId))
      want((shard, packId)) = (d0 + 1, t0 + nw, s0 + straddle)
      cum(shard) = before + nw
    }
    assert(packs === want.toMap)
    // global accounting: every doc lands in exactly one pack
    assert(packs.values.map(_._1).sum === docs.length.toLong)
    assert(packs.values.map(_._2).sum === docs.map(_._2).sum)
  }

  test("tx_ttr: per-source profile matches a naive recount; ratios bounded") {
    val out = SparkEntry.queries("tx_ttr")(spark, sf).collect()
    assert(out.nonEmpty)
    val naive = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (src, rows) =>
        val toks = rows.flatMap(_._2.toLowerCase.split(" ", -1))
        val counts = toks.groupBy(identity).map(_._2.length)
        src -> (toks.length.toLong, counts.size.toLong,
          counts.count(_ == 1).toLong)
      }
    for (r <- out) {
      val (tot, dist, hapax) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert((tot, dist, hapax) === naive(r.getString(0)))
      assert(hapax <= dist && dist <= tot)
      assert(r.getDouble(4) === dist.toDouble / tot.toDouble)
      assert(r.getDouble(5) === hapax.toDouble / dist.toDouble)
    }
  }
}
