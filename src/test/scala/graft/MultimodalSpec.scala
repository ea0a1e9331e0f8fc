package graft

import graft.multimodal.MediaDecode
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeBatch emits one typed row per payload with stable stub values") {
    val docs = Tables.documents(spark, sf)
      .withColumn("payload", col("text").cast("binary"))
    val decoded = MediaDecode.decodeBatch(docs, "doc_id", "payload")
    assert(decoded.count() === docs.count())
    val r = decoded.filter(col("doc_id") === 0).head
    val bytes = docs.filter(col("doc_id") === 0)
      .select("payload").head.getAs[Array[Byte]](0)
    assert(r.n_bytes === bytes.length.toLong)
    assert(r.width === 64 + bytes.length % 64)
    assert(r.channels === 3)
    assert(r.byte_mean > 0.0 && r.byte_mean < 255.0)
  }

  test("resizeBatch halves the stub dimensions deterministically") {
    val docs = Tables.documents(spark, sf)
      .withColumn("payload", col("text").cast("binary"))
    val a = MediaDecode.resizeBatch(docs, "doc_id", "payload").collect()
      .map(r => r.doc_id -> r).toMap
    val b = MediaDecode.resizeBatch(docs, "doc_id", "payload").collect()
      .map(r => r.doc_id -> r).toMap
    assert(a.nonEmpty)
    a.values.foreach { r =>
      assert(r.out_w === r.in_w / 2 && r.out_h === r.in_h / 2)
      assert(r.out_mean >= 0.0 && r.out_mean <= 255.0)
      // deterministic: identical checksums across runs
      assert(b(r.doc_id).out_md5 === r.out_md5)
    }
  }

  test("mm_framesample frames tile the payload deterministically") {
    val frames = SparkEntry.queries("mm_framesample")(spark, sf)
    val perDoc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSet === Set(4L))
  }

  test("mm_phash: planted duplicates are recovered, output pairs bounded") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the synthetic corpus has no exact payload duplicates — plant a
    // corpus: an identical pair, a near pair (one word changed), and
    // unrelated docs, written with the documents schema
    val r = new scala.util.Random(7)
    def doc(): String = Seq.fill(120)("abcdefghij".charAt(r.nextInt(10))).mkString(" ")
    val base = doc(); val near = "zz" + base.drop(2)
    val rows = Seq((1L, base), (2L, base), (3L, near)) ++
      (4L to 20L).map(i => (i, doc()))
    val dir = java.nio.file.Files.createTempDirectory("graft_phash").toString + "/documents.parquet"
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.parquet(dir)
    val pairs = SparkEntry.queries("mm_phash")(spark,
        dir.stripSuffix("/documents.parquet")).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0 && p._3 <= 3))
    val got = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(got.get((1L, 2L)) === Some(0L),
      s"identical payloads must pair at hamming 0: $pairs")
    // the near copy shares its grid except the first samples
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 3L, s"near pair missed: $pairs")
  }

  test("mm_shared_frames recovers planted same-length clips by shared quarters") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // same length, last quarter differs -> 3 shared frames; an identical
    // copy shares all 4; the synthetic corpus itself has none (verified
    // empty by the oracle), so the recovery evidence is planted here
    val base = "abcdefgh" * 25 // 200 chars, flen = 50
    val variant = base.take(150) + ("zz" + base.drop(152))
    val rows = Seq((1L, base), (2L, base), (3L, variant), (4L, "x" * 199))
    val dir = java.nio.file.Files.createTempDirectory("graft_frames").toString + "/documents.parquet"
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.parquet(dir)
    val out = SparkEntry.queries("mm_shared_frames")(spark,
        dir.stripSuffix("/documents.parquet")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.get((1L, 2L)) === Some(4L), s"identical clips share all frames: $out")
    assert(out.get((1L, 3L)) === Some(3L), s"variant shares 3 of 4 quarters: $out")
    assert(out.get((2L, 3L)) === Some(3L))
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("mm_phash: hot-band df cap excludes boilerplate signatures, mm_hot_bands reports them") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 150 copies of one payload share the same phash -> all 4 of its
    // band buckets exceed the cap (df = 150 > 100); without the stop-list
    // they alone are 150*149/2 = 11,175 pairs. A planted near pair with
    // unique-ish bands must still be recovered.
    val r = new scala.util.Random(23)
    def doc(): String = Seq.fill(140)("abcdefghij".charAt(r.nextInt(10))).mkString(" ").take(140)
    val boiler = doc()
    val base = doc(); val near = "zz" + base.drop(2)
    val rows = (1L to 150L).map(i => (i, boiler)) ++
      Seq((500L, base), (501L, base), (502L, near)) ++
      (600L to 615L).map(i => (i, doc()))
    val dir = java.nio.file.Files.createTempDirectory("graft_hotbands").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.parquet(dir + "/documents.parquet")
    val pairs = SparkEntry.queries("mm_phash")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(!pairs.keySet.exists(p => p._1 <= 150L && p._2 <= 150L),
      s"boilerplate-signature pairs leaked through the cap: ${pairs.keySet.take(5)}")
    assert(pairs.get((500L, 501L)) === Some(0L), s"identical pair lost: $pairs")
    assert(pairs.contains((500L, 502L)) && pairs((500L, 502L)) <= 3L, s"near pair lost: $pairs")
    val hot = SparkEntry.queries("mm_hot_bands")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(hot.nonEmpty && hot.forall(_._3 >= 150L),
      s"hot bands must report the boilerplate signature: ${hot.toSeq}")
    assert(hot.map(_._1).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L),
      s"all 4 bands of the shared signature are hot: ${hot.toSeq}")
  }

  test("mm_shared_frames: hot-frame df cap excludes boilerplate, mm_hot_frames reports it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // plant: a 60-copy boilerplate clip (every frame df = 60 > cap 50)
    // that without the stop-list would emit 60*59/2 = 1770 pairs, plus a
    // normal near-dup pair that must survive the cap
    val r = new scala.util.Random(11)
    def doc(): String = Seq.fill(200)("abcdefghij".charAt(r.nextInt(10))).mkString
    val boiler = doc()
    val base = doc(); val variant = base.take(150) + ("zz" + base.drop(152))
    val rows = (1L to 60L).map(i => (i, boiler)) ++
      Seq((100L, base), (101L, base), (102L, variant))
    val dir = java.nio.file.Files.createTempDirectory("graft_hotframes").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.parquet(dir + "/documents.parquet")
    val pairs = SparkEntry.queries("mm_shared_frames")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // boilerplate copies must NOT pair (their frames are all above the cap)
    assert(!pairs.keySet.exists(p => p._1 <= 60L || p._2 <= 60L),
      s"hot-frame pairs leaked through the cap: ${pairs.keySet.take(5)}")
    // the normal near-dup pair survives
    assert(pairs.get((100L, 101L)) === Some(4L), s"identical pair lost to the cap: $pairs")
    assert(pairs.get((100L, 102L)) === Some(3L))
    // and the dropped prints are visible in the readout: 4 hot frames, df = 60
    val hot = SparkEntry.queries("mm_hot_frames")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(hot.length === 4, s"expected the 4 boilerplate frame checksums: ${hot.toSeq}")
    assert(hot.forall(_._3 === 60L), s"hot df must be the copy count: ${hot.toSeq}")
    assert(hot.map(_._1).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("mm_silence_spans: spans are maximal runs of sub-threshold windows") {
    val wins = SparkEntry.queries("mm_audio_window")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    val silent = wins.filter(_._3 < 98.5)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val spans = SparkEntry.queries("mm_silence_spans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every span covers exactly its windows, all silent, and is maximal
    spans.foreach { case (doc, s, e, n) =>
      assert(e - s + 1 === n, "span length must equal its window count")
      (s to e).foreach(w => assert(silent(doc).contains(w), s"doc $doc win $w not silent"))
      assert(!silent.getOrElse(doc, Set.empty).contains(s - 1), "span must be left-maximal")
      assert(!silent.getOrElse(doc, Set.empty).contains(e + 1), "span must be right-maximal")
    }
    // and every silent window is covered by exactly one span
    val covered = spans.flatMap { case (doc, s, e, _) => (s to e).map(doc -> _) }
    assert(covered.length === covered.distinct.length, "spans must not overlap")
    assert(covered.toSet === silent.toSeq.flatMap { case (d, ws) => ws.map(d -> _) }.toSet)
  }
  test("mm_scene_cuts: frame features and cut flags match a local recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val flen = text.length / 16
      if (flen == 0) Seq.empty
      else {
        val spaces = (0 until 16).map { i =>
          val frame = text.slice(i * flen, math.min(i * flen + flen, text.length))
          frame.count(_ == ' ').toLong
        }
        spaces.zipWithIndex.map { case (ns, i) =>
          val delta = if (i == 0) None else Some(math.abs(ns - spaces(i - 1)))
          (id, i.toLong, ns, delta, delta.exists(_ * 50 > flen))
        }
      }
    }.toSet
    val got = SparkEntry.queries("mm_scene_cuts")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet
    assert(got === want)
    assert(got.exists(_._5), "corpus should contain at least one cut")
  }
}
