package graft

import graft.functions.{GraftFunctions, PolyHash}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class FunctionsSpec extends SparkSpec {

  test("graft_poly_hash equals the HOF Horner formulation") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf).limit(50)
    val both = docs.select(
      expr("graft_poly_hash(text)").as("fast"),
      expr("aggregate(sequence(1, length(text)), CAST(0 AS BIGINT), " +
        "(acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % 1000000007)").as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("poly_hash scalar matches a hand-rolled reference") {
    val s = "abc"
    val expected = (('a'.toLong * 31 + 'b') * 31 + 'c') % 1000000007L
    assert(PolyHash.hash(UTF8String.fromString(s)) === expected)
    assert(PolyHash.hash(UTF8String.fromString("")) === 0L)
  }

  test("graft_dot_long equals the zip_with formulation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), (Seq(-2L, 7L), Seq(3L, 1L)))
      .toDF("a", "b")
    val both = df.select(
      call_function("graft_dot_long", col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() === 0)
    assert(both.head.getLong(0) === 32L)
  }

  test("graft_shingle_hashes equals the substr+poly_hash formulation") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf).limit(50)
    // the chain it replaced: string shingles → distinct → poly_hash each;
    // compare as sorted sets (dedup by hash == dedup by string under min)
    val both = docs.select(
      sort_array(call_function("graft_shingle_hashes", col("text"), lit(5))).as("fast"),
      sort_array(array_distinct(transform(
        array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
          i => col("text").substr(i, lit(5)))),
        sh => call_function("graft_poly_hash", sh)))).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() === 0)
    // short-text edge: whole text hashes as the single shingle
    import spark.implicits._
    val short = Seq("ab").toDF("text").select(
      call_function("graft_shingle_hashes", col("text"), lit(5)).as("h"),
      expr("graft_poly_hash(text)").as("w"))
    val r = short.head
    assert(r.getSeq[Long](0) === Seq(r.getLong(1)))
  }

  test("graft_stop_counts equals the split+filter+isin formulation") {
    GraftFunctions.register(spark)
    import graft.functions.StopCounts
    // corpus texts plus hand-planted edges: empty text (split yields one
    // empty token), repeated/trailing separators (Java split at limit -1
    // keeps the empty segments), MIXED CASE hits, a word on two language
    // lists ("de" is only on the Spanish list — plant it), and CJK
    // stopwords (multi-byte UTF-8 around the 0x20 byte walk)
    import spark.implicits._
    val planted = Seq("", " ", "The AND of", "de los  el las", "我 是 the 的",
      "the theater thee the.", "a  b   c ").toDF("text")
    val docs = Tables.documents(spark, sf).limit(50).select("text")
      .unionByName(planted)
    val slowTokens = split(lower(col("text")), " ")
    def slowCount(ws: Seq[String]) =
      size(filter(slowTokens, t => t.isin(ws.map(_.asInstanceOf[Any]): _*))).cast("long")
    val fast = call_function("graft_stop_counts", col("text"))
    val checks = (size(slowTokens).cast("long") === fast.getItem(0)) +:
      StopCounts.langs.zipWithIndex.map { case ((_, ws), i) =>
        slowCount(ws) === fast.getItem(i + 1)
      }
    assert(docs.filter(!checks.reduce(_ && _)).count() === 0)
  }

  test("every graft expression compiles under CODEGEN_ONLY (no silent fallback)") {
    // Under the default FALLBACK factory mode a janino compile error
    // demotes the whole projection to interpreted mode with only a WARN —
    // which is how ShingleHashes' eval-named companion (static forwarder
    // suppressed by the name clash with Expression.eval) ran interpreted
    // for two rounds. CODEGEN_ONLY turns that class of regression into a
    // hard test failure.
    GraftFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import spark.implicits._
      val planes = graft.similarity.Similarity.hyperplanes(nBits = 6, dim = 3)
      val flat = planes.flatten
      val df = Seq(("abcdefgh", Seq(1.0f, 2.0f, 3.0f), Seq(1L, 2L, 3L)))
        .toDF("text", "emb", "q")
      val out = df.select(
        expr("graft_poly_hash(text)"),
        call_function("graft_shingle_hashes", col("text"), lit(5)),
        call_function("graft_dot_long", col("q"), col("q")),
        call_function("graft_dot_planes", col("emb"), typedLit(flat)),
        expr("graft_nfc(text)"),
        call_function("graft_winnow", col("text"), lit(3), lit(2)),
        expr("graft_stop_counts(text)"))
      assert(out.collect().length === 1)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("winnowing guarantees a shared fingerprint for long shared substrings") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val (k, w) = (5, 8)
    // any shared substring of length >= w + k - 1 = 12 must share a print
    val shared = "the quick brown fox jumps"
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"xyzzy prefix then $shared and a different tail"))
    val fps = docs.toDF("id", "text")
      .select(col("id"), call_function("graft_winnow", col("text"), lit(k), lit(w)).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "documents sharing a 25-char substring must share a winnowing fingerprint")
    // density: ~2/(w+1) of positions, never more than the window count
    val n = docs.head._2.length - k + 1 - w + 1
    assert(fps(1L).size <= n)
    // disjoint texts share nothing
    val other = Seq((3L, "completely unrelated content 1234567 here"))
      .toDF("id", "text")
      .select(call_function("graft_winnow", col("text"), lit(k), lit(w)))
      .head().getSeq[Long](0).toSet
    assert(fps(1L).intersect(other).isEmpty)
  }

  test("graft_kmv_agg accepts any integral literal k and rejects non-literals") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (1L to 100L).toDF("h")
    // INT and BIGINT literals (and a SQL CAST) must agree
    val a = df.agg(expr("graft_kmv_agg(h, 16)")).head().getSeq[Long](0)
    val b = df.agg(expr("graft_kmv_agg(h, CAST(16 AS BIGINT))")).head().getSeq[Long](0)
    assert(a === b)
    // non-literal / invalid k fails with a real message, not a CCE/NPE
    val e1 = intercept[Exception] { df.agg(expr("graft_kmv_agg(h, h)")).head() }
    assert(e1.getMessage.contains("literal integer"), e1.getMessage)
    val e2 = intercept[Exception] { df.agg(expr("graft_kmv_agg(h, -3)")).head() }
    assert(e2.getMessage.contains("invalid k"), e2.getMessage)
  }

  test("graft_dot_planes equals the per-plane HOF formulation") {
    GraftFunctions.register(spark)
    import graft.similarity.Similarity
    val planes = Similarity.hyperplanes(nBits = 6, dim = 64)
    val emb = Tables.embeddings(spark, sf).limit(100)
    // the formulation lshBucket replaced: one aggregate(zip_with) per plane
    val slow = planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(col("embedding"), typedLit(p), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = emb.select(
      Similarity.lshBucket(col("embedding"), planes).as("fast"), slow.as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() === 0)
  }
}
