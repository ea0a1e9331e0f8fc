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
}
