package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("partition-wise decode: schema, determinism, magic detection") {
    import spark.implicits._
    val media = Tables.pages(spark, sf("sf0.001"))
      .withColumn("payload", expr("encode('<html><body>' || text || '</body></html>', 'UTF-8')"))
      .select(col("doc_id"), col("payload")).as[MediaRow]

    val f1 = extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val f2 = extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f1.length === 500)
    assert(f1.forall(_.magic == "html"))
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(r => r.feature.forall(v => v >= 0f && v < 1f)))
    // deterministic across runs (resume-safe)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.feature.toSeq === b.feature.toSeq)
      assert(a.byte_len === b.byte_len)
    }
    // byte_len matches the payload exactly (opaque carry)
    val lens = media.collect().map(r => r.doc_id -> r.payload.length).toMap
    f1.foreach(r => assert(r.byte_len === lens(r.doc_id)))
  }

  test("unknown payloads classify as bin") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, Array[Byte](0x00, 0x01, 0x02, 0x03))).toDS()
    val f = extractFeatures(spark, media).collect().head
    assert(f.magic === "bin")
  }
}
