package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * binary columns with typed metadata; decode / feature-extract runs as a
  * partition-wise pipeline (the Scala analogue of mapInPandas — one
  * initialisation per partition, streaming iterator, no per-row setup).
  *
  * The actual codec is a STUB (this container ships no image/audio libs):
  * `decodeStub` produces a deterministic fake feature vector from the
  * payload bytes. The Spark-side contract — schema, batch shape, partition
  * preservation, null behaviour — is real and tested; swapping the stub
  * for a JNI/FFM codec changes no plan shape.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Int, magic: String,
                           feature: Array[Float])

  /** STUB decoder: replace with a real codec; deterministic by design so
    * tests and resumed jobs agree. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < 8) {
      val m = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL + j
      out(j) = ((m >>> 40) & 0xffff).toFloat / 65536.0f
      j += 1
    }
    out
  }

  /** Partition-wise decode: per-partition init happens once (here, a magic
    * table lookup stand-in), rows stream through. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // one-time per-partition initialisation (real codecs open contexts here)
      val magicTable: Map[String, String] = Map(
        "3c68746d" -> "html", "ffd8ff" -> "jpeg", "89504e47" -> "png")
      rows.map { r =>
        val hex = r.payload.take(4).map(b => f"${b & 0xff}%02x").mkString
        val magic = magicTable.collectFirst {
          case (p, name) if hex.startsWith(p) => name
        }.getOrElse("bin")
        MediaFeatures(r.doc_id, r.payload.length, magic, decodeStub(r.payload))
      }
    }
  }
}
