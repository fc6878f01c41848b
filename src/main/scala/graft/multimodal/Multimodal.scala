package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column handling: media as opaque `binary` payloads with typed,
  * queryable metadata.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[fakeDecodeMeta]]); everything
  * Spark-side — binary payload column, metadata schema, partition-friendly
  * fingerprinting, batch shape — is real. In production the stub body is
  * replaced by a codec invoked per-partition (mapPartitions over an
  * Iterator[Row] with reused decoder instances); the surrounding plan is
  * unchanged.
  */
object Multimodal {

  /** Extract typed metadata from an opaque binary payload.
    *
    * STUB: width/height/channels are derived deterministically from the
    * payload's md5 — stands in for a real header parse. Byte length and
    * fingerprint are real.
    */
  def meta(s: SparkSession, d: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8") // opaque bytes; stands in for image/audio blobs
    val fp = md5(payload)
    // hex pair -> int in [0, 255], from fixed positions of the fingerprint
    def hexByte(pos: Int) =
      conv(substring(fp, pos, 2), 16, 10).cast("int")
    val out = Tables.documents(s, d).select(
      col("doc_id"),
      length(payload).cast("bigint").as("byte_len"),
      fp.as("fingerprint"),
      (lit(64) + hexByte(1) % 192).cast("bigint").as("fake_width"),   // STUB: header parse
      (lit(64) + hexByte(3) % 192).cast("bigint").as("fake_height"),  // STUB: header parse
      (lit(1) + hexByte(5) % 4).cast("bigint").as("fake_channels"),   // STUB: header parse
      (hexByte(7) % 2 === 0).as("fake_is_keyframe"))                  // STUB: frame sample
    out.orderBy(out.columns.map(col): _*)
  }
}
