package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature
  * extraction runs batched per partition.
  *
  * The container has no image/audio codecs, so [[FakeDecoder]] is a
  * clearly-marked deterministic stand-in — it parses nothing, it
  * derives plausible metadata from the bytes. Everything around it
  * (schema, batching, partition-level iteration, metadata projection)
  * is the real Spark plumbing a production decoder would drop into.
  *
  * Scale notes: payload columns are only ever passed through
  * `mapPartitions` (no per-row UDF setup cost, codec state amortized
  * across a partition) and metadata-only queries never touch the
  * payload column — parquet column pruning keeps the bytes on disk.
  */
object Multimodal {

  /** Decoded-media metadata schema — the typed face of the opaque blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("magic_hex", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false)))

  /** STUB — deterministic fake decode. A real build links an image
    * codec here (same signature: bytes in, metadata out); everything
    * downstream is unchanged.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Long, String, Long, Long) = {
      val n = payload.length.toLong
      val magic = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
      val w = 32L + (n % 480L)
      val h = 32L + ((if (n > 0) (payload(0) & 0xffL) else 0L) % 224L)
      (n, magic, w, h)
    }
  }

  /** Attach a synthetic binary payload column (UTF-8 bytes of a text
    * column) — the fixture path; real pipelines read binary parquet.
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Batched decode over partitions: the production shape
    * (`mapPartitions`, codec state per partition, typed Row out).
    */
  def decodeMeta(withPayloadDf: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = withPayloadDf.sparkSession
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: mediaMetaSchema.fields.toSeq)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloadDf.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, buffers)
        rows.map { r =>
          val id = r.getLong(0)
          val (n, magic, w, h) = FakeDecoder.decode(r.getAs[Array[Byte]](1))
          Row(id, n, magic, w, h)
        }
      }(encoder)
  }

  /** Pure-SQL metadata projection (no decoder) — byte length + magic
    * prefix + the FakeDecoder dimension formulas as Catalyst
    * expressions. Engine-portable; used by the oracle-checked query.
    */
  def metaSql(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val payload = col(textCol).cast("binary")
    val nBytes = octet_length(payload).cast("long")
    docs.select(
      col(idCol),
      nBytes.as("n_bytes"),
      lower(hex(substring(payload, 1, 4))).as("magic_hex"),
      (lit(32L) + nBytes % 480).as("width"),
      (lit(32L) + ascii(substring(col(textCol), 1, 1)) % 224).as("height"))
  }
}
