package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Multimodal column handling: images/audio/video travel as opaque
  * `binary` columns plus typed metadata structs. The Spark-side plumbing —
  * schemas, partitioning, per-partition batch shape — is real; the decode
  * kernels themselves are STUBS (deterministic fakes derived from the
  * bytes), because no image/audio codec libraries exist in this
  * environment. Swap [[ImageCodec]] for a real implementation and nothing
  * else changes.
  *
  * Scale design: decode work is embarrassingly parallel per row but
  * memory-heavy per item, so [[decodeImages]] goes through `mapPartitions`
  * (one decoder instance per partition, streaming iterator — the Scala
  * analog of `mapInPandas` batches) and callers control parallelism by
  * `repartition(n)` on the binary column's table, NOT by collecting.
  */
object Multimodal {

  /** metadata struct carried next to every image payload */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decode kernel: deterministic pseudo-properties from the payload
    * bytes. A real deployment replaces this object only. */
  object ImageCodec {
    def probe(bytes: Array[Byte]): (Int, Int, Int, String) = {
      // ??? real: parse the container header. Deterministic fake:
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 1921)
      val ht = 64 + math.abs((h / 1921) % 1081)
      (w, ht, 3, if (h % 2 == 0) "png" else "jpeg")
    }

    /** ??? real: decode + pool pixels. Deterministic fake feature vector. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 1469598103934665603L
      var i = 0
      while (i < bytes.length) {
        acc = (acc ^ bytes(i)) * 1099511628211L
        out(math.abs((acc % dim).toInt)) += ((acc >>> 32).toInt % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Wrap a text/id table into a multimodal frame: payload bytes + probed
    * metadata. (In production the binary column comes from the lakehouse;
    * here payloads are synthesized from any string column.) The stub probe
    * is a pure expression over the payload hash — codegen'd, no UDF. */
  def withImagePayload(df: DataFrame, srcCol: String,
                       contentCol: String = "content"): DataFrame = {
    val h = xxhash64(col(contentCol))
    df.withColumn(contentCol, col(srcCol).cast(BinaryType))
      .withColumn("meta", struct(
        (lit(64) + pmod(h, lit(1921)).cast("int")).as("width"),
        (lit(64) + pmod(h / 1921, lit(1081)).cast("int")).as("height"),
        lit(3).as("channels"),
        when(pmod(h, lit(2)) === 0, "png").otherwise("jpeg").as("format")))
  }

  /** Per-partition streaming decode → fixed-dim feature vector column.
    * One kernel instance per partition; rows flow through an iterator
    * (never materialized as a whole partition). */
  def decodeImages(df: DataFrame, contentCol: String, dim: Int = 16,
                   outCol: String = "features"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol,
      ArrayType(FloatType, containsNull = false), nullable = true))
    val idx = inSchema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, buffers)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats = if (bytes == null) null
        else ImageCodec.features(bytes, dim).toSeq
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Metadata-level resize: target box, preserve aspect (pure expression —
    * the pixel work is the stub's concern, the bookkeeping is real). */
  def resizeMeta(df: DataFrame, metaCol: String, maxW: Int, maxH: Int): DataFrame = {
    val w = col(s"$metaCol.width").cast("double")
    val h = col(s"$metaCol.height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    df.withColumn("resized_meta", struct(
      round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height"),
      col(s"$metaCol.channels").as("channels"),
      col(s"$metaCol.format").as("format")))
  }

  /** Frame sampling plan for video-ish payloads: every k-th frame index up
    * to `maxFrames` — generated as an array column, exploded downstream by
    * the caller when fan-out is wanted. */
  def frameSamplePlan(df: DataFrame, nFramesCol: String, every: Int,
                      maxFrames: Int): DataFrame =
    df.withColumn("sampled_frames",
      slice(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(every)),
        lit(1), lit(maxFrames)))
}
