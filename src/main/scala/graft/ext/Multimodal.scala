package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed partition-wise.
  *
  * The Spark-side plumbing — schema, partition-preserving mapPartitions,
  * batch shape — is real and tested. The actual media decode is a
  * deterministic STUB (this container ships no image/audio codecs); swap
  * `stubDecode` for a real decoder (e.g. javacv / a Python worker via
  * Arrow) without touching the pipeline shape.
  */
object Multimodal {

  /** Metadata emitted per decoded payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decoder: derives fake-but-deterministic dimensions from the
    * payload length so the full pipeline is verifiable end-to-end.
    * A real decoder reads the actual header here.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, String) = {
    val n = payload.length.toLong
    val width = (64L + n % 512L).toInt
    val height = (64L + (n * 7L) % 512L).toInt
    (width, height, 3, "stub")
  }

  /** Attach a binary payload column derived from a string column (for
    * pipelines whose media arrive embedded as encoded text/bytes). */
  def withBinaryPayload(df: DataFrame, srcCol: String, payloadCol: String): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** Decode payloads partition-wise: one decoder instance per partition
    * (the mapPartitions boundary is where a real codec would be opened
    * once and reused), emitting the original row + metadata struct.
    * Column pruning still applies upstream because only (id, payload) are
    * selected before the imperative boundary.
    */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false)) ++ metaSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .mapPartitions { rows =>
        // real decoder would init once here, per partition
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, ch, fmt) = stubDecode(payload)
          Row(id, payload.length.toLong, w, h, ch, fmt)
        }
      }(enc)
  }

  /** Feature extraction partition-wise (the shape an image/audio embedder
    * takes): one model instance per partition, payload → fixed-dim vector.
    * The STUB derives components deterministically from the byte length so
    * the pipeline (schema array<float>, batch boundary, partitioning) is
    * verifiable; a real extractor replaces the inner function only.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      dim: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .mapPartitions { rows =>
        // real embedder would load weights once here, per partition
        rows.map { r =>
          val n = r.getAs[Array[Byte]](1).length.toLong
          val f = Array.tabulate(dim)(j => ((n * (j + 1)) % 97L).toFloat / 97.0f)
          Row(r.getLong(0), f.toSeq)
        }
      }(enc)
  }

  /** Resize partition-wise (STUB: byte-truncate to maxBytes and re-derive
    * metadata — a real implementation decodes, scales, re-encodes). Output
    * keeps the payload column so resize chains with extractMeta/
    * extractFeatures. */
  def resizePayload(df: DataFrame, idCol: String, payloadCol: String,
                    maxBytes: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)) ++ metaSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val resized = payload.take(maxBytes)
          val (w, h, ch, fmt) = stubDecode(resized)
          Row(r.getLong(0), resized, resized.length.toLong, w, h, ch, fmt)
        }
      }(enc)
  }

  /** Deterministic frame sampling plan for (fake) video payloads: emit
    * `frames` evenly spaced frame indices per row — the explode pattern a
    * real frame extractor would follow (explode THEN decode keeps the heavy
    * work distributed and lets AQE rebalance skewed payloads). */
  def sampleFrameIndices(df: DataFrame, idCol: String, payloadCol: String,
                         frames: Int): DataFrame = {
    val total = octet_length(col(payloadCol)).cast("long")
    df.select(col(idCol).cast("long").as("id"),
        explode(transform(sequence(lit(0), lit(frames - 1)),
          i => floor((i * greatest(total, lit(1L))) / frames).cast("long"))).as("frame_offset"))
  }
}
