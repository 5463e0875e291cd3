package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample stages.
  *
  * No image/audio codecs exist in this container, so the DECODE KERNEL is
  * a deterministic stand-in (clearly marked below) — but everything
  * around it is the real production shape:
  *  - media rows are (id, payload: binary, meta: struct<mime,width,
  *    height,n_frames>) — the schema a lakehouse media table has;
  *  - the batch path is Dataset.mapPartitions over an iterator of rows
  *    (the JVM twin of mapInPandas: per-partition batch processing, one
  *    codec init per partition, streaming iterator in/out — this is the
  *    ONE legitimate mapPartitions in the codebase: imperative per-batch
  *    logic a Column expression can't express);
  *  - resize / frame-sample are metadata+payload transforms emitting the
  *    same typed shape downstream consumers join on.
  *
  * Because the stub kernel is md5/length-based, the whole pipeline stays
  * DuckDB-oracle-checkable — swap [[decodeKernel]] for a real codec and
  * only the oracle (not the plumbing) stops applying.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Media table synthesized deterministically from `documents`: payload
    * = utf-8 bytes of the text (stand-in for image bytes), metadata
    * derived from doc fields. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(
      $"doc_id".as("media_id"),
      to_binary($"text", lit("utf-8")).as("payload"),
      struct(
        lit("image/fake").as("mime"),
        (($"doc_id" % 640) + 64).cast("int").as("width"),
        (($"doc_id" % 480) + 48).cast("int").as("height"),
        (($"doc_id" % 24) + 1).cast("int").as("n_frames")).as("meta"))
  }

  /** The stand-in decode kernel: >>> STUB — replace with a real codec
    * (e.g. libjpeg/ffmpeg via JNI) in production. <<< Computes
    * deterministic "features" from raw bytes: byte length, a 48-bit
    * content hash, and a fake luminance = mean byte value. */
  private[llm] def decodeKernel(payload: Array[Byte]): (Long, Long, Double) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).take(6).map("%02x".format(_)).mkString
    val fp = java.lang.Long.parseLong(hex, 16)
    val lum =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
    (payload.length.toLong, fp, lum)
  }

  private val outSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("fp48", LongType),
    StructField("luminance", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Decode + feature-extract via mapPartitions — the batch-UDF shape:
    * iterator in, one kernel "init" per partition, iterator out. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "payload", "meta.width", "meta.height")
      .mapPartitions { rows =>
        // per-partition init would live here (codec contexts, buffers)
        rows.map { r =>
          val (n, fp, lum) = decodeKernel(r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("media_id"), n, fp, lum,
            r.getAs[Int]("width"), r.getAs[Int]("height"))
        }
      }(enc)
  }

  /** Resize: pure metadata/shape transform (native columns — no kernel
    * needed for the bookkeeping half of a real resize). */
  def resize(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
        least(lit(1.0),
          lit(maxSide) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("out_width", floor(col("meta.width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("meta.height") * col("scale")).cast("int"))

  /** Frame sampling: k evenly spaced frame indices from n_frames —
    * the video-side planning step (which frames to decode). */
  def sampleFrames(media: DataFrame, k: Int): DataFrame =
    media.withColumn("frame_ids",
      transform(sequence(lit(0), lit(k - 1)),
        i => floor(i * col("meta.n_frames") / k).cast("int")))

  private val decodeQ: Q = (spark, dir) => decodeFeatures(spark, dir)

  private val resizeQ: Q = (spark, dir) => {
    import spark.implicits._
    resize(mediaTable(spark, dir), 256)
      .select($"media_id", $"meta.width".as("width"), $"meta.height".as("height"),
        $"out_width", $"out_height")
  }

  private val framesQ: Q = (spark, dir) => {
    import spark.implicits._
    sampleFrames(mediaTable(spark, dir), 4)
      .select($"media_id", $"meta.n_frames".as("n_frames"),
        concat_ws(",", transform($"frame_ids", i => i.cast("string")))
          .as("frame_ids"))
  }

  val queries: Map[String, Q] = Map(
    "mm_decode"        -> decodeQ,
    "mm_resize"        -> resizeQ,
    "mm_frame_sample"  -> framesQ)

  val oracles: Map[String, String] = Map(
    // documents text is pure ASCII (checked) → bytes == chars, so the
    // byte-mean is expressible with ord(substr()).
    "mm_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) AS fp48,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1),
        |       i -> ord(substr(text, CAST(i AS INT), 1)))) AS DOUBLE)
        |    / length(text) AS luminance,
        |  CAST((doc_id % 640) + 64 AS INT) AS width,
        |  CAST((doc_id % 480) + 48 AS INT) AS height
        |FROM documents""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id AS media_id,
        |  CAST((doc_id % 640) + 64 AS INT) AS width,
        |  CAST((doc_id % 480) + 48 AS INT) AS height,
        |  CAST(floor(((doc_id % 640) + 64) *
        |    least(1.0, 256.0 / greatest((doc_id % 640) + 64, (doc_id % 480) + 48))) AS INT)
        |    AS out_width,
        |  CAST(floor(((doc_id % 480) + 48) *
        |    least(1.0, 256.0 / greatest((doc_id % 640) + 64, (doc_id % 480) + 48))) AS INT)
        |    AS out_height
        |FROM documents""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  CAST((doc_id % 24) + 1 AS INT) AS n_frames,
        |  array_to_string(list_transform(generate_series(0, 3),
        |    i -> CAST(CAST(floor(i * ((doc_id % 24) + 1) / 4.0) AS BIGINT) AS VARCHAR)), ',')
        |    AS frame_ids
        |FROM documents""".stripMargin)
}
