package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * as opaque `binary` columns with typed metadata, plus decode /
 * feature-extract / resize / frame-sample operators.
 *
 * The codec step itself is STUBBED (this container has no image/audio
 * libraries): `DecodeStub` produces deterministic fake pixels/samples from
 * the bytes. Everything Spark-side is real and tested — the schema, the
 * `spark.read.format("binaryFile")` source, partition sizing, and the
 * mapPartitions batch shape (the Scala twin of a Pandas-UDF/mapInPandas
 * pipeline: batched rows in, batched rows out, codec state initialized once
 * per partition, never per row).
 *
 * Scale notes: media blobs are large and skewed — `repartitionByBytes`
 * targets a fixed bytes-per-task so one 4 GB video doesn't starve a task
 * slot that got 10k thumbnails; metadata-only queries never touch the blob
 * column (parquet column pruning drops it at the reader).
 */
object Multimodal {

  /** Media row: opaque payload + typed metadata (SURVEY north-star family). */
  final case class MediaItem(
      media_id: String,
      kind: String,            // image | audio | video
      payload: Array[Byte],
      mime_type: String,
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long],
      source_path: String)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("mime_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("source_path", StringType)))

  /** Decoded-feature row produced by the decode/extract stage. */
  final case class MediaFeatures(
      media_id: String,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float])

  /**
   * Ingest a directory of files as media rows via Spark's binaryFile source
   * (S11 twin: artifact files ↔ table rows).
   */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("media_id"),
        lit("image").as("kind"),
        col("content").as("payload"),
        lit("application/octet-stream").as("mime_type"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        col("path").as("source_path"))

  /**
   * Deterministic fake codec: "decodes" payload bytes into a fixed-dim
   * feature vector (per-bucket byte sums, exact integer accumulation, ONE
   * float rounding at the end) and an md5-prefix checksum. Replace with a
   * real codec binding at deployment; the call shape (per-partition init —
   * the MessageDigest is the stand-in for expensive codec state — and
   * batched rows) is the real contract. Both outputs are engine-portable:
   * the DuckDB oracle recomputes them byte for byte, so even the
   * mapPartitions path is hash-checked, not just rows-counted.
   */
  class DecodeStub(dim: Int = 16) extends Serializable {
    // transient + lazy: MessageDigest is NOT serializable — an instance
    // closed over on the driver must re-init its codec state per executor
    @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")

    /** First 15 hex chars of md5(payload) as a 60-bit non-negative long. */
    def checksum(payload: Array[Byte]): Long = {
      digest.reset()
      val hex = digest.digest(payload).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }

    def decode(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff)
        i += 1
      }
      acc.map(a => (a / 255.0).toFloat)
    }
  }

  /**
   * Decode/feature-extract over mapPartitions: codec initialized ONCE per
   * partition (the expensive step with a real library), rows streamed
   * through it in batch. Returns a typed Dataset.
   */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new DecodeStub(dim) // per-partition init, never per-row
        rows.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          MediaFeatures(id, kind, bytes.length.toLong,
            codec.checksum(bytes), codec.decode(bytes))
        }
      }
  }

  /** One ViT-style patch of a media payload: exact integer byte-bucket
    * sums, so the downstream pooling/normalization arithmetic is
    * bit-replayable by the DuckDB oracle. */
  final case class PatchFeatures(
      media_id: String,
      patch_idx: Int,
      n_bytes: Long,
      features: Array[Long])

  /**
   * ViT-style patchification over mapPartitions: the payload splits into
   * `grid` contiguous byte slices (byte i → patch min(i·grid/len, grid−1)
   * — exact integer math), each slice fake-decoded to a `dim`-vector of
   * byte-bucket sums (bucket = global byte index mod dim; exact Long, ONE
   * float conversion deferred to [[pooledEmbedding]]). One output row per
   * patch — the batch shape a real vision encoder consumes (patches in,
   * patch vectors out), with codec state per partition as in
   * [[extractFeatures]]. Empty payloads yield no rows.
   */
  def patchFeatures(media: DataFrame, grid: Int = 4, dim: Int = 16): Dataset[PatchFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload0) =>
          val payload = if (payload0 == null) Array.emptyByteArray else payload0
          val len = payload.length
          if (len == 0) Iterator.empty
          else {
            val acc = Array.fill(grid)(new Array[Long](dim))
            var i = 0
            while (i < len) {
              val p = math.min((i.toLong * grid / len).toInt, grid - 1)
              acc(p)(i % dim) += (payload(i) & 0xff)
              i += 1
            }
            (0 until grid).iterator.map(p =>
              PatchFeatures(id, p, len.toLong, acc(p)))
          }
        }
      }
  }

  /**
   * Pooled media embedding from patch features: per-dim sums across the
   * patches (exact Long — the un-divided sum IS the mean-pool direction,
   * cosine being scale-invariant), L2-normalized in double, rounded to
   * 6 dp and quantized to float — the same float-boundary discipline the
   * v3 oracles use, so a cross-modal cosine against the `embeddings`
   * corpus hash-matches DuckDB's `::FLOAT::DOUBLE` replay. Two keyed
   * shuffles on (media_id[, dim]) — O(#media · dim) rows, never
   * payload-proportional.
   */
  def pooledEmbedding(patches: DataFrame, dim: Int): DataFrame =
    patches
      .select(col("media_id"), posexplode(col("features")).as(Seq("j", "v")))
      .groupBy(col("media_id"), col("j"))
      .agg(sum(col("v")).as("s"))
      .groupBy(col("media_id"))
      .agg(sort_array(collect_list(struct(col("j"), col("s")))).as("kv"))
      .select(col("media_id"),
        expr("transform(kv, x -> cast(x.s as double))").as("pooled"))
      .withColumn("__norm",
        sqrt(aggregate(col("pooled"), lit(0.0d), (a, x) => a + x * x)))
      .filter(col("__norm") > 0)
      .select(col("media_id"),
        expr("transform(pooled, x -> cast(round(x / __norm, 6) as float))")
          .as("embedding"))

  /**
   * Resize metadata op (F15 aspect-ratio math as a column expression; the
   * pixel work happens in the codec stage).
   */
  def withResizedDims(media: DataFrame, targetWidth: Int): DataFrame =
    media
      .withColumn("resized_width", lit(targetWidth))
      .withColumn("resized_height",
        when(col("width").isNotNull && col("width") > 0,
          floor(col("height") * targetWidth / col("width")).cast("int")))

  /**
   * Frame sampling for video rows: one output row per sampled frame index
   * (duration-spaced), payload left opaque — the decode stage slices it.
   */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_idx", (col("frame_ms") / everyMs).cast("int"))

  /**
   * Bytes-aware repartition: target a fixed payload volume per task so blob
   * skew doesn't serialize the stage (count partitions from the actual byte
   * sizes, then hash-distribute).
   */
  def repartitionByBytes(media: DataFrame, targetBytesPerTask: Long): DataFrame = {
    val totalBytes = media.select(sum(length(col("payload")).cast("long")))
      .collect()(0).getLong(0)
    val nParts = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerTask).toInt)
    media.repartition(nParts, col("media_id"))
  }
}
