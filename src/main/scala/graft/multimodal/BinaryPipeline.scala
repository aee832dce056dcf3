package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata. The DECODE KERNELS ARE
  * DETERMINISTIC STUBS (this container ships no image/audio codecs) —
  * clearly marked below — but the Spark-side plumbing is real and
  * tested: schema contracts, batched per-partition execution (the Scala
  * analog of `mapInPandas` batch shape), partition-count preservation,
  * and explode-based unit decomposition (the reference's frame sampler
  * role, `winnow/feature_extraction/utils.py:25-73`).
  */
object BinaryPipeline {

  final case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)
  final case class Decoded(id: String, meta: MediaMeta)
  final case class Frame(id: String, frameIdx: Int, feature: Array[Float])

  /** STUB decode: derives plausible metadata purely from the bytes
    * (deterministic). In production this is an image/video codec behind
    * a Pandas UDF / mapInPandas; swap the body, keep the signature.
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.isEmpty) return MediaMeta("empty", 0, 0, 0)
    var h = 1125899906842597L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { h = 31 * h + bytes(i); i += 1 }
    val fmts = Array("jpeg", "png", "webp", "mp4")
    MediaMeta(fmts(Math.floorMod(h, 4L).toInt),
      320 + Math.floorMod(h >> 2, 1600L).toInt,
      240 + Math.floorMod(h >> 4, 900L).toInt,
      1 + Math.floorMod(h >> 6, 32L).toInt)
  }

  /** STUB feature extraction: deterministic d-dim embedding from bytes
    * (rolling moments). Production: CNN behind mapInPandas.
    */
  def featurizeStub(bytes: Array[Byte], frameIdx: Int, dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      val j = (i + frameIdx) % dim
      out(j) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / math.max(1, bytes.length / dim); j += 1 }
    out
  }

  /** media(id string, bytes binary) -> typed metadata. Executes as one
    * batched map over partitions (no shuffle); column pruning keeps
    * `bytes` out of any downstream plan that doesn't need it.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("string"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => Decoded(id, decodeStub(bytes)) })
      .toDF()
      .select(col("id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.nFrames").as("n_frames"))
  }

  /** Frame sampling + per-frame features: one output row per sampled
    * frame (`explode`-style unit decomposition), batch shape = partition.
    * stride plays the reference's frames-per-second sampling parameter.
    */
  def sampleAndFeaturize(media: DataFrame, stride: Int = 4, dim: Int = 16): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("string"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val meta = decodeStub(bytes)
          (0 until meta.nFrames by stride).iterator.map { f =>
            Frame(id, f, featurizeStub(bytes, f, dim))
          }
        }
      }
  }

  /** Item-level aggregate over frame features (the reference's
    * frame->video global-vector mean, `loading_utils.py:77-98`) —
    * expressed as a groupBy aggregation over the frame Dataset.
    */
  def itemEmbedding(frames: Dataset[Frame]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.toDF()
      .select(col("id"), col("feature"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_frames"),
        // element-wise mean via posexplode + pivot-free re-collect
        collect_list(col("feature")).as("feats"))
      .withColumn("embedding",
        expr("transform(sequence(0, size(feats[0])-1), " +
          "j -> aggregate(feats, cast(0.0 as double), (acc, f) -> acc + f[j]) / size(feats))"))
      .select(col("id"), col("n_frames"), col("embedding"))
  }
}
