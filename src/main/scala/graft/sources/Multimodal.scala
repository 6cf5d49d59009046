package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (driver north star: "multimodal columns") — the
  * Spark-side plumbing for opaque binary media with typed metadata.
  *
  * Design (see MULTIMODAL.md):
  *  - a multimodal value is `STRUCT(mime STRING, bytes BINARY,
  *    meta MAP<STRING,STRING>)` — the engine never interprets `bytes`
  *    except inside an explicit decode operator;
  *  - ingestion is `spark.read.format("binaryFile")` (streams file
  *    contents as BinaryType with path/length/modTime columns; splittable
  *    across executors by file);
  *  - decode / feature-extract run as `mapPartitions` over the binary
  *    column — iterator-streaming, one media library context per
  *    partition, never a whole-partition materialization. No image/audio
  *    codec ships in this environment, so the decoders below are
  *    DETERMINISTIC STUBS: the partitioning, schema, and batch shape are
  *    real; the pixel math is a placeholder to swap for a codec call.
  */
object Multimodal {

  /** The multimodal column type. */
  val mediaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  private val extToMime = Map(
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
    "wav" -> "audio/wav", "mp3" -> "audio/mpeg", "mp4" -> "video/mp4",
    "md" -> "text/markdown", "scala" -> "text/x-scala", "py" -> "text/x-python")

  /** Ingest a directory of media files as rows of (path, media struct).
    * binaryFile scans parallelize by file; filters on path/length push
    * down to the file listing. */
  def readDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        col("path"),
        struct(
          element_at(
            typedLit(extToMime),
            lower(element_at(split(col("path"), "\\."), -1)))
            .as("mime"),
          col("content").as("bytes"),
          map(
            lit("length"), col("length").cast("string"),
            lit("mtime"), col("modificationTime").cast("string"))
            .as("meta"))
          .as("media"))

  /** STUB image decode: real signature + partition shape, fake pixel math.
    * A production build replaces the body with a codec call (e.g. TwelveMonkeys
    * ImageIO) — the iterator-streaming contract stays identical. */
  def decodeDims(df: DataFrame): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING, Encoders.BINARY)
    val out = Encoders.tuple(
      Encoders.STRING, Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaLong)
    df.select(col("path"), col("media.bytes"))
      .as[(String, Array[Byte])](enc)
      .mapPartitions { it =>
        // one decoder context per partition would be initialized HERE
        it.map { case (path, bytes) =>
          // ??? real decode goes here; deterministic fake from content:
          val h = java.util.Arrays.hashCode(bytes)
          val w = 64 + math.abs(h % 1024)
          val ht = 64 + math.abs((h / 1024) % 1024)
          (path, w, ht, bytes.length.toLong)
        }
      }(out)
      .toDF("path", "width", "height", "n_bytes")
  }

  /** STUB feature extraction: fixed-width embedding per media row (fake but
    * deterministic — content-hash seeded), the shape an ANN index ingests. */
  def extractFeatures(df: DataFrame, dims: Int = 8): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING, Encoders.BINARY)
    val out = Encoders.tuple(Encoders.STRING,
      org.apache.spark.sql.Encoders.product[Tuple1[Seq[Float]]])
    df.select(col("path"), col("media.bytes"))
      .as[(String, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (path, bytes) =>
          val h = java.util.Arrays.hashCode(bytes)
          val v: Seq[Float] = (0 until dims).toSeq.map(i =>
            (((h * (i + 1)) % 1000) / 1000.0f))
          (path, Tuple1(v))
        }
      }(out)
      .toDF("path", "features")
      .select(col("path"), col("features._1").as("features"))
  }
}
