package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Multimodal

/** The multimodal plumbing is real even though the codec is stubbed: reads
  * actual files through binaryFile, checks the struct schema, metadata map,
  * and the partition-wise decode/feature shape (MULTIMODAL.md). */
class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  private def media = Multimodal.readDir(
    spark, "/root/repo/src/main/scala/graft", "*.scala")

  test("binaryFile ingest produces the typed media struct") {
    val df = media
    assert(df.count() > 0)
    val mediaField = df.schema("media").dataType.asInstanceOf[StructType]
    assert(mediaField("mime").dataType == StringType)
    assert(mediaField("bytes").dataType == BinaryType)
    assert(mediaField("meta").dataType ==
      MapType(StringType, StringType))
    val row = df.orderBy("path").head()
    val m = row.getStruct(1)
    assert(m.getAs[String]("mime") == "text/x-scala")
    assert(m.getAs[Array[Byte]]("bytes").nonEmpty)
    assert(m.getAs[Map[String, String]]("meta").contains("length"))
  }

  test("metadata-only query never needs the payload column") {
    val counts = media.groupBy(col("media.mime")).count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) > 0))
  }

  test("stubbed decode is partition-wise, deterministic, and typed") {
    val d1 = Multimodal.decodeDims(media).orderBy("path")
      .collect().map(_.toString).toSeq
    val d2 = Multimodal.decodeDims(media).orderBy("path")
      .collect().map(_.toString).toSeq
    assert(d1 == d2 && d1.nonEmpty)
  }

  test("stubbed feature extraction emits fixed-width float vectors") {
    val f = Multimodal.extractFeatures(media).orderBy("path").head()
    assert(f.getSeq[Float](1).length == 8)
  }
}
