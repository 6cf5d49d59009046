package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side index-parameter sidecar (`<index>/params.txt`) shared by
  * every persisted-index family (signature / substring / line / CMS /
  * IVF / trained-IVF / IVF-PQ).
  *
  * The previous spelling stored the same handful of values as a 1-ROW
  * PARQUET TABLE, which prices a full Spark job at write time and
  * another at every probe/append read-back — r15 measured ~0.15 s per
  * write and ~0.1 s per `head()` read at 32 cores, across ~40 such
  * jobs in the bench suite, all to move a few ints. Index parameters
  * are driver-side METADATA, not a dataset — the manifest-file
  * convention of the table formats (optimization guide §6) — so this
  * writes them through the Hadoop FS API (works on HDFS/object-store
  * paths exactly like the rename-swap compactors) as `key=value`
  * lines with URL-encoded values (a line-index delimiter can be
  * "\n"). Readers keep the identical loud-mismatch contract the
  * parquet form had; a missing sidecar fails with the same
  * "no such index" loudness a missing parquet dir did. */
object IndexMeta {

  private def metaPath(dir: String) = new Path(s"$dir/params.txt")

  /** Overwrite the sidecar. Field order is preserved (stable bytes for
    * a given index — diff-friendly, like every other index artifact). */
  def write(spark: SparkSession, dir: String,
      fields: Seq[(String, String)]): Unit = {
    val p = metaPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(fields.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  def writeInts(spark: SparkSession, dir: String,
      fields: (String, Int)*): Unit =
    write(spark, dir, fields.map { case (k, v) => (k, v.toString) })

  /** Read the sidecar back as a key → value map (loud on a missing or
    * malformed file — the index-layout contract error, not a silent
    * empty map). */
  def read(spark: SparkSession, dir: String): Map[String, String] = {
    val p = metaPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    body.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      require(i > 0, s"malformed index params line in $p: '$line'")
      line.substring(0, i) ->
        java.net.URLDecoder.decode(line.substring(i + 1), "UTF-8")
    }.toMap
  }

  def readInt(spark: SparkSession, dir: String, key: String): Int =
    readInts(spark, dir, key).head

  /** Read several int fields at once (ONE sidecar read). Missing keys
    * fail loudly with the sidecar path and key name. */
  def readInts(spark: SparkSession, dir: String,
      keys: String*): Seq[Int] = {
    val m = read(spark, dir)
    keys.map { k =>
      require(m.contains(k),
        s"index params at ${metaPath(dir)} carry no field '$k' — " +
          s"present: ${m.keys.toSeq.sorted.mkString(", ")}")
      m(k).toInt
    }
  }
}
