package graft.sources

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV sources S1–S4 from SURVEY.md §2.1.
  *
  * All dialect/discovery decisions are driver-side (they need only file
  * metadata); the actual scan is a distributed Spark CSV read, so
  * Catalyst still gets column pruning + filter pushdown on top.
  */
object CsvSources {

  private def requireExists(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new FileNotFoundException(s"File not found: $path")
  }

  /** S1: robust scan — tries (sep, encoding) in the reference's order
    * ((";",latin1), (",",latin1), (";",utf-8), (",",utf-8)) and accepts
    * the first parse yielding >= 1 column
    * (/root/reference/etl_cid10.py:28-39).
    */
  def readRobust(spark: SparkSession, path: String): DataFrame = {
    requireExists(spark, path)
    val dialects = Seq(
      (";", "ISO-8859-1"), (",", "ISO-8859-1"),
      (";", "UTF-8"), (",", "UTF-8"))
    dialects.iterator
      .map { case (sep, enc) =>
        try {
          val df = spark.read
            .option("header", "true").option("sep", sep)
            .option("encoding", enc).csv(path)
          if (df.columns.length >= 1) Some(df) else None
        } catch { case _: Exception => None }
      }
      .collectFirst { case Some(df) => df }
      .getOrElse(spark.read.option("header", "true").csv(path))
  }

  /** Dialect auto-detection done right (engine extension, not parity):
    * the reference's cascade accepts the first parse yielding >= 1
    * column, so a comma-separated file read with sep=';' "succeeds" as
    * one garbled column — readRobust mirrors that faithfully. This
    * variant instead requires a parse to yield >= 2 columns before
    * accepting it, falling back to the reference order otherwise.
    */
  def readAuto(spark: SparkSession, path: String): DataFrame = {
    requireExists(spark, path)
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val buf = new Array[Byte](64 * 1024)
      val n = try in.read(buf) finally in.close()
      val head = buf.take(math.max(n, 0))
      // Encoding: latin1 decodes anything, so column counts can't tell
      // the encodings apart — strict-validate a prefix as UTF-8 instead
      // (accented latin1 text is almost never valid UTF-8).
      val enc = {
        val dec = StandardCharsets.UTF_8.newDecoder()
        try { dec.decode(java.nio.ByteBuffer.wrap(head)); "UTF-8" }
        catch { case _: Exception => "ISO-8859-1" }
      }
      // Separator: whichever of ';' ',' '\t' '|' splits the header line
      // into the most fields.
      val header = new String(head, enc).linesIterator.nextOption().getOrElse("")
      val sep = Seq(";", ",", "\t", "|")
        .maxBy(s => header.split(java.util.regex.Pattern.quote(s), -1).length)
      spark.read.option("header", "true").option("sep", sep)
        .option("encoding", enc).csv(path)
    } catch { case _: Exception => readRobust(spark, path) }
  }

  /** S2: plain CSV scan (",", UTF-8, header) with existence check. */
  def readDefault(spark: SparkSession, path: String): DataFrame = {
    requireExists(spark, path)
    spark.read.option("header", "true").csv(path)
  }

  /** S3: fixed official DataSUS dialect (";", latin1, header). */
  def readOfficial(spark: SparkSession, path: String): DataFrame = {
    requireExists(spark, path)
    spark.read.option("header", "true").option("sep", ";")
      .option("encoding", "ISO-8859-1").csv(path)
  }

  /** S4: directory discovery — first file whose name case-insensitively
    * contains `fragment` and ends in .csv
    * (/root/reference/etl_cid10.py:204-209).
    */
  def findByFragment(spark: SparkSession, dir: String, fragment: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory)
      throw new FileNotFoundException(s"Directory not found: $dir")
    fs.listStatus(p).map(_.getPath)
      .find { f =>
        val n = f.getName.toLowerCase
        n.contains(fragment.toLowerCase) && n.endsWith(".csv")
      }
      .map(_.toString)
      .getOrElse(throw new FileNotFoundException(
        s"No CSV matching fragment '$fragment' in $dir"))
  }
}
