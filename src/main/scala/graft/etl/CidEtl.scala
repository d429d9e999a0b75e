package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CidFunctions._
import graft.operators.{PriorityDedup, RangeJoin}
import graft.sinks.BomCsvSink
import graft.sources.CsvSources

/** The CID-10 consolidation pipeline — full behavioral parity with the
  * reference (/root/reference/etl_cid10.py), re-expressed as lazy
  * DataFrame composition: every join over the small dimension tables is
  * a broadcast join, the hand-rolled O(n·m) range scans become
  * broadcast theta joins with first-match semantics, and the final
  * priority dedup is a single hash-partition window — the only shuffle
  * in the whole plan, partitioned by the dedup key, which is exactly
  * the axis the data would scale on.
  */
object CidEtl {

  val outputCols: Seq[String] = Seq(
    "cid_codigo", "cid_categoria", "cid_subcategoria", "titulo",
    "descricao", "capitulo_codigo", "capitulo_titulo", "bloco_codigo",
    "bloco_titulo", "fonte")

  /** Quality counters the reference prints per run
    * (etl_cid10.py:190-193).
    */
  final case class Quality(total: Long, missingHierarchy: Long)

  // -------------------------------------------------------------------
  // Structured (OMS) branch — etl_cid10.py:52-101
  // -------------------------------------------------------------------

  /** Left-join chain categories→chapters→blocks with the reference's
    * suffix-coalesce semantics: when both categories and blocks carry a
    * `chapter_code`, prefer categories' value, falling back to blocks'
    * (etl_cid10.py:59-67).
    */
  private def categoryMap(chapters: DataFrame, blocks: DataFrame,
                          categories: DataFrame): DataFrame = {
    val withChap =
      categories.join(broadcast(chapters), Seq("chapter_code"), "left")
    val blkHasChapter = blocks.columns.contains("chapter_code")
    val blk = if (blkHasChapter)
      blocks.withColumnRenamed("chapter_code", "__blk_chapter_code")
    else blocks
    val joined = withChap.join(broadcast(blk), Seq("block_id"), "left")
    if (blkHasChapter)
      joined
        .withColumn("chapter_code",
          coalesce(col("chapter_code"), col("__blk_chapter_code")))
        .drop("__blk_chapter_code")
    else joined
  }

  /** Build the structured (OMS) branch: subcategories expanded against
    * the chapter/block/category hierarchy (etl_cid10.py:52-101).
    */
  def buildStructured(chapters: DataFrame, blocks: DataFrame,
                      categories: DataFrame, subcats: DataFrame): DataFrame = {
    val cats = categoryMap(chapters, blocks, categories)
    val full = subcats.join(broadcast(cats), Seq("category_code"), "left")
    val titulo =
      if (full.columns.contains("subcategory_title")) col("subcategory_title")
      else if (full.columns.contains("category_title")) col("category_title")
      else lit(null).cast("string")
    full
      .withColumn("cid_codigo", normalizeCode(col("subcategory_code")))
      .withColumn("cid_categoria", normalizeCode(col("category_code")))
      .withColumn("cid_subcategoria", subcategoryMarker(col("cid_codigo")))
      .withColumn("titulo", titulo)
      .withColumn("descricao", col("titulo"))
      .withColumn("bloco_codigo", colOrNull(full, "block_id"))
      .withColumn("bloco_titulo", colOrNull(full, "block_title"))
      .withColumn("capitulo_codigo", colOrNull(full, "chapter_code"))
      .withColumn("capitulo_titulo", colOrNull(full, "chapter_title"))
      .withColumn("fonte", lit("Estruturada"))
      .select(outputCols.map(col): _*)
  }

  private def colOrNull(df: DataFrame, name: String) =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  // -------------------------------------------------------------------
  // DATASUS enrichment branch — etl_cid10.py:108-155
  // -------------------------------------------------------------------

  /** Normalize an arbitrary DATASUS code list (P2/P3/P4: map-driven
    * rename, positional fallback for the code column, tolerated-missing
    * descricao) and enrich it against the category map (J2).
    */
  def prepareDatasus(raw0: DataFrame, cats: DataFrame): DataFrame = {
    var raw = raw0
    if (raw.columns.contains("codigo"))
      raw = raw.withColumnRenamed("codigo", "cid_codigo")
    if (!raw.columns.contains("cid_codigo"))
      raw = raw.withColumnRenamed(raw.columns.head, "cid_codigo")
    if (!raw.columns.contains("descricao"))
      raw = raw.withColumn("descricao", lit(null).cast("string"))

    val normalized = raw
      .withColumn("cid_codigo", normalizeCode(col("cid_codigo")))
      .withColumn("cid_categoria", extractRootCategory(col("cid_codigo")))
      .withColumn("cid_subcategoria", subcategoryMarker(col("cid_codigo")))
      .withColumn("titulo", col("descricao"))

    val catsNorm = cats
      .withColumn("category_code", normalizeCode(col("category_code")))
      .select("category_code", "block_id", "block_title",
              "chapter_code", "chapter_title")

    normalized
      .join(broadcast(catsNorm),
        normalized("cid_categoria") === catsNorm("category_code"), "left")
      .withColumn("bloco_codigo", col("block_id"))
      .withColumn("bloco_titulo", col("block_title"))
      .withColumn("capitulo_codigo", col("chapter_code"))
      .withColumn("capitulo_titulo", col("chapter_title"))
      .withColumn("fonte", lit("DATASUS"))
      .select(outputCols.map(col): _*)
  }

  // -------------------------------------------------------------------
  // Official DataSUS directory reader — etl_cid10.py:212-327
  // -------------------------------------------------------------------

  /** Stamp a file-order rank on a tiny dim so range joins can reproduce
    * the reference's first-match-in-file-order.
    *
    * Ordering contract: the input must come from exactly ONE CSV file
    * (enforced below — there is no cross-file order to reconstruct).
    * The rank comes from `zipWithIndex`, whose numbering follows
    * partition index then intra-partition order — for a single CSV
    * file, splits are ordered by byte offset and rows stream in file
    * order within each split, so the index IS the line number. (The
    * previous `coalesce(1) + monotonically_increasing_id` relied on
    * coalesce preserving row order, a contract Spark doesn't state.)
    * These dims are catalog-sized (<= a few thousand rows), so the
    * round-trip through an RDD is off any hot path.
    */
  private def withFileOrder(df: DataFrame): DataFrame = {
    require(df.inputFiles.length == 1,
      s"file-order rank needs a single input file, got " +
        s"${df.inputFiles.length} (${df.inputFiles.take(3).mkString(", ")})")
    val schema = df.schema.add("__ord", org.apache.spark.sql.types.LongType,
      nullable = false)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Read the 4 official CSVs and reconstruct the hierarchy: categories
    * get block/chapter via lexicographic containment (J3), blocks get
    * chapters via containment of either bound (J4) — both as broadcast
    * theta joins with first-match row_number instead of the reference's
    * per-row dict scans (etl_cid10.py:266-325).
    */
  def readDatasusOfficial(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    def read(fragment: String): DataFrame =
      CsvSources.readOfficial(spark,
        CsvSources.findByFragment(spark, dir, fragment))

    val chaptersRaw = read("CAPITULOS")
    val blocksRaw = read("GRUPOS")
    val categoriesRaw = read("CATEGORIAS")
    val subcatsRaw = read("SUBCATEGORIAS")

    val chapters = chaptersRaw.select(
      rangeId(col("CATINIC"), col("CATFIM")).as("chapter_code"),
      trim(col("DESCRICAO").cast("string")).as("chapter_title"))

    // Range dims with normalized bounds + file order for first-match.
    val chapterRanges = withFileOrder(chaptersRaw.select(
      upper(trim(col("CATINIC").cast("string"))).as("c_start"),
      upper(trim(col("CATFIM").cast("string"))).as("c_end"),
      rangeId(col("CATINIC"), col("CATFIM")).as("chapter_code"),
      trim(col("DESCRICAO").cast("string")).as("chapter_title")))

    val blockRanges = withFileOrder(blocksRaw.select(
      upper(trim(col("CATINIC").cast("string"))).as("b_start"),
      upper(trim(col("CATFIM").cast("string"))).as("b_end"),
      rangeId(col("CATINIC"), col("CATFIM")).as("block_id"),
      trim(col("DESCRICAO").cast("string")).as("block_title")))

    // J3: category → first containing block range, then first
    // containing chapter range (independent first-matches, like the two
    // separate dict scans in the reference). firstMatchByCase compiles
    // the tiny ranges into a first-match CASE chain, so the probe side
    // is never shuffled — at scale this is a pure map + broadcast
    // lookup instead of a repartition-per-key row_number.
    val cats0 = categoriesRaw.select(
      upper(trim(col("CAT").cast("string"))).as("category_code"),
      trim(col("DESCRICAO").cast("string")).as("category_title"))
    def contains(value: org.apache.spark.sql.Column, lo: String, hi: String) =
      (r: org.apache.spark.sql.Row) =>
        value.between(lit(r.getAs[String](lo)), lit(r.getAs[String](hi)))
    val withBlock = RangeJoin.firstMatchByCase(
      cats0, blockRanges.select("b_start", "b_end", "block_id", "__ord"),
      "__ord", contains(col("category_code"), "b_start", "b_end"))
      .drop("b_start", "b_end")
    val categories = RangeJoin.firstMatchByCase(
      withBlock,
      chapterRanges.select("c_start", "c_end", "chapter_code", "__ord"),
      "__ord", contains(col("category_code"), "c_start", "c_end"))
      .select("category_code", "category_title", "block_id", "chapter_code")

    // J4: block → first chapter range containing either bound (the
    // reference's OR predicate, etl_cid10.py:317-325).
    val blocks = RangeJoin.firstMatchByCase(
        blockRanges,
        chapterRanges.select("c_start", "c_end", "chapter_code", "__ord"),
        "__ord",
        r => contains(col("b_start"), "c_start", "c_end")(r)
          || contains(col("b_end"), "c_start", "c_end")(r))
      .select(col("block_id"), col("block_title"), col("chapter_code"))

    // Subcategories: fixed-width dot insertion + 3-char category key.
    val tituloCol =
      if (subcatsRaw.columns.contains("DESCRICAO"))
        trim(col("DESCRICAO").cast("string"))
      else trim(col("DESCRABREV").cast("string"))
    val subcats = subcatsRaw.select(
      formatSubcat(col("SUBCAT")).as("subcategory_code"),
      tituloCol.as("subcategory_title"),
      categoryKeyOf(col("SUBCAT")).as("category_code"))

    (chapters, blocks, categories, subcats)
  }

  // -------------------------------------------------------------------
  // Consolidation — etl_cid10.py:179-196 / :357-370
  // -------------------------------------------------------------------

  /** Union both branches, re-normalize codes, keep one row per code
    * preferring "Estruturada" over "DATASUS" (W1 with a deterministic
    * total-order tiebreak — the reference's unstable sort leaves ties
    * nondeterministic, SURVEY.md §2.6), and stamp the run date.
    */
  def consolidate(structured: DataFrame, enriched: DataFrame,
                  runDate: LocalDate): DataFrame = {
    val unioned = structured.unionByName(enriched)
      .withColumn("cid_codigo", normalizeCode(col("cid_codigo")))
    val tiebreak = outputCols.filterNot(_ == "cid_codigo")
      .map(c => col(c).asc_nulls_last)
    PriorityDedup(unioned, keys = Seq("cid_codigo"),
        priority = col("fonte").desc +: tiebreak)
      .withColumn("dt_atualizacao", lit(runDate.toString))
  }

  def quality(consolidated: DataFrame): Quality = {
    val agg = consolidated.agg(
      count(lit(1)).as("total"),
      sum(when(col("bloco_codigo").isNull
        || col("capitulo_codigo").isNull, 1L).otherwise(0L)).as("missing"))
      .collect()(0)
    Quality(agg.getLong(0), Option(agg.get(1)).map(_.toString.toLong).getOrElse(0L))
  }

  // -------------------------------------------------------------------
  // Entry points — etl_cid10.py:162-197 / :333-371 / :374-404
  // -------------------------------------------------------------------

  /** Combined mode: explicit DATASUS file + 4 structured OMS files. */
  def runCombined(spark: SparkSession, datasusPath: String,
                  chaptersPath: String, blocksPath: String,
                  categoriesPath: String, subcatsPath: String,
                  outPath: String, runDate: LocalDate = LocalDate.now())
      : Quality = {
    val datasusRaw = CsvSources.readRobust(spark, datasusPath)
    val chapters = CsvSources.readDefault(spark, chaptersPath)
    val blocks = CsvSources.readDefault(spark, blocksPath)
    val categories = CsvSources.readDefault(spark, categoriesPath)
    val subcats = CsvSources.readDefault(spark, subcatsPath)

    val structured = buildStructured(chapters, blocks, categories, subcats)
    val cats = categoryMap(chapters, blocks, categories)
    val enriched = prepareDatasus(datasusRaw, cats)
    finish(structured, enriched, outPath, runDate)
  }

  /** Dir mode: everything derived from the 4 official DataSUS CSVs; the
    * DATASUS branch is synthesized from the structured branch's own
    * output (S5 self-enrichment, etl_cid10.py:350-353).
    */
  def runFromDatasusDir(spark: SparkSession, dir: String, outPath: String,
                        runDate: LocalDate = LocalDate.now()): Quality = {
    val (chapters, blocks, categories, subcats) =
      readDatasusOfficial(spark, dir)
    val structured = buildStructured(chapters, blocks, categories, subcats)
    val cats = categoryMap(chapters, blocks, categories)
    val datasusRaw = structured.select(
      col("cid_codigo").as("codigo"), col("descricao"))
    val enriched = prepareDatasus(datasusRaw, cats)
    finish(structured, enriched, outPath, runDate)
  }

  private def finish(structured: DataFrame, enriched: DataFrame,
                     outPath: String, runDate: LocalDate): Quality = {
    val consolidated = consolidate(structured, enriched, runDate).cache()
    val q = quality(consolidated)
    println(s"Total de códigos consolidados: ${q.total}")
    println(s"Registros sem bloco/capítulo após merge: ${q.missingHierarchy}")
    BomCsvSink.write(consolidated, outPath)
    consolidated.unpersist()
    q
  }

  /** CLI mirroring the reference's argparse contract
    * (etl_cid10.py:374-404): --datasus_dir OR all five explicit paths.
    */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val out = opts.getOrElse("out", "cid10_consolidado.csv")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("cid-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (opts.contains("datasus_dir"))
        runFromDatasusDir(spark, opts("datasus_dir"), out)
      else {
        val required = Seq("datasus", "chapters", "blocks", "categories",
          "subcategories")
        if (!required.forall(opts.contains))
          throw new IllegalArgumentException(
            "Insufficient parameters: pass --datasus_dir OR all of " +
              required.map("--" + _).mkString(", "))
        runCombined(spark, opts("datasus"), opts("chapters"),
          opts("blocks"), opts("categories"), opts("subcategories"), out)
      }
      println(s"Arquivo exportado: $out")
    } finally spark.stop()
  }
}
