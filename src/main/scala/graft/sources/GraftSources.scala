package graft.sources

import graft.functions.RangeFunctions

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Relational source surfaces (SURVEY §2.1) re-expressed over the offline
  * environment's file formats. The reference exposes BAM/CRAM/ADAM/BED
  * tables through `RelationProvider`s registered with
  * `CREATE TABLE ... USING <class> OPTIONS(path ...)`
  * (`datasources/BAM/BAMDataSource.scala:12-22`); these providers keep
  * that DDL surface (S8) and the scan-time semantics — contig
  * normalization (P5, `utils/DataQualityFuncs`), sample-id-from-filename
  * (S7, `AlignmentRelation.scala:196-206`), column pruning and filter
  * pushdown (P1/P2) — on top of Parquet/CSV instead of htsjdk readers
  * (none of the genomic codecs exist offline; SURVEY §7).
  *
  * Pruning/pushdown are *delegated*: `buildScan` assembles a DataFrame
  * with the projection and predicates applied, so Catalyst pushes them
  * into the underlying scan (`PushedFilters`/`ReadSchema` show up in the
  * inner plan) — the idiomatic Spark answer to the reference's hand-rolled
  * `translateFilter` (`SequilaDataSourceStrategy.scala:276-360`).
  */
abstract class GraftBaseRelation extends BaseRelation with PrunedFilteredScan {

  /** The fully-prepared DataFrame this relation serves. */
  protected def frame(): DataFrame

  override lazy val schema: StructType = frame().schema

  private def filterToColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq.map(lit): _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case And(l, r) => for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case Or(l, r) => for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case Not(c) => filterToColumn(c).map(!_)
    case _ => None
  }

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => filterToColumn(f).isEmpty)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val base = frame()
    val filtered = filters.flatMap(filterToColumn).foldLeft(base)(_.filter(_))
    val projected =
      if (requiredColumns.isEmpty) filtered.select(lit(1).as("one"))
      else filtered.select(requiredColumns.toIndexedSeq.map(col): _*)
    projected.rdd
  }
}

/** `clean_contig` applied as a column (P5 — scan-time normalization). */
object SourceUtil {
  val cleanContigUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((c: String) => RangeFunctions.cleanContig(c))

  /** S7: sample id = file-name prefix before the first '.'. Parquet
    * datasets are directories of `part-*` files, so when the leaf is a
    * part file the name comes from the parent directory instead (the
    * reference reads single `<sample>.bam` files,
    * `AlignmentRelation.scala:196-206`). */
  def sampleIdFromFile: org.apache.spark.sql.Column = {
    val segs = split(input_file_name(), "/")
    val leaf = element_at(segs, -1)
    val name = when(leaf.startsWith("part-"), element_at(segs, -2)).otherwise(leaf)
    regexp_extract(name, "^([^.]+)", 1)
  }

  /** Write an alignment table in the scan-optimized layout the engine's
    * read paths exploit, producing at 100 TB what a coordinate-sorted,
    * BAI-indexed BAM gives the reference:
    *
    *  - hive-partitioned by `sample_id` → partition pruning (P3) and the
    *    metadata-only `DISTINCT sample_id` (A6);
    *  - range-partitioned then sorted by `(contig, pos_start)` within
    *    each partition → parquet row-group min/max statistics prune
    *    selective interval queries (P4, the BAI-pushdown analogue —
    *    measured in PlanAuditSpec: sorted reads < ½ the records of an
    *    unsorted layout for the same range predicate).
    *
    * Cost: ONE exchange (the range partitioning; genome position is
    * uniformly splittable so there are no hot partitions) plus a local
    * spillable sort — the standard one-off investment that every
    * downstream positional scan amortizes. */
  def writeAligned(reads: DataFrame, path: String): Unit =
    reads.repartitionByRange(col("sample_id"), col("contig"), col("pos_start"))
      .sortWithinPartitions(col("sample_id"), col("contig"), col("pos_start"))
      .write.partitionBy("sample_id").mode("overwrite").parquet(path)

  /** BAM sink (S10): write an alignment frame as a directory of sharded
    * `.bam` files — one fully-headed BAM per task, the hadoop-bam output
    * shape, encoded by the pure-JVM [[BamFormat.BamWriter]]. The
    * reference dictionary (distinct contigs + a max-end-derived length)
    * comes from ONE cheap driver aggregation and ships with the tasks;
    * everything else streams. Expects `(contig, pos_start, pos_end,
    * mapq, flag, cigar)` plus optional `qname`/`seq`/`qual_str`/`md_tag`
    * columns. */
  def writeBam(reads: DataFrame, path: String): Unit = {
    val spark = reads.sparkSession
    val refs = reads.filter(col("contig").isNotNull)
      .groupBy(col("contig")).agg(max(col("pos_end").cast("int")).as("m"))
      .collect().sortBy(_.getString(0))
    val refNames = refs.map(_.getString(0))
    val refLens = refs.map(r => r.getInt(1) + 1000)
    def optCol(n: String, default: org.apache.spark.sql.Column) =
      if (reads.columns.contains(n)) col(n) else default
    val prepared = reads.select(
      col("contig").cast("string"), col("pos_start").cast("int"),
      col("mapq").cast("int"), col("flag").cast("int"),
      optCol("qname", lit("*")).cast("string"), col("cigar").cast("string"),
      optCol("seq", lit("")).cast("string"),
      optCol("qual_str", lit(null)).cast("string"),
      optCol("md_tag", lit(null)).cast("string"))
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs0 = dir.getFileSystem(conf)
    if (fs0.exists(dir)) fs0.delete(dir, true)
    fs0.mkdirs(dir)
    prepared.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(path, f"part-$idx%05d.bam")
        val fs = p.getFileSystem(serConf.value)
        val out = fs.create(p, true)
        val w = new BamFormat.BamWriter(out, refNames, refLens)
        it.foreach { r =>
          val qualStr = if (r.isNullAt(7)) null else r.getString(7)
          val quals =
            if (qualStr == null) null
            else qualStr.toCharArray.map(c => (c - 33).toByte)
          w.write(
            if (r.isNullAt(0)) null else r.getString(0),
            r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getString(5),
            r.getString(6), quals,
            if (r.isNullAt(8)) null else r.getString(8))
        }
        w.close()
        Iterator.single(1)
      }
    }.count(): Unit
  }
}

/** Alignment (reads) table over parquet — the S1/S2 surface. Options:
  * `path` (required), `sampleIdFromFilename` (default false; S7),
  * `refPath` (accepted for CRAM-signature parity, unused — S2). */
class AlignmentSource extends RelationProvider {
  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", sys.error("AlignmentSource requires a 'path' option"))
    val fromFile = parameters.get("sampleIdFromFilename").exists(_.toBoolean)
    new GraftBaseRelation {
      override val sqlContext: SQLContext = ctx
      override protected def frame(): DataFrame = {
        val raw = ctx.sparkSession.read.parquet(path)
        val withSample =
          if (fromFile) raw.withColumn("sample_id", SourceUtil.sampleIdFromFile)
          else raw
        if (withSample.columns.contains("contig"))
          withSample.withColumn("contig", SourceUtil.cleanContigUdf(col("contig")))
        else withSample
      }
    }
  }
}

/** Variant table (S3/S4 surface): parquet with ADAM/Glow-style column
  * names renamed to engine conventions (`contigName`→`contig`,
  * `start`→`pos_start`, `end`→`pos_end`, `referenceAllele`→`ref`,
  * `alternateAlleles`→`alt` — reference `VCFRelation.scala:38-42`,
  * `ADAMRelation.scala:10-33`), contig-cleaned. */
class VariantSource extends RelationProvider {
  private val renames = Seq(
    "contigName" -> "contig", "start" -> "pos_start", "end" -> "pos_end",
    "referenceAllele" -> "ref", "alternateAlleles" -> "alt")

  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", sys.error("VariantSource requires a 'path' option"))
    new GraftBaseRelation {
      override val sqlContext: SQLContext = ctx
      override protected def frame(): DataFrame = {
        val raw = ctx.sparkSession.read.parquet(path)
        val renamed = renames.foldLeft(raw) { case (df, (from, to)) =>
          if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
        }
        if (renamed.columns.contains("contig"))
          renamed.withColumn("contig", SourceUtil.cleanContigUdf(col("contig")))
        else renamed
      }
    }
  }
}

/** Alignment table over REAL binary BAM files (S1 + S10 sink below)
  * through the pure-JVM [[BamFormat]] codec — BGZF inflated by the JDK's
  * own gzip engine, records decoded per the public SAM/BAM spec v1.6
  * (the reference reads through hadoop-bam + htsjdk,
  * `datasources/BAM/AlignmentRelation.scala:74-176`; neither exists
  * offline). Emits the engine's alignment surface: sample-id from the
  * file name (S7), 1-based `pos_start`, `pos_end` from the
  * reference-consumed CIGAR length, quals re-rendered as the Phred+33
  * string, the MD tag extracted from the tag stream, and contig
  * normalization (P5).
  *
  * SPLITTABLE without an index: each file is carved into `splitSize`
  * byte ranges (option, default 64 MiB) and every task synchronizes
  * itself — first to a BGZF member boundary (header-signature scan with
  * BSIZE chain validation), then to a record boundary inside the
  * inflated bytes (field-plausibility chain — records carry no magic),
  * via [[BamFormat.splitRecords]]. A 100 TB BAM corpus parallelizes at
  * byte-range granularity like any splittable format. */
class BamSource extends RelationProvider {
  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", sys.error("BamSource requires a 'path' option"))
    val splitSize = parameters.getOrElse("splitSize", (64L << 20).toString).toLong
    new GraftBaseRelation {
      override val sqlContext: SQLContext = ctx
      override protected def frame(): DataFrame =
        BamSource.frameFor(ctx.sparkSession, path, splitSize)
    }
  }
}

object BamSource {
  import org.apache.spark.sql.types._
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  val schema: StructType = StructType(Seq(
    StructField("sample_id", StringType, nullable = false),
    StructField("qname", StringType, nullable = false),
    StructField("flag", IntegerType, nullable = false),
    StructField("contig", StringType, nullable = true),
    StructField("pos_start", IntegerType, nullable = false),
    StructField("pos_end", IntegerType, nullable = false),
    StructField("mapq", IntegerType, nullable = false),
    StructField("cigar", StringType, nullable = false),
    StructField("seq", StringType, nullable = false),
    StructField("qual_str", StringType, nullable = true),
    StructField("md_tag", StringType, nullable = true)))

  private[sources] def frameFor(spark: org.apache.spark.sql.SparkSession,
      path: String, splitSize: Long): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
            !s.getPath.getName.startsWith("_"))
      else Seq(st)
    }
    require(files.nonEmpty, s"BamSource: no files match '$path'")
    val splits: Seq[(String, Long, Long, Long, String)] = files.flatMap { st =>
      val file = st.getPath.toString
      val len = st.getLen
      val leaf = st.getPath.getName
      val fileName =
        if (leaf.startsWith("part-")) st.getPath.getParent.getName else leaf
      val sample = fileName.split('.')(0)
      (0L until len by splitSize).map(s =>
        (file, len, s, math.min(s + splitSize, len), sample))
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val rows = spark.sparkContext
      .parallelize(splits, splits.length)
      .flatMap { case (file, len, s, e, sample) =>
        val hp = new HPath(file)
        def open() = hp.getFileSystem(serConf.value).open(hp)
        // Reference names for contig mapping (a few header blocks).
        val hdr = new BamFormat.BamReader(open())
        val names = hdr.header.refNames
        hdr.close()
        BamFormat.splitRecords(() => open(), len, s, e).map { r =>
          val contig = if (r.refId >= 0 && r.refId < names.length) names(r.refId) else null
          val posStart = r.pos0 + 1
          val posEnd = posStart + math.max(r.refConsumed, 1) - 1
          val qualStr =
            if (r.quals.isEmpty || r.quals(0) == 0xff.toByte) null
            else new String(r.quals.map(q => (q + 33).toChar))
          Row(sample, r.qname, r.flag, contig, posStart, posEnd, r.mapq,
            r.cigar, r.seq, qualStr, r.mdTag)
        }
      }
    spark.createDataFrame(rows, schema)
      .withColumn("contig", SourceUtil.cleanContigUdf(col("contig")))
  }
}

/** Alignment table over SAM text (the BAM twin; reference docs expose
  * both surfaces) — one record per line, natively splittable through the
  * text source, parsed entirely with codegen'd column expressions: the
  * 11 mandatory tab fields, `pos_end` from the reference-consumed CIGAR
  * ops (`aggregate` over `regexp_extract_all`), the MD tag fished out of
  * the optional fields, `*` placeholders mapped to null/empty, contig
  * normalization (P5), and sample-id-from-filename (S7). Same output
  * schema as [[BamSource]], so every downstream operator (coverage,
  * pileup, interval joins) runs on either container unchanged. */
class SamSource extends RelationProvider {
  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", sys.error("SamSource requires a 'path' option"))
    new GraftBaseRelation {
      override val sqlContext: SQLContext = ctx
      override protected def frame(): DataFrame = {
        val raw = ctx.sparkSession.read.text(path)
          .withColumn("sample_id", SourceUtil.sampleIdFromFile)
          .filter(!col("value").startsWith("@") && length(col("value")) > 0)
        val f = split(col("value"), "\t")
        raw.select(
            col("sample_id"),
            f.getItem(0).as("qname"),
            f.getItem(1).cast("int").as("flag"),
            when(f.getItem(2) === "*", lit(null)).otherwise(f.getItem(2)).as("contig"),
            f.getItem(3).cast("int").as("pos_start"),
            f.getItem(4).cast("int").as("mapq"),
            f.getItem(5).as("cigar"),
            when(f.getItem(9) === "*", lit("")).otherwise(f.getItem(9)).as("seq"),
            when(f.getItem(10) === "*", lit(null)).otherwise(f.getItem(10)).as("qual_str"),
            // First MD:Z: optional field anywhere after the 11 mandatory
            // columns (empty match -> null).
            when(col("value").rlike("\tMD:Z:[^\t]+"),
              regexp_extract(col("value"), "\tMD:Z:([^\t]+)", 1)).as("md_tag"))
          .withColumn("pos_end",
            col("pos_start") + greatest(aggregate(
              expr("regexp_extract_all(cigar, '(\\\\d+)[MDN=X]', 1)"),
              lit(0), (acc, x) => acc + x.cast("int")), lit(1)) - 1)
          .withColumn("contig", SourceUtil.cleanContigUdf(col("contig")))
          .select(col("sample_id"), col("qname"), col("flag"), col("contig"),
            col("pos_start"), col("pos_end"), col("mapq"), col("cigar"),
            col("seq"), col("qual_str"), col("md_tag"))
      }
    }
  }
}

/** FASTQ table over 4-line FASTQ text (S6) through the splittable
  * [[FastqInputFormat]] — the pure-JVM seam proving a record-synchronizing
  * file reader plugs into the DDL surface end-to-end (the reference reads
  * through hadoop-bam's FastqInputFormat,
  * `datasources/FASTQ/SequenceFragmentRelation.scala:16-114`; schema =
  * its SequencedFragment surface, `utils/Columns.scala:40-49`). Sample id
  * comes from the file name (S7 semantics — `<sample>.fastq`; a
  * `part-*` leaf uses its parent directory's name, matching
  * [[SourceUtil.sampleIdFromFile]]). Illumina-1.8 read names
  * (`instrument:run:flowcell:lane:tile:x:y comment`) populate the typed
  * metadata columns; non-conforming names leave them null with the raw
  * name in `instrument_name`. CASAVA filter flag: `N` = passed. */
class FastqSource extends RelationProvider {

  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", sys.error("FastqSource requires a 'path' option"))
    new GraftBaseRelation {
      override val sqlContext: SQLContext = ctx
      override protected def frame(): DataFrame = {
        val spark = ctx.sparkSession
        val raw = spark.sparkContext.newAPIHadoopFile(
          path, classOf[FastqInputFormat],
          classOf[org.apache.hadoop.io.LongWritable], classOf[org.apache.hadoop.io.Text])
        val rows = raw.asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[
            org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text]]
          .mapPartitionsWithInputSplit { (split, it) =>
            val leafPath = split.asInstanceOf[
              org.apache.hadoop.mapreduce.lib.input.FileSplit].getPath
            val leaf = leafPath.getName
            val fileName = if (leaf.startsWith("part-")) leafPath.getParent.getName else leaf
            val sample = fileName.split('.')(0)
            it.map { case (_, rec) => FastqSource.parseRecord(sample, rec.toString) }
          }
        spark.createDataFrame(rows, FastqSource.schema)
      }
    }
  }
}

object FastqSource {
  import org.apache.spark.sql.types._

  val schema: StructType = StructType(Seq(
    StructField("sample_id", StringType, nullable = false),
    StructField("instrument_name", StringType, nullable = true),
    StructField("run_id", IntegerType, nullable = true),
    StructField("flowcell_id", StringType, nullable = true),
    StructField("flowcell_lane", IntegerType, nullable = true),
    StructField("tile", IntegerType, nullable = true),
    StructField("x_pos", IntegerType, nullable = true),
    StructField("y_pos", IntegerType, nullable = true),
    StructField("filter_passed", BooleanType, nullable = true),
    StructField("control_number", IntegerType, nullable = true),
    StructField("index_sequence", StringType, nullable = true),
    StructField("sequence", StringType, nullable = false),
    StructField("baseq", StringType, nullable = false)))

  private def intOrNull(a: Array[String], i: Int): Any =
    if (a.length > i) try java.lang.Integer.valueOf(a(i).trim)
    catch { case _: NumberFormatException => null }
    else null

  private def strOrNull(a: Array[String], i: Int): Any =
    if (a.length > i && a(i).nonEmpty) a(i) else null

  /** One 4-line record (`@name[ comment]\nseq\n+\nqual`) to a typed Row. */
  private[sources] def parseRecord(sample: String, rec: String): Row = {
    val lines = rec.split('\n')
    val header = lines(0).drop(1)
    val seq = lines(1)
    val qual = lines(3)
    val sp = header.indexOf(' ')
    val name = if (sp >= 0) header.substring(0, sp) else header
    val comment = if (sp >= 0) header.substring(sp + 1) else ""
    val n = name.split(':')
    val c = comment.split(':')
    val illumina = n.length == 7
    val filterPassed: Any = strOrNull(c, 1) match {
      case "N" => java.lang.Boolean.TRUE
      case "Y" => java.lang.Boolean.FALSE
      case _ => null
    }
    Row(sample,
      if (illumina) strOrNull(n, 0) else (if (name.nonEmpty) name else null),
      if (illumina) intOrNull(n, 1) else null,
      if (illumina) strOrNull(n, 2) else null,
      if (illumina) intOrNull(n, 3) else null,
      if (illumina) intOrNull(n, 4) else null,
      if (illumina) intOrNull(n, 5) else null,
      if (illumina) intOrNull(n, 6) else null,
      filterPassed,
      intOrNull(c, 2),
      strOrNull(c, 3),
      seq, qual)
  }
}

/** BED table over tab-separated text (S5): skips `track`/`browser` header
  * lines, converts 0-based half-open to 1-based inclusive coordinates,
  * names the 12 optional columns (reference `BEDRelation.scala:10-59`). */
class BedSource extends RelationProvider {
  private val names = Seq("contig", "pos_start", "pos_end", "name", "score", "strand",
    "thick_start", "thick_end", "item_rgb", "block_count", "block_sizes", "block_starts")

  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", sys.error("BedSource requires a 'path' option"))
    new GraftBaseRelation {
      override val sqlContext: SQLContext = ctx
      override protected def frame(): DataFrame = {
        // Read as raw lines: a csv reader would fix its column count from
        // the first line, which may be a tab-less `track` header.
        val raw = ctx.sparkSession.read.text(path)
        val dataLines = raw.filter(
          !col("value").startsWith("track") && !col("value").startsWith("browser"))
        val parts = split(col("value"), "\t")
        val namedCols = names.zipWithIndex.map { case (n, i) =>
          // Size-guarded: a bare getItem on an absent optional column is
          // an ANSI out-of-bounds error, not a null.
          when(size(parts) > i, parts.getItem(i)).as(n)
        }
        dataLines.select(namedCols: _*)
          .withColumn("contig", SourceUtil.cleanContigUdf(col("contig")))
          // BED is 0-based half-open; engine convention is 1-based inclusive.
          .withColumn("pos_start", col("pos_start").cast("int") + 1)
          .withColumn("pos_end", col("pos_end").cast("int"))
      }
    }
  }
}
