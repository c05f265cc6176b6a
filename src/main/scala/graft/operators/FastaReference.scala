package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, udf}

import scala.collection.concurrent.TrieMap

/** Pluggable per-position reference-base source for the pileup family
  * (SURVEY §2.4 A4): `refBase(contigCol, posCol)` produces the `ref`
  * column. [[MockReference]] (coordinate-function stand-in) is the
  * default; [[FastaReference]] is the real thing for deployments with a
  * genome. Plan-embedded like every other result-affecting choice in the
  * engine — passed as a parameter, never session conf. */
trait ReferenceSource extends Serializable {
  def refBase(contigCol: String, posCol: String): Column
}

/** Indexed FASTA reference — the real backing for pileup's `ref` base
  * (reference `pileup/model/Reference.scala:10-28` loads contig
  * sequences through htsjdk's IndexedFastaSequenceFile and broadcasts
  * them; htsjdk doesn't exist offline, so this is a pure-JVM
  * re-implementation of the same `faidx` random access).
  *
  * Reads samtools `faidx` indexes (`<fasta>.fai` — per contig:
  * name, base length, byte offset of the first base, bases per line,
  * bytes per line incl. terminator): base `(contig, pos)` lives at byte
  * `offset + (pos-1) / lineBases * lineWidth + (pos-1) % lineBases`.
  * I/O goes through Hadoop `FileSystem`, so DFS paths work on a cluster.
  *
  * Scale: only the PATH ships with the task closure. Each executor
  * process lazily loads a contig's byte range on FIRST probe and caches
  * it process-wide ([[FastaReference.contigBytes]]) — a full human
  * genome is ~3 GB resident per executor, the same residency the
  * reference's broadcast needs, but nothing is re-shipped per task or
  * per query, and executors that never probe a contig never read it.
  * After the first touch a lookup is one array index inside the UDF.
  * Unknown contigs and out-of-range positions yield null (a real genome
  * has edges; the mock does not). */
class FastaReference(fastaPath: String) extends ReferenceSource {
  override def refBase(contigCol: String, posCol: String): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(FastaRefBase(fastaPath,
      ColumnBridge.expression(col(contigCol)),
      ColumnBridge.expression(col(posCol).cast("int"))))
  }
}

/** Executor-side probe kernel for [[FastaRefBase]]: memoizes the LAST
  * (contig → cached bytes) resolution per thread — pileup feeds
  * positions grouped by contig, so the common case is one ThreadLocal
  * read plus an array index, no per-row string conversion. The object is
  * shared across the executor's concurrent tasks (it rides the generated
  * class's references array), hence per-thread memoization rather than
  * plain fields. */
final class FastaProbe(path: String) extends Serializable {
  @transient private lazy val last =
    new ThreadLocal[(org.apache.spark.unsafe.types.UTF8String, Array[Byte])]

  def base(contig: org.apache.spark.unsafe.types.UTF8String,
      pos: Int): org.apache.spark.unsafe.types.UTF8String = {
    var memo = last.get()
    if (memo == null || !memo._1.equals(contig)) {
      // clone(): codegen hands UTF8Strings backed by reused row buffers.
      memo = (contig.clone(), FastaReference.contigBytes(path, contig.toString))
      last.set(memo)
    }
    val bytes = memo._2
    if (pos < 1 || pos > bytes.length) null
    else FastaReference.charTable(bytes(pos - 1) & 0x7f)
  }
}

/** `fasta_ref_base(contig, pos)` over the executor-cached contig bytes —
  * a native codegen expression (the [[graft.functions.CigarCoverageEvents]]
  * pattern), replacing the per-row Scala UDF: the pileup-with-FASTA plan
  * stays inside one whole-stage-codegen span with no UDF invocation
  * boundary (PlanAuditSpec-style assert in FastaReferenceSpec). Null
  * contig or an off-contig position yields null. */
case class FastaRefBase(path: String,
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fasta_ref_base"

  @transient private lazy val probe = new FastaProbe(path)

  override protected def nullSafeEval(c: Any, p: Any): Any =
    probe.base(c.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probeRef = ctx.addReferenceObj("fastaProbe", probe,
      classOf[FastaProbe].getName)
    nullSafeCodeGen(ctx, ev, (c, p) => s"""
      ${ev.value} = $probeRef.base($c, $p);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FastaReference {

  /** One `.fai` line: base length, byte offset of the first base, bases
    * per line, bytes per line (incl. line terminator). */
  case class FaiEntry(length: Long, offset: Long, lineBases: Int, lineWidth: Int)

  // Process-wide (executor-side) caches: the .fai is tiny (one line per
  // contig); contig byte arrays load once per executor per contig.
  private val faiCache = TrieMap.empty[String, Map[String, FaiEntry]]
  private val seqCache = TrieMap.empty[(String, String), Array[Byte]]

  def fai(fastaPath: String): Map[String, FaiEntry] =
    faiCache.getOrElseUpdate(fastaPath, {
      val p = new Path(fastaPath + ".fai")
      val fs = p.getFileSystem(new Configuration())
      val in = fs.open(p)
      try {
        scala.io.Source.fromInputStream(in, "UTF-8").getLines().flatMap { line =>
          val f = line.split('\t')
          if (f.length < 5) None
          else Some(f(0) -> FaiEntry(f(1).toLong, f(2).toLong, f(3).toInt, f(4).toInt))
        }.toMap
      } finally in.close()
    })

  /** The contig's bases (newlines stripped), loaded once per executor.
    * Unknown contig -> empty array (cached, so misses stay cheap). */
  def contigBytes(fastaPath: String, contig: String): Array[Byte] =
    seqCache.getOrElseUpdate((fastaPath, contig), {
      fai(fastaPath).get(contig) match {
        case None => Array.emptyByteArray
        case Some(e) =>
          val p = new Path(fastaPath)
          val fs = p.getFileSystem(new Configuration())
          val nLines = ((e.length + e.lineBases - 1) / e.lineBases).toInt
          // Raw span incl. line terminators; the final line may lack one.
          val span = math.min(
            (nLines.toLong * e.lineWidth),
            fs.getFileStatus(p).getLen - e.offset).toInt
          val raw = new Array[Byte](span)
          val in = fs.open(p)
          try { in.readFully(e.offset, raw) } finally in.close()
          val out = new Array[Byte](e.length.toInt)
          var i = 0; var o = 0
          while (i < span && o < out.length) {
            val b = raw(i)
            if (b != '\n' && b != '\r') { out(o) = b; o += 1 }
            i += 1
          }
          require(o == out.length,
            s"FASTA $fastaPath contig $contig: read $o bases, .fai declares ${e.length}")
          out
      }
    })

  /** Reference base at 1-based `pos`, or null off the contig. */
  def base(fastaPath: String, contig: String, pos: Int): String = {
    if (contig == null) return null
    val bytes = contigBytes(fastaPath, contig)
    if (pos < 1 || pos > bytes.length) null
    else String.valueOf(bytes(pos - 1).toChar)
  }

  /** Singleton one-character strings for [[FastaProbe]] — a lookup is
    * zero-allocation per row. */
  val charTable: Array[org.apache.spark.unsafe.types.UTF8String] =
    Array.tabulate(128)(i =>
      org.apache.spark.unsafe.types.UTF8String.fromString(i.toChar.toString))

  /** Test/ops hook: drop cached state (e.g. after overwriting a fixture
    * in the same JVM). */
  def clearCaches(): Unit = { faiCache.clear(); seqCache.clear() }
}
