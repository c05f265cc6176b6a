package graft.sources

import graft.functions.RangeFunctions

import java.nio.charset.StandardCharsets

/** Sidecar indexing for EXTERNALLY-produced bgzip text corpora (S7/P4's
  * last gap): the engine's own `.vcf.gz`/`.sam.gz` shards are written
  * line-aligned with `.gvi` member envelopes, but third-party files come
  * from the `bgzip` CLI, which cuts BGZF members mid-line and ships no
  * envelope. [[indexFiles]] builds the same `.gvi` sidecars for those
  * files — one distributed task per file, one streaming pass per task —
  * so region queries prune foreign corpora exactly like engine output
  * (the role `tabix -p vcf` plays for the reference ecosystem).
  *
  * Envelope semantics for mid-line cuts: a line BELONGS to the member
  * where it STARTS. Each `.gvi` entry carries a 6th field `lead` — the
  * inflated-byte offset of the first line starting in that member — and
  * the pruned reader inflates forward across member boundaries to finish
  * a spanning final line. Members where no line starts (headers,
  * continuation-only middles of a long line) carry no entry; their bytes
  * are reached through the owning member's continuation read. Engine-
  * written 5-field sidecars read as `lead = 0` (line-aligned), so the
  * two formats share one reader.
  */
object GraftIndexer {

  /** Build `.gvi` envelopes for every BGZF `.gz` file matched by `path`
    * that lacks one (`overwrite = true` rebuilds unconditionally).
    * `format` picks the line grammar: `"vcf"` (contig f0, pos f1, end =
    * pos + len(REF f3) − 1, '#' comments) or `"sam"` (contig f2, pos f3,
    * end from the CIGAR f5 reference-consumed length, '@' comments).
    * Returns the number of files indexed. Fails loudly on a `.gz` that
    * is not BGZF (plain gzip is unsplittable — no envelope can help). */
  def indexFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      format: String, overwrite: Boolean = false): Long = {
    require(format == "vcf" || format == "sam",
      s"GraftIndexer: unknown format '$format' (want vcf|sam)")
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(s => s.isFile &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      else Seq(st)
    }.filter(_.getPath.getName.endsWith(".gz"))
      .filter(st => overwrite || !fs.exists(gviPathOf(st.getPath)))
    if (files.isEmpty) return 0L
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val fmt = format
    val work = files.map(st => (st.getPath.toString, st.getLen))
    spark.sparkContext.parallelize(work, work.length).map { case (file, len) =>
      val hp = new HPath(file)
      val tfs = hp.getFileSystem(serConf.value)
      val in = tfs.open(hp)
      val tmp = new HPath(hp.getParent, "." + hp.getName + VcfFormat.IndexSuffix)
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        tfs.create(tmp, true), StandardCharsets.UTF_8))
      try indexOne(in, len, fmt, out) finally { out.close(); in.close() }
      1L
    }.sum().toLong
  }

  private def gviPathOf(file: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(file.getParent,
      "." + file.getName + VcfFormat.IndexSuffix)

  /** CIGAR reference-consumed length (M/D/N/=/X op sum); 0 for '*'. */
  private def refConsumed(cigar: String): Int = {
    var total = 0; var n = 0; var i = 0
    while (i < cigar.length) {
      val c = cigar.charAt(i)
      if (c >= '0' && c <= '9') n = n * 10 + (c - '0')
      else {
        if (c == 'M' || c == 'D' || c == 'N' || c == '=' || c == 'X') total += n
        n = 0
      }
      i += 1
    }
    total
  }

  /** One member's accumulating envelope. */
  private final class Env {
    var lead: Int = -1 // inflated offset of the first line START (-1 = none)
    var minS: Int = Int.MaxValue
    var maxE: Int = Int.MinValue
    var n: Long = 0L
    val contigs = scala.collection.mutable.LinkedHashSet.empty[String]
  }

  private def indexOne(in: org.apache.hadoop.fs.FSDataInputStream, len: Long,
      format: String, out: java.io.BufferedWriter): Unit = {
    val comment = if (format == "vcf") '#' else '@'
    val (cIdx, pIdx) = if (format == "vcf") (0, 1) else (2, 3)
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Long, Env)]

    def record(line: String, env: Env): Unit = {
      if (line.isEmpty || line.charAt(0) == comment) return
      env.n += 1
      val f = line.split('\t')
      if (f.length > pIdx) {
        val contig = f(cIdx)
        val pos = try f(pIdx).toInt catch { case _: NumberFormatException => -1 }
        if (contig != "*" && contig != "." && pos > 0) {
          env.contigs += RangeFunctions.cleanContig(contig)
          val endLen =
            if (format == "vcf") { if (f.length > 3) f(3).length else 1 }
            else if (f.length > 5) math.max(refConsumed(f(5)), 1)
            else 1
          env.minS = math.min(env.minS, pos)
          env.maxE = math.max(env.maxE, pos + endLen - 1)
        }
      }
    }

    // Stream the member chain once; `carry` holds the open (unterminated)
    // line and `owner` the envelope of the member it started in.
    val members = BamFormat.bgzfMembers(in, len, 0L)
    val carry = new java.lang.StringBuilder()
    var owner: Env = null
    members.foreach { case (off, bytes) =>
      val env = new Env
      entries += ((off, env))
      val s = new String(bytes, StandardCharsets.UTF_8)
      var i = 0
      if (carry.length() > 0) {
        val nl = s.indexOf('\n')
        if (nl < 0) { carry.append(s); i = s.length }
        else {
          carry.append(s, 0, nl)
          record(carry.toString, owner)
          carry.setLength(0); owner = null
          i = nl + 1
        }
      }
      if (i < s.length) env.lead = i
      while (i < s.length) {
        val nl = s.indexOf('\n', i)
        if (nl < 0) { carry.append(s, i, s.length); owner = env; i = s.length }
        else { record(s.substring(i, nl), env); i = nl + 1 }
      }
    }
    if (carry.length() > 0) record(carry.toString, owner) // EOF w/o newline

    entries.foreach { case (off, env) =>
      if (env.n > 0) {
        // Members holding ONLY header/comment lines still need an entry
        // (their lead points past those lines is wrong — comments don't
        // move lead; they are data-line-free): emit only when a DATA
        // line contributed, or when lines exist but none were mapped
        // (unmapped-only member: unconstrained envelope, `*` contigs).
        val cs =
          if (env.contigs.isEmpty || env.contigs.size > 8) "*"
          else env.contigs.mkString(",")
        val (lo, hi) =
          if (env.minS == Int.MaxValue) (1, Int.MaxValue - 1) // no coordinate info
          else (env.minS, env.maxE)
        out.write(s"$off\t$lo\t$hi\t${env.n}\t$cs\t${env.lead}\n")
      }
    }
  }
}
