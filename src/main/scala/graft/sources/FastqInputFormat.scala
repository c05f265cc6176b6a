package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}
import org.apache.hadoop.util.LineReader

import scala.collection.mutable

/** Splittable Hadoop input format for 4-line FASTQ text — the pure-JVM
  * replacement for hadoop-bam's `FastqInputFormat` (reference
  * `datasources/FASTQ/SequenceFragmentRelation.scala:16-114` reads through
  * it; neither hadoop-bam nor htsjdk exists offline, SURVEY §7). This is
  * the REAL seam a binary-format reader needs: byte-range splits land mid
  * record, so each reader must synchronize to a record boundary before
  * emitting — exactly the structure the BAM/BGZF reader plugs into.
  *
  * Record-boundary detection: a line is a record header iff it starts with
  * `@` and the line two below starts with `+`. Sound for well-formed
  * 4-line FASTQ: a QUALITY line may also start with `@`, but two lines
  * below a quality line sits a sequence line (bases — never `+`), so only
  * true headers pass. (Multi-line FASTQ — wrapped sequence — is out of
  * scope, as it is for hadoop-bam's splitting reader.)
  *
  * Split ownership for PLAIN text matches `LineRecordReader`'s convention
  * so every record is read exactly once with no cross-reader coordination:
  * a record belongs to the split `(start, end]` containing its header's
  * first byte (first split: `[0, end]`). A non-first reader discards the
  * line at `start` (possibly partial; if the header starts exactly at
  * `start` the PREVIOUS reader owns it, since its loop reads headers at
  * offsets up to and including its own `end`), then scans forward to the
  * first header.
  *
  * COMPRESSED inputs: BGZF-compressed files (`.fastq.gz` written as BGZF
  * — multi-member gzip with the BC/BSIZE FEXTRA subfield) stay SPLITTABLE
  * at member granularity through the same machinery the BAM reader uses
  * ([[BamFormat.findBgzfBlock]]/[[BamFormat.bgzfMembers]]): a record
  * belongs to the split whose byte range contains the file offset of the
  * BGZF member its header line STARTS in (emit while `memberOff < end`;
  * a reader whose first member is not the file head discards its first
  * line exactly when the previous member's inflated bytes do not end in
  * a newline — the member-level analogue of the discard-line-at-`start`
  * rule — then syncs to a header). Ordinary single-member gzip falls back
  * to one split per file, decompressed through the Hadoop codec.
  *
  * At 100 TB: splits are independent byte ranges — no shuffle, no driver
  * state, standard FileInputFormat parallelism; BGZF compression keeps
  * that true for compressed corpora too. */
class FastqInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(ctx: JobContext, file: Path): Boolean = {
    val codec = new CompressionCodecFactory(ctx.getConfiguration).getCodec(file)
    codec == null || FastqInputFormat.isBgzf(ctx.getConfiguration, file)
  }

  override def createRecordReader(split: InputSplit,
      ctx: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new FastqRecordReader
}

object FastqInputFormat {
  /** Sniff the BGZF signature: gzip magic + FEXTRA with the `BC`
    * subfield (the first member of a BGZF file always carries it). */
  def isBgzf(conf: org.apache.hadoop.conf.Configuration, file: Path): Boolean = {
    val fs = file.getFileSystem(conf)
    if (fs.getFileStatus(file).getLen < 18) return false
    val in = fs.open(file)
    try {
      val h = new Array[Byte](18)
      in.readFully(0, h)
      (h(0) & 0xff) == 0x1f && (h(1) & 0xff) == 0x8b && h(2) == 8 &&
        (h(3) & 4) == 4 && h(12) == 'B' && h(13) == 'C'
    } finally in.close()
  }
}

/** One 4-line record per `nextKeyValue`: key = header byte offset (plain)
  * or header-member file offset (BGZF), value = the four lines joined
  * with `\n`. A trailing partial record (EOF mid record) is dropped
  * rather than emitted malformed. */
class FastqRecordReader extends RecordReader[LongWritable, Text] {

  private var start = 0L
  private var end = 0L
  private var pos = 0L
  private var in: LineReader = _
  private var stream: FSDataInputStream = _
  private var decompressed: java.io.InputStream = _
  private val key = new LongWritable
  private val value = new Text
  /** BGZF mode state: member-at-a-time line source. */
  private var bgzf: BgzfLineSource = _
  /** Ownership comparison: plain/codec use `off <= end`; BGZF members
    * are atomic, `off < end`. */
  private var strictEnd = false
  /** Lookahead of (ownership-offset, line) pairs already pulled off the
    * stream — boundary tests peek two lines past a candidate header. */
  private val ahead = mutable.Queue.empty[(Long, Text)]

  private def readRaw(): Option[(Long, Text)] =
    if (bgzf != null) bgzf.readLine()
    else {
      val t = new Text
      val off = pos
      val n = in.readLine(t)
      if (n == 0) None else { pos += n; Some((off, t)) }
    }

  private def peek(i: Int): Option[(Long, Text)] = {
    while (ahead.length <= i) readRaw() match {
      case Some(l) => ahead.enqueue(l)
      case None => return None
    }
    Some(ahead(i))
  }

  private def takeLine(): Option[(Long, Text)] =
    if (ahead.nonEmpty) Some(ahead.dequeue()) else readRaw()

  private def startsWith(t: Text, c: Char): Boolean =
    t.getLength > 0 && t.getBytes()(0) == c.toByte

  private def atHeader: Boolean =
    peek(0).exists(l => startsWith(l._2, '@')) &&
      peek(2).exists(l => startsWith(l._2, '+'))

  override def initialize(genericSplit: InputSplit, ctx: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    start = split.getStart
    end = start + split.getLength
    val file = split.getPath
    val conf = ctx.getConfiguration
    val fs = file.getFileSystem(conf)
    stream = fs.open(file)
    val codec = new CompressionCodecFactory(conf).getCodec(file)
    if (codec == null) {
      if (start != 0) stream.seek(start)
      in = new LineReader(stream, conf)
      pos = start
      if (start != 0) {
        // The (possibly partial) line at `start` belongs to the previous
        // reader; then scan to the first record header.
        takeLine()
        while (peek(0).isDefined && !atHeader) takeLine()
      }
    } else if (FastqInputFormat.isBgzf(conf, file)) {
      strictEnd = true
      val fileLen = fs.getFileStatus(file).getLen
      def readAt(p: Long, b: Array[Byte]): Unit = stream.readFully(p, b)
      val firstMember =
        if (start == 0) 0L else BamFormat.findBgzfBlock(fileLen, start, readAt)
      if (firstMember >= fileLen) {
        bgzf = new BgzfLineSource(stream, fileLen, fileLen) // empty
      } else {
        bgzf = new BgzfLineSource(stream, fileLen, firstMember)
        if (firstMember != 0) {
          // Discard a line continued from the previous member; a line
          // STARTING at our member boundary is ours. The previous
          // member's inflated tail byte decides (empty members walk
          // further back).
          var prev = BamFormat.previousBgzfBlock(fileLen, firstMember, readAt)
          var bytes = BamFormat.inflateMemberAt(stream, fileLen, prev)
          while (bytes.isEmpty && prev > 0) {
            prev = BamFormat.previousBgzfBlock(fileLen, prev, readAt)
            bytes = BamFormat.inflateMemberAt(stream, fileLen, prev)
          }
          // All-empty prefix means our first line starts fresh — keep it.
          if (bytes.nonEmpty && bytes(bytes.length - 1) != '\n') takeLine()
          while (peek(0).isDefined && !atHeader) takeLine()
        }
      }
    } else {
      // Ordinary gzip: not seekable — single split, decompress whole file.
      decompressed = codec.createInputStream(stream)
      in = new LineReader(decompressed, conf)
      pos = 0L
      end = Long.MaxValue
    }
  }

  override def nextKeyValue(): Boolean = {
    // Sync guarantees the queue head (if any) is a header; ownership rule:
    // emit while the header offset is <= `end` for byte offsets (the next
    // reader discarded the line at its `start` == this `end`), < `end`
    // for BGZF member offsets (members are atomic split units).
    peek(0) match {
      case Some((off, _)) if (if (strictEnd) off < end else off <= end) =>
        val l0 = takeLine(); val l1 = takeLine(); val l2 = takeLine(); val l3 = takeLine()
        (l0, l1, l2, l3) match {
          case (Some((o, h)), Some((_, s)), Some((_, p)), Some((_, q))) =>
            key.set(o)
            value.set(s"$h\n$s\n$p\n$q")
            true
          case _ => false // EOF mid record: drop the partial tail
        }
      case _ => false
    }
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start || end == Long.MaxValue) 1.0f
    else if (bgzf != null)
      math.min(1.0f, (bgzf.position - start).toFloat / (end - start).toFloat)
    else math.min(1.0f, (pos - start).toFloat / (end - start).toFloat)
  override def close(): Unit = {
    if (decompressed != null) decompressed.close()
    if (stream != null) stream.close()
  }
}

/** Splittable LINE input format with the same compression matrix as
  * [[FastqInputFormat]]: plain text splits byte-wise (LineRecordReader
  * ownership convention), BGZF-compressed files split at member
  * granularity (a line belongs to the split containing its first byte's
  * member; the first line of a non-initial split is discarded exactly
  * when the previous member ends mid-line), ordinary gzip decompresses
  * as one split. The seam that keeps bgzipped `.vcf.gz` / `.sam.gz` —
  * the ecosystem's standard layout — parallel at 100 TB. */
class BgzfTextInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(ctx: JobContext, file: Path): Boolean = {
    val codec = new CompressionCodecFactory(ctx.getConfiguration).getCodec(file)
    codec == null || FastqInputFormat.isBgzf(ctx.getConfiguration, file)
  }
  /** Standard index sidecars (`.tbi`/`.csi`/...) carry PUBLIC non-dot
    * names and would otherwise enumerate as data files of a directory
    * scan — an index is BGZF, so it would even "inflate" into garbage
    * lines instead of failing loudly. */
  override def listStatus(job: JobContext)
      : java.util.List[org.apache.hadoop.fs.FileStatus] = {
    val all = super.listStatus(job)
    val out = new java.util.ArrayList[org.apache.hadoop.fs.FileStatus](all.size())
    all.forEach { st =>
      if (!SourceUtil.isIndexSidecar(st.getPath.getName)) out.add(st)
    }
    out
  }
  override def createRecordReader(split: InputSplit,
      ctx: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new BgzfTextRecordReader
}

/** One LINE per `nextKeyValue`; key = ownership offset (byte offset for
  * plain text, member file offset under BGZF). */
class BgzfTextRecordReader extends RecordReader[LongWritable, Text] {
  private var start = 0L
  private var end = 0L
  private var pos = 0L
  private var in: LineReader = _
  private var stream: FSDataInputStream = _
  private var decompressed: java.io.InputStream = _
  private var bgzf: BgzfLineSource = _
  private var strictEnd = false
  private val key = new LongWritable
  private val value = new Text
  private var pending: Option[(Long, Text)] = None

  private def readRaw(): Option[(Long, Text)] =
    if (bgzf != null) bgzf.readLine()
    else {
      val t = new Text
      val off = pos
      val n = in.readLine(t)
      if (n == 0) None else { pos += n; Some((off, t)) }
    }

  override def initialize(genericSplit: InputSplit, ctx: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    start = split.getStart
    end = start + split.getLength
    val file = split.getPath
    val conf = ctx.getConfiguration
    val fs = file.getFileSystem(conf)
    stream = fs.open(file)
    val codec = new CompressionCodecFactory(conf).getCodec(file)
    if (codec == null) {
      if (start != 0) stream.seek(start)
      in = new LineReader(stream, conf)
      pos = start
      if (start != 0) readRaw() // the line at `start` is the previous reader's
    } else if (FastqInputFormat.isBgzf(conf, file)) {
      strictEnd = true
      val fileLen = fs.getFileStatus(file).getLen
      def readAt(p: Long, b: Array[Byte]): Unit = stream.readFully(p, b)
      val firstMember =
        if (start == 0) 0L else BamFormat.findBgzfBlock(fileLen, start, readAt)
      bgzf = new BgzfLineSource(stream, fileLen,
        math.min(firstMember, fileLen))
      if (firstMember != 0 && firstMember < fileLen) {
        var prev = BamFormat.previousBgzfBlock(fileLen, firstMember, readAt)
        var bytes = BamFormat.inflateMemberAt(stream, fileLen, prev)
        while (bytes.isEmpty && prev > 0) {
          prev = BamFormat.previousBgzfBlock(fileLen, prev, readAt)
          bytes = BamFormat.inflateMemberAt(stream, fileLen, prev)
        }
        if (bytes.nonEmpty && bytes(bytes.length - 1) != '\n') readRaw()
      }
    } else {
      decompressed = codec.createInputStream(stream)
      in = new LineReader(decompressed, conf)
      pos = 0L
      end = Long.MaxValue
    }
    pending = readRaw()
  }

  override def nextKeyValue(): Boolean = pending match {
    case Some((off, t)) if (if (strictEnd) off < end else off <= end) =>
      key.set(off)
      value.set(t)
      pending = readRaw()
      true
    case _ => false
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start || end == Long.MaxValue) 1.0f
    else if (bgzf != null)
      math.min(1.0f, (bgzf.position - start).toFloat / (end - start).toFloat)
    else math.min(1.0f, (pos - start).toFloat / (end - start).toFloat)
  override def close(): Unit = {
    if (decompressed != null) decompressed.close()
    if (stream != null) stream.close()
  }
}

/** Line reader over BGZF members with per-line member attribution: each
  * returned line carries the FILE offset of the member its first byte
  * lives in (the ownership unit for splitting). Lines may span members;
  * trailing `\r` is stripped like Hadoop's LineReader. */
private[sources] class BgzfLineSource(
    stream: FSDataInputStream, fileLen: Long, firstMember: Long) {
  private val members = BamFormat.bgzfMembers(stream, fileLen, firstMember)
  private var cur: Array[Byte] = Array.emptyByteArray
  private var curOff: Long = firstMember
  private var ptr = 0

  /** File offset of the last member opened (progress reporting). */
  def position: Long = curOff

  private def advance(): Boolean =
    if (!members.hasNext) false
    else {
      val (o, b) = members.next()
      curOff = o; cur = b; ptr = 0
      true
    }

  def readLine(): Option[(Long, Text)] = {
    while (ptr >= cur.length) if (!advance()) return None
    val lineMember = curOff
    val out = new java.io.ByteArrayOutputStream(96)
    var done = false
    while (!done) {
      if (ptr >= cur.length) { if (!advance()) done = true } // EOF ends line
      else {
        val b = cur(ptr); ptr += 1
        if (b == '\n') done = true else out.write(b)
      }
    }
    var bytes = out.toByteArray
    if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes = java.util.Arrays.copyOf(bytes, bytes.length - 1)
    val t = new Text
    t.set(bytes)
    Some((lineMember, t))
  }
}
