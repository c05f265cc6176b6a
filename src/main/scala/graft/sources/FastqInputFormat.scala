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
  * emitting — exactly the structure a future BAM/BGZF reader plugs into.
  *
  * Record-boundary detection: a line is a record header iff it starts with
  * `@` and the line two below starts with `+`. Sound for well-formed
  * 4-line FASTQ: a QUALITY line may also start with `@`, but two lines
  * below a quality line sits a sequence line (bases — never `+`), so only
  * true headers pass. (Multi-line FASTQ — wrapped sequence — is out of
  * scope, as it is for hadoop-bam's splitting reader.)
  *
  * Split ownership matches `LineRecordReader`'s convention so every record
  * is read exactly once with no cross-reader coordination: a record
  * belongs to the split `(start, end]` containing its header's first byte
  * (first split: `[0, end]`). A non-first reader discards the line at
  * `start` (possibly partial; if the header starts exactly at `start` the
  * PREVIOUS reader owns it, since its loop reads headers at offsets up to
  * and including its own `end`), then scans forward to the first header.
  *
  * At 100 TB: splits are independent byte ranges — no shuffle, no driver
  * state, standard FileInputFormat parallelism; compressed inputs fall
  * back to one split per file (codec streams aren't seekable). */
class FastqInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(ctx: JobContext, file: Path): Boolean =
    new CompressionCodecFactory(ctx.getConfiguration).getCodec(file) == null

  override def createRecordReader(split: InputSplit,
      ctx: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new FastqRecordReader
}

/** One 4-line record per `nextKeyValue`: key = header byte offset, value =
  * the four lines joined with `\n`. A trailing partial record (EOF mid
  * record) is dropped rather than emitted malformed. */
class FastqRecordReader extends RecordReader[LongWritable, Text] {

  private var start = 0L
  private var end = 0L
  private var pos = 0L
  private var in: LineReader = _
  private var stream: FSDataInputStream = _
  private val key = new LongWritable
  private val value = new Text
  /** Lookahead of (header-offset, line) pairs already pulled off the
    * stream — boundary tests peek two lines past a candidate header. */
  private val ahead = mutable.Queue.empty[(Long, Text)]

  private def readRaw(): Option[(Long, Text)] = {
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
    stream = file.getFileSystem(ctx.getConfiguration).open(file)
    if (start != 0) stream.seek(start)
    in = new LineReader(stream, ctx.getConfiguration)
    pos = start
    if (start != 0) {
      // The (possibly partial) line at `start` belongs to the previous
      // reader; then scan to the first record header.
      takeLine()
      while (peek(0).isDefined && !atHeader) takeLine()
    }
  }

  override def nextKeyValue(): Boolean = {
    // Sync guarantees the queue head (if any) is a header; ownership rule:
    // emit while the header offset is <= `end` (the next reader discarded
    // the line at its `start` == this `end`).
    peek(0) match {
      case Some((off, _)) if off <= end =>
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
    if (end == start) 1.0f
    else math.min(1.0f, (pos - start).toFloat / (end - start).toFloat)
  override def close(): Unit = if (stream != null) stream.close()
}
