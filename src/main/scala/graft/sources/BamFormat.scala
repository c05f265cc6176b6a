package graft.sources

import java.io.{BufferedInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, GZIPInputStream}

import scala.collection.mutable

/** Pure-JVM BAM container I/O (SURVEY §2.1 S1/S10; reference
  * `datasources/BAM/AlignmentRelation.scala:74-176` reads through
  * hadoop-bam + htsjdk, neither of which exists offline). Everything here
  * follows the PUBLIC SAM/BAM specification v1.6 (§4 and the BGZF
  * appendix) with `java.util.zip` as the compression engine:
  *
  *  - '''BGZF''' is a series of standard gzip members whose FEXTRA field
  *    carries the member length (`BC` subfield, BSIZE = member bytes − 1)
  *    plus a fixed 28-byte empty terminator member. Writing deflates
  *    ≤ 60 KiB chunks ([[BgzfOutputStream]]); READING simply wraps the
  *    stream in the JDK's own `GZIPInputStream`, which consumes
  *    concatenated members and FEXTRA natively — an independent codec
  *    validating that the blocks we emit are exactly what they claim.
  *  - '''BAM records''' are little-endian binary: the fixed 32-byte
  *    prefix (refID, 0-based pos, name length, mapq, bin, cigar-op and
  *    seq lengths, flag, mate fields), then NUL-terminated name, packed
  *    `op_len<<4|op` CIGAR words, 4-bit-packed sequence over the
  *    `=ACMGRSVTWYHKDBN` table, raw Phred quals, and typed tags (`MD:Z`
  *    is extracted; every other tag type is length-skipped per spec).
  *
  * Scale notes: readers stream — nothing buffers more than one record;
  * a file is one task (BGZF virtual-offset splitting needs a .bai-style
  * index, the documented next seam), so parallelism comes from the
  * many-files layout the sink writes (one sharded .bam per task, each
  * with a full header — the hadoop-bam output shape). Validated three
  * ways: a golden-byte spec (hand-assembled record bytes from the spec
  * text), JDK-gzip round trips, and parsing the real htsjdk-produced
  * 1000-Genomes slices in the reference checkout when present. */
object BamFormat {

  // ------------------------------------------------------------- BGZF write
  /** gzip members of <= 60 KiB uncompressed payload (spec cap 64 KiB;
    * headroom keeps the deflated member under the uint16 BSIZE even on
    * incompressible input) + the spec's fixed EOF member. */
  final class BgzfOutputStream(out: OutputStream) extends OutputStream {
    private val buf = new Array[Byte](60 * 1024)
    private var n = 0
    private var compressed = 0L

    /** FILE offset of the member the NEXT buffered byte lands in (all
      * prior members are already written out), and the byte's inflated
      * offset within it — a BGZF "virtual offset", what the sidecar
      * range index records per record start. */
    def virtualOffset: (Long, Int) = (compressed, n)

    override def write(b: Int): Unit = {
      buf(n) = b.toByte; n += 1
      if (n == buf.length) flushBlock()
    }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off; var left = len
      while (left > 0) {
        val take = math.min(left, buf.length - n)
        System.arraycopy(b, o, buf, n, take)
        n += take; o += take; left -= take
        if (n == buf.length) flushBlock()
      }
    }

    private def flushBlock(): Unit = if (n > 0) {
      val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      deflater.setInput(buf, 0, n)
      deflater.finish()
      val comp = new Array[Byte](buf.length + 1024)
      var clen = 0
      while (!deflater.finished()) clen += deflater.deflate(comp, clen, comp.length - clen)
      deflater.end()
      val crc = new CRC32
      crc.update(buf, 0, n)
      val total = 12 + 6 + clen + 8 // header + FEXTRA + payload + CRC/ISIZE
      require(total <= 0x10000, s"BGZF member overflow: $total")
      val h = new Array[Byte](18)
      h(0) = 0x1f.toByte; h(1) = 0x8b.toByte // gzip magic
      h(2) = 8 // CM = deflate
      h(3) = 4 // FLG = FEXTRA
      // MTIME(4) = 0, XFL = 0, OS = 0xff
      h(9) = 0xff.toByte
      h(10) = 6; h(11) = 0 // XLEN = 6
      h(12) = 'B'; h(13) = 'C'; h(14) = 2; h(15) = 0 // BC subfield, SLEN = 2
      val bsize = total - 1
      h(16) = (bsize & 0xff).toByte; h(17) = ((bsize >> 8) & 0xff).toByte
      out.write(h)
      out.write(comp, 0, clen)
      writeInt32(out, crc.getValue.toInt)
      writeInt32(out, n)
      compressed += total
      n = 0
    }

    override def flush(): Unit = { flushBlock(); out.flush() }
    override def close(): Unit = {
      flushBlock()
      out.write(BgzfEof)
      out.close()
    }
  }

  /** The spec's fixed empty terminator member. */
  val BgzfEof: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  private def writeInt32(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  // ------------------------------------------------------ little-endian I/O
  /** Bytes actually read: `b.length` on success, 0 on clean EOF before
    * the first byte, anything between on mid-structure truncation. */
  private def readCount(in: InputStream, b: Array[Byte]): Int = {
    var o = 0
    while (o < b.length) {
      val r = in.read(b, o, b.length - o)
      if (r < 0) return o
      o += r
    }
    o
  }
  private def readFully(in: InputStream, b: Array[Byte]): Boolean =
    readCount(in, b) == b.length
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff

  // ------------------------------------------------------------------ model
  case class BamHeader(text: String, refNames: Array[String], refLengths: Array[Int])
  case class BamRecord(refId: Int, pos0: Int, mapq: Int, flag: Int,
      qname: String, cigar: String, seq: String, quals: Array[Byte],
      nextRefId: Int, nextPos0: Int, tlen: Int, mdTag: String,
      refConsumed: Int, tagNm: Integer = null, tagRg: String = null,
      tagMap: scala.collection.Map[String, String] = null)

  /** Which variable-length record parts to DECODE (projection pushdown —
    * the reference extracts per requested column,
    * `AlignmentRelation.scala:214-261`). Every part is length-prefixed,
    * so an unwanted part is skipped in O(1) instead of materialized:
    * a `count(*)` over 100 TB of BAM pays prefix reads only. */
  case class DecodeSpec(name: Boolean = true, cigar: Boolean = true,
      refConsumed: Boolean = true, seq: Boolean = true, quals: Boolean = true,
      md: Boolean = true, nm: Boolean = true, rg: Boolean = true,
      tagMap: Boolean = false, tagKeys: Array[String] = null) {
    def tags: Boolean = md || nm || rg || tagMap
    /** Requested tag keys as `(c1<<8)|c2` codes for the decode loop's
      * per-tag membership probe (null = materialize every tag). Keys are
      * few (a handful of literal lookups), so a linear scan over an int
      * array beats any hash structure. */
    @transient lazy val tagKeyCodes: Array[Int] =
      if (tagKeys == null) null
      else tagKeys.map(k => (k.charAt(0) << 8) | k.charAt(1))
  }
  val FullDecode: DecodeSpec = DecodeSpec()

  /** Tag values actually RENDERED into the `tags` map (test
    * observability for per-key pruning — the value-skip arithmetic runs
    * regardless, rendering is the cost pruning avoids). LongAdder: the
    * count rides the hot decode loop across all task threads. */
  val tagsRendered = new java.util.concurrent.atomic.LongAdder()

  /** Predicates evaluated on the FIXED 32-byte record prefix (plus a
    * cigar-words-only walk when `pos_end` is constrained) BEFORE any
    * string materialization — the scan-level half of filter pushdown.
    * `refIdOk` is indexed by `refId + 1` (slot 0 = unmapped/-1); null
    * means unconstrained. Bounds are over the 1-based engine columns. */
  case class RecordFilter(refIdOk: Array[Boolean] = null,
      startMin: Int = Int.MinValue, startMax: Int = Int.MaxValue,
      endMin: Int = Int.MinValue, endMax: Int = Int.MaxValue,
      mapqMin: Int = Int.MinValue, mapqMax: Int = Int.MaxValue) {
    def constrainsEnd: Boolean = endMin != Int.MinValue || endMax != Int.MaxValue
    def constrainsPos: Boolean = constrainsEnd ||
      startMin != Int.MinValue || startMax != Int.MaxValue
    def constrainsRef: Boolean = refIdOk != null
  }

  private val SeqTable = "=ACMGRSVTWYHKDBN"
  private val CigarOps = "MIDNSHP=X"

  /** Canonical SAM-text rendering `TYPE:value` of a tag's raw value
    * bytes (the layout inside a BAM record's tag stream: fixed-width
    * little-endian numerics, NUL-stripped Z/H text, `B` = subtype byte +
    * int32 count + packed elements). All integer widths render as `i:`
    * like SAM text does; `I` (uint32) widens to long. Shared by the BAM
    * record decoder and the CRAM tag-series decoder so both alignment
    * sources emit the identical `tags` map surface. */
  def renderTag(tt: Char, raw: Array[Byte]): String = tt match {
    case 'A' => "A:" + raw(0).toChar
    case 'c' => "i:" + raw(0).toInt
    case 'C' => "i:" + (raw(0) & 0xff)
    case 's' => "i:" + ((raw(0) & 0xff) | (raw(1) << 8)).toShort.toInt
    case 'S' => "i:" + ((raw(0) & 0xff) | ((raw(1) & 0xff) << 8))
    case 'i' => "i:" + i32(raw, 0)
    case 'I' => "i:" + (i32(raw, 0) & 0xFFFFFFFFL)
    case 'f' => "f:" + java.lang.Float.intBitsToFloat(i32(raw, 0))
    case 'Z' => "Z:" + new String(raw, StandardCharsets.UTF_8)
    // H-type value bytes ARE hex ASCII text in the tag stream (SAM spec
    // §4.2.4) — carry the text through, like Z.
    case 'H' => "H:" + new String(raw, StandardCharsets.US_ASCII)
    case 'B' =>
      val sub = raw(0).toChar
      val count = i32(raw, 1)
      val size = sub match { case 'c' | 'C' => 1; case 's' | 'S' => 2; case _ => 4 }
      val sb = new StringBuilder("B:").append(sub)
      var i = 0
      while (i < count) {
        val o = 5 + i * size
        val v: String = sub match {
          case 'c' => raw(o).toInt.toString
          case 'C' => (raw(o) & 0xff).toString
          case 's' => ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort.toInt.toString
          case 'S' => ((raw(o) & 0xff) | ((raw(o + 1) & 0xff) << 8)).toString
          case 'i' => i32(raw, o).toString
          case 'I' => (i32(raw, o) & 0xFFFFFFFFL).toString
          case 'f' => java.lang.Float.intBitsToFloat(i32(raw, o)).toString
          case other => sys.error(s"unknown BAM B-array subtype '$other'")
        }
        sb.append(',').append(v)
        i += 1
      }
      sb.toString
    case other => sys.error(s"unknown BAM tag type '$other'")
  }

  /** Inverse of [[renderTag]]: encode one canonical `TYPE:value` string
    * back to tag-stream bytes — `TAG` (2 bytes) + type byte + value.
    * Integers re-encode at full `i` width (lossless for every narrower
    * input width); values past Int.MaxValue — [[renderTag]] renders
    * uint32 `I` tags as `i:` text like SAM does — re-encode as `I`
    * (uint32), and anything outside the int32 ∪ uint32 domain fails
    * loudly rather than truncating. */
  def encodeTag(key: String, tv: String): Array[Byte] = {
    require(key.length == 2, s"SAM tag key must be 2 chars: '$key'")
    require(tv.length >= 2 && tv.charAt(1) == ':',
      s"tag value must be in canonical 'TYPE:value' form: '$tv'")
    val tt = tv.charAt(0)
    val v = tv.substring(2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(key.charAt(0)); out.write(key.charAt(1))
    def le32(x: Int): Unit = {
      out.write(x & 0xff); out.write((x >> 8) & 0xff)
      out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
    }
    tt match {
      case 'A' => out.write('A'); out.write(v.charAt(0))
      case 'i' =>
        val l = v.toLong // uint32 renders past Int.MaxValue
        if (l >= Int.MinValue && l <= Int.MaxValue) { out.write('i'); le32(l.toInt) }
        else if (l > Int.MaxValue && l <= 0xFFFFFFFFL) { out.write('I'); le32(l.toInt) }
        else sys.error(s"integer tag $key out of int32/uint32 range: $l")
      case 'f' =>
        out.write('f'); le32(java.lang.Float.floatToIntBits(v.toFloat))
      case 'Z' | 'H' =>
        out.write(tt)
        val b = v.getBytes(StandardCharsets.UTF_8)
        out.write(b, 0, b.length); out.write(0)
      case 'B' =>
        val parts = v.split(',')
        val sub = parts(0).charAt(0)
        out.write('B'); out.write(sub)
        le32(parts.length - 1)
        parts.iterator.drop(1).foreach { e =>
          sub match {
            case 'c' | 'C' => out.write(e.toInt & 0xff)
            case 's' | 'S' =>
              val x = e.toInt; out.write(x & 0xff); out.write((x >> 8) & 0xff)
            case 'i' | 'I' => le32(e.toLong.toInt)
            case 'f' => le32(java.lang.Float.floatToIntBits(e.toFloat))
            case other => sys.error(s"unknown B-array subtype '$other'")
          }
        }
      case other => sys.error(s"unknown tag type '$other' in '$tv'")
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------- read
  /** Streaming record reader over a BGZF BAM stream (the JDK gzip engine
    * inflates the members). */
  final class BamReader(raw: InputStream) extends AutoCloseable {
    private val in: InputStream =
      new BufferedInputStream(new GZIPInputStream(new BufferedInputStream(raw), 1 << 16))
    val header: BamHeader = {
      val magic = new Array[Byte](4)
      require(readFully(in, magic) && magic(0) == 'B' && magic(1) == 'A' &&
        magic(2) == 'M' && magic(3) == 1, "not a BAM stream (bad magic)")
      val lText = readI32()
      val text = new Array[Byte](lText)
      require(readFully(in, text), "truncated BAM header text")
      val nRef = readI32()
      val names = new Array[String](nRef)
      val lens = new Array[Int](nRef)
      var i = 0
      while (i < nRef) {
        val lName = readI32()
        val nb = new Array[Byte](lName)
        require(readFully(in, nb), "truncated BAM reference name")
        names(i) = new String(nb, 0, lName - 1, StandardCharsets.UTF_8) // strip NUL
        lens(i) = readI32()
        i += 1
      }
      BamHeader(new String(text, StandardCharsets.UTF_8), names, lens)
    }

    private def readI32(): Int = {
      val b = new Array[Byte](4)
      if (!readFully(in, b)) throw new EOFException("truncated BAM int32")
      i32(b, 0)
    }

    /** Next alignment record, or None at clean EOF. */
    def next(): Option[BamRecord] = {
      val szb = new Array[Byte](4)
      val got = readCount(in, szb)
      if (got == 0) return None // clean EOF at a record boundary
      require(got == 4, s"truncated BAM record length ($got bytes at EOF)")
      val blockSize = i32(szb, 0)
      require(blockSize >= 32, s"implausible BAM record size $blockSize")
      val b = new Array[Byte](blockSize)
      require(readFully(in, b), "truncated BAM record")
      Some(decodeRecord(b, 0, blockSize))
    }

    def iterator: Iterator[BamRecord] = new Iterator[BamRecord] {
      private var nextRec = BamReader.this.next()
      override def hasNext: Boolean = nextRec.isDefined
      override def next(): BamRecord = {
        val r = nextRec.get; nextRec = BamReader.this.next(); r
      }
    }

    override def close(): Unit = in.close()
  }

  // ------------------------------------------------------- splittable read
  /** One inflated BGZF member with its file offset. */
  private case class Block(fileOffset: Long, bytes: Array[Byte])

  /** Member-at-a-time BGZF reader over a seekable byte source: parses
    * each gzip header, takes the BC/BSIZE FEXTRA subfield, and inflates
    * the raw-deflate payload with `java.util.zip.Inflater` — the pieces
    * GZIPInputStream hides but split processing needs (per-block FILE
    * offsets for record ownership). */
  /** Process-wide count of BGZF members inflated by split/indexed reads —
    * a lightweight observability hook; the index-skip spec asserts a
    * selective range query inflates fewer blocks than a full scan. */
  val blocksInflated = new java.util.concurrent.atomic.AtomicLong

  private final class BlockReader(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long, var offset: Long) {
    def next(): Option[Block] = {
      if (offset + 28 > fileLen) return None
      blocksInflated.incrementAndGet()
      val h = new Array[Byte](18)
      in.readFully(offset, h)
      require((h(0) & 0xff) == 0x1f && (h(1) & 0xff) == 0x8b && h(2) == 8,
        s"not a BGZF member at offset $offset")
      val xlen = u16(h, 10)
      // BSIZE lives in the BC subfield; for our own files and htsjdk's it
      // is the first (XLEN = 6). Walk the subfields for robustness.
      var bsize = -1
      if (xlen == 6 && h(12) == 'B' && h(13) == 'C') bsize = u16(h, 16)
      else {
        val all = new Array[Byte](xlen)
        in.readFully(offset + 12, all)
        var p = 0
        while (p + 4 <= all.length && bsize < 0) {
          val slen = u16(all, p + 2)
          if (all(p) == 'B' && all(p + 1) == 'C') bsize = u16(all, p + 4)
          p += 4 + slen
        }
      }
      require(bsize >= 0, s"BGZF member without BSIZE at offset $offset")
      val total = bsize + 1
      val compLen = total - 12 - xlen - 8
      val comp = new Array[Byte](compLen)
      in.readFully(offset + 12 + xlen, comp)
      val tail = new Array[Byte](8)
      in.readFully(offset + total - 8, tail)
      val isize = i32(tail, 4)
      val out = new Array[Byte](isize)
      if (isize > 0) {
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(comp)
        var o = 0
        while (o < isize && !inf.finished()) o += inf.inflate(out, o, isize - o)
        inf.end()
        require(o == isize, s"BGZF member at $offset inflated $o of $isize bytes")
      }
      val b = Block(offset, out)
      offset += total
      Some(b)
    }
  }

  /** Scan forward from `from` for the next BGZF member header: the gzip
    * magic/deflate/FEXTRA signature with a BC subfield whose BSIZE chains
    * to another valid header (or file end) — the double validation makes
    * a false positive inside compressed payload vanishingly unlikely. */
  def findBgzfBlock(fileLen: Long, from: Long,
      readAt: (Long, Array[Byte]) => Unit): Long = {
    var p = from
    val h = new Array[Byte](18)
    while (p + 28 <= fileLen) {
      readAt(p, h)
      if ((h(0) & 0xff) == 0x1f && (h(1) & 0xff) == 0x8b && h(2) == 8 && h(3) == 4 &&
          h(12) == 'B' && h(13) == 'C' && h(14) == 2 && h(15) == 0) {
        val total = u16(h, 16) + 1
        val nxt = p + total
        if (nxt == fileLen) return p
        if (nxt + 18 <= fileLen) {
          val h2 = new Array[Byte](18)
          readAt(nxt, h2)
          if ((h2(0) & 0xff) == 0x1f && (h2(1) & 0xff) == 0x8b && h2(2) == 8)
            return p
        }
      }
      p += 1
    }
    fileLen
  }

  /** Sequential (fileOffset, inflatedBytes) members from `from` — the
    * BGZF seam shared with BGZF-compressed TEXT sources (fastq.gz):
    * any record-synchronizing reader can split a BGZF file at member
    * granularity. */
  private[sources] def bgzfMembers(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long, from: Long): Iterator[(Long, Array[Byte])] = {
    val br = new BlockReader(in, fileLen, from)
    Iterator.continually(br.next()).takeWhile(_.isDefined)
      .map(b => (b.get.fileOffset, b.get.bytes))
  }

  /** Inflate the single member at `off`. */
  private[sources] def inflateMemberAt(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long, off: Long): Array[Byte] =
    new BlockReader(in, fileLen, off).next()
      .getOrElse(sys.error(s"no BGZF member at $off")).bytes

  /** File offset of the member immediately preceding the member at `at`
    * (members carry no back-pointers, but are capped at 64 KiB, so the
    * predecessor's header lies within the last 66 KB — scan there and
    * walk the BSIZE chain forward). */
  private[sources] def previousBgzfBlock(fileLen: Long, at: Long,
      readAt: (Long, Array[Byte]) => Unit): Long = {
    require(at > 0, "no member precedes offset 0")
    val from = math.max(0L, at - 66000L)
    var cand = if (from == 0L) 0L else findBgzfBlock(fileLen, from, readAt)
    require(cand < at, s"no BGZF member found between $from and $at")
    val h = new Array[Byte](18)
    var prev = -1L
    while (cand < at) {
      prev = cand
      readAt(cand, h)
      cand += u16(h, 16) + 1
    }
    require(cand == at, s"BGZF member chain skips offset $at (landed at $cand)")
    prev
  }

  /** Plausibility test for a BAM record starting at `o` in `data`
    * (hadoop-bam's split-guesser idea, re-derived from the spec): field
    * ranges must be sane, the in-record lengths must fit block_size, and
    * the NEXT record (if inside `data`) must chain plausibly. */
  private def plausibleRecord(data: Array[Byte], o: Int, nRef: Int,
      chain: Int): Boolean = {
    if (o + 36 > data.length) return false
    val blockSize = i32(data, o)
    if (blockSize < 32 || blockSize > (1 << 24)) return false
    val refId = i32(data, o + 4)
    if (refId < -1 || refId >= nRef) return false
    val pos0 = i32(data, o + 8)
    if (pos0 < -1 || pos0 > (1 << 29)) return false
    val lReadName = u8(data, o + 12)
    if (lReadName < 1) return false
    val nCigar = u16(data, o + 16)
    val lSeq = i32(data, o + 20)
    if (lSeq < 0 || lSeq > (1 << 24)) return false
    val nextRef = i32(data, o + 24)
    if (nextRef < -1 || nextRef >= nRef) return false
    val minSize = 32 + lReadName + 4 * nCigar + (lSeq + 1) / 2 + lSeq
    if (minSize > blockSize) return false
    if (chain <= 0) return true
    val nxt = o + 4 + blockSize
    if (nxt >= data.length - 4) true // next record out of probe range: accept
    else plausibleRecord(data, nxt, nRef, chain - 1)
  }


  /** Sort + overlap-merge virtual-offset ranges — shared by EVERY index
    * consumer (chunks of different bin levels and different references
    * can interleave over the same blocks; a range read twice would
    * duplicate records, and re-applied filters would NOT dedupe them). */
  private[sources] def mergeRanges(raw: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = raw.sortBy(_._1)
    val merged = mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { c =>
      if (merged.nonEmpty && c._1 <= merged.last._2)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, c._2))
      else merged += c
    }
    merged.toSeq
  }

  /** Standard `.bai` index consumption (SAM spec §5.2) — how the engine
    * turns `contig + position` predicates into block-precise reads of
    * EXTERNALLY-produced BAM files (the reference does the same through
    * htsjdk, `AlignmentRelation.scala:316-367`; files written by
    * [[SourceUtil.writeBam]] carry the richer `.gri` sidecar instead).
    * Chunks are (virtual offset) ranges `coffset << 16 | uoffset`; chunks
    * of DIFFERENT bin levels can interleave over the same blocks, so
    * callers must read the MERGED ranges or records would duplicate. */
  object BaiIndex {
    /** Per reference: bin → chunks as packed virtual offsets, plus the
      * 16 kb linear index. */
    final case class RefIndex(bins: Map[Int, Array[(Long, Long)]], linear: Array[Long])

    def read(data: Array[Byte]): Array[RefIndex] = {
      require(data.length >= 8 && data(0) == 'B' && data(1) == 'A' &&
        data(2) == 'I' && data(3) == 1, "not a BAI index (bad magic)")
      readRefBlock(data, 8, i32(data, 4))._1
    }

    /** The `n_ref` reference-index records starting at `start` — the
      * byte layout `.bai` and `.tbi` share (bins → chunks + linear
      * index). Returns the parsed refs and the end offset. */
    private[sources] def readRefBlock(data: Array[Byte], start: Int,
        nRef: Int): (Array[RefIndex], Int) = {
      var o = start
      def le32(): Int = {
        val v = i32(data, o); o += 4; v
      }
      def le64(): Long = {
        val lo = i32(data, o).toLong & 0xFFFFFFFFL
        val hi = i32(data, o + 4).toLong & 0xFFFFFFFFL
        o += 8
        (hi << 32) | lo
      }
      val refs = Array.fill(nRef) {
        val nBin = le32()
        val bins = Map.newBuilder[Int, Array[(Long, Long)]]
        var b = 0
        while (b < nBin) {
          val bin = le32()
          val nChunk = le32()
          val chunks = Array.fill(nChunk)((le64(), le64()))
          // 37450 is the spec's metadata pseudo-bin, not record chunks.
          if (bin != 37450) bins += bin -> chunks
          b += 1
        }
        val nIntv = le32()
        RefIndex(bins.result(), Array.fill(nIntv)(le64()))
      }
      (refs, o)
    }

    /** Bins possibly holding records overlapping 0-based [beg, end)
      * (the spec's reg2bins). */
    def reg2bins(beg: Int, end0: Int): Seq[Int] = {
      val end = end0 - 1
      val out = Seq.newBuilder[Int]
      out += 0
      var k = 1 + (beg >> 26); while (k <= 1 + (end >> 26)) { out += k; k += 1 }
      k = 9 + (beg >> 23); while (k <= 9 + (end >> 23)) { out += k; k += 1 }
      k = 73 + (beg >> 20); while (k <= 73 + (end >> 20)) { out += k; k += 1 }
      k = 585 + (beg >> 17); while (k <= 585 + (end >> 17)) { out += k; k += 1 }
      k = 4681 + (beg >> 14); while (k <= 4681 + (end >> 14)) { out += k; k += 1 }
      out.result()
    }

    /** MERGED virtual-offset ranges of records possibly overlapping the
      * 1-based inclusive region [beg1, end1] on `refIdx` — linear-index
      * floored, sorted, overlap-merged (ready to read exactly once). */
    def chunksFor(ri: RefIndex, beg1: Int, end1: Int): Seq[(Long, Long)] = {
      val beg0 = math.max(0, beg1 - 1)
      val end0 = math.min(1 << 29, math.max(beg0 + 1, end1))
      val linMin =
        if (ri.linear.isEmpty) 0L
        else ri.linear(math.min(beg0 >> 14, ri.linear.length - 1))
      mergeRanges(reg2bins(beg0, end0)
        .flatMap(b => ri.bins.getOrElse(b, Array.empty[(Long, Long)]))
        .filter(_._2 > linMin)
        .map { case (b, e) => (math.max(b, linMin), e) }
        .filter(c => c._1 < c._2))
    }
  }

  /** Standard tabix `.tbi` index consumption (samtools tabix spec —
    * the text twin of `.bai`): the same bin/chunk/linear layout over
    * BGZF virtual offsets, prefixed by a header naming the reference
    * sequences and the indexed columns. Lets `contig + position`
    * predicates prune EXTERNALLY-produced bgzip VCF/SAM/BED/GFF text the
    * engine did not write (engine-written shards carry the richer `.gvi`;
    * [[GraftIndexer]] covers unindexed foreign files). The `.tbi` file is
    * itself BGZF-compressed — callers hand in the inflated bytes. */
  object TbiIndex {
    final case class Tbi(names: Array[String], refs: Array[BaiIndex.RefIndex])

    def read(data: Array[Byte]): Tbi = {
      require(data.length >= 36 && data(0) == 'T' && data(1) == 'B' &&
        data(2) == 'I' && data(3) == 1, "not a TBI index (bad magic)")
      val nRef = i32(data, 4)
      // format, col_seq, col_beg, col_end, meta, skip: query planning
      // needs none of them — chunk reads return whole lines and the text
      // parse re-derives every column.
      val lNm = i32(data, 32)
      val names = new String(data, 36, lNm, java.nio.charset.StandardCharsets.US_ASCII)
        .split('\u0000').filter(_.nonEmpty)
      require(names.length == nRef,
        s"TBI declares $nRef references but names ${names.length}")
      Tbi(names, BaiIndex.readRefBlock(data, 36 + lNm, nRef)._1)
    }
  }

  /** Standard CSI v1 index consumption (hts-specs CSIv1) — the
    * generalized successor of `.bai`/`.tbi` that bcftools/samtools emit
    * by default for large genomes: parameterized `(min_shift, depth)`
    * binning over BGZF virtual offsets with 64-bit coordinate reach, a
    * per-bin `loffset` in place of the 16 kb linear index. The index file
    * is itself BGZF-compressed — callers hand in inflated bytes. `names`
    * come from the tabix-header aux payload when the CSI indexes text;
    * empty for BAM (reference order comes from the BAM header). */
  object CsiIndex {
    /** `loffsets(ref)(bin)` = the bin's spec `loffset` (virtual offset of
      * its first overlapping record on a coordinate-sorted file; 0 = no
      * floor — voffset 0 is always inside the header, so a real record
      * can never sit there). */
    final case class Csi(minShift: Int, depth: Int, names: Array[String],
        refs: Array[BaiIndex.RefIndex], loffsets: Array[Map[Int, Long]])

    def read(data: Array[Byte]): Csi = {
      require(data.length >= 16 && data(0) == 'C' && data(1) == 'S' &&
        data(2) == 'I' && data(3) == 1, "not a CSI index (bad magic)")
      val minShift = i32(data, 4)
      val depth = i32(data, 8)
      val lAux = i32(data, 12)
      // Tabix-flavored aux: format/col_seq/col_beg/col_end/meta/skip
      // (24 bytes) + l_nm + NUL-terminated names; empty for BAM.
      val names =
        if (lAux >= 28) {
          val lNm = i32(data, 16 + 24)
          new String(data, 16 + 28, lNm, java.nio.charset.StandardCharsets.US_ASCII)
            .split('\u0000').filter(_.nonEmpty)
        } else Array.empty[String]
      var o = 16 + lAux
      val nRef = i32(data, o); o += 4
      // The per-ref layout differs from BAI by the loffset word after
      // each bin id; metadata pseudo-bins (> maxBin) are skipped.
      val maxBin = (((1L << (3 * (depth + 1))) - 1) / 7).toInt
      def le64(): Long = {
        val lo = i32(data, o).toLong & 0xFFFFFFFFL
        val hi = i32(data, o + 4).toLong & 0xFFFFFFFFL
        o += 8
        (hi << 32) | lo
      }
      val loffs = Array.newBuilder[Map[Int, Long]]
      val refs = Array.fill(nRef) {
        val nBin = i32(data, o); o += 4
        val bins = Map.newBuilder[Int, Array[(Long, Long)]]
        val lo = Map.newBuilder[Int, Long]
        var b = 0
        while (b < nBin) {
          val bin = i32(data, o); o += 4
          val loffset = le64()
          val nChunk = i32(data, o); o += 4
          val chunks = Array.fill(nChunk)((le64(), le64()))
          if (bin <= maxBin) {
            bins += bin -> chunks
            if (loffset > 0L) lo += bin -> loffset
          }
          b += 1
        }
        loffs += lo.result()
        BaiIndex.RefIndex(bins.result(), Array.emptyLongArray)
      }
      Csi(minShift, depth, names, refs, loffs.result())
    }

    /** Generalized reg2bins for a `(min_shift, depth)` scheme (htslib's
      * algorithm; `(14, 5)` reproduces the BAI/TBI bin numbering). */
    def reg2bins(beg: Long, end0: Long, minShift: Int, depth: Int): Seq[Int] = {
      val end = end0 - 1
      val out = Seq.newBuilder[Int]
      var l = 0; var t = 0L; var s = minShift + depth * 3
      while (l <= depth) {
        var i = t + (beg >> s); val e = t + (end >> s)
        while (i <= e) { out += i.toInt; i += 1 }
        s -= 3; t += 1L << (l * 3); l += 1
      }
      out.result()
    }

    /** MERGED virtual-offset ranges possibly overlapping the 1-based
      * inclusive [beg1, end1] — the CSI twin of [[BaiIndex.chunksFor]].
      * `loff` (bin → loffset) replaces BAI's linear index: every record
      * overlapping the query overlaps each window CONTAINING `beg`, so on
      * a coordinate-sorted file the tightest existing root→leaf path
      * loffset floors all chunk starts (htslib's walk). Writers flag
      * unsorted input by omitting loffsets, which disables the floor —
      * correctness never depends on it. */
    def chunksFor(ri: BaiIndex.RefIndex, beg1: Long, end1: Long,
        minShift: Int, depth: Int,
        loff: Map[Int, Long] = Map.empty): Seq[(Long, Long)] = {
      val maxPos = 1L << (minShift + depth * 3)
      val beg0 = math.max(0L, beg1 - 1)
      val end0 = math.min(maxPos, math.max(beg0 + 1, end1))
      // Root→leaf path bins of beg0, tightest (deepest) floor wins.
      var linMin = 0L
      if (loff.nonEmpty) {
        var l = 0; var t = 0L
        while (l <= depth) {
          val bin = (t + (beg0 >> (minShift + (depth - l) * 3))).toInt
          loff.get(bin).foreach(v => linMin = math.max(linMin, v))
          t += 1L << (l * 3); l += 1
        }
      }
      mergeRanges(reg2bins(beg0, end0, minShift, depth)
        .flatMap(b => ri.bins.getOrElse(b, Array.empty[(Long, Long)]))
        .filter(_._2 > linMin)
        .map { case (b, e) => (math.max(b, linMin), e) }
        .filter(c => c._1 < c._2))
    }
  }

  /** Records of the byte-range split `[start, end)` of a BAM file —
    * the 100 TB path: a task owns the records STARTING in BGZF blocks
    * whose file offset falls in its range (the first split also owns the
    * in-header region), so a file parallelizes without any index. The
    * reader synchronizes in two layers: find the first BGZF member at or
    * after `start` (double-validated header chain), then find the first
    * plausible record start in its inflated bytes (field-sanity chain of
    * 3 records — no record magic exists, the published split-guesser
    * approach). Records may SPAN blocks; a record is read to completion
    * from following blocks even past `end` (the next split skips it
    * because its start block is before its range). */
  def splitRecords(open: () => org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long, start: Long, end: Long, spec: DecodeSpec = FullDecode,
      filter: RecordFilter = null, nRefHint: Int = -1,
      firstRecOff: Long = -1L, endVirtual: Long = -1L): Iterator[BamRecord] = {
    // References (for record plausibility) — passed in by callers that
    // already parsed the header (the planner needs it for contig→refId
    // predicate mapping anyway); parsed here only as a fallback.
    val nRef =
      if (nRefHint >= 0) nRefHint
      else {
        val hdrReader = new BamReader(open())
        val n = hdrReader.header.refNames.length
        hdrReader.close()
        n
      }
    val in = open()
    def readAt(p: Long, b: Array[Byte]): Unit = in.readFully(p, b)
    val firstBlock =
      if (start == 0L) 0L else findBgzfBlock(fileLen, start, readAt)
    if (firstBlock >= fileLen) { in.close(); return Iterator.empty }
    val blocks = new BlockReader(in, fileLen, firstBlock)

    // Inflated working window with block attribution: `segs` records the
    // FILE offset of each appended member and its start index in `buf`;
    // `base` is the inflated offset of buf(0), so the window can be
    // COMPACTED as the cursor advances — per-task memory stays a few
    // blocks regardless of split size.
    val segs = mutable.ArrayBuffer.empty[(Long, Long)] // (blockOffset, startInflatedOff)
    var buf = Array.emptyByteArray
    var base = 0L
    def append(): Boolean = blocks.next() match {
      case Some(b) =>
        segs += ((b.fileOffset, base + buf.length))
        buf = buf ++ b.bytes
        true
      case None => false
    }
    def blockOf(inflatedOff: Long): Long = {
      var i = segs.length - 1
      while (i >= 0 && segs(i)._2 > inflatedOff) i -= 1
      segs(i)._1
    }
    // BGZF virtual offset of an inflated position: coffset << 16 | uoffset
    // (the `.bai` chunk coordinate space).
    def virtualOf(inflatedOff: Long): Long = {
      var i = segs.length - 1
      while (i >= 0 && segs(i)._2 > inflatedOff) i -= 1
      (segs(i)._1 << 16) | (inflatedOff - segs(i)._2)
    }
    def compact(keepFrom: Long): Unit = {
      val dropB = (keepFrom - base).toInt
      if (dropB > (1 << 20)) {
        buf = java.util.Arrays.copyOfRange(buf, dropB, buf.length)
        base = keepFrom
        // Keep the last segment at or before keepFrom (its block still
        // attributes the first retained bytes).
        while (segs.length > 1 && segs(1)._2 <= keepFrom) segs.remove(0)
      }
    }
    if (!append()) { in.close(); return Iterator.empty }
    def at(off: Long): Int = (off - base).toInt
    def ensure(n: Long): Boolean = {
      while (base + buf.length < n && append()) ()
      base + buf.length >= n
    }

    // Sync: an indexed read starts at the KNOWN first-record offset; the
    // first split PARSES the header (deterministic); later splits probe
    // the owned blocks' bytes for a plausible record start. The probe
    // window spans blocks: a record larger than one BGZF member (routine
    // in long-read data) can cover a split's whole first block, so the
    // probe continues into subsequent owned blocks until a plausible
    // start is found or the owned range is exhausted.
    var cursor = -1L
    if (firstRecOff >= 0L) {
      cursor = firstRecOff
    } else if (start == 0L) {
      // magic(4), l_text, text, n_ref, then per-ref (l_name, name, l_ref)
      // — the 51 KB header of a real file spans several blocks.
      ensure(12)
      val lText = i32(buf, 4)
      ensure(8L + lText + 4)
      var o = 8L + lText
      val n = i32(buf, at(o)); o += 4
      var i = 0
      while (i < n) {
        ensure(o + 4); val ln = i32(buf, at(o)); o += 4 + ln
        ensure(o + 4); o += 4
        i += 1
      }
      cursor = o
    } else {
      var probe = 0L
      var exhausted = false
      while (cursor < 0 && !exhausted) {
        if (!ensure(probe + 1) || blockOf(probe) >= end) exhausted = true
        else {
          // Enough lookahead for the 3-record plausibility chain.
          ensure(probe + (1L << 16))
          if (plausibleRecord(buf, at(probe), nRef, chain = 2)) cursor = probe
          else probe += 1
        }
      }
      if (cursor < 0) { in.close(); return Iterator.empty }
    }

    val passes: (Array[Byte], Int) => Boolean =
      if (filter == null) (_, _) => true
      else (data, o0) => {
        val refId = i32(data, o0)
        val ok1 = (filter.refIdOk == null ||
            (refId + 1 >= 0 && refId + 1 < filter.refIdOk.length && filter.refIdOk(refId + 1))) && {
          val posStart = i32(data, o0 + 4) + 1
          posStart >= filter.startMin && posStart <= filter.startMax && {
            val mapq = u8(data, o0 + 9)
            mapq >= filter.mapqMin && mapq <= filter.mapqMax
          }
        }
        if (!ok1) false
        else if (!filter.constrainsEnd) true
        else {
          val posStart = i32(data, o0 + 4) + 1
          val posEnd = posStart + math.max(refConsumedOf(data, o0), 1) - 1
          posEnd >= filter.endMin && posEnd <= filter.endMax
        }
      }

    new Iterator[BamRecord] {
      private var nextRec: BamRecord = _
      private var done = false
      advance()
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !done) {
          compact(cursor)
          // Ownership: the record must START in a block with offset < end
          // (byte-range splits), or strictly before the chunk's end
          // virtual offset (.bai-planned reads).
          if (!ensure(cursor + 4) ||
            (if (endVirtual >= 0) virtualOf(cursor) >= endVirtual
             else blockOf(cursor) >= end)) {
            done = true; in.close()
          } else {
            val blockSize = i32(buf, at(cursor))
            // A structurally impossible size is a LOUD error, not a quiet
            // stop: a negative size would move the cursor BACKWARD (an
            // infinite loop serving the same garbage), and an undersized
            // one silently desyncs the stream — the corrupt/foreign-input
            // class the BCF framing audits catch (r15 review). NO upper
            // bound here: htslib permits records to 2 GB and multi-Mbp
            // long reads with MM/ML tags legitimately exceed any small
            // cap (the 1<<24 bound in plausibleRecord is a SYNC-PROBE
            // heuristic, where a miss just moves the probe — never a
            // validity rule).
            require(blockSize == 0 || blockSize >= 32,
              s"BAM: implausible record size $blockSize at file offset " +
              s"${blockOf(cursor)} (corrupt or desynced stream)")
            if (blockSize == 0 || !ensure(cursor + 4 + blockSize)) {
              done = true; in.close() // EOF terminator / truncation
            } else {
              val o0 = at(cursor) + 4
              // Declared variable-length fields must fit the record BEFORE
              // any field walk (the cigar walk in `passes` and the decode
              // both trust them); long arithmetic so a hostile l_seq
              // cannot overflow the comparison.
              val lrn = u8(buf, o0 + 8)
              val ncig = u16(buf, o0 + 12)
              val lsq = i32(buf, o0 + 16)
              require(lrn >= 1 && lsq >= 0 &&
                32L + lrn + 4L * ncig + (lsq + 1L) / 2 + lsq <= blockSize,
                s"BAM: record at file offset ${blockOf(cursor)} declares " +
                s"l_read_name=$lrn n_cigar=$ncig l_seq=$lsq beyond its " +
                s"block_size=$blockSize (corrupt or foreign input)")
              if (passes(buf, o0)) nextRec = decodeRecord(buf, o0, blockSize, spec)
              cursor += 4 + blockSize
            }
          }
        }
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): BamRecord = { val r = nextRec; advance(); r }
    }
  }

  /** Reference-consumed length from a cigar-words-only walk (no string
    * build) — what `pos_end` predicates need before full decode. */
  private def refConsumedOf(data: Array[Byte], o0: Int): Int = {
    val lReadName = u8(data, o0 + 8)
    val nCigar = u16(data, o0 + 12)
    var o = o0 + 32 + lReadName
    var rc = 0
    var i = 0
    while (i < nCigar) {
      val w = i32(data, o); o += 4
      val op = CigarOps.charAt(w & 0xf)
      if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X')
        rc += (w >>> 4)
      i += 1
    }
    rc
  }

  /** Decode one alignment block at `data[o, o + blockSize)`, materializing
    * only the parts `spec` asks for (unwanted length-prefixed parts are
    * skipped in O(1)). */
  private def decodeRecord(data: Array[Byte], o0: Int, blockSize: Int,
      spec: DecodeSpec = FullDecode): BamRecord = {
    val refId = i32(data, o0)
    val pos0 = i32(data, o0 + 4)
    val lReadName = u8(data, o0 + 8)
    val mapq = u8(data, o0 + 9)
    val nCigar = u16(data, o0 + 12)
    val flag = u16(data, o0 + 14)
    val lSeq = i32(data, o0 + 16)
    val nextRefId = i32(data, o0 + 20)
    val nextPos0 = i32(data, o0 + 24)
    val tlen = i32(data, o0 + 28)
    // Structural guard (long arithmetic so a hostile l_seq cannot
    // overflow): the scan loop checks this too, but decodeRecord is also
    // reached from the single-record reader — garbage lengths must fail
    // loudly, not as a bare ArrayIndexOutOfBounds.
    require(lReadName >= 1 && lSeq >= 0 &&
      32L + lReadName + 4L * nCigar + (lSeq + 1L) / 2 + lSeq <= blockSize,
      s"BAM: record declares l_read_name=$lReadName n_cigar=$nCigar " +
      s"l_seq=$lSeq beyond its block_size=$blockSize (corrupt or foreign input)")
    var o = o0 + 32
    val qname =
      if (spec.name) new String(data, o, lReadName - 1, StandardCharsets.UTF_8) else null
    o += lReadName
    var refConsumed = 0
    var cigar: String = null
    if (spec.cigar) {
      val cigarSb = new StringBuilder
      var i = 0
      while (i < nCigar) {
        val w = i32(data, o); o += 4
        val opLen = w >>> 4
        val op = CigarOps.charAt(w & 0xf)
        cigarSb.append(opLen).append(op)
        if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X')
          refConsumed += opLen
        i += 1
      }
      cigar = if (nCigar == 0) "*" else cigarSb.toString
    } else {
      if (spec.refConsumed) refConsumed = refConsumedOf(data, o0)
      o += 4 * nCigar
    }
    var seq: String = null
    if (spec.seq) {
      val seqSb = new StringBuilder(lSeq)
      var i = 0
      while (i < lSeq) {
        val byte = u8(data, o + (i >> 1))
        seqSb.append(SeqTable.charAt(if ((i & 1) == 0) byte >>> 4 else byte & 0xf))
        i += 1
      }
      seq = seqSb.toString
    }
    o += (lSeq + 1) / 2
    val quals =
      if (spec.quals) java.util.Arrays.copyOfRange(data, o, o + lSeq) else null
    o += lSeq
    var md: String = null
    var nm: Integer = null
    var rg: String = null
    val tmap: mutable.LinkedHashMap[String, String] =
      if (spec.tagMap) mutable.LinkedHashMap.empty else null
    if (spec.tags) {
      val limit = o0 + blockSize
      while (o < limit) {
        // The 3-byte tag header must fit the record BEFORE it is read —
        // in the single-record reader the buffer ENDS at `limit`, so an
        // unguarded data(o+1) on 1-2 trailing junk bytes would be a bare
        // ArrayIndexOutOfBounds (r15 review), and in the split scan it
        // would silently read the next record's bytes.
        require(limit - o >= 3,
          s"BAM: ${limit - o} trailing byte(s) in the tag region cannot " +
          "hold a tag header (corrupt or foreign record)")
        val t1 = data(o).toChar; val t2 = data(o + 1).toChar
        val vt = data(o + 2).toChar
        o += 3
        val vs = o // value start, for the generic-map slice
        // Fixed-size values must fit the record BEFORE they are read
        // (r15 review): the trailing require(o <= limit) fires only
        // after the read, so in the single-record reader a record
        // truncated mid-value (e.g. 2 bytes of an 'i' NM) would still
        // die as a bare ArrayIndexOutOfBounds — the exact class the
        // header / Z/H / B guards convert to descriptive errors.
        val fixedSize = vt match {
          case 'A' | 'c' | 'C' => 1
          case 's' | 'S' => 2
          case 'i' | 'I' | 'f' => 4
          case _ => 0 // Z/H/B bound themselves below
        }
        require(limit - o >= fixedSize,
          s"BAM: $t1$t2:$vt value ($fixedSize byte(s)) overruns the " +
          "record boundary (corrupt or foreign record)")
        vt match {
          case 'A' => o += 1
          case 'c' =>
            if (spec.nm && t1 == 'N' && t2 == 'M') nm = data(o).toInt
            o += 1
          case 'C' =>
            if (spec.nm && t1 == 'N' && t2 == 'M') nm = u8(data, o)
            o += 1
          case 's' =>
            if (spec.nm && t1 == 'N' && t2 == 'M') nm = u16(data, o).toShort.toInt
            o += 2
          case 'S' =>
            if (spec.nm && t1 == 'N' && t2 == 'M') nm = u16(data, o)
            o += 2
          case 'i' | 'I' =>
            if (spec.nm && t1 == 'N' && t2 == 'M') nm = i32(data, o)
            o += 4
          case 'f' => o += 4
          case 'Z' | 'H' =>
            val s = o
            // Bounded by the record: an unterminated string would
            // otherwise walk into the NEXT record's bytes and render a
            // silently-wrong value (r15 review).
            while (o < limit && data(o) != 0) o += 1
            require(o < limit,
              s"BAM: unterminated $t1$t2:$vt tag runs past the record boundary")
            if (vt == 'Z') {
              if (spec.md && t1 == 'M' && t2 == 'D')
                md = new String(data, s, o - s, StandardCharsets.UTF_8)
              else if (spec.rg && t1 == 'R' && t2 == 'G')
                rg = new String(data, s, o - s, StandardCharsets.UTF_8)
            }
            o += 1
          case 'B' =>
            // The 5-byte array header (subtype + count) must fit before
            // it is read — same bare-AIOOBE/silent-cross-read class as
            // the tag header above.
            require(limit - o >= 5,
              s"BAM: B-array tag $t1$t2 header overruns the record boundary")
            val sub = data(o).toChar
            val count = i32(data, o + 1)
            val size = sub match { case 'c' | 'C' => 1; case 's' | 'S' => 2; case _ => 4 }
            // Long arithmetic: a hostile count overflows `count * size`
            // negative and would move the offset BACKWARD (infinite tag
            // loop re-reading the same bytes).
            require(count >= 0 && 5L + count.toLong * size <= (limit - o).toLong,
              s"BAM: B-array tag $t1$t2 (count=$count) overruns the record boundary")
            o += 5 + count * size
          case other => sys.error(s"unknown BAM tag type '$other' for $t1$t2")
        }
        require(o <= limit,
          s"BAM: tag $t1$t2:$vt overruns the record boundary (corrupt or foreign record)")
        if (tmap != null) {
          // Per-key pruning: when the plan proved only literal-key
          // lookups touch the map, every other tag's value bytes are
          // skipped by the arithmetic above and never rendered.
          val keyCodes = spec.tagKeyCodes
          val wanted = keyCodes == null || {
            val code = (t1 << 8) | t2
            var ki = 0
            var hit = false
            while (!hit && ki < keyCodes.length) {
              hit = keyCodes(ki) == code; ki += 1
            }
            hit
          }
          if (wanted) {
            // Z/H rendered from the NUL-stripped slice; everything else
            // from the exact value bytes the skip logic just measured.
            val end = if (vt == 'Z' || vt == 'H') o - 1 else o
            tagsRendered.increment()
            tmap(s"$t1$t2") =
              renderTag(vt, java.util.Arrays.copyOfRange(data, vs, end))
          }
        }
      }
    }
    BamRecord(refId, pos0, mapq, flag, qname, cigar, seq, quals,
      nextRefId, nextPos0, tlen, md, refConsumed, nm, rg, tmap)
  }

  // ------------------------------------------------------------------ write
  /** SAM-spec `reg2bin` (0-based inclusive [beg, end)). */
  def reg2bin(beg: Int, end0: Int): Int = {
    val end = end0 - 1
    if (beg >> 14 == end >> 14) ((1 << 15) - 1) / 7 + (beg >> 14)
    else if (beg >> 17 == end >> 17) ((1 << 12) - 1) / 7 + (beg >> 17)
    else if (beg >> 20 == end >> 20) ((1 << 9) - 1) / 7 + (beg >> 20)
    else if (beg >> 23 == end >> 23) ((1 << 6) - 1) / 7 + (beg >> 23)
    else if (beg >> 26 == end >> 26) ((1 << 3) - 1) / 7 + (beg >> 26)
    else 0
  }

  /** Per-BGZF-member record statistics for the sidecar range index. */
  private final class BlockStat(val firstRecOff: Int) {
    var minRef: Int = Int.MaxValue; var maxRef: Int = Int.MinValue
    var minStart: Int = Int.MaxValue; var maxEnd: Int = Int.MinValue
    var n: Long = 0L
  }

  /** Sidecar range-index file suffix (`<file>.bam` → `<file>.bam.gri`):
    * one text line per BGZF member that has records STARTING in it —
    * `blockOffset firstRecordInflatedOffset minRefId maxRefId
    * minPosStart maxPosEnd nRecords`. The BAI analogue for this engine's
    * own output: a reader with a `contig + position` predicate prunes
    * whole members and starts decoding at a KNOWN record boundary (no
    * plausibility probe), the way the reference turns interval
    * predicates into BAI queries (`AlignmentRelation.scala:316-367`). */
  val IndexSuffix = ".gri"

  final class BamWriter(raw: OutputStream, refNames: Array[String],
      refLengths: Array[Int], indexOut: OutputStream = null,
      baiOut: OutputStream = null) {
    private val bgzf = new BgzfOutputStream(raw)
    private val out = new DataOutputStream(bgzf)
    private val refIndex: Map[String, Int] = refNames.zipWithIndex.toMap
    private val blockStats = mutable.LinkedHashMap.empty[Long, BlockStat]

    // Standard BAI accumulation (when baiOut is given): per reference,
    // bin -> merged virtual-offset chunks + the 16 kb linear index —
    // the SAM-spec §5.2 index external tools (samtools/htsjdk/IGV) and
    // BamSource's own .bai query path consume.
    private val baiBins: Array[mutable.LinkedHashMap[Int, mutable.ArrayBuffer[Array[Long]]]] =
      if (baiOut == null) null
      else Array.fill(refNames.length)(mutable.LinkedHashMap.empty)
    private val baiLinear: Array[mutable.ArrayBuffer[Long]] =
      if (baiOut == null) null
      else Array.fill(refNames.length)(mutable.ArrayBuffer.empty)

    // Header: magic, SAM text (minimal @HD/@SQ), reference dictionary.
    locally {
      val text = ("@HD\tVN:1.6\tSO:unsorted\n" +
        refNames.zip(refLengths)
          .map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString).getBytes("UTF-8")
      out.write(Array[Byte]('B', 'A', 'M', 1))
      le32(text.length)
      out.write(text)
      le32(refNames.length)
      refNames.zip(refLengths).foreach { case (n, l) =>
        val nb = n.getBytes("UTF-8")
        le32(nb.length + 1); out.write(nb); out.write(0); le32(l)
      }
    }

    private def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    private def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }

    private def cigarWords(cigar: String): Array[Int] = {
      if (cigar == null || cigar.isEmpty || cigar == "*") return Array.emptyIntArray
      val ws = mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < cigar.length) {
        var len = 0
        while (cigar.charAt(i).isDigit) { len = len * 10 + (cigar.charAt(i) - '0'); i += 1 }
        val op = CigarOps.indexOf(cigar.charAt(i)); i += 1
        require(op >= 0, s"bad CIGAR op in '$cigar'")
        ws += ((len << 4) | op)
      }
      ws.toArray
    }

    /** `pos1` is 1-based inclusive (engine convention); quals are raw
      * Phred. A null/unknown contig writes refID -1 (unmapped slot);
      * optional `nm`/`rg` write typed NM:i / RG:Z tags. `extraTags` are
      * arbitrary additional tags in [[BamFormat.renderTag]]'s canonical
      * `TYPE:value` form (keys must not repeat MD/NM/RG when those are
      * also passed typed — the spec forbids duplicate tags). */
    def write(contig: String, pos1: Int, mapq: Int, flag: Int, qname: String,
        cigar: String, seq: String, quals: Array[Byte], mdTag: String,
        nm: Integer = null, rg: String = null,
        extraTags: Seq[(String, String)] = Nil): Unit = {
      val refId = if (contig == null) -1 else refIndex.getOrElse(contig, -1)
      val name = (if (qname == null || qname.isEmpty) "*" else qname).getBytes("UTF-8")
      // l_read_name is a single byte including the NUL (spec cap 254
      // name bytes); a longer name would silently truncate the length
      // byte mod 256 while blockSize kept the full length — corrupt.
      require(name.length <= 254,
        s"BAM read name exceeds the spec's 254-byte cap (${name.length}): " +
          new String(name, 0, 40, StandardCharsets.UTF_8) + "…")
      val words = cigarWords(cigar)
      val s = if (seq == null) "" else seq
      val lSeq = s.length
      val refConsumed = words.iterator.filter { w =>
        val op = CigarOps.charAt(w & 0xf); op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X'
      }.map(_ >>> 4).sum
      val md = if (mdTag == null) Array.emptyByteArray
        else s"MD".getBytes("UTF-8") ++ Array('Z'.toByte) ++
          mdTag.getBytes("UTF-8") ++ Array(0.toByte)
      val nmTag = if (nm == null) Array.emptyByteArray
        else Array('N'.toByte, 'M'.toByte, 'i'.toByte,
          (nm.intValue & 0xff).toByte, ((nm.intValue >> 8) & 0xff).toByte,
          ((nm.intValue >> 16) & 0xff).toByte, ((nm.intValue >> 24) & 0xff).toByte)
      val rgTag = if (rg == null) Array.emptyByteArray
        else s"RG".getBytes("UTF-8") ++ Array('Z'.toByte) ++
          rg.getBytes("UTF-8") ++ Array(0.toByte)
      val extra: Array[Byte] =
        if (extraTags.isEmpty) Array.emptyByteArray
        else {
          val b = new java.io.ByteArrayOutputStream()
          extraTags.foreach { case (k, tv) => b.write(encodeTag(k, tv)) }
          b.toByteArray
        }
      // Range-index bookkeeping: the record's first byte lands in the
      // member at the stream's current virtual offset.
      val vStart = {
        val (blockOff, inflOff) = bgzf.virtualOffset
        val st = blockStats.getOrElseUpdate(blockOff, new BlockStat(inflOff))
        val posEnd = pos1 + math.max(1, refConsumed) - 1
        st.minRef = math.min(st.minRef, refId); st.maxRef = math.max(st.maxRef, refId)
        st.minStart = math.min(st.minStart, pos1); st.maxEnd = math.max(st.maxEnd, posEnd)
        st.n += 1
        (blockOff << 16) | inflOff.toLong
      }
      val blockSize = 32 + (name.length + 1) + words.length * 4 +
        (lSeq + 1) / 2 + lSeq + md.length + nmTag.length + rgTag.length +
        extra.length
      le32(blockSize)
      le32(refId)
      le32(pos1 - 1)
      out.write(name.length + 1)
      out.write(mapq)
      le16(if (refId < 0) 4680 else reg2bin(pos1 - 1, pos1 - 1 + math.max(1, refConsumed)))
      le16(words.length)
      le16(flag)
      le32(lSeq)
      le32(-1) // next_refID (mate info not carried by the relational surface)
      le32(-1) // next_pos
      le32(0)  // tlen
      out.write(name); out.write(0)
      words.foreach(le32)
      var i = 0
      while (i < lSeq) {
        val hi = SeqTable.indexOf(s.charAt(i).toUpper.toChar) max 0
        val lo = if (i + 1 < lSeq) SeqTable.indexOf(s.charAt(i + 1).toUpper.toChar) max 0 else 0
        out.write((hi << 4) | lo)
        i += 2
      }
      if (quals == null) out.write(Array.fill(lSeq)(0xff.toByte))
      else { require(quals.length == lSeq); out.write(quals) }
      out.write(md)
      out.write(nmTag)
      out.write(rgTag)
      out.write(extra)
      if (baiBins != null && refId >= 0) {
        val vEnd = {
          val (blockOff, inflOff) = bgzf.virtualOffset
          (blockOff << 16) | inflOff.toLong
        }
        val beg0 = pos1 - 1
        val end0 = beg0 + math.max(1, refConsumed)
        val bin = if (refId < 0) 4680 else reg2bin(beg0, end0)
        val chunks = baiBins(refId).getOrElseUpdate(bin, mutable.ArrayBuffer.empty)
        // Adjacent/overlapping chunks merge (coordinate-sorted input
        // yields one run per bin; unsorted input stays correct, just
        // less compact).
        if (chunks.nonEmpty && vStart <= chunks.last(1)) chunks.last(1) = vEnd
        else chunks += Array(vStart, vEnd)
        val lin = baiLinear(refId)
        var w = beg0 >> 14
        val wEnd = (end0 - 1) >> 14
        while (lin.length <= wEnd) lin += 0L
        while (w <= wEnd) {
          if (lin(w) == 0L || vStart < lin(w)) lin(w) = vStart
          w += 1
        }
      }
    }

    def close(): Unit = {
      out.close()
      if (indexOut != null) {
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(indexOut, StandardCharsets.UTF_8))
        blockStats.foreach { case (off, st) =>
          w.write(s"$off\t${st.firstRecOff}\t${st.minRef}\t${st.maxRef}\t" +
            s"${st.minStart}\t${st.maxEnd}\t${st.n}\n")
        }
        w.close()
      }
      if (baiOut != null) {
        val b = new java.io.BufferedOutputStream(baiOut)
        def le32(v: Int): Unit = {
          b.write(v & 0xff); b.write((v >> 8) & 0xff)
          b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
        }
        def le64(v: Long): Unit = { le32(v.toInt); le32((v >>> 32).toInt) }
        b.write('B'); b.write('A'); b.write('I'); b.write(1)
        le32(refNames.length)
        var r = 0
        while (r < refNames.length) {
          le32(baiBins(r).size)
          baiBins(r).foreach { case (bin, chunks) =>
            le32(bin); le32(chunks.length)
            chunks.foreach { c => le64(c(0)); le64(c(1)) }
          }
          le32(baiLinear(r).length)
          baiLinear(r).foreach(le64)
          r += 1
        }
        b.close()
      }
    }
  }
}
