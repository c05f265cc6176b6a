package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPInputStream

/** Pure-JVM BAM codec ([[BamFormat]]), validated three independent ways:
  *  1. golden bytes — one record's encoding asserted byte-for-byte
  *     against a buffer hand-assembled from the SAM/BAM spec v1.6 text
  *     (so the WRITER follows the spec, not merely our own reader);
  *  2. BGZF container shape — gzip magic/FEXTRA/BC subfield/BSIZE
  *     arithmetic and the fixed 28-byte EOF member, with the JDK's own
  *     GZIPInputStream as the decompressor;
  *  3. a REAL htsjdk-produced 1000-Genomes slice from the reference
  *     checkout (when present): record count and first-record fields
  *     pinned against values extracted independently with Python's
  *     struct/gzip modules. */
class BamFormatSpec extends AnyFunSuite {

  private def writeOne(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new BamFormat.BamWriter(bos, Array("c1"), Array(100))
    w.write("c1", 5, 30, 16, "r1", "4M", "ACGT", Array[Byte](10, 20, 30, 40), "4")
    w.close()
    bos.toByteArray
  }

  test("golden bytes: one record encodes exactly per the SAM/BAM spec") {
    val bgzf = writeOne()
    val inflated = {
      val in = new GZIPInputStream(new ByteArrayInputStream(bgzf))
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var r = in.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
      out.toByteArray
    }
    // Hand-assembled expectation straight from the spec: magic, SAM text,
    // one-reference dictionary, then the 50-byte alignment block.
    val text = "@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:c1\tLN:100\n".getBytes("UTF-8")
    val bb = ByteBuffer.allocate(4 + 4 + text.length + 4 + (4 + 3 + 4) + 4 + 50)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("BAM".getBytes); bb.put(1.toByte)
    bb.putInt(text.length); bb.put(text)
    bb.putInt(1) // n_ref
    bb.putInt(3); bb.put("c1".getBytes); bb.put(0.toByte); bb.putInt(100)
    bb.putInt(50) // block_size: 32 fixed + 3 name + 4 cigar + 2 seq + 4 qual + 5 MD
    bb.putInt(0) // refID
    bb.putInt(4) // pos (0-based)
    bb.put(3.toByte) // l_read_name incl NUL
    bb.put(30.toByte) // mapq
    bb.putShort(4681.toShort) // reg2bin(4, 8): same 16kb window -> 4681 + 0
    bb.putShort(1.toShort) // n_cigar_op
    bb.putShort(16.toShort) // flag
    bb.putInt(4) // l_seq
    bb.putInt(-1); bb.putInt(-1); bb.putInt(0) // next_refID, next_pos, tlen
    bb.put("r1".getBytes); bb.put(0.toByte)
    bb.putInt((4 << 4) | 0) // 4M
    bb.put(0x12.toByte); bb.put(0x48.toByte) // ACGT 4-bit: A=1 C=2 G=4 T=8
    bb.put(Array[Byte](10, 20, 30, 40))
    bb.put("MD".getBytes); bb.put('Z'.toByte); bb.put("4".getBytes); bb.put(0.toByte)
    assert(inflated.toSeq === bb.array().toSeq)
  }

  test("BGZF container: gzip FEXTRA/BC/BSIZE arithmetic and the spec EOF member") {
    val bgzf = writeOne()
    // First member: gzip magic, deflate, FEXTRA flag, XLEN 6, BC subfield.
    assert((bgzf(0) & 0xff) === 0x1f && (bgzf(1) & 0xff) === 0x8b)
    assert(bgzf(2) === 8 && bgzf(3) === 4)
    assert(bgzf(10) === 6 && bgzf(12) === 'B' && bgzf(13) === 'C' && bgzf(14) === 2)
    val bsize = ((bgzf(16) & 0xff) | ((bgzf(17) & 0xff) << 8)) + 1
    // BSIZE+1 = full member length; the remainder must be exactly EOF.
    assert(bgzf.length === bsize + BamFormat.BgzfEof.length)
    assert(bgzf.drop(bsize).toSeq === BamFormat.BgzfEof.toSeq)
  }

  test("codec round trip over edge shapes (spliced, odd seq, unmapped, no quals)") {
    val bos = new ByteArrayOutputStream()
    val w = new BamFormat.BamWriter(bos, Array("c1", "c2"), Array(5000, 9000))
    w.write("c1", 10, 60, 0, "a", "3M2N4M", "ACGTACG", Array[Byte](1, 2, 3, 4, 5, 6, 7), "7")
    w.write("c2", 999, 37, 1024, "b", "5M", "NACGT", null, "2A2")
    w.write(null, 1, 0, 4, "unmapped", "*", "", null, null)
    w.close()
    val r = new BamFormat.BamReader(new ByteArrayInputStream(bos.toByteArray))
    assert(r.header.refNames.toSeq === Seq("c1", "c2"))
    assert(r.header.refLengths.toSeq === Seq(5000, 9000))
    val recs = r.iterator.toArray
    assert(recs.length === 3)
    val a = recs(0)
    assert(a.refId === 0 && a.pos0 === 9 && a.mapq === 60 && a.qname === "a")
    assert(a.cigar === "3M2N4M" && a.refConsumed === 9) // 3 + 2 + 4
    assert(a.seq === "ACGTACG" && a.quals.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6, 7))
    assert(a.mdTag === "7")
    val b = recs(1)
    assert(b.refId === 1 && b.flag === 1024 && b.seq === "NACGT")
    assert(b.quals.forall(_ == 0xff.toByte)) // absent quals
    assert(b.mdTag === "2A2")
    val u = recs(2)
    assert(u.refId === -1 && u.cigar === "*" && u.seq === "" && u.mdTag === null)
  }

  test("selective decode skips unprojected parts; prefix filter pre-decode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bam_sel")
    val file = dir.resolve("t.bam").toString
    val out = new java.io.FileOutputStream(file)
    val w = new BamFormat.BamWriter(out, Array("c1", "c2"), Array(5000, 9000))
    w.write("c1", 10, 60, 0, "a", "7M", "ACGTACG", Array[Byte](1, 2, 3, 4, 5, 6, 7), "7")
    w.write("c2", 999, 37, 1024, "b", "5M", "NACGT", null, "2A2", 2, "rgX")
    w.write("c2", 2000, 9, 0, "c", "4M", "TTTT", null, null, 0, "rgY")
    w.close()
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(hp).getLen
    // Nothing variable materialized: a count(*)-shaped scan.
    val bare = BamFormat.splitRecords(() => fs.open(hp), len, 0, len,
      BamFormat.DecodeSpec(name = false, cigar = false, refConsumed = false,
        seq = false, quals = false, md = false, nm = false, rg = false)).toArray
    assert(bare.length === 3)
    assert(bare.forall(r => r.qname == null && r.cigar == null && r.seq == null &&
      r.quals == null && r.mdTag == null && r.tagNm == null && r.tagRg == null))
    assert(bare.map(_.pos0 + 1).toSeq === Seq(10, 999, 2000)) // prefix intact
    assert(bare.map(_.mapq).toSeq === Seq(60, 37, 9))
    // refConsumed without the cigar string (pos_end-only projection).
    val rcOnly = BamFormat.splitRecords(() => fs.open(hp), len, 0, len,
      BamFormat.DecodeSpec(name = false, cigar = false, refConsumed = true,
        seq = false, quals = false, md = false, nm = false, rg = false)).toArray
    assert(rcOnly.map(_.refConsumed).toSeq === Seq(7, 5, 4))
    assert(rcOnly.forall(_.cigar == null))
    // NM/RG typed tags decode; absent tags stay null.
    val full = BamFormat.splitRecords(() => fs.open(hp), len, 0, len).toArray
    assert(full.map(_.tagNm).toSeq === Seq(null, 2, 0))
    assert(full.map(_.tagRg).toSeq === Seq(null, "rgX", "rgY"))
    assert(full(1).mdTag === "2A2")
    // Prefix filter: refId + pos_start bounds + mapq floor, applied
    // before decode — only matching records come back.
    val filt = BamFormat.RecordFilter(
      refIdOk = Array(false, false, true), // only refId 1 (c2)
      startMin = 1, startMax = 1500, mapqMin = 20, mapqMax = Int.MaxValue)
    val kept = BamFormat.splitRecords(() => fs.open(hp), len, 0, len,
      BamFormat.FullDecode, filt).toArray
    assert(kept.map(_.qname).toSeq === Seq("b"))
    // pos_end constraint walks cigar words pre-decode.
    val filt2 = BamFormat.RecordFilter(endMin = 17, endMax = Int.MaxValue)
    val kept2 = BamFormat.splitRecords(() => fs.open(hp), len, 0, len,
      BamFormat.FullDecode, filt2).toArray
    assert(kept2.map(_.qname).toSet === Set("b", "c")) // ends 16, 1003, 2003
  }

  test("full tag map: every tag type round-trips in canonical TYPE:value form") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bam_tagmap")
    val file = dir.resolve("t.bam").toString
    val out = new java.io.FileOutputStream(file)
    val w = new BamFormat.BamWriter(out, Array("c1"), Array(5000))
    // One record carrying every writable tag type; ints at both ends of
    // the signed range (the writer always re-encodes at full 'i' width).
    w.write("c1", 10, 60, 0, "a", "4M", "ACGT", null, "4", 3, "rg0",
      extraTags = Seq(
        "XA" -> "A:x",
        "XI" -> "i:-2147483648",
        "XJ" -> "i:2147483647",
        "XF" -> "f:1.5",
        "XZ" -> "Z:hello world",
        "XH" -> "H:1AFF00",
        "XB" -> "B:c,-1,0,5",
        "XS" -> "B:s,-300,300",
        "XU" -> "B:I,4294967295",
        "XG" -> "B:f,0.25,-2.0"))
    // A second record with no extras: its map holds only MD/NM/RG.
    w.write("c1", 20, 40, 0, "b", "4M", "ACGT", null, "4")
    w.close()
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(hp).getLen
    val recs = BamFormat.splitRecords(() => fs.open(hp), len, 0, len,
      BamFormat.FullDecode.copy(tagMap = true)).toArray
    assert(recs.length === 2)
    val m = recs(0).tagMap
    assert(m("MD") === "Z:4" && m("NM") === "i:3" && m("RG") === "Z:rg0")
    assert(m("XA") === "A:x")
    assert(m("XI") === "i:-2147483648" && m("XJ") === "i:2147483647")
    assert(m("XF") === "f:1.5")
    assert(m("XZ") === "Z:hello world")
    assert(m("XH") === "H:1AFF00")
    // B arrays re-render with the subtype they were written at ('I'
    // stays unsigned through the long widening).
    assert(m("XB") === "B:c,-1,0,5")
    assert(m("XS") === "B:s,-300,300")
    assert(m("XU") === "B:I,4294967295")
    assert(m("XG") === "B:f,0.25,-2.0")
    assert(recs(1).tagMap.keySet === Set("MD"))
    // Typed extraction is unaffected by the map decode.
    assert(recs(0).tagNm === 3 && recs(0).tagRg === "rg0")
    // Map NOT requested -> null (the prunable default).
    val bare = BamFormat.splitRecords(() => fs.open(hp), len, 0, len).toArray
    assert(bare.forall(_.tagMap == null))
  }

  test("split probe survives records larger than one BGZF member (long reads)") {
    // A >64 KiB-inflated record spans BGZF members; splits whose first
    // owned member holds no record start must keep probing into later
    // owned members instead of silently emitting nothing.
    val dir = java.nio.file.Files.createTempDirectory("graft_bam_long")
    val file = dir.resolve("long.bam").toString
    val out = new java.io.FileOutputStream(file)
    val w = new BamFormat.BamWriter(out, Array("c1"), Array(2_000_000))
    var seed = 42L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    def randSeq(n: Int): String = {
      val sb = new StringBuilder(n)
      (0 until n).foreach(_ => sb.append("ACGT".charAt(nextInt(4))))
      sb.toString
    }
    def randQuals(n: Int): Array[Byte] =
      Array.fill(n)(nextInt(41).toByte)
    // One giant read (inflated record ~105 KiB, incompressible quals),
    // then a tail of ordinary reads.
    val bigLen = 70_000
    w.write("c1", 100, 60, 0, "big", s"${bigLen}M", randSeq(bigLen), randQuals(bigLen), null)
    (1 to 60).foreach { i =>
      w.write("c1", 200_000 + i * 40, 30, 0, s"r$i", "30M", randSeq(30), randQuals(30), null)
    }
    w.close()
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(hp).getLen
    val whole = {
      val rd = new BamFormat.BamReader(new java.io.FileInputStream(file))
      val ks = rd.iterator.map(_.qname).toVector
      rd.close(); ks
    }
    assert(whole.length === 61)
    for (splitSize <- Seq(8_192L, 16_384L, 40_000L)) {
      val pieces = (0L until len by splitSize).flatMap { s =>
        BamFormat.splitRecords(() => fs.open(hp), len, s, math.min(s + splitSize, len))
          .map(_.qname).toVector
      }
      assert(pieces.sorted === whole.sorted,
        s"split size $splitSize: ${pieces.length} records vs ${whole.length}")
    }
  }

  test("writer rejects read names beyond the spec's 254-byte cap") {
    val w = new BamFormat.BamWriter(
      new ByteArrayOutputStream(), Array("c1"), Array(100))
    intercept[IllegalArgumentException] {
      w.write("c1", 1, 0, 0, "q" * 255, "1M", "A", null, null)
    }
    w.write("c1", 1, 0, 0, "q" * 254, "1M", "A", null, null) // cap itself is fine
    w.close()
  }

  test("byte-range splits of the real BAM reassemble exactly (no loss, no dups)") {
    // The no-index split path (BamFormat.splitRecords): BGZF-boundary
    // scan + record-plausibility sync. For a range of split sizes —
    // including ones far smaller than a BGZF member, so most splits sync
    // across member boundaries — the union of per-split records must
    // equal the whole-file read EXACTLY, record for record.
    val path = "/root/reference/src/test/resources/NA12878.slice.md.bam"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "reference checkout not present — skipping real-file validation")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(hp).getLen
    def key(r: BamFormat.BamRecord) =
      (r.qname, r.refId, r.pos0, r.flag, r.cigar, r.mdTag)
    val whole = {
      val rd = new BamFormat.BamReader(new java.io.FileInputStream(path))
      val ks = rd.iterator.map(key).toVector
      rd.close(); ks
    }
    assert(whole.length === 3172)
    for (splitSize <- Seq(1L << 20, 177_131L, 64_001L, 13_007L)) {
      val pieces = (0L until len by splitSize).flatMap { s =>
        BamFormat.splitRecords(() => fs.open(hp), len, s, math.min(s + splitSize, len))
          .map(key).toVector
      }
      assert(pieces.sorted === whole.sorted,
        s"split size $splitSize: ${pieces.length} records vs ${whole.length}")
    }
    // The DDL surface at a split size that forces many splits per file.
    val spark = graft.SharedSpark.spark
    spark.sql("DROP TABLE IF EXISTS real_bam_split")
    spark.sql(s"""CREATE TABLE real_bam_split USING graft.sources.BamSource
                 |OPTIONS (path '$path', splitSize '65536')""".stripMargin)
    assert(spark.table("real_bam_split").count() === 3172L)
  }

  test("end-to-end: coverage + pileup over the real BAM through BamSource") {
    val path = "/root/reference/src/test/resources/NA12878.slice.md.bam"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "reference checkout not present — skipping real-file validation")
    val spark = graft.SharedSpark.spark
    import org.apache.spark.sql.functions._
    graft.Graft.ensure(spark)
    spark.sql("DROP TABLE IF EXISTS real_bam")
    spark.sql(s"""CREATE TABLE real_bam USING graft.sources.BamSource
                 |OPTIONS (path '$path')""".stripMargin)
    val reads = spark.table("real_bam")
      .filter((col("flag").bitwiseAND(1796) === 0) && col("contig").isNotNull)
    assert(reads.count() > 2000) // 2899 of 3172 pass the 1796 flag mask
    // Coverage mass identity: total covered bases (sum of depth over all
    // blocks) equals the per-read M/=/X CIGAR mass, computed
    // independently with a SQL regex over the cigar strings.
    val blocks = graft.operators.CoverageOps.blocks(reads)
    val covered = blocks.agg(
      sum(col("coverage").cast("long") *
        (col("pos_end") - col("pos_start") + 1))).head.getLong(0)
    val mass = reads.select(aggregate(
        expr("regexp_extract_all(cigar, '(\\\\d+)[M=X]', 1)"),
        lit(0L), (acc, x) => acc + x.cast("long")).as("m"))
      .agg(sum(col("m"))).head.getLong(0)
    assert(covered === mass,
      s"coverage mass $covered != CIGAR M/=/X mass $mass")
    // Pileup over the MD tags of a real aligner: runs end-to-end, emits
    // plausible rows (every position within a covered block, depth >=
    // the position's non-ref count).
    val pileup = graft.operators.PileupOps.pileupMaps(
      reads.filter(col("md_tag").isNotNull), withQuals = false)
    val bad = pileup.filter(col("coverage") < col("count_nonref")).count()
    assert(bad === 0L)
    assert(pileup.count() > 100)
  }

  test("reads a real htsjdk-produced BAM (1000 Genomes slice, when present)") {
    val path = "/root/reference/src/test/resources/NA12878.slice.md.bam"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "reference checkout not present — skipping real-file validation")
    val r = new BamFormat.BamReader(new java.io.FileInputStream(path))
    // Ground truth extracted independently with Python struct/gzip.
    assert(r.header.refNames.length === 45)
    assert(r.header.refNames(0) === "chrM" && r.header.refLengths(0) === 16571)
    val recs = r.iterator.toArray
    assert(recs.length === 3172)
    val first = recs.head
    assert(r.header.refNames(first.refId) === "chr1")
    assert(first.pos0 + 1 === 34 && first.mapq === 2 && first.flag === 99)
    assert(first.cigar === "76M" && first.seq.length === 76)
    assert(first.qname === "61CC3AAXX100125:5:17:2608:3446")
    assert(first.seq.startsWith("CCCTAACCCTAACCCTAA")) // telomeric repeat
    assert(recs.count(_.mdTag != null) === 3090)
    // Coordinate-sorted within each reference (SO:coordinate header).
    assert(recs.groupBy(_.refId).values.forall(g =>
      g.sliding(2).forall(p => p.length < 2 || p(0).pos0 <= p(1).pos0)))
  }

  test("encodeTag: uint32 values re-encode as 'I' and round-trip; overflow fails loudly") {
    def roundTrip(tv: String): String = {
      val bytes = BamFormat.encodeTag("XU", tv)
      assert(bytes(0) === 'X'.toByte && bytes(1) === 'U'.toByte)
      BamFormat.renderTag(bytes(2).toChar, bytes.drop(3))
    }
    // int32 domain stays 'i'.
    assert(BamFormat.encodeTag("XU", "i:2147483647")(2) === 'i'.toByte)
    assert(roundTrip("i:2147483647") === "i:2147483647")
    assert(roundTrip("i:-2147483648") === "i:-2147483648")
    // uint32 domain (renderTag's 'i:' text for an 'I' tag) re-encodes as
    // 'I' and survives a write→read round trip instead of going negative.
    assert(BamFormat.encodeTag("XU", "i:4294967295")(2) === 'I'.toByte)
    assert(roundTrip("i:4294967295") === "i:4294967295")
    assert(roundTrip("i:2147483648") === "i:2147483648")
    // Outside int32 ∪ uint32: loud failure, never a silent truncation.
    intercept[RuntimeException](BamFormat.encodeTag("XU", "i:4294967296"))
    intercept[RuntimeException](BamFormat.encodeTag("XU", "i:-2147483649"))
  }

  test("corrupt/foreign records fail loudly, never desync or loop") {
    // Hand-assembled malformed records (r15 review — the same
    // foreign-input hardening class as the BCF framing audits): declared
    // lengths beyond block_size, an unterminated Z tag, and a hostile
    // B-array count that would overflow the offset arithmetic backward.
    def stream(record: ByteBuffer => Unit, blockSize: Int): BamFormat.BamReader = {
      val body = ByteBuffer.allocate(4096).order(ByteOrder.LITTLE_ENDIAN)
      body.put("BAM".getBytes); body.put(1.toByte)
      val text = "@HD\tVN:1.6\n".getBytes("UTF-8")
      body.putInt(text.length); body.put(text)
      body.putInt(1) // n_ref
      body.putInt(3); body.put("c1".getBytes); body.put(0.toByte); body.putInt(1000)
      body.putInt(blockSize)
      record(body)
      val raw = java.util.Arrays.copyOf(body.array(), body.position())
      val bos = new ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.close()
      new BamFormat.BamReader(new ByteArrayInputStream(bos.toByteArray))
    }
    def fixed(bb: ByteBuffer, lReadName: Int, nCigar: Int, lSeq: Int): Unit = {
      bb.putInt(0); bb.putInt(4) // refID, pos
      bb.put(lReadName.toByte); bb.put(30.toByte); bb.putShort(4681.toShort)
      bb.putShort(nCigar.toShort); bb.putShort(16.toShort)
      bb.putInt(lSeq)
      bb.putInt(-1); bb.putInt(-1); bb.putInt(0)
    }
    // 1. l_read_name = 0 (spec minimum is 1: the NUL).
    val e1 = intercept[IllegalArgumentException] {
      stream(bb => { fixed(bb, 0, 0, 0); bb.put(Array.fill[Byte](8)(0)) }, 40).next()
    }
    assert(e1.getMessage.contains("l_read_name=0"))
    // 2. Declared l_seq overruns block_size.
    val e2 = intercept[IllegalArgumentException] {
      stream(bb => { fixed(bb, 3, 0, 500); bb.put("r1".getBytes); bb.put(0.toByte)
        bb.put(Array.fill[Byte](5)(0)) }, 40).next()
    }
    assert(e2.getMessage.contains("l_seq=500") && e2.getMessage.contains("block_size=40"))
    // 3. Z tag with no NUL before the record boundary.
    val e3 = intercept[IllegalArgumentException] {
      stream(bb => { fixed(bb, 3, 0, 0); bb.put("r1".getBytes); bb.put(0.toByte)
        bb.put("MD".getBytes); bb.put('Z'.toByte); bb.put("xx".getBytes) }, 40).next()
    }
    assert(e3.getMessage.contains("unterminated"))
    // 4. B-array count that overflows `count * size` negative.
    val e4 = intercept[IllegalArgumentException] {
      stream(bb => { fixed(bb, 3, 0, 0); bb.put("r1".getBytes); bb.put(0.toByte)
        bb.put("XB".getBytes); bb.put('B'.toByte); bb.put('i'.toByte)
        bb.putInt(0x40000001) }, 43).next()
    }
    assert(e4.getMessage.contains("B-array"))
  }
}
