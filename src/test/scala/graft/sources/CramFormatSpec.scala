package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Pure-JVM CRAM 3.0 codec ([[CramFormat]]), validated two independent
  * ways:
  *  1. the REAL htsjdk-produced 1000-Genomes slice in the reference
  *     checkout (when present), decoded field-by-field against its BAM
  *     twin through the already-golden-pinned [[BamFormat.BamReader]] —
  *     name/flag/pos/mapq/cigar/seq/quals across all 3172 records,
  *     covering gzip + rANS order-0/order-1 blocks, reference-based
  *     substitution/softclip reconstruction, and the tag dictionary;
  *  2. a writer→reader round trip over adversarial shapes (mismatches,
  *     indels, splices, clips, unmapped, absent quals, multi-contig,
  *     off-reference bases) against a tiny FASTA. */
class CramFormatSpec extends AnyFunSuite {

  private val realCram = "/root/reference/src/test/resources/NA12878.slice.cram"
  private val realBam = "/root/reference/src/test/resources/NA12878.slice.bam"
  private val realFasta = "/root/reference/src/test/resources/NA12878.slice.fasta"

  private def fsRead(path: String): (Long, Int) => Array[Byte] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    (off, n) => {
      val in = fs.open(hp)
      try { val b = new Array[Byte](n); in.readFully(off, b); b }
      finally in.close()
    }
  }

  test("decodes the real htsjdk CRAM identically to its BAM twin") {
    assume(Files.exists(Paths.get(realCram)) && Files.exists(Paths.get(realBam)),
      "reference checkout not present — skipping real-file validation")
    val read = fsRead(realCram)
    val fileLen = Files.size(Paths.get(realCram))
    val (hdr, firstData) = CramFormat.readHeader(read, fileLen)
    assert(hdr.refNames.length === 45 && hdr.refNames(0) === "chrM")
    val containers = CramFormat.containerIndex(read, fileLen, firstData)
    assert(containers.length === 1)
    assert(containers.head._5 === 3172) // nRecords
    def refBytes(refId: Int): Array[Byte] =
      CramFormat.upperContig(realFasta, hdr.refNames(refId))
    val crams = containers.iterator.flatMap { case (off, _, _, _, _) =>
      CramFormat.containerRecords(read, off, refBytes, hdr)
    }.toArray
    val bams = {
      val r = new BamFormat.BamReader(new java.io.FileInputStream(realBam))
      val a = r.iterator.toArray; r.close(); a
    }
    assert(crams.length === bams.length)
    var i = 0
    while (i < crams.length) {
      val c = crams(i); val b = bams(i)
      assert(c.qname === b.qname, s"rec $i qname")
      assert(c.flag === b.flag, s"rec $i (${b.qname}) flag")
      assert(c.pos0 === b.pos0, s"rec $i (${b.qname}) pos")
      assert(c.seq === b.seq, s"rec $i (${b.qname}) seq")
      assert(c.quals.toSeq === b.quals.toSeq, s"rec $i (${b.qname}) quals")
      if ((b.flag & 4) == 0) {
        assert(c.mapq === b.mapq, s"rec $i (${b.qname}) mapq")
        assert(c.cigar === b.cigar, s"rec $i (${b.qname}) cigar")
        assert(c.refConsumed === b.refConsumed, s"rec $i refConsumed")
        // Synthesized MD structural invariant: counts + substitution
        // letters account for exactly the aligned (M) length.
        val mMass = "(\\d+)M".r.findAllMatchIn(c.cigar).map(_.group(1).toInt).sum
        assert(c.md_structural === mMass, s"rec $i MD mass vs cigar M mass")
      }
      // Read-group tag resolves through the header @RG ID dictionary
      // (four lanes of the NA12878 run in this slice).
      assert(Set("61CC3.5", "61CC3.6", "61CC3.7", "61DC0.8")(c.tagRg),
        s"rec $i tagRg ${c.tagRg}")
      i += 1
    }
  }

  private implicit class MdOps(r: BamFormat.BamRecord) {
    /** Sum of MD counts + substitution letters (deletion runs excluded). */
    def md_structural: Int = {
      var i = 0; var total = 0
      val md = r.mdTag
      while (i < md.length) {
        if (md.charAt(i).isDigit) {
          var n = 0
          while (i < md.length && md.charAt(i).isDigit) { n = n * 10 + (md.charAt(i) - '0'); i += 1 }
          total += n
        } else if (md.charAt(i) == '^') {
          i += 1
          while (i < md.length && !md.charAt(i).isDigit) i += 1
        } else { total += 1; i += 1 }
      }
      total
    }
  }

  test("rANS order-0 encode is the exact inverse of decode") {
    var seed = 7L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val cases: Seq[Array[Byte]] = Seq(
      Array[Byte](42),                                   // single byte
      Array.fill(1000)(7.toByte),                        // one symbol
      Array.tabulate(256)(_.toByte),                     // full alphabet once
      Array.tabulate(4099)(i => (i % 3).toByte),         // tiny alphabet, n % 4 != 0
      Array.fill(10000)(next(256).toByte),               // incompressible
      Array.fill(50000)("ACGTACGTTT".charAt(next(10)).toByte), // skewed DNA-ish
      Array.tabulate(513)(i => (if (i < 512) 0 else 255).toByte)) // rare tail symbol
    cases.zipWithIndex.foreach { case (data, i) =>
      val enc = CramFormat.ransEncode0(data)
      val dec = CramFormat.Rans.decode(enc)
      assert(dec.toSeq === data.toSeq, s"case $i (n=${data.length})")
    }
  }

  test("writer -> reader round trip over adversarial shapes") {
    val dir = Files.createTempDirectory("graft_cram_rt")
    // Tiny two-contig FASTA + fai.
    val c1 = "ACGTTGCA" * 8 // 64 bases
    val c2 = "TTTTCCCCGGGGAAAA" * 2 // 32 bases
    Files.writeString(dir.resolve("ref.fa"), s">k1\n$c1\n>k2\n$c2\n")
    Files.writeString(dir.resolve("ref.fa.fai"),
      s"k1\t${c1.length}\t4\t${c1.length}\t${c1.length + 1}\n" +
      s"k2\t${c2.length}\t${4 + c1.length + 1 + 4}\t${c2.length}\t${c2.length + 1}\n")
    val fasta = dir.resolve("ref.fa").toString
    graft.operators.FastaReference.clearCaches()

    val cramPath = dir.resolve("t.cram").toString
    val w = new CramFormat.CramWriter(new java.io.FileOutputStream(cramPath),
      Array("k1", "k2"), Array(c1.length, c2.length),
      contig => CramFormat.upperContig(fasta, contig), recordsPerSlice = 3)
    def q(s: String): Array[Byte] = s.map(ch => (ch - 33).toByte).toArray
    // perfect match
    w.write("k1", 1, 60, 0, "r1", "8M", c1.substring(0, 8), q("IIIIIIII"), 1, "rgA")
    // substitutions incl. to N
    w.write("k1", 9, 50, 16, "r2", "8M", "TGNTTGCA", q("ABCDEFGH"), null, "rgB")
    // insertion + deletion + splice + softclips
    w.write("k1", 17, 40, 0, "r3", "2S3M2I3M4D2M6N2M1S", "GGACGAATTG" + "CAAC" + "T", q("JJJJJJJJJJJJJJJ"), 3, "rgA")
    // unmapped with quals; unknown contig degrades to unmapped
    w.write(null, 0, 0, 4, "r4", "*", "NNACGT", q("KKKKKK"), null, null)
    w.write("zz", 5, 7, 0, "r5", "4M", "ACGT", null, null, "rgB")
    // off-reference M run (position beyond contig end) -> verbatim 'b'
    w.write("k2", 31, 30, 0, "r6", "4M", "AAGG", q("LLLL"), null, null)
    // IUPAC base inside an M run -> verbatim 'b'
    w.write("k2", 1, 20, 0, "r7", "4M", "TRTT", q("MMMM"), null, null)
    w.close()

    val read = fsRead(cramPath)
    val fileLen = Files.size(Paths.get(cramPath))
    val (hdr, firstData) = CramFormat.readHeader(read, fileLen)
    assert(hdr.refNames.toSeq === Seq("k1", "k2"))
    assert(hdr.rgIds.toSeq === Seq("rgA", "rgB"))
    val containers = CramFormat.containerIndex(read, fileLen, firstData)
    assert(containers.length === 3, "3 records per slice -> 3 containers")
    def refBytes(refId: Int): Array[Byte] =
      if (refId < 0) Array.emptyByteArray
      else CramFormat.upperContig(fasta, hdr.refNames(refId))
    val recs = containers.iterator.flatMap { case (off, _, _, _, _) =>
      CramFormat.containerRecords(read, off, refBytes, hdr)
    }.toArray
    assert(recs.length === 7)
    val byName = recs.map(r => r.qname -> r).toMap
    val r1 = byName("r1")
    assert(r1.pos0 + 1 === 1 && r1.cigar === "8M" && r1.seq === c1.substring(0, 8))
    assert(r1.mdTag === "8" && r1.tagNm === 1 && r1.tagRg === "rgA")
    assert(new String(r1.quals.map(b => (b + 33).toChar)) === "IIIIIIII")
    val r2 = byName("r2")
    assert(r2.seq === "TGNTTGCA" && r2.cigar === "8M")
    // ref window ACGTTGCA: subs at read pos 1 (A->T), 2 (C->G), 3 (G->N).
    assert(r2.mdTag === "0A0C0G5")
    assert(r2.tagNm === null && r2.tagRg === "rgB")
    val r3 = byName("r3")
    assert(r3.cigar === "2S3M2I3M4D2M6N2M1S")
    assert(r3.seq === "GGACGAATTG" + "CAAC" + "T")
    assert(r3.tagNm === 3 && r3.tagRg === "rgA")
    val r4 = byName("r4")
    assert((r4.flag & 4) === 4 && r4.seq === "NNACGT" && r4.cigar === "*")
    val r5 = byName("r5")
    assert((r5.flag & 4) === 4, "unknown contig must degrade to unmapped")
    assert(r5.seq === "ACGT")
    assert(r5.quals(0) === 0xff.toByte, "absent quals round-trip as absent")
    val r6 = byName("r6")
    assert(r6.seq === "AAGG" && r6.cigar === "4M")
    val r7 = byName("r7")
    assert(r7.seq === "TRTT" && r7.cigar === "4M")
  }

  test("canonical Huffman codes round-trip any histogram (prefix-free, decodable)") {
    var seed = 99L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    (0 until 50).foreach { trial =>
      val nSyms = 1 + next(40)
      val syms = (0 until nSyms).map(_ => next(1000) - 100).distinct
      val freq = syms.map(s => s -> (1L + next(500))).toMap
      val (vals, lens) = CramFormat.huffmanLengths(freq)
      val codes = CramFormat.huffmanCodes(vals, lens)
      // Kraft equality: a complete prefix code sums 2^-len to exactly 1.
      if (vals.length > 1) {
        val kraft = lens.map(l => BigDecimal(1) / BigDecimal(2).pow(l)).sum
        assert(kraft === BigDecimal(1), s"trial $trial: incomplete code")
        // Prefix-freeness: no code is a bit-prefix of a longer one.
        val cs = vals.map(codes).map { case (c, l) => (c, l) }
        cs.indices.foreach { i =>
          cs.indices.foreach { j =>
            if (i != j && cs(i)._2 < cs(j)._2)
              assert(cs(j)._1 >> (cs(j)._2 - cs(i)._2) != cs(i)._1,
                s"trial $trial: ${cs(i)} prefixes ${cs(j)}")
          }
        }
      }
    }
  }

  /** The round-trip fixture the CORE path needs: every fixed-width
    * series bit-packed (BETA for coordinates/flags, canonical HUFFMAN
    * for the rest), adversarial record shapes, and a BAM TWIN written
    * from the identical inputs — the decoded CRAM must match the decoded
    * BAM field-for-field. */
  test("core bit-stream profile (BETA + HUFFMAN) decodes identically to its BAM twin") {
    val dir = Files.createTempDirectory("graft_cram_core")
    val c1 = "ACGTTGCA" * 8
    val c2 = "TTTTCCCCGGGGAAAA" * 2
    Files.writeString(dir.resolve("ref.fa"), s">k1\n$c1\n>k2\n$c2\n")
    Files.writeString(dir.resolve("ref.fa.fai"),
      s"k1\t${c1.length}\t4\t${c1.length}\t${c1.length + 1}\n" +
      s"k2\t${c2.length}\t${4 + c1.length + 1 + 4}\t${c2.length}\t${c2.length + 1}\n")
    val fasta = dir.resolve("ref.fa").toString
    graft.operators.FastaReference.clearCaches()

    case class In(contig: String, pos1: Int, mapq: Int, flag: Int, q: String,
        cigar: String, seq: String, quals: String, nm: Integer, rg: String)
    def qb(s: String): Array[Byte] =
      if (s == null) null else s.map(ch => (ch - 33).toByte).toArray
    val ins = Seq(
      In("k1", 1, 60, 0, "c1", "8M", c1.substring(0, 8), "IIIIIIII", 1, "rgA"),
      In("k1", 9, 50, 16, "c2", "8M", "TGNTTGCA", "ABCDEFGH", null, "rgB"),
      In("k1", 17, 40, 0, "c3", "2S3M2I3M4D2M6N2M1S",
        "GGACGAATTG" + "CAAC" + "T", "JJJJJJJJJJJJJJJ", 3, "rgA"),
      In(null, 0, 0, 4, "c4", "*", "NNACGT", "KKKKKK", null, null),
      In("k2", 1, 20, 0, "c5", "4M", "TRTT", "MMMM", null, null),
      In("k1", 33, 33, 0, "c6", "6M", c1.substring(32, 38), null, 0, "rgB"))

    val cramPath = dir.resolve("core.cram").toString
    val w = new CramFormat.CramWriter(new java.io.FileOutputStream(cramPath),
      Array("k1", "k2"), Array(c1.length, c2.length),
      contig => CramFormat.upperContig(fasta, contig), recordsPerSlice = 4,
      coreSeries = Map(
        "BF" -> "beta", "CF" -> "huffman", "RI" -> "beta", "RL" -> "beta",
        "AP" -> "beta", "RG" -> "huffman", "MF" -> "huffman",
        "NS" -> "beta", "NP" -> "beta", "TS" -> "huffman", "TL" -> "huffman",
        "FN" -> "beta", "FP" -> "beta", "FC" -> "huffman", "BS" -> "beta",
        "DL" -> "huffman", "RS" -> "beta", "MQ" -> "huffman",
        "QS" -> "beta", "BA" -> "huffman"))
    ins.foreach(i => w.write(i.contig, i.pos1, i.mapq, i.flag, i.q, i.cigar,
      i.seq, qb(i.quals), i.nm, i.rg))
    w.close()

    // The CORE block really is non-empty (the profile the r13 reader
    // refused loudly): check the slice blocks directly.
    val read = fsRead(cramPath)
    val fileLen = Files.size(Paths.get(cramPath))
    val (hdr, firstData) = CramFormat.readHeader(read, fileLen)
    val containers = CramFormat.containerIndex(read, fileLen, firstData)
    assert(containers.length === 2) // 4 + 2 records

    // BAM twin from the identical inputs.
    val bamPath = dir.resolve("core.bam").toString
    val bw = new BamFormat.BamWriter(new java.io.FileOutputStream(bamPath),
      Array("k1", "k2"), Array(c1.length, c2.length))
    ins.foreach { i =>
      bw.write(i.contig, if (i.contig == null) 0 else i.pos1, i.mapq, i.flag,
        i.q, i.cigar, i.seq, qb(i.quals), mdTag = null, nm = i.nm, rg = i.rg)
    }
    bw.close()

    def refBytes(refId: Int): Array[Byte] =
      if (refId < 0) Array.emptyByteArray
      else CramFormat.upperContig(fasta, hdr.refNames(refId))
    val crams = containers.iterator.flatMap { case (off, _, _, _, _) =>
      CramFormat.containerRecords(read, off, refBytes, hdr)
    }.toArray
    val bams = {
      val r = new BamFormat.BamReader(new java.io.FileInputStream(bamPath))
      val a = r.iterator.toArray; r.close(); a
    }
    assert(crams.length === bams.length)
    crams.zip(bams).zipWithIndex.foreach { case ((c, b), i) =>
      assert(c.qname === b.qname, s"rec $i qname")
      assert(c.flag === b.flag, s"rec $i flag")
      assert(c.refId === b.refId, s"rec $i refId")
      if ((b.flag & 4) == 0) {
        assert(c.pos0 === b.pos0, s"rec $i pos")
        assert(c.mapq === b.mapq, s"rec $i mapq")
        assert(c.cigar === b.cigar, s"rec $i cigar")
      }
      assert(c.seq === b.seq, s"rec $i seq")
      assert(Option(c.quals).map(_.toSeq) === Option(b.quals).map(_.toSeq)
        || (c.quals != null && c.quals.headOption.contains(0xff.toByte)
            && (b.quals == null || b.quals.headOption.contains(0xff.toByte))),
        s"rec $i quals")
      assert(c.tagNm === b.tagNm, s"rec $i NM")
      assert(c.tagRg === b.tagRg, s"rec $i RG")
    }
  }

  /** Spec-text golden bits (CRAM 3.0 §13): each residual CORE codec
    * decoded from a HAND-ASSEMBLED bit stream — independent of this
    * repo's writer, so an encode/decode twin bug cannot self-cancel. */
  test("GOLOMB/GOLOMB_RICE/SUBEXP/GAMMA decode spec-assembled golden bits") {
    def bits(b: String): Array[Byte] = {
      val clean = b.replaceAll("[^01]", "")
      val padded = clean + "0" * ((8 - clean.length % 8) % 8)
      padded.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
    }
    def itf8s(vs: Int*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      vs.foreach(CramFormat.writeItf8(o, _))
      o.toByteArray
    }
    def dec(codec: Int, params: Array[Byte], stream: String, n: Int): Seq[Int] = {
      val d = CramFormat.coreIntDecoder(codec, params,
        new CramFormat.BitReader(bits(stream)))
      Seq.fill(n)(d())
    }
    // GAMMA (9), offset 0: 1 -> "1"; 2 -> "010"; 3 -> "011"; 4 -> "00100".
    assert(dec(9, itf8s(0), "1 010 011 00100", 4) === Seq(1, 2, 3, 4))
    // GAMMA with offset 1 (stored = v + 1): v=0 -> stored 1 -> "1".
    assert(dec(9, itf8s(1), "1 010", 2) === Seq(0, 1))
    // SUBEXP (7), offset 0, k=2: x<4 -> "0" + 2 bits; x=7 -> u=1 ->
    // "10" + (u+k-1)=2 low bits of 7 ("11"); x=9 -> u=2 -> "110" + 3
    // low bits of 9 ("001").
    assert(dec(7, itf8s(0, 2), "0 11  1 0 11  11 0 001", 3) === Seq(3, 7, 9))
    // GOLOMB (2), offset 0, m=3: b=2, cutoff=1. x=0 -> q=0 "0", r=0 "0";
    // x=5 -> q=1 "10", r=2 -> extended (r+cutoff=3) "11";
    // x=1 -> q=0 "0", r=1 -> extended (1+1=2) "10".
    assert(dec(2, itf8s(0, 3), "0 0  1 0 11  0 10", 3) === Seq(0, 5, 1))
    // GOLOMB_RICE (8), offset 0, log2m=2 (m=4): x=6 -> q=1 "10", r=2 "10";
    // x=3 -> "0" + "11"; x=8 -> "110" + "00".
    assert(dec(8, itf8s(0, 2), "1 0 10  0 11  11 0 00", 3) === Seq(6, 3, 8))
  }

  test("residual CORE codecs + bzip2/lzma blocks decode identically to the BAM twin") {
    // Same adversarial shapes as the BETA/HUFFMAN twin, but the series
    // spread over GAMMA/SUBEXP/GOLOMB/RICE and the EXTERNAL blocks
    // compressed with the two remaining spec block methods.
    // "cram31" rides the same harness: version minor 1, external blocks
    // on methods 5-8 (RN through the name tokeniser; QS here is a CORE
    // series, so fqzcomp is exercised by the dedicated 3.1 test below).
    for (blockComp <- Seq("bzip2", "lzma", "cram31")) {
      val dir = Files.createTempDirectory(s"graft_cram_resid_$blockComp")
      val c1 = "ACGTTGCA" * 8
      val c2 = "TTTTCCCCGGGGAAAA" * 2
      Files.writeString(dir.resolve("ref.fa"), s">k1\n$c1\n>k2\n$c2\n")
      Files.writeString(dir.resolve("ref.fa.fai"),
        s"k1\t${c1.length}\t4\t${c1.length}\t${c1.length + 1}\n" +
        s"k2\t${c2.length}\t${4 + c1.length + 1 + 4}\t${c2.length}\t${c2.length + 1}\n")
      val fasta = dir.resolve("ref.fa").toString
      graft.operators.FastaReference.clearCaches()

      case class In(contig: String, pos1: Int, mapq: Int, flag: Int, q: String,
          cigar: String, seq: String, quals: String, nm: Integer, rg: String)
      def qb(s: String): Array[Byte] =
        if (s == null) null else s.map(ch => (ch - 33).toByte).toArray
      val ins = Seq(
        In("k1", 1, 60, 0, "c1", "8M", c1.substring(0, 8), "IIIIIIII", 1, "rgA"),
        In("k1", 9, 50, 16, "c2", "8M", "TGNTTGCA", "ABCDEFGH", null, "rgB"),
        In("k1", 17, 40, 0, "c3", "2S3M2I3M4D2M6N2M1S",
          "GGACGAATTG" + "CAAC" + "T", "JJJJJJJJJJJJJJJ", 3, "rgA"),
        In(null, 0, 0, 4, "c4", "*", "NNACGT", "KKKKKK", null, null),
        In("k2", 1, 20, 0, "c5", "4M", "TRTT", "MMMM", null, null),
        In("k1", 33, 33, 0, "c6", "6M", c1.substring(32, 38), null, 0, "rgB"))

      val cramPath = dir.resolve("resid.cram").toString
      val w = new CramFormat.CramWriter(new java.io.FileOutputStream(cramPath),
        Array("k1", "k2"), Array(c1.length, c2.length),
        contig => CramFormat.upperContig(fasta, contig), recordsPerSlice = 4,
        coreSeries = Map(
          "BF" -> "gamma", "CF" -> "subexp", "RI" -> "golomb", "RL" -> "rice",
          "AP" -> "gamma", "RG" -> "golomb", "MF" -> "subexp",
          "NS" -> "golomb", "NP" -> "rice", "TS" -> "gamma", "TL" -> "subexp",
          "FN" -> "golomb", "FP" -> "gamma", "FC" -> "subexp", "BS" -> "rice",
          "DL" -> "golomb", "RS" -> "gamma", "MQ" -> "rice",
          "QS" -> "subexp", "BA" -> "golomb"),
        externalCompression = blockComp)
      ins.foreach(i => w.write(i.contig, i.pos1, i.mapq, i.flag, i.q, i.cigar,
        i.seq, qb(i.quals), i.nm, i.rg))
      w.close()

      val read = fsRead(cramPath)
      val fileLen = Files.size(Paths.get(cramPath))
      val (hdr, firstData) = CramFormat.readHeader(read, fileLen)
      val containers = CramFormat.containerIndex(read, fileLen, firstData)

      val bamPath = dir.resolve("resid.bam").toString
      val bw = new BamFormat.BamWriter(new java.io.FileOutputStream(bamPath),
        Array("k1", "k2"), Array(c1.length, c2.length))
      ins.foreach { i =>
        bw.write(i.contig, if (i.contig == null) 0 else i.pos1, i.mapq, i.flag,
          i.q, i.cigar, i.seq, qb(i.quals), mdTag = null, nm = i.nm, rg = i.rg)
      }
      bw.close()

      def refBytes(refId: Int): Array[Byte] =
        if (refId < 0) Array.emptyByteArray
        else CramFormat.upperContig(fasta, hdr.refNames(refId))
      val crams = containers.iterator.flatMap { case (off, _, _, _, _) =>
        CramFormat.containerRecords(read, off, refBytes, hdr)
      }.toArray
      val bams = {
        val r = new BamFormat.BamReader(new java.io.FileInputStream(bamPath))
        val a = r.iterator.toArray; r.close(); a
      }
      assert(crams.length === bams.length, s"[$blockComp] record count")
      crams.zip(bams).zipWithIndex.foreach { case ((c, b), i) =>
        assert(c.qname === b.qname, s"[$blockComp] rec $i qname")
        assert(c.flag === b.flag, s"[$blockComp] rec $i flag")
        assert(c.refId === b.refId, s"[$blockComp] rec $i refId")
        if ((b.flag & 4) == 0) {
          assert(c.pos0 === b.pos0, s"[$blockComp] rec $i pos")
          assert(c.mapq === b.mapq, s"[$blockComp] rec $i mapq")
          assert(c.cigar === b.cigar, s"[$blockComp] rec $i cigar")
        }
        assert(c.seq === b.seq, s"[$blockComp] rec $i seq")
        assert(c.tagNm === b.tagNm, s"[$blockComp] rec $i NM")
        assert(c.tagRg === b.tagRg, s"[$blockComp] rec $i RG")
      }
    }
  }

  test("CRAM 3.1 full profile (fqzcomp QS + tokenised RN) decodes identically to its BAM twin") {
    // No coreSeries: every series rides an external block, so QS goes
    // through fqzcomp (method 7) on slices where quals tile by read,
    // RN through the name tokeniser (8), the rest across rANS Nx16 (5)
    // and arith (6). Slice 2 carries a qual-less record, pinning the
    // writer's fqz fallback; Illumina-style names pin DELTA/MATCH paths.
    val dir = Files.createTempDirectory("graft_cram31")
    val c1 = "ACGTTGCA" * 8
    Files.writeString(dir.resolve("ref.fa"), s">k1\n$c1\n")
    Files.writeString(dir.resolve("ref.fa.fai"),
      s"k1\t${c1.length}\t4\t${c1.length}\t${c1.length + 1}\n")
    val fasta = dir.resolve("ref.fa").toString
    graft.operators.FastaReference.clearCaches()

    case class In(contig: String, pos1: Int, mapq: Int, flag: Int, q: String,
        cigar: String, seq: String, quals: String, nm: Integer, rg: String)
    def qb(s: String): Array[Byte] =
      if (s == null) null else s.map(ch => (ch - 33).toByte).toArray
    val ins = Seq(
      In("k1", 1, 60, 0, "m1:7:FC:1:1101:1000:2000", "8M", c1.substring(0, 8),
        "IIIIHHGG", 1, "rgA"),
      In("k1", 5, 55, 16, "m1:7:FC:1:1101:1007:2013", "8M", c1.substring(4, 12),
        "ABCDEFGH", null, "rgB"),
      In("k1", 9, 50, 0, "m1:7:FC:1:1101:1014:2026", "4M2I2M",
        c1.substring(8, 12) + "TT" + c1.substring(12, 14), "JJJJJJJJ", 2, "rgA"),
      In("k1", 13, 45, 0, "m1:7:FC:1:1101:1021:2039", "2S4M",
        "GG" + c1.substring(12, 16), "KKKKKK", 0, "rgB"),
      // Slice 2: one record WITHOUT quals (fqz fallback) + a dup name.
      In("k1", 17, 40, 0, "m1:7:FC:1:1101:1021:2039", "4M", c1.substring(16, 20),
        "MMMM", null, null),
      In("k1", 21, 35, 0, "q_oddball.name-1", "4M", c1.substring(20, 24),
        null, 1, "rgA"))

    val cramPath = dir.resolve("full31.cram").toString
    val w = new CramFormat.CramWriter(new java.io.FileOutputStream(cramPath),
      Array("k1"), Array(c1.length),
      contig => CramFormat.upperContig(fasta, contig), recordsPerSlice = 4,
      externalCompression = "cram31")
    ins.foreach(i => w.write(i.contig, i.pos1, i.mapq, i.flag, i.q, i.cigar,
      i.seq, qb(i.quals), i.nm, i.rg))
    w.close()

    // The file really is version 3.1 and really contains methods 7 + 8.
    val raw = Files.readAllBytes(Paths.get(cramPath))
    assert(raw(4) === 3.toByte && raw(5) === 1.toByte, "version bytes")

    val read = fsRead(cramPath)
    val fileLen = Files.size(Paths.get(cramPath))
    val (hdr, firstData) = CramFormat.readHeader(read, fileLen)
    val containers = CramFormat.containerIndex(read, fileLen, firstData)

    val bamPath = dir.resolve("full31.bam").toString
    val bw = new BamFormat.BamWriter(new java.io.FileOutputStream(bamPath),
      Array("k1"), Array(c1.length))
    ins.foreach { i =>
      bw.write(i.contig, i.pos1, i.mapq, i.flag, i.q, i.cigar, i.seq,
        qb(i.quals), mdTag = null, nm = i.nm, rg = i.rg)
    }
    bw.close()

    def refBytes(refId: Int): Array[Byte] =
      if (refId < 0) Array.emptyByteArray
      else CramFormat.upperContig(fasta, hdr.refNames(refId))
    val crams = containers.iterator.flatMap { case (off, _, _, _, _) =>
      CramFormat.containerRecords(read, off, refBytes, hdr)
    }.toArray
    val bams = {
      val r = new BamFormat.BamReader(new java.io.FileInputStream(bamPath))
      val a = r.iterator.toArray; r.close(); a
    }
    assert(crams.length === bams.length)
    crams.zip(bams).zipWithIndex.foreach { case ((c, b), i) =>
      assert(c.qname === b.qname, s"rec $i qname")
      assert(c.flag === b.flag, s"rec $i flag")
      assert(c.pos0 === b.pos0, s"rec $i pos")
      assert(c.mapq === b.mapq, s"rec $i mapq")
      assert(c.cigar === b.cigar, s"rec $i cigar")
      assert(c.seq === b.seq, s"rec $i seq")
      assert(java.util.Arrays.equals(c.quals, b.quals), s"rec $i quals")
      assert(c.tagNm === b.tagNm, s"rec $i NM")
      assert(c.tagRg === b.tagRg, s"rec $i RG")
    }
  }
}
