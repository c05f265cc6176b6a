package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream

/** Pure-JVM BCF 2.2 codec ([[BcfFormat]]), validated the BAM way:
  *  1. golden bytes — one record hand-assembled from the VCFv4.3 spec §6
  *     text decodes to the exact expected VCF line (so the READER follows
  *     the spec, not merely our own writer);
  *  2. write→read round trips over the full typed surface (ints of all
  *     widths, floats, flags, char vectors, missing values, mixed-ploidy
  *     GT, multi-allelic records);
  *  3. [[BcfSourceSpec]]-side frame equality against the text twin read
  *     through the independent [[VcfSource]] path. */
class BcfFormatSpec extends AnyFunSuite {

  private val headerText =
    """##fileformat=VCFv4.3
      |##FILTER=<ID=PASS,Description="All filters passed">
      |##INFO=<ID=NS,Number=1,Type=Integer,Description="n">
      |##INFO=<ID=DP,Number=1,Type=Integer,Description="d">
      |##INFO=<ID=AF,Number=A,Type=Float,Description="f">
      |##INFO=<ID=DB,Number=0,Type=Flag,Description="m">
      |##FORMAT=<ID=GT,Number=1,Type=String,Description="g">
      |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">
      |##contig=<ID=chr1>
      |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	na1	na2""".stripMargin

  /** Implicit dictionary: PASS=0, NS=1, DP=2, AF=3, DB=4, GT=5. */
  private def goldenContainer(): Array[Byte] = {
    val rec = new ByteArrayOutputStream()
    def u8(v: Int): Unit = rec.write(v & 0xff)
    def i32(v: Int): Unit = {
      u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24)
    }
    def f32(f: Float): Unit = i32(java.lang.Float.floatToRawIntBits(f))
    def chars(s: String): Unit = { u8((s.length << 4) | 7); s.foreach(c => u8(c)) }
    def int8(v: Int): Unit = { u8((1 << 4) | 1); u8(v) }
    // ---- shared block
    val shared = new ByteArrayOutputStream()
    val keep = rec
    def into(b: ByteArrayOutputStream)(body: => Unit): Unit = body
    i32(0) // placeholder: lengths written at the end by slicing
    i32(0)
    val base = rec.size()
    i32(0) // CHROM idx (chr1)
    i32(99) // 0-based POS
    i32(2) // rlen
    f32(50.0f) // QUAL
    i32((2 << 16) | 4) // n_allele=2, n_info=4
    i32((2 << 24) | 2) // n_fmt=2, n_sample=2
    chars("rs1") // ID
    chars("AC"); chars("T") // alleles
    u8((1 << 4) | 1); u8(0) // FILTER: int8 vector [PASS]
    int8(1); int8(3) // NS=3
    int8(2); int8(14) // DP=14
    int8(3); u8((1 << 4) | 5); f32(0.5f) // AF=0.5
    int8(4); u8(0) // DB flag: value typed MISSING
    val sharedLen = rec.size() - base
    // ---- indiv block
    int8(5) // GT key
    u8((2 << 4) | 1) // int8 vector, 2 per sample
    u8(2); u8(5) // na1: 0|1  ((0+1)<<1=2, (1+1)<<1|1=5)
    u8(4); u8(4) // na2: 1/1
    int8(2) // DP key
    u8((1 << 4) | 1) // int8, 1 per sample
    u8(7); u8(9)
    val indivLen = rec.size() - base - sharedLen
    val bytes = rec.toByteArray
    // Patch the two length words.
    def patch(off: Int, v: Int): Unit = {
      bytes(off) = (v & 0xff).toByte; bytes(off + 1) = ((v >> 8) & 0xff).toByte
      bytes(off + 2) = ((v >> 16) & 0xff).toByte; bytes(off + 3) = ((v >> 24) & 0xff).toByte
    }
    patch(0, sharedLen); patch(4, indivLen)

    val out = new ByteArrayOutputStream()
    val bg = new BamFormat.BgzfOutputStream(out)
    bg.write('B'); bg.write('C'); bg.write('F'); bg.write(2); bg.write(2)
    val tb = headerText.getBytes("UTF-8") :+ 0.toByte
    def le32(v: Int): Unit = { bg.write(v & 0xff); bg.write((v >> 8) & 0xff)
      bg.write((v >> 16) & 0xff); bg.write((v >> 24) & 0xff) }
    le32(tb.length)
    bg.write(tb, 0, tb.length)
    bg.write(bytes, 0, bytes.length)
    bg.close()
    out.toByteArray
  }

  test("golden bytes: a spec-assembled record renders the exact VCF line") {
    val rd = new BcfFormat.BcfReader(
      new java.io.ByteArrayInputStream(goldenContainer()), flagKeys = Set("DB"))
    assert(rd.contigs.toSeq === Seq("chr1"))
    assert(rd.strings.take(6).toSeq === Seq("PASS", "NS", "DP", "AF", "DB", "GT"))
    val line = rd.nextLine()
    assert(line ===
      "chr1\t100\trs1\tAC\tT\t50\tPASS\tNS=3;DP=14;AF=0.5;DB\tGT:DP\t0|1:7\t1/1:9")
    assert(rd.nextLine() === null)
  }

  test("dictionaries honor explicit IDX attributes") {
    val text =
      """##FILTER=<ID=PASS,Description="p",IDX=0>
        |##INFO=<ID=DP,Number=1,Type=Integer,Description="d",IDX=7>
        |##contig=<ID=chrX,IDX=3>""".stripMargin
    val (strings, contigs) = BcfFormat.dictionaries(text)
    assert(strings(0) === "PASS" && strings(7) === "DP")
    assert(contigs(3) === "chrX")
  }

  test("a header mixing explicit IDX with implicit declarations fails loudly") {
    // Previously the implicit entries stayed at placeholder -1 (dropped
    // from the dictionary array), so later lookups rendered literal
    // "null" or threw mid-scan (r14 ADVICE) — the spec requires IDX on
    // all entries or none.
    val text = "##fileformat=VCFv4.3\n" +
      "##FILTER=<ID=PASS,Description=\"ok\",IDX=0>\n" +
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\",IDX=7>\n" +
      "##INFO=<ID=AF,Number=A,Type=Float,Description=\"no idx\">\n"
    val e = intercept[IllegalArgumentException](BcfFormat.dictionaries(text))
    assert(e.getMessage.contains("IDX") && e.getMessage.contains("AF"))
  }

  test("an undeclared PASS takes index 0 under explicit IDX numbering") {
    // htslib seeds the dictionary with PASS at IDX 0 and only writes IDX=
    // lines for the REST, so a spec-valid foreign header can declare
    // IDX=1..N and leave PASS implicit at 0. Previously PASS was pushed
    // past the declared max (r15 review) and every PASS record threw
    // 'FILTER dictionary index 0 out of range'.
    val text = "##fileformat=VCFv4.3\n" +
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\",IDX=1>\n" +
      "##INFO=<ID=AF,Number=A,Type=Float,Description=\"a\",IDX=2>\n"
    val (strings, _) = BcfFormat.dictionaries(text)
    assert(strings(0) === "PASS" && strings(1) === "DP" && strings(2) === "AF")
    // ... but when 0 is explicitly taken, PASS falls past the max instead
    // of colliding.
    val taken = "##FILTER=<ID=q10,Description=\"q\",IDX=0>\n" +
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\",IDX=1>\n"
    val (s2, _) = BcfFormat.dictionaries(taken)
    assert(s2(0) === "q10" && s2(2) === "PASS")
  }

  test("a header mixing explicit IDX with implicit contig lines fails loudly") {
    // Same all-or-none rule as the string dictionary: an implicit contig
    // assigned appearance order can collide with an explicit IDX and
    // silently rename every record on the shadowed contig (r15 review).
    val text = "##fileformat=VCFv4.3\n" +
      "##contig=<ID=chrA,IDX=1>\n" +
      "##contig=<ID=chrB>\n"
    val e = intercept[IllegalArgumentException](BcfFormat.dictionaries(text))
    assert(e.getMessage.contains("IDX") && e.getMessage.contains("chrB"))
  }

  test("foreign dictionary indexes and mis-sized records fail with position") {
    // Hand-assembled minimal record (spec §6.2 layout): CHROM 0, POS 41,
    // one allele 'A', FILTER = one int8 index.
    def rec(lShared: Int, filterIdx: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff)
        o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff) }
      le32(lShared); le32(0) // l_shared, l_indiv
      le32(0); le32(41); le32(1) // chrom, pos0, rlen
      le32(0x7F800001) // QUAL missing
      le32(1 << 16) // n_allele=1, n_info=0
      le32(0) // n_fmt=0, n_sample=0
      o.write(0x07) // ID: 0-length char
      o.write(0x17); o.write('A') // one allele
      o.write(0x11); o.write(filterIdx) // FILTER: one int8
      o.toByteArray
    }
    def cursor(bytes: Array[Byte]) = new BcfFormat.BcfLineCursor(
      new BcfFormat.ByteReader(new java.io.ByteArrayInputStream(bytes)),
      Array("PASS"), Array("1"), Set.empty)
    // Valid framing (shared block is 29 bytes), in-range index: decodes.
    assert(cursor(rec(29, 0)).nextLine().startsWith("1\t42\t"))
    // Out-of-range FILTER index: descriptive error, not AIOOBE/"null".
    val e1 = intercept[RuntimeException](cursor(rec(29, 99)).nextLine())
    assert(e1.getMessage.contains("FILTER dictionary index 99"), e1.getMessage)
    // Lying l_shared: the framing audit names the declared vs consumed
    // sizes instead of silently desyncing into the next record.
    val e2 = intercept[IllegalArgumentException](cursor(rec(31, 0)).nextLine())
    assert(e2.getMessage.contains("l_shared=31") &&
      e2.getMessage.contains("consumed 29"), e2.getMessage)
  }
}
