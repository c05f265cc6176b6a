package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import CramCodecs31.{Arith, FqzComp, NameTok, RansNx16}

/** CRAM 3.1 codec conformance: spec-assembled golden byte vectors for
  * the container/transform layouts (including one fully hand-computed
  * rANS Nx16 order-0 stream — states worked on paper from the spec
  * arithmetic), plus exhaustive encoder/decoder round-trip laws over
  * adversarial data shapes for every flag combination. The environment
  * is zero-egress, so differential testing against htscodecs-emitted
  * streams is impossible; these pins are the structural equivalent the
  * 3.0 codecs shipped with. */
class CramCodecs31Spec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val rng = new scala.util.Random(0x31C0DEC5)

  private def shapes(maxSyms: Int): Seq[Array[Byte]] = {
    def syms(n: Int) = Array.tabulate(math.min(n, maxSyms))(i => (40 + i).toByte)
    val uniform = Array.fill(4096)(syms(maxSyms)(rng.nextInt(math.min(16, maxSyms))))
    val runs = Array.fill(2000)(syms(4)(rng.nextInt(2))).zipWithIndex.flatMap {
      case (b, i) => Array.fill(1 + (i % 7))(b)
    }
    val skewed = Array.fill(3000)(
      syms(maxSyms)(math.min(maxSyms - 1, (math.abs(rng.nextGaussian()) * 2).toInt)))
    Seq(
      Array.empty[Byte],
      bytes(65),
      bytes(65, 65, 65),
      bytes(65, 66),
      bytes(65, 66, 67, 68, 69),
      uniform, runs, skewed,
      Array.fill(37)(65.toByte) // single-symbol, non-multiple-of-N length
    )
  }

  test("uint7 round-trips and matches the big-endian base-128 layout") {
    val out = new ByteArrayOutputStream()
    CramCodecs31.writeUint7(out, 300)
    assert(out.toByteArray.toSeq === bytes(0x82, 0x2C).toSeq)
    for (v <- Seq(0, 1, 127, 128, 129, 16383, 16384, 1 << 21, Int.MaxValue)) {
      val o = new ByteArrayOutputStream()
      CramCodecs31.writeUint7(o, v)
      val r = new CramCodecs31.Reader(o.toByteArray)
      assert(r.uint7() === v, s"uint7 $v")
      assert(!r.hasMore)
    }
  }

  test("rANS Nx16 golden: hand-computed order-0 stream decodes and is emitted") {
    // Data "AB": freqs normalise to 2048/2048; encoding by hand gives
    // state0 = 16<<12 + 0    = 0x10000  (symbol A, cum 0)
    // state1 = 16<<12 + 2048 = 0x10800  (symbol B, cum 2048)
    // states 2,3 untouched at the 0x8000 lower bound.
    val golden = bytes(
      0x00, // flags: order-0, 4-way
      0x02, // ulen
      65, 66, 0x00, 0x00, // alphabet: A, B(=A+1 so a run byte 0), terminator
      0x90, 0x00, // f(A) = 2048 as uint7
      0x90, 0x00, // f(B) = 2048
      0x00, 0x00, 0x01, 0x00, // state0 LE32
      0x00, 0x08, 0x01, 0x00, // state1
      0x00, 0x80, 0x00, 0x00, // state2
      0x00, 0x80, 0x00, 0x00) // state3
    assert(RansNx16.decode(golden, 2).toSeq === "AB".getBytes.toSeq)
    assert(RansNx16.encode("AB".getBytes, 0).toSeq === golden.toSeq)
  }

  test("rANS Nx16 golden: CAT, PACK+CAT, RLE+CAT, STRIPE containers") {
    // CAT: flags | ulen | raw payload.
    assert(RansNx16.decode(bytes(0x20, 3, 65, 66, 67), 3).toSeq === "ABC".getBytes.toSeq)
    assert(RansNx16.encode("ABC".getBytes, 0x20).toSeq ===
      bytes(0x20, 3, 65, 66, 67).toSeq)
    // PACK(2 syms)+CAT: 8 values in one packed byte, LSB first.
    val packCat = bytes(0xA0, 8, 2, 65, 66, 1, 0x55)
    assert(new String(RansNx16.decode(packCat, 8)) === "BABABABA")
    // RLE(raw meta)+CAT over "AAAABBBC" with only 'A' run-flagged:
    // meta = [rle_len=5][nsym=1]['A'][run-1=3], body = "ABBBC".
    val rleCat = bytes(0x60, 8, (9 << 1) | 1, 5, 1, 65, 3, 0x20 /*unused*/) // placeholder
    val meta = bytes(5, 1, 65, 3)
    val stream = new ByteArrayOutputStream()
    stream.write(0x60); stream.write(8)
    stream.write((meta.length << 1) | 1)
    stream.write(meta)
    stream.write("ABBBC".getBytes)
    assert(new String(RansNx16.decode(stream.toByteArray, 8)) === "AAAABBBC")
    assert(rleCat.nonEmpty) // silence the placeholder
    // STRIPE of 2 CAT sub-streams interleaving "ACE"/"BDF" -> "ABCDEF".
    val sub0 = bytes(0x30, 65, 67, 69) // CAT|NoSz
    val sub1 = bytes(0x30, 66, 68, 70)
    val st = new ByteArrayOutputStream()
    st.write(0x08); st.write(6); st.write(2)
    st.write(sub0.length); st.write(sub1.length)
    st.write(sub0); st.write(sub1)
    assert(new String(RansNx16.decode(st.toByteArray, 6)) === "ABCDEF")
  }

  test("rANS Nx16 round-trips every flag combination over adversarial shapes") {
    val anyData = Seq(0x00, 0x01, 0x04, 0x05, 0x20, 0x40, 0x41, 0x08, 0x09)
    for (flags <- anyData; data <- shapes(200)) {
      val dec = RansNx16.decode(RansNx16.encode(data, flags), data.length)
      assert(dec.toSeq === data.toSeq, s"flags=0x${flags.toHexString} len=${data.length}")
    }
    // Pack flavours need <= 16 distinct symbols.
    for (flags <- Seq(0x80, 0x81, 0xC0, 0xC1, 0xA0); data <- shapes(15)) {
      val dec = RansNx16.decode(RansNx16.encode(data, flags), data.length)
      assert(dec.toSeq === data.toSeq, s"flags=0x${flags.toHexString} len=${data.length}")
    }
    // 1/2/4-symbol packs exercise the 8-, 4- and 2-per-byte paths.
    for (n <- Seq(1, 2, 3, 4, 5, 16)) {
      val data = Array.tabulate(333)(i => (50 + i % n).toByte)
      assert(RansNx16.decode(RansNx16.encode(data, 0x80), 333).toSeq === data.toSeq)
    }
  }

  test("arith round-trips every mode over adversarial shapes") {
    for (flags <- Seq(0x00, 0x01, 0x20, 0x40, 0x41, 0x04, 0x08, 0x09);
        data <- shapes(200)) {
      val dec = Arith.decode(Arith.encode(data, flags), data.length)
      assert(dec.toSeq === data.toSeq, s"flags=0x${flags.toHexString} len=${data.length}")
    }
    for (flags <- Seq(0x80, 0x81); data <- shapes(15)) {
      val dec = Arith.decode(Arith.encode(data, flags), data.length)
      assert(dec.toSeq === data.toSeq, s"flags=0x${flags.toHexString} len=${data.length}")
    }
  }

  test("arith golden: CAT container and range-coder state discipline") {
    assert(Arith.decode(bytes(0x20, 3, 65, 66, 67), 3).toSeq === "ABC".getBytes.toSeq)
    // A long single-symbol stream keeps the adaptive model pegged and the
    // coder renormalising: decode must reproduce it exactly (this drives
    // the carry/cache path of the range coder hard).
    val ones = Array.fill(100000)(7.toByte)
    assert(Arith.decode(Arith.encode(ones, 0), ones.length).toSeq === ones.toSeq)
    // Alternating forces worst-case model churn.
    val alt = Array.tabulate(50000)(i => (i % 2).toByte)
    assert(Arith.decode(Arith.encode(alt, 1), alt.length).toSeq === alt.toSeq)
  }

  test("fqzcomp round-trips quality blocks and pins the v5 header") {
    val lens = Array(100, 100, 151, 5, 100, 37, 151, 151)
    val quals = lens.flatMap { len =>
      var q = 30
      Array.fill(len) {
        q = math.max(2, math.min(40, q + rng.nextInt(7) - 3))
        (33 + q).toByte
      }
    }
    val enc = FqzComp.encode(quals, lens)
    assert(enc(0) === 5.toByte, "fqzcomp version byte")
    assert(enc(1) === 0.toByte, "single-param gflags")
    assert(FqzComp.decode(enc, quals.length).toSeq === quals.toSeq)
    // Uniform qualities (degenerate alphabet of 1).
    val flat = Array.fill(500)(70.toByte)
    val encFlat = FqzComp.encode(flat, Array(250, 250))
    assert(FqzComp.decode(encFlat, 500).toSeq === flat.toSeq)
  }

  test("name tokeniser round-trips realistic and adversarial name blocks") {
    val illumina = (0 until 500).map(i =>
      s"m2101:33:HJ32CCXY:4:1101:${10000 + i * 7}:${100000 + (i * 13) % 9000}")
    val mixed = Seq("read1", "read2", "read10", "r", "read10",
      "a.b.c-d_e:f", "0012340", "0012341", "xyz9999999999abc")
    for (names <- Seq(illumina, mixed, Seq("one"), Seq.empty[String]);
        useArith <- Seq(false, true)) {
      val block = names.map(_ + "\n").mkString.getBytes
      val enc = NameTok.encode(block, useArith)
      val dec = NameTok.decode(enc, block.length)
      assert(new String(dec) === new String(block),
        s"names=${names.take(3)}… arith=$useArith")
    }
  }

  test("readBlock dispatches CRAM 3.1 block methods 5-8") {
    def block(method: Int, payload: Array[Byte], rsize: Int): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(method); b.write(4) // EXTERNAL content type
      CramFormat.writeItf8(b, 12) // content id
      CramFormat.writeItf8(b, payload.length)
      CramFormat.writeItf8(b, rsize)
      b.write(payload)
      b.write(Array[Byte](0, 0, 0, 0)) // CRC, unverified on read
      b.toByteArray
    }
    val data = "the same twelve bytes the BAM twin carries".getBytes
    val viaRans = CramFormat.readBlock(
      new CramFormat.Cursor(block(5, RansNx16.encode(data, 0x01), data.length)))
    assert(viaRans.data.toSeq === data.toSeq)
    val viaArith = CramFormat.readBlock(
      new CramFormat.Cursor(block(6, Arith.encode(data, 0x00), data.length)))
    assert(viaArith.data.toSeq === data.toSeq)
    val quals = Array.fill(80)((33 + rng.nextInt(40)).toByte)
    val viaFqz = CramFormat.readBlock(
      new CramFormat.Cursor(block(7, FqzComp.encode(quals, Array(40, 40)), 80)))
    assert(viaFqz.data.toSeq === quals.toSeq)
    val names = "q1\nq2\nq3\n".getBytes
    val viaTok = CramFormat.readBlock(
      new CramFormat.Cursor(block(8, NameTok.encode(names), names.length)))
    assert(viaTok.data.toSeq === names.toSeq)
  }
}
