package graft.sources

import java.io.ByteArrayOutputStream

/** CRAM 3.1 block compression codecs (hts-specs, "CRAM compression
  * methods" / CRAMcodecs document): rANS Nx16 (block method 5), the
  * adaptive arithmetic coder (method 6), fqzcomp qualities (method 7)
  * and the name tokeniser (method 8). Pure JVM, decode AND encode — the
  * mirrored encoders let [[CramFormat.CramWriter]] emit 3.1 containers
  * and let the specs round-trip every transform combination against
  * golden fixtures, the same construction the 3.0 codecs used
  * (reference delegates all of this to htsjdk:
  * `/root/reference/src/main/scala/org/biodatageeks/sequila/datasources/BAM/CRAMDataSource.scala:7-16`,
  * whose 2024 htsjdk reads 3.0 only — this is beyond reference parity).
  *
  * Layouts follow the published CRAM 3.1 codec spec; the environment is
  * zero-egress (no htscodecs-emitted sample streams to differentially
  * test against), so conformance is pinned by structure: spec-assembled
  * golden byte vectors for every container/transform layout plus
  * exhaustive encoder/decoder round-trip laws.
  */
object CramCodecs31 {

  // ------------------------------------------------------------- uint7
  /** Big-endian base-128 varint ("uint7"): continuation bit 0x80 on
    * every byte but the last, 7 payload bits per byte, most significant
    * group first. */
  private[sources] final class Reader(val d: Array[Byte], var o: Int = 0) {
    def hasMore: Boolean = o < d.length
    def u8(): Int = {
      require(o < d.length, s"CRAM 3.1 codec stream truncated at $o")
      val v = d(o) & 0xff; o += 1; v
    }
    def uint7(): Int = {
      var v = 0
      var c = u8()
      var n = 0
      while ((c & 0x80) != 0) {
        v = (v << 7) | (c & 0x7f)
        c = u8()
        n += 1
        require(n < 5, "uint7 longer than 32 bits (corrupt stream)")
      }
      (v << 7) | c
    }
    def le32(): Long = {
      val v = (u8().toLong) | (u8().toLong << 8) | (u8().toLong << 16) |
        (u8().toLong << 24)
      v
    }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && o + n <= d.length,
        s"CRAM 3.1 codec stream truncated: need $n bytes at $o of ${d.length}")
      val a = java.util.Arrays.copyOfRange(d, o, o + n); o += n; a
    }
  }

  private[sources] def writeUint7(out: ByteArrayOutputStream, v0: Int): Unit = {
    require(v0 >= 0, s"uint7 of negative $v0")
    var started = false
    var shift = 28
    while (shift > 0) {
      if (started || (v0 >>> shift) != 0) {
        out.write(0x80 | ((v0 >>> shift) & 0x7f))
        started = true
      }
      shift -= 7
    }
    out.write(v0 & 0x7f)
  }

  // ========================================================= rANS Nx16
  /** rANS Nx16 (CRAM 3.1 block method 5): 16-bit-renormalising rANS
    * with 4 or 32 interleaved states plus the bit-pack / RLE / stripe /
    * cat transforms. Decode applies the spec pipeline
    * entropy → un-RLE → un-pack (encode packs, then run-length-encodes,
    * then entropy-codes); stripe splits the output into N interleaved
    * sub-streams each of which is a complete Nx16 stream of its own. */
  object RansNx16 {
    val FlagOrder1 = 0x01
    val FlagN32 = 0x04
    val FlagStripe = 0x08
    val FlagNoSz = 0x10
    val FlagCat = 0x20
    val FlagRle = 0x40
    val FlagPack = 0x80

    private val Tot0Bits = 12 // order-0 frequencies normalise to 4096
    private val RansL = 1L << 15 // lower renormalisation bound ("Nx16")

    // ---------------------------------------------------------- decode
    /** Decode one complete Nx16 stream. `expected` supplies the output
      * length when the stream carries the NoSz flag (stripe sub-streams;
      * the CRAM block header's raw size otherwise backs it up). */
    def decode(d: Array[Byte], expected: Int = -1): Array[Byte] =
      decode(new Reader(d), expected)

    private def decode(c: Reader, expected: Int): Array[Byte] = {
      val flags = c.u8()
      val ulen =
        if ((flags & FlagNoSz) != 0) {
          require(expected >= 0, "NoSz rANS Nx16 stream with no outer length")
          expected
        } else c.uint7()
      if ((flags & FlagStripe) != 0) return decodeStripe(c, ulen)
      val n = if ((flags & FlagN32) != 0) 32 else 4
      // Transform metadata precedes the entropy payload: pack first,
      // then RLE (the reverse of the decode-side application order).
      var packSyms: Array[Byte] = null
      var packLen = 0
      if ((flags & FlagPack) != 0) {
        val nsym = c.u8()
        require(nsym <= 16, s"rANS Nx16 pack with $nsym symbols (max 16)")
        packSyms = c.take(nsym)
        packLen = c.uint7()
      }
      var rleMeta: Reader = null
      var rleLen = 0
      if ((flags & FlagRle) != 0) {
        val x = c.uint7()
        val metaLen = x >> 1
        val meta =
          if ((x & 1) != 0) c.take(metaLen) // stored raw
          else {
            // meta itself rANS Nx16 order-0 compressed
            val clen = c.uint7()
            val m = decode(new Reader(c.take(clen)), metaLen)
            require(m.length == metaLen,
              s"rANS Nx16 RLE meta inflated ${m.length} of $metaLen")
            m
          }
        rleMeta = new Reader(meta)
        rleLen = rleMeta.uint7()
      }
      // Length the entropy stage must produce: innermost transform first.
      val entropyLen =
        if ((flags & FlagRle) != 0) rleLen
        else if ((flags & FlagPack) != 0) packLen
        else ulen
      val data0 =
        if ((flags & FlagCat) != 0) c.take(entropyLen)
        else if ((flags & FlagOrder1) != 0) decodeO1(c, n, entropyLen)
        else decodeO0(c, n, entropyLen)
      val data1 =
        if ((flags & FlagRle) != 0)
          unRle(data0, rleMeta, if ((flags & FlagPack) != 0) packLen else ulen)
        else data0
      val out =
        if ((flags & FlagPack) != 0) unpack(data1, packSyms, ulen) else data1
      require(out.length == ulen,
        s"rANS Nx16 inflated ${out.length} of $ulen bytes")
      out
    }

    private def decodeStripe(c: Reader, ulen: Int): Array[Byte] = {
      val n = c.u8()
      require(n >= 1 && n <= 255, s"rANS Nx16 stripe over $n sub-streams")
      val clens = Array.fill(n)(c.uint7())
      val subs = new Array[Array[Byte]](n)
      var j = 0
      while (j < n) {
        val subLen = (ulen - j + n - 1) / n // indices ≡ j (mod n) below ulen
        subs(j) = decode(new Reader(c.take(clens(j))), subLen)
        require(subs(j).length == subLen,
          s"stripe sub-stream $j inflated ${subs(j).length} of $subLen")
        j += 1
      }
      val out = new Array[Byte](ulen)
      var i = 0
      while (i < ulen) { out(i) = subs(i % n)(i / n); i += 1 }
      out
    }

    /** Present-symbol list: ascending, RLE'd exactly like the 4x8 table
      * alphabet (a run byte follows whenever sym == last + 1), 0-byte
      * terminated. */
    private def readAlphabet(c: Reader): Array[Int] = {
      val present = collection.mutable.ArrayBuffer.empty[Int]
      var sym = c.u8()
      var last = sym
      var rle = 0
      var done = false
      while (!done) {
        present += sym
        if (rle > 0) { rle -= 1; sym += 1 }
        else {
          val s2 = c.u8()
          if (s2 == last + 1) rle = c.u8()
          sym = s2
        }
        last = sym
        if (sym == 0) done = true
      }
      present.toArray
    }

    private def writeAlphabet(out: ByteArrayOutputStream, present: Seq[Int]): Unit = {
      var pi = 0
      while (pi < present.length) {
        val sym = present(pi)
        out.write(sym)
        var run = 0
        while (pi + run + 1 < present.length && present(pi + run + 1) == sym + run + 1)
          run += 1
        if (run > 0) {
          out.write(sym + 1)
          out.write(run - 1)
          pi += run
        }
        pi += 1
      }
      out.write(0)
    }

    /** Defensive renormalisation to `1 << bits` when stored frequencies
      * do not already sum there (our encoder always stores them
      * normalised; foreign encoders may not). Deterministic: scale, keep
      * present symbols >= 1, pay rounding drift on the largest. */
    private def normalise(freq: Array[Int], bits: Int): Unit = {
      var tot = 0L
      var i = 0
      while (i < 256) { tot += freq(i); i += 1 }
      val target = 1 << bits
      if (tot == 0 || tot == target) return
      var acc = 0
      var maxSym = 0
      i = 0
      while (i < 256) {
        if (freq(i) > 0) {
          if (freq(i) > freq(maxSym)) maxSym = i
          freq(i) = math.max(1L, freq(i).toLong * target / tot).toInt
          acc += freq(i)
        }
        i += 1
      }
      freq(maxSym) += target - acc
      require(freq(maxSym) > 0, "rANS Nx16 frequency normalisation collapsed")
    }

    private def lutOf(freq: Array[Int], cum: Array[Int], bits: Int): Array[Byte] = {
      var t = 0
      var i = 0
      while (i < 256) { cum(i) = t; t += freq(i); i += 1 }
      cum(256) = t
      val lut = new Array[Byte](1 << bits)
      i = 0
      while (i < 256) {
        var j = cum(i)
        val e = j + freq(i)
        while (j < e) { lut(j) = i.toByte; j += 1 }
        i += 1
      }
      lut
    }

    private def decodeO0(c: Reader, n: Int, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      if (len == 0) return out
      val freq = new Array[Int](256)
      val alpha = readAlphabet(c)
      var ai = 0
      while (ai < alpha.length) { freq(alpha(ai)) = c.uint7(); ai += 1 }
      normalise(freq, Tot0Bits)
      val cum = new Array[Int](257)
      val lut = lutOf(freq, cum, Tot0Bits)
      val R = new Array[Long](n)
      var j = 0
      while (j < n) { R(j) = c.le32(); j += 1 }
      var i = 0
      while (i < len) {
        val k = i % n
        var st = R(k)
        val fr = (st & 0xFFF).toInt
        val s = lut(fr) & 0xff
        out(i) = s.toByte
        st = freq(s).toLong * (st >> Tot0Bits) + fr - cum(s)
        while (st < RansL) st = (st << 8) | c.u8()
        R(k) = st
        i += 1
      }
      out
    }

    /** Order-1 frequency section: one byte `(shift << 4) | compressed`,
      * then (possibly order-0-compressed) table bytes holding the shared
      * alphabet followed by |A|×|A| uint7 frequencies with zero-runs
      * RLE'd (a 0 frequency is followed by a byte counting further
      * zeros). Each context row is normalised to `1 << shift`. */
    private def decodeO1(c: Reader, n: Int, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      if (len == 0) return out
      val hdr = c.u8()
      val shift = hdr >> 4
      require(shift >= 1 && shift <= 15, s"rANS Nx16 order-1 shift $shift")
      val tc: Reader =
        if ((hdr & 1) != 0) {
          val clen = c.uint7()
          val tulen = c.uint7()
          val t = decode(new Reader(c.take(clen)), tulen)
          require(t.length == tulen,
            s"order-1 table inflated ${t.length} of $tulen")
          new Reader(t)
        } else c
      val alpha = readAlphabet(tc)
      val freq = Array.ofDim[Int](256, 256)
      var ai = 0
      while (ai < alpha.length) {
        val row = freq(alpha(ai))
        var bi = 0
        while (bi < alpha.length) {
          val f = tc.uint7()
          row(alpha(bi)) = f
          if (f == 0) {
            var z = tc.u8()
            while (z > 0 && bi + 1 < alpha.length) { bi += 1; z -= 1 }
            require(z == 0, "order-1 zero-run overruns the alphabet row")
          }
          bi += 1
        }
        ai += 1
      }
      val cum = Array.ofDim[Int](256, 257)
      val luts = new Array[Array[Byte]](256)
      ai = 0
      while (ai < alpha.length) {
        val ctx = alpha(ai)
        var tot = 0
        var k = 0
        while (k < 256) { tot += freq(ctx)(k); k += 1 }
        if (tot > 0) {
          normalise(freq(ctx), shift)
          luts(ctx) = lutOf(freq(ctx), cum(ctx), shift)
        }
        ai += 1
      }
      val mask = (1 << shift) - 1
      val R = new Array[Long](n)
      var j = 0
      while (j < n) { R(j) = c.le32(); j += 1 }
      // N contiguous fragments; the remainder rides on the LAST state.
      val frag = len / n
      val L = new Array[Int](n)
      var i = 0
      while (i < frag) {
        j = 0
        while (j < n) {
          var st = R(j)
          val cx = L(j)
          require(luts(cx) != null, s"order-1 decode hit contextless symbol $cx")
          val fr = (st & mask).toInt
          val s = luts(cx)(fr) & 0xff
          out(j * frag + i) = s.toByte
          st = freq(cx)(s).toLong * (st >> shift) + fr - cum(cx)(s)
          while (st < RansL) st = (st << 8) | c.u8()
          R(j) = st
          L(j) = s
          j += 1
        }
        i += 1
      }
      i = n * frag
      while (i < len) {
        var st = R(n - 1)
        val cx = L(n - 1)
        require(luts(cx) != null, s"order-1 decode hit contextless symbol $cx")
        val fr = (st & mask).toInt
        val s = luts(cx)(fr) & 0xff
        out(i) = s.toByte
        st = freq(cx)(s).toLong * (st >> shift) + fr - cum(cx)(s)
        while (st < RansL) st = (st << 8) | c.u8()
        R(n - 1) = st
        L(n - 1) = s
        i += 1
      }
      out
    }

    /** Bit-unpack `packed` (1/2/4 bits per value, least-significant
      * group first) into `ulen` original symbols via the pack map. */
    private def unpack(packed: Array[Byte], syms: Array[Byte], ulen: Int): Array[Byte] = {
      val out = new Array[Byte](ulen)
      val nsym = syms.length
      var i = 0
      if (nsym <= 1) {
        require(nsym == 1 || ulen == 0, "pack of zero symbols with output")
        while (i < ulen) { out(i) = syms(0); i += 1 }
      } else if (nsym == 2) {
        while (i < ulen) {
          out(i) = syms((packed(i >> 3) >> (i & 7)) & 1)
          i += 1
        }
      } else if (nsym <= 4) {
        while (i < ulen) {
          out(i) = syms((packed(i >> 2) >> (2 * (i & 3))) & 3)
          i += 1
        }
      } else {
        while (i < ulen) {
          out(i) = syms((packed(i >> 1) >> (4 * (i & 1))) & 15)
          i += 1
        }
      }
      out
    }

    /** Expand run-lengths: symbols flagged in the meta carry a uint7
      * EXTRA-repeat count (total run = count + 1) read from the meta
      * stream in encounter order. */
    private def unRle(data: Array[Byte], meta: Reader, targetLen: Int): Array[Byte] = {
      val nsRaw = meta.u8()
      val ns = if (nsRaw == 0) 256 else nsRaw
      val flagged = new Array[Boolean](256)
      var i = 0
      while (i < ns) { flagged(meta.u8()) = true; i += 1 }
      val out = new Array[Byte](targetLen)
      var op = 0
      i = 0
      while (i < data.length) {
        val b = data(i)
        if (flagged(b & 0xff)) {
          val extra = meta.uint7()
          var r = 0
          require(op + extra + 1 <= targetLen,
            s"RLE run overruns the declared output ($targetLen)")
          while (r <= extra) { out(op) = b; op += 1; r += 1 }
        } else {
          require(op < targetLen, s"RLE output overruns $targetLen")
          out(op) = b; op += 1
        }
        i += 1
      }
      require(op == targetLen, s"RLE produced $op of $targetLen bytes")
      out
    }

    // ---------------------------------------------------------- encode
    /** Encode with the given flag set (the transform combination is the
      * caller's choice; callers pick per-series). NoSz is honoured
      * (stripe sub-streams), Stripe splits 4 ways. */
    def encode(data: Array[Byte], flags: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length / 2 + 64)
      out.write(flags)
      if ((flags & FlagNoSz) == 0) writeUint7(out, data.length)
      if ((flags & FlagStripe) != 0) {
        require((flags & ~(FlagStripe | FlagNoSz | FlagOrder1 | FlagN32)) == 0,
          "stripe composes only with order/N32 flags on the sub-streams")
        val n = 4
        out.write(n)
        val subFlags = (flags & (FlagOrder1 | FlagN32)) | FlagNoSz
        val subs = Array.tabulate(n) { j =>
          val subLen = (data.length - j + n - 1) / n
          val sub = new Array[Byte](subLen)
          var i = 0
          while (i < subLen) { sub(i) = data(i * n + j); i += 1 }
          encode(sub, subFlags)
        }
        subs.foreach(s => writeUint7(out, s.length))
        subs.foreach(out.write)
        return out.toByteArray
      }
      var payload = data
      if ((flags & FlagPack) != 0) {
        val present = (0 until 256).filter(s => data.exists(b => (b & 0xff) == s))
        require(present.length <= 16,
          s"pack needs <= 16 distinct symbols, got ${present.length}")
        val index = new Array[Int](256)
        present.zipWithIndex.foreach { case (s, i) => index(s) = i }
        out.write(present.length)
        present.foreach(out.write)
        payload = packBits(data, index, present.length)
        writeUint7(out, payload.length)
      }
      if ((flags & FlagRle) != 0) {
        val (rled, meta) = rle(payload)
        payload = rled
        // Meta stored raw (bit 0 set) — size-optimal for fixtures and a
        // layout real decoders must accept either way.
        writeUint7(out, (meta.length << 1) | 1)
        out.write(meta)
      }
      if ((flags & FlagCat) != 0) out.write(payload)
      else if ((flags & FlagOrder1) != 0)
        out.write(encodeO1(payload, if ((flags & FlagN32) != 0) 32 else 4))
      else out.write(encodeO0(payload, if ((flags & FlagN32) != 0) 32 else 4))
      out.toByteArray
    }

    private def packBits(data: Array[Byte], index: Array[Int], nsym: Int): Array[Byte] = {
      if (nsym <= 1) return new Array[Byte](0)
      val per = if (nsym == 2) 8 else if (nsym <= 4) 4 else 2
      val bits = if (nsym == 2) 1 else if (nsym <= 4) 2 else 4
      val out = new Array[Byte]((data.length + per - 1) / per)
      var i = 0
      while (i < data.length) {
        out(i / per) = (out(i / per) |
          (index(data(i) & 0xff) << (bits * (i % per)))).toByte
        i += 1
      }
      out
    }

    /** Run-length encode: every symbol whose total run savings are
      * positive joins the flagged set; the data stream keeps ONE copy
      * per run, the meta stream its uint7 extra count. */
    private def rle(data: Array[Byte]): (Array[Byte], Array[Byte]) = {
      // Net saving per symbol if flagged: (run bytes removed) - (uint7 meta).
      val saving = new Array[Long](256)
      var i = 0
      while (i < data.length) {
        var j = i + 1
        while (j < data.length && data(j) == data(i)) j += 1
        val run = j - i
        val s = data(i) & 0xff
        saving(s) += (run - 1) - (if (run - 1 < 128) 1 else 2)
        i = j
      }
      // A symbol count of 0 means ALL 256 in the meta layout, so an empty
      // profitable set (uniform data) flags one symbol instead — its runs
      // still round-trip, just without savings.
      val flagged = {
        val f = (0 until 256).filter(saving(_) > 0)
        if (f.isEmpty) Seq(0) else f
      }
      val isFlagged = new Array[Boolean](256)
      flagged.foreach(isFlagged(_) = true)
      val meta = new ByteArrayOutputStream()
      val runs = new ByteArrayOutputStream()
      meta.write(if (flagged.length == 256) 0 else flagged.length)
      flagged.foreach(meta.write)
      val dataOut = new ByteArrayOutputStream(data.length)
      i = 0
      while (i < data.length) {
        val b = data(i)
        var j = i + 1
        if (isFlagged(b & 0xff)) {
          while (j < data.length && data(j) == b) j += 1
          dataOut.write(b)
          writeUint7(runs, j - i - 1)
        } else dataOut.write(b)
        i = j
      }
      // meta = [rle-data length][flag set][runs]
      val head = new ByteArrayOutputStream()
      val body = dataOut.toByteArray
      writeUint7(head, body.length)
      meta.toByteArray.foreach(b => head.write(b & 0xff))
      runs.toByteArray.foreach(b => head.write(b & 0xff))
      (body, head.toByteArray)
    }

    private def frequencies(data: Array[Byte]): (Array[Int], Array[Int], Seq[Int]) = {
      val raw = new Array[Long](256)
      var i = 0
      while (i < data.length) { raw(data(i) & 0xff) += 1; i += 1 }
      val freq = new Array[Int](256)
      var total = 0
      var maxSym = 0
      i = 0
      while (i < 256) {
        if (raw(i) > 0) {
          freq(i) = math.max(1L, raw(i) * 4096 / data.length).toInt
          total += freq(i)
          if (raw(i) > raw(maxSym)) maxSym = i
        }
        i += 1
      }
      freq(maxSym) += 4096 - total
      require(freq(maxSym) > 0, "rANS Nx16 frequency normalisation collapsed")
      val cum = new Array[Int](257)
      i = 0
      while (i < 256) { cum(i + 1) = cum(i) + freq(i); i += 1 }
      (freq, cum, (0 until 256).filter(freq(_) > 0))
    }

    private def encodeO0(data: Array[Byte], n: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length + 64)
      if (data.isEmpty) return out.toByteArray
      val (freq, cum, present) = frequencies(data)
      writeAlphabet(out, present)
      present.foreach(s => writeUint7(out, freq(s)))
      val states = Array.fill(n)(RansL)
      val tail = new Array[Byte](data.length + 8 * n + 64)
      var op = tail.length
      var i = data.length - 1
      while (i >= 0) {
        val s = data(i) & 0xff
        val f = freq(s)
        val j = i % n
        var st = states(j)
        val bound = ((RansL >> Tot0Bits) << 8) * f
        while (st >= bound) { op -= 1; tail(op) = (st & 0xff).toByte; st >>= 8 }
        states(j) = ((st / f) << Tot0Bits) + (st % f) + cum(s)
        i -= 1
      }
      var j = 0
      while (j < n) {
        val st = states(j)
        out.write((st & 0xff).toInt); out.write(((st >> 8) & 0xff).toInt)
        out.write(((st >> 16) & 0xff).toInt); out.write(((st >> 24) & 0xff).toInt)
        j += 1
      }
      out.write(tail, op, tail.length - op)
      out.toByteArray
    }

    private def encodeO1(data: Array[Byte], n: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length + 1024)
      if (data.isEmpty) return out.toByteArray
      val shift = 12
      val target = 1 << shift
      // Transition counts with context 0 opening each fragment.
      val counts = Array.ofDim[Long](256, 256)
      val frag = data.length / n
      var j = 0
      while (j < n) {
        var ctx = 0
        val end = if (j == n - 1) data.length else (j + 1) * frag
        var i = j * frag
        while (i < end) {
          counts(ctx)(data(i) & 0xff) += 1
          ctx = data(i) & 0xff
          i += 1
        }
        j += 1
      }
      val inAlpha = new Array[Boolean](256)
      inAlpha(0) = true // every fragment opens in context 0
      var i = 0
      while (i < data.length) { inAlpha(data(i) & 0xff) = true; i += 1 }
      val alpha = (0 until 256).filter(inAlpha)
      // Normalise each non-empty row to 1 << shift.
      val freq = Array.ofDim[Int](256, 256)
      val cum = Array.ofDim[Int](256, 257)
      alpha.foreach { ctx =>
        val row = counts(ctx)
        var tot = 0L
        row.foreach(tot += _)
        if (tot > 0) {
          var acc = 0
          var maxSym = 0
          var s = 0
          while (s < 256) {
            if (row(s) > 0) {
              if (row(s) > row(maxSym)) maxSym = s
              freq(ctx)(s) = math.max(1L, row(s) * target / tot).toInt
              acc += freq(ctx)(s)
            }
            s += 1
          }
          freq(ctx)(maxSym) += target - acc
          require(freq(ctx)(maxSym) > 0, "order-1 normalisation collapsed")
          var t = 0
          s = 0
          while (s < 256) { cum(ctx)(s) = t; t += freq(ctx)(s); s += 1 }
          cum(ctx)(256) = t
        }
      }
      // Table: alphabet + |A|^2 freqs with zero-run RLE, stored raw.
      val table = new ByteArrayOutputStream()
      writeAlphabet(table, alpha)
      alpha.foreach { ctx =>
        var bi = 0
        while (bi < alpha.length) {
          val f = freq(ctx)(alpha(bi))
          writeUint7(table, f)
          if (f == 0) {
            var z = 0
            while (bi + 1 + z < alpha.length && z < 255 &&
              freq(ctx)(alpha(bi + 1 + z)) == 0) z += 1
            table.write(z)
            bi += z
          }
          bi += 1
        }
      }
      out.write(shift << 4) // low bit clear: table stored raw
      out.write(table.toByteArray)
      // Backward interleaved encode mirroring decodeO1: reverse symbol
      // step order is (i from frag-1 down, j from n-1 down), remainder
      // (on state n-1) first of all.
      val states = Array.fill(n)(RansL)
      val tail = new Array[Byte](data.length + 8 * n + 64)
      var op = tail.length
      def emit(j: Int, ctx: Int, s: Int): Unit = {
        val f = freq(ctx)(s)
        var st = states(j)
        val bound = ((RansL >> shift) << 8) * f
        while (st >= bound) { op -= 1; tail(op) = (st & 0xff).toByte; st >>= 8 }
        states(j) = ((st / f) << shift) + (st % f) + cum(ctx)(s)
      }
      def ctxAt(pos: Int, fragStart: Int): Int =
        if (pos == fragStart) 0 else data(pos - 1) & 0xff
      i = data.length - 1
      while (i >= n * frag) { // remainder, state n-1, deepest first
        emit(n - 1, ctxAt(i, (n - 1) * frag), data(i) & 0xff)
        i -= 1
      }
      var step = frag - 1
      while (step >= 0) {
        j = n - 1
        while (j >= 0) {
          val pos = j * frag + step
          emit(j, ctxAt(pos, j * frag), data(pos) & 0xff)
          j -= 1
        }
        step -= 1
      }
      j = 0
      while (j < n) {
        val st = states(j)
        out.write((st & 0xff).toInt); out.write(((st >> 8) & 0xff).toInt)
        out.write(((st >> 16) & 0xff).toInt); out.write(((st >> 24) & 0xff).toInt)
        j += 1
      }
      out.write(tail, op, tail.length - op)
      out.toByteArray
    }
  }

  // ============================================== adaptive arithmetic
  /** Adaptive arithmetic coder (CRAM 3.1 block method 6): an LZMA-style
    * carry-propagating range coder (32-bit range, 64-bit low, byte-wise
    * renormalisation at 2^24, 5-byte preload) driving adaptive
    * frequency models (every symbol starts at 1, +16 per hit, halving
    * rescale at 2^16, hit symbols bubble one slot toward the front).
    * The container byte reuses the Nx16 transform flags (order bit,
    * pack, stripe, cat, nosz); RLE here integrates INTO the entropy
    * stage — (symbol, run) pairs with the run's uint7-like continuation
    * bytes coded through per-symbol run models. */
  object Arith {
    val FlagOrder1 = 0x01
    val FlagExt = 0x04 // external: payload is a bzip2 stream
    val FlagStripe = 0x08
    val FlagNoSz = 0x10
    val FlagCat = 0x20
    val FlagRle = 0x40
    val FlagPack = 0x80

    private val Top = 1L << 24
    private val ModelStep = 16
    private val ModelMax = (1 << 16) - 17

    private[sources] final class RangeDecoder(c: Reader) {
      private var range = 0xFFFFFFFFL
      private var code = 0L
      // 5-byte preload TRUNCATED to 32 bits: the leading byte is the
      // encoder's cache-priming zero (plus a possible carry the encoder
      // already folded into its arithmetic), so only the low 32 bits
      // carry state — the reference coder holds code in a uint32.
      locally { var i = 0; while (i < 5) { code = ((code << 8) | c.u8()) & 0xFFFFFFFFL; i += 1 } }
      def getFreq(tot: Int): Int = {
        range /= tot
        val f = code / range
        require(f < tot, s"range decoder out of sync (freq $f of $tot)")
        f.toInt
      }
      def decode(cumFreq: Int, freq: Int): Unit = {
        code -= cumFreq * range
        range *= freq
        while (range < Top) {
          code = ((code << 8) | c.u8()) & 0xFFFFFFFFL
          range <<= 8
        }
      }
    }

    private[sources] final class RangeEncoder(out: ByteArrayOutputStream) {
      private var low = 0L
      private var range = 0xFFFFFFFFL
      private var cache = 0
      private var cacheSize = 1L
      private def shiftLow(): Unit = {
        if ((low & 0xFFFFFFFFL) < 0xFF000000L || (low >>> 32) != 0) {
          var temp = cache
          val carry = (low >>> 32).toInt
          var n = cacheSize
          while (n > 0) { out.write((temp + carry) & 0xff); temp = 0xFF; n -= 1 }
          cacheSize = 0
          cache = ((low >>> 24) & 0xff).toInt
        }
        cacheSize += 1
        low = (low << 8) & 0xFFFFFFFFL
      }
      def encode(cumFreq: Int, freq: Int, tot: Int): Unit = {
        range /= tot
        low += cumFreq * range
        range *= freq
        while (range < Top) { range <<= 8; shiftLow() }
      }
      def finish(): Unit = { var i = 0; while (i < 5) { shiftLow(); i += 1 } }
    }

    /** Adaptive model over `nsym` symbols, order kept sorted-ish by the
      * bubble-on-hit heuristic — decoder and encoder update identically,
      * so the symbol permutation stays in lock step. */
    private[sources] final class Model(nsym: Int) {
      private val freq = Array.fill(nsym)(1)
      private val sym = Array.tabulate(nsym)(identity)
      private var total = nsym
      private def rescale(): Unit = {
        var t = 0
        var i = 0
        while (i < nsym) { freq(i) -= freq(i) >> 1; t += freq(i); i += 1 }
        total = t
      }
      private def bump(i: Int): Unit = {
        freq(i) += ModelStep
        total += ModelStep
        if (i > 0 && freq(i) > freq(i - 1)) {
          val tf = freq(i); freq(i) = freq(i - 1); freq(i - 1) = tf
          val ts = sym(i); sym(i) = sym(i - 1); sym(i - 1) = ts
        }
        if (total > ModelMax) rescale()
      }
      def decode(rc: RangeDecoder): Int = {
        val f = rc.getFreq(total)
        var acc = 0
        var i = 0
        while (acc + freq(i) <= f) { acc += freq(i); i += 1 }
        rc.decode(acc, freq(i))
        val s = sym(i)
        bump(i)
        s
      }
      def encode(rc: RangeEncoder, s: Int): Unit = {
        var i = 0
        var acc = 0
        while (sym(i) != s) { acc += freq(i); i += 1 }
        rc.encode(acc, freq(i), total)
        bump(i)
      }
    }

    def decode(d: Array[Byte], expected: Int = -1): Array[Byte] =
      decode(new Reader(d), expected)

    private def decode(c: Reader, expected: Int): Array[Byte] = {
      val flags = c.u8()
      val ulen =
        if ((flags & FlagNoSz) != 0) {
          require(expected >= 0, "NoSz arith stream with no outer length")
          expected
        } else c.uint7()
      if ((flags & FlagStripe) != 0) return decodeStripe(c, ulen)
      var packSyms: Array[Byte] = null
      var packLen = 0
      if ((flags & FlagPack) != 0) {
        val nsym = c.u8()
        require(nsym <= 16, s"arith pack with $nsym symbols (max 16)")
        packSyms = c.take(nsym)
        packLen = c.uint7()
      }
      val entropyLen = if ((flags & FlagPack) != 0) packLen else ulen
      val data1 =
        if ((flags & FlagCat) != 0) c.take(entropyLen)
        else if ((flags & FlagExt) != 0) {
          val raw = c.take(c.d.length - c.o)
          val out = new ByteArrayOutputStream(entropyLen)
          val in = new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorInputStream(new java.io.ByteArrayInputStream(raw))
          val buf = new Array[Byte](8192)
          var r = in.read(buf)
          while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
          in.close()
          out.toByteArray
        }
        else if ((flags & FlagRle) != 0)
          decodeRle(c, entropyLen, (flags & FlagOrder1) != 0)
        else decodePlain(c, entropyLen, (flags & FlagOrder1) != 0)
      val out =
        if ((flags & FlagPack) != 0) unpackShared(data1, packSyms, ulen)
        else data1
      require(out.length == ulen, s"arith inflated ${out.length} of $ulen bytes")
      out
    }

    private def decodeStripe(c: Reader, ulen: Int): Array[Byte] = {
      val n = c.u8()
      require(n >= 1, s"arith stripe over $n sub-streams")
      val clens = Array.fill(n)(c.uint7())
      val subs = new Array[Array[Byte]](n)
      var j = 0
      while (j < n) {
        subs(j) = decode(new Reader(c.take(clens(j))), (ulen - j + n - 1) / n)
        j += 1
      }
      val out = new Array[Byte](ulen)
      var i = 0
      while (i < ulen) { out(i) = subs(i % n)(i / n); i += 1 }
      out
    }

    private def decodePlain(c: Reader, len: Int, order1: Boolean): Array[Byte] = {
      val out = new Array[Byte](len)
      if (len == 0) return out
      val rc = new RangeDecoder(c)
      if (!order1) {
        val m = new Model(256)
        var i = 0
        while (i < len) { out(i) = m.decode(rc).toByte; i += 1 }
      } else {
        val ms = Array.fill(256)(new Model(256))
        var ctx = 0
        var i = 0
        while (i < len) {
          val s = ms(ctx).decode(rc)
          out(i) = s.toByte
          ctx = s
          i += 1
        }
      }
      out
    }

    /** RLE mode: literals through the byte model(s), then the run length
      * as base-255 continuation parts (part == 255 ⇒ more follows)
      * through the literal's per-symbol run model. */
    private def decodeRle(c: Reader, len: Int, order1: Boolean): Array[Byte] = {
      val out = new Array[Byte](len)
      if (len == 0) return out
      val rc = new RangeDecoder(c)
      val lit = Array.fill(if (order1) 256 else 1)(new Model(256))
      val runs = Array.fill(256)(new Model(256))
      var ctx = 0
      var i = 0
      while (i < len) {
        val s = lit(if (order1) ctx else 0).decode(rc)
        var run = 0
        var part = runs(s).decode(rc)
        run = part
        while (part == 255) { part = runs(s).decode(rc); run += part }
        require(i + run + 1 <= len, s"arith RLE run overruns $len")
        var r = 0
        while (r <= run) { out(i) = s.toByte; i += 1; r += 1 }
        ctx = s
      }
      out
    }

    private def unpackShared(packed: Array[Byte], syms: Array[Byte], ulen: Int): Array[Byte] = {
      val out = new Array[Byte](ulen)
      val nsym = syms.length
      var i = 0
      if (nsym <= 1) {
        require(nsym == 1 || ulen == 0, "pack of zero symbols with output")
        while (i < ulen) { out(i) = syms(0); i += 1 }
      } else if (nsym == 2) {
        while (i < ulen) { out(i) = syms((packed(i >> 3) >> (i & 7)) & 1); i += 1 }
      } else if (nsym <= 4) {
        while (i < ulen) { out(i) = syms((packed(i >> 2) >> (2 * (i & 3))) & 3); i += 1 }
      } else {
        while (i < ulen) { out(i) = syms((packed(i >> 1) >> (4 * (i & 1))) & 15); i += 1 }
      }
      out
    }

    def encode(data: Array[Byte], flags: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length / 2 + 64)
      out.write(flags)
      if ((flags & FlagNoSz) == 0) writeUint7(out, data.length)
      if ((flags & FlagStripe) != 0) {
        require((flags & ~(FlagStripe | FlagNoSz | FlagOrder1)) == 0,
          "stripe composes only with the order flag on the sub-streams")
        val n = 4
        out.write(n)
        val subs = Array.tabulate(n) { j =>
          val subLen = (data.length - j + n - 1) / n
          val sub = new Array[Byte](subLen)
          var i = 0
          while (i < subLen) { sub(i) = data(i * n + j); i += 1 }
          encode(sub, (flags & FlagOrder1) | FlagNoSz)
        }
        subs.foreach(s => writeUint7(out, s.length))
        subs.foreach(out.write)
        return out.toByteArray
      }
      var payload = data
      if ((flags & FlagPack) != 0) {
        val present = (0 until 256).filter(s => data.exists(b => (b & 0xff) == s))
        require(present.length <= 16,
          s"pack needs <= 16 distinct symbols, got ${present.length}")
        val index = new Array[Int](256)
        present.zipWithIndex.foreach { case (s, i) => index(s) = i }
        out.write(present.length)
        present.foreach(out.write)
        payload = packShared(data, index, present.length)
        writeUint7(out, payload.length)
      }
      if ((flags & FlagCat) != 0) out.write(payload)
      else if ((flags & FlagExt) != 0) {
        val bz = new ByteArrayOutputStream()
        val z = new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorOutputStream(bz)
        z.write(payload); z.close()
        out.write(bz.toByteArray)
      } else if ((flags & FlagRle) != 0)
        out.write(encodeRle(payload, (flags & FlagOrder1) != 0))
      else out.write(encodePlain(payload, (flags & FlagOrder1) != 0))
      out.toByteArray
    }

    private def packShared(data: Array[Byte], index: Array[Int], nsym: Int): Array[Byte] = {
      if (nsym <= 1) return new Array[Byte](0)
      val per = if (nsym == 2) 8 else if (nsym <= 4) 4 else 2
      val bits = if (nsym == 2) 1 else if (nsym <= 4) 2 else 4
      val out = new Array[Byte]((data.length + per - 1) / per)
      var i = 0
      while (i < data.length) {
        out(i / per) = (out(i / per) |
          (index(data(i) & 0xff) << (bits * (i % per)))).toByte
        i += 1
      }
      out
    }

    private def encodePlain(data: Array[Byte], order1: Boolean): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length / 2 + 64)
      if (data.isEmpty) return out.toByteArray
      val rc = new RangeEncoder(out)
      if (!order1) {
        val m = new Model(256)
        var i = 0
        while (i < data.length) { m.encode(rc, data(i) & 0xff); i += 1 }
      } else {
        val ms = Array.fill(256)(new Model(256))
        var ctx = 0
        var i = 0
        while (i < data.length) {
          val s = data(i) & 0xff
          ms(ctx).encode(rc, s)
          ctx = s
          i += 1
        }
      }
      rc.finish()
      out.toByteArray
    }

    private def encodeRle(data: Array[Byte], order1: Boolean): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length / 2 + 64)
      if (data.isEmpty) return out.toByteArray
      val rc = new RangeEncoder(out)
      val lit = Array.fill(if (order1) 256 else 1)(new Model(256))
      val runs = Array.fill(256)(new Model(256))
      var ctx = 0
      var i = 0
      while (i < data.length) {
        val s = data(i) & 0xff
        var j = i + 1
        while (j < data.length && (data(j) & 0xff) == s) j += 1
        var run = j - i - 1
        lit(if (order1) ctx else 0).encode(rc, s)
        var part = math.min(run, 255)
        runs(s).encode(rc, part)
        while (part == 255) {
          run -= 255
          part = math.min(run, 255)
          runs(s).encode(rc, part)
        }
        ctx = s
        i = j
      }
      rc.finish()
      out.toByteArray
    }
  }

  // ========================================================== fqzcomp
  /** fqzcomp quality codec (CRAM 3.1 block method 7): per-base adaptive
    * arithmetic coding of quality values under a 16-bit context built
    * from quality history, in-read position, delta count and selector —
    * the published `fqz_update_ctx` recurrence. The stream is the
    * version byte (5), global flags, the parameter set(s) (context
    * seeds, bit allocations, qmap/qtab/ptab/dtab tables run-length
    * encoded as successive-value run counts), then one range-coded
    * payload: per read, optional selector / 4-byte length / reversal /
    * dedup-flag symbols, then the quality symbols. Total output size
    * comes from the enclosing CRAM block header (the stream itself
    * carries no length). */
  object FqzComp {
    private val GFlagMultiParam = 1
    private val GFlagHaveSTab = 2
    private val GFlagDoRev = 4
    private val PFlagDoDedup = 2
    private val PFlagDoLen = 4
    private val PFlagDoSel = 8
    private val PFlagHaveQMap = 16
    private val PFlagHavePTab = 32
    private val PFlagHaveDTab = 64
    private val PFlagHaveQTab = 128

    private case class Params(context: Int, pflags: Int, maxSym: Int,
        qbits: Int, qshift: Int, qloc: Int, sloc: Int, ploc: Int, dloc: Int,
        qmap: Array[Int], qtab: Array[Int], ptab: Array[Int], dtab: Array[Int]) {
      def haveQMap: Boolean = (pflags & PFlagHaveQMap) != 0
      def doDedup: Boolean = (pflags & PFlagDoDedup) != 0
      def doLen: Boolean = (pflags & PFlagDoLen) != 0
      def doSel: Boolean = (pflags & PFlagDoSel) != 0
      def havePTab: Boolean = (pflags & PFlagHavePTab) != 0
      def haveDTab: Boolean = (pflags & PFlagHaveDTab) != 0
    }

    /** Run-length array codec: entry runs for successive values
      * 0, 1, 2, … with 255-continuation on each run count. */
    private def readArray(c: Reader, size: Int): Array[Int] = {
      val a = new Array[Int](size)
      var i = 0
      var v = 0
      while (i < size) {
        var run = 0
        var r = 0
        do { r = c.u8(); run += r } while (r == 255)
        var k = 0
        while (k < run) {
          require(i < size, s"fqzcomp table run overflows $size entries")
          a(i) = v; i += 1; k += 1
        }
        v += 1
      }
      a
    }

    private def writeArray(out: ByteArrayOutputStream, a: Array[Int]): Unit = {
      var i = 0
      var v = 0
      while (i < a.length) {
        var run = 0
        while (i + run < a.length && a(i + run) == v) run += 1
        var left = run
        while (left >= 255) { out.write(255); left -= 255 }
        out.write(left)
        if (left == 255) out.write(0)
        i += run
        v += 1
      }
    }

    private def identity(n: Int): Array[Int] = Array.tabulate(n)(i => i)

    private def readParams(c: Reader): Params = {
      val context = c.u8() | (c.u8() << 8)
      val pflags = c.u8()
      val maxSym = c.u8()
      var x = c.u8()
      val qbits = x >> 4; val qshift = x & 15
      x = c.u8()
      val qloc = x >> 4; val sloc = x & 15
      x = c.u8()
      val ploc = x >> 4; val dloc = x & 15
      val qmap =
        if ((pflags & PFlagHaveQMap) != 0) Array.fill(maxSym + 1)(c.u8())
        else null
      val qtab =
        if ((pflags & PFlagHaveQTab) != 0) readArray(c, 256) else identity(256)
      val ptab =
        if ((pflags & PFlagHavePTab) != 0) readArray(c, 1024) else null
      val dtab =
        if ((pflags & PFlagHaveDTab) != 0) readArray(c, 256) else null
      Params(context, pflags, maxSym, qbits, qshift, qloc, sloc, ploc, dloc,
        qmap, qtab, ptab, dtab)
    }

    /** The published context recurrence: quality history under
      * qbits/qshift at qloc, bucketed position at ploc, bucketed delta
      * at dloc, selector at sloc, 16-bit wrap. */
    private final class State {
      var qctx = 0
      var p = 0 // bases left in the current read
      var delta = 0
      var prevQ = 0
      var sel = 0
      var len = 0
    }

    private def updateCtx(pr: Params, st: State, q: Int): Int = {
      var last = pr.context
      st.qctx = (st.qctx << pr.qshift) + pr.qtab(q)
      last += (st.qctx & ((1 << pr.qbits) - 1)) << pr.qloc
      if (pr.havePTab)
        last += pr.ptab(math.min(st.p, 1023)) << pr.ploc
      if (pr.haveDTab) {
        last += pr.dtab(math.min(st.delta, 255)) << pr.dloc
        if (st.prevQ != q) st.delta += 1
        st.prevQ = q
      }
      if (pr.doSel) last += st.sel << pr.sloc
      st.p -= 1
      last & 0xffff
    }

    def decode(d: Array[Byte], expected: Int): Array[Byte] = {
      require(expected >= 0, "fqzcomp needs the block's raw size")
      val c = new Reader(d)
      val vers = c.u8()
      require(vers == 5, s"fqzcomp version $vers (this reader speaks v5)")
      val gflags = c.u8()
      val nparam = if ((gflags & GFlagMultiParam) != 0) c.u8() else 1
      var maxSel = nparam - 1
      val stab =
        if ((gflags & GFlagHaveSTab) != 0) { maxSel = c.u8(); readArray(c, 256) }
        else identity(256)
      val params = Array.fill(nparam)(readParams(c))
      val maxSymAll = params.map(_.maxSym).max
      val rc = new Arith.RangeDecoder(c)
      val qualModels = new Array[Arith.Model](1 << 16)
      def qm(ctx: Int): Arith.Model = {
        if (qualModels(ctx) == null) qualModels(ctx) = new Arith.Model(maxSymAll + 1)
        qualModels(ctx)
      }
      val lenModels = Array.fill(4)(new Arith.Model(256))
      val revModel = new Arith.Model(2)
      val dupModel = new Arith.Model(2)
      val selModel = new Arith.Model(maxSel + 1)
      val out = new Array[Byte](expected)
      val recStarts = collection.mutable.ArrayBuffer.empty[Int]
      val recRev = collection.mutable.ArrayBuffer.empty[Boolean]
      val st = new State
      var pr = params(0)
      var ctx = 0
      var lastLen = 0
      var i = 0
      while (i < expected) {
        if (st.p == 0) {
          // New record.
          if (maxSel > 0 || (gflags & GFlagHaveSTab) != 0) {
            st.sel = selModel.decode(rc)
            pr = params(stab(st.sel))
          } else { st.sel = 0; pr = params(0) }
          val len =
            if (pr.doLen || recStarts.isEmpty) {
              val l = lenModels(0).decode(rc) | (lenModels(1).decode(rc) << 8) |
                (lenModels(2).decode(rc) << 16) | (lenModels(3).decode(rc) << 24)
              lastLen = l; l
            } else lastLen
          require(len > 0 && i + len <= expected,
            s"fqzcomp read length $len overruns the block ($i of $expected)")
          val rev = (gflags & GFlagDoRev) != 0 && revModel.decode(rc) == 1
          recStarts += i
          recRev += rev
          st.len = len
          st.p = len
          st.qctx = 0; st.delta = 0; st.prevQ = 0
          ctx = pr.context & 0xffff
          if (pr.doDedup && recStarts.length > 1 && dupModel.decode(rc) == 1) {
            val prevStart = recStarts(recStarts.length - 2)
            require(i - prevStart >= len, "fqzcomp dedup against a shorter read")
            System.arraycopy(out, i - len, out, i, len)
            i += len
            st.p = 0
          }
        }
        if (st.p > 0) {
          val q = qm(ctx).decode(rc)
          out(i) = (if (pr.haveQMap) pr.qmap(q) else q).toByte
          ctx = updateCtx(pr, st, q)
          i += 1
        }
      }
      // Reversal flags apply at the end, whole reads flipped in place.
      var r = 0
      while (r < recStarts.length) {
        if (recRev(r)) {
          val s = recStarts(r)
          val e = (if (r + 1 < recStarts.length) recStarts(r + 1) else expected) - 1
          var a = s; var b = e
          while (a < b) { val t = out(a); out(a) = out(b); out(b) = t; a += 1; b -= 1 }
        }
        r += 1
      }
      out
    }

    /** Encode `quals` split at `lens` boundaries — the CRAM QS series
      * payload. Single parameter set; the quality alphabet rides qmap,
      * varying lengths ride DO_LEN, context = 8 bits of quality history
      * + 7 bucketed position bits (the classic fqzcomp shape). */
    def encode(quals: Array[Byte], lens: Array[Int]): Array[Byte] = {
      require(lens.sum == quals.length, "fqzcomp lens do not tile the block")
      val out = new ByteArrayOutputStream(quals.length / 2 + 256)
      out.write(5) // version
      out.write(0) // gflags: single param, no stab, no reversal
      // Parameter set: qmap over the observed alphabet, qbits=8/qshift=4
      // history at qloc 0, 64-bucket position table at ploc 8.
      val present = (0 until 256).filter(s => quals.exists(b => (b & 0xff) == s))
      val maxSym = present.length - 1
      val qIndex = new Array[Int](256)
      present.zipWithIndex.foreach { case (s, i) => qIndex(s) = i }
      val ptab = Array.tabulate(1024)(p => math.min(p, 127) >> 1)
      val pflags = PFlagDoLen | PFlagHaveQMap | PFlagHavePTab
      val pr = Params(context = 0, pflags = pflags, maxSym = maxSym,
        qbits = 8, qshift = 4, qloc = 0, sloc = 15, ploc = 8, dloc = 15,
        qmap = present.toArray, qtab = identity(256), ptab = ptab, dtab = null)
      out.write(pr.context & 0xff); out.write((pr.context >> 8) & 0xff)
      out.write(pr.pflags)
      out.write(pr.maxSym)
      out.write((pr.qbits << 4) | pr.qshift)
      out.write((pr.qloc << 4) | pr.sloc)
      out.write((pr.ploc << 4) | pr.dloc)
      pr.qmap.foreach(out.write)
      writeArray(out, pr.ptab)
      val rc = new Arith.RangeEncoder(out)
      val qualModels = new Array[Arith.Model](1 << 16)
      def qm(ctx: Int): Arith.Model = {
        if (qualModels(ctx) == null) qualModels(ctx) = new Arith.Model(maxSym + 1)
        qualModels(ctx)
      }
      val lenModels = Array.fill(4)(new Arith.Model(256))
      val st = new State
      var i = 0
      lens.foreach { len =>
        require(len > 0, "fqzcomp zero-length read")
        lenModels(0).encode(rc, len & 0xff)
        lenModels(1).encode(rc, (len >> 8) & 0xff)
        lenModels(2).encode(rc, (len >> 16) & 0xff)
        lenModels(3).encode(rc, (len >> 24) & 0xff)
        st.p = len; st.qctx = 0; st.delta = 0; st.prevQ = 0
        var ctx = pr.context & 0xffff
        var k = 0
        while (k < len) {
          val q = qIndex(quals(i) & 0xff)
          qm(ctx).encode(rc, q)
          ctx = updateCtx(pr, st, q)
          i += 1; k += 1
        }
      }
      rc.finish()
      out.toByteArray
    }
  }

  // ================================================== name tokeniser
  /** CRAM 3.1 name tokeniser (block method 8): names fragment into
    * typed tokens (alpha runs, digit runs with/without leading zeros,
    * single chars, separators), aligned by token position against a
    * previous name, so each (position, type) pair forms its own highly
    * repetitive byte stream — each compressed independently with rANS
    * Nx16 or the arithmetic coder. Stream head: uint7 uncompressed
    * size, uint7 name count, one use-arith byte; then per-stream
    * `[descriptor byte | uint7 clen | payload]` where the descriptor is
    * `(new-position << 7) | (dup << 6) | token-type`. Token values
    * recorded per position feed MATCH (same token as the previous name)
    * and DELTA (previous numeric value + stored byte) references; DIFF
    * distance 0 marks a fresh reference name. Names decode
    * '\n'-separated (the CRAM RN series separator). */
  object NameTok {
    // Token types, in stream-descriptor order.
    private val TType = 0
    private val TAlpha = 1
    private val TChar = 2
    private val TDZLen = 3
    private val TDigits0 = 4
    private val TDup = 5
    private val TDiff = 6
    private val TDigits = 7
    private val TDDelta = 8
    private val TDDelta0 = 9
    private val TMatch = 10
    private val TNop = 11
    private val TEnd = 12
    private val NTypes = 13
    private val MaxTokens = 128

    def decode(d: Array[Byte], expected: Int): Array[Byte] = {
      val c = new Reader(d)
      val ulen = c.uint7()
      require(expected < 0 || ulen == expected,
        s"name tokeniser declares $ulen bytes, block header $expected")
      val nnames = c.uint7()
      // Flags byte: bit 0 selects the arithmetic coder over rANS Nx16 for
      // the token sub-streams, bit 1 the NUL separator (the CRAM RN
      // series is BYTE_ARRAY_STOP(NUL); '\n' is the standalone profile).
      val tokFlags = c.u8()
      require((tokFlags & ~3) == 0, s"name tokeniser flags $tokFlags")
      val useArith = tokFlags & 1
      val sep = if ((tokFlags & 2) != 0) '\u0000' else '\n'
      // (position, type) -> decoded byte stream.
      val streams = Array.ofDim[Reader](MaxTokens, NTypes)
      var pos = -1
      while (c.hasMore) {
        val desc = c.u8()
        val tNew = (desc & 0x80) != 0
        val tDup = (desc & 0x40) != 0
        val ttype = desc & 0x3f
        require(ttype < NTypes, s"name tokeniser stream type $ttype")
        if (tNew || pos < 0) pos += 1
        require(pos < MaxTokens, "name tokeniser exceeds the token-position cap")
        if (tDup) {
          // Duplicate of an earlier stream's bytes (cheap cross-reference).
          val dp = c.u8(); val dt = c.u8()
          require(dp <= pos && streams(dp)(dt) != null,
            s"name tokeniser dup of missing stream ($dp,$dt)")
          streams(pos)(ttype) = new Reader(streams(dp)(dt).d)
        } else {
          val clen = c.uint7()
          val comp = c.take(clen)
          val raw =
            if (useArith == 1) Arith.decode(comp, -1)
            else RansNx16.decode(comp, -1)
          streams(pos)(ttype) = new Reader(raw)
        }
      }
      def su(p: Int, t: Int): Reader = {
        val s = streams(p)(t)
        require(s != null, s"name tokeniser missing stream ($p,$t)")
        s
      }
      def leInt(r: Reader): Long = r.le32()
      val names = new Array[String](nnames)
      // Per-name token values for MATCH/DELTA references.
      val tokVal = Array.ofDim[String](nnames, MaxTokens)
      val tokNum = Array.ofDim[Long](nnames, MaxTokens)
      val sb = new java.lang.StringBuilder(ulen)
      var n = 0
      while (n < nnames) {
        val t0 = su(0, TType).u8()
        require(t0 == TDiff || t0 == TDup, s"name $n opens with token $t0")
        val dist = leInt(su(0, t0)).toInt
        val ref = if (dist == 0) -1 else n - dist
        require(dist == 0 || (ref >= 0 && ref < n),
          s"name $n references name at distance $dist")
        if (t0 == TDup) {
          names(n) = names(ref)
          var t = 1
          while (t < MaxTokens) {
            tokVal(n)(t) = tokVal(ref)(t); tokNum(n)(t) = tokNum(ref)(t); t += 1
          }
        } else {
          val name = new java.lang.StringBuilder(32)
          var t = 1
          var done = false
          while (!done) {
            require(t < MaxTokens, "name exceeds the token cap")
            val ty = su(t, TType).u8()
            ty match {
              case TChar =>
                val ch = su(t, TChar).u8()
                tokVal(n)(t) = ch.toChar.toString; tokNum(n)(t) = ch
                name.append(ch.toChar)
              case TAlpha =>
                val r = su(t, TAlpha)
                val s = new java.lang.StringBuilder(8)
                var b = r.u8()
                while (b != 0) { s.append(b.toChar); b = r.u8() }
                tokVal(n)(t) = s.toString
                name.append(s)
              case TDigits =>
                val v = leInt(su(t, TDigits))
                tokVal(n)(t) = v.toString; tokNum(n)(t) = v
                name.append(v)
              case TDigits0 =>
                val v = leInt(su(t, TDigits0))
                val w = su(t, TDZLen).u8()
                val s = padded(v, w)
                tokVal(n)(t) = s; tokNum(n)(t) = v
                name.append(s)
              case TDDelta =>
                require(ref >= 0, s"name $n deltas against no reference")
                val dv = su(t, TDDelta).u8()
                val v = tokNum(ref)(t) + dv
                tokVal(n)(t) = v.toString; tokNum(n)(t) = v
                name.append(v)
              case TDDelta0 =>
                require(ref >= 0, s"name $n deltas against no reference")
                val dv = su(t, TDDelta0).u8()
                val v = tokNum(ref)(t) + dv
                val s = padded(v, tokVal(ref)(t).length)
                tokVal(n)(t) = s; tokNum(n)(t) = v
                name.append(s)
              case TMatch =>
                require(ref >= 0 && tokVal(ref)(t) != null,
                  s"name $n matches against no reference token")
                tokVal(n)(t) = tokVal(ref)(t); tokNum(n)(t) = tokNum(ref)(t)
                name.append(tokVal(ref)(t))
              case TNop => ()
              case TEnd => done = true
              case other => sys.error(s"name tokeniser token type $other")
            }
            t += 1
          }
          names(n) = name.toString
        }
        sb.append(names(n)).append(sep)
        n += 1
      }
      val out = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(out.length == ulen,
        s"name tokeniser produced ${out.length} of $ulen bytes")
      out
    }

    private def padded(v: Long, width: Int): String = {
      val s = v.toString
      if (s.length >= width) s
      else ("0" * (width - s.length)) + s
    }

    // ------------------------------------------------------------ encode
    private sealed trait Tok
    private case class Alpha(s: String) extends Tok
    private case class Digits(v: Long, s: String) extends Tok
    private case class Chr(c: Char) extends Tok

    private def tokenize(name: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < name.length) {
        val ch = name.charAt(i)
        if (ch.isDigit) {
          var j = i
          while (j < name.length && name.charAt(j).isDigit) j += 1
          val s = name.substring(i, j)
          // Cap numeric tokens at 9 digits so the u32 stream holds them.
          if (s.length <= 9) { out += Digits(s.toLong, s); i = j }
          else { out += Chr(ch); i += 1 }
        } else if (ch.isLetter) {
          var j = i
          while (j < name.length && name.charAt(j).isLetter) j += 1
          out += Alpha(name.substring(i, j))
          i = j
        } else {
          out += Chr(ch)
          i += 1
        }
      }
      out.result()
    }

    /** Encode a separator-terminated name block ('\n' or NUL, detected
      * from the terminator byte). Reference distance is always 1 (the
      * previous name) when token-compatible, 0 (fresh) otherwise; exact
      * repeats emit DUP. */
    def encode(namesBlock: Array[Byte], useArith: Boolean = false): Array[Byte] = {
      val text = new String(namesBlock, java.nio.charset.StandardCharsets.UTF_8)
      val nulSep = text.nonEmpty && text.last == '\u0000'
      val sep = if (nulSep) '\u0000' else '\n'
      require(text.isEmpty || text.last == sep,
        "name block must be separator-terminated")
      val names = if (text.isEmpty) Array.empty[String] else text.init.split(sep)
      val buf = Array.ofDim[ByteArrayOutputStream](MaxTokens, NTypes)
      def s(p: Int, t: Int): ByteArrayOutputStream = {
        if (buf(p)(t) == null) buf(p)(t) = new ByteArrayOutputStream()
        buf(p)(t)
      }
      def le32(o: ByteArrayOutputStream, v: Long): Unit = {
        o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
      }
      var prevToks: Vector[Tok] = null
      var prevName: String = null
      var n = 0
      while (n < names.length) {
        val name = names(n)
        val toks = tokenize(name)
        require(toks.length + 2 <= MaxTokens,
          s"name '$name' fragments into too many tokens")
        if (prevName != null && name == prevName) {
          s(0, TType).write(TDup)
          le32(s(0, TDup), 1L)
        } else {
          val comparable = prevToks != null && prevToks.length == toks.length &&
            prevToks.zip(toks).forall {
              case (Alpha(_), Alpha(_)) => true
              case (Digits(_, _), Digits(_, _)) => true
              case (Chr(_), Chr(_)) => true
              case _ => false
            }
          s(0, TType).write(TDiff)
          le32(s(0, TDiff), if (comparable) 1L else 0L)
          val ref = if (comparable) prevToks else null
          var t = 1
          toks.zipWithIndex.foreach { case (tok, ti) =>
            t = ti + 1
            tok match {
              case Alpha(a) =>
                (if (ref != null) ref(ti) else null) match {
                  case Alpha(pa) if pa == a => s(t, TType).write(TMatch)
                  case _ =>
                    s(t, TType).write(TAlpha)
                    a.foreach(ch => s(t, TAlpha).write(ch.toInt))
                    s(t, TAlpha).write(0)
                }
              case Chr(chv) =>
                (if (ref != null) ref(ti) else null) match {
                  case Chr(pc) if pc == chv => s(t, TType).write(TMatch)
                  case _ =>
                    s(t, TType).write(TChar)
                    s(t, TChar).write(chv.toInt)
                }
              case Digits(v, str) =>
                val zeroPad = str.length > 1 && str.charAt(0) == '0'
                val refTok = if (ref != null) ref(ti) else null
                refTok match {
                  case Digits(pv, ps) if pv == v && ps == str =>
                    s(t, TType).write(TMatch)
                  case Digits(pv, _) if !zeroPad && v >= pv && v - pv < 256 =>
                    s(t, TType).write(TDDelta)
                    s(t, TDDelta).write((v - pv).toInt)
                  case Digits(pv, ps) if zeroPad && v >= pv && v - pv < 256 &&
                      ps.length == str.length =>
                    s(t, TType).write(TDDelta0)
                    s(t, TDDelta0).write((v - pv).toInt)
                  case _ =>
                    if (zeroPad) {
                      s(t, TType).write(TDigits0)
                      le32(s(t, TDigits0), v)
                      s(t, TDZLen).write(str.length)
                    } else {
                      s(t, TType).write(TDigits)
                      le32(s(t, TDigits), v)
                    }
                }
            }
          }
          s(toks.length + 1, TType).write(TEnd)
        }
        prevToks = toks
        prevName = name
        n += 1
      }
      val out = new ByteArrayOutputStream(namesBlock.length / 2 + 64)
      writeUint7(out, namesBlock.length)
      writeUint7(out, names.length)
      out.write((if (useArith) 1 else 0) | (if (nulSep) 2 else 0))
      var p = 0
      while (p < MaxTokens) {
        var t = 0
        var firstAtPos = true
        while (t < NTypes) {
          if (buf(p)(t) != null && (buf(p)(t).size() > 0 || t == TType)) {
            val raw = buf(p)(t).toByteArray
            val comp =
              if (useArith) Arith.encode(raw, 0)
              else RansNx16.encode(raw, 0)
            out.write((if (firstAtPos) 0x80 else 0) | t)
            writeUint7(out, comp.length)
            out.write(comp)
            firstAtPos = false
          }
          t += 1
        }
        p += 1
      }
      out.toByteArray
    }
  }
}
