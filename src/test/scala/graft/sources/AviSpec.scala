package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** AVI codec against hand-laid-out bytes from the public AVI RIFF File
  * Reference (not via the encoder, so an encoder/decoder bug pair can't
  * cancel). */
class AviSpec extends AnyFunSuite {

  private def le32(v: Int): Seq[Byte] =
    Seq(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
  private def le16(v: Int): Seq[Byte] = Seq(v, v >> 8).map(_.toByte)
  private def ascii(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  private def avih(usPerFrame: Int, nFrames: Int, w: Int, h: Int): Seq[Byte] =
    ascii("avih") ++ le32(56) ++ le32(usPerFrame) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Seq.fill(16)(0.toByte)

  private def strh(fccType: String): Seq[Byte] =
    ascii("strh") ++ le32(56) ++ ascii(fccType) ++ ascii("DIB ") ++
      Seq.fill(48)(0.toByte)

  /** BITMAPINFOHEADER strf; negative h = top-down, palette appended. */
  private def strf(w: Int, h: Int, bits: Int,
      palette: Seq[(Int, Int, Int)] = Nil): Seq[Byte] = {
    val pal = palette.flatMap { case (r, g, b) =>
      Seq(b.toByte, g.toByte, r.toByte, 0.toByte) }
    ascii("strf") ++ le32(40 + pal.length) ++ le32(40) ++ le32(w) ++
      le32(h) ++ le16(1) ++ le16(bits) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(palette.length) ++ le32(0) ++ pal
  }

  private def list(listType: String, body: Seq[Byte]): Seq[Byte] =
    ascii("LIST") ++ le32(4 + body.length) ++ ascii(listType) ++ body

  private def chunk(id: String, body: Seq[Byte]): Seq[Byte] =
    ascii(id) ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Seq(0.toByte) else Nil)

  private def riffAvi(body: Seq[Byte]): Array[Byte] =
    (ascii("RIFF") ++ le32(4 + body.length) ++ ascii("AVI ") ++ body).toArray

  test("hand-laid 24-bit bottom-up AVI: two 2x2 frames, junk to skip") {
    // Frame pixels (BGR), bottom-up with stride 8 (2*3 -> pad to 8).
    // Frame 0 rows: bottom row first. Luma of (b,g,r):
    //   px(0,0)=(10,10,10)->10, px(1,0)=(0,0,100)->29 (299*100/1000)
    //   px(0,1)=(0,100,0)->58,  px(1,1)=(100,0,0)->11 (114*100/1000)
    val f0 = // stored bottom-up: row y=1 first
      Seq[Int](0, 100, 0, 100, 0, 0, 0, 0,       // y=1: (g=100), (b=100), pad
               10, 10, 10, 0, 0, 100, 0, 0)      // y=0: gray10, red100, pad
        .map(_.toByte)
    val f1 = Seq.fill(16)(255.toByte) // all white -> luma 255 everywhere
    val body =
      list("hdrl", avih(40000, 2, 2, 2) ++
        list("strl", strh("vids") ++ strf(2, 2, 24))) ++
      chunk("JUNK", Seq[Byte](1, 2, 3)) ++ // odd size: walker must align
      list("movi", chunk("00db", f0) ++ chunk("00db", f1)) ++
      chunk("idx1", le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val v = Avi.decode(riffAvi(body))
    assert(v.width == 2 && v.height == 2 && v.microSecPerFrame == 40000)
    assert(v.frames.length == 2)
    assert(v.frames(0).toSeq == Seq(10, 29, 58, 11))
    assert(v.frames(1).toSeq == Seq(255, 255, 255, 255))
  }

  test("hand-laid 8-bit paletted top-down frame, nested in a rec LIST") {
    // palette: 0 -> white(255), 1 -> red(74 = 299*250/1000)
    val pal = Seq((255, 255, 255), (250, 0, 0))
    // 3x1 top-down, stride 4: indices 1,0,1 + pad
    val f = Seq[Byte](1, 0, 1, 0)
    val body =
      list("hdrl", avih(1000, 1, 3, 1) ++
        list("strl", strh("vids") ++ strf(3, -1, 8, pal))) ++
      list("movi", list("rec ", chunk("00db", f)))
    val v = Avi.decode(riffAvi(body))
    assert(v.width == 3 && v.height == 1)
    assert(v.frames.length == 1)
    assert(v.frames(0).toSeq == Seq(74, 255, 74))
  }

  test("audio stream chunks are skipped; strf of 'auds' stream ignored") {
    val audsStrf = // a bogus strf that would fail vids validation
      ascii("strf") ++ le32(16) ++ Seq.fill(16)(7.toByte)
    val f = Seq.fill(8)(0.toByte) // 1x1 24-bit, stride 4... use 2x1: stride 8
    val body =
      list("hdrl", avih(1000, 1, 2, 1) ++
        list("strl", strh("vids") ++ strf(2, 1, 24)) ++
        list("strl", strh("auds") ++ audsStrf)) ++
      list("movi", chunk("01wb", Seq[Byte](9, 9, 9, 9)) ++ chunk("00db", f))
    val v = Avi.decode(riffAvi(body))
    assert(v.frames.length == 1)
    assert(v.frames(0).toSeq == Seq(0, 0))
  }

  test("encode->decode round trip preserves gray frames exactly") {
    val rnd = new scala.util.Random(11)
    for ((w, h, n) <- Seq((1, 1, 1), (3, 2, 4), (8, 5, 3), (7, 7, 2))) {
      val frames = Array.fill(n)(Array.fill(w * h)(rnd.nextInt(256)))
      val v = Avi.decode(Avi.encode(w, h, 33367, frames))
      assert(v.width == w && v.height == h && v.microSecPerFrame == 33367)
      assert(v.frames.length == n)
      frames.indices.foreach { i =>
        assert(v.frames(i).toSeq == frames(i).toSeq, s"frame $i of ${w}x$h")
      }
    }
  }

  test("malformed payloads fail loudly") {
    assert(!Avi.isAvi(null))
    assert(!Avi.isAvi("RIFFxxxxWAVE".getBytes))
    // frames but no vids strf
    val noFmt = riffAvi(list("movi",
      chunk("00db", Seq.fill(8)(0.toByte))))
    intercept[IllegalArgumentException](Avi.decode(noFmt))
    // truncated mid-frame
    val ok = Avi.encode(2, 2, 1000, Array(Array(1, 2, 3, 4)))
    intercept[IllegalArgumentException](Avi.decode(ok.take(ok.length - 4)))
    // compressed stream rejected
    val bad = ok.clone()
    // strf biCompression lives 16 bytes into the strf body; find it
    val strfOff = {
      var i = 0
      var at = -1
      while (at < 0 && i < bad.length - 4) {
        if (bad(i) == 's' && bad(i + 1) == 't' && bad(i + 2) == 'r' &&
          bad(i + 3) == 'f') at = i
        i += 1
      }
      at
    }
    bad(strfOff + 8 + 16) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Avi.decode(bad))
  }
}
