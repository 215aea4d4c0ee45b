package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** BMP codec against hand-laid-out bytes from the public spec (not via the
  * encoder, so an encoder/decoder bug pair can't cancel out). */
class BmpSpec extends AnyFunSuite {

  private def le32(v: Int): Seq[Byte] =
    Seq(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
  private def le16(v: Int): Seq[Byte] = Seq(v, v >> 8).map(_.toByte)

  /** 2x2 24-bit bottom-up BMP laid out field by field per the spec:
    * logical top row = red, green; bottom row = blue, white. */
  private def handBmp24(height: Int): Array[Byte] = {
    val rowBytes = 8 // 2 px * 3 B = 6, padded to 8
    val header =
      Seq[Byte]('B', 'M') ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(height) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(rowBytes * 2) ++ le32(2835) ++ le32(2835) ++
        le32(0) ++ le32(0)
    // BGR triplets; bottom-up files store the LAST logical row first
    val rowTop = Seq[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)  // red, green
    val rowBot = Seq[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0) // blue, white
    val data = if (height > 0) rowBot ++ rowTop else rowTop ++ rowBot
    (header ++ data).toArray
  }

  test("24-bit bottom-up decode: BGR order, row flip, integer luma") {
    val img = Bmp.decode(handBmp24(2))
    assert(img.width == 2 && img.height == 2)
    // luma(255R) = 76, luma(255G) = 149, luma(255B) = 29, white = 255
    assert(img.gray.toSeq == Seq(76, 149, 29, 255))
  }

  test("24-bit top-down decode (negative height)") {
    val img = Bmp.decode(handBmp24(-2))
    assert(img.width == 2 && img.height == 2)
    assert(img.gray.toSeq == Seq(76, 149, 29, 255))
  }

  test("8-bit paletted decode") {
    // 3x2, palette entry i = gray i, logical rows [10,20,30] / [40,50,60]
    val rowBytes = 4 // 3 px padded to 4
    val palette = (0 until 256).flatMap(i => Seq[Byte](i.toByte, i.toByte, i.toByte, 0))
    val header =
      Seq[Byte]('B', 'M') ++ le32(54 + 1024 + 8) ++ le32(0) ++ le32(54 + 1024) ++
        le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(8) ++
        le32(0) ++ le32(rowBytes * 2) ++ le32(2835) ++ le32(2835) ++
        le32(256) ++ le32(0)
    val data = Seq[Byte](40, 50, 60, 0) ++ Seq[Byte](10, 20, 30, 0) // bottom-up
    val img = Bmp.decode((header ++ palette ++ data).toArray)
    assert(img.width == 3 && img.height == 2)
    assert(img.gray.toSeq == Seq(10, 20, 30, 40, 50, 60))
  }

  test("encode->decode round trip preserves gray exactly (incl. padding widths)") {
    val rnd = new scala.util.Random(42)
    for (w <- Seq(1, 2, 3, 4, 5, 7, 16, 33); h <- Seq(1, 2, 5, 9)) {
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val img = Bmp.decode(Bmp.encode(w, h, px))
      assert(img.width == w && img.height == h)
      assert(img.gray.toSeq == px.toSeq, s"mismatch at ${w}x$h")
    }
  }

  test("malformed payloads fail loudly, not silently") {
    assert(!Bmp.isBmp(null))
    assert(!Bmp.isBmp(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Bmp.decode("not a bmp at all....................................................".getBytes))
    intercept[IllegalArgumentException](Bmp.decode(Array[Byte]('B', 'M', 1)))
    // truncated pixel data
    val ok = Bmp.encode(4, 4, Array.fill(16)(100))
    intercept[IllegalArgumentException](Bmp.decode(ok.take(ok.length - 8)))
    // unsupported compression flag
    val rle = ok.clone(); rle(30) = 1
    intercept[IllegalArgumentException](Bmp.decode(rle))
  }
}
