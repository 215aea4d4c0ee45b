package graft.sources

/** BMP (Windows bitmap) codec — pure-JVM, from the public BMP/DIB file
  * format specification (BITMAPFILEHEADER + BITMAPINFOHEADER as documented
  * in the Windows SDK / Wikipedia "BMP file format"). No external image
  * library: this is the one "real" codec behind
  * [[graft.operators.MultimodalOps.extractImageFeatures]] (other formats
  * remain stubbed — this container ships no media libraries).
  *
  * Supported on decode: uncompressed (BI_RGB) 24-bit BGR and 8-bit
  * paletted, bottom-up (positive height) and top-down (negative height),
  * with the spec's 4-byte row padding. Encode always writes 24-bit
  * bottom-up BI_RGB.
  *
  * All header fields are little-endian per the spec.
  */
object Bmp {

  /** A decoded image: row-major top-to-bottom grayscale, one Int in
    * [0,255] per pixel. Gray = integer ITU-R 601 luma
    * (299*R + 587*G + 114*B) / 1000 — exact integer arithmetic so
    * features derived from it are bit-reproducible anywhere. */
  final case class Image(width: Int, height: Int, gray: Array[Int])

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M'

  @inline private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Row stride in bytes: pixel bytes padded up to a 4-byte boundary. */
  @inline private def stride(width: Int, bitCount: Int): Int =
    ((width * bitCount + 31) / 32) * 4

  /** Decode a BMP payload to grayscale. Throws IllegalArgumentException on
    * malformed/unsupported payloads (callers that want a soft failure
    * should check [[isBmp]] and catch). */
  def decode(bytes: Array[Byte]): Image = {
    require(isBmp(bytes), "not a BMP payload (missing 'BM' magic)")
    require(bytes.length >= 54, s"truncated BMP: ${bytes.length} bytes")
    // BITMAPFILEHEADER: magic(2) size(4) reserved(4) dataOffset(4)
    val dataOffset = i32(bytes, 10)
    // BITMAPINFOHEADER starts at 14: size(4) width(4) height(4) planes(2)
    // bitCount(2) compression(4) ...
    val dibSize = i32(bytes, 14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize (need BITMAPINFOHEADER+)")
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val bitCount = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(compression == 0, s"unsupported compression $compression (only BI_RGB)")
    require(bitCount == 24 || bitCount == 8,
      s"unsupported bit depth $bitCount (only 8/24)")
    require(width > 0 && rawHeight != 0, s"bad dimensions ${width}x$rawHeight")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val rowBytes = stride(width, bitCount)
    require(dataOffset.toLong + rowBytes.toLong * height <= bytes.length,
      s"pixel data runs past payload end")

    // 8-bit payloads carry a palette between the DIB header and the pixel
    // data: colorsUsed entries (0 -> 2^8) of 4-byte BGRA quads
    val palette: Array[Int] =
      if (bitCount == 8) {
        val colorsUsed0 = i32(bytes, 46)
        val colorsUsed = if (colorsUsed0 == 0) 256 else colorsUsed0
        val palOff = 14 + dibSize
        require(palOff + 4 * colorsUsed <= dataOffset,
          "palette runs past pixel data offset")
        Array.tabulate(colorsUsed) { i =>
          val o = palOff + 4 * i
          val bB = bytes(o) & 0xff; val gB = bytes(o + 1) & 0xff
          val rB = bytes(o + 2) & 0xff
          (299 * rB + 587 * gB + 114 * bB) / 1000
        }
      } else null

    val out = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      // bottom-up files store the LAST image row first
      val srcRow = if (topDown) row else height - 1 - row
      val base = dataOffset + srcRow * rowBytes
      var x = 0
      while (x < width) {
        out(row * width + x) =
          if (bitCount == 24) {
            val o = base + 3 * x
            val bB = bytes(o) & 0xff; val gB = bytes(o + 1) & 0xff
            val rB = bytes(o + 2) & 0xff
            (299 * rB + 587 * gB + 114 * bB) / 1000
          } else {
            val idx = bytes(base + x) & 0xff
            if (idx < palette.length) palette(idx) else 0
          }
        x += 1
      }
      row += 1
    }
    Image(width, height, out)
  }

  /** Encode row-major top-to-bottom grayscale pixels (each in [0,255]) as
    * a 24-bit bottom-up BI_RGB BMP (gray -> B=G=R, so decode's integer
    * luma returns the input exactly). */
  def encode(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"need $width*$height=${width * height} pixels, got ${gray.length}")
    val rowBytes = stride(width, 24)
    val dataOffset = 54
    val size = dataOffset + rowBytes * height
    val b = new Array[Byte](size)
    def putU16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def putI32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putI32(2, size); putI32(10, dataOffset)
    putI32(14, 40)                       // BITMAPINFOHEADER
    putI32(18, width); putI32(22, height) // positive height = bottom-up
    putU16(26, 1)                        // planes
    putU16(28, 24)                       // bits per pixel
    putI32(30, 0)                        // BI_RGB
    putI32(34, rowBytes * height)        // image size
    putI32(38, 2835); putI32(42, 2835)   // 72 DPI in px/metre
    var row = 0
    while (row < height) {
      val base = dataOffset + (height - 1 - row) * rowBytes
      var x = 0
      while (x < width) {
        val g = (gray(row * width + x) & 0xff).toByte
        val o = base + 3 * x
        b(o) = g; b(o + 1) = g; b(o + 2) = g
        x += 1
      }
      row += 1
    }
    b
  }
}
