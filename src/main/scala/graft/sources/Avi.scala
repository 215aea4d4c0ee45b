package graft.sources

import scala.collection.mutable.ArrayBuffer

/** AVI (RIFF 'AVI ') container codec — pure-JVM, from the public AVI RIFF
  * File Reference (Microsoft "AVI RIFF File Reference" / OpenDML): RIFF
  * container with an 'hdrl' LIST (avih main header + one 'strl' per
  * stream), a 'movi' LIST carrying the frame chunks, and an optional
  * 'idx1' index. The "real" video codec behind
  * [[graft.operators.MultimodalOps.sampleFrames]] /
  * [[graft.operators.MultimodalOps.videoStats]] — compressed codecs
  * (cvid, mjpg, ...) remain out of scope (no media libraries in this
  * container; a frame is only meaningfully decodable when it is an
  * uncompressed DIB).
  *
  * Supported on decode: 'vids' streams with uncompressed BI_RGB DIB
  * frames ('##db' chunks), 24-bit BGR or 8-bit paletted, bottom-up or
  * top-down rows with the DIB 4-byte row padding, frames directly under
  * 'movi' or nested in 'rec ' LISTs; unknown chunks (idx1, JUNK, INFO,
  * audio '##wb', ...) are skipped word-aligned per the RIFF spec. Encode
  * writes 24-bit bottom-up BI_RGB frames from grayscale.
  *
  * Pixels are reduced to grayscale with the same exact-integer ITU-R 601
  * luma as [[Bmp]] ((299*R + 587*G + 114*B) / 1000) so derived features
  * are bit-reproducible anywhere.
  *
  * All fields little-endian per the spec.
  */
object Avi {

  /** Decoded video: per-frame row-major top-to-bottom grayscale (one Int
    * in [0,255] per pixel), plus the frame clock from the main header. */
  final case class Video(
      width: Int, height: Int, microSecPerFrame: Int,
      frames: Array[Array[Int]])

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  @inline private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  @inline private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** DIB row stride: pixel bytes padded up to a 4-byte boundary. */
  @inline private def stride(width: Int, bitCount: Int): Int =
    ((width * bitCount + 31) / 32) * 4

  /** Decode an AVI payload. Throws IllegalArgumentException on
    * malformed/unsupported payloads (callers wanting a soft failure check
    * [[isAvi]] and catch). */
  def decode(bytes: Array[Byte]): Video = {
    require(isAvi(bytes), "not an AVI payload (missing RIFF/'AVI ' magic)")
    var microSecPerFrame = 0
    var width = 0; var height = 0; var bitCount = 0; var topDown = false
    var palette: Array[Int] = null
    var haveVids = false      // the last strh seen was a 'vids' stream
    var haveFmt = false       // its strf was parsed
    val frames = ArrayBuffer.empty[Array[Int]]

    def decodeFrame(off: Int, size: Int): Array[Int] = {
      require(haveFmt, "frame chunk before the vids strf header")
      val rowBytes = stride(width, bitCount)
      require(rowBytes.toLong * height <= size,
        s"frame chunk too small: $size for ${width}x$height @$bitCount")
      val gray = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        var x = 0
        val ro = off + srcRow * rowBytes
        while (x < width) {
          gray(y * width + x) =
            if (bitCount == 24) {
              val po = ro + 3 * x
              val bB = bytes(po) & 0xff; val gB = bytes(po + 1) & 0xff
              val rB = bytes(po + 2) & 0xff
              (299 * rB + 587 * gB + 114 * bB) / 1000
            } else {
              val idx = bytes(ro + x) & 0xff
              require(idx < palette.length, s"palette index $idx out of range")
              palette(idx)
            }
          x += 1
        }
        y += 1
      }
      gray
    }

    // RIFF walk: LIST chunks recurse; leaf chunks dispatch on fourcc.
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(bytes, off)
        val size = i32(bytes, off + 4)
        require(size >= 0 && off + 8 + size <= end,
          s"chunk '$id' runs past its parent")
        if (id == "LIST") {
          require(size >= 4, "LIST chunk too small")
          val listType = fourcc(bytes, off + 8)
          walk(off + 12, off + 8 + size,
            listType == "movi" || (inMovi && listType == "rec "))
        } else id match {
          case "avih" =>
            // MainAVIHeader: usPerFrame(0) maxBytesPerSec(4) padding(8)
            // flags(12) totalFrames(16) initialFrames(20) streams(24)
            // suggestedBuffer(28) width(32) height(36) reserved[4]
            require(size >= 40, s"avih too small: $size")
            microSecPerFrame = i32(bytes, off + 8)
          case "strh" =>
            require(size >= 8, s"strh too small: $size")
            haveVids = fourcc(bytes, off + 8) == "vids"
          case "strf" if haveVids =>
            // BITMAPINFOHEADER: biSize(0) w(4) h(8) planes(12) bitCount(14)
            // compression(16) sizeImage(20) ... clrUsed(32)
            require(size >= 40, s"vids strf too small: $size")
            val biSize = i32(bytes, off + 8)
            width = i32(bytes, off + 12)
            val rawH = i32(bytes, off + 16)
            bitCount = u16(bytes, off + 22)
            val compression = i32(bytes, off + 24)
            require(compression == 0,
              s"unsupported compression $compression (only BI_RGB DIB)")
            require(bitCount == 24 || bitCount == 8,
              s"unsupported bit depth $bitCount (only 8/24)")
            require(width > 0 && rawH != 0, s"bad dimensions ${width}x$rawH")
            topDown = rawH < 0
            height = math.abs(rawH)
            if (bitCount == 8) {
              val clrUsed0 = i32(bytes, off + 40)
              val clrUsed = if (clrUsed0 == 0) 256 else clrUsed0
              val palOff = off + 8 + biSize
              require(palOff + 4 * clrUsed <= off + 8 + size,
                "palette runs past strf chunk")
              palette = Array.tabulate(clrUsed) { i =>
                val o = palOff + 4 * i
                val bB = bytes(o) & 0xff; val gB = bytes(o + 1) & 0xff
                val rB = bytes(o + 2) & 0xff
                (299 * rB + 587 * gB + 114 * bB) / 1000
              }
            }
            haveFmt = true
          case s if inMovi && s.length == 4 && s.substring(2) == "db" =>
            frames += decodeFrame(off + 8, size)
          case _ => // idx1, JUNK, INFO, audio '##wb', ... — skip
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
    }

    val riffSize = i32(bytes, 4)
    require(riffSize >= 4 && 8 + riffSize <= bytes.length,
      "RIFF size runs past payload end")
    walk(12, 8 + riffSize, inMovi = false)
    require(haveFmt, "missing vids strf header")
    Video(width, height, microSecPerFrame, frames.toArray)
  }

  /** Encode grayscale frames (row-major top-to-bottom, Ints in [0,255])
    * as an AVI with 24-bit bottom-up BI_RGB DIB frames (gray replicated
    * to B=G=R, so the decoder's luma returns the input exactly). */
  def encode(width: Int, height: Int, microSecPerFrame: Int,
      frames: Array[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    require(frames.forall(_.length == width * height),
      "every frame must be width*height pixels")
    val rowBytes = stride(width, 24)
    val frameSize = rowBytes * height
    // chunk sizes: avih 56, strh 56, strf 40 (all even; frameSize is a
    // multiple of 4 so no odd-padding anywhere)
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + frames.length * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val b = new Array[Byte](8 + riffSize)
    var o = 0
    def putStr(s: String): Unit = {
      var i = 0; while (i < s.length) { b(o + i) = s.charAt(i).toByte; i += 1 }
      o += s.length
    }
    def putU16(v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte; o += 2
    }
    def putI32(v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte; o += 4
    }
    putStr("RIFF"); putI32(riffSize); putStr("AVI ")
    putStr("LIST"); putI32(hdrlSize); putStr("hdrl")
    putStr("avih"); putI32(56)
    putI32(microSecPerFrame); putI32(frameSize * 25); putI32(0); putI32(0)
    putI32(frames.length); putI32(0); putI32(1); putI32(frameSize)
    putI32(width); putI32(height); putI32(0); putI32(0); putI32(0); putI32(0)
    putStr("LIST"); putI32(strlSize); putStr("strl")
    putStr("strh"); putI32(56)
    putStr("vids"); putStr("DIB "); putI32(0); putU16(0); putU16(0)
    putI32(0)                                  // initial frames
    putI32(math.max(1, microSecPerFrame))      // scale
    putI32(1000000)                            // rate (frames/s = rate/scale)
    putI32(0); putI32(frames.length); putI32(frameSize); putI32(-1)
    putI32(0); putU16(0); putU16(0); putU16(width); putU16(height)
    putStr("strf"); putI32(40)
    putI32(40); putI32(width); putI32(height); putU16(1); putU16(24)
    putI32(0); putI32(frameSize); putI32(0); putI32(0); putI32(0); putI32(0)
    putStr("LIST"); putI32(moviSize); putStr("movi")
    frames.foreach { f =>
      putStr("00db"); putI32(frameSize)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y // bottom-up
        var x = 0
        while (x < width) {
          val g = f(srcRow * width + x)
          b(o) = g.toByte; b(o + 1) = g.toByte; b(o + 2) = g.toByte
          o += 3; x += 1
        }
        var p = width * 3
        while (p < rowBytes) { b(o) = 0; o += 1; p += 1 } // row padding
        y += 1
      }
    }
    require(o == b.length, s"encoder layout bug: wrote $o of ${b.length}")
    b
  }
}
