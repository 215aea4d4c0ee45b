package graft.sources

/** WAV (RIFF/WAVE) codec — pure-JVM, from the public RIFF/WAVE format
  * specification (Microsoft/IBM Multimedia Programming Interface spec;
  * "WAVE PCM soundfile format"). The "real" audio codec behind
  * [[graft.operators.MultimodalOps.extractAudioFeatures]] /
  * [[graft.operators.MultimodalOps.audioStats]] — other audio formats
  * remain stubbed (no media libraries in this container).
  *
  * Supported on decode: uncompressed PCM (audio format 1), mono or
  * multi-channel (channels are averaged to mono), 16-bit signed or 8-bit
  * unsigned samples, with proper chunk walking (unknown chunks like LIST
  * or fact are skipped, word-aligned per the spec). Encode writes
  * 16-bit signed mono PCM.
  *
  * All fields little-endian per the spec.
  */
object Wav {

  /** Decoded audio: mono samples as signed 16-bit values in an Int array
    * (8-bit input is centered and scaled by 257 so full scale maps to
    * full scale exactly: (b-128)*257 spans [-32896, 32639] ~ 16-bit). */
  final case class Audio(sampleRateHz: Int, samples: Array[Int])

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  @inline private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def i16(b: Array[Byte], o: Int): Int =
    u16(b, o).toShort.toInt
  @inline private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Decode a WAV payload to mono samples. Throws IllegalArgumentException
    * on malformed/unsupported payloads. */
  def decode(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a WAV payload (missing RIFF/WAVE magic)")
    var off = 12
    var sampleRate = 0
    var channels = 0
    var bitsPerSample = 0
    var haveFmt = false
    var samples: Array[Int] = null
    while (off + 8 <= bytes.length && (samples == null || !haveFmt)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = i32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' runs past payload end")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val audioFormat = u16(bytes, off + 8)
          require(audioFormat == 1, s"unsupported audio format $audioFormat (only PCM)")
          channels = u16(bytes, off + 10)
          sampleRate = i32(bytes, off + 12)
          bitsPerSample = u16(bytes, off + 22)
          require(channels >= 1, "need >= 1 channel")
          require(bitsPerSample == 16 || bitsPerSample == 8,
            s"unsupported bit depth $bitsPerSample (only 8/16)")
          haveFmt = true
        case "data" =>
          require(haveFmt, "data chunk before fmt chunk")
          val bytesPerSample = bitsPerSample / 8
          val frames = size / (bytesPerSample * channels)
          val out = new Array[Int](frames)
          var f = 0
          while (f < frames) {
            var acc = 0
            var c = 0
            while (c < channels) {
              val so = off + 8 + (f * channels + c) * bytesPerSample
              acc += (if (bitsPerSample == 16) i16(bytes, so)
                      else ((bytes(so) & 0xff) - 128) * 257)
              c += 1
            }
            out(f) = acc / channels // integer mean across channels
            f += 1
          }
          samples = out
        case _ => // LIST, fact, cue, ... — skip
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(haveFmt, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Audio(sampleRate, samples)
  }

  /** Encode signed 16-bit mono samples (Int values in [-32768, 32767]) as
    * a PCM WAV payload. */
  def encode(sampleRateHz: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRateHz > 0, "sample rate must be positive")
    val dataSize = samples.length * 2
    val b = new Array[Byte](44 + dataSize)
    def putStr(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { b(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def putU16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def putI32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    putStr(0, "RIFF"); putI32(4, 36 + dataSize); putStr(8, "WAVE")
    putStr(12, "fmt "); putI32(16, 16)
    putU16(20, 1)                    // PCM
    putU16(22, 1)                    // mono
    putI32(24, sampleRateHz)
    putI32(28, sampleRateHz * 2)     // byte rate
    putU16(32, 2)                    // block align
    putU16(34, 16)                   // bits per sample
    putStr(36, "data"); putI32(40, dataSize)
    var i = 0
    while (i < samples.length) {
      putU16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    b
  }
}
