package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {

  private def mediaDf = {
    import spark.implicits._
    val payload1 = Array.tabulate(64)(i => i.toByte)         // ramp
    val payload2 = Array.fill(64)(255.toByte)                // constant white
    MultimodalOps.asMedia(
      Seq((1L, payload1), (2L, payload2)).toDF("id", "bytes"),
      "id", "bytes", "image/gray8", 8, 8)
  }

  test("asMedia builds the typed media schema") {
    val df = mediaDf
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.select("meta.mediaType").collect().head.getString(0) == "image/gray8")
    assert(df.select("meta.width").collect().head.getInt(0) == 8)
  }

  test("extractImageFeatures: deterministic stub decode features") {
    val feats = MultimodalOps.extractImageFeatures(mediaDf)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Long](2))).toMap
    // payload2 = all 255 -> intensity 1.0, all pixels in top bin
    assert(math.abs(feats(2L)._1 - 1.0) < 1e-9)
    assert(feats(2L)._2.last == 64L)
    // payload1 ramp 0..63 -> mean = (0+..+63)/64/255
    val expected = (0 until 64).map(_ / 255.0).sum / 64
    assert(math.abs(feats(1L)._1 - expected) < 1e-6) // stub decodes to Float
    assert(feats(1L)._2.sum == 64L)
  }

  test("extractImageFeatures decodes BMP payloads for real") {
    import spark.implicits._
    // 4x2 image, gray ramp 0,32,...,224 -> mean = (0+...+224)/8/255
    val px = Array.tabulate(8)(_ * 32)
    val bmp = graft.sources.Bmp.encode(4, 2, px)
    val media = MultimodalOps.asMedia(
      Seq((7L, bmp)).toDF("id", "bytes"), "id", "bytes", "image/bmp", 4, 2)
    val r = MultimodalOps.extractImageFeatures(media).collect().head
    val expected = px.map(_ / 255.0).sum / 8
    assert(math.abs(r.getDouble(1) - expected) < 1e-6)
    // each ramp step lands in its own 16-wide bin: bins 0,2,4,...,14
    val hist = r.getSeq[Long](2)
    assert((0 until 16).map(b => hist(b)).sum == 8L)
    assert((0 until 8).forall(i => hist(i * 2) == 1L))
  }

  test("imageStats: integer-exact per-bin stats from BMP decode") {
    import spark.implicits._
    val px = Array(0, 15, 16, 255) // bins 0,0,1,15
    val media = Seq((3L, graft.sources.Bmp.encode(2, 2, px)))
      .toDF("media_id", "payload")
    val rows = MultimodalOps.imageStats(media).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set((0, 2L, 4L, 286L), (1, 1L, 4L, 286L), (15, 1L, 4L, 286L)))
  }

  test("extractAudioFeatures decodes WAV payloads for real") {
    import spark.implicits._
    // 512 samples alternating +/-1000 -> every window is full-scale RMS
    // 1000/32768 and ZCR 1.0
    val smp = Array.tabulate(512)(i => if (i % 2 == 0) 1000 else -1000)
    val wav = graft.sources.Wav.encode(16000, smp)
    val media = Seq((9L, wav)).toDF("media_id", "payload")
    val rows = MultimodalOps.extractAudioFeatures(media, 256, 256).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - 1000.0 / 32768) < 1e-6)
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    }
  }

  test("audioStats: integer-exact per-window stats from WAV decode") {
    import spark.implicits._
    val smp = Array(5, -5, 5, -5, 3, 3, -3, -3) // two windows of 4
    val media = Seq((4L, graft.sources.Wav.encode(8000, smp)))
      .toDF("media_id", "payload")
    val rows = MultimodalOps.audioStats(media, windowSamples = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // w0: |5|*4=20, crossings at every boundary = 3; w1: 12, 1 crossing
    assert(rows == Set((0, 20L, 3L, 8L), (1, 12L, 1L, 8L)))
  }

  test("sampleFrames decodes AVI payloads for real, evenly spaced") {
    import spark.implicits._
    // 5 frames of 2x1; frame f is all-f gray
    val frames = Array.tabulate(5)(f => Array.fill(2)(f * 10))
    val avi = graft.sources.Avi.encode(2, 1, 1000, frames)
    val media = Seq((7L, avi)).toDF("media_id", "payload")
    val rows = MultimodalOps.sampleFrames(media, 2).collect()
      .map(r => (r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    // 2 of 5 evenly spaced -> source frames 0 and 2
    assert(rows == Set(
      (0, Seq[Byte](0, 0)), (1, Seq[Byte](20, 20))))
    // non-AVI payloads still take the stub chunk split
    val stub = Seq((8L, Array[Byte](1, 2, 3, 4))).toDF("media_id", "payload")
    assert(MultimodalOps.sampleFrames(stub, 2).count() == 2)
  }

  test("videoStats: integer-exact per-frame stats incl. motion") {
    import spark.implicits._
    // 2x2, frame0 = [0,10,20,30] (sum 60), frame1 = [5,10,15,40] (sum 70,
    // motion |5|+0+|5|+|10| = 20)
    val avi = graft.sources.Avi.encode(2, 2, 1000,
      Array(Array(0, 10, 20, 30), Array(5, 10, 15, 40)))
    val media = Seq((3L, avi)).toDF("media_id", "payload")
    val rows = MultimodalOps.videoStats(media).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set((0, 4L, 60L, 0L), (1, 4L, 70L, 20L)))
  }

  test("resize keeps schema and scales dimensions") {
    val out = MultimodalOps.resize(mediaDf, 4, 4)
    val r = out.filter(col("media_id") === 2L).collect().head
    assert(r.getStruct(2).getInt(1) == 4)
    val bytes = r.getAs[Array[Byte]](1)
    assert(bytes.length == 16)
    assert(bytes.forall(b => (b & 0xff) == 255))
  }

  test("sampleFrames chunks payloads deterministically") {
    val frames = MultimodalOps.sampleFrames(mediaDf, 4)
      .filter(col("media_id") === 1L)
      .orderBy("frame_idx")
      .collect().map(_.getAs[Array[Byte]]("frame"))
    assert(frames.length == 4)
    assert(frames.map(_.length).sum == 64)
    assert(frames(0).head == 0.toByte && frames(3).last == 63.toByte)
  }

  test("extractAudioFeatures: window count, silence RMS, alternating ZCR") {
    import spark.implicits._
    // media 1: 96 bytes of silence; media 2: alternating +64/-64 square wave
    val silent = Array.fill[Byte](96)(0)
    val square = Array.tabulate[Byte](96)(i => if (i % 2 == 0) 64 else -64)
    val media = Seq((1L, silent), (2L, square)).toDF("media_id", "payload")
    val feats = MultimodalOps
      .extractAudioFeatures(media, windowSamples = 32, hopSamples = 16)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // (96 - 32) / 16 + 1 = 5 windows per media
    assert(feats.keySet == (for (m <- 1L to 2L; w <- 0 until 5) yield (m, w)).toSet)
    assert(feats((1L, 0))._1 == 0.0) // silence: zero RMS
    assert(feats((1L, 0))._2 == 0.0) // silence: sign never flips (>=0)
    assert(math.abs(feats((2L, 0))._1 - 0.5) < 1e-9) // |64/128| = 0.5 RMS
    assert(feats((2L, 0))._2 == 1.0) // flips every sample
    // too-short payload yields no windows
    val none = MultimodalOps.extractAudioFeatures(
      Seq((3L, Array.fill[Byte](10)(1))).toDF("media_id", "payload"),
      windowSamples = 32, hopSamples = 16)
    assert(none.count() == 0)
  }

  test("dhashOf: brightness shifts cancel, content changes flip bits") {
    val w = 20; val h = 17
    val px = Array.tabulate(w * h)(i => (i * 37 + 11) % 240)
    val base = MultimodalOps.dhashOf(w, h, px)
    // +7 uniform brightness: every box mean moves together -> same hash
    assert(MultimodalOps.dhashOf(w, h, px.map(_ + 7)) === base)
    // structural change (invert a vertical stripe) -> different hash
    val edited = px.zipWithIndex.map { case (p, i) =>
      if (i % w < 4) 255 - p else p
    }
    assert(MultimodalOps.dhashOf(w, h, edited) !== base)
  }

  test("imageDHash: encode->decode round trip preserves the hash") {
    import spark.implicits._
    val imgs = (0L until 12L).map { id =>
      val w = (16 + id % 5).toInt; val h = (16 + id % 3).toInt
      val px = Array.tabulate(w * h)(i => ((id * 13 + i * 7) % 256).toInt)
      (id, w, h, px)
    }
    val media = imgs.map { case (id, w, h, px) =>
      (id, graft.sources.Bmp.encode(w, h, px))
    }.toDF("media_id", "payload")
    val got = MultimodalOps.imageDHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    imgs.foreach { case (id, w, h, px) =>
      assert(got(id) === MultimodalOps.dhashOf(w, h, px), s"id=$id")
    }
  }

  test("audioEnergyFingerprint: volume scaling cancels, content changes flip bits") {
    val smp = Array.tabulate(1000)(i => ((i * 53 + 17) % 3000) - 1500)
    val base = MultimodalOps.audioEnergyFingerprint(smp)
    assert(MultimodalOps.audioEnergyFingerprint(smp.map(_ * 3)) === base)
    val edited = smp.zipWithIndex.map { case (s, i) =>
      if (i < 100) 0 else s // silence the head -> different energy profile
    }
    assert(MultimodalOps.audioEnergyFingerprint(edited) !== base)
  }

  test("audioFingerprint: WAV encode->decode round trip preserves the hash") {
    import spark.implicits._
    val clips = (0L until 10L).map { id =>
      val n = (512 + (id % 3) * 256).toInt
      (id, Array.tabulate(n)(i => (((id * 29 + i * 13) % 4000) - 2000).toInt))
    }
    val media = clips.map { case (id, smp) =>
      (id, graft.sources.Wav.encode(8000, smp))
    }.toDF("media_id", "payload")
    val got = MultimodalOps.audioFingerprint(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clips.foreach { case (id, smp) =>
      assert(got(id) === MultimodalOps.audioEnergyFingerprint(smp), s"id=$id")
    }
  }

  test("audioNearDuplicates equals brute-force Hamming over the fingerprints") {
    import spark.implicits._
    val media = (0L until 40L).map { id =>
      val base = id % 5
      val vol = (id / 5 + 1).toInt
      val n = (512 + (base % 3) * 256).toInt
      val smp = Array.tabulate(n)(i =>
        ((((base * 29 + i * 13) % 2000) - 1000) * vol).toInt)
      (id, graft.sources.Wav.encode(8000, smp))
    }.toDF("media_id", "payload")
    val got = MultimodalOps.audioNearDuplicates(media, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fps = MultimodalOps.audioFingerprint(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val ref = (for {
      (ia, ha) <- fps; (ib, hb) <- fps if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got === ref)
    // the 8 volume variants of each base pair at distance 0
    assert(ref.count(_._3 == 0) >= 5 * 8 * 7 / 2)
  }

  test("videoDHash: AVI round trip hashes the middle frame") {
    import spark.implicits._
    val clips = (0L until 8L).map { id =>
      val nf = (2 + id % 3).toInt
      val frames = Array.tabulate(nf)(f =>
        Array.tabulate(16 * 12)(i => ((id * 19 + f * 5 + i * 3) % 256).toInt))
      (id, nf, frames)
    }
    val media = clips.map { case (id, _, frames) =>
      (id, graft.sources.Avi.encode(16, 12, 40000, frames))
    }.toDF("media_id", "payload")
    val got = MultimodalOps.videoDHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clips.foreach { case (id, nf, frames) =>
      assert(got(id) === MultimodalOps.dhashOf(16, 12, frames(nf / 2)),
        s"id=$id")
    }
  }

  test("videoNearDuplicates equals brute-force Hamming over middle-frame hashes") {
    import spark.implicits._
    val media = (0L until 24L).map { id =>
      val base = id % 6
      val shift = (id / 6).toInt
      val frames = Array.tabulate(3)(f =>
        Array.tabulate(16 * 12)(i =>
          ((base * 19 + f * 5 + i * 3) % 250 + shift).toInt))
      (id, graft.sources.Avi.encode(16, 12, 40000, frames))
    }.toDF("media_id", "payload")
    val got = MultimodalOps.videoNearDuplicates(media, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = MultimodalOps.videoDHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val ref = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got === ref)
    assert(ref.count(_._3 == 0) >= 6 * 4 * 3 / 2)
  }

  test("hammingNearDuplicatesAgainst: index/probe equals the cross brute force") {
    import spark.implicits._
    val index = (0L until 30L).map(i => (i, i * 0x9e3779b97f4a7c15L))
      .toDF("media_id", "dhash")
    // probes: exact copies of 5 corpus hashes + 1-bit flips of 5 more
    val probes = ((100L until 105L).zip(0L until 5L).map { case (p, c) =>
      (p, c * 0x9e3779b97f4a7c15L)
    } ++ (105L until 110L).zip(5L until 10L).map { case (p, c) =>
      (p, (c * 0x9e3779b97f4a7c15L) ^ (1L << (p % 64).toInt))
    }).toDF("media_id", "dhash")
    val got = MultimodalOps.hammingNearDuplicatesAgainst(
        index, probes, "media_id", "dhash", maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val idx = index.collect().map(r => (r.getLong(0), r.getLong(1)))
    val prb = probes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = (for {
      (pid, ph) <- prb; (cid, ch) <- idx
      d = java.lang.Long.bitCount(ph ^ ch) if d <= 3
    } yield (pid, cid, d)).toSet
    assert(got === ref)
    assert(ref.count(_._3 == 0) === 5 && ref.count(_._3 == 1) === 5)
  }

  test("imageNearDuplicates equals brute-force Hamming over the hash table") {
    import spark.implicits._
    // 8 base patterns x 8 brightness-shifted clones -> lots of dist-0
    // pairs, plus whatever incidental near-collisions exist; the banded
    // join must find exactly what brute force finds.
    val media = (0L until 64L).map { id =>
      val base = id % 8
      val w = (16 + base % 5).toInt; val h = (16 + base % 3).toInt
      val shift = (id / 8).toInt // 0..7 uniform brightness
      val px = Array.tabulate(w * h)(i => ((base * 13 + i * 7) % 240 + shift).toInt)
      (id, graft.sources.Bmp.encode(w, h, px))
    }.toDF("media_id", "payload")
    val got = MultimodalOps.imageNearDuplicates(media, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashes = MultimodalOps.imageDHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val ref = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got === ref)
    // the 8 clones of each base must all pair at distance 0
    assert(ref.count(_._3 == 0) >= 8 * 8 * 7 / 2)
  }
}
