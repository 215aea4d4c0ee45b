package graft.core

import graft.SparkSpec
import graft.model._
import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Codegen health: encoder/expression code generation must not silently
  * fall back to interpreted mode. Janino cannot compile references to
  * object-NESTED case classes, so Spark logs a CompileException and runs
  * the interpreted encoder — correct but slow, and the log spam masks
  * real codegen regressions (round-6 verdict: Sidecars.HeaderRow, and
  * MediaFeatureRow before it). This spec exercises every encoder-backed
  * row type that previously regressed (plus the other internal row types)
  * while capturing the codegen logger, and fails on any CompileException.
  *
  * The verified trigger (probed on Spark 4.1.2): a PRIVATE object-nested
  * case class — the generated SpecificSafeProjection cannot access the
  * private member and Janino fails with "Private member cannot be
  * accessed" at ERROR level, then Spark silently runs the interpreted
  * encoder. Public nesting alone compiles fine; `private` is the bug.
  */
class CodegenHealthSpec extends SparkSpec {

  /** Runs `body` while capturing WARN+ log events; returns messages
    * mentioning CompileException. Spark logs codegen fallbacks through
    * log4j2 at WARN/ERROR on the CodeGenerator logger. */
  private def compileErrorsDuring(body: => Unit): Seq[String] = {
    val captured = scala.collection.mutable.ArrayBuffer.empty[String]
    val appender = new AbstractAppender(
      "codegen-capture", null, null, false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit = {
        val msg = event.getMessage.getFormattedMessage +
          Option(event.getThrown).map(t => " " + t.toString).getOrElse("")
        if (msg.contains("CompileException") ||
          msg.contains("Failed to compile")) captured.synchronized {
          captured += msg.take(300)
        }
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try { body; captured.toSeq }
    finally {
      rootCfg.removeAppender("codegen-capture")
      ctx.updateLoggers()
      appender.stop()
    }
  }

  test("metadata sidecar round trip generates compilable encoder code") {
    val meta = GenomicMetadata(
      SequenceDictionary(Seq(SequenceRecord("chr1", 1000L))),
      ReadGroupDictionary(Seq(ReadGroup("s1", "rg1"))),
      Seq(Sample("s1", Some("sample one"))),
      Seq(ProcessingStep("step1", Some("graft"), None, None, None)),
      Seq(HeaderLine("##fileformat=VCFv4.2")))
    val dir = tmpDir() + "/sidecars"
    val errs = compileErrorsDuring {
      Sidecars.write(spark, dir, meta)
      val back = Sidecars.read(spark, dir)
      assert(back.headerLines.map(_.raw) == meta.headerLines.map(_.raw))
    }
    assert(errs.isEmpty, s"Janino fallback during sidecar IO:\n${errs.mkString("\n")}")
  }

  test("multimodal + BQSR observation encoders generate compilable code") {
    import spark.implicits._
    val errs = compileErrorsDuring {
      // MediaFeatureRow / AudioFeatureRow path
      val media = graft.operators.MultimodalOps.asMedia(
        Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "bytes"),
        "id", "bytes", "image/raw", 2, 2)
      graft.operators.MultimodalOps.extractImageFeatures(media).count()
      // Bqsr.Observation path (mapPartitions output encoder)
      val reads = spark.createDataset(Seq(Alignment(
        readName = Some("r1"), referenceName = Some("chr1"),
        start = Some(10L), cigar = Some("4M"), sequence = Some("ACGT"),
        qualityScores = Some("IIII"), readMapped = Some(true),
        readNegativeStrand = Some(false), readPaired = Some(false),
        readGroupId = Some("rg1"), mismatchingPositions = Some("4"))))
      graft.algorithms.Bqsr.observationDF(reads, (_, _) => false).count()
    }
    assert(errs.isEmpty, s"Janino fallback:\n${errs.mkString("\n")}")
  }

  test("streaming state encoders generate compilable code") {
    import spark.implicits._
    val errs = compileErrorsDuring {
      // flatMapGroupsWithState runs in batch mode too — exercises the
      // UserEvent/UserState/UserUpdate encoders
      val evs = spark.createDataset(Seq(
        graft.streaming.EventStreams.UserEvent(1L, 1000L, 2.0),
        graft.streaming.EventStreams.UserEvent(1L, 2000L, 3.0)))
      graft.streaming.EventStreams.runningUserTotals(evs).count()
    }
    assert(errs.isEmpty, s"Janino fallback:\n${errs.mkString("\n")}")
  }
}
