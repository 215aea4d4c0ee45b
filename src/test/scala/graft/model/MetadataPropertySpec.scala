package graft.model

import org.scalacheck.{Gen, Prop, Properties}
import Prop.forAll

/** ScalaCheck laws for the metadata union (the `++` used by
  * GenomicDataset.union — the reference's per-type merge semantics,
  * GenomicDataset.scala:490-507, called out in SURVEY §7 as one of the
  * hard invariants: dictionary merges must be idempotent, associative,
  * identity-preserving, and duplicate-free). */
object MetadataPropertySpec extends Properties("GenomicMetadata") {

  // entities drawn from one CONSISTENT universe: unions of compatible
  // dictionaries must merge; incompatible ones must be rejected (separate
  // property below)
  private val universeSeqs = Map(
    "chr1" -> 10000L, "chr2" -> 20000L, "chr3" -> 30000L, "chrX" -> 40000L)
  private val universeRgs = Map(
    "rg1" -> ReadGroup(sampleId = "s1", id = "rg1", library = Some("libA")),
    "rg2" -> ReadGroup(sampleId = "s1", id = "rg2", library = Some("libB")),
    "rg3" -> ReadGroup(sampleId = "s2", id = "rg3"))

  private val genSeqRec: Gen[SequenceRecord] =
    Gen.oneOf(universeSeqs.toSeq).map { case (n, l) => SequenceRecord(n, l) }

  private val genRg: Gen[ReadGroup] =
    Gen.oneOf(universeRgs.values.toSeq)

  private val genMeta: Gen[GenomicMetadata] = for {
    sqs <- Gen.listOfN(3, genSeqRec)
    rgs <- Gen.listOfN(2, genRg)
    smp <- Gen.someOf(Seq(Sample("s1"), Sample("s2")))
    hls <- Gen.someOf(Seq(HeaderLine("##INFO=<ID=DP>"), HeaderLine("##FORMAT=<ID=GT>")))
  } yield GenomicMetadata(
    sequences = SequenceDictionary(sqs.distinctBy(_.name).toIndexedSeq),
    readGroups = ReadGroupDictionary(rgs.distinctBy(_.id)),
    samples = smp.toSeq,
    headerLines = hls.toSeq)

  private def names(m: GenomicMetadata) =
    (m.sequences.records.map(_.name).toSet,
      m.readGroups.readGroups.map(_.id).toSet,
      m.samples.map(_.id).toSet,
      m.headerLines.toSet)

  property("idempotent: m ++ m keeps the same entities, no duplicates") =
    forAll(genMeta) { m =>
      val u = m ++ m
      names(u) == names(m) &&
        u.sequences.records.map(_.name).distinct.length ==
          u.sequences.records.length &&
        u.readGroups.readGroups.map(_.id).distinct.length ==
          u.readGroups.readGroups.length &&
        u.samples.map(_.id).distinct.length == u.samples.length
    }

  property("identity: empty is a left and right unit") =
    forAll(genMeta) { m =>
      names(GenomicMetadata() ++ m) == names(m) &&
        names(m ++ GenomicMetadata()) == names(m)
    }

  property("associative on the entity sets") =
    forAll(genMeta, genMeta, genMeta) { (a, b, c) =>
      names((a ++ b) ++ c) == names(a ++ (b ++ c))
    }

  property("commutative on the entity sets (order-insensitive content)") =
    forAll(genMeta, genMeta) { (a, b) =>
      names(a ++ b) == names(b ++ a)
    }

  property("conflicting contig lengths are rejected, not silently merged") =
    forAll(Gen.choose(1L, 1000L), Gen.choose(1001L, 2000L)) { (l1, l2) =>
      val a = GenomicMetadata(sequences =
        SequenceDictionary(Seq(SequenceRecord("chr1", l1))))
      val b = GenomicMetadata(sequences =
        SequenceDictionary(Seq(SequenceRecord("chr1", l2))))
      Prop.throws(classOf[IllegalArgumentException]) { a ++ b }
    }

  property("same read-group id with different content is rejected") =
    forAll(Gen.oneOf("libA", "libB")) { lib =>
      val a = GenomicMetadata(readGroups = ReadGroupDictionary(Seq(
        ReadGroup(sampleId = "s1", id = "rg1", library = Some(lib)))))
      val b = GenomicMetadata(readGroups = ReadGroupDictionary(Seq(
        ReadGroup(sampleId = "s2", id = "rg1", library = Some(lib)))))
      Prop.throws(classOf[IllegalArgumentException]) { a ++ b }
    }

  property("union covers both inputs") =
    forAll(genMeta, genMeta) { (a, b) =>
      val u = names(a ++ b)
      val (sa, ra, ma, ha) = names(a)
      val (sb, rb, mb, hb) = names(b)
      (sa ++ sb).subsetOf(u._1) && (ra ++ rb).subsetOf(u._2) &&
        (ma ++ mb).subsetOf(u._3) && (ha ++ hb).subsetOf(u._4)
    }
}
