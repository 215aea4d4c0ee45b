package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StructuralVariantsSpec extends SparkSpec {

  // the VCF 4.2 §5.4 canonical breakend example (3 reciprocal pairs)
  private def bndRows(withMateId: Boolean) = {
    import spark.implicits._
    val mate = Map(
      "bnd_W" -> "bnd_Y", "bnd_Y" -> "bnd_W",
      "bnd_V" -> "bnd_U", "bnd_U" -> "bnd_V",
      "bnd_X" -> "bnd_Z", "bnd_Z" -> "bnd_X")
    Seq(
      ("2", 321680L, "bnd_W", "G]17:198982]"),
      ("2", 321681L, "bnd_V", "]13:123456]T"),
      ("13", 123455L, "bnd_U", "C[2:321682["),
      ("13", 123456L, "bnd_X", "[17:198983[A"),
      ("17", 198981L, "bnd_Y", "A]2:321681]"),
      ("17", 198982L, "bnd_Z", "[13:123457[C"))
      .map { case (ref, start0, id, alt) =>
        val ann = if (withMateId) Map("MATEID" -> mate(id)) else Map.empty[String, String]
        (ref, start0, Seq(id), alt, ann)
      }
      .toDF("referenceName", "start", "names", "alternateAllele", "annotation")
  }

  test("parseBreakend extracts mate locus, orientation, insert") {
    import spark.implicits._
    val parsed = Seq(
      "G]17:198982]",     // anchor first, mate piece extends LEFT of mate
      "]13:123456]T",     // anchor last, mate piece extends LEFT
      "C[2:321682[",      // anchor first, mate piece extends RIGHT
      "[17:198983[A",     // anchor last, mate piece extends RIGHT
      "CAGTNNNNNCA[2:321682[", // with novel insertion
      "A",                // not a breakend
      "<DEL>")            // symbolic, not a breakend
      .toDF("alt")
      .select(StructuralVariants.parseBreakend(col("alt")).as("b"))
      .select("b.mate_ref", "b.mate_pos", "b.anchor_first", "b.mate_right", "b.insert")
      .collect()

    assert(parsed(0).getString(0) == "17" && parsed(0).getLong(1) == 198982L &&
      parsed(0).getBoolean(2) && !parsed(0).getBoolean(3) && parsed(0).getString(4) == "")
    assert(parsed(1).getString(0) == "13" && parsed(1).getLong(1) == 123456L &&
      !parsed(1).getBoolean(2) && !parsed(1).getBoolean(3))
    assert(parsed(2).getString(0) == "2" && parsed(2).getLong(1) == 321682L &&
      parsed(2).getBoolean(2) && parsed(2).getBoolean(3))
    assert(parsed(3).getString(0) == "17" && parsed(3).getLong(1) == 198983L &&
      !parsed(3).getBoolean(2) && parsed(3).getBoolean(3))
    assert(parsed(4).getString(4) == "AGTNNNNNCA")
    assert(parsed(5).isNullAt(0) || parsed(5).get(0) == null)
    assert(parsed(6).isNullAt(0) || parsed(6).get(0) == null)
  }

  test("linkBreakends links by MATEID when present") {
    val linked = StructuralVariants.linkBreakends(bndRows(withMateId = true))
      .collect().map(r => (r.getAs[String]("id"), r.getAs[String]("mate_id"),
        r.getAs[String]("via"))).toSet
    assert(linked == Set(
      ("bnd_W", "bnd_Y", "mateid"), ("bnd_Y", "bnd_W", "mateid"),
      ("bnd_V", "bnd_U", "mateid"), ("bnd_U", "bnd_V", "mateid"),
      ("bnd_X", "bnd_Z", "mateid"), ("bnd_Z", "bnd_X", "mateid")))
  }

  test("linkBreakends links by reciprocal coordinates without MATEID") {
    val linked = StructuralVariants.linkBreakends(bndRows(withMateId = false))
      .collect().map(r => (r.getAs[String]("id"), r.getAs[String]("mate_id"),
        r.getAs[String]("via"))).toSet
    assert(linked == Set(
      ("bnd_W", "bnd_Y", "coords"), ("bnd_Y", "bnd_W", "coords"),
      ("bnd_V", "bnd_U", "coords"), ("bnd_U", "bnd_V", "coords"),
      ("bnd_X", "bnd_Z", "coords"), ("bnd_Z", "bnd_X", "coords")))
  }

  test("mate coordinates round-trip through the link") {
    val linked = StructuralVariants.linkBreakends(bndRows(withMateId = true))
      .collect()
    linked.foreach { r =>
      // linked mate row's locus matches the ALT's declared mate locus
      val altMate = r.getAs[String]("alt")
      assert(altMate.contains(
        s"${r.getAs[String]("mate_referenceName")}:${r.getAs[Long]("mate_start") + 1}"))
    }
  }
}
