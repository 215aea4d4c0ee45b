package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structural-variant breakend (BND) support — the VCF 4.2 §5.4 breakend
  * notation the reference handles inside its htsjdk-backed
  * VariantContextConverter (adam-core/.../converters/VariantContextConverter
  * .scala). A breakend ALT like `G]17:198982]` encodes one side of a novel
  * adjacency; its partner record is linked either explicitly (INFO MATEID)
  * or implicitly by reciprocal coordinates. Both link paths are plain
  * equi-joins here — at 100 TB the BND subset is a filter over the variant
  * table, the joins are on (id) / (contig, pos) keys and broadcast or
  * shuffle-hash cleanly.
  */
object StructuralVariants {

  /** True iff the ALT string uses breakend bracket notation. */
  def isBreakend(alt: Column): Column =
    alt.contains("[") || alt.contains("]")

  private val MateRe = "[\\[\\]]([^\\[\\]:]+):([0-9]+)[\\[\\]]"

  /** Parse a breakend ALT into its components (VCF 4.2 §5.4):
    *  - `mate_ref` / `mate_pos`: the partner locus (pos 1-based, as written);
    *  - `anchor_first`: the anchor bases precede the bracket (`t[p[` /
    *    `t]p]`) — the joined piece is appended AFTER this record's base;
    *  - `mate_right`: bracket is `[` — the joined partner piece extends to
    *    the RIGHT of the mate position (reverse-complement join iff
    *    anchor_first == mate_right);
    *  - `insert`: novel inserted sequence between the anchor base and the
    *    junction (empty when none).
    * Non-breakend ALTs parse to nulls. */
  def parseBreakend(alt: Column): Column = {
    val mateRef = regexp_extract(alt, MateRe, 1)
    val matePos = regexp_extract(alt, MateRe, 2)
    val anchorFirst = alt.rlike("^[A-Za-z.]")
    val bracket = regexp_extract(alt, "([\\[\\]])", 1)
    // anchor string = REF-matching base plus any novel insertion; the
    // inserted part is everything past the first base (anchor-first) or
    // before the last base (anchor-last)
    val anchor = when(anchorFirst, regexp_extract(alt, "^([A-Za-z.]+)", 1))
      .otherwise(regexp_extract(alt, "([A-Za-z.]+)$", 1))
    val insert = when(length(anchor) > 1,
      when(anchorFirst, anchor.substr(lit(2), length(anchor) - 1))
        .otherwise(anchor.substr(lit(1), length(anchor) - 1)))
      .otherwise(lit(""))
    when(isBreakend(alt),
      struct(
        mateRef.as("mate_ref"),
        matePos.cast("long").as("mate_pos"),
        anchorFirst.as("anchor_first"),
        (bracket === "[").as("mate_right"),
        insert.as("insert")))
      .otherwise(lit(null).cast(
        "struct<mate_ref:string,mate_pos:long,anchor_first:boolean," +
          "mate_right:boolean,insert:string>"))
  }

  /** Link breakend records to their mates. Input needs `referenceName`,
    * `start` (0-based), `names` (array — first entry is the VCF ID),
    * `alternateAllele`, `annotation` (INFO map, may carry MATEID).
    *
    * Records with MATEID link by id equi-join; the rest link by reciprocal
    * coordinates (my mate locus is your locus AND your mate locus is
    * mine). Returns one row per linked breakend:
    * (id, referenceName, start, alt, mate_id, mate_referenceName,
    * mate_start, via) with `via` ∈ {mateid, coords}. Unpaired breakends
    * are absent (callers detect them by anti-joining back). */
  def linkBreakends(variants: DataFrame): DataFrame = {
    val bnd = variants
      .filter(isBreakend(col("alternateAllele")))
      .select(
        element_at(col("names"), 1).as("id"),
        col("referenceName"), col("start"),
        col("alternateAllele").as("alt"),
        element_at(col("annotation"), "MATEID").as("mate_id_info"),
        parseBreakend(col("alternateAllele")).as("b"))
      .select(col("id"), col("referenceName"), col("start"), col("alt"),
        col("mate_id_info"),
        col("b.mate_ref"), col("b.mate_pos"))

    val byId = {
      val a = bnd.filter(col("mate_id_info").isNotNull)
      val b = bnd.select(col("id").as("m_id"),
        col("referenceName").as("m_ref"), col("start").as("m_start"))
      a.join(b, a("mate_id_info") === b("m_id"))
        .select(col("id"), col("referenceName"), col("start"), col("alt"),
          col("m_id").as("mate_id"), col("m_ref").as("mate_referenceName"),
          col("m_start").as("mate_start"), lit("mateid").as("via"))
    }

    val byCoords = {
      val a = bnd.filter(col("mate_id_info").isNull)
      val b = bnd.filter(col("mate_id_info").isNull)
        .select(col("id").as("m_id"), col("referenceName").as("m_ref"),
          col("start").as("m_start"), col("mate_ref").as("m_mate_ref"),
          col("mate_pos").as("m_mate_pos"))
      // reciprocal: my mate locus == your locus, your mate locus == mine
      // (mate_pos is 1-based; start is 0-based)
      a.join(b,
          a("mate_ref") === b("m_ref") && a("mate_pos") === b("m_start") + 1 &&
            b("m_mate_ref") === a("referenceName") &&
            b("m_mate_pos") === a("start") + 1 &&
            a("id") =!= b("m_id"))
        .select(col("id"), col("referenceName"), col("start"), col("alt"),
          col("m_id").as("mate_id"), col("m_ref").as("mate_referenceName"),
          col("m_start").as("mate_start"), lit("coords").as("via"))
    }

    byId.unionByName(byCoords)
  }

  /** Group structural-variant records by INFO EVENT (VCF 4.2 §5.4.3: all
    * breakends — and any companion symbolic records — of one rearrangement
    * share an EVENT id). Output, one row per event:
    * (event, n_records, n_breakends, referenceNames sorted-distinct,
    * min_start, max_start). One map-side-combinable aggregation keyed by
    * the event id; the referenceNames set is bounded by the event's
    * adjacency count (a handful), never corpus-sized. */
  def eventGroups(variants: DataFrame): DataFrame =
    variants
      .filter(element_at(col("annotation"), "EVENT").isNotNull)
      .groupBy(element_at(col("annotation"), "EVENT").as("event"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(isBreakend(col("alternateAllele")), 1L).otherwise(0L))
          .as("n_breakends"),
        sort_array(collect_set(col("referenceName"))).as("referenceNames"),
        min("start").as("min_start"),
        max("start").as("max_start"))
}
