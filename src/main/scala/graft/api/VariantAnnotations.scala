package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.Variant

/** Typed accessors over the VCF INFO map (`Variant.annotation`) — the
  * commonly-queried subset of the reference's VariantAnnotation record
  * (bdg-formats VariantAnnotation; populated by
  * converters/VariantContextConverter.scala). The full converter carries
  * 50+ INFO/FORMAT handlers; these cover the reserved keys queries
  * actually filter on, both as Scala getters and as pushdown-friendly
  * Column expressions over the map column.
  */
object VariantAnnotations {

  // ----- Scala-side typed getters -----

  def alleleCount(v: Variant): Option[Int] =
    v.annotation.get("AC").flatMap(_.split(",").headOption).map(_.toInt)

  def alleleFrequency(v: Variant): Option[Double] =
    v.annotation.get("AF").flatMap(_.split(",").headOption).map(_.toDouble)

  def totalAlleles(v: Variant): Option[Int] =
    v.annotation.get("AN").map(_.toInt)

  def combinedDepth(v: Variant): Option[Int] =
    v.annotation.get("DP").map(_.toInt)

  def endPosition(v: Variant): Option[Long] =
    v.annotation.get("END").map(_.toLong)

  def isDbSnp(v: Variant): Boolean = v.annotation.contains("DB")
  def isSomatic(v: Variant): Boolean = v.annotation.contains("SOMATIC")

  // ----- Column twins (over an `annotation: map<string,string>` column) -----

  def alleleCountCol(annotation: Column): Column =
    split(element_at(annotation, "AC"), ",").getItem(0).cast("int")

  def alleleFrequencyCol(annotation: Column): Column =
    split(element_at(annotation, "AF"), ",").getItem(0).cast("double")

  def totalAllelesCol(annotation: Column): Column =
    element_at(annotation, "AN").cast("int")

  def combinedDepthCol(annotation: Column): Column =
    element_at(annotation, "DP").cast("int")

  def isDbSnpCol(annotation: Column): Column =
    element_at(annotation, "DB").isNotNull
}
