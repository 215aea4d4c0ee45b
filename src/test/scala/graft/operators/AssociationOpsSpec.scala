package graft.operators

import graft.SparkSpec

class AssociationOpsSpec extends SparkSpec {

  private val baskets: Seq[(Long, String)] = Seq(
    1L -> "milk", 1L -> "bread", 1L -> "butter",
    2L -> "milk", 2L -> "bread",
    3L -> "milk", 3L -> "beer",
    4L -> "bread", 4L -> "butter",
    5L -> "milk", 5L -> "bread", 5L -> "butter", 5L -> "beer",
    6L -> "beer", 6L -> "beer", // duplicate item in basket: counted once
    7L -> "milk")

  private def run(minSupport: Long) = {
    import spark.implicits._
    AssociationOps.associationRules(
      baskets.toDF("basket", "item"), "basket", "item", minSupport)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))
      .toMap
  }

  /** Driver-side brute force of the same integer formulas. */
  private def reference(minSupport: Long) = {
    val inc = baskets.distinct
    val byBasket = inc.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = byBasket.size.toLong
    val supp = inc.groupBy(_._2).view.mapValues(_.map(_._1).toSet.size.toLong).toMap
    val items = supp.keys.toSeq.sorted
    (for {
      a <- items; b <- items if a != b
      nab = byBasket.values.count(s => s.contains(a) && s.contains(b)).toLong
      if nab >= minSupport
    } yield (a, b) ->
      (nab, supp(a), supp(b), n, nab * 1000 / supp(a),
        nab * n * 1000000 / (supp(a) * supp(b)))).toMap
  }

  test("associationRules equals the driver-side brute force") {
    assert(run(2L) === reference(2L))
    assert(run(1L) === reference(1L))
  }

  test("metric sanity: confidence bounded, lift symmetric in n_ab") {
    val rules = run(1L)
    rules.foreach { case ((a, b), (nab, na, nb, n, conf, _)) =>
      assert(conf <= 1000L, s"$a->$b")
      assert(nab <= math.min(na, nb))
      // reverse rule exists with the same pair support
      assert(rules((b, a))._1 === nab)
    }
    // milk -> bread in baskets {1,2,5} of milk's {1,2,3,5,7}
    val (nab, na, _, _, conf, _) = rules(("milk", "bread"))
    assert(nab === 3L && na === 5L && conf === 600L)
  }

  test("maxBasketSize drops oversized baskets from supports and n_baskets") {
    import spark.implicits._
    // basket 99 has 6 distinct items; a cap of 5 must remove it entirely —
    // from the pair join, the item supports, AND the basket denominator —
    // leaving exactly the rules of the original 7-basket corpus
    val big = (1 to 6).map(i => 99L -> s"extra$i")
    val df = (baskets ++ big).toDF("basket", "item")
    val capped = AssociationOps
      .associationRules(df, "basket", "item", 1L, maxBasketSize = 5L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))
      .toMap
    assert(capped === reference(1L))
    // the generous default keeps it: extra1-extra2 rules appear and every
    // rule's basket denominator counts all 8 baskets
    val uncapped = AssociationOps.associationRules(df, "basket", "item", 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(uncapped.contains(("extra1", "extra2")))
    assert(uncapped.values.forall(_ === 8L))
  }

  test("min support prunes pairs, not single-item support counts") {
    val pruned = run(3L)
    // milk-bread (baskets 1,2,5) and bread-butter (1,4,5) survive at 3
    assert(pruned.keySet === Set("milk" -> "bread", "bread" -> "milk",
      "bread" -> "butter", "butter" -> "bread"))
    assert(pruned(("bread", "milk"))._2 === 4L) // bread support intact
  }
}
