package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import Prop.{forAll, propBoolean}

/** ScalaCheck laws for rendezvous (HRW) sharding (VERDICT r13
  * next-round #7): the fixed-size specs pin concrete shard maps and the
  * (m−n)/m moved band at one pair of sizes; these properties pin the
  * STRUCTURAL invariant at arbitrary key sets and arbitrary n→m
  * resizes — the whole reason HRW exists over pmod assignment. */
object RendezvousPropertySpec extends Properties("rendezvousShard") {

  private val genKeys: Gen[List[String]] =
    Gen.listOfN(120, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(24)),
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString)))

  private val genSizes: Gen[(Int, Int)] = for {
    n <- Gen.choose(1, 64)
    m <- Gen.choose(1, 64)
  } yield (n, m)

  property("assignment is always in range") =
    forAll(genKeys, genSizes) { (keys, nm) =>
      keys.forall { k =>
        val s = ShardOps.rendezvousShardOf(k, nm._1)
        s >= 0 && s < nm._1
      }
    }

  property("GROW n->m moves ONLY keys whose new argmax is a new shard" +
      " (monotone consistency)") =
    forAll(genKeys, genSizes) { (keys, nm) =>
      val (a, b) = nm
      val (n, m) = (math.min(a, b), math.max(a, b))
      (n < m) ==> keys.forall { k =>
        val from = ShardOps.rendezvousShardOf(k, n)
        val to = ShardOps.rendezvousShardOf(k, m)
        // a key either lands in a brand-new shard or does not move at
        // all: the argmax over 0..m-1, if below n, was already the
        // argmax over 0..n-1
        (to >= n && to < m) || to == from
      }
    }

  property("SHRINK m->n keeps every key whose shard survives") =
    forAll(genKeys, genSizes) { (keys, nm) =>
      val (a, b) = nm
      val (n, m) = (math.min(a, b), math.max(a, b))
      (n < m) ==> keys.forall { k =>
        val big = ShardOps.rendezvousShardOf(k, m)
        val small = ShardOps.rendezvousShardOf(k, n)
        if (big < n) small == big // surviving shard keeps its keys
        else small >= 0 && small < n // orphaned keys re-home in range
      }
    }

  property("determinism: same key, same n, same shard") =
    forAll(genKeys, genSizes) { (keys, nm) =>
      keys.forall(k => ShardOps.rendezvousShardOf(k, nm._1) ==
        ShardOps.rendezvousShardOf(k, nm._1))
    }
}
