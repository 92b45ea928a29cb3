package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Misra–Gries partition summary behind q99
  * (SURVEY §2 C5 heavy hitters): on ARBITRARY streams the summary stays
  * bounded, counts every element exactly once, and never loses an item
  * frequent enough for the q99 guarantee (count · cap > stream length). */
class MgSummaryProps extends AnyFunSuite {
  /** Deterministic sampling loop (no scalatest-scalacheck bridge on the
    * offline classpath): n samples from fixed seeds. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // small alphabet → heavy collisions → the decrement path runs constantly
  private val streamGen: Gen[(List[String], Int)] = for {
    n <- Gen.choose(0, 400)
    alpha <- Gen.choose(1, 30)
    stream <- Gen.listOfN(n, Gen.choose(0, alpha - 1).map(i => s"t$i"))
    cap <- Gen.choose(1, 12)
  } yield (stream, cap)

  test("summary is bounded by cap and the sentinel counts the stream") {
    samples(streamGen, 200).foreach { case (stream, cap) =>
      val out = TextOps.mgSummaryAndCount(stream.iterator, cap).toSeq
      val (sentinels, kept) = out.partition(_._1 == "")
      assert(sentinels == Seq(("", stream.length.toLong)))
      assert(kept.size <= cap, s"cap=$cap kept=${kept.size}")
      // emitted keys are actual stream members, each at most once
      assert(kept.map(_._1).distinct.size == kept.size)
      kept.foreach { case (t, _) => assert(stream.contains(t)) }
    }
  }

  test("every item with count * cap > N survives the summary (q99 guarantee)") {
    samples(streamGen, 200).foreach { case (stream, cap) =>
      val kept = TextOps.mgSummaryAndCount(stream.iterator, cap)
        .collect { case (t, _) if t.nonEmpty => t }.toSet
      val n = stream.length
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      counts.foreach { case (t, c) =>
        if (c.toLong * cap > n)
          assert(kept.contains(t),
            s"lost heavy hitter $t (count=$c, n=$n, cap=$cap)")
      }
    }
  }
}
