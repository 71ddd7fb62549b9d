package graft.energy

import java.time.LocalDate
import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5 leg 3): structural invariants of the
  * silver flatten and gold aggregates under generated payload shapes.
  * (Plain ScalaCheck generators sampled with a fixed seed — the
  * scalatest/scalacheck bridge artifact is not in the offline cache.)
  */
class EnergyPropertiesSpec extends SparkSpec {

  private val day = LocalDate.parse("2025-06-01")
  private def epoch = day.toEpochDay * 86400L

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def powerPayload(nTs: Int, types: Seq[(String, Int)]): String = {
    val ts = (0 until nTs).map(epoch + _ * 900)
    val pts = types.map { case (name, nVals) =>
      s"""{"name": "$name", "data": ${(1 to nVals).map(_ * 1.5).mkString("[", ",", "]")}}"""
    }
    s"""{"unix_seconds": ${ts.mkString("[", ",", "]")}, "production_types": ${pts.mkString("[", ",", "]")}}"""
  }

  test("zip-explode row count = sum over types of min(nTs, nVals)") {
    val gen = for {
      nTs <- Gen.choose(0, 12)
      valCounts <- Gen.listOfN(3, Gen.choose(0, 12))
    } yield (nTs, valCounts)
    for ((nTs, valCounts) <- samples(gen, 8)) {
      val types = valCounts.zipWithIndex.map { case (n, i) => (s"type$i", n) }
      val bronze = Bronze.bronzeDf(spark, "country", "de",
        Seq(day -> powerPayload(nTs, types)))
      val got = Silver.powerToSilver(bronze).count()
      val expected = valCounts.map(n => math.min(nTs, n)).sum.toLong
      assert(got == expected, s"nTs=$nTs valCounts=$valCounts")
    }
  }

  test("gold sums are invariant under repartitioning") {
    val bronze = Bronze.bronzeDf(spark, "country", "de",
      Seq(day -> powerPayload(96, Seq(("Wind offshore", 96), ("Solar", 96)))))
    val silver = Silver.powerToSilver(bronze)
    val direct = Gold.powerDailyByType(silver)
      .orderBy("date", "production_type").collect().map(_.toSeq)
    val shuffled = Gold.powerDailyByType(silver.repartition(13))
      .orderBy("date", "production_type").collect().map(_.toSeq)
    assert(direct.toSeq == shuffled.toSeq)
  }

  test("join row count <= min(offshore days, price days)") {
    val gen = Gen.zip(Gen.choose(1, 5), Gen.choose(1, 5))
    for ((nPow, nPri) <- samples(gen, 5)) {
      val powDates = (0 until nPow).map(i => day.plusDays(i.toLong))
      val priDates = (0 until nPri).map(i => day.plusDays(i.toLong))
      val src = FixtureEnergySource.synthetic(
        powDates ++ priDates, productionTypes = Seq("Wind offshore"),
        pointsPerDay = 4, pricePointsPerDay = 4)
      val powBronze = Bronze.bronzeDf(spark, "country", "de",
        powDates.map(d => d -> src.publicPower("de", d)))
      val priBronze = Bronze.bronzeDf(spark, "market", "DE-LU",
        priDates.map(d => d -> src.price("DE-LU", d)))
      val gold = Gold.offshoreWindVsPrice(
        Gold.powerDailyByType(Silver.powerToSilver(powBronze)),
        Gold.priceDaily(Silver.priceToSilver(priBronze)),
      )
      assert(gold.count() <= math.min(nPow, nPri).toLong)
    }
  }
}
