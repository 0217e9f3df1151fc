package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.NearDupStream.{CandPair, Doc}

/** Pins `NearDupStream.recommendCap` — the census→cap prescription as
  * code — on miniatures of the SAME ρ-parameterized mixed-routing
  * family the committed scale artifacts measure
  * (`ScaleSweep.genAdversarialDocs`, SCALING_r17's
  * `neardup_recall_adversarial_mixed` arms):
  *
  *  - target 1.0 returns the hottest census population, and a stream
  *    capped there reproduces the uncapped band arithmetic EXACTLY on
  *    every ρ arm (recall 1.0 by set equality, not by threshold);
  *  - the recommendation is a pair-mass QUANTILE: feeding back the
  *    exact mass fraction carried by buckets at or under the subgroup
  *    tier returns that tier, and the recommendation is monotone in
  *    the target;
  *  - at the recommended mid cap the subgroup tranche RECOVERS (the
  *    measured r17 reading — hot-bucket populations are precisely the
  *    cap thresholds at which each recall tranche returns), while the
  *    hot-bucket tranche stays withheld until the cap passes the hot
  *    population. */
class RecommendCapSpec extends AnyFunSuite with TestSpark {

  // miniature at the scale the adversarial-boundary specs already use:
  // 2 groups × 40 docs, 60 boilerplate + 15 tail tokens — within-group
  // jaccard 58/88 ≈ 0.66, so EVERY within-group pair is a true near-dup
  private val (groups, groupSize, boilT, tailT) = (2, 40, 60, 15)

  private def family(rho: Double): Seq[Doc] = {
    val s = spark
    import s.implicits._
    graft.tools.ScaleSweep
      .genAdversarialDocs(s, groups, groupSize, boilT, tailT, rho)
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).map { case (id, t) => Doc(id, t) }.toSeq
  }

  private def truePairs(docs: Seq[Doc]): Set[(Long, Long)] = {
    val sh = docs.map(d => d.docId -> NearDupStream.shingles(d.text)).toMap
    (for {
      a <- docs; b <- docs
      if a.docId < b.docId
      sa = sh(a.docId); sb = sh(b.docId)
      if sa.nonEmpty &&
        sa.intersect(sb).size.toDouble / sa.union(sb).size >= 0.5
    } yield (a.docId, b.docId)).toSet
  }

  /** The uncapped LSH candidate set, computed directly from the band
    * arithmetic (pure in-memory — the reference every capped streaming
    * run is measured against). */
  private def uncappedPairs(docs: Seq[Doc]): Set[(Long, Long)] =
    docs.flatMap(d => NearDupStream.bandKeys(d.text)
        .map { case (b, k) => ((b, k), d.docId) })
      .groupBy(_._1).values.flatMap { members =>
        val ids = members.map(_._2).sorted
        for { i <- ids.indices; j <- (i + 1) until ids.length }
          yield (ids(i), ids(j))
      }.toSet

  private def streamed(docs: Seq[Doc], cap: Int, qn: String): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = NearDupStream.candidates(input.toDS(), maxBucket = cap)
      .writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      input.addData(docs); q.processAllAvailable()
      spark.table(qn).as[CandPair].collect().map(p => (p.da, p.db)).toSet
    } finally q.stop()
  }

  private def populations(docs: Seq[Doc]): Array[Long] = {
    val s = spark
    import s.implicits._
    NearDupStream.bucketCensus(docs.toDS())
      .collect().map(_.getLong(2)).filter(_ >= 2L)
  }

  test("target 1.0 returns the hottest population and a stream capped there equals the uncapped band arithmetic on every rho arm") {
    Seq(0.0, 0.1, 0.3).foreach { rho =>
      val docs = family(rho)
      val s = spark
      import s.implicits._
      val census = NearDupStream.bucketCensus(docs.toDS())
      val maxM = populations(docs).max
      val capFull = NearDupStream.recommendCap(census, 1.0)
      assert(capFull === maxM.toInt,
        s"rho=$rho: target 1.0 must return the hottest population")
      val got = streamed(docs, capFull, s"reccap_full_${(rho * 100).toInt}")
      assert(got === uncappedPairs(docs),
        s"rho=$rho: cap $capFull (the recommendation) dropped pairs")
    }
  }

  test("quantile semantics: the pair-mass fraction at the subgroup tier returns that tier, monotone in the target") {
    val rho = 0.3
    val subTier = math.max(2, math.round(rho * groupSize).toInt) // 12
    val docs = family(rho)
    val s = spark
    import s.implicits._
    val census = NearDupStream.bucketCensus(docs.toDS()).persist()
    val pops = populations(docs)
    // family sanity: both tiers exist (subgroup buckets under the tier,
    // group-hot all-boilerplate buckets above it)
    assert(pops.exists(_ <= subTier) && pops.exists(_ > subTier),
      s"family lost its two tiers: ${pops.sorted.mkString(",")}")
    def mass(ms: Array[Long]): Double = ms.map(m => m * (m - 1) / 2.0).sum
    val fLow = mass(pops.filter(_ <= subTier)) / mass(pops)
    val capLow = NearDupStream.recommendCap(census, fLow)
    assert(capLow === pops.filter(_ <= subTier).max.toInt,
      s"the exact low-tier mass fraction ($fLow) must return the low tier")
    assert(capLow < NearDupStream.recommendCap(census, 1.0))
    assert(NearDupStream.recommendCap(census, fLow / 2) <= capLow)
    census.unpersist()
    ()
  }

  test("keptPairFrac is the exact dial value: matches the min(m,cap) arithmetic, and the recommendation's conservatism holds on every rho arm") {
    Seq(0.0, 0.1, 0.3).foreach { rho =>
      val docs = family(rho)
      val s = spark
      import s.implicits._
      val census = NearDupStream.bucketCensus(docs.toDS()).persist()
      val pops = populations(docs)
      def c2(m: Long): Double = m.toDouble * (m - 1) / 2.0
      def exact(cap: Int): Double =
        pops.map(m => c2(math.min(m, cap.toLong))).sum / pops.map(c2).sum
      // exactness against a direct population computation at several caps
      Seq(2, 3, 8, pops.max.toInt).foreach { cap =>
        assert(math.abs(NearDupStream.keptPairFrac(census, cap) - exact(cap))
          < 1e-12, s"rho=$rho cap=$cap")
      }
      // no colliding bucket is ever dropped at the hottest population
      assert(NearDupStream.keptPairFrac(census, pops.max.toInt) === 1.0)
      // conservatism (ADVICE r18): the quantile counts hot buckets as
      // zero kept pairs while the dial keeps their first cap members, so
      // the TRUE kept fraction at the recommended cap meets or exceeds
      // the target — "at least targetPairFrac" holds with room
      Seq(0.25, 0.5, 0.9, 1.0).foreach { f =>
        val cap = NearDupStream.recommendCap(census, f)
        assert(NearDupStream.keptPairFrac(census, cap) >= f - 1e-12,
          s"rho=$rho target=$f cap=$cap")
      }
      census.unpersist()
      ()
    }
  }

  test("the recommended mid cap recovers the subgroup tranche on the rho=0.3 arm; the hot tranche waits for the hot population") {
    val rho = 0.3
    val subTier = math.max(2, math.round(rho * groupSize).toInt) // 12
    val docs = family(rho)
    val s = spark
    import s.implicits._
    val census = NearDupStream.bucketCensus(docs.toDS()).persist()
    val pops = populations(docs)
    def mass(ms: Array[Long]): Double = ms.map(m => m * (m - 1) / 2.0).sum
    val fLow = mass(pops.filter(_ <= subTier)) / mass(pops)
    val capMid = NearDupStream.recommendCap(census, fLow)
    census.unpersist()
    val capSmall = 3
    assert(capSmall < capMid)

    val tp = truePairs(docs)
    assert(tp.size === groups * groupSize * (groupSize - 1) / 2,
      "every within-group pair must be a true near-dup on this family")
    val vFull = uncappedPairs(docs).intersect(tp)
    val vMid = streamed(docs, capMid, "reccap_mid30").intersect(tp)
    val vSmall = streamed(docs, capSmall, "reccap_small30").intersect(tp)
    // the measured r17 reading in miniature: recall is tiered, and the
    // recommended cap for the low tier's mass recovers that tranche
    assert(vSmall.size < vMid.size,
      s"mid cap $capMid recovered nothing over cap $capSmall " +
        s"(${vSmall.size} vs ${vMid.size})")
    assert(vMid.size < vFull.size,
      "the hot tranche must stay withheld below the hot population")

    // and the recovered mass IS subgroup-routed: same-subgroup verified
    // recall jumps at the recommended tier (cross-subgroup pairs still
    // route only through the hot all-boilerplate buckets)
    def sameSub(p: (Long, Long)): Boolean = {
      def sub(id: Long) = (id / groups) / subTier
      def grp(id: Long) = id % groups
      grp(p._1) == grp(p._2) && sub(p._1) == sub(p._2)
    }
    val nSameSub = tp.count(sameSub)
    assert(nSameSub > 0)
    val recSmall = vSmall.count(sameSub).toDouble / nSameSub
    val recMid = vMid.count(sameSub).toDouble / nSameSub
    assert(recMid > recSmall && recMid >= 0.2,
      s"subgroup tranche did not recover at cap $capMid: $recSmall -> $recMid")
  }
}
