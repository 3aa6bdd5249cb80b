package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-11 analytics gates — properties the
  * operators guarantee BY CONSTRUCTION, asserted on real data so a future
  * refactor that silently drops the guarantee fails loudly (the oracle
  * hash-match alone would keep passing if both sides broke the same way). */
class InvariantSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_apportion: final quotas sum EXACTLY to the slot budget (the Hamilton invariant)") {
    val out = graft.queries.Relational8.qApportion(spark, dir)
    val total = out.agg(sum(col("final_quota"))).as[Long].head()
    assert(total == 1000L, s"quota sum must equal the budget, got $total")
    // base quotas alone must under-allocate (the remainders exist)
    val base = out.agg(sum(col("base_quota"))).as[Long].head()
    assert(base <= 1000L)
    // every extra is 0 or 1 — largest-remainder never grants two
    val badExtra = out.filter(col("extra") < 0 || col("extra") > 1).count()
    assert(badExtra == 0)
  }

  test("q_growth_acct: new + retained + resurrected == actives on every day; churn consistent") {
    val out = graft.queries.Relational8.qGrowthAcct(spark, dir)
      .select(col("n_active"), col("n_new") + col("n_retained") + col("n_resurrected"),
        col("n_churned"))
      .as[(Long, Long, Option[Long])].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, s, _) => a == s }, "decomposition identity violated")
    // churn can never be negative: retained(d) <= active(d-1) by definition
    assert(out.forall(_._3.forall(_ >= 0L)), "negative churn")
  }

  test("e_hwm_extract: the two windows PARTITION the table — counts and checksums recompose") {
    val m = graft.queries.Etl3.eHwmExtract(spark, dir)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("w1_upto_mark")._1 + m("w2_after_mark")._1 == m("full_table")._1)
    assert(m("w1_plus_w2") == m("full_table"),
      "recomposed checksum must equal the full table's")
  }

  test("e_hash_chain: exactly the tampered customers break; everyone else's chain is intact") {
    val out = graft.queries.Etl3.eHashChain(spark, dir)
      .select(col("o_custkey"), col("chain_intact")).as[(Long, Boolean)].collect()
    val broken = out.filter(!_._2).map(_._1).toSet
    // the replica tampers orders with o_orderkey % 1009 == 0 — their owners
    val expected = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 1009 === 0)
      .select(col("o_custkey")).distinct().as[Long].collect().toSet
    assert(broken == expected, s"broken=$broken expected=$expected")
  }

  test("q_weighted_median: the crossing price carries at least half the weight on both sides") {
    val rows = graft.queries.Relational8.qWeightedMedian(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((flag, tot, wm) <- rows) {
      val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
      val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === flag)
        .select((col("l_extendedprice").cast(d18) * lit(1000000L)).cast("long").as("p"),
          (col("l_quantity").cast(d18) * lit(1000000L)).cast("long").as("w"))
      val wmI = math.round(wm * 1000000.0)
      val below = li.filter(col("p") <= wmI).agg(sum(col("w"))).as[Long].head()
      val above = li.filter(col("p") >= wmI).agg(sum(col("w"))).as[Long].head()
      assert(2 * below >= tot, s"$flag: mass at or below the median is under half")
      assert(2 * above >= tot, s"$flag: mass at or above the median is under half")
    }
  }

  test("q_spearman: rho in [-1,1] and recomposes exactly from the emitted exact sums") {
    // midrank semantics: sum_d2x4 is Σd² in QUARTER units (midranks carried
    // as 2·midrank integers), so rho = 1 − 1.5·sum_d2x4/(n(n²−1))
    val rows = graft.queries.Relational9.qSpearman(spark, dir)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((nk, n, d2x4, rho) <- rows) {
      assert(rho >= -1.0 && rho <= 1.0, s"nation $nk: rho=$rho")
      val recomposed = BigDecimal(1.0 - 1.5 * d2x4 / (n.toDouble * (n.toDouble * n - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(recomposed - rho) <= 1e-6, s"nation $nk: $recomposed vs $rho")
    }
  }

  test("q_mann_whitney: U within [0, n1*n2]; z sign agrees with U vs its midpoint") {
    // midrank semantics: u1x2 = 2·U₁ (midranks can be half-integers);
    // z's midpoint test runs in the same doubled units
    val rows = graft.queries.Relational9.qMannWhitney(spark, dir)
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(rows.nonEmpty)
    for ((t, n1, n2, u1x2, zOpt) <- rows) {
      assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2, s"$t: 2U=$u1x2 outside [0, ${2 * n1 * n2}]")
      val z = zOpt.getOrElse(fail(s"$t: z null — zero tie-corrected variance on real data"))
      val mid2 = n1.toDouble * n2
      assert((z > 0) == (u1x2 > mid2) || z == 0.0, s"$t: z=$z disagrees with 2U=$u1x2 mid=$mid2")
    }
  }

  test("q_simpson: diversity in [0, 1 - 1/k] — the k-type ceiling") {
    val rows = graft.queries.Relational9.qSimpson(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((c, _, k, d) <- rows) {
      assert(d >= 0.0 && d <= 1.0 - 1.0 / k + 1e-6, s"cohort $c: $d exceeds the $k-type ceiling")
    }
  }

  test("q_winsorize: the winsorized mean lies inside the clamp bounds") {
    val rows = graft.queries.Relational9.qWinsorize(spark, dir)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((nk, _, lo, hi, wm) <- rows)
      assert(lo - 1e-6 <= wm && wm <= hi + 1e-6, s"nation $nk: $wm outside [$lo, $hi]")
  }

  test("q_moments: kurtosis >= skewness^2 - 2 (the universal moment inequality)") {
    val rows = graft.queries.Relational9.qMoments(spark, dir)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((nk, _, _, sk, ku) <- rows)
      assert(ku >= sk * sk - 2.0 - 1e-6, s"nation $nk: kurt=$ku < skew^2-2=${sk * sk - 2}")
  }

  test("q_local_cc: cc in [0,1] and triangles never exceed the wedge capacity") {
    val rows = graft.queries.GraphQ.qLocalCc(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((v, deg, tri, cc) <- rows) {
      assert(cc >= 0.0 && cc <= 1.0 + 1e-9, s"v=$v: cc=$cc")
      assert(2 * tri <= deg * (deg - 1), s"v=$v: tri=$tri exceeds deg=$deg capacity")
    }
  }

  test("q_assortativity: the mixing coefficient is a correlation — |r| <= 1") {
    val r = graft.queries.GraphQ.qAssortativity(spark, dir)
      .select(col("assortativity")).as[Double].head()
    assert(math.abs(r) <= 1.0 + 1e-9, s"r=$r")
  }

  test("t_rake: phrases are stopword-free, at most 4 tokens, positively scored") {
    val stop = graft.functions.TextFunctions.Stopwords.toSet
    val rows = graft.queries.Text2.tRake(spark, dir)
      .select(col("phrase"), col("len"), col("score")).as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((p, len, score) <- rows) {
      val words = p.split(" ")
      assert(words.length <= 4 && words.length == len, s"'$p' len mismatch")
      assert(!words.exists(stop), s"'$p' contains a stopword")
      assert(score > 0.0, s"'$p' score=$score")
    }
  }

  test("t_jsonl_export: every record round-trips through from_json with exact field recovery") {
    val schema = "id BIGINT, lang STRING, source STRING, text STRING"
    val bad = Tables.documents(spark, dir)
      .withColumn("record", graft.queries.Text2.jsonlRecord)
      .withColumn("back", from_json(col("record"), org.apache.spark.sql.types.StructType.fromDDL(schema)))
      .filter(col("back.id") =!= col("doc_id") || col("back.lang") =!= col("lang") ||
        col("back.source") =!= col("source") || col("back.text") =!= col("text") ||
        col("back.id").isNull)
      .count()
    assert(bad == 0L, s"$bad records failed the JSON round-trip")
  }

  test("s_ndcg: dcg <= idcg, ndcg in [0,1], and 5 hits means a perfect 1.0") {
    val rows = graft.queries.Similarity2.sNdcg(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((q, hits, dcg, idcg, ndcg) <- rows) {
      assert(dcg <= idcg + 1e-9, s"q=$q: dcg=$dcg > idcg=$idcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"q=$q: ndcg=$ndcg")
      if (hits == 5) assert(ndcg == 1.0, s"q=$q: 5 hits must score exactly 1.0, got $ndcg")
    }
  }

  test("s_knn_classify: per-class accuracies in [0,1]; query counts cover the whole panel") {
    val rows = graft.queries.Similarity2.sKnnClassify(spark, dir)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, c, a) => c <= n && a >= 0.0 && a <= 1.0 })
    val panel = Tables.embeddings(spark, dir).filter(col("vec_id") % 50 === 0).count()
    assert(rows.map(_._2).sum == panel, "every panel query must be classified")
  }

  test("st_cep: each click matches at most once, strictly inside the window, type-correct") {
    val m = graft.queries.Modal3.stCep(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(m.nonEmpty)
    assert(m.map(_._2).distinct.length == m.length, "a click matched twice")
    assert(m.forall { case (_, _, _, lat) => lat > 0 && lat < 1800000000L },
      "latency must sit strictly inside the 30min window")
    val types = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type")).as[(Long, String)].collect().toMap
    assert(m.forall { case (_, a, b, _) => types(a) == "click" && types(b) == "purchase" })
  }

  test("holtFoldSeries: the Scala twin equals the SQL fold on SHORT series (the cold-start off-by-one)") {
    // the α/β contraction hides an init off-by-one on long series — only
    // short exact-value checks catch it (review finding: an xs.drop(2)
    // variant shipped and passed the long-series twin test while
    // diverging on every 3-5 point series)
    for (xs <- Seq(Seq(10L, 20L, 30L), Seq(7L, 19L, 4L, 40L, 12L), Seq(5L, 5L))) {
      val sql = spark.range(1)
        .select(typedLit(xs).as("revs"))
        .selectExpr(s"(${graft.queries.Events.holtFold}) AS st")
        .select(col("st.level"), col("st.trend")).as[(Long, Long)].head()
      val scalaTwin = graft.streaming.Streaming.holtFoldSeries(None, xs).get
      assert(scalaTwin == sql, s"series $xs: scala $scalaTwin != sql $sql")
    }
  }

  test("q_holt: the integer-micro fold recovers a perfect line EXACTLY (level=last, trend=slope)") {
    val revs = (0 until 24).map(t => 5000000L + 137000L * t)
    val st = spark.range(1).select(typedLit(revs).as("revs"))
      .selectExpr(s"(${graft.queries.Events.holtFold}) AS st")
      .select(col("st.level"), col("st.trend")).as[(Long, Long)].head()
    assert(st._1 == revs.last, s"level=${st._1} must equal the last point ${revs.last}")
    assert(st._2 == 137000L, s"trend=${st._2} must equal the slope")
  }

  test("q_bollinger: bands bracket the trailing mean; breakouts sit outside the bands") {
    val rows = graft.queries.Relational9.qBollinger(spark, dir)
      .select(col("rev"), col("mean7"), col("lower"), col("upper"), col("is_breakout"))
      .as[(Double, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    for ((rev, m, lo, hi, brk) <- rows) {
      assert(lo <= m + 1e-9 && m <= hi + 1e-9, s"bands must bracket the mean: $lo $m $hi")
      if (brk) assert(rev <= lo + 1e-6 || rev >= hi - 1e-6, s"flagged $rev inside ($lo, $hi)")
      else assert(rev >= lo - 1e-6 && rev <= hi + 1e-6, s"unflagged $rev outside [$lo, $hi]")
    }
    assert(rows.exists(_._5), "the sf data must exercise at least one breakout")
  }

  test("q_ols: R^2 in [0,1] and the fitted line passes through the mean point") {
    val rows = graft.queries.Relational9.qOls(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((flag, n, slope, intercept, r2) <- rows) {
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"$flag: r2=$r2")
      val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
      val mm = Tables.lineitem(spark, dir).filter(col("l_returnflag") === flag)
        .agg(sum((col("l_discount").cast(d18) * lit(100L)).cast("long")).as("sx"),
          sum(col("l_quantity").cast("long")).as("sy"))
        .as[(Long, Long)].head()
      val (mx, my) = (mm._1.toDouble / n, mm._2.toDouble / n)
      assert(math.abs(my - (slope * mx + intercept)) < 1e-6,
        s"$flag: the OLS line must pass through the mean point")
    }
  }

  test("t_fertility: pure-ASCII word soup has fertility exactly 1; planted CJK pays the piece tax") {
    // the synthetic corpus is ASCII word soup under every lang label, so
    // the word tokenizer and the BPE-ish splitter agree token-for-token —
    // fertility must be EXACTLY 1.0 for every slice (a drift here means
    // the two tokenizers diverged)
    val m = graft.queries.Text2.tFertility(spark, dir)
      .select(col("lang"), col("fertility"), col("bytes_per_piece"))
      .as[(String, Double, Double)].collect()
    assert(m.nonEmpty)
    assert(m.forall(_._2 == 1.0), s"ASCII fertility must be exactly 1.0: ${m.mkString(",")}")
    assert(m.forall(_._3 > 1.0), "pieces are at least one byte plus separators")
    // the piece tax itself, verified on planted text: punctuation is
    // invisible to the word tokenizer but each mark is a BPE piece
    import graft.functions.TextFunctions.{bpeTokenCount, tokens}
    val planted = spark.createDataFrame(Seq(Tuple1("Hello, world! (ok?)"))).toDF("text")
      .select(size(tokens(col("text"))).as("words"), bpeTokenCount(col("text")).as("pieces"))
      .as[(Int, Long)].head()
    assert(planted._2 > planted._1,
      s"punctuated text must explode: ${planted._2} pieces vs ${planted._1} words")
  }

  test("t_langid_margin: the routing counts partition consistently; English resolves confidently") {
    val rows = graft.queries.Text2.tLangidMargin(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((lang, n, nohit, amb, conf, mx) <- rows) {
      assert(nohit + amb + conf <= n, s"$lang: buckets overlap")
      assert(mx >= 0, s"$lang: negative margin")
    }
    val en = rows.find(_._1 == "en").get
    assert(en._5 > 0, "some English docs must resolve confidently")
  }

  test("e_dq_score: scores capped at 100; the known lineitem dup wart scores below clean tables") {
    val rows = graft.queries.Etl3.eDqScore(spark, dir)
      .select(col("table_name"), col("dup_rows"), col("dq_score"))
      .as[(String, Long, Double)].collect()
    val m = rows.map(r => r._1 -> r).toMap
    assert(rows.forall(_._3 <= 100.0 + 1e-9))
    assert(m("lineitem")._2 > 0, "the synthetic lineitem dup must fire")
    assert(m("lineitem")._3 < m("customer")._3, "the dup wart must cost lineitem score")
  }

  test("s_probe_cost: cost grows monotonically with nprobe; probing every bucket scans the corpus") {
    val rows = graft.queries.Similarity2.sProbeCost(spark, dir)
      .select(col("nprobe"), col("n_queries"), col("total_candidates"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 >= a._3; case _ => true },
      "candidates must be monotone in nprobe")
    val full = rows.last
    val n = Tables.embeddings(spark, dir).count()
    if (full._1 >= 8) // 8 centroids: probing all buckets scans everyone but self
      assert(full._3 == full._2 * (n - 1), s"full probe must scan the corpus: $full vs n=$n")
  }

  test("q_ndr: week-0 retention is exactly 1.0 for every cohort; all NDRs positive") {
    val rows = graft.queries.Relational9.qNdr(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.filter(_._2 == 0L).forall(_._4 == 1.0), "week 0 must self-normalize to 1.0")
    assert(rows.forall(_._4 > 0.0))
  }

  test("q_drawdown: peak is a running max (never decreases, never below rev); drawdown consistent") {
    val rows = graft.queries.Relational9.qDrawdown(spark, dir)
      .select(col("rev"), col("peak"), col("drawdown")).as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    var seen = Double.MinValue
    for ((rev, peak, dd) <- rows) {
      assert(peak >= rev - 1e-9, "peak below the day's own revenue")
      assert(peak >= seen - 1e-9, "the running max decreased")
      seen = math.max(seen, peak)
      assert(math.abs(dd - (peak - rev)) < 1e-6, "drawdown identity broken")
    }
  }

  test("q_pvm_bridge: the bridge closes EXACTLY — price + volume + mix == matched delta") {
    val rows = graft.queries.Relational9.qPvmBridge(spark, dir)
      .select(col("price_effect"), col("volume_effect"), col("mix_effect"), col("delta_matched"))
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((pe, ve, mix, dr) <- rows)
      assert(math.abs(pe + ve + mix - dr) < 1e-6,
        s"bridge must close: $pe + $ve + $mix != $dr")
  }

  test("q_rev_rec: recognized revenue closes to the order-book total TO THE CENT") {
    val recognized = graft.queries.Relational9.qRevRec(spark, dir)
      .select(col("recognized")).as[Double].collect()
      .map(v => math.round(v * 100.0)).sum // recover exact monthly cents
    val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
    val booked = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .agg(sum((col("o_totalprice").cast(d18) * lit(100L)).cast("long"))).as[Long].head()
    assert(recognized == booked,
      s"proration must close exactly: recognized $recognized vs booked $booked cents")
  }

  test("q_backlog: the curve never goes negative and ends at opened-minus-closed") {
    val rows = graft.queries.Relational9.qBacklog(spark, dir)
      .select(col("n_opened"), col("n_closed"), col("backlog"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0L), "an order cannot close before it opens")
    assert(rows.last._3 == rows.map(_._1).sum - rows.map(_._2).sum,
      "the final backlog must equal total opened minus total closed")
  }

  test("t_oov: rates in [0,1]; the planted unseen tokens actually fire the OOV path") {
    val rows = graft.queries.Text2.tOov(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, oov, r) => oov <= n && r >= 0.0 && r <= 1.0 })
    assert(rows.map(_._3).sum > 0L,
      "the planted qzv tokens must register as OOV — a 0 here means the counting path is dead")
  }

  test("m_subtitle_align: spanning cues bounded by cue count; hits bounded below by spanning cues") {
    val rows = graft.queries.Modal3.mSubtitleAlign(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((d, nCues, hits, spanning) <- rows) {
      assert(spanning <= nCues, s"doc $d: spanning > cues")
      assert(hits >= spanning, s"doc $d: hits < spanning cues")
    }
  }

  // ---------------------------------------------------- round-12 additions

  test("q_ks_test: D in [0,1], exact numerator bounded by n1*n2, significance consistent") {
    // d_num is BIGINT at the gate boundary since the r15 output-typing
    // contract (DECIMAL arithmetic stays internal to the gate)
    val rows = graft.queries.Relational10.qKsTest(spark, dir)
      .as[(String, Long, Long, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    for ((t, n1, n2, dNum, d, crit, sig) <- rows) {
      assert(dNum >= 0 && BigDecimal(dNum) <= BigDecimal(n1) * BigDecimal(n2),
        s"$t: d_num=$dNum outside [0, ${BigDecimal(n1) * BigDecimal(n2)}]")
      assert(d >= 0.0 && d <= 1.0, s"$t: D=$d")
      assert(crit > 0.0)
      // 6-decimal-pinned d/crit must agree with the raw-compared flag
      // except inside one rounding ulp of the boundary
      if (math.abs(d - crit) > 2e-6) assert(sig == (d > crit), s"$t: flag inconsistent")
    }
  }

  test("q_runs_test: run count within [1, n1+n2]; mu inside the same band") {
    val (n1, n2, runs, mu, _) = graft.queries.Relational10.qRunsTest(spark, dir)
      .as[(Long, Long, Long, Double, Option[Double])].head()
    assert(n1 > 0 && n2 > 0, "median split must populate both sides")
    assert(runs >= 1 && runs <= n1 + n2, s"runs=$runs outside [1, ${n1 + n2}]")
    assert(mu >= 1.0 && mu <= (n1 + n2).toDouble + 1.0)
  }

  test("q_cramers_v: V in [0,1] and recomposes from the emitted chi-square") {
    val (n, r, c, chi2, v) = graft.queries.Relational10.qCramersV(spark, dir)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r >= 2 && c >= 2, "contingency table must be at least 2x2")
    assert(chi2 >= 0.0 && v >= 0.0 && v <= 1.0 + 1e-6, s"v=$v")
    val recomposed = math.sqrt(chi2 / (n.toDouble * math.min(r - 1, c - 1)))
    assert(math.abs(recomposed - v) <= 1e-5, s"$recomposed vs $v")
  }

  test("e_reconcile: classification nests (exact <= within-cent <= orders) and covers every order") {
    val rows = graft.queries.Etl4.eReconcile(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((st, n, exact, cent, off, drift, share) <- rows) {
      assert(exact <= cent && cent <= n, s"$st: nesting broken")
      assert(off == n - cent && drift >= 0, s"$st: off/drift inconsistent")
      assert(share >= 0.0 && share <= 1.0)
    }
    val total = rows.map(_._2).sum
    assert(total == Tables.orders(spark, dir).count(), "every order must be classified")
  }

  test("e_late_arrivals: grace misses nest inside late; delays bounded by the 48h cap") {
    val rows = graft.queries.Etl4.eLateArrivals(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((day, n, late, pastGrace, maxH, lateShare, graceShare) <- rows) {
      assert(pastGrace <= late && late <= n, s"day $day: nesting broken")
      assert(maxH <= 48, s"day $day: delay ${maxH}h past the 48h generator cap")
      assert(graceShare <= lateShare + 1e-9)
    }
    assert(rows.map(_._3).sum > 0, "the 0-48h delay generator must produce SOME late rows")
  }

  test("t_astral: the planted emoji runs are all counted — routing can never silently zero") {
    val rows = graft.queries.Text2.tAstral(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    val plantedDocs = docs.count(_._1 % 13 == 0)
    val plantedCp = docs.filter(_._1 % 13 == 0).map(d => 1 + d._1 % 3).sum
    assert(rows.map(_._3).sum >= plantedDocs, "every planted doc must route")
    assert(rows.map(_._4).sum >= plantedCp, "every planted codepoint must count")
    rows.foreach { case (lang, n, routed, cp, share) =>
      assert(routed <= n && cp >= routed, s"$lang: counts inconsistent")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("s_margin: cos1 >= cos2 (margin never negative), cosines in [-1,1]") {
    val rows = graft.queries.Similarity2.sMargin(spark, dir)
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    for ((q, _, c1, c2, m, _) <- rows) {
      assert(c1 >= c2 - 1e-9 && m >= -1e-6, s"q $q: rank-1 below rank-2")
      assert(c1 >= -1.0 - 1e-9 && c1 <= 1.0 + 1e-9 && c2 >= -1.0 - 1e-9 && c2 <= 1.0 + 1e-9)
    }
  }

  test("m_aspect_bucket: every image lands in exactly one bucket; ratio ranges are ordered") {
    val rows = graft.queries.Modal4.mAspectBucket(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == Tables.documents(spark, dir).count(),
      "bucket populations must partition the corpus")
    rows.foreach { case (b, _, minW, maxW, minR, maxR) =>
      assert(minW <= maxW && minR <= maxR + 1e-9, s"$b: ranges inverted")
    }
  }

  test("q_mk_trend: S bounded by the pair count; variance numerator positive") {
    val (n, sStat, varNum, _, _) = graft.queries.Relational10.qMkTrend(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(n >= 2)
    assert(math.abs(sStat) <= n * (n - 1) / 2, s"S=$sStat exceeds the pair count")
    assert(varNum > 0, "tie-corrected variance must be positive on a non-constant series")
  }

  test("q_changepoint: the split partitions the day frame; means recompose around the global mean") {
    val (_, k, nAfter, score, mB, mA) = graft.queries.Relational10.qChangepoint(spark, dir)
      .as[(java.sql.Date, Long, Long, Long, Double, Double)].head()
    assert(k >= 1 && nAfter >= 1, "split must leave both segments non-empty")
    assert(score > 0, "a constant series cannot be the argmax on real data")
    val n = k + nAfter
    val globalMean = (mB * k + mA * nAfter) / n
    assert(mB.min(mA) <= globalMean && globalMean <= mB.max(mA),
      "weighted segment means must bracket the global mean")
  }

  test("e_interval_audit: planted gap and overlap classes both fire; classes partition the pairs") {
    val rows = graft.queries.Etl4.eIntervalAudit(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, pairs, gaps, overlaps, ok) =>
      assert(gaps + overlaps + ok == pairs, s"bucket $b: classes must partition")
    }
    assert(rows.map(_._3).sum > 0, "planted %17 gaps must fire")
    assert(rows.map(_._4).sum > 0, "planted %19 overlaps must fire")
  }

  test("s_calibration: precision within [0,1]; pair mass = 5 per query") {
    val rows = graft.queries.Similarity2.sCalibration(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bin, n, same, p) =>
      assert(same <= n && p >= 0.0 && p <= 1.0, s"bin $bin inconsistent")
    }
    val nq = Tables.embeddings(spark, dir).filter(col("vec_id") % 50 === 0).count()
    assert(rows.map(_._2).sum == 5 * nq, "every query must contribute exactly 5 pairs")
  }

  test("t_len_hist: bins partition the corpus and ranges respect the bin boundaries") {
    val rows = graft.queries.Text2.tLenHist(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == Tables.documents(spark, dir).count())
    rows.foreach { case (lang, bin, _, minC, maxC, _) =>
      assert(minC >= (1L << bin) && maxC < (1L << (bin + 1)),
        s"$lang/bin $bin: [$minC,$maxC] outside [2^$bin, 2^${bin + 1})")
    }
  }

  test("m_wav_meta: the header walk agrees with the JDK writer on every field") {
    val rows = graft.queries.Modal4.mWavMeta(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, af, ch, rate, bits, dataBytes, durMs) =>
      assert(af == 1 && ch == 1 && bits == 16, s"doc $id: PCM mono 16-bit expected")
      assert(rate == 8000 * (1 + id % 3), s"doc $id: rate mismatch")
      assert(dataBytes == (400 + (id % 5) * 200) * 2, s"doc $id: data size mismatch")
      assert(durMs == dataBytes / 2 * 1000 / rate)
    }
  }

  test("q_topn_share: the share is in (0,1] and bounded below by 10/n customers' uniform share") {
    val (n, top, tot, share) = graft.queries.Relational10.qTopnShare(spark, dir)
      .as[(Long, Long, Long, Double)].head()
    assert(top <= tot && share > 0.0 && share <= 1.0)
    assert(share >= math.min(1.0, 10.0 / n) - 1e-6,
      "top-10 can never hold less than a uniform 10/n of revenue")
  }

  test("t_vocab_growth: vocabulary and doc counts are monotone over the prefix ladder") {
    val rows = graft.queries.Text2.tVocabGrowth(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(10L, 25L, 50L, 100L))
    rows.sliding(2).foreach { case Array((_, d1, v1, _), (p, d2, v2, _)) =>
      assert(d1 <= d2 && v1 <= v2, s"prefix $p: growth must be monotone")
    }
    val total = Tables.documents(spark, dir).count()
    assert(rows.last._2 == total, "the 100% checkpoint must cover the corpus")
  }

  test("q_holt_backtest: error mass recomposes exactly (mae*n*1e6 == sae) and WAPE is sane") {
    val rows = graft.queries.Events.qHoltBacktest(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((p, n, sae, mass, wape, mae) <- rows) {
      assert(n >= 2 && sae >= 0 && mass > 0, s"$p: degenerate backtest")
      assert(wape >= 0.0, s"$p: wape=$wape")
      // mae is the 6-decimal pinning of sae/(n*1e6) — recompose within one ulp of the pin
      val recomposed = BigDecimal(sae.toDouble / n / 1000000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(recomposed - mae) <= 1e-6, s"$p: $recomposed vs $mae")
    }
  }

  test("q_power: required n recomposes from the emitted mean/variance; positive throughout") {
    val rows = graft.queries.Relational10.qPower(spark, dir)
      .as[(String, Long, Double, Double, Option[Long])].collect()
    assert(rows.nonEmpty)
    for ((t, n, mean, varr, nReqOpt) <- rows) {
      assert(n >= 2 && varr >= 0.0, s"$t: degenerate inputs")
      val nReq = nReqOpt.getOrElse(fail(s"$t: n_required null on positive-mean data"))
      // recompose within the 6-decimal pinning of the emitted mean/var
      val delta = 0.05 * mean
      val expected = math.ceil(2.0 * 2.802 * 2.802 * varr / (delta * delta)).toLong
      assert(math.abs(nReq - expected) <= math.max(1L, expected / 1000),
        s"$t: n_required=$nReq vs recomposed $expected")
    }
  }

  test("q_otif: the service ladder nests (30d <= 60d <= 90d <= lines)") {
    val rows = graft.queries.Relational10.qOtif(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((p, n, d30, d60, d90, maxLag, o30, o90) <- rows) {
      assert(d30 <= d60 && d60 <= d90 && d90 <= n, s"$p: ladder must nest")
      assert(o30 <= o90 + 1e-9 && o90 <= 1.0)
      assert(maxLag >= 0)
    }
  }

  test("t_code_fence: planted fences all count; docs-with-code bounded by docs") {
    val rows = graft.queries.Text2.tCodeFence(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long].collect()
    val plantedBlocks = docs.filter(_ % 23 == 0).map(id => 1 + id % 2).sum
    assert(rows.map(_._4).sum >= plantedBlocks, "every planted fence must count")
    rows.foreach { case (lang, n, withCode, blocks, share) =>
      assert(withCode <= n && blocks >= withCode, s"$lang: counts inconsistent")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("st_bus_hourly: the topic's full offset range lands in the windows — no loss, no dup") {
    val rows = graft.queries.Modal4.stBusHourly(spark, dir)
      .as[(Long, String, Long, Option[Double])].collect()
    assert(rows.map(_._3).sum == 5000L, "window row mass must equal the topic size")
    assert(rows.map(_._2).distinct.sorted.toSeq ==
      Seq("click", "purchase", "refund", "signup", "view"))
  }
}
