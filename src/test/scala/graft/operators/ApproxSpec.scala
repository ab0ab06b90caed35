package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** The sketch-stat accuracy contracts. Since r11 both queries are
  * hash-verified against a DuckDB replay of the SAME sketches (KMV,
  * grid-quantile, CMS), so this spec guards the ESTIMATOR quality —
  * the gate only proves both engines agree, not that the sketch is
  * any good. */
class ApproxSpec extends SparkTestBase {

  test("q_approx_stats: KMV within 1/sqrt(k) bounds, grid median within one cell of exact p45-p55") {
    import spark.implicits._
    val approx = RelationalExt.qApproxStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        count_distinct($"user_id").as("u"),
        percentile($"value", lit(0.45)).as("p45"),
        percentile($"value", lit(0.55)).as("p55"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((et, (users, p50)) <- approx) {
      val (exactUsers, p45, p55) = exact(et)
      // KMV k=64: exact below k, ~1/sqrt(64)=12.5% typical above it —
      // bound at 4 standard errors
      val tol =
        if (exactUsers < RelationalExt.ApproxKmvK) 0.0
        else exactUsers * 4.0 / math.sqrt(RelationalExt.ApproxKmvK.toDouble)
      assert(math.abs(users - exactUsers) <= tol + 1e-9,
        s"$et: KMV $users vs exact $exactUsers (tol $tol)")
      // the 0.1-grid median is within one grid cell of a true median
      assert(p50 >= p45 - 0.1 - 1e-9 && p50 <= p55 + 0.1 + 1e-9,
        s"$et: grid median $p50 outside exact [$p45, $p55] ± 0.1")
    }
  }

  test("q_heavy_hitters: CMS one-sided error bound and determinism") {
    import spark.implicits._
    val got = EventAnalytics.qHeavyHittersCms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 10)
    val n = graft.Tables.events(spark, sfDir).count()
    val eps = math.E / EventAnalytics.CmsWidth // ε = e/w
    got.foreach { case (u, truth, est) =>
      // Count-Min never underestimates...
      assert(est >= truth, s"user $u: est $est < true $truth")
      // ...and overestimates by at most eps*N at the sketch's
      // confidence; allow 3x slack for the tail
      assert(est <= truth + (3 * eps * n).toLong + 1, s"user $u: est $est vs $truth (N=$n)")
    }
    // deterministic across runs (seedless replayable hashing)
    val again = EventAnalytics.qHeavyHittersCms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("q_approx_stats: deterministic across runs (rows-only gate safety)") {
    val fn = graft.SparkEntry.queries("q_approx_stats")
    val r1 = fn(spark, sfDir).collect().toSeq
    val r2 = fn(spark, sfDir).collect().toSeq
    assert(r1 == r2)
  }

  test("q_xcorr_lags: integer power-sum Pearson matches a driver replica") {
    import spark.implicits._
    val counts = Tables.events(spark, sfDir)
      .select($"event_type", floor(unix_micros($"ts") / 3600000000.0).cast("long").as("hr"))
      .groupBy($"event_type", $"hr").count()
      .as[(String, Long, Long)].collect()
    val a = counts.filter(_._1 == "error").map(c => c._2 -> c._3).toMap
    val b = counts.filter(_._1 == "purchase").map(c => c._2 -> c._3).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = (0L to 6L).flatMap { lag =>
      val pairs = a.toSeq.flatMap { case (h, x) => b.get(h + lag).map(y => (x, y)) }
      if (pairs.isEmpty) None else {
        val n = pairs.length.toLong
        val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
        val sxy = pairs.map(p => p._1 * p._2).sum
        val (sxx, syy) = (pairs.map(p => p._1 * p._1).sum, pairs.map(p => p._2 * p._2).sum)
        val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        val r = if (den > 0) (n * sxy - sx * sy).toDouble / math.sqrt(den.toDouble) else 0.0
        Some((lag, n, r6(r)))
      }
    }.toSet
    val got = EventAnalytics.qXcorrLags(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == expected)
  }

  test("q_decayed_revenue: decayed mass bounded by raw, fresh day dominates") {
    val got = EventAnalytics.qDecayedRevenue(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (et, n, raw, dec) =>
      assert(n > 0 && raw > 0)
      assert(dec > 0 && dec < raw, s"$et: decayed $dec vs raw $raw")
    }
  }

  test("q_bisect_median: sort-free bisection agrees with Spark's exact percentile") {
    import spark.implicits._
    val got = EventAnalytics.qBisectMedian(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), percentile($"value", lit(0.5)).as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    got.foreach { case (g, (n, med)) =>
      val (en, emed) = exact(g)
      assert(n == en)
      // bisection runs on the cent grid; Spark interpolates raw
      // doubles — they agree to within half a cent + rounding
      assert(math.abs(med - emed) <= 0.0051, s"$g: bisect $med vs percentile $emed")
    }
  }

  test("q_kmv_distinct: matches a driver-side bottom-k replica, estimator engaged") {
    import spark.implicits._
    val k = EventAnalytics.KmvK
    val rows = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id").as[(String, Long)].collect()
    def unsigned(h: Long): BigInt = BigInt(h) & ((BigInt(1) << 64) - 1)
    val expected = rows.groupBy(_._1).map { case (et, es) =>
      val users = es.map(_._2).distinct
      val hs = users.map(u => unsigned(graft.functions.Hashes.mix64(graft.functions.Hashes.fnv64(u.toString))))
        .distinct.sorted.take(k)
      val est =
        if (hs.size < k) hs.size.toDouble
        else (k - 1).toDouble * 1.8446744073709552e19 / hs.last.toDouble
      (et, (users.length.toLong, hs.size.toLong, est))
    }
    val got = EventAnalytics.qKmvDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == expected.keySet && got.nonEmpty)
    got.foreach { case (et, (nExact, nSketch, estR, relErr)) =>
      val (expExact, expSketch, expEst) = expected(et)
      assert(nExact == expExact && nSketch == expSketch, s"$et counts")
      assert(nSketch == k, s"$et: estimator path not engaged (distinct <= k)")
      assert(math.abs(estR - math.floor(expEst * 100 + 0.5) / 100) < 1e-9,
        s"$et: est $estR vs replica $expEst")
      // k=8 is a coarse sketch; still demand same order of magnitude
      assert(relErr < 2.0, s"$et: rel_err $relErr out of range")
    }
  }

  test("q_gap_fill_interpolate: spine complete, observed days exact, gaps between neighbors") {
    import spark.implicits._
    val rows = RelationalExt.qGapFillInterpolate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // the spine is gap-free: consecutive calendar days
    val days = rows.map(_._1)
    val d0 = java.time.LocalDate.parse(days.head)
    days.zipWithIndex.foreach { case (d, i) =>
      assert(java.time.LocalDate.parse(d) == d0.plusDays(i), s"spine gap at $d")
    }
    // interpolated values sit between their neighbors' observed values
    val obs = rows.zipWithIndex.filter(_._1._2).map(_._2)
    rows.zipWithIndex.filterNot(_._1._2).foreach { case ((d, _, v), i) =>
      val lo = obs.filter(_ < i).max; val hi = obs.filter(_ > i).min
      val (a, b) = (rows(lo)._3, rows(hi)._3)
      assert(v >= math.min(a, b) - 0.01 && v <= math.max(a, b) + 0.01,
        s"$d: $v outside [$a, $b]")
    }
    assert(rows.exists(!_._2), "test window must actually contain gaps")
  }

  test("q_window_ranks: definitions hold on a unique total order") {
    val rows = RelationalExt.qWindowRanks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nByType = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (t, rn) = (r.getString(0), r.getLong(1))
      val n = nByType(t).toDouble
      // unique tiebreak ⇒ rank == row_number == dense_rank, and the
      // distribution functions take their closed forms
      assert(r.getLong(6) == rn, s"$t dense_rank")
      assert(math.abs(r.getDouble(4) - math.floor((rn - 1) / (n - 1) * 1e8 + 0.5) / 1e8) < 1e-9,
        s"$t percent_rank")
      assert(math.abs(r.getDouble(5) - math.floor(rn / n * 1e8 + 0.5) / 1e8) < 1e-9,
        s"$t cume_dist")
    }
  }

  test("q_lorenz_revenue: shares sum to 1, curve concave, customers conserved") {
    import spark.implicits._
    val rows = RelationalExt.qLorenzRevenue(spark, sfDir).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val nCust = Tables.orders(spark, sfDir).select($"o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-6, "cumulative ends at 1")
    // descending-rank deciles ⇒ per-decile shares are non-increasing
    val shares = rows.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"shares not monotone: ${shares.toSeq}")
    // the top decile must out-earn the uniform share (real skew)
    assert(shares.head > 0.1, s"no concentration: top share ${shares.head}")
  }

  test("q_growth_accounting: the accounting identity holds every day") {
    val rows = EventAnalytics.qGrowthAccounting(spark, sfDir).collect()
      .sortBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"${r.getString(0)}: DAU != new + retained + resurrected")
    }
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        // DAU_{t-1} = retained_t + churned_t
        assert(prev.getLong(1) == cur.getLong(3) + cur.getLong(5),
          s"${cur.getString(0)}: yesterday's DAU != retained + churned")
      case _ =>
    }
    // every user is new exactly once
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nUsers)
  }

  test("q_time_to_convert: bisected quantiles equal sorted-list order statistics") {
    import spark.implicits._
    val r = EventAnalytics.qTimeToConvert(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val lats = byUser.values.flatMap { es =>
      val signups = es.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) None
      else {
        val s0 = signups.min
        val ps = es.filter(e => e._2 == "purchase" && e._3 > s0).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - s0) / 60000000L)
      }
    }.toSeq.sorted
    assert(r.getLong(0) == lats.length)
    assert(r.getLong(1) == lats(((lats.length + 1) / 2 - 1).toInt), "median")
    assert(r.getLong(2) == lats(((9 * lats.length + 9) / 10 - 1).toInt), "p90")
    assert(r.getLong(1) <= r.getLong(2))
  }

  test("q_concurrent_sessions: peak matches a driver sweep over the same sessions") {
    import spark.implicits._
    val got = EventAnalytics.qConcurrentSessions(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    // driver replica: sessionize then sweep
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val sessions = evs.groupBy(_._1).values.flatMap { us =>
      val sorted = us.map(u => (u._2, u._3)).sortBy(identity)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (s0, last) = (sorted.head._1, sorted.head._1)
      sorted.tail.foreach { case (t, _) =>
        if (t - last > 30L * 60 * 1000000) { buf += ((s0, last)); s0 = t }
        last = t
      }
      buf += ((s0, last)); buf
    }.toSeq
    val deltas = sessions.flatMap { case (a, b) => Seq((a, 1L), (b, -1L)) }
      .sortBy { case (u, d) => (u, -d) }
    var conc = 0L
    val byDay = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    deltas.foreach { case (u, d) =>
      conc += d
      val day = fmt.format(java.time.Instant.ofEpochMilli(u / 1000))
      val (pk, st) = byDay.getOrElse(day, (0L, 0L))
      byDay(day) = (math.max(pk, conc), st + (if (d == 1) 1 else 0))
    }
    assert(got == byDay.toMap, s"diff: ${(byDay.toSet -- got.toSet).take(3)}")
  }

  test("q_profile_table: one-pass profile matches per-column aggregates") {
    import spark.implicits._
    val rows = RelationalExt.qProfileTable(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows.keySet == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val n = Tables.lineitem(spark, sfDir).count()
    rows.foreach { case (c, (nr, nn, nd, mn, mx)) =>
      assert(nr == n, s"$c row count")
      assert(nn == 0, s"$c nulls")
      assert(nd >= 1 && nd <= n && mn <= mx, s"$c stats")
    }
    val dq = Tables.lineitem(spark, sfDir)
      .select(count_distinct($"l_quantity")).as[Long].head()
    assert(rows("l_quantity")._3 == dq, "distinct count matches direct agg")
  }

  test("q_uplift_quintiles: users conserved, quintiles balanced") {
    val rows = EventAnalytics.qUpliftQuintiles(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 5L))
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getLong(1) + r.getLong(3)).sum == nUsers)
    val sizes = rows.map(r => r.getLong(1) + r.getLong(3))
    assert(sizes.max - sizes.min <= 1, s"unbalanced quintiles: ${sizes.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3))
      if (!r.isNullAt(7))
        assert(r.getDouble(7) >= -1.0 && r.getDouble(7) <= 1.0)
    }
  }

  test("q_ab_cuped: matches a driver moment replica; reduction bounded") {
    import spark.implicits._
    val r = EventAnalytics.qAbCuped(spark, sfDir).collect().head
    // independent replica from per-user (x, y)
    val t0 = Tables.events(spark, sfDir).agg(min($"ts")).head().getTimestamp(0)
    val cut = new java.sql.Timestamp(t0.getTime + 15L * 86400 * 1000)
    val pu = Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(
        sum(when($"ts" < lit(cut) && $"event_type" === "click", 1L).otherwise(0L))
          .cast("double").as("x"),
        graft.functions.Cols.xsum(
          when($"ts" >= lit(cut) && $"event_type" === "purchase", $"value")
            .otherwise(lit(0.0))).as("y"))
      .as[(Long, Double, Double)].collect()
    val n = pu.length.toDouble
    val (sx, sy) = (pu.map(_._2).sum, pu.map(_._3).sum)
    val (sxx, syy, sxy) =
      (pu.map(u => u._2 * u._2).sum, pu.map(u => u._3 * u._3).sum, pu.map(u => u._2 * u._3).sum)
    val theta = (sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n))
    assert(math.abs(r.getDouble(4) - theta) < 1e-4, s"theta ${r.getDouble(4)} vs $theta")
    val vr = r.getDouble(7)
    assert(vr >= 0.0 && vr <= 1.0, s"var_reduction $vr")
    // CUPED preserves the pooled mean: weighted adj means == raw pooled mean
    val pooled = sy / n
    val wAdj = (r.getLong(0) * r.getDouble(5) + r.getLong(1) * r.getDouble(6)) / n
    assert(math.abs(wAdj - pooled) < 0.01, s"pooled mean moved: $wAdj vs $pooled")
  }

  test("q_attribution_decay: credit mass equals attributable purchase revenue") {
    import spark.implicits._
    val rows = EventAnalytics.qAttributionDecay(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
    // every purchase with >=1 preceding touch distributes exactly its
    // value (weights are a normalized geometric series)
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value").collect()
    val byUser = ev.groupBy(_.getLong(0))
    val attributable = byUser.values.flatMap { es =>
      val sorted = es.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
      sorted.zipWithIndex.collect {
        case (r, i) if r.getString(3) == "purchase" && i > 0 &&
          sorted.take(i).exists(_.getString(3) != "purchase") => r.getDouble(4)
      }
    }.sum
    val credited = rows.map(_.getDouble(2)).sum
    assert(math.abs(credited - attributable) < 0.05 * rows.length,
      s"credit mass $credited vs purchase mass $attributable")
  }

  test("q_events_hopping: every event lands in exactly 3 panes") {
    val rows = graft.operators.RelationalExt.qEventsHopping(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == 3 * nEvents,
      "6h/2h hopping must assign each event to exactly 3 windows")
    // pane starts are 2h-aligned
    rows.foreach { r =>
      val mins = r.getString(0).substring(14, 16)
      val hrs = r.getString(0).substring(11, 13).toInt
      assert(mins == "00" && hrs % 2 == 0, s"unaligned pane ${r.getString(0)}")
    }
  }

  test("q_seasonal_decompose: matches a driver moving-average replica") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Date, Long)].collect()
    val expected = daily.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2.getTime)
      val det = sorted.indices.collect {
        case i if i >= 3 && i < sorted.length - 3 =>
          val trend = (i - 3 to i + 3).map(sorted(_)._3).sum.toDouble / 7.0
          // ISO Mon=1..Sun=7 → Spark's dayofweek Sun=1..Sat=7
          val dow = (sorted(i)._2.toLocalDate.getDayOfWeek.getValue % 7 + 1).toLong
          (dow, sorted(i)._3.toDouble - trend)
      }
      det.groupBy(_._1).map { case (dow, ds) =>
        (g, dow) -> (ds.length.toLong,
          math.floor(ds.map(_._2).sum / ds.length * 1e6 + 0.5) / 1e6)
      }
    }
    val got = EventAnalytics.qSeasonalDecompose(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (k, (n, s)) =>
      val (gn, gs) = got(k)
      assert(gn == n, s"$k n_days")
      assert(math.abs(gs - s) < 1e-6, s"$k seasonal $gs vs $s")
    }
  }

  test("q_equidepth_hist: boundaries are exact order statistics, mass conserved") {
    import spark.implicits._
    val cents = Tables.events(spark, sfDir)
      .select($"event_type", floor($"value" * 100 + 0.5).cast("long"))
      .as[(String, Long)].collect()
    val expected = cents.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length
      def kth(i: Int): Long = sorted(((i * n.toLong + 3) / 4).toInt - 1)
      val qs = (1 to 3).map(kth)
      val counts = (1 to 4).map { b =>
        sorted.count { c =>
          val bucket = if (c <= qs(0)) 1 else if (c <= qs(1)) 2 else if (c <= qs(2)) 3 else 4
          bucket == b
        }.toLong
      }
      g -> (qs.map(q => math.floor(q.toDouble / 100 * 1e4 + 0.5) / 1e4), counts)
    }
    val got = EventAnalytics.qEquidepthHist(spark, sfDir).collect()
      .groupBy(_.getString(0))
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (g, (qs, counts)) =>
      val rows = got(g).sortBy(_.getLong(1))
      assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L), s"$g buckets")
      rows.foreach { r =>
        assert(Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)) == qs, s"$g boundaries")
      }
      assert(rows.map(_.getLong(5)).toSeq == counts, s"$g counts")
      assert(counts.sum == cents.count(_._1 == g), s"$g mass")
    }
  }

  test("q_weighted_median: bisection agrees with a sort-based driver replica") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag",
        floor($"l_quantity" * 100 + 0.5).cast("long"),
        floor($"l_extendedprice" * 100 + 0.5).cast("long"))
      .as[(String, Long, Long)].collect()
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val tw = rs.map(_._3).sum
      val target = (tw + 1) / 2
      // lower weighted median: smallest q with cumweight >= ceil(W/2)
      var cum = 0L
      val mq = rs.sortBy(_._2).find { r => cum += r._3; cum >= target }.get._2
      (g, (rs.length.toLong, tw, math.floor(mq.toDouble / 100 * 1e4 + 0.5) / 1e4))
    }
    val got = EventAnalytics.qWeightedMedian(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (g, e) => assert(got(g) == e, s"$g: ${got(g)} vs $e") }
  }

  test("q_ab_ztest: arms partition signup users; z matches a driver replica") {
    import spark.implicits._
    val r = EventAnalytics.qAbZtest(spark, sfDir).collect().head
    val (na, xa, nb, xb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nSignup = Tables.events(spark, sfDir)
      .where($"event_type" === "signup")
      .select($"user_id").distinct().count()
    assert(na + nb == nSignup, "arms must partition the signup users")
    assert(xa <= na && xb <= nb && na > 0 && nb > 0)
    // independent replica of the pooled two-proportion z statistic
    val pa = xa.toDouble / na.toDouble
    val pb = xb.toDouble / nb.toDouble
    val pp = (xa + xb).toDouble / (na + nb).toDouble
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(6) - math.floor(z * 1e6 + 0.5) / 1e6) < 1e-9,
      s"z ${r.getDouble(6)} vs replica $z")
  }

  test("q_rfm_segments: scores in 1..5, marginals balanced, customers conserved") {
    import spark.implicits._
    val seg = graft.operators.RelationalExt.qRfmSegments(spark, sfDir).collect()
    assert(seg.nonEmpty)
    val nCust = Tables.orders(spark, sfDir).select($"o_custkey").distinct().count()
    assert(seg.map(_.getLong(4)).sum == nCust, "segment grid must cover every customer")
    seg.foreach { r =>
      Seq(r.getInt(1), r.getInt(2), r.getInt(3)).foreach(sc => assert(sc >= 1 && sc <= 5))
      assert(r.getString(0) == s"${r.getInt(1)}${r.getInt(2)}${r.getInt(3)}")
    }
    // each dimension's quintile marginal is ⌈n/5⌉-balanced: with the
    // explicit ceil formula bucket sizes differ by at most 1
    Seq(1, 2, 3).foreach { dim =>
      val marginal = seg.groupBy(_.getInt(dim)).view.mapValues(_.map(_.getLong(4)).sum)
      assert(marginal.values.max - marginal.values.min <= 1,
        s"dim $dim marginal unbalanced: $marginal")
    }
  }
}
