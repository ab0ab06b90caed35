package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Invariant specs for the CDC-history and record-linkage operators
  * (both are also hash-verified against the SQL oracle — these pin
  * the semantic properties a value compare can't express). */
class CdcLinkageSpec extends SparkTestBase {

  test("q_scd2_history: intervals tile, one current row per user, no no-op versions") {
    val h = CdcOps.qScd2History(spark, sfDir).collect()
    assert(h.nonEmpty)
    val byUser = h.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // versions are 1..k dense
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"user $u versions")
      // exactly one open (current) interval, and it is the last version
      val current = sorted.filter(_.getBoolean(5))
      assert(current.length == 1 && current.head.getLong(1) == sorted.length, s"user $u current")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // consecutive intervals tile exactly: valid_to == next valid_from
          assert(a.getLong(4) == b.getLong(3), s"user $u gap between v${a.getLong(1)} and v${b.getLong(1)}")
          // collapse worked: adjacent versions never carry the same attr
          assert(a.getString(2) != b.getString(2), s"user $u no-op version survived")
        case _ =>
      }
    }
    // every event user appears
    val nUsers = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(byUser.size.toLong == nUsers)
  }

  test("q_entity_clusters: matches a driver union-find over the same match set") {
    import spark.implicits._
    val pairs = LinkageOps.scoredCandidates(spark, sfDir)
      .where($"lev" <= 2)
      .select($"c_key", $"d_key" + 10000000L)
      .as[(Long, Long)].collect()
    // driver union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.map(x => find(x) -> x).groupBy(_._1)
    val expected = members.collect { case (rep, ms) if ms.size >= 2 =>
      val ids = ms.map(_._2)
      rep -> (ids.size.toLong, ids.count(_ < 10000000L).toLong,
        ids.count(_ >= 10000000L).toLong, ids.max)
    }.toMap
    val got = LinkageOps.qEntityClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected && got.nonEmpty, s"got ${got.size} vs expected ${expected.size}")
    // every entity carries at least one clean and one dirty record
    // (dirty records only ever match through a clean neighbor)
    got.values.foreach { case (n, nc, nd, _) =>
      assert(n == nc + nd && nc >= 1 && nd >= 1)
    }
  }

  test("q_ivm_maintain: delta-maintained view == full recompute, bit for bit") {
    // the engine-side IVM theorem (the oracle proves it cross-engine;
    // this proves it in-engine): maintaining from deltas alone must
    // equal q_merge_upsert's recompute over the merged snapshot
    val maintained = CdcOps.qIvmMaintain(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val recomputed = CdcOps.qMergeUpsert(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(maintained == recomputed && maintained.nonEmpty,
      s"IVM drift: missing=${(recomputed -- maintained).take(3)} extra=${(maintained -- recomputed).take(3)}")
    // the batch genuinely exercised all three change kinds
    val statuses = maintained.map(_._1)
    assert(statuses.contains("X") && statuses.contains("N"), s"got $statuses")
  }

  test("q_pit_join: every purchase resolves to exactly one interval") {
    import spark.implicits._
    val rows = CdcOps.qPitJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // conservation: SCD2 intervals tile each user's [first, inf), so
    // the PIT lookup matches every purchase exactly once
    val nPurch = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == nPurch,
      s"${rows.map(_.getLong(1)).sum} matched vs $nPurch purchases")
    // a purchase's covering interval is the one its own event opened
    // or an earlier run — the state must be a real event type
    val types = Tables.events(spark, sfDir)
      .select($"event_type").distinct().collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(types(r.getString(0))))
  }

  test("q_snapshot_diff: classes conserve mass and match the batch residues") {
    import spark.implicits._
    val d = CdcOps.qSnapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(d.keySet == Set("inserted", "deleted", "updated", "unchanged"))
    val nBase = Tables.orders(spark, sfDir).count()
    val nMerged = CdcOps.merged(spark, sfDir).count()
    // merged = base + inserted - deleted
    assert(nBase + d("inserted")._1 - d("deleted")._1 == nMerged)
    assert(d("unchanged")._1 + d("updated")._1 + d("deleted")._1 == nBase)
    // updates touch BOTH columns by construction (status X, price x1.1)
    assert(d("updated")._2 == d("updated")._1 && d("updated")._3 == d("updated")._1)
    assert(d("inserted")._2 == 0 && d("deleted")._2 == 0)
  }

  test("q_bloom_semijoin: bloom pass is a superset; result equals the plain semi-join") {
    import spark.implicits._
    val hi = Tables.orders(spark, sfDir)
      .where($"o_totalprice" > 400000.0).select($"o_orderkey")
    val bf = hi.stat.bloomFilter("o_orderkey", 100000L, 0.001)
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey")
    val exactKeys = li.join(hi.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    val bloomPass = li.collect().count(r => bf.mightContain(r.getLong(0)))
    assert(bloomPass >= exactKeys, "bloom must never drop a true match")
    // correctness: the operator's result == the plain semi-join agg
    val got = RelationalExt.qBloomSemijoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val plain = Tables.lineitem(spark, sfDir)
      .join(hi.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.functions.Cols.rnd(graft.functions.Cols.xsum($"l_quantity"), 2),
        graft.functions.Cols.rnd(graft.functions.Cols.xsum($"l_extendedprice"), 2))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == plain && got.nonEmpty)
  }

  test("q_record_linkage: blocking never loses the true pair; counts consistent") {
    import spark.implicits._
    val rows = LinkageOps.qRecordLinkage(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    // per-kind ground truth straight from the residue classes
    val truth = Tables.customer(spark, sfDir)
      .where($"c_custkey" % 7 === 3)
      .groupBy(($"c_custkey" % 3).as("kind")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (kind, nCand, nMatched, nTrue) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTrue <= nMatched && nMatched <= nCand, s"kind $kind ordering")
      // the blocking key survives every perturbation kind AND every
      // true pair scores within the threshold → recall is exactly 1
      assert(nTrue == truth(kind), s"kind $kind lost true pairs: $nTrue vs ${truth(kind)}")
      assert(r.getDouble(5) == 1.0, s"kind $kind recall")
    }
  }
}
