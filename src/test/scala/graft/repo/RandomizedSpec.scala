package graft.repo

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Randomized fidelity tests: the reference's seeded bulk-append round-trip
  * (/root/reference/parquetranger/tests/test_core.py:283-300, scaled to
  * keep the suite fast), MultiIndex keys (tests/test_diff_cols.py:8-12),
  * datetime grouping (tests/test_core.py:254-258), and a seeded sweep of
  * the md5 bucket expression against direct BigInteger math.
  */
class RandomizedSpec extends SparkSuite {
  import spark.implicits._

  private def alnum(rng: Random, n: Int): String =
    Iterator.continually(rng.nextPrintableChar()).filter(_.isLetterOrDigit).take(n).mkString

  test("seeded bulk appends round-trip exactly (test_core.py:283-300, seed 7)") {
    val rng = new Random(7)
    val repo = new TableRepo(scratch("bulk"), spark)
    val batches = (0 until 8).map { _ =>
      (0 until 5000).map { _ =>
        (rng.nextDouble(), rng.nextInt(1000).toLong, alnum(rng, 5))
      }
    }
    batches.foreach(b => repo.extend(b.toDF("A", "B", "C")))
    val expected = batches.flatten
    assert(repo.count() == expected.size)
    val got = repo.getFullDf.agg(sum($"B"), count(lit(1))).collect().head
    assert(got.getLong(0) == expected.map(_._2).sum)
  }

  test("multi-column keys (MultiIndex) upsert (test_diff_cols.py:8-12)") {
    val repo = new TableRepo(scratch("mkey"), spark, keyCols = Seq("ix", "iy"))
    repo.extend(Seq(("A", 1L, 10.0), ("A", 2L, 20.0), ("C", 1L, 30.0)).toDF("ix", "iy", "v"))
    repo.replaceRecords(Seq(("A", 2L, 99.0), ("D", 9L, 1.0)).toDF("ix", "iy", "v"))
    val out = repo.getFullDf
    assert(out.count() == 4)
    assert(out.filter($"ix" === "A" && $"iy" === 2L).select("v").as[Double].head() == 99.0)
  }

  test("datetime group keys and sized files (test_core.py:254-258)") {
    val repo = new TableRepo(scratch("dtgroup"), spark,
      groupCols = Seq("d"), maxRecordsPerFile = 7)
    val rows = (0 until 10).flatMap { day =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2023, 4, 4).plusDays(day))
      (0 until 3).map(i => (d, day * 10L + i))
    }
    repo.extend(rows.toDF("d", "x"))
    assert(repo.count() == 30)
    assert(repo.getPartitionDf(Map("d" -> "2023-04-05")).count() == 3)
  }

  test("seeded random lifecycle sequences track an exact in-memory model (grouped keyed repo)") {
    // model-based composition check over the WHOLE mutating surface on
    // the hairiest layout (grouped + keyed, unscoped upserts so keys can
    // MOVE between groups — the emptied-partition path): after any
    // prefix of a random op sequence, the table must equal the model
    // exactly. Each op class has its own invariant; composing them in
    // random orders is what no single-op spec covers.
    val rng = new Random(20260815)
    val repo = new TableRepo(scratch("rand-lifecycle"), spark,
      keyCols = Seq("k"), groupCols = Seq("g"))
    val model = scala.collection.mutable.Map[Long, (String, Double)]()
    val groups = Vector("g0", "g1", "g2")
    def rndRows(n: Int, newKeysOnly: Boolean): Seq[(Long, String, Double)] = {
      val keys = scala.collection.mutable.LinkedHashSet[Long]()
      while (keys.size < n) {
        // draw from the wide range once the dense one is nearly full, so
        // a new-keys-only draw always terminates and never collides
        val k = if (newKeysOnly && model.size >= 55) 60L + rng.nextInt(100000)
          else rng.nextInt(60).toLong
        if (!newKeysOnly || !model.contains(k)) keys += k
      }
      keys.toSeq.map(k => (k, groups(rng.nextInt(groups.size)), rng.nextDouble()))
    }
    def check(step: String): Unit = {
      val got = repo.getFullDf.select($"k", $"g", $"v").collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).sortBy(_._1).toSeq
      val want = model.toSeq.sortBy(_._1)
      assert(got == want,
        s"diverged after $step: extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    }
    repo.extend(rndRows(8, newKeysOnly = true).map { case (k, g, v) =>
      model(k) = (g, v); (k, g, v)
    }.toDF("k", "g", "v"))
    for (step <- 1 to 24) {
      rng.nextInt(10) match {
        case 0 | 1 => // append of strictly-new keys (extend never dedups)
          val rows = rndRows(3 + rng.nextInt(5), newKeysOnly = true)
          rows.foreach { case (k, g, v) => model(k) = (g, v) }
          repo.extend(rows.toDF("k", "g", "v"))
        case 2 | 3 | 4 | 5 => // unscoped keyed upsert: keys may change group
          val rows = rndRows(3 + rng.nextInt(8), newKeysOnly = false)
          rows.foreach { case (k, g, v) => model(k) = (g, v) }
          repo.replaceRecords(rows.toDF("k", "g", "v"))
        case 6 => // one group's dynamic overwrite
          val g = groups(rng.nextInt(groups.size))
          val rows = rndRows(2 + rng.nextInt(4), newKeysOnly = false).map(r => (r._1, g, r._3))
          model.filterInPlace { case (_, (mg, _)) => mg != g }
          rows.foreach { case (k, _, v) => model(k) = (g, v) }
          repo.replaceGroups(rows.toDF("k", "g", "v"))
        case 7 => // content-preserving compaction: model untouched
          repo.compact(10L + rng.nextInt(40))
        case 8 => // snapshot-versioned full replace
          val rows = rndRows(6 + rng.nextInt(6), newKeysOnly = false)
          model.clear()
          rows.foreach { case (k, g, v) => model(k) = (g, v) }
          repo.replaceAll(rows.toDF("k", "g", "v"))
        case 9 => // scoped upsert, restricted to same-group identities:
          // with byGroups the key is (g, k), so a same-k-different-g row
          // is a SECOND identity — legal for the repo, but it breaks this
          // model's single-key map; the sequence only feeds matching rows
          val rows = rndRows(2 + rng.nextInt(4), newKeysOnly = false)
            .filter { case (k, g, _) => model.get(k).forall(_._1 == g) }
          if (rows.nonEmpty) {
            rows.foreach { case (k, g, v) => model(k) = (g, v) }
            repo.replaceRecords(rows.toDF("k", "g", "v"), byGroups = true)
          }
      }
      if (step % 4 == 0) check(s"step $step")
    }
    check("final")
  }

  test("bucketed and plain keyed repos agree under seeded random upserts") {
    val rng = new Random(4242)
    def batch(n: Int) = (0 until n).map(_ => (rng.nextInt(400).toLong, rng.nextDouble(), alnum(rng, 4)))
    val plain = new TableRepo(scratch("rand-plain"), spark, keyCols = Seq("k"))
    val bucketed = new TableRepo(scratch("rand-bucket"), spark,
      keyCols = Seq("k"), hashBucket = Some(HashBucketLayout("k", 7)))
    val first = batch(300).distinctBy(_._1) // unique keys for a clean baseline
    Seq(plain, bucketed).foreach(_.extend(first.toDF("k", "v", "s")))
    (0 until 3).foreach { _ =>
      val updates = batch(80).distinctBy(_._1).toDF("k", "v", "s")
      plain.replaceRecords(updates)
      bucketed.replaceRecords(updates)
    }
    assertSameRows(plain.getFullDf.orderBy("k"), bucketed.getFullDf.orderBy("k"))
    assert(bucketed.getFullDf.groupBy("k").count().filter($"count" > 1).count() == 0)
  }

  for (keep <- Seq(false, true))
  test(s"grouped repo random upsert sequence matches an in-memory model (keep=$keep)") {
    // stresses the hairiest merge path: UNSCOPED upserts on a grouped repo,
    // where a key's update may move it to another group (the old row lives
    // in a different partition than the update) and groups can empty out
    val rng = new Random(99)
    val repo = new TableRepo(scratch(s"rand-model-$keep"), spark,
      groupCols = Seq("g"), keyCols = Seq("k"), keepGroupCols = keep)
    val model = scala.collection.mutable.Map[Long, (String, Double)]()
    def rows(n: Int, nGroups: Int) = (0 until n).map { _ =>
      (rng.nextInt(120).toLong, s"g${rng.nextInt(nGroups)}", rng.nextDouble())
    }
    val init = rows(100, 5).distinctBy(_._1)
    repo.extend(init.toDF("k", "g", "v"))
    init.foreach { case (k, g, v) => model(k) = (g, v) }
    (0 until 3).foreach { _ =>
      val ups = rows(40, 5).distinctBy(_._1)
      repo.replaceRecords(ups.toDF("k", "g", "v"))
      ups.foreach { case (k, g, v) => model(k) = (g, v) }
    }
    // final round squeezes every key into 2 groups — the other 3 MUST empty
    val sweep = model.keys.toSeq.sorted.map(k => (k, s"g${k % 2}", rng.nextDouble()))
    repo.replaceRecords(sweep.toDF("k", "g", "v"))
    sweep.foreach { case (k, g, v) => model(k) = (g, v) }
    val expected = model.toSeq.map { case (k, (g, v)) => (k, g, v) }.toDF("k", "g", "v")
    assertSameRows(repo.getFullDf.orderBy("k"), expected.orderBy("k"))
    // on-disk group dirs == the model's live groups (emptied dirs removed)
    val dirCol = if (keep) "__graft_grp_g__" else "g"
    val dirs = new java.io.File(repo.root + "/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == model.values.map(_._1).toSet.map((g: String) => s"$dirCol=$g"),
      s"stale or missing group dirs: $dirs")
  }

  test("grouped repo random upserts with Hive-escaped group values match the model") {
    // same model as above, but every group value needs writer-side
    // escaping (':', '=', '%', space) — the regime where hand-built
    // col=value paths silently miss dirs (round-9 fix)
    val rng = new Random(271828)
    val groups = Vector("a:b", "c=d", "e f", "plain", "x%y")
    val repo = new TableRepo(scratch("rand-model-esc"), spark,
      groupCols = Seq("g"), keyCols = Seq("k"))
    val model = scala.collection.mutable.Map[Long, (String, Double)]()
    def rows(n: Int, nGroups: Int) = (0 until n).map { _ =>
      (rng.nextInt(100).toLong, groups(rng.nextInt(nGroups)), rng.nextDouble())
    }
    val init = rows(80, 5).distinctBy(_._1)
    repo.extend(init.toDF("k", "g", "v"))
    init.foreach { case (k, g, v) => model(k) = (g, v) }
    (0 until 3).foreach { _ =>
      val ups = rows(30, 5).distinctBy(_._1)
      repo.replaceRecords(ups.toDF("k", "g", "v"))
      ups.foreach { case (k, g, v) => model(k) = (g, v) }
    }
    // squeeze into 2 escaped groups: the other 3 escaped dirs MUST empty
    val sweep = model.keys.toSeq.sorted.map(k => (k, groups((k % 2).toInt), rng.nextDouble()))
    repo.replaceRecords(sweep.toDF("k", "g", "v"))
    sweep.foreach { case (k, g, v) => model(k) = (g, v) }
    val expected = model.toSeq.map { case (k, (g, v)) => (k, g, v) }.toDF("k", "g", "v")
    assertSameRows(repo.getFullDf.orderBy("k"), expected.orderBy("k"))
    val dirs = new java.io.File(repo.root + "/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val want = model.values.map(_._1).toSet.map((g: String) =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.getPartitionPathString("g", g))
    assert(dirs == want, s"stale or missing escaped group dirs: $dirs vs $want")
  }

  test("pruned and plain upserts agree under seeded random batches (flat, composite, grouped)") {
    val rng = new Random(31337)
    def kv(n: Int, keySpace: Int) =
      (0 until n).map(_ => (rng.nextInt(keySpace).toLong, rng.nextDouble(), alnum(rng, 4)))
    // FLAT single-key, key-clustered with file rolls
    val pf = new TableRepo(scratch("rp-flat-p"), spark,
      keyCols = Seq("k"), clusterCols = Seq("k"), maxRecordsPerFile = 100L)
    val qf = new TableRepo(scratch("rp-flat-q"), spark, keyCols = Seq("k"))
    val seed = kv(600, 2000).distinctBy(_._1)
    Seq[TableRepo](pf, qf).foreach(_.extend(seed.toDF("k", "v", "s")))
    (0 until 4).foreach { _ =>
      val ups = kv(50, 2600).distinctBy(_._1).toDF("k", "v", "s") // mix of hits + new keys
      pf.replaceRecordsPruned(ups)
      qf.replaceRecords(ups)
    }
    assertSameRows(pf.getFullDf.orderBy("k"), qf.getFullDf.orderBy("k"))
    // COMPOSITE key
    def kv2(n: Int) = (0 until n).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong, rng.nextDouble()))
    val pc = new TableRepo(scratch("rp-comp-p"), spark,
      keyCols = Seq("a", "b"), clusterCols = Seq("a", "b"), maxRecordsPerFile = 120L)
    val qc = new TableRepo(scratch("rp-comp-q"), spark, keyCols = Seq("a", "b"))
    val seed2 = kv2(500).distinctBy(t => (t._1, t._2))
    Seq[TableRepo](pc, qc).foreach(_.extend(seed2.toDF("a", "b", "v")))
    (0 until 3).foreach { _ =>
      val ups = kv2(40).distinctBy(t => (t._1, t._2)).toDF("a", "b", "v")
      pc.replaceRecordsPruned(ups)
      qc.replaceRecords(ups)
    }
    assertSameRows(pc.getFullDf.orderBy("a", "b"), qc.getFullDf.orderBy("a", "b"))
    // GROUPED byGroups
    def kg(n: Int) = (0 until n).map(_ =>
      (rng.nextInt(150).toLong, s"g${rng.nextInt(4)}", rng.nextDouble()))
    val pg = new TableRepo(scratch("rp-grp-p"), spark,
      groupCols = Seq("g"), keyCols = Seq("k"), clusterCols = Seq("k"), maxRecordsPerFile = 80L)
    val qg = new TableRepo(scratch("rp-grp-q"), spark, groupCols = Seq("g"), keyCols = Seq("k"))
    val seed3 = kg(400).distinctBy(t => (t._1, t._2))
    Seq[TableRepo](pg, qg).foreach(_.extend(seed3.toDF("k", "g", "v")))
    (0 until 3).foreach { _ =>
      val ups = kg(30).distinctBy(t => (t._1, t._2)).toDF("k", "g", "v")
      pg.replaceRecordsPruned(ups, byGroups = true)
      qg.replaceRecords(ups, byGroups = true)
    }
    assertSameRows(pg.getFullDf.orderBy("k", "g"), qg.getFullDf.orderBy("k", "g"))
  }

  test("md5 bucket expression matches direct BigInteger math on a seeded sweep") {
    val rng = new Random(742)
    val cases = (0 until 200).map(_ => (alnum(rng, 1 + rng.nextInt(20)), 1 + rng.nextInt(5000)))
    val expected = cases.map { case (s, n) =>
      new java.math.BigInteger(1,
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))
        .mod(java.math.BigInteger.valueOf(n.toLong)).intValue()
    }
    // spot-check a subset through Spark (full sweep would be 200 tiny jobs)
    val sample = rng.shuffle(cases.indices.toList).take(12)
    sample.foreach { i =>
      val (s, n) = cases(i)
      val sparkVal = Seq(s).toDF("v").select(HashBucket.bucket($"v", n)).first().getInt(0)
      assert(sparkVal == expected(i), s"md5mod mismatch for ($s, $n)")
    }
  }
}
