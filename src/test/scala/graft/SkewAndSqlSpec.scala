package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SkewOps

/** Salted-join/agg equivalence under synthetic hot-key skew, and the SQL
  * registration surface of the custom expressions. */
class SkewAndSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join equals plain join under a hot key") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val large = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")))
        .as("k"), col("id").as("payload"))
    val small = Seq((1L, "hot"), (2L, "a"), (30L, "b")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(large, small, "k", factor = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("isolated hot-key join equals plain join; hot branch broadcasts; empty hot list refused") {
    import spark.implicits._
    val large = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")))
        .as("k"), col("id").as("payload"))
    val small = Seq((1L, "hot"), (2L, "a"), (30L, "b"), (40L, "c"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val iso = SkewOps.isolatedSkewJoin(large, small, "k", hotKeys = Seq(1L))
    assert(iso.select("k", "payload", "name").collect().map(_.toSeq).toSet
      === plain)
    assert(plain.nonEmpty)
    // the hot branch is physically a broadcast join (the point: the hot
    // key's build rows meet the probe side map-side, no hot shuffle)
    val plan = iso.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hot branch should broadcast, plan was:\n$plan")
    intercept[IllegalArgumentException](
      SkewOps.isolatedSkewJoin(large, small, "k", hotKeys = Seq.empty))
  }

  test("hot keys detected from MG statistics match the declared skew; auto-isolation equals plain join") {
    import spark.implicits._
    // zipf-ish fixture: key 7 takes 60% of rows, key 13 takes 20%,
    // the rest spread thin over 500 cold keys (each ≤ 0.05%)
    val large = spark.range(20000)
      .select(
        when(col("id") % 10 < 6, lit(7L))
          .when(col("id") % 10 < 8, lit(13L))
          .otherwise(col("id") % 500 + 1000).as("k"),
        col("id").as("payload"))
      .repartition(8) // multiple partitions: the merge path must run
    val detected = SkewOps.hotKeysFromStats(large, "k", frac = 0.1)
    assert(detected.toSet === Set(7L, 13L),
      s"expected the two declared hot keys, got $detected")
    // detection feeds isolation; result must be semantically invisible
    val small = (Seq(7L, 13L) ++ (1000L until 1100L)).map(k => (k, s"n$k"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val auto = SkewOps.isolatedSkewJoinAuto(large, small, "k", frac = 0.1)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(auto === plain && plain.nonEmpty)
    // no skew → no isolation, still the plain result
    val uniform = spark.range(2000).select((col("id") % 400).as("k"),
      col("id").as("payload"))
    val uniSmall = (0L until 400L).map(k => (k, s"u$k")).toDF("k", "name")
    val uniPlain = uniform.join(uniSmall, Seq("k"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val uniAuto = SkewOps.isolatedSkewJoinAuto(uniform, uniSmall, "k", frac = 0.1)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(uniAuto === uniPlain)
  }

  test("skew-aware bucketed star: MG stats isolate the hot bucket; rows pinned to the plain star") {
    import graft.ops.{Joins, Layout}
    // a zipf-hot copy of sf0.001: 80% of lineitem rows collapse onto the
    // smallest orderkey — the exact fixture where the bucketed SMJ traps
    // the skew in one bucket AQE cannot split (no exchange to rewrite)
    val src = TestSpark.Sf0001
    val skewDir = TestSpark.tempDir("skewstar")
    val hotKey = Tables.orders(spark, src)
      .agg(min(col("o_orderkey"))).collect().head.getLong(0)
    Tables.lineitem(spark, src)
      .withColumn("l_orderkey",
        when(pmod(col("l_orderkey"), lit(5)) < 4, lit(hotKey))
          .otherwise(col("l_orderkey")))
      .write.mode("overwrite").parquet(s"$skewDir/lineitem.parquet")
    Seq("orders", "customer", "nation", "region").foreach(t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$skewDir/$t.parquet"))

    val plain = Joins.multiwayStar(spark, skewDir).collect().toSeq
    val auto = Joins.multiwayStarBucketedSkewAware(spark, skewDir)
    assert(auto.collect().toSeq === plain,
      "isolation must be semantically invisible")
    assert(plain.nonEmpty)
    // the detection fired: the hot orderkey is found from the bucketed
    // fact's MG statistics, so the plan has BOTH branches — a broadcast
    // hot join and the cold bucket-to-bucket SMJ under a union
    val (liName, _) = Layout.ensureBucketedStar(spark, skewDir)
    assert(SkewOps.hotKeysFromStats(spark.table(liName), "l_orderkey")
      .contains(hotKey))
    val plan = auto.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hot branch should broadcast:\n$plan")
    assert(plan.contains("Union"), s"expected two-branch union:\n$plan")
    // the cold branch keeps the exchange-free bucketed join: filters
    // preserve the scans' bucket partitioning
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (li, ord) = Layout.ensureBucketedStar(spark, skewDir)
      val cold = spark.table(li).filter(col("l_orderkey") =!= hotKey)
        .join(spark.table(ord).filter(col("o_orderkey") =!= hotKey),
          col("l_orderkey") === col("o_orderkey"))
      val coldPlan = cold.queryExecution.executedPlan.toString
      assert(!coldPlan.contains("Exchange"),
        "cold branch lost bucket co-location:\n" + coldPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("two-phase count equals plain count under skew") {
    import spark.implicits._
    val df = spark.range(5000)
      .select(when(col("id") % 5 === 0, lit(7L)).otherwise(col("id") % 100).as("k"))
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = SkewOps.twoPhaseCount(df, "k", factor = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === plain)
  }

  test("spark.sql.extensions=graft.GraftExtensions injects the SQL surface into new sessions") {
    import org.apache.spark.sql.SparkSession
    // force existing session init first (shares its SparkContext)
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // a NEW session with the extension installed — no
      // GraftFunctions.register call anywhere. (The equivalent
      // `spark.sql.extensions=graft.GraftExtensions` config string is
      // read at SparkContext creation, which this shared-context suite
      // predates; withExtensions is the same public hook.)
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val d = ext.sql(
        """SELECT vector_dot(array(cast(1.0 AS float), cast(2.0 AS float)),
          |                  array(cast(3.0 AS float), cast(4.0 AS float))) AS d"""
          .stripMargin).collect().head.getDouble(0)
      assert(d === 11.0)
      assert(ext ne base) // genuinely a different session, same context
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("approx percentiles track the exact ones within sketch tolerance") {
    import graft.ops.Aggregates
    val dir = TestSpark.Sf0001
    def byFlag(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(Aggregates.percentileAgg(spark, dir))
    val approx = byFlag(Aggregates.approxPercentileAgg(spark, dir))
    assert(approx.keySet === exact.keySet)
    // at accuracy 10000 and these group sizes the sketch's rank error is
    // tiny; allow a small relative slack for the value-domain gap
    exact.foreach { case (flag, (m, p25, p95)) =>
      val (am, a25, a95) = approx(flag)
      assert(math.abs(am - m) <= math.max(1.0, 0.05 * m), s"$flag median")
      assert(math.abs(a25 - p25) <= 0.05 * p25, s"$flag p25")
      assert(math.abs(a95 - p95) <= 0.05 * p95, s"$flag p95")
    }
  }

  test("merged daily HLL sketches estimate the exact distinct users per type") {
    import graft.ops.Aggregates
    import org.apache.spark.sql.functions.countDistinct
    val dir = TestSpark.Sf0001
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Aggregates.hllMergeDistinct(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Long]("n_partials"))).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (t, (approx, partials)) =>
      // union of per-day partials must estimate the global distinct —
      // the mergeability property — within HLL's relative error
      assert(partials > 1, s"$t: need multiple daily partials to merge")
      assert(math.abs(approx - exact(t)) <= math.max(2.0, 0.06 * exact(t)),
        s"$t: est $approx vs exact ${exact(t)}")
    }
  }

  test("TopK aggregator equals sort-take under arbitrary partition splits") {
    // the partial-aggregation contract: any split of the input into
    // chunks, reduced independently and merged in any order, must equal
    // the global sort-take — otherwise map-side combine would change
    // results with partitioning
    val rnd = new scala.util.Random(42)
    val agg = new graft.functions.TopKAggregator(5)
    for (_ <- 1 to 25) {
      val xs = Seq.fill(60)(("g", rnd.nextInt(40).toLong, rnd.nextInt(200).toLong))
      val reference = xs.map(t => (t._3, t._2))
        .sortBy { case (score, id) => (-score, id) }.take(5)
      val nChunks = 1 + rnd.nextInt(6)
      val chunks = xs.groupBy(_ => rnd.nextInt(nChunks)).values.toSeq
      val bufs = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(merged === reference)
    }
  }

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, TestSpark.Sf0001).createOrReplaceTempView("emb_sql")
    val d = spark.sql(
      "SELECT vector_dot(embedding, embedding) AS d FROM emb_sql WHERE vec_id = 0")
      .collect().head.getDouble(0)
    assert(d > 0.0)
    val fp = spark.sql(
      "SELECT rolling_fingerprint('the quick brown fox', 4) AS f")
      .collect().head.getLong(0)
    assert(fp === graft.functions.RollingFingerprint.minWindowHash(
      "the quick brown fox".getBytes("UTF-8"), 4))
    val dec = spark.sql(
      """SELECT dynamo_attr_decode('{"a":{"N":"2"}}') AS j""")
      .collect().head.getString(0)
    assert(dec === """{"a":2}""")
    val z = spark.sql("SELECT zorder64(3L, 5L) AS z").collect().head.getLong(0)
    assert(z === graft.functions.ZOrder64.interleave(3L, 5L))
    // integer literals coerce int→bigint like any built-in function
    val zi = spark.sql("SELECT zorder64(1, 2) AS z").collect().head.getLong(0)
    assert(zi === graft.functions.ZOrder64.interleave(1L, 2L))
  }
}
