package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r18 optimization round: sub-stage timings of the
  * bench's most expensive queries, so each change targets the measured
  * cost, not the guessed one. Run:
  * `sbt "runMain graft.tools.OptProbe /root/testdata/sf0.1"`. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[opt] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/documents.parquet").count() // warm-up

    // ---- shingle-form A/B: HOF transform vs posexplode+lead window
    locally {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions._
      val docs = graft.Tables.documents(spark, dir)
      def windowForm(n: Int) = {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val toks = docs.select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        val parts = (0 until n).map {
          case 0 => col("tok")
          case i => lead(col("tok"), i).over(w)
        }
        toks.select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"),
            parts.last.isNotNull.as("complete"))
          .filter(col("complete")).select(col("doc_id"), col("shingle"))
      }
      def sigsOf(ex: org.apache.spark.sql.DataFrame) = {
        val minCols = (0 until 64).map(s =>
          min(xxhash64(lit(s), col("shingle"))).as(s"h$s"))
        ex.groupBy(col("doc_id"))
          .agg(minCols.head,
            (minCols.tail :+ collect_set(col("shingle")).as("sh")): _*)
      }
      for (i <- 1 to 2) {
        time(s"shingles/hof/$i")(
          graft.operators.Dedup.explodedShingles(docs, 3, dedup = false).count())
        time(s"shingles/win/$i")(windowForm(3).count())
        time(s"sigs/hof/$i")(
          sigsOf(graft.operators.Dedup.explodedShingles(docs, 3, dedup = false)).count())
        time(s"sigs/win/$i")(sigsOf(windowForm(3)).count())
      }
    }

    // ---- regression watch: queries the shingle change touches
    for (i <- 1 to 2; q <- Seq("x_minhash_near_dup", "x_ngram_jaccard",
        "x_simhash_near_dup", "x_lm_score", "x_minhash_indexed")) {
      time(s"q/$q/$i")(graft.SparkEntry.queries(q)(spark, dir).count())
    }

    // ---- lm_score A/B: spread vs unspread bigram relation
    locally {
      import graft.functions.TokenWindowHash.tokenWindowHashes
      def rel(docs: org.apache.spark.sql.DataFrame) = {
        val bgs = tokenWindowHashes(col("text"), 2)
        val toks = tokenWindowHashes(col("text"), 1)
        val pre = docs
          .select(col("doc_id"),
            explode(zip_with(bgs, slice(toks, lit(1), size(bgs)),
              (b, t) => struct(b.as("bgh"), t.as("w1h")))).as("z"))
          .groupBy(col("doc_id"), col("z.bgh").as("bgh"), col("z.w1h").as("w1h"))
          .agg(count(lit(1)).as("k"))
        val perDoc = pre.localCheckpoint(true, graft.ops.Pin.Level)
        val bc = perDoc.groupBy(col("bgh"), col("w1h")).agg(sum(col("k")).as("bc"))
        val uc = bc.groupBy(col("w1h")).agg(sum(col("bc")).as("uc"))
        perDoc.join(
          bc.join(uc, Seq("w1h")).select(col("bgh"), col("bc"), col("uc")),
          Seq("bgh"))
          .groupBy(col("doc_id"))
          .agg(sum(col("k")).as("n_bigrams"), min(col("bc")).as("min_bc"))
      }
      val docs = graft.Tables.documents(spark, dir)
      for (i <- 1 to 2) {
        time(s"lm/unspread/$i")(rel(docs).count())
        time(s"lm/spread/$i")(
          rel(graft.ops.Spread.wide(docs, col("doc_id"))).count())
      }
    }

    // ---- x_semantic_dedup decomposition
    val (path, centroids) = graft.operators.Similarity.ensureIvfIndex(spark, dir, 16, 2)
    import spark.implicits._
    val centDf = centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cid", "cvec")
    val assigned = spark.read.parquet(path)
      .join(broadcast(centDf), Seq("cid"))
      .withColumn("cos_centroid",
        graft.functions.VectorFunctions.cosine(col("embedding"), col("cvec")))
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("embedding")))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"), col("cos_centroid"))
    val a2 = time("semdedup/assign+checkpoint")(
      assigned.localCheckpoint(true, graft.ops.Pin.Level))
    val nprod = col("a.nrm") * col("b.nrm")
    val pairCos = when(nprod === 0.0, lit(0.0))
      .otherwise(graft.functions.VectorFunctions.dot(
        col("a.embedding"), col("b.embedding")) / nprod)
    val pairs = a2.as("a")
      .join(a2.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(pairCos >= 0.4)
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
    val np = time("semdedup/pairs")(pairs.count())
    println(s"[opt] semdedup n_pairs=$np")
    val pairsCk = pairs.localCheckpoint(true, graft.ops.Pin.Level)
    time("semdedup/labels")(
      graft.operators.Dedup.propagateMinLabels(pairsCk).count())
    time("semdedup/labels2")(
      graft.operators.Dedup.propagateMinLabels(pairsCk).count())
    // instrumented copy of the propagateMinLabels loop
    locally {
      val edgesRaw = pairsCk
        .unionByName(pairsCk.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .withColumnsRenamed(Map("doc_a" -> "src", "doc_b" -> "dst"))
        .localCheckpoint(true, graft.ops.Pin.Level)
      var labels = time("loop/labels0")(edgesRaw.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("canon"))
        .localCheckpoint(true, graft.ops.Pin.Level))
      println(s"[opt] loop/nlabels=${labels.count()} nedges=${edgesRaw.count()} " +
        s"labelParts=${labels.rdd.getNumPartitions}")
      val edges = time("loop/edges-pin") {
        val ss = spark
        val prevAqe = ss.conf.get("spark.sql.adaptive.enabled", "true")
        try { ss.conf.set("spark.sql.adaptive.enabled", "false")
          edgesRaw.repartition(1, col("dst")).localCheckpoint(true, graft.ops.Pin.Level)
        } finally ss.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
      var converged = false
      var it = 0
      while (!converged && it < 64) {
        val t0 = System.nanoTime
        val neighborMin = edges
          .join(broadcast(labels), edges("src") === labels("doc_id"))
          .groupBy(col("dst").as("doc_id2"))
          .agg(min(col("canon")).as("nmin"))
        val stepped = labels
          .join(broadcast(neighborMin), labels("doc_id") === col("doc_id2"), "left")
          .select(col("doc_id"), col("canon").as("c0"),
            least(col("canon"), coalesce(col("nmin"), col("canon"))).as("c1"))
        val jumpTo = labels
          .select(col("doc_id").as("jid"), col("canon").as("jcanon"))
        val next = stepped
          .join(broadcast(jumpTo), col("c1") === col("jid"), "left")
          .select(col("doc_id"),
            least(col("c1"), coalesce(col("jcanon"), col("c1"))).as("canon"),
            (least(col("c1"), coalesce(col("jcanon"), col("c1"))) < col("c0")).as("changed"))
          .localCheckpoint(false, graft.ops.Pin.Level)
        converged = next.filter(col("changed")).count() == 0L
        labels = next.select(col("doc_id"), col("canon"))
        it += 1
        println(f"[opt] loop/iter$it: ${(System.nanoTime - t0) / 1e9}%.2f s")
      }
    }
    time("semdedup/full")(
      graft.operators.Similarity.semanticDedup(spark, dir).count())

    // ---- x_dup_clusters decomposition
    val xp = time("dupclusters/exact-pairs")(
      graft.operators.Dedup.ngramJaccardPairs(spark, dir).count())
    println(s"[opt] dupclusters n_pairs=$xp")
    time("dupclusters/full-exact")(
      graft.operators.Dedup.dupClusters(spark, dir, exactPairs = true).count())
    time("dupclusters/full-lsh")(
      graft.operators.Dedup.dupClusters(spark, dir).count())

    // ---- j_cbo_star decomposition
    time("cbostar/catalog")(graft.ops.TableStats.cboStarEdges(spark, dir))
    time("cbostar/full")(graft.ops.TableStats.cboStarJoin(spark, dir).count())
    time("cbostar/full2")(graft.ops.TableStats.cboStarJoin(spark, dir).count())

    // ---- t_change_feed
    time("changefeed/full")(
      graft.streaming.MergeTable.changeFeedQuery(spark, dir).count())
    time("changefeed/full2")(
      graft.streaming.MergeTable.changeFeedQuery(spark, dir).count())

    spark.stop()
  }
}
