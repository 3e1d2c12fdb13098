package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{ChangeEvent, ChangelogApply}
import graft.cdc.ChangelogApply.Mode
import graft.functions.RollingFingerprint

/** Property tests for the engine's algebraic laws (SURVEY §5):
  * upsert/last-wins semantics, replay idempotence, append-count
  * conservation, and the rolling-hash recurrence. Generators are driven
  * by fixed seeds — reproducible across runs and machines. */
class PropertyLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("integer-sum corr/covar agree with the built-in double aggregates to 1e-12") {
    // the exact-BIGINT formulation exists for cross-engine bit equality;
    // it must still BE correlation — compare against Spark's own
    // corr()/covar_samp() within float tolerance
    import org.apache.spark.sql.functions.{col, corr, covar_samp, floor => ffloor}
    val ours = graft.ops.Aggregates.corrAgg(spark, TestSpark.Sf0001).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("covar"), r.getAs[Double]("corr"))).toMap
    val builtin = graft.Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_returnflag"), col("l_quantity").as("x"),
        ffloor(col("l_discount") * 100.0 + 0.5).as("y"))
      .groupBy(col("l_returnflag"))
      .agg(covar_samp(col("x"), col("y")).as("cv"), corr(col("x"), col("y")).as("cr"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("cv"), r.getAs[Double]("cr"))).toMap
    assert(ours.keySet === builtin.keySet)
    ours.foreach { case (k, (cv, cr)) =>
      assert(math.abs(cv - builtin(k)._1) < 1e-9, s"covar $k")
      assert(math.abs(cr - builtin(k)._2) < 1e-12, s"corr $k")
    }
  }

  /** Sample `n` deterministic values from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(42L + i))
      .getOrElse(fail(s"generator exhausted at $i")))

  test("positional-search laws on generated corpora: phrase ≡ sliding window, " +
      "proximity ≡ pair count, phrase ⊆ proximity ⊆ AND") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // tiny alphabet → dense collisions, repeated terms, adjacent dups
    val genDoc: Gen[String] = Gen.chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab")))
      .map(_.mkString(" "))
    val texts = samples(genDoc, 60)
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val post = graft.operators.Search.positionalPostingsOf(docs)
      .localCheckpoint(true)
    for (phrase <- Seq(Seq("a", "b"), Seq("a", "a"), Seq("b", "a", "c"))) {
      val got = graft.operators.Search.phraseSearchFrom(post, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ", -1).sliding(phrase.size)
          .count(_.sameElements(phrase)).toLong
      }.filter(_._2 > 0).toMap
      assert(got === want, s"phrase $phrase")
    }
    // proximity law + the containment chain at slop 2
    val slop = 2
    val prox = post.filter(col("term") === "a")
      .select(col("doc_id"), col("pos").as("pa"))
      .join(post.filter(col("term") === "b")
        .select(col("doc_id"), col("pos").as("pb")), Seq("doc_id"))
      .filter(org.apache.spark.sql.functions.abs(col("pa") - col("pb")) <= slop)
      .groupBy(col("doc_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val proxWant = texts.zipWithIndex.map { case (t, i) =>
      val toks = t.split(" ", -1)
      val pa = toks.zipWithIndex.collect { case ("a", p) => p }
      val pb = toks.zipWithIndex.collect { case ("b", p) => p }
      i.toLong -> pa.flatMap(x => pb.filter(y => math.abs(x - y) <= slop)).length.toLong
    }.filter(_._2 > 0).toMap
    assert(prox === proxWant)
    val phraseDocs = graft.operators.Search
      .phraseSearchFrom(post, Seq("a", "b"))
      .collect().map(_.getLong(0)).toSet
    val andDocs = texts.zipWithIndex.collect {
      case (t, i) if { val s = t.split(" ", -1).toSet; s("a") && s("b") } => i.toLong
    }.toSet
    assert(phraseDocs.subsetOf(prox.keySet), "phrase ⊄ proximity")
    assert(prox.keySet.subsetOf(andDocs), "proximity ⊄ AND")
  }

  private val genEvent: Gen[ChangeEvent] = for {
    name <- Gen.oneOf(ChangeEvent.Known)
    key <- Gen.choose(0, 6).map(i => s"k$i")
    v <- Gen.choose(0, 999)
    t <- Gen.choose(1L, 50L)
  } yield ChangeEvent(name, key, s"""{"v":$v}""", new Timestamp(t * 1000))

  private val genEvents: Gen[List[ChangeEvent]] =
    Gen.listOfN(30, genEvent)

  /** Naive single-threaded reference semantics of changelog apply. */
  private def reference(events: Seq[ChangeEvent], mode: Mode): Map[String, String] = {
    val kept = mode match {
      case Mode.DropRemove => events.filter(e => ChangeEvent.Upserts.contains(e.eventName))
      case Mode.ApplyRemove => events
    }
    val latest = kept.groupBy(_.key).view.mapValues(
      _.maxBy(e => (e.ts.getTime, e.eventName))).toMap
    mode match {
      case Mode.DropRemove => latest.view.mapValues(_.newImage).toMap
      case Mode.ApplyRemove =>
        latest.filter(_._2.eventName != ChangeEvent.Remove)
          .view.mapValues(_.newImage).toMap
    }
  }

  test("applyBatch equals the sequential last-wins reference, both modes") {
    import spark.implicits._
    samples(genEvents, 12).filter(_.nonEmpty).foreach { events =>
      Seq(Mode.DropRemove, Mode.ApplyRemove).foreach { mode =>
        val got = ChangelogApply.applyBatch(events.toDF(), mode)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(got === reference(events, mode), s"mode=$mode events=$events")
      }
    }
  }

  test("applyBatch is replay-idempotent (applying the log twice changes nothing)") {
    import spark.implicits._
    samples(genEvents, 8).filter(_.nonEmpty).foreach { events =>
      val once = ChangelogApply.applyBatch(events.toDF(), Mode.DropRemove)
        .collect().map(_.toSeq).toSet
      val replayed = ChangelogApply.applyBatch((events ++ events).toDF(), Mode.DropRemove)
        .collect().map(_.toSeq).toSet
      assert(once === replayed)
    }
  }

  test("append-only union conserves counts (A3/A19 reconciliation invariant)") {
    import spark.implicits._
    val gl = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0, 100)))
    samples(Gen.zip(gl, gl), 8).foreach { case (a, b) =>
      assert(a.toDF("v").unionAll(b.toDF("v")).count() === a.size + b.size)
    }
  }

  test("incremental cluster merge equals union-find on random graphs and batch splits") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // random universe split into 3 arrival batches; each batch brings
    // random pairs among the docs arrived SO FAR (cross-batch edges
    // exercise component merging; duplicate/self edges exercise the
    // contraction's degenerate paths)
    val genCase = for {
      n <- Gen.choose(6, 24)
      ids = (1L to n.toLong).toVector
      shuffled <- Gen.const(new scala.util.Random(n).shuffle(ids))
      cut1 <- Gen.choose(1, n - 2)
      cut2 <- Gen.choose(cut1 + 1, n - 1)
      batches = Seq(shuffled.take(cut1), shuffled.slice(cut1, cut2),
        shuffled.drop(cut2))
      pairsPerBatch <- Gen.sequence[Seq[Seq[(Long, Long)]], Seq[(Long, Long)]](
        batches.indices.map { bi =>
          val arrived = batches.take(bi + 1).flatten
          Gen.choose(0, 6).flatMap(m => Gen.listOfN(m,
            Gen.zip(Gen.oneOf(arrived), Gen.oneOf(arrived))).map(_.toSeq))
        })
    } yield (batches, pairsPerBatch)
    def unionFind(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      ids.map(i => i -> find(i)).toMap
    }
    samples(genCase, 4).foreach { case (batches, pairsPerBatch) =>
      var labels = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("canon", LongType))))
      batches.zip(pairsPerBatch).foreach { case (ids, pairs) =>
        labels = graft.operators.Dedup.mergeClustersBatch(labels,
          ids.toDF("doc_id"),
          pairs.filter(p => p._1 != p._2).toDF("doc_a", "doc_b"))
          .localCheckpoint()
      }
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(batches.flatten,
        pairsPerBatch.flatten.filter(p => p._1 != p._2))
      assert(got === want, s"batches=$batches pairs=$pairsPerBatch")
    }
  }

  test("PPM codec laws: decode∘encode = id over random images; resize dims and sampling exact") {
    import graft.operators.Multimodal.PpmCodec
    val genImage: Gen[PpmCodec.Image] = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 12)
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255).map(_.toByte))
    } yield PpmCodec.Image(w, h, 255, px.toArray)
    samples(genImage, 60).foreach { img =>
      val back = PpmCodec.decode(PpmCodec.encode(img))
      assert(back.width === img.width && back.height === img.height)
      assert(back.pixels.toSeq === img.pixels.toSeq,
        s"roundtrip broke at ${img.width}x${img.height}")
      // resize law: output dims exact, every target pixel nearest-sampled
      val (w1, h1) = (1 + img.height % 7, 1 + img.width % 5) // deterministic targets
      val rs = PpmCodec.resizeNearest(img, w1, h1)
      assert(rs.width === w1 && rs.height === h1 && rs.pixels.length === w1 * h1 * 3)
      for (y <- 0 until h1; x <- 0 until w1; c <- 0 until 3) {
        val sx = x.toLong * img.width / w1
        val sy = y.toLong * img.height / h1
        assert(rs.pixels((y * w1 + x) * 3 + c) ===
          img.pixels(((sy * img.width + sx) * 3 + c).toInt))
      }
    }
  }

  test("Debezium roundtrip: envelope(event) decodes back to the event, any op/key/ts") {
    import spark.implicits._
    // serialize generated ChangeEvents into Debezium wire form, decode
    // through the Spark path, and demand the identity — the decoder is
    // a pure format adapter, so encode∘decode must be lossless for
    // every op, key, image, and timestamp the engine can carry
    val events = samples(genEvent, 40).zipWithIndex.map { case (e, i) =>
      // distinct keys so row identity is unambiguous in the compare
      e.copy(key = s"${e.key}_$i")
    }
    def envelope(e: ChangeEvent): String = {
      // the wire image embeds the key, as real Debezium rows do
      val image = s"""{"id":"${e.key}","payload":${e.newImage}}"""
      val op = e.eventName match {
        case "INSERT" => "c"; case "MODIFY" => "u"; case "REMOVE" => "d"
      }
      val (before, after) =
        if (op == "d") (image, "null") else ("null", image)
      s"""{"payload":{"op":"$op","before":$before,"after":$after,"ts_ms":${e.ts.getTime}}}"""
    }
    val decoded = graft.cdc.DebeziumEnvelope
      .toChangeEvents(events.map(envelope).toDF("value"), keyField = "id")
      .collect()
      .map(e => e.key -> ((e.eventName, e.newImage, e.ts.getTime))).toMap
    val want = events
      .map(e => e.key -> ((e.eventName,
        s"""{"id":"${e.key}","payload":${e.newImage}}""", e.ts.getTime))).toMap
    assert(decoded === want)
  }

  test("rolling fingerprint equals brute-force window minimum") {
    val genCase = Gen.zip(
      Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString),
      Gen.choose(1, 16))
    samples(genCase, 40).foreach { case (s, w) =>
      val bytes = s.getBytes("UTF-8")
      val brute =
        if (bytes.isEmpty) 0L
        else {
          val ww = math.min(w, bytes.length)
          (0 to bytes.length - ww).map { i =>
            bytes.slice(i, i + ww)
              .foldLeft(0L)((h, b) => h * RollingFingerprint.P + (b & 0xffL))
          }.min
        }
      assert(RollingFingerprint.minWindowHash(bytes, w) === brute, s"s=$s w=$w")
    }
  }
}
