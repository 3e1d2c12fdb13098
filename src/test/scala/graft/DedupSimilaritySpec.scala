package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Group X scale-path operators vs their exact ground truths at sf0.001. */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def pairSet(rows: Array[Row]) =
    rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("MinHash+LSH finds exactly the exact-Jaccard near-dup pairs (verification kills FPs; banding recall ~1 at j≥0.8)") {
    val exact = pairSet(Dedup.ngramJaccardPairs(spark, dir).collect())
    val mh = pairSet(Dedup.minhashNearDup(spark, dir).collect())
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    assert(mh === exact)
  }

  test("index-served MinHash pairs equal the inline pipeline at every banding") {
    // a k-hash signature is the length-k prefix of the index's 128, so
    // the index must serve BOTH the candidate query's 64/16 banding and
    // the cluster decision's 128/32 banding result-identically
    for ((h, b) <- Seq((64, 16), (128, 32))) {
      val inline = pairSet(
        Dedup.minhashNearDup(spark, dir, numHashes = h, bands = b).collect())
      val indexed = pairSet(
        Dedup.minhashNearDupIndexed(spark, dir, numHashes = h, bands = b).collect())
      assert(indexed === inline, s"divergence at $h hashes / $b bands")
    }
  }

  test("index-served SimHash pairs equal the inline pipeline") {
    val inline = pairSet(Dedup.simhashNearDup(spark, dir).collect())
    val indexed = pairSet(Dedup.simhashNearDupIndexed(spark, dir).collect())
    assert(indexed === inline)
  }

  test("docs shorter than the shingle width keep their SimHash in the index") {
    // a sub-n-token doc has NO MinHash signature (no complete shingle)
    // but DOES have a SimHash; the index build must not drop it, or the
    // indexed SimHash path diverges from the inline one exactly on the
    // shortest (often junk, often duplicated) documents
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_shortdocs")
    try {
      Seq(
        (0L, "foo bar", "en", "s", 7L),
        (1L, "foo bar", "en", "s", 7L),
        (2L, "a much longer document with plenty of tokens inside it", "en", "s", 55L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val d = tmp.toString
      val inline = pairSet(Dedup.simhashNearDup(spark, d).collect())
      val indexed = pairSet(Dedup.simhashNearDupIndexed(spark, d).collect())
      assert(inline.contains((0L, 1L)), "identical short docs must pair")
      assert(indexed === inline)
      // the MinHash face still serves, with short docs simply absent
      val mh = pairSet(Dedup.minhashNearDupIndexed(spark, d).collect())
      val mhInline = pairSet(Dedup.minhashNearDup(spark, d).collect())
      assert(mh === mhInline)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }

  test("SimHash pair set IS brute-force all-pairs Hamming ≤ 3 — the DuckDB oracle's premise") {
    // block banding is candidate generation only: pigeonhole (4 blocks,
    // ≤3 differing bits) guarantees a superset, exact Hamming
    // verification cuts it to exactly the ≤-3 pairs. That equality is
    // what lets the oracle SQL recompute the pair set by brute force.
    val sims = Dedup.simhashDocs(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sim"))
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture should contain simhash near-dups")
    assert(pairSet(Dedup.simhashNearDup(spark, dir).collect()) === brute)
  }

  test("HOF simhash60 agrees with the aggregate-form simhashOf") {
    import org.apache.spark.sql.functions._
    val agg = Dedup.simhashDocs(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sim")).toMap
    val hof = Tables.documents(spark, dir)
      .select(col("doc_id"),
        Dedup.simhash60(graft.functions.TextFunctions.tokens(col("text"))).as("sim"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sim")).toMap
    assert(hof === agg)
  }

  test("SimHash recalls the strong (j≥0.95) near-dup pairs") {
    // SimHash's contract is Hamming distance over token profiles; on this
    // tiny 31-word vocab unrelated short docs can profile-collide, so we
    // assert RECALL of strong shingle-level dups, not precision.
    val strong = pairSet(Dedup.ngramJaccardPairs(spark, dir, threshold = 0.95).collect())
    val sh = pairSet(Dedup.simhashNearDup(spark, dir).collect())
    assert(strong.nonEmpty, "fixture should contain strong near-duplicates")
    val recalled = (strong & sh).size.toDouble / strong.size
    assert(recalled >= 0.8, s"simhash missed too many strong dups: $recalled")
  }

  test("ANN results carry exact cosine scores and real recall vs brute force") {
    val brute = Similarity.knnCosine(spark, dir, k = 20).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    val ann = Similarity.annKnnCosine(spark, dir, k = 20).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim"))
    assert(ann.nonEmpty)
    // every ANN hit that brute force also ranked must have the identical score
    ann.foreach { case (id, cos) =>
      brute.get(id).foreach(b => assert(math.abs(b - cos) < 1e-12)) }
    val recall = ann.count(a => brute.contains(a._1)).toDouble / brute.size
    assert(recall >= 0.2, s"suspiciously low ANN recall: $recall")
  }

  test("bucketed near-dup pairs: perfect precision, S-curve recall on fixture pairs") {
    val bruteRows = Similarity.embeddingNearDupPairs(spark, dir).collect()
    val brute = bruteRows
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(brute.nonEmpty, "fixture should contain embedding near-dups")
    // default params (6 planes × 8 tables) target the real near-dup
    // regime (cos ≥ 0.8 → recall ≥ 0.97); this fixture's pairs top out at
    // cos ≈ 0.5, so the spec turns the recall knob the way a user would:
    // shorter codes + more tables (4 × 16) put the S-curve's high-recall
    // region at the fixture's similarity level.
    //   per-pair P(candidate) = 1-(1-(1-θ/π)^4)^16 ≈ 0.94 at cos 0.4
    //   ⇒ recall ≥ 0.75 with 3σ binomial slack over ~60 pairs
    val ann = Similarity
      .annNearDupPairs(spark, dir, nPlanes = 4, nTables = 16).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // verification kills every false positive, any parameterization
    assert((ann -- brute).isEmpty)
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.75, s"LSH recall below S-curve prediction: $recall")
    // the declared-query defaults must also yield perfect precision
    val annDefault = Similarity.annNearDupPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert((annDefault -- brute).isEmpty)
  }

  test("srp_buckets: fused codegen node equals the composed per-table srpBucket form bit-for-bit, both eval paths") {
    import org.apache.spark.sql.functions.{array, col}
    import graft.functions.VectorFunctions.{srpBucket, hyperplanes}
    val emb = Tables.embeddings(spark, dir)
    val (tables, planes, seed) = (5, 7, 42L)
    val allPlanes = (0 until tables)
      .flatMap(t => hyperplanes(planes, 64, seed + t).map(_.toArray)).toArray
    val fused = emb.select(col("vec_id"),
        graft.functions.SrpBuckets.buckets(col("embedding"), allPlanes, tables).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = emb.select(col("vec_id"),
        array((0 until tables).map(t =>
          srpBucket(col("embedding"), hyperplanes(planes, 64, seed + t))): _*).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused === composed)
    // interpreted eval path (no codegen) agrees with the generated loop
    val expr = graft.functions.SrpBuckets(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.tabulate(64)(i => (i % 7 - 3).toFloat),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      allPlanes, tables)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val viaDf = spark.range(1).select(
        graft.functions.SrpBuckets.buckets(
          org.apache.spark.sql.functions.typedLit(
            Array.tabulate(64)(i => (i % 7 - 3).toFloat)), allPlanes, tables))
      .collect().head.getSeq[Long](0)
    assert(interp.toSeq === viaDf)
  }

  test("dup clusters: canonical is component minimum; pairs share a canonical") {
    val pairs = Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val canon = Dedup.dupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canon")).toMap
    pairs.foreach { case (a, b) =>
      assert(canon(a) === canon(b), s"pair ($a,$b) split across clusters")
      assert(canon(a) <= math.min(a, b))
    }
    // singletons are their own canonical
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    canon.filterNot(kv => inPairs(kv._1)).foreach { case (d, c) => assert(d === c) }
  }

  test("min-label propagation: deep path graph converges via pointer-jump; unconverged exit fails loudly") {
    import spark.implicits._
    // a path 0-1-2-…-80 has component diameter 80: pure neighbor-min
    // propagation needs 80 rounds (the pre-round-8 default of 15 would
    // have SILENTLY returned non-minimum labels); the pointer-jump step
    // must land the fixpoint well inside the default bound
    val pairs = (0L until 80L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // default regime: single-task union-find
    val labels = Dedup.propagateMinLabels(pairs).collect()
    assert(labels.length === 81)
    assert(labels.forall(_.getLong(1) == 0L),
      "every node of the path must label to the component minimum 0")
    // large regime (forced by a zero union-find cutoff): the iterative
    // pointer-jump loop must land the same fixpoint
    val looped = Dedup.propagateMinLabels(pairs, unionFindMaxEdges = 0L)
      .collect()
    assert(looped.length === 81)
    assert(looped.forall(_.getLong(1) == 0L),
      "the iterative loop must agree with the union-find labels")
    // a bound too small for the graph must throw, never return partial
    // (unconverged labels would corrupt the incremental merge fold)
    val e = intercept[IllegalStateException] {
      Dedup.propagateMinLabels(pairs, maxIters = 2,
        unionFindMaxEdges = 0L).collect()
    }
    assert(e.getMessage.contains("no fixpoint"))
  }

  test("dup clusters from MinHash pairs equal clusters from exact pairs") {
    // the scale path (bucketed LSH pair source, the declared query) must
    // produce the same dedup decision as the quadratic ground truth
    val viaMinhash = Dedup.dupClusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("canon"))).toSet
    val viaExact = Dedup.dupClusters(spark, dir, exactPairs = true).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("canon"))).toSet
    assert(viaMinhash === viaExact)
  }

  test("indexed ANN returns exactly the in-query ANN results") {
    // same planes + same multi-probe set ⇒ identical candidates ⇒ the
    // materialized, partition-pruned index must be result-identical
    val inline = Similarity.annKnnCosine(spark, dir, k = 20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    val indexed = Similarity.annKnnCosineIndexed(spark, dir, k = 20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    assert(indexed === inline)
  }

  test("codegen, broadcast-join, and literal centroid assignment agree bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // three faces of one argmin: the codegen'd expression (production),
    // the broadcast-codebook join (pure-DataFrame reference, plan-size-
    // free), and the literal embedding (the pre-round-8 path, plan grows
    // with nlist) — trained centroids, so the distances exercised are
    // the real ones, first-minimum tie-break included
    val cents = Similarity.ivfCentroids(spark, dir, nlist = 32, iters = 2)
    val emb = Tables.embeddings(spark, dir)
    def byId(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("vec_id"), col("cid")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCodegen = byId(Similarity.withNearestCid(spark, emb, cents))
    val viaJoin = byId(Similarity.withNearestCidJoin(spark, emb, cents))
    val viaLiteral = byId(emb.withColumn("cid",
      Similarity.nearestCentroid(col("embedding"), cents)))
    assert(viaCodegen === viaLiteral)
    assert(viaJoin === viaLiteral)
    assert(viaCodegen.values.toSet.size > 1, "degenerate: everything in one list")
  }

  test("deterministic training: retrained centroids are bit-identical; inline equals indexed IVF") {
    val a = Similarity.ivfCentroids(spark, dir, nlist = 16, iters = 2)
    val b = Similarity.ivfCentroids(spark, dir, nlist = 16, iters = 2)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y),
      "micro-unit-quantized Lloyd sums must be partition-order independent") }
    // with training deterministic, the inline face must EQUAL the
    // index-served face (pre-round-8 this comparison was flaky because
    // double sums were partition-order sensitive)
    val inline = Similarity.ivfKnnCosine(spark, dir, k = 20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    val indexed = Similarity.ivfKnnCosineIndexed(spark, dir, k = 20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    assert(inline === indexed)
  }

  test("IVF knn carries exact cosine scores with usable recall") {
    val brute = Similarity.knnCosine(spark, dir, k = 20).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    val ivf = Similarity.ivfKnnCosine(spark, dir, k = 20).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim"))
    assert(ivf.nonEmpty)
    ivf.foreach { case (id, cos) =>
      brute.get(id).foreach(b => assert(math.abs(b - cos) < 1e-12)) }
    val recall = ivf.count(a => brute.contains(a._1)).toDouble / brute.size
    assert(recall >= 0.2, s"suspiciously low IVF recall: $recall")
  }

  test("indexed IVF knn carries exact cosine scores with usable recall") {
    // indexed IVF probes the persisted lists; scores must still be exact
    // and recall comparable to the inline form (same assertion style —
    // inline-vs-indexed equality would be flaky because Lloyd's double
    // sums are partition-order dependent across runs)
    val brute = Similarity.knnCosine(spark, dir, k = 20).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    val ivf = Similarity.ivfKnnCosineIndexed(spark, dir, k = 20).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim"))
    assert(ivf.nonEmpty)
    ivf.foreach { case (id, cos) =>
      brute.get(id).foreach(b => assert(math.abs(b - cos) < 1e-12)) }
    val recall = ivf.count(a => brute.contains(a._1)).toDouble / brute.size
    assert(recall >= 0.2, s"suspiciously low indexed-IVF recall: $recall")
    // second call must hit the freshness fast path and agree with itself
    val again = Similarity.ivfKnnCosineIndexed(spark, dir, k = 20).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim"))
    assert(again === ivf)
  }

  test("exact dedup and fingerprint dedup agree on canonical ids") {
    val a = Dedup.exactDedup(spark, dir).collect().map(_.getAs[Long]("doc_id")).toSet
    val b = Dedup.fingerprintDedup(spark, dir).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a === b) // md5 collisions would be the only divergence
  }

  test("token_window_hash equals a driver replica on edge cases; under-w texts yield empty") {
    import spark.implicits._
    import graft.functions.TokenWindowHash
    val texts = Seq("", " ", "a", "a b", "a b c", "a  b c", " a b ",
      "x y z w", "repeat repeat repeat repeat")
    def replica(text: String, w: Int): Seq[Long] = {
      val toks = text.split(" ", -1)
      if (toks.length < w) Nil
      else toks.map { tok =>
        tok.getBytes("UTF-8").foldLeft(TokenWindowHash.FnvBasis)(
          (h, b) => (h ^ (b & 0xffL)) * TokenWindowHash.FnvPrime)
      }.sliding(w).map(_.foldLeft(0L)(_ * graft.functions.RollingFingerprint.P + _))
        .toSeq
    }
    for (w <- Seq(1, 2, 3)) {
      val got = texts.toDF("text")
        .select(TokenWindowHash.tokenWindowHashes($"text", w))
        .collect().map(_.getSeq[Long](0).toSeq)
      assert(got.toSeq === texts.map(replica(_, w)), s"w=$w")
    }
  }

  test("substring dedup counts cross-doc repeated windows exactly; flags fire both ways") {
    val w = 10
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
    val windows = docs.flatMap { case (id, toks) =>
      if (toks.length < w) Nil
      else toks.sliding(w).map(g => (id, g.mkString(" "))).toSeq
    }
    val perDoc = windows.groupBy(identity).map { case ((id, win), xs) =>
      (id, win) -> xs.length.toLong }
    val ndocs = perDoc.keys.groupBy(_._2).map { case (win, ks) => win -> ks.size }
    val want = perDoc.groupBy(_._1._1).map { case (id, m) =>
      val nw = m.values.sum
      val nd = m.collect { case ((_, win), k) if ndocs(win) >= 2 => k }.sum
      id -> ((nw, nd, nd * 100 >= nw * 50))
    }
    val got = Dedup.substringDedup(spark, dir, w).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Boolean]("dup_heavy"))))
      .toMap
    assert(got === want)
    assert(got.values.exists(_._3), "no dup-heavy doc — fixture families should trip it")
    assert(got.values.exists(!_._3), "every doc flagged — filter degenerate")
  }

  test("PQ: codes are per-subspace argmins (driver replica); ADC top-k has usable recall") {
    import graft.operators.PQ
    val m = 8; val ksub = 16; val dsub = 8
    val books = PQ.train(spark, dir, m, ksub, iters = 2)
    assert(books.length === m)
    assert(books.forall(b => b.length === ksub && b.forall(_.length === dsub)))
    // codes equal a driver recompute of the subspace argmin (distance
    // c2 - 2·dot, first-minimum tie-break — the NearestCentroid law)
    val vecs = Tables.embeddings(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    val got = PQ.encode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got.size === vecs.size * m)
    got.foreach { case ((id, s), code) =>
      val v = vecs(id)
      val dists = books(s).map { c =>
        val c2 = c.map(x => x * x).sum
        var acc = 0.0
        (0 until dsub).foreach(i => acc += v(s * dsub + i).toDouble * c(i))
        c2 - 2.0 * acc
      }
      assert(code === dists.indexOf(dists.min), s"code ($id, $s)")
    }
    // ADC ranking over 8-byte codes still finds a usable share of the
    // exact top-20 (the compression/recall trade the operator exists for)
    val brute = Similarity.knnCosine(spark, dir, k = 20).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val adc = PQ.pqTopK(spark, dir, k = 20).collect()
      .map(_.getAs[Long]("vec_id"))
    assert(adc.nonEmpty)
    val recall = adc.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.2, s"suspiciously low PQ recall: $recall")
    // served from the materialized code table: a second call hits the
    // freshness fast path and returns the identical ranking
    val again = PQ.pqTopK(spark, dir, k = 20).collect()
      .map(_.getAs[Long]("vec_id"))
    assert(again.toSeq === adc.toSeq)
  }

  test("embedding decontamination equals a driver replica; flag fires both ways") {
    val tau = 0.4; val benchMod = 20L
    val vecs = Tables.embeddings(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).sortBy(_._1)
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cosFF(a: Array[Float], b: Array[Float]): Double = {
      val n = math.sqrt(dotFF(a, a)) * math.sqrt(dotFF(b, b))
      if (n == 0.0) 0.0 else dotFF(a, b) / n
    }
    val bench = vecs.filter(_._1 % benchMod == 0).map(_._2)
    val want = vecs.filter(_._1 % benchMod != 0).map { case (id, v) =>
      val m = bench.map(b => cosFF(v, b)).max
      id -> ((m, m >= tau))
    }.toMap
    val got = Similarity.embedDecontaminate(spark, dir, tau, benchMod).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("max_cos"), r.getAs[Boolean]("contaminated")))).toMap
    assert(got === want)
    assert(got.values.exists(_._2), "no contaminated doc — fixture near-dups should trip it")
    assert(got.values.exists(!_._2), "everything contaminated — filter degenerate")
  }

  test("semantic dedup equals a driver recompute of cluster/group/keep; prune actually fires") {
    val nlist = 16; val tau = 0.4
    // same deterministic quantizer the operator trains internally
    val centroids = Similarity.ivfCentroids(spark, dir, nlist, iters = 2)
    val vecs = Tables.embeddings(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
      .sortBy(_._1)
    // exact replicas of FloatArrayDot (left-to-right double accumulation)
    // and the operator's centroid-distance / cosine formulas
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def dotFD(a: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, c.length)) { s += a(i).toDouble * c(i); i += 1 }; s
    }
    def dotDD(c: Array[Double]): Double = {
      var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s
    }
    def cosFF(a: Array[Float], b: Array[Float]): Double = {
      val n = math.sqrt(dotFF(a, a)) * math.sqrt(dotFF(b, b))
      if (n == 0.0) 0.0 else dotFF(a, b) / n
    }
    def cosFD(a: Array[Float], c: Array[Double]): Double = {
      val n = math.sqrt(dotFF(a, a)) * math.sqrt(dotDD(c))
      if (n == 0.0) 0.0 else dotFD(a, c) / n
    }
    val cid = vecs.map { case (_, v) =>
      val dists = centroids.map(c => c.map(x => x * x).sum - 2.0 * dotFD(v, c))
      dists.indexOf(dists.min) // array_position finds the FIRST minimum
    }
    val cosCent = vecs.zip(cid).map { case ((_, v), k) => cosFD(v, centroids(k)) }
    // within-cluster τ-pairs → union-find → canon = component min vec_id
    val idx = vecs.indices
    val parent = scala.collection.mutable.Map(idx.map(i => i -> i): _*)
    def find(i: Int): Int = if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    var pairSeen = 0
    for (i <- idx; j <- idx if i < j && cid(i) == cid(j)
         && cosFF(vecs(i)._2, vecs(j)._2) >= tau) {
      pairSeen += 1
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    assert(pairSeen > 0, "no within-cluster τ-pair — fixture degenerate for this test")
    val groups = idx.groupBy(find).values
    val want = idx.map { i => vecs(i)._1 -> ((cid(i), vecs(i)._1, true)) }.toMap ++
      groups.filter(_.size > 1).flatMap { g =>
        val canon = g.map(vecs(_)._1).min
        val keep = g.minBy(i => (cosCent(i), vecs(i)._1))
        g.map(i => vecs(i)._1 -> ((cid(i), canon, i == keep)))
      }
    val got = Similarity.semanticDedup(spark, dir, nlist, tau).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cid"), r.getAs[Long]("group_id"), r.getAs[Boolean]("kept"))))
      .toMap
    assert(got === want)
    assert(got.values.exists(!_._3), "nothing pruned — dedup inert")
    // survivors within one cluster are pairwise below τ (the keep-one-
    // per-component guarantee, re-checked from raw vectors)
    for (i <- idx; j <- idx if i < j && cid(i) == cid(j)
         && got(vecs(i)._1)._3 && got(vecs(j)._1)._3)
      assert(cosFF(vecs(i)._2, vecs(j)._2) < tau)
  }

  test("batch ANN serve: per-query slices bit-identical to the single-query indexed serve") {
    val qids = Seq(0L, 1L, 2L, 3L)
    val k = 10
    val batch = Similarity.ivfKnnBatch(spark, dir, queryIds = qids, k = k)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("label"), r.getAs[Double]("cos_sim")))
    assert(batch.map(_._1).distinct.sorted === qids,
      "every query must produce results")
    qids.foreach { qid =>
      val single = Similarity.ivfKnnCosineIndexed(spark, dir,
          queryId = qid, k = k).collect()
        .map(r => (qid, r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
          r.getAs[Double]("cos_sim")))
      assert(batch.filter(_._1 == qid).toSeq === single.toSeq,
        s"batch slice for qid=$qid must equal the single-query serve")
    }
  }

  test("batch ANN serve: distributed probe ranking bit-identical to the driver protocol") {
    import org.apache.spark.sql.functions.col
    val qids = Seq(0L, 1L, 2L, 3L)
    val nprobe = 4
    val (_, cents) = Similarity.ensureIvfIndex(spark, dir)
    // 1) the ranked (qid, cid) pairs themselves match the driver loop
    val qDf = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val distributed = Similarity.probeRankingDf(spark, qDf, cents, nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qids.foreach { qid =>
      val qv = Tables.embeddings(spark, dir)
        .filter(col("vec_id") === qid).select(col("embedding"))
        .head().getSeq[Float](0)
      assert(distributed(qid) === Similarity.probeRanking(qv, cents, nprobe).toSet,
        s"distributed probe set for qid=$qid diverges from the driver protocol")
    }
    // 2) end-to-end: forcing the distributed face produces the exact
    // same frame as the driver fast path
    def run(driverRankMax: Int) =
      Similarity.ivfKnnBatch(spark, dir, queryIds = qids, k = 10,
          driverRankMax = driverRankMax)
        .collect().map(_.toSeq).toSeq
    assert(run(0) === run(Similarity.BatchDriverRankMax),
      "distributed and driver-ranked batch serve must be bit-identical")
  }

  test("IVF-PQ batch serve: per-query slices row-identical to the single-query composite") {
    import graft.operators.PQ
    val qids = Seq(0L, 1L, 2L, 3L)
    val batch = PQ.ivfpqBatch(spark, dir, queryIds = qids, k = 10).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("label"), r.getAs[Double]("cos_sim")))
    assert(batch.map(_._1).distinct.sorted === qids)
    qids.foreach { qid =>
      val single = PQ.ivfpqTopK(spark, dir, queryId = qid, k = 10).collect()
        .map(r => (qid, r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
          r.getAs[Double]("cos_sim")))
      assert(batch.filter(_._1 == qid).toSeq === single.toSeq,
        s"batch slice for qid=$qid must equal the single-query composite")
    }
  }

  test("IVF-PQ batch serve: distributed ADC/ranking face bit-identical to the driver face") {
    import graft.operators.PQ
    val qids = Seq(0L, 1L, 2L, 3L)
    def run(max: Int) =
      PQ.ivfpqBatch(spark, dir, queryIds = qids, k = 10, driverRankMax = max)
        .collect().map(_.toSeq).toSeq
    assert(run(0) === run(Similarity.BatchDriverRankMax),
      "forcing the distributed probe/ADC/refine path must not change a bit")
    val e = intercept[IllegalArgumentException] {
      PQ.ivfpqBatch(spark, dir, queryIds = Seq(0L, -77L)).collect()
    }
    assert(e.getMessage.contains("missing"), e.getMessage)
  }

  test("batch ANN serve: keyed-shuffle face row-identical to the broadcast face (both operators)") {
    // broadcastMax=0 forces the large-Q physical shape — keyed shuffle
    // joins for the probe pairs / query vectors / ADC frame — on a small
    // Q where the broadcast face is the oracle. Combined with
    // driverRankMax=0 this exercises the full large-Q plan end to end:
    // distributed probe ranking + keyed serving joins, nothing driver-side.
    import graft.operators.PQ
    val qids = Seq(0L, 1L, 2L, 3L)
    val ivfB = Similarity.ivfKnnBatch(spark, dir, queryIds = qids, k = 10)
      .collect().map(_.toSeq).toSeq
    val ivfK = Similarity.ivfKnnBatch(spark, dir, queryIds = qids, k = 10,
        driverRankMax = 0, broadcastMax = 0)
      .collect().map(_.toSeq).toSeq
    assert(ivfK === ivfB, "IVF keyed face diverged from broadcast face")
    val pqB = PQ.ivfpqBatch(spark, dir, queryIds = qids, k = 10)
      .collect().map(_.toSeq).toSeq
    val pqK = PQ.ivfpqBatch(spark, dir, queryIds = qids, k = 10,
        driverRankMax = 0, broadcastMax = 0)
      .collect().map(_.toSeq).toSeq
    assert(pqK === pqB, "IVF-PQ keyed face diverged from broadcast face")
  }

  test("batch ANN serve fails loudly on a missing query id (both ranking faces)") {
    val missing = Seq(0L, -12345L)
    Seq(0, Similarity.BatchDriverRankMax).foreach { max =>
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfKnnBatch(spark, dir, queryIds = missing,
          driverRankMax = max).collect()
      }
      assert(e.getMessage.contains("not present"), e.getMessage)
    }
  }

  test("IVF-PQ: driver replica reproduces probes, ADC cut, and refined top-k; recall usable") {
    import graft.operators.PQ
    val k = 20; val nprobe = 4; val m = 8; val ksub = 16; val dsub = 8
    val refine = 50
    val got = PQ.ivfpqTopK(spark, dir, k = k).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
        r.getAs[Double]("cos_sim")))
    assert(got.length === k)

    // replica from the materialized pieces: coarse lists + codes read
    // back from the composite index, codebooks from their headers
    val (path, cents, books) = PQ.ensureIvfPqIndex(spark, dir)
    val idx = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"),
        r.getSeq[Int](r.fieldIndex("codes")).toArray))
    val vecs = Tables.embeddings(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label").toLong,
        r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val vmap = vecs.map(v => v._1 -> v).toMap
    val q = vmap(0L)._3
    def dotFD(a: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += a(i).toDouble * c(i); i += 1 }; s
    }
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val probes = cents.indices.sortBy(c => -dotFD(q, cents(c)))
      .take(nprobe).toSet
    // every scored candidate must live in a probed list (the pruning
    // contract), and the RESIDUAL ADC cut (per-probe distance tables in
    // residual space, ascending) + exact-cosine refine must reproduce
    // the operator's output exactly
    val dts: Map[Int, Array[Array[Double]]] = probes.map { p =>
      val qr = Array.tabulate(q.length)(i => q(i).toDouble - cents(p)(i))
      p -> Array.tabulate(m)(s => Array.tabulate(ksub) { kk =>
        val c = books(s)(kk)
        (0 until dsub).foldLeft(0.0) { (acc, i) =>
          val d = qr(s * dsub + i) - c(i); acc + d * d }
      })
    }.toMap
    val cand = idx.filter(x => probes.contains(x._2) && x._1 != 0L)
      .map(x => x._1 ->
        (0 until m).foldLeft(0.0)((acc, s) => acc + dts(x._2)(s)(x._3(s))))
      .sortBy { case (id, adc) => (adc, id) }.take(refine)
    val want = cand.map { case (id, _) =>
      val (vid, lab, v) = vmap(id)
      val n = math.sqrt(dotFF(v, v)) * math.sqrt(dotFF(q, q))
      (vid, lab, if (n == 0.0) 0.0 else dotFF(v, q) / n)
    }.sortBy { case (id, _, cos) => (-cos, id) }.take(k)
    assert(got.map(g => (g._1, g._2)).toSeq === want.map(w => (w._1, w._2)).toSeq)
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) =>
      assert(math.abs(g - w) < 1e-12) }

    // the codes on disk are the residual encode under frozen quantizers:
    // re-derive each row's codes from raw vector − its list's centroid
    idx.foreach { case (vid, cid, codes) =>
      val v = vmap(vid)._3
      val res = Array.tabulate(v.length)(i => v(i).toDouble - cents(cid)(i))
      (0 until m).foreach { s =>
        val slice = res.slice(s * dsub, (s + 1) * dsub)
        val wantCode = books(s).indices.minBy { kk =>
          val c = books(s)(kk)
          // same d = |c|² − 2·dot form as NearestCentroid, first minimum
          c.map(x => x * x).sum -
            2.0 * slice.indices.foldLeft(0.0)((a, i) => a + slice(i) * c(i))
        }
        assert(codes(s) === wantCode,
          s"vec $vid subspace $s: stored code ${codes(s)} != re-derived $wantCode")
      }
    }

    // the ADC candidate stage prunes cid partitions at the scan
    val candPlan = PQ.ivfpqResidualCandidatesFrom(spark.read.parquet(path),
        probes.toSeq.sorted.map(_.toLong),
        dts.map { case (p, t) => p.toLong -> t }, 0L, refine)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(candPlan).isDefined,
      "cid probes did not reach PartitionFilters:\n" + candPlan)

    // usable recall vs the exact top-k, and scores are TRUE cosines
    val brute = Similarity.knnCosine(spark, dir, k = k).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    got.foreach { case (id, _, cos) =>
      brute.get(id).foreach(b => assert(math.abs(b - cos) < 1e-12)) }
    val recall = got.count(g => brute.contains(g._1)).toDouble / brute.size
    assert(recall >= 0.2, s"suspiciously low IVF-PQ recall: $recall")

    // serving twice hits the freshness fast path and agrees with itself
    val again = PQ.ivfpqTopK(spark, dir, k = k).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
        r.getAs[Double]("cos_sim")))
    assert(again.toSeq === got.toSeq)
  }

  test("nearest_centroid fails loudly on dimension mismatch and null elements") {
    import graft.functions.NearestCentroid
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))

    // interpreted path, direct eval
    val expr = NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), cents)
    // [1,2] is nearer [0,1] than [1,0] → cid 1
    assert(expr.nullSafeEval(new GenericArrayData(Array[Any](1.0, 2.0))) === 1)
    val tooShort = intercept[IllegalArgumentException] {
      expr.nullSafeEval(new GenericArrayData(Array[Any](1.0)))
    }
    assert(tooShort.getMessage.contains("codebook dimension"))
    val nullElem = intercept[IllegalArgumentException] {
      expr.nullSafeEval(new GenericArrayData(Array[Any](1.0, null)))
    }
    assert(nullElem.getMessage.contains("null element"))

    // codegen path, through a real plan: wrong-length vector must kill
    // the job, not yield a plausible cid from a partial dot product
    import spark.implicits._
    val short = Seq(Seq(1.0)).toDF("v")
    val bad = intercept[Exception] {
      short.select(NearestCentroid.assign(org.apache.spark.sql.functions
        .col("v"), cents)).collect()
    }
    def rootMsgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: rootMsgs(e.getCause))
    assert(rootMsgs(bad).exists(m => m != null && m.contains("codebook dimension")), bad.toString)
    val withNull = Seq(Seq(Some(1.0), None)).toDF("v")
    val badNull = intercept[Exception] {
      withNull.select(NearestCentroid.assign(org.apache.spark.sql.functions
        .col("v"), cents)).collect()
    }
    assert(rootMsgs(badNull).exists(m => m != null && m.contains("null element")), badNull.toString)
  }

  test("paragraph dedup: keeps exactly the distinct spans, rewrites losslessly, empties exact-duplicate copies") {
    import org.apache.spark.sql.functions._
    val w = 20
    val out = Dedup.paragraphDedup(spark, dir, w).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap

    // sum(n_kept) over the corpus == number of DISTINCT spans, computed
    // independently (distinct over the exploded span text itself)
    val docs = graft.Tables.documents(spark, dir)
    val spanExpr = expr(s"""explode(transform(
      sequence(0, cast(ceil(size(split(text,' ')) / $w.0d) as int) - 1),
      i -> array_join(slice(split(text,' '), i * $w + 1, $w), ' ')))""")
    val nDistinct = docs.select(spanExpr.as("span")).distinct().count()
    assert(out.map(_.getAs[Long]("n_kept")).sum === nDistinct)

    // a doc that lost nothing rewrites to its EXACT original text
    // (single-space corpus: join(spans) is the identity)
    val originals = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val untouched = out.filter(r =>
      r.getAs[Long]("n_kept") == r.getAs[Long]("n_spans"))
    assert(untouched.nonEmpty)
    untouched.foreach { r =>
      assert(r.getAs[String]("clean_text") ===
        originals(r.getAs[Long]("doc_id")))
    }

    // every non-first copy of an exact-duplicate doc keeps ZERO spans:
    // all its spans are owned by the earlier copy. The corpus has no
    // exact duplicates, so append derived copies of 3 docs under fresh
    // higher doc_ids and run over the augmented frame.
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val dupes = docs.where(col("doc_id") < 3)
      .select((col("doc_id") + lit(maxId + 1)).as("doc_id"), col("text"))
    val augmented = docs.select(col("doc_id"), col("text")).union(dupes)
    val aug = Dedup.paragraphDedupOf(augmented, w).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    (0L until 3L).foreach { orig =>
      val copy = aug(orig + maxId + 1)
      assert(copy.getAs[Long]("n_kept") === 0L, s"copy of doc $orig")
      assert(copy.getAs[String]("clean_text") === "", s"copy of doc $orig")
      // and the ORIGINAL keeps what the unaugmented run kept
      assert(aug(orig).getAs[Long]("n_kept") ===
        byId(orig).getAs[Long]("n_kept"), s"doc $orig")
    }
  }
}
