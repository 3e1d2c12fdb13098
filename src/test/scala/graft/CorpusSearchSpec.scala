package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.{CorpusOps, Search, Similarity}

/** Corpus-preparation + keyword-search operators at sf0.001. */
class CorpusSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("PII scrub removes every phone pattern and counts its redactions") {
    val rows = CorpusOps.piiScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    val phone = CorpusOps.PhoneRegex.r
    val email = CorpusOps.EmailRegex.r
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(phone.findFirstIn(red).isEmpty, s"phone survived: $red")
      assert(email.findFirstIn(red).isEmpty, s"email survived: $red")
      assert(red.contains("[PHONE]"), red)
      // every profile carries one phone; even keys also carry an email
      val expect = if (r.getAs[Long]("c_custkey") % 2 == 0) 2L else 1L
      assert(r.getAs[Long]("n_redactions") === expect, r.toString)
    }
  }

  test("repetition stats equal a driver recompute; the flag is the 10% top-share rule") {
    import graft.operators.TextAnalysis
    val want = Tables.documents(spark, dir).collect().flatMap { r =>
      val toks = r.getAs[String]("text").split(" ", -1)
      if (toks.length < 2) None
      else {
        val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).map(_._2.size.toLong)
        Some(r.getAs[Long]("doc_id") ->
          ((counts.sum, counts.size.toLong, counts.max,
            counts.max * 100 >= counts.sum * 10)))
      }
    }.toMap
    val got = TextAnalysis.repetitionStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_distinct_bigrams"),
          r.getAs[Long]("top_bigram_count"), r.getAs[Boolean]("repetitive"))))
      .toMap
    assert(got === want)
    // the fixture's dup-heavy docs must actually trip the filter
    assert(got.values.exists(_._4), "no repetitive doc flagged — filter inert")
    assert(got.values.exists(!_._4), "every doc flagged — filter degenerate")
  }

  test("decontamination counts benchmark shingle overlap and excludes the benchmark itself") {
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
    def sh3(toks: Array[String]): Set[String] =
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    val evalSet = docs.filter(_._1 % CorpusOps.EvalSliceMod == 0)
      .flatMap(d => sh3(d._2)).toSet
    val want = docs.filter(_._1 % CorpusOps.EvalSliceMod != 0)
      .flatMap { case (id, toks) =>
        val s = sh3(toks)
        if (s.isEmpty) None
        else Some(id -> ((s.size.toLong, s.count(evalSet).toLong)))
      }.toMap
    val got = CorpusOps.decontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_overlap"))))
      .toMap
    assert(got === want)
    // benchmark docs never appear in the output
    assert(got.keys.forall(_ % CorpusOps.EvalSliceMod != 0))
    // near-dup fixture docs of a benchmark doc must show up contaminated
    val flagged = CorpusOps.decontaminate(spark, dir).filter("contaminated").count()
    assert(flagged > 0, "no contaminated doc found — the fixture has near-dups of every doc family")
  }

  test("chunking covers each document exactly with the declared stride") {
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).length).toMap
    val chunks = CorpusOps.chunkTokenWindows(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val n = docs(id)
      // starts at 0, stride 48 while start < n ⇒ ceil(n/48) chunks
      assert(cs.length === (n + 47) / 48, s"doc $id: $n tokens, ${cs.length} chunks")
      val sorted = cs.sortBy(_.getAs[Long]("chunk_id"))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_id") === i.toLong)
        val expect = math.min(64, n - i * 48)
        assert(c.getAs[Long]("chunk_tokens") === expect.toLong)
      }
    }
  }

  test("temperature mix upweights low-resource languages; weights are an exact integer recipe") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.CorpusOps.mixTemperature(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("natural_ppm"),
          r.getAs[Long]("samp_ppm"), r.getAs[Long]("boost_milli"))))
    assert(rows.length > 1)
    // driver replica of the α=1/2 integer recipe
    val sTot = rows.map { case (_, (t, _, _, _)) =>
      math.floor(math.sqrt(t.toDouble) * 1048576.0).toLong }.sum
    val tTot = rows.map(_._2._1).sum
    rows.foreach { case (lang, (t, nat, samp, boost)) =>
      val s = math.floor(math.sqrt(t.toDouble) * 1048576.0).toLong
      assert(nat === t * 1000000L / tTot, s"natural_ppm $lang")
      assert(samp === s * 1000000L / sTot, s"samp_ppm $lang")
      assert(boost === samp * 1000L / math.max(nat, 1L), s"boost $lang")
    }
    // α<1 flattens: the SMALLEST slice is boosted above natural share,
    // the LARGEST damped below it
    val byTokens = rows.sortBy(_._2._1)
    assert(byTokens.head._2._4 > 1000L,
      s"low-resource ${byTokens.head._1} not upweighted")
    assert(byTokens.last._2._4 < 1000L,
      s"high-resource ${byTokens.last._1} not damped")
  }

  test("stratified sample is deterministic and near its per-language rates") {
    val a = CorpusOps.sampleStratified(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    val b = CorpusOps.sampleStratified(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(a === b, "sampling must be rerun-stable")
    val total = Tables.documents(spark, dir).count().toDouble
    // blended target rate sits between the 25% (en) and 50% strata; with
    // 50 docs allow generous binomial slack
    val rate = a.length / total
    assert(rate > 0.15 && rate < 0.65, s"sample rate $rate out of range")
  }

  test("exact-k sampling: exact per-stratum sizes, prefix property, " +
      "agreement with a full-sort reference") {
    import org.apache.spark.sql.functions._
    val k = 7
    val got = CorpusOps.sampleExactK(spark, dir, k).collect()
    val strata = Tables.documents(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = got.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    strata.foreach { case (lang, n) =>
      assert(sizes.getOrElse(lang, 0) === math.min(k.toLong, n).toInt,
        s"stratum $lang: want min($k, $n)")
    }
    // prefix property: the k=3 sample is exactly the rank ≤ 3 slice
    val small = CorpusOps.sampleExactK(spark, dir, 3).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"))).toSet
    val prefix = got.filter(_.getAs[Long]("rank") <= 3)
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"))).toSet
    assert(small === prefix, "growing k must never resample the prefix")
    // bounded-heap result ≡ the window-sort reference
    val ref = Tables.documents(spark, dir)
      .withColumn("h", conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank").cast("long"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    assert(got.map(_.toSeq).toSet === ref)
  }

  test("range sharding: a shard holds at most budget + one spanning document") {
    val budget = 2048
    val rows = CorpusOps.packBudget(spark, dir, budget).collect()
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case ((lang, shard), docs) =>
        val toks = docs.map(_.getAs[Long]("n_tokens")).sum
        val maxDoc = docs.map(_.getAs[Long]("n_tokens")).max
        assert(toks <= budget + maxDoc,
          s"$lang shard $shard holds $toks tokens (budget $budget)")
      }
    // shards are contiguous in doc_id order within a language
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, docs) =>
      val byId = docs.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("shard"))
      assert(byId === byId.sorted, "shard ids must be non-decreasing")
    }
  }

  test("keyword search returns exactly the docs containing ALL terms, ranked by tf") {
    val terms = Seq("spark", "merge")
    val expected = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
      .filter { case (_, toks) => terms.forall(toks.contains) }
      .map { case (id, toks) => id -> toks.count(terms.contains).toLong }
      .toMap
    val got = Search.keywordSearch(spark, dir, terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tf_sum")).toMap
    assert(got === expected)
  }

  test("tfidf: a term present in every doc scores zero; scores are tf-monotone per term") {
    val rows = Search.tfidfScored(spark, dir).collect()
    val n = Tables.documents(spark, dir).count()
    rows.filter(_.getAs[Long]("df") === n).foreach { r =>
      assert(r.getAs[Double]("score") === 0.0, r.toString)
    }
    rows.groupBy(_.getAs[String]("term")).foreach { case (_, rs) =>
      val byTf = rs.sortBy(_.getAs[Long]("tf")).map(_.getAs[Double]("score"))
      assert(byTf === byTf.sorted, "score must grow with tf at fixed df")
    }
  }

  test("bm25: score bit-equals a driver recompute; idf falls as df rises") {
    val rows = Search.bm25Scored(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tf = r.getAs[Long]("tf").toDouble
      val df = r.getAs[Long]("df").toDouble
      val dl = r.getAs[Long]("dl").toDouble
      val n = r.getAs[Long]("n_docs").toDouble
      val tot = r.getAs[Long]("total_tokens").toDouble
      // the exact expression trees of Search.bm25/bm25Scored — every op
      // correctly rounded, so equality is ==, not a tolerance
      val tfNorm = tf * (Search.Bm25K1 + 1.0) /
        (tf + Search.Bm25K1 * ((1.0 - Search.Bm25B) +
          Search.Bm25B * (dl * n / tot)))
      assert(r.getAs[Double]("tf_norm") === tfNorm, r.toString)
      // StrictMath, not Math: Spark's Log codegen calls StrictMath.log
      // for platform-stable results, and the two differ in the last ulp
      val score = tfNorm * StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)
      assert(r.getAs[Double]("score") === score, r.toString)
    }
    // BM25's idf must be strictly decreasing in df: recover idf from
    // score/tf_norm pairs at each distinct df
    val idfByDf = rows.map(r =>
        r.getAs[Long]("df") -> r.getAs[Double]("score") / r.getAs[Double]("tf_norm"))
      .distinct.groupBy(_._1).map { case (df, xs) => df -> xs.head._2 }
      .toSeq.sortBy(_._1)
    idfByDf.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a > b, "idf must fall as df rises")
      case _ =>
    }
  }

  test("lm score bit-equals a driver recompute of the quantized bigram log-probs") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
    // driver-side LM: corpus bigram + first-word counts, then per doc
    // the same floor(ln(bc/uc)·1e6 + 0.5) micro-nat sum
    val bigrams = docs.flatMap { case (id, toks) =>
      toks.sliding(2).filter(_.length == 2).map(w => id -> (w(0), w(0) + " " + w(1)))
    }
    val bc = bigrams.groupBy(_._2._2).map { case (k, xs) => k -> xs.length.toLong }
    val uc = bigrams.groupBy(_._2._1).map { case (k, xs) => k -> xs.length.toLong }
    val want = bigrams.groupBy(_._1).map { case (id, xs) =>
      val micro = xs.map { case (_, (w1, bg)) =>
        math.floor((StrictMath.log(bc(bg).toDouble) -
          StrictMath.log(uc(w1).toDouble)) * 1e6 + 0.5).toLong
      }
      id -> (xs.length.toLong, micro.sum)
    }
    val got = TextAnalysis.lmScored(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_logp_micro"))).toMap
    assert(got === want)
    // avg_logp must be ≤ 0 (probabilities): every bc ≤ its uc
    TextAnalysis.lmScored(spark, dir).collect().foreach { r =>
      assert(r.getAs[Double]("avg_logp") <= 0.0, r.toString)
    }
  }

  test("heavy hitters: undercount bound, coverage, determinism, exact degeneration") {
    import graft.operators.TextAnalysis
    val k = 20
    val exact = Tables.documents(spark, dir).collect()
      .flatMap(_.getAs[String]("text").split(" ", -1))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val n = exact.values.sum
    val bound = 2.0 * n / (k + 1)
    val gotRows = TextAnalysis.heavyHitters(spark, dir, k).collect()
    val got = gotRows
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("est")).toMap
    assert(got.nonEmpty && got.size <= k)
    // round 10: every row self-describes the accuracy contract — the
    // err_bound column is exactly 2n/(k+1), constant across rows (n is
    // a corpus statistic, not a partition artifact)
    assert(gotRows.map(_.getAs[Double]("err_bound")).distinct.toSeq ===
      Seq(bound), "err_bound column must equal 2n/(k+1) on every row")
    // MG never overcounts, and undercounts by at most 2n/(k+1)
    got.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
      assert(exact(t) - est <= bound, s"$t undercount ${exact(t) - est} > $bound")
    }
    // every sufficiently frequent term must survive
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(got.contains(t), s"frequent term $t (count ${exact(t)}) missing")
    }
    // deterministic: the relational merge is order-free, partition input
    // order is stable — a second run is identical
    val again = TextAnalysis.heavyHitters(spark, dir, k).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("est")).toMap
    assert(again === got)
    // k ≥ vocabulary: no decrement ever fires and the truncation
    // threshold is 0, so the sketch degenerates to the exact counts
    val big = TextAnalysis.heavyHitters(spark, dir, k = exact.size + 10)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("est")).toMap
    assert(big === exact)
  }

  test("heavyHittersExact (one-pass partials, r19) ≡ the two-pass " +
    "shape heavyHitters(k = vocab): rows, est and err_bound bit-equal") {
    import graft.operators.TextAnalysis
    // the former shape: a separate countDistinct pass to learn vocab,
    // then the MG pass at k = vocab
    val vocab = Tables.documents(spark, dir).collect()
      .flatMap(_.getAs[String]("text").split(" ", -1))
      .distinct.length
    val old = TextAnalysis.heavyHitters(spark, dir, k = vocab).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("est"),
        r.getAs[Double]("err_bound"))).toSet
    val now = TextAnalysis.heavyHittersExact(spark, dir).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("est"),
        r.getAs[Double]("err_bound"))).toSet
    assert(now === old,
      "one-pass exact face diverged from heavyHitters(k = vocab)")
  }

  test("int8 quantization stays in range and round-trips within one step") {
    val rows = CorpusOps.embedQuantize(spark, dir).collect()
    val emb = Tables.embeddings(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("q")
      assert(q >= -127 && q <= 127, r.toString)
      val scale = r.getAs[Double]("scale")
      val x = emb(r.getAs[Long]("vec_id"))(r.getAs[Long]("pos").toInt - 1)
      // dequantized value within half a quantization step of the input
      assert(math.abs(q * scale / 127.0 - x) <= scale / 127.0 * 0.5 + 1e-12,
        r.toString)
    }
  }

  test("hybrid search scores exactly the lexical candidates by exact cosine") {
    val terms = Seq("spark", "merge")
    val lexical = Search.keywordSearch(spark, dir, terms).collect()
      .map(_.getAs[Long]("doc_id")).toSet - 0L
    val hybrid = Search.hybridSearch(spark, dir, terms, k = lexical.size + 5)
      .collect()
    assert(hybrid.map(_.getAs[Long]("doc_id")).toSet === lexical)
    // scores match the brute-force cosine path bit-for-bit
    val brute = Similarity.knnCosine(spark, dir, k = 1000).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    hybrid.foreach { r =>
      brute.get(r.getAs[Long]("doc_id")).foreach(b =>
        assert(b === r.getAs[Double]("cos_sim"), r.toString))
    }
  }

  test("keyword search probes the postings index with a pushed term filter") {
    val p = Search.keywordSearch(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(term"), p)
  }

  test("RRF fusion: scores recompute from the two rank lists, order total, union semantics") {
    val rows = Search.rrfFusion(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length, "dup doc_id")
    def part(r: Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else 1000000000L / (60L + r.getInt(i))
    rows.foreach { r =>
      assert(r.getLong(3) === part(r, 1) + part(r, 2), s"score mismatch: $r")
      assert(!(r.isNullAt(1) && r.isNullAt(2)), "doc in neither list")
    }
    val scores = rows.map(_.getLong(3))
    assert(scores.toSeq === scores.sorted(Ordering[Long].reverse).toSeq)
    // a doc present in BOTH lists outranks one with only a deep single-
    // list rank (the point of fusion); with both generators rooted at
    // query 0 the fused top must include at least one dual-list doc
    assert(rows.exists(r => !r.isNullAt(1) && !r.isNullAt(2)),
      "no dual-list doc in the fused top-k")
  }

  private def phraseRef(phrase: Seq[String]): Map[Long, Long] =
    Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
      .map { case (id, toks) =>
        id -> toks.sliding(phrase.size).count(_.sameElements(phrase)).toLong }
      .filter(_._2 > 0).toMap

  test("phrase search counts exactly the consecutive occurrences; subset of the AND set") {
    val phrase = Seq("spark", "merge")
    val got = Search.phraseSearch(spark, dir, phrase).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occ")).toMap
    assert(got === phraseRef(phrase))
    // the phrase matches are a refinement of the bag-of-words AND set
    val kw = Search.keywordSearch(spark, dir, phrase).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got.keySet.subsetOf(kw), "phrase doc outside its AND set")
    // leg order is result-free (the rarest-first planner may pick any)
    val reversed = Search.phraseSearchFrom(
      spark.read.parquet(Search.ensurePositionalIndex(spark, dir)),
      phrase, phrase.indices.reverse)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occ")).toMap
    assert(reversed === got, "leg permutation changed results")
  }

  test("phrase search: repeated-term phrase counts overlapping occurrences") {
    val phrase = Seq("table", "table")
    val got = Search.phraseSearch(spark, dir, phrase).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occ")).toMap
    assert(got === phraseRef(phrase))
    assert(got.nonEmpty, "fixture should contain at least one 'table table'")
  }

  test("proximity search counts within-slop pairs both orders; slop=∞ ≡ AND-pair product") {
    val (ta, tb, slop) = ("spark", "merge", 5)
    val ref = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
      .map { case (id, toks) =>
        val pa = toks.zipWithIndex.collect { case (t, i) if t == ta => i }
        val pb = toks.zipWithIndex.collect { case (t, i) if t == tb => i }
        id -> pa.flatMap(x => pb.filter(y => math.abs(x - y) <= slop)).length.toLong
      }.filter(_._2 > 0).toMap
    val got = Search.proximitySearch(spark, dir, ta, tb, slop).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_pairs")).toMap
    assert(got === ref)
    // any phrase match is a proximity match (slop ≥ 1 covers adjacency)
    val phrase = Search.phraseSearch(spark, dir, Seq(ta, tb)).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(phrase.subsetOf(got.keySet))
  }

  test("phrase search probes the positional index with pushed per-term filters") {
    val p = Search.phraseSearch(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(term), EqualTo(term,spark)"), p)
    assert(p.contains("EqualTo(term,merge)"), p)
  }

  test("collocations: counts and integer PMI equal a driver recompute; ranking is PMI-monotone") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.collocations(spark, dir, minCount = 3L, k = 20).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir).collect()
      .map(_.getAs[String]("text").split(" ", -1))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = docs.map(_.length.toLong).sum
    val bi = docs.flatMap(t => t.init.zip(t.tail))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val cab = bi((w1, w2))
      assert(r.getAs[Long]("c_ab") === cab)
      assert(r.getAs[Long]("c_a") === uni(w1))
      assert(r.getAs[Long]("c_b") === uni(w2))
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("pmi_micro") ===
        cab * 1000000L / uni(w1) * n / uni(w2))
    }
    // emitted in PMI order (desc), total
    val scores = rows.map(_.getAs[Long]("pmi_micro"))
    assert(scores.toSeq === scores.sorted(Ordering[Long].reverse).toSeq)
  }

  test("domain cap keeps exactly the k best-by-length docs per source (window-equal)") {
    val k = 3
    val got = CorpusOps.domainCap(spark, dir, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = Tables.documents(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars")))
      .groupBy(_._1).toSeq.flatMap { case (s, ds) =>
        ds.sortBy(d => (-d._3, d._2)).take(k).zipWithIndex
          .map { case (d, i) => (s, i + 1L, d._2, d._3) }
      }
    assert(got.toSet === ref.toSet)
    // every source is capped AT k (sf0.001 has >k docs per source)
    got.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.length == k, s"source $s kept ${rs.length} != $k")
    }
  }
}
