package graft

import graft.functions.TextFns
import graft.operators.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = {
    // deterministic variable-length docs: id i repeats a word mix so
    // token counts spread over [3, ~40]
    (1 to n).map { i =>
      val words = Seq.fill(3 + (i * 7) % 38)(s"w${i % 11}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("packSequences: every doc packed exactly once, no pack over budget") {
    val docs = corpus(120)
    val budget = 64L
    val packs = Packing.packSequences(docs, "doc_id", "text", budget, 8)
      .collect()
    assert(packs.map(_.getAs[Long]("n_docs")).sum === 120L)
    val packedIds = packs
      .flatMap(_.getAs[String]("doc_ids").split(",")).map(_.toLong)
    assert(packedIds.length === 120)
    assert(packedIds.toSet === (1L to 120L).toSet)
    packs.foreach { p =>
      assert(p.getAs[Long]("total_tokens") <= budget)
      assert(p.getAs[Double]("fill_ratio") ===
        p.getAs[Long]("total_tokens").toDouble / budget)
    }
  }

  test("packSequences truncates an oversize doc into a full pack of its own") {
    val docs = Seq(
      (1L, Seq.fill(200)("big").mkString(" ")), // 200 tokens > budget 64
      (2L, "small doc here"),
      (3L, "another small doc")
    ).toDF("doc_id", "text")
    val packs = Packing.packSequences(docs, "doc_id", "text", 64L, 2)
      .collect()
    val big = packs.find(_.getAs[String]("doc_ids").split(",").contains("1"))
    assert(big.isDefined)
    assert(big.get.getAs[String]("doc_ids") === "1") // alone in its pack
    assert(big.get.getAs[Long]("total_tokens") === 64L) // truncated to budget
    assert(packs.map(_.getAs[Long]("n_docs")).sum === 3L)
  }

  test("packSequences is deterministic under input repartitioning") {
    val docs = corpus(90)
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(df, "doc_id", "text", 64L, 8)
        .collect().map(_.toSeq).toSet
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("packSequences packs within a group in (hash, id) order, next-fit") {
    // single group -> the walk is one deterministic sequence; replay it
    val docs = corpus(40)
    val budget = 64L
    val ordered = docs
      .select(col("doc_id"),
        TextFns.shingleHash(
          concat(col("doc_id").cast("string"), lit("|pack"))).as("h"),
        least(Packing.tokenCount(col("text")), lit(budget)).as("t"))
      .orderBy(col("h"), col("doc_id"))
      .as[(Long, Long, Long)].collect()
    var fill = 0L; var pack = 0L
    val expected = ordered.map { case (id, _, t) =>
      if (fill == 0L) fill = t
      else if (fill + t > budget) { pack += 1; fill = t }
      else fill += t
      (id, pack)
    }.groupBy(_._2).map { case (p, xs) => p -> xs.map(_._1).mkString(",") }
    val got = Packing.packSequences(docs, "doc_id", "text", budget, 1)
      .collect()
      .map(r => r.getAs[String]("pack_id").split("-")(1).toLong ->
        r.getAs[String]("doc_ids")).toMap
    assert(got === expected)
  }

  private val keyedDocs = (1 to 200).map { i =>
    val words = Seq.fill(5 + (i * 13) % 30)(s"t${i % 7}")
    (i.toLong, s"src${i % 4}", words.mkString(" "))
  }.toDF("doc_id", "source", "text")

  private val someBudgets = Map("src0" -> 120L, "src1" -> 300L, "src2" -> 1L)

  /** Naive single-window reference: one running sum per key. */
  private def naiveTokenBudget(df: org.apache.spark.sql.DataFrame,
      budgets: Map[String, Long]): Set[Long] = {
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (acc, (k, b)) => when(col("source") === k, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__h", TextFns.shingleHash(
        concat(col("doc_id").cast("string"), lit("|budget"))))
      .withColumn("__t", Packing.tokenCount(col("text")))
      .withColumn("__pfx", coalesce(sum(col("__t")).over(w), lit(0L)))
      .filter(budgetCol < 0 || col("__pfx") < budgetCol)
      .select(col("doc_id")).as[Long].collect().toSet
  }

  test("packChunks: every chunk packed once, docs contiguous, budget held") {
    val docs = corpus(60)
    val budget = 48L
    val packs = Packing.packChunks(docs, "doc_id", "text",
      chunkSize = 12, overlap = 4, budget = budget, numGroups = 4).collect()
    // chunk inventory: exactly the chunkWords output, each packed once
    val expected = graft.operators.TextAnalysis
      .chunkWords(docs, "doc_id", "text", 12, 4)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
    val packed = packs.flatMap(_.getAs[String]("chunk_ids").split(","))
      .map { s => val Array(d, c) = s.split(":"); (d.toLong, c.toLong) }
    assert(packed.length === expected.size)
    assert(packed.toSet === expected)
    packs.foreach { p =>
      assert(p.getAs[Long]("total_tokens") <= budget)
      // ADJACENCY: within a pack, a doc's chunks form one contiguous
      // run in ascending chunk order
      val ids = p.getAs[String]("chunk_ids").split(",")
        .map { s => val Array(d, c) = s.split(":"); (d.toLong, c.toLong) }
      val runs = ids.map(_._1).foldLeft(List.empty[Long]) {
        case (acc, d) if acc.headOption.contains(d) => acc
        case (acc, d) => d :: acc
      }
      assert(runs.distinct.size === runs.size,
        s"doc interleaved in pack: ${ids.mkString(",")}")
      ids.groupBy(_._1).values.foreach { cs =>
        assert(cs.map(_._2).toSeq === cs.map(_._2).toSeq.sorted,
          "chunk order broken")
      }
    }
    // determinism under repartitioning
    val again = Packing.packChunks(docs.repartition(7), "doc_id", "text",
      chunkSize = 12, overlap = 4, budget = budget, numGroups = 4)
      .collect().map(_.toSeq).toSet
    assert(again === packs.map(_.toSeq).toSet)
  }

  test("tokenBudgetSampleByKey: bucketed plan equals the naive window") {
    val got = Packing.tokenBudgetSampleByKey(keyedDocs, "source", "doc_id",
        "text", someBudgets, buckets = 16)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === naiveTokenBudget(keyedDocs, someBudgets))
  }

  test("tokenBudgetSampleByKey respects budgets; crossing row completes them") {
    val kept = Packing.tokenBudgetSampleByKey(keyedDocs, "source", "doc_id",
        "text", someBudgets, buckets = 16)
      .withColumn("__t", Packing.tokenCount(col("text")))
      .groupBy(col("source"))
      .agg(sum(col("__t")).as("tok"), max(col("__t")).as("maxt"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tok"), r.getAs[Long]("maxt"), r.getAs[Long]("n")))
      .toMap
    // capped keys: kept tokens stay under budget + one doc (the
    // crossing row is kept), and are at least the budget when the key
    // has enough tokens; src2's budget of 1 keeps exactly one row
    assert(kept("src0")._1 >= 120L && kept("src0")._1 < 120L + kept("src0")._2)
    assert(kept("src1")._1 >= 300L && kept("src1")._1 < 300L + kept("src1")._2)
    assert(kept("src2")._3 === 1L)
    // unlimited key keeps everything
    assert(kept("src3")._3 === 50L)
  }

  test("tokenBudgetSampleByKey: kept set is a prefix of the hash order") {
    val kept = Packing.tokenBudgetSampleByKey(keyedDocs, "source", "doc_id",
        "text", someBudgets, buckets = 16)
      .select(col("doc_id")).as[Long].collect().toSet
    val ordered = keyedDocs
      .withColumn("__h", TextFns.shingleHash(
        concat(col("doc_id").cast("string"), lit("|budget"))))
      .filter(col("source") === "src0")
      .orderBy(col("__h"), col("doc_id"))
      .select(col("doc_id")).as[Long].collect()
    val keptInOrder = ordered.map(kept.contains)
    // once a row is dropped, every later row in the order is dropped too
    assert(!keptInOrder.dropWhile(identity).contains(true))
    assert(keptInOrder.head) // the first row always fits (pfx = 0)
  }

  test("packChunks rejects reserved scratch columns and bad chunk params") {
    val docs = corpus(5)
    Seq("__ws", "__wtc").foreach { c =>
      assertThrows[IllegalArgumentException] {
        Packing.packChunks(docs.withColumn(c, lit(1)), "doc_id", "text",
          chunkSize = 12, overlap = 4, budget = 64L)
      }
    }
    assertThrows[IllegalArgumentException] {
      Packing.packChunks(docs, "doc_id", "text",
        chunkSize = 4, overlap = 4, budget = 64L)
    }
  }

  test("tokenBudgetSampleByKey is stable under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.tokenBudgetSampleByKey(df, "source", "doc_id", "text",
          someBudgets, buckets = 16)
        .select(col("doc_id")).as[Long].collect().toSet
    assert(run(keyedDocs) === run(keyedDocs.repartition(11)))
  }

  test("mixtureSampleByTokens: token-share cut, prefix-monotone, stable") {
    val n = 200
    val df = (0 until n).map(i => (i.toLong, s"k${i % 2}",
      Seq.fill(1 + i % 7)("w").mkString(" "))).toDF("id", "key", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.mixtureSampleByTokens(d, "key", "id", "text",
        Map("k0" -> 1.5, "k1" -> 0.5))
    val out = run(df)
    val epochs = out.select(col("id"), col("epoch"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(_._2).sorted.toSeq }
    // k0 (w = 1.5): every row at least once, epochs dense from 0
    assert((0 until n by 2).forall(i => epochs.contains(i.toLong)))
    assert(epochs.values.forall(e => e === (0L until e.length).toSeq))
    // the fractional admit is a TOKEN-share prefix cut: the admitted
    // token mass sits within one row of f·total (not just in
    // expectation — the prefix cut is exact)
    val toks = df.select(col("id"), col("key"),
        Packing.tokenCount(col("text")).as("t"))
      .as[(Long, String, Long)].collect()
    val tokOf = toks.map(t => t._1 -> t._3).toMap
    def share(key: String, epoch: Long): Double = {
      val keyIds = toks.filter(_._2 == key).map(_._1).toSet
      val admitted = epochs.filter { case (id, es) =>
        keyIds(id) && es.contains(epoch) }.keys.toSeq
      admitted.map(tokOf).sum.toDouble /
        keyIds.toSeq.map(tokOf).sum
    }
    val maxFrac = 7.0 / toks.filter(_._2 == "k1").map(_._3).sum
    assert(math.abs(share("k1", 0L) - 0.5) <= maxFrac + 1e-9,
      s"k1 token share ${share("k1", 0L)}")
    assert(math.abs(share("k0", 1L) - 0.5) <= maxFrac + 1e-9,
      s"k0 extra-epoch token share ${share("k0", 1L)}")
    // prefix-monotone in the |mixtok hash order: once a row misses the
    // fractional epoch, every later row misses it too
    val keptK1 = epochs.keySet.filter(_ % 2 == 1)
    val orderedK1 = df.filter(col("key") === "k1")
      .withColumn("__h", graft.functions.TextFns.shingleHash(
        concat(col("id").cast("string"), lit("|mixtok"))))
      .orderBy(col("__h"), col("id")).select(col("id"))
      .as[Long].collect()
    val flags = orderedK1.map(keptK1.contains)
    assert(!flags.dropWhile(identity).contains(true))
    // deterministic under repartitioning
    assert(run(df.repartition(13)).select(col("id"), col("epoch"))
      .as[(Long, Long)].collect().toSet ===
      out.select(col("id"), col("epoch"))
        .as[(Long, Long)].collect().toSet)
  }

  test("curateAndPack: ONE corpus scan, stages compose exactly") {
    import graft.operators.{Dedup, TextAnalysis}
    val n = 60
    // accumulator-instrumented source: every end-to-end pass over the
    // input adds n — the DAG's checkpoint must hold it to exactly one
    val acc = spark.sparkContext.longAccumulator("curation-scans")
    def mkDocs(df: org.apache.spark.sql.DataFrame) = df.select(
      col("i").as("doc_id"),
      concat(lit("s"), (col("i") % 3).cast("string")).as("source"),
      // duplicate-content pairs (2i, 2i+1) exercise keep-best; the
      // repeated "the the" exercises the line-dedup stage (word delim)
      concat(lit("the the quick brown fox number "),
        (col("i") - col("i") % 2).cast("string"),
        lit(" jumps over the lazy dog")).as("text"))
    val instrumented = mkDocs(
      spark.range(n).map { x => acc.add(1); x }.toDF("i"))
    def run(docs: org.apache.spark.sql.DataFrame) =
      Packing.curateAndPack(docs, "doc_id", "source", "text",
        Map("s0" -> 40L), packBudget = 24L, packGroups = 4, delim = " ",
        minWords = 3, minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
        minStopwords = 1)
    val out = run(instrumented).collect()
    assert(acc.value === n.toLong,
      s"corpus scanned ${acc.value / n.toDouble}x, expected exactly 1x")
    // keep-best kept the minimum id of each duplicate pair: only even
    // ids survive into packs
    val packedIds = out.flatMap(_.getAs[String]("doc_ids").split(","))
      .map(_.toLong)
    assert(packedIds.distinct.length === packedIds.length)
    assert(packedIds.forall(_ % 2 == 0))
    // stage-composition equality: the DAG == the stages run by hand
    val docs = mkDocs(spark.range(n).toDF("i"))
    val enriched = TextAnalysis.withDedupedText(
        TextAnalysis.withKeepQuality(docs, "text", minWords = 3,
            minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
            minStopwords = 1)
          .filter(col("keep")),
        "text", "__clean", " ")
      .select(col("doc_id"), col("source"), col("quality"),
        col("__clean").as("text"))
    val kept = Dedup.keepBest(enriched,
      enriched.select(col("doc_id"), col("quality")), "doc_id", "text")
    val manual = Packing.packSequences(
      Packing.tokenBudgetSampleByKey(
        enriched.join(kept.select(col("keep_id").as("doc_id")), "doc_id"),
        "source", "doc_id", "text", Map("s0" -> 40L)),
      "doc_id", "text", 24L, 4)
    def rows(a: Array[org.apache.spark.sql.Row]) = a.map(r =>
      (r.getAs[String]("pack_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[String]("doc_ids"))).toSet
    assert(rows(out) === rows(manual.collect()))
  }

  test("chunkTokenStream: contiguous slicing splits docs across " +
      "boundaries; exactly one partial tail") {
    // 3 docs, 10 ids total, seqLen 4 → chunks of 4/4/2
    val encoded = Seq(
      (1L, Seq(10L, 11L, 12L)),
      (2L, Seq(20L, 21L, 22L, 23L)),
      (3L, Seq(30L, 31L, 32L))).toDF("doc_id", "token_ids")
    val out = Packing.chunkTokenStream(encoded, "doc_id", seqLen = 4)
      .select("chunk_id", "n_ids", "complete", "input_ids")
      .as[(Long, Long, Boolean, Seq[Long])].collect().sortBy(_._1)
    assert(out.map(_._2).sum === 10L)
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L))
    // every chunk but the tail is exactly full
    assert(out.init.forall(c => c._2 === 4L && c._3))
    assert(out.last._2 === 2L && !out.last._3)
    // the concatenation of chunks IS the stream: rebuild it and check
    // it's the docs' id lists concatenated in the deterministic hash
    // order (each doc's ids stay contiguous and in order)
    val stream = out.flatMap(_._4).toSeq
    val perDoc = Map(1L -> Seq(10L, 11L, 12L),
      2L -> Seq(20L, 21L, 22L, 23L), 3L -> Seq(30L, 31L, 32L))
    val orders = Seq(1L, 2L, 3L).permutations
      .map(p => p.flatMap(perDoc)).toSet
    assert(orders.contains(stream), s"stream $stream is not a " +
      "contiguous concatenation of the docs")
    // determinism: re-running yields the identical stream
    val again = Packing.chunkTokenStream(encoded, "doc_id", seqLen = 4)
      .select("chunk_id", "input_ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1).flatMap(_._2).toSeq
    assert(again === stream)
    // null-encoded docs contribute nothing (the witness lives in
    // bpeEncodeIds; the chunker just skips them)
    val withNull = encoded.unionByName(
      Seq((4L, null.asInstanceOf[Seq[Long]])).toDF("doc_id", "token_ids"))
    assert(Packing.chunkTokenStream(withNull, "doc_id", 4)
      .agg(sum(col("n_ids"))).as[Long].head() === 10L)
  }

  test("materializePackedIds flattens member id arrays in pack order") {
    val packs = Seq(
      ("0-0", 2L, "7,3"),
      ("0-1", 1L, "9")).toDF("pack_id", "n_docs", "doc_ids")
    val encoded = Seq(
      (3L, Seq(30L, 31L)),
      (7L, Seq(70L)),
      (9L, Seq(90L, 91L, 92L))).toDF("doc_id", "token_ids")
    val out = Packing.materializePackedIds(packs, encoded, "doc_id")
      .select("pack_id", "n_docs", "n_missing", "n_ids", "input_ids")
      .as[(String, Long, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // pack order "7,3" — NOT id order: doc 7's ids come first
    assert(out("0-0") === ((2L, 0L, 3L, Seq(70L, 30L, 31L))))
    assert(out("0-1") === ((1L, 0L, 3L, Seq(90L, 91L, 92L))))
    // sig = md5 of the space-joined flattened ids (the cross-engine
    // contract: equals concatenating per-doc id strings in pack order)
    val sig = Packing.materializePackedIds(packs, encoded, "doc_id")
      .filter(col("pack_id") === "0-0")
      .select("ids_sig").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("70 30 31".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(sig === want)
    // a member missing from the encoded frame is WITNESSED, never a
    // silent shrink or a pack-wide null: doc 3 absent → its ids drop
    // out, n_docs still counts the manifest, n_missing flags it
    val partial = Packing.materializePackedIds(packs,
        encoded.filter(col("doc_id") =!= 3L), "doc_id")
      .filter(col("pack_id") === "0-0")
      .select("n_docs", "n_missing", "n_ids", "input_ids")
      .as[(Long, Long, Long, Seq[Long])].head()
    assert(partial === ((2L, 1L, 1L, Seq(70L))))
  }

  test("temperatureWeights: hand-computed share^alpha algebra; " +
      "sampled token mass follows q") {
    // sources a/b/c with 64/16/4 tokens (docs of 4 words each)
    def mk(src: String, docs: Int, off: Int) = (0 until docs).map(i =>
      ((off + i).toLong, src, "w x y z"))
    val df = (mk("a", 16, 0) ++ mk("b", 4, 100) ++ mk("c", 1, 200))
      .toDF("id", "source", "text")
    val w = Packing.temperatureWeights(df, "source", "text", 0.5)
    // hand math: T = 84, p = (64, 16, 4)/84; z = Σ√p;
    // w_k = 1/(√p_k · z)
    val p = Map("a" -> 64.0 / 84, "b" -> 16.0 / 84, "c" -> 4.0 / 84)
    val z = p.values.map(math.sqrt).sum
    p.foreach { case (k, pk) =>
      assert(math.abs(w(k) - 1.0 / (math.sqrt(pk) * z)) <= 5e-7,
        s"weight $k") }
    // flattening direction: the big source down-samples, the small
    // ones up-sample, ordering inverted vs natural shares
    assert(w("a") < 1.0 && w("c") > w("b") && w("b") > 1.0)
    // α = 1 is the natural mixture: every row exactly once, epoch 0
    val nat = Packing.temperatureMixtureByTokens(df, "source", "id",
      "text", 1.0).select(col("id"), col("epoch"))
      .as[(Long, Long)].collect()
    assert(nat.length === 21 && nat.forall(_._2 === 0L))
    // sampled token mass per source ≈ w_k · tokens_k, within one
    // doc's tokens (the fractional-admit granularity)
    val out = Packing.temperatureMixtureByTokens(df, "source", "id",
      "text", 0.5)
    val massBySrc = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap.view.mapValues(_ * 4.0)
    Map("a" -> 64.0, "b" -> 16.0, "c" -> 4.0).foreach { case (k, tk) =>
      assert(math.abs(massBySrc(k) - w(k) * tk) <= 4.0,
        s"$k: sampled ${massBySrc(k)} vs target ${w(k) * tk}") }
  }

  test("curateAndPack with NB stage: still ONE corpus scan; gate == " +
      "standalone scorer's keep set") {
    import graft.operators.TextAnalysis
    val n = 60
    val acc = spark.sparkContext.longAccumulator("curation-nb-scans")
    def mkDocs(df: org.apache.spark.sql.DataFrame) = df.select(
      col("i").as("doc_id"),
      concat(lit("s"), (col("i") % 3).cast("string")).as("source"),
      // two token distributions so the NB model (fit on a SEPARATE
      // hand-labeled frame) genuinely separates: "spam"-flavored odd
      // ids vs "ham"-flavored even ids
      when(col("i") % 2 === 0,
        concat(lit("the quick brown fox number "), col("i").cast("string"),
          lit(" jumps over the lazy dog")))
        .when(lit(true),
          concat(lit("the buy cheap pills now offer "), col("i").cast("string"),
            lit(" click the winning prize")))
        .as("text"))
    // frozen model from a separate labeled corpus — the production
    // shape (fitting is NOT part of the DAG)
    val labeled = Seq(
      ("the quick brown fox jumps over the lazy dog", true),
      ("the quick fox and the lazy dog rest", true),
      ("the buy cheap pills now offer click the winning prize", false),
      ("the cheap offer click prize now", false))
      .toDF("text", "lab")
    val model = TextAnalysis.nbQualityModel(labeled, "text", "lab")
    val instrumented = mkDocs(
      spark.range(n).map { x => acc.add(1); x }.toDF("i"))
    val out = Packing.curateAndPack(instrumented, "doc_id", "source",
      "text", Map.empty, packBudget = 24L, packGroups = 4, delim = " ",
      minWords = 3, minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
      minStopwords = 1, nbModel = Some(model)).collect()
    assert(acc.value === n.toLong,
      s"corpus scanned ${acc.value / n.toDouble}x, expected exactly 1x")
    val packedIds = out.flatMap(_.getAs[String]("doc_ids").split(","))
      .map(_.toLong).toSet
    // the NB gate kept exactly the ham-flavored docs: every packed id
    // is even, and the even/odd split is what the standalone scorer
    // predicts on the same texts
    assert(packedIds.nonEmpty && packedIds.forall(_ % 2 == 0))
    val docs = mkDocs(spark.range(n).toDF("i"))
    val scored = TextAnalysis.scoreAgainstNbModel(docs, model,
        "doc_id", "text")
      .select(col("doc_id"), col("predicted_keep"))
      .as[(Long, Boolean)].collect().toMap
    (0L until n.toLong).foreach(i =>
      assert(scored(i) === (i % 2 == 0), s"scorer flipped on doc $i"))
    assert(packedIds === scored.filter(_._2).keySet,
      "NB-gated pack membership != standalone scorer keep set")
  }

  test("mixtureSample: exact integer epochs, rate-accurate remainder") {
    val n = 400
    val df = (0 until n).map(i =>
        (i.toLong, s"k${i % 4}", s"doc $i")).toDF("id", "key", "text")
    val out = Packing.mixtureSample(df, "key", "id",
      Map("k0" -> 2.0, "k1" -> 0.0, "k2" -> 0.4, "k3" -> 2.5))
    val epochs = out.select(col("id"), col("epoch"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(_._2).sorted.toSeq }
    // integer weight 2.0: EVERY k0 row appears exactly twice, epochs
    // dense 0..1; weight 0 drops k1 entirely
    (0 until n by 4).foreach(i => assert(epochs(i.toLong) === Seq(0L, 1L)))
    assert(epochs.keySet.forall(_ % 4 != 1))
    // fractional 0.4: kept k2 rows carry exactly epoch 0; the realized
    // rate concentrates around 0.4 (hash-binomial on 100 ids)
    val k2 = epochs.filter(_._1 % 4 == 2)
    assert(k2.values.forall(_ === Seq(0L)))
    assert(k2.size > 25 && k2.size < 55, s"k2 kept ${k2.size}/100")
    // up-sampling 2.5: every k3 row at least twice, ~half three times,
    // and every epoch set dense from 0
    val k3 = epochs.filter(_._1 % 4 == 3)
    assert(k3.values.forall(e => e === (0L until e.length).toSeq))
    assert(k3.values.forall(e => e.length == 2 || e.length == 3))
    val thrice = k3.values.count(_.length == 3)
    assert(thrice > 25 && thrice < 75, s"k3 third-epoch $thrice/100")
    // deterministic under repartitioning (the replay-stability contract)
    val again = Packing.mixtureSample(df.repartition(7), "key", "id",
        Map("k0" -> 2.0, "k1" -> 0.0, "k2" -> 0.4, "k3" -> 2.5))
      .select(col("id"), col("epoch")).as[(Long, Long)].collect().toSet
    assert(again === out.select(col("id"), col("epoch"))
      .as[(Long, Long)].collect().toSet)
    // reserved output column guard
    assertThrows[IllegalArgumentException] {
      Packing.mixtureSample(df.withColumn("epoch", lit(1)), "key", "id",
        Map("k0" -> 1.0))
    }
  }

  test("prioritySample: DLT invariants — size, threshold, estimator") {
    val df = (1 to 200).map(i => (i.toLong, (i % 17 + 1).toLong))
      .toDF("id", "w")
    val out = Packing.prioritySample(df, "id", "w", 40).collect()
    assert(out.length === 40)
    val tau = out.head.getAs[Double]("tau")
    assert(out.forall(_.getAs[Double]("tau") === tau)) // constant column
    assert(tau > 0.0)
    out.foreach { r =>
      val w = r.getAs[Double]("weight")
      val p = r.getAs[Double]("priority")
      assert(p >= w) // u ≤ 1 ⇒ priority ≥ weight
      assert(p >= tau) // sampled = the k largest priorities
      assert(r.getAs[Double]("w_hat") === math.max(w, tau))
    }
    // DLT inclusion law: any row with w > τ has priority w/u ≥ w > τ,
    // so it MUST be in the sample — no high-weight row can be missed
    val sampled = out.map(_.getAs[Long]("id")).toSet
    val heavy = df.filter(col("w").cast("double") > tau)
      .select(col("id")).as[Long].collect()
    assert(heavy.forall(sampled.contains))
    // deterministic under repartitioning
    val again = Packing.prioritySample(df.repartition(7), "id", "w", 40)
      .select(col("id")).as[Long].collect().toSet
    assert(again === sampled)
  }

  test("prioritySample degenerate cases: n <= k, zero weights") {
    val tiny = (1 to 5).map(i => (i.toLong, 10L)).toDF("id", "w")
    val all = Packing.prioritySample(tiny, "id", "w", 50).collect()
    assert(all.length === 5)
    // n <= k: τ = 0 and ŵ = w exactly (the whole-input sample
    // reconstructs every subset-sum with zero variance)
    all.foreach { r =>
      assert(r.getAs[Double]("tau") === 0.0)
      assert(r.getAs[Double]("w_hat") === r.getAs[Double]("weight"))
    }
    // zero-weight rows carry priority 0 — never sampled while any
    // positive-weight row remains
    val mixed = ((1 to 60).map(i => (i.toLong, 0L)) ++
      (61 to 70).map(i => (i.toLong, 5L))).toDF("id", "w")
    val picked = Packing.prioritySample(mixed, "id", "w", 10)
      .select(col("id")).as[Long].collect().toSet
    assert(picked === (61L to 70L).toSet)
    // NULL and negative weights are outside the DLT contract: they are
    // excluded up front, never padding an undersized sample with
    // w_hat <= 0 or NULL-priority rows
    val dirty = (Seq((1L, Option(5L)), (2L, Option(3L)),
      (3L, None), (4L, Option(-7L))) ++
      (5L to 8L).map(i => (i, Option(-1L)))).toDF("id", "w")
    val kept = Packing.prioritySample(dirty, "id", "w", 10).collect()
    assert(kept.map(_.getAs[Long]("id")).toSet === Set(1L, 2L),
      "only nonnegative-weight rows are eligible")
    kept.foreach { r =>
      assert(r.getAs[Double]("w_hat") >= 0.0)
      assert(r.getAs[Double]("tau") === 0.0) // 2 survivors <= k
    }
    val keptG = Packing.prioritySampleByGroup(
      dirty.withColumn("g", lit("s")), "g", "id", "w", 10)
      .select(col("id")).as[Long].collect().toSet
    assert(keptG === Set(1L, 2L))
    // reserved output column guard
    assertThrows[IllegalArgumentException] {
      Packing.prioritySample(tiny.withColumnRenamed("id", "tau"),
        "tau", "w", 5)
    }
    assertThrows[IllegalArgumentException] {
      Packing.prioritySampleByGroup(
        tiny.withColumn("priority", lit("g")), "priority", "id", "w", 5)
    }
  }

  test("prioritySampleByGroup: k per group, per-group tau, same hash") {
    val df = (1 to 120).map(i =>
      (s"g${i % 3}", i.toLong, (i % 11 + 1).toLong))
      .toDF("grp", "id", "w")
    val out = Packing.prioritySampleByGroup(df, "grp", "id", "w", 7)
      .collect()
    assert(out.length === 21)
    val byGroup = out.groupBy(_.getAs[String]("grp"))
    assert(byGroup.keySet === Set("g0", "g1", "g2"))
    byGroup.foreach { case (_, rows) =>
      assert(rows.length === 7)
      val tau = rows.head.getAs[Double]("tau")
      assert(rows.forall(_.getAs[Double]("tau") === tau))
      rows.foreach(r => assert(r.getAs[Double]("priority") >= tau))
    }
    // the grouped sampler uses the SAME salt/hash as the global one:
    // a row's priority is identical in both flavors
    val global = Packing.prioritySample(df, "id", "w", 120)
      .select(col("id"), col("priority")).as[(Long, Double)]
      .collect().toMap
    out.foreach { r =>
      assert(r.getAs[Double]("priority") ===
        global(r.getAs[Long]("id")))
    }
  }
}
