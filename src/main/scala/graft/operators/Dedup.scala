package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication at training-pipeline scale: exact, MinHash+LSH,
  * n-gram Jaccard, and SimHash. All signature math is hash-based and
  * deterministic (md5, reproducible in the DuckDB oracle); nothing
  * collects to the driver; every stage is a shuffle-bounded groupBy/join.
  */
object Dedup {

  val ShingleN = 3

  /** Exact-dup groups keyed by the normalized-content fingerprint:
    * one row per distinct content with the surviving (minimum) id and
    * the duplicate count. A single hash aggregate — the 100 TB-safe
    * formulation of dropDuplicates (which keeps an arbitrary row;
    * min-id is deterministic).
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFns.fingerprint(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Corpus-level dedup stats: total vs distinct contents (exact; the
    * sketch-based variant lives in SparkEntry's q_approx_distinct). */
  def dedupStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_total"),
      countDistinct(TextFns.fingerprint(col(textCol))).as("n_distinct"))

  /** MinHash signatures: explode distinct shingles, then ONE hash
    * aggregate computing all k permutation minima (map-side partial
    * aggregation makes this a single shuffle keyed by doc id — the
    * standard scalable formulation; no per-permutation pass).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val exploded = df.select(
      col(idCol),
      explode(array_distinct(TextFns.shingles(col(textCol), ShingleN))).as("sh"))
    val aggs = (0 until k).map(i =>
      min(TextFns.minhashExpr(col("sh"), i)).as(s"mh$i"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band hashes: k minhashes split into `bands` bands of k/bands
    * rows; each band hashed to one value. Output: (id, band, band_hash) —
    * candidate pairs are ids sharing any (band, band_hash) bucket.
    */
  def lshBands(df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k)
    val bandCols = (0 until bands).map { b =>
      val rowCols = (b * r until (b + 1) * r).map(i => col(s"mh$i"))
      struct(lit(b).as("band"),
        md5(concat_ws("|", rowCols: _*)).as("band_hash"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"),
        col("bb.band_hash").as("band_hash"))
  }

  /** LSH candidate pairs: self-join of the band table on the bucket.
    * Distinct (a < b) pairs. Scale: the join key (band, band_hash) is
    * high-cardinality and uniform, so the shuffle is balanced; a skewed
    * bucket (giant dup cluster) is handled by AQE skew-join splitting.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int): DataFrame = {
    val b = lshBands(df, idCol, textCol, k, bands)
    val a = b.select(col("band"), col("band_hash"), col(idCol).as("a_id"))
    val c = b.select(col("band"), col("band_hash"), col(idCol).as("b_id"))
    a.join(c, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle, via an inverted index (shingle → doc) self-join:
    * |A∩B| from the join, |A|,|B| from per-doc shingle counts.
    *
    * Scale: the shingle join explodes on ultra-common shingles —
    * `maxDocFreq` drops shingles appearing in more than that many docs
    * (standard df-cap; disabled when 0). Pairs below `minJaccard` are
    * filtered before output.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, maxDocFreq: Long = 0L): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
        explode(array_distinct(TextFns.shingles(col(textCol), ShingleN))).as("sh"))
      .distinct()
    val capped =
      if (maxDocFreq <= 0) sh
      else {
        val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq)
        sh.join(freq, "sh").select(col("doc"), col("sh"))
      }
    val sizes = capped.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val inter = capped.select(col("doc").as("a_id"), col("sh"))
      .join(capped.select(col("doc").as("b_id"), col("sh")), "sh")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("i"))
    val withSizes = inter
      .join(sizes.select(col("doc").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc").as("b_id"), col("n").as("nb")), "b_id")
    withSizes
      .withColumn("jaccard",
        round(col("i") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("i") / (col("na") + col("nb") - col("i")) >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** 64-bit SimHash over BPE-ish tokens: per token a 64-bit hash votes
    * ±1 on each bit position weighted by the token's in-doc frequency;
    * the signature bit is the vote sign. One explode + one aggregate
    * (64 conditional sums) — single shuffle on the doc id.
    * xxhash64 is Spark-native (no DuckDB equivalent → no SQL oracle;
    * correctness is spec-tested: equal docs ⇒ equal simhash, hamming
    * distance monotone in edit size).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextFns.bpeishTokens(col(textCol))).as("tok"))
    val h = xxhash64(col("tok"))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$i")
    }
    val voted = tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val bits = (0 until 64).map(i =>
      when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
    voted.select(col(idCol),
      bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Hamming distance between two simhash columns (for near-dup pairing
    * on the signature table). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
