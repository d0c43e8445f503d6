package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully distributed synthetic transcript generator.
  *
  * Produces the BASELINE.json input-hint table
  * `(conv_id, turn_idx, role, text, tool, ts)` plus a labeled-pairs table,
  * with planted near-duplicate conversations (the graft analog of the
  * reference's qrels, /root/reference/qrels/ERD_elq.qrels).
  *
  * Every value derives from `xxhash64(seed, tag, ids...)` — no driver-side
  * RNG, no ordering dependence, so output is identical at any parallelism
  * or partition count (the property the golden tests and the two-level
  * scaling bench rely on).
  *
  * Construction:
  *  - `nBase` base conversations; base `i` additionally gets `dupsPerBase`
  *    noisy duplicates. conv_id = "c%09d_%d" (base, dupIdx); dupIdx 0 is
  *    the base itself.
  *  - ~30% of tokens are drawn from a small shared stopword list (these
  *    create the hot blocking keys that exercise the skew caps); the rest
  *    are base-private tokens "w<k>t<base>", so distinct bases share only
  *    stopwords (token-Jaccard across bases ≲ 0.25) while duplicates share
  *    ≥ ~90% of tokens.
  *  - duplicate noise: token substitution at `noisePct`%, occasional
  *    casing/punctuation jitter, and an inserted extra turn for ~25% of
  *    duplicates (the FIXTURES.md paraphrase/noise transforms).
  */
object TranscriptGen {

  val Stopwords: Seq[String] = Seq(
    "the", "and", "you", "for", "that", "with", "this", "can", "how", "what",
    "please", "thanks", "okay", "now", "run", "then", "just", "need", "help",
    "from", "into", "about", "when", "why", "yes")

  def defaultSeed: Long = 42L

  private def h(seed: Long, tag: String, cols: org.apache.spark.sql.Column*) =
    xxhash64((lit(seed) +: lit(tag) +: cols): _*)

  /** The transcripts table. Rows: one per (conv_id, turn_idx). */
  def transcripts(spark: SparkSession, nBase: Long, dupsPerBase: Int = 1,
                  noisePct: Int = 8, seed: Long = defaultSeed): DataFrame = {
    val fanout = dupsPerBase + 1
    val convs = spark.range(nBase * fanout)
      .select(
        (col("id") / fanout).cast("long").as("base"),
        pmod(col("id"), lit(fanout)).cast("int").as("dup"))

    val base = col("base"); val dup = col("dup")
    // turns per conversation: 3..6 for the base; ~25% of dups get one extra
    val baseTurns = (lit(3) + pmod(h(seed, "nt", base), lit(4))).cast("int")
    val extraTurn = (dup > 0 && pmod(h(seed, "ins", base, dup), lit(4)) === 0).cast("int")
    val nTurns = (baseTurns + extraTurn).as("n_turns")

    val turns = convs
      .select(base, dup, explode(sequence(lit(0), nTurns - 1)).as("turn_idx"))

    val t = col("turn_idx")
    val nTok = (lit(6) + pmod(h(seed, "ntok", base, t), lit(9))).cast("int")

    val text = array_join(
      transform(sequence(lit(0), nTok - 1), p => tokenAt(seed, base, dup, t, p, noisePct)),
      " ").as("text")

    val role = element_at(
      array(lit("user"), lit("assistant"), lit("tool")),
      (pmod(h(seed, "role", base, t), lit(3)) + 1).cast("int")).as("role")

    val tool = when(pmod(h(seed, "role", base, t), lit(3)) === 2,
      concat(lit("tool_"), pmod(h(seed, "tool", base, t), lit(5)))).otherwise(lit("")).as("tool")

    val ts = timestamp_seconds(lit(1700000000L) + base * 3600 + dup * 600 + t * 30).as("ts")

    turns.select(
      format_string("c%09d_%d", base, dup).as("conv_id"),
      t.cast("int").as("turn_idx"), role, text, tool, ts)
  }

  /** One token. Base-private vocabulary "w<k>t<base>" mixed with shared
    * stopwords; duplicates perturb tokens at noisePct% plus casing /
    * punctuation jitter.
    */
  private def tokenAt(seed: Long, base: org.apache.spark.sql.Column,
                      dup: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column,
                      p: org.apache.spark.sql.Column, noisePct: Int) = {
    val stopIdx = (pmod(h(seed, "sw", base, t, p), lit(Stopwords.size)) + 1).cast("int")
    val stopArr = array(Stopwords.map(lit): _*)
    val privTok = concat(lit("w"), pmod(h(seed, "tok", base, t, p), lit(50)), lit("t"), base)
    val clean = when(pmod(h(seed, "mix", base, t, p), lit(10)) < 3,
      element_at(stopArr, stopIdx)).otherwise(privTok)

    val noisy = dup > 0 && pmod(h(seed, "noise", base, dup, t, p), lit(100)) < noisePct
    val substituted = when(noisy,
      concat(lit("w"), pmod(h(seed, "alt", base, dup, t, p), lit(50)), lit("t"), base))
      .otherwise(clean)

    val cased = when(dup > 0 && pmod(h(seed, "case", base, dup, t, p), lit(7)) === 0,
      initcap(substituted)).otherwise(substituted)
    when(dup > 0 && pmod(h(seed, "punct", base, dup, t, p), lit(11)) === 0,
      concat(cased, lit(","))).otherwise(cased)
  }

  /** Labeled pairs (conv_a < conv_b, label 1|0, block_key).
    * Positives: all pairs within a base's duplicate group, keyed by the
    * base's private-token tag. Negatives: ring pairs (i, i+1) of distinct
    * bases — disjoint private vocabularies by construction, so a correct
    * pipeline never links them.
    */
  def labels(spark: SparkSession, nBase: Long, dupsPerBase: Int = 1,
             seed: Long = defaultSeed): DataFrame = {
    val fanout = dupsPerBase + 1
    val neg = spark.range(math.max(0L, nBase - 1)).select(col("id").as("base"))
      .select(
        format_string("c%09d_0", col("base")).as("conv_a"),
        format_string("c%09d_0", col("base") + 1).as("conv_b"),
        lit(0).as("label"), lit("").as("block_key"))

    // dupsPerBase = 0 → no positive pairs exist (empty struct-array literal
    // would have VOID element type, so guard instead of exploding it)
    val pos =
      if (dupsPerBase == 0) neg.limit(0)
      else spark.range(nBase).select(col("id").as("base"))
        .select(col("base"), explode(tupleIdx(fanout)).as("dd"))
        .select(
          format_string("c%09d_%d", col("base"), col("dd.a")).as("conv_a"),
          format_string("c%09d_%d", col("base"), col("dd.b")).as("conv_b"),
          lit(1).as("label"),
          concat(lit("t"), col("base")).as("block_key"))

    pos.unionByName(neg)
  }

  /** All (a, b) index pairs with a < b within a duplicate group of size n. */
  private def tupleIdx(n: Int) = {
    val pairs = for { a <- 0 until n; b <- (a + 1) until n } yield (a, b)
    array(pairs.map { case (a, b) => struct(lit(a).as("a"), lit(b).as("b")) }: _*)
  }
}
