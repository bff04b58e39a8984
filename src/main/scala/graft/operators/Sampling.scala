package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. Membership is a pure
 * function of the row id (hash-threshold), NOT an RNG draw:
 *  - re-running a resumed pipeline yields the SAME sample (idempotent
 *    retries, reproducible experiments);
 *  - growing the table never reshuffles previous membership (each row's
 *    fate is independent of the others);
 *  - the md5 basis makes the sample itself oracle-checkable cross-engine
 *    (the driver gate recomputes membership in DuckDB).
 * All pure column expressions — the filter pushes to the scan.
 */
object Sampling {

  private val Buckets = 10000L

  /** Hash bucket in [0, 10000) from the row id (+ salt): the first 15 hex
    * digits of md5 parsed as an integer (exact in both engines), mod 1e4. */
  def hashBucket(id: Column, salt: String = "",
                 buckets: Long = Buckets): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long"), lit(buckets))

  /** Keep each row iff its hash bucket < rate * 10000 (rate resolution
    * 1e-4). `salt` decorrelates independent samples of the same table. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.where(hashBucket(col(idCol), salt) < math.round(rate * Buckets))
  }

  /** Deterministic WEIGHTED sampling: a row is kept iff
    * hashBucket(id, salt) * den < weight * num * 10000 — i.e. with
    * probability min(1, weight * num / den) at the 1e-4 bucket
    * resolution, as a pure hash function of the id (idempotent retries,
    * growth-insensitive, oracle-checkable: the [[hashSample]] contract
    * with a PER-ROW rate). Length-proportional document sampling,
    * importance sampling by a score, etc. One scan, no shuffle.
    * Weights must be a non-negative INTEGRAL column (enforced — a
    * fractional score silently truncated would bias every rate; scale
    * scores to integers first, e.g. round(score * 1000) with den scaled
    * by 1000); weight * num * 10000 must fit a long (the driver factor
    * is multiplyExact, the row side is ANSI — both throw loudly). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     num: Long, den: Long, salt: String = ""): DataFrame = {
    require(num >= 0 && den > 0, "need num >= 0 and den > 0")
    val wType = df.select(weight).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(wType.typeName),
      s"weight must be an integral column, got $wType — scale fractional " +
        "scores to integers (and den) first; a silent truncation would " +
        "bias every rate")
    df.where(hashBucket(col(idCol), salt) * lit(den) <
      weight.cast("long") * lit(Math.multiplyExact(num, Buckets)))
  }

  /** FAST-path twin of [[hashSample]]: xxhash64 membership (codegen, no
    * string md5 per row) — same determinism/growth-insensitivity contract,
    * not oracle-checkable cross-engine (DuckDB lacks xxhash64; the md5
    * variant is the gated one, same duality as minhash/simhash). */
  def hashSampleFast(df: DataFrame, idCol: String, rate: Double,
                     seed: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.where(pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets)) <
      math.round(rate * Buckets))
  }

  /** Deterministic fractional UPSAMPLING — the over-1x half of data
    * mixing: `weightBp` is the per-row multiplicity in bucket units
    * (10000 = 1.0x). Each row yields floor(weightBp/10000) copies plus
    * one more iff its hash bucket < weightBp mod 10000, so a stratum's
    * expected multiplicity is exactly weightBp/10000 while every row's
    * fate stays a pure hash function (idempotent retries, oracle-checkable
    * membership — the same contract as [[hashSample]]). Weight 0 drops
    * the row. Emits a 1-based `copy_n` so copies stay distinguishable
    * downstream. One scan, no shuffle; the explode is bounded by the
    * weight. */
  def upsample(df: DataFrame, idCol: String, weightBp: Column,
               salt: String = ""): DataFrame = {
    require(!df.columns.contains("copy_n"),
      "input must not already contain copy_n (the emitted copy index)")
    require(!df.columns.contains("_copies"),
      "input must not already contain _copies (internal scratch)")
    val base = ((weightBp - pmod(weightBp, lit(Buckets))) / lit(Buckets)).cast("long")
    val extra = when(hashBucket(col(idCol), salt) < pmod(weightBp, lit(Buckets)), 1L)
      .otherwise(0L)
    df.withColumn("_copies", base + extra)
      .where(col("_copies") > 0)
      .withColumn("copy_n", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }

  /** Leakage-safe train/test split: near-duplicate CLUSTERS never straddle
    * the boundary. `pairs` is an undirected near-dup edge list
    * `(a_id, b_id)` from any of the gated recipes (minhash/simhash/
    * embedding); every doc resolves to its connected-component
    * representative `rep` (component minimum; docs untouched by any edge
    * are their own rep) and split membership is the hash-bucket test of the
    * REP, not the doc — so a training example can never have a
    * near-duplicate in the held-out set, the contamination mode a per-doc
    * split cannot prevent. Emits the input columns + `rep` + `split`
    * ('train' | 'test').
    * Scale shape: components run over the EDGE list only (never the
    * corpus); the label frame holds only edge-touched ids, so the docs-side
    * left join broadcasts under AQE when dup density is low, and membership
    * itself stays a pure column expression. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       testRate: Double, salt: String = ""): DataFrame = {
    require(testRate >= 0.0 && testRate <= 1.0)
    require(!docs.columns.exists(Seq("rep", "split", "_cc_label").contains),
      "input must not already contain rep/split (emitted) or _cc_label (scratch)")
    val labels = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("label").as("_cc_label"))
    docs.join(labels, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("_cc_label"), col(idCol)))
      .withColumn("split",
        when(hashBucket(col("rep"), salt) < math.round(testRate * Buckets),
          lit("test")).otherwise(lit("train")))
      .drop("_cc_label")
  }

  /** Deterministic BUDGET-capped mixing: per stratum, keep docs in hash
    * order until the stratum's cost budget is spent (the "N tokens of web,
    * M of books" recipe — mixing by absolute volume, where
    * [[stratifiedSample]] mixes by rate). Selection is the maximal
    * hash-ordered prefix whose running cost stays <= the budget: order docs
    * by (hash bucket, md5 string, id) within the stratum and keep a doc iff
    * its running cumulative `costCol` <= budget. Pure function of ids —
    * idempotent retries, growth only APPENDS to the order's tail, and the
    * selection is recomputable cross-engine (the gate's oracle replays it).
    * Strata absent from `budgets` are dropped (explicit budgets only).
    * Rows with a NULL id are dropped (no deterministic identity to hash —
    * the contract of every sampler here); a NULL cost counts as 0 (the
    * oracle's SUM skips NULLs). Costs must be non-negative — the bucket
    * classification rests on a monotone cumulative, so a negative cost
    * found in the histogram fails the job rather than silently selecting
    * the wrong prefix.
    *
    * Scale shape (the corpusStats lesson): the running sum is NEVER
    * computed over the raw corpus — pass 1 aggregates cost into the
    * (stratum, bucket) histogram (<= 10k rows per stratum) and the only
    * full-width window; pass 2 classifies each bucket entirely-in /
    * entirely-out off that broadcast frame, and only the ONE boundary
    * bucket per stratum (~1/10000 of the corpus) pays a per-doc window. */
  def tokenBudgetMix(docs: DataFrame, idCol: String, costCol: Column,
                     stratum: Column, budgets: Map[String, Long],
                     salt: String = ""): DataFrame = {
    require(budgets.values.forall(_ >= 0L), "budgets must be non-negative")
    val scratch = Seq("_st", "_bkt", "_tk", "_bud", "_cb", "_t", "_mt", "_bcum")
    require(!docs.columns.exists(scratch.contains),
      s"input must not contain internal scratch columns ${scratch.mkString(",")}")
    // budgets as a broadcast lookup frame, NOT a nested when-fold — a
    // caller-sized fold is the codegen subexpression-elimination hazard
    // this repo has already reproduced (see ImageTable.compact notes);
    // the inner join drops unbudgeted strata for free
    val sp = docs.sparkSession
    import sp.implicits._
    val budgetDf = budgets.toSeq.toDF("_st", "_bud")
    val tagged = docs
      .where(col(idCol).isNotNull)            // no id -> no hash identity
      .withColumn("_st", stratum)
      .withColumn("_bkt", hashBucket(col(idCol), salt))
      .withColumn("_tk", coalesce(costCol.cast("long"), lit(0L)))
      .join(broadcast(budgetDf), Seq("_st")) // strata without budgets drop
    // pass 1: the cost histogram — the only frame a stratum-wide window
    // ever sorts (<= 10k buckets per stratum). min(_tk) rides along so a
    // negative cost fails the (tiny) classification frame loudly instead
    // of silently breaking the monotone-cumulative invariant
    val hist = tagged.groupBy("_st", "_bkt")
      .agg(sum("_tk").as("_t"), min("_tk").as("_mt"))
    val cumBefore = coalesce(sum("_t").over(Window.partitionBy("_st")
      .orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val decided = hist
      .withColumn("_t", when(col("_mt") < 0, raise_error(concat(
          lit("tokenBudgetMix: negative cost in stratum "), col("_st")))
        .cast("long")).otherwise(col("_t")))
      .withColumn("_cb", cumBefore).select("_st", "_bkt", "_cb", "_t")
    val joined = tagged.join(broadcast(decided), Seq("_st", "_bkt"))
    // entirely-in buckets: the whole bucket fits under the budget
    val fullIn = joined.where(col("_cb") + col("_t") <= col("_bud"))
    // the boundary bucket (exactly one per stratum under non-negative
    // costs, but partitioned on (_st, _bkt) anyway — each bucket's running
    // sum only ever extends its OWN base): per-doc window over
    // ~corpus/10000 rows, ordered by (md5, id) to extend the same global
    // hash order the buckets coarsely follow
    val boundary = joined
      .where(col("_cb") <= col("_bud") && col("_cb") + col("_t") > col("_bud"))
      .withColumn("_bcum", sum("_tk").over(Window.partitionBy("_st", "_bkt")
        .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("_cb") + col("_bcum") <= col("_bud"))
      .drop("_bcum")
    fullIn.unionByName(boundary).drop(scratch.filterNot(_ == "_bcum"): _*)
  }

  /** Deterministic global SHUFFLE + fixed-size SHARD assignment — the
    * "write the corpus as N-doc training shards in a reproducible random
    * order" step. Every row gets its exact 1-based rank `rnk` in the
    * md5-shuffled total order (bucket, md5 string, id) and the shard
    * `shard = (rnk - 1) / shardSize`, as pure functions of the id set:
    * re-runs reproduce the same order, and the oracle can replay it as a
    * naive global row_number. Rows with a NULL id are dropped (no
    * deterministic identity to hash — the contract of every sampler here);
    * they are excluded BEFORE the bucket census, so they can neither shift
    * ranks nor vanish after being counted.
    *
    * Scale shape: the global sort is never materialized as one window —
    * pass 1 counts rows per hash bucket (a 10k-row frame; its cumulative
    * window is the only full-width sort and touches 10k rows), pass 2
    * broadcasts each bucket's base rank and numbers rows WITHIN their
    * bucket only — a window partitioned by 10k buckets, each holding
    * ~1/10000 of the corpus, so parallelism scales with the data instead
    * of collapsing into one reducer. */
  def shardAssign(docs: DataFrame, idCol: String, shardSize: Long,
                  salt: String = ""): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val scratch = Seq("_bkt", "_base", "_m", "_wrn")
    require(!docs.columns.exists(c => scratch.contains(c) ||
        c == "rnk" || c == "shard"),
      "input must not contain rnk/shard or internal scratch columns")
    val tagged = docs.where(col(idCol).isNotNull)
      .withColumn("_bkt", hashBucket(col(idCol), salt))
    val (joined, w) = bucketCumsum(tagged, idCol, salt, count(lit(1)))
    joined
      .withColumn("_wrn", row_number().over(w))
      .withColumn("rnk", col("_base") + col("_wrn"))
      // integer DIV (never float division-then-cast: positive-quadrant
      // truncation parity with the oracle's `//` is exact by construction)
      .withColumn("shard", expr(s"(rnk - 1) DIV ${shardSize}L"))
      .drop("_bkt", "_base", "_wrn")
  }

  /**
   * Deterministic pseudo-random NEGATIVE pairs for contrastive training:
   * each anchor pairs with `nNeg` partners chosen by md5-derived strides
   * around the exact md5-shuffled global rank ring — reproducible (no
   * random(), so retries and re-runs emit the same pairs), uniform, and
   * self-pair-free by construction: stride_j = md5(id, salt, j) mod
   * (n-1) + 1 lies in [1, n-1], so (rnk-1 + stride) mod n never lands on
   * the anchor.
   *
   * Scale: ranks come from the [[shardAssign]] two-pass scaffold (no
   * global window); partners resolve through ONE equi-join on the rank
   * ring (shuffle on a long key). n is one driver count. Never a cross
   * join — the naive "sample negatives by self-joining on random()" is
   * both nondeterministic and quadratic.
   *
   * Returns (idCol, neg_idx in [1, nNeg], neg_id).
   */
  def negativePairs(docs: DataFrame, idCol: String, nNeg: Int,
                    salt: String = ""): DataFrame = {
    require(nNeg >= 1 && nNeg <= 1000, "nNeg must be in [1, 1000]")
    require(!docs.columns.exists(Seq("neg_idx", "neg_id", "_pr").contains),
      "input must not contain neg_idx/neg_id/_pr")
    val ranked = shardAssign(docs, idCol, shardSize = Long.MaxValue,
        salt = salt)
      .select(col(idCol), col("rnk"))
    val n = ranked.count()
    require(n >= 2, s"need at least 2 rows to draw negatives, got $n")
    val strideHash = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(salt), lit("#"), col("neg_idx").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    ranked
      .withColumn("neg_idx", explode(sequence(lit(1), lit(nNeg))))
      .withColumn("_pr",
        pmod(col("rnk") - 1 + pmod(strideHash, lit(n - 1)) + 1, lit(n)) + 1)
      .join(ranked.select(col(idCol).as("neg_id"), col("rnk").as("_pr")),
        "_pr")
      .select(col(idCol), col("neg_idx").cast("long").as("neg_idx"),
        col("neg_id"))
  }

  /** The shared two-pass exact-global-order scaffold ([[shardAssign]],
    * [[packSequences]]): aggregate `metric` per hash bucket (the ONLY
    * frame a full-width window ever sorts — <= 10k rows), cumulative-sum
    * it into per-bucket bases, broadcast those back onto the tagged rows,
    * and return the joined frame (`_base` attached) plus the in-bucket
    * window in (md5(id+salt), id) order — together the exact global
    * (bucket, md5, id) order the DuckDB oracles replay naively. Callers
    * must have dropped NULL ids and tagged `_bkt` already. */
  private def bucketCumsum(tagged: DataFrame, idCol: String, salt: String,
                           metric: Column): (DataFrame, WindowSpec) = {
    val hist = tagged.groupBy("_bkt").agg(metric.as("_m"))
    val base = coalesce(sum("_m").over(Window.orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val bases = hist.withColumn("_base", base).select("_bkt", "_base")
    val w = Window.partitionBy("_bkt")
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    (tagged.join(broadcast(bases), Seq("_bkt")), w)
  }

  /** Deterministic sequence PACKING — the "concatenate the shuffled corpus
    * and split it at fixed context-window boundaries" step of LLM training
    * data prep (GPT-style concat-and-chunk). Every doc gets its exact
    * global token offset in the md5-shuffled order; the context windows it
    * occupies follow arithmetically:
    *   tok_off   = sum of token counts of all docs before it,
    *   win_start = tok_off DIV windowLen,
    *   win_end   = (tok_off + tokens - 1) DIV windowLen,
    *   win_off   = tok_off % windowLen (position inside its first window),
    *   n_wins    = windows the doc straddles.
    * A pure function of the id set: re-runs reproduce the layout, and the
    * oracle replays it as one naive global running sum.
    *
    * Scale shape (the shardAssign two-pass recipe): pass 1 aggregates
    * per-bucket token totals (a 10k-row frame; its cumulative window is
    * the only full-width sort), pass 2 broadcasts each bucket's base
    * offset and runs the running sum WITHIN its bucket — parallelism
    * scales with the data instead of collapsing into one reducer. Rows
    * with a NULL id or a non-positive token count are dropped (no
    * deterministic identity / no trainable content to place). */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: Column,
                    windowLen: Long, salt: String = ""): DataFrame = {
    require(windowLen > 0, "windowLen must be positive")
    val scratch = Seq("_bkt", "_tk", "_m", "_base", "_bcum")
    val outCols = Seq("tok_off", "win_start", "win_end", "win_off", "n_wins")
    require(!docs.columns.exists(c => scratch.contains(c) || outCols.contains(c)),
      "input must not contain output or internal scratch columns")
    val tagged = docs.where(col(idCol).isNotNull)
      .withColumn("_tk", tokenCol.cast("long"))
      .where(col("_tk") > 0)
      .withColumn("_bkt", hashBucket(col(idCol), salt))
    val (joined, w) = bucketCumsum(tagged, idCol, salt, sum("_tk"))
    joined
      .withColumn("_bcum", coalesce(sum("_tk").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tok_off", col("_base") + col("_bcum"))
      // integer DIV on the positive quadrant: truncation parity with the
      // oracle's `//` is exact by construction (_tk > 0, tok_off >= 0)
      .withColumn("win_start", expr(s"tok_off DIV ${windowLen}L"))
      .withColumn("win_end", expr(s"(tok_off + _tk - 1) DIV ${windowLen}L"))
      .withColumn("win_off", pmod(col("tok_off"), lit(windowLen)))
      .withColumn("n_wins", col("win_end") - col("win_start") + lit(1L))
      .drop("_bkt", "_tk", "_base", "_bcum")
  }

  /** Stratified deterministic sampling — the data-mixing primitive: each
    * stratum keeps its own rate (e.g. {web -> 0.1, books -> 1.0}). Rows in
    * strata absent from `rates` are DROPPED (explicit mixing weights only;
    * pass 1.0 to keep a stratum whole). One scan, no shuffle of the data:
    * the per-stratum threshold arrives by broadcast-joining a tiny rate
    * frame — not a caller-sized nested when-fold, the codegen
    * subexpression-elimination hazard this repo has already reproduced. */
  def stratifiedSample(df: DataFrame, idCol: String, stratum: Column,
                       rates: Map[String, Double], salt: String = ""): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0))
    require(!df.columns.exists(Seq("_st", "_thr").contains),
      "input must not contain internal scratch columns _st/_thr")
    val sp = df.sparkSession
    import sp.implicits._
    val rateDf = rates.toSeq
      .map { case (k, r) => (k, math.round(r * Buckets)) }.toDF("_st", "_thr")
    df.withColumn("_st", stratum)
      .join(broadcast(rateDf), Seq("_st"))
      .where(hashBucket(col(idCol), salt) < col("_thr"))
      .drop("_st", "_thr")
  }
}
