package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Distributed.StageSyntax

/** Distributed BPE tokenizer training (SURVEY.md §2.3 L40) — the
  * byte-pair-encoding merge loop of Sennrich et al. ("Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016), run as
  * `MergeRounds` data-parallel rounds over the corpus vocabulary.
  *
  * Every round:
  *   1. PAIR COUNT — each word contributes its adjacent symbol pairs
  *      weighted by corpus frequency: a map-side fan-out ∝ word length
  *      over the VOCABULARY (distinct words — the corpus collapses to
  *      ≤|vocab| rows first, so a 100 TB corpus prices a round by its
  *      vocabulary, not its token stream), then one mergeable groupBy.
  *   2. TOP PAIR — TakeOrdered 1 with a total-order tie-break
  *      (weight desc, left asc, right asc): deterministic in both
  *      engines where a bare argmax would not be.
  *   3. MERGE — greedy LEFT-TO-RIGHT non-overlapping replacement of
  *      the winning pair in every word. Overlapping match chains
  *      ("aaaa" under (a,a)) are resolved WITHOUT a sequential fold:
  *      match positions per word form gaps-and-islands (island id =
  *      pos − row_number), and greedy-from-the-left takes exactly the
  *      ODD ranks within each island — so the merge set is pure
  *      window arithmetic on the high-cardinality word key, and the
  *      rebuild is a per-row transform+filter (emit merged symbol at
  *      a merge position, drop its successor, keep the rest).
  *
  * Rounds chain through localCheckpoint (the trade_pagerank /
  * part_hierarchy iteration discipline: the next round must not
  * re-plan the last). The oracle unrolls the same three rounds as
  * chained DuckDB CTEs — same counts, same tie-break, same
  * island-parity merge — proving the distributed formulation against
  * a second engine's window semantics, exactly as trade_pagerank does
  * for its unrolled power iterations.
  */
object Bpe {

  private[graft] val MergeRounds = 3

  /** One merge round on a (word, freq, s: array<string>) vocabulary:
    * returns (merged vocab, the winning (left, right, weight) row).
    * private[graft] so PlanSpec can audit the round's physical plan —
    * the rounds run under localCheckpoint, so the top-level query plan
    * no longer contains them. */
  private[graft] def mergeRound(vocab: DataFrame): (DataFrame, DataFrame) = {
    val spark = vocab.sparkSession
    // 1. weighted adjacent-pair counts (map-side fan-out ∝ |word|).
    // Single-symbol words carry no pair and are filtered BEFORE the
    // sequence() fan-out: Spark's sequence(1, 0) counts DOWN, so an
    // unguarded explode would fabricate indexes 1 and 0.
    val pairs = vocab
      .filter(size(col("s")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(s) - 1), i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("w"))
    // 2. the winning pair: TakeOrdered 1, total-order tie-break
    val top = pairs.orderBy(col("w").desc, col("l"), col("r")).limit(1)
    // 3. greedy non-overlapping merge via island parity: match
    // positions i (s[i]=l, s[i+1]=r) per word; island id = i - rank;
    // greedy-from-left keeps the odd ranks inside each island
    val wIsl = Window.partitionBy(col("word")).orderBy(col("i"))
    val wRank = Window.partitionBy(col("word"), col("g")).orderBy(col("i"))
    val matches = vocab
      .filter(size(col("s")) >= 2)
      .select(col("word"), col("s"), explode(expr("sequence(1, size(s) - 1)")).as("i"))
      .crossJoin(broadcast(top))
      .filter(expr("element_at(s, i)") === col("l")
        && expr("element_at(s, i + 1)") === col("r"))
      .withColumn("g", col("i") - row_number().over(wIsl))
      .withColumn("rr", row_number().over(wRank))
      .filter(col("rr") % 2 === 1)
      .groupBy(col("word")).agg(sort_array(collect_list(col("i"))).as("m"))
    val merged = vocab.join(matches, Seq("word"), "left")
      .select(col("word"), col("freq"),
        when(col("m").isNull, col("s")).otherwise(expr(
          """filter(transform(sequence(1, size(s)), i ->
            |  CASE WHEN array_contains(m, i)
            |       THEN concat(element_at(s, i), element_at(s, i + 1))
            |       WHEN array_contains(m, i - 1) THEN NULL
            |       ELSE element_at(s, i) END),
            |  x -> x IS NOT NULL)""".stripMargin)).as("s"))
    (merged, top)
  }

  /** The vocabulary CTE + one oracle merge round, mirroring
    * [[mergeRound]] CTE-for-stage (round r reads v{r-1}, emits
    * p{r}/t{r}/mm{r}/ms{r}/v{r}). */
  private def oracleRound(r: Int): String = {
    val v = s"v${r - 1}"
    s"""p$r AS (SELECT s[i] AS l, s[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS w
       |        FROM (SELECT s, freq, unnest(range(1, len(s))) AS i FROM $v)
       |        GROUP BY 1, 2),
       |t$r AS (SELECT l, r, w FROM p$r ORDER BY w DESC, l, r LIMIT 1),
       |mm$r AS (SELECT word, i,
       |               row_number() OVER (PARTITION BY word, g ORDER BY i) AS rr
       |        FROM (SELECT word, i,
       |                     i - row_number() OVER (PARTITION BY word ORDER BY i) AS g
       |              FROM (SELECT word, s, unnest(range(1, len(s))) AS i FROM $v), t$r
       |              WHERE s[i] = t$r.l AND s[i + 1] = t$r.r)),
       |ms$r AS (SELECT word, list(i ORDER BY i) AS m FROM mm$r WHERE rr % 2 = 1 GROUP BY word),
       |v$r AS (SELECT v.word, v.freq,
       |               CASE WHEN ms$r.m IS NULL THEN v.s
       |                    ELSE list_filter(list_transform(range(1, len(v.s) + 1), i ->
       |                           CASE WHEN list_contains(ms$r.m, i) THEN v.s[i] || v.s[i + 1]
       |                                WHEN list_contains(ms$r.m, i - 1) THEN NULL
       |                                ELSE v.s[i] END),
       |                         x -> x IS NOT NULL) END AS s
       |        FROM $v v LEFT JOIN ms$r ON ms$r.word = v.word)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "bpe_merges", {
        val rounds = (1 to MergeRounds).map(oracleRound).mkString(",\n")
        val union = (1 to MergeRounds)
          .map(r => s"SELECT CAST($r AS BIGINT) AS merge_rank, l AS left_sym, r AS right_sym, l || r AS merged, w AS weight FROM t$r")
          .mkString("\nUNION ALL\n")
        s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
           |vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM tok
           |          WHERE len(word) > 0 GROUP BY word),
           |v0 AS (SELECT word, freq,
           |              list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS s
           |       FROM vocab),
           |$rounds
           |$union""".stripMargin
      }) { (spark, dir) =>
      var vocab = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(countAll.as("freq"))
        .withColumn("s",
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .stage()
      val tops = (1 to MergeRounds).map { r =>
        val (merged, top) = mergeRound(vocab)
        // next round must price its own plan, not re-run this one's
        vocab = merged.stage()
        top.select(lit(r.toLong).as("merge_rank"), col("l").as("left_sym"),
          col("r").as("right_sym"), concat(col("l"), col("r")).as("merged"),
          col("w").as("weight"))
      }
      tops.reduce(_ union _)
    },

    // L42 — BPE ENCODING stats: the apply side of the tokenizer loop
    // (train with bpe_merges, then encode). Because merges rewrite
    // WORDS, encoding the corpus needs only the trained vocabulary:
    // every token occurrence of a word costs |s_final| symbols, so the
    // corpus-level compression curve is ONE weighted aggregate over
    // the ≤|vocab| merged rows — Σ freq·len(word) chars vs
    // Σ freq·|s| symbols, the number a tokenizer team actually tracks
    // per merge budget. Decimal products guard the Σ freq·len
    // overflow; one double division at the end (the basket_lift
    // rule). Shares mergeRound verbatim with bpe_merges — the train
    // and apply paths cannot drift.
    QueryDef(
      "bpe_encode", {
        val rounds = (1 to MergeRounds).map(oracleRound).mkString(",\n")
        s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
           |vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM tok
           |          WHERE len(word) > 0 GROUP BY word),
           |v0 AS (SELECT word, freq,
           |              list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS s
           |       FROM vocab),
           |$rounds
           |SELECT CAST(SUM(freq) AS BIGINT) AS n_word_occurrences,
           |       CAST(SUM(CAST(freq AS DECIMAL(30,0)) * len(word)) AS BIGINT) AS n_chars,
           |       CAST(SUM(CAST(freq AS DECIMAL(30,0)) * len(s)) AS BIGINT) AS n_symbols,
           |       floor(CAST(SUM(CAST(freq AS DECIMAL(30,0)) * len(word)) AS DOUBLE)
           |             / CAST(SUM(CAST(freq AS DECIMAL(30,0)) * len(s)) AS DOUBLE)
           |             * 1000000.0) / 1000000.0 AS chars_per_symbol
           |FROM v$MergeRounds""".stripMargin
      }) { (spark, dir) =>
      var vocab = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(countAll.as("freq"))
        .withColumn("s",
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .stage()
      (1 to MergeRounds).foreach { _ =>
        vocab = mergeRound(vocab)._1.stage()
      }
      vocab.agg(
        sum(col("freq")).as("n_word_occurrences"),
        sum(col("freq").cast("decimal(30,0)") * length(col("word")))
          .cast("long").as("n_chars"),
        sum(col("freq").cast("decimal(30,0)") * size(col("s")))
          .cast("long").as("n_symbols"))
        .select(col("n_word_occurrences"), col("n_chars"), col("n_symbols"),
          quant6(col("n_chars").cast("double") / col("n_symbols").cast("double"))
            .as("chars_per_symbol"))
    })
}
