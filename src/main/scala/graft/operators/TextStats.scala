package graft.operators

import graft.QueryDef
import graft.functions.Portable.{quant6, Quant6Sql}
import graft.operators.Distributed.StageSyntax
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics (SURVEY.md §2.3 L16–L17) — the
  * vocabulary/weighting stage of a training-data pipeline (tokenizer
  * vocabularies, per-doc keyword extraction).
  *
  * Scale shape: everything reduces through (doc_id, token) partial
  * aggregation first — the per-doc term-frequency relation is the one
  * shared shuffle; document frequency then aggregates per token
  * WITHOUT a count-distinct Expand (each (doc, token) row appears
  * exactly once, so `count(*)` IS the document frequency). Top-k ends
  * in TakeOrdered, never a global sort. Zipf-skewed hot tokens are
  * AQE's skew-join case on the df join; the tf-idf ranking needs no
  * join against the corpus — only against the (much smaller)
  * vocabulary.
  */
object TextStats {

  private val VocabTopK = 50
  private val TfIdfTopK = 3

  // BM25 (Robertson/Sparck Jones, "Okapi at TREC-3"): standard free
  // parameters, a fixed 3-term query (one rare + two common tokens of
  // the synthetic corpus, so the idf weighting is visibly load-bearing),
  // and a bounded result page.
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25TopK = 20
  private val Bm25Query = Seq("dup", "spark", "merge")

  /** (doc_id, token, tf_d): per-document term frequencies — the shared
    * first shuffle of both queries. */
  private def docTerms(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf_d"))

  val defs: Seq[QueryDef] = Seq(

    // L16 — corpus vocabulary: top-K tokens by document frequency.
    QueryDef(
      "text_vocab",
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |g AS (SELECT doc_id, token, COUNT(*) AS tf_d FROM t GROUP BY doc_id, token),
         |v AS (SELECT token, CAST(SUM(tf_d) AS BIGINT) AS tf, COUNT(*) AS df FROM g GROUP BY token)
         |SELECT token, tf, df FROM v
         |ORDER BY df DESC, tf DESC, token LIMIT $VocabTopK""".stripMargin) { (spark, dir) =>
      docTerms(Tables.documents(spark, dir))
        .groupBy(col("token"))
        .agg(sum(col("tf_d")).cast("long").as("tf"), count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tf").desc, col("token"))
        .limit(VocabTopK)
    },

    // L18 — rule-based redaction (the PII-masking stage of a training
    // pipeline, expressed on the synthetic corpus as marker-token
    // masking): regexp_replace + regexp count, pure per-row codegen'd
    // expressions — a narrow map stage at any scale. The pattern uses
    // only \b + alternation, which Java regex (Spark) and RE2 (DuckDB)
    // interpret identically.
    QueryDef(
      "text_redact",
      """SELECT doc_id, lang,
        |       CAST(len(regexp_extract_all(text, '\b(the|le|el|der)\b')) AS BIGINT) AS n_masked,
        |       md5(regexp_replace(text, '\b(the|le|el|der)\b', '<mask>', 'g')) AS masked_hash
        |FROM documents""".stripMargin) { (spark, dir) =>
      val pattern = "\\b(the|le|el|der)\\b"
      Tables.documents(spark, dir).select(
        col("doc_id"), col("lang"),
        regexp_count(col("text"), lit(pattern)).cast("long").as("n_masked"),
        md5(regexp_replace(col("text"), pattern, "<mask>")).as("masked_hash"))
    },

    // L19 — training-sequence packing: concat-then-chunk document
    // packing into fixed token budgets, per language. A doc belongs to
    // the pack where its first token lands (running token count over a
    // deterministic doc order) — the standard pretraining packing
    // semantics. The running sum is NOT a lang-partitioned window
    // (lang has ~5 values → whole corpus of a language through one
    // reducer): Distributed.globalRunning range-shards each language's
    // doc_id order and stitches shard running sums with broadcast
    // prefix offsets — exact same pack ids, every stage parallel.
    QueryDef(
      "text_pack", {
        val budget = 2048
        s"""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents),
           |r AS (SELECT doc_id, lang, n_tok,
           |             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
           |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           |      FROM t)
           |SELECT lang, CAST((run - n_tok) // $budget AS BIGINT) AS pack_id,
           |       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
           |FROM r GROUP BY 1, 2""".stripMargin
      }) { (spark, dir) =>
      val budget = 2048
      val t = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      Distributed.globalRunning(t, Seq("lang"), Seq("doc_id"), Some("n_tok"))
        .groupBy(col("lang"), expr(s"(g_run - n_tok) div $budget").as("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("total_tokens"))
    },

    // L23 — unigram-LM familiarity scoring: the engine shape of a
    // CCNet-style LM quality gate (corpus statistics → per-token
    // probability → per-doc aggregate score), with the per-token
    // quantity kept RATIONAL for oracle parity. mean_p is the doc's
    // token-frequency-weighted mean unigram probability Σ tf_d·n_k /
    // (len · N): every sum is a BIGINT (order-independent, exact in
    // both engines) and the single double division happens once at
    // the end — the same reason tf-idf uses N/df instead of ln. A
    // real deployment swaps the frequency table for n-gram/KenLM
    // logprobs (same join-back shape); docs of rare tokens score low
    // either way. Scale shape: reuses the (doc, token) partial-agg
    // shuffle; the frequency join is corpus-vocabulary-shaped, so it
    // carries no broadcast hint (AQE decides, Zipf-hot tokens are
    // AQE's skew case); the total-token count is a broadcast scalar.
    QueryDef(
      "text_lm_score",
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |g AS (SELECT doc_id, token, COUNT(*) AS tf_d FROM t GROUP BY doc_id, token),
        |f AS (SELECT token, CAST(SUM(tf_d) AS BIGINT) AS n_k FROM g GROUP BY token),
        |n AS (SELECT CAST(SUM(tf_d) AS BIGINT) AS n_total FROM g),
        |s AS (SELECT g.doc_id, CAST(SUM(g.tf_d) AS BIGINT) AS n_tokens,
        |             CAST(SUM(g.tf_d * f.n_k) AS BIGINT) AS s
        |      FROM g JOIN f USING (token) GROUP BY g.doc_id)
        |SELECT doc_id, n_tokens,
        |       floor(CAST(s AS DOUBLE) / CAST(n_tokens * n.n_total AS DOUBLE) * 1000000.0) / 1000000.0 AS mean_p
        |FROM s, n""".stripMargin) { (spark, dir) =>
      val g = docTerms(Tables.documents(spark, dir)).cache()
      val f = g.groupBy(col("token")).agg(sum(col("tf_d")).cast("long").as("n_k"))
      val n = g.agg(sum(col("tf_d")).cast("long").as("n_total"))
      g.join(f, "token")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf_d")).cast("long").as("n_tokens"),
          sum(col("tf_d") * col("n_k")).cast("long").as("s"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("n_tokens"),
          quant6(col("s").cast("double") / (col("n_tokens") * col("n_total")).cast("double"))
            .as("mean_p"))
    },

    // L24 — BM25 ranked retrieval (Okapi BM25, Robertson et al.,
    // TREC-3): the search-engine shape over the same posting lists the
    // vocabulary/tf-idf queries build. Scale shape: the query-term
    // filter is a per-row `isin` predicate on the (doc, token) relation
    // — posting-list retrieval, so everything downstream is sized by
    // the matched postings, not the corpus; the 3-row df table and the
    // 1-row corpus stats are broadcast (provably bounded); top-k ends
    // in TakeOrdered, never a global sort or window.
    //
    // Oracle parity: BM25's k1=1.2 is not binary-exact, so the tf
    // saturation term is scaled by 10/10 — tf·(k1+1)/(tf + k1·(1−b+
    // b·dl/avgdl)) ≡ tf·22/(tf·10 + 12·(0.25 + 0.75·dl/avgdl)) — and
    // every literal (22, 10, 12, 0.25, 0.75, 0.5) is exactly
    // representable, so identical operation order gives bit-identical
    // doubles in both engines (the SQL literals use e0 notation: DuckDB
    // parses bare 0.25 as DECIMAL). The idf is the Robertson form
    // (N−df+0.5)/(df+0.5) WITHOUT the ln wrapper, same rational-parity
    // rule as text_tfidf (swap in ln for a real deployment — per-term
    // ranking is unchanged; only the cross-term mix shifts). The
    // per-doc sum over matched terms is a fixed-order chain of
    // single-valued conditional sums — never an order-dependent double
    // SUM across term rows.
    QueryDef(
      "text_bm25", {
        val termList = Bm25Query.map(t => s"'$t'").mkString(", ")
        val caseSum = Bm25Query
          .map(t => s"COALESCE(SUM(CASE WHEN token = '$t' THEN sc END), 0e0)")
          .mkString("\n             + ")
        s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
           |g AS (SELECT doc_id, token, COUNT(*) AS tf_d FROM t GROUP BY doc_id, token),
           |dl AS (SELECT doc_id, CAST(SUM(tf_d) AS BIGINT) AS dl FROM g GROUP BY doc_id),
           |gstat AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
           |m AS (SELECT g.doc_id, g.token, g.tf_d, dl.dl FROM g JOIN dl USING (doc_id)
           |      WHERE g.token IN ($termList)),
           |dft AS (SELECT token, COUNT(*) AS df FROM m GROUP BY token),
           |s AS (SELECT m.doc_id, m.token,
           |             (gstat.n_docs - dft.df + 0.5e0) / (dft.df + 0.5e0)
           |               * (m.tf_d * 22e0)
           |               / (m.tf_d * 10e0 + 12e0 * (0.25e0 + 0.75e0 * m.dl / (CAST(gstat.tot AS DOUBLE) / gstat.n_docs))) AS sc
           |      FROM m JOIN dft USING (token), gstat),
           |w AS (SELECT doc_id, COUNT(*) AS n_terms,
           |             $caseSum AS score
           |      FROM s GROUP BY doc_id)
           |SELECT doc_id, n_terms, floor(score * 1000000.0) / 1000000.0 AS score
           |FROM w ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
      }) { (spark, dir) =>
      // r16 optimization (guide §2.3 "aggregate before you shuffle" /
      // §2.4): the old shape materialized the FULL (doc_id, token)
      // term-frequency relation (a corpus-sized string-keyed hash
      // aggregate + cache) only to derive dl = Σ tf_d and then join it
      // back — 24.5 executor-CPU-s for a 3-term query. But dl is just
      // the document's token COUNT (size(tk)), and the per-query-term
      // frequencies collapse in ONE doc_id-keyed conditional aggregate
      // over the exploded tokens: no (doc, token) group space, no
      // corpus-sized cache, no dl join. Values are identical by
      // construction (same integers into the same double expression
      // tree), so the oracle is untouched.
      val wide = Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
          explode(col("tk")).as("token"))
        .groupBy(col("doc_id"))
        .agg(first(col("dl")).as("dl"),
          Bm25Query.map(t =>
            sum(when(col("token") === t, lit(1L)).otherwise(lit(0L))).as(s"tf_$t")): _*)
        .stage() // feeds glob, dft, and the scored rows — one pass
      val glob = wide.agg(count(lit(1)).as("n_docs"), sum(col("dl")).cast("long").as("tot"))
      val dftCols = Bm25Query.map(t =>
        sum(when(col(s"tf_$t") > 0, lit(1L)).otherwise(lit(0L))).as(s"df_$t"))
      val dft = wide.agg(dftCols.head, dftCols.tail: _*)
      val avgdl = col("tot").cast("double") / col("n_docs")
      def sc(t: String) = (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) *
        (col(s"tf_$t") * lit(22.0)) /
        (col(s"tf_$t") * lit(10.0) + lit(12.0) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      wide
        .filter(Bm25Query.map(t => col(s"tf_$t") > 0).reduce(_ || _))
        .crossJoin(broadcast(dft))
        .crossJoin(broadcast(glob))
        .select(col("doc_id") +:
          (Bm25Query.map(t => (col(s"tf_$t") > 0).cast("long").as(s"m_$t")) ++
            Bm25Query.map(t => when(col(s"tf_$t") > 0, sc(t)).otherwise(lit(0.0)).as(s"s_$t"))): _*)
        .select(col("doc_id"),
          Bm25Query.map(t => col(s"m_$t")).reduce(_ + _).as("n_terms"),
          quant6(Bm25Query.map(t => col(s"s_$t")).reduce(_ + _)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(Bm25TopK)
    },

    // L17 — per-document top-K terms by tf-idf. The idf is the
    // RATIONAL form N/df (not ln(N/df)): integer-derived double math
    // is bit-identical across engines, while ln() may differ in the
    // last ulp and flip rank ties — the ranking is the same either
    // way since ln is monotonic. Swap in ln() when oracle parity is
    // not required.
    QueryDef(
      "text_tfidf",
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |g AS (SELECT doc_id, token, COUNT(*) AS tf_d FROM t GROUP BY doc_id, token),
         |df AS (SELECT token, COUNT(*) AS df FROM g GROUP BY token),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |s AS (SELECT g.doc_id, g.token, g.tf_d,
         |             CAST(g.tf_d AS DOUBLE) * n.n / df.df AS score
         |      FROM g JOIN df USING (token), n),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
         |      FROM s)
         |SELECT doc_id, token, CAST(tf_d AS BIGINT) AS tf,
         |       floor(score * 1000000.0) / 1000000.0 AS score,
         |       CAST(rn AS BIGINT) AS rank
         |FROM r WHERE rn <= $TfIdfTopK""".stripMargin) { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val g = docTerms(docs).cache() // consumed by both df and the scoring join
      val dfTok = g.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val s = g.join(dfTok, "token")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"), col("tf_d"),
          (col("tf_d").cast("double") * col("n") / col("df")).as("score"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
      s.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TfIdfTopK)
        .select(col("doc_id"), col("token"), col("tf_d").cast("long").as("tf"),
          quant6(col("score")).as("score"), col("rn").cast("long").as("rank"))
    },

    // L34 — frequency-of-frequencies spectrum + Good-Turing adjusted
    // counts: how many token types occur exactly f times, and the
    // smoothed count r* = (r+1)·n_{r+1}/n_r — the table every
    // language-model smoothing estimate (Good-Turing, Katz backoff)
    // starts from, and the corpus-health curve ("how heavy is the
    // singleton tail?") data-quality reads. Two mergeable
    // aggregations: term frequency over the exploded token stream
    // (the text_vocab shuffle — vocabulary-shaped), then the spectrum
    // over the ≤ max-frequency distinct counts; the lead() window
    // runs on that TINY aggregate (the events_growth rule). r* is
    // defined only where n_{r+1} exists (consecutive spectrum rows);
    // the division is one double op over exact BIGINTs.
    QueryDef(
      "text_freq_spectrum",
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |tf AS (SELECT token, COUNT(*) AS f FROM tok GROUP BY token),
         |sp AS (SELECT f AS freq, COUNT(*) AS n_tokens FROM tf GROUP BY f),
         |w AS (SELECT freq, n_tokens,
         |             lead(n_tokens) OVER (ORDER BY freq) AS n_next,
         |             lead(freq) OVER (ORDER BY freq) AS f_next
         |      FROM sp)
         |SELECT freq, n_tokens,
         |       ${Quant6Sql("CASE WHEN f_next = freq + 1 THEN (CAST(freq AS DOUBLE) + 1.0) * n_next / n_tokens END")} AS gt_count
         |FROM w""".stripMargin) { (spark, dir) =>
      val w = Window.orderBy(col("freq"))
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("f"))
        .groupBy(col("f").as("freq")).agg(count(lit(1)).as("n_tokens"))
        .withColumn("n_next", lead(col("n_tokens"), 1).over(w))
        .withColumn("f_next", lead(col("freq"), 1).over(w))
        .select(col("freq"), col("n_tokens"),
          quant6(when(col("f_next") === col("freq") + 1,
            (col("freq").cast("double") + lit(1.0)) * col("n_next") / col("n_tokens")))
            .as("gt_count"))
    },

    // L32 — heavy hitters with BOUNDED candidate state: the top-20
    // corpus tokens by exact count, where candidate generation is
    // per-partition Misra-Gries (k = 256 counters, O(k) memory per
    // task — the ONLY operator in the repo that needs per-partition
    // imperative state, which is exactly the case the mapPartitions
    // escape hatch exists for; everything downstream is declarative).
    // text_vocab aggregates the FULL (doc, token) relation to rank
    // tokens; at a 100 TB corpus whose token type count itself is
    // huge, this shape never materializes the full frequency table —
    // the MG union is a ≤ k·|partitions| candidate set (broadcast),
    // and the exact pass counts ONLY candidates (work ∝ matched
    // postings, the text_bm25 argument). Correctness does NOT depend
    // on the partition layout: any token with global count >
    // N/(k+1) survives in some partition's summary (averaging
    // argument over Σn_p), the exact recount fixes every surviving
    // count, and the final cut is TakeOrdered on (exact count DESC,
    // token) — a total order. The spec asserts the guarantee bound
    // held (f20 > N/(k+1)) and equality with the full aggregation.
    QueryDef(
      "text_heavy_hitters",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, COUNT(*) AS cnt FROM tok
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val k = 256
      val docs = Tables.documents(spark, dir)
      val tokens = docs.select(explode(split(col("text"), " ")).as("token"))
      val candidates = tokens.as[String].mapPartitions { it =>
        // Misra-Gries: on overflow decrement every counter and drop
        // zeros (the arriving token is NOT inserted) — items with
        // partition count > n_p/(k+1) always survive
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (counts.contains(t)) counts(t) += 1L
          else if (counts.size < k) counts(t) = 1L
          else {
            counts.mapValuesInPlace((_, v) => v - 1L)
            counts.filterInPlace((_, v) => v > 0L)
          }
        }
        counts.keysIterator
      }.toDF("token").distinct()
      tokens.join(broadcast(candidates), "token")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
    },

    // L43 — positional phrase search: exact 3-token phrase lookup by
    // POSTING-LIST INTERSECTION — the position-aware index shape a
    // search engine adds on top of text_bm25's frequency postings.
    // The query phrase is mined from the corpus (most frequent
    // trigram, lexicographic tie-break — a deterministic stand-in for
    // the user's query string), broadcast as one row, and resolved by
    // joining the three words' (doc, pos) postings on (doc, pos+1),
    // (doc, pos+2): work ∝ the matched postings (the text_bm25 rule),
    // never the corpus — the selective word's posting list prices the
    // query. The oracle deliberately takes the OTHER algorithm (a
    // trigram scan over every document), so the index formulation is
    // proven against a direct scan — the golden_record
    // two-algorithms-one-output pattern.
    QueryDef(
      "phrase_search",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk,
        |                  len(string_split(text, ' ')) AS n
        |           FROM documents),
        |tg AS (SELECT doc_id, array_to_string(tk[i:i + 2], ' ') AS g
        |       FROM (SELECT doc_id, tk, unnest(range(1, n - 1)) AS i FROM d WHERE n >= 3)),
        |c AS (SELECT g, COUNT(*) AS cnt FROM tg GROUP BY g),
        |t AS (SELECT g FROM c ORDER BY cnt DESC, g LIMIT 1)
        |SELECT tg.doc_id, t.g AS phrase, COUNT(*) AS n_occurrences
        |FROM tg, t WHERE tg.g = t.g
        |GROUP BY tg.doc_id, t.g""".stripMargin) { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      // phrase mining: most frequent trigram (TakeOrdered-1 total order)
      val top = docs.filter(size(col("tk")) >= 3)
        .select(explode(expr(
          "transform(sequence(1, size(tk) - 2), i -> concat_ws(' ', slice(tk, i, 3)))"))
          .as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("g")).limit(1)
        .select(col("g"),
          element_at(split(col("g"), " "), 1).as("w1"),
          element_at(split(col("g"), " "), 2).as("w2"),
          element_at(split(col("g"), " "), 3).as("w3"))
      // search: positional postings of the three words, intersected on
      // (doc, pos+1)/(doc, pos+2) — keyed equi-joins, matched-postings
      // sized
      val tokpos = docs
        .select(col("doc_id"), posexplode(col("tk")).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
        .crossJoin(broadcast(top))
      val p1 = tokpos.filter(col("w") === col("w1"))
        .select(col("doc_id"), col("pos"), col("g"))
      val p2 = tokpos.filter(col("w") === col("w2"))
        .select(col("doc_id").as("d2"), col("pos").as("pos2"))
      val p3 = tokpos.filter(col("w") === col("w3"))
        .select(col("doc_id").as("d3"), col("pos").as("pos3"))
      p1.join(p2, col("doc_id") === col("d2") && col("pos2") === col("pos") + 1)
        .join(p3, col("doc_id") === col("d3") && col("pos3") === col("pos") + 2)
        .groupBy(col("doc_id"), col("g").as("phrase"))
        .agg(count(lit(1)).as("n_occurrences"))
    },

    // L44 — language-ID confusion matrix: the classifier-evaluation
    // harness AS a query — every (true lang, predicted lang) cell of
    // the L8 heuristic against the corpus's labeled lang column, the
    // table a model-quality dashboard renders before anyone trusts a
    // language gate. SHARES the per-row argmax formula with
    // text_langid/corpus_keep (predictedExpr / predictedSqlExpr —
    // drift-guarded the same way corpus_keep's gates are), so the
    // evaluation can never measure a different classifier than the
    // one in production. One scan-speed projection + a ≤|langs|²
    // mergeable count matrix (the events_histogram rule).
    QueryDef(
      "langid_confusion",
      s"""SELECT lang AS true_lang,
         |       ${TextOps.predictedSqlExpr} AS pred_lang,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM documents
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("lang").as("true_lang"), TextOps.predictedExpr.as("pred_lang"))
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // A65 — Gini diversity of each source's language mix: 1 − Σ pₗ²,
    // the 0-(uniform)-to-1 concentration index a corpus dashboard
    // tracks per domain — and the ENTROPY STAND-IN that stays
    // engine-portable: H = −Σ p·ln p needs ln(), which is not
    // correctly rounded and differs between libm builds, while the
    // Gini form is pure RATIONAL arithmetic over exact BIGINTs
    // ((n² − Σ nₗ²) / n² — one double division at the end, the
    // basket_lift rule). Counts are two nested mergeable aggregates
    // (≤ |sources|·|langs| then ≤ |sources| rows); decimal products
    // guard the n² overflow past ~3e9 docs/source.
    QueryDef(
      "gini_diversity",
      """WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl
        |           FROM documents GROUP BY 1, 2),
        |g AS (SELECT source, CAST(SUM(nl) AS BIGINT) AS n,
        |             CAST(COUNT(*) AS BIGINT) AS n_langs,
        |             CAST(SUM(CAST(nl AS DECIMAL(30,0)) * nl) AS DECIMAL(38,0)) AS ss
        |      FROM c GROUP BY source)
        |SELECT source, n AS n_docs, n_langs,
        |       floor(CAST(CAST(n AS DECIMAL(30,0)) * n - ss AS DOUBLE)
        |             / CAST(CAST(n AS DECIMAL(30,0)) * n AS DOUBLE) * 1000000.0)
        |         / 1000000.0 AS gini
        |FROM g""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("nl"))
        .groupBy(col("source"))
        .agg(sum(col("nl")).as("n"), count(lit(1)).as("n_langs"),
          sum(col("nl").cast("decimal(30,0)") * col("nl")).as("ss"))
        .select(col("source"), col("n").as("n_docs"), col("n_langs"),
          quant6((col("n").cast("decimal(30,0)") * col("n") - col("ss")).cast("double")
            / (col("n").cast("decimal(30,0)") * col("n")).cast("double")).as("gini"))
    })
}
