package graft.operators

import graft.QueryDef
import graft.functions.Portable.quant6
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Distributed.StageSyntax

/** Text-analysis operators over `documents` (SURVEY.md §2.3 L1,
  * L8–L11) — the per-document stage of an LLM training-data pipeline.
  *
  * Everything is built from codegen'd array/string builtins (`split`,
  * `filter`, `transform`, `md5`) — no UDFs — so each query is a single
  * narrow map stage over the scan: embarrassingly parallel at 100 TB,
  * no shuffle except the final keyed aggregation where one exists.
  * Hashes are md5-derived only, for bit-parity with the DuckDB oracle
  * (SURVEY.md §4).
  */
object TextOps {

  private def toks: Column = split(col("text"), " ")

  /** size(filter(tokens, t -> t IN markers)) as a portable hit count. */
  private def hits(markers: Seq[String]): Column = {
    val arr = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  private def hitsSql(markers: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${markers.map("'" + _ + "'").mkString(", ")})))"

  // Tiny per-language marker lists (n-gram-heuristic language ID).
  private val enM = Seq("the", "a", "of", "and")
  private val frM = Seq("le", "la", "et", "les")
  private val esM = Seq("el", "los", "una", "que")
  private val deM = Seq("der", "und", "das", "ist")
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** The text_quality projection over ANY (doc_id, text) relation —
    * batch or STREAMING: every gate is a pure per-row expression, so
    * the same projection serves `text_quality` and a readStream over a
    * document drop-zone unchanged (StreamingSpec proves the outputs
    * identical). This is the hygiene-gate deployment story at 100 TB:
    * score documents as they land, not in a nightly rescan. */
  private[graft] def scoreQuality(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nTok = size(toks)
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio = hits(stopwords).cast("double") / nTok
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      quant6(avgTokLen).as("avg_tok_len"),
      quant6(stopRatio).as("stop_ratio"),
      quant6(qualityExpr).as("quality"))
  }

  /** The text_quality score as a self-contained per-row expression
    * over a `text` column — shared verbatim by text_quality and the
    * corpus_keep gate so the two can never drift. */
  private[operators] def qualityExpr: Column = {
    val nTok = size(toks)
    val stopRatio = hits(stopwords).cast("double") / nTok
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.4) * (lit(1.0) - stopRatio) +
      lit(0.2) * least(avgTokLen / 8.0, lit(1.0))
  }

  /** The same formula over precomputed SQL operands (`nTok`, `hStop`
    * are expression strings) — lets text_quality's oracle and the
    * corpus_keep oracle render the ONE formula against their own
    * subquery aliases. */
  private[operators] def qualitySqlFrom(nTok: String, hStop: String): String =
    s"""(0.4 * least($nTok / 100.0, 1.0)
       | + 0.4 * (1.0 - CAST($hStop AS DOUBLE) / $nTok)
       | + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / $nTok) / 8.0, 1.0))""".stripMargin

  /** Its SQL twin (expression over a relation exposing `text`). */
  private[operators] def qualitySqlExpr: String =
    qualitySqlFrom("len(string_split(text, ' '))", hitsSql(stopwords))

  /** Language-ID argmax over four precomputed hit columns — shared by
    * text_langid and corpus_keep. */
  private[operators] def predictedFrom(hEn: Column, hFr: Column, hEs: Column, hDe: Column): Column =
    when(hEn >= greatest(hFr, hEs, hDe) && hEn > 0, "en")
      .when(hFr >= greatest(hEs, hDe) && hFr > 0, "fr")
      .when(hEs >= hDe && hEs > 0, "es")
      .when(hDe > 0, "de")
      .otherwise("unknown")

  /** Self-contained per-row predicted language over a `text` column. */
  private[operators] def predictedExpr: Column =
    predictedFrom(hits(enM), hits(frM), hits(esM), hits(deM))

  /** The argmax CASE over four SQL operand strings — shared by the
    * text_langid oracle (alias operands) and predictedSqlExpr (inline
    * operands). */
  private[operators] def predictedSqlFrom(hEn: String, hFr: String, hEs: String, hDe: String): String =
    s"""CASE WHEN $hEn >= greatest($hFr, $hEs, $hDe) AND $hEn > 0 THEN 'en'
       |     WHEN $hFr >= greatest($hEs, $hDe) AND $hFr > 0 THEN 'fr'
       |     WHEN $hEs >= $hDe AND $hEs > 0 THEN 'es'
       |     WHEN $hDe > 0 THEN 'de'
       |     ELSE 'unknown' END""".stripMargin

  /** Its SQL twin (expression over a relation exposing `text`). */
  private[operators] def predictedSqlExpr: String =
    predictedSqlFrom(hitsSql(enM), hitsSql(frM), hitsSql(esM), hitsSql(deM))

  /** The per-doc rarity-sorted shingle relation the PPJoin stages
    * share: same md5-word shingle relation as text_ngram_jaccard
    * (16-byte join keys, tokenize-once), each doc's shingles in
    * global (df, h1, h2) ascending-rarity order, arrays bounded by
    * the doc's own shingle count. */
  def ppjoinSorted(docs: DataFrame): DataFrame = {
    // r16: packed single-long shingle keys (guide §2.3 narrower types —
    // the rarity order ties now break on the packed key instead of the
    // (h1, h2) pair; ANY deterministic global order keeps the prefix
    // theorem's completeness, and the exact verify fixes the pair set,
    // so the output is unchanged), and ONE exchange for the distinct +
    // df aggregate + df join-back (guide §2.4): repartition(w) first —
    // {w} satisfies the distinct's (doc_id, w) clustering, the df
    // groupBy(w), and the equi-join on w, so only the final per-doc
    // collect pays a second shuffle.
    val sh = Dedup.tokenized(docs)
      .select(col("doc_id"), explode(expr(Dedup.shingleKeysTransform)).as("w"))
      .distinct() // free: tokenized's doc_id partitioning satisfies (doc_id, w)
      .repartition(col("w")) // so the w-exchange carries DISTINCT rows only
    val df_ = sh.groupBy(col("w")).agg(count(lit(1)).as("df"))
    sh.join(df_, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("st"))
      .select(col("doc_id"),
        expr("transform(st, s -> s.w)").as("tks"),
        size(col("st")).cast("long").as("n"))
  }

  /** PPJoin candidate pairs from the prefix equi-join. With
    * `lengthFilter` on (the production setting), the Bayardo et al.
    * 2007 §3.1 length bound rides the join: J(x,y) ≥ τ forces
    * τ·|y| ≤ |x| (for |x| ≤ |y|), integer form 10·min(na,nb) ≥
    * 7·max(na,nb) — a pair whose sizes already rule out τ never
    * reaches the distinct or the verify. The prefix rows carry the
    * doc's shingle count for it (one long per row); the filter
    * evaluates inside the equi-join's post-match predicate, cutting
    * candidates BEFORE the distinct's shuffle. Exposed (with the
    * toggle) so QueriesSpec can assert the cut preserves the final
    * pair set and measurably shrinks the candidate count. */
  def ppjoinCandidates(sorted: DataFrame, lengthFilter: Boolean = true): DataFrame = {
    val prefix = sorted.select(col("doc_id"), col("n"),
      explode(expr("slice(tks, 1, cast(n - (7 * n + 9) div 10 + 1 as int))")).as("p"))
    val lengthOk =
      if (lengthFilter)
        lit(10) * least(col("a.n"), col("b.n")) >= lit(7) * greatest(col("a.n"), col("b.n"))
      else lit(true)
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.p") === col("b.p")
          && col("a.doc_id") < col("b.doc_id") && lengthOk)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** L28 — the full exact PPJoin: rarity-ordered prefixes → length-
    * filtered candidate equi-join → exact array_intersect verify with
    * the integer τ gate. See the QueryDef commentary for the
    * completeness argument. */
  def ppjoin(docs: DataFrame): DataFrame = {
    // localCheckpoint (the pareto_class/dedup_audit rule): `sorted` is
    // the expensive tokenize→distinct→df→sort pipeline and feeds FOUR
    // plan branches (both prefix sides of the candidate join, both
    // verify join-backs) — uncheckpointed it is evaluated once per
    // branch
    val sorted = ppjoinSorted(docs).stage()
    ppjoinVerify(sorted, ppjoinCandidates(sorted))
  }

  /** text_ppjoin's verify stage over an explicit candidate set —
    * lets QueriesSpec prove the length filter drops no true pair. */
  def ppjoinVerify(sorted: DataFrame, cands: DataFrame): DataFrame =
    cands
      .join(sorted.select(col("doc_id").as("doc_a"),
        col("tks").as("ta"), col("n").as("na")), "doc_a")
      .join(sorted.select(col("doc_id").as("doc_b"),
        col("tks").as("tb"), col("n").as("nb")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(lit(10) * col("n_common") >= lit(7) * (col("na") + col("nb") - col("n_common")))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        quant6(col("n_common").cast("double")
          / (col("na") + col("nb") - col("n_common")).cast("double")).as("jaccard"))

  val defs: Seq[QueryDef] = Seq(

    // L10 — token counting: whitespace tokens, uniques, BPE-ish estimate.
    QueryDef(
      "text_tokens",
      """SELECT doc_id, lang,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
        |FROM documents""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_unique"),
        length(col("text")).cast("long").as("n_chars"),
        ceil(length(col("text")) / 4.0).cast("long").as("n_bpe_est"))
    },

    // L8 — language ID: marker-hit argmax with deterministic tie-break.
    QueryDef(
      "text_langid",
      s"""SELECT doc_id, lang,
         |       CAST(h_en AS BIGINT) AS h_en, CAST(h_fr AS BIGINT) AS h_fr,
         |       CAST(h_es AS BIGINT) AS h_es, CAST(h_de AS BIGINT) AS h_de,
         |       ${predictedSqlFrom("h_en", "h_fr", "h_es", "h_de")} AS predicted
         |FROM (SELECT doc_id, lang,
         |             ${hitsSql(enM)} AS h_en, ${hitsSql(frM)} AS h_fr,
         |             ${hitsSql(esM)} AS h_es, ${hitsSql(deM)} AS h_de
         |      FROM documents) t""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          hits(enM).cast("long").as("h_en"), hits(frM).cast("long").as("h_fr"),
          hits(esM).cast("long").as("h_es"), hits(deM).cast("long").as("h_de"))
        .withColumn("predicted",
          predictedFrom(col("h_en"), col("h_fr"), col("h_es"), col("h_de")))
    },

    // L9 — quality scoring: length/stopword/avg-token-length ratios.
    QueryDef(
      "text_quality",
      s"""SELECT doc_id,
         |       CAST(n_tok AS BIGINT) AS n_tokens,
         |       floor((CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_tok) * 1000000.0) / 1000000.0 AS avg_tok_len,
         |       floor((CAST(h_stop AS DOUBLE) / n_tok) * 1000000.0) / 1000000.0 AS stop_ratio,
         |       floor(${qualitySqlFrom("n_tok", "h_stop")} * 1000000.0) / 1000000.0 AS quality
         |FROM (SELECT doc_id, text,
         |             len(string_split(text, ' ')) AS n_tok,
         |             ${hitsSql(stopwords)} AS h_stop
         |      FROM documents) t""".stripMargin) { (spark, dir) =>
      scoreQuality(Tables.documents(spark, dir))
    },

    // L28 — set-similarity join with PREFIX FILTERING (the PPJoin-lite
    // of Chaudhuri et al. 2006 / Xiao et al. 2008) over 5-gram
    // shingle sets, Jaccard ≥ 0.7, NO blocking attribute and NO LSH:
    // the third candidate-generation strategy beside dedup_minhash's
    // band keys and text_ngram_jaccard's source blocks — and this one
    // is EXACT (no probabilistic recall). Shingles get a GLOBAL
    // rarity order (ascending document frequency, hash tiebreak);
    // each doc exposes only its first p = n − ceil(0.7·n) + 1 rarest
    // shingles. The theorem: J(x,y) ≥ τ forces overlap o ≥ ceil(τ·|x|)
    // and ≥ ceil(τ·|y|), and the smallest common shingle in the
    // global order then sits within BOTH prefixes (position ≤
    // |·| − o + 1 ≤ p), so the prefix⋈prefix equi-join is COMPLETE.
    // Because the order is ascending-df, join keys are the RARE
    // shingles — boilerplate sorts to the suffix and never generates
    // candidates, the viral-shingle problem blocking itself. Verify
    // is exact per-pair array_intersect (arrays bounded by doc
    // length); the τ gate is the INTEGER cross-multiplication
    // 10·o ≥ 7·union and the prefix length is (7n+9) div 10 — no
    // floating-point boundary anywhere. The oracle runs the OTHER
    // algorithm (brute-force shingle join over all pairs) — same
    // output, different plan, the fuzzy_match rule.
    QueryDef(
      "text_ppjoin",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i.i + 1:i.i + 5], ' ') AS shingle
         |       FROM t, generate_series(0, ${Dedup.MaxShingleStarts - 1}) i(i)
         |       WHERE i.i <= greatest(len(tk) - 5, 0)),
         |ns AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |j AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_common
         |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, CAST(n_common AS BIGINT) AS n_common,
         |       floor((CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE)) * 1000000.0) / 1000000.0 AS jaccard
         |FROM j JOIN ns na ON na.doc_id = j.da JOIN ns nb ON nb.doc_id = j.db
         |WHERE 10 * n_common >= 7 * (na.n + nb.n - n_common)""".stripMargin) { (spark, dir) =>
      ppjoin(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    },

    // L29 — weighted (PPS) sampling for training-mix construction:
    // systematic probability-proportional-to-size selection — one doc
    // per 4096-token stride of the md5-shuffled corpus, so a doc's
    // selection probability is proportional to its length and the
    // sample is DETERMINISTIC (same corpus → same sample, the
    // text_sample reproducibility rule extended to weights). The
    // classic weighted-reservoir alternative (exponential clocks,
    // u^(1/w) keys) needs ln/pow — libm drift, unhashable; systematic
    // PPS needs only an ordered prefix sum and integer division:
    // select iff the doc's cumulative interval (c−w, c] crosses a
    // stride multiple, i.e. c div 4096 > (c−w) div 4096. The global
    // running sum is `Distributed.globalRunning` (range shards +
    // broadcast offsets — a plain ORDER BY window would drag the
    // corpus through one reducer); the md5 order decorrelates
    // position from content. Passenger columns (lang) join back by
    // doc_id per the primitive's contract.
    QueryDef(
      "text_pps_sample",
      """WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS w,
        |                  md5(CAST(doc_id AS VARCHAR)) AS m
        |           FROM documents),
        |c AS (SELECT doc_id, lang, w,
        |             SUM(w) OVER (ORDER BY m, doc_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |      FROM d)
        |SELECT doc_id, lang, CAST(w AS BIGINT) AS n_tokens,
        |       CAST(c AS BIGINT) AS cum_tokens,
        |       CAST(c // 4096 AS BIGINT) AS sample_idx
        |FROM c WHERE c // 4096 > (c - w) // 4096""".stripMargin) { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val d = docs.select(
        lit("all").as("g"),
        md5(col("doc_id").cast("string")).as("m"),
        col("doc_id"),
        size(toks).cast("long").as("w"))
      Distributed.globalRunning(d, grp = Seq("g"), ord = Seq("m", "doc_id"),
          valueCol = Some("w"))
        .filter(expr("g_run div 4096 > (g_run - w) div 4096"))
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("w").as("n_tokens"),
          col("g_run").cast("long").as("cum_tokens"),
          expr("g_run div 4096").cast("long").as("sample_idx"))
    },

    // L29b — RECENCY-weighted PPS sampling: the freshness knob real
    // training mixes carry (r15 verdict task 7b) on L29's systematic
    // machinery — selection probability ∝ tokens × a per-SOURCE age
    // decay, so a fresh crawl snapshot is oversampled against a stale
    // one at the same length. The decay is EXACT RATIONAL arithmetic,
    // never a float pow(): age buckets into weeks, the half-life-1-week
    // factor 2^(−weeks) becomes an integer effective weight in
    // EIGHTH-tokens, ew = w · (8 >> min(weeks, 3)) — the whole
    // cumulative line stays in BIGINT and the stride comparison cannot
    // drift between engines (the events_ks_drift rule). The per-source
    // age is synthesized from md5(source) because documents carries no
    // crawl-date column (the url_canonical scaffolding rule — the
    // decay pipeline is the product; a real caller joins a snapshot
    // table). Stride 32768 eighth-tokens = 4096 effective tokens, so
    // the zero-decay case degenerates to exactly L29's selection.
    QueryDef(
      "text_recency_sample",
      """WITH d AS (SELECT doc_id, lang, source,
        |                  len(string_split(text, ' ')) AS w,
        |                  CAST('0x' || substr(md5('age_' || source), 1, 2) AS BIGINT) % 28 AS age_days,
        |                  md5(CAST(doc_id AS VARCHAR)) AS m
        |           FROM documents),
        |e AS (SELECT doc_id, lang, source, w, age_days,
        |             w * (CASE age_days // 7 WHEN 0 THEN 8 WHEN 1 THEN 4
        |                                     WHEN 2 THEN 2 ELSE 1 END) AS ew, m
        |      FROM d),
        |c AS (SELECT doc_id, lang, source, w, age_days, ew,
        |             SUM(ew) OVER (ORDER BY m, doc_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |      FROM e)
        |SELECT doc_id, lang, source, CAST(w AS BIGINT) AS n_tokens,
        |       CAST(age_days AS BIGINT) AS age_days,
        |       CAST(ew AS BIGINT) AS eff_w8,
        |       CAST(c AS BIGINT) AS cum_w8,
        |       CAST(c // 32768 AS BIGINT) AS sample_idx
        |FROM c WHERE c // 32768 > (c - ew) // 32768""".stripMargin) { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val age = conv(substring(md5(concat(lit("age_"), col("source"))), 1, 2), 16, 10)
        .cast("long") % 28
      // passenger columns (lang, source, …) join back by doc_id per
      // the globalRunning single-range-shuffle contract (the L29 rule)
      val base = docs.select(col("doc_id"), col("lang"), col("source"),
        size(toks).cast("long").as("n_tokens"), age.as("age_days"))
      val d = base.select(
        lit("all").as("g"),
        md5(col("doc_id").cast("string")).as("m"),
        col("doc_id"),
        (col("n_tokens") * when(col("age_days") < 7, 8L)
          .when(col("age_days") < 14, 4L)
          .when(col("age_days") < 21, 2L)
          .otherwise(1L)).as("w"))
      Distributed.globalRunning(d, grp = Seq("g"), ord = Seq("m", "doc_id"),
          valueCol = Some("w"))
        .filter(expr("g_run div 32768 > (g_run - w) div 32768"))
        .join(base, "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
          col("age_days"), col("w").as("eff_w8"),
          col("g_run").cast("long").as("cum_w8"),
          expr("g_run div 32768").cast("long").as("sample_idx"))
    },

    // L30 — training-mix construction to TOKEN BUDGETS: each language
    // contributes documents, in deterministic md5-shuffled order, until
    // its token budget is exhausted (en is upsampled 2×: 8192 tokens
    // vs 4096) — the mixture-weighting step that turns a filtered
    // corpus into a training mix with controlled source proportions.
    // Differs from text_sample (count quotas) and text_pps_sample
    // (selection ∝ length): here the BUDGET is in tokens, so the
    // sample's size is controlled in the unit that matters for
    // training. A doc is kept iff its cumulative interval STARTS
    // before the budget line (so the mix overshoots by at most one
    // document — deterministic, document-atomic). The per-lang running
    // sum is the range-sharded prefix primitive (lang is ~5 keys — the
    // exact low-cardinality-window case `Distributed.globalRunning`
    // exists for); the md5 order decorrelates position from content,
    // so the prefix IS a uniform sample of the language.
    QueryDef(
      "text_mixture",
      """WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS w,
        |                  md5(CAST(doc_id AS VARCHAR)) AS m
        |           FROM documents),
        |c AS (SELECT doc_id, lang, w,
        |             SUM(w) OVER (PARTITION BY lang ORDER BY m, doc_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |      FROM d)
        |SELECT doc_id, lang, CAST(w AS BIGINT) AS n_tokens,
        |       CAST(c AS BIGINT) AS cum_tokens
        |FROM c
        |WHERE c - w < CASE WHEN lang = 'en' THEN 8192 ELSE 4096 END""".stripMargin) { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val d = docs.select(
        col("lang"),
        md5(col("doc_id").cast("string")).as("m"),
        col("doc_id"),
        size(toks).cast("long").as("w"))
      Distributed.globalRunning(d, grp = Seq("lang"), ord = Seq("m", "doc_id"),
          valueCol = Some("w"))
        .filter(col("g_run") - col("w")
          < when(col("lang") === "en", 8192L).otherwise(4096L))
        .select(col("doc_id"), col("lang"), col("w").as("n_tokens"),
          col("g_run").cast("long").as("cum_tokens"))
    },

    // L31 — sliding-window CHUNKING: every document split into
    // 64-token chunks on a 48-token stride (16-token overlap) — the
    // preprocessing step every embedding/RAG pipeline runs before
    // vectorization, and the windowed view substring-dedup reasons
    // over. Pure map-side fan-out: sequence() generates each doc's
    // chunk starts (fan-out = the doc's own length ÷ stride, never
    // corpus-shaped), slice() takes the window, md5 fingerprints it
    // (the output carries hashes, not chunk text — 2 orders narrower
    // at 100 TB; a downstream embedder re-slices from the doc by
    // (doc_id, chunk_id)). A trailing start that adds no NEW tokens
    // beyond the previous chunk's window (fewer than overlap+1 tokens
    // remain) is suppressed on both sides — every token is covered,
    // no chunk is a subset of its predecessor.
    QueryDef(
      "text_chunks",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk,
        |                  len(string_split(text, ' ')) AS n
        |           FROM documents),
        |s AS (SELECT doc_id, tk, n, unnest(range(1, n + 1, 48)) AS s FROM d)
        |SELECT doc_id,
        |       CAST((s - 1) // 48 AS BIGINT) AS chunk_id,
        |       CAST(len(tk[s:s + 63]) AS BIGINT) AS n_tokens,
        |       md5(array_to_string(tk[s:s + 63], ' ')) AS chunk_hash
        |FROM s WHERE s = 1 OR n - s >= 16""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), toks.as("tk"), size(toks).as("n"))
        .select(col("doc_id"), col("tk"), col("n"),
          explode(expr("sequence(1, n, 48)")).as("s"))
        .filter(col("s") === 1 || col("n") - col("s") >= 16)
        .select(col("doc_id"),
          expr("(s - 1) div 48").cast("long").as("chunk_id"),
          size(expr("slice(tk, s, 64)")).cast("long").as("n_tokens"),
          md5(array_join(expr("slice(tk, s, 64)"), " ")).as("chunk_hash"))
    },

    // L11 — document fingerprinting: content hash + prefix rolling hash.
    QueryDef(
      "text_fingerprint",
      """SELECT doc_id,
        |       md5(text) AS content_hash,
        |       md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_fp,
        |       substr(md5(lower(text)), 1, 16) AS short_fp
        |FROM documents""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"),
        md5(col("text")).as("content_hash"),
        md5(array_join(slice(toks, 1, 8), " ")).as("prefix_fp"),
        substring(md5(lower(col("text"))), 1, 16).as("short_fp"))
    },

    // L4 — n-gram Jaccard with SOURCE-blocked candidates: the blocking
    // key is a data attribute instead of an LSH bucket (the other
    // candidate-generation strategy a pipeline mixes in). Pairs are
    // only ever formed within a block — no cross join. A shingle whose
    // within-source doc frequency exceeds Dedup.MaxBucketDocs is
    // boilerplate, not similarity evidence: it is dropped from the
    // shingle SETS on both engines, which bounds the per-join-key
    // fan-out (a viral shingle inside one source would otherwise
    // produce quadratic candidates within that block).
    QueryDef(
      "text_ngram_jaccard",
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source, array_to_string(tk[i.i + 1:i.i + 5], ' ') AS shingle
        |       FROM t, generate_series(0, ${Dedup.MaxShingleStarts - 1}) i(i)
        |       WHERE i.i <= greatest(len(tk) - 5, 0)),
        |hot AS (SELECT source, shingle FROM sh
        |        GROUP BY source, shingle HAVING COUNT(*) > ${Dedup.MaxBucketDocs}),
        |shc AS (SELECT sh.* FROM sh WHERE NOT EXISTS
        |        (SELECT 1 FROM hot WHERE hot.source = sh.source AND hot.shingle = sh.shingle)),
        |ns AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
        |j AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_common
        |      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.source = b.source
        |                           AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT j.da AS doc_a, j.db AS doc_b, CAST(j.n_common AS BIGINT) AS n_common,
        |       floor((CAST(j.n_common AS DOUBLE) / (na.n + nb.n - j.n_common)) * 1000000.0) / 1000000.0 AS jaccard
        |FROM j JOIN ns na ON na.doc_id = j.da JOIN ns nb ON nb.doc_id = j.db
        |WHERE CAST(j.n_common AS DOUBLE) / (na.n + nb.n - j.n_common) >= 0.5""".stripMargin) {
      (spark, dir) =>
        // cap matches the oracle's generate_series(0, 4095); cached —
        // the hot list, ns, and both join sides consume this
        // explode+md5 stage.
        // Tokenize once + repartition first (Dedup.tokenized rationale:
        // per-element split re-evaluation, single-file scan parallelism).
        // shingles ride as their two 32-bit md5 words, never the hex
        // string: every downstream shuffle (hot-key agg, anti-join,
        // self-join) keys on 16 bytes instead of a 32-char string —
        // the minhash rule (Dedup.shingleWords); the oracle joins
        // strings, and the results agree unless md5's 64-bit prefix
        // collides (~2^32 shingles). Measured at sf0.1: 48 → 20
        // shuffle MB (the byte count is the scale win; local wall
        // time stays at its ~1.7s steady state).
        // r16: packed single-long shingle keys (half the key bytes
        // through every shuffle below — guide §2.3) and ONE exchange
        // for the distinct + hot-key aggregate + anti-join + self-join
        // (guide §2.4): repartition by the join key (source, w) BEFORE
        // the distinct — {source, w} satisfies the distinct's
        // (doc_id, source, w) clustering, and every downstream keyed
        // op below is on exactly (source, w), so only ns (doc_id) and
        // the pair aggregate pay their own shuffles.
        val sh = Dedup.tokenized(
          Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text")))
          .select(col("doc_id"), col("source"),
            explode(expr(Dedup.shingleKeysTransform)).as("w"))
          .distinct() // free under tokenized's doc_id partitioning
          .repartition(col("source"), col("w")) // distinct rows only
          .cache()
        // hot-shingle key set is corpus-shaped (∝ N/cap) — no explicit
        // broadcast; AQE broadcasts while small (minhash rationale)
        val hot = sh.groupBy(col("source"), col("w")).agg(count(lit(1)).as("nd"))
          .filter(col("nd") > Dedup.MaxBucketDocs).select(col("source"), col("w"))
        val shc = sh.join(hot, Seq("source", "w"), "left_anti")
        val ns = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val j = shc.as("a")
          .join(shc.as("b"),
            col("a.w") === col("b.w")
              && col("a.source") === col("b.source")
              && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("n_common"))
        val jac = col("n_common").cast("double") /
          (col("na.n") + col("nb.n") - col("n_common"))
        j.join(ns.as("na"), col("na.doc_id") === col("da"))
          .join(ns.as("nb"), col("nb.doc_id") === col("db"))
          .filter(jac >= 0.5)
          .select(col("da").as("doc_a"), col("db").as("doc_b"),
            col("n_common").cast("long").as("n_common"),
            quant6(jac).as("jaccard"))
    },

    // L14 — content filter: rule-based keep/drop with a reason column
    // (the safety/quality gate of a training pipeline). Pure per-row
    // expressions — a narrow map stage at any scale.
    QueryDef(
      "text_filter",
      s"""SELECT doc_id, lang,
         |       CASE WHEN length(text) < 200 THEN 'too_short'
         |            WHEN len(string_split(text, ' ')) < 30 THEN 'too_few_tokens'
         |            WHEN ${hitsSql(Seq("error", "slow"))} > 5 THEN 'marker_heavy'
         |            ELSE 'keep' END AS verdict
         |FROM documents""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"), col("lang"),
        when(length(col("text")) < 200, "too_short")
          .when(size(toks) < 30, "too_few_tokens")
          .when(hits(Seq("error", "slow")) > 5, "marker_heavy")
          .otherwise("keep").as("verdict"))
    },

    // L15 — deterministic stratified sampling (training-mix quotas):
    // md5(doc_id) buckets each doc into [0,100); a per-language rate
    // keeps that fraction. Reproducible across engines and runs — no
    // RNG state, no driver coordination.
    QueryDef(
      "text_sample",
      """SELECT lang,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM (SELECT lang,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket,
        |             CASE lang WHEN 'en' THEN 60 WHEN 'fr' THEN 30 ELSE 15 END AS rate
        |      FROM documents) t
        |GROUP BY lang""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("lang"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 100).as("bucket"),
          when(col("lang") === "en", 60).when(col("lang") === "fr", 30).otherwise(15).as("rate"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("bucket") < col("rate"), 1).otherwise(0)).cast("long").as("n_sampled"))
    },

    // L26 — substring-level duplication profiling (the distributed
    // seat of Lee et al. 2022, "Deduplicating Training Data Makes
    // Language Models Better": their suffix-array exact-substring pass
    // flags duplicated SPANS inside otherwise-unique documents, which
    // doc-level dedup can't see). The suffix array itself doesn't
    // distribute; the standard engine approximation is hashed fixed-k
    // token windows — a window hash appearing in ≥2 distinct docs
    // marks every occurrence a duplicated position, and the per-doc
    // duplicated-window fraction is the signal a span-cleaning pass
    // keys off. k=8 matches the decontamination gram size.
    //
    // Scale shape: window hashing is a map-only array expression over
    // the shared tokenized scan (one md5 per window, same transform
    // idiom as the minhash shingles); the (window, doc) partial agg
    // collapses within-doc repeats map-side; the window-frequency
    // relation joins back vocabulary-shaped (AQE-decided, no hint —
    // a viral window is AQE's skew case); the per-doc rollup is the
    // only other shuffle. Work ∝ corpus tokens, never pairs — unlike
    // the pairwise dedup family, this needs no candidate generation
    // at all, which is why span profiling is tractable where
    // span PAIR enumeration would not be.
    QueryDef(
      "text_substring_dedup", {
        val k = 8
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           |w AS (SELECT doc_id,
           |             unnest(list_transform(generate_series(0, greatest(len(tk) - $k, 0)),
           |               i -> md5(array_to_string(tk[i + 1:i + $k], ' ')))) AS wh
           |      FROM t),
           |g AS (SELECT wh, doc_id, COUNT(*) AS occ FROM w GROUP BY wh, doc_id),
           |dfw AS (SELECT wh, COUNT(*) AS ndocs FROM g GROUP BY wh),
           |d AS (SELECT g.doc_id, CAST(SUM(g.occ) AS BIGINT) AS n_windows,
           |             CAST(SUM(CASE WHEN dfw.ndocs >= 2 THEN g.occ ELSE 0 END) AS BIGINT) AS n_dup
           |      FROM g JOIN dfw USING (wh) GROUP BY g.doc_id)
           |SELECT doc_id, n_windows, n_dup,
           |       floor(CAST(n_dup AS DOUBLE) / n_windows * 1000000.0) / 1000000.0 AS dup_frac
           |FROM d""".stripMargin
      }) { (spark, dir) =>
      val k = 8
      // r16 optimization: window hashes ride as ONE packed 64-bit
      // md5-word key (codegen'd shingle_keys, maxStarts=MaxValue — this
      // operator is uncapped) instead of interpreted per-window
      // transform + 32-char hex strings; wh only ever tests EQUALITY
      // (group keys, the frequency join), so counts are unchanged up
      // to the 64-bit-prefix collision class the shingle family
      // already accepts (Dedup.hashWords).
      val w = Dedup.tokenized(Tables.documents(spark, dir))
        .select(col("doc_id"), explode(expr(
          s"shingle_keys(tk, $k, ${Int.MaxValue})")).as("wh"))
      val g = w.groupBy(col("wh"), col("doc_id")).agg(count(lit(1)).as("occ"))
      val dfw = g.groupBy(col("wh")).agg(count(lit(1)).as("ndocs"))
      g.join(dfw, "wh")
        .groupBy(col("doc_id"))
        .agg(sum(col("occ")).cast("long").as("n_windows"),
          sum(when(col("ndocs") >= 2, col("occ")).otherwise(0)).cast("long").as("n_dup"))
        .select(col("doc_id"), col("n_windows"), col("n_dup"),
          quant6(col("n_dup").cast("double") / col("n_windows")).as("dup_frac"))
    },

    // L1 — exact dedup: normalize → hash → keep-first per group.
    // At scale: one shuffle on the 128-bit text hash, never on raw
    // text — and never a WINDOW over the hash groups: a viral document
    // with a billion copies is one window partition through a single
    // reducer, while the min_by keeper selection below is a partial
    // aggregate that collapses each copy set map-side (doc_id is
    // unique, so min_by is deterministic).
    QueryDef(
      "dedup_exact",
      """WITH r AS (SELECT doc_id, source,
        |                  ROW_NUMBER() OVER (PARTITION BY md5(lower(text))
        |                                     ORDER BY doc_id) AS rn
        |           FROM documents)
        |SELECT source,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        |FROM r GROUP BY source""".stripMargin) { (spark, dir) =>
      val g = Tables.documents(spark, dir)
        .select(md5(lower(col("text"))).as("h"), col("doc_id"), col("source"))
      // keeper of each copy set = the row with the min doc_id; its
      // source is what the per-source kept count attributes
      val kept = g.groupBy(col("h"))
        .agg(min_by(col("source"), col("doc_id")).as("ksrc"))
        .groupBy(col("ksrc"))
        .agg(count(lit(1)).as("n_kept"))
      g.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(kept, col("source") === col("ksrc"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_docs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
    },

    // L41 — deterministic span-corruption preview (the T5/BERT
    // masking objective as a DATA-PIPELINE step): every token is
    // masked iff the first md5 nibble of (doc_id, position) falls in
    // {0, 1} — an exact 2/16 = 12.5% rate that is REPRODUCIBLE across
    // runs, engines, and partitionings (the ONLY acceptable
    // randomness in an oracle-checked pipeline; rand() would hash
    // differently every run). A pure per-row map stage: the token
    // array transforms in place (1-based positions shared with the
    // oracle), masked count and corrupted-text hash ride the same
    // projection, nothing shuffles. At 100 TB this runs at scan speed
    // and the trainer reads (doc_id, corrupted_hash) to verify its
    // own masking lines up with the pipeline's.
    QueryDef(
      "span_corrupt",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id,
        |             list_transform(range(1, len(tk) + 1), i ->
        |               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
        |                         IN ('0', '1') THEN '<X>' ELSE tk[i] END) AS ck,
        |             len(tk) AS n
        |      FROM t)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |       CAST(len(list_filter(ck, x -> x = '<X>')) AS BIGINT) AS n_masked,
        |       md5(array_to_string(ck, ' ')) AS corrupted_hash
        |FROM c""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .withColumn("ck", expr(
          """transform(sequence(1, size(tk)), i ->
            |  CASE WHEN substring(md5(concat(CAST(doc_id AS STRING), '_', CAST(i AS STRING))), 1, 1)
            |            IN ('0', '1') THEN '<X>' ELSE element_at(tk, i) END)""".stripMargin))
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
          size(expr("filter(ck, x -> x = '<X>')")).cast("long").as("n_masked"),
          md5(array_join(col("ck"), " ")).as("corrupted_hash"))
    })
}
