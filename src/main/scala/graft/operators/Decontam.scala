package graft.operators

import graft.QueryDef
import graft.functions.Portable.quant6
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators (SURVEY.md §2.3 L20–L21): benchmark
  * decontamination and within-document repetition metrics — two
  * filters every LLM training-data pipeline runs before training
  * (n-gram overlap decontamination and the repetition rules of Rae et
  * al., "Scaling Language Models: ... Gopher", 2021, §A1.1).
  *
  * Scale shape:
  *  - text_contamination: the benchmark n-gram set is the SMALL side
  *    by construction → one broadcast of its hashed 8-grams against
  *    the corpus 8-gram stream (at real scale the broadcast becomes a
  *    bloom filter, same plan shape); per-doc gram counts ride along
  *    map-side (array size before the explode), so the only shuffle
  *    is the per-doc hit aggregation, sized by the HITS, not the
  *    corpus.
  *  - text_repetition: no keyed aggregation anywhere — the
  *    top/duplicate 2-gram fractions are computed per row with a sort
  *    + single-pass `aggregate` lambda over the gram array (codegen'd
  *    builtins, no UDF); the only exchange is `tokenized`'s
  *    parallelism repartition, so the filter runs at scan speed on
  *    any corpus size.
  */
object Decontam {

  private val GramLen = 8

  /** Benchmark membership: docs whose md5(doc_id) starts with '0'
    * (~1/16 of the corpus) stand in for a held-out eval set; md5 keeps
    * the split bit-identical in the oracle (SURVEY.md §4). */
  private[operators] val isBench = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"

  /** Distinct hashed 8-grams of every doc as a per-doc ARRAY
    * (map-side). Cached: the benchmark branch and the corpus branch of
    * each consumer both read it — one tokenize+md5 pass instead of
    * two. */
  private def gramArrays(spark: SparkSession, dir: String): DataFrame =
    gramArraysFrom(Dedup.tokenized(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))).cache()

  /** Same, over a caller-provided (doc_id, tk) relation (corpus_keep
    * shares one tokenized scan; the caller owns caching). */
  private[operators] def gramArraysFrom(tok: DataFrame): DataFrame =
    // r16 optimization (guide §2.3 "narrower types" + §1.2 step 2):
    // grams ride as ONE packed 64-bit md5-word key (shingle_keys —
    // (h1 << 32) | h2, the codegen'd fused form) instead of the
    // 32-char md5 HEX string built by an interpreted per-element
    // transform. Every consumer only ever tests gram EQUALITY
    // (membership joins, distinct, counts), and the packed key is a
    // bijection of the word pair, so results are unchanged up to a
    // 64-bit md5-prefix collision — the same accepted class the whole
    // minhash/shingle family already keys on (Dedup.hashWords).
    tok.select(col("doc_id"),
      array_distinct(expr(
        s"shingle_keys(tk, $GramLen, ${Dedup.MaxShingleStarts})")).as("gs"))

  /** Non-benchmark doc_ids sharing >= 1 hashed 8-gram with the
    * benchmark split — the flag set corpus_keep gates on. Same plan
    * shape as text_contamination (broadcast benchmark grams). */
  private[operators] def contaminatedDocIdsFrom(grams: DataFrame): DataFrame = {
    val bench = grams.filter(isBench)
      .select(explode(col("gs")).as("g")).distinct()
    grams.filter(!isBench)
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .join(broadcast(bench), "g")
      .select(col("doc_id")).distinct()
  }

  /** The bloom twin of [[contaminatedDocIdsFrom]] — identical output
    * (the exact keyed verify removes the bloom's false positives),
    * built for the corpus_keep strategy where the benchmark gram set
    * outgrows a broadcast: a fixed-size `bloom_filter_agg` scalar
    * gates the corpus gram stream at scan speed, then the keyed
    * verify join is sized by the survivors. Same machinery as
    * text_contamination_bloom. */
  private[operators] def contaminatedDocIdsBloomFrom(
      spark: SparkSession, grams: DataFrame): DataFrame = {
    graft.functions.VecExpressions.register(spark) // might_contain
    val bench = grams.filter(isBench)
      .select(explode(col("gs")).as("g")).distinct()
    bench.createOrReplaceTempView("graft_bench_grams_keep")
    grams.filter(!isBench)
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .filter(expr(
        "might_contain((SELECT bloom_filter_agg(xxhash64(g)) FROM graft_bench_grams_keep), xxhash64(g))"))
      .join(bench.hint("shuffle_hash"), "g")
      .select(col("doc_id")).distinct()
  }

  /** Oracle CTEs ending in `contam(doc_id)` — the SQL twin of
    * [[contaminatedDocIdsFrom]]; CTE names are prefixed `c` to compose
    * with the dedup chain inside corpus_keep. */
  private[operators] val contamCtes: String =
    s"""ct AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |cg AS (SELECT DISTINCT doc_id, array_to_string(tk[i.i + 1:i.i + $GramLen], ' ') AS g
       |       FROM ct, generate_series(0, ${Dedup.MaxShingleStarts - 1}) i(i)
       |       WHERE i.i <= greatest(len(tk) - $GramLen, 0)),
       |cb AS (SELECT DISTINCT g FROM cg
       |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
       |contam AS (SELECT DISTINCT cg.doc_id FROM cg JOIN cb ON cb.g = cg.g
       |           WHERE substr(md5(CAST(cg.doc_id AS VARCHAR)), 1, 1) <> '0')""".stripMargin

  /** The run-length scan behind text_repetition's dup-2-gram fraction,
    * as a raw SQL expression over a `tk` token-array column; shared
    * with corpus_keep. Returns struct(best, dup). */
  private[operators] val runScanExpr: String =
    s"""aggregate(
       |  array_sort(transform(sequence(0, least(size(tk) - 2, ${Dedup.MaxShingleStarts - 1})), i -> concat(tk[i], ' ', tk[i + 1]))),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT),
       |               'best', CAST(0 AS BIGINT), 'dup', CAST(0 AS BIGINT)),
       |  (acc, x) -> IF(x <=> acc.prev,
       |    named_struct('prev', x, 'run', acc.run + 1, 'best', acc.best, 'dup', acc.dup),
       |    named_struct('prev', x, 'run', CAST(1 AS BIGINT),
       |                 'best', greatest(acc.best, acc.run),
       |                 'dup', acc.dup + IF(acc.run > 1, acc.run, CAST(0 AS BIGINT)))),
       |  acc -> named_struct(
       |    'best', greatest(acc.best, acc.run),
       |    'dup', acc.dup + IF(acc.run > 1, acc.run, CAST(0 AS BIGINT))))""".stripMargin

  /** Shared oracle for both decontamination variants: the bloom path
    * is a pre-filter whose false positives are removed by an exact
    * verify join, so its output is bit-identical to the broadcast
    * path and both replay the same exact SQL. */
  private val contaminationOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |g AS (SELECT DISTINCT doc_id, array_to_string(tk[i.i + 1:i.i + $GramLen], ' ') AS g
         |      FROM t, generate_series(0, ${Dedup.MaxShingleStarts - 1}) i(i)
         |      WHERE i.i <= greatest(len(tk) - $GramLen, 0)),
         |b AS (SELECT DISTINCT g FROM g
         |      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
         |ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
         |h AS (SELECT g.doc_id, COUNT(*) AS n_hits
         |      FROM g JOIN b ON b.g = g.g
         |      WHERE substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 1) <> '0'
         |      GROUP BY g.doc_id)
         |SELECT h.doc_id, CAST(h.n_hits AS BIGINT) AS n_hits,
         |       CAST(ng.n_grams AS BIGINT) AS n_grams,
         |       floor(CAST(h.n_hits AS DOUBLE) / ng.n_grams * 1000000.0) / 1000000.0 AS hit_frac
         |FROM h JOIN ng ON ng.doc_id = h.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // L20 — decontamination: flag corpus docs sharing any 8-gram with
    // the benchmark split; report absolute and relative overlap.
    QueryDef("text_contamination", contaminationOracle) { (spark, dir) =>
      // per-doc gram arrays, shared+cached; the per-doc gram count
      // rides along map-side so no second corpus aggregation
      val grams = gramArrays(spark, dir)
      val bench = grams.filter(isBench)
        .select(explode(col("gs")).as("g")).distinct()
      grams.filter(!isBench)
        .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
          explode(col("gs")).as("g"))
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id"), col("n_grams"))
        .agg(count(lit(1)).as("n_hits"))
        .select(col("doc_id"), col("n_hits"), col("n_grams"),
          quant6(col("n_hits").cast("double") / col("n_grams")).as("hit_frac"))
    },

    // L20b — the at-scale seat of text_contamination: when the
    // benchmark gram set outgrows a comfortable broadcast, build ONE
    // fixed-size bloom filter over it (`bloom_filter_agg` scalar
    // subquery — ~1 MB regardless of benchmark size, shipped once per
    // executor exactly like Spark's own AQE runtime filters), stream
    // the corpus gram stream through the codegen'd `might_contain`
    // probe at scan speed, and remove the false positives with an
    // exact KEYED verify join sized by the bloom survivors, not the
    // corpus. Output is bit-identical to the broadcast path — both
    // variants replay the same exact oracle, and QueriesSpec asserts
    // the equivalence directly. xxhash64 feeds only the bloom (a
    // pre-filter that cannot change the output), so the md5-only
    // oracle rule is not in play.
    QueryDef("text_contamination_bloom", contaminationOracle) { (spark, dir) =>
      graft.functions.VecExpressions.register(spark) // might_contain
      val grams = gramArrays(spark, dir)
      val bench = grams.filter(isBench)
        .select(explode(col("gs")).as("g")).distinct()
      bench.createOrReplaceTempView("graft_bench_grams")
      grams.filter(!isBench)
        .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
          explode(col("gs")).as("g"))
        .filter(expr(
          "might_contain((SELECT bloom_filter_agg(xxhash64(g)) FROM graft_bench_grams), xxhash64(g))"))
        // shuffle_hash hint: this path models a benchmark too big to
        // broadcast, so the verify must stay a keyed join even where
        // AQE would happily broadcast the local test set
        .join(bench.hint("shuffle_hash"), "g")
        .groupBy(col("doc_id"), col("n_grams"))
        .agg(count(lit(1)).as("n_hits"))
        .select(col("doc_id"), col("n_hits"), col("n_grams"),
          quant6(col("n_hits").cast("double") / col("n_grams")).as("hit_frac"))
    },

    // L21 — Gopher-style repetition: per-doc fraction of all 2-grams
    // taken by the most frequent one, and by 2-grams occurring more
    // than once. Sorted-array run-length scan in ONE aggregate lambda.
    QueryDef(
      "text_repetition",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT doc_id, tk[i.i + 1] || ' ' || tk[i.i + 2] AS g
        |      FROM t, generate_series(0, ${Dedup.MaxShingleStarts - 1}) i(i)
        |      WHERE len(tk) >= 2 AND i.i <= len(tk) - 2),
        |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
        |m AS (SELECT doc_id, MAX(c) AS best, SUM(c) AS tot,
        |             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, CAST(tot AS BIGINT) AS n_2grams,
        |       floor(CAST(best AS DOUBLE) / tot * 1000000.0) / 1000000.0 AS top2_frac,
        |       floor(CAST(dup AS DOUBLE) / tot * 1000000.0) / 1000000.0 AS dup2_frac
        |FROM m""".stripMargin) { (spark, dir) =>
      Dedup.tokenized(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"),
          least(size(col("tk")) - 1, lit(Dedup.MaxShingleStarts)).cast("long").as("n_2grams"),
          expr(runScanExpr).as("rs"))
        .select(col("doc_id"), col("n_2grams"),
          quant6(col("rs.best").cast("double") / col("n_2grams")).as("top2_frac"),
          quant6(col("rs.dup").cast("double") / col("n_2grams")).as("dup2_frac"))
    })
}
