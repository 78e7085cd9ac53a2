package graft.operators

import graft.QueryDef
import graft.functions.Portable
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-corpus provenance operators (SURVEY.md §2.3 L47, L49): URL
  * canonicalization + URL-level dedup — the FIRST pass of every
  * crawl-derived training pipeline (the same page arrives as
  * `HTTPS://WWW.x.com:443/a/?utm_source=feed#top` and
  * `https://x.com/a/?id=1` across crawls; text-level dedup should
  * never pay for what a string normalization resolves) — and the
  * cross-source shingle-overlap matrix that tells a mixture designer
  * which sources are actually the same corpus wearing two names.
  *
  * Scale shapes:
  *  - url_canonical: the normalization is a per-row chain of
  *    regexp/array builtins (codegen'd, zero shuffle) and the dedup is
  *    ONE hash aggregate on the canonical key — count + min ride the
  *    same partial, so the shuffle carries one row per distinct URL.
  *  - source_overlap: per-source DISTINCT shingle sets (the minhash
  *    family's md5-word representation — two longs shuffle, not
  *    5-token strings), then a self-join keyed on the shingle hash.
  *    Per-shingle fan-out is bounded by |sources|²/2 — a DOMAIN bound,
  *    not a corpus bound (20 sources → ≤190 pairs per shingle at any
  *    N) — and the output is the ≤|sources|² matrix. The |sources|-row
  *    count table broadcasts like any dimension.
  *
  * The documents table carries no URL column, so `url_canonical`
  * derives a deterministic messy URL per doc (case noise, optional
  * www/:443/trailing slash, tracking params, fragment) from doc_id —
  * harness scaffolding exactly like Similarity.defaultQueries: the
  * NORMALIZATION chain is the product, the synthesis is not. One
  * definition string feeds both engines (Spark and DuckDB both accept
  * the shared SQL dialect used here; only split/array_join names
  * differ and are parameterized).
  */
object Web {

  /** The messy-URL synthesis, shared verbatim by both engines. */
  private val rawUrlSql: String =
    "CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END || '://' || " +
      "CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END || source || '.Example.COM' || " +
      "CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END || " +
      "'/articles/' || CAST(doc_id % 25 AS STRING) || " +
      "CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END || " +
      "'?utm_source=feed&id=' || CAST(doc_id % 4 AS STRING) || '&ref=rss' || " +
      "CASE WHEN doc_id % 2 = 1 THEN '#sec' ELSE '' END"

  /** Canonicalization chain over a `url` column, as SQL shared by both
    * engines modulo two function names (Spark split/array_join vs
    * DuckDB string_split/array_to_string). Rules — the standard
    * crawl-frontier set: drop the fragment; lowercase scheme and host;
    * strip default ports (:443/:80) and a leading `www.`; trim
    * trailing slashes from the path; drop tracking params (`utm*`,
    * `ref=`) keeping the rest in order. */
  private def canonicalSql(splitFn: String, joinFn: String): String = {
    // regex literals use [.] / [?] character classes instead of
    // backslash escapes: Spark SQL string literals process backslashes
    // and DuckDB's do not, so any '\x' escape would mean different
    // regexes in the two engines — classes parse identically in both
    val noFrag = "regexp_replace(url, '#.*$', '')"
    val scheme = s"lower(regexp_extract($noFrag, '^([A-Za-z]+)://', 1))"
    val host = "regexp_replace(regexp_replace(" +
      s"lower(regexp_extract($noFrag, '^[A-Za-z]+://([^/]+)', 1)), " +
      "':(443|80)$', ''), '^www[.]', '')"
    val path = s"regexp_replace(regexp_extract($noFrag, '^[A-Za-z]+://[^/]+([^?#]*)', 1), '/+$$', '')"
    val query = s"$joinFn(filter($splitFn(regexp_extract($noFrag, '[?]([^#]*)', 1), '&'), " +
      "p -> NOT (p LIKE 'utm%' OR p LIKE 'ref=%')), '&')"
    s"$scheme || '://' || $host || $path || " +
      s"CASE WHEN $query = '' THEN '' ELSE '?' || $query END"
  }

  /** MinHash lanes per source sketch — granularity 1/24 on the Jaccard
    * estimate; sketch state is 24 longs per source at ANY corpus size. */
  private val SketchHashes = 24

  val defs: Seq[QueryDef] = Seq(

    // L47 — URL canonicalization + URL-level dedup: normalize, then
    // ONE aggregate on the canonical key (n_docs + keeper=min doc_id
    // share the partial). Everything before the aggregate is per-row
    // codegen'd string work — the whole operator is a single shuffle
    // of one row per distinct canonical URL.
    QueryDef(
      "url_canonical",
      s"""WITH u AS (SELECT doc_id, $rawUrlSql AS url FROM documents),
         |c AS (SELECT doc_id, ${canonicalSql("string_split", "array_to_string")} AS canonical_url FROM u)
         |SELECT canonical_url, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
         |FROM c GROUP BY canonical_url""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("url", expr(rawUrlSql))
        .withColumn("canonical_url", expr(canonicalSql("split", "array_join")))
        .groupBy(col("canonical_url"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
    },

    // L49 — cross-source shingle-overlap matrix: exact Jaccard between
    // each source pair's DISTINCT 5-token shingle sets. The join keys
    // on the shingle (md5 words on the Spark side, strings in the
    // oracle — the minhash family convention); per-key fan-out is
    // bounded by the SOURCE DOMAIN, never the corpus, and the result
    // is the ≤|sources|² mixture-planning matrix. Only pairs sharing
    // ≥1 shingle appear (inner-join semantics, both engines).
    QueryDef(
      "source_overlap",
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
         |sh AS (SELECT DISTINCT source, array_to_string(tk[i.i + 1:i.i + ${Dedup.ShingleLen}], ' ') AS shingle
         |       FROM t, generate_series(0, ${Dedup.MaxShingleStarts - 1}) i(i)
         |       WHERE i.i <= greatest(len(tk) - ${Dedup.ShingleLen}, 0)),
         |ns AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
         |co AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
         |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT co.source_a, co.source_b, co.n_common,
         |       ${Portable.Quant6Sql("CAST(co.n_common AS DOUBLE) / (na.n + nb.n - co.n_common)")} AS jaccard
         |FROM co JOIN ns na ON na.source = co.source_a
         |        JOIN ns nb ON nb.source = co.source_b""".stripMargin) { (spark, dir) =>
      val tok = Dedup.tokenized(
        Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text")))
      // r16: packed single-long shingle keys; repartition(w) before the
      // distinct so the distinct and the self-join (equi-key w only —
      // source is an inequality here) share one exchange (guide §2.4)
      val sh = tok
        .select(col("source"), explode(expr(Dedup.shingleKeysTransform)).as("w"))
        .repartition(col("w"))
        .distinct()
      val ns = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val co = sh.as("a")
        .join(sh.as("b"),
          col("a.w") === col("b.w")
            && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_common"))
      val jac = Portable.quant6(col("n_common").cast("double")
        / (col("na.n") + col("nb.n") - col("n_common")))
      // the per-source count table is DOMAIN-bounded (|sources| rows)
      // like nation/region — explicit broadcast is safe at any N
      co.join(broadcast(ns.as("na")), col("na.source") === col("source_a"))
        .join(broadcast(ns.as("nb")), col("nb.source") === col("source_b"))
        .select(col("source_a"), col("source_b"), col("n_common"), jac.as("jaccard"))
    },

    // L52 — MinHash corpus sketch: the AT-SCALE twin of source_overlap
    // (the text_contamination → _bloom pattern applied to the overlap
    // matrix). source_overlap's exact Jaccard joins the corpus-shaped
    // distinct-shingle relation with itself; the sketch never shuffles
    // more than one CONSTANT-size row per source: each doc folds its
    // shingle-hash array to [[SketchHashes]] per-doc minima map-side
    // (Dedup's array_min signature form — no explode, no shuffle), a
    // mergeable MIN aggregate collapses them to a |sources|×H sketch
    // table, and the pair matrix is a broadcast self-join of that
    // dimension-sized table. est_jaccard = fraction of agreeing lanes —
    // the classic MinHash estimator (E[min_a = min_b] = J); unlike the
    // exact matrix, EVERY pair appears (agreement 0 is a result, not an
    // absent row). Hash family shared verbatim with the dedup pipeline
    // ((h1 + k·h2) mod 2^32 over the shingle md5 words), so the sketch
    // prices the same shingle universe the dedup family operates on.
    // NULL-text docs contribute no shingles on either side (DuckDB:
    // no hw rows; Spark: NULL per-doc minima that MIN skips) — but a
    // source whose docs are ALL NULL used to diverge (r13 advice): the
    // oracle drops it entirely while the Spark aggregate still emitted
    // a NULL-lane sketch row and n_agree=0 pairs for it. Filtering the
    // NULL docs upstream (mirrored in the oracle's t CTE, a no-op on
    // real rows) makes such a source absent from BOTH engines; the
    // "every pair present" invariant is over sketchable sources.
    QueryDef(
      "source_sketch",
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
         |           WHERE text IS NOT NULL),
         |sh AS (SELECT source, array_to_string(tk[i.i + 1:i.i + ${Dedup.ShingleLen}], ' ') AS shingle
         |       FROM t, generate_series(0, ${Dedup.MaxShingleStarts - 1}) i(i)
         |       WHERE i.i <= greatest(len(tk) - ${Dedup.ShingleLen}, 0)),
         |hw AS (SELECT source,
         |              CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h1,
         |              CAST('0x' || substr(md5(shingle), 9, 8) AS BIGINT) AS h2 FROM sh),
         |mins AS (SELECT source, k.k, MIN((h1 + k.k * h2) % ${Dedup.Mod}) AS mn
         |         FROM hw, generate_series(0, ${SketchHashes - 1}) k(k) GROUP BY 1, 2)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       CAST(SUM(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |       ${Portable.Quant6Sql(s"CAST(SUM(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS DOUBLE) / $SketchHashes")} AS est_jaccard
         |FROM mins a JOIN mins b ON a.k = b.k AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      val tok = Dedup.tokenized(
        Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text"))
          .filter(col("text").isNotNull))
      // per-doc minima as ARRAY EXPRESSIONS over the shared shingle-md5
      // transform (the bandKeysFrom shape): map-only, never exploded
      val hsArr = tok
        .select(col("source"), expr(Dedup.shingleWordsTransform).as("hs"))
      // r16: ONE fused minhash_sigs pass instead of SketchHashes
      // interpreted array_min(transform(...)) passes (bit-identical —
      // VectorOpsSpec)
      val perDoc = hsArr
        .select(col("source"),
          expr(s"minhash_sigs(hs, $SketchHashes, ${Dedup.Mod})").as("sig"))
        .select(
          col("source") +: (0 until SketchHashes).map(k =>
            col("sig").getItem(k).as(s"mh$k")): _*)
      val minAggs = (0 until SketchHashes).map(k => min(col(s"mh$k")).as(s"mh$k"))
      val sk = perDoc.groupBy(col("source")).agg(minAggs.head, minAggs.tail: _*)
      val nAgree = (0 until SketchHashes)
        .map(k => when(col(s"a.mh$k") === col(s"b.mh$k"), 1L).otherwise(0L))
        .reduce(_ + _)
      // |sources|×H sketch table broadcast against itself: the pair
      // matrix is domain-bounded, never corpus-bounded
      sk.as("a").join(broadcast(sk.as("b")), col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
          nAgree.as("n_agree"),
          Portable.quant6(nAgree.cast("double") / lit(SketchHashes)).as("est_jaccard"))
    })
}
