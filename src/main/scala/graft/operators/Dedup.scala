package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection (SURVEY.md §2.3 L2–L4): MinHash+LSH and
  * SimHash, both bucketed — candidate pairs come from a shuffle on a
  * band/bucket key, NEVER from an all-pairs cross join. That is the
  * 100 TB contract: work is O(docs × bands) + O(pairs-in-bucket),
  * and every stage is a keyed shuffle Spark can partition freely.
  *
  * All hashing is md5-derived so the DuckDB oracle reproduces the
  * signatures bit-for-bit (SURVEY.md §4): Spark xxhash64 and DuckDB
  * hash() are different algorithms, md5 is the shared one.
  */
object Dedup {

  private val ShingleLen = 5 // tokens per shingle
  private val NumHashes = 12 // minhash signature length
  private val NumBands = 4 // LSH bands (3 rows per band)
  private val JaccardThreshold = 0.7

  /** doc_id + distinct token-shingles; short docs yield one shingle. */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, greatest(size(split(text, ' ')) - $ShingleLen, 0)), " +
            s"i -> array_join(slice(split(text, ' '), i + 1, $ShingleLen), ' '))")).as("shingle"))
      .distinct()

  val defs: Seq[QueryDef] = Seq(

    // L2+L4 — MinHash signatures → banded LSH buckets → exact-Jaccard
    // verification of in-bucket candidate pairs only.
    QueryDef(
      "dedup_minhash",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i.i + 1:i.i + $ShingleLen], ' ') AS shingle
         |       FROM t, generate_series(0, 4095) i(i)
         |       WHERE i.i <= greatest(len(tk) - $ShingleLen, 0)),
         |ns AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |mh AS (SELECT doc_id, s.seed, MIN(md5(CAST(s.seed AS VARCHAR) || '|' || shingle)) AS mh
         |       FROM sh, generate_series(0, ${NumHashes - 1}) s(seed)
         |       GROUP BY doc_id, s.seed),
         |bk AS (SELECT doc_id, band,
         |              md5(CAST(band AS VARCHAR) || ':' || string_agg(mh, '|' ORDER BY seed)) AS band_key
         |       FROM (SELECT doc_id, seed, mh, CAST(floor(seed / ${NumHashes / NumBands}.0) AS INT) AS band FROM mh) z
         |       GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |         FROM bk a JOIN bk b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |inter AS (SELECT c.da, c.db, COUNT(*) AS n_common
         |          FROM cand c
         |          JOIN sh sa ON sa.doc_id = c.da
         |          JOIN sh sb ON sb.doc_id = c.db AND sb.shingle = sa.shingle
         |          GROUP BY c.da, c.db)
         |SELECT i.da AS doc_a, i.db AS doc_b,
         |       CAST(i.n_common AS BIGINT) AS n_common,
         |       round(CAST(i.n_common AS DOUBLE) / (na.n + nb.n - i.n_common), 6) AS jaccard
         |FROM inter i JOIN ns na ON na.doc_id = i.da JOIN ns nb ON nb.doc_id = i.db
         |WHERE CAST(i.n_common AS DOUBLE) / (na.n + nb.n - i.n_common) >= $JaccardThreshold""".stripMargin) {
      (spark, dir) =>
        val sh = shingles(spark, dir).cache()
        val ns = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))

        val mh = sh
          .select(col("doc_id"), col("shingle"),
            explode(sequence(lit(0), lit(NumHashes - 1))).as("seed"))
          .groupBy(col("doc_id"), col("seed"))
          .agg(min(md5(concat(col("seed").cast("string"), lit("|"), col("shingle")))).as("mh"))

        val rowsPerBand = NumHashes / NumBands
        val bk = mh
          .withColumn("band", floor(col("seed") / lit(rowsPerBand.toDouble)).cast("int"))
          .groupBy(col("doc_id"), col("band"))
          .agg(md5(concat(
            col("band").cast("string"), lit(":"),
            concat_ws("|", transform(
              array_sort(collect_list(struct(col("seed"), col("mh")))),
              s => s.getField("mh"))))).as("band_key"))

        val cand = bk.as("a")
          .join(bk.as("b"),
            col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct()

        val inter = cand
          .join(sh.as("sa"), col("sa.doc_id") === col("da"))
          .join(sh.as("sb"),
            col("sb.doc_id") === col("db") && col("sb.shingle") === col("sa.shingle"))
          .groupBy(col("da"), col("db"))
          .agg(count(lit(1)).as("n_common"))

        val jac = col("n_common").cast("double") /
          (col("na.n") + col("nb.n") - col("n_common"))
        inter
          .join(ns.as("na"), col("na.doc_id") === col("da"))
          .join(ns.as("nb"), col("nb.doc_id") === col("db"))
          .filter(jac >= JaccardThreshold)
          .select(col("da").as("doc_a"), col("db").as("doc_b"),
            col("n_common").cast("long").as("n_common"),
            round(jac, 6).as("jaccard"))
    },

    // L3 — 32-bit md5 SimHash over 5-gram shingle features; pairs
    // within hamming<=3 found by exact match on one of 4 byte blocks
    // (pigeonhole: <=3 flipped bits leave a byte intact), verified
    // with bit_count. Shingles, not tokens: on a small shared vocab,
    // token-level simhash collapses (token features gave ~15k bogus
    // pairs on 500 docs; 16-bit gave 37k).
    QueryDef(
      "dedup_simhash",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tok AS (SELECT DISTINCT doc_id, array_to_string(tk[i.i + 1:i.i + $ShingleLen], ' ') AS tok
        |        FROM t, generate_series(0, 4095) i(i)
        |        WHERE i.i <= greatest(len(tk) - $ShingleLen, 0)),
        |bits AS (SELECT doc_id, b.b,
        |                strpos('0123456789abcdef',
        |                       substr(md5(tok), CAST(floor(b.b / 4.0) AS INT) + 1, 1)) - 1 AS d
        |         FROM tok, generate_series(0, 31) b(b)),
        |bitv AS (SELECT doc_id, b, CAST(floor(d / pow(2.0, 3 - (b % 4))) AS BIGINT) % 2 AS bit FROM bits),
        |s AS (SELECT doc_id, b, SUM(2 * bit - 1) AS sc FROM bitv GROUP BY doc_id, b),
        |fp AS (SELECT doc_id, CAST(SUM(CASE WHEN sc > 0 THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |       FROM s GROUP BY doc_id),
        |nib AS (SELECT doc_id, simhash, k.k, CAST(floor(simhash / pow(256.0, k.k)) AS BIGINT) % 256 AS nv
        |        FROM fp, generate_series(0, 3) k(k)),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.simhash AS sa, b.simhash AS sb
        |         FROM nib a JOIN nib b ON a.k = b.k AND a.nv = b.nv AND a.doc_id < b.doc_id)
        |SELECT da AS doc_a, db AS doc_b,
        |       CAST(sa AS BIGINT) AS simhash_a, CAST(sb AS BIGINT) AS simhash_b,
        |       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin) { (spark, dir) =>
      val tok = shingles(spark, dir).withColumnRenamed("shingle", "tok")
      val bits = tok
        .select(col("doc_id"), col("tok"), explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("hexc",
          substring(md5(col("tok")), (floor(col("b") / 4.0) + 1).cast("int"), lit(1)))
        .withColumn("d", expr("instr('0123456789abcdef', hexc) - 1"))
      val bitv = bits.withColumn("bit",
        floor(col("d") / pow(lit(2.0), lit(3) - col("b") % 4)).cast("long") % 2)
      val s = bitv.groupBy(col("doc_id"), col("b"))
        .agg(sum(lit(2) * col("bit") - 1).as("sc"))
      val fp = s.groupBy(col("doc_id"))
        .agg(sum(when(col("sc") > 0, pow(lit(2.0), col("b")).cast("long")).otherwise(0L))
          .cast("long").as("simhash"))
      val nib = fp.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("nv", floor(col("simhash") / pow(lit(256.0), col("k"))).cast("long") % 256)
      val cand = nib.as("a")
        .join(nib.as("b"),
          col("a.k") === col("b.k") && col("a.nv") === col("b.nv")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.simhash").as("sa"), col("b.simhash").as("sb"))
        .distinct()
      val ham = bit_count(col("sa").bitwiseXOR(col("sb")))
      cand.filter(ham <= 3)
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("sa").as("simhash_a"), col("sb").as("simhash_b"),
          ham.cast("long").as("hamming"))
    })
}
