package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection (SURVEY.md §2.3 L2–L4): MinHash+LSH and
  * SimHash, both bucketed — candidate pairs come from a shuffle on a
  * band/bucket key, NEVER from an all-pairs cross join. That is the
  * 100 TB contract: work is O(docs × shingles) + O(pairs-in-bucket),
  * and every stage is a keyed shuffle Spark can partition freely.
  *
  * Hashing scheme (portable AND cheap): ONE md5 per shingle, split
  * into two 32-bit words h1,h2; the k-th minhash permutation is
  * g_k = (h1 + k*h2) mod 2^32 (Kirsch–Mitzenmacher double hashing).
  * Signatures are then plain MIN/SUM aggregate expressions — no
  * row-per-seed/bit explosion. The first version exploded 12 seeds
  * (resp. 32 bits) into rows and recomputed md5 per row: 30s/20s at
  * sf0.1; this form cuts that to one md5 per shingle and one shuffle.
  * md5 is the one hash DuckDB reproduces bit-for-bit (SURVEY.md §4);
  * Spark xxhash64 / DuckDB hash() are different algorithms.
  *
  * Methods (public literature): MinHash resemblance sketches (Broder,
  * "On the resemblance and containment of documents", 1997); banded
  * LSH (Indyk & Motwani, STOC 1998; Leskovec/Rajaraman/Ullman, Mining
  * of Massive Datasets ch.3); double hashing for the hash family
  * (Kirsch & Mitzenmacher, ESA 2006); SimHash (Charikar, STOC 2002;
  * Manku et al., WWW 2007 for the hamming-block candidate trick).
  */
object Dedup {

  private val ShingleLen = 5 // tokens per shingle
  private val NumHashes = 12 // minhash signature length
  private val NumBands = 4 // LSH bands (3 rows per band)
  private val RowsPerBand = NumHashes / NumBands
  private val JaccardThreshold = 0.7
  private val Mod = 4294967296L // 2^32
  // Cap on shingle start positions per doc — MUST match the oracle's
  // generate_series(0, 4095) bound or long docs diverge cross-engine.
  private[operators] val MaxShingleStarts = 4096

  /** Shared oracle CTEs: shingles + per-shingle 32-bit hash words. */
  private val shingleCtes =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i.i + 1:i.i + $ShingleLen], ' ') AS shingle
       |       FROM t, generate_series(0, 4095) i(i)
       |       WHERE i.i <= greatest(len(tk) - $ShingleLen, 0)),
       |hs AS (SELECT doc_id,
       |              CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h1,
       |              CAST('0x' || substr(md5(shingle), 9, 8) AS BIGINT) AS h2
       |       FROM sh)""".stripMargin

  /** Spark twin of the oracle's `hs` CTE: (doc_id, h1, h2), distinct.
    * Shingles are deduped and joined BY THEIR 64-bit hash words, not
    * the strings: shuffling two longs beats shuffling 5-token strings,
    * and a collision needs ~2^32 shingles (oracle joins strings — the
    * results agree unless md5's 64-bit prefix collides). */
  private def hashWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, least(greatest(size(split(text, ' ')) - $ShingleLen, 0), ${MaxShingleStarts - 1})), " +
            s"i -> md5(array_join(slice(split(text, ' '), i + 1, $ShingleLen), ' ')))")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h2"))
      .distinct()

  private def gk(k: Int): Column = (col("h1") + lit(k.toLong) * col("h2")) % Mod

  val defs: Seq[QueryDef] = Seq(

    // L2+L4 — MinHash signatures → banded LSH buckets → exact-Jaccard
    // verification of in-bucket candidate pairs only.
    QueryDef(
      "dedup_minhash", {
        val mins = (0 until NumHashes)
          .map(k => s"MIN((h1 + $k * h2) % $Mod) AS mh$k").mkString(", ")
        val bandSelects = (0 until NumBands).map { b =>
          val parts = (0 until RowsPerBand)
            .map(r => s"CAST(mh${b * RowsPerBand + r} AS VARCHAR)")
            .mkString(" || '|' || ")
          s"SELECT doc_id, md5('$b:' || $parts) AS band_key FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH $shingleCtes,
           |ns AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
           |sig AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
           |bk AS ($bandSelects),
           |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           |         FROM bk a JOIN bk b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |inter AS (SELECT c.da, c.db, COUNT(*) AS n_common
           |          FROM cand c
           |          JOIN sh sa ON sa.doc_id = c.da
           |          JOIN sh sb ON sb.doc_id = c.db AND sb.shingle = sa.shingle
           |          GROUP BY c.da, c.db)
           |SELECT i.da AS doc_a, i.db AS doc_b,
           |       CAST(i.n_common AS BIGINT) AS n_common,
           |       floor((CAST(i.n_common AS DOUBLE) / (na.n + nb.n - i.n_common)) * 1000000.0) / 1000000.0 AS jaccard
           |FROM inter i JOIN ns na ON na.doc_id = i.da JOIN ns nb ON nb.doc_id = i.db
           |WHERE CAST(i.n_common AS DOUBLE) / (na.n + nb.n - i.n_common) >= $JaccardThreshold""".stripMargin
      }) { (spark, dir) =>
      val sh = hashWords(spark, dir).cache()
      val ns = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))

      val sig = sh
        .groupBy(col("doc_id"))
        .agg(min(gk(0)).as("mh0"), (1 until NumHashes).map(k => min(gk(k)).as(s"mh$k")): _*)

      val bandKeys = (0 until NumBands).map { b =>
        val parts = (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}").cast("string"))
        md5(concat(lit(s"$b:"), concat_ws("|", parts: _*)))
      }
      val bk = sig.select(col("doc_id"), explode(array(bandKeys: _*)).as("band_key"))

      val cand = bk.as("a")
        .join(bk.as("b"),
          col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()

      val inter = cand
        .join(sh.as("sa"), col("sa.doc_id") === col("da"))
        .join(sh.as("sb"),
          col("sb.doc_id") === col("db")
            && col("sb.h1") === col("sa.h1") && col("sb.h2") === col("sa.h2"))
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
          graft.functions.Portable.quant6(jac).as("jaccard"))
    },

    // L3 — 32-bit SimHash over 5-gram shingle features; pairs within
    // hamming<=3 found by exact match on one of 4 byte blocks
    // (pigeonhole: <=3 flipped bits leave a byte intact), verified
    // with bit_count. Shingles, not tokens: on a small shared vocab,
    // token-level simhash collapses (~15k bogus pairs on 500 docs).
    QueryDef(
      "dedup_simhash", {
        val sums = (0 until 32)
          .map(b => s"SUM(2 * (CAST(floor(h1 / ${1L << b}.0) AS BIGINT) % 2) - 1) AS s$b")
          .mkString(", ")
        val fpExpr = (0 until 32)
          .map(b => s"CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
          .mkString(" + ")
        s"""WITH $shingleCtes,
           |s AS (SELECT doc_id, $sums FROM hs GROUP BY doc_id),
           |fp AS (SELECT doc_id, CAST($fpExpr AS BIGINT) AS simhash FROM s),
           |nib AS (SELECT doc_id, simhash, k.k, CAST(floor(simhash / pow(256.0, k.k)) AS BIGINT) % 256 AS nv
           |        FROM fp, generate_series(0, 3) k(k)),
           |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.simhash AS sa, b.simhash AS sb
           |         FROM nib a JOIN nib b ON a.k = b.k AND a.nv = b.nv AND a.doc_id < b.doc_id)
           |SELECT da AS doc_a, db AS doc_b,
           |       CAST(sa AS BIGINT) AS simhash_a, CAST(sb AS BIGINT) AS simhash_b,
           |       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin
      }) { (spark, dir) =>
      def bitSum(b: Int): Column =
        sum(lit(2) * (floor(col("h1") / lit((1L << b).toDouble)).cast("long") % 2) - 1).as(s"s$b")
      val s = hashWords(spark, dir)
        .groupBy(col("doc_id"))
        .agg(bitSum(0), (1 until 32).map(bitSum): _*)
      val fpExpr = (0 until 32)
        .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val fp = s.select(col("doc_id"), fpExpr.cast("long").as("simhash"))
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
