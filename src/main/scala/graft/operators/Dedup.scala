package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Deduplication operators for large text corpora (SURVEY.md §2.C).
  *
  * Scale posture: every strategy below turns "compare all pairs" into
  * "group by a bounded-cardinality candidate key, compare within groups".
  * Nothing ever materializes an unblocked cross join, so the shuffles are
  * all key-partitioned and AQE-coalescible at 100 TB.
  */
object Dedup {

  /** Exact dedup: hash the normalized text, keep the lowest id per hash.
    * One map-side-combined aggregation; the hash (not the full text) is the
    * shuffle key, so wide documents don't inflate the exchange. */
  def exactGroups(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(md5(F.normalizeWhitespace(textCol)).as("text_hash"), idCol.as("id"))
      .groupBy(col("text_hash"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** w-token shingles of a token array (falls back to the whole token list
    * as one shingle for short docs). Pure array expression — no explode. */
  def shingles(tokens: Column, w: Int = 3): Column =
    when(size(tokens) < w, array(array_join(tokens, " ")))
      .otherwise(transform(
        sequence(lit(1), size(tokens) - (w - 1)),
        i => array_join(slice(tokens, i, lit(w)), " ")))

  /** MinHash signature: k independent hash slots, each the minimum of
    * xxhash64(slot, shingle) over the doc's shingles. Stays entirely inside
    * codegen'd array expressions (the optimized path would be a single
    * custom Expression; this form is already one pass over shingles × k). */
  def minhashSignature(shinglesCol: Column, k: Int = 64): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shinglesCol, sh => xxhash64(i, sh))))

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and emit (band_idx, band_hash) keys. Docs agreeing on any band become
    * candidates. Band keys are high-cardinality -> balanced shuffle. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band_idx"),
        xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("band_hash")))

  /** Full MinHash+LSH near-dup pipeline: returns verified candidate pairs
    * (id_a < id_b) with exact shingle-set Jaccard >= `threshold` — the
    * same set space the signatures estimate, so LSH recall follows the
    * standard S-curve (P[candidate] = 1-(1-s^r)^b, ~0.99 at s=0.7 with
    * 16 bands x 4 rows).
    *
    * Stages: tokenize -> shingle -> signature -> explode bands ->
    * self-join on band key -> distinct pairs -> verify with exact Jaccard.
    * The verify join re-fetches shingle sets by id (broadcast when small).
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                      threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = k / bands
    val toks = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(F.tokens(col(textCol)), shingleWidth)).as("tok_set"),
      shingles(F.tokens(col(textCol)), shingleWidth).as("sh"))
    val sigs = toks.select(
      col("id"), col("tok_set"),
      minhashSignature(col("sh"), k).as("sig"))
    val banded = sigs.select(
      col("id"),
      explode(lshBands(col("sig"), bands, rowsPerBand)).as("band"))
      .select(col("id"), col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sets = sigs.select(col("id"), col("tok_set"))
    candidates
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("tok_set", "set_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("tok_set", "set_b"), "id_b")
      .withColumn("jaccard",
        round(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over a token array: per-bit majority vote of token
    * hashes. Composed from array expressions (codegen); a custom
    * Expression with doGenCode is the future fast path for 100 TB. */
  def simhash64(tokens: Column): Column = {
    val th = transform(tokens, t => xxhash64(t))
    val bitCols = (0 until 64).map { j =>
      val vote = aggregate(th, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, blocked by
    * 16-bit signature segments (pigeonhole: any pair within distance 3 is
    * guaranteed to agree on one of the 4 blocks; larger distances are
    * found with partial recall — standard SimHash trade-off). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sims = df.select(col(idCol).as("id"), simhash64(F.tokens(col(textCol))).as("sim"))
    val blockStructs = (0 until 4).map { b =>
      struct(lit(b).as("block_idx"),
        shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL)).as("block_val"))
    }
    val blocked = sims.select(
      col("id"), col("sim"),
      explode(array(blockStructs: _*)).as("blk"))
      .select(col("id"), col("sim"), col("blk.block_idx").as("block_idx"), col("blk.block_val").as("block_val"))
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
