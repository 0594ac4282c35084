package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle corpus, batch 12 (round 9): audio joins the perceptual
  * dedup family — the last modality (text/image/video already decode
  * for real; audio stopped at [[graft.ext.MediaMeta]] headers until
  * the round-9 [[graft.ext.Flac]] frame decoder).
  *
  * q128 runs the pipeline end-to-end on real FLAC containers the
  * [[graft.ext.Flac]] decoder must decode sample-exactly (Rice-coded
  * fixed-predictor frames from [[graft.ext.AudioFixtures]]) —
  * rows-only by the q84 convention (DuckDB cannot decode FLAC), with
  * the planted-pair self-check column. q128p persists the computed
  * fingerprints and both engines replay the pair stage from the same
  * parquet — the audio twin of q84p/q125p.
  */
object Queries12 extends ColumnSyntax {

  // ------------------- q128: audio near-dup over decoded FLAC PCM
  private def q128Assets(s: SparkSession): DataFrame = {
    val originals = (0 until 60).map(i =>
      (i.toLong, graft.ext.AudioFixtures.toneClip(i, nSamples = 8192)))
    val copies = (0 until 12).map(i =>
      (i + 1000L, graft.ext.AudioFixtures.toneClip(i, nSamples = 8192, perturb = true)))
    s.createDataFrame(originals ++ copies).toDF("aud_id", "content")
      .repartition(8)
  }

  private def q128(s: SparkSession, dir: String): DataFrame =
    graft.ext.Audio.nearDupAudioPairs(q128Assets(s), "aud_id", maxHamming = 3)
      .withColumn("planted", ($"b_id" - $"a_id" === 1000L).cast("int"))
      .orderBy($"a_id", $"b_id")

  // ------------- q128p: the audio pair stage under the hash gate
  private val Q128FpFixture = "/tmp/graft_fixtures/q128_audio_fp.parquet"

  private def q128p(s: SparkSession, dir: String): DataFrame = {
    graft.ext.Audio.withFingerprint(q128Assets(s))
      .where($"afp".isNotNull)
      .select($"aud_id".as("id"), $"afp".as("dhash"))
      .coalesce(1)
      .write.mode("overwrite").parquet(Q128FpFixture)
    graft.ext.Images.nearDupPairsFromHashes(
        s.read.parquet(Q128FpFixture), maxHamming = 3)
      .orderBy($"a_id", $"b_id")
  }

  private val q128pSql =
    s"""WITH h AS (
       |  SELECT id, dhash FROM read_parquet('$Q128FpFixture/*.parquet')
       |), eq AS (
       |  SELECT x.id AS a_id, y.id AS b_id, 0 AS hamming
       |  FROM h x JOIN h y ON x.dhash = y.dhash AND x.id < y.id
       |), uniq AS (
       |  SELECT DISTINCT dhash FROM h
       |), banded AS (
       |  SELECT dhash, i AS band_idx, (dhash >> CAST(16 * i AS INT)) & 65535 AS band_val
       |  FROM uniq, UNNEST(range(0, 4)) AS t(i)
       |), near AS (
       |  SELECT DISTINCT a.dhash AS ha, b.dhash AS hb
       |  FROM banded a
       |  JOIN banded b ON a.band_idx = b.band_idx
       |    AND a.band_val = b.band_val AND a.dhash < b.dhash
       |), nearh AS (
       |  SELECT ha, hb, bit_count(xor(ha, hb)) AS hamming
       |  FROM near WHERE bit_count(xor(ha, hb)) <= 3
       |), neq AS (
       |  SELECT LEAST(x.id, y.id) AS a_id, GREATEST(x.id, y.id) AS b_id, hamming
       |  FROM nearh JOIN h x ON ha = x.dhash JOIN h y ON hb = y.dhash
       |)
       |SELECT a_id, b_id, CAST(hamming AS INT) AS hamming
       |FROM (SELECT * FROM eq UNION ALL SELECT * FROM neq)
       |ORDER BY a_id, b_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_audio_neardup" -> (q128 _),
    "q128p_audio_fp_pairs" -> (q128p _))

  val oracles: Map[String, String] = Map(
    // q128: no oracle — DuckDB cannot decode FLAC (q84 convention);
    // its pair stage IS hash-gated via q128p's persisted fixture
    "q128p_audio_fp_pairs" -> q128pSql)
}
