package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2+S3+S5: NHC best-track KMZ → placemark table → CSV
  * (kmz2csv.py:6-38 re-expressed Spark-first).
  *
  * Pipeline:
  *  1. `binaryFile` scan of the KMZ(s) — distributed, one row per
  *     archive (S2). Zip entries are not splittable, so the unzip is
  *     per-file imperative logic inside a typed map — the one justified
  *     `map`-style step here (the reference shells out to a temp dir,
  *     kmz2csv.py:14-17; we stream the bytes, no temp files).
  *  2. Placemark explosion + field extraction stay in Catalyst: split
  *     on the `<Placemark>` tag, `xpath_string` per field (S3,
  *     kmz2csv.py:20-32). Fragments carry no default namespace (it
  *     lives on the stripped `<kml>` root), so plain xpath matches.
  *  3. Storm name from the file name (F7, kmz2csv.py:9) via Catalyst
  *     `split`/`element_at` on the scan's `path` column.
  *  4. [[writeCsv]]: header CSV sink (S5, kmz2csv.py:35).
  *
  * The KML's tags are camelCase (`stormName`, `intensityMPH`, ...);
  * the reference sees them lowercased because BeautifulSoup's lxml
  * parser lowercases tags — the output CSV header uses the lowercase
  * names, reproduced here.
  */
object TrackIngest {

  /** The reference's 12 extracted fields, output order and lowercase
    * naming per kmz2csv.py:20-21; right column = actual KML tag.
    */
  private val fields: Seq[(String, String)] = Seq(
    "atcfdtg" -> "atcfdtg",
    "stormnum" -> "stormNum",
    "stormname" -> "stormName",
    "basin" -> "basin",
    "stormtype" -> "stormType",
    "intensity" -> "intensity",
    "intensitymph" -> "intensityMPH",
    "intensitykph" -> "intensityKPH",
    "lat" -> "lat",
    "lon" -> "lon",
    "minsealevelpres" -> "minSeaLevelPres",
    "dtg" -> "dtg"
  )

  /** Unzip the first `.kml` entry of a KMZ byte stream. */
  private def unzipKml(bytes: Array[Byte]): String = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .collectFirst {
          case e if e.getName.toLowerCase.endsWith(".kml") =>
            new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        }
        .getOrElse(sys.error("no .kml entry in archive"))
    } finally zin.close()
  }

  /** KMZ path (or glob over many KMZs) → one row per placemark with
    * the 12 reference columns (all strings, like the reference's CSV)
    * plus `storm` (from the file name) and `seq` (placemark document
    * order — the reference relies on it implicitly via row order).
    */
  def readKmz(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val kml = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) => (p, unzipKml(bytes)) }
      .toDF("path", "kml")
    // storm name = basename up to the first '_' (kmz2csv.py:9)
    val storm = element_at(split(element_at(split(col("path"), "/"), -1), "_"), 1)
    val frags = kml
      .select(storm.as("storm"),
        posexplode(split(col("kml"), "<Placemark>")).as(Seq("seq", "frag")))
      .filter(col("frag").contains("</Placemark>"))
      .select(col("storm"), col("seq"),
        concat(lit("<Placemark>"),
          regexp_extract(col("frag"), "(?s)^(.*?)</Placemark>", 1),
          lit("</Placemark>")).as("pm"))
    val extracted = fields.map { case (out, tag) =>
      xpath_string(col("pm"), lit(s"Placemark/$tag")).as(out)
    }
    frags.select((extracted :+ col("storm") :+ col("seq")): _*)
  }

  /** CSV sink with header, reference column order, document row order
    * (S5). Single output file to mirror the reference's one-file
    * `to_csv` — callers ingesting many storms at scale should drop the
    * coalesce and keep one file per storm partition.
    */
  def writeCsv(df: DataFrame, outDir: String): Unit =
    df.orderBy(col("seq"))
      .select(fields.map(f => col(f._1)): _*)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(outDir)
}
