package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source extraction (etl/extract.py re-expressed Spark-first).
  *
  * CSV reads always use an explicit schema (never inference) per the
  * declared-contract model (SURVEY §1.2); header row is validated
  * against the contract by the schema gate instead of trusting
  * inference.
  */
object Extract {

  /** S2: fail fast if the path is missing / not a file / not decodable
    * as UTF-8 (etl/extract.py:42-61). Driver-side filesystem checks —
    * this runs before any job is scheduled, mirroring the reference's
    * pre-read gate. Only the first 64 KiB are sniffed for UTF-8
    * validity so the check stays O(1) regardless of file size. */
  def precheckSource(path: String): Unit = {
    val p = Paths.get(path)
    if (!Files.exists(p))
      throw new DataQualityException(s"source file not found: $path")
    if (!Files.isRegularFile(p))
      throw new DataQualityException(s"source path is not a file: $path")
    val fileLen = Files.size(p)
    val sniffLen = math.min(fileLen, 64 * 1024L).toInt
    val in = Files.newInputStream(p)
    try {
      val buf = in.readNBytes(sniffLen)
      // Decode strictly, but exclude the trailing <=3 bytes when the
      // window is truncated mid-file — only a cut-off multibyte char is
      // tolerated, never malformed bytes inside the window.
      val strictLen =
        if (sniffLen < fileLen) math.max(0, buf.length - 3) else buf.length
      val dec = StandardCharsets.UTF_8.newDecoder()
      try dec.decode(java.nio.ByteBuffer.wrap(buf, 0, strictLen))
      catch {
        case _: java.nio.charset.CharacterCodingException =>
          throw new DataQualityException(s"source file is not UTF-8: $path")
      }
    } finally in.close()
  }

  /** S1: read a headered CSV with an explicit schema
    * (etl/extract.py:161). `mode=FAILFAST` surfaces malformed rows
    * eagerly, matching the reference's fail-on-read posture. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** Full extract stage: precheck, read, then the reference's sanity
    * gates in its eager order (etl/extract.py:138-175):
    * schema match -> non-empty -> null-fraction -> full-row dups.
    * Returns (frame, rowCount). */
  def extractCsv(spark: SparkSession, path: String, schema: StructType,
                 expectedColumns: Seq[String]): (DataFrame, Long) = {
    precheckSource(path)
    val df = readCsv(spark, path, schema)
    Gates.requireSchemaMatch(df, expectedColumns)
    val n = Gates.requireNonEmpty(df)
    Gates.requireMaxNullPct(df)
    Gates.requireNoFullRowDups(df)
    (df, n)
  }
}
