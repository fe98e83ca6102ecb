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
      // When the window cuts the file mid-stream, shrink it to the last
      // complete UTF-8 boundary and strict-decode everything up to it:
      // ONLY a well-formed multibyte char cut off by the window edge is
      // tolerated — malformed bytes anywhere in the window still fail.
      val strictLen =
        if (sniffLen < fileLen) lastCompleteUtf8Boundary(buf) else buf.length
      val dec = StandardCharsets.UTF_8.newDecoder()
      try dec.decode(java.nio.ByteBuffer.wrap(buf, 0, strictLen))
      catch {
        case _: java.nio.charset.CharacterCodingException =>
          throw new DataQualityException(s"source file is not UTF-8: $path")
      }
    } finally in.close()
  }

  /** Length of the longest prefix of `buf` ending on a complete UTF-8
    * character boundary. Backs over at most 3 trailing continuation
    * bytes; the trailing sequence is excluded only when it is a valid
    * lead byte with fewer continuations than it declares (a char cut
    * off by the window). Any other trailing shape (invalid lead, bare
    * continuations, a complete char) is kept so strict decoding judges
    * it. */
  private[ops] def lastCompleteUtf8Boundary(buf: Array[Byte]): Int = {
    val n = buf.length
    var i = n - 1
    var cont = 0
    while (i >= 0 && cont < 3 && (buf(i) & 0xC0) == 0x80) { i -= 1; cont += 1 }
    if (i < 0) return n // all continuation bytes: malformed, decode fails
    val b = buf(i) & 0xFF
    val declared =
      if (b < 0x80) 1
      else if ((b & 0xE0) == 0xC0) 2
      else if ((b & 0xF0) == 0xE0) 3
      else if ((b & 0xF8) == 0xF0) 4
      else 1 // invalid lead byte: keep it, strict decode fails
    val have = n - i
    if (declared > have) i else n
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
