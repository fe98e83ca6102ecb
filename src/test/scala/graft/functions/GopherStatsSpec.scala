package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value equality of the native one-pass [[GopherTextStats]] against
  * the Column-algebra HOF formulation it replaced in
  * [[graft.ext.Corpus.gopherQualityFlags]] — the reference
  * implementation lives HERE now, pinned over adversarial fixtures
  * (empty text, whitespace edge cases that exercise split's
  * trailing-empty semantics, overlapping dots, bullet/ellipsis lines,
  * non-ASCII, stopword multiplicity) plus the real sf0.001 corpus.
  */
class GopherStatsSpec extends SparkSpec {
  import spark.implicits._

  private val stopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The pre-native HOF reference, verbatim from the old
    * gopherQualityFlags raw-count layer. */
  private def reference(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("_toks", split(trim(col("text")), "\\s+"))
      .withColumn("_lines", split(col("text"), "\n"))
      .select(col("doc_id"),
        size(col("_toks")).cast("long").as("n_words"),
        expr("""aggregate(transform(_toks, t -> length(t)), 0L,
          (a, x) -> a + CAST(x AS BIGINT))""").as("sum_word_len"),
        expr("size(filter(_toks, t -> t rlike '[a-zA-Z]'))").cast("long")
          .as("n_alpha_words"),
        expr("length(text) - length(replace(text, '#', ''))").cast("long")
          .as("n_hash"),
        expr("(length(text) - length(replace(text, '...', ''))) div 3")
          .cast("long").as("n_ellipsis"),
        size(col("_lines")).cast("long").as("n_lines"),
        expr("""size(filter(_lines, l -> startswith(l, '- ')
          OR startswith(l, '* ')))""").cast("long").as("n_bullet_lines"),
        expr("size(filter(_lines, l -> endswith(l, '...')))").cast("long")
          .as("n_ellipsis_lines"),
        stopwords.map(w => array_contains(col("_toks"), w).cast("long"))
          .reduce(_ + _).as("stop_hits"))

  private def native(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), VectorFunctions.gopherStats(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.sum_word_len"),
        col("g.n_alpha_words"), col("g.n_hash"), col("g.n_ellipsis"),
        col("g.n_lines"), col("g.n_bullet_lines"), col("g.n_ellipsis_lines"),
        col("g.stop_hits"))

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    def rows(d: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
      d.collect().toSeq.map(r => (0 until 10).map(r.getLong))
        .sortBy(_.head)
    val ref = rows(reference(df))
    val got = rows(native(df))
    ref.zip(got).foreach { case (r, g) => assert(r == g, s"\nref $r\ngot $g") }
    assert(ref.size == got.size)
  }

  test("native gopher stats equal the HOF reference on adversarial fixtures") {
    val docs = Seq(
      "",                                   // empty: 1 empty token, 1 line
      "   ",                                // spaces only: trim -> empty
      "a\tb\nc ",                           // tab split, \n both a token
                                            //   separator and a line break
      "....",                               // 4 dots: ONE non-overlapping '...'
      "......",                             // 6 dots: two
      ". . . ...",                          // mixed
      "- bullet one\n* bullet two\nplain\nends...",
      "# one ## two ###",
      "the the the be",                     // stopword multiplicity: hits=2
      "thé bé tô",                          // non-ASCII near-stopwords: 0 hits
      "café naïve résumé", // accented lengths
      "- \n* \n-x\n*",                      // bullet boundary cases
      "...\n...\nx...",                     // ellipsis-only lines
      "one two three four five the of and", // ordinary sentence
      "trailing newline\n",                 // trailing empty line kept
      " leading and trailing  ",            // multi-space interior
      "é...café"                  // non-ASCII around dots
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    compare(docs)
  }

  test("native gopher stats equal the HOF reference on the sf0.001 corpus") {
    compare(spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")))
  }
}
