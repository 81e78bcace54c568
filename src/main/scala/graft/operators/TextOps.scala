package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over the `documents` table — the text half of a
 * large-scale training-data pipeline (language ID, quality scoring, token
 * counting, fingerprinting).
 *
 * All are embarrassingly parallel per-row transforms (narrow, no shuffle,
 * whole-stage-codegen'd `functions._` expressions — no UDFs), so they scale
 * linearly with input splits at 100 TB. Outputs are integers/strings only —
 * exactly reproducible in the DuckDB oracle.
 */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Per-language stopword lists for the n-gram/stopword language heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "pas"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "no"))

  private val words: Column = split(col("text"), " ")
  private def hits(lang: String): Column =
    size(array_intersect(array_distinct(words), lit(stopwords(lang).toArray)))

  // ---------------------------------------------------------------- t01
  /** Language ID via stopword-overlap argmax with fixed priority order
    * (en > de > fr > es > und). */
  def t01LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("lang").as("actual_lang"),
        hits("en").as("h_en"), hits("de").as("h_de"),
        hits("fr").as("h_fr"), hits("es").as("h_es"))
      .withColumn("pred_lang",
        when(col("h_en") + col("h_de") + col("h_fr") + col("h_es") === 0, "und")
          .when(col("h_en") >= greatest(col("h_de"), col("h_fr"), col("h_es")), "en")
          .when(col("h_de") >= greatest(col("h_fr"), col("h_es")), "de")
          .when(col("h_fr") >= col("h_es"), "fr")
          .otherwise("es"))
      .select("doc_id", "actual_lang", "pred_lang", "h_en", "h_de", "h_fr", "h_es")

  // ---------------------------------------------------------------- t02
  /** Quality scoring: length / punctuation / stopword / alpha ratios with a
    * keep-drop flag. Ratios are emitted as exact per-mille integers. */
  def t02Quality(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(words)
    val stopCnt = size(array_intersect(array_distinct(words), lit(stopwords("en").toArray)))
    val punctCnt = length(regexp_replace(col("text"), "[^.,;:!?]", ""))
    val alphaCnt = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
    docs(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        nWords.as("n_words"),
        punctCnt.as("punct_cnt"),
        alphaCnt.as("alpha_cnt"),
        stopCnt.as("stop_hits"),
        round(lit(1000.0) * alphaCnt / length(col("text"))).cast("long").as("alpha_permille"))
      .withColumn("keep",
        when(col("n_words") >= 5 && col("alpha_permille") >= 500, 1).otherwise(0))
  }

  // ---------------------------------------------------------------- t03
  /** Token counting: whitespace tokens + regex word-tokens + chars — the
    * cheap "how many tokens is this corpus" pass. */
  def t03Tokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z]+")).as("word_tokens"),
        length(col("text")).as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        sum("word_tokens").as("total_word_tokens"),
        sum("chars").as("total_chars"))

  // ---------------------------------------------------------------- t04
  /** Document fingerprinting: full-text content hash over normalized text +
    * a head fingerprint over the first 8 words (cheap near-front dedup key). */
  def t04Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    docs(spark, dir)
      .select(col("doc_id"),
        md5(norm).as("fp_full"),
        md5(concat_ws(" ", slice(split(norm, " "), 1, 8))).as("fp_head"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_langid" -> t01LangId _,
    "t02_quality" -> t02Quality _,
    "t03_tokens" -> t03Tokens _,
    "t04_fingerprint" -> t04Fingerprint _,
  )

  private def sqlList(lang: String): String =
    stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "t01_langid" ->
      s"""WITH h AS (
         | SELECT doc_id, lang AS actual_lang,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("en")})) AS h_en,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("de")})) AS h_de,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("fr")})) AS h_fr,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("es")})) AS h_es
         | FROM documents)
         |SELECT doc_id, actual_lang,
         | CASE WHEN h_en + h_de + h_fr + h_es = 0 THEN 'und'
         |      WHEN h_en >= greatest(h_de, h_fr, h_es) THEN 'en'
         |      WHEN h_de >= greatest(h_fr, h_es) THEN 'de'
         |      WHEN h_fr >= h_es THEN 'fr'
         |      ELSE 'es' END AS pred_lang,
         | h_en, h_de, h_fr, h_es
         |FROM h""".stripMargin,
    "t02_quality" ->
      s"""SELECT doc_id, n_chars,
         | len(string_split(text, ' ')) AS n_words,
         | length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_cnt,
         | length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_cnt,
         | len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("en")})) AS stop_hits,
         | CAST(round(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text)) AS BIGINT) AS alpha_permille,
         | CASE WHEN len(string_split(text, ' ')) >= 5
         |       AND CAST(round(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text)) AS BIGINT) >= 500
         |      THEN 1 ELSE 0 END AS keep
         |FROM documents""".stripMargin,
    "t03_tokens" ->
      """SELECT lang, count(*) AS n_docs,
        | sum(len(regexp_split_to_array(trim(text), '\s+'))) AS total_ws_tokens,
        | sum(len(regexp_extract_all(text, '[a-zA-Z]+'))) AS total_word_tokens,
        | sum(length(text)) AS total_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "t04_fingerprint" ->
      """WITH n AS (
        | SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        | FROM documents)
        |SELECT doc_id, md5(norm) AS fp_full,
        | md5(array_to_string(string_split(norm, ' ')[1:8], ' ')) AS fp_head
        |FROM n""".stripMargin,
  )
}
