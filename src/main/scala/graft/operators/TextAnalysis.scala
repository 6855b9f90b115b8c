package graft.operators

import graft.{Op, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis surface for large-scale training-data pipelines, over the
  * `documents` fixture: token statistics, heuristic language ID, quality
  * scoring, and winnowing fingerprints.
  *
  * Parity rules with the DuckDB oracle: tokenization is a plain
  * single-space split on both sides; all ratios divide exact integers cast
  * to double; hashes are md5-prefix-based (identical in both engines). All
  * computation is per-row Catalyst expressions (no UDFs except the codegen'd
  * native expressions) — fully parallel, no shuffles except the final sort.
  */
object TextAnalysis {

  private val stop = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pour", "dans", "que"),
    "es" -> Seq("el", "los", "y", "es", "para", "con", "por", "una"))

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
  /** Count tokens (with multiplicity) that belong to `ws`. */
  private def hitExpr(ws: Seq[String]) =
    s"size(filter(split(text, ' '), t -> t IN (${sqlList(ws)})))"
  private def sqlHit(ws: Seq[String]) =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${sqlList(ws)})))"

  private val t06 = Op(
    "t06_rolling_fingerprint",
    (s, d) =>
      // Winnowing as ONE fused codegen'd expression (winnow_poly: rolling
      // k=8 hashes + w=4 sliding minima via monotonic deque + dedupe in a
      // single pass — functions/expressions.scala): shuffle-free like the
      // r5 array-domain form, but without materializing the two length-n
      // intermediate arrays per document that form built. Only the final
      // presentation sort moves data.
      T.documents(s, d)
        .select(col("doc_id"),
          explode(call_function("winnow_poly", col("text"))).as("fp"))
        .orderBy("doc_id", "fp"),
    Some("""WITH base AS (
      |  SELECT doc_id, text, length(text) - 7 AS npos FROM documents
      |  WHERE length(text) - 7 >= 4),
      |pos AS (SELECT doc_id, npos, text,
      |        unnest(generate_series(1, npos)) AS pos FROM base),
      |h AS (SELECT doc_id, npos, pos,
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(0, 7),
      |          j -> CAST(unicode(text[pos+j:pos+j]) AS BIGINT))),
      |        (acc, c) -> (acc * 257 + c) % 1000000007) AS h FROM pos),
      |wmin AS (SELECT doc_id, pos, npos,
      |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM h)
      |SELECT DISTINCT doc_id, fp FROM wmin WHERE pos <= npos - 3
      |ORDER BY doc_id, fp""".stripMargin))

  val ops: Seq[Op] = Seq(
    t06,
    // ------------------------------------------------------------------
    Op(
      "t01_token_stats",
      (s, d) =>
        T.documents(s, d).select(
          col("doc_id"),
          expr("size(split(text, ' '))").cast(LongType).as("n_tokens"),
          expr("size(array_distinct(split(text, ' ')))").cast(LongType).as("n_uniq"),
          length(col("text")).cast(LongType).as("n_chars"),
          expr("aggregate(transform(split(text, ' '), t -> length(t)), 0, (acc, x) -> acc + x)")
            .cast(LongType).as("sum_token_len"))
          .withColumn("avg_token_len",
            (col("sum_token_len").cast(DoubleType) / col("n_tokens")).cast(DoubleType))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_token_len,
        |  CAST(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
        |       / len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "t02_lang_id",
      (s, d) =>
        T.documents(s, d).select(
          col("doc_id"), col("lang"),
          expr(hitExpr(stop("en"))).cast(LongType).as("s_en"),
          expr(hitExpr(stop("de"))).cast(LongType).as("s_de"),
          expr(hitExpr(stop("fr"))).cast(LongType).as("s_fr"),
          expr(hitExpr(stop("es"))).cast(LongType).as("s_es"))
          .withColumn("pred_lang",
            when(col("s_en") > 0 && col("s_en") >= col("s_de") &&
              col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
              .when(col("s_de") > 0 && col("s_de") >= col("s_fr") &&
                col("s_de") >= col("s_es"), "de")
              .when(col("s_fr") > 0 && col("s_fr") >= col("s_es"), "fr")
              .when(col("s_es") > 0, "es")
              .otherwise("und"))
          .orderBy("doc_id"),
      Some(s"""WITH sc AS (SELECT doc_id, lang,
        |  CAST(${sqlHit(stop("en"))} AS BIGINT) AS s_en,
        |  CAST(${sqlHit(stop("de"))} AS BIGINT) AS s_de,
        |  CAST(${sqlHit(stop("fr"))} AS BIGINT) AS s_fr,
        |  CAST(${sqlHit(stop("es"))} AS BIGINT) AS s_es
        |FROM documents)
        |SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
        |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |       WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
        |       WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'und' END AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    Op(
      "t03_quality_score",
      (s, d) =>
        T.documents(s, d).select(
          col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars"),
          expr("size(split(text, ' '))").cast(LongType).as("n_tokens"),
          expr(hitExpr(stop("en"))).cast(LongType).as("stop_cnt"),
          expr("size(filter(split(text, ' '), t -> length(t) >= 6))")
            .cast(LongType).as("long_cnt"))
          .withColumn("stop_ratio",
            (col("stop_cnt").cast(DoubleType) / col("n_tokens")).cast(DoubleType))
          .withColumn("long_ratio",
            (col("long_cnt").cast(DoubleType) / col("n_tokens")).cast(DoubleType))
          .withColumn("len_score",
            when(col("n_chars").between(150, 450), 1.0).otherwise(0.0))
          .withColumn("quality",
            lit(0.4) * col("stop_ratio") + lit(0.3) * col("long_ratio") +
              lit(0.3) * col("len_score"))
          .orderBy("doc_id"),
      Some(s"""WITH m AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(${sqlHit(stop("en"))} AS BIGINT) AS stop_cnt,
        |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) >= 6)) AS BIGINT) AS long_cnt
        |FROM documents)
        |SELECT doc_id, n_chars, n_tokens, stop_cnt, long_cnt,
        |  CAST(CAST(stop_cnt AS DOUBLE) / n_tokens AS DOUBLE) AS stop_ratio,
        |  CAST(CAST(long_cnt AS DOUBLE) / n_tokens AS DOUBLE) AS long_ratio,
        |  CASE WHEN n_chars BETWEEN 150 AND 450 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS len_score,
        |  ((0.4::DOUBLE * (CAST(stop_cnt AS DOUBLE) / n_tokens))
        |   + (0.3::DOUBLE * (CAST(long_cnt AS DOUBLE) / n_tokens)))
        |   + (0.3::DOUBLE * CASE WHEN n_chars BETWEEN 150 AND 450 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) AS quality
        |FROM m ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    // BPE-ish regex tokenization (the brief's second tokenizer): lowercase
    // runs, digit runs, and single non-alnum marks — a pattern both Java
    // regex (Spark) and RE2 (DuckDB) interpret identically.
    Op(
      "t05_bpe_tokens",
      (s, d) =>
        T.documents(s, d).select(
          col("doc_id"),
          expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
            .cast(LongType).as("n_tokens"),
          expr("size(array_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)))")
            .cast(LongType).as("n_uniq"),
          expr("size(regexp_extract_all(text, '[0-9]+', 0))")
            .cast(LongType).as("n_number_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_uniq,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken): k=8-char shingles,
    // hash = md5 32-bit prefix, window w=4 minima, distinct per doc.
    Op(
      "t04_fingerprint",
      (s, d) =>
        // Fused winnowing expression (md5-prefix hash variant) — see t06.
        T.documents(s, d)
          .select(col("doc_id"),
            explode(call_function("winnow_md5", col("text"))).as("fp"))
          .orderBy("doc_id", "fp"),
      Some("""WITH base AS (
        |  SELECT doc_id, text, length(text) - 7 AS npos FROM documents
        |  WHERE length(text) - 7 >= 4),
        |pos AS (SELECT doc_id, npos, text,
        |        unnest(generate_series(1, npos)) AS pos FROM base),
        |h AS (SELECT doc_id, npos, pos,
        |      ('0x' || substr(md5(substring(text, pos, 8)), 1, 8))::BIGINT AS h FROM pos),
        |wmin AS (SELECT doc_id, pos, npos,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM h)
        |SELECT DISTINCT doc_id, fp FROM wmin WHERE pos <= npos - 3
        |ORDER BY doc_id, fp""".stripMargin)),
    // ------------------------------------------------------------------
    // Corpus-level term frequency top-k: explode tokens, count, rank.
    // Partial (map-side) aggregation collapses the token stream before the
    // shuffle; the final top-k is a single-partition sort of distinct-term
    // counts only.
    Op(
      "t07_term_topk",
      (s, d) =>
        T.documents(s, d)
          .select(explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("term")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term"))
          .limit(20),
      Some("""SELECT term, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE term <> ''
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin)),
    // ------------------------------------------------------------------
    // Bigram co-occurrence counts: adjacent token pairs per document (the
    // n-gram statistics pass of a corpus-analysis pipeline).
    Op(
      "t08_bigrams",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"))
            .as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          .filter(col("w1") =!= "" && col("w2") =!= "")
          .groupBy("w1", "w2")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 10)
          .orderBy(col("n").desc, col("w1"), col("w2")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i))
        |SELECT w1, w2, COUNT(*) AS n FROM bg
        |WHERE w1 <> '' AND w2 <> ''
        |GROUP BY w1, w2 HAVING COUNT(*) >= 10
        |ORDER BY n DESC, w1, w2""".stripMargin)),
    // ------------------------------------------------------------------
    // TF-IDF top terms per document. The idf is the RATIO N/df, not
    // log(N/df): natural-log implementations are not guaranteed bit-identical
    // across engines, while IEEE-754 multiply/divide are — the ranking is
    // order-equivalent (log is monotone) and the scores hash-match exactly.
    // Shape at scale: one token explode, two keyed aggregations, a term-keyed
    // join (df side is vocabulary-sized — AQE broadcasts it when small), and
    // a per-doc top-k window.
    Op(
      "t09_tfidf_topk",
      (s, d) => {
        val docs = T.documents(s, d)
        val tok = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val idf = tok.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term"))
        tf.join(idf, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            col("tf").cast(DoubleType) * col("n_docs") / col("df"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("score"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH tok AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> ''),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |idf AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok)
        |        GROUP BY term),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term,
        |       CAST(tf AS DOUBLE) * n_docs / df AS score
        |       FROM tf JOIN idf USING (term) CROSS JOIN nd),
        |r AS (SELECT doc_id, term, score,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        |      FROM sc)
        |SELECT doc_id, rk, term, score FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin)),
    // ------------------------------------------------------------------
    // Heavy hitters via approx_top_k (DataSketches frequent-items) — the
    // constant-memory substitute for t07's exact top-k at 100 TB. The oracle
    // cannot run the sketch, so the contract is engine-side booleans it CAN
    // hash-check (the q42 pattern), phrased tie-safely: (a) every reported
    // item's count equals its exact count (the sketch is exact while its
    // capacity holds); (b) every term STRICTLY above the 20th-place count
    // boundary is reported (boundary ties are the only legitimately
    // ambiguous picks). The boundary itself and the vocabulary size are
    // SQL-derivable and ride along as hash-gated values.
    Op(
      "t10_heavy_hitters",
      (s, d) => {
        val terms = T.documents(s, d)
          .select(explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
        val approx = terms
          .agg(expr("approx_top_k(term, 20, 65536)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("term"), col("e.count").as("approx_n"))
        val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
        val boundary = exact.orderBy(col("n").desc, col("term")).limit(20)
          .agg(min("n").as("b"))
        val checks = approx.join(exact, "term")
          .agg(min(col("approx_n") === col("n")).as("counts_exact"),
            count(lit(1)).as("k_reported"))
        val covered = exact.crossJoin(broadcast(boundary))
          .filter(col("n") > col("b"))
          .join(approx, Seq("term"), "left_anti")
          .agg(count(lit(1)).as("missed"))
        checks.crossJoin(covered).crossJoin(broadcast(boundary))
          .crossJoin(exact.agg(count(lit(1)).as("vocab")))
          .select(col("k_reported"), col("counts_exact"),
            (col("missed") === 0).as("covers_above_boundary"),
            col("b").as("boundary_count"), col("vocab"))
      },
      Some("""WITH tok AS (
        |  SELECT term FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> ''),
        |cnt AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
        |bd AS (SELECT MIN(n) AS b FROM (
        |  SELECT n FROM cnt ORDER BY n DESC, term LIMIT 20))
        |SELECT CAST(20 AS BIGINT) AS k_reported, true AS counts_exact,
        |  true AS covers_above_boundary, b AS boundary_count,
        |  (SELECT COUNT(*) FROM cnt) AS vocab
        |FROM bd""".stripMargin)),
    // ------------------------------------------------------------------
    // Repetition-ratio quality signal (the Gopher-style "fraction of
    // duplicated n-grams" filter used to drop boilerplate/templated docs
    // before LLM training): per document, the fraction of word-bigram
    // OCCURRENCES whose bigram appears more than once, and the share of the
    // single most frequent token. Shape at scale: one explode per signal and
    // two keyed aggregations — no self-joins, no windows over the corpus;
    // everything shuffles on (doc_id[, term]) only, so it scales like a word
    // count. Ratios are exact-integer divisions (IEEE-deterministic).
    Op(
      "t11_repetition_ratio",
      (s, d) => {
        val docs = T.documents(s, d)
        // tokenize once per row: split(text) referenced inside the lambda
        // would re-split the document per bigram position (O(n^2) per doc)
        val bi = docs
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
          .select(col("doc_id"),
            explode(expr(
              "transform(slice(ts, 1, size(ts) - 1)," +
                " (w, i) -> concat(w, ' ', element_at(ts, i + 2)))"))
              .as("bigram"))
        val biStats = bi.groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            sum("c").as("n_bigrams"),
            sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_occurrences"))
        val topWord = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(max("c").as("top_word_cnt"),
            sum("c").as("n_tokens"))
        biStats.join(topWord, "doc_id")
          .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
            col("dup_occurrences"),
            (col("dup_occurrences").cast(DoubleType) / col("n_bigrams"))
              .as("dup_bigram_frac"),
            col("top_word_cnt"),
            (col("top_word_cnt").cast(DoubleType) / col("n_tokens"))
              .as("top_word_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bi AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bigram
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |        FROM toks)),
        |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2),
        |bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_occurrences
        |       FROM bc GROUP BY doc_id),
        |tc AS (SELECT doc_id, term, COUNT(*) AS c FROM (
        |         SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |         FROM documents) WHERE term <> '' GROUP BY 1, 2),
        |tw AS (SELECT doc_id, MAX(c) AS top_word_cnt,
        |         CAST(SUM(c) AS BIGINT) AS n_tokens
        |       FROM tc GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_bigrams, dup_occurrences,
        |  CAST(dup_occurrences AS DOUBLE) / n_bigrams AS dup_bigram_frac,
        |  top_word_cnt,
        |  CAST(top_word_cnt AS DOUBLE) / n_tokens AS top_word_frac
        |FROM bs JOIN tw USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    // Per-source quota downsampling (source-mix rebalancing: cap how many
    // documents any one crawl/source contributes to the training corpus).
    // Deterministic "random" order inside each source comes from
    // md5(doc_id) — identical in both engines — so the kept set is stable
    // run to run. At 100 TB the window ranks only WITHIN one source
    // partition (shuffle on source); for a pathologically hot source the
    // two-stage variant — hash-threshold pre-filter to ~K survivors, then
    // the exact rank over survivors — bounds any single partition, same as
    // d02's DF cap. Cap=5 exercises both kept and dropped docs on the
    // fixture.
    Op(
      "t12_source_quota",
      (s, d) => {
        val w = Window.partitionBy("source")
          .orderBy(col("pick"), col("doc_id"))
        T.documents(s, d)
          .select(col("doc_id"), col("source"),
            md5(col("doc_id").cast(StringType).cast(BinaryType)).as("pick"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("doc_id"), col("source"), col("rk"))
          .orderBy("source", "rk")
      },
      Some("""SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin)),
    // ------------------------------------------------------------------
    // PII redaction (the scrub step every training-data pipeline runs
    // before release): mask every digit in the identifier-bearing column,
    // then PROVE the redaction with hash-gated invariants — no digit
    // survives in any masked value, the masked forms collapse to one
    // pattern per group, and the redacted-character count is exact. Pure
    // codegen'd regexp_replace in the scan projection: zero shuffle beyond
    // the final group-by, so redaction is scan-cost at 100 TB. (DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all.)
    Op(
      "t13_pii_mask",
      (s, d) =>
        T.customer(s, d)
          .select(col("c_mktsegment"), col("c_name"),
            regexp_replace(col("c_name"), "[0-9]", "X").as("masked"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            (sum(when(col("masked").rlike("[0-9]"), 1L).otherwise(0L)) === 0L)
              .as("no_digit_survives"),
            countDistinct(col("masked")).as("masked_forms"),
            sum(length(col("c_name")) - length(regexp_replace(col("c_name"), "[0-9]", "")))
              .cast(LongType).as("digits_redacted"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
        |  true AS no_digit_survives,
        |  COUNT(DISTINCT regexp_replace(c_name, '[0-9]', 'X', 'g')) AS masked_forms,
        |  CAST(SUM(length(c_name) -
        |    length(regexp_replace(c_name, '[0-9]', '', 'g'))) AS BIGINT)
        |    AS digits_redacted
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),
    // ------------------------------------------------------------------
    // Concatenate-and-chunk sequence packing (how pretraining pipelines turn
    // variable-length documents into fixed-size training sequences): within
    // each source shard, documents concatenate in doc_id order and chunk
    // into 128-token sequences; each sequence reports how many documents
    // start inside it, its token count, and how many of those documents
    // spill across its boundary. The running offset is a window sum WITHIN
    // one source partition — shuffle on source only, shard-parallel at
    // 100 TB, no global ordering anywhere.
    Op(
      "t14_sequence_pack",
      (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        T.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast(LongType).as("n_tok"))
          .withColumn("off", coalesce(sum("n_tok").over(w), lit(0L)))
          .select(col("source"), col("n_tok"),
            expr("off DIV 128").as("seq_id"),
            expr("(off + n_tok - 1) DIV 128").as("end_seq"))
          .groupBy("source", "seq_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
            sum(when(col("end_seq") > col("seq_id"), 1L).otherwise(0L))
              .as("n_spanning"))
          .orderBy("source", "seq_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |o AS (
        |  SELECT source, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM t)
        |SELECT source, CAST(off // 128 AS BIGINT) AS seq_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN (off + n_tok - 1) // 128 > off // 128
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    // ------------------------------------------------------------------
    // Hashed-feature linear quality classifier (the fasttext-style scoring
    // pass corpus pipelines run on every document): each token hashes to a
    // signed weight in [-500, 500] (md5-prefix hashing — identical in both
    // engines) and the document score is the token-weight mean. The sum
    // stays in the integer domain until ONE final division, so the double
    // is bit-exact and order-independent; the whole op is a per-row
    // projection — scan-cost at 100 TB, no shuffle beyond the final sort.
    Op(
      "t15_hashed_classifier",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
            expr(
              "aggregate(split(text, ' '), CAST(0 AS BIGINT), (acc, t) -> " +
                "acc + (CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % 1001) - 500)")
              .as("score_num"))
          .select(col("doc_id"), col("n_tokens"), col("score_num"),
            (col("score_num").cast(DoubleType) /
              (col("n_tokens") * 1000L).cast(DoubleType)).as("score"),
            (col("score_num") > 0L).as("keep"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      t -> (('0x' || substr(md5(t), 1, 8))::BIGINT % 1001) - 500)),
        |    (a, b) -> a + b) AS BIGINT) AS score_num,
        |  CAST(score_num AS DOUBLE) / (n_tokens * 1000) AS score,
        |  score_num > 0 AS keep
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    // Corpus-LM token-rarity score (the CCNet-style quality signal without
    // the transcendental: rank documents by how UNUSUAL their tokens are
    // under a unigram model of the corpus itself). Per token the weight is
    // total/count — exact IEEE division both engines — and the per-doc sum
    // folds in token-position order (sorted collect + left fold here,
    // list_reduce over an ORDER BY pos list there), so the double is
    // bit-identical despite FP addition being order-dependent. The corpus
    // model is one vocab-bounded aggregate; the weight join is
    // vocab-sized (AQE broadcasts it when small, same shape as t09's idf
    // join).
    Op(
      "t16_token_rarity",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "term")
        val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
        val total = counts.agg(sum("c").as("total"))
        val weighted = toks.join(counts, "term").crossJoin(broadcast(total))
          .select(col("doc_id"), col("pos"),
            (col("total").cast(DoubleType) / col("c").cast(DoubleType)).as("w"))
        weighted.groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            expr("aggregate(transform(array_sort(collect_list(struct(pos, w)))," +
              " p -> p.w), CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("rarity_sum"))
          .select(col("doc_id"), col("n_tokens"),
            (col("rarity_sum") / col("n_tokens").cast(DoubleType)).as("rarity"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, ts[i] AS term, i AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts,
        |          unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        |        FROM documents)),
        |counts AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM counts),
        |w AS (SELECT doc_id, pos,
        |        CAST(total AS DOUBLE) / CAST(c AS DOUBLE) AS w
        |      FROM toks JOIN counts USING (term), tot)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(w ORDER BY pos)), (a, b) -> a + b) / COUNT(*) AS rarity
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    // Text normalization (the first stage of every ingest pipeline):
    // lowercase, strip non-alphanumerics, collapse whitespace — run over
    // the raw JSON props strings (the messiest text in the fixtures) and
    // rolled up per event type with integer-exact length/distinct stats.
    // Pure codegen'd regexp in the scan projection: scan-cost at 100 TB,
    // one partial-agg shuffle. (DuckDB regexp_replace needs the 'g' flag
    // for Spark's replace-all semantics.)
    Op(
      "t17_normalize",
      (s, d) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("props")), "[^a-z0-9 ]", " "), " +", " "))
        T.events(s, d)
          .select(col("event_type"), col("props"), norm.as("norm"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(length(col("props"))).cast(LongType).as("chars_before"),
            sum(length(col("norm"))).cast(LongType).as("chars_after"),
            countDistinct(col("norm")).as("distinct_norms"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(length(props)) AS BIGINT) AS chars_before,
        |  CAST(SUM(length(trim(regexp_replace(regexp_replace(lower(props),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))) AS BIGINT)
        |    AS chars_after,
        |  COUNT(DISTINCT trim(regexp_replace(regexp_replace(lower(props),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS distinct_norms
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    // ------------------------------------------------------------------
    // Deterministic train/val/test hash split (how corpus pipelines assign
    // holdout membership WITHOUT a coordinated shuffle: hash the stable
    // document id, bucket mod 100, 90/5/5). Membership is a pure projection
    // — any executor, any partitioning, any day recomputes the same
    // assignment, which is what makes the split reproducible at 100 TB and
    // immune to re-partitioning. The rollup proves the buckets are
    // disjoint-and-exhaustive per source (counts sum to the source total by
    // construction; the boolean gates it explicitly).
    Op(
      "t18_hash_split",
      (s, d) => {
        val docs = T.documents(s, d)
          .withColumn("bucket", expr(
            "CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 100"))
          .withColumn("split",
            when(col("bucket") < 90, "train")
              .when(col("bucket") < 95, "val").otherwise("test"))
        val lo = when(col("split") === "train", 0L)
          .when(col("split") === "val", 90L).otherwise(95L)
        val hi = when(col("split") === "train", 90L)
          .when(col("split") === "val", 95L).otherwise(100L)
        val bySplit = docs.groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast(LongType).as("n_chars"),
            min("bucket").as("bucket_min"), max("bucket").as("bucket_max"))
        val totals = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
        bySplit.join(totals, "source")
          .select(col("source"), col("split"), col("n_docs"), col("n_chars"),
            col("n_total"),
            (col("bucket_min") >= lo && col("bucket_max") < hi)
              .as("buckets_disjoint"))
          .orderBy("source", "split")
      },
      Some("""WITH b AS (
        |  SELECT source, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |      AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT source,
        |    CASE WHEN bucket < 90 THEN 'train'
        |         WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
        |    COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    MIN(bucket) AS bucket_min, MAX(bucket) AS bucket_max
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT source, COUNT(*) AS n_total FROM b GROUP BY 1)
        |SELECT source, split, n_docs, n_chars, n_total,
        |  bucket_min >= (CASE WHEN split = 'train' THEN 0
        |    WHEN split = 'val' THEN 90 ELSE 95 END)
        |  AND bucket_max < (CASE WHEN split = 'train' THEN 90
        |    WHEN split = 'val' THEN 95 ELSE 100 END) AS buckets_disjoint
        |FROM s JOIN t USING (source)
        |ORDER BY source, split""".stripMargin)),
    // ------------------------------------------------------------------
    // Temperature-scaled domain-mixture weights (the multi-corpus sampling
    // recipe: p_i^alpha / Z with alpha = 0.5 upweights rare sources so no
    // single crawl dominates the token budget). All mass fractions are
    // exact integer ratios; sqrt is a correctly-rounded IEEE primitive in
    // both engines; the ONLY order-dependent step — the normalizer Z, a sum
    // of doubles — folds in sorted source order (array_sort + fold here,
    // list(... ORDER BY source) + list_reduce there), so every output
    // double is bit-identical. Shape at scale: one keyed integer aggregate
    // over the corpus + a 1-row broadcast back — the per-source table is
    // tiny by definition.
    Op(
      "t19_domain_mixture",
      (s, d) => {
        val counts = T.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast(LongType).as("n_tok"))
          .groupBy("source").agg(sum("n_tok").as("n_tokens"))
        val total = counts.agg(sum("n_tokens").as("total"))
        val withP = counts.crossJoin(broadcast(total))
          .select(col("source"), col("n_tokens"),
            (col("n_tokens").cast(DoubleType) / col("total").cast(DoubleType))
              .as("p"))
          .withColumn("sqrtp", sqrt(col("p")))
        val z = withP
          .agg(expr("aggregate(transform(array_sort(collect_list(" +
            "struct(source, sqrtp))), x -> x.sqrtp), CAST(0 AS DOUBLE), " +
            "(acc, v) -> acc + v)").as("z"))
        withP.crossJoin(broadcast(z))
          .select(col("source"), col("n_tokens"), col("p"),
            (col("sqrtp") / col("z")).as("w"),
            ((col("sqrtp") / col("z")) / col("p")).as("boost"))
          .orderBy("source")
      },
      Some("""WITH counts AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM counts),
        |p AS (SELECT source, n_tokens,
        |        CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS p,
        |        sqrt(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)) AS sqrtp
        |      FROM counts, tot),
        |z AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list(sqrtp ORDER BY source)), (a, b) -> a + b) AS z FROM p)
        |SELECT source, n_tokens, p, sqrtp / z AS w,
        |  (sqrtp / z) / p AS boost
        |FROM p, z ORDER BY source""".stripMargin)),
    // ------------------------------------------------------------------
    // Sliding-window chunking (the retrieval/embedding prep step: fixed
    // 32-token windows, stride 16, so consecutive chunks overlap by half and
    // no boundary sentence is lost). Chunk starts come from an integer
    // sequence per document — a pure explode in the scan projection, no
    // shuffle at all until the presentation sort — so chunking is scan-cost
    // and embarrassingly parallel at 100 TB: a document never needs to see
    // another document, and chunk ids are derivable (not assigned), so no
    // global counter exists.
    Op(
      "t20_chunk_windows",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
          .withColumn("start",
            explode(expr("sequence(1L, n_tokens, 16L)")))
          .select(col("doc_id"), col("n_tokens"),
            expr("(start - 1) DIV 16").as("chunk_idx"),
            col("start"),
            least(lit(32L), col("n_tokens") - col("start") + 1L)
              .as("chunk_len"))
          .withColumn("is_full", col("chunk_len") === 32L)
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    unnest(generate_series(1, n_tokens, 16)) AS start
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST((start - 1) // 16 AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(LEAST(32, n_tokens - start + 1) AS BIGINT) AS chunk_len,
        |  LEAST(32, n_tokens - start + 1) = 32 AS is_full
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),
    // ------------------------------------------------------------------
    // Gopher-style quality-rule battery (the published rule set behind
    // large-corpus pre-filters: doc length bounds, mean word length
    // bounds, alphabetic-word ratio, symbol ratio, stopword presence —
    // see PAPERS.md). Unlike t03's weighted score this emits each rule's
    // verdict separately plus the conjunctive keep decision, which is what
    // a curation pipeline audits ("why was this dropped"). All metrics are
    // per-row expressions over one tokenization — scan-cost, shuffle-free
    // except the presentation sort; ratios divide exact integers cast to
    // double so both engines agree bitwise.
    Op(
      "t21_gopher_rules",
      (s, d) => {
        val allStop = stop.values.flatten.toSeq
        T.documents(s, d).select(
          col("doc_id"),
          expr("size(split(text, ' '))").cast(LongType).as("n_tokens"),
          expr("aggregate(split(text, ' '), 0L, (a, t) -> a + length(t))")
            .as("sum_len"),
          expr("size(filter(split(text, ' '), t -> t RLIKE '[a-zA-Z]'))")
            .cast(LongType).as("alpha_cnt"),
          expr("size(filter(split(text, ' '), " +
            "t -> t RLIKE '^[^a-zA-Z0-9]+$'))").cast(LongType).as("sym_cnt"),
          expr(hitExpr(allStop)).cast(LongType).as("stop_hits"))
          .withColumn("mean_tok_len",
            (col("sum_len").cast(DoubleType) / col("n_tokens")).cast(DoubleType))
          .withColumn("alpha_ratio",
            (col("alpha_cnt").cast(DoubleType) / col("n_tokens")).cast(DoubleType))
          .withColumn("sym_ratio",
            (col("sym_cnt").cast(DoubleType) / col("n_tokens")).cast(DoubleType))
          .withColumn("word_count_ok", col("n_tokens").between(15L, 500L))
          .withColumn("mean_len_ok",
            col("mean_tok_len") >= 3.0 && col("mean_tok_len") <= 10.0)
          .withColumn("alpha_ok", col("alpha_ratio") >= 0.8)
          .withColumn("sym_ok", col("sym_ratio") < 0.1)
          .withColumn("stop_ok", col("stop_hits") >= 2L)
          .withColumn("keep",
            col("word_count_ok") && col("mean_len_ok") && col("alpha_ok") &&
              col("sym_ok") && col("stop_ok"))
          .select("doc_id", "n_tokens", "mean_tok_len", "alpha_ratio",
            "sym_ratio", "stop_hits", "word_count_ok", "mean_len_ok",
            "alpha_ok", "sym_ok", "stop_ok", "keep")
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS sum_len,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS alpha_cnt,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> regexp_matches(t, '^[^a-zA-Z0-9]+$$'))) AS BIGINT) AS sym_cnt,
        |  CAST(${sqlHit(stop.values.flatten.toSeq)} AS BIGINT) AS stop_hits
        |FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |  CAST(CAST(sum_len AS DOUBLE) / n_tokens AS DOUBLE) AS mean_tok_len,
        |  CAST(CAST(alpha_cnt AS DOUBLE) / n_tokens AS DOUBLE) AS alpha_ratio,
        |  CAST(CAST(sym_cnt AS DOUBLE) / n_tokens AS DOUBLE) AS sym_ratio,
        |  stop_hits,
        |  n_tokens BETWEEN 15 AND 500 AS word_count_ok,
        |  (CAST(sum_len AS DOUBLE) / n_tokens) >= 3.0
        |    AND (CAST(sum_len AS DOUBLE) / n_tokens) <= 10.0 AS mean_len_ok,
        |  (CAST(alpha_cnt AS DOUBLE) / n_tokens) >= 0.8 AS alpha_ok,
        |  (CAST(sym_cnt AS DOUBLE) / n_tokens) < 0.1 AS sym_ok,
        |  stop_hits >= 2 AS stop_ok
        |FROM m)
        |SELECT doc_id, n_tokens, mean_tok_len, alpha_ratio, sym_ratio,
        |  stop_hits, word_count_ok, mean_len_ok, alpha_ok, sym_ok, stop_ok,
        |  word_count_ok AND mean_len_ok AND alpha_ok AND sym_ok AND stop_ok
        |    AS keep
        |FROM r ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------------
    // BPE-style merge TRAINING (the tokenizer/phrase-vocab learning loop,
    // word2phrase lineage): 3 rounds of "count every adjacent token pair
    // across the corpus, fuse the most frequent one everywhere, repeat".
    // Cross-engine parity scheme: the corpus rides as a separator-encoded
    // string — U+001F around every token, so boundaries are DOUBLE
    // separators and a pair's pattern (sep a sep sep b sep) can never
    // match overlapping occurrences; both engines' plain replace() is
    // left-to-right non-overlapping, which IS greedy BPE application, and
    // the fused token keeps a U+001E joint so later rounds can merge
    // merged tokens. Ties break (count desc, a asc, b asc) — binary
    // collation in both engines. The per-round argmax is a 1-row driver
    // action (control plane); everything heavy is scan + map-side-combined
    // pair counting, so each round is one aggregation pass at any corpus
    // size — exactly how distributed BPE trainers shard.
    Op(
      "t22_bpe_merge_train",
      (s, d) => {
        import s.implicits._
        val SEP = "\u001f"; val JOIN = "\u001e"
        def tokens(c: org.apache.spark.sql.Column) =
          split(trim(c, SEP), SEP + SEP)
        var corpus = T.documents(s, d)
          .select(concat(lit(SEP),
            array_join(split(col("text"), " "), SEP + SEP),
            lit(SEP)).as("s"))
          .persist()
        val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, Long)]()
        for (round <- 1 to 3) {
          val top = corpus.select(tokens(col("s")).as("tk"))
            .filter(size(col("tk")) >= 2)
            .withColumn("i", explode(expr("sequence(0, size(tk) - 2)")))
            .select(expr("tk[i]").as("a"), expr("tk[i + 1]").as("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("c"))
            .orderBy(col("c").desc, col("a"), col("b")).limit(1)
            .head() // 1-row argmax: the learned merge of this round
          val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
          val next = corpus
            .select(replace(col("s"),
              lit(SEP + a + SEP + SEP + b + SEP),
              lit(SEP + a + JOIN + b + SEP)).as("s"))
            .persist()
          val tokensAfter = next
            .select(size(tokens(col("s"))).cast(LongType).as("n"))
            .agg(sum("n")).head().getLong(0)
          corpus.unpersist(blocking = false)
          corpus = next
          out += ((round, a.replace(JOIN, "+"), b.replace(JOIN, "+"), c, tokensAfter))
        }
        corpus.unpersist(blocking = false)
        out.toSeq.toDF("round", "pair_a", "pair_b", "pair_n", "tokens_after")
          .orderBy("round")
      },
      Some {
        // the same 3 rounds unrolled as CTEs; CHR(31)/CHR(30) = the seps
        def roundCtes(k: Int): String =
          s"""p$k AS (
             |  SELECT tk[i] AS a, tk[i + 1] AS b, COUNT(*) AS c FROM (
             |    SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM (
             |      SELECT string_split(trim(s, CHR(31)), CHR(31) || CHR(31)) AS tk
             |      FROM d${k - 1}))
             |  GROUP BY 1, 2),
             |m$k AS (SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1),
             |d$k AS (
             |  SELECT replace(s,
             |    CHR(31) || (SELECT a FROM m$k) || CHR(31) || CHR(31) ||
             |      (SELECT b FROM m$k) || CHR(31),
             |    CHR(31) || (SELECT a FROM m$k) || CHR(30) ||
             |      (SELECT b FROM m$k) || CHR(31)) AS s
             |  FROM d${k - 1}),
             |n$k AS (
             |  SELECT SUM(len(string_split(trim(s, CHR(31)),
             |    CHR(31) || CHR(31)))) AS tokens_after
             |  FROM d$k)""".stripMargin
        s"""WITH d0 AS (
           |  SELECT CHR(31) || array_to_string(string_split(text, ' '),
           |    CHR(31) || CHR(31)) || CHR(31) AS s
           |  FROM documents),
           |${(1 to 3).map(roundCtes).mkString(",\n")}
           |SELECT CAST(r AS INTEGER) AS round,
           |  replace(a, CHR(30), '+') AS pair_a,
           |  replace(b, CHR(30), '+') AS pair_b,
           |  CAST(c AS BIGINT) AS pair_n,
           |  CAST(tokens_after AS BIGINT) AS tokens_after
           |FROM (
           |  SELECT 1 AS r, a, b, c, (SELECT tokens_after FROM n1) AS tokens_after FROM m1
           |  UNION ALL
           |  SELECT 2, a, b, c, (SELECT tokens_after FROM n2) FROM m2
           |  UNION ALL
           |  SELECT 3, a, b, c, (SELECT tokens_after FROM n3) FROM m3)
           |ORDER BY round""".stripMargin
      }),
    // ------------------------------------------------------------------
    // DSIR-style importance selection (Xie et al., "Data Selection for
    // Language Models via Importance Resampling", NeurIPS 2023 lineage):
    // rank raw-corpus docs by affinity to a target domain (the src19
    // slice, the same convention d11's decontamination uses) using n-gram
    // statistics. INTEGER-EXACT surrogate for the log-likelihood ratio so
    // the ranking hash-matches across engines: per doc, num = how often
    // its bigrams occur in the target domain, den = how often they occur
    // in the whole raw corpus; importance = num/den (one IEEE division of
    // two exact int64 sums — identical everywhere) favors docs whose
    // phrasing is target-like but corpus-rare, which is the DSIR signal
    // without the engine-dependent low bits of log(). Scale shape: bigram
    // explode is scan-cost; the target table is domain-sized (broadcasts);
    // the corpus-count join shuffles once on the bigram key with map-side
    // partial counts; top-20 is a TakeOrdered, never a global sort.
    Op(
      "t23_importance_select",
      (s, d) => {
        val bi = T.documents(s, d)
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("tk"))
          .filter(size(col("tk")) >= 2)
          .withColumn("i", explode(expr("sequence(0, size(tk) - 2)")))
          .select(col("doc_id"), col("source"),
            concat(expr("tk[i]"), lit(" "), expr("tk[i + 1]")).as("g"))
          .persist()
        val target = bi.filter(col("source") === "src19")
          .groupBy("g").agg(count(lit(1)).as("ct"))
        val corpus = bi.filter(col("source") =!= "src19")
        val ccnt = corpus.groupBy("g").agg(count(lit(1)).as("cc"))
        corpus
          .join(broadcast(target), Seq("g"), "left")
          .join(ccnt, Seq("g"))
          .groupBy("doc_id")
          .agg(sum(coalesce(col("ct"), lit(0L))).as("target_hits"),
            sum(col("cc")).as("corpus_mass"),
            count(lit(1)).as("n_bigrams"))
          .withColumn("importance",
            (col("target_hits").cast(DoubleType) / col("corpus_mass"))
              .cast(DoubleType))
          .orderBy(col("importance").desc, col("doc_id")).limit(20)
          .select(col("doc_id"), col("n_bigrams"), col("target_hits"),
            col("corpus_mass"), col("importance"))
      },
      Some("""WITH bi AS (
        |  SELECT doc_id, source, tk[i] || ' ' || tk[i + 1] AS g FROM (
        |    SELECT doc_id, source, tk,
        |      unnest(generate_series(1, len(tk) - 1)) AS i FROM (
        |      SELECT doc_id, source, string_split(text, ' ') AS tk
        |      FROM documents)
        |    WHERE len(tk) >= 2)),
        |t AS (SELECT g, COUNT(*) AS ct FROM bi WHERE source = 'src19'
        |      GROUP BY g),
        |c AS (SELECT g, COUNT(*) AS cc FROM bi WHERE source <> 'src19'
        |      GROUP BY g),
        |r AS (
        |  SELECT b.doc_id,
        |    CAST(SUM(COALESCE(t.ct, 0)) AS BIGINT) AS target_hits,
        |    CAST(SUM(c.cc) AS BIGINT) AS corpus_mass,
        |    COUNT(*) AS n_bigrams
        |  FROM bi b LEFT JOIN t ON t.g = b.g JOIN c ON c.g = b.g
        |  WHERE b.source <> 'src19'
        |  GROUP BY b.doc_id)
        |SELECT doc_id, n_bigrams, target_hits, corpus_mass,
        |  CAST(CAST(target_hits AS DOUBLE) / corpus_mass AS DOUBLE)
        |    AS importance
        |FROM r ORDER BY importance DESC, doc_id LIMIT 20""".stripMargin)),
    // ------------------------------------------------------------------
    // Tokenizer APPLICATION at corpus scale — the consumer side of t22's
    // merge training: learn the 3 top merges on the full corpus (same
    // separator-encoded greedy-replace scheme, see t22 for the parity
    // argument), then apply them to every document and report the
    // per-source compression the learned vocabulary buys. This is the
    // "re-tokenize the whole 100 TB corpus with the new tokenizer" job:
    // each merge application is ONE scan-cost map pass (replace() is
    // per-row, no shuffle), and the before/after stats are map-side-
    // combined aggregates on `source` — so the whole op is 3 counting
    // passes + 3 map passes + 2 small aggregates regardless of corpus
    // size. compression divides two exact int64 sums once (IEEE-identical
    // in both engines), so the report hash-matches.
    Op(
      "t24_bpe_apply",
      (s, d) => {
        val SEP = "\u001f"; val JOIN = "\u001e"
        def tokens(c: org.apache.spark.sql.Column) =
          split(trim(c, SEP), SEP + SEP)
        var corpus = T.documents(s, d)
          .select(col("source"), concat(lit(SEP),
            array_join(split(col("text"), " "), SEP + SEP),
            lit(SEP)).as("s"))
          .persist()
        val before = corpus.groupBy("source")
          .agg(count(lit(1)).as("docs"),
            sum(size(tokens(col("s"))).cast(LongType)).as("tokens_before"))
        for (_ <- 1 to 3) {
          val top = corpus.select(tokens(col("s")).as("tk"))
            .filter(size(col("tk")) >= 2)
            .withColumn("i", explode(expr("sequence(0, size(tk) - 2)")))
            .select(expr("tk[i]").as("a"), expr("tk[i + 1]").as("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("c"))
            .orderBy(col("c").desc, col("a"), col("b")).limit(1)
            .head() // 1-row argmax: control plane, not data path
          val (a, b) = (top.getString(0), top.getString(1))
          val next = corpus
            .select(col("source"), replace(col("s"),
              lit(SEP + a + SEP + SEP + b + SEP),
              lit(SEP + a + JOIN + b + SEP)).as("s"))
            .persist()
          corpus.unpersist(blocking = false)
          corpus = next
        }
        val after = corpus.groupBy("source")
          .agg(sum(size(tokens(col("s"))).cast(LongType)).as("tokens_after"))
        val out = before.join(after, "source")
          .withColumn("saved", col("tokens_before") - col("tokens_after"))
          .withColumn("compression",
            (col("tokens_after").cast(DoubleType) / col("tokens_before"))
              .cast(DoubleType))
          .select("source", "docs", "tokens_before", "tokens_after",
            "saved", "compression")
          .orderBy("source")
        val materialized = out.localCheckpoint()
        corpus.unpersist(blocking = false)
        materialized
      },
      Some {
        def roundCtes(k: Int): String =
          s"""p$k AS (
             |  SELECT tk[i] AS a, tk[i + 1] AS b, COUNT(*) AS c FROM (
             |    SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM (
             |      SELECT string_split(trim(s, CHR(31)), CHR(31) || CHR(31)) AS tk
             |      FROM d${k - 1}))
             |  GROUP BY 1, 2),
             |m$k AS (SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1),
             |d$k AS (
             |  SELECT source, replace(s,
             |    CHR(31) || (SELECT a FROM m$k) || CHR(31) || CHR(31) ||
             |      (SELECT b FROM m$k) || CHR(31),
             |    CHR(31) || (SELECT a FROM m$k) || CHR(30) ||
             |      (SELECT b FROM m$k) || CHR(31)) AS s
             |  FROM d${k - 1})""".stripMargin
        s"""WITH d0 AS (
           |  SELECT source, CHR(31) || array_to_string(string_split(text, ' '),
           |    CHR(31) || CHR(31)) || CHR(31) AS s
           |  FROM documents),
           |${(1 to 3).map(roundCtes).mkString(",\n")},
           |bf AS (
           |  SELECT source, COUNT(*) AS docs,
           |    SUM(len(string_split(trim(s, CHR(31)),
           |      CHR(31) || CHR(31)))) AS tokens_before
           |  FROM d0 GROUP BY source),
           |af AS (
           |  SELECT source,
           |    SUM(len(string_split(trim(s, CHR(31)),
           |      CHR(31) || CHR(31)))) AS tokens_after
           |  FROM d3 GROUP BY source)
           |SELECT bf.source, docs,
           |  CAST(tokens_before AS BIGINT) AS tokens_before,
           |  CAST(tokens_after AS BIGINT) AS tokens_after,
           |  CAST(tokens_before - tokens_after AS BIGINT) AS saved,
           |  CAST(CAST(tokens_after AS DOUBLE) / tokens_before AS DOUBLE)
           |    AS compression
           |FROM bf JOIN af ON af.source = bf.source
           |ORDER BY bf.source""".stripMargin
      }),
    // ------------------------------------------------------------------
    // CODE-SWITCHING detection — the data-quality signal t02's per-doc
    // majority vote cannot express: a document whose SECOND-strongest
    // stopword language carries >= 1/4 of the primary's hits is flagged
    // mixed (machine-translated boilerplate, concatenated crawls, spam
    // stitched across locales — the docs a monolingual filter silently
    // miscategorizes). Same per-row stopword hit counts as t02 (shared
    // stop lists), then pure integer array algebra (second-max via a
    // per-row sort of a 4-element array — constant work, no shuffle) and
    // a per-claimed-language rollup. All counts exact, so the mixing
    // profile hash-matches.
    Op(
      "t25_code_switching",
      (s, d) =>
        T.documents(s, d).select(
          col("doc_id"), col("lang"),
          expr(hitExpr(stop("en"))).cast(LongType).as("s_en"),
          expr(hitExpr(stop("de"))).cast(LongType).as("s_de"),
          expr(hitExpr(stop("fr"))).cast(LongType).as("s_fr"),
          expr(hitExpr(stop("es"))).cast(LongType).as("s_es"))
          .withColumn("hits",
            array(col("s_en"), col("s_de"), col("s_fr"), col("s_es")))
          .withColumn("n_langs_hit",
            expr("size(filter(hits, h -> h > 0))").cast(LongType))
          .withColumn("top1", expr("array_max(hits)"))
          .withColumn("top2", expr("element_at(sort_array(hits, false), 2)"))
          .withColumn("is_mixed", col("top2") > 0L &&
            col("top2") * 4L >= col("top1"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("is_mixed"), 1L).otherwise(0L)).as("n_mixed"),
            sum(when(col("n_langs_hit") === 0L, 1L).otherwise(0L)).as("n_und"),
            sum("n_langs_hit").as("sum_langs_hit"))
          .orderBy("lang"),
      Some(s"""WITH sc AS (SELECT doc_id, lang,
        |  CAST(${sqlHit(stop("en"))} AS BIGINT) AS s_en,
        |  CAST(${sqlHit(stop("de"))} AS BIGINT) AS s_de,
        |  CAST(${sqlHit(stop("fr"))} AS BIGINT) AS s_fr,
        |  CAST(${sqlHit(stop("es"))} AS BIGINT) AS s_es
        |FROM documents),
        |m AS (SELECT lang,
        |  len(list_filter([s_en, s_de, s_fr, s_es], h -> h > 0)) AS n_langs_hit,
        |  list_max([s_en, s_de, s_fr, s_es]) AS top1,
        |  list_sort([s_en, s_de, s_fr, s_es], 'DESC')[2] AS top2
        |FROM sc)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN top2 > 0 AND top2 * 4 >= top1
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
        |  CAST(SUM(CASE WHEN n_langs_hit = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_und,
        |  CAST(SUM(n_langs_hit) AS BIGINT) AS sum_langs_hit
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin)),
    // ------------------------------------------------------------------
    // CCNet-style LM quality filtering (Wenzek et al., "CCNet: Extracting
    // High Quality Monolingual Datasets from Web Crawl Data"): train a
    // per-language add-one-smoothed bigram LM on a deterministic 80% split,
    // score every held-out document by mean negative log-likelihood, and
    // bucket each language's scored docs into head/middle/tail terciles —
    // the standard perplexity-based curation gate for web corpora.
    // (Reference scope: the OMLDM pipeline has no text surface —
    // OMLDM_FlinkML/pom.xml:1 — this extends the engine for LLM curation.)
    //
    // Float-parity scheme: each bigram's NLL = ln(c1+V) - ln(c12+1) is an
    // irrational double, so the per-doc mean would be summation-order-
    // dependent. Per-element the value is quantized to DECIMAL(24,9)
    // (engine lns agree to ~1 ulp, 6 orders below the quantum), the sum is
    // then exact and order-independent, and the mean is rounded to 6 dp —
    // the ml17 convention.
    //
    // Scale shape: LM training is two partial-aggregated groupBys on
    // (lang,w1[,w2]) — map-side combine makes the shuffle O(distinct
    // bigrams), not O(tokens). Scoring joins exploded bigrams to the LM on
    // its natural key — an equi-shuffle that AQE handles, followed by a
    // per-doc partial agg. At 100 TB the LM itself is min-count-pruned
    // (hapax bigrams carry c12=1 ≈ the smoothing floor) to a broadcastable
    // table, turning scoring into a shuffle-free map-side join; the
    // unpruned build here keeps the oracle exact. The 5-row vocab table is
    // broadcast explicitly.
    Op(
      "t26_lm_perplexity",
      (s, d) => {
        val (c12, c1, voc) = lmArtifacts(s, d)
        val scored = lmBigrams(T.documents(s, d)
            .filter(col("doc_id") % 10 >= 8))
          .transform(lmScore(c12, c1, voc))
        lmBucket(scored.groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_bigrams"),
            round(sum(col("nllq")).cast(DoubleType) / count(lit(1)), 6)
              .as("nll")))
      },
      Some(lmOracleSql)),
    // ------------------------------------------------------------------
    // TEMPERATURE-SCALED LANGUAGE SAMPLING (the mBERT/mT5/XLM-R mixture
    // staple): resampling weights q_l ∝ p_l^α flatten the language
    // distribution so low-resource languages are seen more than their raw
    // share. α = 0.5 — the exponentiated-smoothing default — is
    // deliberately the ONE temperature whose power is an IEEE sqrt
    // (correctly rounded by the standard), so every q is bit-identical
    // cross-engine with no rounding tolerance anywhere: p is one exact
    // division of two longs, the normalizer sums pico-unit-quantized
    // sqrts (floor(x*1e12+0.5) — the ml18 idiom; a double→DECIMAL cast
    // would NOT parity: Spark casts via the shortest-repr string, DuckDB
    // via the exact binary expansion, and they disagree at digit 17-18),
    // and q / repeat_factor / sampled_docs are single IEEE ops on those. Scale shape: ONE partial-agg groupBy(lang)
    // leaves O(languages) rows; everything downstream is arithmetic on
    // the tiny aggregate joined back by two one-row broadcasts. At 100 TB
    // the output IS the sampling plan — q_l feeds t43-style weighted
    // draws or a per-language quota without touching the corpus again.
    Op(
      "t27_temperature_mix",
      (s, d) => temperatureMix(T.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))),
      Some(temperatureMixOracle)),
    // ------------------------------------------------------------------
    // PER-SOURCE DISTRIBUTION DRIFT — KL(source ‖ corpus) over unigram
    // token distributions: the curation signal that catches a crawl whose
    // vocabulary quietly diverged from the mixture (CUSUM/st26 watches a
    // numeric statistic; this watches the whole token distribution).
    // Source vocabularies are subsets of the corpus vocabulary by
    // construction, so every term's p_corpus > 0 and the sum is finite.
    // Scale shape: ONE (source, w) partial-agg scan; the corpus marginals
    // derive from that aggregate (no second corpus pass); the term join
    // keys on the token (shuffled equi-join at scale, the aggregate
    // already hash-partitioned by a compatible key) and the output is
    // O(sources). ln is rounded to 9 decimals into DECIMAL(24,9) before
    // summing (t26's idiom), making the reduction order-free.
    Op(
      "t28_source_kl_drift",
      (s, d) => sourceKl(T.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))),
      Some(sourceKlOracle)),
    // ------------------------------------------------------------------
    // VOCABULARY GROWTH CURVE (Heaps' law) over TRIGRAM types: |vocab|
    // within the first k tokens of the deterministic doc_id-ordered
    // stream, for a doubling grid of k — the sizing signal for tokenizer
    // training and OOV-rate forecasting (trigrams because this fixture's
    // unigram inventory saturates at 31 types inside the first window —
    // a flat curve gates nothing). All exact integers: the GLOBAL
    // position of a trigram is the per-doc cumulative token offset (a
    // window sum over O(docs) rows — never a token-level sort) plus the
    // in-doc position of its first token; each type's first occurrence
    // is a min aggregate; the curve is a sum-of-indicators against the
    // broadcast grid. Docs under 3 tokens are excluded on BOTH sides
    // (Spark's sequence() descends when stop < start — the empty-doc
    // divergence between engines lives exactly there). Scale shape: one
    // explode scan into a (type, min-index) partial agg, a TWO-PHASE
    // prefix sum for the offsets (per-bucket windows in parallel + a
    // bucket ledger 1000x smaller than the doc count — a single global
    // ORDER BY window would serialize every doc through one partition),
    // O(grid) output.
    Op(
      "t29_vocab_growth",
      (s, d) => {
        import s.implicits._
        val docs = T.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .withColumn("n_tok", size(col("t")).cast(LongType))
          .filter(col("n_tok") >= 3L)
          .withColumn("bkt", (col("doc_id") / lit(1000L)).cast(LongType))
        val wIn = Window.partitionBy("bkt").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bktOff = docs.groupBy("bkt").agg(sum("n_tok").as("btot"))
          .withColumn("boff",
            coalesce(sum("btot").over(org.apache.spark.sql.expressions
              .Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("bkt", "boff")
        val offs = docs
          .withColumn("inoff", coalesce(sum("n_tok").over(wIn), lit(0L)))
          .join(broadcast(bktOff), "bkt")
          .withColumn("off", col("boff") + col("inoff"))
        val firstPos = offs
          .withColumn("p", explode(expr("sequence(1, size(t) - 2)")))
          .select(
            expr("concat_ws(' ', element_at(t, p), element_at(t, p + 1), " +
              "element_at(t, p + 2))").as("w"),
            (col("off") + col("p")).as("gidx"))
          .groupBy("w").agg(min("gidx").as("first_idx"))
        val grid = Seq(1000L, 2000L, 4000L, 8000L, 16000L, 32000L,
          64000L, Long.MaxValue).toDF("k")
        firstPos.crossJoin(broadcast(grid))
          .groupBy("k")
          .agg(sum(when(col("first_idx") <= col("k"), 1L).otherwise(0L))
            .as("vocab"))
          .select(col("k"), col("vocab"))
          .orderBy("k")
      },
      Some(s"""WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |  WHERE CAST(len(string_split(text, ' ')) AS BIGINT) >= 3),
        |offs AS (
        |  SELECT doc_id, t,
        |    COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS off
        |  FROM docs),
        |fp AS (
        |  SELECT t[p] || ' ' || t[p+1] || ' ' || t[p+2] AS w,
        |    MIN(off + p) AS first_idx
        |  FROM offs,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS p)
        |  GROUP BY 1),
        |grid(k) AS (VALUES (CAST(1000 AS BIGINT)), (2000), (4000),
        |  (8000), (16000), (32000), (64000),
        |  (9223372036854775807))
        |SELECT k,
        |  CAST(SUM(CASE WHEN first_idx <= k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS vocab
        |FROM fp CROSS JOIN grid
        |GROUP BY k ORDER BY k""".stripMargin)),
    // ------------------------------------------------------------------
    // READABILITY PROFILE per language — the Flesch-style length/syllable
    // statistics quality filters cut on (docs with very long words or
    // dense syllable runs are OCR junk; very short ones are boilerplate).
    // "Syllables" are maximal vowel runs — the standard dictionary-free
    // approximation, identical regex in both engines. Parity: every
    // per-document feature is an exact integer (token/letter/vowel-run
    // counts); they aggregate as integer sums (order-independent), and the
    // three derived doubles are computed by the SAME literal expression
    // tree on bit-identical operands — one divide (+ for ease, two
    // multiplies and two subtracts, left-associated) at the very end.
    // Scale shape: pure per-row codegen'd expressions, map-side partial
    // agg to O(langs) rows, no shuffle beyond the 5-row final exchange.
    Op(
      "t30_readability",
      (s, d) => {
        T.documents(s, d)
          .select(col("lang"),
            expr("cast(size(split(text, ' ')) as bigint)").as("n_tok"),
            expr("cast(length(replace(text, ' ', '')) as bigint)").as("n_let"),
            expr("cast(size(regexp_extract_all(text, '[aeiou]+', 0)) as bigint)")
              .as("n_syl"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"),
            sum("n_let").as("let"), sum("n_syl").as("syl"))
          .select(col("lang"), col("n_docs"), col("tok").as("n_tokens"),
            (col("let").cast(DoubleType) / col("tok").cast(DoubleType))
              .as("avg_word_len"),
            (col("syl").cast(DoubleType) / col("tok").cast(DoubleType))
              .as("syll_per_word"),
            (lit(100.0)
              - lit(60.0) * (col("syl").cast(DoubleType) / col("tok").cast(DoubleType))
              - lit(10.0) * (col("let").cast(DoubleType) / col("tok").cast(DoubleType)))
              .as("ease"))
          .orderBy("lang")
      },
      Some("""WITH d AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_let,
        |    CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_syl
        |  FROM documents),
        |a AS (
        |  SELECT lang, COUNT(*) AS n_docs, SUM(n_tok) AS tok,
        |    SUM(n_let) AS let, SUM(n_syl) AS syl
        |  FROM d GROUP BY 1)
        |SELECT lang, n_docs, CAST(tok AS BIGINT) AS n_tokens,
        |  CAST(let AS DOUBLE) / CAST(tok AS DOUBLE) AS avg_word_len,
        |  CAST(syl AS DOUBLE) / CAST(tok AS DOUBLE) AS syll_per_word,
        |  100.0 - 60.0 * (CAST(syl AS DOUBLE) / CAST(tok AS DOUBLE))
        |        - 10.0 * (CAST(let AS DOUBLE) / CAST(tok AS DOUBLE)) AS ease
        |FROM a ORDER BY lang""".stripMargin)),
    // ------------------------------------------------------------------
    // LEXICAL-DIVERSITY DECILES — type-token ratio + hapax census, the
    // diversity cut curation stacks use next to t03/t21 (template spam has
    // low TTR, OCR noise has high hapax share). Everything stays in the
    // INTEGER domain: per-doc distinct/hapax counts are exact, the decile
    // is integer arithmetic ((10*distinct) DIV tokens, capped), and the
    // single double (corpus TTR per decile) is one divide of two exact
    // integer sums. The hapax count is a SORTED-RUN FOLD: sort the token
    // list once, then one aggregate pass whose struct accumulator
    // (prev, run, h) counts runs of length 1 — O(n log n) per doc and
    // planner-proof (no alias referenced inside a lambda, so
    // CollapseProject can't inline a recompute; the r12 HOF guard
    // retired the previous filter-inside-filter form, which was
    // O(distinct x tokens) per doc). Shuffle-free like the winnowing
    // family; only the O(10)-row aggregate exchanges.
    Op(
      "t31_lexical_diversity",
      (s, d) => {
        T.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .select(
            expr("cast(size(t) as bigint)").as("n_tok"),
            expr("cast(size(array_distinct(t)) as bigint)").as("n_dis"),
            expr("""cast(aggregate(
              |  array_sort(t),
              |  named_struct('prev', CAST(NULL AS STRING),
              |               'run', CAST(0 AS BIGINT),
              |               'h', CAST(0 AS BIGINT)),
              |  (acc, x) -> IF(acc.prev IS NOT NULL AND x = acc.prev,
              |    named_struct('prev', x, 'run', acc.run + 1L, 'h', acc.h),
              |    named_struct('prev', x, 'run', CAST(1 AS BIGINT),
              |      'h', acc.h + IF(acc.run = 1L, 1L, 0L))),
              |  acc -> acc.h + IF(acc.run = 1L, 1L, 0L)) as bigint)"""
              .stripMargin).as("hapax"))
          .select(expr("least((10 * n_dis) DIV n_tok, 9)").as("ttr_decile"),
            col("n_tok"), col("n_dis"), col("hapax"))
          .groupBy("ttr_decile")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
            sum("n_dis").as("sum_distinct"), sum("hapax").as("sum_hapax"))
          .withColumn("ttr",
            col("sum_distinct").cast(DoubleType) / col("sum_tok").cast(DoubleType))
          .orderBy("ttr_decile")
      },
      Some("""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |m AS (
        |  SELECT CAST(len(t) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(t)) AS BIGINT) AS n_dis,
        |    CAST(len(list_filter(list_distinct(t),
        |      x -> len(list_filter(t, y -> y = x)) = 1)) AS BIGINT) AS hapax
        |  FROM d),
        |b AS (
        |  SELECT LEAST((10 * n_dis) // n_tok, 9) AS ttr_decile,
        |    n_tok, n_dis, hapax
        |  FROM m)
        |SELECT ttr_decile, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
        |  CAST(SUM(n_dis) AS BIGINT) AS sum_distinct,
        |  CAST(SUM(hapax) AS BIGINT) AS sum_hapax,
        |  CAST(SUM(n_dis) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) AS ttr
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),
    // ------------------------------------------------------------------
    // STOPWORD-RATIO PROFILE — the function-word density histogram quality
    // filters cut on (natural prose has a stable stopword share; keyword
    // stuffing and template boilerplate sit at the extremes — the
    // C4/Gopher-style heuristic next to t03/t21/t31). Everything stays in
    // the INTEGER domain: the per-doc stopword count is an array-domain
    // membership filter over the token list (fixed 8-word function set),
    // the decile is integer arithmetic ((10*n_stop) DIV n_tok, capped),
    // and the only double is one divide of two exact integer sums per
    // O(10)-row group. Scale shape: pure per-row codegen'd expressions
    // (no explode — the membership count folds inside the projection),
    // map-side partial agg, nothing but the O(10)-row final exchange.
    Op(
      "t32_stopword_profile",
      (s, d) => {
        T.documents(s, d)
          .select(split(col("text"), " ").as("t"))
          .select(
            expr("cast(size(t) as bigint)").as("n_tok"),
            expr("cast(size(filter(t, x -> x IN " +
              "('the','a','of','and','to','in','is','it'))) as bigint)")
              .as("n_stop"))
          .select(expr("least((10 * n_stop) DIV n_tok, 9)").as("stop_decile"),
            col("n_tok"), col("n_stop"))
          .groupBy("stop_decile")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
            sum("n_stop").as("sum_stop"))
          .withColumn("stop_ratio",
            col("sum_stop").cast(DoubleType) / col("sum_tok").cast(DoubleType))
          .orderBy("stop_decile")
      },
      Some("""WITH d AS (
        |  SELECT string_split(text, ' ') AS t FROM documents),
        |m AS (
        |  SELECT CAST(len(t) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(t, x -> x IN
        |      ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stop
        |  FROM d),
        |b AS (
        |  SELECT LEAST((10 * n_stop) // n_tok, 9) AS stop_decile,
        |    n_tok, n_stop
        |  FROM m)
        |SELECT stop_decile, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
        |  CAST(SUM(n_stop) AS BIGINT) AS sum_stop,
        |  CAST(SUM(n_stop) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) AS stop_ratio
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),
    // ------------------------------------------------------------------
    // ZIPF SLOPE — the log-log least-squares fit of frequency vs rank over
    // the top-100 terms, the corpus-health diagnostic complementing t29's
    // Heaps law (a natural corpus fits slope ~ -1; boilerplate floods or
    // template spam bend it). Exactness scheme: ranks and frequencies are
    // exact integers; the top-100 cut is deterministic ((freq DESC, term)
    // — the bounded-heap aggregate again, never a corpus-wide term sort);
    // ln() differs across engines by ulps and the 100-point moment sums
    // are summation-order dependent, so slope/intercept are quantized at
    // 6 decimals (~7 orders above the drift), while n_terms and the
    // top-100 occupancy stay exact longs. Scale: the term count is one
    // shuffle with map-side partials; everything after is O(100).
    Op("t33_zipf_slope", (s, d) => {
      val cnt = T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
        .groupBy("t").agg(count(lit(1)).as("n"))
      val top = cnt
        .agg(graft.functions.F.topkStructs(
          struct((-col("n")).as("nn"), col("t")), 100).as("tk"))
        .select(posexplode(col("tk")))
        .select((col("pos") + 1).cast(DoubleType).as("rk"),
          (-col("col.nn")).as("n"))
      top
        .select(log(col("rk")).as("x"),
          log(col("n").cast(DoubleType)).as("y"), col("n"))
        .agg(count(lit(1)).cast(DoubleType).as("k"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"),
          sum("n").as("occ"))
        .select(
          round((col("k") * col("sxy") - col("sx") * col("sy")) /
            (col("k") * col("sx2") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - ((col("k") * col("sxy") - col("sx") * col("sy")) /
            (col("k") * col("sx2") - col("sx") * col("sx"))) * col("sx")) /
            col("k"), 6).as("intercept"),
          col("k").cast(LongType).as("n_terms"),
          col("occ").cast(LongType).as("top100_occurrences"))
    }, Some("""WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |cnt AS (SELECT t, COUNT(*) AS n FROM tok WHERE t <> '' GROUP BY t),
      |top AS (
      |  SELECT * FROM (
      |    SELECT ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rk, n FROM cnt)
      |  WHERE rk <= 100),
      |pts AS (
      |  SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y, n
      |  FROM top),
      |s AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(n) AS occ
      |  FROM pts)
      |SELECT
      |  ROUND((k * sxy - sx * sy) / (k * sx2 - sx * sx), 6) AS slope,
      |  ROUND((sy - ((k * sxy - sx * sy) / (k * sx2 - sx * sx)) * sx) / k, 6)
      |    AS intercept,
      |  CAST(k AS BIGINT) AS n_terms,
      |  CAST(occ AS BIGINT) AS top100_occurrences
      |FROM s""".stripMargin)),
    // ------------------------------------------------------------------
    // BM25 RETRIEVAL — the classic probabilistic ranking function
    // (Robertson-Sparck Jones k1=1.2, b=0.75, Lucene-style idf
    // ln(1 + (N-df+0.5)/(df+0.5))) over a broadcast query set: the
    // retrieval primitive curation stacks use for benchmark-similarity
    // ranking and targeted decontamination (complementing t09's tf-idf
    // and d11's exact-overlap cut). Exactness scheme: tf/df/dl/N are
    // exact integers; avgdl is one divide; each term's score is ONE
    // literal double expression shared verbatim with the oracle, then
    // ROUNDed at 6 dp into DECIMAL(18,6) — the t26 pattern: the lone
    // transcendental (ln) differs across engines by ulps ~1e-16, seven
    // orders below the quantum — so the per-(query,doc) SUM is exact
    // decimal addition, order-independent, and the top-10 cut
    // deterministic (ties break on doc_id). Scale shape: the postings
    // shuffle carries ONLY the ~6 broadcast query terms (semi-filtered
    // before any join); df/dl are t09's keyed aggregates; the per-query
    // top-10 is a WindowGroupLimit (bounded heaps, never a full sort of
    // the scored set).
    Op(
      "t34_bm25_retrieval",
      (s, d) => {
        val docs = T.documents(s, d)
        val toks = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
        val dlT = docs.select(col("doc_id"),
          expr("cast(size(filter(split(text, ' '), x -> x <> '')) as bigint)")
            .as("dl"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        bm25Rank(s, tf, dlT)
      },
      Some(bm25Oracle)),
    // ------------------------------------------------------------------
    // PMI COLLOCATIONS — pointwise mutual information over the directed
    // bigram table (Church & Hanks 1990): the collocation/MWE extractor
    // corpus pipelines use for tokenizer-vocabulary candidates and
    // boilerplate phrase discovery, complementing t08's raw bigram
    // frequencies (frequency finds "of the"; PMI finds phrases whose
    // parts predict each other). Exactness scheme: n_ab/n_a/n_b/n_tot
    // are exact integers from ONE bigram aggregate (marginals are sums
    // over it, not separate token passes); pmi is a fixed four-cast
    // double expression shared verbatim with the oracle, ROUNDed at 6 dp
    // into DECIMAL(18,6) (the t26 pattern) so the top-25 cut is
    // deterministic (ties on w1, w2). Min-count 5 applies the standard
    // sparse-PMI guard. Scale shape: one bigram-count shuffle (map-side
    // partials) + two vocabulary-keyed marginal joins; the final cut is
    // a bounded-heap aggregate, never a vocabulary-wide sort.
    Op("t35_pmi_collocations", (s, d) => {
      val bgc = T.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> " +
            "struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"))
          .as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
        .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
        .cache() // feeds both marginals + the total + the probe (d27 rule)
      val ca = bgc.groupBy("w1").agg(sum("n_ab").as("n_a"))
      val cb = bgc.groupBy("w2").agg(sum("n_ab").as("n_b"))
      val tot = bgc.agg(sum("n_ab").as("n_tot"))
      bgc.filter(col("n_ab") >= 5)
        .join(ca, "w1").join(cb, "w2")
        .crossJoin(broadcast(tot))
        .withColumn("pmi6", expr(
          "CAST(ROUND(ln((CAST(n_ab AS DOUBLE) * CAST(n_tot AS DOUBLE))" +
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6)" +
            " AS DECIMAL(18,6))"))
        .agg(graft.functions.F.topkStructs(
          struct((-col("pmi6")).as("np"), col("w1"), col("w2"),
            col("n_ab"), col("n_a"), col("n_b")), 25).as("tk"))
        .select(posexplode(col("tk")))
        .select((col("pos") + 1).cast(LongType).as("rk"),
          col("col.w1").as("w1"), col("col.w2").as("w2"),
          col("col.n_ab").as("n_ab"), col("col.n_a").as("n_a"),
          col("col.n_b").as("n_b"),
          (-col("col.np")).cast(DoubleType).as("pmi"))
        .orderBy("rk")
    }, Some("""WITH t AS (
      |  SELECT string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bgx AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2
      |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
      |bg AS (
      |  SELECT w1, w2, COUNT(*) AS n_ab FROM bgx
      |  WHERE w1 <> '' AND w2 <> '' GROUP BY 1, 2),
      |ca AS (SELECT w1, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM bg GROUP BY 1),
      |cb AS (SELECT w2, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM bg GROUP BY 1),
      |tt AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_tot FROM bg),
      |sc AS (
      |  SELECT bg.w1, bg.w2, bg.n_ab, ca.n_a, cb.n_b,
      |    CAST(ROUND(ln((CAST(bg.n_ab AS DOUBLE) * CAST(tt.n_tot AS DOUBLE))
      |      / (CAST(ca.n_a AS DOUBLE) * CAST(cb.n_b AS DOUBLE))), 6)
      |      AS DECIMAL(18,6)) AS pmi6
      |  FROM bg JOIN ca USING (w1) JOIN cb USING (w2), tt
      |  WHERE bg.n_ab >= 5),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi6 DESC, w1, w2) AS rk
      |  FROM sc)
      |SELECT CAST(rk AS BIGINT) AS rk, w1, w2, n_ab, n_a, n_b,
      |  CAST(pmi6 AS DOUBLE) AS pmi
      |FROM r WHERE rk <= 25 ORDER BY rk""".stripMargin)),
  )

  /** t34's fixed retrieval workload — shared with the incrementally-
    * maintained index twin (st41). */
  private[operators] val bm25QueryTerms: Seq[(String, String)] = Seq(
    ("q1", "spark"), ("q1", "join"),
    ("q2", "window"), ("q2", "sort"), ("q2", "merge"),
    ("q3", "stream"), ("q3", "batch"))

  /** t34's scoring arithmetic over the compacted (doc_id, term, tf) and
    * (doc_id, dl) index aggregates — shared with st41, whose per-trigger
    * partials compact to exactly these tables. See the t34 registration
    * for the exactness scheme (per-term 6-dp decimal quantization).
    */
  private[operators] def bm25Rank(s: SparkSession, tf: DataFrame,
      dlT: DataFrame): DataFrame = {
    import s.implicits._
    val qterms = bm25QueryTerms.toDF("query", "term")
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val st = dlT.agg(count(lit(1)).as("nd"), sum("dl").as("sdl"))
    val sc = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfT
        .join(broadcast(qterms.select("term").distinct()), "term")), "term")
      .join(dlT, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("s6", expr(
        "CAST(ROUND(" +
          "ln(1.0 + (CAST(nd - df AS DOUBLE) + 0.5)" +
          " / (CAST(df AS DOUBLE) + 0.5))" +
          " * (CAST(tf AS DOUBLE) * 2.2)" +
          " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *" +
          " (CAST(dl AS DOUBLE)" +
          " / (CAST(sdl AS DOUBLE) / CAST(nd AS DOUBLE)))))" +
          ", 6) AS DECIMAL(18,6))"))
    val agg = sc.groupBy("query", "doc_id")
      .agg(sum(col("s6")).as("score_dec"))
    val w = Window.partitionBy("query")
      .orderBy(col("score_dec").desc, col("doc_id"))
    agg.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 10)
      .select(col("query"), col("rk"), col("doc_id"),
        col("score_dec").cast(DoubleType).as("score"))
      .orderBy("query", "rk")
  }

  /** t34's DuckDB oracle, verbatim — also st41's gate: the streamed index
    * must reproduce the batch ranking bit-for-bit. */
  private[operators] lazy val bm25Oracle: String =
    s"WITH ${bm25CtesOver("documents")}\n${bm25FinalSelect}"

  /** The BM25 CTE chain parameterized over the corpus relation name, so a
    * composed pipeline (p07) can rank a CTE-defined clean corpus with the
    * IDENTICAL arithmetic. */
  private[operators] def bm25CtesOver(corpus: String): String =
      s"""d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM $corpus),
        |dlt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
        |tok AS (SELECT doc_id, unnest(t) AS term FROM d),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT COUNT(*) AS nd, SUM(dl) AS sdl FROM dlt),
        |q(query, term) AS (VALUES
        |  ('q1','spark'), ('q1','join'),
        |  ('q2','window'), ('q2','sort'), ('q2','merge'),
        |  ('q3','stream'), ('q3','batch')),
        |sc AS (
        |  SELECT q.query, tf.doc_id,
        |    CAST(ROUND(
        |      ln(1.0 + (CAST(st.nd - dft.df AS DOUBLE) + 0.5)
        |        / (CAST(dft.df AS DOUBLE) + 0.5))
        |      * (CAST(tf.tf AS DOUBLE) * 2.2)
        |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |        (CAST(dlt.dl AS DOUBLE)
        |         / (CAST(st.sdl AS DOUBLE) / CAST(st.nd AS DOUBLE)))))
        |      , 6) AS DECIMAL(18,6)) AS s6
        |  FROM tf JOIN q ON q.term = tf.term
        |  JOIN dft ON dft.term = tf.term
        |  JOIN dlt ON dlt.doc_id = tf.doc_id, st),
        |agg AS (SELECT query, doc_id, SUM(s6) AS sd FROM sc GROUP BY 1, 2),
        |rk AS (
        |  SELECT query, doc_id, sd,
        |    ROW_NUMBER() OVER (PARTITION BY query ORDER BY sd DESC, doc_id)
        |      AS rk
        |  FROM agg)""".stripMargin

  /** The final projection paired with [[bm25CtesOver]]. Lazy: [[bm25Oracle]]
    * is forced during object init (the `ops` val precedes this declaration),
    * and a strict val here would interpolate as null at that point. */
  private[operators] lazy val bm25FinalSelect: String =
    """SELECT query, CAST(rk AS BIGINT) AS rk, doc_id,
      |  CAST(sd AS DOUBLE) AS score
      |FROM rk WHERE rk <= 10 ORDER BY query, rk""".stripMargin

  /** t27's mixture arithmetic over a (lang, n_docs) counts table — shared
    * with the incrementally-maintained streaming twin (st34). */
  private[operators] def temperatureMix(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n_docs")).as("n_tot"))
    val p = counts.crossJoin(broadcast(tot))
      .withColumn("p",
        col("n_docs").cast(DoubleType) / col("n_tot").cast(DoubleType))
      .withColumn("sq", sqrt(col("p")))
    val z = p.agg((sum(floor(col("sq") * lit(1.0e12) + lit(0.5))
        .cast(LongType)).cast(DoubleType) / lit(1.0e12)).as("z"))
    p.crossJoin(broadcast(z))
      .withColumn("q", col("sq") / col("z"))
      .select(col("lang"), col("n_docs"), col("p"), col("q"),
        (col("q") / col("p")).as("repeat_factor"),
        floor(lit(1000000.0) * col("q") + lit(0.5)).cast(LongType)
          .as("sampled_docs"))
      .orderBy("lang")
  }

  /** t28's divergence arithmetic over a (source, w, c_sw) token-count
    * table — shared with the incrementally-maintained streaming twin
    * (st36). Every count is exact; the one transcendental (ln) is rounded
    * to 9 decimals into DECIMAL(24,9) before summing (the t26 idiom), so
    * the per-source sum is partition- and trigger-order free. */
  private[operators] def sourceKl(cntSw: DataFrame): DataFrame = {
    val cntW = cntSw.groupBy("w").agg(sum("c_sw").as("c_cw"))
    val nS = cntSw.groupBy("source").agg(sum("c_sw").as("n_s"))
    val nC = cntSw.agg(sum("c_sw").as("n_c"))
    cntSw
      .join(cntW, "w")
      .join(nS, "source")
      .crossJoin(broadcast(nC))
      .select(col("source"),
        round((col("c_sw").cast(DoubleType) / col("n_s").cast(DoubleType)) *
          log((col("c_sw") * col("n_c")).cast(DoubleType) /
            (col("c_cw") * col("n_s")).cast(DoubleType)), 9)
          .cast(DecimalType(24, 9)).as("term"),
        col("n_s"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        count(lit(1)).as("vocab_used"),
        sum(col("term")).cast(DoubleType).as("kl"))
      .orderBy("source")
  }

  private[operators] lazy val sourceKlOracle: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |csw AS (
      |  SELECT source, w, COUNT(*) AS c_sw FROM toks GROUP BY 1, 2),
      |cw AS (SELECT w, SUM(c_sw) AS c_cw FROM csw GROUP BY w),
      |ns AS (SELECT source, SUM(c_sw) AS n_s FROM csw GROUP BY source),
      |nc AS (SELECT SUM(c_sw) AS n_c FROM csw),
      |terms AS (
      |  SELECT csw.source,
      |    CAST(ROUND((CAST(c_sw AS DOUBLE) / CAST(n_s AS DOUBLE)) *
      |      ln(CAST(c_sw * n_c AS DOUBLE) / CAST(c_cw * n_s AS DOUBLE)), 9)
      |      AS DECIMAL(24, 9)) AS term,
      |    n_s
      |  FROM csw JOIN cw ON cw.w = csw.w
      |  JOIN ns ON ns.source = csw.source, nc)
      |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS vocab_used,
      |  CAST(SUM(term) AS DOUBLE) AS kl
      |FROM terms GROUP BY source ORDER BY source""".stripMargin

  private[operators] lazy val temperatureMixOracle: String =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |t AS (SELECT SUM(n_docs) AS n_tot FROM c),
      |s AS (
      |  SELECT lang, n_docs,
      |    CAST(n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE) AS p,
      |    SQRT(CAST(n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE)) AS sq
      |  FROM c, t),
      |z AS (
      |  SELECT CAST(SUM(CAST(FLOOR(sq * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 1e12 AS z
      |  FROM s)
      |SELECT lang, n_docs, p, sq / z AS q,
      |  (sq / z) / p AS repeat_factor,
      |  CAST(FLOOR(1000000.0 * (sq / z) + 0.5) AS BIGINT) AS sampled_docs
      |FROM s, z ORDER BY lang""".stripMargin

  /** Explode a documents frame into (doc_id, lang, w1, w2) bigram rows —
    * the shared tokenization contract of t26 (batch) and st32 (stream). */
  private[operators] def lmBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(expr(
          "transform(slice(t, 1, size(t)-1), (w, i) -> " +
            "struct(w AS w1, t[i+1] AS w2))")).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Train the per-language add-one bigram LM on the deterministic 80%
    * split: (bigram counts, context counts, vocab sizes). The two count
    * tables are persisted — st32's stream-static joins re-evaluate the
    * static side every trigger, and at 100 TB these are written once as
    * a table (min-count-pruned to broadcast size), not recomputed. */
  private[operators] def lmArtifacts(
      s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val docs = T.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
    val train = lmBigrams(T.documents(s, d).filter(col("doc_id") % 10 < 8))
    val c12 = train.groupBy("lang", "w1", "w2")
      .agg(count(lit(1)).as("c12")).persist()
    val c1 = train.groupBy("lang", "w1").agg(count(lit(1)).as("c1")).persist()
    val voc = docs.filter(col("doc_id") % 10 < 8)
      .select(col("lang"), explode(col("t")).as("tok"))
      .groupBy("lang").agg(countDistinct("tok").as("v"))
    (c12, c1, voc)
  }

  /** Per-bigram smoothed NLL, quantized to DECIMAL(24,9) so downstream
    * sums are order-independent (see t26's scaladoc). */
  private[operators] def lmScore(
      c12: DataFrame, c1: DataFrame, voc: DataFrame)(
      bg: DataFrame): DataFrame =
    bg.join(c12, Seq("lang", "w1", "w2"), "left")
      .join(c1, Seq("lang", "w1"), "left")
      .join(broadcast(voc), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        round(log(coalesce(col("c1"), lit(0L)) + col("v")) -
          log(coalesce(col("c12"), lit(0L)) + lit(1L)), 9)
          .cast(DecimalType(24, 9)).as("nllq"))

  /** Tercile bucketing + presentation order over per-doc NLL rows. */
  private[operators] def lmBucket(perDoc: DataFrame): DataFrame =
    perDoc.withColumn("bucket",
        ntile(3).over(Window.partitionBy("lang")
          .orderBy(col("nll"), col("doc_id"))).cast(LongType))
      .orderBy("doc_id")

  // lazy: referenced by the `ops` val above, which initializes first
  private[operators] lazy val lmOracleSql: String =
    """WITH tk AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, lang,
        |    unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM tk WHERE len(t) >= 2),
        |trbg AS (SELECT * FROM bg WHERE doc_id % 10 < 8),
        |c12 AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM trbg GROUP BY 1,2,3),
        |c1  AS (SELECT lang, w1, COUNT(*) AS c1 FROM trbg GROUP BY 1,2),
        |voc AS (
        |  SELECT lang, COUNT(DISTINCT tok) AS v FROM (
        |    SELECT lang, unnest(t) AS tok FROM tk WHERE doc_id % 10 < 8)
        |  GROUP BY 1),
        |sc AS (
        |  SELECT b.doc_id, b.lang,
        |    CAST(ROUND(ln(COALESCE(c1.c1, 0) + voc.v)
        |               - ln(COALESCE(c12.c12, 0) + 1), 9)
        |      AS DECIMAL(24, 9)) AS nllq
        |  FROM bg b
        |  LEFT JOIN c12 ON b.lang = c12.lang AND b.w1 = c12.w1
        |    AND b.w2 = c12.w2
        |  LEFT JOIN c1 ON b.lang = c1.lang AND b.w1 = c1.w1
        |  JOIN voc ON b.lang = voc.lang
        |  WHERE b.doc_id % 10 >= 8),
        |doc AS (
        |  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
        |    ROUND(CAST(SUM(nllq) AS DOUBLE) / COUNT(*), 6) AS nll
        |  FROM sc GROUP BY 1, 2)
        |SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams, nll,
        |  NTILE(3) OVER (PARTITION BY lang ORDER BY nll, doc_id) AS bucket
        |FROM doc ORDER BY doc_id""".stripMargin
}
