package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r12 HOF hot-loop fixes: long-document A/B of the
  * retired quadratic forms vs their linear replacements, at the document
  * length where the asymptotics (not the fixture's ~200-char docs) decide.
  *
  * mm10: transform(sequence)/aggregate(sequence) frame energies — each
  * `substring(text, p, 1)` is an O(p) UTF8String seek — vs the one-pass
  * `frame_energies` kernel.
  * t31: filter-inside-filter hapax (O(distinct x tokens) per doc) vs the
  * sorted-run fold (O(n log n)).
  */
object R12HotLoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nDocs = if (args.nonEmpty) args(0).toInt else 2000
    val docLen = if (args.length > 1) args(1).toInt else 20000
    // `nonascii` arg: salt the text with 2-byte chars — UTF8String's
    // substring ASCII fast path no longer applies, so the O(p)-seek
    // asymptotics of the retired substring forms become visible
    val salt = if (args.length > 2 && args(2) == "nonascii")
      "IF((id + p) % 11 = 0, 'é', char(97 + CAST((id * 131 + p * 17) % 23 AS INT)))"
    else "char(97 + CAST((id * 131 + p * 17) % 23 AS INT))"
    // deterministic pseudo-text: verse-varied chars + spaces every ~7
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        expr(s"""array_join(transform(sequence(1, $docLen),
          |  p -> IF((id * 31 + p) % 7 = 0, ' ', $salt)), '')"""
          .stripMargin).as("text"))
      .localCheckpoint() // materialize so generation is outside every timer

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    time(s"mm10 HOF chain   n=$nDocs len=$docLen") {
      docs.withColumn("e", expr(
        """transform(
          |  sequence(CAST(0 AS BIGINT),
          |    CAST((greatest(length(text), 1) - 1) div 100 AS BIGINT)),
          |  f -> aggregate(
          |    sequence(f * 100 + 1, least(CAST(length(text) AS BIGINT), (f + 1) * 100)),
          |    CAST(0 AS BIGINT),
          |    (a, p) -> a + ascii(substring(text, CAST(p AS INT), 1))))"""
          .stripMargin))
        .select(sum(expr("aggregate(e, 0L, (a, b) -> a + b)"))).collect()
      nDocs.toLong
    }
    time(s"mm10 kernel      n=$nDocs len=$docLen") {
      docs.withColumn("e", graft.functions.F.frameEnergies(col("text")))
        .select(sum(expr("aggregate(e, 0L, (a, b) -> a + b)"))).collect()
      nDocs.toLong
    }
    time(s"mm03 md5(substr) n=$nDocs len=$docLen") {
      docs.select(col("doc_id"), col("text"),
          expr("CAST(length(text) AS BIGINT) div 100").as("maxf"))
        .withColumn("f", explode(expr(
          "sequence(CAST(0 AS BIGINT), maxf, CAST(2 AS BIGINT))")))
        .select(md5(expr("substring(text, f * 100 + 1, 100)")).as("m"))
        .agg(count("m")).collect()
      nDocs.toLong
    }
    time(s"mm03 kernel      n=$nDocs len=$docLen") {
      docs.select(posexplode(graft.functions.F.frameMd5s(col("text")))
          .as(Seq("pos", "m")))
        .filter(col("pos") % 2 === 0)
        .agg(count("m")).collect()
      nDocs.toLong
    }
    time(s"mm05 old agg     n=$nDocs len=$docLen") {
      docs.select(col("doc_id"), col("text"),
          explode(expr("sequence(CAST(0 AS BIGINT), " +
            "CAST((length(text) - 1) div 100 AS BIGINT))")).as("frame"))
        .select(expr("""aggregate(
          |  sequence(frame * 100 + 1, least(CAST(length(text) AS BIGINT), (frame + 1) * 100)),
          |  CAST(0 AS BIGINT),
          |  (a, p) -> a + ascii(substring(text, CAST(p AS INT), 1)))""".stripMargin)
          .as("energy"))
        .agg(sum("energy")).collect()
      nDocs.toLong
    }
    time(s"mm05 kernel      n=$nDocs len=$docLen") {
      docs.select(posexplode(graft.functions.F.frameEnergies(col("text")))
          .as(Seq("pos", "energy")))
        .agg(sum("energy")).collect()
      nDocs.toLong
    }
    time(s"mm04 transform   n=$nDocs len=$docLen") {
      docs.select(md5(expr(
          "concat_ws('', transform(sequence(1, length(text), 4), " +
            "p -> substring(text, p, 1)))")).as("r"))
        .agg(count("r")).collect()
      nDocs.toLong
    }
    time(s"mm04 kernel      n=$nDocs len=$docLen") {
      docs.select(md5(graft.functions.F.strideSample(col("text"), 4)).as("r"))
        .agg(count("r")).collect()
      nDocs.toLong
    }
    time(s"t31 quad hapax   n=$nDocs len=$docLen") {
      docs.select(split(col("text"), " ").as("t"))
        .select(expr("cast(size(filter(array_distinct(t), " +
          "x -> size(filter(t, y -> y = x)) = 1)) as bigint)").as("hapax"))
        .agg(sum("hapax")).collect()
      nDocs.toLong
    }
    time(s"t31 sorted fold  n=$nDocs len=$docLen") {
      docs.select(split(col("text"), " ").as("t"))
        .select(expr("""cast(aggregate(
          |  array_sort(t),
          |  named_struct('prev', CAST(NULL AS STRING),
          |               'run', CAST(0 AS BIGINT), 'h', CAST(0 AS BIGINT)),
          |  (acc, x) -> IF(acc.prev IS NOT NULL AND x = acc.prev,
          |    named_struct('prev', x, 'run', acc.run + 1L, 'h', acc.h),
          |    named_struct('prev', x, 'run', CAST(1 AS BIGINT),
          |      'h', acc.h + IF(acc.run = 1L, 1L, 0L))),
          |  acc -> acc.h + IF(acc.run = 1L, 1L, 0L)) as bigint)"""
          .stripMargin).as("hapax"))
        .agg(sum("hapax")).collect()
      nDocs.toLong
    }
    spark.stop()
  }
}
