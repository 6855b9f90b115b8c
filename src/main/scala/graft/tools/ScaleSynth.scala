package graft.tools

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool for the r8 10x scale probe (SCALE.md): synthesize an
  * sf1-equivalent fixture from sf0.1 by key-offset replication so the
  * iterative family (d09/d11/d19, g01/g02/g03) can be MEASURED past the
  * driver's largest shipped fixture instead of argued about.
  *
  * - lineitem: 10 replicas with disjoint order/part/supplier key spaces —
  *   the co-purchase graph becomes 10x nodes and 10x edges (TPC-H scaling
  *   grows parts with SF; disjoint replicas measure pure volume cost).
  * - documents: 10 replicas with per-replica vowel permutations, so
  *   replicas share almost no shingles and the dedup workload keeps the
  *   original within-replica candidate structure at 10x volume instead of
  *   degenerating into a 45x everything-matches-everything blowup.
  * - remaining tables: copied verbatim (the probed ops do not read them,
  *   but T.* loaders must resolve).
  *
  * Usage: runMain graft.tools.ScaleSynth [srcDir outDir reps [docsOnly]]
  *
  * `docsOnly` mode (r10 100x probe): replicate ONLY documents at `reps`
  * (vowel-perm x consonant-perm = up to 100 distinct rewrites, so replicas
  * stay shingle-disjoint and the dedup candidate structure scales by
  * volume, not by cross-replica blowup) and copy every other table
  * verbatim — the d03/t34/st41 probes read documents alone, and
  * replicating lineitem 100x would cost minutes for tables the probe
  * never opens.
  */
object ScaleSynth {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val docsOnly = args.length > 3 && args(3) == "docsOnly"
    if (docsOnly) { synthDocsOnly(src, out, reps); return }
    val embOnly = args.length > 3 && args(3) == "embOnly"
    if (embOnly) { synthEmbOnly(src, out, reps); return }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = T.lineitem(spark, src)
    val (okOff, pkOff, skOff) = (150000L, 20000L, 1000L)
    li.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select(
        (col("l_orderkey") + col("rep") * okOff).as("l_orderkey"),
        (col("l_partkey") + col("rep") * pkOff).as("l_partkey"),
        (col("l_suppkey") + col("rep") * skOff).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // 10 vowel permutations: replica 0 is the original corpus; the others
    // rewrite most shingles while preserving lengths and doc structure
    val perms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio",
      "aeuoi", "eouia", "iuaoe", "oieua", "uioea")
    val docs = T.documents(spark, src)
    val docOff = 5000L
    perms.zipWithIndex.map { case (p, i) =>
      docs.select(
        (col("doc_id") + lit(i.toLong * docOff)).as("doc_id"),
        (if (i == 0) col("text") else translate(col("text"), "aeiou", p))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // events: 10 replicas with disjoint event_id/user_id key spaces and
    // IDENTICAL timestamps — the streaming probe (SCALE.md r9) wants the
    // same trigger/watermark sequence with 10x the rows per trigger, and
    // disjoint users keep the per-user join structure (each replica joins
    // only within itself, so output and state scale linearly in volume).
    val evRaw = spark.read.parquet(s"$src/events.parquet")
    val eidOff = evRaw.agg(max(col("event_id"))).head().getLong(0) + 1L
    val uidOff = evRaw.agg(max(col("user_id"))).head().getLong(0) + 1L
    evRaw.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select(
        (col("event_id") + col("rep") * eidOff).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * uidOff).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // untouched tables: verbatim copies so every T.* loader resolves
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"SYNTH done: $out at ${reps}x of $src")
    spark.stop()
  }

  private def synthDocsOnly(src: String, out: String, reps: Int): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vperms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio",
      "aeuoi", "eouia", "iuaoe", "oieua", "uioea")
    val cperms = Seq("bcdfg", "cdfgb", "dfgbc", "fgbcd", "gbcdf",
      "bdcgf", "cgfbd", "dbgcf", "fcbgd", "gfdbc")
    require(reps <= vperms.length * cperms.length, s"max ${vperms.length * cperms.length} reps")
    val docs = T.documents(spark, src)
    val docOff = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    (0 until reps).map { i =>
      val (vp, cp) = (vperms(i % 10), cperms(i / 10))
      docs.select(
        (col("doc_id") + lit(i.toLong * docOff)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(translate(col("text"), "aeiou", vp), "bcdfg", cp))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    spark.read.parquet(s"$src/events.parquet")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"SYNTH docsOnly done: $out documents at ${reps}x of $src")
    spark.stop()
  }

  /** embOnly mode (r10 p08 volume probe): replicate ONLY embeddings at
    * `reps` with CONTIGUOUS vec_ids (replica i occupies [i*n, (i+1)*n)),
    * copying every other table verbatim — p08's staging derives its
    * pre-Create window, forecasting tail and worker sharding from vec_id
    * positions, so contiguity keeps the lifecycle shape identical while the
    * training volume scales by reps.
    */
  private def synthEmbOnly(src: String, out: String, reps: Int): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = T.embeddings(spark, src)
    val n = emb.count()
    emb.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select(
        (col("vec_id") + col("rep") * n).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    spark.read.parquet(s"$src/events.parquet")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"SYNTH embOnly done: $out embeddings at ${reps}x of $src")
    spark.stop()
  }
}
