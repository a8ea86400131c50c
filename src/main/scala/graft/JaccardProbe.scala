package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.textops.TextOps
import graft.sources.Tables

/** Dev tool: times the stages of the n-gram Jaccard forms on one SF dir. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("jaccard-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"JPROBE $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warmup
    Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8).count()

    val tokenized = graft.util.Par.spread(docs)
      .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("_toks"))
    val withSh = tokenized.select(col("doc_id"),
      TextOps.shinglesFromTokens(col("_toks"), 3).as("sh"))
    time("tokens")   { tokenized.select(sum(size(col("_toks")))).head.getLong(0) }
    time("shingles") { withSh.select(sum(size(col("sh")))).head.getLong(0) }
    val hashed = withSh.select(col("doc_id"),
      array_sort(transform(col("sh"), s => xxhash64(s))).as("_hs"))
    time("hash+sort") { hashed.select(sum(size(col("_hs")))).head.getLong(0) }
    val prefix = hashed.select(col("doc_id"),
      explode_outer(slice(col("_hs"), lit(1),
        (size(col("_hs")) - ceil(lit(0.8) * size(col("_hs"))).cast("int") + 1))).as("h"))
    time("prefix_explode") { prefix.count() }
    val cand = prefix.as("x").join(prefix.as("y"), Seq("h"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("cand_join") { cand.count() }
    time("sorted_full") { Dedup.ngramJaccardSortedPrefix(docs, "doc_id", "text", 3, 0.8).count() }
    spark.stop()
  }
}
// appended probe #2
object JaccardProbe2 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("jaccard-probe2").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val docs = graft.sources.Tables.documents(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"JPROBE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    graft.dedup.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8).count() // warmup
    val tokenized = graft.util.Par.spread(docs)
      .select(col("doc_id"), graft.textops.TextOps.tokens(lower(col("text"))).as("_toks"))
    val withSh = tokenized.select(col("doc_id"),
      graft.textops.TextOps.shinglesFromTokens(col("_toks"), 3).as("sh"))
    val occ = withSh.select(col("doc_id"),
      explode_outer(transform(col("sh"), s => xxhash64(s))).as("h"))
    val freq = occ.groupBy("h").agg(count(lit(1)).as("cnt"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("cnt"), col("h"))
    val wDocAll = Window.partitionBy(col("doc_id"))
    val prefixRare = occ.join(freq, "h")
      .withColumn("_rn", row_number().over(wDoc))
      .withColumn("_n", count(lit(1)).over(wDocAll))
      .filter(col("_rn") <= col("_n") - ceil(lit(0.8) * col("_n")) + 1)
      .select(col("doc_id"), col("h"))
    time("rare_prefix") { prefixRare.count() }
    val candRare = prefixRare.as("x").join(prefixRare.as("y"), Seq("h"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("rare_cand") { candRare.count() }
    time("rare_full") { graft.dedup.Dedup.ngramJaccardPrefix(docs, "doc_id", "text", 3, 0.8).count() }
    time("sorted_full") { graft.dedup.Dedup.ngramJaccardSortedPrefix(docs, "doc_id", "text", 3, 0.8).count() }
    time("plain_full") { graft.dedup.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8).count() }
    spark.stop()
  }
}
