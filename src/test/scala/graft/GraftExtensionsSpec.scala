package graft

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions must be reachable from plain SQL. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("dot_product from SQL") {
    val r = spark.sql(
      """SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |""".stripMargin).collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("array_shift from SQL, with and without fill") {
    val withFill = spark.sql(
      "SELECT array_shift(array(1.0D, 2.0D, 3.0D), 1, 9.0D) AS s")
      .collect().head.getSeq[Double](0)
    assert(withFill == Seq(9.0, 1.0, 2.0))
    val noFill = spark.sql(
      "SELECT array_shift(array(1.0D, 2.0D, 3.0D), 2) AS s")
      .collect().head.getSeq[Any](0)
    assert(noFill == Seq(null, null, 1.0))
  }

  test("batch kernels from SQL match their Column-API results") {
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','b','c'), 2) AS s")
      .collect().head.getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c b"))
    val xx = spark.sql(
      "SELECT xx_sorted_hashes(array('a b','b c')) AS h," +
        " array_sort(transform(array('a b','b c'), s -> xxhash64(s))) AS e")
      .collect().head
    assert(xx.getSeq[Long](0) == xx.getSeq[Long](1))
    val mh = spark.sql(
      "SELECT minhash_sig(array('a b c'), 4) AS m," +
        " conv(substring(md5('a b c'), 1, 15), 16, 10) AS h1," +
        " conv(substring(md5('a b c'), 17, 14), 16, 10) AS h2")
      .collect().head
    val (h1, h2) = (mh.getString(1).toLong, mh.getString(2).toLong)
    assert(mh.getSeq[Long](0) == (0 until 4).map(j => h1 + j * h2))
    val kg = spark.sql("SELECT kgram_hashes('abcdef', 3) AS k")
      .collect().head.getSeq[Long](0)
    assert(kg.length == 4) // 6 - 3 + 1 k-grams
  }

  test("text_gate_stats / text_quality / bpe_count from SQL match the Column API") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.documents(spark, dir)
      .createOrReplaceTempView("documents_gx")
    val sqlSide = spark.sql(
      """SELECT doc_id, text_gate_stats(text) AS gs, text_quality(text) AS q,
        |       bpe_count(text) AS b
        |FROM documents_gx""".stripMargin)
    import org.apache.spark.sql.functions.col
    val colSide = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.textops.TextOps.gateStats(col("text")).as("gs"),
        graft.textops.TextOps.qualityScore(col("text")).as("q"),
        graft.textops.TextOps.bpeTokenCount(col("text")).as("b"))
    assert(sqlSide.exceptAll(colSide).isEmpty && colSide.exceptAll(sqlSide).isEmpty)
  }

  test("SQL front-door pipeline rows match their DataFrame twins") {
    val dir = "/root/testdata/sf0.001"
    for ((sqlName, dfName) <- Seq(
        "sql_text_stats" -> "text_stats",
        "sql_dedup_exact" -> "dedup_exact",
        "sql_corpus_profile" -> "corpus_profile")) {
      val a = SparkEntry.queries(sqlName)(spark, dir)
      val b = SparkEntry.queries(dfName)(spark, dir)
      assert(a.columns.toSeq == b.columns.toSeq, s"$sqlName columns")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$sqlName rows diverge from $dfName")
    }
  }

  test("simhash_agg from SQL groups to a 64-bit fingerprint") {
    spark.sql("SELECT explode(array('a','b','c')) AS tok")
      .createOrReplaceTempView("toks")
    val r = spark.sql(
      "SELECT simhash_agg(xxhash64(tok)) AS s FROM toks")
      .collect().head.getLong(0)
    // deterministic: same tokens → same fingerprint on every run
    val r2 = spark.sql(
      "SELECT simhash_agg(xxhash64(tok)) AS s FROM toks")
      .collect().head.getLong(0)
    assert(r == r2)
  }
}
