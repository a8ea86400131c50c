package graft.textops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def extract(html: String): (String, Long, Long, String, String) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val row = Html.extract(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html").collect().head
    val clean = Seq((1L, html)).toDF("doc_id", "html")
      .select(Html.cleanText(col("html"))).collect().head.getString(0)
    (row.getString(1), row.getLong(2), row.getLong(3), row.getString(4),
      clean)
  }

  test("script/style/comment content is dropped wholesale, tags become spaces") {
    val (_, _, _, _, clean) = extract(
      "<p>keep</p><SCRIPT>var x = 1; if (x < 2) drop();</SCRIPT>" +
        "<style>p { color: red }</style><!-- drop\ntoo --><p>also</p>")
    assert(clean == "keep also")
  }

  test("adjacent elements do not glue words together") {
    val (_, _, _, _, clean) = extract("<p>one</p><p>two</p>")
    assert(clean == "one two")
  }

  test("entity decode is single-pass with &amp; last") {
    // "&amp;lt;" must decode to the TEXT "&lt;", never to "<"
    val (_, _, _, _, clean) = extract("<p>a &amp;lt; b &lt; c &amp; d</p>")
    assert(clean == "a &lt; b < c & d")
    val (_, _, _, _, c2) = extract("<p>x&nbsp;y &quot;z&#39;</p>")
    assert(c2 == "x y \"z'")
  }

  test("title extraction and anchor counting (opens only, not <abbr>)") {
    val (title, links, len, fp, clean) = extract(
      "<html><head><TITLE>My Page</TITLE></head><body>" +
        "<a href=\"x\">l1</a><A>l2</A><abbr>not a link</abbr>body</body></html>")
    assert(title == "My Page")
    assert(links == 2L)
    assert(clean == "My Page l1 l2 not a link body")
    assert(len == clean.length.toLong && fp.length == 32)
  }

  test("whitespace runs collapse and the result is trimmed") {
    val (_, _, _, _, clean) = extract("  <p>\n\ta   b\n</p>  ")
    assert(clean == "a b")
  }

  private def main(html: String, minWords: Int = 5,
                   maxLinkPct: Int = 30): (String, Long, Long) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val txt = Seq((1L, html)).toDF("doc_id", "html")
      .select(Html.mainText(col("html"), minWords, maxLinkPct))
      .collect().head.getString(0)
    val row = Html.extractMain(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html", minWords, maxLinkPct).collect().head
    assert(row.getLong(5) == txt.length.toLong, "main_len must match mainText")
    (txt, row.getLong(3), row.getLong(4)) // (main, n_blocks, n_kept)
  }

  test("main-content: nav, link farms, and short footers are dropped; prose survives") {
    val (m, nBlocks, nKept) = main(
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/c\">Contact</a></nav>" +
        "<p>this paragraph carries the genuine prose of the page today</p>" +
        "<div><a href=\"/x\">hot deal one</a> <a href=\"/y\">hot deal " +
        "two</a> <a href=\"/z\">hot deal three</a> <a href=\"/w\">hot " +
        "deal four</a></div>" +
        "<footer>Copyright &amp; terms</footer></body></html>")
    assert(m == "this paragraph carries the genuine prose of the page today")
    assert(nKept == 1L)
    assert(nBlocks == 4L) // nav, prose, link farm, footer all have words
  }

  test("main-content: the keep rule is a density cut, not a no-links cut") {
    // 12 words, 3 inside the anchor -> 25% <= 30%: kept, with the
    // anchor text decoded in place
    val (m, _, kept) = main(
      "<p>Read the full guide at <a href=\"/g\">the documentation " +
        "portal</a> for complete details today</p>")
    assert(kept == 1L)
    assert(m == "Read the full guide at the documentation portal " +
      "for complete details today")
    // same block at a stricter threshold is dropped
    assert(main("<p>Read the full guide at <a href=\"/g\">the " +
      "documentation portal</a> for complete details today</p>",
      maxLinkPct = 20)._3 == 0L)
  }

  test("main-content: block order is document order; <br> splits blocks") {
    val (m, _, _) = main(
      "<p>first prose block with enough words here</p>" +
        "<p>second prose block with enough words too</p>")
    assert(m == "first prose block with enough words here " +
      "second prose block with enough words too")
    // <br>-separated link chains segment into per-line blocks (each
    // fails minWords) instead of fusing into one long "prose" block
    val (farm, _, kept) = main(
      "<a href=\"/1\">one two</a><br><a href=\"/2\">three four</a><br>" +
        "<a href=\"/3\">five six</a><br><a href=\"/4\">seven eight</a>")
    assert(farm == "" && kept == 0L)
  }

  test("main-content: script/style/comment content never reaches a block") {
    val (m, _, _) = main(
      "<p>keep this sentence of genuine prose today</p>" +
        "<script>var x = 'if (x < 2) drop();'</script>" +
        "<!-- <p>commented out prose block that must not leak</p> -->")
    assert(m == "keep this sentence of genuine prose today")
  }

  test("html_clean / html_main SQL functions match the Column builders") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.GraftFunctions.register(spark)
    val html = "<nav><a href=\"/\">Home</a></nav><p>prose sentence " +
      "with plenty of words &amp; entities</p>"
    Seq((1L, html)).toDF("doc_id", "html").createOrReplaceTempView("h_v")
    val viaSql = spark.sql(
      "SELECT html_clean(html) AS c, html_main(html) AS m FROM h_v")
      .collect().head
    val viaCol = Seq((1L, html)).toDF("doc_id", "html")
      .select(Html.cleanText(col("html")), Html.mainText(col("html")))
      .collect().head
    assert(viaSql.getString(0) == viaCol.getString(0))
    assert(viaSql.getString(1) == viaCol.getString(1))
    assert(viaSql.getString(1) ==
      "prose sentence with plenty of words & entities")
  }
}
