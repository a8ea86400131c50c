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
}
