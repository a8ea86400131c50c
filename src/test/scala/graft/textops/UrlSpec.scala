package graft.textops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url").select(Url.canonicalize(col("url")))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("each canonicalization rule, individually and composed") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/A/b/",         // case, www, :80, trailing /
      "https://example.com:443/x",              // https default port
      "https://example.com:8443/x",             // NON-default port kept
      "http://example.com",                     // empty path -> /
      "http://example.com/",                    // root slash kept
      "http://example.com/p?b=2&a=1&utm_source=x&gclid=1#f", // sort+track+frag
      "http://example.com/p?utm_only=x",        // all params dropped -> no ?
      "http://example.com/CaseSensitive/Path"   // path case preserved
    ) == Seq(
      Some("http://example.com/A/b"),
      Some("https://example.com/x"),
      Some("https://example.com:8443/x"),
      Some("http://example.com/"),
      Some("http://example.com/"),
      Some("http://example.com/p?a=1&b=2"),
      Some("http://example.com/p"),
      Some("http://example.com/CaseSensitive/Path")))
  }

  test("unparseable strings surface as NULL, not garbage") {
    assert(canon("not a url", "ftp:/missing-slashes", "//no-scheme.com/x")
      == Seq(None, None, None))
  }

  test("canonical URL folds exactly the frontier-duplicate aliases") {
    val aliases = Seq(
      "http://www.site.com/a?x=1&y=2",
      "HTTP://SITE.com:80/a/?y=2&x=1#top",
      "http://site.com/a?utm_medium=m&y=2&x=1")
    val got = canon(aliases: _*)
    assert(got.distinct == Seq(Some("http://site.com/a?x=1&y=2")), got)
    // a genuinely different URL must NOT fold
    assert(canon("http://site.com/a?x=1&y=3").head
      != got.head)
  }
}
