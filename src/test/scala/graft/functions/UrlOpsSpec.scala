package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("scheme + host lowercased, www and default port stripped") {
    assert(canon("HTTP://WWW.Example.COM:80/a") == Seq("http://example.com/a"))
    assert(canon("https://Example.com:443/a") == Seq("https://example.com/a"))
  }

  test("non-default port survives") {
    assert(canon("http://example.com:8080/a") ==
      Seq("http://example.com:8080/a"))
    // :443 is only default for https — http keeps it
    assert(canon("http://example.com:443/a") ==
      Seq("http://example.com:443/a"))
  }

  test("fragment dropped, trailing slashes trimmed, root collapses") {
    assert(canon("https://example.com/a/b/#sec") ==
      Seq("https://example.com/a/b"))
    assert(canon("https://example.com/") == Seq("https://example.com"))
    assert(canon("https://example.com") == Seq("https://example.com"))
  }

  test("tracking params dropped, remaining params sorted") {
    assert(canon("https://example.com/p?utm_source=x&b=2&a=1&ref=z&fbclid=q")
      == Seq("https://example.com/p?a=1&b=2"))
    // all params tracking → no '?' at all
    assert(canon("https://example.com/p?utm_medium=m") ==
      Seq("https://example.com/p"))
    // a param merely CONTAINING utm_ / ref is kept (prefix match only)
    assert(canon("https://example.com/p?prefs=1&xutm_b=2") ==
      Seq("https://example.com/p?prefs=1&xutm_b=2"))
  }

  test("query on root path, fragment after query") {
    assert(canon("http://example.com?b=2&a=1#x") ==
      Seq("http://example.com?a=1&b=2"))
  }

  test("canonicalize is idempotent over generated messy URLs") {
    // a normalizer must be a projection: applying it twice can't keep
    // rewriting (if it does, "canonical" keys drift between passes)
    val schemes = Seq("http", "HTTPS", "Http")
    val hosts = Seq("WWW.Ex.COM", "ex.com", "sub.Ex.Com:8080", "ex.com:443")
    val paths = Seq("", "/", "/a/b/", "/a//")
    val queries = Seq("", "?utm_source=x", "?b=2&a=1&ref=z", "?z=1#f", "#f")
    val urls = for (s <- schemes; h <- hosts; p <- paths; q <- queries)
      yield s"$s://$h$p$q"
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    assert(once == twice, "second pass must be a no-op")
  }

  test("distinct raw spellings of one page collapse") {
    val variants = Seq(
      "HTTP://WWW.Site.Com:80/docs/7?utm_source=feed&b=2&a=7",
      "http://site.com/docs/7/?a=7&b=2#sec2",
      "http://Site.com/docs/7?b=2&a=7&ref=abc")
    assert(canon(variants: _*).distinct == Seq("http://site.com/docs/7?a=7&b=2"))
  }
}
