package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Url.canonicalize(col("u")).as("c")).as[String].head()

  private def domain(url: String): String =
    Seq(url).toDF("u")
      .select(Url.registeredDomain(Url.host(col("u"))).as("d")).as[String].head()

  test("scheme and host lowercase; path and query case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path?Q=Mixed") ==
      "https://www.example.com/Path?Q=Mixed")
  }

  test("default ports strip per scheme; non-default ports survive") {
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x",
      "443 is only default for https")
  }

  test("fragments strip; query survives; empty path survives") {
    assert(canon("https://a.com/x?k=1#frag") == "https://a.com/x?k=1")
    assert(canon("https://a.com#top") == "https://a.com")
    assert(canon("https://a.com?only=query#f") == "https://a.com?only=query")
  }

  test("malformed input (no scheme) falls back to a stable lowercased key") {
    assert(canon("Not A Url") == "not a url")
    assert(canon("www.a.com/x") == "www.a.com/x")
  }

  test("registered domain: longest public suffix wins, one label kept") {
    assert(domain("https://www.deep.sub.example.com/x") == "example.com")
    assert(domain("https://api.shop.co.uk/x") == "shop.co.uk",
      "co.uk must match before uk")
    assert(domain("http://user.github.io/p") == "user.github.io",
      "github.io is itself a suffix (PSL private section)")
    assert(domain("https://cdn.site.com.ar/l") == "site.com.ar")
  }

  test("hosts that match no suffix (or ARE a bare suffix) register as themselves") {
    assert(domain("https://localhost/x") == "localhost")
    assert(domain("https://com/x") == "com")
    assert(domain("https://a.internal/x") == "a.internal")
  }

  test("multi-label ordering invariant: every multi-label suffix precedes its tail") {
    val idx = Url.PublicSuffixes.zipWithIndex.toMap
    Url.PublicSuffixes.filter(_.contains(".")).foreach { multi =>
      val tail = multi.split("\\.").last
      if (idx.contains(tail))
        assert(idx(multi) < idx(tail),
          s"'$multi' must precede '$tail' or longest-match breaks")
    }
  }

  test("oracle mirrors are generated from the same constants") {
    val sql = Url.registeredDomainSql("host")
    Url.PublicSuffixes.foreach(s => assert(sql.contains(s)))
    assert(Url.canonicalizeSql("u").contains("'https' AND"))
  }
}
