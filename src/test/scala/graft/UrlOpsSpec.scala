package graft

import graft.functions.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def canon(inputs: Seq[String]): Seq[Option[String]] =
    evalStr(UrlOps.canonicalizeUrl, inputs)

  test("canonicalizeUrl: case, ports, fragments, tracking, slashes") {
    val got = canon(Seq(
      "HTTPS://WWW.Example.COM:443/Path/Item?id=7#frag",
      "http://shop.example.com:80/a/",
      "http://shop.example.com:443/a",       // mismatched port: kept
      "https://x.example.com:8080/a",        // non-default port: kept
      "https://x.com/p?utm_source=a&id=1&utm_medium=b",
      "https://x.com/p?utm_a=1&utm_b=2",
      "https://x.com/p?fbclid=abc",
      "https://x.com/p?id=1&gclid=zz",
      "example.com/path/?x=1",               // scheme-less passthrough
      null))
    assert(got === Seq(
      Some("https://www.example.com/Path/Item?id=7"),
      Some("http://shop.example.com/a"),
      Some("http://shop.example.com:443/a"),
      Some("https://x.example.com:8080/a"),
      Some("https://x.com/p?id=1"),
      Some("https://x.com/p"),
      Some("https://x.com/p"),
      Some("https://x.com/p?id=1"),
      Some("example.com/path/?x=1"),
      None))
  }

  test("canonicalizeUrl preserves path/query case and param order") {
    assert(canon(Seq("https://A.B/CaSe?Z=9&a=1")) ===
      Seq(Some("https://a.b/CaSe?Z=9&a=1")))
  }

  test("hostOf: userinfo and port stripped; scheme-less is empty") {
    val got = evalStr(UrlOps.hostOf, Seq(
      "https://user:pw@Host.Example.COM:8443/x",
      "http://plain.example.org/y?q=1",
      "no-scheme.example.com/z"))
    assert(got === Seq(Some("host.example.com"),
      Some("plain.example.org"), Some("")))
  }

  test("registeredDomain: longest suffix wins, unknown tld is null") {
    val got = evalStr(UrlOps.registeredDomain, Seq(
      "www.shop.example.co.uk",  // co.uk beats uk
      "deep.a.b.example.com",
      "team.project.github.io",  // github.io beats io
      "example.unknowntld",      // no known suffix
      "co.uk",                   // bare suffix: nothing registrable
      "example.com"))
    assert(got === Seq(Some("example.co.uk"), Some("example.com"),
      Some("project.github.io"), None, None, Some("example.com")))
  }
}
