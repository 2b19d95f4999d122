package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalize lowercases scheme and host but not path or query") {
    assert(canon("HTTPS://WWW.Example.COM/Docs/A?Q=Xyz") ===
      Seq("https://www.example.com/Docs/A?Q=Xyz"))
  }

  test("canonicalize strips default ports only for the matching scheme") {
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:80/x", "http://a.com:8080/x") ===
      Seq("https://a.com/x", "http://a.com/x",
        "https://a.com:80/x", "http://a.com:8080/x"))
  }

  test("canonicalize drops fragments and utm_ params, sorts the rest") {
    assert(canon("https://a.com/p?utm_source=x&b=2&a=1#frag") ===
      Seq("https://a.com/p?a=1&b=2"))
    // all params tracking -> no '?' at all
    assert(canon("https://a.com/p?utm_source=x&utm_medium=y") ===
      Seq("https://a.com/p"))
    // a '?' inside the fragment is NOT a query
    assert(canon("https://a.com/p#frag/x?y=1") === Seq("https://a.com/p"))
  }

  test("canonicalize strips trailing slashes, including a bare-root path") {
    assert(canon("https://a.com/p/", "https://a.com/p///", "https://a.com/") ===
      Seq("https://a.com/p", "https://a.com/p", "https://a.com"))
  }

  test("canonicalize is idempotent and null-safe") {
    val ugly = "HTTP://A.com:80/x/?utm_a=1&z=9&b=2#f"
    val once = canon(ugly).head
    assert(canon(once) === Seq(once))
    val out = Seq[String](null).toDF("u")
      .select(UrlOps.canonicalize(col("u"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("scheme-less or malformed URLs canonicalize to null, never a shared key") {
    assert(canon("www.a.com/page", "news.b.org/story", "not a url") ===
      Seq(null, null, null))
    // and dedupByUrl leaves such rows alone instead of merging them
    val df = Seq(
      (1L, "www.a.com/page"), (2L, "news.b.org/story"),
      (3L, "https://c.com/x"), (4L, "https://c.com/x/")).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(df, "doc_id", "url").collect()
    assert(got.length == 1) // only the well-formed group appears
    assert(got.head.getString(0) == "https://c.com/x" &&
      got.head.getLong(1) == 3L && got.head.getLong(2) == 2L)
  }

  test("dedupByUrl groups by canonical form and keeps the smallest id") {
    val df = Seq(
      (3L, "https://A.com/x?utm_s=1"),
      (1L, "HTTPS://a.com:443/x/"),
      (2L, "https://a.com/x"),
      (9L, "https://b.com/y")).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(df, "doc_id", "url")
      .orderBy("url").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("https://a.com/x", 1L, 3L), ("https://b.com/y", 9L, 1L)))
  }
}
