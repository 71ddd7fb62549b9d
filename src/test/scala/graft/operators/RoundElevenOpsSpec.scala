package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant laws for the round-11 additions and fixes. */
class RoundElevenOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Dedup.canonicalUrl(col("url"))).as[String].collect().toSeq
  }

  test("canonicalUrl: a stripped FIRST utm param leaves no dangling '&' (ADVICE r10)") {
    // the bug class: '?utm_a=1&x=2' loses its '?' with the utm strip
    assert(canon("https://h/p?utm_a=1&x=2") === Seq("https://h/p?x=2"))
    // and the canonical key must MERGE with the never-tracked variant
    assert(canon("https://h/p?utm_a=1&x=2", "https://h/p?x=2").distinct.size === 1)
    // two leading utm params, then a real one
    assert(canon("https://h/p?utm_a=1&utm_b=2&x=1") === Seq("https://h/p?x=1"))
    // the already-handled case ('?' survives) still repairs
    assert(canon("https://h/p?a=1&utm_b=2") === Seq("https://h/p?a=1"))
    // all params tracking -> bare path, trailing slash stripped
    assert(canon("HTTPS://H/p/?utm_a=1&utm_b=2#frag") === Seq("https://h/p"))
    // no-op on clean URLs
    assert(canon("https://h/p?x=2&y=3") === Seq("https://h/p?x=2&y=3"))
  }
}
