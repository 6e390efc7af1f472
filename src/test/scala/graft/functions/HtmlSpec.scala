package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Extraction hazards that only show up on malformed / adversarial
  * markup — the cases the oracle's synthesized fixture exercises once
  * but a crawl hits constantly. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def blocks(html: String): Seq[String] =
    Seq(html).toDF("h")
      .select(Html.extractBlocks(col("h")).as("b"))
      .as[Seq[String]].head()

  private def text(html: String): String =
    Seq(html).toDF("h")
      .select(Html.extractText(col("h")).as("t")).as[String].head()

  test("script and style elements vanish whole, including fake tags in their bodies") {
    val h = "<p>before</p><script>var s = \"<p>not text</p>\"; if (1 < 2) {}</script>" +
      "<style>a > b { color: red; }</style><p>after</p>"
    assert(blocks(h) == Seq("before", "after"))
  }

  test("comments vanish whole, including fake block tags inside them") {
    assert(blocks("<p>a</p><!-- <p>ghost</p> <div>ghost</div> --><p>b</p>") == Seq("a", "b"))
  }

  test("attribute values containing '>' do not truncate the tag (block and inline)") {
    // the classic <[^>]*> leak: 'b">' must NOT appear in the text
    assert(blocks("""<h1 data-x="a>b">Title</h1><p>body</p>""") == Seq("Title", "body"))
    assert(blocks("""<p><a href="u" title='x>y'>link</a> text</p>""") == Seq("link text"))
  }

  test("nested and UNCLOSED inline tags strip cleanly within one block") {
    assert(blocks("<p><b><i>deep</i> and <em>open text</p>") == Seq("deep and open text"))
  }

  test("block boundaries segment; inline tags do not") {
    val h = "<div>one</div><p>two <b>bold</b></p><h2>three</h2>four<br>five"
    assert(blocks(h) == Seq("one", "two bold", "three", "four", "five"))
  }

  test("entities decode once: &amp;lt; becomes the literal text &lt;, never <") {
    assert(text("<p>x &amp;lt; y</p>").contains("x &lt; y"))
    assert(text("<p>a &lt;b&gt; &#47; &quot;c&quot; &#39;d&#39; &amp; e</p>")
      .contains("""a <b> / "c" 'd' & e"""))
  }

  test("decoded angle brackets in text are NOT re-stripped as tags") {
    // decode happens after tag-stripping, so '<3>' survives as text
    assert(blocks("<p>score &lt;3&gt; here</p>") == Seq("score <3> here"))
  }

  test("whitespace collapses within blocks; empty blocks drop") {
    assert(blocks("<p>  a \t b  </p><p>   </p><p></p><div>c</div>") == Seq("a b", "c"))
  }

  test("doctype and stray '<' survive sanely") {
    assert(blocks("<!DOCTYPE html><p>only block</p>") == Seq("only block"))
    // a bare '<' that opens no tag is kept as text (fail-soft)
    assert(blocks("<p>5 < 7 holds</p>") == Seq("5 < 7 holds"))
  }

  test("CDATA sections vanish whole, including fake markup and raw ampersands") {
    assert(blocks("<p>a</p><![CDATA[ <p>ghost</p> & stray ]]><p>b</p>") == Seq("a", "b"))
    // CDATA inside a comment and vice versa both drop cleanly
    assert(blocks("<p>a</p><!-- <![CDATA[x]]> --><p>b</p>") == Seq("a", "b"))
  }

  test("a 'nested' comment ends at the FIRST --> and the tail leaks (HTML spec rule)") {
    val h = "<p>a</p><!-- outer <!-- inner --><p>tail</p> --><p>b</p>"
    assert(blocks(h) == Seq("a", "tail", "-->", "b"))
  }

  test("<pre> and <blockquote> segment as blocks; <br> inside pre still splits") {
    assert(blocks("<p>a</p><pre>code line</pre><p>b</p>") == Seq("a", "code line", "b"))
    assert(blocks("<pre>one<br>two</pre>") == Seq("one", "two"))
    assert(blocks("<blockquote>quoted</blockquote>rest") == Seq("quoted", "rest"))
    // documented contract: pre-internal whitespace still collapses
    assert(blocks("<pre>  a    b  </pre>") == Seq("a b"))
  }

  test("oracle mirror produces the identical extraction in DuckDB-compatible SQL") {
    // the SQL mirror is generated from the same constants; pin that the
    // generated string references every stage (a structural guard —
    // value-level parity is the oracle gate's job)
    val sql = Html.extractTextSql("html")
    assert(sql.contains("script") && sql.contains("style"))
    assert(sql.contains("CDATA") && sql.contains("chr(10)"))
    Html.Entities.foreach { case (e, _) => assert(sql.contains(e)) }
  }
}
