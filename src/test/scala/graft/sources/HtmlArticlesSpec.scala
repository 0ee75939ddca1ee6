package graft.sources

import graft.{SparkSpec, Tables}

class HtmlArticlesSpec extends SparkSpec {

  private val twoDocPage =
    """<html><body>
      |<div class="single-document"><pre class="docSource">FAZ 03.05.2023 p7</pre>
      |<pre class="docTitle">First title</pre>
      |<pre class="text">Body one.</pre></div>
      |<div class="single-document"><pre class="docSource">FAZ 28.12.2023</pre>
      |<pre class="docTitle">Second title</pre>
      |<pre class="text">Body two, longer.</pre></div>
      |</body></html>""".stripMargin

  private val enPage =
    """<div class="article enArticle"><div id="hd">Some headline</div>
      |<div class="meta">Published 5 März 2023 in print</div>
      |<div class="author">Jane Doe</div>
      |<b>alpha</b><b>beta</b>
      |<p class="articleParagraph enarticleParagraph">Para one.</p>
      |<p class="articleParagraph enarticleParagraph">Para two.</p>
      |<p>en_42</p></div><!--/article-->""".stripMargin

  test("parseOutlet: EN block — title, German-month date, author, terms, multi-para body, last-p id") {
    val Seq(a) = HtmlArticles.parseOutlet(enPage, "en")
    assert(a.title === "Some headline")
    assert(a.iso_date === "2023-03-05") // "5 März 2023" → zero-padded ISO
    assert(a.author === "Jane Doe")
    assert(a.terms === Seq("alpha", "beta"))
    assert(a.body === "Para one.\nPara two.")
    assert(a.id === "en_42")
  }

  test("parseOutlet: missing author is empty, not null; wrong variant matches nothing") {
    val noAuthor = enPage.replace("<div class=\"author\">Jane Doe</div>", "")
    val Seq(a) = HtmlArticles.parseOutlet(noAuthor, "en")
    assert(a.author === "")
    assert(HtmlArticles.parseOutlet(enPage, "de") === Seq.empty)
  }

  test("parseFaz: one file fans out to N articles (the UDTF shape)") {
    val arts = HtmlArticles.parseFaz(twoDocPage)
    assert(arts.length === 2)
    assert(arts(0) === HtmlArticles.Article("03.05.2023", "First title", "Body one."))
    assert(arts(1).source_date === "28.12.2023")
  }

  test("parseFaz: null-safe — missing fields become empty strings, not nulls") {
    val html = """<div class="single-document"><pre class="docTitle">T</pre></div>"""
    val arts = HtmlArticles.parseFaz(html)
    assert(arts === Seq(HtmlArticles.Article("", "T", "")))
    assert(HtmlArticles.parseFaz(null) === Seq.empty)
    assert(HtmlArticles.parseFaz("<p>no blocks</p>") === Seq.empty)
  }

  test("parseFaz: date is taken from docSource even with surrounding text") {
    val arts = HtmlArticles.parseFaz(twoDocPage)
    assert(arts(0).source_date === "03.05.2023") // not confused by 'p7'
  }

  // ——— adversarial real-world-markup fixtures (r15 verdict ask #6) ———

  test("parseFaz: nested <div> inside the article body no longer truncates the block") {
    val html =
      """<div class="single-document"><pre class="docSource">FAZ 01.02.2023</pre>
        |<pre class="docTitle">Nested</pre>
        |<div class="callout">An inner <div>deeply nested</div> box</div>
        |<pre class="text">Body after the nested divs.</pre></div>""".stripMargin
    val Seq(a) = HtmlArticles.parseFaz(html)
    assert(a.title === "Nested")
    assert(a.body === "Body after the nested divs.")
    assert(a.source_date === "01.02.2023")
  }

  test("parseFaz: reordered / extra attributes and single quotes still match") {
    val html =
      """<div data-idx="7" class='hero single-document' lang=de>
        |<pre lang="de" class='docSource wide'>FAZ 09.10.2023</pre>
        |<pre class="docTitle">Attrs</pre>
        |<pre class="text">Body.</pre></div>""".stripMargin
    val Seq(a) = HtmlArticles.parseFaz(html)
    assert(a === HtmlArticles.Article("09.10.2023", "Attrs", "Body."))
    // class token must be a whole token — "single-documents" is NOT a match
    assert(HtmlArticles.parseFaz(
      """<div class="single-documents"><pre class="docTitle">x</pre></div>""")
      === Seq.empty)
  }

  test("parseFaz: an attribute merely ENDING in the target name is not the attribute") {
    // data-class="single-document" must not satisfy a `class` lookup:
    // \b treated the hyphen as a boundary and read the wrong attribute's
    // value (r16 advice finding) — the name must start its own token
    assert(HtmlArticles.parseFaz(
      """<div data-class="x single-document"><pre class="docSource">FAZ 01.01.2024</pre>
        |<pre class="docTitle">t</pre><pre class="text">b</pre></div>""".stripMargin)
      === Seq.empty)
    // and the real attribute still matches when a decoy precedes it
    val Seq(a) = HtmlArticles.parseFaz(
      """<div data-class="decoy" class="single-document">
        |<pre class="docSource">FAZ 02.01.2024</pre>
        |<pre class="docTitle">real</pre><pre class="text">b</pre></div>""".stripMargin)
    assert(a.title === "real")
  }

  test("parseFaz: unclosed <pre> recovers to the next pre / end of block") {
    val html =
      """<div class="single-document"><pre class="docSource">FAZ 03.03.2023
        |<pre class="docTitle">Unclosed</pre>
        |<pre class="text">Tail body</div>""".stripMargin
    val Seq(a) = HtmlArticles.parseFaz(html)
    assert(a.source_date === "03.03.2023") // content ran to the next <pre
    assert(a.title === "Unclosed")
    assert(a.body === "Tail body") // unclosed pre: runs to end of block
  }

  test("parseOutlet: attribute-insensitive block and paragraph matching") {
    val html =
      """<div lang="en" class='promo article enArticle'><div id='hd'>Hd</div>
        |<div class="meta">Published 7 Juli 2023</div>
        |<p data-k=1 class='lead articleParagraph enarticleParagraph'>P1.</p>
        |<p class="articleParagraph enarticleParagraph">P2.</p>
        |<p>en_7</p></div><!--/article-->""".stripMargin
    val Seq(a) = HtmlArticles.parseOutlet(html, "en")
    assert(a.title === "Hd")
    assert(a.iso_date === "2023-07-07")
    assert(a.body === "P1.\nP2.")
    assert(a.id === "en_7")
  }

  test("parseOutlet: nested div inside the hd title div stays balanced") {
    val html =
      """<div class="article enArticle"><div id="hd">Top <div>inner</div> line</div>
        |<p class="articleParagraph enarticleParagraph">B.</p>
        |<p>en_9</p></div><!--/article-->""".stripMargin
    val Seq(a) = HtmlArticles.parseOutlet(html, "en")
    assert(a.title === "Top <div>inner</div> line")
    assert(a.id === "en_9")
  }

  test("fazRoundTrip: parse ∘ render = identity on document count and titles") {
    import spark.implicits._
    val out = HtmlArticles.fazRoundTrip(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.count() === nDocs)
    // every title round-trips as doc_<id>
    val titles = out.select("title").as[String].collect().toSet
    val expected = Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().map(id => s"doc_$id").toSet
    assert(titles === expected)
  }

  test("fazRoundTrip: iso_date is the regex-reordered source_date") {
    val out = HtmlArticles.fazRoundTrip(spark, sf).collect()
    out.foreach { r =>
      val Array(dd, mm, yyyy) = r.getAs[String]("source_date").split("\\.")
      assert(r.getAs[String]("iso_date") === s"$yyyy-$mm-$dd")
    }
  }
}
