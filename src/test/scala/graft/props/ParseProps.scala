package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import graft.sources.HtmlArticles
import graft.sources.HtmlArticles.Article

/** Property-based checks (SURVEY.md §5.3) over the pure parsing layer —
  * no SparkSession, so hundreds of samples stay cheap. */
object ParseProps extends Properties("parse") {

  // article content free of the markup the renderer/parser use as delimiters
  private val plainText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', '!', 'ä', 'ß')))
      .map(_.mkString.trim)

  private val dateGen: Gen[String] = for {
    d <- Gen.choose(1, 28); m <- Gen.choose(1, 12); y <- Gen.choose(1990, 2030)
  } yield f"$d%02d.$m%02d.$y%04d"

  private val articleGen: Gen[Article] = for {
    date <- dateGen; title <- plainText; body <- plainText
  } yield Article(date, title, body)

  private def render(a: Article): String =
    s"""<div class="single-document"><pre class="docSource">SRC ${a.source_date} x</pre>""" +
      s"""<pre class="docTitle">${a.title}</pre><pre class="text">${a.body}</pre></div>"""

  property("parse ∘ render = identity for any article list") =
    Prop.forAll(Gen.listOfN(5, articleGen)) { arts =>
      HtmlArticles.parseFaz(arts.map(render).mkString("\n")) == arts
    }

  property("article count equals block count (UDTF fan-out law)") =
    Prop.forAll(Gen.choose(0, 20), articleGen) { (n, a) =>
      HtmlArticles.parseFaz(List.fill(n)(render(a)).mkString) .length == n
    }

  property("parser never throws on arbitrary input") =
    Prop.forAll { (s: String) =>
      HtmlArticles.parseFaz(s); true
    }
}
