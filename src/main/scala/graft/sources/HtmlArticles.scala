package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** HTML article extraction (SURVEY.md §2.1 S5, §2.9): the reference's one
  * genuine UDTF — one HTML document fans out to N article rows
  * (`parser_media_articles.py:6–19` FAZ format: `div.single-document`
  * blocks with `pre.docSource` / `pre.docTitle` / `pre.text` children).
  *
  * Spark-first shape: a scan of (file, html) pairs → a parse UDF returning
  * ARRAY<STRUCT<…>> → `explode` to article rows. The parser is a small
  * regex extractor (no HTML library ships in this container); it handles
  * the reference's fixed class-tagged format, is null-safe on missing
  * fields (`parser_media_articles.py:41,65` optional author), and is
  * exercised both on inline fixtures (unit tests) and on HTML synthesized
  * from the `documents` table (oracle query — the oracle reconstructs the
  * expected rows directly from `documents`, proving parse ∘ render = id).
  */
object HtmlArticles {

  case class Article(source_date: String, title: String, body: String)

  /** Whitespace-tokenized value of `attr` inside one open tag — tolerant
    * of attribute order, extra attributes, either quote style, and
    * unquoted values, so `<div data-x="1" class='a single-document'>`
    * matches token `single-document`. Real-world exports reorder and
    * decorate attributes freely; a literal `class="…"` match does not
    * survive them (the r15 verdict's E2 hardening ask).
    *
    * The attribute NAME must start a token — after whitespace, a quote,
    * or the tag opener — not merely sit at a word boundary: `\b` alone
    * let `data-class="x"` satisfy a lookup for `class` (hyphen is a
    * word boundary), silently reading a different attribute's value
    * (the r16 advice finding). */
  private def attrTokens(tag: String, attr: String): Set[String] =
    ("(?si)(?<=[\\s\"'<])" + attr + "\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))").r
      .findFirstMatchIn(tag)
      .map(m => Option(m.group(1)).orElse(Option(m.group(2)))
        .orElse(Option(m.group(3))).getOrElse(""))
      .map(_.split("\\s+").filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /** Inner content of every BALANCED `<div>` block whose open tag carries
    * `token` in its `attr` value. One linear pass collects all div
    * open/close tags, then depth-counting finds each matched block's true
    * close — a nested `<div>` inside an article body no longer truncates
    * the block at the first `</div>` the way a non-greedy regex does.
    * Unclosed blocks run to end-of-input (the lenient-parser convention). */
  private[sources] def divBlocks(html: String, token: String,
                                 attr: String = "class"): Seq[String] = {
    val tags = "(?si)<div\\b[^>]*>|</div\\s*>".r.findAllMatchIn(html).toVector
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < tags.length) {
      val t = tags(i)
      if (!t.matched.startsWith("</") &&
          attrTokens(t.matched, attr).contains(token)) {
        var depth = 1
        var j = i + 1
        var endPos = html.length
        while (j < tags.length && depth > 0) {
          if (tags(j).matched.startsWith("</")) {
            depth -= 1
            if (depth == 0) endPos = tags(j).start
          } else depth += 1
          j += 1
        }
        out += html.substring(t.end, endPos)
      }
      i += 1
    }
    out.result()
  }

  /** First `<pre>` whose class tokens include `cls`; content runs to its
    * `</pre>`, or — when the pre is left UNCLOSED — to the next `<pre`
    * open tag or end of block (what a lenient HTML parser recovers). */
  private def preField(b: String, cls: String): String = {
    val open = "(?si)<pre\\b[^>]*>".r
    open.findAllMatchIn(b).collectFirst {
      case m if attrTokens(m.matched, "class").contains(cls) =>
        val rest = b.substring(m.end)
        "(?si)</pre\\s*>|<pre\\b".r.findFirstMatchIn(rest)
          .map(c => rest.substring(0, c.start)).getOrElse(rest).trim
    }.getOrElse("")
  }

  /** Extract all `div.single-document` blocks (balanced-div scan,
    * attribute-insensitive), then the class-tagged <pre> fields inside
    * each. Null-safe: missing fields → "". */
  def parseFaz(html: String): Seq[Article] = {
    if (html == null) return Seq.empty
    divBlocks(html, "single-document").map { b =>
      // reference extracts the dd.mm.yyyy date from the docSource line
      // (parser_media_articles.py:14) — first date-shaped token wins
      val src = preField(b, "docSource")
      val date = "\\d{2}\\.\\d{2}\\.\\d{4}".r.findFirstIn(src).getOrElse("")
      Article(date, preField(b, "docTitle"), preField(b, "text"))
    }
  }

  val articleSchema: DataType = ArrayType(StructType(Seq(
    StructField("source_date", StringType),
    StructField("title", StringType),
    StructField("body", StringType))))

  val parseFazUdf = udf((html: String) =>
    parseFaz(html).map(a => (a.source_date, a.title, a.body)))

  /** Render one FAZ-format document per language from `documents` (3 docs
    * per page via integer-division grouping), then parse it back and
    * reformat the date ISO — the reference's E3 pipeline end-to-end:
    * scan → UDTF explode → regex date reorder → projection. */
  def fazRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rendered = renderFaz(spark, dir)
    rendered
      .select($"page_id", explode(parseFazUdf($"html")).as("art"))
      .select(
        $"page_id",
        $"art._1".as("source_date"),
        regexp_replace($"art._1", "(\\d{2})\\.(\\d{2})\\.(\\d{4})", "$3-$2-$1").as("iso_date"),
        $"art._2".as("title"),
        length($"art._3").cast("long").as("body_len"))
      .orderBy($"page_id", $"title")
  }

  // ——— EN/DE outlet formats (`getendf`/`getdedf`,
  // parser_media_articles.py:21–67) ———

  /** The reference's EN/DE article shape: class-tagged block, title in
    * `div id="hd"`, id = last `<p>`, date as "d Month yyyy" with GERMAN
    * month name (`:35–38,59–62`), optional `div class="author"`
    * (`:41,65`), `<b>`-tagged matched terms, paragraph body. */
  case class OutletArticle(id: String, title: String, iso_date: String,
                           author: String, body: String, terms: Seq[String])

  val germanMonths: Map[String, String] = Map(
    "Januar" -> "01", "Februar" -> "02", "März" -> "03", "April" -> "04",
    "Mai" -> "05", "Juni" -> "06", "Juli" -> "07", "August" -> "08",
    "September" -> "09", "Oktober" -> "10", "November" -> "11", "Dezember" -> "12")

  /** Parse `variant` ∈ {en, de} article blocks. Blocks are terminated by
    * an explicit `<!--/article-->` marker because the block div contains
    * child divs; the OPEN tag match is attribute-insensitive (class
    * tokens `article` + `{variant}Article` in any attribute order), the
    * inner title/author divs use the balanced scan, and body paragraphs
    * match by class TOKENS rather than a literal attribute string. */
  def parseOutlet(html: String, variant: String): Seq[OutletArticle] = {
    if (html == null) return Seq.empty
    val blocks = "(?si)<div\\b[^>]*>".r.findAllMatchIn(html).toSeq.collect {
      case m if {
        val t = attrTokens(m.matched, "class")
        t.contains("article") && t.contains(variant + "Article")
      } =>
        val rest = html.substring(m.end)
        val end = rest.indexOf("<!--/article-->")
        if (end >= 0) rest.substring(0, end) else rest
    }
    blocks.map { b =>
      val title = divBlocks(b, "hd", attr = "id").headOption
        .map(_.trim).getOrElse("")
      val author = divBlocks(b, "author").headOption.map(_.trim).getOrElse("")
      // reference takes the LAST <p> as the article id
      // (parser_media_articles.py:41 find_all('p')[-1]) — any attributes
      val ps = "(?si)<p\\b[^>]*>".r.findAllMatchIn(b).toSeq
      def pInner(m: scala.util.matching.Regex.Match): String = {
        val rest = b.substring(m.end)
        val close = rest.indexOf("</p>")
        (if (close >= 0) rest.substring(0, close) else rest).trim
      }
      val id = ps.lastOption.map(pInner).getOrElse("")
      val body = ps.collect {
        case m if {
          val t = attrTokens(m.matched, "class")
          t.contains("articleParagraph") &&
            t.contains(variant + "articleParagraph")
        } => pInner(m)
      }.mkString("\n")
      val terms = "(?s)<b>(.*?)</b>".r.findAllMatchIn(b).map(_.group(1).trim).toSeq
      // reference: first "d Month yyyy" in the joined div texts → ISO
      val iso = "(\\d{1,2})\\s(\\p{L}+)\\s(\\d{4})".r.findFirstMatchIn(b)
        .flatMap(d => germanMonths.get(d.group(2))
          .map(mm => f"${d.group(3)}-$mm-${d.group(1).toInt}%02d"))
        .getOrElse("")
      OutletArticle(id, title, iso, author, body, terms)
    }
  }

  private def outletUdf(variant: String) = udf((html: String) =>
    parseOutlet(html, variant)
      .map(a => (a.id, a.title, a.iso_date, a.author, a.body, a.terms)))

  /** Deterministically render EN (even doc_id) / DE (odd doc_id) outlet
    * pages from `documents`: German-month date, optional author every 3rd
    * doc, 0–2 `<b>` terms by doc_id — every field reconstructible in the
    * oracle from `documents` alone. */
  def renderOutlet(spark: SparkSession, dir: String, variant: String): DataFrame = {
    import spark.implicits._
    val parity = if (variant == "en") 0 else 1
    val monthName = map(germanMonths.toSeq.flatMap { case (n, mm) =>
      Seq(lit(mm.toInt), lit(n)) }: _*)
    Tables.documents(spark, dir)
      .filter($"doc_id" % 2 === parity)
      .withColumn("block", concat(
        lit(s"""<div class="article ${variant}Article"><div id="hd">doc_"""),
        $"doc_id", lit("</div><div class=\"meta\">Published "),
        ($"doc_id" % 28 + 1).cast("string"), lit(" "),
        element_at(monthName, ($"doc_id" % 12 + 1).cast("int")),
        lit(" 2023</div>"),
        when($"doc_id" % 3 === 0,
          concat(lit("<div class=\"author\">author_"), $"doc_id", lit("</div>")))
          .otherwise(lit("")),
        when($"doc_id" % 3 >= 1,
          concat(lit("<b>term_"), ($"doc_id" % 5).cast("string"), lit("</b>")))
          .otherwise(lit("")),
        when($"doc_id" % 3 === 2,
          concat(lit("<b>term_"), (($"doc_id" + 1) % 5).cast("string"), lit("</b>")))
          .otherwise(lit("")),
        lit(s"""<p class="articleParagraph ${variant}articleParagraph">"""),
        coalesce($"text", lit("")), lit("</p><p>"), lit(s"${variant}_"),
        $"doc_id", lit("</p></div><!--/article-->")))
      .groupBy(($"doc_id" / 4).cast("long").as("page_id"))
      .agg(concat_ws("\n", sort_array(collect_list(
        struct($"doc_id", $"block"))).getField("block")).as("html"))
  }

  /** E3 end-to-end (`parser_media_articles.py:91–120`): EN + DE outlet
    * scans → per-format UDTF explode → union → id dedup → projection. */
  def mediaCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def side(variant: String): DataFrame =
      renderOutlet(spark, dir, variant)
        .select(explode(outletUdf(variant)($"html")).as("a"))
        .select(
          lit(s"${variant}_outlet").as("media"),
          $"a._1".as("id"), $"a._2".as("title"), $"a._3".as("iso_date"),
          $"a._4".as("author"),
          array_join($"a._6", ",").as("terms_csv"),
          size($"a._6").cast("long").as("n_terms"),
          length($"a._5").cast("long").as("body_len"))
    side("en").unionByName(side("de"))
      .dropDuplicates("id")
      .orderBy($"id")
  }

  /** Deterministically render FAZ-format HTML pages from `documents`:
    * page = doc_id / 3, each doc becomes one single-document block with a
    * synthetic dd.mm.yyyy date derived from doc_id. */
  def renderFaz(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def dd(doc: Column) = lpad((doc % 28 + 1).cast("string"), 2, "0")
    def mm(doc: Column) = lpad((doc % 12 + 1).cast("string"), 2, "0")
    Tables.documents(spark, dir)
      .withColumn("block", concat(
        lit("<div class=\"single-document\"><pre class=\"docSource\">FAZ "),
        dd($"doc_id"), lit("."), mm($"doc_id"), lit(".2023"),
        lit("</pre><pre class=\"docTitle\">doc_"), $"doc_id",
        lit("</pre><pre class=\"text\">"), coalesce($"text", lit("")),
        lit("</pre></div>")))
      .groupBy(($"doc_id" / 3).cast("long").as("page_id"))
      .agg(concat_ws("\n", sort_array(collect_list(
        struct($"doc_id", $"block"))).getField("block")).as("html"))
  }
}
