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

  /** Extract all `<div class="single-document">…</div>` blocks, then the
    * class-tagged <pre> fields inside each. Null-safe: missing fields → "".
    */
  def parseFaz(html: String): Seq[Article] = {
    if (html == null) return Seq.empty
    val block = "(?s)<div class=\"single-document\">(.*?)</div>".r
    def field(b: String, cls: String): String =
      ("(?s)<pre class=\"" + cls + "\">(.*?)</pre>").r
        .findFirstMatchIn(b).map(_.group(1).trim).getOrElse("")
    block.findAllMatchIn(html).map { m =>
      val b = m.group(1)
      // reference extracts the dd.mm.yyyy date from the docSource line
      // (parser_media_articles.py:14) — first date-shaped token wins
      val src = field(b, "docSource")
      val date = "\\d{2}\\.\\d{2}\\.\\d{4}".r.findFirstIn(src).getOrElse("")
      Article(date, field(b, "docTitle"), field(b, "text"))
    }.toSeq
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
