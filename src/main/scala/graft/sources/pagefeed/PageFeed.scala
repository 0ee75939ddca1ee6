package graft.sources.pagefeed

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 source for a cursor-paginated page feed — the engine-level
  * realization of the reference's Twitter v2 fetch loop
  * (`tweet_download.py:62–103`): pages arrive as numbered JSON documents
  * (`{"data": [...], "meta": {"next_token": ...}}`), and the consumer's
  * resume point is the page cursor.
  *
  * As a STREAM, the cursor IS the Structured Streaming offset: each
  * micro-batch reads pages `(start, end]`, and the checkpoint replaces the
  * reference's hand-rolled next_token file (`:96–100`) — stop and restart
  * resumes exactly where the cursor left off, no reprocessing. As a BATCH
  * it reads all pages present. A live HTTP feed would implement the same
  * contract with the fetcher inside the partition reader; here pages are
  * directory files so the source is deterministic and testable.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.pagefeed.PageFeedProvider")
  *     .option("path", dir).load()
  * }}}
  */
object PageFeed {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("page_id", LongType)))

  private val pageName = raw"page-(\d{5})\.json".r

  /** Contiguous page count from 0 (the feed's cursor chain: page n+1 only
    * counts once page n exists). */
  def pagesAvailable(dir: String): Long = {
    val files = Option(new java.io.File(dir).list()).getOrElse(Array.empty)
    val ids = files.collect { case pageName(n) => n.toLong }.toSet
    Iterator.from(0).takeWhile(i => ids.contains(i.toLong)).size.toLong
  }

  def pageFile(dir: String, page: Long): java.io.File =
    new java.io.File(dir, f"page-$page%05d.json")

  /** Test/demo helper: render one page document in the reference's shape. */
  def writePage(dir: String, page: Long, rows: Seq[(Long, Long, String, Double)],
                hasNext: Boolean): Unit = {
    new java.io.File(dir).mkdirs()
    val data = rows.map { case (e, u, t, v) =>
      s"""{"event_id":$e,"user_id":$u,"event_type":"$t","value":$v}"""
    }.mkString("[", ",", "]")
    val next = if (hasNext) s""""${page + 1}"""" else "null"
    val doc = s"""{"data":$data,"meta":{"next_token":$next}}"""
    java.nio.file.Files.writeString(pageFile(dir, page).toPath, doc)
  }
}

class PageFeedProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PageFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PageFeedTable(properties.get("path"))
}

class PageFeedTable(path: String) extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"pagefeed($path)"
  override def schema(): StructType = PageFeed.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PageFeedScan(path)
    }
}

class PageFeedScan(path: String) extends Scan {
  override def readSchema(): StructType = PageFeed.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      (0L until PageFeed.pagesAvailable(path)).map(PagePartition(path, _): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PageFeedMicroBatchStream(path)
}

/** Offset = number of pages fully consumed (the cursor). */
case class PageOffset(pages: Long) extends Offset {
  override def json(): String = pages.toString
}

class PageFeedMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = PageOffset(0L)
  override def latestOffset(): Offset = PageOffset(PageFeed.pagesAvailable(path))
  override def deserializeOffset(json: String): Offset = PageOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = () // files are the durable feed
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].pages
    val e = end.asInstanceOf[PageOffset].pages
    (s until e).map(PagePartition(path, _): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
}

case class PagePartition(path: String, page: Long) extends InputPartition

object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      private val data = mapper.readTree(PageFeed.pageFile(p.path, p.page)).get("data")
      private var i = -1
      override def next(): Boolean = { i += 1; data != null && i < data.size() }
      override def get(): InternalRow = {
        val r = data.get(i)
        InternalRow(
          r.get("event_id").asLong(),
          r.get("user_id").asLong(),
          UTF8String.fromString(r.get("event_type").asText()),
          r.get("value").asDouble(),
          p.page)
      }
      override def close(): Unit = ()
    }
  }
}
