package graft.streaming

import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A partitioned, offset-addressed, replayable log as a Spark DataSource
  * V2 streaming source — the Kafka CONSUMER CONTRACT (the reference's
  * unbuilt streaming TO-DO, `Diary of Making.md:383-386`) without the
  * broker, which cannot be vendored in this environment (zero egress, no
  * kafka artifact on any local classpath — see PLANS.md round 10).
  * What Structured Streaming actually requires of Kafka is exercised in
  * full: per-partition monotone offsets, a driver that plans each
  * micro-batch as explicit [start, end) offset ranges, DETERMINISTIC
  * re-read of any planned range (exactly-once via checkpointed offsets +
  * replay), and a batch view over the same data for stream==batch
  * differentials. Swapping in real Kafka is a format-string change, which
  * is the source-agnosticism claim EventsStream makes.
  *
  * Layout (`<dir>`):
  *   _meta                 one line: the partition count
  *   p=<k>/<start20>-<count>.log   records [start, start+count), one per
  *                         line: `offset \t tsMillis \t b64(key) \t b64(value)`
  *
  * Segment files are immutable once visible and named by their offset
  * range, so the high-water mark and batch planning are pure LISTING
  * (no data reads on the driver), and a segment is published
  * atomically by rename — the same manifest-last discipline as
  * Snapshots (a crashed producer leaves a `.tmp`, never a torn
  * segment). Base64 keeps arbitrary keys/values line-safe.
  *
  * Scale shape: one InputPartition per log partition per micro-batch —
  * the Kafka parallelism model; readers stream lines and never
  * materialize a segment. At 100 TB the log would live on the object
  * store with the same listing contract.
  */
object OffsetLog {

  val Schema: StructType = StructType.fromDDL(
    "key STRING, value STRING, partition INT, offset BIGINT, ts TIMESTAMP")

  private val SegmentRe = """(\d{20})-(\d+)\.log""".r

  private def fsFor(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  private def pdir(dir: String, p: Int) = new Path(dir, s"p=$p")

  /** Initialize an empty log with `partitions` partitions. */
  def create(spark: SparkSession, dir: String, partitions: Int): Unit = {
    require(partitions > 0)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, root) = fsFor(dir, conf)
    (0 until partitions).foreach(p => fs.mkdirs(pdir(dir, p)))
    val out = fs.create(new Path(root, "_meta"), false)
    try out.write(s"$partitions\n".getBytes("UTF-8")) finally out.close()
  }

  def numPartitions(conf: Configuration, dir: String): Int = {
    val (fs, root) = fsFor(dir, conf)
    val in = fs.open(new Path(root, "_meta"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().next().trim.toInt
    finally in.close()
  }

  /** Visible segments of a partition: (path, startOffset, count), offset
    * order. Listing-only — segment names carry the ranges.
    */
  def segments(conf: Configuration, dir: String, p: Int): Seq[(String, Long, Long)] = {
    val (fs, _) = fsFor(dir, conf)
    val d = pdir(dir, p)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.flatMap { st =>
      st.getPath.getName match {
        case SegmentRe(s, c) => Some((st.getPath.toString, s.toLong, c.toLong))
        case _ => None
      }
    }.sortBy(_._2)
  }

  /** Next offset to be written in a partition (0 for an empty one). */
  def highWater(conf: Configuration, dir: String, p: Int): Long =
    segments(conf, dir, p).foldLeft(0L) { case (hw, (_, s, c)) => math.max(hw, s + c) }

  /** Producer: append `records` (key, value) to one partition as a single
    * immutable segment; returns the new high-water mark. Write-then-rename
    * so a crash mid-write leaves no visible torn segment.
    */
  def append(spark: SparkSession, dir: String, partition: Int,
      tsMillis: Long, records: Seq[(String, String)]): Long = {
    require(records.nonEmpty, "empty append")
    val conf = spark.sessionState.newHadoopConf()
    val (fs, _) = fsFor(dir, conf)
    val start = highWater(conf, dir, partition)
    val name = f"$start%020d-${records.size}.log"
    val d = pdir(dir, partition)
    val tmp = new Path(d, s".$name.tmp")
    val out = fs.create(tmp, true)
    val b64 = Base64.getEncoder
    try {
      val body = records.zipWithIndex.map { case ((k, v), i) =>
        val ko = b64.encodeToString(Option(k).getOrElse("").getBytes("UTF-8"))
        val vo = b64.encodeToString(Option(v).getOrElse("").getBytes("UTF-8"))
        s"${start + i}\t$tsMillis\t$ko\t$vo"
      }.mkString("", "\n", "\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    require(fs.rename(tmp, new Path(d, name)),
      s"offsetlog append: publish rename failed for $name")
    start + records.size
  }

  /** All partitions' high-water marks. */
  def highWaters(conf: Configuration, dir: String): Map[Int, Long] =
    (0 until numPartitions(conf, dir)).map(p => p -> highWater(conf, dir, p)).toMap
}

/** Checkpointable stream position: one offset per log partition. */
case class LogOffsets(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = offsets.toSeq.sortBy(_._1)
    .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object LogOffsets {
  private val Entry = """"(\d+)"\s*:\s*(\d+)""".r
  def parse(s: String): LogOffsets = LogOffsets(
    Entry.findAllMatchIn(s).map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

/** One log partition's [start, end) slice of a planned batch; `files`
  * carries (segmentPath, segmentStart) for every overlapping segment so
  * executors do no listing.
  */
case class OffsetLogInputPartition(
    files: Seq[(String, Long)], partition: Int,
    start: Long, end: Long) extends InputPartition

class OffsetLogReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val slice = p.asInstanceOf[OffsetLogInputPartition]
    new PartitionReader[InternalRow] {
      // fresh conf on the executor: resolves file:// directly and any
      // deployed core-site for cluster filesystems
      private val conf = new Configuration()
      private val b64 = Base64.getDecoder
      private val lines: Iterator[String] = slice.files.iterator
        .flatMap { case (path, _) =>
          val fp = new Path(path)
          val in = fp.getFileSystem(conf).open(fp)
          scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        }
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (lines.hasNext) {
          val Array(o, ts, k, v) = lines.next().split("\t", 4)
          val off = o.toLong
          if (off >= slice.start && off < slice.end) {
            row = new GenericInternalRow(Array[Any](
              UTF8String.fromBytes(b64.decode(k)),
              UTF8String.fromBytes(b64.decode(v)),
              slice.partition, off, ts.toLong * 1000L))
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

class OffsetLogMicroBatchStream(dir: String) extends MicroBatchStream {
  private val conf = SparkSession.active.sessionState.newHadoopConf()
  private val n = OffsetLog.numPartitions(conf, dir)

  override def initialOffset(): Offset =
    LogOffsets((0 until n).map(_ -> 0L).toMap)
  override def latestOffset(): Offset = LogOffsets(OffsetLog.highWaters(conf, dir))
  override def deserializeOffset(json: String): Offset = LogOffsets.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffsets].offsets
    val e = end.asInstanceOf[LogOffsets].offsets
    (0 until n).flatMap { p =>
      val (ps, pe) = (s.getOrElse(p, 0L), e.getOrElse(p, 0L))
      if (pe <= ps) None
      else {
        val files = OffsetLog.segments(conf, dir, p)
          .filter { case (_, fStart, cnt) => fStart < pe && fStart + cnt > ps }
          .map { case (path, fStart, _) => (path, fStart) }
        Some(OffsetLogInputPartition(files, p, ps, pe))
      }
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new OffsetLogReaderFactory
  override def commit(end: Offset): Unit = () // retention is the caller's policy
  override def stop(): Unit = ()
}

class OffsetLogBatch(dir: String) extends Batch {
  private val conf = SparkSession.active.sessionState.newHadoopConf()
  override def planInputPartitions(): Array[InputPartition] = {
    val n = OffsetLog.numPartitions(conf, dir)
    (0 until n).flatMap { p =>
      val hw = OffsetLog.highWater(conf, dir, p)
      if (hw == 0L) None
      else Some(OffsetLogInputPartition(
        OffsetLog.segments(conf, dir, p).map { case (path, s, _) => (path, s) },
        p, 0L, hw))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new OffsetLogReaderFactory
}

class OffsetLogScan(dir: String) extends Scan {
  override def readSchema(): StructType = OffsetLog.Schema
  override def toBatch: Batch = new OffsetLogBatch(dir)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OffsetLogMicroBatchStream(dir)
}

class OffsetLogTable(dir: String) extends Table with SupportsRead {
  require(dir != null && dir.nonEmpty,
    "offsetlog requires .option(\"path\", <log dir>) or .load(<log dir>)")
  override def name(): String = s"offsetlog($dir)"
  override def schema(): StructType = OffsetLog.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new OffsetLogScan(dir) }
}

/** `spark.readStream.format("offsetlog").load(dir)` / `spark.read` twin. */
class OffsetLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "offsetlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OffsetLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new OffsetLogTable(properties.get("path"))
}
