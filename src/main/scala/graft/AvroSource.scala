package graft

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal native Avro source (DataSource V2 `TableProvider`), covering the
  * reference's Avro scan (`datafusion/core/src/datasource/physical_plan/
  * avro.rs:38`). The `spark-avro` connector artifact is not available in
  * this offline sandbox (no egress; the local caches hold only avro-core),
  * so the scan is built directly on the `org.apache.avro` container-file
  * API that ships with Spark's own jars — which also makes it the repo's
  * demonstration of the DSv2 custom-source surface (SURVEY §2.8
  * TableProvider row).
  *
  * Shape at scale: large container files are split at Avro sync-marker
  * boundaries into byte-range `InputPartition`s (the same splittable-scan
  * shape as the reference's `AvroExec` and Hadoop's AvroRecordReader):
  * each range reader `sync(start)`s to the first block after its range
  * start and reads until `pastSync(end)`, so every block is read by
  * exactly one partition and one huge file can't become a straggler task.
  * The split size defaults to 16 MB and is tunable via the `splitSize`
  * read option (test seam + deployment knob).
  * Column pruning is pushed into the reader (`SupportsPushDownRequiredColumns`):
  * a row format still decodes every field it stores, but pruned fields
  * skip Catalyst conversion and never enter the scan output schema, which
  * is what matters for the downstream exchange width. Comparison predicates
  * are pushed too (`SupportsPushDownFilters`, [[PushedRowFilters]]): rejected
  * rows are dropped on the raw record before conversion, and every filter
  * is also returned to Spark as a residual, so correctness never depends
  * on the pushed evaluation.
  *
  * Types: null/boolean/int/long/float/double/string/bytes and nullable
  * `union(null, T)` — the primitive core every engine agrees on. Decimal/
  * temporal logical types are deliberately out of scope (cast before
  * write); unsupported types fail loudly at schema mapping.
  *
  * Usage: `spark.read.format("graft.AvroSource").load(dir)`.
  */
class AvroSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroSource.listFiles(options.get("path"))
    require(files.nonEmpty, s"no .avro files under ${options.get("path")}")
    AvroSource.toSparkSchema(AvroSource.readFileSchema(files.head))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AvroTable(schema, properties.get("path"))
}

object AvroSource {
  private[graft] def listFiles(path: String): Seq[File] = {
    val f = new File(path)
    val all = if (f.isDirectory) f.listFiles().toSeq else Seq(f)
    all.filter(_.getName.endsWith(".avro")).sortBy(_.getName)
  }

  private[graft] def readFileSchema(file: File): Schema = {
    val r = new DataFileReader[GenericRecord](file, new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Avro record schema → Catalyst; `union(null, T)` → nullable T. */
  private[graft] def toSparkSchema(avro: Schema): StructType = {
    def field(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
        require(nonNull.size == 1, s"unsupported union $s")
        (field(nonNull.head)._1, branches.size > nonNull.size)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case t => throw new IllegalArgumentException(s"unsupported avro type $t")
    }
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = field(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  /** Catalyst → Avro record schema; nullable → `union(null, T)`. */
  private[graft] def toAvroSchema(spark: StructType, name: String): Schema = {
    def base(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case t => throw new IllegalArgumentException(
        s"unsupported type for avro sink: $t (cast before write)")
    }
    val fields = spark.fields.map { f =>
      val s = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base(f.dataType)))
      else base(f.dataType)
      new Schema.Field(f.name, s, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.List.of(fields: _*))
  }

  /** Distributed Avro sink: each task writes one container file into `dir`
    * (the many-small-files layout every distributed sink uses; a real
    * deployment adds a commit protocol on top). Local-mode executors share
    * the driver filesystem, so plain file writes are the committer here. */
  def write(df: DataFrame, dir: String): Unit = {
    new File(dir).mkdirs()
    listFiles(dir).foreach(_.delete()) // overwrite semantics (parts are UUID-named)
    val schemaJson = toAvroSchema(df.schema, "row").toString
    val names = df.schema.fieldNames
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        val part = java.util.UUID.randomUUID().toString
        w.create(schema, new File(s"$dir/part-$part.avro"))
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            rec.put(names(i), r.get(i) match {
              case null => null
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case v => v
            })
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }
}

private class AvroTable(tableSchema: StructType, path: String) extends Table with SupportsRead {
  override def name(): String = s"avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, path,
      math.max(1L, options.getLong("splitSize", 16L * 1024 * 1024)))
}

/** Comparison-shaped filters evaluated directly on the raw source values,
  * BEFORE Catalyst conversion — shared by [[AvroSource]] (per
  * GenericRecord) and [[ArrowSource]] (per vector slot). The win for a
  * row format is not IO skipping but dropping rows before per-field
  * conversion/allocation and before they widen the downstream exchange.
  * Callers return all filters to Spark as residuals (conservative claim),
  * so semantics never depend on this evaluation being complete — which is
  * also why an INCOMPARABLE pair must KEEP the row: under-filtering is
  * corrected by the residual, over-filtering never is. */
private[graft] object PushedRowFilters {
  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, v) => comparable(v)
    case GreaterThan(_, v) => comparable(v)
    case GreaterThanOrEqual(_, v) => comparable(v)
    case LessThan(_, v) => comparable(v)
    case LessThanOrEqual(_, v) => comparable(v)
    case IsNull(_) | IsNotNull(_) => true
    case _ => false
  }

  private def comparable(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Double | _: Float | _: String | _: Boolean => true
    case _ => false
  }

  /** Null ordering follows SQL (comparisons with null are not satisfied);
    * `get` returns the raw source value for a column name (null for SQL
    * NULL). */
  def eval(f: Filter, get: String => Any): Boolean = f match {
    case IsNull(c) => get(c) == null
    case IsNotNull(c) => get(c) != null
    case EqualTo(c, v) => nullableCmp(get(c), v)(_ == 0)
    case GreaterThan(c, v) => nullableCmp(get(c), v)(_ > 0)
    case GreaterThanOrEqual(c, v) => nullableCmp(get(c), v)(_ >= 0)
    case LessThan(c, v) => nullableCmp(get(c), v)(_ < 0)
    case LessThanOrEqual(c, v) => nullableCmp(get(c), v)(_ <= 0)
    case _ => true // unclaimed filters are Spark's residual responsibility
  }

  private def nullableCmp(rv: Any, fv: Any)(sat: Int => Boolean): Boolean =
    if (rv == null) false // SQL: comparison with null is not satisfied
    else cmp(rv, fv).forall(sat) // incomparable → keep, the residual decides

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer |
         _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }

  /** Matches Spark's comparison semantics where it differs from Java's:
    * strings order by UTF-8 bytes (not UTF-16 chars), -0.0 == 0.0, NaN is
    * greater than everything and equal to itself. Integral record values
    * only compare against integral filter values (a fractional literal
    * reaching a long column — possible with UnwrapCastInBinaryComparison
    * excluded — would truncate and over-filter; leave it to the residual). */
  private def cmp(rv: Any, fv: Any): Option[Int] = (rv, fv) match {
    case (a: org.apache.avro.util.Utf8, b: String) =>
      Some(UTF8String.fromBytes(a.getBytes, 0, a.getByteLength)
        .compareTo(UTF8String.fromString(b)))
    case (a: UTF8String, b: String) => Some(a.compareTo(UTF8String.fromString(b)))
    case (a: String, b: String) =>
      Some(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    case (a: java.lang.Boolean, b: Boolean) => Some(a.compareTo(b))
    case (a: java.lang.Long, b: Number) if isIntegral(b) =>
      Some(java.lang.Long.compare(a, b.longValue()))
    case (a: java.lang.Integer, b: Number) if isIntegral(b) =>
      Some(java.lang.Long.compare(a.longValue(), b.longValue()))
    case (a: java.lang.Double, b: Number) => Some(cmpDouble(a, b.doubleValue()))
    case (a: java.lang.Float, b: Number) =>
      Some(cmpDouble(a.doubleValue(), b.doubleValue()))
    case _ => None
  }

  private def cmpDouble(a: Double, b: Double): Int =
    if (a.isNaN || b.isNaN) java.lang.Double.compare(a, b) // NaN last, NaN==NaN
    else if (a == b) 0 // primitive ==: -0.0 == 0.0, matching Spark
    else if (a < b) -1 else 1
}

private class AvroScanBuilder(full: StructType, path: String, splitSize: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(PushedRowFilters.supported)
    filters // conservative: Spark re-evaluates everything as residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new AvroScan(required, path, splitSize, pushed)
}

private class AvroScan(required: StructType, path: String, splitSize: Long,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"AvroScan $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** One partition per `splitSize` byte range of each file; a range owns
    * the blocks whose preceding sync marker starts inside it (Hadoop's
    * split convention), so ranges cover every block exactly once without
    * the planner ever reading block headers. */
  override def planInputPartitions(): Array[InputPartition] =
    AvroSource.listFiles(path).flatMap { f =>
      val len = f.length()
      val n = math.max(1L, (len + splitSize - 1) / splitSize)
      (0L until n).map { i =>
        val start = i * splitSize
        // last range ends at the file length, NOT Long.MaxValue: Avro's
        // pastSync computes position + SYNC_SIZE, which overflows on MaxValue
        // and would report every block as past the range
        val end = math.min((i + 1) * splitSize, len)
        AvroFilePartition(f.getAbsolutePath, start, end)
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required, pushed)
}

private case class AvroFilePartition(file: String, start: Long, end: Long)
    extends InputPartition

private class AvroReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroFilePartition]
    new AvroPartitionReader(p.file, p.start, p.end, required, pushed)
  }
}

private class AvroPartitionReader(file: String, start: Long, end: Long,
    required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val reader =
    new DataFileReader[GenericRecord](new File(file), new GenericDatumReader[GenericRecord]())
  // position at the first block after `start` (for start 0 this lands on the
  // header's trailing sync, i.e. the first block); read until the first sync
  // at-or-past `end` — the next range's reader picks up exactly there
  reader.sync(start)
  private val names = required.fieldNames
  private val types = required.fields.map(_.dataType)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (reader.hasNext && !reader.pastSync(end)) {
      val rec = reader.next()
      // pushed predicates run on the raw record: rows they reject are
      // skipped before any Catalyst conversion happens
      var keep = true
      var f = 0
      while (keep && f < pushed.length) {
        keep = PushedRowFilters.eval(pushed(f), rec.get(_))
        f += 1
      }
      if (keep) {
        val vals = new Array[Any](names.length)
        var i = 0
        while (i < names.length) {
          vals(i) = convert(rec.get(names(i)), types(i))
          i += 1
        }
        current = InternalRow.fromSeq(vals.toIndexedSeq)
        return true
      }
    }
    false
  }

  private def convert(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => UTF8String.fromString(u.toString)
    case s: String => UTF8String.fromString(s)
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other // int/long/float/double/boolean pass through
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
