package graft.sources

import java.util.Base64

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.{Lake, LakeConfig}

/** SQL row-level DML — `UPDATE`, `MERGE INTO`, and subquery `DELETE` —
  * for the graft format, as a DELTA-BASED row-level operation
  * ([[SupportsDelta]], `rowId = [id]`): Spark plans the statement,
  * executors stage ONLY the changed rows (the delta) as small files on
  * the lake's own filesystem, and the driver-side commit applies the
  * whole delta as ONE transactional keyed rewrite — the identical
  * machinery as [[graft.Lake.upsert]]/[[graft.Lake.deleteWhere]]
  * (re-derive + re-route, staged publish, manifest commit under the
  * writer lock), so a MERGE'd row and a Scala-upserted row can never
  * diverge on routing, defaults, or evolve extras.
  *
  * Why delta-based and not group-based copy-on-write: the group path
  * needs a fully distributed replacement write (executors write whole
  * rewritten partitions through a DSv2 `BatchWrite`), which would fork
  * a second write pipeline next to the transactional rewrite the
  * engine already trusts. The delta path stages O(changed rows) — for
  * DML, orders of magnitude below the table — and then reuses the ONE
  * rewrite that upsert/delete/compact/expire already share. (The
  * streaming-sink ADR's 2× write-amplification objection does not
  * apply: that was the CONTINUOUS ingest hot path, where every row
  * pays the staging; here only the delta does, and the alternative —
  * group COW — re-stages whole partitions instead.)
  *
  * Update splitting: an UPDATE arrives as delete(old id) + insert(new
  * row) records (split here, not by Spark), which makes `SET id = …`
  * re-keying and `SET vector = …` shard moves fall out of the keyed
  * rewrite naturally — the new row re-derives and re-routes exactly
  * like an upsert. Derived columns (`shard` on LSH lakes, `packed`,
  * `pq_code`) are recomputed by the rewrite; assigning them in SET has
  * no effect, by design.
  *
  * 100 TB posture: the scan half is the stock pruned format scan
  * (condition pushdown reaches the parquet reader); the staged delta
  * is O(changed rows) of JSON on the lake's store; the apply rewrites
  * only partitions that hold or receive a changed row. A DML touching
  * k rows across p of N partitions costs a pruned scan + p directory
  * rewrites — never O(table).
  *
  * Reference: the reference has no DML surface at all (index.py's only
  * mutation is add()); this rounds out the engine's SQL story so a
  * lake is a first-class `UPDATE`/`MERGE` target like any warehouse
  * table. */
private[sources] final class GraftRowLevelBuilder(
    name0: String,
    cfg: LakeConfig,
    table: GraftTable,
    info: RowLevelOperationInfo)
  extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(name0, cfg, table, info.command())
}

private final class GraftRowLevelOperation(
    name0: String,
    cfg: LakeConfig,
    table: GraftTable,
    cmd: RowLevelOperation.Command)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The target scan is the table's own pruned scan — pushdown, shard
    * pruning, DPP all apply to finding the matched rows. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table.newScanBuilder(options)

  /** Row identity = the lake's keyed-upsert identity, referenced
    * through the NON-NULL metadata twin `_graft_rid` — Spark refuses a
    * nullable rowId, and the data column `id` must stay nullable for
    * the column-list INSERT surface ([[GraftTable.metadataColumns]]
    * scaladoc). */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftDataSource.RidName))

  /** Updates are split into delete+insert HERE (see class doc), so the
    * planner keeps sending whole-row updates. */
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(cfg, info)
    }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, $name0)"
}

/** The delta write: executor writers stage change records under
  * `<lake>/_rlo/<queryId>/`, the driver commit applies them in one
  * transactional rewrite and sweeps the staging dir (success, abort,
  * or empty — always swept). Task files are named by (partition,
  * task), so a speculative duplicate stages separately and only the
  * attempt the commit coordinator admits contributes its file. */
private final class GraftDeltaWrite(cfg: LakeConfig, info: LogicalWriteInfo)
  extends DeltaWrite {
  private val rowSchema: StructType = info.schema()
  private val stagingDir: String =
    s"${cfg.location}/_rlo/${info.queryId()}"

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(
        p: PhysicalWriteInfo): DeltaWriterFactory = {
      val conf = new GraftDeltaCodec.SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration)
      new GraftDeltaWriterFactory(stagingDir, rowSchema, conf)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      try {
        val paths = messages.collect {
          case m: GraftDeltaCommitMessage if m.path != null => m.path
        }
        if (paths.nonEmpty) {
          // every staged file must still be there: a vacuum that swept
          // a LIVE statement's _rlo (possible only past the 10-minute
          // age gate) must fail the statement loudly, never apply a
          // partial delta
          val fs = new Path(stagingDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val missing = paths.filterNot(p => fs.exists(new Path(p)))
          if (missing.nonEmpty) throw new IllegalStateException(
            s"graft row-level DML: ${missing.length} staged delta " +
              s"file(s) under $stagingDir vanished (swept by a " +
              "concurrent vacuum?) — re-run the statement")
          // a pure-DELETE write schema has no row columns, but the D
          // records still carry the deleted identity under "id"
          val fields = StructField(GraftDeltaCodec.OpField, StringType) +:
            (if (rowSchema.fieldNames.contains("id")) Nil
             else Seq(StructField("id", StringType))) ++:
            rowSchema.fields.toSeq.map(f => StructField(f.name,
              GraftDeltaCodec.transport(f.dataType), nullable = true))
          val transport = StructType(fields)
          val staged = spark.read.schema(transport)
            .option("allowNonNumericNumbers", "true")
            .json(paths.toSeq: _*)
          val op = col(GraftDeltaCodec.OpField)
          val deletes = staged.where(op === "D").select(col("id"))
          val inserts = staged.where(op === "I").select(
            rowSchema.fields.toSeq.map(f =>
              GraftDeltaCodec.restore(col(f.name), f.dataType)
                .as(f.name)): _*)
          // OPT-IN bounded retry on writer-lock contention
          // (spark.graft.dml.lockRetries, default 0 = refuse on first
          // contention as always): two small racing statements
          // serialize on the lock, and the loser's only failure is
          // "someone else was committing" — with retries configured it
          // backs off (exponential, capped) and re-applies its
          // ALREADY-STAGED delta against the then-current state, the
          // same convergent keyed-upsert semantics a caller-side rerun
          // would get. The staged files outlive attempts; the final
          // sweep in `finally` covers success and exhaustion alike.
          val retries = spark.conf
            .get("spark.graft.dml.lockRetries", "0").toInt
          val baseWaitMs = spark.conf
            .get("spark.graft.dml.lockRetryWaitMs", "200").toLong
          var attempt = 0
          var applied = false
          while (!applied) {
            try {
              Lake(spark, cfg).applyRowDelta(deletes, inserts)
              applied = true
            } catch {
              case _: java.util.ConcurrentModificationException
                  if attempt < retries =>
                attempt += 1
                Thread.sleep(math.min(
                  baseWaitMs * (1L << math.min(attempt - 1, 6)), 10000L))
            }
          }
        }
      } finally sweep(spark)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      sweep(SparkSession.active)

    private def sweep(spark: SparkSession): Unit = {
      val p = new Path(stagingDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      // the _rlo parent lingers empty; drop it when this was the last
      val parent = p.getParent
      if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
        fs.delete(parent, false)
      ()
    }
  }

  override def description(): String = s"GraftDeltaWrite($stagingDir)"
}

private final case class GraftDeltaCommitMessage(path: String, records: Long)
  extends WriterCommitMessage

private final class GraftDeltaWriterFactory(
    stagingDir: String,
    rowSchema: StructType,
    conf: GraftDeltaCodec.SerializableHadoopConf)
  extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private var out: java.io.BufferedWriter = _
      private var file: Path = _
      private var n = 0L

      private def writer(): java.io.BufferedWriter = {
        if (out == null) {
          file = new Path(stagingDir, s"delta-$partitionId-$taskId.jsonl")
          val fs = file.getFileSystem(conf.value)
          out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            fs.create(file, false), java.nio.charset.StandardCharsets.UTF_8))
        }
        out
      }

      private def record(op: String, id: String,
          row: InternalRow): Unit = {
        val sb = new java.lang.StringBuilder(64)
        sb.append('{')
        // the op field name carries \u0001 — escape it like any value
        GraftDeltaCodec.appendString(sb, GraftDeltaCodec.OpField)
        sb.append(":\"").append(op).append('"')
        if (row != null) {
          var i = 0
          while (i < rowSchema.length) {
            if (!row.isNullAt(i)) {
              sb.append(",")
              GraftDeltaCodec.appendString(sb, rowSchema(i).name)
              sb.append(':')
              GraftDeltaCodec.appendValue(sb,
                row.get(i, rowSchema(i).dataType), rowSchema(i).dataType)
            }
            i += 1
          }
        } else {
          sb.append(",\"id\":")
          GraftDeltaCodec.appendString(sb, id)
        }
        sb.append("}\n")
        writer().write(sb.toString)
        n += 1
      }

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        record("D", id.getUTF8String(0).toString, null)

      /** UPDATE = delete(old identity) + insert(new row): `SET id` and
        * shard-moving `SET vector` both land correctly. */
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        record("D", id.getUTF8String(0).toString, null)
        record("I", null, row)
      }

      override def reinsert(meta: InternalRow, row: InternalRow): Unit =
        record("I", null, row)

      override def insert(row: InternalRow): Unit = record("I", null, row)

      override def commit(): WriterCommitMessage = {
        if (out != null) out.close()
        GraftDeltaCommitMessage(if (file == null) null else file.toString, n)
      }

      override def abort(): Unit = {
        if (out != null) { out.close()
          file.getFileSystem(conf.value).delete(file, false); () }
      }

      override def close(): Unit = ()
    }
}

/** The staging codec: catalyst values → JSON lines on the write side,
  * a TRANSPORT schema + restore expressions on the read side. Types
  * without an exact JSON form ride a lossless transport twin:
  * timestamps as epoch micros, dates as epoch days, binary as base64,
  * decimals as plain strings, non-string-keyed maps as entry arrays —
  * every shape [[graft.Lake.evolve]] can register round-trips
  * bit-exactly. */
private[sources] object GraftDeltaCodec {

  /** The \u0001-prefixed op marker rides the reserved namespace (evolve refuses
    * names containing \u0001), so it can never collide with a data column. */
  val OpField = "\u0001op"

  def transport(dt: DataType): DataType = dt match {
    case TimestampType | TimestampNTZType => LongType
    case DateType => IntegerType
    case BinaryType => StringType
    case _: DecimalType => StringType
    case ArrayType(e, _) => ArrayType(transport(e), containsNull = true)
    case MapType(StringType, v, _) =>
      MapType(StringType, transport(v), valueContainsNull = true)
    case MapType(k, v, _) => ArrayType(StructType(Seq(
      StructField("k", transport(k)), StructField("v", transport(v)))),
      containsNull = true)
    case StructType(fields) => StructType(fields.toSeq.map(f =>
      StructField(f.name, transport(f.dataType), nullable = true)))
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType => dt
    case other => throw new UnsupportedOperationException(
      s"graft row-level DML: unsupported column type ${other.simpleString}")
  }

  /** Transport column → the real type (inverse of [[appendValue]]). */
  def restore(c: Column, dt: DataType): Column = dt match {
    case TimestampType => timestamp_micros(c)
    case TimestampNTZType => timestamp_micros(c).cast(TimestampNTZType)
    case DateType => date_from_unix_date(c)
    case BinaryType => unbase64(c)
    case d: DecimalType => c.cast(d)
    case ArrayType(e, _) => when(c.isNull, lit(null).cast(dt))
      .otherwise(transform(c, x => restore(x, e)).cast(dt))
    case MapType(StringType, v, _) => when(c.isNull, lit(null).cast(dt))
      .otherwise(transform_values(c, (_, x) => restore(x, v)).cast(dt))
    case MapType(k, v, _) => when(c.isNull, lit(null).cast(dt))
      .otherwise(map_from_entries(transform(c, e => struct(
        restore(e.getField("k"), k).as("key"),
        restore(e.getField("v"), v).as("value")))).cast(dt))
    case StructType(fields) => when(c.isNull, lit(null).cast(dt))
      .otherwise(struct(fields.toSeq.map(f =>
        restore(c.getField(f.name), f.dataType).as(f.name)): _*).cast(dt))
    case _ => c.cast(dt)
  }

  def appendString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      ch match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    ()
  }

  /** Catalyst value of type `dt` → its transport JSON. */
  def appendValue(sb: java.lang.StringBuilder, v: Any, dt: DataType): Unit = {
    if (v == null) { sb.append("null"); () }
    else dt match {
      case StringType => appendString(sb, v.toString)
      case TimestampType | TimestampNTZType | LongType =>
        sb.append(v.asInstanceOf[Long]); ()
      case DateType | IntegerType => sb.append(v.asInstanceOf[Int]); ()
      case ShortType => sb.append(v.asInstanceOf[Short].toInt); ()
      case ByteType => sb.append(v.asInstanceOf[Byte].toInt); ()
      case BooleanType => sb.append(v.asInstanceOf[Boolean]); ()
      case FloatType => sb.append(num(v.asInstanceOf[Float].toDouble)); ()
      case DoubleType => sb.append(num(v.asInstanceOf[Double])); ()
      case _: DecimalType => appendString(sb,
        v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toPlainString)
      case BinaryType => appendString(sb,
        Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
      case ArrayType(e, _) =>
        val a = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < a.numElements()) {
          if (i > 0) sb.append(',')
          appendValue(sb, if (a.isNullAt(i)) null else a.get(i, e), e)
          i += 1
        }
        sb.append(']')
        ()
      case MapType(StringType, vt, _) =>
        val m = v.asInstanceOf[MapData]
        sb.append('{')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(',')
          appendString(sb, m.keyArray().getUTF8String(i).toString)
          sb.append(':')
          appendValue(sb,
            if (m.valueArray().isNullAt(i)) null
            else m.valueArray().get(i, vt), vt)
          i += 1
        }
        sb.append('}')
        ()
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        sb.append('[')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(',')
          sb.append("{\"k\":")
          appendValue(sb, m.keyArray().get(i, kt), kt)
          sb.append(",\"v\":")
          appendValue(sb,
            if (m.valueArray().isNullAt(i)) null
            else m.valueArray().get(i, vt), vt)
          sb.append('}')
          i += 1
        }
        sb.append(']')
        ()
      case st: StructType =>
        val r = v.asInstanceOf[InternalRow]
        sb.append('{')
        var i = 0
        var first = true
        while (i < st.length) {
          if (!r.isNullAt(i)) {
            if (!first) sb.append(',')
            first = false
            appendString(sb, st(i).name)
            sb.append(':')
            appendValue(sb, r.get(i, st(i).dataType), st(i).dataType)
          }
          i += 1
        }
        sb.append('}')
        ()
      case other => throw new UnsupportedOperationException(
        s"graft row-level DML: unsupported column type ${other.simpleString}")
    }
  }

  /** JSON numbers for non-finite floats: bare NaN/Infinity literals,
    * accepted back by the reader's allowNonNumericNumbers. */
  private def num(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else d.toString

  /** Hadoop Configuration is Writable but not Serializable; tasks need
    * the session's conf (custom filesystems, credentials) — wrap it. */
  final class SerializableHadoopConf(
      @transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }
}

/** Serves the `_graft_rid` metadata column by DUPLICATING the stored
  * id column at read time: readSchema = inner ++ rid, each emitted row
  * carries the id value again in the last position (row path via a
  * reused JoinedRow, columnar path via a shared — close-shielded —
  * column vector, so the vectorized parquet reader stays vectorized).
  * Only a projection that references `_graft_rid` (row-level DML, or
  * an explicit SELECT of it) pays this wrapper; every normal read
  * builds the unwrapped scan. */
private[sources] final class GraftRidScan(
    inner: org.apache.spark.sql.connector.read.Scan)
  extends org.apache.spark.sql.connector.read.Scan {

  override def readSchema(): StructType = StructType(
    inner.readSchema().fields :+
      StructField(GraftDataSource.RidName, StringType, nullable = false))

  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    new org.apache.spark.sql.connector.read.Batch {
      private val b = inner.toBatch
      override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] =
        b.planInputPartitions()
      override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
        new GraftRidReaderFactory(b.createReaderFactory(),
          inner.readSchema().fieldIndex("id"))
    }

  override def description(): String = s"RidAppend(${inner.description()})"
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()
  override def columnarSupportMode(): org.apache.spark.sql.connector.read.Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
}

private final class GraftRidReaderFactory(
    inner: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    idOrdinal: Int)
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(p)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val r = inner.createReader(p)
      private val joined =
        new org.apache.spark.sql.catalyst.expressions.JoinedRow
      private val extra =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      override def next(): Boolean = r.next()
      override def get(): InternalRow = {
        val row = r.get()
        extra.update(0, row.getUTF8String(idOrdinal))
        joined.apply(row, extra)
      }
      override def close(): Unit = r.close()
    }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private val r = inner.createColumnarReader(p)
      override def next(): Boolean = r.next()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        val b = r.get()
        val cols = Array.tabulate[org.apache.spark.sql.vectorized.ColumnVector](
          b.numCols() + 1) { i =>
          if (i < b.numCols()) b.column(i)
          // the rid column IS the id vector — shared by reference, so
          // shield it from a double close
          else new GraftNoCloseVector(b.column(idOrdinal))
        }
        new org.apache.spark.sql.vectorized.ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = r.close()
    }
}

/** A by-reference view of another ColumnVector whose close() is a
  * no-op — the underlying vector is owned (and eventually closed) by
  * the wrapped reader; closing it twice would double-free off-heap
  * memory. */
private final class GraftNoCloseVector(
    inner: org.apache.spark.sql.vectorized.ColumnVector)
  extends org.apache.spark.sql.vectorized.ColumnVector(inner.dataType()) {
  override def close(): Unit = ()
  override def hasNull: Boolean = inner.hasNull
  override def numNulls(): Int = inner.numNulls()
  override def isNullAt(i: Int): Boolean = inner.isNullAt(i)
  override def getBoolean(i: Int): Boolean = inner.getBoolean(i)
  override def getByte(i: Int): Byte = inner.getByte(i)
  override def getShort(i: Int): Short = inner.getShort(i)
  override def getInt(i: Int): Int = inner.getInt(i)
  override def getLong(i: Int): Long = inner.getLong(i)
  override def getFloat(i: Int): Float = inner.getFloat(i)
  override def getDouble(i: Int): Double = inner.getDouble(i)
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    inner.getArray(i)
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    inner.getMap(i)
  override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
    inner.getDecimal(i, p, s)
  override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
    inner.getUTF8String(i)
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(i)
  override def getChild(i: Int): org.apache.spark.sql.vectorized.ColumnVector =
    inner.getChild(i)
}
