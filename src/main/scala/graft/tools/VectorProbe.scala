package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.{ParquetInputFormat, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.parquet.{ParquetWriteSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** Probe: write parquet from InternalRow via ParquetWriteSupport on an
  * executor-less JVM, read it back with VectorizedParquetRecordReader
  * (row-group filter + appended partition columns) — the machinery for the
  * polar DSv2 write/read paths, exercised in isolation. */
object VectorProbe {

  val Schema: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("token", LongType),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType),
    StructField("value", BinaryType)))

  class RowWriterBuilder(path: Path, conf: Configuration)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("vector_probe").toString
    val file = s"$dir/probe.parquet"
    val conf = new Configuration()
    import org.apache.spark.sql.internal.SQLConf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, "UTC")
    ParquetWriteSupport.setSchema(Schema, conf)

    val writer = new RowWriterBuilder(new Path(file), conf)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.ZSTD)
      .build()
    var i = 0
    while (i < 1000) {
      val row = new GenericInternalRow(Array[Any](
        if (i % 7 == 0) null else UTF8String.fromString(s"key$i"),
        java.lang.Long.valueOf(i.toLong * 31),
        java.lang.Long.valueOf(100L + i),
        java.lang.Long.valueOf(1700000000000000L + i * 1000L),
        s"v$i".getBytes("UTF-8")))
      writer.write(row)
      i += 1
    }
    writer.close()
    println(s"PROBE wrote $file")

    // read back offsets [150, 900) with part=5/topic=events appended
    val rconf = new Configuration()
    rconf.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport].getName)
    rconf.set("org.apache.spark.sql.parquet.row.requested_schema", Schema.json)
    rconf.set("spark.sql.session.timeZone", "UTC")
    rconf.setBoolean("spark.sql.parquet.binaryAsString", false)
    rconf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    rconf.setBoolean("spark.sql.caseSensitive", false)
    rconf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", false)
    rconf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    ParquetInputFormat.setFilterPredicate(rconf,
      FilterApi.and(
        FilterApi.gtEq(FilterApi.longColumn("offset"), java.lang.Long.valueOf(150L)),
        FilterApi.ltEq(FilterApi.longColumn("offset"), java.lang.Long.valueOf(899L))))
    val status = new Path(file).getFileSystem(rconf).getFileStatus(new Path(file))
    val split = new FileSplit(new Path(file), 0, status.getLen, Array.empty[String])
    val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    try {
      reader.initialize(split, new TaskAttemptContextImpl(rconf, new TaskAttemptID()))
      val partSchema = StructType(Seq(
        StructField("part", IntegerType, nullable = false),
        StructField("topic", StringType, nullable = false)))
      val partValues = new GenericInternalRow(Array[Any](5, UTF8String.fromString("events")))
      reader.initBatch(partSchema, partValues)
      reader.enableReturningBatches()
      var rows = 0L
      var minOff = Long.MaxValue
      var maxOff = Long.MinValue
      var sawPart = -1
      var sawTopic = ""
      var nullKeys = 0
      while (reader.nextKeyValue()) {
        val batch = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
        val it = batch.rowIterator()
        while (it.hasNext) {
          val r = it.next()
          rows += 1
          val off = r.getLong(2)
          minOff = math.min(minOff, off); maxOff = math.max(maxOff, off)
          sawPart = r.getInt(5)
          sawTopic = r.getUTF8String(6).toString
          if (r.isNullAt(0)) nullKeys += 1
        }
      }
      println(s"PROBE read rows=$rows offsets=[$minOff,$maxOff] part=$sawPart " +
        s"topic=$sawTopic nullKeys=$nullKeys")
      // the parquet filter prunes at ROW-GROUP granularity: this file is one
      // row group, so all 1000 rows survive — exact [start,end) trimming is
      // the reader wrapper's job (PolarPartitionReader)
      assert(rows == 1000, s"expected 1000 rows (row-group granular), got $rows")
      assert(minOff == 100 && maxOff == 1099, "offset bounds wrong")
      assert(sawPart == 5 && sawTopic == "events", "partition values wrong")
      println("PROBE OK: vectorized write/read round trip")
    } finally reader.close()
  }
}
