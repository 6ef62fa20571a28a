package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[RawConvert.RawEventReader]] over the vaex HDF5 column layout — the
  * reference's on-disk feature format (`/table/columns/<name>/data`,
  * opened by `vx.open_many`, `analyzer.py:560`;
  * `/root/reference/demos/features.hdf5` is the live example). Backed by
  * the pure-JVM [[Hdf5File]] reader, so the full chain
  * HDF5 → decode → curated Parquet runs with no native dependency.
  *
  * Column mapping:
  *   - float64/float32 datasets → DoubleType, EXCEPT the curated key /
  *     index columns (`integralKeyCols`) which pandas→vaex round-trips
  *     store as float64 but are semantically integral — mapped to
  *     LongType (exact: the values are small integers, ≪ 2^53)
  *   - fixed-point datasets → LongType
  *   - string columns (vaex/Arrow `data` chars + `indices` offsets
  *     sub-datasets) → StringType
  *
  * The schema is inferred ONCE from a sample file; every file of a
  * conversion batch must carry at least those columns (extra columns are
  * ignored; a missing one fails loudly). One file is decoded per
  * executor task ([[RawConvert.decode]]) with column arrays held in
  * memory — raw feature dumps are per-series files orders of magnitude
  * below executor memory; at 100 TB the parallelism is ACROSS files. */
final class VaexHdf5Reader(val schema: StructType)
    extends RawConvert.RawEventReader {

  def readFile(path: String): Iterator[Row] = {
    val f = new Hdf5File(path)
    try {
      val cols: Array[Array[Any]] = schema.fields.map { field =>
        val g = s"${VaexHdf5Reader.columnsGroup}/${field.name}"
        field.dataType match {
          case StringType => f.readArrowStrings(g).asInstanceOf[Array[Any]]
          case LongType =>
            f.readLongs(s"$g/data").map(_.asInstanceOf[Any])
          case DoubleType =>
            f.readDoubles(s"$g/data").map(_.asInstanceOf[Any])
          case t => throw new IllegalStateException(
            s"unexpected schema type $t for column ${field.name}")
        }
      }
      val n = cols.headOption.map(_.length).getOrElse(0)
      cols.zip(schema.fieldNames).foreach { case (c, name) =>
        require(c.length == n,
          s"$path: column '$name' has ${c.length} rows, expected $n")
      }
      // columns are fully decoded — the iterator only re-assembles rows
      (0 until n).iterator.map(i => Row.fromSeq(cols.map(_(i)).toIndexedSeq))
    } finally f.close()
  }
}

object VaexHdf5Reader {

  val columnsGroup = "/table/columns"

  /** Key/index columns that the pandas→vaex conversion stores as
    * float64 but the curated schema needs integral
    * (`analyzer.py:1030-1046` keys on them; `semiautocuts.py:58` builds
    * composite int keys from them). */
  val integralKeyCols: Set[String] = Set(
    "series_number", "dump_number", "event_number", "event_index",
    "event_id", "trigger_type")

  /** Infer the batch schema from one sample file. Per-column `unit`
    * attributes (the physical-units metadata `df.unit(expr)` serves in
    * the reference, `analyzer.py:135-136`) are carried into the
    * StructField Metadata under the key `unit` — Spark persists field
    * metadata through Parquet, so units survive the full
    * HDF5 → curated store → [[graft.core.EventTable.unit]] chain. Both
    * the column group and its `data` dataset are consulted (writers
    * differ on where they hang the attribute). */
  def inferSchema(sampleFile: String): StructType = {
    val f = new Hdf5File(sampleFile)
    try {
      val fields = f.list(columnsGroup).map { name =>
        val g = s"$columnsGroup/$name"
        val members = f.list(g)
        val tpe =
          if (members.contains("indices")) StringType // Arrow-style string
          else {
            val ds = f.dataset(s"$g/data")
            ds.dtype.clazz match {
              case 0 => LongType
              case 1 =>
                if (integralKeyCols(name)) LongType else DoubleType
              case 3 => StringType // fixed-length string data
              case c => throw new UnsupportedOperationException(
                s"$sampleFile: column '$name' datatype class $c unsupported")
            }
          }
        val unit = (f.attributes(g) ++
          (if (members.contains("data")) f.attributes(s"$g/data")
           else Map.empty)).get("unit").collect { case s: String => s }
        val md = unit.fold(Metadata.empty)(u =>
          new MetadataBuilder().putString("unit", u).build())
        StructField(name, tpe, nullable = false, metadata = md)
      }
      StructType(fields)
    } finally f.close()
  }

  /** Reader with the schema inferred from `sampleFile`. */
  def apply(sampleFile: String): VaexHdf5Reader =
    new VaexHdf5Reader(inferSchema(sampleFile))
}
