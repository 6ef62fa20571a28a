package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[RawConvert.RawEventReader]] over the pandas FIXED-format HDF5
  * layout — the reference's LEGACY feature path
  * (`pd.read_hdf(afile, "detprocess_df")`, `analyzer.py:550-558`),
  * written by `DataFrame.to_hdf(..., key, format="fixed")` via
  * PyTables. A lab with detprocess output predating the vaex layout
  * hits this on day one of ingest; [[VaexHdf5Reader]] covers the
  * modern layout, this class the PyTables block layout.
  *
  * On-disk shape (pandas `io/pytables.py`, `BlockManagerFixed.write`):
  * one group `/{key}` with attrs `pandas_type='frame'`, `ndim=2`,
  * `nblocks=N`, `axis{i}_variety='regular'`; datasets
  *   - `axis0`  — column names (fixed-length bytes, UTF-8)
  *   - `axis1`  — row index values (unused here: the reference resets
  *                the index on load, `vx.from_pandas`)
  *   - `block{i}_items`  — the i-th dtype-block's column names
  *   - `block{i}_values` — the block matrix, stored TRANSPOSED
  *                (nrows × nitems) for numeric dtypes; object/string
  *                blocks are ONE pickled numpy object array in a
  *                1-element vlen dataset (PyTables VLArray)
  *
  * Column types map: int64 → LongType, float64/32 → DoubleType,
  * pickled string blocks → StringType. `format="table"` files and
  * non-string object columns fail loudly with the format named —
  * silently misreading a physics table is worse than a clear error.
  *
  * Scale shape: identical to the vaex reader — one legacy file per
  * executor task ([[RawConvert.decode]]); files are per-series dumps
  * orders of magnitude below executor memory, parallelism is ACROSS
  * files. Nothing touches the driver but the sampled schema. */
final class PandasHdfReader(val schema: StructType, key: String)
    extends RawConvert.RawEventReader {

  def readFile(path: String): Iterator[Row] = {
    val f = new Hdf5File(path)
    try {
      val (names, cols, nRows) = PandasHdfReader.readColumns(f, key, path)
      val byName = names.zip(cols).toMap
      val out: Array[Array[Any]] = schema.fields.map { field =>
        val col = byName.getOrElse(field.name, throw new IllegalStateException(
          s"$path: column '${field.name}' missing (batch schema " +
            s"requires it); present: ${names.sorted.mkString(", ")}"))
        field.dataType match {
          case LongType => col.map {
            case l: Long => l.asInstanceOf[Any]
            case d: Double => d.toLong.asInstanceOf[Any] // int-valued keys
            case v => throw new IllegalStateException(
              s"$path/${field.name}: expected integral, got $v")
          }
          case DoubleType => col.map {
            case d: Double => d.asInstanceOf[Any]
            case l: Long => l.toDouble.asInstanceOf[Any]
            case v => throw new IllegalStateException(
              s"$path/${field.name}: expected numeric, got $v")
          }
          case StringType => col.map(_.asInstanceOf[Any])
          case t => throw new IllegalStateException(
            s"unexpected schema type $t for column ${field.name}")
        }
      }
      (0 until nRows).iterator
        .map(i => Row.fromSeq(out.map(_(i)).toIndexedSeq))
    } finally f.close()
  }
}

object PandasHdfReader {

  val defaultKey = "detprocess_df"

  /** Loud dispatch on the stored pandas layout: only the fixed-format
    * frame is readable here; `format='table'` names the mismatch. */
  private def checkFrame(attrs: Map[String, Any], ctx: String): Unit =
    attrs.get("pandas_type") match {
      case Some("frame") => // the fixed-format frame we support
      case Some("frame_table") | Some("series_table") =>
        throw new UnsupportedOperationException(
          s"$ctx: pandas format='table' (PyTables Table) layout " +
            "is not supported — re-save with format='fixed' or " +
            "convert via the parquet path")
      case other => throw new UnsupportedOperationException(
        s"$ctx: not a pandas fixed-format frame (pandas_type=$other)")
    }

  /** All columns of the frame at `/{key}`: (names in axis0 order,
    * values per column, row count). Numeric blocks come back as
    * Array[Long] / Array[Double] elements; string blocks as String
    * (null for pandas NaN markers). */
  private def readColumns(f: Hdf5File, key: String, path: String)
      : (Seq[String], Seq[Array[Any]], Int) = {
    val attrs = f.attributes(key)
    checkFrame(attrs, s"$path/$key")
    val ndim = attrs.get("ndim").collect { case l: Long => l }.getOrElse(2L)
    require(ndim == 2, s"$path/$key: ndim=$ndim (only 2-D frames)")
    val nblocks = attrs.get("nblocks").collect { case l: Long => l }
      .getOrElse(throw new IllegalStateException(
        s"$path/$key: missing nblocks attribute")).toInt
    val axis0 = f.readStrings(s"$key/axis0").toSeq
    val nRows = f.dataset(s"$key/axis1").dims.head.toInt

    val colValues = scala.collection.mutable.Map.empty[String, Array[Any]]
    for (b <- 0 until nblocks) {
      val items = f.readStrings(s"$key/block${b}_items")
      val vPath = s"$key/block${b}_values"
      val ds = f.dataset(vPath)
      ds.dtype.clazz match {
        case 9 => // pickled numpy object array (string block)
          val payloads = f.readVlenBytes(vPath)
          require(payloads.length == 1,
            s"$path/$vPath: expected a 1-element VLArray, got " +
              s"${payloads.length}")
          val (shape, flat) = PandasPickle.objectNdArray(payloads(0))
          require(shape == Seq(nRows, items.length),
            s"$path/$vPath: pickled shape $shape, expected " +
              s"(${nRows}, ${items.length})")
          items.zipWithIndex.foreach { case (name, j) =>
            colValues(name) = Array.tabulate[Any](nRows)(r =>
              flat(r * items.length + j))
          }
        case 0 | 1 => // numeric block, stored transposed (nrows, nitems)
          val (rDim, cDim) = ds.dims match {
            case Seq(r, c) => (r.toInt, c.toInt)
            case Seq(r) => (r.toInt, 1) // single-column block, rank 1
            case d => throw new IllegalStateException(
              s"$path/$vPath: rank-${d.length} block unsupported")
          }
          // pandas always writes value.T; tolerate an untransposed
          // writer by matching the items dimension
          val transposed =
            if (cDim == items.length && rDim == nRows) true
            else if (rDim == items.length && cDim == nRows) false
            else throw new IllegalStateException(
              s"$path/$vPath: dims (${rDim}, ${cDim}) match neither " +
                s"(rows=$nRows, items=${items.length}) orientation")
          def slice[T](vals: Array[T], j: Int): Array[Any] =
            if (transposed) Array.tabulate[Any](nRows)(r =>
              vals(r * items.length + j))
            else Array.tabulate[Any](nRows)(r =>
              vals(j * nRows + r))
          if (ds.dtype.clazz == 0) {
            val vals = f.readLongs(vPath)
            items.zipWithIndex.foreach { case (name, j) =>
              colValues(name) = slice(vals, j)
            }
          } else {
            val vals = f.readDoubles(vPath)
            items.zipWithIndex.foreach { case (name, j) =>
              colValues(name) = slice(vals, j)
            }
          }
        case c => throw new UnsupportedOperationException(
          s"$path/$vPath: block datatype class $c unsupported " +
            "(numeric and pickled-string blocks only)")
      }
    }
    val missing = axis0.filterNot(colValues.contains)
    require(missing.isEmpty,
      s"$path/$key: axis0 names ${missing.mkString(", ")} not covered " +
        "by any block")
    (axis0, axis0.map(colValues), nRows)
  }

  /** Infer the batch schema from one sample file (same contract as
    * [[VaexHdf5Reader.inferSchema]]): float columns → DoubleType
    * except the semantically-integral curated keys, int → LongType,
    * string blocks → StringType. */
  def inferSchema(
      sampleFile: String, key: String = defaultKey): StructType = {
    val f = new Hdf5File(sampleFile)
    try {
      val attrs = f.attributes(key)
      checkFrame(attrs, s"$sampleFile/$key")
      val nblocks = attrs.get("nblocks").collect { case l: Long => l }
        .getOrElse(0L).toInt
      val axis0 = f.readStrings(s"$key/axis0").toSeq
      val types = scala.collection.mutable.Map.empty[String, DataType]
      for (b <- 0 until nblocks) {
        val items = f.readStrings(s"$key/block${b}_items")
        val t = f.dataset(s"$key/block${b}_values").dtype.clazz match {
          case 9 => StringType
          case 0 => LongType
          case 1 => DoubleType
          case c => throw new UnsupportedOperationException(
            s"$sampleFile/$key/block${b}_values: datatype class $c " +
              "unsupported")
        }
        items.foreach { n =>
          types(n) =
            if (t == DoubleType && VaexHdf5Reader.integralKeyCols(n))
              LongType
            else t
        }
      }
      StructType(axis0.map(n => StructField(n,
        types.getOrElse(n, throw new IllegalStateException(
          s"$sampleFile/$key: '$n' in axis0 but in no block")),
        nullable = types(n) == StringType)))
    } finally f.close()
  }

  /** Reader with the schema inferred from `sampleFile`. */
  def apply(sampleFile: String, key: String = defaultKey): PandasHdfReader =
    new PandasHdfReader(inferSchema(sampleFile, key), key)
}
