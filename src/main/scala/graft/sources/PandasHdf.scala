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

  /** Loud dispatch on the stored pandas layout: fixed-format frames
    * read via the block path, `format='table'` frames via
    * [[readTableColumns]] (r12); anything else names the mismatch. */
  private def checkFrame(attrs: Map[String, Any], ctx: String): Boolean =
    attrs.get("pandas_type") match {
      case Some("frame") => false       // fixed-format block layout
      case Some("frame_table") => true  // PyTables Table layout
      case Some("series_table") =>
        throw new UnsupportedOperationException(
          s"$ctx: pandas series_table layout is not supported — " +
            "only frames read here")
      case other => throw new UnsupportedOperationException(
        s"$ctx: not a pandas frame (pandas_type=$other)")
    }

  /** All columns of the frame at `/{key}`: (names in axis0 order,
    * values per column, row count). Numeric blocks come back as
    * Array[Long] / Array[Double] elements; string blocks as String
    * (null for pandas NaN markers). */
  private def readColumns(f: Hdf5File, key: String, path: String)
      : (Seq[String], Seq[Array[Any]], Int) = {
    val attrs = f.attributes(key)
    if (checkFrame(attrs, s"$path/$key"))
      return readTableColumns(f, key, path)
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

  /** `format='table'` (PyTables Table) layout (r12, closing the r11
    * loud-failure edge): one chunked 1-D COMPOUND dataset `/{key}/
    * table` whose record members are the `index` column (skipped —
    * the reference resets the index on load, exactly as in the fixed
    * path), per-dtype packed blocks `values_block_N` (array-typed
    * members of shape (k,); their pandas column names live in the
    * PICKLED dataset attribute `values_block_N_kind`), and
    * `data_columns` members named directly by column name. Column
    * order comes from the group's pickled `non_index_axes` attribute
    * when present. Pickled attributes decode through the inert
    * [[PandasPickle]] VM — no code execution. */
  private def readTableColumns(f: Hdf5File, key: String, path: String)
      : (Seq[String], Seq[Array[Any]], Int) = {
    val tPath = s"$key/table"
    val ds = f.dataset(tPath)
    require(ds.dtype.clazz == 6,
      s"$path/$tPath: expected a compound record dataset, got class " +
        s"${ds.dtype.clazz}")
    require(ds.dims.size == 1,
      s"$path/$tPath: rank-${ds.dims.size} table dataset")
    val nRows = ds.dims.head.toInt
    val recSize = ds.dtype.size
    val raw = f.readBytes(tPath)
    val members = f.compoundMembers(tPath)

    def memberNames(m: Hdf5File.CompoundMember, k: Int): Seq[String] =
      if (m.name.startsWith("values_block_")) {
        val kindAttr = s"${m.name}_kind"
        val bytes = f.attributeBytes(tPath, kindAttr).getOrElse(
          throw new IllegalStateException(
            s"$path/$tPath: missing pickled '$kindAttr' attribute " +
              "naming the block's pandas columns"))
        val names = PandasPickle.load(bytes) match {
          case l: scala.collection.mutable.ArrayBuffer[_] =>
            l.map(_.asInstanceOf[String]).toSeq
          case v: Vector[_] => v.map(_.asInstanceOf[String])
          case other => throw new IllegalStateException(
            s"$path/$tPath: '$kindAttr' pickled to " +
              s"${other.getClass.getName}, expected a name list")
        }
        require(names.length == k,
          s"$path/$tPath: '$kindAttr' names ${names.length} columns, " +
            s"member holds $k")
        names
      } else {
        require(k == 1, s"$path/$tPath: data column '${m.name}' with " +
          s"$k elements per record")
        Seq(m.name)
      }

    val colValues =
      scala.collection.mutable.LinkedHashMap.empty[String, Array[Any]]
    members.foreach { m =>
      if (m.name != "index") {
        val k = if (m.dims.isEmpty) 1 else m.dims.product
        val order =
          if (m.dtype.bigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val bb = java.nio.ByteBuffer.wrap(raw).order(order)
        val names = memberNames(m, k)
        val es = m.dtype.size
        names.zipWithIndex.foreach { case (name, j) =>
          val col: Array[Any] = m.dtype.clazz match {
            case 0 => Array.tabulate[Any](nRows) { r =>
              val at = r * recSize + m.offset + es * j
              es match {
                case 8 => bb.getLong(at)
                case 4 => if (m.dtype.signed) bb.getInt(at).toLong
                          else bb.getInt(at) & 0xFFFFFFFFL
                case 2 => if (m.dtype.signed) bb.getShort(at).toLong
                          else (bb.getShort(at) & 0xFFFF).toLong
                case 1 => if (m.dtype.signed) raw(at).toLong
                          else (raw(at) & 0xFF).toLong
                case s => throw new UnsupportedOperationException(
                  s"$path/$tPath/${m.name}: $s-byte integers")
              }
            }
            case 1 => Array.tabulate[Any](nRows) { r =>
              val at = r * recSize + m.offset + es * j
              if (es == 8) bb.getDouble(at) else bb.getFloat(at).toDouble
            }
            case 3 => Array.tabulate[Any](nRows) { r =>
              val at = r * recSize + m.offset + es * j
              // pandas/PyTables pad fixed strings with NULs ONLY: trim
              // NUL padding, never spaces — a value with genuine
              // trailing spaces must read back unaltered, and an
              // all-space string is a value, not null (ADVICE r12,
              // matching pd.read_hdf)
              var end = es
              while (end > 0 && raw(at + end - 1) == 0) end -= 1
              if (end == 0) null
              else new String(raw, at, end, "UTF-8")
            }
            case c => throw new UnsupportedOperationException(
              s"$path/$tPath/${m.name}: member datatype class $c " +
                "unsupported (int, float, fixed string)")
          }
          colValues(name) = col
        }
      }
    }

    // pandas column order from the group's pickled non_index_axes =
    // [(0, [names...])]; discovery order when the attribute is absent
    val order: Seq[String] = f.attributeBytes(key, "non_index_axes")
      .flatMap { bytes =>
        PandasPickle.load(bytes) match {
          case l: scala.collection.mutable.ArrayBuffer[_] =>
            l.headOption.collect {
              case Vector(_, names: scala.collection.mutable.ArrayBuffer[_])
                => names.map(_.asInstanceOf[String]).toSeq
              case Vector(_, names: Vector[_]) =>
                names.map(_.asInstanceOf[String])
            }
          case _ => None
        }
      }
      .getOrElse(colValues.keys.toSeq)
    val missing = order.filterNot(colValues.contains)
    require(missing.isEmpty,
      s"$path/$key: non_index_axes names ${missing.mkString(", ")} " +
        "not present in any table member")
    (order, order.map(colValues), nRows)
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
      if (checkFrame(attrs, s"$sampleFile/$key")) {
        // table layout: derive (name, type) from the record members +
        // pickled kinds; reuse the full read for the NAME → column
        // mapping (sample files are small by the reader contract)
        val (names, cols, _) = readTableColumns(f, key, sampleFile)
        val types = names.zip(cols).map { case (n, col) =>
          val t: DataType = col.find(_ != null) match {
            case Some(_: Long) => LongType
            case Some(_: Double) =>
              if (VaexHdf5Reader.integralKeyCols(n)) LongType
              else DoubleType
            case Some(_: String) => StringType
            case Some(v) => throw new IllegalStateException(
              s"$sampleFile/$key/$n: unexpected value class " +
                v.getClass.getName)
            case None => StringType // all-null column
          }
          StructField(n, t, nullable = t == StringType)
        }
        return StructType(types)
      }
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
