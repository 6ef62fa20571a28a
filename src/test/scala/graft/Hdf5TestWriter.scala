package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** Test-only classic-HDF5 writer: emits a superblock-v0 file with one
  * root symbol-table group of rank-1/rank-2 numeric datasets —
  * contiguous or chunked with optional shuffle+deflate filters — purely
  * from the public format spec. Exists to prove [[graft.sources.Hdf5File]]
  * against files THIS code did not parse-then-reprint (the round-trip
  * catches format misunderstandings on both sides independently of the
  * vaex fixture). */
object Hdf5TestWriter {

  sealed trait Col { def name: String }
  final case class LongCol(name: String, values: Array[Long],
      chunk: Int = 0, deflate: Boolean = false, shuffle: Boolean = false,
      bigEndian: Boolean = false)
    extends Col
  final case class DoubleCol(name: String, values: Array[Double],
      chunk: Int = 0, deflate: Boolean = false, shuffle: Boolean = false,
      bigEndian: Boolean = false)
    extends Col
  /** rank-2 double matrix, chunked (rows × cols chunks). */
  final case class Double2Col(name: String, values: Array[Array[Double]],
      chunkRows: Int, chunkCols: Int, deflate: Boolean = false)
    extends Col
  /** rank-2 int16 matrix, contiguous — the pytesdaq raw-event shape
    * (nb_channels × nb_samples ADC counts). */
  final case class Short2Col(name: String, values: Array[Array[Short]])
    extends Col
  /** variable-length strings (h5py's default `str` dataset layout):
    * payloads in a global heap collection, dataset data = 16-byte
    * (len, GCOL addr, index) descriptors. */
  final case class VlenStrCol(name: String, values: Array[String])
    extends Col
  /** variable-length SEQUENCES of uint8 (the PyTables `VLArray`
    * layout pandas fixed-format object blocks use for pickled
    * payloads): same heap machinery as vlen strings, vlen-sequence
    * datatype with a 1-byte unsigned base. */
  final case class VlenBytesCol(name: String, values: Array[Array[Byte]])
    extends Col
  /** rank-1 FIXED-length strings (NUL-padded, width bytes) — the
    * pandas fixed-format axis0/block_items shape (numpy S dtype). */
  final case class FixedStrCol(name: String, values: Array[String],
      width: Int)
    extends Col
  /** rank-2 int64 matrix, contiguous — the pandas fixed-format
    * integer block shape (stored transposed: nrows × nitems). */
  final case class Long2Col(name: String, values: Array[Array[Long]])
    extends Col
  /** rank-1 dataset of RAW fixed-size records with an EXPLICIT
    * datatype message body — the PyTables Table (compound) shape;
    * the caller frames the compound message (see [[dtCompoundBody]])
    * and packs the record bytes. */
  final case class RawRecordsCol(name: String, dtBody: Array[Byte],
      recSize: Int, bytes: Array[Byte], n: Int,
      chunk: Int = 0, deflate: Boolean = false, shuffle: Boolean = false)
    extends Col

  /** Attribute values (v1 attribute messages on any node). */
  sealed trait Attr
  final case class ALong(v: Long) extends Attr
  final case class ADouble(v: Double) extends Attr
  final case class AStr(v: String) extends Attr // fixed-length, NUL-padded
  final case class ALongs(v: Array[Long]) extends Attr
  final case class ADoubles(v: Array[Double]) extends Attr
  final case class AStrs(v: Array[String]) extends Attr
  /** RAW bytes as a scalar fixed-length string attr — the PyTables
    * pickled-object attribute shape (interior NULs preserved). */
  final case class ABytes(v: Array[Byte]) extends Attr

  private val UNDEF = -1L

  /** Group-tree node: either a dataset leaf or a nested group. */
  sealed trait Node
  final case class DatasetNode(col: Col,
      attrs: Seq[(String, Attr)] = Nil) extends Node
  final case class GroupNode(children: Map[String, Node],
      attrs: Seq[(String, Attr)] = Nil) extends Node
  /** v2-writer group with DENSE storage: links in a fractal heap behind
    * a name-index v2 B-tree (what h5py emits past max_compact or with
    * `track_order=True`); `denseAttrs` routes the attributes through
    * the same machinery (h5py: > 8 attributes). `btNodeSize` shrinks
    * the B-tree node to force a depth-1 tree at test scale. */
  final case class DenseGroupNode(children: Map[String, Node],
      attrs: Seq[(String, Attr)] = Nil,
      denseAttrs: Boolean = false,
      btNodeSize: Int = 512) extends Node
  /** Raw header messages, v2 writer only — for negative tests that
    * need message types the writer does not model (e.g. a dense
    * Attribute Info message). */
  final case class RawV2Node(msgs: Seq[(Int, Array[Byte])]) extends Node

  /** Flat form: all datasets in the root group. */
  def write(path: String, cols: Seq[Col]): Unit =
    writeTree(path, GroupNode(
      cols.map(c => c.name -> (DatasetNode(c): Node)).toMap))

  /** The vaex column layout the reference's feature files use:
    * `/table/columns/<name>/data` (numeric columns only — what the
    * synthetic fixtures need). `units` attaches a `unit` string
    * attribute to the named column groups. */
  def writeVaex(path: String, cols: Seq[Col],
      units: Map[String, String] = Map.empty): Unit =
    writeTree(path, GroupNode(Map("table" -> GroupNode(Map(
      "columns" -> GroupNode(cols.map(c =>
        c.name -> (GroupNode(Map("data" -> DatasetNode(c)),
          units.get(c.name).map(u => "unit" -> (AStr(u): Attr)).toSeq)
          : Node)).toMap))))))

  /** Write an arbitrary group tree (classic v0 layout). */
  def writeTree(path: String, root: GroupNode): Unit = {
    val buf = new GrowBuf
    // ---- superblock v0 + root symbol table entry (patched later)
    buf.bytes(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
      0x1A.toByte, '\n'))
    buf.bytes(Array[Byte](0, 0, 0, 0, 0, 8, 8, 0)) // versions, sizes
    buf.u16(4); buf.u16(16) // group leaf / internal k
    buf.u32(0) // consistency flags
    buf.u64(0) // base address
    buf.u64(UNDEF) // free-space address
    val eofPatch = buf.pos; buf.u64(0) // EOF, patched at the end
    buf.u64(UNDEF) // driver info
    // root STE
    buf.u64(0) // link name offset
    val rootOhdrPatch = buf.pos; buf.u64(0)
    buf.u32(0); buf.u32(0) // cache type, reserved
    buf.zeros(16) // scratch

    val rootOhdr = writeNode(buf, root)
    buf.patchU64(rootOhdrPatch, rootOhdr)
    buf.patchU64(eofPatch, buf.pos)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.toArray)
  }

  /** Bottom-up: children first, then this node's header; returns the
    * node's object-header address. */
  private def writeNode(buf: GrowBuf, node: Node): Long = node match {
    case RawV2Node(_) =>
      throw new IllegalArgumentException("RawV2Node is v2-writer-only")
    case _: DenseGroupNode =>
      throw new IllegalArgumentException("DenseGroupNode is v2-writer-only")
    case DatasetNode(c, attrs) => writeDataset(buf, c, attrs)
    case GroupNode(children, attrs) =>
      val sorted = children.toSeq.sortBy(_._1)
      val childAddr = sorted.map { case (n, ch) => n -> writeNode(buf, ch) }

      // ---- local heap with the child names
      val heapData = new ByteArrayOutputStream()
      heapData.write(0); heapData.write(new Array[Byte](7)) // offset 0 = ""
      val nameOff = childAddr.map { case (n, _) =>
        val off = heapData.size()
        heapData.write(n.getBytes("UTF-8")); heapData.write(0)
        while (heapData.size() % 8 != 0) heapData.write(0)
        n -> off.toLong
      }.toMap
      val heapAddr = buf.pos
      buf.bytes("HEAP".getBytes("ASCII")); buf.u32(0) // version + reserved
      buf.u64(heapData.size().toLong)
      buf.u64(UNDEF) // free list: none
      buf.u64(buf.pos + 8)
      buf.bytes(heapData.toByteArray)

      // ---- SNOD with all entries (names sorted — B-tree key order)
      val snodAddr = buf.pos
      buf.bytes("SNOD".getBytes("ASCII"))
      buf.u16(1) // version + reserved byte (LE: ver=1, r=0)
      buf.u16(childAddr.size)
      childAddr.foreach { case (n, a) =>
        buf.u64(nameOff(n)); buf.u64(a)
        buf.u32(0); buf.u32(0); buf.zeros(16)
      }

      // ---- group B-tree: one leaf pointing at the SNOD (or none for
      // an empty group — attribute-only nodes)
      val btreeAddr = buf.pos
      buf.bytes("TREE".getBytes("ASCII"))
      buf.u8(0); buf.u8(0) // node type 0, level 0
      buf.u16(if (childAddr.isEmpty) 0 else 1)
      buf.u64(UNDEF); buf.u64(UNDEF) // siblings
      if (childAddr.nonEmpty) {
        buf.u64(nameOff(childAddr.head._1)) // key 0
        buf.u64(snodAddr) // child 0
        buf.u64(nameOff(childAddr.last._1)) // key 1
      }

      // ---- group object header (symbol table message + attributes)
      val stBody = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      stBody.putLong(btreeAddr); stBody.putLong(heapAddr)
      writeHeader(buf,
        (0x11, stBody.array()) +: attrs.map { case (n, a) => attrMsg(n, a) })
  }

  /** v1 object header around `msgs`; returns its address. */
  private def writeHeader(
      buf: GrowBuf, msgs: Seq[(Int, Array[Byte])]): Long = {
    val bodySize = msgs.map(m => 8 + pad8(m._2.length)).sum
    val addr = buf.pos
    buf.u8(1); buf.u8(0); buf.u16(msgs.size)
    buf.u32(1); buf.u32(bodySize); buf.u32(0)
    msgs.foreach { case (t, b) =>
      buf.u16(t); buf.u16(pad8(b.length)); buf.u32(0)
      buf.bytes(b); buf.zeros(pad8(b.length) - b.length)
    }
    addr
  }

  // ---------------------------------------------------------- attributes

  private def dtIntBody(size: Int, be: Boolean = false): Array[Byte] = {
    val bb = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    // class 0 v1; bit field: bit3 signed, bit0 byte order
    bb.put(0x10.toByte); bb.put((0x08 | (if (be) 1 else 0)).toByte)
    bb.put(0.toByte); bb.put(0.toByte)
    bb.putInt(size)
    bb.putShort(0); bb.putShort((size * 8).toShort)
    bb.array()
  }

  private def dtF64Body(be: Boolean = false): Array[Byte] = {
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x11.toByte)
    bb.put((0x20 | (if (be) 1 else 0)).toByte)
    bb.put(0x3F.toByte); bb.put(0.toByte)
    bb.putInt(8)
    bb.putShort(0); bb.putShort(64)
    bb.put(52.toByte); bb.put(11.toByte)
    bb.put(0.toByte); bb.put(52.toByte)
    bb.putInt(1023)
    bb.array()
  }

  private def dtStrBody(width: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x13.toByte) // class 3 (string) v1
    bb.put(0.toByte) // NUL-terminated padding
    bb.put(0.toByte); bb.put(0.toByte)
    bb.putInt(width)
    bb.array()
  }

  private def dtVlenStrBody: Array[Byte] = {
    // class 9 v1; bit field low nibble 1 = vlen STRING; element size =
    // the 16-byte heap descriptor; base type (ascii char) appended
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x19.toByte); bb.put(0x01.toByte)
    bb.put(0.toByte); bb.put(0.toByte)
    bb.putInt(16)
    bb.put(0x13.toByte); bb.put(0.toByte) // base: class-3 string v1
    bb.put(0.toByte); bb.put(0.toByte)
    bb.putInt(1)
    bb.array()
  }

  /** class-9 vlen SEQUENCE of uint8 (bit-field low nibble 0), the
    * PyTables VLArray element type. */
  private def dtVlenBytesBody: Array[Byte] = {
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x19.toByte); bb.put(0x00.toByte) // v1 class 9, sequence
    bb.put(0.toByte); bb.put(0.toByte)
    bb.putInt(16)
    bb.put(0x10.toByte); bb.put(0.toByte) // base: class-0 int v1
    bb.put(0.toByte); bb.put(0.toByte) // unsigned LE
    bb.putInt(1) // 1 byte
    bb.array()
  }

  // ------------------------------------------ compound (PyTables Table)

  /** Public scalar datatype bodies for compound members. */
  def memberInt64: Array[Byte] = dtIntBody(8)
  def memberFloat64: Array[Byte] = dtF64Body()
  def memberString(width: Int): Array[Byte] = dtStrBody(width)

  /** class-10 ARRAY datatype body over `base`, version 2 (rank +
    * 3 reserved + dims + per-dim permutation slots) or 3 (rank +
    * dims). */
  def dtArrayBody(ver: Int, dims: Seq[Int], base: Array[Byte])
      : Array[Byte] = {
    require(ver == 2 || ver == 3, s"array datatype v$ver")
    val elems = dims.product
    val baseSize = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
      .getInt(4)
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.put(((ver << 4) | 10).toByte)
    head.put(0.toByte); head.put(0.toByte); head.put(0.toByte)
    head.putInt(elems * baseSize)
    val out = new GrowBuf
    out.bytes(head.array())
    out.u8(dims.length)
    if (ver == 2) out.zeros(3)
    dims.foreach(d => out.u32(d))
    if (ver == 2) dims.foreach(_ => out.u32(0)) // permutation slots
    out.bytes(base)
    out.toArray
  }

  /** Compound (class 6) datatype message body. Members:
    * (name, byte offset, inline dims — v1 only, scalar base body).
    * v1 encodes dims inline (rank + reserved + permutation + four
    * 4-byte sizes); v2 members must pre-wrap arrays via
    * [[dtArrayBody]]; v3 additionally drops name padding and
    * shrinks the offset field to the minimal byte count. */
  def dtCompoundBody(ver: Int, recSize: Int,
      members: Seq[(String, Int, Seq[Int], Array[Byte])]): Array[Byte] = {
    require(ver >= 1 && ver <= 3, s"compound v$ver")
    val out = new GrowBuf
    out.u8((ver << 4) | 6)
    out.u8(members.length & 0xFF); out.u8((members.length >> 8) & 0xFF)
    out.u8(0)
    out.u32(recSize)
    val offBytes =
      if (recSize < 256) 1
      else if (recSize < 65536) 2
      else if (recSize < (1 << 24)) 3
      else 4
    members.foreach { case (name, off, dims, base) =>
      val nb = name.getBytes("UTF-8") :+ 0.toByte
      out.bytes(nb)
      if (ver <= 2) out.zeros(pad8(nb.length) - nb.length)
      if (ver <= 2) out.u32(off)
      else (0 until offBytes).foreach(i => out.u8((off >> (8 * i)) & 0xFF))
      if (ver == 1) {
        out.u8(dims.length) // dimensionality
        out.zeros(3)
        out.u32(0) // dimension permutation
        out.u32(0) // reserved
        (0 until 4).foreach(i =>
          out.u32(if (i < dims.length) dims(i) else 0))
      } else require(dims.isEmpty,
        "v2/v3 members express dims via dtArrayBody")
      out.bytes(base)
    }
    out.toArray
  }

  /** Global heap collection ("GCOL") holding every string payload;
    * object index i+1 = values(i). Returns the collection address. */
  private def writeGcol(buf: GrowBuf, vs: Array[String]): Long =
    writeGcolBytes(buf, vs.map(_.getBytes("UTF-8")))

  private def writeGcolBytes(
      buf: GrowBuf, payloads: Array[Array[Byte]]): Long = {
    val addr = buf.pos
    val total = 16 + payloads.map(p => 16 + pad8(p.length)).sum
    buf.bytes("GCOL".getBytes("US-ASCII"))
    buf.u8(1); buf.zeros(3)
    buf.u64(total.toLong)
    payloads.zipWithIndex.foreach { case (p, i) =>
      buf.u16(i + 1); buf.u16(1); buf.u32(0)
      buf.u64(p.length.toLong)
      buf.bytes(p); buf.zeros(pad8(p.length) - p.length)
    }
    addr
  }

  private def dsBody(dims: Seq[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + dims.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.put(dims.length.toByte); bb.put(0.toByte)
    bb.position(8)
    dims.foreach(bb.putLong)
    bb.array()
  }

  private def fixedStrBytes(vs: Array[String], width: Int): Array[Byte] = {
    val out = new Array[Byte](vs.length * width)
    vs.zipWithIndex.foreach { case (s, i) =>
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, out, i * width, b.length)
    }
    out
  }

  /** v1 attribute message (type 0x0C). */
  private def attrMsg(name: String, a: Attr): (Int, Array[Byte]) = {
    val (dt, ds, data) = a match {
      case ALong(v) =>
        val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        d.putLong(v)
        (dtIntBody(8), dsBody(Nil), d.array())
      case ADouble(v) =>
        val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        d.putDouble(v)
        (dtF64Body(), dsBody(Nil), d.array())
      case AStr(v) =>
        val w = v.getBytes("UTF-8").length + 1
        (dtStrBody(w), dsBody(Nil), fixedStrBytes(Array(v), w))
      case ALongs(v) =>
        val d = ByteBuffer.allocate(v.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(d.putLong)
        (dtIntBody(8), dsBody(Seq(v.length.toLong)), d.array())
      case ADoubles(v) =>
        val d = ByteBuffer.allocate(v.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(d.putDouble)
        (dtF64Body(), dsBody(Seq(v.length.toLong)), d.array())
      case AStrs(v) =>
        val w = v.map(_.getBytes("UTF-8").length).max + 1
        (dtStrBody(w), dsBody(Seq(v.length.toLong)), fixedStrBytes(v, w))
      case ABytes(v) =>
        (dtStrBody(v.length), dsBody(Nil), v)
    }
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val out = new GrowBuf
    out.u8(1); out.u8(0) // v1 + reserved
    out.u16(nameB.length); out.u16(dt.length); out.u16(ds.length)
    out.bytes(nameB); out.zeros(pad8(nameB.length) - nameB.length)
    out.bytes(dt); out.zeros(pad8(dt.length) - dt.length)
    out.bytes(ds); out.zeros(pad8(ds.length) - ds.length)
    out.bytes(data)
    (0x0C, out.toArray)
  }

  // ------------------------------------------------------------ datasets

  private def writeDataset(
      buf: GrowBuf, c: Col, attrs: Seq[(String, Attr)] = Nil): Long =
    writeHeader(buf, datasetMsgs(buf, c, attrs))

  /** Write the dataset's data and return its header messages (shared
    * by the v1 and v2 header emitters). */
  private def datasetMsgs(
      buf: GrowBuf, c: Col, attrs: Seq[(String, Attr)])
      : Seq[(Int, Array[Byte])] = {
    val (dims, elemSize, isFloat, bytes, chunkDims, deflate, shuffle) =
      c match {
        case LongCol(_, v, ch, df, sh, be) =>
          val bb = ByteBuffer.allocate(v.length * 8)
            .order(if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
          v.foreach(bb.putLong)
          (Seq(v.length.toLong), 8, false, bb.array(),
            if (ch > 0) Seq(ch, 8) else Nil, df, sh)
        case DoubleCol(_, v, ch, df, sh, be) =>
          val bb = ByteBuffer.allocate(v.length * 8)
            .order(if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
          v.foreach(bb.putDouble)
          (Seq(v.length.toLong), 8, true, bb.array(),
            if (ch > 0) Seq(ch, 8) else Nil, df, sh)
        case Double2Col(_, v, cr, cc, df) =>
          val rows = v.length; val colsN = v(0).length
          val bb = ByteBuffer.allocate(rows * colsN * 8)
            .order(ByteOrder.LITTLE_ENDIAN)
          v.foreach(_.foreach(bb.putDouble))
          (Seq(rows.toLong, colsN.toLong), 8, true, bb.array(),
            Seq(cr, cc, 8), df, false)
        case Short2Col(_, v) =>
          val rows = v.length; val colsN = v(0).length
          val bb = ByteBuffer.allocate(rows * colsN * 2)
            .order(ByteOrder.LITTLE_ENDIAN)
          v.foreach(_.foreach(bb.putShort))
          (Seq(rows.toLong, colsN.toLong), 2, false, bb.array(),
            Nil, false, false)
        case VlenStrCol(_, v) =>
          val gaddr = writeGcol(buf, v)
          val bb = ByteBuffer.allocate(v.length * 16)
            .order(ByteOrder.LITTLE_ENDIAN)
          v.zipWithIndex.foreach { case (str, i) =>
            bb.putInt(str.getBytes("UTF-8").length)
            bb.putLong(gaddr)
            bb.putInt(i + 1)
          }
          (Seq(v.length.toLong), 16, false, bb.array(), Nil, false, false)
        case VlenBytesCol(_, v) =>
          val gaddr = writeGcolBytes(buf, v)
          val bb = ByteBuffer.allocate(v.length * 16)
            .order(ByteOrder.LITTLE_ENDIAN)
          v.zipWithIndex.foreach { case (payload, i) =>
            bb.putInt(payload.length) // base elements = bytes (uint8)
            bb.putLong(gaddr)
            bb.putInt(i + 1)
          }
          (Seq(v.length.toLong), 16, false, bb.array(), Nil, false, false)
        case FixedStrCol(_, v, w) =>
          (Seq(v.length.toLong), w, false, fixedStrBytes(v, w),
            Nil, false, false)
        case Long2Col(_, v) =>
          val rows = v.length; val colsN = v(0).length
          val bb = ByteBuffer.allocate(rows * colsN * 8)
            .order(ByteOrder.LITTLE_ENDIAN)
          v.foreach(_.foreach(bb.putLong))
          (Seq(rows.toLong, colsN.toLong), 8, false, bb.array(),
            Nil, false, false)
        case RawRecordsCol(_, _, recSize, bytes, n, ch, df, sh) =>
          (Seq(n.toLong), recSize, false, bytes,
            if (ch > 0) Seq(ch, recSize) else Nil, df, sh)
      }

    // data (chunked or contiguous) goes first; the object header points back
    var layoutBody: Array[Byte] = null
    if (chunkDims.isEmpty) {
      val addr = buf.pos
      buf.bytes(bytes)
      val lb = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      lb.put(3.toByte); lb.put(1.toByte) // v3 contiguous
      lb.putLong(addr); lb.putLong(bytes.length.toLong)
      layoutBody = lb.array()
    } else {
      val dataDims = dims.map(_.toInt).toArray
      val cd = chunkDims.dropRight(1).toArray // chunk dims (elements)
      // enumerate chunks in row-major order of chunk grid
      val grid = dataDims.indices.map(i =>
        (dataDims(i) + cd(i) - 1) / cd(i)).toArray
      val nChunks = grid.product
      val chunkAddrs = new Array[(Array[Long], Long, Int)](nChunks)
      var ci = 0
      val idx = new Array[Int](grid.length)
      while (ci < nChunks) {
        val offsets = idx.indices.map(i => idx(i).toLong * cd(i)).toArray
        // gather the chunk (zero-padded at edges), row-major in chunk
        val chunkElems = cd.product
        val chunk = new Array[Byte](chunkElems * elemSize)
        val inner = new Array[Int](cd.length)
        var row = 0
        val nRuns = cd.dropRight(1).product // runs of the innermost dim
        while (row < math.max(nRuns, 1)) {
          // compute source offset for this run
          var srcElem = 0L
          var ok = true
          var j = 0
          var rem = row
          var stride = 1L
          val outerCounts = new Array[Int](cd.length - 1)
          var rr = row
          var k = cd.length - 2
          while (k >= 0) { outerCounts(k) = rr % cd(k); rr /= cd(k); k -= 1 }
          j = 0
          stride = 1L
          val strides = new Array[Long](dataDims.length)
          strides(dataDims.length - 1) = 1
          k = dataDims.length - 2
          while (k >= 0) {
            strides(k) = strides(k + 1) * dataDims(k + 1); k -= 1
          }
          j = 0
          while (j < cd.length - 1) {
            val pos = offsets(j) + outerCounts(j)
            if (pos >= dataDims(j)) ok = false
            srcElem += pos * strides(j)
            j += 1
          }
          srcElem += offsets(cd.length - 1)
          val copy = math.max(0L, math.min(cd.last.toLong,
            dataDims.last - offsets(cd.length - 1))).toInt
          if (ok && copy > 0)
            System.arraycopy(bytes, (srcElem * elemSize).toInt,
              chunk, row * cd.last * elemSize, copy * elemSize)
          row += 1
        }
        var payload = chunk
        if (shuffle) payload = doShuffle(payload, elemSize)
        if (deflate) payload = doDeflate(payload)
        val addr = buf.pos
        buf.bytes(payload)
        chunkAddrs(ci) = (offsets :+ 0L, addr, payload.length)
        // odometer over grid
        var g = grid.length - 1
        var carried = true
        while (g >= 0 && carried) {
          idx(g) += 1
          if (idx(g) < grid(g)) carried = false else { idx(g) = 0; g -= 1 }
        }
        ci += 1
      }
      // chunk B-tree leaf
      val btAddr = buf.pos
      buf.bytes("TREE".getBytes("ASCII"))
      buf.u8(1); buf.u8(0)
      buf.u16(nChunks)
      buf.u64(UNDEF); buf.u64(UNDEF)
      chunkAddrs.foreach { case (offs, addr, sz) =>
        buf.u32(sz); buf.u32(0) // chunk size, filter mask
        offs.foreach(buf.u64)
        buf.u64(addr)
      }
      // final key: the would-be next chunk = dataset dims
      buf.u32(0); buf.u32(0)
      dims.foreach(buf.u64); buf.u64(0L)

      val lb = ByteBuffer.allocate(3 + 8 + 4 * chunkDims.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      lb.put(3.toByte); lb.put(2.toByte) // v3 chunked
      lb.put(chunkDims.length.toByte)
      lb.putLong(btAddr)
      chunkDims.foreach(lb.putInt)
      layoutBody = lb.array()
    }

    // ---- object header v1
    val msgs = Seq.newBuilder[(Int, Array[Byte])]
    val spaceBody = ByteBuffer.allocate(8 + dims.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    spaceBody.put(1.toByte); spaceBody.put(dims.length.toByte)
    spaceBody.put(0.toByte); spaceBody.position(8)
    dims.foreach(spaceBody.putLong)
    msgs += ((0x01, spaceBody.array()))

    val be = c match {
      case lc: LongCol => lc.bigEndian
      case dc: DoubleCol => dc.bigEndian
      case _ => false
    }
    msgs += ((0x03, c match {
      case _: VlenStrCol => dtVlenStrBody
      case _: VlenBytesCol => dtVlenBytesBody
      case fc: FixedStrCol => dtStrBody(fc.width)
      case rc: RawRecordsCol => rc.dtBody
      case _ if isFloat => dtF64Body(be)
      case _ => dtIntBody(elemSize, be)
    }))

    if (deflate || shuffle) {
      val nf = (if (shuffle) 1 else 0) + (if (deflate) 1 else 0)
      val fb = new GrowBuf
      fb.u8(1); fb.u8(nf); fb.u16(0); fb.u32(0) // v1 + reserved
      if (shuffle) { // runs FIRST on write
        fb.u16(2); fb.u16(0); fb.u16(0); fb.u16(1)
        fb.u32(elemSize); fb.u32(0) // odd client count → pad 4
      }
      if (deflate) {
        fb.u16(1); fb.u16(0); fb.u16(0); fb.u16(1)
        fb.u32(6); fb.u32(0)
      }
      msgs += ((0x0B, fb.toArray))
    }
    msgs += ((0x08, layoutBody))
    attrs.foreach { case (n, a) => msgs += attrMsg(n, a) }
    msgs.result()
  }

  // ---------------------------------------------- v2 ("OHDR") variant

  /** Write the tree with superblock v3 + v2 object headers + new-style
    * link-message groups — the h5py `libver='latest'` shape, exercising
    * the reader's OHDR/link path against files this code did not
    * parse-then-reprint. */
  def writeTreeV2(path: String, root: GroupNode): Unit = {
    val buf = new GrowBuf
    buf.bytes(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
      0x1A.toByte, '\n'))
    buf.u8(3); buf.u8(8); buf.u8(8); buf.u8(0) // v3, sizes, flags
    buf.u64(0) // base address
    buf.u64(UNDEF) // superblock extension
    val eofPatch = buf.pos; buf.u64(0)
    val rootPatch = buf.pos; buf.u64(0)
    buf.u32(0) // superblock checksum (reader does not validate)
    val rootAddr = writeNodeV2(buf, root)
    buf.patchU64(rootPatch, rootAddr)
    buf.patchU64(eofPatch, buf.pos)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.toArray)
  }

  private def linkBody(name: String, addr: Long): Array[Byte] = {
    val nb = name.getBytes("UTF-8")
    val mb = ByteBuffer.allocate(3 + nb.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    mb.put(1.toByte) // link message v1
    mb.put(0.toByte) // flags: 1-byte name length, hard link
    mb.put(nb.length.toByte)
    mb.put(nb)
    mb.putLong(addr)
    mb.array()
  }

  private def writeNodeV2(buf: GrowBuf, node: Node): Long = node match {
    case RawV2Node(msgs) => writeHeaderV2(buf, msgs)
    case DatasetNode(c, attrs) =>
      writeHeaderV2(buf, datasetMsgs(buf, c, attrs))
    case GroupNode(children, attrs) =>
      val childAddr = children.toSeq.sortBy(_._1)
        .map { case (n, ch) => n -> writeNodeV2(buf, ch) }
      val links = childAddr.map { case (n, a) => (0x06, linkBody(n, a)) }
      // Link Info (0x02) with undefined fractal heap = compact links,
      // as h5py emits for every new-style group — an EMPTY group is
      // recognizable as a group by this message alone
      val linkInfo = {
        val mb = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        mb.put(0.toByte); mb.put(0.toByte)
        mb.putLong(UNDEF); mb.putLong(UNDEF)
        (0x02, mb.array())
      }
      writeHeaderV2(buf,
        (linkInfo +: links) ++ attrs.map { case (n, a) => attrMsg(n, a) })
    case DenseGroupNode(children, attrs, denseAttrs, btNodeSize) =>
      val childAddr = children.toSeq.sortBy(_._1)
        .map { case (n, ch) => n -> writeNodeV2(buf, ch) }
      // links live in a fractal heap, indexed by a name v2 B-tree
      // (record type 5: lookup3 name hash + heap ID) — the layout h5py
      // emits for > max_compact links or track_order=True
      val (heapAddr, ids) = writeFractalHeap(buf,
        childAddr.map { case (n, a) => linkBody(n, a) })
      val recs = childAddr.zip(ids).map { case ((n, _), id) =>
        val h = lookup3(n.getBytes("UTF-8"))
        val r = ByteBuffer.allocate(4 + id.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        r.putInt(h); r.put(id)
        (h.toLong & 0xFFFFFFFFL, n, r.array())
      }.sortBy(t => (t._1, t._2)).map(_._3)
      val btAddr = writeV2Btree(buf, recs, recType = 5, btNodeSize)
      val linkInfo = {
        val mb = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        mb.put(0.toByte); mb.put(0.toByte)
        mb.putLong(heapAddr); mb.putLong(btAddr)
        (0x02, mb.array())
      }
      val attrMsgs: Seq[(Int, Array[Byte])] =
        if (!denseAttrs) attrs.map { case (n, a) => attrMsg(n, a) }
        else {
          // dense attributes: attribute-message bodies in their own
          // fractal heap; name index records (type 8) carry an 8-byte
          // heap-ID field (the heap's 7-byte IDs zero-padded), message
          // flags, creation order, and the lookup3 name hash
          val bodies = attrs.map { case (n, a) => n -> attrMsg(n, a)._2 }
          val (aHeap, aIds) = writeFractalHeap(buf, bodies.map(_._2))
          val arecs = bodies.zip(aIds).map { case ((n, _), id) =>
            val h = lookup3(n.getBytes("UTF-8"))
            val r = ByteBuffer.allocate(17).order(ByteOrder.LITTLE_ENDIAN)
            r.put(id); r.put(new Array[Byte](8 - id.length))
            r.put(0.toByte) // message flags
            r.putInt(0) // creation order
            r.putInt(h)
            (h.toLong & 0xFFFFFFFFL, n, r.array())
          }.sortBy(t => (t._1, t._2)).map(_._3)
          val aBt = writeV2Btree(buf, arecs, recType = 8, btNodeSize)
          val mb = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
          mb.put(0.toByte); mb.put(0.toByte)
          mb.putLong(aHeap); mb.putLong(aBt)
          Seq((0x15, mb.array()))
        }
      writeHeaderV2(buf, linkInfo +: attrMsgs)
  }

  /** Fractal heap with ONE root direct block (plenty for link/attribute
    * messages at test scale): FRHP header + FHDB block; heap IDs are
    * 7 bytes (managed flags, 4-byte offset into heap space — which
    * includes the block header — and 2-byte length). Returns the heap
    * header address and one ID per object. */
  private def writeFractalHeap(
      buf: GrowBuf, objects: Seq[Array[Byte]]): (Long, Seq[Array[Byte]]) = {
    val dbHdr = 4 + 1 + 8 + 4 // sig, version, heap addr, 4-byte offset
    val need = dbHdr + objects.map(_.length).sum
    var blockSize = 512L
    while (blockSize < need) blockSize <<= 1
    require(blockSize <= 32768,
      "test fractal heap: too many objects for one direct block")
    val heapAddr = buf.pos
    buf.bytes("FRHP".getBytes("ASCII"))
    buf.u8(0) // version
    buf.u16(7) // heap ID length
    buf.u16(0) // I/O filter encoded length
    buf.u8(0) // flags (no checksummed blocks)
    buf.u32(4096) // max managed object size
    buf.u64(0) // next huge id
    buf.u64(UNDEF) // huge v2 btree
    buf.u64(0) // free space
    buf.u64(UNDEF) // free-space manager
    buf.u64(blockSize) // managed space
    buf.u64(blockSize) // allocated managed space
    buf.u64(blockSize) // direct block iterator offset
    buf.u64(objects.length.toLong) // managed object count
    buf.u64(0); buf.u64(0); buf.u64(0); buf.u64(0) // huge/tiny sizes+counts
    buf.u16(4) // table width
    buf.u64(blockSize) // starting block size
    buf.u64(32768) // maximum direct block size
    buf.u16(32) // maximum heap size (bits)
    buf.u16(1) // starting rows in root indirect block
    val rootPatch = buf.pos; buf.u64(0)
    buf.u16(0) // current rows in root indirect block = 0 → root direct
    buf.u32(0) // checksum (not validated)
    val dbAddr = buf.pos
    buf.bytes("FHDB".getBytes("ASCII"))
    buf.u8(0)
    buf.u64(heapAddr)
    buf.u32(0) // block offset within heap space
    var off = dbHdr.toLong
    val ids = objects.map { o =>
      buf.bytes(o)
      val id = ByteBuffer.allocate(7).order(ByteOrder.LITTLE_ENDIAN)
      id.put(0.toByte) // managed, version 0
      id.putInt(off.toInt)
      id.putShort(o.length.toShort)
      off += o.length
      id.array()
    }
    buf.zeros((blockSize - off).toInt)
    buf.patchU64(rootPatch, dbAddr)
    (heapAddr, ids)
  }

  /** v2 B-tree over pre-sorted fixed-size records: a root leaf when
    * they fit, else a depth-1 tree (internal root whose records
    * separate leaf children) — exercising both reader paths. */
  private def writeV2Btree(
      buf: GrowBuf, records: Seq[Array[Byte]], recType: Int,
      nodeSize: Int): Long = {
    require(records.nonEmpty, "empty v2 btree not modeled")
    val recordSize = records.head.length
    val leafCap = (nodeSize - 10) / recordSize
    require(leafCap >= 1, "node size too small for one record")
    def minBytes(v: Long): Int = {
      var n = 1
      while ((v >> (8 * n)) != 0) n += 1
      n
    }
    def writeLeaf(recs: Seq[Array[Byte]]): Long = {
      val a = buf.pos
      buf.bytes("BTLF".getBytes("ASCII"))
      buf.u8(0); buf.u8(recType)
      recs.foreach(buf.bytes)
      buf.u32(0) // checksum
      a
    }
    val (rootAddr, depth, rootN) =
      if (records.length <= leafCap) (writeLeaf(records), 0, records.length)
      else {
        // depth-1 split: k leaves separated by k−1 records, leaf sizes
        // distributed evenly (n = Σ leaf sizes + k − 1, each ≤ leafCap)
        val n = records.length
        val k = (n + 1 + leafCap) / (leafCap + 1) // ceil((n+1)/(cap+1))
        val leafTotal = n - (k - 1)
        val base = leafTotal / k
        val extra = leafTotal % k
        val leaves = Seq.newBuilder[(Long, Int)]
        val seps = Seq.newBuilder[Array[Byte]]
        var i = 0
        var li = 0
        while (li < k) {
          val sz = base + (if (li < extra) 1 else 0)
          require(sz >= 1 && sz <= leafCap, s"bad leaf split size $sz")
          leaves += ((writeLeaf(records.slice(i, i + sz)), sz))
          i += sz
          if (li < k - 1) { seps += records(i); i += 1 }
          li += 1
        }
        val a = buf.pos
        buf.bytes("BTIN".getBytes("ASCII"))
        buf.u8(0); buf.u8(recType)
        val sepSeq = seps.result()
        sepSeq.foreach(buf.bytes)
        val nb = minBytes(leafCap.toLong)
        leaves.result().foreach { case (addr, n) =>
          buf.u64(addr)
          var b = 0
          while (b < nb) { buf.u8((n >> (8 * b)) & 0xFF); b += 1 }
        }
        buf.u32(0) // checksum
        (a, 1, sepSeq.length)
      }
    val hdr = buf.pos
    buf.bytes("BTHD".getBytes("ASCII"))
    buf.u8(0); buf.u8(recType)
    buf.u32(nodeSize.toLong)
    buf.u16(recordSize)
    buf.u16(depth)
    buf.u8(100); buf.u8(40) // split / merge percent
    buf.u64(rootAddr)
    buf.u16(rootN)
    buf.u64(records.length.toLong)
    buf.u32(0) // checksum
    hdr
  }

  /** Jenkins lookup3 ("hashlittle", initval 0) — the hash HDF5 keys
    * dense-storage name indexes by. The reader iterates records rather
    * than probing by hash, but the fixture writes the real thing so the
    * files stay faithful to what h5py emits. */
  private def lookup3(key: Array[Byte]): Int = {
    @inline def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + key.length
    var b = a
    var c = a
    var i = 0
    var len = key.length
    def k(j: Int): Int = key(i + j) & 0xFF
    while (len > 12) {
      a += k(0) | (k(1) << 8) | (k(2) << 16) | (k(3) << 24)
      b += k(4) | (k(5) << 8) | (k(6) << 16) | (k(7) << 24)
      c += k(8) | (k(9) << 8) | (k(10) << 16) | (k(11) << 24)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12
      len -= 12
    }
    if (len > 0) {
      if (len >= 1) a += k(0)
      if (len >= 2) a += k(1) << 8
      if (len >= 3) a += k(2) << 16
      if (len >= 4) a += k(3) << 24
      if (len >= 5) b += k(4)
      if (len >= 6) b += k(5) << 8
      if (len >= 7) b += k(6) << 16
      if (len >= 8) b += k(7) << 24
      if (len >= 9) c += k(8)
      if (len >= 10) c += k(9) << 8
      if (len >= 11) c += k(10) << 16
      if (len >= 12) c += k(11) << 24
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  /** v2 object header: "OHDR", flags=0x02 (4-byte chunk-0 size), 1-byte
    * message types, no padding, trailing (unvalidated) checksum. */
  private def writeHeaderV2(
      buf: GrowBuf, msgs: Seq[(Int, Array[Byte])]): Long = {
    val chunk0 = msgs.map(m => 4 + m._2.length).sum
    val addr = buf.pos
    buf.bytes("OHDR".getBytes("ASCII"))
    buf.u8(2); buf.u8(0x02)
    buf.u32(chunk0.toLong)
    msgs.foreach { case (t, b) =>
      buf.u8(t); buf.u16(b.length); buf.u8(0)
      buf.bytes(b)
    }
    buf.u32(0) // checksum placeholder
    addr
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  private def doDeflate(in: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(in); d.finish()
    val out = new ByteArrayOutputStream()
    val tmp = new Array[Byte](65536)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def doShuffle(in: Array[Byte], elemSize: Int): Array[Byte] = {
    val n = in.length / elemSize
    val out = new Array[Byte](in.length)
    var b = 0
    while (b < elemSize) {
      var i = 0
      while (i < n) { out(b * n + i) = in(i * elemSize + b); i += 1 }
      b += 1
    }
    out
  }

  /** Append-only little-endian byte buffer with u64 patching. */
  private final class GrowBuf {
    private var arr = new Array[Byte](1 << 16)
    private var len = 0
    def pos: Long = len.toLong
    private def ensure(n: Int): Unit =
      if (len + n > arr.length)
        arr = java.util.Arrays.copyOf(arr,
          math.max(arr.length * 2, len + n))
    def bytes(b: Array[Byte]): Unit = {
      ensure(b.length); System.arraycopy(b, 0, arr, len, b.length)
      len += b.length
    }
    def zeros(n: Int): Unit = { ensure(n); len += n }
    def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = {
      ensure(2)
      arr(len) = v.toByte; arr(len + 1) = (v >> 8).toByte; len += 2
    }
    def u32(v: Long): Unit = { ensure(4); putN(v, 4) }
    def u64(v: Long): Unit = { ensure(8); putN(v, 8) }
    private def putN(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { arr(len + i) = (v >> (8 * i)).toByte; i += 1 }
      len += n
    }
    def patchU64(at: Long, v: Long): Unit = {
      var i = 0
      while (i < 8) { arr(at.toInt + i) = (v >> (8 * i)).toByte; i += 1 }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }
}
