package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal pure-JVM HDF5 reader, implemented from the PUBLIC "HDF5 File
  * Format Specification" (versions I & II, hdfgroup.org) — no native
  * library, no external dependency (the container is zero-egress, so
  * binding a published pure-Java HDF5 artifact is not resolvable; the
  * format itself is open and this subset is small).
  *
  * Supported subset — exactly what the reference's curated feature files
  * need (`/root/reference/demos/features.hdf5`, written by vaex/h5py;
  * read by `vx.open_many`, `analyzer.py:560`) plus the common h5py
  * compression options:
  *
  *   - superblock v0 (classic) and v2/v3
  *   - v1 object headers (incl. continuation blocks) and v2 "OHDR"
  *     headers (h5py `libver='latest'`; incl. "OCHK" continuations)
  *   - symbol-table groups (v1 B-tree + SNOD + local heap) and
  *     new-style groups with COMPACT link messages or DENSE link
  *     storage (fractal heap + name-index v2 B-tree, r09 — what h5py
  *     emits past max_compact links or with `track_order=True`); dense
  *     ATTRIBUTE storage reads through the same machinery. Subset
  *     bounds: unfiltered heaps, managed objects, root direct block or
  *     an indirect root of direct rows, B-tree depth ≤ 1 (thousands of
  *     links at default node sizes) — beyond fails loudly by name
  *   - dataspace v1/v2 (simple, any rank)
  *   - datatypes: fixed-point (1/2/4/8-byte, signed/unsigned, either
  *     byte order — r10), IEEE float (4/8-byte, either byte order),
  *     fixed-length strings, and vlen strings (r10 — h5py's default
  *     `str` dataset layout: 16-byte global-heap descriptors)
  *   - data layout v3: compact, contiguous, and chunked (v1 chunk
  *     B-tree) with the deflate / shuffle / fletcher32 filters
  *   - attribute messages v1-v3 (fixed-point / float / fixed-string /
  *     vlen-string values, scalar or array; vlen payloads via the
  *     global heap) — acquisition metadata and units travel here
  *
  * Anything outside the subset fails with a descriptive exception
  * naming the unsupported feature — never a silent misread.
  *
  * Concurrency: instances are NOT thread-safe (single RandomAccessFile
  * cursor); use one instance per task. File METADATA is little-endian
  * per the HDF5 spec. Dataset/attribute VALUES may be either byte
  * order (the datatype message's order bit — r10): big-endian ints
  * and floats, as emitted on s390x/SPARC or via an explicit
  * `>f8`-style dtype, byte-swap on read; VAX-ordered floats are
  * rejected explicitly.
  */
final class Hdf5File(path: String) extends AutoCloseable {

  import Hdf5File._

  private val raf = new RandomAccessFile(path, "r")

  override def close(): Unit = raf.close()

  // ------------------------------------------------------------- raw io

  private def bytesAt(off: Long, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    raf.seek(off)
    raf.readFully(a)
    a
  }
  private def bufAt(off: Long, n: Int): ByteBuffer =
    ByteBuffer.wrap(bytesAt(off, n)).order(ByteOrder.LITTLE_ENDIAN)
  private def u8(off: Long): Int = { raf.seek(off); raf.read() }
  private def u16(off: Long): Int = bufAt(off, 2).getShort & 0xFFFF
  private def u32(off: Long): Long = bufAt(off, 4).getInt & 0xFFFFFFFFL
  private def u64(off: Long): Long = bufAt(off, 8).getLong

  private val UNDEF = -1L // 0xFFFF... addresses mean "undefined"

  // -------------------------------------------------------- superblock

  private val rootHeaderAddr: Long = {
    val sig = bytesAt(0, 8)
    val expect = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
      0x1A.toByte, '\n')
    require(java.util.Arrays.equals(sig, expect),
      s"$path: not an HDF5 file (bad signature)")
    u8(8) match {
      case 0 | 1 =>
        require(u8(13) == 8 && u8(14) == 8,
          s"$path: only 8-byte offsets/lengths are supported")
        // root group symbol table entry at 24 + 4*8; header addr is its
        // second field ("Disk Format: Level 1C — Symbol Table Entry")
        u64(24 + 32 + 8)
      case 2 | 3 =>
        require(u8(9) == 8 && u8(10) == 8,
          s"$path: only 8-byte offsets/lengths are supported")
        u64(12 + 3 * 8) // base, ext, eof, then root group header address
      case v =>
        throw new UnsupportedOperationException(
          s"$path: superblock version $v not supported")
    }
  }

  // ----------------------------------------------------- object headers

  /** One header message: (type, body bytes). Dispatches on the header
    * version at `addr`: v1 (classic, no signature) or v2 ("OHDR",
    * h5py `libver='latest'`). */
  private def headerMessages(addr: Long): Seq[(Int, Array[Byte])] =
    if (new String(bytesAt(addr, 4), "ASCII") == "OHDR")
      headerMessagesV2(addr)
    else {
      val ver = u8(addr)
      require(ver == 1, s"$path@$addr: object header v$ver (v1 and v2 " +
        "'OHDR' headers are supported)")
      headerMessagesV1(addr)
    }

  private def headerMessagesV1(addr: Long): Seq[(Int, Array[Byte])] = {
    val nmsg = u16(addr + 2)
    val hsize = u32(addr + 8)
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var remaining = nmsg
    // v1 header body starts 8-byte aligned at addr+16
    var blocks = List((addr + 16, hsize))
    while (blocks.nonEmpty && remaining > 0) {
      val (bstart, bsize) = blocks.head
      blocks = blocks.tail
      var p = bstart
      while (p < bstart + bsize && remaining > 0) {
        val mtype = u16(p)
        val msize = u16(p + 2)
        val body = bytesAt(p + 8, msize)
        if (mtype == 0x10) { // continuation: body is raw v1 messages
          val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
          blocks = blocks :+ ((bb.getLong(0), bb.getLong(8)))
        } else {
          out += ((mtype, body))
        }
        remaining -= 1
        p += 8 + msize
      }
    }
    out.result()
  }

  /** v2 ("OHDR") object header: 1-byte message types, explicit chunk-0
    * size (width from flags bits 0-1), optional times / phase-change
    * fields, trailing checksum per chunk (not validated — a torn file
    * fails on structure, which is the contract that matters here),
    * "OCHK" continuation blocks. */
  private def headerMessagesV2(addr: Long): Seq[(Int, Array[Byte])] = {
    val flags = u8(addr + 5)
    var p = addr + 6
    if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) p += 4 // max-compact / min-dense
    val szWidth = 1 << (flags & 0x03)
    val chunk0 = szWidth match {
      case 1 => u8(p).toLong
      case 2 => u16(p).toLong
      case 4 => u32(p)
      case 8 => u64(p)
    }
    p += szWidth
    val track = (flags & 0x04) != 0 // creation order tracked per message
    val out = Seq.newBuilder[(Int, Array[Byte])]
    // (message area start, message area length) — chunk 0 then OCHKs
    var blocks = List((p, chunk0))
    val hdr = if (track) 6 else 4 // type(1) + size(2) + flags(1) [+ord(2)]
    while (blocks.nonEmpty) {
      val (bstart, bsize) = blocks.head
      blocks = blocks.tail
      var q = bstart
      val end = bstart + bsize
      // messages pack the block; a gap smaller than one message header
      // may remain before the checksum
      while (end - q >= hdr) {
        val mtype = u8(q)
        val msize = u16(q + 1)
        val body = bytesAt(q + hdr, msize)
        if (mtype == 0x10) { // continuation → "OCHK" block
          val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
          val (caddr, clen) = (bb.getLong(0), bb.getLong(8))
          require(new String(bytesAt(caddr, 4), "ASCII") == "OCHK",
            s"$path@$caddr: expected continuation block signature")
          blocks = blocks :+ ((caddr + 4, clen - 8)) // minus sig+checksum
        } else if (mtype != 0) { // skip NIL padding
          out += ((mtype, body))
        }
        q += hdr + msize
      }
    }
    out.result()
  }

  // --------------------------------------- fractal heap + v2 B-tree
  // ("Disk Format: Level 1F — Fractal Heap" / "Level 1A2 — Version 2
  // B-trees") — the DENSE storage machinery h5py emits for groups with
  // many links (> max_compact, default 8) or `track_order=True`, and
  // for objects with many attributes. Subset: unfiltered heaps,
  // managed objects only (link/attribute messages are tiny — huge/tiny
  // object classes never arise), root direct block or a root indirect
  // block of DIRECT rows; B-trees of depth ≤ 1. Everything beyond
  // fails loudly by name.

  private final case class FractalHeap(
      idLen: Int,
      maxHeapBits: Int,
      tableWidth: Int,
      startBlockSize: Long,
      maxDirectSize: Long,
      rootAddr: Long,
      curRows: Int)

  private def fractalHeapHeader(addr: Long): FractalHeap = {
    require(new String(bytesAt(addr, 4), "ASCII") == "FRHP",
      s"$path@$addr: expected fractal heap header")
    require(u8(addr + 4) == 0,
      s"$path@$addr: fractal heap version ${u8(addr + 4)} unsupported")
    val idLen = u16(addr + 5)
    val filterLen = u16(addr + 7)
    require(filterLen == 0,
      s"$path@$addr: filtered fractal heaps are outside the supported " +
        "subset (h5py link/attribute heaps are unfiltered)")
    FractalHeap(
      idLen = idLen,
      tableWidth = u16(addr + 110),
      startBlockSize = u64(addr + 112),
      maxDirectSize = u64(addr + 120),
      maxHeapBits = u16(addr + 128),
      rootAddr = u64(addr + 132),
      curRows = u16(addr + 140))
  }

  /** Managed-object bytes for a heap ID (offset/length into the heap's
    * linear address space, which maps 1:1 onto block bytes INCLUDING
    * each direct block's header — the first object's offset is past the
    * first header, never 0). */
  private def fractalHeapObject(fh: FractalHeap, heapId: Array[Byte])
      : Array[Byte] = {
    require((heapId(0) & 0x30) == 0,
      s"$path: only MANAGED fractal-heap objects are supported " +
        s"(heap ID type ${(heapId(0) & 0x30) >> 4})")
    val offBytes = (fh.maxHeapBits + 7) / 8
    val lenBytes = fh.idLen - 1 - offBytes
    require(offBytes >= 1 && offBytes <= 8 && lenBytes >= 1 && lenBytes <= 8,
      s"$path: unsupported fractal-heap ID layout (idLen ${fh.idLen}, " +
        s"maxHeapBits ${fh.maxHeapBits})")
    def le(from: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (heapId(from + i) & 0xFFL) << (8 * i); i += 1 }
      v
    }
    val off = le(1, offBytes)
    val len = le(1 + offBytes, lenBytes).toInt
    // locate the direct block covering `off`
    val (blockAddr, blockStart) =
      if (fh.curRows == 0) (fh.rootAddr, 0L) // root IS a direct block
      else {
        // root indirect block: rows of direct-block addresses, row r
        // size = start (r ≤ 1) else start · 2^(r−1), tableWidth per row
        require(new String(bytesAt(fh.rootAddr, 4), "ASCII") == "FHIB",
          s"$path@${fh.rootAddr}: expected fractal heap indirect block")
        val offBytesIb = (fh.maxHeapBits + 7) / 8
        val entries0 = fh.rootAddr + 4 + 1 + 8 + offBytesIb
        val maxDirectRows = (java.lang.Long.numberOfTrailingZeros(
          java.lang.Long.highestOneBit(fh.maxDirectSize)) -
          java.lang.Long.numberOfTrailingZeros(
            java.lang.Long.highestOneBit(fh.startBlockSize))) + 2
        var found: Option[(Long, Long)] = None
        var cum = 0L
        var r = 0
        while (found.isEmpty && r < fh.curRows) {
          require(r < maxDirectRows,
            s"$path@${fh.rootAddr}: nested indirect fractal-heap blocks " +
              "are outside the supported subset")
          val rowSize =
            if (r <= 1) fh.startBlockSize else fh.startBlockSize << (r - 1)
          var c = 0
          while (found.isEmpty && c < fh.tableWidth) {
            if (off >= cum && off < cum + rowSize) {
              val a = u64(entries0 + (r * fh.tableWidth + c) * 8L)
              require(a != UNDEF,
                s"$path: fractal-heap offset $off points into an " +
                  "unallocated direct block")
              found = Some((a, cum))
            }
            cum += rowSize
            c += 1
          }
          r += 1
        }
        found.getOrElse(throw new IllegalStateException(
          s"$path: fractal-heap offset $off beyond the root indirect " +
            s"block's ${fh.curRows} row(s)"))
      }
    require(new String(bytesAt(blockAddr, 4), "ASCII") == "FHDB",
      s"$path@$blockAddr: expected fractal heap direct block")
    bytesAt(blockAddr + (off - blockStart), len)
  }

  /** All records of a version-2 B-tree, in tree order. Depth ≤ 1 (a
    * root leaf, or a root internal node of leaves — thousands of
    * records at default node sizes); deeper trees fail loudly. */
  private def v2BtreeRecords(addr: Long, expectType: Int)
      : Seq[Array[Byte]] = {
    require(new String(bytesAt(addr, 4), "ASCII") == "BTHD",
      s"$path@$addr: expected v2 B-tree header")
    require(u8(addr + 4) == 0,
      s"$path@$addr: v2 B-tree version ${u8(addr + 4)} unsupported")
    val btType = u8(addr + 5)
    require(btType == expectType,
      s"$path@$addr: v2 B-tree record type $btType (expected $expectType)")
    val nodeSize = u32(addr + 6)
    val recordSize = u16(addr + 10)
    val depth = u16(addr + 12)
    val rootAddr = u64(addr + 16)
    val rootNRecs = u16(addr + 24)
    require(depth <= 1,
      s"$path@$addr: v2 B-tree depth $depth is outside the supported " +
        "subset (≤ 1)")
    val out = Seq.newBuilder[Array[Byte]]
    // capacity of a leaf: node minus prefix (sig 4 + ver 1 + type 1)
    // and checksum (4); sizes of internal child-pointer count fields
    // derive from it ("III.A.2: Child Node Pointer")
    val leafCap = ((nodeSize - 10) / recordSize).toInt
    def minBytes(v: Long): Int = {
      var n = 1
      while ((v >> (8 * n)) != 0) n += 1
      n
    }
    val childNRecBytes = minBytes(leafCap.toLong)
    def leafRecords(a: Long, n: Int): Unit = {
      require(new String(bytesAt(a, 4), "ASCII") == "BTLF",
        s"$path@$a: expected v2 B-tree leaf")
      val body = bytesAt(a + 6, n * recordSize)
      var i = 0
      while (i < n) {
        out += java.util.Arrays.copyOfRange(body,
          i * recordSize, (i + 1) * recordSize)
        i += 1
      }
    }
    if (depth == 0) leafRecords(rootAddr, rootNRecs)
    else {
      require(new String(bytesAt(rootAddr, 4), "ASCII") == "BTIN",
        s"$path@$rootAddr: expected v2 B-tree internal node")
      // N records then N+1 child pointers {addr(8), nrec(childNRecBytes)}
      val recs = bytesAt(rootAddr + 6, rootNRecs * recordSize)
      val ptrBase = rootAddr + 6 + rootNRecs * recordSize
      val ptrSize = 8 + childNRecBytes
      var i = 0
      while (i <= rootNRecs) {
        val pa = ptrBase + i.toLong * ptrSize
        val childAddr = u64(pa)
        var nrec = 0L
        var b = 0
        while (b < childNRecBytes) {
          nrec |= (u8(pa + 8 + b).toLong & 0xFF) << (8 * b)
          b += 1
        }
        leafRecords(childAddr, nrec.toInt)
        if (i < rootNRecs)
          out += java.util.Arrays.copyOfRange(recs,
            i * recordSize, (i + 1) * recordSize)
        i += 1
      }
    }
    out.result()
  }

  /** Dense group links: name-index v2 B-tree records (type 5: 4-byte
    * name hash + heap ID) → link-message bytes from the fractal heap →
    * the same [[parseLink]] as compact storage. */
  private def denseLinks(fheapAddr: Long, nameBtAddr: Long)
      : Seq[(String, Long)] = {
    val fh = fractalHeapHeader(fheapAddr)
    v2BtreeRecords(nameBtAddr, 5).map { rec =>
      val heapId = java.util.Arrays.copyOfRange(rec, 4, rec.length)
      parseLink(fractalHeapObject(fh, heapId))
    }
  }

  // ------------------------------------------------------------- groups

  private def localHeapDataSeg(addr: Long): Long = {
    require(new String(bytesAt(addr, 4), "ASCII") == "HEAP",
      s"$path@$addr: expected local heap")
    u64(addr + 24)
  }

  private def heapString(dataSeg: Long, off: Long): String = {
    // link names are short; read in probes (clamped to EOF) until NUL
    val sb = new StringBuilder
    var pos = dataSeg + off
    var done = false
    while (!done) {
      val n = math.min(64L, raf.length() - pos).toInt
      require(n > 0, s"$path: heap string at $pos runs past EOF")
      val chunk = bytesAt(pos, n)
      val nul = chunk.indexOf(0.toByte)
      if (nul >= 0) { sb.append(new String(chunk, 0, nul, "UTF-8")); done = true }
      else { sb.append(new String(chunk, "UTF-8")); pos += n }
    }
    sb.toString
  }

  /** (name, object header address) pairs of a group: classic
    * symbol-table groups, or new-style groups with COMPACT link
    * messages (h5py `libver='latest'` with ≤ max_compact links). Dense
    * link storage (fractal heap) fails loudly by name. */
  private def groupEntries(headerAddr: Long): Seq[(String, Long)] = {
    val msgs = headerMessages(headerAddr)
    val stabOpt = msgs.collectFirst {
      case (0x11, body) =>
        val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getLong(0), bb.getLong(8)) // (v1 B-tree addr, local heap addr)
    }
    if (stabOpt.isEmpty) {
      val links = msgs.collect { case (0x06, body) => parseLink(body) }
      if (links.nonEmpty) return links
      // no compact links: either a genuinely empty new-style group or
      // DENSE storage (links in a fractal heap, indexed by a name v2
      // B-tree) — message 0x02 (Link Info) tells them apart and names
      // the structures (r09: dense storage is now read, not rejected —
      // h5py emits it for > max_compact links or track_order=True)
      msgs.collectFirst { case (0x02, body) => body }.foreach { body =>
        val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        val fl = body(1) & 0xFF
        val heapOff = 2 + (if ((fl & 0x01) != 0) 8 else 0)
        val fheapAddr = bb.getLong(heapOff)
        if (fheapAddr == UNDEF) return Nil // empty new-style group
        val nameBtAddr = bb.getLong(heapOff + 8)
        require(nameBtAddr != UNDEF,
          s"$path@$headerAddr: dense link storage without a name index " +
            "B-tree")
        return denseLinks(fheapAddr, nameBtAddr)
      }
    }
    val stab = stabOpt.getOrElse(throw new UnsupportedOperationException(
      s"$path@$headerAddr: not a group (no symbol table and no link " +
        "messages)"))
    val dataSeg = localHeapDataSeg(stab._2)
    val out = Seq.newBuilder[(String, Long)]

    def walkBtree(addr: Long): Unit = {
      require(new String(bytesAt(addr, 4), "ASCII") == "TREE",
        s"$path@$addr: expected group B-tree node")
      val level = u8(addr + 5)
      val nent = u16(addr + 6)
      var p = addr + 8 + 16 // skip left/right sibling addresses
      var i = 0
      while (i < nent) {
        p += 8 // key i (heap offset of first name in child) — unused
        val child = u64(p); p += 8
        if (level > 0) walkBtree(child) else walkSnod(child)
        i += 1
      }
    }

    def walkSnod(addr: Long): Unit = {
      require(new String(bytesAt(addr, 4), "ASCII") == "SNOD",
        s"$path@$addr: expected symbol table node")
      val nsym = u16(addr + 6)
      val table = bufAt(addr + 8, nsym * 40)
      var i = 0
      while (i < nsym) {
        val nameOff = table.getLong(i * 40)
        val ohdr = table.getLong(i * 40 + 8)
        out += ((heapString(dataSeg, nameOff), ohdr))
        i += 1
      }
    }

    walkBtree(stab._1)
    out.result()
  }

  /** One link message (0x06) → (name, object header address). Only
    * hard links are in the subset (h5py emits hard links for regular
    * group members). */
  private def parseLink(body: Array[Byte]): (String, Long) = {
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    require((body(0) & 0xFF) == 1,
      s"$path: link message v${body(0)} unsupported")
    val fl = body(1) & 0xFF
    var p = 2
    val linkType =
      if ((fl & 0x08) != 0) { val t = body(p) & 0xFF; p += 1; t } else 0
    require(linkType == 0,
      s"$path: link type $linkType unsupported (hard links only)")
    if ((fl & 0x04) != 0) p += 8 // creation order
    if ((fl & 0x10) != 0) p += 1 // name charset
    val nameLen = (1 << (fl & 0x03)) match {
      case 1 => body(p) & 0xFF
      case 2 => bb.getShort(p) & 0xFFFF
      case 4 => bb.getInt(p)
      case 8 => bb.getLong(p).toInt
    }
    p += (1 << (fl & 0x03))
    val name = new String(body, p, nameLen, "UTF-8")
    (name, bb.getLong(p + nameLen))
  }

  private def resolve(p: String): Long =
    p.split('/').filter(_.nonEmpty).foldLeft(rootHeaderAddr) { (addr, seg) =>
      groupEntries(addr).collectFirst { case (n, a) if n == seg => a }
        .getOrElse(throw new NoSuchElementException(
          s"$path: no object '$seg' (resolving '$p'); siblings: " +
            groupEntries(addr).map(_._1).sorted.mkString(", ")))
    }

  /** Child names of the group at `groupPath` ("/" = root), sorted. */
  def list(groupPath: String): Seq[String] =
    groupEntries(resolve(groupPath)).map(_._1).sorted

  /** True when the named child object is itself a group (classic
    * symbol-table or new-style link-message group). */
  def isGroup(objectPath: String): Boolean =
    headerMessages(resolve(objectPath)).exists(m =>
      m._1 == 0x11 || m._1 == 0x06 || m._1 == 0x02)

  // ---------------------------------------------------------- attributes

  /** Attributes of the object at `objectPath` ("/" = root). Values
    * decode to `Long` / `Double` / `String` for scalar attributes and
    * `Array[Long]` / `Array[Double]` / `Array[String]` for rank ≥ 1
    * (row-major; multidimensional attribute shapes are flattened).
    * Covers the subset real acquisition metadata uses: fixed-point,
    * IEEE float, fixed strings, and h5py's variable-length strings
    * (global-heap backed). Anything else fails loudly. */
  def attributes(objectPath: String): Map[String, Any] =
    attrMessageBodies(objectPath)
      .map(parseAttribute(_, objectPath)).toMap

  /** Raw VALUE bytes of the named attribute (fixed-string/opaque
    * payloads that must NOT round-trip through String — PyTables
    * pickles Python-object attributes into exactly such scalars). */
  def attributeBytes(objectPath: String, name: String): Option[Array[Byte]] =
    attrMessageBodies(objectPath).iterator
      .map(parseAttributeRaw(_, objectPath))
      .collectFirst { case (n, bytes) if n == name => bytes }

  /** All attribute message bodies of an object: plain 0x0C messages
    * plus DENSE storage (h5py: > 8 attributes with libver='latest')
    * — attribute messages in a fractal heap behind an Attribute Info
    * message, name-indexed by a v2 B-tree (record type 8: 8-byte heap
    * ID + message flags + creation order + name hash), read through
    * the same machinery as dense links (r09). */
  private def attrMessageBodies(objectPath: String): Seq[Array[Byte]] = {
    val msgs = headerMessages(resolve(objectPath))
    val dense = msgs.collectFirst { case (0x15, body) => body }.toSeq
      .flatMap { body =>
        val fl = body(1) & 0xFF
        val heapOff = 2 + (if ((fl & 0x01) != 0) 2 else 0)
        val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        val fheapAddr = bb.getLong(heapOff)
        if (fheapAddr == UNDEF) Nil
        else {
          val nameBtAddr = bb.getLong(heapOff + 8)
          require(nameBtAddr != UNDEF,
            s"$path/$objectPath: dense attribute storage without a " +
              "name index B-tree")
          val fh = fractalHeapHeader(fheapAddr)
          v2BtreeRecords(nameBtAddr, 8).map { rec =>
            // the record's heap-ID field is 8 bytes; the heap's actual
            // ID length governs how many of them are meaningful
            val heapId = java.util.Arrays.copyOfRange(rec, 0,
              math.min(fh.idLen, 8))
            fractalHeapObject(fh, heapId)
          }
        }
      }
    msgs.collect { case (0x0C, body) => body } ++ dense
  }

  /** Attribute message header walk (v1/v2/v3): (name, datatype,
    * dims, offset of the value bytes in `body`). */
  private def attrHeader(body: Array[Byte], ctx: String)
      : (String, Dtype, Seq[Long], Int) = {
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val ver = body(0) & 0xFF
    require(ver >= 1 && ver <= 3,
      s"$path/$ctx: attribute message v$ver unsupported")
    val flags = if (ver == 1) 0 else body(1) & 0xFF
    require((flags & 0x03) == 0,
      s"$path/$ctx: shared attribute datatype/dataspace unsupported")
    val nameSize = bb.getShort(2) & 0xFFFF // includes the NUL
    val dtSize = bb.getShort(4) & 0xFFFF
    val dsSize = bb.getShort(6) & 0xFFFF
    // v3 inserts a name-encoding byte; v1 pads each field to 8 bytes
    var p = if (ver == 3) 9 else 8
    def pad(n: Int) = if (ver == 1) (n + 7) / 8 * 8 else n
    val nameEnd = {
      var e = p
      while (e < p + nameSize && body(e) != 0) e += 1
      e
    }
    val name = new String(body, p, nameEnd - p, "UTF-8")
    p += pad(nameSize)
    val dtype = parseDatatype(
      java.util.Arrays.copyOfRange(body, p, p + dtSize), s"$ctx@$name")
    p += pad(dtSize)
    val dims = parseDataspace(
      java.util.Arrays.copyOfRange(body, p, p + dsSize), s"$ctx@$name")
    p += pad(dsSize)
    (name, dtype, dims, p)
  }

  /** One attribute message (v1/v2/v3) → (name, decoded value). */
  private def parseAttribute(body: Array[Byte], ctx: String): (String, Any) = {
    val (name, dtype, dims, p) = attrHeader(body, ctx)
    val n = dims.product.toInt // empty dims → scalar → product = 1
    // numeric attribute VALUES follow the datatype's byte order; the
    // vlen descriptor (class 9) is metadata and stays LE (bigEndian is
    // only ever set for classes 0/1)
    val data = ByteBuffer.wrap(body, p, body.length - p).slice()
      .order(dataOrder(dtype))
    name -> decodeAttrValue(dtype, dims, n, data, s"$ctx@$name")
  }

  /** One attribute message → (name, raw value bytes — exactly the
    * datatype-sized payload, no string decode). */
  private def parseAttributeRaw(
      body: Array[Byte], ctx: String): (String, Array[Byte]) = {
    val (name, dtype, dims, p) = attrHeader(body, ctx)
    val n = dims.product.toInt
    val len = math.min(n * dtype.size, body.length - p)
    (name, java.util.Arrays.copyOfRange(body, p, p + len))
  }

  private def decodeAttrValue(
      dtype: Dtype,
      dims: Seq[Long],
      n: Int,
      data: ByteBuffer,
      ctx: String): Any = {
    def longs: Array[Long] = Array.tabulate(n) { i =>
      dtype.size match {
        case 8 => data.getLong(i * 8)
        case 4 => if (dtype.signed) data.getInt(i * 4).toLong
                  else data.getInt(i * 4) & 0xFFFFFFFFL
        case 2 => if (dtype.signed) data.getShort(i * 2).toLong
                  else (data.getShort(i * 2) & 0xFFFF).toLong
        case 1 => if (dtype.signed) data.get(i).toLong
                  else (data.get(i) & 0xFF).toLong
        case s => throw new UnsupportedOperationException(
          s"$path/$ctx: $s-byte attribute integers unsupported")
      }
    }
    def doubles: Array[Double] = Array.tabulate(n) { i =>
      if (dtype.size == 8) data.getDouble(i * 8)
      else data.getFloat(i * 4).toDouble
    }
    def strings: Array[String] = dtype.clazz match {
      case 3 => Array.tabulate(n) { i =>
        val raw = new Array[Byte](dtype.size)
        data.position(i * dtype.size); data.get(raw); data.rewind()
        var end = raw.length
        while (end > 0 && (raw(end - 1) == 0 || raw(end - 1) == ' '))
          end -= 1
        new String(raw, 0, end, "UTF-8")
      }
      case 9 => Array.tabulate(n) { i => // vlen: (len, gheap addr, index)
        val base = i * 16
        val len = data.getInt(base)
        val gaddr = data.getLong(base + 4)
        val gidx = data.getInt(base + 12)
        new String(globalHeapObject(gaddr, gidx, ctx), 0, len, "UTF-8")
      }
      case _ => throw new IllegalStateException("not a string dtype")
    }
    val scalar = dims.isEmpty ||
      (dims.sizeIs == 1 && dims.head == 1L && n == 1)
    dtype.clazz match {
      case 0 => if (scalar) longs(0) else longs
      case 1 => if (scalar) doubles(0) else doubles
      case 3 | 9 => if (scalar) strings(0) else strings
      case c => throw new UnsupportedOperationException(
        s"$path/$ctx: attribute datatype class $c unsupported")
    }
  }

  /** Per-collection object directory: index → (data offset, size).
    * A vlen-string DATASET resolves one heap object per element, and
    * a linear rescan per element would make each collection quadratic
    * in its object count (with a file seek per step) — each GCOL is
    * parsed ONCE and memoized instead. Collections are small (the
    * library writers cap them around 4–64 KB), so the memo is
    * KB-bounded per collection. */
  private val gcolDir =
    new java.util.HashMap[Long, java.util.HashMap[Integer, (Long, Int)]]()

  private def gcolObjects(collectionAddr: Long, ctx: String)
      : java.util.HashMap[Integer, (Long, Int)] = {
    val cached = gcolDir.get(collectionAddr)
    if (cached != null) return cached
    require(new String(bytesAt(collectionAddr, 4), "ASCII") == "GCOL",
      s"$path/$ctx: expected global heap collection at $collectionAddr")
    val collSize = u64(collectionAddr + 8)
    val m = new java.util.HashMap[Integer, (Long, Int)]()
    var p = collectionAddr + 16
    val end = collectionAddr + collSize
    while (p < end) {
      val objIdx = u16(p)
      val objSize = u64(p + 8)
      if (objIdx == 0) p = end // free space runs to collection end
      else {
        m.put(objIdx, (p + 16, objSize.toInt))
        p += 16 + (objSize + 7) / 8 * 8
      }
    }
    gcolDir.put(collectionAddr, m)
    m
  }

  /** Fetch one object's bytes from a global heap collection ("GCOL",
    * "Disk Format: Level 1E") — where h5py stores vlen attribute AND
    * vlen dataset payloads. */
  private def globalHeapObject(
      collectionAddr: Long, index: Int, ctx: String): Array[Byte] = {
    val obj = gcolObjects(collectionAddr, ctx).get(index)
    if (obj == null) throw new NoSuchElementException(
      s"$path/$ctx: global heap object $index not in collection " +
        s"at $collectionAddr")
    bytesAt(obj._1, obj._2)
  }

  // ----------------------------------------------------------- datasets


  /** Dataspace message body → dimension sizes (empty = scalar). */
  private def parseDataspace(body: Array[Byte], ctx: String): Seq[Long] = {
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val ver = body(0)
    val rank = body(1) & 0xFF
    val dimsOff = if (ver == 1) 8 else 4 // v1 has 5 reserved bytes
    (0 until rank).map(i => bb.getLong(dimsOff + 8 * i))
  }

  /** Datatype message body → [[Hdf5File.Dtype]] (clazz 9 = vlen
    * string — attribute values AND datasets since r10; dataset
    * elements are 16-byte global-heap descriptors). */
  private def parseDatatype(body: Array[Byte], ctx: String): Dtype = {
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val cls = body(0) & 0x0F
    val b0 = body(1) & 0xFF
    val size = bb.getInt(4)
    cls match {
      case 0 => // fixed-point; bit0 = byte order, bit3 = signed
        Dtype(0, size, (b0 & 0x08) != 0, (b0 & 1) != 0)
      case 1 =>
        // float byte order is bits {0,6}: 00 = LE, 01 = BE, 11 = VAX
        require((b0 & 0x40) == 0, s"$ctx: VAX-ordered floats unsupported")
        require(size == 4 || size == 8,
          s"$ctx: only f4/f8 floats supported, got size $size")
        Dtype(1, size, signed = true, (b0 & 1) != 0)
      case 3 =>
        Dtype(3, size, signed = false) // fixed-length string
      case 9 => // variable-length: low nibble 1 = string (h5py str),
        // 0 = sequence (PyTables VLArray). For class 9 the `signed`
        // slot carries the IS-STRING flag (ints never reach it).
        Dtype(9, size, signed = (b0 & 0x0F) == 1)
      case 6 => // compound (PyTables Table records); members via
        // [[compoundMembers]] — the Dtype carries the record size so
        // the generic chunk/byte machinery works unchanged
        Dtype(6, size, signed = false)
      case c =>
        throw new UnsupportedOperationException(
          s"$ctx: datatype class $c not in the supported subset " +
            "(fixed-point, IEEE float, fixed string, vlen, compound)")
    }
  }

  /** Members of the compound (class 6) datatype of dataset `p` — the
    * PyTables Table record layout. All three member encodings parse:
    * v1 (name padded to 8, 4-byte offset, INLINE dimensionality +
    * four dim sizes — the pre-1.4 array form), v2 (name padded to 8,
    * 4-byte offset, array members via the class-10 array datatype),
    * v3 (name unpadded, offset in the minimal byte count for the
    * record size). Array-typed members flatten to (base dtype, dims);
    * nested compounds fail loudly — PyTables never writes them for
    * pandas tables. */
  def compoundMembers(p: String): Seq[CompoundMember] = {
    val body = headerMessages(resolve(p))
      .collectFirst { case (0x03, b) => b }
      .getOrElse(throw new IllegalStateException(
        s"$path/$p: no datatype message"))
    val ctx = s"$path/$p"
    require((body(0) & 0x0F) == 6, s"$ctx: not a compound datatype")
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val ver = (body(0) >> 4) & 0x0F
    require(ver >= 1 && ver <= 3, s"$ctx: compound datatype v$ver")
    val nMembers = (body(1) & 0xFF) | ((body(2) & 0xFF) << 8)
    val recSize = bb.getInt(4)
    // v3 member offsets use the minimal byte count for the record size
    val offBytes =
      if (recSize < 256) 1
      else if (recSize < 65536) 2
      else if (recSize < (1 << 24)) 3
      else 4
    var off = 8
    (0 until nMembers).map { _ =>
      val nameStart = off
      while (body(off) != 0) off += 1
      val name = new String(body, nameStart, off - nameStart, "UTF-8")
      off += 1
      if (ver <= 2) // padded to 8 INCLUDING the NUL
        off = nameStart + (off - nameStart + 7) / 8 * 8
      val mOffset: Int =
        if (ver <= 2) { val v = bb.getInt(off); off += 4; v }
        else {
          var v = 0L
          (0 until offBytes).foreach(i =>
            v |= (body(off + i) & 0xFFL) << (8 * i))
          off += offBytes
          v.toInt
        }
      var dims: Seq[Int] = Nil
      if (ver == 1) {
        val rank = body(off) & 0xFF
        off += 1 + 3 + 4 + 4 // rank, reserved, permutation, reserved
        val ds = (0 until 4).map(i => bb.getInt(off + 4 * i))
        off += 16
        dims = ds.take(rank).map(identity)
      }
      val (dt, aDims, consumed) = parseDatatypeAt(body, off, s"$ctx@$name")
      off += consumed
      require(dims.isEmpty || aDims.isEmpty,
        s"$ctx@$name: both inline and array-datatype dims")
      CompoundMember(name, mOffset, if (dims.nonEmpty) dims else aDims, dt)
    }
  }

  /** Parse the datatype encoded at `off` inside a compound member:
    * (scalar dtype, array dims — empty for scalar, encoded length).
    * Supports the member subset PyTables emits: fixed-point, IEEE
    * float, fixed string, and class-10 arrays (v2: rank + 3 reserved
    * + dims + permutations; v3: rank + dims) over those. */
  private def parseDatatypeAt(
      body: Array[Byte], off: Int, ctx: String): (Dtype, Seq[Int], Int) = {
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val cls = body(off) & 0x0F
    val ver = (body(off) >> 4) & 0x0F
    val size = bb.getInt(off + 4)
    cls match {
      case 0 => // fixed-point: properties = bit offset + precision
        (parseDatatype(java.util.Arrays.copyOfRange(
          body, off, off + 12), ctx), Nil, 12)
      case 1 => // IEEE float: 12 property bytes
        (parseDatatype(java.util.Arrays.copyOfRange(
          body, off, off + 20), ctx), Nil, 20)
      case 3 => // fixed string: no properties
        (parseDatatype(java.util.Arrays.copyOfRange(
          body, off, off + 8), ctx), Nil, 8)
      case 10 => // array: dims, then the base type
        val rank = body(off + 8) & 0xFF
        val dimsAt = off + 9 + (if (ver == 2) 3 else 0)
        val dims = (0 until rank).map(i => bb.getInt(dimsAt + 4 * i))
        // v2 carries 4-byte permutation slots per dim after the sizes
        val baseAt = dimsAt + 4 * rank + (if (ver == 2) 4 * rank else 0)
        val (base, inner, len) = parseDatatypeAt(body, baseAt, ctx)
        require(inner.isEmpty, s"$ctx: nested array datatypes")
        (base, dims, baseAt - off + len)
      case c => throw new UnsupportedOperationException(
        s"$ctx: compound member datatype class $c unsupported")
    }
  }

  def dataset(p: String): Dataset = {
    val msgs = headerMessages(resolve(p))
    var dims: Seq[Long] = null
    var dtype: Dtype = null
    var layout: Layout = null
    var filters: Seq[(Int, Array[Int])] = Nil
    msgs.foreach {
      case (0x01, body) => // dataspace
        dims = parseDataspace(body, s"$path/$p")
      case (0x03, body) => // datatype
        dtype = parseDatatype(body, s"$path/$p")
      case (0x08, body) => // data layout
        val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        val ver = body(0) & 0xFF
        require(ver == 3,
          s"$path/$p: data layout v$ver unsupported (h5py writes v3)")
        (body(1) & 0xFF) match {
          case 0 =>
            val sz = bb.getShort(2) & 0xFFFF
            layout = Compact(java.util.Arrays.copyOfRange(body, 4, 4 + sz))
          case 1 =>
            layout = Contiguous(bb.getLong(2), bb.getLong(10))
          case 2 =>
            val d = body(2) & 0xFF // rank + 1 (element-size dimension)
            val cd = (0 until d).map(i => bb.getInt(11 + 4 * i))
            layout = Chunked(bb.getLong(3), cd)
          case c => throw new UnsupportedOperationException(
            s"$path/$p: layout class $c unsupported")
        }
      case (0x0B, body) => // filter pipeline (v1 or v2)
        val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        val ver = body(0) & 0xFF
        require(ver == 1 || ver == 2,
          s"$path/$p: filter pipeline v$ver unsupported")
        val nf = body(1) & 0xFF
        var p0 = if (ver == 1) 8 else 2
        filters = (0 until nf).map { _ =>
          val id = bb.getShort(p0) & 0xFFFF
          // v2 with id < 256 has NO name-length field: flags/ncv shift
          // up two bytes (ADVICE r06 — the old code read v1 offsets
          // unconditionally and would misparse a v2 pipeline).
          val hasNameLen = ver == 1 || id >= 256
          val nameLen =
            if (hasNameLen) bb.getShort(p0 + 2) & 0xFFFF else 0
          val base = if (hasNameLen) p0 + 4 else p0 + 2
          val flags = bb.getShort(base) & 0xFFFF
          val ncv = bb.getShort(base + 2) & 0xFFFF
          var q = base + 4
          if (nameLen > 0)
            q += (if (ver == 1) (nameLen + 7) / 8 * 8 // v1 pads name to 8
                  else nameLen)                       // v2 does not pad
          val cvs = (0 until ncv).map(i => bb.getInt(q + 4 * i)).toArray
          q += 4 * ncv
          if (ver == 1 && ncv % 2 == 1) q += 4 // v1 pads odd client data
          p0 = q
          (id, cvs)
        }
      case _ => ()
    }
    require(dims != null && dtype != null && layout != null,
      s"$path/$p: not a dataset (missing dataspace/datatype/layout)")
    Dataset(dims, dtype, layout, filters)
  }

  // --------------------------------------------------------- raw values

  /** All element bytes of a dataset, filters applied, row-major. */
  def readBytes(p: String): Array[Byte] = readBytes(p, dataset(p))

  private def readBytes(p: String, ds: Dataset): Array[Byte] = {
    val total = ds.n * ds.dtype.size
    require(total <= Int.MaxValue - 8,
      s"$path/$p: dataset too large for a single array read")
    ds.layout match {
      case Compact(data) => data
      case Contiguous(addr, size) =>
        if (addr == UNDEF) new Array[Byte](total.toInt) // never written
        else bytesAt(addr, math.min(size, total).toInt)
      case Chunked(btree, chunkDims) =>
        val out = new Array[Byte](total.toInt)
        // row-major strides (in BYTES) of the full dataset
        val dimsB = ds.dims.map(_.toInt).toArray :+ ds.dtype.size
        val strides = new Array[Long](dimsB.length)
        strides(dimsB.length - 1) = 1
        var i = dimsB.length - 2
        while (i >= 0) { strides(i) = strides(i + 1) * dimsB(i + 1); i -= 1 }
        readChunks(btree, chunkDims.toArray, dimsB, strides, ds, out)
        out
    }
  }

  /** Walk the v1 chunk B-tree; decode each chunk and scatter it into
    * `out` honoring partial edge chunks. */
  private def readChunks(
      addr: Long,
      chunkDims: Array[Int],
      dimsB: Array[Int],
      strides: Array[Long],
      ds: Dataset,
      out: Array[Byte]): Unit = {
    require(new String(bytesAt(addr, 4), "ASCII") == "TREE",
      s"$path@$addr: expected chunk B-tree node")
    require(u8(addr + 4) == 1, s"$path@$addr: not a chunk B-tree")
    val level = u8(addr + 5)
    val nent = u16(addr + 6)
    val d = chunkDims.length
    val keySize = 8 + 8 * d
    var p = addr + 8 + 16
    var i = 0
    while (i < nent) {
      val key = bufAt(p, keySize)
      val chunkBytes = key.getInt(0)
      val offsets = (0 until d).map(j => key.getLong(8 + 8 * j)).toArray
      p += keySize
      val child = u64(p); p += 8
      if (level > 0) readChunks(child, chunkDims, dimsB, strides, ds, out)
      else {
        var raw = bytesAt(child, chunkBytes)
        // filters run in reverse order on read
        ds.filters.reverse.foreach { case (id, cvs) =>
          raw = id match {
            case 1 => inflate(raw)
            case 2 => unshuffle(raw, cvs.headOption.getOrElse(ds.dtype.size))
            case 3 => java.util.Arrays.copyOf(raw, raw.length - 4) // fletcher
            case other => throw new UnsupportedOperationException(
              s"$path: filter id $other unsupported (deflate/shuffle/" +
                "fletcher32 only)")
          }
        }
        scatterChunk(raw, offsets, chunkDims, dimsB, strides, out)
      }
      i += 1
    }
  }

  /** Copy one decoded chunk (row-major within the chunk) into the output
    * array, clipping edge chunks to the dataset bounds. The innermost
    * DATA dimension forms contiguous runs (chunk offsets are always
    * element-aligned); outer data dimensions are walked with a row-major
    * odometer so rank-N chunks — including partial-width edge chunks —
    * scatter correctly. */
  private def scatterChunk(
      raw: Array[Byte],
      offsets: Array[Long],
      chunkDims: Array[Int],
      dimsB: Array[Int],
      strides: Array[Long],
      out: Array[Byte]): Unit = {
    val d = chunkDims.length // data dims + trailing element-size dim
    val elem = chunkDims(d - 1)
    val innerChunk = chunkDims(d - 2) // elements per contiguous run
    val copyElems = math.max(0L,
      math.min(innerChunk.toLong, dimsB(d - 2) - offsets(d - 2))).toInt
    val nOuter = d - 2 // outer data dims (all but the innermost)
    val counters = new Array[Int](math.max(nOuter, 0))
    var srcRow = 0L
    var done = false
    while (!done) {
      var inBounds = copyElems > 0
      var dst = offsets(d - 2) * strides(d - 2)
      var j = 0
      while (j < nOuter) {
        val pos = offsets(j) + counters(j)
        if (pos >= dimsB(j)) inBounds = false
        dst += pos * strides(j)
        j += 1
      }
      if (inBounds)
        System.arraycopy(raw, (srcRow * innerChunk * elem).toInt,
          out, dst.toInt, copyElems * elem)
      srcRow += 1
      // row-major odometer over the outer dims (rightmost fastest)
      var k = nOuter - 1
      var carried = true
      while (k >= 0 && carried) {
        counters(k) += 1
        if (counters(k) < chunkDims(k)) carried = false
        else { counters(k) = 0; k -= 1 }
      }
      if (nOuter == 0 || carried) done = true
    }
  }

  private def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(in.length * 4)
    val buf = new Array[Byte](65536)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new IllegalStateException("truncated deflate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Inverse of the HDF5 shuffle filter: bytes were regrouped by
    * byte-position across elements. */
  private def unshuffle(in: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return in
    val n = in.length / elemSize
    val out = new Array[Byte](in.length)
    var b = 0
    while (b < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + b) = in(b * n + i); i += 1 }
      b += 1
    }
    // trailing bytes (length not divisible) pass through
    var t = n * elemSize
    while (t < in.length) { out(t) = in(t); t += 1 }
    out
  }

  // ------------------------------------------------------- typed reads

  /** Value byte order: the datatype's, not the file's (metadata is
    * always LE; data may be either — r10). */
  private def dataOrder(dt: Dtype): ByteOrder =
    if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

  def readDoubles(p: String): Array[Double] = {
    val ds = dataset(p)
    val bytes = readBytes(p, ds)
    val bb = ByteBuffer.wrap(bytes).order(dataOrder(ds.dtype))
    ds.dtype match {
      case Dtype(1, 8, _, _) =>
        val out = new Array[Double](ds.n.toInt)
        bb.asDoubleBuffer().get(out); out
      case Dtype(1, 4, _, _) =>
        Array.tabulate(ds.n.toInt)(i => bb.getFloat(i * 4).toDouble)
      case Dtype(0, _, _, _) => readLongsFrom(ds, bb).map(_.toDouble)
      case t => throw new UnsupportedOperationException(
        s"$path/$p: cannot read ${t} as double")
    }
  }

  def readFloats(p: String): Array[Float] = {
    val ds = dataset(p)
    val bb = ByteBuffer.wrap(readBytes(p, ds)).order(dataOrder(ds.dtype))
    ds.dtype match {
      case Dtype(1, 4, _, _) =>
        val out = new Array[Float](ds.n.toInt)
        bb.asFloatBuffer().get(out); out
      case Dtype(1, 8, _, _) =>
        Array.tabulate(ds.n.toInt)(i => bb.getDouble(i * 8).toFloat)
      case t => throw new UnsupportedOperationException(
        s"$path/$p: cannot read ${t} as float")
    }
  }

  def readLongs(p: String): Array[Long] = {
    val ds = dataset(p)
    val bb = ByteBuffer.wrap(readBytes(p, ds)).order(dataOrder(ds.dtype))
    ds.dtype match {
      case Dtype(0, _, _, _) => readLongsFrom(ds, bb)
      case Dtype(1, 8, _, _) => // float-stored keys (pandas→vaex convention)
        Array.tabulate(ds.n.toInt)(i => bb.getDouble(i * 8).toLong)
      case t => throw new UnsupportedOperationException(
        s"$path/$p: cannot read ${t} as long")
    }
  }

  private def readLongsFrom(ds: Dataset, bb: ByteBuffer): Array[Long] = {
    val n = ds.n.toInt
    ds.dtype.size match {
      case 8 => val out = new Array[Long](n); bb.asLongBuffer().get(out); out
      case 4 =>
        if (ds.dtype.signed) Array.tabulate(n)(i => bb.getInt(i * 4).toLong)
        else Array.tabulate(n)(i => bb.getInt(i * 4) & 0xFFFFFFFFL)
      case 2 =>
        if (ds.dtype.signed) Array.tabulate(n)(i => bb.getShort(i * 2).toLong)
        else Array.tabulate(n)(i => (bb.getShort(i * 2) & 0xFFFF).toLong)
      case 1 =>
        if (ds.dtype.signed) Array.tabulate(n)(i => bb.get(i).toLong)
        else Array.tabulate(n)(i => (bb.get(i) & 0xFF).toLong)
      case s => throw new UnsupportedOperationException(
        s"$path: $s-byte integers unsupported")
    }
  }

  /** String dataset: fixed-length (class 3, NUL/space-trimmed) or
    * variable-length (class 9 — h5py's default `str` layout, r10):
    * each element is a 16-byte (length, global-heap address, index)
    * descriptor resolved through the same GCOL machinery as vlen
    * attributes; zero-length/null descriptors yield "". Works for
    * contiguous and chunked (the descriptors chunk; heap objects are
    * global). */
  def readStrings(p: String): Array[String] = {
    val ds = dataset(p)
    val bytes = readBytes(p, ds)
    ds.dtype.clazz match {
      case 3 =>
        val w = ds.dtype.size
        Array.tabulate(ds.n.toInt) { i =>
          var end = (i + 1) * w
          while (end > i * w &&
              (bytes(end - 1) == 0 || bytes(end - 1) == ' '))
            end -= 1
          new String(bytes, i * w, end - i * w, "UTF-8")
        }
      case 9 =>
        require(ds.dtype.signed, // class-9 is-string flag
          s"$path/$p: vlen SEQUENCE dataset — use readVlenBytes")
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(ds.n.toInt) { i =>
          val len = bb.getInt(i * 16)
          val gaddr = bb.getLong(i * 16 + 4)
          val gidx = bb.getInt(i * 16 + 12)
          if (len == 0 || gaddr == 0) ""
          else new String(
            globalHeapObject(gaddr, gidx, p), 0, len, "UTF-8")
        }
      case c => throw new UnsupportedOperationException(
        s"$path/$p: not a string dataset (datatype class $c)")
    }
  }

  /** Variable-length SEQUENCE dataset (datatype class 9, any base
    * type): raw payload bytes per element, resolved through the same
    * 16-byte (length, GCOL address, index) descriptors as vlen
    * strings. `length` counts BASE-TYPE elements, so the byte size is
    * length × base-size. This is the PyTables `VLArray` shape —
    * pandas fixed-format object blocks store one pickled payload as
    * element 0 of a 1-element vlen-of-uint8 dataset. */
  def readVlenBytes(p: String): Array[Array[Byte]] = {
    val ds = dataset(p)
    require(ds.dtype.clazz == 9,
      s"$path/$p: not a vlen dataset (datatype class ${ds.dtype.clazz})")
    val bytes = readBytes(p, ds)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(ds.n.toInt) { i =>
      val len = bb.getInt(i * 16)
      val gaddr = bb.getLong(i * 16 + 4)
      val gidx = bb.getInt(i * 16 + 12)
      if (len == 0 || gaddr == 0) Array.emptyByteArray
      else {
        // len counts base-type elements; with a 1-byte base (the only
        // caller shape — PyTables uint8 VLArray) it is the byte count.
        // Heap objects are 8-padded, so trim to len.
        val obj = globalHeapObject(gaddr, gidx, p)
        if (obj.length == len) obj else java.util.Arrays.copyOf(obj, len)
      }
    }
  }

  /** vaex/Arrow-style string column: a `data` byte dataset + an
    * `indices` offsets dataset (n+1 entries) under `columnGroup`. */
  def readArrowStrings(columnGroup: String): Array[String] = {
    val chars = readBytes(s"$columnGroup/data")
    val offs = readLongs(s"$columnGroup/indices")
    Array.tabulate(offs.length - 1) { i =>
      new String(chars, offs(i).toInt, (offs(i + 1) - offs(i)).toInt, "UTF-8")
    }
  }
}

object Hdf5File {

  /** Element type of the supported subset. `string` is FIXED-length
    * (`size` bytes, NUL-trimmed); integers are LE, signedness tracked. */
  /** One member of a compound (class 6) datatype: byte offset inside
    * the record, flattened element dims (from a class-10 array member
    * or v1 inline dims; scalar = Nil), and the SCALAR element dtype. */
  final case class CompoundMember(
      name: String, offset: Int, dims: Seq[Int], dtype: Dtype)

  final case class Dtype(clazz: Int, size: Int, signed: Boolean,
      bigEndian: Boolean = false)

  final case class Dataset(
      dims: Seq[Long],
      dtype: Dtype,
      private[sources] val layout: Layout,
      private[sources] val filters: Seq[(Int, Array[Int])]) {
    def n: Long = dims.product
  }

  private[sources] sealed trait Layout
  private[sources] case class Compact(data: Array[Byte]) extends Layout
  private[sources] case class Contiguous(addr: Long, size: Long) extends Layout
  private[sources] case class Chunked(btree: Long, chunkDims: Seq[Int])
    extends Layout
}
