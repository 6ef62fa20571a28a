package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal pickle decoder for the ONE object shape pandas fixed-format
  * HDF5 stores as pickled bytes: a numpy `object`-dtype ndarray of
  * strings (pandas `io/pytables.py` `write_array` routes object blocks
  * through a PyTables `VLArray(ObjectAtom)`, whose payload is
  * `pickle.dumps(block_values.T, HIGHEST_PROTOCOL)`).
  *
  * This is NOT a general unpickler — no class instantiation, no
  * imports, no side effects. Globals are kept symbolic ([[PGlobal]]),
  * REDUCE produces inert [[PReduced]] nodes, and [[objectNdArray]]
  * pattern-matches the single expected `numpy._reconstruct` + BUILD
  * shape (verified against CPython 3.11 / numpy 1.26 and the numpy 2
  * `numpy._core` module rename). Anything else fails loudly — a
  * malformed or unexpected payload can never execute anything.
  *
  * Opcode subset: protocols 2–5 as emitted by `pickle.dumps` without
  * out-of-band buffers (PyTables never passes `buffer_callback`).
  */
object PandasPickle {

  /** Symbolic `GLOBAL` / `STACK_GLOBAL` reference — never imported. */
  final case class PGlobal(module: String, name: String)

  /** Inert `REDUCE` result: callable + args, `state` set by BUILD. */
  final class PReduced(val callable: Any, val args: Vector[Any]) {
    var state: Any = null
  }

  private final class Mark // stack sentinel for MARK

  /** Decode `bytes` into the pickle's root object (inert model). */
  def load(bytes: Array[Byte]): Any = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[Any]
    val memo = mutable.ArrayBuffer.empty[Any]
    def push(v: Any): Unit = stack += v
    def pop(): Any = { val v = stack.last; stack.dropRightInPlace(1); v }
    def popToMark(): Vector[Any] = {
      var i = stack.length - 1
      while (i >= 0 && !stack(i).isInstanceOf[Mark]) i -= 1
      require(i >= 0, "pickle: no MARK on stack")
      val items = stack.slice(i + 1, stack.length).toVector
      stack.dropRightInPlace(stack.length - i)
      items
    }
    def readBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); bb.get(a); a
    }
    def utf8(n: Int): String = new String(readBytes(n), "UTF-8")
    def line(): String = { // newline-terminated arg (GLOBAL, protocol<4)
      val sb = new StringBuilder
      var c = bb.get()
      while (c != '\n') { sb.append(c.toChar); c = bb.get() }
      sb.toString
    }

    var done = false
    var result: Any = null
    while (!done) {
      require(bb.hasRemaining, "pickle: truncated stream")
      (bb.get() & 0xFF) match {
        case 0x80 => bb.get() // PROTO
        case 0x95 => bb.getLong // FRAME (length; framing is advisory)
        case '.' => result = pop(); done = true // STOP
        case 'N' => push(null) // NONE
        case 0x88 => push(true) // NEWTRUE
        case 0x89 => push(false) // NEWFALSE
        case 'K' => push((bb.get() & 0xFF).toLong) // BININT1
        case 'M' => push((bb.getShort & 0xFFFF).toLong) // BININT2
        case 'J' => push(bb.getInt.toLong) // BININT (signed LE32)
        case 0x8A => // LONG1: n bytes little-endian two's-complement
          val n = bb.get() & 0xFF
          val raw = readBytes(n)
          push(if (n == 0) 0L else BigInt(raw.reverse).toLong)
        case 'G' => // BINFLOAT: big-endian float64
          val raw = readBytes(8)
          push(ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN).getDouble)
        case 0x8C => push(utf8(bb.get() & 0xFF)) // SHORT_BINUNICODE
        case 'X' => push(utf8(bb.getInt)) // BINUNICODE
        case 0x8D => push(utf8(bb.getLong.toInt)) // BINUNICODE8
        case 'C' => push(readBytes(bb.get() & 0xFF)) // SHORT_BINBYTES
        case 'B' => push(readBytes(bb.getInt)) // BINBYTES
        case 0x8E => push(readBytes(bb.getLong.toInt)) // BINBYTES8
        case 'U' => push(utf8(bb.get() & 0xFF)) // SHORT_BINSTRING
        case 'T' => push(utf8(bb.getInt)) // BINSTRING
        case 0x94 => memo += stack.last // MEMOIZE
        case 'q' => // BINPUT
          val i = bb.get() & 0xFF
          while (memo.length <= i) memo += null
          memo(i) = stack.last
        case 'r' => // LONG_BINPUT
          val i = bb.getInt
          while (memo.length <= i) memo += null
          memo(i) = stack.last
        case 'h' => push(memo(bb.get() & 0xFF)) // BINGET
        case 'j' => push(memo(bb.getInt)) // LONG_BINGET
        case 'c' => push(PGlobal(line(), line())) // GLOBAL
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val module = pop()
          push(PGlobal(module.asInstanceOf[String],
            name.asInstanceOf[String]))
        case '(' => push(new Mark) // MARK
        case ')' => push(Vector.empty[Any]) // EMPTY_TUPLE
        case 0x85 => push(Vector(pop())) // TUPLE1
        case 0x86 => // TUPLE2
          val b2 = pop(); val a2 = pop(); push(Vector(a2, b2))
        case 0x87 => // TUPLE3
          val c3 = pop(); val b3 = pop(); val a3 = pop()
          push(Vector(a3, b3, c3))
        case 't' => push(popToMark()) // TUPLE
        case ']' => push(mutable.ArrayBuffer.empty[Any]) // EMPTY_LIST
        case 'a' => // APPEND
          val v = pop()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v
        case 'e' => // APPENDS
          val items = popToMark()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items
        case '}' => push(mutable.LinkedHashMap.empty[Any, Any]) // EMPTY_DICT
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]](k) = v
        case 'u' => // SETITEMS
          val items = popToMark()
          val m = stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
          items.grouped(2).foreach { kv => m(kv(0)) = kv(1) }
        case 'R' => // REDUCE — inert: record callable + args
          val args = pop(); val callable = pop()
          push(new PReduced(callable, args.asInstanceOf[Vector[Any]]))
        case 0x81 => // NEWOBJ — same inert treatment as REDUCE
          val args = pop(); val cls = pop()
          push(new PReduced(cls, args.asInstanceOf[Vector[Any]]))
        case 'b' => // BUILD
          val state = pop()
          stack.last match {
            case r: PReduced => r.state = state
            case other => throw new UnsupportedOperationException(
              s"pickle: BUILD on ${other.getClass.getName}")
          }
        case op => throw new UnsupportedOperationException(
          f"pickle: opcode 0x$op%02x outside the pandas-HDF subset")
      }
    }
    result
  }

  private def isNdReconstruct(r: PReduced): Boolean = r.callable match {
    case PGlobal(m, "_reconstruct") =>
      m == "numpy.core.multiarray" || m == "numpy._core.multiarray"
    case _ => false
  }

  /** Decode a pickled numpy OBJECT ndarray: returns (shape, elements in
    * C order of that shape). Elements: String stays String; None and
    * float NaN (pandas missing markers) become null; anything else
    * fails loudly. numpy stores object-array state data as a flat
    * Python list in C index order of the stored shape (the fortran
    * flag applies to buffer-backed dtypes only — verified empirically
    * against CPython). */
  def objectNdArray(bytes: Array[Byte]): (Seq[Int], Array[String]) = {
    val root = load(bytes)
    val r = root match {
      case r: PReduced if isNdReconstruct(r) => r
      case other => throw new UnsupportedOperationException(
        s"pickle: expected numpy _reconstruct root, got $other")
    }
    r.state match {
      case Vector(_, shape: Vector[_], _, _, data: mutable.ArrayBuffer[_]) =>
        val dims = shape.map {
          case l: Long => l.toInt
          case x => throw new IllegalStateException(s"bad dim $x")
        }
        require(data.length == dims.product,
          s"pickle: ${data.length} elements for shape $dims")
        val out = data.map {
          case s: String => s
          case null => null
          case d: Double if d.isNaN => null
          case other => throw new UnsupportedOperationException(
            s"pickle: non-string object element " +
              s"(${other.getClass.getName}) — only string object " +
              "columns are supported in pandas fixed format")
        }.toArray
        (dims, out)
      case st => throw new UnsupportedOperationException(
        s"pickle: unexpected ndarray state shape: $st")
    }
  }
}
