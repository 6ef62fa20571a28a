package graft.sources

import java.io.{EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** POSIX ustar shard egest/ingest — the WebDataset layout
  * (github.com/webdataset/webdataset): a training corpus shipped as
  * `.tar` shards whose members group into samples by key prefix
  * (`{key}.txt`, `{key}.json`, `{key}.jpg`, …), consumed sequentially
  * by data loaders at full disk bandwidth with no random IO. This is
  * the interchange format multimodal training pipelines actually eat,
  * next to the WET/WAT crawl surface.
  *
  * Pure JVM, from the POSIX.1-1988/ustar spec: 512-byte headers
  * (octal size/mtime, checksum stored as six octal digits + NUL +
  * space computed over a space-filled checksum field, NUL-terminated
  * `ustar` magic + version `00`), data in zero-padded 512-byte
  * blocks, two zero blocks at end-of-archive. Foreign numeric fields
  * with leading NUL/space padding parse tolerantly; an all-pad field
  * fails loudly with offset context. Member names are capped
  * at the 100-byte name field — the prefix field is NOT written and
  * rejected on read (loud; WebDataset keys are short by construction).
  *
  * Scale shape: the writer is one file per non-empty partition under
  * the WET writer's commit protocol (attempt-unique temp + atomic
  * rename, non-empty dir refusal); the reader is one shard per task
  * ([[Warc.readWarcFiles]]'s unit of parallelism — tar is
  * sequential), streaming block-by-block with the fd closed by a
  * task-completion listener. */
object Tar {

  private val BlockSize = 512

  /** One framed ustar member: header block + zero-padded data. */
  def frameMember(name: String, data: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes(StandardCharsets.UTF_8)
    require(nameB.length <= 100,
      s"tar member name exceeds the 100-byte ustar name field: $name")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.ISO_8859_1)
      System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    put(100, "0000644\u0000") // mode
    put(108, "0000000\u0000") // uid
    put(116, "0000000\u0000") // gid
    put(124, f"${data.length}%011o" + "\u0000") // size, octal
    put(136, "00000000000\u0000") // mtime: epoch (deterministic shards)
    put(156, "0") // typeflag: regular file
    put(257, "ustar\u0000") // magic
    put(263, "00") // version
    // checksum: computed with the checksum field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xFF; i += 1 }
    put(148, f"$sum%06o" + "\u0000 ")
    val padded = (data.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    System.arraycopy(h, 0, out, 0, BlockSize)
    System.arraycopy(data, 0, out, BlockSize, data.length)
    out
  }

  /** Lazily parse a tar stream into (name, bytes) members. Malformed
    * headers (bad magic, bad checksum, truncated data) fail loudly
    * with offset context — a silently skipped member is corpus loss. */
  def members(in: InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextM: (String, Array[Byte]) = null
      private var done = false
      private var offset = 0L

      private def readFully(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) throw new EOFException(
            s"tar truncated at byte ${offset + off}: expected $n more")
          off += r
        }
        offset += n
        buf
      }

      /** Numeric header field: octal digits, tolerating leading
        * NUL/space padding (a common historical encoding in foreign
        * tars, e.g. " 12345\0 " — ADVICE r12); no digits at all is
        * the loud offset-context failure, not a NumberFormatException. */
      private def octalField(h: Array[Byte], off: Int, len: Int,
          field: String): Long = {
        val s = new String(h, off, len, StandardCharsets.ISO_8859_1)
        val digits = s.dropWhile(c => c == ' ' || c == '\u0000')
          .takeWhile(c => c >= '0' && c <= '7')
        require(digits.nonEmpty, s"tar@${offset - BlockSize}: " +
          s"unparseable octal $field field")
        java.lang.Long.parseLong(digits, 8)
      }

      private def advance(): Unit = {
        if (done) return
        val h = readFully(BlockSize)
        if (h.forall(_ == 0)) { done = true; return } // end-of-archive
        val magic = new String(h, 257, 5, StandardCharsets.ISO_8859_1)
        require(magic == "ustar",
          s"tar@${offset - BlockSize}: bad magic '$magic'")
        // verify the checksum (field read as spaces)
        val stored = octalField(h, 148, 8, "checksum")
        val copy = h.clone()
        java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
        var sum = 0; var i = 0
        while (i < BlockSize) { sum += copy(i) & 0xFF; i += 1 }
        require(sum == stored,
          s"tar@${offset - BlockSize}: checksum $sum != stored $stored")
        var nameEnd = 0
        while (nameEnd < 100 && h(nameEnd) != 0) nameEnd += 1
        val name = new String(h, 0, nameEnd, StandardCharsets.UTF_8)
        require(h(345) == 0,
          s"tar@${offset - BlockSize}: prefix field in use — long " +
            "paths are outside the writer's contract")
        val size = octalField(h, 124, 12, "size")
        require(size <= Int.MaxValue,
          s"tar member of $size bytes exceeds the JVM array cap")
        val padded = (size + BlockSize - 1) / BlockSize * BlockSize
        val block = readFully(padded.toInt)
        val tpe = h(156).toChar
        val data = java.util.Arrays.copyOfRange(block, 0, size.toInt)
        // GNU long-name/long-link ('L'/'K') and PAX extended headers
        // ('x'/'g') REDEFINE the following member's metadata: skipping
        // them like a directory would silently attach a truncated name
        // to the next member — corpus mislabeling, the exact silent
        // failure this reader exists to refuse (r13)
        require(tpe != 'L' && tpe != 'K' && tpe != 'x' && tpe != 'g',
          s"tar@${offset - padded - BlockSize}: extension header " +
            s"typeflag '$tpe' (GNU long name / PAX) is outside the " +
            "writer's contract — long paths are not supported")
        if (tpe == '0' || tpe == 0.toChar) nextM = (name, data)
        else advance() // directories/links: skip, keep streaming
      }

      def hasNext: Boolean = {
        if (nextM == null && !done) advance()
        nextM != null
      }
      def next(): (String, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException("end of tar")
        val m = nextM; nextM = null; m
      }
    }

  /** Rows from [[readTarShards]]: one per member; `key`/`ext` split
    * at the FIRST dot of the basename (the WebDataset sample-grouping
    * rule: `{key}.{ext}` where ext may itself be dotted). */
  val schema: StructType = StructType(Seq(
    StructField("tar_file", StringType, nullable = false),
    StructField("member_idx", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Distributed shard read: one tar per task, streamed; content is
    * raw bytes (text members decode downstream with
    * `decode(content, 'UTF-8')` — members are not all text). */
  def readTarShards(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "no tar shards to read")
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.size)
      .flatMap { path =>
        val raw = new java.io.FileInputStream(path)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ => raw.close())
        val in = new java.io.BufferedInputStream(raw, 1 << 16)
        var idx = -1L
        members(in).map { case (name, data) =>
          idx += 1
          val dot = name.indexOf('.')
          val (key, ext) =
            if (dot < 0) (name, "") else
              (name.substring(0, dot), name.substring(dot + 1))
          Row(path, idx, key, ext, data.length.toLong, data)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Distributed WebDataset-style shard write: one `part-NNNNN.tar`
    * per non-empty partition under `dir`; each row becomes the sample
    * `{key}.txt` + `{key}.json` (json skipped when null — a sample
    * need not carry every extension). Same commit protocol as
    * [[Warc.writeWetFiles]]: empty-dir refusal, attempt-unique temp,
    * atomic rename. */
  def writeTarShards(
      df: DataFrame,
      dir: String,
      keyCol: String = "key",
      textCol: String = "text",
      jsonCol: String = "json"): Unit =
    writeTarMembers(df, dir, keyCol,
      Seq("txt" -> textCol, "json" -> jsonCol))

  /** General member form: one `{key}.{ext}` member per (ext, column)
    * pair and row — BINARY columns write their raw bytes (the
    * multimodal WebDataset shape: `{key}.jpg` next to `{key}.json`),
    * everything else casts to string and writes UTF-8; null member
    * values are skipped. */
  def writeTarMembers(
      df: DataFrame,
      dir: String,
      keyCol: String,
      members: Seq[(String, String)]): Unit = {
    require(members.nonEmpty, "at least one (ext, column) member")
    val dirPath = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(dirPath)
    val existing = java.nio.file.Files.list(dirPath)
    try require(!existing.findFirst().isPresent,
      s"tar output dir $dir is not empty — refusing to mix runs")
    finally existing.close()
    val binary: Seq[Boolean] = members.map { case (_, c) =>
      df.schema(c).dataType == BinaryType
    }
    val exts = members.map(_._1)
    df.select(df.col(keyCol).cast(StringType) +:
        members.zip(binary).map { case ((_, c), isBin) =>
          if (isBin) df.col(c) else df.col(c).cast(StringType)
        }: _*)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val finalPath = java.nio.file.Paths.get(
            f"$dir/part-$pid%05d.tar")
          val tmpPath = java.nio.file.Paths.get(
            f"$dir/.part-$pid%05d.attempt-${tc.taskAttemptId()}.tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmpPath.toFile), 1 << 16)
          var committed = false
          try {
            it.foreach { r =>
              val key = r.getString(0)
              exts.indices.foreach { i =>
                if (!r.isNullAt(1 + i)) {
                  val bytes =
                    if (binary(i)) r.getAs[Array[Byte]](1 + i)
                    else r.getString(1 + i)
                      .getBytes(StandardCharsets.UTF_8)
                  out.write(frameMember(s"$key.${exts(i)}", bytes))
                }
              }
            }
            out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
            out.close()
            java.nio.file.Files.move(tmpPath, finalPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            committed = true
          } finally {
            if (!committed) {
              out.close()
              java.nio.file.Files.deleteIfExists(tmpPath)
            }
          }
        }
      }
  }
}
