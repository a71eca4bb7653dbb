package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}

/** Deletion-vector codec for the open Delta protocol — the row-level
  * delete mechanism every current Delta writer produces by default, and
  * the #1 interop wall for a reader that refuses them (the reference's
  * tables, /root/reference/databricks_DW/02_create_tables.sql:3-184
  * `USING DELTA`, carry them on a modern runtime). Implemented from the
  * published format specs only:
  *
  *   - descriptor (`add.deletionVector`): `storageType` `u` (relative
  *     file, Z85-coded UUID name), `p` (absolute path), or `i` (inline
  *     Z85 payload); `offset` into the sidecar; `sizeInBytes` of the
  *     serialized bitmap; `cardinality` = deleted-row count.
  *   - sidecar file: version byte, then per-DV frames of
  *     `<size: int32 BE><bitmap: size bytes><CRC-32 of bitmap: int32 BE>`.
  *   - bitmap: "portable" RoaringBitmapArray — little-endian magic
  *     1681511377, an int64 count of 32-bit roaring bitmaps (the array
  *     index is the high 32 bits of the row index), each in the standard
  *     interoperable roaring format (array / bitmap / run containers).
  *   - Z85: the ZeroMQ base-85 alphabet, 4 bytes → 5 chars, big-endian.
  *
  * Scale: a DV is read ONCE on the driver (bounded by `sizeInBytes`,
  * KBs–MBs for millions of deletes thanks to roaring compression) and
  * broadcast; the row filter itself runs distributed against the
  * parquet scan's `_metadata.row_index`.
  */
object DeletionVectors {

  /** `add.deletionVector` descriptor (protocol field names). */
  case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  // ------------------------------------------------------------------ Z85

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decoder: Array[Int] = {
    val d = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode, zero-padding to the 4-byte group boundary (the
    * protocol's Base85 handling: the decoder truncates back using the
    * descriptor's `sizeInBytes`). */
  def z85Encode(raw: Array[Byte]): String = {
    val bytes =
      if (raw.length % 4 == 0) raw
      else java.util.Arrays.copyOf(raw, raw.length + (4 - raw.length % 4))
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (bytes(i + j) & 0xffL))
      var div = 85L * 85 * 85 * 85
      while (div >= 1) { sb.append(z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input must be 5-char aligned: ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Decoder(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
      }
      val o = i / 5 * 4
      (0 until 4).foreach(j => out(o + j) = ((v >>> (8 * (3 - j))) & 0xff).toByte)
      i += 5
    }
    out
  }

  // -------------------------------------------- 32-bit roaring (portable)

  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val NoOffsetThreshold = 4
  private val ArrayMaxCardinality = 4096
  private val ArrayMagic = 1681511377 // RoaringBitmapArray portable magic

  /** Standard-format 32-bit roaring bitmap → sorted distinct values
    * (as unsigned ints in a Long), appended to `out` offset by `base`. */
  private def readRoaring32(buf: ByteBuffer, base: Long,
      out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    val cookie = buf.getInt()
    var runBitset: Array[Byte] = null
    val size =
      if ((cookie & 0xffff) == CookieRun) {
        val n = (cookie >>> 16) + 1
        runBitset = new Array[Byte]((n + 7) / 8)
        buf.get(runBitset)
        n
      } else {
        require(cookie == CookieNoRun, s"unrecognized roaring cookie $cookie")
        buf.getInt()
      }
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    (0 until size).foreach { i =>
      keys(i) = buf.getShort() & 0xffff
      cards(i) = (buf.getShort() & 0xffff) + 1
    }
    if (runBitset == null || size >= NoOffsetThreshold)
      buf.position(buf.position() + 4 * size) // offset header (unused: sequential read)
    (0 until size).foreach { i =>
      val hi = base | (keys(i).toLong << 16)
      val isRun = runBitset != null && (runBitset(i / 8) & (1 << (i % 8))) != 0
      if (isRun) {
        val nRuns = buf.getShort() & 0xffff
        (0 until nRuns).foreach { _ =>
          val start = buf.getShort() & 0xffff
          val len = buf.getShort() & 0xffff // stored as length - 1
          (start to start + len).foreach(v => out += (hi | v))
        }
      } else if (cards(i) <= ArrayMaxCardinality) {
        (0 until cards(i)).foreach(_ => out += (hi | (buf.getShort() & 0xffff)))
      } else {
        (0 until 1024).foreach { w =>
          var word = buf.getLong()
          while (word != 0L) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            out += (hi | (w * 64 + bit))
            word &= word - 1
          }
        }
      }
    }
  }

  /** Portable RoaringBitmapArray → sorted deleted row indexes. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == ArrayMagic,
      s"unrecognized deletion-vector bitmap magic $magic (want $ArrayMagic)")
    val n = buf.getLong()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0L until n).foreach(i => readRoaring32(buf, i << 32, out))
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** Sorted-or-not row indexes → portable RoaringBitmapArray bytes
    * (no-run layout: array containers, bitmap containers above 4096 —
    * every standard reader accepts it). Powers the spec fixtures and a
    * future row-level DELETE writer. */
  def serialize(values: Array[Long]): Array[Byte] = {
    val sorted = values.distinct.sorted
    require(sorted.headOption.forall(_ >= 0), "row indexes must be >= 0")
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    val chunks = sorted.groupBy(_ >>> 32) // high 32 bits → 32-bit bitmap index
    val bos = new java.io.ByteArrayOutputStream()
    def putIntLE(v: Int): Unit =
      bos.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def putShortLE(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    putIntLE(ArrayMagic)
    bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(nBitmaps).array())
    (0L until nBitmaps).foreach { b =>
      val vals = chunks.getOrElse(b, Array.empty[Long]).map(v => (v & 0xffffffffL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      putIntLE(CookieNoRun)
      putIntLE(byKey.size)
      byKey.foreach { case (k, vs) => putShortLE(k); putShortLE(vs.length - 1) }
      // offset header: position of each container from the stream start
      var pos = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        putIntLE(pos)
        pos += (if (vs.length <= ArrayMaxCardinality) 2 * vs.length else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.length <= ArrayMaxCardinality) vs.sorted.foreach(v => putShortLE(v & 0xffff))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v => val low = v & 0xffff; words(low / 64) |= 1L << (low % 64) }
          words.foreach { w =>
            bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(w).array())
          }
        }
      }
    }
    bos.toByteArray
  }

  // ------------------------------------------------------- sidecar files

  private def uuidOf(z85: String): java.util.UUID = {
    val b = ByteBuffer.wrap(z85Decode(z85))
    new java.util.UUID(b.getLong(), b.getLong())
  }

  /** Resolve a `u`-type descriptor's sidecar path: the trailing 20 chars
    * are the Z85 UUID, anything before is the random directory prefix. */
  private[sources] def sidecarPath(table: String, pathOrInlineDv: String): Path = {
    require(pathOrInlineDv.length >= 20,
      s"malformed deletion-vector path '$pathOrInlineDv' (need 20-char Z85 UUID)")
    val prefix = pathOrInlineDv.dropRight(20)
    val uuid = uuidOf(pathOrInlineDv.takeRight(20))
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) new Path(table, name)
    else new Path(new Path(table, prefix), name)
  }

  /** Load + verify one DV's deleted row indexes (sorted). Inline DVs
    * decode directly; file-backed DVs read the framed slice at `offset`
    * and verify the CRC-32 — a torn sidecar must fail loudly, never
    * resurrect or over-delete rows. */
  def deletedRows(fsys: FileSystem, table: String, d: Descriptor): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv).take(d.sizeInBytes) // drop group padding
      case "u" | "p" =>
        val p =
          if (d.storageType == "p") new Path(d.pathOrInlineDv)
          else sidecarPath(table, d.pathOrInlineDv)
        val in = fsys.open(p)
        try {
          in.seek(d.offset.getOrElse(1).toLong)
          val sizeBuf = new Array[Byte](4)
          in.readFully(sizeBuf)
          val size = ByteBuffer.wrap(sizeBuf).getInt() // big-endian per spec
          require(size == d.sizeInBytes,
            s"deletion-vector size mismatch at $p: frame says $size, descriptor ${d.sizeInBytes}")
          val buf = new Array[Byte](size)
          in.readFully(buf)
          val crcBuf = new Array[Byte](4)
          in.readFully(crcBuf)
          val want = ByteBuffer.wrap(crcBuf).getInt()
          val crc = new CRC32(); crc.update(buf)
          require(crc.getValue.toInt == want,
            s"deletion-vector checksum mismatch at $p — refusing to apply a torn bitmap")
          buf
        } finally in.close()
      case other => sys.error(s"unsupported deletion-vector storageType '$other'")
    }
    val rows = deserialize(data)
    require(rows.length.toLong == d.cardinality,
      s"deletion-vector cardinality mismatch: bitmap has ${rows.length}, " +
        s"descriptor says ${d.cardinality}")
    rows
  }

  /** Write several already-serialized bitmaps as consecutive frames of
    * ONE `u`-type sidecar under `table` — the writer half of the format,
    * powering [[graft.sources.DeltaLog.deleteWhere]]: a DELETE touching
    * N files emits one sidecar with N frames, not N files. Returns one
    * descriptor per payload (same `pathOrInlineDv`, distinct offsets;
    * each offset points at the frame's size prefix, matching
    * [[deletedRows]]'s read). `payloads` are (bitmap bytes, cardinality). */
  def writeDvFrames(fsys: FileSystem, table: String,
      payloads: Seq[(Array[Byte], Long)]): Seq[Descriptor] = {
    require(payloads.nonEmpty, "writeDvFrames needs at least one payload")
    val uuid = java.util.UUID.randomUUID()
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val z85 = z85Encode(uuidBytes)
    val out = fsys.create(sidecarPath(table, z85), false)
    val descs = Seq.newBuilder[Descriptor]
    try {
      out.write(1) // format version byte; first frame lands at offset 1
      var pos = 1
      payloads.foreach { case (data, card) =>
        descs += Descriptor("u", z85, Some(pos), data.length, card)
        out.write(ByteBuffer.allocate(4).putInt(data.length).array()) // BE size
        out.write(data)
        val crc = new CRC32(); crc.update(data)
        out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()) // BE crc
        pos += 4 + data.length + 4
      }
    } finally out.close()
    descs.result()
  }

  /** Single-DV convenience over [[writeDvFrames]] (spec fixtures). */
  def writeDvFile(fsys: FileSystem, table: String, values: Array[Long]): Descriptor =
    writeDvFrames(fsys, table,
      Seq((serialize(values), values.distinct.length.toLong))).head
}
