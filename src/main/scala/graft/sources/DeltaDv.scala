package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import java.util.zip.CRC32

import graft.core.GraftError

/** Delta Lake deletion-vector storage (delta.io PROTOCOL.md
  * "Deletion Vectors"): row indexes marked deleted within a data file,
  * stored OUTSIDE the file so a DELETE is a metadata-plus-bitmap write
  * instead of a copy-on-write rewrite (merge-on-read — the lakehouse
  * twin of the Iceberg v3 DV path in [[Puffin]]).
  *
  * On-disk layout implemented here, constants per the public spec and
  * delta-spark's `RoaringBitmapArray`/`DeletionVectorStore`:
  *  - DV FILE (`deletion_vector_<uuid>.bin`): 1 version byte (=1),
  *    then each stored vector at its descriptor offset as
  *    `i32 BE dataSize | data | i32 BE CRC-32(data)`.
  *  - `data` = RoaringBitmapArray "portable" serialization:
  *    `i32 LE magic 1681511376 | i64 LE bitmap count |` per bitmap
  *    `i32 LE key (high 32 bits) | standard portable 32-bit roaring`
  *    — the bucket layout is byte-identical to the portable roaring64
  *    encoder already proven in [[Puffin]], so both table formats
  *    share one container codec.
  *  - descriptor `pathOrInlineDv` for storageType "u" = optional
  *    directory prefix + Z85(uuid) (20 chars for 16 bytes).
  */
object DeltaDv {

  /** delta-spark RoaringBitmapArray.MAGIC_NUMBER. */
  val PortableMagic: Int = 1681511376
  val FileFormatVersion: Byte = 1

  // ------------------------------------------------------------- Z85

  private val Z85: Array[Char] =
    ("0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#").toCharArray
  private val Z85Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }

  /** ZeroMQ Z85: every 4 bytes → 5 chars (input length must be ÷4). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 input length ${bytes.length} not divisible by 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 text length ${s.length} not divisible by 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Inv(c.toInt) else -1
        if (d < 0) throw GraftError.Plan(s"delta dv: invalid z85 character '$c'")
        v = v * 85 + d; j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  def encodeUuid(u: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits); bb.putLong(u.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def decodeUuid(s: String): UUID = {
    val bytes = z85Decode(s)
    if (bytes.length != 16)
      throw GraftError.Plan(s"delta dv: uuid payload is ${bytes.length} bytes, want 16")
    val bb = ByteBuffer.wrap(bytes)
    new UUID(bb.getLong(), bb.getLong())
  }

  // ----------------------------------------------------- bitmap codec

  /** RoaringBitmapArray portable bytes for sorted distinct positions. */
  def serializeBitmapArray(sorted: Array[Long]): Array[Byte] = {
    val body = Puffin.serializeRoaring64(sorted)
    val bb = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(PortableMagic); bb.put(body)
    bb.array()
  }

  def deserializeBitmapArray(data: Array[Byte], where: String): Array[Long] = {
    if (data.length < 4)
      throw GraftError.Plan(s"delta dv: $where: truncated bitmap payload")
    val magic = ByteBuffer.wrap(data, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt()
    if (magic != PortableMagic)
      throw GraftError.Plan(
        s"delta dv: $where: portable magic mismatch ($magic != $PortableMagic)")
    Puffin.deserializeRoaring64(java.util.Arrays.copyOfRange(data, 4, data.length),
      where).toArray
  }

  // -------------------------------------------------------- file IO

  final case class StoredDv(offset: Long, sizeInBytes: Long, cardinality: Long)

  /** Write ONE `deletion_vector_<uuid>.bin` under the table root
    * holding every per-file vector of a commit (the delta-spark
    * packing), staged then atomically moved. Returns the descriptor
    * `pathOrInlineDv` (Z85 uuid, no prefix) and per-vector
    * offset/size/cardinality in input order. */
  def writeDvFile(tableDir: String, vectors: Seq[Array[Long]]): (String, Seq[StoredDv]) = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(FileFormatVersion.toInt)
    val stored = vectors.map { v =>
      val sorted = v.distinct.sorted
      val data = serializeBitmapArray(sorted)
      val offset = bos.size().toLong
      val head = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length)
      bos.write(head.array())
      bos.write(data)
      val crc = new CRC32(); crc.update(data)
      val tail = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt)
      bos.write(tail.array())
      StoredDv(offset, data.length.toLong, sorted.length.toLong)
    }
    // Content-address the file name over the FULL serialized payload: a
    // superseding delete that keeps the same first positions (e.g. merged
    // old ∪ new vectors) must land in a DIFFERENT file, or the atomic move
    // would destroy the still-referenced previous DV before its commit is
    // superseded (and before publishCommit even wins the race). With the
    // full payload in the name, a collision implies identical bytes, so an
    // ATOMIC_MOVE overwrite is harmless by construction.
    val payload = bos.toByteArray
    val uuid = UUID.nameUUIDFromBytes(payload) // deterministic, content-addressed
    val name = s"deletion_vector_$uuid.bin"
    val tmp = Files.createTempFile(Paths.get(tableDir), ".dv-", ".bin.tmp")
    Files.write(tmp, payload)
    Files.move(tmp, Paths.get(tableDir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    (encodeUuid(uuid), stored)
  }

  /** Resolve a storageType="u" pathOrInlineDv to the DV file path:
    * the final 20 chars are the Z85 uuid, anything before is a
    * directory prefix. */
  def dvFilePath(tableDir: String, pathOrInlineDv: String): Path = {
    if (pathOrInlineDv.length < 20)
      throw GraftError.Plan(
        s"delta dv: pathOrInlineDv '$pathOrInlineDv' shorter than a z85 uuid")
    val uuid = decodeUuid(pathOrInlineDv.takeRight(20))
    val prefix = pathOrInlineDv.dropRight(20)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) Paths.get(tableDir, name)
    else Paths.get(tableDir, prefix, name)
  }

  /** Read + validate one stored vector (version byte, size bound,
    * CRC-32, portable magic) and return its positions. */
  def readDv(tableDir: String, storageType: String, pathOrInlineDv: String,
      offset: Long, sizeInBytes: Long): Array[Long] = {
    if (storageType != "u")
      throw GraftError.Plan(
        s"delta dv: storageType '$storageType' not supported (this reader " +
          "implements 'u' relative-file vectors; 'i' inline and 'p' absolute " +
          "are refused typed rather than misread)")
    val path = dvFilePath(tableDir, pathOrInlineDv)
    val bytes = Files.readAllBytes(path)
    if (bytes.isEmpty || bytes(0) != FileFormatVersion)
      throw GraftError.Plan(s"delta dv: $path: unsupported DV file version")
    if (offset < 1 || offset + 4 + sizeInBytes + 4 > bytes.length)
      throw GraftError.Plan(s"delta dv: $path: vector at $offset out of bounds")
    val bb = ByteBuffer.wrap(bytes, offset.toInt, (4 + sizeInBytes + 4).toInt)
      .order(ByteOrder.BIG_ENDIAN)
    val declared = bb.getInt()
    if (declared.toLong != sizeInBytes)
      throw GraftError.Plan(
        s"delta dv: $path: stored size $declared != descriptor $sizeInBytes")
    val data = new Array[Byte](declared); bb.get(data)
    val storedCrc = bb.getInt()
    val crc = new CRC32(); crc.update(data)
    if (crc.getValue.toInt != storedCrc)
      throw GraftError.Plan(s"delta dv: $path: CRC mismatch — refuse a torn vector")
    deserializeBitmapArray(data, path.toString)
  }
}
