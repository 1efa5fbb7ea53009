package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's user-visible vector compress/decompress verbs
  * (Neighborly/VectorCompression.cs:13-55 `ToCompressedBinary` /
  * `FromCompressedBinary`, backed by the native fpzip library,
  * FpZipCompression.cs:1-9), re-expressed without native bindings.
  *
  * Engine STORAGE stays Parquet-native (column codecs subsume fpzip for
  * at-rest data — declared platform substitution, SURVEY §2.1); these
  * verbs exist for the wire/API surface the reference exposes: a
  * self-contained lossless byte[] per vector.
  *
  * Codec: byte-stream split (group byte 0 of every float, then byte 1, …
  * — the same transform Parquet's BYTE_STREAM_SPLIT encoding uses, which
  * lines up IEEE-754 sign/exponent bytes so they compress) + Deflate.
  * Bit-exact round-trip for every value including NaN payloads, ±Inf and
  * -0.0. Layout: [int32 BE length][deflate(transposed bytes)].
  */
object VectorCompression {

  def compress(values: Array[Float]): Array[Byte] = {
    val n = values.length
    val raw = new Array[Byte](n * 4)
    // byte-stream split: stream b holds byte b of every float
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToRawIntBits(values(i))
      raw(i) = (bits >>> 24).toByte
      raw(n + i) = (bits >>> 16).toByte
      raw(2 * n + i) = (bits >>> 8).toByte
      raw(3 * n + i) = bits.toByte
      i += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
    bos.write(Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte))
    val out = new java.util.zip.DeflaterOutputStream(bos, deflater, 8192)
    try out.write(raw) finally { out.close(); deflater.end() }
    bos.toByteArray
  }

  def decompress(data: Array[Byte]): Array[Float] = {
    require(data.length >= 4, "compressed vector payload too short")
    val n = ((data(0) & 0xFF) << 24) | ((data(1) & 0xFF) << 16) |
      ((data(2) & 0xFF) << 8) | (data(3) & 0xFF)
    require(n >= 0 && n <= (Int.MaxValue >> 2),
      s"corrupt compressed vector header (declared length $n)")
    val inflater = new java.util.zip.Inflater()
    val in = new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(data, 4, data.length - 4), inflater, 8192)
    val raw = new Array[Byte](n * 4)
    try {
      var off = 0
      while (off < raw.length) {
        val read = in.read(raw, off, raw.length - off)
        require(read > 0, s"truncated compressed vector (got $off of ${raw.length} bytes)")
        off += read
      }
    } finally { in.close(); inflater.end() }
    val values = new Array[Float](n)
    var i = 0
    while (i < n) {
      val bits = ((raw(i) & 0xFF) << 24) | ((raw(n + i) & 0xFF) << 16) |
        ((raw(2 * n + i) & 0xFF) << 8) | (raw(3 * n + i) & 0xFF)
      values(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    values
  }

  /** Column forms (UDF — these verbs are API surface, not an analytical
    * hot path; at-rest compression is the Parquet codec's job). */
  val compressCol: Column => Column = {
    val f = udf((v: Seq[Float]) => compress(v.toArray))
    c => f(c)
  }

  val decompressCol: Column => Column = {
    val f = udf((b: Array[Byte]) => decompress(b).toSeq)
    c => f(c)
  }
}
