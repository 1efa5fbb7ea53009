package graft.api

/** Minimal proto3 wire-format primitives — enough to speak the
  * reference's `Vector.proto` (API.gRPC/Protos/Vector.proto:1-71) on the
  * wire without a protobuf dependency (none is permitted in this build).
  * The encoding is the public protobuf wire spec: little-endian base-128
  * varints, `tag = (field << 3) | wireType`, wire type 0 = varint,
  * 2 = length-delimited (bytes / string / nested message). proto3
  * presence rules apply: scalar fields at their default value (0 /
  * false / empty) are not emitted; unknown fields are skipped on decode
  * so the codec is forward-compatible.
  */
object ProtoWire {

  /** Append-only message writer. All `*Field` verbs follow proto3
    * presence: default-valued scalars emit nothing. */
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream(64)

    def varint(v: Long): this.type = {
      var x = v
      while ((x & ~0x7FL) != 0L) { out.write(((x & 0x7FL) | 0x80L).toInt); x >>>= 7 }
      out.write(x.toInt)
      this
    }

    def tag(field: Int, wire: Int): this.type = varint((field.toLong << 3) | wire)

    /** Length-delimited bytes field; proto3 default (empty) emits nothing. */
    def bytesField(field: Int, b: Array[Byte]): this.type =
      if (b.isEmpty) this
      else { tag(field, 2); varint(b.length.toLong); out.write(b, 0, b.length); this }

    def stringField(field: Int, s: String): this.type =
      bytesField(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    /** Nested message field: emitted even when the submessage encodes to
      * zero bytes — message presence is the field's existence, not its
      * content (e.g. an empty `VectorMessage`). */
    def messageField(field: Int, body: Array[Byte]): this.type = {
      tag(field, 2); varint(body.length.toLong); out.write(body, 0, body.length); this
    }

    def boolField(field: Int, v: Boolean): this.type =
      if (!v) this else { tag(field, 0); varint(1L) }

    /** proto3 `int32`: negative values sign-extend to a 10-byte varint. */
    def int32Field(field: Int, v: Int): this.type =
      if (v == 0) this else { tag(field, 0); varint(v.toLong) }

    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Forward-only message reader over one encoded message. */
  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start

    def hasMore: Boolean = pos < end

    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (shift < 64) {
        require(pos < end, "truncated varint")
        val b = buf(pos) & 0xFF; pos += 1
        acc |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      throw new IllegalArgumentException("varint longer than 10 bytes")
    }

    /** Next field's (number, wireType). */
    def readTag(): (Int, Int) = {
      val t = varint()
      ((t >>> 3).toInt, (t & 7L).toInt)
    }

    def lengthDelimited(): Array[Byte] = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= end, s"length-delimited field overruns buffer ($n bytes at $pos/$end)")
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      b
    }

    /** Skip a field of the given wire type (unknown-field tolerance). */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => val n = varint().toInt
        require(n >= 0 && pos + n <= end, "truncated length-delimited field"); pos += n
      case 5 => require(pos + 4 <= end, "truncated fixed32"); pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  /** Decode a message by folding over its fields: the partial function
    * consumes the fields it matches via the [[Reader]]; unmatched fields
    * are skipped (unknown-field tolerance). */
  def eachField(bytes: Array[Byte])(f: PartialFunction[(Int, Int, Reader), Unit]): Unit = {
    val r = new Reader(bytes)
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      f.applyOrElse((field, wire, r),
        (t: (Int, Int, Reader)) => t._3.skip(t._2))
    }
  }
}
