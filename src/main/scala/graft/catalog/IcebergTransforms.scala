package graft.catalog

/** Iceberg's BUCKET transform hash (public table spec, Appendix B
  * "32-bit Hash Requirements"): murmur3_x86_32 (seed 0) over the
  * spec's per-type byte encodings, with
  * `bucketN(v) = (hash(v) & Int.MaxValue) % N`. Implemented from the
  * published algorithm so engine writes under bucket default specs
  * produce tuples any spec-conformant reader (and this engine's own
  * scoped-delete matching) agrees with; IcebergTransformsSpec locks
  * the spec's own Appendix-B test vectors. */
object IcebergTransforms {

  /** Standard murmur3_x86_32 over `bytes` with `seed` (0 per spec). */
  def murmur3x86_32(bytes: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val len = bytes.length
    var i = 0
    while (i + 4 <= len) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    (len & 3) match {
      case 3 =>
        k1 ^= (bytes(i + 2) & 0xff) << 16
        k1 ^= (bytes(i + 1) & 0xff) << 8
        k1 ^= bytes(i) & 0xff
      case 2 =>
        k1 ^= (bytes(i + 1) & 0xff) << 8
        k1 ^= bytes(i) & 0xff
      case 1 =>
        k1 ^= bytes(i) & 0xff
      case _ => ()
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h ^= k1
    }
    h ^= len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Spec encoding: int and long (and date days / time+timestamp
    * micros) hash as the 8-byte LITTLE-ENDIAN long. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3x86_32(b)
  }

  /** Spec encoding: strings hash their UTF-8 bytes. */
  def hashString(s: String): Int =
    murmur3x86_32(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Spec encoding: decimals hash the MINIMAL two's-complement
    * big-endian unscaled value (scale fixed by the type). */
  def hashDecimal(unscaled: java.math.BigInteger): Int =
    murmur3x86_32(unscaled.toByteArray)

  /** Spec encoding: uuid hashes its 16 big-endian bytes; binary/fixed
    * hash raw bytes. */
  def hashBytes(b: Array[Byte]): Int = murmur3x86_32(b)

  /** `bucketN` of a pre-computed hash. */
  def bucketOf(hash: Int, n: Int): Int = {
    require(n > 0, s"bucket width must be positive, got $n")
    (hash & Integer.MAX_VALUE) % n
  }
}
