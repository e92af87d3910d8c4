package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

/** The public Iceberg table spec's own Appendix-B hash test vectors —
  * the bucket transform's correctness contract. A wrong hash would
  * write tuples no conformant reader agrees with (and scoped deletes
  * would match the wrong files), so these are locked byte-exact. */
class IcebergTransformsSpec extends AnyFunSuite {
  import IcebergTransforms._

  test("Appendix-B vectors: int/long hash as 8-byte little-endian long") {
    assert(hashLong(34L) == 2017239379)
    // int 34 hashes IDENTICALLY to long 34 (the spec's widening rule)
    assert(hashLong(34) == hashLong(34L))
  }

  test("Appendix-B vectors: string utf-8") {
    assert(hashString("iceberg") == 1210000089)
  }

  test("Appendix-B vectors: date/time/timestamp as their ordinals") {
    // date 2017-11-16 = epoch day 17486
    assert(hashLong(java.time.LocalDate.of(2017, 11, 16).toEpochDay)
      == -653330422)
    // time 22:31:08 = micros from midnight
    assert(hashLong(((22L * 3600 + 31 * 60 + 8) * 1000000L)) == -662762989)
    // timestamp 2017-11-16T22:31:08 = micros from epoch
    assert(hashLong(java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
      == -2047944441)
  }

  test("Appendix-B vectors: decimal minimal big-endian unscaled") {
    // decimal(P,2) 14.20 → unscaled 1420 (the declared scale travels
    // in the TYPE; valueOf(14.20) would drop the trailing zero)
    assert(hashDecimal(new java.math.BigDecimal("14.20")
      .unscaledValue()) == -500754589)
  }

  test("Appendix-B vectors: uuid and binary raw bytes") {
    val u = java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    assert(hashBytes(bb.array()) == 1488055340)
    assert(hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
  }

  test("bucketOf: non-negative modulo of the masked hash") {
    assert(bucketOf(hashLong(34L), 16) == (2017239379 & Int.MaxValue) % 16)
    assert((0 until 1000).forall(i =>
      { val b = bucketOf(hashLong(i.toLong), 8); b >= 0 && b < 8 }))
  }
}
