package graft.util

/** xxHash64 (Yann Collet's public-domain spec) — the production hash for
  * dedup signatures: ~10× faster than md5 and seedable, so one pass yields
  * the whole hash family. Verified bit-identical to Spark's own `xxhash64`
  * column expression on UTF-8 strings (OpsSpec), so results stay
  * reproducible from SQL when needed.
  */
object XXH64 {
  private final val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private final val P2 = -4417276706812531889L // 0xC2B2AE3D27D3E4F3
  private final val P3 = 1609587929392839161L  // 0x165667B19E3779F9
  private final val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private final val P5 = 2870177450012600261L  // 0x27D4EB2F165667C5

  def hash(s: String, seed: Long): Long = hash(s.getBytes("UTF-8"), seed)

  def hash(data: Array[Byte], seed: Long): Long = hash(data, 0, data.length, seed)

  /** Hash of the byte RANGE [off, off+len) — bit-identical to hashing a copy
    * of that slice, so passage windows can digest sub-ranges of one joined
    * buffer without a per-window allocation.
    */
  def hash(data: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    val end = off + len
    var i = off
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i <= end - 32) {
        v1 = round(v1, readLong(data, i))
        v2 = round(v2, readLong(data, i + 8))
        v3 = round(v3, readLong(data, i + 16))
        v4 = round(v4, readLong(data, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else h = seed + P5
    h += len
    while (i <= end - 8) {
      h ^= round(0L, readLong(data, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i <= end - 4) {
      h ^= (readInt(data, i) & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h ^= (data(i) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  private def round(acc: Long, v: Long): Long =
    java.lang.Long.rotateLeft(acc + v * P2, 31) * P1

  private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * P1 + P4

  private def readLong(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | (d(i + 1) & 0xffL) << 8 | (d(i + 2) & 0xffL) << 16 |
      (d(i + 3) & 0xffL) << 24 | (d(i + 4) & 0xffL) << 32 | (d(i + 5) & 0xffL) << 40 |
      (d(i + 6) & 0xffL) << 48 | (d(i + 7) & 0xffL) << 56

  private def readInt(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | (d(i + 1) & 0xff) << 8 | (d(i + 2) & 0xff) << 16 | (d(i + 3) & 0xff) << 24
}
