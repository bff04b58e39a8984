package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Format-level codecs from the reference, as column functions (F6-F8 in
 * SURVEY.md §2.8). Physically unnecessary under parquet — these exist so
 * the engine can ingest/emit reference-shaped encoded streams and so the
 * strict-compat oracle can round-trip them.
 */
object osmCodec {

  /** Delta-decode an array of longs (PBF way refs / dense-node ids,
    * pbf-read.c:181-186): out(i) = sum(in(0..i)). Running sum via the
    * aggregate higher-order function, no UDF. */
  def deltaDecode(arr: Column): Column =
    slice(
      aggregate(arr,
        struct(lit(0L).as("acc"), array().cast("array<long>").as("out")),
        (st, x) => {
          val acc = st.getField("acc") + x
          struct(acc.as("acc"), array_append(st.getField("out"), acc).as("out"))
        }).getField("out"),
      lit(1), size(arr))

  /** Delta-encode: out(i) = in(i) - in(i-1), out(0) = in(0)
    * (pbf-write.c:307-316 re-encode direction). */
  def deltaEncode(arr: Column): Column =
    zip_with(arr,
      concat(array(lit(0L)), slice(arr, lit(1), greatest(size(arr) - 1, lit(0)))),
      (cur, prev) => cur - prev)

  /** Sentinel list encoding (vex.c:499-509): negate the last element to
    * mark end-of-list. Preconditions (matching the reference, where the
    * lists are OSM ref lists): elements are POSITIVE ids — a last element
    * of 0 cannot carry the sentinel (negate(0) == 0) and a negative id is
    * already a sentinel. Empty arrays pass through unchanged (the reference
    * never emits them; element_at(arr, -1) would throw under ANSI mode). */
  def sentinelEncode(arr: Column): Column =
    when(size(arr) > 0,
      concat(slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
        array(element_at(arr, -1) * -1))).otherwise(arr)

  /** Inverse: restore the (absolute value of the) last element. */
  def sentinelDecode(arr: Column): Column =
    when(size(arr) > 0,
      concat(slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
        array(abs(element_at(arr, -1))))).otherwise(arr)

  /** Zigzag (intpack.c:106-121): signed <-> unsigned interleave. */
  def zigzagEncode(v: Column): Column =
    shiftleft(v, 1).bitwiseXOR(shiftright(v, 63))
  def zigzagDecode(v: Column): Column =
    shiftrightunsigned(v, 1).bitwiseXOR(-(v.bitwiseAND(lit(1L))))

  /** Human-readable byte count (vex.c:158-185, F9): successive division
    * by 1024 with one decimal, same unit ladder as the reference. */
  def humanBytes(n0: Long): String = {
    val units = Array("bytes", "kB", "MB", "GB", "TB", "PB")
    var n = n0.toDouble
    var u = 0
    while (n >= 1024.0 && u < units.length - 1) { n /= 1024.0; u += 1 }
    if (u == 0) s"${n0} bytes"
    else String.format(java.util.Locale.ROOT, "%.1f %s",
      Double.box(n), units(u))   // Locale.ROOT: "1.5 kB" on any JVM locale
  }

  /** FNV-1a 32-bit string hash (dedup.c:86-94) — pure Scala twin for
    * byte-compat string-table tests. */
  def fnv1a32(s: String): Int = {
    var h = 0x811C9DC5
    var i = 0
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    while (i < bytes.length) {
      h ^= bytes(i) & 0xFF
      h *= 0x01000193
      i += 1
    }
    h
  }
}
