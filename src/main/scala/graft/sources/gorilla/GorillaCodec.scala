package graft.sources.gorilla

import scala.collection.mutable.ArrayBuffer

/** Byte-exact codec for the reference engine's shard file format
  * (/root/reference/engine/shard.cpp):
  *
  *  - LEB128 unsigned varints (shard.cpp:6-24);
  *  - first point: raw timestamp varint (shard.cpp:111-112);
  *  - later points: varint(zigzag(delta-of-delta)) (shard.cpp:113-119);
  *  - every point: varint(bits(value) XOR bits(prev value)) with prev=0 for
  *    the first point (shard.cpp:121-125);
  *  - decode drops a trailing phantom ts==0 point at EOF exactly like the
  *    reader's guard (shard.cpp:52-54).
  *
  * The encoder exists so tests (and migrations in reverse) can produce
  * reference-format files; the decoder backs the DSv2 scan.
  */
object GorillaCodec {

  def writeVarint(out: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out += ((v & 0x7FL) | 0x80L).toByte
      v = v >>> 7
    }
    out += (v & 0x7FL).toByte
  }

  def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  def unzigzag(z: Long): Long = (z >>> 1) ^ -(z & 1L)

  /** Encode a point stream (insertion order) into shard-file bytes. */
  def encode(points: Seq[(Long, Double)]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    var prevTs = 0L
    var prevDelta = 0L
    var prevBits = 0L
    var first = true
    points.foreach { case (ts, v) =>
      if (first) { writeVarint(out, ts); first = false }
      else {
        val delta = ts - prevTs
        writeVarint(out, zigzag(delta - prevDelta))
        prevDelta = delta
      }
      prevTs = ts
      val bits = java.lang.Double.doubleToRawLongBits(v)
      writeVarint(out, bits ^ prevBits)
      prevBits = bits
    }
    out.toArray
  }

  /** Decode shard-file bytes back into (timestamp, value) points. */
  def decode(bytes: Array[Byte]): Seq[(Long, Double)] = {
    var pos = 0
    def atEnd: Boolean = pos >= bytes.length
    def readVarint(): Long = {
      var result = 0L
      var shift = 0
      var more = true
      while (more && pos < bytes.length) {
        val b = bytes(pos); pos += 1
        result |= (b & 0x7FL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      result
    }
    val points = ArrayBuffer.empty[(Long, Double)]
    var prevTs = 0L
    var prevDelta = 0L
    var prevBits = 0L
    var first = true
    while (!atEnd) {
      val ts =
        if (first) { first = false; readVarint() }
        else {
          val delta = prevDelta + unzigzag(readVarint())
          prevDelta = delta
          prevTs + delta
        }
      // the reference reader's EOF guard: a decoded ts of 0 past the first
      // point is the phantom produced by read_varint returning 0 at EOF
      if (ts == 0L && points.nonEmpty && atEnd) {
        // drop phantom
      } else {
        prevTs = ts
        val bits = prevBits ^ readVarint()
        prevBits = bits
        points += ((ts, java.lang.Double.longBitsToDouble(bits)))
      }
    }
    points.toSeq
  }
}

/** Reverse-migration writer: dump a point Dataset INTO the reference's
  * shard-file layout (one `<start>-<end>.bin` per hour shard, points in
  * (ts, value) order). Each shard is encoded by the executor that owns its
  * group; `dir` must be a filesystem all executors can reach (trivially true
  * on local[N]; a shared mount on a cluster). */
object GorillaShardWriter {
  def writeShards(points: org.apache.spark.sql.Dataset[graft.model.DataPoint],
      dir: String): Unit = {
    import points.sparkSession.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    points
      .groupByKey(p => graft.model.shardHourOf(p.timestamp))
      .mapGroups { (shard, pts) =>
        val stream = pts.toSeq.sortBy(p => (p.timestamp, p.value))
          .map(p => (p.timestamp, p.value))
        val start = shard * graft.model.ShardDurationMs
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$start-${start + graft.model.ShardDurationMs}.bin"),
          GorillaCodec.encode(stream))
        shard
      }
      .collect()
  }
}
