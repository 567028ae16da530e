package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Offline MaxMind-DB → ip-range-CSV converter — the missing data-format
  * bridge between a real GeoLite2 `.mmdb` file and
  * [[graft.enrich.GeoIp.loadRanges]]'s range-dimension table (the
  * reference point-queries the mmdb per record,
  * functions/enrichment/filters/ip.py:67-78; the engine turns the same
  * database into a broadcast range dimension once, offline).
  *
  * Implements the PUBLIC MaxMind DB File Format Specification 2.0
  * (binary search tree + data section + metadata map): the tree is a
  * binary trie over address bits whose leaf records point into a
  * shared data section, so a full pre-order walk enumerates every
  * stored network exactly once as a CIDR block — emitted here as an
  * inclusive [start_ip, end_ip] dotted-quad range row with the 11 geo
  * attributes [[graft.enrich.GeoIp]] consumes.
  *
  * Scale shape: the walk is a driver-side stream (O(tree depth) state,
  * rows appended to the CSV as they are found — a GeoLite2-City's ~3M
  * networks never sit in memory), and the output is a ~100 MB CSV the
  * enrichment broadcast-joins; this tool runs once per database
  * release, not per job. Data records are decoded at most once per
  * distinct data-section offset (leaves share records heavily).
  *
  * IPv6 databases: IPv4 ranges live under the ::/96 subtree, reached
  * by walking 96 zero bits from the root (the public readers'
  * `ipv4Start` convention); only that subtree is exported, matching
  * GeoIp's documented v4-only dimension contract.
  */
object MmdbToRanges {

  // ---------------------------------------------------------- decoding
  /** Decoded metadata the walk needs. */
  final case class Meta(nodeCount: Int, recordSize: Int, ipVersion: Int)

  private val MetaMarker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes(StandardCharsets.US_ASCII)

  /** Last occurrence of the metadata marker (the spec allows the byte
    * sequence to appear in data; the metadata section is after the
    * LAST one, within the final 128 KiB). */
  private def metadataStart(buf: Array[Byte]): Int = {
    val from = math.max(0, buf.length - (128 << 10))
    var best = -1
    var i = from
    while (i <= buf.length - MetaMarker.length) {
      var j = 0
      while (j < MetaMarker.length && buf(i + j) == MetaMarker(j)) j += 1
      if (j == MetaMarker.length) best = i + MetaMarker.length
      i += 1
    }
    require(best >= 0, "not a MaxMind DB: metadata marker not found")
    best
  }

  /** One decoded value + the offset just past it. `base` anchors
    * pointer resolution (data-section start; pointers are illegal in
    * metadata per spec but resolve harmlessly against its start). */
  private final class Decoder(buf: Array[Byte], base: Int) {
    private def u8(o: Int): Int = buf(o) & 0xFF
    private def beInt(o: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(o + i); i += 1 }
      v
    }

    def decode(offset: Int): (Any, Int) = {
      val ctrl = u8(offset)
      var typ = ctrl >> 5
      var o = offset + 1
      if (typ == 1) { // pointer — resolves within the data section
        val ss = (ctrl >> 3) & 0x3
        val vvv = (ctrl & 0x7).toLong
        val (ptr, after) = ss match {
          case 0 => ((vvv << 8) | u8(o), o + 1)
          case 1 => (((vvv << 16) | beInt(o, 2)) + 2048L, o + 2)
          case 2 => (((vvv << 24) | beInt(o, 3)) + 526336L, o + 3)
          case _ => (beInt(o, 4), o + 4)
        }
        val (v, _) = decode(base + ptr.toInt)
        return (v, after)
      }
      if (typ == 0) { typ = 7 + u8(o); o += 1 } // extended type byte
      var size = ctrl & 0x1F
      if (size == 29) { size = 29 + u8(o); o += 1 }
      else if (size == 30) { size = 285 + beInt(o, 2).toInt; o += 2 }
      else if (size == 31) { size = 65821 + beInt(o, 3).toInt; o += 3 }
      typ match {
        case 2 => // UTF-8 string
          (new String(buf, o, size, StandardCharsets.UTF_8), o + size)
        case 3 => // double (size 8)
          (java.lang.Double.longBitsToDouble(beInt(o, 8)), o + 8)
        case 4 => // bytes
          (java.util.Arrays.copyOfRange(buf, o, o + size), o + size)
        case 5 | 6 | 9 | 10 => // uint16/32/64/128 (big-endian, size bytes)
          (beInt(o, size), o + size)
        case 8 => // int32
          val raw = beInt(o, size)
          val shift = 64 - 8 * math.max(size, 1)
          (if (size == 0) 0L else (raw << shift) >> shift, o + size)
        case 7 => // map: size entries of key (string) then value
          var m = Map.empty[String, Any]
          var p = o
          var i = 0
          while (i < size) {
            val (k, p1) = decode(p)
            val (v, p2) = decode(p1)
            m += (k.asInstanceOf[String] -> v)
            p = p2
            i += 1
          }
          (m, p)
        case 11 => // array
          val b = Vector.newBuilder[Any]
          var p = o
          var i = 0
          while (i < size) { val (v, p1) = decode(p); b += v; p = p1; i += 1 }
          (b.result(), p)
        case 14 => (size != 0, o) // boolean: size IS the value
        case 15 => // float
          (java.lang.Float.intBitsToFloat(beInt(o, 4).toInt).toDouble, o + 4)
        case 13 => (null, o) // end marker / cache container
        case other => throw new IllegalArgumentException(
          s"unsupported mmdb type $other at offset $offset")
      }
    }
  }

  def readMeta(buf: Array[Byte]): Meta = {
    val ms = metadataStart(buf)
    val (m, _) = new Decoder(buf, ms).decode(ms)
    val meta = m.asInstanceOf[Map[String, Any]]
    def num(k: String): Int = meta(k).asInstanceOf[Long].toInt
    Meta(num("node_count"), num("record_size"), num("ip_version"))
  }

  // ------------------------------------------------------------ tree walk
  /** Record `side` (0 = left/0-bit, 1 = right/1-bit) of tree node
    * `node`. Layouts per spec: 24-bit = 3 bytes each; 28-bit = 3 bytes
    * each with the shared middle byte carrying each record's top
    * nibble; 32-bit = 4 bytes each. */
  private def record(buf: Array[Byte], meta: Meta, node: Int, side: Int): Int = {
    def u8(o: Int): Int = buf(o) & 0xFF
    val nodeBytes = meta.recordSize * 2 / 8
    val b = node * nodeBytes
    meta.recordSize match {
      case 24 =>
        val o = b + side * 3
        (u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2)
      case 28 =>
        if (side == 0)
          ((u8(b + 3) & 0xF0) << 20) | (u8(b) << 16) | (u8(b + 1) << 8) | u8(b + 2)
        else
          ((u8(b + 3) & 0x0F) << 24) | (u8(b + 4) << 16) | (u8(b + 5) << 8) | u8(b + 6)
      case 32 =>
        val o = b + side * 4
        ((u8(o) << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3))
      case other =>
        throw new IllegalArgumentException(s"unsupported record_size $other")
    }
  }

  /** Root of the IPv4 space: the tree root for a v4 database, the node
    * 96 zero-bit steps down for a v6 one. */
  private def ipv4Root(buf: Array[Byte], meta: Meta): Int = {
    var node = 0
    if (meta.ipVersion == 6) {
      var i = 0
      while (i < 96 && node < meta.nodeCount) {
        node = record(buf, meta, node, 0)
        i += 1
      }
    }
    node
  }

  /** Pre-order walk of the IPv4 subtree; `emit(startIp, endIp,
    * dataOffset)` once per stored network (CIDR leaf), inclusive
    * bounds, data offset relative to the data-section start. */
  def walkV4(buf: Array[Byte], meta: Meta)
            (emit: (Long, Long, Int) => Unit): Unit = {
    val start = ipv4Root(buf, meta)
    if (start >= meta.nodeCount) return // degenerate/empty tree
    // explicit stack: (node, prefix, depth) — O(depth) state
    var stack = List((start, 0L, 0))
    while (stack.nonEmpty) {
      val (node, prefix, depth) = stack.head
      stack = stack.tail
      var side = 1
      while (side >= 0) { // push right then left → pre-order left-first
        val r = record(buf, meta, node, side)
        val p = (prefix << 1) | side
        if (r < meta.nodeCount) {
          // an INTERIOR node's children must still have room for a leaf
          // below them: interior prefix length (depth + 1) caps at 31,
          // else a /33 "leaf" would later shift by a negative span and
          // emit a garbage range BEFORE any guard fired
          require(depth < 31, s"malformed tree: interior node below /31")
          stack = (r, p, depth + 1) :: stack
        } else if (r > meta.nodeCount) {
          val span = 32 - (depth + 1)
          val lo = p << span
          emit(lo, lo | ((1L << span) - 1), r - meta.nodeCount - 16)
        } // == nodeCount: absent network
        side -= 1
      }
    }
  }

  // ------------------------------------------------------- row extraction
  private def dotted(ip: Long): String =
    s"${(ip >> 24) & 0xFF}.${(ip >> 16) & 0xFF}.${(ip >> 8) & 0xFF}.${ip & 0xFF}"

  /** The 11 geo attributes in [[graft.enrich.GeoIp.loadRanges]] column
    * order, from a City-schema record map; absent → empty string. */
  def geoFields(rec: Map[String, Any]): Seq[String] = {
    def sub(k: String): Map[String, Any] = rec.get(k) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
    def en(m: Map[String, Any]): String = m.get("names") match {
      case Some(n: Map[_, _]) =>
        n.asInstanceOf[Map[String, Any]].get("en").map(_.toString).getOrElse("")
      case _ => ""
    }
    def str(m: Map[String, Any], k: String): String =
      m.get(k).map(_.toString).getOrElse("")
    val continent = sub("continent")
    val country = sub("country")
    val city = sub("city")
    val postal = sub("postal")
    val location = sub("location")
    // region = first (most significant) subdivision, the reference's
    // `subdivisions[0]` read
    val region = rec.get("subdivisions") match {
      case Some(v: Vector[_]) if v.nonEmpty => v.head match {
        case m: Map[_, _] => en(m.asInstanceOf[Map[String, Any]])
        case _ => ""
      }
      case _ => ""
    }
    Seq(
      en(continent), str(continent, "code"),
      en(country), str(country, "iso_code"),
      region,
      en(city), str(city, "geoname_id"),
      str(postal, "code"),
      str(location, "latitude"), str(location, "longitude"),
      str(location, "time_zone"))
  }

  private def csv(f: String): String =
    if (f.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + f.replace("\"", "\"\"") + "\""
    else f

  /** Convert `mmdbPath` to the range CSV at `outPath`. Returns the
    * number of range rows written. */
  def convert(mmdbPath: String, outPath: String): Long = {
    val buf = Files.readAllBytes(Paths.get(mmdbPath))
    val meta = readMeta(buf)
    val nodeBytes = meta.recordSize * 2 / 8
    val dataStart = meta.nodeCount * nodeBytes + 16
    val dec = new Decoder(buf, dataStart)
    // leaves share records heavily (a country's networks all point at
    // one map) — decode each distinct offset once
    val memo = scala.collection.mutable.HashMap.empty[Int, Seq[String]]
    val out = Files.newBufferedWriter(Paths.get(outPath))
    var n = 0L
    try {
      out.write("start_ip,end_ip,continent,continent_code,country," +
        "country_iso,region,city,city_id,postal_code,latitude,longitude," +
        "timezone\n")
      walkV4(buf, meta) { (lo, hi, off) =>
        val fields = memo.getOrElseUpdate(off,
          geoFields(dec.decode(dataStart + off)._1.asInstanceOf[Map[String, Any]]))
        out.write((dotted(lo) +: dotted(hi) +: fields.map(csv))
          .mkString("", ",", "\n"))
        n += 1
      }
    } finally out.close()
    n
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: MmdbToRanges <in.mmdb> <out.csv>")
    val n = convert(args(0), args(1))
    println(s"wrote $n ranges from ${args(0)} to ${args(1)}")
  }
}
