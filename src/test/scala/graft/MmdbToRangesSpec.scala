package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.tools.MmdbToRanges

/** Golden test for the `.mmdb` → range-CSV converter: writes a tiny
  * spec-conformant MaxMind DB from scratch (record_size 24, three v4
  * networks, shared + pointer-indirected data records, one v6 wrapper
  * variant), converts it, and checks both the CSV text and the
  * end-to-end enrichment through [[graft.enrich.GeoIp]].
  */
class MmdbToRangesSpec extends SparkTestBase {

  // ------------------------------------------------ minimal mmdb writer
  /** Data-format encoders (MaxMind DB spec §"Data Section"). */
  private object Enc {
    def ctrl(typ: Int, size: Int): Array[Byte] = {
      require(size < 29, "fixture encoder: small sizes only")
      if (typ < 8) Array((((typ << 5) | size) & 0xFF).toByte)
      else Array(((0 << 5) | size).toByte, (typ - 7).toByte)
    }
    def str(s: String): Array[Byte] = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      ctrl(2, b.length) ++ b
    }
    def dbl(d: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      ctrl(3, 8) ++ (7 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xFF).toByte)
    }
    def uint(typ: Int, v: Long): Array[Byte] = {
      var bytes = List.empty[Byte]
      var x = v
      while (x != 0) { bytes = ((x & 0xFF).toByte) :: bytes; x >>>= 8 }
      ctrl(typ, bytes.length) ++ bytes
    }
    def u16(v: Long): Array[Byte] = uint(5, v)
    def u32(v: Long): Array[Byte] = uint(6, v)
    def u64(v: Long): Array[Byte] = uint(9, v)
    def map(kvs: (String, Array[Byte])*): Array[Byte] =
      ctrl(7, kvs.length) ++ kvs.flatMap { case (k, v) => str(k) ++ v }
    def arr(vs: Array[Byte]*): Array[Byte] =
      ctrl(11, vs.length) ++ vs.flatten
    /** ss=0 pointer (11-bit offset into the data section). */
    def ptr(offset: Int): Array[Byte] = {
      require(offset < 2048, s"ss=0 pointer: $offset")
      Array((((1 << 5) | ((offset >> 8) & 0x7)) & 0xFF).toByte,
        (offset & 0xFF).toByte)
    }
  }

  /** Full city-schema record. */
  private def cityRecord(continent: String, ccode: String, country: String,
                         iso: String, region: String, city: String,
                         cityId: Long, postal: String, lat: Double,
                         lng: Double, tz: String): Array[Byte] =
    Enc.map(
      "city" -> Enc.map(
        "geoname_id" -> Enc.u32(cityId),
        "names" -> Enc.map("en" -> Enc.str(city))),
      "continent" -> Enc.map(
        "code" -> Enc.str(ccode),
        "names" -> Enc.map("en" -> Enc.str(continent))),
      "country" -> Enc.map(
        "iso_code" -> Enc.str(iso),
        "names" -> Enc.map("en" -> Enc.str(country))),
      "location" -> Enc.map(
        "latitude" -> Enc.dbl(lat),
        "longitude" -> Enc.dbl(lng),
        "time_zone" -> Enc.str(tz)),
      "postal" -> Enc.map("code" -> Enc.str(postal)),
      "subdivisions" -> Enc.arr(
        Enc.map("names" -> Enc.map("en" -> Enc.str(region)))))

  /** Builds the binary tree over `nets` (CIDR bit-prefix → data-record
    * index), serializes at record_size 24, appends data + metadata.
    * `v6Wrap` stores the v4 networks 96 zero-bits down (an ip_version 6
    * database), exercising the converter's ipv4Start walk. */
  private def writeMmdb(nets: Seq[(String, Int)], dataRecs: Seq[Array[Byte]],
                        v6Wrap: Boolean): Array[Byte] = {
    // data section: concatenated records, offsets recorded
    val dataOffsets = dataRecs.scanLeft(0)(_ + _.length)
    val dataSection = dataRecs.flatten.toArray
    // trie build: node = Array(left, right); -1 empty, -(2+k) data k
    val nodes = scala.collection.mutable.ArrayBuffer(Array(-1, -1))
    for ((bits0, rec) <- nets) {
      val bits = (if (v6Wrap) "0" * 96 else "") + bits0
      var cur = 0
      for (i <- 0 until bits.length) {
        val side = bits(i) - '0'
        if (i == bits.length - 1) nodes(cur)(side) = -(2 + rec)
        else {
          if (nodes(cur)(side) < 0) {
            nodes += Array(-1, -1)
            nodes(cur)(side) = nodes.length - 1
          }
          cur = nodes(cur)(side)
        }
      }
    }
    val n = nodes.length
    def recordValue(v: Int): Int =
      if (v >= 0) v // child node
      else if (v == -1) n // empty
      else n + 16 + dataOffsets(-v - 2) // data record
    val tree = nodes.flatMap { node =>
      node.flatMap { v =>
        val rv = recordValue(v)
        Seq(((rv >> 16) & 0xFF).toByte, ((rv >> 8) & 0xFF).toByte,
          (rv & 0xFF).toByte)
      }
    }.toArray
    val meta = Enc.map(
      "binary_format_major_version" -> Enc.u16(2),
      "binary_format_minor_version" -> Enc.u16(0),
      "build_epoch" -> Enc.u64(1723600000L),
      "database_type" -> Enc.str("Test-City"),
      "description" -> Enc.map("en" -> Enc.str("fixture")),
      "ip_version" -> Enc.u16(if (v6Wrap) 6 else 4),
      "languages" -> Enc.arr(Enc.str("en")),
      "node_count" -> Enc.u32(n),
      "record_size" -> Enc.u16(24))
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes(StandardCharsets.US_ASCII)
    tree ++ Array.fill(16)(0.toByte) ++ dataSection ++ marker ++ meta
  }

  private def cidrBits(ip: String, prefixLen: Int): String = {
    val n = ip.split('.').map(_.toLong).reduce(_ * 256 + _)
    (31 to 0 by -1).map(i => ((n >> i) & 1).toString).mkString.take(prefixLen)
  }

  private val recA = cityRecord("Europe", "EU", "Germany", "DE",
    "Berlin", "Berlin", 2950159L, "10115", 52.52, 13.405, "Europe/Berlin")
  private val recB = cityRecord("North America", "NA", "United States", "US",
    "District of Columbia", "Washington, D.C.", 4140963L, "20001",
    38.9072, -77.0369, "America/New_York")

  /** recC = a bare ss=0 POINTER back to record A (offset 0) — two
    * networks sharing one record through data-section indirection. */
  private def fixture(v6Wrap: Boolean): Array[Byte] =
    writeMmdb(
      Seq(
        (cidrBits("10.0.0.0", 8), 0),
        (cidrBits("192.168.1.0", 24), 1),
        (cidrBits("172.16.0.0", 12), 2)),
      Seq(recA, recB, Enc.ptr(0)),
      v6Wrap)

  private def convertToTemp(v6Wrap: Boolean): (String, Long) = {
    val dir = Files.createTempDirectory("mmdb_spec")
    val db = dir.resolve("test.mmdb")
    Files.write(db, fixture(v6Wrap))
    val out = dir.resolve("ranges.csv").toString
    val nRows = MmdbToRanges.convert(db.toString, out)
    (out, nRows)
  }

  test("converter emits one inclusive range per stored network, City fields mapped") {
    val (csvPath, nRows) = convertToTemp(v6Wrap = false)
    assert(nRows === 3)
    val lines = Files.readAllLines(java.nio.file.Paths.get(csvPath))
    assert(lines.get(0).startsWith("start_ip,end_ip,continent,continent_code"))
    val body = (1 until lines.size).map(lines.get).sorted
    assert(body(0) ===
      "10.0.0.0,10.255.255.255,Europe,EU,Germany,DE,Berlin,Berlin,2950159,10115,52.52,13.405,Europe/Berlin")
    // the pointer-indirected record resolves to record A's fields
    assert(body(1) ===
      "172.16.0.0,172.31.255.255,Europe,EU,Germany,DE,Berlin,Berlin,2950159,10115,52.52,13.405,Europe/Berlin")
    // comma-bearing city name is CSV-quoted
    assert(body(2) ===
      "192.168.1.0,192.168.1.255,North America,NA,United States,US," +
        "District of Columbia,\"Washington, D.C.\",4140963,20001,38.9072,-77.0369,America/New_York")
  }

  test("an ip_version 6 database yields the identical v4 ranges (ipv4Start walk)") {
    val (csv4, _) = convertToTemp(v6Wrap = false)
    val (csv6, n6) = convertToTemp(v6Wrap = true)
    assert(n6 === 3)
    assert(Files.readString(java.nio.file.Paths.get(csv6)) ===
      Files.readString(java.nio.file.Paths.get(csv4)))
  }

  test("converted CSV drives GeoIp.withGeoColumns end to end") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (csvPath, _) = convertToTemp(v6Wrap = false)
    val ranges = graft.enrich.GeoIp.loadRanges(spark, csvPath)
    val df = Seq(
      ("hit_a", "10.1.2.3"), // inside 10.0.0.0/8
      ("hit_ptr", "172.20.0.9"), // inside the pointer-shared /12
      ("miss", "11.0.0.1"), // outside every range
      ("quoted", "192.168.1.77")) // the comma-bearing city
      .toDF("id", "ip")
    val byId = graft.enrich.GeoIp
      .withGeoColumns(df, ranges, col("ip"), lit(false))
      .select("id", "geo_country", "geo_city", "geo_region", "geo_timezone",
        "geo_latitude")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4),
          Option(r.get(5)))).toMap
    assert(byId("hit_a")._1 === "Germany")
    assert(byId("hit_a")._4 === "Europe/Berlin")
    assert(byId("hit_a")._5 === Some(52.52))
    assert(byId("hit_ptr")._2 === "Berlin")
    assert(byId("quoted")._2 === "Washington, D.C.")
    assert(byId("quoted")._3 === "District of Columbia")
    assert(byId("miss")._1 === "(not set)")
    assert(byId("miss")._5 === None)
  }
}
