package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}

/**
 * Tag & role dictionary codec — a faithful restatement of the reference's
 * domain dictionaries and their encoding semantics (tags.c:18-254 key/value
 * tables, tags.c:197-231 free-text keys, tags.c:294-330 roles) plus the
 * load-time key blacklist (vex.c:427-431).
 *
 * Two modes everywhere:
 *  - strict: replicates the reference's memcmp-with-query-length compares,
 *    i.e. a tag key/value that is a PREFIX of a dictionary entry matches it
 *    (bug B4, SURVEY.md §8) — e.g. key "high" encodes as the `highway`
 *    dictionary, value "resid" canonicalizes to "residential". Blacklist
 *    drops any key that is a prefix of created_by/import_uuid/attribution
 *    and any key whose first 6 bytes are "source"/"tiger:".
 *  - fixed: exact key equality; "source"/"tiger:" prefixed keys dropped by
 *    explicit startsWith. This is the engine default.
 *
 * Codes are one-based across concatenated tables (positive = (key,val)
 * dictionary hit; negative = free-text-key index, value verbatim; 0 = both
 * verbatim). Roles: 0 = "[OTHER]" — LOSSY, unknown roles collapse.
 */
object TagDict {

  /** KV tables, order and content exactly as tags.c:18-187. */
  val tables: Vector[(String, Vector[String])] = Vector(
    "highway" -> Vector("residential", "service", "track", "unclassified",
      "footway", "tertiary", "path", "secondary", "primary", "bus_stop",
      "crossing", "turning_circle", "cycleway", "trunk", "traffic_signals",
      "living_street", "motorway", "steps", "motorway_link", "road",
      "pedestrian", "trunk_link", "primary_link", "stop", "secondary_link",
      "motorway_junction", "tertiary_link", "construction", "give_way",
      "bridleway", "platform", "mini_roundabout"),
    "building" -> Vector("yes", "house", "residential", "garage", "hut",
      "industrial", "commercial", "retail"),
    "landuse" -> Vector("forest", "residential", "grass", "farmland",
      "meadow", "farm", "reservoir", "industrial"),
    "surface" -> Vector("asphalt", "unpaved", "paved", "gravel", "ground",
      "dirt", "grass", "concrete", "paving_stones", "sand", "cobblestone",
      "compacted"),
    "amenity" -> Vector("parking", "place_of_worship", "school",
      "restaurant", "bench", "fuel", "post_box", "bank"),
    "power" -> Vector("tower", "pole", "line", "generator", "minor_line",
      "sub_station", "substation", "station"),
    "traffic_calming" -> Vector("bump", "hump", "table", "yes", "island"),
    "railway" -> Vector("rail", "level_crossing", "abandoned", "station",
      "buffer_stop", "tram", "switch", "platform"),
    "service" -> Vector("parking_aisle", "driveway", "alley", "spur",
      "yard", "siding", "drive-through", "emergency_access"),
    "access" -> Vector("private", "yes", "no", "permissive", "destination",
      "agricultural", "customers", "designated"),
    "crossing" -> Vector("uncontrolled", "traffic_signals", "unmarked",
      "island", "zebra", "no"),
    "footway" -> Vector("sidewalk", "crossing", "both", "none", "right",
      "left", "no", "yes"))

  /** Free-text keys, order exactly as tags.c:197-231. */
  val freeTextKeys: Vector[String] = Vector(
    "addr:postcode", "addr:postcode:left", "addr:postcode:right",
    "addr:housenumber", "addr:street", "addr:city", "addr:country",
    "addr:full", "addr:state", "amenity", "bicycle", "bridge", "building",
    "cycleway", "embankment", "exit_to", "footway", "highway", "landuse",
    "lanes", "maxspeed", "name", "oneway", "phone", "public_transport",
    "railway", "service", "surface", "tunnel", "website", "zip_left",
    "zip_right")

  /** Relation roles, order exactly as tags.c:294-316; index IS the code. */
  val roles: Vector[String] = Vector("[OTHER]", "forward", "outer", "inner",
    "from", "to", "via", "south", "platform", "west", "east", "north",
    "stop", "backward", "label", "link", "subarea", "device",
    "intersection", "sign")

  /** strict: memcmp(dictEntry, query, query.len) == 0, i.e. query is a
    * prefix of the dictionary entry (incl. equality). */
  @inline private def matches(dictEntry: String, query: String,
                              strict: Boolean): Boolean =
    if (strict) query.length <= dictEntry.length && dictEntry.startsWith(query)
    else dictEntry == query

  /** encode_tag (tags.c:233-254): >0 table (key,val) code, <0 free-text key
    * code, 0 verbatim. */
  def encodeTag(key: String, value: String, strict: Boolean = false): Int = {
    var code = 1
    var ti = 0
    var done = false
    while (ti < tables.length && !done) {
      val (tk, tvs) = tables(ti)
      if (matches(tk, key, strict)) {
        var v = 0
        while (v < tvs.length) {
          if (matches(tvs(v), value, strict)) return code + v
          v += 1
        }
        done = true   // key found but value not: fall through to free-text
      } else code += tvs.length
      ti += 1
    }
    var f = 0
    while (f < freeTextKeys.length) {
      if (matches(freeTextKeys(f), key, strict)) return -(f + 1)
      f += 1
    }
    0
  }

  /** decode_tag's dictionary part (tags.c:257-289): a positive code back to
    * its canonical (key, value); a negative code to its canonical key. */
  def decodeTable(code: Int): (String, String) = {
    require(code > 0)
    var c = code - 1
    var ti = 0
    while (c >= tables(ti)._2.length) { c -= tables(ti)._2.length; ti += 1 }
    (tables(ti)._1, tables(ti)._2(c))
  }
  def decodeFreeTextKey(code: Int): String = {
    require(code < 0)
    freeTextKeys(-code - 1)
  }

  /** The reference's load-time key drop filter (vex.c:427-431). */
  def isBlacklisted(key: String, strict: Boolean = false): Boolean =
    if (strict)
      matches("created_by", key, strict = true) ||
      matches("import_uuid", key, strict = true) ||
      matches("attribution", key, strict = true) ||
      (key.length >= 6 && (key.startsWith("source") || key.startsWith("tiger:")))
    else
      key == "created_by" || key == "import_uuid" || key == "attribution" ||
      key.startsWith("source") || key.startsWith("tiger:")

  /** One tag through the reference's write->read pipeline: blacklisted ->
    * dropped (None); coded -> canonical dictionary strings; free-text-key
    * code -> canonical key + verbatim value; 0 -> verbatim both. */
  def roundTripTag(key: String, value: String,
                   strict: Boolean = false): Option[(String, String)] = {
    if (isBlacklisted(key, strict)) return None
    val code = encodeTag(key, value, strict)
    if (code > 0) Some(decodeTable(code))
    else if (code < 0) Some((decodeFreeTextKey(code), value))
    else Some((key, value))
  }

  /** Whole tag map through filter + canonicalization (later duplicate keys
    * win, mirroring sequential write order for map-typed inputs). */
  def processTags(tags: Map[String, String],
                  strict: Boolean = false): Map[String, String] =
    tags.flatMap { case (k, v) => roundTripTag(k, v, strict) }

  /** encode_role / decode_role (tags.c:318-330): lossy collapse to 0. */
  def encodeRole(role: String, strict: Boolean = false): Int = {
    var c = 1
    while (c < roles.length) {
      if (matches(roles(c), role, strict)) return c
      c += 1
    }
    0
  }
  def decodeRole(code: Int): String = roles(code)
  def roundTripRole(role: String, strict: Boolean = false): String =
    decodeRole(encodeRole(role, strict))

  // ---- Spark surface ---------------------------------------------------------

  /** UDF construction isolated in a NESTED object: the codec half of
    * TagDict (encodeTag/roundTripRole/...) is pure JVM, and the TypeTag
    * materialization inside `udf(...)` would otherwise drag Spark +
    * scala-reflect onto the classpath of every non-Spark client of the
    * dictionaries at TagDict class-verification time. */
  private object udfs {
    val cleanTagsFixed =
      udf((m: Map[String, String]) => if (m == null) null else processTags(m))
    val cleanTagsStrict =
      udf((m: Map[String, String]) => if (m == null) null else processTags(m, strict = true))
    val roleFixed = udf((r: String) => roundTripRole(r))
    val roleStrict = udf((r: String) => roundTripRole(r, strict = true))
  }

  /** Column transform: tags map -> filtered + canonicalized map. (A UDF is
    * acceptable here: dictionary lookups are branchy, run once at ingest,
    * and never sit in a query hot path.) */
  def cleanTags(tags: Column, strict: Boolean = false): Column =
    if (strict) udfs.cleanTagsStrict(tags) else udfs.cleanTagsFixed(tags)

  def canonicalRole(role: Column, strict: Boolean = false): Column =
    if (strict) udfs.roleStrict(role) else udfs.roleFixed(role)

  /** Apply the load-time tag pipeline to a planet table. */
  def withCleanTags(df: DataFrame, strict: Boolean = false): DataFrame =
    df.withColumn("tags", cleanTags(col("tags"), strict))

  /** Relation-role frequency table (the tagstats.py:84-99 role census):
    * explode members, run each role through the LOSSY F5 round-trip
    * (encode_role -> decode_role — roles outside the 20-entry dictionary
    * collapse to "[OTHER]"), group by canonical role. strict replicates
    * the reference's prefix compare (a role that is a PREFIX of a
    * dictionary entry matches the first such entry in scan order, e.g.
    * "out" -> "outer", "" -> "forward"). Returns (role, n). */
  def roleStats(relations: DataFrame,
                strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{count, explode, lit}
    relations.select(explode(col("members")).as("m"))
      .select(canonicalRole(col("m").getField("role"), strict).as("role"))
      .groupBy("role").agg(count(lit(1)).as("n"))
  }
}
