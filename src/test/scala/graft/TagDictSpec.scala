package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.functions.TagDict

/** Tag/role codec vs hand-computed vectors from the reference tables,
  * incl. the B4 prefix-match quirks and lossy role collapse. */
class TagDictSpec extends AnyFunSuite {

  test("code layout: one-based, concatenated tables") {
    assert(TagDict.encodeTag("highway", "residential") == 1)
    assert(TagDict.encodeTag("highway", "service") == 2)
    assert(TagDict.encodeTag("highway", "mini_roundabout") == 32)
    assert(TagDict.encodeTag("building", "yes") == 33)
    assert(TagDict.encodeTag("landuse", "forest") == 41)
    assert(TagDict.encodeTag("footway", "yes") == 119)   // last table, last val
    // all positive codes fit int8 (the reference stores them in one byte)
    assert(TagDict.tables.map(_._2.length).sum == 119)
  }

  test("free-text keys: negative one-based codes; unknown -> 0") {
    assert(TagDict.encodeTag("addr:postcode", "12345") == -1)
    assert(TagDict.encodeTag("name", "Main Street") == -22)
    assert(TagDict.encodeTag("zip_right", "x") == -32)  // 32 free-text keys
    assert(TagDict.encodeTag("completely_unknown", "x") == 0)
    // key in a KV table but value unknown falls through to free-text
    assert(TagDict.encodeTag("highway", "weird_value") == -18)
    // key in KV table, value unknown, key NOT in free-text -> 0
    assert(TagDict.encodeTag("traffic_calming", "weird") == 0)
  }

  test("decode inverts encode for dictionary codes") {
    for (((k, vs), _) <- TagDict.tables.zipWithIndex; v <- vs) {
      val c = TagDict.encodeTag(k, v)
      assert(c > 0 && TagDict.decodeTable(c) == ((k, v)), s"$k=$v -> $c")
    }
    TagDict.freeTextKeys.zipWithIndex.foreach { case (k, i) =>
      assert(TagDict.decodeFreeTextKey(-(i + 1)) == k)
    }
  }

  test("B4 strict mode: prefix of a dictionary entry matches") {
    // key "high" is a prefix of table key "highway"; value "resid" a prefix
    // of "residential" => canonicalizes to the full entry
    assert(TagDict.encodeTag("high", "resid", strict = true) == 1)
    assert(TagDict.roundTripTag("high", "resid", strict = true)
      .contains(("highway", "residential")))
    // same inputs in fixed mode stay verbatim
    assert(TagDict.encodeTag("high", "resid") == 0)
    assert(TagDict.roundTripTag("high", "resid").contains(("high", "resid")))
    // key "high" with unknown value prefix-matches free-text "highway" (-18)
    assert(TagDict.encodeTag("high", "zzz", strict = true) == -18)
  }

  test("blacklist: exact + source*/tiger:* in fixed; prefix quirks in strict") {
    Seq("created_by", "import_uuid", "attribution", "source", "source:xyz",
        "tiger:county").foreach { k =>
      assert(TagDict.isBlacklisted(k), k)
      assert(TagDict.isBlacklisted(k, strict = true), k)
    }
    assert(!TagDict.isBlacklisted("name"))
    // strict quirk: a key that is a PREFIX of a blacklist word is dropped
    assert(TagDict.isBlacklisted("creat", strict = true))
    assert(!TagDict.isBlacklisted("creat"))
    // but short keys never match the fixed-6-byte source/tiger compares
    assert(!TagDict.isBlacklisted("sourc", strict = true))
  }

  test("roles: exact codes, lossy collapse, strict prefix quirk") {
    assert(TagDict.encodeRole("forward") == 1)
    assert(TagDict.encodeRole("outer") == 2)
    assert(TagDict.encodeRole("sign") == 19)
    assert(TagDict.encodeRole("weird_role_xyz") == 0)
    assert(TagDict.roundTripRole("weird_role_xyz") == "[OTHER]")
    assert(TagDict.roundTripRole("inner") == "inner")
    // strict: "out" is a prefix of "outer"
    assert(TagDict.encodeRole("out", strict = true) == 2)
    assert(TagDict.encodeRole("out") == 0)
  }

  test("processTags filters + canonicalizes a whole map") {
    val in = Map("highway" -> "residential", "created_by" -> "JOSM",
      "tiger:cfcc" -> "A41", "name" -> "Elm St", "foo" -> "bar")
    assert(TagDict.processTags(in) ==
      Map("highway" -> "residential", "name" -> "Elm St", "foo" -> "bar"))
  }
}

/** Spark-side UDF surface. */
class TagDictSparkSpec extends SparkFunSuite {
  import spark.implicits._

  test("cleanTags column transform matches the pure function per row") {
    val rows = Seq(
      (1L, Map("highway" -> "residential", "source" -> "bing", "name" -> "A")),
      (2L, Map("created_by" -> "x", "building" -> "yes")),
      (3L, Map[String, String]()))
    val df = rows.toDF("id", "tags")
    val got = graft.functions.TagDict.withCleanTags(df).collect()
      .map(r => r.getLong(0) -> r.getMap[String, String](1).toMap).toMap
    rows.foreach { case (id, tags) =>
      assert(got(id) == graft.functions.TagDict.processTags(tags), s"id=$id")
    }
  }

  test("roleStats: lossy F5 census in fixed and strict (prefix-quirk) modes") {
    import org.apache.spark.sql.functions.{col, struct, lit, array}
    def mem(role: String) = struct(lit(role).as("role"),
      lit(0).cast("byte").as("mtype"), lit(1L).as("ref"))
    val rels = Seq(1L, 2L).toDF("id").select(col("id"), array(
      mem("outer"), mem("inner"), mem("unknown_role"), mem("out"),
      mem("s"), mem("")).as("members"))
    def census(strict: Boolean) =
      graft.functions.TagDict.roleStats(rels, strict).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fixed: exact dictionary match or [OTHER]
    assert(census(strict = false) ==
      Map("outer" -> 2L, "inner" -> 2L, "[OTHER]" -> 8L))
    // strict: "out" is a prefix of "outer"; "s" matches "south" (first
    // s-entry in scan order); "" matches "forward" (prefix of everything)
    assert(census(strict = true) == Map("outer" -> 4L, "inner" -> 2L,
      "south" -> 2L, "forward" -> 2L, "[OTHER]" -> 2L))
  }
}
