package graft.sources

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The TableCatalog surface over GraftCsv: DDL lifecycle, the declared
  * partition column flowing into INSERTs as the keyed layout, and
  * metadata-only DELETE with its decline shapes. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val s2 = {
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    s.conf.set("spark.sql.catalog.gcat", "graft.sources.v2.GraftCatalog")
    s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
    s.conf.set("graft.test.wh", wh)
    s
  }
  private def wh = s2.conf.get("graft.test.wh")

  test("DDL lifecycle: create namespace/table, insert, select, rename, drop") {
    s2.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lab")
    s2.sql("CREATE TABLE gcat.lab.t1 (id BIGINT, name STRING, score DOUBLE)")
    assert(s2.sql("SHOW TABLES IN gcat.lab").collect().map(_.getString(1)).contains("t1"))
    s2.sql("INSERT INTO gcat.lab.t1 VALUES (1, 'a', 1.5), (2, 'b', NULL), (3, NULL, 3.5)")
    assert(s2.sql("SELECT * FROM gcat.lab.t1").count() == 3)
    // overwrite truncates the previous generation
    s2.sql("INSERT OVERWRITE gcat.lab.t1 VALUES (9, 'z', 9.0)")
    assert(s2.sql("SELECT id FROM gcat.lab.t1").collect().map(_.getLong(0)).toSeq == Seq(9L))
    // RENAME TO takes a catalog-relative name (same-catalog contract)
    s2.sql("ALTER TABLE gcat.lab.t1 RENAME TO lab.t2")
    assert(s2.sql("SELECT id FROM gcat.lab.t2").count() == 1)
    assert(!s2.catalog.tableExists("gcat.lab.t1"))
    s2.sql("DROP TABLE gcat.lab.t2")
    assert(!s2.catalog.tableExists("gcat.lab.t2"))
  }

  test("PARTITIONED BY flows into inserts: key-pure files without caller repartition") {
    import graft.sources.v2.GraftCsv
    s2.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lab")
    s2.sql("CREATE TABLE gcat.lab.keyed (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    s2.createDataFrame((0 until 200).map(i => (i.toLong % 5, i.toLong)))
      .toDF("k", "v").createOrReplaceTempView("keyed_src")
    s2.sql("INSERT INTO gcat.lab.keyed SELECT * FROM keyed_src")
    // declared key + write-side required clustering → one file per key
    assert(GraftCsv.listDataFiles(s"$wh/lab/keyed").size == 5)
    assert(GraftCsv.readKeys(s"$wh/lab/keyed").size == 5)
    assert(s2.sql("SELECT sum(v) FROM gcat.lab.keyed").collect().head.getLong(0)
      == (0 until 200).sum)
  }

  test("DELETE: metadata-only drops for provable files, copy-on-write for mixed") {
    import graft.sources.v2.GraftCsv
    s2.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lab")
    s2.sql("CREATE TABLE gcat.lab.del (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    s2.createDataFrame((0 until 100).map(i => (i.toLong % 4, i.toLong)))
      .toDF("k", "v").createOrReplaceTempView("del_src")
    s2.sql("INSERT INTO gcat.lab.del SELECT * FROM del_src")
    assert(GraftCsv.listDataFiles(s"$wh/lab/del").size == 4)
    // key predicate: key-pure files are provably all-match or no-match —
    // pure metadata path, zero rewrites
    s2.sql("DELETE FROM gcat.lab.del WHERE k >= 2")
    assert(GraftCsv.lastDeleteStats.get() == ((2, 0, 2)))
    assert(GraftCsv.listDataFiles(s"$wh/lab/del").size == 2)
    assert(s2.sql("SELECT k, count(*) FROM gcat.lab.del GROUP BY k ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 25L), (1L, 25L)))
    // AND of key predicates still proves per-file
    s2.sql("DELETE FROM gcat.lab.del WHERE k >= 0 AND k <= 0")
    assert(GraftCsv.listDataFiles(s"$wh/lab/del").size == 1)
    // a predicate cutting INSIDE the remaining file (k=1: v in 1,5,...,97)
    // is COPY-ON-WRITE (round-12 verdict #3): that one file is rewritten
    // without the matching rows; nothing else is touched
    s2.sql("DELETE FROM gcat.lab.del WHERE v < 50")
    assert(GraftCsv.lastDeleteStats.get() == ((0, 1, 0)))
    val survivors = s2.sql("SELECT v FROM gcat.lab.del ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(survivors == (53L to 97L by 4L), s"got $survivors")
    // keyed + skipping metadata regenerated for the replacement file: the
    // keyed layout still reports exactly one key, and a follow-up range
    // DELETE proves all-match from the NEW stats (min is now 53) —
    // metadata-only again, zero rewrites
    val keys = GraftCsv.readKeys(s"$wh/lab/del")
    assert(keys.size == 1 && keys.values.head._2 == 1L, s"keys after rewrite: $keys")
    s2.sql("DELETE FROM gcat.lab.del WHERE v >= 50")
    assert(GraftCsv.lastDeleteStats.get() == ((1, 0, 0)))
    assert(s2.sql("SELECT count(*) FROM gcat.lab.del").collect().head.getLong(0) == 0)
  }

  test("copy-on-write splits a non-key-pure file into key-pure replacements, losing nothing") {
    import graft.sources.v2.GraftCsv
    s2.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lab")
    s2.sql("CREATE TABLE gcat.lab.mixcow (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    s2.sql("INSERT INTO gcat.lab.mixcow VALUES (0, 10), (0, 12), (1, 14), (1, 16)")
    // a PROGRAMMATIC append without the key option lands ONE file mixing
    // both k values (legal: the writer only keys when asked) — the shape
    // where a rewrite must fan out into multiple key-pure sinks
    s2.createDataFrame(Seq((0L, 5L), (0L, 11L), (1L, 7L), (1L, 13L))).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.v2.GraftCsv").mode("append")
      .save(s"$wh/lab/mixcow")
    s2.sql("DELETE FROM gcat.lab.mixcow WHERE v < 10")
    // the two SQL-inserted key files are provably no-match (v >= 10);
    // only the mixed file rewrites — into one replacement PER KEY VALUE,
    // every sink landed (a head-only take would silently destroy k=1's
    // survivors)
    assert(GraftCsv.lastDeleteStats.get() == ((0, 1, 2)))
    val left = s2.sql("SELECT k, v FROM gcat.lab.mixcow ORDER BY k, v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(left == Seq((0L, 10L), (0L, 11L), (0L, 12L), (1L, 13L), (1L, 14L), (1L, 16L)),
      s"got $left")
    // the replacements carry keys metadata: the keyed layout is RESTORED
    // (4 key-pure files where the foreign append had voided the claim)
    assert(GraftCsv.readKeys(s"$wh/lab/mixcow").size == 4)
  }

  test("DELETE three-valued logic: NOT(v = x) never deletes NULL rows") {
    s2.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lab")
    s2.sql("CREATE TABLE gcat.lab.del3 (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    s2.sql("INSERT INTO gcat.lab.del3 VALUES (1, 5), (1, 7), (1, NULL)")
    // SQL: NOT(NULL = 5) is UNKNOWN → the NULL row survives; a
    // two-valued evaluator would mis-delete it
    s2.sql("DELETE FROM gcat.lab.del3 WHERE NOT (v = 5)")
    val left = s2.sql("SELECT v FROM gcat.lab.del3").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(left == Set(Some(5L), None), s"got $left")
  }

  test("DELETE declines: stats-less foreign file, unevaluable filter shape") {
    import graft.sources.v2.GraftCsv
    s2.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lab")
    s2.sql("CREATE TABLE gcat.lab.delx (k BIGINT, name STRING) PARTITIONED BY (k)")
    s2.sql("INSERT INTO gcat.lab.delx VALUES (1, 'alpha'), (2, 'beta')")
    // an unevaluable shape (LIKE → StringStartsWith) declines at analysis
    val e1 = intercept[AnalysisException] {
      s2.sql("DELETE FROM gcat.lab.delx WHERE name LIKE 'a%'")
    }
    assert(e1.getMessage.toLowerCase.contains("delete"), e1.getMessage)
    // a file dropped in from OUTSIDE the two-phase writer has no manifest
    // stats → unknown provenance, the whole DELETE declines loudly
    val foreign = new java.io.PrintWriter(s"$wh/lab/delx/foreign.csv")
    foreign.println("k,name"); foreign.println("3,gamma"); foreign.close()
    val e2 = intercept[AnalysisException] {
      s2.sql("DELETE FROM gcat.lab.delx WHERE k = 1")
    }
    assert(e2.getMessage.toLowerCase.contains("delete"), e2.getMessage)
    assert(new java.io.File(s"$wh/lab/delx/foreign.csv").delete())
    // with provenance restored the same DELETE completes
    s2.sql("DELETE FROM gcat.lab.delx WHERE k = 1")
    assert(s2.sql("SELECT count(*) FROM gcat.lab.delx").collect().head.getLong(0) == 1)
  }

  test("create declines unsupported column types and multi-column partitioning") {
    s2.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lab")
    intercept[Exception] {
      s2.sql("CREATE TABLE gcat.lab.badtype (id BIGINT, ts TIMESTAMP)")
    }
    intercept[Exception] {
      s2.sql("CREATE TABLE gcat.lab.badpart (a BIGINT, b BIGINT) PARTITIONED BY (a, b)")
    }
    intercept[Exception] { // string partition key: keyed-layout contract
      s2.sql("CREATE TABLE gcat.lab.badkey (a STRING, b BIGINT) PARTITIONED BY (a)")
    }
    assert(!s2.catalog.tableExists("gcat.lab.badtype"))
  }
}
