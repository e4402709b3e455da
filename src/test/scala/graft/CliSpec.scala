package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.streaming.Replication

/** End-to-end CLI parity with the reference argparse surface
  * (changesetmd.py:202-230): create → load → init-sequence →
  * replicate → geometry, composed like `changesetmd.py -c -f dump`
  * then `changesetmd.py -r`. */
class CliSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("parse maps every reference flag") {
    val c = Main.parse(List("-d", "/tmp/db", "-c", "-t", "-f", "dump.osm.gz",
      "-r", "http://example.org/feed", "-g", "--init-sequence", "7"))
    assert(c.db.get.toString === "/tmp/db")
    assert(c.create && c.truncate && c.geometry)
    assert(c.bulkFile === Some("dump.osm.gz"))
    assert(c.replicateSrc === Some("http://example.org/feed"))
    assert(c.initSequence === Some(7L))
    intercept[IllegalArgumentException](Main.parse(List("--bogus")))
  }

  test("create+load+replicate+geometry lifecycle end-to-end") {
    val root = Files.createTempDirectory("graft_cli")
    val db = root.resolve("db")
    val dump = root.resolve("dump.osm.xml.gz")
    graft.sources.OsmXml.writeFixture(dump, graft.sources.OsmXml.bulkFixture)
    val feed = root.resolve("feed")
    Replication.writeFixtureWorld(feed, 3)

    // -c -f dump (EP1)
    val log1 = Main.run(spark, Main.parse(List(
      "-d", db.toString, "-c", "-f", dump.toString)))
    assert(log1.exists(_.startsWith("create:")))
    assert(log1.exists(_.startsWith("load:")))
    assert(Replication.readTable(spark, db.resolve("tables/changesets")).count() === 3)

    // -r refuses the -1 sentinel (changesetmd.py:156-158)
    intercept[IllegalArgumentException] {
      Main.run(spark, Main.parse(List("-d", db.toString, "-r", feed.toString)))
    }

    // --init-sequence 0 then -r (EP2)
    val log2 = Main.run(spark, Main.parse(List(
      "-d", db.toString, "--init-sequence", "0", "-r", feed.toString)))
    assert(log2.exists(_.contains("applied 3 diffs")))
    val cs = Replication.readTable(spark, db.resolve("tables/changesets"))
    assert(cs.count() === 6) // 3 bulk + ids 101..103
    assert(cs.filter($"id" === 11).select("num_changes").head().getInt(0) === 3)

    // -g materializes the envelope struct column
    val log3 = Main.run(spark, Main.parse(List("-d", db.toString, "-g")))
    assert(log3.exists(_.startsWith("geometry:")))
    val geom = spark.read.parquet(db.resolve("tables/changesets_geom").toString)
    val row = geom.filter($"id" === 10).select("geom").head().getStruct(0)
    assert(row.getAs[Int]("srid") === 4326)
    assert(math.abs(row.getAs[Double]("min_lon") - (-74.0474545)) < 1e-9)

    // -t drops contents; a fresh -f reloads
    Main.run(spark, Main.parse(List("-d", db.toString, "-t")))
    assert(!Replication.changesetTable(db.resolve("tables/changesets")).exists)
  }

  test("-r with an http:// URL replicates through the HTTP transport") {
    val root = Files.createTempDirectory("graft_cli_http")
    val db = root.resolve("db")
    val feed = root.resolve("feed")
    Replication.writeFixtureWorld(feed, 2)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val f = feed.resolve(exchange.getRequestURI.getPath.stripPrefix("/"))
      if (java.nio.file.Files.isRegularFile(f)) {
        val bytes = java.nio.file.Files.readAllBytes(f)
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      } else exchange.sendResponseHeaders(404, -1L)
      exchange.close()
    })
    server.start()
    try {
      val log = Main.run(spark, Main.parse(List(
        "-d", db.toString, "-c", "--init-sequence", "0",
        "-r", s"http://127.0.0.1:${server.getAddress.getPort}")))
      assert(log.exists(_.contains("applied 2 diffs")))
      assert(Replication.readTable(spark, db.resolve("tables/changesets"))
        .count() === 3) // id 11 + ids 101, 102
      // staged under the warehouse, fetched over the wire
      assert(java.nio.file.Files.isRegularFile(
        db.resolve("staging").resolve(Replication.sequencePath(2L))))
    } finally server.stop(0)
  }

  test("deep HTTP catch-up stages diffs concurrently, applies strictly in order") {
    val root = Files.createTempDirectory("graft_cli_conc")
    val feed = root.resolve("feed")
    val nDiffs = 12
    Replication.writeFixtureWorld(feed, nDiffs)
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val isDiff = exchange.getRequestURI.getPath.endsWith(".osm.gz")
      if (isDiff) {
        val cur = inFlight.incrementAndGet()
        maxInFlight.getAndUpdate(m => math.max(m, cur))
        Thread.sleep(120) // give overlapping fetches a window to meet in
      }
      try {
        val f = feed.resolve(exchange.getRequestURI.getPath.stripPrefix("/"))
        if (java.nio.file.Files.isRegularFile(f)) {
          val bytes = java.nio.file.Files.readAllBytes(f)
          exchange.sendResponseHeaders(200, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        } else exchange.sendResponseHeaders(404, -1L)
        exchange.close()
      } finally if (isDiff) inFlight.decrementAndGet()
    })
    // the default executor serves requests on ONE thread; concurrency
    // needs a real pool server-side too
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val src = Replication.HttpSource(
        s"http://127.0.0.1:${server.getAddress.getPort}", root.resolve("staging"))
      val state = root.resolve("state.txt")
      Replication.StateDoc.write(state,
        Replication.ReplState(0L, None, updateInProgress = false))
      val applied = Replication.catchUp(spark, src,
        root.resolve("tables/cs"), state, batchSize = 8, nBuckets = 8)
      assert(applied === nDiffs)
      assert(Replication.StateDoc.read(state).lastSequence === nDiffs.toLong)
      // overlap actually happened (8-wide batch, 6-wide pool): without
      // concurrent staging maxInFlight stays 1
      assert(maxInFlight.get() >= 3,
        s"expected overlapping diff fetches, saw max in-flight ${maxInFlight.get()}")
      // last-wins application order held: id 11 carries the HIGHEST seq
      val t = Replication.readTable(spark, root.resolve("tables/cs"))
      assert(t.count() === nDiffs.toLong + 1) // id 11 + ids 101..112
      assert(t.filter($"id" === 11).select("num_changes").head().getInt(0) === nDiffs)
    } finally server.stop(0)
  }
}
