package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dialects
import graft.server.Server
import graft.sources.{CatalogStore, JdbcCatalog}

/** The serving surfaces: in-process request routing, the HTTP API
  * end-to-end, the CLI, and the persistent dataset catalog.
  */
class ServingSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir
  private val mapper = new ObjectMapper()

  // ---- Server.handle routing -------------------------------------------

  test("handle routes sql / graphql / nl to the same engine") {
    val sql = Server.handle(spark, Server.ServeRequest("sql", Dialects.serveSqlQuery, d))
    assert(sql.columns.toSeq === Seq("o_orderstatus", "n_orders", "total_price"))
    assert(sql.count() > 0)

    val gql = Server.handle(spark, Server.ServeRequest("graphql", Dialects.gqlQuery, d))
    assert(gql.columns.toSeq === Seq("o_orderkey", "o_totalprice", "c_name", "c_acctbal"))

    val nl = Server.handle(spark, Server.ServeRequest("nl", Dialects.nlQuestion, d))
    assert(nl.count() === 10)
  }

  test("schema introspection works through the serving seam") {
    val intro = Server.handle(spark,
      Server.ServeRequest("graphql", Dialects.gqlIntrospectQuery, d))
    val names = intro.collect().map(_.getString(0)).toSeq
    assert(names === names.sorted && names.contains("orders") &&
      names.contains("documents"))
  }

  test("handle fails loudly on an unknown dialect") {
    val e = intercept[IllegalArgumentException] {
      Server.handle(spark, Server.ServeRequest("cypher", "MATCH (n)", d))
    }
    assert(e.getMessage.contains("unknown dialect"))
  }

  test("sql params bind as literals — equivalent to inlining, injection-proof") {
    val bound = Server.handle(spark, Server.ServeRequest("sql",
      Dialects.serveSqlParamQuery, d,
      params = Map("status" -> "F", "minTotal" -> 200000))).collect()
    val inlined = spark.sql(Dialects.serveSqlParamQuery
      .replace(":status", "'F'").replace(":minTotal", "200000")).collect()
    assert(bound.toSeq === inlined.toSeq)
    // a quote inside a bound value stays DATA (zero rows), never syntax
    val sneaky = Server.handle(spark, Server.ServeRequest("sql",
      Dialects.serveSqlParamQuery, d,
      params = Map("status" -> "F' OR '1'='1", "minTotal" -> 0))).collect()
    assert(sneaky.isEmpty)
    // non-sql dialects reject params instead of silently dropping them
    val e = intercept[IllegalArgumentException] {
      Server.handle(spark, Server.ServeRequest("nl", Dialects.nlQuestion, d,
        params = Map("x" -> 1)))
    }
    assert(e.getMessage.contains("params"))
  }

  test("handleJson binds params from the JSON body") {
    val body = s"""{"dialect":"sql","dir":"$d","maxRows":10,
      "query":"SELECT count(*) AS n FROM orders WHERE o_orderstatus = :st",
      "params":{"st":"F"}}"""
    val resp = Server.handleJson(spark, body)
    assert(resp.contains("\"rowCount\":1") && !resp.contains("error"), resp)
  }

  test("handleJson renders rows and caps at maxRows") {
    val resp = mapper.readTree(Server.handleJson(spark,
      s"""{"dialect":"sql","query":"SELECT o_orderkey FROM orders ORDER BY o_orderkey","dir":"$d","maxRows":3}"""))
    assert(resp.get("columns").get(0).asText === "o_orderkey")
    assert(resp.get("rowCount").asInt === 3)
    assert(resp.get("truncated").asBoolean)
    val firstKey = Server.handle(spark, Server.ServeRequest(
      "sql", "SELECT o_orderkey FROM orders ORDER BY o_orderkey", d))
      .limit(1).collect()(0).getLong(0)
    assert(resp.get("rows").get(0).get("o_orderkey").asLong === firstKey)
  }

  test("handleJson explain mode returns the physical plan without executing") {
    val resp = mapper.readTree(Server.handleJson(spark,
      s"""{"dialect":"sql","query":"SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag","dir":"$d","explain":true}"""))
    assert(!resp.has("rows") && !resp.has("error"), resp.toString)
    val plan = resp.get("plan").asText
    assert(plan.contains("HashAggregate") && plan.contains("Physical Plan"),
      s"formatted physical plan expected:\n$plan")
    assert(resp.get("columns").get(0).asText === "l_returnflag")
    // every dialect explains — the lazy handle() DataFrame is plan-only
    val nl = mapper.readTree(Server.handleJson(spark,
      s"""{"dialect":"nl","query":"${Dialects.nlQuestion}","dir":"$d","explain":true}"""))
    assert(nl.has("plan") && nl.get("plan").asText.contains("Physical Plan"),
      nl.toString)
  }

  test("handleJson reports errors as JSON, not exceptions") {
    val bad = mapper.readTree(Server.handleJson(spark, """{"dialect":"sql"}"""))
    assert(bad.get("error").asText.contains("query"))
    val badSql = mapper.readTree(Server.handleJson(spark,
      s"""{"dialect":"sql","query":"SELECT FROM nothing","dir":"$d"}"""))
    assert(badSql.has("error"))
  }

  // ---- HTTP E2E ---------------------------------------------------------

  test("HTTP API answers /health and runs all three dialects over POST /query") {
    val api = new Server.HttpApi(spark, 0)
    api.start()
    try {
      val client = HttpClient.newHttpClient()
      def post(body: String): com.fasterxml.jackson.databind.JsonNode = {
        val req = HttpRequest.newBuilder(
            URI.create(s"http://localhost:${api.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        mapper.readTree(client.send(req, HttpResponse.BodyHandlers.ofString()).body())
      }
      val health = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${api.boundPort}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()
      assert(mapper.readTree(health).get("status").asText === "ok")

      val q = Dialects.serveSqlQuery.replace("\"", "\\\"").replace("\n", " ")
      val sql = post(s"""{"dialect":"sql","query":"$q","dir":"$d"}""")
      assert(sql.get("columns").get(2).asText === "total_price")
      // HTTP result equals the direct in-process plan's result
      val direct = Server.handle(spark,
        Server.ServeRequest("sql", Dialects.serveSqlQuery, d)).collect()
      assert(sql.get("rowCount").asInt === direct.length)

      val gq = Dialects.gqlQuery.replace("\"", "\\\"").replace("\n", " ")
      val gql = post(s"""{"dialect":"graphql","query":"$gq","dir":"$d"}""")
      assert(gql.get("columns").get(0).asText === "o_orderkey")
      assert(gql.get("rowCount").asInt > 0)

      val nl = post(s"""{"dialect":"nl","query":"${Dialects.nlQuestion}","dir":"$d"}""")
      assert(nl.get("rowCount").asInt === 10)

      val err = post("""{"dialect":"sql"}""")
      assert(err.has("error"))
    } finally api.stop()
  }

  test("HTTP API serves N concurrent clients with distinct dialects correctly") {
    val api = new Server.HttpApi(spark, 0)
    api.start()
    try {
      val client = HttpClient.newHttpClient()
      def post(body: String): com.fasterxml.jackson.databind.JsonNode = {
        val req = HttpRequest.newBuilder(
            URI.create(s"http://localhost:${api.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        mapper.readTree(client.send(req, HttpResponse.BodyHandlers.ofString()).body())
      }
      // 12 simultaneous clients, three dialects interleaved; each SQL
      // client's result carries its own tag so a cross-wired response
      // (one client receiving another's rows) cannot pass
      val nlQ = Dialects.nlQuestion
      val gq = Dialects.gqlQuery.replace("\"", "\\\"").replace("\n", " ")
      val exec = java.util.concurrent.Executors.newFixedThreadPool(12)
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(exec)
        val futures = (0 until 12).map { i =>
          scala.concurrent.Future {
            i % 3 match {
              case 0 =>
                val r = post(s"""{"dialect":"sql","query":"SELECT count(*) + $i AS n FROM orders","dir":"$d"}""")
                ("sql", i, r)
              case 1 => ("graphql", i, post(s"""{"dialect":"graphql","query":"$gq","dir":"$d"}"""))
              case _ => ("nl", i, post(s"""{"dialect":"nl","query":"$nlQ","dir":"$d","maxRows":4}"""))
            }
          }
        }
        val results = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration(180, "seconds"))
        val nOrders = Server.handle(spark,
          Server.ServeRequest("sql", "SELECT count(*) AS n FROM orders", d))
          .collect()(0).getLong(0)
        results.foreach {
          case ("sql", i, r) =>
            assert(!r.has("error"), s"client $i: $r")
            assert(r.get("rows").get(0).get("n").asLong === nOrders + i,
              s"client $i got a cross-wired or wrong result: $r")
          case ("graphql", i, r) =>
            assert(!r.has("error"), s"client $i: $r")
            assert(r.get("columns").get(0).asText === "o_orderkey", s"client $i: $r")
            assert(r.get("rowCount").asInt > 0)
          case ("nl", i, r) =>
            assert(!r.has("error"), s"client $i: $r")
            // the maxRows cap holds under concurrency, and truncation is
            // reported (nlQuestion returns 10 rows; the cap is 4)
            assert(r.get("rowCount").asInt === 4, s"client $i: $r")
            assert(r.get("truncated").asBoolean, s"client $i: $r")
        }
      } finally exec.shutdown()
    } finally api.stop()
  }

  test("browser console is served at GET / and drives the /query protocol") {
    val api = new Server.HttpApi(spark, 0)
    api.start()
    try {
      val client = HttpClient.newHttpClient()
      def get(path: String): HttpResponse[String] =
        client.send(
          HttpRequest.newBuilder(
            URI.create(s"http://localhost:${api.boundPort}$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      val page = get("/")
      assert(page.statusCode === 200)
      assert(page.headers.firstValue("Content-Type").orElse("").startsWith("text/html"))
      val html = page.body()
      assert(html.contains("<html") && html.contains("fetch('/query'"),
        "the console page must drive the POST /query protocol")
      // round-trip a query exactly the way the page's JS submits it
      val req = HttpRequest.newBuilder(
          URI.create(s"http://localhost:${api.boundPort}/query"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"""{"dialect":"sql","query":"SELECT count(*) AS n FROM orders","dir":"$d","maxRows":100}"""))
        .build()
      val resp = mapper.readTree(
        client.send(req, HttpResponse.BodyHandlers.ofString()).body())
      assert(resp.get("columns").get(0).asText === "n")
      assert(resp.get("rows").get(0).get("n").asLong > 0)
      // unknown paths 404 loudly instead of silently serving the console
      assert(get("/nope").statusCode === 404)
    } finally api.stop()
  }

  // ---- CLI --------------------------------------------------------------

  test("CLI parses args and runs each dialect") {
    val a = Cli.parseArgs(Array("sql", "SELECT 1 AS one", d, "--json", "--max-rows=7"))
    assert(a.json && a.maxRows === 7 && a.dialect === "sql")
    intercept[IllegalArgumentException] { Cli.parseArgs(Array("sql", "q")) }

    val textOut = Cli.run(spark,
      Cli.CliArgs("nl", Dialects.nlQuestion, d, json = false, maxRows = 100))
    assert(textOut.contains("c_name") && textOut.linesIterator.size > 10)

    val jsonOut = mapper.readTree(Cli.run(spark,
      Cli.CliArgs("graphql", Dialects.gqlQuery, d, json = true, maxRows = 5)))
    assert(jsonOut.get("rowCount").asInt === 5 && jsonOut.get("truncated").asBoolean)

    val sqlOut = Cli.run(spark,
      Cli.CliArgs("sql", "SELECT count(*) AS n FROM orders", d, json = false, maxRows = 10))
    assert(sqlOut.contains("| n "))
  }

  // ---- persistent catalog ----------------------------------------------

  test("CatalogStore registrations survive a brand-new session") {
    val file = Files.createTempFile("graft_catalog", ".json")
    Files.delete(file)
    CatalogStore.register(file,
      CatalogStore.Entry("my_orders", s"$d/orders.parquet", "parquet"))
    CatalogStore.register(file,
      CatalogStore.Entry("my_nation", s"$d/nation.parquet", "parquet",
        Map("mergeSchema" -> "false")))
    // replace wins, no duplicate
    CatalogStore.register(file,
      CatalogStore.Entry("my_orders", s"$d/orders.parquet", "parquet"))
    assert(CatalogStore.load(file).map(_.name).sorted === Seq("my_nation", "my_orders"))

    // the restart path: a NEW session (fresh temp-view catalog) + registerAll
    val fresh = spark.newSession()
    assert(!fresh.catalog.tableExists("my_orders"))
    CatalogStore.registerAll(fresh, file)
    assert(fresh.table("my_orders").count() === spark.read.parquet(s"$d/orders.parquet").count())

    CatalogStore.unregister(file, "my_orders")
    assert(CatalogStore.load(file).map(_.name) === Seq("my_nation"))
    Files.delete(file)
  }

  test("JDBC catalog (embedded Derby): migrations, concurrent writers, restart") {
    val dbDir = Files.createTempDirectory("graft_jdbc_cat").resolve("db").toString
    // two concurrent clients — separate connections, interleaved writers
    // over OVERLAPPING names: the serializable upsert must lose no rows
    // and produce no duplicate-key failures
    val c1 = JdbcCatalog.connect(dbDir)
    val c2 = JdbcCatalog.connect(dbDir)
    try {
      def writer(c: java.sql.Connection, names: Seq[String]): Thread = {
        val t = new Thread(() => names.foreach { n =>
          JdbcCatalog.register(c,
            CatalogStore.Entry(n, s"$d/orders.parquet", "parquet",
              Map("mergeSchema" -> "false")))
        })
        t.start(); t
      }
      val names = (1 to 12).map(i => s"ds_$i")
      val (t1, t2) = (writer(c1, names), writer(c2, names.reverse))
      t1.join(60000); t2.join(60000)
      assert(JdbcCatalog.load(c1).map(_.name) === names.sorted,
        "concurrent upserts must converge to exactly one row per name")

      // replace-wins + unregister through a different connection
      JdbcCatalog.register(c2,
        CatalogStore.Entry("ds_1", s"$d/nation.parquet", "parquet"))
      assert(JdbcCatalog.load(c1).find(_.name == "ds_1").get.path.endsWith("nation.parquet"))
      JdbcCatalog.unregister(c1, "ds_2")
      assert(!JdbcCatalog.load(c2).map(_.name).contains("ds_2"))
    } finally { c1.close(); c2.close() }

    // the restart path: fresh connection (re-runs the migration ladder as
    // a no-op) + brand-new session reproduces the queryable catalog
    val c3 = JdbcCatalog.connect(dbDir)
    try {
      val fresh = spark.newSession()
      assert(!fresh.catalog.tableExists("ds_3"))
      JdbcCatalog.registerAll(fresh, c3)
      assert(fresh.table("ds_3").count() ===
        spark.read.parquet(s"$d/orders.parquet").count())
      assert(fresh.table("ds_1").count() ===
        spark.read.parquet(s"$d/nation.parquet").count())
    } finally c3.close()
  }

  test("JDBC catalog dialect parity: the Postgres ladder is the Derby ladder modulo declared types") {
    import JdbcCatalog.{DerbyDialect, PostgresDialect}
    val derby = JdbcCatalog.migrationsFor(DerbyDialect).flatten
    val pg = JdbcCatalog.migrationsFor(PostgresDialect).flatten
    assert(derby.length === pg.length)

    // parameterized types stay one token (VARCHAR(128)); punctuation is
    // structural and identical by construction of the shared template
    def tokens(sql: String): List[String] =
      """VARCHAR\(\d+\)|[A-Za-z_][A-Za-z0-9_]*|\d+""".r.findAllIn(sql).toList
    // 1. token-by-token: the two dialects' DDL may differ ONLY where the
    //    dialect's type map applies — any other divergence (a sneaked-in
    //    Derby-only keyword, a reordered clause) fails here
    derby.zip(pg).foreach { case (dsql, psql) =>
      val dt = tokens(dsql); val pt = tokens(psql)
      assert(dt.length === pt.length, s"clause-shape drift:\n$dsql\n$psql")
      dt.zip(pt).foreach { case (a, b) =>
        assert(a == b || PostgresDialect.typeName(a) == b,
          s"non-type divergence: '$a' vs '$b' in:\n$psql")
      }
    }
    // 2. every keyword/type token the Postgres ladder emits is in the
    //    documented Postgres vocabulary (grammar-subset check — the most
    //    a container with no PG binary or parser can prove); identifiers
    //    and numbers pass through
    val pgVocabulary = Set(
      "CREATE", "TABLE", "ALTER", "ADD", "COLUMN", "NOT", "NULL",
      "PRIMARY", "KEY", "DEFAULT", "CURRENT_TIMESTAMP",
      "TEXT", "TIMESTAMP", "INT") ++
      (128 to 4096).map(n => s"VARCHAR($n)") // VARCHAR(n) is PG-legal too
    pg.foreach { sql =>
      tokens(sql).foreach { tok =>
        val ok = pgVocabulary(tok) || tok.matches("[a-z_][a-z0-9_]*") ||
          tok.matches("\\d+") || tok.matches("VARCHAR\\(\\d+\\)")
        assert(ok, s"token '$tok' not in the Postgres-safe vocabulary: $sql")
      }
    }
    // 3. the PG ladder swaps exactly the declared type (the JSON payload
    //    column goes TEXT); everything else is byte-identical ANSI
    assert(pg.head.contains("options_json TEXT NOT NULL"), pg.head)
    assert(derby.head.contains("options_json VARCHAR(4096) NOT NULL"))
    // 4. URL routing picks the dialect (the "URL swap" entry point) and
    //    each dialect carries its engine's real SQLSTATEs
    assert(JdbcCatalog.dialectFor("jdbc:derby:/tmp/x;create=true") eq DerbyDialect)
    assert(JdbcCatalog.dialectFor("jdbc:postgresql://host/karna_dev") eq PostgresDialect)
    intercept[IllegalArgumentException](JdbcCatalog.dialectFor("jdbc:mysql://x"))
    assert(DerbyDialect.duplicateTableState === "X0Y32")
    assert(PostgresDialect.duplicateTableState === "42P07")
    assert(PostgresDialect.retryableStates("40P01") &&
      !PostgresDialect.retryableStates("40XL1"))
    // 5. the Derby ladder (same generator, Derby dialect) actually RUNS:
    //    a fresh db reaches schemaVersion through the shared migrate path
    val dbDir = java.nio.file.Files.createTempDirectory("graft-dialect-db")
      .resolve("cat").toString
    val c = JdbcCatalog.connect(dbDir)
    try {
      val st = c.createStatement()
      val rs = st.executeQuery("SELECT v FROM catalog_version")
      rs.next()
      assert(rs.getInt(1) === JdbcCatalog.schemaVersion)
      rs.close(); st.close()
    } finally c.close()
  }

  // ---- object-store scheme routing --------------------------------------

  test("engine reads/writes through a non-file scheme (s3a wiring, config-only)") {
    // register the mock object-store FS exactly the way s3a would be:
    // one Hadoop conf key naming the FileSystem impl for the scheme
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock3a.impl", classOf[MockObjectStoreFs].getName)
    val dir = Files.createTempDirectory("graft_mock3a")
    val uri = s"mock3a:${dir.toAbsolutePath}/orders_subset.parquet"

    val src = spark.read.parquet(s"$d/orders.parquet").limit(100)
    src.write.mode("overwrite").parquet(uri)
    val back = spark.read.parquet(uri)
    assert(back.count() === 100)
    assert(back.columns.toSeq === src.columns.toSeq)

    // and the persistent catalog can point a dataset at the object store
    val cat = Files.createTempFile("graft_catalog_s3", ".json")
    CatalogStore.register(cat, CatalogStore.Entry("s3_orders", uri, "parquet"))
    val fresh = spark.newSession()
    CatalogStore.registerAll(fresh, cat)
    assert(fresh.sql("SELECT count(*) AS n FROM s3_orders").collect()(0).getLong(0) === 100)
    Files.delete(cat)
  }

  // ---- per-request isolation + serving hardening ------------------------

  test("concurrent requests with different dirs each read their own data") {
    // each request runs in s.newSession() with a private temp-view
    // catalog; without it two pooled requests race on the shared view
    // names and one silently counts the other's directory
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val expected = dirs.map(dd =>
      dd -> spark.read.parquet(s"$dd/orders.parquet").count()).toMap
    val rounds = Future.traverse(1 to 8) { i =>
      val dd = dirs(i % 2)
      Future {
        val df = Server.handle(spark,
          Server.ServeRequest("sql", "SELECT count(*) AS n FROM orders", dd))
        dd -> df.collect()(0).getLong(0)
      }
    }
    Await.result(rounds, 120.seconds).foreach { case (dd, n) =>
      assert(n === expected(dd), s"request against $dd read the wrong dir")
    }
  }

  test("serving sql is gated read-only; reflection builtins denied; maxRows capped") {
    val ddl = Server.handleJson(spark,
      s"""{"dialect":"sql","dir":"$d","query":"CREATE TABLE boom (x INT) USING parquet"}""")
    assert(ddl.contains("error") && ddl.toLowerCase.contains("read-only"), ddl)
    val refl = Server.handleJson(spark,
      s"""{"dialect":"sql","dir":"$d","query":"SELECT reflect('java.lang.System','getenv','PATH') AS v"}""")
    assert(refl.contains("error") && refl.contains("forbidden"), refl)
    val big = Server.handleJson(spark,
      s"""{"dialect":"sql","dir":"$d","maxRows":2000000000,"query":"SELECT 1 AS one"}""")
    assert(big.contains("error") && big.contains("maxRows"), big)
    // a plain SELECT still flows
    val ok = Server.handleJson(spark,
      s"""{"dialect":"sql","dir":"$d","query":"SELECT 1 AS one"}""")
    assert(ok.contains("\"rowCount\":1"), ok)
  }
}
