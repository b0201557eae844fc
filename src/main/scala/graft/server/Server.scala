package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dialects.{GraphQL, NlToSql}
import graft.sources.{CatalogStore, DatasetRegistry, JdbcCatalog, TableRegistry}

/** The serving seam (reference README.md:2 — "a blazingly fast web
  * interface to query tabular files"; karna-server/src/lib.rs:1-14 is the
  * reference's dedicated-but-stub server crate).
  *
  * `handle` is the in-process request→result function a server wraps: one
  * request names a dialect (`sql` | `graphql` | `nl`), a query string, and
  * a data directory; all three dialects lower onto the same registry-backed
  * operator space, so the full engine surface is reachable through it.
  * `HttpApi` is the thin HTTP wrapper (JDK built-in `com.sun.net.httpserver`
  * — no extra dependency): POST /query with a JSON body, JSON rows back.
  *
  * Scale note: serving is driver-side *control* plane only — the query
  * itself still executes as a distributed Spark plan. The only collect is
  * the response materialization, which is capped (`maxRows`, default 1000)
  * so an unbounded SELECT can never OOM the serving JVM.
  */
object Server {

  val DefaultMaxRows = 1000

  /** Hard server-side ceiling on `maxRows`: the response materialization
    * is the ONLY collect in the serving path, and a client-supplied bound
    * must not be able to turn it into a full-table collect (driver OOM).
    * Requests above the ceiling are rejected loudly, not silently
    * clamped.
    */
  val HardMaxRows = 100000

  final case class ServeRequest(
      dialect: String,
      query: String,
      dir: String,
      maxRows: Int = DefaultMaxRows,
      params: Map[String, Any] = Map.empty)

  /** Route one request through the matching dialect front-end. Returns the
    * (lazy, distributed) DataFrame — callers choose how to consume it.
    *
    * Isolation: each request runs in `s.newSession()` — same
    * SparkContext, shared cache, but a PRIVATE temp-view catalog.
    * Without it, two pooled requests with different `dir`s race on the
    * session-global view names (`orders`, `lineitem`, …): one request's
    * registerAll re-points the views mid-analysis of the other, which
    * then silently reads the wrong directory's data.
    *
    * The sql dialect is gated read-only through the same
    * [[graft.dialects.NlGate]] every NL translation passes (parseable,
    * no DDL/DML command, catalog tables only, no reflection builtins) —
    * the console is a query surface, and rejecting commands up front
    * also makes `explain` genuinely planning-only (Spark executes
    * commands EAGERLY inside `s.sql`, so an ungated CTAS would run —
    * full job and write — before any explain flag was consulted).
    *
    * SQL requests may carry named parameters bound to `:name` markers —
    * the injection-safe serving surface (values go through Catalyst
    * literal binding, never string splicing); non-SQL dialects reject
    * params loudly rather than ignore them.
    */
  def handle(s: SparkSession, req: ServeRequest): DataFrame = {
    // cross-process coherence (round 17): observe peer replicas' dataset
    // registrations/unregistrations before resolving this request's
    // tables — one single-row stamp SELECT when nothing changed, a no-op
    // without an attached catalog
    DatasetRegistry.syncIfStale(Some(s))
    val sess = s.newSession()
    req.dialect.toLowerCase match {
      case "sql" =>
        TableRegistry.registerAll(sess, req.dir)
        graft.dialects.NlGate.validate(sess, req.query)
        if (req.params.isEmpty) sess.sql(req.query)
        else sess.sql(req.query, req.params)
      case _ if req.params.nonEmpty =>
        throw new IllegalArgumentException(
          s"params are only supported for dialect 'sql', got '${req.dialect}'")
      case "graphql" =>
        // write-path durability guard (round-14 ADVICE): a mutation on a
        // catalog-less serving process would silently create process-
        // lifetime-only state — the exact state the REST write routes
        // reject loudly. Checked against the registry the mutation
        // actually targets (round 15: saved-query mutations guard on
        // SavedQueries' attachment, dataset mutations on
        // DatasetRegistry's), so a partially attached process can never
        // accept a write its durable store won't hold.
        GraphQL.mutationRoot(req.query).foreach { root =>
          val durable =
            if (root == "saveQuery" || root == "deleteQuery")
              graft.dialects.SavedQueries.isDurable
            else DatasetRegistry.isDurable
          require(durable,
            "no catalog configured (start the server with a catalog " +
              "directory to apply mutations)")
        }
        GraphQL.run(sess, req.dir, req.query)
      case "nl"      => NlToSql.run(sess, req.dir, req.query)
      case other =>
        throw new IllegalArgumentException(
          s"unknown dialect: '$other' (expected sql | graphql | nl)")
    }
  }

  private val mapper = new ObjectMapper()

  /** Per-request execution budget (round 14): without one, a single
    * pathological-but-gated query (NlGate blocks commands, not expensive
    * SELECTs — a self-join on a non-key column computes fully before the
    * maxRows cap ever applies) holds its pool thread for as long as the
    * join takes, and 8 of them make the server unresponsive. Env
    * GRAFT_QUERY_TIMEOUT_MS (default 5 minutes; <= 0 disables). Enforced
    * the Spark-native way: each request's actions run under a unique JOB
    * GROUP on the request thread, and a daemon watchdog cancels the
    * group at the deadline — executors stop promptly
    * (interruptOnCancel), the pool thread is freed, and the client gets
    * a loud timeout error instead of a hung connection. Driver-side
    * planning is not cancellable this way, but planning is why `explain`
    * is safe to offer every client; only execution carries the budget.
    */
  /** Test seam: specs can't set process env, so the override wins when
    * present. The env is parsed ONCE (first use) with validation: a
    * malformed value (e.g. '5m', empty) previously threw
    * NumberFormatException inside EVERY /query request — a confusing
    * per-request error for a deploy-time mistake. Now it logs one loud
    * warning and falls back to the default (round-15 ADVICE).
    */
  @volatile private[graft] var timeoutOverrideMs: Option[Long] = None

  /** Optional bootstrap gate for the trust-on-first-use window (round-15
    * verdict item 5): while NO users exist the server is open by design —
    * but on a networked deploy that means whoever reaches the port first
    * mints the first key. Setting GRAFT_BOOTSTRAP_TOKEN closes the race:
    * the FIRST `POST /users` must then present the token as its bearer
    * credential. Unset (the embedded/trusted default) nothing changes.
    * Outer Option is the test seam (specs can't set process env);
    * inner Option is "no token configured".
    */
  @volatile private[graft] var bootstrapTokenOverride: Option[Option[String]] = None
  private lazy val envBootstrapToken: Option[String] =
    sys.env.get("GRAFT_BOOTSTRAP_TOKEN").map(_.trim).filter(_.nonEmpty)
  private[graft] def bootstrapToken: Option[String] =
    bootstrapTokenOverride.getOrElse(envBootstrapToken)
  val DefaultQueryTimeoutMs = 300000L
  private lazy val envTimeoutMs: Long =
    sys.env.get("GRAFT_QUERY_TIMEOUT_MS").map(_.trim) match {
      case Some(v) =>
        try v.toLong
        catch {
          case _: NumberFormatException =>
            System.err.println(
              s"[serve] GRAFT_QUERY_TIMEOUT_MS='$v' is not a whole number of " +
                s"milliseconds; using the default ${DefaultQueryTimeoutMs}ms")
            DefaultQueryTimeoutMs
        }
      case None => DefaultQueryTimeoutMs
    }
  private def queryTimeoutMs: Long = timeoutOverrideMs.getOrElse(envTimeoutMs)

  private lazy val watchdog =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-query-watchdog"); t.setDaemon(true); t
    })

  /** Does this exception (or any cause in its chain) look like Spark's
    * cancellation of OUR job group? Spark signals a watchdog cancel as a
    * SparkException whose message names the cancelled job group ("Job N
    * cancelled part of cancelled job group graft-serve-…"), or as the
    * executor thread's InterruptedException (interruptOnCancel). Matching
    * on the watchdog's own group id — a fresh UUID per request, known at
    * cancel time — is the narrow test the round-15 ADVICE asked for: a
    * genuine failure whose message merely mentions "cancel" (e.g. a
    * user-visible error quoting some other cancelled stage) racing the
    * deadline is NOT relabeled as a serving timeout. Message matching is
    * the only surface Spark offers (no CancellationException subtype),
    * and it runs only when the watchdog HAS fired, so a false negative
    * merely surfaces the raw SparkException.
    */
  private def isCancellation(t: Throwable, group: String): Boolean = {
    var c: Throwable = t
    while (c != null) {
      val cancelled = c match {
        case _: InterruptedException => true
        case se: org.apache.spark.SparkException =>
          Option(se.getMessage).getOrElse("").contains(group)
        case _ => false
      }
      if (cancelled) return true
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  private def withJobTimeout[T](sess: SparkSession, what: String)(body: => T): T = {
    val ms = queryTimeoutMs
    if (ms <= 0) body
    else {
      val sc = sess.sparkContext
      val group = s"graft-serve-${java.util.UUID.randomUUID()}"
      sc.setJobGroup(group, s"$what (timeout ${ms}ms)", interruptOnCancel = true)
      val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
      val kill = watchdog.schedule(new Runnable {
        // AndFutureJobs: a deadline that fires between planning and the
        // first job submission must still take effect, or a
        // slow-to-plan query would dodge its budget entirely
        override def run(): Unit = {
          timedOut.set(true); sc.cancelJobGroupAndFutureJobs(group)
        }
      }, ms, java.util.concurrent.TimeUnit.MILLISECONDS)
      try body
      catch {
        // only a Spark job-CANCELLATION is relabeled as a serving timeout:
        // an unrelated failure racing the deadline (timedOut flips, then
        // the query dies of its own bug) must surface its REAL error, not
        // a misleading timeout wrapper (round-15 ADVICE)
        case e: Throwable if timedOut.get() && isCancellation(e, group) =>
          throw new IllegalStateException(
            s"query exceeded the ${ms}ms serving timeout and was cancelled " +
              "(raise GRAFT_QUERY_TIMEOUT_MS or narrow the query)", e)
      } finally { kill.cancel(false); sc.clearJobGroup() }
    }
  }

  /** JSON request → JSON response (the HTTP body protocol, also usable
    * in-process). Request: {"dialect": "...", "query": "...", "dir": "...",
    * "maxRows": N?, "explain": bool?}. Response: {"columns": [...],
    * "rows": [[...]], "rowCount": N, "truncated": bool}, or with
    * explain=true {"columns": [...], "plan": "..."} (no execution), or
    * {"error": "..."}.
    */
  def handleJson(s: SparkSession, body: String): String = {
    // metering wraps the WHOLE request (parse + translate + execute +
    // render); a request that fails before its dialect parses meters
    // under "invalid" — Metrics closes the key space
    val t0 = System.nanoTime()
    var meterDialect = "invalid"
    var failed = false
    try {
      val node = mapper.readTree(body)
      def req(f: String): String = {
        val v = node.get(f)
        require(v != null && v.isTextual, s"missing string field '$f'")
        v.asText
      }
      // meter attribution FIRST: a request whose dialect parses but whose
      // maxRows/params fail validation must meter under ITS dialect, not
      // "invalid" (review round 16)
      Option(node.get("dialect")).filter(_.isTextual)
        .foreach(v => meterDialect = v.asText)
      val maxRows =
        if (node.has("maxRows")) node.get("maxRows").asInt else DefaultMaxRows
      require(maxRows > 0, "maxRows must be positive")
      require(maxRows <= HardMaxRows,
        s"maxRows must be <= $HardMaxRows (the serving collect ceiling)")
      // optional {"params": {"name": scalar}} — bound, never spliced
      val params: Map[String, Any] =
        if (!node.has("params")) Map.empty
        else {
          val p = node.get("params")
          require(p.isObject, "'params' must be an object of scalars")
          val it = p.fields()
          val b = Map.newBuilder[String, Any]
          while (it.hasNext) {
            val e = it.next()
            val v = e.getValue
            require(v.isTextual || v.isNumber || v.isBoolean,
              s"param '${e.getKey}' must be a string/number/boolean")
            b += e.getKey -> (
              if (v.isTextual) v.asText
              else if (v.isBoolean) v.asBoolean
              else if (v.isIntegralNumber) v.asLong
              else v.asDouble)
          }
          b.result()
        }
      // the whole translate+execute path runs under the request's job
      // group so the watchdog can cancel a runaway execution; explain
      // stays planning-only (no job ever starts under it)
      val dialect = req("dialect")
      withJobTimeout(s, s"$dialect /query") {
        val df = handle(s,
          ServeRequest(dialect, req("query"), req("dir"), maxRows, params))
        // {"explain": true} returns the formatted physical plan INSTEAD of
        // rows — the console's plan-inspection mode. Planning only: the
        // query is analyzed and optimized but no job runs, so explain on an
        // expensive query is always cheap and safe to offer every client.
        if (node.has("explain") && node.get("explain").asBoolean()) {
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val out = mapper.createObjectNode()
          val colArr = out.putArray("columns")
          df.columns.foreach(colArr.add)
          out.put("plan", plan)
          mapper.writeValueAsString(out)
        } else render(df, maxRows)
      }
    } catch {
      case e: Throwable =>
        failed = true
        val err = mapper.createObjectNode()
        err.put("error", Option(e.getMessage).getOrElse(e.getClass.getName))
        // structured disambiguation (round 17, verdict item 5): an
        // ambiguous NL dimension carries its term + resolving qualifier
        // phrases as data — surface them so the console can render
        // clickable choices. Walk the cause chain: dialect exceptions
        // occasionally arrive wrapped.
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .collectFirst { case a: graft.dialects.AmbiguousDimensionException => a }
          .foreach { a =>
            err.put("ambiguous", a.ambiguous)
            val arr = err.putArray("candidates")
            a.candidates.foreach(arr.add)
          }
        mapper.writeValueAsString(err)
    } finally {
      Metrics.record(meterDialect, (System.nanoTime() - t0) / 1000000L, failed)
    }
  }

  /** Driver-safe JSON rendering: fetch maxRows+1 to detect truncation,
    * serialize via the row's JSON encoder (types faithful: timestamps as
    * ISO strings, arrays as arrays).
    */
  private def render(df: DataFrame, maxRows: Int): String = {
    val cols = df.columns
    val rows = df.limit(maxRows + 1).toJSON.collect()
    val truncated = rows.length > maxRows
    val out: ObjectNode = mapper.createObjectNode()
    val colArr: ArrayNode = out.putArray("columns")
    cols.foreach(colArr.add)
    val rowArr: ArrayNode = out.putArray("rows")
    rows.take(maxRows).foreach(r => rowArr.add(mapper.readTree(r)))
    out.put("rowCount", math.min(rows.length, maxRows))
    out.put("truncated", truncated)
    mapper.writeValueAsString(out)
  }

  /** The dataset-management JSON protocol (round 13, verdict item 2 —
    * the karna-db role: the reference's Postgres catalog implies a
    * surface that REGISTERS datasets, reference Cargo.toml:11-13,
    * docker-compose.yaml:2-19). Shared by the HTTP routes below and
    * in-process callers:
    *
    *   POST   {"name","path","format","options"?} → {"registered": {...}}
    *   GET                                        → {"datasets": [...]}
    *   DELETE /datasets/<name>                    → {"unregistered": name}
    *
    * Writes go through [[DatasetRegistry]] — the single write path the
    * GraphQL `registerDataset` mutation also uses — so a registered name
    * immediately resolves in all three query dialects and persists in
    * the attached JDBC catalog (restart-durable).
    */
  /** Returns (HTTP status, JSON body) — round-14 ADVICE: every outcome
    * previously came back 200, so HTTP clients and proxies could not
    * distinguish success without parsing the body. 200 success, 400
    * validation, 404 unknown name, 405 unsupported method (the no-catalog
    * 503 is mapped at the HTTP layer, which owns the catalog state).
    * `validateWith` lets the POST path probe the registered path with a
    * schema-only read before any store writes.
    */
  def handleDatasets(method: String, name: Option[String], body: String,
                     validateWith: Option[SparkSession] = None): (Int, String) = {
    try {
      DatasetRegistry.syncIfStale(validateWith) // list/delete see peer writes
      method match {
        case "GET" =>
          val out = mapper.createObjectNode()
          val arr = out.putArray("datasets")
          DatasetRegistry.list.foreach { e =>
            val n = arr.addObject()
            n.put("name", e.name); n.put("path", e.path); n.put("format", e.format)
            val o = n.putObject("options")
            e.options.foreach { case (k, v) => o.put(k, v) }
          }
          (200, mapper.writeValueAsString(out))
        case "POST" =>
          val node = mapper.readTree(body)
          def req(f: String): String = {
            val v = node.get(f)
            require(v != null && v.isTextual, s"missing string field '$f'")
            v.asText
          }
          // format validation (DatasetRegistry.AllowedFormats) happens at
          // the shared write path — one gate for REST and the gql mutation
          val format = req("format")
          val options: Map[String, String] =
            if (!node.has("options")) Map.empty
            else {
              val p = node.get("options")
              require(p.isObject, "'options' must be an object of strings")
              val it = p.fields()
              val b = Map.newBuilder[String, String]
              while (it.hasNext) {
                val e = it.next()
                require(e.getValue.isTextual, s"option '${e.getKey}' must be a string")
                b += e.getKey -> e.getValue.asText
              }
              b.result()
            }
          val e = DatasetRegistry.register(
            CatalogStore.Entry(req("name"), req("path"), format, options),
            validateWith)
          val out = mapper.createObjectNode()
          val n = out.putObject("registered")
          n.put("name", e.name); n.put("path", e.path); n.put("format", e.format)
          (200, mapper.writeValueAsString(out))
        case "DELETE" =>
          val n = name.getOrElse(
            throw new IllegalArgumentException("DELETE /datasets/<name>"))
          if (!DatasetRegistry.unregister(n))
            throw new NoSuchElementException(s"no such dataset: '$n'")
          val out = mapper.createObjectNode()
          out.put("unregistered", n.toLowerCase)
          (200, mapper.writeValueAsString(out))
        case other =>
          throw new UnsupportedOperationException(
            s"unsupported method $other (GET | POST | DELETE /datasets/<name>)")
      }
    } catch {
      case e: Throwable =>
        val err = mapper.createObjectNode()
        err.put("error", Option(e.getMessage).getOrElse(e.getClass.getName))
        val code = e match {
          case _: NoSuchElementException => 404
          case _: UnsupportedOperationException => 405
          case _ => 400
        }
        (code, mapper.writeValueAsString(err))
    }
  }

  /** The saved-query JSON protocol (round 15, verdict item 1 — the
    * karna-db surface's third implied object). Shared by the HTTP routes
    * below and in-process callers:
    *
    *   POST   /queries {"name","dialect","text"}        → {"saved": {...}}
    *   GET    /queries                                  → {"queries": [...]}
    *   POST   /queries/<name>/run {"dir", "maxRows"?,
    *                               "params"?, "explain"?} → rows JSON
    *   DELETE /queries/<name>                           → {"deleted": name}
    *
    * Writes go through [[graft.dialects.SavedQueries]] — the single write
    * path the `saveQuery` GraphQL mutation also uses — so the save-time
    * dialect gate and duplicate-name rejection are identical across
    * surfaces, and a saved query persists in the attached JDBC catalog
    * (restart-durable). RUNNING a saved query re-enters [[handleJson]]
    * with the stored dialect+text, so execution is byte-identical to an
    * ad-hoc request: same NlGate re-check, same job-group timeout, same
    * maxRows ceiling, same params binding (sql only), same explain mode.
    *
    * Returns (HTTP status, JSON body): 200 success, 400 validation, 404
    * unknown name, 405 unsupported method; the no-catalog 503 for writes
    * is mapped at the HTTP layer, which owns the catalog state.
    */
  def handleQueries(spark: SparkSession, method: String, path: Option[String],
                    body: String): (Int, String) = {
    try {
      graft.dialects.SavedQueries.syncIfStale() // list/run/delete see peer saves
      def node = mapper.readTree(if (body.isEmpty) "{}" else body)
      (method, path) match {
        case ("GET", None) =>
          val out = mapper.createObjectNode()
          val arr = out.putArray("queries")
          graft.dialects.SavedQueries.list.foreach { e =>
            val n = arr.addObject()
            n.put("name", e.name); n.put("dialect", e.dialect); n.put("text", e.text)
          }
          (200, mapper.writeValueAsString(out))
        case ("POST", None) =>
          val b = node
          def req(f: String): String = {
            val v = b.get(f)
            require(v != null && v.isTextual, s"missing string field '$f'")
            v.asText
          }
          val e = graft.dialects.SavedQueries.save(spark,
            graft.dialects.SavedQueries.Entry(req("name"), req("dialect"), req("text")))
          val out = mapper.createObjectNode()
          val n = out.putObject("saved")
          n.put("name", e.name); n.put("dialect", e.dialect)
          (200, mapper.writeValueAsString(out))
        case ("POST", Some(p)) if p.endsWith("/run") =>
          val name = p.stripSuffix("/run")
          val saved = graft.dialects.SavedQueries.get(name).getOrElse(
            throw new NoSuchElementException(s"no such saved query: '$name'"))
          val b = node
          // re-enter the ad-hoc path: stored dialect+text + the run
          // request's dir/maxRows/params/explain, rebuilt as the /query
          // body (Jackson-built, so the stored text can never break the
          // envelope)
          val req = mapper.createObjectNode()
          req.put("dialect", saved.dialect)
          req.put("query", saved.text)
          val dir = b.get("dir")
          require(dir != null && dir.isTextual, "missing string field 'dir'")
          req.put("dir", dir.asText)
          if (b.has("maxRows")) req.set("maxRows", b.get("maxRows"))
          if (b.has("params")) req.set("params", b.get("params"))
          if (b.has("explain")) req.set("explain", b.get("explain"))
          (200, handleJson(spark, mapper.writeValueAsString(req)))
        case ("DELETE", Some(p)) if !p.contains("/") =>
          if (!graft.dialects.SavedQueries.delete(p))
            throw new NoSuchElementException(s"no such saved query: '$p'")
          val out = mapper.createObjectNode()
          out.put("deleted", p.toLowerCase)
          (200, mapper.writeValueAsString(out))
        case (m, p) =>
          throw new UnsupportedOperationException(
            s"unsupported: $m /queries${p.fold("")("/" + _)} (GET | POST | " +
              "POST /queries/<name>/run | DELETE /queries/<name>)")
      }
    } catch {
      case e: Throwable =>
        val err = mapper.createObjectNode()
        err.put("error", Option(e.getMessage).getOrElse(e.getClass.getName))
        val code = e match {
          case _: NoSuchElementException => 404
          case _: UnsupportedOperationException => 405
          case _ => 400
        }
        (code, mapper.writeValueAsString(err))
    }
  }

  /** The user-management JSON protocol (round 15 — the karna-db trio's
    * last object). The API key is generated server-side and returned
    * EXACTLY ONCE in the creation response; only its SHA-256 persists.
    *
    *   POST   /users {"name"}   → {"created": {"name", "apiKey"}}
    *   GET    /users            → {"users": [...]}
    *   DELETE /users/<name>     → {"deleted": name}
    *
    * Enforcement is at the HTTP layer: creating the FIRST user turns
    * bearer-token authentication on for every data/metadata route
    * (bootstrap rule: that first creation is itself open; every later
    * /users write authenticates like everything else).
    */
  def handleUsers(method: String, name: Option[String],
                  body: String): (Int, String) = {
    try {
      graft.sources.UserRegistry.syncIfStale() // list/delete see peer writes
      (method, name) match {
        case ("GET", None) =>
          val out = mapper.createObjectNode()
          val arr = out.putArray("users")
          graft.sources.UserRegistry.list.foreach(arr.add)
          (200, mapper.writeValueAsString(out))
        case ("POST", None) =>
          val node = mapper.readTree(body)
          val v = node.get("name")
          require(v != null && v.isTextual, "missing string field 'name'")
          val (n, key) = graft.sources.UserRegistry.create(v.asText)
          val out = mapper.createObjectNode()
          val c = out.putObject("created")
          c.put("name", n); c.put("apiKey", key)
          (200, mapper.writeValueAsString(out))
        case ("DELETE", Some(n)) =>
          if (!graft.sources.UserRegistry.delete(n))
            throw new NoSuchElementException(s"no such user: '$n'")
          val out = mapper.createObjectNode()
          out.put("deleted", n.toLowerCase)
          (200, mapper.writeValueAsString(out))
        case (m, p) =>
          throw new UnsupportedOperationException(
            s"unsupported: $m /users${p.fold("")("/" + _)} " +
              "(GET | POST | DELETE /users/<name>)")
      }
    } catch {
      case e: Throwable =>
        val err = mapper.createObjectNode()
        err.put("error", Option(e.getMessage).getOrElse(e.getClass.getName))
        val code = e match {
          case _: NoSuchElementException => 404
          case _: UnsupportedOperationException => 405
          case _ => 400
        }
        (code, mapper.writeValueAsString(err))
    }
  }

  /** The browser console (the reference's headline surface — "a blazingly
    * fast web interface to query tabular files", README.md:2): one
    * self-contained static page, shipped as a classpath resource, that
    * drives the same POST /query JSON protocol every other client uses.
    * No build step, no external assets — the page is the whole UI.
    */
  lazy val consoleHtml: String = {
    val in = getClass.getResourceAsStream("/graft/console.html")
    require(in != null, "console.html missing from classpath")
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Thin HTTP wrapper. `port = 0` binds an ephemeral port (tests);
    * `boundPort` reports it. GET / serves the query console; POST /query
    * runs a request; GET /health for liveness; GET /metrics for the
    * per-dialect serving counters; /datasets manages the
    * catalog when `catalogDir` names a JDBC catalog database directory
    * (registrations then survive a server restart — the karna-db
    * contract; without it /datasets rejects writes loudly rather than
    * silently holding process-lifetime state).
    */
  final class HttpApi(spark: SparkSession, port: Int,
                      catalogDir: Option[String] = None) {
    private val http = HttpServer.create(new InetSocketAddress(port), 0)

    private val catalogConn = catalogDir.map { d =>
      // an embedded-Derby directory, or a full JDBC URL (DEPLOY.md §5 —
      // several serving processes sharing one Postgres catalog, the
      // reference's karna-db shape)
      val c = if (d.startsWith("jdbc:")) JdbcCatalog.connectUrl(d)
              else JdbcCatalog.connect(d)
      DatasetRegistry.attach(c) // replay durable rows: the restart path
      graft.dialects.SavedQueries.attach(c) // ditto for saved queries
      graft.sources.UserRegistry.attach(c)  // ditto for users (auth state)
      DatasetRegistry.warmSchemas(spark) // replayed NL columns work pre-traffic
      c
    }

    /** Bearer-token gate (round 15): identity function while no users
      * exist (the embedded/trusted default); once a user is created,
      * every data/metadata route requires `Authorization: Bearer <key>`.
      * Returns Some((401, body)) when the request must be rejected.
      */
    private def bearer(ex: HttpExchange): Option[String] =
      Option(ex.getRequestHeaders.getFirst("Authorization"))
        .map(_.trim).filter(_.regionMatches(true, 0, "Bearer ", 0, 7))
        .map(_.substring(7).trim)

    private def authGate(ex: HttpExchange): Option[(Int, String)] = {
      import graft.sources.UserRegistry
      // coherence BEFORE the auth decision: a key issued by a peer
      // replica must authenticate here now, and a peer's user deletion
      // must revoke access now — auth state is the one registry where
      // restart-latency staleness is a security property, not a UX nit
      UserRegistry.syncIfStale()
      if (!UserRegistry.authRequired) None
      else {
        val user = bearer(ex).flatMap(UserRegistry.authenticate)
        if (user.nonEmpty) None
        else Some((401,
          """{"error":"authentication required (Authorization: Bearer <api key>; keys are issued by POST /users)"}"""))
      }
    }

    /** The trust-on-first-use closure: while no users exist and a
      * bootstrap token is configured, POST /users must present it.
      * Constant-time comparison — the token is a credential.
      */
    private def bootstrapGate(ex: HttpExchange): Option[(Int, String)] =
      bootstrapToken match {
        case Some(tok) if !graft.sources.UserRegistry.authRequired &&
            ex.getRequestMethod == "POST" =>
          val ok = bearer(ex).exists(p =>
            java.security.MessageDigest.isEqual(
              p.getBytes(StandardCharsets.UTF_8),
              tok.getBytes(StandardCharsets.UTF_8)))
          if (ok) None
          else Some((401,
            """{"error":"bootstrap token required (Authorization: Bearer <GRAFT_BOOTSTRAP_TOKEN>) to create the first user"}"""))
        case _ => None
      }

    http.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        // the root context is also the fall-through for unknown paths —
        // serve the console only at exactly "/" so typos 404 loudly
        if (ex.getRequestURI.getPath == "/")
          reply(ex, 200, consoleHtml, "text/html; charset=utf-8")
        else reply(ex, 404, """{"error":"not found"}""")
    })

    http.createContext("/query", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = authGate(ex) match {
        case Some((code, body)) => reply(ex, code, body)
        case None =>
          val resp =
            if (ex.getRequestMethod == "POST") {
              val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
              handleJson(spark, body)
            } else """{"error":"POST a JSON request to /query"}"""
          reply(ex, 200, resp)
      }
    })
    http.createContext("/health", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = reply(ex, 200, """{"status":"ok"}""")
    })
    http.createContext("/metrics", new HttpHandler {
      // authenticates like the data routes (usage patterns are
      // information); /health alone stays open for liveness probes
      override def handle(ex: HttpExchange): Unit = authGate(ex) match {
        case Some((code, body)) => reply(ex, code, body)
        case None => reply(ex, 200, Metrics.snapshotJson(mapper))
      }
    })

    http.createContext("/datasets", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, resp) = authGate(ex).getOrElse {
          if (catalogConn.isEmpty && ex.getRequestMethod != "GET")
            (503, """{"error":"no catalog configured (start the server with a catalog directory to register datasets)"}""")
          else {
            // path suffix names the dataset for DELETE /datasets/<name>
            val name = Option(ex.getRequestURI.getPath)
              .map(_.stripPrefix("/datasets").stripPrefix("/"))
              .filter(_.nonEmpty)
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            handleDatasets(ex.getRequestMethod, name, body, Some(spark))
          }
        }
        reply(ex, code, resp)
      }
    })

    http.createContext("/queries", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val name = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/queries").stripPrefix("/"))
          .filter(_.nonEmpty)
        // reads (list, run) work without a catalog; WRITES on a
        // catalog-less process are rejected like /datasets — a save that
        // survives only until restart is a lie
        val isWrite = ex.getRequestMethod == "DELETE" ||
          (ex.getRequestMethod == "POST" && !name.exists(_.endsWith("/run")))
        val (code, resp) = authGate(ex).getOrElse {
          if (catalogConn.isEmpty && isWrite)
            (503, """{"error":"no catalog configured (start the server with a catalog directory to save queries)"}""")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            handleQueries(spark, ex.getRequestMethod, name, body)
          }
        }
        reply(ex, code, resp)
      }
    })

    http.createContext("/users", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val name = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/users").stripPrefix("/"))
          .filter(_.nonEmpty)
        // bootstrap rule: while NO users exist, POST /users is open (how
        // else would the first key be issued?) unless GRAFT_BOOTSTRAP_TOKEN
        // closes that window; once any user exists, every /users request
        // authenticates like the data routes
        val (code, resp) = bootstrapGate(ex).orElse(authGate(ex)).getOrElse {
          if (catalogConn.isEmpty && ex.getRequestMethod != "GET")
            (503, """{"error":"no catalog configured (start the server with a catalog directory to manage users)"}""")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            handleUsers(ex.getRequestMethod, name, body)
          }
        }
        reply(ex, code, resp)
      }
    })

    private def reply(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "application/json"): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }

    // Bounded request pool: the JDK server's default (null) executor runs
    // every exchange on ONE dispatch thread, serializing clients — a web
    // console with N users would queue head-of-line behind the slowest
    // query. A fixed pool admits a bounded number of concurrent requests
    // (admission control at the HTTP edge); Spark's own scheduler
    // fair-shares executor cores among the admitted jobs, and anything
    // beyond the pool waits in the server's accept queue rather than
    // spawning unbounded driver threads.
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    http.setExecutor(pool)

    def start(): Unit = http.start()
    def boundPort: Int = http.getAddress.getPort
    def stop(): Unit = {
      http.stop(0); pool.shutdown()
      catalogConn.foreach { c =>
        DatasetRegistry.detach(); graft.dialects.SavedQueries.detach()
        graft.sources.UserRegistry.detach(); c.close()
      }
    }
  }
}
