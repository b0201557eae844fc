package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** JDBC-backed metadata catalog — the relational twin of the JSON-file
  * [[CatalogStore]], filling the role the reference assigns to a Postgres
  * 17 database with diesel migrations (/root/reference/docker-compose.yaml:2-19,
  * flake.nix:26): durable `name → (path, format, options)` dataset state
  * with schema migrations and transactional multi-client writes.
  *
  * Runs here on embedded Derby (shipped with the Spark distribution, so
  * zero added dependencies; the DB is a directory). Everything is plain
  * JDBC + ANSI SQL, so a Postgres deployment is a URL swap — the
  * migration runner, the upsert transaction, and the reader are already
  * written against the lowest-common-denominator surface (no Derby-only
  * syntax).
  *
  * Concurrency contract: writes are serialized transactions
  * (delete+insert of one name under TRANSACTION_SERIALIZABLE), so two
  * clients registering concurrently cannot corrupt the table or lose each
  * other's rows — the multi-writer semantics the reference's Postgres
  * choice implies, proven by ServingSpec's concurrent-session test.
  * Embedded Derby scopes "client" to connections within one JVM (the
  * driver process — where catalog access lives); a multi-process
  * deployment swaps the URL to Derby network server or Postgres and the
  * code is unchanged.
  *
  * Scale note: like CatalogStore, this holds table LOCATIONS, never data —
  * O(registered datasets), independent of corpus volume.
  */
object JdbcCatalog {

  private val mapper = new ObjectMapper()

  /** Ordered, append-only migrations (the diesel-style ladder). The
    * current version lives in `catalog_version`; `migrate` applies every
    * step beyond it transactionally, so any client can bring any older
    * catalog forward and concurrent migrators are safe.
    */
  private val Migrations: Seq[Seq[String]] = Seq(
    // v1: the dataset registry
    Seq(
      """CREATE TABLE datasets (
           name VARCHAR(128) NOT NULL PRIMARY KEY,
           path VARCHAR(1024) NOT NULL,
           format VARCHAR(64) NOT NULL,
           options_json VARCHAR(4096) NOT NULL)"""),
    // v2: registration audit timestamp (exercises the multi-step ladder)
    Seq(
      """ALTER TABLE datasets
           ADD COLUMN registered_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP""")
  )

  def schemaVersion: Int = Migrations.size

  /** Open (and on first touch create + migrate) the catalog DB at `dir`. */
  def connect(dir: String): Connection = {
    // keep Derby's log out of the working directory
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/graft-derby.log")
    val c = DriverManager.getConnection(s"jdbc:derby:$dir;create=true")
    c.setTransactionIsolation(Connection.TRANSACTION_SERIALIZABLE)
    migrate(c)
    c
  }

  private def hasTable(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  private def migrate(c: Connection): Unit = {
    val auto = c.getAutoCommit
    c.setAutoCommit(false)
    try {
      if (!hasTable(c, "catalog_version")) {
        try {
          val st = c.createStatement()
          try {
            st.executeUpdate("CREATE TABLE catalog_version (v INT NOT NULL)")
            st.executeUpdate("INSERT INTO catalog_version VALUES (0)")
          } finally st.close()
          c.commit()
        } catch {
          // a concurrent migrator won the race to create it — fine
          case e: SQLException if e.getSQLState == "X0Y32" => c.rollback()
        }
      }
      var applied = true
      while (applied) {
        applied = false
        val st = c.createStatement()
        try {
          val rs = st.executeQuery("SELECT v FROM catalog_version")
          val v = { rs.next(); rs.getInt(1) }
          rs.close()
          if (v < Migrations.size) {
            // claim exactly step v+1; a concurrent migrator's claim makes
            // this UPDATE match zero rows and we re-read
            val claimed = st.executeUpdate(
              s"UPDATE catalog_version SET v = ${v + 1} WHERE v = $v")
            if (claimed == 1) Migrations(v).foreach(st.executeUpdate)
            c.commit()
            applied = true
          }
        } finally st.close()
      }
    } finally c.setAutoCommit(auto)
  }

  /** Add-or-replace one registration — one serializable transaction, so
    * concurrent writers interleave atomically (no lost updates, no
    * duplicate-key crashes). Transient serialization conflicts (deadlock
    * 40001 / lock timeout 40XL1 — the expected cost of SERIALIZABLE under
    * contention) are retried; every other failure rolls back and rethrows.
    */
  def register(c: Connection, e: CatalogStore.Entry): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      try { registerOnce(c, e); done = true }
      catch {
        case ex: SQLException
            if Set("40001", "40XL1")(ex.getSQLState) && attempts < 5 =>
          Thread.sleep(20L * attempts)
      }
    }
  }

  private def registerOnce(c: Connection, e: CatalogStore.Entry): Unit = {
    val auto = c.getAutoCommit
    c.setAutoCommit(false)
    try {
      val del = c.prepareStatement("DELETE FROM datasets WHERE name = ?")
      try { del.setString(1, e.name); del.executeUpdate() } finally del.close()
      val ins = c.prepareStatement(
        "INSERT INTO datasets (name, path, format, options_json) VALUES (?, ?, ?, ?)")
      try {
        ins.setString(1, e.name)
        ins.setString(2, e.path)
        ins.setString(3, e.format)
        val opts = mapper.createObjectNode()
        e.options.foreach { case (k, v) => opts.put(k, v) }
        ins.setString(4, mapper.writeValueAsString(opts))
        ins.executeUpdate()
      } finally ins.close()
      c.commit()
    } catch {
      case t: Throwable => c.rollback(); throw t
    } finally c.setAutoCommit(auto)
  }

  def unregister(c: Connection, name: String): Unit = {
    val st = c.prepareStatement("DELETE FROM datasets WHERE name = ?")
    try { st.setString(1, name); st.executeUpdate() } finally st.close()
  }

  def load(c: Connection): Seq[CatalogStore.Entry] = {
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(
        "SELECT name, path, format, options_json FROM datasets ORDER BY name")
      val buf = scala.collection.mutable.ListBuffer.empty[CatalogStore.Entry]
      while (rs.next()) {
        val opts = mapper.readTree(rs.getString(4)).properties().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap
        buf += CatalogStore.Entry(rs.getString(1), rs.getString(2), rs.getString(3), opts)
      }
      rs.close()
      buf.toList
    } finally st.close()
  }

  /** Project every cataloged dataset into the session as a temp view —
    * same restart contract as [[CatalogStore.registerAll]]: a brand-new
    * SparkSession + a fresh connection reproduces the queryable catalog.
    */
  def registerAll(s: SparkSession, c: Connection): Unit =
    load(c).foreach { e =>
      s.read.format(e.format).options(e.options).load(e.path)
        .createOrReplaceTempView(e.name)
    }
}
