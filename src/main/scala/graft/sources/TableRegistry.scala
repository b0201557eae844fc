package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Logical-name → dataset registry (SURVEY.md §1.3): the engine-side
  * analogue of the reference's Postgres dataset catalog
  * (docker-compose.yaml:2-19 in the reference) — maps table names to
  * file-backed loaders (with their scan shims) and projects them into the
  * Spark session catalog as temp views so SQL / GraphQL / NL dialects all
  * resolve the same relations.
  */
object TableRegistry {

  /** All fixture tables; `events`/`embeddings` go through their canonical
    * scan shims (SURVEY.md §1.4) — a registry consumer can never forget
    * them.
    */
  val tables: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region"    -> ((s, d) => Tables.region(s, d)),
    "nation"    -> ((s, d) => Tables.nation(s, d)),
    "customer"  -> ((s, d) => Tables.customer(s, d)),
    "supplier"  -> ((s, d) => Tables.supplier(s, d)),
    "part"      -> ((s, d) => Tables.part(s, d)),
    "orders"    -> ((s, d) => Tables.orders(s, d)),
    "lineitem"  -> ((s, d) => Tables.lineitem(s, d)),
    "events"    -> (Tables.events _),
    "documents" -> ((s, d) => Tables.documents(s, d)),
    "embeddings" -> (Tables.embeddings _)
  )

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    tables.getOrElse(name,
      throw new IllegalArgumentException(s"unknown table: $name"))(s, dir)

  /** Register every table as a temp view (idempotent). */
  def registerAll(s: SparkSession, dir: String): Unit =
    tables.foreach { case (name, fn) => fn(s, dir).createOrReplaceTempView(name) }

  /** Foreign-key graph for dialect translators: (table, relation field) →
    * (target table, local key, target key).
    */
  val relations: Map[(String, String), (String, String, String)] = Map(
    ("orders", "customer")   -> (("customer", "o_custkey", "c_custkey")),
    ("customer", "nation")   -> (("nation", "c_nationkey", "n_nationkey")),
    ("supplier", "nation")   -> (("nation", "s_nationkey", "n_nationkey")),
    ("nation", "region")     -> (("region", "n_regionkey", "r_regionkey")),
    ("lineitem", "orders")   -> (("orders", "l_orderkey", "o_orderkey")),
    ("lineitem", "part")     -> (("part", "l_partkey", "p_partkey")),
    ("lineitem", "supplier") -> (("supplier", "l_suppkey", "s_suppkey"))
  )

  /** One-to-many direction, derived mechanically from `relations` (parent →
    * child table under the child's own name, keys swapped) so the two maps
    * cannot drift: (parent, childTable) -> (childTable, parentKey,
    * childFk). This is the direction nested `<relation>_agg` subtrees
    * aggregate over (customer { orders_agg { … } }).
    */
  val reverseRelations: Map[(String, String), (String, String, String)] =
    relations.map { case ((child, _), (parent, fk, pk)) =>
      (parent, child) -> ((child, pk, fk))
    }
}
