package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dialects.{GraphQL, NlToSql}

/** §2.9 dialect keys (SURVEY.md): fixed exemplar queries through the
  * GraphQL and NL front-ends. Both lower onto the same operator space —
  * the oracle for `nl_to_sql` is literally the SQL the translator emits.
  */
object Dialects {

  val gqlQuery: String =
    """{ orders(filter: {o_orderstatus: {eq: "O"}, o_totalprice: {gt: 150000}},
                orderBy: ["o_orderkey"], limit: 50) {
         o_orderkey o_totalprice customer { c_name c_acctbal } } }"""

  /** 3-deep recursive nesting through the fk graph (orders → customer →
    * nation → region), flattened for the oracle.
    */
  val gqlNestedQuery: String =
    """{ orders(filter: {o_orderstatus: {eq: "F"}}, orderBy: ["o_orderkey"], limit: 100) {
         o_orderkey customer { c_name nation { n_name region { r_name } } } } }"""

  /** GraphQL-style pagination: IN-filter + offset/limit after a total order. */
  val gqlPaginateQuery: String =
    """{ customer(filter: {c_mktsegment: {in: ["BUILDING", "AUTOMOBILE"]}, c_acctbal: {gt: 1000}},
                  orderBy: ["c_custkey"], offset: 20, limit: 15) {
         c_custkey c_name c_mktsegment } }"""

  val nlQuestion: String = "top 10 customers by total order price"
  val nlAvgQuestion: String = "average event value by event type"
  val nlCountWhereQuestion: String = "number of orders by status where priority is 1-URGENT"
  val nlTotalWhereQuestion: String = "total order price by status where priority is 2-HIGH"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gql_select" -> ((s, d) => GraphQL.run(s, d, gqlQuery)),
    "gql_nested" -> ((s, d) => GraphQL.run(s, d, gqlNestedQuery)),
    "gql_paginate" -> ((s, d) => GraphQL.run(s, d, gqlPaginateQuery)),
    "nl_to_sql" -> ((s, d) => NlToSql.run(s, d, nlQuestion)),
    "nl_avg_by" -> ((s, d) => NlToSql.run(s, d, nlAvgQuestion)),
    "nl_count_where" -> ((s, d) => NlToSql.run(s, d, nlCountWhereQuestion)),
    "nl_total_where" -> ((s, d) => NlToSql.run(s, d, nlTotalWhereQuestion))
  )

  val oracles: Map[String, String] = Map(
    "gql_select" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_acctbal
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O' AND o_totalprice > 150000
         ORDER BY o_orderkey NULLS FIRST LIMIT 50""",
    "gql_nested" ->
      """SELECT o_orderkey, c_name, n_name, r_name
         FROM orders
         LEFT JOIN customer ON o_custkey = c_custkey
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderstatus = 'F'
         ORDER BY o_orderkey NULLS FIRST LIMIT 100""",
    "gql_paginate" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_acctbal > 1000
         ORDER BY c_custkey NULLS FIRST LIMIT 15 OFFSET 20""",
    "nl_to_sql" -> NlToSql.translate(nlQuestion),
    "nl_avg_by" -> NlToSql.translate(nlAvgQuestion),
    "nl_count_where" -> NlToSql.translate(nlCountWhereQuestion),
    "nl_total_where" -> NlToSql.translate(nlTotalWhereQuestion)
  )
}
