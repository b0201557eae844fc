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

  val nlQuestion: String = "top 10 customers by total order price"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gql_select" -> ((s, d) => GraphQL.run(s, d, gqlQuery)),
    "nl_to_sql" -> ((s, d) => NlToSql.run(s, d, nlQuestion))
  )

  val oracles: Map[String, String] = Map(
    "gql_select" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_acctbal
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O' AND o_totalprice > 150000
         ORDER BY o_orderkey NULLS FIRST LIMIT 50""",
    "nl_to_sql" -> NlToSql.translate(nlQuestion)
  )
}
