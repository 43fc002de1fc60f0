package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** JDBC round-trip against embedded Derby: equality, partitioned
  * parallel scan, and predicate pushdown into the remote SQL. */
class JdbcSpec extends SparkSpec {

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("customer table round-trips through a JDBC store") {
    import spark.implicits._
    val customer = Tables.customer(spark, graft.SparkSpec.Sf0001)
    Jdbc.write(customer, url, "customer_rt")
    val back = Jdbc.read(spark, url, "customer_rt")
    assert(back.orderBy($"c_custkey").collect().toSeq ==
      customer.orderBy($"c_custkey").collect().toSeq)
  }

  test("partitioned read runs N concurrent range scans, same rows") {
    import spark.implicits._
    val customer = Tables.customer(spark, graft.SparkSpec.Sf0001)
    Jdbc.write(customer, url, "customer_part")
    val maxKey = customer.agg(org.apache.spark.sql.functions.max($"c_custkey"))
      .head().getLong(0)
    val back = Jdbc.readPartitioned(spark, url, "customer_part",
      "c_custkey", 1L, maxKey, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.orderBy($"c_custkey").collect().toSeq ==
      customer.orderBy($"c_custkey").collect().toSeq)
  }

  test("filters and column pruning push into the JDBC scan") {
    import spark.implicits._
    Jdbc.write(Tables.customer(spark, graft.SparkSpec.Sf0001), url, "customer_push")
    val q = Jdbc.read(spark, url, "customer_push")
      .filter($"c_acctbal" > 1000.0)
      .select($"c_custkey", $"c_acctbal")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_acctbal"))
    assert(q.count() > 0)
  }
}
