package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.FkEdge
import graft.queries.SubsetQueries
import graft.subset.Subset

class SubsetSpec extends SparkSpec {
  import spark.implicits._

  private def load(t: String): DataFrame = Tables.load(spark, sfDir, t)

  test("systematicSample: 30% < 50% row counts, no duplicates (reference source/postgres.rs:812-889)") {
    val orders = load("orders")
    val s30 = Subset.systematicSample(orders, "o_orderkey", 30.0)
    val s50 = Subset.systematicSample(orders, "o_orderkey", 50.0)
    assert(s30.count() < s50.count())
    assert(s50.count() < orders.count())
    assert(s30.count() == s30.dropDuplicates("o_orderkey").count())
  }

  test("fkClosure: subset is referentially intact") {
    val seed = Subset.systematicSample(load("orders"), "o_orderkey", 20.0)
    val closed = Subset.fkClosure(load, SubsetQueries.testdataEdges, Map("orders" -> seed))
    // every selected order's customer is selected
    val orphans = closed("orders")
      .join(closed("customer"), col("o_custkey") === col("c_custkey"), "left_anti")
    assert(orphans.count() == 0)
    // every selected customer's nation is selected
    val orphanNations = closed("customer")
      .join(closed("nation"), col("c_nationkey") === col("n_nationkey"), "left_anti")
    assert(orphanNations.count() == 0)
    // closure did not select tables unreachable from the seed (lineitem
    // is a child of orders, traversal is child → parent only)
    assert(!closed.contains("lineitem"))
  }

  test("fkClosure: terminates on cyclic FK graphs (fixes reference TODO subset/src/postgres.rs:154)") {
    // a ↔ b cycle: a.bid → b.id, b.aid → a.id
    val a = Seq((1L, 10L), (2L, 20L)).toDF("id", "bid")
    val b = Seq((10L, 1L), (20L, 2L), (30L, 1L)).toDF("id", "aid")
    val tables = Map("a" -> a, "b" -> b)
    val edges = Seq(
      FkEdge("db", "a", "bid", "db", "b", "id"),
      FkEdge("db", "b", "aid", "db", "a", "id"))
    val closed = Subset.fkClosure(tables(_), edges, Map("a" -> a.filter($"id" === 1)))
    assert(closed("a").as[(Long, Long)].collect().toSet == Set((1L, 10L)))
    assert(closed("b").as[(Long, Long)].collect().toSet == Set((10L, 1L)))
  }

  test("fkClosure: DAG fast path agrees with the iterative BFS path") {
    val edges = SubsetQueries.testdataEdges
    assert(Subset.topoOrder(edges).isDefined)
    val seed = Subset.systematicSample(load("orders"), "o_orderkey", 20.0)
    val dag = Subset.fkClosureDag(load _, edges, Map("orders" -> seed), Subset.topoOrder(edges).get)
    val iter = Subset.fkClosureIterative(load _, edges, Map("orders" -> seed))
    assert(dag.keySet == iter.keySet)
    for (t <- dag.keySet) {
      assert(dag(t).exceptAll(iter(t)).isEmpty && iter(t).exceptAll(dag(t)).isEmpty, s"table $t differs")
    }
  }

  test("topoOrder: None on cyclic graphs, children before parents on DAGs") {
    val cyc = Seq(
      FkEdge("db", "a", "bid", "db", "b", "id"),
      FkEdge("db", "b", "aid", "db", "a", "id"))
    assert(Subset.topoOrder(cyc).isEmpty)
    val order = Subset.topoOrder(SubsetQueries.testdataEdges).get
    assert(order.indexOf("lineitem") < order.indexOf("orders"))
    assert(order.indexOf("orders") < order.indexOf("customer"))
    assert(order.indexOf("nation") < order.indexOf("region"))
  }

  test("dedupByKey: one row per key, min representative") {
    val df = Seq(("x", 5L), ("x", 3L), ("y", 7L)).toDF("text", "doc_id")
    val out = Subset.dedupByKey(df, col("text"), "doc_id").as[(String, Long)].collect().toSet
    assert(out == Set(("x", 3L), ("y", 7L)))
  }

  test("run: passthrough tables are copied 100%") {
    val result = Subset.run(load, SubsetQueries.testdataEdges, "orders", "o_orderkey", 25.0,
      passthrough = Seq("supplier"))
    assert(result("supplier").count() == load("supplier").count())
    assert(result("orders").count() < load("orders").count())
  }
}
