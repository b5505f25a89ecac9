package graft

/** Driver-contract consistency: the things the harness assumes but
  * nothing else checks.
  */
class EntrySpec extends SparkSpec {

  test("every oracle key has a query, and pack keys never collide") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    val orphaned = o.keySet.diff(q.keySet)
    assert(orphaned.isEmpty, s"oracle SQL without a query: $orphaned")
    // Map ++ silently shadows duplicate keys across packs — a collision
    // would make one pack's query run against another's oracle
    val packs = Seq(
      graft.queries.CoreQueries.queries, graft.queries.TransformQueries.queries,
      graft.queries.SubsetQueries.queries, graft.queries.IngestQueries.queries,
      graft.queries.OpsQueries.queries, graft.queries.PipelineQueries.queries,
      graft.queries.StoreQueries.queries, graft.queries.EventQueries.queries)
    assert(packs.map(_.size).sum == q.size, "duplicate query keys across packs")
  }

  test("flagship entry returns rows on the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
