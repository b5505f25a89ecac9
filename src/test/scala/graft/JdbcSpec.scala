package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.ingest.Jdbc
import graft.subset.Subset

/** Live-database integration against embedded Derby (the in-container
  * stand-in for the reference's dockerized Postgres/MySQL tests,
  * `source/postgres.rs:566-599`): metadata, FK extraction, partitioned
  * scan, transformer pass, restore write, and a JDBC-fed subset
  * closure.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby-").resolve("db")
    val u = s"jdbc:derby:$dir;create=true"
    Jdbc.execute(u,
      "CREATE TABLE country (id INT PRIMARY KEY, name VARCHAR(40))")
    Jdbc.execute(u,
      "CREATE TABLE city (id INT PRIMARY KEY, name VARCHAR(40), " +
        "country_id INT REFERENCES country (id))")
    (1 to 5).foreach(i =>
      Jdbc.execute(u, s"INSERT INTO country VALUES ($i, 'country-$i')"))
    (1 to 50).foreach(i =>
      Jdbc.execute(u, s"INSERT INTO city VALUES ($i, 'city-$i', ${i % 5 + 1})"))
    u
  }

  test("jdbc: table + FK metadata (S10 live mode)") {
    assert(Jdbc.tableNames(url).map(_.toLowerCase).contains("city"))
    val fks = Jdbc.foreignKeys(url)
    assert(fks.exists(e =>
      e.fromTable.equalsIgnoreCase("city") && e.fromCol.equalsIgnoreCase("country_id") &&
        e.toTable.equalsIgnoreCase("country") && e.toCol.equalsIgnoreCase("id")))
  }

  test("jdbc: partitioned scan, transform, restore write (S1/D1)") {
    val city = Jdbc.readTable(spark, url, "city",
      partitionColumn = Some("id"), numPartitions = 4)
    assert(city.rdd.getNumPartitions == 4) // ranged parallel scan
    assert(city.count() == 50)

    // transformer pass on the scanned rows, restored to a new table
    val redacted = city.withColumn("NAME", md5(col("NAME")))
    Jdbc.execute(url,
      "CREATE TABLE city_restored (id INT, name VARCHAR(64), country_id INT)")
    Jdbc.writeTable(redacted, url, "city_restored", SaveMode.Append)
    val back = Jdbc.readTable(spark, url, "city_restored")
    assert(back.count() == 50)
    assert(back.as("b").join(city.as("c"), $"b.ID" === $"c.ID")
      .filter($"b.NAME" === $"c.NAME").count() == 0)
  }

  test("jdbc: FK closure over live tables (J1 live mode)") {
    val edges = Jdbc.foreignKeys(url).map(e =>
      e.copy(fromTable = e.fromTable.toLowerCase, toTable = e.toTable.toLowerCase,
        fromCol = e.fromCol.toUpperCase, toCol = e.toCol.toUpperCase))
    val load = (t: String) => Jdbc.readTable(spark, url, t)
    val seed = load("city").filter($"ID" <= 10) // cities 1..10 → countries 2..5,1
    val closed = Subset.fkClosure(load, edges, Map("city" -> seed))
    assert(closed("city").count() == 10)
    assert(closed("country").count() == 5) // all 5 referenced
  }
}
