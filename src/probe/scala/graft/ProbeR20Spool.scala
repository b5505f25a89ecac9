package graft

import java.nio.file.Files

/** R19 verdict #4: ChunkedSpool at the PRODUCTION default (100 MB
  * statement-boundary parts) and at its worst case (a single statement
  * — one table's COPY block — LARGER than chunkBytes), on a real pg15
  * server at 1M rows. The r19 live measurement ran 16×8 MB parts; this
  * probe certifies the default path and the geometric-rescan O(n)
  * claim where it actually bites.
  *
  * Three measurements:
  *   (a) the full 1M dump-create cycle through the CLI at the DEFAULT
  *       chunk size (no spoolChunkMb override): pg_dump → 100 MB spool
  *       parts → distributed parse → mask → datastore; store row count
  *       adjudicates.
  *   (b) pure spool replay of the saved --column-inserts dump (per-row
  *       statements, the tool legs' shape) at default chunkBytes:
  *       parts, wall, MB/s, byte-exact concat.
  *   (c) pure spool replay of pg_dump's DEFAULT COPY-format dump of
  *       the same table — ONE ~190 MB COPY block, bigger than
  *       chunkBytes: no boundary exists inside the block, so the scan
  *       keeps failing and rescanning under the geometric step. The
  *       O(n) claim holds iff (c)'s MB/s stays within a small constant
  *       of (b)'s; memory stays O(block) — witnessed by sampled peak
  *       heap — and the concat is byte-exact with parts only at block
  *       boundaries.
  *
  * Usage: sbt "Test/runMain graft.ProbeR20Spool"
  */
object ProbeR20Spool {

  private def replay(bytes: Array[Byte], dir: java.nio.file.Path,
                     chunkBytes: Int): (Int, Double, Long) = {
    val written = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    // sample used heap during the replay — O(block) memory witness
    @volatile var peak = 0L
    @volatile var sampling = true
    val rt = Runtime.getRuntime
    val sampler = new Thread(() => {
      while (sampling) {
        peak = math.max(peak, rt.totalMemory - rt.freeMemory)
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    System.gc()
    val base = rt.totalMemory - rt.freeMemory
    sampler.start()
    val t0 = System.nanoTime()
    val parts = graft.ingest.ChunkedSpool.write(i => {
      val p = dir.resolve(f"part-$i%05d.sql"); written += p
      new java.io.FileOutputStream(p.toFile)
    }, pg = Some(true), chunkBytes = chunkBytes) { o =>
      var off = 0
      while (off < bytes.length) {
        val n = math.min(1 << 16, bytes.length - off)
        o.write(bytes, off, n); off += n
      }
    }
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    // byte-exact reassembly
    var pos = 0
    written.foreach { p =>
      val b = Files.readAllBytes(p)
      require(java.util.Arrays.equals(b, 0, b.length, bytes, pos, pos + b.length),
        s"replay not byte-exact at part $p")
      pos += b.length
    }
    require(pos == bytes.length, s"replay dropped bytes: $pos of ${bytes.length}")
    (parts, wall, math.max(0L, peak - base))
  }

  def main(args: Array[String]): Unit = {
    val cluster = PgTestCluster.maybe().getOrElse {
      println("PROBE_R20_SPOOL SKIP: postgres toolchain unavailable")
      return
    }
    val spark = GraftSession.get()
    val n = 1000000L
    cluster.psql("postgres", "CREATE DATABASE spoolprobe")
    cluster.psql("spoolprobe",
      """CREATE TABLE fat(id int PRIMARY KEY, pad text);
        |INSERT INTO fat SELECT g, repeat('x', 170) || '-' || g
        |  FROM generate_series(1, 1000000) g;""".stripMargin)
    // (a) full CLI cycle at the DEFAULT 100 MB chunk size
    val store = Files.createTempDirectory("graft-spoolprobe-store-").toString
    val conf = Files.createTempFile("graft-spoolprobe-conf-", ".yaml")
    Files.writeString(conf,
      s"""source:
         |  connection_uri: postgres://graft@localhost/spoolprobe?host=${cluster.sock}
         |datastore:
         |  local_disk:
         |    dir: $store
         |""".stripMargin)
    spark.conf.set("spark.graft.pgMode", "tools")
    val tA = System.nanoTime()
    val rc = Cli.run(Seq("-c", conf.toString, "dump", "create", "probe-1m"), spark, _ => ())
    val cliSec = (System.nanoTime() - tA) / 1e9
    require(rc == 0, s"dump create failed rc=$rc")
    val back = graft.pipeline.Pipeline.restore(
      spark, new graft.store.Datastore(store, spark), "probe-1m")("fat").count()
    require(back == n, s"store holds $back of $n rows")

    // save the two dump shapes once each for the pure-spool replays
    def dumpTo(path: java.nio.file.Path, extra: Seq[String]): Long = {
      val pb = new java.lang.ProcessBuilder(
        (Seq("pg_dump") ++ extra ++ Seq("--no-owner", "-h", cluster.sock,
          "-U", "graft", "-f", path.toString, "spoolprobe")): _*)
      require(pb.start().waitFor() == 0, "pg_dump failed")
      path.toFile.length()
    }
    val insDump = Files.createTempFile("graft-spoolprobe-ins-", ".sql")
    val copyDump = Files.createTempFile("graft-spoolprobe-copy-", ".sql")
    val insLen = dumpTo(insDump, Seq("--column-inserts"))
    val copyLen = dumpTo(copyDump, Seq.empty)
    val insBytes = Files.readAllBytes(insDump)
    val copyBytes = Files.readAllBytes(copyDump)

    // (b) per-row statements at the default chunk size
    val dirB = Files.createTempDirectory("graft-spoolprobe-b-")
    val (partsB, wallB, peakB) = replay(insBytes,
      dirB, graft.ingest.ChunkedSpool.DefaultChunkBytes)
    // (c) ONE COPY block larger than chunkBytes — the worst case
    val dirC = Files.createTempDirectory("graft-spoolprobe-c-")
    val (partsC, wallC, peakC) = replay(copyBytes,
      dirC, graft.ingest.ChunkedSpool.DefaultChunkBytes)

    // the distributed reader agrees on the worst-case spool too
    val viaCopy = graft.ingest.DumpReader.tableFromDump(
      graft.ingest.DumpReader.statements(spark, dirC.toString), "public", "fat").count()
    require(viaCopy == n, s"COPY spool parsed $viaCopy of $n rows")

    println(f"PROBE_R20_SPOOL rows=$n cli_default_sec=$cliSec%.1f " +
      f"cli_rate=${n / cliSec}%.0f rows/s " +
      f"ins_mb=${insLen / 1e6}%.0f parts_b=$partsB wall_b=$wallB%.2f " +
      f"rate_b=${insLen / 1e6 / wallB}%.0f MB/s peak_b_mb=${peakB / 1e6}%.0f " +
      f"copy_mb=${copyLen / 1e6}%.0f parts_c=$partsC wall_c=$wallC%.2f " +
      f"rate_c=${copyLen / 1e6 / wallC}%.0f MB/s peak_c_mb=${peakC / 1e6}%.0f " +
      f"rate_ratio=${(insLen / 1e6 / wallB) / (copyLen / 1e6 / wallC)}%.2f")
    spark.stop()
  }
}
