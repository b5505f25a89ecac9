package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.wasm.{WasiRunner, WasmInterp, WasmModule}
import graft.transform.Transformers
import graft.model.TransformerBinding

/** T9 real-WASM path: the pure-JVM interpreter runs the reference's own
  * user fixture (`examples/wasm/wasm-transformer-reverse-string.wasm`)
  * through the same stdin→`_start`→stdout contract, matching the
  * reference's involution test (`transformer/custom_wasm.rs:190-221`).
  */
class WasmSpec extends AnyFunSuite {

  private val fixturePath =
    "/root/reference/examples/wasm/wasm-transformer-reverse-string.wasm"

  // minimal hand-assembled module: (func (export "add_one") (param i32)
  // (result i32) local.get 0 / i32.const 1 / i32.add) — the canonical
  // spec example, exercises decode + invoke without WASI
  private val addOneBytes: Array[Byte] = Array(
    0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00, // magic + version
    0x01, 0x06, 0x01, 0x60, 0x01, 0x7f, 0x01, 0x7f, // type: (i32)->i32
    0x03, 0x02, 0x01, 0x00, // function: 1 func of type 0
    0x07, 0x0b, 0x01, 0x07, 0x61, 0x64, 0x64, 0x5f, 0x6f, 0x6e, 0x65, 0x00, 0x00, // export "add_one"
    0x0a, 0x09, 0x01, 0x07, 0x00, 0x20, 0x00, 0x41, 0x01, 0x6a, 0x0b // code
  ).map(_.toByte)

  test("interpreter: hand-assembled add_one module") {
    val m = WasmModule.parse(addOneBytes)
    val interp = new WasmInterp(m, Map.empty)
    assert(interp.invokeExport("add_one", Array(41L)).head.toInt == 42)
    assert(interp.invokeExport("add_one", Array(-1L)).head.toInt == 0)
    assert(interp.invokeExport("add_one", Array(Int.MaxValue.toLong)).head.toInt == Int.MinValue)
  }

  // (f32)->i32: local.get 0 / i32.reinterpret_f32 — checks the i32 slot
  // invariant (sign-extended) for a negative float bit pattern
  private val reinterpretBytes: Array[Byte] = Array(
    0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00,
    0x01, 0x06, 0x01, 0x60, 0x01, 0x7d, 0x01, 0x7f, // type: (f32)->i32
    0x03, 0x02, 0x01, 0x00,
    0x07, 0x06, 0x01, 0x02, 0x72, 0x69, 0x00, 0x00, // export "ri"
    0x0a, 0x07, 0x01, 0x05, 0x00, 0x20, 0x00, 0xbc, 0x0b // local.get 0; i32.reinterpret_f32
  ).map(_.toByte)

  test("i32.reinterpret_f32 sign-extends the i32 slot for negative bit patterns") {
    val m = WasmModule.parse(reinterpretBytes)
    val interp = new WasmInterp(m, Map.empty)
    val negBits = java.lang.Float.floatToRawIntBits(-1.5f) // 0xBFC00000, sign bit set
    val in = negBits.toLong & 0xFFFFFFFFL // f32 slot convention: raw 32 bits, zero-extended
    val out = interp.invokeExport("ri", Array(in)).head
    assert(out == negBits.toLong) // sign-extended i32 slot
    assert(out < 0L)
    // positive pattern stays identical under both conventions
    val posBits = java.lang.Float.floatToRawIntBits(1.5f)
    assert(interp.invokeExport("ri", Array(posBits.toLong & 0xFFFFFFFFL)).head == posBits.toLong)
  }

  test("truncated module decode traps instead of ArrayIndexOutOfBounds") {
    // chop the add_one module mid-magic, mid-section and mid-code-body
    // (section BOUNDARIES are valid prefixes — a module without export
    // or code sections parses fine, so cut inside sections only)
    Seq(3, 10, 25, addOneBytes.length - 2).foreach { keep =>
      val trap = intercept[graft.wasm.WasmTrap] {
        WasmModule.parse(java.util.Arrays.copyOf(addOneBytes, keep))
      }
      assert(trap.getMessage.contains("truncated") || trap.getMessage.contains("magic"),
        s"keep=$keep got: ${trap.getMessage}")
    }
  }

  test("overlong LEB128 encodings trap as malformed") {
    // u32 must fit in 5 bytes, s64 in 10
    val u32Overlong = new WasmModule.Reader(Array.fill(6)(0x80.toByte), 0)
    assert(intercept[graft.wasm.WasmTrap](u32Overlong.u32()).getMessage.contains("LEB128"))
    val s64Overlong = new WasmModule.Reader(Array.fill(11)(0x80.toByte), 0)
    assert(intercept[graft.wasm.WasmTrap](s64Overlong.s64()).getMessage.contains("LEB128"))
    // truncated LEB (stream ends inside a continued sequence) traps too
    val cut = new WasmModule.Reader(Array(0x80.toByte), 0)
    assert(intercept[graft.wasm.WasmTrap](cut.u32()).getMessage.contains("truncated"))
  }

  // ()->(): fills 1 MiB of a 16-page memory with zeroes — one
  // instruction by count, ~16k fuel by the byte-proportional pricing
  private val bulkFillBytes: Array[Byte] = Array(
    0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00,
    0x01, 0x04, 0x01, 0x60, 0x00, 0x00, // type: ()->()
    0x03, 0x02, 0x01, 0x00,
    0x05, 0x03, 0x01, 0x00, 0x10, // memory: min 16 pages
    0x07, 0x05, 0x01, 0x01, 0x66, 0x00, 0x00, // export "f"
    0x0a, 0x10, 0x01, 0x0e, 0x00, // code: 1 body, 14 bytes, no locals
    0x41, 0x00, // i32.const 0 (dst)
    0x41, 0x00, // i32.const 0 (val)
    0x41, 0x80, 0x80, 0xc0, 0x00, // i32.const 1048576 (n)
    0xfc, 0x0b, 0x00, // memory.fill
    0x0b
  ).map(_.toByte)

  test("bulk memory ops charge byte-proportional fuel") {
    val m = WasmModule.parse(bulkFillBytes)
    // 1 MiB fill ≈ 16384 fuel: a 1000-fuel budget must trap...
    val starved = new WasmInterp(m, Map.empty, maxFuel = 1000L)
    assert(intercept[graft.wasm.WasmTrap](starved.invokeExport("f"))
      .getMessage.contains("budget"))
    // ...while the default budget runs it fine
    new WasmInterp(m, Map.empty).invokeExport("f")
  }

  // ()->(): memory.grow(1) then drop — the grow copies the whole 1 MiB
  // old memory, which must be fuel-priced like a bulk op
  private val growBytes: Array[Byte] = Array(
    0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00,
    0x01, 0x04, 0x01, 0x60, 0x00, 0x00, // type: ()->()
    0x03, 0x02, 0x01, 0x00,
    0x05, 0x03, 0x01, 0x00, 0x10, // memory: min 16 pages
    0x07, 0x05, 0x01, 0x01, 0x67, 0x00, 0x00, // export "g"
    0x0a, 0x09, 0x01, 0x07, 0x00, // code: 1 body, 7 bytes, no locals
    0x41, 0x01, // i32.const 1
    0x40, 0x00, // memory.grow
    0x1a, // drop
    0x0b
  ).map(_.toByte)

  test("memory.grow charges fuel for the copy of the old memory") {
    val m = WasmModule.parse(growBytes)
    val starved = new WasmInterp(m, Map.empty, maxFuel = 1000L)
    assert(intercept[graft.wasm.WasmTrap](starved.invokeExport("g"))
      .getMessage.contains("budget"))
    new WasmInterp(m, Map.empty).invokeExport("g")
  }

  test("decoder never throws anything but WasmTrap on corrupted modules") {
    // Executor-safety property for DECODE (execution of a decoded-but-
    // invalid module is the user's own error path): every truncation
    // and every adversarial single-byte mutation must yield either a
    // parsed module or a WasmTrap — never AIOOBE/NegativeArraySize/OOM.
    def check(bs: Array[Byte], what: String): Unit =
      try { WasmModule.parse(bs); () }
      catch {
        case _: graft.wasm.WasmTrap => ()
        case t: Throwable => fail(s"$what threw ${t.getClass.getName}: ${t.getMessage}")
      }
    for (base <- Seq("add_one" -> addOneBytes, "bulk_fill" -> bulkFillBytes, "grow" -> growBytes)) {
      val (label, bytes) = base
      bytes.indices.foreach(k => check(java.util.Arrays.copyOf(bytes, k), s"$label truncate@$k"))
      val vals = Array(0x00, 0x01, 0x7F, 0x80, 0xFF)
      for (i <- bytes.indices; v <- vals) {
        val m = bytes.clone(); m(i) = v.toByte
        check(m, s"$label mutate@$i=0x$v%02x")
      }
    }
  }

  test("reference fixture: reverse-string involution via the WASI command contract") {
    assume(new java.io.File(fixturePath).exists(), "reference fixture not present")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixturePath))
    val cmd = new WasiRunner.Command(bytes)
    // the reference's exact test vector (custom_wasm.rs:207-217)
    val once = cmd.transform("reverse_it")
    assert(once == "ti_esrever")
    assert(cmd.transform(once) == "reverse_it")
    // unicode-safe round trip (rust reverses by char)
    val uni = cmd.transform(cmd.transform("héllo wörld"))
    assert(uni == "héllo wörld")
  }

  test("T9 surface: registerWasm binds the module like any transformer") {
    assume(new java.io.File(fixturePath).exists(), "reference fixture not present")
    val spark = GraftSession.get()
    import spark.implicits._
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixturePath))
    Transformers.registerWasm("wasm-reverse", bytes)
    assert(Transformers.ids.contains("wasm-reverse"))
    val df = Seq((1L, "reverse_it"), (2L, "abc"), (3L, "")).toDF("id", "v")
    val once = Transformers.applyBindings(df,
      Seq(TransformerBinding("db", "t", "v", "wasm-reverse")))
    val got = once.orderBy($"id").as[(Long, String)].collect().map(_._2).toSeq
    assert(got == Seq("ti_esrever", "cba", ""))
    // involution through the full binding surface
    val twice = Transformers.applyBindings(once,
      Seq(TransformerBinding("db", "t", "v", "wasm-reverse")))
    assert(twice.orderBy($"id").as[(Long, String)].collect().map(_._2).toSeq ==
      Seq("reverse_it", "abc", ""))
  }
}
