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
