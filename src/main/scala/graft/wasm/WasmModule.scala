package graft.wasm

import scala.collection.mutable.ArrayBuffer

/** Decoder for the WebAssembly binary format (core 1.0 + the
  * sign-extension, saturating-truncation and bulk-memory extensions that
  * LLVM emits by default for wasm32-wasi targets). Clean-room from the
  * public spec (https://webassembly.github.io/spec/core/binary/) — built
  * so the T9 custom-transformer surface can execute the reference's user
  * `.wasm` modules (`replibyte/src/transformer/custom_wasm.rs:28-99`)
  * without any native runtime dependency.
  *
  * Function bodies are pre-decoded into flat opcode/immediate arrays
  * with structured-control jump targets resolved (matching `end`/`else`
  * positions), so the interpreter never re-scans bytecode at runtime.
  */
object WasmModule {

  // value types (binary encodings)
  final val I32: Byte = 0x7F
  final val I64: Byte = 0x7E
  final val F32: Byte = 0x7D
  final val F64: Byte = 0x7C
  final val FuncRef: Byte = 0x70

  final case class FuncType(params: Array[Byte], results: Array[Byte])
  final case class ImportedFunc(module: String, name: String, typeIdx: Int)
  final case class Export(name: String, kind: Int, idx: Int)
  final case class GlobalDef(valType: Byte, mutable: Boolean, init: ConstExpr)
  final case class ElemSeg(offset: ConstExpr, funcIdxs: Array[Int])
  final case class DataSeg(offset: Option[ConstExpr], bytes: Array[Byte]) // None = passive
  final case class Limits(min: Int, max: Int)

  /** A constant initializer expression: i32/i64/f32/f64.const or
    * global.get (of an imported immutable global).
    */
  final case class ConstExpr(op: Int, value: Long)

  /** One pre-decoded function body. Parallel arrays, one slot per
    * instruction:
    *   - `ops`: opcode (0xFC-prefixed mapped to 0x100+sub)
    *   - `a`: primary immediate — const bits, local/global/func index,
    *     memarg offset, br depth; for block/loop/if the packed
    *     (paramArity << 32 | resultArity) of the block type
    *   - `b`: matching `end` position for block/loop/if; type index for
    *     call_indirect; data segment index for memory.init
    *   - `c`: `else` position for if (-1 if none); br_table index
    */
  final class FnCode(
      val localTypes: Array[Byte],
      val ops: Array[Int],
      val a: Array[Long],
      val b: Array[Int],
      val c: Array[Int],
      val brTables: Array[Array[Int]])

  final class Module(
      val types: Array[FuncType],
      val importedFuncs: Array[ImportedFunc],
      val funcTypeIdxs: Array[Int], // defined functions, index space offset by imports
      val tableLimits: Option[Limits],
      val memLimits: Option[Limits],
      val globals: Array[GlobalDef],
      val exports: Array[Export],
      val startFunc: Option[Int],
      val elems: Array[ElemSeg],
      val codes: Array[FnCode],
      val datas: Array[DataSeg]) {
    def typeOfFunc(fidx: Int): FuncType =
      if (fidx < importedFuncs.length) types(importedFuncs(fidx).typeIdx)
      else types(funcTypeIdxs(fidx - importedFuncs.length))
    def exportedFunc(name: String): Option[Int] =
      exports.find(e => e.kind == 0 && e.name == name).map(_.idx)
  }

  final class Reader(val bytes: Array[Byte], var pos: Int) {
    def u8(): Int = {
      // a truncated module must fail as a decode error (WasmTrap), not
      // an ArrayIndexOutOfBoundsException from inside an executor
      if (pos >= bytes.length) throw new WasmTrap("truncated module: unexpected end of bytes")
      val v = bytes(pos) & 0xFF; pos += 1; v
    }
    def u32(): Int = { // LEB128 unsigned, 32-bit: at most ceil(32/7)=5 bytes
      var result = 0L; var shift = 0; var b = 0
      do {
        if (shift >= 35) throw new WasmTrap("malformed LEB128: u32 longer than 5 bytes")
        b = u8(); result |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      result.toInt
    }
    def s32(): Int = s64().toInt
    /** Bytes left from the cursor. */
    def remaining: Int = bytes.length - pos
    /** A vector count, sanity-bounded BEFORE any allocation: every
      * element consumes at least one byte, so a count beyond the
      * remaining bytes is malformed — without this a 3-byte module
      * claiming 2^31 entries OOMs the executor inside `Array.fill`.
      */
    def vecCount(): Int = {
      val n = u32()
      if (n < 0 || n > remaining)
        throw new WasmTrap(s"malformed vector count $n (only $remaining bytes left)")
      n
    }
    def s64(): Long = { // LEB128 signed: at most ceil(64/7)=10 bytes
      var result = 0L; var shift = 0; var b = 0
      do {
        if (shift >= 70) throw new WasmTrap("malformed LEB128: s64 longer than 10 bytes")
        b = u8(); result |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      if (shift < 64 && (b & 0x40) != 0) result |= -1L << shift
      result
    }
    def f32bits(): Long = {
      val v = (u8() | (u8() << 8) | (u8() << 16) | (u8().toLong << 24)) & 0xFFFFFFFFL
      v
    }
    def f64bits(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    def name(): String = {
      val n = u32()
      // overflow-safe form (pos + n wraps negative for n near 2^31 and
      // would pass the naive check): bytes.length - pos can't overflow
      if (n < 0 || n > bytes.length - pos) throw new WasmTrap("truncated module: name runs past end")
      val s = new String(bytes, pos, n, "UTF-8")
      pos += n
      s
    }
    def byteVec(): Array[Byte] = {
      val n = u32()
      // copyOfRange would silently ZERO-PAD past the end — trap instead
      // (overflow-safe form, see name())
      if (n < 0 || n > bytes.length - pos) throw new WasmTrap("truncated module: byte vector runs past end")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def limits(): Limits = {
      val flag = u8()
      val min = u32()
      val max = if ((flag & 1) != 0) u32() else -1
      Limits(min, max)
    }
  }

  private def constExpr(r: Reader): ConstExpr = {
    val op = r.u8()
    val e = op match {
      case 0x41 => ConstExpr(op, r.s32().toLong)
      case 0x42 => ConstExpr(op, r.s64())
      case 0x43 => ConstExpr(op, r.f32bits())
      case 0x44 => ConstExpr(op, r.f64bits())
      case 0x23 => ConstExpr(op, r.u32().toLong) // global.get
      case other => throw new WasmTrap(f"unsupported const-expr opcode 0x$other%02x")
    }
    val end = r.u8()
    if (end != 0x0B) throw new WasmTrap("const expr not terminated")
    e
  }

  def parse(bytes: Array[Byte]): Module = {
    val r = new Reader(bytes, 0)
    if (r.u8() != 0 || r.u8() != 'a' || r.u8() != 's' || r.u8() != 'm')
      throw new WasmTrap("bad wasm magic")
    // version is a FIXED little-endian u32, not LEB128
    if ((r.u8() | (r.u8() << 8) | (r.u8() << 16) | (r.u8() << 24)) != 1)
      throw new WasmTrap("unsupported wasm version")

    var types = Array.empty[FuncType]
    val importedFuncs = ArrayBuffer.empty[ImportedFunc]
    var funcTypeIdxs = Array.empty[Int]
    var tableLimits: Option[Limits] = None
    var memLimits: Option[Limits] = None
    var globals = Array.empty[GlobalDef]
    var exports = Array.empty[Export]
    var startFunc: Option[Int] = None
    var elems = Array.empty[ElemSeg]
    var codes = Array.empty[FnCode]
    var datas = Array.empty[DataSeg]

    while (r.pos < bytes.length) {
      val id = r.u8()
      val size = r.u32()
      // a lying size would either run past the end or (negative after
      // .toInt) REWIND the cursor into an infinite section loop
      if (size < 0 || size > r.remaining)
        throw new WasmTrap("truncated module: section size runs past end")
      val sectionEnd = r.pos + size
      id match {
        case 0 => // custom (name, etc) — skip
        case 1 =>
          types = Array.fill(r.vecCount()) {
            if (r.u8() != 0x60) throw new WasmTrap("expected functype")
            val ps = Array.fill(r.vecCount())(r.u8().toByte)
            val rs = Array.fill(r.vecCount())(r.u8().toByte)
            FuncType(ps, rs)
          }
        case 2 =>
          val n = r.u32()
          var i = 0
          while (i < n) {
            val mod = r.name(); val nm = r.name()
            r.u8() match {
              case 0x00 => importedFuncs += ImportedFunc(mod, nm, r.u32())
              case other => throw new WasmTrap(
                s"unsupported import kind $other for $mod.$nm (only function imports)")
            }
            i += 1
          }
        case 3 => funcTypeIdxs = Array.fill(r.vecCount())(r.u32())
        case 4 =>
          val n = r.u32()
          if (n > 1) throw new WasmTrap("at most one table supported")
          if (n == 1) {
            if (r.u8() != FuncRef) throw new WasmTrap("only funcref tables supported")
            tableLimits = Some(r.limits())
          }
        case 5 =>
          val n = r.u32()
          if (n > 1) throw new WasmTrap("at most one memory supported")
          if (n == 1) memLimits = Some(r.limits())
        case 6 =>
          globals = Array.fill(r.vecCount()) {
            val vt = r.u8().toByte
            val mut = r.u8() == 1
            GlobalDef(vt, mut, constExpr(r))
          }
        case 7 =>
          exports = Array.fill(r.vecCount())(Export(r.name(), r.u8(), r.u32()))
        case 8 => startFunc = Some(r.u32())
        case 9 =>
          elems = Array.fill(r.vecCount()) {
            r.u32() match {
              case 0 =>
                val off = constExpr(r)
                ElemSeg(off, Array.fill(r.vecCount())(r.u32()))
              case other => throw new WasmTrap(s"unsupported element segment flags $other")
            }
          }
        case 10 =>
          codes = Array.fill(r.vecCount()) {
            val bodySize = r.u32()
            val bodyEnd = r.pos + bodySize
            val fn = decodeBody(r, types)
            if (r.pos != bodyEnd) throw new WasmTrap("function body size mismatch")
            fn
          }
        case 11 =>
          datas = Array.fill(r.vecCount()) {
            r.u32() match {
              case 0 => DataSeg(Some(constExpr(r)), r.byteVec())
              case 1 => DataSeg(None, r.byteVec()) // passive (bulk memory)
              case 2 =>
                val memIdx = r.u32()
                if (memIdx != 0) throw new WasmTrap("multi-memory not supported")
                DataSeg(Some(constExpr(r)), r.byteVec())
              case other => throw new WasmTrap(s"unsupported data segment flags $other")
            }
          }
        case 12 => r.u32() // datacount — value unused, size is implied
        case other => throw new WasmTrap(s"unknown section id $other")
      }
      r.pos = sectionEnd
    }
    new Module(types, importedFuncs.toArray, funcTypeIdxs, tableLimits,
      memLimits, globals, exports, startFunc, elems, codes, datas)
  }

  /** Block-type arity packed as (paramCount << 32) | resultCount. */
  private def blockArity(bt: Long, types: Array[FuncType]): Long =
    if (bt == -64) 0L // 0x40 empty
    else if (bt < 0) 1L // single result valtype
    else {
      val t = types(bt.toInt)
      (t.params.length.toLong << 32) | t.results.length.toLong
    }

  /** Decode one function body into flat arrays with control-flow targets
    * resolved (one linear pass, a stack of open structured frames).
    */
  private def decodeBody(r: Reader, types: Array[FuncType]): FnCode = {
    val locals = ArrayBuffer.empty[Byte]
    val nGroups = r.vecCount()
    var g = 0
    while (g < nGroups) {
      val count = r.u32()
      // group counts are NOT byte-bounded (one group declares any
      // number of locals) — cap totals so a 6-byte body can't make
      // every invoke allocate a multi-GB frame (spec-test validators
      // use a 50k limit; 65536 is safely above any real module)
      if (count < 0 || locals.length + count > 65536)
        throw new WasmTrap(s"too many locals (${locals.length} + $count > 65536)")
      val vt = r.u8().toByte
      var i = 0
      while (i < count) { locals += vt; i += 1 }
      g += 1
    }
    val ops = ArrayBuffer.empty[Int]
    val ia = ArrayBuffer.empty[Long]
    val ib = ArrayBuffer.empty[Int]
    val ic = ArrayBuffer.empty[Int]
    val tables = ArrayBuffer.empty[Array[Int]]
    // open structured frames: positions of block/loop/if awaiting `end`
    val open = ArrayBuffer.empty[Int]
    var depth = 1 // implicit function-body block
    var done = false

    def emit(op: Int, a: Long = 0L, b: Int = -1, c: Int = -1): Int = {
      ops += op; ia += a; ib += b; ic += c
      ops.length - 1
    }

    while (!done) {
      val op = r.u8()
      op match {
        case 0x02 | 0x03 | 0x04 => // block | loop | if
          val bt = r.s64() // s33 blocktype
          open += emit(op, blockArity(bt, types))
          depth += 1
        case 0x05 => // else: patch the matching if's c-slot
          val ifPos = open.last
          val pos = emit(op)
          ic(ifPos) = pos
        case 0x0B => // end
          depth -= 1
          if (depth == 0) done = true
          else {
            val pos = emit(op)
            val opener = open.remove(open.length - 1)
            ib(opener) = pos
            // else (if present) also needs the end position to jump to
            if (ops(opener) == 0x04 && ic(opener) >= 0) ib(ic(opener)) = pos
          }
        case 0x0C | 0x0D => emit(op, r.u32().toLong) // br | br_if (depth)
        case 0x0E => // br_table
          val n = r.vecCount() // each target is ≥1 byte — bounds the alloc
          val t = new Array[Int](n + 1)
          var i = 0
          while (i <= n) { t(i) = r.u32(); i += 1 }
          tables += t
          emit(op, c = tables.length - 1)
        case 0x00 | 0x01 | 0x0F | 0x1A | 0x1B => emit(op) // unreachable nop return drop select
        case 0x1C => // select with explicit types — same runtime behavior
          val n = r.u32(); var i = 0; while (i < n) { r.u8(); i += 1 }
          emit(0x1B)
        case 0x10 => emit(op, r.u32().toLong) // call
        case 0x11 => // call_indirect: typeidx, tableidx
          val t = r.u32(); val tbl = r.u32()
          if (tbl != 0) throw new WasmTrap("call_indirect: only table 0")
          emit(op, b = t)
        case v if v >= 0x20 && v <= 0x24 => emit(op, r.u32().toLong) // local/global get/set/tee
        case v if v >= 0x28 && v <= 0x3E => // memarg loads/stores
          r.u32() // align (ignored)
          emit(op, r.u32().toLong & 0xFFFFFFFFL) // offset
        case 0x3F | 0x40 => // memory.size | memory.grow
          r.u8() // reserved 0x00
          emit(op)
        case 0x41 => emit(op, r.s32().toLong)
        case 0x42 => emit(op, r.s64())
        case 0x43 => emit(op, r.f32bits())
        case 0x44 => emit(op, r.f64bits())
        case v if v >= 0x45 && v <= 0xC4 => emit(op) // numeric + sign-extension
        case 0xFC =>
          val sub = r.u32()
          sub match {
            case 0 | 1 | 2 | 3 | 4 | 5 | 6 | 7 => emit(0x100 + sub) // sat trunc
            case 8 => // memory.init dataidx, memidx
              val d = r.u32(); r.u8()
              emit(0x108, b = d)
            case 9 => emit(0x109, b = r.u32()) // data.drop
            case 10 => r.u8(); r.u8(); emit(0x10A) // memory.copy
            case 11 => r.u8(); emit(0x10B) // memory.fill
            case other => throw new WasmTrap(s"unsupported 0xFC subop $other")
          }
        case other => throw new WasmTrap(f"unsupported opcode 0x$other%02x")
      }
    }
    new FnCode(locals.toArray, ops.toArray, ia.toArray, ib.toArray, ic.toArray,
      tables.toArray)
  }
}

/** Runtime trap (also used for decode errors — both mean "this module
  * can't run here", and the transformer surface fails loudly either way).
  */
final class WasmTrap(msg: String) extends RuntimeException(msg)

/** Thrown by the WASI `proc_exit` host call; code 0 is a normal finish
  * of a command module's `_start`.
  */
final class ProcExit(val code: Int) extends RuntimeException(s"proc_exit($code)")
