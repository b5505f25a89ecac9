package graft.wasm

import scala.collection.mutable.ArrayBuffer

import WasmModule.{FnCode, Module}

/** Interpreter for a parsed [[WasmModule.Module]] — WebAssembly core
  * 1.0 semantics (+ sign-extension / saturating-trunc / bulk-memory)
  * from the public spec (https://webassembly.github.io/spec/core/exec/).
  *
  * Values are raw 64-bit slots: i32 sign-extended, f32 as its 32 bits,
  * f64 as `doubleToRawLongBits`. Every i32 operation computes on
  * `.toInt` and pushes the sign-extended result, so unsigned i32
  * semantics are recovered with `Integer.*Unsigned` / `& 0xFFFFFFFFL`
  * exactly where the spec says.
  *
  * One instance = one isolated store (fresh linear memory, globals,
  * table), matching the reference's instance-per-call usage
  * (`replibyte/src/transformer/custom_wasm.rs:66-99`).
  */
final class WasmInterp(module: Module, hostFns: Map[String, Array[Long] => Array[Long]],
                       maxFuel: Long = WasmInterp.DefaultMaxFuel,
                       maxCallDepth: Int = WasmInterp.DefaultMaxCallDepth,
                       maxInitPages: Int = WasmInterp.DefaultMaxInitPages) {
  private val PageSize = 65536
  // A JVM byte array caps linear memory at Int.MaxValue bytes = 32767
  // full pages, below the spec's 65536-page (4 GiB) ceiling; grows past
  // it return -1 (spec failure path) instead of throwing.
  private val MaxPages = Int.MaxValue / PageSize
  // Untrusted-module runaway guards: a non-terminating or deeply
  // recursive transformer must trap (fail the row loudly) rather than
  // wedge a Spark task forever / kill the executor with a raw
  // StackOverflowError.
  private var fuelLeft: Long = maxFuel
  private var depth: Int = 0

  // ---- store ----
  private var mem: Array[Byte] = {
    val lim = module.memLimits.getOrElse(WasmModule.Limits(0, -1))
    // a declared minimum past the instantiation cap must trap BEFORE the
    // allocation: instantiation runs before any fuel is charged, so a
    // hostile module declaring a huge min would otherwise force a
    // multi-GiB zeroed array per invocation on an executor. The cap is
    // far above any real per-cell transformer (the reference's fixture
    // declares 1–2 pages); growth past it stays available via
    // memory.grow, which charges byte-proportional fuel.
    if (lim.min < 0 || lim.min > maxInitPages)
      throw new WasmTrap(s"memory min ${lim.min} pages exceeds supported $maxInitPages at instantiation")
    new Array[Byte](lim.min * PageSize)
  }
  private val memMaxPages: Int =
    module.memLimits.flatMap(l => if (l.max >= 0) Some(l.max) else None).getOrElse(MaxPages)
  private val globals: Array[Long] = module.globals.map(g => evalConst(g.init))
  private val table: Array[Int] = {
    val min = module.tableLimits.map(_.min).getOrElse(0)
    // transformer modules have element counts in the hundreds at most;
    // a million-entry declaration is malformed or hostile — trap
    // before the allocation
    if (min < 0 || min > (1 << 20))
      throw new WasmTrap(s"table min $min exceeds supported ${1 << 20}")
    val t = new Array[Int](min)
    java.util.Arrays.fill(t, -1)
    t
  }
  private val droppedData = new Array[Boolean](module.datas.length)

  // imported functions resolve once to host closures
  private val imports: Array[Array[Long] => Array[Long]] =
    module.importedFuncs.map { imp =>
      val key = s"${imp.module}.${imp.name}"
      hostFns.getOrElse(key, {
        // unknown WASI import: permissive ENOSYS stub so modules that
        // import-but-never-call exotic syscalls still instantiate;
        // a CALL still surfaces errno 52 loudly in the module's own error path
        val resultArity = module.types(imp.typeIdx).results.length
        if (imp.module.startsWith("wasi_"))
          (_: Array[Long]) => if (resultArity == 1) Array(52L) else Array.empty[Long]
        else throw new WasmTrap(s"unresolved import: $key")
      })
    }

  { // active data + element segments, then the start function
    module.datas.zipWithIndex.foreach { case (d, i) =>
      d.offset.foreach { off =>
        val at = evalConst(off).toInt
        checkRange(at.toLong & 0xFFFFFFFFL, d.bytes.length.toLong)
        System.arraycopy(d.bytes, 0, mem, at, d.bytes.length)
        droppedData(i) = true // active segments drop after instantiation
      }
    }
    module.elems.foreach { e =>
      val at = evalConst(e.offset).toInt
      if (at < 0 || at + e.funcIdxs.length > table.length)
        throw new WasmTrap("element segment out of bounds")
      System.arraycopy(e.funcIdxs, 0, table, at, e.funcIdxs.length)
    }
  }

  /** Run the module's start section (if any). Separate from construction
    * so host functions that need a reference back to this instance (for
    * linear-memory access) can be wired first.
    */
  def runStart(): Unit = module.startFunc.foreach(f => invoke(f, Array.empty))

  private def evalConst(e: WasmModule.ConstExpr): Long = e.op match {
    case 0x23 => globals(e.value.toInt)
    case _ => e.value
  }

  def invokeExport(name: String, args: Array[Long] = Array.empty): Array[Long] = {
    val f = module.exportedFunc(name)
      .getOrElse(throw new WasmTrap(s"no exported function '$name'"))
    invoke(f, args)
  }

  // ---- memory access ----
  private def checkRange(addr: Long, len: Long): Unit =
    if (addr < 0 || len < 0 || addr + len > mem.length)
      throw new WasmTrap(s"out-of-bounds memory access at $addr len $len (mem ${mem.length})")
  private def ea(base: Long, offset: Long, len: Int): Int = {
    val addr = (base & 0xFFFFFFFFL) + offset
    checkRange(addr, len.toLong)
    addr.toInt
  }
  private def ld8(a: Int): Long = mem(a).toLong
  private def ld16(a: Int): Long =
    ((mem(a) & 0xFF) | ((mem(a + 1) & 0xFF) << 8)).toShort.toLong
  private def ld32(a: Int): Long =
    ((mem(a) & 0xFF) | ((mem(a + 1) & 0xFF) << 8) | ((mem(a + 2) & 0xFF) << 16) |
      ((mem(a + 3) & 0xFF) << 24)).toLong
  private def ld64(a: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (mem(a + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }
  private def st8(a: Int, v: Long): Unit = mem(a) = v.toByte
  private def st16(a: Int, v: Long): Unit = { mem(a) = v.toByte; mem(a + 1) = (v >> 8).toByte }
  private def st32(a: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { mem(a + i) = (v >> (8 * i)).toByte; i += 1 }
  }
  private def st64(a: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { mem(a + i) = (v >> (8 * i)).toByte; i += 1 }
  }

  /** Read a byte range out of linear memory (host-call helper). */
  def memBytes(addr: Int, len: Int): Array[Byte] = {
    checkRange(addr.toLong & 0xFFFFFFFFL, len.toLong)
    java.util.Arrays.copyOfRange(mem, addr, addr + len)
  }
  /** Write bytes into linear memory (host-call helper). */
  def memWrite(addr: Int, bytes: Array[Byte], off: Int, len: Int): Unit = {
    checkRange(addr.toLong & 0xFFFFFFFFL, len.toLong)
    System.arraycopy(bytes, off, mem, addr, len)
  }
  /** Little-endian u32 load/store (host-call helper for iovecs etc). */
  def memU32(addr: Int): Long = { checkRange(addr.toLong & 0xFFFFFFFFL, 4L); ld32(addr) & 0xFFFFFFFFL }
  def memPutU32(addr: Int, v: Long): Unit = { checkRange(addr.toLong & 0xFFFFFFFFL, 4L); st32(addr, v) }

  // ---- execution ----
  private final class Label(val opPos: Int, val endPos: Int, val isLoop: Boolean,
                            val paramArity: Int, val resultArity: Int, val stackHeight: Int)

  private def invoke(fidx: Int, args: Array[Long]): Array[Long] = {
    if (fidx < imports.length) return imports(fidx)(args)
    val code = module.codes(fidx - imports.length)
    val ftype = module.typeOfFunc(fidx)
    val locals = new Array[Long](ftype.params.length + code.localTypes.length)
    System.arraycopy(args, 0, locals, 0, args.length)
    depth += 1
    if (depth > maxCallDepth) { depth -= 1; throw new WasmTrap(s"call depth exceeded $maxCallDepth") }
    try run(code, locals, ftype.results.length)
    finally depth -= 1
  }

  private def run(code: FnCode, locals: Array[Long], nResults: Int): Array[Long] = {
    val ops = code.ops; val ia = code.a; val ib = code.b; val ic = code.c
    var stack = new Array[Long](64)
    var sp = 0
    def push(v: Long): Unit = {
      if (sp == stack.length) stack = java.util.Arrays.copyOf(stack, stack.length * 2)
      stack(sp) = v; sp += 1
    }
    def pop(): Long = { sp -= 1; stack(sp) }
    def pushI(v: Int): Unit = push(v.toLong)
    def pushB(b: Boolean): Unit = push(if (b) 1L else 0L)
    def popF(): Float = java.lang.Float.intBitsToFloat(pop().toInt)
    def popD(): Double = java.lang.Double.longBitsToDouble(pop())
    def pushF(f: Float): Unit = push(java.lang.Float.floatToRawIntBits(f).toLong & 0xFFFFFFFFL)
    def pushD(d: Double): Unit = push(java.lang.Double.doubleToRawLongBits(d))

    val labels = ArrayBuffer.empty[Label]
    labels += new Label(-1, ops.length, false, 0, nResults, 0) // function frame
    var pc = 0

    def branch(depth: Int): Unit = {
      val idx = labels.length - 1 - depth
      val l = labels(idx)
      val arity = if (l.isLoop) l.paramArity else l.resultArity
      // carry `arity` values across the unwind
      var i = 0
      val carry = new Array[Long](arity)
      while (i < arity) { carry(i) = stack(sp - arity + i); i += 1 }
      sp = l.stackHeight
      i = 0
      while (i < arity) { push(carry(i)); i += 1 }
      labels.remove(idx, labels.length - idx) // pop target and deeper
      pc = if (l.isLoop) l.opPos else l.endPos + 1 // loop op re-pushes its frame
    }

    while (pc < ops.length) {
      fuelLeft -= 1
      if (fuelLeft < 0) throw new WasmTrap(s"instruction budget exceeded ($maxFuel)")
      val op = ops(pc)
      val a = ia(pc)
      op match {
        case 0x00 => throw new WasmTrap("unreachable executed")
        case 0x01 => // nop
        case 0x02 | 0x03 => // block | loop
          val pA = (a >> 32).toInt; val rA = a.toInt
          labels += new Label(pc, ib(pc), op == 0x03, pA, rA, sp - pA)
        case 0x04 => // if
          val cond = pop()
          val pA = (a >> 32).toInt; val rA = a.toInt
          if (cond != 0) labels += new Label(pc, ib(pc), false, pA, rA, sp - pA)
          else if (ic(pc) >= 0) {
            labels += new Label(pc, ib(pc), false, pA, rA, sp - pA)
            pc = ic(pc) // lands just past `else` after the pc += 1 below
          } else pc = ib(pc) // no else: skip PAST `end` (no frame was pushed)
        case 0x05 => // else: fell out of the then-branch — jump to end
          pc = ib(pc) - 1
        case 0x0B => // end of a structured block
          labels.remove(labels.length - 1)
        case 0x0C => branch(a.toInt); pc -= 1 // br (compensate pc += 1)
        case 0x0D => if (pop() != 0) { branch(a.toInt); pc -= 1 } // br_if
        case 0x0E => // br_table
          val t = code.brTables(ic(pc))
          val i = pop().toInt
          val depth = if (i >= 0 && i < t.length - 1) t(i) else t(t.length - 1)
          branch(depth); pc -= 1
        case 0x0F => // return
          val out = new Array[Long](nResults)
          var i = 0
          while (i < nResults) { out(i) = stack(sp - nResults + i); i += 1 }
          return out
        case 0x10 => // call
          val res = invoke(a.toInt, popArgs(a.toInt, stack, sp) match { case (args, nsp) => sp = nsp; args })
          var i = 0
          while (i < res.length) { push(res(i)); i += 1 }
        case 0x11 => // call_indirect
          val ti = pop().toInt
          if (ti < 0 || ti >= table.length) throw new WasmTrap("call_indirect: table index out of bounds")
          val f = table(ti)
          if (f < 0) throw new WasmTrap("call_indirect: null table entry")
          val expect = module.types(ib(pc))
          val actual = module.typeOfFunc(f)
          if (!java.util.Arrays.equals(expect.params, actual.params) ||
              !java.util.Arrays.equals(expect.results, actual.results))
            throw new WasmTrap("call_indirect: signature mismatch")
          val res = invoke(f, popArgs(f, stack, sp) match { case (args, nsp) => sp = nsp; args })
          var i = 0
          while (i < res.length) { push(res(i)); i += 1 }
        case 0x1A => pop() // drop
        case 0x1B => // select
          val cond = pop(); val v2 = pop(); val v1 = pop()
          push(if (cond != 0) v1 else v2)
        case 0x20 => push(locals(a.toInt)) // local.get
        case 0x21 => locals(a.toInt) = pop() // local.set
        case 0x22 => locals(a.toInt) = stack(sp - 1) // local.tee
        case 0x23 => push(globals(a.toInt)) // global.get
        case 0x24 => globals(a.toInt) = pop() // global.set

        // loads
        case 0x28 => push(ld32(ea(pop(), a, 4))) // i32.load (sign-extended canonical form)
        case 0x29 => push(ld64(ea(pop(), a, 8)))
        case 0x2A => push(ld32(ea(pop(), a, 4)) & 0xFFFFFFFFL) // f32.load: raw bits
        case 0x2B => push(ld64(ea(pop(), a, 8)))
        case 0x2C => push(ld8(ea(pop(), a, 1))) // i32.load8_s
        case 0x2D => push(ld8(ea(pop(), a, 1)) & 0xFFL)
        case 0x2E => push(ld16(ea(pop(), a, 2)))
        case 0x2F => push(ld16(ea(pop(), a, 2)) & 0xFFFFL)
        case 0x30 => push(ld8(ea(pop(), a, 1)))
        case 0x31 => push(ld8(ea(pop(), a, 1)) & 0xFFL)
        case 0x32 => push(ld16(ea(pop(), a, 2)))
        case 0x33 => push(ld16(ea(pop(), a, 2)) & 0xFFFFL)
        case 0x34 => push(ld32(ea(pop(), a, 4)))
        case 0x35 => push(ld32(ea(pop(), a, 4)) & 0xFFFFFFFFL)
        // stores
        case 0x36 => val v = pop(); st32(ea(pop(), a, 4), v)
        case 0x37 => val v = pop(); st64(ea(pop(), a, 8), v)
        case 0x38 => val v = pop(); st32(ea(pop(), a, 4), v)
        case 0x39 => val v = pop(); st64(ea(pop(), a, 8), v)
        case 0x3A => val v = pop(); st8(ea(pop(), a, 1), v)
        case 0x3B => val v = pop(); st16(ea(pop(), a, 2), v)
        case 0x3C => val v = pop(); st8(ea(pop(), a, 1), v)
        case 0x3D => val v = pop(); st16(ea(pop(), a, 2), v)
        case 0x3E => val v = pop(); st32(ea(pop(), a, 4), v)

        case 0x3F => pushI(mem.length / PageSize) // memory.size
        case 0x40 => // memory.grow
          val delta = pop().toInt
          val oldPages = mem.length / PageSize
          val newPages = oldPages.toLong + (delta.toLong & 0xFFFFFFFFL)
          if (delta < 0 || newPages > memMaxPages || newPages > MaxPages) pushI(-1)
          else {
            // the grow copies the whole old memory — charge it like a
            // bulk op, or a grow(1) loop does O(pages²) copy bytes for
            // 1 fuel each (same runaway class as unmetered memory.fill)
            chargeBulk(mem.length)
            mem = java.util.Arrays.copyOf(mem, (newPages * PageSize).toInt)
            pushI(oldPages)
          }

        case 0x41 | 0x42 => push(a) // i32.const (sign-extended) | i64.const
        case 0x43 => push(a & 0xFFFFFFFFL) // f32.const bits
        case 0x44 => push(a) // f64.const bits

        // i32 compare/arith — operate on .toInt, push sign-extended
        case 0x45 => pushB(pop().toInt == 0)
        case 0x46 => pushB(pop().toInt == pop().toInt)
        case 0x47 => pushB(pop().toInt != pop().toInt)
        case 0x48 => val b = pop().toInt; pushB(pop().toInt < b)
        case 0x49 => val b = pop().toInt; pushB(Integer.compareUnsigned(pop().toInt, b) < 0)
        case 0x4A => val b = pop().toInt; pushB(pop().toInt > b)
        case 0x4B => val b = pop().toInt; pushB(Integer.compareUnsigned(pop().toInt, b) > 0)
        case 0x4C => val b = pop().toInt; pushB(pop().toInt <= b)
        case 0x4D => val b = pop().toInt; pushB(Integer.compareUnsigned(pop().toInt, b) <= 0)
        case 0x4E => val b = pop().toInt; pushB(pop().toInt >= b)
        case 0x4F => val b = pop().toInt; pushB(Integer.compareUnsigned(pop().toInt, b) >= 0)
        case 0x50 => pushB(pop() == 0L)
        case 0x51 => pushB(pop() == pop())
        case 0x52 => pushB(pop() != pop())
        case 0x53 => val b = pop(); pushB(pop() < b)
        case 0x54 => val b = pop(); pushB(java.lang.Long.compareUnsigned(pop(), b) < 0)
        case 0x55 => val b = pop(); pushB(pop() > b)
        case 0x56 => val b = pop(); pushB(java.lang.Long.compareUnsigned(pop(), b) > 0)
        case 0x57 => val b = pop(); pushB(pop() <= b)
        case 0x58 => val b = pop(); pushB(java.lang.Long.compareUnsigned(pop(), b) <= 0)
        case 0x59 => val b = pop(); pushB(pop() >= b)
        case 0x5A => val b = pop(); pushB(java.lang.Long.compareUnsigned(pop(), b) >= 0)
        case 0x5B => val b = popF(); pushB(popF() == b)
        case 0x5C => val b = popF(); pushB(popF() != b)
        case 0x5D => val b = popF(); pushB(popF() < b)
        case 0x5E => val b = popF(); pushB(popF() > b)
        case 0x5F => val b = popF(); pushB(popF() <= b)
        case 0x60 => val b = popF(); pushB(popF() >= b)
        case 0x61 => val b = popD(); pushB(popD() == b)
        case 0x62 => val b = popD(); pushB(popD() != b)
        case 0x63 => val b = popD(); pushB(popD() < b)
        case 0x64 => val b = popD(); pushB(popD() > b)
        case 0x65 => val b = popD(); pushB(popD() <= b)
        case 0x66 => val b = popD(); pushB(popD() >= b)

        case 0x67 => pushI(Integer.numberOfLeadingZeros(pop().toInt))
        case 0x68 => pushI(Integer.numberOfTrailingZeros(pop().toInt))
        case 0x69 => pushI(Integer.bitCount(pop().toInt))
        case 0x6A => val b = pop().toInt; pushI(pop().toInt + b)
        case 0x6B => val b = pop().toInt; pushI(pop().toInt - b)
        case 0x6C => val b = pop().toInt; pushI(pop().toInt * b)
        case 0x6D =>
          val b = pop().toInt; val x = pop().toInt
          if (b == 0) throw new WasmTrap("i32 division by zero")
          if (x == Int.MinValue && b == -1) throw new WasmTrap("i32 division overflow")
          pushI(x / b)
        case 0x6E =>
          val b = pop().toInt; val x = pop().toInt
          if (b == 0) throw new WasmTrap("i32 division by zero")
          pushI(Integer.divideUnsigned(x, b))
        case 0x6F =>
          val b = pop().toInt; val x = pop().toInt
          if (b == 0) throw new WasmTrap("i32 remainder by zero")
          pushI(if (b == -1) 0 else x % b)
        case 0x70 =>
          val b = pop().toInt; val x = pop().toInt
          if (b == 0) throw new WasmTrap("i32 remainder by zero")
          pushI(Integer.remainderUnsigned(x, b))
        case 0x71 => val b = pop().toInt; pushI(pop().toInt & b)
        case 0x72 => val b = pop().toInt; pushI(pop().toInt | b)
        case 0x73 => val b = pop().toInt; pushI(pop().toInt ^ b)
        case 0x74 => val b = pop().toInt; pushI(pop().toInt << b)
        case 0x75 => val b = pop().toInt; pushI(pop().toInt >> b)
        case 0x76 => val b = pop().toInt; pushI(pop().toInt >>> b)
        case 0x77 => val b = pop().toInt; pushI(Integer.rotateLeft(pop().toInt, b))
        case 0x78 => val b = pop().toInt; pushI(Integer.rotateRight(pop().toInt, b))
        case 0x79 => push(java.lang.Long.numberOfLeadingZeros(pop()).toLong)
        case 0x7A => push(java.lang.Long.numberOfTrailingZeros(pop()).toLong)
        case 0x7B => push(java.lang.Long.bitCount(pop()).toLong)
        case 0x7C => val b = pop(); push(pop() + b)
        case 0x7D => val b = pop(); push(pop() - b)
        case 0x7E => val b = pop(); push(pop() * b)
        case 0x7F =>
          val b = pop(); val x = pop()
          if (b == 0) throw new WasmTrap("i64 division by zero")
          if (x == Long.MinValue && b == -1L) throw new WasmTrap("i64 division overflow")
          push(x / b)
        case 0x80 =>
          val b = pop(); val x = pop()
          if (b == 0) throw new WasmTrap("i64 division by zero")
          push(java.lang.Long.divideUnsigned(x, b))
        case 0x81 =>
          val b = pop(); val x = pop()
          if (b == 0) throw new WasmTrap("i64 remainder by zero")
          push(if (b == -1L) 0L else x % b)
        case 0x82 =>
          val b = pop(); val x = pop()
          if (b == 0) throw new WasmTrap("i64 remainder by zero")
          push(java.lang.Long.remainderUnsigned(x, b))
        case 0x83 => val b = pop(); push(pop() & b)
        case 0x84 => val b = pop(); push(pop() | b)
        case 0x85 => val b = pop(); push(pop() ^ b)
        case 0x86 => val b = pop(); push(pop() << b)
        case 0x87 => val b = pop(); push(pop() >> b)
        case 0x88 => val b = pop(); push(pop() >>> b)
        case 0x89 => val b = pop(); push(java.lang.Long.rotateLeft(pop(), b.toInt))
        case 0x8A => val b = pop(); push(java.lang.Long.rotateRight(pop(), b.toInt))

        case 0x8B => pushF(math.abs(popF()))
        case 0x8C => pushF(-popF())
        case 0x8D => pushF(math.ceil(popF().toDouble).toFloat)
        case 0x8E => pushF(math.floor(popF().toDouble).toFloat)
        case 0x8F => val f = popF(); pushF(if (f < 0) math.ceil(f.toDouble).toFloat else math.floor(f.toDouble).toFloat)
        case 0x90 => pushF(math.rint(popF().toDouble).toFloat)
        case 0x91 => pushF(math.sqrt(popF().toDouble).toFloat)
        case 0x92 => val b = popF(); pushF(popF() + b)
        case 0x93 => val b = popF(); pushF(popF() - b)
        case 0x94 => val b = popF(); pushF(popF() * b)
        case 0x95 => val b = popF(); pushF(popF() / b)
        case 0x96 => val b = popF(); pushF(math.min(popF(), b))
        case 0x97 => val b = popF(); pushF(math.max(popF(), b))
        case 0x98 => val b = popF(); pushF(math.copySign(popF(), b))
        case 0x99 => pushD(math.abs(popD()))
        case 0x9A => pushD(-popD())
        case 0x9B => pushD(math.ceil(popD()))
        case 0x9C => pushD(math.floor(popD()))
        case 0x9D => val d = popD(); pushD(if (d < 0) math.ceil(d) else math.floor(d))
        case 0x9E => pushD(math.rint(popD()))
        case 0x9F => pushD(math.sqrt(popD()))
        case 0xA0 => val b = popD(); pushD(popD() + b)
        case 0xA1 => val b = popD(); pushD(popD() - b)
        case 0xA2 => val b = popD(); pushD(popD() * b)
        case 0xA3 => val b = popD(); pushD(popD() / b)
        case 0xA4 => val b = popD(); pushD(math.min(popD(), b))
        case 0xA5 => val b = popD(); pushD(math.max(popD(), b))
        case 0xA6 => val b = popD(); pushD(math.copySign(popD(), b))

        case 0xA7 => pushI(pop().toInt) // i32.wrap_i64
        case 0xA8 => pushI(truncI32(popF().toDouble, signed = true))
        case 0xA9 => pushI(truncI32(popF().toDouble, signed = false))
        case 0xAA => pushI(truncI32(popD(), signed = true))
        case 0xAB => pushI(truncI32(popD(), signed = false))
        case 0xAC => push(pop().toInt.toLong) // i64.extend_i32_s
        case 0xAD => push(pop() & 0xFFFFFFFFL) // i64.extend_i32_u
        case 0xAE => push(truncI64(popF().toDouble, signed = true))
        case 0xAF => push(truncI64(popF().toDouble, signed = false))
        case 0xB0 => push(truncI64(popD(), signed = true))
        case 0xB1 => push(truncI64(popD(), signed = false))
        case 0xB2 => pushF(pop().toInt.toFloat)
        case 0xB3 => pushF((pop() & 0xFFFFFFFFL).toFloat)
        case 0xB4 => pushF(pop().toFloat)
        case 0xB5 => val v = pop(); pushF(ulongToDouble(v).toFloat)
        case 0xB6 => pushF(popD().toFloat)
        case 0xB7 => pushD(pop().toInt.toDouble)
        case 0xB8 => pushD((pop() & 0xFFFFFFFFL).toDouble)
        case 0xB9 => pushD(pop().toDouble)
        case 0xBA => pushD(ulongToDouble(pop()))
        case 0xBB => pushD(popF().toDouble)
        case 0xBC => push(pop().toInt.toLong) // i32.reinterpret_f32: raw 32 bits, sign-extended per the i32 slot invariant
        case 0xBD => // i64.reinterpret_f64 — bits already raw
        case 0xBE => // f32.reinterpret_i32: mask to 32 bits
          push(pop() & 0xFFFFFFFFL)
        case 0xBF => // f64.reinterpret_i64 — bits already raw

        case 0xC0 => pushI(pop().toByte.toInt)
        case 0xC1 => pushI(pop().toShort.toInt)
        case 0xC2 => push(pop().toByte.toLong)
        case 0xC3 => push(pop().toShort.toLong)
        case 0xC4 => push(pop().toInt.toLong)

        // 0xFC extensions
        case 0x100 => pushI(satI32(popF().toDouble, signed = true))
        case 0x101 => pushI(satI32(popF().toDouble, signed = false))
        case 0x102 => pushI(satI32(popD(), signed = true))
        case 0x103 => pushI(satI32(popD(), signed = false))
        case 0x104 => push(satI64(popF().toDouble, signed = true))
        case 0x105 => push(satI64(popF().toDouble, signed = false))
        case 0x106 => push(satI64(popD(), signed = true))
        case 0x107 => push(satI64(popD(), signed = false))
        case 0x108 => // memory.init
          val n = pop().toInt; val src = pop().toInt; val dst = pop().toInt
          val seg = module.datas(ib(pc))
          if (droppedData(ib(pc)) && n > 0) throw new WasmTrap("memory.init on dropped data segment")
          if (src < 0 || n < 0 || src + n > seg.bytes.length) throw new WasmTrap("memory.init source out of bounds")
          checkRange(dst.toLong & 0xFFFFFFFFL, n.toLong)
          chargeBulk(n)
          System.arraycopy(seg.bytes, src, mem, dst, n)
        case 0x109 => droppedData(ib(pc)) = true // data.drop
        case 0x10A => // memory.copy
          val n = pop().toInt; val src = pop().toInt; val dst = pop().toInt
          checkRange(src.toLong & 0xFFFFFFFFL, n.toLong)
          checkRange(dst.toLong & 0xFFFFFFFFL, n.toLong)
          chargeBulk(n)
          System.arraycopy(mem, src, mem, dst, n)
        case 0x10B => // memory.fill
          val n = pop().toInt; val v = pop().toByte; val dst = pop().toInt
          checkRange(dst.toLong & 0xFFFFFFFFL, n.toLong)
          chargeBulk(n)
          java.util.Arrays.fill(mem, dst, dst + n, v)

        case other => throw new WasmTrap(f"unimplemented opcode 0x$other%02x")
      }
      pc += 1
    }
    val out = new Array[Long](nResults)
    var i = 0
    while (i < nResults) { out(i) = stack(sp - nResults + i); i += 1 }
    out
  }

  /** Bulk memory ops (copy/fill/init) move up to ~2 GiB per
    * instruction, so flat 1-fuel pricing would let a fill loop burn
    * unbounded CPU inside the budget — charge ~1 fuel per 64 bytes
    * moved on top of the flat cost already taken at dispatch.
    */
  private def chargeBulk(n: Int): Unit = {
    fuelLeft -= (n >> 6).toLong
    if (fuelLeft < 0) throw new WasmTrap(s"instruction budget exceeded ($maxFuel)")
  }

  /** Pop a callee's arguments off the operand stack (in order). */
  private def popArgs(fidx: Int, stack: Array[Long], sp: Int): (Array[Long], Int) = {
    val n = module.typeOfFunc(fidx).params.length
    val args = new Array[Long](n)
    var i = 0
    while (i < n) { args(i) = stack(sp - n + i); i += 1 }
    (args, sp - n)
  }

  private def truncI32(d: Double, signed: Boolean): Int = {
    if (d.isNaN) throw new WasmTrap("invalid conversion to integer (NaN)")
    val t = if (d < 0) math.ceil(d) else math.floor(d)
    if (signed) {
      if (t < Int.MinValue.toDouble || t > Int.MaxValue.toDouble) throw new WasmTrap("i32.trunc overflow")
      t.toInt
    } else {
      if (t < 0.0 || t > 4294967295.0) throw new WasmTrap("i32.trunc_u overflow")
      t.toLong.toInt
    }
  }
  private def truncI64(d: Double, signed: Boolean): Long = {
    if (d.isNaN) throw new WasmTrap("invalid conversion to integer (NaN)")
    val t = if (d < 0) math.ceil(d) else math.floor(d)
    if (signed) {
      if (t < -9.223372036854776e18 || t >= 9.223372036854776e18) throw new WasmTrap("i64.trunc overflow")
      t.toLong
    } else {
      if (t < 0.0 || t >= 1.8446744073709552e19) throw new WasmTrap("i64.trunc_u overflow")
      doubleToUlong(t)
    }
  }
  private def satI32(d: Double, signed: Boolean): Int =
    if (d.isNaN) 0
    else if (signed) math.max(Int.MinValue.toDouble, math.min(Int.MaxValue.toDouble, d)).toInt
    else math.max(0.0, math.min(4294967295.0, d)).toLong.toInt
  private def satI64(d: Double, signed: Boolean): Long =
    if (d.isNaN) 0L
    else if (signed) d.toLong // JVM Double→Long already saturates
    else doubleToUlong(math.max(0.0, d))
  private def ulongToDouble(v: Long): Double =
    if (v >= 0) v.toDouble
    else ((v >>> 1) | (v & 1)).toDouble * 2.0
  private def doubleToUlong(d: Double): Long =
    if (d < 9.223372036854776e18) d.toLong
    else ((d - 9.223372036854776e18).toLong | Long.MinValue)
}

object WasmInterp {
  /** Instruction budget for one instance — generous for any real
    * per-cell transformer (the reference's reverse-string module runs
    * in thousands of instructions) while bounding a runaway loop to a
    * few seconds of wasted executor time at worst. Bulk memory ops
    * charge ~1 fuel per 64 bytes moved (see `chargeBulk`), so a module
    * looping over large fills/copies cannot hide unbounded work behind
    * flat per-instruction pricing.
    */
  val DefaultMaxFuel: Long = 1L << 28
  /** Wasm call depth cap. The interpreter recurses one JVM frame per
    * wasm call; 1000 stays far inside the JVM's default stack while
    * covering any sane transformer recursion.
    */
  val DefaultMaxCallDepth: Int = 1000
  /** Cap on DECLARED memory min at instantiation (pages of 64 KiB; 512
    * = 32 MiB). Instantiation happens before fuel metering starts, so
    * the declared minimum is the one allocation a hostile module gets
    * for free — bound it to something a per-row transformer could
    * plausibly need rather than the 2 GiB JVM array ceiling.
    */
  val DefaultMaxInitPages: Int = 512
}
