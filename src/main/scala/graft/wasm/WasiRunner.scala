package graft.wasm

import java.io.ByteArrayOutputStream

/** Minimal WASI snapshot-preview1 host: the stdio surface a *command*
  * module needs (`fd_read`/`fd_write`/`proc_exit`/`environ_*`) with
  * byte-array pipes — the same stdin→`_start`→stdout contract the
  * reference drives through wasmer
  * (`replibyte/src/transformer/custom_wasm.rs:66-99`). Everything else
  * a module imports resolves to an ENOSYS stub (see WasmInterp).
  *
  * WASI ABI reference:
  * https://github.com/WebAssembly/WASI/blob/main/legacy/preview1/docs.md
  */
object WasiRunner {

  /** Parse once, run per value. Thread-safe: each [[run]] builds a fresh
    * instance (isolated memory/globals/table), like the reference's
    * `Instance::new` per call.
    */
  /** @param maxInitPages instantiation-time memory cap forwarded to
    *                      [[WasmInterp]] — raise it for a legitimate
    *                      module whose data segments need more than the
    *                      default 32 MiB declared minimum
    */
  final class Command(wasmBytes: Array[Byte],
                      maxInitPages: Int = WasmInterp.DefaultMaxInitPages) extends Serializable {
    @transient private lazy val module: WasmModule.Module = WasmModule.parse(wasmBytes)

    /** Feed `stdin` to the module's `_start`, return its stdout. */
    def run(stdin: Array[Byte]): Array[Byte] = {
      val stdout = new ByteArrayOutputStream()
      var stdinPos = 0
      // the instance is wired below; host closures capture the holder
      var interp: WasmInterp = null

      def iovecs(ptr: Long, n: Long): Seq[(Int, Int)] =
        (0 until n.toInt).map { i =>
          val base = ptr.toInt + 8 * i
          (interp.memU32(base).toInt, interp.memU32(base + 4).toInt)
        }

      val host = Map[String, Array[Long] => Array[Long]](
        "wasi_snapshot_preview1.fd_read" -> { args =>
          val Array(fd, iovs, iovsLen, nreadPtr) = args
          if (fd != 0) Array(8L) // EBADF: only stdin is readable
          else {
            var total = 0
            iovecs(iovs, iovsLen).foreach { case (buf, len) =>
              val n = math.min(len, stdin.length - stdinPos)
              if (n > 0) {
                interp.memWrite(buf, stdin, stdinPos, n)
                stdinPos += n
                total += n
              }
            }
            interp.memPutU32(nreadPtr.toInt, total.toLong)
            Array(0L)
          }
        },
        "wasi_snapshot_preview1.fd_write" -> { args =>
          val Array(fd, iovs, iovsLen, nwrittenPtr) = args
          if (fd != 1 && fd != 2) Array(8L) // EBADF
          else {
            var total = 0
            iovecs(iovs, iovsLen).foreach { case (buf, len) =>
              val bytes = interp.memBytes(buf, len)
              if (fd == 1) stdout.write(bytes, 0, bytes.length)
              // fd 2 (stderr) is swallowed — a transformer's diagnostics
              // are not its output
              total += len
            }
            interp.memPutU32(nwrittenPtr.toInt, total.toLong)
            Array(0L)
          }
        },
        "wasi_snapshot_preview1.proc_exit" -> { args =>
          throw new ProcExit(args(0).toInt)
        },
        "wasi_snapshot_preview1.environ_sizes_get" -> { args =>
          interp.memPutU32(args(0).toInt, 0L)
          interp.memPutU32(args(1).toInt, 0L)
          Array(0L)
        },
        "wasi_snapshot_preview1.environ_get" -> { _ => Array(0L) },
        "wasi_snapshot_preview1.args_sizes_get" -> { args =>
          interp.memPutU32(args(0).toInt, 0L)
          interp.memPutU32(args(1).toInt, 0L)
          Array(0L)
        },
        "wasi_snapshot_preview1.args_get" -> { _ => Array(0L) }
      )

      interp = new WasmInterp(module, host, maxInitPages = maxInitPages)
      try {
        interp.runStart()
        interp.invokeExport("_start")
      } catch {
        case e: ProcExit if e.code == 0 => // normal command exit
        case e: ProcExit =>
          throw new WasmTrap(s"wasm module exited with code ${e.code}")
      }
      stdout.toByteArray
    }

    /** The reference's per-value wire protocol: value + '\n' in, stdout
      * trimmed out (`custom_wasm.rs:66-99`).
      */
    def transform(value: String): String =
      new String(run((value + "\n").getBytes("UTF-8")), "UTF-8").trim
  }
}
