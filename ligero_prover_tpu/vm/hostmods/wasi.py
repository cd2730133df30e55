"""`wasi_snapshot_preview1` host module
(``include/host_modules/wasi_preview1.hpp``).

``args_get`` copies program arguments into guest memory and marks the bytes
of private-index args secret — this is how secret inputs enter the guest.
"""

from __future__ import annotations

import os
import random
import sys

from ..values import Num, WasmTrap, ExitProgram, u32


class WasiModule:
    name = "wasi_snapshot_preview1"

    def __init__(self, ctx, args: list[bytes], private_indices: set[int]):
        self.ctx = ctx
        self.args = args
        self.private_indices = private_indices
        self._rand = random.Random(42)  # reference seeds an mt19937

    def call(self, func: str):
        handler = getattr(self, func, None)
        if handler is None:
            raise WasmTrap(f"wasi.{func} not implemented")
        handler()

    def args_sizes_get(self):
        ctx = self.ctx
        size_ptr = ctx.make_numeric(ctx.pop()).as_u32()
        count_ptr = ctx.make_numeric(ctx.pop()).as_u32()
        ctx.memory.store_bytes(count_ptr,
                               len(self.args).to_bytes(4, "little"))
        total = sum(len(a) for a in self.args)
        ctx.memory.store_bytes(size_ptr, total.to_bytes(4, "little"))
        ctx.push(u32(0))

    def args_get(self):
        ctx = self.ctx
        mem = ctx.memory
        argv_buffer = ctx.make_numeric(ctx.pop()).as_u32()
        argv = ctx.make_numeric(ctx.pop()).as_u32()
        for i, arg in enumerate(self.args):
            mem.store_bytes(argv, argv_buffer.to_bytes(4, "little"))
            argv += 4
            mem.store_bytes(argv_buffer, arg)
            if i in self.private_indices:
                mem.mark_secret(argv_buffer, argv_buffer + len(arg))
            argv_buffer += len(arg)
        ctx.push(u32(0))

    def environ_sizes_get(self):
        ctx = self.ctx
        size_ptr = ctx.make_numeric(ctx.pop()).as_u32()
        count_ptr = ctx.make_numeric(ctx.pop()).as_u32()
        ctx.memory.store_bytes(count_ptr, (0).to_bytes(4, "little"))
        ctx.memory.store_bytes(size_ptr, (0).to_bytes(4, "little"))
        ctx.push(u32(0))

    def environ_get(self):
        ctx = self.ctx
        ctx.pop()
        ctx.pop()
        ctx.push(u32(0))

    def fd_write(self):
        ctx = self.ctx
        mem = ctx.memory
        nwritten_ptr = ctx.make_numeric(ctx.pop()).as_u32()
        iovs_len = ctx.make_numeric(ctx.pop()).as_u32()
        iovs = ctx.make_numeric(ctx.pop()).as_u32()
        fd = ctx.make_numeric(ctx.pop()).as_u32()
        total = 0
        out = sys.stdout if fd == 1 else sys.stderr
        for i in range(iovs_len):
            base = int.from_bytes(mem.load_bytes(iovs + 8 * i, 4), "little")
            ln = int.from_bytes(mem.load_bytes(iovs + 8 * i + 4, 4), "little")
            out.write(mem.load_bytes(base, ln).decode("utf-8", "replace"))
            total += ln
        mem.store_bytes(nwritten_ptr, total.to_bytes(4, "little"))
        ctx.push(u32(0))

    def fd_read(self):
        ctx = self.ctx
        mem = ctx.memory
        nread_ptr = ctx.make_numeric(ctx.pop()).as_u32()
        iovs_len = ctx.make_numeric(ctx.pop()).as_u32()
        iovs = ctx.make_numeric(ctx.pop()).as_u32()
        fd = ctx.make_numeric(ctx.pop()).as_u32()
        total = 0
        for i in range(iovs_len):
            base = int.from_bytes(mem.load_bytes(iovs + 8 * i, 4), "little")
            ln = int.from_bytes(mem.load_bytes(iovs + 8 * i + 4, 4), "little")
            data = os.read(fd, ln) if ln else b""
            mem.store_bytes(base, data)
            total += len(data)
            if len(data) < ln:
                break
        mem.store_bytes(nread_ptr, total.to_bytes(4, "little"))
        ctx.push(u32(0))

    def fd_close(self):
        self.ctx.pop()
        self.ctx.push(u32(0))

    def fd_seek(self):
        ctx = self.ctx
        for _ in range(4):
            ctx.pop()
        ctx.push(u32(0))

    def fd_fdstat_get(self):
        ctx = self.ctx
        stat_ptr = ctx.make_numeric(ctx.pop()).as_u32()
        ctx.make_numeric(ctx.pop())
        ctx.memory.store_bytes(stat_ptr, bytes(24))
        ctx.push(u32(0))

    def random_get(self):
        ctx = self.ctx
        ln = ctx.make_numeric(ctx.pop()).as_u32()
        ptr = ctx.make_numeric(ctx.pop()).as_u32()
        data = bytes(self._rand.getrandbits(8) for _ in range(ln))
        ctx.memory.store_bytes(ptr, data)
        ctx.push(u32(0))

    def proc_exit(self):
        code = self.ctx.make_numeric(self.ctx.pop()).as_u32()
        raise ExitProgram(code)

    def finalize(self):
        pass
