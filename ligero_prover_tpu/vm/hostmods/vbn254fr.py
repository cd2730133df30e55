"""`vbn254fr` host module — SIMD/batch field rows, device-resident
(``include/host_modules/vbn254fr.hpp``).

A guest handle names one of 512 row-slots of k BN254-Fr elements.  The
reference keeps the arena in one big WebGPU buffer and launches an
``Eltwise*`` kernel per op; here the arena is a single device-resident JAX
array of shape (512, k, 8) uint32 limbs and each guest op is one jitted
element-wise kernel (fused limb arithmetic on the VPU) with the arena
donated through, so slots never round-trip to the host.  Committed rows
enter the same batched stage pipelines as witness rows via the stage
context's ``on_batch_{init,bit,equal,quadratic}`` hooks
(``nonbatch_context.hpp:497-553, 782-847, 996-1048, 1306-1350``):

* ``init``  — a freshly-set row: tail [l, k) gets fresh encoding
  randomness, row is committed.
* ``bit``   — commits the row plus a quadratic bit check x∘x = x.
* ``equal`` — commits both rows plus a quadratic-test term r*(x - y).
* ``quadratic`` — commits (x, y, z) plus the check r*(x∘y - z).

Pure linear ops (addmod & co) compute values only, exactly like the
reference — the SDK's circuits route soundness through the hooks above.
"""

from __future__ import annotations

from collections import deque
from functools import partial

import numpy as np

from ...field import bn254 as F
from ...field.limbs import ints_to_limbs
from ..values import WasmTrap, u32, u64

MAX_VARIABLES = 512
NLIMB = 8

_jits = {}


def _build_jits():
    """Build the jitted arena kernels lazily (keeps JAX import off the
    module-import path)."""
    if _jits:
        return _jits
    import jax
    import jax.numpy as jnp
    from ...ops import fieldops as fo

    def bcast(c, x):
        return jnp.broadcast_to(c, x.shape)

    @partial(jax.jit, donate_argnums=0)
    def set_row(arena, oi, row):
        return arena.at[oi].set(row)

    @partial(jax.jit, donate_argnums=0)
    def clear_row(arena, oi):
        return arena.at[oi].set(jnp.zeros_like(arena[0]))

    @partial(jax.jit, donate_argnums=0)
    def copy(arena, xi, oi):
        rx = arena[xi]
        return arena.at[oi].set(rx), rx

    @jax.jit
    def get1(arena, xi):
        return arena[xi]

    @jax.jit
    def get2(arena, xi, yi):
        return arena[xi], arena[yi]

    @partial(jax.jit, donate_argnums=0)
    def add(arena, xi, yi, oi):
        return arena.at[oi].set(fo.addmod(arena[xi], arena[yi]))

    @partial(jax.jit, donate_argnums=0)
    def sub(arena, xi, yi, oi):
        return arena.at[oi].set(fo.submod(arena[xi], arena[yi]))

    @partial(jax.jit, donate_argnums=0)
    def mul(arena, xi, yi, oi):
        rx, ry = arena[xi], arena[yi]
        out = fo.mulmod(rx, ry)
        return arena.at[oi].set(out), rx, ry, out

    @partial(jax.jit, donate_argnums=0)
    def div(arena, xi, yi, oi):
        rx, ry = arena[xi], arena[yi]
        out = fo.mulmod(rx, fo.invmod(ry))
        return arena.at[oi].set(out), out, ry, rx

    @partial(jax.jit, donate_argnums=0)
    def add_const(arena, xi, oi, c):
        x = arena[xi]
        return arena.at[oi].set(fo.addmod(x, bcast(c, x)))

    @partial(jax.jit, donate_argnums=0)
    def sub_const(arena, xi, oi, c):
        x = arena[xi]
        return arena.at[oi].set(fo.submod(x, bcast(c, x)))

    @partial(jax.jit, donate_argnums=0)
    def const_sub(arena, xi, oi, c):
        x = arena[xi]
        return arena.at[oi].set(fo.submod(bcast(c, x), x))

    @partial(jax.jit, donate_argnums=0)
    def mul_const(arena, xi, oi, c):
        x = arena[xi]
        return arena.at[oi].set(fo.mulmod(x, bcast(c, x)))

    @partial(jax.jit, donate_argnums=0)
    def mont_mul_const(arena, xi, oi, c):
        # x * c * 2^-256 mod p: the guest passes c premultiplied by R
        # (``engine.cpp`` EltwiseMontMultMod semantics).
        x = arena[xi]
        return arena.at[oi].set(fo.mont_mul(x, bcast(c, x)))

    @partial(jax.jit, donate_argnums=0)
    def bit_decompose(arena, xi, slots):
        x = arena[xi]                                    # (k, 8)
        bits = jnp.stack([(x[:, i // 32] >> np.uint32(i % 32)) & 1
                          for i in range(F.NUM_BITS)])   # (254, k)
        rows = jnp.zeros((F.NUM_BITS,) + x.shape,
                         jnp.uint32).at[:, :, 0].set(bits)
        return arena.at[slots].set(rows), rows

    _jits.update(set_row=set_row, clear_row=clear_row, copy=copy, get1=get1,
                 get2=get2, add=add, sub=sub, mul=mul, div=div,
                 add_const=add_const, sub_const=sub_const,
                 const_sub=const_sub, mul_const=mul_const,
                 mont_mul_const=mont_mul_const, bit_decompose=bit_decompose)
    return _jits


class VBn254frModule:
    name = "vbn254fr"

    def __init__(self, ctx):
        self.ctx = ctx
        self.zk = ctx.zk
        self.l = self.zk.l
        self.k = self.zk.k
        self.arena = None                    # lazy (vbn254fr.hpp:47-52)
        self.free_list: deque[int] = deque()
        self.ops = None

    def call(self, func: str):
        handler = getattr(self, func, None)
        if handler is None:
            raise WasmTrap(f"vbn254fr.{func} not implemented")
        handler()

    def finalize(self):
        pass

    # -- plumbing ----------------------------------------------------------

    def _init_arena(self):
        import jax.numpy as jnp
        self.ops = _build_jits()
        self.arena = jnp.zeros((MAX_VARIABLES, self.k, NLIMB), jnp.uint32)
        self.free_list = deque(range(MAX_VARIABLES))

    def _allocate(self) -> int:
        if self.arena is None:
            self._init_arena()
        if not self.free_list:
            raise WasmTrap(
                f"vbn254fr: bad alloc, 0/{MAX_VARIABLES} free slots")
        return self.free_list.popleft()

    def _pop_u32(self) -> int:
        return self.ctx.make_numeric(self.ctx.pop()).as_u32()

    def _pop_u64(self) -> int:
        return self.ctx.make_numeric(self.ctx.pop()).as_u64()

    def _load(self, addr: int) -> int:
        slot = int.from_bytes(self.ctx.memory.load_bytes(addr, 4), "little")
        if self.arena is None or slot >= MAX_VARIABLES:
            raise WasmTrap(f"vbn254fr: invalid handle {slot}")
        return slot

    def _store(self, addr: int, slot: int):
        self.ctx.memory.store_bytes(addr, slot.to_bytes(4, "little"))
        # handles are public metadata (vbn254fr.hpp:103-109)
        self.ctx.memory.unmark(addr, addr + 4)

    def _wants_rows(self) -> bool:
        return getattr(self.zk, "wants_batch_rows", True)

    def _rows_np(self, *rows):
        """Rows handed to the batch hooks STAY DEVICE-RESIDENT: the stage
        contexts stack them straight into the next pipeline batch, so no
        device->host->device round trip happens per row (measured: the
        per-row readback dominated end-to-end prove wall-clock)."""
        if not self._wants_rows():
            return [None] * len(rows)
        return list(rows)

    def _make_row(self, values: list[int]) -> np.ndarray:
        """Build a full k-wide limb row: values, zeros to l, encoding
        randomness tail [l, k) (``nonbatch_context.hpp:497-505``)."""
        if len(values) > self.l:
            raise WasmTrap("vbn254fr: too many elements for a batch row")
        row = np.zeros((self.k, NLIMB), np.uint32)
        ints_to_limbs([v % F.MODULUS for v in values], row[:len(values)])
        tail = self.zk.batch_encoding_tail()
        if tail is not None:
            ints_to_limbs(tail, row[self.l:self.l + len(tail)])
        return row

    def _set_and_init(self, slot: int, values: list[int]):
        row = self._make_row(values)
        self.arena = self.ops["set_row"](self.arena, slot, row)
        self.zk.on_batch_init(row)

    # -- alloc / free ------------------------------------------------------

    def vbn254fr_get_size(self):
        self.ctx.push(u64(self.l))

    def vbn254fr_alloc(self):
        fp_addr = self._pop_u32()
        self._store(fp_addr, self._allocate())

    def vbn254fr_free(self):
        fp_addr = self._pop_u32()
        slot = self._load(fp_addr)
        self.arena = self.ops["clear_row"](self.arena, slot)
        self.free_list.append(slot)
        self._store(fp_addr, 0)

    # -- setters -----------------------------------------------------------

    def vbn254fr_set_ui(self):
        length = self._pop_u64()
        ui_ptr = self._pop_u32()
        fp_addr = self._pop_u32()
        raw = self.ctx.memory.load_bytes(ui_ptr, 4 * length)
        vals = list(np.frombuffer(raw, np.uint32).astype(object))
        self._set_and_init(self._load(fp_addr), vals)

    def vbn254fr_set_ui_scalar(self):
        ui = self._pop_u32()
        fp_addr = self._pop_u32()
        self._set_and_init(self._load(fp_addr), [ui] * self.l)

    def _read_cstr(self, addr: int) -> str:
        mem = self.ctx.memory
        end = mem.data.index(0, addr)
        return bytes(mem.data[addr:end]).decode()

    def _parse_int(self, s: str, base: int) -> int:
        if base == 0:
            return int(s, 0)
        if base == 16 and s.startswith(("0x", "0X")):
            return int(s, 16)
        return int(s, base)

    def vbn254fr_set_str(self):
        base = self._pop_u32()
        length = self._pop_u64()
        str_ptr_ptr = self._pop_u32()
        fp_addr = self._pop_u32()
        err = 0
        vals = []
        for i in range(length):
            p = int.from_bytes(
                self.ctx.memory.load_bytes(str_ptr_ptr + 4 * i, 4), "little")
            try:
                vals.append(self._parse_int(self._read_cstr(p), base))
            except ValueError:
                err = 0xFFFFFFFF
                vals.append(0)
        self._set_and_init(self._load(fp_addr), vals)
        self.ctx.push(u32(err))

    def vbn254fr_set_str_scalar(self):
        base = self._pop_u32()
        str_addr = self._pop_u32()
        fp_addr = self._pop_u32()
        err = 0
        try:
            v = self._parse_int(self._read_cstr(str_addr), base)
        except ValueError:
            err, v = 0xFFFFFFFF, 0
        self._set_and_init(self._load(fp_addr), [v] * self.l)
        self.ctx.push(u32(err))

    def vbn254fr_set_bytes(self):
        count = self._pop_u64()
        length = self._pop_u64()
        bytes_ptr = self._pop_u32()
        fp_addr = self._pop_u32()
        vals = []
        for i in range(count):
            raw = self.ctx.memory.load_bytes(bytes_ptr + length * i, length)
            vals.append(int.from_bytes(raw, "big"))
        self._set_and_init(self._load(fp_addr), vals)

    def vbn254fr_set_bytes_scalar(self):
        length = self._pop_u64()
        bytes_ptr = self._pop_u32()
        fp_addr = self._pop_u32()
        v = int.from_bytes(self.ctx.memory.load_bytes(bytes_ptr, length),
                           "big")
        self._set_and_init(self._load(fp_addr), [v] * self.l)

    def vbn254fr_constant_set_str(self):
        base = self._pop_u32()
        str_addr = self._pop_u32()
        out_addr = self._pop_u32()
        err = 0
        try:
            v = self._parse_int(self._read_cstr(str_addr), base)
        except ValueError:
            err, v = 0xFFFFFFFF, 0
        self.ctx.memory.store_bytes(
            out_addr, (v % (1 << 256)).to_bytes(32, "little"))
        self.ctx.push(u32(err))

    # -- copy / print ------------------------------------------------------

    def vbn254fr_copy(self):
        in_addr = self._pop_u32()
        out_addr = self._pop_u32()
        xi = self._load(in_addr)
        oi = self._load(out_addr)
        self.arena, rx = self.ops["copy"](self.arena, xi, oi)
        rout, rin = self._rows_np(rx, rx)
        self.zk.on_batch_equal(rout, rin)

    def vbn254fr_print(self):
        base = self._pop_u32()
        addr = self._pop_u32()
        xi = self._load(addr)
        from ...field.limbs import limbs_to_ints
        head = limbs_to_ints(np.asarray(self.ops["get1"](self.arena, xi),
                                        np.uint32)[:3])
        if base == 16:
            txt = " ".join(hex(v) for v in head)
        elif base == 10:
            txt = " ".join(str(v) for v in head)
        else:
            raise WasmTrap("bad conversion")
        print(f"@print [handle={xi}] vec: {txt} ...")

    # -- arithmetic --------------------------------------------------------

    def _pop3_slots(self):
        y_addr = self._pop_u32()
        x_addr = self._pop_u32()
        out_addr = self._pop_u32()
        return self._load(x_addr), self._load(y_addr), self._load(out_addr)

    def _pop_const_slots(self):
        """(out, x, k_ptr) arg order: constant is 8 little-endian u32 limbs
        in guest memory (``vbn254fr.hpp:369-384``)."""
        k_addr = self._pop_u32()
        x_addr = self._pop_u32()
        out_addr = self._pop_u32()
        c = int.from_bytes(self.ctx.memory.load_bytes(k_addr, 32), "little")
        climbs = ints_to_limbs([c % F.MODULUS])[0]
        return self._load(x_addr), self._load(out_addr), climbs

    def vbn254fr_addmod(self):
        xi, yi, oi = self._pop3_slots()
        self.arena = self.ops["add"](self.arena, xi, yi, oi)

    def vbn254fr_submod(self):
        xi, yi, oi = self._pop3_slots()
        self.arena = self.ops["sub"](self.arena, xi, yi, oi)

    def vbn254fr_addmod_constant(self):
        xi, oi, c = self._pop_const_slots()
        self.arena = self.ops["add_const"](self.arena, xi, oi, c)

    def vbn254fr_submod_constant(self):
        xi, oi, c = self._pop_const_slots()
        self.arena = self.ops["sub_const"](self.arena, xi, oi, c)

    def vbn254fr_constant_submod(self):
        # (out, k_ptr, x): k - x elementwise
        x_addr = self._pop_u32()
        k_addr = self._pop_u32()
        out_addr = self._pop_u32()
        c = int.from_bytes(self.ctx.memory.load_bytes(k_addr, 32), "little")
        climbs = ints_to_limbs([c % F.MODULUS])[0]
        self.arena = self.ops["const_sub"](
            self.arena, self._load(x_addr), self._load(out_addr), climbs)

    def vbn254fr_mulmod_constant(self):
        xi, oi, c = self._pop_const_slots()
        self.arena = self.ops["mul_const"](self.arena, xi, oi, c)

    def vbn254fr_mont_mul_constant(self):
        k_addr = self._pop_u32()
        x_addr = self._pop_u32()
        out_addr = self._pop_u32()
        c = int.from_bytes(self.ctx.memory.load_bytes(k_addr, 32), "little")
        climbs = ints_to_limbs([c % (1 << 256)])[0]
        self.arena = self.ops["mont_mul_const"](
            self.arena, self._load(x_addr), self._load(out_addr), climbs)

    def vbn254fr_mulmod(self):
        xi, yi, oi = self._pop3_slots()
        self.arena, rx, ry, out = self.ops["mul"](self.arena, xi, yi, oi)
        nx, ny, nz = self._rows_np(rx, ry, out)
        self.zk.on_batch_quadratic(nx, ny, nz)

    def vbn254fr_divmod(self):
        xi, yi, oi = self._pop3_slots()
        self.arena, out, ry, rx = self.ops["div"](self.arena, xi, yi, oi)
        nx, ny, nz = self._rows_np(out, ry, rx)
        self.zk.on_batch_quadratic(nx, ny, nz)   # out * y = x

    def vbn254fr_assert_equal(self):
        y_addr = self._pop_u32()
        x_addr = self._pop_u32()
        rx, ry = self.ops["get2"](self.arena, self._load(x_addr),
                                  self._load(y_addr))
        nx, ny = self._rows_np(rx, ry)
        self.zk.on_batch_equal(nx, ny)

    def vbn254fr_bit_decompose(self):
        x_addr = self._pop_u32()
        out_arr_base = self._pop_u32()
        xi = self._load(x_addr)
        raw = self.ctx.memory.load_bytes(out_arr_base, 4 * F.NUM_BITS)
        slots = np.frombuffer(raw, np.uint32).astype(np.int32)
        if (slots >= MAX_VARIABLES).any():
            raise WasmTrap("vbn254fr: invalid handle in bit_decompose")
        self.arena, rows = self.ops["bit_decompose"](self.arena, xi, slots)
        wants = self._wants_rows()
        for i in range(F.NUM_BITS):
            self.zk.on_batch_bit(rows[i] if wants else None)
