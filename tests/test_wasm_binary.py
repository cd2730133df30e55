"""WASM binary front-end: hand-assembled module through the full pipeline."""

import struct

from ligero_prover_tpu.vm.wasm import parse_wasm
from ligero_prover_tpu.vm.run import run_program
from ligero_prover_tpu.zkp.context import NullContext


def leb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def section(sid: int, payload: bytes) -> bytes:
    return bytes([sid]) + leb(len(payload)) + payload


def vec(items: list[bytes]) -> bytes:
    return leb(len(items)) + b"".join(items)


def name(s: str) -> bytes:
    b = s.encode()
    return leb(len(b)) + b


def build_test_module() -> bytes:
    # types: 0: (i32)->i32, 1: (i32,i32)->(), 2: ()->()
    types = vec([
        b"\x60" + vec([b"\x7f"]) + vec([b"\x7f"]),
        b"\x60" + vec([b"\x7f", b"\x7f"]) + vec([]),
        b"\x60" + vec([]) + vec([]),
    ])
    imports = vec([
        name("env") + name("i32_private_const") + b"\x00" + leb(0),
        name("env") + name("assert_equal") + b"\x00" + leb(1),
    ])
    funcs = vec([leb(2)])          # one local func of type 2
    exports = vec([name("_start") + b"\x00" + leb(2)])
    # body: (assert_equal (i32.add (pc 5) (pc 7)) (pc 12))
    body = (b"\x41\x05\x10\x00"    # i32.const 5; call 0
            b"\x41\x07\x10\x00"    # i32.const 7; call 0
            b"\x6a"                # i32.add
            b"\x41\x0c\x10\x00"    # i32.const 12; call 0
            b"\x10\x01"            # call 1 (assert_equal)
            b"\x0b")               # end
    code_entry = leb(len(body) + 1) + vec([]) + body
    code = vec([code_entry])
    return (b"\x00asm" + struct.pack("<I", 1)
            + section(1, types) + section(2, imports) + section(3, funcs)
            + section(7, exports) + section(10, code))


def test_binary_roundtrip_execution():
    blob = build_test_module()
    module = parse_wasm(blob)
    assert len(module.funcs) == 3
    assert module.funcs[0].imported == ("env", "i32_private_const")
    assert "_start" in module.exports

    ctx = NullContext(k=256)
    run_program(module, ctx, [b"Ligero\x00"], set(), strict=True)
    assert ctx.rows > 0


def test_binary_with_memory_and_data():
    # memory 1 page, active data segment, load/store roundtrip
    types = vec([b"\x60" + vec([]) + vec([])])
    funcs = vec([leb(0)])
    memsec = vec([b"\x00" + leb(1)])
    exports = vec([name("_start") + b"\x00" + leb(0)])
    body = (b"\x41\x10"            # i32.const 16
            b"\x41\x2a"            # i32.const 42
            b"\x36\x02\x00"        # i32.store align=2 offset=0
            b"\x0b")
    code = vec([leb(len(body) + 1) + vec([]) + body])
    data = vec([b"\x00" + b"\x41\x00\x0b" + leb(3) + b"abc"])
    blob = (b"\x00asm" + struct.pack("<I", 1)
            + section(1, types) + section(3, funcs) + section(5, memsec)
            + section(7, exports) + section(10, code) + section(11, data))
    module = parse_wasm(blob)
    ctx = NullContext(k=256)
    run_program(module, ctx, [b"Ligero\x00"], set(), strict=True)
