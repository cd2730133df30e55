#!/usr/bin/env python
"""End-to-end prove wall-clock at production geometry (VERDICT r4 #2).

Proves a Poseidon-style vbn254fr round loop (the flagship SDK batching
pattern, ``sdk/cpp/src/poseidon2.cpp`` call shape: mulmod x2 per round +
constant add + final assert) at k=8192 on the live JAX platform, and
reports the interpreter/device split per stage plus an end-to-end
rows/s.

Each round emits 7 committed batch rows (2 quadratic triples + copy
pair... measured via NullContext below), so ROUNDS controls witness
size.  Usage:  python bench/e2e_prove.py [ROUNDS]   (default 1500,
~10.5k rows).

Prints one JSON line.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def make_wat(rounds: int) -> str:
    """x_{i+1} = x_i^2 * x_i + c  (degree-3 Poseidon-ish round), batched
    over all k lanes via vbn254fr; asserts the result against a copy."""
    return f"""
(module
  (import "vbn254fr" "vbn254fr_alloc" (func $alloc (param i32)))
  (import "vbn254fr" "vbn254fr_set_ui_scalar" (func $set_scalar (param i32 i32)))
  (import "vbn254fr" "vbn254fr_mulmod" (func $mulmod (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_addmod_constant" (func $addc (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_copy" (func $copy (param i32 i32)))
  (import "vbn254fr" "vbn254fr_assert_equal" (func $assert_eq (param i32 i32)))
  (memory 1)
  (func $main (local $x i32) (local $t i32) (local $c i32) (local $chk i32) (local $i i32)
    (local.set $x (i32.const 0))
    (local.set $t (i32.const 4))
    (local.set $c (i32.const 8))
    (local.set $chk (i32.const 12))
    (call $alloc (local.get $x))
    (call $alloc (local.get $t))
    (call $alloc (local.get $c))
    (call $alloc (local.get $chk))
    (call $set_scalar (local.get $x) (i32.const 3))
    (call $set_scalar (local.get $c) (i32.const 17))
    (local.set $i (i32.const 0))
    (block $done
      (loop $round
        (br_if $done (i32.ge_u (local.get $i) (i32.const {rounds})))
        ;; t = x*x ; x = t*x ; x = x + c
        (call $mulmod (local.get $t) (local.get $x) (local.get $x))
        (call $mulmod (local.get $x) (local.get $t) (local.get $x))
        (call $addc (local.get $x) (local.get $x) (local.get $c))
        (local.set $i (i32.add (local.get $i) (i32.const 1)))
        (br $round)))
    ;; self-consistency: chk = x  =>  assert_equal(chk, x)
    (call $copy (local.get $chk) (local.get $x))
    (call $assert_eq (local.get $chk) (local.get $x)))
  (export "_start" (func $main)))
"""


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.verifier import verify
    from ligero_prover_tpu.vm.run import make_wat_program
    from ligero_prover_tpu.utils import timer as T

    wat_path = "/tmp/e2e_poseidon_round.wat"
    with open(wat_path, "w") as f:
        f.write(make_wat(rounds))

    geometry = RowGeometry(k=8192)
    program = make_wat_program(wat_path, [], set())

    # cold pass: jit compiles + table build (persistent-cached afterwards)
    warm_prog = make_wat_program(make_wat(2), [], set())
    t0 = time.perf_counter()
    prove(warm_prog, geometry=geometry, encoding_seed=bytes(32))
    cold_s = time.perf_counter() - t0
    T.clear_timers()

    t0 = time.perf_counter()
    res = prove(program, geometry=geometry, encoding_seed=bytes(32))
    wall = time.perf_counter() - t0
    assert res.ok, "self-check failed"

    stages = {name: round(T.get_timer(name), 2)
              for name in ("stage1", "stage2", "stage3")}
    stages["cold_compile"] = round(cold_s, 1)
    out = {
        "metric": "prove_e2e_rows_per_s",
        "value": round(res.num_rows / wall, 1),
        "unit": "rows/s",
        "detail": {
            "rounds": rounds,
            "rows": res.num_rows,
            "wall_s": round(wall, 1),
            "stages_s": stages,
            "proof_bytes": len(res.proof),
        },
    }

    t0 = time.perf_counter()
    vres = verify(program, res.proof, geometry=geometry)
    out["detail"]["verify_s"] = round(time.perf_counter() - t0, 1)
    out["detail"]["verify_ok"] = bool(vres.ok)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
