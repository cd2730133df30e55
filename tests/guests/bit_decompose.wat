(module
  ;; vbn254fr bit_decompose at full width + consumer-style recomposition
  ;; (the SDK's to_bits/from_bits_checked pattern, vectorized:
  ;;  sdk/cpp/src/bn254fr.cpp to_bits_checked).
  (import "vbn254fr" "vbn254fr_get_size" (func $vsize (result i64)))
  (import "vbn254fr" "vbn254fr_alloc" (func $valloc (param i32)))
  (import "vbn254fr" "vbn254fr_set_ui" (func $vset_ui (param i32 i32 i64)))
  (import "vbn254fr" "vbn254fr_set_ui_scalar"
    (func $vset_ui_scalar (param i32 i32)))
  (import "vbn254fr" "vbn254fr_addmod" (func $vadd (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_mulmod" (func $vmul (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_divmod" (func $vdiv (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_mulmod_constant"
    (func $vmulc (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_assert_equal"
    (func $vassert_eq (param i32 i32)))
  (import "vbn254fr" "vbn254fr_bit_decompose"
    (func $vbits (param i32 i32)))
  (memory 2)

  (func $main
    (local $i i32)
    (local $l i32)
    ;; lane-varying values: v[i] = (i * 0x9E3779B1) & 0x7fffffff | 1
    (local.set $l (i32.wrap_i64 (call $vsize)))
    (block $d0 (loop $l0
      (br_if $d0 (i32.ge_u (local.get $i) (local.get $l)))
      (i32.store (i32.add (i32.const 34816)
                          (i32.mul (local.get $i) (i32.const 4)))
        (i32.or (i32.and (i32.mul (local.get $i) (i32.const 0x9E3779B1))
                         (i32.const 0x7fffffff))
                (i32.const 1)))
      (local.set $i (i32.add (local.get $i) (i32.const 1)))
      (br $l0)))
    (call $valloc (i32.const 1040))
    (call $vset_ui (i32.const 1040) (i32.const 34816)
                   (i64.extend_i32_u (local.get $l)))

    ;; 254 bit handles
    (local.set $i (i32.const 0))
    (block $d1 (loop $l1
      (br_if $d1 (i32.ge_u (local.get $i) (i32.const 254)))
      (call $valloc (i32.add (i32.const 16)
                             (i32.mul (local.get $i) (i32.const 4))))
      (local.set $i (i32.add (local.get $i) (i32.const 1)))
      (br $l1)))
    (call $vbits (i32.const 16) (i32.const 1040))

    ;; recompose: acc = sum_i bits[i] * 2^i  via mulmod_constant
    (call $valloc (i32.const 1044))
    (call $valloc (i32.const 1048))
    (call $vset_ui_scalar (i32.const 1044) (i32.const 0))
    (local.set $i (i32.const 0))
    (block $d2 (loop $l2
      (br_if $d2 (i32.ge_u (local.get $i) (i32.const 254)))
      ;; write the single nonzero byte of 2^i into the constant buffer
      (i32.store8 (i32.add (i32.const 1088)
                           (i32.shr_u (local.get $i) (i32.const 3)))
        (i32.shl (i32.const 1) (i32.and (local.get $i) (i32.const 7))))
      (call $vmulc (i32.const 1048)
        (i32.add (i32.const 16)
                 (i32.mul (local.get $i) (i32.const 4)))
        (i32.const 1088))
      (call $vadd (i32.const 1044) (i32.const 1044) (i32.const 1048))
      (i32.store8 (i32.add (i32.const 1088)
                           (i32.shr_u (local.get $i) (i32.const 3)))
        (i32.const 0))
      (local.set $i (i32.add (local.get $i) (i32.const 1)))
      (br $l2)))
    (call $vassert_eq (i32.const 1044) (i32.const 1040))

    ;; lane-varying quadratic round-trip: z = v*v ; w = z/v ; w == v
    (call $valloc (i32.const 1052))
    (call $valloc (i32.const 1056))
    (call $vmul (i32.const 1052) (i32.const 1040) (i32.const 1040))
    (call $vdiv (i32.const 1056) (i32.const 1052) (i32.const 1040))
    (call $vassert_eq (i32.const 1056) (i32.const 1040)))

  (export "_start" (func $main))
)
