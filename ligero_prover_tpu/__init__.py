"""ligero_prover_tpu — a TPU-native Ligero zero-knowledge proof system.

A from-scratch JAX/Pallas re-design of the capabilities of
ligeroinc/ligero-prover ("Ligetron"): a WASM virtual machine with dual
public/secret semantics streams BN254-Fr witnesses into fixed-width rows;
rows are Reed-Solomon encoded by NTT, committed per-column in a SHA-256
Merkle tree, and proven with the Ligero IOP (code / linear / quadratic
tests + column openings), made non-interactive by Fiat-Shamir.
"""

__version__ = "0.1.0"
