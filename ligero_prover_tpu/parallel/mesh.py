"""Multi-chip sharding of the prover (jax.sharding + GSPMD collectives).

The reference is single-GPU (SURVEY §2.7); scaling out is new, TPU-native
design.  The natural parallel axis of the Ligero prover is the
**codeword-column axis** (n):

* per-column SHA-256 states never communicate — device d owns columns
  [d*n/D, (d+1)*n/D) and absorbs only those;
* the code/linear/quadratic test accumulators are elementwise over
  columns — sharded sums, no communication;
* only the NTT butterflies exchange elements across the axis.  In the
  constant-geometry scan (ops/ntt.py) every stage is a fixed
  reshape+butterfly, so GSPMD lowers the inter-shard halves/interleave
  exchanges to collective-permutes over ICI automatically — the
  scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
  the collectives.

:class:`ShardedExecutor` is a drop-in :class:`TpuExecutor` whose five
jitted pipelines run under sharding constraints on a 1-D ``("cols",)``
mesh.  Because the protocol math is exact integer arithmetic and the
stage contexts/drivers are unchanged, the sharded prover follows the
identical Fiat-Shamir ordering (commit -> seed1 -> checks -> seed2 ->
openings) and produces **bit-identical proof bytes** to the single-device
prover at the same encoding seed — asserted in tests/test_sharded.py and
exercised by ``__graft_entry__.dryrun_multichip``.

Multi-host notes: the Merkle/Fiat-Shamir layer lives on the host and
consumes only the final (8, n) digest state — with a multi-host mesh the
same sharded pipelines span hosts (GSPMD over ICI/DCN), every host
derives identical seeds from the replicated root, and the per-host
witness front-ends replay the same deterministic program.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..zkp import executor as _ex
from ..zkp.executor import TpuExecutor

NLIMB = 8


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("cols",))


def _constrain(mesh, x, spec):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


class ShardedExecutor(TpuExecutor):
    """TpuExecutor with column-sharded pipelines over a 1-D mesh.

    Shardings (C = n codeword columns, the sharded axis):
      sha state (8, C): P(None, "cols");  pending (C, 8): P("cols")
      accumulators (n, 8): P("cols");     encoded rows (B, n, 8): P(None,
      "cols") internally;  sampled openings (B, 192, 8): replicated
      (each column owned by one shard; GSPMD gathers).
    """

    # keep the step methods from requesting (and building) MXU tables
    _use_mxu = staticmethod(lambda: False)

    def __init__(self, k: int, n: int, mesh: Mesh | None = None,
                 batch_rows: int = 16):
        super().__init__(k, n, batch_rows)
        self.mesh = mesh if mesh is not None else make_mesh()
        D = self.mesh.devices.size
        assert n % D == 0, "codeword length must divide the mesh"
        mesh_ = self.mesh
        st = P(None, "cols")      # (8, C)
        col = P("cols")           # (C, ...) leading-axis sharded
        bcol = P(None, "cols")    # (B, n, 8)

        # The sharded pipelines keep the VPU (constant-geometry) NTT: its
        # stagewise reshapes shard cleanly over the column axis, whereas
        # the int8-matmul NTT's level matmuls would need a bespoke
        # sharding design (contraction dim is digits x rows, not columns).
        def commit(state, pending, hp, rows, vc, dom, dom_n, n_, planar,
                   mxu_tabs=None, use_mxu=False):
            state = _constrain(mesh_, state, st)
            pending = _constrain(mesh_, pending, col)
            out = _ex._commit_body(state, pending, hp, rows, vc, dom,
                                   dom_n, n_, planar)
            return (_constrain(mesh_, out[0], st),
                    _constrain(mesh_, out[1], col), out[2])

        def check(code, linear, quad, rows, rands, code_rs, tri_idx,
                  tri_r, pair_idx, pair_r, dom_k, dom_n, n_, planar,
                  mxu_tabs=None, use_mxu=False, rands_zero=False):
            code = _constrain(mesh_, code, col)
            linear = _constrain(mesh_, linear, col)
            quad = _constrain(mesh_, quad, col)
            out = _ex._check_body(code, linear, quad, rows, rands,
                                  code_rs, tri_idx, tri_r, pair_idx,
                                  pair_r, dom_k, dom_n, n_, planar,
                                  rands_zero=rands_zero)
            return tuple(_constrain(mesh_, o, col) for o in out)

        def mask(code, linear, quad, *args):
            code = _constrain(mesh_, code, col)
            linear = _constrain(mesh_, linear, col)
            quad = _constrain(mesh_, quad, col)
            out = _ex._mask_body(code, linear, quad, *args)
            return tuple(_constrain(mesh_, o, col) for o in out)

        def open_(rows, idx, dom, dom_n, n_, planar, mxu_tabs=None,
                  use_mxu=False):
            out = _ex._open_body(rows, idx, dom, dom_n, n_, planar)
            return _constrain(mesh_, out, P())   # replicate openings

        self._commit = jax.jit(commit, static_argnums=(7, 8, 10))
        self._check = jax.jit(check, static_argnums=(12, 13, 15, 16))
        self._mask = jax.jit(mask, static_argnums=(9, 10))
        self._open = jax.jit(open_, static_argnums=(4, 5, 7))
        # The verifier works on 192 sampled columns — too small to shard
        # profitably; it inherits the single-device pipelines.

    def sha_init(self, num_cols: int):
        state, pending, hp = super().sha_init(num_cols)
        if num_cols % self.mesh.devices.size == 0:
            state = jax.device_put(
                state, NamedSharding(self.mesh, P(None, "cols")))
            pending = jax.device_put(
                pending, NamedSharding(self.mesh, P("cols")))
        return state, pending, hp

    def fetch(self, x) -> np.ndarray:
        """Host read of a (possibly globally-sharded) pipeline output.

        On a multi-process mesh the column shards live on other hosts, so
        np.asarray would fail; replicate over the mesh first (GSPMD
        all-gather, rides ICI/DCN) and read the process-local copy.  Every
        process gets the same bytes -> the Fiat-Shamir transcript stays
        replicated across hosts by construction."""
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            return np.asarray(x, np.uint32)
        rep = self._replicate(x)
        return np.asarray(rep.addressable_data(0), np.uint32)

    @property
    def _replicate(self):
        fn = self.__dict__.get("_replicate_fn")
        if fn is None:
            fn = jax.jit(lambda a: a, out_shardings=NamedSharding(
                self.mesh, P()))
            self.__dict__["_replicate_fn"] = fn
        return fn
