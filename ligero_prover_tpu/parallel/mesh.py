"""Multi-chip sharding of the prover pipeline (shard_map + explicit ICI
collectives).

The reference is single-GPU (SURVEY §2.7); scaling out is new design.  The
parallel axes of the Ligero prover:

* batch rows — independent until the transcript: RS-encoding a row batch
  is data-parallel over rows.
* codeword columns — per-column SHA-256 states, the test accumulators and
  the sampled openings are elementwise over columns and never communicate.

One committed batch flows through a single `shard_map` program over a 1-D
device mesh ("dev"):

  1. each device encodes its local slice of the row batch (iNTT_k + NTT_n)
  2. `all_to_all` reshards codewords row-sharded -> column-sharded (ICI)
  3. local column-sharded SHA absorbs + code/linear/quadratic FMAs
  4. sampled columns are gathered locally and `psum`-combined (each global
     column is owned by exactly one device)

The Merkle/Fiat-Shamir layer above gathers only 32-byte column digests
(tiny; DCN-friendly for multi-host).  shard_map is used instead of
jit+sharding constraints because the partitioner need only see local
programs — the absorb scan's large unrolled body partitions trivially by
construction.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ntt import RSCodec, encode_rows
from ..ops import fieldops as fo
from ..ops import sha256 as jsha
from ..zkp.executor import _absorb_stream, _masked_sum

NLIMB = 8


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("dev",))


class ShardedProver:
    """Sharded stage pipeline over a 1-D mesh.

    Column-state layout: device d owns columns [d*n/D, (d+1)*n/D).
    Host-facing arrays are global; shard_map handles the split.
    """

    def __init__(self, k: int, n: int, mesh: Mesh | None = None):
        self.codec = RSCodec(k, n)
        self.k, self.n = k, n
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = self.mesh.devices.size
        assert n % self.D == 0, "codeword length must divide the mesh"
        self._build()

    def _build(self):
        n, D = self.n, self.D
        mesh = self.mesh
        n_local = n // D

        def step(state, pending, has_pending, rows, rands, valid_count,
                 code_rs, tri_idx, tri_r, pair_idx, pair_r,
                 code, linear, quad, sample_idx, dom_k, dom_n):
            # local shapes: state (8, n/D); rows (B/D, k, 8); accs (n/D, 8)
            e_rows = encode_rows(rows, dom_k, dom_n, n)    # (B/D, n, 8)
            r_rows = encode_rows(rands, dom_k, dom_n, n)
            # reshard: rows-sharded -> cols-sharded over ICI
            e = jax.lax.all_to_all(e_rows, "dev", split_axis=1,
                                   concat_axis=0, tiled=True)  # (B, n/D, 8)
            r = jax.lax.all_to_all(r_rows, "dev", split_axis=1,
                                   concat_axis=0, tiled=True)
            state, pending, has_pending = _absorb_stream(
                state, pending, has_pending, e, valid_count)
            code = _masked_sum(code, fo.mulmod(e, code_rs[:, None, :]))
            linear = _masked_sum(linear, fo.mulmod(e, r))
            ex = jnp.take(e, tri_idx[:, 0], axis=0)
            ey = jnp.take(e, tri_idx[:, 1], axis=0)
            ez = jnp.take(e, tri_idx[:, 2], axis=0)
            t = fo.submod(fo.mulmod(ex, ey), ez)
            quad = _masked_sum(quad, fo.mulmod(t, tri_r[:, None, :]))
            px = jnp.take(e, pair_idx[:, 0], axis=0)
            py = jnp.take(e, pair_idx[:, 1], axis=0)
            d = fo.submod(px, py)
            quad = _masked_sum(quad, fo.mulmod(d, pair_r[:, None, :]))
            # sampled openings: local gather + psum (each col owned once)
            offset = jax.lax.axis_index("dev") * n_local
            local_idx = sample_idx - offset
            owned = (local_idx >= 0) & (local_idx < n_local)
            got = jnp.take(e, jnp.clip(local_idx, 0, n_local - 1), axis=1)
            got = jnp.where(owned[None, :, None], got, 0)
            samples = jax.lax.psum(got, "dev")             # (B, S, 8)
            return state, pending, has_pending, code, linear, quad, samples

        pspec_state = P(None, "dev")
        pspec_cols = P("dev", None)
        pspec_rows = P("dev", None, None)
        rep = P()
        self.step = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(pspec_state, pspec_cols, rep, pspec_rows, pspec_rows,
                      rep, rep, rep, rep, rep, rep,
                      pspec_cols, pspec_cols, pspec_cols,
                      rep, rep, rep),
            out_specs=(pspec_state, pspec_cols, rep, pspec_cols, pspec_cols,
                       pspec_cols, rep),
            check_vma=False))

    def init_state(self):
        n = self.n
        state = jnp.asarray(
            np.broadcast_to(jsha.INIT_STATE[:, None], (8, n)).copy())
        pending = jnp.zeros((n, NLIMB), jnp.uint32)
        z = jnp.zeros((n, NLIMB), jnp.uint32)
        return state, pending, jnp.asarray(False), (z, z, z)

    def run_batch(self, state, pending, has_pending, accs, rows, rands,
                  valid_count, code_rs, tri_idx, tri_r, sample_idx,
                  pair_idx=None, pair_r=None):
        if pair_idx is None:
            pair_idx = np.zeros((tri_idx.shape[0], 2), np.int32)
            pair_r = np.zeros((tri_r.shape[0], NLIMB), np.uint32)
        out = self.step(state, pending, has_pending,
                        jnp.asarray(rows), jnp.asarray(rands),
                        jnp.asarray(valid_count, jnp.int32),
                        jnp.asarray(code_rs), jnp.asarray(tri_idx),
                        jnp.asarray(tri_r), jnp.asarray(pair_idx),
                        jnp.asarray(pair_r), *accs,
                        jnp.asarray(sample_idx, jnp.int32),
                        self.codec.dom_k, self.codec.dom_n)
        return out[0], out[1], out[2], (out[3], out[4], out[5]), out[6]
